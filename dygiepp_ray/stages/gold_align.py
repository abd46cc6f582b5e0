"""Gold-annotation alignment onto enumerated candidate spans (SURVEY.md
M3-M6, J1).

The reference builds, per sentence, label vectors/adjacency entries over
the enumerated spans via list lookups
(``dygie/data/dataset_readers/dygie.py:59-114``):

* M3 NER: one label per enumerated span, "" for non-gold; gold spans
  WIDER than max_span_width are silently dropped (``:56-68``);
* M4 coref: cluster-id per span, -1 default (``:70-78``);
* M5 relations: (span_ix1, span_ix2, label) adjacency entries, skipping
  pairs with an out-of-enumeration argument (``:80-95``);
* M6 events: per-token trigger labels + (token_ix, span_ix, role)
  argument adjacency (``:97-114``).

Here the lookup is a vectorized hash join per batch: enumerated spans
are generated implicitly (span_index(start, end) is a closed form for
the enumeration order), so alignment never materializes the O(n*W) span
list.  Input: doc rows with gold_* columns (e.g. from
``sources/jsonl.read_reference_jsonl``); output adds aligned columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from ..semantics import DEFAULT_CONFIG, ExtractionConfig


def span_index(start: int, end: int, n_tokens: int, max_width: int) -> int | None:
    """Index of (start, end) within enumerate_spans(n_tokens, max_width),
    or None if outside the enumeration (too wide / out of range).

    Enumeration order is ascending start then end (dygie.py:121-126), so
    index = sum_{s<start} min(max_width, n-s) + (end - start).
    """
    width = end - start + 1
    if start < 0 or end < start or end >= n_tokens or width > max_width:
        return None
    # starts s <= n-W contribute max_width spans each; later starts n-s
    full = min(start, max(0, n_tokens - max_width + 1))
    idx = full * max_width
    for s in range(full, start):
        idx += n_tokens - s
    return idx + (end - start)


def align_gold_batch(df: pd.DataFrame, cfg: ExtractionConfig) -> pd.DataFrame:
    """Adds per-doc aligned annotation columns:

    * ``ner_span_labels``: list of {sent_ix, span_ix, label} (M3; only
      non-null entries are materialized — the dense vector is implied)
    * ``coref_span_clusters``: list of {sent_ix, span_ix, cluster_ix} (M4)
    * ``relation_adjacency``: list of {sent_ix, ix1, ix2, label} (M5)
    * ``trigger_token_labels``: list of {sent_ix, tok, label} (M6)
    * ``argument_adjacency``: list of {sent_ix, trig_tok, span_ix, role} (M6)
    * ``n_dropped_gold``: gold annotations outside the enumeration
    """
    W = cfg.max_span_width
    out = {k: [] for k in (
        "ner_span_labels", "coref_span_clusters", "relation_adjacency",
        "trigger_token_labels", "argument_adjacency", "n_dropped_gold",
    )}
    for _, row in df.iterrows():
        sent_lens = [len(s) for s in row["sentences"]]
        starts = list(row["sentence_start"])

        def locate(tok: int) -> int:
            # M14 sentence-of-span: binary search over cumulative bounds
            ix = int(np.searchsorted(starts, tok, side="right")) - 1
            return max(0, ix)

        def to_local(s_doc: int, e_doc: int):
            si = locate(s_doc)
            off = starts[si]
            s, e = s_doc - off, e_doc - off
            if e >= sent_lens[si]:  # crossing sentence boundary
                return None
            ix = span_index(s, e, sent_lens[si], W)
            return None if ix is None else (si, ix)

        def _lst(v):
            return [] if v is None else list(v)

        dropped = 0
        ner = []
        for m in _lst(row.get("gold_ner")):
            loc = to_local(m["start"], m["end"])
            if loc is None:
                dropped += 1  # wider than max_span_width -> silently dropped
            else:
                ner.append({"sent_ix": loc[0], "span_ix": loc[1], "label": m["label"]})
        coref = []
        for c in _lst(row.get("gold_clusters")):
            loc = to_local(c["start"], c["end"])
            if loc is None:
                dropped += 1
            else:
                coref.append(
                    {"sent_ix": loc[0], "span_ix": loc[1], "cluster_ix": c["cluster_ix"]}
                )
        rels = []
        for r in _lst(row.get("gold_relations")):
            l1 = to_local(r["s1"], r["e1"])
            l2 = to_local(r["s2"], r["e2"])
            if l1 is None or l2 is None or l1[0] != l2[0]:
                dropped += 1  # skip pairs with out-of-enumeration argument
            else:
                rels.append(
                    {"sent_ix": l1[0], "ix1": l1[1], "ix2": l2[1], "label": r["label"]}
                )
        trig, args = [], []
        for ev in _lst(row.get("gold_events")):
            t = int(ev["trigger_tok"])
            si = locate(t)
            trig.append({"sent_ix": si, "tok": t - starts[si], "label": ev["event_type"]})
            for a in _lst(ev["args"]):
                loc = to_local(a["start"], a["end"])
                if loc is None or loc[0] != si:
                    dropped += 1
                else:
                    args.append(
                        {"sent_ix": si, "trig_tok": t - starts[si],
                         "span_ix": loc[1], "role": a["role"]}
                    )
        out["ner_span_labels"].append(ner)
        out["coref_span_clusters"].append(coref)
        out["relation_adjacency"].append(rels)
        out["trigger_token_labels"].append(trig)
        out["argument_adjacency"].append(args)
        out["n_dropped_gold"].append(dropped)
    res = df.copy()
    for k, v in out.items():
        res[k] = v
    return res


def align_gold(
    docs: ray.data.Dataset, cfg: ExtractionConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    return docs.map_batches(
        lambda df: align_gold_batch(df, cfg), batch_format="pandas"
    )
