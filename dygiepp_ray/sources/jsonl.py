"""Reference-wire-format JSONL interop (SURVEY.md S1/S2/S5, M11).

The reference's corpus format is JSONL — one document per line with
per-sentence annotation arrays (``doc/data.md:13-116``):

* ``ner``: ``[start_tok, end_tok, label]`` (doc-level offsets, inclusive)
* ``relations``: ``[s1, e1, s2, e2, label]``
* ``events``: ``[[trigger_tok, event_type], [start, end, role], ...]``
* ``clusters``: doc-level list of ``[start, end]`` member lists
* predicted variants append ``raw_score, softmax_score`` rounded to 4
  decimals (``document.py:10-11``, ``doc/data.md:108-116``)
* top-level fields validated against the reference's regex allowlist
  (``Document._check_fields``, ``document.py:160-173``); ``_``-prefixed
  metadata passes through untouched.

This makes the engine drop-in interoperable with reference corpora:
``read_reference_jsonl`` ingests them, ``write_reference_jsonl`` emits
prediction files byte-compatible with the reference's ``dump_line``
output shape (``predictors/dygie.py:37-40``).
"""

from __future__ import annotations

import json
import re

import pandas as pd
import pyarrow as pa

import ray.data

_ALLOWED = re.compile(
    r"^(doc_key|dataset|sentences|weight|.*ner$|.*relations$|.*clusters$|.*events$|_.*)"
)


def check_fields(doc: dict) -> None:
    """M11: reject unknown top-level fields (document.py:160-173)."""
    for k in doc:
        if not _ALLOWED.match(k):
            raise ValueError(f"Unknown field {k!r} in document {doc.get('doc_key')!r}")


def _as_list(v):
    if v is None:
        return []
    return list(v)


def doc_row_to_reference_json(row: dict) -> dict:
    """One predicted doc row (extract.py output) -> reference JSON dict."""
    n_sents = len(row["sentences"])
    ner = [[] for _ in range(n_sents)]
    for m in _as_list(row.get("ner")):
        ner[m["sent_ix"]].append(
            [int(m["start"]), int(m["end"]), m["label"],
             round(float(m["raw"]), 4), round(float(m["softmax"]), 4)]
        )
    rels = [[] for _ in range(n_sents)]
    for m in _as_list(row.get("relations")):
        rels[m["sent_ix"]].append(
            [int(m["s1"]), int(m["e1"]), int(m["s2"]), int(m["e2"]), m["label"],
             round(float(m["raw"]), 4), round(float(m["softmax"]), 4)]
        )
    events = [[] for _ in range(n_sents)]
    trig_events: dict[tuple[int, int], list] = {}
    for t in _as_list(row.get("triggers")):
        ev = [[int(t["tok"]), t["label"],
               round(float(t["raw"]), 4), round(float(t["softmax"]), 4)]]
        trig_events[(t["sent_ix"], int(t["tok"]))] = ev
        events[t["sent_ix"]].append(ev)
    for a in _as_list(row.get("event_args")):
        ev = trig_events.get((a["sent_ix"], int(a["trig_tok"])))
        if ev is not None:
            # predicted args are [start, end, role, raw, softmax]
            # (doc/data.md:115; document.py:490-497)
            ev.append(
                [int(a["start"]), int(a["end"]), a["role"],
                 round(float(a.get("raw", 0.0)), 4),
                 round(float(a.get("softmax", 0.0)), 4)]
            )
    clusters: dict[int, list] = {}
    for c in _as_list(row.get("cluster_members")):
        clusters.setdefault(int(c["cluster_ix"]), []).append(
            [int(c["start"]), int(c["end"])]
        )
    out = {
        "doc_key": row["doc_key"],
        "dataset": row.get("dataset", "synth"),
        "sentences": [list(s) for s in row["sentences"]],
        "predicted_ner": ner,
        "predicted_relations": rels,
        "predicted_events": events,
        "predicted_clusters": [clusters[k] for k in sorted(clusters)],
    }
    return out


def write_reference_jsonl(predicted_docs: ray.data.Dataset, out_dir: str) -> int:
    """S2/S5: predicted docs -> reference-format JSONL files (one file per
    batch, written by the task that holds the batch — raw lines, exactly
    the reference's ``dump_line`` layout).  Returns docs written."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        lines = [json.dumps(doc_row_to_reference_json(r)) for r in df.to_dict("records")]
        path = os.path.join(out_dir, f"docs-{uuid.uuid4().hex}.jsonl")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        os.replace(tmp, path)
        return pd.DataFrame({"n": [len(lines)]})

    counts = predicted_docs.map_batches(fn, batch_format="pandas").to_pandas()
    return int(counts["n"].sum())


def gold_row_to_reference_json(row: dict) -> dict:
    """Inverse of ``read_reference_jsonl``'s parse: gold doc row ->
    reference wire-format dict, completing the round-trip identity the
    reference test-enforces (``document_test.py:36-56``:
    from_json(to_json(x)) == x)."""
    n_sents = len(row["sentences"])
    ner = [[] for _ in range(n_sents)]
    for m in _as_list(row.get("gold_ner")):
        ner[m["sent_ix"]].append([int(m["start"]), int(m["end"]), m["label"]])
    rels = [[] for _ in range(n_sents)]
    for m in _as_list(row.get("gold_relations")):
        rels[m["sent_ix"]].append(
            [int(m["s1"]), int(m["e1"]), int(m["s2"]), int(m["e2"]), m["label"]]
        )
    events = [[] for _ in range(n_sents)]
    for ev in _as_list(row.get("gold_events")):
        entry = [[int(ev["trigger_tok"]), ev["event_type"]]] + [
            [int(a["start"]), int(a["end"]), a["role"]] for a in _as_list(ev["args"])
        ]
        events[int(ev["sent_ix"])].append(entry)
    clusters: dict[int, list] = {}
    for c in _as_list(row.get("gold_clusters")):
        clusters.setdefault(int(c["cluster_ix"]), []).append(
            [int(c["start"]), int(c["end"])]
        )
    out = {
        "doc_key": row["doc_key"],
        "dataset": row.get("dataset", ""),
        "sentences": [list(s) for s in row["sentences"]],
        "ner": ner,
        "relations": rels,
        "events": events,
        "clusters": [clusters[k] for k in sorted(clusters)],
    }
    if row.get("weight") is not None:
        out["weight"] = row["weight"]
    meta = row.get("_metadata")
    if meta:
        out.update(json.loads(meta) if isinstance(meta, str) else meta)
    return out


def read_reference_jsonl(paths: str | list[str]) -> ray.data.Dataset:
    """S1/S3: reference-format JSONL -> gold document rows.

    Output columns: doc_key, dataset, sentences, sentence_start, weight,
    gold_ner / gold_relations / gold_events / gold_clusters (flat
    per-doc lists with sent_ix, mirroring extract.py's layout), plus
    ``_``-metadata JSON-encoded in ``_metadata``."""
    raw = ray.data.read_text(paths)

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for line in df["text"]:
            doc = json.loads(line)
            check_fields(doc)
            sents = doc["sentences"]
            starts, off = [], 0
            for s in sents:
                starts.append(off)
                off += len(s)

            def sent_of(tok: int) -> int:
                for i in range(len(starts) - 1, -1, -1):
                    if tok >= starts[i]:
                        return i
                return 0

            ner = [
                {"sent_ix": si, "start": m[0], "end": m[1], "label": m[2]}
                for si, sent in enumerate(doc.get("ner", [[] for _ in sents]))
                for m in sent
            ]
            rels = [
                {"sent_ix": si, "s1": m[0], "e1": m[1], "s2": m[2], "e2": m[3], "label": m[4]}
                for si, sent in enumerate(doc.get("relations", [[] for _ in sents]))
                for m in sent
            ]
            events = []
            for si, sent in enumerate(doc.get("events", [[] for _ in sents])):
                for ev in sent:
                    trig, args = ev[0], ev[1:]
                    events.append(
                        {
                            "sent_ix": si,
                            "trigger_tok": trig[0],
                            "event_type": trig[1],
                            "args": [
                                {"start": a[0], "end": a[1], "role": a[2]} for a in args
                            ],
                        }
                    )
            clusters = [
                {"cluster_ix": ci, "start": m[0], "end": m[1]}
                for ci, members in enumerate(doc.get("clusters", []))
                for m in members
            ]
            meta = {k: v for k, v in doc.items() if k.startswith("_")}
            rows.append(
                {
                    "doc_key": doc["doc_key"],
                    "dataset": doc.get("dataset", ""),
                    "sentences": sents,
                    "sentence_start": starts,
                    "weight": doc.get("weight"),
                    "gold_ner": ner,
                    "gold_relations": rels,
                    "gold_events": events,
                    "gold_clusters": clusters,
                    "_metadata": json.dumps(meta),
                }
            )
        return pd.DataFrame(rows)

    return raw.map_batches(parse, batch_format="pandas")
