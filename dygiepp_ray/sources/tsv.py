"""ChemProt-style three-table TSV reader (SURVEY.md S8, J3, M12, F9).

The reference reads abstracts / entities / relations TSVs with pandas
and joins them per ``doc_key``
(``scripts/data/chemprot/02_chemprot_to_input.py:93-97,147-170``), with
char->token alignment dropping misaligned entities
(``:24-59``), label rewrites like ``GENE-Y -> GENE`` (``:25-28,66-67``)
and ``Arg1:`` prefix stripping (F9).

Ray-Data-first shape: three ``read_csv`` Datasets; the entity/relation
sides are grouped per doc and joined against abstracts with a
``partitioned_map_groups`` exchange on ``doc_key`` (both sides can be
large); label normalization is a vectorized string op.
"""

from __future__ import annotations

import pandas as pd

import ray.data

from ..core import partitioned_map_groups
from .brat import _token_char_spans

LABEL_MAP = {"GENE-Y": "GENE", "GENE-N": "GENE"}


def read_chemprot_style(
    abstracts: ray.data.Dataset,
    entities: ray.data.Dataset,
    relations: ray.data.Dataset,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """abstracts(doc_key, text) x entities(doc_key, ent_id, label, start,
    end) x relations(doc_key, label, arg1, arg2) -> gold doc rows.

    ``arg1``/``arg2`` may carry the reference's ``Arg1:``/``Arg2:``
    prefixes (stripped, F9); entity labels go through LABEL_MAP; char
    offsets are aligned to token boundaries, misaligned entities dropped
    and counted.
    """

    def tag(name):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__side"] = name
            return df

        return fn

    a = abstracts.map_batches(tag("a"), batch_format="pandas")
    e = entities.map_batches(tag("e"), batch_format="pandas")
    r = relations.map_batches(tag("r"), batch_format="pandas")
    all_rows = a.union(e).union(r)

    def build(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_key, g in df.groupby("doc_key", sort=False):
            ab = g[g["__side"] == "a"]
            if len(ab) == 0:
                continue
            text = ab.iloc[0]["text"]
            tokens, starts, ends = _token_char_spans(text)
            ents, dropped = {}, 0
            ge = g[g["__side"] == "e"]
            for _, er in ge.iterrows():
                s, t = int(er["start"]), int(er["end"])
                if s in starts and t in ends:
                    lab = LABEL_MAP.get(er["label"], er["label"])
                    ents[er["ent_id"]] = (starts[s], ends[t], lab)
                else:
                    dropped += 1
            ner = sorted(v for v in ents.values())
            rels, dropped_rels = [], 0
            gr = g[g["__side"] == "r"]
            for _, rr in gr.iterrows():
                a1 = str(rr["arg1"]).split(":")[-1]
                a2 = str(rr["arg2"]).split(":")[-1]
                if a1 in ents and a2 in ents:
                    s1, e1, _ = ents[a1]
                    s2, e2, _ = ents[a2]
                    rels.append((s1, e1, s2, e2, rr["label"]))
                else:
                    dropped_rels += 1
            rows.append(
                {
                    "doc_key": doc_key,
                    "tokens": tokens,
                    "ner": [
                        {"start": s, "end": e, "label": lab} for (s, e, lab) in ner
                    ],
                    "relations": [
                        {"s1": s1, "e1": e1, "s2": s2, "e2": e2, "label": lab}
                        for (s1, e1, s2, e2, lab) in sorted(rels)
                    ],
                    "dropped_entities": dropped,
                    "dropped_relations": dropped_rels,
                }
            )
        if not rows:
            return pd.DataFrame(
                columns=["doc_key", "tokens", "ner", "relations",
                         "dropped_entities", "dropped_relations"]
            )
        return pd.DataFrame(rows)

    return partitioned_map_groups(all_rows, "doc_key", build, num_buckets)
