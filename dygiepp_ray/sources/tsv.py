"""ChemProt-style three-table TSV reader (SURVEY.md S8, J3, M12, F9).

The reference reads abstracts / entities / relations TSVs with pandas
and joins them per ``doc_key``
(``scripts/data/chemprot/02_chemprot_to_input.py:93-97,147-170``), with
char->token alignment dropping misaligned entities
(``:24-59``), label rewrites like ``GENE-Y -> GENE`` (``:25-28,66-67``)
and ``Arg1:`` prefix stripping (F9).

Ray-Data-first shape: three ``read_csv`` Datasets joined with TWO
``hash_coexchange`` keyed exchanges on ``doc_key`` (entities into
abstracts, then relations into the aligned docs).  Each side keeps its
own schema — no tagged union, so entity int offsets never get
null-padded/float-promoted on the abstract rows.  The resolved entity
map rides between the exchanges as one JSON string column per doc
(scalar columns only across an exchange).
"""

from __future__ import annotations

import json

import pandas as pd

import ray.data

from ..core import hash_coexchange
from .brat import _token_char_spans

LABEL_MAP = {"GENE-Y": "GENE", "GENE-N": "GENE"}

_FINAL_COLS = [
    "doc_key", "tokens", "ner", "relations",
    "dropped_entities", "dropped_relations",
]


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

    def join_ents(ab: pd.DataFrame, ent: pd.DataFrame) -> pd.DataFrame:
        if len(ab) == 0 or "doc_key" not in ab.columns:
            return pd.DataFrame(
                columns=["doc_key", "tokens", "ner", "ents", "dropped_entities"]
            )
        ent_by = (
            {k: g for k, g in ent.groupby("doc_key", sort=False)}
            if len(ent) and "doc_key" in ent.columns
            else {}
        )
        rows = []
        for _, ar in ab.iterrows():
            doc_key = ar["doc_key"]
            tokens, starts, ends = _token_char_spans(ar["text"])
            ents, dropped = {}, 0
            ge = ent_by.get(doc_key)
            if ge is not None:
                for _, er in ge.iterrows():
                    s, t = int(er["start"]), int(er["end"])
                    if s in starts and t in ends:
                        lab = LABEL_MAP.get(er["label"], er["label"])
                        ents[er["ent_id"]] = (starts[s], ends[t], lab)
                    else:
                        dropped += 1
            rows.append(
                {
                    "doc_key": doc_key,
                    "tokens": tokens,
                    "ner": [
                        {"start": s, "end": e, "label": lab}
                        for (s, e, lab) in sorted(ents.values())
                    ],
                    "ents": json.dumps({k: list(v) for k, v in ents.items()}),
                    "dropped_entities": dropped,
                }
            )
        return pd.DataFrame(rows)

    docs = hash_coexchange(
        abstracts, entities, "doc_key", "doc_key", join_ents, num_buckets
    )

    def join_rels(de: pd.DataFrame, rel: pd.DataFrame) -> pd.DataFrame:
        if len(de) == 0 or "doc_key" not in de.columns:
            return pd.DataFrame(columns=_FINAL_COLS)
        rel_by = (
            {k: g for k, g in rel.groupby("doc_key", sort=False)}
            if len(rel) and "doc_key" in rel.columns
            else {}
        )
        rows = []
        for _, dr in de.iterrows():
            ents = json.loads(dr["ents"])
            rels, dropped_rels = [], 0
            gr = rel_by.get(dr["doc_key"])
            if gr is not None:
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
                    "doc_key": dr["doc_key"],
                    "tokens": dr["tokens"],
                    "ner": dr["ner"],
                    "relations": [
                        {"s1": s1, "e1": e1, "s2": s2, "e2": e2, "label": lab}
                        for (s1, e1, s2, e2, lab) in sorted(rels)
                    ],
                    "dropped_entities": dr["dropped_entities"],
                    "dropped_relations": dropped_rels,
                }
            )
        return pd.DataFrame(rows)

    return hash_coexchange(
        docs, relations, "doc_key", "doc_key", join_rels, num_buckets
    )
