"""Triple emission + exact dedup + graph materialization (SURVEY.md §7.2-7, D5).

``relations -> triples``: each decoded relation mention becomes a
``(conv_id, subj, pred, obj)`` triple with content-addressed entity ids
(``semantics.entity_id`` — no join against the entities table needed).
Exact dedup is two-phase: a vectorized batch-local ``drop_duplicates``
(combiner) shrinks the stream before the one hash shuffle on the triple
key (``groupby(subj,pred,obj).first`` semantics, reference analogue: the
dict-keyed ``relation_dict``, ``document.py:316-320``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .. import semantics as S
from ..core import partitioned_map_groups

TRIPLE_KEY = ["conv_id", "subj", "pred", "obj"]

TRIPLE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("subj_id", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj_id", pa.string()),
        ("obj", pa.string()),
        ("score", pa.float32()),
    ]
)


def _to_triples(batch: pd.DataFrame) -> pd.DataFrame:
    out = pd.DataFrame(
        {
            "conv_id": batch["conv_id"],
            "subj": batch["subj"].str.lower(),
            "pred": batch["label"],
            "obj": batch["obj"].str.lower(),
            "score": batch["softmax"].astype(np.float32),
        }
    )
    # batch-local combiner: dedup before the shuffle
    out = out.drop_duplicates(TRIPLE_KEY, ignore_index=True)
    ids = {s: S.entity_id(s) for s in pd.unique(out[["subj", "obj"]].to_numpy().ravel())}
    out.insert(1, "subj_id", out["subj"].map(ids))
    out.insert(4, "obj_id", out["obj"].map(ids))
    return out


def triples_from_relations(
    relations: ray.data.Dataset, num_buckets: int = 32
) -> ray.data.Dataset:
    """relations table -> globally deduped triples table."""
    local = relations.map_batches(_to_triples, batch_format="pandas")

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__tkey"] = (
            df["conv_id"].str.cat([df["subj"], df["pred"], df["obj"]], sep="\x00")
        )
        return df

    keyed = local.map_batches(add_key, batch_format="pandas")

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates("__tkey", ignore_index=True).drop(columns="__tkey")

    return partitioned_map_groups(keyed, "__tkey", dedup, num_buckets)
