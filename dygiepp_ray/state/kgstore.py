"""Persisted KG triple store — the "graph materialize" artifact: the
flagship pipeline's triples written as a subject-partitioned,
subject-sorted parquet directory, so entity point-lookups are parquet
pushdown filters and a later session serves "everything about X"
without re-running extraction.

Reference parity note: the reference emits per-document relation lists
(`dygie/models/relation.py` decode output written by
`predict_dygie.py`); the STORE is the scale-side completion of that —
the same triples, re-keyed for retrieval.  Layout mirrors the other
persisted artifacts (`textops.chunks.save_text_index`,
`textops.ann.save_ivf_index`): one file per exchange bucket
(resumable-output shape — a failed save re-runs only missing
partitions), rows sorted by the partition key inside every file so
row-group statistics prune non-matching files at read time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from ..core import partitioned_map_groups


def save_kg_store(
    triples: "ray.data.Dataset", path: str, num_buckets: int = 16
) -> None:
    """Materialize (conv_id, subj, pred, obj) triples into the store:
    ONE subject-keyed exchange rolls every triple's cross-conversation
    support up in the bucket that owns its subject (global dedup by
    construction), sorts by (subj, pred, obj), and distributed
    ``write_parquet`` emits one file per bucket."""

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "subj" not in df.columns:
            return pd.DataFrame(
                {"subj": pd.Series(dtype=object),
                 "pred": pd.Series(dtype=object),
                 "obj": pd.Series(dtype=object),
                 "n_convs": pd.Series(dtype=np.int64)})
        g = (df.drop_duplicates()
             .groupby(["subj", "pred", "obj"], as_index=False)["conv_id"]
             .nunique().rename(columns={"conv_id": "n_convs"}))
        g["n_convs"] = g["n_convs"].astype(np.int64)
        return g.sort_values(["subj", "pred", "obj"], ignore_index=True)

    store = partitioned_map_groups(triples, "subj", bucket,
                                   num_buckets=num_buckets)
    store.write_parquet(path)


def upsert_kg_store(
    base_path: str,
    delta_triples: "ray.data.Dataset",
    out_path: str,
    num_buckets: int = 16,
) -> None:
    """Append-only ingest cycle: merge a DELTA batch of triples into a
    persisted store WITHOUT rebuilding from the corpus.  Contract: the
    delta's conversations are disjoint from everything already
    ingested (the at-most-once ingest invariant a streaming KG upsert
    relies on), so per-triple supports ADD.

    The delta rolls up to the store schema on its own subject-keyed
    exchange, unions with the base store rows (a cheap metadata union —
    no shuffle), and ONE more subject exchange folds supports and
    restores the sorted layout.  Cost per cycle is O(delta + touched
    store rows), never O(corpus)."""

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "subj" not in df.columns:
            return pd.DataFrame(
                {"subj": pd.Series(dtype=object),
                 "pred": pd.Series(dtype=object),
                 "obj": pd.Series(dtype=object),
                 "n_convs": pd.Series(dtype=np.int64)})
        g = (df.drop_duplicates()
             .groupby(["subj", "pred", "obj"], as_index=False)["conv_id"]
             .nunique().rename(columns={"conv_id": "n_convs"}))
        g["n_convs"] = g["n_convs"].astype(np.int64)
        return g

    delta = partitioned_map_groups(delta_triples, "subj", roll,
                                   num_buckets=num_buckets)
    base = ray.data.read_parquet(base_path)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "subj" not in df.columns:
            return pd.DataFrame(
                {"subj": pd.Series(dtype=object),
                 "pred": pd.Series(dtype=object),
                 "obj": pd.Series(dtype=object),
                 "n_convs": pd.Series(dtype=np.int64)})
        g = df.groupby(["subj", "pred", "obj"], as_index=False)[
            "n_convs"].sum()
        g["n_convs"] = g["n_convs"].astype(np.int64)
        return g.sort_values(["subj", "pred", "obj"], ignore_index=True)

    merged = partitioned_map_groups(base.union(delta), "subj", merge,
                                    num_buckets=num_buckets)
    merged.write_parquet(out_path)


def kg_lookup(path: str, subject: str) -> "ray.data.Dataset":
    """Point lookup against a persisted store: the parquet read carries
    a ``subj == subject`` pushdown, so only the one partition whose
    row-group stats admit the subject leaves storage."""
    import pyarrow.compute as pc

    return ray.data.read_parquet(path, filter=pc.field("subj") == subject)
