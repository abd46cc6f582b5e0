"""Persisted KG triple store — the "graph materialize" artifact: the
flagship pipeline's triples written as a subject-partitioned parquet
store through the manifested checkpoint writer, so entity point-lookups
read exactly ONE partition directory and a killed save resumes by
skipping manifested partitions.

Reference parity note: the reference emits per-document relation lists
(`dygie/models/relation.py` decode output written by
`predict_dygie.py`); the STORE is the scale-side completion of that —
the same triples, re-keyed for retrieval.  Layout and resume semantics
come from :mod:`dygiepp_ray.state.checkpoint` (`part=N/` directories,
per-partition manifests with row counts + content fingerprints, atomic
tmp-dir renames, `_MANIFEST.json` as the success marker) — the same
machinery the kill-resume pipeline test exercises.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

import ray.data

from ..core import partitioned_map_groups, stable_bucket
from .checkpoint import _part_dir, write_partitioned

_STORE_COLS = {"subj": object, "pred": object, "obj": object,
               "n_convs": np.int64}


def _empty_store_df() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=t)
                         for c, t in _STORE_COLS.items()})


def _rollup(df: pd.DataFrame) -> pd.DataFrame:
    """(conv_id, subj, pred, obj) bucket -> per-triple conv support.
    Global dedup by construction: every copy of a subject co-locates."""
    if len(df) == 0 or "subj" not in df.columns:
        return _empty_store_df()
    g = (df.drop_duplicates()
         .groupby(["subj", "pred", "obj"], as_index=False)["conv_id"]
         .nunique().rename(columns={"conv_id": "n_convs"}))
    g["n_convs"] = g["n_convs"].astype(np.int64)
    return g


def save_kg_store(
    triples: "ray.data.Dataset", path: str, num_buckets: int = 16
) -> dict:
    """Materialize (conv_id, subj, pred, obj) triples into the store:
    ONE subject-keyed exchange rolls up cross-conversation support,
    then the manifested writer lays the rolled rows out as one
    ``part=N`` directory per subject bucket — idempotent per partition
    (a re-run after a crash skips every manifested bucket).  Returns
    the run manifest."""
    rolled = partitioned_map_groups(triples, "subj", _rollup,
                                    num_buckets=num_buckets)
    return write_partitioned(rolled, path, key="subj",
                             num_partitions=num_buckets)


def upsert_kg_store(
    base_path: str,
    delta_triples: "ray.data.Dataset",
    out_path: str,
    num_buckets: int = 16,
) -> dict:
    """Append-only ingest cycle: merge a DELTA batch of triples into a
    persisted store WITHOUT rebuilding from the corpus.  Contract: the
    delta's conversations are disjoint from everything already
    ingested (the at-most-once ingest invariant a streaming KG upsert
    relies on), so per-triple supports ADD.

    The delta rolls up to the store schema on its own subject-keyed
    exchange, unions with the base store rows (a cheap metadata union —
    no shuffle), and the manifested writer's subject partitioning folds
    supports per bucket on the way out.  Cost per cycle is O(base +
    delta) STORE rows (distinct triples — never O(corpus)); a hash
    delta of any size touches ~every subject bucket, so unchanged-
    partition copy-through is deliberately not attempted."""
    delta = partitioned_map_groups(delta_triples, "subj", _rollup,
                                   num_buckets=num_buckets)
    from .checkpoint import completed_partitions, read_partitioned

    if not completed_partitions(base_path):
        # empty base (e.g. first-ever ingest over an empty corpus):
        # the merged store is just the delta
        return write_partitioned(delta, out_path, key="subj",
                                 num_partitions=num_buckets)
    # drop the hive-parsed part column so base and delta union cleanly
    base = read_partitioned(base_path).map_batches(
        lambda df: df.drop(
            columns=[c for c in ("part",) if c in df.columns]),
        batch_format="pandas",
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "subj" not in df.columns:
            return _empty_store_df()
        g = df.groupby(["subj", "pred", "obj"], as_index=False)[
            "n_convs"].sum()
        g["n_convs"] = g["n_convs"].astype(np.int64)
        return g

    merged = partitioned_map_groups(base.union(delta), "subj", merge,
                                    num_buckets=num_buckets)
    return write_partitioned(merged, out_path, key="subj",
                             num_partitions=num_buckets)


def kg_lookup(path: str, subject: str) -> pd.DataFrame:
    """Point lookup against a persisted store: the subject's bucket is
    recomputed from `_MANIFEST.json`'s partition count, so the read
    touches exactly ONE ``part=N`` directory (partition pruning, not
    just row-group stats), then filters to the subject."""
    manifest_path = os.path.join(path, "_MANIFEST.json")
    if not os.path.isfile(manifest_path):
        return _empty_store_df()
    with open(manifest_path) as f:
        num_partitions = int(json.load(f)["num_partitions"])
    bucket = int(stable_bucket(
        np.asarray([subject], dtype=object), num_partitions)[0])
    pdir = _part_dir(path, bucket)
    if not os.path.isdir(pdir):
        return _empty_store_df()
    files = sorted(os.path.join(pdir, f) for f in os.listdir(pdir)
                   if f.endswith(".parquet"))
    import pyarrow.compute as pc

    out = ray.data.read_parquet(
        files, filter=pc.field("subj") == subject
    ).to_pandas()
    if out.empty or "subj" not in out.columns:
        return _empty_store_df()
    # read_parquet hive-parses the part=N directory into a column
    return out.drop(columns=[c for c in ("part",) if c in out.columns])
