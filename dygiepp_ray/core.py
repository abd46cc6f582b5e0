"""Core Ray Data helpers shared by every stage.

Scale notes (the point of this engine):

* ``partitioned_map_groups`` is the one shuffle primitive: it hash-buckets
  rows by a key column into ``num_buckets`` groups and runs a vectorized
  pandas function ONCE PER BUCKET (not once per logical group), so the
  per-group Python overhead of ``GroupedData.map_groups`` is amortized —
  a bucket holds thousands of conversations and the body works on them
  with vectorized pandas/numpy.  All wide steps (conversation assembly,
  canonicalization, triple dedup, connected components, sessionization)
  go through it with an explicit, documented key.
* ``stable_bucket`` uses pandas' fixed-key siphash (``pd.util.hash_array``)
  so bucket ids are deterministic across processes and runs — required
  for resumable, idempotent partition output (SURVEY.md §4 checkpoint
  design).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def stable_bucket(values, num_buckets: int) -> np.ndarray:
    """Deterministic hash bucket per value (stringable array-like)."""
    arr = np.asarray(values, dtype=object)
    h = pd.util.hash_array(arr, categorize=False)
    return (h % np.uint64(num_buckets)).astype(np.int32)


def partitioned_map_groups(
    ds: ray.data.Dataset,
    key: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame | pa.Table],
    num_buckets: int = 64,
    bucket_col: str = "__bucket",
) -> ray.data.Dataset:
    """Hash-partition ``ds`` on ``key`` and apply ``fn`` once per bucket.

    ``fn`` receives ALL rows sharing a bucket (a superset grouping of the
    logical key) as one pandas DataFrame and must do its own per-key
    vectorized grouping.  This is the explicit partitioned-shuffle
    pattern: one all-to-all exchange, Python overhead O(num_buckets) not
    O(n_groups).  Skewed logical keys can be pre-salted by the caller
    (canonicalization does: salt = hash(doc_key) % S as a sub-key).
    """

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[bucket_col] = stable_bucket(batch[key].to_numpy(), num_buckets)
        return batch

    def run(group: pd.DataFrame) -> pd.DataFrame | pa.Table:
        group = group.drop(columns=[bucket_col])
        return fn(group)

    with_bucket = ds.map_batches(add_bucket, batch_format="pandas")
    return with_bucket.groupby(bucket_col).map_groups(run, batch_format="pandas")


def list_offsets(list_array: pa.Array) -> np.ndarray:
    """int64 offsets of a (Large)ListArray, handling chunked input."""
    if isinstance(list_array, pa.ChunkedArray):
        list_array = list_array.combine_chunks()
    return np.asarray(list_array.offsets)


def flatten_with_parent(
    table: pa.Table, list_col: str, parent_cols: list[str]
) -> pa.Table:
    """Explode a list column into one row per element, repeating
    ``parent_cols`` (vectorized: list_parent_indices + take)."""
    import pyarrow.compute as pc

    col = table[list_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parents = pc.list_parent_indices(col)
    flat = pc.list_flatten(col)
    cols = {c: table[c].take(parents) for c in parent_cols}
    if pa.types.is_struct(flat.type):
        out = pa.table(cols)
        for f in flat.type:
            out = out.append_column(f.name, flat.field(f.name))
        return out
    cols[list_col] = flat
    return pa.table(cols)
