"""Distributed Bloom filter for join pre-filtering.

The classic shuffle reducer for semi/anti joins: build a bitmap over
the (smaller) key side with one pass — per-block partial bitmaps,
OR-combined through a fan-in-capped tree of Ray tasks so the driver
receives ONE bitmap — broadcast it via ``ray.put``, and pre-filter the
probe side inside ``map_batches`` before any exchange.  For an ANTI
join the filter is exact-negative: a key the filter rejects provably
has no match and can bypass the shuffle entirely; only Bloom-positive
rows (true matches + false positives) ride the exchange for the exact
check.  At 1% FP rate and low match rates this removes almost all
shuffle bytes.

Hashing is double hashing over two independent 64-bit mixes
(g_i = h1 + i*h2 mod m), vectorized in numpy; keys are hashed by VALUE
via ``pd.util.hash_array`` so the filter is deterministic across block
layouts and engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

_FANIN = 8


def _hash2(values) -> tuple[np.ndarray, np.ndarray]:
    arr = np.asarray(values, dtype=object)
    h1 = pd.util.hash_array(arr, categorize=False)
    h2 = pd.util.hash_array(arr, hash_key="b10om-pref1lter2", categorize=False)
    return h1, h2 | np.uint64(1)  # odd step -> full-period probing


def _set_bits(bits: np.ndarray, values, k: int) -> None:
    m = np.uint64(bits.size * 64)
    h1, h2 = _hash2(values)
    for i in range(k):
        g = (h1 + np.uint64(i) * h2) % m
        np.bitwise_or.at(bits, (g >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (g & np.uint64(63)))


def _test_bits(bits: np.ndarray, values, k: int) -> np.ndarray:
    m = np.uint64(bits.size * 64)
    h1, h2 = _hash2(values)
    hit = np.ones(len(h1), dtype=bool)
    for i in range(k):
        g = (h1 + np.uint64(i) * h2) % m
        word = bits[(g >> np.uint64(6)).astype(np.int64)]
        hit &= (word >> (g & np.uint64(63))) & np.uint64(1) != 0
    return hit


@ray.remote
def _or_reduce(*parts: np.ndarray) -> np.ndarray:
    out = parts[0].copy()
    for p in parts[1:]:
        np.bitwise_or(out, p, out=out)
    return out


@ray.remote
def _blocks_to_bits(n_words: int, *blocks) -> np.ndarray:
    """OR the per-batch bitmaps stored in raw partial blocks."""
    import pyarrow as pa

    out = np.zeros(n_words, dtype=np.uint64)
    for b in blocks:
        # Ray Data passes EMPTY blocks through UDFs untouched, so a
        # zero-row upstream block arrives here with the INPUT schema
        # (no "bits" column) — skip it instead of KeyError-ing the
        # whole bloom build (reachable whenever a filter empties a
        # block; latent-only on all-empty inputs where nothing ever
        # ray.gets the bitmap)
        if isinstance(b, pa.Table):
            col = (b.column("bits").to_pylist()
                   if "bits" in b.schema.names else [])
        else:
            col = b["bits"] if "bits" in b.columns else []
        for buf in col:
            np.bitwise_or(out, np.frombuffer(buf, dtype=np.uint64), out=out)
    return out


def build_bloom(
    ds: ray.data.Dataset, key: str, m_bits: int = 1 << 23, k: int = 4
):
    """One pass over ``ds[key]`` -> ObjectRef of the final uint64 bitmap
    (ray.put-broadcast; read it zero-copy inside map_batches tasks).
    Default 8M bits / 4 hashes ~= 1% FP at ~870k distinct keys; size
    m_bits ~ 10x expected distinct keys for ~1%."""
    n_words = m_bits // 64

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(n_words, dtype=np.uint64)
        if len(df):
            _set_bits(bits, df[key].to_numpy(), k)
        return pd.DataFrame({"bits": [bits.tobytes()]})

    part_ds = ds.map_batches(partial, batch_format="pandas")
    block_refs = [
        ref
        for bundle in part_ds.iter_internal_ref_bundles()
        for ref, _meta in bundle.blocks
    ]
    if not block_refs:
        return ray.put(np.zeros(n_words, dtype=np.uint64))
    # level 0: blocks -> bitmaps; then a fan-in-capped OR tree — the
    # driver holds O(refs), never a bitmap per block
    refs = [
        _blocks_to_bits.remote(n_words, *block_refs[i:i + _FANIN])
        for i in range(0, len(block_refs), _FANIN)
    ]
    while len(refs) > 1:
        refs = [
            _or_reduce.remote(*refs[i:i + _FANIN])
            for i in range(0, len(refs), _FANIN)
        ]
    return refs[0]


def split_by_bloom(
    ds: ray.data.Dataset, key: str, bloom_ref, k: int = 4,
    materialize: bool = True,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """(maybe_in, definitely_not_in): rows whose key the filter accepts
    (needs the exact downstream check) vs provably-unmatched rows.

    The two outputs are independent datasets over the same input;
    ``materialize=True`` (default) pins ``ds`` once so its lineage
    (read + decode) doesn't execute twice — pass False only when the
    input is already materialized or cheaper to recompute than to
    store."""
    if materialize:
        ds = ds.materialize()

    def keep(df: pd.DataFrame, positive: bool) -> pd.DataFrame:
        if len(df) == 0 or key not in df.columns:
            return df
        bits = ray.get(bloom_ref)
        hit = _test_bits(bits, df[key].to_numpy(), k)
        return df[hit] if positive else df[~hit]

    pos = ds.map_batches(
        lambda df: keep(df, True), batch_format="pandas"
    )
    neg = ds.map_batches(
        lambda df: keep(df, False), batch_format="pandas"
    )
    return pos, neg
