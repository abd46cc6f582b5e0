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


def ts_epoch_us(s: pd.Series) -> np.ndarray:
    """Epoch microseconds from a timestamp column, independent of the
    arrow->pandas conversion unit (timestamp[us] may surface as
    datetime64[ns] under some configurations — a bare
    ``astype('int64')`` would then silently hold nanoseconds).  A
    tz-aware column (DatetimeTZDtype is NOT an np.datetime64 subdtype)
    is normalized to UTC-naive first, so it takes the unit-correct
    branch instead of falling through to raw int64 nanoseconds."""
    if isinstance(s.dtype, pd.DatetimeTZDtype):
        s = s.dt.tz_convert("UTC").dt.tz_localize(None)
    if np.issubdtype(s.dtype, np.datetime64):
        return s.astype("datetime64[us]").astype("int64").to_numpy()
    return s.astype("int64").to_numpy()


def stable_bucket(values, num_buckets: int) -> np.ndarray:
    """Deterministic hash bucket per value (stringable array-like)."""
    arr = np.asarray(values, dtype=object)
    h = pd.util.hash_array(arr, categorize=False)
    return (h % np.uint64(num_buckets)).astype(np.int32)


def grouped_pair_indices(group_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All positional index pairs (i < j) within runs of equal
    ``group_ids`` (which must be sorted / run-grouped) — the shared
    vectorized all-pairs-within-group expansion.  A per-group Python
    loop with ``np.triu_indices`` costs ~150 s building ~40M triangle
    wedges at sf0.1; this form is pure numpy.  Returns (li, rj) index
    arrays into the input's positions; callers index their value
    columns with them."""
    n = len(group_ids)
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    new = np.concatenate([[True], group_ids[1:] != group_ids[:-1]])
    starts = np.flatnonzero(new)
    run_len = np.diff(np.concatenate([starts, [n]]))
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, run_len)
    run_id = np.cumsum(new) - 1
    left_rep = run_len[run_id] - pos - 1
    total = int(left_rep.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    li = np.repeat(np.arange(n, dtype=np.int64), left_rep)
    cum = np.concatenate([[0], np.cumsum(left_rep)])
    rj = (np.arange(total, dtype=np.int64)
          - np.repeat(cum[:-1], left_rep) + li + 1)
    return li, rj


# Max ObjectRef arguments per concat/merge task.  At 100 TB / 128 MiB
# blocks the upstream is ~800k blocks; a flat merge would put every one
# of them in ONE task spec.  The tree-reduce below caps task fan-in at
# this constant, giving O(log_F n_blocks) levels of pairwise-parallel
# concats instead (module-level so tests can shrink it to exercise
# multi-level trees with small inputs).
MERGE_FANIN = 512

# Exchange sizing rules (VERDICT r2 findings #3/#4, r3 #3).
#
# * Auto bucket count: when the caller does not pass ``num_buckets``,
#   splitting starts IMMEDIATELY at MIN_AUTO_BUCKETS and the bucket
#   count doubles whenever the bytes seen so far exceed
#   ``bucket_count x TARGET_BUCKET_BYTES`` (so each root merge
#   concatenates ~<= TARGET_BUCKET_BYTES at any scale) — no
#   collect-all-metadata pass, splits overlap upstream execution, and
#   earlier coarse generations are reconciled with one extra re-split
#   pass over their already-resident outputs (geometrically bounded).
# * Bounded driver ref inventory: split outputs are folded into the
#   per-bucket concat tree INCREMENTALLY as they are launched (a
#   binary-carry ladder of fan-in MERGE_FANIN), so the driver holds
#   O(num_buckets x MERGE_FANIN x log_F(n_blocks)) refs at peak instead
#   of collecting all O(n_blocks x num_buckets) split refs before
#   reducing (~51M at 800k blocks x 64 buckets).
# * Micro-block coalescing: a split task handles a GROUP of consecutive
#   blocks only while the group stays tiny (< TARGET_SPLIT_BYTES) —
#   normal-sized blocks (100 TB regime: ~128 MB) split one task per
#   block, preserving split parallelism and upstream overlap; floods of
#   kilobyte blocks (skewed upstream outputs) coalesce instead of
#   paying per-task overhead.
TARGET_BUCKET_BYTES = 256 << 20
TARGET_SPLIT_BYTES = 8 << 20
MAX_SPLIT_GROUP_BLOCKS = 64
MIN_AUTO_BUCKETS = 8
MAX_AUTO_BUCKETS = 1024


def _iter_blocks(ds: ray.data.Dataset):
    """Execute ``ds`` (the exchange is eager) and yield its blocks as
    ``(ObjectRef, size_bytes)`` pairs AS THEY ARE PRODUCED, so split
    tasks overlap upstream execution."""
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            yield ref, getattr(meta, "size_bytes", None) or 0


def _collect_blocks(ds: ray.data.Dataset) -> list:
    return list(_iter_blocks(ds))


def _iter_split_groups(blocks_iter):
    """Group upstream blocks for shared split tasks: normal blocks get
    their own task (preserving split parallelism and upstream overlap);
    only micro-block floods coalesce, bounded by MAX_SPLIT_GROUP_BLOCKS
    refs or TARGET_SPLIT_BYTES bytes per task.  Yields ``(group,
    group_bytes)``.  Single home of the coalescing policy for both the
    streaming exchange and :func:`split_refs`."""
    group: list = []
    gbytes = 0
    for ref, sz in blocks_iter:
        group.append(ref)
        gbytes += sz
        if len(group) >= MAX_SPLIT_GROUP_BLOCKS or gbytes >= TARGET_SPLIT_BYTES:
            yield group, gbytes
            group, gbytes = [], 0
    if group:
        yield group, gbytes


def _new_levels(num_buckets: int) -> list:
    return [[[]] for _ in range(num_buckets)]


def _ladder_add(levels: list, concat, b: int, ref, lvl: int = 0):
    """Incremental binary-carry concat ladder: when a level accumulates
    MERGE_FANIN refs they collapse into one concat task and carry to the
    next level — every row passes through O(log_F n_blocks) concats and
    the driver's ref inventory stays bounded at any block count."""
    L = levels[b]
    if len(L) <= lvl:
        L.append([])
    L[lvl].append(ref)
    if len(L[lvl]) >= MERGE_FANIN:
        folded = concat.remote(*L[lvl])
        L[lvl] = []
        _ladder_add(levels, concat, b, folded, lvl + 1)


def _ladder_refs(levels: list, b: int) -> list:
    return [r for lvl in levels[b] for r in lvl]


def _stream_split_merge(blocks_iter, key: str, num_buckets: int, concat):
    """Launch split tasks as upstream blocks arrive and fold each
    bucket's split outputs through the incremental concat ladder.
    Returns one ref list per bucket (ready for the root merge), or None
    if the upstream produced zero blocks."""
    split = _make_split(key, num_buckets)
    levels = _new_levels(num_buckets)
    n_groups = 0
    for group, _gbytes in _iter_split_groups(blocks_iter):
        n_groups += 1
        refs = split.options(num_returns=num_buckets).remote(*group)
        refs = (refs,) if num_buckets == 1 else refs
        for b in range(num_buckets):
            _ladder_add(levels, concat, b, refs[b])
    if n_groups == 0:
        return None
    # Leftovers across ladder levels can total up to (MERGE_FANIN-1) x
    # levels refs; fold them so the ROOT merge also honors the fan-in
    # cap (its task spec must stay bounded at any block count).
    return [
        _tree_reduce(_ladder_refs(levels, b), concat)
        for b in range(num_buckets)
    ]


@ray.remote
def _resplit(key: str, num_buckets: int, b_old: int, old_buckets: int, *tables):
    """Re-split an earlier-generation bucket (built with ``old_buckets``)
    into its ``num_buckets // old_buckets`` final buckets.  Valid because
    bucket counts only ever double: ``h % B_old == (h % B_new) % B_old``
    whenever ``B_old`` divides ``B_new``, so every row of old bucket
    ``b_old`` lands in a final bucket ``b_old + i * B_old``."""
    fan = num_buckets // old_buckets
    nonempty = [t for t in tables if t.num_rows]
    tbl = pa.concat_tables(
        nonempty if nonempty else list(tables[:1]), promote_options="default"
    )
    if key not in tbl.schema.names or tbl.num_rows == 0:
        empty = tbl.slice(0, 0)
        return empty if fan == 1 else tuple(empty for _ in range(fan))
    col = tbl[key].to_pandas().to_numpy()
    b = stable_bucket(col, num_buckets)
    # positions of the fan final buckets for this old bucket
    sub = (b - b_old) // old_buckets  # in [0, fan): exact since b % old == b_old
    order = np.argsort(sub, kind="stable")
    tbl = tbl.take(pa.array(order))
    ss = sub[order]
    offs = np.searchsorted(ss, np.arange(fan + 1))
    out = [tbl.slice(offs[i], offs[i + 1] - offs[i]) for i in range(fan)]
    return out[0] if fan == 1 else tuple(out)


def _stream_gens(blocks_iter, key: str, concat):
    """Auto-sized streaming split: start splitting IMMEDIATELY at
    MIN_AUTO_BUCKETS and double the bucket count whenever the bytes seen
    so far exceed ``bucket_count x TARGET_BUCKET_BYTES`` — no
    collect-all-metadata pass, so split tasks overlap upstream execution
    on the auto path too (VERDICT r3 #3).  Each bucket-count change
    closes a *generation*; earlier generations are reconciled by
    :func:`_gens_to_buckets` with one extra split pass over their
    (already object-store-resident) outputs.  Returns ``(B_final,
    generations)`` where generations is a list of ``(B_g, levels)``
    with the final generation last, or ``(None, None)`` on zero
    blocks."""
    B = MIN_AUTO_BUCKETS
    # generation reconciliation requires every B_g | B_final — doubling
    # from MIN preserves it iff the ceiling is MIN x a power of two
    cap = MIN_AUTO_BUCKETS
    while cap * 2 <= MAX_AUTO_BUCKETS:
        cap *= 2
    split = _make_split(key, B)
    gens: list[tuple[int, list]] = []
    levels = _new_levels(B)
    seen = 0
    n_groups = 0
    for group, gbytes in _iter_split_groups(blocks_iter):
        if seen > B * TARGET_BUCKET_BYTES and B < cap:
            gens.append((B, levels))
            while seen > B * TARGET_BUCKET_BYTES and B < cap:
                B *= 2
            split = _make_split(key, B)
            levels = _new_levels(B)
        n_groups += 1
        seen += gbytes
        refs = split.options(num_returns=B).remote(*group)
        refs = (refs,) if B == 1 else refs
        for b in range(B):
            _ladder_add(levels, concat, b, refs[b])
    if n_groups == 0:
        return None, None
    gens.append((B, levels))
    return B, gens


def _gens_to_buckets(gens: list, num_buckets: int, key: str, concat) -> list:
    """Fold generations into per-bucket ref lists at ``num_buckets``
    (which every generation's bucket count must divide).  The final
    generation's refs route directly; earlier (coarser) generations pay
    one re-split task per folded ref — bounded extra work over data
    that is already in the object store."""
    per_bucket: list[list] = [[] for _ in range(num_buckets)]
    for B_g, levels in gens:
        if B_g == num_buckets:
            for b in range(num_buckets):
                per_bucket[b].extend(_ladder_refs(levels, b))
            continue
        fan = num_buckets // B_g
        for b_old in range(B_g):
            refs = _tree_reduce(_ladder_refs(levels, b_old), concat)
            if not refs:
                continue
            outs = _resplit.options(num_returns=fan).remote(
                key, num_buckets, b_old, B_g, *refs
            )
            outs = (outs,) if fan == 1 else outs
            for i in range(fan):
                per_bucket[b_old + i * B_g].append(outs[i])
    return [_tree_reduce(refs, concat) for refs in per_bucket]


def _empty_like(ds: ray.data.Dataset) -> ray.data.Dataset:
    """0-row single-block dataset carrying ``ds``'s schema when it is
    known (column-less otherwise) — the result of an exchange over a
    dataset that produced zero blocks (previously: ``pa.concat_tables``
    of no parts raised inside the merge task)."""
    try:
        sch = ds.schema(fetch_if_missing=True)
        arrow = getattr(sch, "base_schema", None)
        if isinstance(arrow, pa.Schema):
            return ray.data.from_arrow([arrow.empty_table()])
    except Exception:
        pass
    return ray.data.from_arrow([pa.table({})])


def hash_exchange(
    ds: ray.data.Dataset,
    key: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame | pa.Table],
    num_buckets: int | None = None,
    fn_format: str = "pandas",
) -> ray.data.Dataset:
    """Explicit all-to-all hash exchange with raw Ray tasks.

    Upstream blocks are split into ``num_buckets`` zero-copy Arrow
    slices as they stream out of the upstream (one split task per
    block; floods of micro-blocks coalesce per the sizing notes above);
    each bucket's split outputs fold through an INCREMENTAL concat tree
    (fan-in capped at ``MERGE_FANIN`` refs per task, levels collapse as
    they fill, so both task-spec size and the driver's ref inventory
    stay bounded at any block count) with ``fn`` applied once at the
    root.  ``num_buckets=None`` (default) derives the bucket count from
    the upstream's byte size so each root merge concatenates <=
    ~``TARGET_BUCKET_BYTES``.  No sampling pass, no
    sort machinery — measured ~4x faster than
    ``groupby(bucket).map_groups`` on this Ray version and it scales
    with CPUs (split/concat/merge tasks are embarrassingly parallel).

    ``fn_format="pyarrow"`` hands ``fn`` the concatenated
    ``pa.Table`` directly — no Arrow->pandas round-trip for callbacks
    that work in Arrow/numpy (the hot assembly path uses this; the box
    is memory-bandwidth-bound, so fewer copies is the single-node
    lever).

    This is the one place the engine drops below the Dataset API: the
    Dataset groupby expresses the same semantics but its sort-based
    shuffle dominates wall time (SURVEY.md §4 shuffle discussion).
    Partitioning assumption: ``fn`` sees ALL rows whose ``key`` hashes
    to its bucket, exactly once.  Upstream blocks stream into split
    tasks as they are produced; the returned Dataset's blocks are the
    pending merge outputs (execution of the exchange is eager, the
    merges themselves are async).
    """

    def _concat(parts):
        nonempty = [p for p in parts if p.num_rows]
        base = nonempty if nonempty else list(parts[:1])
        return base, pa.concat_tables(base, promote_options="default")

    @ray.remote
    def concat(*parts):
        # inner tree node: pure concatenation, no fn
        _, tbl = _concat(parts)
        return tbl.combine_chunks()

    @ray.remote
    def merge(*parts):
        base, tbl = _concat(parts)
        inp = tbl if fn_format == "pyarrow" else tbl.to_pandas()
        try:
            out = fn(inp)
        except Exception:
            if tbl.num_rows == 0:
                # empty bucket whose schema lost computed columns upstream
                # (Ray Data skips UDFs on empty blocks) — emit 0 rows
                return base[0]
            raise
        if isinstance(out, pd.DataFrame):
            return pa.Table.from_pandas(out, preserve_index=False)
        return out

    if num_buckets is None:
        # streaming auto-sizing: splits launch as upstream blocks arrive
        # (doubling generations, reconciled at the end) — same overlap
        # as the explicit-bucket path
        num_buckets, gens = _stream_gens(_iter_blocks(ds), key, concat)
        if gens is None:
            return _empty_like(ds)
        per_bucket = _gens_to_buckets(gens, num_buckets, key, concat)
    else:
        per_bucket = _stream_split_merge(_iter_blocks(ds), key, num_buckets, concat)
    if per_bucket is None:
        return _empty_like(ds)
    merged = [merge.remote(*refs) for refs in per_bucket]
    return ray.data.from_arrow_refs(merged)


def _make_split(key: str, num_buckets: int):
    @ray.remote
    def split(*blocks, key=key, B=num_buckets):
        # one task splits a GROUP of consecutive blocks (two-level split:
        # bounds the driver's ref inventory; see sizing notes above)
        parts: list[list] = [[] for _ in range(B)]
        fallback = None
        for block in blocks:
            tbl = (
                block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
            )
            if fallback is None:
                fallback = tbl.slice(0, 0)
            if key not in tbl.schema.names or tbl.num_rows == 0:
                continue
            col = tbl[key].to_pandas().to_numpy()
            b = stable_bucket(col, B)
            order = np.argsort(b, kind="stable")
            tbl = tbl.take(pa.array(order))
            bs = b[order]
            offs = np.searchsorted(bs, np.arange(B + 1))
            for i in range(B):
                sl = tbl.slice(offs[i], offs[i + 1] - offs[i])
                if sl.num_rows:
                    parts[i].append(sl)
        out = []
        for i in range(B):
            if len(parts[i]) > 1:
                out.append(pa.concat_tables(parts[i], promote_options="default"))
            elif parts[i]:
                out.append(parts[i][0])
            else:
                out.append(fallback)
        return out[0] if B == 1 else tuple(out)

    return split


def _split_refs(ds: ray.data.Dataset, key: str, num_buckets: int) -> list:
    return _launch_group_splits(_collect_blocks(ds), key, num_buckets)


def _launch_group_splits(blocks: list, key: str, num_buckets: int) -> list:
    split = _make_split(key, num_buckets)
    out = []
    for group, _gbytes in _iter_split_groups(blocks):
        refs = split.options(num_returns=num_buckets).remote(*group)
        out.append((refs,) if num_buckets == 1 else refs)
    return out


def split_refs(ds: ray.data.Dataset, key: str, num_buckets: int) -> list:
    """Public handle for pre-splitting one exchange side so several
    :func:`hash_coexchange` calls can share it (``splits_b=``)."""
    return _split_refs(ds, key, num_buckets)


def _tree_reduce(refs: list, concat) -> list:
    while len(refs) > MERGE_FANIN:
        refs = [
            concat.remote(*refs[i : i + MERGE_FANIN])
            for i in range(0, len(refs), MERGE_FANIN)
        ]
    return refs


def hash_coexchange(
    ds_a: ray.data.Dataset,
    ds_b: ray.data.Dataset,
    key_a: str,
    key_b: str,
    fn,
    num_buckets: int | None = None,
    fn_format: str = "pandas",
    splits_b: list | None = None,
) -> ray.data.Dataset:
    """Two-sided keyed exchange: both datasets hash-partition with the
    SAME deterministic bucketing (rows of ``ds_a`` whose ``key_a``
    equals some ``key_b`` of ``ds_b`` land in the same bucket), and
    ``fn(bucket_a, bucket_b)`` runs once per bucket.

    ``splits_b`` (from :func:`split_refs`) reuses an already-split b
    side across several exchanges — the exchange is eager, so passing
    the same Dataset twice would re-execute its lineage; splitting once
    shares the object-store copies instead.

    This replaces the tagged-union join pattern (tag both sides with a
    ``kind`` column, union, filter inside the bucket): each side keeps
    its OWN schema end to end — no cross-side schema promotion, no
    int->float corruption from null-padded columns, no Ray Data
    schema-mismatch warnings.  Same tree-merge fan-in bound and
    empty-block tolerance as :func:`hash_exchange`; ``fn`` must still
    tolerate an empty side whose computed columns are missing (Ray Data
    passes empty blocks through upstream UDFs untouched)."""

    @ray.remote
    def concat(*parts):
        nonempty = [p for p in parts if p.num_rows]
        base = nonempty if nonempty else list(parts[:1])
        return pa.concat_tables(base, promote_options="default").combine_chunks()

    def _concat_local(parts):
        nonempty = [p for p in parts if p.num_rows]
        base = nonempty if nonempty else list(parts[:1])
        return pa.concat_tables(base, promote_options="default")

    @ray.remote
    def merge2(n_a, *parts):
        ta = _concat_local(parts[:n_a])
        tb = _concat_local(parts[n_a:])
        try:
            if fn_format == "pyarrow":
                out = fn(ta, tb)
            else:
                out = fn(ta.to_pandas(), tb.to_pandas())
        except Exception:
            if ta.num_rows == 0 and tb.num_rows == 0:
                # both sides empty with computed columns missing upstream
                # (Ray Data skips UDFs on empty blocks) — enforce the
                # empty-tolerance contract centrally like hash_exchange
                return ta.slice(0, 0)
            raise
        if isinstance(out, pd.DataFrame):
            return pa.Table.from_pandas(out, preserve_index=False)
        return out

    if num_buckets is None:
        if splits_b is not None:
            raise ValueError(
                "num_buckets must be explicit when reusing splits_b "
                "(the pre-split side fixed the bucket count)"
            )
        # both sides stream independently (each doubling on its own
        # byte count); the final bucket count is the max of the two —
        # a multiple of every generation on both sides, so the
        # generation reconciler aligns them
        B_a, gens_a = _stream_gens(_iter_blocks(ds_a), key_a, concat)
        B_b, gens_b = _stream_gens(_iter_blocks(ds_b), key_b, concat)
        num_buckets = max(B_a or MIN_AUTO_BUCKETS, B_b or MIN_AUTO_BUCKETS)
        pb_a = (
            _gens_to_buckets(gens_a, num_buckets, key_a, concat)
            if gens_a is not None else None
        )
        pb_b = (
            _gens_to_buckets(gens_b, num_buckets, key_b, concat)
            if gens_b is not None else None
        )
    else:
        pb_a = _stream_split_merge(_iter_blocks(ds_a), key_a, num_buckets, concat)
        if splits_b is None:
            pb_b = _stream_split_merge(
                _iter_blocks(ds_b), key_b, num_buckets, concat
            )
        else:
            # legacy per-group tuple shape from split_refs (shared side)
            pb_b = (
                [_tree_reduce([s[b] for s in splits_b], concat)
                 for b in range(num_buckets)]
                if splits_b else None
            )
    if pb_a is None and pb_b is None:
        return _empty_like(ds_a)
    # a zero-block SIDE still participates (fn may emit rows from the
    # other side alone — e.g. label carry-forward in connected
    # components): stand in a column-less empty table for it
    if pb_a is None or pb_b is None:
        empty_side = ray.put(pa.table({}))
        if pb_a is None:
            pb_a = [[empty_side] for _ in range(num_buckets)]
        else:
            pb_b = [[empty_side] for _ in range(num_buckets)]
    merged = []
    for b in range(num_buckets):
        merged.append(merge2.remote(len(pb_a[b]), *pb_a[b], *pb_b[b]))
    return ray.data.from_arrow_refs(merged)


def partitioned_map_groups(
    ds: ray.data.Dataset,
    key: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame | pa.Table],
    num_buckets: int | None = None,
    bucket_col: str = "__bucket",
    impl: str = "hash",
    fn_format: str = "pandas",
) -> ray.data.Dataset:
    """Hash-partition ``ds`` on ``key`` and apply ``fn`` once per bucket.

    ``fn`` receives ALL rows sharing a bucket (a superset grouping of the
    logical key) as one pandas DataFrame and must do its own per-key
    vectorized grouping (and must tolerate an empty frame with the input
    schema).  This is the explicit partitioned-shuffle pattern: one
    all-to-all exchange, Python overhead O(num_buckets) not O(n_groups).
    Skewed logical keys can be pre-salted by the caller (canonicalization
    does: salt = hash(doc_key) % S as a sub-key).

    ``impl="hash"`` (default) uses :func:`hash_exchange`;
    ``impl="sort"`` uses the pure Dataset API
    (``groupby(bucket).map_groups`` — lazy, but sort-shuffle-bound).
    """
    if impl == "hash":
        return hash_exchange(ds, key, fn, num_buckets, fn_format=fn_format)
    if num_buckets is None:
        num_buckets = 64  # sort impl needs a concrete bucket column
    if fn_format == "pyarrow":
        inner = fn
        fn = lambda df: inner(pa.Table.from_pandas(df, preserve_index=False))  # noqa: E731

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[bucket_col] = stable_bucket(batch[key].to_numpy(), num_buckets)
        return batch

    def run(group: pd.DataFrame) -> pd.DataFrame | pa.Table:
        group = group.drop(columns=[bucket_col])
        return fn(group)

    with_bucket = ds.map_batches(add_bucket, batch_format="pandas")
    return with_bucket.groupby(bucket_col).map_groups(run, batch_format="pandas")


def assert_unique(ds: ray.data.Dataset, cols: list[str], num_buckets: int = 16) -> ray.data.Dataset:
    """D1: distributed uniqueness check on a column tuple — raises on the
    first duplicate (the reference asserts adjacency-index uniqueness,
    ``adjacency_field_assym.py:62-63``).  Returns the dataset of
    per-bucket duplicate counts (all zero) so the check composes lazily."""

    def check(df: pd.DataFrame) -> pd.DataFrame:
        if len(df):
            dup = df.duplicated(cols)
            if dup.any():
                sample = df.loc[dup, cols].head(3).to_dict("records")
                raise ValueError(f"duplicate keys on {cols}: {sample}")
        return pd.DataFrame({"dups": [0]})

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        key = df[cols[0]].astype(str)
        for c in cols[1:]:
            key = key.str.cat(df[c].astype(str), sep="\x1f")
        df["__ukey"] = key
        return df

    return partitioned_map_groups(
        ds.map_batches(keyed, batch_format="pandas"),
        "__ukey",
        check,
        num_buckets,
    )


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
