"""Core exchange primitives: stable bucketing, hash exchange vs the
Dataset-API sort implementation (must agree exactly)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from dygiepp_ray.core import hash_exchange, partitioned_map_groups, stable_bucket


def test_stable_bucket_deterministic():
    a = stable_bucket(np.array(["x", "y", "z"], dtype=object), 8)
    b = stable_bucket(np.array(["x", "y", "z"], dtype=object), 8)
    assert (a == b).all()
    assert ((a >= 0) & (a < 8)).all()


def test_stable_bucket_spreads():
    keys = np.array([f"k{i}" for i in range(1000)], dtype=object)
    b = stable_bucket(keys, 16)
    counts = np.bincount(b, minlength=16)
    assert (counts > 20).all()  # roughly uniform


@pytest.mark.parametrize("impl", ["hash", "sort"])
def test_partitioned_map_groups_collects_all_keys(ray_session, impl):
    df = pd.DataFrame({"k": [f"g{i % 7}" for i in range(500)], "v": range(500)})
    ds = rd.from_pandas(df).repartition(8)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("k", sort=False)["v"].agg(["sum", "size"]).reset_index()
        return out.rename(columns={"sum": "s", "size": "n"})

    out = partitioned_map_groups(ds, "k", fn, num_buckets=4, impl=impl).to_pandas()
    # each logical key appears exactly once (all its rows in one bucket)
    assert sorted(out["k"]) == sorted(df["k"].unique())
    expect = df.groupby("k")["v"].sum()
    got = dict(zip(out["k"], out["s"]))
    assert got == expect.to_dict()


def test_hash_and_sort_impls_agree(ray_session):
    df = pd.DataFrame({"k": [f"g{i % 13}" for i in range(400)], "v": range(400)})
    ds1 = rd.from_pandas(df).repartition(4)
    ds2 = rd.from_pandas(df).repartition(4)

    def fn(g):
        return g.groupby("k", sort=False)["v"].sum().reset_index()

    a = partitioned_map_groups(ds1, "k", fn, 8, impl="hash").to_pandas()
    b = partitioned_map_groups(ds2, "k", fn, 8, impl="sort").to_pandas()
    a = a.sort_values("k", ignore_index=True)
    b = b.sort_values("k", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_hash_exchange_single_bucket(ray_session):
    df = pd.DataFrame({"k": ["a", "b"], "v": [1, 2]})
    out = hash_exchange(
        rd.from_pandas(df), "k", lambda g: g.sort_values("k", ignore_index=True), 1
    ).to_pandas()
    assert list(out["v"]) == [1, 2]


def test_hash_exchange_empty_buckets_hit_fn_with_schema(ray_session):
    df = pd.DataFrame({"k": ["same"] * 10, "v": range(10)})

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        # empty buckets must still present the input schema
        assert list(g.columns) == ["k", "v"]
        return pd.DataFrame({"n": [len(g)]})

    out = hash_exchange(rd.from_pandas(df), "k", fn, 16).to_pandas()
    assert out["n"].sum() == 10
    assert len(out) == 16


def test_hash_exchange_tree_merge_small_fanin(ray_session, monkeypatch):
    """Multi-level concat tree (fan-in capped) must agree with flat merge."""
    import dygiepp_ray.core as core

    df = pd.DataFrame({"k": [f"g{i % 5}" for i in range(300)], "v": range(300)})
    ds = rd.from_pandas(df).repartition(30)

    def fn(g):
        return g.groupby("k", sort=False)["v"].sum().reset_index()

    monkeypatch.setattr(core, "MERGE_FANIN", 4)  # 30 blocks -> 2+ tree levels
    out = hash_exchange(ds, "k", fn, num_buckets=3).to_pandas()
    expect = df.groupby("k")["v"].sum()
    assert dict(zip(out["k"], out["v"])) == expect.to_dict()


def test_hash_exchange_many_upstream_blocks(ray_session, monkeypatch):
    """2k+ upstream blocks: per-task ObjectRef fan-in stays bounded by
    MERGE_FANIN (the 100 TB block-count regime, VERDICT r1 finding #1)."""
    import dygiepp_ray.core as core

    n_blocks = 2048
    monkeypatch.setattr(core, "MERGE_FANIN", 256)
    df = pd.DataFrame({"k": [f"g{i % 11}" for i in range(n_blocks)], "v": range(n_blocks)})
    ds = rd.from_pandas(df).repartition(n_blocks).materialize()
    assert ds.num_blocks() >= 2000

    def fn(g):
        return g.groupby("k", sort=False)["v"].sum().reset_index()

    out = hash_exchange(ds, "k", fn, num_buckets=2).to_pandas()
    expect = df.groupby("k")["v"].sum()
    assert dict(zip(out["k"], out["v"])) == expect.to_dict()


def test_hash_exchange_pyarrow_fn_format(ray_session):
    import pyarrow as pa

    df = pd.DataFrame({"k": [f"g{i % 3}" for i in range(60)], "v": range(60)})
    ds = rd.from_pandas(df).repartition(4)

    def fn(tbl):
        assert isinstance(tbl, pa.Table)
        import pyarrow.compute as pc
        g = pa.TableGroupBy(tbl, "k").aggregate([("v", "sum")])
        return g.rename_columns(["k", "v"])

    out = hash_exchange(ds, "k", fn, num_buckets=4, fn_format="pyarrow").to_pandas()
    expect = df.groupby("k")["v"].sum()
    assert dict(zip(out["k"], out["v"])) == expect.to_dict()


def test_hash_coexchange_joins_sides(ray_session):
    import numpy as np

    from dygiepp_ray.core import hash_coexchange

    a = pd.DataFrame({"id": np.arange(200, dtype=np.int64), "x": np.arange(200) * 2})
    b = pd.DataFrame({"key": np.arange(50, 250, dtype=np.int64), "y": np.arange(200) * 3})

    def join(ad, bd):
        if len(ad) == 0 or "id" not in ad.columns or len(bd) == 0 or "key" not in bd.columns:
            return pd.DataFrame({"id": pd.Series(dtype=np.int64),
                                 "x": pd.Series(dtype=np.int64),
                                 "y": pd.Series(dtype=np.int64)})
        return ad.merge(bd.rename(columns={"key": "id"}), on="id", how="inner")

    out = hash_coexchange(
        rd.from_pandas(a).repartition(4), rd.from_pandas(b).repartition(3),
        "id", "key", join, num_buckets=8,
    ).to_pandas().sort_values("id", ignore_index=True)
    expect = a.merge(b.rename(columns={"key": "id"}), on="id").sort_values("id", ignore_index=True)
    pd.testing.assert_frame_equal(out, expect)


def test_hash_coexchange_split_reuse(ray_session):
    import numpy as np

    from dygiepp_ray.core import hash_coexchange, split_refs

    a = pd.DataFrame({"id": np.arange(100, dtype=np.int64), "x": np.arange(100)})
    b = pd.DataFrame({"key": np.arange(100, dtype=np.int64), "y": np.arange(100) * 7})
    bs = rd.from_pandas(b).repartition(2)
    shared = split_refs(bs, "key", 4)

    def join(ad, bd):
        if len(ad) == 0 or "id" not in ad.columns or len(bd) == 0 or "key" not in bd.columns:
            return pd.DataFrame({"id": pd.Series(dtype=np.int64),
                                 "y": pd.Series(dtype=np.int64)})
        return ad[["id"]].merge(bd.rename(columns={"key": "id"}), on="id")[["id", "y"]]

    r1 = hash_coexchange(rd.from_pandas(a), bs, "id", "key", join, 4,
                         splits_b=shared).to_pandas()
    r2 = hash_coexchange(rd.from_pandas(a), bs, "id", "key", join, 4,
                         splits_b=shared).to_pandas()
    assert sorted(zip(r1["id"], r1["y"])) == sorted(zip(r2["id"], r2["y"]))
    assert len(r1) == 100


def test_hash_coexchange_splits_b_tree_merge(ray_session, monkeypatch):
    """VERDICT r3 #8: the legacy per-group-tuple splits_b branch under a
    shrunken MERGE_FANIN and a 2k-block shared side — its _tree_reduce
    must fold multi-level and both reusing exchanges must stay exact."""
    import dygiepp_ray.core as core
    from dygiepp_ray.core import hash_coexchange, split_refs

    n_blocks = 2048
    monkeypatch.setattr(core, "MERGE_FANIN", 8)
    monkeypatch.setattr(core, "MAX_SPLIT_GROUP_BLOCKS", 4)
    b = pd.DataFrame({"key": np.arange(n_blocks, dtype=np.int64) % 101,
                      "y": np.arange(n_blocks, dtype=np.int64)})
    bs = rd.from_pandas(b).repartition(n_blocks).materialize()
    assert bs.num_blocks() >= 2000
    shared = split_refs(bs, "key", 4)
    # per-group tuple shape: > MERGE_FANIN groups forces a multi-level
    # tree inside the splits_b reconstruction
    assert len(shared) > core.MERGE_FANIN

    a = pd.DataFrame({"id": np.arange(101, dtype=np.int64),
                      "x": np.arange(101, dtype=np.int64) * 2})

    def join(ad, bd):
        if (len(ad) == 0 or "id" not in ad.columns
                or len(bd) == 0 or "key" not in bd.columns):
            return pd.DataFrame({c: pd.Series(dtype=np.int64)
                                 for c in ("id", "ysum")})
        m = ad.merge(bd.rename(columns={"key": "id"}), on="id")
        g = m.groupby("id", as_index=False)["y"].sum()
        return g.rename(columns={"y": "ysum"})

    expect = (
        a.merge(b.rename(columns={"key": "id"}), on="id")
        .groupby("id")["y"].sum()
    )
    for _ in range(2):  # reuse the same shared splits twice
        out = hash_coexchange(
            rd.from_pandas(a), bs, "id", "key", join, 4, splits_b=shared
        ).to_pandas()
        assert dict(zip(out["id"], out["ysum"])) == expect.to_dict()


def test_ts_epoch_us_tz_aware_matches_naive():
    from dygiepp_ray.core import ts_epoch_us

    naive = pd.Series(pd.to_datetime(["2024-01-01 12:00:00", "2024-06-01 00:00:01"]))
    aware = naive.dt.tz_localize("UTC").dt.tz_convert("America/New_York")
    assert (ts_epoch_us(aware) == ts_epoch_us(naive)).all()
    # microseconds, not nanoseconds
    assert ts_epoch_us(naive)[0] == 1704110400 * 10**6


def test_hash_exchange_zero_block_input(ray_session):
    df = pd.DataFrame({"k": ["a"], "v": [1]})
    empty = rd.from_pandas(df).filter(lambda r: False).materialize()

    out = hash_exchange(empty, "k", lambda g: g, 4)
    assert out.count() == 0


def test_hash_coexchange_one_side_zero_blocks(ray_session):
    """A zero-block side must not crash the merge; fn still sees the
    live side (e.g. label carry-forward patterns)."""
    from dygiepp_ray.core import hash_coexchange

    a = pd.DataFrame({"id": np.arange(20, dtype=np.int64)})
    live = rd.from_pandas(a).repartition(2)
    dead = rd.from_pandas(a).filter(lambda r: False).materialize()

    def fn(ad, bd):
        if len(ad) == 0 or "id" not in ad.columns:
            return pd.DataFrame({"id": pd.Series(dtype=np.int64)})
        return ad[["id"]]

    out = hash_coexchange(live, dead, "id", "id", fn, 4).to_pandas()
    assert sorted(out["id"]) == list(range(20))


def test_hash_coexchange_empty_bucket_guard(ray_session):
    """merge2 enforces the empty-tolerance contract centrally: a fn
    that blows up on schema-less empty buckets still completes when
    both sides of that bucket are empty."""
    from dygiepp_ray.core import hash_coexchange

    a = pd.DataFrame({"id": np.int64([7] * 5), "x": range(5)})
    b = pd.DataFrame({"id": np.int64([7] * 3), "y": range(3)})

    def fn(ad, bd):
        # no hand-guard: raises KeyError on empty buckets missing columns
        return ad.merge(bd, on="id")

    out = hash_coexchange(
        rd.from_pandas(a), rd.from_pandas(b), "id", "id", fn, 16
    ).to_pandas()
    assert len(out) == 15


def _mk_concat():
    import pyarrow as pa

    import ray

    @ray.remote
    def concat(*parts):
        nonempty = [p for p in parts if p.num_rows]
        base = nonempty if nonempty else list(parts[:1])
        return pa.concat_tables(base, promote_options="default")

    return concat


def test_auto_exchange_streams_splits(ray_session, monkeypatch):
    """VERDICT r3 #3: on the auto-sized path, split tasks must launch
    BEFORE the upstream block stream is fully consumed (no
    collect-all-metadata pass)."""
    import pyarrow as pa

    import ray

    import dygiepp_ray.core as core

    log = []
    orig_make_split = core._make_split

    def spy_make_split(key, B):
        rf = orig_make_split(key, B)

        class Options:
            def __init__(self, o):
                self._o = o

            def remote(self, *a):
                log.append(("split", B))
                return self._o.remote(*a)

        class Proxy:
            def options(self, **kw):
                return Options(rf.options(**kw))

        return Proxy()

    monkeypatch.setattr(core, "_make_split", spy_make_split)

    def blocks():
        for i in range(6):
            log.append(("pull", i))
            tbl = pa.table({"k": [f"g{i}"] * 10, "v": list(range(10))})
            # huge nominal size so every block gets its own split group
            yield ray.put(tbl), core.TARGET_SPLIT_BYTES

    B, gens = core._stream_gens(blocks(), "k", _mk_concat())
    assert B == core.MIN_AUTO_BUCKETS and gens is not None
    first_split = log.index(("split", core.MIN_AUTO_BUCKETS))
    last_pull = max(i for i, e in enumerate(log) if e[0] == "pull")
    assert first_split < last_pull, log


def test_auto_exchange_doubling_generations(ray_session, monkeypatch):
    """Forced generation doubling (tiny TARGET_BUCKET_BYTES): the
    reconciled exchange result must equal the plain groupby."""
    import dygiepp_ray.core as core

    monkeypatch.setattr(core, "TARGET_BUCKET_BYTES", 2048)
    monkeypatch.setattr(core, "MAX_AUTO_BUCKETS", 32)
    monkeypatch.setattr(core, "MERGE_FANIN", 4)  # deep ladders too
    monkeypatch.setattr(core, "MAX_SPLIT_GROUP_BLOCKS", 2)  # many groups
    df = pd.DataFrame(
        {"k": [f"g{i % 23}" for i in range(3000)], "v": range(3000)}
    )
    out_ds = hash_exchange(
        rd.from_pandas(df).repartition(24), "k",
        lambda g: g.groupby("k", sort=False)["v"].sum().reset_index(),
    )
    assert out_ds.num_blocks() > core.MIN_AUTO_BUCKETS  # doubling happened
    out = out_ds.to_pandas()
    assert dict(zip(out["k"], out["v"])) == df.groupby("k")["v"].sum().to_dict()


def test_auto_coexchange_mismatched_generations(ray_session, monkeypatch):
    """Auto-sized two-sided exchange where the sides settle on different
    bucket counts: reconciliation to max(B_a, B_b) must keep the join
    exact."""
    import dygiepp_ray.core as core
    from dygiepp_ray.core import hash_coexchange

    monkeypatch.setattr(core, "TARGET_BUCKET_BYTES", 2048)
    monkeypatch.setattr(core, "MAX_AUTO_BUCKETS", 32)
    monkeypatch.setattr(core, "MAX_SPLIT_GROUP_BLOCKS", 2)
    a = pd.DataFrame({"id": np.arange(2000, dtype=np.int64) % 97,
                      "x": np.arange(2000, dtype=np.int64)})
    b = pd.DataFrame({"key": np.arange(97, dtype=np.int64),
                      "y": np.arange(97, dtype=np.int64) * 3})

    def join(ad, bd):
        if (len(ad) == 0 or "id" not in ad.columns
                or len(bd) == 0 or "key" not in bd.columns):
            return pd.DataFrame({c: pd.Series(dtype=np.int64)
                                 for c in ("id", "x", "y")})
        return ad.merge(bd.rename(columns={"key": "id"}), on="id")

    out = hash_coexchange(
        rd.from_pandas(a).repartition(16), rd.from_pandas(b).repartition(2),
        "id", "key", join,
    ).to_pandas()
    expect = a.merge(b.rename(columns={"key": "id"}), on="id")
    assert len(out) == len(expect) == 2000
    assert out["y"].sum() == expect["y"].sum()


def test_hash_exchange_auto_buckets_default(ray_session):
    """num_buckets=None derives the bucket count; tiny input -> floor."""
    import dygiepp_ray.core as core

    df = pd.DataFrame({"k": [f"g{i % 9}" for i in range(300)], "v": range(300)})
    out_ds = hash_exchange(
        rd.from_pandas(df).repartition(6), "k",
        lambda g: g.groupby("k", sort=False)["v"].sum().reset_index(),
    )
    assert out_ds.num_blocks() == core.MIN_AUTO_BUCKETS
    out = out_ds.to_pandas()
    assert dict(zip(out["k"], out["v"])) == df.groupby("k")["v"].sum().to_dict()


def test_grouped_split_bounds_driver_refs(ray_session, monkeypatch):
    """Two-level split: the driver holds O(blocks/GROUP x buckets) refs,
    and a 2k-block exchange still produces exact results with a small
    merge fan-in (tree depth > 1)."""
    import dygiepp_ray.core as core

    n_blocks = 2048
    monkeypatch.setattr(core, "MERGE_FANIN", 8)
    monkeypatch.setattr(core, "MAX_SPLIT_GROUP_BLOCKS", 16)
    df = pd.DataFrame(
        {"k": [f"g{i % 11}" for i in range(n_blocks)], "v": range(n_blocks)}
    )
    ds = rd.from_pandas(df).repartition(n_blocks).materialize()
    assert ds.num_blocks() >= 2000

    splits = core.split_refs(ds, "k", 4)
    assert len(splits) <= -(-n_blocks // 16)  # ceil: one entry per GROUP

    def fn(g):
        return g.groupby("k", sort=False)["v"].sum().reset_index()

    out = hash_exchange(ds, "k", fn, num_buckets=4).to_pandas()
    assert dict(zip(out["k"], out["v"])) == df.groupby("k")["v"].sum().to_dict()


def test_grouped_pair_indices_matches_triu_bruteforce():
    """Property: the vectorized within-group expansion equals per-group
    np.triu_indices for random run structures, including empty input,
    all-singletons, and one giant run."""
    from dygiepp_ray.core import grouped_pair_indices

    rs = np.random.RandomState(5)
    cases = [np.array([], dtype=np.int64),
             np.array([7], dtype=np.int64),
             np.arange(10, dtype=np.int64),          # all singletons
             np.zeros(40, dtype=np.int64)]           # one giant run
    for _ in range(20):
        runs = rs.randint(1, 6, size=rs.randint(1, 8))
        cases.append(np.repeat(np.arange(len(runs)), runs))
    for g in cases:
        li, rj = grouped_pair_indices(g)
        got = set(zip(li.tolist(), rj.tolist()))
        exp = set()
        start = 0
        for k in range(len(g) + 1):
            if k == len(g) or (k > 0 and g[k] != g[k - 1]):
                n = k - start
                a, b = np.triu_indices(n, k=1)
                exp |= {(int(i) + start, int(j) + start) for i, j in zip(a, b)}
                start = k
        assert got == exp, g
