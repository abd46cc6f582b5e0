"""Unit tests for dygiepp_ray.analytics: as-of join, range join,
distributed exact quantiles, anti join, JSON extraction — each compared
against DuckDB on real testdata (sf0.001) or planted corpora."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray

from dygiepp_ray.analytics import (
    SQL_ASOF_JOIN_PURCHASE,
    SQL_JSON_PROPS_SUM,
    SQL_ORDERS_ANTI_JOIN,
    SQL_QUANTILES_PRICE,
    SQL_RANGE_JOIN_ERROR_WINDOW,
    asof_join_purchase,
    exact_quantiles,
    json_props_sum,
    orders_anti_join,
    quantiles_price,
    range_join_error_window,
)

SF = "/root/testdata/sf0.001"


def duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for tbl in ["orders", "lineitem", "events"]:
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")
    return con.execute(sql).fetchdf()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == np.float64:
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("int") or str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), ignore_index=True)


def run(res) -> pd.DataFrame:
    return res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)


def test_asof_join_matches_duckdb(ray_session):
    got = norm(run(asof_join_purchase(SF)))
    want = norm(duck(SF, SQL_ASOF_JOIN_PURCHASE))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want)


def test_range_join_matches_duckdb(ray_session):
    got = norm(run(range_join_error_window(SF)))
    want = norm(duck(SF, SQL_RANGE_JOIN_ERROR_WINDOW))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want)


def test_range_join_invariant_to_chunking(ray_session):
    # Same result under a different chunk size (different replication
    # pattern and bucket assignment) — partitioning must not leak.
    a = norm(run(range_join_error_window(SF, chunk_s=256)))
    b = norm(run(range_join_error_window(SF, chunk_s=61)))
    pd.testing.assert_frame_equal(a, b)


def test_anti_join_matches_duckdb(ray_session):
    got = norm(run(orders_anti_join(SF)))
    want = norm(duck(SF, SQL_ORDERS_ANTI_JOIN))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want)


def test_quantiles_price_matches_duckdb(ray_session):
    got = norm(run(quantiles_price(SF)))
    want = norm(duck(SF, SQL_QUANTILES_PRICE))
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize("n", [1, 7, 10, 101, 1000])
def test_exact_quantiles_vs_duckdb_planted(ray_session, n):
    rng = np.random.default_rng(n)
    # duplicates on purpose: half the values repeat
    v = np.round(rng.uniform(0, 100, n), 1)
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    ds = ray.data.from_pandas(pd.DataFrame({"x": v}))
    if n > 1:
        ds = ds.repartition(3)
    got = exact_quantiles(ds, "x", qs)
    qlist = ", ".join(str(q) for q in qs)
    want = duckdb.connect().execute(
        f"SELECT unnest(quantile_disc(x, [{qlist}])) AS value "
        "FROM (SELECT unnest(?::DOUBLE[]) AS x)",
        [v.tolist()],
    ).fetchdf()
    np.testing.assert_allclose(got["value"].to_numpy(), want["value"].to_numpy())


def test_quantiles_by_flag_matches_duckdb(ray_session):
    from dygiepp_ray.analytics import SQL_QUANTILES_BY_FLAG, quantiles_by_flag

    got = norm(run(quantiles_by_flag(SF)))
    want = norm(duck(SF, SQL_QUANTILES_BY_FLAG))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want)


def test_exact_quantiles_refinement_rounds(ray_session):
    # Force multi-round bracketing: tiny collect cap + few candidates.
    rng = np.random.default_rng(0)
    v = rng.normal(0, 1, 5000)
    ds = ray.data.from_pandas(pd.DataFrame({"x": v})).repartition(8)
    got = exact_quantiles(
        ds, "x", [0.5, 0.9], per_block_candidates=8, collect_cap=50
    )
    s = np.sort(v)
    assert got.loc[0, "value"] == s[int(np.ceil(0.5 * len(v))) - 1]
    assert got.loc[1, "value"] == s[int(np.ceil(0.9 * len(v))) - 1]


def test_json_props_fallback(ray_session, tmp_path):
    # Rows that defeat the regex fast path must flow through the exact
    # json.loads fallback and still aggregate correctly.
    df = pd.DataFrame(
        {
            "event_type": ["a", "a", "b", "b", "a"],
            "props": ['{"k": 3}', '{ "k" : 4 , "x": 1 }', '{"k": 5}',
                      '{"x": 0, "k": -2}',
                      '{"x": 9}'],  # no 'k': NULL for SQL sum -> skipped
        }
    )
    df.to_parquet(tmp_path / "events.parquet")
    got = norm(run(json_props_sum(str(tmp_path))))
    want = pd.DataFrame({"event_type": ["a", "b"], "k_sum": [7, 3]}).astype(
        {"k_sum": np.int64}
    )
    pd.testing.assert_frame_equal(got, norm(want))


def test_json_props_matches_duckdb(ray_session):
    got = norm(run(json_props_sum(SF)))
    want = norm(duck(SF, SQL_JSON_PROPS_SUM))
    pd.testing.assert_frame_equal(got, want)


def test_bloom_no_false_negatives_and_low_fp(ray_session):
    from dygiepp_ray.functions.bloom import build_bloom, split_by_bloom

    rng = np.random.default_rng(7)
    members = rng.choice(10**9, 5000, replace=False)
    ds = ray.data.from_pandas(pd.DataFrame({"k": members})).repartition(6)
    bloom = build_bloom(ds, "k", m_bits=1 << 19)  # ~13 bits/key
    # every member must test positive (anti-join correctness hinges on it)
    pos, neg = split_by_bloom(ds, "k", bloom)
    assert neg.count() == 0 and pos.count() == len(members)
    # non-members: FP rate well under 5% at this sizing
    outsiders = pd.DataFrame({"k": members + 1})
    pos2, neg2 = split_by_bloom(
        ray.data.from_pandas(outsiders), "k", bloom
    )
    assert pos2.count() / len(outsiders) < 0.05


def test_anti_join_bloom_path_equivalent(ray_session):
    plain = norm(run(orders_anti_join(SF)))
    bloomed = norm(run(orders_anti_join(SF, bloom_prefilter=True)))
    pd.testing.assert_frame_equal(plain, bloomed)


def test_pagerank3_matches_duckdb_and_conserves_mass(ray_session):
    from dygiepp_ray.analytics import SQL_PAGERANK3, pagerank3

    got = norm(run(pagerank3(SF)))
    want = norm(duck(SF, SQL_PAGERANK3))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want)
    # fixed-point floors only ever drop mass, never create it
    total = got["r"].sum()
    assert 0.999 * 10**12 < total <= 10**12
    assert (got["r"] > 0).all()


# ---------------------------------------------------------------------------
# HyperLogLog sketch (functions/hll.py)
# ---------------------------------------------------------------------------


def test_hll_estimate_accuracy_and_partition_invariance(ray_session):
    import pandas as pd
    import ray.data as rd

    from dygiepp_ray.functions import hll

    for true_n in (100, 5000):
        vals = pd.DataFrame({"v": np.arange(true_n, dtype=np.int64) * 7 + 3})
        # duplicate every value 3x — HLL must be insensitive to multiplicity
        vals = pd.concat([vals] * 3, ignore_index=True)
        one = hll.hll_registers(rd.from_pandas(vals), "v")
        many = hll.hll_registers(rd.from_pandas(vals).repartition(13), "v")
        # register vector is a pure function of the value SET
        assert one.equals(many)
        est = hll.estimate(one)
        assert abs(est - true_n) / true_n < 0.15, (true_n, est)


def test_hll_rho_convention():
    import pandas as pd

    from dygiepp_ray.functions import hll

    reg, rho = hll.register_rho(pd.Series([42]))
    import hashlib

    h = int(hashlib.md5(b"42").hexdigest()[:16], 16)
    assert reg[0] == h >> 56
    w = h & ((1 << 56) - 1)
    assert rho[0] == 57 - w.bit_length()


def test_cms_overestimate_property_and_partition_invariance(ray_session):
    import pandas as pd
    import ray.data as rd

    from dygiepp_ray.functions import cms

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 300, size=4000)
    df = pd.DataFrame({"v": vals.astype(np.int64)})
    one = cms.cms_counters(rd.from_pandas(df), "v")
    many = cms.cms_counters(rd.from_pandas(df).repartition(11), "v")
    assert one.equals(many)  # pure function of the multiset
    true = pd.Series(vals).value_counts()
    for v in true.index[:50]:
        est = cms.estimate(one, int(v))
        assert est >= true[v]  # never underestimates
        assert est <= true[v] + 4000 * 2.0 / 1024 * 4  # crude eps bound
    # a value never inserted: estimate bounded by collision mass only
    assert cms.estimate(one, 999_999) <= 4000 * 2.0 / 1024 * 4


def test_cohort_retention_hand_computed(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dygiepp_ray import relational as R

    day = 86_400_000_000
    rows = [
        # user 1: first day 0, active days 0, 1, 3
        (1, 0), (1, 0), (1, 1), (1, 3),
        # user 2: first day 1, active days 1, 3
        (2, 1), (2, 3),
        # user 3: first day 0 only
        (3, 0),
    ]
    ts = pd.to_datetime([d * day * 1000 for _u, d in rows]).values  # ns
    tbl = pa.table(
        {
            "user_id": pa.array([u for u, _d in rows], pa.int64()),
            "ts": pa.array(pd.Series(ts).dt.to_pydatetime(), pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = R.cohort_retention(str(tmp_path)).set_index(["cohort_day", "days_since"])
    assert out.loc[(0, 0), "n_users"] == 2  # users 1, 3
    assert out.loc[(0, 1), "n_users"] == 1
    assert out.loc[(0, 3), "n_users"] == 1
    assert out.loc[(1, 0), "n_users"] == 1  # user 2
    assert out.loc[(1, 2), "n_users"] == 1
    assert len(out) == 5


def test_revenue_rollup_levels_consistent(ray_session):
    from dygiepp_ray import relational as R

    out = R.revenue_rollup(SF)
    finest = out[(out["region"] != "ALL") & (out["nation"] != "ALL")]
    by_region = out[(out["region"] != "ALL") & (out["nation"] == "ALL")]
    grand = out[(out["region"] == "ALL") & (out["nation"] == "ALL")]
    assert len(grand) == 1
    # levels are internally consistent (exact integer arithmetic)
    assert finest["revenue_cents"].sum() == grand["revenue_cents"].iloc[0]
    assert by_region["revenue_cents"].sum() == grand["revenue_cents"].iloc[0]
    for region, g in finest.groupby("region"):
        assert (
            g["revenue_cents"].sum()
            == by_region.set_index("region").loc[region, "revenue_cents"]
        )
    assert finest["n_orders"].sum() == grand["n_orders"].iloc[0]


def test_funnel_steps_hand_computed(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dygiepp_ray import relational as R

    # u1 completes all 3; u2 does B before A (stops at step 1);
    # u3 never signs up (counts nowhere)
    rows = [
        (1, "signup", 10), (1, "view", 20), (1, "click", 30),
        (2, "view", 5), (2, "signup", 15), (2, "click", 12),
        (3, "view", 1), (3, "click", 2),
    ]
    ts = pd.to_datetime([t * 1_000_000_000 for _u, _e, t in rows])
    tbl = pa.table(
        {
            "user_id": pa.array([u for u, _e, _t in rows], pa.int64()),
            "event_type": pa.array([e for _u, e, _t in rows]),
            "ts": pa.array(pd.Series(ts.values).dt.to_pydatetime(),
                           pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = R.funnel_steps(str(tmp_path), steps=("signup", "view", "click")).set_index("step")
    assert out.loc[1, "n_users"] == 2  # u1, u2
    assert out.loc[2, "n_users"] == 1  # only u1 views after signup
    assert out.loc[3, "n_users"] == 1


def test_hll_grouped_matches_per_group_sketch(ray_session):
    import pandas as pd
    import ray.data as rd

    from dygiepp_ray.functions import hll

    df = pd.DataFrame(
        {
            "v": np.concatenate([np.arange(500), np.arange(100)]).astype(np.int64),
            "g": ["a"] * 500 + ["b"] * 100,
        }
    )
    grouped = hll.hll_registers_by(rd.from_pandas(df).repartition(7), "v", "g")
    for g, true_n in (("a", 500), ("b", 100)):
        regs = grouped[grouped["g"] == g][["register", "rho_max"]]
        # pad to the full register vector for the estimator
        full = regs.set_index("register").reindex(range(256), fill_value=0)
        full = full.reset_index()
        est = hll.estimate(full)
        assert abs(est - true_n) / true_n < 0.2, (g, est)
        # grouped sketch == standalone sketch over that group's values
        solo = hll.hll_registers(
            rd.from_pandas(df[df["g"] == g][["v"]]), "v"
        )
        nz = solo[solo["rho_max"] > 0].reset_index(drop=True)
        assert nz.equals(regs.sort_values("register").reset_index(drop=True))


def test_funnel_emits_all_steps_when_empty(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dygiepp_ray import relational as R

    tbl = pa.table(
        {
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["view"]),
            "ts": pa.array([pd.Timestamp("2024-01-01").to_pydatetime()],
                           pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    # first step 'signup' never occurs -> every step must still emit a row
    out = R.funnel_steps(str(tmp_path), steps=("signup", "view")).set_index("step")
    assert len(out) == 2
    assert out.loc[1, "n_users"] == 0 and out.loc[2, "n_users"] == 0


def test_cms_grouped_matches_per_group_sketch(ray_session):
    import pandas as pd
    import ray.data as rd

    from dygiepp_ray.functions import cms

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "v": rng.integers(0, 50, size=1000).astype(np.int64),
            "g": np.where(np.arange(1000) % 3 == 0, "x", "y"),
        }
    )
    grouped = cms.cms_counters_by(rd.from_pandas(df).repartition(5), "v", "g")
    for g in ("x", "y"):
        solo = cms.cms_counters(rd.from_pandas(df[df["g"] == g][["v"]]), "v")
        sub = (
            grouped[grouped["g"] == g][["row", "col", "count"]]
            .sort_values(["row", "col"])
            .reset_index(drop=True)
        )
        assert sub.equals(solo.sort_values(["row", "col"]).reset_index(drop=True))


def test_semi_join_partitions_orders_with_anti(ray_session):
    """semi ∪ anti = all orders, semi ∩ anti = ∅, and both Bloom paths
    agree with the plain coexchange."""
    from dygiepp_ray.analytics import SQL_ORDERS_SEMI_JOIN, orders_semi_join

    semi = norm(run(orders_semi_join(SF)))
    plain = norm(run(orders_semi_join(SF, bloom_prefilter=False)))
    pd.testing.assert_frame_equal(semi, plain)
    want = norm(duck(SF, SQL_ORDERS_SEMI_JOIN))
    pd.testing.assert_frame_equal(semi, want)
    anti = norm(run(orders_anti_join(SF)))
    assert set(semi["o_orderkey"]).isdisjoint(set(anti["o_orderkey"]))
    n_orders = duck(SF, "SELECT count(*) AS n FROM orders")["n"].iloc[0]
    assert len(semi) + len(anti) == n_orders


def test_weighted_sample_proportional_to_size(ray_session):
    """Longer docs survive more often; membership is key-deterministic."""
    from dygiepp_ray.relational import weighted_sample_docs

    a = weighted_sample_docs(SF).to_pandas().sort_values("doc_id", ignore_index=True)
    b = weighted_sample_docs(SF).to_pandas().sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT n_chars FROM '{SF}/documents.parquet'"
    ).fetchdf()
    # survivors skew long: sampled mean length exceeds the corpus mean
    assert len(a) > 0
    assert a["n_chars"].mean() > docs["n_chars"].mean()


def test_triangle_count_planted_graph(ray_session, tmp_path):
    """Hand-built co-purchase graph: orders {1,2,3}, {3,4}, {1,2}(dup
    edge), {2,3,5} -> 6 distinct edges, triangles {1,2,3} and {2,3,5}."""
    from dygiepp_ray.analytics import triangle_count

    rows = [(10, 1), (10, 2), (10, 3),
            (20, 3), (20, 4),
            (30, 1), (30, 2),
            (40, 2), (40, 3), (40, 5),
            (40, 5)]  # duplicate lineitem within an order
    pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]).astype(
        np.int64
    ).to_parquet(tmp_path / "lineitem.parquet")
    got = triangle_count(str(tmp_path), num_buckets=4)
    assert int(got["n_edges"].iloc[0]) == 6
    assert int(got["n_triangles"].iloc[0]) == 2


def test_triangle_count_matches_duckdb(ray_session):
    from dygiepp_ray.analytics import SQL_TRIANGLE_COUNT, triangle_count

    got = norm(run(triangle_count(SF)))
    want = norm(duck(SF, SQL_TRIANGLE_COUNT))
    assert int(got["n_triangles"].iloc[0]) > 0
    pd.testing.assert_frame_equal(got, want)


def test_triangle_close_path_decision():
    """Broadcast only when the edge set is BOTH byte-small and
    id-packable (VERDICT r3: size, not just id width, must gate the
    driver-side path)."""
    from dygiepp_ray.analytics import _BROADCAST_EDGE_BYTES, _triangle_close_path

    assert _triangle_close_path(1000, 42) == "broadcast"
    assert _triangle_close_path(_BROADCAST_EDGE_BYTES + 1, 42) == "exchange"
    assert _triangle_close_path(1000, 1 << 32) == "exchange"
    assert _triangle_close_path(1000, None) == "broadcast"  # empty graph


def test_triangle_count_over_threshold_routes_to_exchange(
    ray_session, tmp_path, monkeypatch
):
    """An over-threshold edge set must route to the distributed closing
    path — no driver-side row materialization anywhere — and still
    count correctly."""
    import ray.data

    import dygiepp_ray.analytics as A

    rows = [(10, 1), (10, 2), (10, 3),
            (20, 3), (20, 4),
            (30, 1), (30, 2),
            (40, 2), (40, 3), (40, 5)]
    pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]).astype(
        np.int64
    ).to_parquet(tmp_path / "lineitem.parquet")
    monkeypatch.setattr(A, "_BROADCAST_EDGE_BYTES", 0)

    def banned(self, *a, **k):
        raise AssertionError("to_pandas() on the exchange closing path")

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", banned)
    got = A.triangle_count(str(tmp_path), num_buckets=4)
    assert int(got["n_edges"].iloc[0]) == 6
    assert int(got["n_triangles"].iloc[0]) == 2


def test_kcore_planted_peeling(ray_session, tmp_path):
    """Triangle {1,2,3} + pendant 4: k=2 peeling drops the pendant in
    round 1, the triangle survives with induced degree 2."""
    from dygiepp_ray.analytics import kcore

    rows = [(10, 1), (10, 2), (10, 3), (20, 1), (20, 4)]
    pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]).astype(
        np.int64
    ).to_parquet(tmp_path / "lineitem.parquet")
    got = kcore(str(tmp_path), k=2, rounds=3, num_buckets=4).to_pandas()
    got = got.sort_values("node", ignore_index=True)
    assert got["node"].tolist() == [1, 2, 3]
    assert got["deg"].tolist() == [2, 2, 2]


def test_kcore_matches_duckdb(ray_session):
    from dygiepp_ray.analytics import _sql_kcore, kcore

    k, rounds = 3, 2
    got = norm(run(kcore(SF, k=k, rounds=rounds)))
    want = norm(duck(SF, _sql_kcore(k, rounds)))
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        got.sort_values("node", ignore_index=True),
        want.sort_values("node", ignore_index=True),
    )


def test_triangle_count_exchange_path_equivalent(ray_session, tmp_path):
    """broadcast_edges=False (the huge-graph pair-key exchange path)
    must count the same triangles as the broadcast path."""
    from dygiepp_ray.analytics import triangle_count

    rng = np.random.RandomState(11)
    rows = [(int(o), int(p))
            for o in range(60) for p in rng.choice(25, size=4, replace=False)]
    pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]).astype(
        np.int64
    ).to_parquet(tmp_path / "lineitem.parquet")
    a = triangle_count(str(tmp_path), num_buckets=4, broadcast_edges=True)
    b = triangle_count(str(tmp_path), num_buckets=4, broadcast_edges=False)
    assert a["n_triangles"].iloc[0] == b["n_triangles"].iloc[0] > 0
    assert a["n_edges"].iloc[0] == b["n_edges"].iloc[0]


def test_skyline_matches_bruteforce():
    """_skyline_2d vs the O(n^2) dominance definition on random data
    with planted (price, size) ties."""
    from dygiepp_ray.analytics import _skyline_2d

    rng = np.random.RandomState(7)
    n = 300
    df = pd.DataFrame(
        {
            "p_partkey": np.arange(n, dtype=np.int64),
            "price_cents": rng.randint(0, 40, n).astype(np.int64),
            "p_size": rng.randint(0, 15, n).astype(np.int64),
        }
    )
    got = set(_skyline_2d(df)["p_partkey"])
    pc, sz = df["price_cents"].to_numpy(), df["p_size"].to_numpy()
    want = set()
    for i in range(n):
        dominated = np.any(
            (pc <= pc[i]) & (sz >= sz[i]) & ((pc < pc[i]) | (sz > sz[i]))
        )
        if not dominated:
            want.add(int(df["p_partkey"][i]))
    assert got == want and len(want) > 0


def test_skyline_of_skylines_identity():
    """Global skyline == skyline of the union of block-local skylines
    (the merge step part_skyline relies on), under arbitrary splits."""
    from dygiepp_ray.analytics import _skyline_2d

    rng = np.random.RandomState(13)
    n = 400
    df = pd.DataFrame(
        {
            "p_partkey": np.arange(n, dtype=np.int64),
            "price_cents": rng.randint(0, 1000, n).astype(np.int64),
            "p_size": rng.randint(0, 50, n).astype(np.int64),
        }
    )
    parts = np.array_split(df.sample(frac=1, random_state=1), 7)
    cand = pd.concat([_skyline_2d(p) for p in parts], ignore_index=True)
    merged = _skyline_2d(cand).sort_values("p_partkey", ignore_index=True)
    direct = _skyline_2d(df).sort_values("p_partkey", ignore_index=True)
    pd.testing.assert_frame_equal(merged, direct)


def test_balance_ntile_matches_rank_arithmetic(ray_session, tmp_path):
    """balance_ntile's histogram-range split must equal row-level
    NTILE (first n%B buckets one larger), including when tie groups
    straddle tile boundaries."""
    from dygiepp_ray.relational import balance_ntile

    rng = np.random.RandomState(3)
    bal = rng.randint(-50, 50, 137) / 1.0  # many ties across boundaries
    pd.DataFrame({"c_acctbal": bal}).to_parquet(tmp_path / "customer.parquet")
    got = balance_ntile(str(tmp_path), tiles=10)

    cents = np.sort(np.floor(bal * 100.0).astype(np.int64))
    n = len(cents)
    q, rem = divmod(n, 10)
    tile = np.empty(n, dtype=np.int64)
    pos = 0
    for i in range(10):
        size = q + 1 if i < rem else q
        tile[pos:pos + size] = i + 1
        pos += size
    want = (
        pd.DataFrame({"tile": tile, "cents": cents})
        .groupby("tile")
        .agg(n_customers=("cents", "size"), min_cents=("cents", "min"),
             max_cents=("cents", "max"), sum_cents=("cents", "sum"))
        .reset_index()
        .astype(np.int64)
    )
    pd.testing.assert_frame_equal(
        got.sort_values("tile", ignore_index=True), want
    )


def test_mg_superset_guarantee_under_pruning(ray_session, tmp_path):
    """Misra-Gries with capacity << distinct (so pruning really runs)
    must (a) keep candidate summaries <= capacity, (b) retain every
    item with true count > n/(capacity+1), (c) make the two-pass exact
    output identical to the true heavy hitters."""
    from dygiepp_ray.functions.mg import heavy_hitters_exact, mg_candidates

    rng = np.random.RandomState(5)
    # Zipf-ish: a few hot keys + a long uniform tail of 2000 distinct
    hot = np.repeat(np.arange(5, dtype=np.int64), 400)
    tail = rng.randint(100, 2100, 6000).astype(np.int64)
    vals = np.concatenate([hot, tail])
    rng.shuffle(vals)
    pd.DataFrame({"user_id": vals}).to_parquet(tmp_path / "events.parquet")
    ds = ray.data.read_parquet(str(tmp_path / "events.parquet"))

    capacity = 32
    cand = mg_candidates(ds, "user_id", capacity)
    assert len(cand) <= capacity
    n = len(vals)
    true = pd.Series(vals).value_counts()
    guaranteed = set(true[true > n / (capacity + 1)].index)
    assert guaranteed, "test corpus must actually have heavy items"
    assert guaranteed <= set(cand.tolist())

    out = heavy_hitters_exact(ds, "user_id", phi_inv=32)
    want = true[true * 32 > n].sort_index()
    assert out["key"].tolist() == list(want.index)
    assert out["count"].tolist() == list(want.values)


def test_mg_capacity_below_phi_inv_rejected(ray_session):
    from dygiepp_ray.functions.mg import heavy_hitters_exact

    ds = ray.data.from_pandas(pd.DataFrame({"x": np.arange(10)}))
    with pytest.raises(ValueError):
        heavy_hitters_exact(ds, "x", phi_inv=64, capacity=16)


def test_kmv_exact_when_union_small(ray_session, tmp_path):
    """When the union sketch saw every distinct value (n_union < k)
    the estimator must return EXACT distinct counts, and matches must
    equal the exact intersection."""
    from dygiepp_ray.functions.kmv import kmv_intersections, kmv_sketch_by

    rows = []
    for u in range(20):
        rows.append(("a", u))
    for u in range(10, 35):
        rows.append(("b", u))
    df = pd.DataFrame(rows, columns=["event_type", "user_id"])
    ds = ray.data.from_pandas(df)
    sk = kmv_sketch_by(ds, "user_id", "event_type", k=64)
    out = kmv_intersections(sk, k=64)
    assert len(out) == 1
    r = out.iloc[0]
    assert r["union_est"] == 35  # |0..34|
    assert r["matches"] == 10    # |10..19|
    assert r["inter_est"] == 10 * 35 // 35


def test_kmv_estimate_within_error(ray_session, tmp_path):
    """At n_union >> k the KMV union estimate must land within the
    ~1/sqrt(k) relative-error band and the intersection estimate near
    the true overlap."""
    from dygiepp_ray.functions.kmv import kmv_intersections, kmv_sketch_by

    na, nb, overlap = 3000, 3000, 1500
    rows = [("a", u) for u in range(na)]
    rows += [("b", u) for u in range(na - overlap, na - overlap + nb)]
    df = pd.DataFrame(rows, columns=["event_type", "user_id"])
    ds = ray.data.from_pandas(df)
    k = 256
    sk = kmv_sketch_by(ds, "user_id", "event_type", k=k)
    out = kmv_intersections(sk, k=k)
    r = out.iloc[0]
    true_union = na + nb - overlap
    assert abs(r["union_est"] - true_union) / true_union < 4 / np.sqrt(k)
    assert abs(r["inter_est"] - overlap) / overlap < 8 / np.sqrt(k)


def test_events_resample_hand_computed(ray_session, tmp_path):
    """Gap windows must materialize as zero rows over the full
    (type x global-span) grid."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dygiepp_ray import relational as R

    # type x: windows 0 and 7200 (3600 silent); type y: window 3600 only
    rows = [("x", 0, 1.0), ("x", 7210, 2.5), ("y", 3600, 4.0)]
    tbl = pa.table(
        {
            "ts": pa.array(
                pd.to_datetime([t * 1_000_000_000 for _e, t, _v in rows]),
                pa.timestamp("us"),
            ),
            "event_type": pa.array([e for e, _t, _v in rows]),
            "value": pa.array([v for _e, _t, v in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = R.events_resample(str(tmp_path)).set_index(
        ["event_type", "window_start"]
    )
    assert len(out) == 6  # 2 types x 3 windows, gaps included
    assert out.loc[("x", 0)].tolist() == [1, 1.0]
    assert out.loc[("x", 3600)].tolist() == [0, 0.0]
    assert out.loc[("x", 7200)].tolist() == [1, 2.5]
    assert out.loc[("y", 0)].tolist() == [0, 0.0]
    assert out.loc[("y", 3600)].tolist() == [1, 4.0]
    assert out.loc[("y", 7200)].tolist() == [0, 0.0]


def test_users_setop_hand_computed(ray_session, tmp_path):
    """INTERSECT / EXCEPT labels from one OR-of-bits exchange."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dygiepp_ray import relational as R

    rows = [
        (1, "purchase", 100.0), (1, "error", 95.0),   # both
        (2, "purchase", 100.0),                        # a_only
        (3, "error", 91.0),                            # b_only
        (4, "purchase", 50.0), (4, "click", 200.0),    # below threshold /
                                                       # wrong type: absent
    ]
    tbl = pa.table(
        {
            "user_id": pa.array([u for u, _e, _v in rows], pa.int64()),
            "event_type": pa.array([e for _u, e, _v in rows]),
            "value": pa.array([v for _u, _e, v in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = (
        R.users_setop(str(tmp_path))
        .to_pandas()
        .set_index("user_id")["setop"]
        .to_dict()
    )
    assert out == {1: "both", 2: "a_only", 3: "b_only"}


def test_zorder_layout_hand_computed(ray_session, tmp_path):
    """Morton interleave bit-exactness at shift=0 (part_id == zkey)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dygiepp_ray import relational as R

    # (cust, day): (3, 0) -> z=0b101=5; (0, 1) -> z=0b10=2; (1, 1) -> z=3
    tbl = pa.table(
        {
            "o_custkey": pa.array([3, 0, 1], pa.int64()),
            "o_orderdate": pa.array(
                pd.to_datetime(["1970-01-01", "1970-01-02", "1970-01-02"]),
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(tbl, tmp_path / "orders.parquet")
    out = (
        R.zorder_layout(str(tmp_path), shift=0)
        .to_pandas()
        .set_index("part_id")
        .sort_index()
    )
    assert list(out.index) == [2, 3, 5]
    assert out.loc[5, "min_cust"] == 3 and out.loc[5, "min_day"] == 0
    assert out.loc[2, "min_cust"] == 0 and out.loc[2, "min_day"] == 1
    assert out.loc[3, "min_cust"] == 1 and out.loc[3, "min_day"] == 1
    assert out["n"].tolist() == [1, 1, 1]


@pytest.mark.parametrize("n", [2, 7, 101, 1000])
def test_exact_quantiles_cont_vs_duckdb_planted(ray_session, n):
    from dygiepp_ray.analytics import exact_quantiles_cont

    rng = np.random.default_rng(n)
    v = np.round(rng.uniform(0, 100, n), 1)
    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    ds = ray.data.from_pandas(pd.DataFrame({"x": v})).repartition(3)
    got = exact_quantiles_cont(ds, "x", qs)
    qlist = ", ".join(str(q) for q in qs)
    want = duckdb.connect().execute(
        f"SELECT unnest(quantile_cont(x, [{qlist}])) AS value "
        "FROM (SELECT unnest(?::DOUBLE[]) AS x)",
        [v.tolist()],
    ).fetchdf()
    # bit-identical double interpolation, not just allclose
    np.testing.assert_array_equal(
        got["value"].to_numpy(), want["value"].to_numpy()
    )


def test_exact_quantiles_cont_multi_round(ray_session):
    from dygiepp_ray.analytics import exact_quantiles_cont

    rng = np.random.default_rng(1)
    v = rng.normal(0, 1, 5000)
    ds = ray.data.from_pandas(pd.DataFrame({"x": v})).repartition(8)
    got = exact_quantiles_cont(
        ds, "x", [0.5, 0.9], per_block_candidates=8, collect_cap=50
    )
    assert got["value"].to_numpy() == pytest.approx(
        np.quantile(np.sort(v), [0.5, 0.9], method="linear")
    )


def test_purchase_attribution_hand_computed(ray_session, tmp_path):
    """Last preceding touch per user; ties resolve by ROWS frame order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dygiepp_ray import relational as R

    # user 1: view@10, click@20, purchase@30 (attr=20),
    #         purchase@5 (attr=-1, nothing precedes)
    # user 2: purchase@50 with a click at the SAME ts but larger
    #         event_id -> frame sees only strictly-preceding rows:
    #         view@40 wins (attr=40)
    rows = [
        (100, 1, 10, "view"), (101, 1, 20, "click"),
        (102, 1, 30, "purchase"), (99, 1, 5, "purchase"),
        (200, 2, 40, "view"), (201, 2, 50, "purchase"),
        (202, 2, 50, "click"),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(
                pd.to_datetime([r[2] * 1_000_000_000 for r in rows]),
                pa.timestamp("us"),
            ),
            "event_type": pa.array([r[3] for r in rows]),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = (
        R.purchase_attribution(str(tmp_path))
        .to_pandas().set_index("event_id")["attr_ts_us"].to_dict()
    )
    assert out == {102: 20_000_000, 99: -1, 201: 40_000_000}


def test_contingency_table_hand_computed(ray_session, tmp_path):
    """Observed vs floor(1e6*row*col/total) independence expectation."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dygiepp_ray import relational as R

    # 2x2: rows (A: 3, B: 1); cols (X: 2, Y: 2); total 4
    rows = [("A", "X"), ("A", "X"), ("A", "Y"), ("B", "Y")]
    tbl = pa.table(
        {
            "o_orderstatus": pa.array([r[0] for r in rows]),
            "o_orderpriority": pa.array([r[1] for r in rows]),
        }
    )
    pq.write_table(tbl, tmp_path / "orders.parquet")
    out = R.contingency_table(str(tmp_path)).set_index(
        ["o_orderstatus", "o_orderpriority"]
    )
    assert out.loc[("A", "X"), "observed"] == 2
    assert out.loc[("A", "X"), "expected_x1e6"] == 1_000_000 * 3 * 2 // 4
    assert out.loc[("A", "Y"), "expected_x1e6"] == 1_000_000 * 3 * 2 // 4
    assert out.loc[("B", "Y"), "expected_x1e6"] == 1_000_000 * 1 * 2 // 4
    assert len(out) == 3  # (B, X) never observed -> no cell row


@pytest.mark.parametrize(
    "fn_name",
    ["events_resample", "users_setop", "zorder_layout",
     "purchase_attribution", "contingency_table"],
)
def test_new_ops_bucket_count_invariant(ray_session, fn_name):
    """Exchange bucket count must never change a result — the
    partitioning-independence property every keyed op claims."""
    from dygiepp_ray import relational as R

    fn = getattr(R, fn_name)
    sf = "/root/testdata/sf0.001"

    def canon(res):
        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        return df.sort_values(list(df.columns), ignore_index=True)

    a = canon(fn(sf, num_buckets=2))
    b = canon(fn(sf, num_buckets=11))
    pd.testing.assert_frame_equal(a, b)


def test_embedding_gram_bucket_count_invariant(ray_session):
    from dygiepp_ray.textops.ann import embedding_gram

    emb = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["embedding"]
    )
    a = embedding_gram(emb, num_buckets=2).to_pandas().sort_values(
        ["i", "j"], ignore_index=True
    )
    emb2 = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["embedding"]
    ).repartition(7)
    b = embedding_gram(emb2, num_buckets=5).to_pandas().sort_values(
        ["i", "j"], ignore_index=True
    )
    pd.testing.assert_frame_equal(a, b)


def test_table_diff_hand_computed(ray_session):
    """added / removed / changed / unchanged-omitted over a coexchange."""
    from dygiepp_ray.relational import table_diff

    a = pd.DataFrame({"k": [1, 2, 3, 4], "v": [10.0, 20.0, 30.0, 40.0]})
    b = pd.DataFrame({"k": [2, 3, 4, 5], "v": [20.0, 31.0, 40.0, 50.0]})
    out = (
        table_diff(ray.data.from_pandas(a), ray.data.from_pandas(b),
                   "k", ["v"], num_buckets=3)
        .to_pandas().set_index("k")["change"].to_dict()
    )
    assert out == {1: "removed", 3: "changed", 5: "added"}


def test_events_ohlc_hand_computed(ray_session, tmp_path):
    """first/last by (ts, event_id) incl. an equal-ts tie, across
    multiple partials (merge must re-reduce the representatives)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dygiepp_ray import relational as R

    # one window, type x: open = id 1 @t10 (tie with id 2 broken by id),
    # close = id 9 @t30; high 9.0 low 1.0
    rows = [
        (2, 10, "x", 5.0), (1, 10, "x", 1.0),
        (5, 20, "x", 9.0), (9, 30, "x", 3.0),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                pd.to_datetime([r[1] * 1_000_000_000 for r in rows]),
                pa.timestamp("us"),
            ),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = R.events_ohlc(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["open_v"], r["high_v"], r["low_v"], r["close_v"], r["n"]) == (
        1.0, 9.0, 1.0, 3.0, 4
    )


def test_events_ohlc_bucket_and_block_invariant(ray_session):
    from dygiepp_ray import relational as R

    a = R.events_ohlc("/root/testdata/sf0.001", num_buckets=2).to_pandas()
    b = R.events_ohlc("/root/testdata/sf0.001", num_buckets=9).to_pandas()
    key = ["event_type", "window_start"]
    pd.testing.assert_frame_equal(
        a.sort_values(key, ignore_index=True),
        b.sort_values(key, ignore_index=True),
    )


def test_small_quantity_revenue_hand_computed(ray_session, tmp_path):
    """Below-20%-of-part-average filter with exact cents accounting."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dygiepp_ray import relational as R

    # part 1 (Brand#23): qtys 1, 10, 10 -> avg 7, lim 1.4 -> only the
    # qty-1 row (price 10.01 -> 1001 cents) qualifies.
    # part 2 (other brand): filtered out before the exchange.
    pq.write_table(pa.table(
        {"p_partkey": pa.array([1, 2], pa.int64()),
         "p_brand": pa.array(["Brand#23", "Brand#1"])}
    ), tmp_path / "part.parquet")
    pq.write_table(pa.table(
        {"l_partkey": pa.array([1, 1, 1, 2], pa.int64()),
         "l_quantity": pa.array([1.0, 10.0, 10.0, 1.0], pa.float64()),
         "l_extendedprice": pa.array([10.01, 5.0, 5.0, 99.0], pa.float64())}
    ), tmp_path / "lineitem.parquet")
    out = R.small_quantity_revenue(str(tmp_path))
    assert len(out) == 1
    assert int(out["total_cents"].iloc[0]) == 1001
    assert int(out["avg_yearly_x100"].iloc[0]) == 1001 // 7


def test_small_quantity_revenue_no_qualifier_is_empty(ray_session, tmp_path):
    """No row below the threshold -> zero rows (twin's HAVING shape)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dygiepp_ray import relational as R

    pq.write_table(pa.table(
        {"p_partkey": pa.array([1], pa.int64()),
         "p_brand": pa.array(["Brand#23"])}
    ), tmp_path / "part.parquet")
    pq.write_table(pa.table(
        {"l_partkey": pa.array([1, 1], pa.int64()),
         "l_quantity": pa.array([10.0, 10.0], pa.float64()),
         "l_extendedprice": pa.array([5.0, 5.0], pa.float64())}
    ), tmp_path / "lineitem.parquet")
    assert len(R.small_quantity_revenue(str(tmp_path))) == 0


def test_sales_opportunity_hand_computed(ray_session, tmp_path):
    """Integer-exact above-average filter + predicated anti-join."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dygiepp_ray import relational as R

    # nation 0 cohort balances: 10.00, 20.00, 30.00 (+ one negative,
    # excluded from the average): avg of positives = 20.00 -> only the
    # 30.00 customer (key 3) is eligible.  Customer 3 has an URGENT
    # 2001 order ONLY in the data for customer 4 (not eligible), so 3
    # survives the anti-join.  Nation 99 is outside the cohort.
    pq.write_table(pa.table(
        {"c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
         "c_nationkey": pa.array([0, 0, 0, 0, 99], pa.int32()),
         "c_acctbal": pa.array([10.0, 20.0, 30.0, -5.0, 1000.0],
                               pa.float64())}
    ), tmp_path / "customer.parquet")
    pq.write_table(pa.table(
        {"o_custkey": pa.array([4, 3], pa.int64()),
         "o_orderpriority": pa.array(["1-URGENT", "3-MEDIUM"]),
         "o_orderdate": pa.array(
             pd.to_datetime(["2001-05-01", "2001-06-01"]),
             pa.timestamp("us"))}
    ), tmp_path / "orders.parquet")
    out = R.sales_opportunity(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert (int(r["c_nationkey"]), int(r["n_cust"]),
            int(r["total_bal_cents"])) == (0, 1, 3000)


def test_table_diff_empty_side_keeps_big_keys_exact(ray_session):
    """One empty side must not promote the key to float (ids > 2^53)."""
    from dygiepp_ray.relational import table_diff

    big = (1 << 62) + 1
    a = pd.DataFrame({"k": [big, big + 2], "v": [1.0, 2.0]})
    b = pd.DataFrame({"k": pd.Series(dtype=np.int64),
                      "v": pd.Series(dtype=np.float64)})
    out = table_diff(
        ray.data.from_pandas(a), ray.data.from_pandas(b), "k", ["v"],
        num_buckets=2,
    ).to_pandas()
    assert sorted(out["k"].tolist()) == [big, big + 2]  # bit-exact ids
    assert set(out["change"]) == {"removed"}


def test_bloom_tolerates_empty_passthrough_blocks(ray_session):
    """A filter that empties some blocks hands the bloom build raw
    pass-through blocks without the 'bits' column — the OR tree must
    skip them (Ray passes empty blocks through UDFs untouched)."""
    from dygiepp_ray.functions.bloom import build_bloom, split_by_bloom

    ds = ray.data.from_pandas(
        pd.DataFrame({"k": np.arange(40, dtype=np.int64)})
    ).repartition(8).map_batches(
        lambda df: df[df["k"] < 10], batch_format="pandas"
    )  # most blocks now empty -> partial UDF skipped on them
    bloom = build_bloom(ds, "k", m_bits=1 << 16)
    probe = ray.data.from_pandas(
        pd.DataFrame({"k": np.array([3, 7, 1000, 2000], np.int64)})
    )
    pos, neg = split_by_bloom(probe, "k", bloom)
    got = set(pos.to_pandas()["k"])
    assert {3, 7} <= got            # no false negatives
    assert len(neg.to_pandas()) >= 1  # far keys mostly pruned


def test_price_outliers_hand_computed(ray_session, tmp_path):
    """|z| > 1.7 as a pure-integer comparison, exact at the boundary."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dygiepp_ray import relational as R

    # flag A: cents (100, 100, 100, 100, 500): mean 180, the 500 row has
    # z = 320/160 = 2.0 > 1.7 -> outlier; the 100 rows have z = 0.5.
    # flag B: two equal values -> V = 0, nothing can exceed it.
    vals = [1.0, 1.0, 1.0, 1.0, 5.0, 7.0, 7.0]
    flags = ["A"] * 5 + ["B"] * 2
    pq.write_table(pa.table(
        {"l_returnflag": pa.array(flags),
         "l_extendedprice": pa.array(vals, pa.float64())}
    ), tmp_path / "lineitem.parquet")
    out = R.price_outliers(str(tmp_path))
    assert out["l_returnflag"].tolist() == ["A"]
    r = out.iloc[0]
    assert (int(r["n_outliers"]), int(r["min_out_cents"]),
            int(r["max_out_cents"])) == (1, 500, 500)


def test_user_streaks_hand_computed(ray_session, tmp_path):
    """Islands: duplicate days collapse, gaps split runs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dygiepp_ray import relational as R

    # user 1 active days: 0,1,2 (streak 3), 5,6 (streak 2), with a
    # duplicate event on day 1; user 2: single day
    days = [(1, 0), (1, 1), (1, 1), (1, 2), (1, 5), (1, 6), (2, 9)]
    pq.write_table(pa.table(
        {"user_id": pa.array([u for u, _d in days], pa.int64()),
         "ts": pa.array(
             pd.to_datetime([(d * 86_400 + 3_600) * 1_000_000_000
                             for _u, d in days]),
             pa.timestamp("us"))}
    ), tmp_path / "events.parquet")
    out = (
        R.user_streaks(str(tmp_path))
        .to_pandas().set_index("user_id")["longest_streak"].to_dict()
    )
    assert out == {1: 3, 2: 1}


def test_winsorized_revenue_hand_computed(ray_session, tmp_path):
    """Clip at exact [p05, p95] order statistics, then cents sums."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dygiepp_ray import relational  # noqa: F401  (engine imports)
    from dygiepp_ray.analytics import winsorized_revenue

    # 10 values 1..10: p05 = ceil(0.5)=1st smallest = 1.0,
    # p95 = ceil(9.5)=10th = 10.0 -> nothing clips; shrink to check
    # clipping with explicit construction instead: values 1..20 ->
    # p05 = 1st = 1.0, p95 = 19th = 19.0, so only 20.0 clips to 19.0
    vals = [float(i) for i in range(1, 21)]
    flags = ["A"] * 10 + ["B"] * 10
    pq.write_table(pa.table(
        {"l_returnflag": pa.array(flags),
         "l_extendedprice": pa.array(vals, pa.float64())}
    ), tmp_path / "lineitem.parquet")
    out = winsorized_revenue(str(tmp_path)).set_index("l_returnflag")
    assert int(out.loc["A", "clipped_cents"]) == sum(
        int(v * 100) for v in vals[:10]
    )
    # B's 20.0 clips to 19.0
    assert int(out.loc["B", "clipped_cents"]) == sum(
        int(min(v, 19.0) * 100) for v in vals[10:]
    )
    assert out["n"].tolist() == [10, 10]


def test_events_rate_alert_hand_computed(ray_session, tmp_path):
    """Spike fires only with a full 6-window history and n*6 > 2*sum."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dygiepp_ray import relational as R

    # type x: six windows of 1 event, then a window with 5 events
    # (5*6=30 > 2*6=12 -> alert), then a window of 2 (2*6=12 > 2*
    # (1*5+5)=20? no).  First 6 windows lack history -> never alert.
    counts = [1, 1, 1, 1, 1, 1, 5, 2]
    rows = []
    for w, c in enumerate(counts):
        rows += [(w * 3600 + i) for i in range(c)]
    pq.write_table(pa.table(
        {"ts": pa.array(pd.to_datetime([t * 1_000_000_000 for t in rows]),
                        pa.timestamp("us")),
         "event_type": pa.array(["x"] * len(rows))}
    ), tmp_path / "events.parquet")
    out = R.events_rate_alert(str(tmp_path))
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["event_type"], int(r["window_start"]), int(r["n"]),
            int(r["trail_sum"])) == ("x", 6 * 3600, 5, 6)


def test_rfm_segments_hand_computed(ray_session, tmp_path):
    """Exact tercile thresholds by order-statistic VALUE (ties safe)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dygiepp_ray import relational as R

    # 3 customers, 1 order each on days 0/1/2, prices 10/20/30:
    # r terciles: q1=0, q2=1 -> buckets 1,2,3; f all ties (q1=q2=1 ->
    # every f bucket = 1); m buckets 1,2,3.
    pq.write_table(pa.table(
        {"o_custkey": pa.array([1, 2, 3], pa.int64()),
         "o_orderdate": pa.array(
             pd.to_datetime(["1970-01-01", "1970-01-02", "1970-01-03"]),
             pa.timestamp("us")),
         "o_totalprice": pa.array([10.0, 20.0, 30.0], pa.float64())}
    ), tmp_path / "orders.parquet")
    out = R.rfm_segments(str(tmp_path)).set_index("segment")
    assert sorted(out.index) == ["111", "212", "313"]
    assert int(out.loc["111", "total_m_cents"]) == 1000
    assert int(out.loc["313", "total_m_cents"]) == 3000
    assert out["n_users"].tolist() == [1, 1, 1]


def test_bfs_hops_planted_graph(ray_session, tmp_path):
    """Hand-built bipartite graph: supplier s10 is the only seed
    (suppkey % 10 == 0).  c1 orders from s10 and s3; c2 orders from s3.
    Hops: s10=0, c1=1, s3=2, c2=3; c9/s7 are unreachable within 3."""
    from dygiepp_ray.analytics import bfs_hops

    orders = pd.DataFrame(
        {"o_orderkey": [100, 101, 102, 103],
         "o_custkey": [1, 1, 2, 9]}
    ).astype(np.int64)
    li = pd.DataFrame(
        {"l_orderkey": [100, 101, 102, 103],
         "l_suppkey": [10, 3, 3, 7]}
    ).astype(np.int64)
    orders.to_parquet(tmp_path / "orders.parquet")
    li.to_parquet(tmp_path / "lineitem.parquet")
    got = bfs_hops(str(tmp_path)).to_pandas()
    d = dict(zip(got["node"], got["hops"]))
    assert d == {"s10": 0, "c1": 1, "s3": 2, "c2": 3}


def test_bfs_hops_matches_duckdb(ray_session):
    from dygiepp_ray.analytics import SQL_BFS_HOPS, bfs_hops

    got = norm(run(bfs_hops(SF)))
    want = norm(duck(SF, SQL_BFS_HOPS))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want)


def test_user_active_time_hand_computed(ray_session, tmp_path):
    """Interval union with 300 s windows: overlaps must not
    double-count, duplicates contribute nothing, gaps reopen."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dygiepp_ray import relational as R

    # user 1: t=0 and t=100 overlap (union 100+300=400 s); t=1000 is a
    # disjoint interval (+300 s); duplicate at t=1000 adds 0
    # user 2: one event -> 300 s
    evts = [(1, 0), (1, 100), (1, 1000), (1, 1000), (2, 50)]
    pq.write_table(pa.table(
        {"user_id": pa.array([u for u, _t in evts], pa.int64()),
         "ts": pa.array(
             pd.to_datetime([t * 1_000_000_000 for _u, t in evts]),
             pa.timestamp("us"))}
    ), tmp_path / "events.parquet")
    out = (
        R.user_active_time(str(tmp_path), num_buckets=4)
        .to_pandas().set_index("user_id")["active_us"].to_dict()
    )
    assert out == {1: 700_000_000, 2: 300_000_000}


def test_events_late_arrivals_hand_computed(ray_session, tmp_path):
    """Arrival order = event_id; an event older than the user's prior
    running-max ts is late, skew measured against that max."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dygiepp_ray import relational as R

    # user 1 arrivals: t=100, t=50 (late by 50), t=200, t=150 (late 50),
    # t=90 (late 110); user 2: in order
    rows = [(1, 1, 100), (2, 1, 50), (3, 1, 200), (4, 1, 150), (5, 1, 90),
            (6, 2, 10), (7, 2, 20)]
    pq.write_table(pa.table(
        {"event_id": pa.array([e for e, _u, _t in rows], pa.int64()),
         "user_id": pa.array([u for _e, u, _t in rows], pa.int64()),
         "ts": pa.array(
             pd.to_datetime([t * 1_000_000 for _e, _u, t in rows], unit="ns"),
             pa.timestamp("us"))}
    ), tmp_path / "events.parquet")
    out = (
        R.events_late_arrivals(str(tmp_path), num_buckets=4)
        .to_pandas().set_index("user_id")
    )
    assert int(out.loc[1, "n_events"]) == 5
    assert int(out.loc[1, "n_late"]) == 3
    assert int(out.loc[1, "max_skew_us"]) == 110_000  # ts in ms -> us
    assert int(out.loc[2, "n_late"]) == 0
    assert int(out.loc[2, "max_skew_us"]) == 0
