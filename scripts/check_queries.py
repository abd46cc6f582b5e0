"""Driver-mimic correctness check: run each queries() entry on Ray and its
oracle_sql() twin on DuckDB over the same sf dir; compare row count,
column names, and an order-insensitive value hash.

Usage: python scripts/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> tuple[int, tuple, str]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), ignore_index=True)
    import hashlib

    h = hashlib.md5()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            col = col.round(6)
        h.update(pd.util.hash_pandas_object(col, index=False).to_numpy().tobytes())
    return len(df), tuple(df.columns), h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
                "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        res = fn(sf_dir)
        if hasattr(res, "to_pandas"):
            rdf = res.to_pandas()
        else:
            rdf = pd.DataFrame(res)
        if name not in sqls:
            print(f"{name:28s} rows={len(rdf):8d}  (no SQL oracle — rows-only)")
            continue
        odf = con.execute(sqls[name]).fetchdf()
        rn, rc, rh = canon(rdf)
        on, oc, oh = canon(odf)
        ok = (rn, rc, rh) == (on, oc, oh)
        status = "OK " if ok else "FAIL"
        print(f"{name:28s} {status} rows={rn}/{on} cols={'=' if rc == oc else 'DIFF'} hash={'=' if rh == oh else 'DIFF'}")
        if not ok:
            failures.append(name)
            if rc != oc:
                print(f"   ray cols: {rc}\n   sql cols: {oc}")
            else:
                print("   ray head:\n", rdf[sorted(rdf.columns)].sort_values(sorted(rdf.columns)).head(3).to_string())
                print("   sql head:\n", odf[sorted(odf.columns)].sort_values(sorted(odf.columns)).head(3).to_string())
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all checked queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
