"""Benchmark harness (driver-run per round -> BENCH_r{N}.json).

Headline: the flagship KG pipeline (transcripts -> assembly -> joint
extraction -> canonicalized triples, fully streaming) over a
deterministic synthetic transcript corpus sized to the sf dir, plus the
same pipeline over the driver documents table and a set of secondary
operator pipelines.  Prints ONE JSON line:

  {"metric": "kg_pipeline_sec", "value": <headline sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "triples": N, "triples_per_sec": N, "turns": N, "turns_per_sec": N}

--scaling: run the headline twice in fresh processes at num_cpus=8 and
32 on the same input and report throughputs + scaling efficiency
(the sandbox evidence for the north rule's two-cluster-size criterion).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# transcript corpus size scales with the sf dir (sf0.1 ~ 100k convs ~ 1.5M
# turns — large enough that per-CPU compute dominates fixed overheads, so
# the two-parallelism scaling measurement is meaningful)
_CONVS = {"sf0.001": 1000, "sf0.01": 10000}
N_CONVS = _CONVS.get(os.path.basename(SF_DIR.rstrip("/")), 100000)
CORPUS = f"/tmp/dygiepp_bench/transcripts_c{N_CONVS}_seed42"


def ensure_corpus() -> str:
    """Deterministic synthetic transcripts, written once (8 parquet files
    so the read parallelizes); generation is excluded from timing."""
    import pyarrow.parquet as pq

    if os.path.isdir(CORPUS) and len(os.listdir(CORPUS)) == 8:
        return CORPUS
    from dygiepp_ray.synth import make_transcripts

    os.makedirs(CORPUS + ".tmp", exist_ok=True)
    tbl = make_transcripts(N_CONVS, seed=42)
    n = len(tbl)
    step = -(-n // 8)
    for i in range(8):
        pq.write_table(tbl.slice(i * step, step), f"{CORPUS}.tmp/part-{i}.parquet")
    os.replace(CORPUS + ".tmp", CORPUS)
    return CORPUS


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from dygiepp_ray.pipelines.kg import from_documents_table, from_parquet

    corpus = ensure_corpus()

    # warm the page cache AND the worker pool (untimed) so we measure
    # compute + shuffle, not first-read disk or Python worker startup
    import ray.data as rd

    n_turns = rd.read_parquet(corpus).count()
    from dygiepp_ray.pipelines.kg import KGPipeline

    KGPipeline(
        rd.read_parquet(corpus).limit(2000), num_buckets=8
    ).triples().count()

    queries: dict[str, float] = {}

    # ---- headline: full KG pipeline over transcripts ----
    t0 = time.perf_counter()
    pipe = from_parquet(corpus, num_buckets=max(32, NUM_CPUS * 2))
    n_triples = pipe.triples().count()
    headline = time.perf_counter() - t0
    queries["kg_transcripts_triples"] = headline

    # ---- flagship over the driver documents table ----
    t0 = time.perf_counter()
    dpipe = from_documents_table(SF_DIR)
    n_doc_triples = dpipe.triples().count()
    queries["kg_documents_triples"] = time.perf_counter() - t0

    # ---- entities aggregate (salted canonicalization shuffle) ----
    t0 = time.perf_counter()
    pipe2 = from_parquet(corpus, num_buckets=max(32, NUM_CPUS * 2))
    pipe2.entities().count()
    queries["kg_entities"] = time.perf_counter() - t0

    # ---- secondary operator pipelines over driver tables ----
    from dygiepp_ray import relational as R
    from dygiepp_ray.textops import queries as TQ

    for name, fn in [
        ("q1_pricing_summary", R.q1_pricing_summary),
        ("events_tumbling", R.events_tumbling),
        ("sessionize", R.sessionize),
        ("dedup_exact", TQ.q_dedup_exact),
        ("ann_topk", TQ.q_ann_topk),
        ("minhash_near_dups", TQ.q_minhash_near_dups),
    ]:
        t0 = time.perf_counter()
        res = fn(SF_DIR)
        if hasattr(res, "count"):
            res.count()
        queries[name] = time.perf_counter() - t0

    out = {
        "metric": "kg_pipeline_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": os.path.basename(SF_DIR.rstrip("/")),
        "num_cpus": NUM_CPUS,
        "turns": int(n_turns),
        "turns_per_sec": round(n_turns / headline, 1),
        "triples": int(n_triples),
        "doc_triples": int(n_doc_triples),
        "triples_per_sec": round(n_triples / headline, 1),
    }
    print(json.dumps(out))
    ray.shutdown()


def scaling() -> None:
    import subprocess

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    t_lo, t_hi = lo["value"], hi["value"]
    eff = (t_lo / t_hi) / (32 / 8)
    print(json.dumps(
        {
            "metric": "scaling_efficiency",
            "value": round(eff, 3),
            "unit": "ratio",
            "sec_8": t_lo,
            "sec_32": t_hi,
            "triples_per_sec_8": lo["triples_per_sec"],
            "triples_per_sec_32": hi["triples_per_sec"],
            "turns": lo["turns"],
            "sf": lo["sf"],
        }
    ))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
