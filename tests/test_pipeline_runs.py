"""Pipeline-level runs: actor-pool extraction, run_all graph store with
resume, embedding near-dups, hopping windows."""

import json
import os

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from dygiepp_ray.pipelines.kg import KGPipeline
from dygiepp_ray.stages.extract import extract
from dygiepp_ray.synth import make_transcripts
from dygiepp_ray.textops import ann


def test_actor_pool_extraction_matches_tasks(ray_session):
    tbl = make_transcripts(15, seed=21)
    from dygiepp_ray.stages.assemble import assemble_documents

    docs = assemble_documents(rd.from_arrow(tbl), num_buckets=2)
    a = extract(docs).to_pandas()
    docs2 = assemble_documents(rd.from_arrow(tbl), num_buckets=2)
    b = extract(docs2, concurrency=2, batch_size=64).to_pandas()

    def mention_set(df):
        return {
            (r["doc_key"], m["start"], m["end"], m["label"])
            for _, r in df.iterrows() for m in r["ner"]
        }

    assert mention_set(a) == mention_set(b)


def test_run_all_graph_store_and_resume(ray_session, tmp_path):
    tbl = make_transcripts(12, seed=31)
    out = str(tmp_path / "graph")
    pipe = KGPipeline(rd.from_arrow(tbl), num_buckets=2)
    manifests = pipe.run_all(out, num_partitions=4)
    assert manifests["triples"]["rows_written"] > 0
    assert manifests["entities"]["rows_written"] > 0
    assert os.path.exists(os.path.join(out, "triples", "_MANIFEST.json"))

    from dygiepp_ray.state.checkpoint import read_partitioned

    t1 = read_partitioned(os.path.join(out, "triples")).to_pandas()

    # rerun: everything skipped, nothing rewritten, data intact
    pipe2 = KGPipeline(rd.from_arrow(tbl), num_buckets=2)
    manifests2 = pipe2.run_all(out, num_partitions=4)
    assert manifests2["triples"]["rows_written"] == 0
    t2 = read_partitioned(os.path.join(out, "triples")).to_pandas()
    assert len(t1) == len(t2)


def test_run_all_without_coref_skips_clusters(ray_session, tmp_path):
    # clusters is None when 'coref' is disabled — run_all must skip the
    # clusters manifest, not crash after triples/entities landed
    # (reader review r3)
    from dataclasses import replace

    from dygiepp_ray.semantics import DEFAULT_CONFIG

    tbl = make_transcripts(8, seed=7)
    cfg = replace(DEFAULT_CONFIG, tasks=("ner", "relations", "events"))
    out = str(tmp_path / "graph_nocoref")
    pipe = KGPipeline(rd.from_arrow(tbl), cfg, num_buckets=2)
    assert pipe.clusters is None
    manifests = pipe.run_all(out, num_partitions=2)
    assert manifests["triples"]["rows_written"] > 0
    assert "clusters" not in manifests
    assert not os.path.exists(os.path.join(out, "clusters"))


def test_embedding_near_dups_finds_planted_pair(ray_session):
    rs = np.random.RandomState(3)
    vecs = rs.normal(size=(100, 16))
    vecs[7] = vecs[3] + rs.normal(scale=0.01, size=16)  # planted near-dup
    df = pd.DataFrame({"vec_id": np.arange(100, dtype=np.int64), "embedding": list(vecs)})
    pairs = ann.embedding_near_dups(rd.from_pandas(df), threshold=0.95)
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (3, 7) in got
    # no spurious pairs among random gaussians at 0.95 in 16-d (overwhelming odds)
    assert all({a, b} == {3, 7} for a, b in got)


def test_events_hopping_counts(ray_session):
    from dygiepp_ray.relational import events_hopping, events_tumbling

    hop = events_hopping("/root/testdata/sf0.001").to_pandas()
    tum = events_tumbling("/root/testdata/sf0.001").to_pandas()
    # every event lands in exactly 2 hopping windows
    assert hop["n"].sum() == 2 * tum["n"].sum()


def test_embedding_near_dups_matches_all_pairs(ray_session):
    """Signature-only-exchange + 2-bit multi-probe path must reproduce
    the exact all-pairs cosine join on a corpus with planted near-dups
    (VERDICT r1 #7 equivalence requirement)."""
    rs = np.random.RandomState(11)
    vecs = rs.normal(size=(200, 32))
    for src, dst in [(3, 7), (20, 150), (44, 45), (44, 46)]:
        vecs[dst] = vecs[src] + rs.normal(scale=0.02, size=32)
    df = pd.DataFrame({"vec_id": np.arange(200, dtype=np.int64), "embedding": list(vecs)})

    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    iu = np.triu_indices(200, k=1)
    truth = {
        (int(a), int(b))
        for a, b in zip(iu[0][sims[iu] >= 0.95], iu[1][sims[iu] >= 0.95])
    }
    assert len(truth) >= 4  # planted pairs really are above threshold

    pairs = ann.embedding_near_dups(rd.from_pandas(df), threshold=0.95)
    got = set(zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)))
    assert got == truth


def test_kg_cooccurrence_matches_duckdb(ray_session):
    """Entity co-occurrence lift vs its SQL twin at sf0.001 (integer
    fixed-point lift must match bit-for-bit)."""
    import duckdb

    from dygiepp_ray.pipelines.queries import (
        SQL_KG_COOCCURRENCE,
        q_kg_cooccurrence,
    )

    sf = "/root/testdata/sf0.001"
    got = q_kg_cooccurrence(sf).to_pandas()
    got = got.sort_values(["surface_a", "surface_b"], ignore_index=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = con.execute(SQL_KG_COOCCURRENCE).fetchdf().sort_values(
        ["surface_a", "surface_b"], ignore_index=True
    )
    assert len(got) > 0
    got = got.astype({"surface_a": object, "surface_b": object})
    pd.testing.assert_frame_equal(got, want)
