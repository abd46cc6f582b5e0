"""Resumable partitioned output: idempotent per-partition writes,
completed partitions skipped on re-run (SURVEY.md §4)."""

import json
import os

import pandas as pd
import pytest

import ray.data as rd

from dygiepp_ray.state import checkpoint as C


@pytest.fixture()
def small_ds(ray_session):
    df = pd.DataFrame(
        {"conv_id": [f"c{i % 10}" for i in range(100)], "v": range(100)}
    )
    return rd.from_pandas(df), df


def test_write_and_read_roundtrip(small_ds, tmp_path):
    ds, df = small_ds
    out = str(tmp_path / "graph")
    run = C.write_partitioned(ds, out, "conv_id", num_partitions=4)
    assert run["rows_written"] == 100
    assert os.path.exists(os.path.join(out, "_MANIFEST.json"))
    back = C.read_partitioned(out).to_pandas()
    assert len(back) == 100
    assert sorted(back["v"]) == list(range(100))


def test_resume_skips_completed_partitions(small_ds, tmp_path):
    ds, df = small_ds
    out = str(tmp_path / "graph")
    C.write_partitioned(ds, out, "conv_id", num_partitions=4)
    done = C.completed_partitions(out)
    assert len(done) >= 1
    # second run: every partition already has a manifest -> all skipped
    run2 = C.write_partitioned(ds, out, "conv_id", num_partitions=4)
    assert run2["rows_written"] == 0
    assert run2["skipped"] == len(done)
    # data still intact
    assert len(C.read_partitioned(out).to_pandas()) == 100


def test_partial_resume(small_ds, tmp_path):
    ds, df = small_ds
    out = str(tmp_path / "graph")
    C.write_partitioned(ds, out, "conv_id", num_partitions=4)
    # simulate a killed run: delete one partition's manifest + data
    victim = sorted(C.completed_partitions(out))[0]
    os.remove(C._part_manifest(out, victim))
    import shutil

    shutil.rmtree(C._part_dir(out, victim))
    run = C.write_partitioned(ds, out, "conv_id", num_partitions=4)
    assert run["rows_written"] > 0  # only the victim partition was rewritten
    back = C.read_partitioned(out).to_pandas()
    assert len(back) == 100


def test_manifest_lineage_fields(small_ds, tmp_path):
    ds, _ = small_ds
    out = str(tmp_path / "graph")
    C.write_partitioned(ds, out, "conv_id", num_partitions=2)
    m = json.load(open(C._part_manifest(out, sorted(C.completed_partitions(out))[0])))
    assert {"bucket", "key", "rows", "n_keys", "ts"} <= set(m)
