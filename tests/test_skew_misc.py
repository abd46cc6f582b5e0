"""Skew handling, uniqueness assertion (D1), fuzzy join (J4),
deterministic sampling."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from dygiepp_ray.core import assert_unique
from dygiepp_ray.functions.metrics import triple_counts
from dygiepp_ray.pipelines.kg import KGPipeline
from dygiepp_ray.textops.dedup import fuzzy_join
from dygiepp_ray import oracle


def test_assert_unique_passes_and_raises(ray_session):
    ok = rd.from_pandas(pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "x"]}))
    assert_unique(ok, ["a", "b"]).count()  # no raise
    bad = rd.from_pandas(pd.DataFrame({"a": [1, 1], "b": ["x", "x"]}))
    with pytest.raises(Exception):
        assert_unique(bad, ["a", "b"]).count()


def test_conversation_length_skew(ray_session):
    """One giant conversation among tiny ones: M8 splitting bounds the
    per-document work; parity with the oracle still holds."""
    rows = []
    for t in range(400):  # 400 turns x ~3 tokens >> max_tokens_per_doc
        rows.append(("giant", t, "spark join table"))
    for c in range(20):
        rows.append((f"small{c}", 0, "customer scan stream"))
    tbl = pa.table(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": ["user"] * len(rows),
            "text": [r[2] for r in rows],
        }
    )
    pipe = KGPipeline(rd.from_arrow(tbl), num_buckets=4)
    docs = pipe.documents.to_pandas()
    giant_windows = [k for k in docs["doc_key"] if k.startswith("giant_SPLIT_")]
    assert len(giant_windows) > 3
    assert docs["n_tokens"].max() <= 256
    # oracle parity on the skewed corpus
    etr = pipe.triples().to_pandas()
    odocs = oracle.extract_all(tbl.to_pylist())
    gold = [(c, s, p, o) for (c, _si, s, p, _oi, o) in oracle.triples_from_docs(odocs)]
    pred = list(zip(etr.conv_id, etr.subj, etr.pred, etr.obj))
    assert triple_counts(pred, gold).prf()[:2] == (1.0, 1.0)


def test_hot_surface_canonicalization_exact(ray_session):
    """A surface shared by every conversation (hot key): salted two-phase
    aggregation must still count exactly."""
    n = 60
    tbl = pa.table(
        {
            "conv_id": [f"c{i}" for i in range(n)],
            "turn_idx": pa.array([0] * n, pa.int32()),
            "role": ["user"] * n,
            "text": ["spark join spark"] * n,  # 'spark' twice per conv
        }
    )
    pipe = KGPipeline(rd.from_arrow(tbl), num_buckets=4)
    ents = pipe.entities(num_salts=8).to_pandas().set_index("surface")
    assert ents.loc["spark", "n_mentions"] == 2 * n
    assert ents.loc["spark", "n_docs"] == n


def test_fuzzy_join_titles(ray_session):
    left = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.arange(3, dtype=np.int64),
                "title": [
                    "span based joint entity and relation extraction",
                    "a completely unrelated title about databases",
                    "graph neural networks for coreference",
                ],
            }
        )
    )
    right = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.arange(100, 103, dtype=np.int64),
                "title": [
                    "span based joint entity and relation extraction with transformers",
                    "streaming systems in practice",
                    "graph neural networks for coreference resolution",
                ],
            }
        )
    )
    out = fuzzy_join(left, right, key_col="title", threshold=0.4).to_pandas()
    matches = dict(zip(out["left_id"], out["right_id"]))
    assert matches.get(0) == 100
    assert matches.get(2) == 102
    assert 1 not in matches  # unrelated title finds no partner


def test_orders_sample_deterministic(ray_session):
    from dygiepp_ray.relational import orders_sample

    a = orders_sample("/root/testdata/sf0.001").to_pandas()
    b = orders_sample("/root/testdata/sf0.001").to_pandas()
    assert sorted(a["o_orderkey"]) == sorted(b["o_orderkey"])
    assert 0 < len(a) < 1500  # ~10% of 1500


def test_pack_sequences_skewed_source_multi_chunk(ray_session):
    """One source holds 90% of rows spread over many blocks: the
    two-phase packer (chunk-local cumsum -> tiny offset exchange ->
    stateless assign) must reproduce the sequential per-source cumsum
    exactly even when the source spans many chunks."""
    from dygiepp_ray.relational import pack_sequences_dataset

    rs = np.random.RandomState(3)
    n = 5000
    src = np.where(rs.rand(n) < 0.9, "big", "small")
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": src,
            "n_chars": rs.randint(1, 900, size=n).astype(np.int64),
        }
    )
    ds = rd.from_pandas(df.sample(frac=1.0, random_state=7)).repartition(16)
    out = (
        pack_sequences_dataset(ds, budget=2048, chunk_docs=256, num_buckets=8)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )

    ref = df.sort_values(["source", "doc_id"], ignore_index=True)
    cum = ref.groupby("source", sort=False)["n_chars"].cumsum()
    ref["pack_id"] = ((cum - ref["n_chars"]) // 2048).astype(np.int64)
    ref = ref.sort_values("doc_id", ignore_index=True)

    assert (out["doc_id"].to_numpy() == ref["doc_id"].to_numpy()).all()
    assert (out["pack_id"].to_numpy() == ref["pack_id"].to_numpy()).all()
    assert (out["source"].to_numpy() == ref["source"].to_numpy()).all()


def test_task_retry_through_pipeline(ray_session, tmp_path):
    """SURVEY §4: stragglers/retries are Ray-native — a UDF that dies on
    its first attempt (per task) must be retried transparently and the
    pipeline must still produce exact results.  `retry_exceptions` is
    the same knob a flaky model-inference stage would use in
    production; the flag file makes exactly the first attempt fail."""
    import pandas as pd

    import ray as _ray
    import ray.data as rd

    flag = tmp_path / "first_attempt_died"

    def flaky(df: pd.DataFrame) -> pd.DataFrame:
        if not flag.exists():
            flag.write_text("x")
            raise RuntimeError("injected first-attempt failure")
        out = df.copy()
        out["y"] = out["x"] * 2
        return out

    ds = rd.from_pandas(pd.DataFrame({"x": list(range(100))})).repartition(1)
    got = ds.map_batches(
        flaky, batch_format="pandas", retry_exceptions=True, max_retries=2
    ).to_pandas()
    assert flag.exists()
    assert sorted(got["y"]) == [2 * i for i in range(100)]
