"""Gold alignment (M3-M6/J1), coref metrics (A5), distance buckets (F5),
multi-dataset routing (T8/D2)."""

import pandas as pd
import pytest

import ray.data as rd

from dygiepp_ray import semantics as S
from dygiepp_ray.functions import coref_metrics as CM
from dygiepp_ray.stages.gold_align import align_gold, span_index
from dygiepp_ray.stages.multi_dataset import extract_multi_dataset
from dygiepp_ray.semantics import ExtractionConfig


def test_span_index_matches_enumeration():
    for n, w in [(4, 2), (7, 3), (10, 8), (3, 8), (1, 8)]:
        spans = S.enumerate_spans(n, w)
        for i, (a, b) in enumerate(spans):
            assert span_index(a, b, n, w) == i, (n, w, a, b)
        assert span_index(0, w, n, w) is None or w >= n  # too wide
        assert span_index(0, n, n, w) is None            # out of range


def _doc_row():
    return {
        "doc_key": "d1",
        "sentences": [["acme", "corp", "buys", "spark"], ["spark", "wins"]],
        "sentence_start": [0, 4],
        "gold_ner": [
            {"start": 0, "end": 1, "label": "ORG"},
            {"start": 3, "end": 3, "label": "TOOL"},
            {"start": 4, "end": 4, "label": "TOOL"},
            {"start": 2, "end": 5, "label": "WIDE"},   # crosses sentences -> dropped
        ],
        "gold_relations": [
            {"s1": 0, "e1": 1, "s2": 3, "e2": 3, "label": "buys"},
        ],
        "gold_clusters": [
            {"start": 3, "end": 3, "cluster_ix": 0},
            {"start": 4, "end": 4, "cluster_ix": 0},
        ],
        "gold_events": [
            {"trigger_tok": 2, "event_type": "buy",
             "args": [{"start": 0, "end": 1, "role": "AGENT"},
                      {"start": 3, "end": 3, "role": "PATIENT"}]},
        ],
    }


def test_align_gold_hand_computed(ray_session):
    # reference-style hand expectations (dygie_test.py:24-97)
    cfg = ExtractionConfig(max_span_width=8)
    out = align_gold(rd.from_items([_doc_row()]), cfg).to_pandas().iloc[0]
    spans_s0 = S.enumerate_spans(4, 8)
    ner = {(m["sent_ix"], m["span_ix"]): m["label"] for m in out["ner_span_labels"]}
    assert ner[(0, spans_s0.index((0, 1)))] == "ORG"
    assert ner[(0, spans_s0.index((3, 3)))] == "TOOL"
    spans_s1 = S.enumerate_spans(2, 8)
    assert ner[(1, spans_s1.index((0, 0)))] == "TOOL"
    assert out["n_dropped_gold"] == 1  # the sentence-crossing span
    rel = out["relation_adjacency"][0]
    assert (rel["ix1"], rel["ix2"], rel["label"]) == (
        spans_s0.index((0, 1)), spans_s0.index((3, 3)), "buys",
    )
    trig = out["trigger_token_labels"][0]
    assert (trig["sent_ix"], trig["tok"], trig["label"]) == (0, 2, "buy")
    roles = {(a["span_ix"], a["role"]) for a in out["argument_adjacency"]}
    assert roles == {(spans_s0.index((0, 1)), "AGENT"), (spans_s0.index((3, 3)), "PATIENT")}
    cl = {(c["sent_ix"], c["span_ix"]): c["cluster_ix"] for c in out["coref_span_clusters"]}
    assert cl[(0, spans_s0.index((3, 3)))] == 0 and cl[(1, spans_s1.index((0, 0)))] == 0


def test_gold_wider_than_max_width_dropped(ray_session):
    cfg = ExtractionConfig(max_span_width=1)
    out = align_gold(rd.from_items([_doc_row()]), cfg).to_pandas().iloc[0]
    labels = {m["label"] for m in out["ner_span_labels"]}
    assert labels == {"TOOL"}  # the width-2 ORG span dropped silently


def test_muc_hand_computed():
    # Vilain et al. example: key {a,b,c}, response {a,b},{c}
    key = [frozenset({"a", "b", "c"})]
    resp = [frozenset({"a", "b"}), frozenset({"c"})]
    p, r, f1 = CM.muc(key, resp)
    assert r == pytest.approx((3 - 2) / (3 - 1))  # 0.5
    assert p == pytest.approx(1.0)


def test_b_cubed_hand_computed():
    key = [frozenset({"a", "b"}), frozenset({"c"})]
    resp = [frozenset({"a", "b", "c"})]
    p, r, f1 = CM.b_cubed(key, resp)
    assert r == pytest.approx(1.0)
    # precision: each of a,b contributes 2/3, c contributes 1/3
    assert p == pytest.approx((2 / 3 + 2 / 3 + 1 / 3) / 3)


def test_identical_clusters_perfect():
    key = [frozenset({(0, 1), (4, 4)}), frozenset({(2, 2), (9, 9)})]
    assert CM.muc(key, key)[2] == 1.0
    assert CM.b_cubed(key, key)[2] == 1.0
    assert CM.mention_recall(key, key) == 1.0
    assert CM.conll_coref_f1(key, key) == 1.0


def test_distance_buckets():
    got = [S.distance_bucket(d) for d in [0, 1, 4, 5, 7, 8, 15, 16, 31, 32, 63, 64, 1000]]
    assert got == [0, 1, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9]


def test_multi_dataset_routing(ray_session):
    import pyarrow as pa

    from dygiepp_ray.stages.assemble import assemble_documents

    tbl = pa.table(
        {
            "conv_id": ["c1", "c2"],
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": ["user", "user"],
            "text": ["spark join table", "spark join table"],
        }
    )
    docs = assemble_documents(rd.from_arrow(tbl), num_buckets=1)

    def retag(t: pa.Table) -> pa.Table:
        ds = ["dsA" if c == "c1" else "dsB" for c in t["conv_id"].to_pylist()]
        i = t.schema.get_field_index("dataset")
        return t.set_column(i, "dataset", pa.array(ds, pa.string()))

    docs = docs.map_batches(retag, batch_format="pyarrow")
    cfgs = {
        "dsA": ExtractionConfig(dataset="dsA", tasks=("ner", "relations")),
        "dsB": ExtractionConfig(dataset="dsB", tasks=("ner", "relations")),
    }
    out = extract_multi_dataset(docs, cfgs).to_pandas()
    assert sorted(out["dataset"]) == ["dsA", "dsB"]
    assert all(len(r) == 1 for r in out["relations"])

    with pytest.raises(Exception):
        extract_multi_dataset(
            docs, {"dsA": cfgs["dsA"]}
        ).to_pandas()  # dsB unregistered -> KeyError
