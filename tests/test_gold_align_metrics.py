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


def test_ceaf_phi4_hand_computed():
    # key {a,b,c}; response {a,b},{c}
    # phi4(K1,R1) = 2*2/(3+2) = 0.8, phi4(K1,R2) = 2*1/(3+1) = 0.5
    # best alignment total = 0.8 -> R = 0.8/1, P = 0.8/2
    key = [frozenset({"a", "b", "c"})]
    resp = [frozenset({"a", "b"}), frozenset({"c"})]
    p, r, f1 = CM.ceaf_phi4(key, resp)
    assert r == pytest.approx(0.8)
    assert p == pytest.approx(0.4)
    assert f1 == pytest.approx(2 * 0.4 * 0.8 / 1.2)


def test_ceaf_phi4_optimal_alignment():
    # greedy (K1->R1) is suboptimal; Kuhn-Munkres must pick K1->R2, K2->R1
    # phi4 matrix: K1 = {a,b,c,d}, K2 = {e,f}; R1 = {a,b,e,f}, R2 = {c,d}
    #   K1-R1 = 2*2/8 = .5   K1-R2 = 2*2/6 = .667
    #   K2-R1 = 2*2/6 = .667 K2-R2 = 0
    # best total = .667 + .667 = 4/3 (not .5 + 0)
    key = [frozenset("abcd"), frozenset("ef")]
    resp = [frozenset("abef"), frozenset("cd")]
    p, r, f1 = CM.ceaf_phi4(key, resp)
    assert r == pytest.approx((2 / 3 + 2 / 3) / 2)
    assert p == pytest.approx((2 / 3 + 2 / 3) / 2)


def test_ceaf_phi4_perfect_and_empty():
    key = [frozenset({(0, 1)}), frozenset({(2, 3), (4, 5)})]
    assert CM.ceaf_phi4(key, key) == (1.0, 1.0, 1.0)
    assert CM.ceaf_phi4(key, []) == (0.0, 0.0, 0.0)
    assert CM.ceaf_phi4([], key) == (0.0, 0.0, 0.0)


def test_conll_is_three_way_mean():
    key = [frozenset({"a", "b", "c"})]
    resp = [frozenset({"a", "b"}), frozenset({"c"})]
    expect = (CM.muc(key, resp)[2] + CM.b_cubed(key, resp)[2] + CM.ceaf_phi4(key, resp)[2]) / 3
    assert CM.conll_coref_f1(key, resp) == pytest.approx(expect)


def test_ceaf_rectangular_padding():
    # more response clusters than key clusters and vice versa
    key = [frozenset("ab")]
    resp = [frozenset("a"), frozenset("b"), frozenset("z")]
    p, r, _ = CM.ceaf_phi4(key, resp)
    assert r == pytest.approx(2 / 3)       # best single match 2*1/(2+1)
    assert p == pytest.approx((2 / 3) / 3)


def test_evaluate_coref_distributed_matches_local(ray_session):
    """Distributed CoNLL coref evaluation == local doc_stats sums."""
    import pandas as pd
    import ray.data as rd
    from dygiepp_ray.functions.evaluate import evaluate_coref

    def members(docs):
        rows = []
        for dk, clusters in docs.items():
            for ci, cl in enumerate(clusters):
                for (s, e) in cl:
                    rows.append({"doc_key": dk, "cluster_ix": ci, "start": s, "end": e})
        return pd.DataFrame(rows)

    gold = {
        "d1": [[(0, 1), (4, 4)], [(2, 2), (9, 9)]],
        "d2": [[(1, 1), (3, 3), (5, 5)]],
        "d3": [[(0, 0), (2, 2)]],
    }
    pred = {
        "d1": [[(0, 1), (4, 4)], [(2, 2)]],
        "d2": [[(1, 1), (3, 3)], [(5, 5), (7, 7)]],
        # d3: no predicted clusters at all
    }
    out = evaluate_coref(
        rd.from_pandas(members(pred)), rd.from_pandas(members(gold)), num_buckets=4
    )

    # local reference computation
    sums: dict[str, float] = {}
    for dk in set(gold) | set(pred):
        k = [frozenset(c) for c in gold.get(dk, [])]
        r = [frozenset(c) for c in pred.get(dk, [])]
        for kk, v in CM.doc_stats(k, r).items():
            sums[kk] = sums.get(kk, 0.0) + v
    expect = CM.finalize(sums)
    for k in expect:
        assert out[k] == pytest.approx(expect[k]), k
    assert out["conll_f1"] == pytest.approx(
        (out["muc_f1"] + out["b3_f1"] + out["ceaf_phi4_f1"]) / 3
    )
    assert 0 < out["conll_f1"] < 1


def test_evaluate_coref_perfect():
    import pandas as pd
    import ray.data as rd
    from dygiepp_ray.functions.evaluate import evaluate_coref

    df = pd.DataFrame(
        {"doc_key": ["a"] * 4, "cluster_ix": [0, 0, 1, 1],
         "start": [0, 2, 5, 8], "end": [1, 2, 5, 9]}
    )
    out = evaluate_coref(rd.from_pandas(df), rd.from_pandas(df.copy()), num_buckets=2)
    assert out["conll_f1"] == 1.0
    assert out["mention_recall"] == 1.0
