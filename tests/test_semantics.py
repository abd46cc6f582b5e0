"""Unit tests for shared semantics: tokenization, span enumeration, decode
conventions (reference: dygie/tests/data/dygie_test.py:24-97 style
hand-computed expectations)."""

import math

from dygiepp_ray import semantics as S


def test_normalize_word():
    # dygie.py:213-218
    assert S.normalize_word("/.") == "."
    assert S.normalize_word("/?") == "?"
    assert S.normalize_word("/x") == "/x"
    assert S.normalize_word("spark") == "spark"


def test_tokenize():
    assert S.tokenize("  a  b\tc\n") == ["a", "b", "c"]
    assert S.tokenize("") == []
    assert S.tokenize("x /. y") == ["x", ".", "y"]


def test_enumerate_spans_order_and_width():
    # ascending start then end; width capped (dygie.py:121-126)
    spans = S.enumerate_spans(4, 2)
    assert spans == [(0, 0), (0, 1), (1, 1), (1, 2), (2, 2), (2, 3), (3, 3)]
    assert all(e - s + 1 <= 8 for s, e in S.enumerate_spans(30, 8))


def test_softmax_with_dummy_null_conventions():
    # all-negative raw scores -> dummy null (index 0) wins
    arg, raw, soft = S.softmax_with_dummy([-4.0, -4.0])
    assert arg == 0 and raw == 0.0
    # a strong positive wins; softmax normalized over [0] + raw
    arg, raw, soft = S.softmax_with_dummy([S.NEG_RAW, S.LEX_RAW, S.NEG_RAW])
    assert arg == 2 and raw == S.LEX_RAW
    z = math.exp(0) + 2 * math.exp(S.NEG_RAW) + math.exp(S.LEX_RAW)
    assert abs(soft - math.exp(S.LEX_RAW) / z) < 1e-12


def test_round_score():
    assert S.round_score(0.123456) == 0.1235


def test_dynamic_k():
    # relation spans_per_word = 0.5 (template.libsonnet:88-106)
    assert S.dynamic_k(16, 0.5, 100) == 8
    assert S.dynamic_k(7, 0.5, 100) == 4
    assert S.dynamic_k(16, 0.3, 2) == 2       # clamped to n_spans
    assert S.dynamic_k(100, 0.3, 100, cap=15) == 15  # trigger cap events.py:143-147


def test_prune_topk_resort():
    # top-k then re-sort by original index (entity_beam_pruner.py:150,166-171)
    scores = [1.0, 9.0, 5.0, 7.0]
    assert S.prune_topk_resort(scores, 2) == [1, 3]
    assert S.prune_topk_resort(scores, 4) == [0, 1, 2, 3]
    assert S.prune_topk_resort(scores, 0) == []


def test_prune_entity_beam():
    assert S.prune_entity_beam([S.LEX_RAW, S.NEG_RAW, 1e-12, S.LEX_RAW]) == [0, 3]


def test_ner_scores_and_lexicon():
    raw = S.ner_raw_scores("spark")
    assert raw[S.ENTITY_LABELS.index("TOOL")] == S.LEX_RAW
    assert all(r == S.NEG_RAW for i, r in enumerate(raw) if i != S.ENTITY_LABELS.index("TOOL"))
    assert max(S.ner_raw_scores("nonsense")) == S.NEG_RAW
    # multi-token phrase
    raw = S.ner_raw_scores("acme corp")
    assert raw[S.ENTITY_LABELS.index("ORG")] == S.LEX_RAW


def test_relation_scores():
    raw = S.relation_raw_scores((0, 0), (2, 2), "spark", "table", "join")
    assert raw[S.PRED_WORDS.index("join")] == S.LEX_RAW
    # non-adjacent (gap != 1 token) never fires
    raw = S.relation_raw_scores((0, 0), (3, 3), "spark", "table", "join")
    assert max(raw) == S.NEG_RAW
    # non-entity surface never fires
    raw = S.relation_raw_scores((0, 0), (2, 2), "xyz", "table", "join")
    assert max(raw) == S.NEG_RAW


def test_argument_role_window():
    assert S.argument_role((0, 0), 2) == "AGENT"
    assert S.argument_role((3, 3), 2) == "PATIENT"
    assert S.argument_role((0, 0), 10) is None  # beyond ARG_MAX_DIST
    assert S.argument_role((0, 1), 1 + S.ARG_MAX_DIST) == "AGENT"
    assert S.argument_role((0, 1), 1 + S.ARG_MAX_DIST + 1) is None


def test_entity_id_content_addressed():
    import hashlib

    assert S.entity_id("Spark") == hashlib.md5(b"spark").hexdigest()
