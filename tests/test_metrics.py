"""Metric ports vs brute force (reference: dygie/tests/models/relation_test.py
style: library math checked against explicit loops)."""

from dygiepp_ray.functions import metrics as M


def test_compute_f1_matches_reference_formulas():
    # f1.py:13-17
    p, r, f1 = M.compute_f1(predicted=10, gold=8, matched=6)
    assert p == 0.6 and r == 0.75
    assert abs(f1 - (2 * 0.6 * 0.75) / (0.6 + 0.75)) < 1e-12


def test_safe_div_zero_denominator():
    assert M.safe_div(1, 0) == 0.0
    p, r, f1 = M.compute_f1(0, 0, 0)
    assert (p, r, f1) == (0.0, 0.0, 0.0)


def test_match_counts_multiset():
    pred = [("d", 0, 1, "A"), ("d", 0, 1, "A"), ("d", 2, 3, "B")]
    gold = [("d", 0, 1, "A"), ("d", 4, 5, "C")]
    c = M.ner_counts(pred, gold)
    assert (c.predicted, c.gold, c.matched) == (3, 2, 1)


def test_trigger_id_vs_class():
    pred = [("d", 3, "join")]
    gold = [("d", 3, "merge")]
    assert M.trigger_counts(pred, gold, classed=True).matched == 0
    assert M.trigger_counts(pred, gold, classed=False).matched == 1


def test_argument_match_ignores_trigger_offset():
    # event_metrics.py:58-89 — key is (span, event_type, role)
    pred = [("d", 0, 1, "join", "AGENT")]
    gold = [("d", 0, 1, "join", "AGENT")]
    assert M.argument_counts(pred, gold).matched == 1
    gold2 = [("d", 0, 1, "join", "PATIENT")]
    assert M.argument_counts(pred, gold2).matched == 0
    assert M.argument_counts(pred, gold2, classed=False).matched == 1


def test_argument_stats():
    events = [
        {"args": [(0, 1, "AGENT"), (4, 5, "PATIENT")]},
        {"args": [(0, 1, "AGENT")]},
    ]
    multiple, total = M.argument_stats(events)
    assert total == 3 and multiple == 2


def test_pr_counts_accumulate():
    a = M.PRCounts(1, 2, 1)
    a += M.PRCounts(3, 4, 2)
    assert (a.predicted, a.gold, a.matched) == (4, 6, 3)
