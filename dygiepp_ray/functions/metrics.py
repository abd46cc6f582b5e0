"""Ports of the reference's evaluation scorers (A1-A4, F4).

* ``compute_f1`` / ``safe_div`` — ``dygie/training/f1.py:6-17``.
* NER P/R/F1 — exact (span, label) match, micro-averaged
  (``dygie/training/ner_metrics.py:13-65``).
* Relation P/R/F1 — exact (span-pair, label) match
  (``dygie/training/relation_metrics.py:8-43``); per README.md:419-424 a
  relation is correct iff label and both argument offsets are correct.
* Event trigger/argument id + class P/R/F1 — argument match keys on
  (span, event_type, role), ignoring trigger offsets
  (``dygie/training/event_metrics.py:26-124``, esp. :58-89).

All metrics are expressed as (predicted, gold, matched) count triples so
they distribute as partial aggregates: any stage can emit partial counts
and a tiny global sum finalizes (the reference's __call__/get_metric
accumulate-then-finalize split, ner_metrics.py:22-36).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass


def safe_div(num: float, denom: float) -> float:
    """f1.py:6-11."""
    if denom > 0:
        return num / denom
    return 0.0


def compute_f1(predicted: int, gold: int, matched: int) -> tuple[float, float, float]:
    """f1.py:13-17 — returns (precision, recall, f1)."""
    precision = safe_div(matched, predicted)
    recall = safe_div(matched, gold)
    f1 = safe_div(2 * precision * recall, precision + recall)
    return precision, recall, f1


@dataclass
class PRCounts:
    predicted: int = 0
    gold: int = 0
    matched: int = 0

    def __iadd__(self, other: "PRCounts") -> "PRCounts":
        self.predicted += other.predicted
        self.gold += other.gold
        self.matched += other.matched
        return self

    def prf(self) -> tuple[float, float, float]:
        return compute_f1(self.predicted, self.gold, self.matched)


def _match_counts(pred: list, gold: list) -> PRCounts:
    """Multiset intersection match (hash-join semantics of
    relation_metrics.py:19-27)."""
    cp, cg = Counter(pred), Counter(gold)
    matched = sum(min(cp[k], cg[k]) for k in cp)
    return PRCounts(len(pred), len(gold), matched)


def ner_counts(pred_mentions: list[tuple], gold_mentions: list[tuple]) -> PRCounts:
    """Items: (doc_key, start, end, label)."""
    return _match_counts(pred_mentions, gold_mentions)


def relation_counts(pred_rels: list[tuple], gold_rels: list[tuple]) -> PRCounts:
    """Items: (doc_key, s1, e1, s2, e2, label)."""
    return _match_counts(pred_rels, gold_rels)


def trigger_counts(pred: list[tuple], gold: list[tuple], classed: bool = True) -> PRCounts:
    """Items: (doc_key, trigger_tok[, event_type]).  id vs class per
    event_metrics.py:47-57."""
    if not classed:
        pred = [p[:2] for p in pred]
        gold = [g[:2] for g in gold]
    return _match_counts(pred, gold)


def argument_counts(pred: list[tuple], gold: list[tuple], classed: bool = True) -> PRCounts:
    """Items: (doc_key, start, end, event_type[, role]) — trigger offset
    ignored (event_metrics.py:58-89)."""
    if not classed:
        pred = [p[:4] for p in pred]
        gold = [g[:4] for g in gold]
    return _match_counts(pred, gold)


def triple_counts(pred: list[tuple], gold: list[tuple]) -> PRCounts:
    """Items: (conv_id, subj, pred, obj) — the north-rule comparison unit."""
    return _match_counts(pred, gold)


def argument_stats(events: list[dict]) -> tuple[int, int]:
    """ArgumentStats (event_metrics.py:126-158): (args_multiple, args_total)
    — args shared by more than one trigger."""
    c: Counter = Counter()
    for ev in events:
        for (s, e, _role) in ev["args"]:
            c[(s, e)] += 1
    total = sum(c.values())
    multiple = sum(v for v in c.values() if v > 1)
    return multiple, total
