"""Coreference evaluation metrics (SURVEY.md A5).

The reference delegates to allennlp-models' ``ConllCorefScores`` /
``MentionRecall`` (``dygie/models/coref.py:80-81,377-381``), which
implement the standard published CoNLL-2012 metrics.  Re-implemented
here from the public definitions (Vilain et al. 1995 MUC; Bagga &
Baldwin 1998 B-cubed) — no reference code involved:

* MUC: recall = sum_K (|K| - |partition(K, R)|) / sum_K (|K| - 1),
  precision symmetric with response/key swapped.
* B^3: per-mention precision/recall of cluster overlap.
* mention recall: fraction of key mentions present in any response
  cluster.

Clusters are collections of frozensets of (start, end) spans — the same
shape the engine's clusters_table explodes to.
"""

from __future__ import annotations

from .metrics import safe_div


def _partition_count(cluster: frozenset, other_clusters: list[frozenset]) -> int:
    """Number of pieces `cluster` splits into under the other side's
    partition (unassigned mentions are singleton pieces)."""
    pieces = 0
    covered = set()
    for oc in other_clusters:
        inter = cluster & oc
        if inter:
            pieces += 1
            covered |= inter
    pieces += len(cluster - covered)
    return pieces


def muc(key: list[frozenset], response: list[frozenset]) -> tuple[float, float, float]:
    """MUC link-based P/R/F1 (Vilain et al. 1995)."""

    def score(a: list[frozenset], b: list[frozenset]) -> float:
        num = sum(len(k) - _partition_count(k, b) for k in a)
        den = sum(len(k) - 1 for k in a)
        return safe_div(num, den)

    recall = score(key, response)
    precision = score(response, key)
    f1 = safe_div(2 * precision * recall, precision + recall)
    return precision, recall, f1


def b_cubed(key: list[frozenset], response: list[frozenset]) -> tuple[float, float, float]:
    """B^3 mention-based P/R/F1 (Bagga & Baldwin 1998)."""

    # recall: for each key mention, |K∩R|/|K| ; precision swaps roles
    def recall_side(keys, resps):
        num, den = 0.0, 0
        for k in keys:
            for m in k:
                den += 1
                for r in resps:
                    if m in r:
                        num += len(k & r) / len(k)
                        break
        return safe_div(num, den)

    recall = recall_side(key, response)
    precision = recall_side(response, key)
    f1 = safe_div(2 * precision * recall, precision + recall)
    return precision, recall, f1


def mention_recall(key: list[frozenset], response: list[frozenset]) -> float:
    key_mentions = {m for k in key for m in k}
    resp_mentions = {m for r in response for m in r}
    return safe_div(len(key_mentions & resp_mentions), len(key_mentions))


def conll_coref_f1(key: list[frozenset], response: list[frozenset]) -> float:
    """Average of MUC and B^3 F1 (CEAF-phi4 omitted in v1 — noted in
    COVERAGE.md)."""
    return (muc(key, response)[2] + b_cubed(key, response)[2]) / 2
