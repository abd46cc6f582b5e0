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

* CEAF-phi4 (Luo 2005): optimal one-to-one cluster alignment under
  phi4(K, R) = 2|K n R| / (|K| + |R|), solved with the Kuhn-Munkres
  algorithm (implemented here from the published method — no scipy in
  this environment).

Clusters are collections of frozensets of (start, end) spans — the same
shape the engine's clusters_table explodes to.
"""

from __future__ import annotations

import numpy as np

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


def _max_assignment_total(sim: np.ndarray) -> float:
    """Max-weight one-to-one assignment total over a (possibly
    rectangular) non-negative similarity matrix — Kuhn-Munkres with
    shortest augmenting paths, O(n^3).  Padding to square with zero
    similarity models unmatched clusters."""
    if sim.size == 0:
        return 0.0
    n = max(sim.shape)
    cost = np.zeros((n, n))
    cost[: sim.shape[0], : sim.shape[1]] = -sim  # minimize negated sim
    INF = float("inf")
    u = [0.0] * (n + 1)
    v = [0.0] * (n + 1)
    match = [0] * (n + 1)  # match[j] = row assigned to column j (1-based)
    way = [0] * (n + 1)
    for i in range(1, n + 1):
        match[0] = i
        j0 = 0
        minv = [INF] * (n + 1)
        used = [False] * (n + 1)
        while True:
            used[j0] = True
            i0, delta, j1 = match[j0], INF, -1
            for j in range(1, n + 1):
                if not used[j]:
                    cur = cost[i0 - 1][j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j], way[j] = cur, j0
                    if minv[j] < delta:
                        delta, j1 = minv[j], j
            for j in range(n + 1):
                if used[j]:
                    u[match[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if match[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            match[j0] = match[j1]
            j0 = j1
    total = 0.0
    for j in range(1, n + 1):
        i = match[j]
        if 0 < i <= sim.shape[0] and j <= sim.shape[1]:
            total += sim[i - 1][j - 1]
    return total


def ceaf_phi4(key: list[frozenset], response: list[frozenset]) -> tuple[float, float, float]:
    """CEAF-phi4 P/R/F1 (Luo 2005): entity-based score under the optimal
    one-to-one cluster alignment; phi4 self-similarity is 1, so the
    denominators are the cluster counts."""
    if not key or not response:
        return 0.0, 0.0, 0.0
    sim = np.zeros((len(key), len(response)))
    for i, k in enumerate(key):
        for j, r in enumerate(response):
            sim[i, j] = 2.0 * len(k & r) / (len(k) + len(r))
    total = _max_assignment_total(sim)
    recall = safe_div(total, len(key))
    precision = safe_div(total, len(response))
    f1 = safe_div(2 * precision * recall, precision + recall)
    return precision, recall, f1


def conll_coref_f1(key: list[frozenset], response: list[frozenset]) -> float:
    """CoNLL-2012 official score: mean of MUC, B^3 and CEAF-phi4 F1
    (the average the reference reports via allennlp's
    ``ConllCorefScores``, ``dygie/models/coref.py:80-81,377-381``)."""
    return (
        muc(key, response)[2]
        + b_cubed(key, response)[2]
        + ceaf_phi4(key, response)[2]
    ) / 3


def doc_stats(key: list[frozenset], response: list[frozenset]) -> dict[str, float]:
    """Per-document numerators/denominators of every CoNLL metric —
    the accumulate half of accumulate-then-finalize: corpus scores sum
    these across documents, then :func:`finalize` divides once (the
    CoNLL metrics are NOT per-doc averages)."""

    def b3_side(keys, resps):
        num, den = 0.0, 0
        for k in keys:
            for m in k:
                den += 1
                for r in resps:
                    if m in r:
                        num += len(k & r) / len(k)
                        break
        return num, den

    b3r_num, b3r_den = b3_side(key, response)
    b3p_num, b3p_den = b3_side(response, key)
    key_mentions = {m for k in key for m in k}
    resp_mentions = {m for r in response for m in r}
    ceaf_total = 0.0
    if key and response:
        sim = np.zeros((len(key), len(response)))
        for i, k in enumerate(key):
            for j, r in enumerate(response):
                sim[i, j] = 2.0 * len(k & r) / (len(k) + len(r))
        ceaf_total = _max_assignment_total(sim)
    return {
        "muc_r_num": sum(len(k) - _partition_count(k, response) for k in key),
        "muc_r_den": sum(len(k) - 1 for k in key),
        "muc_p_num": sum(len(r) - _partition_count(r, key) for r in response),
        "muc_p_den": sum(len(r) - 1 for r in response),
        "b3_r_num": b3r_num,
        "b3_r_den": b3r_den,
        "b3_p_num": b3p_num,
        "b3_p_den": b3p_den,
        "ceaf_total": ceaf_total,
        "n_key_clusters": len(key),
        "n_resp_clusters": len(response),
        "ment_matched": len(key_mentions & resp_mentions),
        "ment_key": len(key_mentions),
    }


def finalize(sums: dict[str, float]) -> dict[str, float]:
    """Corpus-level metrics from summed :func:`doc_stats`."""

    def prf(p_num, p_den, r_num, r_den):
        p = safe_div(p_num, p_den)
        r = safe_div(r_num, r_den)
        return p, r, safe_div(2 * p * r, p + r)

    muc_p, muc_r, muc_f = prf(
        sums["muc_p_num"], sums["muc_p_den"], sums["muc_r_num"], sums["muc_r_den"]
    )
    b3_p, b3_r, b3_f = prf(
        sums["b3_p_num"], sums["b3_p_den"], sums["b3_r_num"], sums["b3_r_den"]
    )
    ceaf_p, ceaf_r, ceaf_f = prf(
        sums["ceaf_total"], sums["n_resp_clusters"],
        sums["ceaf_total"], sums["n_key_clusters"],
    )
    return {
        "muc_precision": muc_p, "muc_recall": muc_r, "muc_f1": muc_f,
        "b3_precision": b3_p, "b3_recall": b3_r, "b3_f1": b3_f,
        "ceaf_phi4_precision": ceaf_p, "ceaf_phi4_recall": ceaf_r,
        "ceaf_phi4_f1": ceaf_f,
        "conll_f1": (muc_f + b3_f + ceaf_f) / 3,
        "mention_recall": safe_div(sums["ment_matched"], sums["ment_key"]),
    }
