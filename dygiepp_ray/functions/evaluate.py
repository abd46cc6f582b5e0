"""Distributed evaluation (A1-A6): partial counts inside map_batches,
one tiny global sum, finalized with the compute_f1 port.

Mirrors the reference's accumulate-then-finalize split
(``ner_metrics.py:22-36`` __call__ accumulates TP/FP/FN, ``get_metric``
finalizes) — partial/final is exactly a distributed aggregate.
"""

from __future__ import annotations

import pandas as pd

import ray.data

from .metrics import compute_f1

_KEYS = {
    "ner": ["doc_key", "start", "end", "label"],
    "relation": ["doc_key", "s1", "e1", "s2", "e2", "label"],
    "trigger": ["doc_key", "tok", "label"],
    "argument": ["doc_key", "start", "end", "event_type", "role"],
    "triple": ["conv_id", "subj", "pred", "obj"],
}


def _keyify(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        key = df[cols[0]].astype(str)
        for c in cols[1:]:
            key = key.str.cat(df[c].astype(str), sep="\x00")
        g = key.value_counts()
        return pd.DataFrame({"key": g.index, "n": g.to_numpy()})

    return ds.map_batches(fn, batch_format="pandas")


def evaluate(
    pred: ray.data.Dataset, gold: ray.data.Dataset, task: str
) -> dict[str, float]:
    """Micro P/R/F1 of ``pred`` vs ``gold`` on the task's match key
    (multiset semantics, matching ``relation_metrics.py:19-27``).

    Both sides stream: per-batch key counts -> one global groupby over
    (key, side) partials -> matched = sum(min(pred_n, gold_n)).
    """
    cols = _KEYS[task]
    p = _keyify(pred, cols).map_batches(
        lambda df: df.assign(side="p"), batch_format="pandas"
    )
    g = _keyify(gold, cols).map_batches(
        lambda df: df.assign(side="g"), batch_format="pandas"
    )
    both = p.union(g)

    from ..core import partitioned_map_groups

    def reduce_keys(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"predicted": [0], "gold": [0], "matched": [0]})
        piv = df.pivot_table(
            index="key", columns="side", values="n", aggfunc="sum", fill_value=0
        )
        pn = piv["p"] if "p" in piv else 0
        gn = piv["g"] if "g" in piv else 0
        import numpy as np

        return pd.DataFrame(
            {
                "predicted": [int(np.sum(pn))],
                "gold": [int(np.sum(gn))],
                "matched": [int(np.minimum(pn, gn).sum()) if "p" in piv and "g" in piv else 0],
            }
        )

    parts = partitioned_map_groups(both, "key", reduce_keys, num_buckets=16).to_pandas()
    predicted = int(parts["predicted"].sum())
    gold_n = int(parts["gold"].sum())
    matched = int(parts["matched"].sum())
    precision, recall, f1 = compute_f1(predicted, gold_n, matched)
    return {
        "task": task,
        "predicted": predicted,
        "gold": gold_n,
        "matched": matched,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


def evaluate_coref(
    pred: ray.data.Dataset, gold: ray.data.Dataset, num_buckets: int = 16
) -> dict[str, float]:
    """CoNLL-2012 coreference evaluation over exploded cluster-member
    tables ``(doc_key, cluster_ix, start, end)``.

    Distributed accumulate-then-finalize (allennlp ``ConllCorefScores``
    analogue, ``dygie/models/coref.py:80-81``): both sides co-partition
    on doc_key with ONE keyed exchange, each bucket computes per-doc
    numerators/denominators (``coref_metrics.doc_stats``) and sums
    them; the driver sums the tiny per-bucket rows and finalizes
    MUC / B^3 / CEAF-phi4 P/R/F1 plus their CoNLL mean."""
    from . import coref_metrics as CM
    from ..core import partitioned_map_groups

    cols = ["doc_key", "cluster_ix", "start", "end"]

    def tag(side):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df[cols].copy()
            out["side"] = side
            return out

        return fn

    both = pred.map_batches(tag("p"), batch_format="pandas").union(
        gold.map_batches(tag("g"), batch_format="pandas")
    )

    def bucket_stats(df: pd.DataFrame) -> pd.DataFrame:
        sums: dict[str, float] = {}
        if len(df):
            for _, d in df.groupby("doc_key", sort=False):
                def clusters(side):
                    s = d[d["side"] == side]
                    return [
                        frozenset(zip(g["start"], g["end"]))
                        for _, g in s.groupby("cluster_ix", sort=False)
                    ]

                st = CM.doc_stats(clusters("g"), clusters("p"))
                for k, v in st.items():
                    sums[k] = sums.get(k, 0.0) + v
        if not sums:
            sums = {k: 0.0 for k in CM.doc_stats([], [])}
        return pd.DataFrame({k: [v] for k, v in sums.items()})

    parts = partitioned_map_groups(both, "doc_key", bucket_stats, num_buckets).to_pandas()
    return CM.finalize({c: float(parts[c].sum()) for c in parts.columns})


def mean_across_tasks(results: list[dict]) -> dict[str, float]:
    """A6: MEAN__ metrics across task namespaces (ner.py:165-169)."""
    if not results:
        return {}
    out = {}
    for m in ("precision", "recall", "f1"):
        out[f"MEAN__{m}"] = sum(r[m] for r in results) / len(results)
    return out
