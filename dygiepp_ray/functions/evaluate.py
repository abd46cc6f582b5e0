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
            key = key.str.cat(df[c].astype(str), sep="\x1f")
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
    p = _keyify(pred, cols)
    g = _keyify(gold, cols)

    from ..core import hash_coexchange

    def reduce_keys(pdf: pd.DataFrame, gdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        def per_key(df: pd.DataFrame) -> pd.Series:
            if len(df) == 0 or "key" not in df.columns:
                return pd.Series(dtype=np.int64)
            return df.groupby("key", sort=False)["n"].sum()

        pk, gk = per_key(pdf), per_key(gdf)
        j = pd.concat([pk.rename("p"), gk.rename("g")], axis=1).fillna(0)
        return pd.DataFrame(
            {
                "predicted": [int(pk.sum())],
                "gold": [int(gk.sum())],
                "matched": [int(np.minimum(j["p"], j["g"]).sum()) if len(j) else 0],
            }
        )

    parts = hash_coexchange(p, g, "key", "key", reduce_keys, num_buckets=16).to_pandas()
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


def _keyify_weighted(
    ds: ray.data.Dataset, cols: list[str], weight_col: str
) -> ray.data.Dataset:
    import numpy as np

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        key = df[cols[0]].astype(str)
        for c in cols[1:]:
            key = key.str.cat(df[c].astype(str), sep="\x1f")
        d = pd.DataFrame(
            {"key": key, "w": df[weight_col].to_numpy(np.float64)}
        )
        g = d.groupby("key", as_index=False).agg(n=("w", "size"), w=("w", "first"))
        return g.astype({"n": np.int64})

    return ds.map_batches(fn, batch_format="pandas")


def evaluate_weighted(
    pred: ray.data.Dataset,
    gold: ray.data.Dataset,
    task: str,
    weight_col: str = "weight",
) -> dict[str, float]:
    """Weighted micro P/R/F1: every annotation counts with its document
    ``weight`` (the reference's per-document weight,
    ``document.py:95-104``, used as a loss multiplier at
    ``models/dygie.py:257-264`` — here the evaluation-side analogue).

    Same distributed shape as :func:`evaluate` (per-batch key partials
    -> one keyed coexchange -> tiny sums): predicted_w = Σ w over
    predicted keys, gold_w = Σ w over gold keys, matched_w =
    Σ min(pred_n, gold_n) × w per key.  The weight must be constant per
    match key's document (all ``_KEYS`` lead with doc_key/conv_id, so a
    per-doc weight satisfies this; conv-keyed tasks need
    conversation-constant weights)."""
    import numpy as np

    cols = _KEYS[task]
    p = _keyify_weighted(pred, cols, weight_col)
    g = _keyify_weighted(gold, cols, weight_col)

    from ..core import hash_coexchange

    def reduce_keys(pdf: pd.DataFrame, gdf: pd.DataFrame) -> pd.DataFrame:
        def per_key(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0 or "key" not in df.columns:
                return pd.DataFrame(
                    {"n": pd.Series(dtype=np.int64),
                     "w": pd.Series(dtype=np.float64)}
                )
            return df.groupby("key", sort=False).agg(
                n=("n", "sum"), w=("w", "first")
            )

        pk, gk = per_key(pdf), per_key(gdf)
        j = pk.join(gk, how="outer", lsuffix="_p", rsuffix="_g")
        if len(j):
            n_p = j["n_p"].fillna(0).to_numpy(np.float64)
            n_g = j["n_g"].fillna(0).to_numpy(np.float64)
            w = j["w_p"].fillna(j["w_g"]).to_numpy(np.float64)
            matched = float((np.minimum(n_p, n_g) * w).sum())
        else:
            matched = 0.0
        return pd.DataFrame(
            {
                "predicted_w": [float((pk["n"] * pk["w"]).sum()) if len(pk) else 0.0],
                "gold_w": [float((gk["n"] * gk["w"]).sum()) if len(gk) else 0.0],
                "matched_w": [matched],
            }
        )

    parts = hash_coexchange(p, g, "key", "key", reduce_keys, num_buckets=16).to_pandas()
    predicted = float(parts["predicted_w"].sum())
    gold_n = float(parts["gold_w"].sum())
    matched = float(parts["matched_w"].sum())
    precision, recall, f1 = compute_f1(predicted, gold_n, matched)
    return {
        "task": task,
        "predicted_w": predicted,
        "gold_w": gold_n,
        "matched_w": matched,
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
    from ..core import hash_coexchange

    cols = ["doc_key", "cluster_ix", "start", "end"]

    def select(df: pd.DataFrame) -> pd.DataFrame:
        return df[cols].copy()

    p = pred.map_batches(select, batch_format="pandas")
    g = gold.map_batches(select, batch_format="pandas")

    def bucket_stats(pdf: pd.DataFrame, gdf: pd.DataFrame) -> pd.DataFrame:
        def by_doc(df: pd.DataFrame) -> dict:
            if len(df) == 0 or "doc_key" not in df.columns:
                return {}
            return {
                dk: [
                    frozenset(zip(grp["start"], grp["end"]))
                    for _, grp in d.groupby("cluster_ix", sort=False)
                ]
                for dk, d in df.groupby("doc_key", sort=False)
            }

        pc_, gc = by_doc(pdf), by_doc(gdf)
        sums: dict[str, float] = {}
        for dk in set(pc_) | set(gc):
            st = CM.doc_stats(gc.get(dk, []), pc_.get(dk, []))
            for k, v in st.items():
                sums[k] = sums.get(k, 0.0) + v
        if not sums:
            sums = {k: 0.0 for k in CM.doc_stats([], [])}
        return pd.DataFrame({k: [v] for k, v in sums.items()})

    parts = hash_coexchange(
        p, g, "doc_key", "doc_key", bucket_stats, num_buckets
    ).to_pandas()
    return CM.finalize({c: float(parts[c].sum()) for c in parts.columns})


def mean_across_tasks(results: list[dict]) -> dict[str, float]:
    """A6: MEAN__ metrics across task namespaces (ner.py:165-169)."""
    if not results:
        return {}
    out = {}
    for m in ("precision", "recall", "f1"):
        out[f"MEAN__{m}"] = sum(r[m] for r in results) / len(results)
    return out
