"""Composite corpus-curation pipeline — the end-to-end shape of a
training-data preparation job, composed from the engine's own
operators:

    quality gate  (token count + lexical diversity thresholds)
  x exact dedup   (md5 content hash; representative = min doc_id)
  x near dedup    (MinHash-LSH candidates -> exact Jaccard >= 0.8 ->
                   connected components; representative = component min)

Every stage is the already-tested distributed operator; the joins that
stitch the per-stage verdicts back onto documents are two-sided keyed
exchanges (``core.hash_coexchange``) — nothing is broadcast or
driver-materialized.  Dedup representatives are computed over the FULL
corpus (dedup-before-filter ordering), then combined with the quality
gate; ``kept = quality_ok & exact_rep & near_rep``.

The whole composite is SQL-expressible, so the driver verifies it
end to end (``SQL`` twin in ``textops/queries.py``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data

from ..core import hash_coexchange
from . import dedup, quality

MIN_TOKENS = 20
DIVERSITY_NUM = 3  # keep iff DIVERSITY_NUM * n_distinct >= n_tokens


def curate(
    docs: ray.data.Dataset,
    min_tokens: int = MIN_TOKENS,
    jaccard_threshold: float = 0.8,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """documents (doc_id, text) -> (doc_id, quality_ok, exact_rep,
    near_rep, kept) — one row per input document, all int64 0/1."""

    # --- stage 1: quality gate (vectorized map) --------------------------
    def gate(df: pd.DataFrame) -> pd.DataFrame:
        ok = (df["n_tokens"] >= min_tokens) & (
            DIVERSITY_NUM * df["n_distinct"] >= df["n_tokens"]
        )
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype(np.int64),
             "quality_ok": ok.to_numpy().astype(np.int64)}
        )

    q = quality.quality_scores(docs).map_batches(gate, batch_format="pandas")

    # --- stage 2: exact-dup representatives ------------------------------
    def hash_docs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "text_hash": df["text"].map(
                    lambda t: hashlib.md5(t.encode()).hexdigest()
                ),
            }
        )

    hashes = docs.map_batches(hash_docs, batch_format="pandas")
    reps = dedup.exact_dedup(docs)

    def mark_exact(h: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if (len(h) == 0 or "doc_id" not in h.columns
                or len(r) == 0 or "text_hash" not in r.columns):
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "exact_rep": pd.Series(dtype=np.int64)})
        j = h.merge(r[["text_hash", "rep_id"]], on="text_hash", how="inner")
        return pd.DataFrame(
            {"doc_id": j["doc_id"].astype(np.int64),
             "exact_rep": (j["doc_id"] == j["rep_id"]).to_numpy().astype(np.int64)}
        )

    ex = hash_coexchange(hashes, reps, "text_hash", "text_hash",
                         mark_exact, num_buckets)

    # --- stage 3: near-dup representatives -------------------------------
    sigs = dedup.minhash_signatures(docs)
    pairs = dedup.lsh_candidate_pairs(sigs)
    verified = dedup.ngram_jaccard_verify(
        pairs, docs, threshold=jaccard_threshold, num_buckets=num_buckets
    )
    comps = dedup.connected_components(verified, num_buckets=num_buckets)

    ids = docs.map_batches(
        lambda df: pd.DataFrame({"doc_id": df["doc_id"].astype(np.int64)}),
        batch_format="pandas",
    )

    def mark_near(d: pd.DataFrame, c: pd.DataFrame) -> pd.DataFrame:
        if len(d) == 0 or "doc_id" not in d.columns:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "near_rep": pd.Series(dtype=np.int64)})
        if len(c) == 0 or "node" not in c.columns:
            return pd.DataFrame(
                {"doc_id": d["doc_id"].astype(np.int64),
                 "near_rep": np.ones(len(d), dtype=np.int64)}
            )
        j = d.merge(
            c.rename(columns={"node": "doc_id"})[["doc_id", "component"]],
            on="doc_id", how="left",
        )
        keep = j["component"].isna() | (j["component"] == j["doc_id"])
        return pd.DataFrame(
            {"doc_id": j["doc_id"].astype(np.int64),
             "near_rep": keep.to_numpy().astype(np.int64)}
        )

    nd = hash_coexchange(ids, comps, "doc_id", "node", mark_near, num_buckets)

    # --- combine verdicts (two more coexchanges on doc_id) ----------------
    def join_on_doc(a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
        if len(a) == 0 or "doc_id" not in a.columns:
            return a.head(0)
        if len(b) == 0 or "doc_id" not in b.columns:
            return a.head(0)
        return a.merge(b, on="doc_id", how="inner")

    qe = hash_coexchange(q, ex, "doc_id", "doc_id", join_on_doc, num_buckets)
    full = hash_coexchange(qe, nd, "doc_id", "doc_id", join_on_doc, num_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "quality_ok" not in df.columns:
            return pd.DataFrame(
                {c: pd.Series(dtype=np.int64)
                 for c in ("doc_id", "quality_ok", "exact_rep", "near_rep", "kept")}
            )
        df = df.copy()
        df["kept"] = df["quality_ok"] * df["exact_rep"] * df["near_rep"]
        return df[["doc_id", "quality_ok", "exact_rep", "near_rep", "kept"]]

    return full.map_batches(finish, batch_format="pandas")
