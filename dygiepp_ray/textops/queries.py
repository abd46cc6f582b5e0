"""Driver-facing queries for the training-data operators (dedup,
similarity search, text analysis, multimodal plumbing) with DuckDB
oracles where SQL-expressible; the rest are rows-only checks (noted)."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from . import ann, dedup, multimodal, quality
from ..textops.quality import STOPWORDS


def _docs(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


def q_token_count(sf_dir: str):
    return quality.token_counts(_docs(sf_dir))


SQL_TOKEN_COUNT = """
SELECT doc_id,
       CAST(CASE WHEN trim(text) = '' THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
            AS BIGINT) AS n_tokens
FROM documents
"""


def q_bpe_token_count(sf_dir: str):
    return quality.bpe_token_counts(_docs(sf_dir))


SQL_BPE_TOKEN_COUNT = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{quality.BPE_PATTERN.replace("'", "''")}')) AS BIGINT) AS n_bpe_tokens
FROM documents
"""


def q_quality(sf_dir: str):
    return quality.quality_scores(_docs(sf_dir))


_STOP_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)

SQL_QUALITY = f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS arr
  FROM documents
),
toks AS (SELECT doc_id, unnest(arr) AS tok FROM base),
agg AS (
  SELECT doc_id,
         count(*) AS n_tokens,
         sum(CASE WHEN tok IN ({_STOP_LIST}) THEN 1 ELSE 0 END) AS n_stopwords,
         count(DISTINCT tok) AS n_distinct,
         sum(len(tok)) * 100 // count(*) AS mean_len
  FROM toks GROUP BY 1
)
SELECT b.doc_id,
       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(a.n_stopwords, 0) AS BIGINT) AS n_stopwords,
       CAST(COALESCE(a.n_distinct, 0) AS BIGINT) AS n_distinct,
       CAST(COALESCE(a.mean_len, 0) AS BIGINT) AS mean_token_len_x100
FROM base b LEFT JOIN agg a USING (doc_id)
"""


def q_dedup_exact(sf_dir: str):
    return dedup.exact_dedup(_docs(sf_dir))


SQL_DEDUP_EXACT = """
SELECT md5(text) AS text_hash,
       CAST(min(doc_id) AS BIGINT) AS rep_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY 1
"""

_ANN_QUERY_IDS = list(range(10))


def q_ann_topk(sf_dir: str):
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return ann.brute_force_topk(emb, _ANN_QUERY_IDS, k=5)


SQL_ANN_TOPK = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
  WHERE vec_id IN ({", ".join(str(i) for i in _ANN_QUERY_IDS)})
),
sims AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS sim
  FROM embeddings e, q
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
  FROM sims
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(vec_id AS BIGINT) AS vec_id,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
"""


def q_fingerprints(sf_dir: str):
    """Rows-only: polynomial token-stream fingerprints (not SQL-expressible
    without bignum arithmetic)."""
    return quality.fingerprints(_docs(sf_dir))


def q_simhash(sf_dir: str):
    """Rows-only: 64-bit simhash signatures."""
    return dedup.simhash_signatures(_docs(sf_dir))


def q_lang_id(sf_dir: str):
    """Rows-only: heuristic n-gram language ID (driver text is synthetic
    word salad — the heuristic is exercised properly in pytest)."""
    return quality.lang_id(_docs(sf_dir))


def q_minhash_near_dups(sf_dir: str):
    """Rows-only: MinHash-LSH candidate pairs verified by exact Jaccard
    (bucketed-join verify — the scale path; broadcast variant is
    equivalence-tested against it)."""
    docs = _docs(sf_dir)
    sigs = dedup.minhash_signatures(docs)
    pairs = dedup.lsh_candidate_pairs(sigs)
    return dedup.ngram_jaccard_verify_bucketed(pairs, docs, threshold=0.8)


def q_embedding_near_dups(sf_dir: str):
    """Rows-only: embedding-cosine near-dup pairs via multi-probe
    hyperplane LSH buckets (cosine >= 0.9)."""
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return ann.embedding_near_dups(emb, threshold=0.9)


def q_media_features(sf_dir: str):
    """Rows-only: multimodal decode/feature plumbing over a deterministic
    synthetic media table (binary payload column; stubbed codec)."""
    media = ray.data.from_arrow(multimodal.synth_media(128))
    feats = multimodal.decode_features(media)
    return feats.map_batches(
        lambda df: pd.DataFrame(
            {
                "media_id": df["media_id"].astype(np.int64),
                "kind": df["kind"],
                "n_bytes": df["n_bytes"].astype(np.int64),
                "f0_x1e6": (df["features"].map(lambda f: float(f[0])) * 1e6).astype(np.int64),
            }
        ),
        batch_format="pandas",
    )


TEXTOPS_QUERIES = {
    "token_count": (q_token_count, SQL_TOKEN_COUNT),
    "bpe_token_count": (q_bpe_token_count, SQL_BPE_TOKEN_COUNT),
    "quality_scores": (q_quality, SQL_QUALITY),
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "ann_topk": (q_ann_topk, SQL_ANN_TOPK),
    "fingerprints": (q_fingerprints, None),
    "simhash_signatures": (q_simhash, None),
    "lang_id": (q_lang_id, None),
    "minhash_near_dups": (q_minhash_near_dups, None),
    "embedding_near_dups": (q_embedding_near_dups, None),
    "media_features": (q_media_features, None),
}
