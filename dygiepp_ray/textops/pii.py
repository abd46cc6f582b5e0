"""PII scanning over a text corpus — the redaction-candidate screen a
training-data pipeline runs before any export (emails, phone numbers,
card-like digit runs).

The sandbox corpus (`documents.parquet`) is synthetic lowercase prose
with no PII, so the query synthesizes its OWN corpus with planted PII
via the repo's md5-chain convention (like ``sources/csvfile.py``): the
DuckDB twin regenerates every document from the generation rule and
applies the same RE2-compatible patterns — a full hash-checked oracle
for a regex-scan operator.

Patterns are restricted to constructs with identical semantics in
Python ``re`` and RE2 (literal classes, bounded repeats, no lookaround)
and are compiled ONCE per actor (the scanner is an actor-pool stage).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

PII_SEED = 11
N_PII_DOCS = 160

# leftmost non-overlapping matches (re.findall == regexp_extract_all)
PII_PATTERNS = {
    "n_email": r"[a-z0-9]+@[a-z0-9]+\.com",
    "n_phone": r"555-[0-9]{4}",
    "n_card": r"[0-9]{16}",
}


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def synth_pii_docs(n: int = N_PII_DOCS) -> pa.Table:
    """Deterministic corpus with planted PII: doc i gets 6 hex words
    plus, by ``hexval(base[0:6]) % 5``: an email / a phone / a 16-digit
    card / an email AND a phone / nothing."""
    ids, texts = [], []
    for i in range(n):
        base = _md5(f"pii:{PII_SEED}:{i}")
        words = [_md5(f"pii:{PII_SEED}:{i}:{j}")[:8] for j in range(6)]
        text = " ".join(words)
        v = int(base[:6], 16)
        kind = v % 5
        if kind == 0:
            text += f" contact user{base[:4]}@ex{base[4:6]}.com now"
        elif kind == 1:
            text += f" call 555-{v % 10000:04d} today"
        elif kind == 2:
            d8 = str(int(base[6:12], 16) % 10**8).zfill(8)
            text += f" card {d8}{d8} on file"
        elif kind == 3:
            text += (f" mail a{base[:3]}@b{base[3:5]}.com"
                     f" or 555-{(v // 7) % 10000:04d}")
        ids.append(i)
        texts.append(text)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


class PiiScanner:
    """Actor-pool stage: patterns compiled once per actor in
    ``__init__`` (T1-style heavy-setup discipline); ``__call__`` scans
    a batch vectorized via ``Series.str.count``."""

    def __init__(self, patterns: dict[str, str] | None = None):
        import re as _re

        self.pats = {k: _re.compile(v)
                     for k, v in (patterns or PII_PATTERNS).items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        cols = {"doc_id": object, **{k: np.int64 for k in self.pats},
                "has_pii": np.int64}
        if len(df) == 0 or "text" not in df.columns:
            return pd.DataFrame({c: pd.Series(dtype=t)
                                 for c, t in cols.items()})
        out = {"doc_id": df["doc_id"].to_numpy()}
        total = np.zeros(len(df), dtype=np.int64)
        for k, pat in self.pats.items():
            c = df["text"].str.count(pat).to_numpy(np.int64)
            out[k] = c
            total += c
        out["has_pii"] = (total > 0).astype(np.int64)
        return pd.DataFrame(out)


def scan_pii(ds: ray.data.Dataset, concurrency: int = 2) -> ray.data.Dataset:
    """(doc_id, n_email, n_phone, n_card, has_pii) per document."""
    return ds.map_batches(
        PiiScanner, batch_format="pandas", concurrency=concurrency
    )
