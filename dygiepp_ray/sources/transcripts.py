"""Transcript sources (SURVEY.md §2.1 S1/S3/S6).

Canonical input is the BASELINE.json input_hint table:
``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp)`` in Parquet.  Columns are pruned at the
read — the extraction pipeline needs only (conv_id, turn_idx, text)
plus whatever metadata columns the caller asks to carry.

``documents_as_transcripts`` adapts the driver's
``documents.parquet`` (doc_id, text, ...) into that shape — the
analogue of the raw-text-directory reader
(``/root/reference/scripts/new-dataset/format_new_dataset.py:12-31``):
one conversation per document, turns = fixed-size token chunks (the
deterministic stand-in for spacy sentencization, so the DuckDB oracle
can reproduce sentence boundaries as ``floor(pos / turn_tokens)``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from ..semantics import DEFAULT_CONFIG, ExtractionConfig

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def read_transcripts(
    path: str, columns: list[str] | None = None
) -> ray.data.Dataset:
    """Read a transcript Parquet table; prune to the needed columns."""
    cols = columns if columns is not None else ["conv_id", "turn_idx", "role", "text"]
    return ray.data.read_parquet(path, columns=cols)


class _DocsToTurns:
    """Vectorized: explode each document's text into fixed-size token
    chunks (turns).  Stateless but kept as a class so the chunk size is
    bound once."""

    # synthetic-ts epoch (2024-01-01 UTC, microseconds)
    TS0_US = 1_704_067_200_000_000

    def __init__(
        self, turn_tokens: int, with_tool: bool = False, with_ts: bool = False
    ):
        self.turn_tokens = turn_tokens
        self.with_tool = with_tool
        self.with_ts = with_ts

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        tt = self.turn_tokens
        toks = batch["text"].str.strip().str.split(r"\s+", regex=True)
        conv_ids, turn_idxs, texts = [], [], []
        roles = []
        for doc_id, words in zip(batch["doc_id"].to_numpy(), toks):
            cid = f"doc{doc_id}"
            n = len(words)
            for t, lo in enumerate(range(0, n, tt)):
                conv_ids.append(cid)
                turn_idxs.append(t)
                texts.append(" ".join(words[lo : lo + tt]))
                roles.append(("user", "assistant", "tool")[t % 3])
        out = pd.DataFrame(
            {
                "conv_id": conv_ids,
                "turn_idx": np.asarray(turn_idxs, dtype=np.int32),
                "role": roles,
                "text": texts,
            }
        )
        if self.with_tool:
            # deterministic input_hint ``tool`` column: tool turns
            # (role == 'tool', i.e. turn_idx % 3 == 2) invoke tool
            # 't{turn_idx % 4}'; other turns carry ''
            ti = out["turn_idx"].to_numpy(np.int64)
            out["tool"] = np.where(
                ti % 3 == 2, "t" + pd.Series(ti % 4).astype(str), ""
            )
        if self.with_ts:
            # deterministic input_hint ``ts`` column: turn t lands at
            # TS0 + tri(t) seconds (tri = t(t+1)/2 — growing gaps, so
            # span/gap stats are non-trivial and SQL-reproducible)
            ti = out["turn_idx"].to_numpy(np.int64)
            us = self.TS0_US + (ti * (ti + 1) // 2) * 1_000_000
            out["ts"] = pd.to_datetime(us, unit="us")
        return out


def documents_as_transcripts(
    sf_dir: str, cfg: ExtractionConfig = DEFAULT_CONFIG,
    with_tool: bool = False, with_ts: bool = False,
) -> ray.data.Dataset:
    """Driver ``documents`` table -> transcript-shaped Dataset.
    ``with_tool=True`` / ``with_ts=True`` also synthesize the
    input_hint ``tool`` / ``ts`` columns (deterministic,
    SQL-reproducible)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        _DocsToTurns(cfg.turn_tokens, with_tool, with_ts),
        batch_format="pandas", batch_size=2048,
    )
