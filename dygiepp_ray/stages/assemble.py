"""Document assembly (SURVEY.md §7.2-3, J5, M8, M9).

``transcripts -> documents``: group turns by ``conv_id``, restore stable
turn order by ``turn_idx`` (the reference assumes in-order contiguous
sentences, ``dygie/models/coref.py:169-172``), tokenize, and window long
conversations into documents of <= ``max_tokens_per_doc`` tokens with
the greedy splitter semantics of ``document.py:197-251`` (doc_key
suffixed ``_SPLIT_{i}``, renumbered ``sentence_start``; an oversized
single sentence raises).

This is the ONE required shuffle of the extraction pipeline.  It runs
through ``core.partitioned_map_groups`` keyed on ``conv_id`` — a single
all-to-all exchange into ``num_buckets`` hash buckets, with per-bucket
vectorized assembly (pandas sort + numpy boundary detection; the only
per-conversation Python work is the greedy window loop over sentence
lengths).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..core import partitioned_map_groups, ts_epoch_us
from ..semantics import DEFAULT_CONFIG, ExtractionConfig

_NORM_RE = r"(?<!\S)/([.?])(?!\S)"  # vectorized _normalize_word (dygie.py:213-218)

DOC_SCHEMA = pa.schema(
    [
        ("doc_key", pa.string()),
        ("conv_id", pa.string()),
        ("dataset", pa.string()),
        ("sentences", pa.list_(pa.list_(pa.string()))),
        ("sentence_start", pa.list_(pa.int32())),
        ("turn_idx", pa.list_(pa.int32())),
        ("roles", pa.list_(pa.string())),
        ("n_tokens", pa.int32()),
    ]
)


def _assemble_bucket(df: pd.DataFrame, cfg: ExtractionConfig) -> pa.Table:
    if len(df) == 0:
        return DOC_SCHEMA.empty_table()
    df = df.sort_values(["conv_id", "turn_idx"], kind="stable")
    text = df["text"].astype(str).str.replace(_NORM_RE, r"\1", regex=True)
    toks = text.str.strip().str.split(r"\s+", regex=True)
    # empty turns tokenize to [] (pandas yields [''] for empty strings)
    token_lists = [t if t != [""] else [] for t in toks.tolist()]
    conv_ids = df["conv_id"].to_numpy()
    turn_idx = df["turn_idx"].to_numpy()
    roles = (
        df["role"].to_numpy() if "role" in df.columns else np.full(len(df), "", object)
    )
    # optional transcript metadata passthrough (input_hint ts/tool — the
    # reference's `_`-metadata carry-through, doc/data.md:94-106)
    ts_us = ts_epoch_us(df["ts"]) if "ts" in df.columns else None
    tools = df["tool"].to_numpy() if "tool" in df.columns else None
    # conversation boundaries (conv_ids sorted)
    boundaries = np.flatnonzero(
        np.r_[True, conv_ids[1:] != conv_ids[:-1]]
    ).tolist() + [len(conv_ids)]

    out = {k: [] for k in ("doc_key", "conv_id", "dataset", "sentences",
                           "sentence_start", "turn_idx", "roles", "n_tokens")}
    if ts_us is not None:
        out["ts_us"] = []
    if tools is not None:
        out["tools"] = []
    mx = cfg.max_tokens_per_doc
    dataset = cfg.dataset
    turn_list = turn_idx.tolist()
    role_list = list(roles)
    ts_list = ts_us.tolist() if ts_us is not None else None
    tool_list = list(tools) if tools is not None else None
    for bi in range(len(boundaries) - 1):
        lo, hi = boundaries[bi], boundaries[bi + 1]
        cid = conv_ids[lo]
        sents = token_lists[lo:hi]
        lens = [len(s) for s in sents]
        # greedy windowing (document.py:197-251)
        windows: list[tuple[int, int]] = []
        wlo, wtok = 0, 0
        for i, ln in enumerate(lens):
            if ln > mx:
                raise ValueError(f"sentence longer than max_tokens_per_doc in {cid}")
            if i > wlo and wtok + ln > mx:
                windows.append((wlo, i))
                wlo, wtok = i, 0
            wtok += ln
        windows.append((wlo, len(sents)))
        one = len(windows) == 1
        for w, (a, b) in enumerate(windows):
            starts, acc = [], 0
            for ln in lens[a:b]:
                starts.append(acc)
                acc += ln
            out["doc_key"].append(cid if one else f"{cid}_SPLIT_{w}")
            out["conv_id"].append(cid)
            out["dataset"].append(dataset)
            out["sentences"].append(sents[a:b])
            out["sentence_start"].append(starts)
            out["turn_idx"].append(turn_list[lo + a : lo + b])
            out["roles"].append(role_list[lo + a : lo + b])
            out["n_tokens"].append(acc)
            if ts_list is not None:
                out["ts_us"].append(ts_list[lo + a : lo + b])
            if tool_list is not None:
                out["tools"].append(tool_list[lo + a : lo + b])
    schema = DOC_SCHEMA
    if ts_list is not None:
        schema = schema.append(pa.field("ts_us", pa.list_(pa.int64())))
    if tool_list is not None:
        schema = schema.append(pa.field("tools", pa.list_(pa.string())))
    return pa.Table.from_pydict(out, schema=schema)


def assemble_documents(
    transcripts: ray.data.Dataset,
    cfg: ExtractionConfig = DEFAULT_CONFIG,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """transcripts (conv_id, turn_idx, text [, role]) -> document rows."""
    return partitioned_map_groups(
        transcripts,
        key="conv_id",
        fn=lambda df: _assemble_bucket(df, cfg),
        num_buckets=num_buckets,
    )
