"""Collate / uncollate — GPU batch shaping (SURVEY.md A10 / J5).

The reference manually repartitions sentences for GPU efficiency
(``scripts/data/shared/collate.py:26-66,126-129``): sort all sentences by
length across documents, bin-pack into pseudo-docs under
``max_spans_per_doc ≈ n_sentences * longest_len^2 <= 50k`` and
``max_sentences_per_doc`` budgets, tagging ``_orig_doc_key`` /
``_orig_sent_ix``; ``uncollate.py:53-94`` regroups afterwards and checks
no sentence went missing.

Here: ``collate`` = global ``ds.sort`` on sentence length (a real
all-to-all) + a sequential bin-packer over the sorted stream;
``uncollate`` = ``partitioned_map_groups`` on ``_orig_doc_key`` with an
in-group sort on ``_orig_sent_ix`` — exactly the conv_id/turn_idx
regroup pattern.  Round-trip safety is test-enforced like the
reference's ``collate_test.py:82-106``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..core import partitioned_map_groups

SENT_SCHEMA = pa.schema(
    [
        ("_orig_doc_key", pa.string()),
        ("_orig_sent_ix", pa.int32()),
        ("tokens", pa.list_(pa.string())),
        ("n_tokens", pa.int32()),
    ]
)


def explode_sentences(docs: ray.data.Dataset) -> ray.data.Dataset:
    """documents -> one row per sentence with provenance tags."""

    def fn(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sents = tbl["sentences"]
        if isinstance(sents, pa.ChunkedArray):
            sents = sents.combine_chunks()
        parents = pc.list_parent_indices(sents)
        flat = pc.list_flatten(sents)  # list<string> per sentence
        off = np.asarray(sents.offsets)
        off = off - off[0]
        n = len(flat)
        sent_ix = np.arange(n) - off[np.asarray(parents)]
        return pa.table(
            {
                "_orig_doc_key": tbl["doc_key"].take(parents),
                "_orig_sent_ix": pa.array(sent_ix, pa.int32()),
                "tokens": flat,
                "n_tokens": pc.list_value_length(flat).cast(pa.int32()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def collate(
    sentences: ray.data.Dataset,
    max_spans_per_doc: int = 50_000,
    max_sentences_per_doc: int = 16,
    dataset: str = "synth",
) -> ray.data.Dataset:
    """Sentence rows -> pseudo-document rows.

    Global sort by length (collate.py:97-105), then greedy packing under
    the span budget ``n_sents * longest^2`` (collate.py:126-129).  The
    packer is a sequential pass over the sorted stream (driver-side
    iter_batches — the budget logic is inherently sequential; the heavy
    work, the sort, is distributed)."""
    sorted_ds = sentences.sort("n_tokens")
    rows = {"doc_key": [], "dataset": [], "sentences": [], "sentence_start": [],
            "_orig_doc_key": [], "_orig_sent_ix": [], "n_tokens": []}
    cur_toks: list[list[str]] = []
    cur_keys: list[str] = []
    cur_ixs: list[int] = []
    longest = 0
    n_doc = 0

    def flush():
        nonlocal cur_toks, cur_keys, cur_ixs, longest, n_doc
        if not cur_toks:
            return
        starts = np.zeros(len(cur_toks), dtype=np.int32)
        lens = [len(t) for t in cur_toks]
        if len(lens) > 1:
            starts[1:] = np.cumsum(lens[:-1])
        rows["doc_key"].append(f"pseudo_doc_{n_doc:06d}")
        rows["dataset"].append(dataset)
        rows["sentences"].append(cur_toks)
        rows["sentence_start"].append(starts.tolist())
        rows["_orig_doc_key"].append(cur_keys)
        rows["_orig_sent_ix"].append(cur_ixs)
        rows["n_tokens"].append(int(sum(lens)))
        n_doc += 1
        cur_toks, cur_keys, cur_ixs, longest = [], [], [], 0

    for batch in sorted_ds.iter_batches(batch_size=4096, batch_format="pandas"):
        for key, ix, toks, n in zip(
            batch["_orig_doc_key"], batch["_orig_sent_ix"],
            batch["tokens"], batch["n_tokens"],
        ):
            new_longest = max(longest, int(n))
            if cur_toks and (
                (len(cur_toks) + 1) * new_longest ** 2 > max_spans_per_doc
                or len(cur_toks) + 1 > max_sentences_per_doc
            ):
                flush()
                new_longest = int(n)
            cur_toks.append(list(toks))
            cur_keys.append(key)
            cur_ixs.append(int(ix))
            longest = new_longest
    flush()
    tbl = pa.table(
        {
            "doc_key": pa.array(rows["doc_key"], pa.string()),
            "dataset": pa.array(rows["dataset"], pa.string()),
            "sentences": pa.array(rows["sentences"], pa.list_(pa.list_(pa.string()))),
            "sentence_start": pa.array(rows["sentence_start"], pa.list_(pa.int32())),
            "_orig_doc_key": pa.array(rows["_orig_doc_key"], pa.list_(pa.string())),
            "_orig_sent_ix": pa.array(rows["_orig_sent_ix"], pa.list_(pa.int32())),
            "n_tokens": pa.array(rows["n_tokens"], pa.int32()),
        }
    )
    return ray.data.from_arrow(tbl)


def uncollate(pseudo_docs: ray.data.Dataset) -> ray.data.Dataset:
    """Pseudo-docs -> original sentence rows, regrouped by origin doc and
    re-sorted by original sentence index; missing-sentence check per doc
    happens naturally downstream (uncollate.py:73-74 analogue is the
    caller comparing counts)."""

    def explode(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = tbl["_orig_doc_key"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        parents = pc.list_parent_indices(keys)
        sents = tbl["sentences"]
        if isinstance(sents, pa.ChunkedArray):
            sents = sents.combine_chunks()
        return pa.table(
            {
                "_orig_doc_key": pc.list_flatten(keys),
                "_orig_sent_ix": pc.list_flatten(tbl["_orig_sent_ix"].combine_chunks() if isinstance(tbl["_orig_sent_ix"], pa.ChunkedArray) else tbl["_orig_sent_ix"]),
                "tokens": pc.list_flatten(sents),
            }
        )

    flat = pseudo_docs.map_batches(explode, batch_format="pyarrow")

    def regroup(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["_orig_doc_key", "_orig_sent_ix"], ignore_index=True)

    return partitioned_map_groups(flat, "_orig_doc_key", regroup, num_buckets=16)
