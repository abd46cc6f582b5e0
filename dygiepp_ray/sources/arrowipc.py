"""Arrow IPC stream source: real columnar wire-format parsing over
file payload columns.

The reference reads whole-file corpora per document
(``reference/dygie/data/dataset_readers/document.py`` +
``scripts/data/shared/*`` file walkers); at 100 TB the modern shape for
the same ingest is a Dataset of (file_id, payload) rows where each
payload is an Arrow IPC STREAM (the feather/flight wire format): the
schema travels with the bytes, record batches decode zero-copy, and the
parse happens inside ``map_batches`` so files stream through the object
store.

Each synthesized payload is a genuine multi-batch IPC stream (schema
message + 2 record batches + EOS) whose row contents are deterministic
md5 chains, so the DuckDB twin regenerates the expected
(doc_id, category, n_chars, text_md5) without touching Arrow.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

IPC_SEED = 41
ROWS_PER_FILE = 4
BATCHES_PER_FILE = 2


def _row(doc_id: int, seed: int) -> tuple[str, str]:
    """(category, text) for global row ``doc_id`` — the generation rule
    the SQL twin mirrors."""
    base = hashlib.md5(f"ipc:{seed}:{doc_id}".encode()).hexdigest()
    size = 12 + int(base[0:2], 16) % 40
    chain = "".join(
        hashlib.md5(f"ipc:{seed}:{doc_id}:{j}".encode()).hexdigest()
        for j in range(2)
    )
    return "cat" + str(int(base[0], 16) % 4), chain[:size]


def synth_ipc_files(
    n_files: int = 16, seed: int = IPC_SEED
) -> pa.Table:
    """(file_id, payload): REAL Arrow IPC streams, 2 record batches per
    file so the reader's batch loop is exercised for real."""
    ids, payloads = [], []
    rows_per_batch = ROWS_PER_FILE // BATCHES_PER_FILE
    for i in range(n_files):
        sink = pa.BufferOutputStream()
        schema = pa.schema(
            [("doc_id", pa.int64()), ("category", pa.string()),
             ("text", pa.string())]
        )
        with pa.ipc.new_stream(sink, schema) as writer:
            for b in range(BATCHES_PER_FILE):
                dids, cats, texts = [], [], []
                for r in range(rows_per_batch):
                    doc_id = (i * ROWS_PER_FILE
                              + b * rows_per_batch + r)
                    cat, text = _row(doc_id, seed)
                    dids.append(doc_id)
                    cats.append(cat)
                    texts.append(text)
                writer.write_batch(
                    pa.record_batch(
                        [pa.array(dids, pa.int64()),
                         pa.array(cats, pa.string()),
                         pa.array(texts, pa.string())],
                        schema=schema,
                    )
                )
        ids.append(i)
        payloads.append(sink.getvalue().to_pybytes())
    return pa.table(
        {
            "file_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class IpcReader:
    """Actor-pool stage: opens each payload as a genuine IPC stream
    (``pa.ipc.open_stream``), walks every record batch, and emits one
    row per document with a content digest.  A payload that is not a
    valid IPC stream raises instead of passing through."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": [], "category": [], "n_chars": [],
               "text_md5": []}
        for payload in df["payload"]:
            with pa.ipc.open_stream(pa.BufferReader(bytes(payload))) as r:
                for batch in r:
                    b = batch.to_pydict()
                    for did, cat, text in zip(
                        b["doc_id"], b["category"], b["text"]
                    ):
                        out["doc_id"].append(int(did))
                        out["category"].append(cat)
                        out["n_chars"].append(len(text))
                        out["text_md5"].append(
                            hashlib.md5(text.encode()).hexdigest())
        return pd.DataFrame(out).astype(
            {"doc_id": np.int64, "n_chars": np.int64}
        )


def ipc_docs(
    files: ray.data.Dataset, concurrency: int = 2, batch_size: int = 4
) -> ray.data.Dataset:
    return files.map_batches(
        IpcReader(), batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )
