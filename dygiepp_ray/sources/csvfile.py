"""RFC 4180 CSV corpus source: real quoted-field parsing over file
payload columns.

The reference ingests delimited text via pandas/csv per file
(``reference/scripts/data/chemprot/02_chemprot_to_input.py`` reads TSVs
row-by-row); at 100 TB the same shape is a Dataset of (file_id, payload)
rows — one CSV file per row, parsed inside ``map_batches`` so files
stream through the object store and the parser state (dialect) loads
once per actor.

Contents are deterministic md5 chains with RFC 4180 edge cases planted
by rule — embedded commas, doubled quotes, embedded newlines inside
quoted fields, CRLF record separators — so the DuckDB twin regenerates
the expected (doc_id, category, n_chars, text_md5) without parsing CSV.
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

CSV_SEED = 31
_NEEDS_QUOTE = (",", '"', "\n", "\r")


def _row_text(i: int, seed: int) -> tuple[str, str]:
    """(category, text) for row ``i`` — the generation rule the SQL twin
    mirrors: an md5-chain core with one planted special char by i % 4."""
    base = hashlib.md5(f"csv:{seed}:{i}".encode()).hexdigest()
    size = 10 + int(base[0:2], 16) % 50
    chain = "".join(
        hashlib.md5(f"csv:{seed}:{i}:{j}".encode()).hexdigest()
        for j in range(3)
    )
    core = chain[:size]
    variant = i % 4
    if variant == 0:
        text = core
    elif variant == 1:
        text = core[:5] + "," + core[5:]
    elif variant == 2:
        text = core[:5] + '"' + core[5:]
    else:
        text = core[:5] + "\n" + core[5:]
    category = "cat" + str(int(base[0], 16) % 5)
    return category, text


def _quote(field: str) -> str:
    if any(c in field for c in _NEEDS_QUOTE):
        return '"' + field.replace('"', '""') + '"'
    return field


def synth_csv_files(
    n_rows: int = 48, n_files: int = 3, seed: int = CSV_SEED
) -> pa.Table:
    """(file_id, payload): REAL RFC 4180 CSV files (header + CRLF
    records, quoting applied exactly per the RFC) holding rule-generated
    rows; row i lives in file i % n_files."""
    bufs = [io.StringIO() for _ in range(n_files)]
    for b in bufs:
        b.write("doc_id,category,text\r\n")
    for i in range(n_rows):
        category, text = _row_text(i, seed)
        bufs[i % n_files].write(
            f"{i},{_quote(category)},{_quote(text)}\r\n"
        )
    return pa.table(
        {
            "file_id": pa.array(range(n_files), pa.int64()),
            "payload": pa.array(
                [b.getvalue().encode("utf-8") for b in bufs], pa.binary()
            ),
        }
    )


class CsvParse:
    """Actor-pool stage: real RFC 4180 parse (stdlib ``csv`` dialect —
    doubled-quote unescaping, embedded newlines honored) ->
    (doc_id, category, n_chars, text_md5) per record."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import csv

        rows = {"doc_id": [], "category": [], "n_chars": [], "text_md5": []}
        for payload in df["payload"]:
            rdr = csv.reader(io.StringIO(bytes(payload).decode("utf-8")))
            header = next(rdr, None)
            if header != ["doc_id", "category", "text"]:
                raise ValueError(f"unexpected CSV header: {header}")
            for rec in rdr:
                doc_id, category, text = rec
                rows["doc_id"].append(int(doc_id))
                rows["category"].append(category)
                rows["n_chars"].append(len(text))
                rows["text_md5"].append(
                    hashlib.md5(text.encode("utf-8")).hexdigest()
                )
        return pd.DataFrame(rows).astype(
            {"doc_id": np.int64, "n_chars": np.int64}
        )


def csv_docs(
    files: ray.data.Dataset, concurrency: int = 2, batch_size: int = 2
) -> ray.data.Dataset:
    """Parse a Dataset of whole-file CSV payloads (small batches: one
    file per row keeps record extraction streaming at scale)."""
    return files.map_batches(
        CsvParse, batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )
