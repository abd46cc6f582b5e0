"""TFRecord sink/source — the length-prefixed record container ML
training stacks stream from.  The writer emits the REAL on-wire
format: little-endian uint64 length, masked CRC32C of the length
bytes, payload, masked CRC32C of the payload (CRC32C Castagnoli,
table-driven — no external deps); the reader re-verifies every CRC,
so any framing or checksum bug fails loudly instead of yielding
garbage records.

Oracle strategy: payloads are document texts grouped per source, so
the SQL twin reproduces the per-shard statistics by string
aggregation — the CONTAINER round trip (and its checksums) is what
the engine is graded on.

Reference analogue: the prediction sink / instance cache
(``reference/dygie/predict.py``, SURVEY S4/S5) re-expressed as the
standard training-data interchange format.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd

_CRC32C_POLY = 0x82F63B78
_CRC32C_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ (_CRC32C_POLY if _c & 1 else 0)
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC32C_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def write_tfrecords(payloads: list[bytes]) -> bytes:
    """Serialize payloads into REAL TFRecord framing."""
    out = bytearray()
    for data in payloads:
        ln = struct.pack("<Q", len(data))
        out += ln
        out += struct.pack("<I", _masked(crc32c(ln)))
        out += data
        out += struct.pack("<I", _masked(crc32c(data)))
    return bytes(out)


def read_tfrecords(blob: bytes) -> list[bytes]:
    """Parse TFRecord framing, verifying BOTH CRCs per record."""
    out, pos = [], 0
    while pos < len(blob):
        ln_bytes = blob[pos:pos + 8]
        (ln,) = struct.unpack("<Q", ln_bytes)
        (lcrc,) = struct.unpack("<I", blob[pos + 8:pos + 12])
        if lcrc != _masked(crc32c(ln_bytes)):
            raise ValueError(f"length CRC mismatch at byte {pos}")
        data = blob[pos + 12:pos + 12 + ln]
        if len(data) != ln:
            raise ValueError("truncated TFRecord")
        (dcrc,) = struct.unpack(
            "<I", blob[pos + 12 + ln:pos + 16 + ln])
        if dcrc != _masked(crc32c(data)):
            raise ValueError(f"data CRC mismatch at byte {pos}")
        out.append(data)
        pos += 16 + ln
    return out


def shard_roundtrip(df: pd.DataFrame) -> pd.DataFrame:
    """Bucket body for a source-keyed exchange: write one TFRecord
    shard per source (docs in doc_id order), read it back with full
    CRC verification, emit the shard statistics."""
    empty = pd.DataFrame(
        {"source": pd.Series(dtype=object),
         "n_records": pd.Series(dtype=np.int64),
         "total_bytes": pd.Series(dtype=np.int64),
         "content_md5": pd.Series(dtype=object)})
    if len(df) == 0 or "source" not in df.columns:
        return empty
    rows = {"source": [], "n_records": [], "total_bytes": [],
            "content_md5": []}
    for src, g in df.groupby("source"):
        g = g.sort_values("doc_id")
        payloads = [str(t).encode("utf-8") for t in g["text"]]
        blob = write_tfrecords(payloads)
        back = read_tfrecords(blob)  # CRC-verified round trip
        if back != payloads:
            raise ValueError(f"TFRecord round trip diverged for {src}")
        rows["source"].append(str(src))
        rows["n_records"].append(len(back))
        rows["total_bytes"].append(sum(len(p) for p in back))
        rows["content_md5"].append(
            hashlib.md5(b"".join(back)).hexdigest())
    return pd.DataFrame(rows).astype(
        {"n_records": np.int64, "total_bytes": np.int64})
