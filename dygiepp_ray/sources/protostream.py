"""Delimited-protobuf stream source — the varint-framed wire format
RPC logs and many training-data dumps arrive in.  The synthetic
stream is REAL protobuf wire encoding (varint length prefix per
message; inside: tag bytes with wire types 0/2, varint and
length-delimited fields), parsed back by tag — no protobuf library
involved, so the varint/tag walk itself is what's tested.  Payloads
are ascii md5 chains, so the SQL oracle regenerates every message
without parsing the wire format (the tarball.py convention).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

PB_SEED = 47


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(0x80 | b)
        else:
            out.append(b)
            return bytes(out)


def _pb_payload(i: int, seed: int = PB_SEED) -> tuple[str, bytes]:
    base = hashlib.md5(f"pb:{seed}:{i}".encode()).hexdigest()
    size = 25 + int(base[0:2], 16) % 230
    chunks, j = [], 0
    while 32 * j < size:
        chunks.append(
            hashlib.md5(f"pb:{seed}:{i}:{j}".encode()).hexdigest())
        j += 1
    return base, "".join(chunks)[:size].encode("ascii")


def synth_protostream(n: int = 40, seed: int = PB_SEED) -> pa.Table:
    """One-row (file_id, payload) table holding a REAL delimited
    protobuf stream: per message, field 1 = varint doc_id (values
    exceed 127, so multi-byte varints are the norm), field 2 =
    length-delimited category, field 3 = length-delimited payload."""
    buf = bytearray()
    for i in range(n):
        base, data = _pb_payload(i, seed)
        cat = f"cat{int(base[2], 16) % 5}"
        msg = bytearray()
        msg += b"\x08" + _varint(1000 + i * 7)          # field 1, varint
        msg += b"\x12" + _varint(len(cat)) + cat.encode()  # field 2, bytes
        msg += b"\x1a" + _varint(len(data)) + data      # field 3, bytes
        buf += _varint(len(msg)) + msg
    return pa.table({
        "file_id": pa.array([0], pa.int64()),
        "payload": pa.array([bytes(buf)], pa.binary()),
    })


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


class ProtoRecords:
    """Actor-pool stage: REAL wire-format walk — varint length
    framing, tag/wire-type dispatch — one row per message
    (file_id, msg_idx, doc_id, category, payload_len, payload_md5)."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = {"file_id": [], "msg_idx": [], "doc_id": [],
                "category": [], "payload_len": [], "payload_md5": []}
        for fid, payload in zip(df["file_id"], df["payload"]):
            data = bytes(payload)
            pos = idx = 0
            while pos < len(data):
                mlen, pos = _read_varint(data, pos)
                end = pos + mlen
                doc_id, cat, pmd5, plen = None, None, None, 0
                while pos < end:
                    tag, pos = _read_varint(data, pos)
                    field, wt = tag >> 3, tag & 7
                    if wt == 0:
                        v, pos = _read_varint(data, pos)
                        if field == 1:
                            doc_id = v
                    elif wt == 2:
                        ln, pos = _read_varint(data, pos)
                        blob = data[pos:pos + ln]
                        pos += ln
                        if field == 2:
                            cat = blob.decode("ascii")
                        elif field == 3:
                            plen = ln
                            pmd5 = hashlib.md5(blob).hexdigest()
                    else:
                        raise ValueError(f"unsupported wire type {wt}")
                if pos != end:
                    raise ValueError("message length mismatch")
                rows["file_id"].append(int(fid))
                rows["msg_idx"].append(idx)
                rows["doc_id"].append(doc_id)
                rows["category"].append(cat)
                rows["payload_len"].append(plen)
                rows["payload_md5"].append(pmd5)
                idx += 1
        return pd.DataFrame(rows).astype(
            {"file_id": np.int64, "msg_idx": np.int64,
             "doc_id": np.int64, "payload_len": np.int64})


def proto_records(
    files: ray.data.Dataset, concurrency: int = 2, batch_size: int = 4
) -> ray.data.Dataset:
    return files.map_batches(
        ProtoRecords, batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency)
