"""Minimal-but-REAL PDF source — the document container a scanned /
born-digital corpus arrives in.  The synthetic files carry a genuine
cross-reference table (fixed 20-byte entries, byte-exact offsets), a
trailer with startxref, and content streams framed by /Length; the
reader resolves objects THROUGH the xref (seek to each offset, verify
the object header), so any offset or framing bug fails loudly.  Stream
contents are ascii md5 chains, so the SQL oracle regenerates
(obj_num, kind, stream_len, stream_md5) without parsing PDF.

Reference analogue: format-faithful corpus readers
(``reference/dygie/data/dataset_readers``); actor-pool decode shape
like ``sources/csvfile.py``.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

PDF_SEED = 43


def _pdf_stream(i: int, k: int, seed: int = PDF_SEED) -> bytes:
    sb = hashlib.md5(f"pdf:{seed}:{i}:{k}".encode()).hexdigest()
    size = 30 + int(sb[0:2], 16) % 200
    chunks, j = [], 0
    while 32 * j < size:
        chunks.append(
            hashlib.md5(f"pdf:{seed}:{i}:{k}:{j}".encode()).hexdigest())
        j += 1
    return "".join(chunks)[:size].encode("ascii")


def synth_pdf(n: int = 6, seed: int = PDF_SEED) -> pa.Table:
    """(file_id, payload): REAL minimal PDFs — catalog/pages/page
    objects plus 3-7 content streams, a byte-exact xref table and a
    startxref trailer."""
    ids, payloads = [], []
    for i in range(n):
        base = hashlib.md5(f"pdf:{seed}:{i}".encode()).hexdigest()
        ns = 3 + int(base[0], 16) % 5
        out = bytearray(b"%PDF-1.4\n")
        offsets = []

        def add(obj_bytes: bytes):
            offsets.append(len(out))
            out.extend(obj_bytes)

        add(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
        add(b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\n"
            b"endobj\n")
        add(b"3 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\n")
        for k in range(1, ns + 1):
            data = _pdf_stream(i, k, seed)
            add(f"{3 + k} 0 obj\n<< /Length {len(data)} >>\nstream\n"
                .encode("ascii") + data + b"\nendstream\nendobj\n")
        xref_off = len(out)
        n_objs = len(offsets)
        out.extend(f"xref\n0 {n_objs + 1}\n".encode("ascii"))
        out.extend(b"0000000000 65535 f \n")
        for off in offsets:
            out.extend(f"{off:010d} 00000 n \n".encode("ascii"))
        out.extend(
            f"trailer\n<< /Size {n_objs + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_off}\n%%EOF".encode("ascii"))
        ids.append(i)
        payloads.append(bytes(out))
    return pa.table({
        "file_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    })


_OBJ_HEAD = re.compile(rb"^(\d+) 0 obj\n")


class PdfObjects:
    """Actor-pool stage: REAL xref-driven object walk — read
    startxref, parse the fixed-width table, seek each in-use offset,
    verify the object header, and frame streams by /Length -> one row
    per object (file_id, obj_num, kind, stream_len, stream_md5)."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = {"file_id": [], "obj_num": [], "kind": [],
                "stream_len": [], "stream_md5": []}
        for fid, payload in zip(df["file_id"], df["payload"]):
            data = bytes(payload)
            sx = data.rindex(b"startxref")
            xref_off = int(data[sx + 9:data.index(b"%%EOF", sx)].strip())
            if data[xref_off:xref_off + 4] != b"xref":
                raise ValueError("startxref does not point at xref")
            hdr_end = data.index(b"\n", data.index(b"\n", xref_off) + 1)
            first, count = map(int, data[
                data.index(b"\n", xref_off) + 1:hdr_end].split())
            table = data[hdr_end + 1:hdr_end + 1 + 20 * count]
            for e in range(count):
                ent = table[20 * e:20 * e + 20]
                off, _gen, flag = ent[:10], ent[11:16], ent[17:18]
                if flag == b"f":
                    continue
                off = int(off)
                m = _OBJ_HEAD.match(data[off:off + 32])
                if not m:
                    raise ValueError(f"xref offset {off} not at an object")
                num = int(m.group(1))
                endobj = data.index(b"endobj", off)
                body = data[off:endobj]
                if b"/Length" in body:
                    ln = int(re.search(rb"/Length (\d+)", body).group(1))
                    sp = body.index(b"stream\n") + 7
                    stream = body[sp:sp + ln]
                    if body[sp + ln:sp + ln + 11] != b"\nendstream\n":
                        raise ValueError("stream framing mismatch")
                    kind, slen = "stream", ln
                    smd5 = hashlib.md5(stream).hexdigest()
                else:
                    t = re.search(rb"/Type /(\w+)", body)
                    kind = t.group(1).decode().lower() if t else "other"
                    slen = 0
                    smd5 = hashlib.md5(b"").hexdigest()
                rows["file_id"].append(int(fid))
                rows["obj_num"].append(num)
                rows["kind"].append(kind)
                rows["stream_len"].append(slen)
                rows["stream_md5"].append(smd5)
        return pd.DataFrame(rows).astype(
            {"file_id": np.int64, "obj_num": np.int64,
             "stream_len": np.int64})


def pdf_objects(
    files: ray.data.Dataset, concurrency: int = 2, batch_size: int = 4
) -> ray.data.Dataset:
    return files.map_batches(
        PdfObjects, batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency)
