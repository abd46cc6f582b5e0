"""TAR archive corpus source — the multi-file packaging container
(Common-Crawl-style corpus tarballs): one binary payload holds many
members behind 512-byte headers with octal size fields and block
padding, all of which the reader must honor to find each member.

The synthetic tarball's member CONTENTS are ascii md5 hex chains, so a
SQL oracle can regenerate every member (name, size, md5) without
parsing tar at all — any offset/padding mistake in the reader
desynchronizes sizes and hashes and fails the hash match."""

from __future__ import annotations

import hashlib
import io
import tarfile

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

TAR_SEED = 17


def synth_tar(n_members: int = 24, seed: int = TAR_SEED) -> pa.Table:
    """One-row (archive_id, payload) table holding a REAL tar archive
    with ``n_members`` text members of pseudo-random sizes."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for i in range(n_members):
            base = hashlib.md5(f"tar:{seed}:{i}".encode()).hexdigest()
            size = 30 + int(base[0:3], 16) % 470
            chunks, j = [], 0
            while 32 * j < size:
                chunks.append(
                    hashlib.md5(f"tar:{seed}:{i}:{j}".encode()).hexdigest()
                )
                j += 1
            content = "".join(chunks)[:size].encode("ascii")
            info = tarfile.TarInfo(name=f"doc_{i}.txt")
            info.size = len(content)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(content))
    return pa.table(
        {
            "archive_id": pa.array([0], pa.int64()),
            "payload": pa.array([buf.getvalue()], pa.binary()),
        }
    )


class TarMembers:
    """Actor-pool stage: real tar parse -> one row per member
    (archive_id, name, size, content_md5)."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = {"archive_id": [], "name": [], "size": [],
                "content_md5": []}
        for aid, payload in zip(df["archive_id"], df["payload"]):
            with tarfile.open(fileobj=io.BytesIO(bytes(payload))) as tf:
                for info in tf:
                    if not info.isfile():
                        continue
                    data = tf.extractfile(info).read()
                    rows["archive_id"].append(int(aid))
                    rows["name"].append(info.name)
                    rows["size"].append(len(data))
                    rows["content_md5"].append(
                        hashlib.md5(data).hexdigest()
                    )
        return pd.DataFrame(rows).astype(
            {"archive_id": np.int64, "size": np.int64}
        )


def tar_members(
    archives: ray.data.Dataset, concurrency: int = 2, batch_size: int = 4
) -> ray.data.Dataset:
    """Real archive decode (small batches: whole-archive payloads —
    at scale one archive per row keeps member extraction streaming)."""
    return archives.map_batches(
        TarMembers, batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )


GZ_SEED = 23


def synth_gzip_docs(n: int = 24, seed: int = GZ_SEED) -> pa.Table:
    """(doc_id, payload): REAL gzip-compressed text documents (the
    .wet.gz / .jsonl.gz corpus shape).  Contents are ascii md5 chains;
    compression happens here at runtime, so the reader's zlib
    round-trip is exact regardless of zlib version, and the SQL twin
    regenerates (size, md5) from the rule without gzip."""
    import gzip

    ids, payloads = [], []
    for i in range(n):
        base = hashlib.md5(f"gz:{seed}:{i}".encode()).hexdigest()
        size = 30 + int(base[0:3], 16) % 470
        chunks, j = [], 0
        while 32 * j < size:
            chunks.append(hashlib.md5(f"gz:{seed}:{i}:{j}".encode()).hexdigest())
            j += 1
        content = "".join(chunks)[:size].encode("ascii")
        ids.append(i)
        payloads.append(gzip.compress(content, mtime=0))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class GzipDecode:
    """Actor-pool stage: real gzip decompression -> (doc_id, raw_size,
    compressed_size, content_md5)."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import gzip

        rows = {"doc_id": [], "raw_size": [], "compressed_size": [],
                "content_md5": []}
        for did, payload in zip(df["doc_id"], df["payload"]):
            data = gzip.decompress(bytes(payload))
            rows["doc_id"].append(int(did))
            rows["raw_size"].append(len(data))
            rows["compressed_size"].append(len(payload))
            rows["content_md5"].append(hashlib.md5(data).hexdigest())
        return pd.DataFrame(rows).astype(
            {"doc_id": np.int64, "raw_size": np.int64,
             "compressed_size": np.int64}
        )


def gzip_docs(
    archives: ray.data.Dataset, concurrency: int = 2, batch_size: int = 8
) -> ray.data.Dataset:
    return archives.map_batches(
        GzipDecode, batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )


ZIP_SEED = 29


def synth_zip(n_members: int = 24, seed: int = ZIP_SEED) -> pa.Table:
    """One-row (archive_id, payload) table holding a REAL zip archive:
    members alternate STORED / DEFLATED compression, so the reader must
    honor the central directory's per-member codec (and zipfile's CRC32
    check) to recover each content.  Contents are ascii md5 chains, so
    the SQL oracle regenerates (name, size, md5) without unzipping."""
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for i in range(n_members):
            base = hashlib.md5(f"zip:{seed}:{i}".encode()).hexdigest()
            size = 30 + int(base[0:3], 16) % 470
            chunks, j = [], 0
            while 32 * j < size:
                chunks.append(
                    hashlib.md5(f"zip:{seed}:{i}:{j}".encode()).hexdigest()
                )
                j += 1
            content = "".join(chunks)[:size].encode("ascii")
            info = zipfile.ZipInfo(f"doc_{i}.txt", date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = (
                zipfile.ZIP_STORED if i % 2 == 0 else zipfile.ZIP_DEFLATED
            )
            zf.writestr(info, content)
    return pa.table(
        {
            "archive_id": pa.array([0], pa.int64()),
            "payload": pa.array([buf.getvalue()], pa.binary()),
        }
    )


class ZipMembers:
    """Actor-pool stage: real zip parse (central directory walk,
    per-member codec, CRC32 verified by the stdlib reader) -> one row
    per member (archive_id, name, size, stored, content_md5)."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import zipfile

        rows = {"archive_id": [], "name": [], "size": [], "stored": [],
                "content_md5": []}
        for aid, payload in zip(df["archive_id"], df["payload"]):
            with zipfile.ZipFile(io.BytesIO(bytes(payload))) as zf:
                for info in zf.infolist():
                    if info.is_dir():
                        continue
                    data = zf.read(info)  # CRC32-checked by zipfile
                    rows["archive_id"].append(int(aid))
                    rows["name"].append(info.filename)
                    rows["size"].append(len(data))
                    rows["stored"].append(
                        np.int64(info.compress_type == zipfile.ZIP_STORED)
                    )
                    rows["content_md5"].append(hashlib.md5(data).hexdigest())
        return pd.DataFrame(rows).astype(
            {"archive_id": np.int64, "size": np.int64, "stored": np.int64}
        )


def zip_members(
    archives: ray.data.Dataset, concurrency: int = 2, batch_size: int = 4
) -> ray.data.Dataset:
    """Real archive decode (small batches: whole-archive payloads)."""
    return archives.map_batches(
        ZipMembers, batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )
