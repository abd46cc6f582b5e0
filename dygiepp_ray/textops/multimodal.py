"""Multimodal column plumbing (binary payloads + typed metadata).

Image/audio/video payloads are opaque ``binary`` columns with explicit
metadata columns; decode / feature-extract / resize / frame-sample run
as actor-pool ``map_batches`` stages with small batch sizes (payloads
are large, so batch x concurrency must fit worker heap — see
ray_guide.md memory notes).

The decode libraries (PIL / torchaudio / ffmpeg) are NOT available in
this container, so the codec boundary is stubbed: ``RealDecoder``
raises ``NotImplementedError`` at construction unless the library
import succeeds, and ``FakeDecoder`` produces deterministic
pseudo-features from the payload bytes so the Ray-side plumbing —
schema, batch sizing, actor signature, output layout — is real and
tested.
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),           # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 16


def synth_media(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media table for plumbing tests.

    Every field derives from md5 hex strings (payload = ascii bytes of
    an md5 chain), so the DuckDB correctness oracle can regenerate the
    exact table in SQL — see ``SQL_MEDIA_FEATURES``."""
    kinds_v = ("image", "audio", "video")
    ids, kinds, payloads, widths, heights, rates, durs = [], [], [], [], [], [], []
    for i in range(n):
        base = hashlib.md5(f"media:{seed}:{i}".encode()).hexdigest()
        kind = kinds_v[int(base[0:2], 16) % 3]
        n_hex = 64 + int(base[2:6], 16) % 4032
        chunks = []
        j = 0
        while 32 * j < n_hex:
            chunks.append(hashlib.md5(f"media:{seed}:{i}:{j}".encode()).hexdigest())
            j += 1
        ids.append(i)
        kinds.append(kind)
        payloads.append("".join(chunks)[:n_hex].encode("ascii"))
        widths.append(16 + int(base[6:10], 16) % 496)
        heights.append(16 + int(base[10:14], 16) % 496)
        rates.append(16000 if kind == "audio" else 0)
        durs.append(int(base[14:18], 16) % 10_000)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "sample_rate": pa.array(rates, pa.int32()),
            "duration_ms": pa.array(durs, pa.int32()),
        }
    )


class RealDecoder:
    """Actor-pool decode stage backed by a real codec library.

    STUB: the container has no PIL/torchaudio/ffmpeg; construction
    raises unless an import succeeds.  The __call__ contract matches
    FakeDecoder."""

    def __init__(self):
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - expected in sandbox
            raise NotImplementedError(
                "media codecs not available in this environment; "
                "use FakeDecoder for plumbing tests"
            ) from e

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:  # pragma: no cover
        raise NotImplementedError


class FakeDecoder:
    """Deterministic stand-in decode + feature-extract stage.

    Features = first FEATURE_DIM bytes of md5(payload) scaled to [0,1) —
    a pure function of the payload, so tests are reproducible and
    parallelism-invariant."""

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.dim = feature_dim

    def features(self, payload: bytes) -> np.ndarray:
        h = hashlib.md5(payload).digest()
        reps = -(-self.dim // len(h))
        raw = (h * reps)[: self.dim]
        return np.frombuffer(bytes(raw), dtype=np.uint8).astype(np.float32) / 256.0

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        feats = [self.features(p) for p in df["payload"]]
        return pd.DataFrame(
            {
                "media_id": df["media_id"].to_numpy(),
                "kind": df["kind"].to_numpy(),
                "n_bytes": df["payload"].map(len).to_numpy().astype(np.int64),
                "features": feats,
            }
        )


def decode_features(
    media: ray.data.Dataset, concurrency: int = 2, batch_size: int = 16
) -> ray.data.Dataset:
    """Actor-pool decode: small batches (large payloads), state per actor."""
    return media.map_batches(
        FakeDecoder, batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )


WAV_SEED = 9
WAV_RATE = 8000


def synth_wav(n: int = 32, seed: int = WAV_SEED) -> pa.Table:
    """(media_id, payload): REAL RIFF/WAV files (mono, 16-bit,
    ``WAV_RATE`` Hz) written with the stdlib ``wave`` module.  Sample
    bytes are an md5 hex chain (``unhexlify(md5('wav:seed:i:j')...)``),
    so the DuckDB oracle regenerates every int16 sample from hex-pair
    arithmetic — unlike ``synth_media``'s opaque payloads, this decode
    path parses an actual container format."""
    import io
    import wave

    ids, payloads = [], []
    for i in range(n):
        base = hashlib.md5(f"wav:{seed}:{i}".encode()).hexdigest()
        n_samples = 64 + int(base[0:4], 16) % 448
        hexchain = []
        j = 0
        while 32 * j < 4 * n_samples:
            hexchain.append(hashlib.md5(f"wav:{seed}:{i}:{j}".encode()).hexdigest())
            j += 1
        sample_bytes = bytes.fromhex("".join(hexchain)[: 4 * n_samples])
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(WAV_RATE)
            w.writeframes(sample_bytes)
        ids.append(i)
        payloads.append(buf.getvalue())
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class WavDecoder:
    """Actor-pool stage: REAL audio decode via the stdlib ``wave``
    module — parses the RIFF container (header fields come from the
    FILE, not from metadata columns) and reduces the int16 PCM stream
    vectorized."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import io
        import wave

        rates, counts, sums = [], [], []
        for payload in df["payload"]:
            with wave.open(io.BytesIO(payload), "rb") as w:
                rates.append(w.getframerate())
                nf = w.getnframes()
                counts.append(nf)
                pcm = np.frombuffer(w.readframes(nf), dtype="<i2")
            sums.append(int(np.abs(pcm.astype(np.int64)).sum()))
        return pd.DataFrame(
            {
                "media_id": df["media_id"].to_numpy().astype(np.int64),
                "sample_rate": np.array(rates, dtype=np.int64),
                "n_samples": np.array(counts, dtype=np.int64),
                "sum_abs": np.array(sums, dtype=np.int64),
            }
        )


def wav_features(
    media: ray.data.Dataset, concurrency: int = 2, batch_size: int = 16
) -> ray.data.Dataset:
    """Real-decode audio features: small batches (binary payloads)."""
    return media.map_batches(
        WavDecoder, batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )


WAV_RMS_WIN = 64


class WavWindowDecoder:
    """Actor-pool stage: REAL wave parse -> per-64-sample-window exact
    integer energy (sum of squared int16 samples) — the loudness
    profile a speech-segmentation pipeline windows on.  The tail
    window may be short; its true length is emitted."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import io
        import wave

        _OUT = {"media_id": np.int64, "win_ix": np.int64,
                "n_samples": np.int64, "energy": np.int64}
        if len(df) == 0 or "payload" not in df.columns:
            return pd.DataFrame({c: pd.Series(dtype=t)
                                 for c, t in _OUT.items()})
        rows = {c: [] for c in _OUT}
        for mid, payload in zip(df["media_id"], df["payload"]):
            with wave.open(io.BytesIO(payload), "rb") as w:
                pcm = np.frombuffer(
                    w.readframes(w.getnframes()), dtype="<i2"
                ).astype(np.int64)
            for wix in range(0, len(pcm), WAV_RMS_WIN):
                win = pcm[wix:wix + WAV_RMS_WIN]
                rows["media_id"].append(int(mid))
                rows["win_ix"].append(wix // WAV_RMS_WIN)
                rows["n_samples"].append(len(win))
                rows["energy"].append(int((win * win).sum()))
        return pd.DataFrame(rows).astype(_OUT)


def wav_rms_windows(
    media: ray.data.Dataset, concurrency: int = 2, batch_size: int = 16
) -> ray.data.Dataset:
    """Real-decode windowed audio energy: small batches (binary
    payloads), exact integers end to end."""
    return media.map_batches(
        WavWindowDecoder, batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )


PPM_SEED = 11


def synth_ppm(n: int = 16, seed: int = PPM_SEED) -> pa.Table:
    """(media_id, payload): REAL binary PPM (P6) images — a genuine
    image container parseable without any codec library.  Pixel bytes
    are an md5 hex chain, so the DuckDB oracle regenerates every RGB
    byte (see ``SQL_PPM_FEATURES``)."""
    ids, payloads = [], []
    for i in range(n):
        base = hashlib.md5(f"ppm:{seed}:{i}".encode()).hexdigest()
        w = 8 + int(base[0:4], 16) % 56
        h = 8 + int(base[4:8], 16) % 56
        n_bytes = w * h * 3
        hexchain = []
        j = 0
        while 32 * j < 2 * n_bytes:
            hexchain.append(hashlib.md5(f"ppm:{seed}:{i}:{j}".encode()).hexdigest())
            j += 1
        pixels = bytes.fromhex("".join(hexchain)[: 2 * n_bytes])
        ids.append(i)
        payloads.append(f"P6\n{w} {h}\n255\n".encode("ascii") + pixels)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def _parse_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a binary P6 header + pixel matrix (REAL container parse)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts = payload.split(b"\n", 3)
    w, h = (int(x) for x in parts[1].split())
    pixels = np.frombuffer(parts[3][: w * h * 3], dtype=np.uint8)
    return w, h, pixels.reshape(-1, 3)


class PpmDecoder:
    """Actor-pool stage: real image decode (P6 header + RGB matrix) —
    width/height come from the FILE; per-channel byte sums reduce the
    pixel matrix vectorized."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ws, hs, sums = [], [], []
        for payload in df["payload"]:
            w, h, px = _parse_ppm(payload)
            ws.append(w)
            hs.append(h)
            sums.append(px.astype(np.int64).sum(axis=0))
        sums = np.stack(sums) if sums else np.zeros((0, 3), dtype=np.int64)
        return pd.DataFrame(
            {
                "media_id": df["media_id"].to_numpy().astype(np.int64),
                "width": np.array(ws, dtype=np.int64),
                "height": np.array(hs, dtype=np.int64),
                "sum_r": sums[:, 0],
                "sum_g": sums[:, 1],
                "sum_b": sums[:, 2],
            }
        )


def ppm_features(
    media: ray.data.Dataset, concurrency: int = 2, batch_size: int = 16
) -> ray.data.Dataset:
    """Real-decode image features (small batches: binary payloads)."""
    return media.map_batches(
        PpmDecoder, batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )


def resize_nearest(payload: bytes, factor: int = 2) -> bytes:
    """REAL image resize: nearest-neighbor downsample of a P6 payload by
    an integer factor (pure numpy striding — the codec-free analogue of
    the usual thumbnailing stage; integer-exact and tested vs a
    reference implementation)."""
    w, h, px = _parse_ppm(payload)
    img = px.reshape(h, w, 3)[::factor, ::factor, :]
    nh, nw = img.shape[0], img.shape[1]
    return f"P6\n{nw} {nh}\n255\n".encode("ascii") + img.tobytes()


def resize_images(
    media: ray.data.Dataset, factor: int = 2,
    concurrency: int = 2, batch_size: int = 16,
) -> ray.data.Dataset:
    """Thumbnailing stage: payload -> downsampled payload (same schema,
    so it composes with :func:`ppm_features` downstream)."""

    def _resize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["payload"] = [resize_nearest(p, factor) for p in df["payload"]]
        return df

    return media.map_batches(
        _resize, batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )


def frame_sample(
    media: ray.data.Dataset, every_ms: int = 1000, concurrency: int = 2
) -> ray.data.Dataset:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (decode itself stubbed — features derived per frame
    deterministically)."""

    class Sampler:
        def __init__(self):
            self.dec = FakeDecoder()

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            rows = {"media_id": [], "frame_ms": [], "features": []}
            vids = df[df["kind"] == "video"]
            for mid, payload, dur in zip(vids["media_id"], vids["payload"], vids["duration_ms"]):
                for t in range(0, int(dur), every_ms):
                    rows["media_id"].append(mid)
                    rows["frame_ms"].append(t)
                    rows["features"].append(
                        self.dec.features(payload + t.to_bytes(4, "little"))
                    )
            return pd.DataFrame(rows)

    return media.map_batches(
        Sampler, batch_format="pandas", batch_size=16, concurrency=concurrency
    )


BMP_SEED = 11


def synth_bmp(n: int = 16, seed: int = BMP_SEED) -> pa.Table:
    """(media_id, payload): REAL 24-bpp uncompressed BMP files —
    bottom-up row order and 4-byte row padding, the two quirks that
    make BMP a genuine parser exercise beyond PPM.  The LOGICAL
    top-down BGR pixel stream is an md5 hex chain (same convention as
    :func:`synth_ppm`), so the DuckDB oracle regenerates every byte;
    padding and row flipping exist only inside the file and must be
    undone by the parser."""
    import struct

    ids, payloads = [], []
    for i in range(n):
        base = hashlib.md5(f"bmp:{seed}:{i}".encode()).hexdigest()
        w = 8 + int(base[0:4], 16) % 33
        h = 8 + int(base[4:8], 16) % 33
        n_bytes = w * h * 3
        hexchain = []
        j = 0
        while 32 * j < 2 * n_bytes:
            hexchain.append(
                hashlib.md5(f"bmp:{seed}:{i}:{j}".encode()).hexdigest()
            )
            j += 1
        logical = bytes.fromhex("".join(hexchain)[: 2 * n_bytes])
        stride = (w * 3 + 3) // 4 * 4
        pad = b"\x00" * (stride - w * 3)
        rows = [logical[r * w * 3:(r + 1) * w * 3] + pad
                for r in range(h)]
        body = b"".join(reversed(rows))  # bottom-up storage
        size = 54 + len(body)
        header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
        dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                          2835, 2835, 0, 0)
        ids.append(i)
        payloads.append(header + dib + body)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def _parse_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL BMP parse: header offsets, 4-byte row stride, bottom-up
    flip — returns the logical top-down (h*w, 3) BGR matrix."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24 or h <= 0:
        raise ValueError("only bottom-up 24-bpp BMP supported")
    stride = (w * 3 + 3) // 4 * 4
    body = np.frombuffer(payload, dtype=np.uint8,
                         count=stride * h, offset=off)
    rows = body.reshape(h, stride)[:, : w * 3]
    logical = rows[::-1].reshape(-1, 3)  # flip to top-down
    return w, h, logical


class BmpDecoder:
    """Actor-pool stage: real BMP decode (stride + flip undone in the
    parser) -> per-channel sums plus the TOP row's byte sum — a
    feature that is WRONG if the parser forgets the bottom-up flip."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ws, hs, sums, tops = [], [], [], []
        for payload in df["payload"]:
            w, h, px = _parse_bmp(payload)
            ws.append(w)
            hs.append(h)
            sums.append(px.astype(np.int64).sum(axis=0))
            tops.append(int(px[:w].astype(np.int64).sum()))
        sums = np.stack(sums) if sums else np.zeros((0, 3), dtype=np.int64)
        return pd.DataFrame(
            {
                "media_id": df["media_id"].to_numpy().astype(np.int64),
                "width": np.array(ws, dtype=np.int64),
                "height": np.array(hs, dtype=np.int64),
                "sum_b": sums[:, 0],
                "sum_g": sums[:, 1],
                "sum_r": sums[:, 2],
                "top_row_sum": np.array(tops, dtype=np.int64),
            }
        )


def bmp_features(
    media: ray.data.Dataset, concurrency: int = 2, batch_size: int = 16
) -> ray.data.Dataset:
    """Real-decode BMP features (small batches: binary payloads)."""
    return media.map_batches(
        BmpDecoder, batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )


PNG_SEED = 13


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def synth_png(n: int = 12, seed: int = PNG_SEED) -> pa.Table:
    """(media_id, payload): REAL 8-bit RGB PNG files — chunk layout with
    CRC32s, zlib-compressed IDAT, and a per-scanline filter byte cycling
    through ALL FIVE filter types (None/Sub/Up/Average/Paeth, row r uses
    filter r % 5), so the decoder must implement every reversal.  The
    LOGICAL top-down RGB pixel stream is an md5 hex chain (same
    convention as :func:`synth_ppm`); filtering and compression exist
    only inside the file and must be undone by the decoder."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ids, payloads = [], []
    for i in range(n):
        base = hashlib.md5(f"png:{seed}:{i}".encode()).hexdigest()
        w = 8 + int(base[0:4], 16) % 25
        h = 8 + int(base[4:8], 16) % 25
        n_bytes = w * h * 3
        hexchain = []
        j = 0
        while 32 * j < 2 * n_bytes:
            hexchain.append(
                hashlib.md5(f"png:{seed}:{i}:{j}".encode()).hexdigest()
            )
            j += 1
        logical = np.frombuffer(
            bytes.fromhex("".join(hexchain)[: 2 * n_bytes]), np.uint8
        ).reshape(h, w * 3).astype(np.int64)
        # forward-filter each scanline (filter type = r % 5)
        out = []
        prior = np.zeros(w * 3, dtype=np.int64)
        for r in range(h):
            raw = logical[r]
            f = r % 5
            filt = np.empty(w * 3, dtype=np.int64)
            for k in range(w * 3):
                a = raw[k - 3] if k >= 3 else 0
                b = prior[k]
                c = prior[k - 3] if k >= 3 else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    pred = _paeth(int(a), int(b), int(c))
                filt[k] = (raw[k] - pred) % 256
            out.append(bytes([f]) + filt.astype(np.uint8).tobytes())
            prior = raw
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                   + chunk(b"IDAT", zlib.compress(b"".join(out)))
                   + chunk(b"IEND", b""))
        ids.append(i)
        payloads.append(payload)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def _parse_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL PNG decode for 8-bit RGB non-interlaced images: walk the
    chunk stream verifying each CRC32, inflate the concatenated IDAT
    zlib stream, and reverse the per-scanline filter (all five types).
    Returns the logical top-down (h*w, 3) RGB matrix.

    Sub/Average/Paeth reversal has a true left-neighbor dependency, so
    reconstruction is per-byte within a scanline — payloads here are
    small images decoded inside an actor pool, where the per-row loop
    is bounded by the image width, not the dataset."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = []
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(typ + data) != crc:
            raise ValueError(f"CRC mismatch in {typ!r} chunk")
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, ctype, comp, filt, ilace) != (8, 2, 0, 0, 0):
                raise ValueError("only 8-bit RGB non-interlaced supported")
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("missing IHDR")
    stream = zlib.decompress(b"".join(idat))
    rb = w * 3
    if len(stream) != h * (rb + 1):
        raise ValueError("IDAT length mismatch")
    img = np.zeros((h, rb), dtype=np.int64)
    prior = np.zeros(rb, dtype=np.int64)
    for r in range(h):
        f = stream[r * (rb + 1)]
        filt = np.frombuffer(
            stream, np.uint8, count=rb, offset=r * (rb + 1) + 1
        ).astype(np.int64)
        if f == 0:
            raw = filt
        elif f == 2:
            raw = (filt + prior) % 256
        else:
            raw = np.empty(rb, dtype=np.int64)
            for k in range(rb):
                a = raw[k - 3] if k >= 3 else 0
                b = prior[k]
                c = prior[k - 3] if k >= 3 else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                elif f == 4:
                    pred = _paeth(int(a), int(b), int(c))
                else:
                    raise ValueError(f"unknown filter {f}")
                raw[k] = (filt[k] + pred) % 256
        img[r] = raw
        prior = raw
    return w, h, img.reshape(-1, 3)


class PngDecoder:
    """Actor-pool stage: real PNG decode (CRC-verified chunk walk, zlib
    inflate, all-five-filter reversal) -> per-channel sums plus the
    BOTTOM row's byte sum — filters chain row-to-row (Up/Average/Paeth
    reference the prior reconstructed scanline), so the bottom row is
    wrong unless every earlier row reconstructed exactly."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ws, hs, sums, bots = [], [], [], []
        for payload in df["payload"]:
            w, h, px = _parse_png(payload)
            ws.append(w)
            hs.append(h)
            sums.append(px.sum(axis=0))
            bots.append(int(px[-w:].sum()))
        sums = np.stack(sums) if sums else np.zeros((0, 3), dtype=np.int64)
        return pd.DataFrame(
            {
                "media_id": df["media_id"].to_numpy().astype(np.int64),
                "width": np.array(ws, dtype=np.int64),
                "height": np.array(hs, dtype=np.int64),
                "sum_r": sums[:, 0],
                "sum_g": sums[:, 1],
                "sum_b": sums[:, 2],
                "bottom_row_sum": np.array(bots, dtype=np.int64),
            }
        )


def png_features(
    media: ray.data.Dataset, concurrency: int = 2, batch_size: int = 16
) -> ray.data.Dataset:
    """Real-decode PNG features (small batches: binary payloads)."""
    return media.map_batches(
        PngDecoder, batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )


def _dhash64(px: np.ndarray, w: int, h: int) -> int:
    """64-bit perceptual difference hash from a (h*w, 3) pixel matrix,
    all-integer so it is bit-stable across engines: brightness =
    channel SUM (no /3, channel order irrelevant), 8x9 nearest-neighbor
    grid sample (row (r*h)//8, col (c*w)//9), bit(r,c) = right sample
    brighter than left.  Bit k = r*8 + c, packed little-endian."""
    img = px.reshape(h, w, 3).sum(axis=2)
    rows = (np.arange(8) * h) // 8
    cols = (np.arange(9) * w) // 9
    g = img[np.ix_(rows, cols)]
    bits = (g[:, 1:] > g[:, :-1]).astype(np.uint64).reshape(-1)
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


class DhashDecoder:
    """Actor-pool stage: real BMP decode -> 64-bit dHash split into
    (hi, lo) 32-bit halves (both fit BIGINT)."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, his, los = [], [], []
        for mid, payload in zip(df["media_id"], df["payload"]):
            w, h, px = _parse_bmp(payload)
            d = _dhash64(px.astype(np.int64), w, h)
            ids.append(int(mid))
            his.append(d >> 32)
            los.append(d & 0xFFFFFFFF)
        return pd.DataFrame(
            {
                "media_id": np.array(ids, dtype=np.int64),
                "dhash_hi": np.array(his, dtype=np.int64),
                "dhash_lo": np.array(los, dtype=np.int64),
            }
        )


def image_dhash(
    media: ray.data.Dataset, concurrency: int = 2, batch_size: int = 16
) -> ray.data.Dataset:
    """Perceptual-hash signatures over real-decoded images — the
    image-near-dup analogue of simhash_signatures (bucket by hash bands
    to find visual near-duplicates at corpus scale)."""
    return media.map_batches(
        DhashDecoder, batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )


AVI_SEED = 37


def synth_avi(n: int = 8, seed: int = AVI_SEED) -> pa.Table:
    """(media_id, payload): REAL AVI containers — full RIFF structure
    (LIST/hdrl with a well-formed 56-byte ``avih`` main header,
    LIST/movi with per-frame ``00db`` chunks incl. odd-size padding,
    and a trailing ``idx1`` index whose offsets/sizes must agree with
    the movi walk).  Frame payloads are ascii md5 chains, so the DuckDB
    oracle regenerates every sampled frame's (size, md5) without
    touching the container."""
    import struct

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        return (fourcc + struct.pack("<I", len(data)) + data
                + (b"\x00" if len(data) % 2 else b""))

    ids, payloads = [], []
    for i in range(n):
        base = hashlib.md5(f"avi:{seed}:{i}".encode()).hexdigest()
        n_frames = 4 + int(base[0:2], 16) % 12
        contents = []
        for f in range(n_frames):
            fb = hashlib.md5(f"avi:{seed}:{i}:{f}".encode()).hexdigest()
            fs = 16 + int(fb[0:2], 16) % 48
            chain = "".join(
                hashlib.md5(f"avi:{seed}:{i}:{f}:{k}".encode()).hexdigest()
                for k in range(2)
            )
            contents.append(chain[:fs].encode("ascii"))
        avih = struct.pack(
            "<14I", 33333, 0, 0, 0x10, n_frames, 0, 1, 0, 64, 48,
            0, 0, 0, 0,
        )
        hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
        movi_body = b"movi"
        offsets = []
        for c in contents:
            offsets.append(len(movi_body))  # offset of ckid within movi
            movi_body += chunk(b"00db", c)
        movi = chunk(b"LIST", movi_body)
        idx = b"".join(
            struct.pack("<4sIII", b"00db", 0x10, off, len(c))
            for off, c in zip(offsets, contents)
        )
        payload = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
        riff = b"RIFF" + struct.pack("<I", len(payload)) + payload
        ids.append(i)
        payloads.append(riff)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class AviFrameSampler:
    """Actor-pool stage: REAL AVI parse + every-k-th frame sampling —
    the video frame-sample shape.  Walks the RIFF tree (hdrl/avih for
    the declared frame count, movi for the actual ``00db`` frame
    chunks with even-byte padding, idx1 for the index) and CROSS-CHECKS
    all three before emitting; a container whose index disagrees with
    its movi data raises instead of silently passing frames through."""

    def __init__(self, sample_every: int = 2):
        self.sample_every = sample_every

    @staticmethod
    def _parse(payload: bytes):
        import struct

        if payload[0:4] != b"RIFF" or payload[8:12] != b"AVI ":
            raise ValueError("not an AVI/RIFF payload")
        total_declared = None
        frames = []          # (movi_rel_offset, content)
        idx_entries = []     # (movi_rel_offset, size)
        pos = 12
        end = 8 + struct.unpack("<I", payload[4:8])[0]
        while pos + 8 <= end:
            fourcc = payload[pos:pos + 4]
            size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
            data = payload[pos + 8:pos + 8 + size]
            if fourcc == b"LIST" and data[0:4] == b"hdrl":
                sub = data[4:]
                p = 0
                while p + 8 <= len(sub):
                    sc = sub[p:p + 4]
                    ss = struct.unpack("<I", sub[p + 4:p + 8])[0]
                    if sc == b"avih":
                        total_declared = struct.unpack(
                            "<I", sub[p + 8 + 16:p + 8 + 20])[0]
                    p += 8 + ss + (ss % 2)
            elif fourcc == b"LIST" and data[0:4] == b"movi":
                p = 4
                while p + 8 <= len(data):
                    sc = data[p:p + 4]
                    ss = struct.unpack("<I", data[p + 4:p + 8])[0]
                    if sc == b"00db":
                        frames.append((p, data[p + 8:p + 8 + ss]))
                    p += 8 + ss + (ss % 2)
            elif fourcc == b"idx1":
                for q in range(0, size, 16):
                    ck, _fl, off, sz = struct.unpack(
                        "<4sIII", data[q:q + 16])
                    if ck == b"00db":
                        idx_entries.append((off, sz))
            pos += 8 + size + (size % 2)
        if total_declared != len(frames) or len(idx_entries) != len(frames):
            raise ValueError("avih/movi/idx1 frame counts disagree")
        for (off_m, content), (off_i, sz_i) in zip(frames, idx_entries):
            if off_m != off_i or len(content) != sz_i:
                raise ValueError("idx1 entry disagrees with movi chunk")
        return total_declared, [c for _, c in frames]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = {"media_id": [], "total_frames": [], "frame_idx": [],
                "size": [], "content_md5": []}
        for mid, payload in zip(df["media_id"], df["payload"]):
            total, frames = self._parse(bytes(payload))
            for f in range(0, total, self.sample_every):
                rows["media_id"].append(int(mid))
                rows["total_frames"].append(total)
                rows["frame_idx"].append(f)
                rows["size"].append(len(frames[f]))
                rows["content_md5"].append(
                    hashlib.md5(frames[f]).hexdigest())
        return pd.DataFrame(rows).astype(
            {"media_id": np.int64, "total_frames": np.int64,
             "frame_idx": np.int64, "size": np.int64}
        )


def avi_frames(
    media: ray.data.Dataset, sample_every: int = 2,
    concurrency: int = 2, batch_size: int = 4
) -> ray.data.Dataset:
    """Real-decode video frame sampling: small batches (whole-container
    payloads per row keep extraction streaming at scale)."""
    return media.map_batches(
        AviFrameSampler(sample_every), batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )


GIF_SEED = 53


def synth_gif(n: int = 10, seed: int = GIF_SEED) -> pa.Table:
    """(media_id, payload): REAL GIF89a containers — logical screen
    descriptor, global color table, and per-frame graphic-control
    extension + image descriptor + LZW-min-code byte + length-prefixed
    data sub-blocks + trailer, exactly as the spec lays them out.
    Frame payload bytes are ascii md5 chains, so the DuckDB oracle
    regenerates every frame's (delay, size, md5) without the container
    (same discipline as :func:`synth_avi`)."""
    import struct

    ids, payloads = [], []
    for i in range(n):
        base = hashlib.md5(f"gif:{seed}:{i}".encode()).hexdigest()
        w = 8 + int(base[0:2], 16) % 24
        h = 6 + int(base[2:4], 16) % 18
        n_frames = 2 + int(base[4:6], 16) % 6
        # packed 0x91: GCT present, color resolution 1, GCT size bits 1
        # (2^(1+1) = 4 entries -> 12 bytes)
        out = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x91, 0, 0)
        out += bytes.fromhex(
            hashlib.md5(f"gif:{seed}:{i}:gct".encode()).hexdigest()
        )[:12]
        for f in range(n_frames):
            fb = hashlib.md5(f"gif:{seed}:{i}:{f}".encode()).hexdigest()
            delay = 1 + int(fb[0:2], 16) % 100
            fs = 8 + int(fb[2:4], 16) % 40
            chain = "".join(
                hashlib.md5(f"gif:{seed}:{i}:{f}:{k}".encode()).hexdigest()
                for k in range(2)
            )
            content = chain[:fs].encode("ascii")
            out += (bytes([0x21, 0xF9, 0x04, 0x00])
                    + struct.pack("<H", delay) + b"\x00\x00")
            out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
            out += b"\x02"  # LZW minimum code size
            out += bytes([len(content)]) + content + b"\x00"
        out += b"\x3B"
        ids.append(i)
        payloads.append(out)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class GifFrameReader:
    """Actor-pool stage: REAL GIF89a parse — skips the global color
    table via the packed size bits, pairs each graphic-control
    extension with its image descriptor, walks length-prefixed data
    sub-blocks, and CROSS-CHECKS (GCE count == image count, descriptor
    dims == logical screen, trailer terminates the stream) before
    emitting; a malformed container raises instead of passing through."""

    @staticmethod
    def _parse(payload: bytes):
        import struct

        if payload[0:6] not in (b"GIF89a", b"GIF87a"):
            raise ValueError("not a GIF payload")
        w, h, packed, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
        pos = 13
        if packed & 0x80:
            pos += 3 * (1 << ((packed & 0x07) + 1))
        delays, frames = [], []
        pending_delay = None
        while pos < len(payload):
            b0 = payload[pos]
            if b0 == 0x3B:  # trailer
                pos += 1
                break
            if b0 == 0x21:  # extension: label + sub-blocks
                label = payload[pos + 1]
                p = pos + 2
                if label == 0xF9:
                    bs = payload[p]
                    pending_delay = struct.unpack(
                        "<H", payload[p + 2:p + 4])[0]
                    p += 1 + bs
                while payload[p] != 0:
                    p += 1 + payload[p]
                pos = p + 1
            elif b0 == 0x2C:  # image descriptor
                left, top, iw, ih, ipacked = struct.unpack(
                    "<HHHHB", payload[pos + 1:pos + 10])
                if (iw, ih) != (w, h):
                    raise ValueError("frame dims disagree with screen")
                p = pos + 10
                if ipacked & 0x80:
                    p += 3 * (1 << ((ipacked & 0x07) + 1))
                p += 1  # LZW minimum code size
                content = b""
                while payload[p] != 0:
                    ln = payload[p]
                    content += payload[p + 1:p + 1 + ln]
                    p += 1 + ln
                pos = p + 1
                if pending_delay is None:
                    raise ValueError("image without graphic control ext")
                delays.append(pending_delay)
                frames.append(content)
                pending_delay = None
            else:
                raise ValueError(f"unknown GIF block 0x{b0:02x}")
        else:
            raise ValueError("GIF stream missing trailer")
        if pos != len(payload):
            raise ValueError("trailing bytes after GIF trailer")
        return w, h, delays, frames

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = {"media_id": [], "w": [], "h": [], "total_frames": [],
                "frame_idx": [], "delay_cs": [], "size": [],
                "content_md5": []}
        for mid, payload in zip(df["media_id"], df["payload"]):
            w, h, delays, frames = self._parse(bytes(payload))
            for f, (dl, c) in enumerate(zip(delays, frames)):
                rows["media_id"].append(int(mid))
                rows["w"].append(w)
                rows["h"].append(h)
                rows["total_frames"].append(len(frames))
                rows["frame_idx"].append(f)
                rows["delay_cs"].append(dl)
                rows["size"].append(len(c))
                rows["content_md5"].append(hashlib.md5(c).hexdigest())
        return pd.DataFrame(rows).astype(
            {c: np.int64 for c in ("media_id", "w", "h", "total_frames",
                                   "frame_idx", "delay_cs", "size")}
        )


def gif_frames(
    media: ray.data.Dataset, concurrency: int = 2, batch_size: int = 4
) -> ray.data.Dataset:
    """Real-decode animated-GIF frame extraction (delay + payload per
    frame) — the animation analogue of :func:`avi_frames`."""
    return media.map_batches(
        GifFrameReader(), batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )


JPEG_SEED = 59


def synth_jpeg(n: int = 12, seed: int = JPEG_SEED) -> pa.Table:
    """(media_id, payload): REAL baseline-JFIF containers — SOI, APP0
    (JFIF 1.1), DQT, SOF0 with the image dimensions, a minimal DHT,
    SOS header, entropy-coded data, EOI — every marker segment with a
    correct big-endian length field.  The entropy bytes are an ascii
    md5 chain (hex chars only, so no 0xFF can appear and the scan
    needs no byte-unstuffing), letting the DuckDB oracle regenerate
    (w, h, entropy md5) without the container."""
    import struct

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    ids, payloads = [], []
    for i in range(n):
        base = hashlib.md5(f"jpg:{seed}:{i}".encode()).hexdigest()
        w = 16 + int(base[0:2], 16) % 240
        h = 16 + int(base[2:4], 16) % 200
        esz = 24 + int(base[4:6], 16) % 120
        chain = "".join(
            hashlib.md5(f"jpg:{seed}:{i}:{k}".encode()).hexdigest()
            for k in range(5)
        )
        entropy = chain[:esz].encode("ascii")
        qt = bytes.fromhex(
            hashlib.md5(f"jpg:{seed}:{i}:qt".encode()).hexdigest() * 5
        )[:64]
        out = b"\xff\xd8"                                    # SOI
        out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        out += seg(0xDB, b"\x00" + qt)                       # DQT
        out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1)
                   + b"\x01\x11\x00")                        # SOF0
        out += seg(0xC4, b"\x00" + bytes([0] * 15 + [1]) + b"\x00")  # DHT
        out += seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")        # SOS
        out += entropy + b"\xff\xd9"                         # EOI
        ids.append(i)
        payloads.append(out)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class JpegHeaderReader:
    """Actor-pool stage: REAL JPEG marker walk — verifies SOI, follows
    every segment's big-endian length, reads dimensions from SOF0-3,
    scans the entropy stream after SOS to EOI — and RAISES on a
    malformed stream instead of passing it through."""

    @staticmethod
    def _parse(payload: bytes):
        import struct

        if payload[0:2] != b"\xff\xd8":
            raise ValueError("not a JPEG payload (missing SOI)")
        pos, w, h, n_segments, entropy = 2, None, None, 1, None
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                raise ValueError(f"expected marker at {pos}")
            marker = payload[pos + 1]
            ln = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
            body = payload[pos + 4:pos + 2 + ln]
            n_segments += 1
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):
                _prec, h, w, _nc = struct.unpack(">BHHB", body[:6])
            if marker == 0xDA:
                scan = payload[pos + 2 + ln:]
                end = scan.find(b"\xff\xd9")
                if end < 0:
                    raise ValueError("entropy stream missing EOI")
                if pos + 2 + ln + end + 2 != len(payload):
                    raise ValueError("trailing bytes after EOI")
                entropy = scan[:end]
                break
            pos += 2 + ln
        if w is None or entropy is None:
            raise ValueError("missing SOF or SOS segment")
        return w, h, n_segments, entropy

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = {"media_id": [], "w": [], "h": [], "n_segments": [],
                "entropy_len": [], "entropy_md5": []}
        for mid, payload in zip(df["media_id"], df["payload"]):
            w, h, ns, ent = self._parse(bytes(payload))
            rows["media_id"].append(int(mid))
            rows["w"].append(w)
            rows["h"].append(h)
            rows["n_segments"].append(ns)
            rows["entropy_len"].append(len(ent))
            rows["entropy_md5"].append(hashlib.md5(ent).hexdigest())
        return pd.DataFrame(rows).astype(
            {c: np.int64 for c in ("media_id", "w", "h", "n_segments",
                                   "entropy_len")}
        )


def jpeg_dims(
    media: ray.data.Dataset, concurrency: int = 2, batch_size: int = 4
) -> ray.data.Dataset:
    """Header-only image introspection (dimensions without a decode) —
    the metadata pass a curation pipeline runs before deciding which
    payloads are worth decoding at all."""
    return media.map_batches(
        JpegHeaderReader(), batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )


MP3_SEED = 73
# MPEG-1 Layer III bitrate table (kbps), indices 1..14 (0 = free, 15 =
# bad — never synthesized); samplerate table indices 0..2.
MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                160, 192, 224, 256, 320, 0)
MP3_SAMPLERATES = (44100, 48000, 32000)


def synth_mp3(n: int = 12, seed: int = MP3_SEED) -> pa.Table:
    """(media_id, payload): REAL MPEG-1 Layer III frame streams — each
    frame a valid 4-byte header (11-bit sync, version/layer bits,
    bitrate + samplerate indexes, padding bit) followed by exactly
    ``144 * bitrate // samplerate + padding - 4`` body bytes, the
    length equation every mp3 demuxer implements.  Bodies are one
    ascii md5 chain per FILE (hex chars only — no 0xFF can appear, so
    a malformed length always trips the sync check rather than
    resyncing), letting the DuckDB oracle regenerate every byte."""
    ids, payloads = [], []
    for i in range(n):
        base = hashlib.md5(f"mp3:{seed}:{i}".encode()).hexdigest()
        sridx = int(base[0], 16) % 3
        sr = MP3_SAMPLERATES[sridx]
        n_frames = 3 + int(base[1], 16) % 6
        lens, hdrs = [], []
        for k in range(n_frames):
            fh = hashlib.md5(f"mp3:{seed}:{i}:{k}".encode()).hexdigest()
            bidx = 1 + int(fh[0:2], 16) % 14
            pad = int(fh[2], 16) % 2
            flen = (144 * MP3_BITRATES[bidx] * 1000) // sr + pad
            # header: 0xFF | sync+MPEG1+LayerIII+noCRC | bitrate/sr/pad
            # | mono, no emphasis
            hdrs.append(bytes([0xFF, 0xFB,
                               (bidx << 4) | (sridx << 2) | (pad << 1),
                               0xC0]))
            lens.append(flen)
        total_body = sum(lens) - 4 * n_frames
        chain = "".join(
            hashlib.md5(f"mp3:{seed}:{i}:body:{j}".encode()).hexdigest()
            for j in range(total_body // 32 + 1)
        )
        body = chain[:total_body].encode("ascii")
        out, pos = b"", 0
        for hdr, flen in zip(hdrs, lens):
            out += hdr + body[pos:pos + flen - 4]
            pos += flen - 4
        ids.append(i)
        payloads.append(out)
    return pa.table(
        {"media_id": pa.array(ids, pa.int64()),
         "payload": pa.array(payloads, pa.binary())})


class Mp3FrameReader:
    """Actor-pool stage: REAL MPEG frame walk — verifies the sync word
    and version/layer bits of every frame, recomputes each frame's
    length from its header fields, and RAISES on desync, truncation or
    trailing bytes.  Emits the per-file summary a transcoding pipeline
    uses for admission control (duration, mean bitrate) plus the body
    digest."""

    @staticmethod
    def _parse(payload: bytes):
        pos, n_frames, sum_br, sr0 = 0, 0, 0, None
        bodies = []
        while pos < len(payload):
            if pos + 4 > len(payload):
                raise ValueError("truncated frame header")
            b0, b1, b2, _b3 = payload[pos:pos + 4]
            if b0 != 0xFF or b1 != 0xFB:
                raise ValueError(f"lost sync at {pos}")
            bidx, sridx, pad = b2 >> 4, (b2 >> 2) & 0x3, (b2 >> 1) & 0x1
            if bidx in (0, 15) or sridx == 3:
                raise ValueError(f"invalid header fields at {pos}")
            sr = MP3_SAMPLERATES[sridx]
            if sr0 is None:
                sr0 = sr
            elif sr != sr0:
                raise ValueError("samplerate changed mid-stream")
            flen = (144 * MP3_BITRATES[bidx] * 1000) // sr + pad
            if pos + flen > len(payload):
                raise ValueError(f"frame at {pos} overruns payload")
            bodies.append(payload[pos + 4:pos + flen])
            sum_br += MP3_BITRATES[bidx]
            n_frames += 1
            pos += flen
        if n_frames == 0:
            raise ValueError("empty stream")
        body = b"".join(bodies)
        # 1152 samples per MPEG-1 Layer III frame
        dur_us = n_frames * ((1152 * 1_000_000) // sr0)
        return (n_frames, len(payload), sr0, sum_br, dur_us,
                hashlib.md5(body).hexdigest())

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = {"media_id": [], "n_frames": [], "total_bytes": [],
                "samplerate": [], "sum_bitrate_kbps": [], "dur_us": [],
                "body_md5": []}
        for mid, payload in zip(df["media_id"], df["payload"]):
            nf, tb, sr, sbr, dur, md = self._parse(bytes(payload))
            rows["media_id"].append(int(mid))
            rows["n_frames"].append(nf)
            rows["total_bytes"].append(tb)
            rows["samplerate"].append(sr)
            rows["sum_bitrate_kbps"].append(sbr)
            rows["dur_us"].append(dur)
            rows["body_md5"].append(md)
        return pd.DataFrame(rows).astype(
            {c: np.int64 for c in ("media_id", "n_frames", "total_bytes",
                                   "samplerate", "sum_bitrate_kbps",
                                   "dur_us")})


def mp3_frames(
    media: ray.data.Dataset, concurrency: int = 2, batch_size: int = 4
) -> ray.data.Dataset:
    """Decode-free audio introspection: per-file frame walk summary —
    the admission-control metadata pass before any PCM decode."""
    return media.map_batches(
        Mp3FrameReader(), batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )


FLAC_SEED = 61


def synth_flac(n: int = 12, seed: int = FLAC_SEED) -> pa.Table:
    """(media_id, payload): REAL FLAC containers — 'fLaC' magic, a
    STREAMINFO metadata block (type 0, 34 bytes: block sizes, frame
    sizes, the 20/3/5/36-bit packed sample-rate/channels/bps/total-
    samples word, and the 16-byte unencoded-audio MD5) followed by a
    last-flagged PADDING block, then the frame region.  The frame
    region is an ascii md5 chain whose MD5 is stamped INTO the
    STREAMINFO signature field, so the parser can cross-check payload
    integrity exactly as a real decoder does — and the DuckDB oracle
    regenerates every output column from the generation rule."""
    import struct

    ids, payloads = [], []
    for i in range(n):
        base = hashlib.md5(f"flac:{seed}:{i}".encode()).hexdigest()
        sr = 8000 + int(base[0:4], 16) % 40000
        ch = 1 + int(base[4], 16) % 8
        bps = 8 + (int(base[5], 16) % 3) * 4
        total = int(base[6:12], 16) % (1 << 30)
        csz = 24 + int(base[12:14], 16) % 100
        chain = "".join(
            hashlib.md5(f"flac:{seed}:{i}:{k}".encode()).hexdigest()
            for k in range(4)
        )
        frames = chain[:csz].encode("ascii")
        sig = hashlib.md5(frames).digest()
        packed = (sr << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total
        si = (struct.pack(">HH", 4096, 4096)
              + (14).to_bytes(3, "big") + (14 + csz).to_bytes(3, "big")
              + struct.pack(">Q", packed) + sig)
        out = b"fLaC"
        out += bytes([0x00]) + len(si).to_bytes(3, "big") + si
        pad = b"\x00" * 8
        out += bytes([0x80 | 0x01]) + len(pad).to_bytes(3, "big") + pad
        out += frames
        ids.append(i)
        payloads.append(out)
    return pa.table(
        {"media_id": pa.array(ids, pa.int64()),
         "payload": pa.array(payloads, pa.binary())}
    )


class FlacInfoReader:
    """Actor-pool stage: REAL FLAC metadata walk — magic check, block
    headers (last-flag + 7-bit type + 24-bit big-endian length),
    STREAMINFO bit unpacking, and an MD5 CROSS-CHECK of the frame
    region against the STREAMINFO signature; malformed streams raise."""

    @staticmethod
    def _parse(payload: bytes):
        import struct

        if payload[0:4] != b"fLaC":
            raise ValueError("not a FLAC payload")
        pos = 4
        info = None
        while True:
            hdr = payload[pos]
            btype = hdr & 0x7F
            blen = int.from_bytes(payload[pos + 1:pos + 4], "big")
            body = payload[pos + 4:pos + 4 + blen]
            if len(body) != blen:
                raise ValueError("truncated metadata block")
            if btype == 0:
                if blen != 34:
                    raise ValueError("STREAMINFO must be 34 bytes")
                packed = struct.unpack(">Q", body[10:18])[0]
                info = {
                    "min_block": struct.unpack(">H", body[0:2])[0],
                    "sample_rate": packed >> 44,
                    "channels": ((packed >> 41) & 0x7) + 1,
                    "bits_per_sample": ((packed >> 36) & 0x1F) + 1,
                    "total_samples": packed & ((1 << 36) - 1),
                    "sig": body[18:34],
                }
            pos += 4 + blen
            if hdr & 0x80:
                break
        if info is None:
            raise ValueError("missing STREAMINFO block")
        frames = payload[pos:]
        if hashlib.md5(frames).digest() != info["sig"]:
            raise ValueError("frame-region md5 disagrees with STREAMINFO")
        return (info["sample_rate"], info["channels"],
                info["bits_per_sample"], info["total_samples"],
                len(frames), hashlib.md5(frames).hexdigest())

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = {"media_id": [], "sample_rate": [], "channels": [],
                "bits_per_sample": [], "total_samples": [],
                "n_frame_bytes": [], "audio_md5": []}
        for mid, payload in zip(df["media_id"], df["payload"]):
            sr, ch, bps, total, nb, md = self._parse(bytes(payload))
            rows["media_id"].append(int(mid))
            rows["sample_rate"].append(sr)
            rows["channels"].append(ch)
            rows["bits_per_sample"].append(bps)
            rows["total_samples"].append(total)
            rows["n_frame_bytes"].append(nb)
            rows["audio_md5"].append(md)
        return pd.DataFrame(rows).astype(
            {c: np.int64 for c in ("media_id", "sample_rate", "channels",
                                   "bits_per_sample", "total_samples",
                                   "n_frame_bytes")})


def flac_info(
    media: ray.data.Dataset, concurrency: int = 2, batch_size: int = 4
) -> ray.data.Dataset:
    """Decode-free FLAC admission pass: STREAMINFO + integrity check."""
    return media.map_batches(
        FlacInfoReader(), batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )


ICO_SEED = 67


def synth_ico(n: int = 12, seed: int = ICO_SEED) -> pa.Table:
    """(media_id, payload): REAL ICO containers — ICONDIR (reserved 0,
    type 1, count), one 16-byte ICONDIRENTRY per image (width/height
    bytes with the 0-means-256 rule, bpp, resource size, absolute file
    offset) and contiguous image blobs (ascii md5 chains).  Offsets are
    computed exactly as a writer lays them out, so the parser's
    offset/size cross-checks are meaningful."""
    import struct

    ids, payloads = [], []
    for i in range(n):
        base = hashlib.md5(f"ico:{seed}:{i}".encode()).hexdigest()
        n_img = 1 + int(base[0], 16) % 4
        entries, blobs = [], []
        for f in range(n_img):
            fb = hashlib.md5(f"ico:{seed}:{i}:{f}".encode()).hexdigest()
            w = 16 * (1 + int(fb[0], 16) % 16) % 256   # 0 encodes 256
            h = 16 * (1 + int(fb[1], 16) % 16) % 256
            bpp = (1, 4, 8, 24, 32)[int(fb[2], 16) % 5]
            bsz = 20 + int(fb[3:5], 16) % 80
            chain = "".join(
                hashlib.md5(f"ico:{seed}:{i}:{f}:{k}".encode()).hexdigest()
                for k in range(4)
            )
            blobs.append(chain[:bsz].encode("ascii"))
            entries.append((w, h, bpp, bsz))
        off = 6 + 16 * n_img
        out = struct.pack("<HHH", 0, 1, n_img)
        for (w, h, bpp, bsz), blob in zip(entries, blobs):
            out += struct.pack("<BBBBHHII", w, h, 0, 0, 1, bpp, bsz, off)
            off += bsz
        for blob in blobs:
            out += blob
        ids.append(i)
        payloads.append(out)
    return pa.table(
        {"media_id": pa.array(ids, pa.int64()),
         "payload": pa.array(payloads, pa.binary())}
    )


class IcoDirReader:
    """Actor-pool stage: REAL ICO directory walk — header check,
    per-entry decode with the 0-means-256 dimension rule, and
    CROSS-CHECKS that blobs are contiguous, in-bounds and exactly
    exhaust the file; malformed containers raise."""

    @staticmethod
    def _parse(payload: bytes):
        import struct

        rsv, typ, n_img = struct.unpack("<HHH", payload[0:6])
        if rsv != 0 or typ != 1 or n_img == 0:
            raise ValueError("not an ICO payload")
        expect_off = 6 + 16 * n_img
        out = []
        for f in range(n_img):
            e = payload[6 + 16 * f:6 + 16 * (f + 1)]
            w, h, _cols, _rsv, _planes, bpp, bsz, off = struct.unpack(
                "<BBBBHHII", e)
            if off != expect_off:
                raise ValueError("non-contiguous image blob")
            blob = payload[off:off + bsz]
            if len(blob) != bsz:
                raise ValueError("image blob out of bounds")
            out.append((f, w or 256, h or 256, bpp, bsz,
                        hashlib.md5(blob).hexdigest()))
            expect_off = off + bsz
        if expect_off != len(payload):
            raise ValueError("trailing bytes after last image")
        return out

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = {"media_id": [], "img_idx": [], "w": [], "h": [],
                "bpp": [], "size": [], "content_md5": []}
        for mid, payload in zip(df["media_id"], df["payload"]):
            for f, w, h, bpp, bsz, md in self._parse(bytes(payload)):
                rows["media_id"].append(int(mid))
                rows["img_idx"].append(f)
                rows["w"].append(w)
                rows["h"].append(h)
                rows["bpp"].append(bpp)
                rows["size"].append(bsz)
                rows["content_md5"].append(md)
        return pd.DataFrame(rows).astype(
            {c: np.int64 for c in ("media_id", "img_idx", "w", "h",
                                   "bpp", "size")})


def ico_frames(
    media: ray.data.Dataset, concurrency: int = 2, batch_size: int = 4
) -> ray.data.Dataset:
    """Icon-directory extraction: per-image metadata + blob digests."""
    return media.map_batches(
        IcoDirReader(), batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
    )


MIDI_SEED = 41


def _vlq(n: int) -> bytes:
    """Standard MIDI variable-length-quantity encoding (7 bits per
    byte, high bit = continuation)."""
    out = [n & 0x7F]
    n >>= 7
    while n:
        out.append(0x80 | (n & 0x7F))
        n >>= 7
    return bytes(reversed(out))


def _midi_note(i: int, t: int, j: int, seed: int = MIDI_SEED):
    h = hashlib.md5(f"midi:{seed}:{i}:{t}:{j}".encode()).hexdigest()
    return (36 + int(h[0:2], 16) % 48,      # pitch
            40 + int(h[2:4], 16) % 80,      # velocity
            int(h[4:7], 16) % 1000,         # delta before note-on
            1 + int(h[7:10], 16) % 500)     # duration (delta to off)


def synth_midi(n: int = 8, seed: int = MIDI_SEED) -> pa.Table:
    """(file_id, payload): REAL standard MIDI files (MThd + MTrk
    chunks, VLQ delta times — most deltas exceed 127, so multi-byte
    VLQs are the norm, and any VLQ bug desynchronizes the walk).
    Notes come from md5 chains, so the SQL twin regenerates every
    (pitch, velocity, delta, duration) without parsing MIDI."""
    ids, payloads = [], []
    for i in range(n):
        base = hashlib.md5(f"midi:{seed}:{i}".encode()).hexdigest()
        nt = 1 + int(base[0], 16) % 3
        buf = io.BytesIO()
        buf.write(b"MThd" + (6).to_bytes(4, "big")
                  + (1).to_bytes(2, "big") + nt.to_bytes(2, "big")
                  + (480).to_bytes(2, "big"))
        for t in range(nt):
            tb = hashlib.md5(f"midi:{seed}:{i}:{t}".encode()).hexdigest()
            n_notes = 4 + int(tb[0:2], 16) % 28
            ev = io.BytesIO()
            for j in range(n_notes):
                pitch, vel, d_on, dur = _midi_note(i, t, j, seed)
                ev.write(_vlq(d_on) + bytes([0x90, pitch, vel]))
                ev.write(_vlq(dur) + bytes([0x80, pitch, 0x40]))
            ev.write(_vlq(0) + bytes([0xFF, 0x2F, 0x00]))  # end of track
            body = ev.getvalue()
            buf.write(b"MTrk" + len(body).to_bytes(4, "big") + body)
        ids.append(i)
        payloads.append(buf.getvalue())
    return pa.table({
        "file_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    })


class MidiTrackReader:
    """Actor-pool stage: REAL MIDI walk — chunk headers, VLQ delta
    decoding, explicit-status note events, end-of-track meta — one row
    per track (file_id, track_idx, n_events, total_ticks, notes_md5);
    notes_md5 hashes the 'pitch:vel' note-on sequence."""

    @staticmethod
    def _read_vlq(data: bytes, pos: int) -> tuple[int, int]:
        v = 0
        while True:
            b = data[pos]
            pos += 1
            v = (v << 7) | (b & 0x7F)
            if not b & 0x80:
                return v, pos

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = {"file_id": [], "track_idx": [], "n_events": [],
                "total_ticks": [], "notes_md5": []}
        for fid, payload in zip(df["file_id"], df["payload"]):
            data = bytes(payload)
            if data[:4] != b"MThd":
                raise ValueError("not a MIDI file")
            ntrks = int.from_bytes(data[10:12], "big")
            pos = 8 + int.from_bytes(data[4:8], "big")
            for t in range(ntrks):
                if data[pos:pos + 4] != b"MTrk":
                    raise ValueError(f"bad track chunk at {pos}")
                tlen = int.from_bytes(data[pos + 4:pos + 8], "big")
                p, end = pos + 8, pos + 8 + tlen
                ticks = n_ev = 0
                notes = []
                while p < end:
                    delta, p = self._read_vlq(data, p)
                    ticks += delta
                    status = data[p]
                    p += 1
                    if status == 0xFF:
                        mtype = data[p]
                        mlen, p = self._read_vlq(data, p + 1)
                        p += mlen
                        if mtype == 0x2F:
                            break
                    elif status & 0xF0 in (0x90, 0x80):
                        pitch, vel = data[p], data[p + 1]
                        p += 2
                        n_ev += 1
                        if status & 0xF0 == 0x90 and vel > 0:
                            notes.append(f"{pitch}:{vel}")
                    else:
                        raise ValueError(f"unexpected status {status:#x}")
                if p != end:
                    raise ValueError("track length mismatch")
                rows["file_id"].append(int(fid))
                rows["track_idx"].append(t)
                rows["n_events"].append(n_ev)
                rows["total_ticks"].append(ticks)
                rows["notes_md5"].append(
                    hashlib.md5(",".join(notes).encode()).hexdigest())
                pos = end
        return pd.DataFrame(rows).astype(
            {"file_id": np.int64, "track_idx": np.int64,
             "n_events": np.int64, "total_ticks": np.int64})


def midi_tracks(
    files: ray.data.Dataset, concurrency: int = 2, batch_size: int = 4
) -> ray.data.Dataset:
    return files.map_batches(
        MidiTrackReader, batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency)


def synth_mixed_media(n: int = 48) -> pa.Table:
    """(media_id, payload): a MIXED binary corpus — real WAV (RIFF),
    real P6 PPM and opaque md5-ascii blobs interleaved by
    media_id % 3 — the untyped object-store dump a multimodal ingest
    pipeline must sniff before routing."""
    wav = synth_wav((n + 2) // 3).column("payload").to_pylist()
    ppm = synth_ppm((n + 1) // 3).column("payload").to_pylist()
    blob = synth_media((n + 0) // 3).column("payload").to_pylist()
    ids, payloads = [], []
    for m in range(n):
        ids.append(m)
        if m % 3 == 0:
            payloads.append(wav[m // 3])
        elif m % 3 == 1:
            payloads.append(ppm[m // 3])
        else:
            payloads.append(blob[m // 3])
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    })


class MediaSniffer:
    """Actor-pool stage: magic-byte sniffing router — the dispatch
    step in front of format-specific decoders (RIFF/WAVE -> 'wav',
    P6 -> 'ppm', else 'unknown').  Sniffing reads the FILE bytes,
    never metadata columns."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        _OUT = {"media_id": np.int64, "kind_detected": object,
                "n_bytes": np.int64}
        if len(df) == 0 or "media_id" not in df.columns:
            return pd.DataFrame({c: pd.Series(dtype=t)
                                 for c, t in _OUT.items()})
        rows = {c: [] for c in _OUT}
        for mid, payload in zip(df["media_id"], df["payload"]):
            b = bytes(payload)
            if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                kind = "wav"
            elif b[:3] == b"P6\n":
                kind = "ppm"
            else:
                kind = "unknown"
            rows["media_id"].append(int(mid))
            rows["kind_detected"].append(kind)
            rows["n_bytes"].append(len(b))
        return pd.DataFrame(rows).astype(
            {"media_id": np.int64, "n_bytes": np.int64})
