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
    """Deterministic fake media table for plumbing tests."""
    rs = np.random.RandomState(seed)
    kinds = np.array(["image", "audio", "video"])[rs.randint(0, 3, n)]
    payloads = [rs.bytes(rs.randint(64, 4096)) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(kinds.tolist(), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(rs.randint(16, 512, n), pa.int32()),
            "height": pa.array(rs.randint(16, 512, n), pa.int32()),
            "sample_rate": pa.array(np.where(kinds == "audio", 16000, 0), pa.int32()),
            "duration_ms": pa.array(rs.randint(0, 10_000, n), pa.int32()),
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
