"""Multimodal columns: binary payloads + typed metadata through actor pools.

The Ray-side plumbing is real — schemas, actor-pool stages with per-actor
setup, small batch sizes for large binary rows, deterministic outputs — but
the actual media decoding is STUBBED: this container has no image/audio
libraries, so ``DecodeImage``/``DecodeAudio`` use a clearly-marked
deterministic fake decoder (or raise ``NotImplementedError`` in strict mode).
Swap ``_fake_decode_*`` for PIL/torchaudio in a real deployment; nothing else
changes.

Design rules encoded here (SURVEY extension / prompt requirements):
- binary media columns ride as opaque ``binary`` + metadata columns;
- decode / feature-extract / resize / frame-sample are CALLABLE-CLASS stages
  (``map_batches(Cls, concurrency=N, batch_size=small, num_cpus=c)``) so
  model/codec setup happens once per actor;
- batch sizes stay small because a batch x concurrency of decoded frames
  must fit worker heaps.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

IMAGE_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),  # opaque encoded image bytes
        ("mime", pa.string()),
        ("source", pa.string()),
    ]
)


def make_fake_media_table(n: int, seed: int = 42, kind: str = "image") -> pa.Table:
    """Deterministic synthetic media table (binary payloads + metadata)."""
    rng = np.random.default_rng(seed)
    payloads = []
    for i in range(n):
        size = int(rng.integers(512, 4096))
        payloads.append(rng.integers(0, 256, size=size, dtype=np.uint8).tobytes())
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array([f"{kind}/fake"] * n, pa.string()),
            "source": pa.array([f"s3://bucket/{kind}/{i}.bin" for i in range(n)], pa.string()),
        }
    )


def _fake_decode_image(payload: bytes) -> tuple[int, int, np.ndarray]:
    """STUB decode: deterministic (width, height, 8-dim feature) from a hash
    of the payload. Replace with a real decoder (PIL) in production."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0]
    height = 64 + h[1]
    feat = np.frombuffer(h[:32], dtype=np.uint8).reshape(8, 4).mean(axis=1) / 255.0
    return width, height, feat.astype(np.float32)


class DecodeImage:
    """Actor-pool stage: decode + feature-extract image payloads.

    ``__init__`` is where a real model/codec would load (once per actor);
    ``__call__`` processes one small Arrow batch."""

    def __init__(self, strict: bool = False, target_size: int = 32):
        self.strict = strict
        self.target_size = target_size  # resize target (stub records it only)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "image decoding requires an image library not present in "
                "this environment; run with strict=False for the "
                "deterministic stub decoder"
            )
        payloads = batch.column("payload").to_pylist()
        widths, heights, feats = [], [], []
        for p in payloads:
            w, h, f = _fake_decode_image(p)
            widths.append(w)
            heights.append(h)
            feats.append(f.tolist())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "resized_to": pa.array([self.target_size] * len(batch), pa.int32()),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class FrameSample:
    """Actor-pool stage: sample N pseudo-frames per video payload
    (flat_map-shaped: one input row -> N output rows)."""

    def __init__(self, frames_per_clip: int = 4):
        self.n = frames_per_clip

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, frame_hash = [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            step = max(1, len(payload) // self.n)
            for i in range(self.n):
                chunk = payload[i * step : (i + 1) * step]
                ids.append(mid)
                frame_idx.append(i)
                frame_hash.append(hashlib.md5(chunk).hexdigest())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame": pa.array(frame_idx, pa.int32()),
                "frame_hash": pa.array(frame_hash, pa.string()),
            }
        )


def decode_images(ds: ray.data.Dataset, concurrency=(1, 4),
                  batch_size: int = 64) -> ray.data.Dataset:
    """Image decode pipeline: small batches (binary rows are heavy), actor
    pool sized explicitly, zero-copy Arrow in/out."""
    return ds.map_batches(
        DecodeImage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def sample_frames(ds: ray.data.Dataset, frames_per_clip: int = 4,
                  concurrency=(1, 4), batch_size: int = 32) -> ray.data.Dataset:
    return ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"frames_per_clip": frames_per_clip},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
