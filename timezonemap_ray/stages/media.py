"""Multimodal (image/audio/video) stages — Ray-side plumbing is real, the
codec itself is stubbed (no decode libraries in this container).

Media is carried as opaque ``binary`` payloads + typed metadata columns.
Each stage is an actor-pool ``map_batches`` class: codec/model setup happens
once per actor in ``__init__``; batches stay small (``SUGGESTED_BATCH``)
because payload bytes dominate memory, not row count.

``fake=True`` (default in-sandbox) derives deterministic pseudo-decodes
from the payload bytes so schemas, batch shapes and downstream ops are fully
exercised; ``fake=False`` raises NotImplementedError at the exact seam where
PIL / libav would plug in.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

SUGGESTED_BATCH = 64  # payload-heavy stages want small batches

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_ref", pa.string()),
    ("kind", pa.string()),          # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media_table(media_refs: list, kind: str = "image") -> pa.Table:
    """Deterministic fake media blobs for tests/bench."""
    rows = []
    for i, ref in enumerate(media_refs):
        payload = hashlib.blake2b(ref.encode(), digest_size=32).digest() * 8
        rows.append({"media_id": i, "media_ref": ref, "kind": kind,
                     "payload": payload, "width": 64, "height": 48,
                     "duration_ms": 0 if kind == "image" else 5000})
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def _fake_features(payloads: list, dim: int) -> np.ndarray:
    out = np.empty((len(payloads), dim), dtype=np.float32)
    for i, p in enumerate(payloads):
        seed = int.from_bytes(hashlib.blake2b(p or b"", digest_size=8).digest(),
                              "little")
        out[i] = np.random.default_rng(seed).standard_normal(dim,
                                                             dtype=np.float32)
    return out


class MediaDecoder:
    """payload → decoded dims + feature vector. Real decode is the stub seam."""

    def __init__(self, feature_dim: int = 32, fake: bool = True):
        self.feature_dim = feature_dim
        self.fake = fake
        if not fake:
            # the real seam: `import PIL.Image` / `import av` here, once per
            # actor — not per batch
            raise NotImplementedError(
                "real media decode requires PIL/libav (not in this container)")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = _fake_features(payloads, self.feature_dim)
        batch = batch.append_column(
            "features", pa.array(feats.tolist(),
                                 type=pa.list_(pa.float32(), self.feature_dim)))
        return batch.append_column(
            "decoded_bytes", pa.array([len(p or b"") for p in payloads],
                                      type=pa.int64()))


class ImageResizer:
    """Resize metadata transform (target dims recorded; pixel work stubbed)."""

    def __init__(self, target_w: int = 224, target_h: int = 224,
                 fake: bool = True):
        self.target_w, self.target_h = target_w, target_h
        if not fake:
            raise NotImplementedError("real resize requires PIL")

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        batch = batch.append_column(
            "resized_w", pa.array([self.target_w] * n, type=pa.int32()))
        return batch.append_column(
            "resized_h", pa.array([self.target_h] * n, type=pa.int32()))


class FrameSampler:
    """video → one row per sampled frame (flat-map shape: N frames/row)."""

    def __init__(self, every_ms: int = 1000, fake: bool = True):
        self.every_ms = every_ms
        if not fake:
            raise NotImplementedError("real frame sampling requires libav")

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "media_ref": [], "frame_ms": []}
        ids = batch["media_id"].to_pylist()
        refs = batch["media_ref"].to_pylist()
        durs = batch["duration_ms"].to_pylist()
        for mid, ref, dur in zip(ids, refs, durs):
            for t in range(0, int(dur or 0), self.every_ms):
                out["media_id"].append(mid)
                out["media_ref"].append(ref)
                out["frame_ms"].append(t)
        return pa.table({
            "media_id": pa.array(out["media_id"], type=pa.int64()),
            "media_ref": pa.array(out["media_ref"], type=pa.string()),
            "frame_ms": pa.array(out["frame_ms"], type=pa.int32()),
        })
