"""Multimodal (image/audio/video) stages over opaque ``binary`` payloads.

The codec layer is REAL byte-level decode — binary PPM, 24-bit BMP, PNG
(stdlib zlib + numpy filters), baseline JPEG (8x8 DCT + Huffman,
``stages/jpeg.py``) and the TZV1 demo video container (see
``stages/codec.py``). Decode, nearest-neighbor resize, pixel-histogram
features and per-frame demux all operate on actual bytes; the remaining
compressed formats (H.264/MP3) are the documented ``NotImplementedError``
seam where libav would plug in.

Each stage is an actor-pool ``map_batches`` class: setup happens once per
actor; batches stay small (``SUGGESTED_BATCH``) because payload bytes
dominate memory, not row count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import codec

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


def _synth_pixels(ref: str, w: int, h: int) -> np.ndarray:
    """Deterministic pseudo-random RGB pixels seeded from the ref."""
    import hashlib
    seed = int.from_bytes(
        hashlib.blake2b(ref.encode(), digest_size=8).digest(), "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def synth_media_table(media_refs: list, kind: str = "image",
                      w: int = 64, h: int = 48, fmt: str = "ppm") -> pa.Table:
    """Deterministic media blobs for tests/bench — REAL encoded bytes
    (PPM or BMP images; TZV1 containers for video)."""
    rows = []
    for i, ref in enumerate(media_refs):
        if kind == "video":
            frames = [_synth_pixels(f"{ref}#f{k}", w, h) for k in range(5)]
            if fmt == "avi":
                payload = codec.encode_avi_mjpeg(frames, fps=1)
            else:
                payload = codec.encode_video(frames, frame_interval_ms=1000)
            dur = 5000
        elif kind == "audio":
            import hashlib
            seed = int.from_bytes(
                hashlib.blake2b(ref.encode(), digest_size=8).digest(),
                "little")
            rng = np.random.default_rng(seed)
            n = 16000  # 1 s at 16 kHz
            t = np.arange(n, dtype=np.float32)
            tone = np.sin(2 * np.pi * rng.uniform(100, 2000) * t / 16000)
            sig = (tone * 12000 + rng.normal(0, 800, n)).astype(np.int16)
            payload = codec.encode_wav(sig, 16000)
            dur = 1000
        else:
            img = _synth_pixels(ref, w, h)
            if fmt == "bmp":
                payload = codec.encode_bmp(img)
            elif fmt == "png":
                # cycle the filter so every PNG filter path gets exercised
                payload = codec.encode_png(img, filter_type=i % 5)
            elif fmt == "jpeg":
                # cycle subsampling so every JPEG layout gets exercised
                payload = codec.encode_jpeg(
                    img, quality=90,
                    subsample=("4:4:4", "4:2:0", "4:2:2")[i % 3])
            elif fmt == "mixed":
                payload = (codec.encode_bmp(img), codec.encode_ppm(img),
                           codec.encode_png(img, filter_type=i % 5),
                           codec.encode_jpeg(img, quality=90))[i % 4]
            else:
                payload = codec.encode_ppm(img)
            dur = 0
        rows.append({"media_id": i, "media_ref": ref, "kind": kind,
                     "payload": payload, "width": w, "height": h,
                     "duration_ms": dur})
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class MediaDecoder:
    """payload → real decode → (features, decoded_bytes).

    Images decode via the numpy codec; videos decode their FIRST frame
    (representative-frame embedding). ``strict=False`` (default) flags
    undecodable payloads with ``decode_error`` instead of raising —
    never throw mid-pipeline."""

    def __init__(self, feature_dim: int = 32, strict: bool = False,
                 fake: bool = False):
        # `fake` kept for API compat; the codec is real now (incl. PNG
        # and baseline+progressive JPEG); H.264/MP3 remain the libav seam.
        self.feature_dim = feature_dim
        self.strict = strict
        self.fake = fake

    def _decode_one(self, payload: bytes):
        """→ (features_source_array, decoded_nbytes)."""
        if payload[:4] == b"TZV1" or (payload[:4] == b"RIFF"
                                      and payload[8:12] == b"AVI "):
            img = codec.decode_video_frame(payload, 0)
            return codec.image_features(img, self.feature_dim), img.nbytes
        if payload[:4] == b"RIFF":
            samples, rate = codec.decode_wav(payload)
            return (codec.audio_features(samples, rate, self.feature_dim),
                    samples.nbytes)
        img = codec.decode_image(payload)
        return codec.image_features(img, self.feature_dim), img.nbytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.zeros((len(payloads), self.feature_dim), dtype=np.float32)
        nbytes = np.zeros(len(payloads), dtype=np.int64)
        errs: list = [None] * len(payloads)
        for i, p in enumerate(payloads):
            try:
                feats[i], nbytes[i] = self._decode_one(p or b"")
            except Exception as e:  # noqa: BLE001 — flagged, never thrown
                if self.strict:
                    raise
                errs[i] = f"{type(e).__name__}: {e}"
        batch = batch.append_column(
            "features", pa.array(feats.tolist(),
                                 type=pa.list_(pa.float32(), self.feature_dim)))
        batch = batch.append_column("decoded_bytes", pa.array(nbytes))
        return batch.append_column(
            "decode_error", pa.array(errs, type=pa.string()))


ARITH_MID_STRIDE = 1 << 20  # pixel-rule input: mid·STRIDE + flat_pos


def arith_pixels(media_id: int, w: int, h: int) -> np.ndarray:
    """Pixels derivable from the media id by INTEGER arithmetic — so a
    SQL oracle can recompute them without seeing the payload bytes:
    v(mid, p) = splitmix64(mid·2²⁰ + p) mod 256 for flat position
    p = (y·w + x)·3 + c. (The blake2b-seeded :func:`_synth_pixels`
    generator stays for content-opacity tests.)"""
    from .text import _splitmix64
    p = np.arange(w * h * 3, dtype=np.uint64)
    v = _splitmix64(np.uint64(media_id) * np.uint64(ARITH_MID_STRIDE) + p)
    return (v & np.uint64(255)).astype(np.uint8).reshape(h, w, 3)


def synth_media_table_arith(n: int, w: int = 16, h: int = 12,
                            fmt: str = "ppm") -> pa.Table:
    """``n`` REAL payloads whose pixels follow :func:`arith_pixels` —
    the oracle-checkable twin of :func:`synth_media_table`. ``fmt="png"``
    encodes through DEFLATE with filter type ``media_id % 5``, so an
    oracle-checked pipeline over this table proves the full PNG decode
    path (zlib inflate + all five unfilters) bit-for-bit."""
    rows = []
    for i in range(n):
        px = arith_pixels(i, w, h)
        payload = (codec.encode_png(px, filter_type=i % 5)
                   if fmt == "png" else codec.encode_ppm(px))
        rows.append({"media_id": i, "media_ref": f"media://arith/{i}",
                     "kind": "image", "payload": payload,
                     "width": w, "height": h, "duration_ms": 0})
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def image_int_features(img: np.ndarray) -> np.ndarray:
    """INTEGER-EXACT image features (27 × int64): per-channel 8-bin
    histogram counts (bin = v >> 5) then per-channel pixel sums —
    associative integer folds a SQL oracle reproduces bit-for-bit, unlike
    the float mean/std of :func:`codec.image_features`."""
    bins = [np.bincount(img[:, :, c].ravel() >> 5, minlength=8)
            .astype(np.int64) for c in range(3)]
    sums = img.astype(np.int64).sum(axis=(0, 1))
    return np.concatenate(bins + [sums])


def media_int_features(batch: pa.Table) -> pa.Table:
    """payload → REAL decode → integer feature vector (``counts``
    list<int64>, the :func:`image_int_features` layout). Strict: an
    undecodable payload raises — the oracle twin must see every row."""
    feats = [image_int_features(codec.decode_image(p or b""))
             for p in batch["payload"].to_pylist()]
    return pa.table({
        "media_id": batch["media_id"],
        "counts": pa.array([f.tolist() for f in feats],
                           type=pa.list_(pa.int64()))})


class ImageResizer:
    """REAL nearest-neighbor resize: decode → resample → re-encode PPM.
    Output payload replaces the input; width/height updated."""

    def __init__(self, target_w: int = 224, target_h: int = 224,
                 strict: bool = False):
        self.target_w, self.target_h = target_w, target_h
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        out_payload: list = []
        ws: list = []
        hs: list = []
        errs: list = []
        for p in payloads:
            try:
                img = codec.decode_image(p or b"")
                out_payload.append(codec.encode_ppm(
                    codec.resize_nearest(img, self.target_w, self.target_h)))
                ws.append(self.target_w)
                hs.append(self.target_h)
                errs.append(None)
            except Exception as e:  # undecodable: pass through, FLAGGED —
                if self.strict:    # never claim a resize that didn't happen
                    raise
                out_payload.append(p)
                ws.append(None)
                hs.append(None)
                errs.append(f"{type(e).__name__}: {e}")
        cols = {name: batch[name] for name in batch.column_names}
        cols["payload"] = pa.array(out_payload, type=pa.binary())
        out = pa.table(cols)
        out = out.append_column("resized_w", pa.array(ws, type=pa.int32()))
        out = out.append_column("resized_h", pa.array(hs, type=pa.int32()))
        return out.append_column(
            "resize_error", pa.array(errs, type=pa.string()))


class FrameSampler:
    """video → one row per sampled frame (flat-map shape), REAL demux: each
    emitted row carries the frame's decoded dimensions, read by seeking the
    container — only sampled frames' bytes are decoded."""

    def __init__(self, every_ms: int = 1000, strict: bool = False):
        self.every_ms = every_ms
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "media_ref": [], "frame_ms": [],
               "frame_w": [], "frame_h": []}
        ids = batch["media_id"].to_pylist()
        refs = batch["media_ref"].to_pylist()
        durs = batch["duration_ms"].to_pylist()
        payloads = batch["payload"].to_pylist()
        for mid, ref, dur, p in zip(ids, refs, durs, payloads):
            # flag-never-throw contract: malformed containers include
            # truncated streams (struct.error), 0-frame videos (IndexError)
            # and bad magics (ValueError). Frames buffer per video and
            # commit all-or-nothing — a mid-stream decode failure must not
            # emit a partially sampled video that looks complete.
            video_rows: list = []
            try:
                n_frames, interval = codec.video_info(p or b"")
                if n_frames <= 0:
                    continue
                for t in range(0, int(dur or 0), self.every_ms):
                    idx = min(t // max(interval, 1), n_frames - 1)
                    fr = codec.decode_video_frame(p, int(idx))
                    video_rows.append((t, fr.shape[1], fr.shape[0]))
            except Exception:  # noqa: BLE001
                if self.strict:
                    raise
                continue
            for t, w, h in video_rows:
                out["media_id"].append(mid)
                out["media_ref"].append(ref)
                out["frame_ms"].append(t)
                out["frame_w"].append(w)
                out["frame_h"].append(h)
        return pa.table({
            "media_id": pa.array(out["media_id"], type=pa.int64()),
            "media_ref": pa.array(out["media_ref"], type=pa.string()),
            "frame_ms": pa.array(out["frame_ms"], type=pa.int32()),
            "frame_w": pa.array(out["frame_w"], type=pa.int32()),
            "frame_h": pa.array(out["frame_h"], type=pa.int32()),
        })
