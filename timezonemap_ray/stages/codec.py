"""Pure-numpy image / video codecs — REAL byte-level decode without PIL/libav.

The container has no image libraries, but the formats below need none:
binary PPM (P6) and 24-bit BMP are header + raw pixel bytes, PNG only
needs DEFLATE — which the stdlib ``zlib`` provides — plus the five scanline
filters, implemented here in numpy, and JPEG (baseline + progressive)
is 8x8 DCT + Huffman coding (``stages/jpeg.py``). These power the multimodal stages
(``stages/media.py``) end-to-end on real bytes; the remaining compressed
formats (H.264/MP3) are the documented ``NotImplementedError`` seam
where libav would plug in.

Formats:
- **PPM (P6)**: ``P6\\n<w> <h>\\n255\\n`` + RGB rows, top-down.
- **BMP (24-bit, BI_RGB)**: 14-byte file header + 40-byte info header +
  BGR rows bottom-up, each padded to 4 bytes.
- **PNG**: full spec subset — 8-bit gray / RGB / RGBA, all five scanline
  filters (None/Sub/Up/Average/Paeth), chunk CRC verification, multiple
  IDAT chunks. Interlace (Adam7), palettes and 16-bit depths raise.
- **JPEG**: baseline + progressive DCT (``stages/jpeg.py``) — grayscale
  and YCbCr 4:4:4 / 4:2:2 / 4:2:0, restart markers, spectral selection +
  successive approximation. Arithmetic coding raises.
- **AVI / MJPEG video**: a REAL RIFF container (hdrl/avih/strh/strf,
  movi with '00dc' chunks, idx1) holding our baseline JPEGs — readable
  by any player/ffmpeg; demux touches only chunk offsets.
- **TZV1 video**: a deliberately trivial legacy container for the
  frame-sample stage: ``b"TZV1" + uint32 n_frames + uint32
  frame_interval_ms`` then per frame ``uint32 byte_length + PPM bytes``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from . import jpeg
from .jpeg import decode_jpeg, encode_jpeg  # noqa: F401 — codec namespace


# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM bytes."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM bytes → (h, w, 3) uint8 (raises ValueError on malformed)."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: magic, width, height, maxval — whitespace separated, then ONE
    # whitespace byte before the raster
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":  # comment line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    need = w * h * 3
    raster = np.frombuffer(data, dtype=np.uint8, count=need, offset=pos)
    return raster.reshape(h, w, 3).copy()


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BMP bytes (bottom-up BGR, 4-byte row pad)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row_bytes = (w * 3 + 3) & ~3  # rows padded to 4 bytes (zeros)
    bgr = img[::-1, :, ::-1]  # bottom-up, RGB→BGR
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, :w * 3] = bgr.reshape(h, w * 3)
    pixel_data = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(pixel_data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       len(pixel_data), 2835, 2835, 0, 0)
    return header + info + pixel_data


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (h, w, 3) uint8 RGB."""
    if not data.startswith(b"BM"):
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    flip = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    raster = np.frombuffer(data, dtype=np.uint8, count=h * row_bytes,
                           offset=off).reshape(h, row_bytes)
    bgr = raster[:, :w * 3].reshape(h, w, 3)
    img = bgr[:, :, ::-1]  # BGR→RGB
    return (img[::-1] if flip else img).copy()


# ---------------------------------------------------------------------------
# PNG (8-bit gray / RGB / RGBA; filters 0-4; stdlib zlib DEFLATE)
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body)))


def _paeth(left: np.ndarray, up: np.ndarray, upleft: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (int16 inputs → uint8 choice)."""
    p = left + up - upleft
    pa_, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
    out = np.where((pa_ <= pb) & (pa_ <= pc), left,
                   np.where(pb <= pc, up, upleft))
    return out.astype(np.uint8)


def encode_png(img: np.ndarray, filter_type: int = 0,
               compress_level: int = 6) -> bytes:
    """(h, w, 3) uint8 RGB → PNG bytes, every row filtered with
    ``filter_type`` (0-4). Filtering for ENCODE only reads raw pixels, so
    all five filters vectorize over the whole image at once."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    if not 0 <= filter_type <= 4:
        raise ValueError(f"filter_type {filter_type} out of range")
    rows = np.ascontiguousarray(img).reshape(h, w * 3)
    if filter_type == 0:
        filt = rows
    else:
        r16 = rows.astype(np.int16)
        left = np.zeros_like(r16)
        left[:, 3:] = r16[:, :-3]
        up = np.zeros_like(r16)
        up[1:] = r16[:-1]
        if filter_type == 1:
            filt = (r16 - left).astype(np.uint8)
        elif filter_type == 2:
            filt = (r16 - up).astype(np.uint8)
        elif filter_type == 3:
            filt = (r16 - (left + up) // 2).astype(np.uint8)
        else:  # Paeth
            upleft = np.zeros_like(r16)
            upleft[1:, 3:] = r16[:-1, :-3]
            filt = (r16 - _paeth(left, up, upleft)).astype(np.uint8)
    scan = np.empty((h, 1 + w * 3), dtype=np.uint8)
    scan[:, 0] = filter_type
    scan[:, 1:] = filt
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(scan.tobytes(), compress_level)
    return (PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 RGB. Supports bit depth 8 with color
    types 0 (gray, expanded to RGB), 2 (RGB) and 6 (RGBA, alpha dropped);
    all five scanline filters; multi-IDAT streams; per-chunk CRC checks.
    Adam7 interlace / palette / 16-bit raise ``NotImplementedError``."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, ihdr, idat_parts = 8, None, []
    while pos + 8 <= len(data):
        ln, tag = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8:pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated PNG chunk")
        crc = struct.unpack_from(">I", data, pos + 8 + ln)[0]
        if zlib.crc32(tag + body) != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat_parts.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat_parts:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype, comp, fmeth, interlace = ihdr
    if comp != 0 or fmeth != 0:
        raise ValueError("bad PNG compression/filter method")
    if interlace != 0:
        raise NotImplementedError("Adam7 interlaced PNG — seam")
    if depth != 8 or ctype not in (0, 2, 6):
        raise NotImplementedError(
            f"PNG depth {depth} / color type {ctype} — only 8-bit "
            "gray/RGB/RGBA supported")
    bpp = {0: 1, 2: 3, 6: 4}[ctype]
    stride = w * bpp
    raw = zlib.decompress(b"".join(idat_parts))
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG pixel data length mismatch")
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    ftypes = scan[:, 0]
    if ftypes.max(initial=0) > 4:
        raise ValueError("bad PNG filter type")
    rows = scan[:, 1:].copy()
    if ftypes.any():  # all-zero filters = already reconstructed
        rows = _png_unfilter(rows, ftypes, bpp)
    img = rows.reshape(h, w, bpp)
    if ctype == 0:
        img = np.repeat(img, 3, axis=2)
    elif ctype == 6:
        img = img[:, :, :3]
    return np.ascontiguousarray(img)


def _png_unfilter(rows: np.ndarray, ftypes: np.ndarray, bpp: int) -> np.ndarray:
    """Reconstruct filtered scanlines in place ((h, stride) uint8).

    Decode-side reconstruction reads RECONSTRUCTED neighbors, so rows are
    sequential top-down; within a row, Sub is a per-lane wrapping prefix
    sum (``np.add.accumulate`` on uint8), Up is one vector add, and
    Average/Paeth carry a true left-dependency — those loop over pixels
    with the 1-3 byte lanes vectorized."""
    h, stride = rows.shape
    w = stride // bpp
    for i in range(h):
        f = int(ftypes[i])
        if f == 0:
            continue
        r = rows[i].reshape(w, bpp)
        up = (rows[i - 1].reshape(w, bpp) if i else
              np.zeros((w, bpp), dtype=np.uint8))
        if f == 1:      # Sub: recon[x] = filt[x] + recon[x-1]  (per lane)
            np.add.accumulate(r, axis=0, dtype=np.uint8, out=r)
        elif f == 2:    # Up
            r += up
        elif f == 3:    # Average: needs reconstructed left
            prev = np.zeros(bpp, dtype=np.int16)
            up16 = up.astype(np.int16)
            for x in range(w):
                prev = (r[x] + ((prev + up16[x]) >> 1)).astype(np.uint8)
                r[x] = prev
                prev = prev.astype(np.int16)
        else:           # Paeth
            prev = np.zeros(bpp, dtype=np.int16)
            prev_up = np.zeros(bpp, dtype=np.int16)
            up16 = up.astype(np.int16)
            for x in range(w):
                rec = (r[x] + _paeth(prev, up16[x], prev_up)).astype(np.uint8)
                r[x] = rec
                prev = rec.astype(np.int16)
                prev_up = up16[x]
    return rows


# ---------------------------------------------------------------------------
# dispatch + pixel ops
# ---------------------------------------------------------------------------

def decode_image(data: bytes) -> np.ndarray:
    """Sniff the magic and decode (PPM / BMP / PNG / baseline JPEG)."""
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:8] == PNG_SIG:
        return decode_png(data)
    if data[:3] == b"\xff\xd8\xff":
        return jpeg.decode_jpeg(data)
    raise ValueError("unknown image format")


def resize_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy index sampling."""
    sh, sw = img.shape[:2]
    ys = (np.arange(h) * sh // h).clip(0, sh - 1)
    xs = (np.arange(w) * sw // w).clip(0, sw - 1)
    return img[ys[:, None], xs[None, :]]


def image_features(img: np.ndarray, dim: int = 32) -> np.ndarray:
    """Real pixel features: per-channel 8-bin histograms (normalized) +
    per-channel mean/std + aspect — padded/truncated to ``dim`` float32."""
    f = []
    for c in range(3):
        hist = np.bincount(img[:, :, c].ravel() >> 5, minlength=8)
        f.append(hist / max(img.shape[0] * img.shape[1], 1))
    px = img.astype(np.float32)
    f.append(px.mean(axis=(0, 1)) / 255.0)
    f.append(px.std(axis=(0, 1)) / 255.0)
    f.append(np.array([img.shape[1] / max(img.shape[0], 1)], dtype=np.float32))
    v = np.concatenate(f).astype(np.float32)
    if v.size < dim:
        v = np.pad(v, (0, dim - v.size))
    return v[:dim]


# ---------------------------------------------------------------------------
# TZV1 video container
# ---------------------------------------------------------------------------

def encode_video(frames: list, frame_interval_ms: int = 1000) -> bytes:
    """List of (h, w, 3) uint8 frames → TZV1 bytes (PPM per frame)."""
    parts = [b"TZV1", struct.pack("<II", len(frames), frame_interval_ms)]
    for fr in frames:
        p = encode_ppm(fr)
        parts.append(struct.pack("<I", len(p)))
        parts.append(p)
    return b"".join(parts)


def encode_avi_mjpeg(frames: list, fps: int = 1, quality: int = 90) -> bytes:
    """List of (h, w, 3) uint8 frames → AVI (RIFF) with MJPG-compressed
    frames — a REAL container any player/ffmpeg reads: hdrl (avih + one
    'vids'/'MJPG' stream), movi with '00dc' chunks, idx1 index.  Frames
    are our own baseline JPEGs (``stages/jpeg.py``)."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    jpgs = [jpeg.encode_jpeg(f, quality=quality) for f in frames]
    n = len(jpgs)
    usec = max(int(1_000_000 // max(fps, 1)), 1)
    maxb = max(len(j) for j in jpgs)

    def chunk(tag, body):
        pad = b"\x00" if len(body) % 2 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(tag, body):
        return chunk(b"LIST", tag + body)

    avih = struct.pack("<14I", usec, maxb * fps, 0, 0x10,  # AVIF_HASINDEX
                       n, 0, 1, maxb, w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIiI4h", b"vids", b"MJPG", 0, 0, 0,
                       0, 1, fps, 0, n, maxb, -1, 0, 0, 0, w, h)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", j) for j in jpgs)
    movi = lst(b"movi", movi_body)
    # idx1 offsets are relative to the start of the movi list data ('movi')
    idx = []
    off = 4
    for j in jpgs:
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) % 2)
    idx1 = chunk(b"idx1", b"".join(idx))
    return chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _avi_frames(data: bytes):
    """AVI bytes → (frame byte-ranges, frame_interval_ms). Walks RIFF
    chunks; only offsets are touched, no frame decoded."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    interval_ms = 0
    ranges = []
    pos = 12
    end = 8 + struct.unpack_from("<I", data, 4)[0]

    def walk(pos, end):
        nonlocal interval_ms
        while pos + 8 <= end:
            tag = data[pos:pos + 4]
            size = struct.unpack_from("<I", data, pos + 4)[0]
            body = pos + 8
            if tag == b"LIST":
                walk(body + 4, body + size)
            elif tag == b"avih":
                interval_ms = struct.unpack_from("<I", data, body)[0] // 1000
            elif tag[2:4] in (b"dc", b"db") and tag[:2].isdigit():
                ranges.append((body, body + size))
            pos = body + size + (size % 2)

    walk(pos, end)
    return ranges, interval_ms


def video_info(data: bytes) -> tuple[int, int]:
    """(n_frames, frame_interval_ms) without decoding any frame.
    TZV1 or AVI/MJPEG."""
    if data[:4] == b"TZV1":
        return struct.unpack_from("<II", data, 4)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        ranges, interval = _avi_frames(data)
        return len(ranges), interval
    raise ValueError("not a TZV1/AVI video")


def decode_video_frame(data: bytes, frame_idx: int) -> np.ndarray:
    """Decode ONE frame by seeking the container index — the demux step:
    only the requested frame's bytes are parsed. TZV1 or AVI/MJPEG."""
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        ranges, _ = _avi_frames(data)
        if not (0 <= frame_idx < len(ranges)):
            raise IndexError(f"frame {frame_idx} of {len(ranges)}")
        a, b = ranges[frame_idx]
        return decode_image(data[a:b])
    n, _ = video_info(data)
    if not (0 <= frame_idx < n):
        raise IndexError(f"frame {frame_idx} of {n}")
    pos = 12
    for _ in range(frame_idx):
        ln = struct.unpack_from("<I", data, pos)[0]
        pos += 4 + ln
    ln = struct.unpack_from("<I", data, pos)[0]
    return decode_ppm(data[pos + 4:pos + 4 + ln])


# ---------------------------------------------------------------------------
# WAV (PCM16) audio
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) int16 mono PCM → WAV bytes (RIFF/WAVE, fmt + data chunks)."""
    assert samples.dtype == np.int16 and samples.ndim == 1
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = (b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n,) int16 mono samples, sample_rate). PCM16 only;
    compressed codecs (MP3/AAC/float WAV) are the libav seam."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, n_ch, bits, samples = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        ln = struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, n_ch, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", data, body)
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(
                    "only PCM16 WAV supported — compressed audio is the "
                    "libav seam")
        elif cid == b"data":
            samples = np.frombuffer(data, dtype=np.int16, count=ln // 2,
                                    offset=body)
        pos = body + ln + (ln & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    if n_ch and n_ch > 1:
        samples = samples.reshape(-1, n_ch).mean(axis=1).astype(np.int16)
    return samples.copy(), rate


def audio_features(samples: np.ndarray, sample_rate: int,
                   dim: int = 32) -> np.ndarray:
    """Real signal features: RMS, zero-crossing rate, duration, and a
    log-magnitude spectrum (rfft) pooled into coarse bands — float32[dim]."""
    x = samples.astype(np.float32) / 32768.0
    n = max(x.size, 1)
    zcr = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))) / n
    rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
    spec = np.abs(np.fft.rfft(x, n=min(x.size, 4096) or 1))
    bands = max(dim - 3, 1)
    pooled = np.zeros(bands, dtype=np.float32)
    if spec.size:
        edges = np.linspace(0, spec.size, bands + 1).astype(int)
        for k in range(bands):
            seg = spec[edges[k]:max(edges[k + 1], edges[k] + 1)]
            pooled[k] = np.log1p(seg.mean()) if seg.size else 0.0
    v = np.concatenate([[rms, zcr, x.size / max(sample_rate, 1)],
                        pooled]).astype(np.float32)
    if v.size < dim:
        v = np.pad(v, (0, dim - v.size))
    return v[:dim]
