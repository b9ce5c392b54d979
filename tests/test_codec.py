"""PNG codec tests — real byte-level encode/decode via stdlib zlib + numpy.

The PNG subset mirrors what a crawl pipeline actually meets for raster
payloads: 8-bit gray/RGB/RGBA, all five scanline filters, multi-IDAT
streams, CRC-checked chunks. Baseline AND progressive JPEG are real
too (see ``tests/test_jpeg.py``); arithmetic-coded JPEG is the seam.
"""

import struct
import zlib

import numpy as np
import pytest

from timezonemap_ray.stages import codec


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body)))


def _rng():
    return np.random.default_rng(20260818)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (12, 16), (48, 64), (7, 1)])
def test_png_round_trip_every_filter(filter_type, shape):
    h, w = shape
    img = _rng().integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = codec.encode_png(img, filter_type=filter_type)
    assert np.array_equal(codec.decode_png(data), img)
    # dispatch sniffs the signature
    assert np.array_equal(codec.decode_image(data), img)


@pytest.mark.parametrize("filter_type", [1, 2, 3, 4])
def test_png_round_trip_correlated_pixels(filter_type):
    # gradients are where Sub/Up/Average/Paeth actually change the bytes
    y, x = np.mgrid[0:33, 0:47]
    img = np.stack([(x * 3) % 256, (y * 5) % 256, (x + y) % 256],
                   axis=2).astype(np.uint8)
    data = codec.encode_png(img, filter_type=filter_type)
    assert np.array_equal(codec.decode_png(data), img)


def test_png_grayscale_expands_to_rgb():
    g = _rng().integers(0, 256, size=(9, 11), dtype=np.uint8)
    scan = np.concatenate([np.zeros((9, 1), np.uint8), g], axis=1)
    png = (codec.PNG_SIG
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 11, 9, 8, 0, 0, 0, 0))
           + _chunk(b"IDAT", zlib.compress(scan.tobytes()))
           + _chunk(b"IEND", b""))
    assert np.array_equal(codec.decode_png(png),
                          np.repeat(g[:, :, None], 3, axis=2))


def test_png_rgba_drops_alpha_and_unfilters_up():
    a = _rng().integers(0, 256, size=(6, 8, 4), dtype=np.uint8)
    filt = a.reshape(6, 32).astype(np.int16)
    filt[1:] -= a.reshape(6, 32)[:-1].astype(np.int16)  # Up filter
    scan = np.concatenate([np.full((6, 1), 2, np.uint8),
                           filt.astype(np.uint8)], axis=1)
    png = (codec.PNG_SIG
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 6, 8, 6, 0, 0, 0))
           + _chunk(b"IDAT", zlib.compress(scan.tobytes()))
           + _chunk(b"IEND", b""))
    assert np.array_equal(codec.decode_png(png), a[:, :, :3])


def test_png_multi_idat():
    img = _rng().integers(0, 256, size=(10, 10, 3), dtype=np.uint8)
    data = codec.encode_png(img, filter_type=4)
    pos, parts = 8, [data[:8]]
    while pos < len(data):
        ln, tag = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"IDAT" and ln > 4:
            parts.append(_chunk(b"IDAT", body[:ln // 2]))
            parts.append(_chunk(b"IDAT", body[ln // 2:]))
        else:
            parts.append(data[pos:pos + 12 + ln])
        pos += 12 + ln
    assert np.array_equal(codec.decode_png(b"".join(parts)), img)


def test_png_crc_corruption_detected():
    data = bytearray(codec.encode_png(
        _rng().integers(0, 256, size=(5, 5, 3), dtype=np.uint8)))
    data[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        codec.decode_png(bytes(data))


def test_png_truncated_raises():
    data = codec.encode_png(
        _rng().integers(0, 256, size=(5, 5, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        codec.decode_png(data[:len(data) // 2])


def test_png_interlace_and_16bit_are_seams():
    png = (codec.PNG_SIG
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1))
           + _chunk(b"IDAT", b"x") + _chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        codec.decode_png(png)
    png16 = (codec.PNG_SIG
             + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0))
             + _chunk(b"IDAT", b"x") + _chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        codec.decode_png(png16)


def test_truncated_jpeg_rejected():
    # truncated magic with no parsable frame/scan -> ValueError
    with pytest.raises(ValueError):
        codec.decode_image(b"\xff\xd8\xff\xe0rest")


def test_png_mixed_filters_across_rows():
    # hand-assemble a stream whose rows use a different filter each —
    # decode must hold reconstructed state across filter switches
    img = _rng().integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
    rows = img.reshape(10, 18).astype(np.int16)
    scan = np.empty((10, 19), dtype=np.uint8)
    for i in range(10):
        f = i % 5
        scan[i, 0] = f
        r = rows[i]
        left = np.zeros(18, np.int16)
        left[3:] = r[:-3]
        up = rows[i - 1] if i else np.zeros(18, np.int16)
        upleft = np.zeros(18, np.int16)
        if i:
            upleft[3:] = rows[i - 1][:-3]
        if f == 0:
            scan[i, 1:] = r.astype(np.uint8)
        elif f == 1:
            scan[i, 1:] = (r - left).astype(np.uint8)
        elif f == 2:
            scan[i, 1:] = (r - up).astype(np.uint8)
        elif f == 3:
            scan[i, 1:] = (r - (left + up) // 2).astype(np.uint8)
        else:
            scan[i, 1:] = (r - codec._paeth(left, up, upleft)).astype(
                np.uint8)
    png = (codec.PNG_SIG
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 10, 8, 2, 0, 0, 0))
           + _chunk(b"IDAT", zlib.compress(scan.tobytes()))
           + _chunk(b"IEND", b""))
    assert np.array_equal(codec.decode_png(png), img)


# ---------------------------------------------------------------------------
# AVI / MJPEG container (round 4: a REAL video format replaces TZV1)
# ---------------------------------------------------------------------------

def test_avi_mjpeg_structure_and_roundtrip():
    # smooth gradient frames so MJPEG loss stays small
    yy, xx = np.mgrid[0:24, 0:32]
    frames = [np.stack([(yy * 8 + k * 10) % 256, (xx * 6) % 256,
                        ((yy + xx) * 4) % 256], axis=-1).astype(np.uint8)
              for k in range(3)]
    frames = [np.clip(128 + 60 * np.sin(f / 40.0), 0, 255).astype(np.uint8)
              for f in frames]
    avi = codec.encode_avi_mjpeg(frames, fps=2, quality=92)
    # RIFF/AVI layout with index
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    for tag in (b"hdrl", b"avih", b"strl", b"strh", b"strf",
                b"movi", b"00dc", b"idx1", b"MJPG"):
        assert tag in avi, tag
    n, interval = codec.video_info(avi)
    assert (n, interval) == (3, 500)
    for k in range(3):
        img = codec.decode_video_frame(avi, k)
        assert img.shape == (24, 32, 3)
        assert np.abs(img.astype(int) - frames[k].astype(int)).mean() < 4
    with pytest.raises(IndexError):
        codec.decode_video_frame(avi, 3)
    # frame payloads are plain baseline JPEGs (start with SOI inside 00dc)
    p = avi.index(b"00dc")
    assert avi[p + 8:p + 10] == b"\xff\xd8"


def test_avi_chunks_even_padded():
    # RIFF chunks must be 2-byte aligned; odd-length JPEG payloads force pads
    frames = [np.full((8, 8, 3), v, np.uint8) for v in (10, 200)]
    avi = codec.encode_avi_mjpeg(frames, fps=1)
    pos, end = 12, 8 + struct.unpack_from("<I", avi, 4)[0]
    while pos + 8 <= end:
        size = struct.unpack_from("<I", avi, pos + 4)[0]
        pos += 8 + size + (size % 2)
    assert pos == end  # walked exactly to the end => sizes + pads consistent


def test_avi_through_media_stages():
    from timezonemap_ray.stages import media
    tbl = media.synth_media_table([f"v{i}" for i in range(4)], kind="video",
                                  w=24, h=16, fmt="avi")
    out = media.MediaDecoder(feature_dim=8)(tbl)
    assert not any(out.column("decode_error").to_pylist())
    sampled = media.FrameSampler(every_ms=1000)(tbl)
    # 5 frames at 1 fps, duration 5000 ms -> 5 sampled rows per video
    assert sampled.num_rows == 4 * 5
    assert set(sampled.column("frame_w").to_pylist()) == {24}
    # WAV payloads still route to the audio path (both are RIFF)
    aud = media.synth_media_table(["a0"], kind="audio")
    assert not any(media.MediaDecoder(feature_dim=8)(aud)
                   .column("decode_error").to_pylist())


def test_avi_malformed_rejected():
    with pytest.raises(ValueError):
        codec.video_info(b"RIFF\x10\x00\x00\x00WAVExxxx")  # not AVI
    frames = [np.full((8, 8, 3), 7, np.uint8)]
    avi = codec.encode_avi_mjpeg(frames)
    assert codec.video_info(avi) == (1, 1000000 // 1 // 1000)
