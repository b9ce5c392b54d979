"""Baseline JPEG codec tests (``stages/jpeg.py``) — pure numpy + stdlib.

No independent decoder exists in this container (no PIL/libjpeg), so
conformance is evidenced three ways: analytic error bounds that follow
from the spec (quantization error <= q/2 per coefficient, so block-flat
images roundtrip near-exactly), structural byte checks on the emitted
markers, and invariance properties a conforming codec must satisfy
(restart-marker streams decode bit-identically to their no-restart twin,
fill bytes are transparent, recompression is a near-fixed-point).
"""

import struct

import numpy as np
import pytest

from timezonemap_ray.stages import codec, jpeg


def _rng():
    return np.random.default_rng(20260818)


def _smooth(h, w, seed=7):
    """Natural-image-like smooth gradient + low-amp noise."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([
        128 + 100 * np.sin(yy / 17.0),
        128 + 100 * np.cos(xx / 23.0),
        128 + 80 * np.sin((xx + yy) / 31.0),
    ], axis=-1)
    noise = np.random.default_rng(seed).normal(0, 4, base.shape)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("subsample", ["4:4:4", "4:2:2", "4:2:0"])
@pytest.mark.parametrize("shape", [(8, 8), (16, 16), (37, 53), (1, 1), (9, 130)])
def test_roundtrip_error_bounded(subsample, shape):
    h, w = shape
    img = _smooth(h, w)
    data = jpeg.encode_jpeg(img, quality=90, subsample=subsample)
    dec = jpeg.decode_jpeg(data)
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    # pointwise bound: sum of per-coefficient quant errors can stack on a
    # single pixel; chroma subsampling costs more
    tol = 14 if subsample == "4:4:4" else 28
    assert err.max() <= tol, err.max()
    assert err.mean() <= 3.5


def test_quality_monotone_size_and_error():
    img = _smooth(48, 64)
    sizes, errs = [], []
    for q in (30, 60, 90):
        data = jpeg.encode_jpeg(img, quality=q, subsample="4:4:4")
        dec = jpeg.decode_jpeg(data)
        sizes.append(len(data))
        errs.append(np.abs(dec.astype(int) - img.astype(int)).mean())
    assert sizes[0] < sizes[1] < sizes[2]
    assert errs[0] > errs[2]


def test_flat_image_exact():
    # constant blocks have only a DC coefficient; at quality 90 the DC
    # quant step gives per-pixel error < 0.5, so rounding recovers exactly
    for v in (0, 64, 130, 255):
        img = np.full((24, 40, 3), v, np.uint8)
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
        assert np.array_equal(dec, img), v


def test_grayscale_roundtrip():
    img = _smooth(33, 29)[:, :, 0]
    data = jpeg.encode_jpeg(img, quality=92)
    dec = jpeg.decode_jpeg(data)
    assert dec.ndim == 2 and dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 14
    # grayscale stream carries exactly one SOF component
    sof = data.index(b"\xff\xc0")
    assert data[sof + 9] == 1


def test_restart_markers_decode_identically():
    img = _smooth(40, 56, seed=11)
    plain = jpeg.encode_jpeg(img, quality=85, subsample="4:2:0")
    rst = jpeg.encode_jpeg(img, quality=85, subsample="4:2:0",
                           restart_interval=2)
    assert b"\xff\xdd" in rst and b"\xff\xdd" not in plain
    # RST0 marker must actually appear in the entropy stream
    assert any(bytes([0xFF, 0xD0 + i]) in rst for i in range(8))
    assert np.array_equal(jpeg.decode_jpeg(plain), jpeg.decode_jpeg(rst))


def test_marker_structure():
    img = _smooth(16, 16)
    data = jpeg.encode_jpeg(img, quality=80)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc0", b"\xff\xc4",
                   b"\xff\xda"):
        assert marker in data
    # SOF dimensions are big-endian h, w at fixed offsets
    sof = data.index(b"\xff\xc0")
    hh, ww = struct.unpack(">HH", data[sof + 5:sof + 9])
    assert (hh, ww) == (16, 16)


def test_entropy_stream_is_stuffed():
    # after SOS, every 0xFF inside entropy data must be followed by
    # 0x00 (stuffing) or be a RST/EOI marker
    img = _rng().integers(0, 256, (32, 32, 3), dtype=np.uint8)
    data = jpeg.encode_jpeg(img, quality=95, subsample="4:4:4")
    sos = data.index(b"\xff\xda")
    scan = data[sos + 2 + struct.unpack(">H", data[sos + 2:sos + 4])[0]:]
    i = 0
    while i < len(scan) - 1:
        if scan[i] == 0xFF:
            nxt = scan[i + 1]
            assert nxt == 0x00 or 0xD0 <= nxt <= 0xD9, hex(nxt)
            i += 2
        else:
            i += 1


def test_fill_bytes_tolerated():
    img = _smooth(16, 24)
    data = jpeg.encode_jpeg(img, quality=90)
    # insert fill 0xFF bytes before the SOF marker (B.1.1.2 allows them)
    sof = data.index(b"\xff\xc0")
    padded = data[:sof] + b"\xff\xff\xff" + data[sof:]
    assert np.array_equal(jpeg.decode_jpeg(padded), jpeg.decode_jpeg(data))


def test_recompression_near_fixed_point():
    img = _smooth(32, 32)
    once = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90,
                                             subsample="4:4:4"))
    twice = jpeg.decode_jpeg(jpeg.encode_jpeg(once, quality=90,
                                              subsample="4:4:4"))
    # re-quantizing already-quantized coefficients moves pixels very little
    assert np.abs(twice.astype(int) - once.astype(int)).mean() <= 1.0


@pytest.mark.parametrize("subsample", ["4:4:4", "4:2:2", "4:2:0"])
@pytest.mark.parametrize("shape", [(16, 16), (37, 53), (1, 1), (9, 130)])
def test_progressive_bit_identical_to_baseline(subsample, shape):
    """The two entropy layouts carry the same quantized coefficients, so
    decoding must be BIT-identical — the strongest internal-consistency
    check available without an external decoder."""
    img = _smooth(*shape)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85,
                                             subsample=subsample))
    prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(
        img, quality=85, subsample=subsample))
    assert np.array_equal(base, prog)


def test_progressive_gray_and_structure():
    img = _smooth(24, 40)[:, :, 0]
    data = jpeg.encode_jpeg_progressive(img, quality=92)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data  # SOF2 only
    assert data.count(b"\xff\xda") >= 4  # DC first/refine + AC scans
    assert np.array_equal(jpeg.decode_jpeg(data),
                          jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=92)))


def test_progressive_scan_headers():
    img = _smooth(16, 16)
    data = jpeg.encode_jpeg_progressive(img, quality=80, subsample="4:4:4")
    # collect (ns, Ss, Se, Ah, Al) of each SOS
    scans = []
    p = 0
    while True:
        p = data.find(b"\xff\xda", p)
        if p < 0:
            break
        seglen = struct.unpack(">H", data[p + 2:p + 4])[0]
        body = data[p + 4:p + 2 + seglen]
        ns = body[0]
        ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
        scans.append((ns, ss, se, ahal >> 4, ahal & 15))
        p += 2
    assert scans[0] == (3, 0, 0, 0, 1)    # DC first, interleaved, Al=1
    assert scans[1] == (3, 0, 0, 1, 0)    # DC refinement
    assert (1, 1, 5, 0, 1) in scans       # AC band 1..5 first
    assert (1, 6, 63, 0, 1) in scans      # AC band 6..63 first
    assert (1, 1, 63, 1, 0) in scans      # AC refinement


def test_arithmetic_coding_raises_seam():
    img = _smooth(16, 16)
    data = jpeg.encode_jpeg(img, quality=80)
    arith = data.replace(b"\xff\xc0", b"\xff\xc9", 1)  # SOF0 -> SOF9
    with pytest.raises(NotImplementedError):
        jpeg.decode_jpeg(arith)


def test_malformed_raises_valueerror():
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"garbage")
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"\xff\xd8\xff\xe0rest")  # truncated APP0
    img = _smooth(16, 16)
    data = jpeg.encode_jpeg(img, quality=80)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(data[:len(data) // 2])  # cut mid-scan


def test_decode_image_dispatch():
    img = _smooth(20, 28)
    data = jpeg.encode_jpeg(img, quality=90, subsample="4:4:4")
    dec = codec.decode_image(data)
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 14


def test_media_synth_jpeg_flows_through_decoder():
    from timezonemap_ray.stages import media
    tbl = media.synth_media_table(
        [f"img{i}" for i in range(6)], kind="image", w=24, h=16, fmt="jpeg")
    out = media.MediaDecoder(feature_dim=16)(tbl)
    assert out.num_rows == 6
    assert not any(out.column("decode_error").to_pylist())
    feats = out.column("features").to_pylist()
    assert all(len(f) == 16 for f in feats)


def test_media_synth_mixed_formats():
    from timezonemap_ray.stages import media
    tbl = media.synth_media_table(
        [f"m{i}" for i in range(8)], kind="image", w=16, h=16, fmt="mixed")
    magics = {bytes(p[:2]) for p in tbl.column("payload").to_pylist()}
    assert magics == {b"BM", b"P6", b"\x89P", b"\xff\xd8"}
    out = media.MediaDecoder(feature_dim=8)(tbl)
    assert not any(out.column("decode_error").to_pylist())


def test_dc_quant_error_bound_analytic():
    # for a block-constant plane, the only nonzero coefficient is DC =
    # 8*(v-128); decode error per pixel is |round(dc/q00)*q00 - dc| / 8
    # <= q00/16. Verify the implementation meets the analytic bound.
    q = jpeg._quality_tables(75)[0][0]
    for v in (3, 77, 200, 251):
        img = np.full((8, 8), v, np.uint8)
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=75))
        bound = q / 16 + 0.5  # + rounding to uint8
        assert np.abs(dec.astype(float) - v).max() <= bound
