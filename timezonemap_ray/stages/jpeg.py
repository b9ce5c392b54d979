"""Baseline JPEG codec (ITU-T T.81, sequential DCT, Huffman) in pure numpy.

The container has no PIL/libjpeg, but baseline JPEG needs neither: the
whole format is 8x8 DCT + scalar quantization + canonical Huffman coding,
all of which numpy + stdlib express directly.  This closes the main
"compressed image" seam in ``stages/codec.py`` — JPEG bytes produced by any
conformant encoder in the subset below decode here, and bytes encoded here
decode in any viewer.

Supported subset (the overwhelmingly common one):
- **Decode**: baseline sequential DCT (SOF0/SOF1) AND progressive DCT
  (SOF2: spectral selection + successive approximation, DC/AC first and
  refinement scans, EOB runs, non-interleaved single-component scans —
  T.81 G.2), 8-bit, 1 component (grayscale) or 3 components (YCbCr),
  sampling 4:4:4 / 4:2:2 / 4:2:0, multiple DQT/DHT segments (tables may
  be redefined between scans), restart markers (DRI / RSTn), APPn/COM
  skipped.  Arithmetic coding, 12-bit, lossless and hierarchical modes
  raise ``NotImplementedError``.
- **Encode**: ``encode_jpeg`` (SOF0 baseline) and
  ``encode_jpeg_progressive`` (SOF2, a 5-stage scan script with EOB runs
  capped at one block so the Annex-K tables suffice) — grayscale or
  YCbCr with 4:4:4 / 4:2:2 / 4:2:0 subsampling, Annex-K quantization
  tables scaled by the libjpeg quality curve, Annex-K Huffman tables
  (emitted in DHT, so decode never relies on remembered constants),
  optional restart interval (baseline).  Progressive and baseline
  encodings of the same image DECODE BIT-IDENTICALLY (same quantized
  coefficients through two entropy layouts — pinned in tests).

Performance notes (this runs inside ``map_batches`` actor pools —
``stages/media.py``): the DCT / quantization / color transforms are fully
vectorized over all 8x8 blocks at once (one ``einsum`` per plane); entropy
coding is inherently sequential *within* a restart segment (each Huffman
code's bit position depends on every previous symbol), so the encoder
gathers per-symbol (code, nbits) pairs with numpy RLE per block and packs
the bitstream in ONE vectorized pass (repeat/cumsum bit expansion +
``packbits``), and the decoder walks symbols with an O(1) 16-bit LUT per
table.  At scale, parallelism comes from images-per-batch across actors,
not intra-image threads — same posture as libjpeg.

No code is derived from libjpeg/PIL; the tables below are published in
ITU-T T.81 Annex K (public spec).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants: zigzag, Annex-K quantization + Huffman tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 / K.2 base quantization tables (natural row order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 Huffman specs: (bits[1..16] counts, values)
HUFF_DC_LUMA = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)
HUFF_AC_CHROMA = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)

# orthonormal 8-point DCT-II matrix: IDCT(F) = C.T @ F @ C
_k = np.arange(8)
_DCT = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * 0.5
_DCT[0, :] = np.sqrt(1 / 8.0)


def _canonical_codes(bits, vals):
    """Canonical Huffman assignment (T.81 C.2): per-symbol (code, length)."""
    lengths = np.repeat(np.arange(1, 17), bits[1:17]).astype(np.int64)
    codes = np.zeros(len(vals), dtype=np.int64)
    code = 0
    prev_len = 0
    for i, ln in enumerate(lengths):
        code <<= int(ln - prev_len)
        prev_len = ln
        codes[i] = code
        code += 1
    by_symbol_code = np.zeros(256, dtype=np.int64)
    by_symbol_len = np.zeros(256, dtype=np.int64)
    by_symbol_code[np.asarray(vals)] = codes
    by_symbol_len[np.asarray(vals)] = lengths
    return by_symbol_code, by_symbol_len


def _decode_lut(bits, vals):
    """16-bit peek LUT: index = next 16 bits -> (symbol, code length)."""
    lengths = np.repeat(np.arange(1, 17), bits[1:17]).astype(np.int64)
    sym_lut = np.full(1 << 16, -1, dtype=np.int16)
    len_lut = np.zeros(1 << 16, dtype=np.int8)
    code = 0
    prev_len = 0
    for sym, ln in zip(vals, lengths):
        code <<= int(ln - prev_len)
        prev_len = int(ln)
        lo = code << (16 - prev_len)
        hi = lo + (1 << (16 - prev_len))
        sym_lut[lo:hi] = sym
        len_lut[lo:hi] = prev_len
        code += 1
    return sym_lut, len_lut


def _quality_tables(quality):
    """libjpeg quality curve over the Annex-K base tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tabs = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        tabs.append(np.clip(t, 1, 255).astype(np.int64))
    return tabs


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _plane_blocks(plane):
    """(H, W) float plane, H/W multiples of 8 -> (nb, 8, 8) raster order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _fdct_quant(plane, qtab):
    """All-blocks FDCT + quantize + zigzag: (nb, 64) int32."""
    blocks = _plane_blocks(plane.astype(np.float64) - 128.0)
    coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT, optimize=True)
    qz = np.round(coef.reshape(-1, 64) / qtab[None, :].astype(np.float64))
    return qz[:, ZIGZAG].astype(np.int32)


def _bitlen(v):
    """Magnitude category: number of bits to represent |v| (0 for 0)."""
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block_symbols(zz, pred, dc_code, dc_len, ac_code, ac_len,
                          out_codes, out_lens):
    """One block's Huffman symbols + amplitude bits appended to out lists.

    Returns the new DC predictor.  Numpy RLE over the (at most 63)
    nonzero AC positions; the Python loop is over *nonzeros*, which for
    quantized natural images is short.
    """
    dc = int(zz[0])
    diff = dc - pred
    size = _bitlen(diff)
    out_codes.append(dc_code[size])
    out_lens.append(dc_len[size])
    if size:
        amp = diff if diff > 0 else diff + (1 << size) - 1
        out_codes.append(amp)
        out_lens.append(size)
    ac = zz[1:]
    nz = np.flatnonzero(ac)
    if len(nz) == 0:
        out_codes.append(ac_code[0x00])      # EOB
        out_lens.append(ac_len[0x00])
        return dc
    runs = np.diff(np.concatenate(([-1], nz))) - 1
    vals = ac[nz]
    for run, v in zip(runs.tolist(), vals.tolist()):
        while run >= 16:
            out_codes.append(ac_code[0xF0])  # ZRL
            out_lens.append(ac_len[0xF0])
            run -= 16
        size = _bitlen(v)
        sym = (run << 4) | size
        out_codes.append(ac_code[sym])
        out_lens.append(ac_len[sym])
        amp = v if v > 0 else v + (1 << size) - 1
        out_codes.append(amp)
        out_lens.append(size)
    if nz[-1] != 62:
        out_codes.append(ac_code[0x00])
        out_lens.append(ac_len[0x00])
    return dc


def _pack_bits(codes, lens):
    """(code, nbits) arrays -> stuffed JPEG entropy bytes (1-padded tail).

    Fully vectorized: repeat/cumsum expands each code into its bits, then
    ``packbits`` + 0xFF->0xFF00 stuffing.
    """
    codes = np.asarray(codes, dtype=np.int64)
    lens = np.asarray(lens, dtype=np.int64)
    keep = lens > 0
    codes, lens = codes[keep], lens[keep]
    total = int(lens.sum())
    if total == 0:
        return b""
    idx = np.repeat(np.arange(len(codes)), lens)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    within = np.arange(total) - starts[idx]
    bits = (codes[idx] >> (lens[idx] - 1 - within)) & 1
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, dtype=np.int64)])
    raw = np.packbits(bits.astype(np.uint8))
    # byte stuffing: every 0xFF is followed by 0x00
    is_ff = raw == 0xFF
    n_ff = int(is_ff.sum())
    if n_ff == 0:
        return raw.tobytes()
    out = np.zeros(len(raw) + n_ff, dtype=np.uint8)
    # each byte shifts right by the number of 0xFFs strictly before it;
    # the stuffed 0x00 lands at the (already-zero) slot after each 0xFF
    pos = np.arange(len(raw)) + np.cumsum(is_ff) - is_ff
    out[pos] = raw
    return out.tobytes()


def _rgb_to_ycbcr(img):
    m = img.astype(np.float64)
    r, g, b = m[..., 0], m[..., 1], m[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _pad_edge(plane, mh, mw):
    h, w = plane.shape
    ph, pw = (-h) % mh, (-w) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _prep_components(img, quality, subsample):
    """Shared encoder front half: color transform, subsampling, padding,
    FDCT+quantize. Returns (gray, h, w, comps, zz, grids, mcw, mch,
    qz_luma, qz_chroma) — comps as (name, h_samp, v_samp, qid)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qluma, qchroma = _quality_tables(quality)
    qz_luma, qz_chroma = qluma[ZIGZAG], qchroma[ZIGZAG]

    if gray:
        comps = [("L", 1, 1, 0)]
        planes = {"L": _pad_edge(img.astype(np.float64), 8, 8)}
    else:
        y, cb, cr = _rgb_to_ycbcr(img)
        if subsample == "4:2:0":
            y = _pad_edge(y, 16, 16)
            cbp = _pad_edge(cb, 16, 16)
            crp = _pad_edge(cr, 16, 16)
            # 2x2 box mean
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
            comps = [("Y", 2, 2, 0), ("Cb", 1, 1, 1), ("Cr", 1, 1, 1)]
        elif subsample == "4:2:2":
            y = _pad_edge(y, 8, 16)
            cbp = _pad_edge(cb, 8, 16)
            crp = _pad_edge(cr, 8, 16)
            # 1x2 box mean (horizontal only)
            cb = cbp.reshape(cbp.shape[0], cbp.shape[1] // 2, 2).mean(2)
            cr = crp.reshape(crp.shape[0], crp.shape[1] // 2, 2).mean(2)
            comps = [("Y", 2, 1, 0), ("Cb", 1, 1, 1), ("Cr", 1, 1, 1)]
        elif subsample == "4:4:4":
            y = _pad_edge(y, 8, 8)
            cb = _pad_edge(cb, 8, 8)
            cr = _pad_edge(cr, 8, 8)
            comps = [("Y", 1, 1, 0), ("Cb", 1, 1, 1), ("Cr", 1, 1, 1)]
        else:
            raise ValueError("subsample must be '4:2:0', '4:2:2' or '4:4:4'")
        planes = {"Y": y, "Cb": cb, "Cr": cr}

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    # quantized zigzag coefficients per component, block raster order
    zz = {}
    for name, _, _, qid in comps:
        zz[name] = _fdct_quant(planes[name], qluma if qid == 0 else qchroma)

    mcw = (w + 8 * hmax - 1) // (8 * hmax)
    mch = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component block index grids (block raster coords within plane)
    grids = {}
    for name, ch, cv, _ in comps:
        grids[name] = planes[name].shape[1] // 8

    return gray, h, w, comps, zz, grids, mcw, mch, qz_luma, qz_chroma


def _emit_headers(gray, h, w, comps, qz_luma, qz_chroma, sof_marker):
    """SOI + APP0 + DQT(s) + SOF + DHT(s) shared by both encoders."""
    out = [b"\xff\xd8"]  # SOI
    out.append(b"\xff\xe0" + struct.pack(">H", 16)
               + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out.append(b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
               + bytes(qz_luma.astype(np.uint8)))
    if not gray:
        out.append(b"\xff\xdb" + struct.pack(">H", 67) + b"\x01"
                   + bytes(qz_chroma.astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i, (name, ch, cv, qid) in enumerate(comps):
        sof += struct.pack(">BBB", i + 1, (ch << 4) | cv, qid)
    out.append(sof_marker + struct.pack(">H", 2 + len(sof)) + sof)
    hts = [(0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_LUMA)]
    if not gray:
        hts += [(0x01, HUFF_DC_CHROMA), (0x11, HUFF_AC_CHROMA)]
    for tc_th, (bits, vals) in hts:
        body = bytes([tc_th]) + bytes(bits[1:17]) + bytes(vals)
        out.append(b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body)
    return out


def encode_jpeg(img, quality=90, subsample="4:2:0", restart_interval=0):
    """(h, w, 3) RGB or (h, w) grayscale uint8 -> baseline JPEG bytes."""
    (gray, h, w, comps, zz, grids, mcw, mch,
     qz_luma, qz_chroma) = _prep_components(img, quality, subsample)

    # Huffman code tables (symbol -> code/len)
    dc0 = _canonical_codes(*HUFF_DC_LUMA)
    ac0 = _canonical_codes(*HUFF_AC_LUMA)
    dc1 = _canonical_codes(*HUFF_DC_CHROMA)
    ac1 = _canonical_codes(*HUFF_AC_CHROMA)

    preds = {name: 0 for name, *_ in comps}
    segments = []           # list of packed entropy segments
    codes, lens = [], []
    mcu_count = 0
    for my in range(mch):
        for mx in range(mcw):
            for name, ch, cv, qid in comps:
                pb_w = grids[name]
                tabs = (dc0, ac0) if qid == 0 else (dc1, ac1)
                for by in range(cv):
                    for bx in range(ch):
                        bi = (my * cv + by) * pb_w + (mx * ch + bx)
                        preds[name] = _encode_block_symbols(
                            zz[name][bi], preds[name],
                            tabs[0][0], tabs[0][1], tabs[1][0], tabs[1][1],
                            codes, lens)
            mcu_count += 1
            if restart_interval and mcu_count % restart_interval == 0:
                segments.append(_pack_bits(codes, lens))
                codes, lens = [], []
                preds = {name: 0 for name, *_ in comps}
    segments.append(_pack_bits(codes, lens))

    # ---- marker segments ----
    out = _emit_headers(gray, h, w, comps, qz_luma, qz_chroma, b"\xff\xc0")
    ncomp = 1 if gray else 3
    if restart_interval:
        out.append(b"\xff\xdd" + struct.pack(">HH", 4, restart_interval))
    # SOS
    sos = bytes([ncomp])
    for i, (name, ch, cv, qid) in enumerate(comps):
        sos += bytes([i + 1, 0x00 if qid == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out.append(b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos)
    for i, seg in enumerate(segments):
        if i:
            out.append(bytes([0xFF, 0xD0 + ((i - 1) % 8)]))
        out.append(seg)
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


# ---------------------------------------------------------------------------
# progressive encoder (SOF2) — spectral selection + successive approximation
# ---------------------------------------------------------------------------

def _sos_header(scan_comps, stabs, ss, se, ah, al):
    body = bytes([len(scan_comps)])
    for cid in scan_comps:
        body += bytes([cid, stabs[cid]])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def encode_jpeg_progressive(img, quality=90, subsample="4:2:0"):
    """(h, w, 3) RGB / (h, w) gray uint8 -> progressive (SOF2) JPEG bytes.

    Scan script (exercises every progressive decode path):
      1. DC first, interleaved, Al=1
      2. DC refinement, Ah=1 -> Al=0
      3. per component: AC first 1..5, Al=1   (spectral band split)
      4. per component: AC first 6..63, Al=1
      5. per component: AC refinement 1..63, Ah=1 -> Al=0

    End-of-band runs are capped at ONE block (plain EOB0) so the
    Annex-K Huffman tables suffice — larger EOBn symbols are not in
    Annex K. Decoded output is bit-identical to the baseline encoding
    of the same image (same quantized coefficients; asserted in
    tests/test_jpeg.py)."""
    (gray, h, w, comps, zz, grids, mcw, mch,
     qz_luma, qz_chroma) = _prep_components(img, quality, subsample)
    dc0 = _canonical_codes(*HUFF_DC_LUMA)
    ac0 = _canonical_codes(*HUFF_AC_LUMA)
    dc1 = _canonical_codes(*HUFF_DC_CHROMA)
    ac1 = _canonical_codes(*HUFF_AC_CHROMA)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    out = _emit_headers(gray, h, w, comps, qz_luma, qz_chroma, b"\xff\xc2")

    # ---- scan 1: DC first (interleaved), Al=1 -------------------------
    AL_DC = 1
    codes, lens = [], []
    preds = {name: 0 for name, *_ in comps}
    for my in range(mch):
        for mx in range(mcw):
            for name, ch, cv, qid in comps:
                dct = dc0 if qid == 0 else dc1
                pb_w = grids[name]
                for by in range(cv):
                    for bx in range(ch):
                        bi = (my * cv + by) * pb_w + (mx * ch + bx)
                        dc = int(zz[name][bi][0]) >> AL_DC
                        diff = dc - preds[name]
                        preds[name] = dc
                        size = _bitlen(diff)
                        codes.append(dct[0][size])
                        lens.append(dct[1][size])
                        if size:
                            amp = diff if diff > 0 else diff + (1 << size) - 1
                            codes.append(amp)
                            lens.append(size)
    stabs_dc = {i + 1: ((0 if c[3] == 0 else 1) << 4) | 0
                for i, c in enumerate(comps)}
    out.append(_sos_header(list(range(1, len(comps) + 1)), stabs_dc,
                           0, 0, 0, AL_DC))
    out.append(_pack_bits(codes, lens))

    # ---- scan 2: DC refinement, Ah=1 Al=0 (one raw bit per block) -----
    codes, lens = [], []
    for my in range(mch):
        for mx in range(mcw):
            for name, ch, cv, qid in comps:
                pb_w = grids[name]
                for by in range(cv):
                    for bx in range(ch):
                        bi = (my * cv + by) * pb_w + (mx * ch + bx)
                        codes.append(int(zz[name][bi][0]) & 1)
                        lens.append(1)
    out.append(_sos_header(list(range(1, len(comps) + 1)),
                           {i + 1: 0 for i in range(len(comps))},
                           0, 0, 1, 0))
    out.append(_pack_bits(codes, lens))

    # per-component non-interleaved block order (T.81 ceil dims)
    def _comp_blocks(ci):
        name, ch, cv, qid = comps[ci]
        cw = (w * ch + hmax - 1) // hmax
        chh = (h * cv + vmax - 1) // vmax
        bw_s = (cw + 7) // 8
        bh_s = (chh + 7) // 8
        pb_w = grids[name]
        return [by * pb_w + bx for by in range(bh_s) for bx in range(bw_s)]

    AL_AC = 1
    # ---- scans 3+4: AC first per component, bands 1..5 and 6..63 ------
    for ss, se in ((1, 5), (6, 63)):
        for ci, (name, ch, cv, qid) in enumerate(comps):
            act = ac0 if qid == 0 else ac1
            codes, lens = [], []
            for bi in _comp_blocks(ci):
                blk = zz[name][bi]
                # point-transformed magnitudes, sign preserved
                vals = [(int(v) >> AL_AC if v >= 0 else -((-int(v)) >> AL_AC))
                        for v in blk[ss:se + 1]]
                nz = [k for k, v in enumerate(vals) if v]
                run = 0
                last = -1
                for k in nz:
                    run = k - last - 1
                    last = k
                    while run >= 16:
                        codes.append(act[0][0xF0])
                        lens.append(act[1][0xF0])
                        run -= 16
                    v = vals[k]
                    size = _bitlen(v)
                    codes.append(act[0][(run << 4) | size])
                    lens.append(act[1][(run << 4) | size])
                    amp = v if v > 0 else v + (1 << size) - 1
                    codes.append(amp)
                    lens.append(size)
                if last < se - ss:       # EOB0 (EOBRUN capped at 1 block)
                    codes.append(act[0][0x00])
                    lens.append(act[1][0x00])
            out.append(_sos_header([ci + 1], {ci + 1: qid}, ss, se, 0, AL_AC))
            out.append(_pack_bits(codes, lens))

    # ---- scan 5: AC refinement per component, Ah=1 Al=0 ----------------
    for ci, (name, ch, cv, qid) in enumerate(comps):
        act = ac0 if qid == 0 else ac1
        codes, lens = [], []
        for bi in _comp_blocks(ci):
            blk = zz[name][bi]
            absv = [abs(int(v)) for v in blk[1:64]]
            sign = [1 if int(v) > 0 else 0 for v in blk[1:64]]
            # last NEWLY-significant position gates ZRL emission: trailing
            # zero runs are absorbed into EOB, never spelled as ZRL
            eob_idx = max((k for k, t in enumerate(absv) if t == 1),
                          default=-1)
            run = 0
            br_c, br_l = [], []       # buffered correction bits
            for k in range(63):
                t = absv[k]
                if t == 0:
                    run += 1
                    continue
                # flush pending ZRLs at EVERY nonzero position (T.81
                # G.1.2.3 bit order: ZRL, then the correction bits of the
                # positions its walk passes — the decoder's skip loop
                # reads them interleaved in k-order)
                while run > 15 and k <= eob_idx:
                    codes.append(act[0][0xF0])
                    lens.append(act[1][0xF0])
                    codes.extend(br_c)
                    lens.extend(br_l)
                    br_c, br_l = [], []
                    run -= 16
                if t > 1:
                    # previously significant: correction bit, run-transparent
                    br_c.append(t & 1)
                    br_l.append(1)
                    continue
                # newly significant (|coef| == 1)
                codes.append(act[0][(run << 4) | 1])
                lens.append(act[1][(run << 4) | 1])
                codes.append(sign[k])
                lens.append(1)
                codes.extend(br_c)
                lens.extend(br_l)
                br_c, br_l = [], []
                run = 0
            if run > 0 or br_c:
                codes.append(act[0][0x00])    # EOB0
                lens.append(act[1][0x00])
                codes.extend(br_c)
                lens.extend(br_l)
        out.append(_sos_header([ci + 1], {ci + 1: qid}, 1, 63, 1, 0))
        out.append(_pack_bits(codes, lens))

    out.append(b"\xff\xd9")
    return b"".join(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _BitReader:
    __slots__ = ("buf", "pos", "limit")

    def __init__(self, buf):
        self.buf = buf + b"\x00\x00\x00\x00"
        self.pos = 0
        self.limit = 8 * len(buf)  # consuming past the real bits = truncation

    def peek16(self):
        byte = self.pos >> 3
        off = self.pos & 7
        word = int.from_bytes(self.buf[byte:byte + 4], "big")
        return (word >> (16 - off)) & 0xFFFF

    def read(self, n):
        if n == 0:
            return 0
        byte = self.pos >> 3
        off = self.pos & 7
        word = int.from_bytes(self.buf[byte:byte + 4], "big")
        self.pos += n
        if self.pos > self.limit:
            raise ValueError("truncated entropy-coded segment")
        return (word >> (32 - off - n)) & ((1 << n) - 1)

    def skip(self, n):
        self.pos += n
        if self.pos > self.limit:
            raise ValueError("truncated entropy-coded segment")


def _extend(bits, size):
    """T.81 EXTEND: amplitude bits -> signed value."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _destuff(data):
    """Remove the 0x00 after each 0xFF in entropy-coded data."""
    arr = np.frombuffer(data, dtype=np.uint8)
    ff0 = np.flatnonzero((arr[:-1] == 0xFF) & (arr[1:] == 0x00)) + 1
    if len(ff0) == 0:
        return data
    return np.delete(arr, ff0).tobytes()


def decode_jpeg(data):
    """JPEG bytes -> (h, w, 3) RGB or (h, w) grayscale uint8.

    Baseline sequential (SOF0/SOF1) and progressive (SOF2: spectral
    selection + successive approximation, T.81 G.2) — every scan
    accumulates into one coefficient store, reconstructed at EOI."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtabs = {}
    luts = {}
    frame = None
    restart = 0
    store = None
    any_scan = False
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            raise ValueError("marker sync lost at byte %d" % pos)
        while pos + 1 < n and data[pos + 1] == 0xFF:  # fill bytes (B.1.1.2)
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        body = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0x0F
                bpos += 1
                if pq == 0:
                    tab = np.frombuffer(body[bpos:bpos + 64], np.uint8)
                    bpos += 64
                else:
                    tab = np.frombuffer(body[bpos:bpos + 128], ">u2")
                    bpos += 128
                qtabs[tq] = tab.astype(np.int64)[UNZIGZAG]
        elif marker == 0xC4:  # DHT
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0x0F
                bits = [0] + list(body[bpos + 1:bpos + 17])
                nv = sum(bits)
                vals = list(body[bpos + 17:bpos + 17 + nv])
                luts[(tc, th)] = _decode_lut(bits, vals)
                bpos += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progr.
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcw = (w + 8 * hmax - 1) // (8 * hmax)
            mch = (h + 8 * vmax - 1) // (8 * vmax)
            frame = {"h": h, "w": w, "comps": comps,
                     "hmax": hmax, "vmax": vmax, "mcw": mcw, "mch": mch,
                     "progressive": marker == 0xC2}
            store = {c["id"]: np.zeros((mch * c["v"] * mcw * c["h"], 64),
                                       dtype=np.int32) for c in comps}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "non-baseline JPEG (arithmetic/lossless/hierarchical)")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_cids = []
            stabs = {}
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                scan_cids.append(cs)
                stabs[cs] = (tdta >> 4, tdta & 0x0F)
            ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            # entropy-coded data runs until the next non-RST marker
            p = pos
            while p < n - 1:
                if data[p] == 0xFF and data[p + 1] not in (0x00,) \
                        and not (0xD0 <= data[p + 1] <= 0xD7):
                    break
                p += 1
            _decode_scan_into(data[pos:p], frame, store, scan_cids, stabs,
                              luts, restart, ss, se, ah, al)
            any_scan = True
            pos = p
        # APPn / COM / others: skipped via seglen
    if frame is None or not any_scan:
        raise ValueError("truncated JPEG (no frame/scan)")
    return _reconstruct(frame, store, qtabs)


def _huff(rd, sym_lut, len_lut, what):
    pk = rd.peek16()
    s = int(sym_lut[pk])
    if s < 0:
        raise ValueError("bad Huffman code (%s)" % what)
    rd.skip(int(len_lut[pk]))
    return s


def _dc_first(rd, blk, preds, cid, dc_lut, al):
    s = _huff(rd, dc_lut[0], dc_lut[1], "DC")
    preds[cid] += _extend(rd.read(s), s)
    blk[0] = preds[cid] << al


def _ac_first(rd, blk, ac_lut, ss, se, al, eobrun):
    """AC first scan (also the baseline AC layout at ss=1 se=63 al=0)."""
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        sym = _huff(rd, ac_lut[0], ac_lut[1], "AC")
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:           # ZRL
                k += 16
                continue
            eobrun[0] = (1 << r) - 1  # EOBn: this block ends, r more follow
            if r:
                eobrun[0] += rd.read(r)
            return
        k += r
        if k > se:
            raise ValueError("AC index overflow")
        blk[k] = _extend(rd.read(s), s) << al
        k += 1


def _ac_refine(rd, blk, ac_lut, ss, se, al, eobrun):
    """AC successive-approximation refinement (T.81 G.1.2.3)."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun[0] == 0:
        while k <= se:
            sym = _huff(rd, ac_lut[0], ac_lut[1], "AC")
            r, s = sym >> 4, sym & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun[0] = 1 << r   # includes the current block
                    if r:
                        eobrun[0] += rd.read(r)
                    break
                # ZRL: walk 16 zero-history positions below
            else:
                newval = p1 if rd.read(1) else m1
            # walk: skip r zero-history positions, correcting nonzero ones
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if rd.read(1) and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if s and k <= se:
                blk[k] = newval
            k += 1
    if eobrun[0] > 0:
        # correction bits for remaining nonzero-history positions
        while k <= se:
            c = int(blk[k])
            if c != 0 and rd.read(1) and (c & p1) == 0:
                blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun[0] -= 1


def _decode_scan_into(raw, frame, store, scan_cids, stabs, luts, restart,
                      ss, se, ah, al):
    """Decode one scan's entropy data into the coefficient store."""
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    mcw, mch = frame["mcw"], frame["mch"]
    by_id = {c["id"]: c for c in frame["comps"]}
    comps = [by_id[cid] for cid in scan_cids]
    progressive = frame["progressive"]

    # split entropy data on restart markers, destuff each segment
    if restart:
        segs = []
        p0 = 0
        arr = np.frombuffer(raw, dtype=np.uint8)
        cand = np.flatnonzero(arr[:-1] == 0xFF)
        for i in cand:
            if 0xD0 <= arr[i + 1] <= 0xD7:
                segs.append(raw[p0:i])
                p0 = i + 2
        segs.append(raw[p0:])
    else:
        segs = [raw]
    readers = [_BitReader(_destuff(s)) for s in segs]

    # MCU structure: interleaved for multi-component scans; a
    # single-component scan is non-interleaved — MCU = one block over the
    # component's OWN ceil-dimension grid (T.81 A.2.2), mapped into the
    # interleaved store layout
    if len(comps) > 1:
        mcus = []
        for my in range(mch):
            for mx in range(mcw):
                blocks = []
                for c in comps:
                    bw = mcw * c["h"]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blocks.append((c["id"],
                                           (my * c["v"] + by) * bw
                                           + (mx * c["h"] + bx)))
                mcus.append(blocks)
    else:
        c = comps[0]
        bw_s = ((w * c["h"] + hmax - 1) // hmax + 7) // 8
        bh_s = ((h * c["v"] + vmax - 1) // vmax + 7) // 8
        bw = mcw * c["h"]
        mcus = [[(c["id"], by * bw + bx)]
                for by in range(bh_s) for bx in range(bw_s)]

    needs_dc = not progressive or (ss == 0 and ah == 0)
    needs_ac = not progressive or ss > 0
    dc_luts = {}
    ac_luts = {}
    for c in comps:
        td, ta = stabs[c["id"]]
        if needs_dc:
            if (0, td) not in luts:
                raise ValueError("missing DC Huffman table %d" % td)
            dc_luts[c["id"]] = luts[(0, td)]
        if needs_ac:
            if (1, ta) not in luts:
                raise ValueError("missing AC Huffman table %d" % ta)
            ac_luts[c["id"]] = luts[(1, ta)]

    preds = {c["id"]: 0 for c in comps}
    eobrun = [0]
    seg_i = 0
    rd = readers[0]
    for mcu_count, blocks in enumerate(mcus):
        if restart and mcu_count and mcu_count % restart == 0:
            seg_i += 1
            rd = readers[seg_i]
            preds = {c["id"]: 0 for c in comps}
            eobrun = [0]
        for cid, bi in blocks:
            blk = store[cid][bi]
            if not progressive:
                _dc_first(rd, blk, preds, cid, dc_luts[cid], 0)
                _ac_first(rd, blk, ac_luts[cid], 1, 63, 0, eobrun)
            elif ss == 0 and ah == 0:
                _dc_first(rd, blk, preds, cid, dc_luts[cid], al)
            elif ss == 0:
                blk[0] = int(blk[0]) | (rd.read(1) << al)
            elif ah == 0:
                _ac_first(rd, blk, ac_luts[cid], ss, se, al, eobrun)
            else:
                _ac_refine(rd, blk, ac_luts[cid], ss, se, al, eobrun)


def _reconstruct(frame, store, qtabs):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    mcw, mch = frame["mcw"], frame["mch"]

    # dequantize + IDCT per component (vectorized over all blocks)
    planes = {}
    for c in comps:
        q = qtabs[c["tq"]]
        zz = store[c["id"]].astype(np.float64)
        nat = np.zeros_like(zz)
        nat[:, ZIGZAG] = zz          # inverse zigzag
        nat *= q[None, :]
        blocks = nat.reshape(-1, 8, 8)
        pix = np.einsum("ji,njk,kl->nil", _DCT, blocks, _DCT, optimize=True)
        bw = mcw * c["h"]
        bh = mch * c["v"]
        plane = (pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw * 8)) + 128.0
        # upsample to full MCU grid resolution by pixel replication
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes[c["id"]] = plane[:h, :w]

    if len(comps) == 1:
        return np.clip(np.round(planes[comps[0]["id"]]), 0, 255).astype(np.uint8)
    y = planes[comps[0]["id"]]
    cb = planes[comps[1]["id"]] - 128.0
    cr = planes[comps[2]["id"]] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
