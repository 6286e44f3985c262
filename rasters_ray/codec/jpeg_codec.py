"""Baseline sequential JPEG (ITU-T T.81 / JFIF) — pure numpy, no PIL.

Parity target: the reference's ``to_geojpeg`` path (raster.py:1791-1865
renders through PIL). PIL is absent in this container, so this module
implements the baseline subset of the PUBLIC JPEG spec directly:

- ``encode``: grayscale uint8 (h,w) or RGB uint8 (h,w,3), quality 1-100
  (IJG scaling of the Annex-K example quantization tables), Annex-K
  standard Huffman tables, 4:4:4 or 4:2:0 chroma subsampling. The DCT,
  quantization, token generation AND entropy bit-packing are all
  vectorized (the bitstream is assembled with one cumsum/packbits pass —
  no per-coefficient Python loop).
- ``decode``: baseline DCT (SOF0/1, single- or multi-scan, interleaved
  or per-component) AND progressive (SOF2: spectral selection +
  successive approximation per T.81 Annex G — DC/AC first and
  refinement scans, EOB runs), 8-bit, grayscale or YCbCr with any
  1-2/1-2 sampling factors, multiple DQT/DHT segments, restart
  intervals in any scan. Arithmetic coding, lossless/hierarchical SOFs
  and 12-bit raise NotImplementedError. The per-symbol Huffman loop is
  sequential Python (unavoidable for a data-dependent prefix code) but
  everything after — dequantize, IDCT, upsample, color convert — is one
  vectorized pass over all blocks; decode runs inside actor-pool
  map_batches stages so the parallelism axis is images, not pixels.
  ``encode(progressive=True)`` emits an SOF2 stream (interleaved DC
  scan + per-component spectral/successive AC scans) that decodes
  bit-identically to the baseline stream at the same quality.

Round-trip PSNR at quality 90 is >= 30 dB on natural gradients (tested);
this is a LOSSY codec — the engine's lossless paths stay npy/png.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# ---------------------------------------------------------------- tables
# Annex K.1 example quantization tables (spec, public)
_QT_LUM = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.int32)
_QT_CHR = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int32)

# Annex K.3 standard Huffman tables: (bits[1..16], values)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# zigzag: _ZIG[i] = raster index of the i-th zigzag coefficient
_ZIG = np.array(
    [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
     12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
     35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
     58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# orthonormal 8x8 DCT-II matrix
_K = np.arange(8)
_D = np.cos((2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16) * np.sqrt(0.25)
_D[0] *= np.sqrt(0.5)


def _quality_tables(quality: int) -> Tuple[np.ndarray, np.ndarray]:
    q = int(np.clip(quality, 1, 100))
    s = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QT_LUM, _QT_CHR):
        out.append(np.clip((base * s + 50) // 100, 1, 255).astype(np.int32))
    return out[0], out[1]


def _build_codes(bits: List[int], values: List[int]) -> Dict[int, Tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    out: Dict[int, Tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _category(v: np.ndarray) -> np.ndarray:
    """Number of magnitude bits (0 for value 0)."""
    a = np.abs(v.astype(np.int64))
    cat = np.zeros(a.shape, dtype=np.int64)
    nz = a > 0
    cat[nz] = np.floor(np.log2(a[nz])).astype(np.int64) + 1
    return cat


def _mag_bits(v: np.ndarray, cat: np.ndarray) -> np.ndarray:
    """JPEG magnitude encoding: negatives stored as v + 2^cat - 1."""
    v = v.astype(np.int64)
    return np.where(v >= 0, v, v + (1 << cat) - 1)


def _pack_bits(codes: np.ndarray, lens: np.ndarray) -> bytes:
    """Vectorized MSB-first bit packing + 0xFF byte stuffing + EOB pad."""
    lens = lens.astype(np.int64)
    keep = lens > 0
    codes, lens = codes[keep].astype(np.int64), lens[keep]
    total = int(lens.sum())
    starts = np.cumsum(lens) - lens
    tok = np.repeat(np.arange(len(lens)), lens)
    within = np.arange(total) - starts[tok]
    bits = (codes[tok] >> (lens[tok] - 1 - within)) & 1
    pad = (8 - total % 8) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, dtype=bits.dtype)])  # 1-fill
    raw = np.packbits(bits.astype(np.uint8))
    # byte stuffing: 0xFF -> 0xFF 0x00
    ff = raw == 0xFF
    if ff.any():
        reps = np.where(ff, 2, 1)
        out = np.zeros(int(reps.sum()), dtype=np.uint8)
        out[np.cumsum(reps) - reps] = raw
        return out.tobytes()
    return raw.tobytes()


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H,W) padded to /8 by edge replication -> (n, 8, 8) raster order."""
    h, w = plane.shape
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    if (H, W) != (h, w):
        plane = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
    return (
        plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _zigzag_quant(blocks: np.ndarray, qt_zz: np.ndarray) -> np.ndarray:
    """(n,8,8) -> (n,64) quantized coefficients in ZIGZAG order.
    ``qt_zz`` is the quant table in zigzag order (as written to DQT)."""
    f = blocks.astype(np.float64) - 128.0
    coef = np.einsum("ij,njk,lk->nil", _D, f, _D).reshape(-1, 64)
    return np.rint(coef[:, _ZIG] / qt_zz[None, :]).astype(np.int32)


def _channel_tokens(q: np.ndarray, slot: np.ndarray, dc_tbl, ac_tbl,
                    dc_reset: np.ndarray = None):
    """Tokens for one component's blocks -> (sortkey, code, len) arrays.

    ``q`` is (n,64) zigzag coefficients in SCAN ORDER for this component
    (DC prediction runs down axis 0); ``slot`` gives each block's global
    position in the interleaved MCU scan. Sort key packs
    (slot, zigzagpos, rank) so one argsort produces the exact bitstream
    order across components. Fully vectorized."""
    n = q.shape[0]
    dc = q[:, 0].astype(np.int64)
    prev = np.concatenate([[0], dc[:-1]])
    if dc_reset is not None:
        prev = np.where(dc_reset, 0, prev)  # DC predictor resets at RSTn
    diff = dc - prev
    cat = _category(diff)
    keys, codes, lens = [], [], []

    def emit(slots, pos, rank, code, ln):
        # rank < 16 always (max 2*3+3 = 9: ZRL count <= 62//16 = 3)
        keys.append(slots.astype(np.int64) * (65 * 16) + pos * 16 + rank)
        codes.append(np.asarray(code, dtype=np.int64))
        lens.append(np.asarray(ln, dtype=np.int64))

    hc = np.array([dc_tbl[s][0] for s in range(12)], dtype=np.int64)
    hl = np.array([dc_tbl[s][1] for s in range(12)], dtype=np.int64)
    emit(slot, np.zeros(n, np.int64), np.zeros(n, np.int64), hc[cat], hl[cat])
    emit(slot, np.zeros(n, np.int64), np.ones(n, np.int64),
         _mag_bits(diff, cat), cat)

    ac = q[:, 1:]
    nz_b, nz_p = np.nonzero(ac)
    vals = ac[nz_b, nz_p].astype(np.int64)
    first = np.r_[True, nz_b[1:] != nz_b[:-1]] if len(nz_b) else np.array([], bool)
    prev = np.where(first, -1, np.r_[-1, nz_p[:-1]]) if len(nz_b) else nz_p
    run = nz_p - prev - 1
    nzrl, run16 = run // 16, run % 16
    acat = _category(vals)
    sym = run16 * 16 + acat
    ahc = np.zeros(256, dtype=np.int64)
    ahl = np.zeros(256, dtype=np.int64)
    for s, (c, ln) in ac_tbl.items():
        ahc[s], ahl[s] = c, ln
    pos = nz_p.astype(np.int64) + 1
    # ZRL symbols precede the coefficient: ranks 0..k-1, coeff sym/mag after
    if len(nz_b) and nzrl.max() > 0:
        zr = np.repeat(np.arange(len(nz_b)), nzrl)
        zrank = np.arange(len(zr)) - np.repeat(np.cumsum(nzrl) - nzrl, nzrl)
        emit(slot[nz_b[zr]], pos[zr], zrank,
             np.full(len(zr), ahc[0xF0]), np.full(len(zr), ahl[0xF0]))
    mrank = nzrl  # coefficient comes after its ZRLs
    emit(slot[nz_b], pos, mrank * 2 + 2, ahc[sym], ahl[sym])
    emit(slot[nz_b], pos, mrank * 2 + 3, _mag_bits(vals, acat), acat)
    # EOB unless the last nonzero is coefficient 63
    last_pos = np.full(n, -1, dtype=np.int64)
    if len(nz_b):
        np.maximum.at(last_pos, nz_b, nz_p.astype(np.int64))
    need_eob = last_pos < 62
    eb = np.flatnonzero(need_eob)
    emit(slot[eb], np.full(len(eb), 64, np.int64), np.zeros(len(eb), np.int64),
         np.full(len(eb), ahc[0x00]), np.full(len(eb), ahl[0x00]))
    return (np.concatenate(keys), np.concatenate(codes), np.concatenate(lens))


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dht_payload(tc_th: int, bits: List[int], values: List[int]) -> bytes:
    return bytes([tc_th] + bits + values)


def encode(arr: np.ndarray, quality: int = 85, subsample: bool = False,
           restart_interval: int = 0, progressive: bool = False) -> bytes:
    """uint8 grayscale (h,w) or RGB (h,w,3) -> baseline JFIF bytes.

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (DC predictors reset, each entropy segment
    byte-aligned) — the stream-resync feature robust encoders use.
    ``progressive`` emits an SOF2 multi-scan stream instead (spectral
    selection + successive approximation; same quantized coefficients,
    so it decodes bit-identically to the baseline stream)."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError("jpeg encode expects uint8")
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("expected (h,w) or (h,w,3)")
    if progressive:
        if restart_interval:
            raise ValueError("progressive encode does not take restart_interval")
        return _encode_progressive(a, quality, subsample)
    h, w = a.shape[:2]
    qlum, qchr = _quality_tables(quality)
    dc_l = _build_codes(*_DC_LUM)
    ac_l = _build_codes(*_AC_LUM)
    dc_c = _build_codes(*_DC_CHR)
    ac_c = _build_codes(*_AC_CHR)

    if gray:
        planes = [a.astype(np.float64)]
    else:
        r, g, b = (a[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:  # 4:2:0 box mean
            H2, W2 = -(-h // 2) * 2, -(-w // 2) * 2
            def ds(p):
                p = np.pad(p, ((0, H2 - h), (0, W2 - w)), mode="edge")
                return p.reshape(H2 // 2, 2, W2 // 2, 2).mean(axis=(1, 3))
            cb, cr = ds(cb), ds(cr)
        planes = [y, cb, cr]

    # Annex-K tables above are in natural (raster) order; DQT stores zigzag
    qt_zz = [qlum[_ZIG]] + ([qchr[_ZIG]] if not gray else [])
    comp_q = [0] + ([1, 1] if not gray else [])

    # --- per-component blocks in scan order + global MCU slot indices
    def resets(slot: np.ndarray, spm: int):
        """True where this block's restart segment differs from the
        previous block's (scan order) -> DC predictor reset points."""
        if not restart_interval:
            return None
        seg = (slot // spm) // restart_interval
        return np.concatenate([[False], np.diff(seg) != 0])

    all_tokens = []
    if gray or not subsample:
        ncomp = 1 if gray else 3
        spm = ncomp
        for ci, plane in enumerate(planes):
            bl = _blocks(np.clip(np.rint(plane), 0, 255).astype(np.uint8))
            q = _zigzag_quant(bl, qt_zz[comp_q[ci]].astype(np.float64))
            slot = np.arange(q.shape[0], dtype=np.int64) * ncomp + ci
            tbls = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            all_tokens.append(_channel_tokens(q, slot, *tbls,
                                              dc_reset=resets(slot, spm)))
        hs = [(1, 1)] * ncomp
    else:
        # 4:2:0: MCU = 4 Y blocks + 1 Cb + 1 Cr (6 slots per MCU)
        y, cb, cr = planes
        Hb, Wb = -(-h // 16), -(-w // 16)  # MCUs
        # Y must pad to /16 (2x2 blocks per MCU), not just /8
        y16 = np.pad(y, ((0, Hb * 16 - h), (0, Wb * 16 - w)), mode="edge")
        yb = _blocks(np.clip(np.rint(y16), 0, 255).astype(np.uint8))
        # y blocks are raster over (2Hb, 2Wb); map to MCU-interleaved order
        yi = np.arange(4 * Hb * Wb)
        by, bx = yi // (2 * Wb), yi % (2 * Wb)
        mcu = (by // 2) * Wb + (bx // 2)
        sub = (by % 2) * 2 + (bx % 2)
        slot_y = mcu * 6 + sub
        order = np.argsort(slot_y, kind="stable")  # scan order for DC pred
        qy = _zigzag_quant(yb, qt_zz[0].astype(np.float64))[order]
        spm = 6
        sy = slot_y[order]
        all_tokens.append(_channel_tokens(qy, sy, dc_l, ac_l,
                                          dc_reset=resets(sy, spm)))
        for k, p in ((4, cb), (5, cr)):
            bl = _blocks(np.clip(np.rint(p), 0, 255).astype(np.uint8))
            q = _zigzag_quant(bl, qt_zz[1].astype(np.float64))
            slot = np.arange(q.shape[0], dtype=np.int64) * 6 + k
            all_tokens.append(_channel_tokens(q, slot, dc_c, ac_c,
                                              dc_reset=resets(slot, spm)))
        hs = [(2, 2), (1, 1), (1, 1)]

    keys = np.concatenate([t[0] for t in all_tokens])
    codes = np.concatenate([t[1] for t in all_tokens])
    lens = np.concatenate([t[2] for t in all_tokens])
    o = np.argsort(keys, kind="stable")
    if restart_interval:
        # one byte-aligned entropy segment per restart interval, joined
        # by RST0..7 markers cycling
        seg_of = (keys[o] // (65 * 16) // spm) // restart_interval
        bounds = np.flatnonzero(np.concatenate([[False], np.diff(seg_of) != 0]))
        pieces = []
        start = 0
        cs, ls = codes[o], lens[o]
        for gi, end in enumerate(list(bounds) + [len(cs)]):
            pieces.append(_pack_bits(cs[start:end], ls[start:end]))
            if end != len(cs):
                pieces.append(bytes([0xFF, 0xD0 + gi % 8]))
            start = end
        scan = b"".join(pieces)
    else:
        scan = _pack_bits(codes[o], lens[o])

    # --- headers
    out = [b"\xFF\xD8"]  # SOI
    out.append(_seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    out.append(_seg(0xFFDB, b"\x00" + bytes(qt_zz[0].astype(np.uint8))))
    if not gray:
        out.append(_seg(0xFFDB, b"\x01" + bytes(qt_zz[1].astype(np.uint8))))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, hs[ci][0] * 16 + hs[ci][1], comp_q[ci]])
    out.append(_seg(0xFFC0, sof))
    out.append(_seg(0xFFC4, _dht_payload(0x00, *_DC_LUM)))
    out.append(_seg(0xFFC4, _dht_payload(0x10, *_AC_LUM)))
    if not gray:
        out.append(_seg(0xFFC4, _dht_payload(0x01, *_DC_CHR)))
        out.append(_seg(0xFFC4, _dht_payload(0x11, *_AC_CHR)))
    if restart_interval:
        out.append(_seg(0xFFDD, struct.pack(">H", restart_interval)))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3F\x00"
    out.append(_seg(0xFFDA, sos))
    out.append(scan)
    out.append(b"\xFF\xD9")  # EOI
    return b"".join(out)


# ---------------------------------------------------------------- decoder


class _Bits:
    """MSB-first bit reader over an entropy segment (already unstuffed)."""

    __slots__ = ("d", "n", "acc", "bits", "pos")

    def __init__(self, d: bytes):
        self.d = d
        self.n = len(d)
        self.acc = 0
        self.bits = 0
        self.pos = 0

    def need(self, k: int):
        while self.bits < k:
            b = self.d[self.pos] if self.pos < self.n else 0
            self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.bits += 8

    def peek16(self) -> int:
        self.need(16)
        return (self.acc >> (self.bits - 16)) & 0xFFFF

    def skip(self, k: int):
        self.bits -= k

    def take(self, k: int) -> int:
        if k == 0:
            return 0
        self.need(k)
        v = (self.acc >> (self.bits - k)) & ((1 << k) - 1)
        self.bits -= k
        return v


def _lut(bits: List[int], values: List[int]) -> Tuple[np.ndarray, np.ndarray]:
    """16-bit-lookahead decode table: code -> (symbol, length)."""
    sym = np.zeros(65536, dtype=np.int16)
    ln = np.zeros(65536, dtype=np.int8)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym[lo:hi] = values[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return sym, ln


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _entropy_segments(d: bytes, start: int) -> Tuple[List[bytes], int]:
    """Unstuff one scan's entropy bytes starting at ``start``, splitting
    at RSTn markers.  Returns (segments, pos-of-next-marker) so the
    caller's marker loop resumes at the DHT/SOS/EOI that ends the scan."""
    segments: List[bytes] = []
    cur = bytearray()
    i = start
    n = len(d)
    while i < n:
        b = d[i]
        if b == 0xFF:
            nxt = d[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break
        cur.append(b)
        i += 1
    segments.append(bytes(cur))
    return segments, i


def _block_full(br: _Bits, blk, dc_tbl, ac_tbl, pred: Dict[int, int], cid: int):
    """Baseline full-band block: DC diff + AC run/size to coefficient 63."""
    dsym, dlen = dc_tbl
    asym, alen = ac_tbl
    look = br.peek16()
    s, L = int(dsym[look]), int(dlen[look])
    if L == 0:
        raise ValueError("bad Huffman code (DC)")
    br.skip(L)
    diff = _extend(br.take(s), s) if s else 0
    pred[cid] += diff
    blk[0] = pred[cid]
    k = 1
    while k < 64:
        look = br.peek16()
        s, L = int(asym[look]), int(alen[look])
        if L == 0:
            raise ValueError("bad Huffman code (AC)")
        br.skip(L)
        if s == 0x00:
            break
        if s == 0xF0:
            k += 16
            continue
        k += s >> 4
        cat = s & 0x0F
        if k > 63:
            raise ValueError("AC index overflow")
        blk[k] = _extend(br.take(cat), cat)
        k += 1


def _block_dc_first(br: _Bits, blk, dc_tbl, pred: Dict[int, int], cid: int,
                    al: int):
    """Progressive DC first scan (G.1.2.1): diff of dc >> Al, stored
    << Al."""
    dsym, dlen = dc_tbl
    look = br.peek16()
    s, L = int(dsym[look]), int(dlen[look])
    if L == 0:
        raise ValueError("bad Huffman code (DC)")
    br.skip(L)
    diff = _extend(br.take(s), s) if s else 0
    pred[cid] += diff
    blk[0] = pred[cid] << al


def _block_ac_first(br: _Bits, blk, ac_tbl, ss: int, se: int, al: int,
                    eob: List[int]):
    """Progressive AC first scan (G.1.2.2): band [Ss..Se] with EOB runs;
    values stored << Al."""
    if eob[0] > 0:
        eob[0] -= 1
        return
    asym, alen = ac_tbl
    k = ss
    while k <= se:
        look = br.peek16()
        s, L = int(asym[look]), int(alen[look])
        if L == 0:
            raise ValueError("bad Huffman code (AC)")
        br.skip(L)
        r, sz = s >> 4, s & 0x0F
        if sz == 0:
            if r != 15:
                eob[0] = (1 << r) - 1
                if r:
                    eob[0] += br.take(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC index overflow")
        blk[k] = _extend(br.take(sz), sz) << al
        k += 1


def _block_ac_refine(br: _Bits, blk, ac_tbl, ss: int, se: int, al: int,
                     eob: List[int]):
    """Progressive AC refinement scan (G.1.2.3): correction bits for
    history-nonzero coefficients, new +-1<<Al insertions, EOB runs."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eob[0] == 0:
        asym, alen = ac_tbl
        while k <= se:
            look = br.peek16()
            s, L = int(asym[look]), int(alen[look])
            if L == 0:
                raise ValueError("bad Huffman code (AC)")
            br.skip(L)
            r, sz = s >> 4, s & 0x0F
            val = 0
            if sz == 0:
                if r != 15:
                    eob[0] = 1 << r
                    if r:
                        eob[0] += br.take(r)
                    break  # rest of band: correction-bit sweep below
                # ZRL: r=15 -> skip 16 zero-history coefficients
            else:
                if sz != 1:
                    raise ValueError("invalid AC refinement symbol")
                val = p1 if br.take(1) else m1
            # advance over r zero-history coefficients, reading a
            # correction bit at every nonzero-history one passed
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if br.take(1) and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eob[0] > 0:
        while k <= se:  # in an EOB run: correction bits only
            c = int(blk[k])
            if c != 0:
                if br.take(1) and (c & p1) == 0:
                    blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eob[0] -= 1


def _decode_scan(d: bytes, start: int, scomps, ss: int, se: int, ah: int,
                 al: int, comps, coef, used, hufs, restart: int,
                 mcux: int, mcuy: int, progressive: bool) -> int:
    """Decode one entropy-coded scan into the per-component coefficient
    grids; returns the stream position of the marker ending the scan."""
    segments, end = _entropy_segments(d, start)
    byc = {cid: (ch, cv) for cid, ch, cv, _tq in comps}
    interleaved = len(scomps) > 1
    if progressive and ss > 0 and interleaved:
        raise ValueError("progressive AC scan must be non-interleaved")
    if interleaved:
        n_units = mcux * mcuy
    else:
        uy, ux = used[scomps[0][0]]
        n_units = uy * ux
    seg_idx = 0
    br = _Bits(segments[0])
    pred = {cid: 0 for cid, *_ in comps}
    eob = [0]
    per_seg = restart if restart else n_units

    def one(br, blk, td, ta, cid):
        if not progressive:
            _block_full(br, blk, hufs[0x00 | td], hufs[0x10 | ta], pred, cid)
        elif ss == 0:
            if ah == 0:
                _block_dc_first(br, blk, hufs[0x00 | td], pred, cid, al)
            else:  # DC refinement: one raw bit appended at Al
                blk[0] |= br.take(1) << al
        elif ah == 0:
            _block_ac_first(br, blk, hufs[0x10 | ta], ss, se, al, eob)
        else:
            _block_ac_refine(br, blk, hufs[0x10 | ta], ss, se, al, eob)

    for ui in range(n_units):
        if restart and ui and ui % per_seg == 0:
            seg_idx += 1
            br = _Bits(segments[seg_idx])
            pred = {cid: 0 for cid, *_ in comps}
            eob[0] = 0
        if interleaved:
            my, mx = ui // mcux, ui % mcux
            for cid, td, ta in scomps:
                ch, cv = byc[cid]
                for v in range(cv):
                    for hh in range(ch):
                        one(br, coef[cid][my * cv + v, mx * ch + hh],
                            td, ta, cid)
        else:
            cid, td, ta = scomps[0]
            _uy, ux = used[cid]
            one(br, coef[cid][ui // ux, ui % ux], td, ta, cid)
    return end


def decode(data) -> np.ndarray:
    """JPEG bytes -> uint8 array (h,w) or (h,w,3).

    Handles baseline sequential (SOF0/1, single- or multi-scan,
    interleaved or per-component) AND progressive (SOF2: spectral
    selection + successive approximation, DC/AC first and refinement
    scans, EOB runs), with restart intervals in any scan. Arithmetic,
    lossless and hierarchical SOFs raise NotImplementedError."""
    d = bytes(data)
    if d[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    qts: Dict[int, np.ndarray] = {}
    hufs: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
    comps: List[Tuple[int, int, int, int]] = []
    h = w = 0
    restart = 0
    progressive = False
    coef: Dict[int, np.ndarray] = {}
    used: Dict[int, Tuple[int, int]] = {}
    mcux = mcuy = 0
    hmax = vmax = 1
    got_scan = False
    p = 2
    while p + 1 < len(d):
        if d[p] != 0xFF:
            p += 1
            continue
        m = d[p + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            p += 2
            continue
        if m == 0xD9:
            break
        ln = struct.unpack(">H", d[p + 2 : p + 4])[0]
        body = d[p + 4 : p + 2 + ln]
        if m == 0xDB:
            q = 0
            while q < len(body):
                prec, tid = body[q] >> 4, body[q] & 0x0F
                if prec == 0:
                    qts[tid] = np.frombuffer(body[q + 1 : q + 65], np.uint8
                                             ).astype(np.int32)
                    q += 65
                else:
                    qts[tid] = np.frombuffer(body[q + 1 : q + 129], ">u2"
                                             ).astype(np.int32)
                    q += 129
        elif m == 0xC4:
            q = 0
            while q < len(body):
                tc_th = body[q]
                bits = list(body[q + 1 : q + 17])
                nv = sum(bits)
                vals = list(body[q + 17 : q + 17 + nv])
                hufs[tc_th] = _lut(bits, vals)
                q += 17 + nv
        elif m in (0xC0, 0xC1, 0xC2):
            progressive = m == 0xC2
            if body[0] != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            h, w = struct.unpack(">HH", body[1:5])
            nc = body[5]
            comps = [
                (body[6 + 3 * i], body[7 + 3 * i] >> 4, body[7 + 3 * i] & 0x0F,
                 body[8 + 3 * i])
                for i in range(nc)
            ]
            if nc == 1:
                # T.81: a single-component image scans non-interleaved —
                # MCU is one 8x8 block regardless of declared sampling
                cid0, _ch0, _cv0, tq0 = comps[0]
                comps = [(cid0, 1, 1, tq0)]
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for cid, ch, cv, tq in comps:
                coef[cid] = np.zeros((mcuy * cv, mcux * ch, 64), dtype=np.int32)
                cw = -(-(w * ch) // hmax)   # component sample dims
                chh = -(-(h * cv) // vmax)
                used[cid] = (-(-chh // 8), -(-cw // 8))
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{m:02X} (arithmetic/lossless/"
                "hierarchical) unsupported: baseline (SOF0/1) and "
                "progressive (SOF2) Huffman streams only"
            )
        elif m == 0xDD:
            restart = struct.unpack(">H", body[:2])[0]
        elif m == 0xDA:
            if not comps:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scomps = [(body[1 + 2 * i], body[2 + 2 * i] >> 4,
                       body[2 + 2 * i] & 0x0F) for i in range(ns)]
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            p = _decode_scan(d, p + 2 + ln, scomps, ss, se,
                             ahal >> 4, ahal & 0x0F, comps, coef, used,
                             hufs, restart, mcux, mcuy, progressive)
            got_scan = True
            continue
        p += 2 + ln
    if not got_scan:
        raise ValueError("no SOS/SOF in JPEG stream")

    # vectorized dequant + IDCT per component (grids are block-raster)
    planes = {}
    for cid, ch, cv, tq in comps:
        g = coef[cid]
        gy, gx = g.shape[:2]
        co = g.reshape(-1, 64).astype(np.float64) * qts[tq][None, :]
        rast = np.zeros_like(co)
        rast[:, _ZIG] = co
        bl = rast.reshape(-1, 8, 8)
        pix = np.einsum("ji,njk,kl->nil", _D, bl, _D) + 128.0
        full = pix.reshape(gy, gx, 8, 8).transpose(0, 2, 1, 3).reshape(
            gy * 8, gx * 8)
        planes[cid] = (full, ch, cv)

    if len(comps) == 1:
        y = planes[comps[0][0]][0][:h, :w]
        return np.clip(np.rint(y), 0, 255).astype(np.uint8)

    def up(cid):
        pl, ch, cv = planes[cid]
        if ch != hmax or cv != vmax:
            pl = np.repeat(np.repeat(pl, vmax // cv, axis=0), hmax // ch, axis=1)
        return pl[:h, :w]

    y, cb, cr = (up(c[0]) for c in comps[:3])
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)

# ------------------------------------------------------- progressive encode

# Flat canonical AC table for progressive scans: every (run,size) symbol
# plus all EOBn codes must be encodable, and the Annex-K tables lack
# EOBn for runs > 1 — so progressive scans carry this complete table
# (254 symbols at 9 bits + 2 at 10; simplicity over ratio, and the
# decoder reads whatever DHT the stream declares).
_AC_PROG = ([0, 0, 0, 0, 0, 0, 0, 0, 254, 2, 0, 0, 0, 0, 0, 0],
            list(range(256)))


class _BitWriter:
    """MSB-first bit emitter with 0xFF byte stuffing (one scan)."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        return bytes(self.out)


def _mag1(v: int, cat: int) -> int:
    return v if v >= 0 else v + (1 << cat) - 1


def _enc_dc_scan(bw: _BitWriter, qgrids, comps, mcux: int, mcuy: int,
                 dc_tbls, ah: int, al: int):
    """Interleaved DC scan: first pass (diffs of dc >> Al) or refinement
    (one raw bit per block)."""
    preds = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (ch, cv) in enumerate(comps):
                g = qgrids[ci]
                for v in range(cv):
                    for hh in range(ch):
                        dc = int(g[my * cv + v, mx * ch + hh, 0])
                        if ah:
                            bw.put((dc >> al) & 1, 1)
                            continue
                        val = dc >> al  # arithmetic shift (T.81 point transform)
                        diff = val - preds[ci]
                        preds[ci] = val
                        cat = abs(diff).bit_length()
                        code, ln = dc_tbls[ci][cat]
                        bw.put(code, ln)
                        if cat:
                            bw.put(_mag1(diff, cat), cat)


def _enc_ac_first(bw: _BitWriter, blocks, tbl, ss: int, se: int, al: int):
    """AC first scan (G.1.2.2 encoder): run/size coding of the
    point-transformed band with cross-block EOB runs."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = tbl[r << 4]
            bw.put(code, ln)
            if r:
                bw.put(eobrun - (1 << r), r)
            eobrun = 0

    for blk in blocks:
        r = 0
        for k in range(ss, se + 1):
            t = int(blk[k])
            a = (-t if t < 0 else t) >> al  # magnitude shift toward zero
            if a == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                code, ln = tbl[0xF0]
                bw.put(code, ln)
                r -= 16
            cat = a.bit_length()
            code, ln = tbl[(r << 4) | cat]
            bw.put(code, ln)
            bw.put(_mag1(a if t >= 0 else -a, cat), cat)
            r = 0
        if r:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _enc_ac_refine(bw: _BitWriter, blocks, tbl, ss: int, se: int, al: int):
    """AC refinement scan (G.1.2.3 encoder, libjpeg-structured):
    correction bits buffered behind the next emitted symbol; trailing
    zero sections folded into cross-block EOB runs."""
    eobrun = 0
    bebits: List[int] = []

    def flush_eob():
        nonlocal eobrun, bebits
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = tbl[r << 4]
            bw.put(code, ln)
            if r:
                bw.put(eobrun - (1 << r), r)
            eobrun = 0
            for b in bebits:
                bw.put(b, 1)
            bebits = []

    for blk in blocks:
        absv = []
        for k in range(ss, se + 1):
            t = int(blk[k])
            absv.append((-t if t < 0 else t) >> al)
        eobpos = ss - 1  # position of last NEWLY-significant coefficient
        for i, a in enumerate(absv):
            if a == 1:
                eobpos = ss + i
        r = 0
        br: List[int] = []  # correction bits since the last symbol
        for i, a in enumerate(absv):
            k = ss + i
            if a == 0:
                r += 1
                continue
            while r > 15 and k <= eobpos:
                flush_eob()
                code, ln = tbl[0xF0]
                bw.put(code, ln)
                r -= 16
                for b in br:
                    bw.put(b, 1)
                br = []
            if a > 1:  # history-nonzero: buffer its correction bit
                br.append(a & 1)
                continue
            flush_eob()  # newly significant: emit (r,1) + sign
            code, ln = tbl[(r << 4) | 1]
            bw.put(code, ln)
            bw.put(0 if int(blk[k]) < 0 else 1, 1)
            for b in br:
                bw.put(b, 1)
            br = []
            r = 0
        if r or br:  # trailing section joins the EOB run
            eobrun += 1
            bebits.extend(br)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _encode_progressive(a: np.ndarray, quality: int, subsample: bool) -> bytes:
    """SOF2 progressive JFIF: interleaved DC scan (Al=1) + per-component
    spectral-selection AC scans at Al=1, then AC refinement scans and a
    DC refinement scan down to full precision — every T.81 progressive
    coding mode, so the stream fully exercises a decoder. Same quantized
    coefficients as the baseline path, so decode(progressive) is
    bit-identical to decode(baseline) at the same quality."""
    h, w = a.shape[:2]
    gray = a.ndim == 2
    qlum, qchr = _quality_tables(quality)
    if gray:
        planes = [a.astype(np.float64)]
    else:
        r, g, b = (a[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            H2, W2 = -(-h // 2) * 2, -(-w // 2) * 2

            def ds(p):
                p = np.pad(p, ((0, H2 - h), (0, W2 - w)), mode="edge")
                return p.reshape(H2 // 2, 2, W2 // 2, 2).mean(axis=(1, 3))

            cb, cr = ds(cb), ds(cr)
        planes = [y, cb, cr]
    qt_zz = [qlum[_ZIG]] + ([qchr[_ZIG]] if not gray else [])
    comp_q = [0] + ([1, 1] if not gray else [])
    hs = [(1, 1)] if gray else ([(2, 2), (1, 1), (1, 1)] if subsample
                                else [(1, 1)] * 3)
    hmax = max(x[0] for x in hs)
    vmax = max(x[1] for x in hs)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    qgrids, useds = [], []
    for ci, plane in enumerate(planes):
        ch, cv = hs[ci]
        gy, gx = mcuy * cv, mcux * ch
        ph, pw = plane.shape
        pl = np.pad(plane, ((0, gy * 8 - ph), (0, gx * 8 - pw)), mode="edge")
        bl = _blocks(np.clip(np.rint(pl), 0, 255).astype(np.uint8))
        q = _zigzag_quant(bl, qt_zz[comp_q[ci]].astype(np.float64))
        qgrids.append(q.reshape(gy, gx, 64))
        useds.append((-(-ph // 8), -(-pw // 8)))  # non-interleaved dims

    dc_l = _build_codes(*_DC_LUM)
    dc_c = _build_codes(*_DC_CHR)
    ac_p = _build_codes(*_AC_PROG)
    dc_tbls = [dc_l] + [dc_c] * (len(planes) - 1)

    out = [b"\xFF\xD8",
           _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"),
           _seg(0xFFDB, b"\x00" + bytes(qt_zz[0].astype(np.uint8)))]
    if not gray:
        out.append(_seg(0xFFDB, b"\x01" + bytes(qt_zz[1].astype(np.uint8))))
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, hs[ci][0] * 16 + hs[ci][1], comp_q[ci]])
    out.append(_seg(0xFFC2, sof))
    out.append(_seg(0xFFC4, _dht_payload(0x00, *_DC_LUM)))
    if not gray:
        out.append(_seg(0xFFC4, _dht_payload(0x01, *_DC_CHR)))
    out.append(_seg(0xFFC4, _dht_payload(0x10, *_AC_PROG)))

    def sos(scomps, ss, se, ah, al):
        b = bytes([len(scomps)])
        for cid, td, ta in scomps:
            b += bytes([cid, (td << 4) | ta])
        return _seg(0xFFDA, b + bytes([ss, se, (ah << 4) | al]))

    comps_hv = [tuple(x) for x in hs]
    all_dc = [(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(ncomp)]

    def ac_blocks(ci):
        uy, ux = useds[ci]
        g = qgrids[ci]
        return [g[by, bx] for by in range(uy) for bx in range(ux)]

    # scan script: DC first, AC bands at Al=1, AC refinements, DC refine
    bw = _BitWriter()
    _enc_dc_scan(bw, qgrids, comps_hv, mcux, mcuy, dc_tbls, 0, 1)
    out += [sos(all_dc, 0, 0, 0, 1), bw.flush()]
    for bands, ah, al in (((1, 5), 0, 1), ((6, 63), 0, 1),
                          ((1, 5), 1, 0), ((6, 63), 1, 0)):
        for ci in range(ncomp):
            bw = _BitWriter()
            enc = _enc_ac_first if ah == 0 else _enc_ac_refine
            enc(bw, ac_blocks(ci), ac_p, bands[0], bands[1], al)
            out += [sos([(ci + 1, 0, 0)], bands[0], bands[1], ah, al),
                    bw.flush()]
    bw = _BitWriter()
    _enc_dc_scan(bw, qgrids, comps_hv, mcux, mcuy, dc_tbls, 1, 0)
    out += [sos(all_dc, 0, 0, 1, 0), bw.flush()]
    out.append(b"\xFF\xD9")
    return b"".join(out)
