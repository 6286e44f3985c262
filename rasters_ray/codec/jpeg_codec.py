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
- ``decode``: baseline DCT (SOF0), 8-bit, grayscale or YCbCr with any
  1-2/1-2 sampling factors, multiple DQT/DHT segments, restart
  intervals. Progressive (SOF2), arithmetic coding, and 12-bit raise
  NotImplementedError. The per-symbol Huffman loop is sequential Python
  (unavoidable for a data-dependent prefix code) but everything after —
  dequantize, IDCT, upsample, color convert — is one vectorized pass
  over all blocks; decode runs inside actor-pool map_batches stages so
  the parallelism axis is images, not pixels.

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
           restart_interval: int = 0) -> bytes:
    """uint8 grayscale (h,w) or RGB (h,w,3) -> baseline JFIF bytes.

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (DC predictors reset, each entropy segment
    byte-aligned) — the stream-resync feature robust encoders use."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError("jpeg encode expects uint8")
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("expected (h,w) or (h,w,3)")
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


def decode(data) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 array (h,w) or (h,w,3)."""
    d = bytes(data)
    if d[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    qts: Dict[int, np.ndarray] = {}
    hufs: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
    comps = []  # (id, h, v, tq)
    h = w = 0
    restart = 0
    p = 2
    scan_start = None
    scan_comps = None
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
        elif m == 0xC0 or m == 0xC1:
            if body[0] != 8:
                raise NotImplementedError("only 8-bit baseline JPEG supported")
            h, w = struct.unpack(">HH", body[1:5])
            nc = body[5]
            comps = [
                (body[6 + 3 * i], body[7 + 3 * i] >> 4, body[7 + 3 * i] & 0x0F,
                 body[8 + 3 * i])
                for i in range(nc)
            ]
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{m:02X} (progressive/arithmetic/lossless) "
                "unsupported: only baseline sequential (SOF0/1)"
            )
        elif m == 0xDD:
            restart = struct.unpack(">H", body[:2])[0]
        elif m == 0xDA:
            ns = body[0]
            scan_comps = [(body[1 + 2 * i], body[2 + 2 * i] >> 4,
                           body[2 + 2 * i] & 0x0F) for i in range(ns)]
            scan_start = p + 2 + ln
            break
        p += 2 + ln
    if scan_start is None or not comps:
        raise ValueError("no SOS/SOF in JPEG stream")
    if len(scan_comps) == 1 and len(comps) > 1:
        raise NotImplementedError(
            "multi-scan (per-component non-interleaved) baseline JPEG "
            "unsupported: only single-scan interleaved streams"
        )
    if len(comps) == 1:
        # T.81: a single-component scan is NON-interleaved — MCU is one
        # 8x8 block in raster order regardless of declared sampling
        # factors (some encoders emit 2x2 on grayscale); normalizing to
        # 1x1 gives exactly that layout.
        cid0, _ch0, _cv0, tq0 = comps[0]
        comps = [(cid0, 1, 1, tq0)]

    # unstuff entropy data, splitting at restart markers
    raw = d[scan_start:]
    end = raw.find(b"\xFF\xD9")
    raw = raw[: end if end >= 0 else len(raw)]
    segments: List[bytes] = []
    cur = bytearray()
    i = 0
    while i < len(raw):
        b = raw[i]
        if b == 0xFF:
            nxt = raw[i + 1] if i + 1 < len(raw) else 0
            if nxt == 0:
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

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy
    per_comp_coef = {}
    per_comp_blocks = {}
    for cid, ch, cv, tq in comps:
        nb = n_mcu * ch * cv
        per_comp_coef[cid] = np.zeros((nb, 64), dtype=np.int32)
        per_comp_blocks[cid] = 0

    sc = {cid: (td, ta) for cid, td, ta in scan_comps}
    order = [(cid, ch, cv, tq) for cid, ch, cv, tq in comps]

    seg_idx = 0
    br = _Bits(segments[0])
    pred = {cid: 0 for cid, *_ in comps}
    mcu_per_seg = restart if restart else n_mcu
    for mi in range(n_mcu):
        if restart and mi and mi % mcu_per_seg == 0:
            seg_idx += 1
            br = _Bits(segments[seg_idx])
            pred = {cid: 0 for cid, *_ in comps}
        for cid, ch, cv, tq in order:
            dsym, dlen = hufs[0x00 | sc[cid][0]]
            asym, alen = hufs[0x10 | sc[cid][1]]
            for _ in range(ch * cv):
                blk = per_comp_coef[cid][per_comp_blocks[cid]]
                per_comp_blocks[cid] += 1
                look = br.peek16()
                s, L = int(dsym[look]), int(dlen[look])
                if L == 0:
                    raise ValueError("bad Huffman code (DC)")
                br.skip(L)
                if s:
                    blk[0] = _extend(br.take(s), s)
                blk[0] += pred[cid]
                pred[cid] = blk[0]
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

    # vectorized dequant + IDCT per component
    planes = {}
    for cid, ch, cv, tq in comps:
        coef = per_comp_coef[cid].astype(np.float64) * qts[tq][None, :]
        rast = np.zeros_like(coef)
        rast[:, _ZIG] = coef
        bl = rast.reshape(-1, 8, 8)
        pix = np.einsum("ji,njk,kl->nil", _D, bl, _D) + 128.0
        cw, chh = mcux * ch, mcuy * cv  # blocks across / down
        # blocks are stored MCU-major: within each MCU, cv x ch raster
        full = np.zeros((chh * 8, cw * 8))
        idx = np.arange(n_mcu * ch * cv)
        mcu_of = idx // (ch * cv)
        sub = idx % (ch * cv)
        by = (mcu_of // mcux) * cv + sub // ch
        bx = (mcu_of % mcux) * ch + sub % ch
        full_bl = full.reshape(chh, 8, cw, 8)
        full_bl[by, :, bx, :] = pix
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
