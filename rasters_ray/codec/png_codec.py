"""Minimal stdlib-zlib PNG codec for 8-bit and 16-bit grayscale.

A from-scratch implementation of the public PNG spec (RFC 2083): IHDR /
IDAT(zlib) / IEND chunks, scanline filters. Encoding uses filter 0 (None)
per scanline; decoding supports all five standard filters. Stands in for
the reference's rendered JPEG/PNG outputs (raster.py:1791-1865) — the
lossless compressed `fmt='png'` path of FIXTURES.md §1.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode(arr: np.ndarray) -> bytes:
    """Grayscale (rows, cols) or RGB (rows, cols, 3) uint8/uint16 -> PNG."""
    arr = np.asarray(arr)
    rgb = arr.ndim == 3 and arr.shape[2] == 3
    if not rgb and arr.ndim != 2:
        raise ValueError(f"PNG codec takes (h,w) or (h,w,3) arrays, got {arr.shape}")
    if arr.dtype == np.uint8:
        depth = 8
        raw = arr
    elif arr.dtype == np.uint16:
        depth = 16
        raw = arr.astype(">u2")
    else:
        raise ValueError(f"PNG codec supports uint8/uint16, got {arr.dtype}")
    h, w = arr.shape[:2]
    color = 2 if rgb else 0  # color type 2 = truecolor RGB, 0 = grayscale
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    stride = w * (depth // 8) * (3 if rgb else 1)
    # vectorized scanline assembly: filter byte column (0 = None) + body
    lines = np.empty((h, 1 + stride), dtype=np.uint8)
    lines[:, 0] = 0
    lines[:, 1:] = np.ascontiguousarray(raw).view(np.uint8).reshape(h, stride)
    idat = zlib.compress(lines.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode(data) -> np.ndarray:
    """Accepts bytes or anything with the buffer protocol (memoryview /
    Arrow buffer slice) — no upfront copy of the blob."""
    data = memoryview(data)
    if bytes(data[:8]) != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = depth = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = bytes(data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if color not in (0, 2) or interlace != 0:
                raise ValueError(
                    "only non-interlaced grayscale/RGB PNG supported"
                )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    nch = 3 if color == 2 else 1
    bpp = depth // 8 * nch
    stride = width * bpp

    def _shape(flat: np.ndarray) -> np.ndarray:
        if depth == 8:
            px = flat[:, :stride].reshape(height, width, nch)
        else:
            u16 = flat.reshape(height, width * nch, 2).astype(np.uint16)
            px = (u16[:, :, 0] * 256 + u16[:, :, 1]).reshape(height, width, nch)
        return px[:, :, 0].copy() if nch == 1 else px.copy()

    # fast path: every scanline filter 0 (what this module's encoder
    # writes) -> one vectorized reshape, no per-row loop
    if len(raw) == height * (1 + stride):
        grid = np.frombuffer(raw, dtype=np.uint8).reshape(height, 1 + stride)
        if not grid[:, 0].any():
            return _shape(grid[:, 1:])
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p = 0
    for r in range(height):
        ftype = raw[p]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=p + 1).copy()
        p += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((int(a) + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {ftype}")
        out[r] = line
        prev = line
    if depth not in (8, 16):
        raise ValueError(f"unsupported depth {depth}")
    return _shape(out)
