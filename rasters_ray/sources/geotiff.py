"""Cloud-Optimized GeoTIFF writer — pure Python (public TIFF 6.0 +
OGC GeoTIFF 1.1 specs; no GDAL/rasterio in this environment).

Parity target: ``Raster.to_COG`` (reference raster.py:1741-1791, which
shells out to GDAL's COG path). A COG is a tiled GeoTIFF whose IFDs
(main image + reduced-resolution overviews) all sit at the FRONT of the
file, followed by the tile bytes, so a range-reader can fetch the
header once and then exactly the tiles it needs. This writer produces
that layout from the engine's own data:

- classic little-endian TIFF, tiled (default 256x256), deflate (zlib)
  or uncompressed;
- grayscale uint8/uint16 (exact round-trip) or float32 (SampleFormat 3);
- 2x block-mean overview pyramid until the level fits one tile;
- GeoTIFF georeferencing: ModelPixelScale + ModelTiepoint +
  GeoKeyDirectory (geographic WGS84 for EPSG:4326 grids).

``read_geotiff`` is a minimal reader used by the round-trip tests (and
a working example of the range-read pattern the layout enables).
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Tuple

import numpy as np

from ..grids import GridSpec

_II = b"II"
_MAGIC = 42

# TIFF field types
_SHORT, _LONG, _DOUBLE = 3, 4, 12
_TYPE_SIZE = {_SHORT: 2, _LONG: 4, _DOUBLE: 8}

TAG_NEW_SUBFILE = 254
TAG_WIDTH = 256
TAG_LENGTH = 257
TAG_BITS = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_SAMPLES = 277
TAG_TILE_W = 322
TAG_TILE_L = 323
TAG_TILE_OFFSETS = 324
TAG_TILE_COUNTS = 325
TAG_SAMPLE_FORMAT = 339
TAG_PIXEL_SCALE = 33550
TAG_TIEPOINT = 33922
TAG_GEO_KEYS = 34735


def _dtype_info(a: np.ndarray) -> Tuple[int, int]:
    """(bits_per_sample, sample_format)."""
    if a.dtype == np.uint8:
        return 8, 1
    if a.dtype == np.uint16:
        return 16, 1
    if a.dtype == np.float32:
        return 32, 3
    raise ValueError(f"unsupported dtype for COG: {a.dtype}")


def _tile_blobs(a: np.ndarray, tile: int, deflate: bool) -> Tuple[List[bytes], int, int]:
    """Row-major tile blobs (zero-padded at the ragged edges)."""
    h, w = a.shape
    ty = (h + tile - 1) // tile
    tx = (w + tile - 1) // tile
    blobs = []
    for r in range(ty):
        for c in range(tx):
            t = np.zeros((tile, tile), dtype=a.dtype)
            sub = a[r * tile : (r + 1) * tile, c * tile : (c + 1) * tile]
            t[: sub.shape[0], : sub.shape[1]] = sub
            raw = t.tobytes()
            blobs.append(zlib.compress(raw, 6) if deflate else raw)
    return blobs, tx, ty


def _overview(a: np.ndarray) -> np.ndarray:
    """2x block-mean reduction (pads the odd edge by repeating it)."""
    h, w = a.shape
    if h % 2 or w % 2:
        a = np.pad(a, ((0, h % 2), (0, w % 2)), mode="edge")
    f = a.astype(np.float64)
    m = (f[0::2, 0::2] + f[0::2, 1::2] + f[1::2, 0::2] + f[1::2, 1::2]) / 4.0
    if np.issubdtype(a.dtype, np.integer):
        return np.rint(m).astype(a.dtype)
    return m.astype(a.dtype)


class _IFD:
    """One image-file directory: fixed-size entry table + out-of-line
    values; offsets patched once the layout is known."""

    def __init__(self):
        self.entries: List[Tuple[int, int, int, object]] = []  # tag, type, count, value

    def add(self, tag: int, typ: int, values) -> None:
        if not isinstance(values, (list, tuple)):
            values = [values]
        self.entries.append((tag, typ, len(values), list(values)))

    def sizes(self) -> Tuple[int, int]:
        """(table_bytes, overflow_bytes)."""
        table = 2 + 12 * len(self.entries) + 4
        overflow = 0
        for _, typ, count, _ in self.entries:
            nbytes = _TYPE_SIZE[typ] * count
            if nbytes > 4:
                overflow += nbytes + (nbytes % 2)
        return table, overflow

    def render(self, my_offset: int, next_ifd: int) -> bytes:
        """Serialize at ``my_offset`` (overflow values follow the table)."""
        table_len, _ = self.sizes()
        out = bytearray()
        out += struct.pack("<H", len(self.entries))
        overflow = bytearray()
        over_base = my_offset + table_len
        fmt = {_SHORT: "<H", _LONG: "<I", _DOUBLE: "<d"}
        for tag, typ, count, values in sorted(self.entries):
            nbytes = _TYPE_SIZE[typ] * count
            packed = b"".join(struct.pack(fmt[typ], v) for v in values)
            if nbytes <= 4:
                val = packed + b"\x00" * (4 - nbytes)
            else:
                val = struct.pack("<I", over_base + len(overflow))
                overflow += packed
                if len(packed) % 2:
                    overflow += b"\x00"
            out += struct.pack("<HHI", tag, typ, count) + val
        out += struct.pack("<I", next_ifd)
        out += overflow
        return bytes(out)


def write_cog(
    arr: np.ndarray,
    grid: GridSpec,
    path: str,
    tile: int = 256,
    compression: str = "deflate",
    overviews: bool = True,
) -> str:
    """Write ``arr`` on ``grid`` as a Cloud-Optimized GeoTIFF."""
    a = np.ascontiguousarray(arr)
    if a.ndim != 2:
        raise ValueError("write_cog takes one 2D band")
    bits, sfmt = _dtype_info(a)
    deflate = compression == "deflate"

    levels = [a]
    if overviews:
        cur = a
        while min(cur.shape) > tile:
            cur = _overview(cur)
            levels.append(cur)

    per_level = [_tile_blobs(lv, tile, deflate) for lv in levels]

    ifds: List[_IFD] = []
    for li, (lv, (blobs, tx, ty)) in enumerate(zip(levels, per_level)):
        ifd = _IFD()
        ifd.add(TAG_NEW_SUBFILE, _LONG, 1 if li else 0)
        ifd.add(TAG_WIDTH, _LONG, lv.shape[1])
        ifd.add(TAG_LENGTH, _LONG, lv.shape[0])
        ifd.add(TAG_BITS, _SHORT, bits)
        ifd.add(TAG_COMPRESSION, _SHORT, 8 if deflate else 1)
        ifd.add(TAG_PHOTOMETRIC, _SHORT, 1)  # BlackIsZero
        ifd.add(TAG_SAMPLES, _SHORT, 1)
        ifd.add(TAG_TILE_W, _SHORT, tile)
        ifd.add(TAG_TILE_L, _SHORT, tile)
        ifd.add(TAG_TILE_OFFSETS, _LONG, [0] * len(blobs))  # patched below
        ifd.add(TAG_TILE_COUNTS, _LONG, [len(b) for b in blobs])
        ifd.add(TAG_SAMPLE_FORMAT, _SHORT, sfmt)
        if li == 0:
            ifd.add(TAG_PIXEL_SCALE, _DOUBLE,
                    [abs(grid.cell_width), abs(grid.cell_height), 0.0])
            ifd.add(TAG_TIEPOINT, _DOUBLE,
                    [0.0, 0.0, 0.0, grid.x_origin, grid.y_origin, 0.0])
            # GTModelType=Geographic(2), GTRasterType=PixelIsArea(1),
            # GeographicType=4326 (public GeoTIFF 1.1 key layout)
            ifd.add(TAG_GEO_KEYS, _SHORT,
                    [1, 1, 0, 3, 1024, 0, 1, 2, 1025, 0, 1, 1, 2048, 0, 1, 4326])
        ifds.append(ifd)

    # layout pass: header, then ALL IFDs (+overflow), THEN tile data — the
    # COG front-matter property
    pos = 8
    ifd_offsets = []
    for ifd in ifds:
        t, o = ifd.sizes()
        ifd_offsets.append(pos)
        pos += t + o
    data_start = pos + (pos % 2)

    # assign tile offsets level by level
    tile_pos = data_start
    for ifd, (blobs, _, _) in zip(ifds, per_level):
        offsets = []
        for b in blobs:
            offsets.append(tile_pos)
            tile_pos += len(b) + (len(b) % 2)
        for i, e in enumerate(ifd.entries):
            if e[0] == TAG_TILE_OFFSETS:
                ifd.entries[i] = (e[0], e[1], e[2], offsets)

    with open(path, "wb") as f:
        f.write(_II + struct.pack("<HI", _MAGIC, ifd_offsets[0]))
        for li, ifd in enumerate(ifds):
            nxt = ifd_offsets[li + 1] if li + 1 < len(ifds) else 0
            f.write(ifd.render(ifd_offsets[li], nxt))
        if f.tell() % 2:
            f.write(b"\x00")
        for blobs, _, _ in per_level:
            for b in blobs:
                f.write(b)
                if len(b) % 2:
                    f.write(b"\x00")
    return path


def read_geotiff(path: str):
    """Minimal tiled-GeoTIFF reader for tests: returns (levels, meta)
    where levels is a list of 2D arrays (main + overviews) and meta has
    pixel_scale / tiepoint / geo_keys / layout offsets."""
    data = open(path, "rb").read()
    if data[:2] != _II or struct.unpack("<H", data[2:4])[0] != _MAGIC:
        raise ValueError("not a little-endian classic TIFF")
    (off,) = struct.unpack("<I", data[4:8])
    levels = []
    meta = {"ifd_offsets": [], "first_tile_offset": None}
    fmt = {_SHORT: "<H", _LONG: "<I", _DOUBLE: "<d"}
    while off:
        meta["ifd_offsets"].append(off)
        (n,) = struct.unpack("<H", data[off : off + 2])
        tags = {}
        for i in range(n):
            e = off + 2 + 12 * i
            tag, typ, count = struct.unpack("<HHI", data[e : e + 8])
            nbytes = _TYPE_SIZE[typ] * count
            if nbytes <= 4:
                raw = data[e + 8 : e + 8 + nbytes]
            else:
                (voff,) = struct.unpack("<I", data[e + 8 : e + 12])
                raw = data[voff : voff + nbytes]
            step = _TYPE_SIZE[typ]
            tags[tag] = [
                struct.unpack(fmt[typ], raw[j : j + step])[0]
                for j in range(0, nbytes, step)
            ]
        w, h = tags[TAG_WIDTH][0], tags[TAG_LENGTH][0]
        tw, tl = tags[TAG_TILE_W][0], tags[TAG_TILE_L][0]
        bits, sfmt = tags[TAG_BITS][0], tags.get(TAG_SAMPLE_FORMAT, [1])[0]
        comp = tags[TAG_COMPRESSION][0]
        dt = {(8, 1): np.uint8, (16, 1): np.uint16, (32, 3): np.float32}[(bits, sfmt)]
        tx = (w + tw - 1) // tw
        out = np.zeros((h, w), dtype=dt)
        for ti, (toff, tcnt) in enumerate(zip(tags[TAG_TILE_OFFSETS], tags[TAG_TILE_COUNTS])):
            if meta["first_tile_offset"] is None or toff < meta["first_tile_offset"]:
                meta["first_tile_offset"] = toff
            raw = data[toff : toff + tcnt]
            if comp == 8:
                raw = zlib.decompress(raw)
            t = np.frombuffer(raw, dtype=dt).reshape(tl, tw)
            r, c = divmod(ti, tx)
            hh = min(tl, h - r * tl)
            ww = min(tw, w - c * tw)
            out[r * tl : r * tl + hh, c * tw : c * tw + ww] = t[:hh, :ww]
        levels.append(out)
        if TAG_PIXEL_SCALE in tags:
            meta["pixel_scale"] = tags[TAG_PIXEL_SCALE]
            meta["tiepoint"] = tags[TAG_TIEPOINT]
            meta["geo_keys"] = tags[TAG_GEO_KEYS]
        (off,) = struct.unpack("<I", data[off + 2 + 12 * n : off + 6 + 12 * n])
    return levels, meta
