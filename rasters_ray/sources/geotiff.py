"""GeoTIFF reader/writer — pure Python (public TIFF 6.0 + OGC GeoTIFF
1.1 specs; no GDAL/rasterio in this environment).

Parity target: ``Raster.open`` reads any rasterio-supported TIFF and
``Raster.to_COG`` writes a cloud-optimized one (reference
raster.py:634-771, raster.py:1741-1791, which shell out to GDAL). This
module covers the envelope a real user's files actually span:

- EITHER byte order (``II`` little-endian / ``MM`` big-endian — all tag
  and pixel unpacking is parameterized on the header's order);
- TILED (tags 322-325) or STRIPPED (tags 273/278/279 — the layout most
  wild GeoTIFFs use) images; single-band 2D, chunky multi-band
  (PlanarConfiguration=1, e.g. RGB aerial imagery) or separate-plane
  multi-band (PlanarConfiguration=2, one strip/tile sequence per
  sample) — both returned as a 3D (h, w, samples) array;
- compression: none (1), LZW (5, TIFF 6.0 §13 with the standard
  early-change rule), new-style JPEG (7, TIFF TechNote 2 — per-block
  streams through the engine's own baseline/progressive codec, with
  shared JPEGTables (tag 347) spliced in; read AND lossy write),
  deflate (8 and legacy 32946), PackBits (32773, §9); any OTHER code
  raises ``NotImplementedError`` naming the code — never a silent
  fall-through to garbage pixels;
- predictors (tag 317): horizontal differencing (2, integer samples,
  read AND write) and the TechNote-3 floating-point predictor (3),
  both exact round-trips;
- grayscale int8/uint8/int16/uint16/int32/uint32 (exact round-trip)
  and float32/float64 (SampleFormat 3);
- GeoTIFF georeferencing: ModelPixelScale + ModelTiepoint +
  GeoKeyDirectory honest to the grid's CRS — GeographicType=4326 for
  geographic grids, ProjectedCSType=<EPSG> for projected grids with a
  canonical code, and user-defined (32767) + a PCSCitation proj4
  string in GeoAsciiParams for proj4-only CRSs.

``write_cog`` emits the COG layout (all IFDs + overview pyramid at the
front, tile bytes after). ``write_geotiff`` adds ``layout="strips"``
(plain baseline TIFF) so the strip/LZW/PackBits/big-endian read paths
can be proven by round-trip against independently constructed bytes.
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..grids import GridSpec

_MAGIC = 42
_MAGIC_BIG = 43  # BigTIFF (the de-facto public spec: 8-byte offsets)

# TIFF field types
_ASCII, _SHORT, _LONG, _UNDEF_T, _DOUBLE, _LONG8, _SLONG8, _IFD8 = (
    2, 3, 4, 7, 12, 16, 17, 18)
_TYPE_SIZE = {_ASCII: 1, _SHORT: 2, _LONG: 4, _UNDEF_T: 1, _DOUBLE: 8,
              _LONG8: 8, _SLONG8: 8, _IFD8: 8}

TAG_NEW_SUBFILE = 254
TAG_WIDTH = 256
TAG_LENGTH = 257
TAG_BITS = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_STRIP_OFFSETS = 273
TAG_SAMPLES = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_COUNTS = 279
TAG_PREDICTOR = 317
TAG_PLANAR = 284  # 1 = chunky (RGBRGB...), 2 = planar (separate planes)
TAG_EXTRA_SAMPLES = 338
TAG_TILE_W = 322
TAG_TILE_L = 323
TAG_TILE_OFFSETS = 324
TAG_TILE_COUNTS = 325
TAG_SAMPLE_FORMAT = 339
TAG_PIXEL_SCALE = 33550
TAG_TIEPOINT = 33922
TAG_JPEG_TABLES = 347  # TIFF TechNote 2 new-style JPEG
TAG_COLORMAP = 320  # palette for photometric 3 images
TAG_GDAL_NODATA = 42113  # ASCII nodata value (GDAL convention)
TAG_GEO_KEYS = 34735
TAG_GEO_ASCII = 34737

# compression codes (TIFF 6.0 §7 + the two de-facto registered ones)
COMP_NONE = 1
COMP_LZW = 5
COMP_DEFLATE = 8
COMP_JPEG = 7  # new-style JPEG-in-TIFF (TIFF TechNote 2)
COMP_PACKBITS = 32773
COMP_DEFLATE_OLD = 32946  # legacy "Deflate" code, byte-identical streams
_COMP_NAME = {"none": COMP_NONE, "lzw": COMP_LZW, "deflate": COMP_DEFLATE,
              "packbits": COMP_PACKBITS, "jpeg": COMP_JPEG}


# ------------------------------------------------------------- codecs


def _lzw_decode(data: bytes, max_out: int | None = None) -> bytes:
    """TIFF 6.0 §13 LZW (MSB-first packing, early code-width change).

    ``max_out`` bounds the output like libtiff's strip-size-driven loop:
    real encoders write the final data code + EOI without adding table
    entries while decoders add one per code, so the trailing EOI can sit
    past a width bump — stopping at the expected byte count sidesteps
    that spec asymmetry (and EOI remains honored when it arrives)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    base = [bytes([i]) for i in range(256)]
    table: List[bytes] = []
    width, next_code = 9, 258
    prev: bytes | None = None
    buf = nbits = 0
    n = len(data)
    pos = 0
    while True:
        if max_out is not None and len(out) >= max_out:
            return bytes(out)
        while nbits < width:
            if pos >= n:
                return bytes(out)  # stream ends without EOI: tolerated
            buf = (buf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (buf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == EOI:
            return bytes(out)
        if code == CLEAR:
            table.clear()
            width, next_code, prev = 9, 258, None
            continue
        if code < 256:
            entry = base[code]
        elif code - 258 < len(table):
            entry = table[code - 258]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt TIFF LZW stream (code {code})")
        if prev is not None and code != next_code:
            table.append(prev + entry[:1])
            next_code += 1
        elif prev is not None:  # the K-omega-K case already built `entry`
            table.append(entry)
            next_code += 1
        out += entry
        prev = entry
        # early change: the encoder widens when the NEXT free entry hits
        # 511/1023/2047, so the decoder must widen one entry early too
        if next_code == (1 << width) - 1 and width < 12:
            width += 1


def _lzw_encode(data: bytes) -> bytes:
    """Matched encoder for ``_lzw_decode`` (same spec §13 rules)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    buf = nbits = 0

    def put(code: int, width: int):
        nonlocal buf, nbits
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: Dict[bytes, int] = {bytes([i]): i for i in range(256)}
    width, next_code = 9, 258
    put(CLEAR, width)
    omega = b""
    for b in data:
        k = bytes([b])
        if omega + k in table:
            omega += k
            continue
        put(table[omega], width)
        table[omega + k] = next_code
        next_code += 1
        # the decoder's table runs one entry BEHIND the encoder's, and it
        # widens at next_code == 2^w - 1; matching that here means the
        # encoder widens at 2^w (TIFF 6.0 §13 "early change" bookkeeping)
        if next_code == (1 << width) and width < 12:
            width += 1
        omega = k
        if next_code >= 4094:  # table nearly full: reset (spec §13)
            put(table[omega], width)
            put(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            width, next_code = 9, 258
            omega = b""
    if omega:
        put(table[omega], width)
    put(EOI, width)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    """TIFF 6.0 §9 PackBits run-length decoding."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:  # literal run of h+1 bytes
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            out += data[i : i + 1] * (257 - h)
            i += 1
        # h == 128: no-op per spec
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: replicate runs >= 3, literals otherwise."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while i < n and i - lit < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3 and i + run <= n:
                break
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


def _compress(raw: bytes, comp: int) -> bytes:
    if comp == COMP_NONE:
        return raw
    if comp == COMP_DEFLATE:
        return zlib.compress(raw, 6)
    if comp == COMP_LZW:
        return _lzw_encode(raw)
    if comp == COMP_PACKBITS:
        return _packbits_encode(raw)
    raise NotImplementedError(f"TIFF compression code {comp} not writable")


def _decompress(raw: bytes, comp: int, expected: int | None = None) -> bytes:
    """Whitelist decompressor — unknown codes raise, NEVER fall through
    (an LZW file silently np.frombuffer'd would die in reshape or, worse,
    produce garbage pixels). ``expected`` is the uncompressed byte count
    the tile/strip geometry implies (bounds the LZW loop)."""
    if comp == COMP_NONE:
        return raw
    if comp in (COMP_DEFLATE, COMP_DEFLATE_OLD):
        return zlib.decompress(raw)
    if comp == COMP_LZW:
        return _lzw_decode(raw, max_out=expected)
    if comp == COMP_PACKBITS:
        return _packbits_decode(raw)
    names = {2: "CCITT RLE", 3: "CCITT G3", 4: "CCITT G4", 6: "old JPEG",
             7: "JPEG", 34712: "JPEG2000", 50000: "zstd", 50001: "webp"}
    raise NotImplementedError(
        f"TIFF compression code {comp}"
        f"{' (' + names[comp] + ')' if comp in names else ''} unsupported; "
        "supported codes: 1 (none), 5 (LZW), 8/32946 (deflate), "
        "32773 (PackBits)"
    )


def _nodata_text(v: float) -> str:
    """GDAL_NODATA tag text: 'nan' or repr-exact numeric (GDAL parses
    with atof; repr keeps float64 round-trip exact)."""
    f = float(v)
    if np.isnan(f):
        return "nan"
    return repr(int(f)) if float(int(f)) == f else repr(f)


def _jpeg_block(raw: bytes, tables: bytes | None) -> np.ndarray:
    """Decode one new-style JPEG (code 7) tile/strip. With a JPEGTables
    tag (TIFF TechNote 2), the abbreviated per-block stream is spliced
    after the shared tables: SOI + tables-body + block-body."""
    from ..codec import jpeg_codec

    if raw[:2] != b"\xFF\xD8":
        raise ValueError("JPEG-in-TIFF block missing SOI")
    if tables:
        if tables[:2] != b"\xFF\xD8" or tables[-2:] != b"\xFF\xD9":
            raise ValueError("JPEGTables tag is not an SOI..EOI tables stream")
        raw = tables[:-2] + raw[2:]
    return jpeg_codec.decode(raw)


def _undo_predictor(a: np.ndarray, predictor: int) -> np.ndarray:
    """Tag 317: 2 = horizontal differencing (integer wraparound cumsum
    along each row); 1 = none; 3 (floating-point) raises clearly."""
    if predictor == 1:
        return a
    if predictor == 2:
        if not np.issubdtype(a.dtype, np.integer):
            raise NotImplementedError(
                "TIFF predictor 2 on non-integer samples unsupported"
            )
        # int64 cumsum cast back to the sample dtype == modular per-row sum
        return np.cumsum(a.astype(np.int64), axis=1).astype(a.dtype)
    raise NotImplementedError(
        f"TIFF predictor {predictor} unsupported (1=none, 2=horizontal "
        "differencing, 3=floating-point are implemented)"
    )


def _undo_float_predictor(raw: bytes, width: int, itemsize: int) -> bytes:
    """Predictor 3 (TIFF Technical Note 3): each row is stored as
    byte-wise horizontal differences over the row's values split into
    byte PLANES, most-significant plane first. Returns big-endian value
    bytes in raster order."""
    a = np.frombuffer(raw, np.uint8).reshape(-1, width * itemsize)
    a = np.cumsum(a, axis=1, dtype=np.uint8)  # wraps mod 256 per row
    planes = a.reshape(-1, itemsize, width)  # MSB plane first
    return planes.transpose(0, 2, 1).tobytes()


def _apply_float_predictor(a: np.ndarray) -> bytes:
    """Encode-side predictor 3 for one strip/tile (2D float array)."""
    be = np.ascontiguousarray(a.astype(a.dtype.newbyteorder(">")))
    rows, width = a.shape
    itemsize = a.dtype.itemsize
    by = np.frombuffer(be.tobytes(), np.uint8).reshape(rows, width, itemsize)
    planes = by.transpose(0, 2, 1).reshape(rows, width * itemsize)
    diff = planes.astype(np.int16)
    diff[:, 1:] -= planes[:, :-1].astype(np.int16)
    return (diff & 0xFF).astype(np.uint8).tobytes()


_SAMPLE_TYPES = {  # (bits, sample_format) <-> numpy dtype, TIFF 6.0 §19
    (8, 1): np.uint8, (8, 2): np.int8,
    (16, 1): np.uint16, (16, 2): np.int16,
    (32, 1): np.uint32, (32, 2): np.int32,
    (32, 3): np.float32, (64, 3): np.float64,
}
_SAMPLE_KEYS = {np.dtype(v): k for k, v in _SAMPLE_TYPES.items()}


def _dtype_info(a: np.ndarray) -> Tuple[int, int]:
    """(bits_per_sample, sample_format)."""
    key = _SAMPLE_KEYS.get(np.dtype(a.dtype).newbyteorder("="))
    if key is None:
        raise ValueError(f"unsupported dtype for GeoTIFF: {a.dtype}")
    return key


def _tile_blobs(a: np.ndarray, tile: int, comp: int,
                jpeg_quality: int = 90) -> Tuple[List[bytes], int, int]:
    """Row-major tile blobs (zero-padded at the ragged edges), 2D or
    chunky 3D (h, w, samples). JPEG tiles (code 7) encode standalone
    per-tile streams through the engine's own codec."""
    h, w = a.shape[:2]
    bshape = a.shape[2:]
    ty = (h + tile - 1) // tile
    tx = (w + tile - 1) // tile
    blobs = []
    for r in range(ty):
        for c in range(tx):
            t = np.zeros((tile, tile) + bshape, dtype=a.dtype)
            sub = a[r * tile : (r + 1) * tile, c * tile : (c + 1) * tile]
            t[: sub.shape[0], : sub.shape[1]] = sub
            if comp == COMP_JPEG:
                from ..codec import jpeg_codec

                blobs.append(jpeg_codec.encode(t, quality=jpeg_quality))
            else:
                blobs.append(_compress(np.ascontiguousarray(t).tobytes(),
                                       comp))
    return blobs, tx, ty


def _overview(a: np.ndarray) -> np.ndarray:
    """2x block-mean reduction (pads the odd edge by repeating it);
    a trailing sample axis reduces per channel."""
    h, w = a.shape[:2]
    if h % 2 or w % 2:
        pad = ((0, h % 2), (0, w % 2)) + ((0, 0),) * (a.ndim - 2)
        a = np.pad(a, pad, mode="edge")
    f = a.astype(np.float64)
    m = (f[0::2, 0::2] + f[0::2, 1::2] + f[1::2, 0::2] + f[1::2, 1::2]) / 4.0
    if np.issubdtype(a.dtype, np.integer):
        return np.rint(m).astype(a.dtype)
    return m.astype(a.dtype)


class _IFD:
    """One image-file directory: fixed-size entry table + out-of-line
    values; offsets patched once the layout is known. ``bo`` is the
    struct byte-order prefix ('<' or '>'); ``big`` selects the BigTIFF
    geometry (u64 entry count, 20-byte entries, 8-byte inline values
    and next-IFD pointer)."""

    def __init__(self, bo: str = "<", big: bool = False):
        self.bo = bo
        self.big = big
        self.entries: List[Tuple[int, int, int, object]] = []  # tag, type, count, value

    def add(self, tag: int, typ: int, values) -> None:
        if not isinstance(values, (list, tuple)):
            values = [values]
        self.entries.append((tag, typ, len(values), list(values)))

    def sizes(self) -> Tuple[int, int]:
        """(table_bytes, overflow_bytes)."""
        if self.big:
            table = 8 + 20 * len(self.entries) + 8
            inline = 8
        else:
            table = 2 + 12 * len(self.entries) + 4
            inline = 4
        overflow = 0
        for _, typ, count, _ in self.entries:
            nbytes = _TYPE_SIZE[typ] * count
            if nbytes > inline:
                overflow += nbytes + (nbytes % 2)
        return table, overflow

    def render(self, my_offset: int, next_ifd: int) -> bytes:
        """Serialize at ``my_offset`` (overflow values follow the table)."""
        bo = self.bo
        table_len, _ = self.sizes()
        inline = 8 if self.big else 4
        out = bytearray()
        out += struct.pack(f"{bo}Q" if self.big else f"{bo}H",
                           len(self.entries))
        overflow = bytearray()
        over_base = my_offset + table_len
        fmt = {_ASCII: f"{bo}B", _SHORT: f"{bo}H", _LONG: f"{bo}I",
               _UNDEF_T: f"{bo}B", _DOUBLE: f"{bo}d", _LONG8: f"{bo}Q",
               _SLONG8: f"{bo}q", _IFD8: f"{bo}Q"}
        hdr_fmt = f"{bo}HHQ" if self.big else f"{bo}HHI"
        off_fmt = f"{bo}Q" if self.big else f"{bo}I"
        for tag, typ, count, values in sorted(self.entries):
            nbytes = _TYPE_SIZE[typ] * count
            packed = b"".join(struct.pack(fmt[typ], v) for v in values)
            if nbytes <= inline:
                val = packed + b"\x00" * (inline - nbytes)
            else:
                val = struct.pack(off_fmt, over_base + len(overflow))
                overflow += packed
                if len(packed) % 2:
                    overflow += b"\x00"
            out += struct.pack(hdr_fmt, tag, typ, count) + val
        out += struct.pack(off_fmt, next_ifd)
        out += overflow
        return bytes(out)


def _geo_entries(ifd: _IFD, grid: GridSpec) -> None:
    """GeoTIFF 1.1 georeferencing honest to the grid's CRS: geographic
    grids get GeographicType=4326; projected grids with a canonical
    EPSG code get GTModelType=Projected + ProjectedCSType=<code>;
    proj4-only CRSs (local AEQD, MODIS sinusoidal, geos...) get
    ProjectedCSType=32767 (user-defined) with the proj4 string in
    PCSCitation/GeoAsciiParams — never a silent 4326 stamp."""
    ifd.add(TAG_PIXEL_SCALE, _DOUBLE,
            [abs(grid.cell_width), abs(grid.cell_height), 0.0])
    ifd.add(TAG_TIEPOINT, _DOUBLE,
            [0.0, 0.0, 0.0, grid.x_origin, grid.y_origin, 0.0])
    from ..proj.crs import epsg_code, parse_crs

    info = parse_crs(grid.crs)
    if info.is_geographic:
        # GTModelType=Geographic(2), GTRasterType=PixelIsArea(1)
        ifd.add(TAG_GEO_KEYS, _SHORT,
                [1, 1, 0, 3, 1024, 0, 1, 2, 1025, 0, 1, 1, 2048, 0, 1, 4326])
        return
    code = epsg_code(grid.crs)
    if code is not None:
        ifd.add(TAG_GEO_KEYS, _SHORT,
                [1, 1, 0, 3, 1024, 0, 1, 1, 1025, 0, 1, 1,
                 3072, 0, 1, code])
        return
    cite = info.canonical() + "|"
    ifd.add(TAG_GEO_KEYS, _SHORT,
            [1, 1, 0, 4, 1024, 0, 1, 1, 1025, 0, 1, 1,
             3072, 0, 1, 32767, 3073, TAG_GEO_ASCII, len(cite), 0])
    ifd.add(TAG_GEO_ASCII, _ASCII, list(cite.encode("ascii")) + [0])


def write_cog(
    arr: np.ndarray,
    grid: GridSpec,
    path: str,
    tile: int = 256,
    compression: str = "deflate",
    overviews: bool = True,
    byte_order: str = "<",
    bigtiff: bool = False,
    jpeg_quality: int = 90,
    nodata: Optional[float] = None,
) -> str:
    """Write ``arr`` on ``grid`` as a Cloud-Optimized GeoTIFF.
    ``bigtiff=True`` emits the BigTIFF (version 43, 8-byte offset)
    container — required beyond 4 GiB and common in the wild for large
    mosaics; tile offsets are stored as LONG8. ``compression="jpeg"``
    emits lossy JPEG tiles (uint8 only) — the classic aerial-ortho COG."""
    a = np.ascontiguousarray(arr)
    if a.ndim not in (2, 3):
        raise ValueError("write_cog takes a 2D band or a 3D (h, w, "
                         "samples) chunky multi-band image")
    spp = a.shape[2] if a.ndim == 3 else 1
    bo = byte_order
    if bo not in ("<", ">"):
        raise ValueError("byte_order must be '<' or '>'")
    bits, sfmt = _dtype_info(a)
    comp = _COMP_NAME.get(compression)
    if comp is None:
        raise ValueError(f"unknown compression {compression!r}; "
                         f"one of {sorted(_COMP_NAME)}")
    if comp == COMP_JPEG and a.dtype != np.uint8:
        raise ValueError("JPEG compression requires uint8 samples")
    if bo == ">":
        a = a.astype(a.dtype.newbyteorder(">"), copy=False)

    levels = [a]
    if overviews:
        cur = a
        while min(cur.shape[:2]) > tile:
            cur = _overview(cur)
            levels.append(cur)

    per_level = [_tile_blobs(lv, tile, comp, jpeg_quality) for lv in levels]

    ifds: List[_IFD] = []
    for li, (lv, (blobs, tx, ty)) in enumerate(zip(levels, per_level)):
        ifd = _IFD(bo, big=bigtiff)
        ifd.add(TAG_NEW_SUBFILE, _LONG, 1 if li else 0)
        ifd.add(TAG_WIDTH, _LONG, lv.shape[1])
        ifd.add(TAG_LENGTH, _LONG, lv.shape[0])
        ifd.add(TAG_BITS, _SHORT, [bits] * spp if spp > 1 else bits)
        ifd.add(TAG_COMPRESSION, _SHORT, comp)
        ifd.add(TAG_PHOTOMETRIC, _SHORT,
                ((6 if comp == COMP_JPEG else 2) if spp == 3 else 1))
        ifd.add(TAG_SAMPLES, _SHORT, spp)
        if spp > 1:
            ifd.add(TAG_PLANAR, _SHORT, 1)
            if spp != 3:
                ifd.add(TAG_EXTRA_SAMPLES, _SHORT, [0] * (spp - 1))
        ifd.add(TAG_TILE_W, _SHORT, tile)
        ifd.add(TAG_TILE_L, _SHORT, tile)
        ifd.add(TAG_TILE_OFFSETS, _LONG8 if bigtiff else _LONG,
                [0] * len(blobs))  # patched below
        ifd.add(TAG_TILE_COUNTS, _LONG, [len(b) for b in blobs])
        ifd.add(TAG_SAMPLE_FORMAT, _SHORT, sfmt)
        if li == 0:
            if nodata is not None:
                ifd.add(TAG_GDAL_NODATA, _ASCII,
                        list(_nodata_text(nodata).encode("ascii")) + [0])
            _geo_entries(ifd, grid)
        ifds.append(ifd)

    # layout pass: header, then ALL IFDs (+overflow), THEN tile data — the
    # COG front-matter property
    pos = 16 if bigtiff else 8
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
        if bigtiff:
            f.write((b"II" if bo == "<" else b"MM")
                    + struct.pack(f"{bo}HHHQ", _MAGIC_BIG, 8, 0,
                                  ifd_offsets[0]))
        else:
            f.write((b"II" if bo == "<" else b"MM")
                    + struct.pack(f"{bo}HI", _MAGIC, ifd_offsets[0]))
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


def write_geotiff(
    arr: np.ndarray,
    grid: GridSpec,
    path: str,
    layout: str = "tiles",
    tile: int = 256,
    rows_per_strip: int = 64,
    compression: str = "deflate",
    byte_order: str = "<",
    overviews: bool = True,
    bigtiff: bool = False,
    predictor: int = 1,
    jpeg_quality: int = 90,
    nodata: Optional[float] = None,
    palette: Optional[np.ndarray] = None,
) -> str:
    """General GeoTIFF writer. ``layout="tiles"`` is the COG path;
    ``layout="strips"`` emits a plain baseline stripped TIFF (the layout
    most wild files use — RowsPerStrip/StripOffsets/StripByteCounts),
    in either byte order, with none/LZW/deflate/PackBits compression;
    a 3D (h, w, samples) array writes a chunky multi-band image (RGB
    photometric for 3 samples, ExtraSamples otherwise; strips only);
    ``bigtiff=True`` selects the version-43 8-byte-offset container;
    ``predictor=3`` applies the TechNote-3 floating-point predictor
    (strips layout, float data only); ``palette`` (a (n, 3) uint8/16
    RGB table, n <= 2^bits) writes a PALETTE image (photometric 3 +
    ColorMap tag) from uint8/uint16 index pixels — the land-cover
    classification layout."""
    if layout == "tiles":
        return write_cog(arr, grid, path, tile=tile, compression=compression,
                         overviews=overviews, byte_order=byte_order,
                         bigtiff=bigtiff, nodata=nodata)
    if layout != "strips":
        raise ValueError(f"layout must be 'tiles' or 'strips', got {layout!r}")
    a = np.ascontiguousarray(arr)
    if a.ndim not in (2, 3):
        raise ValueError("write_geotiff takes a 2D band or a 3D (h, w, "
                         "samples) chunky multi-band image")
    spp = a.shape[2] if a.ndim == 3 else 1
    bo = byte_order
    if bo not in ("<", ">"):
        raise ValueError("byte_order must be '<' or '>'")
    bits, sfmt = _dtype_info(a)
    comp = _COMP_NAME.get(compression)
    if comp is None:
        raise ValueError(f"unknown compression {compression!r}; "
                         f"one of {sorted(_COMP_NAME)}")
    if comp == COMP_JPEG:
        if a.dtype != np.uint8:
            raise ValueError("JPEG compression requires uint8 samples")
        if predictor != 1:
            raise ValueError("JPEG compression excludes predictors")
    if palette is not None:
        pal = np.asarray(palette)
        if (pal.ndim != 2 or pal.shape[1] != 3
                or a.dtype not in (np.dtype(np.uint8), np.dtype(np.uint16))
                or a.ndim != 2):
            raise ValueError("palette requires 2D uint8/uint16 index "
                             "pixels and an (n, 3) RGB table")
        if comp == COMP_JPEG:
            raise ValueError("palette excludes JPEG compression")
    if bo == ">":
        a = a.astype(a.dtype.newbyteorder(">"), copy=False)

    if predictor not in (1, 2, 3):
        raise ValueError("write predictor must be 1 (none), 2 (horizontal) "
                         "or 3 (float)")
    if predictor == 3 and a.dtype.kind != "f":
        raise ValueError("predictor 3 applies to floating-point samples only")
    if predictor == 2 and not np.issubdtype(a.dtype, np.integer):
        raise ValueError("predictor 2 applies to integer samples only")

    h, w = a.shape[:2]
    rps = max(1, int(rows_per_strip))
    nstrips = (h + rps - 1) // rps
    blobs = []
    for i in range(nstrips):
        sub = a[i * rps : min((i + 1) * rps, h)]  # last strip short, unpadded
        if comp == COMP_JPEG:
            from ..codec import jpeg_codec

            blobs.append(jpeg_codec.encode(np.ascontiguousarray(sub),
                                           quality=jpeg_quality))
        elif predictor == 3:
            # chunky rows are w*spp values; TechNote 3 splits the whole
            # row into byte planes, so flatten the sample axis first
            blobs.append(_compress(
                _apply_float_predictor(sub.reshape(sub.shape[0], -1)), comp))
        elif predictor == 2:
            # horizontal differencing in the sample dtype (wraparound),
            # the exact inverse of _undo_predictor's modular cumsum
            d = sub.copy()
            d[:, 1:] = sub[:, 1:] - sub[:, :-1]
            blobs.append(_compress(np.ascontiguousarray(d).tobytes(), comp))
        else:
            blobs.append(_compress(np.ascontiguousarray(sub).tobytes(), comp))

    ifd = _IFD(bo, big=bigtiff)
    ifd.add(TAG_NEW_SUBFILE, _LONG, 0)
    ifd.add(TAG_WIDTH, _LONG, w)
    ifd.add(TAG_LENGTH, _LONG, h)
    ifd.add(TAG_BITS, _SHORT, [bits] * spp if spp > 1 else bits)
    ifd.add(TAG_COMPRESSION, _SHORT, comp)
    # RGB photometric for 3 uint8/uint16 color samples (YCbCr when the
    # payload is JPEG-compressed); palette (3) for indexed images;
    # otherwise MinIsBlack with the extra channels declared unspecified
    ifd.add(TAG_PHOTOMETRIC, _SHORT,
            (6 if comp == COMP_JPEG else 2) if spp == 3
            else (3 if palette is not None else 1))
    if palette is not None:
        # ColorMap: 3 * 2^bits SHORTs, R then G then B planes, 16-bit
        # intensities (8-bit tables scale by 257 per the TIFF 6.0 note)
        n = 1 << bits
        table = np.zeros((3, n), dtype=np.uint32)
        pal16 = (pal.astype(np.uint32) * 257
                 if pal.dtype == np.uint8 else pal.astype(np.uint32))
        table[:, : pal.shape[0]] = pal16.T
        ifd.add(TAG_COLORMAP, _SHORT, [int(v) for v in table.ravel()])
    ifd.add(TAG_SAMPLES, _SHORT, spp)
    if spp > 1:
        ifd.add(TAG_PLANAR, _SHORT, 1)
        if spp != 3:
            ifd.add(TAG_EXTRA_SAMPLES, _SHORT, [0] * (spp - 1))
    ifd.add(TAG_ROWS_PER_STRIP, _LONG, rps)
    ifd.add(TAG_STRIP_OFFSETS, _LONG8 if bigtiff else _LONG,
            [0] * nstrips)  # patched below
    ifd.add(TAG_STRIP_COUNTS, _LONG, [len(b) for b in blobs])
    ifd.add(TAG_SAMPLE_FORMAT, _SHORT, sfmt)
    if predictor != 1:
        ifd.add(TAG_PREDICTOR, _SHORT, predictor)
    if nodata is not None:
        ifd.add(TAG_GDAL_NODATA, _ASCII,
                list(_nodata_text(nodata).encode("ascii")) + [0])
    _geo_entries(ifd, grid)

    hdr_len = 16 if bigtiff else 8
    t, o = ifd.sizes()
    data_start = hdr_len + t + o
    data_start += data_start % 2
    offsets, pos = [], data_start
    for b in blobs:
        offsets.append(pos)
        pos += len(b) + (len(b) % 2)
    for i, e in enumerate(ifd.entries):
        if e[0] == TAG_STRIP_OFFSETS:
            ifd.entries[i] = (e[0], e[1], e[2], offsets)

    with open(path, "wb") as f:
        if bigtiff:
            f.write((b"II" if bo == "<" else b"MM")
                    + struct.pack(f"{bo}HHHQ", _MAGIC_BIG, 8, 0, hdr_len))
        else:
            f.write((b"II" if bo == "<" else b"MM")
                    + struct.pack(f"{bo}HI", _MAGIC, 8))
        f.write(ifd.render(hdr_len, 0))
        if f.tell() % 2:
            f.write(b"\x00")
        for b in blobs:
            f.write(b)
            if len(b) % 2:
                f.write(b"\x00")
    return path


def read_geotiff(path: str, window: Optional[Tuple[int, int, int, int]] = None):
    """GeoTIFF reader: returns (levels, meta) where levels is a list of
    2D arrays (main + overviews) and meta has pixel_scale / tiepoint /
    geo_keys / layout info. Either byte order, classic or BigTIFF,
    tiled or stripped, whitelisted compression only (unknown codes
    raise — see ``_decompress``).

    ``window=(row_off, col_off, height, width)`` decodes ONLY the
    tiles/strips intersecting that level-0 region (clamped to the
    image) and returns a single level of the window's pixels — the
    scale path for pulling one AOI out of a continent-sized mosaic
    without touching the rest of the file. ``meta["window"]`` records
    the clamped region."""
    data = open(path, "rb").read()
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError(f"not a TIFF (byte-order mark {data[:2]!r})")
    magic = struct.unpack(f"{bo}H", data[2:4])[0]
    if magic == _MAGIC:
        big = False
        (off,) = struct.unpack(f"{bo}I", data[4:8])
    elif magic == _MAGIC_BIG:
        big = True
        osize, rsvd = struct.unpack(f"{bo}HH", data[4:8])
        if osize != 8 or rsvd != 0:
            raise ValueError(f"BigTIFF with offset size {osize} unsupported")
        (off,) = struct.unpack(f"{bo}Q", data[8:16])
    else:
        raise ValueError(f"not a TIFF (magic {magic})")
    # classic vs BigTIFF IFD geometry: (count bytes/fmt, entry size,
    # count+value header fmt, inline value capacity, next-pointer fmt)
    if big:
        cnt_n, ent, hdr_fmt, inline, next_fmt = 8, 20, f"{bo}HHQ", 8, f"{bo}Q"
    else:
        cnt_n, ent, hdr_fmt, inline, next_fmt = 2, 12, f"{bo}HHI", 4, f"{bo}I"
    levels = []
    meta = {"ifd_offsets": [], "first_tile_offset": None, "byte_order": bo,
            "bigtiff": big}
    fmt = {_ASCII: f"{bo}B", _SHORT: f"{bo}H", _LONG: f"{bo}I",
           _UNDEF_T: f"{bo}B", _DOUBLE: f"{bo}d", _LONG8: f"{bo}Q",
           _SLONG8: f"{bo}q", _IFD8: f"{bo}Q"}
    while off:
        meta["ifd_offsets"].append(off)
        (n,) = struct.unpack(f"{bo}Q" if big else f"{bo}H",
                             data[off : off + cnt_n])
        tags = {}
        for i in range(n):
            e = off + cnt_n + ent * i
            tag, typ, count = struct.unpack(hdr_fmt, data[e : e + cnt_n + 4]
                                            if big else data[e : e + 8])
            if typ not in _TYPE_SIZE:  # BYTE/ASCII/RATIONAL tags we don't use
                continue
            vpos = e + (12 if big else 8)
            nbytes = _TYPE_SIZE[typ] * count
            if nbytes <= inline:
                raw = data[vpos : vpos + nbytes]
            else:
                (voff,) = struct.unpack(f"{bo}Q" if big else f"{bo}I",
                                        data[vpos : vpos + inline])
                raw = data[voff : voff + nbytes]
            step = _TYPE_SIZE[typ]
            tags[tag] = [
                struct.unpack(fmt[typ], raw[j : j + step])[0]
                for j in range(0, nbytes, step)
            ]
        w, h = tags[TAG_WIDTH][0], tags[TAG_LENGTH][0]
        bits, sfmt = tags[TAG_BITS][0], tags.get(TAG_SAMPLE_FORMAT, [1])[0]
        comp = tags.get(TAG_COMPRESSION, [COMP_NONE])[0]
        pred = tags.get(TAG_PREDICTOR, [1])[0]
        spp = tags.get(TAG_SAMPLES, [1])[0]
        planar2 = spp > 1 and tags.get(TAG_PLANAR, [1])[0] == 2
        jpeg_tables = (bytes(tags[TAG_JPEG_TABLES])
                       if TAG_JPEG_TABLES in tags else None)
        if comp == COMP_JPEG and planar2:
            raise NotImplementedError(
                "JPEG-in-TIFF with PlanarConfiguration=2 unsupported")
        if spp > 1 and len(set(tags[TAG_BITS])) != 1:
            raise NotImplementedError(
                f"per-sample BitsPerSample {tags[TAG_BITS]} unsupported; "
                "all samples must share one type"
            )
        try:
            base = _SAMPLE_TYPES[(bits, sfmt)]
        except KeyError:
            raise NotImplementedError(
                f"TIFF sample type bits={bits} format={sfmt} unsupported "
                f"(single-band {sorted(set(t.__name__ for t in _SAMPLE_TYPES.values()))} only)"
            ) from None
        dt = np.dtype(base).newbyteorder(bo)
        # target region: full image, or the clamped window on level 0
        if window is not None:
            wr0, wc0, wh_, ww_ = window
            wr0 = max(0, min(int(wr0), h))
            wc0 = max(0, min(int(wc0), w))
            wh_ = max(0, min(int(wh_), h - wr0))
            ww_ = max(0, min(int(ww_), w - wc0))
            meta["window"] = (wr0, wc0, wh_, ww_)
        else:
            wr0 = wc0 = 0
            wh_, ww_ = h, w
        out = np.zeros((wh_, ww_) + ((spp,) if spp > 1 else ()),
                       dtype=np.dtype(base))
        # chunky: blocks carry a trailing sample axis; planar-2: 2D
        # blocks paste into one sample plane each
        bshape = (spp,) if spp > 1 and not planar2 else ()

        def paste(block: np.ndarray, br: int, bc: int, plane=None) -> None:
            rs, re = max(br, wr0), min(br + block.shape[0], wr0 + wh_)
            cs, ce = max(bc, wc0), min(bc + block.shape[1], wc0 + ww_)
            if rs < re and cs < ce:
                dst = out if plane is None else out[..., plane]
                dst[rs - wr0 : re - wr0, cs - wc0 : ce - wc0] = (
                    block[rs - br : re - br, cs - bc : ce - bc])

        if TAG_TILE_W in tags:  # tiled layout
            tw, tl = tags[TAG_TILE_W][0], tags[TAG_TILE_L][0]
            tx = (w + tw - 1) // tw
            # planar-2: the tile sequence repeats once per sample plane
            # (TIFF 6.0 PlanarConfiguration); per-tile payload is 2D
            tiles_per_plane = tx * ((h + tl - 1) // tl)
            vals_per_tile = tl * tw * (1 if planar2 else spp)
            for ti, (toff, tcnt) in enumerate(
                zip(tags[TAG_TILE_OFFSETS], tags[TAG_TILE_COUNTS])
            ):
                if meta["first_tile_offset"] is None or toff < meta["first_tile_offset"]:
                    meta["first_tile_offset"] = toff
                plane, tj = (divmod(ti, tiles_per_plane) if planar2
                             else (None, ti))
                r, c = divmod(tj, tx)
                if (r * tl >= wr0 + wh_ or (r + 1) * tl <= wr0
                        or c * tw >= wc0 + ww_ or (c + 1) * tw <= wc0):
                    continue  # outside the window: never decompressed
                if comp == COMP_JPEG:
                    blk = _jpeg_block(data[toff : toff + tcnt], jpeg_tables)
                    hh = min(tl, h - r * tl)
                    ww = min(tw, w - c * tw)
                    paste(blk[:hh, :ww].astype(np.dtype(base), copy=False),
                          r * tl, c * tw, plane)
                    continue
                raw = _decompress(data[toff : toff + tcnt], comp,
                                  expected=vals_per_tile * dt.itemsize)
                row_vals = tw * (1 if planar2 else spp)
                if pred == 3:
                    t = np.frombuffer(
                        _undo_float_predictor(raw, row_vals, dt.itemsize),
                        dtype=np.dtype(base).newbyteorder(">")
                    ).reshape((tl, tw) + bshape)
                else:
                    t = np.frombuffer(raw, dtype=dt).reshape((tl, tw) + bshape)
                    t = _undo_predictor(t, pred)
                t = t.astype(np.dtype(base), copy=False)
                hh = min(tl, h - r * tl)
                ww = min(tw, w - c * tw)
                paste(t[:hh, :ww], r * tl, c * tw, plane)
            meta["layout"] = "tiles"
        elif TAG_STRIP_OFFSETS in tags:  # stripped layout
            rps = tags.get(TAG_ROWS_PER_STRIP, [h])[0]
            rps = min(rps, h) or h
            strips_per_plane = (h + rps - 1) // rps
            vals_per_px = 1 if planar2 else spp
            counts = tags.get(
                TAG_STRIP_COUNTS,
                # per spec, StripByteCounts is required; tolerate its
                # absence only for uncompressed data where sizes are known
                [min(rps, h - (i % strips_per_plane) * rps) * w
                 * vals_per_px * dt.itemsize
                 for i in range(len(tags[TAG_STRIP_OFFSETS]))]
                if comp == COMP_NONE else None,
            )
            if counts is None:
                raise ValueError("compressed stripped TIFF missing StripByteCounts")
            for i, (soff, scnt) in enumerate(zip(tags[TAG_STRIP_OFFSETS], counts)):
                if meta["first_tile_offset"] is None or soff < meta["first_tile_offset"]:
                    meta["first_tile_offset"] = soff
                plane, si = (divmod(i, strips_per_plane) if planar2
                             else (None, i))
                rows = min(rps, h - si * rps)
                if si * rps >= wr0 + wh_ or si * rps + rows <= wr0:
                    continue  # outside the window: never decompressed
                if comp == COMP_JPEG:
                    blk = _jpeg_block(data[soff : soff + scnt], jpeg_tables)
                    paste(blk[:rows, :w].astype(np.dtype(base), copy=False),
                          si * rps, 0, plane)
                    continue
                raw = _decompress(data[soff : soff + scnt], comp,
                                  expected=rows * w * vals_per_px * dt.itemsize)
                if pred == 3:
                    s = np.frombuffer(
                        _undo_float_predictor(
                            raw[: rows * w * vals_per_px * dt.itemsize],
                            w * vals_per_px, dt.itemsize),
                        dtype=np.dtype(base).newbyteorder(">")
                    ).reshape((rows, w) + bshape)
                else:
                    s = np.frombuffer(raw, dtype=dt, count=rows * w * vals_per_px
                                      ).reshape((rows, w) + bshape)
                    s = _undo_predictor(s, pred)
                s = s.astype(np.dtype(base), copy=False)
                paste(s, si * rps, 0, plane)
            meta["layout"] = "strips"
        else:
            raise ValueError("TIFF IFD has neither tile nor strip offsets")
        meta["compression"] = comp
        levels.append(out)
        if TAG_PIXEL_SCALE in tags:
            meta["pixel_scale"] = tags[TAG_PIXEL_SCALE]
            if TAG_TIEPOINT in tags:
                meta["tiepoint"] = tags[TAG_TIEPOINT]
            meta["geo_keys"] = tags.get(TAG_GEO_KEYS, [])
            if TAG_GEO_ASCII in tags:
                meta["geo_ascii"] = bytes(
                    tags[TAG_GEO_ASCII]).rstrip(b"\x00").decode(
                        "ascii", "replace")
        if TAG_COLORMAP in tags and tags.get(TAG_PHOTOMETRIC, [1])[0] == 3:
            cm = np.asarray(tags[TAG_COLORMAP], dtype=np.uint32)
            if cm.size % 3 == 0:
                meta["colormap"] = cm.reshape(3, -1).T  # (n, 3) 16-bit RGB
        if TAG_GDAL_NODATA in tags:
            txt = bytes(tags[TAG_GDAL_NODATA]).rstrip(b"\x00").decode(
                "ascii", "replace").strip()
            try:
                meta["nodata"] = float(txt)
            except ValueError:
                pass  # malformed nodata text: surface nothing
        if window is not None:
            break  # window coordinates are level-0; skip overview IFDs
        nxt_at = off + cnt_n + ent * n
        (off,) = struct.unpack(next_fmt,
                               data[nxt_at : nxt_at + (8 if big else 4)])
    return levels, meta
