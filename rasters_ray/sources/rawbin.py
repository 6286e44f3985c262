"""Raw-binary rasters with a ``.hdr`` text sidecar — the ESRI BIL
(GDAL ``EHdr``) and ENVI (GDAL ``ENVI``) dialects (the reference reads
both through rasterio behind ``Raster.open``, rasters/raster.py:634-771).

The payload is a bare array of samples in one of three interleaves —
BSQ (band-sequential), BIL (band-interleaved-by-line), BIP (band-
interleaved-by-pixel) — and EVERYTHING else lives in the sidecar:

- **ESRI dialect** (GTOPO30 / .bil world): ``KEY value`` lines —
  NROWS/NCOLS/NBANDS/NBITS, PIXELTYPE (SIGNEDINT/UNSIGNEDINT/FLOAT),
  BYTEORDER (I=little, M=big), LAYOUT, SKIPBYTES, NODATA, and the
  georeference as ULXMAP/ULYMAP (the CENTER of the upper-left pixel)
  with XDIM/YDIM cell sizes. CRS from a ``.prj`` WKT sidecar when
  present (resolved through the engine's WKT authority parser), else
  the ``.crs`` convention, else EPSG:4326.
- **ENVI dialect** (hyperspectral world): a first line ``ENVI`` then
  ``key = value`` entries — samples/lines/bands, ``data type`` (the
  IDL codes 1..15), interleave, ``byte order`` (0/1), ``header
  offset``, ``data ignore value``, and ``map info = {proj, refx, refy,
  x, y, xdim, ydim, [zone, hemi], ...}`` where (x, y) is the
  coordinate of the UPPER-LEFT CORNER of the 1-based reference pixel.
  ``Geographic Lat/Lon`` -> EPSG:4326; ``UTM`` + zone/hemisphere ->
  EPSG:326xx/327xx; a ``coordinate system string`` WKT wins when
  present.

Reads return (rows, cols) for one band, (rows, cols, bands) chunky
otherwise (the GeoTIFF convention). ``write_rawbin`` emits either
dialect so the readers are proven by round-trip. NODATA / data-ignore
values become NaN on float output (the engine's invalid convention).
"""

from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import numpy as np

from ..grids.gridspec import GridSpec

# ENVI "data type" codes (IDL): code -> numpy dtype char (byte order applied later)
_ENVI_DTYPES = {1: "u1", 2: "i2", 3: "i4", 4: "f4", 5: "f8",
                12: "u2", 13: "u4", 14: "i8", 15: "u8"}
_ENVI_CODES = {v: k for k, v in _ENVI_DTYPES.items()}

RAW_EXTS = (".bil", ".bip", ".bsq", ".img", ".dat", ".raw", ".flt")


def _hdr_path(path: str) -> Optional[str]:
    """GDAL convention: ``dem.bil`` -> ``dem.hdr`` (replace-ext) wins,
    ``dem.bil.hdr`` (append) accepted."""
    for cand in (os.path.splitext(path)[0] + ".hdr", path + ".hdr"):
        if os.path.exists(cand):
            return cand
    return None


def _sidecar_crs(path: str) -> str:
    base = os.path.splitext(path)[0]
    if os.path.exists(base + ".prj"):
        return open(base + ".prj").read().strip()  # WKT; parsed lazily
    if os.path.exists(base + ".crs"):
        return open(base + ".crs").read().strip()
    return "EPSG:4326"


def _read_payload(path: str, dtype: np.dtype, rows: int, cols: int,
                  bands: int, interleave: str, skip: int,
                  window: Optional[Tuple[int, int, int, int]] = None,
                  ) -> np.ndarray:
    """Full read, or a clamped (row_off, col_off, height, width) window
    that touches ONLY the window's rows on disk: BIL/BIP rows are
    contiguous (one seek + one read of h row-blocks), BSQ needs one
    seek per band — either way a continental GTOPO30 tile costs h/rows
    of its bytes, the same scale contract as the windowed TIFF path."""
    isz = dtype.itemsize
    il = interleave.lower()
    if il not in ("bsq", "bil", "bip"):
        raise ValueError(f"unknown interleave {interleave!r}: {path}")
    if os.path.getsize(path) - skip < rows * cols * bands * isz:
        raise ValueError(
            f"raw payload is smaller than the declared "
            f"{rows}x{cols}x{bands} samples: {path}")
    if window is None:
        r0, c0, h, w = 0, 0, rows, cols
    else:
        r0, c0, h, w = window
        r0 = max(0, min(int(r0), rows))
        c0 = max(0, min(int(c0), cols))
        h = max(0, min(int(h), rows - r0))
        w = max(0, min(int(w), cols - c0))
        if h == 0 or w == 0:
            raise ValueError(f"window {window} is empty after clamping")
    with open(path, "rb") as fh:
        if il == "bsq":
            planes = []
            for b in range(bands):
                fh.seek(skip + (b * rows + r0) * cols * isz)
                plane = np.frombuffer(fh.read(h * cols * isz), dtype)
                planes.append(plane.reshape(h, cols)[:, c0:c0 + w])
            a = np.stack(planes, axis=2)
        else:
            fh.seek(skip + r0 * bands * cols * isz)
            a = np.frombuffer(fh.read(h * bands * cols * isz), dtype)
            if il == "bil":
                a = a.reshape(h, bands, cols).transpose(0, 2, 1)[:, c0:c0 + w]
            else:  # bip
                a = a.reshape(h, cols, bands)[:, c0:c0 + w]
    return a[:, :, 0] if bands == 1 else a


def _apply_nodata(a: np.ndarray, nodata: Optional[float]) -> np.ndarray:
    if nodata is None:
        return a
    a = a.astype(np.float64) if a.dtype.kind != "f" else a.copy()
    a[a == nodata] = np.nan
    return a


def _read_esri(path: str, hdr_text: str,
               window: Optional[Tuple[int, int, int, int]] = None,
               ) -> Tuple[np.ndarray, GridSpec]:
    kv = {}
    for line in hdr_text.splitlines():
        parts = line.split(None, 1)
        if len(parts) == 2 and not line.lstrip().startswith(("#", "/")):
            kv[parts[0].strip().lower()] = parts[1].strip()
    try:
        rows, cols = int(kv["nrows"]), int(kv["ncols"])
    except KeyError:
        raise ValueError(f"ESRI .hdr without NROWS/NCOLS: {path}")
    bands = int(kv.get("nbands", 1))
    nbits = int(kv.get("nbits", 8))
    ptype = kv.get("pixeltype", "").upper()
    if ptype == "FLOAT" or nbits in (0,) or kv.get("layout", "").lower() == "flt":
        kind = "f"
    elif ptype == "SIGNEDINT":
        kind = "i"
    else:
        # GDAL default: unsigned for 8, SIGNED for 16/32 (GTOPO30 is i16)
        kind = "u" if nbits == 8 else "i"
    if os.path.splitext(path)[1].lower() == ".flt":
        kind, nbits = "f", 32  # ESRI float grid: always f32
    # I=Intel little-endian (.bil), LSBFIRST little-endian (.flt style)
    bo = "<" if kv.get("byteorder", "I").upper().startswith(("I", "L")) else ">"
    dtype = np.dtype(f"{bo}{kind}{nbits // 8}")
    il = kv.get("layout", "bil")
    skip = int(kv.get("skipbytes", 0))
    a = _read_payload(path, dtype, rows, cols, bands, il, skip, window)
    nd = kv.get("nodata", kv.get("nodata_value"))
    if nd is not None:
        a = _apply_nodata(a, float(nd))
    cw = float(kv.get("xdim", kv.get("cellsize", 1.0)))
    ch = float(kv.get("ydim", kv.get("cellsize", 1.0)))
    # ULXMAP/ULYMAP locate the CENTER of the upper-left pixel
    if "ulxmap" in kv:
        x0 = float(kv["ulxmap"]) - cw / 2.0
        y0 = float(kv["ulymap"]) + ch / 2.0
    elif "xllcorner" in kv:  # the .flt header style borrows .asc keys
        x0 = float(kv["xllcorner"])
        y0 = float(kv["yllcorner"]) + rows * ch
    else:
        x0, y0 = 0.0, float(rows)
    grid = GridSpec(crs=_sidecar_crs(path), x_origin=x0, y_origin=y0,
                    cell_width=cw, cell_height=-ch, rows=rows, cols=cols)
    return a, grid


def _envi_kv(hdr_text: str) -> dict:
    """ENVI ``key = value`` entries; ``{...}`` values may span lines."""
    body = hdr_text.split("\n", 1)[1] if "\n" in hdr_text else ""
    kv = {}
    for m in re.finditer(
            r"^\s*([a-z][a-z0-9 ]*?)\s*=\s*(\{[^}]*\}|[^\n]*)",
            body, re.I | re.M | re.S):
        kv[m.group(1).strip().lower()] = m.group(2).strip()
    return kv


def _envi_crs(kv: dict, mi: list) -> str:
    css = kv.get("coordinate system string", "").strip("{} \n")
    if css:
        return css  # WKT; resolved by the engine's authority parser
    if not mi:
        return "EPSG:4326"
    proj = mi[0].strip().lower()
    if proj.startswith("geographic"):
        return "EPSG:4326"
    if proj == "utm" and len(mi) >= 9:
        zone = int(float(mi[7]))
        south = mi[8].strip().lower().startswith("s")
        return f"EPSG:{(32700 if south else 32600) + zone}"
    raise ValueError(
        f"ENVI map info projection {mi[0]!r} needs a coordinate system "
        "string (WKT) entry to georeference")


def _read_envi(path: str, hdr_text: str,
               window: Optional[Tuple[int, int, int, int]] = None,
               ) -> Tuple[np.ndarray, GridSpec]:
    kv = _envi_kv(hdr_text)
    try:
        rows, cols = int(kv["lines"]), int(kv["samples"])
    except KeyError:
        raise ValueError(f"ENVI .hdr without lines/samples: {path}")
    bands = int(kv.get("bands", 1))
    code = int(kv.get("data type", 4))
    if code not in _ENVI_DTYPES:
        raise NotImplementedError(
            f"ENVI data type {code} (complex) is not supported: {path}")
    bo = ">" if kv.get("byte order", "0").strip() == "1" else "<"
    dtype = np.dtype(bo + _ENVI_DTYPES[code])
    il = kv.get("interleave", "bsq")
    skip = int(kv.get("header offset", 0))
    a = _read_payload(path, dtype, rows, cols, bands, il, skip, window)
    if "data ignore value" in kv:
        a = _apply_nodata(a, float(kv["data ignore value"]))
    mi = [s.strip() for s in kv.get("map info", "").strip("{}").split(",")
          if s.strip()]
    if mi:
        px, py = float(mi[1]), float(mi[2])
        x, y = float(mi[3]), float(mi[4])
        cw, ch = float(mi[5]), float(mi[6])
        # (x, y) is the upper-left CORNER of 1-based pixel (px, py);
        # fractional refs (1.5 = its center) shift by the fraction
        x0 = x - (px - 1.0) * cw
        y0 = y + (py - 1.0) * ch
    else:
        cw = ch = 1.0
        x0, y0 = 0.0, float(rows)
    grid = GridSpec(crs=_envi_crs(kv, mi), x_origin=x0, y_origin=y0,
                    cell_width=cw, cell_height=-ch, rows=rows, cols=cols)
    return a, grid


def read_rawbin(path: str,
                window: Optional[Tuple[int, int, int, int]] = None,
                ) -> Tuple[np.ndarray, GridSpec]:
    """Read a raw-binary raster via its ``.hdr`` sidecar (either
    dialect, sniffed by the ``ENVI`` first line). ``window=(row_off,
    col_off, height, width)`` reads only those rows from disk (clamped;
    see ``_read_payload``) and returns the window-shifted GridSpec."""
    hdr = _hdr_path(path)
    if hdr is None:
        raise ValueError(
            f"raw-binary raster without a .hdr sidecar: {path} (looked "
            f"for {os.path.splitext(path)[0] + '.hdr'} and {path + '.hdr'})")
    text = open(hdr, "r").read()
    if text.lstrip().splitlines()[0].strip().upper() == "ENVI":
        a, g = _read_envi(path, text, window)
    else:
        a, g = _read_esri(path, text, window)
    if window is not None:
        r0 = max(0, min(int(window[0]), g.rows))
        c0 = max(0, min(int(window[1]), g.cols))
        g = GridSpec(
            crs=g.crs,
            x_origin=g.x_origin + c0 * g.cell_width,
            y_origin=g.y_origin + r0 * g.cell_height,
            cell_width=g.cell_width, cell_height=g.cell_height,
            rows=a.shape[0], cols=a.shape[1],
        )
    return a, g


def write_rawbin(arr: np.ndarray, grid: GridSpec, path: str,
                 dialect: str = "esri", interleave: str = "bil",
                 byte_order: str = "<", nodata: Optional[float] = None,
                 ) -> None:
    """Write ``arr`` ((rows, cols) or (rows, cols, bands)) + sidecar.
    NaNs require ``nodata``. The ESRI dialect records the CRS in
    ``.prj``/``.crs`` (EPSG:4326 implied otherwise); ENVI records
    Geographic/UTM map info directly."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3:
        raise ValueError(f"expected 2D or (rows, cols, bands), got {a.shape}")
    rows, cols, bands = a.shape
    if np.isnan(a).any():
        if nodata is None:
            raise ValueError("array has NaNs; pass nodata= to encode them")
        a = np.where(np.isnan(a), nodata, a)
    dt = np.dtype(a.dtype).newbyteorder(byte_order)
    il = interleave.lower()
    if il == "bsq":
        payload = np.ascontiguousarray(a.transpose(2, 0, 1).astype(dt))
    elif il == "bil":
        payload = np.ascontiguousarray(a.transpose(0, 2, 1).astype(dt))
    elif il == "bip":
        payload = np.ascontiguousarray(a.astype(dt))
    else:
        raise ValueError(f"interleave must be bsq/bil/bip, got {interleave!r}")
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(payload.tobytes())
    os.replace(tmp, path)

    base = os.path.splitext(path)[0]
    kind = np.dtype(a.dtype).kind
    if dialect == "esri":
        if kind not in "uif":
            raise ValueError(f"ESRI dialect takes int/float samples, not {a.dtype}")
        ptype = {"u": "UNSIGNEDINT", "i": "SIGNEDINT", "f": "FLOAT"}[kind]
        lines = [
            f"NROWS {rows}", f"NCOLS {cols}", f"NBANDS {bands}",
            f"NBITS {dt.itemsize * 8}", f"PIXELTYPE {ptype}",
            f"BYTEORDER {'I' if byte_order == '<' else 'M'}",
            f"LAYOUT {il.upper()}",
            f"ULXMAP {grid.x_origin + grid.cell_width / 2.0!r}",
            f"ULYMAP {grid.y_origin + grid.cell_height / 2.0!r}",
            f"XDIM {grid.cell_width!r}", f"YDIM {-grid.cell_height!r}",
        ]
        if nodata is not None:
            lines.append(f"NODATA {nodata!r}")
        with open(base + ".hdr", "w") as fh:
            fh.write("\n".join(lines) + "\n")
        if grid.crs != "EPSG:4326":
            with open(base + ".crs", "w") as fh:
                fh.write(grid.crs)
    elif dialect == "envi":
        key = dt.newbyteorder("=").str.lstrip("<>=|")
        if key not in _ENVI_CODES:
            raise ValueError(f"no ENVI data type code for dtype {a.dtype}")
        m = re.match(r"EPSG:(32[67])(\d\d)$", grid.crs)
        if grid.crs == "EPSG:4326":
            mi = (f"{{Geographic Lat/Lon, 1, 1, {grid.x_origin!r}, "
                  f"{grid.y_origin!r}, {grid.cell_width!r}, "
                  f"{-grid.cell_height!r}, WGS-84}}")
        elif m:
            hemi = "North" if m.group(1) == "326" else "South"
            mi = (f"{{UTM, 1, 1, {grid.x_origin!r}, {grid.y_origin!r}, "
                  f"{grid.cell_width!r}, {-grid.cell_height!r}, "
                  f"{int(m.group(2))}, {hemi}, WGS-84}}")
        else:
            raise ValueError(
                "ENVI dialect writes Geographic/UTM map info only; got "
                f"{grid.crs!r} (write dialect='esri' with a .crs sidecar)")
        lines = [
            "ENVI", f"samples = {cols}", f"lines = {rows}",
            f"bands = {bands}", "header offset = 0",
            f"data type = {_ENVI_CODES[key]}", f"interleave = {il}",
            f"byte order = {0 if byte_order == '<' else 1}",
            f"map info = {mi}",
        ]
        if nodata is not None:
            lines.append(f"data ignore value = {nodata!r}")
        with open(base + ".hdr", "w") as fh:
            fh.write("\n".join(lines) + "\n")
    else:
        raise ValueError(f"dialect must be 'esri' or 'envi', got {dialect!r}")
