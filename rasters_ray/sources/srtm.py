"""SRTM ``.hgt`` height tiles — the raw NASA/USGS DEM exchange format
(the reference reads it through rasterio's SRTMHGT driver,
rasters/raster.py:634-771).

An ``.hgt`` file is a bare square of BIG-ENDIAN int16 samples, north
row first, with NO header and NO magic: everything else comes from
convention —

- the filename carries the tile's SOUTH-WEST corner
  (``N37W105.hgt`` -> lat 37, lon -105; ``S09E112`` etc.),
- the tile spans exactly 1 x 1 degree with samples at the grid NODES
  inclusive of both edges, so an n x n file has
  ``cell = 1 / (n - 1)`` degrees and the conventional (GDAL SRTMHGT)
  pixel-center registration puts the top-left CELL edge at
  ``(lon - cell/2, lat + 1 + cell/2)``,
- the file size alone disambiguates resolution (2 x 3601^2 bytes for
  SRTM-1, 2 x 1201^2 for SRTM-3); any square size is accepted here so
  synthetic tiles test the same path,
- the void value ``-32768`` means "no data" and becomes NaN (the
  engine's invalid convention, like GDAL's nodata mapping).

``write_hgt`` emits the same layout (NaN -> -32768) so the reader is
proven by round-trip, mirroring the other container modules.
"""

from __future__ import annotations

import math
import os
import re
from typing import Tuple

import numpy as np

from ..grids.gridspec import GridSpec

VOID = -32768

_NAME_RE = re.compile(r"([NSns])(\d{1,2})([EWew])(\d{1,3})")


def parse_hgt_name(path: str) -> Tuple[int, int]:
    """``.../N37W105.hgt`` -> (37, -105): the tile's SW corner. The
    lat/lon token may sit anywhere in the basename (real mirrors ship
    names like ``N37W105.SRTMGL1.hgt``)."""
    m = _NAME_RE.search(os.path.basename(path))
    if m is None:
        raise ValueError(
            "SRTM .hgt files are georeferenced by filename "
            f"(e.g. N37W105.hgt); cannot parse {os.path.basename(path)!r}"
        )
    lat = int(m.group(2)) * (1 if m.group(1).upper() == "N" else -1)
    lon = int(m.group(4)) * (1 if m.group(3).upper() == "E" else -1)
    if lat < -90 or lat > 89 or lon < -180 or lon > 179:
        raise ValueError(f"SW corner ({lat}, {lon}) outside the globe: {path}")
    return lat, lon


def _tile_grid(lat: int, lon: int, n: int) -> GridSpec:
    cell = 1.0 / (n - 1)
    return GridSpec(
        crs="EPSG:4326",
        x_origin=lon - cell / 2.0,
        y_origin=lat + 1 + cell / 2.0,
        cell_width=cell, cell_height=-cell, rows=n, cols=n,
    )


def read_hgt(path: str,
             window: Tuple[int, int, int, int] = None,
             ) -> Tuple[np.ndarray, GridSpec]:
    """Read one SRTM tile -> (float64 array, voids as NaN, GridSpec).
    ``window=(row_off, col_off, height, width)`` seeks to just those
    rows (clamped) — the AOI path shared with the TIFF and raw-binary
    readers — and returns the window-shifted grid."""
    size = os.path.getsize(path)
    n = math.isqrt(size // 2)
    if n < 2 or 2 * n * n != size:
        raise ValueError(
            f".hgt must be a square of int16 samples; {size} bytes "
            f"is not 2*n*n for any n >= 2: {path}"
        )
    lat, lon = parse_hgt_name(path)
    grid = _tile_grid(lat, lon, n)
    if window is None:
        r0, c0, h, w = 0, 0, n, n
    else:
        r0 = max(0, min(int(window[0]), n))
        c0 = max(0, min(int(window[1]), n))
        h = max(0, min(int(window[2]), n - r0))
        w = max(0, min(int(window[3]), n - c0))
        if h == 0 or w == 0:
            raise ValueError(f"window {window} is empty after clamping")
    with open(path, "rb") as fh:
        fh.seek(2 * r0 * n)
        a = np.frombuffer(fh.read(2 * h * n), dtype=">i2")
    a = a.reshape(h, n)[:, c0:c0 + w].astype(np.float64)
    a[a == VOID] = np.nan
    if window is not None:
        grid = GridSpec(
            crs=grid.crs,
            x_origin=grid.x_origin + c0 * grid.cell_width,
            y_origin=grid.y_origin + r0 * grid.cell_height,
            cell_width=grid.cell_width, cell_height=grid.cell_height,
            rows=h, cols=w,
        )
    return a, grid


def write_hgt(arr: np.ndarray, path: str) -> None:
    """Write an SRTM tile. ``arr`` must be square; NaNs become the
    -32768 void; finite values must fit int16 above the void (the
    format has no other representation). The basename must carry the
    SW-corner token (it IS the georeferencing)."""
    parse_hgt_name(path)  # raises early on an unparseable name
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim != 2 or a.shape[0] != a.shape[1] or a.shape[0] < 2:
        raise ValueError(f".hgt tiles are square n x n, n >= 2; got {a.shape}")
    finite = a[~np.isnan(a)]
    if finite.size and (finite.min() <= VOID or finite.max() > 32767):
        raise ValueError(
            ".hgt samples are int16 with -32768 reserved for void; "
            f"data range [{finite.min()}, {finite.max()}] does not fit"
        )
    out = np.where(np.isnan(a), VOID, np.rint(a)).astype(">i2")
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(out.tobytes())
    os.replace(tmp, path)
