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


def read_hgt(path: str) -> Tuple[np.ndarray, GridSpec]:
    """Read one SRTM tile -> (float64 array, voids as NaN, GridSpec)."""
    with open(path, "rb") as fh:
        data = fh.read()
    n = math.isqrt(len(data) // 2)
    if n < 2 or 2 * n * n != len(data):
        raise ValueError(
            f".hgt must be a square of int16 samples; {len(data)} bytes "
            f"is not 2*n*n for any n >= 2: {path}"
        )
    lat, lon = parse_hgt_name(path)
    a = np.frombuffer(data, dtype=">i2").reshape(n, n).astype(np.float64)
    a[a == VOID] = np.nan
    return a, _tile_grid(lat, lon, n)


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
