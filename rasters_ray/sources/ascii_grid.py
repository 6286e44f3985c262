"""ESRI ASCII grid (.asc) — the plain-text raster exchange format
(Arc/Info ASCIIGRID; the reference reads it through rasterio's AAIGrid
driver, rasters/raster.py:634-771).

Header: ``ncols nrows xllcorner|xllcenter yllcorner|yllcenter cellsize
[nodata_value]`` (case-insensitive, any order after ncols/nrows), then
rows of whitespace-separated samples, top row first. Cells are square
(one ``cellsize``); the grid's top-left corner is
``(xll, yll + nrows * cellsize)``.

Values parse as float64; ``nodata_value`` samples become NaN (the
engine's invalid convention). A ``.crs`` sidecar next to the file
overrides the EPSG:4326 default, matching the world-file image route
(sources/open.py::_sidecar_grid).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..grids.gridspec import GridSpec

_HEADER_KEYS = (
    "ncols", "nrows", "xllcorner", "xllcenter", "yllcorner", "yllcenter",
    "cellsize", "nodata_value",
)


def read_ascii_grid(path: str) -> Tuple[np.ndarray, GridSpec]:
    """Parse an ESRI ASCII grid -> (float64 array, GridSpec)."""
    with open(path, "r") as fh:
        text = fh.read()
    pos = 0
    hdr = {}
    lines = text.splitlines()
    n_hdr = 0
    for line in lines:
        parts = line.split()
        if len(parts) == 2 and parts[0].lower() in _HEADER_KEYS:
            hdr[parts[0].lower()] = float(parts[1])
            n_hdr += 1
        else:
            break
    if "ncols" not in hdr or "nrows" not in hdr or "cellsize" not in hdr:
        raise ValueError(
            f"not an ESRI ASCII grid (header keys {sorted(hdr)}): {path}"
        )
    cols = int(hdr["ncols"])
    rows = int(hdr["nrows"])
    cs = hdr["cellsize"]
    if "xllcorner" in hdr:
        xll = hdr["xllcorner"]
    elif "xllcenter" in hdr:
        xll = hdr["xllcenter"] - cs / 2.0
    else:
        raise ValueError(f"ASCII grid without xllcorner/xllcenter: {path}")
    if "yllcorner" in hdr:
        yll = hdr["yllcorner"]
    elif "yllcenter" in hdr:
        yll = hdr["yllcenter"] - cs / 2.0
    else:
        raise ValueError(f"ASCII grid without yllcorner/yllcenter: {path}")

    body = "\n".join(lines[n_hdr:])
    arr = np.array(body.split(), dtype=np.float64)
    if arr.size != rows * cols:
        raise ValueError(
            f"ASCII grid body has {arr.size} samples, expected "
            f"{rows}x{cols}={rows * cols}: {path}"
        )
    arr = arr.reshape(rows, cols)
    nd = hdr.get("nodata_value")
    if nd is not None:
        arr = np.where(arr == nd, np.nan, arr)

    crs = "EPSG:4326"
    base = os.path.splitext(path)[0]
    for sc in (base + ".prj", base + ".crs"):  # .prj WKT wins (GDAL/ESRI)
        if os.path.exists(sc):
            crs = open(sc).read().strip()
            break
    grid = GridSpec(
        crs=crs, x_origin=xll, y_origin=yll + rows * cs,
        cell_width=cs, cell_height=-cs, rows=rows, cols=cols,
    )
    return arr, grid


def write_ascii_grid(
    arr: np.ndarray, grid: GridSpec, path: str,
    nodata: float = -9999.0, fmt: str = "%.10g",
) -> None:
    """Write an ESRI ASCII grid. Requires square cells (the format has
    one ``cellsize``); NaNs become ``nodata``. A non-4326 CRS is
    recorded in a ``.crs`` sidecar (the format itself is CRS-less)."""
    arr = np.asarray(arr, dtype=np.float64)
    if arr.ndim != 2:
        raise ValueError(f"ASCII grid takes a 2D array, got {arr.shape}")
    if abs(grid.cell_width + grid.cell_height) > 1e-12 * abs(grid.cell_width):
        raise ValueError(
            "ESRI ASCII grids require square cells: "
            f"cell_width={grid.cell_width}, cell_height={grid.cell_height}"
        )
    rows, cols = arr.shape
    yll = grid.y_origin + grid.cell_height * rows
    body = np.where(np.isnan(arr), nodata, arr)
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "w") as fh:
        fh.write(
            f"ncols {cols}\nnrows {rows}\n"
            f"xllcorner {grid.x_origin!r}\nyllcorner {yll!r}\n"
            f"cellsize {grid.cell_width!r}\nnodata_value {nodata!r}\n"
        )
        np.savetxt(fh, body, fmt=fmt)
    os.replace(tmp, path)
    if grid.crs != "EPSG:4326":
        with open(os.path.splitext(path)[0] + ".crs", "w") as fh:
            fh.write(grid.crs)
