"""Small geometric operators completing the SURVEY.md §2 inventory.

- ``trim_bounds`` / ``trim``: crop to non-empty rows/cols (raster.py:987-1004)
- ``boundary_ring``: clockwise boundary polygon of a grid
  (raster_geometry.py:165-211, raster_grid.py:553-574)
- ``crosses_antimeridian``: grid form of the wedge test — a north-oriented
  affine grid crosses iff its x extent spans lon 180 after normalization
  (raster_geometry.py:566-607's polygon test reduces to this for
  rectangular extents); swath form checks the wrapped-width heuristic
  (raster_geolocation.py:219-236)
- ``pixel_centroids`` / ``pixel_outlines``: raster -> vector explode
  (raster_geometry.py:1111-1144, raster.py:1487-1492)
- ``grids_intersect``: bbox intersection predicate in a common CRS
  (raster_geometry.py:610-622)
- ``point_distance`` / ``point_distances``: projected Euclidean distances
  (point.py:263-351)
- ``latlon``: geographic coordinate arrays of any grid
  (raster_geometry.py:333-375)
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..proj import crs_equal, transform_xy
from . import bbox as bboxmod
from .gridspec import GridSpec, Window
from .swath import SwathSpec


def trim_bounds(arr: np.ndarray) -> Window:
    """Window of the non-empty (any finite pixel) bounding rows/cols."""
    valid = np.isfinite(arr)
    rows = np.nonzero(valid.any(axis=1))[0]
    cols = np.nonzero(valid.any(axis=0))[0]
    if rows.size == 0:
        return Window(col_off=0, row_off=0, width=0, height=0)
    return Window(
        col_off=int(cols.min()),
        row_off=int(rows.min()),
        width=int(cols.max() - cols.min() + 1),
        height=int(rows.max() - rows.min() + 1),
    )


def trim(arr: np.ndarray, grid: GridSpec) -> Tuple[np.ndarray, GridSpec]:
    win = trim_bounds(arr)
    rs, cs = win.toslices()
    return arr[rs, cs], grid.subset(win)


def boundary_ring(grid: GridSpec, points_per_edge: int = 16) -> np.ndarray:
    """(k, 2) clockwise corner-boundary ring of the grid extent."""
    xmin, ymin, xmax, ymax = grid.bbox
    xs, ys = bboxmod.densify((xmin, ymin, xmax, ymax), points_per_edge)
    # densify goes counterclockwise from (xmin,ymin); reverse for clockwise
    return np.column_stack([xs[::-1], ys[::-1]])


def crosses_antimeridian(spec) -> bool:
    if isinstance(spec, GridSpec):
        xmin, _, xmax, _ = spec.bbox
        # normalize: grid coordinates may legitimately run past 180
        return bool(xmin < 180.0 < xmax or xmin < -180.0 < xmax)
    if isinstance(spec, SwathSpec):
        # wrapped swath: clipped coords hug both edges (raster_geolocation clip)
        return bool(spec.x.min() < -179.0 and spec.x.max() > 179.0)
    raise TypeError(type(spec))


def pixel_centroids(grid: GridSpec) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(row, col, x, y) arrays — one row per cell (raster->vector explode)."""
    x, y = grid.xy()
    rr, cc = np.meshgrid(np.arange(grid.rows), np.arange(grid.cols), indexing="ij")
    return rr.ravel(), cc.ravel(), x.ravel(), y.ravel()


def pixel_outlines(grid: GridSpec) -> List[np.ndarray]:
    """Per-cell corner boxes as (5, 2) rings (row-major order)."""
    out = []
    for r in range(grid.rows):
        for c in range(grid.cols):
            x0 = grid.x_origin + c * grid.cell_width
            y0 = grid.y_origin + r * grid.cell_height
            x1 = x0 + grid.cell_width
            y1 = y0 + grid.cell_height
            out.append(np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]))
    return out


def grids_intersect(a: GridSpec, b: GridSpec) -> bool:
    """bbox-intersection predicate in a's CRS (raster_geometry.py:610-622)."""
    bb = b.bbox
    if not crs_equal(a.crs, b.crs):
        bb = bboxmod.transform(bb, b.crs, a.crs)
    return bboxmod.intersects(a.bbox, bb)


def latlon(grid: GridSpec) -> Tuple[np.ndarray, np.ndarray]:
    """Geographic (lat, lon) center arrays for any grid CRS
    (raster_geometry.py:333-375; invalid -> NaN via transform clipping)."""
    x, y = grid.xy()
    if crs_equal(grid.crs, "EPSG:4326"):
        return y, x
    lon, lat = transform_xy(x, y, grid.crs, "EPSG:4326")
    return lat, lon


def point_distance(x0: float, y0: float, x1: float, y1: float, crs: str = "EPSG:4326") -> float:
    """Projected Euclidean distance; geographic inputs are projected to the
    local UTM of the first point first (point.py:263-303 behavior)."""
    from ..proj.crs import is_geographic, local_UTM_proj4

    if is_geographic(crs):
        utm = local_UTM_proj4(y0, x0)
        (ex0, ex1), (ny0, ny1) = transform_xy([x0, x1], [y0, y1], crs, utm)
        return float(np.hypot(ex1 - ex0, ny1 - ny0))
    return float(np.hypot(x1 - x0, y1 - y0))


def point_distances(x0: float, y0: float, xs, ys, crs: str = "EPSG:4326") -> np.ndarray:
    """Vectorized distances from one point to many (point.py:305-351)."""
    from ..proj.crs import is_geographic, local_UTM_proj4

    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if is_geographic(crs):
        utm = local_UTM_proj4(y0, x0)
        ex, ny = transform_xy(np.append(xs, x0), np.append(ys, y0), crs, utm)
        return np.hypot(ex[:-1] - ex[-1], ny[:-1] - ny[-1])
    return np.hypot(xs - x0, ys - y0)


_EARTH_R = 6371007.1809  # authalic sphere radius (NSIDC EASE-Grid 2.0)


def cell_areas(grid: GridSpec) -> np.ndarray:
    """Per-ROW cell area in m^2 (length ``rows``; every cell in a row
    of a north-oriented affine grid has the same area). Geographic
    grids use the graticule-cell formula on the authalic sphere,
    A = R^2 * dlon * (sin(lat_top) - sin(lat_bottom)) — the standard
    weight for area-weighted raster statistics (each row's band area;
    exact on the sphere, no quadrature). Projected grids are planar:
    cell_width * |cell_height| (equal-area CRSs make this the true
    area; conformal CRSs carry their documented distortion, same as
    the reference's projected-`cell_size` semantics)."""
    from ..proj import is_geographic

    if not is_geographic(grid.crs):
        return np.full(grid.rows,
                       grid.cell_width * abs(grid.cell_height)
                       * np.ones(1)[0])
    i = np.arange(grid.rows, dtype=np.float64)
    lat_t = np.radians(grid.y_origin + grid.cell_height * i)
    lat_b = np.radians(grid.y_origin + grid.cell_height * (i + 1.0))
    dlon = np.radians(grid.cell_width)
    return (_EARTH_R * _EARTH_R) * dlon * (np.sin(lat_t) - np.sin(lat_b))


def grid_area(grid: GridSpec) -> float:
    """Total grid area in m^2 — the telescoped form of summing
    ``cell_areas``: R^2 * (dlon * cols) * (sin(top) - sin(bottom))
    for geographic grids (one expression, no accumulation-order
    dependence), planar width*height*cells for projected."""
    from ..proj import is_geographic

    if not is_geographic(grid.crs):
        return (grid.cell_width * abs(grid.cell_height)
                * grid.rows * grid.cols)
    top = np.radians(grid.y_origin)
    bot = np.radians(grid.y_origin + grid.cell_height * grid.rows)
    dlon = np.radians(grid.cell_width)
    return float((_EARTH_R * _EARTH_R) * (dlon * grid.cols)
                 * (np.sin(top) - np.sin(bot)))


def area_weighted_mean(arr: np.ndarray, grid: GridSpec) -> float:
    """Latitude-weighted mean of a raster (NaN-aware) — the
    cos-weighting every geographic-grid statistic needs (plain means
    over-count the poles)."""
    w = cell_areas(grid)[:, None] * np.isfinite(arr)
    tot = float(np.sum(w))
    if tot == 0.0:
        return float("nan")
    return float(np.nansum(arr * w) / tot)
