"""Geometry input normalization + point buffering.

``wrap_geometry`` is the engine's analog of the reference's single-entry
dispatcher (wrap_geometry.py:19-81): it accepts every geometry input form
the API takes and returns one of the engine's canonical representations:

- ``GridSpec`` / ``SwathSpec``      -> passed through (RasterGeometry case)
- grid/swath ``dict``               -> ``GridSpec.from_dict`` / ``SwathSpec.from_dict``
- 4-number sequence                 -> ``("bbox", (xmin, ymin, xmax, ymax))``
- ``(x, y)`` pair / list of pairs   -> points table ``(point_id, x, y, crs)``
- GeoJSON string or mapping         -> points table (Point/MultiPoint) or
                                       polygons table (Polygon/MultiPolygon)
- points/polygons ``pa.Table``      -> passed through

GeoSeries inputs (wrap_geometry.py:57-58) are out of scope: geopandas is
not a dependency of this engine.

``point_buffer`` is Point.buffer (point.py:184-238): a point -> circular
polygon with ``4 * quadsegs`` segments (shapely's resolution semantics:
segments per quarter circle), returned in the engine's rings encoding so
it can feed ``rasterize_mask`` / ``pip_join`` / buffered windows directly.
"""

from __future__ import annotations

import json
from typing import Any, List, Optional, Sequence, Tuple, Union

import numpy as np
import pyarrow as pa

from .gridspec import GridSpec
from .swath import SwathSpec

WGS84 = "EPSG:4326"


def point_buffer(
    x: float,
    y: float,
    distance: float,
    resolution: int = 16,
    quadsegs: Optional[int] = None,
) -> List[dict]:
    """Circular buffer ring around (x, y): ``4 * quadsegs`` CCW segments
    (quadsegs defaults to ``resolution``, matching shapely's Point.buffer
    parameterization used by the reference, point.py:184-238). Distance is
    in the point's CRS units. Returns one closed ring in the engine's
    ``[{"x": ..., "y": ...}, ...]`` encoding."""
    q = int(quadsegs if quadsegs is not None else resolution)
    if q < 1:
        raise ValueError("quadsegs/resolution must be >= 1")
    if distance <= 0:
        raise ValueError("buffer distance must be positive")
    n = 4 * q
    ang = 2.0 * np.pi * np.arange(n + 1) / n
    xs = x + distance * np.cos(ang)
    ys = y + distance * np.sin(ang)
    xs[-1] = xs[0]  # exact closure
    ys[-1] = ys[0]
    return [{"x": float(a), "y": float(b)} for a, b in zip(xs, ys)]


def buffered_points_to_polygons(
    points: pa.Table, distance: float, quadsegs: int = 16
) -> pa.Table:
    """points table -> polygons table of per-point buffer circles (the
    buffered-point sampling windows of raster.py:723-724)."""
    from ..sources.vectors import RING_TYPE

    ids = points.column("point_id").to_pylist()
    xs = points.column("x").to_numpy(zero_copy_only=False)
    ys = points.column("y").to_numpy(zero_copy_only=False)
    rings = [[point_buffer(float(x), float(y), distance, quadsegs=quadsegs)]
             for x, y in zip(xs, ys)]
    return pa.table(
        {
            "poly_id": pa.array([f"buf_{p}" for p in ids], pa.string()),
            "rings": pa.array(rings, RING_TYPE),
        }
    )


def _points_table(coords: np.ndarray, crs: str) -> pa.Table:
    coords = np.atleast_2d(np.asarray(coords, dtype=np.float64))
    return pa.table(
        {
            "point_id": pa.array([f"pt{i:06d}" for i in range(len(coords))], pa.string()),
            "x": pa.array(coords[:, 0], pa.float64()),
            "y": pa.array(coords[:, 1], pa.float64()),
            "crs": pa.array([crs] * len(coords), pa.string()),
        }
    )


def _polygons_table(polys: List[List[List[Tuple[float, float]]]]) -> pa.Table:
    from ..sources.vectors import RING_TYPE

    rings = [
        [[{"x": float(x), "y": float(y)} for x, y in ring] for ring in poly]
        for poly in polys
    ]
    return pa.table(
        {
            "poly_id": pa.array([f"poly{i:04d}" for i in range(len(polys))], pa.string()),
            "rings": pa.array(rings, RING_TYPE),
        }
    )


def _from_geojson(obj: dict, crs: str):
    t = obj.get("type")
    if t == "FeatureCollection":
        geoms = [f["geometry"] for f in obj.get("features", [])]
        if geoms and all(g.get("type") in ("Polygon", "MultiPolygon") for g in geoms):
            polys = []
            for g in geoms:
                cs = g["coordinates"]
                polys.extend(cs if g["type"] == "MultiPolygon" else [cs])
            return _polygons_table(polys)
        coords = []
        for g in geoms:
            if g.get("type") == "Point":
                coords.append(g["coordinates"])
            elif g.get("type") == "MultiPoint":
                coords.extend(g["coordinates"])
            else:
                raise ValueError(f"mixed/unsupported FeatureCollection geometry: {g.get('type')}")
        return _points_table(np.asarray(coords), crs)
    if t == "Point":
        return _points_table(np.asarray([obj["coordinates"]]), crs)
    if t == "MultiPoint":
        return _points_table(np.asarray(obj["coordinates"]), crs)
    if t == "Polygon":
        return _polygons_table([obj["coordinates"]])
    if t == "MultiPolygon":
        return _polygons_table(list(obj["coordinates"]))
    raise ValueError(f"unsupported GeoJSON type: {t}")


def wrap_geometry(geometry: Any, crs: Union[str, None] = None):
    """Normalize any accepted geometry input (see module docstring).
    Mirrors wrap_geometry.py:19-81: None passes through, canonical objects
    pass through, strings parse as GeoJSON, everything else dispatches on
    shape; unsupported types raise ValueError."""
    crs = crs or WGS84
    if geometry is None:
        return None
    if isinstance(geometry, (GridSpec, SwathSpec)):
        return geometry
    if isinstance(geometry, pa.Table):
        return geometry
    if isinstance(geometry, str):
        return _from_geojson(json.loads(geometry), crs)
    if isinstance(geometry, dict):
        t = geometry.get("type")
        if t == "swath":
            return SwathSpec.from_dict(geometry)
        if t == "grid" or "x_origin" in geometry:
            return GridSpec.from_dict(geometry)
        return _from_geojson(geometry, crs)
    if isinstance(geometry, (tuple, list, np.ndarray)):
        arr = np.asarray(geometry, dtype=object)
        flat_numeric = all(isinstance(v, (int, float, np.floating, np.integer))
                           for v in np.ravel(arr)) and np.asarray(geometry).ndim == 1
        seq = np.asarray(geometry, dtype=np.float64) if flat_numeric else None
        if seq is not None and seq.shape == (4,):
            return ("bbox", tuple(float(v) for v in seq))
        if seq is not None and seq.shape == (2,):
            return _points_table(seq[None, :], crs)
        try:
            pts = np.asarray(geometry, dtype=np.float64)
        except (TypeError, ValueError):
            raise ValueError(f"unsupported geometry input: {type(geometry)}") from None
        if pts.ndim == 2 and pts.shape[1] == 2:
            return _points_table(pts, crs)
    raise ValueError(f"unsupported geometry input: {type(geometry)}")
