"""GeoJSON import/export for the vector tables (VectorGeometry.to_geojson,
vector_geometry.py:116-123, and wrap_geometry's GeoJSON-string input,
wrap_geometry.py:19-81) — driver-side utilities (vector sets are the small
broadcast side)."""

from __future__ import annotations

import json
from typing import List

import pyarrow as pa

from .vectors import RING_TYPE


def polygons_to_geojson(polygons: pa.Table) -> str:
    feats = []
    for i in range(polygons.num_rows):
        rings = polygons.column("rings")[i].as_py()
        coords = [[[p["x"], p["y"]] for p in ring] for ring in rings]
        feats.append(
            {
                "type": "Feature",
                "properties": {"poly_id": polygons.column("poly_id")[i].as_py()},
                "geometry": {"type": "Polygon", "coordinates": coords},
            }
        )
    return json.dumps({"type": "FeatureCollection", "features": feats})


def geojson_to_polygons(text: str, crs: str = "EPSG:4326") -> pa.Table:
    obj = json.loads(text)
    feats = obj["features"] if obj.get("type") == "FeatureCollection" else [obj]
    ids: List[str] = []
    rings_out = []
    for i, f in enumerate(feats):
        geom = f.get("geometry", f)
        if geom["type"] == "Polygon":
            polys = [geom["coordinates"]]
        elif geom["type"] == "MultiPolygon":
            polys = geom["coordinates"]
        else:
            raise ValueError(f"unsupported GeoJSON type: {geom['type']}")
        for j, rings in enumerate(polys):
            pid = f.get("properties", {}).get("poly_id") or f"poly{i:04d}"
            if len(polys) > 1:
                pid = f"{pid}_{j}"
            ids.append(pid)
            rings_out.append([[{"x": float(x), "y": float(y)} for x, y in ring] for ring in rings])
    return pa.table(
        {
            "poly_id": pa.array(ids, pa.string()),
            "rings": pa.array(rings_out, RING_TYPE),
            "crs": pa.array([crs] * len(ids), pa.string()),
        }
    )


def points_to_geojson(points: pa.Table) -> str:
    feats = []
    for i in range(points.num_rows):
        feats.append(
            {
                "type": "Feature",
                "properties": {"point_id": points.column("point_id")[i].as_py()},
                "geometry": {
                    "type": "Point",
                    "coordinates": [
                        points.column("x")[i].as_py(),
                        points.column("y")[i].as_py(),
                    ],
                },
            }
        )
    return json.dumps({"type": "FeatureCollection", "features": feats})
