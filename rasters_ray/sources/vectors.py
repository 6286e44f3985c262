"""Deterministic vector-side tables: points and polygons (FIXTURES.md §3-4)
plus the oracle-profile points derived from the driver's TPC-H-ish tables
(so the DuckDB oracle can recompute them from the same views).

Schemas (SURVEY.md §1.4):
- points:   point_id:string, x:f64, y:f64, crs:string
- polygons: poly_id:string, rings:list<list<struct<x:f64,y:f64>>>, crs:string
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa

RING_TYPE = pa.list_(pa.list_(pa.struct([("x", pa.float64()), ("y", pa.float64())])))

POINTS_SCHEMA = pa.schema(
    [("point_id", pa.string()), ("x", pa.float64()), ("y", pa.float64()), ("crs", pa.string())]
)

POLYGONS_SCHEMA = pa.schema(
    [("poly_id", pa.string()), ("rings", RING_TYPE), ("crs", pa.string())]
)


def oracle_points_from_keys(keys: np.ndarray) -> pa.Table:
    """Points derived from an integer key column (e.g. customer.c_custkey),
    recomputable in SQL:

        x = -124.0 + (k % 800) * 0.01 + 0.001
        y =   44.0 - ((k // 7) % 800) * 0.01 - 0.001
        (k % 97 == 0) -> x shifted +50 (deliberate out-of-bounds misses)

    The +0.001 offset keeps points off exact cell-center half boundaries so
    float64 rounding is unambiguous on both engines."""
    k = np.asarray(keys, dtype=np.int64)
    x = -124.0 + (k % 800).astype(np.float64) * 0.01 + 0.001
    y = 44.0 - ((k // 7) % 800).astype(np.float64) * 0.01 - 0.001
    x = np.where(k % 97 == 0, x + 50.0, x)
    return pa.table(
        {
            "point_id": pa.array([f"pt{int(i):06d}" for i in k], pa.string()),
            "x": pa.array(x, pa.float64()),
            "y": pa.array(y, pa.float64()),
            "crs": pa.array(["EPSG:4326"] * len(k), pa.string()),
        }
    )


def fixture_points(n: int, seed: int = 42) -> pa.Table:
    """FIXTURES.md §3: uniform over the image extent, 5% out-of-bounds,
    plus exact cell-boundary points for rounding-parity tests."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-125.0, -110.0, n)
    y = rng.uniform(30.0, 45.0, n)
    oob = rng.random(n) < 0.05
    x = np.where(oob, x + 100.0, x)
    # boundary points: x on exact cell edges of the G1 lattice
    n_edge = max(1, n // 20)
    x[:n_edge] = -120.0 + np.arange(n_edge) * 0.01
    y[:n_edge] = 40.0 - np.arange(n_edge) * 0.01
    crs = np.where(rng.random(n) < 0.9, "EPSG:4326", "EPSG:32610")
    # UTM batch: project the coords so they are valid in that CRS
    utm_sel = crs == "EPSG:32610"
    if utm_sel.any():
        from ..proj import transform_xy

        ux, uy = transform_xy(x[utm_sel], y[utm_sel], "EPSG:4326", "EPSG:32610")
        x[utm_sel] = ux
        y[utm_sel] = uy
    return pa.table(
        {
            "point_id": pa.array([f"pt{i:06d}" for i in range(n)], pa.string()),
            "x": pa.array(x, pa.float64()),
            "y": pa.array(y, pa.float64()),
            "crs": pa.array(crs.tolist(), pa.string()),
        }
    )


def _ring(coords: List[Tuple[float, float]]):
    return [{"x": float(x), "y": float(y)} for x, y in coords]


def fixture_polygons(n: int = 32, seed: int = 42) -> pa.Table:
    """FIXTURES.md §4: the reference-test golden boxes + random convex
    polygons + one polygon with a hole."""
    polys = [
        # golden boxes from tests/test_subsetting.py (all inside G1)
        [_ring([(-119.95, 39.95), (-119.90, 39.95), (-119.90, 39.90), (-119.95, 39.90), (-119.95, 39.95)])],
        [_ring([(-119.8, 39.8), (-119.2, 39.8), (-119.2, 39.2), (-119.8, 39.2), (-119.8, 39.8)])],
        [_ring([(-119.55, 39.55), (-119.45, 39.55), (-119.45, 39.45), (-119.55, 39.45), (-119.55, 39.55)])],
        # polygon with a hole
        [
            _ring([(-119.9, 39.9), (-119.1, 39.9), (-119.1, 39.1), (-119.9, 39.1), (-119.9, 39.9)]),
            _ring([(-119.6, 39.6), (-119.4, 39.6), (-119.4, 39.4), (-119.6, 39.4), (-119.6, 39.6)]),
        ],
    ]
    rng = np.random.default_rng(seed)
    while len(polys) < n:
        cx = rng.uniform(-124.0, -111.0)
        cy = rng.uniform(31.0, 44.0)
        r = rng.uniform(0.05, 1.0)
        k = rng.integers(3, 9)
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        ring = [(cx + r * np.cos(a), cy + r * np.sin(a)) for a in ang]
        ring.append(ring[0])
        polys.append([_ring(ring)])
    return pa.table(
        {
            "poly_id": pa.array([f"poly{i:04d}" for i in range(len(polys))], pa.string()),
            "rings": pa.array(polys, RING_TYPE),
            "crs": pa.array(["EPSG:4326"] * len(polys), pa.string()),
        }
    )


def rings_to_numpy(rings_value) -> List[np.ndarray]:
    """Arrow rings cell -> list of (k, 2) float64 arrays (exterior first)."""
    out = []
    for ring in rings_value:
        pts = np.array([(p["x"], p["y"]) for p in ring], dtype=np.float64)
        out.append(pts)
    return out


def read_vector_file(path: str, kind: str = "auto") -> pa.Table:
    """One vector file -> the engine's Arrow vector table. Shapefiles
    route by the .shp extension, GeoParquet by .parquet/.geoparquet;
    everything else is parsed as GeoJSON
    (FeatureCollection or bare geometry). ``kind`` ('points' or
    'polygons') asserts the schema class for pipelines that need one;
    'auto' returns whatever the file holds."""
    import os

    ext = os.path.splitext(path)[1].lower()
    if ext == ".shp":
        from .shapefile import read_shapefile

        t = read_shapefile(path)
    elif ext in (".parquet", ".geoparquet"):
        from .geoparquet import read_geoparquet

        t = read_geoparquet(path)
    elif ext in (".csv", ".tsv"):
        t = csv_to_vectors(path)
    else:
        from .geojson import geojson_to_polygons

        t = geojson_to_polygons(open(path).read())
    have = ("points" if "x" in t.column_names
            else "polygons" if "rings" in t.column_names else "lines")
    if kind != "auto" and kind != have:
        raise ValueError(f"{path} holds {have}, pipeline expects {kind}")
    return t


_CSV_X = ("x", "lon", "longitude", "lng")
_CSV_Y = ("y", "lat", "latitude")
_CSV_WKT = ("wkt", "geometry", "geom")
_CSV_ID = ("point_id", "poly_id", "line_id", "id", "name")


def csv_to_vectors(path: str, crs: str = "EPSG:4326") -> "pa.Table":
    """CSV/TSV -> the engine's vector table. Column sniffing follows
    the common conventions: a WKT text column (wkt/geometry/geom)
    wins; else x/y (or lon/lat, longitude/latitude) numeric columns
    make a points table. Remaining columns ride along as attributes;
    a ``.prj``/``.crs`` sidecar overrides the 4326 default (reference:
    geopandas' points_from_xy CSV recipe)."""
    import os

    import pyarrow.csv as pacsv

    opts = pacsv.ParseOptions(delimiter="\t" if path.endswith(".tsv")
                              else ",")
    t = pacsv.read_csv(path, parse_options=opts)
    base = os.path.splitext(path)[0]
    for sc in (base + ".prj", base + ".crs"):
        if os.path.exists(sc):
            crs = open(sc).read().strip()
            break
    names = {c.lower(): c for c in t.column_names}
    wkt_col = next((names[c] for c in _CSV_WKT
                    if c in names and pa.types.is_string(
                        t.schema.field(names[c]).type)), None)
    id_col = next((names[c] for c in _CSV_ID if c in names), None)
    ids = (t.column(id_col).to_pylist() if id_col
           else [f"csv{i:06d}" for i in range(t.num_rows)])
    ids = [str(v) for v in ids]
    if wkt_col is not None:
        from .wkb import decode_wkt, encode_wkb

        blobs = [encode_wkb(*decode_wkt(s))
                 for s in t.column(wkt_col).to_pylist()]
        extra = {c: t.column(c).to_pylist() for c in t.column_names
                 if c not in (wkt_col, id_col)}
        from .wkb import wkb_column_to_table

        return wkb_column_to_table(ids, blobs, crs=crs, extra=extra)
    x_col = next((names[c] for c in _CSV_X if c in names), None)
    y_col = next((names[c] for c in _CSV_Y if c in names), None)
    if x_col is None or y_col is None:
        raise ValueError(
            f"{path}: no WKT column ({'/'.join(_CSV_WKT)}) and no "
            f"coordinate pair ({'/'.join(_CSV_X)} x {'/'.join(_CSV_Y)}) "
            f"among {t.column_names}")
    data = {"point_id": pa.array(ids, pa.string()),
            "x": t.column(x_col).cast(pa.float64()),
            "y": t.column(y_col).cast(pa.float64()),
            "crs": pa.array([crs] * t.num_rows, pa.string())}
    for c in t.column_names:
        if c not in (x_col, y_col, id_col) and c not in data:
            data[c] = t.column(c)
    return pa.table(data)


def vector_dataset(paths: List[str], kind: str = "polygons"):
    """Streaming vector ingest (the vector side of raster_dataset): one
    Ray task per file batch, parsed ON WORKERS into a uniformly-typed
    dataset ready for pip_join/rasterize/point stages; a source_file
    column keeps lineage. All files must hold the same schema class."""
    import os

    import ray.data as rd

    def load(batch: pa.Table) -> pa.Table:
        parts = []
        for p in batch.column("path").to_pylist():
            t = read_vector_file(p, kind=kind)
            parts.append(t.append_column(
                "source_file",
                pa.array([os.path.basename(p)] * t.num_rows, pa.string())))
        return pa.concat_tables(parts, promote_options="default")

    return rd.from_items([{"path": p} for p in paths]).map_batches(
        load, batch_format="pyarrow")
