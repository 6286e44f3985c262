"""Vector reprojection (VectorGeometry.to_crs parity,
rasters/vector_geometry.py:59) and CSV/TSV vector ingest (geopandas
points_from_xy recipe parity)."""

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray.proj import transform_xy
from rasters_ray.sources.vectors import (csv_to_vectors, fixture_polygons,
                                         read_vector_file)
from rasters_ray.stages.geomvec import reproject_vectors


def test_reproject_points_mixed_crs(ray_session):
    import ray.data as rd

    t = pa.table({
        "point_id": ["a", "b", "c"],
        "x": [-120.0, -119.0, 500000.0],
        "y": [39.0, 38.0, 4300000.0],
        "crs": ["EPSG:4326", "EPSG:4326", "EPSG:32610"],
    })
    rows = reproject_vectors(rd.from_arrow(t), "EPSG:3857").take_all()
    got = {r["point_id"]: r for r in rows}
    for pid, lon, lat, src in (("a", -120.0, 39.0, "EPSG:4326"),
                               ("b", -119.0, 38.0, "EPSG:4326")):
        ex, ey = transform_xy(np.array([lon]), np.array([lat]),
                              src, "EPSG:3857")
        assert got[pid]["x"] == ex[0] and got[pid]["y"] == ey[0]
        assert got[pid]["crs"] == "EPSG:3857"
    # the UTM point went through its own source CRS
    lon, lat = transform_xy(np.array([500000.0]), np.array([4300000.0]),
                            "EPSG:32610", "EPSG:4326")
    ex, ey = transform_xy(lon, lat, "EPSG:4326", "EPSG:3857")
    assert abs(got["c"]["x"] - ex[0]) < 1e-6


def test_reproject_polygons_offsets_preserved(ray_session):
    import ray.data as rd

    t = fixture_polygons(5)
    rows = reproject_vectors(rd.from_arrow(t), "EPSG:3857").take_all()
    assert len(rows) == 5
    orig = t.column("rings").to_pylist()
    for r, cell0 in zip(sorted(rows, key=lambda r: r["poly_id"]), orig):
        cell = r["rings"]
        assert len(cell) == len(cell0)  # ring structure intact
        for ring, ring0 in zip(cell, cell0):
            assert len(ring) == len(ring0)
            xs = np.array([p["x"] for p in ring0])
            ys = np.array([p["y"] for p in ring0])
            ex, ey = transform_xy(xs, ys, "EPSG:4326", "EPSG:3857")
            assert np.array_equal([p["x"] for p in ring], ex)
            assert np.array_equal([p["y"] for p in ring], ey)
        assert r["crs"] == "EPSG:3857"


def test_csv_points_and_attr(tmp_path):
    p = tmp_path / "pts.csv"
    p.write_text("name,lon,lat,pop\nsf,-122.4,37.8,870000\nla,-118.2,34.0,3900000\n")
    t = csv_to_vectors(str(p))
    assert t.column("point_id").to_pylist() == ["sf", "la"]
    assert t.column("x").to_pylist() == [-122.4, -118.2]
    assert t.column("pop").to_pylist() == [870000, 3900000]
    assert t.column("crs")[0].as_py() == "EPSG:4326"
    # routed through read_vector_file too
    r = read_vector_file(str(p), kind="points")
    assert r.column("y").to_pylist() == [37.8, 34.0]


def test_csv_wkt_column_and_tsv_and_sidecar(tmp_path):
    p = tmp_path / "polys.tsv"
    p.write_text('id\tgeometry\nA\t"POLYGON ((0 0, 4 0, 4 2, 0 0))"\n'
                 'B\t"POLYGON ((1 1, 2 1, 2 2, 1 1))"\n')
    (tmp_path / "polys.crs").write_text("EPSG:32610")
    t = csv_to_vectors(str(p))
    assert t.column("poly_id").to_pylist() == ["A", "B"]
    assert t.column("crs")[0].as_py() == "EPSG:32610"
    ring = t.column("rings")[0].as_py()[0]
    assert ring[1] == {"x": 4.0, "y": 0.0}
    with pytest.raises(ValueError):
        q = tmp_path / "bad.csv"
        q.write_text("a,b\n1,2\n")
        csv_to_vectors(str(q))
