"""ESRI Shapefile read/write — points, polygons, polylines, dBase
attributes, Z/M tolerance, null shapes (reference parity: the
geopandas/fiona vector path behind rasterize/mask/to_point,
rasters/raster.py:1488-1530; spec: ESRI Shapefile Technical
Description, July 1998)."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray.sources.shapefile import (read_shapefile, write_shapefile,
                                           _read_dbf)
from rasters_ray.sources.vectors import RING_TYPE, fixture_polygons


def test_points_roundtrip_bit_exact(tmp_path):
    rng = np.random.default_rng(3)
    x = rng.normal(scale=100, size=40)
    y = rng.normal(scale=50, size=40)
    t = pa.table({
        "point_id": pa.array([f"pt{i:04d}" for i in range(40)]),
        "x": pa.array(x), "y": pa.array(y),
        "crs": pa.array(["EPSG:32610"] * 40),
        "height": pa.array(rng.integers(0, 500, 40)),
    })
    p = str(tmp_path / "pts.shp")
    write_shapefile(t, p)
    back = read_shapefile(p)
    assert back.column("point_id").to_pylist() == t.column("point_id").to_pylist()
    # geometry doubles are stored raw: bit-exact round-trip
    assert np.array_equal(back.column("x").to_numpy(), x)
    assert np.array_equal(back.column("y").to_numpy(), y)
    assert back.column("crs")[0].as_py() == "EPSG:32610"
    assert back.column("height").to_pylist() == t.column("height").to_pylist()


def test_polygons_roundtrip_rings(tmp_path):
    polys = fixture_polygons(8)
    p = str(tmp_path / "zones.shp")
    write_shapefile(polys, p)
    back = read_shapefile(p)
    assert back.column("poly_id").to_pylist() == polys.column("poly_id").to_pylist()
    assert back.column("rings").to_pylist() == polys.column("rings").to_pylist()
    assert back.schema.field("rings").type == RING_TYPE


def test_polylines_and_multiparts(tmp_path):
    paths = [
        [[{"x": 0.0, "y": 0.0}, {"x": 1.0, "y": 1.0}]],
        [[{"x": 2.0, "y": 0.0}, {"x": 3.0, "y": 1.0}],
         [{"x": 4.0, "y": 0.0}, {"x": 5.0, "y": 1.0}, {"x": 6.0, "y": 0.0}]],
    ]
    t = pa.table({
        "line_id": pa.array(["a", "b"]),
        "paths": pa.array(paths, RING_TYPE),
        "crs": pa.array(["EPSG:4326"] * 2),
    })
    p = str(tmp_path / "lines.shp")
    write_shapefile(t, p)
    back = read_shapefile(p)
    assert back.column("line_id").to_pylist() == ["a", "b"]
    assert back.column("paths").to_pylist() == paths


def test_reader_tolerates_z_and_null_shapes(tmp_path):
    # hand-build a .shp: record 1 = null shape, record 2 = PointZ (11)
    content1 = struct.pack("<i", 0)
    content2 = struct.pack("<idddd", 11, 7.25, -3.5, 99.0, 1.0)  # x y z m
    body = (struct.pack(">ii", 1, len(content1) // 2) + content1
            + struct.pack(">ii", 2, len(content2) // 2) + content2)
    hdr = (struct.pack(">i20xi", 9994, (100 + len(body)) // 2)
           + struct.pack("<ii", 1000, 11)
           + struct.pack("<8d", 7.25, -3.5, 7.25, -3.5, 0, 0, 0, 0))
    (tmp_path / "z.shp").write_bytes(hdr + body)
    back = read_shapefile(str(tmp_path / "z.shp"))
    assert back.num_rows == 1
    assert back.column("x")[0].as_py() == 7.25
    assert back.column("point_id")[0].as_py() == "shp000002"


def test_dbf_field_types_and_shx(tmp_path):
    t = pa.table({
        "point_id": pa.array(["a", "b"]),
        "x": pa.array([1.0, 2.0]), "y": pa.array([3.0, 4.0]),
        "crs": pa.array(["EPSG:4326"] * 2),
        "n": pa.array([10, None], pa.int64()),
        "f": pa.array([1.5, -2.25]),
        "flag": pa.array([True, False]),
    })
    base = tmp_path / "mix"
    write_shapefile(t, str(base) + ".shp")
    cols = _read_dbf(str(base) + ".dbf")
    assert cols["n"] == [10, None]
    assert cols["f"] == [1.5, -2.25]
    assert cols["flag"] == [True, False]
    # .shx carries one (offset, length) pair per record
    shx = (base.parent / "mix.shx").read_bytes()
    assert len(shx) == 100 + 8 * 2
    off1, len1 = struct.unpack(">ii", shx[100:108])
    assert off1 == 50 and len1 == 10  # first point record = 10 words
    back = read_shapefile(str(base) + ".shp")
    assert back.column("flag").to_pylist() == [True, False]


def test_bad_files_raise(tmp_path):
    (tmp_path / "bad.shp").write_bytes(b"\x00" * 100)
    with pytest.raises(ValueError, match="file code"):
        read_shapefile(str(tmp_path / "bad.shp"))
    with pytest.raises(ValueError, match="x/y or rings"):
        write_shapefile(pa.table({"a": pa.array([1])}),
                        str(tmp_path / "x.shp"))


def test_vector_dataset_streaming(tmp_path, ray_session):
    from rasters_ray.sources.geojson import polygons_to_geojson
    from rasters_ray.sources.vectors import (fixture_polygons,
                                             read_vector_file,
                                             vector_dataset)

    polys = fixture_polygons(6)
    shp = str(tmp_path / "a.shp")
    write_shapefile(polys, shp)
    gj = str(tmp_path / "b.geojson")
    with open(gj, "w") as fh:
        fh.write(polygons_to_geojson(polys))
    ds = vector_dataset([shp, gj], kind="polygons")
    t = pa.Table.from_pylist(ds.take_all())
    assert t.num_rows == 12
    assert set(t.column("source_file").to_pylist()) == {"a.shp", "b.geojson"}
    with pytest.raises(ValueError, match="expects points"):
        read_vector_file(shp, kind="points")


def test_shapefile_feeds_pip_and_rasterize(tmp_path, ray_session):
    """A user's shapefile drives the engine's spatial stages directly:
    read_shapefile -> pip_join (broadcast) and rasterize_mask."""
    import ray.data as rd

    from rasters_ray.grids.gridspec import GridSpec
    from rasters_ray.stages.pip import pip_join, rasterize_mask

    square = [[{"x": 2.0, "y": 2.0}, {"x": 6.0, "y": 2.0},
               {"x": 6.0, "y": 6.0}, {"x": 2.0, "y": 6.0},
               {"x": 2.0, "y": 2.0}]]
    polys = pa.table({
        "poly_id": pa.array(["sq"]),
        "rings": pa.array([square], RING_TYPE),
        "crs": pa.array(["EPSG:4326"]),
    })
    p = str(tmp_path / "zone.shp")
    write_shapefile(polys, p)
    zone = read_shapefile(p)

    pts = rd.from_items([
        {"point_id": "in", "x": 3.0, "y": 3.0, "crs": "EPSG:4326"},
        {"point_id": "out", "x": 9.0, "y": 9.0, "crs": "EPSG:4326"},
    ])
    hits = pip_join(pts, zone, mode="inner").take_all()
    assert [h["point_id"] for h in hits] == ["in"]

    grid = GridSpec(crs="EPSG:4326", x_origin=0.0, y_origin=8.0,
                    cell_width=1.0, cell_height=-1.0, rows=8, cols=8)
    mask = rasterize_mask(grid, zone)
    # cell centers strictly inside [2,6]x[2,6]
    assert mask.sum() == 16 and mask[3, 3] and not mask[0, 0]


def test_write_shapefile_dataset_sharded(tmp_path, ray_session):
    import glob

    import ray.data as rd

    from rasters_ray.sources.shapefile import write_shapefile_dataset
    from rasters_ray.sources.vectors import vector_dataset

    pts = [{"point_id": f"pt{i:03d}", "x": float(i), "y": float(-i),
            "crs": "EPSG:4326", "rank": i % 7} for i in range(50)]
    ds = rd.from_items(pts).repartition(4)
    manifest = write_shapefile_dataset(ds, str(tmp_path / "out"))
    rows = manifest.take_all()
    assert sum(r["n_rows"] for r in rows) == 50 and len(rows) == 4
    shps = sorted(glob.glob(str(tmp_path / "out" / "*.shp")))
    assert len(shps) == 4
    back = vector_dataset(shps, kind="points").take_all()
    assert len(back) == 50
    got = {r["point_id"]: (r["x"], r["rank"]) for r in back}
    assert got["pt017"] == (17.0, 3)
