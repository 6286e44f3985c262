"""WKB/WKT geometry codec + GeoParquet source/sink (reference parity:
the shapely/geopandas vector path — shapely geometries accept WKB/WKT,
``gpd.read_parquet``/``to_parquet`` is GeoParquet; specs: OGC 06-103r4
§8, GeoParquet 1.1)."""

import json
import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rasters_ray.sources.geoparquet import (geoparquet_dataset,
                                            read_geoparquet,
                                            write_geoparquet,
                                            write_geoparquet_dataset)
from rasters_ray.sources.vectors import (fixture_polygons, read_vector_file,
                                         rings_to_numpy)
from rasters_ray.sources.wkb import (decode_wkb, decode_wkt, encode_wkb,
                                     encode_multipolygon, encode_wkt,
                                     table_to_wkb, wkb_column_to_table)


# ------------------------------------------------------------- WKB

def test_point_wkb_hand_built_both_endians():
    # little-endian: 01 01000000 x y
    le = struct.pack("<BIdd", 1, 1, -119.5, 39.25)
    kind, payload, crs = decode_wkb(le)
    assert (kind, crs) == ("point", None)
    assert payload == [(-119.5, 39.25)]
    # big-endian: 00 00000001 x y
    be = struct.pack(">BIdd", 0, 1, -119.5, 39.25)
    assert decode_wkb(be)[:2] == ("point", [(-119.5, 39.25)])
    # encode emits the exact little-endian bytes
    assert encode_wkb("point", [(-119.5, 39.25)]) == le


def test_iso_z_and_m_dropped():
    # ISO PointZ = type 1001, three ordinates
    z = struct.pack("<BIddd", 1, 1001, 1.0, 2.0, 99.0)
    assert decode_wkb(z)[:2] == ("point", [(1.0, 2.0)])
    # ISO PointZM = type 3001
    zm = struct.pack("<BIdddd", 1, 3001, 1.0, 2.0, 9.0, 8.0)
    assert decode_wkb(zm)[:2] == ("point", [(1.0, 2.0)])
    # LineStringM (2002): per-vertex 3 ordinates
    lm = struct.pack("<BII", 1, 2002, 2) + struct.pack("<6d", 0, 0, 5, 1, 1, 6)
    kind, payload, _ = decode_wkb(lm)
    assert kind == "line"
    assert np.array_equal(payload[0], [[0, 0], [1, 1]])


def test_ewkb_flags_and_srid():
    # PostGIS EWKB: Z flag + SRID flag, srid 32610
    t = 1 | 0x80000000 | 0x20000000
    b = struct.pack("<BIIddd", 1, t, 32610, 5.0, 6.0, 7.0)
    kind, payload, crs = decode_wkb(b)
    assert (kind, payload, crs) == ("point", [(5.0, 6.0)], "EPSG:32610")


def test_polygon_multipolygon_roundtrip():
    outer = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
    hole = np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], float)
    b = encode_wkb("poly", [outer, hole])
    kind, rings, _ = decode_wkb(b)
    assert kind == "poly" and len(rings) == 2
    assert np.array_equal(rings[0], outer) and np.array_equal(rings[1], hole)
    # multipolygon flattens to exterior-first parts (engine rings column)
    mb = encode_multipolygon([[outer], [hole]])
    kind, rings, _ = decode_wkb(mb)
    assert kind == "poly" and len(rings) == 2


def test_multipoint_multilinestring():
    mp = encode_wkb("point", [(1, 2), (3, 4)])
    kind, payload, _ = decode_wkb(mp)
    assert kind == "point" and payload == [(1.0, 2.0), (3.0, 4.0)]
    ml = encode_wkb("line", [np.array([[0, 0], [1, 1]], float),
                             np.array([[2, 2], [3, 3], [4, 4]], float)])
    kind, parts, _ = decode_wkb(ml)
    assert kind == "line" and [len(p) for p in parts] == [2, 3]


def test_geometrycollection_and_garbage_raise():
    gc = struct.pack("<BII", 1, 7, 0)
    with pytest.raises(NotImplementedError):
        decode_wkb(gc)
    with pytest.raises(ValueError):
        decode_wkb(b"\x02\x01\x00\x00\x00")  # bad byte-order marker
    with pytest.raises(ValueError):
        decode_wkb(struct.pack("<BI", 1, 1))  # truncated coords


# ------------------------------------------------------------- WKT

def test_wkt_roundtrip_all_types():
    cases = [
        "POINT (30 10)",
        "LINESTRING (30 10, 10 30, 40 40)",
        "POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))",
        "MULTIPOINT ((10 40), (40 30))",
        "MULTILINESTRING ((10 10, 20 20), (40 40, 30 30, 20 20))",
    ]
    for s in cases:
        kind, payload = decode_wkt(s)
        # WKT -> WKB -> WKT is stable through the shared representation
        k2, p2, _ = decode_wkb(encode_wkb(kind, payload))
        assert k2 == kind
        back = decode_wkt(encode_wkt(kind, payload))
        assert back[0] == kind
        flat = lambda pl: [tuple(map(float, p)) for part in pl
                           for p in np.atleast_2d(part)]
        assert flat(back[1]) == flat(payload)


def test_wkt_z_suffix_and_multipolygon_and_empty():
    kind, payload = decode_wkt("POINT Z (1 2 3)")
    assert (kind, payload) == ("point", [(1.0, 2.0)])
    kind, rings = decode_wkt(
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5),"
        " (5.2 5.2, 5.8 5.2, 5.8 5.8, 5.2 5.2)))")
    assert kind == "poly" and len(rings) == 3
    assert decode_wkt("MULTIPOINT EMPTY") == ("point", [])
    with pytest.raises(ValueError):
        decode_wkt("CIRCLE (0 0, 1)")


# ------------------------------------------------- table conversions

def test_point_table_roundtrip_bit_exact_vectorized():
    rng = np.random.default_rng(7)
    x, y = rng.normal(size=50), rng.normal(size=50)
    t = pa.table({"point_id": [f"p{i}" for i in range(50)],
                  "x": x, "y": y, "crs": ["EPSG:32610"] * 50,
                  "grp": np.arange(50) % 3})
    ids, blobs, kind, crs = table_to_wkb(t)
    assert kind == "point" and crs == "EPSG:32610"
    assert all(len(b) == 21 for b in blobs)
    back = wkb_column_to_table(ids, blobs, crs=crs,
                               extra={"grp": t.column("grp").to_pylist()})
    assert np.array_equal(back.column("x").to_numpy(), x)
    assert np.array_equal(back.column("y").to_numpy(), y)
    assert back.column("grp").to_pylist() == (np.arange(50) % 3).tolist()


def test_polygon_table_roundtrip_and_null_skip():
    t = fixture_polygons(6)
    ids, blobs, kind, crs = table_to_wkb(t)
    assert kind == "poly"
    back = wkb_column_to_table(ids + ["nul"], blobs + [None], crs=crs)
    assert back.num_rows == t.num_rows
    for a, b in zip(t.column("rings").to_pylist(),
                    back.column("rings").to_pylist()):
        assert a == b
    with pytest.raises(ValueError):
        wkb_column_to_table(["a", "b"],
                            [encode_wkb("point", [(0, 0)]),
                             encode_wkb("line", [np.zeros((2, 2))])])


# ------------------------------------------------------ GeoParquet

def test_geoparquet_points_roundtrip_and_metadata(tmp_path):
    rng = np.random.default_rng(11)
    x, y = rng.uniform(-120, -110, 30), rng.uniform(30, 40, 30)
    t = pa.table({"point_id": [f"p{i:03d}" for i in range(30)],
                  "x": x, "y": y, "crs": ["EPSG:4326"] * 30,
                  "pop": rng.integers(0, 1000, 30)})
    p = str(tmp_path / "pts.parquet")
    write_geoparquet(t, p)
    # the geo metadata is spec-shaped
    md = pq.read_schema(p).metadata
    geo = json.loads(md[b"geo"])
    assert geo["primary_column"] == "geometry"
    gcol = geo["columns"]["geometry"]
    assert gcol["encoding"] == "WKB"
    assert gcol["crs"] is None  # 4326 -> spec default CRS84
    assert gcol["bbox"] == [float(x.min()), float(y.min()),
                            float(x.max()), float(y.max())]
    back = read_geoparquet(p)
    assert np.array_equal(back.column("x").to_numpy(), x)
    assert np.array_equal(back.column("y").to_numpy(), y)
    assert back.column("pop").to_pylist() == t.column("pop").to_pylist()
    assert back.column("crs")[0].as_py() == "EPSG:4326"
    # the vector-file router reaches the same table
    routed = read_vector_file(p, kind="points")
    assert routed.column("point_id").to_pylist() == \
        back.column("point_id").to_pylist()


def test_geoparquet_projected_crs_and_polygons(tmp_path):
    t = fixture_polygons(5).set_column(
        2, "crs", pa.array(["EPSG:32610"] * 5))
    p = str(tmp_path / "polys.parquet")
    write_geoparquet(t, p)
    geo = json.loads(pq.read_schema(p).metadata[b"geo"])
    assert geo["columns"]["geometry"]["crs"]["id"] == {
        "authority": "EPSG", "code": 32610}
    assert geo["columns"]["geometry"]["geometry_types"] == [
        "Polygon", "MultiPolygon"]
    back = read_geoparquet(p)
    assert back.column("crs")[0].as_py() == "EPSG:32610"
    a0 = rings_to_numpy(t.column("rings")[0].as_py())
    b0 = rings_to_numpy(back.column("rings")[0].as_py())
    assert all(np.array_equal(r1, r2) for r1, r2 in zip(a0, b0))


def test_geoparquet_bare_binary_fallback_and_column_prune(tmp_path):
    # a parquet with a binary 'geometry' column but NO geo metadata
    blobs = [encode_wkb("point", [(float(i), float(-i))]) for i in range(4)]
    t = pa.table({"geometry": pa.array(blobs, pa.binary()),
                  "a": [1, 2, 3, 4], "b": ["w", "x", "y", "z"]})
    p = str(tmp_path / "bare.parquet")
    pq.write_table(t, p)
    back = read_geoparquet(p, columns=["a"])
    assert back.column("x").to_pylist() == [0.0, 1.0, 2.0, 3.0]
    assert back.column("a").to_pylist() == [1, 2, 3, 4]
    assert "b" not in back.column_names  # pruned at the reader


def test_geoparquet_dataset_streaming_and_sharded_sink(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(13)
    n = 200
    t = pa.table({"point_id": [f"p{i:04d}" for i in range(n)],
                  "x": rng.uniform(0, 10, n), "y": rng.uniform(0, 10, n),
                  "crs": ["EPSG:4326"] * n,
                  "val": rng.integers(0, 99, n)})
    ds = rd.from_arrow(t).repartition(4)
    out = str(tmp_path / "shards")
    manifest = write_geoparquet_dataset(ds, out).take_all()
    assert sum(m["n_rows"] for m in manifest) == n
    assert len(manifest) >= 2  # sharded, not a driver funnel
    back = geoparquet_dataset(out).take_all()
    assert len(back) == n
    got = {r["point_id"]: (r["x"], r["y"], r["val"]) for r in back}
    for i in range(n):
        pid = f"p{i:04d}"
        bx, by, bv = got[pid]
        assert bx == t.column("x")[i].as_py()
        assert by == t.column("y")[i].as_py()
        assert bv == t.column("val")[i].as_py()
