"""GeoPackage sink: spec-table layout + pixel round-trips.

Parity target: Raster.to_geopackage (reference raster.py:1715-1739 —
the GDAL GPKG raster-tiles write), rebuilt on stdlib sqlite3 per the
public OGC 12-128r18 tile-pyramid layout.
"""

import sqlite3

import numpy as np
import pytest

from rasters_ray.grids import GridSpec
from rasters_ray.sources import (
    make_fixture_images,
    read_geopackage_tiles,
    write_geopackage,
    write_geopackage_tiles,
)
from rasters_ray.stages.tiling import make_tiles


def _grid(rows=32, cols=48):
    return GridSpec(crs="EPSG:4326", x_origin=-120.0, y_origin=40.0,
                    cell_width=0.01, cell_height=-0.01, rows=rows, cols=cols)


def test_single_raster_roundtrip(tmp_path):
    arr = (np.arange(32 * 48, dtype=np.uint16) % 1000).reshape(32, 48)
    path = str(tmp_path / "r.gpkg")
    write_geopackage(arr, _grid(), path, table_name="raster")
    tiles = read_geopackage_tiles(path, "raster")
    assert len(tiles) == 1
    z, c, r, px = tiles[0]
    assert (z, c, r) == (0, 0, 0)
    np.testing.assert_array_equal(px, arr)


def test_gpkg_spec_tables(tmp_path):
    path = str(tmp_path / "r.gpkg")
    write_geopackage(np.zeros((4, 4), np.uint8), _grid(4, 4), path)
    con = sqlite3.connect(path)
    try:
        assert con.execute("PRAGMA application_id").fetchone()[0] == 0x47504B47
        names = {
            r[0]
            for r in con.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            ).fetchall()
        }
        for t in ("gpkg_spatial_ref_sys", "gpkg_contents",
                  "gpkg_tile_matrix_set", "gpkg_tile_matrix", "raster"):
            assert t in names, t
        row = con.execute(
            "SELECT data_type, srs_id, min_x, max_y FROM gpkg_contents"
        ).fetchone()
        assert row[0] == "tiles" and row[1] == 4326
        assert row[2] == -120.0 and row[3] == 40.0
        srs = {r[0] for r in con.execute(
            "SELECT srs_id FROM gpkg_spatial_ref_sys").fetchall()}
        assert {4326, -1, 0} <= srs
    finally:
        con.close()


def test_tile_pyramid_from_engine_tiles(tmp_path):
    # uint8 fixture images -> engine tiles -> gpkg pyramid; uint8 PNGs
    # pass through the transcode exactly
    batch = make_fixture_images(np.arange(1, 9), size=64)
    level = 6
    tiles = make_tiles(batch, level=level, decode_pixels=True)
    path = str(tmp_path / "t.gpkg")
    n = write_geopackage_tiles(tiles, path, level=level, tile_size=128)
    assert n == tiles.num_rows
    got = read_geopackage_tiles(path)
    assert len(got) <= n  # (zoom, col, row) unique; same-cell tiles overwrite
    for z, c, r, px in got:
        assert z == level
        assert px.shape == (128, 128)
    con = sqlite3.connect(path)
    try:
        tm = con.execute(
            "SELECT matrix_width, matrix_height, tile_width FROM gpkg_tile_matrix"
        ).fetchone()
        assert tm == (1 << level, 1 << level, 128)
    finally:
        con.close()


def test_wrong_level_raises(tmp_path):
    batch = make_fixture_images(np.arange(1, 3), size=32)
    tiles = make_tiles(batch, level=5, decode_pixels=True)
    with pytest.raises(ValueError, match="level"):
        write_geopackage_tiles(tiles, str(tmp_path / "x.gpkg"), level=7)


def test_float_raster_quantizes(tmp_path):
    arr = np.linspace(0.0, 250.0, 64, dtype=np.float32).reshape(8, 8)
    arr[0, 0] = np.nan
    path = str(tmp_path / "f.gpkg")
    write_geopackage(arr, _grid(8, 8), path)
    _, _, _, px = read_geopackage_tiles(path, "raster")[0]
    assert px.dtype == np.uint16
    # quantized ramp stays monotone where finite
    flat = px.ravel()[1:]
    assert (np.diff(flat.astype(np.int64)) >= 0).all()


def test_read_geopackage_raster_and_router(tmp_path):
    """read_geopackage assembles the tile pyramid back into a
    georeferenced (array, GridSpec) — the read half of the GDAL-driver
    parity — and open_raster routes the SQLite magic to it."""
    from rasters_ray.sources.geopackage import read_geopackage
    from rasters_ray.sources.open import open_raster

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 60000, (100, 120), dtype=np.uint16)
    path = str(tmp_path / "rt.gpkg")
    write_geopackage(arr, _grid(100, 120), path)
    got, g = read_geopackage(path)
    np.testing.assert_array_equal(got, arr)
    assert g.x_origin == pytest.approx(-120.0)
    assert g.y_origin == pytest.approx(40.0)
    assert g.cell_width == pytest.approx(0.01)
    assert g.cell_height == pytest.approx(-0.01)
    got2, g2 = open_raster(path)  # magic-byte routing
    np.testing.assert_array_equal(got2, arr)
    assert g2.crs == "EPSG:4326"


def test_read_geopackage_pyramid_bbox_and_sparse_guard(tmp_path):
    """Pyramid reads allocate only the present tiles' bounding box with
    the correct world-quadtree origin; a pathologically sparse level
    raises with the tiles-wise remediation instead of OOMing."""
    import pyarrow as pa

    from rasters_ray import codec
    from rasters_ray.grids.cellkey import _LEVEL_SHIFT, _Y_SHIFT
    from rasters_ray.sources.geopackage import read_geopackage

    def enc(level, ix, iy):
        return (level << _LEVEL_SHIFT) | (iy << _Y_SHIFT) | ix

    def tile_table(entries, size):
        return pa.table({
            "cell_key": pa.array([int(e[0]) for e in entries], pa.int64()),
            "bytes": pa.array([e[1] for e in entries], pa.binary()),
            "fmt": pa.array(["png"] * len(entries)),
            "th": pa.array([size] * len(entries), pa.int32()),
            "tw": pa.array([size] * len(entries), pa.int32()),
        })

    rng = np.random.default_rng(4)
    pix = [rng.integers(0, 255, (64, 64), dtype=np.uint8) for _ in range(3)]
    entries = [(enc(3, ix, iy), codec.encode(px, "png"))
               for (ix, iy), px in zip([(2, 1), (3, 1), (2, 2)], pix)]
    path = str(tmp_path / "pyr.gpkg")
    write_geopackage_tiles(tile_table(entries, 64), path, 3)
    arr, g = read_geopackage(path)
    assert arr.shape == (128, 128)
    # level 3 = 8x8 world tiles: tile (2,1) origin = (-180+2*45, 90-22.5)
    assert g.x_origin == pytest.approx(-90.0)
    assert g.y_origin == pytest.approx(67.5)
    np.testing.assert_array_equal(arr[:64, :64], pix[0])
    np.testing.assert_array_equal(arr[64:, :64], pix[2])
    assert (arr[64:, 64:] == 0).all()  # absent tile zero-filled

    one = np.ones((256, 256), np.uint8)
    far = [(enc(12, 0, 0), codec.encode(one, "png")),
           (enc(12, 4000, 4000), codec.encode(one, "png"))]
    sp = str(tmp_path / "sparse.gpkg")
    write_geopackage_tiles(tile_table(far, 256), sp, 12)
    with pytest.raises(ValueError, match="read_geopackage_tiles"):
        read_geopackage(sp)


def test_multi_zoom_pyramid_roundtrip(tmp_path):
    """Tile levels compose into one multi-zoom pyramid file (append with
    overwrite=False); read_geopackage picks the deepest zoom by default
    and any level on request, with doubled pixel sizes per level up."""
    import pyarrow as pa

    from rasters_ray import codec
    from rasters_ray.grids.cellkey import _LEVEL_SHIFT, _Y_SHIFT
    from rasters_ray.sources.geopackage import read_geopackage

    def enc(level, ix, iy):
        return (level << _LEVEL_SHIFT) | (iy << _Y_SHIFT) | ix

    def tab(level, cells, val, ts=32):
        rows = {"cell_key": [], "bytes": [], "fmt": [], "th": [], "tw": []}
        for ix, iy in cells:
            rows["cell_key"].append(enc(level, ix, iy))
            rows["bytes"].append(
                codec.encode(np.full((ts, ts), val, np.uint8), "png"))
            rows["fmt"].append("png")
            rows["th"].append(ts)
            rows["tw"].append(ts)
        return pa.table({k: pa.array(v) for k, v in rows.items()})

    p = str(tmp_path / "multi.gpkg")
    write_geopackage_tiles(tab(3, [(2, 1), (3, 1)], 77), p, 3)
    write_geopackage_tiles(tab(2, [(1, 0)], 99), p, 2, overwrite=False)
    arr3, g3 = read_geopackage(p)
    arr2, g2 = read_geopackage(p, zoom=2)
    assert (arr3 == 77).all() and arr3.shape == (32, 64)
    assert (arr2 == 99).all() and arr2.shape == (32, 32)
    assert g2.cell_width == pytest.approx(2 * g3.cell_width)


def test_tile_window_pushdown(tmp_path):
    """tile_window= selects only the AOI's tiles in SQL; the result
    matches the same region cut from the full assembly."""
    import pyarrow as pa

    from rasters_ray import codec
    from rasters_ray.grids.cellkey import _LEVEL_SHIFT, _Y_SHIFT
    from rasters_ray.sources.geopackage import read_geopackage

    def enc(level, ix, iy):
        return (level << _LEVEL_SHIFT) | (iy << _Y_SHIFT) | ix

    ts = 32
    rows = {"cell_key": [], "bytes": [], "fmt": [], "th": [], "tw": []}
    for ix in (2, 3, 4):
        for iy in (1, 2):
            rows["cell_key"].append(enc(3, ix, iy))
            rows["bytes"].append(codec.encode(
                np.full((ts, ts), 10 * ix + iy, np.uint8), "png"))
            rows["fmt"].append("png")
            rows["th"].append(ts)
            rows["tw"].append(ts)
    p = str(tmp_path / "win.gpkg")
    write_geopackage_tiles(
        pa.table({k: pa.array(v) for k, v in rows.items()}), p, 3)
    full, gfull = read_geopackage(p)
    assert full.shape == (64, 96)          # 2 tile rows x 3 tile cols
    win, gwin = read_geopackage(p, tile_window=(2, 3, 1, 2))
    assert win.shape == (32, 64)
    np.testing.assert_array_equal(win, full[32:64, 32:96])
    assert gwin.x_origin == gfull.x_origin + 32 * gfull.cell_width
    assert gwin.y_origin == gfull.y_origin + 32 * gfull.cell_height
    with pytest.raises(ValueError, match="tile_window"):
        read_geopackage(p, tile_window=(9, 9, 1, 1))
