"""SRTM .hgt tiles — filename georeferencing, void handling, size
validation, router integration (reference parity: rasterio's SRTMHGT
driver behind Raster.open, rasters/raster.py:634-771)."""

import numpy as np
import pytest

from rasters_ray.sources.open import open_raster
from rasters_ray.sources.srtm import parse_hgt_name, read_hgt, write_hgt


def test_hgt_roundtrip_and_grid(tmp_path):
    rng = np.random.default_rng(7)
    arr = rng.integers(-400, 8849, size=(65, 65)).astype(np.float64)
    arr[3, 4] = np.nan  # a void cell
    p = str(tmp_path / "N37W105.hgt")
    write_hgt(arr, p)
    got, grid = read_hgt(p)
    assert np.array_equal(got, arr, equal_nan=True)
    cell = 1.0 / 64
    assert grid.crs == "EPSG:4326"
    assert grid.cell_width == cell and grid.cell_height == -cell
    assert grid.rows == 65 and grid.cols == 65
    # GDAL SRTMHGT registration: top-left cell edge at the node minus
    # half a cell; tile spans exactly one degree of nodes
    assert grid.x_origin == -105 - cell / 2
    assert grid.y_origin == 38 + cell / 2
    # bytes really are big-endian int16, north row first
    raw = np.frombuffer(open(p, "rb").read(), dtype=">i2").reshape(65, 65)
    assert raw[0, 0] == int(arr[0, 0]) and raw[3, 4] == -32768


def test_hgt_name_parsing():
    assert parse_hgt_name("/x/N37W105.hgt") == (37, -105)
    assert parse_hgt_name("S09E112.hgt") == (-9, 112)
    # real mirrors decorate the token; it still parses
    assert parse_hgt_name("N00E006.SRTMGL1.hgt") == (0, 6)
    with pytest.raises(ValueError, match="filename"):
        parse_hgt_name("dem.hgt")


def test_hgt_rejects_bad_shapes(tmp_path):
    with pytest.raises(ValueError, match="square"):
        write_hgt(np.zeros((4, 5)), str(tmp_path / "N00E000.hgt"))
    with pytest.raises(ValueError, match="int16"):
        write_hgt(np.full((3, 3), 40000.0), str(tmp_path / "N00E000.hgt"))
    # a non-square byte count raises on read
    p = tmp_path / "N10E020.hgt"
    p.write_bytes(b"\x00" * 10)
    with pytest.raises(ValueError, match="2\\*n\\*n"):
        read_hgt(str(p))


def test_hgt_router_by_extension(tmp_path):
    arr = np.arange(9, dtype=np.float64).reshape(3, 3)
    p = str(tmp_path / "S45E170.hgt")
    write_hgt(arr, p)
    got, grid = open_raster(p)
    assert np.array_equal(got, arr)
    assert grid.y_origin == -44 + 0.25  # SW lat -45 -> top edge -44 + cell/2


def test_hgt_windowed_read(tmp_path):
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 4000, size=(33, 33)).astype(np.float64)
    p = str(tmp_path / "N40W111.hgt")
    write_hgt(arr, p)
    full, g = read_hgt(p)
    win, gw = read_hgt(p, window=(5, 7, 10, 12))
    assert np.array_equal(win, full[5:15, 7:19])
    assert gw.x_origin == g.x_origin + 7 * g.cell_width
    assert gw.y_origin == g.y_origin + 5 * g.cell_height
    assert gw.rows == 10 and gw.cols == 12
    # router window path; clamp; empty raises
    got, g2 = open_raster(p, window=(5, 7, 10, 12))
    assert np.array_equal(got, win) and g2 == gw
    edge, _ = read_hgt(p, window=(30, 30, 99, 99))
    assert edge.shape == (3, 3)
    with pytest.raises(ValueError, match="empty"):
        read_hgt(p, window=(40, 0, 1, 1))
