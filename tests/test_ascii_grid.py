"""ESRI ASCII grid (.asc) — read/write round-trips, header variants,
nodata, router integration (reference parity: rasterio's AAIGrid driver
behind Raster.open, rasters/raster.py:634-771)."""

import numpy as np
import pytest

from rasters_ray.grids.gridspec import GridSpec
from rasters_ray.sources.ascii_grid import read_ascii_grid, write_ascii_grid
from rasters_ray.sources.open import open_raster


def _grid(rows, cols, cs=0.5):
    return GridSpec(crs="EPSG:4326", x_origin=-120.0, y_origin=44.0,
                    cell_width=cs, cell_height=-cs, rows=rows, cols=cols)


def test_asc_roundtrip_and_nodata(tmp_path):
    rng = np.random.default_rng(5)
    arr = rng.normal(size=(7, 9)).astype(np.float64)
    arr[2, 3] = np.nan
    p = str(tmp_path / "dem.asc")
    write_ascii_grid(arr, _grid(7, 9), p)
    got, grid = read_ascii_grid(p)
    # %.10g default keeps ~10 significant digits
    np.testing.assert_allclose(got, arr, rtol=1e-9, equal_nan=True)
    assert grid == _grid(7, 9)
    # router picks it up by the ncols header
    got2, grid2 = open_raster(p)
    assert np.array_equal(got2, got, equal_nan=True) and grid2 == grid


def test_asc_header_variants(tmp_path):
    # xllcenter/yllcenter variant: corner = center - cellsize/2
    p = tmp_path / "c.asc"
    p.write_text(
        "NCOLS 3\nNROWS 2\nXLLCENTER 10.25\nYLLCENTER 20.25\nCELLSIZE 0.5\n"
        "1 2 3\n4 5 6\n")
    arr, grid = read_ascii_grid(str(p))
    assert arr.tolist() == [[1, 2, 3], [4, 5, 6]]
    assert grid.x_origin == 10.0 and grid.y_origin == 20.0 + 2 * 0.5
    # no nodata line is fine; missing corner keys raise
    p2 = tmp_path / "bad.asc"
    p2.write_text("ncols 2\nnrows 1\ncellsize 1.0\n1 2\n")
    with pytest.raises(ValueError, match="xllcorner"):
        read_ascii_grid(str(p2))


def test_asc_crs_sidecar_and_errors(tmp_path):
    arr = np.arange(6, dtype=np.float64).reshape(2, 3)
    g = GridSpec(crs="EPSG:32610", x_origin=500000.0, y_origin=4000000.0,
                 cell_width=30.0, cell_height=-30.0, rows=2, cols=3)
    p = str(tmp_path / "utm.asc")
    write_ascii_grid(arr, g, p)
    got, grid = read_ascii_grid(p)
    assert grid.crs == "EPSG:32610"
    np.testing.assert_allclose(got, arr)
    # non-square cells refuse
    bad = GridSpec(crs="EPSG:4326", x_origin=0, y_origin=1, cell_width=2.0,
                   cell_height=-1.0, rows=2, cols=3)
    with pytest.raises(ValueError, match="square"):
        write_ascii_grid(arr, bad, str(tmp_path / "x.asc"))
    # body size mismatch raises
    p3 = tmp_path / "short.asc"
    p3.write_text("ncols 3\nnrows 2\nxllcorner 0\nyllcorner 0\ncellsize 1\n1 2 3\n")
    with pytest.raises(ValueError, match="samples"):
        read_ascii_grid(str(p3))


def test_asc_prj_sidecar_wins(tmp_path):
    arr = np.ones((2, 2), dtype=np.float64)
    p = str(tmp_path / "w.asc")
    write_ascii_grid(arr, _grid(2, 2), p)
    (tmp_path / "w.prj").write_text(
        'PROJCS["WGS 84 / UTM zone 10N",AUTHORITY["EPSG","32610"]]')
    (tmp_path / "w.crs").write_text("EPSG:3857")  # loses to .prj
    _, grid = read_ascii_grid(p)
    from rasters_ray.proj.crs import parse_crs
    assert parse_crs(grid.crs) == parse_crs("EPSG:32610")
