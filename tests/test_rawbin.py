"""Raw-binary + .hdr rasters — ESRI EHdr and ENVI dialects, three
interleaves, byte orders, nodata, registration conventions, router
(reference parity: rasterio's EHdr/ENVI drivers behind Raster.open,
rasters/raster.py:634-771)."""

import numpy as np
import pytest

from rasters_ray.grids.gridspec import GridSpec
from rasters_ray.sources.open import open_raster
from rasters_ray.sources.rawbin import read_rawbin, write_rawbin


def _grid(rows, cols, crs="EPSG:4326"):
    return GridSpec(crs=crs, x_origin=-120.0, y_origin=44.0,
                    cell_width=0.25, cell_height=-0.25, rows=rows, cols=cols)


@pytest.mark.parametrize("dialect", ["esri", "envi"])
@pytest.mark.parametrize("interleave", ["bsq", "bil", "bip"])
def test_multiband_roundtrip(tmp_path, dialect, interleave):
    rng = np.random.default_rng(11)
    arr = rng.integers(-300, 300, size=(6, 9, 3)).astype(np.int16)
    p = str(tmp_path / f"cube_{dialect}_{interleave}.bil")
    write_rawbin(arr, _grid(6, 9), p, dialect=dialect, interleave=interleave)
    got, grid = read_rawbin(p)
    assert got.dtype.kind == "i" and np.array_equal(got, arr)
    assert grid == _grid(6, 9)


@pytest.mark.parametrize("dialect", ["esri", "envi"])
@pytest.mark.parametrize("byte_order", ["<", ">"])
def test_single_band_nodata_and_byteorder(tmp_path, dialect, byte_order):
    arr = np.arange(12, dtype=np.float64).reshape(3, 4)
    arr[1, 2] = np.nan
    p = str(tmp_path / "dem.bil")
    write_rawbin(arr, _grid(3, 4), p, dialect=dialect,
                 byte_order=byte_order, nodata=-9999.0)
    got, grid = read_rawbin(p)
    assert np.array_equal(got, arr, equal_nan=True)
    assert grid == _grid(3, 4)
    # router picks the extension up
    got2, grid2 = open_raster(p)
    assert np.array_equal(got2, got, equal_nan=True) and grid2 == grid


def test_esri_header_conventions(tmp_path):
    # hand-built GTOPO30-style header: ULXMAP/ULYMAP are pixel CENTERS,
    # BYTEORDER M is big-endian, 16-bit defaults to SIGNED
    arr = np.array([[1, -2, 3], [4, 5, -32768]], dtype=">i2")
    (tmp_path / "t.bil").write_bytes(arr.tobytes())
    (tmp_path / "t.hdr").write_text(
        "BYTEORDER M\nLAYOUT BIL\nNROWS 2\nNCOLS 3\nNBANDS 1\nNBITS 16\n"
        "ULXMAP -119.875\nULYMAP 43.875\nXDIM 0.25\nYDIM 0.25\n"
        "NODATA -32768\n")
    got, grid = read_rawbin(str(tmp_path / "t.bil"))
    assert np.isnan(got[1, 2]) and got[0, 1] == -2
    assert grid.x_origin == -120.0 and grid.y_origin == 44.0


def test_envi_header_conventions(tmp_path):
    # hand-built ENVI header: map info corner registration at a
    # non-(1,1) reference pixel, data type 4 = float32, BSQ
    arr = np.arange(24, dtype="<f4").reshape(2, 3, 4)
    (tmp_path / "cube.bsq").write_bytes(arr.tobytes())
    (tmp_path / "cube.hdr").write_text(
        "ENVI\nsamples = 4\nlines = 3\nbands = 2\nheader offset = 0\n"
        "data type = 4\ninterleave = bsq\nbyte order = 0\n"
        "map info = {UTM, 2, 3, 500100, 4000300, 100, 150, 10, North, WGS-84}\n")
    got, grid = read_rawbin(str(tmp_path / "cube.bsq"))
    assert got.shape == (3, 4, 2)
    assert np.array_equal(got[:, :, 0], arr[0]) and np.array_equal(got[:, :, 1], arr[1])
    assert grid.crs == "EPSG:32610"
    assert grid.x_origin == 500100 - 1 * 100      # ref pixel (2, 3), 1-based
    assert grid.y_origin == 4000300 + 2 * 150
    assert grid.cell_width == 100 and grid.cell_height == -150


def test_flt_style_and_errors(tmp_path):
    # ESRI .flt: xllcorner-style keys, LSBFIRST, always float32
    arr = np.array([[1.5, 2.5], [3.5, -9999.0]], dtype="<f4")
    (tmp_path / "g.flt").write_bytes(arr.tobytes())
    (tmp_path / "g.hdr").write_text(
        "ncols 2\nnrows 2\nxllcorner 10\nyllcorner 40\ncellsize 0.5\n"
        "NODATA_value -9999\nbyteorder LSBFIRST\n")
    got, grid = read_rawbin(str(tmp_path / "g.flt"))
    assert np.isnan(got[1, 1]) and got[0, 0] == 1.5
    assert grid.x_origin == 10.0 and grid.y_origin == 41.0
    # missing sidecar raises with the candidate names
    (tmp_path / "lone.bil").write_bytes(b"\x00\x00")
    with pytest.raises(ValueError, match="hdr sidecar"):
        read_rawbin(str(tmp_path / "lone.bil"))
    # NaNs without nodata refuse to write
    with pytest.raises(ValueError, match="nodata"):
        write_rawbin(np.array([[np.nan]] * 2 + [[1.0]] * 0) if False else
                     np.array([[np.nan, 1.0], [2.0, 3.0]]),
                     _grid(2, 2), str(tmp_path / "x.bil"))


def test_crs_sidecars(tmp_path):
    # ESRI dialect round-trips a projected CRS through .crs; a .prj WKT
    # (authority form) resolves through the engine's WKT parser
    arr = np.ones((2, 2), dtype=np.float32)
    g = GridSpec(crs="EPSG:32633", x_origin=500000.0, y_origin=4100000.0,
                 cell_width=30.0, cell_height=-30.0, rows=2, cols=2)
    p = str(tmp_path / "utm.bil")
    write_rawbin(arr, g, p, dialect="esri")
    _, grid = read_rawbin(p)
    assert grid.crs == "EPSG:32633"
    (tmp_path / "utm.crs").unlink()
    (tmp_path / "utm.prj").write_text(
        'PROJCS["WGS 84 / UTM zone 33N",AUTHORITY["EPSG","32633"]]')
    _, grid2 = read_rawbin(p)
    from rasters_ray.proj.crs import parse_crs
    assert parse_crs(grid2.crs) == parse_crs("EPSG:32633")


@pytest.mark.parametrize("dialect,interleave", [
    ("esri", "bil"), ("esri", "bsq"), ("envi", "bip"), ("envi", "bsq")])
def test_windowed_reads_match_full(tmp_path, dialect, interleave):
    rng = np.random.default_rng(23)
    arr = rng.integers(-100, 100, size=(12, 15, 2)).astype(np.int16)
    p = str(tmp_path / "cube.bil")
    write_rawbin(arr, _grid(12, 15), p, dialect=dialect,
                 interleave=interleave)
    full, g = read_rawbin(p)
    win, gw = read_rawbin(p, window=(3, 5, 4, 6))
    assert np.array_equal(win, full[3:7, 5:11])
    assert gw.x_origin == g.x_origin + 5 * g.cell_width
    assert gw.y_origin == g.y_origin + 3 * g.cell_height
    assert gw.rows == 4 and gw.cols == 6
    # clamping at the edge; empty window raises
    win2, _ = read_rawbin(p, window=(10, 13, 99, 99))
    assert win2.shape[:2] == (2, 2)
    with pytest.raises(ValueError, match="empty"):
        read_rawbin(p, window=(12, 0, 5, 5))
    # the router takes the same window path for raw extensions
    got, g3 = open_raster(p, window=(3, 5, 4, 6))
    assert np.array_equal(got, win) and g3 == gw
