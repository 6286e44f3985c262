"""COG writer: tiled GeoTIFF layout, overviews, georeferencing.

Parity target: Raster.to_COG (reference raster.py:1741-1791 via GDAL),
rebuilt from the public TIFF 6.0 + OGC GeoTIFF 1.1 specs.
"""

import numpy as np
import pytest

from rasters_ray.grids import GridSpec
from rasters_ray.sources.geotiff import read_geotiff, write_cog


def _grid(rows, cols):
    return GridSpec(crs="EPSG:4326", x_origin=-120.0, y_origin=40.0,
                    cell_width=0.01, cell_height=-0.01, rows=rows, cols=cols)


def test_uint16_roundtrip_with_overviews(tmp_path):
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 4096, (700, 900), dtype=np.uint16)
    path = str(tmp_path / "a.tif")
    write_cog(arr, _grid(700, 900), path, tile=256)
    levels, meta = read_geotiff(path)
    np.testing.assert_array_equal(levels[0], arr)  # deflate is lossless
    # 700x900 -> 350x450 -> 175x225: two overviews (stop when <= one tile)
    assert [lv.shape for lv in levels] == [(700, 900), (350, 450), (175, 225)]
    # georeferencing
    assert meta["pixel_scale"][:2] == [0.01, 0.01]
    assert meta["tiepoint"][3:5] == [-120.0, 40.0]
    assert 4326 in meta["geo_keys"]


def test_cog_layout_ifds_before_tiles(tmp_path):
    arr = np.arange(512 * 512, dtype=np.uint16).reshape(512, 512) % 1000
    path = str(tmp_path / "b.tif")
    write_cog(arr, _grid(512, 512), path, tile=256)
    levels, meta = read_geotiff(path)
    # the COG property: every IFD sits before the first tile byte
    assert max(meta["ifd_offsets"]) < meta["first_tile_offset"]
    assert len(levels) == 2  # 512 -> 256 fits one tile


def test_float32_and_uncompressed(tmp_path):
    arr = np.linspace(0, 1, 300 * 200, dtype=np.float32).reshape(300, 200)
    path = str(tmp_path / "c.tif")
    write_cog(arr, _grid(300, 200), path, tile=128, compression="none")
    levels, _ = read_geotiff(path)
    np.testing.assert_array_equal(levels[0], arr)


def test_overview_is_block_mean(tmp_path):
    arr = np.zeros((512, 512), dtype=np.uint8)
    arr[:256, :256] = 100
    path = str(tmp_path / "d.tif")
    write_cog(arr, _grid(512, 512), path, tile=256)
    levels, _ = read_geotiff(path)
    ov = levels[1]
    assert ov[0, 0] == 100 and ov[255, 255] == 0


def test_rejects_band_stack(tmp_path):
    with pytest.raises(ValueError, match="2D"):
        write_cog(np.zeros((2, 8, 8), np.uint8), _grid(8, 8), str(tmp_path / "e.tif"))
