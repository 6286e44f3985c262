"""open_raster magic router (the engine's Raster.open entry point)."""

import numpy as np
import pytest

from rasters_ray import codec
from rasters_ray.grids import GridSpec
from rasters_ray.sources.geotiff import write_cog
from rasters_ray.sources.hdf5lite import write_hdf5
from rasters_ray.sources.netcdf import write_netcdf
from rasters_ray.sources.open import open_raster, raster_dataset


def _grid(rows, cols):
    return GridSpec(crs="EPSG:4326", x_origin=-124.0, y_origin=44.0,
                    cell_width=0.01, cell_height=-0.01, rows=rows, cols=cols)


def test_open_geotiff(tmp_path):
    arr = (np.arange(40 * 60) % 251).astype(np.uint16).reshape(40, 60)
    p = str(tmp_path / "t.tif")
    write_cog(arr, _grid(40, 60), p, tile=32, overviews=False)
    a, g = open_raster(p)
    np.testing.assert_array_equal(a, arr)
    assert g.crs == "EPSG:4326"
    assert g.x_origin == pytest.approx(-124.0) and g.cell_width == pytest.approx(0.01)


def test_open_netcdf_classic_and_hdf5(tmp_path):
    rows, cols = 5, 7
    lat = 44.0 - 0.01 * (np.arange(rows) + 0.5)
    lon = -124.0 + 0.01 * (np.arange(cols) + 0.5)
    v = np.arange(rows * cols, dtype=np.float32).reshape(rows, cols)
    pc = str(tmp_path / "c.nc")
    write_netcdf(pc, dims={"lat": rows, "lon": cols}, variables={
        "lat": {"data": lat, "dims": ["lat"]},
        "lon": {"data": lon, "dims": ["lon"]},
        "v": {"data": v, "dims": ["lat", "lon"]}})
    a, g = open_raster(pc)  # var auto-detected: only one 2D variable
    np.testing.assert_array_equal(a, v)
    assert (g.rows, g.cols) == (rows, cols)
    ph = str(tmp_path / "h.nc")
    write_hdf5(ph, {"lat": lat, "lon": lon, "v": v})
    a2, g2 = open_raster(ph, var="v")
    np.testing.assert_array_equal(a2, v)
    assert g2.cell_width == pytest.approx(0.01)


def test_open_png_with_world_file(tmp_path):
    img = (np.arange(30 * 20) % 256).astype(np.uint8).reshape(30, 20)
    p = str(tmp_path / "i.png")
    open(p, "wb").write(codec.encode(img, "png"))
    a, g = open_raster(p)
    np.testing.assert_array_equal(a, img)
    assert g.cell_width == 1.0  # no sidecar: unit grid
    (tmp_path / "i.pgw").write_text("0.01\n0.0\n0.0\n-0.01\n-123.995\n43.995\n")
    (tmp_path / "i.crs").write_text("EPSG:4326\n")
    _, g2 = open_raster(p)
    assert g2.x_origin == pytest.approx(-124.0)
    assert g2.y_origin == pytest.approx(44.0)


def test_open_unknown_magic(tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"NOPE" * 4)
    with pytest.raises(ValueError, match="unrecognized raster format"):
        open_raster(str(p))


def test_raster_dataset_mixed_formats(ray_session, tmp_path):
    arr = (np.arange(16 * 16) % 251).astype(np.uint16).reshape(16, 16)
    write_cog(arr, _grid(16, 16), str(tmp_path / "a.tif"), tile=16, overviews=False)
    open(str(tmp_path / "b.png"), "wb").write(
        codec.encode(arr.astype(np.uint8), "png"))
    write_hdf5(str(tmp_path / "c.nc"),
               {"y": np.arange(4.0), "x": np.arange(3.0) + 10.0,
                "v": np.ones((4, 3), np.float32)})
    ds = raster_dataset([str(tmp_path / n) for n in ("a.tif", "b.png", "c.nc")],
                        var=None)
    # c.nc has one 2D var -> auto-detect; mixed formats one pipeline
    df = ds.to_pandas().sort_values("image_id").reset_index(drop=True)
    assert list(df["image_id"]) == ["a", "b", "c"]
    assert list(df["w"]) == [16, 16, 3] and list(df["h"]) == [16, 16, 4]


def test_open_cog_overview_levels(tmp_path):
    arr = (np.arange(64 * 96) % 251).astype(np.float32).reshape(64, 96)
    p = str(tmp_path / "ov.tif")
    write_cog(arr, _grid(64, 96), p, tile=32)
    full, g0 = open_raster(p, overview=0)
    np.testing.assert_array_equal(full, arr)
    ov1, g1 = open_raster(p, overview=1)
    assert ov1.shape == (32, 48)
    # extent preserved: fewer cells, proportionally larger cells
    assert g1.x_origin == g0.x_origin and g1.y_origin == g0.y_origin
    assert g1.cell_width == pytest.approx(g0.cell_width * 2)
    assert g1.cell_height == pytest.approx(g0.cell_height * 2)
    assert g1.rows == 32 and g1.cols == 48
    # level-1 pixels are the 2x2 block means the writer computed
    assert ov1[0, 0] == pytest.approx(arr[:2, :2].mean())
    with pytest.raises(ValueError, match="pyramid level"):
        open_raster(p, overview=99)
    with pytest.raises(ValueError, match="not both"):
        open_raster(p, overview=1, window=(0, 0, 4, 4))


def test_open_overview_rejected_off_tiff(tmp_path):
    import rasters_ray.sources.srtm as srtm

    hp = str(tmp_path / "N10E020.hgt")
    srtm.write_hgt(np.zeros((3, 3)), hp)
    with pytest.raises(NotImplementedError, match="pyramid"):
        open_raster(hp, overview=1)
    nc = str(tmp_path / "x.nc")
    write_netcdf(nc, {"y": 2, "x": 2},
                 {"v": {"dims": ("y", "x"),
                        "data": np.zeros((2, 2), np.float32)}})
    with pytest.raises(NotImplementedError, match="pyramid"):
        open_raster(nc, overview=1)


def test_open_bare_tiff_with_tfw(tmp_path):
    # a TIFF with NO GeoKeys georeferences through the .tfw world file
    # (GDAL's fallback for scanned maps); without one it's a unit grid
    from rasters_ray.sources.geotiff import write_geotiff

    arr = np.arange(12, dtype=np.uint8).reshape(3, 4)
    p = str(tmp_path / "scan.tif")
    write_geotiff(arr, _grid(3, 4), p)
    # strip the geo tags by rewriting the file as a plain image: easier
    # here to write a fresh TIFF then delete its world knowledge via a
    # monkeypatched meta — instead just verify the fallback path directly
    from rasters_ray.sources.open import _geotiff_grid

    g = _geotiff_grid({}, 3, 4, p)  # no pixel_scale/tiepoint keys
    assert g.cell_width == 1.0 and g.x_origin == 0.0  # unit grid, no .tfw
    (tmp_path / "scan.tfw").write_text("0.5\n0\n0\n-0.5\n100.25\n49.75\n")
    g2 = _geotiff_grid({}, 3, 4, p)
    assert g2.cell_width == 0.5 and g2.cell_height == -0.5
    # world files locate the CENTER of the top-left pixel
    assert g2.x_origin == 100.0 and g2.y_origin == 50.0
    with pytest.raises(ValueError, match="ModelPixelScale"):
        _geotiff_grid({}, 3, 4, None)


def test_open_external_ovr_overviews(tmp_path, ray_session):
    from rasters_ray.sources.geotiff import write_cog, write_geotiff

    arr = (np.arange(64 * 64) % 199).astype(np.float32).reshape(64, 64)
    p = str(tmp_path / "plain.tif")
    write_geotiff(arr, _grid(64, 64), p)          # no embedded pyramid
    with pytest.raises(ValueError, match="pyramid level"):
        open_raster(p, overview=1)                # and no .ovr yet
    # build the external pyramid: a COG whose levels 1.. are the
    # overviews; store them as the .ovr sidecar (GDAL layout)
    import rasters_ray.sources.geotiff as gt

    levels, _ = gt.read_geotiff(p)
    ov1 = arr.reshape(32, 2, 32, 2).mean(axis=(1, 3)).astype(np.float32)
    write_geotiff(ov1, _grid(32, 32), p + ".ovr")
    got, g = open_raster(p, overview=1)
    np.testing.assert_allclose(got, ov1)
    assert g.cell_width == pytest.approx(0.02)
    # streaming ingest at an overview level decodes the small arrays
    ds = raster_dataset([str(tmp_path / "plain.tif")], overview=1)
    t = ds.take_all()
    assert t[0]["w"] == 32 and t[0]["h"] == 32
