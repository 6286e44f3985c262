"""Small geometric operators: trim, boundary, antimeridian, explode,
intersects, distances, latlon, IDW, render, band stack, to_geometry."""

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray import codec
from rasters_ray.grids import GridSpec, SwathSpec, Window
from rasters_ray.grids.geomops import (
    boundary_ring,
    crosses_antimeridian,
    grids_intersect,
    latlon,
    pixel_centroids,
    pixel_outlines,
    point_distance,
    point_distances,
    trim,
    trim_bounds,
)
from rasters_ray.stages.sampling import idw_sample_array

G = GridSpec("EPSG:4326", -120.0, 40.0, 0.01, -0.01, 20, 20)


def test_trim():
    a = np.full((20, 20), np.nan)
    a[3:8, 5:15] = 1.0
    win = trim_bounds(a)
    assert win == Window(col_off=5, row_off=3, width=10, height=5)
    arr2, g2 = trim(a, G)
    assert arr2.shape == (5, 10)
    assert g2.x_origin == pytest.approx(-120.0 + 5 * 0.01)
    assert g2.y_origin == pytest.approx(40.0 - 3 * 0.01)


def test_trim_all_nan():
    a = np.full((4, 4), np.nan)
    assert trim_bounds(a).width == 0


def test_boundary_ring_covers_extent():
    ring = boundary_ring(G)
    assert ring[:, 0].min() == pytest.approx(-120.0)
    assert ring[:, 0].max() == pytest.approx(-119.8)
    assert ring[:, 1].min() == pytest.approx(39.8)
    assert ring[:, 1].max() == pytest.approx(40.0)


def test_crosses_antimeridian():
    assert not crosses_antimeridian(G)
    g2 = GridSpec("EPSG:4326", 179.9, 10.0, 0.01, -0.01, 20, 40)
    assert crosses_antimeridian(g2)
    sw = SwathSpec(np.array([[-179.95, 179.95]]), np.array([[0.0, 0.0]]))
    assert crosses_antimeridian(sw)


def test_pixel_centroids_and_outlines():
    g = GridSpec("EPSG:4326", -120.0, 40.0, 0.5, -0.5, 2, 3)
    rr, cc, x, y = pixel_centroids(g)
    assert len(rr) == 6
    assert x[0] == pytest.approx(-119.75)
    assert y[0] == pytest.approx(39.75)
    boxes = pixel_outlines(g)
    assert len(boxes) == 6
    assert boxes[0][0][0] == pytest.approx(-120.0)


def test_grids_intersect():
    g2 = GridSpec("EPSG:4326", -119.95, 39.95, 0.01, -0.01, 5, 5)
    assert grids_intersect(G, g2)
    g3 = GridSpec("EPSG:4326", -100.0, 10.0, 0.01, -0.01, 5, 5)
    assert not grids_intersect(G, g3)


def test_latlon_identity_and_utm():
    lat, lon = latlon(G)
    assert lat[0, 0] == pytest.approx(39.995)
    assert lon[0, 0] == pytest.approx(-119.995)
    from rasters_ray.proj import transform_point

    e, n = transform_point(-120.0, 40.0, "EPSG:4326", "EPSG:32611")
    gu = GridSpec("EPSG:32611", e, n, 100.0, -100.0, 4, 4)
    lat2, lon2 = latlon(gu)
    assert lat2[0, 0] == pytest.approx(40.0, abs=0.01)
    assert lon2[0, 0] == pytest.approx(-120.0, abs=0.01)


def test_point_distances():
    # ~1.1 km for 0.01 deg of latitude at lat 40
    d = point_distance(-120.0, 40.0, -120.0, 40.01)
    assert d == pytest.approx(1110.0, rel=0.05)
    ds = point_distances(-120.0, 40.0, [-120.0, -119.99], [40.01, 40.0])
    assert ds[0] == pytest.approx(d, rel=1e-9)
    assert ds[1] == pytest.approx(852.0, rel=0.05)  # 0.01 deg lon at 40N


def test_idw_exact_on_centroid_and_interpolates():
    arr = np.arange(16, dtype=np.float64).reshape(4, 4)
    g = GridSpec("EPSG:4326", 0.0, 4.0, 1.0, -1.0, 4, 4)
    gx, gy = g.xy()
    v = idw_sample_array(arr, g, np.array([gx[1, 2]]), np.array([gy[1, 2]]))
    assert v[0] == arr[1, 2]
    # midpoint between two equal-valued pixels -> that value
    arr2 = np.full((4, 4), 7.0)
    v2 = idw_sample_array(arr2, g, np.array([1.0]), np.array([2.0]))
    assert v2[0] == pytest.approx(7.0)


def test_render_and_stack_and_router(ray_session):
    import ray.data as rd

    from rasters_ray.sources import make_oracle_images
    from rasters_ray.stages.sampling import band_stack, render_png, to_geometry

    ds = rd.from_arrow(make_oracle_images(np.arange(2)))
    rendered = ds.map_batches(render_png, batch_format="pyarrow").to_pandas()
    img = codec.decode(rendered["bytes"][0], "png")
    assert img.dtype == np.uint8 and img.shape == (100, 100)
    # PSNR of the stretch re-encode vs a float re-stretch >= 40dB
    src = codec.decode(make_oracle_images(np.arange(1)).column("bytes")[0].as_py(), "npy")
    stretched = (src - src.min()) / (src.max() - src.min()) * 255.0
    assert codec.psnr(stretched, img.astype(np.float64), peak=255.0) >= 40.0

    # stack: two bands grouped under one key
    two = make_oracle_images(np.arange(2))
    two = two.set_column(
        two.column_names.index("caption"), "caption", pa.array(["g", "g"], pa.string())
    )
    stacked = band_stack(rd.from_arrow(two)).to_pandas()
    assert len(stacked) == 1
    arr = codec.decode(stacked["bytes"][0], "npy")
    assert arr.shape == (2, 100, 100)

    # router: grid target -> warp
    tgt = GridSpec("EPSG:4326", -124.0, 44.0, 0.02, -0.02, 50, 50)
    warped = to_geometry(rd.from_arrow(make_oracle_images(np.arange(1))), tgt).to_pandas()
    assert codec.decode(warped["bytes"][0], "npy").shape == (50, 50)


def test_cell_areas_graticule():
    import numpy as np
    from rasters_ray.grids.geomops import (area_weighted_mean, cell_areas,
                                           grid_area, _EARTH_R)
    from rasters_ray.grids import GridSpec

    g = GridSpec(crs="EPSG:4326", x_origin=-120.0, y_origin=40.0,
                 cell_width=1 / 64, cell_height=-1 / 64, rows=16, cols=16)
    a = cell_areas(g)
    assert a.shape == (16,)
    # rows nearer the equator are larger
    assert np.all(np.diff(a) > 0)
    # telescoped total == per-row sum * cols (to fp accumulation)
    assert grid_area(g) == pytest.approx(float(a.sum()) * 16, rel=1e-12)
    # global grid sums to the sphere's area
    gg = GridSpec(crs="EPSG:4326", x_origin=-180.0, y_origin=90.0,
                  cell_width=1.0, cell_height=-1.0, rows=180, cols=360)
    sphere = 4 * np.pi * _EARTH_R ** 2
    assert grid_area(gg) == pytest.approx(sphere, rel=1e-12)
    # projected grids are planar
    gp = GridSpec(crs="EPSG:32610", x_origin=0.0, y_origin=0.0,
                  cell_width=30.0, cell_height=-30.0, rows=4, cols=5)
    assert np.all(cell_areas(gp) == 900.0)
    assert grid_area(gp) == 900.0 * 20
    # weighted mean: constant field -> the constant; NaN-aware
    arr = np.full((16, 16), 7.0)
    assert area_weighted_mean(arr, g) == pytest.approx(7.0)
    arr[0, :] = np.nan
    assert area_weighted_mean(arr, g) == pytest.approx(7.0)
    # a field equal to the row index weights toward high rows (south)
    ramp = np.repeat(np.arange(16.0)[:, None], 16, axis=1)
    assert area_weighted_mean(ramp, g) > 7.49999
