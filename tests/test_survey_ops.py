"""Coverage for the long tail of SURVEY.md §2: method table, local-UTM
reprojection, GeoJSON round-trip, swath resize, kNN index spill."""

import os

import numpy as np
import pytest

from rasters_ray.grids import GridSpec, SwathSpec
from rasters_ray.sources.geojson import (
    geojson_to_polygons,
    points_to_geojson,
    polygons_to_geojson,
)
from rasters_ray.sources.vectors import fixture_points, fixture_polygons
from rasters_ray.stages.resample import (
    METHOD_TABLE,
    KNNResampler,
    resolve_method,
    utm_target_grid,
    warp_array,
)

SRC = GridSpec("EPSG:4326", -120.0, 40.0, 0.01, -0.01, 100, 100)
RAMP = (np.arange(100)[:, None] * 100.0 + np.arange(100)[None, :]).astype(np.float64)


def test_method_table_covers_reference_13():
    # constants.py:13-27 names ('linear' is the reference's bilinear), each
    # a real kernel now (no aliasing)
    for name in ["nearest", "linear", "cubic", "cubic_spline", "lanczos",
                 "average", "mode", "gauss", "min", "max", "med", "q1", "q3"]:
        assert resolve_method(name) == ("bilinear" if name == "linear" else name)
    with pytest.raises(ValueError):
        resolve_method("nope")


def test_reduction_kernels_2x_downscale():
    tgt = GridSpec("EPSG:4326", -120.0, 40.0, 0.02, -0.02, 50, 50)
    blocks = RAMP.reshape(50, 2, 50, 2).transpose(0, 2, 1, 3).reshape(50, 50, 4)
    expect = {
        "average": blocks.mean(-1),
        "sum": blocks.sum(-1),
        "min": blocks.min(-1),
        "max": blocks.max(-1),
        "med": np.median(blocks, -1),
        "q1": np.quantile(blocks, 0.25, -1),
        "q3": np.quantile(blocks, 0.75, -1),
        "rms": np.sqrt((blocks**2).mean(-1)),
    }
    for m, want in expect.items():
        out = warp_array(RAMP, SRC, tgt, m)
        np.testing.assert_allclose(out, want, rtol=1e-12, err_msg=m)


def test_mode_kernel():
    tgt = GridSpec("EPSG:4326", -120.0, 40.0, 0.02, -0.02, 50, 50)
    arr = np.zeros((100, 100))
    arr[::2, :] = 7.0  # each 2x2 block: {7, 7, 0, 0} -> tie -> smallest = 0
    out = warp_array(arr, SRC, tgt, "mode")
    assert (out == 0.0).all()
    arr[1::2, ::2] = 7.0  # blocks now {7,7,7,0} -> 7
    out = warp_array(arr, SRC, tgt, "mode")
    assert (out == 7.0).all()


def test_reduction_nan_handling():
    tgt = GridSpec("EPSG:4326", -120.0, 40.0, 0.02, -0.02, 50, 50)
    arr = RAMP.copy()
    arr[0, 0] = np.nan  # first block has 3 finite values
    out = warp_array(arr, SRC, tgt, "min")
    assert out[0, 0] == RAMP[0, 1]
    arr[:2, :2] = np.nan  # first block all-NaN -> fill (NaN)
    out = warp_array(arr, SRC, tgt, "sum")
    assert np.isnan(out[0, 0])
    np.testing.assert_allclose(out[0, 1], RAMP.reshape(50, 2, 50, 2).sum(axis=(1, 3))[0, 1])


def test_reduction_upscale_falls_back_to_nearest():
    # upscale 2x: no source center lands in most target cells -> nearest
    tgt = GridSpec("EPSG:4326", -120.0, 40.0, 0.005, -0.005, 200, 200)
    out = warp_array(RAMP, SRC, tgt, "average")
    want = warp_array(RAMP, SRC, tgt, "nearest")
    np.testing.assert_allclose(out, want)


def test_separable_kernels_preserve_constant_and_interpolate():
    tgt = GridSpec("EPSG:4326", -119.9, 39.9, 0.013, -0.013, 40, 40)
    const = np.full((100, 100), 3.25)
    for m in ["bilinear", "cubic", "cubic_spline", "lanczos", "gauss"]:
        out = warp_array(const, SRC, tgt, m)
        fin = np.isfinite(out)
        assert fin.mean() > 0.8, m
        np.testing.assert_allclose(out[fin], 3.25, atol=1e-9, err_msg=m)
    # bilinear/cubic reproduce a linear ramp exactly away from the edges;
    # normalized lanczos only approximately (windowed sinc)
    rowf = (tgt.y_origin + (np.arange(40) + 0.5) * tgt.cell_height - SRC.y_origin) / SRC.cell_height - 0.5
    colf = (tgt.x_origin + (np.arange(40) + 0.5) * tgt.cell_width - SRC.x_origin) / SRC.cell_width - 0.5
    want = rowf[:, None] * 100.0 + colf[None, :]
    for m, tol in [("bilinear", 1e-6), ("cubic", 1e-6), ("lanczos", None)]:
        out = warp_array(RAMP, SRC, tgt, m)
        if tol is None:
            np.testing.assert_allclose(out[5:-5, 5:-5], want[5:-5, 5:-5], rtol=5e-3, err_msg=m)
        else:
            np.testing.assert_allclose(out[5:-5, 5:-5], want[5:-5, 5:-5], atol=tol, err_msg=m)


def test_warp_3d_bands():
    tgt = GridSpec("EPSG:4326", -120.0, 40.0, 0.02, -0.02, 50, 50)
    stack = np.stack([RAMP, RAMP * 2 + 1, -RAMP])
    for m in ["nearest", "bilinear", "average", "max"]:
        out = warp_array(stack, SRC, tgt, m)
        assert out.shape == (3, 50, 50)
        for b in range(3):
            np.testing.assert_allclose(out[b], warp_array(stack[b], SRC, tgt, m), err_msg=m)


def test_knn_resample_3d_bands():
    tgt = GridSpec("EPSG:4326", -120.0, 40.0, 0.02, -0.02, 50, 50)
    rs = KNNResampler()
    stack = np.stack([RAMP, RAMP * 3])
    out = rs.resample(stack, SRC, tgt)
    assert out.shape == (2, 50, 50)
    np.testing.assert_allclose(out[0], rs.resample(RAMP, SRC, tgt))
    np.testing.assert_allclose(out[1], rs.resample(RAMP * 3, SRC, tgt))


def test_utm_target_grid():
    tgt = utm_target_grid(SRC, 100.0)
    assert tgt.crs == "EPSG:32611"  # lon ~ -119.5 -> zone 11 (EPSG form +1)
    assert tgt.cell_width == 100.0
    # footprint ~1 deg x 1 deg ~ 85 x 111 km at lat 40
    assert 700 <= tgt.cols <= 1000
    assert 1000 <= tgt.rows <= 1300


def test_warp_crs_round_trip_utm():
    # warp the ramp into local UTM and sample its center: value preserved
    tgt = utm_target_grid(SRC, 200.0)
    out = warp_array(RAMP, SRC, tgt, "nearest")
    finite = np.isfinite(out)
    assert finite.mean() > 0.5
    # center of the UTM grid corresponds to the center of the source
    rc = out[tgt.rows // 2, tgt.cols // 2]
    assert abs(rc - RAMP[50, 50]) < 300  # within a few source cells


def test_geojson_round_trip():
    polys = fixture_polygons(6)
    text = polygons_to_geojson(polys)
    back = geojson_to_polygons(text)
    assert back.num_rows == polys.num_rows
    assert back.column("poly_id").to_pylist() == polys.column("poly_id").to_pylist()
    r0 = polys.column("rings")[0].as_py()
    r1 = back.column("rings")[0].as_py()
    assert r0 == r1
    pts = fixture_points(5)
    j = points_to_geojson(pts)
    assert '"Point"' in j


def test_swath_resize():
    sw = SwathSpec.from_vectors(np.linspace(-120, -119, 50), np.linspace(40, 39, 50))
    z = sw.resize(100, 100)
    assert z.shape == (100, 100)
    assert z.x[0, 0] == pytest.approx(-120.0)
    assert z.x[-1, -1] == pytest.approx(-119.0)
    assert z.y[0, 0] == pytest.approx(40.0)
    # antimeridian swath resizes without a seam
    xs = np.array([[179.5, 179.9], [179.5, 179.9]])
    xs2 = np.array([[179.5, -179.7], [179.5, -179.7]])
    sw2 = SwathSpec(xs2, np.array([[10.0, 10.0], [9.0, 9.0]]))
    z2 = sw2.resize(2, 4)
    # interpolated longitudes stay near 180, not near 0
    assert np.all((np.abs(z2.x) > 179.0) | (np.abs(z2.x) <= 180.0))
    assert np.abs(z2.x).min() > 179.0


def test_knn_spill_reload(tmp_path):
    gx, gy = SRC.xy()
    swath = SwathSpec(gx, gy)
    r1 = KNNResampler(spill_dir=str(tmp_path))
    out1 = r1.resample(RAMP, swath, SRC)
    files = [f for f in os.listdir(tmp_path) if f.endswith(".npz")]
    assert len(files) == 1
    # a fresh resampler (simulating actor restart) loads from spill
    r2 = KNNResampler(spill_dir=str(tmp_path))
    out2 = r2.resample(RAMP, swath, SRC)
    np.testing.assert_array_equal(out1, out2)


def test_point_buffer_circle():
    from rasters_ray.grids import point_buffer

    ring = point_buffer(10.0, 20.0, 2.0, quadsegs=8)
    assert len(ring) == 4 * 8 + 1
    assert ring[0] == ring[-1]
    pts = np.array([[p["x"], p["y"]] for p in ring[:-1]])
    np.testing.assert_allclose(np.hypot(pts[:, 0] - 10.0, pts[:, 1] - 20.0), 2.0)
    with pytest.raises(ValueError):
        point_buffer(0, 0, -1.0)


def test_buffered_points_feed_rasterize():
    import pyarrow as pa

    from rasters_ray.grids import buffered_points_to_polygons
    from rasters_ray.stages.pip import rasterize_mask

    pts = pa.table(
        {
            "point_id": pa.array(["a"]),
            "x": pa.array([-119.5]),
            "y": pa.array([39.5]),
        }
    )
    polys = buffered_points_to_polygons(pts, distance=0.1, quadsegs=16)
    g = GridSpec("EPSG:4326", -120.0, 40.0, 0.01, -0.01, 100, 100)
    mask = rasterize_mask(g, polys)
    # ~pi * (0.1/0.01)^2 = ~314 cells
    assert 280 <= mask.sum() <= 330
    rows, cols = np.where(mask)
    assert abs(rows.mean() - 49.5) < 1 and abs(cols.mean() - 49.5) < 1


def test_wrap_geometry_dispatch():
    import pyarrow as pa

    from rasters_ray.grids import wrap_geometry

    # passthrough
    assert wrap_geometry(None) is None
    assert wrap_geometry(SRC) is SRC
    t = pa.table({"point_id": pa.array(["p"]), "x": pa.array([1.0]), "y": pa.array([2.0])})
    assert wrap_geometry(t) is t
    # grid dict
    g = wrap_geometry({k: v for k, v in SRC.to_dict().items() if k != "type"})
    assert isinstance(g, GridSpec) and g.x_origin == SRC.x_origin
    # bbox tuple
    kind, box = wrap_geometry((-1.0, -2.0, 3.0, 4.0))
    assert kind == "bbox" and box == (-1.0, -2.0, 3.0, 4.0)
    # xy pair and pair list
    p = wrap_geometry((1.5, 2.5))
    assert p.num_rows == 1 and p.column("x")[0].as_py() == 1.5
    mp = wrap_geometry([(0.0, 0.0), (1.0, 1.0)])
    assert mp.num_rows == 2
    # GeoJSON string: polygon
    gj = '{"type": "Polygon", "coordinates": [[[0,0],[1,0],[1,1],[0,0]]]}'
    poly = wrap_geometry(gj)
    assert poly.column_names == ["poly_id", "rings"] and poly.num_rows == 1
    # GeoJSON mapping: multipoint
    mp2 = wrap_geometry({"type": "MultiPoint", "coordinates": [[5, 6], [7, 8]]})
    assert mp2.num_rows == 2 and mp2.column("y")[1].as_py() == 8.0
    with pytest.raises(ValueError):
        wrap_geometry(object())


def test_bspline_orders_partition_of_unity():
    from rasters_ray.stages.resample import _bspline_kernel

    for order in (2, 4, 5):
        k = _bspline_kernel(order)
        # cardinal B-splines sum to 1 over integer shifts at any phase
        for phase in (0.0, 0.25, 0.49):
            total = sum(k(np.array([phase - j]))[0] for j in range(-4, 5))
            assert abs(total - 1.0) < 1e-12, (order, phase)
        # symmetric, non-negative, supported on (n+1)/2
        assert k(np.array([0.3]))[0] == pytest.approx(k(np.array([-0.3]))[0])
        assert k(np.array([(order + 1) / 2 + 0.01]))[0] == 0.0


def test_resize_orders():
    from rasters_ray.stages.resample import resize_array

    for order in range(6):
        out, tgt = resize_array(RAMP, SRC, 50, 50, order=order)
        assert out.shape == (50, 50)
        assert (tgt.rows, tgt.cols) == (50, 50)
        assert tgt.cell_width == pytest.approx(0.02)
        fin = np.isfinite(out)
        assert fin.mean() > 0.9, order
    const = np.full((100, 100), 7.5)
    for order in (2, 4, 5):
        out, _ = resize_array(const, SRC, 40, 40, order=order)
        fin = np.isfinite(out)
        np.testing.assert_allclose(out[fin], 7.5, atol=1e-9)
    with pytest.raises(ValueError):
        resize_array(RAMP, SRC, 50, 50, order=7)
