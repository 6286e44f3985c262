"""Swath (RasterGeolocation) semantics — mirrors tests/test_subsetting.py
(S1 fixture, FIXTURES.md §2)."""

import numpy as np
import pytest

from rasters_ray.grids import SwathSpec, Window

# S1: 50x50 meshgrid of x=linspace(-120,-119,50), y=linspace(40,39,50)
S1 = SwathSpec.from_vectors(np.linspace(-120, -119, 50), np.linspace(40, 39, 50))


def test_subset_window_equals_slices():
    # test_subsetting.py:175-188: subset(Window(5,10,20,15)) == [10:25, 5:25]
    sub = S1.subset(Window(col_off=5, row_off=10, width=20, height=15))
    np.testing.assert_array_equal(sub.x, S1.x[10:25, 5:25])
    np.testing.assert_array_equal(sub.y, S1.y[10:25, 5:25])


def test_disjoint_point_raises():
    # test_subsetting.py:334-342
    with pytest.raises(ValueError, match="No points found within the target geometry"):
        S1.window((-90.01, 29.99, -89.99, 30.01))


def test_bbox_mask_inclusive():
    mask = S1.index((-120.0, 39.5, -119.5, 40.0))
    rows, cols = np.where(mask)
    assert mask.any()
    # inclusive bounds: the corner point itself is included
    assert mask[0, 0]


def test_index_point_nearest():
    # swath nearest-cell: exact grid node maps to itself
    r, c = S1.index_point(float(S1.x[7, 13]), float(S1.y[7, 13]))
    assert (r, c) == (7, 13)
    # a point slightly off a node still maps to it
    step = 1.0 / 49
    r, c = S1.index_point(float(S1.x[7, 13]) + 0.3 * step, float(S1.y[7, 13]) - 0.3 * step)
    assert (r, c) == (7, 13)


def test_index_points_vectorized():
    rng = np.random.default_rng(1)
    qx = rng.uniform(-120, -119, 300)
    qy = rng.uniform(39, 40, 300)
    rows, cols = S1.index_points(qx, qy)
    # brute-force oracle
    px = S1.x.ravel()
    py = S1.y.ravel()
    for i in range(0, 300, 23):
        d2 = (px - qx[i]) ** 2 + (py - qy[i]) ** 2
        rr, cc = np.unravel_index(np.argmin(d2), S1.shape)
        assert (rows[i], cols[i]) == (rr, cc)


def test_grid_swath_consistency():
    # test_subsetting.py:345-421: a swath built from a grid's centers
    # indexes points to the same cells
    from rasters_ray.grids import GridSpec

    g = GridSpec("EPSG:4326", -120.0, 40.0, 0.01, -0.01, 50, 50)
    gx, gy = g.xy()
    sw = SwathSpec(gx, gy)
    rng = np.random.default_rng(2)
    qx = rng.uniform(-119.99, -119.52, 100)
    qy = rng.uniform(39.52, 39.99, 100)
    gr, gc = g.index_points(qx, qy)
    sr, sc = sw.index_points(qx, qy)
    # both implement nearest-center; ties can round differently only exactly
    # on boundaries, which the uniform draw avoids almost surely
    np.testing.assert_array_equal(gr, sr)
    np.testing.assert_array_equal(gc, sc)


def test_swath_nan_rejected():
    x = np.full((3, 3), np.nan)
    with pytest.raises(ValueError):
        SwathSpec(x, x)


def test_geographic_clip():
    x = np.array([[-190.0, 185.0]])
    y = np.array([[95.0, -95.0]])
    sw = SwathSpec(x, y)
    assert sw.x.min() >= -180.0 and sw.x.max() <= 179.9999
    assert sw.y.min() >= -90.0 and sw.y.max() <= 90.0


def test_dict_round_trip():
    d = S1.to_dict()
    back = SwathSpec.from_dict(d)
    np.testing.assert_allclose(back.x, S1.x)
    np.testing.assert_allclose(back.y, S1.y)
