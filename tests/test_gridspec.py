"""Grid window/subset/index semantics — mirrors the analytic golden values
of the reference's tests/test_subsetting.py (see FIXTURES.md §2)."""

import numpy as np
import pytest

from rasters_ray.grids import GridSpec, OutOfBoundsError, Window

G1 = GridSpec(
    crs="EPSG:4326",
    x_origin=-120.0,
    y_origin=40.0,
    cell_width=0.01,
    cell_height=-0.01,
    rows=100,
    cols=100,
)


def test_subset_with_window():
    # test_subsetting.py:28-41
    sub = G1.subset(Window(col_off=10, row_off=20, width=30, height=40))
    assert sub.rows == 40
    assert sub.cols == 30
    assert sub.x_origin == pytest.approx(-120.0 + 10 * 0.01, abs=1e-6)
    assert sub.y_origin == pytest.approx(40.0 + 20 * -0.01, abs=1e-6)


def test_slice_equivalence():
    # test_subsetting.py:153-159: grid[10:50, 20:70] -> 40 rows x 50 cols
    sub = G1[10:50, 20:70]
    assert sub.rows == 40
    assert sub.cols == 50
    assert sub.x_origin == pytest.approx(-120.0 + 20 * 0.01)
    assert sub.y_origin == pytest.approx(40.0 - 10 * 0.01)


def test_index_point_center_rule():
    # cell (0,0) center is (-119.995, 39.995)
    assert G1.index_point(-119.995, 39.995) == (0, 0)
    # nearest-center: a point just past halfway rounds to the next cell
    assert G1.index_point(-119.9949, 39.995) == (0, 0)
    assert G1.index_point(-119.9889, 39.995) == (0, 1)


def test_index_point_bankers_rounding():
    # int(round(.)) is round-half-even; testable only where the half is
    # binary-exact, so use a cell width of 0.25 (decimal grids like G1 put
    # float noise on the half and round by IEEE noise, identically in any
    # engine using the same formula — see oracle_sql point_index)
    g = GridSpec("EPSG:4326", -120.0, 40.0, 0.25, -0.25, 16, 16)
    # x = -119.75 -> colf = 1.0 - 0.5 = 0.5 exactly -> col 0 (half to even)
    _, col = g.index_point(-119.75, 39.875)
    assert col == round(0.5) == 0
    # x = -119.5 -> colf = 1.5 exactly -> col 2
    _, col = g.index_point(-119.5, 39.875)
    assert col == round(1.5) == 2


def test_window_plus_one_and_clamp():
    # bbox exactly one interior cell: UL=(xmin,ymax) LR=(xmax,ymin)
    win = G1.window((-119.55, 39.45, -119.45, 39.55))
    sub = G1.subset(win)
    assert sub.rows > 0 and sub.cols > 0
    # window covering the whole grid clamps to the grid
    win = G1.window((-121.0, 38.0, -118.0, 41.0))
    assert win == Window(col_off=0, row_off=0, width=100, height=100)


def test_window_golden_box():
    # the (-119.8,39.2,-119.2,39.8) box of test_subsetting.py:80-92
    win = G1.window((-119.8, 39.2, -119.2, 39.8))
    rs, cs = win.toslices()
    # IEEE float64: (−119.8+120)/0.01 − 0.5 = 19.50000000000028 -> 20;
    # (−119.2+120)/0.01 − 0.5 = 79.49999999999972 -> 79, +1 -> 80.
    # (pinned: the formula is the contract; oracle SQL recomputes the same
    # IEEE expression and must agree bit-for-bit)
    assert cs.start == 20
    assert cs.stop == 80
    assert rs.start == 20
    assert rs.stop == 80


def test_out_of_bounds():
    with pytest.raises(OutOfBoundsError):
        G1.window((-90.5, 29.5, -89.5, 30.5))  # disjoint from G1


def test_window_buffer():
    win0 = G1.window((-119.55, 39.45, -119.45, 39.55))
    win1 = G1.window((-119.55, 39.45, -119.45, 39.55), buffer=2)
    assert win1.col_off == win0.col_off - 2
    assert win1.width == win0.width + 4


def test_xy_centers():
    x, y = G1.xy()
    assert x.shape == (100, 100)
    assert x[0, 0] == pytest.approx(-119.995)
    assert y[0, 0] == pytest.approx(39.995)
    assert x[0, 99] == pytest.approx(-119.005)
    assert y[99, 0] == pytest.approx(39.005)


def test_round_trip_dict():
    d = G1.to_dict()
    assert d["type"] == "grid"
    assert GridSpec.from_dict(d) == G1


def test_merge_covering_grid():
    g2 = GridSpec("EPSG:4326", -119.0, 41.0, 0.02, -0.02, 50, 50)
    m = GridSpec.merge([G1, g2])
    xmin, ymin, xmax, ymax = m.bbox
    assert xmin <= -120.0 and ymax >= 41.0
    assert m.cell_width == 0.01  # min cell size wins


def test_index_points_vectorized_matches_scalar():
    rng = np.random.default_rng(0)
    xs = rng.uniform(-120.5, -118.5, 200)
    ys = rng.uniform(38.5, 40.5, 200)
    rows, cols = G1.index_points(xs, ys)
    for i in range(0, 200, 17):
        r, c = G1.index_point(xs[i], ys[i])
        assert (r, c) == (rows[i], cols[i])


def test_nan_points():
    rows, cols = G1.index_points([np.nan], [39.0])
    assert rows[0] == np.iinfo(np.int64).min


def test_resolution_and_shift_distance():
    import numpy as np

    from rasters_ray.grids import GridSpec

    g = GridSpec("EPSG:4326", -120.0, 40.0, 0.01, -0.01, 100, 100)
    r = g.resolution(0.02)
    assert (r.cell_width, r.cell_height) == (0.02, -0.02)
    assert (r.rows, r.cols) == (50, 50)
    assert (r.x_origin, r.y_origin) == (g.x_origin, g.y_origin)
    r2 = g.resolution((0.02, -0.005))
    assert (r2.rows, r2.cols) == (200, 50)
    # shift east by 0.5: direction 0 deg
    s = g.shift_distance(0.5, 0.0)
    assert abs(s.x_origin - (-119.5)) < 1e-12 and abs(s.y_origin - 40.0) < 1e-12
    # north: direction 90 deg
    s = g.shift_distance(0.5, 90.0)
    assert abs(s.x_origin - (-120.0)) < 1e-12 and abs(s.y_origin - 40.5) < 1e-12


def test_coverage_dict():
    from rasters_ray.grids import GridSpec

    g = GridSpec("EPSG:4326", -120.0, 40.0, 0.01, -0.01, 100, 200)
    c = g.coverage
    ax = c["domain"]["axes"]
    assert ax["x"]["num"] == 200 and ax["y"]["num"] == 100
    assert ax["x"]["start"] == -120.0 + 0.005
    assert ax["x"]["stop"] == -120.0 + 0.01 * 200 - 0.005
    # y start is the bottom-center, stop the top-center (reference form)
    assert abs(ax["y"]["start"] - (39.0 + 0.005)) < 1e-12
    assert abs(ax["y"]["stop"] - (40.0 - 0.005)) < 1e-12


def test_bbox_round_centroid():
    from rasters_ray.grids import bbox as bb

    assert bb.round_box((0.5, 1.5, 2.4, 3.6)) == (0.0, 2.0, 2.0, 4.0)
    assert bb.centroid((0.0, 0.0, 4.0, 2.0)) == (2.0, 1.0)
    assert bb.width((1.0, 0.0, 4.0, 2.0)) == 3.0
    assert bb.height((1.0, 0.0, 4.0, 2.0)) == 2.0
