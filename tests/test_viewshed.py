"""R3 viewshed: sampling rule, wall shadows, grazing, dataset stage."""

import numpy as np
import pytest

from rasters_ray.stages.viewshed import viewshed


def _wall_dem(p, wh, h=16, w=16):
    dem = np.zeros((h, w), dtype=float)
    dem[:, p] = wh
    return dem


def _cone_count(p, wh, obs_h=3.0):
    # closed form for the dominant-column cone {|r-8| <= c, c >= 1}:
    # pre-wall & wall columns fully visible; post-wall column c visible
    # iff the wall angle does not strictly exceed the target angle:
    # (wh - 3)/p <= -3/c  <=>  c*(3 - wh) >= 3*p (wh < 3), else hidden
    total = 0
    for c in range(1, 16):
        cone = 2 * c + 1 if c <= 7 else 16
        if c <= p:
            total += cone
        elif wh < obs_h and c * (3 - wh) >= 3 * p:
            total += cone
    return total


def test_wall_shadow_exhaustive_cone():
    # the exact construction q_viewshed uses: observer (8, 0) height 3
    # over a flat DEM with a full-height-wh wall column at p; every
    # (p, wh) combination of the query keyspace
    rr, cc = np.indices((16, 16))
    cone = (np.abs(rr - 8) <= cc) & (cc >= 1)
    for p in range(2, 12):
        for wh in range(1, 6):
            v = viewshed(_wall_dem(p, wh), (8, 0), height=3.0)
            assert int(np.sum(v & cone)) == _cone_count(p, wh), (p, wh)


def test_flat_dem_all_visible_and_self():
    v = viewshed(np.zeros((9, 9)), (4, 4), height=2.0)
    assert v.all()
    # zero height on flat ground: grazing rays (equal angles) stay
    # visible by the strict-blocking rule
    v0 = viewshed(np.zeros((9, 9)), (4, 4), height=0.0)
    assert v0.all()


def test_grazing_equal_angle_visible():
    # wall at d=2 with angle exactly equal to the target's angle at
    # d=4: (2-0)*4 == (4-0)*2 -> NOT blocked (strict rule)
    dem = np.zeros((1, 6))
    dem[0, 2] = 2.0
    dem[0, 4] = 4.0
    v = viewshed(dem, (0, 0), height=0.0)
    assert v[0, 4]
    # one unit taller blocks
    dem[0, 2] = 2.5
    assert not viewshed(dem, (0, 0), height=0.0)[0, 4]


def test_bilinear_cross_axis_interpolation():
    # ray to (2, 4): dominant axis is columns, samples at c=1,2,3 with
    # fractional rows r = c/2; a spike at (1, 2) only half-counts
    dem = np.zeros((4, 5))
    dem[1, 2] = 10.0
    # sample at c=2 sits at r=1.0 -> exactly on the spike: angle 10/2
    # vs target 0/4 -> blocked
    assert not viewshed(dem, (0, 0), height=0.0)[2, 4]
    dem = np.zeros((4, 5))
    dem[0, 2] = 10.0  # sample at (1.0, 2) no longer touches the spike
    assert viewshed(dem, (0, 0), height=0.0)[2, 4]


def test_validates_inputs():
    with pytest.raises(ValueError):
        viewshed(np.array([[0.0, np.nan]]), (0, 0))
    with pytest.raises(ValueError):
        viewshed(np.zeros((4, 4)), (5, 1))


def test_viewshed_stats_dataset(ray_session):
    import ray

    from rasters_ray import codec
    from rasters_ray.stages.viewshed import viewshed_stats

    ds = ray.data.from_items([{
        "image_id": "i0",
        "bytes": codec.encode(_wall_dem(4, 5), "npy"),
        "fmt": "npy",
    }])
    row = viewshed_stats(ds, (8, 0), height=3.0).take_all()[0]
    v = viewshed(_wall_dem(4, 5), (8, 0), height=3.0)
    assert row["n_visible"] == int(v.sum())
    # wall wh=5 > observer height 3: everything past column 4 is
    # shadowed, so the farthest visible cell is the pre-wall corner
    # (0, 3) at Chebyshev radius 8
    assert row["max_radius"] == 8


def test_cast_shadows_bruteforce():
    import numpy as np

    from rasters_ray.stages.viewshed import cast_shadows

    rng = np.random.default_rng(9)
    z = rng.integers(0, 30, (6, 10))
    for p, q in ((1, 1), (2, 3), (0, 1), (5, 2)):
        s = cast_shadows(z, p, q)
        for r in range(6):
            for c in range(10):
                exp = any(q * (z[r, cp] - z[r, c]) > p * (c - cp)
                          for cp in range(c))
                assert s[r, c] == exp


def test_cast_shadows_wall_and_errors():
    import numpy as np
    import pytest

    from rasters_ray.stages.viewshed import cast_shadows

    z = np.zeros((1, 8), dtype=np.int64)
    z[0, 2] = 10
    s = cast_shadows(z, 1, 1)
    # shadow extends while 10 > c - 2, i.e. columns 3..7 here
    assert list(s[0].astype(int)) == [0, 0, 0, 1, 1, 1, 1, 1]
    # steeper sun (slope 3): shadow while 10 > 3*(c-2) -> cols 3..5
    s3 = cast_shadows(z, 3, 1)
    assert list(s3[0].astype(int)) == [0, 0, 0, 1, 1, 1, 0, 0]
    with pytest.raises(ValueError):
        cast_shadows(z, 1, 0)
    with pytest.raises(ValueError):
        cast_shadows(np.array([[np.nan, 1.0]]), 1, 1)


def test_sun_hours_spike_and_bruteforce():
    from rasters_ray.stages.viewshed import cast_shadows, sun_hours

    z = np.zeros((7, 7), dtype=np.int64)
    z[3, 3] = 10
    lit = sun_hours(z, 1, 1)
    assert lit[3, 3] == 4  # peak never shadowed
    # one azimuth shadows each of the four rook neighbors
    assert lit[3, 4] == 3 and lit[3, 2] == 3
    assert lit[4, 3] == 3 and lit[2, 3] == 3
    assert lit[0, 0] == 4
    # brute force: per cell, per azimuth blocking test
    rng = np.random.default_rng(8)
    z = rng.integers(0, 30, (9, 9)).astype(np.int64)
    p, q = 2, 3
    lit = sun_hours(z, p, q)
    dirs = [(0, 1), (0, -1), (1, 0), (-1, 0)]  # ray travel direction
    for r in range(9):
        for c in range(9):
            n = 4
            for dr, dc in dirs:
                rr, cc, d = r - dr, c - dc, 1
                while 0 <= rr < 9 and 0 <= cc < 9:
                    if q * (z[rr, cc] - z[r, c]) > p * d:
                        n -= 1
                        break
                    rr, cc, d = rr - dr, cc - dc, d + 1
            assert lit[r, c] == n, (r, c)
    # flat surface is fully lit everywhere
    assert (sun_hours(np.zeros((5, 5), dtype=np.int64), 1, 1) == 4).all()
