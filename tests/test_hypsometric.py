"""Hypsometric integral/curve vs float brute force."""

import numpy as np
import pytest

from rasters_ray.stages.terrain import hypsometric_arrays


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_hi_matches_float_definition(seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 251, (40, 40)).astype(np.float64)
    n, lo, hi, s, hn, hd, above = hypsometric_arrays(px)
    assert n == 1600
    mean = px.mean()
    assert hn / hd == pytest.approx((mean - lo) / (hi - lo), rel=1e-12)
    # curve: strictly-above fraction at each decile of relief
    for k in range(1, 10):
        thr = lo + k * (hi - lo) / 10.0
        want = int((10 * (px - lo) > k * (hi - lo)).sum())
        assert above[k - 1] == want
        # cross-multiplied compare equals the float-threshold compare
        # when thresholds are exactly representable
        assert above[k - 1] == int((px > thr).sum()) or (hi - lo) % 10 != 0


def test_flat_dem():
    px = np.full((5, 5), 7.0)
    n, lo, hi, s, hn, hd, above = hypsometric_arrays(px)
    assert (hn, hd) == (0, 0)
    assert above.sum() == 0


def test_nan_pixels_excluded():
    px = np.array([[1.0, np.nan], [3.0, 5.0]])
    n, lo, hi, s, hn, hd, above = hypsometric_arrays(px)
    assert n == 3 and lo == 1 and hi == 5 and s == 9
