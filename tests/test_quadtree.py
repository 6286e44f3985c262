"""Quadtree leaf profile: area conservation and hand-built cases."""

import numpy as np
import pytest

from rasters_ray.stages.quadtree import quadtree_profile


def test_constant_image_one_root_leaf():
    z = np.full((64, 64), 9, dtype=np.int64)
    prof = dict(quadtree_profile(z, 64))
    assert prof[64] == 1
    assert all(prof[s] == 0 for s in (32, 16, 8, 4, 2, 1))


def test_checkerboard_all_single_pixels():
    r = np.arange(64).reshape(-1, 1)
    c = np.arange(64).reshape(1, -1)
    z = ((r + c) % 2).astype(np.int64)
    prof = dict(quadtree_profile(z, 64))
    assert prof[1] == 64 * 64
    assert sum(prof[s] for s in (64, 32, 16, 8, 4, 2)) == 0


def test_one_quadrant_flat():
    rng = np.random.default_rng(3)
    z = rng.integers(0, 2, (64, 64)).astype(np.int64)
    r = np.arange(64).reshape(-1, 1)
    c = np.arange(64).reshape(1, -1)
    z = np.where((r % 2 == 0) & (c % 2 == 0), z, 1 - z[::-1, ::-1])
    z[:32, :32] = 5  # force exactly one flat 32-quadrant
    prof = dict(quadtree_profile(z, 64))
    assert prof[64] == 0
    assert prof[32] >= 1
    # area conservation
    assert sum(s * s * n for s, n in prof.items()) == 64 * 64


def test_area_conservation_random():
    rng = np.random.default_rng(7)
    z = (rng.integers(0, 251, (80, 90)) // 64).astype(np.int64)
    prof = dict(quadtree_profile(z, 64))
    assert sum(s * s * n for s, n in prof.items()) == 64 * 64
    assert all(n >= 0 for n in prof.values())


def test_rejects_bad_size():
    z = np.zeros((64, 64), dtype=np.int64)
    with pytest.raises(ValueError, match="power of two"):
        quadtree_profile(z, 48)
    with pytest.raises(ValueError, match="smaller"):
        quadtree_profile(np.zeros((16, 16)), 64)
