"""Categorical Expand vs brute-force neighborhood scan."""

import numpy as np
import pytest

from rasters_ray.stages.morphology import expand_classes


def _brute(cls, expand_set):
    h, w = cls.shape
    out = cls.copy()
    for r in range(h):
        for c in range(w):
            best = None
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    rr, cc = r + dr, c + dc
                    if 0 <= rr < h and 0 <= cc < w and cls[rr, cc] in expand_set:
                        v = cls[rr, cc]
                        best = v if best is None else min(best, v)
            if best is not None:
                out[r, c] = best
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_expand_matches_brute(seed):
    rng = np.random.default_rng(seed)
    cls = rng.integers(0, 7, (15, 12)).astype(np.int64)
    got = expand_classes(cls, {0, 2, 5})
    np.testing.assert_array_equal(got, _brute(cls, {0, 2, 5}))


def test_smallest_class_wins_collisions():
    cls = np.array([[2, 9, 5]], np.int64)
    got = expand_classes(cls, {2, 5})
    # middle cell touches both 2 and 5 -> 2 (smallest)
    np.testing.assert_array_equal(got, [[2, 2, 5]])


def test_no_expanding_class_keeps_original():
    cls = np.array([[3, 4], [4, 3]], np.int64)
    got = expand_classes(cls, {7})
    np.testing.assert_array_equal(got, cls)


def test_borders_have_fewer_neighbors():
    cls = np.array([[1, 9, 9, 9]], np.int64)
    got = expand_classes(cls, {1})
    np.testing.assert_array_equal(got, [[1, 1, 9, 9]])
