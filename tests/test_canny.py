"""Canny integer pipeline vs a loop-based reference."""

import numpy as np

from rasters_ray.stages.edges import _BIN_OFFS, _direction_bins, canny_edges
from rasters_ray.stages.features import _sobel


def _reference(a, tl2, th2):
    gx, gy = _sobel(a)
    m2 = gx * gx + gy * gy
    bins = _direction_bins(gx, gy)
    h, w = m2.shape

    def nb(rr, cc):
        return m2[rr, cc] if 0 <= rr < h and 0 <= cc < w else -1

    keep = {}
    for i in range(h):
        for j in range(w):
            dr, dc = _BIN_OFFS[int(bins[i, j])]
            if m2[i, j] > nb(i + dr, j + dc) and m2[i, j] >= nb(i - dr, j - dc):
                keep[(i, j)] = m2[i, j]
    weak = {k for k, v in keep.items() if v >= tl2}
    strong = {k for k, v in keep.items() if v >= th2}
    reach, frontier = set(strong), set(strong)
    while frontier:
        new = set()
        for (i, j) in frontier:
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    q = (i + di, j + dj)
                    if q in weak and q not in reach:
                        new.add(q)
        reach |= new
        frontier = new
    return {(i + 1, j + 1) for (i, j) in reach}, strong


def test_canny_matches_reference_random():
    rng = np.random.default_rng(12)
    a = rng.integers(0, 251, (36, 44)).astype(np.int64)
    r, c, m2, s = canny_edges(a, 150000, 400000)
    want, strong = _reference(a, 150000, 400000)
    assert set(zip(r.tolist(), c.tolist())) == want
    assert int(s.sum()) == len(strong)
    assert (m2 >= 150000).all()


def test_canny_step_edge_found():
    # vertical step: a clean strong vertical edge line survives NMS
    a = np.zeros((20, 20), dtype=np.int64)
    a[:, 10:] = 250
    r, c, m2, s = canny_edges(a, 100, 1000)
    assert len(r) > 0
    assert set(c.tolist()) <= {9, 10}  # edge localized at the step
    assert s.all()  # step gradient (1000^2) far above both thresholds


def test_canny_flat_image_empty():
    a = np.full((16, 16), 77, dtype=np.int64)
    r, c, m2, s = canny_edges(a, 10, 20)
    assert len(r) == 0


def test_direction_bins_axes():
    gx = np.array([10, 0, 10, -10], dtype=np.int64)
    gy = np.array([0, 10, 10, 10], dtype=np.int64)
    assert _direction_bins(gx, gy).tolist() == [0, 2, 1, 3]
