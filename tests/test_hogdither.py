"""HOG octant classification and Bayer dithering vs brute force."""

import numpy as np
import pytest

from rasters_ray.stages.features import (
    BAYER4,
    _OCTANT_CONDS,
    bayer_dither_counts,
    gradient_octants,
    hog_cell_histogram,
)


def test_octants_partition_and_match_atan2():
    for gx in range(-6, 7):
        for gy in range(-6, 7):
            if gx == 0 and gy == 0:
                continue
            hits = [k for k, c in enumerate(_OCTANT_CONDS)
                    if c(np.int64(gx), np.int64(gy))]
            assert len(hits) == 1, (gx, gy, hits)
            ang = np.degrees(np.arctan2(gy, gx)) % 360
            assert hits[0] == int(ang // 45)


def test_hog_matches_bruteforce():
    rng = np.random.default_rng(8)
    a = rng.integers(0, 251, (40, 50)).astype(np.int64)
    cy, cx, sec, w, n = hog_cell_histogram(a, cell=10)
    want = {}
    for r in range(1, 39):
        for c in range(1, 49):
            gx = a[r, c + 1] - a[r, c - 1]
            gy = a[r + 1, c] - a[r - 1, c]
            if gx == 0 and gy == 0:
                continue
            ang = np.degrees(np.arctan2(gy, gx)) % 360
            k = (r // 10, c // 10, int(ang // 45))
            ww, nn = want.get(k, (0, 0))
            want[k] = (ww + abs(gx) + abs(gy), nn + 1)
    got = {(int(a_), int(b_), int(s_)): (int(w_), int(n_))
           for a_, b_, s_, w_, n_ in zip(cy, cx, sec, w, n)}
    assert got == want


def test_gradient_octants_zero_skipped():
    a = np.full((8, 8), 42, dtype=np.int64)
    _, _, oct_ = gradient_octants(a)
    assert (oct_ == -1).all()


def test_bayer_dither_counts():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (23, 31)).astype(np.int64)
    pr, pc, ns, npx = bayer_dither_counts(a)
    assert int(npx.sum()) == a.size
    for i in range(16):
        r, c = int(pr[i]), int(pc[i])
        m = a[r::4, c::4] > BAYER4[r, c] * 16 + 8
        assert ns[i] == m.sum() and npx[i] == m.size


@pytest.mark.parametrize("v,expect", [(8, 0), (9, 1)])
def test_bayer_threshold_edge(v, expect):
    # phase (0,0) has B=0 -> threshold 8: fires strictly above
    a = np.full((4, 4), v, dtype=np.int64)
    pr, pc, ns, _ = bayer_dither_counts(a)
    assert ns[0] == expect


def test_euler_quads_known_shapes():
    from rasters_ray.stages.features import euler_quads

    m = np.zeros((10, 10), dtype=np.int64)
    m[2:7, 2:7] = 1  # one solid square
    q1, q3, qd = euler_quads(m)
    assert (q1 - q3 + 2 * qd) // 4 == 1
    assert (q1 - q3 - 2 * qd) // 4 == 1
    m[4, 4] = 0  # punch a hole: E = 0
    q1, q3, qd = euler_quads(m)
    assert (q1 - q3 + 2 * qd) // 4 == 0
    m2 = np.zeros((10, 10), dtype=np.int64)
    m2[1:3, 1:3] = 1
    m2[6:9, 6:9] = 1  # two components
    q1, q3, qd = euler_quads(m2)
    assert (q1 - q3 + 2 * qd) // 4 == 2


def test_euler_diagonal_connectivity_difference():
    from rasters_ray.stages.features import euler_quads

    # two diagonally-touching pixels: 2 components 4-conn, 1 at 8-conn
    m = np.zeros((5, 5), dtype=np.int64)
    m[1, 1] = m[2, 2] = 1
    q1, q3, qd = euler_quads(m)
    assert (q1 - q3 + 2 * qd) // 4 == 2
    assert (q1 - q3 - 2 * qd) // 4 == 1
