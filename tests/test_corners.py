"""Harris + FAST-9 corner detectors (stages/corners.py)."""

import numpy as np
import pytest

from rasters_ray.stages.corners import (
    fast9_corners,
    harris_corners,
    harris_images,
    harris_response,
)

_FAST_OFFS = [(-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3),
              (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
              (0, -3), (-1, -3), (-2, -2), (-3, -1)]


def test_harris_response_matches_bruteforce():
    rng = np.random.default_rng(0)
    p = rng.integers(0, 255, (12, 12)).astype(np.int64)
    R = harris_response(p)
    assert R.shape == (8, 8)
    for i in range(8):
        for j in range(8):
            r, c = i + 2, j + 2
            gx = np.zeros((3, 3), np.int64)
            gy = np.zeros((3, 3), np.int64)
            for a in range(3):
                for b in range(3):
                    rr, cc = r - 1 + a, c - 1 + b
                    w = p[rr - 1:rr + 2, cc - 1:cc + 2]
                    gx[a, b] = (w[0, 2] + 2 * w[1, 2] + w[2, 2]
                                - w[0, 0] - 2 * w[1, 0] - w[2, 0])
                    gy[a, b] = (w[2, 0] + 2 * w[2, 1] + w[2, 2]
                                - w[0, 0] - 2 * w[0, 1] - w[0, 2])
            sxx = int((gx * gx).sum())
            syy = int((gy * gy).sum())
            sxy = int((gx * gy).sum())
            assert R[i, j] == 25 * (sxx * syy - sxy * sxy) - (sxx + syy) ** 2


def test_harris_corners_strict_max():
    rng = np.random.default_rng(1)
    p = rng.integers(0, 255, (20, 20)).astype(np.int64)
    R = harris_response(p)
    r, c, v = harris_corners(p, threshold=0)
    got = set(zip(r.tolist(), c.tolist()))
    for i in range(R.shape[0]):
        for j in range(R.shape[1]):
            if R[i, j] <= 0:
                assert (i + 2, j + 2) not in got
                continue
            nb = [R[i + a, j + b]
                  for a in (-1, 0, 1) for b in (-1, 0, 1)
                  if (a, b) != (0, 0)
                  and 0 <= i + a < R.shape[0] and 0 <= j + b < R.shape[1]]
            assert ((i + 2, j + 2) in got) == all(R[i, j] > x for x in nb)
    # reported responses are the R values
    for rr, cc, vv in zip(r, c, v):
        assert vv == R[rr - 2, cc - 2]


def test_harris_small_raises():
    with pytest.raises(ValueError):
        harris_response(np.zeros((4, 10)))


def test_fast9_matches_bruteforce():
    rng = np.random.default_rng(2)
    p = rng.integers(0, 255, (20, 20)).astype(np.int64)
    t = 30
    expect = []
    for r in range(3, 17):
        for c in range(3, 17):
            vals = [p[r + dr, c + dc] for dr, dc in _FAST_OFFS]

            def longest(flags):
                if all(flags):
                    return 16
                best = cur = 0
                for x in flags + flags:
                    cur = cur + 1 if x else 0
                    best = max(best, cur)
                return min(best, 16)

            nb = longest([v > p[r, c] + t for v in vals])
            nd = longest([v < p[r, c] - t for v in vals])
            if nb >= 9 or nd >= 9:
                expect.append((r, c, nb, nd))
    fr, fc, nb, nd = fast9_corners(p, t)
    assert list(zip(fr.tolist(), fc.tolist(), nb.tolist(),
                    nd.tolist())) == expect


def test_fast9_full_ring_caps_at_16():
    p = np.full((9, 9), 100, np.int64)
    p[4, 4] = 0  # every circle pixel is brighter than center + t
    r, c, nb, nd = fast9_corners(p, t=20)
    assert (r.tolist(), c.tolist()) == ([4], [4])
    assert nb.tolist() == [16] and nd.tolist() == [0]


def test_harris_images_dataset(ray_session):
    import ray

    from rasters_ray import codec

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (16, 16)).astype(np.float32)
    ds = ray.data.from_items([{
        "image_id": "imgC",
        "bytes": codec.encode(img, "npy"),
        "fmt": "npy",
    }])
    rows = harris_images(ds, threshold=0).take_all()
    r, c, v = harris_corners(img.astype(np.int64), 0)
    assert len(rows) == r.size
    assert all(row["image_id"] == "imgC" for row in rows)
    got = {(row["r"], row["c"]): row["resp"] for row in rows}
    assert got == {(int(a), int(b)): int(x) for a, b, x in zip(r, c, v)}
