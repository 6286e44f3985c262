"""Capped L1 distance transform: halo-tiled path vs whole-image brute force."""

import numpy as np
import pyarrow as pa

from rasters_ray import codec
from rasters_ray.stages.proximity import distance_transform_tiled


def _image_ds(px: np.ndarray):
    import ray.data as rd

    blob = codec.encode(px.astype(np.int32), "npy")
    return rd.from_arrow(
        pa.table(
            {
                "image_id": ["t0"],
                "bytes": pa.array([blob], pa.binary()),
                "fmt": ["npy"],
            }
        )
    )


def _brute(px: np.ndarray, seed_mod: int, cap: int, step: int):
    sr, sc = np.nonzero(px % seed_mod == 0)
    out = {}
    for r in range(0, px.shape[0], step):
        for c in range(0, px.shape[1], step):
            if len(sr):
                d = int(np.min(np.abs(r - sr) + np.abs(c - sc)))
            else:
                d = cap + 1
            out[(r, c)] = min(d, cap + 1)
    return out


def test_distance_transform_matches_bruteforce(ray_session):
    rng = np.random.default_rng(3)
    px = rng.integers(0, 251, (90, 70))
    got = (
        distance_transform_tiled(
            _image_ds(px), seed_mod=23, cap=9, tile=16, step=5
        )
        .to_pandas()
    )
    expect = _brute(px, 23, 9, 5)
    assert len(got) == len(expect)
    for row in got.itertuples():
        assert expect[(row.r, row.c)] == row.dist


def test_distance_transform_no_seeds_caps_everywhere(ray_session):
    px = np.ones((40, 40), np.int64)  # 1 % 7 != 0 everywhere
    got = distance_transform_tiled(
        _image_ds(px), seed_mod=7, cap=5, tile=16, step=8
    ).to_pandas()
    assert (got["dist"] == 6).all()


def test_point_density_bruteforce():
    import numpy as np

    from rasters_ray.stages.proximity import point_density

    rng = np.random.default_rng(5)
    pts = rng.integers(0, 12, (40, 2))
    for radius2 in (0, 2, 8, 13):
        d = point_density(pts, (12, 12), radius2)
        for r in range(12):
            for c in range(12):
                exp = sum(1 for p in pts
                          if (p[0] - r) ** 2 + (p[1] - c) ** 2 <= radius2)
                assert d[r, c] == exp


def test_point_density_edges_and_errors():
    import numpy as np
    import pytest

    from rasters_ray.stages.proximity import point_density

    # single corner point, radius^2 = 1: plus-shape clipped at edges
    d = point_density(np.array([[0, 0]]), (4, 4), 1)
    assert d[0, 0] == 1 and d[0, 1] == 1 and d[1, 0] == 1
    assert d[1, 1] == 0 and d.sum() == 3
    # radius^2 = 0: pure bincount
    d0 = point_density(np.array([[2, 3], [2, 3]]), (4, 4), 0)
    assert d0[2, 3] == 2 and d0.sum() == 2
    with pytest.raises(ValueError):
        point_density(np.array([[4, 0]]), (4, 4), 1)


def test_kernel_density_bruteforce():
    import numpy as np

    from rasters_ray.stages.proximity import kernel_density

    rng = np.random.default_rng(3)
    pts = rng.integers(0, 12, (40, 2))
    wts = rng.integers(1, 6, 40)
    r2 = 10
    got = kernel_density(pts, (12, 12), r2, wts)
    exp = np.zeros((12, 12), np.int64)
    for r in range(12):
        for c in range(12):
            for (pr, pc), w in zip(pts, wts):
                d2 = (r - pr) ** 2 + (c - pc) ** 2
                if d2 <= r2:
                    exp[r, c] += w * (r2 - d2) ** 2
    assert (got == exp).all()


def test_kernel_density_unweighted_and_errors():
    import numpy as np
    import pytest

    from rasters_ray.stages.proximity import kernel_density

    pts = np.array([[1, 1]])
    d = kernel_density(pts, (4, 4), 2)
    assert d[1, 1] == 4  # (2 - 0)^2
    assert d[0, 1] == 1  # (2 - 1)^2
    assert d[3, 3] == 0  # d2 = 8 > 2
    with pytest.raises(ValueError):
        kernel_density(np.array([[9, 0]]), (4, 4), 2)
    with pytest.raises(ValueError):
        kernel_density(pts, (4, 4), 2, weights=np.array([1, 2]))
    with pytest.raises(ValueError):
        kernel_density(pts, (4, 4), 2, weights=np.array([-1]))
