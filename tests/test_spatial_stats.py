"""Moran's I / Geary's C with rook weights."""

import numpy as np
import pytest

from rasters_ray.stages.spatial_stats import geary_c, moran_i, moran_stats


def _brute(arr):
    x = np.asarray(arr, dtype=np.float64)
    h, w = x.shape
    mu = x.mean()
    num_m = num_g = wsum = 0.0
    for r in range(h):
        for c in range(w):
            for dr, dc in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                nr, nc = r + dr, c + dc
                if 0 <= nr < h and 0 <= nc < w:
                    wsum += 1
                    num_m += (x[r, c] - mu) * (x[nr, nc] - mu)
                    num_g += (x[r, c] - x[nr, nc]) ** 2
    den = ((x - mu) ** 2).sum()
    n = x.size
    return (n / wsum) * (num_m / den), ((n - 1) / (2 * wsum)) * (num_g / den)


def test_against_brute_force_random():
    rng = np.random.RandomState(6)
    for shape in ((5, 7), (8, 8)):
        x = rng.randint(0, 50, size=shape)
        bi, bc = _brute(x)
        assert moran_i(x) == pytest.approx(bi, rel=1e-12)
        assert geary_c(x) == pytest.approx(bc, rel=1e-12)


def test_checkerboard_and_gradient_signs():
    r, c = np.indices((8, 8))
    checker = ((r + c) % 2).astype(np.int64)
    # perfect negative autocorrelation: every rook pair differs
    assert moran_i(checker) == -1.0
    assert geary_c(checker) > 1.0
    ramp = (r * 8 + c).astype(np.int64)
    # strong positive autocorrelation
    assert moran_i(ramp) > 0.5
    assert geary_c(ramp) < 0.5


def test_sufficient_statistics_are_exact_ints():
    x = np.array([[1, 2], [3, 5]])
    st = moran_stats(x)
    n, s = 4, 11
    y = n * x - s
    a = 2 * (y[0, 0] * y[0, 1] + y[1, 0] * y[1, 1]
             + y[0, 0] * y[1, 0] + y[0, 1] * y[1, 1])
    assert st["a_cross"] == a
    assert st["b_num"] == (y ** 2).sum()
    assert st["w_sum"] == 8
    assert st["d_diff"] == 2 * ((1 + 4) + (4 + 9))


def test_validation():
    with pytest.raises(ValueError):
        moran_i(np.zeros((3, 3), dtype=np.int64))  # constant
    with pytest.raises(ValueError):
        moran_stats(np.array([[0.5, 1.0]]))  # non-integral
    with pytest.raises(ValueError):
        moran_stats(np.array([1, 2, 3]))  # 1D


def test_autocorr_stats_dataset(ray_session):
    import ray

    from rasters_ray import codec
    from rasters_ray.stages.spatial_stats import autocorr_stats

    r, c = np.indices((8, 8))
    px = ((r + c) % 2).astype(np.float64)
    ds = ray.data.from_items([{
        "image_id": "i0",
        "bytes": codec.encode(px, "npy"),
        "fmt": "npy",
    }])
    row = autocorr_stats(ds).take_all()[0]
    assert row["moran_i"] == -1.0
    assert row["w_sum"] == 2 * (8 * 7 * 2)


def test_getis_gi_star_bruteforce():
    import math

    import numpy as np

    from rasters_ray.stages.spatial_stats import getis_gi_star

    rng = np.random.default_rng(11)
    x = rng.integers(0, 30, (8, 10))
    gr, gc, zn, wi, gi = getis_gi_star(x)
    n = x.size
    S = int(x.sum())
    Q = int((x.astype(np.int64) ** 2).sum())
    for idx in range(len(gr)):
        r, c = int(gr[idx]), int(gc[idx])
        L = W = 0
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                r2, c2 = r + dr, c + dc
                if 0 <= r2 < 8 and 0 <= c2 < 10:
                    L += int(x[r2, c2])
                    W += 1
        assert zn[idx] == n * L - W * S
        assert wi[idx] == W
        exp = (float(n * L - W * S) * math.sqrt(float(n - 1))
               / math.sqrt(float((n * Q - S * S) * (n * W - W * W))))
        assert gi[idx] == exp
    # a hot cluster scores positive, a cold cluster negative
    y = np.zeros((9, 9), np.int64)
    y[4, 4] = y[4, 5] = y[5, 4] = 50
    _, _, _, _, g2 = getis_gi_star(y)
    g2 = g2.reshape(9, 9)
    assert g2[4, 4] > 1.0 and g2[0, 0] < 0.0


def test_getis_gi_star_errors():
    import numpy as np
    import pytest

    from rasters_ray.stages.spatial_stats import getis_gi_star

    with pytest.raises(ValueError):
        getis_gi_star(np.full((4, 4), 7))  # constant
    with pytest.raises(ValueError):
        getis_gi_star(np.array([[0.5, 1.0], [2.0, 3.0]]))  # non-integral


def test_local_moran_bruteforce():
    import numpy as np

    from rasters_ray.stages.spatial_stats import local_moran

    rng = np.random.default_rng(23)
    x = rng.integers(0, 40, (6, 8))
    gr, gc, ln, kc, li, qd = local_moran(x)
    n = x.size
    S = int(x.sum())
    Q = int((x.astype(np.int64) ** 2).sum())
    b = n * n * Q - n * S * S
    for idx in range(len(gr)):
        r, c = int(gr[idx]), int(gc[idx])
        L = K = 0
        for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            r2, c2 = r + dr, c + dc
            if 0 <= r2 < 6 and 0 <= c2 < 8:
                L += int(x[r2, c2])
                K += 1
        y = n * int(x[r, c]) - S
        R = n * L - K * S
        assert ln[idx] == y * R and kc[idx] == K
        assert li[idx] == float(n * y * R) / float(b)
    # hot cluster centre is HH (quadrant 1), its far corner LL (2)
    y2 = np.zeros((9, 9), np.int64)
    y2[4, 3:6] = 60
    _, _, _, _, _, q2 = local_moran(y2)
    q2 = q2.reshape(9, 9)
    assert q2[4, 4] == 1 and q2[0, 0] == 2


def test_local_moran_errors():
    import numpy as np
    import pytest

    from rasters_ray.stages.spatial_stats import local_moran

    with pytest.raises(ValueError):
        local_moran(np.full((3, 3), 2))


def test_semivariogram_bruteforce():
    import numpy as np

    from rasters_ray.stages.spatial_stats import semivariogram

    rng = np.random.default_rng(41)
    x = rng.integers(0, 50, (11, 13))
    lags, d2, npairs, g = semivariogram(x, 6)
    for i, h in enumerate(lags):
        s = n = 0
        for r in range(11):
            for c in range(13):
                if c + h < 13:
                    s += (int(x[r, c]) - int(x[r, c + h])) ** 2
                    n += 1
                if r + h < 11:
                    s += (int(x[r, c]) - int(x[r + h, c])) ** 2
                    n += 1
        assert d2[i] == s and npairs[i] == n
        assert g[i] == float(s) / float(2 * n)
    # pure gradient: gamma grows quadratically with lag
    grad = np.arange(10)[None, :] * np.ones((10, 1), int)
    _, _, _, gg = semivariogram(grad, 4)
    assert gg[1] > gg[0] and gg[3] > gg[2]


def test_semivariogram_errors():
    import numpy as np
    import pytest

    from rasters_ray.stages.spatial_stats import semivariogram

    with pytest.raises(ValueError):
        semivariogram(np.zeros((4, 4), int), max_lag=4)
    with pytest.raises(ValueError):
        semivariogram(np.array([[0.5, 1.5], [1.0, 2.0]]))


def test_trend_surface_recovers_plane_and_matches_lstsq():
    import numpy as np

    from rasters_ray.stages.spatial_stats import trend_surface

    h, w = 8, 11
    r = np.arange(h)[:, None]
    c = np.arange(w)[None, :]
    st = trend_surface(7 + 4 * c + 3 * r)
    assert st["slope_u"] == 2.0 and st["slope_v"] == 1.5  # doubled coords
    rng = np.random.default_rng(31)
    z = rng.integers(0, 80, (h, w))
    st2 = trend_surface(z)
    u = 2 * np.arange(w) - (w - 1)
    v = 2 * np.arange(h) - (h - 1)
    U, V = np.meshgrid(u, v)
    A = np.stack([np.ones(z.size), U.ravel(), V.ravel()], axis=1)
    coef, *_ = np.linalg.lstsq(A, z.ravel().astype(float), rcond=None)
    assert abs(st2["mean"] - coef[0]) < 1e-9
    assert abs(st2["slope_u"] - coef[1]) < 1e-12
    assert abs(st2["slope_v"] - coef[2]) < 1e-12


def test_trend_surface_errors():
    import numpy as np
    import pytest

    from rasters_ray.stages.spatial_stats import trend_surface

    with pytest.raises(ValueError):
        trend_surface(np.zeros((1, 2), int))
    with pytest.raises(ValueError):
        trend_surface(np.array([[0.5, 1.0], [1.5, 2.0]]))


def test_std_ellipse_ints_matches_numpy_moments():
    from rasters_ray.stages.spatial_stats import std_ellipse_ints

    rng = np.random.default_rng(5)
    pts = rng.integers(0, 100, (37, 2))
    n, sx, sy, sxx, syy, sxy = std_ellipse_ints(pts)
    x = pts[:, 0].astype(float)
    y = pts[:, 1].astype(float)
    assert n == 37 and sx == pts[:, 0].sum() and sy == pts[:, 1].sum()
    # n-scaled central moments: sxx / n^2 == biased variance
    assert abs(sxx / n**2 - x.var()) < 1e-9
    assert abs(syy / n**2 - y.var()) < 1e-9
    assert abs(sxy / n**2 - ((x - x.mean()) * (y - y.mean())).mean()) < 1e-9
    with pytest.raises(ValueError):
        std_ellipse_ints(np.array([1, 2, 3]))


def test_quadrat_vmr_ints_clustered_vs_uniform():
    from rasters_ray.stages.spatial_stats import quadrat_vmr_ints

    # perfectly uniform: one point per quadrat -> vmr_num = 0
    g = np.arange(4)
    uni = np.stack(np.meshgrid(g * 4, g * 4), axis=-1).reshape(-1, 2)
    n, Q, c2, mx, v = quadrat_vmr_ints(uni, 16, 4)
    assert (n, Q, c2, mx, v) == (16, 16, 16, 1, 0)
    # fully clustered: all 16 in one quadrat -> max positive
    clu = np.zeros((16, 2), dtype=np.int64)
    n, Q, c2, mx, v = quadrat_vmr_ints(clu, 16, 4)
    assert (c2, mx, v) == (256, 16, 16 * 256 - 256)
    with pytest.raises(ValueError):
        quadrat_vmr_ints(np.array([[16, 0]]), 16, 4)  # out of domain
    with pytest.raises(ValueError):
        quadrat_vmr_ints(uni, 15, 4)  # uneven split


def test_ripley_pair_counts_bruteforce():
    from rasters_ray.stages.spatial_stats import ripley_pair_counts

    rng = np.random.default_rng(9)
    pts = rng.integers(0, 16, (40, 2))
    r2s = [0, 2, 8, 50, 1000]
    got = ripley_pair_counts(pts, r2s)
    for r2, g in zip(r2s, got):
        want = sum(
            1
            for i in range(40)
            for j in range(i + 1, 40)
            if (pts[i, 0] - pts[j, 0]) ** 2 + (pts[i, 1] - pts[j, 1]) ** 2 <= r2
        )
        assert g == want
    # monotone in r2 and duplicates count at distance 0
    assert got == sorted(got)
    assert ripley_pair_counts(np.zeros((3, 2), dtype=int), [0]) == [3]
