"""MSE/PSNR/global SSIM and reclassify."""

import numpy as np
import pytest

from rasters_ray.stages.quality import (mse, psnr, reclassify, ssim_global)


def _ramp():
    return np.arange(256, dtype=float).reshape(16, 16)


def test_mse_psnr_closed_forms():
    a = _ramp()
    assert mse(a, a) == 0.0 and psnr(a, a) == float("inf")
    assert mse(a, a + 4) == 16.0
    assert abs(psnr(a, a + 4) - 10 * np.log10(255 ** 2 / 16)) < 1e-12


def test_ssim_identity_and_shift():
    a = _ramp()
    assert abs(ssim_global(a, a) - 1.0) < 1e-12
    # constant shift: variances and covariance equal, so the structure
    # term is exactly 1 and ssim reduces to the luminance term
    d = 10.0
    mu = 127.5
    c1 = (0.01 * 255.0) * (0.01 * 255.0)
    lum = (2 * mu * (mu + d) + c1) / (mu * mu + (mu + d) ** 2 + c1)
    assert ssim_global(a, a + d) == pytest.approx(lum, abs=1e-15)
    # uncorrelated noise lowers ssim
    rng = np.random.RandomState(0)
    assert ssim_global(a, a + rng.normal(0, 40, a.shape)) < 0.9


def test_ssim_validates_shape():
    with pytest.raises(ValueError):
        ssim_global(np.zeros((2, 2)), np.zeros((3, 3)))
    with pytest.raises(ValueError):
        mse(np.zeros((2, 2)), np.zeros((3, 3)))


def test_reclassify_bins_and_nan():
    a = np.array([[-5.0, 0.0, 4.9], [5.0, 99.0, np.nan]])
    out = reclassify(a, bins=[0.0, 5.0], classes=[10, 20, 30], nan_class=-7)
    assert np.array_equal(out, [[10, 20, 20], [30, 30, -7]])
    assert out.dtype == np.int64
    with pytest.raises(ValueError):
        reclassify(a, bins=[5.0, 0.0], classes=[1, 2, 3])
    with pytest.raises(ValueError):
        reclassify(a, bins=[0.0], classes=[1, 2, 3])


def test_pairwise_quality_dataset(ray_session):
    import ray

    from rasters_ray import codec
    from rasters_ray.stages.quality import pairwise_quality

    a = _ramp()
    ds = ray.data.from_items([{
        "pair_id": "p0",
        "bytes_ref": codec.encode(a, "npy"),
        "bytes_cmp": codec.encode(a + 4, "npy"),
        "fmt": "npy",
    }])
    row = pairwise_quality(ds).take_all()[0]
    assert row["mse"] == 16.0
    assert row["psnr"] == pytest.approx(10 * np.log10(255 ** 2 / 16))
    assert 0 < row["ssim"] < 1


def test_change_vector_bruteforce():
    import numpy as np

    from rasters_ray.stages.quality import change_vector

    rng = np.random.default_rng(13)
    a = rng.integers(0, 255, (3, 6, 7))
    b = rng.integers(0, 255, (3, 6, 7))
    mag2, sector = change_vector(a, b)
    for i in range(6):
        for j in range(7):
            d = b[:, i, j].astype(int) - a[:, i, j].astype(int)
            assert mag2[i, j] == int((d * d).sum())
            assert sector[i, j] == 2 * (d[0] < 0) + (d[1] < 0)


def test_change_vector_zero_is_nonneg_and_errors():
    import numpy as np
    import pytest

    from rasters_ray.stages.quality import change_vector

    a = np.zeros((2, 1, 1), int)
    b = np.zeros((2, 1, 1), int)
    mag2, sector = change_vector(a, b)
    assert mag2[0, 0] == 0 and sector[0, 0] == 0
    with pytest.raises(ValueError):
        change_vector(np.zeros((1, 2, 2)), np.zeros((1, 2, 2)))
    with pytest.raises(ValueError):
        change_vector(np.zeros((2, 2, 2)), np.zeros((2, 3, 2)))


def test_weighted_overlay_scores_and_nodata():
    from rasters_ray.stages.quality import weighted_overlay

    l1 = np.array([[0.0, 25.0], [85.0, np.nan]])
    l2 = np.array([[10.0, 55.0], [99.0, 40.0]])
    bins = [20.0, 40.0, 60.0, 80.0]
    cls = [1, 2, 3, 4, 5]
    w = weighted_overlay([l1, l2], [bins, bins], [cls, cls], [3, 2])
    # (0,0): 3*1 + 2*1 = 5 ; (0,1): 3*2 + 2*3 = 12
    # (1,0): 3*5 + 2*5 = 25 ; (1,1): NaN poisons -> -1
    assert w.tolist() == [[5, 12], [25, -1]]
    with pytest.raises(ValueError):
        weighted_overlay([l1], [bins, bins], [cls, cls], [1, 2])
    with pytest.raises(ValueError):
        weighted_overlay([], [], [], [])
    with pytest.raises(ValueError):
        weighted_overlay([l1, l2[:1]], [bins, bins], [cls, cls], [1, 1])
