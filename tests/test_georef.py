"""GCP affine estimation: exact recovery, noise RMS, per-scene stage."""

import numpy as np
import pytest

from rasters_ray.stages.georef import estimate_affine


def _grid_pts():
    x, y = np.meshgrid([0.0, 10.0, 20.0], [0.0, 10.0, 20.0])
    return np.column_stack([x.ravel(), y.ravel()])


def test_exact_recovery_over_integer_affines():
    src = _grid_pts()
    for a, b, c, d, e, f in [(1, 0, 0, 0, 1, 0), (2, -1, 7, 3, 4, -6),
                             (-3, 2, 100, 1, -2, 50)]:
        dst = np.column_stack([a * src[:, 0] + b * src[:, 1] + c,
                               d * src[:, 0] + e * src[:, 1] + f])
        params, rms = estimate_affine(src, dst)
        assert np.allclose(params, (a, b, c, d, e, f), atol=1e-9)
        assert rms < 1e-9


def test_noise_rms_and_blue_mean():
    rng = np.random.RandomState(11)
    src = _grid_pts()
    truth = np.column_stack([2 * src[:, 0] + 5, -src[:, 1] + 9])
    noise = rng.normal(scale=0.1, size=truth.shape)
    params, rms = estimate_affine(src, truth + noise)
    assert abs(params[0] - 2) < 0.05 and abs(params[2] - 5) < 0.5
    assert 0.01 < rms < 0.3


def test_validation():
    with pytest.raises(ValueError):
        estimate_affine(np.zeros((2, 2)), np.zeros((2, 2)))
    col = np.column_stack([np.arange(5.0), np.arange(5.0) * 2])
    with pytest.raises(ValueError):
        estimate_affine(col, col)  # collinear
    with pytest.raises(ValueError):
        estimate_affine(np.zeros((4, 3)), np.zeros((4, 3)))


def test_fit_affine_per_scene_dataset(ray_session):
    import ray

    from rasters_ray.stages.georef import fit_affine_per_scene

    src = _grid_pts()
    rows = []
    for sid, (a, c) in (("s0", (2.0, 7.0)), ("s1", (-1.0, 3.0))):
        for x, y in src:
            rows.append({"scene_id": sid, "px": x, "py": y,
                         "mx": a * x + c, "my": y})
    out = {r["scene_id"]: r
           for r in fit_affine_per_scene(ray.data.from_items(rows)).take_all()}
    assert abs(out["s0"]["a"] - 2.0) < 1e-9 and abs(out["s0"]["c"] - 7.0) < 1e-9
    assert abs(out["s1"]["a"] + 1.0) < 1e-9 and out["s1"]["n_points"] == 9
    assert out["s0"]["rms"] < 1e-9
