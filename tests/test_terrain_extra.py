"""Hillshade: algebraic lambertian form vs explicit normal-dot-light."""

import numpy as np

from rasters_ray.stages.terrain import HS_COS_Z, lambertian_shade


def test_lambertian_equals_normal_dot_light():
    rng = np.random.default_rng(1)
    gx = rng.integers(-500, 500, 256).astype(np.int64)
    gy = rng.integers(-500, 500, 256).astype(np.int64)
    cw = ch = 0.01
    got = lambertian_shade(gx, gy, cw, ch)
    p = gx / (8 * cw)
    q = gy / (8 * ch)
    # unit surface normal and the stage's unit light vector
    norm = np.sqrt(1.0 + p * p + q * q)
    n = np.stack([-p / norm, -q / norm, 1.0 / norm])
    light = np.array([-0.5, 0.5, HS_COS_Z])  # |light| == 1, elevation 45°
    np.testing.assert_allclose(np.linalg.norm(light), 1.0, rtol=1e-15)
    ref = 255.0 * np.maximum(0.0, (n * light[:, None]).sum(axis=0))
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-10)


def test_trig_equivalence_slope_aspect_form():
    """The classic cos(z)cos(s) + sin(z)sin(s)cos(theta - aspect) form
    with theta = atan2(light_y, light_x) reproduces the algebraic shade."""
    rng = np.random.default_rng(2)
    gx = rng.integers(-300, 300, 128).astype(np.int64)
    gy = rng.integers(-300, 300, 128).astype(np.int64)
    cw = ch = 0.01
    p = gx / (8 * cw)
    q = gy / (8 * ch)
    slope = np.arctan(np.hypot(p, q))
    aspect = np.arctan2(-q, -p)
    theta = np.arctan2(0.5, -0.5)
    zen = np.pi / 4
    ref = 255.0 * np.maximum(
        0.0,
        np.cos(zen) * np.cos(slope)
        + np.sin(zen) * np.sin(slope) * np.cos(theta - aspect),
    )
    got = lambertian_shade(gx, gy, cw, ch)
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-8)


def test_shade_flat_surface_is_cosine_of_zenith():
    flat = lambertian_shade(np.zeros(3, np.int64), np.zeros(3, np.int64), 0.01, 0.01)
    np.testing.assert_allclose(flat, 255.0 * HS_COS_Z)
