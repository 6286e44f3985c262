"""Colormap LUTs + cmap-aware display render (public analytic formulas)."""

import numpy as np
import pytest

from rasters_ray import codec
from rasters_ray.stages.colormap import CMAPS, apply_cmap, lut


@pytest.mark.parametrize("name", CMAPS)
def test_lut_shape_and_range(name):
    t = lut(name)
    assert t.shape == (256, 3) and t.dtype == np.uint8


def test_gray_identity():
    t = lut("gray")
    assert np.array_equal(t[:, 0], np.arange(256))


def test_viridis_luminance_monotone():
    # perceptual ramp: rec601 luma should increase overall, low -> high
    t = lut("viridis").astype(np.float64)
    luma = 0.299 * t[:, 0] + 0.587 * t[:, 1] + 0.114 * t[:, 2]
    assert luma[0] < 40 and luma[-1] > 200
    assert np.all(np.diff(luma[::16]) > 0)


def test_turbo_endpoints_and_mid():
    t = lut("turbo").astype(np.int64)
    # starts dark, mid bright green, ends red-dominant (approximation)
    assert t[0].sum() < 200
    assert t[128, 1] > 200
    assert t[255, 0] > t[255, 1] and t[255, 0] > t[255, 2]


def test_apply_cmap_gather():
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    rgb = apply_cmap(img, "magma")
    assert rgb.shape == (16, 16, 3)
    assert np.array_equal(rgb[0, 0], lut("magma")[0])
    with pytest.raises(ValueError, match="uint8"):
        apply_cmap(img.astype(np.float32), "magma")
    with pytest.raises(ValueError, match="unknown colormap"):
        apply_cmap(img, "nope")


def test_rgb_png_roundtrip():
    rgb = apply_cmap(
        (np.arange(40 * 30) % 256).astype(np.uint8).reshape(40, 30), "turbo"
    )
    back = codec.decode(codec.encode(rgb, "png"), "png")
    assert np.array_equal(back, rgb)  # PNG lossless, color type 2


def test_render_with_cmap():
    import pyarrow as pa

    from rasters_ray.stages.sampling import make_render

    arr = np.linspace(0.0, 9.0, 50 * 40).astype(np.float32).reshape(50, 40)
    batch = pa.table(
        {"image_id": ["a"], "bytes": [codec.encode(arr, "npy")], "fmt": ["npy"]}
    )
    out = make_render("png", cmap="viridis")(batch)
    img = codec.decode(out.column("bytes")[0].as_py(), "png")
    assert img.shape == (50, 40, 3)
    # min pixel renders the viridis floor, max the ceiling
    assert np.array_equal(img[0, 0], lut("viridis")[0])
    assert np.array_equal(img[-1, -1], lut("viridis")[255])
    # jpeg output path too (lossy: check shape + rough hue)
    outj = make_render("jpg", cmap="turbo")(batch)
    imj = codec.decode(outj.column("bytes")[0].as_py(), "jpg")
    assert imj.shape == (50, 40, 3)
