"""Baseline JPEG codec (pure numpy, public ITU-T T.81 spec)."""

import numpy as np
import pytest

from rasters_ray import codec
from rasters_ray.codec import jpeg_codec as J


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((np.sin(yy / 9.0) + np.cos(xx / 13.0)) * 60 + 128).clip(0, 255).astype(
        np.uint8
    )


def test_gray_roundtrip_psnr():
    g = _gradient(120, 200)
    data = J.encode(g, quality=90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    back = J.decode(data)
    assert back.shape == g.shape and back.dtype == np.uint8
    assert codec.psnr(g.astype(float), back.astype(float), peak=255) >= 40


def test_rgb_444_and_420():
    g = _gradient(96, 80)
    rgb = np.stack([g, np.roll(g, 7, 0), 255 - g], axis=-1)
    b444 = J.encode(rgb, quality=90)
    b420 = J.encode(rgb, quality=90, subsample=True)
    r444 = J.decode(b444)
    r420 = J.decode(b420)
    assert r444.shape == rgb.shape and r420.shape == rgb.shape
    assert codec.psnr(rgb.astype(float), r444.astype(float), peak=255) >= 40
    assert codec.psnr(rgb.astype(float), r420.astype(float), peak=255) >= 30
    assert len(b420) < len(b444)  # subsampling actually shrinks the stream


@pytest.mark.parametrize("shape", [(1, 1), (7, 9), (17, 33), (16, 16), (8, 8)])
def test_odd_sizes(shape):
    a = (np.arange(np.prod(shape)) % 251).astype(np.uint8).reshape(shape)
    back = J.decode(J.encode(a, quality=95))
    assert back.shape == shape
    assert codec.psnr(a.astype(float), back.astype(float), peak=255) >= 35


def test_quality_monotonic():
    g = _gradient(64, 64)
    sizes = [len(J.encode(g, quality=q)) for q in (10, 50, 95)]
    assert sizes[0] < sizes[1] < sizes[2]
    lo = J.decode(J.encode(g, quality=10)).astype(float)
    hi = J.decode(J.encode(g, quality=95)).astype(float)
    assert codec.psnr(g.astype(float), hi, peak=255) > codec.psnr(
        g.astype(float), lo, peak=255
    )


def test_codec_dispatch_and_errors():
    g = _gradient(24, 24)
    assert np.array_equal(
        J.decode(codec.encode(g, "jpg")), codec.decode(J.encode(g), "jpeg")
    )
    with pytest.raises(ValueError, match="uint8"):
        J.encode(g.astype(np.float32))
    with pytest.raises(ValueError, match="SOI"):
        J.decode(b"not a jpeg")
    # arithmetic-coded SOF9 raises clearly (progressive SOF2 is decoded
    # since round 5 — see test_progressive_* below)
    data = bytearray(J.encode(g))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="arithmetic"):
        J.decode(bytes(data))


def test_render_jpeg_stage():
    import pyarrow as pa

    from rasters_ray.stages.sampling import render_jpeg

    arr = (np.arange(48 * 40, dtype=np.float32).reshape(48, 40)) / 7.0
    arr[0, 0] = np.nan
    batch = pa.table(
        {
            "image_id": ["a"],
            "bytes": [codec.encode(arr, "npy")],
            "fmt": ["npy"],
        }
    )
    out = render_jpeg(batch)
    assert out.column("fmt").to_pylist() == ["jpg"]
    img = codec.decode(out.column("bytes")[0].as_py(), "jpg")
    assert img.shape == arr.shape and img.dtype == np.uint8
    # stretch maps finite min->~0 and max->~255; JPEG is lossy so allow slack
    assert img.max() > 240


def test_decode_stage_jpeg_native():
    import pyarrow as pa

    from rasters_ray.multimodal.decode import ImageDecodeStage

    g = _gradient(32, 32)
    batch = pa.table(
        {
            "image_id": ["x"],
            "bytes": [J.encode(g, quality=92)],
            "fmt": ["jpeg"],
        }
    )
    out = ImageDecodeStage(strict=True)(batch)  # strict: no fake fallback
    assert out.num_rows == 1


def test_restart_intervals():
    """DRI + RSTn markers: byte-aligned segments, DC predictor resets;
    decoded pixels identical to the unsegmented stream."""
    g = _gradient(120, 200)
    plain = J.decode(J.encode(g, quality=90))
    for ri in (1, 4, 17):
        b = J.encode(g, quality=90, restart_interval=ri)
        assert b.count(b"\xff\xdd") == 1  # DRI emitted
        n_mcu = (120 // 8 + (120 % 8 > 0)) * (200 // 8 + (200 % 8 > 0))
        n_rst = sum(b.count(bytes([0xFF, 0xD0 + i])) for i in range(8))
        assert n_rst == (n_mcu - 1) // ri
        np.testing.assert_array_equal(J.decode(b), plain)
    # interleaved color MCUs + subsampling
    rgb = np.stack([g, np.roll(g, 7, 0), 255 - g], axis=-1)
    for kw in (dict(restart_interval=3), dict(subsample=True, restart_interval=2)):
        ref = J.decode(J.encode(rgb, quality=90, **{k: v for k, v in kw.items()
                                                    if k != "restart_interval"}))
        np.testing.assert_array_equal(J.decode(J.encode(rgb, quality=90, **kw)), ref)


def test_gray_with_declared_subsampling():
    """T.81: a single-component scan is non-interleaved (MCU = 1 block)
    even when the SOF declares 2x2 sampling factors — some encoders do."""
    g = _gradient(24, 40)
    b = bytearray(J.encode(g, quality=90))
    i = b.find(b"\xff\xc0")
    hv_off = i + 4 + 6 + 1  # SOF0: marker(2) len(2) prec(1) h(2) w(2) nc(1) id(1) -> hv
    assert b[hv_off] == 0x11
    b[hv_off] = 0x22
    np.testing.assert_array_equal(J.decode(bytes(b)), J.decode(J.encode(g, quality=90)))


def test_progressive_bitexact_vs_baseline():
    """SOF2 progressive decode reproduces EXACTLY the pixels of the
    baseline decode at the same quality — both paths share the quantized
    coefficients, so any deviation is a scan-decoding bug. Covers gray /
    RGB 4:4:4 / RGB 4:2:0 (incl. non-MCU-aligned dims), DC+AC first and
    refinement scans, and cross-block EOB runs (flat regions)."""
    rng = np.random.default_rng(3)

    def scene(h, w, color=False):
        yy, xx = np.linspace(0, 1, h)[:, None], np.linspace(0, 1, w)[None, :]
        base = (120 + 80 * np.sin(4 * xx + 1) * np.cos(3 * yy) + 40 * yy
                + rng.normal(0, 6, (h, w)))
        g = np.clip(base, 0, 255).astype(np.uint8)
        if not color:
            return g
        return np.stack([g, np.clip(base * 0.8 + 20, 0, 255).astype(np.uint8),
                         np.clip(255 - base, 0, 255).astype(np.uint8)], -1)

    cases = [(scene(57, 83), False), (scene(64, 64, True), False),
             (scene(50, 70, True), True), (scene(24, 24, True), True),
             (scene(9, 13), False)]
    for img, sub in cases:
        base = J.decode(J.encode(img, quality=85, subsample=sub))
        prog = J.decode(J.encode(img, quality=85, subsample=sub,
                                 progressive=True))
        np.testing.assert_array_equal(prog, base)
    # PSNR sanity: progressive stream is a faithful lossy encode
    g = scene(64, 64)
    out = J.decode(J.encode(g, quality=90, progressive=True)).astype(np.float64)
    mse = np.mean((out - g.astype(np.float64)) ** 2)
    assert 10 * np.log10(255.0**2 / max(mse, 1e-9)) >= 30.0


def test_progressive_eob_runs_and_extremes():
    """Flat images force maximal EOB runs; extreme qualities exercise
    large and tiny coefficient magnitudes through every scan type."""
    flat = np.full((128, 96), 77, np.uint8)
    np.testing.assert_array_equal(
        J.decode(J.encode(flat, progressive=True)), J.decode(J.encode(flat)))
    img = np.full((80, 80), 100, np.uint8)
    img[40:48, 40:48] = 200
    np.testing.assert_array_equal(
        J.decode(J.encode(img, progressive=True)), J.decode(J.encode(img)))
    rng = np.random.default_rng(9)
    noisy = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    for q in (20, 50, 95):
        np.testing.assert_array_equal(
            J.decode(J.encode(noisy, quality=q, progressive=True)),
            J.decode(J.encode(noisy, quality=q)))
    rgb = rng.integers(0, 256, (48, 56, 3)).astype(np.uint8)
    for sub in (False, True):
        np.testing.assert_array_equal(
            J.decode(J.encode(rgb, quality=30, subsample=sub, progressive=True)),
            J.decode(J.encode(rgb, quality=30, subsample=sub)))
    with pytest.raises(ValueError, match="restart_interval"):
        J.encode(noisy, progressive=True, restart_interval=4)
