"""Codec round-trips + PSNR invariant (BASELINE.json input_hint)."""

import numpy as np
import pytest

from rasters_ray import codec
from rasters_ray.sources import average_hash, make_fixture_images, make_oracle_images


def test_npy_round_trip_uint8():
    a = np.random.default_rng(0).integers(0, 256, (37, 53), dtype=np.uint8)
    assert np.array_equal(codec.decode(codec.encode(a, "npy"), "npy"), a)


def test_npy_round_trip_float_nan():
    a = np.random.default_rng(1).random((20, 20)).astype(np.float32)
    a[3, 4] = np.nan
    back = codec.decode(codec.encode(a, "npy"), "npy")
    np.testing.assert_array_equal(np.isnan(back), np.isnan(a))
    np.testing.assert_array_equal(back[~np.isnan(a)], a[~np.isnan(a)])


def test_png_round_trip_uint8():
    a = np.random.default_rng(2).integers(0, 256, (64, 64), dtype=np.uint8)
    assert np.array_equal(codec.decode(codec.encode(a, "png"), "png"), a)


def test_png_round_trip_uint16():
    a = np.random.default_rng(3).integers(0, 65536, (16, 24), dtype=np.uint16)
    assert np.array_equal(codec.decode(codec.encode(a, "png"), "png"), a)


def test_png_1x1():
    a = np.array([[7]], dtype=np.uint8)
    assert np.array_equal(codec.decode(codec.encode(a, "png"), "png"), a)


def test_qnt_lossy_psnr_over_40db():
    a = (np.random.default_rng(4).random((100, 100)) * 300.0 - 50.0).astype(np.float32)
    back = codec.decode(codec.encode(a, "qnt"), "qnt")
    assert codec.psnr(a, back, peak=float(np.abs(a).max())) >= 40.0


def test_qnt_nan_preserved():
    a = np.random.default_rng(5).random((10, 10)).astype(np.float32)
    a[0, 0] = np.nan
    back = codec.decode(codec.encode(a, "qnt"), "qnt")
    assert np.isnan(back[0, 0])
    assert np.isfinite(back[1:]).all()


def test_average_hash_deterministic_and_discriminative():
    a = np.random.default_rng(6).integers(0, 256, (64, 64), dtype=np.uint8)
    b = np.random.default_rng(7).integers(0, 256, (64, 64), dtype=np.uint8)
    assert average_hash(a) == average_hash(a.copy())
    assert average_hash(a) != average_hash(b)


def test_fixture_images_schema_and_dupes():
    t = make_fixture_images(np.arange(128))
    assert t.num_rows == 128
    assert t.column_names == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash", "grid"]
    # row 0 is the 1x1 degenerate image
    assert t["w"][0].as_py() == 1 and t["h"][0].as_py() == 1
    # i=100 duplicates i=99 pixels -> same phash
    ph = t["phash"].to_pylist()
    assert ph[100] == ph[99]
    # decode every row: bytes round-trip at declared size, caption intact
    for i in range(0, 128, 13):
        fmt = t["fmt"][i].as_py()
        arr = codec.decode(t["bytes"][i].as_py(), fmt)
        assert arr.shape == (t["h"][i].as_py(), t["w"][i].as_py())
        assert t["caption"][i].as_py().startswith(f"synthetic scene {i} at ")


def test_oracle_images_formula():
    t = make_oracle_images(np.arange(4))
    arr = codec.decode(t["bytes"][2].as_py(), "npy")
    # pixel(d,r,c) = (d*31 + r*7 + c*13) % 251
    assert arr[0, 0] == (2 * 31) % 251
    assert arr[3, 5] == (2 * 31 + 3 * 7 + 5 * 13) % 251
    g = t["grid"][2].as_py()
    assert g["x_origin"] == pytest.approx(-123.0)
    assert g["y_origin"] == pytest.approx(44.0)
