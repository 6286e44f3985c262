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


# --- PNG real-world envelope (color types, filters, interlace) -----------

def _png_chunk(tag, payload):
    import struct, zlib
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _png_build(w, h, depth, color, body, extra=()):
    import struct, zlib
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0,
                       1 if isinstance(body, list) else 0)
    raw = b"".join(body) if isinstance(body, list) else body
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    for tag, payload in extra:
        out += _png_chunk(tag, payload)
    return out + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")


def _ref_unfilter(rows, stride, bpp):
    """Slow per-byte reference straight from the RFC 2083 pseudo-code."""
    out = []
    prev = bytearray(stride)
    for ft, line in rows:
        cur = bytearray(line)
        for i in range(stride):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 1:
                cur[i] = (cur[i] + a) & 0xFF
            elif ft == 2:
                cur[i] = (cur[i] + b) & 0xFF
            elif ft == 3:
                cur[i] = (cur[i] + ((a + b) >> 1)) & 0xFF
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        out.append(bytes(cur))
        prev = cur
    return out


def test_png_all_filters_vs_reference():
    """Every filter type on RGB rows: the vectorized undo must agree
    byte-for-byte with the RFC pseudo-code reference."""
    rng = np.random.default_rng(11)
    w, h, bpp = 17, 10, 3
    stride = w * bpp
    rows = [(r % 5, rng.integers(0, 256, stride, dtype=np.uint8).tobytes())
            for r in range(h)]
    body = b"".join(bytes([ft]) + ln for ft, ln in rows)
    png = _png_build(w, h, 8, 2, body)
    got = codec.decode(png, "png")
    exp = np.frombuffer(b"".join(_ref_unfilter(rows, stride, bpp)),
                        dtype=np.uint8).reshape(h, w, 3)
    assert np.array_equal(got, exp)


def test_png_rgba_gray_alpha_roundtrip():
    rng = np.random.default_rng(12)
    rgba = rng.integers(0, 256, (9, 13, 4), dtype=np.uint8)
    assert np.array_equal(codec.decode(codec.encode(rgba, "png"), "png"), rgba)
    ga16 = rng.integers(0, 65536, (5, 7, 2), dtype=np.uint16)
    assert np.array_equal(codec.decode(codec.encode(ga16, "png"), "png"), ga16)


def test_png_palette_and_trns():
    """Color type 3: indices expand through PLTE; tRNS adds the alpha
    column (web transparency)."""
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    plte = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  10, 20, 30])
    body = b"".join(b"\x00" + r.tobytes() for r in idx)
    png = _png_build(4, 2, 8, 3, body, extra=[(b"PLTE", plte)])
    got = codec.decode(png, "png")
    assert got.shape == (2, 4, 3) and tuple(got[0, 3]) == (10, 20, 30)
    png_t = _png_build(4, 2, 8, 3, body,
                       extra=[(b"PLTE", plte), (b"tRNS", bytes([0, 128]))])
    got = codec.decode(png_t, "png")
    assert got.shape == (2, 4, 4)
    assert got[0, 0, 3] == 0 and got[0, 1, 3] == 128 and got[0, 2, 3] == 255


def test_png_sub_byte_depths():
    """1/2/4-bit gray: MSB-first packing, raw sample values returned."""
    # 4-bit: w=5 -> 3 bytes/row, last nibble padding
    row = bytes([0x12, 0x34, 0x50])
    png = _png_build(5, 1, 4, 0, b"\x00" + row)
    assert codec.decode(png, "png").tolist() == [[1, 2, 3, 4, 5]]
    # 1-bit: w=10 -> 2 bytes/row
    png = _png_build(10, 1, 1, 0, b"\x00" + bytes([0b10110001, 0b01000000]))
    assert codec.decode(png, "png").tolist() == [[1, 0, 1, 1, 0, 0, 0, 1, 0, 1]]
    # 2-bit palette
    plte = bytes(range(12))
    png = _png_build(4, 1, 2, 3, b"\x00" + bytes([0b00011011]),
                     extra=[(b"PLTE", plte)])
    got = codec.decode(png, "png")
    assert np.array_equal(got, np.arange(12, dtype=np.uint8).reshape(1, 4, 3))


def test_png_adam7_interlace():
    """Adam7: a hand-built interlaced stream decodes to the same pixels
    as the plain encoding of the same image."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (11, 9, 3), dtype=np.uint8)
    passes = []
    lattices = ((0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
                (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2))
    for x0, dx, y0, dy in lattices:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        passes.append(b"".join(b"\x00" + r.tobytes() for r in sub))
    png = _png_build(9, 11, 8, 2, passes)
    assert np.array_equal(codec.decode(png, "png"), img)
    # 16-bit gray interlaced too
    img16 = rng.integers(0, 65536, (6, 5), dtype=np.uint16)
    passes = []
    for x0, dx, y0, dy in lattices:
        sub = img16[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        passes.append(b"".join(b"\x00" + r.astype(">u2").tobytes() for r in sub))
    png = _png_build(5, 6, 16, 0, passes)
    assert np.array_equal(codec.decode(png, "png"), img16)


def test_png_error_paths():
    with pytest.raises(ValueError, match="not a PNG"):
        codec.decode(b"JUNKJUNKJUNK", "png")
    body = b"\x00" + bytes(3)
    png = _png_build(1, 1, 8, 3, body)  # palette without PLTE
    with pytest.raises(ValueError, match="PLTE"):
        codec.decode(png, "png")
    png = _png_build(2, 2, 8, 0, b"\x00\x01")  # truncated stream
    with pytest.raises(ValueError, match="truncated"):
        codec.decode(png, "png")
