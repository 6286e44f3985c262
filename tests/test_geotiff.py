"""COG writer: tiled GeoTIFF layout, overviews, georeferencing.

Parity target: Raster.to_COG (reference raster.py:1741-1791 via GDAL),
rebuilt from the public TIFF 6.0 + OGC GeoTIFF 1.1 specs.
"""

import os

import numpy as np
import pytest

from rasters_ray.grids import GridSpec
from rasters_ray.sources.geotiff import read_geotiff, write_cog


def _grid(rows, cols):
    return GridSpec(crs="EPSG:4326", x_origin=-120.0, y_origin=40.0,
                    cell_width=0.01, cell_height=-0.01, rows=rows, cols=cols)


def test_uint16_roundtrip_with_overviews(tmp_path):
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 4096, (700, 900), dtype=np.uint16)
    path = str(tmp_path / "a.tif")
    write_cog(arr, _grid(700, 900), path, tile=256)
    levels, meta = read_geotiff(path)
    np.testing.assert_array_equal(levels[0], arr)  # deflate is lossless
    # 700x900 -> 350x450 -> 175x225: two overviews (stop when <= one tile)
    assert [lv.shape for lv in levels] == [(700, 900), (350, 450), (175, 225)]
    # georeferencing
    assert meta["pixel_scale"][:2] == [0.01, 0.01]
    assert meta["tiepoint"][3:5] == [-120.0, 40.0]
    assert 4326 in meta["geo_keys"]


def test_cog_layout_ifds_before_tiles(tmp_path):
    arr = np.arange(512 * 512, dtype=np.uint16).reshape(512, 512) % 1000
    path = str(tmp_path / "b.tif")
    write_cog(arr, _grid(512, 512), path, tile=256)
    levels, meta = read_geotiff(path)
    # the COG property: every IFD sits before the first tile byte
    assert max(meta["ifd_offsets"]) < meta["first_tile_offset"]
    assert len(levels) == 2  # 512 -> 256 fits one tile


def test_float32_and_uncompressed(tmp_path):
    arr = np.linspace(0, 1, 300 * 200, dtype=np.float32).reshape(300, 200)
    path = str(tmp_path / "c.tif")
    write_cog(arr, _grid(300, 200), path, tile=128, compression="none")
    levels, _ = read_geotiff(path)
    np.testing.assert_array_equal(levels[0], arr)


def test_overview_is_block_mean(tmp_path):
    arr = np.zeros((512, 512), dtype=np.uint8)
    arr[:256, :256] = 100
    path = str(tmp_path / "d.tif")
    write_cog(arr, _grid(512, 512), path, tile=256)
    levels, _ = read_geotiff(path)
    ov = levels[1]
    assert ov[0, 0] == 100 and ov[255, 255] == 0


def test_rejects_4d(tmp_path):
    with pytest.raises(ValueError, match="2D band or a 3D"):
        write_cog(np.zeros((2, 8, 8, 3), np.uint8), _grid(8, 8),
                  str(tmp_path / "e.tif"))


def test_multiband_cog_roundtrip(tmp_path):
    """RGB / n-band COGs: chunky tiles at every pyramid level, windowed
    reads, per-channel block-mean overviews, JPEG RGB variant."""
    rng = np.random.default_rng(31)
    rgb = rng.integers(0, 255, (260, 300, 3), dtype=np.uint8)
    p = str(tmp_path / "cogrgb.tif")
    write_cog(rgb, _grid(260, 300), p, tile=128, compression="deflate")
    levels, meta = read_geotiff(p)
    assert [lv.shape for lv in levels] == [
        (260, 300, 3), (130, 150, 3), (65, 75, 3)]
    np.testing.assert_array_equal(levels[0], rgb)
    assert max(meta["ifd_offsets"]) < meta["first_tile_offset"]
    levels, _ = read_geotiff(p, window=(60, 70, 80, 90))
    np.testing.assert_array_equal(levels[0], rgb[60:140, 70:160])
    m2 = rng.integers(0, 60000, (260, 300, 2), dtype=np.uint16)
    p2 = str(tmp_path / "cog2.tif")
    write_cog(m2, _grid(260, 300), p2, tile=128, compression="lzw")
    np.testing.assert_array_equal(read_geotiff(p2)[0][0], m2)
    # lossy RGB JPEG COG
    x = np.linspace(0, 255, 300)
    y = np.linspace(0, 255, 260)
    gray = (np.add.outer(y, x) / 2).astype(np.uint8)
    smooth = np.stack([gray, 255 - gray, np.roll(gray, 5, axis=1)], axis=-1)
    pj = str(tmp_path / "cogrgbj.tif")
    write_cog(smooth, _grid(260, 300), pj, tile=128, compression="jpeg",
              jpeg_quality=95)
    got = read_geotiff(pj)[0][0]
    mse = np.mean((got.astype(np.float64) - smooth.astype(np.float64)) ** 2)
    assert 10 * np.log10(255 ** 2 / mse) > 30


# ---- round-5 envelope: strips, byte order, LZW/PackBits, predictor ----

from rasters_ray.sources.geotiff import (  # noqa: E402
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode,
    write_geotiff,
)


def test_lzw_packbits_codec_roundtrip():
    rng = np.random.default_rng(7)
    cases = [
        b"",
        b"x",
        bytes(rng.integers(0, 256, 4096, dtype=np.uint8)),   # incompressible
        bytes(rng.integers(0, 4, 30000, dtype=np.uint8)),    # deep LZW table
        b"\x00" * 10000,                                     # pure run
        (b"abcabd" * 3000),                                  # table resets
    ]
    for d in cases:
        assert _lzw_decode(_lzw_encode(d)) == d
        assert _packbits_decode(_packbits_encode(d)) == d


def test_stripped_roundtrip_all_compressions(tmp_path):
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 255, (143, 210), dtype=np.uint8)
    for comp in ("none", "deflate", "lzw", "packbits"):
        path = str(tmp_path / f"s_{comp}.tif")
        write_geotiff(arr, _grid(143, 210), path, layout="strips",
                      rows_per_strip=37, compression=comp)
        levels, meta = read_geotiff(path)
        np.testing.assert_array_equal(levels[0], arr)
        assert meta["layout"] == "strips"
    # georeferencing survives the strip path
    assert meta["pixel_scale"][:2] == [0.01, 0.01]
    assert meta["tiepoint"][3:5] == [-120.0, 40.0]


def test_big_endian_roundtrip_strips_and_tiles(tmp_path):
    rng = np.random.default_rng(13)
    arr = rng.integers(0, 60000, (90, 130), dtype=np.uint16)
    for layout in ("strips", "tiles"):
        path = str(tmp_path / f"be_{layout}.tif")
        write_geotiff(arr, _grid(90, 130), path, layout=layout, tile=64,
                      byte_order=">", compression="deflate", overviews=False)
        assert open(path, "rb").read(2) == b"MM"
        levels, meta = read_geotiff(path)
        np.testing.assert_array_equal(levels[0], arr)
        assert meta["byte_order"] == ">"


def test_float32_strips_roundtrip(tmp_path):
    arr = np.linspace(-5, 5, 80 * 33, dtype=np.float32).reshape(80, 33)
    path = str(tmp_path / "f.tif")
    write_geotiff(arr, _grid(80, 33), path, layout="strips",
                  rows_per_strip=13, compression="deflate")
    levels, _ = read_geotiff(path)
    np.testing.assert_array_equal(levels[0], arr)


def test_unknown_compression_raises_with_code(tmp_path):
    import struct

    arr = np.zeros((16, 16), dtype=np.uint8)
    path = str(tmp_path / "j.tif")
    write_geotiff(arr, _grid(16, 16), path, layout="strips", compression="none")
    b = bytearray(open(path, "rb").read())
    n = struct.unpack("<H", b[8:10])[0]
    for i in range(n):
        e = 10 + 12 * i
        if struct.unpack("<H", b[e : e + 2])[0] == 259:
            struct.pack_into("<H", b, e + 8, 34712)  # JPEG2000
    bad = str(tmp_path / "bad.tif")
    open(bad, "wb").write(bytes(b))
    with pytest.raises(NotImplementedError, match="34712"):
        read_geotiff(bad)


def test_predictor2_horizontal_differencing(tmp_path):
    """A file written with predictor=2 semantics decodes correctly: write
    the row-differenced pixels with the predictor tag patched in, expect
    the original image back (cumsum undo, modular per TIFF 6.0 §14)."""
    import struct

    rng = np.random.default_rng(17)
    arr = rng.integers(0, 255, (40, 51), dtype=np.uint8)
    diff = arr.astype(np.int16)
    diff[:, 1:] = diff[:, 1:] - diff[:, :-1]
    diff = diff.astype(np.uint8)  # modular differencing
    path = str(tmp_path / "p.tif")
    write_geotiff(diff, _grid(40, 51), path, layout="strips",
                  rows_per_strip=40, compression="none")
    b = bytearray(open(path, "rb").read())
    # append a predictor tag by rewriting compression-adjacent entry is
    # fiddly; instead patch SampleFormat (339, unused for uint8 default)
    # into Predictor (317) with value 2
    n = struct.unpack("<H", b[8:10])[0]
    for i in range(n):
        e = 10 + 12 * i
        if struct.unpack("<H", b[e : e + 2])[0] == 339:
            struct.pack_into("<H", b, e, 317)
            struct.pack_into("<H", b, e + 8, 2)
    open(path, "wb").write(bytes(b))
    levels, _ = read_geotiff(path)
    np.testing.assert_array_equal(levels[0], arr)


def test_predictor2_write_roundtrip(tmp_path):
    """write_geotiff(predictor=2) — the LZW+horizontal-differencing
    combination most wild integer GeoTIFFs use — round-trips exactly
    across integer dtypes, compressions and byte orders; float input
    raises."""
    import itertools

    rng = np.random.default_rng(23)
    p = str(tmp_path / "p2.tif")
    for dt, comp, bo in itertools.product(
            [np.uint8, np.int16, np.uint16, np.int32],
            ["lzw", "deflate", "none"], ["<", ">"]):
        info = np.iinfo(dt)
        a = rng.integers(info.min, int(info.max), (45, 67)).astype(dt)
        write_geotiff(a, _grid(45, 67), p, layout="strips",
                      rows_per_strip=13, compression=comp,
                      byte_order=bo, predictor=2)
        levels, meta = read_geotiff(p)
        np.testing.assert_array_equal(levels[0], a)
    with pytest.raises(ValueError, match="integer"):
        write_geotiff(rng.normal(size=(8, 8)).astype(np.float32),
                      _grid(8, 8), p, layout="strips", predictor=2)


def test_widened_sample_types_roundtrip(tmp_path):
    """int8/int16/int32/uint32/float64 samples (SampleFormat 2/1/3)
    round-trip through both the stripped and the COG writer — the
    envelope real DEMs (int16 SRTM) and analysis rasters (float64)
    need."""
    from rasters_ray.sources.geotiff import write_cog

    rng = np.random.default_rng(29)
    for dt in [np.int8, np.int16, np.int32, np.uint32, np.float64]:
        a = (rng.normal(size=(45, 67)) * 100).astype(dt)
        p = str(tmp_path / "wd.tif")
        write_geotiff(a, _grid(45, 67), p, layout="strips",
                      compression="deflate")
        np.testing.assert_array_equal(read_geotiff(p)[0][0], a)
        pc = str(tmp_path / "wd_cog.tif")
        write_cog(a, _grid(45, 67), pc, tile=32, compression="deflate",
                  overviews=False)
        np.testing.assert_array_equal(read_geotiff(pc)[0][0], a)


def test_open_raster_routes_stripped_and_big_endian(tmp_path):
    from rasters_ray.sources.open import open_raster

    rng = np.random.default_rng(19)
    arr = rng.integers(0, 255, (64, 96), dtype=np.uint8)
    p1 = str(tmp_path / "s.tif")
    write_geotiff(arr, _grid(64, 96), p1, layout="strips", compression="lzw")
    a1, g1 = open_raster(p1)
    np.testing.assert_array_equal(a1, arr)
    assert g1.crs == "EPSG:4326" and g1.rows == 64 and g1.cols == 96
    p2 = str(tmp_path / "be.tif")
    write_geotiff(arr, _grid(64, 96), p2, layout="tiles", tile=64,
                  byte_order=">", overviews=False)
    a2, g2 = open_raster(p2)
    np.testing.assert_array_equal(a2, arr)
    assert abs(g2.x_origin - (-120.0)) < 1e-9


def test_bigtiff_roundtrip_and_router(tmp_path):
    """BigTIFF (version 43, 8-byte offsets — the container real >4 GiB
    mosaics use): strips and tiles, either byte order, LONG8 offset
    tags; classic files keep reading; the magic router accepts II+/MM+."""
    from rasters_ray.sources.open import open_raster

    grid = GridSpec(crs="EPSG:4326", x_origin=-124.0, y_origin=44.0,
                    cell_width=0.01, cell_height=-0.01, rows=57, cols=83)
    a = (np.arange(57 * 83) % 251).astype(np.uint8).reshape(57, 83)
    for layout, bo, comp in [("strips", "<", "deflate"), ("strips", ">", "lzw"),
                             ("tiles", "<", "none"), ("tiles", ">", "deflate")]:
        p = str(tmp_path / f"bt_{layout}_{bo == '<'}_{comp}.tif")
        write_geotiff(a, grid, p, layout=layout, compression=comp,
                      byte_order=bo, rows_per_strip=13, tile=32,
                      overviews=(layout == "tiles"), bigtiff=True)
        assert open(p, "rb").read(4) in (b"II+\x00", b"MM\x00+")
        levels, meta = read_geotiff(p)
        assert meta["bigtiff"] and meta["byte_order"] == bo
        np.testing.assert_array_equal(levels[0], a)
        arr, g2 = open_raster(p)
        np.testing.assert_array_equal(arr, a)
        assert g2.x_origin == pytest.approx(-124.0)
        assert g2.cell_height == pytest.approx(-0.01)
    # float32 data exercises LONG8 offsets + SAMPLE_FORMAT together
    f = np.linspace(0, 1, 57 * 83, dtype=np.float32).reshape(57, 83)
    p = str(tmp_path / "bt_f32.tif")
    write_geotiff(f, grid, p, layout="strips", bigtiff=True)
    np.testing.assert_array_equal(read_geotiff(p)[0][0], f)
    # a malformed BigTIFF offset size raises clearly
    b = bytearray(open(p, "rb").read())
    b[4] = 4
    bad = tmp_path / "bad.tif"
    bad.write_bytes(bytes(b))
    with pytest.raises(ValueError, match="offset size"):
        read_geotiff(str(bad))


def test_float_predictor_3(tmp_path):
    """TIFF TechNote-3 floating-point predictor: byte-plane split (MSB
    first) + byte-wise horizontal differencing, per strip row; round-
    trips under every codec and byte order, and actually helps on
    smooth data."""
    grid = GridSpec(crs="EPSG:4326", x_origin=-124.0, y_origin=44.0,
                    cell_width=0.01, cell_height=-0.01, rows=57, cols=83)
    rng = np.random.default_rng(4)
    f = rng.normal(size=(57, 83)).astype(np.float32)
    for comp in ("deflate", "lzw", "none"):
        for bo in ("<", ">"):
            p = str(tmp_path / f"p3_{comp}_{bo == '<'}.tif")
            write_geotiff(f, grid, p, layout="strips", compression=comp,
                          byte_order=bo, rows_per_strip=13, predictor=3)
            levels, _meta = read_geotiff(p)
            np.testing.assert_array_equal(levels[0], f)
    sm = np.linspace(0, 1, 57 * 83, dtype=np.float32).reshape(57, 83)
    p3 = str(tmp_path / "sm3.tif")
    p1 = str(tmp_path / "sm1.tif")
    write_geotiff(sm, grid, p3, layout="strips", predictor=3)
    write_geotiff(sm, grid, p1, layout="strips", predictor=1)
    assert os.path.getsize(p3) < os.path.getsize(p1) / 2
    with pytest.raises(ValueError, match="floating-point"):
        write_geotiff(np.zeros((4, 4), np.uint8), grid, p1,
                      layout="strips", predictor=3)


def test_windowed_read_prunes_decode(tmp_path):
    """window= reads decode ONLY intersecting tiles/strips (counted via
    a _decompress probe), return exactly the window's pixels, clamp at
    the edges, and shift the GridSpec origin to the window corner."""
    import rasters_ray.sources.geotiff as G
    from rasters_ray.sources.open import open_raster

    grid = _grid(300, 400)
    a = (np.arange(300 * 400) % 251).astype(np.uint8).reshape(300, 400)
    for layout, big in [("tiles", False), ("strips", False), ("tiles", True)]:
        p = str(tmp_path / f"w_{layout}_{big}.tif")
        write_geotiff(a, grid, p, layout=layout, compression="deflate",
                      rows_per_strip=32, tile=64, overviews=False,
                      bigtiff=big)
        calls = [0]
        orig = G._decompress

        def counted(*args, _orig=orig, **kw):
            calls[0] += 1
            return _orig(*args, **kw)

        G._decompress = counted
        try:
            arr, g2 = open_raster(p, window=(100, 150, 50, 60))
        finally:
            G._decompress = orig
        np.testing.assert_array_equal(arr, a[100:150, 150:210])
        assert g2.x_origin == pytest.approx(grid.x_origin + 150 * grid.cell_width)
        assert g2.y_origin == pytest.approx(grid.y_origin + 100 * grid.cell_height)
        assert (g2.rows, g2.cols) == (50, 60)
        total = 35 if layout == "tiles" else 10
        assert calls[0] <= 4 < total
        # clamped at the image edge
        arr2, _ = open_raster(p, window=(280, 390, 100, 100))
        np.testing.assert_array_equal(arr2, a[280:300, 390:400])
    # non-TIFF window reads raise with the remediation
    with pytest.raises(NotImplementedError, match="window"):
        open_raster(__file__, window=(0, 0, 1, 1))


def test_multiband_chunky_roundtrip(tmp_path):
    """Chunky multi-band (PlanarConfiguration=1) strips — RGB aerial
    imagery and n-band stacks — round-trip exactly across compressions,
    byte orders and both predictors; windows decode only intersecting
    strips; planar-config-2 raises clearly."""
    import itertools

    rng = np.random.default_rng(7)
    p = str(tmp_path / "mb.tif")
    for comp, bo, pred in itertools.product(
            ["lzw", "deflate", "none"], ["<", ">"], [1, 2]):
        a = rng.integers(0, 255, (45, 67, 3), dtype=np.uint8)
        write_geotiff(a, _grid(45, 67), p, layout="strips",
                      rows_per_strip=13, compression=comp,
                      byte_order=bo, predictor=pred)
        levels, meta = read_geotiff(p)
        assert levels[0].shape == (45, 67, 3)
        np.testing.assert_array_equal(levels[0], a)
    # n-band with predictor 2; float32 bands with predictor 3
    for s, dt in [(4, np.uint16), (2, np.uint8)]:
        a = rng.integers(0, np.iinfo(dt).max // 2, (30, 41, s)).astype(dt)
        write_geotiff(a, _grid(30, 41), p, layout="strips",
                      compression="lzw", predictor=2)
        np.testing.assert_array_equal(read_geotiff(p)[0][0], a)
    a = rng.normal(size=(30, 41, 3)).astype(np.float32)
    write_geotiff(a, _grid(30, 41), p, layout="strips",
                  compression="deflate", predictor=3)
    np.testing.assert_array_equal(read_geotiff(p)[0][0], a)
    # windowed read pastes the right sub-block of every band
    a = rng.integers(0, 255, (300, 400, 3), dtype=np.uint8)
    write_geotiff(a, _grid(300, 400), p, layout="strips",
                  rows_per_strip=32, compression="deflate")
    levels, meta = read_geotiff(p, window=(100, 150, 50, 60))
    np.testing.assert_array_equal(levels[0], a[100:150, 150:210])


def _build_planar2(a, rps, path, comp=True):
    """Independently-constructed PlanarConfiguration=2 stripped TIFF:
    the strip sequence repeats per sample plane (TIFF 6.0)."""
    import struct
    import zlib as _zlib

    from rasters_ray.sources.geotiff import (
        _DOUBLE, _IFD, _LONG, _SHORT, TAG_BITS, TAG_COMPRESSION,
        TAG_GEO_KEYS, TAG_LENGTH, TAG_PHOTOMETRIC, TAG_PIXEL_SCALE,
        TAG_PLANAR, TAG_ROWS_PER_STRIP, TAG_SAMPLE_FORMAT, TAG_SAMPLES,
        TAG_STRIP_COUNTS, TAG_STRIP_OFFSETS, TAG_TIEPOINT, TAG_WIDTH)

    h, w, spp = a.shape
    nsp = (h + rps - 1) // rps
    blobs = []
    for pl in range(spp):
        for i in range(nsp):
            raw = np.ascontiguousarray(
                a[i * rps:min((i + 1) * rps, h), :, pl]).tobytes()
            blobs.append(_zlib.compress(raw, 6) if comp else raw)
    ifd = _IFD("<")
    ifd.add(TAG_WIDTH, _LONG, w)
    ifd.add(TAG_LENGTH, _LONG, h)
    ifd.add(TAG_BITS, _SHORT, [8] * spp)
    ifd.add(TAG_COMPRESSION, _SHORT, 8 if comp else 1)
    ifd.add(TAG_PHOTOMETRIC, _SHORT, 2 if spp == 3 else 1)
    ifd.add(TAG_SAMPLES, _SHORT, spp)
    ifd.add(TAG_PLANAR, _SHORT, 2)
    ifd.add(TAG_ROWS_PER_STRIP, _LONG, rps)
    ifd.add(TAG_STRIP_OFFSETS, _LONG, [0] * len(blobs))
    ifd.add(TAG_STRIP_COUNTS, _LONG, [len(b) for b in blobs])
    ifd.add(TAG_SAMPLE_FORMAT, _SHORT, [1] * spp)
    ifd.add(TAG_PIXEL_SCALE, _DOUBLE, [0.01, 0.01, 0.0])
    ifd.add(TAG_TIEPOINT, _DOUBLE, [0, 0, 0, -120.0, 40.0, 0])
    ifd.add(TAG_GEO_KEYS, _SHORT,
            [1, 1, 0, 3, 1024, 0, 1, 2, 1025, 0, 1, 1, 2048, 0, 1, 4326])
    t, o = ifd.sizes()
    start = 8 + t + o
    start += start % 2
    offs, pos = [], start
    for b in blobs:
        offs.append(pos)
        pos += len(b) + (len(b) % 2)
    for i, e in enumerate(ifd.entries):
        if e[0] == TAG_STRIP_OFFSETS:
            ifd.entries[i] = (e[0], e[1], e[2], offs)
    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<HI", 42, 8))
        f.write(ifd.render(8, 0))
        if f.tell() % 2:
            f.write(b"\x00")
        for b in blobs:
            f.write(b)
            if len(b) % 2:
                f.write(b"\x00")


def test_planar2_separate_planes(tmp_path):
    """PlanarConfiguration=2 (one strip sequence per sample plane)
    decodes to the same (h, w, samples) array as chunky, including
    windowed reads — proven against independently constructed bytes."""
    rng = np.random.default_rng(13)
    a = rng.integers(0, 255, (45, 67, 3), dtype=np.uint8)
    p = str(tmp_path / "p2p.tif")
    for comp in (True, False):
        _build_planar2(a, 13, p, comp)
        levels, meta = read_geotiff(p)
        assert levels[0].shape == (45, 67, 3)
        np.testing.assert_array_equal(levels[0], a)
    b = rng.integers(0, 255, (200, 150, 3), dtype=np.uint8)
    pw = str(tmp_path / "p2w.tif")
    _build_planar2(b, 32, pw, True)
    levels, meta = read_geotiff(pw, window=(50, 30, 60, 70))
    np.testing.assert_array_equal(levels[0], b[50:110, 30:100])


def test_crs_honest_geokeys(tmp_path):
    """Projected grids no longer get a silent 4326 stamp: EPSG-coded
    CRSs round-trip through ProjectedCSType, proj4-only CRSs through a
    user-defined PCSCitation in GeoAsciiParams, geographic grids stay
    GeographicType=4326."""
    from rasters_ray.proj.crs import parse_crs
    from rasters_ray.sources.open import open_raster

    rng = np.random.default_rng(2)
    a = rng.integers(0, 255, (40, 50), dtype=np.uint8)

    def grid_for(crs):
        return GridSpec(crs=crs, x_origin=500000.0, y_origin=4400000.0,
                        cell_width=30.0, cell_height=-30.0, rows=40, cols=50)

    for crs in ["EPSG:32610", "EPSG:2193", "EPSG:3035"]:
        p = str(tmp_path / "p.tif")
        write_geotiff(a, grid_for(crs), p, layout="strips",
                      compression="deflate")
        assert open_raster(p)[1].crs == crs
        pc = str(tmp_path / "pc.tif")
        write_cog(a, grid_for(crs), pc, tile=32, overviews=False)
        assert open_raster(pc)[1].crs == crs

    p4 = "+proj=aeqd +lat_0=40.5 +lon_0=-120.25"
    p = str(tmp_path / "aeqd.tif")
    write_geotiff(a, grid_for(p4), p, layout="strips")
    got = open_raster(p)[1].crs
    assert parse_crs(got) == parse_crs(p4)

    p = str(tmp_path / "geo.tif")
    write_geotiff(a, _grid(40, 50), p, layout="strips")
    assert open_raster(p)[1].crs == "EPSG:4326"


def test_jpeg_in_tiff(tmp_path):
    """New-style JPEG compression (code 7, TIFF TechNote 2): lossy
    write+read through the engine's own JPEG codec for gray and RGB
    strips, and a hand-built file with a shared JPEGTables tag whose
    abbreviated per-strip streams are spliced after the tables."""
    import struct

    from rasters_ray.codec import jpeg_codec
    from rasters_ray.sources.geotiff import (
        _IFD, _LONG, _SHORT, _UNDEF_T, TAG_BITS, TAG_COMPRESSION,
        TAG_JPEG_TABLES, TAG_LENGTH, TAG_PHOTOMETRIC, TAG_ROWS_PER_STRIP,
        TAG_SAMPLES, TAG_STRIP_COUNTS, TAG_STRIP_OFFSETS, TAG_WIDTH)

    def psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 10 * np.log10(255 ** 2 / mse) if mse else np.inf

    x = np.linspace(0, 255, 128)
    y = np.linspace(0, 255, 96)
    gray = (np.add.outer(y, x) / 2).astype(np.uint8)
    p = str(tmp_path / "j.tif")
    write_geotiff(gray, _grid(96, 128), p, layout="strips",
                  rows_per_strip=32, compression="jpeg")
    levels, meta = read_geotiff(p)
    assert meta["compression"] == 7
    assert psnr(levels[0], gray) > 35

    rgb = np.stack([gray, 255 - gray, np.roll(gray, 7, axis=1)], axis=-1)
    pc = str(tmp_path / "jc.tif")
    write_geotiff(rgb, _grid(96, 128), pc, layout="strips",
                  rows_per_strip=32, compression="jpeg", jpeg_quality=95)
    levels, _ = read_geotiff(pc)
    assert levels[0].shape == (96, 128, 3) and psnr(levels[0], rgb) > 30

    with pytest.raises(ValueError, match="uint8"):
        write_geotiff(gray.astype(np.uint16), _grid(96, 128), p,
                      layout="strips", compression="jpeg")

    # JPEGTables form: split a standalone stream into shared tables
    # (DQT/DHT) + abbreviated per-strip remainder
    def split_stream(s):
        tables, rest = bytearray(b"\xFF\xD8"), bytearray(b"\xFF\xD8")
        q = 2
        while q < len(s):
            m = s[q + 1]
            if m == 0xD9:
                break
            ln = struct.unpack(">H", s[q + 2:q + 4])[0]
            seg = s[q:q + 2 + ln]
            if m in (0xDB, 0xC4):
                tables += seg
            else:
                rest += seg
                if m == 0xDA:
                    rest += s[q + 2 + ln:]
                    break
            q += 2 + ln
        return bytes(tables) + b"\xFF\xD9", bytes(rest)

    strips, tables_stream = [], None
    for i in range(2):
        sub = np.ascontiguousarray(gray[i * 32:i * 32 + 32, :])
        tables_stream, rest = split_stream(jpeg_codec.encode(sub, quality=90))
        strips.append(rest)
    ifd = _IFD("<")
    ifd.add(TAG_WIDTH, _LONG, 128)
    ifd.add(TAG_LENGTH, _LONG, 64)
    ifd.add(TAG_BITS, _SHORT, 8)
    ifd.add(TAG_COMPRESSION, _SHORT, 7)
    ifd.add(TAG_PHOTOMETRIC, _SHORT, 1)
    ifd.add(TAG_SAMPLES, _SHORT, 1)
    ifd.add(TAG_ROWS_PER_STRIP, _LONG, 32)
    ifd.add(TAG_STRIP_OFFSETS, _LONG, [0, 0])
    ifd.add(TAG_STRIP_COUNTS, _LONG, [len(b) for b in strips])
    ifd.add(TAG_JPEG_TABLES, _UNDEF_T, list(tables_stream))
    t, o = ifd.sizes()
    start = 8 + t + o
    start += start % 2
    offs, pos = [], start
    for b in strips:
        offs.append(pos)
        pos += len(b) + (len(b) % 2)
    for i, e in enumerate(ifd.entries):
        if e[0] == TAG_STRIP_OFFSETS:
            ifd.entries[i] = (e[0], e[1], e[2], offs)
    pt = str(tmp_path / "jt.tif")
    with open(pt, "wb") as f:
        f.write(b"II" + struct.pack("<HI", 42, 8))
        f.write(ifd.render(8, 0))
        if f.tell() % 2:
            f.write(b"\x00")
        for b in strips:
            f.write(b)
            if len(b) % 2:
                f.write(b"\x00")
    levels, _ = read_geotiff(pt)
    assert psnr(levels[0], gray[:64]) > 35


def test_cog_jpeg_tiles(tmp_path):
    """compression='jpeg' on the COG writer — the classic aerial-ortho
    layout: lossy JPEG tiles at every pyramid level, COG front-matter
    property preserved, uint16 refused."""
    def psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 10 * np.log10(255 ** 2 / mse) if mse else np.inf

    x = np.linspace(0, 255, 300)
    y = np.linspace(0, 255, 260)
    gray = (np.add.outer(y, x) / 2).astype(np.uint8)
    p = str(tmp_path / "cogj.tif")
    write_cog(gray, _grid(260, 300), p, tile=128, compression="jpeg")
    levels, meta = read_geotiff(p)
    assert [lv.shape for lv in levels] == [(260, 300), (130, 150), (65, 75)]
    assert psnr(levels[0], gray) > 35
    assert max(meta["ifd_offsets"]) < meta["first_tile_offset"]
    with pytest.raises(ValueError, match="uint8"):
        write_cog(gray.astype(np.uint16), _grid(260, 300), p,
                  compression="jpeg")


def test_gdal_nodata_tag(tmp_path):
    """GDAL_NODATA (ASCII tag 42113): written by both writers, surfaced
    in meta, and open_raster masks float rasters' nodata to NaN (the
    engine's invalid convention); integer rasters keep raw values."""
    from rasters_ray.sources.open import open_raster

    a = np.arange(1200, dtype=np.float32).reshape(30, 40)
    a[0, :5] = -9999.0
    p = str(tmp_path / "nd.tif")
    write_geotiff(a, _grid(30, 40), p, layout="strips", nodata=-9999.0)
    levels, meta = read_geotiff(p)
    assert meta["nodata"] == -9999.0
    np.testing.assert_array_equal(levels[0], a)  # raw read keeps values
    arr, g = open_raster(p)
    assert np.isnan(arr[0, :5]).all() and arr[0, 5] == a[0, 5]
    pc = str(tmp_path / "ndc.tif")
    write_cog(a, _grid(30, 40), pc, tile=16, nodata=float("nan"),
              overviews=False)
    assert np.isnan(read_geotiff(pc)[1]["nodata"])
    # integer raster: tag surfaces, values untouched
    b = np.arange(1200, dtype=np.int16).reshape(30, 40)
    pi = str(tmp_path / "ndi.tif")
    write_geotiff(b, _grid(30, 40), pi, layout="strips", nodata=-32768)
    arr, _ = open_raster(pi)
    assert arr.dtype == np.int16
    np.testing.assert_array_equal(arr, b)
    p3 = str(tmp_path / "nd3.tif")
    write_geotiff(a, _grid(30, 40), p3, layout="strips")
    assert "nodata" not in read_geotiff(p3)[1]


def test_palette_tiff(tmp_path):
    """Photometric-3 palette images (land-cover classifications): the
    ColorMap tag round-trips 8-bit (scaled by 257 per TIFF 6.0) and
    16-bit tables; index pixels stay exact; float indices raise."""
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 7, (30, 40), dtype=np.uint8)
    pal = rng.integers(0, 255, (7, 3), dtype=np.uint8)
    p = str(tmp_path / "pal.tif")
    write_geotiff(idx, _grid(30, 40), p, layout="strips",
                  compression="lzw", palette=pal)
    levels, meta = read_geotiff(p)
    np.testing.assert_array_equal(levels[0], idx)
    assert meta["colormap"].shape == (256, 3)
    np.testing.assert_array_equal(meta["colormap"][:7] // 257, pal)
    idx16 = rng.integers(0, 1000, (30, 40), dtype=np.uint16)
    pal16 = rng.integers(0, 65535, (1000, 3), dtype=np.uint16)
    p16 = str(tmp_path / "pal16.tif")
    write_geotiff(idx16, _grid(30, 40), p16, layout="strips",
                  palette=pal16)
    levels, meta = read_geotiff(p16)
    np.testing.assert_array_equal(levels[0], idx16)
    np.testing.assert_array_equal(meta["colormap"][:1000], pal16)
    with pytest.raises(ValueError, match="palette"):
        write_geotiff(idx.astype(np.float32), _grid(30, 40), p,
                      layout="strips", palette=pal)
