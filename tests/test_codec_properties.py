"""Property-based tests (hypothesis) for the round-5 pure-Python codecs:
LZ4 block format, blosc container, progressive JPEG, LAEA/CEA
projections. These hunt the edge cases example tests miss — arbitrary
byte strings, adversarial run lengths, random shapes/typesizes."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rasters_ray.codec import blosc_lite, lz4_lite


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_lz4_roundtrip_arbitrary_bytes(data):
    assert lz4_lite.decompress(lz4_lite.compress(data), max_out=len(data)) == data


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(1, 400)),
                min_size=1, max_size=20))
def test_lz4_roundtrip_runs(runs):
    """Adversarial run-length structure: long repeats force matches,
    including overlapping (offset < length) RLE-style copies."""
    data = b"".join(bytes([v]) * n for v, n in runs)
    assert lz4_lite.decompress(lz4_lite.compress(data), max_out=len(data)) == data


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=8192),
       st.sampled_from([1, 2, 4, 8]),
       st.booleans(),
       st.sampled_from([256, 1024, 1 << 18]))
def test_blosc_roundtrip(data, typesize, shuffle, blocksize):
    c = blosc_lite.compress(data, typesize=typesize, shuffle=shuffle,
                            blocksize=blocksize)
    assert blosc_lite.decompress(c) == data


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 64), st.integers(1, 64), st.integers(0, 2**32 - 1),
       st.sampled_from([25, 60, 90]))
def test_jpeg_progressive_equals_baseline(h, w, seed, quality):
    """For ANY image content and size, progressive decode must be
    bit-identical to the baseline decode at the same quality — they
    share the quantized coefficients."""
    from rasters_ray.codec import jpeg_codec as J

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    base = J.decode(J.encode(img, quality=quality))
    prog = J.decode(J.encode(img, quality=quality, progressive=True))
    np.testing.assert_array_equal(prog, base)


@settings(max_examples=50, deadline=None)
@given(st.floats(-179.9, 179.9), st.floats(-89.9, 89.9),
       st.sampled_from(["EPSG:3035", "EPSG:6931", "EPSG:6932", "EPSG:6933"]))
def test_equal_area_roundtrip_property(lon, lat, crs):
    from rasters_ray.proj.transform import transform_xy

    if crs == "EPSG:6931":
        lat = min(abs(lat) + 0.5, 89.5)  # polar aspects stay on their side
    if crs == "EPSG:6932":
        lat = max(-abs(lat) - 0.5, -89.5)
    x, y = transform_xy([lon], [lat], "EPSG:4326", crs)
    lo, la = transform_xy(x, y, crs, "EPSG:4326")
    assert abs(lo[0] - lon) < 1e-8
    assert abs(la[0] - lat) < 1e-7


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1),
       st.sampled_from(["<f4", "<i4", ">f8", "|u1"]))
def test_hdf5_chunked_roundtrip_property(rows, cols, seed, dts):
    from rasters_ray.sources import hdf5lite

    rng = np.random.default_rng(seed)
    a = (rng.integers(0, 250, (rows, cols)).astype(np.dtype(dts)))
    cy, cx = rng.integers(1, rows + 1), rng.integers(1, cols + 1)
    import io
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "x.h5")
        for sb in (0, 2):
            hdf5lite.write_hdf5(p, {"a": a}, chunks=(int(cy), int(cx)),
                                compression="deflate", superblock=sb)
            back = hdf5lite.read_hdf5(p)["/a"]
            np.testing.assert_array_equal(back, a.astype(a.dtype.newbyteorder("=")))


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1),
       st.booleans(), st.booleans(), st.booleans())
def test_hdf5_filter_stack_property(rows, cols, seed, shuf, fle, comp):
    """Any combination of shuffle/deflate/fletcher32 round-trips for
    random shapes, chunk grids and dtypes."""
    import os
    import tempfile

    from rasters_ray.sources import hdf5lite

    rng = np.random.default_rng(seed)
    dts = ["<f4", "<i4", ">f8", "<u2"][seed % 4]
    a = rng.integers(0, 250, (rows, cols)).astype(np.dtype(dts))
    cy, cx = int(rng.integers(1, rows + 1)), int(rng.integers(1, cols + 1))
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "x.h5")
        hdf5lite.write_hdf5(p, {"a": a}, chunks=(cy, cx),
                            compression="deflate" if comp else None,
                            shuffle=shuf, fletcher32=fle)
        back = hdf5lite.read_hdf5(p)["/a"]
        np.testing.assert_array_equal(back, a.astype(a.dtype.newbyteorder("=")))


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 50), st.integers(1, 50), st.integers(1, 5),
       st.integers(0, 2**32 - 1),
       st.sampled_from(["none", "lzw", "deflate", "packbits"]),
       st.sampled_from(["<", ">"]), st.integers(1, 2))
def test_geotiff_multiband_property(rows, cols, spp, seed, comp, bo, pred):
    """Chunky multi-band stripped GeoTIFFs round-trip exactly for any
    shape / sample count / compression / byte order / predictor."""
    import os
    import tempfile

    from rasters_ray.grids import GridSpec
    from rasters_ray.sources.geotiff import read_geotiff, write_geotiff

    rng = np.random.default_rng(seed)
    shape = (rows, cols) if spp == 1 else (rows, cols, spp)
    a = rng.integers(0, 255, shape, dtype=np.uint8)
    g = GridSpec(crs="EPSG:4326", x_origin=-120.0, y_origin=40.0,
                 cell_width=0.01, cell_height=-0.01, rows=rows, cols=cols)
    rps = int(rng.integers(1, rows + 1))
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "x.tif")
        write_geotiff(a, g, p, layout="strips", rows_per_strip=rps,
                      compression=comp, byte_order=bo, predictor=pred)
        np.testing.assert_array_equal(read_geotiff(p)[0][0], a)


@settings(max_examples=60, deadline=None)
@given(st.floats(-60.0, 60.0), st.floats(-55.0, 55.0),
       st.sampled_from(["EPSG:2193",
                        "+proj=tmerc +lat_0=40 +lon_0=-120 +k_0=0.9999 "
                        "+x_0=250000 +y_0=100000",
                        "+proj=geos +h=35786023 +lon_0=-137 +sweep=x",
                        "+proj=geos +h=35785831 +lon_0=0 +sweep=y",
                        "EPSG:4087"]))
def test_new_crs_roundtrip_property(dlon, dlat, crs):
    """tmerc/geos/eqc forward∘inverse == identity within 1e-8 deg over
    each CRS's valid region (lon offset applied about its center)."""
    from rasters_ray.proj.crs import parse_crs
    from rasters_ray.proj.transform import transform_xy

    info = parse_crs(crs)
    center = info.lon_0
    if info.kind == "tmerc":
        dlon = max(-20.0, min(20.0, dlon))  # series validity region
    # clamp inside [-179.9, 179.9]: the engine NaN-clips geographic
    # outputs beyond +/-180 (reference semantics), so an unwrapped
    # inverse result past the antimeridian is a legitimate NaN
    lon = max(-179.9, min(179.9, center + dlon))
    x, y = transform_xy([lon], [dlat], "EPSG:4326", crs)
    if np.isnan(x[0]):  # geos limb — only reachable at extreme offsets
        return
    lo, la = transform_xy(x, y, crs, "EPSG:4326")
    assert abs(lo[0] - lon) < 1e-8 and abs(la[0] - dlat) < 1e-8
