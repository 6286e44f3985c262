"""Zarr v2 store reader/writer (public spec, no zarr library)."""

import json
import os

import numpy as np
import pytest

from rasters_ray.sources.open import open_raster
from rasters_ray.sources.zarr_lite import read_zarr, write_zarr, zarr_raster


def _store(tmp_path, rows=37, cols=53, compress=True):
    lat = 44.0 - 0.01 * (np.arange(rows) + 0.5)
    lon = -124.0 + 0.01 * (np.arange(cols) + 0.5)
    temp = (np.arange(rows * cols) % 251).astype(np.float32).reshape(rows, cols)
    p = str(tmp_path / "store.zarr")
    write_zarr(p, {
        "lat": {"data": lat, "dims": ["lat"]},
        "lon": {"data": lon, "dims": ["lon"]},
        "temp": {"data": temp, "dims": ["lat", "lon"]},
    }, chunks=16, compress=compress)
    return p, temp, lat, lon


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip(tmp_path, compress):
    p, temp, lat, lon = _store(tmp_path, compress=compress)
    store = read_zarr(p)
    np.testing.assert_array_equal(store["temp"]["data"], temp)
    np.testing.assert_array_equal(store["lat"]["data"], lat)
    assert store["temp"]["dims"] == ["lat", "lon"]
    # ragged edge chunks (37 % 16, 53 % 16 != 0) round-trip exactly


def test_zarr_raster_and_open_router(tmp_path):
    p, temp, lat, lon = _store(tmp_path)
    arr, grid = zarr_raster(p)  # var auto-detected
    np.testing.assert_array_equal(arr, temp)
    assert grid.cell_width == pytest.approx(0.01)
    assert grid.cell_height == pytest.approx(-0.01)
    assert grid.x_origin == pytest.approx(-124.0)
    assert grid.y_origin == pytest.approx(44.0)
    # the magic router reads the directory store too
    arr2, grid2 = open_raster(p)
    np.testing.assert_array_equal(arr2, temp)
    assert (grid2.rows, grid2.cols) == (37, 53)


def test_ascending_latitude_flips_north_up(tmp_path):
    rows, cols = 5, 7
    lat = 40.0 + 0.5 * np.arange(rows)  # ascending (CF-legal)
    lon = 10.0 + 0.5 * np.arange(cols)
    v = np.arange(rows * cols, dtype=np.float64).reshape(rows, cols)
    p = str(tmp_path / "asc.zarr")
    write_zarr(p, {"lat": {"data": lat, "dims": ["lat"]},
                   "lon": {"data": lon, "dims": ["lon"]},
                   "v": {"data": v, "dims": ["lat", "lon"]}})
    arr, grid = zarr_raster(p, "v")
    assert grid.cell_height == pytest.approx(-0.5)
    assert grid.y_origin == pytest.approx(lat.max() + 0.25)
    np.testing.assert_array_equal(arr, v[::-1])  # north-up


def test_missing_chunk_is_fill_value(tmp_path):
    p, temp, *_ = _store(tmp_path)
    os.remove(os.path.join(p, "temp", "0.0"))
    store = read_zarr(p)
    assert (store["temp"]["data"][:16, :16] == 0).all()
    np.testing.assert_array_equal(store["temp"]["data"][16:, 16:], temp[16:, 16:])


def test_unsupported_codec_raises(tmp_path):
    p, *_ = _store(tmp_path)
    meta = json.load(open(os.path.join(p, "temp", ".zarray")))
    meta["compressor"] = {"id": "zstd"}
    json.dump(meta, open(os.path.join(p, "temp", ".zarray"), "w"))
    with pytest.raises(NotImplementedError, match="zstd"):
        read_zarr(p)
    meta["compressor"] = {"id": "blosc", "cname": "zstd"}
    json.dump(meta, open(os.path.join(p, "temp", ".zarray"), "w"))
    with pytest.raises(NotImplementedError, match="zstd"):
        read_zarr(p)
    with pytest.raises(ValueError, match="not a zarr"):
        open_raster(str(tmp_path))  # plain directory, no .zgroup


def test_write_zarr_tiles_distributed(ray_session, tmp_path):
    """Distributed chunk sink: workers write independent iy.ix chunk
    files; the reassembled array places every tile at its quadtree cell."""
    import pyarrow as pa
    import ray.data as rd

    from rasters_ray import codec
    from rasters_ray.grids.cellkey import decode as cell_decode
    from rasters_ray.sources.zarr_lite import read_zarr, write_zarr_tiles

    level, ts = 3, 8
    cells = [(1, 2), (2, 2), (5, 7), (0, 0)]
    rows = {"cell_key": [], "bytes": [], "fmt": [], "th": [], "tw": []}
    tiles_px = {}
    for ix, iy in cells:
        px = np.full((ts, ts), float(ix * 10 + iy), np.float32)
        tiles_px[(ix, iy)] = px
        cid = (level << 56) | (iy << 28) | ix  # cellkey.py packing
        assert tuple(int(v) for v in cell_decode(cid)) == (level, ix, iy)
        rows["cell_key"].append(cid)
        rows["bytes"].append(codec.encode(px, "npy"))
        rows["fmt"].append("npy")
        rows["th"].append(ts)
        rows["tw"].append(ts)
    tab = pa.table({
        "cell_key": pa.array(rows["cell_key"], pa.int64()),
        "bytes": pa.array(rows["bytes"], pa.binary()),
        "fmt": pa.array(rows["fmt"], pa.string()),
        "th": pa.array(rows["th"], pa.int32()),
        "tw": pa.array(rows["tw"], pa.int32()),
    })
    p = str(tmp_path / "tiles.zarr")
    n = write_zarr_tiles(rd.from_arrow(tab).repartition(3), p, level, ts)
    assert n == 4
    store = read_zarr(p)
    full = store["tiles"]["data"]
    assert full.shape == ((1 << level) * ts, (1 << level) * ts)
    for (ix, iy), px in tiles_px.items():
        np.testing.assert_array_equal(
            full[iy * ts : (iy + 1) * ts, ix * ts : (ix + 1) * ts], px)
    # untouched cells are fill
    assert (full[7 * ts :, 0 : ts] == 0.0).all()


def test_read_zarr_chunk_sparse(tmp_path):
    """Chunk-wise reads never materialize the logical array (the sparse
    quadtree sink case); missing chunks return fill blocks."""
    from rasters_ray.sources.zarr_lite import list_zarr_chunks, read_zarr_chunk

    p, temp, *_ = _store(tmp_path)
    idxs = list_zarr_chunks(p, "temp")
    assert (0, 0) in idxs and len(idxs) == 12  # ceil(37/16)*ceil(53/16)
    b = read_zarr_chunk(p, "temp", (0, 0))
    np.testing.assert_array_equal(b, temp[:16, :16])
    missing = read_zarr_chunk(p, "temp", (99, 99))
    assert missing.shape == (16, 16) and (missing == 0).all()


def test_tiles_sink_overwrite_and_level_guard(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from rasters_ray import codec
    from rasters_ray.sources.zarr_lite import list_zarr_chunks, write_zarr_tiles

    def tiles_tab(level, cells, ts=8):
        rows = {"cell_key": [], "bytes": [], "fmt": [], "th": [], "tw": []}
        for ix, iy in cells:
            rows["cell_key"].append((level << 56) | (iy << 28) | ix)
            rows["bytes"].append(codec.encode(np.ones((ts, ts), np.float32), "npy"))
            rows["fmt"].append("npy")
            rows["th"].append(ts)
            rows["tw"].append(ts)
        return pa.table({"cell_key": pa.array(rows["cell_key"], pa.int64()),
                         "bytes": pa.array(rows["bytes"], pa.binary()),
                         "fmt": pa.array(rows["fmt"], pa.string()),
                         "th": pa.array(rows["th"], pa.int32()),
                         "tw": pa.array(rows["tw"], pa.int32())})

    p = str(tmp_path / "s.zarr")
    write_zarr_tiles(tiles_tab(3, [(1, 1), (2, 2)]), p, 3, 8)
    assert list_zarr_chunks(p, "tiles") == [(1, 1), (2, 2)]
    # overwrite clears stale chunks from the previous layout
    write_zarr_tiles(tiles_tab(3, [(0, 0)]), p, 3, 8)
    assert list_zarr_chunks(p, "tiles") == [(0, 0)]
    # a .tmp leftover from a killed writer never breaks enumeration
    open(os.path.join(p, "tiles", "5.5.1234.tmp"), "wb").write(b"x")
    assert list_zarr_chunks(p, "tiles") == [(0, 0)]
    # level mismatch raises instead of silently dropping tiles
    with pytest.raises(Exception, match="level"):
        write_zarr_tiles(
            rd.from_arrow(tiles_tab(8, [(1, 1)])), p, 3, 8
        )


def test_write_zarr_preserves_attrs(tmp_path):
    from rasters_ray.sources.zarr_lite import read_zarr, write_zarr, zarr_raster

    p = str(tmp_path / "c.zarr")
    write_zarr(p, {
        "y": {"data": np.arange(4.0)[::-1], "dims": ["y"]},
        "x": {"data": np.arange(3.0), "dims": ["x"]},
        "v": {"data": np.ones((4, 3), np.float32), "dims": ["y", "x"],
              "attrs": {"crs": "EPSG:32610"}},
    })
    assert read_zarr(p)["v"]["attrs"]["crs"] == "EPSG:32610"
    _, grid = zarr_raster(p, "v")
    assert grid.crs == "EPSG:32610"  # round trip keeps the CRS


def test_zarr_raster_bare_store_unit_grid(tmp_path):
    from rasters_ray.sources.zarr_lite import write_zarr, zarr_raster

    p = str(tmp_path / "b.zarr")
    write_zarr(p, {"v": {"data": np.ones((5, 6), np.float32)}})
    arr, grid = zarr_raster(p, "v")  # no coordinate arrays: unit grid
    assert (grid.rows, grid.cols, grid.cell_width) == (5, 6, 1.0)


def test_sparse_store_guard(tmp_path):
    """read_zarr refuses to materialize a huge-but-sparse logical array
    (the write_zarr_tiles planetary-quadtree shape) and points at the
    chunk-wise path; real-extent stores still open."""
    import zlib

    adir = tmp_path / "sparse.zarr"
    adir.mkdir()
    n = 32768  # 4 GiB logical f4 array, 1 of 65536 chunks present
    json.dump(
        {"zarr_format": 2, "shape": [n, n], "chunks": [128, 128],
         "dtype": "<f4", "compressor": {"id": "zlib", "level": 6},
         "fill_value": 0.0, "filters": None, "order": "C"},
        open(adir / ".zarray", "w"),
    )
    block = np.ones((128, 128), dtype="<f4")
    (adir / "65.39").write_bytes(zlib.compress(block.tobytes(), 6))
    with pytest.raises(ValueError, match="read_zarr_chunk"):
        read_zarr(str(adir))
    with pytest.raises(ValueError, match="read_zarr_chunk"):
        zarr_raster(str(adir))
    # dense real-extent stores (and small sparse ones) open untouched
    p, temp, *_ = _store(tmp_path)
    np.testing.assert_array_equal(read_zarr(p)["temp"]["data"], temp)


def test_blosc_v2_roundtrip_and_real_layout(tmp_path):
    """Blosc-compressed v2 stores: our blosc(zlib+shuffle) writer
    round-trips, and a hand-built chunk in the REAL zarr-python default
    layout (blosc + lz4 + byte shuffle + per-typesize split streams)
    reads back exactly."""
    import struct

    from rasters_ray.codec import blosc_lite, lz4_lite

    lat = 44.0 - 0.01 * (np.arange(30) + 0.5)
    lon = -124.0 + 0.01 * (np.arange(40) + 0.5)
    temp = np.sin(np.arange(1200, dtype="<f4")).reshape(30, 40)
    p = str(tmp_path / "b.zarr")
    write_zarr(p, {
        "lat": {"data": lat, "dims": ["lat"]},
        "lon": {"data": lon, "dims": ["lon"]},
        "temp": {"data": temp, "dims": ["lat", "lon"]},
    }, chunks=16, compressor="blosc")
    back = read_zarr(p)
    np.testing.assert_array_equal(back["temp"]["data"], temp)
    arr, grid = zarr_raster(p)
    np.testing.assert_array_equal(arr, temp)
    assert grid.cell_width == pytest.approx(0.01)

    # hand-build one chunk exactly as c-blosc/zarr-python does:
    # lz4 codec, byte shuffle, block split into typesize streams
    adir = tmp_path / "raw.zarr"
    adir.mkdir()
    data = np.cos(np.arange(64 * 64, dtype="<f4")).reshape(64, 64)
    raw = blosc_lite._shuffle(data.tobytes(), 4)
    part = len(raw) // 4
    streams = b""
    for s in range(4):
        seg = raw[s * part:(s + 1) * part]
        comp = lz4_lite.compress(seg)
        if len(comp) >= len(seg):
            comp = seg
        streams += struct.pack("<i", len(comp)) + comp
    hl = 16 + 4
    chunk = struct.pack("<BBBBIII", 2, 1, (1 << 5) | 1, 4, len(raw),
                        len(raw), hl + len(streams))
    chunk += struct.pack("<I", hl) + streams
    json.dump({"zarr_format": 2, "shape": [64, 64], "chunks": [64, 64],
               "dtype": "<f4", "fill_value": 0, "filters": None,
               "order": "C",
               "compressor": {"id": "blosc", "cname": "lz4", "clevel": 5,
                              "shuffle": 1, "blocksize": 0}},
              open(adir / ".zarray", "w"))
    (adir / "0.0").write_bytes(chunk)
    out = read_zarr(str(adir))
    np.testing.assert_array_equal(out["raw.zarr"]["data"], data)


def test_zarr_v3_roundtrip(tmp_path):
    """Zarr v3 stores: zarr.json metadata, c/i/j chunk keys, gzip and
    blosc codec chains, dimension_names; zarr_raster and the chunk-wise
    API work unchanged."""
    from rasters_ray.sources.zarr_lite import list_zarr_chunks, read_zarr_chunk

    lat = 44.0 - 0.01 * (np.arange(37) + 0.5)
    lon = -124.0 + 0.01 * (np.arange(53) + 0.5)
    temp = (np.arange(37 * 53) % 251).astype(np.float32).reshape(37, 53)
    for compressor in ("zlib", "blosc"):  # v3: zlib -> gzip codec
        p = str(tmp_path / f"v3_{compressor}.zarr")
        write_zarr(p, {
            "lat": {"data": lat, "dims": ["lat"]},
            "lon": {"data": lon, "dims": ["lon"]},
            "temp": {"data": temp, "dims": ["lat", "lon"],
                     "attrs": {"units": "K"}},
        }, chunks=16, zarr_format=3, compressor=compressor)
        assert json.load(open(os.path.join(p, "zarr.json")))["node_type"] == "group"
        store = read_zarr(p)
        np.testing.assert_array_equal(store["temp"]["data"], temp)
        assert store["temp"]["dims"] == ["lat", "lon"]
        assert store["temp"]["attrs"]["units"] == "K"
        arr, grid = zarr_raster(p)
        np.testing.assert_array_equal(arr, temp)
        assert (grid.rows, grid.cols) == (37, 53)
        # chunk files live under c/ with / separator
        assert os.path.exists(os.path.join(p, "temp", "c", "0", "0"))
        idxs = list_zarr_chunks(p, "temp")
        assert (0, 0) in idxs and len(idxs) == 12
        np.testing.assert_array_equal(
            read_zarr_chunk(p, "temp", (0, 0)), temp[:16, :16])
    # uncompressed v3 + big-endian dtype
    p = str(tmp_path / "v3_raw.zarr")
    write_zarr(p, {"t": {"data": temp.astype(">f8"), "dims": ["y", "x"]}},
               chunks=32, zarr_format=3, compress=False)
    np.testing.assert_array_equal(read_zarr(p)["t"]["data"], temp.astype(">f8"))
    # NESTED sharding (a shard inside a shard) raises clearly; plain
    # sharded reads are covered by test_zarr_v3_sharding_read
    meta = json.load(open(os.path.join(p, "t", "zarr.json")))
    inner = {"name": "sharding_indexed", "configuration": {
        "chunk_shape": [8, 8],
        "codecs": [{"name": "bytes"}]}}
    meta["codecs"] = [{"name": "sharding_indexed", "configuration": {
        "chunk_shape": [16, 16], "codecs": [inner]}}]
    json.dump(meta, open(os.path.join(p, "t", "zarr.json"), "w"))
    with pytest.raises(NotImplementedError, match="nested"):
        read_zarr(p)


def test_v2_nested_dimension_separator(tmp_path):
    """Zarr v2 with dimension_separator '/' (nested chunk dirs): reads,
    chunk enumeration and the raster route all work."""
    import zlib

    from rasters_ray.sources.zarr_lite import list_zarr_chunks

    adir = tmp_path / "nested.zarr" / "v"
    adir.mkdir(parents=True)
    a = np.arange(24, dtype="<f4").reshape(4, 6)
    json.dump({"zarr_format": 2, "shape": [4, 6], "chunks": [2, 3],
               "dtype": "<f4", "compressor": {"id": "zlib", "level": 6},
               "fill_value": 0, "filters": None, "order": "C",
               "dimension_separator": "/"},
              open(adir / ".zarray", "w"))
    json.dump({"zarr_format": 2}, open(adir.parent / ".zgroup", "w"))
    for iy in range(2):
        for ix in range(2):
            blk = a[iy * 2:(iy + 1) * 2, ix * 3:(ix + 1) * 3]
            (adir / str(iy)).mkdir(exist_ok=True)
            (adir / str(iy) / str(ix)).write_bytes(
                zlib.compress(np.ascontiguousarray(blk).tobytes(), 6))
    store = read_zarr(str(adir.parent))
    np.testing.assert_array_equal(store["v"]["data"], a)
    assert list_zarr_chunks(str(adir.parent), "v") == [
        (0, 0), (0, 1), (1, 0), (1, 1)]


def test_v2_delta_and_shuffle_filters(tmp_path):
    """numcodecs array-side filters: a Delta+zlib coordinate array and a
    Shuffle-filtered 2D array — both built INDEPENDENTLY byte-for-byte
    per the numcodecs algorithms — decode correctly; unknown filter ids
    raise naming the id; the engine's own encode_chunk round-trips
    through the same filter stack."""
    import json
    import zlib as _zlib

    from rasters_ray.sources.zarr_lite import _ArrayInfo, read_zarr

    root = str(tmp_path / "zf")
    adir = os.path.join(root, "time")
    os.makedirs(adir)
    vals = np.arange(1000, 1012, dtype="<i8") * 3600
    json.dump({"zarr_format": 2, "shape": [12], "chunks": [5],
               "dtype": "<i8", "compressor": {"id": "zlib", "level": 6},
               "filters": [{"id": "delta", "dtype": "<i8"}],
               "fill_value": 0, "order": "C"},
              open(adir + "/.zarray", "w"))
    for ci in range(3):
        block = np.zeros(5, dtype="<i8")
        seg = vals[ci * 5:(ci + 1) * 5]
        block[:len(seg)] = seg
        enc = np.empty(5, dtype="<i8")
        enc[0] = block[0]
        enc[1:] = block[1:] - block[:-1]  # numcodecs Delta layout
        open(os.path.join(adir, str(ci)), "wb").write(
            _zlib.compress(enc.tobytes(), 6))

    bdir = os.path.join(root, "temp")
    os.makedirs(bdir)
    rng = np.random.default_rng(5)
    a = rng.normal(size=(6, 7)).astype("<f4")
    json.dump({"zarr_format": 2, "shape": [6, 7], "chunks": [6, 7],
               "dtype": "<f4", "compressor": None,
               "filters": [{"id": "shuffle", "elementsize": 4}],
               "fill_value": 0.0, "order": "C"},
              open(bdir + "/.zarray", "w"))
    u8 = np.frombuffer(a.tobytes(), np.uint8).reshape(-1, 4).T
    open(os.path.join(bdir, "0.0"), "wb").write(
        np.ascontiguousarray(u8).tobytes())
    json.dump({"zarr_format": 2}, open(root + "/.zgroup", "w"))

    out = read_zarr(root)
    np.testing.assert_array_equal(out["time"]["data"], vals)
    np.testing.assert_array_equal(out["temp"]["data"], a)

    # engine-side encode through the same stack round-trips
    info = _ArrayInfo(adir)
    blk = np.array([7, 9, 4, -2, 11], dtype="<i8")
    open(os.path.join(adir, "0"), "wb").write(info.encode_chunk(blk))
    np.testing.assert_array_equal(info.read_chunk_file((0,)), blk)

    cdir = os.path.join(root, "bad")
    os.makedirs(cdir)
    json.dump({"zarr_format": 2, "shape": [4], "chunks": [4],
               "dtype": "<i4", "compressor": None,
               "filters": [{"id": "quantize", "digits": 2, "dtype": "<f8"}],
               "fill_value": 0, "order": "C"},
              open(cdir + "/.zarray", "w"))
    with pytest.raises(NotImplementedError, match="quantize"):
        read_zarr(root)


def test_zarr_v3_sharding_read(tmp_path):
    """sharding_indexed shards — inner gzip chunks behind a crc32c'd
    binary index — decode correctly from an INDEPENDENTLY spec-built
    store: multi-shard assembly, absent inner chunk -> fill_value,
    index corruption raises, CRC-32C pinned to its check value."""
    import itertools
    import zlib as _zlib

    from rasters_ray.sources.zarr_lite import _crc32c

    assert _crc32c(b"123456789") == 0xE3069283  # Castagnoli check value

    root = str(tmp_path / "zs")
    adir = os.path.join(root, "temp")
    os.makedirs(os.path.join(adir, "c", "0"))
    rng = np.random.default_rng(8)
    a = rng.normal(size=(10, 12)).astype("<f4")
    meta = {
        "zarr_format": 3, "node_type": "array", "shape": [10, 12],
        "data_type": "float32",
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": [10, 6]}},
        "chunk_key_encoding": {"name": "default",
                               "configuration": {"separator": "/"}},
        "fill_value": 0.0,
        "codecs": [{"name": "sharding_indexed", "configuration": {
            "chunk_shape": [5, 3],
            "codecs": [
                {"name": "bytes", "configuration": {"endian": "little"}},
                {"name": "gzip", "configuration": {"level": 5}}],
            "index_codecs": [
                {"name": "bytes", "configuration": {"endian": "little"}},
                {"name": "crc32c"}],
            "index_location": "end"}}],
        "dimension_names": ["y", "x"],
    }
    json.dump(meta, open(os.path.join(adir, "zarr.json"), "w"))
    json.dump({"zarr_format": 3, "node_type": "group"},
              open(os.path.join(root, "zarr.json"), "w"))

    def gz(b):
        co = _zlib.compressobj(5, _zlib.DEFLATED, 31)
        return co.compress(b) + co.flush()

    for sj in range(2):
        shard = a[:, sj * 6:(sj + 1) * 6]
        payload = bytearray()
        pairs = []
        for iy, ix in itertools.product(range(2), range(2)):
            if sj == 1 and iy == 1 and ix == 1:
                pairs.append(((1 << 64) - 1, 0))  # absent inner chunk
                continue
            enc = gz(np.ascontiguousarray(
                shard[iy * 5:(iy + 1) * 5, ix * 3:(ix + 1) * 3]).tobytes())
            pairs.append((len(payload), len(enc)))
            payload += enc
        idx = np.array(pairs, dtype="<u8").tobytes()
        idx += _crc32c(idx).to_bytes(4, "little")
        open(os.path.join(adir, "c", "0", str(sj)), "wb").write(
            bytes(payload) + idx)

    got = read_zarr(root)["temp"]["data"]
    exp = a.copy()
    exp[5:10, 9:12] = 0.0
    np.testing.assert_array_equal(got, exp)

    p = os.path.join(adir, "c", "0", "0")
    d = bytearray(open(p, "rb").read())
    d[-1] ^= 0xFF
    open(p, "wb").write(bytes(d))
    with pytest.raises(ValueError, match="crc32c"):
        read_zarr(root)


def test_zarr_v3_sharded_write_roundtrip(tmp_path):
    """write_zarr(shards=) emits sharding_indexed shard files (inner
    chunks behind a CRC-32C'd index) that the reader — and by spec any
    zarr-python v3 — can decode; the CF route works over shards; shard
    size must be a multiple of the chunk size."""
    rng = np.random.default_rng(17)
    temp = rng.normal(size=(37, 53)).astype(np.float32)
    lat = 44.0 - 0.01 * (np.arange(37) + 0.5)
    lon = -124.0 + 0.01 * (np.arange(53) + 0.5)
    for compressor, compress in [("zlib", True), ("blosc", True),
                                 ("zlib", False)]:
        p = str(tmp_path / f"zs_{compressor}_{compress}")
        write_zarr(p, {"lat": {"data": lat, "dims": ["lat"]},
                       "lon": {"data": lon, "dims": ["lon"]},
                       "temp": {"data": temp, "dims": ["lat", "lon"]}},
                   chunks=8, shards=16, zarr_format=3,
                   compress=compress, compressor=compressor)
        np.testing.assert_array_equal(read_zarr(p)["temp"]["data"], temp)
        arr, grid = zarr_raster(p)
        np.testing.assert_array_equal(arr, temp)
        # ceil(37/16) x ceil(53/16) = 12 shard files, not 35 chunk files
        nfiles = sum(len(f) for _, _, f in os.walk(os.path.join(p, "temp", "c")))
        assert nfiles == 12
    with pytest.raises(ValueError, match="multiple"):
        write_zarr(str(tmp_path / "bad"), {"a": {"data": temp}},
                   chunks=7, shards=16, zarr_format=3)
    with pytest.raises(ValueError, match="zarr_format=3"):
        write_zarr(str(tmp_path / "bad2"), {"a": {"data": temp}},
                   chunks=8, shards=16, zarr_format=2)


def test_zarr_window_touches_only_hit_chunks(tmp_path, monkeypatch):
    import rasters_ray.sources.zarr_lite as zl

    rng = np.random.default_rng(17)
    arr = rng.integers(0, 500, size=(30, 44)).astype(np.int32)
    store = str(tmp_path / "w.zarr")
    zl.write_zarr(store, {"v": {"data": arr}}, chunks=16)

    reads = []
    real = zl._ArrayInfo.read_chunk_file

    def counting(self, idx):
        reads.append(idx)
        return real(self, idx)

    monkeypatch.setattr(zl._ArrayInfo, "read_chunk_file", counting)
    got = zl.read_zarr_window(store, "v", (10, 20, 12, 18))
    assert np.array_equal(got, arr[10:22, 20:38])
    assert sorted(reads) == [(0, 1), (0, 2), (1, 1), (1, 2)]
    # clamp + empty + general (off, len) form
    assert zl.read_zarr_window(store, "v", (28, 40, 99, 99)).shape == (2, 4)
    got2 = zl.read_zarr_window(store, "v", ((3, 2), (5, 3)))
    assert np.array_equal(got2, arr[3:5, 5:8])
    with pytest.raises(ValueError, match="empty"):
        zl.read_zarr_window(store, "v", (30, 0, 1, 1))


def _bitshuffle_slow(buf: bytes, typesize: int) -> bytes:
    """Independent reference for the bitshuffle layout: explicit loops
    over (element, byte, bit) — plane order byte-then-bit (LSB first),
    elements packed little-endian, tail past a multiple of 8 elements
    copied raw (c-blosc shuffle.c `bitshuffle`)."""
    n = (len(buf) // typesize) & ~7
    main = n * typesize
    out = bytearray(main)
    for b in range(typesize):
        for bit in range(8):
            plane = (b * 8 + bit) * (n // 8)
            for e in range(n):
                v = (buf[e * typesize + b] >> bit) & 1
                out[plane + e // 8] |= v << (e % 8)
    return bytes(out) + buf[main:]


def test_blosc_bitshuffle(tmp_path):
    """Bit-shuffle (blosc flags bit 2): vectorized kernel matches the
    loop reference bit for bit, compress/decompress round-trips, and a
    hand-assembled chunk in the real c-blosc bitshuffle layout reads."""
    import struct
    import zlib

    from rasters_ray.codec import blosc_lite

    rng = np.random.default_rng(7)
    for dt, ts in (("<u1", 1), ("<u2", 2), ("<f4", 4), ("<f8", 8)):
        vals = rng.integers(0, 255, size=203, dtype=np.uint8)
        raw = np.frombuffer(
            rng.integers(0, 256, size=203 * ts, dtype=np.int64
                         ).astype(np.uint8).tobytes(), np.uint8).tobytes()
        del vals
        assert blosc_lite._bit_shuffle(raw, ts) == _bitshuffle_slow(raw, ts)
        assert blosc_lite._bit_unshuffle(
            blosc_lite._bit_shuffle(raw, ts), ts) == raw
    # tiny pinned vector: 8 uint8 elements [1,0,...,0] -> bit-0 plane 0x01
    assert blosc_lite._bit_shuffle(bytes([1, 0, 0, 0, 0, 0, 0, 0]), 1) == (
        bytes([1, 0, 0, 0, 0, 0, 0, 0]))
    # element 3 with bit 6 set -> plane 6, bit 3
    assert blosc_lite._bit_shuffle(
        bytes([0, 0, 0, 0x40, 0, 0, 0, 0]), 1)[6] == 0x08

    data = np.sin(np.arange(40 * 50, dtype="<f4")).reshape(40, 50)
    chunk = blosc_lite.compress(data.tobytes(), typesize=4, bitshuffle=True)
    assert chunk[2] & 0x04 and not (chunk[2] & 0x01)
    assert blosc_lite.decompress(chunk) == data.tobytes()

    # hand-assemble a bitshuffled zlib chunk via the loop reference and
    # read the store (zarr v2 metadata with shuffle=2)
    adir = tmp_path / "bits.zarr"
    adir.mkdir()
    raw = _bitshuffle_slow(data.tobytes(), 4)
    comp = zlib.compress(raw, 5)
    hl = 16 + 4
    blob = struct.pack("<BBBBIII", 2, 1, (3 << 5) | 0x04, 4, len(raw),
                       len(raw), hl + 4 + len(comp))
    blob += struct.pack("<I", hl) + struct.pack("<i", len(comp)) + comp
    json.dump({"zarr_format": 2, "shape": [40, 50], "chunks": [40, 50],
               "dtype": "<f4", "fill_value": 0, "filters": None,
               "order": "C",
               "compressor": {"id": "blosc", "cname": "zlib", "clevel": 5,
                              "shuffle": 2, "blocksize": 0}},
              open(adir / ".zarray", "w"))
    (adir / "0.0").write_bytes(blob)
    out = read_zarr(str(adir))
    np.testing.assert_array_equal(out["bits.zarr"]["data"], data)


def _crc32c_slow(data: bytes) -> int:
    """Bit-by-bit CRC-32C (Castagnoli), independent of the engine's
    table-driven kernel."""
    crc = 0xFFFFFFFF
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = (crc >> 1) ^ (0x82F63B78 if crc & 1 else 0)
    return crc ^ 0xFFFFFFFF


def test_zarr_v3_transpose_crc32c_stacked(tmp_path):
    """v3 codec chains the engine previously refused: transpose ->
    bytes -> gzip -> crc32c (an array->array codec, a stacked
    bytes->bytes pair, and the crc32c DATA codec). Chunk files are
    assembled independently in the test; read_zarr must invert the
    whole chain, and encode_chunk must round-trip it."""
    import zlib

    from rasters_ray.sources.zarr_lite import _ArrayInfo

    data = (np.arange(24 * 17) % 97).astype("<f4").reshape(24, 17)
    adir = tmp_path / "t.zarr"
    (adir / "c" / "0").mkdir(parents=True)
    meta = {
        "zarr_format": 3, "node_type": "array",
        "shape": [24, 17], "data_type": "float32",
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": [24, 17]}},
        "chunk_key_encoding": {"name": "default",
                               "configuration": {"separator": "/"}},
        "fill_value": 0.0,
        "codecs": [
            {"name": "transpose", "configuration": {"order": [1, 0]}},
            {"name": "bytes", "configuration": {"endian": "little"}},
            {"name": "gzip", "configuration": {"level": 5}},
            {"name": "crc32c"},
        ],
        "dimension_names": ["y", "x"],
    }
    json.dump(meta, open(adir / "zarr.json", "w"))
    co = zlib.compressobj(5, zlib.DEFLATED, 31)
    gz = co.compress(np.ascontiguousarray(data.T).tobytes()) + co.flush()
    payload = gz + _crc32c_slow(gz).to_bytes(4, "little")
    (adir / "c" / "0" / "0").write_bytes(payload)
    out = read_zarr(str(adir))
    np.testing.assert_array_equal(out["t.zarr"]["data"], data)

    # encode path round-trips the same chain
    info = _ArrayInfo(str(adir))
    enc = info.encode_chunk(data)
    (adir / "c" / "0" / "0").write_bytes(enc)
    np.testing.assert_array_equal(read_zarr(str(adir))["t.zarr"]["data"], data)

    # corrupted checksum raises
    bad = bytearray(payload)
    bad[-1] ^= 0xFF
    (adir / "c" / "0" / "0").write_bytes(bytes(bad))
    with pytest.raises(ValueError, match="crc32c"):
        read_zarr(str(adir))
