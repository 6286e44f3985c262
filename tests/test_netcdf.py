"""NetCDF classic reader/writer (public CDF-1/2 spec, no libs)."""

import struct

import numpy as np
import pytest

from rasters_ray.sources.netcdf import (
    netcdf_dataset,
    netcdf_raster,
    read_netcdf,
    write_netcdf,
)


def _write_sample(path, rows=40, cols=60):
    lat = 44.0 - 0.01 * (np.arange(rows) + 0.5)
    lon = -124.0 + 0.01 * (np.arange(cols) + 0.5)
    temp = (np.arange(rows * cols) % 251).astype(np.float32).reshape(rows, cols)
    write_netcdf(
        str(path),
        dims={"lat": rows, "lon": cols},
        variables={
            "lat": {"data": lat, "dims": ["lat"], "attrs": {"units": "degrees_north"}},
            "lon": {"data": lon, "dims": ["lon"]},
            "temp": {"data": temp, "dims": ["lat", "lon"],
                     "attrs": {"units": "K", "scale": np.float64(1.5)}},
        },
        attrs={"title": "engine test", "crs": "EPSG:4326"},
    )
    return temp, lat, lon


def test_roundtrip_cdf2(tmp_path):
    p = tmp_path / "a.nc"
    temp, lat, lon = _write_sample(p)
    nc = read_netcdf(str(p))
    assert nc["dims"] == {"lat": 40, "lon": 60}
    assert nc["attrs"]["title"] == "engine test"
    np.testing.assert_array_equal(nc["vars"]["temp"]["data"], temp)
    np.testing.assert_allclose(nc["vars"]["lat"]["data"], lat)
    assert nc["vars"]["temp"]["attrs"]["units"] == "K"
    assert float(nc["vars"]["temp"]["attrs"]["scale"][0]) == 1.5


def test_cf_grid_extraction(tmp_path):
    p = tmp_path / "b.nc"
    temp, lat, lon = _write_sample(p)
    arr, grid = netcdf_raster(str(p), "temp")
    np.testing.assert_array_equal(arr, temp)
    assert grid.rows == 40 and grid.cols == 60
    assert grid.cell_width == pytest.approx(0.01)
    assert grid.cell_height == pytest.approx(-0.01)
    # origin is the cell CORNER (coords are centers)
    assert grid.x_origin == pytest.approx(-124.0)
    assert grid.y_origin == pytest.approx(44.0)
    assert grid.crs == "EPSG:4326"


def test_cdf1_and_record_variable():
    """Hand-encoded CDF-1 blob with one record variable (2 records) —
    exercises the 32-bit-offset and record-interleave paths."""
    name = b"t"
    hdr = b"CDF\x01" + struct.pack(">I", 2)  # numrecs=2
    hdr += struct.pack(">II", 0x0A, 1)  # 1 dim
    hdr += struct.pack(">I", 4) + b"time" + struct.pack(">I", 0)  # record dim
    hdr += struct.pack(">II", 0, 0)  # no gattrs
    hdr += struct.pack(">II", 0x0B, 1)  # 1 var
    hdr += struct.pack(">I", 1) + name + b"\x00" * 3  # name 't' padded
    hdr += struct.pack(">I", 1) + struct.pack(">I", 0)  # 1 dim: time
    hdr += struct.pack(">II", 0, 0)  # no vattrs
    begin = len(hdr) + 12  # + type(4) + vsize(4) + begin(4)
    hdr += struct.pack(">III", 5, 4, begin)  # float, vsize, begin
    data = hdr + struct.pack(">ff", 1.5, -2.5)
    nc = read_netcdf(data)
    assert nc["dims"]["time"] == 2
    np.testing.assert_allclose(nc["vars"]["t"]["data"], [1.5, -2.5])


def test_netcdf4_raises_clearly(tmp_path):
    p = tmp_path / "h.nc"
    p.write_bytes(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(NotImplementedError, match="HDF5"):
        read_netcdf(str(p))


def test_irregular_coords_rejected(tmp_path):
    p = tmp_path / "c.nc"
    write_netcdf(
        str(p),
        dims={"y": 3, "x": 2},
        variables={
            "y": {"data": np.array([0.0, 1.0, 3.0]), "dims": ["y"]},
            "x": {"data": np.array([0.0, 1.0]), "dims": ["x"]},
            "v": {"data": np.zeros((3, 2), np.float32), "dims": ["y", "x"]},
        },
    )
    with pytest.raises(ValueError, match="regularly spaced"):
        netcdf_raster(str(p), "v")


def test_netcdf_dataset_tiles(ray_session, tmp_path):
    """Ingest streams on workers and feeds the tiling stage directly."""
    from rasters_ray.stages import tile_images

    paths = []
    for i in range(3):
        p = tmp_path / f"scene{i}.nc"
        _write_sample(p)
        paths.append(str(p))
    ds = netcdf_dataset(paths, "temp")
    tiles = tile_images(ds, level=8).to_pandas()
    assert len(tiles) >= 3
    assert set(t.split("/")[1] for t in tiles.tile_id) == {"scene0", "scene1", "scene2"}


# ----------------------------------------------------------- hdf5lite

from rasters_ray.sources import hdf5lite


def test_hdf5_roundtrip(tmp_path):
    """write_hdf5 -> read_hdf5 over mixed dtypes/endianness/rank."""
    p = tmp_path / "t.h5"
    data = {
        "temp": (np.arange(12, dtype=np.float32) / 7).reshape(3, 4),
        "mask": np.array([[1, 0], [0, 1], [1, 1]], dtype=np.int16),
        "time": np.array([10, 20, 30], dtype=np.int64),
        "z": np.linspace(-1.0, 1.0, 4),
    }
    hdf5lite.write_hdf5(str(p), data)
    back = hdf5lite.read_hdf5(str(p))
    assert set(back) == {"/temp", "/mask", "/time", "/z"}
    for k, v in data.items():
        np.testing.assert_array_equal(back[f"/{k}"], v)
        assert back[f"/{k}"].dtype == v.dtype


def test_hdf5_netcdf4_route(tmp_path):
    """read_netcdf on an HDF5 container extracts contiguous vars and
    netcdf_raster reconstructs the CF grid from 1D coordinate vars."""
    p = tmp_path / "n4.nc"
    rows, cols = 5, 7
    lat = 44.0 - 0.01 * (np.arange(rows) + 0.5)
    lon = -124.0 + 0.01 * (np.arange(cols) + 0.5)
    temp = np.arange(rows * cols, dtype=np.float32).reshape(rows, cols)
    hdf5lite.write_hdf5(str(p), {"lat": lat, "lon": lon, "temp": temp})
    nc = read_netcdf(str(p))
    np.testing.assert_array_equal(nc["vars"]["temp"]["data"], temp)
    assert nc["vars"]["temp"]["dims"] == ["lat", "lon"]
    arr, grid = netcdf_raster(str(p), "temp")
    assert (grid.rows, grid.cols) == (rows, cols)
    assert grid.cell_width == pytest.approx(0.01)
    assert grid.cell_height == pytest.approx(-0.01)


def test_hdf5_chunked_deflate_roundtrip(tmp_path):
    """Chunked(+deflate) datasets — the layout real NASA NetCDF-4
    granules use — round-trip through the v1 B-tree chunk index and the
    filter pipeline message, including ragged edge chunks and 3D."""
    rng = np.random.default_rng(5)
    p = tmp_path / "c.h5"
    data = {
        "a": rng.normal(size=(57, 83)).astype(np.float32),
        "b": rng.integers(0, 1000, (40,)).astype(np.int32),
        "c": rng.normal(size=(3, 20, 11)).astype(">f8"),
    }
    hdf5lite.write_hdf5(str(p), data,
                        chunks={"a": (16, 32), "b": (7,), "c": (2, 8, 5)},
                        compression="deflate")
    back = hdf5lite.read_hdf5(str(p))
    np.testing.assert_array_equal(back["/a"], data["a"])
    np.testing.assert_array_equal(back["/b"], data["b"])
    np.testing.assert_allclose(back["/c"], data["c"].astype("=f8"))
    # chunked without compression, and compression with auto full chunk
    hdf5lite.write_hdf5(str(tmp_path / "r.h5"), {"a": data["a"]}, chunks=(20, 20))
    np.testing.assert_array_equal(
        hdf5lite.read_hdf5(str(tmp_path / "r.h5"))["/a"], data["a"])
    hdf5lite.write_hdf5(str(tmp_path / "z.h5"), {"a": data["a"]},
                        compression="deflate")
    np.testing.assert_array_equal(
        hdf5lite.read_hdf5(str(tmp_path / "z.h5"))["/a"], data["a"])


def test_hdf5_chunked_netcdf4_cf_route(tmp_path):
    """netcdf_raster extracts the CF grid from a CHUNKED+deflate
    NetCDF-4 container (round-4 VERDICT item 2's done-criterion)."""
    p = tmp_path / "n4c.nc"
    rows, cols = 50, 70
    lat = 44.0 - 0.01 * (np.arange(rows) + 0.5)
    lon = -124.0 + 0.01 * (np.arange(cols) + 0.5)
    temp = np.arange(rows * cols, dtype=np.float32).reshape(rows, cols)
    hdf5lite.write_hdf5(str(p), {"lat": lat, "lon": lon, "temp": temp},
                        chunks={"temp": (16, 16), "lat": (rows,),
                                "lon": (cols,)}, compression="deflate")
    arr, grid = netcdf_raster(str(p), "temp")
    np.testing.assert_array_equal(arr, temp)
    assert (grid.rows, grid.cols) == (rows, cols)
    assert grid.cell_width == pytest.approx(0.01)
    assert grid.cell_height == pytest.approx(-0.01)


def test_hdf5_shuffle_fletcher32_roundtrip(tmp_path):
    """shuffle (id 2) + fletcher32 (id 3) — with deflate, the full
    netcdf-c default filter stack — round-trip in every combination and
    both superblock flavors; the CF route reads a shuffle+deflate
    granule (what `nc_def_var_deflate(..., shuffle=1, ...)` emits)."""
    import itertools

    rng = np.random.default_rng(11)
    a = rng.normal(size=(37, 53)).astype(np.float32)
    b = rng.integers(-1000, 1000, (20, 30)).astype(np.int16)
    for i, (comp, shuf, fle, sb) in enumerate(itertools.product(
            [None, "deflate"], [False, True], [False, True], [0, 2])):
        p = tmp_path / f"f{i}.h5"
        hdf5lite.write_hdf5(str(p), {"x": a, "y": b}, chunks=(16, 16),
                            compression=comp, shuffle=shuf,
                            fletcher32=fle, superblock=sb)
        back = hdf5lite.read_hdf5(str(p))
        np.testing.assert_array_equal(back["/x"], a)
        np.testing.assert_array_equal(back["/y"], b)
    # CF extraction through the shuffle+deflate path
    rows, cols = 30, 44
    lat = 44.0 - 0.01 * (np.arange(rows) + 0.5)
    lon = -124.0 + 0.01 * (np.arange(cols) + 0.5)
    temp = np.arange(rows * cols, dtype=np.float32).reshape(rows, cols)
    p = tmp_path / "n4s.nc"
    hdf5lite.write_hdf5(str(p), {"lat": lat, "lon": lon, "temp": temp},
                        chunks={"temp": (16, 16), "lat": (rows,),
                                "lon": (cols,)},
                        compression="deflate", shuffle=True, fletcher32=True)
    arr, grid = netcdf_raster(str(p), "temp")
    np.testing.assert_array_equal(arr, temp)
    assert (grid.rows, grid.cols) == (rows, cols)


def test_hdf5_fletcher32_checksum():
    """_fletcher32 is bit-identical to a literal transcription of the
    public H5checksum.c algorithm (big-endian words, deferred folds
    every 360 words, odd-byte tail), including the fold edge cases a
    plain mod-65535 Fletcher would get wrong."""

    def ref(data: bytes) -> int:
        ln = len(data) // 2
        i = sum1 = sum2 = 0
        while ln:
            tlen = min(ln, 360)
            ln -= tlen
            for _ in range(tlen):
                sum1 += (data[i] << 8) | data[i + 1]
                i += 2
                sum2 += sum1
            sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
            sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
        if len(data) % 2:
            sum1 += data[-1] << 8
            sum2 += sum1
            sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
            sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
        sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
        sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
        return (sum2 << 16) | sum1

    rng = np.random.default_rng(42)
    for n in [0, 1, 2, 3, 359 * 2, 360 * 2, 360 * 2 + 1, 10001, 720 * 2]:
        d = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert hdf5lite._fletcher32(d) == ref(d)
    for n in [719 * 2, 720 * 2 + 1]:  # saturating sums exercise the folds
        assert hdf5lite._fletcher32(b"\xff" * n) == ref(b"\xff" * n)


def test_hdf5_fletcher32_corruption_raises(tmp_path):
    """A flipped byte inside a checksummed chunk is detected, not
    silently decoded into garbage pixels."""
    p = tmp_path / "cor.h5"
    a = np.arange(256, dtype=np.float32).reshape(16, 16)
    hdf5lite.write_hdf5(str(p), {"x": a}, chunks=(8, 8),
                        compression="deflate", shuffle=True, fletcher32=True)
    buf = bytearray(open(p, "rb").read())
    buf[-40] ^= 0xFF  # inside the last chunk's bytes
    with pytest.raises(hdf5lite.Hdf5LiteError, match="fletcher32"):
        hdf5lite.read_hdf5(bytes(buf))


def test_hdf5_unsupported_filter_raises(tmp_path):
    """An szip-filtered chunk raises naming the filter (the remaining
    documented env boundary)."""
    p = tmp_path / "f.h5"
    hdf5lite.write_hdf5(str(p), {"a": np.arange(12, dtype=np.float32)},
                        compression="deflate")
    buf = bytearray(open(p, "rb").read())
    i = buf.find(struct.pack("<HHHH", 1, 0, 0, 1))  # deflate filter desc
    assert i > 0
    struct.pack_into("<H", buf, i, 4)  # szip
    with pytest.raises(NotImplementedError, match="szip"):
        hdf5lite.read_hdf5(bytes(buf))


def test_hdf5_duplicate_leaf_name_raises(monkeypatch):
    """read_netcdf refuses leaf-name collisions across groups instead of
    silently dropping data (same-named datasets flatten ambiguously;
    read_netcdf imports read_hdf5 at call time, so patching the module
    attribute takes effect)."""
    monkeypatch.setattr(
        hdf5lite, "read_hdf5_info",
        lambda d: {"/g1/v": {"data": np.zeros(2), "dims": [None]},
                   "/g2/v": {"data": np.ones(2), "dims": [None]}},
    )
    with pytest.raises(ValueError, match="duplicate leaf"):
        read_netcdf(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)


def test_hdf5_unsupported_versions():
    sig = b"\x89HDF\r\n\x1a\n"
    with pytest.raises(NotImplementedError, match="superblock version 1"):
        hdf5lite.read_hdf5(sig + bytes([1]) + b"\x00" * 64)


def test_hdf5_superblock_v2_roundtrip(tmp_path):
    """libver='latest'-style files: v2 superblock, OHDR v2 with lookup3
    checksums, compact link-message groups — contiguous AND
    chunked+deflate datasets round-trip; the netcdf CF route works on
    the same container."""
    rng = np.random.default_rng(8)
    data = {"a": rng.normal(size=(57, 83)).astype(np.float32),
            "b": rng.integers(0, 1000, (40,)).astype(np.int32),
            "c": rng.normal(size=(3, 20, 11)).astype(">f8")}
    for chunks, comp in [(None, None),
                         ({"a": (16, 32), "b": (7,), "c": (2, 8, 5)},
                          "deflate")]:
        p = str(tmp_path / "sb2.h5")
        hdf5lite.write_hdf5(p, data, chunks=chunks, compression=comp,
                            superblock=2)
        raw = open(p, "rb").read()
        assert raw[8] == 2 and raw[48:52] == b"OHDR"
        back = hdf5lite.read_hdf5(p)
        np.testing.assert_array_equal(back["/a"], data["a"])
        np.testing.assert_array_equal(back["/b"], data["b"])
        np.testing.assert_allclose(back["/c"], data["c"].astype("=f8"))
    # CF grid extraction through the netcdf route on a v2-superblock file
    rows, cols = 50, 70
    lat = 44.0 - 0.01 * (np.arange(rows) + 0.5)
    lon = -124.0 + 0.01 * (np.arange(cols) + 0.5)
    temp = np.arange(rows * cols, dtype=np.float32).reshape(rows, cols)
    p = str(tmp_path / "n4v2.nc")
    hdf5lite.write_hdf5(p, {"lat": lat, "lon": lon, "temp": temp},
                        compression="deflate", superblock=2)
    arr, grid = netcdf_raster(p, "temp")
    np.testing.assert_array_equal(arr, temp)
    assert (grid.rows, grid.cols) == (rows, cols)
    # lookup3 checksum matches Bob Jenkins' published hashlittle vectors
    assert hdf5lite._lookup3(b"", 0) == 0xDEADBEEF
    assert hdf5lite._lookup3(b"Four score and seven years ago", 0) == 0x17770551
    assert hdf5lite._lookup3(b"Four score and seven years ago", 1) == 0xCD628161


def test_hdf5_dense_links_raise(tmp_path):
    """A v2 group whose link-info points at a fractal heap (dense
    storage) raises with the remediation instead of misreading."""
    p = str(tmp_path / "d.h5")
    hdf5lite.write_hdf5(p, {"a": np.zeros(4, np.float32)}, superblock=2)
    buf = bytearray(open(p, "rb").read())
    # link-info body starts after the root OHDR prefix (sig4+ver1+flags1+
    # size4) + the 4-byte v2 message header; body = version(1) flags(1)
    # then the fractal heap address
    li = 48 + 10 + 4 + 2
    assert buf[li : li + 8] == b"\xff" * 8  # currently UNDEF
    struct.pack_into("<Q", buf, li, 4096)
    with pytest.raises(NotImplementedError, match="dense link"):
        hdf5lite.read_hdf5(bytes(buf))


def test_hdf5_dimension_list(tmp_path):
    """netCDF-4 DIMENSION_LIST attributes (vlen object references
    resolved through the global heap) name the axes authoritatively —
    a SQUARE grid extracts its CF georeferencing without coords=,
    under both superblock versions and both layouts."""
    lat = 44.0 - 0.01 * (np.arange(60) + 0.5)
    lon = -124.0 + 0.01 * (np.arange(60) + 0.5)
    temp = np.arange(3600, dtype=np.float32).reshape(60, 60)
    for sb in (0, 2):
        for chunks, comp in [(None, None),
                             ({"temp": (16, 16), "lat": (60,), "lon": (60,)},
                              "deflate")]:
            p = str(tmp_path / "dl.nc")
            hdf5lite.write_hdf5(p, {"lat": lat, "lon": lon, "temp": temp},
                                chunks=chunks, compression=comp,
                                superblock=sb, dims={"temp": ["lat", "lon"]})
            info = hdf5lite.read_hdf5_info(p)
            assert info["/temp"]["dims"] == ["/lat", "/lon"]
            arr, grid = netcdf_raster(p, "temp")  # no coords= despite square
            np.testing.assert_array_equal(arr, temp)
            assert grid.cell_width == pytest.approx(0.01)
            assert grid.x_origin == pytest.approx(-124.0)
    # bad dims references fail loudly at write time
    with pytest.raises(hdf5lite.Hdf5LiteError, match="unknown"):
        hdf5lite.write_hdf5(str(tmp_path / "bad.h5"),
                            {"a": np.zeros((2, 2))}, dims={"a": ["x", "y"]})
    with pytest.raises(hdf5lite.Hdf5LiteError, match="2-D"):
        hdf5lite.write_hdf5(str(tmp_path / "bad.h5"),
                            {"a": np.zeros((2, 2)), "x": np.zeros(2)},
                            dims={"a": ["x"]})


def test_write_record_variables(tmp_path):
    """The CDF-2 writer now emits UNLIMITED/record variables: records
    interleave across record vars with 4-padded slabs (a sole record
    var packs contiguous unpadded, the spec rule), numrecs from the
    data; fixed vars precede the record section. Round-trips through
    the reader's independent record-stride logic."""
    rng = np.random.default_rng(6)
    lat = 44.0 - 0.01 * np.arange(5)
    temp = rng.normal(size=(7, 5, 4)).astype(np.float32)
    prec = rng.integers(0, 100, (7,)).astype(np.int32)
    p = str(tmp_path / "rec.nc")
    write_netcdf(p, {"time": None, "lat": 5, "lon": 4},
                 {"temp": {"data": temp, "dims": ["time", "lat", "lon"]},
                  "prec": {"data": prec, "dims": ["time"]},
                  "lat": {"data": lat, "dims": ["lat"]}},
                 attrs={"title": "rec"})
    nc = read_netcdf(p)
    assert nc["dims"]["time"] == 7
    np.testing.assert_allclose(nc["vars"]["temp"]["data"], temp)
    np.testing.assert_array_equal(nc["vars"]["prec"]["data"], prec)
    np.testing.assert_allclose(nc["vars"]["lat"]["data"], lat)
    # sole record variable: odd (6-byte) slabs pack unpadded
    v = rng.integers(-5, 5, (4, 3)).astype(np.int16)
    p1 = str(tmp_path / "rec1.nc")
    write_netcdf(p1, {"t": None, "x": 3},
                 {"v": {"data": v, "dims": ["t", "x"]}})
    nc = read_netcdf(p1)
    np.testing.assert_array_equal(nc["vars"]["v"]["data"], v)
    assert nc["dims"]["t"] == 4
    with pytest.raises(ValueError, match="record count"):
        write_netcdf(str(tmp_path / "bad.nc"), {"t": None},
                     {"a": {"data": np.zeros(3), "dims": ["t"]},
                      "b": {"data": np.zeros(4), "dims": ["t"]}})


def test_cf_packed_data_unpacks(tmp_path):
    """CF packed-data conventions (how real granules ship int16 data):
    _FillValue/missing_value -> NaN, then scale_factor/add_offset
    unpack — the same behavior xarray/rasterio apply; attribute-less
    variables pass through with their dtype untouched. Shared with the
    Zarr route."""
    from rasters_ray.sources.zarr_lite import write_zarr, zarr_raster

    rows, cols = 20, 30
    lat = 44.0 - 0.01 * (np.arange(rows) + 0.5)
    lon = -124.0 + 0.01 * (np.arange(cols) + 0.5)
    true = np.linspace(250.0, 320.0, rows * cols).reshape(rows, cols)
    scale, offset = 0.01, 273.15
    raw = np.rint((true - offset) / scale).astype(np.int16)
    raw[0, :3] = -32768
    p = str(tmp_path / "cf.nc")
    write_netcdf(p, {"lat": rows, "lon": cols},
                 {"lat": {"data": lat, "dims": ["lat"]},
                  "lon": {"data": lon, "dims": ["lon"]},
                  "temp": {"data": raw, "dims": ["lat", "lon"],
                           "attrs": {"scale_factor": np.float64(scale),
                                     "add_offset": np.float64(offset),
                                     "_FillValue": np.int16(-32768)}}})
    arr, grid = netcdf_raster(p, "temp")
    assert np.isnan(arr[0, :3]).all()
    mask = ~np.isnan(arr)
    np.testing.assert_allclose(
        arr[mask], (raw.astype(np.float64) * scale + offset)[mask])

    pz = str(tmp_path / "cf.zarr")
    write_zarr(pz, {"lat": {"data": lat, "dims": ["lat"]},
                    "lon": {"data": lon, "dims": ["lon"]},
                    "temp": {"data": raw, "dims": ["lat", "lon"],
                             "attrs": {"scale_factor": scale,
                                       "add_offset": offset,
                                       "_FillValue": -32768}}})
    arr2, _ = zarr_raster(pz, "temp")
    np.testing.assert_array_equal(np.isnan(arr2), np.isnan(arr))
    np.testing.assert_allclose(arr2[mask], arr[mask])

    pp = str(tmp_path / "plain.nc")
    write_netcdf(pp, {"lat": rows, "lon": cols},
                 {"lat": {"data": lat, "dims": ["lat"]},
                  "lon": {"data": lon, "dims": ["lon"]},
                  "v": {"data": raw, "dims": ["lat", "lon"]}})
    arr3, _ = netcdf_raster(pp, "v")
    assert np.issubdtype(arr3.dtype, np.integer)
    np.testing.assert_array_equal(arr3, raw)


def test_hdf5_window_decodes_only_hit_chunks(tmp_path, monkeypatch):
    """AOI contract: read_hdf5_window defilters ONLY intersecting
    chunks, matches the full read on the window, and slices
    contiguous layouts lazily."""
    import rasters_ray.sources.hdf5lite as h5

    rng = np.random.default_rng(31)
    arr = rng.integers(0, 1000, size=(40, 56)).astype(np.int32)
    small = np.arange(12, dtype=np.float32).reshape(3, 4)
    p = str(tmp_path / "win.h5")
    h5.write_hdf5(p, {"big": arr, "small": small},
                  chunks={"big": (16, 16)}, compression="deflate")

    calls = []
    real = h5._defilter

    def counting(raw, filters, fmask, name):
        calls.append(name)
        return real(raw, filters, fmask, name)

    monkeypatch.setattr(h5, "_defilter", counting)
    got = h5.read_hdf5_window(p, "big", (10, 20, 12, 18))
    assert np.array_equal(got, arr[10:22, 20:38])
    # rows 10..22 hit chunk-rows 0-1; cols 20..38 hit chunk-cols 1-2 -> 4
    assert len(calls) == 4
    # full read for comparison touches every stored chunk (>= the
    # ceil(40/16)*ceil(56/16) = 12 grid chunks)
    calls.clear()
    full = h5.read_hdf5(p)["/big"]
    assert np.array_equal(full, arr) and len(calls) >= 12

    # contiguous dataset: lazy view slice, general (off, len) window
    got2 = h5.read_hdf5_window(p, "small", ((1, 2), (1, 2)))
    assert np.array_equal(got2, small[1:3, 1:3])
    # clamping + emptiness + unknown dataset
    assert h5.read_hdf5_window(p, "big", (36, 50, 99, 99)).shape == (4, 6)
    with pytest.raises(ValueError, match="empty"):
        h5.read_hdf5_window(p, "big", (40, 0, 4, 4))
    with pytest.raises(h5.Hdf5LiteError, match="not found"):
        h5.read_hdf5_window(p, "nope", (0, 0, 1, 1))


def test_hdf5_v4_chunk_indexes_roundtrip(tmp_path):
    """Layout-message v4 (libver='latest'): Single Chunk, Implicit and
    Fixed Array chunk indexes round-trip in both superblock styles,
    with and without the filter pipeline; the paged Fixed Array data
    block (>1024 chunks) reads back too."""
    import rasters_ray.sources.hdf5lite as h5

    rng = np.random.default_rng(53)
    a = rng.normal(size=(37, 53)).astype(np.float32)
    v = rng.integers(0, 1000, size=120).astype(np.int64)
    cases = [
        dict(chunk_index="single"),
        dict(chunk_index="single", compression="deflate"),
        dict(chunk_index="implicit", chunks=(8, 16)),
        dict(chunk_index="fixed", chunks=(8, 16)),
        dict(chunk_index="fixed", chunks=(8, 16), compression="deflate",
             shuffle=True, fletcher32=True),
    ]
    for kw in cases:
        for sb in (0, 2):
            p = str(tmp_path / f"v4_{kw['chunk_index']}_{sb}.h5")
            h5.write_hdf5(p, {"a": a, "v": v}, superblock=sb, **kw)
            got = h5.read_hdf5(p)
            np.testing.assert_array_equal(got["/a"], a)
            np.testing.assert_array_equal(got["/v"], v)
            w = h5.read_hdf5_window(p, "a", (5, 9, 12, 20))
            np.testing.assert_array_equal(w, a[5:17, 9:29])
    # paged fixed array: 40x30 grid of 4x4 chunks = 1200 > 2^10 entries
    big = rng.normal(size=(160, 120)).astype(np.float32)
    p = str(tmp_path / "paged.h5")
    h5.write_hdf5(p, {"b": big}, chunks=(4, 4), compression="deflate",
                  chunk_index="fixed")
    np.testing.assert_array_equal(h5.read_hdf5(p)["/b"], big)
    np.testing.assert_array_equal(
        h5.read_hdf5_window(p, "b", (100, 50, 30, 40)),
        big[100:130, 50:90])


def test_hdf5_v4_guards_and_pruning(tmp_path, monkeypatch):
    """v4 writer preconditions raise; Extensible Array / v2 B-tree
    indexes raise with the h5repack remediation; the AOI defilter
    pruning contract holds through a Fixed Array index."""
    import rasters_ray.sources.hdf5lite as h5

    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    with pytest.raises(h5.Hdf5LiteError, match="ONE chunk"):
        h5.write_hdf5(str(tmp_path / "x.h5"), {"a": a},
                      chunk_index="single", chunks=(2, 2))
    with pytest.raises(h5.Hdf5LiteError, match="no\\s+filter"):
        h5.write_hdf5(str(tmp_path / "x.h5"), {"a": a},
                      chunk_index="implicit", compression="deflate")
    # itypes 4 and 5 now read; garbage header addresses raise their
    # signature checks, not a blanket NotImplementedError
    dims8 = np.array([2, 2, 4], "<u8").tobytes()
    lay = bytes([4, 2, 0, 3, 8]) + dims8 + bytes([4]) + b"\x00" * 14
    with pytest.raises(h5.Hdf5LiteError, match="Extensible Array signature"):
        h5._parse_layout_chunked(b"XXXX" + b"\x00" * 64, lay, (3, 4),
                                 np.dtype("<f4"), "x")
    lay = bytes([4, 2, 0, 3, 8]) + dims8 + bytes([5]) + b"\x00" * 14
    with pytest.raises(h5.Hdf5LiteError, match="v2 B-tree header"):
        h5._parse_layout_chunked(b"XXXX" + b"\x00" * 64, lay, (3, 4),
                                 np.dtype("<f4"), "x")
    # pruning: window touching 4 of 12 chunks defilters exactly 4
    rng = np.random.default_rng(31)
    arr = rng.integers(0, 1000, size=(40, 56)).astype(np.int32)
    p = str(tmp_path / "fa.h5")
    h5.write_hdf5(p, {"big": arr}, chunks=(16, 16), compression="deflate",
                  chunk_index="fixed")
    calls = []
    real = h5._defilter

    def counting(raw, filters, fmask, name):
        calls.append(name)
        return real(raw, filters, fmask, name)

    monkeypatch.setattr(h5, "_defilter", counting)
    got = h5.read_hdf5_window(p, "big", (10, 20, 12, 18))
    assert np.array_equal(got, arr[10:22, 20:38])
    assert len(calls) == 4


def test_netcdf_route_reads_v4_indexed_granule(tmp_path):
    """netcdf_raster extracts the CF grid from a file whose variables
    use the Fixed Array chunk index (a libver='latest' granule)."""
    from rasters_ray.sources.hdf5lite import write_hdf5
    from rasters_ray.sources.netcdf import netcdf_raster

    rng = np.random.default_rng(59)
    px = rng.normal(size=(24, 36)).astype(np.float32)
    lat = 50.0 - 0.1 * (np.arange(24) + 0.5)
    lon = -10.0 + 0.1 * (np.arange(36) + 0.5)
    p = str(tmp_path / "latest.nc")
    write_hdf5(p, {"lat": lat, "lon": lon, "temp": px},
               chunks={"temp": (8, 8), "lat": (24,), "lon": (36,)},
               compression="deflate", dims={"temp": ["lat", "lon"]},
               superblock=2, chunk_index="fixed")
    arr, grid = netcdf_raster(p, "temp", coords=("lat", "lon"))
    np.testing.assert_array_equal(arr, px)
    assert grid.cols == 36 and grid.rows == 24


def test_netcdf_raster_window_matches_full(tmp_path):
    """The granule AOI path equals the full read's slice, grid shifted
    to the window; ascending-latitude flip still applies."""
    from rasters_ray.sources.hdf5lite import write_hdf5
    from rasters_ray.sources.netcdf import (netcdf_raster,
                                            netcdf_raster_window)

    rng = np.random.default_rng(41)
    px = rng.normal(size=(48, 64)).astype(np.float32)
    lat = 44.0 - 0.01 * (np.arange(48) + 0.5)       # descending (north-up)
    lon = -124.0 + 0.01 * (np.arange(64) + 0.5)
    p = str(tmp_path / "g.nc")
    write_hdf5(p, {"lat": lat, "lon": lon, "temp": px},
               chunks={"temp": (16, 16), "lat": (48,), "lon": (64,)},
               compression="deflate", dims={"temp": ["lat", "lon"]})
    full, gfull = netcdf_raster(p, "temp", coords=("lat", "lon"))
    win, gwin = netcdf_raster_window(p, "temp", (10, 20, 12, 18),
                                     coords=("lat", "lon"))
    np.testing.assert_array_equal(win, full[10:22, 20:38])
    assert gwin.x_origin == pytest.approx(gfull.x_origin + 20 * gfull.cell_width)
    assert gwin.y_origin == pytest.approx(gfull.y_origin + 10 * gfull.cell_height)
    # ascending-latitude file: both paths flip north-up consistently
    write_hdf5(str(tmp_path / "a.nc"),
               {"lat": lat[::-1].copy(), "lon": lon, "temp": px[::-1].copy()},
               chunks={"temp": (16, 16)}, dims={"temp": ["lat", "lon"]})
    fa, _ = netcdf_raster(str(tmp_path / "a.nc"), "temp", coords=("lat", "lon"))
    wa, _ = netcdf_raster_window(str(tmp_path / "a.nc"), "temp",
                                 (0, 0, 48, 64), coords=("lat", "lon"))
    np.testing.assert_array_equal(wa, fa)
    with pytest.raises(NotImplementedError, match="classic"):
        netcdf_raster_window(_classic_path(tmp_path), "v", (0, 0, 1, 1),
                             coords=("y", "x"))


def test_netcdf_raster_window_auto_coords(tmp_path):
    """coords=None resolves the y/x coordinate names from the
    variable's DIMENSION_LIST (object headers only) and matches the
    explicit-names path; files without the attribute raise asking for
    explicit names."""
    from rasters_ray.sources.hdf5lite import dataset_dims, write_hdf5
    from rasters_ray.sources.netcdf import netcdf_raster_window

    rng = np.random.default_rng(43)
    px = rng.normal(size=(32, 40)).astype(np.float32)
    lat = 10.0 - 0.05 * (np.arange(32) + 0.5)
    lon = 5.0 + 0.05 * (np.arange(40) + 0.5)
    p = str(tmp_path / "d.nc")
    write_hdf5(p, {"lat": lat, "lon": lon, "sst": px},
               chunks={"sst": (8, 8)}, compression="deflate",
               dims={"sst": ["lat", "lon"]})
    assert dataset_dims(p, "sst") == ["lat", "lon"]
    auto, gauto = netcdf_raster_window(p, "sst", (4, 6, 10, 12))
    expl, gexpl = netcdf_raster_window(p, "sst", (4, 6, 10, 12),
                                       coords=("lat", "lon"))
    np.testing.assert_array_equal(auto, expl)
    assert gauto.to_dict() == gexpl.to_dict()
    # no DIMENSION_LIST attached -> explicit names required
    bare = str(tmp_path / "bare.nc")
    write_hdf5(bare, {"lat": lat, "lon": lon, "sst": px})
    assert dataset_dims(bare, "sst") == [None, None]
    with pytest.raises(ValueError, match="DIMENSION_LIST"):
        netcdf_raster_window(bare, "sst", (0, 0, 4, 4))


def _classic_path(tmp_path):
    from rasters_ray.sources.netcdf import write_netcdf

    p = str(tmp_path / "c.nc")
    write_netcdf(p, {"y": 2, "x": 2},
                 {"v": {"dims": ("y", "x"),
                        "data": np.zeros((2, 2), np.float32)}})
    return p


def test_hdf5_extensible_array_roundtrip(tmp_path):
    """Extensible Array chunk index (v4 itype 4, ONE unlimited dim):
    round-trips at every structural depth — index-block-only (<=4
    chunks), direct data blocks (<=244), and super blocks (>244) —
    filtered and not, both superblock styles; the AOI window path
    prunes through it; maxdims mark dim 0 unlimited."""
    import rasters_ray.sources.hdf5lite as h5

    rng = np.random.default_rng(67)
    small = rng.normal(size=(8, 8)).astype(np.float32)     # 2 chunks
    med = rng.integers(0, 500, size=(40, 12)).astype(np.int32)  # 20 chunks
    big = rng.normal(size=(300, 6)).astype(np.float64)     # 300 chunks
    cases = [
        dict(data={"s": small}, chunks=(4, 8)),
        dict(data={"m": med}, chunks=(2, 12)),
        dict(data={"m": med}, chunks=(2, 12), compression="deflate",
             shuffle=True, fletcher32=True),
        dict(data={"b": big}, chunks=(1, 6)),
        dict(data={"b": big}, chunks=(1, 6), compression="deflate"),
    ]
    for kw in cases:
        data = kw.pop("data")
        for sb in (0, 2):
            p = str(tmp_path / f"ea_{next(iter(data))}_{sb}.h5")
            h5.write_hdf5(p, data, superblock=sb, chunk_index="extensible",
                          **kw)
            got = h5.read_hdf5(p)
            for nm, a in data.items():
                np.testing.assert_array_equal(got[f"/{nm}"], a)
    # window pruning through the EA index: 300-chunk file, 5-row AOI
    p = str(tmp_path / "ea_win.h5")
    h5.write_hdf5(p, {"b": big}, chunks=(1, 6), compression="deflate",
                  chunk_index="extensible")
    w = h5.read_hdf5_window(p, "b", (250, 2, 5, 3))
    np.testing.assert_array_equal(w, big[250:255, 2:5])
    # the dataspace carries maxdims with dim 0 unlimited
    msgs = h5._find_dataset_msgs(open(p, "rb").read(), "b")
    for t, b in msgs:
        if t == h5._MSG_DATASPACE:
            assert h5._parse_dataspace_max(b) == (h5._UNDEF, 6)


def test_hdf5_extensible_array_swizzle_and_partial(tmp_path):
    """EA element order swizzles the unlimited dim to the front: a
    hand-permuted element sequence read with unlim_dim=1 lands each
    chunk at its original offsets; unset element slots (partially
    allocated datasets) fall back to fill (zeros)."""
    import rasters_ray.sources.hdf5lite as h5

    # 3x2 chunk grid of (2, 4) chunks over (6, 8); unlim dim = 1:
    # swizzled grid is (2, 3), element e -> (c1, c0) = unravel(e, (2, 3))
    grid = (3, 2)
    cdims = (2, 4)
    addrs = {}  # element index -> fake address
    for e in range(6):
        c1, c0 = np.unravel_index(e, (2, 3))
        addrs[e] = 1000 + (int(c0) * 2) * 100 + int(c1) * 4  # offs-coded
    blob = h5._extensible_array_bytes(0, 0, [addrs[e] for e in range(6)],
                                      [32] * 6)
    out = h5._walk_extensible_array(blob, 0, grid, cdims, 32, "t",
                                    unlim_dim=1)
    assert len(out) == 6
    for offs, addr, nbytes, fmask in out:
        assert addr == 1000 + offs[0] * 100 + offs[1]
        assert nbytes == 32 and fmask == 0
    # partial allocation: writer fills only n elements; reading a
    # 20-chunk EA as a 24-chunk grid yields 20 entries (4 unset)
    blob = h5._extensible_array_bytes(0, 0, list(range(1, 21)), [16] * 20)
    out = h5._walk_extensible_array(blob, 0, (24, 1), (1, 1), 16, "t")
    assert len(out) == 20
    assert sorted(a for _o, a, _n, _f in out) == list(range(1, 21))


def test_hdf5_btree2_chunk_index_roundtrip(tmp_path):
    """v2 B-tree chunk index (v4 itype 5, MULTIPLE unlimited dims):
    single-leaf and depth-1 trees round-trip, filtered (record type 11
    with variable-size chunk sizes) and not (type 10); AOI window
    pruning works through the tree; maxdims mark every dim unlimited."""
    import rasters_ray.sources.hdf5lite as h5

    rng = np.random.default_rng(71)
    small = rng.normal(size=(12, 12)).astype(np.float32)    # 9 chunks
    big = rng.integers(0, 900, size=(80, 75)).astype(np.int32)  # 240 chunks
    cases = [
        dict(data={"s": small}, chunks=(4, 4)),
        dict(data={"s": small}, chunks=(4, 4), compression="deflate"),
        dict(data={"b": big}, chunks=(5, 5)),  # 240 > leaf capacity
        dict(data={"b": big}, chunks=(5, 5), compression="deflate",
             shuffle=True, fletcher32=True),
    ]
    for kw in cases:
        data = kw.pop("data")
        for sb in (0, 2):
            p = str(tmp_path / f"b2_{next(iter(data))}_{sb}.h5")
            h5.write_hdf5(p, data, superblock=sb, chunk_index="btree2", **kw)
            got = h5.read_hdf5(p)
            for nm, a in data.items():
                np.testing.assert_array_equal(got[f"/{nm}"], a)
    p = str(tmp_path / "b2_win.h5")
    h5.write_hdf5(p, {"b": big}, chunks=(5, 5), compression="deflate",
                  chunk_index="btree2")
    w = h5.read_hdf5_window(p, "b", (31, 42, 9, 8))
    np.testing.assert_array_equal(w, big[31:40, 42:50])
    msgs = h5._find_dataset_msgs(open(p, "rb").read(), "b")
    for t, b in msgs:
        if t == h5._MSG_DATASPACE:
            assert h5._parse_dataspace_max(b) == (h5._UNDEF, h5._UNDEF)
    # geometry sanity against the public H5B2 math: 2048-byte nodes,
    # 24-byte type-10 rank-2 records -> 84-record leaves
    max_nrec, cum_size, mns = h5._b2_geometry(2048, 24, 1)
    assert max_nrec[0] == 84 and mns == 1
