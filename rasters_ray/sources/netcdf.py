"""NetCDF classic (CDF-1/CDF-2) reader + writer — pure Python.

Parity target: the reference's netcdf branch of ``Raster.open``
(raster.py:634-771 reads NetCDF subdatasets via rasterio/GDAL). No
netcdf/h5/scipy library ships in this container, but the CLASSIC NetCDF
format is a simple, fully public spec (Unidata "NetCDF Classic Format
Specification"): big-endian header with dim/attr/var lists + flat data
section. This module implements it directly:

- ``read_netcdf``: both magic versions (CDF-1 32-bit offsets, CDF-2
  64-bit), fixed and record variables, all six external types;
- ``write_netcdf``: CDF-2 writer (fixed variables + attributes) used by
  round-trip tests and as an export sink;
- ``netcdf_raster``: CF-style extraction of a 2D variable + its 1D
  coordinate variables into (array, GridSpec) — the engine's ingest
  hook (regular lat/lon spacing required, validated);
- ``netcdf_dataset``: Ray Data source — files decode ON WORKERS via
  ``map_batches`` (one row per (file, var) image, IMAGES-schema
  compatible), so ingest streams like every other source.

NetCDF-4 (HDF5 container) files route through ``hdf5lite`` — a pure-spec
reader covering contiguous, compact and chunked datasets with the
deflate/shuffle/fletcher32 filter stack (the layout real NASA granules
use); szip/nbit-filtered datasets raise NotImplementedError there with
the remediation.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from .. import codec
from ..grids import GridSpec

_ABSENT = (0, 0)
_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

_TYPES = {
    1: np.dtype(">i1"),  # byte
    2: np.dtype("S1"),   # char
    3: np.dtype(">i2"),  # short
    4: np.dtype(">i4"),  # int
    5: np.dtype(">f4"),  # float
    6: np.dtype(">f8"),  # double
}
_TYPE_OF = {np.dtype(k): v for v, k in
            [(1, "i1"), (3, "i2"), (4, "i4"), (5, "f4"), (6, "f8")]}


def _pad4(n: int) -> int:
    return (4 - n % 4) % 4


class _Reader:
    def __init__(self, data: bytes):
        self.d = memoryview(data)
        self.p = 0

    def u32(self) -> int:
        (v,) = struct.unpack(">I", self.d[self.p : self.p + 4])
        self.p += 4
        return v

    def u64(self) -> int:
        (v,) = struct.unpack(">Q", self.d[self.p : self.p + 8])
        self.p += 8
        return v

    def name(self) -> str:
        n = self.u32()
        s = bytes(self.d[self.p : self.p + n]).decode("utf-8")
        self.p += n + _pad4(n)
        return s

    def values(self, nc_type: int, n: int):
        dt = _TYPES[nc_type]
        nbytes = dt.itemsize * n
        raw = bytes(self.d[self.p : self.p + nbytes])
        self.p += nbytes + _pad4(nbytes)
        if nc_type == 2:
            return raw.decode("utf-8", "replace")
        return np.frombuffer(raw, dtype=dt).copy()

    def tagged_count(self) -> int:
        tag = self.u32()
        n = self.u32()
        if (tag, n) == _ABSENT:
            return 0
        return n


def read_netcdf(path_or_bytes) -> Dict:
    """{dims: {name: len}, attrs: {...}, vars: {name: {data, dims,
    attrs}}} — record dimension resolved to its actual length."""
    data = (
        path_or_bytes
        if isinstance(path_or_bytes, (bytes, memoryview))
        else open(path_or_bytes, "rb").read()
    )
    data = bytes(data)
    if data[:8] == b"\x89HDF\r\n\x1a\n":
        # NetCDF-4 = HDF5 container. The env has no HDF5 library, but
        # hdf5lite reads the contiguous/compact/chunked subset of the
        # public spec with deflate/shuffle/fletcher32 filters; szip/nbit
        # datasets raise NotImplementedError there with the remediation.
        from .hdf5lite import read_hdf5_info

        dsets = read_hdf5_info(data)
        vars_out: Dict[str, Dict] = {}
        resolved: Dict[str, list] = {}
        dim_len: Dict[str, int] = {}
        for full, info in dsets.items():
            nm = full.rsplit("/", 1)[-1]
            if nm in vars_out:
                # two groups with same-named datasets would silently
                # overwrite each other under leaf-name flattening
                raise ValueError(
                    f"HDF5 file has duplicate leaf dataset name {nm!r} "
                    f"(at {full!r} and elsewhere); open it with "
                    "hdf5lite.read_hdf5 and address datasets by full path"
                )
            vars_out[nm] = {"data": info["data"], "dims": [], "attrs": {}}
            # DIMENSION_LIST (real NetCDF-4 granules carry it) names the
            # axes authoritatively; store leaf names of the referenced
            # coordinate datasets, None where unnamed
            resolved[nm] = [
                d.rsplit("/", 1)[-1] if d else None for d in info["dims"]
            ]
        # fallback for axes without DIMENSION_LIST: name after the 1D
        # dataset of matching length ONLY when unambiguous (exactly one
        # candidate not already used for an earlier axis) — a square
        # grid would otherwise silently corrupt the georeferencing
        onedim: Dict[int, list] = {}
        for nm, v in vars_out.items():
            if v["data"].ndim == 1:
                onedim.setdefault(v["data"].shape[0], []).append(nm)
        for nm, v in vars_out.items():
            dims = []
            for i, s in enumerate(v["data"].shape):
                named = resolved[nm][i]
                if named is not None:
                    dn = named
                elif v["data"].ndim == 1:
                    dn = nm
                else:
                    cands = [c for c in onedim.get(s, []) if c not in dims]
                    dn = cands[0] if len(cands) == 1 else f"phony_dim_{i}_{s}"
                dims.append(dn)
                dim_len[dn] = s
            v["dims"] = dims
        return {"dims": dim_len, "attrs": {}, "vars": vars_out}
    if data[:3] != b"CDF" or data[3] not in (1, 2):
        raise ValueError("not a classic NetCDF (CDF-1/CDF-2) file")
    version = data[3]
    r = _Reader(data)
    r.p = 4
    numrecs = r.u32()

    dims: List[Tuple[str, int]] = []
    for _ in range(r.tagged_count()):
        dims.append((r.name(), r.u32()))

    def attr_block() -> Dict:
        out = {}
        for _ in range(r.tagged_count()):
            nm = r.name()
            t = r.u32()
            n = r.u32()
            out[nm] = r.values(t, n)
        return out

    gattrs = attr_block()
    variables = []
    for _ in range(r.tagged_count()):
        nm = r.name()
        nd = r.u32()
        dimids = [r.u32() for _ in range(nd)]
        vattrs = attr_block()
        t = r.u32()
        vsize = r.u32()
        begin = r.u64() if version == 2 else r.u32()
        variables.append((nm, dimids, vattrs, t, vsize, begin))

    rec_dim = next((i for i, (_, ln) in enumerate(dims) if ln == 0), None)
    out_vars: Dict[str, Dict] = {}
    # record variables interleave per record with a common stride: the sum
    # of each record var's per-record slab, 4-byte padded — except a SOLE
    # record variable, whose records pack contiguously unpadded (spec rule)
    rec_vars = [v for v in variables if rec_dim is not None and v[1][:1] == [rec_dim]]

    def _slab(dimids, t) -> int:
        return _TYPES[t].itemsize * int(np.prod([dims[d][1] for d in dimids[1:]] or [1]))

    if len(rec_vars) == 1:
        recsize = _slab(rec_vars[0][1], rec_vars[0][3])
    else:
        recsize = sum(s + _pad4(s) for s in
                      (_slab(dimids, t) for (_, dimids, _, t, _, _) in rec_vars))
    for nm, dimids, vattrs, t, vsize, begin in variables:
        dt = _TYPES[t]
        shape = [dims[d][1] for d in dimids]
        is_rec = rec_dim is not None and dimids[:1] == [rec_dim]
        if is_rec:
            shape = shape.copy()
            shape[0] = numrecs
            per_rec = int(np.prod(shape[1:] or [1]))
            arr = np.empty(shape, dtype=dt.newbyteorder("="))
            step = recsize if len(rec_vars) > 1 else dt.itemsize * per_rec
            for rec in range(numrecs):
                off = begin + rec * step
                arr[rec] = np.frombuffer(
                    data[off : off + dt.itemsize * per_rec], dtype=dt
                ).reshape(shape[1:] or ())
        else:
            count = int(np.prod(shape or [1]))
            arr = (
                np.frombuffer(data[begin : begin + dt.itemsize * count], dtype=dt)
                .reshape(shape or ())
                .astype(dt.newbyteorder("="))
            )
        if t == 2:
            arr = arr.astype("S1")
        out_vars[nm] = {"data": arr, "dims": [dims[d][0] for d in dimids],
                       "attrs": vattrs}
    return {
        "dims": {nm: (numrecs if ln == 0 else ln) for nm, ln in dims},
        "attrs": gattrs,
        "vars": out_vars,
    }


def write_netcdf(path: str, dims: Dict[str, int], variables: Dict[str, Dict],
                 attrs: Optional[Dict] = None) -> str:
    """CDF-2 writer: fixed AND record variables. ``variables`` = {name:
    {"data": ndarray, "dims": [dim names], "attrs": {...}}}. A dim with
    length None (or 0) is the UNLIMITED/record dimension; variables
    whose first dim is the record dim interleave per record (4-padded
    slabs, or contiguous unpadded for a sole record variable — the
    spec rule the reader mirrors), and numrecs comes from their data's
    first axis."""
    dim_names = list(dims)
    rec_name = next((nm for nm in dim_names if not dims[nm]), None)

    def is_rec_var(spec) -> bool:
        return rec_name is not None and (spec["dims"][:1] or [None])[0] == rec_name

    numrecs = 0
    for nm, spec in variables.items():
        if is_rec_var(spec):
            n = int(np.asarray(spec["data"]).shape[0])
            if numrecs and n != numrecs:
                raise ValueError(
                    f"record variables disagree on record count: {nm} has "
                    f"{n}, earlier ones {numrecs}")
            numrecs = n

    def enc_name(s: str) -> bytes:
        b = s.encode("utf-8")
        return struct.pack(">I", len(b)) + b + b"\x00" * _pad4(len(b))

    def enc_attrs(a: Dict) -> bytes:
        if not a:
            return struct.pack(">II", 0, 0)
        out = struct.pack(">II", _NC_ATTRIBUTE, len(a))
        for k, v in a.items():
            out += enc_name(k)
            if isinstance(v, str):
                raw = v.encode("utf-8")
                out += struct.pack(">II", 2, len(raw)) + raw + b"\x00" * _pad4(len(raw))
            else:
                arr = np.atleast_1d(np.asarray(v))
                t = _TYPE_OF[arr.dtype.newbyteorder("=")]
                raw = arr.astype(_TYPES[t]).tobytes()
                out += struct.pack(">II", t, arr.size) + raw + b"\x00" * _pad4(len(raw))
        return out

    header = b"CDF\x02" + struct.pack(">I", numrecs)
    header += struct.pack(">II", _NC_DIMENSION, len(dims))
    for nm in dim_names:
        header += enc_name(nm) + struct.pack(">I", dims[nm] or 0)
    header += enc_attrs(attrs or {})

    # two passes: sizes first (begin offsets depend on header length).
    # Fixed variables first (their data precedes the record section);
    # record vars carry their padded PER-RECORD slab as vsize.
    var_items = []
    for nm, spec in sorted(variables.items(),
                           key=lambda kv: is_rec_var(kv[1])):
        arr = np.asarray(spec["data"])
        t = _TYPE_OF[arr.dtype.newbyteorder("=")]
        if is_rec_var(spec):
            slab = _TYPES[t].itemsize * int(np.prod(arr.shape[1:] or (1,)))
            vsize = slab + _pad4(slab)
        else:
            vsize = arr.size * _TYPES[t].itemsize
            vsize += _pad4(vsize)
        var_items.append((nm, spec, arr, t, vsize))
    rec_items = [it for it in var_items if is_rec_var(it[1])]
    sole_rec = len(rec_items) == 1

    def var_block(begin_by_name: Dict[str, int]) -> bytes:
        out = struct.pack(">II", _NC_VARIABLE, len(var_items))
        for nm, spec, arr, t, vsize in var_items:
            out += enc_name(nm) + struct.pack(">I", len(spec["dims"]))
            for dn in spec["dims"]:
                out += struct.pack(">I", dim_names.index(dn))
            out += enc_attrs(spec.get("attrs") or {})
            out += struct.pack(">II", t, vsize)
            out += struct.pack(">Q", begin_by_name.get(nm, 0))
        return out

    probe = header + var_block({})
    begin = len(probe)
    begins = {}
    for nm, spec, _, _, vsize in var_items:
        if is_rec_var(spec):
            continue
        begins[nm] = begin
        begin += vsize
    rec_start = begin
    for nm, spec, arr, t, vsize in rec_items:
        begins[nm] = begin
        slab = _TYPES[t].itemsize * int(np.prod(arr.shape[1:] or (1,)))
        begin += slab if sole_rec else slab + _pad4(slab)
    body = header + var_block(begins)
    with open(path, "wb") as f:
        f.write(body)
        for nm, spec, arr, t, vsize in var_items:
            if is_rec_var(spec):
                continue
            raw = arr.astype(_TYPES[t]).tobytes()
            f.write(raw + b"\x00" * (vsize - len(raw)))
        # record section: records interleave across record variables,
        # each slab 4-padded (sole record var: contiguous, unpadded)
        for rec in range(numrecs):
            for nm, spec, arr, t, vsize in rec_items:
                # np.asarray: a 1-D record var indexes to a SCALAR, and
                # numpy scalars silently drop the big-endian byte order
                raw = np.asarray(arr[rec]).astype(_TYPES[t]).tobytes()
                f.write(raw if sole_rec else raw + b"\x00" * _pad4(len(raw)))
    return path


def grid_from_coords(a: np.ndarray, y: np.ndarray, x: np.ndarray,
                     crs: str = "EPSG:4326") -> Tuple[np.ndarray, GridSpec]:
    """CF coordinate arrays -> (north-up array, GridSpec): regular
    spacing validated (1e-9 relative), ascending latitude flipped
    north-up, half-cell origin shift. Shared by the NetCDF and Zarr
    readers so the rules cannot diverge."""
    y = np.asarray(y, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    for c, nm in ((x, "x"), (y, "y")):
        d = np.diff(c)
        if len(d) and not np.allclose(d, d[0], rtol=1e-9, atol=1e-12):
            raise ValueError(f"coordinate {nm} is not regularly spaced")
    cw = float(x[1] - x[0]) if len(x) > 1 else 1.0
    ch = float(y[1] - y[0]) if len(y) > 1 else -1.0
    if ch > 0:
        # ascending latitude axis (CF allows either): flip to north-up
        a = a[::-1]
        y = y[::-1]
        ch = -ch
    grid = GridSpec(
        crs=crs,
        x_origin=float(x[0]) - cw / 2.0,
        y_origin=float(y[0]) - ch / 2.0,
        cell_width=cw,
        cell_height=ch,
        rows=a.shape[0],
        cols=a.shape[1],
    )
    return np.ascontiguousarray(a), grid


def cf_unpack(a: np.ndarray, attrs: Dict) -> np.ndarray:
    """CF packed-data conventions, the way xarray/rasterio apply them:
    raw values equal to ``_FillValue``/``missing_value`` become NaN,
    then ``scale_factor``/``add_offset`` unpack (result float64 when any
    of the four attributes is present; untouched otherwise). Real
    granules almost always ship int16 + scale/offset/_FillValue."""
    def _num(key):
        v = attrs.get(key)
        if v is None:
            return None
        arr = np.asarray(v).ravel()
        return float(arr[0]) if arr.size else None

    scale = _num("scale_factor")
    offset = _num("add_offset")
    fills = [f for f in (_num("_FillValue"), _num("missing_value"))
             if f is not None]
    if scale is None and offset is None and not fills:
        return a
    out = a.astype(np.float64)
    for f in fills:
        if np.isnan(f):
            continue  # NaN fill is already the invalid marker
        out[a == np.asarray(f).astype(a.dtype)] = np.nan
    if scale is not None:
        out = out * scale
    if offset is not None:
        out = out + offset
    return out


def netcdf_raster(path_or_bytes, var: str,
                  coords: Optional[Tuple[str, str]] = None) -> Tuple[np.ndarray, GridSpec]:
    """CF-style 2D variable + 1D coordinate vars -> (array, GridSpec).
    Coordinates must be regularly spaced (validated to 1e-9 relative).
    ``path_or_bytes`` may also be an already-parsed ``read_netcdf`` dict
    (avoids double-parsing on ingest hot paths); ``coords=(y, x)``
    overrides coordinate-variable inference when dimension names are
    ambiguous (e.g. square NetCDF-4 grids without DIMENSION_LIST)."""
    nc = (path_or_bytes if isinstance(path_or_bytes, dict)
          else read_netcdf(path_or_bytes))
    v = nc["vars"][var]
    a = cf_unpack(v["data"], v.get("attrs") or {})
    if a.ndim != 2:
        raise ValueError(f"{var} is not 2D: shape {a.shape}")
    ydim, xdim = coords if coords is not None else v["dims"]
    for dn in (ydim, xdim):
        if dn not in nc["vars"]:
            raise ValueError(
                f"no coordinate variable for dimension {dn!r} of {var!r}; "
                "pass coords=(y_name, x_name) to disambiguate"
            )
    y = nc["vars"][ydim]["data"].astype(np.float64)
    x = nc["vars"][xdim]["data"].astype(np.float64)
    crs = "EPSG:4326"
    ga = nc["attrs"].get("crs")
    if isinstance(ga, str):
        crs = ga
    return grid_from_coords(a, y, x, crs)


def netcdf_dataset(paths: List[str], var: str, fmt: str = "npy"):
    """Ray Data source: one image row per file, decoded ON WORKERS (the
    ingest streams; the driver only ships the path list)."""
    import pyarrow as pa

    import ray.data as rd

    from .images import GRID_STRUCT

    def load(batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
        grids = []
        for p in batch.column("path").to_pylist():
            arr, grid = netcdf_raster(p, var)
            a32 = arr.astype(np.float32)
            out["image_id"].append(os.path.splitext(os.path.basename(p))[0])
            out["bytes"].append(codec.encode(a32, fmt))
            out["w"].append(grid.cols)
            out["h"].append(grid.rows)
            out["fmt"].append(fmt)
            out["caption"].append(f"netcdf:{var}")
            out["phash"].append(0)
            grids.append({k: v for k, v in grid.to_dict().items() if k != "type"})
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "bytes": pa.array(out["bytes"], pa.binary()),
                "w": pa.array(out["w"], pa.int32()),
                "h": pa.array(out["h"], pa.int32()),
                "fmt": pa.array(out["fmt"], pa.string()),
                "caption": pa.array(out["caption"], pa.string()),
                "phash": pa.array(out["phash"], pa.int64()),
                "grid": pa.array(grids, GRID_STRUCT),
            }
        )

    items = rd.from_items([{"path": p} for p in paths])
    return items.map_batches(load, batch_format="pyarrow")


def netcdf_raster_window(path: str, var: str,
                         window: Tuple[int, int, int, int],
                         coords: Optional[Tuple[str, str]] = None,
                         crs: str = "EPSG:4326",
                         ) -> Tuple[np.ndarray, "GridSpec"]:
    """AOI read of a CF raster FROM AN HDF5/NetCDF-4 GRANULE without
    decoding the rest of it: the 2D variable window comes through
    ``hdf5lite.read_hdf5_window`` (only intersecting chunks defilter),
    the 1D coordinate variables are read whole (tiny) and sliced, and
    ``grid_from_coords`` applies the same regular-spacing/north-up
    rules as the full reader. ``window`` is (row_off, col_off, height,
    width) in the FILE's array order (clamped). ``coords=(y_name,
    x_name)`` overrides the default: the variable's netCDF-4
    DIMENSION_LIST attribute, resolved from object headers only
    (``hdf5lite.dataset_dims`` — still no data decode outside the
    window; files lacking the attribute need the explicit names).
    Classic CDF files decode fully anyway — use ``netcdf_raster`` +
    slicing there."""
    with open(path, "rb") as fh:
        magic = fh.read(8)
    if magic != b"\x89HDF\r\n\x1a\n":
        raise NotImplementedError(
            "netcdf_raster_window reads HDF5/NetCDF-4 containers; classic "
            "CDF files decode fully — use netcdf_raster and slice")
    from .hdf5lite import dataset_dims, read_hdf5_window

    if coords is None:
        dims = dataset_dims(path, var)
        if len(dims) != 2 or None in dims:
            raise ValueError(
                f"{var}: DIMENSION_LIST does not name a coordinate dataset "
                f"per axis (got {dims}); pass coords=(y_name, x_name)")
        coords = (dims[0], dims[1])

    big = 1 << 60  # full-extent (off, len) request; the reader clamps
    y = read_hdf5_window(path, coords[0], ((0, big),))
    x = read_hdf5_window(path, coords[1], ((0, big),))
    r0 = max(0, min(int(window[0]), len(y)))
    c0 = max(0, min(int(window[1]), len(x)))
    a = read_hdf5_window(path, var, window)
    if a.ndim != 2:
        raise ValueError(f"{var} is not 2D: shape {a.shape}")
    return grid_from_coords(a, y[r0:r0 + a.shape[0]],
                            x[c0:c0 + a.shape[1]], crs)
