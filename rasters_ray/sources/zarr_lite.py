"""Minimal pure-Python Zarr v2 store reader/writer — no zarr library.

Parity/usefulness target: modern geo archives increasingly publish
chunked arrays as Zarr stores; the PUBLIC Zarr v2 spec is small (JSON
``.zarray`` metadata + raw/zlib-compressed C-order chunk files named
``i.j``), so this module implements the subset the engine needs:

- ``read_zarr``: directory store; groups (``.zgroup``) with array
  members; 1D/2D arrays; any numpy dtype string; ``compressor`` null or
  ``{"id": "zlib"}``; ``fill_value`` for missing chunk files; the
  xarray ``_ARRAY_DIMENSIONS`` attribute convention for dimension
  names. Blosc/other codecs raise NotImplementedError with the
  remediation (rewrite with compressor=zlib or none).
- ``write_zarr``: the same subset (used by round-trip tests and as an
  interchange sink readable by real zarr/xarray elsewhere).
- ``zarr_raster``: CF-style (array, GridSpec) extraction — 2D variable
  + 1D coordinate arrays named by ``_ARRAY_DIMENSIONS`` — mirroring
  ``netcdf_raster`` (same regular-spacing validation, same north-up
  flip for ascending latitude axes).
"""

from __future__ import annotations

import json
import os
import zlib
from typing import Dict, Optional, Tuple

import numpy as np

from ..grids import GridSpec


def _check_meta(meta: dict) -> None:
    if meta.get("zarr_format") != 2:
        raise NotImplementedError(
            f"zarr_format {meta.get('zarr_format')}: only v2 supported"
        )
    comp = meta.get("compressor")
    if comp is not None and comp.get("id") != "zlib":
        raise NotImplementedError(
            f"zarr compressor {comp.get('id')!r} unsupported in this "
            "environment; rewrite with zlib or no compression"
        )
    if meta.get("filters"):
        raise NotImplementedError("zarr filters unsupported")
    if meta.get("order", "C") != "C":
        raise NotImplementedError("only C-order zarr chunks supported")


def _read_array(adir: str) -> Tuple[np.ndarray, dict]:
    meta = json.load(open(os.path.join(adir, ".zarray")))
    _check_meta(meta)
    comp = meta.get("compressor")
    shape = tuple(meta["shape"])
    chunks = tuple(meta["chunks"])
    dt = np.dtype(meta["dtype"])
    fill = meta.get("fill_value")
    fill = 0 if fill is None else fill
    grid_counts = [-(-s // c) for s, c in zip(shape, chunks)]
    # Sparse-store guard: a planetary-quadtree sink (write_zarr_tiles)
    # declares a huge logical shape with few chunks present; allocating
    # it here would OOM. Real-extent rasters (mostly-present chunks, or
    # small arrays) pass untouched.
    logical_bytes = int(np.prod(shape, dtype=np.int64)) * dt.itemsize
    if logical_bytes > 256 * 1024 * 1024:
        n_grid = int(np.prod(grid_counts, dtype=np.int64))
        n_present = sum(
            1 for nm in os.listdir(adir)
            if nm.split(".") and all(p.isdigit() for p in nm.split("."))
        )
        if n_present < n_grid // 2:
            raise ValueError(
                f"zarr array at {adir} declares "
                f"{logical_bytes / 2**30:.1f} GiB logical shape {shape} but "
                f"only {n_present}/{n_grid} chunks are present — a sparse "
                "store; use list_zarr_chunks + read_zarr_chunk to stream "
                "chunks instead of materializing the logical array"
            )
    out = np.full(shape, fill, dtype=dt)
    attrs = {}
    zattrs = os.path.join(adir, ".zattrs")
    if os.path.exists(zattrs):
        attrs = json.load(open(zattrs))
    for idx in np.ndindex(*grid_counts):
        name = ".".join(str(i) for i in idx)
        p = os.path.join(adir, name)
        if not os.path.exists(p):
            continue  # missing chunk = fill_value per spec
        raw = open(p, "rb").read()
        if comp is not None:
            raw = zlib.decompress(raw)
        block = np.frombuffer(raw, dtype=dt).reshape(chunks)
        sl = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, shape)
        )
        out[sl] = block[tuple(slice(0, x.stop - x.start) for x in sl)]
    return out, attrs


def read_zarr(path: str) -> Dict[str, Dict]:
    """Store directory -> {name: {"data": array, "dims": [...],
    "attrs": {...}}}.  Accepts a bare array store or a group store."""
    if os.path.exists(os.path.join(path, ".zarray")):
        arr, attrs = _read_array(path)
        return {os.path.basename(path.rstrip("/")): {
            "data": arr, "dims": attrs.get("_ARRAY_DIMENSIONS", []),
            "attrs": attrs}}
    if not os.path.exists(os.path.join(path, ".zgroup")):
        raise ValueError(f"not a zarr v2 store (no .zgroup/.zarray): {path}")
    out: Dict[str, Dict] = {}
    for name in sorted(os.listdir(path)):
        adir = os.path.join(path, name)
        if os.path.isdir(adir) and os.path.exists(os.path.join(adir, ".zarray")):
            arr, attrs = _read_array(adir)
            out[name] = {"data": arr,
                         "dims": attrs.get("_ARRAY_DIMENSIONS", []),
                         "attrs": attrs}
    return out


def write_zarr(path: str, arrays: Dict[str, Dict], chunks: int = 64,
               compress: bool = True) -> str:
    """{name: {"data": ndarray, "dims": [names]}} -> group store."""
    os.makedirs(path, exist_ok=True)
    json.dump({"zarr_format": 2}, open(os.path.join(path, ".zgroup"), "w"))
    for name, spec in arrays.items():
        a = np.ascontiguousarray(spec["data"])
        adir = os.path.join(path, name)
        os.makedirs(adir, exist_ok=True)
        ch = tuple(min(chunks, s) for s in a.shape)
        meta = {
            "zarr_format": 2,
            "shape": list(a.shape),
            "chunks": list(ch),
            "dtype": a.dtype.str,
            "compressor": {"id": "zlib", "level": 6} if compress else None,
            "fill_value": 0,
            "filters": None,
            "order": "C",
        }
        json.dump(meta, open(os.path.join(adir, ".zarray"), "w"))
        attrs = dict(spec.get("attrs") or {})
        dims = spec.get("dims") or []
        if dims:
            attrs["_ARRAY_DIMENSIONS"] = list(dims)
        if attrs:
            json.dump(attrs, open(os.path.join(adir, ".zattrs"), "w"))
        grid_counts = [-(-s // c) for s, c in zip(a.shape, ch)]
        for idx in np.ndindex(*grid_counts):
            sl = tuple(slice(i * c, min((i + 1) * c, s))
                       for i, c, s in zip(idx, ch, a.shape))
            block = np.zeros(ch, dtype=a.dtype)
            view = a[sl]
            block[tuple(slice(0, v) for v in view.shape)] = view
            raw = block.tobytes()
            if compress:
                raw = zlib.compress(raw, 6)
            open(os.path.join(adir, ".".join(str(i) for i in idx)), "wb").write(raw)
    return path


def zarr_raster(path: str, var: Optional[str] = None) -> Tuple[np.ndarray, GridSpec]:
    """CF-style 2D variable + 1D coordinate arrays -> (array, GridSpec),
    mirroring netcdf_raster (regular spacing validated; ascending
    latitude flipped north-up)."""
    store = read_zarr(path)
    if var is None:
        two_d = [k for k, v in store.items() if v["data"].ndim == 2]
        if len(two_d) != 1:
            raise ValueError(
                f"zarr store has {len(two_d)} 2D arrays {two_d}; pass var="
            )
        var = two_d[0]
    v = store[var]
    a = v["data"]
    if a.ndim != 2:
        raise ValueError(f"{var} is not 2D: shape {a.shape}")
    crs = str(v["attrs"].get("crs", "EPSG:4326"))
    dims = v["dims"] or []
    if len(dims) != 2 or any(d not in store for d in dims):
        # coordinate-less store (e.g. a bare .zarray array): unit pixel
        # grid, mirroring open_raster's behavior for bare images
        return np.ascontiguousarray(a), GridSpec(
            crs=crs, x_origin=0.0, y_origin=0.0, cell_width=1.0,
            cell_height=-1.0, rows=a.shape[0], cols=a.shape[1],
        )
    ydim, xdim = dims
    from .netcdf import grid_from_coords

    return grid_from_coords(
        a, store[ydim]["data"], store[xdim]["data"], crs
    )


def write_zarr_tiles(tiles, path: str, level: int, tile_size: int,
                     dtype: str = "<f4", compress: bool = True,
                     fill_value: float = 0.0, overwrite: bool = True) -> int:
    """Engine tile table -> ONE logical Zarr v2 array written in
    PARALLEL: each worker writes its tiles as independent chunk files
    (``iy.ix``) straight into the store — the cloud-native pattern Zarr
    exists for (chunks are standalone objects; no coordination, no
    shuffle, resumable by construction since a re-run overwrites the
    same chunk names idempotently). The driver writes only the
    ``.zarray`` metadata; missing chunks read back as ``fill_value``.

    ``tiles`` is a Ray Dataset or pyarrow Table with TILES_SCHEMA
    columns (cell_key, bytes, fmt, th, tw); the world quadtree cell at
    ``level`` becomes chunk (iy, ix) of the (2^level * tile_size)^2
    array. Expects one tile per cell (composite first); returns the
    tile count."""
    import pyarrow as pa_mod

    from .. import codec
    from ..grids.cellkey import decode as _cell_decode

    import shutil

    n = 1 << level
    if overwrite and os.path.exists(path):
        shutil.rmtree(path)  # stale chunks from a prior layout would
        # otherwise survive the metadata rewrite and corrupt readback
    os.makedirs(path, exist_ok=True)
    json.dump({"zarr_format": 2}, open(os.path.join(path, ".zgroup"), "w"))
    adir = os.path.join(path, "tiles")
    os.makedirs(adir, exist_ok=True)
    dt = np.dtype(dtype)
    meta = {
        "zarr_format": 2,
        "shape": [n * tile_size, n * tile_size],
        "chunks": [tile_size, tile_size],
        "dtype": dt.str,
        "compressor": {"id": "zlib", "level": 6} if compress else None,
        "fill_value": fill_value,
        "filters": None,
        "order": "C",
    }
    json.dump(meta, open(os.path.join(adir, ".zarray"), "w"))

    def write_batch(t: pa_mod.Table) -> pa_mod.Table:
        blobs = codec.BlobReader(t.column("bytes"))  # zero-copy slices
        fmts = t.column("fmt").to_pylist()
        keys = t.column("cell_key").to_numpy(zero_copy_only=False)
        written = []
        for i in range(t.num_rows):
            arr = codec.decode(blobs[i], fmts[i])
            block = np.full((tile_size, tile_size), fill_value, dtype=dt)
            block[: arr.shape[0], : arr.shape[1]] = arr[:tile_size, :tile_size]
            lvl, ix, iy = (int(v) for v in _cell_decode(int(keys[i])))
            if lvl != level:
                raise ValueError(
                    f"tile cell_key level {lvl} != sink level {level}; "
                    "chunk indices would fall outside the declared grid"
                )
            raw = block.tobytes()
            if compress:
                raw = zlib.compress(raw, 6)
            # atomic per chunk (unique temp per writer: duplicate keys
            # cannot interleave into a torn file); idempotent re-runs
            p = os.path.join(adir, f"{iy}.{ix}")
            tmp = f"{p}.{os.getpid()}.tmp"
            with open(tmp, "wb") as f:
                f.write(raw)
            os.replace(tmp, p)
            written.append(int(keys[i]))
        return pa_mod.table({"cell_key": pa_mod.array(written, pa_mod.int64())})

    if isinstance(tiles, pa_mod.Table):
        return write_batch(tiles).num_rows
    return int(tiles.map_batches(write_batch, batch_format="pyarrow").count())


def read_zarr_chunk(store: str, array: str, idx: Tuple[int, ...]) -> np.ndarray:
    """Read ONE chunk of a store array without materializing the logical
    array (read_zarr allocates the FULL declared shape — fine for real
    extents, catastrophic for a sparse planetary-quadtree sink where the
    logical array is huge and chunks are few). Missing chunks return a
    fill_value block per spec."""
    adir = os.path.join(store, array)
    meta = json.load(open(os.path.join(adir, ".zarray")))
    _check_meta(meta)  # same codec/order/filters rules as read_zarr
    chunks = tuple(meta["chunks"])
    dt = np.dtype(meta["dtype"])
    fill = meta.get("fill_value")
    p = os.path.join(adir, ".".join(str(i) for i in idx))
    if not os.path.exists(p):
        return np.full(chunks, 0 if fill is None else fill, dtype=dt)
    raw = open(p, "rb").read()
    if meta.get("compressor") is not None:
        raw = zlib.decompress(raw)
    # copy: consistent writable result on both present/missing paths
    return np.frombuffer(raw, dtype=dt).reshape(chunks).copy()


def list_zarr_chunks(store: str, array: str) -> list:
    """Sorted chunk index tuples present on disk for one store array."""
    adir = os.path.join(store, array)
    out = []
    for name in os.listdir(adir):
        parts = name.split(".")
        if not parts or not all(p.isdigit() for p in parts):
            continue  # metadata files and .tmp leftovers from killed writers
        out.append(tuple(int(v) for v in parts))
    return sorted(out)
