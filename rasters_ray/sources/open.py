"""``open_raster`` — the engine's ``Raster.open`` router.

Parity target: the reference's single entry point ``Raster.open``
(raster.py:634-771) accepts any rasterio-readable path and dispatches
by driver. Without GDAL, dispatch here is by MAGIC BYTES over the
formats the engine reads natively:

- TIFF / GeoTIFF (``II*\\0`` / ``MM\\0*``)      -> sources.geotiff
- classic NetCDF (``CDF1``/``CDF2``)           -> sources.netcdf
- NetCDF-4 / HDF5 (``\\x89HDF``)               -> sources.netcdf (via
  hdf5lite: contiguous/compact/chunked with the deflate/shuffle/
  fletcher32 stack; AOI reads via ``hdf5lite.read_hdf5_window``)
- Zarr v2 store DIRECTORY (``.zgroup``/``.zarray``) -> sources.zarr_lite
- GeoPackage (``SQLite format 3`` magic)       -> sources.geopackage
  (``var`` selects the tile table when several exist)
- PNG (``\\x89PNG``) / baseline JPEG / npy     -> pixel decode, georef
  from an ESRI world-file sidecar when present (else unit grid)
- SRTM ``.hgt`` (headerless; routed by EXTENSION) -> sources.srtm,
  georeferenced by the N37W105-style filename convention
- raw binary + ``.hdr`` sidecar (``.bil/.bip/.bsq/.flt/.raw``; routed
  by EXTENSION) -> sources.rawbin (ESRI EHdr and ENVI dialects)

``raster_dataset`` lifts the router to a streaming Ray ingest: one
IMAGES-schema row per file, decoded ON WORKERS (the driver ships only
the path list) — mixed-format directories stream through one pipeline.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from .. import codec
from ..grids import GridSpec

_WORLD_EXT = {".png": ".pgw", ".jpg": ".jgw", ".jpeg": ".jgw", ".npy": ".npw",
              ".tif": ".tfw", ".tiff": ".tfw"}


def _sidecar_grid(path: str, rows: int, cols: int) -> GridSpec:
    base, ext = os.path.splitext(path)
    wf = base + _WORLD_EXT.get(ext.lower(), ".wld")
    crs = "EPSG:4326"
    # .prj (WKT, the GDAL/ESRI convention — resolved lazily by the
    # engine's authority parser) wins over the engine's .crs shorthand
    for sc in (base + ".prj", base + ".crs"):
        if os.path.exists(sc):
            crs = open(sc).read().strip()
            break
    if os.path.exists(wf):
        vals = [float(v) for v in open(wf).read().split()[:6]]
        cw, _, _, ch, cx, cy = vals
        return GridSpec(
            crs=crs, x_origin=cx - cw / 2.0, y_origin=cy - ch / 2.0,
            cell_width=cw, cell_height=ch, rows=rows, cols=cols,
        )
    # no georeferencing: unit pixel grid (the reference's behavior for
    # bare images is an identity transform)
    return GridSpec(crs=crs, x_origin=0.0, y_origin=0.0, cell_width=1.0,
                    cell_height=-1.0, rows=rows, cols=cols)


def _crs_from_geokeys(gk, ascii_params: str = "") -> str:
    """GeoKeyDirectory -> CRS string: ProjectedCSType (3072) wins —
    32767 (user-defined) resolves through the PCSCitation (3073) slice
    of GeoAsciiParams (how the engine's writer records proj4-only
    CRSs) — else GeographicType (2048), else WGS84."""
    gk = [int(v) for v in gk]
    crs = "EPSG:4326"
    cite = None
    for i in range(4, len(gk) - 3, 4):
        key, loc, cnt, val = gk[i : i + 4]
        if key == 3073 and loc != 0:
            cite = ascii_params[val : val + cnt].rstrip("|")
    for i in range(4, len(gk) - 3, 4):
        key, loc, _cnt, val = gk[i : i + 4]
        if key == 3072 and loc == 0:
            if val == 32767:
                if cite:
                    return cite
                raise ValueError(
                    "GeoTIFF has a user-defined projected CRS with no "
                    "PCSCitation; cannot georeference")
            return f"EPSG:{val}"
        if key == 2048 and loc == 0:
            crs = f"EPSG:{val}"
    return crs


def _geotiff_grid(meta: dict, rows: int, cols: int,
                  path: Optional[str] = None) -> GridSpec:
    if "pixel_scale" not in meta or "tiepoint" not in meta:
        if path is not None:
            # bare TIFF without GeoKeys (scanned maps, image-tool
            # exports): GDAL's fallback is the .tfw world file
            return _sidecar_grid(path, rows, cols)
        raise ValueError("TIFF has no ModelPixelScale/ModelTiepoint tags")
    sx, sy = meta["pixel_scale"][:2]
    i, j, _k, x, y, _z = meta["tiepoint"][:6]
    crs = _crs_from_geokeys(meta.get("geo_keys", []),
                            meta.get("geo_ascii", ""))
    return GridSpec(
        crs=crs, x_origin=float(x - i * sx), y_origin=float(y + j * sy),
        cell_width=float(sx), cell_height=-float(sy), rows=rows, cols=cols,
    )


def open_raster(path: str, var: Optional[str] = None,
                window: Optional[Tuple[int, int, int, int]] = None,
                overview: Optional[int] = None,
                ) -> Tuple[np.ndarray, GridSpec]:
    """Read ONE raster (any supported format) -> (2D array, GridSpec).
    ``var`` selects the NetCDF/HDF5/Zarr variable (required when more
    than one 2D array exists). A DIRECTORY containing ``.zgroup`` /
    ``.zarray`` (v2) or ``zarr.json`` (v3) is read as a Zarr store.
    ``window=(row_off, col_off, height, width)`` reads only that region
    of a TIFF/BigTIFF — intersecting tiles/strips are the ONLY bytes
    decompressed — and returns a GridSpec shifted to the window origin
    (reference parity: Raster.open(window=...), raster.py:634-771).
    ``overview=n`` returns pyramid level n of a COG (0 = full
    resolution; rasterio's ``overview_level`` is ``overview - 1``) with
    the cell size scaled to the level's decimation — the cheap path for
    quicklooks over a continent-sized mosaic."""
    if overview is not None and window is not None:
        raise ValueError("pass either overview= or window=, not both")
    if window is not None:
        if not os.path.isfile(path):
            raise NotImplementedError(
                "window= reads are supported for TIFF/BigTIFF and raw-"
                "binary files; for Zarr use read_zarr_chunk/list_zarr_chunks"
            )
        if os.path.splitext(path)[1].lower() in (
                ".bil", ".bip", ".bsq", ".flt", ".raw"):
            from .rawbin import read_rawbin  # row-seek window path

            return read_rawbin(path, window=window)
        if path.lower().endswith(".hgt"):
            from .srtm import read_hgt       # row-seek window path

            return read_hgt(path, window=window)
        with open(path, "rb") as f:
            hd = f.read(4)
        if hd not in (b"II*\x00", b"MM\x00*", b"II+\x00", b"MM\x00+"):
            raise NotImplementedError(
                "window= reads are supported for TIFF/BigTIFF, raw-binary "
                "(.bil/.bip/.bsq/.flt) and .hgt files; for Zarr use "
                "read_zarr_chunk, for NetCDF-4/HDF5 use "
                "hdf5lite.read_hdf5_window (chunk-pruned AOI)"
            )
        from .geotiff import read_geotiff

        levels, meta = read_geotiff(path, window=window)
        arr = levels[0]
        wr0, wc0, _wh, _ww = meta["window"]
        g = _geotiff_grid(meta, arr.shape[0], arr.shape[1], path)
        return np.asarray(arr), GridSpec(
            crs=g.crs,
            x_origin=g.x_origin + wc0 * g.cell_width,
            y_origin=g.y_origin + wr0 * g.cell_height,
            cell_width=g.cell_width, cell_height=g.cell_height,
            rows=arr.shape[0], cols=arr.shape[1],
        )
    if overview is not None and (
            os.path.isdir(path)
            or os.path.splitext(path)[1].lower() in (
                ".hgt", ".bil", ".bip", ".bsq", ".flt", ".raw")):
        raise NotImplementedError(
            "overview= needs an embedded pyramid; only TIFF/COG carries "
            "one (GeoPackage zoom levels: read_geopackage(zoom=...))")
    if os.path.isdir(path):
        if any(os.path.exists(os.path.join(path, m))
               for m in (".zgroup", ".zarray", "zarr.json")):
            from .zarr_lite import zarr_raster

            return zarr_raster(path, var=var)
        raise ValueError(f"directory is not a zarr store: {path}")
    if path.lower().endswith(".hgt"):  # SRTM: headerless, no magic —
        from .srtm import read_hgt     # extension + filename convention

        return read_hgt(path)
    if os.path.splitext(path)[1].lower() in (
            ".bil", ".bip", ".bsq", ".flt", ".raw"):
        from .rawbin import read_rawbin  # ESRI/ENVI .hdr sidecar dialects

        return read_rawbin(path)
    with open(path, "rb") as f:
        head = f.read(8)
    if head[:4] in (b"II*\x00", b"MM\x00*",        # classic TIFF
                    b"II+\x00", b"MM\x00+"):       # BigTIFF (version 43)
        from .geotiff import read_geotiff

        levels, meta = read_geotiff(path)
        lvl = 0 if overview is None else overview
        if lvl > 0 and len(levels) == 1 and os.path.exists(path + ".ovr"):
            # GDAL convention: external overviews live in <file>.ovr (a
            # TIFF whose IFD chain holds the pyramid) when the main file
            # carries none; its level i is the main file's level i+1
            ovr_levels, _ = read_geotiff(path + ".ovr")
            levels = levels + ovr_levels
        if lvl < 0 or lvl >= len(levels):
            raise ValueError(
                f"overview {lvl} out of range: file has {len(levels)} "
                f"pyramid level(s)")
        arr = np.asarray(levels[lvl])
        # GDAL_NODATA -> NaN for float rasters (the engine's composites
        # treat NaN as invalid, mirroring the reference's nodata->nan);
        # integer rasters keep raw values (no NaN representation)
        nd = meta.get("nodata")
        if nd is not None and arr.dtype.kind == "f" and not np.isnan(nd):
            arr = np.where(arr == arr.dtype.type(nd), np.nan, arr)
        g = _geotiff_grid(meta, arr.shape[0], arr.shape[1], path)
        if lvl > 0:
            # extent-preserving decimation: the overview covers the SAME
            # ground box with fewer cells (GDAL overview semantics)
            r0, c0 = levels[0].shape[0], levels[0].shape[1]
            g = GridSpec(
                crs=g.crs, x_origin=g.x_origin, y_origin=g.y_origin,
                cell_width=g.cell_width * (c0 / arr.shape[1]),
                cell_height=g.cell_height * (r0 / arr.shape[0]),
                rows=arr.shape[0], cols=arr.shape[1],
            )
        return arr, g
    if overview is not None:
        raise NotImplementedError(
            "overview= needs an embedded pyramid; only TIFF/COG carries "
            f"one (file magic {head[:4]!r})")
    if head[:3] == b"CDF" or head == b"\x89HDF\r\n\x1a\n":
        from .netcdf import netcdf_raster, read_netcdf

        nc = read_netcdf(path)  # parse once; netcdf_raster takes the dict
        if var is None:
            two_d = [k for k, v in nc["vars"].items() if v["data"].ndim == 2]
            if len(two_d) != 1:
                raise ValueError(
                    f"netcdf file has {len(two_d)} 2D variables {two_d}; "
                    "pass var= to choose"
                )
            var = two_d[0]
        return netcdf_raster(nc, var)
    if head[:4] == b"\x89PNG":
        arr = codec.decode(open(path, "rb").read(), "png")
        return arr, _sidecar_grid(path, arr.shape[0], arr.shape[1])
    if head[:2] == b"\xff\xd8":
        arr = codec.decode(open(path, "rb").read(), "jpg")
        return arr, _sidecar_grid(path, arr.shape[0], arr.shape[1])
    if head[:6] == b"\x93NUMPY":
        arr = codec.decode(open(path, "rb").read(), "npy")
        return arr, _sidecar_grid(path, arr.shape[0], arr.shape[1])
    if head == b"SQLite f":  # GeoPackage (SQLite container, OGC 12-128r18)
        from .geopackage import read_geopackage

        return read_geopackage(path, table_name=var)
    if head[:5].lower() in (b"ncols", b"nrows"):  # ESRI ASCII grid
        from .ascii_grid import read_ascii_grid

        return read_ascii_grid(path)
    raise ValueError(f"unrecognized raster format (magic {head[:4]!r}): {path}")


def raster_dataset(paths: List[str], var: Optional[str] = None, fmt: str = "npy",
                   overview: Optional[int] = None):
    """Streaming mixed-format ingest: one IMAGES-schema row per file,
    decoded on workers via the magic router. ``overview=`` ingests that
    COG pyramid level instead of full resolution — the quicklook path
    that touches a fraction of the bytes (all paths must be TIFFs)."""
    import pyarrow as pa

    import ray.data as rd

    from .images import GRID_STRUCT, average_hash

    def load(batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption",
                               "phash")}
        grids = []
        for p in batch.column("path").to_pylist():
            arr, grid = open_raster(p, var=var, overview=overview)
            if arr.ndim == 3:  # RGB display images ingest as luma
                arr = arr.mean(axis=2)
            a32 = np.ascontiguousarray(arr).astype(np.float32)
            out["image_id"].append(os.path.splitext(os.path.basename(p))[0])
            out["bytes"].append(codec.encode(a32, fmt))
            out["w"].append(grid.cols)
            out["h"].append(grid.rows)
            out["fmt"].append(fmt)
            out["caption"].append(f"open:{os.path.basename(p)}")
            out["phash"].append(average_hash(a32))
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

    return rd.from_items([{"path": p} for p in paths]).map_batches(
        load, batch_format="pyarrow"
    )
