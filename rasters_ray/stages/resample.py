"""Resampling / reprojection stages.

- ``warp_array`` / ``WarpStage``: grid->grid warp by inverse mapping
  (target cell centers -> source fractional indices via the affine-center
  rule, + CRS transform when grids differ) with the reference's method
  table semantics (raster.py:1325-1428): nearest (the reference default),
  bilinear, average (area mean for integer downscale factors), cubic
  (Catmull-Rom). Pure numpy per image, stateless map_batches.
- ``KNNResampler``: the stateful kNN stage (KDTree analog,
  kdtree.py:52-202): a neighbor index per (source, target) geometry pair
  built ONCE per actor and cached; resample = vectorized gather with the
  radius_of_influence fill rule (out-of-radius -> fill_value,
  kdtree.py:298-308). radius defaults to 2.0 x max(cell_size_meters)
  (kdtree.py:27,167-179: the class-local 2.0 shadows the module constant 3).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa

from .. import codec
from ..grids import GridSpec
from ..grids.swath import SwathSpec
from ..proj import crs_equal, transform_xy
from ..state.gridindex import GridNNIndex

RADIUS_FACTOR = 2.0  # kdtree.py:27 (class-local shadows constants.py:5's 3)

# the reference's 13-method resampling table (constants.py:13-27) mapped to
# the engine's four kernels; approximations are explicit here: min/max/med/
# q1/q3/mode/rms/sum reduce over the same source footprint an 'average'
# uses, and gauss/lanczos/cubic_spline fall back to the cubic kernel.
METHOD_TABLE = {
    "nearest": "nearest",
    "bilinear": "bilinear",
    "cubic": "cubic",
    "cubic_spline": "cubic",
    "lanczos": "cubic",
    "gauss": "cubic",
    "average": "average",
    "mode": "average",
    "min": "average",
    "max": "average",
    "med": "average",
    "q1": "average",
    "q3": "average",
    "rms": "average",
    "sum": "average",
}


def resolve_method(name: str) -> str:
    if name not in METHOD_TABLE:
        raise ValueError(f"unknown resampling method: {name} (know {sorted(METHOD_TABLE)})")
    return METHOD_TABLE[name]


def _source_fractional_indices(
    target: GridSpec, source: GridSpec
) -> Tuple[np.ndarray, np.ndarray]:
    """Fractional (row, col) source indices of every target cell center."""
    tx, ty = target.xy()
    if not crs_equal(target.crs, source.crs):
        tx, ty = transform_xy(tx, ty, target.crs, source.crs)
    colf = (tx - source.x_origin) / source.cell_width - 0.5
    rowf = (ty - source.y_origin) / source.cell_height - 0.5
    return rowf, colf


def warp_array(
    arr: np.ndarray,
    source: GridSpec,
    target: GridSpec,
    method: str = "nearest",
    fill_value: float = np.nan,
) -> np.ndarray:
    """Inverse-mapping warp of one 2D array."""
    rowf, colf = _source_fractional_indices(target, source)
    rows, cols = arr.shape

    if method == "nearest":
        r = np.rint(rowf)
        c = np.rint(colf)
        inside = (r >= 0) & (r < rows) & (c >= 0) & (c < cols) & np.isfinite(r) & np.isfinite(c)
        out = np.full(target.shape, fill_value, dtype=np.float64)
        ri = np.where(inside, r, 0).astype(np.int64)
        ci = np.where(inside, c, 0).astype(np.int64)
        vals = arr[ri, ci].astype(np.float64)
        out[inside] = vals[inside]
        return out

    if method == "bilinear":
        r0 = np.floor(rowf)
        c0 = np.floor(colf)
        fr = rowf - r0
        fc = colf - c0
        out = np.zeros(target.shape, dtype=np.float64)
        wsum = np.zeros(target.shape, dtype=np.float64)
        for dr, wr in ((0, 1 - fr), (1, fr)):
            for dc, wc in ((0, 1 - fc), (1, fc)):
                rr = r0 + dr
                cc = c0 + dc
                ok = (rr >= 0) & (rr < rows) & (cc >= 0) & (cc < cols) & np.isfinite(rr) & np.isfinite(cc)
                ri = np.where(ok, rr, 0).astype(np.int64)
                ci = np.where(ok, cc, 0).astype(np.int64)
                v = arr[ri, ci].astype(np.float64)
                w = wr * wc
                good = ok & np.isfinite(v)
                out += np.where(good, v * w, 0.0)
                wsum += np.where(good, w, 0.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            res = np.where(wsum > 0, out / wsum, fill_value)
        return res

    if method == "average":
        # area mean for integer downscale of aligned grids; general case
        # falls back to bilinear
        fx = target.cell_width / source.cell_width
        fy = -target.cell_height / -source.cell_height
        if abs(fx - round(fx)) < 1e-9 and abs(fy - round(fy)) < 1e-9 and fx >= 1 and fy >= 1:
            fx, fy = int(round(fx)), int(round(fy))
            r00, c00 = _source_fractional_indices(target, source)
            r0 = int(np.rint(r00[0, 0] - (fy - 1) / 2.0))
            c0 = int(np.rint(c00[0, 0] - (fx - 1) / 2.0))
            th, tw = target.shape
            out = np.full(target.shape, fill_value, dtype=np.float64)
            for rt in range(th):
                sr = r0 + rt * fy
                if sr < 0 or sr + fy > rows:
                    continue
                block = arr[sr : sr + fy]
                for ct in range(tw):
                    sc = c0 + ct * fx
                    if sc < 0 or sc + fx > cols:
                        continue
                    v = block[:, sc : sc + fx].astype(np.float64)
                    m = np.isfinite(v)
                    if m.any():
                        out[rt, ct] = v[m].mean()
            return out
        return warp_array(arr, source, target, "bilinear", fill_value)

    if method == "cubic":
        # Catmull-Rom separable cubic
        def k(t):
            at = np.abs(t)
            return np.where(
                at <= 1,
                1.5 * at**3 - 2.5 * at**2 + 1,
                np.where(at <= 2, -0.5 * at**3 + 2.5 * at**2 - 4 * at + 2, 0.0),
            )

        r0 = np.floor(rowf).astype(np.int64)
        c0 = np.floor(colf).astype(np.int64)
        out = np.zeros(target.shape, dtype=np.float64)
        wsum = np.zeros(target.shape, dtype=np.float64)
        for dr in range(-1, 3):
            for dc in range(-1, 3):
                rr = r0 + dr
                cc = c0 + dc
                ok = (rr >= 0) & (rr < rows) & (cc >= 0) & (cc < cols)
                ri = np.clip(rr, 0, rows - 1)
                ci = np.clip(cc, 0, cols - 1)
                v = arr[ri, ci].astype(np.float64)
                w = k(rowf - rr) * k(colf - cc)
                good = ok & np.isfinite(v)
                out += np.where(good, v * w, 0.0)
                wsum += np.where(good, w, 0.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            return np.where(np.abs(wsum) > 1e-12, out / wsum, fill_value)

    raise ValueError(f"unknown resampling method: {method}")


class WarpStage:
    """map_batches stage: warp every image in the batch onto a target grid
    (broadcast as a plain dict — tiny). ``method`` accepts any name from
    the reference's 13-method table (METHOD_TABLE)."""

    def __init__(self, target_dict: Dict, method: str = "nearest", fill_value: float = np.nan):
        self.target = GridSpec.from_dict(target_dict)
        self.method = resolve_method(method)
        self.fill_value = fill_value

    def __call__(self, batch: pa.Table) -> pa.Table:
        grids = batch.column("grid").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        out_blobs = []
        tgt_dict = {k: v for k, v in self.target.to_dict().items() if k != "type"}
        for i in range(batch.num_rows):
            src = GridSpec.from_dict(grids[i])
            arr = codec.decode(blobs[i], fmts[i])
            out = warp_array(arr, src, self.target, self.method, self.fill_value)
            out_blobs.append(codec.encode(out.astype(np.float32), "npy"))
        t = batch.set_column(batch.column_names.index("bytes"), "bytes", pa.array(out_blobs, pa.binary()))
        t = t.set_column(
            t.column_names.index("fmt"), "fmt", pa.array(["npy"] * t.num_rows, pa.string())
        )
        gi = t.column_names.index("grid")
        return t.set_column(gi, "grid", pa.array([tgt_dict] * t.num_rows, t.schema.field(gi).type))


# ---------------------------------------------------------------------------
# kNN resampler (swath <-> grid)
# ---------------------------------------------------------------------------


def _geometry_coords(spec) -> Tuple[np.ndarray, np.ndarray, float]:
    """(x, y, cell_size_meters) in the geometry's own CRS."""
    if isinstance(spec, GridSpec):
        x, y = spec.xy()
        return x.ravel(), y.ravel(), spec.cell_size_meters
    x, y = spec.x.ravel(), spec.y.ravel()
    cell = spec.cell_size()
    from ..proj.crs import is_geographic

    meters = cell / 180.0 * 40075017.0 if is_geographic(spec.crs) else cell
    return x, y, meters


def _spec_from_dict(d: Dict):
    return SwathSpec.from_dict(d) if d.get("type") == "swath" else GridSpec.from_dict(d)


class KNNResampler:
    """Stateful kNN nearest-neighbor resampler between two geometries.

    Index built once per (source, target) pair and cached per actor —
    the KDTree.save/load amortization of the reference (kdtree.py:227-255)
    becomes actor-held state, with an optional npz spill directory so a
    restarted actor (or a later run) reloads instead of rebuilding.
    """

    def __init__(self, radius_factor: float = RADIUS_FACTOR, spill_dir: Optional[str] = None):
        self.radius_factor = radius_factor
        self.spill_dir = spill_dir
        self._cache: Dict[tuple, tuple] = {}

    def _spill_path(self, key: tuple) -> Optional[str]:
        if not self.spill_dir:
            return None
        import hashlib
        import os

        h = hashlib.blake2b(repr(key).encode(), digest_size=12).hexdigest()
        os.makedirs(self.spill_dir, exist_ok=True)
        return os.path.join(self.spill_dir, f"knn_{h}.npz")

    def neighbor_info(self, source, target) -> Tuple[np.ndarray, np.ndarray]:
        """(flat source index per target cell, out-of-radius mask)."""
        key = (str(sorted(source.to_dict().items()))[:512], str(sorted(target.to_dict().items()))[:512])
        if key not in self._cache:
            path = self._spill_path(key)
            if path is not None:
                import os

                if os.path.exists(path):
                    z = np.load(path)
                    self._cache[key] = (z["idx"], z["oob"])
                    return self._cache[key]
            sx, sy, s_m = _geometry_coords(source)
            tx, ty, t_m = _geometry_coords(target)
            if not crs_equal(getattr(source, "crs"), getattr(target, "crs")):
                tx, ty = transform_xy(tx, ty, target.crs, source.crs)
            index = GridNNIndex(sx, sy)
            idx, dist = index.query(tx, ty)
            radius_m = self.radius_factor * max(s_m, t_m)
            # distances are in source-CRS units; convert degrees->meters with
            # the reference's equator heuristic when geographic
            from ..proj.crs import is_geographic

            if is_geographic(source.crs):
                dist_m = dist / 180.0 * 40075017.0
            else:
                dist_m = dist
            self._cache[key] = (idx, dist_m > radius_m)
            if path is not None:
                import os

                tmp = path + ".tmp.npz"  # ends in .npz so savez keeps the name
                np.savez(tmp, idx=idx, oob=self._cache[key][1])
                os.replace(tmp, path)
        return self._cache[key]

    def resample(
        self, arr: np.ndarray, source, target, fill_value: float = np.nan
    ) -> np.ndarray:
        idx, oob = self.neighbor_info(source, target)
        was_bool = arr.dtype == bool
        flat = (arr.astype(np.uint16) if was_bool else arr).ravel()
        out = flat[idx].astype(np.float64)
        out[oob] = fill_value
        shape = target.shape
        out = out.reshape(shape)
        if was_bool:
            return out.astype(bool)  # bool<->uint16 shim (kdtree.py:293-310)
        return out


def utm_target_grid(grid: GridSpec, cell_size_m: float) -> GridSpec:
    """Raster.UTM / reproject convenience (raster.py:1878-1915): derive the
    local-UTM target grid covering the source footprint at a metric cell
    size, from the footprint centroid's UTM zone (EPSG form)."""
    from ..grids import bbox as bboxmod
    from ..proj.crs import local_UTM_EPSG

    cx, cy = grid.centroid
    if not crs_equal(grid.crs, "EPSG:4326"):
        lon, lat = transform_xy([cx], [cy], grid.crs, "EPSG:4326")
        cx, cy = float(lon[0]), float(lat[0])
    utm = local_UTM_EPSG(cy, cx)
    box = bboxmod.transform(grid.bbox, grid.crs, utm)
    return GridSpec.from_bbox(box, cell_size_m, crs=utm)


def reproject(images_ds, cell_size_m: float, method: str = "nearest", concurrency: int = 2):
    """Per-image reprojection onto each image's own local-UTM grid.
    Stateless map_batches (target derived per row, not broadcast)."""

    def f(batch: pa.Table) -> pa.Table:
        out_blobs, out_grids = [], []
        grids = batch.column("grid").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        m = resolve_method(method)
        for i in range(batch.num_rows):
            src = GridSpec.from_dict(grids[i])
            tgt = utm_target_grid(src, cell_size_m)
            arr = codec.decode(blobs[i], fmts[i])
            out = warp_array(arr, src, tgt, m)
            out_blobs.append(codec.encode(out.astype(np.float32), "npy"))
            out_grids.append({k: v for k, v in tgt.to_dict().items() if k != "type"})
        t = batch.set_column(
            batch.column_names.index("bytes"), "bytes", pa.array(out_blobs, pa.binary())
        )
        t = t.set_column(
            t.column_names.index("fmt"), "fmt", pa.array(["npy"] * t.num_rows, pa.string())
        )
        gi = t.column_names.index("grid")
        return t.set_column(gi, "grid", pa.array(out_grids, t.schema.field(gi).type))

    return images_ds.map_batches(f, batch_format="pyarrow")


class KNNResampleStage:
    """Actor-pool form: rows carry (bytes, fmt, grid); target broadcast."""

    def __init__(self, target_dict: Dict, fill_value: float = np.nan,
                 radius_factor: float = RADIUS_FACTOR):
        self.target = _spec_from_dict(target_dict)
        self.fill = fill_value
        self.resampler = KNNResampler(radius_factor)

    def __call__(self, batch: pa.Table) -> pa.Table:
        grids = batch.column("grid").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        out_blobs = []
        for i in range(batch.num_rows):
            src = _spec_from_dict(dict(grids[i]) | {"type": grids[i].get("type", "grid")})
            arr = codec.decode(blobs[i], fmts[i])
            out = self.resampler.resample(arr, src, self.target, self.fill)
            out_blobs.append(codec.encode(out.astype(np.float32), "npy"))
        t = batch.set_column(
            batch.column_names.index("bytes"), "bytes", pa.array(out_blobs, pa.binary())
        )
        return t.set_column(
            t.column_names.index("fmt"), "fmt", pa.array(["npy"] * t.num_rows, pa.string())
        )
