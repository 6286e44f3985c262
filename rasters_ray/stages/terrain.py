"""Terrain derivatives: Horn (1981) 3x3 gradient / slope magnitude.

The reference treats rasters as elevation-like grids but has no surface
derivative operator (its math surface is per-pixel dunders,
``/root/reference/rasters/raster.py``); slope/aspect is the classic
geospatial raster derivative (Horn 1981, "Hill shading and the
reflectance map", Proc. IEEE — the kernel GDAL's ``gdaldem slope``
uses).  This stage adds it Ray-Data-first.

Horn's weighted central difference over the 3x3 neighborhood::

    gx_num = (tr + 2*mr + br) - (tl + 2*ml + bl)     # east - west
    gy_num = (bl + 2*bm + br) - (tl + 2*tm + tr)     # south - north
    dz/dx  = gx_num / (8 * cell_w),   dz/dy = gy_num / (8 * cell_h)
    grad   = sqrt((dz/dx)^2 + (dz/dy)^2)             # tan(slope)

Numerators are INTEGER-exact for integral pixels (int64), so results
are bit-stable under any tiling; ``grad`` uses a fixed float op order
(int64 -> float64 divide, square, add, sqrt) that DuckDB reproduces
bit-for-bit.  Gradients are emitted only where all 9 neighbors are
inside the raster and finite (the derivative is undefined at edges).

Scale shapes
------------
* ``terrain_gradient``: per-image map_batches (no shuffle).
* ``terrain_halo_tiled``: the distributed form — the SAME
  :func:`rasters_ray.stages.focal.halo_exchange_tiled` exchange the
  focal stage uses (tiles ship radius-1 edge strips to 8 neighbors, one
  groupby shuffle, O(perimeter) payload), with the Horn kernel as the
  per-tile stencil.  Bit-equal to the whole-image path by test.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rasters_ray import codec
from rasters_ray.stages.focal import halo_exchange_tiled

__all__ = [
    "horn_numerators",
    "curvature_numerators",
    "terrain_indices",
    "terrain_gradient",
    "terrain_halo_tiled",
    "lambertian_shade",
]

# hillshade light: unit vector (-0.5, +0.5, sqrt(2)/2) in (col-east,
# row-south, up) coordinates — elevation 45°, horizontal components
# EXACT halves, vertical the correctly-rounded double for sqrt(2)/2.
# Pre-folding the trig to these literals makes the whole formula
# +,*,/,sqrt on shared constants: bit-portable to SQL (cos/sin/atan are
# NOT correctly-rounded across libms, which is why no trig survives to
# runtime).
HS_COS_Z = 0.7071067811865476


def lambertian_shade(gx_num: np.ndarray, gy_num: np.ndarray, cw: float, ch: float):
    """Lambertian hillshade from Horn gradient numerators.

    shade = max(0, n . l) with unit normal n = (-p, -q, 1)/|.| — the
    algebraic form of Horn's cos(zen)cos(slope) + sin(zen)sin(slope)
    cos(az - aspect) (no trig at runtime).  Returns 255 * shade as
    float64, fixed op order: num = 0.5*p - 0.5*q + cos_z;
    den = sqrt(1 + p*p + q*q)."""
    p = gx_num.astype(np.float64) / (8 * cw)
    q = gy_num.astype(np.float64) / (8 * ch)
    num = 0.5 * p - 0.5 * q + HS_COS_Z
    den = np.sqrt(1.0 + p * p + q * q)
    return 255.0 * np.maximum(0.0, num / den)


def horn_numerators(canvas: np.ndarray) -> tuple:
    """Horn gradient numerators over a padded array.

    ``canvas`` has one extra ring of cells on each side (NaN where the
    neighbor does not exist).  Returns ``(gx_num, gy_num, valid)`` of
    shape ``canvas.shape - 2``: int64 numerators and a bool mask that is
    True only where all 9 cells of the window are finite."""
    a = np.asarray(canvas, dtype=np.float64)
    if a.ndim != 2 or a.shape[0] < 3 or a.shape[1] < 3:
        raise ValueError("horn_numerators expects a 2D array >= 3x3")
    tl, tm, tr = a[:-2, :-2], a[:-2, 1:-1], a[:-2, 2:]
    ml, mr = a[1:-1, :-2], a[1:-1, 2:]
    bl, bm, br = a[2:, :-2], a[2:, 1:-1], a[2:, 2:]
    valid = (
        np.isfinite(tl)
        & np.isfinite(tm)
        & np.isfinite(tr)
        & np.isfinite(ml)
        & np.isfinite(a[1:-1, 1:-1])
        & np.isfinite(mr)
        & np.isfinite(bl)
        & np.isfinite(bm)
        & np.isfinite(br)
    )

    def z(x):
        return np.where(np.isfinite(x), x, 0.0).astype(np.int64)

    gx = (z(tr) + 2 * z(mr) + z(br)) - (z(tl) + 2 * z(ml) + z(bl))
    gy = (z(bl) + 2 * z(bm) + z(br)) - (z(tl) + 2 * z(tm) + z(tr))
    return gx, gy, valid


def _grad(gx_num: np.ndarray, gy_num: np.ndarray, cw: float, ch: float):
    gxf = gx_num.astype(np.float64) / (8 * cw)
    gyf = gy_num.astype(np.float64) / (8 * ch)
    return np.sqrt(gxf * gxf + gyf * gyf)


_EMPTY = {
    "image_id": pa.string(),
    "r": pa.int64(),
    "c": pa.int64(),
    "gx_num": pa.int64(),
    "gy_num": pa.int64(),
    "grad": pa.float64(),
}


def _terrain_table(parts: list) -> pa.Table:
    if not parts:
        return pa.table({k: pa.array([], t) for k, t in _EMPTY.items()})
    return pa.table(
        {
            k: pa.array(np.concatenate([p[k] for p in parts]), _EMPTY[k])
            for k in _EMPTY
        }
    )


def _terrain_rows(
    image_id: str,
    gx: np.ndarray,
    gy: np.ndarray,
    valid: np.ndarray,
    step: int,
    r_off: int,
    c_off: int,
    cw: float,
    ch: float,
):
    """Rows at the sampled step lattice (GLOBAL r % step == 0) where the
    window is fully valid.  ``r_off/c_off`` are the global coordinates
    of the [0,0] center."""
    rows, cols = gx.shape
    rr = np.arange(rows)
    cc = np.arange(cols)
    rsel = rr[(rr + r_off) % step == 0]
    csel = cc[(cc + c_off) % step == 0]
    if not len(rsel) or not len(csel):
        return None
    gr, gc = np.meshgrid(rsel, csel, indexing="ij")
    gr, gc = gr.ravel(), gc.ravel()
    ok = valid[gr, gc]
    gr, gc = gr[ok], gc[ok]
    if not len(gr):
        return None
    gxs = gx[gr, gc]
    gys = gy[gr, gc]
    return {
        "image_id": np.repeat(np.array([image_id], dtype=object), len(gr)),
        "r": gr + r_off,
        "c": gc + c_off,
        "gx_num": gxs,
        "gy_num": gys,
        "grad": _grad(gxs, gys, cw, ch),
    }


def terrain_gradient(images_ds, step: int = 1, cell: float = 0.01):
    """Horn gradient per pixel -> Dataset[(image_id, r, c, gx_num,
    gy_num, grad)] at the ``step`` sample lattice; interior-only (all 9
    neighbors finite).  Embarrassingly parallel."""

    def kernel(t: pa.Table) -> pa.Table:
        parts = []
        if t.num_rows:
            blobs = codec.BlobReader(t.column("bytes"))
            fmts = t.column("fmt").to_pylist()
            ids = t.column("image_id").to_pylist()
            for i in range(t.num_rows):
                px = codec.decode(blobs[i], fmts[i]).astype(np.float64)
                # pad with a NaN ring so numerator shape == pixel shape
                pad = np.full((px.shape[0] + 2, px.shape[1] + 2), np.nan)
                pad[1:-1, 1:-1] = px
                gx, gy, valid = horn_numerators(pad)
                rows = _terrain_rows(ids[i], gx, gy, valid, step, 0, 0, cell, cell)
                if rows is not None:
                    parts.append(rows)
        return _terrain_table(parts)

    return images_ds.map_batches(kernel, batch_format="pyarrow")


def terrain_halo_tiled(images_ds, step: int = 1, tile: int = 32, cell: float = 0.01):
    """Distributed Horn gradient over a tile lattice: radius-1 halo
    strips exchanged in one groupby shuffle, then every tile derives its
    interior independently.  Bit-equal to :func:`terrain_gradient`."""

    def tile_fn(image_id, canvas, tr0, tc0, trows, tcols) -> pa.Table:
        gx, gy, valid = horn_numerators(canvas)
        # canvas is core + radius-1 ring, so numerators align with core
        rows = _terrain_rows(
            image_id,
            gx[:trows, :tcols],
            gy[:trows, :tcols],
            valid[:trows, :tcols],
            step,
            tr0,
            tc0,
            cell,
            cell,
        )
        if rows is None:
            return pa.table({k: pa.array([], t) for k, t in _EMPTY.items()})
        return pa.table({k: pa.array(v, _EMPTY[k]) for k, v in rows.items()})

    return halo_exchange_tiled(images_ds, radius=1, tile=tile, tile_fn=tile_fn)


def curvature_numerators(canvas: np.ndarray) -> tuple:
    """Zevenbergen & Thorne (1987) quadric second-derivative
    numerators over a padded array (same 1-ring convention as
    :func:`horn_numerators`): returns ``(d2x, d2y, dxy, valid)`` where

    * ``d2x = z_W + z_E - 2 z_C``  (= 2 D L^2 in Z&T terms)
    * ``d2y = z_N + z_S - 2 z_C``  (= 2 E L^2)
    * ``dxy = -z_NW + z_NE + z_SW - z_SE``  (= 4 F L^2)

    all exact int64 for integral pixels.  The ArcGIS Curvature output
    is ``-100 * (d2x + d2y) / L^2`` with L the cell size; profile/plan
    split divides by the gradient terms downstream."""
    a = np.asarray(canvas, dtype=np.float64)
    if a.ndim != 2 or a.shape[0] < 3 or a.shape[1] < 3:
        raise ValueError("curvature_numerators expects a 2D array >= 3x3")
    nw, n_, ne = a[:-2, :-2], a[:-2, 1:-1], a[:-2, 2:]
    w_, c_, e_ = a[1:-1, :-2], a[1:-1, 1:-1], a[1:-1, 2:]
    sw, s_, se = a[2:, :-2], a[2:, 1:-1], a[2:, 2:]
    valid = (np.isfinite(nw) & np.isfinite(n_) & np.isfinite(ne)
             & np.isfinite(w_) & np.isfinite(c_) & np.isfinite(e_)
             & np.isfinite(sw) & np.isfinite(s_) & np.isfinite(se))

    def z(x):
        return np.where(np.isfinite(x), x, 0.0).astype(np.int64)

    d2x = z(w_) + z(e_) - 2 * z(c_)
    d2y = z(n_) + z(s_) - 2 * z(c_)
    dxy = -z(nw) + z(ne) + z(sw) - z(se)
    return d2x, d2y, dxy, valid


def terrain_indices(canvas: np.ndarray) -> tuple:
    """gdaldem TPI / TRI / roughness integer numerators over a padded
    array (same 1-ring convention as :func:`horn_numerators`).

    For the 8 neighbor differences ``d_i = z(neighbor) - z(center)``:

    * ``tpi_num = -sum(d_i)``  (= 8 * Weiss/Wilson TPI; TPI is
      ``center - mean(8 neighbors)`` = ``tpi_num / 8``)
    * ``tri_sum = sum(|d_i|)`` (Wilson TRI = ``tri_sum / 8``,
      gdaldem ``-alg Wilson``)
    * ``tri_sq  = sum(d_i^2)`` (Riley TRI = ``sqrt(tri_sq)``,
      gdaldem default since 3.3)
    * ``rough   = max - min over the 3x3 window`` (gdaldem roughness)

    All int64-exact for integral pixels; ``valid`` is True only where
    the full window is finite (gdaldem leaves edges nodata)."""
    a = np.asarray(canvas, dtype=np.float64)
    if a.ndim != 2 or a.shape[0] < 3 or a.shape[1] < 3:
        raise ValueError("terrain_indices expects a 2D array >= 3x3")
    c_ = a[1:-1, 1:-1]
    nbrs = [a[:-2, :-2], a[:-2, 1:-1], a[:-2, 2:],
            a[1:-1, :-2], a[1:-1, 2:],
            a[2:, :-2], a[2:, 1:-1], a[2:, 2:]]
    valid = np.isfinite(c_)
    for n in nbrs:
        valid &= np.isfinite(n)

    def z(x):
        return np.where(np.isfinite(x), x, 0.0).astype(np.int64)

    zc = z(c_)
    ds = [z(n) - zc for n in nbrs]
    tpi_num = -sum(ds)
    tri_sum = sum(np.abs(d) for d in ds)
    tri_sq = sum(d * d for d in ds)
    hi = np.maximum.reduce([np.maximum(d, 0) for d in ds])
    lo = np.minimum.reduce([np.minimum(d, 0) for d in ds])
    rough = hi - lo
    return tpi_num, tri_sum, tri_sq, rough, valid
