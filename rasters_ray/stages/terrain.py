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
    "geomorphons",
    "geomorphon_lattice",
    "GEOMORPHON_TABLE",
    "hypsometric_arrays",
    "hypsometric_stats",
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


ASPECT_TAN_22_5 = 0.41421356237309503  # correctly-rounded double of tan(22.5°)

ASPECT_CLASSES = ("flat", "N", "NE", "E", "SE", "S", "SW", "W", "NW")


def aspect_class(gx_num: np.ndarray, gy_num: np.ndarray) -> np.ndarray:
    """gdaldem/ArcGIS aspect classified into the nine standard codes:
    0 = flat, then 1..8 clockwise from north (N, NE, E, SE, S, SW, W,
    NW), each sector 45° wide CENTERED on its compass point (boundaries
    at 22.5°, 67.5°, ...).

    Input is the Horn gradient numerator pair (:func:`horn_numerators`
    axes: gx east, gy south); the downslope (descent) vector in (east,
    north) coordinates is ``(de, dn) = (-gx, +gy)``.  No trig at
    runtime: a sector test against the 22.5° boundary is the IEEE
    comparison ``|minor| < |major| * tan(22.5°)`` with the tangent as a
    correctly-rounded double literal — multiplication and comparison of
    exact small integers in float64 are deterministic, so the class is
    bit-portable to SQL (unlike atan2, whose libm rounding varies)."""
    de = -np.asarray(gx_num, dtype=np.int64)
    dn = np.asarray(gy_num, dtype=np.int64)
    a = np.abs(de).astype(np.float64)
    b = np.abs(dn).astype(np.float64)
    t = ASPECT_TAN_22_5
    flat = (de == 0) & (dn == 0)
    axis_ns = ~flat & (a < b * t)
    axis_ew = ~flat & ~axis_ns & (b < a * t)
    diag = ~flat & ~axis_ns & ~axis_ew  # both components nonzero here
    cls = np.zeros(de.shape, dtype=np.int64)
    cls[axis_ns & (dn > 0)] = 1
    cls[axis_ns & (dn < 0)] = 5
    cls[axis_ew & (de > 0)] = 3
    cls[axis_ew & (de < 0)] = 7
    cls[diag & (de > 0) & (dn > 0)] = 2
    cls[diag & (de > 0) & (dn < 0)] = 4
    cls[diag & (de < 0) & (dn < 0)] = 6
    cls[diag & (de < 0) & (dn > 0)] = 8
    return cls


_ASPECT_EMPTY = {
    "image_id": pa.string(),
    "aspect_class": pa.int64(),
    "n_px": pa.int64(),
}


def aspect_histogram_tiled(images_ds, tile: int = 32):
    """Distributed aspect-class distribution per scene:
    Dataset[(image_id, aspect_class, n_px)] over the full interior (all
    9 window cells finite), computed the scale way — radius-1 halo
    strips exchanged across the tile lattice, per-tile partial
    bincounts, then a tiny (image_id, class) groupby-sum.  Pixels never
    cross the shuffle; the exchanged payload is O(perimeter) strips and
    the aggregate payload is ≤ 9 rows per tile."""
    from ray.data.aggregate import Sum

    def tile_fn(image_id, canvas, tr0, tc0, trows, tcols) -> pa.Table:
        gx, gy, valid = horn_numerators(canvas)
        gx, gy, valid = gx[:trows, :tcols], gy[:trows, :tcols], valid[:trows, :tcols]
        cls = aspect_class(gx, gy)[valid]
        if not cls.size:
            return pa.table({k: pa.array([], t) for k, t in _ASPECT_EMPTY.items()})
        bc = np.bincount(cls, minlength=9)
        nz = np.flatnonzero(bc)
        return pa.table({
            "image_id": pa.array([image_id] * nz.size, pa.string()),
            "aspect_class": pa.array(nz, pa.int64()),
            "pcnt": pa.array(bc[nz], pa.int64()),
        })

    partials = halo_exchange_tiled(images_ds, radius=1, tile=tile, tile_fn=tile_fn)
    return partials.groupby(["image_id", "aspect_class"]).aggregate(
        Sum("pcnt", alias_name="n_px")
    )


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


# geomorphon 10-class lookup (Jasiewicz & Stepinski 2013, Table 1 /
# GRASS r.geomorphon), indexed [n_minus][n_plus] where n_plus counts
# directions whose upward horizon dominates (neighbours HIGHER) and
# n_minus the opposite.  Codes: 1=flat 2=peak 3=ridge 4=shoulder
# 5=spur 6=slope 7=hollow 8=footslope 9=valley 10=pit.  0 entries are
# unreachable (n_plus + n_minus > 8).
GEOMORPHON_TABLE = (
    (1, 1, 1, 8, 8, 9, 9, 9, 10),
    (1, 1, 8, 8, 8, 9, 9, 9, 0),
    (1, 4, 6, 6, 7, 7, 9, 0, 0),
    (4, 4, 6, 6, 6, 7, 0, 0, 0),
    (4, 4, 5, 6, 6, 0, 0, 0, 0),
    (3, 3, 5, 5, 0, 0, 0, 0, 0),
    (3, 3, 3, 0, 0, 0, 0, 0, 0),
    (3, 3, 0, 0, 0, 0, 0, 0, 0),
    (2, 0, 0, 0, 0, 0, 0, 0, 0),
)

_GEO_DIRS = ((-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1))


def geomorphons(arr: np.ndarray, lookup: int = 4, step: int = 1):
    """Geomorphon landform classification (Jasiewicz & Stepinski 2013;
    GRASS ``r.geomorphon``) kept INTEGER-exact: in each of the 8
    directions the line-of-sight slopes to cells k = 1..lookup are
    scaled by 12/k (integral for k <= 4), so the zenith/nadir
    comparison A > -B needs no trig or floats — atan is monotone, so
    comparing scaled slopes equals comparing angles at flatness
    threshold 0.  Per direction:

        a = max_k 12*(z_k - z_0)/k,   b = min_k 12*(z_k - z_0)/k
        delta = +1 if a > -b  (higher ground dominates)
                -1 if -b > a  (lower ground dominates)
                 0 otherwise  (or no in-bounds cell)

    then the (n_minus, n_plus) pair indexes GEOMORPHON_TABLE.  Returns
    (rows, cols, n_plus, n_minus, landform) for cells on the global
    ``step`` lattice.  Scale shape: per-tile with a ``lookup``-pixel
    halo; everything is shifted integer arithmetic."""
    if lookup < 1 or lookup > 4:
        raise ValueError("lookup must be 1..4 (12/k integrality)")
    x = np.asarray(arr)
    if x.ndim != 2:
        raise ValueError("need a 2D raster")
    if not np.issubdtype(x.dtype, np.integer):
        if not np.all(np.isfinite(x)) or np.any(x != np.rint(x)):
            raise ValueError("geomorphons requires integral pixel values")
    xi = x.astype(np.int64)
    h, w = xi.shape
    rr = np.arange(0, h, step)
    cc = np.arange(0, w, step)
    gr, gc = np.meshgrid(rr, cc, indexing="ij")
    gr, gc = gr.ravel(), gc.ravel()
    z0 = xi[gr, gc]
    n_plus = np.zeros(len(gr), np.int64)
    n_minus = np.zeros(len(gr), np.int64)
    big = np.int64(1) << 56
    for dr, dc in _GEO_DIRS:
        a = np.full(len(gr), -big)
        b = np.full(len(gr), big)
        seen = np.zeros(len(gr), bool)
        for k in range(1, lookup + 1):
            r2 = gr + dr * k
            c2 = gc + dc * k
            ok = (r2 >= 0) & (r2 < h) & (c2 >= 0) & (c2 < w)
            if not ok.any():
                continue
            s = np.zeros(len(gr), np.int64)
            s[ok] = (12 // k) * (xi[r2[ok], c2[ok]] - z0[ok])
            a = np.where(ok, np.maximum(a, s), a)
            b = np.where(ok, np.minimum(b, s), b)
            seen |= ok
        plus = seen & (a > -b)
        minus = seen & (-b > a)
        n_plus += plus
        n_minus += minus
    table = np.asarray(GEOMORPHON_TABLE, np.int64)
    landform = table[n_minus, n_plus]
    return gr.astype(np.int64), gc.astype(np.int64), n_plus, n_minus, landform


def geomorphon_lattice(images_ds, lookup: int = 4, step: int = 7):
    """Per-image geomorphon landforms on the global ``step`` lattice:
    Dataset[(image_id, r, c, n_plus, n_minus, landform)]."""
    from rasters_ray import codec as _codec

    def run(t: pa.Table) -> pa.Table:
        ids, rs, cs, ps, ms, lf = [], [], [], [], [], []
        for i in range(t.num_rows):
            px = _codec.decode(t.column("bytes")[i].as_py(),
                               t.column("fmt")[i].as_py())
            gr, gc, npl, nmi, form = geomorphons(px, lookup=lookup, step=step)
            ids.extend([t.column("image_id")[i].as_py()] * len(gr))
            rs.append(gr); cs.append(gc); ps.append(npl)
            ms.append(nmi); lf.append(form)
        cat = (lambda parts, t_: pa.array(np.concatenate(parts) if parts
                                          else [], t_))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "r": cat(rs, pa.int64()),
            "c": cat(cs, pa.int64()),
            "n_plus": cat(ps, pa.int64()),
            "n_minus": cat(ms, pa.int64()),
            "landform": cat(lf, pa.int64()),
        })

    return images_ds.map_batches(run, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# hypsometric analysis (Strahler 1952)
# ---------------------------------------------------------------------------


def hypsometric_arrays(px: np.ndarray, n_bins: int = 10):
    """Hypsometric integral + curve of one integer DEM, all-exact.

    Returns (n, vmin, vmax, sum_v, hi_num, hi_den, above) where
    HI = (mean - min) / (max - min) = hi_num / hi_den with
    hi_num = sum - n*min and hi_den = n*(max - min), and
    above[k-1] = #pixels with relative elevation strictly above k/n_bins
    — the integer cross-multiplied compare n_bins*(v - min) > k*(max -
    min), so the curve needs no float thresholds."""
    v = np.rint(px[np.isfinite(px)]).astype(np.int64).ravel()
    n = int(v.size)
    if n == 0:
        return 0, 0, 0, 0, 0, 0, np.zeros(n_bins - 1, np.int64)
    vmin, vmax = int(v.min()), int(v.max())
    sum_v = int(v.sum())
    rel = n_bins * (v - vmin)  # vs k * (vmax - vmin)
    ks = np.arange(1, n_bins, dtype=np.int64) * (vmax - vmin)
    above = (rel[:, None] > ks[None, :]).sum(axis=0).astype(np.int64)
    return n, vmin, vmax, sum_v, sum_v - n * vmin, n * (vmax - vmin), above


def hypsometric_stats(images_ds, n_bins: int = 10):
    """Per-image hypsometric summary -> one row per image: exact HI
    ratio integers plus the (n_bins-1)-point cumulative curve as
    above_k columns.  No shuffle; per-image map like image_moments."""

    def kernel(t: pa.Table) -> pa.Table:
        cols = {"image_id": [], "n_px": [], "vmin": [], "vmax": [],
                "sum_v": [], "hi_num": [], "hi_den": []}
        curves = []
        if t.num_rows:
            blobs = codec.BlobReader(t.column("bytes"))
            fmts = t.column("fmt").to_pylist()
            ids = t.column("image_id").to_pylist()
            for i in range(t.num_rows):
                px = codec.decode(blobs[i], fmts[i])
                n, lo, hi, s, hn, hd, above = hypsometric_arrays(px, n_bins)
                cols["image_id"].append(ids[i])
                cols["n_px"].append(n)
                cols["vmin"].append(lo)
                cols["vmax"].append(hi)
                cols["sum_v"].append(s)
                cols["hi_num"].append(hn)
                cols["hi_den"].append(hd)
                curves.append(above)
        out = {
            "image_id": pa.array(cols["image_id"], pa.string()),
            "n_px": pa.array(cols["n_px"], pa.int64()),
            "vmin": pa.array(cols["vmin"], pa.int64()),
            "vmax": pa.array(cols["vmax"], pa.int64()),
            "sum_v": pa.array(cols["sum_v"], pa.int64()),
            "hi_num": pa.array(cols["hi_num"], pa.int64()),
            "hi_den": pa.array(cols["hi_den"], pa.int64()),
        }
        cur = (np.vstack(curves) if curves
               else np.zeros((0, n_bins - 1), np.int64))
        for k in range(1, n_bins):
            out[f"above_{k}"] = pa.array(cur[:, k - 1], pa.int64())
        return pa.table(out)

    return images_ds.map_batches(kernel, batch_format="pyarrow")
