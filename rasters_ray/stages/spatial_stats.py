"""Spatial autocorrelation: Moran's I and Geary's C on rasters.

The classic global spatial statistics (Moran 1950; Geary 1954 — the
ArcGIS Spatial Autocorrelation tool and PySAL ``esda`` equivalents),
absent from the reference (whose stats end at display stretches,
``rasters/raster.py:1997-2006``).  Weights here are binary ROOK
adjacency (4-neighborhood, symmetric), the common raster default.

Both statistics are ratios of INTEGER sufficient statistics for
integral pixels, so oracles are exact without float replay:

* Moran's I = (n / W) * (A / B) where, scaling deviations by n so they
  stay integral (y_i = n*x_i - S with S = sum x):
  ``A = sum over ordered rook pairs of y_i * y_j``
  ``B = n * sum_i y_i^2 / n^2`` — reported as ``b_num = sum y_i^2``
  so I = n * A / (W * b_num) exactly.
* Geary's C = ((n-1) / (2W)) * (sum over ordered pairs (x_i - x_j)^2)
  / (sum (x_i - mu)^2) = (n-1) * n * D / (2 * W * b_num / n) — with
  ``D = sum over ordered rook pairs (x_i - x_j)^2`` integral directly.

``moran_stats`` returns the integer pieces; ``moran_i`` / ``geary_c``
the float ratios.  Scale shape: per-image map_batches kernels
(vectorized shifted products), no shuffle; a tiled variant needs only
per-tile partial sums + one tiny halo for cross-tile pairs — partials
are plain integer adds, so the combine is exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rasters_ray import codec

__all__ = [
    "moran_stats",
    "moran_i",
    "geary_c",
    "autocorr_stats",
    "getis_gi_star",
    "self_nn_min_d2",
    "clark_evans_stats",
    "hotspot_lattice",
    "local_moran",
    "lisa_lattice",
    "semivariogram",
    "variogram_images",
    "trend_surface",
    "trend_images",
    "std_ellipse_ints",
    "quadrat_vmr_ints",
    "ripley_pair_counts",
]


def moran_stats(arr: np.ndarray) -> dict:
    """Integer sufficient statistics over ordered rook pairs."""
    x = np.asarray(arr)
    if x.ndim != 2 or x.size < 2:
        raise ValueError("need a 2D raster with >= 2 cells")
    if not np.issubdtype(x.dtype, np.integer):
        if not np.all(np.isfinite(x)) or np.any(x != np.rint(x)):
            raise ValueError("moran_stats requires integral pixel values")
    xi = x.astype(np.int64)
    n = int(xi.size)
    s = int(xi.sum())
    # assemble the n-scaled quantities from small int64 partial sums in
    # exact Python ints, so nothing overflows even for megapixel tiles:
    # A = sum pairs (n*xi - S)(n*xj - S)
    #   = n^2 * sum(xi*xj) - n*S * sum(xi + xj) + n_pairs * S^2
    cross = int((xi[:, :-1] * xi[:, 1:]).sum()
                + (xi[:-1, :] * xi[1:, :]).sum()) * 2
    psum = int((xi[:, :-1] + xi[:, 1:]).sum()
               + (xi[:-1, :] + xi[1:, :]).sum()) * 2
    d = int(((xi[:, :-1] - xi[:, 1:]) ** 2).sum()
            + ((xi[:-1, :] - xi[1:, :]) ** 2).sum()) * 2
    w = 2 * (x.shape[0] * (x.shape[1] - 1) + (x.shape[0] - 1) * x.shape[1])
    a = n * n * cross - n * s * psum + w * s * s
    # B = sum (n*x - S)^2 = n^2 * sum x^2 - n * S^2
    sumsq = int((xi * xi).sum())
    b = n * n * sumsq - n * s * s
    return {"n": n, "w_sum": w, "a_cross": a, "d_diff": d, "b_num": b}


def moran_i(arr: np.ndarray) -> float:
    """Global Moran's I with rook weights (row-standardization off)."""
    st = moran_stats(arr)
    if st["b_num"] == 0:
        raise ValueError("constant raster: Moran's I undefined")
    return float(st["n"] * st["a_cross"]) / float(
        st["w_sum"] * st["b_num"])


def geary_c(arr: np.ndarray) -> float:
    """Global Geary's C with rook weights."""
    st = moran_stats(arr)
    if st["b_num"] == 0:
        raise ValueError("constant raster: Geary's C undefined")
    # b_num = sum (n*x - S)^2 = n^2 * sum (x - mu)^2
    return (float((st["n"] - 1) * st["d_diff"]) * st["n"] * st["n"] / (
        2.0 * st["w_sum"] * st["b_num"]))


def autocorr_stats(images_ds):
    """Per-image autocorrelation summary over an image Dataset (rows
    carry ``image_id`` / ``bytes`` / ``fmt``): the integer sufficient
    statistics plus the float I and C.  One map_batches, nothing
    shuffles."""

    def run(t: pa.Table) -> pa.Table:
        cols = {"image_id": [], "a_cross": [], "d_diff": [],
                "b_num": [], "w_sum": [], "moran_i": [], "geary_c": []}
        for i in range(t.num_rows):
            px = codec.decode(t.column("bytes")[i].as_py(),
                              t.column("fmt")[i].as_py())
            st = moran_stats(px)
            cols["image_id"].append(t.column("image_id")[i].as_py())
            cols["a_cross"].append(st["a_cross"])
            cols["d_diff"].append(st["d_diff"])
            cols["b_num"].append(st["b_num"])
            cols["w_sum"].append(st["w_sum"])
            cols["moran_i"].append(moran_i(px))
            cols["geary_c"].append(geary_c(px))
        return pa.table({
            "image_id": pa.array(cols["image_id"], pa.string()),
            "a_cross": pa.array(cols["a_cross"], pa.int64()),
            "d_diff": pa.array(cols["d_diff"], pa.int64()),
            "b_num": pa.array(cols["b_num"], pa.int64()),
            "w_sum": pa.array(cols["w_sum"], pa.int64()),
            "moran_i": pa.array(cols["moran_i"], pa.float64()),
            "geary_c": pa.array(cols["geary_c"], pa.float64()),
        })

    return images_ds.map_batches(run, batch_format="pyarrow")


def getis_gi_star(arr: np.ndarray, step: int = 1):
    """Getis-Ord Gi* hot spot z-scores (Ord & Getis 1995; the ArcGIS
    Hot Spot Analysis tool) with binary QUEEN weights including self
    (the raster default: the 3x3 window, clipped at edges).

    Everything under the square roots is an INTEGER sufficient
    statistic, so the float z is a single fixed-order expression —
    with n = cells, S = sum x, Q = sum x^2, L_i = 3x3 window sum,
    W_i = 3x3 window cell count:

        z_i = (n*L_i - W_i*S) * sqrt(n - 1)
              / sqrt((n*Q - S^2) * (n*W_i - W_i^2))

    replayable bit-for-bit in SQL (mul, sqrt, div in that order).
    Returns (rows, cols, z_num, w_cnt, gi_z) for cells on the global
    ``step`` lattice.  Scale shape: per-image vectorized window sums;
    the tiled variant needs a 1-pixel halo plus broadcast (n, S, Q)
    partials — both integer-exact."""
    x = np.asarray(arr)
    if x.ndim != 2 or x.size < 2:
        raise ValueError("need a 2D raster with >= 2 cells")
    if not np.issubdtype(x.dtype, np.integer):
        if not np.all(np.isfinite(x)) or np.any(x != np.rint(x)):
            raise ValueError("getis_gi_star requires integral pixel values")
    xi = x.astype(np.int64)
    h, w = xi.shape
    n = int(xi.size)
    s = int(xi.sum())
    q = int((xi * xi).sum())
    den1 = n * q - s * s
    if den1 == 0:
        raise ValueError("constant raster: Gi* undefined")
    # clipped 3x3 window sums via padded shifted adds (vectorized)
    pad = np.zeros((h + 2, w + 2), np.int64)
    pad[1:-1, 1:-1] = xi
    ones = np.zeros((h + 2, w + 2), np.int64)
    ones[1:-1, 1:-1] = 1
    loc = np.zeros((h, w), np.int64)
    cnt = np.zeros((h, w), np.int64)
    for dr in (0, 1, 2):
        for dc in (0, 1, 2):
            loc += pad[dr:dr + h, dc:dc + w]
            cnt += ones[dr:dr + h, dc:dc + w]
    rr = np.arange(0, h, step)
    cc = np.arange(0, w, step)
    gr, gc = np.meshgrid(rr, cc, indexing="ij")
    gr, gc = gr.ravel(), gc.ravel()
    li = loc[gr, gc]
    wi = cnt[gr, gc]
    z_num = n * li - wi * s
    den = (den1 * (n * wi - wi * wi)).astype(np.float64)
    gi = z_num.astype(np.float64) * np.sqrt(np.float64(n - 1)) / np.sqrt(den)
    return gr.astype(np.int64), gc.astype(np.int64), z_num.astype(np.int64), \
        wi.astype(np.int64), gi


def hotspot_lattice(images_ds, step: int = 7):
    """Per-image Gi* hot spot surface sampled on the global ``step``
    lattice: Dataset[(image_id, r, c, z_num, w_cnt, gi_z)].  One
    map_batches, nothing shuffles."""

    def run(t: pa.Table) -> pa.Table:
        ids, rs, cs, zn, wc, gz = [], [], [], [], [], []
        for i in range(t.num_rows):
            px = codec.decode(t.column("bytes")[i].as_py(),
                              t.column("fmt")[i].as_py())
            gr, gc, z_num, wi, gi = getis_gi_star(px, step=step)
            ids.extend([t.column("image_id")[i].as_py()] * len(gr))
            rs.append(gr); cs.append(gc); zn.append(z_num)
            wc.append(wi); gz.append(gi)
        cat = (lambda parts, t_: pa.array(np.concatenate(parts) if parts
                                          else [], t_))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "r": cat(rs, pa.int64()),
            "c": cat(cs, pa.int64()),
            "z_num": cat(zn, pa.int64()),
            "w_cnt": cat(wc, pa.int64()),
            "gi_z": cat(gz, pa.float64()),
        })

    return images_ds.map_batches(run, batch_format="pyarrow")


def local_moran(arr: np.ndarray, step: int = 1):
    """Anselin's Local Moran (LISA, Anselin 1995; the ArcGIS Cluster
    and Outlier Analysis tool) with binary ROOK weights, kept exact by
    n-scaling deviations to integers (y_i = n*x_i - S):

        I_i  = n * y_i * R_i / b_num          (one integer ratio)
        y_i  = n*x_i - S
        R_i  = sum over rook neighbours of y_j = n*L_i - k_i*S
        b_num = sum y^2 = n^2*Q - n*S^2

    plus the LISA cluster quadrant: 1=HH, 2=LL, 3=HL (high outlier),
    4=LH (low outlier), 0 when y_i or R_i is exactly 0.  Returns
    (rows, cols, li_num = y_i*R_i, k_cnt, local_i, quadrant) on the
    global ``step`` lattice.  Same scale shape as getis_gi_star."""
    x = np.asarray(arr)
    if x.ndim != 2 or x.size < 2:
        raise ValueError("need a 2D raster with >= 2 cells")
    if not np.issubdtype(x.dtype, np.integer):
        if not np.all(np.isfinite(x)) or np.any(x != np.rint(x)):
            raise ValueError("local_moran requires integral pixel values")
    xi = x.astype(np.int64)
    h, w = xi.shape
    n = int(xi.size)
    s = int(xi.sum())
    q = int((xi * xi).sum())
    b_num = n * n * q - n * s * s
    if b_num == 0:
        raise ValueError("constant raster: local Moran undefined")
    pad = np.zeros((h + 2, w + 2), np.int64)
    pad[1:-1, 1:-1] = xi
    ones = np.zeros((h + 2, w + 2), np.int64)
    ones[1:-1, 1:-1] = 1
    loc = np.zeros((h, w), np.int64)
    cnt = np.zeros((h, w), np.int64)
    for dr, dc in ((0, 1), (2, 1), (1, 0), (1, 2)):
        loc += pad[dr:dr + h, dc:dc + w]
        cnt += ones[dr:dr + h, dc:dc + w]
    rr = np.arange(0, h, step)
    cc = np.arange(0, w, step)
    gr, gc = np.meshgrid(rr, cc, indexing="ij")
    gr, gc = gr.ravel(), gc.ravel()
    y = n * xi[gr, gc] - s
    ri = n * loc[gr, gc] - cnt[gr, gc] * s
    li_num = y * ri
    local_i = (n * li_num).astype(np.float64) / np.float64(b_num)
    quad = np.zeros(len(gr), np.int64)
    quad[(y > 0) & (ri > 0)] = 1
    quad[(y < 0) & (ri < 0)] = 2
    quad[(y > 0) & (ri < 0)] = 3
    quad[(y < 0) & (ri > 0)] = 4
    return gr.astype(np.int64), gc.astype(np.int64), li_num, \
        cnt[gr, gc], local_i, quad


def lisa_lattice(images_ds, step: int = 7):
    """Per-image LISA surface on the global ``step`` lattice:
    Dataset[(image_id, r, c, li_num, k_cnt, local_i, quadrant)]."""

    def run(t: pa.Table) -> pa.Table:
        ids, rs, cs, ln, kc, li, qd = [], [], [], [], [], [], []
        for i in range(t.num_rows):
            px = codec.decode(t.column("bytes")[i].as_py(),
                              t.column("fmt")[i].as_py())
            gr, gc, li_num, kcnt, loc_i, quad = local_moran(px, step=step)
            ids.extend([t.column("image_id")[i].as_py()] * len(gr))
            rs.append(gr); cs.append(gc); ln.append(li_num)
            kc.append(kcnt); li.append(loc_i); qd.append(quad)
        cat = (lambda parts, t_: pa.array(np.concatenate(parts) if parts
                                          else [], t_))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "r": cat(rs, pa.int64()),
            "c": cat(cs, pa.int64()),
            "li_num": cat(ln, pa.int64()),
            "k_cnt": cat(kc, pa.int64()),
            "local_i": cat(li, pa.float64()),
            "quadrant": cat(qd, pa.int64()),
        })

    return images_ds.map_batches(run, batch_format="pyarrow")


def semivariogram(arr: np.ndarray, max_lag: int = 8):
    """Empirical semivariogram (Matheron 1963; the gstat / ArcGIS
    Geostatistical Analyst estimator) for axis-aligned integer lags
    h = 1..max_lag, row and column directions pooled (the isotropic
    rook-axes variant):

        gamma(h) = sum over pairs at lag h of (x_i - x_j)^2
                   / (2 * N(h))

    The pair sum and count are INTEGER sufficient statistics
    (vectorized shifted differences); gamma is one exact ratio.
    Returns (lags, d2sum, n_pairs, gamma) arrays.  Scale shape: per
    image (or per tile + halo of width max_lag), partials are plain
    integer adds."""
    x = np.asarray(arr)
    if x.ndim != 2:
        raise ValueError("need a 2D raster")
    if not np.issubdtype(x.dtype, np.integer):
        if not np.all(np.isfinite(x)) or np.any(x != np.rint(x)):
            raise ValueError("semivariogram requires integral pixel values")
    xi = x.astype(np.int64)
    h_, w_ = xi.shape
    if max_lag >= max(h_, w_):
        raise ValueError("max_lag must be smaller than the raster extent")
    lags = np.arange(1, max_lag + 1, dtype=np.int64)
    d2 = np.zeros(max_lag, np.int64)
    npairs = np.zeros(max_lag, np.int64)
    for i, h in enumerate(lags):
        h = int(h)
        if h < w_:
            dc = xi[:, :-h] - xi[:, h:]
            d2[i] += int((dc * dc).sum())
            npairs[i] += h_ * (w_ - h)
        if h < h_:
            dr = xi[:-h, :] - xi[h:, :]
            d2[i] += int((dr * dr).sum())
            npairs[i] += (h_ - h) * w_
    gamma = d2.astype(np.float64) / (2 * npairs).astype(np.float64)
    return lags, d2, npairs, gamma


def variogram_images(images_ds, max_lag: int = 8):
    """Per-image empirical semivariogram:
    Dataset[(image_id, lag, d2sum, n_pairs, gamma)]."""

    def run(t: pa.Table) -> pa.Table:
        ids, ls, ds_, ns, gs = [], [], [], [], []
        for i in range(t.num_rows):
            px = codec.decode(t.column("bytes")[i].as_py(),
                              t.column("fmt")[i].as_py())
            lags, d2, npairs, gamma = semivariogram(px, max_lag=max_lag)
            ids.extend([t.column("image_id")[i].as_py()] * len(lags))
            ls.append(lags); ds_.append(d2); ns.append(npairs); gs.append(gamma)
        cat = (lambda parts, t_: pa.array(np.concatenate(parts) if parts
                                          else [], t_))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "lag": cat(ls, pa.int64()),
            "d2sum": cat(ds_, pa.int64()),
            "n_pairs": cat(ns, pa.int64()),
            "gamma": cat(gs, pa.float64()),
        })

    return images_ds.map_batches(run, batch_format="pyarrow")


def trend_surface(arr: np.ndarray):
    """First-order trend surface (the ArcGIS Trend tool, linear order):
    least-squares plane z ~ mean + slope_u * u + slope_v * v over the
    CENTERED doubled lattice coordinates

        u = 2*col - (w-1),   v = 2*row - (h-1)

    chosen because on a full regular grid Su = Sv = Suv = 0, so the
    3x3 normal equations diagonalize into three independent EXACT
    integer ratios:

        mean = Sz / n,  slope_u = Suz / Suu,  slope_v = Svz / Svv

    (the plane in pixel coords follows by substitution; the doubled
    coords keep everything integral).  Returns the integer sufficient
    statistics and the three float coefficients.  Scale shape: per-tile
    integer partial sums + one tiny combine — exact at any tiling."""
    x = np.asarray(arr)
    if x.ndim != 2 or x.size < 4:
        raise ValueError("need a 2D raster with >= 4 cells")
    if not np.issubdtype(x.dtype, np.integer):
        if not np.all(np.isfinite(x)) or np.any(x != np.rint(x)):
            raise ValueError("trend_surface requires integral pixel values")
    xi = x.astype(np.int64)
    h, w = xi.shape
    u = (2 * np.arange(w) - (w - 1)).astype(np.int64)[None, :]
    v = (2 * np.arange(h) - (h - 1)).astype(np.int64)[:, None]
    n = int(xi.size)
    s_z = int(xi.sum())
    s_uz = int((xi * u).sum())
    s_vz = int((xi * v).sum())
    suu = int(((u * u) * np.ones((h, 1), np.int64)).sum())
    svv = int(((v * v) * np.ones((1, w), np.int64)).sum())
    return {
        "n_px": n, "s_z": s_z, "s_uz": s_uz, "s_vz": s_vz,
        "suu": suu, "svv": svv,
        "mean": float(s_z) / float(n),
        "slope_u": float(s_uz) / float(suu),
        "slope_v": float(s_vz) / float(svv),
    }


def trend_images(images_ds):
    """Per-image first-order trend surface:
    Dataset[(image_id, s_z, s_uz, s_vz, mean, slope_u, slope_v)]."""

    def run(t: pa.Table) -> pa.Table:
        cols = {k: [] for k in ("image_id", "s_z", "s_uz", "s_vz",
                                "mean", "slope_u", "slope_v")}
        for i in range(t.num_rows):
            px = codec.decode(t.column("bytes")[i].as_py(),
                              t.column("fmt")[i].as_py())
            st = trend_surface(px)
            cols["image_id"].append(t.column("image_id")[i].as_py())
            for k in ("s_z", "s_uz", "s_vz", "mean", "slope_u", "slope_v"):
                cols[k].append(st[k])
        return pa.table({
            "image_id": pa.array(cols["image_id"], pa.string()),
            "s_z": pa.array(cols["s_z"], pa.int64()),
            "s_uz": pa.array(cols["s_uz"], pa.int64()),
            "s_vz": pa.array(cols["s_vz"], pa.int64()),
            "mean": pa.array(cols["mean"], pa.float64()),
            "slope_u": pa.array(cols["slope_u"], pa.float64()),
            "slope_v": pa.array(cols["slope_v"], pa.float64()),
        })

    return images_ds.map_batches(run, batch_format="pyarrow")


# ------------------------------------------------------- point patterns
#
# Centrographic and point-pattern statistics (the ArcGIS Spatial
# Statistics "Measuring Geographic Distributions" / "Analyzing
# Patterns" toolset; Ripley 1976 for K).  All three kernels reduce a
# point cloud to INTEGER sufficient statistics so distributed partial
# sums combine exactly and SQL oracles replay them bit-for-bit:
#
# * std_ellipse_ints: mean center + standard-deviational-ellipse
#   moments.  Deviations are scaled by n to stay integral:
#   sxx = n*sum(x^2) - sum(x)^2 (= n^2 * variance numerator), likewise
#   syy and sxy — the ellipse axes/rotation are pure functions of the
#   three (tan 2theta = 2*sxy / (sxx - syy)).
# * quadrat_vmr_ints: counts per quadrat cell; the variance-mean-ratio
#   test statistic kept integral as vmr_num = Q*sum(c^2) - n^2
#   (= Q^2 * variance numerator; VMR = vmr_num / (Q * n) exactly,
#   > 0 clustered, < 0 uniform for the scaled form).
# * ripley_pair_counts: unordered pair counts within each squared
#   radius — the unnormalized Ripley K(r) numerator (K = area *
#   2*pairs / n^2 is a pure function of it).


def std_ellipse_ints(pts: np.ndarray) -> tuple:
    """(n, sum_x, sum_y, sxx, syy, sxy) int64 sufficient statistics of
    the standard deviational ellipse for integer points (n, 2)."""
    p = np.asarray(pts, dtype=np.int64)
    if p.ndim != 2 or p.shape[1] != 2:
        raise ValueError("std_ellipse_ints expects (n, 2) integer points")
    n = np.int64(p.shape[0])
    x, y = p[:, 0], p[:, 1]
    sx, sy = x.sum(), y.sum()
    return (
        int(n), int(sx), int(sy),
        int(n * (x * x).sum() - sx * sx),
        int(n * (y * y).sum() - sy * sy),
        int(n * (x * y).sum() - sx * sy),
    )


def quadrat_vmr_ints(pts: np.ndarray, extent: int, q: int) -> tuple:
    """Quadrat analysis over a [0, extent)^2 domain cut into q x q
    cells: (n, n_quadrats, sum_c2, max_c, vmr_num) with
    vmr_num = Q*sum(c^2) - n^2.  Points outside the domain raise."""
    p = np.asarray(pts, dtype=np.int64)
    if p.ndim != 2 or p.shape[1] != 2:
        raise ValueError("quadrat_vmr_ints expects (n, 2) integer points")
    if extent % q:
        raise ValueError("extent must divide into q quadrats evenly")
    if p.size and (p.min() < 0 or p.max() >= extent):
        raise ValueError("points outside the quadrat domain")
    side = extent // q
    cell = (p[:, 1] // side) * q + (p[:, 0] // side)
    c = np.bincount(cell, minlength=q * q).astype(np.int64)
    n = np.int64(p.shape[0])
    Q = np.int64(q * q)
    return (int(n), int(Q), int((c * c).sum()), int(c.max()) if c.size else 0,
            int(Q * (c * c).sum() - n * n))


def ripley_pair_counts(pts: np.ndarray, r2s) -> list:
    """Unordered pair counts with squared Euclidean distance <= r2 for
    each threshold (the exact Ripley K numerator; duplicates count at
    distance 0).  O(n^2) per cloud by design — the per-group kernel of
    a grid-bucketed two-stage plan at scale (bucket by cell, count
    in-bucket + neighbor-bucket pairs; the thresholds bound the halo)."""
    p = np.asarray(pts, dtype=np.int64)
    if p.ndim != 2 or p.shape[1] != 2:
        raise ValueError("ripley_pair_counts expects (n, 2) integer points")
    d = p[:, None, :] - p[None, :, :]
    d2 = (d * d).sum(axis=2)
    iu = np.triu_indices(p.shape[0], k=1)
    du = d2[iu]
    return [int((du <= np.int64(r2)).sum()) for r2 in r2s]


# ---------------------------------------------------------------------------
# Clark-Evans nearest-neighbor index (Clark & Evans 1954)
# ---------------------------------------------------------------------------


def self_nn_min_d2(xi: np.ndarray, yi: np.ndarray, ids: list,
                   ref_xi: np.ndarray, ref_yi: np.ndarray, ref_ids: list):
    """Per-point min squared distance to any OTHER reference point.

    Integer coordinates -> exact int64 d2.  Self-exclusion is by id
    (coincident DISTINCT points legitimately yield d2 = 0, the CE
    convention).  O(batch x ref) vectorized matrix; the reference cloud
    is the broadcast small side (the engine's nearest_join shape) — a
    billion-point cloud takes the grid-bucketed/ANN plan instead."""
    if len(ref_ids) < 2:
        raise ValueError("need at least two reference points")
    dx = xi[:, None] - ref_xi[None, :]
    dy = yi[:, None] - ref_yi[None, :]
    d2 = dx * dx + dy * dy
    idx = {p: i for i, p in enumerate(ref_ids)}
    big = np.iinfo(np.int64).max
    for row, pid in enumerate(ids):
        j = idx.get(pid)
        if j is not None:
            d2[row, j] = big
    return d2.min(axis=1)


def clark_evans_stats(points_ds, ref: pa.Table, x_col: str = "x",
                      y_col: str = "y", id_col: str = "point_id",
                      scale: float = 1000.0):
    """Clark-Evans aggregation -> ONE row: n, sum of per-point
    floor(sqrt(d2)*1000) NN distances (exact int; sqrt is correctly
    rounded IEEE so SQL replays it), min/max NN d2, the integer bbox,
    and the R index as one fixed-order float expression.

    Coordinates are scaled by `scale` and rounded to int64 before any
    distance math.  R = mean_nn / (0.5 * sqrt(area / n)): R ~ 1 random,
    < 1 clustered, > 1 dispersed."""
    rx = np.rint(ref.column(x_col).to_numpy(zero_copy_only=False) * scale
                 ).astype(np.int64)
    ry = np.rint(ref.column(y_col).to_numpy(zero_copy_only=False) * scale
                 ).astype(np.int64)
    rids = ref.column(id_col).to_pylist()

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in
                             ("n", "sum_f", "min_d2", "max_d2",
                              "minx", "maxx", "miny", "maxy")})
        xi = np.rint(t.column(x_col).to_numpy(zero_copy_only=False) * scale
                     ).astype(np.int64)
        yi = np.rint(t.column(y_col).to_numpy(zero_copy_only=False) * scale
                     ).astype(np.int64)
        ids = t.column(id_col).to_pylist()
        d2 = self_nn_min_d2(xi, yi, ids, rx, ry, rids)
        f = np.floor(np.sqrt(d2.astype(np.float64)) * 1000.0).astype(np.int64)
        one = lambda v: pa.array([int(v)], pa.int64())  # noqa: E731
        return pa.table({
            "n": one(len(ids)), "sum_f": one(f.sum()),
            "min_d2": one(d2.min()), "max_d2": one(d2.max()),
            "minx": one(xi.min()), "maxx": one(xi.max()),
            "miny": one(yi.min()), "maxy": one(yi.max()),
        })

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        g = {c: t.column(c).to_numpy() for c in t.column_names}
        n = int(g["n"].sum())
        sum_f = int(g["sum_f"].sum())
        minx, maxx = int(g["minx"].min()), int(g["maxx"].max())
        miny, maxy = int(g["miny"].min()), int(g["maxy"].max())
        area = (maxx - minx) * (maxy - miny)
        r_index = ((float(sum_f) / float(n)) / 1000.0) / (
            0.5 * np.sqrt(float(area) / float(n)))
        one = lambda v: pa.array([int(v)], pa.int64())  # noqa: E731
        return pa.table({
            "n": one(n), "sum_f": one(sum_f),
            "min_nn_d2": one(g["min_d2"].min()),
            "max_nn_d2": one(g["max_d2"].max()),
            "minx": one(minx), "maxx": one(maxx),
            "miny": one(miny), "maxy": one(maxy),
            "r_index": pa.array([float(r_index)], pa.float64()),
        })

    return (
        points_ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow")
    )
