"""Pixel feature detectors: Harris corners and local binary patterns.

The interest-point / texture-descriptor layer of an imagery pipeline
(the reference stops at per-pixel math, ``rasters/raster.py``), kept
INTEGER-exact so oracles replay them:

* ``harris_response`` — Harris & Stephens 1988 corner response on
  Sobel gradients with a 3x3 structure-tensor window.  With k = 1/20
  the response is reported as the integer ``20 * det(M) - trace(M)^2``
  (all Sobel sums are integers for integral pixels), i.e. 20x the
  classic ``det - 0.05 * trace^2``.
* ``harris_peak`` — strongest response and its position (first
  row-major maximum).
* ``lbp_codes`` — the 8-bit local binary pattern (Ojala, Pietikainen
  & Maenpaa 2002, fixed radius 1): bit j set when the j-th neighbor in
  ESRI D8 order (E, SE, S, SW, W, NW, N, NE) is >= the center.  Codes
  are computed for interior pixels only (all 8 neighbors in-raster);
  border pixels report -1.

Scale shape: per-image map_batches kernels (shifted-array vectorized),
no shuffle; both fit ``focal.halo_exchange_tiled`` directly for
mosaics (radius 2 for Harris: Sobel + window; radius 1 for LBP).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rasters_ray import codec

__all__ = ["harris_response", "harris_peak", "lbp_codes",
           "feature_stats", "rle_row_stats", "gradient_octants",
           "hog_cell_histogram", "hog_images", "bayer_dither_counts",
           "dither_images", "BAYER4",
           "euler_quads", "euler_images"]

_D8_ORDER = [(0, 1), (1, 1), (1, 0), (1, -1),
             (0, -1), (-1, -1), (-1, 0), (-1, 1)]


def _sobel(z: np.ndarray):
    """Integer Sobel gradients for interior pixels (3x3 support)."""
    gx = (z[:-2, 2:] + 2 * z[1:-1, 2:] + z[2:, 2:]
          - z[:-2, :-2] - 2 * z[1:-1, :-2] - z[2:, :-2])
    gy = (z[2:, :-2] + 2 * z[2:, 1:-1] + z[2:, 2:]
          - z[:-2, :-2] - 2 * z[:-2, 1:-1] - z[:-2, 2:])
    return gx, gy


def harris_response(arr: np.ndarray) -> np.ndarray:
    """Integer Harris response ``20*det - trace^2`` (k = 1/20) with a
    3x3 flat structure-tensor window.  Output matches the input shape;
    the 2-pixel frame where the support leaves the raster is the
    int64 minimum (never a peak)."""
    z = np.asarray(arr)
    if z.ndim != 2 or z.shape[0] < 5 or z.shape[1] < 5:
        raise ValueError("harris_response needs a 2D raster >= 5x5")
    zi = z.astype(np.int64)
    if not np.array_equal(zi, np.asarray(z, dtype=np.float64)):
        raise ValueError("harris_response requires integral pixels")
    gx, gy = _sobel(zi)
    xx, xy, yy = gx * gx, gx * gy, gy * gy

    def box3(a):
        s = a[:-2, :-2] + a[:-2, 1:-1] + a[:-2, 2:] \
            + a[1:-1, :-2] + a[1:-1, 1:-1] + a[1:-1, 2:] \
            + a[2:, :-2] + a[2:, 1:-1] + a[2:, 2:]
        return s

    sxx, sxy, syy = box3(xx), box3(xy), box3(yy)
    resp = 20 * (sxx * syy - sxy * sxy) - (sxx + syy) ** 2
    out = np.full(z.shape, np.iinfo(np.int64).min, dtype=np.int64)
    out[2:-2, 2:-2] = resp
    return out


def harris_peak(arr: np.ndarray):
    """``(row, col, response)`` of the strongest Harris response;
    ties break to the first position row-major."""
    resp = harris_response(arr)
    idx = int(np.argmax(resp))
    r, c = divmod(idx, resp.shape[1])
    return r, c, int(resp[r, c])


def lbp_codes(arr: np.ndarray) -> np.ndarray:
    """8-bit LBP codes (int64); border pixels -1."""
    z = np.asarray(arr, dtype=np.float64)
    if z.ndim != 2 or z.shape[0] < 3 or z.shape[1] < 3:
        raise ValueError("lbp_codes needs a 2D raster >= 3x3")
    center = z[1:-1, 1:-1]
    code = np.zeros(center.shape, dtype=np.int64)
    for j, (dr, dc) in enumerate(_D8_ORDER):
        nbr = z[1 + dr:z.shape[0] - 1 + dr, 1 + dc:z.shape[1] - 1 + dc]
        code |= (nbr >= center).astype(np.int64) << j
    out = np.full(z.shape, -1, dtype=np.int64)
    out[1:-1, 1:-1] = code
    return out


def feature_stats(images_ds):
    """Per-image feature summary over an image Dataset (rows carry
    ``image_id`` / ``bytes`` / ``fmt``): the Harris peak and the LBP
    code sum / all-ones count over interior pixels.  One map_batches,
    nothing shuffles."""

    def run(t: pa.Table) -> pa.Table:
        cols = {"image_id": [], "peak_r": [], "peak_c": [],
                "peak_resp": [], "lbp_sum": [], "n_lbp255": []}
        for i in range(t.num_rows):
            px = codec.decode(t.column("bytes")[i].as_py(),
                              t.column("fmt")[i].as_py())
            r, c, resp = harris_peak(px)
            codes = lbp_codes(px)
            interior = codes[codes >= 0]
            cols["image_id"].append(t.column("image_id")[i].as_py())
            cols["peak_r"].append(r)
            cols["peak_c"].append(c)
            cols["peak_resp"].append(resp)
            cols["lbp_sum"].append(int(interior.sum()))
            cols["n_lbp255"].append(int(np.sum(interior == 255)))
        return pa.table(
            {k: pa.array(v, pa.string() if k == "image_id" else pa.int64())
             for k, v in cols.items()})

    return images_ds.map_batches(run, batch_format="pyarrow")


def rle_row_stats(arr: np.ndarray) -> tuple:
    """Row-wise run-length profile of a raster — the storage-planning
    statistic behind RLE/PackBits-style encoders (TIFF 6.0 §9) and a
    cheap texture proxy: ``(n_runs, max_run, n_const_rows)`` where a
    run is a maximal stretch of equal values along a row.  Pure
    vectorized diffs, int64-exact for any exact dtype."""
    a = np.asarray(arr)
    if a.ndim != 2 or a.size == 0:
        raise ValueError("rle_row_stats expects a non-empty 2D array")
    h, w = a.shape
    starts = np.ones((h, w), dtype=bool)
    starts[:, 1:] = a[:, 1:] != a[:, :-1]
    n_runs = int(starts.sum())
    # run lengths: distance between consecutive starts in the flattened
    # per-row stream, with a sentinel column marking each row end so the
    # last run of a row terminates; diffs that START at a sentinel (the
    # sentinel -> next-row-start hop) are discarded
    grid = np.column_stack([starts, np.ones(h, dtype=bool)])
    idx = np.flatnonzero(grid.ravel())
    from_sentinel = (idx % (w + 1)) == w
    lengths = np.diff(idx)[~from_sentinel[:-1]]
    max_run = int(lengths.max())
    n_const = int((starts.sum(axis=1) == 1).sum())
    return n_runs, max_run, n_const


# eight half-open 45-degree octants of atan2(gy, gx) in [0, 360),
# decided purely by integer comparisons (no trig) — the branch list is
# an exclusive, exhaustive partition replayed verbatim as SQL CASE arms
_OCTANT_CONDS = (
    lambda gx, gy: (gx > 0) & (gy >= 0) & (gy < gx),          # [0, 45)
    lambda gx, gy: (gy > 0) & (gx > 0) & (gy >= gx),          # [45, 90)
    lambda gx, gy: (gy > 0) & (gx <= 0) & (-gx < gy),         # [90, 135)
    lambda gx, gy: (gy > 0) & (gx < 0) & (-gx >= gy),         # [135, 180)
    lambda gx, gy: (gy <= 0) & (gx < 0) & (-gy < -gx),        # [180, 225)
    lambda gx, gy: (gy < 0) & (gx < 0) & (-gy >= -gx),        # [225, 270)
    lambda gx, gy: (gy < 0) & (gx >= 0) & (gx < -gy),         # [270, 315)
    lambda gx, gy: (gy < 0) & (gx > 0) & (gx >= -gy),         # [315, 360)
)


def gradient_octants(arr: np.ndarray):
    """Central-difference gradients and their octant for interior
    pixels: ``(gx, gy, oct)`` int64 arrays over arr[1:-1, 1:-1]; pixels
    with gx == gy == 0 get octant -1 (skipped by HOG)."""
    z = np.rint(np.asarray(arr)).astype(np.int64)
    gx = z[1:-1, 2:] - z[1:-1, :-2]
    gy = z[2:, 1:-1] - z[:-2, 1:-1]
    oct_ = np.full(gx.shape, -1, dtype=np.int64)
    for k, cond in enumerate(_OCTANT_CONDS):
        oct_[cond(gx, gy) & (oct_ < 0)] = k
    return gx, gy, oct_


def hog_cell_histogram(arr: np.ndarray, cell: int = 10):
    """HOG cell histograms (Dalal & Triggs 2005, integer form): per
    ``cell x cell`` block of interior pixels, the L1-magnitude-weighted
    8-octant orientation histogram -> (cy, cx, sector, w, n) arrays.
    Weights |gx|+|gy| and the octant test are exact integers."""
    gx, gy, oct_ = gradient_octants(arr)
    r = np.arange(1, arr.shape[0] - 1).reshape(-1, 1)
    c = np.arange(1, arr.shape[1] - 1).reshape(1, -1)
    cy = np.broadcast_to(r // cell, gx.shape)
    cx = np.broadcast_to(c // cell, gx.shape)
    keep = oct_ >= 0
    w = np.abs(gx) + np.abs(gy)
    key = ((cy * 1024 + cx) * 8 + oct_)[keep]
    uk, inv = np.unique(key, return_inverse=True)
    wsum = np.zeros(len(uk), np.int64)
    np.add.at(wsum, inv, w[keep])
    n = np.bincount(inv, minlength=len(uk)).astype(np.int64)
    return (uk // 8 // 1024, (uk // 8) % 1024, uk % 8, wsum, n)


def hog_images(images_ds, cell: int = 10, transform=None):
    """HOG cell histograms per image -> Dataset[(image_id, cy, cx,
    sector, w, n)].  Per-image map, nothing shuffles; ``transform``
    decorrelates formula surfaces (the fast_corners pattern)."""

    def run(t: pa.Table) -> pa.Table:
        out = {k: [] for k in ("image_id", "cy", "cx", "sector", "w", "n")}
        for i in range(t.num_rows):
            px = codec.decode(t.column("bytes")[i].as_py(),
                              t.column("fmt")[i].as_py())
            px = np.rint(px).astype(np.int64)
            if transform is not None:
                px = transform(px)
            cy, cx, sec, w, n = hog_cell_histogram(px, cell)
            out["image_id"].extend(
                [t.column("image_id")[i].as_py()] * len(cy))
            out["cy"].extend(cy.tolist())
            out["cx"].extend(cx.tolist())
            out["sector"].extend(sec.tolist())
            out["w"].extend(w.tolist())
            out["n"].extend(n.tolist())
        return pa.table(
            {k: pa.array(v, pa.string() if k == "image_id" else pa.int64())
             for k, v in out.items()})

    return images_ds.map_batches(run, batch_format="pyarrow")


# Bayer 4x4 index matrix (the classic dispersed-dot ordered dither)
BAYER4 = np.array(
    [[0, 8, 2, 10], [12, 4, 14, 6], [3, 11, 1, 9], [15, 7, 13, 5]],
    dtype=np.int64,
)


def bayer_dither_counts(arr: np.ndarray):
    """Ordered 4x4 Bayer dithering: pixel fires when
    ``v > B[r%4, c%4] * 16 + 8`` (the mid-step threshold on a 0..255
    scale).  Returns per-phase set counts -> (pr, pc, n_set, n_px)."""
    z = np.rint(np.asarray(arr)).astype(np.int64)
    h, wd = z.shape
    r = np.arange(h).reshape(-1, 1) % 4
    c = np.arange(wd).reshape(1, -1) % 4
    thr = BAYER4[r, c] * 16 + 8
    fired = z > thr
    key = (np.broadcast_to(r, z.shape) * 4 + np.broadcast_to(c, z.shape))
    n_set = np.bincount(key.ravel(), weights=fired.ravel(),
                        minlength=16).astype(np.int64)
    n_px = np.bincount(key.ravel(), minlength=16).astype(np.int64)
    pr, pc = np.arange(16) // 4, np.arange(16) % 4
    return pr.astype(np.int64), pc.astype(np.int64), n_set, n_px


def dither_images(images_ds):
    """Bayer dither phase counts per image -> Dataset[(image_id, pr,
    pc, n_set, n_px)].  Per-image map, nothing shuffles."""

    def run(t: pa.Table) -> pa.Table:
        out = {k: [] for k in ("image_id", "pr", "pc", "n_set", "n_px")}
        for i in range(t.num_rows):
            px = codec.decode(t.column("bytes")[i].as_py(),
                              t.column("fmt")[i].as_py())
            pr, pc, ns, npx = bayer_dither_counts(px)
            out["image_id"].extend(
                [t.column("image_id")[i].as_py()] * len(pr))
            out["pr"].extend(pr.tolist())
            out["pc"].extend(pc.tolist())
            out["n_set"].extend(ns.tolist())
            out["n_px"].extend(npx.tolist())
        return pa.table(
            {k: pa.array(v, pa.string() if k == "image_id" else pa.int64())
             for k, v in out.items()})

    return images_ds.map_batches(run, batch_format="pyarrow")


def euler_quads(mask: np.ndarray):
    """Gray 1971 quad-pattern counts over the zero-padded binary mask:
    ``(q1, q3, qd)`` = 2x2 windows with exactly one set pixel, exactly
    three, and the two diagonal patterns.  The 4- and 8-connectivity
    Euler numbers are (q1 - q3 + 2*qd) / 4 and (q1 - q3 - 2*qd) / 4
    (diagonal touches split components under 4-connectivity, so qd
    counts POSITIVE there) — kept x4 as exact integers downstream."""
    m = np.asarray(mask, dtype=np.int64)
    p = np.zeros((m.shape[0] + 2, m.shape[1] + 2), dtype=np.int64)
    p[1:-1, 1:-1] = m
    p00, p01 = p[:-1, :-1], p[:-1, 1:]
    p10, p11 = p[1:, :-1], p[1:, 1:]
    s = p00 + p01 + p10 + p11
    q1 = int((s == 1).sum())
    q3 = int((s == 3).sum())
    qd = int((((p00 == 1) & (p11 == 1) & (p01 == 0) & (p10 == 0))
              | ((p01 == 1) & (p10 == 1) & (p00 == 0) & (p11 == 0))).sum())
    return q1, q3, qd


def euler_images(images_ds, threshold: int, transform=None):
    """Quad counts + x4 Euler numbers of the mask v > threshold per
    image -> Dataset[(image_id, q1, q3, qd, e4_x4, e8_x4)]."""
    def run(t: pa.Table) -> pa.Table:
        out = {k: [] for k in ("image_id", "q1", "q3", "qd",
                               "e4_x4", "e8_x4")}
        for i in range(t.num_rows):
            px = codec.decode(t.column("bytes")[i].as_py(),
                              t.column("fmt")[i].as_py())
            z = np.rint(px).astype(np.int64)
            if transform is not None:
                z = transform(z)
            q1, q3, qd = euler_quads(z > threshold)
            out["image_id"].append(t.column("image_id")[i].as_py())
            out["q1"].append(q1)
            out["q3"].append(q3)
            out["qd"].append(qd)
            out["e4_x4"].append(q1 - q3 + 2 * qd)
            out["e8_x4"].append(q1 - q3 - 2 * qd)
        return pa.table(
            {k: pa.array(v, pa.string() if k == "image_id" else pa.int64())
             for k, v in out.items()})

    return images_ds.map_batches(run, batch_format="pyarrow")
