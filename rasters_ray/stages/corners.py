"""Interest-point detection: Harris corner response and FAST-9 corners.

Two classic feature detectors (Harris & Stephens 1988; Rosten &
Drummond 2006) the reference lacks entirely (its per-pixel surface
stops at arithmetic dunders, ``rasters/raster.py:1050-1200``).  Both
are formulated over INTEGER pixels so every score is an exact int64
and the contract oracle can replay them in SQL without float drift:

* ``harris_response`` — Sobel gradients, 3x3 box-summed structure
  tensor (Sxx, Sxy, Syy) and the response scaled by 25 so the
  classic k = 0.04 = 1/25 stays integral::

      R = 25 * (Sxx*Syy - Sxy^2) - (Sxx + Syy)^2

  (monotone in the usual R/25, so argmax/thresholds are unchanged).
  Magnitudes: |gradient| <= 4*255, products <= ~1.0e6, 3x3 sums
  <= ~9.4e6, so R fits int64 with ~10^3 headroom for 8-bit input.
* ``harris_corners`` — STRICT 8-neighbor local maxima of R above a
  threshold; missing neighbors (tensor-domain border) are treated as
  -inf, i.e. only existing neighbors must be beaten.  Strictness makes
  the rule deterministic without a tie-break (plateaus yield nothing).
* ``fast9_corners`` — FAST segment test: a pixel is a corner when >= 9
  CONTIGUOUS pixels of its radius-3 Bresenham circle (16 offsets) are
  all brighter than p + t or all darker than p - t.  The 16-bit
  bright/dark masks are built vectorized; the wrap-around arc test
  doubles the mask (m | m << 16) and checks a 9-run with shifts.

Scale shape: per-image map_batches kernels (pure numpy slicing), no
shuffle; huge single rasters tile upstream with a 5-pixel halo (Sobel
+ box + NMS reach; FAST needs 3) exactly like ``stages/focal.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rasters_ray import codec

__all__ = ["harris_response", "harris_corners", "harris_images",
           "fast9_corners", "fast9_images"]


def harris_response(px: np.ndarray) -> np.ndarray:
    """25-scaled integer Harris response on the tensor-valid interior.

    Returns R with shape (H-4, W-4); R[i, j] scores pixel (i+2, j+2)
    (one ring lost to Sobel, one to the 3x3 tensor box).
    """
    p = np.asarray(px, np.int64)
    if p.ndim != 2 or p.shape[0] < 5 or p.shape[1] < 5:
        raise ValueError("harris_response needs a 2D array >= 5x5")
    gx = ((p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:])
          - (p[:-2, :-2] + 2 * p[1:-1, :-2] + p[2:, :-2]))
    gy = ((p[2:, :-2] + 2 * p[2:, 1:-1] + p[2:, 2:])
          - (p[:-2, :-2] + 2 * p[:-2, 1:-1] + p[:-2, 2:]))
    ixx, iyy, ixy = gx * gx, gy * gy, gx * gy

    def box3(a):
        return (a[:-2, :-2] + a[:-2, 1:-1] + a[:-2, 2:]
                + a[1:-1, :-2] + a[1:-1, 1:-1] + a[1:-1, 2:]
                + a[2:, :-2] + a[2:, 1:-1] + a[2:, 2:])

    sxx, syy, sxy = box3(ixx), box3(iyy), box3(ixy)
    return 25 * (sxx * syy - sxy * sxy) - (sxx + syy) ** 2


def harris_corners(px: np.ndarray, threshold: int = 0):
    """(r, c, resp) int64 arrays of strict 8-neighbor maxima with
    ``R > threshold``; coordinates are FULL-IMAGE pixel positions."""
    R = harris_response(px)
    pad = np.full((R.shape[0] + 2, R.shape[1] + 2),
                  np.iinfo(np.int64).min, np.int64)
    pad[1:-1, 1:-1] = R
    keep = R > int(threshold)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            keep &= R > pad[1 + dr:1 + dr + R.shape[0],
                            1 + dc:1 + dc + R.shape[1]]
    ri, ci = np.nonzero(keep)
    return (ri.astype(np.int64) + 2, ci.astype(np.int64) + 2,
            R[ri, ci])


# radius-3 Bresenham circle, clockwise from 12 o'clock (FAST paper fig 1)
_FAST_OFFS = np.array([(-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3),
                       (1, 3), (2, 2), (3, 1), (3, 0), (3, -1),
                       (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2),
                       (-3, -1)], np.int64)


def fast9_corners(px: np.ndarray, t: int = 20):
    """(r, c, n_bright, n_dark) for FAST-9 corners at threshold ``t``.

    ``n_bright`` / ``n_dark`` are the lengths of the LONGEST contiguous
    bright / dark arcs (wrap-around), >= 9 for whichever fired.
    """
    p = np.asarray(px, np.int64)
    if p.ndim != 2 or p.shape[0] < 7 or p.shape[1] < 7:
        raise ValueError("fast9_corners needs a 2D array >= 7x7")
    h, w = p.shape
    core = p[3:h - 3, 3:w - 3]
    bright = np.zeros(core.shape, np.int64)
    dark = np.zeros(core.shape, np.int64)
    for k, (dr, dc) in enumerate(_FAST_OFFS):
        q = p[3 + dr:h - 3 + dr, 3 + dc:w - 3 + dc]
        bright |= (q > core + t).astype(np.int64) << k
        dark |= (q < core - t).astype(np.int64) << k

    def max_run(mask):
        # longest contiguous 1-run in a 16-bit circular mask: unroll to
        # 32 bits, then AND-shift — after i shifts a bit survives iff it
        # started a run of length > i
        m = mask | (mask << 16)
        run = np.zeros(mask.shape, np.int64)
        cur = m
        for i in range(16):
            alive = cur != 0
            run[alive] = i + 1
            cur = cur & (cur >> 1)
        return np.minimum(run, 16)

    rb, rd = max_run(bright), max_run(dark)
    keep = (rb >= 9) | (rd >= 9)
    ri, ci = np.nonzero(keep)
    return (ri.astype(np.int64) + 3, ci.astype(np.int64) + 3,
            rb[ri, ci], rd[ri, ci])


def _decode_iter(t: pa.Table):
    for i in range(t.num_rows):
        iid = t.column("image_id")[i].as_py()
        px = np.rint(codec.decode(t.column("bytes")[i].as_py(),
                                  t.column("fmt")[i].as_py())
                     ).astype(np.int64)
        yield iid, px


def harris_images(images_ds, threshold: int = 0):
    """Dataset[(image_id, r, c, resp)] of Harris corners per image."""

    def run(t: pa.Table) -> pa.Table:
        ids, rs, cs, vs = [], [], [], []
        for iid, px in _decode_iter(t):
            r, c, v = harris_corners(px, threshold)
            ids.extend([iid] * r.size)
            rs.append(r)
            cs.append(c)
            vs.append(v)
        cat = (lambda xs: np.concatenate(xs) if xs else
               np.empty(0, np.int64))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "r": pa.array(cat(rs), pa.int64()),
            "c": pa.array(cat(cs), pa.int64()),
            "resp": pa.array(cat(vs), pa.int64()),
        })

    return images_ds.map_batches(run, batch_format="pyarrow")


def fast9_images(images_ds, t: int = 20, transform=None):
    """Dataset[(image_id, r, c, n_bright, n_dark)] of FAST-9 corners.
    ``transform(px) -> px`` optionally derives the detection surface
    (e.g. a radiometric correction) before the segment test."""

    def run(tab: pa.Table) -> pa.Table:
        ids, rs, cs, bs, ds_ = [], [], [], [], []
        for iid, px in _decode_iter(tab):
            if transform is not None:
                px = np.asarray(transform(px), np.int64)
            r, c, nb, nd = fast9_corners(px, t)
            ids.extend([iid] * r.size)
            rs.append(r)
            cs.append(c)
            bs.append(nb)
            ds_.append(nd)
        cat = (lambda xs: np.concatenate(xs) if xs else
               np.empty(0, np.int64))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "r": pa.array(cat(rs), pa.int64()),
            "c": pa.array(cat(cs), pa.int64()),
            "n_bright": pa.array(cat(bs), pa.int64()),
            "n_dark": pa.array(cat(ds_), pa.int64()),
        })

    return images_ds.map_batches(run, batch_format="pyarrow")
