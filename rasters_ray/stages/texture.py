"""GLCM texture features (Haralick) and the exact Euclidean DT.

Two classic remote-sensing raster analyses the reference lacks (its
stats stop at display stretches, ``rasters/raster.py:1997-2006``):

* ``glcm_counts`` / ``glcm_features`` — the gray-level co-occurrence
  matrix (Haralick, Shanmugam & Dinstein 1973) for one pixel offset,
  and its UNNORMALIZED integer features: ``contrast_num =
  sum(C[i,j] * (i-j)^2)``, ``energy_num = sum(C[i,j]^2)`` and the pair
  count — kept integral so oracles are exact; normalized variants
  divide by ``n_pairs`` downstream.
* ``edt_sq`` — exact SQUARED Euclidean distance transform to the
  nearest True seed (the uncapped companion of
  ``stages/proximity.py``'s capped L1 transform; the two-phase
  row/column decomposition of Felzenszwalb & Huttenlocher 2012 §3
  computed with vectorized envelopes: phase 1 is two vertical sweeps,
  phase 2 evaluates the column envelope in row blocks).  Integer
  output; unreachable cells (no seed anywhere) raise.

Scale shape: per-image map_batches kernels, no shuffle.  ``glcm`` is
one ``np.add.at`` scatter; ``edt_sq`` is O(H*W) phase 1 and
O(H*W^2 / block) vectorized phase 2 — fine at tile sizes; tile large
rasters upstream (a radius-capped tiled EDT is exactly
``distance_transform_tiled``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rasters_ray import codec

__all__ = ["glcm_counts", "glcm_features", "edt_sq", "texture_stats",
           "euclidean_allocation", "zone_geometry"]


def glcm_counts(levels: np.ndarray, n_levels: int,
                offset=(0, 1)) -> np.ndarray:
    """Co-occurrence counts C[a, b] for pixel pairs ``(p, p+offset)``
    (single direction, not symmetrized).  ``levels`` must already be
    quantized to ``0 .. n_levels-1``; out-of-range raises."""
    lv = np.asarray(levels)
    if lv.ndim != 2:
        raise ValueError("levels must be 2D")
    if lv.min() < 0 or lv.max() >= n_levels:
        raise ValueError("levels outside [0, n_levels)")
    dr, dc = int(offset[0]), int(offset[1])
    h, w = lv.shape
    r0, r1 = max(0, -dr), min(h, h - dr)
    c0, c1 = max(0, -dc), min(w, w - dc)
    a = lv[r0:r1, c0:c1].ravel().astype(np.int64)
    b = lv[r0 + dr:r1 + dr, c0 + dc:c1 + dc].ravel().astype(np.int64)
    counts = np.zeros((n_levels, n_levels), dtype=np.int64)
    np.add.at(counts, (a, b), 1)
    return counts


def glcm_features(counts: np.ndarray) -> dict:
    """Unnormalized integer Haralick features of a count matrix."""
    c = np.asarray(counts, dtype=np.int64)
    n = c.shape[0]
    i, j = np.indices((n, n))
    d = (i - j).astype(np.int64)
    return {
        "n_pairs": int(c.sum()),
        "contrast_num": int((c * d * d).sum()),
        "energy_num": int((c * c).sum()),
        "diag_num": int(np.trace(c)),  # angular second "sameness" count
    }


def edt_sq(seeds: np.ndarray, block: int = 64) -> np.ndarray:
    """Exact squared Euclidean distance to the nearest True seed."""
    s = np.asarray(seeds, dtype=bool)
    if not s.any():
        raise ValueError("edt_sq requires at least one seed")
    h, w = s.shape
    big = np.int64(1) << 40
    # phase 1: per column, |row distance| to the nearest seed in that
    # column (two vectorized sweeps), squared
    g = np.full((h, w), big, dtype=np.int64)
    g[s] = 0
    for r in range(1, h):
        g[r] = np.minimum(g[r], g[r - 1] + 1)
    for r in range(h - 2, -1, -1):
        g[r] = np.minimum(g[r], g[r + 1] + 1)
    g2 = np.where(g >= big, big, g * g)
    # phase 2: d2[r, c] = min over c' of g2[r, c'] + (c - c')^2,
    # evaluated exactly in vectorized row blocks
    dc = (np.arange(w, dtype=np.int64)[:, None]
          - np.arange(w, dtype=np.int64)[None, :]) ** 2  # (c, c')
    out = np.empty((h, w), dtype=np.int64)
    for r0 in range(0, h, block):
        r1 = min(r0 + block, h)
        cand = g2[r0:r1, None, :] + dc[None, :, :]  # (rows, c, c')
        out[r0:r1] = cand.min(axis=2)
    return out


def texture_stats(images_ds, n_levels: int = 8, offset=(0, 1),
                  quantizer=32.0):
    """Per-image GLCM summary over an image Dataset (rows carry
    ``image_id`` / ``bytes`` / ``fmt``): pixels quantize by
    ``floor(px / quantizer)`` clipped to ``n_levels``; emits the
    unnormalized integer features.  One map_batches, nothing
    shuffles."""

    def run(t: pa.Table) -> pa.Table:
        cols = {"image_id": [], "n_pairs": [], "contrast_num": [],
                "energy_num": [], "diag_num": []}
        for i in range(t.num_rows):
            px = codec.decode(t.column("bytes")[i].as_py(),
                              t.column("fmt")[i].as_py())
            lv = np.clip(np.floor(px / quantizer), 0,
                         n_levels - 1).astype(np.int64)
            feats = glcm_features(glcm_counts(lv, n_levels, offset))
            cols["image_id"].append(t.column("image_id")[i].as_py())
            for k in ("n_pairs", "contrast_num", "energy_num",
                      "diag_num"):
                cols[k].append(feats[k])
        return pa.table(
            {k: pa.array(v, pa.string() if k == "image_id" else pa.int64())
             for k, v in cols.items()})

    return images_ds.map_batches(run, batch_format="pyarrow")


def euclidean_allocation(seeds_rc, shape) -> np.ndarray:
    """Nearest-seed Voronoi allocation (ArcGIS Euclidean Allocation /
    GRASS r.grow.distance value= output): every cell gets the INDEX
    (position in ``seeds_rc``) of its nearest seed under squared
    Euclidean distance; exact ties go to the LOWEST index —
    deterministic, so oracles replay the rule.  ``seeds_rc`` is a
    sequence of (row, col); vectorized (cells x seeds) integer math,
    chunk seeds upstream if the list is huge."""
    pts = np.asarray(seeds_rc, dtype=np.int64)
    if pts.ndim != 2 or pts.shape[1] != 2 or pts.shape[0] == 0:
        raise ValueError("seeds_rc must be a non-empty (n, 2) array")
    h, w = int(shape[0]), int(shape[1])
    rr, cc = np.indices((h, w))
    d2 = ((rr[None] - pts[:, 0, None, None]) ** 2
          + (cc[None] - pts[:, 1, None, None]) ** 2)
    return np.argmin(d2, axis=0).astype(np.int64)  # first min = lowest


def zone_geometry(labels: np.ndarray, n_labels: int) -> pa.Table:
    """Per-zone geometry of a label raster: cell AREA, 4-connected
    exposed-edge PERIMETER (raster-boundary edges count), and the
    integer bounding box — the regionprops companion to
    ``stages/zonal.py``'s value statistics.  Vectorized bincounts."""
    lv = np.asarray(labels)
    if lv.ndim != 2:
        raise ValueError("labels must be 2D")
    if lv.min() < 0 or lv.max() >= n_labels:
        raise ValueError("labels outside [0, n_labels)")
    h, w = lv.shape
    flat = lv.ravel().astype(np.int64)
    area = np.bincount(flat, minlength=n_labels)
    # exposed edges: neighbor differs, plus the raster border
    per = np.zeros(n_labels, dtype=np.int64)
    diff_h = lv[:, :-1] != lv[:, 1:]
    per += np.bincount(lv[:, :-1][diff_h].ravel(), minlength=n_labels)
    per += np.bincount(lv[:, 1:][diff_h].ravel(), minlength=n_labels)
    diff_v = lv[:-1, :] != lv[1:, :]
    per += np.bincount(lv[:-1, :][diff_v].ravel(), minlength=n_labels)
    per += np.bincount(lv[1:, :][diff_v].ravel(), minlength=n_labels)
    for edge in (lv[0, :], lv[-1, :], lv[:, 0], lv[:, -1]):
        per += np.bincount(edge, minlength=n_labels)
    rr, cc = np.indices((h, w))
    rmin = np.full(n_labels, h, dtype=np.int64)
    cmin = np.full(n_labels, w, dtype=np.int64)
    rmax = np.full(n_labels, -1, dtype=np.int64)
    cmax = np.full(n_labels, -1, dtype=np.int64)
    np.minimum.at(rmin, flat, rr.ravel())
    np.minimum.at(cmin, flat, cc.ravel())
    np.maximum.at(rmax, flat, rr.ravel())
    np.maximum.at(cmax, flat, cc.ravel())
    lab = np.arange(n_labels, dtype=np.int64)
    present = area > 0
    return pa.table({
        "label": pa.array(lab[present], pa.int64()),
        "area": pa.array(area[present], pa.int64()),
        "perimeter": pa.array(per[present], pa.int64()),
        "rmin": pa.array(rmin[present], pa.int64()),
        "cmin": pa.array(cmin[present], pa.int64()),
        "rmax": pa.array(rmax[present], pa.int64()),
        "cmax": pa.array(cmax[present], pa.int64()),
    })
