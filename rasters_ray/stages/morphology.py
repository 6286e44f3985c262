"""Binary morphology (dilate / erode) over thresholded rasters.

Cloud-mask growing, shoreline buffering, speckle removal — the standard
raster cleanup ops (Serra's mathematical morphology; the square
structuring element form).  With the mask encoded 1.0/0.0 and
outside-image cells NaN, ONE pass of the engine's NaN-aware
``box_filter_sum`` yields both operators at once:

    n_masked = focal sum   (masked neighbors inside the image)
    n_nbr    = valid count (in-bounds neighbors, edge-clamped)
    dilated  = n_masked > 0
    eroded   = n_masked == n_nbr       (all in-bounds neighbors masked)

Distribution is the same radius-R halo exchange every stencil here
uses; per-tile work is two integral images regardless of radius.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rasters_ray import codec
from rasters_ray.stages.focal import box_filter_sum, halo_exchange_tiled

__all__ = ["morphology_stats", "morphology_halo_tiled",
           "skeletonize", "expand_classes", "expand_histogram"]

_SCHEMA = {
    "image_id": pa.string(),
    "r": pa.int64(),
    "c": pa.int64(),
    "n_masked": pa.int64(),
    "n_nbr": pa.int64(),
    "dilated": pa.int64(),
    "eroded": pa.int64(),
}


def _morph_rows(image_id, fsum, nnbr, step, r_off, c_off):
    rows, cols = fsum.shape
    rr = np.arange(rows)
    cc = np.arange(cols)
    rsel = rr[(rr + r_off) % step == 0]
    csel = cc[(cc + c_off) % step == 0]
    if not len(rsel) or not len(csel):
        return None
    gr, gc = np.meshgrid(rsel, csel, indexing="ij")
    gr, gc = gr.ravel(), gc.ravel()
    nm = fsum[gr, gc].astype(np.int64)
    nn = nnbr[gr, gc].astype(np.int64)
    return {
        "image_id": np.repeat(np.array([image_id], dtype=object), len(gr)),
        "r": gr + r_off,
        "c": gc + c_off,
        "n_masked": nm,
        "n_nbr": nn,
        "dilated": (nm > 0).astype(np.int64),
        "eroded": (nm == nn).astype(np.int64),
    }


def _table(rows) -> pa.Table:
    if rows is None:
        return pa.table({k: pa.array([], t) for k, t in _SCHEMA.items()})
    return pa.table({k: pa.array(v, _SCHEMA[k]) for k, v in rows.items()})


def morphology_stats(images_ds, threshold: float, radius: int = 1, step: int = 1):
    """Whole-image path (reference for tests): per sampled center, the
    masked-neighbor count and the dilate/erode flags."""

    def kernel(t: pa.Table) -> pa.Table:
        parts = []
        if t.num_rows:
            blobs = codec.BlobReader(t.column("bytes"))
            fmts = t.column("fmt").to_pylist()
            ids = t.column("image_id").to_pylist()
            for i in range(t.num_rows):
                px = codec.decode(blobs[i], fmts[i]).astype(np.float64)
                mask = np.where(np.isfinite(px), (px >= threshold) * 1.0, np.nan)
                fsum, nnbr = box_filter_sum(mask, radius)
                rows = _morph_rows(ids[i], fsum, nnbr, step, 0, 0)
                if rows is not None:
                    parts.append(rows)
        if not parts:
            return _table(None)
        return pa.table(
            {
                k: pa.array(np.concatenate([p[k] for p in parts]), _SCHEMA[k])
                for k in _SCHEMA
            }
        )

    return images_ds.map_batches(kernel, batch_format="pyarrow")


def morphology_halo_tiled(
    images_ds, threshold: float, radius: int = 1, step: int = 1, tile: int = 32
):
    """Distributed form — radius-wide halo strips, one groupby shuffle,
    per-tile integral images.  Bit-equal to :func:`morphology_stats`."""
    R = int(radius)

    def tile_fn(image_id, canvas, tr0, tc0, trows, tcols) -> pa.Table:
        mask = np.where(np.isfinite(canvas), (canvas >= threshold) * 1.0, np.nan)
        fsum, nnbr = box_filter_sum(mask, R)
        fs = fsum[R : R + trows, R : R + tcols]
        nn = nnbr[R : R + trows, R : R + tcols]
        return _table(_morph_rows(image_id, fs, nn, step, tr0, tc0))

    return halo_exchange_tiled(images_ds, radius=R, tile=tile, tile_fn=tile_fn)


def skeletonize(mask: np.ndarray, max_iter: int = 10000) -> np.ndarray:
    """Zhang-Suen thinning (Zhang & Suen 1984, CACM 27(3) — the
    classic two-subiteration skeletonization, the algorithm behind
    ``skimage.morphology.thin``'s default): peel boundary pixels that
    have 2..6 set neighbors, exactly one 0->1 transition around the
    ring, and the step's directional products zero, until a fixpoint.
    Pixels outside the raster count as 0.  Fully vectorized: each
    subiteration is 8 shifted views + boolean algebra."""
    img = (np.asarray(mask) != 0).astype(np.uint8)

    def nbrs(a):
        p = np.pad(a, 1)
        # clockwise from north: p2..p9
        return (p[:-2, 1:-1], p[:-2, 2:], p[1:-1, 2:], p[2:, 2:],
                p[2:, 1:-1], p[2:, :-2], p[1:-1, :-2], p[:-2, :-2])

    for _ in range(max_iter):
        changed = False
        for step in (0, 1):
            p2, p3, p4, p5, p6, p7, p8, p9 = nbrs(img)
            ring = (p2, p3, p4, p5, p6, p7, p8, p9, p2)
            b = (p2.astype(np.int64) + p3 + p4 + p5 + p6 + p7 + p8
                 + p9)
            a = np.zeros_like(b)
            for u, v in zip(ring, ring[1:]):
                a += ((u == 0) & (v == 1))
            if step == 0:
                dirs = ((p2 * p4 * p6) == 0) & ((p4 * p6 * p8) == 0)
            else:
                dirs = ((p2 * p4 * p8) == 0) & ((p2 * p6 * p8) == 0)
            kill = ((img == 1) & (b >= 2) & (b <= 6) & (a == 1)
                    & dirs)
            if kill.any():
                img[kill] = 0
                changed = True
        if not changed:
            return img.astype(bool)
    raise RuntimeError("skeletonize did not converge")  # pragma: no cover


# ---------------------------------------------------------------------------
# categorical Expand (ArcGIS Spatial Analyst "Expand", queen adjacency)
# ---------------------------------------------------------------------------


def expand_classes(cls: np.ndarray, expand_set) -> np.ndarray:
    """Expand the classes in `expand_set` by one cell (8-neighborhood).

    A cell becomes the SMALLEST expanding class present anywhere in its
    3x3 neighborhood (including itself) — the deterministic resolution
    of ArcGIS's multi-class collision — and keeps its own class when no
    expanding class touches it.  Border cells simply have fewer
    neighbors (no clamping/wrap).  Pure order statistics on int64:
    exact, and bit-stable under tiling with a 1-ring halo."""
    c = np.asarray(cls)
    if c.ndim != 2:
        raise ValueError("expand_classes expects a 2-D class raster")
    c = c.astype(np.int64)
    big = np.iinfo(np.int64).max
    ce = np.where(np.isin(c, np.asarray(sorted(expand_set), np.int64)), c, big)
    pad = np.pad(ce, 1, constant_values=big)
    h, w = c.shape
    mn = np.full((h, w), big, np.int64)
    for i in range(3):
        for j in range(3):
            np.minimum(mn, pad[i:i + h, j:j + w], out=mn)
    return np.where(mn < big, mn, c)


def expand_histogram(images_ds, expand_set, mod: int):
    """Per-image class histogram AFTER one Expand step, classes being
    pixel value % mod -> Dataset[(image_id, cls, n_px)].  Per-image
    map, no shuffle."""
    from rasters_ray import codec as _codec

    def kernel(t: pa.Table) -> pa.Table:
        ids, cl, n = [], [], []
        if t.num_rows:
            blobs = _codec.BlobReader(t.column("bytes"))
            fmts = t.column("fmt").to_pylist()
            id_col = t.column("image_id").to_pylist()
            for i in range(t.num_rows):
                px = _codec.decode(blobs[i], fmts[i])
                cls = np.rint(px).astype(np.int64) % mod
                out = expand_classes(cls, expand_set)
                vals, cnts = np.unique(out, return_counts=True)
                ids.extend([id_col[i]] * len(vals))
                cl.extend(vals.tolist())
                n.extend(cnts.tolist())
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "cls": pa.array(cl, pa.int64()),
            "n_px": pa.array(n, pa.int64()),
        })

    return images_ds.map_batches(kernel, batch_format="pyarrow")
