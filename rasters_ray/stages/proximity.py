"""Capped distance transform (proximity raster) on the halo exchange.

The ``gdal_proximity`` analog (the reference has no distance operator;
its masks stop at membership, ``/root/reference/rasters/raster_grid.py:986``):
for every pixel, the city-block (L1) distance to the nearest SEED pixel,
capped at ``cap`` (pixels farther than ``cap`` from any seed report
``cap + 1``).

Key fact that makes ONE halo exchange sufficient: any seed within L1
distance ``R`` of a pixel is also within Chebyshev distance ``R``, i.e.
inside the tile's radius-``R`` canvas.  So a single
:func:`focal.halo_exchange_tiled` round with ``radius = cap`` gives every
tile all the seeds that can matter, and the capped transform is EXACT —
no iterative relaxation, no convergence rounds (contrast
``relational/concomp.py`` where label propagation genuinely needs
rounds).  Per tile the lattice pixels brute-force against the canvas's
seed list — vectorized (npix x nseeds) int math, both small.

At 100 TB the knob that matters is ``cap``/``tile``: halo payload grows
with cap * perimeter; caps beyond the tile size call for either larger
tiles or the multi-round min-plus relaxation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rasters_ray.stages.focal import halo_exchange_tiled

__all__ = ["distance_transform_tiled", "kernel_density", "point_density"]

_SCHEMA = {
    "image_id": pa.string(),
    "r": pa.int64(),
    "c": pa.int64(),
    "dist": pa.int64(),
}


def distance_transform_tiled(
    images_ds,
    seed_mod: int = 17,
    cap: int = 12,
    tile: int = 32,
    step: int = 7,
):
    """Distance to the nearest pixel with ``value % seed_mod == 0``,
    L1-capped at ``cap`` (-> ``cap + 1`` beyond), sampled on the global
    ``step`` lattice.  -> Dataset[(image_id, r, c, dist)]."""
    R = int(cap)

    def tile_fn(image_id, canvas, tr0, tc0, trows, tcols) -> pa.Table:
        a = np.asarray(canvas, dtype=np.float64)
        finite = np.isfinite(a)
        seeds = finite & (np.where(finite, a, 1.0) % seed_mod == 0)
        sr, sc = np.nonzero(seeds)
        # global lattice pixels inside this tile's core
        rr = np.arange(trows)
        cc = np.arange(tcols)
        rsel = rr[(rr + tr0) % step == 0]
        csel = cc[(cc + tc0) % step == 0]
        if not len(rsel) or not len(csel):
            return pa.table({k: pa.array([], t) for k, t in _SCHEMA.items()})
        gr, gc = np.meshgrid(rsel, csel, indexing="ij")
        gr, gc = gr.ravel(), gc.ravel()
        if len(sr):
            # canvas coords of the lattice pixels: +R offset into the pad
            dr = np.abs((gr + R)[:, None] - sr[None, :])
            dc = np.abs((gc + R)[:, None] - sc[None, :])
            dist = np.minimum((dr + dc).min(axis=1), R + 1).astype(np.int64)
        else:
            dist = np.full(len(gr), R + 1, np.int64)
        return pa.table(
            {
                "image_id": pa.array(
                    np.repeat(np.array([image_id], dtype=object), len(gr)),
                    pa.string(),
                ),
                "r": pa.array(gr + tr0, pa.int64()),
                "c": pa.array(gc + tc0, pa.int64()),
                "dist": pa.array(dist, pa.int64()),
            }
        )

    return halo_exchange_tiled(images_ds, radius=R, tile=tile, tile_fn=tile_fn)


def point_density(points_rc, shape, radius2: int):
    """ArcGIS Point Density / QGIS heatmap core: per grid cell, the
    COUNT of points within Euclidean distance sqrt(radius2) of the
    cell center (squared-integer comparison — no floats, so exact).

    ``points_rc`` is an (n, 2) int array of (row, col) cells already
    binned to the grid.  Vectorized as bincount -> disk-offset scatter
    sum: density = sum over offsets (dr, dc) with dr^2 + dc^2 <=
    radius2 of the shifted per-cell counts.  At scale this is the
    binned groupby (points -> cell counts, one shuffle whose payload is
    cells not points) followed by a halo focal sum with the disk
    stencil; here the in-core kernel.  Returns an int64 (h, w) grid."""
    h, w = shape
    pts = np.asarray(points_rc, dtype=np.int64).reshape(-1, 2)
    if ((pts[:, 0] < 0) | (pts[:, 0] >= h)
            | (pts[:, 1] < 0) | (pts[:, 1] >= w)).any():
        raise ValueError("point outside the grid")
    counts = np.zeros((h, w), dtype=np.int64)
    np.add.at(counts, (pts[:, 0], pts[:, 1]), 1)
    rad = int(np.floor(np.sqrt(radius2)))
    dens = np.zeros_like(counts)
    for dr in range(-rad, rad + 1):
        for dc in range(-rad, rad + 1):
            if dr * dr + dc * dc > radius2:
                continue
            # cells (r, c) receive counts[r + dr, c + dc]
            sr0, sr1 = max(0, dr), min(h, h + dr)
            sc0, sc1 = max(0, dc), min(w, w + dc)
            dens[sr0 - dr:sr1 - dr, sc0 - dc:sc1 - dc] += \
                counts[sr0:sr1, sc0:sc1]
    return dens


def kernel_density(points_rc, shape, radius2: int, weights=None):
    """ArcGIS Kernel Density (Silverman quartic kernel) core, kept
    INTEGER-exact: per grid cell the numerator

        N(cell) = sum over points p with d2 = |cell - p|^2 <= radius2
                  of w_p * (radius2 - d2)^2

    which is the quartic kernel K(d) = (1 - (d/r)^2)^2 scaled by the
    constant r^4 (the true density is 3 / (pi r^2) * N / r^4 — a single
    global scale the caller applies for display, irrelevant for
    argmax / comparisons and kept out so the surface stays int64 and
    bit-replayable in SQL).

    ``points_rc`` is (n, 2) int (row, col) cells already binned to the
    grid; ``weights`` an optional positive int population field.
    Vectorized as weight-bincount -> disk-offset scatter with the
    per-offset constant (radius2 - dr^2 - dc^2)^2.  At scale: binned
    groupby (points -> per-cell weight sums, shuffle payload is cells
    not points) then a halo focal sum with this stencil."""
    h, w = shape
    pts = np.asarray(points_rc, dtype=np.int64).reshape(-1, 2)
    if ((pts[:, 0] < 0) | (pts[:, 0] >= h)
            | (pts[:, 1] < 0) | (pts[:, 1] >= w)).any():
        raise ValueError("point outside the grid")
    if weights is None:
        wts = np.ones(pts.shape[0], dtype=np.int64)
    else:
        wts = np.asarray(weights, dtype=np.int64).reshape(-1)
        if wts.shape[0] != pts.shape[0]:
            raise ValueError("weights must match points")
        if (wts < 0).any():
            raise ValueError("kernel_density expects non-negative weights")
    counts = np.zeros((h, w), dtype=np.int64)
    np.add.at(counts, (pts[:, 0], pts[:, 1]), wts)
    rad = int(np.floor(np.sqrt(radius2)))
    dens = np.zeros_like(counts)
    for dr in range(-rad, rad + 1):
        for dc in range(-rad, rad + 1):
            d2 = dr * dr + dc * dc
            if d2 > radius2:
                continue
            kv = (radius2 - d2) ** 2
            if kv == 0:
                continue
            sr0, sr1 = max(0, dr), min(h, h + dr)
            sc0, sc1 = max(0, dc), min(w, w + dc)
            dens[sr0 - dr:sr1 - dr, sc0 - dc:sc1 - dc] += \
                kv * counts[sr0:sr1, sc0:sc1]
    return dens
