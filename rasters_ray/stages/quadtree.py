"""Quadtree decomposition profile of a raster.

The classic region-quadtree compression statistic (Samet 1984): split
the (dyadic) raster recursively until every leaf is CONSTANT; report
the leaf count per leaf size.  A block is constant iff its min equals
its max; a block is a leaf at size s iff it is constant at s and its
size-2s parent is NOT constant (the root counts as a leaf if the whole
tile is constant).  Remaining pixels are 1-pixel leaves, recovered by
area conservation: ``n_1 = size^2 - sum_s n_s * s^2``.

Everything is a min/max reduction — exact for integer rasters and
replayable in SQL as per-level GROUP BY blocks joined to their parent
blocks.  Per-image map, nothing shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rasters_ray import codec

__all__ = ["quadtree_profile", "quadtree_images"]


def _halve(m: np.ndarray, take_min: bool) -> np.ndarray:
    h, w = m.shape
    q = m.reshape(h // 2, 2, w // 2, 2)
    return q.min(axis=(1, 3)) if take_min else q.max(axis=(1, 3))


def quadtree_profile(arr: np.ndarray, size: int = 64):
    """(size, n_leaves) pairs for sizes size, size/2, ..., 2, 1 over the
    top-left ``size x size`` crop (size must be a power of two)."""
    if size & (size - 1):
        raise ValueError("quadtree size must be a power of two")
    z = np.rint(np.asarray(arr)[:size, :size]).astype(np.int64)
    if z.shape != (size, size):
        raise ValueError(f"raster smaller than {size}x{size}")
    mins, maxs = [z], [z]
    s = 1
    while s < size:
        mins.append(_halve(mins[-1], True))
        maxs.append(_halve(maxs[-1], False))
        s *= 2
    # level k: block size 2^k; const[k] boolean grid
    const = [mn == mx for mn, mx in zip(mins, maxs)]
    out = []
    covered = 0
    k = len(const) - 1  # root level
    n_root = int(const[k].sum())  # 0 or 1
    out.append((size, n_root))
    covered += n_root * size * size
    for k in range(len(const) - 2, 0, -1):
        s = 1 << k
        parent_const = np.repeat(np.repeat(const[k + 1], 2, 0), 2, 1)
        n = int((const[k] & ~parent_const).sum())
        out.append((s, n))
        covered += n * s * s
    out.append((1, size * size - covered))
    return out


def quadtree_images(images_ds, size: int = 64, transform=None):
    """Quadtree leaf profile per image -> Dataset[(image_id, leaf_size,
    n_leaves)]."""

    def run(t: pa.Table) -> pa.Table:
        out = {k: [] for k in ("image_id", "leaf_size", "n_leaves")}
        for i in range(t.num_rows):
            px = codec.decode(t.column("bytes")[i].as_py(),
                              t.column("fmt")[i].as_py())
            px = np.rint(px).astype(np.int64)
            if transform is not None:
                px = transform(px)
            for s, n in quadtree_profile(px, size):
                out["image_id"].append(t.column("image_id")[i].as_py())
                out["leaf_size"].append(s)
                out["n_leaves"].append(n)
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "leaf_size": pa.array(out["leaf_size"], pa.int64()),
                "n_leaves": pa.array(out["n_leaves"], pa.int64()),
            }
        )

    return images_ds.map_batches(run, batch_format="pyarrow")
