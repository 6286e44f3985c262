"""Overview pyramids (COG-style reduced-resolution levels).

The reference exposes ``to_COG`` (``/root/reference/rasters/raster.py``,
COG sink) whose format embeds overview levels — reduced-resolution
copies at 2x, 4x, 8x... used for any zoomed-out read.  The engine's COG
writer (``rasters_ray/checkpoint.py`` analog + ``sources/geotiff.py``)
needs those levels, and a training pipeline needs the same reduction as
"thumbnail" features.  This stage computes them Ray-Data-first.

Scale shape
-----------
Embarrassingly parallel: each image row expands to its own overview
rows, no shuffle at any level.  Block sums are integer-exact
(``np.add.reduceat`` in int64), so the emitted means are bit-stable
under any batch layout — the SQL oracle recomputes them from the pixel
formula with a GROUP BY ``r // 2^level``.

At 100 TB the same stage runs unchanged: overviews of a tile depend only
on that tile, so the pyramid of a planet-sized mosaic is the pyramid of
its tiles (per-tile overview rows carry (ty, tx) through unchanged and
land in the COG writer's partitioned layout).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

from rasters_ray import codec

__all__ = ["block_reduce_sums", "overview_stats", "overview_images"]


def block_reduce_sums(arr: np.ndarray, f: int) -> tuple:
    """Per-block (sum, count) over ``f x f`` blocks, ragged edges kept.

    Returns ``(psum int64, n int64)`` of shape ``(ceil(rows/f),
    ceil(cols/f))``.  NaNs are excluded from both.  Integer-exact for
    integral inputs (int64 accumulation)."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim != 2:
        raise ValueError("block_reduce_sums expects a 2D array")
    valid = np.isfinite(a)
    az = np.where(valid, a, 0.0)
    if np.all(az == np.floor(az)) and np.abs(az).max(initial=0.0) < 2**52:
        az = az.astype(np.int64)
    rows, cols = a.shape
    ri = np.arange(0, rows, f)
    ci = np.arange(0, cols, f)
    s = np.add.reduceat(np.add.reduceat(az, ri, axis=0), ci, axis=1)
    n = np.add.reduceat(
        np.add.reduceat(valid.astype(np.int64), ri, axis=0), ci, axis=1
    )
    return s.astype(np.int64) if s.dtype != np.int64 else s, n


def _overview_rows(image_id: str, px: np.ndarray, level: int) -> dict:
    f = 1 << level
    psum, n = block_reduce_sums(px, f)
    nby, nbx = psum.shape
    by, bx = np.meshgrid(np.arange(nby), np.arange(nbx), indexing="ij")
    nn = n.ravel()
    ps = psum.ravel()
    mean = np.where(nn > 0, ps.astype(np.float64) / np.maximum(nn, 1), np.nan)
    k = nn.size
    return {
        "image_id": np.repeat(np.array([image_id], dtype=object), k),
        "level": np.full(k, level, dtype=np.int64),
        "by": by.ravel().astype(np.int64),
        "bx": bx.ravel().astype(np.int64),
        "n_px": nn.astype(np.int64),
        "psum": ps.astype(np.int64),
        "mean": mean,
    }


_STATS_FIELDS = ("image_id", "level", "by", "bx", "n_px", "psum", "mean")


def _stats_table(parts: list) -> pa.Table:
    if not parts:
        return pa.table(
            {
                "image_id": pa.array([], pa.string()),
                "level": pa.array([], pa.int64()),
                "by": pa.array([], pa.int64()),
                "bx": pa.array([], pa.int64()),
                "n_px": pa.array([], pa.int64()),
                "psum": pa.array([], pa.int64()),
                "mean": pa.array([], pa.float64()),
            }
        )
    return pa.table(
        {
            k: pa.array(
                np.concatenate([p[k] for p in parts]),
                pa.string()
                if k == "image_id"
                else (pa.float64() if k == "mean" else pa.int64()),
            )
            for k in _STATS_FIELDS
        }
    )


def overview_stats(images_ds, levels: Sequence[int] = (1, 2, 3)):
    """Per-image overview block stats -> Dataset[(image_id, level, by,
    bx, n_px, psum, mean)].  Level ``l`` reduces ``2^l x 2^l`` blocks of
    the BASE image (ragged edge blocks are partial); ``mean`` is
    ``psum / n_px`` in float64.  No shuffle."""
    lv = [int(l) for l in levels]
    if any(l < 1 for l in lv):
        raise ValueError("levels must be >= 1")

    def kernel(t: pa.Table) -> pa.Table:
        parts = []
        if t.num_rows:
            blobs = codec.BlobReader(t.column("bytes"))
            fmts = t.column("fmt").to_pylist()
            ids = t.column("image_id").to_pylist()
            for i in range(t.num_rows):
                px = codec.decode(blobs[i], fmts[i])
                for l in lv:
                    parts.append(_overview_rows(ids[i], px, l))
        return _stats_table(parts)

    return images_ds.map_batches(kernel, batch_format="pyarrow")


def overview_images(images_ds, levels: Sequence[int] = (1, 2, 3)):
    """Materialized pyramid: one image row per (input image, level) with
    the reduced-resolution pixels (block means, float32, NaN where a
    block has no valid pixel) re-encoded as npy blobs — the rows a COG
    writer interleaves as its overview IFDs.  Grid metadata (when the
    input carries a ``grid`` struct) is rescaled: cell size x ``2^l``,
    same origin."""
    lv = [int(l) for l in levels]
    if any(l < 1 for l in lv):
        raise ValueError("levels must be >= 1")

    def kernel(t: pa.Table) -> pa.Table:
        out = {
            "image_id": [],
            "level": [],
            "bytes": [],
            "w": [],
            "h": [],
            "fmt": [],
        }
        grids_in = t.column("grid").to_pylist() if "grid" in t.column_names else None
        grids_out = [] if grids_in is not None else None
        if t.num_rows:
            blobs = codec.BlobReader(t.column("bytes"))
            fmts = t.column("fmt").to_pylist()
            ids = t.column("image_id").to_pylist()
            for i in range(t.num_rows):
                px = codec.decode(blobs[i], fmts[i])
                for l in lv:
                    f = 1 << l
                    psum, n = block_reduce_sums(px, f)
                    mean = np.where(
                        n > 0, psum.astype(np.float64) / np.maximum(n, 1), np.nan
                    ).astype(np.float32)
                    out["image_id"].append(ids[i])
                    out["level"].append(l)
                    out["bytes"].append(codec.encode(mean, "npy"))
                    out["h"].append(mean.shape[0])
                    out["w"].append(mean.shape[1])
                    out["fmt"].append("npy")
                    if grids_out is not None:
                        g = dict(grids_in[i])
                        g["cell_width"] = g["cell_width"] * f
                        g["cell_height"] = g["cell_height"] * f
                        g["rows"] = mean.shape[0]
                        g["cols"] = mean.shape[1]
                        grids_out.append(g)
        cols = {
            "image_id": pa.array(out["image_id"], pa.string()),
            "level": pa.array(out["level"], pa.int64()),
            "bytes": pa.array(out["bytes"], pa.binary()),
            "w": pa.array(out["w"], pa.int32()),
            "h": pa.array(out["h"], pa.int32()),
            "fmt": pa.array(out["fmt"], pa.string()),
        }
        if grids_out is not None:
            from rasters_ray.sources.images import GRID_STRUCT

            cols["grid"] = pa.array(grids_out, GRID_STRUCT)
        return pa.table(cols)

    return images_ds.map_batches(kernel, batch_format="pyarrow")
