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

__all__ = ["moran_stats", "moran_i", "geary_c", "autocorr_stats"]


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
