"""Image quality metrics (MSE / PSNR / global SSIM) and reclassify.

The reference ships no quality metric (its stats surface is the
display-stretch min/max/mean/std, ``rasters/raster.py:1997-2006``);
pipelines that re-encode imagery (the JPEG/COG/Zarr sinks here) need
them to gate lossy steps, and classification pipelines need bin-remap.
Both classic ops added Ray-Data-first:

* ``mse`` / ``psnr`` — per-pair mean squared error and
  ``10*log10(L^2 / mse)`` peak SNR.
* ``ssim_global`` — single-window SSIM (Wang et al. 2004 eq. 13 over
  the WHOLE image, the ``skimage.metrics.structural_similarity``
  formula without the sliding window).  Fixed float op order so
  oracles replay bit-for-bit: all sums are exact integer counts for
  integral pixels; then ``mu = sum/n``, ``var = sumsq/n - mu*mu``,
  ``cov = sumab/n - mu_a*mu_b``, ``c1 = (0.01*L)*(0.01*L)``,
  ``c2 = (0.03*L)*(0.03*L)``, luminance and structure terms as written
  in :func:`ssim_global` — every step a single IEEE double op DuckDB
  reproduces exactly.
* ``reclassify`` — ``classes[np.digitize(arr, bins)]`` (the ArcGIS
  Reclassify / ``gdal_calc`` bin remap); bins are right-open
  ``[b_i, b_{i+1})`` and NaN maps to ``nan_class``.

Scale shape: per-image / per-pair map_batches kernels, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rasters_ray import codec

__all__ = ["mse", "psnr", "ssim_global", "reclassify", "pairwise_quality",
           "change_vector", "weighted_overlay"]


def mse(a: np.ndarray, b: np.ndarray) -> float:
    x = np.asarray(a, dtype=np.float64)
    y = np.asarray(b, dtype=np.float64)
    if x.shape != y.shape:
        raise ValueError("mse requires same-shape images")
    d = x - y
    return float(np.mean(d * d))


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    """Peak SNR in dB; +inf for identical images."""
    m = mse(a, b)
    if m == 0.0:
        return float("inf")
    return float(10.0 * np.log10((data_range * data_range) / m))


def ssim_global(a: np.ndarray, b: np.ndarray,
                data_range: float = 255.0) -> float:
    """Whole-image SSIM (Wang et al. 2004 eq. 13, single window)."""
    x = np.asarray(a, dtype=np.float64)
    y = np.asarray(b, dtype=np.float64)
    if x.shape != y.shape:
        raise ValueError("ssim requires same-shape images")
    n = float(x.size)
    mu_a = float(x.sum()) / n
    mu_b = float(y.sum()) / n
    var_a = float((x * x).sum()) / n - mu_a * mu_a
    var_b = float((y * y).sum()) / n - mu_b * mu_b
    cov = float((x * y).sum()) / n - mu_a * mu_b
    c1 = (0.01 * data_range) * (0.01 * data_range)
    c2 = (0.03 * data_range) * (0.03 * data_range)
    lum = (2.0 * mu_a * mu_b + c1) / (mu_a * mu_a + mu_b * mu_b + c1)
    structure = (2.0 * cov + c2) / (var_a + var_b + c2)
    return float(lum * structure)


def reclassify(arr: np.ndarray, bins, classes, nan_class=-1) -> np.ndarray:
    """Bin remap: value v in ``[bins[i], bins[i+1])`` maps to
    ``classes[i+1]``; below ``bins[0]`` to ``classes[0]``; at or above
    ``bins[-1]`` to ``classes[-1]``.  ``len(classes) == len(bins) + 1``.
    NaN cells map to ``nan_class``.  Output int64."""
    b = np.asarray(bins, dtype=np.float64)
    cl = np.asarray(classes, dtype=np.int64)
    if cl.shape[0] != b.shape[0] + 1:
        raise ValueError("need len(classes) == len(bins) + 1")
    if np.any(np.diff(b) <= 0):
        raise ValueError("bins must be strictly increasing")
    x = np.asarray(arr, dtype=np.float64)
    nan = ~np.isfinite(x)
    idx = np.digitize(np.where(nan, b[0], x), b, right=False)
    out = cl[idx]
    out[nan] = int(nan_class)
    return out


def pairwise_quality(pairs_ds, data_range: float = 255.0):
    """Per-pair quality metrics over a Dataset of image PAIRS (rows
    carry ``pair_id`` / ``bytes_ref`` / ``bytes_cmp`` / ``fmt``):
    emits mse, psnr (NaN for identical images, so the column stays
    float) and global ssim.  One map_batches, nothing shuffles."""

    def run(t: pa.Table) -> pa.Table:
        ids, ms, ps, ss = [], [], [], []
        for i in range(t.num_rows):
            fmt = t.column("fmt")[i].as_py()
            a = codec.decode(t.column("bytes_ref")[i].as_py(), fmt)
            b = codec.decode(t.column("bytes_cmp")[i].as_py(), fmt)
            m = mse(a, b)
            ids.append(t.column("pair_id")[i].as_py())
            ms.append(m)
            ps.append(psnr(a, b, data_range) if m > 0 else float("nan"))
            ss.append(ssim_global(a, b, data_range))
        return pa.table({
            "pair_id": pa.array(ids, pa.string()),
            "mse": pa.array(ms, pa.float64()),
            "psnr": pa.array(ps, pa.float64()),
            "ssim": pa.array(ss, pa.float64()),
        })

    return pairs_ds.map_batches(run, batch_format="pyarrow")


def change_vector(a: np.ndarray, b: np.ndarray) -> tuple:
    """Change vector analysis (Malila 1980, the two-date multispectral
    change detector): per pixel the squared change magnitude
    ``mag2 = sum_band (b - a)^2`` (int64-exact for integral pixels; the
    usual magnitude is ``sqrt(mag2)``) and the direction SECTOR in the
    first two bands — ``2*(d0 < 0) + (d1 < 0)``, i.e. quadrant of
    (d0, d1) with zero counted as non-negative.  Inputs are (bands, h,
    w) stacks with >= 2 bands and identical shapes."""
    aa = np.asarray(a, dtype=np.int64)
    bb = np.asarray(b, dtype=np.int64)
    if aa.shape != bb.shape or aa.ndim != 3 or aa.shape[0] < 2:
        raise ValueError("change_vector expects equal (bands>=2, h, w)")
    d = bb - aa
    mag2 = (d * d).sum(axis=0)
    sector = 2 * (d[0] < 0).astype(np.int64) + (d[1] < 0)
    return mag2, sector


def weighted_overlay(layers, bins_list, classes_list, weights) -> np.ndarray:
    """ArcGIS Weighted Overlay: each criterion raster is reclassified
    onto a common suitability scale (via :func:`reclassify`), then the
    scores combine as an integer-weighted sum — the classic multi-
    criteria site-suitability surface.  All-integer output; NaN in any
    layer poisons the cell to -1 (unsuitable/nodata)."""
    if not (len(layers) == len(bins_list) == len(classes_list) == len(weights)):
        raise ValueError("weighted_overlay needs one bins/classes/weight "
                         "triple per layer")
    if not layers:
        raise ValueError("weighted_overlay needs at least one layer")
    out = np.zeros(np.asarray(layers[0]).shape, dtype=np.int64)
    bad = np.zeros(out.shape, dtype=bool)
    for lay, bins, classes, w in zip(layers, bins_list, classes_list, weights):
        x = np.asarray(lay, dtype=np.float64)
        if x.shape != out.shape:
            raise ValueError("weighted_overlay layers must be co-registered")
        bad |= ~np.isfinite(x)
        out += int(w) * reclassify(x, bins, classes)
    return np.where(bad, np.int64(-1), out)
