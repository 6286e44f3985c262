"""Radiometric normalization: histogram matching and Brovey pansharpen.

The reference's radiometric surface is per-pixel stretches
(``minmaxstretch``/``percentilecut``, ``rasters/raster.py:1997-2006``);
mosaicking and fusion pipelines additionally need cross-SCENE
normalization — the two classics added here Ray-Data-first:

* ``match_histogram`` — map each source pixel to the reference image's
  value at the same empirical quantile (the skimage
  ``match_histograms`` / GDAL ``-scale``-by-CDF operation used to
  seam-blend mosaics).  Rule fixed for oracles: per UNIQUE source
  value, the source's right-continuous CDF position ``cum/n`` is looked
  up in the reference's CDF by ``np.interp`` over the reference's
  unique values; when both images have equally-frequent value sets the
  i-th smallest source value maps EXACTLY to the i-th smallest
  reference value (interp lands on a knot), so integer constructions
  stay integer-exact.
* ``brovey_pansharpen`` — multiply each low-resolution band by
  ``pan / mean(bands)`` (the ratio fusion of ``gdal_pansharpen``);
  cells where the band mean is 0 emit 0.

Scale shape: both are per-image ``map_batches`` kernels, nothing
shuffles.  ``match_to_reference`` holds the reference CDF as
actor-constructor state (computed ONCE per actor from the broadcast
reference array, never per batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rasters_ray import codec

__all__ = ["match_histogram", "brovey_pansharpen", "match_to_reference",
           "otsu_threshold", "qa_bitmask_tabulate", "qa_tabulate_images",
           "nd_index_bins", "nd_index_images"]


def _cdf(a: np.ndarray):
    values, counts = np.unique(a, return_counts=True)
    quantiles = np.cumsum(counts) / a.size
    return values, quantiles


def match_histogram(src: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """Map ``src`` onto ``ref``'s empirical distribution (float64)."""
    s = np.asarray(src)
    sv, sq = _cdf(s.ravel())
    rv, rq = _cdf(np.asarray(ref).ravel())
    mapped = np.interp(sq, rq, rv.astype(np.float64))
    inv = np.searchsorted(sv, s.ravel())
    return mapped[inv].reshape(s.shape)


def brovey_pansharpen(bands: np.ndarray, pan: np.ndarray) -> np.ndarray:
    """Brovey ratio fusion: ``out[b] = bands[b] * pan / mean(bands)``
    over a (nbands, H, W) stack and an (H, W) pan.  Zero-mean cells
    emit 0 in every band."""
    b = np.asarray(bands, dtype=np.float64)
    p = np.asarray(pan, dtype=np.float64)
    if b.ndim != 3 or b.shape[1:] != p.shape:
        raise ValueError("bands must be (nbands, H, W) matching pan (H, W)")
    mean = b.mean(axis=0)
    ratio = np.divide(p, mean, out=np.zeros_like(p), where=mean != 0)
    return b * ratio


class match_to_reference:
    """Actor-pool stage: histogram-match every image of a Dataset to
    ONE reference image.  The reference CDF is computed once per actor
    in ``__init__`` from the encoded reference bytes (ship via
    ``ray.put`` at scale); ``__call__`` matches each batch image."""

    def __init__(self, ref_bytes: bytes, ref_fmt: str):
        rv, rq = _cdf(codec.decode(ref_bytes, ref_fmt).ravel())
        self._rv = rv.astype(np.float64)
        self._rq = rq

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, out, fmts = [], [], []
        for i in range(t.num_rows):
            px = codec.decode(t.column("bytes")[i].as_py(),
                              t.column("fmt")[i].as_py())
            sv, sq = _cdf(px.ravel())
            mapped = np.interp(sq, self._rq, self._rv)
            inv = np.searchsorted(sv, px.ravel())
            ids.append(t.column("image_id")[i].as_py())
            out.append(codec.encode(mapped[inv].reshape(px.shape), "npy"))
            fmts.append("npy")
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(out, pa.binary()),
            "fmt": pa.array(fmts, pa.string()),
        })


def otsu_threshold(values: np.ndarray) -> tuple:
    """Otsu (1979) global threshold over integral pixel values.

    Maximizes the between-class variance; with integer pixels the
    criterion is the exact rational ``(n*s - tot*p)^2 / (p*(n-p))``
    where ``p``/``s`` are the count/value-sum at or below the
    threshold.  For <= 2^12 pixels of 8-bit data the squared numerator
    is < 2^53, so evaluating it in float64 is EXACT and bit-portable
    to SQL (``CAST(num*num AS DOUBLE) / den``).  The threshold is the
    smallest PRESENT value maximizing the criterion (ties -> smallest
    value; the largest present value is excluded since its upper class
    is empty).  Returns ``(t_star, n_below, sum_below)``."""
    v = np.asarray(values, dtype=np.float64).ravel()
    v = v[np.isfinite(v)].astype(np.int64)
    if v.size < 2:
        raise ValueError("otsu_threshold needs >= 2 finite pixels")
    n = int(v.size)
    tot = int(v.sum())
    uniq, counts = np.unique(v, return_counts=True)
    if len(uniq) < 2:
        raise ValueError("otsu_threshold needs >= 2 distinct values")
    p = np.cumsum(counts)
    s = np.cumsum(uniq * counts)
    best = (-1.0, None)
    for i in range(len(uniq) - 1):  # last value: empty upper class
        num = n * int(s[i]) - tot * int(p[i])
        den = int(p[i]) * (n - int(p[i]))
        crit = float(num * num) / den
        if crit > best[0]:
            best = (crit, i)
    i = best[1]
    return int(uniq[i]), int(p[i]), int(s[i])


def qa_bitmask_tabulate(arr: np.ndarray, fields) -> pa.Table:
    """Landsat QA_PIXEL-style bitfield tabulation: treat each integral
    pixel as a packed flag word and count pixels per (field, code) for
    every requested field, where ``fields`` is a list of
    ``(name, shift, width)`` — code = (v >> shift) & (2^width - 1).
    Pure-integer bincounts, one row per present (field, code) pair,
    sorted by (name, code).  At scale: per-tile partials + a tiny
    (field, code) groupby — pixels never shuffle."""
    x = np.asarray(arr)
    if not np.issubdtype(x.dtype, np.integer):
        if not np.all(np.isfinite(x)) or np.any(x != np.rint(x)):
            raise ValueError("qa_bitmask_tabulate requires integral pixels")
    v = x.astype(np.int64).ravel()
    if (v < 0).any():
        raise ValueError("QA words must be non-negative")
    names, codes, counts = [], [], []
    for name, shift, width in fields:
        if shift < 0 or width < 1:
            raise ValueError(f"bad field spec {name!r}")
        f = (v >> np.int64(shift)) & np.int64((1 << width) - 1)
        bc = np.bincount(f, minlength=1 << width)
        nz = np.flatnonzero(bc)
        names.extend([name] * nz.size)
        codes.extend(nz.tolist())
        counts.extend(bc[nz].tolist())
    return pa.table({
        "field": pa.array(names, pa.string()),
        "code": pa.array(codes, pa.int64()),
        "n_px": pa.array(counts, pa.int64()),
    })


def qa_tabulate_images(images_ds, fields):
    """Per-image QA bitfield tabulation:
    Dataset[(image_id, field, code, n_px)]."""
    from rasters_ray import codec as _codec

    def run(t: pa.Table) -> pa.Table:
        parts = []
        for i in range(t.num_rows):
            px = _codec.decode(t.column("bytes")[i].as_py(),
                               t.column("fmt")[i].as_py())
            tab = qa_bitmask_tabulate(px, fields)
            iid = pa.array([t.column("image_id")[i].as_py()] * tab.num_rows,
                           pa.string())
            parts.append(tab.add_column(0, "image_id", iid))
        return pa.concat_tables(parts) if parts else pa.table({
            "image_id": pa.array([], pa.string()),
            "field": pa.array([], pa.string()),
            "code": pa.array([], pa.int64()),
            "n_px": pa.array([], pa.int64()),
        })

    return images_ds.map_batches(run, batch_format="pyarrow")


def nd_index_bins(a: np.ndarray, b: np.ndarray, k: int = 10) -> pa.Table:
    """Normalized-difference index (NDVI/NDWI family) histogram over two
    co-registered non-negative integer bands: nd = (a - b) / (a + b)
    binned into ``k`` equal-width bins on [-1, 1].

    INTEGER-EXACT: bin(nd) = floor((nd + 1) * k / 2) = (k*a) // (a+b)
    — the float ratio never materializes, so the histogram is
    bit-stable under any tiling and replays in SQL as one integer
    division.  nd = +1 (b == 0) clips into the top bin; a + b == 0
    pixels are undefined and reported as bin -1.  Returns one row per
    present bin, columns (bin, n_px)."""
    x = np.asarray(a)
    y = np.asarray(b)
    if x.shape != y.shape:
        raise ValueError("nd_index_bins bands must be co-registered")
    if k < 1:
        raise ValueError("k must be >= 1")
    for v in (x, y):
        if not np.issubdtype(v.dtype, np.integer):
            if not np.all(np.isfinite(v)) or np.any(v != np.rint(v)):
                raise ValueError("nd_index_bins requires integral bands")
    xi = x.astype(np.int64).ravel()
    yi = y.astype(np.int64).ravel()
    if (xi < 0).any() or (yi < 0).any():
        raise ValueError("nd_index_bins requires non-negative bands")
    tot = xi + yi
    ok = tot > 0
    bins = np.minimum((k * xi[ok]) // tot[ok], k - 1)
    bc = np.bincount(bins, minlength=k)
    nz = np.flatnonzero(bc)
    out_bins = nz.tolist()
    out_n = bc[nz].tolist()
    n_undef = int((~ok).sum())
    if n_undef:
        out_bins = [-1] + out_bins
        out_n = [n_undef] + out_n
    return pa.table({
        "bin": pa.array(out_bins, pa.int64()),
        "n_px": pa.array(out_n, pa.int64()),
    })


def nd_index_images(images_ds, band2_fn, k: int = 10):
    """Per-scene normalized-difference histograms:
    Dataset[(image_id, bin, n_px)].  ``band2_fn(arr) -> np.ndarray``
    derives the second band from the decoded first (a co-registered
    acquisition loaded by id, a different sensor band, or a synthetic
    reference).  One map_batches, nothing shuffles; at scale the
    two-file variant is a co-partitioned zip join on tile key."""
    from rasters_ray import codec as _codec

    def run(t: pa.Table) -> pa.Table:
        parts = []
        for i in range(t.num_rows):
            px = _codec.decode(t.column("bytes")[i].as_py(),
                               t.column("fmt")[i].as_py())
            tab = nd_index_bins(px, band2_fn(px), k)
            iid = pa.array([t.column("image_id")[i].as_py()] * tab.num_rows,
                           pa.string())
            parts.append(tab.add_column(0, "image_id", iid))
        return pa.concat_tables(parts) if parts else pa.table({
            "image_id": pa.array([], pa.string()),
            "bin": pa.array([], pa.int64()),
            "n_px": pa.array([], pa.int64()),
        })

    return images_ds.map_batches(run, batch_format="pyarrow")
