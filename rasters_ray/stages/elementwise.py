"""Elementwise raster algebra as batch UDFs.

Mirrors the reference's lifted numpy surface (raster.py:177-624 dunders,
where.py, clip.py, mask/fill, minmaxstretch/percentilecut) as per-row
vectorized transforms inside ``map_batches``. The generic ``apply_fn``
lifts ANY unary numpy function over decoded pixels — the engine analog of
the reference's ``__getattr__`` delegation (raster.py:971-978): the user
UDF surface.

``zip_apply`` aligns two image datasets on a key column (tile_id /
image_id) and applies a binary op — the engine's ``fill``/``where`` over
two rasters (raster.py:1917-1924).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pyarrow as pa

from .. import codec


def _map_pixels(batch: pa.Table, fn: Callable[[np.ndarray], np.ndarray]) -> pa.Table:
    blobs = batch.column("bytes").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    out_blobs = []
    out_fmts = []
    for b, f in zip(blobs, fmts):
        arr = codec.decode(b, f)
        if not arr.flags.writeable:
            # zero-copy decode returns READ-ONLY views over Arrow buffers;
            # user UDFs may mutate in place (a += 1), so hand them a copy
            arr = arr.copy()
        res = fn(arr)
        if res.dtype == np.float64:
            res = res.astype(np.float32)
        enc_fmt = "npy" if res.dtype not in (np.uint8, np.uint16) else f
        out_blobs.append(codec.encode(res, enc_fmt))
        out_fmts.append(enc_fmt)
    t = batch.set_column(batch.column_names.index("bytes"), "bytes", pa.array(out_blobs, pa.binary()))
    return t.set_column(t.column_names.index("fmt"), "fmt", pa.array(out_fmts, pa.string()))


def apply_fn(images_ds, fn: Callable[[np.ndarray], np.ndarray], **kw):
    """Lift a unary pixel function over a Dataset of images (UDF surface)."""
    return images_ds.map_batches(lambda t: _map_pixels(t, fn), batch_format="pyarrow", **kw)


def clip_values(images_ds, a_min: Optional[float], a_max: Optional[float], **kw):
    """Value clamp (clip.py:12-60)."""
    with np.errstate(invalid="ignore"):
        return apply_fn(images_ds, lambda a: np.clip(a, a_min, a_max), **kw)


def where_const(images_ds, pred: Callable[[np.ndarray], np.ndarray], value: float, **kw):
    """where(cond, value, pixels) lifting (where.py:11-97)."""

    def f(a: np.ndarray) -> np.ndarray:
        with np.errstate(invalid="ignore"):
            return np.where(pred(a), value, a).astype(np.float32)

    return apply_fn(images_ds, f, **kw)


def mask_nan(images_ds, pred: Callable[[np.ndarray], np.ndarray], **kw):
    """keep where mask else NaN (raster.py:1917-1918)."""

    def f(a: np.ndarray) -> np.ndarray:
        with np.errstate(invalid="ignore"):
            return np.where(pred(a), a, np.nan).astype(np.float32)

    return apply_fn(images_ds, f, **kw)


def minmaxstretch(images_ds, **kw):
    """Normalize to [0,1] by nanmin/nanmax (raster.py:2137-2145)."""

    def f(a: np.ndarray) -> np.ndarray:
        a = a.astype(np.float64)
        lo, hi = np.nanmin(a), np.nanmax(a)
        if hi == lo:
            return np.zeros_like(a, dtype=np.float32)
        return ((a - lo) / (hi - lo)).astype(np.float32)

    return apply_fn(images_ds, f, **kw)


def percentilecut(images_ds, lo: float = 2.0, hi: float = 98.0, **kw):
    """Normalize to [0,1] by the [lo, hi] percentile interval
    (raster.py:2147-2156)."""

    def f(a: np.ndarray) -> np.ndarray:
        a = a.astype(np.float64)
        plo, phi = np.nanpercentile(a, [lo, hi])
        if phi == plo:
            return np.zeros_like(a, dtype=np.float32)
        return np.clip((a - plo) / (phi - plo), 0.0, 1.0).astype(np.float32)

    return apply_fn(images_ds, f, **kw)


def image_stats(images_ds, **kw):
    """Per-image (nanmin, nanmax, nanmean, valid_px) scalar columns — the
    global-stretch statistics path (raster.py:1108-1113, 1997-2006)."""

    def f(batch: pa.Table) -> pa.Table:
        mins, maxs, means, valid = [], [], [], []
        for b, fmt in zip(batch.column("bytes").to_pylist(), batch.column("fmt").to_pylist()):
            a = codec.decode(b, fmt).astype(np.float64)
            m = np.isfinite(a)
            valid.append(int(m.sum()))
            if m.any():
                mins.append(float(a[m].min()))
                maxs.append(float(a[m].max()))
                means.append(float(a[m].mean()))
            else:
                mins.append(float("nan"))
                maxs.append(float("nan"))
                means.append(float("nan"))
        out = batch.drop_columns(["bytes"])
        out = out.append_column("px_min", pa.array(mins, pa.float64()))
        out = out.append_column("px_max", pa.array(maxs, pa.float64()))
        out = out.append_column("px_mean", pa.array(means, pa.float64()))
        out = out.append_column("valid_px", pa.array(valid, pa.int64()))
        return out

    return images_ds.map_batches(f, batch_format="pyarrow", **kw)


def zip_apply(
    a_ds,
    b_ds,
    fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
    key: str = "image_id",
):
    """Align two image datasets on ``key`` and apply a binary pixel op —
    e.g. fill (isnan(a) -> b, raster.py:1920-1924) or masked difference.

    Implemented as union + groupby(key).map_groups (a co-shuffle hash join;
    no broadcast side, both sides may be large)."""
    a_tag = a_ds.map_batches(
        lambda t: t.append_column("_side", pa.array([0] * t.num_rows, pa.int8())),
        batch_format="pyarrow",
    )
    b_tag = b_ds.map_batches(
        lambda t: t.append_column("_side", pa.array([1] * t.num_rows, pa.int8())),
        batch_format="pyarrow",
    )

    def combine(g: pa.Table) -> pa.Table:
        sides = g.column("_side").to_pylist()
        if len(sides) != 2 or 0 not in sides or 1 not in sides:
            return g.schema.empty_table()  # unmatched key -> dropped (inner)
        ia, ib = sides.index(0), sides.index(1)
        arr_a = codec.decode(g.column("bytes")[ia].as_py(), g.column("fmt")[ia].as_py())
        arr_b = codec.decode(g.column("bytes")[ib].as_py(), g.column("fmt")[ib].as_py())
        res = fn(arr_a, arr_b).astype(np.float32)
        out = g.slice(ia, 1)
        out = out.set_column(
            out.column_names.index("bytes"), "bytes",
            pa.array([codec.encode(res, "npy")], pa.binary()),
        )
        return out.set_column(
            out.column_names.index("fmt"), "fmt", pa.array(["npy"], pa.string())
        )

    return a_tag.union(b_tag).groupby(key).map_groups(combine, batch_format="pyarrow")


def fill_from(a_ds, b_ds, key: str = "image_id"):
    """NaN holes in A filled from B (raster.py:1920-1924)."""
    return zip_apply(
        a_ds, b_ds, lambda a, b: np.where(np.isnan(a), b, a), key=key
    )
