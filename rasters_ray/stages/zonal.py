"""Zonal statistics — per-zone aggregates of pixel values.

The rasterize ∘ aggregate composition (reference: ``Raster.mask`` +
numpy stats per geometry, raster.py mask/statistics paths) as a
streaming Ray pipeline: the zone table is TINY (broadcast once via
``ray.put``), each image batch accumulates integer (sum, count)
partials per zone with one boolean-mask slice per (image, zone), and a
low-cardinality ``groupby(zone_id).aggregate(Sum)`` finishes. Zone
cardinality is the number of polygons/boxes a user asks about — small
by construction — so the per-key groupby is appropriate here (the
lattice composites handle per-PIXEL cardinality).

Containment is CENTER containment (``rasterize_mask(all_touched=False)``
semantics): a pixel belongs to a zone iff its center coordinate lies in
the zone's bbox, inclusive on both edges. Sums are int64 over rounded
values so results are exact and order-independent (the DuckDB oracle
recomputes them bit-for-bit).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import codec
from ..grids import GridSpec

ZONES_SCHEMA = pa.schema(
    [
        ("zone_id", pa.int64()),
        ("xmin", pa.float64()),
        ("ymin", pa.float64()),
        ("xmax", pa.float64()),
        ("ymax", pa.float64()),
    ]
)


class ZonalStage:
    """map_batches combiner: per-batch (zone_id, psum, pcnt) partials.
    Zones fetched once per worker from the broadcast ref."""

    def __init__(self, zones_ref):
        import ray

        z = ray.get(zones_ref) if not isinstance(zones_ref, pa.Table) else zones_ref
        self.zid = z.column("zone_id").to_numpy(zero_copy_only=False).astype(np.int64)
        self.xmin = z.column("xmin").to_numpy(zero_copy_only=False)
        self.ymin = z.column("ymin").to_numpy(zero_copy_only=False)
        self.xmax = z.column("xmax").to_numpy(zero_copy_only=False)
        self.ymax = z.column("ymax").to_numpy(zero_copy_only=False)

    def __call__(self, batch: pa.Table) -> pa.Table:
        grids = batch.column("grid").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        blobs = codec.BlobReader(batch.column("bytes"))
        acc: dict = {}
        for i in range(batch.num_rows):
            grid = GridSpec.from_dict(grids[i])
            arr = codec.decode(blobs[i], fmts[i])
            if arr.ndim != 2:
                raise ValueError("zonal_stats is per-band: split band stacks first")
            finite = np.isfinite(arr)
            vals = np.where(finite, np.rint(arr), 0).astype(np.int64)
            cx = grid.x_origin + (np.arange(grid.cols) + 0.5) * grid.cell_width
            cy = grid.y_origin + (np.arange(grid.rows) + 0.5) * grid.cell_height
            gx0, gx1 = cx.min(), cx.max()
            gy0, gy1 = cy.min(), cy.max()
            hit = np.flatnonzero(
                (self.xmin <= gx1) & (self.xmax >= gx0)
                & (self.ymin <= gy1) & (self.ymax >= gy0)
            )
            for z in hit:
                mx = (cx >= self.xmin[z]) & (cx <= self.xmax[z])
                my = (cy >= self.ymin[z]) & (cy <= self.ymax[z])
                if not (mx.any() and my.any()):
                    continue
                sub = np.ix_(my, mx)
                n = int(finite[sub].sum())
                if n == 0:
                    continue
                s = int(vals[sub].sum())
                zid = int(self.zid[z])
                if zid in acc:
                    acc[zid][0] += s
                    acc[zid][1] += n
                else:
                    acc[zid] = [s, n]
        if not acc:
            return pa.table(
                {"zone_id": pa.array([], pa.int64()),
                 "psum": pa.array([], pa.int64()),
                 "pcnt": pa.array([], pa.int64())}
            )
        zids = sorted(acc)
        return pa.table(
            {
                "zone_id": pa.array(zids, pa.int64()),
                "psum": pa.array([acc[z][0] for z in zids], pa.int64()),
                "pcnt": pa.array([acc[z][1] for z in zids], pa.int64()),
            }
        )


def zonal_stats(images_ds, zones: pa.Table, concurrency=None):
    """Dataset[(zone_id, n_px, sum_value)] — only zones with >= 1 finite
    pixel appear (inner-join semantics, matching the SQL oracle)."""
    import ray
    from ray.data.aggregate import Sum

    zref = ray.put(zones)
    partials = images_ds.map_batches(
        ZonalStage,
        fn_constructor_kwargs={"zones_ref": zref},
        batch_format="pyarrow",
        concurrency=concurrency or 4,
    )
    return partials.groupby("zone_id").aggregate(
        Sum("pcnt", alias_name="n_px"), Sum("psum", alias_name="sum_value")
    )


class ZonalCategoricalStage:
    """map_batches combiner for categorical zonal statistics: per-batch
    (zone_id, value, pcnt) partials via one bincount per (image, zone)
    slice.  Values are rounded to int64 (finite pixels only), the same
    center-containment bbox test as ZonalStage."""

    def __init__(self, zones_ref):
        import ray

        z = ray.get(zones_ref) if not isinstance(zones_ref, pa.Table) else zones_ref
        self.zid = z.column("zone_id").to_numpy(zero_copy_only=False).astype(np.int64)
        self.xmin = z.column("xmin").to_numpy(zero_copy_only=False)
        self.ymin = z.column("ymin").to_numpy(zero_copy_only=False)
        self.xmax = z.column("xmax").to_numpy(zero_copy_only=False)
        self.ymax = z.column("ymax").to_numpy(zero_copy_only=False)

    def __call__(self, batch: pa.Table) -> pa.Table:
        grids = batch.column("grid").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        blobs = codec.BlobReader(batch.column("bytes"))
        acc: dict = {}
        for i in range(batch.num_rows):
            grid = GridSpec.from_dict(grids[i])
            arr = codec.decode(blobs[i], fmts[i])
            if arr.ndim != 2:
                raise ValueError("zonal stats are per-band: split band stacks first")
            finite = np.isfinite(arr)
            vals = np.where(finite, np.rint(arr), 0).astype(np.int64)
            if (vals < 0).any():
                raise ValueError("categorical zonal stats expect non-negative codes")
            cx = grid.x_origin + (np.arange(grid.cols) + 0.5) * grid.cell_width
            cy = grid.y_origin + (np.arange(grid.rows) + 0.5) * grid.cell_height
            gx0, gx1 = cx.min(), cx.max()
            gy0, gy1 = cy.min(), cy.max()
            hit = np.flatnonzero(
                (self.xmin <= gx1) & (self.xmax >= gx0)
                & (self.ymin <= gy1) & (self.ymax >= gy0)
            )
            for z in hit:
                mx = (cx >= self.xmin[z]) & (cx <= self.xmax[z])
                my = (cy >= self.ymin[z]) & (cy <= self.ymax[z])
                if not (mx.any() and my.any()):
                    continue
                sub = np.ix_(my, mx)
                fin = finite[sub].ravel()
                if not fin.any():
                    continue
                counts = np.bincount(vals[sub].ravel()[fin])
                zid = int(self.zid[z])
                prev = acc.get(zid)
                if prev is None:
                    acc[zid] = counts
                elif prev.size >= counts.size:
                    prev[: counts.size] += counts
                else:
                    counts[: prev.size] += prev
                    acc[zid] = counts
        zc, vc, nc = [], [], []
        for zid in sorted(acc):
            nz = np.flatnonzero(acc[zid])
            zc.extend([zid] * nz.size)
            vc.extend(nz.tolist())
            nc.extend(acc[zid][nz].tolist())
        return pa.table(
            {
                "zone_id": pa.array(zc, pa.int64()),
                "value": pa.array(vc, pa.int64()),
                "pcnt": pa.array(nc, pa.int64()),
            }
        )


def zonal_categorical(images_ds, zones: pa.Table, concurrency=None):
    """ArcGIS ZonalStatistics MAJORITY / MINORITY / VARIETY (plus MIN /
    MAX) over integer-coded rasters: Dataset[(zone_id, variety, vmin,
    vmax, majority, majority_n, minority, minority_n)].

    Ties break to the SMALLEST value code (the ArcGIS rule).  Pixels
    never shuffle: per-batch bincount partials combine through a
    (zone_id, value) groupby whose payload is distinct pairs, then a
    per-zone map_groups finishes the argmax/argmin."""
    import ray
    from ray.data.aggregate import Sum

    zref = ray.put(zones)
    partials = images_ds.map_batches(
        ZonalCategoricalStage,
        fn_constructor_kwargs={"zones_ref": zref},
        batch_format="pyarrow",
        concurrency=concurrency or 4,
    )
    pairs = partials.groupby(["zone_id", "value"]).aggregate(
        Sum("pcnt", alias_name="n")
    )

    def finish(df):
        import pandas as pd

        v = df["value"].to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        # lexicographic (-n, value) / (n, value) keys: value < 2**20
        maj = np.lexsort((v, -n))[0]
        mino = np.lexsort((v, n))[0]
        return pd.DataFrame(
            {
                "zone_id": [int(df["zone_id"].iloc[0])],
                "variety": [int(len(v))],
                "vmin": [int(v.min())],
                "vmax": [int(v.max())],
                "majority": [int(v[maj])],
                "majority_n": [int(n[maj])],
                "minority": [int(v[mino])],
                "minority_n": [int(n[mino])],
            }
        )

    return pairs.groupby("zone_id").map_groups(finish, batch_format="pandas")


class CrosstabStage:
    """map_batches combiner for the distributed crosstab: each batch of
    encoded rasters is decoded, ``classify(arr) -> (zones, classes)``
    derives the two co-registered categorical layers, and the local
    contingency counts are accumulated into ONE packed bincount per
    batch.  The partial payload is distinct (zone, klass) pairs — never
    pixels — so the finishing groupby is tiny regardless of raster
    size (same partial-aggregate shape as ZonalStage)."""

    def __init__(self, classify):
        self.classify = classify

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch.column("fmt").to_pylist()
        blobs = codec.BlobReader(batch.column("bytes"))
        acc: dict = {}
        for i in range(batch.num_rows):
            arr = codec.decode(blobs[i], fmts[i])
            z, c = self.classify(arr)
            part = crosstab(z, c)
            for zz, kk, nn in zip(
                part.column("zone").to_numpy(),
                part.column("klass").to_numpy(),
                part.column("n_px").to_numpy(),
            ):
                key = (int(zz), int(kk))
                acc[key] = acc.get(key, 0) + int(nn)
        keys = sorted(acc)
        return pa.table(
            {
                "zone": pa.array([k[0] for k in keys], pa.int64()),
                "klass": pa.array([k[1] for k in keys], pa.int64()),
                "pcnt": pa.array([acc[k] for k in keys], pa.int64()),
            }
        )


def crosstab_images(images_ds, classify, concurrency=None):
    """Distributed Tabulate Area: Dataset[(zone, klass, n_px)] over every
    raster in ``images_ds``.  ``classify`` maps a decoded 2-D array to the
    (zone_codes, class_codes) integer layers; partial contingency tables
    combine inside map_batches and a low-cardinality multi-key groupby
    finishes — pixels never cross the shuffle."""
    from ray.data.aggregate import Sum

    partials = images_ds.map_batches(
        CrosstabStage,
        fn_constructor_kwargs={"classify": classify},
        batch_format="pyarrow",
        concurrency=concurrency or 4,
    )
    return partials.groupby(["zone", "klass"]).aggregate(
        Sum("pcnt", alias_name="n_px")
    )


def crosstab(zones: np.ndarray, classes: np.ndarray) -> pa.Table:
    """Tabulate Area (ArcGIS) / GRASS r.stats: the contingency table
    of two co-registered categorical rasters — one row per present
    (zone, class) pair with its pixel count, sorted by (zone, class).

    Vectorized as a single bincount over the packed pair code; exact
    integers.  At scale this is a per-tile partial crosstab (map_batches
    emits the local pairs) followed by a groupby-sum whose payload is
    distinct pairs, never pixels — the same partial-aggregate shape as
    pixel_histogram."""
    z = np.asarray(zones, dtype=np.int64)
    c = np.asarray(classes, dtype=np.int64)
    if z.shape != c.shape:
        raise ValueError("crosstab rasters must share a shape")
    if (z < 0).any() or (c < 0).any():
        raise ValueError("crosstab expects non-negative category codes")
    zf, cf = z.ravel(), c.ravel()
    width = int(cf.max()) + 1 if cf.size else 1
    packed = zf * width + cf
    counts = np.bincount(packed)
    present = np.flatnonzero(counts)
    return pa.table({
        "zone": pa.array(present // width, pa.int64()),
        "klass": pa.array(present % width, pa.int64()),
        "n_px": pa.array(counts[present], pa.int64()),
    })


def cut_fill(z_before: np.ndarray, z_after: np.ndarray) -> dict:
    """Cut-fill volumes between two co-registered integral DEMs (the
    ArcGIS Cut Fill / QGIS raster-volume operation, per-scene totals):
    cut = sum of positive (before - after), fill = sum of positive
    (after - before), net = cut - fill, plus the cell counts.  All
    INTEGER sufficient statistics (multiply by cell area for volume
    units on a regular grid)."""
    a = np.asarray(z_before)
    b = np.asarray(z_after)
    if a.shape != b.shape or a.ndim != 2:
        raise ValueError("cut_fill needs two co-registered 2D rasters")
    for x in (a, b):
        if not np.issubdtype(x.dtype, np.integer):
            if not np.all(np.isfinite(x)) or np.any(x != np.rint(x)):
                raise ValueError("cut_fill requires integral pixel values")
    d = a.astype(np.int64) - b.astype(np.int64)
    return {
        "cut": int(d[d > 0].sum()),
        "fill": int(-d[d < 0].sum()),
        "net": int(d.sum()),
        "n_cut": int((d > 0).sum()),
        "n_fill": int((d < 0).sum()),
        "n_same": int((d == 0).sum()),
    }


def cutfill_images(images_ds, after_fn):
    """Per-image cut-fill totals against a derived 'after' surface:
    Dataset[(image_id, cut, fill, net, n_cut, n_fill, n_same)].
    ``after_fn(image_id, arr) -> np.ndarray`` builds the second DEM
    (a reference surface, a design grade, or another acquisition
    loaded by id).  One map_batches, nothing shuffles; at scale the
    two-acquisition variant is a co-partitioned zip join on tile key."""

    def run(t: pa.Table) -> pa.Table:
        cols = {k: [] for k in ("image_id", "cut", "fill", "net",
                                "n_cut", "n_fill", "n_same")}
        for i in range(t.num_rows):
            iid = t.column("image_id")[i].as_py()
            px = codec.decode(t.column("bytes")[i].as_py(),
                              t.column("fmt")[i].as_py())
            st = cut_fill(px, after_fn(iid, px))
            cols["image_id"].append(iid)
            for k in ("cut", "fill", "net", "n_cut", "n_fill", "n_same"):
                cols[k].append(st[k])
        out = {"image_id": pa.array(cols["image_id"], pa.string())}
        for k in ("cut", "fill", "net", "n_cut", "n_fill", "n_same"):
            out[k] = pa.array(cols[k], pa.int64())
        return pa.table(out)

    return images_ds.map_batches(run, batch_format="pyarrow")
