"""Distributed DBSCAN over integer lattice points.

Ester et al. 1996, expressed in the engine's bounded-domain shape: on an
integer lattice, every point at the same position has the SAME
eps-neighborhood, so core-ness is a property of the POSITION (with
multiplicity counting).  The pipeline therefore:

1. collapses points to a (xi, yi, cnt) position histogram — the only
   row-scaled shuffle; everything after is bounded by the distinct
   position domain;
2. counts neighbors per position by replicating each position to its
   |disk(eps)| probe offsets and hash-joining back onto the histogram
   (a grid-bucketed band join — no all-pairs);
3. marks positions core when the inclusive neighbor count >= min_pts;
4. connects core positions within eps via the CCF
   :func:`~rasters_ray.relational.connected_components` rounds;
5. labels each cluster by its MINIMUM core point id (deterministic),
   assigns border positions to the minimum label among their core
   neighbors, everything else is noise (cluster -1);
6. joins the per-position verdicts back onto the points.

Output columns: (pid, xi, yi, status, cluster) with status in
{'core', 'border', 'noise'}.

No counterpart in the reference; the grid-partitioned formulation is
the standard scale-out DBSCAN (e.g. MR-DBSCAN, He et al. 2011).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..relational.aggregates import grouped_int_sums
from ..relational.concomp import connected_components
from ..relational.joins import hash_join

__all__ = ["dbscan_points", "disk_offsets"]

_POS_SHIFT = 1 << 21  # position id = xi * SHIFT + yi (xi, yi < 2^21)


def disk_offsets(eps2: int) -> np.ndarray:
    """All integer (dx, dy) with dx^2 + dy^2 <= eps2, incl. (0, 0)."""
    r = int(math.isqrt(int(eps2)))
    d = np.arange(-r, r + 1, dtype=np.int64)
    dx, dy = np.meshgrid(d, d, indexing="ij")
    keep = dx * dx + dy * dy <= eps2
    return np.stack([dx[keep], dy[keep]], axis=1)


def dbscan_points(ds, pid_col: str, x_col: str, y_col: str,
                  eps2: int, min_pts: int):
    """DBSCAN -> Dataset[(pid, xi, yi, status, cluster)].  ``eps2`` is
    the squared radius in lattice units; ``min_pts`` counts the point
    itself (the classical inclusive definition)."""
    offs = disk_offsets(eps2)

    def sel(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pid": t.column(pid_col).cast(pa.int64()),
                "xi": t.column(x_col).cast(pa.int64()),
                "yi": t.column(y_col).cast(pa.int64()),
            }
        )

    points = ds.map_batches(sel, batch_format="pyarrow")
    cells = grouped_int_sums(points, ["xi", "yi"], lambda t: {},
                             count_col="cnt")

    def probes(t: pa.Table) -> pa.Table:
        xi = t.column("xi").to_numpy(zero_copy_only=False)
        yi = t.column("yi").to_numpy(zero_copy_only=False)
        n, k = len(xi), len(offs)
        return pa.table(
            {
                "sx": pa.array(np.repeat(xi, k), pa.int64()),
                "sy": pa.array(np.repeat(yi, k), pa.int64()),
                "xi": pa.array(np.repeat(xi, k) + np.tile(offs[:, 0], n),
                               pa.int64()),
                "yi": pa.array(np.repeat(yi, k) + np.tile(offs[:, 1], n),
                               pa.int64()),
            }
        )

    # inclusive neighbor count per position
    hits = hash_join(cells.map_batches(probes, batch_format="pyarrow"),
                     cells, on=["xi", "yi"])
    ncount = grouped_int_sums(
        hits, ["sx", "sy"],
        lambda t: {"nn": t.column("cnt").to_numpy(zero_copy_only=False)},
        count_col="_m",
    )

    def core_rows(t: pa.Table) -> pa.Table:
        nn = t.column("nn").to_numpy(zero_copy_only=False)
        m = nn >= min_pts
        return pa.table(
            {
                "xi": t.column("sx").filter(pa.array(m)),
                "yi": t.column("sy").filter(pa.array(m)),
            }
        )

    core = ncount.map_batches(core_rows, batch_format="pyarrow").materialize()

    # core-core edges within eps (self pair kept: isolated cores stay nodes)
    core_hits = hash_join(core.map_batches(probes, batch_format="pyarrow"),
                          core, on=["xi", "yi"])

    def edge_rows(t: pa.Table) -> pa.Table:
        u = (t.column("sx").to_numpy(zero_copy_only=False) * _POS_SHIFT
             + t.column("sy").to_numpy(zero_copy_only=False))
        v = (t.column("xi").to_numpy(zero_copy_only=False) * _POS_SHIFT
             + t.column("yi").to_numpy(zero_copy_only=False))
        return pa.table({"u": pa.array(u, pa.int64()),
                         "v": pa.array(v, pa.int64())})

    roots = connected_components(
        core_hits.map_batches(edge_rows, batch_format="pyarrow")
    )

    # connected_components drops self-loop-only nodes: an ISOLATED core
    # position (no other core within eps) must still form its own
    # cluster.  Union a (pos, pos) identity row per core position and
    # take the per-node minimum — CCF roots satisfy root <= node, so
    # the min is the CCF root when one exists and the identity
    # otherwise (and the union keeps the pipeline schema-typed even
    # when the CCF output is empty).
    def core_identity(t: pa.Table) -> pa.Table:
        xi = t.column("xi").to_numpy(zero_copy_only=False)
        yi = t.column("yi").to_numpy(zero_copy_only=False)
        pos = xi * _POS_SHIFT + yi
        return pa.table(
            {
                "node": pa.array(pos, pa.int64()),
                "root": pa.array(pos, pa.int64()),
            }
        )

    def min_root(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": g.column("node").slice(0, 1),
                "root": pa.array(
                    [int(g.column("root").to_numpy(
                        zero_copy_only=False).min())],
                    pa.int64(),
                ),
            }
        )

    def root_pos(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "xi": pa.array(node // _POS_SHIFT, pa.int64()),
                "yi": pa.array(node % _POS_SHIFT, pa.int64()),
                "root": t.column("root"),
            }
        )

    core_roots = (
        core.map_batches(core_identity, batch_format="pyarrow")
        .union(roots)
        .groupby("node")
        .map_groups(min_root, batch_format="pyarrow")
        .map_batches(root_pos, batch_format="pyarrow")
    )

    # cluster label = min point id among the component's core points
    core_pts = hash_join(points, core_roots, on=["xi", "yi"])

    def min_pid(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "root": g.column("root").slice(0, 1),
                "lbl": pa.array(
                    [int(g.column("pid").to_numpy(
                        zero_copy_only=False).min())],
                    pa.int64(),
                ),
            }
        )

    labels = core_pts.groupby("root").map_groups(min_pid,
                                                 batch_format="pyarrow")
    core_lbl = hash_join(core_roots, labels, on="root").map_batches(
        lambda t: t.select(["xi", "yi", "lbl"]), batch_format="pyarrow"
    ).materialize()

    # border: non-core positions adopt the min label among core neighbors.
    # Degenerate inputs (no non-core positions / no borders) leave empty
    # post-shuffle datasets with NO schema, which joins reject — pin the
    # schema by unioning a typed empty table in front.
    import ray.data as rd

    def _typed(ds_in, schema: pa.Schema):
        return rd.from_arrow(schema.empty_table()).union(ds_in)

    _probe_schema = pa.schema(
        [("sx", pa.int64()), ("sy", pa.int64()),
         ("xi", pa.int64()), ("yi", pa.int64())]
    )
    noncore = hash_join(cells, core, on=["xi", "yi"], how="left anti")
    nc_hits = hash_join(
        _typed(noncore.map_batches(
            lambda t: probes(t.select(["xi", "yi"])),
            batch_format="pyarrow"), _probe_schema),
        core_lbl, on=["xi", "yi"],
    )

    def min_lbl(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "xi": g.column("sx").slice(0, 1),
                "yi": g.column("sy").slice(0, 1),
                "lbl": pa.array(
                    [int(g.column("lbl").to_numpy(
                        zero_copy_only=False).min())],
                    pa.int64(),
                ),
            }
        )

    border_lbl = nc_hits.groupby(["sx", "sy"]).map_groups(
        min_lbl, batch_format="pyarrow"
    )

    def tag(t: pa.Table, status: str) -> pa.Table:
        return t.append_column("status",
                               pa.array([status] * t.num_rows, pa.string()))

    _verdict_schema = pa.schema(
        [("xi", pa.int64()), ("yi", pa.int64()), ("lbl", pa.int64()),
         ("status", pa.string())]
    )
    core_v = core_lbl.map_batches(lambda t: tag(t, "core"),
                                  batch_format="pyarrow")
    border_v = border_lbl.map_batches(lambda t: tag(t, "border"),
                                      batch_format="pyarrow")
    pos_v = _typed(core_v.union(border_v), _verdict_schema)

    out = hash_join(points, pos_v, on=["xi", "yi"], how="left outer")

    def finish(t: pa.Table) -> pa.Table:
        lbl = t.column("lbl").to_numpy(zero_copy_only=False)
        status = np.asarray(
            [s if s is not None else "noise"
             for s in t.column("status").to_pylist()],
            dtype=object,
        )
        cluster = np.where(np.isnan(lbl.astype(np.float64)), -1,
                           np.nan_to_num(lbl.astype(np.float64))).astype(
            np.int64
        )
        return pa.table(
            {
                "pid": t.column("pid"),
                "xi": t.column("xi"),
                "yi": t.column("yi"),
                "status": pa.array(status, pa.string()),
                "cluster": pa.array(cluster, pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")
