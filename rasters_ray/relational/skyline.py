"""Distributed 2-D skyline (Pareto frontier) over a Ray Dataset.

The skyline of a set of (x, y) points under (minimize x, maximize y)
is every point not strictly dominated by another: q dominates p iff
q.x <= p.x AND q.y >= p.y with at least one strict inequality.  Points
with identical (x, y) do not dominate each other, so exact duplicates
all survive — matching the relational NOT EXISTS definition.

Scale shape (the classic distributed BNL/SFS plan): the skyline
operator is idempotent and distributive over union — skyline(A ∪ B)
⊆ skyline(A) ∪ skyline(B) — so pass 1 computes a LOCAL skyline per
block with one vectorized sort+scan (no Python row loop), shrinking
each block to its frontier, and pass 2 re-runs the same kernel over
the union of the (small) local frontiers.  Nothing but frontier rows
ever moves; there is no all-pairs comparison anywhere.

The reference has no relational operators at all (SURVEY §2.7); this
is part of the engine's relational substrate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["local_skyline_indices", "skyline_2d"]


def local_skyline_indices(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Indices of the (min-x, max-y) skyline of one in-core point set.

    One lexsort (x asc, y desc) + one prefix max; O(n log n), fully
    vectorized.  A point survives iff (a) its y is the maximum within
    its exact-x group (same x, larger y strictly dominates) and (b) its
    y strictly exceeds the best y over all strictly smaller x (<= y
    there means a cheaper-or-equal point with >= y dominates).
    """
    n = len(x)
    if n == 0:
        return np.empty(0, np.int64)
    order = np.lexsort((-y, x))
    xs, ys = x[order], y[order]
    gstart = np.r_[True, xs[1:] != xs[:-1]]
    gid = np.cumsum(gstart) - 1
    gmax = ys[gstart][gid]  # sorted y-desc within group -> first is max
    gmaxs = ys[gstart]
    prevmax = np.concatenate(([np.iinfo(np.int64).min], np.maximum.accumulate(gmaxs)[:-1]))[gid]
    keep = (ys == gmax) & (ys > prevmax)
    return np.sort(order[keep])


def skyline_2d(ds, id_col: str, x_col: str, y_col: str):
    """Skyline of `ds` minimizing `x_col` and maximizing `y_col`.

    Columns must already be integer-valued (callers scale money to
    cents first) so dominance is exact.  Returns a Dataset with the
    three columns, int64.
    """

    def local(t: pa.Table) -> pa.Table:
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = local_skyline_indices(x, y)
        ids = t.column(id_col).take(pa.array(keep))
        return pa.table(
            {
                id_col: ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids,
                x_col: pa.array(x[keep], pa.int64()),
                y_col: pa.array(y[keep], pa.int64()),
            }
        )

    # pass 1: per-block frontiers; pass 2: frontier-of-frontiers.  The
    # repartition(1) moves only pass-1 survivors (frontier-sized).
    return (
        ds.map_batches(local, batch_format="pyarrow")
        .repartition(1)
        .map_batches(local, batch_format="pyarrow")
    )
