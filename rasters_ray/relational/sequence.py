"""Order-sensitive sequence analytics over event streams.

`transition_counts` builds the first-order Markov transition table of
a per-user event stream: for each user's events ordered by (ts, id),
count every adjacent (from_type -> to_type) pair.  This is the
substrate of session flow analysis / Markov chain attribution.

Scale shape: events hash-partition by user (ONE all-to-all — each
user's stream must be contiguous to order it), then each partition
counts all its users' pairs in one vectorized pass (lexsort + adjacent
compare + np.unique).  Only (from, to, n) partials — at most
|types|^2 rows per partition — reach the tiny final reduce
(`grouped_int_sums(partials_ready=True)`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["pair_counts_arrays", "transition_counts"]


def pair_counts_arrays(u: np.ndarray, order_key: np.ndarray,
                       tie_key: np.ndarray, types: np.ndarray):
    """(from_types, to_types, counts) of adjacent same-user pairs.

    `types` is an object array of strings; ordering is (u, order_key,
    tie_key) ascending — `tie_key` must make the order total (e.g. a
    unique event id) for a deterministic table.
    """
    n = len(u)
    if n < 2:
        e = np.empty(0, object)
        return e, e, np.empty(0, np.int64)
    utypes, tcode = np.unique(types, return_inverse=True)
    order = np.lexsort((tie_key, order_key, u))
    uo = u[order]
    co = tcode[order]
    same = uo[1:] == uo[:-1]
    fr = co[:-1][same]
    to = co[1:][same]
    if not len(fr):
        e = np.empty(0, object)
        return e, e, np.empty(0, np.int64)
    packed = fr.astype(np.int64) * len(utypes) + to
    uniq, cnt = np.unique(packed, return_counts=True)
    return (
        utypes[uniq // len(utypes)],
        utypes[uniq % len(utypes)],
        cnt.astype(np.int64),
    )


def transition_counts(ds, user_col: str, ts_col: str, id_col: str,
                      type_col: str, n_parts: int = 32):
    """Global (from_type, to_type, n) transition table as a Dataset."""
    from rasters_ray.relational.aggregates import grouped_int_sums

    def tag(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy(zero_copy_only=False)
        return t.append_column("_part", pa.array(u % n_parts, pa.int64()))

    def fold(group: pa.Table) -> pa.Table:
        u = group.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group.column(ts_col).cast(pa.int64()).to_numpy()
        eid = group.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ty = np.asarray(group.column(type_col).to_pylist(), dtype=object)
        fr, to, cnt = pair_counts_arrays(u, ts, eid, ty)
        return pa.table(
            {
                "from_type": pa.array(fr, pa.string()),
                "to_type": pa.array(to, pa.string()),
                "n": pa.array(cnt, pa.int64()),
            }
        )

    partials = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(fold, batch_format="pyarrow")
    )
    return grouped_int_sums(
        partials, ["from_type", "to_type"], None, partials_ready=True
    )
