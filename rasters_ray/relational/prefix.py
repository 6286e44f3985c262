"""Distributed prefix scans — cumulative aggregates over a global order.

The reference has no ordered-stream operators (nothing to cite); these are
engine-native primitives a training-data pipeline needs: sequence packing
(cumulative token offsets -> fixed-length sample ids) and gap filling
(last-observation-carried-forward over an event stream).

Shape: the classic two-level hierarchical scan.

1. **Bucket** every row by a coarse contiguous range of the order column
   (``bucket = order // bucket_size`` — order keys are dense non-negative
   ints in this schema, so buckets are contiguous slices of the global
   order).
2. **Partial pass** (`map_batches`): one vectorized partial per
   (block, bucket) — a few scalars per bucket, never payload.
3. **Driver scan**: combine partials per bucket, exclusive-scan the
   sorted bucket totals.  The driver holds O(n_buckets) scalars; at
   10^9+ buckets the same combinator nests (scan the bucket table with a
   second level) — not needed below ~10^11 rows with the default width.
4. **Apply pass** (`groupby(bucket).map_groups`): one all-to-all
   co-locates each bucket, the in-bucket scan is seeded with the
   broadcast carry-in.  Inside the group everything is numpy cumsum /
   maximum.accumulate — no per-row Python.

Exactly one shuffle regardless of data size, and the shuffle key is the
same contiguous-range key a sorted/range-partitioned input would already
have — on a pre-sorted 100 TB table the groupby degenerates to a local
repartition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["prefix_sum_scan", "forward_fill_scan"]


def _bucket_of(t: pa.Table, order_col: str, bucket_size: int) -> np.ndarray:
    order = t.column(order_col).to_numpy(zero_copy_only=False).astype(np.int64)
    if order.size and order.min() < 0:
        raise ValueError(f"{order_col} must be non-negative for range bucketing")
    return order // np.int64(bucket_size)


def _with_bucket(ds, order_col: str, bucket_size: int):
    def add(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__bucket", pa.array(_bucket_of(t, order_col, bucket_size), pa.int64())
        )

    return ds.map_batches(add, batch_format="pyarrow")


def prefix_sum_scan(
    ds,
    order_col: str,
    value_col: str,
    out_col: str = "offset",
    bucket_size: int = 4096,
):
    """Exclusive prefix sum of ``value_col`` (int64) in ``order_col`` order.

    Emits the input columns plus ``out_col`` = sum of ``value_col`` over
    all rows with a STRICTLY smaller order key.  Integer-exact and
    layout-independent: duplicate order keys all receive the same
    exclusive prefix (equal keys are aggregated before the cumsum), so
    the result is bit-equal to a sequential scan regardless of block
    layout or key multiplicity.
    """

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"b": pa.array([], pa.int64()), "s": pa.array([], pa.int64())})
        b = _bucket_of(t, order_col, bucket_size)
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(b, return_inverse=True)
        sums = np.bincount(inv, weights=v.astype(np.float64)).astype(np.int64)
        # bincount(weights=) goes through float64 — exact for |sum| < 2^53;
        # re-add in int64 when any bucket partial is large enough to care.
        if v.size and float(np.abs(v).max()) * v.size >= float(1 << 52):
            sums = np.zeros(len(uniq), np.int64)
            np.add.at(sums, inv, v)
        return pa.table({"b": pa.array(uniq, pa.int64()), "s": pa.array(sums, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # driver-small: one (bucket, partial) row per touched (block, bucket)
    totals = parts.groupby("b", sort=True)["s"].sum()
    carry_vals = np.concatenate([[0], np.cumsum(totals.to_numpy())[:-1]]) if len(totals) else np.array([], np.int64)
    carry = dict(zip(totals.index.to_numpy().tolist(), carry_vals.astype(np.int64).tolist()))

    def apply(group: pa.Table) -> pa.Table:
        order = group.column(order_col).to_numpy(zero_copy_only=False).astype(np.int64)
        v = group.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sort = np.argsort(order, kind="stable")
        os_, vs = order[sort], v[sort]
        # every row sharing an order key gets the SAME exclusive prefix —
        # the sum over STRICTLY smaller keys — so duplicates are
        # layout-independent (a stable argsort alone would distribute the
        # running sum among equal keys in block-arrival order). Equal keys
        # never span buckets (bucket = key // bucket_size), so the carry-in
        # stays exact too.
        newkey = np.r_[True, os_[1:] != os_[:-1]] if len(os_) else np.array([], bool)
        starts = np.flatnonzero(newkey)
        csum = np.cumsum(vs)
        group_excl = np.r_[0, csum[starts[1:] - 1]] if len(starts) else np.array([], np.int64)
        excl_sorted = group_excl[np.cumsum(newkey) - 1] if len(os_) else np.array([], np.int64)
        excl = np.empty(len(v), np.int64)
        excl[sort] = excl_sorted
        base = int(carry[int(group.column("__bucket")[0].as_py())])
        out = group.append_column(out_col, pa.array(excl + base, pa.int64()))
        return out.drop_columns(["__bucket"])

    return (
        _with_bucket(ds, order_col, bucket_size)
        .groupby("__bucket")
        .map_groups(apply, batch_format="pyarrow")
    )


def forward_fill_scan(
    ds,
    order_col: str,
    value_col: str,
    out_col: str = "filled",
    fill_start: float = float("nan"),
    bucket_size: int = 4096,
):
    """Last-observation-carried-forward over the global ``order_col`` order.

    ``out_col[i]`` = the ``value_col`` of the latest row at-or-before row i
    (in order) whose value is non-null; rows before the first observation
    get ``fill_start``.  Equivalent to SQL
    ``LAST_VALUE(v IGNORE NULLS) OVER (ORDER BY order ROWS UNBOUNDED
    PRECEDING)``.
    """

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "b": pa.array([], pa.int64()),
                    "o": pa.array([], pa.int64()),
                    "v": pa.array([], pa.float64()),
                }
            )
        b = _bucket_of(t, order_col, bucket_size)
        order = t.column(order_col).to_numpy(zero_copy_only=False).astype(np.int64)
        col = t.column(value_col)
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        valid = ~np.asarray(pc.is_null(col)) if col.null_count else np.ones(len(v), bool)
        valid &= ~np.isnan(v)
        if not valid.any():
            return pa.table(
                {
                    "b": pa.array([], pa.int64()),
                    "o": pa.array([], pa.int64()),
                    "v": pa.array([], pa.float64()),
                }
            )
        b, order, v = b[valid], order[valid], v[valid]
        # last (max-order) observation per bucket in this block
        sort = np.lexsort((order, b))
        b, order, v = b[sort], order[sort], v[sort]
        last = np.flatnonzero(np.r_[b[1:] != b[:-1], True])
        return pa.table(
            {
                "b": pa.array(b[last], pa.int64()),
                "o": pa.array(order[last], pa.int64()),
                "v": pa.array(v[last], pa.float64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # driver-small: latest observation per (block, bucket); reduce to one
    # per bucket.  carry-in for bucket k = last observation of any bucket
    # < k = runs[searchsorted(obs, k)], with runs[p] the final observation
    # of the latest observed bucket strictly before obs[p] (nan before the
    # first observation, best[-1] past the last).
    if len(parts):
        best = parts.sort_values(["b", "o"]).groupby("b", sort=True).last()
        obs = best.index.to_numpy().astype(np.int64)
        runs = np.r_[np.nan, best["v"].to_numpy().astype(np.float64)]
    else:
        obs = np.array([], np.int64)
        runs = np.array([np.nan])

    def apply(group: pa.Table) -> pa.Table:
        bk = int(group.column("__bucket")[0].as_py())
        seed = float(runs[int(np.searchsorted(obs, bk))])
        order = group.column(order_col).to_numpy(zero_copy_only=False).astype(np.int64)
        col = group.column(value_col)
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        valid = ~np.asarray(pc.is_null(col)) if col.null_count else np.ones(len(v), bool)
        valid &= ~np.isnan(v)
        sort = np.argsort(order, kind="stable")
        vs, vals = v[sort], valid[sort]
        # standard vectorized LOCF: index of latest valid at-or-before i
        idx = np.where(vals, np.arange(len(vs)) + 1, 0)
        np.maximum.accumulate(idx, out=idx)
        seq = np.r_[seed, vs]
        filled_sorted = np.where(
            (idx == 0) & np.isnan(seed), fill_start, seq[idx]
        )
        filled = np.empty(len(vs), np.float64)
        filled[sort] = filled_sorted
        out = group.append_column(out_col, pa.array(filled, pa.float64()))
        return out.drop_columns(["__bucket"])

    return (
        _with_bucket(ds, order_col, bucket_size)
        .groupby("__bucket")
        .map_groups(apply, batch_format="pyarrow")
    )
