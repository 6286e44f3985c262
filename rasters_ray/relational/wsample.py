"""Deterministic weighted sampling — systematic (stride) resampling.

The classic particle-filter resampler (public algorithm: Kitagawa 1996,
"stratified/systematic resampling"): lay every row's integer weight out
on a number line as its cumulative interval ``[C_{i-1}, C_i)``, then take
``k`` equally-spaced sample points ``p_j = floor((2j+1) * W / (2k))``
(midpoints of k equal strides over the total weight W).  Row i is drawn
``|{j : p_j in [C_{i-1}, C_i)}|`` times — inclusion probability exactly
proportional to weight, zero variance across strides, and — unlike
Efraimidis-Spirakis keys, whose ``ln(u)/w`` ranking is not bit-portable
across math libraries — ALL integer arithmetic, so the distributed
result hashes bit-equal to a SQL oracle.

Distributed shape: weights to int64 cents -> global exclusive cumulative
weight via the two-level prefix scan (``prefix.prefix_sum_scan`` — one
bucket-key shuffle) -> one tiny Sum aggregate for W -> per-batch
``searchsorted`` of the k broadcast sample points against each row's
interval.  No global sort, no driver row loop.

Overflow note: ``(2j+1) * W`` must stay below 2^63 — with cent weights
that bounds total sampled value at ~1.4e14 currency units for k=32;
shift to micro-units or 128-bit math beyond that.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rasters_ray.relational.prefix import prefix_sum_scan

__all__ = ["weighted_systematic_sample"]


def weighted_systematic_sample(
    ds,
    order_col: str,
    weight_col: str,
    k: int,
    bucket_size: int = 4096,
):
    """Draw ``k`` weighted picks -> Table[order_col, w_cents, n_hits]
    (rows with at least one hit; multiplicity ``n_hits``).

    ``weight_col`` (float currency) is floored to int64 cents; rows are
    laid out in ``order_col`` order.
    """
    from ray.data.aggregate import Sum

    def to_cents(t: pa.Table) -> pa.Table:
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        cents = np.floor(w * 100.0).astype(np.int64)
        if cents.size and cents.min() < 0:
            # a negative weight would make cumulative intervals overlap,
            # silently double-drawing some rows and losing others
            raise ValueError("weights must be non-negative")
        return pa.table(
            {
                order_col: t.column(order_col),
                "w_cents": pa.array(cents, pa.int64()),
            }
        )

    cents = ds.map_batches(to_cents, batch_format="pyarrow")
    total = cents.aggregate(Sum("w_cents"))["sum(w_cents)"]
    W = int(total)
    if W <= 0:
        raise ValueError("total weight must be positive")
    if (2 * k - 1) * W >= (1 << 63):
        raise OverflowError("(2k-1)*W exceeds int64 — rescale weights")
    pts = ((2 * np.arange(k, dtype=np.int64) + 1) * np.int64(W)) // np.int64(2 * k)

    scanned = prefix_sum_scan(
        cents, order_col, "w_cents", out_col="c0", bucket_size=bucket_size
    )

    def hits(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    order_col: pa.array([], t.schema.field(order_col).type),
                    "w_cents": pa.array([], pa.int64()),
                    "n_hits": pa.array([], pa.int64()),
                }
            )
        c0 = t.column("c0").to_numpy(zero_copy_only=False)
        w = t.column("w_cents").to_numpy(zero_copy_only=False)
        lo = np.searchsorted(pts, c0, side="left")
        hi = np.searchsorted(pts, c0 + w, side="left")
        n = (hi - lo).astype(np.int64)
        keep = n > 0
        return pa.table(
            {
                order_col: t.column(order_col).filter(pa.array(keep)),
                "w_cents": pa.array(w[keep], pa.int64()),
                "n_hits": pa.array(n[keep], pa.int64()),
            }
        )

    return scanned.map_batches(hits, batch_format="pyarrow")
