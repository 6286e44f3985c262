"""Seam carving (Avidan & Shamir 2007) — vertical-seam DP energy.

Per image: integer L1 gradient energy with clamped borders, then the
classic dynamic program M[r, c] = e[r, c] + min(M[r-1, c-1..c+1]).
Reported per image: the minimum seam cost, the entry column of that
seam (ties -> smallest column), and the total last-row DP mass.

Scale shape: embarrassingly parallel per image (one map, no shuffle);
the DP itself is a NumPy row sweep — R vectorized steps of width C,
the data-dependent-sequential pattern the engine reserves for genuine
recurrences (like the Huffman decode loop).  The SQL oracle replays
the SAME recurrence as a recursive CTE over per-row energy LISTs, so
any off-by-one in borders or the 3-way min is a value mismatch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rasters_ray import codec

__all__ = ["seam_dp_arrays", "seam_energy_stats"]


def seam_dp_arrays(px: np.ndarray):
    """(min_cost, argmin_col, last_row_sum, last_row M) for one image.

    `px` is a 2-D array; values are rounded to int64 first so the DP is
    exact.  Border energy clamps neighbor indices (edge replicate), the
    convention the oracle replays with GREATEST/LEAST index joins.
    """
    v = np.rint(np.asarray(px, np.float64)).astype(np.int64)
    if v.ndim != 2 or v.size == 0:
        raise ValueError("seam_dp_arrays needs a non-empty 2-D array")
    R, C = v.shape
    cl = v[:, np.maximum(np.arange(C) - 1, 0)]
    cr = v[:, np.minimum(np.arange(C) + 1, C - 1)]
    ru = v[np.maximum(np.arange(R) - 1, 0), :]
    rd = v[np.minimum(np.arange(R) + 1, R - 1), :]
    e = np.abs(cr - cl) + np.abs(rd - ru)
    m = e[0].copy()
    big = np.iinfo(np.int64).max
    for r in range(1, R):  # genuine recurrence: R vectorized steps
        left = np.concatenate(([big], m[:-1]))
        right = np.concatenate((m[1:], [big]))
        m = e[r] + np.minimum(np.minimum(left, m), right)
    mn = int(m.min())
    return mn, int(np.argmin(m)), int(m.sum()), m


def seam_energy_stats(images_ds):
    """Per-image seam DP summary -> Dataset[(image_id, min_cost,
    argmin_col, total_last)]."""

    def kernel(t: pa.Table) -> pa.Table:
        ids, mc, am, tl = [], [], [], []
        if t.num_rows:
            blobs = codec.BlobReader(t.column("bytes"))
            fmts = t.column("fmt").to_pylist()
            id_col = t.column("image_id").to_pylist()
            for i in range(t.num_rows):
                pxi = codec.decode(blobs[i], fmts[i])
                mn, ac, s, _ = seam_dp_arrays(pxi)
                ids.append(id_col[i])
                mc.append(mn)
                am.append(ac)
                tl.append(s)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "min_cost": pa.array(mc, pa.int64()),
                "argmin_col": pa.array(am, pa.int64()),
                "total_last": pa.array(tl, pa.int64()),
            }
        )

    return images_ds.map_batches(kernel, batch_format="pyarrow")
