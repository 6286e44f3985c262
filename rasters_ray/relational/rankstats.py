"""Rank-based statistics as histogram-shuffle operators.

Three classical nonparametric statistics, each value-exact and
distributed in the repo's bounded-domain histogram shape (the
``ks_two_sample`` pattern, aggregates.py): the all-to-all moves distinct
(group, value) or (group, x, y) CELLS with integer counts — never rows —
and the per-group finish is an in-core vectorized pass over that
bounded histogram.

* ``spearman_grouped`` — Spearman's rho per group.  Average tie ranks
  are kept integral by DOUBLING them (avg rank of a tie run starting
  after ``cum`` items with ``cnt`` members is ``cum + (cnt+1)/2``, so
  the doubled rank ``2*cum + cnt + 1`` is an exact int64).  The rho is
  Pearson over doubled ranks: exact integer sufficient statistics, one
  fixed-order float expression (the pearson/moran replay pattern).
* ``kendall_tau_grouped`` — Kendall's tau-b per group from the joint
  histogram: concordant/discordant pair counts via 2-D suffix sums over
  the dense (x, y) cell matrix (Knight 1966 reduced to cells), tie
  terms from the marginals; one fixed-order float.
* ``mann_whitney`` — exact two-sample Mann-Whitney U (= ROC AUC) over
  integer values: with the sorted histogram (v, n_a, n_b), the DOUBLED
  statistic ``u2_a = sum_v n_a(v) * (2*cumb_before(v) + n_b(v))``
  counts wins twice and ties once, an exact integer; AUC is the single
  float division ``u2_a / (2*n1*n2)``.

No counterpart in the reference (a raster library); the statistics are
textbook (Kendall 1948; Mann & Whitney 1947).  Products beyond int64
(n * sxx style) are formed as Python ints in the tiny per-group finish
— the replay SQL uses HUGEINT for the same terms.
"""

from __future__ import annotations

import math
from collections.abc import Callable

import numpy as np
import pyarrow as pa

from .aggregates import grouped_int_sums

__all__ = ["spearman_grouped", "kendall_tau_grouped", "mann_whitney",
           "wasserstein_1d", "roc_points", "kruskal_wallis"]


def _joint_cells(ds, group_col: str, xy_fn):
    """(group, x, y, c) cell histogram — the only shuffle of the rank ops."""

    def rows(t: pa.Table) -> pa.Table:
        x, y = xy_fn(t)
        return pa.table(
            {
                group_col: t.column(group_col),
                "_x": pa.array(np.asarray(x, np.int64), pa.int64()),
                "_y": pa.array(np.asarray(y, np.int64), pa.int64()),
            }
        )

    return grouped_int_sums(
        ds.map_batches(rows, batch_format="pyarrow"),
        [group_col, "_x", "_y"],
        lambda t: {},
        count_col="_c",
    )


def _doubled_ranks(vals: np.ndarray, cnts: np.ndarray) -> np.ndarray:
    """Doubled average tie ranks for sorted distinct values with counts."""
    order = np.argsort(vals, kind="stable")
    cum = np.zeros(len(vals), dtype=np.int64)
    c_sorted = cnts[order]
    cum[order] = np.concatenate(([0], np.cumsum(c_sorted)[:-1]))
    return 2 * cum + cnts + 1


def spearman_grouped(ds, group_col: str, xy_fn: Callable):
    """Spearman's rho per group -> Dataset[(group, n, sdx, sdy, sdxx,
    sdyy, sdxy, rho)].

    ``xy_fn(batch) -> (int64 x, int64 y)`` derives the two variables
    (bounded domains, e.g. quantity and floor-dollars).  One shuffle of
    distinct (group, x, y) cells; the per-group finish ranks the two
    marginals and folds the cross moment over cells, all exact."""
    cells = _joint_cells(ds, group_col, xy_fn)

    def final(g: pa.Table) -> pa.Table:
        x = g.column("_x").to_numpy(zero_copy_only=False)
        y = g.column("_y").to_numpy(zero_copy_only=False)
        c = g.column("_c").to_numpy(zero_copy_only=False)
        n = int(c.sum())
        # marginal histograms -> doubled average ranks per distinct value
        xv, xi = np.unique(x, return_inverse=True)
        yv, yi = np.unique(y, return_inverse=True)
        xc = np.bincount(xi, weights=c).astype(np.int64)
        yc = np.bincount(yi, weights=c).astype(np.int64)
        dx = _doubled_ranks(xv, xc)[xi]
        dy = _doubled_ranks(yv, yc)[yi]
        sdx = int((c * dx).sum())
        sdy = int((c * dy).sum())
        sdxx = int((c * dx * dx).sum())
        sdyy = int((c * dy * dy).sum())
        sdxy = int((c * dx * dy).sum())
        num = float(n * sdxy - sdx * sdy)  # Python ints: exact > int64
        d1 = math.sqrt(float(n * sdxx - sdx * sdx))
        d2 = math.sqrt(float(n * sdyy - sdy * sdy))
        return pa.table(
            {
                group_col: g.column(group_col).slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "sdx": pa.array([sdx], pa.int64()),
                "sdy": pa.array([sdy], pa.int64()),
                "sdxx": pa.array([sdxx], pa.int64()),
                "sdyy": pa.array([sdyy], pa.int64()),
                "sdxy": pa.array([sdxy], pa.int64()),
                "rho": pa.array([num / (d1 * d2)], pa.float64()),
            }
        )

    return cells.groupby(group_col).map_groups(final, batch_format="pyarrow")


def kendall_tau_grouped(ds, group_col: str, xy_fn: Callable):
    """Kendall's tau-b per group -> Dataset[(group, n, conc, disc, tx,
    ty, tau)].

    Concordant/discordant pair counts from the dense cell matrix
    M[x, y]: ``conc = sum_ij M[i,j] * S[i+1:, j+1:].sum()`` via a 2-D
    suffix cumsum (each unordered pair counted once in the strict
    orientation), tie corrections from the marginals; tau-b's one float
    is ``(conc-disc) / (sqrt(n0-tx)*sqrt(n0-ty))``."""
    cells = _joint_cells(ds, group_col, xy_fn)

    def final(g: pa.Table) -> pa.Table:
        x = g.column("_x").to_numpy(zero_copy_only=False)
        y = g.column("_y").to_numpy(zero_copy_only=False)
        c = g.column("_c").to_numpy(zero_copy_only=False)
        n = int(c.sum())
        xv, xi = np.unique(x, return_inverse=True)
        yv, yi = np.unique(y, return_inverse=True)
        m = np.zeros((len(xv), len(yv)), dtype=np.int64)
        m[xi, yi] = c
        # suffix sums: gt_gt[i, j] = sum of m over x > i AND y > j
        sfx = np.cumsum(np.cumsum(m[::-1, ::-1], axis=0), axis=1)[::-1, ::-1]
        gt_gt = np.zeros_like(m)
        gt_gt[:-1, :-1] = sfx[1:, 1:]
        # gt_lt[i, j] = sum of m over x > i AND y < j
        rows_gt = np.zeros_like(m)
        rows_gt[:-1, :] = np.cumsum(m[::-1, :], axis=0)[::-1, :][1:, :]
        gt_lt = np.zeros_like(m)
        gt_lt[:, 1:] = np.cumsum(rows_gt, axis=1)[:, :-1]
        conc = int((m * gt_gt).sum())
        disc = int((m * gt_lt).sum())
        xc = np.bincount(xi, weights=c).astype(np.int64)
        yc = np.bincount(yi, weights=c).astype(np.int64)
        tx = int((xc * (xc - 1) // 2).sum())
        ty = int((yc * (yc - 1) // 2).sum())
        n0 = n * (n - 1) // 2  # Python int
        tau = float(conc - disc) / (
            math.sqrt(float(n0 - tx)) * math.sqrt(float(n0 - ty))
        )
        return pa.table(
            {
                group_col: g.column(group_col).slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "conc": pa.array([conc], pa.int64()),
                "disc": pa.array([disc], pa.int64()),
                "tx": pa.array([tx], pa.int64()),
                "ty": pa.array([ty], pa.int64()),
                "tau": pa.array([tau], pa.float64()),
            }
        )

    return cells.groupby(group_col).map_groups(final, batch_format="pyarrow")


def mann_whitney(ds, type_col: str, values_fn, type_a: str, type_b: str):
    """Exact Mann-Whitney U / ROC AUC between two samples -> ONE row
    (n1, n2, u2_a, u2_b, tie_term, auc).

    ``u2_a`` is the doubled U of sample a (wins x2 + ties x1) so it is
    an exact integer under ties; ``u2_b = 2*n1*n2 - u2_a``.
    ``tie_term = sum_v t(t-1)(t+1)`` over pooled tie groups (the exact
    variance correction numerator, kept for downstream z-scores).
    ``auc = u2_a / (2*n1*n2)`` is the single float division."""

    def partial_rows(t: pa.Table) -> pa.Table:
        ty = np.asarray(t.column(type_col).to_pylist(), dtype=object)
        v = np.asarray(values_fn(t), np.int64)
        ma, mb = ty == type_a, ty == type_b
        keep = ma | mb
        return pa.table(
            {
                "_v": pa.array(v[keep], pa.int64()),
                "_isa": pa.array(ma[keep].astype(np.int64), pa.int64()),
            }
        )

    hist = grouped_int_sums(
        ds.map_batches(partial_rows, batch_format="pyarrow"),
        ["_v"],
        lambda t: {
            "na": t.column("_isa").to_numpy(zero_copy_only=False),
            "nb": 1 - t.column("_isa").to_numpy(zero_copy_only=False),
        },
        count_col="_n",
    )

    def final(t: pa.Table) -> pa.Table:
        v = t.column("_v").to_numpy(zero_copy_only=False)
        na = t.column("na").to_numpy(zero_copy_only=False)
        nb = t.column("nb").to_numpy(zero_copy_only=False)
        order = np.argsort(v)
        nas, nbs = na[order], nb[order]
        cumb_before = np.concatenate(([0], np.cumsum(nbs)[:-1]))
        n1, n2 = int(nas.sum()), int(nbs.sum())
        u2a = int((nas * (2 * cumb_before + nbs)).sum())
        tt = nas + nbs
        tie_term = int((tt * (tt - 1) * (tt + 1)).sum())
        return pa.table(
            {
                "n1": pa.array([n1], pa.int64()),
                "n2": pa.array([n2], pa.int64()),
                "u2_a": pa.array([u2a], pa.int64()),
                "u2_b": pa.array([2 * n1 * n2 - u2a], pa.int64()),
                "tie_term": pa.array([tie_term], pa.int64()),
                "auc": pa.array(
                    [float(u2a) / float(2 * n1 * n2)], pa.float64()
                ),
            }
        )

    return hist.repartition(1).map_batches(final, batch_format="pyarrow")


def wasserstein_1d(ds, type_col: str, values_fn, type_a: str, type_b: str):
    """Exact 1-D Wasserstein (earth mover's) distance between two
    integer samples -> ONE row (n1, n2, emd_num, emd_den, emd).

    W1 = integral |F1 - F2| dv over the pooled support.  With the
    sorted histogram the integrand is piecewise constant, so
    ``emd_num = sum_v |n2*C1(v) - n1*C2(v)| * (next_v - v)`` is an
    EXACT integer (cross-multiplied CDFs, the ks_two_sample trick) with
    ``emd_den = n1*n2``; ``emd`` is the single float division.  Same
    bounded-domain histogram shuffle as the KS/Mann-Whitney operators.
    """

    def partial_rows(t: pa.Table) -> pa.Table:
        ty = np.asarray(t.column(type_col).to_pylist(), dtype=object)
        v = np.asarray(values_fn(t), np.int64)
        ma, mb = ty == type_a, ty == type_b
        keep = ma | mb
        return pa.table(
            {
                "_v": pa.array(v[keep], pa.int64()),
                "_isa": pa.array(ma[keep].astype(np.int64), pa.int64()),
            }
        )

    hist = grouped_int_sums(
        ds.map_batches(partial_rows, batch_format="pyarrow"),
        ["_v"],
        lambda t: {
            "na": t.column("_isa").to_numpy(zero_copy_only=False),
            "nb": 1 - t.column("_isa").to_numpy(zero_copy_only=False),
        },
        count_col="_n",
    )

    def final(t: pa.Table) -> pa.Table:
        v = t.column("_v").to_numpy(zero_copy_only=False)
        na = t.column("na").to_numpy(zero_copy_only=False)
        nb = t.column("nb").to_numpy(zero_copy_only=False)
        order = np.argsort(v)
        vs, ca, cb = v[order], np.cumsum(na[order]), np.cumsum(nb[order])
        n1, n2 = int(ca[-1]), int(cb[-1])
        gap = np.abs(n2 * ca[:-1] - n1 * cb[:-1]) * np.diff(vs)
        emd_num = int(gap.sum())
        return pa.table(
            {
                "n1": pa.array([n1], pa.int64()),
                "n2": pa.array([n2], pa.int64()),
                "emd_num": pa.array([emd_num], pa.int64()),
                "emd_den": pa.array([n1 * n2], pa.int64()),
                "emd": pa.array(
                    [float(emd_num) / float(n1 * n2)], pa.float64()
                ),
            }
        )

    return hist.repartition(1).map_batches(final, batch_format="pyarrow")


def roc_points(ds, type_col: str, values_fn, type_pos: str,
               type_neg: str):
    """Full ROC curve -> Dataset[(v, tp, fp, fn, tn, tpr, fpr)], one
    row per distinct score with the predictor "positive iff value >=
    v".  Counts are exact suffix sums over the pooled histogram (the
    mann_whitney shuffle); tpr/fpr are the two per-row float
    divisions.  Rows ascend in v from (all positive) toward (none)."""

    def partial_rows(t: pa.Table) -> pa.Table:
        ty = np.asarray(t.column(type_col).to_pylist(), dtype=object)
        v = np.asarray(values_fn(t), np.int64)
        ma, mb = ty == type_pos, ty == type_neg
        keep = ma | mb
        return pa.table(
            {
                "_v": pa.array(v[keep], pa.int64()),
                "_isa": pa.array(ma[keep].astype(np.int64), pa.int64()),
            }
        )

    hist = grouped_int_sums(
        ds.map_batches(partial_rows, batch_format="pyarrow"),
        ["_v"],
        lambda t: {
            "na": t.column("_isa").to_numpy(zero_copy_only=False),
            "nb": 1 - t.column("_isa").to_numpy(zero_copy_only=False),
        },
        count_col="_n",
    )

    def final(t: pa.Table) -> pa.Table:
        v = t.column("_v").to_numpy(zero_copy_only=False)
        na = t.column("na").to_numpy(zero_copy_only=False)
        nb = t.column("nb").to_numpy(zero_copy_only=False)
        order = np.argsort(v)
        vs, nas, nbs = v[order], na[order], nb[order]
        n1, n2 = int(nas.sum()), int(nbs.sum())
        tp = n1 - np.concatenate(([0], np.cumsum(nas)[:-1]))  # count >= v
        fp = n2 - np.concatenate(([0], np.cumsum(nbs)[:-1]))
        return pa.table(
            {
                "v": pa.array(vs, pa.int64()),
                "tp": pa.array(tp, pa.int64()),
                "fp": pa.array(fp, pa.int64()),
                "fn": pa.array(n1 - tp, pa.int64()),
                "tn": pa.array(n2 - fp, pa.int64()),
                "tpr": pa.array(tp.astype(np.float64) / float(n1),
                                pa.float64()),
                "fpr": pa.array(fp.astype(np.float64) / float(n2),
                                pa.float64()),
            }
        )

    return hist.repartition(1).map_batches(final, batch_format="pyarrow")


def kruskal_wallis(ds, group_col: str, values_fn):
    """Kruskal-Wallis H across ALL groups -> Dataset[(group, n_i, r2,
    n, ties, h)] (one row per group; n/ties/h are the shared globals).

    Rank sums use the pooled doubled tie ranks (exact int64, the
    spearman trick): r2_i = 2 * R_i.  The tie-corrected statistic

        H = [12 * S / (N(N+1)) - 3(N+1)] / [1 - ties/(N^3 - N)]

    with S = sum_i R_i^2/n_i is evaluated as a FIXED-ORDER float
    composition: per-group terms (r2^2) / (4 n_i) are summed
    LEFT-ASSOCIATIVELY in ascending group-name order (the SQL replay
    pivots the groups and parenthesizes the same chain).  One shuffle
    of distinct (group, value) cells; the finish is histogram-sized."""
    hist = grouped_int_sums(
        ds.map_batches(
            lambda t, _g=group_col: pa.table(
                {
                    _g: t.column(_g),
                    "_v": pa.array(np.asarray(values_fn(t), np.int64),
                                   pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        [group_col, "_v"],
        lambda t: {},
        count_col="_c",
    )

    def final(t: pa.Table) -> pa.Table:
        g = np.asarray(t.column(group_col).to_pylist(), dtype=object)
        v = t.column("_v").to_numpy(zero_copy_only=False)
        c = t.column("_c").to_numpy(zero_copy_only=False)
        vv, vi = np.unique(v, return_inverse=True)
        pooled = np.zeros(len(vv), np.int64)
        np.add.at(pooled, vi, c)
        dx = _doubled_ranks(vv, pooled)[vi]
        groups = sorted(set(g))
        n = int(pooled.sum())
        ties = int((pooled * (pooled - 1) * (pooled + 1)).sum())
        n_i, r2 = {}, {}
        for gg in groups:
            m = g == gg
            n_i[gg] = int(c[m].sum())
            r2[gg] = int((c[m] * dx[m]).sum())
        s = 0.0
        for gg in groups:  # left-associative, ascending group name
            s = s + (float(r2[gg]) * float(r2[gg])) / float(4 * n_i[gg])
        h = (
            12.0 * s / (float(n) * float(n + 1)) - 3.0 * float(n + 1)
        ) / (1.0 - float(ties) / float(n ** 3 - n))
        return pa.table(
            {
                group_col: pa.array(groups, pa.string()),
                "n_i": pa.array([n_i[gg] for gg in groups], pa.int64()),
                "r2": pa.array([r2[gg] for gg in groups], pa.int64()),
                "n": pa.array([n] * len(groups), pa.int64()),
                "ties": pa.array([ties] * len(groups), pa.int64()),
                "h": pa.array([h] * len(groups), pa.float64()),
            }
        )

    return hist.repartition(1).map_batches(final, batch_format="pyarrow")
