"""rankstats: Spearman / Kendall tau-b / Mann-Whitney vs brute force."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rasters_ray.relational.rankstats import (
    kendall_tau_grouped,
    mann_whitney,
    spearman_grouped,
)


def _avg_ranks(v: np.ndarray) -> np.ndarray:
    order = np.argsort(v, kind="stable")
    r = np.empty(len(v), float)
    sv = v[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        r[order[i:j]] = (i + j + 1) / 2.0
        i = j
    return r


@pytest.fixture(scope="module")
def xy_ds(ray_session):
    rng = np.random.default_rng(11)
    n = 3000
    g = rng.choice(["A", "B"], n)
    x = rng.integers(0, 12, n).astype(np.int64)
    y = (2 * x + rng.integers(0, 9, n)).astype(np.int64)
    t = pa.table({"g": g, "x": pa.array(x), "y": pa.array(y)})
    return t, rd.from_arrow(t)


def test_spearman_matches_bruteforce(xy_ds):
    t, ds = xy_ds
    out = spearman_grouped(ds, "g", lambda b: (b.column("x").to_numpy(), b.column("y").to_numpy())).to_pandas().set_index("g")
    g = np.asarray(t.column("g").to_pylist())
    x = t.column("x").to_numpy()
    y = t.column("y").to_numpy()
    for gg in "AB":
        m = g == gg
        rho = np.corrcoef(_avg_ranks(x[m]), _avg_ranks(y[m]))[0, 1]
        assert abs(rho - out.loc[gg, "rho"]) < 1e-12
        assert out.loc[gg, "n"] == int(m.sum())


def test_kendall_matches_bruteforce(xy_ds):
    t, ds = xy_ds
    out = kendall_tau_grouped(ds, "g", lambda b: (b.column("x").to_numpy(), b.column("y").to_numpy())).to_pandas().set_index("g")
    g = np.asarray(t.column("g").to_pylist())
    x = t.column("x").to_numpy()
    y = t.column("y").to_numpy()
    for gg in "AB":
        m = g == gg
        xx, yy = x[m], y[m]
        dx = np.sign(xx[:, None] - xx[None, :])
        dy = np.sign(yy[:, None] - yy[None, :])
        iu = np.triu_indices(len(xx), 1)
        s = dx[iu] * dy[iu]
        conc, disc = int((s > 0).sum()), int((s < 0).sum())
        row = out.loc[gg]
        assert (conc, disc) == (row["conc"], row["disc"])
        n0 = len(xx) * (len(xx) - 1) // 2
        tau = (conc - disc) / (
            np.sqrt(float(n0 - row["tx"])) * np.sqrt(float(n0 - row["ty"]))
        )
        assert abs(tau - row["tau"]) < 1e-12


def test_spearman_perfect_monotone(ray_session):
    # strictly increasing y = f(x), no ties -> rho exactly 1
    x = np.arange(50, dtype=np.int64)
    t = pa.table({"g": ["Z"] * 50, "x": pa.array(x), "y": pa.array(x * 7 + 1)})
    out = spearman_grouped(rd.from_arrow(t), "g", lambda b: (b.column("x").to_numpy(), b.column("y").to_numpy())).to_pandas()
    assert abs(out["rho"][0] - 1.0) < 1e-12  # sqrt(v)*sqrt(v) rounding


def test_mann_whitney_exact(ray_session):
    rng = np.random.default_rng(3)
    n = 2000
    ty = rng.choice(["a", "b", "other"], n)
    v = np.where(ty == "a", rng.integers(5, 25, n), rng.integers(0, 20, n))
    v = v.astype(np.int64)
    t = pa.table({"t": ty, "v": pa.array(v)})
    out = (
        mann_whitney(rd.from_arrow(t), "t", lambda b: b.column("v").to_numpy(),
                     "a", "b")
        .to_pandas()
        .iloc[0]
    )
    va, vb = v[ty == "a"], v[ty == "b"]
    u2 = int(2 * (va[:, None] > vb[None, :]).sum()
             + (va[:, None] == vb[None, :]).sum())
    assert out["u2_a"] == u2
    assert out["u2_b"] == 2 * len(va) * len(vb) - u2
    assert abs(out["auc"] - u2 / (2 * len(va) * len(vb))) < 1e-15
    tt = np.bincount(np.concatenate([va, vb]))
    tt = tt[tt > 0].astype(np.int64)
    assert out["tie_term"] == int((tt * (tt - 1) * (tt + 1)).sum())


def test_wasserstein_matches_scipy_style_bruteforce(ray_session):
    from rasters_ray.relational.rankstats import wasserstein_1d

    rng = np.random.default_rng(17)
    n = 1500
    ty = rng.choice(["a", "b", "x"], n)
    v = np.where(ty == "a", rng.integers(10, 60, n),
                 rng.integers(0, 50, n)).astype(np.int64)
    t = pa.table({"t": ty, "v": pa.array(v)})
    out = (
        wasserstein_1d(rd.from_arrow(t), "t",
                       lambda b: b.column("v").to_numpy(), "a", "b")
        .to_pandas()
        .iloc[0]
    )
    va = np.sort(v[ty == "a"]).astype(float)
    vb = np.sort(v[ty == "b"]).astype(float)
    # brute W1 via quantile-function integral on a common grid
    grid = np.linspace(0, 1, 200001, endpoint=False)[1:]
    qa = np.quantile(va, grid, method="inverted_cdf")
    qb = np.quantile(vb, grid, method="inverted_cdf")
    approx = np.abs(qa - qb).mean()
    assert abs(out["emd"] - approx) < 5e-3  # grid-resolution tolerance
    # exactness invariants
    assert out["emd_den"] == (ty == "a").sum() * (ty == "b").sum()
    assert out["emd"] == out["emd_num"] / out["emd_den"]


def test_wasserstein_identical_samples_zero(ray_session):
    from rasters_ray.relational.rankstats import wasserstein_1d

    v = np.tile(np.arange(20, dtype=np.int64), 2)
    ty = np.array(["a"] * 20 + ["b"] * 20)
    t = pa.table({"t": ty, "v": pa.array(v)})
    out = wasserstein_1d(rd.from_arrow(t), "t",
                         lambda b: b.column("v").to_numpy(),
                         "a", "b").to_pandas().iloc[0]
    assert out["emd_num"] == 0 and out["emd"] == 0.0


def test_kruskal_wallis_matches_scipy_formula(ray_session):
    from rasters_ray.relational.rankstats import kruskal_wallis

    rng = np.random.default_rng(23)
    n = 2400
    g = rng.choice(["a", "b", "c"], n)
    v = (rng.integers(0, 50, n)
         + np.where(g == "a", 6, 0)).astype(np.int64)
    t = pa.table({"g": g, "v": pa.array(v)})
    out = kruskal_wallis(rd.from_arrow(t), "g",
                         lambda b: b.column("v").to_numpy()).to_pandas()
    # reference: textbook tie-corrected H over average ranks
    order = np.argsort(v, kind="stable")
    ranks = np.empty(n, float)
    sv = v[order]
    i = 0
    while i < n:
        j = i
        while j < n and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    s = sum(ranks[g == gg].sum() ** 2 / (g == gg).sum() for gg in "abc")
    _, tcnt = np.unique(v, return_counts=True)
    ties = float((tcnt ** 3 - tcnt).sum())
    want = (12.0 * s / (n * (n + 1)) - 3 * (n + 1)) / (1 - ties / (n ** 3 - n))
    assert abs(out["h"][0] - want) < 1e-9
    assert out["h"][0] > 30.0  # the +6 shift is detectable
    # rank-sum identity: sum of doubled rank sums = 2 * N(N+1)/2
    assert out["r2"].sum() == n * (n + 1)


def test_kruskal_no_difference_small_h(ray_session):
    from rasters_ray.relational.rankstats import kruskal_wallis

    v = np.tile(np.arange(60, dtype=np.int64), 3)
    g = np.repeat(["a", "b", "c"], 60)
    t = pa.table({"g": g, "v": pa.array(v)})
    out = kruskal_wallis(rd.from_arrow(t), "g",
                         lambda b: b.column("v").to_numpy()).to_pandas()
    assert abs(out["h"][0]) < 1e-9  # identical distributions
