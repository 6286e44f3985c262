"""cusum_stats / runs_test / crosstab_chi2 vs brute force."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rasters_ray.relational.aggregates import crosstab_chi2
from rasters_ray.relational.sequence import cusum_stats, runs_test


@pytest.fixture(scope="module")
def series_ds(ray_session):
    rng = np.random.default_rng(5)
    n = 2000
    ty = rng.choice(["p", "q"], n)
    ts = rng.permutation(n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    v = rng.integers(0, 40, n).astype(np.int64)
    # inject a level shift into p's second half so the changepoint is real
    order_p = np.argsort(ts[ty == "p"])
    vp = v[ty == "p"]
    vp[order_p[len(order_p) // 2:]] += 25
    v[ty == "p"] = vp
    t = pa.table(
        {"t": ty, "ts": pa.array(ts), "id": pa.array(eid), "v": pa.array(v)}
    )
    return t, rd.from_arrow(t)


def test_cusum_matches_bruteforce(series_ds):
    t, ds = series_ds
    out = (
        cusum_stats(ds, "t", "ts", "id",
                    lambda b: b.column("v").to_numpy())
        .to_pandas()
        .set_index("t")
    )
    ty = np.asarray(t.column("t").to_pylist())
    ts = t.column("ts").to_numpy()
    v = t.column("v").to_numpy()
    for g in "pq":
        m = ty == g
        s = v[m][np.argsort(ts[m], kind="stable")]
        n = len(s)
        ck = np.cumsum(s)
        total = int(ck[-1])
        k = np.arange(1, n)
        d = np.abs(n * ck[:-1] - k * total)
        row = out.loc[g]
        assert row["d_max"] == int(d.max())
        assert row["k_star"] == int(k[np.argmax(d)])
        assert (row["n"], row["total"]) == (n, total)
    # the injected shift should put p's changepoint near the middle
    assert abs(out.loc["p", "k_star"] - out.loc["p", "n"] / 2) < out.loc["p", "n"] * 0.15


def test_runs_test_matches_bruteforce(series_ds):
    t, ds = series_ds
    out = (
        runs_test(ds, "t", "ts", "id", lambda b: b.column("v").to_numpy())
        .to_pandas()
        .set_index("t")
    )
    ty = np.asarray(t.column("t").to_pylist())
    ts = t.column("ts").to_numpy()
    v = t.column("v").to_numpy()
    for g in "pq":
        m = ty == g
        s = v[m][np.argsort(ts[m], kind="stable")]
        med = int(np.sort(s)[(len(s) + 1) // 2 - 1])
        sign = s[s != med] > med
        n1, n2 = int(sign.sum()), int((~sign).sum())
        runs = int(1 + (sign[1:] != sign[:-1]).sum())
        row = out.loc[g]
        assert (row["n1"], row["n2"], row["runs"]) == (n1, n2, runs)
        assert abs(row["e_runs"] - (1 + 2 * n1 * n2 / (n1 + n2))) < 1e-12


def test_chi2_matches_bruteforce(ray_session):
    rng = np.random.default_rng(9)
    n = 5000
    a = rng.choice(["x", "y", "z"], n)
    b = np.where(a == "x", rng.choice(["u", "w"], n, p=[0.8, 0.2]),
                 rng.choice(["u", "w"], n))
    t = pa.table({"a": a, "b": b})
    out = crosstab_chi2(rd.from_arrow(t), "a", "b").to_pandas()
    total = 0.0
    for _, row in out.iterrows():
        obs = int(((a == row["a"]) & (b == row["b"])).sum())
        rt = int((a == row["a"]).sum())
        ct = int((b == row["b"]).sum())
        assert row["obs"] == obs
        assert row["dev"] == obs * n - rt * ct
        exp = rt * ct / n
        assert abs(row["cell_chi2"] - (obs - exp) ** 2 / exp) < 1e-9
        total += row["cell_chi2"]
    # dependence injected for x -> statistic clearly significant (df=2)
    assert total > 50.0


def test_dtw_matches_bruteforce(ray_session):
    from rasters_ray.relational.sequence import dtw_pair

    rng = np.random.default_rng(21)
    n = 600
    ty = rng.choice(["a", "b", "zz"], n)
    ts = rng.permutation(n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    v = rng.integers(0, 100, n).astype(np.int64)
    t = pa.table({"t": ty, "ts": pa.array(ts), "id": pa.array(eid),
                  "v": pa.array(v)})
    K = 16
    out = (
        dtw_pair(rd.from_arrow(t), "t", "ts", "id",
                 lambda b: b.column("v").to_numpy(), "a", "b", k=K)
        .to_pandas()
        .iloc[0]
    )

    def head(g):
        m = ty == g
        return v[m][np.argsort(ts[m], kind="stable")][:K]

    a, b = head("a"), head("b")
    big = 1 << 60
    dp = np.full((len(a) + 1, len(b) + 1), big, dtype=np.int64)
    dp[0, 0] = 0
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            dp[i, j] = abs(a[i - 1] - b[j - 1]) + min(
                dp[i - 1, j], dp[i, j - 1], dp[i - 1, j - 1])
    assert (out["n1"], out["n2"]) == (len(a), len(b))
    assert out["dtw"] == dp[len(a), len(b)]


def test_dtw_identical_series_zero(ray_session):
    from rasters_ray.relational.sequence import dtw_pair

    n = 30
    v = np.arange(n, dtype=np.int64) % 7
    t = pa.table({
        "t": np.array(["a"] * n + ["b"] * n),
        "ts": pa.array(np.tile(np.arange(n, dtype=np.int64), 2)),
        "id": pa.array(np.arange(2 * n, dtype=np.int64)),
        "v": pa.array(np.tile(v, 2)),
    })
    out = dtw_pair(rd.from_arrow(t), "t", "ts", "id",
                   lambda b: b.column("v").to_numpy(), "a", "b",
                   k=20).to_pandas().iloc[0]
    assert out["dtw"] == 0


def test_cohen_kappa_exact(ray_session):
    from rasters_ray.relational.aggregates import cohen_kappa

    rng = np.random.default_rng(31)
    n = 3000
    a = rng.integers(1, 6, n).astype(np.int64)
    b = np.where(rng.random(n) < 0.8, a,
                 rng.integers(1, 6, n)).astype(np.int64)
    t = pa.table({"ra": pa.array(a), "rb": pa.array(b)})
    out = cohen_kappa(rd.from_arrow(t), "ra", "rb").to_pandas().iloc[0]
    po = (a == b).mean()
    pe = sum(((a == k).sum() / n) * ((b == k).sum() / n)
             for k in range(1, 6))
    want = (po - pe) / (1 - pe)
    assert abs(out["kappa"] - want) < 1e-12
    assert out["po_cnt"] == int((a == b).sum())
    assert 0.5 < out["kappa"] < 1.0  # 80% agreement >> chance


def test_cohen_kappa_perfect_and_chance(ray_session):
    from rasters_ray.relational.aggregates import cohen_kappa

    a = np.tile(np.arange(1, 5, dtype=np.int64), 25)
    t = pa.table({"ra": pa.array(a), "rb": pa.array(a)})
    out = cohen_kappa(rd.from_arrow(t), "ra", "rb").to_pandas().iloc[0]
    assert out["kappa"] == 1.0


def test_cramers_v_matches_bruteforce(ray_session):
    from rasters_ray.relational.aggregates import cramers_v

    rng = np.random.default_rng(41)
    n = 4000
    a = rng.choice(["p", "q", "r"], n)
    b = np.where(a == "p", rng.choice(["x", "y"], n, p=[0.75, 0.25]),
                 rng.choice(["x", "y"], n))
    t = pa.table({"a": a, "b": b})
    out = cramers_v(rd.from_arrow(t), "a", "b",
                    ["p", "q", "r"], ["x", "y"]).to_pandas().iloc[0]
    chi2 = 0.0
    for aa in ("p", "q", "r"):
        for bb in ("x", "y"):
            obs = int(((a == aa) & (b == bb)).sum())
            rt, ct = int((a == aa).sum()), int((b == bb).sum())
            exp = rt * ct / n
            chi2 += (obs - exp) ** 2 / exp
    v = np.sqrt(chi2 / (n * 1))
    assert abs(out["chi2"] - chi2) < 1e-8
    assert abs(out["v"] - v) < 1e-10
    assert 0.0 < out["v"] < 1.0


def test_cramers_v_empty_category_skipped(ray_session):
    from rasters_ray.relational.aggregates import cramers_v

    t = pa.table({"a": ["p", "p", "q", "q"], "b": ["x", "y", "x", "y"]})
    out = cramers_v(rd.from_arrow(t), "a", "b",
                    ["p", "q", "GHOST"], ["x", "y"]).to_pandas().iloc[0]
    assert out["chi2"] == 0.0  # perfectly independent; ghost row inert


def test_gk_lambda_exact(ray_session):
    from rasters_ray.relational.aggregates import gk_lambda

    rng = np.random.default_rng(51)
    n = 3000
    a = rng.choice(["p", "q", "r"], n)
    b = np.where(a == "p", rng.choice(["x", "y"], n, p=[0.9, 0.1]),
                 rng.choice(["x", "y", "z"], n))
    t = pa.table({"a": a, "b": b})
    out = gk_lambda(rd.from_arrow(t), "a", "b").to_pandas().iloc[0]
    srm = sum(max(((a == aa) & (b == bb)).sum() for bb in "xyz")
              for aa in "pqr")
    cm = max((b == bb).sum() for bb in "xyz")
    assert out["sum_row_max"] == srm and out["col_max"] == cm
    assert abs(out["lam"] - (srm - cm) / (n - cm)) < 1e-15
    assert 0.0 <= out["lam"] <= 1.0


def test_gk_lambda_perfect_prediction(ray_session):
    from rasters_ray.relational.aggregates import gk_lambda

    a = np.repeat(["p", "q"], 50)
    b = np.repeat(["x", "y"], 50)  # row determines column exactly
    t = pa.table({"a": a, "b": b})
    out = gk_lambda(rd.from_arrow(t), "a", "b").to_pandas().iloc[0]
    assert out["lam"] == 1.0
