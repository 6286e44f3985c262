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
