"""Grouped Gini coefficient vs the rank-sum definition, brute force."""

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray.relational import grouped_gini


def _brute(g, v):
    out = {}
    for grp in sorted(set(g)):
        vals = sorted(v[i] for i in range(len(g)) if g[i] == grp)
        n = len(vals)
        s1 = sum(vals)
        s2 = sum((i + 1) * x for i, x in enumerate(vals))
        out[grp] = (n, s1, 2 * s2 - (n + 1) * s1, n * s1)
    return out


@pytest.mark.parametrize("seed,n_blocks", [(0, 1), (3, 6)])
def test_gini_matches_brute(ray_session, seed, n_blocks):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    n = 1200
    g = [f"g{int(x)}" for x in rng.integers(0, 7, n)]
    v = rng.integers(1, 10000, n).astype(np.int64)
    # duplicates force the tie-invariance claim
    v[::5] = 777
    ds = (
        rd.from_arrow(
            pa.table({"grp": pa.array(g, pa.string()),
                      "val": pa.array(v, pa.int64())})
        )
        .random_shuffle(seed=1)
        .repartition(n_blocks)
    )
    got = grouped_gini(
        ds, "grp", lambda t: t.column("val").to_numpy(zero_copy_only=False)
    ).to_pandas().sort_values("grp").reset_index(drop=True)
    want = _brute(g, v)
    for r in got.itertuples():
        n_, s1, num, den = want[r.grp]
        assert (r.n, r.sum_v, r.gini_num, r.gini_den) == (n_, s1, num, den)
        assert r.gini == float(num) / float(den)


def test_equal_values_give_zero_gini(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"grp": pa.array(["a"] * 6, pa.string()),
                  "val": pa.array([42] * 6, pa.int64())})
    )
    got = grouped_gini(
        ds, "grp", lambda t: t.column("val").to_numpy(zero_copy_only=False)
    ).to_pandas()
    assert got.loc[0, "gini_num"] == 0 and got.loc[0, "gini"] == 0.0
