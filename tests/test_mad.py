"""Grouped median absolute deviation vs a percentile_disc brute force."""

import math

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray.relational import grouped_mad


def _disc_median(vals):
    s = sorted(vals)
    return s[math.ceil(0.5 * len(s)) - 1]


def _brute(g, v):
    out = {}
    for grp in sorted(set(g)):
        vals = [v[i] for i in range(len(g)) if g[i] == grp]
        med = _disc_median(vals)
        mad = _disc_median([abs(x - med) for x in vals])
        out[grp] = (len(vals), med, mad)
    return out


@pytest.mark.parametrize("seed,n_blocks", [(0, 1), (1, 7)])
def test_grouped_mad_matches_brute(ray_session, seed, n_blocks):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    n = 1500
    g = [f"g{int(x)}" for x in rng.integers(0, 9, n)]
    v = rng.integers(-500, 500, n).astype(np.int64)
    ds = (
        rd.from_arrow(
            pa.table({"grp": pa.array(g, pa.string()),
                      "val": pa.array(v, pa.int64())})
        )
        .random_shuffle(seed=2)
        .repartition(n_blocks)
    )
    got = grouped_mad(
        ds, "grp", lambda t: t.column("val").to_numpy(zero_copy_only=False)
    ).to_pandas().sort_values("grp").reset_index(drop=True)
    want = _brute(g, v)
    assert list(got["grp"]) == sorted(want)
    for r in got.itertuples():
        assert (r.n, r.med, r.mad) == want[r.grp]


def test_even_count_uses_lower_disc_rank(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"grp": pa.array(["a"] * 4, pa.string()),
                  "val": pa.array([1, 2, 3, 10], pa.int64())})
    )
    got = grouped_mad(
        ds, "grp", lambda t: t.column("val").to_numpy(zero_copy_only=False)
    ).to_pandas()
    # ceil(0.5*4)=2 -> med=2; |d|=[1,0,1,8] sorted [0,1,1,8] -> mad=1
    assert got.loc[0, "med"] == 2 and got.loc[0, "mad"] == 1
