"""Two-sample KS statistic vs brute-force ECDF comparison."""

from fractions import Fraction

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray.relational import ks_two_sample


def _brute_d(a, b):
    vals = sorted(set(a) | set(b))
    n1, n2 = len(a), len(b)
    best, at = -1, None
    for v in vals:
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        dn = abs(n2 * ca - n1 * cb)
        if dn > best:
            best, at = dn, v
    return best, at, Fraction(best, n1 * n2)


@pytest.mark.parametrize("seed,n_blocks", [(0, 1), (2, 6)])
def test_ks_matches_brute(ray_session, seed, n_blocks):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    na, nb = 400, 300
    a = rng.integers(0, 60, na)          # overlapping but different
    b = rng.integers(10, 80, nb)         # supports force a real D
    ty = ["A"] * na + ["B"] * nb
    v = np.concatenate([a, b]).astype(np.int64)
    ds = (
        rd.from_arrow(
            pa.table({"t": pa.array(ty, pa.string()), "v": pa.array(v)})
        )
        .random_shuffle(seed=3)
        .repartition(n_blocks)
    )
    got = ks_two_sample(
        ds, "t", lambda t: t.column("v").to_numpy(zero_copy_only=False),
        "A", "B",
    ).to_pandas()
    d_num, at, frac = _brute_d(a.tolist(), b.tolist())
    assert len(got) == 1
    r = got.iloc[0]
    assert (r.n1, r.n2) == (na, nb)
    assert r.d_num == d_num and r.at_v == at
    assert r.d_den == na * nb
    assert r.d == float(d_num) / float(na * nb)
    assert Fraction(int(r.d_num), int(r.d_den)) == frac


def test_identical_samples_give_zero(ray_session):
    import ray.data as rd

    v = np.arange(50, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"t": pa.array(["A"] * 50 + ["B"] * 50, pa.string()),
                  "v": pa.array(np.concatenate([v, v]))})
    )
    got = ks_two_sample(
        ds, "t", lambda t: t.column("v").to_numpy(zero_copy_only=False),
        "A", "B",
    ).to_pandas()
    assert got.iloc[0].d_num == 0
