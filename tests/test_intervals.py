"""Interval-union island stats vs a brute-force sweep."""

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray.relational.intervals import (
    island_stats_arrays,
    merged_interval_stats,
)


def _brute(u, s, e):
    out = {}
    for user in sorted(set(u.tolist())):
        ivs = sorted(
            [(s[i], e[i]) for i in range(len(u)) if u[i] == user]
        )
        islands = []
        for st, en in ivs:
            if islands and st <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], en)
            else:
                islands.append([st, en])
        lens = [b - a for a, b in islands]
        out[user] = (len(islands), sum(lens), max(lens))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_islands_match_brute(seed):
    rng = np.random.default_rng(seed)
    n = 500
    u = rng.integers(0, 20, n).astype(np.int64)
    s = rng.integers(0, 1000, n).astype(np.int64)
    d = rng.integers(1, 80, n).astype(np.int64)
    e = s + d
    users, cnt, cov, mx = island_stats_arrays(u, s, e)
    want = _brute(u, s, e)
    assert users.tolist() == sorted(want)
    for i, user in enumerate(users.tolist()):
        assert (cnt[i], cov[i], mx[i]) == want[user]


def test_touching_intervals_merge():
    u = np.zeros(2, np.int64)
    s = np.array([0, 10], np.int64)
    e = np.array([10, 20], np.int64)
    users, cnt, cov, mx = island_stats_arrays(u, s, e)
    assert cnt[0] == 1 and cov[0] == 20 and mx[0] == 20


def test_duplicate_intervals():
    u = np.zeros(3, np.int64)
    s = np.array([5, 5, 50], np.int64)
    e = np.array([9, 9, 60], np.int64)
    users, cnt, cov, mx = island_stats_arrays(u, s, e)
    assert cnt[0] == 2 and cov[0] == 14 and mx[0] == 10


@pytest.mark.parametrize("n_blocks", [1, 5])
def test_distributed_matches_incore(ray_session, n_blocks):
    import ray.data as rd

    rng = np.random.default_rng(9)
    n = 2000
    u = rng.integers(0, 64, n).astype(np.int64)
    s = rng.integers(10**12, 10**12 + 10**7, n).astype(np.int64)
    e = s + rng.integers(1, 10**5, n).astype(np.int64)
    ds = (
        rd.from_arrow(
            pa.table(
                {
                    "user_id": pa.array(u, pa.int64()),
                    "s": pa.array(s, pa.int64()),
                    "e": pa.array(e, pa.int64()),
                }
            )
        )
        .random_shuffle(seed=1)
        .repartition(n_blocks)
    )
    got = (
        merged_interval_stats(ds, "user_id", "s", "e")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    users, cnt, cov, mx = island_stats_arrays(u, s, e)
    np.testing.assert_array_equal(got["user_id"], users)
    np.testing.assert_array_equal(got["n_islands"], cnt)
    np.testing.assert_array_equal(got["covered_us"], cov)
    np.testing.assert_array_equal(got["max_island_us"], mx)
