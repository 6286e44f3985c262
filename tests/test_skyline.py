"""Distributed 2-D skyline vs brute-force NOT EXISTS truth."""

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray.relational.skyline import local_skyline_indices, skyline_2d


def _brute(x, y):
    keep = []
    for i in range(len(x)):
        dominated = False
        for j in range(len(x)):
            if (
                x[j] <= x[i]
                and y[j] >= y[i]
                and (x[j] < x[i] or y[j] > y[i])
            ):
                dominated = True
                break
        if not dominated:
            keep.append(i)
    return np.array(keep, np.int64)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_local_skyline_matches_brute(seed):
    rng = np.random.default_rng(seed)
    # small value domain forces many exact-x and exact-(x,y) ties
    x = rng.integers(0, 12, 200)
    y = rng.integers(0, 12, 200)
    got = local_skyline_indices(x, y)
    want = _brute(x, y)
    np.testing.assert_array_equal(got, want)


def test_exact_duplicates_all_survive():
    x = np.array([5, 5, 5, 1], np.int64)
    y = np.array([9, 9, 2, 1], np.int64)
    got = local_skyline_indices(x, y)
    # (5,9) twice: neither strictly dominates the other; (1,1) cheapest
    np.testing.assert_array_equal(got, [0, 1, 3])


def test_empty():
    assert len(local_skyline_indices(np.empty(0, np.int64), np.empty(0, np.int64))) == 0


@pytest.mark.parametrize("n_blocks", [1, 3, 17])
def test_distributed_matches_brute_across_layouts(ray_session, n_blocks):
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 3000
    x = rng.integers(0, 500, n)
    y = rng.integers(0, 500, n)
    ids = np.arange(n, dtype=np.int64)
    ds = (
        rd.from_arrow(
            pa.table(
                {
                    "id": pa.array(ids, pa.int64()),
                    "x": pa.array(x, pa.int64()),
                    "y": pa.array(y, pa.int64()),
                }
            )
        )
        .random_shuffle(seed=3)
        .repartition(n_blocks)
    )
    got = skyline_2d(ds, "id", "x", "y").to_pandas().sort_values("id")
    want = _brute(x, y)
    np.testing.assert_array_equal(got["id"].to_numpy(), want)
    np.testing.assert_array_equal(got["x"].to_numpy(), x[want])
    np.testing.assert_array_equal(got["y"].to_numpy(), y[want])
