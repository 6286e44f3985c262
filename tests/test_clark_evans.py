"""Clark-Evans NN index vs brute-force self-NN."""

import math

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray.stages.spatial_stats import clark_evans_stats, self_nn_min_d2


def _brute_nn(xi, yi, ids):
    out = []
    for i in range(len(xi)):
        best = None
        for j in range(len(xi)):
            if ids[j] == ids[i]:
                continue
            d2 = int((xi[i] - xi[j]) ** 2 + (yi[i] - yi[j]) ** 2)
            best = d2 if best is None else min(best, d2)
        out.append(best)
    return np.array(out, np.int64)


@pytest.mark.parametrize("seed", [0, 1])
def test_self_nn_matches_brute(seed):
    rng = np.random.default_rng(seed)
    n = 80
    xi = rng.integers(0, 40, n).astype(np.int64)  # collisions likely
    yi = rng.integers(0, 40, n).astype(np.int64)
    ids = [f"p{i}" for i in range(n)]
    got = self_nn_min_d2(xi, yi, ids, xi, yi, ids)
    np.testing.assert_array_equal(got, _brute_nn(xi, yi, ids))


def test_coincident_distinct_points_have_zero_d2():
    xi = np.array([5, 5, 9], np.int64)
    yi = np.array([5, 5, 9], np.int64)
    ids = ["a", "b", "c"]
    got = self_nn_min_d2(xi, yi, ids, xi, yi, ids)
    assert got[0] == 0 and got[1] == 0 and got[2] == 32


@pytest.mark.parametrize("n_blocks", [1, 4])
def test_distributed_summary(ray_session, n_blocks):
    import ray.data as rd

    rng = np.random.default_rng(5)
    n = 300
    x = rng.uniform(-10, 10, n)
    y = rng.uniform(-10, 10, n)
    ids = [f"p{i}" for i in range(n)]
    ref = pa.table({"point_id": pa.array(ids, pa.string()),
                    "x": pa.array(x, pa.float64()),
                    "y": pa.array(y, pa.float64())})
    ds = rd.from_arrow(ref).random_shuffle(seed=2).repartition(n_blocks)
    got = clark_evans_stats(ds, ref).to_pandas()
    assert len(got) == 1
    xi = np.rint(x * 1000).astype(np.int64)
    yi = np.rint(y * 1000).astype(np.int64)
    nn = _brute_nn(xi, yi, ids)
    f = np.floor(np.sqrt(nn.astype(np.float64)) * 1000.0).astype(np.int64)
    assert got.loc[0, "n"] == n
    assert got.loc[0, "sum_f"] == f.sum()
    assert got.loc[0, "min_nn_d2"] == nn.min()
    assert got.loc[0, "max_nn_d2"] == nn.max()
    area = (xi.max() - xi.min()) * (yi.max() - yi.min())
    want_r = ((float(f.sum()) / n) / 1000.0) / (0.5 * math.sqrt(area / n))
    assert got.loc[0, "r_index"] == want_r
