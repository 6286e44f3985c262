"""global_ntile vs the SQL NTILE size rule, brute force."""

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray.relational.rangepart import global_ntile


def _brute_ntile(vals, keys, k):
    order = sorted(range(len(vals)), key=lambda i: (vals[i], keys[i]))
    n = len(vals)
    q, rem = divmod(n, k)
    tiles = {}
    r = 0
    for tile in range(1, k + 1):
        size = q + 1 if tile <= rem else q
        for _ in range(size):
            if r < n:
                tiles[order[r]] = tile
                r += 1
    return tiles


@pytest.mark.parametrize("seed,n,k,n_blocks", [(0, 1003, 4, 5), (1, 37, 8, 2)])
def test_ntile_matches_brute(ray_session, seed, n, k, n_blocks):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    keys = np.arange(n, dtype=np.int64)
    vals = rng.integers(-50, 50, n).astype(np.int64)  # many ties
    ds = (
        rd.from_arrow(
            pa.table({"key": pa.array(keys), "raw": pa.array(vals)})
        )
        .random_shuffle(seed=7)
        .repartition(n_blocks)
    )
    got = global_ntile(
        ds, "key", lambda t: t.column("raw").to_numpy(zero_copy_only=False), k
    ).to_pandas()
    want = _brute_ntile(vals.tolist(), keys.tolist(), k)
    assert len(got) == n
    for r in got.itertuples():
        assert want[int(r.key)] == r.tile, (r.key, r.tile)
        assert vals[int(r.key)] == r.value


def test_ntile_sizes(ray_session):
    import ray.data as rd

    n, k = 10, 4  # sizes must be 3,3,2,2
    ds = rd.from_arrow(
        pa.table({"key": pa.array(np.arange(n, dtype=np.int64)),
                  "raw": pa.array(np.arange(n, dtype=np.int64))})
    )
    got = global_ntile(
        ds, "key", lambda t: t.column("raw").to_numpy(zero_copy_only=False), k
    ).to_pandas()
    sizes = got.groupby("tile").size().to_dict()
    assert sizes == {1: 3, 2: 3, 3: 2, 4: 2}
