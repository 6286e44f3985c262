"""skew_join == hash_join on skewed data; hot path actually engages."""

import numpy as np
import pyarrow as pa

from rasters_ray.relational.joins import hash_join, skew_join


def _skewed(ray_session=None):
    import ray.data as rd

    rng = np.random.default_rng(6)
    # 90% of left rows share ONE key; the rest spread over 500 keys
    n = 30_000
    keys = np.where(
        rng.random(n) < 0.9, 7, rng.integers(100, 600, n)
    ).astype(np.int64)
    left = rd.from_arrow(
        pa.table({"k": keys, "lv": np.arange(n, dtype=np.int64)})
    ).repartition(10)
    rkeys = np.r_[np.array([7]), np.arange(100, 600)].astype(np.int64)
    right = rd.from_arrow(
        pa.table({"k": rkeys, "rv": rkeys * 10})
    ).repartition(4)
    return left, right, keys


def test_skew_join_equals_hash_join(ray_session):
    left, right, keys = _skewed()
    a = (
        skew_join(left, right, on="k", hot_threshold=5_000)
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    b = (
        hash_join(left, right, on="k", how="inner")
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    assert len(a) == len(b) == (keys != 7).sum() + (keys == 7).sum()
    assert (a["k"].to_numpy() == b["k"].to_numpy()).all()
    assert (a["lv"].to_numpy() == b["lv"].to_numpy()).all()
    assert (a["rv"].to_numpy() == b["rv"].to_numpy()).all()


def test_skew_join_no_hot_keys_falls_back(ray_session):
    import ray.data as rd

    left = rd.from_arrow(
        pa.table({"k": np.arange(200, dtype=np.int64), "lv": np.ones(200, np.int64)})
    )
    right = rd.from_arrow(
        pa.table({"k": np.arange(200, dtype=np.int64), "rv": np.zeros(200, np.int64)})
    )
    out = skew_join(left, right, on="k", hot_threshold=10).to_pandas()
    assert len(out) == 200
