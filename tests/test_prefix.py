"""Distributed prefix scans (relational/prefix.py) vs sequential truth.

Both scans must be independent of block layout: inputs arrive scattered
across many blocks in arbitrary order, the result must be bit-equal to a
single-pass sequential scan over the order column.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rasters_ray.relational.prefix import forward_fill_scan, prefix_sum_scan


def _scattered_ds(table: pa.Table, n_blocks: int):
    import ray.data as rd

    return rd.from_arrow(table).random_shuffle(seed=11).repartition(n_blocks)


def test_prefix_sum_matches_sequential(ray_session):
    rng = np.random.default_rng(7)
    n = 5000
    order = rng.permutation(n).astype(np.int64)
    vals = rng.integers(0, 50, n).astype(np.int64)
    ds = _scattered_ds(pa.table({"k": order, "v": vals}), 13)
    out = (
        prefix_sum_scan(ds, "k", "v", out_col="off", bucket_size=37)
        .to_pandas()
        .sort_values("k")
    )
    seq_vals = vals[np.argsort(order)]
    expect = np.r_[0, np.cumsum(seq_vals)[:-1]]
    assert (out["off"].to_numpy() == expect).all()
    assert (out["v"].to_numpy() == seq_vals).all()


def test_prefix_sum_sparse_keys(ray_session):
    # sparse order keys -> many buckets with no rows at all
    rng = np.random.default_rng(3)
    order = np.sort(rng.choice(20000, size=800, replace=False)).astype(np.int64)
    vals = rng.integers(1, 9, 800).astype(np.int64)
    ds = _scattered_ds(pa.table({"k": order, "v": vals}), 7)
    out = (
        prefix_sum_scan(ds, "k", "v", out_col="off", bucket_size=256)
        .to_pandas()
        .sort_values("k")
    )
    expect = np.r_[0, np.cumsum(vals)[:-1]]
    assert (out["off"].to_numpy() == expect).all()


def test_prefix_sum_duplicate_keys_layout_independent(ray_session):
    # duplicate order keys: every copy must get the SAME exclusive prefix
    # (sum over strictly smaller keys), for any block layout
    rng = np.random.default_rng(19)
    n = 4000
    order = rng.integers(0, 300, n).astype(np.int64)  # heavy duplication
    vals = rng.integers(1, 20, n).astype(np.int64)
    per_key = np.zeros(301, np.int64)
    np.add.at(per_key, order, vals)
    strict_below = np.r_[0, np.cumsum(per_key)[:-1]]  # exclusive by key
    for blocks in (3, 17):
        ds = _scattered_ds(pa.table({"k": order, "v": vals}), blocks)
        out = (
            prefix_sum_scan(ds, "k", "v", out_col="off", bucket_size=64)
            .to_pandas()
            .sort_values(["k", "v"])
        )
        expect = strict_below[out["k"].to_numpy()]
        assert (out["off"].to_numpy() == expect).all(), f"blocks={blocks}"


def test_prefix_sum_rejects_negative_order(ray_session):
    import ray.exceptions

    ds = _scattered_ds(
        pa.table(
            {"k": np.array([-1, 0, 1], np.int64), "v": np.ones(3, np.int64)}
        ),
        1,
    )
    with pytest.raises((ValueError, ray.exceptions.RayTaskError)):
        prefix_sum_scan(ds, "k", "v").to_pandas()


def test_forward_fill_matches_pandas_locf(ray_session):
    rng = np.random.default_rng(5)
    n = 3000
    # sparse keys: empty buckets AND observation-free buckets both occur
    order = np.sort(rng.choice(12000, size=n, replace=False)).astype(np.int64)
    vals = rng.normal(size=n)
    vals[rng.random(n) < 0.85] = np.nan  # sparse observations
    ds = _scattered_ds(pa.table({"k": order, "v": vals}), 9)
    out = (
        forward_fill_scan(
            ds, "k", "v", out_col="f", fill_start=-5.0, bucket_size=128
        )
        .to_pandas()
        .sort_values("k")
    )
    truth = pd.Series(vals).ffill().fillna(-5.0).to_numpy()
    got = out["f"].to_numpy()
    assert got.shape == truth.shape
    assert (got == truth).all()  # bit-exact: values are carried, not recomputed


def test_forward_fill_all_null_head_and_tail_runs(ray_session):
    order = np.arange(10, dtype=np.int64)
    vals = np.array(
        [np.nan, np.nan, 2.5, np.nan, np.nan, np.nan, 7.0, np.nan, np.nan, np.nan]
    )
    ds = _scattered_ds(pa.table({"k": order, "v": vals}), 3)
    out = (
        forward_fill_scan(ds, "k", "v", out_col="f", fill_start=0.0, bucket_size=2)
        .to_pandas()
        .sort_values("k")
    )
    expect = np.array([0.0, 0.0, 2.5, 2.5, 2.5, 2.5, 7.0, 7.0, 7.0, 7.0])
    assert (out["f"].to_numpy() == expect).all()
