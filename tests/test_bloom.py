"""Bloom filter: zero false negatives, plausible false-positive rate,
distributed build, prefilter selectivity, exact semi-join parity."""

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray.relational.bloom import (
    BloomFilter,
    bloom_filter_ds,
    bloom_semi_join,
    build_bloom,
)


def _ds(table: pa.Table, blocks: int = 4):
    import ray.data as rd

    return rd.from_arrow(table).repartition(blocks)


def test_no_false_negatives_and_fp_rate():
    keys = pa.chunked_array([pa.array(np.arange(0, 5000, 2, dtype=np.int64))])
    f = BloomFilter(np.zeros((1 << 16) // 64, np.uint64), 1 << 16, 4)
    f.add(keys)
    assert f.contains(keys).all()  # never a false negative
    absent = pa.chunked_array([pa.array(np.arange(1, 5000, 2, dtype=np.int64))])
    fp = f.contains(absent).mean()
    # m/n = 26 bits/key, k=4 -> theoretical fp ~ 0.24%; allow slack
    assert fp < 0.05
    assert 0.0 < f.fill_ratio() < 0.5


def test_m_bits_power_of_two():
    with pytest.raises(ValueError):
        BloomFilter(np.zeros(10, np.uint64), 1000, 4)


def test_build_bloom_distributed_matches_local(ray_session):
    keys = np.arange(0, 3000, 3, dtype=np.int64)
    t = pa.table({"k": pa.array(keys), "junk": pa.array(keys * 2)})
    built = build_bloom(_ds(t, 5), "k", m_bits=1 << 15, k=3)
    local = BloomFilter(np.zeros((1 << 15) // 64, np.uint64), 1 << 15, 3)
    local.add(pa.chunked_array([pa.array(keys)]))
    # OR of per-block partials == single-pass build, bit for bit
    assert (built.words == local.words).all()


def test_prefilter_drops_definite_misses(ray_session):
    right = pa.table({"k": pa.array(np.arange(100, dtype=np.int64))})
    left = pa.table({"k": pa.array(np.arange(0, 100_000, dtype=np.int64))})
    bloom = build_bloom(_ds(right, 2), "k", m_bits=1 << 16, k=4)
    kept = bloom_filter_ds(_ds(left, 4), "k", bloom).count()
    # all 100 true matches survive; almost every miss drops pre-shuffle
    assert 100 <= kept < 2000


def test_bloom_semi_join_exact(ray_session):
    rng = np.random.default_rng(5)
    lk = rng.integers(0, 500, 4000).astype(np.int64)
    left = pa.table(
        {"k": pa.array(lk), "v": pa.array(np.arange(4000, dtype=np.int64))}
    )
    rk = rng.choice(500, 40, replace=False).astype(np.int64)
    right = pa.table({"rk": pa.array(rk)})
    got = (
        bloom_semi_join(_ds(left, 4), "k", _ds(right, 2), "rk", m_bits=1 << 12)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    want_mask = np.isin(lk, rk)
    assert len(got) == int(want_mask.sum())
    want = (
        left.to_pandas()[want_mask].sort_values(["k", "v"]).reset_index(drop=True)
    )
    assert (got["k"] == want["k"]).all() and (got["v"] == want["v"]).all()
