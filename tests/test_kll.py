"""MRL quantile sketch: measured rank error vs exact order statistics."""

import numpy as np
import pyarrow as pa

from rasters_ray.relational.kll import MRLSketch, sketch_quantiles


def _rank_error(vals: np.ndarray, q: float, est: float) -> float:
    """|true rank of est - q*n| / n."""
    s = np.sort(vals)
    n = len(s)
    lo = np.searchsorted(s, est, side="left")
    hi = np.searchsorted(s, est, side="right")
    target = q * n
    if lo <= target <= hi:
        return 0.0
    return min(abs(lo - target), abs(hi - target)) / n


def test_sketch_local_rank_error():
    rng = np.random.default_rng(9)
    vals = rng.lognormal(2, 1.5, 200_000)
    s = MRLSketch(k=256)
    for chunk in np.array_split(vals, 40):
        s.add(chunk)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        assert _rank_error(vals, q, s.quantile(q)) < 0.01


def test_sketch_merge_is_order_independent():
    rng = np.random.default_rng(3)
    vals = rng.normal(size=50_000)
    chunks = np.array_split(vals, 16)
    a = MRLSketch(k=128)
    for c in chunks:
        a.add(c)
    b = MRLSketch(k=128)
    for c in reversed(chunks):
        sub = MRLSketch(k=128)
        sub.add(c)
        b.merge(sub)
    for q in (0.25, 0.5, 0.9):
        assert _rank_error(vals, q, a.quantile(q)) < 0.015
        assert _rank_error(vals, q, b.quantile(q)) < 0.015


def test_sketch_roundtrip_rows():
    rng = np.random.default_rng(1)
    vals = rng.uniform(0, 1, 30_000)
    s = MRLSketch(k=128)
    s.add(vals)
    s2 = MRLSketch.from_rows(s.to_rows(), k=128)
    for q in (0.3, 0.7):
        assert abs(s.quantile(q) - s2.quantile(q)) < 0.02


def test_distributed_sketch_quantiles(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    vals = rng.lognormal(3, 1, 120_000)
    ds = rd.from_arrow(pa.table({"x": vals})).repartition(13)
    out = sketch_quantiles(ds, "x", [0.25, 0.5, 0.75, 0.9, 0.99], k=256).to_pandas()
    for row in out.itertuples():
        assert _rank_error(vals, row.q, row.value) < 0.01, (row.q, row.value)
