"""Weighted systematic sampling vs sequential truth."""

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray.relational.wsample import weighted_systematic_sample


def _truth(order, weights_cents, k):
    idx = np.argsort(order)
    w = weights_cents[idx]
    c1 = np.cumsum(w)
    c0 = c1 - w
    W = int(c1[-1])
    pts = ((2 * np.arange(k, dtype=np.int64) + 1) * W) // (2 * k)
    hits = np.searchsorted(pts, c1, side="left") - np.searchsorted(
        pts, c0, side="left"
    )
    return {int(order[idx][i]): int(h) for i, h in enumerate(hits) if h > 0}


def test_weighted_sample_matches_sequential(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(12)
    n, k = 4000, 25
    order = rng.permutation(n).astype(np.int64)
    price = np.round(rng.lognormal(4, 1, n) * 100) / 100
    ds = rd.from_arrow(pa.table({"id": order, "p": price})).repartition(8)
    got = weighted_systematic_sample(ds, "id", "p", k=k, bucket_size=256).to_pandas()
    cents = np.floor(price * 100).astype(np.int64)
    expect = _truth(order, cents, k)
    assert {int(r.id): int(r.n_hits) for r in got.itertuples()} == expect
    assert got["n_hits"].sum() == k


def test_weighted_sample_heavy_row_multiplicity(ray_session):
    import ray.data as rd

    # one row holds ~60% of the mass -> must receive multiple hits
    order = np.arange(50, dtype=np.int64)
    price = np.ones(50)
    price[7] = 75.0
    ds = rd.from_arrow(pa.table({"id": order, "p": price})).repartition(4)
    got = weighted_systematic_sample(ds, "id", "p", k=10, bucket_size=8).to_pandas()
    hits = dict(zip(got["id"], got["n_hits"]))
    assert hits[7] >= 5
    assert got["n_hits"].sum() == 10


def test_weighted_sample_rejects_nonpositive_total(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"id": np.arange(3, dtype=np.int64), "p": np.zeros(3)})
    )
    with pytest.raises(ValueError):
        weighted_systematic_sample(ds, "id", "p", k=4)


def test_weighted_sample_proportionality_bound(ray_session):
    """Systematic sampling invariant: every row's hit count is within 1
    of its proportional share k*w/W (zero-variance stride property)."""
    import ray.data as rd

    rng = np.random.default_rng(21)
    n, k = 1500, 40
    order = np.arange(n, dtype=np.int64)
    price = np.round(rng.lognormal(3, 1.2, n) * 100) / 100
    ds = rd.from_arrow(pa.table({"id": order, "p": price})).repartition(6)
    got = weighted_systematic_sample(ds, "id", "p", k=k, bucket_size=128).to_pandas()
    cents = np.floor(price * 100).astype(np.int64)
    W = cents.sum()
    hits = np.zeros(n, np.int64)
    hits[got["id"].to_numpy()] = got["n_hits"].to_numpy()
    share = k * cents / W
    assert (np.abs(hits - share) <= 1.0).all()
    assert hits.sum() == k
