"""Range-partition + winsorized stats vs sequential numpy truth."""

import numpy as np
import pyarrow as pa

from rasters_ray.relational.rangepart import range_partition_stats, winsorized_stats


def _disc_quantiles(vals: np.ndarray, qs):
    """percentile_disc: element at 1-based rank ceil(q*n)."""
    s = np.sort(vals)
    n = len(s)
    return np.array([s[max(1, int(np.ceil(q * n))) - 1] for q in qs])


def test_range_partition_matches_sequential(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(2)
    vals = np.round(rng.lognormal(3.0, 1.0, 20000) * 100) / 100
    ds = rd.from_arrow(pa.table({"x": vals})).repartition(11)
    got = (
        range_partition_stats(ds, "x", n_buckets=8)
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    cuts = _disc_quantiles(vals, [i / 8 for i in range(1, 8)])
    bucket = np.searchsorted(np.sort(cuts), vals, side="left")
    assert got["n"].sum() == len(vals)
    for b in range(8):
        m = bucket == b
        row = got[got["bucket"] == b].iloc[0]
        assert row["n"] == m.sum()
        assert row["sum_cents"] == np.floor(vals[m] * 100).astype(np.int64).sum()
        assert row["vmin"] == vals[m].min()
        assert row["vmax"] == vals[m].max()
    # equal-height: each bucket within one tie-run of n/8
    assert got["n"].max() - got["n"].min() <= len(vals) // 8


def test_winsorized_stats_matches_sequential(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(6)
    n = 8000
    vals = np.round(rng.normal(50, 40, n) * 100) / 100
    groups = np.array(["g%d" % (i % 3) for i in range(n)])
    ds = rd.from_arrow(pa.table({"g": groups, "v": vals})).repartition(9)
    got = (
        winsorized_stats(ds, "v", "g", 0.05, 0.95)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    lo, hi = _disc_quantiles(vals, [0.05, 0.95])
    clipped = np.clip(vals, lo, hi)
    for gname in ("g0", "g1", "g2"):
        m = groups == gname
        row = got[got["g"] == gname].iloc[0]
        assert row["n"] == m.sum()
        assert row["n_lo"] == (vals[m] < lo).sum()
        assert row["n_hi"] == (vals[m] > hi).sum()
        assert (
            row["sum_clipped_cents"]
            == np.floor(clipped[m] * 100).astype(np.int64).sum()
        )
