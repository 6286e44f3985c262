"""Exact and HLL distinct counting: exact path vs numpy, sketch error
bound, merge associativity, partition invariance."""

import numpy as np
import pyarrow as pa

from rasters_ray.relational import (
    approx_distinct,
    distinct_count,
    hll_count,
    hll_register_table,
)


def _ds(table: pa.Table, blocks: int = 4):
    import ray.data as rd

    return rd.from_arrow(table).repartition(blocks)


def _events(n=4000, n_users=333, seed=3):
    rng = np.random.default_rng(seed)
    types = np.array(["click", "view", "error"], dtype=object)
    return pa.table(
        {
            "event_type": pa.array(types[rng.integers(0, 3, n)], pa.string()),
            "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
        }
    )


def _exact(t):
    import pandas as pd

    df = t.to_pandas()
    return df.groupby("event_type")["user_id"].nunique().to_dict()


def test_distinct_count_exact(ray_session):
    t = _events()
    exp = _exact(t)
    for blocks in (2, 9):  # partition-invariant
        got = distinct_count(_ds(t, blocks), "event_type", "user_id").to_pandas()
        got_d = dict(zip(got["event_type"], got["n_distinct"]))
        assert got_d == exp


def test_approx_distinct_error_bound(ray_session):
    t = _events(n=20000, n_users=5000)
    exp = _exact(t)
    got = approx_distinct(_ds(t, 5), "event_type", "user_id").to_pandas()
    for _, row in got.iterrows():
        true = exp[row["event_type"]]
        assert abs(row["n_approx"] - true) / true < 0.05


def test_hll_merge_is_order_independent():
    vals = [f"u{i}" for i in range(3000)]
    a = hll_register_table(vals[:2000])
    b = hll_register_table(vals[1500:])
    ab = hll_count(pa.concat_tables([a, b]))
    ba = hll_count(pa.concat_tables([b, a]))
    whole = hll_count(hll_register_table(vals))
    assert ab == ba == whole  # register-max merge is exact, not approximate
    assert abs(whole - 3000) / 3000 < 0.05
