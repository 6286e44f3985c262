"""Sharded mutable dedup index: determinism + mid-ingest queries."""

import numpy as np
import pyarrow as pa

from rasters_ray.state.dedupindex import _shard_cls, build_first_seen_index


def _ds(keys, orders, n_blocks):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "oid": pa.array(np.asarray(orders, np.int64), pa.int64()),
            }
        )
    ).random_shuffle(seed=5).repartition(n_blocks)


def test_index_equals_groupby_min(ray_session):
    rng = np.random.default_rng(7)
    n = 3000
    keys = [f"k{int(i):04d}" for i in rng.integers(0, 400, n)]
    orders = rng.permutation(n)
    got = build_first_seen_index(_ds(keys, orders, 9), "key", "oid", n_shards=5)
    df = got.to_pandas().set_index("key")["first_id"]
    import pandas as pd

    expect = (
        pd.DataFrame({"key": keys, "oid": orders}).groupby("key")["oid"].min()
    )
    assert len(df) == len(expect)
    assert (df.sort_index() == expect.sort_index()).all()


def test_index_spill_bounds_memory_and_matches_groupby(ray_session):
    # far more distinct keys than the spill threshold: shard memory must
    # stay bounded (runs created, resident dict <= threshold) and the
    # merged result must still equal groupby-min exactly
    rng = np.random.default_rng(11)
    n = 4000
    keys = [f"k{int(i):05d}" for i in rng.integers(0, 2500, n)]
    orders = rng.permutation(n)
    got, stats = build_first_seen_index(
        _ds(keys, orders, 7), "key", "oid",
        n_shards=3, spill_threshold=64, return_stats=True,
    )
    assert sum(s["n_runs"] for s in stats) > 0  # spilling actually happened
    assert all(s["high_water"] <= 64 for s in stats)  # bounded resident keys
    import pandas as pd

    df = got.to_pandas().set_index("key")["first_id"]
    expect = (
        pd.DataFrame({"key": keys, "oid": orders}).groupby("key")["oid"].min()
    )
    assert len(df) == len(expect)
    assert (df.sort_index() == expect.sort_index()).all()


def test_shard_spill_contains_and_remerge(ray_session):
    # a key re-observed AFTER its run spilled must still answer contains()
    # and resolve dump() to the true min across dict + runs
    import ray

    cls = _shard_cls()
    shard = cls.remote(2, "/tmp/rr_dedupidx_test_shard")
    ray.get(shard.observe.remote(["a", "b"], [5, 7]))  # hits threshold -> spills
    st = ray.get(shard.stats.remote())
    assert st["n_runs"] == 1 and st["resident"] == 0
    assert ray.get(shard.contains.remote(["a", "b", "z"])) == [True, True, False]
    ray.get(shard.observe.remote(["a", "c"], [1, 9]))  # 'a' again, smaller order
    tab = ray.get(shard.dump.remote()).to_pandas().set_index("key")
    assert tab.loc["a", "first_id"] == 1
    assert tab.loc["b", "first_id"] == 7
    assert tab.loc["c", "first_id"] == 9
    ray.kill(shard)
    import shutil

    shutil.rmtree("/tmp/rr_dedupidx_test_shard", ignore_errors=True)


def test_shard_contains_mid_ingest(ray_session):
    cls = _shard_cls()
    import ray

    shard = cls.remote()
    ray.get(shard.observe.remote(["a", "b"], [3, 1]))
    assert ray.get(shard.contains.remote(["a", "c"])) == [True, False]
    # later smaller order wins
    ray.get(shard.observe.remote(["a"], [0]))
    tab = ray.get(shard.dump.remote()).to_pandas().set_index("key")
    assert tab.loc["a", "first_id"] == 0
    assert tab.loc["b", "first_id"] == 1


def test_shard_bloom_contains_many_runs(ray_session):
    """contains() across several spilled runs: exact answers through the
    bloom + cached-searchsorted path (no false positives/negatives)."""
    import ray

    shard = _shard_cls().remote(50, "/tmp/ddx_bloom_test")
    all_keys = [f"k{i:05d}" for i in range(400)]
    for s in range(0, 400, 100):  # 4 ingest waves -> multiple spills
        ray.get(shard.observe.remote(all_keys[s : s + 100], list(range(s, s + 100))))
    probe = all_keys[::7] + [f"MISS{i}" for i in range(200)]
    got = ray.get(shard.contains.remote(probe))
    want = [k in set(all_keys) for k in probe]
    assert got == want
    st = ray.get(shard.stats.remote())
    assert st["n_runs"] >= 2 and st["high_water"] <= 51
    ray.kill(shard)
