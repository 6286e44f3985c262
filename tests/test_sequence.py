"""Markov transition counts vs a brute-force pair scan."""

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray.relational.sequence import pair_counts_arrays, transition_counts


def _brute(u, ts, eid, ty):
    rows = sorted(range(len(u)), key=lambda i: (u[i], ts[i], eid[i]))
    out = {}
    for a, b in zip(rows[:-1], rows[1:]):
        if u[a] == u[b]:
            k = (ty[a], ty[b])
            out[k] = out.get(k, 0) + 1
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_pairs_match_brute(seed):
    rng = np.random.default_rng(seed)
    n = 400
    u = rng.integers(0, 15, n).astype(np.int64)
    ts = rng.integers(0, 50, n).astype(np.int64)  # duplicates force tie path
    eid = np.arange(n, dtype=np.int64)
    ty = np.array([f"t{int(x)}" for x in rng.integers(0, 5, n)], dtype=object)
    fr, to, cnt = pair_counts_arrays(u, ts, eid, ty)
    want = _brute(u, ts, eid, ty)
    got = {(fr[i], to[i]): int(cnt[i]) for i in range(len(fr))}
    assert got == want


def test_single_event_users_contribute_nothing():
    u = np.array([1, 2, 3], np.int64)
    fr, to, cnt = pair_counts_arrays(
        u, u, u, np.array(["a", "b", "c"], object)
    )
    assert len(fr) == 0


def test_distributed_matches_incore(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    n = 3000
    u = rng.integers(0, 40, n).astype(np.int64)
    ts = rng.integers(0, 10**6, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    ty = np.array([f"t{int(x)}" for x in rng.integers(0, 6, n)], dtype=object)
    ds = (
        rd.from_arrow(
            pa.table(
                {
                    "user_id": pa.array(u),
                    "ts": pa.array(ts),
                    "event_id": pa.array(eid),
                    "event_type": pa.array(ty.tolist(), pa.string()),
                }
            )
        )
        .random_shuffle(seed=5)
        .repartition(9)
    )
    got = transition_counts(ds, "user_id", "ts", "event_id", "event_type")
    gdf = got.to_pandas()
    want = _brute(u, ts, eid, ty)
    assert {
        (r.from_type, r.to_type): int(r.n) for r in gdf.itertuples()
    } == want
