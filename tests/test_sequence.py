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


def test_lagged_pair_stats_matches_brute(ray_session):
    import ray.data as rd

    from rasters_ray.relational.sequence import lagged_pair_stats

    rng = np.random.default_rng(11)
    n = 2000
    ty = np.array([f"t{int(x)}" for x in rng.integers(0, 4, n)], dtype=object)
    ts = rng.integers(0, 100, n).astype(np.int64)  # duplicate ts -> tie path
    eid = np.arange(n, dtype=np.int64)
    v = rng.integers(-100, 100, n).astype(np.int64)
    ds = (
        rd.from_arrow(
            pa.table({"t": pa.array(ty.tolist(), pa.string()),
                      "ts": pa.array(ts), "eid": pa.array(eid),
                      "val": pa.array(v)})
        )
        .random_shuffle(seed=4)
        .repartition(7)
    )
    got = lagged_pair_stats(
        ds, "t", "ts", "eid",
        lambda t: t.column("val").to_numpy(zero_copy_only=False),
    ).to_pandas().set_index("t")
    for tt in sorted(set(ty.tolist())):
        idx = sorted(
            (i for i in range(n) if ty[i] == tt),
            key=lambda i: (ts[i], eid[i]),
        )
        xs = [int(v[a]) for a in idx[:-1]]
        ys = [int(v[b]) for b in idx[1:]]
        r = got.loc[tt]
        assert r.n_pairs == len(xs)
        assert r.sx == sum(xs) and r.sy == sum(ys)
        assert r.sxx == sum(a * a for a in xs)
        assert r.syy == sum(b * b for b in ys)
        assert r.sxy == sum(a * b for a, b in zip(xs, ys))
        np_ = len(xs)
        num = float(np_ * r.sxy - r.sx * r.sy)
        den = (np.sqrt(float(np_ * r.sxx - r.sx ** 2))
               * np.sqrt(float(np_ * r.syy - r.sy ** 2)))
        assert r.acf == num / den
