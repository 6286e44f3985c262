"""graph.py: triangle counts and integer PageRank vs brute force."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rasters_ray.relational.graph import (
    dedup_edges,
    edge_jaccard,
    pagerank,
    triangle_counts,
)


@pytest.fixture(scope="module")
def edges_raw(ray_session):
    rng = np.random.default_rng(2)
    m = 1500
    u = rng.integers(0, 40, m).astype(np.int64)
    v = rng.integers(0, 40, m).astype(np.int64)
    t = pa.table({"u": pa.array(u), "v": pa.array(v)})
    return u, v, rd.from_arrow(t)


def test_triangle_counts(edges_raw):
    u, v, ds = edges_raw
    E = set((min(a, b), max(a, b)) for a, b in zip(u, v) if a != b)
    adj = {}
    for a, b in E:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for a, b in E:
        for c in adj[a] & adj[b]:
            if c > b:
                for x in (a, b, c):
                    want[x] = want.get(x, 0) + 1
    got = (
        triangle_counts(dedup_edges(ds, "u", "v", undirected=True))
        .to_pandas()
        .set_index("node")["n_tri"]
        .to_dict()
    )
    assert got == want


def test_pagerank_bit_exact(edges_raw):
    u, v, ds = edges_raw
    De = set((int(a), int(b)) for a, b in zip(u, v) if a != b)
    nodes = sorted({x for e in De for x in e})
    outd = {}
    for a, b in De:
        outd[a] = outd.get(a, 0) + 1
    SCALE = 10**12
    BASE = 15 * SCALE // 100
    r = {x: SCALE for x in nodes}
    for _ in range(5):
        nr = {x: BASE for x in nodes}
        for a, b in De:
            nr[b] += (85 * r[a]) // (100 * outd[a])
        r = nr
    out = (
        pagerank(dedup_edges(ds, "u", "v", undirected=False), iters=5)
        .to_pandas()
        .set_index("node")
    )
    for x in nodes:
        assert out.loc[x, "r"] == r[x]
        assert out.loc[x, "outdeg"] == outd.get(x, 0)
    # rank mass: every node holds at least the restart base
    assert (out["r"] >= BASE).all()


def test_dedup_edges_orients_and_drops_loops(ray_session):
    t = pa.table(
        {
            "u": pa.array([3, 5, 5, 7, 7], pa.int64()),
            "v": pa.array([5, 3, 5, 9, 9], pa.int64()),
        }
    )
    und = dedup_edges(rd.from_arrow(t), "u", "v", undirected=True).to_pandas()
    assert sorted(map(tuple, und.values.tolist())) == [(3, 5), (7, 9)]
    dire = dedup_edges(rd.from_arrow(t), "u", "v", undirected=False).to_pandas()
    assert sorted(map(tuple, dire.values.tolist())) == [(3, 5), (5, 3), (7, 9)]


def test_edge_jaccard(edges_raw):
    u, v, ds = edges_raw
    out = (
        edge_jaccard(dedup_edges(ds, "u", "v", undirected=True))
        .to_pandas()
    )
    E = set((min(a, b), max(a, b)) for a, b in zip(u, v) if a != b)
    adj = {}
    for a, b in E:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assert len(out) == len(E)
    for r in out.itertuples():
        common = len(adj[r.a] & adj[r.b])
        assert r.common == common
        assert r.deg_a == len(adj[r.a]) and r.deg_b == len(adj[r.b])
        union = len(adj[r.a] | adj[r.b])
        assert r.deg_a + r.deg_b - common == union
        assert abs(r.jaccard - common / union) < 1e-15


def test_trigram_counts(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rasters_ray.relational.sequence import trigram_counts

    rng = np.random.default_rng(13)
    n = 900
    uid = rng.integers(0, 25, n).astype(np.int64)
    ts = rng.permutation(n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    ty = rng.choice(["x", "y", "z"], n)
    t = pa.table({"u": pa.array(uid), "ts": pa.array(ts),
                  "id": pa.array(eid), "ty": ty})
    out = trigram_counts(rd.from_arrow(t), "u", "ts", "id", "ty").to_pandas()
    got = {(r.t1, r.t2, r.t3): r.n for r in out.itertuples()}
    want = {}
    for g in np.unique(uid):
        m = uid == g
        seq = ty[m][np.argsort(ts[m], kind="stable")]
        for i in range(len(seq) - 2):
            k = (seq[i], seq[i + 1], seq[i + 2])
            want[k] = want.get(k, 0) + 1
    assert got == want
