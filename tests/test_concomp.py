"""Connected components (CCF rounds) vs a brute-force union-find."""

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray.relational.concomp import cluster_sizes, connected_components


def _ds(table: pa.Table, blocks: int = 3):
    import ray.data as rd

    return rd.from_arrow(table).repartition(blocks)


def _edges(u, v):
    return pa.table(
        {
            "u": pa.array(np.asarray(u, np.int64), pa.int64()),
            "v": pa.array(np.asarray(v, np.int64), pa.int64()),
        }
    )


def _uf_roots(u, v):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(u, v):
        if a != b:
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    # min-compress: map every seen node to its component minimum
    comp = {}
    for x in list(parent):
        comp.setdefault(find(x), []).append(x)
    out = {}
    for r, members in comp.items():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def test_cc_random_graph_matches_union_find(ray_session):
    rng = np.random.default_rng(9)
    u = rng.integers(0, 3000, 1200)
    v = rng.integers(0, 3000, 1200)
    got = connected_components(_ds(_edges(u, v), 4)).to_pandas()
    want = _uf_roots(u[u != v], v[u != v])
    assert len(got) == len(want)
    gm = dict(zip(got.node, got.root))
    assert gm == want


def test_cc_shapes(ray_session):
    # path 0-1-2-3-4, star 10<-{11,12,13}, clique {20,21,22}, dup+self edges
    u = [0, 1, 2, 3, 11, 12, 13, 20, 20, 21, 5, 0]
    v = [1, 2, 3, 4, 10, 10, 10, 21, 22, 22, 5, 1]
    got = connected_components(_ds(_edges(u, v), 2)).to_pandas()
    gm = dict(zip(got.node, got.root))
    assert gm == {
        0: 0, 1: 0, 2: 0, 3: 0, 4: 0,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_cc_empty_and_selfloops_only(ray_session):
    got = connected_components(_ds(_edges([7, 8], [7, 8]), 1)).to_pandas()
    assert len(got) == 0


def test_cluster_sizes(ray_session):
    u = [1, 2, 4, 5, 6]
    v = [2, 3, 5, 6, 4]
    cc = connected_components(_ds(_edges(u, v), 2))
    df = cluster_sizes(cc).to_pandas().sort_values("node").reset_index(drop=True)
    assert list(df.columns) == ["node", "root", "csize"]
    assert df[df.root == 1].csize.unique().tolist() == [3]
    assert df[df.root == 4].csize.unique().tolist() == [3]
    assert len(df) == 6


def test_cc_large_ids_no_packing(ray_session):
    big = np.int64(1) << 40
    got = connected_components(
        _ds(_edges([big, big + 1], [big + 1, big + 2]), 1)
    ).to_pandas()
    gm = dict(zip(got.node, got.root))
    assert gm == {big: big, big + 1: big, big + 2: big}
