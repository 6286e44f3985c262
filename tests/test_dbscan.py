"""Grid-bucketed DBSCAN vs an in-core reference implementation."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from rasters_ray.stages.dbscan import dbscan_points, disk_offsets


def _reference(pid, xi, yi, eps2, min_pts):
    offs = disk_offsets(eps2)
    pos = {}
    for p, a, b in zip(pid, xi, yi):
        pos.setdefault((int(a), int(b)), []).append(int(p))
    cnt = {k: len(v) for k, v in pos.items()}

    def nbrs(k):
        return [(k[0] + dx, k[1] + dy) for dx, dy in offs
                if (k[0] + dx, k[1] + dy) in cnt]

    core = {k for k in cnt if sum(cnt[q] for q in nbrs(k)) >= min_pts}
    parent = {k: k for k in core}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for k in core:
        for q in nbrs(k):
            if q in core:
                ra, rb = find(k), find(q)
                if ra != rb:
                    parent[ra] = rb
    comp = {}
    for k in core:
        comp.setdefault(find(k), []).append(k)
    lbl = {}
    for ks in comp.values():
        m = min(p for k in ks for p in pos[k])
        for k in ks:
            lbl[k] = m
    status, cluster = {}, {}
    for k, plist in pos.items():
        if k in core:
            st, cl = "core", lbl[k]
        else:
            cand = [lbl[q] for q in nbrs(k) if q in core]
            st, cl = ("border", min(cand)) if cand else ("noise", -1)
        for p in plist:
            status[p], cluster[p] = st, cl
    return status, cluster


def test_dbscan_blobs_and_noise(ray_session):
    rng = np.random.default_rng(6)
    xi = np.concatenate([rng.integers(10, 20, 120),
                         rng.integers(50, 62, 120),
                         rng.integers(0, 150, 60)]).astype(np.int64)
    yi = np.concatenate([rng.integers(10, 20, 120),
                         rng.integers(40, 52, 120),
                         rng.integers(0, 150, 60)]).astype(np.int64)
    pid = np.arange(len(xi), dtype=np.int64)
    t = pa.table({"pid": pa.array(pid), "xi": pa.array(xi),
                  "yi": pa.array(yi)})
    out = (
        dbscan_points(rd.from_arrow(t), "pid", "xi", "yi", eps2=4, min_pts=5)
        .to_pandas()
        .set_index("pid")
    )
    ws, wc = _reference(pid, xi, yi, 4, 5)
    for p in pid:
        assert (out.loc[p, "status"], out.loc[p, "cluster"]) == (ws[p], wc[p])
    assert set(out["status"]) == {"core", "border", "noise"}


def test_dbscan_isolated_core_is_own_cluster(ray_session):
    # five stacked points: core with zero OTHER core positions in range
    t = pa.table(
        {
            "pid": pa.array([7, 8, 9, 10, 11], pa.int64()),
            "xi": pa.array([100] * 5, pa.int64()),
            "yi": pa.array([200] * 5, pa.int64()),
        }
    )
    out = dbscan_points(rd.from_arrow(t), "pid", "xi", "yi",
                        eps2=4, min_pts=5).to_pandas()
    assert (out["status"] == "core").all()
    assert (out["cluster"] == 7).all()


def test_disk_offsets_eps2_4():
    offs = {tuple(o) for o in disk_offsets(4)}
    assert len(offs) == 13
    assert (0, 0) in offs and (2, 0) in offs and (1, 1) in offs
    assert (2, 1) not in offs  # 5 > eps2
