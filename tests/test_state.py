"""Broadcastable spatial indexes: GridNNIndex vs brute force, STRtree vs
brute force."""

import numpy as np

from rasters_ray.state import GridNNIndex, STRtree


def test_gridnn_matches_brute_force():
    rng = np.random.default_rng(0)
    px = rng.uniform(-120, -119, 2500)
    py = rng.uniform(39, 40, 2500)
    idx = GridNNIndex(px, py)
    qx = rng.uniform(-120.2, -118.8, 400)
    qy = rng.uniform(38.8, 40.2, 400)
    got_idx, got_d = idx.query(qx, qy)
    d2 = (px[None, :] - qx[:, None]) ** 2 + (py[None, :] - qy[:, None]) ** 2
    want = np.argmin(d2, axis=1)
    want_d = np.sqrt(d2[np.arange(400), want])
    np.testing.assert_allclose(got_d, want_d, rtol=1e-12)
    # index may differ only on exact ties; distances must match
    same = got_idx == want
    ties = np.isclose(got_d, want_d)
    assert np.all(same | ties)


def test_gridnn_nan_queries():
    idx = GridNNIndex([0.0, 1.0], [0.0, 1.0])
    got_idx, got_d = idx.query([np.nan], [0.5])
    assert np.isinf(got_d[0])


def test_gridnn_single_point():
    idx = GridNNIndex([5.0], [7.0])
    i, d = idx.query([5.1, 100.0], [7.0, 100.0])
    assert i[0] == 0 and i[1] == 0
    np.testing.assert_allclose(d[0], 0.1, rtol=1e-9)


def test_gridnn_meshgrid_structure():
    # swath-shaped point set
    gx, gy = np.meshgrid(np.linspace(0, 1, 60), np.linspace(0, 1, 40))
    idx = GridNNIndex(gx.ravel(), gy.ravel())
    qx = np.array([0.5, 0.0, 1.0, 0.123])
    qy = np.array([0.5, 0.0, 1.0, 0.987])
    got, d = idx.query(qx, qy)
    px, py = gx.ravel(), gy.ravel()
    for i in range(4):
        d2 = (px - qx[i]) ** 2 + (py - qy[i]) ** 2
        assert np.isclose(d[i] ** 2, d2.min())


def _brute_pairs(boxes, qboxes):
    pairs = set()
    for qi, q in enumerate(qboxes):
        for bi, b in enumerate(boxes):
            if q[0] <= b[2] and b[0] <= q[2] and q[1] <= b[3] and b[1] <= q[3]:
                pairs.add((qi, bi))
    return pairs


def test_strtree_matches_brute_force():
    rng = np.random.default_rng(1)
    centers = rng.uniform(0, 100, (300, 2))
    sizes = rng.uniform(0.5, 5, (300, 2))
    boxes = np.column_stack(
        [centers - sizes / 2, centers + sizes / 2]
    )[:, [0, 1, 2, 3]]
    boxes = np.column_stack(
        [centers[:, 0] - sizes[:, 0], centers[:, 1] - sizes[:, 1],
         centers[:, 0] + sizes[:, 0], centers[:, 1] + sizes[:, 1]]
    )
    tree = STRtree(boxes)
    qc = rng.uniform(0, 100, (50, 2))
    qs = rng.uniform(0.5, 8, (50, 2))
    qboxes = np.column_stack([qc[:, 0] - qs[:, 0], qc[:, 1] - qs[:, 1],
                              qc[:, 0] + qs[:, 0], qc[:, 1] + qs[:, 1]])
    qi, bi = tree.query_boxes(qboxes)
    got = set(zip(qi.tolist(), bi.tolist()))
    assert got == _brute_pairs(boxes, qboxes)


def test_strtree_points():
    boxes = np.array([[0, 0, 1, 1], [2, 2, 3, 3], [0.5, 0.5, 2.5, 2.5]])
    tree = STRtree(boxes)
    qi, bi = tree.query_points([0.7, 2.2, 10.0], [0.7, 2.2, 10.0])
    got = set(zip(qi.tolist(), bi.tolist()))
    assert got == {(0, 0), (0, 2), (1, 1), (1, 2)}


def test_strtree_empty():
    tree = STRtree(np.empty((0, 4)))
    qi, bi = tree.query_points([1.0], [1.0])
    assert qi.size == 0


def test_strtree_large_random():
    rng = np.random.default_rng(3)
    n = 5000
    c = rng.uniform(0, 1000, (n, 2))
    s = rng.uniform(0.1, 2, (n, 2))
    boxes = np.column_stack([c[:, 0] - s[:, 0], c[:, 1] - s[:, 1], c[:, 0] + s[:, 0], c[:, 1] + s[:, 1]])
    tree = STRtree(boxes)
    qx = rng.uniform(0, 1000, 200)
    qy = rng.uniform(0, 1000, 200)
    qi, bi = tree.query_points(qx, qy)
    got = set(zip(qi.tolist(), bi.tolist()))
    want = set()
    for i in range(200):
        hit = np.nonzero(
            (boxes[:, 0] <= qx[i]) & (qx[i] <= boxes[:, 2]) & (boxes[:, 1] <= qy[i]) & (qy[i] <= boxes[:, 3])
        )[0]
        for b in hit:
            want.add((i, int(b)))
    assert got == want
