"""ANN search: brute-force exactness + LSH recall."""

import numpy as np
import pyarrow as pa
import pytest


def _emb_table(n=400, d=32, seed=5):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array([row.tolist() for row in m], pa.list_(pa.float32())),
        }
    ), m


def test_cosine_topk_matches_numpy(ray_session):
    import ray.data as rd

    from rasters_ray.ann import cosine_topk

    tbl, m = _emb_table()
    q = m[:3]
    got = cosine_topk(rd.from_arrow(tbl), q, k=5).to_pandas()
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = mn @ qn.T
    for qi in range(3):
        want = set(np.argsort(-sims[:, qi])[:5].tolist())
        have = set(got[got.query_idx == qi].vec_id.tolist())
        assert have == want
        # rank 1 is the query itself (cos=1)
        top1 = got[(got.query_idx == qi) & (got["rank"] == 1)].vec_id.iloc[0]
        assert top1 == qi


def test_lsh_topk_recall(ray_session):
    import ray.data as rd

    from rasters_ray.ann import lsh_topk, cosine_topk

    tbl, m = _emb_table(n=600)
    q = m[:4]
    exact = cosine_topk(rd.from_arrow(tbl), q, k=5).to_pandas()
    approx = lsh_topk(rd.from_arrow(tbl), q, k=5, n_planes=4).to_pandas()
    # the query vector itself always collides with its own bucket
    for qi in range(4):
        have = set(approx[approx.query_idx == qi].vec_id.tolist())
        assert qi in have
    # overall recall against exact top-5 should beat random chance by far
    inter = 0
    total = 0
    for qi in range(4):
        e = set(exact[exact.query_idx == qi].vec_id.tolist())
        a = set(approx[approx.query_idx == qi].vec_id.tolist())
        inter += len(e & a)
        total += len(e)
    assert inter / total > 0.2
