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


def test_lsh_multiprobe_recall_at_10(ray_session):
    """VERDICT r1 #10: measured recall@10 vs exact on the embeddings
    fixture; multiprobe must push it >= 0.9."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from rasters_ray.ann import cosine_topk, lsh_topk, recall_at_k

    emb = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    id_col = "vec_id" if "vec_id" in emb.column_names else emb.column_names[0]
    col = [c for c in emb.column_names if c != id_col][0]
    first = emb.column(col)[0].as_py()
    d = len(first)
    qm = np.asarray(emb.column(col).to_pylist()[:8], dtype=np.float32)
    ds = rd.from_arrow(emb)
    exact = cosine_topk(ds, qm, k=10, id_col=id_col, col=col)
    approx = lsh_topk(
        rd.from_arrow(emb), qm, k=10, dim=d, n_planes=8, id_col=id_col, col=col, multiprobe=2
    )
    r = recall_at_k(exact, approx, 10)
    assert r >= 0.9, f"recall@10 = {r}"
    # single-probe is strictly a subset of the probed buckets
    single = lsh_topk(
        rd.from_arrow(emb), qm, k=10, dim=d, n_planes=8, id_col=id_col, col=col, multiprobe=0
    )
    assert recall_at_k(exact, single, 10) <= r + 1e-9


def test_cosine_near_dups_finds_planted_pairs(ray_session):
    import ray.data as rd

    from rasters_ray.ann import cosine_near_dups

    rng = np.random.default_rng(11)
    base = rng.standard_normal((60, 32)).astype(np.float32)
    # plant near-dups: ids 1000+i are tiny perturbations of ids i (i < 20)
    pert = base[:20] + 0.01 * rng.standard_normal((20, 32)).astype(np.float32)
    ids = list(range(60)) + [1000 + i for i in range(20)]
    m = np.vstack([base, pert])
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
        }
    )
    out = cosine_near_dups(rd.from_arrow(tbl), threshold=0.95, dim=32).to_pandas()
    got = {tuple(sorted((int(r.a), int(r.b)))) for r in out.itertuples()}
    want = {(i, 1000 + i) for i in range(20)}
    # every planted pair found, nothing else (random 32-d vectors are far)
    assert got == want
    assert (out.cosine >= 0.95).all()


def test_ivf_topk_recall(ray_session):
    """IVF-Flat scale path: spherical-k-means lists + nprobe filter must
    hit recall@10 >= 0.9 on the embeddings fixture (like the LSH path)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from rasters_ray.ann import cosine_topk, ivf_topk, recall_at_k

    emb = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    id_col = "vec_id" if "vec_id" in emb.column_names else emb.column_names[0]
    col = [c for c in emb.column_names if c != id_col][0]
    qm = np.asarray(emb.column(col).to_pylist()[:8], dtype=np.float32)
    exact = cosine_topk(rd.from_arrow(emb), qm, k=10, id_col=id_col, col=col)
    approx = ivf_topk(
        rd.from_arrow(emb), qm, k=10, n_centroids=16, nprobe=6, iters=2,
        id_col=id_col, col=col,
    )
    r = recall_at_k(exact, approx, 10)
    assert r >= 0.9, f"recall@10 = {r}"


def test_kmeans_centroids_bit_stable_across_layouts(ray_session):
    """Fixed-point int64 accumulation makes the Lloyd fold exact and
    commutative: centroids must match BIT-for-bit across block layouts
    AND the sequential reference (the golden cluster_assign oracle
    gate); and quality still improves over the un-iterated init."""
    import ray.data as rd

    from rasters_ray.ann import kmeans_centroids
    from rasters_ray.ann.search import kmeans_local

    tbl, m = _emb_table(n=300)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)

    def objective(c):
        return float(np.mean(np.max(mn @ c.T, axis=1)))  # mean max-cosine

    a = kmeans_centroids(rd.from_arrow(tbl), n_centroids=8, iters=2)
    b = kmeans_centroids(
        rd.from_arrow(tbl).repartition(7), n_centroids=8, iters=2
    )
    seq = kmeans_local(m, n_centroids=8, iters=2)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, seq)
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, rtol=1e-5)
    # and it beats the un-iterated init (first 8 vectors)
    assert objective(a) > objective(mn[:8]) - 1e-9


def test_kmeans_assign_objective_stable(ray_session):
    """Parallel Lloyd is not bit-stable across block layouts (summation
    order); the clustering OBJECTIVE (mean best-sim) must be."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rasters_ray.ann import kmeans_assign, kmeans_centroids

    rng = np.random.default_rng(9)
    # three well-separated cones so the objective is a stable target
    base = rng.normal(size=(3, 16)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # INTERLEAVE the cones: init takes the first k rows, so they must
    # span the clusters or different layouts converge to different
    # local optima (first-k init is deterministic, not robust)
    vecs = np.tile(base, (60, 1)) + 0.05 * rng.normal(size=(180, 16)).astype(
        np.float32
    )
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(180, dtype=np.int64)),
            "embedding": pa.array(list(vecs.astype(np.float64))),
        }
    )
    objs = []
    for blocks in (2, 6):
        ds = rd.from_arrow(t).repartition(blocks)
        cents = kmeans_centroids(ds, n_centroids=3, iters=4)
        out = kmeans_assign(ds, cents).to_pandas()
        assert len(out) == 180 and set(out["cluster"]) <= {0, 1, 2}
        objs.append(out["sim"].mean())
    assert abs(objs[0] - objs[1]) < 1e-3


def test_lsh_and_ivf_match_sequential_bitwise(ray_session):
    """Distributed lsh_topk / ivf_topk == sequential references at two
    different block layouts (the golden-oracle gate): candidate sets are
    per-row predicates, scores fixed-order float64, partials
    tie-inclusive."""
    import ray.data as rd

    from rasters_ray.ann import ivf_topk, lsh_topk
    from rasters_ray.ann.search import ivf_topk_local, lsh_topk_local

    tbl, m = _emb_table(n=400)
    q = m[:4].astype(np.float32)

    def rows(t):
        return [
            (a, b, c, d) for a, b, c, d in zip(
                t.column("query_idx").to_pylist(), t.column("rank").to_pylist(),
                t.column("vec_id").to_pylist(), t.column("score").to_pylist())
        ]

    want_lsh = lsh_topk_local(m, np.arange(len(m)), q, k=5, n_planes=6)
    want_ivf = ivf_topk_local(m, np.arange(len(m)), q, k=5, n_centroids=8, iters=2)
    for parts in (1, 7):
        ds = rd.from_arrow(tbl).repartition(parts)
        got_lsh = rows(lsh_topk(ds, q, k=5, n_planes=6))
        got_ivf = rows(ivf_topk(ds, q, k=5, n_centroids=8, iters=2))
        assert got_lsh == want_lsh, f"lsh parts={parts}"
        assert got_ivf == want_ivf, f"ivf parts={parts}"


def test_late_interaction_bruteforce_and_ties():
    from rasters_ray.ann.search import late_interaction_scores

    def tok_fn(ids):
        d = ids[:, None, None]
        t = np.arange(5)[None, :, None]
        i = np.arange(6)[None, None, :]
        return ((d * 7 + t * 13 + i * 3) % 17) - 8

    q = (((np.arange(3)[:, None] * 5 + np.arange(6)[None, :] * 11) % 17)
         - 8).astype(np.int64)
    ids = np.arange(20)
    scores, arg0 = late_interaction_scores(ids, tok_fn, q)
    for n, d in enumerate(ids):
        e = tok_fn(np.array([d]))[0]
        per_q = [max(int(e[t] @ qq) for t in range(5)) for qq in q]
        assert scores[n] == sum(per_q)
        dots0 = [int(e[t] @ q[0]) for t in range(5)]
        assert arg0[n] == dots0.index(max(dots0))  # first max tie-break
    # identical doc tokens -> arg_t0 = 0 by tie-break
    s2, a2 = late_interaction_scores(
        np.array([0]), lambda i: np.ones((1, 4, 6), dtype=np.int64), q)
    assert a2[0] == 0
    with pytest.raises(ValueError):
        late_interaction_scores(np.array([0]),
                                lambda i: np.ones((1, 4, 5), dtype=np.int64), q)
