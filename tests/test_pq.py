"""Product quantization: reconstruction accuracy + determinism."""

import numpy as np
import pyarrow as pa

from rasters_ray.ann.pq import pq_encode, pq_reconstruct, train_pq


def _ds(x: np.ndarray, n_blocks: int, shuffle_seed=None):
    import ray.data as rd

    tab = pa.table(
        {
            "vec_id": np.arange(len(x), dtype=np.int64),
            "embedding": pa.array(
                [r.astype(np.float32) for r in x], pa.list_(pa.float32())
            ),
        }
    )
    ds = rd.from_arrow(tab)
    if shuffle_seed is not None:
        ds = ds.random_shuffle(seed=shuffle_seed)
    return ds.repartition(n_blocks)


def test_pq_reconstruction_beats_global_mean(ray_session):
    rng = np.random.default_rng(2)
    # clustered data: PQ should capture most of the variance
    centers = rng.normal(size=(8, 16)) * 4
    x = centers[rng.integers(0, 8, 2000)] + rng.normal(size=(2000, 16)) * 0.3
    x = x.astype(np.float32).astype(np.float64)
    ds = _ds(x, 6)
    books = train_pq(ds, m_subspaces=4, k=16, iters=5)
    codes_df = pq_encode(ds, books).to_pandas().sort_values("vec_id")
    codes = np.stack(codes_df["codes"].to_numpy())
    recon = pq_reconstruct(codes, books)
    mse = np.mean((recon - x) ** 2)
    base = np.mean((x - x.mean(0)) ** 2)  # rank-0 baseline
    assert mse < 0.15 * base
    assert codes.shape == (2000, 4)
    assert codes.max() < 16


def test_pq_codes_layout_independent(ray_session):
    rng = np.random.default_rng(5)
    x = rng.normal(size=(600, 8)).astype(np.float32).astype(np.float64)
    # same logical order (init = first k vectors), different block layout:
    # fixed-point int64 accumulation makes the fold exact + commutative,
    # so codebooks must match BIT-for-bit (not just within tolerance)
    a_books = train_pq(_ds(x, 3), m_subspaces=2, k=8, iters=3)
    b_books = train_pq(_ds(x, 9), m_subspaces=2, k=8, iters=3)
    np.testing.assert_array_equal(a_books, b_books)


def test_pq_distributed_matches_sequential(ray_session):
    from rasters_ray.ann.pq import pq_train_local

    rng = np.random.default_rng(11)
    x = rng.normal(size=(500, 8)).astype(np.float32).astype(np.float64)
    dist = train_pq(_ds(x, 7), m_subspaces=2, k=8, iters=4)
    seq = pq_train_local(x, m_subspaces=2, k=8, iters=4)
    np.testing.assert_array_equal(dist, seq)  # bit-equal: the golden-oracle gate


def test_pq_adc_topk_recall(ray_session):
    from rasters_ray.ann.pq import pq_topk

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(10, 16)) * 3
    x = centers[rng.integers(0, 10, 1500)] + rng.normal(size=(1500, 16)) * 0.2
    x = x.astype(np.float32).astype(np.float64)
    q = x[:5] + rng.normal(size=(5, 16)) * 0.01
    out = pq_topk(_ds(x, 5), q, k_results=10, m_subspaces=4, n_codes=16).to_pandas()
    # exact L2 top-10 per query
    hits = 0
    for qi in range(5):
        d = ((x - q[qi]) ** 2).sum(1)
        exact = set(np.argsort(d, kind="stable")[:10].tolist())
        got = set(out[out["query_idx"] == qi]["vec_id"].tolist())
        hits += len(exact & got)
    recall = hits / 50.0
    assert recall >= 0.9, recall  # ADC shortlist + exact rerank
    assert (out.groupby("query_idx")["rank"].max() == 10).all()


def test_pq_topk_matches_sequential_bitwise(ray_session):
    """Global ADC shortlist (round 4): pq_topk must be bit-equal to the
    sequential reference at different block layouts — the shortlist cut
    is (adc, vec_id) total order, no longer per-batch."""
    from rasters_ray.ann.pq import pq_topk, pq_topk_local

    rng = np.random.default_rng(13)
    x = rng.normal(size=(400, 8)).astype(np.float32).astype(np.float64)
    q = x[:3].astype(np.float32)
    want = pq_topk_local(x, np.arange(400), q, k_results=5, m_subspaces=2,
                         n_codes=8, iters=3)
    for parts in (1, 7):
        got = pq_topk(_ds(x, parts), q, k_results=5, m_subspaces=2,
                      n_codes=8, iters=3)
        rows = [(a, b, c, d) for a, b, c, d in zip(
            got.column("query_idx").to_pylist(), got.column("rank").to_pylist(),
            got.column("vec_id").to_pylist(), got.column("dist").to_pylist())]
        assert rows == want, f"parts={parts}"
