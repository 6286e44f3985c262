"""Distributed BPE trainer vs sequential reference (bit-equal merges)."""

import numpy as np
import pyarrow as pa

from rasters_ray.text.bpe import apply_merges, bpe_train_local, train_bpe


def _corpus(seed: int, n_docs: int = 120):
    rng = np.random.default_rng(seed)
    vocab = ["banana", "bandana", "ananas", "cabana", "bad", "and",
             "nab", "ban", "anna", "nana"]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(5, 25))))
        for _ in range(n_docs)
    ]
    return texts


def _ds(texts, n_blocks):
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"doc_id": np.arange(len(texts), dtype=np.int64),
                  "text": texts})
    ).random_shuffle(seed=1).repartition(n_blocks)


def test_train_bpe_matches_sequential(ray_session):
    texts = _corpus(3)
    got = train_bpe(_ds(texts, 7), n_merges=10).to_pandas()
    ref = bpe_train_local(texts, n_merges=10)
    assert len(got) == len(ref)
    for row, (l, r, n) in zip(got.itertuples(), ref):
        assert (row.left, row.right, row.n) == (l, r, n)


def test_train_bpe_layout_independent(ray_session):
    texts = _corpus(9)
    a = train_bpe(_ds(texts, 3), n_merges=6).to_pandas()
    b = train_bpe(_ds(texts, 11), n_merges=6).to_pandas()
    assert a.equals(b)


def test_apply_merges_greedy_left_to_right():
    # 'aaaa' under merge (a,a): pairs merge left-to-right -> ['aa', 'aa']
    assert apply_merges("aaaa", [("a", "a")]) == ["aa", "aa"]
    assert apply_merges("aaa", [("a", "a")]) == ["aa", "a"]
    # chained merges compose in order
    assert apply_merges("banana", [("a", "n"), ("an", "an")]) == [
        "b", "anan", "a"
    ]
