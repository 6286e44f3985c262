"""Prefix-filter set-similarity join vs brute-force truth.

The prefix filter must be COMPLETE (no missed pair) for any threshold and
any block layout; the verify stage makes the output exact.
"""

import itertools

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray.text.setjoin import set_similarity_join, word_token_set


def _corpus(n_docs: int, seed: int):
    """Synthetic docs over a moderately wide vocab with planted near-dups."""
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:03d}" for i in range(120)])
    texts = []
    for i in range(n_docs):
        k = int(rng.integers(8, 30))
        words = rng.choice(vocab, size=k, replace=False)
        texts.append(" ".join(words))
    # planted near-dups: copy with a few tokens swapped
    for src in (0, 3, 7):
        base = texts[src].split()
        mutated = list(base)
        mutated[0] = "w999"
        texts.append(" ".join(mutated))
    ids = np.arange(len(texts), dtype=np.int64)
    return pa.table({"doc_id": ids, "text": texts})


def _brute(table: pa.Table, t: float):
    ids = table.column("doc_id").to_pylist()
    sets = [word_token_set(x) for x in table.column("text").to_pylist()]
    out = set()
    for (i, a), (j, b) in itertools.combinations(zip(ids, sets), 2):
        if not a and not b:
            continue
        inter = len(a & b)
        jac = inter / (len(a) + len(b) - inter)
        if jac >= t:
            out.add((min(i, j), max(i, j), jac))
    return out


@pytest.mark.parametrize("threshold", [0.5, 0.8])
def test_setjoin_matches_bruteforce(ray_session, threshold):
    import ray.data as rd

    tab = _corpus(60, seed=9)
    ds = rd.from_arrow(tab).random_shuffle(seed=4).repartition(7)
    got = set_similarity_join(ds, threshold=threshold).to_pandas()
    got_set = {
        (int(a), int(b), float(j))
        for a, b, j in zip(got["a"], got["b"], got["jaccard"])
    }
    assert got_set == _brute(tab, threshold)
    assert len(got_set) >= 3  # the planted near-dups surface


def test_setjoin_empty_and_identical_docs(ray_session):
    import ray.data as rd

    tab = pa.table(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": ["a b c", "a b c", "", "x y", "a b d"],
        }
    )
    ds = rd.from_arrow(tab).repartition(3)
    got = set_similarity_join(ds, threshold=0.6).to_pandas()
    pairs = {(int(a), int(b)) for a, b in zip(got["a"], got["b"])}
    assert (0, 1) in pairs  # identical docs
    assert all(2 not in p for p in pairs)  # empty doc never pairs
    got01 = got[(got["a"] == 0) & (got["b"] == 1)]["jaccard"].iloc[0]
    assert got01 == 1.0
