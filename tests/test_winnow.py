"""Winnowing fingerprints (Schleimer et al. 2003, public algorithm)."""

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray.text.winnow import (
    kgram_hashes,
    winnow_fingerprints,
    winnow_local,
    winnow_positions,
)


def test_kgram_hashes_shift_invariant():
    h1 = kgram_hashes("abcdefgh-xyz", 5)
    h2 = kgram_hashes("PRE abcdefgh-xyz POST", 5)
    # the shared substring contributes identical hashes at shifted offsets
    assert len(h1) == 12 - 5 + 1
    sub = h2[4 : 4 + len(h1)]
    np.testing.assert_array_equal(sub, h1)
    assert kgram_hashes("abc", 5).size == 0


def test_winnow_density_and_guarantee():
    rng = np.random.default_rng(7)
    text = "".join(rng.choice(list("abcdefgh "), 4000))
    k, w = 8, 16
    h = kgram_hashes(text, k)
    sel = winnow_positions(h, w)
    # every window of w hashes contains at least one selected position
    for s in range(0, len(h) - w + 1, 97):
        assert np.any((sel >= s) & (sel < s + w))
    # density ~ 2/(w+1)
    assert 0.5 < (len(sel) / len(h)) / (2.0 / (w + 1)) < 2.0


def test_shared_substring_shares_fingerprint():
    k, w = 8, 16
    rng = np.random.default_rng(1)
    core = "".join(rng.choice(list("qwertyuiop"), w + k - 1))  # >= w+k-1
    a = "AAA " * 30 + core + " BBB" * 30
    b = "xyz " * 25 + core + " 123" * 25
    fa = {f for _, _, f in winnow_local([a], [0], k, w)}
    fb = {f for _, _, f in winnow_local([b], [1], k, w)}
    assert fa & fb  # winnowing guarantee


def test_distributed_matches_sequential(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(2)
    texts = ["".join(rng.choice(list("abcdef "), rng.integers(5, 400)))
             for _ in range(40)]
    tab = pa.table({"doc_id": np.arange(40, dtype=np.int64),
                    "text": pa.array(texts, pa.string())})
    got = (
        winnow_fingerprints(rd.from_arrow(tab).repartition(5))
        .to_pandas()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )
    want = winnow_local(texts, range(40))
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_duplicate_spans(ray_session):
    import ray.data as rd

    from rasters_ray.text.winnow import duplicate_spans, duplicate_spans_local

    rng = np.random.default_rng(3)
    shared = "".join(rng.choice(list("abcdefgh"), 60))  # 60-byte duplicated run
    texts = []
    for i in range(30):
        noise = "".join(rng.choice(list("0123456789 "), 120))
        texts.append(noise[:50] + (shared if i % 3 == 0 else "") + noise[50:])
    tab = pa.table({"doc_id": np.arange(30, dtype=np.int64),
                    "text": pa.array(texts, pa.string())})
    k = 20
    got = (
        duplicate_spans(rd.from_arrow(tab).repartition(6), k=k)
        .to_pandas().sort_values(["doc_id", "start"]).reset_index(drop=True)
    )
    want = sorted(duplicate_spans_local(texts, range(30), k=k))
    assert [tuple(r) for r in got.itertuples(index=False)] == want
    # every doc holding the planted run reports a span covering it
    dup_docs = set(got["doc_id"])
    assert {i for i in range(30) if i % 3 == 0} <= dup_docs
    for i in range(0, 30, 3):
        rows = got[got["doc_id"] == i]
        s0 = texts[i].find(shared)
        assert ((rows["start"] <= s0) & (rows["end"] >= s0 + 60)).any()
