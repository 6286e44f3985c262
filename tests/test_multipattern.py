"""Multi-pattern actor stage: overlap counts, guards, unicode."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rasters_ray.text.multipattern import (
    MultiPatternStage,
    assert_border_free,
    multi_pattern_counts,
)


def _brute(docs, pats):
    want = {}
    for i, d in enumerate(docs):
        for p in pats:
            n, start = 0, 0
            while True:
                j = d.find(p, start)
                if j < 0:
                    break
                n += 1
                start = j + 1
            if n:
                want[(i, p)] = n
    return want


def test_counts_match_bruteforce(ray_session):
    docs = ["fast table fast scan", "nothing relevant", "",
            "fastfastfast", "part of the value part stream",
            "scan scan scan table"]
    pats = ["fast", "table", "scan", "art", "value part"]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    out = multi_pattern_counts(rd.from_arrow(t), pats).to_pandas()
    got = {(r.doc_id, r.pattern): r.n for r in out.itertuples()}
    assert got == _brute(docs, pats)


def test_border_guard():
    with pytest.raises(ValueError, match="border"):
        assert_border_free("a a")
    with pytest.raises(ValueError, match="border"):
        assert_border_free("abab")
    assert_border_free("fast")  # no raise


def test_stage_kernel_unicode_and_empty_batch():
    stage = MultiPatternStage(["données", "fast"])
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["les données fast données", "x"])})
    out = stage(t).to_pandas()
    got = {(r.doc_id, r.pattern): r.n for r in out.itertuples()}
    assert got == {(1, "données"): 2, (1, "fast"): 1}
    empty = stage(t.slice(0, 0))
    assert empty.num_rows == 0
    assert empty.column_names == ["doc_id", "pattern", "n"]
