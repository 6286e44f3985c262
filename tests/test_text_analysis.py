"""Benchmark decontamination (text/analysis.py::decontaminate)."""

import pyarrow as pa

def test_decontaminate_hits_and_exclusion(ray_session):
    import ray.data as rd
    from rasters_ray.text.analysis import decontaminate

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 37, 74], pa.int64()),
        "text": [
            "the quick brown fox jumps over",     # benchmark (0)
            "a quick brown fox jumps over it",    # shares "quick brown fox jumps over"
            "totally novel content nothing here at all",
            "one two three four five six",        # benchmark (37)
            "one two three four five extra",      # benchmark (74): excluded from output
        ],
    })
    got = (decontaminate(rd.from_arrow(t), bench_mod=37, n=5)
           .to_pandas().set_index("doc_id").sort_index())
    # benchmark docs never appear in the output
    assert set(got.index) == {1, 2}
    # doc 1: 3 grams, one hit ("quick brown fox jumps over")
    assert got.loc[1].tolist() == [3, 1, 1]
    # doc 2: clean
    assert got.loc[2].tolist() == [3, 0, 0]


def test_decontaminate_repeated_gram_occurrences(ray_session):
    import ray.data as rd
    from rasters_ray.text.analysis import decontaminate

    # the same contaminated bigram occurring twice counts 2 occurrences
    # but 1 distinct gram; n=2 grams
    t = pa.table({
        "doc_id": pa.array([0, 5], pa.int64()),
        "text": ["x y", "x y z x y"],
    })
    got = decontaminate(rd.from_arrow(t), bench_mod=37, n=2).to_pandas()
    row = got[got.doc_id == 5].iloc[0]
    assert (row.n_grams, row.n_hits, row.n_distinct_hits) == (4, 2, 1)
    # short docs (< n tokens) report zero grams
    t2 = pa.table({"doc_id": pa.array([0, 3], pa.int64()),
                   "text": ["a b c d e", "tiny"]})
    got2 = decontaminate(rd.from_arrow(t2), bench_mod=37, n=5).to_pandas()
    assert got2[got2.doc_id == 3].iloc[0].n_grams == 0
