"""Histogram matching and Brovey pansharpen."""

import numpy as np
import pytest

from rasters_ray.stages.radiometry import brovey_pansharpen, match_histogram


def test_match_histogram_equal_frequency_exact():
    # both images have 256 distinct equally-frequent values: the i-th
    # smallest source value maps exactly to the i-th smallest ref value
    rng = np.random.RandomState(0)
    src = rng.permutation(256).reshape(16, 16).astype(float)
    ref = (np.arange(256) * 3 + 7).reshape(16, 16).astype(float)
    out = match_histogram(src, ref)
    assert np.array_equal(out, src * 3 + 7)


def test_match_histogram_is_distribution_preserving():
    rng = np.random.RandomState(1)
    src = rng.randint(0, 50, size=(20, 20)).astype(float)
    ref = rng.normal(100, 10, size=(30, 30))
    out = match_histogram(src, ref)
    # monotone: value order preserved
    order = np.argsort(src.ravel(), kind="stable")
    assert np.all(np.diff(out.ravel()[order]) >= 0)
    # range within the reference's support
    assert out.min() >= ref.min() - 1e-9 and out.max() <= ref.max() + 1e-9


def test_match_histogram_identity():
    a = np.arange(64, dtype=float).reshape(8, 8)
    assert np.allclose(match_histogram(a, a), a)


def test_brovey_exact_ratio():
    x = np.arange(1.0, 17.0).reshape(4, 4)
    bands = np.stack([x, 2 * x, 3 * x])  # mean = 2x
    pan = 4 * x                          # ratio = 2 exactly
    out = brovey_pansharpen(bands, pan)
    assert np.array_equal(out, 2 * bands)


def test_brovey_zero_mean_and_validation():
    bands = np.zeros((3, 2, 2))
    assert np.array_equal(brovey_pansharpen(bands, np.ones((2, 2))),
                          np.zeros((3, 2, 2)))
    with pytest.raises(ValueError):
        brovey_pansharpen(np.zeros((2, 2)), np.zeros((2, 2)))


def test_match_to_reference_dataset(ray_session):
    import ray

    from rasters_ray import codec
    from rasters_ray.stages.radiometry import match_to_reference

    rng = np.random.RandomState(2)
    src = rng.permutation(64).reshape(8, 8).astype(float)
    ref = (np.arange(64) * 2).reshape(8, 8).astype(float)
    ds = ray.data.from_items([{
        "image_id": "i0",
        "bytes": codec.encode(src, "npy"),
        "fmt": "npy",
    }])
    out = ds.map_batches(
        match_to_reference,
        fn_constructor_kwargs={"ref_bytes": codec.encode(ref, "npy"),
                               "ref_fmt": "npy"},
        concurrency=1, batch_format="pyarrow").take_all()
    matched = codec.decode(out[0]["bytes"], out[0]["fmt"])
    assert np.array_equal(matched, src * 2)


def test_otsu_bruteforce_rational():
    # exact-rational argmax over every candidate threshold must agree
    from fractions import Fraction

    import numpy as np

    from rasters_ray.stages.radiometry import otsu_threshold

    rng = np.random.default_rng(11)
    for trial in range(6):
        v = np.concatenate([
            rng.integers(0, 80, 90 + 7 * trial),
            rng.integers(120, 256, 100 + 3 * trial),
        ])
        n, tot = len(v), int(v.sum())
        uniq = np.unique(v)
        best, best_t = Fraction(-1), None
        p = s = 0
        cnt = {u: int((v == u).sum()) for u in uniq}
        for u in uniq[:-1]:
            p += cnt[u]
            s += cnt[u] * int(u)
            num = n * s - tot * p
            crit = Fraction(num * num, p * (n - p))
            if crit > best:
                best, best_t = crit, int(u)
        t, _, _ = otsu_threshold(v)
        assert t == best_t


def test_otsu_bimodal_and_errors():
    import numpy as np
    import pytest

    from rasters_ray.stages.radiometry import otsu_threshold

    t, p, s = otsu_threshold(np.array([5] * 50 + [200] * 50))
    assert t == 5 and p == 50 and s == 250
    # NaNs ignored
    v = np.array([1.0, np.nan, 1.0, 9.0, 9.0])
    assert otsu_threshold(v)[0] == 1
    with pytest.raises(ValueError):
        otsu_threshold(np.array([3.0]))
    with pytest.raises(ValueError):
        otsu_threshold(np.array([4, 4, 4]))


def test_qa_bitmask_tabulate_exact_counts():
    from rasters_ray.stages.radiometry import qa_bitmask_tabulate

    # 2-bit word stream with known composition: bit0 = fill, bits1-2 = conf
    arr = np.array([[0b000, 0b001, 0b011], [0b110, 0b110, 0b001]])
    tab = qa_bitmask_tabulate(arr, [("fill", 0, 1), ("conf", 1, 2)])
    rows = {(f, c): n for f, c, n in zip(tab.column("field").to_pylist(),
                                         tab.column("code").to_pylist(),
                                         tab.column("n_px").to_pylist())}
    assert rows == {("fill", 0): 3, ("fill", 1): 3,
                    ("conf", 0): 3, ("conf", 1): 1, ("conf", 3): 2}
    # total per field always equals pixel count
    assert sum(n for (f, _), n in rows.items() if f == "fill") == arr.size


def test_qa_bitmask_tabulate_rejects_bad_input():
    from rasters_ray.stages.radiometry import qa_bitmask_tabulate

    with pytest.raises(ValueError):
        qa_bitmask_tabulate(np.array([1.5, 2.0]), [("f", 0, 1)])
    with pytest.raises(ValueError):
        qa_bitmask_tabulate(np.array([-1, 2]), [("f", 0, 1)])
    with pytest.raises(ValueError):
        qa_bitmask_tabulate(np.array([1, 2]), [("f", -1, 1)])
    # integral floats are accepted
    tab = qa_bitmask_tabulate(np.array([2.0, 3.0]), [("hi", 1, 1)])
    assert tab.column("n_px").to_pylist() == [2]


def test_nd_index_bins_matches_float_definition():
    from rasters_ray.stages.radiometry import nd_index_bins

    rng = np.random.RandomState(7)
    a = rng.randint(0, 300, size=(40, 50))
    b = rng.randint(0, 300, size=(40, 50))
    tab = nd_index_bins(a, b, k=10)
    got = dict(zip(tab.column("bin").to_pylist(), tab.column("n_px").to_pylist()))

    # independent reference: exact rational nd binned on [-1, 1] via
    # Fraction (float floor drifts at bin edges; the rational floor is
    # the definition), nd == +1 clipped into the top bin
    from fractions import Fraction

    ref: dict = {}
    for ai, bi in zip(a.ravel().tolist(), b.ravel().tolist()):
        if ai + bi == 0:
            u = -1
        else:
            nd = Fraction(ai - bi, ai + bi)
            u = min(int((nd + 1) * 5), 9)  # Fraction __int__ truncates toward 0; nd+1 >= 0 so == floor
        ref[u] = ref.get(u, 0) + 1
    assert got == ref
    assert sum(got.values()) == a.size


def test_nd_index_bins_edges_and_errors():
    from rasters_ray.stages.radiometry import nd_index_bins

    # b == 0 -> nd = +1 -> top bin; a == b -> nd = 0 -> bin k/2; sum 0 -> -1
    tab = nd_index_bins(np.array([5, 3, 0]), np.array([0, 3, 0]), k=10)
    got = dict(zip(tab.column("bin").to_pylist(), tab.column("n_px").to_pylist()))
    assert got == {-1: 1, 5: 1, 9: 1}
    with pytest.raises(ValueError):
        nd_index_bins(np.array([1.5]), np.array([1]))
    with pytest.raises(ValueError):
        nd_index_bins(np.array([-1]), np.array([1]))
    with pytest.raises(ValueError):
        nd_index_bins(np.array([1, 2]), np.array([1]))
    with pytest.raises(ValueError):
        nd_index_bins(np.array([1]), np.array([1]), k=0)


def test_nd_index_bins_tiling_invariant():
    from rasters_ray.stages.radiometry import nd_index_bins

    rng = np.random.RandomState(11)
    a = rng.randint(0, 255, size=(64, 64))
    b = rng.randint(0, 255, size=(64, 64))
    whole = dict(zip(nd_index_bins(a, b).column("bin").to_pylist(),
                     nd_index_bins(a, b).column("n_px").to_pylist()))
    merged: dict = {}
    for r0 in range(0, 64, 16):
        for c0 in range(0, 64, 16):
            t = nd_index_bins(a[r0:r0 + 16, c0:c0 + 16], b[r0:r0 + 16, c0:c0 + 16])
            for u, n in zip(t.column("bin").to_pylist(), t.column("n_px").to_pylist()):
                merged[u] = merged.get(u, 0) + n
    assert whole == merged
