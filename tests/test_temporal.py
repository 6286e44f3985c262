"""Temporal stack kernels (lower median, OLS trend numerators) and the
tile-grouped distributed paths asserted against whole-scene recomputes."""

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray import codec
from rasters_ray.sources.images import make_oracle_images
from rasters_ray.stages.temporal import (
    lower_median,
    stack_median_histogram,
    stack_trend_summary,
    trend_numerators,
)


def _ds(table: pa.Table, blocks: int = 3):
    import ray.data as rd

    return rd.from_arrow(table).repartition(blocks)


# shipped to Ray workers: keep as a lambda (pickled by value; a module-level
# def in a test file pickles by reference and fails to import on workers)
_key = lambda image_id: (int(image_id[3:]) % 4, int(image_id[3:]) // 4)  # noqa: E731


def test_lower_median_exact():
    s = np.array([[5, 1, 9], [2, 1, 9], [7, 3, 0], [2, 8, 4]])
    # sorted per column: [2,2,5,7], [1,1,3,8], [0,4,9,9] -> index (4-1)//2=1
    assert lower_median(s).tolist() == [2, 1, 4]
    assert lower_median(s[:3]).tolist() == [5, 1, 9]  # odd T -> true median
    with pytest.raises(ValueError):
        lower_median(np.array([1, 2, 3]))


def test_trend_numerators_bruteforce():
    rng = np.random.default_rng(7)
    stack = rng.integers(0, 251, (5, 40)).astype(np.int64)
    t = np.array([0, 1, 2, 5, 9], dtype=np.int64)
    num = trend_numerators(stack, t)
    for j in range(40):
        v = stack[:, j]
        want = 5 * int((t * v).sum()) - int(t.sum()) * int(v.sum())
        assert num[j] == want
    # a perfectly rising pixel has a positive numerator, flat is zero
    assert trend_numerators(np.arange(5).reshape(-1, 1) * 3, t)[0] > 0
    assert trend_numerators(np.full((5, 1), 7), t)[0] == 0
    with pytest.raises(ValueError):
        trend_numerators(stack, t[:3])


def _whole_scene_expect(ids):
    """Recompute both summaries from whole decoded scenes."""
    imgs = make_oracle_images(np.asarray(ids, dtype=np.int64))
    scenes = {}
    for i, d in enumerate(ids):
        px = codec.decode(
            imgs.column("bytes")[i].as_py(), imgs.column("fmt")[i].as_py()
        ).astype(np.int64)
        k, e = _key(f"img{d:08d}")
        scenes.setdefault(k, []).append((e, px.ravel()))
    med_rows, trend_rows = [], []
    for k in sorted(scenes):
        eps, arrs = zip(*sorted(scenes[k]))
        stack = np.stack(arrs)
        med = lower_median(stack)
        bc = np.bincount(med)
        for v in np.flatnonzero(bc):
            med_rows.append((k, int(v), int(bc[v])))
        num = trend_numerators(stack, np.array(eps))
        trend_rows.append(
            (k, num.size, int((num > 0).sum()), int((num < 0).sum()),
             int((num == 0).sum()), int(num.sum()))
        )
    return imgs, med_rows, trend_rows


def test_stack_median_tiled_equals_whole(ray_session):
    ids = list(range(8))
    imgs, want, _ = _whole_scene_expect(ids)
    got = (
        stack_median_histogram(_ds(imgs, 3), _key, tile=32)
        .to_pandas()
        .sort_values(["stack_key", "value"])
        .reset_index(drop=True)
    )
    assert list(map(tuple, got.itertuples(index=False))) == sorted(want)
    # histogram totals cover every pixel of one scene per stack
    assert got.groupby("stack_key")["n_px"].sum().eq(10000).all()


def test_stack_trend_tiled_equals_whole(ray_session):
    ids = list(range(8))
    imgs, _, want = _whole_scene_expect(ids)
    got = (
        stack_trend_summary(_ds(imgs, 3), _key, tile=32)
        .to_pandas()
        .sort_values("stack_key")
        .reset_index(drop=True)
    )
    assert list(map(tuple, got.itertuples(index=False))) == sorted(want)
    assert (got["n_up"] + got["n_down"] + got["n_flat"]).eq(got["n_px"]).all()


def test_stack_guards(ray_session):
    # duplicate epoch raises
    imgs = make_oracle_images(np.array([0, 4], dtype=np.int64))
    with pytest.raises(Exception):
        stack_median_histogram(_ds(imgs, 1), lambda i: (0, 0), tile=50).to_pandas()
    # key_fn None routes a scene out entirely
    got = stack_trend_summary(_ds(imgs, 1), lambda i: None, tile=50)
    assert got.count() == 0


def test_mann_kendall_s_bruteforce():
    from rasters_ray.stages.temporal import mann_kendall_s

    rng = np.random.default_rng(3)
    stack = rng.integers(0, 20, (6, 50)).astype(np.int64)  # small range: ties
    s = mann_kendall_s(stack)
    for j in range(50):
        v = stack[:, j]
        want = sum(
            int(np.sign(v[b] - v[a]))
            for a in range(6)
            for b in range(a + 1, 6)
        )
        assert s[j] == want
    # monotone rising pixel saturates at +T(T-1)/2, flat at 0
    assert mann_kendall_s(np.arange(6).reshape(-1, 1))[0] == 15
    assert mann_kendall_s(np.full((6, 1), 4))[0] == 0
    assert mann_kendall_s(np.arange(6)[::-1].reshape(-1, 1))[0] == -15
    with pytest.raises(ValueError):
        mann_kendall_s(np.array([[1, 2, 3]]))  # T < 2


def test_stack_mann_kendall_tiled_equals_whole(ray_session):
    from rasters_ray.stages.temporal import mann_kendall_s, stack_mann_kendall

    ids = list(range(8))
    imgs = make_oracle_images(np.asarray(ids, dtype=np.int64))
    scenes = {}
    for i, d in enumerate(ids):
        px = codec.decode(
            imgs.column("bytes")[i].as_py(), imgs.column("fmt")[i].as_py()
        ).astype(np.int64)
        scenes.setdefault(d % 4, []).append((d // 4, px))
    want = set()
    for k, lst in scenes.items():
        stack = np.stack([p.ravel() for _, p in sorted(lst)])
        s = mann_kendall_s(stack)
        for u, n in zip(*np.unique(s, return_counts=True)):
            want.add((k, int(u), int(n)))
    got = (
        stack_mann_kendall(_ds(imgs, 3), _key, tile=32)
        .to_pandas()
        .sort_values(["stack_key", "s"])
        .reset_index(drop=True)
    )
    assert set(map(tuple, got.itertuples(index=False))) == want
    assert got.groupby("stack_key")["n_px"].sum().eq(10000).all()


def test_theil_sen_fractions_matches_fraction_bruteforce():
    from fractions import Fraction

    from rasters_ray.stages.temporal import theil_sen_fractions

    rng = np.random.default_rng(6)
    stack = rng.integers(0, 20, (4, 150)).astype(np.int64)
    t = np.array([0, 1, 3, 7], dtype=np.int64)
    num, den = theil_sen_fractions(stack, t)
    for px in range(150):
        sl = sorted(
            Fraction(int(stack[j, px] - stack[i, px]), int(t[j] - t[i]))
            for i in range(4)
            for j in range(i + 1, 4)
        )
        assert Fraction(int(num[px]), int(den[px])) == sl[(len(sl) - 1) // 2]
        assert den[px] > 0
        if num[px]:
            assert np.gcd(abs(int(num[px])), int(den[px])) == 1
    # flat -> 0/1; unordered epochs are sorted internally
    n2, d2 = theil_sen_fractions(np.full((3, 5), 9), np.array([2, 0, 1]))
    assert (n2 == 0).all() and (d2 == 1).all()
    with pytest.raises(ValueError):
        theil_sen_fractions(stack, np.array([0, 1, 1, 2]))


def test_stack_theil_sen_tiled_equals_whole(ray_session):
    from rasters_ray.stages.temporal import stack_theil_sen, theil_sen_fractions

    ids = list(range(8))
    imgs = make_oracle_images(np.asarray(ids, dtype=np.int64))
    scenes = {}
    for i, d in enumerate(ids):
        px = codec.decode(
            imgs.column("bytes")[i].as_py(), imgs.column("fmt")[i].as_py()
        ).astype(np.int64)
        scenes.setdefault(d % 4, []).append((d // 4, px))
    want = set()
    for k, lst in scenes.items():
        eps = np.array([e for e, _ in sorted(lst)], dtype=np.int64)
        stack = np.stack([p.ravel() for _, p in sorted(lst)])
        num, den = theil_sen_fractions(stack, eps)
        key = num * 10**6 + den
        for u, n in zip(*np.unique(key, return_counts=True)):
            want.add((k, int(u) // 10**6, int(u) % 10**6, int(n)))
    got = stack_theil_sen(_ds(imgs, 3), _key, tile=32).to_pandas()
    assert set(map(tuple, got.itertuples(index=False))) == want
