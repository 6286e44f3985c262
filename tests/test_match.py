"""NCC template matching."""

import numpy as np
import pytest

from rasters_ray.stages.match import match_template, peak_of


CHECKER = 100.0 * ((np.indices((4, 4)).sum(axis=0)) % 2).astype(float)


def test_exact_stamp_recovers_location_and_unit_score():
    r, c = np.indices((16, 16))
    base = (r * 16 + c) / 8.0
    img = base.copy()
    img[5 : 9, 7 : 11] = CHECKER
    scores = match_template(img, CHECKER)
    assert scores.shape == (13, 13)
    pr, pc, s = peak_of(scores)
    assert (pr, pc) == (5, 7)
    assert abs(s - 1.0) < 1e-12


def test_checkerboard_orthogonal_to_planar_ramp():
    # cov(checker, linear plane) telescopes to zero: every row and
    # column of the +-pattern balances
    r, c = np.indices((16, 16))
    scores = match_template((3.0 * r + 2.0 * c).astype(float), CHECKER)
    assert np.allclose(scores, 0.0, atol=1e-12)


def test_zero_variance_windows_and_template_score_zero():
    assert np.all(match_template(np.zeros((8, 8)), CHECKER) == 0.0)
    assert np.all(match_template(np.random.default_rng(0)
                                 .normal(size=(8, 8)), np.ones((3, 3))) == 0.0)


def test_negative_correlation_and_tie_break():
    img = np.zeros((6, 6))
    img[1:5, 1:5] = 100.0 - CHECKER  # inverted pattern
    scores = match_template(img, CHECKER)
    assert scores[1, 1] < -0.9
    # all-equal scores tie-break to (0, 0)
    assert peak_of(np.zeros((3, 3)))[:2] == (0, 0)


def test_template_larger_than_image_raises():
    with pytest.raises(ValueError):
        match_template(np.zeros((3, 3)), np.zeros((4, 4)))


def test_estimate_shift_exhaustive_over_query_keyspace():
    # the SAME texture + shift lattice q_coregister uses: proving all
    # 35 (dr, dc) combos here makes the contract oracle airtight
    from rasters_ray.stages.match import estimate_shift

    r, c = np.indices((32, 32))
    scene = ((r * r * 3 + c * c * 7 + r * c) % 13).astype(float)
    ref = scene[8:24, 8:24]
    for dr in range(-2, 3):
        for dc in range(-3, 4):
            mov = scene[8 + dr : 24 + dr, 8 + dc : 24 + dc]
            got = estimate_shift(ref, mov, max_shift=4)
            assert got[:2] == (dr, dc)
            assert abs(got[2] - 1.0) < 1e-12
    with pytest.raises(ValueError):
        estimate_shift(ref, ref, max_shift=8)


def test_coregister_pairs_dataset(ray_session):
    import ray

    from rasters_ray import codec
    from rasters_ray.stages.match import coregister_pairs

    r, c = np.indices((32, 32))
    scene = ((r * r * 3 + c * c * 7 + r * c) % 13).astype(float)
    ds = ray.data.from_items([{
        "pair_id": "p0",
        "bytes_ref": codec.encode(scene[8:24, 8:24], "npy"),
        "bytes_mov": codec.encode(scene[10:26, 5:21], "npy"),
        "fmt": "npy",
    }])
    rows = coregister_pairs(ds).take_all()
    assert rows[0]["dr"] == 2 and rows[0]["dc"] == -3
    assert rows[0]["score_8"] == 8


def test_template_match_dataset(ray_session):
    import ray

    from rasters_ray import codec
    from rasters_ray.stages.match import template_match

    r, c = np.indices((16, 16))
    img = ((r * 16 + c) / 8.0)
    img[2:6, 9:13] = CHECKER
    ds = ray.data.from_items([{
        "image_id": "imgA",
        "bytes": codec.encode(img, "npy"),
        "fmt": "npy",
    }])
    rows = template_match(ds, CHECKER).take_all()
    assert rows[0]["peak_r"] == 2 and rows[0]["peak_c"] == 9
    assert rows[0]["score_8"] == 8
    assert rows[0]["n_pos"] == 169


def test_block_flow_recovers_shift():
    from rasters_ray.stages.match import block_flow

    rng = np.random.default_rng(0)
    img = rng.integers(0, 251, (40, 40)).astype(np.int64)
    # after[r, c] = img[r + 1, c - 2]  =>  best displacement (-1, +2)
    after = np.roll(np.roll(img, -1, axis=0), 2, axis=1)
    bi, bj, dy, dx, sad = block_flow(img, after, block=8, radius=2)
    assert bi.size == 16
    assert set(dy.tolist()) == {-1} and set(dx.tolist()) == {2}
    assert sad.max() == 0


def test_block_flow_tie_breaks_lexicographic():
    from rasters_ray.stages.match import block_flow

    c = np.full((30, 30), 9, np.int64)
    _, _, dy, dx, sad = block_flow(c, c, block=6, radius=2)
    # every SAD is zero: ties resolve to the smallest (dy, dx)
    assert set(dy.tolist()) == {-2} and set(dx.tolist()) == {-2}
    assert sad.max() == 0


def test_block_flow_sad_matches_bruteforce():
    from rasters_ray.stages.match import block_flow

    rng = np.random.default_rng(1)
    a = rng.integers(0, 50, (20, 20)).astype(np.int64)
    b = rng.integers(0, 50, (20, 20)).astype(np.int64)
    bi, bj, dy, dx, sad = block_flow(a, b, block=5, radius=1)
    for i in range(bi.size):
        r0, c0 = 1 + bi[i] * 5, 1 + bj[i] * 5
        best = None
        for ddy in (-1, 0, 1):
            for ddx in (-1, 0, 1):
                s = int(np.abs(a[r0:r0+5, c0:c0+5]
                               - b[r0+ddy:r0+ddy+5, c0+ddx:c0+ddx+5]).sum())
                key = (s, ddy, ddx)
                if best is None or key < best:
                    best = key
        assert (sad[i], dy[i], dx[i]) == best


def test_block_flow_too_small_raises():
    from rasters_ray.stages.match import block_flow

    with pytest.raises(ValueError):
        block_flow(np.zeros((8, 8)), np.zeros((8, 8)), block=8, radius=2)


def test_block_flow_images_dataset(ray_session):
    import ray

    from rasters_ray import codec
    from rasters_ray.stages.match import block_flow_images

    rng = np.random.default_rng(2)
    img = rng.integers(0, 251, (40, 40)).astype(np.float32)
    ds = ray.data.from_items([{
        "image_id": "imgZ",
        "bytes": codec.encode(img, "npy"),
        "fmt": "npy",
    }])

    def after(iid, arr):
        # after[:, c] = arr[:, c + 1]  =>  before[r, c] = after[r, c - 1]
        return np.roll(arr, -1, axis=1)

    rows = block_flow_images(ds, after, block=8, radius=2).take_all()
    assert len(rows) == 16
    assert all(r["dy"] == 0 and r["dx"] == -1 and r["sad"] == 0
               for r in rows)
