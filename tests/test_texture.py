"""GLCM co-occurrence features and exact squared EDT."""

import numpy as np
import pytest

from rasters_ray.stages.texture import (edt_sq, glcm_counts, glcm_features)


def test_glcm_counts_horizontal():
    lv = np.array([[0, 0, 1], [2, 1, 1]])
    c = glcm_counts(lv, 3, offset=(0, 1))
    # pairs: (0,0) (0,1) / (2,1) (1,1)
    expect = np.zeros((3, 3), dtype=np.int64)
    expect[0, 0] = expect[0, 1] = expect[2, 1] = expect[1, 1] = 1
    assert np.array_equal(c, expect)
    assert c.sum() == 4


def test_glcm_offsets_and_features():
    lv = np.tile(np.arange(4), (4, 1))  # each row 0 1 2 3
    c_h = glcm_counts(lv, 4, offset=(0, 1))
    f = glcm_features(c_h)
    # horizontal neighbors always differ by exactly 1
    assert f["n_pairs"] == 12 and f["contrast_num"] == 12
    assert f["diag_num"] == 0
    c_v = glcm_counts(lv, 4, offset=(1, 0))
    fv = glcm_features(c_v)
    # vertical neighbors are identical
    assert fv["n_pairs"] == 12 and fv["contrast_num"] == 0
    assert fv["diag_num"] == 12
    # energy: vertical counts are 3 per diagonal level -> 4 * 9
    assert fv["energy_num"] == 36
    with pytest.raises(ValueError):
        glcm_counts(lv, 3)  # level 3 out of range


def test_edt_sq_single_and_multi_seed():
    s = np.zeros((9, 11), dtype=bool)
    s[4, 5] = True
    d = edt_sq(s)
    rr, cc = np.indices((9, 11))
    assert np.array_equal(d, (rr - 4) ** 2 + (cc - 5) ** 2)
    s[0, 0] = True
    d2 = edt_sq(s)
    assert np.array_equal(
        d2, np.minimum((rr - 4) ** 2 + (cc - 5) ** 2, rr ** 2 + cc ** 2))


def test_edt_sq_brute_force_random_and_blocks():
    rng = np.random.RandomState(4)
    s = rng.rand(17, 23) < 0.07
    s[3, 3] = True  # ensure nonempty
    d = edt_sq(s, block=5)
    rr, cc = np.indices((17, 23))
    pts = np.argwhere(s)
    brute = np.min((rr[None] - pts[:, 0, None, None]) ** 2
                   + (cc[None] - pts[:, 1, None, None]) ** 2, axis=0)
    assert np.array_equal(d, brute)
    with pytest.raises(ValueError):
        edt_sq(np.zeros((3, 3), dtype=bool))


def test_texture_stats_dataset(ray_session):
    import ray

    from rasters_ray import codec
    from rasters_ray.stages.texture import texture_stats

    px = np.arange(256, dtype=np.float64).reshape(16, 16)
    ds = ray.data.from_items([{
        "image_id": "i0",
        "bytes": codec.encode(px, "npy"),
        "fmt": "npy",
    }])
    row = texture_stats(ds, n_levels=8, offset=(0, 1),
                        quantizer=32.0).take_all()[0]
    # the 0..255 ramp quantized /32: rows 0..1 are level 0, rows 2..3
    # level 1, ... horizontal neighbors share a level except at the
    # two mid-row level steps per level (one per 32-run crossing a row)
    lv = (px // 32).astype(int)
    a, b = lv[:, :-1].ravel(), lv[:, 1:].ravel()
    assert row["n_pairs"] == a.size
    assert row["contrast_num"] == int(((a - b) ** 2).sum())
    assert row["diag_num"] == int((a == b).sum())


def test_euclidean_allocation_halfplane_and_ties():
    from rasters_ray.stages.texture import euclidean_allocation

    alloc = euclidean_allocation([(2, 2), (2, 8)], (5, 11))
    rr, cc = np.indices((5, 11))
    d1 = (rr - 2) ** 2 + (cc - 2) ** 2
    d2 = (rr - 2) ** 2 + (cc - 8) ** 2
    # tie column (c == 5) goes to the lower index
    assert np.array_equal(alloc, (d2 < d1).astype(np.int64))
    assert np.all(alloc[:, 5] == 0)
    with pytest.raises(ValueError):
        euclidean_allocation([], (3, 3))


def test_zone_geometry_rectangles():
    from rasters_ray.stages.texture import zone_geometry

    lab = np.zeros((10, 12), dtype=np.int64)
    lab[2:5, 3:8] = 1  # 3x5 rectangle
    t = zone_geometry(lab, 3).to_pydict()
    assert t["label"] == [0, 1]  # zone 2 absent -> omitted
    i1 = t["label"].index(1)
    assert t["area"][i1] == 15
    assert t["perimeter"][i1] == 2 * (3 + 5)
    assert (t["rmin"][i1], t["cmin"][i1], t["rmax"][i1],
            t["cmax"][i1]) == (2, 3, 4, 7)
    i0 = t["label"].index(0)
    assert t["area"][i0] == 120 - 15
    # zone 0's perimeter: its outer border (2*(10+12)) plus the hole
    assert t["perimeter"][i0] == 2 * (10 + 12) + 2 * (3 + 5)
