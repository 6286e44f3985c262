"""Harris corners and local binary patterns."""

import numpy as np
import pytest

from rasters_ray.stages.features import (harris_peak, harris_response,
                                         lbp_codes)


def _square_img(r0, c0, size=5, h=16, w=16):
    img = np.zeros((h, w), dtype=np.int64)
    img[r0:r0 + size, c0:c0 + size] = 100
    return img


def test_harris_translation_invariant_peak():
    # the peak response value is translation-invariant and its offset
    # from the square's corner is a fixed lattice constant
    base_r, base_c, base_resp = harris_peak(_square_img(4, 5))
    off_r, off_c = base_r - 4, base_c - 5
    assert base_resp > 0
    for r0 in range(3, 9):
        for c0 in range(3, 8):
            r, c, resp = harris_peak(_square_img(r0, c0))
            assert resp == base_resp
            assert (r - r0, c - c0) == (off_r, off_c)


def test_harris_flat_and_edge_not_corners():
    flat = np.full((16, 16), 7, dtype=np.int64)
    assert harris_peak(flat)[2] == 0
    # a pure vertical edge: det == 0, so the edge band's response is
    # strictly negative (-trace^2) and the global peak stays at the
    # flat 0 — edges are never corners
    edge = np.zeros((16, 16), dtype=np.int64)
    edge[:, 8:] = 100
    resp = harris_response(edge)
    assert np.all(resp[2:-2, 7:9] < 0)
    assert harris_peak(edge)[2] == 0
    # and a true corner beats both
    assert harris_peak(_square_img(5, 5))[2] > 0
    with pytest.raises(ValueError):
        harris_response(np.zeros((4, 4)))
    with pytest.raises(ValueError):
        harris_response(np.full((6, 6), 0.5))


def test_lbp_ramp_code_and_border():
    r, c = np.indices((8, 8))
    codes = lbp_codes((r * 8 + c).astype(float))
    # strictly increasing in E/SE/S/SW: bits 0..3 set -> code 15
    assert np.all(codes[1:-1, 1:-1] == 15)
    assert np.all(codes[0, :] == -1) and np.all(codes[:, 0] == -1)


def test_lbp_hand_example():
    z = np.array([[5, 1, 9],
                  [2, 4, 4],
                  [7, 0, 3]], dtype=float)
    code = lbp_codes(z)[1, 1]
    # center 4; order E,SE,S,SW,W,NW,N,NE = 4,3,0,7,2,5,1,9
    # >=4:    E(4)=1 SE(3)=0 S(0)=0 SW(7)=1 W(2)=0 NW(5)=1 N(1)=0 NE(9)=1
    assert code == 0b10101001


def test_feature_stats_dataset(ray_session):
    import ray

    from rasters_ray import codec
    from rasters_ray.stages.features import feature_stats

    img = _square_img(6, 4).astype(np.float64)
    ds = ray.data.from_items([{
        "image_id": "i0",
        "bytes": codec.encode(img, "npy"),
        "fmt": "npy",
    }])
    row = feature_stats(ds).take_all()[0]
    r, c, resp = harris_peak(img)
    assert (row["peak_r"], row["peak_c"], row["peak_resp"]) == (r, c, resp)
    codes = lbp_codes(img)
    assert row["lbp_sum"] == int(codes[codes >= 0].sum())


def test_rle_row_stats_bruteforce():
    from rasters_ray.stages.features import rle_row_stats

    rng = np.random.default_rng(4)
    for trial in range(25):
        x = rng.integers(0, rng.integers(2, 6),
                         (rng.integers(1, 12), rng.integers(1, 18)))
        n, m, c = rle_row_stats(x)
        runs, const = [], 0
        for row in x:
            rl, cur = [], 1
            for i in range(1, len(row)):
                if row[i] == row[i - 1]:
                    cur += 1
                else:
                    rl.append(cur)
                    cur = 1
            rl.append(cur)
            runs += rl
            const += len(rl) == 1
        assert (n, m, c) == (len(runs), max(runs), const), trial
    # all-constant raster: one run per row, max = width, all rows const
    assert rle_row_stats(np.full((4, 9), 7)) == (4, 9, 4)
    # strictly alternating: w runs per row of length 1, none constant
    alt = np.tile(np.arange(6) % 2, (3, 1))
    assert rle_row_stats(alt) == (18, 1, 0)
    with pytest.raises(ValueError):
        rle_row_stats(np.zeros((0, 3)))
