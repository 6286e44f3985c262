"""Digital Hough line voting."""

import numpy as np
import pytest

from rasters_ray.stages.hough import hough_accumulate, hough_peak


def test_accumulators_four_directions():
    m = np.zeros((8, 8), dtype=bool)
    m[3, 2:7] = True  # horizontal run of 5
    acc = hough_accumulate(m)
    assert acc[0][3] == 5 and acc[0].sum() == 5
    assert np.all(acc[1][2:7] == 1)
    assert acc[2][3 + 2] == 1 and acc[2][3 + 6] == 1
    assert acc[3][2 - 3 + 7] == 1
    assert hough_peak(m) == (0, 3, 5)


def test_diagonal_peaks():
    m = np.eye(9, dtype=bool)  # main diagonal c - r = 0 -> bin h-1
    assert hough_peak(m) == (3, 8, 9)
    m = np.fliplr(np.eye(9, dtype=bool))  # r + c = 8
    assert hough_peak(m) == (2, 8, 9)


def test_vertical_and_ties():
    m = np.zeros((6, 6), dtype=bool)
    m[1:5, 4] = True
    assert hough_peak(m) == (1, 4, 4)
    # a single pixel ties all four directions at count 1: direction 0
    # wins, bin = its row
    m = np.zeros((5, 5), dtype=bool)
    m[2, 3] = True
    assert hough_peak(m) == (0, 2, 1)
    with pytest.raises(ValueError):
        hough_peak(np.zeros((3, 3), dtype=bool))


def test_hough_stats_dataset(ray_session):
    import ray

    from rasters_ray import codec
    from rasters_ray.stages.hough import hough_stats

    px = np.zeros((16, 16))
    px[5, 3:12] = 9.0
    ds = ray.data.from_items([{
        "image_id": "i0",
        "bytes": codec.encode(px, "npy"),
        "fmt": "npy",
    }])
    row = hough_stats(ds, threshold=1.0).take_all()[0]
    assert (row["peak_dir"], row["peak_bin"], row["peak_count"]) == (0, 5, 9)
    assert row["n_on"] == 9
