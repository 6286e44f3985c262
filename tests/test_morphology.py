"""Morphology: brute-force window check and tiled == whole bit parity."""

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray.sources.images import make_oracle_images, oracle_pixels
from rasters_ray.stages.morphology import morphology_halo_tiled, morphology_stats


def _ds(table: pa.Table, blocks: int = 2):
    import ray.data as rd

    return rd.from_arrow(table).repartition(blocks)


def test_morphology_brute_force(ray_session):
    imgs = make_oracle_images(np.arange(1, dtype=np.int64))
    df = morphology_stats(_ds(imgs, 1), threshold=200.0, radius=1, step=9).to_pandas()
    px = oracle_pixels(0)
    mask = px >= 200.0
    for row in df.itertuples():
        r, c = row.r, row.c
        w = mask[max(r - 1, 0) : r + 2, max(c - 1, 0) : c + 2]
        assert row.n_masked == int(w.sum())
        assert row.n_nbr == w.size
        assert row.dilated == int(w.any())
        assert row.eroded == int(w.all())


def test_morphology_tiled_equals_whole(ray_session):
    imgs = make_oracle_images(np.arange(3, dtype=np.int64))
    kw = dict(threshold=220.0, radius=2, step=7)
    whole = (
        morphology_stats(_ds(imgs), **kw)
        .to_pandas()
        .sort_values(["image_id", "r", "c"])
        .reset_index(drop=True)
    )
    tiled = (
        morphology_halo_tiled(_ds(imgs), tile=16, **kw)
        .to_pandas()
        .sort_values(["image_id", "r", "c"])
        .reset_index(drop=True)
    )
    assert len(whole) == len(tiled) > 0
    for col in whole.columns:
        assert (whole[col] == tiled[col]).all(), col


def test_skeletonize_bar_exhaustive_over_query_keyspace():
    # the exact construction q_skeleton uses: a 5-wide bar at
    # (r0, c0) of length L thins to the single centerline row r0+2,
    # cols [c0+2, c0+L-4] — every (r0, c0, L) combo of the keyspace
    from rasters_ray.stages.morphology import skeletonize

    for r0 in range(1, 7):
        for c0 in range(1, 4):
            for L in range(6, 14):
                m = np.zeros((16, 16), dtype=bool)
                m[r0:r0 + 5, c0:c0 + L] = True
                sk = skeletonize(m)
                expect = np.zeros((16, 16), dtype=bool)
                expect[r0 + 2, c0 + 2:c0 + L - 3] = True
                assert np.array_equal(sk, expect), (r0, c0, L)


def test_skeletonize_idempotent_and_preserves_line():
    from rasters_ray.stages.morphology import skeletonize

    m = np.zeros((12, 12), dtype=bool)
    m[3:8, 2:10] = True
    sk = skeletonize(m)
    assert np.array_equal(skeletonize(sk), sk)
    # a 1-pixel line is already a skeleton
    line = np.zeros((9, 9), dtype=bool)
    line[4, 1:8] = True
    assert np.array_equal(skeletonize(line), line)
    # empty stays empty
    assert not skeletonize(np.zeros((5, 5), dtype=bool)).any()


def test_mode_filter_speckle_and_ties():
    from rasters_ray.stages.focal import mode_filter

    # a single flipped pixel inside a solid half gets outvoted
    lab = np.zeros((8, 8), dtype=np.int64)
    lab[:, 4:] = 1
    lab[3, 1] = 1
    out = mode_filter(lab, 2)
    assert out[3, 1] == 0
    clean = np.zeros((8, 8), dtype=np.int64)
    clean[:, 4:] = 1
    assert np.array_equal(out, clean)
    # checkerboard: the center always attains the window max (5 vs 4
    # interior; ties on edges) -> unchanged
    r, c = np.indices((8, 8))
    ck = ((r + c) % 2).astype(np.int64)
    assert np.array_equal(mode_filter(ck, 2), ck)
    # width-1 stripes: three-way tie includes the center -> unchanged
    stripes = np.tile(np.arange(6) % 3, (6, 1)).astype(np.int64)
    assert np.array_equal(mode_filter(stripes, 3), stripes)


def test_mode_filter_validation_and_corner():
    from rasters_ray.stages.focal import mode_filter

    with pytest.raises(ValueError):
        mode_filter(np.array([[0, 3]]), 3)
    with pytest.raises(ValueError):
        mode_filter(np.zeros(4, dtype=np.int64), 2)
    # corner cell sees only its 2x2 in-raster window
    lab = np.zeros((4, 4), dtype=np.int64)
    lab[0, 0] = 1
    assert mode_filter(lab, 2)[0, 0] == 0  # 1 vs 3 zeros
