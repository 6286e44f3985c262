"""Morphology: brute-force window check and tiled == whole bit parity."""

import numpy as np
import pyarrow as pa

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
