"""Overview pyramids: block stats vs numpy brute force, blob round-trip,
grid rescale, NaN blocks."""

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray import codec
from rasters_ray.sources.images import make_oracle_images, oracle_pixels
from rasters_ray.stages.pyramid import (
    block_reduce_sums,
    overview_images,
    overview_stats,
)


def _ds(table: pa.Table, blocks: int = 3):
    import ray.data as rd

    return rd.from_arrow(table).repartition(blocks)


def test_block_reduce_sums_brute_force():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 251, (23, 31)).astype(np.float64)
    a[rng.random(a.shape) < 0.2] = np.nan
    for f in (2, 4, 8):
        s, n = block_reduce_sums(a, f)
        assert s.shape == ((23 + f - 1) // f, (31 + f - 1) // f)
        for by in range(s.shape[0]):
            for bx in range(s.shape[1]):
                w = a[by * f : (by + 1) * f, bx * f : (bx + 1) * f]
                v = w[np.isfinite(w)]
                assert n[by, bx] == v.size
                assert s[by, bx] == pytest.approx(v.sum() if v.size else 0.0)


def test_overview_stats_values(ray_session):
    imgs = make_oracle_images(np.arange(3, dtype=np.int64))
    df = overview_stats(_ds(imgs), levels=(1, 3)).to_pandas()
    # level 1: 50x50 blocks; level 3: 13x13 (ragged edges at 100/8)
    assert len(df) == 3 * (50 * 50 + 13 * 13)
    px = oracle_pixels(1)
    row = df[
        (df.image_id == "img00000001")
        & (df.level == 3)
        & (df.by == 12)
        & (df.bx == 12)
    ].iloc[0]
    w = px[96:100, 96:100]
    assert row.n_px == 16
    assert row.psum == int(w.sum())
    assert row["mean"] == w.sum() / 16


def test_overview_images_roundtrip(ray_session):
    imgs = make_oracle_images(np.arange(2, dtype=np.int64))
    out = overview_images(_ds(imgs, 2), levels=(1, 2)).to_arrow_refs()
    import ray

    t = pa.concat_tables([ray.get(r) for r in out])
    assert t.num_rows == 4
    blobs = codec.BlobReader(t.column("bytes"))
    lv = t.column("level").to_pylist()
    ids = t.column("image_id").to_pylist()
    grids = t.column("grid").to_pylist()
    for i in range(t.num_rows):
        d = int(ids[i][3:])
        f = 1 << lv[i]
        px = oracle_pixels(d).astype(np.float64)
        s, n = block_reduce_sums(px, f)
        want = (s / n).astype(np.float32)
        got = codec.decode(blobs[i], "npy")
        np.testing.assert_array_equal(got, want)
        assert grids[i]["cell_width"] == 0.01 * f
        assert grids[i]["rows"] == got.shape[0]


def test_overview_images_nan_block(ray_session):
    px = np.full((4, 4), np.nan, dtype=np.float32)
    px[0, 0] = 8.0
    t = pa.table(
        {
            "image_id": pa.array(["a"], pa.string()),
            "bytes": pa.array([codec.encode(px, "npy")], pa.binary()),
            "fmt": pa.array(["npy"], pa.string()),
        }
    )
    df = overview_stats(_ds(t, 1), levels=(1,)).to_pandas()
    assert len(df) == 4
    top = df[(df.by == 0) & (df.bx == 0)].iloc[0]
    assert top.n_px == 1 and top.psum == 8 and top["mean"] == 8.0
    empty = df[(df.by == 1) & (df.bx == 1)].iloc[0]
    assert empty.n_px == 0 and np.isnan(empty["mean"])


def test_levels_validation():
    with pytest.raises(ValueError):
        overview_stats(None, levels=(0,))
