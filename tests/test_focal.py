"""Focal statistics, pixel histogram, image moments, hash split.

The halo-exchange tiled focal path is asserted BIT-EQUAL to the
single-task whole-image path (the property the distributed stencil must
hold); everything else is checked against independent numpy brute force.
"""

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray.sources.images import make_oracle_images, oracle_pixels
from rasters_ray.stages.focal import (
    box_filter_sum,
    focal_halo_tiled,
    focal_stats,
    image_moments,
    pixel_histogram,
)


def _ds(table: pa.Table, blocks: int = 4):
    import ray.data as rd

    return rd.from_arrow(table).repartition(blocks)


def _imgs(n=6):
    return make_oracle_images(np.arange(n, dtype=np.int64))


def test_box_filter_sum_brute_force():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 251, (23, 31)).astype(np.float64)
    a[rng.random(a.shape) < 0.15] = np.nan
    for R in (1, 3):
        fs, nn = box_filter_sum(a, R)
        for i, j in [(0, 0), (0, 30), (22, 0), (11, 15), (22, 30)]:
            w = a[max(i - R, 0) : i + R + 1, max(j - R, 0) : j + R + 1]
            v = w[np.isfinite(w)]
            assert nn[i, j] == v.size
            assert fs[i, j] == pytest.approx(v.sum())


def test_focal_halo_equals_whole_image(ray_session):
    imgs = _imgs(5)
    whole = (
        focal_stats(_ds(imgs, 3), radius=2, step=7)
        .to_pandas()
        .sort_values(["image_id", "r", "c"])
        .reset_index(drop=True)
    )
    # tile=16 with 100x100 images -> ragged edge tiles + plenty of halo
    tiled = (
        focal_halo_tiled(_ds(imgs, 3), radius=2, step=7, tile=16)
        .to_pandas()
        .sort_values(["image_id", "r", "c"])
        .reset_index(drop=True)
    )
    assert len(whole) == len(tiled) == 5 * 15 * 15
    assert whole.equals(tiled)


def test_focal_halo_radius_guard():
    with pytest.raises(ValueError):
        focal_halo_tiled(None, radius=16, tile=16)


def test_pixel_histogram_vs_numpy(ray_session):
    imgs = _imgs(6)
    got = pixel_histogram(_ds(imgs, 3), n_bins=32, lo=0.0, hi=256.0).to_pandas()
    got = got.sort_values("bin").reset_index(drop=True)
    all_px = np.concatenate([oracle_pixels(d).ravel() for d in range(6)])
    exp = np.bincount((all_px // 8).astype(np.int64), minlength=32)
    keep = np.flatnonzero(exp)
    assert got["bin"].to_numpy().tolist() == keep.tolist()
    assert got["n_px"].to_numpy().tolist() == exp[keep].tolist()


def test_image_moments_vs_numpy(ray_session):
    imgs = _imgs(4)
    got = (
        image_moments(_ds(imgs, 2))
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    for d in range(4):
        px = oracle_pixels(d).astype(np.int64)
        row = got.iloc[d]
        assert row["image_id"] == f"img{d:08d}"
        assert row["n_px"] == px.size
        assert row["sum_value"] == px.sum()
        assert row["sum_sq"] == (px * px).sum()
        assert row["vmin"] == px.min()
        assert row["vmax"] == px.max()


def test_hash_split_deterministic_and_partition_invariant(ray_session):
    from rasters_ray.text import hash_bucket, hash_split

    docs = pa.table({"doc_id": pa.array(np.arange(300, dtype=np.int64))})
    a = hash_split(_ds(docs, 2)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = hash_split(_ds(docs, 7)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)  # block layout cannot change membership
    assert set(a["split"]) == {"train", "val", "test"}
    for _, row in a.iloc[:20].iterrows():
        assert row["bucket"] == hash_bucket(int(row["doc_id"]))
        exp = "train" if row["bucket"] < 80 else ("val" if row["bucket"] < 90 else "test")
        assert row["split"] == exp
    # ratios roughly honored (md5 is uniform)
    frac_train = (a["split"] == "train").mean()
    assert 0.7 < frac_train < 0.9


def test_hash_split_bad_ratio_guard():
    from rasters_ray.text import hash_split

    with pytest.raises(ValueError):
        hash_split(None, train_pct=95, val_pct=10)


def test_focal_halo_large_raster(ray_session):
    """The scale path at non-toy size: one 1200x900 raster, 256-px tiles
    with halos — the tile lattice is genuinely multi-row/column and the
    interior equals the single-task integral-image result exactly."""
    import pyarrow as pa

    from rasters_ray.codec import encode
    from rasters_ray.grids.gridspec import GridSpec  # noqa: F401  (schema parity)

    rng = np.random.default_rng(21)
    px = rng.integers(0, 251, (1200, 900)).astype(np.float32)
    img = pa.table(
        {
            "image_id": pa.array(["big0"], pa.string()),
            "bytes": pa.array([encode(px, "npy")], pa.binary()),
            "fmt": pa.array(["npy"], pa.string()),
        }
    )
    whole = (
        focal_stats(_ds(img, 1), radius=3, step=97)
        .to_pandas()
        .sort_values(["r", "c"])
        .reset_index(drop=True)
    )
    tiled = (
        focal_halo_tiled(_ds(img, 1), radius=3, step=97, tile=256)
        .to_pandas()
        .sort_values(["r", "c"])
        .reset_index(drop=True)
    )
    assert len(whole) == len(tiled) == 13 * 10  # ceil(1200/97) x ceil(900/97)
    assert whole.equals(tiled)


def test_rank_filter_bruteforce():
    import numpy as np

    from rasters_ray.stages.focal import rank_filter

    rng = np.random.default_rng(7)
    z = rng.integers(-40, 40, (11, 13)).astype(float)
    med, mn, mx, valid = rank_filter(z)
    assert valid.all()
    for i in range(1, 10):
        for j in range(1, 12):
            w = np.sort(z[i - 1:i + 2, j - 1:j + 2].ravel())
            assert med[i - 1, j - 1] == w[4]
            assert mn[i - 1, j - 1] == w[0]
            assert mx[i - 1, j - 1] == w[8]


def test_rank_filter_ramp_median_is_center():
    # symmetric difference set on a linear ramp: median == center,
    # min/max are center -/+ (|a|+|b|)
    import numpy as np

    from rasters_ray.stages.focal import rank_filter

    r, c = np.indices((8, 8))
    for a in (1, 3):
        for b in (2, 5):
            z = (a * r + b * c).astype(float)
            med, mn, mx, _ = rank_filter(z)
            zc = z[1:-1, 1:-1].astype(np.int64)
            assert np.array_equal(med, zc)
            assert np.array_equal(mn, zc - (a + b))
            assert np.array_equal(mx, zc + (a + b))


def test_rank_filter_nan_and_shape():
    import numpy as np
    import pytest

    from rasters_ray.stages.focal import rank_filter

    z = np.ones((6, 6))
    z[2, 3] = np.nan
    _, _, _, valid = rank_filter(z)
    assert not valid[1, 2] and not valid[2, 3 - 1 + 1]
    assert valid[3, 0]
    with pytest.raises(ValueError):
        rank_filter(np.zeros((1, 9)))


def test_tophat_bruteforce():
    from rasters_ray.stages.focal import tophat

    rng = np.random.default_rng(2)
    a = rng.integers(0, 50, (12, 14)).astype(np.int64)
    white, black = tophat(a)
    assert white.shape == (8, 10) and black.shape == (8, 10)
    H, W = a.shape
    ero = np.zeros((H, W), dtype=np.int64)
    dil = np.zeros((H, W), dtype=np.int64)
    for r in range(1, H - 1):
        for c in range(1, W - 1):
            ero[r, c] = a[r - 1 : r + 2, c - 1 : c + 2].min()
            dil[r, c] = a[r - 1 : r + 2, c - 1 : c + 2].max()
    for r in range(2, H - 2):
        for c in range(2, W - 2):
            opn = ero[r - 1 : r + 2, c - 1 : c + 2].max()
            cls = dil[r - 1 : r + 2, c - 1 : c + 2].min()
            assert white[r - 2, c - 2] == a[r, c] - opn
            assert black[r - 2, c - 2] == cls - a[r, c]
    assert (white >= 0).all() and (black >= 0).all()


def test_tophat_flat_and_spike():
    from rasters_ray.stages.focal import tophat

    # a flat surface has zero top-hats
    flat = np.full((8, 8), 7, dtype=np.int64)
    w, b = tophat(flat)
    assert not w.any() and not b.any()
    # a single bright spike in the interior survives opening removal:
    # white top-hat recovers exactly the spike height at its cell
    spike = np.zeros((9, 9), dtype=np.int64)
    spike[4, 4] = 13
    w, b = tophat(spike)
    assert w[2, 2] == 13 and w.sum() == 13
    # a dark pit is the dual: black top-hat recovers the depth
    pit = np.full((9, 9), 20, dtype=np.int64)
    pit[4, 4] = 6
    w, b = tophat(pit)
    assert b[2, 2] == 14 and b.sum() == 14
    with pytest.raises(ValueError):
        tophat(np.zeros((4, 9)))
    with pytest.raises(ValueError):
        tophat(np.array([[1.5] * 5] * 5))
