"""Raster component labeling: run-min pass, local fixpoint vs BFS, and
the distributed tile+seam path vs a whole-image reference."""

import numpy as np
import pytest
import pyarrow as pa

from rasters_ray import codec
from rasters_ray.sources.images import make_oracle_images, oracle_pixels
from rasters_ray.stages.label import label_components, local_label


def _whole_image_reference(pxs: dict, threshold: float):
    """Single-task labeling of whole images -> set of stat tuples."""
    rows = set()
    for d, px in pxs.items():
        mask = px >= threshold
        rr, cc = np.meshgrid(
            np.arange(px.shape[0]), np.arange(px.shape[1]), indexing="ij"
        )
        ids = (
            (np.int64(d) << np.int64(32))
            | (rr.astype(np.int64) << np.int64(16))
            | cc.astype(np.int64)
        )
        lab = local_label(mask, ids)
        sel = lab >= 0
        for root in np.unique(lab[sel]):
            m = lab == root
            rows.add(
                (
                    f"img{d:08d}",
                    int((root >> 16) & 0xFFFF),
                    int(root & 0xFFFF),
                    int(m.sum()),
                    int(rr[m].min()),
                    int(rr[m].max()),
                    int(cc[m].min()),
                    int(cc[m].max()),
                )
            )
    return rows


def test_label_components_matches_whole_image(ray_session):
    import ray.data as rd

    imgs = make_oracle_images(np.arange(2, dtype=np.int64))
    ds = rd.from_arrow(imgs).repartition(2)
    got = label_components(ds, threshold=220.0, tile=16).to_pandas()
    want = _whole_image_reference(
        {d: oracle_pixels(d) for d in range(2)}, 220.0
    )
    got_rows = {
        tuple(r)
        for r in got[
            ["image_id", "comp_r", "comp_c", "n_px", "rmin", "rmax", "cmin", "cmax"]
        ].itertuples(index=False)
    }
    assert got_rows == want


def test_label_components_sparse_mask(ray_session):
    """Threshold 235: ~160 small components per image, many singletons
    never touching a seam (exercises the left-outer default-root path)."""
    import ray.data as rd

    imgs = make_oracle_images(np.arange(1, dtype=np.int64))
    ds = rd.from_arrow(imgs).repartition(1)
    got = label_components(ds, threshold=235.0, tile=32).to_pandas()
    want = _whole_image_reference({0: oracle_pixels(0)}, 235.0)
    got_rows = {
        tuple(r)
        for r in got[
            ["image_id", "comp_r", "comp_c", "n_px", "rmin", "rmax", "cmin", "cmax"]
        ].itertuples(index=False)
    }
    assert got_rows == want
    assert len(got) > 100


def test_local_label_all_masked_single_component():
    mask = np.ones((8, 8), bool)
    ids = np.arange(64, dtype=np.int64).reshape(8, 8)
    lab = local_label(mask, ids)
    assert (lab == 0).all()


def test_local_label_empty():
    mask = np.zeros((5, 5), bool)
    ids = np.arange(25, dtype=np.int64).reshape(5, 5)
    assert (local_label(mask, ids) == -1).all()


def test_sieve_filter_island_and_threshold():
    import numpy as np

    from rasters_ray.stages.label import sieve_filter

    stripes = np.tile(np.arange(16) // 4, (16, 1))
    cls = stripes.copy()
    cls[5, 1] = 9
    cls[5, 2] = 9
    out, n = sieve_filter(cls, 3)
    assert n == 2 and (out == stripes).all()
    out2, n2 = sieve_filter(cls, 2)  # size == threshold: kept
    assert n2 == 0 and out2[5, 1] == 9


def test_sieve_filter_largest_neighbor_and_ties():
    import numpy as np

    from rasters_ray.stages.label import sieve_filter

    # island adjacent to a 15-px region (value 0) and a 12-px (value 2)
    cls = np.zeros((4, 7), int)
    cls[:, 4:] = 2
    cls[1, 3] = 5
    out, n = sieve_filter(cls, 2)
    assert n == 1 and out[1, 3] == 0
    # 5-px zeros vs 6-px twos around a 1-px island: larger (2) wins
    cls3 = np.array([[0, 0, 2, 2],
                     [0, 7, 2, 2],
                     [0, 0, 2, 2]])
    out3, n3 = sieve_filter(cls3, 2)
    assert n3 == 1 and out3[1, 1] == 2
    # exact size tie (6 px vs 6 px): smaller min-(r,c) anchor wins -> 0
    cls4 = np.array([[0, 0, 7, 2, 2],
                     [0, 0, 7, 2, 2],
                     [0, 0, 7, 2, 2]])
    out4, n4 = sieve_filter(cls4, 4)
    assert n4 == 3 and (out4[:, 2] == 0).all()


def test_sieve_filter_no_neighbor_and_errors():
    import numpy as np
    import pytest

    from rasters_ray.stages.label import sieve_filter

    one = np.full((2, 2), 3)
    out, n = sieve_filter(one, 10)  # single region, no neighbour
    assert n == 0 and (out == 3).all()
    with pytest.raises(ValueError):
        sieve_filter(np.zeros(5, int), 2)


def test_landscape_metrics_bruteforce():
    from rasters_ray.stages.label import landscape_metrics

    rng = np.random.default_rng(7)
    cls = rng.integers(0, 4, (10, 12))
    t = landscape_metrics(cls)
    got = {r["class"]: (r["n_px"], r["edge_len"], r["n_core"])
           for r in t.to_pylist()}
    H, W = cls.shape
    for x in range(4):
        npx = int((cls == x).sum())
        edge = 0
        core = 0
        for r in range(H):
            for c in range(W):
                if cls[r, c] != x:
                    continue
                for dr, dc in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                    rr, cc = r + dr, c + dc
                    if 0 <= rr < H and 0 <= cc < W and cls[rr, cc] != x:
                        edge += 1
                if (0 < r < H - 1 and 0 < c < W - 1
                        and cls[r - 1, c] == x and cls[r + 1, c] == x
                        and cls[r, c - 1] == x and cls[r, c + 1] == x):
                    core += 1
        if npx:
            assert got[x] == (npx, edge, core), x
        else:
            assert x not in got
    # uniform raster: zero edge, all-interior core
    u = landscape_metrics(np.zeros((5, 6), dtype=np.int64)).to_pylist()
    assert u == [{"class": 0, "n_px": 30, "edge_len": 0, "n_core": 12}]
    with pytest.raises(ValueError):
        landscape_metrics(np.zeros((4, 4)))  # float classes
