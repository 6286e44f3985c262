"""Raster component labeling: run-min pass, local fixpoint vs BFS, and
the distributed tile+seam path vs a whole-image reference."""

import numpy as np
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
