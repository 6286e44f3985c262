"""Adaptive mean-C thresholding vs a loop reference."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from rasters_ray.stages.focal import adaptive_threshold_bands, box_filter_sum


def test_adaptive_threshold_matches_loops(ray_session):
    rng = np.random.default_rng(4)
    z = rng.integers(0, 251, (30, 30)).astype(np.int64)
    R, C = 3, 2
    fsum, n = box_filter_sum(z, R)
    fired = (z - C) * n > fsum.astype(np.int64)
    for i in (0, 3, 15, 29):
        for j in (0, 7, 29):
            w = z[max(0, i - R): i + R + 1, max(0, j - R): j + R + 1]
            assert fired[i, j] == ((z[i, j] - C) * w.size > w.sum())

    from rasters_ray import codec
    t = pa.table(
        {
            "image_id": pa.array(["t0"], pa.string()),
            "bytes": pa.array([codec.encode(z.astype(np.float32), "npy")],
                              pa.binary()),
            "fmt": pa.array(["npy"], pa.string()),
        }
    )
    out = (
        adaptive_threshold_bands(rd.from_arrow(t), radius=R, c=C, band=10)
        .to_pandas()
        .set_index("band")["n_set"]
    )
    bands = np.arange(30) // 10
    for b in range(3):
        assert out[b] == int(fired[bands == b].sum())
