"""Georeferenced image sinks (world-file sidecars)."""

import os

import numpy as np
import pytest

from rasters_ray import codec
from rasters_ray.grids import GridSpec
from rasters_ray.sources.geoimage import world_file_text, write_geoimages
from rasters_ray.sources.images import make_oracle_images


def test_world_file_text():
    g = GridSpec(crs="EPSG:4326", x_origin=-124.0, y_origin=44.0,
                 cell_width=0.01, cell_height=-0.01, rows=10, cols=20)
    lines = world_file_text(g).strip().splitlines()
    assert [float(x) for x in lines] == [0.01, 0.0, 0.0, -0.01, -123.995, 43.995]


def test_write_geoimages(ray_session, tmp_path):
    import ray.data as rd

    tab = make_oracle_images(np.arange(3))
    out = write_geoimages(
        rd.from_arrow(tab), str(tmp_path), out_fmt="png", cmap="viridis"
    ).to_pandas()
    assert len(out) == 3
    for _, row in out.iterrows():
        assert os.path.exists(row["path"]) and row["n_bytes"] > 0
        img = codec.decode(open(row["path"], "rb").read(), "png")
        assert img.shape == (100, 100, 3)  # colormapped RGB
        base = row["path"][:-4]
        wf = open(base + ".pgw").read().strip().splitlines()
        assert len(wf) == 6 and float(wf[0]) > 0 and float(wf[3]) < 0
        assert open(base + ".crs").read().strip() == "EPSG:4326"
    # jpeg flavor
    outj = write_geoimages(
        rd.from_arrow(tab), str(tmp_path / "j"), out_fmt="jpg"
    ).to_pandas()
    p = outj["path"][0]
    assert p.endswith(".jpg") and os.path.exists(p[:-4] + ".jgw")
    img = codec.decode(open(p, "rb").read(), "jpg")
    assert img.shape == (100, 100)
