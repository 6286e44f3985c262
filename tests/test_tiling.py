"""Tiling stage: covering-cell assignment + window slicing + pixel/caption
fidelity (no Ray needed — the batch fn is pure)."""

import numpy as np
import pyarrow as pa

from rasters_ray import codec
from rasters_ray.grids import GridSpec, cellkey
from rasters_ray.sources import make_fixture_images, make_oracle_images
from rasters_ray.stages import make_tiles


def test_tiles_cover_image_and_preserve_pixels():
    t = make_oracle_images(np.arange(4))
    tiles = make_tiles(t, level=9)  # level-9 cells are ~0.7deg; images 1deg
    assert tiles.num_rows > 4  # images straddle cell borders -> multiple tiles

    # reassemble each image from its tiles and compare pixels exactly
    for d in range(4):
        img_id = f"img{d:08d}"
        src = codec.decode(t.column("bytes")[d].as_py(), "npy")
        mask = np.zeros(src.shape, dtype=bool)
        sel = tiles.filter(pa.compute.equal(tiles.column("image_id"), img_id))
        for i in range(sel.num_rows):
            r0 = sel.column("row_off")[i].as_py()
            c0 = sel.column("col_off")[i].as_py()
            th = sel.column("th")[i].as_py()
            tw = sel.column("tw")[i].as_py()
            tile_px = codec.decode(sel.column("bytes")[i].as_py(), sel.column("fmt")[i].as_py())
            assert tile_px.shape == (th, tw)
            np.testing.assert_array_equal(tile_px, src[r0 : r0 + th, c0 : c0 + tw])
            mask[r0 : r0 + th, c0 : c0 + tw] = True
            # caption rides through byte-identical
            assert sel.column("caption")[i].as_py() == t.column("caption")[d].as_py()
        assert mask.all()  # full coverage


def test_tile_grid_origin_shift():
    t = make_oracle_images(np.arange(1))
    tiles = make_tiles(t, level=9)
    g0 = GridSpec.from_dict(t.column("grid")[0].as_py())
    for i in range(tiles.num_rows):
        sub = tiles.column("grid")[i].as_py()
        c0 = tiles.column("col_off")[i].as_py()
        r0 = tiles.column("row_off")[i].as_py()
        assert sub["x_origin"] == g0.x_origin + c0 * g0.cell_width
        assert sub["y_origin"] == g0.y_origin + r0 * g0.cell_height
        # tile footprint is inside its cell (+1 window rule can push one
        # pixel row/col past the cell edge; allow cell_size slack)
        xmin, ymin, xmax, ymax = cellkey.cell_bounds(
            tiles.column("cell_key")[i].as_py()
        )
        assert sub["x_origin"] >= xmin - g0.cell_width
        assert sub["x_origin"] + sub["cols"] * g0.cell_width <= xmax + g0.cell_width


def test_metadata_only_tiles():
    t = make_fixture_images(np.arange(8))
    tiles = make_tiles(t, level=8, decode_pixels=False)
    assert tiles.num_rows >= 8
    assert all(len(b.as_py()) == 0 for b in tiles.column("bytes"))


def test_degenerate_1x1_image():
    t = make_fixture_images(np.arange(1))  # row 0 is 1x1
    tiles = make_tiles(t, level=8)
    assert tiles.num_rows == 1
    px = codec.decode(tiles.column("bytes")[0].as_py(), tiles.column("fmt")[0].as_py())
    assert px.shape == (1, 1)


def test_antimeridian_image_tiles():
    # image 36 in the fixture profile straddles 180 deg
    t = make_fixture_images(np.arange(36, 37))
    tiles = make_tiles(t, level=8)
    assert tiles.num_rows >= 1
