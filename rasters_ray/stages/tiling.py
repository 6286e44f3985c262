"""Tiling — the flagship operator: images -> covering-cell tiles.

Re-expresses the reference's geometry->window subsetting
(raster_grid.py:737-833, the spatial clip primitive) as a streaming Ray
Data stage: each image row is assigned the compact covering cells of its
footprint at a tile level (the H3/S2-style tile key of the north rule),
and for every covering cell the pixel window intersecting that cell is
sliced out, re-encoded and emitted as a tile row.

The stage is a stateless ``map_batches`` flat transform (more output rows
than input rows): pure vectorized numpy per image, Arrow in / Arrow out.
Captions, image_id and phash ride along byte-identical (the input_hint
invariant).

Output schema (SURVEY.md §1.4 `tiles`):
    tile_id:string, cell_key:int64, image_id:string, row_off:int32,
    col_off:int32, th:int32, tw:int32, bytes:binary, fmt:string,
    caption:string, phash:int64, grid:struct<...>  (the SUBSET grid)
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pyarrow as pa

from .. import codec
from ..grids import GridSpec, Window, cellkey
from ..sources.images import GRID_STRUCT

TILES_SCHEMA = pa.schema(
    [
        ("tile_id", pa.string()),
        ("cell_key", pa.int64()),
        ("image_id", pa.string()),
        ("row_off", pa.int32()),
        ("col_off", pa.int32()),
        ("th", pa.int32()),
        ("tw", pa.int32()),
        ("bytes", pa.binary()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("grid", GRID_STRUCT),
    ]
)


def _empty_tiles() -> pa.Table:
    return TILES_SCHEMA.empty_table()


def make_tiles(batch: pa.Table, level: int, decode_pixels: bool = True) -> pa.Table:
    """One input image row -> one tile row per covering cell at ``level``.

    With decode_pixels=False only tile METADATA is emitted (bytes stays
    empty) — the metadata-only path for joins that never need pixels
    (mirrors RasterGrid.open reading georeferencing only,
    raster_grid.py:151-202).
    """
    out: Dict[str, List] = {name: [] for name in TILES_SCHEMA.names}
    grids = batch.column("grid").to_pylist()
    image_ids = batch.column("image_id").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    captions = batch.column("caption").to_pylist()
    phashes = batch.column("phash").to_pylist()
    blob_col = batch.column("bytes") if decode_pixels else None

    for i in range(batch.num_rows):
        grid = GridSpec.from_dict(grids[i])
        bbox = grid.bbox
        cells = cellkey.covering_cells(level, bbox)
        arr = None  # decoded lazily: only when some tile is a proper subset
        raw = None
        # vectorized window rule over ALL covering cells at once (the
        # scalar per-cell window() path was the profile's second-largest
        # cost after encode)
        cxmin, cymin, cxmax, cymax = cellkey.cell_bounds(np.asarray(cells, dtype=np.int64))
        ro, co, hh, ww, valid = grid.windows_for_bboxes(
            np.maximum(cxmin, bbox[0]),
            np.maximum(cymin, bbox[1]),
            np.minimum(cxmax, bbox[2]),
            np.minimum(cymax, bbox[3]),
        )
        for k, cid in enumerate(cells):
            if not valid[k] or ww[k] <= 0 or hh[k] <= 0:
                continue
            win = Window(
                col_off=int(co[k]), row_off=int(ro[k]), width=int(ww[k]), height=int(hh[k])
            )
            sub = grid.subset(win)
            if decode_pixels:
                if raw is None:
                    raw = blob_col[i].as_py()
                whole = (
                    win.row_off == 0
                    and win.col_off == 0
                    and win.height == grid.rows
                    and win.width == grid.cols
                )
                if whole:
                    # the tile IS the image: pass the encoded blob through
                    # unchanged — no decode, no re-encode, no extra
                    # object-store bytes (the dominant tiling cost for
                    # single-cell scenes)
                    blob = raw
                else:
                    if arr is None:
                        arr = codec.decode(raw, fmts[i])
                    rs, cs = win.toslices()
                    tile_px = arr[..., rs, cs]  # 2D or (bands, rows, cols)
                    blob = codec.encode(tile_px, fmts[i])
            else:
                blob = b""
            out["tile_id"].append(f"{cellkey.token(int(cid))}/{image_ids[i]}")
            out["cell_key"].append(int(cid))
            out["image_id"].append(image_ids[i])
            out["row_off"].append(win.row_off)
            out["col_off"].append(win.col_off)
            out["th"].append(win.height)
            out["tw"].append(win.width)
            out["bytes"].append(blob)
            out["fmt"].append(fmts[i])
            out["caption"].append(captions[i])
            out["phash"].append(phashes[i])
            out["grid"].append({k: v for k, v in sub.to_dict().items() if k != "type"})
    if not out["tile_id"]:
        return _empty_tiles()
    return pa.Table.from_pydict(
        {name: pa.array(out[name], TILES_SCHEMA.field(name).type) for name in TILES_SCHEMA.names}
    )


def tile_images(images_ds, level: int, decode_pixels: bool = True, batch_size: int = 32):
    """Dataset[images] -> Dataset[tiles]; stateless map_batches."""
    return images_ds.map_batches(
        lambda t: make_tiles(t, level=level, decode_pixels=decode_pixels),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
