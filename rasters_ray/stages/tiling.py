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
from ..grids import cellkey
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

    Assembly is fully array-at-a-time ACROSS images (VERDICT r2 #5): the
    covering-cell rule (cellkey.covering_cells), cell bounds
    (cellkey.cell_bounds), the window rule (GridSpec.windows_for_bboxes /
    index_points) and the sub-grid origin shift (GridSpec.subset) are
    inlined as per-tile numpy expressions over ragged-expanded arrays —
    float64 op ordering matches the scalar paths bit for bit. The
    antimeridian SPLIT branch of covering_cells is unreachable here:
    GridSpec.bbox always returns xmin <= xmax (straddlers clip at the
    world edge exactly as the per-image path did). Python touches only
    blob slicing (per-tile encode) and the cell-token format (memoized
    per distinct cell)."""
    import pyarrow.compute as pc

    n_img = batch.num_rows
    if n_img == 0:
        return _empty_tiles()
    grid_in = batch.column("grid")

    def gf(name, dtype):
        return pc.struct_field(grid_in, name).to_numpy(zero_copy_only=False).astype(dtype)

    x0 = gf("x_origin", np.float64)
    y0 = gf("y_origin", np.float64)
    cw = gf("cell_width", np.float64)
    ch = gf("cell_height", np.float64)
    rows = gf("rows", np.int64)
    cols = gf("cols", np.int64)

    # per-image bbox of cell corners (GridSpec.bbox)
    ex = x0 + cw * cols
    ey = y0 + ch * rows
    xmin = np.minimum(x0, ex)
    xmax = np.maximum(x0, ex)
    ymin = np.minimum(y0, ey)
    ymax = np.maximum(y0, ey)

    # covering-cell index ranges at ``level`` (cellkey.covering_cells)
    ncell = 1 << level
    w = 360.0 / ncell
    h = 180.0 / ncell
    ix0 = np.maximum(0, np.floor((xmin + 180.0) / w).astype(np.int64))
    ix1 = np.minimum(ncell - 1, np.floor((xmax + 180.0) / w - 1e-12).astype(np.int64))
    ix1 = np.maximum(ix1, ix0)
    iy0 = np.maximum(0, np.floor((90.0 - ymax) / h).astype(np.int64))
    iy1 = np.minimum(ncell - 1, np.floor((90.0 - ymin) / h - 1e-12).astype(np.int64))
    iy1 = np.maximum(iy1, iy0)

    # ragged expansion: one row per (image, covering cell), iy-major with
    # ix fastest — the meshgrid(ixs, iys).ravel() order of covering_cells
    nx = ix1 - ix0 + 1
    ny = iy1 - iy0 + 1
    cnt = nx * ny
    total = int(cnt.sum())
    if total == 0:
        return _empty_tiles()
    img = np.repeat(np.arange(n_img, dtype=np.int64), cnt)
    off = np.r_[np.int64(0), np.cumsum(cnt)[:-1]]
    o = np.arange(total, dtype=np.int64) - np.repeat(off, cnt)
    nx_t = np.repeat(nx, cnt)
    ix = np.repeat(ix0, cnt) + o % nx_t
    iy = np.repeat(iy0, cnt) + o // nx_t
    cid = (np.int64(level) << np.int64(56)) | (iy << np.int64(28)) | ix

    # cell bounds (cellkey.cell_bounds) clipped to the image bbox
    cxmin = -180.0 + ix * w
    cymax = 90.0 - iy * h
    bx0 = np.maximum(cxmin, xmin[img])
    by0 = np.maximum(cymax - h, ymin[img])
    bx1 = np.minimum(cxmin + w, xmax[img])
    by1 = np.minimum(cymax, ymax[img])

    # window rule (windows_for_bboxes / index_points, per-tile grid params)
    x0t, y0t, cwt, cht = x0[img], y0[img], cw[img], ch[img]
    rows_t, cols_t = rows[img], cols[img]
    row_start = np.rint((by1 - y0t) / cht - 0.5).astype(np.int64)
    col_start = np.rint((bx0 - x0t) / cwt - 0.5).astype(np.int64)
    row_end = np.rint((by0 - y0t) / cht - 0.5).astype(np.int64) + 1
    col_end = np.rint((bx1 - x0t) / cwt - 0.5).astype(np.int64) + 1
    valid = ~((row_end < 0) | (col_end < 0) | (row_start > rows_t) | (col_start > cols_t))
    row_start = np.clip(row_start, 0, rows_t)
    col_start = np.clip(col_start, 0, cols_t)
    row_end = np.clip(row_end, 0, rows_t)
    col_end = np.clip(col_end, 0, cols_t)
    hh = row_end - row_start
    ww = col_end - col_start
    keep = valid & (ww > 0) & (hh > 0)
    if not keep.any():
        return _empty_tiles()

    img_k = img[keep]
    cid = cid[keep]
    roc = row_start[keep]
    coc = col_start[keep]
    hhc = hh[keep]
    wwc = ww[keep]
    n_tiles = len(cid)
    # sub-grid origins: same float64 expressions as GridSpec.subset
    sx = x0[img_k] + coc * cw[img_k]
    sy = y0[img_k] + roc * ch[img_k]

    blobs_out: List = []
    if decode_pixels:
        blob_col = codec.BlobReader(batch.column("bytes"))  # zero-copy views
        fmts = batch.column("fmt").to_pylist()
        whole = (roc == 0) & (coc == 0) & (hhc == rows[img_k]) & (wwc == cols[img_k])
        cur = -1
        raw = None
        arr = None
        for k in range(n_tiles):  # tiles arrive image-sorted
            i = int(img_k[k])
            if i != cur:
                cur, raw, arr = i, blob_col[i], None
            if whole[k]:
                # the tile IS the image: pass the encoded blob through
                # unchanged — no decode, no re-encode, no extra
                # object-store bytes (the dominant tiling cost for
                # single-cell scenes)
                blobs_out.append(raw)
            else:
                if arr is None:
                    arr = codec.decode(raw, fmts[i])  # decoded lazily
                tile_px = arr[
                    ..., roc[k] : roc[k] + hhc[k], coc[k] : coc[k] + wwc[k]
                ]  # 2D or (bands, rows, cols)
                blobs_out.append(codec.encode(tile_px, fmts[i]))

    idx = pa.array(img_k)

    ids_col = batch.column("image_id").take(idx).combine_chunks()
    fmt_col = batch.column("fmt").take(idx).combine_chunks()

    # tile_id = "<cell token>/<image_id>": tokens memoized per distinct cell
    tok_memo: Dict[int, str] = {}
    toks = pa.array(
        [tok_memo.get(c) or tok_memo.setdefault(c, cellkey.token(int(c)))
         for c in cid.tolist()],
        pa.string(),
    )
    tile_ids = pc.binary_join_element_wise(toks, ids_col.cast(pa.string()), "/")

    if decode_pixels:
        bytes_col = pa.array(blobs_out, pa.binary())
    else:  # replicate one empty blob; no per-tile Python objects
        bytes_col = pa.array([b""], pa.binary()).take(
            pa.array(np.zeros(n_tiles, dtype=np.int64))
        )

    grid_struct = pa.StructArray.from_arrays(
        [
            pc.struct_field(grid_in, "crs").take(idx).combine_chunks(),
            pa.array(sx, pa.float64()),
            pa.array(sy, pa.float64()),
            pc.struct_field(grid_in, "cell_width").take(idx).combine_chunks(),
            pc.struct_field(grid_in, "cell_height").take(idx).combine_chunks(),
            pa.array(hhc.astype(np.int32), pa.int32()),
            pa.array(wwc.astype(np.int32), pa.int32()),
        ],
        fields=list(GRID_STRUCT),
    )
    return pa.Table.from_arrays(
        [
            tile_ids,
            pa.array(cid, pa.int64()),
            ids_col,
            pa.array(roc.astype(np.int32), pa.int32()),
            pa.array(coc.astype(np.int32), pa.int32()),
            pa.array(hhc.astype(np.int32), pa.int32()),
            pa.array(wwc.astype(np.int32), pa.int32()),
            bytes_col,
            fmt_col,
            batch.column("caption").take(idx).combine_chunks(),
            batch.column("phash").take(idx).combine_chunks(),
            grid_struct,
        ],
        schema=TILES_SCHEMA,
    )


def tile_images(images_ds, level: int, decode_pixels: bool = True, batch_size: int = 32):
    """Dataset[images] -> Dataset[tiles]; stateless map_batches."""
    return images_ds.map_batches(
        lambda t: make_tiles(t, level=level, decode_pixels=decode_pixels),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
