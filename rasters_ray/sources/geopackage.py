"""GeoPackage raster-tiles sink (stdlib sqlite3 — no GDAL needed).

Parity target: ``Raster.to_geopackage`` (reference raster.py:1715-1739),
which routes to_file through the GDAL GPKG driver, i.e. writes the
raster as a PNG tile pyramid inside a SQLite database per the OGC
GeoPackage spec (public: OGC 12-128r18). This module writes the same
artifact from the engine's own data:

- ``write_geopackage(arr, grid, path)`` — one raster, one tile at one
  zoom level (the reference's single-raster write);
- ``write_geopackage_tiles(tiles, path, level)`` — the engine's tile
  table (quadtree ``cell_key`` + PNG blobs) as a tile-pyramid table:
  the world-box quadtree maps 1:1 onto a GeoPackage tile matrix with
  matrix_width = matrix_height = 2^level over the world bbox, and
  (tile_column, tile_row) = the cell's (ix, iy).
- ``read_geopackage(path)`` — the read half: assembles the present
  tiles at one zoom back into a georeferenced (array, GridSpec);
  routed from ``open_raster`` by the SQLite magic.

GeoPackage is a single-writer SQLite file — the LAST-MILE export of a
composite / preview-scale result (exactly how the reference uses it: one
local file per raster). The 100-TB path stays partitioned parquet; this
sink streams ``iter_batches`` into the db, so only one batch of blobs is
in memory at a time.
"""

from __future__ import annotations

import os
import sqlite3
from typing import Optional

import numpy as np

from .. import codec
from ..grids import GridSpec, cellkey

_GPKG_APP_ID = 0x47504B47  # 'GPKG'
_GPKG_USER_VERSION = 10200  # GeoPackage 1.2

_WGS84_DEF = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],'
    'AUTHORITY["EPSG","4326"]]'
)


def _init_gpkg(con: sqlite3.Connection) -> None:
    """Create the mandatory GeoPackage core tables (OGC 12-128r18 §1.1)."""
    con.execute(f"PRAGMA application_id = {_GPKG_APP_ID}")
    con.execute(f"PRAGMA user_version = {_GPKG_USER_VERSION}")
    con.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
             srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
             organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
             definition TEXT NOT NULL, description TEXT)"""
    )
    con.executemany(
        "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
        [
            ("WGS 84 geodetic", 4326, "EPSG", 4326, _WGS84_DEF, "WGS84"),
            ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
            ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
        ],
    )
    con.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_contents (
             table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
             identifier TEXT UNIQUE, description TEXT DEFAULT '',
             last_change DATETIME NOT NULL DEFAULT
               (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
             min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
             srs_id INTEGER,
             CONSTRAINT fk_gc_r_srs_id FOREIGN KEY (srs_id)
               REFERENCES gpkg_spatial_ref_sys(srs_id))"""
    )
    con.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_tile_matrix_set (
             table_name TEXT NOT NULL PRIMARY KEY, srs_id INTEGER NOT NULL,
             min_x DOUBLE NOT NULL, min_y DOUBLE NOT NULL,
             max_x DOUBLE NOT NULL, max_y DOUBLE NOT NULL)"""
    )
    con.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_tile_matrix (
             table_name TEXT NOT NULL, zoom_level INTEGER NOT NULL,
             matrix_width INTEGER NOT NULL, matrix_height INTEGER NOT NULL,
             tile_width INTEGER NOT NULL, tile_height INTEGER NOT NULL,
             pixel_x_size DOUBLE NOT NULL, pixel_y_size DOUBLE NOT NULL,
             CONSTRAINT pk_ttm PRIMARY KEY (table_name, zoom_level))"""
    )


def _init_tiles_table(
    con: sqlite3.Connection,
    table: str,
    bbox,
    srs_id: int = 4326,
    description: str = "",
) -> None:
    con.execute(
        f"""CREATE TABLE IF NOT EXISTS "{table}" (
              id INTEGER PRIMARY KEY AUTOINCREMENT,
              zoom_level INTEGER NOT NULL, tile_column INTEGER NOT NULL,
              tile_row INTEGER NOT NULL, tile_data BLOB NOT NULL,
              UNIQUE (zoom_level, tile_column, tile_row))"""
    )
    xmin, ymin, xmax, ymax = (float(v) for v in bbox)
    con.execute(
        "INSERT OR REPLACE INTO gpkg_contents "
        "(table_name, data_type, identifier, description, min_x, min_y, "
        " max_x, max_y, srs_id) VALUES (?,?,?,?,?,?,?,?,?)",
        (table, "tiles", table, description, xmin, ymin, xmax, ymax, srs_id),
    )
    con.execute(
        "INSERT OR REPLACE INTO gpkg_tile_matrix_set VALUES (?,?,?,?,?,?)",
        (table, srs_id, xmin, ymin, xmax, ymax),
    )


def write_geopackage(
    arr: np.ndarray,
    grid: GridSpec,
    path: str,
    table_name: str = "raster",
    overwrite: bool = True,
) -> str:
    """One raster -> one-tile GeoPackage (to_geopackage parity for the
    single-raster form). The tile matrix is 1x1 over the raster's bbox;
    pixels encode as the engine's grayscale PNG (uint8/uint16)."""
    a = np.asarray(arr)
    if a.ndim != 2:
        raise ValueError("write_geopackage takes one 2D band")
    if overwrite and os.path.exists(path):
        os.remove(path)
    blob = codec.encode(_as_png_pixels(a), "png")
    xmin, ymin, xmax, ymax = grid.bbox
    con = sqlite3.connect(path)
    try:
        _init_gpkg(con)
        _init_tiles_table(con, table_name, grid.bbox,
                          description=f"rasters_ray export crs={grid.crs}")
        con.execute(
            "INSERT OR REPLACE INTO gpkg_tile_matrix VALUES (?,?,?,?,?,?,?,?)",
            (table_name, 0, 1, 1, grid.cols, grid.rows,
             abs(grid.cell_width), abs(grid.cell_height)),
        )
        con.execute(
            f'INSERT OR REPLACE INTO "{table_name}" '
            "(zoom_level, tile_column, tile_row, tile_data) VALUES (0,0,0,?)",
            (sqlite3.Binary(blob),),
        )
        con.commit()
    finally:
        con.close()
    return path


def write_geopackage_tiles(
    tiles,
    path: str,
    level: int,
    table_name: str = "tiles",
    tile_size: Optional[int] = None,
    overwrite: bool = True,
) -> int:
    """Engine tile table -> GeoPackage tile pyramid.

    ``tiles`` is a Ray Dataset or pyarrow Table with the TILES_SCHEMA
    columns (cell_key, bytes, fmt, th, tw). Each world-quadtree cell at
    ``level`` becomes the pyramid tile at (zoom_level=level,
    tile_column=ix, tile_row=iy); the matrix spans the world box with
    2^level x 2^level tiles, matching the engine's cell key exactly.
    Non-PNG blobs are transcoded; ragged edge tiles pad to ``tile_size``
    (GeoPackage requires uniform tile dimensions). Streams batch by
    batch; returns the tile count."""
    import pyarrow as pa

    if overwrite and os.path.exists(path):
        os.remove(path)
    n = 1 << level
    world = (-180.0, -90.0, 180.0, 90.0)
    con = sqlite3.connect(path)
    written = 0
    try:
        _init_gpkg(con)
        _init_tiles_table(con, table_name, world,
                          description=f"rasters_ray tile pyramid level={level}")

        def batches():
            if isinstance(tiles, pa.Table):
                yield tiles
            else:
                yield from tiles.iter_batches(batch_format="pyarrow")

        ts = tile_size
        rows_buf = []
        for batch in batches():
            ck = batch.column("cell_key").to_numpy(zero_copy_only=False)
            lv, ix, iy = cellkey.decode(ck)
            if (lv != level).any():
                raise ValueError("tiles span multiple levels; pass the tiling level")
            fmts = batch.column("fmt").to_pylist()
            blobs = codec.BlobReader(batch.column("bytes"))
            for i in range(batch.num_rows):
                px = codec.decode(blobs[i], fmts[i])
                if px.ndim != 2:
                    px = px.reshape(px.shape[-2], px.shape[-1])
                if ts is None:
                    ts = max(px.shape)
                if px.shape != (ts, ts):  # pad ragged edge tiles
                    pad = np.zeros((ts, ts), dtype=px.dtype)
                    pad[: min(ts, px.shape[0]), : min(ts, px.shape[1])] = px[:ts, :ts]
                    px = pad
                rows_buf.append(
                    (level, int(ix[i]), int(iy[i]),
                     sqlite3.Binary(codec.encode(_as_png_pixels(px), "png")))
                )
            con.executemany(
                f'INSERT OR REPLACE INTO "{table_name}" '
                "(zoom_level, tile_column, tile_row, tile_data) VALUES (?,?,?,?)",
                rows_buf,
            )
            written += len(rows_buf)
            rows_buf.clear()
        con.execute(
            "INSERT OR REPLACE INTO gpkg_tile_matrix VALUES (?,?,?,?,?,?,?,?)",
            (table_name, level, n, n, ts or 1, ts or 1, 360.0 / n / (ts or 1),
             180.0 / n / (ts or 1)),
        )
        con.commit()
    finally:
        con.close()
    return written


def _as_png_pixels(a: np.ndarray) -> np.ndarray:
    """PNG is uint8/uint16 grayscale: ints pass through clipped, floats
    quantize to uint16 over their finite range (lossy-preview semantics,
    like the reference's preview renders)."""
    if a.dtype == np.uint8 or a.dtype == np.uint16:
        return a
    if np.issubdtype(a.dtype, np.integer):
        return np.clip(a, 0, 65535).astype(np.uint16)
    finite = np.isfinite(a)
    vmin = float(a[finite].min()) if finite.any() else 0.0
    vmax = float(a[finite].max()) if finite.any() else 1.0
    scale = (vmax - vmin) or 1.0
    out = np.zeros(a.shape, dtype=np.uint16)
    out[finite] = np.clip(
        np.rint((a[finite] - vmin) / scale * 65535.0), 0, 65535
    ).astype(np.uint16)
    return out


def read_geopackage_tiles(path: str, table_name: str = "tiles"):
    """Read back (zoom, col, row, array) tuples — the round-trip check."""
    con = sqlite3.connect(path)
    try:
        cur = con.execute(
            f'SELECT zoom_level, tile_column, tile_row, tile_data FROM "{table_name}" '
            "ORDER BY zoom_level, tile_row, tile_column"
        )
        return [
            (z, c, r, codec.decode(bytes(b), "png")) for z, c, r, b in cur.fetchall()
        ]
    finally:
        con.close()


def read_geopackage(
    path: str,
    table_name: Optional[str] = None,
    zoom: Optional[int] = None,
    tile_window: Optional[tuple] = None,
) -> tuple:
    """GeoPackage tile pyramid -> (2D array, GridSpec) — the read half of
    ``to_geopackage`` parity (the reference reads .gpkg through the GDAL
    driver, raster.py:634-771). Decodes ONLY the present tiles at one
    zoom level (the deepest by default) and allocates just their
    bounding box, so a sparse planetary pyramid costs what its content
    covers; a pathologically sparse span (two far-apart tiles) raises
    with the ``read_geopackage_tiles`` remediation instead of OOMing.
    ``tile_window=(tile_row0, tile_col0, n_rows, n_cols)`` pushes an
    AOI down into the SQL tile query — only intersecting tiles leave
    the store, the gpkg flavor of the windowed TIFF/HDF5/Zarr paths."""
    con = sqlite3.connect(path)
    try:
        tabs = con.execute(
            "SELECT table_name, srs_id FROM gpkg_contents "
            "WHERE data_type = 'tiles' ORDER BY table_name").fetchall()
        if not tabs:
            raise ValueError(f"no tile pyramid tables in {path}")
        if table_name is None:
            if len(tabs) > 1:
                raise ValueError(
                    f"geopackage has {len(tabs)} tile tables "
                    f"{[t[0] for t in tabs]}; pass table_name= to choose")
            table_name, srs = tabs[0]
        else:
            match = [t for t in tabs if t[0] == table_name]
            if not match:
                raise ValueError(f"no tile table {table_name!r} in {path}")
            srs = match[0][1]
        ms = con.execute(
            "SELECT min_x, min_y, max_x, max_y FROM gpkg_tile_matrix_set "
            "WHERE table_name = ?", (table_name,)).fetchone()
        if ms is None:
            raise ValueError(f"missing gpkg_tile_matrix_set row for {table_name}")
        min_x, _min_y, _max_x, max_y = (float(v) for v in ms)
        if zoom is None:
            (zoom,) = con.execute(
                f'SELECT MAX(zoom_level) FROM "{table_name}"').fetchone()
            if zoom is None:
                raise ValueError(f"tile table {table_name!r} is empty")
        tm = con.execute(
            "SELECT tile_width, tile_height, pixel_x_size, pixel_y_size "
            "FROM gpkg_tile_matrix WHERE table_name = ? AND zoom_level = ?",
            (table_name, zoom)).fetchone()
        if tm is None:
            raise ValueError(f"no gpkg_tile_matrix row for zoom {zoom}")
        tw, th, pxx, pxy = int(tm[0]), int(tm[1]), float(tm[2]), float(tm[3])
        sql = (f'SELECT tile_column, tile_row, tile_data FROM "{table_name}" '
               "WHERE zoom_level = ?")
        params = [zoom]
        if tile_window is not None:
            tr0, tc0, nr, nc = (int(v) for v in tile_window)
            sql += " AND tile_row BETWEEN ? AND ? AND tile_column BETWEEN ? AND ?"
            params += [tr0, tr0 + nr - 1, tc0, tc0 + nc - 1]
        rows = con.execute(sql + " ORDER BY tile_row, tile_column",
                           params).fetchall()
        if not rows:
            raise ValueError(
                f"no tiles at zoom {zoom}"
                + (f" in tile_window {tile_window}" if tile_window else "")
                + f" in {table_name!r}")
        cols_i = np.array([r[0] for r in rows])
        rows_i = np.array([r[1] for r in rows])
        cmin, cmax = int(cols_i.min()), int(cols_i.max())
        rmin, rmax = int(rows_i.min()), int(rows_i.max())
        span = (rmax - rmin + 1) * (cmax - cmin + 1)
        if span * th * tw > (1 << 26) and len(rows) * 4 < span:
            raise ValueError(
                f"present tiles span {span} tile slots but only {len(rows)} "
                "exist — assembling would allocate a mostly-empty "
                f"{(rmax - rmin + 1) * th}x{(cmax - cmin + 1) * tw} array; "
                "iterate read_geopackage_tiles(path) instead")
        out = None
        for c, r, blob in rows:
            px = codec.decode(bytes(blob), "png")
            if out is None:
                out = np.zeros(((rmax - rmin + 1) * th,
                                (cmax - cmin + 1) * tw), dtype=px.dtype)
            out[(r - rmin) * th:(r - rmin) * th + px.shape[0],
                (c - cmin) * tw:(c - cmin) * tw + px.shape[1]] = px
        grid = GridSpec(
            crs=f"EPSG:{srs}" if srs and srs > 0 else "EPSG:4326",
            x_origin=min_x + cmin * tw * pxx,
            y_origin=max_y - rmin * th * pxy,
            cell_width=pxx, cell_height=-pxy,
            rows=out.shape[0], cols=out.shape[1],
        )
        return out, grid
    finally:
        con.close()
