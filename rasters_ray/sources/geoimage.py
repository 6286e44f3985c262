"""Georeferenced display-image sinks: JPEG/PNG + ESRI world file.

Parity target: the reference's ``to_geojpeg``/``to_geopng``
(raster.py:1791-1865) write a rendered image with georeferencing
(rasterio writes it into the file tags). Without GDAL, the portable
public equivalent is the ESRI WORLD FILE sidecar (.jgw / .pgw): six
lines — x pixel size, row rotation, column rotation, y pixel size,
then the CENTER coordinates of the top-left pixel — which every GIS
reads next to the image. A ``.crs`` sidecar carries the CRS string.

Distributed shape: one file per image row, written ON WORKERS inside
``map_batches`` (the driver never sees pixel bytes); the returned
manifest (image_id, path, n_bytes) is the only thing collected. Output
is resumable by construction — one file per image id, re-runs
overwrite idempotently.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa

from .. import codec
from ..grids import GridSpec

_EXT = {"jpg": ("jpg", "jgw"), "jpeg": ("jpg", "jgw"), "png": ("png", "pgw")}


def world_file_text(grid: GridSpec) -> str:
    """Six-line ESRI world file: pixel sizes, rotations (0), and the
    CENTER of the top-left pixel (the spec's anchor, not the corner)."""
    cx = grid.x_origin + grid.cell_width / 2.0
    cy = grid.y_origin + grid.cell_height / 2.0
    return "\n".join(
        [
            repr(float(grid.cell_width)),
            "0.0",
            "0.0",
            repr(float(grid.cell_height)),
            repr(float(cx)),
            repr(float(cy)),
        ]
    ) + "\n"


def write_geoimages(
    images_ds,
    out_dir: str,
    out_fmt: str = "png",
    cmap: Optional[str] = None,
    quality: int = 85,
):
    """IMAGES-schema dataset -> ``out_dir/<image_id>.<ext>`` (+ world
    file + .crs), rendered via min-max stretch and optional colormap.
    Returns the manifest Dataset[(image_id, path, n_bytes)] — consume it
    (e.g. ``.to_pandas()``) to drive the write."""
    from ..stages.colormap import apply_cmap
    from ..stages.sampling import _stretch_u8

    ext, wext = _EXT[out_fmt]

    def write(batch: pa.Table) -> pa.Table:
        os.makedirs(out_dir, exist_ok=True)
        ids, paths, sizes = [], [], []
        grids = batch.column("grid").to_pylist()
        for i in range(batch.num_rows):
            arr = codec.decode(
                batch.column("bytes")[i].as_py(), batch.column("fmt")[i].as_py()
            )
            u8 = _stretch_u8(arr)
            if cmap is not None and cmap != "gray":
                u8 = apply_cmap(u8, cmap)
            if ext == "jpg":
                data = codec.jpeg_codec.encode(u8, quality=quality)
            else:
                data = codec.encode(u8, "png")
            iid = batch.column("image_id")[i].as_py()
            p = os.path.join(out_dir, f"{iid}.{ext}")
            with open(p, "wb") as f:
                f.write(data)
            grid = GridSpec.from_dict(grids[i])
            with open(os.path.join(out_dir, f"{iid}.{wext}"), "w") as f:
                f.write(world_file_text(grid))
            with open(os.path.join(out_dir, f"{iid}.crs"), "w") as f:
                f.write(str(grid.crs) + "\n")
            ids.append(iid)
            paths.append(p)
            sizes.append(len(data))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "path": pa.array(paths, pa.string()),
                "n_bytes": pa.array(np.asarray(sizes, dtype=np.int64), pa.int64()),
            }
        )

    return images_ds.map_batches(write, batch_format="pyarrow")
