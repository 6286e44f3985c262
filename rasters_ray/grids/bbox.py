"""BBox helpers mirroring the reference's ``rasters/bbox.py``.

- ``merge``: min/max envelope of boxes in a common CRS (bbox.py:81-108).
- ``transform``: reproject by densifying the box to a polygon boundary
  first, then taking the envelope of transformed vertices — the
  polygon-based transform of bbox.py:128-138 (a plain corner transform
  under-covers curved edges).
"""

from __future__ import annotations

from typing import Iterable, Tuple

import numpy as np

Box = Tuple[float, float, float, float]


def merge(boxes: Iterable[Box]) -> Box:
    arr = np.asarray(list(boxes), dtype=np.float64)
    if arr.size == 0:
        raise ValueError("no boxes to merge")
    return (
        float(arr[:, 0].min()),
        float(arr[:, 1].min()),
        float(arr[:, 2].max()),
        float(arr[:, 3].max()),
    )


def densify(box: Box, points_per_edge: int = 16) -> Tuple[np.ndarray, np.ndarray]:
    """Boundary ring of the box with points_per_edge samples per edge."""
    xmin, ymin, xmax, ymax = box
    t = np.linspace(0.0, 1.0, points_per_edge, endpoint=False)
    xs = np.concatenate(
        [
            xmin + (xmax - xmin) * t,  # bottom: left->right
            np.full_like(t, xmax),  # right: bottom->top
            xmax - (xmax - xmin) * t,  # top: right->left
            np.full_like(t, xmin),  # left: top->bottom
        ]
    )
    ys = np.concatenate(
        [
            np.full_like(t, ymin),
            ymin + (ymax - ymin) * t,
            np.full_like(t, ymax),
            ymax - (ymax - ymin) * t,
        ]
    )
    return xs, ys


def transform(box: Box, source_crs: str, target_crs: str) -> Box:
    """Reproject a bbox by densify -> transform -> envelope (bbox.py:128-138)."""
    from ..proj.transform import transform_xy

    xs, ys = densify(box)
    tx, ty = transform_xy(xs, ys, source_crs, target_crs)
    if np.all(np.isnan(tx)) or np.all(np.isnan(ty)):
        raise ValueError(f"bbox {box} does not transform into {target_crs}")
    return (
        float(np.nanmin(tx)),
        float(np.nanmin(ty)),
        float(np.nanmax(tx)),
        float(np.nanmax(ty)),
    )


def buffer(box: Box, amount: float) -> Box:
    xmin, ymin, xmax, ymax = box
    return (xmin - amount, ymin - amount, xmax + amount, ymax + amount)


def intersects(a: Box, b: Box) -> bool:
    return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])


def round_box(box: Box) -> Box:
    """BBox.round (bbox.py:173-188): banker's-rounded corner coordinates
    (python round == round-half-even, matching the reference)."""
    return (
        float(round(box[0])),
        float(round(box[1])),
        float(round(box[2])),
        float(round(box[3])),
    )


def centroid(box: Box):
    """BBox.centroid (bbox.py:227-238)."""
    return ((box[0] + box[2]) / 2.0, (box[1] + box[3]) / 2.0)


def width(box: Box) -> float:
    return box[2] - box[0]


def height(box: Box) -> float:
    return box[3] - box[1]
