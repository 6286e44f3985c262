from .affine import Affine
from .gridspec import GridSpec, OutOfBoundsError, Window
from .swath import SwathSpec
from . import bbox, cellkey
from .wrapgeom import buffered_points_to_polygons, point_buffer, wrap_geometry

__all__ = [
    "Affine",
    "GridSpec",
    "OutOfBoundsError",
    "Window",
    "SwathSpec",
    "bbox",
    "cellkey",
    "point_buffer",
    "buffered_points_to_polygons",
    "wrap_geometry",
]
