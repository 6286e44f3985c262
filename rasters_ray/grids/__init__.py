from .affine import Affine
from .gridspec import GridSpec, OutOfBoundsError, Window
from .swath import SwathSpec
from . import bbox, cellkey

__all__ = [
    "Affine",
    "GridSpec",
    "OutOfBoundsError",
    "Window",
    "SwathSpec",
    "bbox",
    "cellkey",
]
