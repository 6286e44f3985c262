"""Minimal affine transform for north-oriented grids.

Replaces the ``affine.Affine`` dependency of the reference
(``rasters/raster_grid.py:70``) with a 6-tuple + vectorized numpy apply.
Only the north-oriented (no rotation) case is supported, exactly like the
reference (``rasters/raster_grid.py:39-41``).

Layout matches ``Affine(a, b, c, d, e, f)``::

    x = a * col + b * row + c
    y = d * col + e * row + f

with ``b == d == 0`` for north-oriented grids.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np


@dataclass(frozen=True)
class Affine:
    a: float  # cell_width
    b: float  # 0 (row rotation)
    c: float  # x_origin
    d: float  # 0 (col rotation)
    e: float  # cell_height (negative for north-up)
    f: float  # y_origin

    def __mul__(self, colrow: Tuple) -> Tuple:
        """Apply: (col, row) -> (x, y). Accepts scalars or numpy arrays."""
        col, row = colrow
        col = np.asarray(col, dtype=np.float64)
        row = np.asarray(row, dtype=np.float64)
        x = self.a * col + self.b * row + self.c
        y = self.d * col + self.e * row + self.f
        return x, y

    def __invert__(self) -> "Affine":
        """Inverse affine (north-oriented only: b == d == 0)."""
        if self.b != 0 or self.d != 0:
            raise ValueError("only north-oriented affines are invertible here")
        ia = 1.0 / self.a
        ie = 1.0 / self.e
        return Affine(ia, 0.0, -self.c * ia, 0.0, ie, -self.f * ie)

    def translation(self, dx: float, dy: float) -> "Affine":
        """self * Affine.translation(dx, dy) — shift in (col, row) space.

        Mirrors ``affine_center = affine * Affine.translation(0.5, 0.5)``
        (reference ``rasters/raster_grid.py:369-387``).
        """
        return Affine(
            self.a,
            self.b,
            self.c + self.a * dx + self.b * dy,
            self.d,
            self.e,
            self.f + self.d * dx + self.e * dy,
        )

    def to_tuple(self) -> Tuple[float, float, float, float, float, float]:
        return (self.a, self.b, self.c, self.d, self.e, self.f)
