"""Raw numpy codec — the lossless image byte format (`fmt='npy'`).

Replaces the reference's rasterio GeoTIFF IO (raster.py:634-771,
1612-1713) in an environment without rasterio/PIL: pixels round-trip
exactly (allclose is equality), satisfying the per-row invariant
"decoded-pixel allclose" of BASELINE.json input_hint.
"""

from __future__ import annotations

import io

import numpy as np


def encode(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, np.ascontiguousarray(arr), allow_pickle=False)
    return buf.getvalue()


def decode(data: bytes) -> np.ndarray:
    return np.load(io.BytesIO(data), allow_pickle=False)
