"""Colormap rendering: display uint8 -> RGB via built-in LUTs.

Parity target: the reference's cmap plumbing (raster.py:1809-1818 and
the cmap= kwarg throughout) renders through matplotlib colormaps.
matplotlib is absent here, so this module builds 256-entry RGB lookup
tables from public analytic definitions:

- ``gray``     — identity ramp;
- ``turbo``    — Google's improved-rainbow map via the widely published
                 5th-degree polynomial approximation (one polyval per
                 channel, clipped);
- ``viridis``  — perceptually-uniform ramp approximated by linear
                 interpolation through the commonly cited anchor samples
                 of the (CC0) viridis data;
- ``magma``    — same approach, magma anchors;
- ``coolwarm`` — analytic diverging blue-white-red ramp;
- ``jet``      — classic piecewise-linear rainbow (public formula).

All maps are approximations adequate for display rendering, not
bit-matches of matplotlib. LUTs build once (module cache) and apply as
one fancy-index gather — vectorized, no per-pixel work.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

_LUTS: Dict[str, np.ndarray] = {}

_TURBO_R = [0.13572138, 4.61539260, -42.66032258, 132.13108234,
            -152.94239396, 59.28637943]
_TURBO_G = [0.09140261, 2.19418839, 4.84296658, -14.18503333,
            4.27729857, 2.82956604]
_TURBO_B = [0.10667330, 12.64194608, -60.58204836, 110.36276771,
            -89.90310912, 27.34824973]

# commonly cited sample points of the CC0 viridis/magma tables
_VIRIDIS_ANCHORS = [
    (0.000, (68, 1, 84)), (0.125, (71, 44, 122)), (0.250, (59, 81, 139)),
    (0.375, (44, 113, 142)), (0.500, (33, 144, 141)), (0.625, (39, 173, 129)),
    (0.750, (92, 200, 99)), (0.875, (170, 220, 50)), (1.000, (253, 231, 37)),
]
_MAGMA_ANCHORS = [
    (0.000, (0, 0, 4)), (0.250, (81, 18, 124)), (0.500, (183, 55, 121)),
    (0.750, (252, 137, 97)), (1.000, (252, 253, 191)),
]


def _poly(coefs, x):
    out = np.zeros_like(x)
    for c in reversed(coefs):
        out = out * x + c
    return out


def _from_anchors(anchors) -> np.ndarray:
    xs = np.array([a[0] for a in anchors])
    cols = np.array([a[1] for a in anchors], dtype=np.float64)
    x = np.linspace(0.0, 1.0, 256)
    lut = np.stack([np.interp(x, xs, cols[:, c]) for c in range(3)], axis=1)
    return np.clip(np.rint(lut), 0, 255).astype(np.uint8)


def _build(name: str) -> np.ndarray:
    x = np.linspace(0.0, 1.0, 256)
    if name == "gray":
        g = np.arange(256, dtype=np.uint8)
        return np.stack([g, g, g], axis=1)
    if name == "turbo":
        rgb = np.stack(
            [_poly(_TURBO_R, x), _poly(_TURBO_G, x), _poly(_TURBO_B, x)], axis=1
        )
        return np.clip(np.rint(rgb * 255.0), 0, 255).astype(np.uint8)
    if name == "viridis":
        return _from_anchors(_VIRIDIS_ANCHORS)
    if name == "magma":
        return _from_anchors(_MAGMA_ANCHORS)
    if name == "coolwarm":
        # diverging: blue (59,76,192) -> white-ish (221,221,221) -> red (180,4,38)
        lo = _from_anchors([(0.0, (59, 76, 192)), (1.0, (221, 221, 221))])
        hi = _from_anchors([(0.0, (221, 221, 221)), (1.0, (180, 4, 38))])
        return np.concatenate([lo[::2], hi[::2]])
    if name == "jet":
        def ramp(v):
            return np.clip(np.minimum(v - 0.5, 4.5 - v), 0.0, 1.0)
        v = x * 4.0
        rgb = np.stack([ramp(v - 1.0), ramp(v), ramp(v + 1.0)], axis=1)
        return np.clip(np.rint(rgb * 255.0), 0, 255).astype(np.uint8)
    raise ValueError(f"unknown colormap {name!r}; available: {sorted(CMAPS)}")


CMAPS = ("gray", "turbo", "viridis", "magma", "coolwarm", "jet")


def lut(name: str) -> np.ndarray:
    """(256, 3) uint8 lookup table for ``name`` (cached)."""
    if name not in _LUTS:
        _LUTS[name] = _build(name)
    return _LUTS[name]


def apply_cmap(img_u8: np.ndarray, name: str) -> np.ndarray:
    """(h, w) uint8 -> (h, w, 3) uint8 via one LUT gather."""
    img_u8 = np.asarray(img_u8)
    if img_u8.dtype != np.uint8:
        raise ValueError("apply_cmap expects display uint8 (stretch first)")
    return lut(name)[img_u8]
