"""Krovak oblique conformal conic — the S-JTSK national grid of the
Czech Republic and Slovakia (EPSG:5514 "S-JTSK / Krovak East North").

Pure EPSG Guidance Note 7-2 method 9819 ("Krovak"): Gaussian sphere
via the conformal latitude, rotation to the oblique pole (azimuth
30°17'17.3031"), conformal conic on the pseudo standard parallel
78°30' with k=0.9999, on the Bessel 1841 ellipsoid. The projection
natively produces SOUTHING (X) and WESTING (Y); the GIS convention
EPSG:5514 returns easting = -Y, northing = -X.

Pinned in tests/test_proj.py to the GN7-2 worked example
(50°12'32.4416"N 16°50'59.1790"E -> X 1050538.643, Y 568990.997, to
the published mm). The longitude of origin is 24°50' east of GREENWICH
(42°30' east of Ferro). Inputs are S-JTSK (Bessel) geographic
coordinates — the datum shift from WGS84 (towgs84 589,76,480) is
applied by the transform dispatcher like the Swiss somerc grids.

The reference reaches this CRS through pyproj (rasters/CRS.py:10-34).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# Bessel 1841 (the S-JTSK ellipsoid)
_A = 6377397.155
_E2 = 0.006674372230614
_E = np.sqrt(_E2)

_PHI_C = np.radians(49.5)                       # latitude of centre
_LON_0 = 24.0 + 50.0 / 60.0                     # east of Greenwich, deg
_ALPHA = np.radians(30.0 + 17.0 / 60.0 + 17.30311 / 3600.0)
_PHI_P = np.radians(78.5)                       # pseudo standard parallel
_K_P = 0.9999

# derived projection constants (GN7-2 names)
_B = np.sqrt(1.0 + _E2 * np.cos(_PHI_C) ** 4 / (1.0 - _E2))
_A_BIG = _A * np.sqrt(1.0 - _E2) / (1.0 - _E2 * np.sin(_PHI_C) ** 2)
_G0 = np.arcsin(np.sin(_PHI_C) / _B)
_T0 = (np.tan(np.pi / 4.0 + _G0 / 2.0)
       * ((1.0 + _E * np.sin(_PHI_C)) / (1.0 - _E * np.sin(_PHI_C)))
       ** (_E * _B / 2.0)
       / np.tan(np.pi / 4.0 + _PHI_C / 2.0) ** _B)
_N = np.sin(_PHI_P)
_R0 = _K_P * _A_BIG / np.tan(_PHI_P)


def geographic_to_krovak(
    lon: np.ndarray, lat: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """S-JTSK geographic degrees -> EPSG:5514 (easting, northing) —
    both negative over the Czech/Slovak territory by construction."""
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    sphi = np.sin(phi)
    u = 2.0 * (np.arctan(
        _T0 * np.tan(np.pi / 4.0 + phi / 2.0) ** _B
        / ((1.0 + _E * sphi) / (1.0 - _E * sphi)) ** (_E * _B / 2.0))
        - np.pi / 4.0)
    v = _B * (np.radians(_LON_0) - lam)
    s = np.arcsin(np.clip(
        np.cos(_ALPHA) * np.sin(u)
        + np.sin(_ALPHA) * np.cos(u) * np.cos(v), -1.0, 1.0))
    d = np.arcsin(np.clip(np.cos(u) * np.sin(v) / np.cos(s), -1.0, 1.0))
    theta = _N * d
    r = (_R0 * np.tan(np.pi / 4.0 + _PHI_P / 2.0) ** _N
         / np.tan(s / 2.0 + np.pi / 4.0) ** _N)
    southing = r * np.cos(theta)
    westing = r * np.sin(theta)
    return -westing, -southing


def krovak_to_geographic(
    x: np.ndarray, y: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """EPSG:5514 (easting, northing) -> S-JTSK geographic degrees.
    The conformal-latitude inverse iterates a FIXED eight times (GN7-2
    convergence is ~1e-12 by iteration 4 over the grid's extent)."""
    southing = -np.asarray(y, dtype=np.float64)
    westing = -np.asarray(x, dtype=np.float64)
    r = np.hypot(southing, westing)
    theta = np.arctan2(westing, southing)
    d = theta / _N
    s = 2.0 * (np.arctan(
        (_R0 / r) ** (1.0 / _N) * np.tan(np.pi / 4.0 + _PHI_P / 2.0))
        - np.pi / 4.0)
    u = np.arcsin(np.clip(
        np.cos(_ALPHA) * np.sin(s)
        - np.sin(_ALPHA) * np.cos(s) * np.cos(d), -1.0, 1.0))
    v = np.arcsin(np.clip(np.cos(s) * np.sin(d) / np.cos(u), -1.0, 1.0))
    phi = u.copy()
    for _ in range(8):
        phi = 2.0 * (np.arctan(
            _T0 ** (-1.0 / _B) * np.tan(u / 2.0 + np.pi / 4.0) ** (1.0 / _B)
            * ((1.0 + _E * np.sin(phi)) / (1.0 - _E * np.sin(phi)))
            ** (_E / 2.0)) - np.pi / 4.0)
    lam = np.radians(_LON_0) - v / _B
    return np.degrees(lam), np.degrees(phi)
