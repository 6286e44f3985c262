"""Vectorized sinusoidal (Sanson-Flamsteed) projection.

Public formulas: Snyder, "Map Projections — A Working Manual" (USGS PP
1395), pp. 243-248.  Both forms:

- SPHERICAL (the MODIS land grid: ``+proj=sinu +R=6371007.181``):
    x = R (lam - lam0) cos(phi)          y = R phi
- ELLIPSOIDAL (WGS84 when no sphere radius is given; Snyder 30-8..30-11):
    x = a (lam - lam0) cos(phi) / sqrt(1 - e^2 sin^2 phi)
    y = M(phi)   (meridian arc, Snyder 3-21)

The reference reaches sinusoidal CRSs through pyproj
(rasters/CRS.py:10-34, transform_xy.py:4-54); this module replaces that
dependency for the engine's transform dispatcher.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

A_WGS84 = 6378137.0
F_WGS84 = 1.0 / 298.257223563
E2_WGS84 = F_WGS84 * (2.0 - F_WGS84)
R_MODIS = 6371007.181  # sphere radius of the MODIS sinusoidal grid

# meridian-arc series coefficients (Snyder 3-21) for WGS84
_E2 = E2_WGS84
_E4 = _E2 * _E2
_E6 = _E4 * _E2
_M0 = 1.0 - _E2 / 4.0 - 3.0 * _E4 / 64.0 - 5.0 * _E6 / 256.0
_M2 = 3.0 * _E2 / 8.0 + 3.0 * _E4 / 32.0 + 45.0 * _E6 / 1024.0
_M4 = 15.0 * _E4 / 256.0 + 45.0 * _E6 / 1024.0
_M6 = 35.0 * _E6 / 3072.0
# footpoint-latitude series (Snyder 3-26) in e1 = (1-sqrt(1-e^2))/(1+sqrt(1-e^2))
_E1 = (1.0 - np.sqrt(1.0 - _E2)) / (1.0 + np.sqrt(1.0 - _E2))
_F2 = 3.0 * _E1 / 2.0 - 27.0 * _E1**3 / 32.0
_F4 = 21.0 * _E1**2 / 16.0 - 55.0 * _E1**4 / 32.0
_F6 = 151.0 * _E1**3 / 96.0
_F8 = 1097.0 * _E1**4 / 512.0


def _meridian_arc(phi: np.ndarray) -> np.ndarray:
    return A_WGS84 * (
        _M0 * phi - _M2 * np.sin(2.0 * phi) + _M4 * np.sin(4.0 * phi) - _M6 * np.sin(6.0 * phi)
    )


def _footpoint_lat(M: np.ndarray) -> np.ndarray:
    mu = M / (A_WGS84 * _M0)
    return (
        mu
        + _F2 * np.sin(2.0 * mu)
        + _F4 * np.sin(4.0 * mu)
        + _F6 * np.sin(6.0 * mu)
        + _F8 * np.sin(8.0 * mu)
    )


def geographic_to_sinu(
    lon: np.ndarray, lat: np.ndarray, lon_0: float = 0.0,
    radius: float | None = None, x_0: float = 0.0, y_0: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """lon/lat (deg) -> sinusoidal (x, y) m.  ``radius`` set = spherical
    form on that sphere; None = WGS84 ellipsoidal."""
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi  # wrap like the TM path
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    if radius is not None:
        x = radius * lam * np.cos(phi)
        y = radius * phi
    else:
        sphi = np.sin(phi)
        x = A_WGS84 * lam * np.cos(phi) / np.sqrt(1.0 - _E2 * sphi * sphi)
        y = _meridian_arc(phi)
    return x + x_0, y + y_0


def sinu_to_geographic(
    x: np.ndarray, y: np.ndarray, lon_0: float = 0.0,
    radius: float | None = None, x_0: float = 0.0, y_0: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, dtype=np.float64) - x_0
    y = np.asarray(y, dtype=np.float64) - y_0
    if radius is not None:
        phi = y / radius
        with np.errstate(invalid="ignore", divide="ignore"):
            lam = x / (radius * np.cos(phi))
    else:
        phi = _footpoint_lat(y)
        sphi = np.sin(phi)
        with np.errstate(invalid="ignore", divide="ignore"):
            lam = x * np.sqrt(1.0 - _E2 * sphi * sphi) / (A_WGS84 * np.cos(phi))
    # poles: cos(phi)=0 -> lam indeterminate; pin to the central meridian
    lam = np.where(np.abs(np.cos(phi)) < 1e-12, 0.0, lam)
    # wrap back to [-180, 180] (the forward wraps lam - lam0 the same way)
    lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)
