"""Vectorized Mercator: spherical Web Mercator (EPSG:3857) and
ellipsoidal WGS84 Mercator (EPSG:3395 / +proj=merc).

Public formulas: Snyder (USGS PP 1395) eqs. 7-1..7-10; EPSG guidance
note 7-2 for the 3857 "popular visualisation pseudo-Mercator" convention
(spherical formulas evaluated with GEODETIC latitude on the WGS84
semi-major axis).

The reference reaches Mercator CRSs through pyproj
(rasters/CRS.py:10-34); this replaces that dependency.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

A_WGS84 = 6378137.0
F_WGS84 = 1.0 / 298.257223563
E2 = F_WGS84 * (2.0 - F_WGS84)
E = np.sqrt(E2)

def geographic_to_webmerc(lon, lat) -> Tuple[np.ndarray, np.ndarray]:
    """EPSG:3857: x = a lam, y = a ln tan(pi/4 + phi/2) — geodetic lat on
    the sphere of radius a (Snyder 7-1/7-2)."""
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    x = A_WGS84 * lam
    with np.errstate(invalid="ignore", divide="ignore"):
        y = A_WGS84 * np.log(np.tan(np.pi / 4.0 + phi / 2.0))
    return x, y


def webmerc_to_geographic(x, y) -> Tuple[np.ndarray, np.ndarray]:
    """Snyder 7-4/7-5: phi = pi/2 - 2 atan(exp(-y/a)); lam = x/a."""
    xs = np.asarray(x, dtype=np.float64)
    ys = np.asarray(y, dtype=np.float64)
    lam = xs / A_WGS84
    phi = np.pi / 2.0 - 2.0 * np.arctan(np.exp(-ys / A_WGS84))
    return np.degrees(lam), np.degrees(phi)


def geographic_to_merc(lon, lat) -> Tuple[np.ndarray, np.ndarray]:
    """Ellipsoidal WGS84 Mercator (EPSG:3395), Snyder 7-7:
    y = a ln( tan(pi/4 + phi/2) ((1 - e sin phi)/(1 + e sin phi))^(e/2) )."""
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    s = np.sin(phi)
    x = A_WGS84 * lam
    with np.errstate(invalid="ignore", divide="ignore"):
        y = A_WGS84 * np.log(
            np.tan(np.pi / 4.0 + phi / 2.0)
            * ((1.0 - E * s) / (1.0 + E * s)) ** (E / 2.0)
        )
    return x, y


def merc_to_geographic(x, y) -> Tuple[np.ndarray, np.ndarray]:
    """Snyder 7-9/7-10 iteration for phi from t = exp(-y/a)."""
    xs = np.asarray(x, dtype=np.float64)
    ys = np.asarray(y, dtype=np.float64)
    lam = xs / A_WGS84
    t = np.exp(-ys / A_WGS84)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        s = np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - E * s) / (1.0 + E * s)) ** (E / 2.0)
        )
    return np.degrees(lam), np.degrees(phi)
