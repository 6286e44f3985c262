"""Vectorized Lambert conformal conic (1SP / 2SP) on WGS84.

Public formulas: Snyder (USGS PP 1395) eqs. 14-15, 15-1..15-11.

Forward (2SP; 1SP is the lat_1 == lat_2 limit where n = sin(lat_1)):
    m(phi) = cos(phi) / sqrt(1 - e^2 sin^2 phi)                (14-15)
    t(phi) = tan(pi/4 - phi/2) / ((1 - e sin phi)/(1 + e sin phi))^(e/2)
                                                               (15-9)
    n   = (ln m1 - ln m2) / (ln t1 - ln t2)                    (15-8)
    F   = m1 / (n t1^n)                                        (15-10)
    rho = a F t^n ;  rho0 = a F t0^n                           (15-7)
    theta = n (lam - lam0)
    x = rho sin(theta) + x_0 ;  y = rho0 - rho cos(theta) + y_0  (14-1,2)

Inverse (15-11 iteration for phi from t).
The reference reaches LCC CRSs through pyproj (rasters/CRS.py:10-34);
this replaces that dependency for the engine's transform dispatcher.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

A_WGS84 = 6378137.0
F_WGS84 = 1.0 / 298.257223563
E2 = F_WGS84 * (2.0 - F_WGS84)
E = np.sqrt(E2)


def _m(phi: np.ndarray) -> np.ndarray:
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - E2 * s * s)


def _t(phi: np.ndarray) -> np.ndarray:
    s = np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / (
        (1.0 - E * s) / (1.0 + E * s)
    ) ** (E / 2.0)


def lcc_constants(lat_1: float, lat_2: float, lat_0: float):
    """(n, F, rho0/a) for the given parallels — the per-CRS constants."""
    p1, p2, p0 = np.radians(lat_1), np.radians(lat_2), np.radians(lat_0)
    m1, t1 = float(_m(p1)), float(_t(p1))
    t0 = float(_t(p0))
    if abs(lat_1 - lat_2) < 1e-12:
        n = float(np.sin(p1))
    else:
        m2, t2 = float(_m(p2)), float(_t(p2))
        n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
    F = m1 / (n * t1**n)
    rho0_a = F * t0**n
    return n, F, rho0_a


def geographic_to_lcc(
    lon: np.ndarray, lat: np.ndarray,
    lat_1: float, lat_2: float, lat_0: float = 0.0, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    n, F, rho0_a = lcc_constants(lat_1, lat_2, lat_0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    rho = A_WGS84 * F * _t(phi) ** n
    theta = n * lam
    x = rho * np.sin(theta) + x_0
    y = A_WGS84 * rho0_a - rho * np.cos(theta) + y_0
    return x, y


def lcc_to_geographic(
    x: np.ndarray, y: np.ndarray,
    lat_1: float, lat_2: float, lat_0: float = 0.0, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    n, F, rho0_a = lcc_constants(lat_1, lat_2, lat_0)
    xs = np.asarray(x, dtype=np.float64) - x_0
    ys = A_WGS84 * rho0_a - (np.asarray(y, dtype=np.float64) - y_0)
    rho = np.sign(n) * np.sqrt(xs * xs + ys * ys)
    theta = np.arctan2(np.sign(n) * xs, np.sign(n) * ys)
    with np.errstate(invalid="ignore", divide="ignore"):
        t = (rho / (A_WGS84 * F)) ** (1.0 / n)
    # Snyder 7-9/15-11: phi = pi/2 - 2 atan(t ((1 - e sin phi)/(1 + e sin phi))^(e/2))
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):  # converges to double precision in <= 5 rounds
        s = np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - E * s) / (1.0 + E * s)) ** (E / 2.0)
        )
    lam = theta / n
    # wrap back to [-180, 180] (the forward wraps lam - lam0 the same way)
    lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)
