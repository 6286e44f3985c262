"""Vectorized Albers equal-area conic (2SP) on WGS84.

Public formulas: Snyder (USGS PP 1395) eqs. 14-1..14-2, 3-12, 14-12.
EPSG:5070 (CONUS Albers: lat_1=29.5 lat_2=45.5 lat_0=23 lon_0=-96) is
the canonical user of this projection; the reference reaches it through
pyproj (rasters/CRS.py:10-34).

Forward:
    q(phi) = (1 - e^2) [ sin phi / (1 - e^2 sin^2 phi)
             - (1/(2e)) ln((1 - e sin phi)/(1 + e sin phi)) ]   (3-12)
    n   = (m1^2 - m2^2) / (q2 - q1)                             (14-14)
    C   = m1^2 + n q1                                           (14-13)
    rho = a sqrt(C - n q) / n                                   (14-12)
    theta = n (lam - lam0)
    x = rho sin(theta) + x_0 ;  y = rho0 - rho cos(theta) + y_0

Inverse: q = (C - (rho n / a)^2) / n, then the standard fixed-point
iteration for phi (Snyder 3-16), seeded with phi = asin(q / 2).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .conic import A_WGS84, E, E2, _m


def _q(phi: np.ndarray) -> np.ndarray:
    s = np.sin(phi)
    return (1.0 - E2) * (
        s / (1.0 - E2 * s * s)
        - (1.0 / (2.0 * E)) * np.log((1.0 - E * s) / (1.0 + E * s))
    )


def aea_constants(lat_1: float, lat_2: float, lat_0: float):
    """(n, C, rho0/a) — the per-CRS constants."""
    p1, p2, p0 = np.radians(lat_1), np.radians(lat_2), np.radians(lat_0)
    m1, m2 = float(_m(p1)), float(_m(p2))
    q1, q2, q0 = float(_q(p1)), float(_q(p2)), float(_q(p0))
    if abs(lat_1 - lat_2) < 1e-12:
        n = float(np.sin(p1))
    else:
        n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0_a = np.sqrt(C - n * q0) / n
    return n, C, float(rho0_a)


def geographic_to_aea(
    lon: np.ndarray, lat: np.ndarray,
    lat_1: float, lat_2: float, lat_0: float = 0.0, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    n, C, rho0_a = aea_constants(lat_1, lat_2, lat_0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    rho = A_WGS84 * np.sqrt(C - n * _q(phi)) / n
    theta = n * lam
    x = rho * np.sin(theta) + x_0
    y = A_WGS84 * rho0_a - rho * np.cos(theta) + y_0
    return x, y


def aea_to_geographic(
    x: np.ndarray, y: np.ndarray,
    lat_1: float, lat_2: float, lat_0: float = 0.0, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    n, C, rho0_a = aea_constants(lat_1, lat_2, lat_0)
    xs = np.asarray(x, dtype=np.float64) - x_0
    ys = A_WGS84 * rho0_a - (np.asarray(y, dtype=np.float64) - y_0)
    rho = np.sign(n) * np.hypot(xs, ys)
    theta = np.arctan2(np.sign(n) * xs, np.sign(n) * ys)
    q = (C - (rho * n / A_WGS84) ** 2) / n
    # seed then iterate Snyder 3-16 to double precision
    with np.errstate(invalid="ignore"):
        phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
        for _ in range(10):
            s = np.sin(phi)
            one = 1.0 - E2 * s * s
            phi = phi + (one * one) / (2.0 * np.cos(phi)) * (
                q / (1.0 - E2)
                - s / one
                + (1.0 / (2.0 * E)) * np.log((1.0 - E * s) / (1.0 + E * s))
            )
    lam = theta / n
    lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)
