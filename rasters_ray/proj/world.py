"""Vectorized Mollweide and orthographic projections (spherical).

Mollweide (Snyder, USGS PP 1395, eqs. 31-1..31-8) — the equal-area
pseudocylindrical used for global thematic maps (ESRI:54009 "World
Mollweide"); PROJ's ``+proj=moll``. Spherical, as in PROJ: the radius
defaults to the WGS84 semi-major axis.  The auxiliary angle theta
solves ``2 theta + sin 2 theta = pi sin phi``; a FIXED ten Newton
iterations from ``theta_0 = phi`` keeps results deterministic (and
SQL-mirrorable) — convergence is ~1e-15 by iteration 6 away from the
poles, and the pole itself is the exact fixed point of the update's
guarded form below.

Orthographic (Snyder eqs. 20-3..20-6, PROJ ``+proj=ortho``) — the
satellite-view azimuthal: the sphere seen from infinity, centered on
(lat_0, lon_0). Points on the far hemisphere (cos c < 0) map to NaN,
mirroring the engine's NaN-for-invalid convention.

The reference reaches both through pyproj (rasters/CRS.py:10-34).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

R_WGS84 = 6378137.0
_SQRT2 = np.sqrt(2.0)


def geographic_to_moll(
    lon: np.ndarray, lat: np.ndarray, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    rhs = np.pi * np.sin(phi)
    theta = phi.copy()
    for _ in range(10):
        denom = 2.0 + 2.0 * np.cos(2.0 * theta)
        # at the poles denom -> 0 and theta is already the root; the
        # guarded step leaves it fixed instead of dividing by zero
        step = np.where(denom > 1e-14,
                        (2.0 * theta + np.sin(2.0 * theta) - rhs)
                        / np.where(denom > 1e-14, denom, 1.0),
                        0.0)
        theta = theta - step
    x = (2.0 * _SQRT2 / np.pi) * radius * lam * np.cos(theta) + x_0
    y = _SQRT2 * radius * np.sin(theta) + y_0
    return x, y


def moll_to_geographic(
    x: np.ndarray, y: np.ndarray, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    xs = (np.asarray(x, dtype=np.float64) - x_0)
    ys = (np.asarray(y, dtype=np.float64) - y_0)
    st = np.clip(ys / (_SQRT2 * radius), -1.0, 1.0)
    theta = np.arcsin(st)
    phi = np.arcsin(np.clip((2.0 * theta + np.sin(2.0 * theta)) / np.pi,
                            -1.0, 1.0))
    ct = np.cos(theta)
    with np.errstate(divide="ignore", invalid="ignore"):
        lam = np.pi * xs / (2.0 * _SQRT2 * radius * ct)
    lam = np.where(ct < 1e-14, 0.0, lam)  # pole column: lon undefined -> 0
    # wrap back to [-180, 180] (the forward wraps lam - lam0 the same way)
    lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)


def geographic_to_ortho(
    lon: np.ndarray, lat: np.ndarray, lat_0: float, lon_0: float,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    phi0 = np.radians(lat_0)
    cosc = (np.sin(phi0) * np.sin(phi)
            + np.cos(phi0) * np.cos(phi) * np.cos(lam))
    x = radius * np.cos(phi) * np.sin(lam)
    y = radius * (np.cos(phi0) * np.sin(phi)
                  - np.sin(phi0) * np.cos(phi) * np.cos(lam))
    bad = cosc < 0.0  # far hemisphere is not visible
    x = np.where(bad, np.nan, x) + x_0
    y = np.where(bad, np.nan, y) + y_0
    return x, y


def ortho_to_geographic(
    x: np.ndarray, y: np.ndarray, lat_0: float, lon_0: float,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    xs = (np.asarray(x, dtype=np.float64) - x_0) / radius
    ys = (np.asarray(y, dtype=np.float64) - y_0) / radius
    rho = np.sqrt(xs * xs + ys * ys)
    phi0 = np.radians(lat_0)
    with np.errstate(invalid="ignore"):
        c = np.arcsin(np.where(rho > 1.0, np.nan, rho))
    sinc, cosc = np.sin(c), np.cos(c)
    with np.errstate(divide="ignore", invalid="ignore"):
        phi = np.arcsin(cosc * np.sin(phi0) + ys * sinc * np.cos(phi0)
                        / np.where(rho == 0.0, 1.0, rho))
        lam = np.arctan2(xs * sinc,
                         rho * np.cos(phi0) * cosc
                         - ys * np.sin(phi0) * sinc)
    phi = np.where(rho == 0.0, phi0, phi)
    lam = np.where(rho == 0.0, 0.0, lam)
    # wrap back to [-180, 180] (the forward wraps lam - lam0 the same way)
    lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)
