"""Vectorized polar stereographic (variant B, standard parallel) on WGS84.

Public formulas: Snyder (USGS PP 1395) eqs. 21-33..21-41, 15-9.
The NSIDC polar grids use this projection (EPSG:3413 north,
lat_ts=70 lon_0=-45; EPSG:3031/3976 south, lat_ts=-71/-70 lon_0=0);
the reference reaches them through pyproj (rasters/CRS.py:10-34).

Forward (north aspect; phi_c = standard parallel):
    t(phi) = tan(pi/4 - phi/2) / ((1 - e sin phi)/(1 + e sin phi))^(e/2)
    m_c  = cos(phi_c) / sqrt(1 - e^2 sin^2 phi_c)
    rho  = a m_c t / t_c                                   (21-34)
    x = rho sin(lam - lam0) + x_0
    y = -rho cos(lam - lam0) + y_0
South aspect by the standard symmetry: evaluate at (-phi, -(lam-lam0))
and flip y (so grid north points along lon_0 toward the equator, the
EPSG:3031 axis convention).

Inverse: rho -> t -> the same two-line phi iteration LCC uses (7-9).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .conic import A_WGS84, E, _m, _t


def _constants(lat_ts: float) -> Tuple[float, float]:
    """(m_c, t_c) such that rho = a * (m_c / t_c) * t(phi).

    At |lat_ts| = 90 variant B degenerates (t_c = tan(0) = 0); Snyder's
    variant-A limit applies: rho = 2 a t / sqrt((1+e)^(1+e) (1-e)^(1-e))
    (eq. 21-33), expressed here as m_c = that constant, t_c = 1."""
    if abs(abs(lat_ts) - 90.0) < 1e-12:
        k = 2.0 / np.sqrt((1.0 + E) ** (1.0 + E) * (1.0 - E) ** (1.0 - E))
        return float(k), 1.0
    phi_c = np.radians(abs(lat_ts))
    return float(_m(phi_c)), float(_t(phi_c))


def geographic_to_polar_stereo(
    lon: np.ndarray, lat: np.ndarray,
    lat_ts: float, lon_0: float = 0.0, south: bool = False,
    x_0: float = 0.0, y_0: float = 0.0, k_0: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """``k_0`` is the variant-A scale at the pole (UPS uses 0.994 with
    lat_ts = +-90); variant-B grids leave it at 1."""
    m_c, t_c = _constants(lat_ts)
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    if south:
        phi = -phi
        lam = -lam
    rho = A_WGS84 * k_0 * m_c * _t(phi) / t_c
    x = rho * np.sin(lam)
    y = -rho * np.cos(lam)
    if south:
        x, y = -x, -y  # flip both: x = rho sin(lam'), grid-N toward equator
    return x + x_0, y + y_0


def polar_stereo_to_geographic(
    x: np.ndarray, y: np.ndarray,
    lat_ts: float, lon_0: float = 0.0, south: bool = False,
    x_0: float = 0.0, y_0: float = 0.0, k_0: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray]:
    m_c, t_c = _constants(lat_ts)
    xs = np.asarray(x, dtype=np.float64) - x_0
    ys = np.asarray(y, dtype=np.float64) - y_0
    if south:
        xs, ys = -xs, -ys
    rho = np.hypot(xs, ys)
    t = rho * t_c / (A_WGS84 * k_0 * m_c)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):  # double precision in <= 5 rounds (Snyder 7-9)
        s = np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - E * s) / (1.0 + E * s)) ** (E / 2.0)
        )
    lam = np.arctan2(xs, -ys)
    # exact pole: arctan2(0, 0) = 0 -> lon_0, phi = +/-90 handled by t=0
    if south:
        phi = -phi
        lam = -lam
    lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)
