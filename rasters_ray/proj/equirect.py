"""Equidistant cylindrical / Plate Carrée (``+proj=eqc``, EPSG:4087).

PROJ's ``eqc`` is spherical-only by design (src/projections/eqc.cpp
forces es=0): x = a·λ·cos(φ_ts), y = a·(φ − φ_0). pyproj therefore maps
EPSG:4087 "WGS 84 / World Equidistant Cylindrical" to these spherical
formulas on the WGS84 semi-major axis — reference parity (the reference
routes all CRS work through pyproj, rasters/CRS.py:10-34) means
matching THAT behavior, not the ellipsoidal EPSG method 1028.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

A_SEMI = 6378137.0


def geographic_to_eqc(
    lon: np.ndarray, lat: np.ndarray, lat_ts: float = 0.0, lat_0: float = 0.0,
    lon_0: float = 0.0, x_0: float = 0.0, y_0: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    lam = (lam + np.pi) % (2 * np.pi) - np.pi
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    rc = np.cos(np.radians(lat_ts))
    x = A_SEMI * rc * lam + x_0
    y = A_SEMI * (phi - np.radians(lat_0)) + y_0
    return x, y


def eqc_to_geographic(
    x: np.ndarray, y: np.ndarray, lat_ts: float = 0.0, lat_0: float = 0.0,
    lon_0: float = 0.0, x_0: float = 0.0, y_0: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    rc = np.cos(np.radians(lat_ts))
    lam = (np.asarray(x, dtype=np.float64) - x_0) / (A_SEMI * rc)
    phi = (np.asarray(y, dtype=np.float64) - y_0) / A_SEMI + np.radians(lat_0)
    return np.degrees(lam) + lon_0, np.degrees(phi)
