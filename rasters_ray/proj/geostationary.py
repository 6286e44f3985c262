"""Geostationary satellite view projection (``+proj=geos``) — the fixed
grid GOES-R ABI / Meteosat SEVIRI products are published in.

Pure-numpy ellipsoidal implementation of the PUBLIC algorithm (PROJ
``geos`` projection, originally from the CGMS LRIT/HRIT Global
Specification §4.4.3.2; same formulas in the GOES-R Product User Guide
L1b §5.1.2.8): forward maps geodetic lon/lat to scan-angle coordinates
scaled by the satellite height above the ellipsoid surface, inverse
intersects the view ray with the ellipsoid. ``sweep='x'`` is the GOES-R
convention (scan about the x axis), ``sweep='y'`` the Meteosat one.

Reference parity: the reference opens any rasterio/pyproj CRS
(rasters/CRS.py:10-34); geostationary grids are what its satellite use
case reads. Points not visible from the satellite (behind the limb)
return NaN, matching PROJ's error → the engine's NaN-clip semantics
(reference transform_xy.py:50-52 NaN convention).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# WGS84 (consistent with the rest of rasters_ray.proj; GRS80 differs by
# ~0.1 mm, inside the floor-cm oracles' tolerance)
A_SEMI = 6378137.0
F_FLAT = 1.0 / 298.257223563
E2 = F_FLAT * (2.0 - F_FLAT)
_ONE_ES = 1.0 - E2
_RADIUS_P = np.sqrt(_ONE_ES)  # polar radius / a
_RADIUS_P2 = _ONE_ES
_RADIUS_P_INV2 = 1.0 / _ONE_ES


def geographic_to_geos(
    lon: np.ndarray, lat: np.ndarray, h: float, lon_0: float,
    sweep_x: bool = True, x_0: float = 0.0, y_0: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """lon/lat (deg) -> geos x/y in metres (scan angle × h). ``h`` is the
    satellite height above the ellipsoid SURFACE (PROJ ``+h``, 35786023
    for GOES-R). Points behind the limb -> NaN."""
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    lam = (lam + np.pi) % (2 * np.pi) - np.pi
    phi = np.radians(np.asarray(lat, dtype=np.float64))

    radius_g_1 = h / A_SEMI
    radius_g = 1.0 + radius_g_1

    # geocentric latitude and normalized geocentric radius on the ellipsoid
    phi_c = np.arctan(_RADIUS_P2 * np.tan(phi))
    r = _RADIUS_P / np.hypot(_RADIUS_P * np.cos(phi_c), np.sin(phi_c))
    vx = r * np.cos(lam) * np.cos(phi_c)
    vy = r * np.sin(lam) * np.cos(phi_c)
    vz = r * np.sin(phi_c)

    # visibility: the view ray must not graze the ellipsoid first
    visible = ((radius_g - vx) * vx - vy * vy - vz * vz * _RADIUS_P_INV2) >= 0.0

    tmp = radius_g - vx
    if sweep_x:
        x = radius_g_1 * np.arctan(vy / np.hypot(vz, tmp))
        y = radius_g_1 * np.arctan(vz / tmp)
    else:
        x = radius_g_1 * np.arctan(vy / tmp)
        y = radius_g_1 * np.arctan(vz / np.hypot(vy, tmp))

    x = np.where(visible, x * A_SEMI + x_0, np.nan)
    y = np.where(visible, y * A_SEMI + y_0, np.nan)
    return x, y


def geos_to_geographic(
    x: np.ndarray, y: np.ndarray, h: float, lon_0: float,
    sweep_x: bool = True, x_0: float = 0.0, y_0: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """geos x/y (m) -> lon/lat (deg); off-disk coordinates -> NaN."""
    radius_g_1 = h / A_SEMI
    radius_g = 1.0 + radius_g_1
    c = radius_g * radius_g - 1.0

    xs = (np.asarray(x, dtype=np.float64) - x_0) / A_SEMI
    ys = (np.asarray(y, dtype=np.float64) - y_0) / A_SEMI

    vx = np.full_like(xs, -1.0)
    if sweep_x:
        vz = np.tan(ys / radius_g_1)
        vy = np.tan(xs / radius_g_1) * np.hypot(1.0, vz)
    else:
        vy = np.tan(xs / radius_g_1)
        vz = np.tan(ys / radius_g_1) * np.hypot(1.0, vy)

    az = vz / _RADIUS_P
    a_q = vy * vy + az * az + vx * vx
    b_q = 2.0 * radius_g * vx
    det = b_q * b_q - 4.0 * a_q * c
    with np.errstate(invalid="ignore"):
        k = (-b_q - np.sqrt(np.where(det >= 0, det, np.nan))) / (2.0 * a_q)
        px = radius_g + k * vx
        py = k * vy
        pz = k * vz
        lam = np.arctan2(py, px)
        phi_c = np.arctan(pz * np.cos(lam) / px)
        phi = np.arctan(_RADIUS_P_INV2 * np.tan(phi_c))
    lon = np.degrees(lam) + lon_0
    lon = (lon + 180.0) % 360.0 - 180.0
    return np.where(det >= 0, lon, np.nan), np.where(det >= 0, np.degrees(phi), np.nan)
