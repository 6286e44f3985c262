"""Spherical azimuthal equidistant projection.

The reference uses '+proj=aeqd +lat_0 +lon_0' solely to measure metric cell
sizes and search radii around a scene centroid (center_aeqd.py:4-14,
raster_geometry.py:670-680). A spherical AEQD on the WGS84 authalic radius
is accurate to ~0.3% of distance — ample for radius heuristics (the kNN
radius_of_influence multiplies cell size by 2-3x anyway, kdtree.py:167-179).
Standard public formulas (Snyder, Map Projections: A Working Manual, p. 195).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

R_AUTHALIC = 6371007.1809


def geographic_to_aeqd(
    lon, lat, lon_0: float, lat_0: float
) -> Tuple[np.ndarray, np.ndarray]:
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    phi0 = np.radians(lat_0)

    cos_c = np.sin(phi0) * np.sin(phi) + np.cos(phi0) * np.cos(phi) * np.cos(lam)
    cos_c = np.clip(cos_c, -1.0, 1.0)
    c = np.arccos(cos_c)
    sin_c = np.sin(c)
    with np.errstate(invalid="ignore", divide="ignore"):
        k = np.where(sin_c > 1e-12, c / np.where(sin_c > 1e-12, sin_c, 1.0), 1.0)
    x = R_AUTHALIC * k * np.cos(phi) * np.sin(lam)
    y = R_AUTHALIC * k * (np.cos(phi0) * np.sin(phi) - np.sin(phi0) * np.cos(phi) * np.cos(lam))
    return x, y


def aeqd_to_geographic(
    x, y, lon_0: float, lat_0: float
) -> Tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    phi0 = np.radians(lat_0)
    rho = np.sqrt(x * x + y * y)
    c = rho / R_AUTHALIC
    sin_c = np.sin(c)
    cos_c = np.cos(c)
    with np.errstate(invalid="ignore", divide="ignore"):
        safe_rho = np.where(rho > 1e-9, rho, 1.0)
        # Snyder p.196: phi = asin(cos c sin phi0 + y sin c cos phi0 / rho)
        phi = np.where(
            rho > 1e-9,
            np.arcsin(
                np.clip(cos_c * np.sin(phi0) + y * sin_c * np.cos(phi0) / safe_rho, -1, 1)
            ),
            phi0,
        )
        # lambda = lon0 + atan2(x sin c, rho cos phi0 cos c - y sin phi0 sin c)
        lam = np.where(
            rho > 1e-9,
            np.arctan2(x * sin_c, safe_rho * np.cos(phi0) * cos_c - y * np.sin(phi0) * sin_c),
            0.0,
        )
    return np.degrees(lam) + lon_0, np.degrees(phi)
