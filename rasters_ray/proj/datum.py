"""Geodetic datum transformations — ellipsoid registry, ECEF
conversions, and the 7-parameter Helmert (EPSG method 9606, position
vector convention).

The reference delegates datum handling to pyproj/PROJ
(rasters/CRS.py:10-34 accepts any authority CRS); this engine keeps a
pure-numpy registry of the classical datums real national grids sit on
(OSGB36 for the British National Grid, TM65/TM75 for the Irish Grid,
ED50 for legacy European UTM) with their EPSG-published Helmert
parameters to WGS84.

Conventions (documented so the SQL oracles can mirror them exactly):

- Parameters are stored in the published ``datum -> WGS84`` direction,
  position-vector sign convention (EPSG 9606): rotations in arcseconds,
  scale in ppm.  The reverse direction applies the NEGATED parameters in
  the same linearized formula — the EPSG-documented reversibility
  convention; for these magnitudes the negation error is < 1 mm.
- Geographic inputs are treated as ellipsoidal-surface points (h = 0 on
  the source ellipsoid); the post-shift ellipsoidal height is discarded.
  This is the standard 2D datum shift for height-less raster/vector
  data (what PROJ's ``+towgs84`` does for 2D coordinates).
- The ECEF -> geodetic inverse runs a FIXED six-iteration
  ``phi = atan2(Z + e2*N(phi)*sin(phi), p)`` fixed point (exact equation
  for any height; converges to ~1e-12 rad by iteration 4 for |h| < 10 km).
  Fixed iteration count keeps the result deterministic and lets the
  DuckDB oracle re-derive it term-for-term.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# name -> (semi-major axis a [m], flattening f)
ELLIPSOIDS = {
    "WGS84": (6378137.0, 1.0 / 298.257223563),
    "GRS80": (6378137.0, 1.0 / 298.257222101),
    # Airy 1830 — OSGB36 / British National Grid (EPSG:7001)
    "airy": (6377563.396, 1.0 / 299.3249646),
    # Airy Modified 1849 — TM65/TM75 / Irish Grid (EPSG:7002)
    "mod_airy": (6377340.189, 1.0 / 299.3249646),
    # International 1924 (Hayford) — ED50 (EPSG:7022)
    "intl": (6378388.0, 1.0 / 297.0),
    # Bessel 1841 — DHDN / Gauss-Krueger heritage (EPSG:7004)
    "bessel": (6377397.155, 1.0 / 299.1528128),
    # Everest 1830 (1967 Definition) — Timbalai 1948 / RSO Borneo
    # (EPSG:7016)
    "evrst30": (6377298.556, 1.0 / 300.8017),
}

# datum name -> (ellipsoid, towgs84: tx ty tz [m], rx ry rz [arcsec],
# ds [ppm]) in the datum -> WGS84 position-vector direction.
DATUMS = {
    "WGS84": ("WGS84", (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
    # OSGB36 -> WGS84: negation of the WGS84 -> OSGB36 set published in
    # OS "A guide to coordinate systems in Great Britain" annex B
    # (tx -446.448, ty +125.157, tz -542.060, rx -0.1502", ry -0.2470",
    # rz -0.8421", s +20.4894 ppm)
    "OSGB36": ("airy", (446.448, -125.157, 542.060,
                        0.1502, 0.2470, 0.8421, -20.4894)),
    # TM65 -> WGS84 (EPSG transformation 1640)
    "TM65": ("mod_airy", (482.530, -130.596, 564.557,
                          -1.042, -0.214, -0.631, 8.150)),
    # TM75 -> WGS84 (EPSG transformation 1641)
    "TM75": ("mod_airy", (482.5, -130.6, 564.6,
                          -1.042, -0.214, -0.631, 8.15)),
    # ED50 -> WGS84 (EPSG transformation 1133 — mean European solution,
    # geocentric translations only)
    "ED50": ("intl", (-87.0, -98.0, -121.0, 0.0, 0.0, 0.0, 0.0)),
    # CH1903 -> WGS84 (EPSG transformation 1753, geocentric translations)
    "CH1903": ("bessel", (674.4, 15.1, 405.3, 0.0, 0.0, 0.0, 0.0)),
    # S-JTSK -> WGS84 (EPSG transformation 1622, geocentric translations
    # — the shift EPSG:5514 carries)
    "S-JTSK": ("bessel", (589.0, 76.0, 480.0, 0.0, 0.0, 0.0, 0.0)),
    # Timbalai 1948 -> WGS84 (EPSG transformation 1236)
    "Timbalai": ("evrst30", (-679.0, 669.0, -48.0, 0.0, 0.0, 0.0, 0.0)),
    # CH1903+ -> WGS84 (the official swisstopo CHTRS95 relation,
    # EPSG transformation 1676)
    "CH1903+": ("bessel", (674.374, 15.056, 405.346, 0.0, 0.0, 0.0, 0.0)),
}

_AS_TO_RAD = np.pi / (180.0 * 3600.0)


def geodetic_to_ecef(
    lon_deg: np.ndarray, lat_deg: np.ndarray, a: float, f: float
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Surface (h=0) geodetic lon/lat [deg] -> geocentric cartesian [m]."""
    e2 = f * (2.0 - f)
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    sphi = np.sin(phi)
    nu = a / np.sqrt(1.0 - e2 * sphi * sphi)
    cphi = np.cos(phi)
    return nu * cphi * np.cos(lam), nu * cphi * np.sin(lam), nu * (1.0 - e2) * sphi


def ecef_to_geodetic(
    x: np.ndarray, y: np.ndarray, z: np.ndarray, a: float, f: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Geocentric cartesian [m] -> geodetic lon/lat [deg] (height
    discarded).  Fixed six-iteration fixed point — see module docstring."""
    e2 = f * (2.0 - f)
    p = np.sqrt(x * x + y * y)
    phi = np.arctan2(z, p * (1.0 - e2))
    for _ in range(6):
        sphi = np.sin(phi)
        nu = a / np.sqrt(1.0 - e2 * sphi * sphi)
        phi = np.arctan2(z + e2 * nu * sphi, p)
    return np.degrees(np.arctan2(y, x)), np.degrees(phi)


def helmert(
    x: np.ndarray, y: np.ndarray, z: np.ndarray,
    params: Tuple[float, ...], inverse: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """7-parameter position-vector Helmert (EPSG 9606), linearized
    rotation matrix.  ``inverse=True`` negates the parameters (EPSG
    reversibility convention)."""
    tx, ty, tz, rx_as, ry_as, rz_as, ds_ppm = params
    sgn = -1.0 if inverse else 1.0
    tx, ty, tz = sgn * tx, sgn * ty, sgn * tz
    rx = sgn * rx_as * _AS_TO_RAD
    ry = sgn * ry_as * _AS_TO_RAD
    rz = sgn * rz_as * _AS_TO_RAD
    m = 1.0 + sgn * ds_ppm * 1.0e-6
    xt = tx + m * (x - rz * y + ry * z)
    yt = ty + m * (rz * x + y - rx * z)
    zt = tz + m * (-ry * x + rx * y + z)
    return xt, yt, zt


def _resolve(ellps: str, towgs84: Optional[Tuple[float, ...]]):
    a, f = ELLIPSOIDS[ellps]
    if towgs84 is None:
        tw = (0.0,) * 7
    elif len(towgs84) == 3:
        tw = tuple(towgs84) + (0.0, 0.0, 0.0, 0.0)
    elif len(towgs84) == 7:
        tw = tuple(towgs84)
    else:
        raise ValueError(f"towgs84 needs 3 or 7 values, got {len(towgs84)}")
    return a, f, tw


def wgs84_to_datum(
    lon_deg: np.ndarray, lat_deg: np.ndarray,
    ellps: str, towgs84: Optional[Tuple[float, ...]],
) -> Tuple[np.ndarray, np.ndarray]:
    """WGS84 geodetic -> geodetic on (ellps, towgs84) via ECEF + inverse
    Helmert.  ``towgs84`` is the datum -> WGS84 direction."""
    a, f, tw = _resolve(ellps, towgs84)
    aw, fw = ELLIPSOIDS["WGS84"]
    x, y, z = geodetic_to_ecef(lon_deg, lat_deg, aw, fw)
    x, y, z = helmert(x, y, z, tw, inverse=True)
    return ecef_to_geodetic(x, y, z, a, f)


def datum_to_wgs84(
    lon_deg: np.ndarray, lat_deg: np.ndarray,
    ellps: str, towgs84: Optional[Tuple[float, ...]],
) -> Tuple[np.ndarray, np.ndarray]:
    a, f, tw = _resolve(ellps, towgs84)
    aw, fw = ELLIPSOIDS["WGS84"]
    x, y, z = geodetic_to_ecef(lon_deg, lat_deg, a, f)
    x, y, z = helmert(x, y, z, tw, inverse=False)
    return ecef_to_geodetic(x, y, z, aw, fw)
