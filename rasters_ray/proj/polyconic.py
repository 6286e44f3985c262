"""American Polyconic on WGS84 (Snyder PP 1395 eqs. 18-12..18-15).

The projection of the historic USGS 1:62,500 / 1:24,000 quadrangle
series and ESRI:54021 "World Polyconic": every parallel is the arc of
its own tangent cone (hence "poly-conic"), true to scale, with the
central meridian true. Ellipsoidal form:

    E = (lambda - lambda_0) sin phi
    N = a / sqrt(1 - e^2 sin^2 phi)
    x = N cot(phi) sin E
    y = M(phi) - M(phi_0) + N cot(phi) (1 - cos E)

with M the meridian arc (Snyder 3-21 series). The equator row
degenerates to x = a lambda, y = -M(phi_0).

The published closed-form inverse (Snyder 18-18) is a specialized
Newton scheme; this module instead runs the SAME fixed twelve 2-D
Newton iterations with a central-difference Jacobian used by the
Winkel/Aitoff inverses (transform.py convention: deterministic,
engine-side only — contract oracles mirror the forward).

The reference reaches this CRS through pyproj (rasters/CRS.py:10-34).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

A_WGS84 = 6378137.0
F = 1.0 / 298.257223563
E2 = F * (2.0 - F)

# Snyder 3-21 meridian-arc coefficients
_C0 = 1.0 - E2 / 4.0 - 3.0 * E2 * E2 / 64.0 - 5.0 * E2 ** 3 / 256.0
_C2 = 3.0 * E2 / 8.0 + 3.0 * E2 * E2 / 32.0 + 45.0 * E2 ** 3 / 1024.0
_C4 = 15.0 * E2 * E2 / 256.0 + 45.0 * E2 ** 3 / 1024.0
_C6 = 35.0 * E2 ** 3 / 3072.0


def _merid(phi: np.ndarray) -> np.ndarray:
    """Meridian arc from the equator, in units of a (Snyder 3-21)."""
    return (_C0 * phi - _C2 * np.sin(2.0 * phi) + _C4 * np.sin(4.0 * phi)
            - _C6 * np.sin(6.0 * phi))


def _poly_fwd_rad(lam: np.ndarray, phi: np.ndarray, lat_0: float):
    m0 = _merid(np.radians(np.float64(lat_0)))
    sphi = np.sin(phi)
    with np.errstate(divide="ignore", invalid="ignore"):
        nn = 1.0 / np.sqrt(1.0 - E2 * sphi * sphi)
        cot = np.cos(phi) / sphi
        ee = lam * sphi
        x_main = nn * cot * np.sin(ee)
        y_main = _merid(phi) - m0 + nn * cot * (1.0 - np.cos(ee))
    on_eq = phi == 0.0
    x = np.where(on_eq, lam, x_main) * A_WGS84
    y = np.where(on_eq, -m0, y_main) * A_WGS84
    return x, y


def geographic_to_poly(
    lon: np.ndarray, lat: np.ndarray, lat_0: float = 0.0,
    lon_0: float = 0.0, x_0: float = 0.0, y_0: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    x, y = _poly_fwd_rad(lam, phi, lat_0)
    return x + x_0, y + y_0


def poly_to_geographic(
    x: np.ndarray, y: np.ndarray, lat_0: float = 0.0,
    lon_0: float = 0.0, x_0: float = 0.0, y_0: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    xs = np.asarray(x, dtype=np.float64) - x_0
    ys = np.asarray(y, dtype=np.float64) - y_0
    m0 = float(_merid(np.radians(np.float64(lat_0))))
    # seeds: invert the meridian arc linearly for phi, then recover the
    # cone angle E from x = N cot(phi) sin(E) and divide by sin(phi) —
    # exact up to the phi seed error for |E| <= pi/2 (|lam| within
    # ~90deg/sin(phi) of the central meridian, the projection's whole
    # useful domain)
    phi = (ys / A_WGS84 + m0) / _C0
    sphi = np.sin(phi)
    with np.errstate(divide="ignore", invalid="ignore"):
        nc = (np.cos(phi) / np.maximum(np.abs(sphi), 1e-9)
              / np.sqrt(1.0 - E2 * sphi * sphi)) * np.sign(sphi + 1e-300)
        ee = np.arcsin(np.clip(xs / (A_WGS84 * nc), -1.0, 1.0))
        lam = np.clip(np.where(np.abs(sphi) > 1e-9, ee / sphi,
                               xs / A_WGS84), -np.pi, np.pi)
    from .world import _newton2d

    lam, phi = _newton2d(lambda lm, ph: _poly_fwd_rad(lm, ph, lat_0),
                         lam, phi, xs, ys,
                         det_eps=1e-15, phi_clip=np.pi / 2.0 - 1e-9)
    lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)


# --- shared footpoint latitude (Snyder 3-26 / 7-19) ---------------------
_E1 = (1.0 - np.sqrt(1.0 - E2)) / (1.0 + np.sqrt(1.0 - E2))


def _footpoint(mu: np.ndarray) -> np.ndarray:
    """Latitude whose meridian arc is ``mu * C0`` (rectifying inverse)."""
    return (mu
            + (3.0 * _E1 / 2.0 - 27.0 * _E1 ** 3 / 32.0) * np.sin(2.0 * mu)
            + (21.0 * _E1 ** 2 / 16.0 - 55.0 * _E1 ** 4 / 32.0)
            * np.sin(4.0 * mu)
            + (151.0 * _E1 ** 3 / 96.0) * np.sin(6.0 * mu)
            + (1097.0 * _E1 ** 4 / 512.0) * np.sin(8.0 * mu))


# --- Cassini-Soldner (Snyder PP 1395 eqs. 13-7..13-13; EPSG method
# 9806; PROJ ``+proj=cass``) — the projection of the 19th-century
# national surveys (Soldner Berlin, Trinidad 1903, Kertau cadastral):
# true scale along the central meridian and along every great circle
# perpendicular to it. Series forward/inverse on WGS84.
def geographic_to_cass(
    lon: np.ndarray, lat: np.ndarray, lat_0: float = 0.0,
    lon_0: float = 0.0, x_0: float = 0.0, y_0: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    sphi = np.sin(phi)
    cphi = np.cos(phi)
    tphi = np.tan(phi)
    A = lam * cphi
    T = tphi * tphi
    C = E2 * cphi * cphi / (1.0 - E2)
    N = 1.0 / np.sqrt(1.0 - E2 * sphi * sphi)
    A2 = A * A
    m0 = _merid(np.radians(np.float64(lat_0)))
    x = N * (A - T * A * A2 / 6.0
             - (8.0 - T + 8.0 * C) * T * A * A2 * A2 / 120.0)
    y = (_merid(phi) - m0
         + N * tphi * (A2 / 2.0 + (5.0 - T + 6.0 * C) * A2 * A2 / 24.0))
    return x * A_WGS84 + x_0, y * A_WGS84 + y_0


def cass_to_geographic(
    x: np.ndarray, y: np.ndarray, lat_0: float = 0.0,
    lon_0: float = 0.0, x_0: float = 0.0, y_0: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    xs = (np.asarray(x, dtype=np.float64) - x_0) / A_WGS84
    ys = (np.asarray(y, dtype=np.float64) - y_0) / A_WGS84
    m0 = _merid(np.radians(np.float64(lat_0)))
    mu = (m0 + ys) / _C0
    p1 = _footpoint(mu)
    s1 = np.sin(p1)
    t1 = np.tan(p1)
    T1 = t1 * t1
    one = 1.0 - E2 * s1 * s1
    N1 = 1.0 / np.sqrt(one)
    R1 = (1.0 - E2) / (one * np.sqrt(one))
    D = xs / N1
    D2 = D * D
    phi = p1 - (N1 * t1 / R1) * (D2 / 2.0 - (1.0 + 3.0 * T1) * D2 * D2 / 24.0)
    lam = (D - T1 * D * D2 / 3.0
           + (1.0 + 3.0 * T1) * T1 * D * D2 * D2 / 15.0) / np.cos(p1)
    lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)


# --- Bonne (Snyder PP 1395 "Bonne", ellipsoidal eqs.; PROJ
# ``+proj=bonne``, ESRI:54024 "World Bonne" with lat_1 = 60N) — the
# equal-area pseudoconic of the classic French/atlas sheet maps: every
# parallel a true-scale circular arc about the apex above the standard
# parallel. Closed form both ways on WGS84.
def _bonne_consts(lat_1: float):
    p1 = np.radians(np.float64(lat_1))
    s1 = np.sin(p1)
    m1 = np.cos(p1) / np.sqrt(1.0 - E2 * s1 * s1)
    return p1, s1, m1, _merid(p1)


def geographic_to_bonne(
    lon: np.ndarray, lat: np.ndarray, lat_1: float = 60.0,
    lon_0: float = 0.0, x_0: float = 0.0, y_0: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    p1, s1, m1, mm1 = _bonne_consts(lat_1)
    sphi = np.sin(phi)
    m = np.cos(phi) / np.sqrt(1.0 - E2 * sphi * sphi)
    rho = m1 / s1 + mm1 - _merid(phi)
    with np.errstate(divide="ignore", invalid="ignore"):
        ee = np.where(np.abs(rho) > 1e-12,
                      m * lam / np.where(np.abs(rho) > 1e-12, rho, 1.0), 0.0)
    x = rho * np.sin(ee)
    y = m1 / s1 - rho * np.cos(ee)
    return x * A_WGS84 + x_0, y * A_WGS84 + y_0


def bonne_to_geographic(
    x: np.ndarray, y: np.ndarray, lat_1: float = 60.0,
    lon_0: float = 0.0, x_0: float = 0.0, y_0: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    xs = (np.asarray(x, dtype=np.float64) - x_0) / A_WGS84
    ys = (np.asarray(y, dtype=np.float64) - y_0) / A_WGS84
    p1, s1, m1, mm1 = _bonne_consts(lat_1)
    apex = m1 / s1
    rho = np.copysign(np.hypot(xs, apex - ys), s1)
    mm = apex + mm1 - rho
    mu = mm / _C0
    phi = _footpoint(mu)
    sphi = np.sin(phi)
    m = np.cos(phi) / np.sqrt(1.0 - E2 * sphi * sphi)
    with np.errstate(divide="ignore", invalid="ignore"):
        theta = np.arctan2(xs * np.sign(s1), (apex - ys) * np.sign(s1))
        lam = np.where(np.abs(m) > 1e-12,
                       rho * theta / np.where(np.abs(m) > 1e-12, m, 1.0),
                       0.0)
    lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)
