"""Vectorized Lambert azimuthal equal-area (LAEA) and Lambert
cylindrical equal-area (CEA) on WGS84.

Public formulas: Snyder (USGS PP 1395) — LAEA eqs. 24-2..24-29 with the
authalic-latitude machinery of eq. 3-12/3-16; CEA eqs. 10-1, 10-2.
The canonical users are the European grid EPSG:3035 (LAEA lat_0=52
lon_0=10 x_0=4321000 y_0=3210000) and the EASE-Grid 2.0 family
(EPSG:6931/6932 polar LAEA, EPSG:6933 global CEA lat_ts=30 — Brodzik
et al. 2012, "EASE-Grid 2.0"). The reference reaches these CRSs through
pyproj (rasters/CRS.py:10-34); this replaces that dependency for the
engine's transform dispatcher.

LAEA forward (oblique; beta = authalic latitude, arcsin(q/qp)):
    Rq = a sqrt(qp/2)                                     (3-13)
    D  = a m1 / (Rq cos beta1)                            (24-20)
    B  = Rq sqrt(2 / (1 + sin b1 sin b + cos b1 cos b cos dl))  (24-19)
    x  = B D cos b sin dl                                 (24-17)
    y  = (B/D)(cos b1 sin b - sin b1 cos b cos dl)        (24-18)
Polar aspects: rho = a sqrt(qp -+ q)                      (24-23/24-25)

CEA forward: k0 = m(lat_ts); x = a k0 dl; y = a q/(2 k0)  (10-1, 10-2)

Inverses recover q then iterate Snyder 3-16 for phi (shared with the
Albers implementation's convention; converges to double precision).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .albers import _q
from .conic import A_WGS84, E, E2, _m

_QP = float(_q(np.pi / 2.0))  # q at the pole (authalic normalizer)


def _phi_from_q(q: np.ndarray) -> np.ndarray:
    """Snyder 3-16 fixed-point iteration, seeded with arcsin(q/2)."""
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
    # poles: the iteration divides by cos(phi); q = +-qp IS the pole
    phi = np.where(np.abs(q) >= _QP * (1.0 - 1e-14),
                   np.copysign(np.pi / 2.0, q), phi)
    return phi


def geographic_to_laea(
    lon: np.ndarray, lat: np.ndarray,
    lat_0: float, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    dl = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    dl = (dl + np.pi) % (2.0 * np.pi) - np.pi
    q = _q(phi)
    if abs(lat_0) >= 90.0 - 1e-12:  # polar aspects (24-23 / 24-25)
        if lat_0 > 0:
            rho = A_WGS84 * np.sqrt(np.maximum(_QP - q, 0.0))
            x = rho * np.sin(dl)
            y = -rho * np.cos(dl)
        else:
            # evaluate as the mirrored north aspect: q(-phi) == -q(phi)
            # analytically, and _q(pi/2) == _QP BIT-exactly, so the south
            # pole lands on the origin exactly instead of sqrt(eps) off
            rho = A_WGS84 * np.sqrt(np.maximum(_QP - _q(-phi), 0.0))
            x = rho * np.sin(dl)
            y = rho * np.cos(dl)
        return x + x_0, y + y_0
    p0 = np.radians(lat_0)
    b1 = np.arcsin(np.clip(_q(p0) / _QP, -1.0, 1.0))
    rq = A_WGS84 * np.sqrt(_QP / 2.0)
    d = A_WGS84 * float(_m(p0)) / (rq * np.cos(b1))
    b = np.arcsin(np.clip(q / _QP, -1.0, 1.0))
    denom = 1.0 + np.sin(b1) * np.sin(b) + np.cos(b1) * np.cos(b) * np.cos(dl)
    with np.errstate(divide="ignore", invalid="ignore"):
        big_b = rq * np.sqrt(2.0 / denom)  # antipode: denom -> 0 -> inf
    x = big_b * d * np.cos(b) * np.sin(dl)
    y = (big_b / d) * (np.cos(b1) * np.sin(b)
                       - np.sin(b1) * np.cos(b) * np.cos(dl))
    return x + x_0, y + y_0


def laea_to_geographic(
    x: np.ndarray, y: np.ndarray,
    lat_0: float, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    xs = np.asarray(x, dtype=np.float64) - x_0
    ys = np.asarray(y, dtype=np.float64) - y_0
    if abs(lat_0) >= 90.0 - 1e-12:
        rho = np.hypot(xs, ys)
        if lat_0 > 0:
            q = _QP - (rho / A_WGS84) ** 2
            lam = np.arctan2(xs, -ys)
        else:
            q = (rho / A_WGS84) ** 2 - _QP
            lam = np.arctan2(xs, ys)
        phi = _phi_from_q(q)
        phi = np.where(rho == 0.0, np.copysign(np.pi / 2.0, lat_0), phi)
        lam = np.where(rho == 0.0, 0.0, lam)
        lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
        return lon, np.degrees(phi)
    p0 = np.radians(lat_0)
    b1 = np.arcsin(np.clip(_q(p0) / _QP, -1.0, 1.0))
    rq = A_WGS84 * np.sqrt(_QP / 2.0)
    d = A_WGS84 * float(_m(p0)) / (rq * np.cos(b1))
    rho = np.hypot(xs / d, d * ys)
    with np.errstate(invalid="ignore"):
        ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * rq), -1.0, 1.0))  # (24-29)
    with np.errstate(divide="ignore", invalid="ignore"):
        q = _QP * (np.cos(ce) * np.sin(b1)
                   + d * ys * np.sin(ce) * np.cos(b1) / rho)  # (24-27)
        lam = np.arctan2(
            xs * np.sin(ce),
            d * rho * np.cos(b1) * np.cos(ce)
            - d * d * ys * np.sin(b1) * np.sin(ce),
        )  # (24-26)
    center = rho == 0.0
    q = np.where(center, _QP * np.sin(b1), q)
    lam = np.where(center, 0.0, lam)
    phi = _phi_from_q(q)
    lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)


def geographic_to_cea(
    lon: np.ndarray, lat: np.ndarray,
    lat_ts: float = 0.0, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    k0 = float(_m(np.radians(lat_ts)))
    dl = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    dl = (dl + np.pi) % (2.0 * np.pi) - np.pi
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    x = A_WGS84 * k0 * dl
    y = A_WGS84 * _q(phi) / (2.0 * k0)
    return x + x_0, y + y_0


def cea_to_geographic(
    x: np.ndarray, y: np.ndarray,
    lat_ts: float = 0.0, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    k0 = float(_m(np.radians(lat_ts)))
    xs = np.asarray(x, dtype=np.float64) - x_0
    ys = np.asarray(y, dtype=np.float64) - y_0
    q = 2.0 * ys * k0 / A_WGS84
    phi = _phi_from_q(q)
    lam = xs / (A_WGS84 * k0)
    lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)


# --- Equal Earth (EPSG:8857, EPSG method 1078) --------------------------
# Šavrič, Patterson & Jenny 2018, "The Equal Earth map projection"
# (IJGIS 32:3, eqs. 1-4; PROJ ``+proj=eqearth``): the pseudocylindrical
# equal-area world projection. On WGS84 the EPSG method applies the
# spherical polynomial to the AUTHALIC latitude on the authalic-radius
# sphere Rq = a sqrt(qp/2) — the same machinery as LAEA above. The
# theta Newton solve in the inverse runs a FIXED twelve guarded
# iterations (residual < 1e-15 over the full map) so the oracle can
# replay it one CTE per iteration.
_EE_A1 = 1.340264
_EE_A2 = -0.081106
_EE_A3 = 0.000893
_EE_A4 = 0.003796
_EE_M = np.sqrt(3.0) / 2.0
_RQ = A_WGS84 * np.sqrt(_QP / 2.0)  # authalic radius (Snyder 3-13)


def _ee_poly(theta: np.ndarray) -> np.ndarray:
    t2 = theta * theta
    t6 = t2 * t2 * t2
    return theta * (_EE_A1 + _EE_A2 * t2 + t6 * (_EE_A3 + _EE_A4 * t2))


def _ee_dpoly(theta: np.ndarray) -> np.ndarray:
    t2 = theta * theta
    t6 = t2 * t2 * t2
    return _EE_A1 + 3.0 * _EE_A2 * t2 + t6 * (7.0 * _EE_A3 + 9.0 * _EE_A4 * t2)


def geographic_to_eqearth(
    lon: np.ndarray, lat: np.ndarray, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0, radius: float | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """``radius=None`` is the EPSG:8857 ellipsoidal method (authalic
    latitude on the WGS84 authalic sphere); an explicit ``radius`` is
    PROJ's spherical ``+proj=eqearth +R=`` — the polynomial applied to
    the geodetic latitude directly on that sphere."""
    dl = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    dl = (dl + np.pi) % (2.0 * np.pi) - np.pi
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    if radius is None:
        rr = _RQ
        b = np.arcsin(np.clip(_q(phi) / _QP, -1.0, 1.0))
    else:
        rr = radius
        b = phi
    theta = np.arcsin(np.clip(_EE_M * np.sin(b), -1.0, 1.0))
    x = rr * dl * np.cos(theta) / (_EE_M * _ee_dpoly(theta)) + x_0
    y = rr * _ee_poly(theta) + y_0
    return x, y


def eqearth_to_geographic(
    x: np.ndarray, y: np.ndarray, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0, radius: float | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    rr = _RQ if radius is None else radius
    xs = np.asarray(x, dtype=np.float64) - x_0
    yr = (np.asarray(y, dtype=np.float64) - y_0) / rr
    theta = yr.copy()
    for _ in range(12):
        den = _ee_dpoly(theta)
        num = _ee_poly(theta) - yr
        step = np.where(np.abs(den) > 1e-12,
                        num / np.where(np.abs(den) > 1e-12, den, 1.0), 0.0)
        theta = theta - step
    b = np.arcsin(np.clip(np.sin(theta) / _EE_M, -1.0, 1.0))
    phi = b if radius is not None else _phi_from_q(_QP * np.sin(b))
    with np.errstate(divide="ignore", invalid="ignore"):
        lam = _EE_M * xs * _ee_dpoly(theta) / (rr * np.cos(theta))
    lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)
