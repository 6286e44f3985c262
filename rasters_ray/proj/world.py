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

This module also carries the rest of the spherical world-map family
added over rounds 4-5: Eckert IV/VI, Goode homolosine (uninterrupted
and interrupted), Winkel Tripel, Aitoff, Hammer, Van der Grinten I,
Miller cylindrical and Natural Earth — each documented at its own
definition below. The reference reaches every one of these CRSs
through pyproj (rasters/CRS.py:10-34); this module replaces that
dependency for the engine's transform dispatcher.
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


# Eckert IV (Snyder PP 1395 eqs. 32-1..32-4; PROJ ``+proj=eck4``,
# ESRI:54012 "World Eckert IV") — the equal-area pseudocylindrical with
# a pole line half the equator's length. The auxiliary angle solves
# ``theta + sin theta cos theta + 2 sin theta = (2 + pi/2) sin phi``; a
# FIXED twelve guarded Newton iterations from ``theta_0 = phi`` keep
# results deterministic and SQL-mirrorable (residual < 1e-15
# everywhere; the pole is the exact fixed point of the guarded step).
_ECK4_CX = 2.0 / np.sqrt(np.pi * (4.0 + np.pi))   # 0.42223820...
_ECK4_CY = 2.0 * np.sqrt(np.pi / (4.0 + np.pi))   # 1.32650043...


def _eck4_theta(phi: np.ndarray) -> np.ndarray:
    rhs = (2.0 + np.pi / 2.0) * np.sin(phi)
    theta = phi.copy()
    for _ in range(12):
        den = 1.0 + np.cos(2.0 * theta) + 2.0 * np.cos(theta)
        f = theta + np.sin(theta) * np.cos(theta) + 2.0 * np.sin(theta) - rhs
        step = np.where(np.abs(den) > 1e-12,
                        f / np.where(np.abs(den) > 1e-12, den, 1.0), 0.0)
        theta = theta - step
    return theta


def geographic_to_eck4(
    lon: np.ndarray, lat: np.ndarray, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    theta = _eck4_theta(phi)
    x = _ECK4_CX * radius * lam * (1.0 + np.cos(theta)) + x_0
    y = _ECK4_CY * radius * np.sin(theta) + y_0
    return x, y


def eck4_to_geographic(
    x: np.ndarray, y: np.ndarray, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    xs = np.asarray(x, dtype=np.float64) - x_0
    ys = np.asarray(y, dtype=np.float64) - y_0
    st = np.clip(ys / (_ECK4_CY * radius), -1.0, 1.0)
    theta = np.arcsin(st)
    phi = np.arcsin(np.clip(
        (theta + np.sin(theta) * np.cos(theta) + 2.0 * np.sin(theta))
        / (2.0 + np.pi / 2.0), -1.0, 1.0))
    lam = xs / (_ECK4_CX * radius * (1.0 + np.cos(theta)))
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


# --- Goode homolosine (Snyder PP 1395 "Goode Homolosine"; PROJ
# +proj=goode / +proj=igh). Equal-area fusion: sinusoidal equatorward
# of PHI_LIM, Mollweide (shifted by Y_COR to join continuously)
# poleward. The constants solve the x-continuity system
#   2 theta + sin 2 theta = pi sin phi,
#   cos theta = (pi / (2 sqrt 2)) cos phi
# (derived in tests to full double precision):
PHI_LIM = 0.7109888814838443    # 40d44'11.8" (Snyder's join latitude)
THETA_LIM = 0.5705354790951345
Y_COR = 0.05280352736854088     # sqrt(2) sin theta_lim - phi_lim


def _moll_theta(phi: np.ndarray) -> np.ndarray:
    """Fixed ten-Newton-iteration solve of 2t + sin 2t = pi sin phi
    (the same iteration geographic_to_moll uses)."""
    rhs = np.pi * np.sin(phi)
    theta = phi.copy() if isinstance(phi, np.ndarray) else np.asarray(phi)
    for _ in range(10):
        denom = 2.0 + 2.0 * np.cos(2.0 * theta)
        step = np.where(denom > 1e-14,
                        (2.0 * theta + np.sin(2.0 * theta) - rhs)
                        / np.where(denom > 1e-14, denom, 1.0),
                        0.0)
        theta = theta - step
    return theta


def geographic_to_goode(
    lon: np.ndarray, lat: np.ndarray, lon_0: float = 0.0,
    radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    """Uninterrupted Goode homolosine."""
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    theta = _moll_theta(phi)
    moll = np.abs(phi) > PHI_LIM
    x = np.where(moll, (2.0 * _SQRT2 / np.pi) * radius * lam * np.cos(theta),
                 radius * lam * np.cos(phi))
    y = np.where(moll,
                 radius * (_SQRT2 * np.sin(theta)
                           - np.sign(phi) * Y_COR),
                 radius * phi)
    return x, y


def goode_to_geographic(
    x: np.ndarray, y: np.ndarray, lon_0: float = 0.0,
    radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    xs = np.asarray(x, dtype=np.float64) / radius
    ys = np.asarray(y, dtype=np.float64) / radius
    moll = np.abs(ys) > PHI_LIM
    # mollweide branch
    st = np.clip((np.abs(ys) + Y_COR) / _SQRT2, -1.0, 1.0)
    theta = np.arcsin(st) * np.sign(ys)
    phi_m = np.arcsin(np.clip((2.0 * theta + np.sin(2.0 * theta)) / np.pi,
                              -1.0, 1.0))
    ct = np.cos(theta)
    with np.errstate(divide="ignore", invalid="ignore"):
        lam_m = np.pi * xs / (2.0 * _SQRT2 * ct)
    lam_m = np.where(ct < 1e-14, 0.0, lam_m)
    # sinusoidal branch
    phi_s = ys
    with np.errstate(divide="ignore", invalid="ignore"):
        lam_s = xs / np.cos(phi_s)
    phi = np.where(moll, phi_m, phi_s)
    lam = np.where(moll, lam_m, lam_s)
    lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)


# interrupted layout (the PROJ +proj=igh land arrangement): northern
# hemisphere splits at -40; southern at -100 / -20 / 80. Per-lobe
# central meridians below; each lobe is drawn about its own meridian
# and translated by R*lam0 so the equator stays continuous.
_IGH_N_SPLITS = (-40.0,)
_IGH_N_LAM0 = (-100.0, 30.0)
_IGH_S_SPLITS = (-100.0, -20.0, 80.0)
_IGH_S_LAM0 = (-160.0, -60.0, 20.0, 140.0)


def _igh_lam0(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Per-point central meridian (degrees) of the containing lobe."""
    north = lat >= 0.0
    lam0 = np.where(
        north,
        np.where(lon < _IGH_N_SPLITS[0], _IGH_N_LAM0[0], _IGH_N_LAM0[1]),
        np.select(
            [lon < _IGH_S_SPLITS[0], lon < _IGH_S_SPLITS[1],
             lon < _IGH_S_SPLITS[2]],
            [_IGH_S_LAM0[0], _IGH_S_LAM0[1], _IGH_S_LAM0[2]],
            default=_IGH_S_LAM0[3]),
    )
    return lam0


def geographic_to_igh(
    lon: np.ndarray, lat: np.ndarray, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    """Interrupted Goode homolosine (12 zones, land arrangement)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lon_w = (lon + 180.0) % 360.0 - 180.0
    lam0 = _igh_lam0(lon_w, lat)
    x, y = geographic_to_goode(lon_w - lam0, lat, 0.0, radius)
    return x + radius * np.radians(lam0), y


def igh_to_geographic(
    x: np.ndarray, y: np.ndarray, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse by lobe strip: the vertical strip containing x decides
    the lobe (every lobe lies within its meridian strip because both
    component projections contract x toward the central meridian);
    points whose inverse longitude falls outside the lobe map to NaN
    (the gores between lobes)."""
    xs = np.asarray(x, dtype=np.float64)
    ys = np.asarray(y, dtype=np.float64)
    north = ys >= 0.0
    xd = np.degrees(xs / radius)  # equator-scale pseudo-longitude
    lam0 = _igh_lam0(xd, np.where(north, 1.0, -1.0))
    lon_rel, lat = goode_to_geographic(xs - radius * np.radians(lam0), ys,
                                       0.0, radius)
    lon = lon_rel + lam0
    # gore check: the point must classify into the same lobe
    ok = _igh_lam0(lon, np.where(north, 1.0, -1.0)) == lam0
    lon = np.where(ok, lon, np.nan)
    lat = np.where(ok, lat, np.nan)
    return lon, lat


# Winkel Tripel (Snyder "Flattening the Earth" §Winkel; PROJ
# ``+proj=wintri``, ESRI:54042 "World Winkel Tripel"; National
# Geographic's world map since 1998) — the arithmetic mean of the
# equirectangular projection on the standard parallel
# phi_1 = acos(2/pi) (Winkel's own choice, PROJ's default) and the
# Aitoff projection:
#     a = acos(cos phi cos(lambda/2));  sinc a = sin(a)/a  (1 at 0)
#     x = R/2 [lambda cos phi_1 + 2 cos phi sin(lambda/2) / sinc a]
#     y = R/2 [phi + sin phi / sinc a]
# The forward is closed-form (oracle-mirrorable); the inverse has no
# closed form anywhere in the literature, so it runs a FIXED twelve
# 2-D Newton iterations with a central-difference Jacobian
# (h = 1e-7 rad) — deterministic, converging to ~1e-9 deg over the
# usable map (|lat| <= 89.9, |lon| <= 179).
_WINTRI_COSP1 = 2.0 / np.pi  # cos(phi_1) EXACTLY, phi_1 = acos(2/pi)


def _newton2d(fwd, lam, phi, xs, ys, iters=12, h=1e-7,
              det_eps=1e-12, phi_clip=np.pi / 2.0):
    """Shared fixed-iteration 2-D Newton with a central-difference
    Jacobian for inverses that have no closed form (Winkel Tripel,
    Aitoff, polyconic). Each perturbed forward point is evaluated
    exactly ONCE per iteration (the Jacobian costs 4 forward calls,
    not 8) — this is the per-pixel hot path of warps onto these CRSs."""
    for _ in range(iters):
        fx, fy = fwd(lam, phi)
        rx = fx - xs
        ry = fy - ys
        xe, ye = fwd(lam + h, phi)
        xw, yw = fwd(lam - h, phi)
        xn, yn = fwd(lam, phi + h)
        xs2, ys2 = fwd(lam, phi - h)
        dxl = (xe - xw) / (2.0 * h)
        dyl = (ye - yw) / (2.0 * h)
        dxp = (xn - xs2) / (2.0 * h)
        dyp = (yn - ys2) / (2.0 * h)
        det = dxl * dyp - dxp * dyl
        ok = np.abs(det) > det_eps
        det_safe = np.where(ok, det, 1.0)
        dl = np.where(ok, (rx * dyp - ry * dxp) / det_safe, 0.0)
        dp = np.where(ok, (ry * dxl - rx * dyl) / det_safe, 0.0)
        lam = np.clip(lam - dl, -np.pi, np.pi)
        phi = np.clip(phi - dp, -phi_clip, phi_clip)
    return lam, phi


def _wintri_fwd_rad(lam: np.ndarray, phi: np.ndarray, radius: float):
    lam2 = 0.5 * lam
    cosphi = np.cos(phi)
    ca = np.clip(cosphi * np.cos(lam2), -1.0, 1.0)
    alpha = np.arccos(ca)
    with np.errstate(divide="ignore", invalid="ignore"):
        sinc_inv = np.where(alpha > 1e-12, alpha / np.sin(alpha), 1.0)
    x = 0.5 * radius * (lam * _WINTRI_COSP1
                        + 2.0 * cosphi * np.sin(lam2) * sinc_inv)
    y = 0.5 * radius * (phi + np.sin(phi) * sinc_inv)
    return x, y


def geographic_to_wintri(
    lon: np.ndarray, lat: np.ndarray, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    x, y = _wintri_fwd_rad(lam, phi, radius)
    return x + x_0, y + y_0


def wintri_to_geographic(
    x: np.ndarray, y: np.ndarray, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    xs = np.asarray(x, dtype=np.float64) - x_0
    ys = np.asarray(y, dtype=np.float64) - y_0
    # seeds: y ~ R phi near the equator axis; x ~ R/2 lam (cosp1 + cosphi)
    phi = np.clip(ys / radius, -np.pi / 2.0, np.pi / 2.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        lam = np.clip(2.0 * xs / (radius * (_WINTRI_COSP1 + np.cos(phi))),
                      -np.pi, np.pi)
    lam, phi = _newton2d(lambda lm, ph: _wintri_fwd_rad(lm, ph, radius),
                         lam, phi, xs, ys)
    lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)


# Hammer (Snyder PP 1395 eqs. 24-4..24-6 "Hammer (Elliptical)"; PROJ
# ``+proj=hammer`` with the default W=0.5, ESRI:54044 "World Hammer
# Aitoff") — the equal-area modification of Aitoff. Closed form BOTH
# ways (Snyder 24-7..24-9 for the inverse via the auxiliary z), so the
# oracle mirrors the forward with no iteration CTEs at all:
#     d = sqrt(1 + cos phi cos(lambda/2))
#     x = R 2 sqrt(2) cos phi sin(lambda/2) / d
#     y = R sqrt(2) sin phi / d
def geographic_to_hammer(
    lon: np.ndarray, lat: np.ndarray, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    cosphi = np.cos(phi)
    lam2 = 0.5 * lam
    d = np.sqrt(1.0 + cosphi * np.cos(lam2))
    x = radius * 2.0 * np.sqrt(2.0) * cosphi * np.sin(lam2) / d + x_0
    y = radius * np.sqrt(2.0) * np.sin(phi) / d + y_0
    return x, y


def hammer_to_geographic(
    x: np.ndarray, y: np.ndarray, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    """Snyder 24-7..24-9: z = sqrt(1 - (x/4R)^2 - (y/2R)^2), then
    lambda = 2 atan2(z x, 2(2 z^2 - 1) * 2R)... expressed with the
    intermediate z exactly as published."""
    xs = (np.asarray(x, dtype=np.float64) - x_0) / radius
    ys = (np.asarray(y, dtype=np.float64) - y_0) / radius
    z2 = 1.0 - (xs / 4.0) ** 2 - (ys / 2.0) ** 2
    z = np.sqrt(np.maximum(z2, 0.0))
    with np.errstate(invalid="ignore"):
        lam = 2.0 * np.arctan2(z * xs, 2.0 * (2.0 * z * z - 1.0))
        phi = np.arcsin(np.clip(z * ys, -1.0, 1.0))
    lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)


# Natural Earth (Savric, Jenny, Patterson, Petrovic & Hurni 2011, "A
# polynomial equation for the Natural Earth projection", Cartography
# and GIS 38(4); PROJ ``+proj=natearth``) — the compromise
# pseudocylindrical designed for small-scale world maps. DEFINED by the
# published polynomial pair (the paper's eq. 2-3):
#     x = R lam (0.8707 - 0.131979 p2 - 0.013791 p4
#                + 0.003971 p10 - 0.001529 p12)
#     y = R phi (1.007226 + 0.015085 p2 - 0.044475 p6
#                + 0.028874 p8 - 0.005916 p10)
# with p2 = phi^2 etc. The y polynomial is strictly increasing on
# [-pi/2, pi/2], so the inverse recovers phi with a FIXED twelve
# guarded Newton iterations (one CTE each, were an oracle ever to need
# the inverse), then lam from the x polynomial.
def _natearth_xpoly(p2: np.ndarray) -> np.ndarray:
    p4 = p2 * p2
    return (0.8707 - 0.131979 * p2 - 0.013791 * p4
            + p4 * p4 * (0.003971 * p2 - 0.001529 * p4))


def _natearth_ypoly(phi: np.ndarray) -> np.ndarray:
    p2 = phi * phi
    p4 = p2 * p2
    return phi * (1.007226 + 0.015085 * p2
                  + p4 * (-0.044475 * p2 + 0.028874 * p4
                          - 0.005916 * p4 * p2))


def _natearth_dypoly(phi: np.ndarray) -> np.ndarray:
    p2 = phi * phi
    p4 = p2 * p2
    return (1.007226 + 3.0 * 0.015085 * p2
            + p4 * (-7.0 * 0.044475 * p2 + 9.0 * 0.028874 * p4
                    - 11.0 * 0.005916 * p4 * p2))


def geographic_to_natearth(
    lon: np.ndarray, lat: np.ndarray, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    x = radius * lam * _natearth_xpoly(phi * phi) + x_0
    y = radius * _natearth_ypoly(phi) + y_0
    return x, y


def natearth_to_geographic(
    x: np.ndarray, y: np.ndarray, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    xs = np.asarray(x, dtype=np.float64) - x_0
    yr = (np.asarray(y, dtype=np.float64) - y_0) / radius
    phi = yr.copy()  # |ypoly| <= ~1.48 on the map; linear seed converges
    for _ in range(12):
        den = _natearth_dypoly(phi)
        num = _natearth_ypoly(phi) - yr
        step = np.where(np.abs(den) > 1e-12,
                        num / np.where(np.abs(den) > 1e-12, den, 1.0), 0.0)
        phi = phi - step
    with np.errstate(divide="ignore", invalid="ignore"):
        lam = xs / (radius * _natearth_xpoly(phi * phi))
    lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)


# Van der Grinten (Snyder PP 1395 eqs. 33-1..33-13; PROJ
# ``+proj=vandg``, ESRI:54029 "World Van der Grinten I"; National
# Geographic's world map 1922-1988) — the whole world in one circle of
# radius pi R. Closed form BOTH ways: the forward through the
# auxiliary A, theta, G, P, Q chain; the inverse through Snyder's
# exact cubic resolution (33-9..33-13) — no iteration anywhere.
def geographic_to_vandg(
    lon: np.ndarray, lat: np.ndarray, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    theta = np.arcsin(np.clip(np.abs(2.0 * phi / np.pi), 0.0, 1.0))
    sin_t = np.sin(theta)
    cos_t = np.cos(theta)
    with np.errstate(divide="ignore", invalid="ignore"):
        bigA = 0.5 * np.abs(np.pi / lam - lam / np.pi)
        G = cos_t / (sin_t + cos_t - 1.0)
        P = G * (2.0 / sin_t - 1.0)
        A2 = bigA * bigA
        P2 = P * P
        Q = A2 + G
        P2A2 = P2 + A2
        GP = G - P2  # explicit squares keep the SQL oracle bit-faithful
        x_main = (np.pi * radius
                  * (bigA * GP
                     + np.sqrt(np.maximum(
                         A2 * (GP * GP) - P2A2 * (G * G - P2), 0.0)))
                  / P2A2) * np.sign(lam)
        y_main = (np.pi * radius
                  * (P * Q - bigA * np.sqrt(np.maximum(
                      (A2 + 1.0) * P2A2 - Q * Q, 0.0)))
                  / P2A2) * np.sign(phi)
    # special cases: the equator is the straight line y = 0, x = R lam;
    # the central meridian (and the poles) collapse to x = 0,
    # y = +- pi R tan(theta/2)
    on_eq = phi == 0.0
    on_cm = (lam == 0.0) | (np.abs(phi) >= np.pi / 2.0 - 1e-15)
    x = np.where(on_eq, radius * lam, np.where(on_cm, 0.0, x_main))
    y = np.where(on_eq, 0.0,
                 np.where(on_cm,
                          np.pi * radius * np.tan(0.5 * theta)
                          * np.sign(phi), y_main))
    return x + x_0, y + y_0


def vandg_to_geographic(
    x: np.ndarray, y: np.ndarray, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    X = (np.asarray(x, dtype=np.float64) - x_0) / (np.pi * radius)
    Y = (np.asarray(y, dtype=np.float64) - y_0) / (np.pi * radius)
    X2 = X * X
    Y2 = Y * Y
    with np.errstate(divide="ignore", invalid="ignore"):
        c1 = -np.abs(Y) * (1.0 + X2 + Y2)
        c2 = c1 - 2.0 * Y2 + X2
        c3 = -2.0 * c1 + 1.0 + 2.0 * Y2 + (X2 + Y2) ** 2
        d = (Y2 / c3
             + (2.0 * c2 ** 3 / c3 ** 3 - 9.0 * c1 * c2 / (c3 * c3)) / 27.0)
        a1 = (c1 - c2 * c2 / (3.0 * c3)) / c3
        m1 = 2.0 * np.sqrt(np.maximum(-a1 / 3.0, 0.0))
        cosarg = np.clip(3.0 * d / (a1 * m1), -1.0, 1.0)
        t1 = np.arccos(cosarg) / 3.0
        phi = (np.pi * (-m1 * np.cos(t1 + np.pi / 3.0) - c2 / (3.0 * c3))
               * np.copysign(1.0, Y))
        lam = (np.pi * (X2 + Y2 - 1.0
                        + np.sqrt(np.maximum(
                            1.0 + 2.0 * (X2 - Y2) + (X2 + Y2) ** 2, 0.0)))
               / (2.0 * X))
    phi = np.where(Y == 0.0, 0.0, phi)
    lam = np.where(X == 0.0, 0.0, lam)
    lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)


# Aitoff (Snyder "Flattening the Earth"; PROJ ``+proj=aitoff``,
# ESRI:54043 "World Aitoff") — the azimuthal-equidistant-derived
# compromise projection Winkel Tripel averages with equirectangular:
#     alpha = acos(cos phi cos(lambda/2))
#     x = 2 R cos phi sin(lambda/2) * alpha/sin(alpha)
#     y = R sin phi * alpha/sin(alpha)
# (exactly the Aitoff term of _wintri_fwd_rad, doubled in x). The
# inverse reuses the same fixed twelve 2-D Newton iterations.
def _aitoff_fwd_rad(lam: np.ndarray, phi: np.ndarray, radius: float):
    lam2 = 0.5 * lam
    cosphi = np.cos(phi)
    ca = np.clip(cosphi * np.cos(lam2), -1.0, 1.0)
    alpha = np.arccos(ca)
    with np.errstate(divide="ignore", invalid="ignore"):
        sinc_inv = np.where(alpha > 1e-12, alpha / np.sin(alpha), 1.0)
    x = 2.0 * radius * cosphi * np.sin(lam2) * sinc_inv
    y = radius * np.sin(phi) * sinc_inv
    return x, y


def geographic_to_aitoff(
    lon: np.ndarray, lat: np.ndarray, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    x, y = _aitoff_fwd_rad(lam, phi, radius)
    return x + x_0, y + y_0


def aitoff_to_geographic(
    x: np.ndarray, y: np.ndarray, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    xs = np.asarray(x, dtype=np.float64) - x_0
    ys = np.asarray(y, dtype=np.float64) - y_0
    phi = np.clip(ys / radius, -np.pi / 2.0, np.pi / 2.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        lam = np.clip(xs / (radius * np.maximum(np.cos(phi), 1e-12)),
                      -np.pi, np.pi)
    lam, phi = _newton2d(lambda lm, ph: _aitoff_fwd_rad(lm, ph, radius),
                         lam, phi, xs, ys)
    lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)


# Miller cylindrical (Snyder PP 1395 eqs. 18-1..18-4; PROJ
# ``+proj=mill``, ESRI:54003 "World Miller Cylindrical") — the
# compromise cylindrical: Mercator's y compressed by 4/5 after scaling
# latitude by 4/5. Closed form both ways:
#     x = R lam        y = R ln(tan(pi/4 + 0.4 phi)) * 1.25
def geographic_to_mill(
    lon: np.ndarray, lat: np.ndarray, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    x = radius * lam + x_0
    y = radius * np.log(np.tan(np.pi / 4.0 + 0.4 * phi)) * 1.25 + y_0
    return x, y


def mill_to_geographic(
    x: np.ndarray, y: np.ndarray, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    xs = np.asarray(x, dtype=np.float64) - x_0
    ys = np.asarray(y, dtype=np.float64) - y_0
    phi = 2.5 * (np.arctan(np.exp(0.8 * ys / radius)) - np.pi / 4.0)
    lam = xs / radius
    lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)


# Eckert VI (Snyder PP 1395 "Eckert VI"; PROJ ``+proj=eck6``,
# ESRI:54010 "World Eckert VI") — the sinusoidal-pole-line equal-area
# companion of Eckert IV. ``theta + sin theta = (1 + pi/2) sin phi``;
# FIXED twelve guarded Newton iterations (same discipline as eck4):
#     x = R lam (1 + cos theta) / sqrt(2 + pi)
#     y = 2 R theta / sqrt(2 + pi)
def _eck6_theta(phi: np.ndarray) -> np.ndarray:
    rhs = (1.0 + np.pi / 2.0) * np.sin(phi)
    theta = phi.copy()
    for _ in range(12):
        den = 1.0 + np.cos(theta)
        f = theta + np.sin(theta) - rhs
        step = np.where(np.abs(den) > 1e-12,
                        f / np.where(np.abs(den) > 1e-12, den, 1.0), 0.0)
        theta = theta - step
    return theta


def geographic_to_eck6(
    lon: np.ndarray, lat: np.ndarray, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    theta = _eck6_theta(phi)
    sp = np.sqrt(2.0 + np.pi)
    x = radius * lam * (1.0 + np.cos(theta)) / sp + x_0
    y = 2.0 * radius * theta / sp + y_0
    return x, y


def eck6_to_geographic(
    x: np.ndarray, y: np.ndarray, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    xs = np.asarray(x, dtype=np.float64) - x_0
    ys = np.asarray(y, dtype=np.float64) - y_0
    sp = np.sqrt(2.0 + np.pi)
    theta = ys * sp / (2.0 * radius)
    phi = np.arcsin(np.clip((theta + np.sin(theta)) / (1.0 + np.pi / 2.0),
                            -1.0, 1.0))
    with np.errstate(divide="ignore", invalid="ignore"):
        lam = xs * sp / (radius * (1.0 + np.cos(theta)))
    lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)


# Gnomonic (Snyder PP 1395 eqs. 22-3..22-9; PROJ ``+proj=gnom``) — the
# only projection mapping every great circle to a straight line, the
# standard choice for great-circle routing and spherical-triangle tile
# work. Closed form both ways; the far hemisphere (cos c <= 0) has no
# image and maps to NaN, mirroring the orthographic convention above.
def geographic_to_gnom(
    lon: np.ndarray, lat: np.ndarray, lat_0: float, lon_0: float,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    phi0 = np.radians(lat_0)
    cosc = (np.sin(phi0) * np.sin(phi)
            + np.cos(phi0) * np.cos(phi) * np.cos(lam))
    with np.errstate(divide="ignore", invalid="ignore"):
        kp = np.where(cosc > 1e-12, 1.0 / np.where(cosc > 1e-12, cosc, 1.0),
                      np.nan)
    x = radius * kp * np.cos(phi) * np.sin(lam) + x_0
    y = radius * kp * (np.cos(phi0) * np.sin(phi)
                       - np.sin(phi0) * np.cos(phi) * np.cos(lam)) + y_0
    return x, y


def gnom_to_geographic(
    x: np.ndarray, y: np.ndarray, lat_0: float, lon_0: float,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    xs = (np.asarray(x, dtype=np.float64) - x_0) / radius
    ys = (np.asarray(y, dtype=np.float64) - y_0) / radius
    rho = np.hypot(xs, ys)
    c = np.arctan(rho)
    sinc, cosc = np.sin(c), np.cos(c)
    phi0 = np.radians(lat_0)
    with np.errstate(divide="ignore", invalid="ignore"):
        phi = np.arcsin(np.clip(
            cosc * np.sin(phi0)
            + np.where(rho > 0.0, ys * sinc * np.cos(phi0)
                       / np.where(rho > 0.0, rho, 1.0), 0.0), -1.0, 1.0))
        lam = np.arctan2(xs * sinc,
                         rho * np.cos(phi0) * cosc
                         - ys * np.sin(phi0) * sinc)
    phi = np.where(rho == 0.0, phi0, phi)
    lam = np.where(rho == 0.0, 0.0, lam)
    lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)
