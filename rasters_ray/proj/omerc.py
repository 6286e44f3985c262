"""Hotine Oblique Mercator (EPSG GN7-2 methods 9812 "variant A" and
9815 "variant B"; PROJ ``+proj=omerc``) — the conformal projection
along an oblique great-circle-ish geodesic: the RSO grids of Malaysia
and Borneo (EPSG:3375, EPSG:29873), Alaska state-plane zone 1, and the
rotated satellite swath grids.

Pure GN7-2: the aposphere constants B, A, t0, D, F, H, G, gamma0,
lambda0 from (lat_c, lon_c, azimuth alpha_c, rectified skew gamma_c,
k_c), the forward through t/Q/S/T/V/U to the skew (u, v) axes, then
the gamma_c rotation to grid (E, N). Variant B subtracts the center
offset u_c = (A/B) atan(sqrt(D^2-1)/cos alpha_c) sign(lat_c) so the
false origin sits at the projection center (the RSO convention);
variant A (PROJ ``+no_uoff``) keeps the natural origin. The inverse is
closed form except the conformal-latitude recovery, which runs the
same FIXED eight iterations as the Krovak inverse.

Pinned in tests/test_proj.py to the GN7-2 worked example (Timbalai
1948 / RSO Borneo (m), EPSG:29873 — Everest 1830 (1967) ellipsoid) to
the published cm, plus conformality/scale invariants on WGS84.

The reference reaches this CRS family through pyproj
(rasters/CRS.py:10-34).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .datum import ELLIPSOIDS


def _consts(lat_c: float, lon_c: float, alpha_c: float, gamma_c: float,
            k_c: float, a: float, f: float, variant: str):
    e2 = f * (2.0 - f)
    e = np.sqrt(e2)
    pc = np.radians(np.float64(lat_c))
    ac = np.radians(np.float64(alpha_c))
    sp = np.sin(pc)
    B = np.sqrt(1.0 + e2 * np.cos(pc) ** 4 / (1.0 - e2))
    A = a * B * k_c * np.sqrt(1.0 - e2) / (1.0 - e2 * sp * sp)
    t0 = (np.tan(np.pi / 4.0 - pc / 2.0)
          / ((1.0 - e * sp) / (1.0 + e * sp)) ** (e / 2.0))
    D = (B * np.sqrt(1.0 - e2)
         / (np.cos(pc) * np.sqrt(1.0 - e2 * sp * sp)))
    D2 = max(D * D, 1.0)
    F = D + np.sqrt(D2 - 1.0) * np.sign(pc)
    H = F * t0 ** B
    G = (F - 1.0 / F) / 2.0
    g0 = np.arcsin(np.clip(np.sin(ac) / D, -1.0, 1.0))
    lam0 = (np.radians(np.float64(lon_c))
            - np.arcsin(np.clip(G * np.tan(g0), -1.0, 1.0)) / B)
    if variant == "B":
        uc = (A / B) * np.arctan2(np.sqrt(D2 - 1.0), np.cos(ac)) \
            * np.sign(pc)
    else:
        uc = 0.0
    return e, e2, B, A, t0, D, F, H, G, g0, lam0, uc


def geographic_to_omerc(
    lon: np.ndarray, lat: np.ndarray, lat_c: float, lon_c: float,
    alpha_c: float, gamma_c: float | None = None, k_c: float = 1.0,
    x_0: float = 0.0, y_0: float = 0.0, ellps: str = "WGS84",
    variant: str = "B",
) -> Tuple[np.ndarray, np.ndarray]:
    a, f = ELLIPSOIDS[ellps]
    gc = np.radians(np.float64(alpha_c if gamma_c is None else gamma_c))
    e, e2, B, A, t0, D, F, H, G, g0, lam0, uc = _consts(
        lat_c, lon_c, alpha_c,
        alpha_c if gamma_c is None else gamma_c, k_c, a, f, variant)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    dl = B * (lam - lam0)
    dl = (dl + np.pi) % (2.0 * np.pi) - np.pi
    sphi = np.sin(phi)
    t = (np.tan(np.pi / 4.0 - phi / 2.0)
         / ((1.0 - e * sphi) / (1.0 + e * sphi)) ** (e / 2.0))
    Q = H / t ** B
    S = (Q - 1.0 / Q) / 2.0
    T = (Q + 1.0 / Q) / 2.0
    V = np.sin(dl)
    U = (-V * np.cos(g0) + S * np.sin(g0)) / T
    v = A * np.log((1.0 - U) / (1.0 + U)) / (2.0 * B)
    u = A * np.arctan2(S * np.cos(g0) + V * np.sin(g0), np.cos(dl)) / B - uc
    x = v * np.cos(gc) + u * np.sin(gc) + x_0
    y = u * np.cos(gc) - v * np.sin(gc) + y_0
    return x, y


def omerc_to_geographic(
    x: np.ndarray, y: np.ndarray, lat_c: float, lon_c: float,
    alpha_c: float, gamma_c: float | None = None, k_c: float = 1.0,
    x_0: float = 0.0, y_0: float = 0.0, ellps: str = "WGS84",
    variant: str = "B",
) -> Tuple[np.ndarray, np.ndarray]:
    a, f = ELLIPSOIDS[ellps]
    gc = np.radians(np.float64(alpha_c if gamma_c is None else gamma_c))
    e, e2, B, A, t0, D, F, H, G, g0, lam0, uc = _consts(
        lat_c, lon_c, alpha_c,
        alpha_c if gamma_c is None else gamma_c, k_c, a, f, variant)
    xs = np.asarray(x, dtype=np.float64) - x_0
    ys = np.asarray(y, dtype=np.float64) - y_0
    v = xs * np.cos(gc) - ys * np.sin(gc)
    u = ys * np.cos(gc) + xs * np.sin(gc) + uc
    Q = np.exp(-(B * v / A))
    S = (Q - 1.0 / Q) / 2.0
    T = (Q + 1.0 / Q) / 2.0
    V = np.sin(B * u / A)
    U = (V * np.cos(g0) + S * np.sin(g0)) / T
    t = (H / np.sqrt((1.0 + U) / (1.0 - U))) ** (1.0 / B)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        sphi = np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - e * sphi) / (1.0 + e * sphi)) ** (e / 2.0))
    lam = lam0 - np.arctan2(S * np.cos(g0) - V * np.sin(g0),
                            np.cos(B * u / A)) / B
    lon = (np.degrees(lam) + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)
