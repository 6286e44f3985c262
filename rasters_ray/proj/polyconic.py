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
