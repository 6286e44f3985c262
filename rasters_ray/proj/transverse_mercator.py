"""Vectorized ellipsoidal transverse Mercator (UTM + national grids).

Pure-numpy implementation of the Krueger/Karney flattening series to order
n^6 (public formulas: Karney 2011, "Transverse Mercator with an accuracy of
a few nanometers"; also the standard 'flattening series' presentation).
Accuracy is sub-micrometer within a UTM zone — far beyond what cell
assignment needs (SURVEY.md §7.5 requires stability near cell boundaries).

UTM conventions: k0 = 0.9996, false easting 500 000 m, false northing
10 000 000 m in the southern hemisphere, lon_0 = zone*6 - 183.

The series is valid for ANY ellipsoid (it is a power series in the third
flattening n); every public function takes optional ``a``/``f`` so datum'd
national grids (British National Grid on Airy 1830, Irish Grid on Airy
Modified, ED50 UTM on International 1924) reuse the identical code path.
WGS84 results are bit-identical to the original WGS84-pinned module: the
constants are produced by the same expression sequence.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np

# WGS84
A_SEMI = 6378137.0
F_FLAT = 1.0 / 298.257223563


@lru_cache(maxsize=16)
def _series(a: float, f: float):
    """(A_rect, alpha, beta, delta, e_sqrt) for the ellipsoid (a, f).
    Expression order matches the original module-level WGS84 constants
    literal-for-literal so existing oracles stay bit-identical."""
    _n = f / (2.0 - f)
    _n2 = _n * _n
    _n3 = _n2 * _n
    _n4 = _n3 * _n
    _n5 = _n4 * _n
    _n6 = _n5 * _n

    # rectifying radius
    a_rect = a / (1 + _n) * (1 + _n2 / 4 + _n4 / 64 + _n6 / 256)

    alpha = np.array(
        [
            _n / 2 - 2 * _n2 / 3 + 5 * _n3 / 16 + 41 * _n4 / 180 - 127 * _n5 / 288 + 7891 * _n6 / 37800,
            13 * _n2 / 48 - 3 * _n3 / 5 + 557 * _n4 / 1440 + 281 * _n5 / 630 - 1983433 * _n6 / 1935360,
            61 * _n3 / 240 - 103 * _n4 / 140 + 15061 * _n5 / 26880 + 167603 * _n6 / 181440,
            49561 * _n4 / 161280 - 179 * _n5 / 168 + 6601661 * _n6 / 7257600,
            34729 * _n5 / 80640 - 3418889 * _n6 / 1995840,
            212378941 * _n6 / 319334400,
        ]
    )

    beta = np.array(
        [
            _n / 2 - 2 * _n2 / 3 + 37 * _n3 / 96 - _n4 / 360 - 81 * _n5 / 512 + 96199 * _n6 / 604800,
            _n2 / 48 + _n3 / 15 - 437 * _n4 / 1440 + 46 * _n5 / 105 - 1118711 * _n6 / 3870720,
            17 * _n3 / 480 - 37 * _n4 / 840 - 209 * _n5 / 4480 + 5569 * _n6 / 90720,
            4397 * _n4 / 161280 - 11 * _n5 / 504 - 830251 * _n6 / 7257600,
            4583 * _n5 / 161280 - 108847 * _n6 / 3991680,
            20648693 * _n6 / 638668800,
        ]
    )

    delta = np.array(
        [
            2 * _n - 2 * _n2 / 3 - 2 * _n3 + 116 * _n4 / 45 + 26 * _n5 / 45 - 2854 * _n6 / 675,
            7 * _n2 / 3 - 8 * _n3 / 5 - 227 * _n4 / 45 + 2704 * _n5 / 315 + 2323 * _n6 / 945,
            56 * _n3 / 15 - 136 * _n4 / 35 - 1262 * _n5 / 105 + 73814 * _n6 / 2835,
            4279 * _n4 / 630 - 332 * _n5 / 35 - 399572 * _n6 / 14175,
            4174 * _n5 / 315 - 144838 * _n6 / 6237,
            601676 * _n6 / 22275,
        ]
    )

    e_sqrt = 2.0 * np.sqrt(_n) / (1.0 + _n)
    return a_rect, alpha, beta, delta, e_sqrt


_A_RECT, _ALPHA, _BETA, _DELTA, _E_SQRT = _series(A_SEMI, F_FLAT)

K0 = 0.9996
FALSE_EASTING = 500000.0
FALSE_NORTHING_SOUTH = 10000000.0


def utm_lon0(zone: int) -> float:
    return zone * 6.0 - 183.0


def geographic_to_tm(
    lon: np.ndarray, lat: np.ndarray, lon0_deg: float,
    a: float = A_SEMI, f: float = F_FLAT,
) -> Tuple[np.ndarray, np.ndarray]:
    """Geodetic lon/lat (deg) on (a, f) -> unscaled TM (easting,
    northing) about lon0."""
    a_rect, alpha, _beta, _delta, e_sqrt = _series(a, f)
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0_deg)
    # wrap to [-pi, pi] so zone-adjacent points stay finite
    lam = (lam + np.pi) % (2 * np.pi) - np.pi
    phi = np.radians(np.asarray(lat, dtype=np.float64))

    sphi = np.sin(phi)
    t = np.sinh(np.arctanh(sphi) - e_sqrt * np.arctanh(e_sqrt * sphi))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))

    j = np.arange(1, 7)
    # xi = xi' + sum alpha_j sin(2j xi') cosh(2j eta')
    two_j_xi = 2.0 * np.multiply.outer(j, xi_p)
    two_j_eta = 2.0 * np.multiply.outer(j, eta_p)
    xi = xi_p + np.tensordot(alpha, np.sin(two_j_xi) * np.cosh(two_j_eta), axes=1)
    eta = eta_p + np.tensordot(alpha, np.cos(two_j_xi) * np.sinh(two_j_eta), axes=1)

    easting = K0 * a_rect * eta
    northing = K0 * a_rect * xi
    return easting, northing


def tm_to_geographic(
    easting: np.ndarray, northing: np.ndarray, lon0_deg: float,
    a: float = A_SEMI, f: float = F_FLAT,
) -> Tuple[np.ndarray, np.ndarray]:
    """Unscaled TM (easting, northing) about lon0 -> geodetic lon/lat
    (deg) on (a, f)."""
    a_rect, _alpha, beta, delta, _e_sqrt = _series(a, f)
    xi = np.asarray(northing, dtype=np.float64) / (K0 * a_rect)
    eta = np.asarray(easting, dtype=np.float64) / (K0 * a_rect)

    j = np.arange(1, 7)
    two_j_xi = 2.0 * np.multiply.outer(j, xi)
    two_j_eta = 2.0 * np.multiply.outer(j, eta)
    xi_p = xi - np.tensordot(beta, np.sin(two_j_xi) * np.cosh(two_j_eta), axes=1)
    eta_p = eta - np.tensordot(beta, np.cos(two_j_xi) * np.sinh(two_j_eta), axes=1)

    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    two_j_chi = 2.0 * np.multiply.outer(j, chi)
    phi = chi + np.tensordot(delta, np.sin(two_j_chi), axes=1)

    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lam) + lon0_deg, np.degrees(phi)


def _tm_n0(lat_0: float, lon_0: float, a: float = A_SEMI, f: float = F_FLAT) -> float:
    """K0-scaled northing of the natural origin (meridian arc at lat_0)."""
    if lat_0 == 0.0:
        return 0.0
    return float(
        geographic_to_tm(np.array([lon_0]), np.array([lat_0]), lon_0, a, f)[1][0]
    )


def geographic_to_tmerc(
    lon: np.ndarray, lat: np.ndarray, lat_0: float, lon_0: float,
    k_0: float, x_0: float, y_0: float,
    a: float = A_SEMI, f: float = F_FLAT,
) -> Tuple[np.ndarray, np.ndarray]:
    """General transverse Mercator (EPSG method 9807) with arbitrary
    natural origin / scale factor / false origin — the parameterization
    national grids like NZTM2000 (EPSG:2193) publish. Same Karney
    series as UTM; k_0 rescales the K0-scaled core, lat_0 subtracts the
    origin's meridian arc. ``a``/``f`` select the ellipsoid (the British
    and Irish grids sit on the Airy ellipsoids)."""
    e, n = geographic_to_tm(lon, lat, lon_0, a, f)
    s = k_0 / K0
    n0 = _tm_n0(lat_0, lon_0, a, f)
    return e * s + x_0, (n - n0) * s + y_0


def tmerc_to_geographic(
    easting: np.ndarray, northing: np.ndarray, lat_0: float, lon_0: float,
    k_0: float, x_0: float, y_0: float,
    a: float = A_SEMI, f: float = F_FLAT,
) -> Tuple[np.ndarray, np.ndarray]:
    s = k_0 / K0
    n0 = _tm_n0(lat_0, lon_0, a, f)
    e = (np.asarray(easting, dtype=np.float64) - x_0) / s
    n = (np.asarray(northing, dtype=np.float64) - y_0) / s + n0
    return tm_to_geographic(e, n, lon_0, a, f)


def geographic_to_utm(
    lon: np.ndarray, lat: np.ndarray, zone: int, south: bool,
    a: float = A_SEMI, f: float = F_FLAT,
) -> Tuple[np.ndarray, np.ndarray]:
    e, n = geographic_to_tm(lon, lat, utm_lon0(zone), a, f)
    e = e + FALSE_EASTING
    if south:
        n = n + FALSE_NORTHING_SOUTH
    return e, n


def utm_to_geographic(
    easting: np.ndarray, northing: np.ndarray, zone: int, south: bool,
    a: float = A_SEMI, f: float = F_FLAT,
) -> Tuple[np.ndarray, np.ndarray]:
    e = np.asarray(easting, dtype=np.float64) - FALSE_EASTING
    n = np.asarray(northing, dtype=np.float64)
    if south:
        n = n - FALSE_NORTHING_SOUTH
    return tm_to_geographic(e, n, utm_lon0(zone), a, f)
