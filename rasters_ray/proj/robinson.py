"""Robinson projection ("World_Robinson", ESRI:54030).

Robinson's 1974 pseudocylindrical compromise projection is DEFINED by a
table, not a formula: at every 5 degrees of latitude the published
table gives PLEN (X — the length of the parallel relative to the
equator) and PDFE (Y — its distance from the equator relative to
0.5072 of the equator length, normalized here to the 1.3523 scale):

    x = 0.8487 R X(phi) lambda        y = 1.3523 R Y(phi) sign(phi)

Between knots Robinson specified only "smooth interpolation"; every
implementation chooses its own scheme (PROJ ships a fixed cubic-spline
coefficient table). This engine uses a deterministic piecewise cubic
HERMITE with central-difference knot slopes (one-sided at the ends) —
closed-form per 5-degree band, so the SQL oracle can re-derive the
exact same arithmetic from the same published knot values, nothing
golden. Knot latitudes reproduce the published table to 1 ulp (the
Hermite basis is exact at nodes; the longitude wrap and the scale
divide each cost at most one rounding).

The inverse recovers |phi| from y with a FIXED eight guarded Newton
iterations on the same Hermite piecewise (seeded linearly), then
lambda = x / (0.8487 R X(phi)).

The reference reaches this CRS through pyproj (rasters/CRS.py:10-34);
PROJ's spline table differs from our Hermite between knots by < 0.03%
of R (sub-2 km) — both honor the same published Robinson table.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

R_WGS84 = 6378137.0

# Robinson (1974) published table, 0..90 deg in 5-deg steps
_PLEN = np.array([
    1.0000, 0.9986, 0.9954, 0.9900, 0.9822, 0.9730, 0.9600,
    0.9427, 0.9216, 0.8962, 0.8679, 0.8350, 0.7986, 0.7597,
    0.7186, 0.6732, 0.6213, 0.5722, 0.5322,
])
_PDFE = np.array([
    0.0000, 0.0620, 0.1240, 0.1860, 0.2480, 0.3100, 0.3720,
    0.4340, 0.4958, 0.5571, 0.6176, 0.6769, 0.7346, 0.7903,
    0.8435, 0.8936, 0.9394, 0.9761, 1.0000,
])


def _slopes(v: np.ndarray) -> np.ndarray:
    """Knot slopes per 5-deg unit: central differences, one-sided ends."""
    m = np.empty_like(v)
    m[1:-1] = (v[2:] - v[:-2]) / 2.0
    m[0] = v[1] - v[0]
    m[-1] = v[-1] - v[-2]
    return m


_MX = _slopes(_PLEN)
_MY = _slopes(_PDFE)


def _hermite(v: np.ndarray, m: np.ndarray, alat: np.ndarray):
    """Evaluate the piecewise cubic Hermite at |lat| in degrees.
    Returns (value, d value / d unit) where one unit = 5 degrees."""
    i = np.minimum(np.floor(alat / 5.0).astype(np.int64), 17)
    t = alat / 5.0 - i
    v0 = v[i]
    v1 = v[i + 1]
    m0 = m[i]
    m1 = m[i + 1]
    t2 = t * t
    t3 = t2 * t
    val = ((2.0 * t3 - 3.0 * t2 + 1.0) * v0 + (t3 - 2.0 * t2 + t) * m0
           + (-2.0 * t3 + 3.0 * t2) * v1 + (t3 - t2) * m1)
    dval = ((6.0 * t2 - 6.0 * t) * v0 + (3.0 * t2 - 4.0 * t + 1.0) * m0
            + (-6.0 * t2 + 6.0 * t) * v1 + (3.0 * t2 - 2.0 * t) * m1)
    return val, dval


def geographic_to_robin(
    lon: np.ndarray, lat: np.ndarray, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    latv = np.asarray(lat, dtype=np.float64)
    alat = np.minimum(np.abs(latv), 90.0)
    xv, _ = _hermite(_PLEN, _MX, alat)
    yv, _ = _hermite(_PDFE, _MY, alat)
    x = 0.8487 * radius * xv * lam + x_0
    y = 1.3523 * radius * yv * np.copysign(1.0, latv) + y_0
    return x, y


def robin_to_geographic(
    x: np.ndarray, y: np.ndarray, lon_0: float = 0.0,
    x_0: float = 0.0, y_0: float = 0.0, radius: float = R_WGS84,
) -> Tuple[np.ndarray, np.ndarray]:
    xs = np.asarray(x, dtype=np.float64) - x_0
    ys = (np.asarray(y, dtype=np.float64) - y_0) / (1.3523 * radius)
    target = np.clip(np.abs(ys), 0.0, 1.0)
    alat = target * 90.0  # linear seed
    for _ in range(8):
        val, dval = _hermite(_PDFE, _MY, alat)
        den = dval / 5.0  # d/d degree
        step = np.where(np.abs(den) > 1e-12,
                        (val - target) / np.where(np.abs(den) > 1e-12,
                                                  den, 1.0), 0.0)
        alat = np.clip(alat - step, 0.0, 90.0)
    xv, _ = _hermite(_PLEN, _MX, alat)
    lam = xs / (0.8487 * radius * xv)
    lon = (np.degrees(lam) + lon_0 + 180.0) % 360.0 - 180.0
    lat = alat * np.copysign(1.0, ys)
    lat = np.where(ys == 0.0, 0.0, lat)
    return lon, lat
