"""``transform_xy`` — vectorized CRS transform with the reference's exact
NaN semantics (rasters/transform_xy.py:4-54):

- always (x, y) axis order (the reference passes always_xy=True everywhere:
  transform_xy.py:46, multi_point.py:416-420, vector_geometry.py:71);
- when the TARGET CRS is geographic, outputs outside [-180, 180] x [-90, 90]
  are set to NaN (transform_xy.py:50-52) — including for the identity
  geographic->geographic transform (pinned by tests/test_transform_xy.py).

Routing: any supported CRS pair is bridged through WGS84 geographic
coordinates (utm->utm = inverse then forward, etc.).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from . import aeqd as _aeqd
from . import albers as _aea
from . import conic as _lcc
from . import equal_area as _ea
from . import mercator as _merc
from . import equirect as _eqc
from . import geostationary as _geos
from . import sinusoidal as _sinu
from . import stereographic as _st
from . import swiss as _sw
from . import krovak as _krovak
from . import omerc as _om
from . import polyconic as _poly
from . import robinson as _rob
from . import world as _world
from . import transverse_mercator as _tm
from .crs import CRSInfo, parse_crs
from .datum import ELLIPSOIDS, datum_to_wgs84, wgs84_to_datum


def _has_datum(info: CRSInfo) -> bool:
    return info.ellps != "WGS84" or info.towgs84 is not None


def _ell(info: CRSInfo) -> Tuple[float, float]:
    return ELLIPSOIDS[info.ellps]


def _to_geographic(x: np.ndarray, y: np.ndarray, info: CRSInfo) -> Tuple[np.ndarray, np.ndarray]:
    if _has_datum(info):
        if info.kind not in ("utm", "tmerc", "somerc", "krovak", "omerc"):
            raise ValueError(
                f"non-WGS84 datum is only supported for utm/tmerc/somerc/"
                f"krovak/omerc CRSs, not {info.kind}"
            )
        a, f = _ell(info)
        if info.kind == "utm":
            lon, lat = _tm.utm_to_geographic(x, y, info.zone, info.south, a, f)
        elif info.kind == "somerc":
            lon, lat = _sw.somerc_to_geographic(
                x, y, info.lat_0, info.lon_0, info.k_0, info.x_0, info.y_0, a, f
            )
        elif info.kind == "krovak":  # fixed S-JTSK/Bessel parameterization
            lon, lat = _krovak.krovak_to_geographic(x, y)
        elif info.kind == "omerc":
            lon, lat = _om.omerc_to_geographic(
                x, y, info.lat_0, info.lon_0, info.alpha, info.gamma,
                info.k_0, info.x_0, info.y_0, ellps=info.ellps,
                variant="A" if info.no_uoff else "B",
            )
        else:
            lon, lat = _tm.tmerc_to_geographic(
                x, y, info.lat_0, info.lon_0, info.k_0, info.x_0, info.y_0, a, f
            )
        return datum_to_wgs84(lon, lat, info.ellps, info.towgs84)
    if info.kind == "geographic":
        return x, y
    if info.kind == "utm":
        return _tm.utm_to_geographic(x, y, info.zone, info.south)
    if info.kind == "aeqd":
        return _aeqd.aeqd_to_geographic(x, y, info.lon_0, info.lat_0)
    if info.kind == "sinu":
        return _sinu.sinu_to_geographic(
            x, y, info.lon_0, radius=info.radius, x_0=info.x_0, y_0=info.y_0
        )
    if info.kind == "lcc":
        return _lcc.lcc_to_geographic(
            x, y, info.lat_1, info.lat_2, info.lat_0, info.lon_0, info.x_0, info.y_0
        )
    if info.kind == "webmerc":
        return _merc.webmerc_to_geographic(x, y)
    if info.kind == "merc":
        return _merc.merc_to_geographic(x, y)
    if info.kind == "stere":
        return _st.polar_stereo_to_geographic(
            x, y, info.lat_ts, info.lon_0, info.south, info.x_0, info.y_0,
            k_0=info.k_0,
        )
    if info.kind == "aea":
        return _aea.aea_to_geographic(
            x, y, info.lat_1, info.lat_2, info.lat_0, info.lon_0, info.x_0, info.y_0
        )
    if info.kind == "laea":
        return _ea.laea_to_geographic(
            x, y, info.lat_0, info.lon_0, info.x_0, info.y_0
        )
    if info.kind == "cea":
        return _ea.cea_to_geographic(
            x, y, info.lat_ts, info.lon_0, info.x_0, info.y_0
        )
    if info.kind == "tmerc":
        return _tm.tmerc_to_geographic(
            x, y, info.lat_0, info.lon_0, info.k_0, info.x_0, info.y_0
        )
    if info.kind == "geos":
        return _geos.geos_to_geographic(
            x, y, info.h, info.lon_0, info.sweep_x, info.x_0, info.y_0
        )
    if info.kind == "eqc":
        return _eqc.eqc_to_geographic(
            x, y, info.lat_ts, info.lat_0, info.lon_0, info.x_0, info.y_0
        )
    if info.kind == "somerc":  # WGS84-datum somerc (no shift requested)
        return _sw.somerc_to_geographic(
            x, y, info.lat_0, info.lon_0, info.k_0, info.x_0, info.y_0,
            *ELLIPSOIDS["WGS84"]
        )
    if info.kind == "moll":
        return _world.moll_to_geographic(
            x, y, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _world.R_WGS84
        )
    if info.kind == "eck4":
        return _world.eck4_to_geographic(
            x, y, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _world.R_WGS84
        )
    if info.kind == "eqearth":
        return _ea.eqearth_to_geographic(
            x, y, info.lon_0, info.x_0, info.y_0, radius=info.radius
        )
    if info.kind == "robin":
        return _rob.robin_to_geographic(
            x, y, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _rob.R_WGS84
        )
    if info.kind == "wintri":
        return _world.wintri_to_geographic(
            x, y, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _world.R_WGS84
        )
    if info.kind == "hammer":
        return _world.hammer_to_geographic(
            x, y, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _world.R_WGS84
        )
    if info.kind == "natearth":
        return _world.natearth_to_geographic(
            x, y, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _world.R_WGS84
        )
    if info.kind == "vandg":
        return _world.vandg_to_geographic(
            x, y, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _world.R_WGS84
        )
    if info.kind == "aitoff":
        return _world.aitoff_to_geographic(
            x, y, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _world.R_WGS84
        )
    if info.kind == "mill":
        return _world.mill_to_geographic(
            x, y, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _world.R_WGS84
        )
    if info.kind == "eck6":
        return _world.eck6_to_geographic(
            x, y, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _world.R_WGS84
        )
    if info.kind == "ortho":
        return _world.ortho_to_geographic(
            x, y, info.lat_0, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _world.R_WGS84
        )
    if info.kind == "gnom":
        return _world.gnom_to_geographic(
            x, y, info.lat_0, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _world.R_WGS84
        )
    if info.kind == "poly":
        return _poly.poly_to_geographic(
            x, y, info.lat_0, info.lon_0, info.x_0, info.y_0
        )
    if info.kind == "cass":
        return _poly.cass_to_geographic(
            x, y, info.lat_0, info.lon_0, info.x_0, info.y_0
        )
    if info.kind == "omerc":  # WGS84-datum omerc (no shift requested)
        return _om.omerc_to_geographic(
            x, y, info.lat_0, info.lon_0, info.alpha, info.gamma,
            info.k_0, info.x_0, info.y_0, ellps="WGS84",
            variant="A" if info.no_uoff else "B",
        )
    if info.kind == "bonne":
        return _poly.bonne_to_geographic(
            x, y, info.lat_1, info.lon_0, info.x_0, info.y_0
        )
    if info.kind == "goode":
        return _world.goode_to_geographic(
            x, y, info.lon_0, radius=info.radius or _world.R_WGS84
        )
    if info.kind == "igh":
        return _world.igh_to_geographic(
            x, y, radius=info.radius or _world.R_WGS84
        )
    raise ValueError(f"unsupported CRS kind: {info.kind}")


def _from_geographic(lon: np.ndarray, lat: np.ndarray, info: CRSInfo) -> Tuple[np.ndarray, np.ndarray]:
    if _has_datum(info):
        if info.kind not in ("utm", "tmerc", "somerc", "krovak", "omerc"):
            raise ValueError(
                f"non-WGS84 datum is only supported for utm/tmerc/somerc/"
                f"krovak/omerc CRSs, not {info.kind}"
            )
        lon, lat = wgs84_to_datum(lon, lat, info.ellps, info.towgs84)
        a, f = _ell(info)
        if info.kind == "utm":
            return _tm.geographic_to_utm(lon, lat, info.zone, info.south, a, f)
        if info.kind == "somerc":
            return _sw.geographic_to_somerc(
                lon, lat, info.lat_0, info.lon_0, info.k_0, info.x_0, info.y_0, a, f
            )
        if info.kind == "krovak":  # fixed S-JTSK/Bessel parameterization
            return _krovak.geographic_to_krovak(lon, lat)
        if info.kind == "omerc":
            return _om.geographic_to_omerc(
                lon, lat, info.lat_0, info.lon_0, info.alpha, info.gamma,
                info.k_0, info.x_0, info.y_0, ellps=info.ellps,
                variant="A" if info.no_uoff else "B",
            )
        return _tm.geographic_to_tmerc(
            lon, lat, info.lat_0, info.lon_0, info.k_0, info.x_0, info.y_0, a, f
        )
    if info.kind == "geographic":
        return lon, lat
    if info.kind == "utm":
        return _tm.geographic_to_utm(lon, lat, info.zone, info.south)
    if info.kind == "aeqd":
        return _aeqd.geographic_to_aeqd(lon, lat, info.lon_0, info.lat_0)
    if info.kind == "sinu":
        return _sinu.geographic_to_sinu(
            lon, lat, info.lon_0, radius=info.radius, x_0=info.x_0, y_0=info.y_0
        )
    if info.kind == "lcc":
        return _lcc.geographic_to_lcc(
            lon, lat, info.lat_1, info.lat_2, info.lat_0, info.lon_0, info.x_0, info.y_0
        )
    if info.kind == "webmerc":
        return _merc.geographic_to_webmerc(lon, lat)
    if info.kind == "merc":
        return _merc.geographic_to_merc(lon, lat)
    if info.kind == "stere":
        return _st.geographic_to_polar_stereo(
            lon, lat, info.lat_ts, info.lon_0, info.south, info.x_0, info.y_0,
            k_0=info.k_0,
        )
    if info.kind == "aea":
        return _aea.geographic_to_aea(
            lon, lat, info.lat_1, info.lat_2, info.lat_0, info.lon_0, info.x_0, info.y_0
        )
    if info.kind == "laea":
        return _ea.geographic_to_laea(
            lon, lat, info.lat_0, info.lon_0, info.x_0, info.y_0
        )
    if info.kind == "cea":
        return _ea.geographic_to_cea(
            lon, lat, info.lat_ts, info.lon_0, info.x_0, info.y_0
        )
    if info.kind == "tmerc":
        return _tm.geographic_to_tmerc(
            lon, lat, info.lat_0, info.lon_0, info.k_0, info.x_0, info.y_0
        )
    if info.kind == "geos":
        return _geos.geographic_to_geos(
            lon, lat, info.h, info.lon_0, info.sweep_x, info.x_0, info.y_0
        )
    if info.kind == "eqc":
        return _eqc.geographic_to_eqc(
            lon, lat, info.lat_ts, info.lat_0, info.lon_0, info.x_0, info.y_0
        )
    if info.kind == "somerc":  # WGS84-datum somerc (no shift requested)
        return _sw.geographic_to_somerc(
            lon, lat, info.lat_0, info.lon_0, info.k_0, info.x_0, info.y_0,
            *ELLIPSOIDS["WGS84"]
        )
    if info.kind == "eck4":
        return _world.geographic_to_eck4(
            lon, lat, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _world.R_WGS84
        )
    if info.kind == "eqearth":
        return _ea.geographic_to_eqearth(
            lon, lat, info.lon_0, info.x_0, info.y_0, radius=info.radius
        )
    if info.kind == "robin":
        return _rob.geographic_to_robin(
            lon, lat, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _rob.R_WGS84
        )
    if info.kind == "wintri":
        return _world.geographic_to_wintri(
            lon, lat, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _world.R_WGS84
        )
    if info.kind == "hammer":
        return _world.geographic_to_hammer(
            lon, lat, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _world.R_WGS84
        )
    if info.kind == "natearth":
        return _world.geographic_to_natearth(
            lon, lat, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _world.R_WGS84
        )
    if info.kind == "vandg":
        return _world.geographic_to_vandg(
            lon, lat, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _world.R_WGS84
        )
    if info.kind == "aitoff":
        return _world.geographic_to_aitoff(
            lon, lat, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _world.R_WGS84
        )
    if info.kind == "mill":
        return _world.geographic_to_mill(
            lon, lat, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _world.R_WGS84
        )
    if info.kind == "eck6":
        return _world.geographic_to_eck6(
            lon, lat, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _world.R_WGS84
        )
    if info.kind == "moll":
        return _world.geographic_to_moll(
            lon, lat, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _world.R_WGS84
        )
    if info.kind == "ortho":
        return _world.geographic_to_ortho(
            lon, lat, info.lat_0, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _world.R_WGS84
        )
    if info.kind == "gnom":
        return _world.geographic_to_gnom(
            lon, lat, info.lat_0, info.lon_0, info.x_0, info.y_0,
            radius=info.radius or _world.R_WGS84
        )
    if info.kind == "poly":
        return _poly.geographic_to_poly(
            lon, lat, info.lat_0, info.lon_0, info.x_0, info.y_0
        )
    if info.kind == "cass":
        return _poly.geographic_to_cass(
            lon, lat, info.lat_0, info.lon_0, info.x_0, info.y_0
        )
    if info.kind == "omerc":  # WGS84-datum omerc (no shift requested)
        return _om.geographic_to_omerc(
            lon, lat, info.lat_0, info.lon_0, info.alpha, info.gamma,
            info.k_0, info.x_0, info.y_0, ellps="WGS84",
            variant="A" if info.no_uoff else "B",
        )
    if info.kind == "bonne":
        return _poly.geographic_to_bonne(
            lon, lat, info.lat_1, info.lon_0, info.x_0, info.y_0
        )
    if info.kind == "goode":
        return _world.geographic_to_goode(
            lon, lat, info.lon_0, radius=info.radius or _world.R_WGS84
        )
    if info.kind == "igh":
        return _world.geographic_to_igh(
            lon, lat, radius=info.radius or _world.R_WGS84
        )
    raise ValueError(f"unsupported CRS kind: {info.kind}")


def transform_xy(x, y, source_crs: str, target_crs: str) -> Tuple[np.ndarray, np.ndarray]:
    """Transform coordinate arrays between CRSs; scalar or ndarray in,
    float64 ndarray out (shape preserved)."""
    src = parse_crs(source_crs)
    dst = parse_crs(target_crs)

    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)

    if src == dst:
        xt, yt = x.copy(), y.copy()
    else:
        lon, lat = _to_geographic(x, y, src)
        xt, yt = _from_geographic(lon, lat, dst)
        xt = np.asarray(xt, dtype=np.float64)
        yt = np.asarray(yt, dtype=np.float64)

    if dst.is_geographic:
        # clip to valid geographic bounds -> NaN (transform_xy.py:50-52)
        xt = np.where((xt < -180.0) | (xt > 180.0), np.nan, xt)
        yt = np.where((yt < -90.0) | (yt > 90.0), np.nan, yt)

    return xt, yt


def transform_point(x: float, y: float, source_crs: str, target_crs: str) -> Tuple[float, float]:
    xt, yt = transform_xy([x], [y], source_crs, target_crs)
    return float(xt[0]), float(yt[0])
