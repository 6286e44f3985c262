"""CRS parsing and derivation — replaces pyproj for the CRS family the
reference semantics actually exercise (EPSG:4326 / UTM 326xx,327xx /
+proj=utm / +proj=aeqd / +proj=longlat).

Mirrored reference behaviors:

- default CRS is EPSG:4326 / WGS84 (rasters/CRS.py:10-34, CRS.py:179);
- equality by normalized form (EPSG-code equality, CRS.py:55-71);
- ``local_UTM_proj4``: zone = floor((lon+180)/6) clamped [1, 60], '+south'
  if lat < 0, ValueError for lon outside [-180, 180]
  (rasters/local_UTM_proj4.py:31-43). NOTE: the proj4 variant does NOT add
  +1 to the zone — the EPSG variant does (raster_geometry.py:232-238); the
  reference's own tests pin this quirk and we preserve it;
- ``center_aeqd``: '+proj=aeqd +lat_0=<lat> +lon_0=<lon>'
  (rasters/center_aeqd.py:4-14).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Optional

from .datum import DATUMS

WGS84 = "EPSG:4326"


@dataclass(frozen=True)
class CRSInfo:
    kind: str  # 'geographic' | 'utm' | 'aeqd' | 'sinu' | 'lcc' | 'merc'
    #          | 'webmerc' | 'stere' (polar) | 'aea' | 'laea' | 'cea'
    #          | 'tmerc' (general) | 'geos' | 'eqc' | 'somerc' (Swiss)
    #          | 'moll' | 'ortho' | 'goode' | 'igh' | 'eck4' (spherical)
    #          | 'krovak' (EPSG:5514 S-JTSK, fixed parameterization)
    #          | 'eqearth' (EPSG:8857, authalic-latitude Equal Earth)
    #          | 'robin' (ESRI:54030 Robinson, published-table Hermite)
    #          | 'wintri' (ESRI:54042 Winkel Tripel, phi_1 = acos(2/pi))
    #          | 'hammer' (ESRI:54044 Hammer equal-area, closed form)
    #          | 'natearth' (+proj=natearth, published 2011 polynomial)
    #          | 'vandg' (ESRI:54029 Van der Grinten I, closed form)
    #          | 'aitoff' (ESRI:54043 Aitoff, the Winkel Aitoff term)
    #          | 'mill' (ESRI:54003 Miller cylindrical, closed form)
    #          | 'eck6' (ESRI:54010 Eckert VI, fixed-Newton theta)
    #          | 'gnom' (+proj=gnom, great-circle azimuthal)
    #          | 'poly' (ESRI:54021 American Polyconic, ellipsoidal)
    #          | 'cass' (+proj=cass Cassini-Soldner, ellipsoidal)
    #          | 'bonne' (ESRI:54024 Bonne, ellipsoidal, lat_1 apex)
    #          | 'omerc' (Hotine oblique Mercator, GN7-2 9812/9815)
    zone: Optional[int] = None  # utm
    south: bool = False  # utm / polar stere aspect
    lat_0: float = 0.0  # aeqd / lcc / aea / tmerc / eqc
    lon_0: float = 0.0  # aeqd / sinu / lcc / stere / aea / tmerc / geos / eqc
    lat_1: float = 0.0  # lcc / aea standard parallels
    lat_2: float = 0.0
    x_0: float = 0.0  # false easting/northing (sinu / lcc / stere / aea / ...)
    y_0: float = 0.0
    radius: Optional[float] = None  # sinu sphere radius (None = ellipsoidal)
    lat_ts: float = 0.0  # polar stereographic / cea / eqc standard parallel
    k_0: float = 1.0  # tmerc scale factor at the natural origin
    h: Optional[float] = None  # geos satellite height above the surface
    sweep_x: bool = True  # geos scan-angle sweep axis ('x' = GOES-R)
    # datum: ellipsoid registry key (proj/datum.py ELLIPSOIDS) and the
    # 3/7-parameter position-vector Helmert to WGS84 (None = WGS84-
    # equivalent datum, no shift). Only utm/tmerc support non-WGS84
    # ellipsoids — the grids that actually sit on classical datums.
    ellps: str = "WGS84"
    towgs84: Optional[tuple] = None
    # Hotine oblique Mercator: azimuth of the initial line at the
    # center, rectified-to-skew angle (None = alpha), and the variant-A
    # flag (+no_uoff: natural origin instead of the projection center)
    alpha: float = 0.0
    gamma: Optional[float] = None
    no_uoff: bool = False

    @property
    def is_geographic(self) -> bool:
        return self.kind == "geographic"

    def _datum_suffix(self) -> str:
        if self.ellps == "WGS84" and self.towgs84 is None:
            return ""
        tw = ""
        if self.towgs84 is not None:
            tw = " +towgs84=" + ",".join(repr(v) for v in self.towgs84)
        return f" +ellps={self.ellps}{tw}"

    def canonical(self) -> str:
        if self.kind == "geographic":
            return "EPSG:4326"
        if self.kind == "utm":
            if self.ellps != "WGS84" or self.towgs84 is not None:
                if (self.ellps, self.towgs84) == _ED50_KEY and not self.south:
                    return f"EPSG:{23000 + self.zone}"
                return (
                    f"+proj=utm +zone={self.zone}"
                    + (" +south" if self.south else "")
                    + self._datum_suffix()
                )
            return f"EPSG:{(32700 if self.south else 32600) + self.zone}"
        if self.kind == "sinu":
            r = f" +R={self.radius}" if self.radius is not None else ""
            return f"+proj=sinu +lon_0={self.lon_0} +x_0={self.x_0} +y_0={self.y_0}{r}"
        if self.kind == "lcc":
            return (
                f"+proj=lcc +lat_1={self.lat_1} +lat_2={self.lat_2}"
                f" +lat_0={self.lat_0} +lon_0={self.lon_0}"
                f" +x_0={self.x_0} +y_0={self.y_0}"
            )
        if self.kind == "webmerc":
            return "EPSG:3857"
        if self.kind == "merc":
            return "EPSG:3395"
        if self.kind == "stere":
            lat0 = -90 if self.south else 90
            k = f" +k_0={self.k_0}" if self.k_0 != 1.0 else ""
            return (
                f"+proj=stere +lat_0={lat0} +lat_ts={self.lat_ts}"
                f" +lon_0={self.lon_0}{k} +x_0={self.x_0} +y_0={self.y_0}"
            )
        if self.kind == "aea":
            return (
                f"+proj=aea +lat_1={self.lat_1} +lat_2={self.lat_2}"
                f" +lat_0={self.lat_0} +lon_0={self.lon_0}"
                f" +x_0={self.x_0} +y_0={self.y_0}"
            )
        if self.kind == "laea":
            return (
                f"+proj=laea +lat_0={self.lat_0} +lon_0={self.lon_0}"
                f" +x_0={self.x_0} +y_0={self.y_0}"
            )
        if self.kind == "cea":
            return (
                f"+proj=cea +lat_ts={self.lat_ts} +lon_0={self.lon_0}"
                f" +x_0={self.x_0} +y_0={self.y_0}"
            )
        if self.kind == "tmerc":
            return (
                f"+proj=tmerc +lat_0={self.lat_0} +lon_0={self.lon_0}"
                f" +k_0={self.k_0} +x_0={self.x_0} +y_0={self.y_0}"
                + self._datum_suffix()
            )
        if self.kind == "goode":
            r = f" +R={self.radius}" if self.radius is not None else ""
            return f"+proj=goode +lon_0={self.lon_0}{r}"
        if self.kind == "igh":
            r = f" +R={self.radius}" if self.radius is not None else ""
            return f"+proj=igh{r}"
        if self.kind == "moll":
            r = f" +R={self.radius}" if self.radius is not None else ""
            return (f"+proj=moll +lon_0={self.lon_0}"
                    f" +x_0={self.x_0} +y_0={self.y_0}{r}")
        if self.kind == "eck4":
            r = f" +R={self.radius}" if self.radius is not None else ""
            return (f"+proj=eck4 +lon_0={self.lon_0}"
                    f" +x_0={self.x_0} +y_0={self.y_0}{r}")
        if self.kind == "krovak":
            return "EPSG:5514"
        if self.kind == "eqearth":
            r = f" +R={self.radius}" if self.radius is not None else ""
            return (f"+proj=eqearth +lon_0={self.lon_0}"
                    f" +x_0={self.x_0} +y_0={self.y_0}{r}")
        if self.kind == "robin":
            r = f" +R={self.radius}" if self.radius is not None else ""
            return (f"+proj=robin +lon_0={self.lon_0}"
                    f" +x_0={self.x_0} +y_0={self.y_0}{r}")
        if self.kind == "wintri":
            r = f" +R={self.radius}" if self.radius is not None else ""
            return (f"+proj=wintri +lon_0={self.lon_0}"
                    f" +x_0={self.x_0} +y_0={self.y_0}{r}")
        if self.kind == "hammer":
            r = f" +R={self.radius}" if self.radius is not None else ""
            return (f"+proj=hammer +lon_0={self.lon_0}"
                    f" +x_0={self.x_0} +y_0={self.y_0}{r}")
        if self.kind == "natearth":
            r = f" +R={self.radius}" if self.radius is not None else ""
            return (f"+proj=natearth +lon_0={self.lon_0}"
                    f" +x_0={self.x_0} +y_0={self.y_0}{r}")
        if self.kind == "vandg":
            r = f" +R={self.radius}" if self.radius is not None else ""
            return (f"+proj=vandg +lon_0={self.lon_0}"
                    f" +x_0={self.x_0} +y_0={self.y_0}{r}")
        if self.kind == "aitoff":
            r = f" +R={self.radius}" if self.radius is not None else ""
            return (f"+proj=aitoff +lon_0={self.lon_0}"
                    f" +x_0={self.x_0} +y_0={self.y_0}{r}")
        if self.kind == "mill":
            r = f" +R={self.radius}" if self.radius is not None else ""
            return (f"+proj=mill +lon_0={self.lon_0}"
                    f" +x_0={self.x_0} +y_0={self.y_0}{r}")
        if self.kind == "eck6":
            r = f" +R={self.radius}" if self.radius is not None else ""
            return (f"+proj=eck6 +lon_0={self.lon_0}"
                    f" +x_0={self.x_0} +y_0={self.y_0}{r}")
        if self.kind == "ortho":
            r = f" +R={self.radius}" if self.radius is not None else ""
            return (f"+proj=ortho +lat_0={self.lat_0} +lon_0={self.lon_0}"
                    f" +x_0={self.x_0} +y_0={self.y_0}{r}")
        if self.kind == "gnom":
            r = f" +R={self.radius}" if self.radius is not None else ""
            return (f"+proj=gnom +lat_0={self.lat_0} +lon_0={self.lon_0}"
                    f" +x_0={self.x_0} +y_0={self.y_0}{r}")
        if self.kind == "poly":
            return (f"+proj=poly +lat_0={self.lat_0} +lon_0={self.lon_0}"
                    f" +x_0={self.x_0} +y_0={self.y_0}")
        if self.kind == "cass":
            return (f"+proj=cass +lat_0={self.lat_0} +lon_0={self.lon_0}"
                    f" +x_0={self.x_0} +y_0={self.y_0}")
        if self.kind == "bonne":
            return (f"+proj=bonne +lat_1={self.lat_1} +lon_0={self.lon_0}"
                    f" +x_0={self.x_0} +y_0={self.y_0}")
        if self.kind == "omerc":
            g = f" +gamma={self.gamma}" if self.gamma is not None else ""
            nu = " +no_uoff" if self.no_uoff else ""
            return (f"+proj=omerc +lat_0={self.lat_0} +lonc={self.lon_0}"
                    f" +alpha={self.alpha}{g} +k_0={self.k_0}"
                    f" +x_0={self.x_0} +y_0={self.y_0}{nu}"
                    + self._datum_suffix())
        if self.kind == "somerc":
            if (self.ellps, self.towgs84) == _CH1903 and self.x_0 == 600000.0:
                return "EPSG:21781"
            if (self.ellps, self.towgs84) == _CH1903P and self.x_0 == 2600000.0:
                return "EPSG:2056"
            return (
                f"+proj=somerc +lat_0={self.lat_0} +lon_0={self.lon_0}"
                f" +k_0={self.k_0} +x_0={self.x_0} +y_0={self.y_0}"
                + self._datum_suffix()
            )
        if self.kind == "geos":
            sweep = "x" if self.sweep_x else "y"
            return (
                f"+proj=geos +h={self.h} +lon_0={self.lon_0}"
                f" +sweep={sweep} +x_0={self.x_0} +y_0={self.y_0}"
            )
        if self.kind == "eqc":
            return (
                f"+proj=eqc +lat_ts={self.lat_ts} +lat_0={self.lat_0}"
                f" +lon_0={self.lon_0} +x_0={self.x_0} +y_0={self.y_0}"
            )
        return f"+proj=aeqd +lat_0={self.lat_0} +lon_0={self.lon_0}"


_EPSG_RE = re.compile(r"^EPSG:(\d+)$", re.I)

_ED50_KEY = (DATUMS["ED50"][0], DATUMS["ED50"][1])
_OSGB36 = (DATUMS["OSGB36"][0], DATUMS["OSGB36"][1])
_TM65 = (DATUMS["TM65"][0], DATUMS["TM65"][1])
_TM75 = (DATUMS["TM75"][0], DATUMS["TM75"][1])
_CH1903 = (DATUMS["CH1903"][0], DATUMS["CH1903"][1])
_CH1903P = (DATUMS["CH1903+"][0], DATUMS["CH1903+"][1])
# Swiss projection center (Bern old observatory): 46deg57'08.66" N,
# 7deg26'22.50" E — shared by LV03 and LV95
_SWISS_LAT0 = 46.0 + 57.0 / 60.0 + 8.66 / 3600.0
_SWISS_LON0 = 7.0 + 26.0 / 60.0 + 22.50 / 3600.0


def parse_crs(crs: str) -> CRSInfo:
    """Parse a CRS string into the engine's CRSInfo. Raises ValueError for
    unsupported CRSs (the supported family is all the reference semantics
    require — SURVEY.md §7.0)."""
    s = str(crs).strip()
    if s[:1].isalpha() and "[" in s and s.split("[", 1)[0].strip().upper() in (
            "GEOGCS", "PROJCS", "GEOGCRS", "PROJCRS", "GEODCRS", "COMPD_CS",
            "BOUNDCRS"):
        # WKT (1 or 2): resolve through the LAST authority/id entry —
        # the outermost CRS's own code (inner datum/axis ids come first)
        ids = re.findall(
            r'(?:AUTHORITY|ID)\s*\[\s*"EPSG"\s*,\s*"?(\d+)"?', s, re.I)
        if not ids:
            raise ValueError(
                "WKT CRS without an EPSG AUTHORITY/ID entry; pass an "
                "EPSG:<code> or proj4 string instead")
        return parse_crs(f"EPSG:{ids[-1]}")
    if re.match(r"^ESRI:54009$", s, re.I):
        return CRSInfo("moll")
    if re.match(r"^ESRI:54012$", s, re.I):
        return CRSInfo("eck4")
    if re.match(r"^ESRI:54035$", s, re.I):  # World Equal Earth (ESRI alias)
        return CRSInfo("eqearth")
    if re.match(r"^ESRI:54030$", s, re.I):  # World Robinson
        return CRSInfo("robin")
    if re.match(r"^ESRI:54042$", s, re.I):  # World Winkel Tripel
        return CRSInfo("wintri")
    if re.match(r"^ESRI:54044$", s, re.I):  # World Hammer Aitoff
        return CRSInfo("hammer")
    if re.match(r"^ESRI:54029$", s, re.I):  # World Van der Grinten I
        return CRSInfo("vandg")
    if re.match(r"^ESRI:54043$", s, re.I):  # World Aitoff
        return CRSInfo("aitoff")
    if re.match(r"^ESRI:54003$", s, re.I):  # World Miller Cylindrical
        return CRSInfo("mill")
    if re.match(r"^ESRI:54010$", s, re.I):  # World Eckert VI
        return CRSInfo("eck6")
    if re.match(r"^ESRI:54021$", s, re.I):  # World Polyconic
        return CRSInfo("poly")
    if re.match(r"^ESRI:54024$", s, re.I):  # World Bonne (lat_1 = 60N)
        return CRSInfo("bonne", lat_1=60.0)
    m = _EPSG_RE.match(s)
    if m:
        code = int(m.group(1))
        if code == 4326:
            return CRSInfo("geographic")
        if code == 3857 or code == 900913:
            return CRSInfo("webmerc")
        if code == 3395:
            return CRSInfo("merc")
        if 32601 <= code <= 32660:
            return CRSInfo("utm", zone=code - 32600, south=False)
        if 32701 <= code <= 32760:
            return CRSInfo("utm", zone=code - 32700, south=True)
        if 25828 <= code <= 25838:
            # ETRS89 / UTM zones 28N-38N (Europe). ETRS89 ~ WGS84 at
            # raster scale (the same GRS80~WGS84 alias EPSG:3035 uses)
            return CRSInfo("utm", zone=code - 25800, south=False)
        if 26901 <= code <= 26923:
            # NAD83 / UTM zones 1N-23N (US/Canada). NAD83 ~ WGS84 at
            # raster scale (sub-2 m; the standard 0-parameter alias)
            return CRSInfo("utm", zone=code - 26900, south=False)
        if code == 3413:  # NSIDC Sea Ice North (WGS84)
            return CRSInfo("stere", south=False, lat_ts=70.0, lon_0=-45.0)
        if code == 3411:
            # Legacy NSIDC grid on the Hughes 1980 ellipsoid — NOT the
            # WGS84 parameterization; aliasing it to 3413 would be wrong
            # by up to hundreds of meters, so refuse instead.
            raise ValueError(
                "EPSG:3411 uses the Hughes 1980 ellipsoid, which this engine "
                "does not implement; reproject the data to EPSG:3413 (the "
                "WGS84 successor grid) upstream"
            )
        if code in (32661, 5041):
            # WGS 84 / UPS North — polar stereographic variant A,
            # k0 = 0.994, false origin 2,000 km (axis order is
            # irrelevant here: the engine always returns x=E, y=N)
            return CRSInfo("stere", south=False, lat_ts=90.0, lon_0=0.0,
                           k_0=0.994, x_0=2000000.0, y_0=2000000.0)
        if code in (32761, 5042):  # WGS 84 / UPS South
            return CRSInfo("stere", south=True, lat_ts=-90.0, lon_0=0.0,
                           k_0=0.994, x_0=2000000.0, y_0=2000000.0)
        if code == 3976:  # NSIDC Sea Ice South
            return CRSInfo("stere", south=True, lat_ts=-70.0, lon_0=0.0)
        if code == 3031:  # Antarctic Polar Stereographic
            return CRSInfo("stere", south=True, lat_ts=-71.0, lon_0=0.0)
        if code == 5070:  # CONUS Albers (NAD83/GRS80 ~ WGS84 here)
            return CRSInfo("aea", lat_1=29.5, lat_2=45.5, lat_0=23.0, lon_0=-96.0)
        if code == 3577:  # GDA94 / Australian Albers (GRS80 ~ WGS84)
            return CRSInfo("aea", lat_1=-18.0, lat_2=-36.0, lat_0=0.0,
                           lon_0=132.0)
        if code == 2154:
            # RGF93 / Lambert-93 — the French national grid (LCC 2SP on
            # GRS80 ~ WGS84; RGF93 is ETRS89-equivalent)
            return CRSInfo("lcc", lat_1=49.0, lat_2=44.0, lat_0=46.5,
                           lon_0=3.0, x_0=700000.0, y_0=6600000.0)
        if code == 3035:  # European LAEA (ETRS89/GRS80 ~ WGS84 here)
            return CRSInfo("laea", lat_0=52.0, lon_0=10.0,
                           x_0=4321000.0, y_0=3210000.0)
        if code == 6931:  # EASE-Grid 2.0 North (polar LAEA)
            return CRSInfo("laea", lat_0=90.0, lon_0=0.0)
        if code == 6932:  # EASE-Grid 2.0 South
            return CRSInfo("laea", lat_0=-90.0, lon_0=0.0)
        if code == 6933:  # EASE-Grid 2.0 Global (cylindrical equal-area)
            return CRSInfo("cea", lat_ts=30.0, lon_0=0.0)
        if code == 8857:  # WGS 84 / Equal Earth Greenwich (method 1078)
            return CRSInfo("eqearth")
        if code == 2193:  # NZTM2000 (NZGD2000/GRS80 ~ WGS84 here)
            return CRSInfo("tmerc", lat_0=0.0, lon_0=173.0, k_0=0.9996,
                           x_0=1600000.0, y_0=10000000.0)
        if 25828 <= code <= 25838:  # ETRS89 / UTM zones (GRS80 ~ WGS84)
            return CRSInfo("utm", zone=code - 25800, south=False)
        if code in (4087, 32662):  # WGS84 Equidistant Cylindrical / Plate Carrée
            return CRSInfo("eqc")
        if code == 27700:
            # British National Grid: TM on Airy 1830 + the OSGB36 single
            # Helmert (EPSG transformation 1314). Accuracy vs the OSTN15
            # grid is the documented ~3.5 m of the national Helmert
            # (pinned against the OS guide's Caister worked example in
            # tests); survey-grade OSTN15 interpolation is out of scope.
            return CRSInfo(
                "tmerc", lat_0=49.0, lon_0=-2.0, k_0=0.9996012717,
                x_0=400000.0, y_0=-100000.0,
                ellps=_OSGB36[0], towgs84=_OSGB36[1],
            )
        if code in (29902, 29903):
            # Irish Grid on TM65 (29902) / TM75 (29903) — Airy Modified,
            # EPSG transformations 1640/1641
            dat = _TM65 if code == 29902 else _TM75
            return CRSInfo(
                "tmerc", lat_0=53.5, lon_0=-8.0, k_0=1.000035,
                x_0=200000.0, y_0=250000.0, ellps=dat[0], towgs84=dat[1],
            )
        if code == 29873:
            # Timbalai 1948 / RSO Borneo (m) — Hotine oblique Mercator
            # variant B on Everest 1830 (1967), the GN7-2 method 9815
            # worked-example CRS (pinned to the published cm in
            # tests/test_proj.py)
            return CRSInfo(
                "omerc", lat_0=4.0, lon_0=115.0,
                alpha=53.0 + 18.0 / 60.0 + 56.9537 / 3600.0,
                gamma=53.0 + 7.0 / 60.0 + 48.3685 / 3600.0,
                k_0=0.99984, x_0=590476.87, y_0=442857.65,
                ellps=DATUMS["Timbalai"][0], towgs84=DATUMS["Timbalai"][1],
            )
        if code == 5514:
            # S-JTSK / Krovak East North — the Czech/Slovak national
            # grid (Krovak oblique conformal conic on Bessel 1841 with
            # the EPSG 1622 geocentric translations)
            return CRSInfo("krovak", ellps=DATUMS["S-JTSK"][0],
                           towgs84=DATUMS["S-JTSK"][1])
        if code in (21781, 2056):
            # Swiss grids: CH1903/LV03 (21781) and CH1903+/LV95 (2056) —
            # oblique Mercator (EPSG 9814) on Bessel 1841 with the
            # EPSG-published geocentric translations to WGS84
            dat = _CH1903 if code == 21781 else _CH1903P
            x0, y0 = (600000.0, 200000.0) if code == 21781 else (
                2600000.0, 1200000.0)
            return CRSInfo(
                "somerc", lat_0=_SWISS_LAT0, lon_0=_SWISS_LON0, k_0=1.0,
                x_0=x0, y_0=y0, ellps=dat[0], towgs84=dat[1],
            )
        if 23028 <= code <= 23038:
            # ED50 / UTM zones 28N-38N (International 1924, EPSG
            # transformation 1133 mean-European 3-param shift)
            return CRSInfo(
                "utm", zone=code - 23000, south=False,
                ellps=_ED50_KEY[0], towgs84=_ED50_KEY[1],
            )
        raise ValueError(f"unsupported EPSG code: {code}")
    low = s.lower()

    def _p(name: str, default: float = 0.0) -> float:
        # exponent sign must be inside the optional group: '1e-5' would
        # otherwise match only '1e' and fail float()
        pm = re.search(rf"\+{name}=(-?[\d.]+(?:[eE][-+]?\d+)?)", low)
        return float(pm.group(1)) if pm else default

    def _datum_fields() -> dict:
        """+ellps= / +towgs84= proj4 datum fields for utm/tmerc. WGS84
        and the WGS84-equivalent modern ellipsoids map to the default
        (GRS80's flattening differs from WGS84's by 0.1 mm — the same
        ETRS89~WGS84 alias the EPSG branches use)."""
        em = re.search(r"\+ellps=([a-z0-9_]+)", low)
        ellps = {"wgs84": "WGS84", "grs80": "WGS84", "airy": "airy",
                 "mod_airy": "mod_airy", "intl": "intl", "bessel": "bessel",
                 "evrst30": "evrst30",
                 }.get(em.group(1)) if em else "WGS84"
        if ellps is None:
            raise ValueError(f"unsupported +ellps={em.group(1)} in: {s}")
        tm_ = re.search(r"\+towgs84=([-\d.,eE+]+)", low)
        towgs84 = None
        if tm_:
            vals = tuple(float(v) for v in tm_.group(1).split(","))
            if len(vals) not in (3, 7):
                raise ValueError(f"+towgs84 needs 3 or 7 values: {s}")
            if any(vals):
                towgs84 = vals
        return {"ellps": ellps, "towgs84": towgs84}

    if "+proj=longlat" in low or low in ("wgs84", "epsg:4326"):
        return CRSInfo("geographic")
    if "+proj=utm" in low:
        zm = re.search(r"\+zone=(\d+)", low)
        if not zm:
            raise ValueError(f"UTM proj4 without +zone: {s}")
        return CRSInfo("utm", zone=int(zm.group(1)), south="+south" in low,
                       **_datum_fields())
    if "+proj=aeqd" in low:
        return CRSInfo("aeqd", lat_0=_p("lat_0"), lon_0=_p("lon_0"))
    if "+proj=sinu" in low:
        # sphere when +R is given or +a == +b (the MODIS grid publishes
        # +a=6371007.181 +b=6371007.181); WGS84 ellipsoid otherwise
        rm = re.search(r"\+r=(-?[\d.eE+]+)", low)
        radius = float(rm.group(1)) if rm else None
        if radius is None:
            am = re.search(r"\+a=(-?[\d.eE+]+)", low)
            bm = re.search(r"\+b=(-?[\d.eE+]+)", low)
            if am and bm and float(am.group(1)) == float(bm.group(1)):
                radius = float(am.group(1))
        return CRSInfo(
            "sinu", lon_0=_p("lon_0"), x_0=_p("x_0"), y_0=_p("y_0"), radius=radius
        )
    if "+proj=lcc" in low:
        lat_1 = _p("lat_1")
        return CRSInfo(
            "lcc",
            lat_1=lat_1,
            lat_2=_p("lat_2", lat_1),  # 1SP when only lat_1 given
            lat_0=_p("lat_0"),
            lon_0=_p("lon_0"),
            x_0=_p("x_0"),
            y_0=_p("y_0"),
        )
    if "+proj=webmerc" in low:
        return CRSInfo("webmerc")
    if "+proj=merc" in low:
        return CRSInfo("merc")
    if "+proj=stere" in low:
        lat0 = _p("lat_0", 90.0)
        if abs(lat0) != 90.0:
            raise ValueError(
                f"only POLAR stereographic supported (+lat_0=+/-90): {s}"
            )
        lat_ts = _p("lat_ts", lat0)
        return CRSInfo(
            "stere", south=lat0 < 0, lat_ts=lat_ts, lon_0=_p("lon_0"),
            k_0=_p("k_0", _p("k", 1.0)),
            x_0=_p("x_0"), y_0=_p("y_0"),
        )
    if "+proj=aea" in low:
        lat_1 = _p("lat_1")
        return CRSInfo(
            "aea", lat_1=lat_1, lat_2=_p("lat_2", lat_1), lat_0=_p("lat_0"),
            lon_0=_p("lon_0"), x_0=_p("x_0"), y_0=_p("y_0"),
        )
    if "+proj=laea" in low:
        return CRSInfo(
            "laea", lat_0=_p("lat_0"), lon_0=_p("lon_0"),
            x_0=_p("x_0"), y_0=_p("y_0"),
        )
    if "+proj=cea" in low:
        return CRSInfo(
            "cea", lat_ts=_p("lat_ts"), lon_0=_p("lon_0"),
            x_0=_p("x_0"), y_0=_p("y_0"),
        )
    if "+proj=goode" in low:
        rm = re.search(r"\+r=(-?[\d.eE+]+)", low)
        return CRSInfo("goode", lon_0=_p("lon_0"),
                       radius=float(rm.group(1)) if rm else None)
    if "+proj=igh" in low:
        rm = re.search(r"\+r=(-?[\d.eE+]+)", low)
        return CRSInfo("igh", radius=float(rm.group(1)) if rm else None)
    if "+proj=moll" in low:
        rm = re.search(r"\+r=(-?[\d.eE+]+)", low)
        return CRSInfo(
            "moll", lon_0=_p("lon_0"), x_0=_p("x_0"), y_0=_p("y_0"),
            radius=float(rm.group(1)) if rm else None,
        )
    if "+proj=eqearth" in low:
        # +R selects PROJ's SPHERICAL Equal Earth (geodetic latitude on
        # that sphere); without it this is the EPSG:8857 authalic method
        rm = re.search(r"\+r=(-?[\d.eE+]+)", low)
        return CRSInfo(
            "eqearth", lon_0=_p("lon_0"), x_0=_p("x_0"), y_0=_p("y_0"),
            radius=float(rm.group(1)) if rm else None,
        )
    if "+proj=robin" in low:
        rm = re.search(r"\+r=(-?[\d.eE+]+)", low)
        return CRSInfo(
            "robin", lon_0=_p("lon_0"), x_0=_p("x_0"), y_0=_p("y_0"),
            radius=float(rm.group(1)) if rm else None,
        )
    if "+proj=wintri" in low:
        rm = re.search(r"\+r=(-?[\d.eE+]+)", low)
        return CRSInfo(
            "wintri", lon_0=_p("lon_0"), x_0=_p("x_0"), y_0=_p("y_0"),
            radius=float(rm.group(1)) if rm else None,
        )
    if "+proj=hammer" in low:
        rm = re.search(r"\+r=(-?[\d.eE+]+)", low)
        return CRSInfo(
            "hammer", lon_0=_p("lon_0"), x_0=_p("x_0"), y_0=_p("y_0"),
            radius=float(rm.group(1)) if rm else None,
        )
    if "+proj=natearth" in low:
        rm = re.search(r"\+r=(-?[\d.eE+]+)", low)
        return CRSInfo(
            "natearth", lon_0=_p("lon_0"), x_0=_p("x_0"), y_0=_p("y_0"),
            radius=float(rm.group(1)) if rm else None,
        )
    if "+proj=vandg" in low:
        rm = re.search(r"\+r=(-?[\d.eE+]+)", low)
        return CRSInfo(
            "vandg", lon_0=_p("lon_0"), x_0=_p("x_0"), y_0=_p("y_0"),
            radius=float(rm.group(1)) if rm else None,
        )
    if "+proj=aitoff" in low:
        rm = re.search(r"\+r=(-?[\d.eE+]+)", low)
        return CRSInfo(
            "aitoff", lon_0=_p("lon_0"), x_0=_p("x_0"), y_0=_p("y_0"),
            radius=float(rm.group(1)) if rm else None,
        )
    if "+proj=mill" in low:
        rm = re.search(r"\+r=(-?[\d.eE+]+)", low)
        return CRSInfo(
            "mill", lon_0=_p("lon_0"), x_0=_p("x_0"), y_0=_p("y_0"),
            radius=float(rm.group(1)) if rm else None,
        )
    if "+proj=eck6" in low:
        rm = re.search(r"\+r=(-?[\d.eE+]+)", low)
        return CRSInfo(
            "eck6", lon_0=_p("lon_0"), x_0=_p("x_0"), y_0=_p("y_0"),
            radius=float(rm.group(1)) if rm else None,
        )
    if "+proj=eck4" in low:
        rm = re.search(r"\+r=(-?[\d.eE+]+)", low)
        return CRSInfo(
            "eck4", lon_0=_p("lon_0"), x_0=_p("x_0"), y_0=_p("y_0"),
            radius=float(rm.group(1)) if rm else None,
        )
    if "+proj=krovak" in low:
        # the engine implements exactly the EPSG:5514 parameterization
        # (east-north GIS axes, Bessel 1841, the EPSG:1622 shift). Any
        # modifier that changes it — +czech (positive southing/westing
        # axes), a custom origin/scale, a different datum shift — must
        # raise rather than silently return EPSG:5514 numbers.
        _kv_ok = re.search(
            r"\+towgs84=589(\.0)?,76(\.0)?,480(\.0)?(,0(\.0)?){0,4}\b", low)
        for bad in ("+czech", "+lat_0=", "+lon_0=", "+x_0=", "+y_0=",
                    "+k=", "+k_0=", "+alpha=", "+r=", "+towgs84=",
                    "+ellps="):
            if bad in low:
                if bad == "+towgs84=" and _kv_ok:
                    continue
                if bad == "+ellps=" and "+ellps=bessel" in low:
                    continue
                raise ValueError(
                    f"+proj=krovak with {bad.rstrip('=')} is not the "
                    "EPSG:5514 parameterization this engine implements "
                    "(S-JTSK / Krovak East North); only the standard "
                    "S-JTSK grid is supported"
                )
        return CRSInfo("krovak", ellps=DATUMS["S-JTSK"][0],
                       towgs84=DATUMS["S-JTSK"][1])
    if "+proj=ortho" in low:
        rm = re.search(r"\+r=(-?[\d.eE+]+)", low)
        return CRSInfo(
            "ortho", lat_0=_p("lat_0"), lon_0=_p("lon_0"),
            x_0=_p("x_0"), y_0=_p("y_0"),
            radius=float(rm.group(1)) if rm else None,
        )
    if "+proj=gnom" in low:
        rm = re.search(r"\+r=(-?[\d.eE+]+)", low)
        return CRSInfo(
            "gnom", lat_0=_p("lat_0"), lon_0=_p("lon_0"),
            x_0=_p("x_0"), y_0=_p("y_0"),
            radius=float(rm.group(1)) if rm else None,
        )
    if "+proj=poly" in low:
        return CRSInfo(
            "poly", lat_0=_p("lat_0"), lon_0=_p("lon_0"),
            x_0=_p("x_0"), y_0=_p("y_0"),
        )
    if "+proj=cass" in low:
        return CRSInfo(
            "cass", lat_0=_p("lat_0"), lon_0=_p("lon_0"),
            x_0=_p("x_0"), y_0=_p("y_0"),
        )
    if "+proj=bonne" in low:
        return CRSInfo(
            "bonne", lat_1=_p("lat_1"), lon_0=_p("lon_0"),
            x_0=_p("x_0"), y_0=_p("y_0"),
        )
    if "+proj=omerc" in low:
        gm = re.search(r"\+gamma=(-?[\d.]+(?:[eE][-+]?\d+)?)", low)
        return CRSInfo(
            "omerc", lat_0=_p("lat_0"), lon_0=_p("lonc", _p("lon_0")),
            alpha=_p("alpha"),
            gamma=float(gm.group(1)) if gm else None,
            k_0=_p("k_0", _p("k", 1.0)),
            x_0=_p("x_0"), y_0=_p("y_0"),
            no_uoff="+no_uoff" in low, **_datum_fields(),
        )
    if "+proj=somerc" in low:
        k0 = _p("k_0", _p("k", 1.0))
        return CRSInfo(
            "somerc", lat_0=_p("lat_0"), lon_0=_p("lon_0"), k_0=k0,
            x_0=_p("x_0"), y_0=_p("y_0"), **_datum_fields(),
        )
    if "+proj=tmerc" in low:
        # +k= and +k_0= are synonyms in proj4 strings
        k0 = _p("k_0", _p("k", 1.0))
        return CRSInfo(
            "tmerc", lat_0=_p("lat_0"), lon_0=_p("lon_0"), k_0=k0,
            x_0=_p("x_0"), y_0=_p("y_0"), **_datum_fields(),
        )
    if "+proj=geos" in low:
        hm = re.search(r"\+h=(-?[\d.]+(?:[eE][-+]?\d+)?)", low)
        if not hm:
            raise ValueError(f"geos proj4 without +h: {s}")
        return CRSInfo(
            "geos", h=float(hm.group(1)), lon_0=_p("lon_0"),
            sweep_x="+sweep=y" not in low, x_0=_p("x_0"), y_0=_p("y_0"),
        )
    if "+proj=eqc" in low:
        return CRSInfo(
            "eqc", lat_ts=_p("lat_ts"), lat_0=_p("lat_0"),
            lon_0=_p("lon_0"), x_0=_p("x_0"), y_0=_p("y_0"),
        )
    raise ValueError(f"unsupported CRS: {s}")


def is_geographic(crs: str) -> bool:
    try:
        return parse_crs(crs).is_geographic
    except ValueError:
        return False


def crs_equal(a: str, b: str) -> bool:
    try:
        return parse_crs(a) == parse_crs(b)
    except ValueError:
        return str(a).strip() == str(b).strip()


def local_UTM_proj4(lat: float, lon: float) -> str:
    """Reference quirk preserved: zone WITHOUT the +1 (local_UTM_proj4.py:31-43).
    lon=-120 -> '+zone=10' per tests/test_local_UTM_proj4.py."""
    if not (-180 <= lon <= 180):
        raise ValueError("Longitude must be between -180 and 180 degrees")
    zone = int(math.floor((lon + 180) / 6))
    zone = max(1, min(60, zone))
    south = "+south " if lat < 0 else ""
    return f"+proj=utm +zone={zone} {south}+ellps=WGS84 +datum=WGS84 +units=m +no_defs"


def local_UTM_EPSG(lat: float, lon: float) -> str:
    """EPSG form 326xx/327xx — this variant DOES add +1
    (raster_geometry.py:232-238)."""
    if not (-180 <= lon <= 180):
        raise ValueError("Longitude must be between -180 and 180 degrees")
    zone = int(math.floor((lon + 180) / 6)) + 1
    zone = max(1, min(60, zone))
    return f"EPSG:{(32700 if lat < 0 else 32600) + zone}"


def center_aeqd(lat: float, lon: float) -> str:
    """AEQD CRS centered on a point (center_aeqd.py:4-14)."""
    return f"+proj=aeqd +lat_0={lat} +lon_0={lon}"


_EPSG_CANDIDATES = (4326, 3857, 3395, 3413, 3976, 3031, 5070, 3035,
                    6931, 6932, 6933, 2193, 4087, 27700, 29902, 29903,
                    8857, 5514, 2154, 3577, 29873)


def epsg_code(crs: str) -> Optional[int]:
    """The EPSG code whose parameterization equals this CRS, or None for
    proj4-only CRSs (local AEQD, MODIS sinusoidal, a custom tmerc...).
    Used by writers that need to stamp authority metadata (GeoTIFF
    GeoKeys) honestly instead of defaulting everything to 4326."""
    info = parse_crs(crs)
    if info.kind == "geographic":
        return 4326
    if info.kind == "utm":
        if info.ellps == "WGS84" and info.towgs84 is None:
            return (32700 if info.south else 32600) + info.zone
        if (info.ellps, info.towgs84) == _ED50_KEY and not info.south:
            return 23000 + info.zone
        return None
    for code in _EPSG_CANDIDATES:
        try:
            if parse_crs(f"EPSG:{code}") == info:
                return code
        except ValueError:
            continue
    return None
