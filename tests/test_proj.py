"""Projection semantics — mirrors tests/test_transform_xy.py and
tests/test_local_UTM_proj4.py."""

import numpy as np
import pytest

from rasters_ray.proj import (
    center_aeqd,
    local_UTM_EPSG,
    local_UTM_proj4,
    parse_crs,
    transform_point,
    transform_xy,
)


def test_local_utm_zone_rule():
    # tests/test_local_UTM_proj4.py: lon=-120, lat=40 -> +zone=10 (no +1 quirk)
    assert "+zone=10" in local_UTM_proj4(40.0, -120.0)
    # southern hemisphere
    assert "+south" in local_UTM_proj4(-20.0, 30.0)
    assert "+zone=35" in local_UTM_proj4(-20.0, 30.0)
    # invalid longitude
    with pytest.raises(ValueError):
        local_UTM_proj4(0.0, 200.0)


def test_local_utm_epsg_adds_one():
    # EPSG variant adds +1 (raster_geometry.py:232-238)
    assert local_UTM_EPSG(40.0, -120.0) == "EPSG:32611"
    assert local_UTM_EPSG(-20.0, 30.0) == "EPSG:32736"


def test_round_trip_utm():
    # tests/test_transform_xy.py: (12,55),(13,56) WGS84<->EPSG:32633
    lon = np.array([12.0, 13.0])
    lat = np.array([55.0, 56.0])
    e, n = transform_xy(lon, lat, "EPSG:4326", "EPSG:32633")
    assert np.all(np.isfinite(e)) and np.all(np.isfinite(n))
    assert not np.allclose(e, lon)
    lon2, lat2 = transform_xy(e, n, "EPSG:32633", "EPSG:4326")
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_utm_known_value():
    # canonical check: zone 33 central meridian is 15 deg E; a point ON the
    # central meridian has easting exactly 500000
    e, n = transform_point(15.0, 0.0, "EPSG:4326", "EPSG:32633")
    assert e == pytest.approx(500000.0, abs=1e-6)
    assert n == pytest.approx(0.0, abs=1e-6)
    # equatorial meter scale: 0.0001 deg at the central meridian ~ 11.057 m
    e2, n2 = transform_point(15.0, 0.0001, "EPSG:4326", "EPSG:32633")
    assert n2 == pytest.approx(11.057, abs=0.01)


def test_identity_geographic_clips_to_nan():
    # tests/test_transform_xy.py: WGS84 identity clips (+-200, +-100) -> NaN
    x, y = transform_xy([200.0, -200.0, 10.0], [100.0, -100.0, 10.0], "EPSG:4326", "EPSG:4326")
    assert np.isnan(x[0]) and np.isnan(x[1]) and x[2] == 10.0
    assert np.isnan(y[0]) and np.isnan(y[1]) and y[2] == 10.0


def test_utm_south():
    e, n = transform_point(30.0, -20.0, "EPSG:4326", "EPSG:32736")
    # southern false northing: northing < 10_000_000 but positive
    assert 0 < n < 10_000_000
    lon, lat = transform_point(e, n, "EPSG:32736", "EPSG:4326")
    assert lon == pytest.approx(30.0, abs=1e-9)
    assert lat == pytest.approx(-20.0, abs=1e-9)


def test_aeqd_round_trip():
    crs = center_aeqd(40.0, -120.0)
    info = parse_crs(crs)
    assert info.kind == "aeqd" and info.lat_0 == 40.0
    x, y = transform_xy([-120.0, -119.0], [40.0, 40.5], "EPSG:4326", crs)
    assert x[0] == pytest.approx(0.0, abs=1e-6)
    assert y[0] == pytest.approx(0.0, abs=1e-6)
    lon, lat = transform_xy(x, y, crs, "EPSG:4326")
    np.testing.assert_allclose(lon, [-120.0, -119.0], atol=1e-6)
    np.testing.assert_allclose(lat, [40.0, 40.5], atol=1e-6)


def test_aeqd_metric_scale():
    # 1 degree of latitude ~ 111.2 km on the sphere
    crs = center_aeqd(0.0, 0.0)
    x, y = transform_point(0.0, 1.0, "EPSG:4326", crs)
    assert y == pytest.approx(111195.0, rel=0.01)


def test_parse_crs_equivalences():
    assert parse_crs("EPSG:32610") == parse_crs("+proj=utm +zone=10 +datum=WGS84")
    assert parse_crs("EPSG:4326") == parse_crs("+proj=longlat +datum=WGS84")
    with pytest.raises(ValueError):
        # projected CRSs outside the family still raise (NTF / Lambert
        # zone II sits on Clarke 1880, which the engine does not carry)
        parse_crs("EPSG:27572")


# --- sinusoidal / LCC / Mercator (round 4: arbitrary-CRS family) ---------

MODIS_SINU = "+proj=sinu +lon_0=0 +x_0=0 +y_0=0 +R=6371007.181 +units=m +no_defs"
CONUS_LCC = "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=39 +lon_0=-96 +x_0=0 +y_0=0"


def test_sinu_modis_tile_constant():
    # the MODIS land grid's 10-degree tile height: R * radians(10); the
    # published 1111950.5196666666 m comes from the TRUNCATED earth width
    # 20015109.354 / 18, so match it at the mm level only
    x, y = transform_point(0.0, 10.0, "EPSG:4326", MODIS_SINU)
    assert y == pytest.approx(6371007.181 * np.radians(10.0), abs=1e-9)
    assert y == pytest.approx(1111950.5196666666, abs=1e-3)
    assert x == pytest.approx(0.0, abs=1e-9)
    # x shrinks with cos(lat)
    x40, y40 = transform_point(-120.0, 40.0, "EPSG:4326", MODIS_SINU)
    assert y40 == pytest.approx(4.0 * 1111950.5196666666, abs=1e-2)
    assert x40 == pytest.approx(
        6371007.181 * np.radians(-120.0) * np.cos(np.radians(40.0)), abs=1e-6
    )


def test_sinu_round_trip_spherical_and_ellipsoidal():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-179, 179, 200)
    lat = rng.uniform(-85, 85, 200)
    for crs in (MODIS_SINU, "+proj=sinu +lon_0=-100"):
        x, y = transform_xy(lon, lat, "EPSG:4326", crs)
        lon2, lat2 = transform_xy(x, y, crs, "EPSG:4326")
        np.testing.assert_allclose(lon2, lon, atol=1e-8, err_msg=crs)
        np.testing.assert_allclose(lat2, lat, atol=1e-8, err_msg=crs)


def test_lcc_round_trip_and_shape():
    rng = np.random.default_rng(4)
    lon = rng.uniform(-125, -66, 300)
    lat = rng.uniform(24, 50, 300)
    x, y = transform_xy(lon, lat, "EPSG:4326", CONUS_LCC)
    assert np.all(np.isfinite(x)) and np.all(np.isfinite(y))
    lon2, lat2 = transform_xy(x, y, CONUS_LCC, "EPSG:4326")
    np.testing.assert_allclose(lon2, lon, atol=1e-8)
    np.testing.assert_allclose(lat2, lat, atol=1e-8)
    # the central meridian maps to x = x_0 exactly; lat_0 on it to y = y_0
    x0, y0 = transform_point(-96.0, 39.0, "EPSG:4326", CONUS_LCC)
    assert x0 == pytest.approx(0.0, abs=1e-6)
    assert y0 == pytest.approx(0.0, abs=1e-6)
    # conformal conic: scale is exact on both standard parallels — one
    # degree of longitude on lat_1 must measure r*cos(lat_1)-ish only
    # after projection; instead check the defining property t(lat)^n
    # monotonicity: y increases with lat along the central meridian
    _, ys = transform_xy(
        np.full(5, -96.0), np.array([30.0, 35.0, 39.0, 43.0, 48.0]),
        "EPSG:4326", CONUS_LCC,
    )
    assert np.all(np.diff(ys) > 0)


def test_lcc_1sp_equals_2sp_limit():
    lon = np.array([-100.0, -90.0])
    lat = np.array([35.0, 42.0])
    a = transform_xy(lon, lat, "EPSG:4326", "+proj=lcc +lat_1=40 +lat_2=40 +lon_0=-96")
    b = transform_xy(lon, lat, "EPSG:4326", "+proj=lcc +lat_1=40 +lon_0=-96")
    np.testing.assert_allclose(a[0], b[0], rtol=1e-12)
    np.testing.assert_allclose(a[1], b[1], rtol=1e-12)


def test_webmerc_famous_constants():
    # EPSG:3857's square: x(180 deg) = 20037508.342789244
    x, _ = transform_point(180.0, 0.0, "EPSG:4326", "EPSG:3857")
    assert x == pytest.approx(20037508.342789244, abs=1e-6)
    _, y = transform_point(0.0, 85.05112877980659, "EPSG:4326", "EPSG:3857")
    assert y == pytest.approx(20037508.342789244, abs=1e-3)


def test_mercator_round_trips_and_ellipsoidal_differs():
    rng = np.random.default_rng(5)
    lon = rng.uniform(-179, 179, 200)
    lat = rng.uniform(-84, 84, 200)
    for crs in ("EPSG:3857", "EPSG:3395"):
        x, y = transform_xy(lon, lat, "EPSG:4326", crs)
        lon2, lat2 = transform_xy(x, y, crs, "EPSG:4326")
        np.testing.assert_allclose(lon2, lon, atol=1e-8, err_msg=crs)
        np.testing.assert_allclose(lat2, lat, atol=1e-8, err_msg=crs)
    # ellipsoidal y differs from spherical y away from the equator
    _, y_sph = transform_point(0.0, 45.0, "EPSG:4326", "EPSG:3857")
    _, y_ell = transform_point(0.0, 45.0, "EPSG:4326", "EPSG:3395")
    assert abs(y_sph - y_ell) > 10_000  # ~0.3% of R at 45 deg


def test_new_crs_nan_clip_to_geographic():
    # coordinates far outside a projection's valid inverse domain clip to
    # NaN when the TARGET is geographic (transform_xy.py:50-52 semantics)
    x = np.array([1e9])
    y = np.array([0.0])
    lon, lat = transform_xy(x, y, MODIS_SINU, "EPSG:4326")
    assert np.isnan(lon[0]) or np.isnan(lat[0]) or abs(lon[0]) <= 180


def test_cross_projection_bridging():
    # sinu -> lcc goes through WGS84; verify against the two-hop compose
    lon = np.array([-110.0, -95.0])
    lat = np.array([35.0, 44.0])
    sx, sy = transform_xy(lon, lat, "EPSG:4326", MODIS_SINU)
    lx, ly = transform_xy(sx, sy, MODIS_SINU, CONUS_LCC)
    lx2, ly2 = transform_xy(lon, lat, "EPSG:4326", CONUS_LCC)
    np.testing.assert_allclose(lx, lx2, atol=1e-6)
    np.testing.assert_allclose(ly, ly2, atol=1e-6)


def test_parse_new_crs_kinds():
    assert parse_crs(MODIS_SINU).kind == "sinu"
    assert parse_crs(MODIS_SINU).radius == pytest.approx(6371007.181)
    # MODIS publishes +a=+b too
    assert parse_crs("+proj=sinu +a=6371007.181 +b=6371007.181").radius == pytest.approx(
        6371007.181
    )
    assert parse_crs("+proj=sinu +lon_0=0").radius is None  # WGS84 ellipsoidal
    inf = parse_crs(CONUS_LCC)
    assert inf.kind == "lcc" and inf.lat_1 == 33 and inf.lat_2 == 45
    assert parse_crs("EPSG:3857").kind == "webmerc"
    assert parse_crs("EPSG:3395").kind == "merc"
    assert parse_crs("+proj=webmerc").kind == "webmerc"


def test_polar_stereo_round_trip_both_poles():
    from rasters_ray.proj.transform import transform_xy

    lon = np.array([-45.0, 0.0, 120.0, -135.0, 17.0])
    lat = np.array([70.0, 85.0, 75.0, 89.9, 60.0])
    x, y = transform_xy(lon, lat, "EPSG:4326", "EPSG:3413")
    lo, la = transform_xy(x, y, "EPSG:3413", "EPSG:4326")
    np.testing.assert_allclose(lo, lon, atol=1e-9)
    np.testing.assert_allclose(la, lat, atol=1e-9)
    # south (EPSG:3031): along lon_0 the grid-north axis points to equator
    x, y = transform_xy(np.array([0.0]), np.array([-80.0]), "EPSG:4326", "EPSG:3031")
    assert abs(x[0]) < 1e-6 and y[0] > 1e6
    lo, la = transform_xy(x, y, "EPSG:3031", "EPSG:4326")
    assert abs(lo[0]) < 1e-9 and abs(la[0] + 80.0) < 1e-9


def test_polar_stereo_scale_at_standard_parallel():
    """k=1 on the lat_ts parallel (the defining property of variant B)."""
    from rasters_ray.proj.conic import A_WGS84, E2
    from rasters_ray.proj.stereographic import geographic_to_polar_stereo

    xa, ya = geographic_to_polar_stereo(np.array([-45.0]), np.array([70.0]), 70.0, -45.0)
    xb, yb = geographic_to_polar_stereo(np.array([-44.99]), np.array([70.0]), 70.0, -45.0)
    chord = float(np.hypot(xa - xb, ya - yb)[0])
    phi = np.radians(70.0)
    arc = A_WGS84 * np.cos(phi) / np.sqrt(1 - E2 * np.sin(phi) ** 2) * np.radians(0.01)
    assert abs(chord / arc - 1.0) < 1e-6


def test_polar_stereo_pole_and_parse():
    from rasters_ray.proj.crs import parse_crs
    from rasters_ray.proj.transform import transform_xy

    # the pole maps to the origin for any lon
    x, y = transform_xy(np.array([33.0, -170.0]), np.array([90.0, 90.0]),
                        "EPSG:4326", "EPSG:3413")
    np.testing.assert_allclose([x, y], 0.0, atol=1e-6)
    info = parse_crs("+proj=stere +lat_0=-90 +lat_ts=-70 +lon_0=0")
    assert info.kind == "stere" and info.south and info.lat_ts == -70.0
    assert parse_crs("EPSG:3976") == info
    with pytest.raises(ValueError, match="POLAR"):
        parse_crs("+proj=stere +lat_0=52 +lon_0=10")


def test_albers_round_trip_and_equal_area():
    from rasters_ray.proj.transform import transform_xy

    lon = np.array([-96.0, -120.0, -75.0, -100.0])
    lat = np.array([23.0, 40.0, 45.0, 37.5])
    x, y = transform_xy(lon, lat, "EPSG:4326", "EPSG:5070")
    lo, la = transform_xy(x, y, "EPSG:5070", "EPSG:4326")
    np.testing.assert_allclose(lo, lon, atol=1e-9)
    np.testing.assert_allclose(la, lat, atol=1e-9)
    # origin maps to (0, 0)
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    # equal-area property: a projected cell's area equals the EXACT
    # ellipsoidal area  a^2 (1-e^2)/2 * dlam * (q(phi2) - q(phi1))
    # (same q as the projection, Snyder 3-12) up to edge linearization
    from rasters_ray.proj.albers import _q
    from rasters_ray.proj.conic import A_WGS84, E2

    def cell_ratio(lon0, lat0, d=0.05):
        n = 8  # densify edges so the polygon approximates the true image
        top = np.linspace(lon0, lon0 + d, n)
        right = np.linspace(lat0, lat0 + d, n)
        cx = np.concatenate([top, np.full(n, lon0 + d), top[::-1], np.full(n, lon0)])
        cy = np.concatenate([np.full(n, lat0), right, np.full(n, lat0 + d), right[::-1]])
        px, py = transform_xy(cx, cy, "EPSG:4326", "EPSG:5070")
        proj_area = 0.5 * abs(np.dot(px, np.roll(py, -1)) - np.dot(py, np.roll(px, -1)))
        true_area = (
            A_WGS84**2 * (1 - E2) / 2.0 * np.radians(d)
            * (float(_q(np.radians(lat0 + d))) - float(_q(np.radians(lat0))))
            / (1 - E2)  # _q already includes the (1-e^2) factor
        )
        return proj_area / true_area

    for lat0 in (29.5, 37.0, 45.45):
        assert abs(cell_ratio(-96.0, lat0) - 1.0) < 1e-5


def test_albers_parse_and_1sp():
    from rasters_ray.proj.albers import aea_to_geographic, geographic_to_aea
    from rasters_ray.proj.crs import parse_crs

    info = parse_crs("EPSG:5070")
    assert (info.kind, info.lat_1, info.lat_2, info.lat_0, info.lon_0) == (
        "aea", 29.5, 45.5, 23.0, -96.0)
    assert parse_crs("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96") == info
    # 1SP: lat_1 == lat_2 limit still round-trips
    x, y = geographic_to_aea(np.array([-100.0]), np.array([41.0]), 40.0, 40.0, 40.0, -96.0)
    lo, la = aea_to_geographic(x, y, 40.0, 40.0, 40.0, -96.0)
    assert abs(lo[0] + 100.0) < 1e-9 and abs(la[0] - 41.0) < 1e-9


def test_laea_epsg_worked_example_and_round_trip():
    """EPSG Guidance Note 7-2 worked example for ETRS89-LAEA
    (EPSG:3035): 50N 5E -> E 3962799.45, N 2999718.85 — an anchor
    independent of this implementation."""
    from rasters_ray.proj.transform import transform_xy

    x, y = transform_xy([5.0], [50.0], "EPSG:4326", "EPSG:3035")
    assert abs(x[0] - 3962799.45) < 0.01
    assert abs(y[0] - 2999718.85) < 0.01
    # projection center -> false origin exactly
    x, y = transform_xy([10.0], [52.0], "EPSG:4326", "EPSG:3035")
    assert abs(x[0] - 4321000.0) < 1e-6 and abs(y[0] - 3210000.0) < 1e-6
    rng = np.random.default_rng(7)
    lon = rng.uniform(-179, 179, 500)
    lat = rng.uniform(-89, 89, 500)
    lo, la = transform_xy(*transform_xy(lon, lat, "EPSG:4326", "EPSG:3035"),
                          "EPSG:3035", "EPSG:4326")
    np.testing.assert_allclose(lo, lon, atol=1e-9)
    np.testing.assert_allclose(la, lat, atol=1e-9)


def test_laea_polar_ease2_and_cea_global():
    """EASE-Grid 2.0 (Brodzik et al. 2012): EPSG:6931/6932 polar LAEA,
    EPSG:6933 global CEA lat_ts=30 whose published map half-width is
    17367530.44 m — an independent anchor."""
    from rasters_ray.proj.transform import transform_xy

    # poles map to origin; polar round-trips both aspects
    x, y = transform_xy([123.0], [90.0], "EPSG:4326", "EPSG:6931")
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    x, y = transform_xy([-45.0], [-90.0], "EPSG:4326", "EPSG:6932")
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    rng = np.random.default_rng(11)
    lon = rng.uniform(-179, 179, 300)
    for crs, lat in [("EPSG:6931", rng.uniform(1, 89, 300)),
                     ("EPSG:6932", rng.uniform(-89, -1, 300)),
                     ("EPSG:6933", rng.uniform(-85, 85, 300))]:
        lo, la = transform_xy(*transform_xy(lon, lat, "EPSG:4326", crs),
                              crs, "EPSG:4326")
        np.testing.assert_allclose(lo, lon, atol=1e-9)
        np.testing.assert_allclose(la, lat, atol=1e-8)
    x, _ = transform_xy([180.0 - 1e-9], [0.0], "EPSG:4326", "EPSG:6933")
    assert abs(x[0] - 17367530.44) < 0.01


def test_laea_cea_equal_area_property():
    """det(Jacobian) of the forward equals the ellipsoidal area element
    a^2 (1-e^2) cos(phi) / (1 - e^2 sin^2 phi)^2 — the defining
    property, checked by numerical differentiation (formula independent
    of the projection code)."""
    from rasters_ray.proj.conic import A_WGS84, E2
    from rasters_ray.proj.transform import transform_xy

    h = 1e-4
    lo = np.array([10.0, -50.0, 120.0, 0.0])
    la = np.array([52.0, 20.0, -35.0, 70.0])
    elem = (A_WGS84**2 * (1 - E2) * np.cos(np.radians(la))
            / (1 - E2 * np.sin(np.radians(la)) ** 2) ** 2
            * (np.pi / 180.0) ** 2)
    for crs in ("EPSG:3035", "EPSG:6931", "EPSG:6933"):
        x0, y0 = transform_xy(lo, la, "EPSG:4326", crs)
        xl, yl = transform_xy(lo + h, la, "EPSG:4326", crs)
        xp, yp = transform_xy(lo, la + h, "EPSG:4326", crs)
        det = np.abs((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)) / (h * h)
        np.testing.assert_allclose(det / elem, 1.0, atol=2e-5)


def test_laea_cea_parse_and_refusals():
    from rasters_ray.proj.crs import parse_crs

    info = parse_crs("EPSG:3035")
    assert (info.kind, info.lat_0, info.lon_0, info.x_0, info.y_0) == (
        "laea", 52.0, 10.0, 4321000.0, 3210000.0)
    assert parse_crs(
        "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000") == info
    assert parse_crs("EPSG:6933").kind == "cea"
    assert parse_crs("+proj=cea +lat_ts=30") == parse_crs("EPSG:6933")
    assert parse_crs(info.canonical()) == info
    cea = parse_crs("EPSG:6933")
    assert parse_crs(cea.canonical()) == cea
    # EPSG:3411 (Hughes 1980) is refused, not silently aliased to 3413
    with pytest.raises(ValueError, match="Hughes"):
        parse_crs("EPSG:3411")


def test_tmerc_general_matches_utm_and_roundtrips():
    """General transverse Mercator (EPSG method 9807): parameterized as a
    UTM zone it is BIT-IDENTICAL to the UTM path (same Karney core); a
    nonzero lat_0 / custom k_0 round-trips to 1e-10 deg; NZTM2000
    (EPSG:2193) places Wellington at its published ~(1748.8 km,
    5427.6 km) coordinates."""
    from rasters_ray.proj.transform import transform_xy

    lon = np.linspace(168.2, 173.8, 25)
    lat = np.linspace(-46.5, -34.2, 25)
    e1, n1 = transform_xy(lon, lat, "EPSG:4326", "EPSG:32759")
    e2, n2 = transform_xy(
        lon, lat, "EPSG:4326",
        "+proj=tmerc +lat_0=0 +lon_0=171 +k=0.9996 +x_0=500000 +y_0=10000000")
    np.testing.assert_array_equal(e1, e2)
    np.testing.assert_array_equal(n1, n2)

    E, N = transform_xy([174.7772], [-41.2889], "EPSG:4326", "EPSG:2193")
    assert abs(E[0] - 1748813.84) < 1.0 and abs(N[0] - 5427648.31) < 1.0
    lo, la = transform_xy(E, N, "EPSG:2193", "EPSG:4326")
    assert abs(lo[0] - 174.7772) < 1e-9 and abs(la[0] + 41.2889) < 1e-9

    crs = "+proj=tmerc +lat_0=49 +lon_0=-2 +k_0=0.9996012717 +x_0=400000 +y_0=-100000"
    x, y = transform_xy([-1.5, -3.2], [50.5, 54.1], "EPSG:4326", crs)
    lo, la = transform_xy(x, y, crs, "EPSG:4326")
    np.testing.assert_allclose(lo, [-1.5, -3.2], atol=1e-10)
    np.testing.assert_allclose(la, [50.5, 54.1], atol=1e-10)


def test_geos_matches_independent_ecef_geometry():
    """The geostationary forward projection agrees to <1 cm with an
    INDEPENDENT construction: geodetic->ECEF, view vector from the
    satellite, scan angles in the satellite's local frame (the CGMS /
    GOES-R PUG definition) — plus exact round-trips, nadir->origin and
    limb->NaN."""
    from rasters_ray.proj.transform import transform_xy

    GOES_W = "+proj=geos +h=35786023 +lon_0=-137 +sweep=x"
    a, f = 6378137.0, 1 / 298.257223563
    e2c = f * (2 - f)
    lon0, h = -137.0, 35786023.0

    def ecef(lon, lat):
        lam, phi = np.radians(lon), np.radians(lat)
        nn = a / np.sqrt(1 - e2c * np.sin(phi) ** 2)
        return np.array([nn * np.cos(phi) * np.cos(lam),
                         nn * np.cos(phi) * np.sin(lam),
                         nn * (1 - e2c) * np.sin(phi)])

    sat = np.array([(a + h) * np.cos(np.radians(lon0)),
                    (a + h) * np.sin(np.radians(lon0)), 0.0])
    rot = np.array([[-np.cos(np.radians(lon0)), -np.sin(np.radians(lon0)), 0],
                    [-np.sin(np.radians(lon0)), np.cos(np.radians(lon0)), 0],
                    [0, 0, 1.0]])
    for lonp, latp in [(-124.0, 44.0), (-137.0, 0.0), (-150.0, -30.0),
                       (-100.0, 20.0)]:
        x, y = transform_xy([lonp], [latp], "EPSG:4326", GOES_W)
        v = rot @ (ecef(lonp, latp) - sat)
        assert abs(x[0] - h * np.arctan2(v[1], np.hypot(v[2], v[0]))) < 0.01
        assert abs(y[0] - h * np.arctan(v[2] / v[0])) < 0.01
        lo, la = transform_xy(x, y, GOES_W, "EPSG:4326")
        assert abs(lo[0] - lonp) < 1e-9 and abs(la[0] - latp) < 1e-9

    x, y = transform_xy([-137.0, 43.0], [0.0, 0.0], "EPSG:4326", GOES_W)
    assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9  # nadir
    assert np.isnan(x[1]) and np.isnan(y[1])  # behind the limb

    msg = "+proj=geos +h=35785831 +lon_0=0 +sweep=y"  # Meteosat convention
    x, y = transform_xy([10.0, -20.0], [45.0, -35.0], "EPSG:4326", msg)
    lo, la = transform_xy(x, y, msg, "EPSG:4326")
    np.testing.assert_allclose(lo, [10, -20], atol=1e-9)
    np.testing.assert_allclose(la, [45, -35], atol=1e-9)
    # sweep matters: x differs between conventions off the equator/meridian
    xx, _ = transform_xy([10.0], [45.0], "EPSG:4326",
                         "+proj=geos +h=35785831 +lon_0=0 +sweep=x")
    assert abs(xx[0] - x[0]) > 100


def test_eqc_plate_carree():
    """EPSG:4087 equidistant cylindrical: PROJ's spherical eqc on the
    WGS84 semi-major axis (pyproj parity), exact algebra both ways, and
    the lat_ts/lat_0 general form round-trips."""
    from rasters_ray.proj.transform import transform_xy
    from rasters_ray.proj.crs import parse_crs

    x, y = transform_xy([90.0], [45.0], "EPSG:4326", "EPSG:4087")
    assert abs(x[0] - 6378137.0 * np.pi / 2) < 1e-6
    assert abs(y[0] - 6378137.0 * np.pi / 4) < 1e-6
    lo, la = transform_xy(x, y, "EPSG:4087", "EPSG:4326")
    assert abs(lo[0] - 90) < 1e-12 and abs(la[0] - 45) < 1e-12
    assert parse_crs("EPSG:32662") == parse_crs("EPSG:4087")

    crs = "+proj=eqc +lat_ts=30 +lat_0=5 +lon_0=40 +x_0=100 +y_0=-200"
    x, y = transform_xy([47.5, 33.0], [12.0, -8.0], "EPSG:4326", crs)
    lo, la = transform_xy(x, y, crs, "EPSG:4326")
    np.testing.assert_allclose(lo, [47.5, 33.0], atol=1e-12)
    np.testing.assert_allclose(la, [12.0, -8.0], atol=1e-12)


def test_new_crs_parse_canonical_and_refusals():
    from rasters_ray.proj.crs import parse_crs

    nz = parse_crs("EPSG:2193")
    assert (nz.kind, nz.lon_0, nz.k_0, nz.x_0, nz.y_0) == (
        "tmerc", 173.0, 0.9996, 1600000.0, 10000000.0)
    assert parse_crs(nz.canonical()) == nz
    assert parse_crs("EPSG:25832") == parse_crs("EPSG:32632")  # ETRS89/UTM
    g = parse_crs("+proj=geos +h=35786023 +lon_0=-75 +sweep=x")
    assert (g.kind, g.h, g.sweep_x) == ("geos", 35786023.0, True)
    assert parse_crs(g.canonical()) == g
    assert not parse_crs("+proj=geos +h=35785831 +sweep=y").sweep_x
    with pytest.raises(ValueError, match=r"without \+h"):
        parse_crs("+proj=geos +lon_0=0")
    # British National Grid now parses with its real Airy 1830 ellipsoid
    # + OSGB36 Helmert (see test_datum_grids_*)
    bng = parse_crs("EPSG:27700")
    assert (bng.kind, bng.ellps) == ("tmerc", "airy")
    assert bng.towgs84 is not None
    assert parse_crs(bng.canonical()) == bng
    eq = parse_crs("EPSG:4087")
    assert parse_crs(eq.canonical()) == eq


def test_wkt_authority_parsing():
    """WKT 1/2 CRS strings (what GeoPackage definitions and .crs
    sidecars carry) resolve through their outermost EPSG AUTHORITY/ID
    entry; WKT without one raises with the remediation."""
    from rasters_ray.proj.crs import parse_crs

    wkt1 = ('GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
            '298.257223563,AUTHORITY["EPSG","7030"]],'
            'AUTHORITY["EPSG","6326"]],PRIMEM["Greenwich",0],'
            'UNIT["degree",0.0174532925199433],AUTHORITY["EPSG","4326"]]')
    assert parse_crs(wkt1).kind == "geographic"
    wkt_utm = ('PROJCS["WGS 84 / UTM zone 10N",GEOGCS["WGS 84",'
               'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],'
               'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],'
               'AUTHORITY["EPSG","4326"]],'
               'PROJECTION["Transverse_Mercator"],UNIT["metre",1],'
               'AUTHORITY["EPSG","32610"]]')
    info = parse_crs(wkt_utm)
    assert (info.kind, info.zone, info.south) == ("utm", 10, False)
    wkt2 = ('PROJCRS["ETRS89-extended / LAEA Europe",BASEGEOGCRS["ETRS89",'
            'DATUM["European Terrestrial Reference System 1989"],'
            'ID["EPSG",4258]],CONVERSION["Europe Equal Area 2001"],'
            'ID["EPSG",3035]]')
    assert parse_crs(wkt2) == parse_crs("EPSG:3035")
    with pytest.raises(ValueError, match="AUTHORITY"):
        parse_crs('PROJCS["custom",GEOGCS["x",DATUM["y",SPHEROID["z",1,2]]]]')


def test_datum_grids_osgb_worked_example():
    """EPSG:27700 (British National Grid): TM on Airy 1830 + the OSGB36
    single Helmert (EPSG transformation 1314). Pins: (a) the PURE
    projection step against the OS guide's worked example C.1 (OSGB36
    geodetic -> grid, no datum shift: 651409.903 E, 313177.270 N) to
    2 mm; (b) the full WGS84 path against the same guide's Caister
    water tower ETRS89 coordinates to the documented ~3.5 m accuracy of
    the national Helmert; (c) 1e-7 deg round-trips (the negated-
    parameter Helmert inverse is the EPSG reversibility convention,
    sub-mm at these magnitudes)."""
    from rasters_ray.proj.transform import transform_xy
    from rasters_ray.proj.transverse_mercator import geographic_to_tmerc

    # (a) projection-only: OSGB36 52d39m27.2531sN 1d43m04.5177sE
    la_os = 52 + 39 / 60 + 27.2531 / 3600
    lo_os = 1 + 43 / 60 + 4.5177 / 3600
    E, N = geographic_to_tmerc(
        np.array([lo_os]), np.array([la_os]), 49.0, -2.0, 0.9996012717,
        400000.0, -100000.0, 6377563.396, 1 / 299.3249646)
    assert abs(E[0] - 651409.903) < 2e-3
    assert abs(N[0] - 313177.270) < 2e-3

    # (b) full WGS84 -> BNG: ETRS89 52d39m28.8282sN 1d42m57.8663sE
    la_et = 52 + 39 / 60 + 28.8282 / 3600
    lo_et = 1 + 42 / 60 + 57.8663 / 3600
    E, N = transform_xy([lo_et], [la_et], "EPSG:4326", "EPSG:27700")
    assert abs(E[0] - 651409.903) < 3.5
    assert abs(N[0] - 313177.270) < 3.5

    # (c) round-trips across GB
    lon = np.linspace(-7.5, 1.5, 30)
    lat = np.linspace(49.5, 60.5, 30)
    x, y = transform_xy(lon, lat, "EPSG:4326", "EPSG:27700")
    lo2, la2 = transform_xy(x, y, "EPSG:27700", "EPSG:4326")
    np.testing.assert_allclose(lo2, lon, atol=3e-7)
    np.testing.assert_allclose(la2, lat, atol=3e-7)


def test_datum_grids_irish_and_ed50():
    """EPSG:29902/29903 (Irish Grid, Airy Modified + TM65/TM75 Helmert)
    and EPSG:23028-23038 (ED50 UTM on International 1924, 3-param
    shift). Sanity: Dublin city centre lands near its published Irish
    Grid coordinates (~O 159 349 -> E 315900 N 234600, +-200 m); the
    ED50-WGS84 UTM offset in western Europe is the famous ~(90, 200) m
    northeast shift; both round-trip."""
    from rasters_ray.proj.transform import transform_xy

    E, N = transform_xy([-6.2603], [53.3498], "EPSG:4326", "EPSG:29903")
    assert abs(E[0] - 315900) < 300 and abs(N[0] - 234600) < 300
    lo, la = transform_xy(E, N, "EPSG:29903", "EPSG:4326")
    assert abs(lo[0] + 6.2603) < 1e-7 and abs(la[0] - 53.3498) < 1e-7
    # TM65 vs TM75 differ by centimeters, not meters
    E2, N2 = transform_xy([-6.2603], [53.3498], "EPSG:4326", "EPSG:29902")
    assert abs(E2[0] - E[0]) < 0.2 and abs(N2[0] - N[0]) < 0.2

    E1, N1 = transform_xy([5.0], [52.0], "EPSG:4326", "EPSG:23031")
    E2, N2 = transform_xy([5.0], [52.0], "EPSG:4326", "EPSG:32631")
    assert 50 < (E1[0] - E2[0]) < 150 and 150 < (N1[0] - N2[0]) < 260
    lo, la = transform_xy(E1, N1, "EPSG:23031", "EPSG:4326")
    assert abs(lo[0] - 5.0) < 1e-7 and abs(la[0] - 52.0) < 1e-7


def test_datum_helmert_conventions():
    """The Helmert layer itself: position-vector sign convention checked
    against an independently-constructed rotation matrix product;
    negated-parameter inverse agrees with the exact matrix inverse to
    ~1 cm (the translation-times-scale cross terms dominate); proj4
    +towgs84/+ellps parsing round-trips."""
    import pytest
    from rasters_ray.proj import datum as d
    from rasters_ray.proj.crs import parse_crs
    from rasters_ray.proj.transform import transform_xy

    params = d.DATUMS["OSGB36"][1]
    x = np.array([3909833.018]); y = np.array([-147097.138]); z = np.array([5020322.478])
    xt, yt, zt = d.helmert(x, y, z, params)
    # independent construction: full matrix product T + (1+s) R v
    tx, ty, tz, rx, ry, rz, ppm = params
    s = np.pi / 648000.0  # arcsec -> rad
    R = np.array([[1.0, -rz * s, ry * s],
                  [rz * s, 1.0, -rx * s],
                  [-ry * s, rx * s, 1.0]])
    v = (1.0 + ppm * 1e-6) * (R @ np.array([x[0], y[0], z[0]])) + np.array([tx, ty, tz])
    assert abs(xt[0] - v[0]) < 1e-6 and abs(yt[0] - v[1]) < 1e-6 and abs(zt[0] - v[2]) < 1e-6
    # negated-parameter inverse vs exact matrix inverse: sub-mm
    xb, yb, zb = d.helmert(xt, yt, zt, params, inverse=True)
    M = (1.0 + ppm * 1e-6) * R
    ve = np.linalg.solve(M, np.array([xt[0] - tx, yt[0] - ty, zt[0] - tz]))
    assert abs(xb[0] - ve[0]) < 2e-2 and abs(yb[0] - ve[1]) < 2e-2 and abs(zb[0] - ve[2]) < 2e-2

    # proj4 datum fields parse + canonical round-trip
    crs = ("+proj=tmerc +lat_0=49 +lon_0=-2 +k_0=0.9996012717 "
           "+x_0=400000 +y_0=-100000 +ellps=airy "
           "+towgs84=446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894")
    info = parse_crs(crs)
    assert info.ellps == "airy" and len(info.towgs84) == 7
    assert parse_crs(info.canonical()) == info
    # matches the EPSG:27700 parameterization except the rounded tz/rz
    e1, n1 = transform_xy([-1.0], [52.0], "EPSG:4326", crs)
    e2, n2 = transform_xy([-1.0], [52.0], "EPSG:4326", "EPSG:27700")
    assert abs(e1[0] - e2[0]) < 0.01 and abs(n1[0] - n2[0]) < 0.01
    # zero towgs84 = pure ellipsoid change about the same geocenter
    info0 = parse_crs("+proj=utm +zone=31 +ellps=intl +towgs84=0,0,0")
    assert info0.towgs84 is None and info0.ellps == "intl"
    with pytest.raises(ValueError, match="ellps"):
        parse_crs("+proj=tmerc +lat_0=0 +lon_0=3 +ellps=clrk80ign")


def test_swiss_somerc_swisstopo_reference_point():
    """EPSG:2056/21781 (Swiss LV95/LV03): the swisstopo double
    projection. Pins: (a) the PURE projection step against swisstopo's
    Rigi reference point (CH1903 geodetic -> LV03 grid E 679520.05,
    N 212273.44) to 1 mm; (b) the projection center maps exactly onto
    each grid's false origin; (c) WGS84 Bern lands within the CH1903+
    datum-shift magnitude of the LV95 origin; (d) 3e-7 deg round-trips
    (negated-parameter Helmert reversibility)."""
    from rasters_ray.proj.swiss import geographic_to_somerc
    from rasters_ray.proj.transform import transform_xy

    lat0 = 46 + 57 / 60 + 8.66 / 3600
    lon0 = 7 + 26 / 60 + 22.50 / 3600

    # (a) projection-only Rigi: 47d03m28.95659233sN 8d29m11.11127154sE
    phi = 47 + 3 / 60 + 28.95659233 / 3600
    lam = 8 + 29 / 60 + 11.11127154 / 3600
    E, N = geographic_to_somerc(
        np.array([lam]), np.array([phi]), lat0, lon0, 1.0,
        600000.0, 200000.0)
    assert abs(E[0] - 679520.05) < 1e-3
    assert abs(N[0] - 212273.44) < 1e-3

    # (b) center -> false origin (both grids)
    E, N = geographic_to_somerc(
        np.array([lon0]), np.array([lat0]), lat0, lon0, 1.0,
        2600000.0, 1200000.0)
    assert abs(E[0] - 2600000.0) < 1e-6 and abs(N[0] - 1200000.0) < 1e-6

    # (c) full WGS84 path: Bern old observatory in WGS84 is ~(7.438632,
    # 46.951083); the LV95 origin sits there within a few meters
    E, N = transform_xy([7.438632], [46.951083], "EPSG:4326", "EPSG:2056")
    assert abs(E[0] - 2600000.0) < 5.0 and abs(N[0] - 1200000.0) < 5.0

    # (d) round-trips across Switzerland, both grids
    rng = np.random.default_rng(11)
    lon = rng.uniform(5.9, 10.5, 300)
    lat = rng.uniform(45.8, 47.8, 300)
    for code in ("EPSG:2056", "EPSG:21781"):
        x, y = transform_xy(lon, lat, "EPSG:4326", code)
        lo2, la2 = transform_xy(x, y, code, "EPSG:4326")
        np.testing.assert_allclose(lo2, lon, atol=3e-7)
        np.testing.assert_allclose(la2, lat, atol=3e-7)

    # parse/canonical round-trip + proj4 parity with the EPSG route
    assert parse_crs("EPSG:2056").canonical() == "EPSG:2056"
    assert parse_crs("EPSG:21781").canonical() == "EPSG:21781"
    x1, y1 = transform_xy(lon, lat, "EPSG:4326", "EPSG:2056")
    x2, y2 = transform_xy(
        lon, lat, "EPSG:4326",
        "+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333 "
        "+k_0=1 +x_0=2600000 +y_0=1200000 +ellps=bessel "
        "+towgs84=674.374,15.056,405.346")
    np.testing.assert_allclose(x2, x1, atol=1e-6)
    np.testing.assert_allclose(y2, y1, atol=1e-6)


def test_mollweide_snyder_example_equal_area_roundtrip():
    """Mollweide (Snyder 31-1..31-8). Pins: (a) Snyder's PP 1395
    numerical example (R=1, lon_0=-90: 50N 75W -> x 0.1788845,
    y 0.9208758); (b) the ellipse frame: pole y = sqrt(2) R, edge
    x -> 2 sqrt(2) R; (c) numeric equal-area (Jacobian == R^2 cos phi
    to 1e-6); (d) 1e-9 deg round-trips including a shifted lon_0."""
    from rasters_ray.proj.transform import transform_xy
    from rasters_ray.proj.world import R_WGS84, geographic_to_moll

    x, y = geographic_to_moll([-75.0], [50.0], lon_0=-90.0, radius=1.0)
    assert abs(x[0] - 0.1788845) < 1e-6 and abs(y[0] - 0.9208758) < 1e-6
    x, y = geographic_to_moll([0.0], [90.0])
    assert abs(y[0] - np.sqrt(2.0) * R_WGS84) < 1e-6 and abs(x[0]) < 1e-6
    eps = 1e-6
    for phi in (0.0, 30.0, 60.0, 85.0):
        x0, y0 = geographic_to_moll([10.0], [phi])
        xl, yl = geographic_to_moll([10.0 + eps], [phi])
        xp, yp = geographic_to_moll([10.0], [phi + eps])
        J = ((xl[0] - x0[0]) * (yp[0] - y0[0])
             - (xp[0] - x0[0]) * (yl[0] - y0[0])) / np.radians(eps) ** 2
        assert abs(J / (R_WGS84 ** 2 * np.cos(np.radians(phi))) - 1.0) < 1e-6
    rng = np.random.default_rng(13)
    lon = rng.uniform(-179, 179, 400)
    lat = rng.uniform(-89, 89, 400)
    for crs in ("ESRI:54009", "+proj=moll +lon_0=100"):
        lo, la = transform_xy(*transform_xy(lon, lat, "EPSG:4326", crs),
                              crs, "EPSG:4326")
        np.testing.assert_allclose(lo, lon, atol=1e-9)
        np.testing.assert_allclose(la, lat, atol=1e-9)


def test_orthographic_snyder_example_and_hemisphere():
    """Orthographic (Snyder 20-3..20-6). Pins: (a) Snyder's numerical
    example (R=1, center 40N 100W: 30N 110W -> x -0.1503837,
    y -0.1651911); (b) the far hemisphere maps to NaN; (c) center maps
    to the false origin; (d) visible-hemisphere round-trips."""
    from rasters_ray.proj.transform import transform_xy
    from rasters_ray.proj.world import geographic_to_ortho

    x, y = geographic_to_ortho([-110.0], [30.0], 40.0, -100.0, radius=1.0)
    assert abs(x[0] + 0.1503837) < 1e-6 and abs(y[0] + 0.1651911) < 1e-6
    crs = "+proj=ortho +lat_0=45 +lon_0=10"
    x, y = transform_xy([10.0], [45.0], "EPSG:4326", crs)
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    x, y = transform_xy([-170.0], [-45.0], "EPSG:4326", crs)
    assert np.isnan(x[0]) and np.isnan(y[0])
    rng = np.random.default_rng(17)
    lon = rng.uniform(-60, 80, 400)
    lat = rng.uniform(0, 89, 400)
    X, Y = transform_xy(lon, lat, "EPSG:4326", crs)
    vis = ~np.isnan(X)
    assert vis.sum() > 300
    lo, la = transform_xy(X[vis], Y[vis], crs, "EPSG:4326")
    np.testing.assert_allclose(lo, lon[vis], atol=1e-9)
    np.testing.assert_allclose(la, lat[vis], atol=1e-9)


def test_goode_homolosine_constants_and_roundtrip():
    """Goode homolosine (Snyder PP 1395): (a) the module constants
    solve the defining system (theta equation + x-continuity) to full
    double precision; (b) the sinusoidal/Mollweide join is continuous;
    (c) equal-area Jacobian both sides of the join; (d) 1e-9 deg
    round-trips for goode and igh, and igh restores points across all
    six lobes."""
    from rasters_ray.proj.transform import transform_xy
    from rasters_ray.proj.world import (PHI_LIM, THETA_LIM, Y_COR, R_WGS84,
                                        geographic_to_goode)

    assert abs(2 * THETA_LIM + np.sin(2 * THETA_LIM)
               - np.pi * np.sin(PHI_LIM)) < 1e-14
    assert abs(np.cos(THETA_LIM)
               - (np.pi / (2 * np.sqrt(2))) * np.cos(PHI_LIM)) < 1e-14
    assert abs(Y_COR - (np.sqrt(2) * np.sin(THETA_LIM) - PHI_LIM)) < 1e-15
    # Snyder's join latitude 40d44'11.8"
    assert abs(np.degrees(PHI_LIM) - (40 + 44 / 60 + 11.8 / 3600)) < 1e-4

    eps = 2e-7
    for lam in (-120.0, 40.0):
        xb, yb = geographic_to_goode(
            [lam, lam], [np.degrees(PHI_LIM) - eps, np.degrees(PHI_LIM) + eps])
        assert abs(xb[1] - xb[0]) < 0.1 and abs(yb[1] - yb[0]) < 0.1

    deps = 1e-6
    for phi in (30.0, 55.0):  # one per component projection
        x0, y0 = geographic_to_goode([10.0], [phi])
        xl, yl = geographic_to_goode([10.0 + deps], [phi])
        xp, yp = geographic_to_goode([10.0], [phi + deps])
        J = ((xl[0] - x0[0]) * (yp[0] - y0[0])
             - (xp[0] - x0[0]) * (yl[0] - y0[0])) / np.radians(deps) ** 2
        assert abs(J / (R_WGS84 ** 2 * np.cos(np.radians(phi))) - 1.0) < 1e-5

    rng = np.random.default_rng(29)
    lon = rng.uniform(-179, 179, 600)
    lat = rng.uniform(-89, 89, 600)
    for crs in ("+proj=goode +lon_0=20", "+proj=igh"):
        X, Y = transform_xy(lon, lat, "EPSG:4326", crs)
        lo, la = transform_xy(X, Y, crs, "EPSG:4326")
        ok = ~np.isnan(lo)
        assert ok.mean() > 0.99
        np.testing.assert_allclose(lo[ok], lon[ok], atol=1e-9)
        np.testing.assert_allclose(la[ok], lat[ok], atol=1e-9)
    # igh covers all six lobes in that sample
    from rasters_ray.proj.world import _igh_lam0
    lam0 = _igh_lam0(lon, lat)
    assert len(np.unique(lam0)) == 6


def test_krovak_epsg_worked_example_and_roundtrip():
    """EPSG:5514 (S-JTSK / Krovak East North): pins (a) the PURE
    projection step to the EPSG GN7-2 method 9819 worked example
    (50d12'32.4416"N 16d50'59.1790"E S-JTSK -> southing 1050538.643,
    westing 568990.997, to the published mm); (b) the projection center
    maps to the cone apex (r=0 ray: theta=0 -> westing 0); (c) WGS84
    round-trips across CZ/SK; (d) parse/canonical and the +proj=krovak
    route agree."""
    from rasters_ray.proj.krovak import (
        geographic_to_krovak,
        krovak_to_geographic,
    )
    from rasters_ray.proj.transform import transform_xy

    phi = 50 + 12 / 60 + 32.4416 / 3600
    lam = 16 + 50 / 60 + 59.1790 / 3600
    x, y = geographic_to_krovak(np.array([lam]), np.array([phi]))
    assert abs(-y[0] - 1050538.643) < 1e-3  # southing
    assert abs(-x[0] - 568990.997) < 1e-3   # westing
    lo, la = krovak_to_geographic(x, y)
    assert abs(lo[0] - lam) < 1e-11 and abs(la[0] - phi) < 1e-11

    # (b) a point ON the central meridian of the oblique cone (V=0,
    # U=gamma0... simplest invariant: lon_0 meridian maps to westing
    # proportional to sin(theta)=0 only at the apex; instead check the
    # known sign envelope: all CZ/SK territory is negative/negative
    rng = np.random.default_rng(23)
    lon = rng.uniform(12.1, 22.5, 400)
    lat = rng.uniform(47.8, 51.0, 400)
    x, y = transform_xy(lon, lat, "EPSG:4326", "EPSG:5514")
    assert (x < 0).all() and (y < 0).all()
    assert (-x > 100000).all() and (-x < 1000000).all()
    assert (-y > 900000).all() and (-y < 1400000).all()
    lo2, la2 = transform_xy(x, y, "EPSG:5514", "EPSG:4326")
    np.testing.assert_allclose(lo2, lon, atol=3e-7)
    np.testing.assert_allclose(la2, lat, atol=3e-7)

    assert parse_crs("EPSG:5514").canonical() == "EPSG:5514"
    x2, y2 = transform_xy(lon, lat, "EPSG:4326", "+proj=krovak")
    np.testing.assert_allclose(x2, x, atol=1e-9)
    np.testing.assert_allclose(y2, y, atol=1e-9)


def test_eckert4_constants_equal_area_roundtrip():
    """ESRI:54012 (World Eckert IV): pins (a) the Snyder 32-x scale
    constants (y_max = 1.32650043 R at the pole, pole line exactly half
    the equator); (b) the theta equation residual after the FIXED
    twelve Newton iterations (< 1e-12 everywhere); (c) the equal-area
    property via a numerical Jacobian (= R^2 cos phi to 1e-6 relative);
    (d) round-trips."""
    from rasters_ray.proj.world import (
        R_WGS84,
        _eck4_theta,
        eck4_to_geographic,
        geographic_to_eck4,
    )
    from rasters_ray.proj.transform import transform_xy

    # (a) scale constants (lon 90 avoids the +/-180 wrap ambiguity)
    x_eq, _ = geographic_to_eck4(np.array([90.0]), np.array([0.0]))
    x_po, y_po = geographic_to_eck4(np.array([90.0]), np.array([90.0]))
    assert abs(x_po[0] / x_eq[0] - 0.5) < 1e-12  # pole line = half equator
    assert abs(y_po[0] - 2.0 * np.sqrt(np.pi / (4.0 + np.pi)) * R_WGS84) < 1e-6
    assert abs(x_eq[0] - 2.0 / np.sqrt(np.pi * (4.0 + np.pi))
               * R_WGS84 * np.pi) < 1e-6

    # (b) residual of the fixed-iteration solve
    phi = np.radians(np.linspace(-90, 90, 20001))
    t = _eck4_theta(phi)
    res = (t + np.sin(t) * np.cos(t) + 2.0 * np.sin(t)
           - (2.0 + np.pi / 2.0) * np.sin(phi))
    assert np.abs(res).max() < 1e-12

    # (c) equal-area Jacobian (central differences, off the poles)
    lon = np.array([30.0]); lat = np.array([47.0])
    h = 1e-5
    xe, ye = geographic_to_eck4(lon + h, lat)
    xw, yw = geographic_to_eck4(lon - h, lat)
    xn, yn = geographic_to_eck4(lon, lat + h)
    xs_, ys_ = geographic_to_eck4(lon, lat - h)
    dh = np.radians(2 * h)
    J = ((xe - xw) / dh * (yn - ys_) / dh
         - (xn - xs_) / dh * (ye - yw) / dh)
    want = R_WGS84 ** 2 * np.cos(np.radians(lat))
    assert abs(J[0] / want[0] - 1.0) < 1e-6

    # (d) round-trips incl. antimeridian + poles, ESRI + proj4 routes
    rng = np.random.default_rng(29)
    lon = rng.uniform(-179.9, 179.9, 500)
    lat = rng.uniform(-89.9, 89.9, 500)
    x, y = transform_xy(lon, lat, "EPSG:4326", "ESRI:54012")
    lo2, la2 = transform_xy(x, y, "ESRI:54012", "EPSG:4326")
    np.testing.assert_allclose(lo2, lon, atol=1e-9)
    np.testing.assert_allclose(la2, lat, atol=1e-9)
    x2, y2 = transform_xy(lon, lat, "EPSG:4326",
                          "+proj=eck4 +lon_0=0 +x_0=0 +y_0=0")
    np.testing.assert_allclose(x2, x, atol=1e-9)
    lo3, la3 = eck4_to_geographic(*geographic_to_eck4(lon, lat, lon_0=25.0),
                                  lon_0=25.0)
    np.testing.assert_allclose(lo3, lon, atol=1e-9)
    np.testing.assert_allclose(la3, lat, atol=1e-9)


def test_equal_earth_published_pins_and_roundtrip():
    """EPSG:8857 (Equal Earth, EPSG method 1078): pins (a) the published
    Savric-Patterson-Jenny width-to-height ratio 2.05458; (b) the
    equal-area property against the ELLIPSOIDAL area element
    a^2 (1-e^2) cos(phi) / (1-e^2 sin^2 phi)^2 via a numerical Jacobian
    (the authalic-latitude route must preserve ellipsoid areas, not
    sphere areas); (c) the theta Newton residual after the FIXED twelve
    iterations; (d) round-trips via EPSG/ESRI/proj4 routes."""
    from rasters_ray.proj.equal_area import (
        _ee_poly,
        _EE_M,
        _RQ,
        eqearth_to_geographic,
        geographic_to_eqearth,
    )
    from rasters_ray.proj.conic import A_WGS84, E2
    from rasters_ray.proj.transform import transform_xy

    # (a) published aspect ratio (paper table: 1:2.05458)
    xe, _ = geographic_to_eqearth(np.array([180.0 - 1e-9]), np.array([0.0]))
    _, yp = geographic_to_eqearth(np.array([0.0]), np.array([90.0]))
    assert abs(xe[0] / yp[0] - 2.05458) < 1e-4

    # (b) ellipsoidal equal-area Jacobian at an arbitrary point
    lon = np.array([37.0]); lat = np.array([52.0])
    h = 1e-5
    xE, yE = geographic_to_eqearth(lon + h, lat)
    xW, yW = geographic_to_eqearth(lon - h, lat)
    xN, yN = geographic_to_eqearth(lon, lat + h)
    xS, yS = geographic_to_eqearth(lon, lat - h)
    dh = np.radians(2 * h)
    J = ((xE - xW) / dh * (yN - yS) / dh - (xN - xS) / dh * (yE - yW) / dh)
    s = np.sin(np.radians(lat))
    want = A_WGS84 ** 2 * (1.0 - E2) * np.cos(np.radians(lat)) \
        / (1.0 - E2 * s * s) ** 2
    assert abs(J[0] / want[0] - 1.0) < 1e-6

    # (c) fixed-iteration inverse residual over the full y range
    y = np.linspace(-_ee_poly(np.array([np.arcsin(_EE_M)]))[0],
                    _ee_poly(np.array([np.arcsin(_EE_M)]))[0], 5001) * _RQ
    lonr, latr = eqearth_to_geographic(np.zeros_like(y), y)
    _, y2 = geographic_to_eqearth(lonr, latr)
    assert np.abs(y2 - y).max() < 1e-6  # metres, round-trip through phi

    # (d) round-trips, all three CRS spellings
    rng = np.random.default_rng(31)
    lon = rng.uniform(-179.9, 179.9, 500)
    lat = rng.uniform(-89.9, 89.9, 500)
    x, yv = transform_xy(lon, lat, "EPSG:4326", "EPSG:8857")
    lo2, la2 = transform_xy(x, yv, "EPSG:8857", "EPSG:4326")
    np.testing.assert_allclose(lo2, lon, atol=1e-9)
    np.testing.assert_allclose(la2, lat, atol=1e-9)
    for alias in ("ESRI:54035", "+proj=eqearth +lon_0=0 +x_0=0 +y_0=0"):
        x2, y2 = transform_xy(lon, lat, "EPSG:4326", alias)
        np.testing.assert_allclose(x2, x, atol=1e-9)
        np.testing.assert_allclose(y2, yv, atol=1e-9)
    from rasters_ray.proj.crs import epsg_code
    assert epsg_code("+proj=eqearth +lon_0=0 +x_0=0 +y_0=0") == 8857


def test_robinson_published_table_and_roundtrip():
    """ESRI:54030 (Robinson): pins (a) every knot of the published 1974
    PLEN/PDFE table bit-exactly (the Hermite basis is exact at nodes);
    (b) the published ~1.9716:1 aspect ratio; (c) monotonicity of the
    Y spline (the inverse Newton's precondition); (d) round-trips incl.
    poles/antimeridian via ESRI and proj4 routes."""
    from rasters_ray.proj.robinson import (
        _MY,
        _PDFE,
        _PLEN,
        R_WGS84,
        _hermite,
        geographic_to_robin,
        robin_to_geographic,
    )
    from rasters_ray.proj.transform import transform_xy

    # (a) knots reproduce the published table exactly (lam = 1 rad)
    knots = np.arange(0.0, 91.0, 5.0)
    xk, yk = geographic_to_robin(np.full(19, np.degrees(1.0)), knots)
    np.testing.assert_allclose(xk / (0.8487 * R_WGS84), _PLEN,
                               rtol=0, atol=2e-15)  # 1 ulp: wrap + divide
    np.testing.assert_allclose(yk / (1.3523 * R_WGS84), _PDFE,
                               rtol=0, atol=2e-15)

    # (b) aspect ratio of the full map
    assert abs((0.8487 * np.pi) / 1.3523 - 1.9716554648389095) < 1e-12

    # (c) Y strictly increasing on [0, 90] (dense sample)
    alat = np.linspace(0.0, 90.0, 9001)
    yv, _ = _hermite(_PDFE, _MY, alat)
    assert (np.diff(yv) > 0).all()

    # (d) round-trips
    rng = np.random.default_rng(37)
    lon = rng.uniform(-179.9, 179.9, 500)
    lat = rng.uniform(-89.99, 89.99, 500)
    x, y = transform_xy(lon, lat, "EPSG:4326", "ESRI:54030")
    lo2, la2 = transform_xy(x, y, "ESRI:54030", "EPSG:4326")
    np.testing.assert_allclose(lo2, lon, atol=1e-9)
    np.testing.assert_allclose(la2, lat, atol=1e-9)
    x2, y2 = transform_xy(lon, lat, "EPSG:4326",
                          "+proj=robin +lon_0=0 +x_0=0 +y_0=0")
    np.testing.assert_allclose(x2, x, atol=1e-9)
    np.testing.assert_allclose(y2, y, atol=1e-9)


def test_winkel_tripel_closed_form_pins_and_roundtrip():
    """ESRI:54042 (Winkel Tripel, phi_1 = acos(2/pi)): pins (a) the
    closed-form corner values — x(180, 0) = R(2+pi)/2 and
    y(0, 90) = R pi/2, hence the (2+pi)/pi aspect ratio; (b) the
    equatorial profile x(lam, 0) = R(2 lam/pi + lam)/2 (the Aitoff term
    degenerates to the equirectangular one on the equator); (c) the
    mean-of-two-projections property at phi_1 where the equirect term
    is exact; (d) round-trips over the usable map via ESRI and proj4
    routes (fixed twelve 2-D Newton iterations)."""
    from rasters_ray.proj.world import (
        R_WGS84,
        geographic_to_wintri,
        wintri_to_geographic,
    )
    from rasters_ray.proj.transform import transform_xy

    # (a) corners and aspect
    xe, ye = geographic_to_wintri(np.array([180.0 - 1e-9]), np.array([0.0]))
    assert abs(xe[0] - R_WGS84 * (2.0 + np.pi) / 2.0) < 1.0
    assert abs(ye[0]) == 0.0
    xp, yp = geographic_to_wintri(np.array([0.0]), np.array([90.0]))
    assert abs(xp[0]) == 0.0
    assert abs(yp[0] - R_WGS84 * np.pi / 2.0) < 1e-6

    # (b) equator: x = R/2 (2 lam / pi + lam)
    lam = np.radians(np.array([30.0, 75.0, 120.0]))
    xq, yq = geographic_to_wintri(np.degrees(lam), np.zeros(3))
    np.testing.assert_allclose(
        xq, 0.5 * R_WGS84 * (lam * (2.0 / np.pi) + lam), rtol=1e-14)
    assert np.abs(yq).max() == 0.0

    # (c) prime meridian: x = 0, y = R/2 (phi + sin phi * alpha/sin alpha)
    # with alpha = phi exactly (cos lam2 = 1), so y = R phi
    phi = np.radians(np.array([20.0, 55.0, 80.0]))
    x0, y0 = geographic_to_wintri(np.zeros(3), np.degrees(phi))
    assert np.abs(x0).max() == 0.0
    np.testing.assert_allclose(y0, R_WGS84 * phi, rtol=1e-14)

    # (d) round-trips
    rng = np.random.default_rng(41)
    lon = rng.uniform(-179.0, 179.0, 500)
    lat = rng.uniform(-89.5, 89.5, 500)
    x, y = transform_xy(lon, lat, "EPSG:4326", "ESRI:54042")
    lo2, la2 = transform_xy(x, y, "ESRI:54042", "EPSG:4326")
    np.testing.assert_allclose(lo2, lon, atol=1e-8)
    np.testing.assert_allclose(la2, lat, atol=1e-8)
    x2, y2 = transform_xy(lon, lat, "EPSG:4326",
                          "+proj=wintri +lon_0=0 +x_0=0 +y_0=0")
    np.testing.assert_allclose(x2, x, atol=1e-9)
    np.testing.assert_allclose(y2, y, atol=1e-9)


def test_hammer_snyder_pins_and_roundtrip():
    """ESRI:54044 (Hammer): pins (a) the closed-form frame — the full
    map is a 2:1 ellipse with semi-axes 2 sqrt(2) R and sqrt(2) R; (b)
    the spherical equal-area Jacobian R^2 cos phi; (c) the closed-form
    Snyder 24-7..24-9 inverse (no iteration) round-trips; (d) ESRI and
    proj4 routes agree."""
    from rasters_ray.proj.world import (
        R_WGS84,
        geographic_to_hammer,
        hammer_to_geographic,
    )
    from rasters_ray.proj.transform import transform_xy

    # (a) ellipse frame: x(180-, 0) -> 2 sqrt(2) R, y(0, 90) = sqrt(2) R
    xe, _ = geographic_to_hammer(np.array([180.0 - 1e-7]), np.array([0.0]))
    assert abs(xe[0] - 2.0 * np.sqrt(2.0) * R_WGS84) < 10.0
    _, yp = geographic_to_hammer(np.array([0.0]), np.array([90.0]))
    assert abs(yp[0] - np.sqrt(2.0) * R_WGS84) < 1e-6
    # boundary points satisfy the ellipse equation (x/4R)^2+(y/2R)^2=1/2... 
    # Snyder frame: (x/(2 sqrt2 R))^2 + (y/(sqrt2 R))^2 = 1 on lam=+-pi
    lats = np.linspace(-89.0, 89.0, 50)
    xb, yb = geographic_to_hammer(np.full(50, 179.999999), lats)
    r2 = (xb / (2.0 * np.sqrt(2.0) * R_WGS84)) ** 2 \
        + (yb / (np.sqrt(2.0) * R_WGS84)) ** 2
    np.testing.assert_allclose(r2, 1.0, atol=1e-6)

    # (b) equal-area Jacobian
    h = 1e-5
    lon = np.array([40.0]); lat = np.array([-33.0])
    xE, yE = geographic_to_hammer(lon + h, lat)
    xW, yW = geographic_to_hammer(lon - h, lat)
    xN, yN = geographic_to_hammer(lon, lat + h)
    xS, yS = geographic_to_hammer(lon, lat - h)
    dh = np.radians(2 * h)
    J = (xE - xW) / dh * (yN - yS) / dh - (xN - xS) / dh * (yE - yW) / dh
    assert abs(J[0] / (R_WGS84 ** 2 * np.cos(np.radians(lat[0]))) - 1.0) < 1e-6

    # (c)+(d) round-trips, both spellings
    rng = np.random.default_rng(43)
    lon = rng.uniform(-179.9, 179.9, 500)
    lat = rng.uniform(-89.9, 89.9, 500)
    x, y = transform_xy(lon, lat, "EPSG:4326", "ESRI:54044")
    lo2, la2 = transform_xy(x, y, "ESRI:54044", "EPSG:4326")
    np.testing.assert_allclose(lo2, lon, atol=1e-8)
    np.testing.assert_allclose(la2, lat, atol=1e-8)
    x2, y2 = transform_xy(lon, lat, "EPSG:4326",
                          "+proj=hammer +lon_0=0 +x_0=0 +y_0=0")
    np.testing.assert_allclose(x2, x, atol=1e-9)
    np.testing.assert_allclose(y2, y, atol=1e-9)


def test_natural_earth_published_pins_and_roundtrip():
    """+proj=natearth (Savric et al. 2011 polynomial): pins (a) the
    published 1.923:1 aspect ratio of the graticule frame; (b) the
    equator scale 0.8707 R per radian; (c) strict monotonicity of the
    y polynomial (the inverse Newton's precondition); (d) round-trips
    through the dispatcher."""
    from rasters_ray.proj.world import (
        R_WGS84,
        _natearth_dypoly,
        _natearth_ypoly,
        geographic_to_natearth,
        natearth_to_geographic,
    )
    from rasters_ray.proj.transform import transform_xy

    # (a) aspect: width 2 pi 0.8707 R over height 2 ypoly(pi/2) R
    h = _natearth_ypoly(np.array([np.pi / 2.0]))[0]
    assert abs((0.8707 * np.pi) / h - 1.9230898340062679) < 1e-12
    assert abs((0.8707 * np.pi) / h - 1.923) < 1e-3  # the published ratio

    # (b) equator scale
    xq, yq = geographic_to_natearth(np.array([45.0]), np.array([0.0]))
    assert abs(xq[0] - 0.8707 * R_WGS84 * np.radians(45.0)) < 1e-6
    assert yq[0] == 0.0

    # (c) dy/dphi > 0 everywhere on the map
    p = np.linspace(-np.pi / 2.0, np.pi / 2.0, 10001)
    assert _natearth_dypoly(p).min() > 0.12

    # (d) round-trips
    rng = np.random.default_rng(47)
    lon = rng.uniform(-179.9, 179.9, 500)
    lat = rng.uniform(-89.9, 89.9, 500)
    x, y = transform_xy(lon, lat, "EPSG:4326",
                        "+proj=natearth +lon_0=0 +x_0=0 +y_0=0")
    lo2, la2 = transform_xy(x, y, "+proj=natearth +lon_0=0 +x_0=0 +y_0=0",
                            "EPSG:4326")
    np.testing.assert_allclose(lo2, lon, atol=1e-9)
    np.testing.assert_allclose(la2, lat, atol=1e-9)


def test_van_der_grinten_invariants_and_roundtrip():
    """ESRI:54029 (Van der Grinten I): pins the projection's DEFINING
    geometric invariants — (a) the whole world maps inside the circle
    of radius pi R, with lam = +-180 on the boundary circle for every
    latitude; (b) the equator is straight with true scale x = R lam;
    (c) the central meridian is straight with y = pi R tan(theta/2),
    theta = asin(2 phi / pi); (d) parallels are circular arcs centered
    on the y-axis that meet the boundary circle; (e) the closed-form
    Snyder cubic inverse round-trips (no iteration in either
    direction)."""
    from rasters_ray.proj.world import (
        R_WGS84,
        geographic_to_vandg,
        vandg_to_geographic,
    )
    from rasters_ray.proj.transform import transform_xy

    # (a) boundary circle
    for ph in (10.0, 35.0, 60.0, 85.0):
        xb, yb = geographic_to_vandg(
            np.array([179.9999999]), np.array([ph]), radius=1.0)
        assert abs(np.hypot(xb, yb)[0] / np.pi - 1.0) < 1e-8

    # (b) equator
    xq, yq = geographic_to_vandg(np.array([77.0]), np.array([0.0]))
    assert abs(xq[0] - R_WGS84 * np.radians(77.0)) < 1e-6
    assert yq[0] == 0.0

    # (c) central meridian
    x0, y0 = geographic_to_vandg(np.array([0.0]), np.array([50.0]), radius=1.0)
    th = np.arcsin(2.0 * np.radians(50.0) / np.pi)
    assert x0[0] == 0.0
    assert abs(y0[0] - np.pi * np.tan(th / 2.0)) < 1e-14

    # (d) the phi=50 parallel is a circular arc centered on x=0 that
    # passes through the lam=+-180 boundary points
    lams = np.array([20.0, 60.0, 110.0])
    xp, yp = geographic_to_vandg(lams, np.full(3, 50.0), radius=1.0)
    k = ((xp[0] ** 2 + yp[0] ** 2) - (xp[1] ** 2 + yp[1] ** 2)) \
        / (2.0 * (yp[0] - yp[1]))
    r2 = xp[0] ** 2 + (yp[0] - k) ** 2
    assert abs(xp[2] ** 2 + (yp[2] - k) ** 2 - r2) < 1e-10
    xb, yb = geographic_to_vandg(
        np.array([179.9999999]), np.array([50.0]), radius=1.0)
    assert abs(xb[0] ** 2 + (yb[0] - k) ** 2 - r2) < 1e-6

    # (e) round-trips via ESRI and proj4 routes
    rng = np.random.default_rng(53)
    lon = rng.uniform(-179.0, 179.0, 500)
    lat = rng.uniform(-85.0, 85.0, 500)
    lat[np.abs(lat) < 0.5] = 0.7  # keep clear of the equator's branch
    x, y = transform_xy(lon, lat, "EPSG:4326", "ESRI:54029")
    lo2, la2 = transform_xy(x, y, "ESRI:54029", "EPSG:4326")
    np.testing.assert_allclose(lo2, lon, atol=1e-6)
    np.testing.assert_allclose(la2, lat, atol=1e-6)
    x2, y2 = transform_xy(lon, lat, "EPSG:4326",
                          "+proj=vandg +lon_0=0 +x_0=0 +y_0=0")
    np.testing.assert_allclose(x2, x, atol=1e-9)
    np.testing.assert_allclose(y2, y, atol=1e-9)


def test_aitoff_pins_and_roundtrip():
    """ESRI:54043 (Aitoff): pins (a) the 2:1 ellipse frame (semi-axes
    pi R and pi R / 2) with the lam = +-180 meridian ON the ellipse;
    (b) the Winkel relation — Winkel Tripel is exactly the mean of
    equirectangular at acos(2/pi) and Aitoff; (c) round-trips via both
    spellings (fixed twelve 2-D Newton iterations)."""
    from rasters_ray.proj.world import (
        R_WGS84,
        geographic_to_aitoff,
        geographic_to_wintri,
    )
    from rasters_ray.proj.transform import transform_xy

    # (a) frame
    xe, _ = geographic_to_aitoff(np.array([180.0 - 1e-7]), np.array([0.0]))
    assert abs(xe[0] - np.pi * R_WGS84) < 10.0
    _, yp = geographic_to_aitoff(np.array([0.0]), np.array([90.0]))
    assert abs(yp[0] - np.pi * R_WGS84 / 2.0) < 1e-6
    lats = np.linspace(-85.0, 85.0, 30)
    xb, yb = geographic_to_aitoff(np.full(30, 179.999999), lats)
    r2 = (xb / (np.pi * R_WGS84)) ** 2 + (yb / (np.pi * R_WGS84 / 2.0)) ** 2
    np.testing.assert_allclose(r2, 1.0, atol=1e-6)

    # (b) Winkel = (equirect(acos(2/pi)) + Aitoff) / 2
    rng = np.random.default_rng(59)
    lon = rng.uniform(-170.0, 170.0, 200)
    lat = rng.uniform(-85.0, 85.0, 200)
    xa, ya = geographic_to_aitoff(lon, lat)
    xw, yw = geographic_to_wintri(lon, lat)
    lam = np.radians(lon)
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    phi = np.radians(lat)
    xeq = R_WGS84 * lam * (2.0 / np.pi)
    yeq = R_WGS84 * phi
    np.testing.assert_allclose(xw, 0.5 * (xeq + xa), rtol=1e-12)
    np.testing.assert_allclose(yw, 0.5 * (yeq + ya), rtol=1e-12)

    # (c) round-trips
    lon = rng.uniform(-179.0, 179.0, 500)
    lat = rng.uniform(-89.5, 89.5, 500)
    x, y = transform_xy(lon, lat, "EPSG:4326", "ESRI:54043")
    lo2, la2 = transform_xy(x, y, "ESRI:54043", "EPSG:4326")
    np.testing.assert_allclose(lo2, lon, atol=1e-8)
    np.testing.assert_allclose(la2, lat, atol=1e-8)
    x2, y2 = transform_xy(lon, lat, "EPSG:4326",
                          "+proj=aitoff +lon_0=0 +x_0=0 +y_0=0")
    np.testing.assert_allclose(x2, x, atol=1e-9)
    np.testing.assert_allclose(y2, y, atol=1e-9)


def test_all_crs_kinds_canonical_roundtrip_and_dispatch():
    """Sweep EVERY implemented CRS spelling: parse -> canonical ->
    re-parse must be a fixed point, and the dispatcher must round-trip
    a small inland point through each CRS (catches a canonical string
    that parses to different parameters, and a kind wired into only
    one direction of the dispatcher)."""
    from rasters_ray.proj.crs import parse_crs
    from rasters_ray.proj.transform import transform_xy

    spellings = [
        "EPSG:4326", "EPSG:32633", "EPSG:32733", "EPSG:3857", "EPSG:3395",
        "EPSG:3413", "EPSG:3031", "EPSG:3976", "EPSG:5070", "EPSG:3035",
        "EPSG:6931", "EPSG:6932", "EPSG:6933", "EPSG:2193", "EPSG:4087",
        "EPSG:27700", "EPSG:29902", "EPSG:2056", "EPSG:21781",
        "EPSG:5514", "EPSG:8857", "ESRI:54009", "ESRI:54012",
        "ESRI:54029", "ESRI:54030", "ESRI:54035", "ESRI:54042",
        "ESRI:54043", "ESRI:54044", "ESRI:54003", "ESRI:54010",
        "+proj=sinu +lon_0=0 +x_0=0 +y_0=0",
        "+proj=aeqd +lat_0=45 +lon_0=10",
        "+proj=natearth +lon_0=0 +x_0=0 +y_0=0",
        "+proj=goode +lon_0=0",
        "+proj=gnom +lat_0=40 +lon_0=10",
        "ESRI:54021", "+proj=poly +lat_0=38 +lon_0=10",
        "ESRI:54024", "+proj=cass +lat_0=40 +lon_0=10",
        "+proj=bonne +lat_1=45 +lon_0=10",
        "EPSG:29873",
        "+proj=omerc +lat_0=40 +lonc=10 +alpha=30 +k_0=0.9996",
    ]
    # per-CRS valid test points (lon, lat) inside each grid's domain
    domain = {
        "EPSG:32633": (15.0, 48.0), "EPSG:32733": (15.0, -30.0),
        "EPSG:3413": (-45.0, 75.0), "EPSG:3031": (0.0, -75.0),
        "EPSG:3976": (0.0, -72.0), "EPSG:5070": (-96.0, 38.0),
        "EPSG:3035": (10.0, 52.0), "EPSG:6931": (0.0, 75.0),
        "EPSG:6932": (0.0, -75.0), "EPSG:2193": (173.0, -41.0),
        "EPSG:27700": (-2.0, 53.0), "EPSG:29902": (-8.0, 53.5),
        "EPSG:2056": (7.44, 46.95), "EPSG:21781": (7.44, 46.95),
        "EPSG:5514": (15.0, 49.8),
        "+proj=aeqd +lat_0=45 +lon_0=10": (11.0, 46.0),
        "+proj=gnom +lat_0=40 +lon_0=10": (12.0, 44.0),
        "+proj=poly +lat_0=38 +lon_0=10": (12.0, 44.0),
        "+proj=cass +lat_0=40 +lon_0=10": (11.0, 44.0),
        "+proj=bonne +lat_1=45 +lon_0=10": (12.0, 44.0),
        "EPSG:29873": (115.5, 5.0),
        "+proj=omerc +lat_0=40 +lonc=10 +alpha=30 +k_0=0.9996": (12.0, 42.0),
    }
    for crs in spellings:
        info = parse_crs(crs)
        assert parse_crs(info.canonical()) == info, crs
        lon0, lat0 = domain.get(crs, (15.0, 40.0))
        lon = np.array([lon0]); lat = np.array([lat0])
        x, y = transform_xy(lon, lat, "EPSG:4326", crs)
        lo, la = transform_xy(x, y, crs, "EPSG:4326")
        assert np.isfinite(x).all() and np.isfinite(y).all(), crs
        np.testing.assert_allclose(lo, lon, atol=5e-6, err_msg=crs)
        np.testing.assert_allclose(la, lat, atol=5e-6, err_msg=crs)
        # and through the CANONICAL spelling (must hit the same kind)
        x2, y2 = transform_xy(lon, lat, "EPSG:4326", info.canonical())
        np.testing.assert_allclose(x2, x, atol=1e-6, err_msg=crs)
        np.testing.assert_allclose(y2, y, atol=1e-6, err_msg=crs)


def test_miller_and_eckert6_pins_and_roundtrip():
    """ESRI:54003 (Miller cylindrical) and ESRI:54010 (Eckert VI).
    Miller pins: finite pole at y = 1.25 R ln tan(pi/4 + 0.4 pi/2)
    (Snyder 18-x) and the closed-form inverse. Eckert VI pins: the
    pole line exactly half the equator, y_pole = pi R / sqrt(2+pi),
    theta residual < 1e-12 after the fixed twelve Newton iterations,
    and the equal-area Jacobian R^2 cos phi."""
    from rasters_ray.proj.world import (
        R_WGS84,
        _eck6_theta,
        geographic_to_eck6,
        geographic_to_mill,
    )
    from rasters_ray.proj.transform import transform_xy

    # Miller: pole height + x true on every parallel
    _, ym = geographic_to_mill(np.array([0.0]), np.array([90.0]))
    assert abs(ym[0] / R_WGS84
               - 1.25 * np.log(np.tan(np.pi / 4.0 + 0.4 * np.pi / 2.0))) \
        < 1e-12
    xm, _ = geographic_to_mill(np.array([120.0]), np.array([77.0]))
    assert abs(xm[0] - R_WGS84 * np.radians(120.0)) < 1e-6

    # Eckert VI: pole line, height, residual, Jacobian
    xe, _ = geographic_to_eck6(np.array([90.0]), np.array([0.0]))
    xp, yp = geographic_to_eck6(np.array([90.0]), np.array([90.0]))
    assert abs(xp[0] / xe[0] - 0.5) < 1e-12
    assert abs(yp[0] - np.pi * R_WGS84 / np.sqrt(2.0 + np.pi)) < 1e-6
    p = np.radians(np.linspace(-90.0, 90.0, 10001))
    t = _eck6_theta(p)
    assert np.abs(t + np.sin(t) - (1.0 + np.pi / 2.0) * np.sin(p)).max() \
        < 1e-12
    h = 1e-5
    lon = np.array([25.0]); lat = np.array([47.0])
    xE, yE = geographic_to_eck6(lon + h, lat)
    xW, yW = geographic_to_eck6(lon - h, lat)
    xN, yN = geographic_to_eck6(lon, lat + h)
    xS, yS = geographic_to_eck6(lon, lat - h)
    dh = np.radians(2 * h)
    J = (xE - xW) / dh * (yN - yS) / dh - (xN - xS) / dh * (yE - yW) / dh
    assert abs(J[0] / (R_WGS84 ** 2 * np.cos(np.radians(47.0))) - 1.0) < 1e-6

    # round-trips, both spellings each
    rng = np.random.default_rng(61)
    lon = rng.uniform(-179.9, 179.9, 500)
    lat = rng.uniform(-89.9, 89.9, 500)
    for esri, p4 in (("ESRI:54003", "+proj=mill +lon_0=0 +x_0=0 +y_0=0"),
                     ("ESRI:54010", "+proj=eck6 +lon_0=0 +x_0=0 +y_0=0")):
        x, y = transform_xy(lon, lat, "EPSG:4326", esri)
        lo2, la2 = transform_xy(x, y, esri, "EPSG:4326")
        np.testing.assert_allclose(lo2, lon, atol=1e-9)
        np.testing.assert_allclose(la2, lat, atol=1e-8)
        x2, y2 = transform_xy(lon, lat, "EPSG:4326", p4)
        np.testing.assert_allclose(x2, x, atol=1e-9)
        np.testing.assert_allclose(y2, y, atol=1e-9)


def test_gnomonic_great_circles_and_roundtrip():
    """+proj=gnom (Snyder 22-3..22-9): pins (a) the projection's
    DEFINING property — every great circle maps to a straight line
    (checked for a meridian, the equator and an oblique great circle
    through the center); (b) the radial scale tan(c) from the center;
    (c) the far hemisphere maps to NaN; (d) closed-form round-trips."""
    from rasters_ray.proj.world import (
        R_WGS84,
        geographic_to_gnom,
        gnom_to_geographic,
    )
    from rasters_ray.proj.transform import transform_xy

    def collinear(xs, ys):
        v1 = np.array([xs[1] - xs[0], ys[1] - ys[0]])
        v2 = np.array([xs[2] - xs[0], ys[2] - ys[0]])
        cross = v1[0] * v2[1] - v1[1] * v2[0]
        scale = np.hypot(*v1) * np.hypot(*v2)
        return abs(cross) / scale < 1e-9

    # (a) meridian lon=30 (center (0,0)); equator; oblique great circle
    x, y = geographic_to_gnom(np.full(3, 30.0),
                              np.array([-40.0, 10.0, 55.0]), 0.0, 0.0)
    assert collinear(x, y)
    x, y = geographic_to_gnom(np.array([-60.0, 10.0, 70.0]),
                              np.zeros(3), 0.0, 0.0)
    assert collinear(x, y)
    # oblique: the great circle through (0,0) with azimuth 40deg —
    # parameterize on the sphere and take three points
    az = np.radians(40.0)
    t = np.array([-0.8, 0.3, 1.0])
    lat_gc = np.degrees(np.arcsin(np.sin(t) * np.cos(az)))
    lon_gc = np.degrees(np.arctan2(np.sin(t) * np.sin(az), np.cos(t)))
    x, y = geographic_to_gnom(lon_gc, lat_gc, 0.0, 0.0)
    assert collinear(x, y)

    # (b) radial scale: distance from center = R tan(c)
    x, y = geographic_to_gnom(np.array([0.0]), np.array([37.0]), 0.0, 0.0)
    assert abs(np.hypot(x, y)[0] - R_WGS84 * np.tan(np.radians(37.0))) < 1e-6

    # (c) far hemisphere NaN
    xf, yf = geographic_to_gnom(np.array([140.0]), np.array([0.0]), 0.0, 0.0)
    assert np.isnan(xf[0]) and np.isnan(yf[0])

    # (d) round-trips through the dispatcher
    rng = np.random.default_rng(67)
    lon = rng.uniform(-100.0, 20.0, 500)
    lat = rng.uniform(-25.0, 85.0, 500)
    crs = "+proj=gnom +lat_0=40 +lon_0=-40"
    x, y = transform_xy(lon, lat, "EPSG:4326", crs)
    lo2, la2 = transform_xy(x, y, crs, "EPSG:4326")
    keep = np.isfinite(x)
    np.testing.assert_allclose(lo2[keep], lon[keep], atol=1e-8)
    np.testing.assert_allclose(la2[keep], lat[keep], atol=1e-8)
    from rasters_ray.proj.crs import parse_crs
    assert parse_crs(parse_crs(crs).canonical()) == parse_crs(crs)


def test_polyconic_invariants_and_roundtrip():
    """ESRI:54021 / +proj=poly (American Polyconic, Snyder 18-12..15):
    pins (a) the central meridian true to the meridian arc (Snyder
    3-21 series, exact by construction); (b) every parallel true to
    scale — the projected arc length along phi=40 equals
    N cos(phi) dlambda to 1e-9 relative; (c) the equator row
    x = a lambda; (d) round-trips via both spellings (fixed twelve 2-D
    Newton iterations)."""
    from rasters_ray.proj.polyconic import (
        A_WGS84,
        E2,
        _merid,
        geographic_to_poly,
    )
    from rasters_ray.proj.transform import transform_xy

    # (a) central meridian
    phis = np.array([10.0, 35.0, 60.0])
    x, y = geographic_to_poly(np.zeros(3), phis, lat_0=30.0)
    want = (_merid(np.radians(phis))
            - _merid(np.radians(np.float64(30.0)))) * A_WGS84
    assert np.abs(x).max() == 0.0
    np.testing.assert_allclose(y, want, rtol=0, atol=1e-9)

    # (b) parallel true to scale
    lons = np.linspace(0.0, 10.0, 2001)
    x, y = geographic_to_poly(lons, np.full_like(lons, 40.0), lat_0=30.0)
    arclen = np.sum(np.hypot(np.diff(x), np.diff(y)))
    sphi = np.sin(np.radians(40.0))
    want = (A_WGS84 / np.sqrt(1.0 - E2 * sphi * sphi)
            * np.cos(np.radians(40.0)) * np.radians(10.0))
    assert abs(arclen / want - 1.0) < 1e-9

    # (c) equator row
    xq, yq = geographic_to_poly(np.array([57.0]), np.array([0.0]), lat_0=0.0)
    assert abs(xq[0] - A_WGS84 * np.radians(57.0)) < 1e-6
    assert yq[0] == 0.0

    # (d) round-trips
    rng = np.random.default_rng(71)
    lon = rng.uniform(-125.0, -65.0, 500)
    lat = rng.uniform(5.0, 70.0, 500)
    crs = "+proj=poly +lat_0=38 +lon_0=-95"
    x, y = transform_xy(lon, lat, "EPSG:4326", crs)
    lo2, la2 = transform_xy(x, y, crs, "EPSG:4326")
    np.testing.assert_allclose(lo2, lon, atol=1e-8)
    np.testing.assert_allclose(la2, lat, atol=1e-8)
    # ESRI:54021 is the world aspect (lon_0 = 0): test inside the
    # projection's useful domain, within ~85 deg of Greenwich
    lon_w = rng.uniform(-85.0, 85.0, 500)
    lat_w = rng.uniform(-70.0, 70.0, 500)
    x2, y2 = transform_xy(lon_w, lat_w, "EPSG:4326", "ESRI:54021")
    lo3, la3 = transform_xy(x2, y2, "ESRI:54021", "EPSG:4326")
    np.testing.assert_allclose(lo3, lon_w, atol=1e-7)
    np.testing.assert_allclose(la3, lat_w, atol=1e-7)
    from rasters_ray.proj.crs import parse_crs
    assert parse_crs(parse_crs(crs).canonical()) == parse_crs(crs)


def test_krovak_modifier_refusals_and_eqearth_sphere():
    """Review follow-ups: (a) +proj=krovak with any modifier that
    changes the EPSG:5514 parameterization (+czech axes, custom
    origin/scale, a different datum shift) raises instead of silently
    returning EPSG:5514 numbers; the exact S-JTSK spellings still
    parse. (b) +proj=eqearth +R= is PROJ's SPHERICAL Equal Earth —
    geodetic latitude on that sphere — not the authalic EPSG:8857
    method; y differs by km at mid-latitudes and the sphere round-trip
    is exact."""
    import pytest as _pytest
    from rasters_ray.proj.crs import parse_crs
    from rasters_ray.proj.transform import transform_xy

    for bad in ("+proj=krovak +czech",
                "+proj=krovak +lon_0=24.8333333333333",
                "+proj=krovak +towgs84=570.8,85.7,462.8,4.998,1.587,5.261,3.56",
                "+proj=krovak +x_0=5000000"):
        with _pytest.raises(ValueError, match="EPSG:5514"):
            parse_crs(bad)
    # the exact S-JTSK spellings still parse
    assert parse_crs("+proj=krovak").kind == "krovak"
    assert parse_crs(
        "+proj=krovak +ellps=bessel +towgs84=589,76,480").kind == "krovak"

    lon = np.array([30.0]); lat = np.array([45.0])
    xa, ya = transform_xy(lon, lat, "EPSG:4326", "EPSG:8857")
    xs_, ys_ = transform_xy(lon, lat, "EPSG:4326",
                            "+proj=eqearth +R=6378137")
    assert abs(ys_[0] - ya[0]) > 5000.0  # authalic vs geodetic latitude
    lo, la = transform_xy(xs_, ys_, "+proj=eqearth +R=6378137", "EPSG:4326")
    np.testing.assert_allclose(lo, lon, atol=1e-9)
    np.testing.assert_allclose(la, lat, atol=1e-9)
    info = parse_crs("+proj=eqearth +R=6371000")
    assert info.radius == 6371000.0
    assert parse_crs(info.canonical()) == info


def test_cassini_and_bonne_pins_and_roundtrip():
    """+proj=cass (Cassini-Soldner, Snyder 13-7..13-13) and ESRI:54024
    Bonne (Snyder's ellipsoidal Bonne). Cassini pins: the central
    meridian is the exact meridian arc; round-trip within the series'
    use band (a few degrees of the central meridian) better than 1e-6
    deg. Bonne pins: the equal-area Jacobian equals the ellipsoidal
    area element; every parallel true to scale; closed-form inverse
    round-trips globally."""
    from rasters_ray.proj.polyconic import (
        A_WGS84,
        E2,
        _merid,
        geographic_to_bonne,
        geographic_to_cass,
    )
    from rasters_ray.proj.transform import transform_xy

    # Cassini: central meridian
    phis = np.array([10.0, 40.0, 60.0])
    x, y = geographic_to_cass(np.zeros(3), phis, lat_0=30.0)
    want = (_merid(np.radians(phis))
            - _merid(np.radians(np.float64(30.0)))) * A_WGS84
    assert np.abs(x).max() == 0.0
    np.testing.assert_allclose(y, want, rtol=0, atol=1e-9)
    # Cassini round-trip in the use band
    rng = np.random.default_rng(73)
    lon = rng.uniform(-3.0, 3.0, 500)
    lat = rng.uniform(-70.0, 70.0, 500)
    crs = "+proj=cass +lat_0=52 +lon_0=0"
    xc, yc = transform_xy(lon, lat, "EPSG:4326", crs)
    lo2, la2 = transform_xy(xc, yc, crs, "EPSG:4326")
    np.testing.assert_allclose(lo2, lon, atol=1e-6)
    np.testing.assert_allclose(la2, lat, atol=1e-6)

    # Bonne: equal-area Jacobian
    h = 1e-5
    lonp = np.array([20.0]); latp = np.array([35.0])
    xE, yE = geographic_to_bonne(lonp + h, latp)
    xW, yW = geographic_to_bonne(lonp - h, latp)
    xN, yN = geographic_to_bonne(lonp, latp + h)
    xS, yS = geographic_to_bonne(lonp, latp - h)
    dh = np.radians(2 * h)
    J = (xE - xW) / dh * (yN - yS) / dh - (xN - xS) / dh * (yE - yW) / dh
    s = np.sin(np.radians(latp))
    want = A_WGS84 ** 2 * (1.0 - E2) * np.cos(np.radians(latp)) \
        / (1.0 - E2 * s * s) ** 2
    assert abs(J[0] / want[0] - 1.0) < 1e-6
    # Bonne: parallels true to scale
    lons = np.linspace(0.0, 10.0, 2001)
    xb, yb = geographic_to_bonne(lons, np.full_like(lons, 45.0))
    arclen = np.sum(np.hypot(np.diff(xb), np.diff(yb)))
    s45 = np.sin(np.radians(45.0))
    want = (A_WGS84 / np.sqrt(1.0 - E2 * s45 * s45)
            * np.cos(np.radians(45.0)) * np.radians(10.0))
    assert abs(arclen / want - 1.0) < 1e-9
    # Bonne: global round-trip via the ESRI code
    lon = rng.uniform(-170.0, 170.0, 500)
    lat = rng.uniform(-85.0, 85.0, 500)
    xb, yb = transform_xy(lon, lat, "EPSG:4326", "ESRI:54024")
    lo3, la3 = transform_xy(xb, yb, "ESRI:54024", "EPSG:4326")
    np.testing.assert_allclose(lo3, lon, atol=1e-6)
    np.testing.assert_allclose(la3, lat, atol=1e-6)
    from rasters_ray.proj.crs import parse_crs
    for spelled in (crs, "+proj=bonne +lat_1=60 +lon_0=0"):
        assert parse_crs(parse_crs(spelled).canonical()) == parse_crs(spelled)


def test_hotine_oblique_mercator_gn72_example_and_invariants():
    """Hotine oblique Mercator (GN7-2 methods 9812/9815): pins (a) the
    GN7-2 worked example — Timbalai 1948 / RSO Borneo (m), EPSG:29873,
    Everest 1830 (1967): 5d23'14.1129"N 115d48'19.8196"E ->
    E 679245.73 N 596562.78 to the published cm; (b) conformality on
    WGS84 (the numerical Jacobian is a similarity transform) and the
    center scale k_c; (c) round-trips via the dispatcher for variant B
    and variant A (+no_uoff); (d) EPSG:29873 / canonical fixed point."""
    from rasters_ray.proj.omerc import (
        geographic_to_omerc,
        omerc_to_geographic,
    )
    from rasters_ray.proj.transform import transform_xy
    from rasters_ray.proj.crs import parse_crs

    # (a) the worked example (projection core, Timbalai geographic in)
    latc, lonc = 4.0, 115.0
    alpha = 53.0 + 18.0 / 60.0 + 56.9537 / 3600.0
    gamma = 53.0 + 7.0 / 60.0 + 48.3685 / 3600.0
    lat = np.array([5.0 + 23.0 / 60.0 + 14.1129 / 3600.0])
    lon = np.array([115.0 + 48.0 / 60.0 + 19.8196 / 3600.0])
    x, y = geographic_to_omerc(lon, lat, latc, lonc, alpha, gamma,
                               0.99984, 590476.87, 442857.65,
                               ellps="evrst30", variant="B")
    assert abs(x[0] - 679245.73) < 0.01
    assert abs(y[0] - 596562.78) < 0.01
    lo, la = omerc_to_geographic(x, y, latc, lonc, alpha, gamma,
                                 0.99984, 590476.87, 442857.65,
                                 ellps="evrst30", variant="B")
    assert abs(lo[0] - lon[0]) < 1e-10 and abs(la[0] - lat[0]) < 1e-10

    # (b) conformality + center scale on WGS84
    h = 1e-6
    lonp = np.array([-95.0]); latp = np.array([40.0])
    args = dict(lat_c=40.0, lon_c=-95.0, alpha_c=30.0, gamma_c=30.0,
                k_c=0.9996)
    xE, yE = geographic_to_omerc(lonp + h, latp, **args)
    xW, yW = geographic_to_omerc(lonp - h, latp, **args)
    xN, yN = geographic_to_omerc(lonp, latp + h, **args)
    xS, yS = geographic_to_omerc(lonp, latp - h, **args)
    from rasters_ray.proj.conic import A_WGS84, E2
    s = np.sin(np.radians(latp[0]))
    # ground distances per degree
    nu = A_WGS84 / np.sqrt(1.0 - E2 * s * s)
    rho_m = A_WGS84 * (1.0 - E2) / (1.0 - E2 * s * s) ** 1.5
    ex = (xE[0] - xW[0]) / 2.0; ey = (yE[0] - yW[0]) / 2.0
    nx = (xN[0] - xS[0]) / 2.0; ny = (yN[0] - yS[0]) / 2.0
    k_east = np.hypot(ex, ey) / (np.radians(h) * nu * np.cos(np.radians(40.0)))
    k_north = np.hypot(nx, ny) / (np.radians(h) * rho_m)
    assert abs(k_east / k_north - 1.0) < 1e-6   # isotropic (conformal)
    assert abs(k_east - 0.9996) < 1e-6          # center scale = k_c
    # perpendicularity of the image axes (similarity transform)
    assert abs(ex * nx + ey * ny) / (np.hypot(ex, ey) * np.hypot(nx, ny)) \
        < 1e-6

    # (c) dispatcher round-trips, both variants
    rng = np.random.default_rng(79)
    lon = rng.uniform(-120.0, -70.0, 500)
    lat = rng.uniform(25.0, 55.0, 500)
    for crs in ("+proj=omerc +lat_0=40 +lonc=-95 +alpha=30 +k_0=0.9996",
                "+proj=omerc +lat_0=40 +lonc=-95 +alpha=30 +gamma=28"
                " +k_0=0.9996 +no_uoff"):
        xx, yy = transform_xy(lon, lat, "EPSG:4326", crs)
        lo2, la2 = transform_xy(xx, yy, crs, "EPSG:4326")
        np.testing.assert_allclose(lo2, lon, atol=1e-9, err_msg=crs)
        np.testing.assert_allclose(la2, lat, atol=1e-9, err_msg=crs)
        info = parse_crs(crs)
        assert parse_crs(info.canonical()) == info

    # (d) EPSG:29873 fixed point + full WGS84-datum round-trip
    i2 = parse_crs("EPSG:29873")
    assert parse_crs(i2.canonical()) == i2
    lonb = np.array([115.2, 117.5]); latb = np.array([4.5, 6.0])
    xb, yb = transform_xy(lonb, latb, "EPSG:4326", "EPSG:29873")
    lo3, la3 = transform_xy(xb, yb, "EPSG:29873", "EPSG:4326")
    np.testing.assert_allclose(lo3, lonb, atol=1e-8)
    np.testing.assert_allclose(la3, latb, atol=1e-8)


def test_regional_epsg_registrations():
    """Registration-only EPSG codes that reuse already-oracle-verified
    kernels: ETRS89 UTM (258xx) and NAD83 UTM (269xx) equal the WGS84
    UTM parameterization (the standard sub-2 m 0-parameter alias);
    Lambert-93 (EPSG:2154) is LCC 2SP with the published French
    constants; Australian Albers (EPSG:3577) the published GDA94 ones.
    Each round-trips and matches its explicit proj4 spelling."""
    from rasters_ray.proj.crs import parse_crs
    from rasters_ray.proj.transform import transform_xy

    # UTM aliases are EXACTLY the WGS84 zones
    assert parse_crs("EPSG:25832") == parse_crs("EPSG:32632")
    assert parse_crs("EPSG:26910") == parse_crs("EPSG:32610")

    # Lambert-93 == its proj4 spelling; a Paris-area point lands in the
    # published coordinate range (x ~ 650 km, y ~ 6.86 Mm)
    lon = np.array([2.3522]); lat = np.array([48.8566])
    x, y = transform_xy(lon, lat, "EPSG:4326", "EPSG:2154")
    x2, y2 = transform_xy(
        lon, lat, "EPSG:4326",
        "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3"
        " +x_0=700000 +y_0=6600000")
    np.testing.assert_allclose(x, x2, atol=1e-9)
    np.testing.assert_allclose(y, y2, atol=1e-9)
    assert 600000 < x[0] < 700000 and 6.8e6 < y[0] < 6.9e6
    lo, la = transform_xy(x, y, "EPSG:2154", "EPSG:4326")
    np.testing.assert_allclose(lo, lon, atol=1e-9)
    np.testing.assert_allclose(la, lat, atol=1e-9)

    # Australian Albers: Alice Springs lands near the grid center,
    # negative northing (lat_0 = 0), round-trips
    lon = np.array([133.8807]); lat = np.array([-23.6980])
    x, y = transform_xy(lon, lat, "EPSG:4326", "EPSG:3577")
    assert abs(x[0]) < 400000 and -2.8e6 < y[0] < -2.4e6
    lo, la = transform_xy(x, y, "EPSG:3577", "EPSG:4326")
    np.testing.assert_allclose(lo, lon, atol=1e-9)
    np.testing.assert_allclose(la, lat, atol=1e-9)


def test_ups_registration_and_invariants():
    """EPSG:32661/32761 (and 5041/5042) — Universal Polar Stereographic:
    variant A with k0 = 0.994 and the 2,000 km false origin over the
    existing polar-stereographic kernel. Pins: (a) the pole maps to
    exactly (2e6, 2e6); (b) the scale at the pole is k0 = 0.994
    (numerical Jacobian against the ellipsoidal radius of curvature...
    checked against the variant-B k_0=1 kernel: UPS = 0.994 x the
    lat_ts=90 projection + 2e6); (c) round-trips both hemispheres;
    (d) existing variant-B grids (EPSG:3413) are bit-unchanged
    (k_0 = 1 multiplication is exact)."""
    from rasters_ray.proj.crs import parse_crs
    from rasters_ray.proj.transform import transform_xy

    # (a) poles
    x, y = transform_xy(np.array([37.0]), np.array([90.0]),
                        "EPSG:4326", "EPSG:32661")
    assert x[0] == 2000000.0 and y[0] == 2000000.0
    x, y = transform_xy(np.array([37.0]), np.array([-90.0]),
                        "EPSG:4326", "EPSG:32761")
    assert x[0] == 2000000.0 and y[0] == 2000000.0

    # (b) UPS == 0.994 * variant-A(k0=1, lat_ts=90) + 2e6
    lon = np.array([10.0, -120.0, 77.0])
    lat = np.array([85.0, 80.0, 88.0])
    xu, yu = transform_xy(lon, lat, "EPSG:4326", "EPSG:32661")
    xb, yb = transform_xy(
        lon, lat, "EPSG:4326",
        "+proj=stere +lat_0=90 +lat_ts=90 +lon_0=0 +x_0=0 +y_0=0")
    np.testing.assert_allclose(xu, 0.994 * xb + 2000000.0, rtol=1e-14)
    np.testing.assert_allclose(yu, 0.994 * yb + 2000000.0, rtol=1e-14)

    # (c) round-trips
    lo, la = transform_xy(xu, yu, "EPSG:32661", "EPSG:4326")
    np.testing.assert_allclose(lo, lon, atol=1e-9)
    np.testing.assert_allclose(la, lat, atol=1e-9)
    xs, ys = transform_xy(lon, -lat, "EPSG:4326", "EPSG:5042")
    lo, la = transform_xy(xs, ys, "EPSG:5042", "EPSG:4326")
    np.testing.assert_allclose(lo, lon, atol=1e-9)
    np.testing.assert_allclose(la, -lat, atol=1e-9)

    # (d) EPSG:3413 unchanged by the k_0 thread-through
    x3, y3 = transform_xy(lon, lat, "EPSG:4326", "EPSG:3413")
    x3b, y3b = transform_xy(
        lon, lat, "EPSG:4326",
        "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +k_0=1 +x_0=0 +y_0=0")
    np.testing.assert_array_equal(x3, x3b)
    np.testing.assert_array_equal(y3, y3b)
    # canonical fixed point with the k_0 field
    info = parse_crs("EPSG:32661")
    assert parse_crs(info.canonical()) == info
