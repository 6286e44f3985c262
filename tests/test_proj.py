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
        parse_crs("EPSG:3857")
