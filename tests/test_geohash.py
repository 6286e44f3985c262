"""Geohash encoder vs the bisection reference definition."""

import numpy as np
import pytest

from rasters_ray.grids.cellkey import GEOHASH32, geohash_encode


def _ref(lat, lon, precision):
    lat_i, lon_i = (-90.0, 90.0), (-180.0, 180.0)
    bits, even = [], True
    while len(bits) < 5 * precision:
        if even:
            mid = (lon_i[0] + lon_i[1]) / 2
            if lon >= mid:
                bits.append(1)
                lon_i = (mid, lon_i[1])
            else:
                bits.append(0)
                lon_i = (lon_i[0], mid)
        else:
            mid = (lat_i[0] + lat_i[1]) / 2
            if lat >= mid:
                bits.append(1)
                lat_i = (mid, lat_i[1])
            else:
                bits.append(0)
                lat_i = (lat_i[0], mid)
        even = not even
    out = ""
    for i in range(precision):
        v = 0
        for b in bits[5 * i: 5 * i + 5]:
            v = v * 2 + b
        out += GEOHASH32[v]
    return out


def test_matches_bisection_reference():
    rng = np.random.default_rng(1)
    lon = rng.uniform(-179, 179, 400)
    lat = rng.uniform(-89, 89, 400)
    for prec in (4, 6):
        _, strs = geohash_encode(lon, lat, prec)
        for i in range(len(lon)):
            assert strs[i] == _ref(lat[i], lon[i], prec)


def test_known_vectors():
    # the canonical example from the original geohash.org announcement
    _, s = geohash_encode(np.array([10.40744]), np.array([57.64911]), 6)
    assert s[0] == "u4pruy"
    _, s = geohash_encode(np.array([-5.6]), np.array([42.6]), 5)
    assert s[0] == "ezs42"


def test_prefix_property():
    g6, s6 = geohash_encode(np.array([-123.989]), np.array([43.999]), 6)
    g4, s4 = geohash_encode(np.array([-123.989]), np.array([43.999]), 4)
    assert s6[0].startswith(s4[0])


def test_precision_bounds():
    with pytest.raises(ValueError):
        geohash_encode(np.array([0.0]), np.array([0.0]), 0)
