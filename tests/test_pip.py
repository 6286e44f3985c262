"""PIP join + rasterize vs brute-force oracle (FIXTURES.md §6.4)."""

import numpy as np

from rasters_ray.grids import GridSpec
from rasters_ray.sources import fixture_points, fixture_polygons, rings_to_numpy
from rasters_ray.stages.pip import PolygonSet, point_in_rings, rasterize_mask


def _brute_pip(px, py, rings):
    """Independent matplotlib-style even-odd implementation."""
    out = np.zeros(len(px), dtype=int)
    for ring in rings:
        r = ring
        if not (r[0] == r[-1]).all():
            r = np.vstack([r, r[0]])
        for i in range(len(px)):
            x, y = px[i], py[i]
            c = False
            for j in range(len(r) - 1):
                x1, y1 = r[j]
                x2, y2 = r[j + 1]
                if (y1 > y) != (y2 > y):
                    xin = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
                    if x < xin:
                        c = not c
            out[i] += c
    return out % 2 == 1


def test_point_in_rings_matches_brute_force():
    polys = fixture_polygons(16)
    rng = np.random.default_rng(3)
    px = rng.uniform(-125, -110, 300)
    py = rng.uniform(30, 45, 300)
    for i in range(polys.num_rows):
        rings = rings_to_numpy(polys.column("rings")[i].as_py())
        got = point_in_rings(px, py, rings)
        want = _brute_pip(px, py, rings)
        np.testing.assert_array_equal(got, want)


def test_polygon_with_hole():
    polys = fixture_polygons(4)
    rings = rings_to_numpy(polys.column("rings")[3].as_py())  # the holed one
    assert len(rings) == 2
    # center of the hole -> outside; ring area between -> inside
    assert not point_in_rings(np.array([-119.5]), np.array([39.5]), rings)[0]
    assert point_in_rings(np.array([-119.8]), np.array([39.8]), rings)[0]


def test_polygon_set_candidates_equal_exact():
    polys = fixture_polygons(24)
    ps = PolygonSet(polys)
    rng = np.random.default_rng(4)
    px = rng.uniform(-125, -110, 500)
    py = rng.uniform(30, 45, 500)
    qi, bi = ps.test_points(px, py)
    got = set(zip(qi.tolist(), bi.tolist()))
    want = set()
    for pi in range(len(ps.rings)):
        ins = _brute_pip(px, py, ps.rings[pi])
        for i in np.nonzero(ins)[0]:
            want.add((int(i), pi))
    assert got == want


def test_rasterize_center_containment():
    # golden box (-119.95..-119.90, 39.90..39.95) on G1: cell centers at
    # -119.9x5 -> cols 5..9, rows 5..9 inside
    g = GridSpec("EPSG:4326", -120.0, 40.0, 0.01, -0.01, 100, 100)
    polys = fixture_polygons(1)
    mask = rasterize_mask(g, polys.slice(0, 1))
    rows, cols = np.where(mask)
    assert rows.min() == 5 and rows.max() == 9
    assert cols.min() == 5 and cols.max() == 9
    inv = rasterize_mask(g, polys.slice(0, 1), invert=True)
    np.testing.assert_array_equal(inv, ~mask)


def test_pip_join_dataset(ray_session):
    import ray.data as rd

    pts = fixture_points(400)
    polys = fixture_polygons(16)
    from rasters_ray.stages import pip_join

    # drop UTM-crs points for this geographic-only check
    import pyarrow.compute as pc

    tbl = pts.filter(pc.equal(pts.column("crs"), "EPSG:4326"))
    res = pip_join(rd.from_arrow(tbl), polys, mode="inner").to_pandas()
    ps = PolygonSet(polys)
    px = tbl.column("x").to_numpy()
    py = tbl.column("y").to_numpy()
    qi, bi = ps.test_points(px, py)
    assert len(res) == len(qi)
    got = set(zip(res.point_id, res.poly_id))
    ids = tbl.column("point_id").to_pylist()
    want = {(ids[q], ps.ids[b]) for q, b in zip(qi.tolist(), bi.tolist())}
    assert got == want
