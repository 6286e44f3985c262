"""Vector-geometry measures (area/perimeter/centroid/bounds, convex
hull, Douglas-Peucker) — reference parity: the shapely surface behind
Polygon.centroid/bounds (rasters/polygon.py:51,92) and
VectorGeometry.to_shapely().area/.length/.convex_hull/.simplify
(rasters/vector_geometry.py:96)."""

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray.sources.vectors import RING_TYPE, fixture_polygons
from rasters_ray.stages.geomvec import (classify_holes, convex_hull,
                                        convex_hulls, geometry_stats,
                                        polygon_measures, ring_length,
                                        ring_signed_area, simplify_ring,
                                        simplify_polygons)


def _rect(x0, y0, w, h, cw=False):
    r = np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h],
                  [x0, y0 + h], [x0, y0]], dtype=np.float64)
    return r[::-1].copy() if cw else r


def test_rectangle_with_hole_exact():
    outer = _rect(0, 0, 4, 2)
    hole = _rect(1, 0.5, 1, 1)
    area, perim, cx, cy = polygon_measures([outer, hole])
    assert area == 4 * 2 - 1 * 1
    assert perim == 2 * (4 + 2) + 2 * (1 + 1)
    assert classify_holes([outer, hole]) == [False, True]
    # centroid shifts away from the off-center hole
    assert cx > 2.0 and abs(cy - 1.0) < 1e-12


def test_winding_independence():
    # both rings clockwise (shapefile convention) vs mixed: same result
    a1 = polygon_measures([_rect(0, 0, 4, 2, cw=True),
                           _rect(1, 0.5, 1, 1, cw=True)])
    a2 = polygon_measures([_rect(0, 0, 4, 2), _rect(1, 0.5, 1, 1, cw=True)])
    assert a1[0] == a2[0] == 7.0
    assert abs(a1[2] - a2[2]) < 1e-12 and abs(a1[3] - a2[3]) < 1e-12


def test_signed_area_and_length():
    tri = np.array([[0, 0], [3, 0], [0, 4], [0, 0]], float)
    assert ring_signed_area(tri) == 6.0  # CCW positive
    assert ring_signed_area(tri[::-1]) == -6.0
    assert ring_length(tri) == 3 + 4 + 5
    open_line = np.array([[0, 0], [3, 4]], float)
    assert ring_length(open_line, closed=False) == 5.0


def test_triangle_centroid_matches_vertex_mean():
    tri = np.array([[0, 0], [6, 0], [0, 9], [0, 0]], float)
    _, _, cx, cy = polygon_measures([tri])
    assert abs(cx - 2.0) < 1e-12 and abs(cy - 3.0) < 1e-12


def test_convex_hull_monotone_chain():
    rng = np.random.default_rng(5)
    pts = rng.uniform(-1, 1, (200, 2))
    corners = np.array([[-2, -2], [2, -2], [2, 2], [-2, 2]], float)
    hull = convex_hull(np.vstack([pts, corners]))
    # the 4 injected corners dominate: hull is exactly the square
    assert len(hull) == 5 and np.array_equal(hull[0], hull[-1])
    assert set(map(tuple, hull[:-1])) == set(map(tuple, corners))
    assert ring_signed_area(hull) == 16.0  # CCW by construction
    # collinear points are dropped
    line = np.array([[0, 0], [1, 1], [2, 2], [3, 3]], float)
    h = convex_hull(line)
    assert len(h) <= 3


def test_simplify_ring_douglas_peucker():
    # a square with a redundant midpoint on each edge
    sq = np.array([[0, 0], [2, 0], [4, 0], [4, 2], [4, 4], [2, 4],
                   [0, 4], [0, 2], [0, 0]], float)
    out = simplify_ring(sq, tol=0.01)
    assert abs(ring_signed_area(out)) == 16.0
    assert len(out) <= 6  # the 4 corners + closure (anchor may add 1)
    # a wiggle above tolerance survives
    wig = np.array([[0, 0], [2, 0.5], [4, 0], [4, 4], [0, 4], [0, 0]], float)
    out2 = simplify_ring(wig, tol=0.1)
    assert any(np.array_equal(p, [2, 0.5]) for p in out2)
    out3 = simplify_ring(wig, tol=1.0)
    assert not any(np.array_equal(p, [2, 0.5]) for p in out3)
    # open polyline mode keeps endpoints
    line = np.array([[0, 0], [1, 0.01], [2, 0], [3, 5], [4, 0]], float)
    s = simplify_ring(line, tol=0.1, closed=False)
    assert np.array_equal(s[0], [0, 0]) and np.array_equal(s[-1], [4, 0])
    assert any(np.array_equal(p, [3, 5]) for p in s)


def test_geometry_stats_dataset(ray_session):
    import ray.data as rd

    t = fixture_polygons(8)
    rows = geometry_stats(rd.from_arrow(t)).take_all()
    got = {r["poly_id"]: r for r in rows}
    for i in range(8):
        cell = t.column("rings")[i].as_py()
        rings = [np.array([(p["x"], p["y"]) for p in part]) for part in cell]
        area, perim, cx, cy = polygon_measures(rings)
        r = got[f"poly{i:04d}"]
        assert r["area"] == area and r["perimeter"] == perim
        assert r["centroid_x"] == cx and r["centroid_y"] == cy
        allp = np.vstack(rings)
        assert r["xmin"] == allp[:, 0].min() and r["ymax"] == allp[:, 1].max()


def test_simplify_and_hull_stages(ray_session):
    import ray.data as rd

    t = fixture_polygons(6)
    simp = pa.Table.from_pylist(
        simplify_polygons(rd.from_arrow(t), tol=1e-9).take_all())
    assert simp.num_rows == 6 and "rings" in simp.column_names
    hull = pa.Table.from_pylist(convex_hulls(rd.from_arrow(t)).take_all())
    # hull of the holed polygon equals its outer box
    cell = hull.to_pylist()[3]["rings"]
    assert len(cell) == 1  # hole collapsed away
    ring = np.array([(p["x"], p["y"]) for p in cell[0]])
    assert abs(ring_signed_area(ring)) == pytest.approx(0.8 * 0.8)
    # line tables hull into rings
    lt = pa.table({
        "line_id": pa.array(["l0"]),
        "paths": pa.array([[[{"x": 0.0, "y": 0.0}, {"x": 1.0, "y": 0.0},
                             {"x": 1.0, "y": 1.0}]]], RING_TYPE),
        "crs": pa.array(["EPSG:4326"]),
    })
    h2 = pa.Table.from_pylist(convex_hulls(rd.from_arrow(lt)).take_all())
    assert "rings" in h2.column_names


def test_clip_ring_bbox_exact():
    from rasters_ray.stages.geomvec import clip_ring_bbox

    r = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
    # fully inside the box: unchanged area
    c = clip_ring_bbox(r, -1, -1, 5, 5)
    assert abs(ring_signed_area(c)) == 16.0
    # half clipped
    c = clip_ring_bbox(r, 2, -1, 9, 9)
    assert abs(ring_signed_area(c)) == 8.0
    # corner clip -> quarter
    c = clip_ring_bbox(r, 2, 2, 9, 9)
    assert abs(ring_signed_area(c)) == 4.0
    # disjoint and touching -> empty
    assert len(clip_ring_bbox(r, 5, 5, 6, 6)) == 0
    assert len(clip_ring_bbox(r, 4, 0, 6, 4)) == 0
    # a triangle clipped to a box gains the cut vertices
    tri = np.array([[0, 0], [8, 0], [0, 8], [0, 0]], float)
    c = clip_ring_bbox(tri, 0, 0, 6, 6)
    # box area minus the corner triangle cut off by the hypotenuse
    assert abs(ring_signed_area(c)) == 36.0 - 8.0


def test_clip_polygons_stage_hole_semantics(ray_session):
    import ray.data as rd
    from rasters_ray.stages.geomvec import clip_polygons

    donut = [[{"x": float(x), "y": float(y)} for x, y in
              [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]],
             [{"x": float(x), "y": float(y)} for x, y in
              [(3, 3), (7, 3), (7, 7), (3, 7), (3, 3)]]]
    far = [[{"x": float(x), "y": float(y)} for x, y in
            [(100, 100), (101, 100), (101, 101), (100, 100)]]]
    t = pa.table({"poly_id": pa.array(["d", "f"], pa.string()),
                  "rings": pa.array([donut, far], RING_TYPE),
                  "crs": pa.array(["EPSG:4326"] * 2, pa.string())})
    rows = clip_polygons(rd.from_arrow(t), (2, 2, 8, 8)).take_all()
    assert len(rows) == 1 and rows[0]["poly_id"] == "d"  # far feature dropped
    rings = [np.array([(p["x"], p["y"]) for p in part])
             for part in rows[0]["rings"]]
    area, _, _, _ = polygon_measures(rings)
    assert area == 6 * 6 - 4 * 4  # clipped outer minus surviving hole


def test_line_interpolate_locate_substring():
    from rasters_ray.stages.geomvec import (line_interpolate, line_locate,
                                            line_substring)

    parts = [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0]], float)]
    assert line_interpolate(parts, 0.0) == (0.0, 0.0)
    assert line_interpolate(parts, 2.0) == (2.0, 0.0)
    assert line_interpolate(parts, 4.0) == (4.0, 0.0)  # vertex bit-exact
    assert line_interpolate(parts, 5.5) == (4.0, 1.5)
    assert line_interpolate(parts, 99.0) == (4.0, 3.0)  # clamped
    assert line_interpolate(parts, -1.0) == (0.0, 0.0)
    assert line_locate(parts, 2.0, -5.0) == 2.0
    assert line_locate(parts, 9.0, 1.5) == 5.5
    assert line_locate(parts, -3.0, -3.0) == 0.0  # clamps to start
    sub = line_substring(parts, 1.0, 6.0)
    assert np.array_equal(sub, [[1, 0], [4, 0], [4, 2]])
    # degenerate + swapped args
    assert len(line_substring(parts, 3.0, 3.0)) == 1
    assert np.array_equal(line_substring(parts, 6.0, 1.0), sub)
    # multi-part chains join in order
    two = [np.array([[0.0, 0.0], [2.0, 0.0]]),
           np.array([[2.0, 0.0], [2.0, 2.0]])]
    assert line_interpolate(two, 3.0) == (2.0, 1.0)


def test_raster_profile_nearest_and_bilinear():
    from rasters_ray.grids import GridSpec
    from rasters_ray.stages.geomvec import raster_profile

    g = GridSpec(crs="EPSG:32610", x_origin=0.0, y_origin=8.0,
                 cell_width=1.0, cell_height=-1.0, rows=8, cols=8)
    ramp = np.repeat(np.arange(8.0)[None, :], 8, axis=0)  # value = col idx
    line = [np.array([[0.5, 7.5], [6.5, 7.5]], float)]
    t = raster_profile(ramp, g, line, 1.0)
    assert t.column("value").to_pylist() == [0, 1, 2, 3, 4, 5, 6]
    assert t.column("station").to_pylist() == [0, 1, 2, 3, 4, 5, 6]
    # bilinear between centers interpolates linearly
    half = raster_profile(ramp, g, [np.array([[1.0, 7.5], [2.0, 7.5]])],
                          1.0, method="bilinear")
    assert half.column("value").to_pylist() == [0.5, 1.5]
    # stations outside the grid -> NaN
    out = raster_profile(ramp, g, [np.array([[-5.0, 7.5], [-4.0, 7.5]])], 1.0)
    assert all(np.isnan(v) for v in out.column("value").to_pylist())
    with pytest.raises(ValueError):
        raster_profile(ramp, g, line, 1.0, method="cubic")


def test_segments_intersect_cases_and_bruteforce():
    from fractions import Fraction

    from rasters_ray.stages.geomvec import segments_intersect

    a0 = np.array([[0, 0]])
    a1 = np.array([[4, 4]])
    b0 = np.array([[0, 4], [4, 4], [2, 2], [5, 0], [0, 1]])
    b1 = np.array([[4, 0], [6, 6], [6, 6], [6, 1], [4, 5]])
    assert segments_intersect(a0, a1, b0, b1).tolist() == [
        [True, True, True, False, False]]

    # randomized brute force against an exact rational param solver
    def ref(p0, p1, q0, q1):
        d = ((p1[0] - p0[0]) * (q1[1] - q0[1])
             - (p1[1] - p0[1]) * (q1[0] - q0[0]))
        if d != 0:
            t = Fraction((q0[0] - p0[0]) * (q1[1] - q0[1])
                         - (q0[1] - p0[1]) * (q1[0] - q0[0]), d)
            u = Fraction((q0[0] - p0[0]) * (p1[1] - p0[1])
                         - (q0[1] - p0[1]) * (p1[0] - p0[0]), d)
            return 0 <= t <= 1 and 0 <= u <= 1
        # parallel: intersect iff collinear and 1-D projections overlap
        if ((q0[0] - p0[0]) * (p1[1] - p0[1])
                - (q0[1] - p0[1]) * (p1[0] - p0[0])) != 0:
            return False
        ax = sorted([p0[0], p1[0]]); bx = sorted([q0[0], q1[0]])
        ay = sorted([p0[1], p1[1]]); by = sorted([q0[1], q1[1]])
        return ax[0] <= bx[1] and bx[0] <= ax[1] \
            and ay[0] <= by[1] and by[0] <= ay[1]

    rng = np.random.default_rng(13)
    A0 = rng.integers(0, 8, (25, 2)); A1 = rng.integers(0, 8, (25, 2))
    B0 = rng.integers(0, 8, (25, 2)); B1 = rng.integers(0, 8, (25, 2))
    got = segments_intersect(A0, A1, B0, B1)
    for ii in range(25):
        for jj in range(25):
            want = ref(A0[ii].tolist(), A1[ii].tolist(),
                       B0[jj].tolist(), B1[jj].tolist())
            assert got[ii, jj] == want, (ii, jj)
