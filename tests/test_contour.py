"""Iso-contour extraction (gdal_contour / matplotlib center-lattice
marching squares parity) — stages/contour.py."""

import numpy as np
import pytest

from rasters_ray.grids import GridSpec
from rasters_ray.stages.contour import (contour_lines, contour_segments,
                                        stitch_segments)


def _grid(rows=16, cols=16):
    return GridSpec(crs="EPSG:4326", x_origin=-120.0, y_origin=40.0,
                    cell_width=1 / 64, cell_height=-1 / 64,
                    rows=rows, cols=cols)


def test_ramp_contour_is_exact_horizontal_line():
    v = np.repeat(np.arange(16.0)[:, None], 16, axis=1)
    t = contour_lines(v, _grid(), [3.5])
    assert t.num_rows == 1
    pts = t.column("paths")[0].as_py()[0]
    assert len(pts) == 16
    # t = 0.5 interpolation is exact: one dyadic y for the whole line
    assert {p["y"] for p in pts} == {40.0 - 4 / 64}
    xs = sorted(p["x"] for p in pts)
    assert xs[0] == -120.0 + 0.5 / 64 and xs[-1] == -120.0 + 15.5 / 64


def test_circle_contour_closes_and_interpolates():
    rr, cc = np.mgrid[0:16, 0:16]
    f = ((rr - 8.0) ** 2 + (cc - 8.0) ** 2).astype(float)
    t = contour_lines(f, _grid(), [10.0])
    assert t.num_rows == 1  # one closed loop
    pts = t.column("paths")[0].as_py()[0]
    assert pts[0] == pts[-1]
    # every vertex lies on the level set within interpolation error
    for p in pts:
        c = (p["x"] - (-120.0)) / (1 / 64) - 0.5
        r = (40.0 - p["y"]) / (1 / 64) - 0.5
        val = (r - 8.0) ** 2 + (c - 8.0) ** 2
        assert val == pytest.approx(10.0, abs=1.5)  # linear-interp error


def test_saddles_emit_two_segments_and_nan_blocks():
    s = np.array([[1.0, 0.0], [0.0, 1.0]])
    assert len(contour_segments(s, 0.5)) == 2
    s2 = np.array([[0.0, 1.0], [1.0, 0.0]])
    assert len(contour_segments(s2, 0.5)) == 2
    n = np.array([[1.0, 0.0], [np.nan, 1.0]])
    assert contour_segments(n, 0.5) == []  # NaN poisons the square


def test_open_chain_endpoints_on_boundary():
    # diagonal ramp: contours run corner to corner, open at the edges
    rr, cc = np.mgrid[0:8, 0:8]
    v = (rr + cc).astype(float)
    t = contour_lines(v, _grid(8, 8), [6.5])
    assert t.num_rows == 1
    pts = t.column("paths")[0].as_py()[0]
    assert pts[0] != pts[-1]  # open polyline
    # all vertices on the level set exactly (t=0.5 dyadic)
    for p in pts:
        c = (p["x"] + 120.0) * 64 - 0.5
        r = (40.0 - p["y"]) * 64 - 0.5
        assert r + c == pytest.approx(6.5, abs=1e-9)


def test_multi_level_and_stitch_determinism():
    v = np.repeat(np.arange(10.0)[:, None], 10, axis=1)
    t = contour_lines(v, _grid(10, 10), [1.5, 4.5, 8.5])
    assert t.column("level").to_pylist() == [1.5, 4.5, 8.5]
    # same input twice -> identical output (exact stitching, no
    # tolerance, deterministic start ordering)
    t2 = contour_lines(v, _grid(10, 10), [1.5, 4.5, 8.5])
    assert t.equals(t2)
