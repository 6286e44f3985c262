"""Raster polygonization (gdal_polygonize / rasterio.features.shapes
parity — the inverse of rasterize_mask): boundary tracing, hole
emergence, pinch-point splitting, rasterize round-trip."""

import numpy as np
import pytest

from rasters_ray.grids import GridSpec
from rasters_ray.stages.geomvec import polygon_measures
from rasters_ray.stages.pip import rasterize_mask
from rasters_ray.stages.polygonize import polygonize, trace_rings


def _grid(rows=10, cols=12):
    return GridSpec(crs="EPSG:4326", x_origin=-120.0, y_origin=40.0,
                    cell_width=1 / 64, cell_height=-1 / 64,
                    rows=rows, cols=cols)


def _rings_np(cell):
    return [np.array([(p["x"], p["y"]) for p in part]) for part in cell]


def test_rectangle_with_hole():
    a = np.zeros((10, 12), dtype=np.int32)
    a[2:8, 3:9] = 5
    a[4:6, 5:7] = 0
    t = polygonize(a, _grid())
    assert t.column("poly_id").to_pylist() == ["lbl5"]
    rings = _rings_np(t.column("rings")[0].as_py())
    assert len(rings) == 2  # outer + hole, both collapsed to 4 corners
    assert all(len(r) == 5 for r in rings)
    area, perim, _, _ = polygon_measures(rings)
    assert area * 4096 == pytest.approx(6 * 6 - 2 * 2)
    assert perim * 64 == pytest.approx(4 * 6 + 4 * 2)
    # corner coordinates are exact lattice points
    xs = sorted({p[0] for p in rings[0]})
    assert xs[0] == -120.0 + 3 / 64 and xs[-1] == -120.0 + 9 / 64


def test_multiple_labels_and_nan_background():
    a = np.full((6, 6), np.nan)
    a[0:2, 0:2] = 1.0
    a[4:6, 4:6] = 2.0
    t = polygonize(a, _grid(6, 6), background=None)
    assert sorted(t.column("poly_id").to_pylist()) == ["lbl1.0", "lbl2.0"]


def test_pinch_point_splits():
    m = np.zeros((3, 3), dtype=bool)
    m[0, 0] = m[1, 1] = True
    rings = trace_rings(m)
    assert len(rings) == 2 and all(len(r) - 1 == 4 for r in rings)
    m2 = np.zeros((3, 3), dtype=bool)
    m2[0, 1] = m2[1, 0] = True
    assert len(trace_rings(m2)) == 2


def test_rasterize_roundtrip():
    # polygonize(rasterize(region)) reproduces the mask exactly
    g = _grid(16, 16)
    a = np.zeros((16, 16), dtype=np.int32)
    a[3:9, 2:14] = 1
    a[5:7, 4:6] = 0   # hole
    a[12:14, 12:16] = 1  # second region touching the edge
    t = polygonize(a, g)
    assert t.num_rows == 1  # same label -> one feature, multiple loops
    import pyarrow as pa

    back = rasterize_mask(g, t)
    assert np.array_equal(back, a == 1)
