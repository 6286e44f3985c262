"""Warp + kNN resample semantics (reference kdtree.py / raster.py:1325-1428)."""

import numpy as np
import pytest

from rasters_ray.grids import GridSpec, SwathSpec
from rasters_ray.stages.resample import KNNResampler, warp_array

SRC = GridSpec("EPSG:4326", -120.0, 40.0, 0.01, -0.01, 100, 100)
RAMP = (np.arange(100)[:, None] * 100 + np.arange(100)[None, :]).astype(np.float64)


def test_warp_identity():
    out = warp_array(RAMP, SRC, SRC, "nearest")
    np.testing.assert_array_equal(out, RAMP)
    out = warp_array(RAMP, SRC, SRC, "bilinear")
    np.testing.assert_allclose(out, RAMP, atol=1e-8)


def test_warp_nearest_downscale_offset():
    # target shifted half a source cell: picks src[2r+1, 2c+1]
    tgt = GridSpec("EPSG:4326", -119.995, 39.995, 0.02, -0.02, 50, 50)
    out = warp_array(RAMP, SRC, tgt, "nearest")
    np.testing.assert_array_equal(out, RAMP[1::2, 1::2])


def test_warp_bilinear_is_linear_exact():
    # bilinear reproduces a linear field exactly (away from borders)
    tgt = GridSpec("EPSG:4326", -119.9, 39.9, 0.013, -0.013, 40, 40)
    out = warp_array(RAMP, SRC, tgt, "bilinear")
    # expected: value = row_f*100 + col_f at fractional positions
    tx, ty = tgt.xy()
    colf = (tx + 120.0) / 0.01 - 0.5
    rowf = (ty - 40.0) / -0.01 - 0.5
    np.testing.assert_allclose(out, rowf * 100 + colf, rtol=1e-9)


def test_warp_average_integer_factor():
    tgt = GridSpec("EPSG:4326", -120.0, 40.0, 0.02, -0.02, 50, 50)
    out = warp_array(RAMP, SRC, tgt, "average")
    want = RAMP.reshape(50, 2, 50, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(out, want, rtol=1e-12)


def test_warp_cubic_linear_field():
    tgt = GridSpec("EPSG:4326", -119.9, 39.9, 0.017, -0.017, 30, 30)
    out = warp_array(RAMP, SRC, tgt, "cubic")
    tx, ty = tgt.xy()
    colf = (tx + 120.0) / 0.01 - 0.5
    rowf = (ty - 40.0) / -0.01 - 0.5
    np.testing.assert_allclose(out, rowf * 100 + colf, rtol=1e-6)


def test_warp_outside_fill():
    tgt = GridSpec("EPSG:4326", -130.0, 40.0, 0.01, -0.01, 10, 10)
    out = warp_array(RAMP, SRC, tgt, "nearest", fill_value=np.nan)
    assert np.isnan(out).all()


def test_knn_swath_to_grid():
    # S1-style swath at exactly the grid centers -> identity gather
    gx, gy = SRC.xy()
    swath = SwathSpec(gx, gy)
    r = KNNResampler()
    out = r.resample(RAMP, swath, SRC)
    np.testing.assert_array_equal(out, RAMP)


def test_knn_radius_fill():
    # a tiny 2x2 source far away from most of the target -> fill
    sw = SwathSpec(np.array([[0.0, 0.01], [0.0, 0.01]]), np.array([[0.0, 0.0], [0.01, 0.01]]))
    tgt = GridSpec("EPSG:4326", 0.0, 5.0, 1.0, -1.0, 10, 10)
    r = KNNResampler()
    out = r.resample(np.ones((2, 2)), sw, tgt, fill_value=np.nan)
    # nearest cells: only targets within 2 x max(cell_size_m) keep values
    assert np.isnan(out).sum() > 50


def test_knn_bool_round_trip():
    gx, gy = SRC.xy()
    swath = SwathSpec(gx, gy)
    r = KNNResampler()
    mask = RAMP > 5000
    out = r.resample(mask, swath, SRC)
    assert out.dtype == bool
    np.testing.assert_array_equal(out, mask)


def test_knn_index_cached():
    gx, gy = SRC.xy()
    swath = SwathSpec(gx, gy)
    r = KNNResampler()
    r.resample(RAMP, swath, SRC)
    assert len(r._cache) == 1
    r.resample(RAMP * 2, swath, SRC)
    assert len(r._cache) == 1  # reused, not rebuilt


def test_warp_to_polar_stereographic_target():
    """round 4: warp_array targets the NEW CRS family end-to-end — warp
    a geographic image onto an EPSG:3413 polar grid and back-check pixel
    values through the inverse transform."""
    from rasters_ray.grids import GridSpec
    from rasters_ray.proj import transform_xy
    from rasters_ray.stages.resample import warp_array

    rows, cols = 40, 60
    src_grid = GridSpec(crs="EPSG:4326", x_origin=-50.0, y_origin=75.0,
                        cell_width=0.1, cell_height=-0.1, rows=rows, cols=cols)
    px = (np.arange(rows * cols) % 251).astype(np.float32).reshape(rows, cols)
    xs, ys = transform_xy(
        np.array([-50.0, -44.0, -50.0, -44.0]),
        np.array([75.0, 75.0, 71.0, 71.0]), "EPSG:4326", "EPSG:3413")
    tgt = GridSpec(crs="EPSG:3413", x_origin=float(xs.min()),
                   y_origin=float(ys.max()),
                   cell_width=float((xs.max() - xs.min()) / 50),
                   cell_height=-float((ys.max() - ys.min()) / 50),
                   rows=50, cols=50)
    warped = warp_array(px, src_grid, tgt, "nearest")
    assert warped.shape == (50, 50)
    finite = np.isfinite(warped)
    assert finite.mean() > 0.5  # footprint covers most of the box
    # spot-check several target cells against the inverse mapping
    checked = 0
    for r, c in ((25, 25), (10, 40), (40, 10), (5, 5)):
        cx = tgt.x_origin + (c + 0.5) * tgt.cell_width
        cy = tgt.y_origin + (r + 0.5) * tgt.cell_height
        lon, lat = transform_xy([cx], [cy], "EPSG:3413", "EPSG:4326")
        sr = int(np.floor((lat[0] - src_grid.y_origin) / src_grid.cell_height))
        sc = int(np.floor((lon[0] - src_grid.x_origin) / src_grid.cell_width))
        if 0 <= sr < rows and 0 <= sc < cols and np.isfinite(warped[r, c]):
            assert warped[r, c] == px[sr, sc]
            checked += 1
    assert checked >= 2


def test_warp_to_geos_and_tmerc_targets():
    """Round-5 CRSs integrate with the warp machinery end-to-end: warp a
    geographic image onto a GOES-West fixed-grid target and an NZTM
    target, back-checking pixels through the inverse transforms."""
    from rasters_ray.grids import GridSpec
    from rasters_ray.proj import transform_xy
    from rasters_ray.stages.resample import warp_array

    rows, cols = 40, 60
    px = (np.arange(rows * cols) % 251).astype(np.float32).reshape(rows, cols)

    def run(src_box, src_crs, tgt_crs):
        x0, y0, cw, ch = src_box
        src_grid = GridSpec(crs=src_crs, x_origin=x0, y_origin=y0,
                            cell_width=cw, cell_height=ch,
                            rows=rows, cols=cols)
        lon_c = [x0, x0 + cols * cw, x0, x0 + cols * cw]
        lat_c = [y0, y0, y0 + rows * ch, y0 + rows * ch]
        xs, ys = transform_xy(np.array(lon_c), np.array(lat_c),
                              src_crs, tgt_crs)
        tgt = GridSpec(crs=tgt_crs, x_origin=float(xs.min()),
                       y_origin=float(ys.max()),
                       cell_width=float((xs.max() - xs.min()) / 50),
                       cell_height=-float((ys.max() - ys.min()) / 50),
                       rows=50, cols=50)
        warped = warp_array(px, src_grid, tgt, "nearest")
        assert warped.shape == (50, 50)
        assert np.isfinite(warped).mean() > 0.5
        hits = 0
        for r, c in ((25, 25), (10, 40), (40, 10), (5, 5)):
            cx = tgt.x_origin + (c + 0.5) * tgt.cell_width
            cy = tgt.y_origin + (r + 0.5) * tgt.cell_height
            lon, lat = transform_xy([cx], [cy], tgt_crs, src_crs)
            sr = int(np.floor((lat[0] - src_grid.y_origin)
                              / src_grid.cell_height))
            sc = int(np.floor((lon[0] - src_grid.x_origin)
                              / src_grid.cell_width))
            if 0 <= sr < rows and 0 <= sc < cols and np.isfinite(warped[r, c]):
                assert warped[r, c] == px[sr, sc]
                hits += 1
        assert hits >= 2

    run((-126.0, 45.0, 0.1, -0.1), "EPSG:4326",
        "+proj=geos +h=35786023 +lon_0=-137 +sweep=x")
    run((172.0, -40.0, 0.05, -0.05), "EPSG:4326", "EPSG:2193")


def test_warp_to_swiss_and_mollweide_targets():
    """The round-5 somerc/moll/ortho CRSs integrate with the warp
    machinery end-to-end, back-checking pixels through the inverse
    transforms (same harness as the geos/NZTM leg)."""
    from rasters_ray.grids import GridSpec
    from rasters_ray.proj import transform_xy
    from rasters_ray.stages.resample import warp_array

    rows, cols = 40, 60
    px = (np.arange(rows * cols) % 251).astype(np.float32).reshape(rows, cols)

    def run(src_box, src_crs, tgt_crs):
        x0, y0, cw, ch = src_box
        src_grid = GridSpec(crs=src_crs, x_origin=x0, y_origin=y0,
                            cell_width=cw, cell_height=ch,
                            rows=rows, cols=cols)
        lon_c = [x0, x0 + cols * cw, x0, x0 + cols * cw]
        lat_c = [y0, y0, y0 + rows * ch, y0 + rows * ch]
        xs, ys = transform_xy(np.array(lon_c), np.array(lat_c),
                              src_crs, tgt_crs)
        tgt = GridSpec(crs=tgt_crs, x_origin=float(xs.min()),
                       y_origin=float(ys.max()),
                       cell_width=float((xs.max() - xs.min()) / 50),
                       cell_height=-float((ys.max() - ys.min()) / 50),
                       rows=50, cols=50)
        warped = warp_array(px, src_grid, tgt, "nearest")
        assert warped.shape == (50, 50)
        assert np.isfinite(warped).mean() > 0.5
        hits = 0
        for r, c in ((25, 25), (10, 40), (40, 10), (5, 5)):
            cx = tgt.x_origin + (c + 0.5) * tgt.cell_width
            cy = tgt.y_origin + (r + 0.5) * tgt.cell_height
            lon, lat = transform_xy([cx], [cy], tgt_crs, src_crs)
            sr = int(np.floor((lat[0] - src_grid.y_origin)
                              / src_grid.cell_height))
            sc = int(np.floor((lon[0] - src_grid.x_origin)
                              / src_grid.cell_width))
            if 0 <= sr < rows and 0 <= sc < cols and np.isfinite(warped[r, c]):
                assert warped[r, c] == px[sr, sc]
                hits += 1
        assert hits >= 2

    run((6.0, 47.8, 0.05, -0.04), "EPSG:4326", "EPSG:2056")
    run((-10.0, 50.0, 0.5, -0.5), "EPSG:4326", "ESRI:54009")
    run((5.0, 50.0, 0.2, -0.2), "EPSG:4326",
        "+proj=ortho +lat_0=46 +lon_0=8")


def test_warp_to_world_projection_targets():
    """Round-5 close: the new world CRSs (Equal Earth, Robinson, Winkel
    Tripel, Hammer) integrate with the warp machinery end-to-end — warp
    a geographic image onto each target and back-check pixels through
    the inverse transform."""
    from rasters_ray.grids import GridSpec
    from rasters_ray.proj import transform_xy
    from rasters_ray.stages.resample import warp_array

    rows, cols = 30, 50
    src_grid = GridSpec(crs="EPSG:4326", x_origin=-10.0, y_origin=55.0,
                        cell_width=0.5, cell_height=-0.5, rows=rows, cols=cols)
    px = (np.arange(rows * cols) % 199).astype(np.float32).reshape(rows, cols)
    for crs in ("EPSG:8857", "ESRI:54030", "ESRI:54042", "ESRI:54044",
                "ESRI:54029", "ESRI:54043",
                "+proj=natearth +lon_0=0 +x_0=0 +y_0=0"):
        xs, ys = transform_xy(
            np.array([-10.0, 15.0, -10.0, 15.0]),
            np.array([55.0, 55.0, 40.0, 40.0]), "EPSG:4326", crs)
        tgt = GridSpec(crs=crs, x_origin=float(xs.min()),
                       y_origin=float(ys.max()),
                       cell_width=float((xs.max() - xs.min()) / 40),
                       cell_height=-float((ys.max() - ys.min()) / 40),
                       rows=40, cols=40)
        warped = warp_array(px, src_grid, tgt, "nearest")
        assert warped.shape == (40, 40)
        assert np.isfinite(warped).mean() > 0.5, crs
        checked = 0
        for r, c in ((20, 20), (8, 30), (30, 8), (35, 35)):
            cx = tgt.x_origin + (c + 0.5) * tgt.cell_width
            cy = tgt.y_origin + (r + 0.5) * tgt.cell_height
            lon, lat = transform_xy([cx], [cy], crs, "EPSG:4326")
            sr = int(np.floor((lat[0] - src_grid.y_origin)
                              / src_grid.cell_height))
            sc = int(np.floor((lon[0] - src_grid.x_origin)
                              / src_grid.cell_width))
            if 0 <= sr < rows and 0 <= sc < cols and np.isfinite(warped[r, c]):
                assert warped[r, c] == px[sr, sc], crs
                checked += 1
        assert checked >= 2, crs


def test_conservative_regrid_conservation_and_bruteforce():
    from rasters_ray.stages.resample import (conservative_overlaps,
                                             conservative_regrid_mass)

    rng = np.random.default_rng(3)
    v = rng.integers(0, 100, (24, 24))
    m = conservative_regrid_mass(v, 2, 16, 16, 3)
    assert m.shape == (16, 16)
    assert m.sum() == v.sum() * 4  # exact mass conservation
    # identity grid: mass = v * unit^2
    v2 = rng.integers(0, 9, (8, 8))
    assert (conservative_regrid_mass(v2, 3, 8, 8, 3) == v2 * 9).all()
    # brute force a non-trivial ratio
    v3 = rng.integers(0, 10, (4, 4))
    m3 = conservative_regrid_mass(v3, 3, 6, 6, 2)
    for tr in range(6):
        for tc in range(6):
            tot = 0
            for sr in range(4):
                for sc in range(4):
                    orow = max(0, min(3 * sr + 3, 2 * tr + 2) - max(3 * sr, 2 * tr))
                    ocol = max(0, min(3 * sc + 3, 2 * tc + 2) - max(3 * sc, 2 * tc))
                    tot += v3[sr, sc] * orow * ocol
            assert m3[tr, tc] == tot
    # overlap rows of a matched-extent pair partition the source cell
    o = conservative_overlaps(24, 2, 16, 3)
    assert (o.sum(axis=0) == 2).all() and (o.sum(axis=1) == 3).all()
    with pytest.raises(ValueError):
        conservative_regrid_mass(np.array([[1.5]]), 1, 1, 1, 1)
    with pytest.raises(ValueError):
        conservative_overlaps(0, 1, 1, 1)
