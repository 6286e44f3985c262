"""Horn gradient: brute force per pixel, edge/NaN exclusion, and the
halo-tiled path asserted BIT-EQUAL to the whole-image path."""

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray import codec
from rasters_ray.sources.images import make_oracle_images
from rasters_ray.stages.terrain import (
    horn_numerators,
    terrain_gradient,
    terrain_halo_tiled,
)


def _ds(table: pa.Table, blocks: int = 3):
    import ray.data as rd

    return rd.from_arrow(table).repartition(blocks)


def test_horn_numerators_brute_force():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 251, (9, 12)).astype(np.float64)
    pad = np.full((11, 14), np.nan)
    pad[1:-1, 1:-1] = a
    gx, gy, valid = horn_numerators(pad)
    assert gx.shape == (9, 12)
    # interior rows/cols valid, border invalid
    assert valid[1:-1, 1:-1].all()
    assert not valid[0].any() and not valid[:, -1].any()
    for i, j in [(1, 1), (4, 7), (7, 10)]:
        w = a[i - 1 : i + 2, j - 1 : j + 2]
        want_gx = (w[0, 2] + 2 * w[1, 2] + w[2, 2]) - (w[0, 0] + 2 * w[1, 0] + w[2, 0])
        want_gy = (w[2, 0] + 2 * w[2, 1] + w[2, 2]) - (w[0, 0] + 2 * w[0, 1] + w[0, 2])
        assert gx[i, j] == want_gx
        assert gy[i, j] == want_gy


def test_horn_nan_neighbor_invalidates():
    a = np.arange(25, dtype=np.float64).reshape(5, 5)
    a[2, 2] = np.nan
    pad = np.full((7, 7), np.nan)
    pad[1:-1, 1:-1] = a
    _, _, valid = horn_numerators(pad)
    # every window touching the NaN center is invalid
    assert not valid[1:4, 1:4].any()


def test_terrain_halo_equals_whole(ray_session):
    imgs = make_oracle_images(np.arange(5, dtype=np.int64))
    whole = (
        terrain_gradient(_ds(imgs, 2), step=3)
        .to_pandas()
        .sort_values(["image_id", "r", "c"])
        .reset_index(drop=True)
    )
    tiled = (
        terrain_halo_tiled(_ds(imgs, 2), step=3, tile=16)
        .to_pandas()
        .sort_values(["image_id", "r", "c"])
        .reset_index(drop=True)
    )
    assert len(whole) == len(tiled) > 0
    for col in ("image_id", "r", "c", "gx_num", "gy_num"):
        assert (whole[col] == tiled[col]).all()
    # grad must be BIT-equal (same float op order on both paths)
    assert (
        whole["grad"].to_numpy().tobytes() == tiled["grad"].to_numpy().tobytes()
    )


def test_terrain_gradient_interior_only(ray_session):
    imgs = make_oracle_images(np.arange(1, dtype=np.int64))
    df = terrain_gradient(_ds(imgs, 1), step=1).to_pandas()
    assert len(df) == 98 * 98
    assert df.r.min() == 1 and df.r.max() == 98
    assert df.c.min() == 1 and df.c.max() == 98


def test_horn_shape_validation():
    with pytest.raises(ValueError):
        horn_numerators(np.zeros((2, 5)))


def test_curvature_quadric_exact():
    # z = al*r^2 + be*c^2 + ga*r*c + 3r + 5c: second derivatives are
    # the quadric constants everywhere the window is interior
    import numpy as np

    from rasters_ray.stages.terrain import curvature_numerators

    r, c = np.indices((10, 10))
    for al in (-2, 0, 3):
        for be in (-1, 2):
            for ga in (-3, 0, 2):
                z = (al * r * r + be * c * c + ga * r * c
                     + 3 * r + 5 * c).astype(float)
                d2x, d2y, dxy, valid = curvature_numerators(z)
                assert valid.all()
                assert np.all(d2x == 2 * be)
                assert np.all(d2y == 2 * al)
                # dxy = -z(NW)+z(NE)+z(SW)-z(SE) = -4*gamma exactly
                assert np.all(dxy == -4 * ga)


def test_curvature_nan_masks_window():
    import numpy as np

    from rasters_ray.stages.terrain import curvature_numerators

    z = np.ones((6, 6))
    z[2, 2] = np.nan
    _, _, _, valid = curvature_numerators(z)
    assert not valid[1, 1] and not valid[2, 2]
    assert valid[3, 3]


def test_terrain_indices_ramp_exact():
    import numpy as np

    from rasters_ray.stages.terrain import terrain_indices

    r, c = np.indices((9, 9))
    for a in (-3, 0, 2, 5):
        for b in (-2, 1, 4):
            z = (a * r + b * c).astype(float)
            tpi, ts, tq, ro, valid = terrain_indices(z)
            assert valid.all()
            assert np.all(tpi == 0)
            assert np.all(ts == 2 * (abs(a) + abs(b) + abs(a + b) + abs(a - b)))
            assert np.all(tq == 6 * (a * a + b * b))
            ds = [a * dr + b * dc
                  for dr in (-1, 0, 1) for dc in (-1, 0, 1)
                  if (dr, dc) != (0, 0)]
            assert np.all(ro == max(max(ds), 0) - min(min(ds), 0))


def test_terrain_indices_bruteforce():
    import numpy as np

    from rasters_ray.stages.terrain import terrain_indices

    rng = np.random.default_rng(42)
    z = rng.integers(-50, 50, size=(12, 15)).astype(float)
    tpi, ts, tq, ro, valid = terrain_indices(z)
    assert valid.all()
    for i in range(1, 11):
        for j in range(1, 14):
            w = z[i - 1:i + 2, j - 1:j + 2]
            d = np.delete(w.ravel(), 4) - w[1, 1]
            assert tpi[i - 1, j - 1] == -int(d.sum())
            assert ts[i - 1, j - 1] == int(np.abs(d).sum())
            assert tq[i - 1, j - 1] == int((d * d).sum())
            assert ro[i - 1, j - 1] == int(w.max() - w.min())


def test_terrain_indices_nan_and_shape():
    import numpy as np

    from rasters_ray.stages.terrain import terrain_indices

    z = np.ones((6, 6))
    z[3, 3] = np.nan
    _, _, _, _, valid = terrain_indices(z)
    assert not valid[2, 2] and not valid[3, 3] and valid[0, 0]
    with pytest.raises(ValueError):
        terrain_indices(np.zeros((2, 4)))


def test_geomorphons_archetypes_and_bruteforce():
    import numpy as np

    from rasters_ray.stages.terrain import (
        GEOMORPHON_TABLE,
        _GEO_DIRS,
        geomorphons,
    )

    h = w = 9
    r = np.arange(h)[:, None]
    c = np.arange(w)[None, :]
    cone = 100 - 10 * np.maximum(abs(r - 4), abs(c - 4))
    gr, gc, npl, nmi, lf = geomorphons(cone, step=1)
    centre = np.flatnonzero((gr == 4) & (gc == 4))[0]
    assert (nmi[centre], npl[centre], lf[centre]) == (8, 0, 2)  # peak
    _, _, _, _, lf2 = geomorphons(200 - cone, step=1)
    assert lf2[centre] == 10  # pit
    _, _, _, _, lf3 = geomorphons(np.full((9, 9), 3), step=1)
    assert (lf3 == 1).all()  # flat
    # a long ridge line classifies as ridge on its crest
    ridge = 50 - 5 * abs(r - 4) + 0 * c
    _, _, _, _, lf4 = geomorphons(ridge, step=1)
    assert lf4.reshape(9, 9)[4, 4] == 3

    rng = np.random.default_rng(29)
    x = rng.integers(0, 60, (11, 10))
    gr, gc, npl, nmi, lf = geomorphons(x, step=1)
    for idx in range(0, len(gr), 7):
        r0, c0 = int(gr[idx]), int(gc[idx])
        np_ = nm_ = 0
        for dr, dc in _GEO_DIRS:
            vals = [
                (12 // k) * (int(x[r0 + dr * k, c0 + dc * k]) - int(x[r0, c0]))
                for k in (1, 2, 3, 4)
                if 0 <= r0 + dr * k < 11 and 0 <= c0 + dc * k < 10
            ]
            if not vals:
                continue
            a, b = max(vals), min(vals)
            if a > -b:
                np_ += 1
            elif -b > a:
                nm_ += 1
        assert (npl[idx], nmi[idx]) == (np_, nm_)
        assert lf[idx] == GEOMORPHON_TABLE[nm_][np_]


def test_geomorphons_errors():
    import numpy as np
    import pytest

    from rasters_ray.stages.terrain import geomorphons

    with pytest.raises(ValueError):
        geomorphons(np.zeros((4, 4), int), lookup=5)
    with pytest.raises(ValueError):
        geomorphons(np.array([[0.5, 1.0], [2.0, 3.0]]))


def test_aspect_class_compass_points():
    from rasters_ray.stages.terrain import aspect_class

    # descent (de, dn) = (-gx, +gy): craft numerators hitting each sector
    gx = np.array([0, 0, 0, -8, -5, -8, 0, 8, 5, 8])
    gy = np.array([0, 8, -8, 0, 12, 8, 0, -8, 12, 0])
    #      flat  N    S    E   NE? de=5,dn=12: 5<12*t? t≈.414*12=4.97 no→diag NE
    want = np.array([0, 1, 5, 3, 2, 2, 0, 6, 8, 7])
    got = aspect_class(gx, gy)
    assert got.tolist() == want.tolist()


def test_aspect_class_boundary_discipline():
    from rasters_ray.stages.terrain import ASPECT_TAN_22_5, aspect_class

    # ratio just under / just over tan(22.5): 2/5 = 0.4 < t -> N axis;
    # 5/12 ≈ 0.4167 > t -> NE diagonal
    assert aspect_class(np.array([-2]), np.array([5]))[0] == 1
    assert aspect_class(np.array([-5]), np.array([12]))[0] == 2
    # symmetry: mirroring both components flips to the opposite sector
    for gx, gy, cls in [(-3, 10, 1), (-10, 3, 3), (-9, 9, 2)]:
        opp = aspect_class(np.array([-gx]), np.array([-gy]))[0]
        base = aspect_class(np.array([gx]), np.array([gy]))[0]
        assert base == cls and opp == ((cls - 1 + 4) % 8) + 1
    assert 0.41 < ASPECT_TAN_22_5 < 0.415


def test_aspect_histogram_tiled_equals_whole(ray_session):
    from rasters_ray.stages.terrain import aspect_class, aspect_histogram_tiled

    ids = np.arange(4, dtype=np.int64)
    imgs = make_oracle_images(ids)
    got = (
        aspect_histogram_tiled(_ds(imgs, 2), tile=16)
        .to_pandas()
        .sort_values(["image_id", "aspect_class"])
        .reset_index(drop=True)
    )
    # whole-image recomputation
    rows = []
    for d in ids:
        px = codec.decode(
            imgs.column("bytes")[int(d)].as_py(), imgs.column("fmt")[int(d)].as_py()
        ).astype(np.float64)
        pad = np.full((px.shape[0] + 2, px.shape[1] + 2), np.nan)
        pad[1:-1, 1:-1] = px
        gx, gy, valid = horn_numerators(pad)
        cls = aspect_class(gx, gy)[valid]
        bc = np.bincount(cls, minlength=9)
        for k in np.flatnonzero(bc):
            rows.append((f"img{d:08d}", int(k), int(bc[k])))
    rows.sort()
    assert len(got) == len(rows)
    assert list(map(tuple, got.itertuples(index=False))) == rows
    # totals: every interior window classified
    assert got.groupby("image_id")["n_px"].sum().eq(98 * 98).all()
