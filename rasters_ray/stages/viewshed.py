"""Viewshed: line-of-sight visibility over a DEM from one observer.

The reference has no visibility operator (its raster surface is
per-pixel dunders, ``/root/reference/rasters/raster.py``); viewshed is
the classic terrain-analysis raster op (GDAL ``gdal_viewshed``, GRASS
``r.viewshed``, ArcGIS Visibility — Wang, Robinson & White 2000 for the
reference-plane family; the exact per-ray form implemented here is the
"R3" algorithm of Franklin & Ray 1994).  Added Ray-Data-first as a
per-image map_batches kernel.

Semantics (fixed so oracles are reproducible bit-for-bit):

* The sight line from the observer cell center to each target cell
  center is sampled at the CHEBYSHEV-integer parameters
  ``t = 1 .. d-1`` where ``d = max(|dr|, |dc|)`` — i.e. once per step
  of the dominant axis, the classic R3 discretization.  At each sample
  the DEM is BILINEARLY interpolated (the cross-axis coordinate is
  fractional; the dominant-axis coordinate is integral).
* The observer sits ``height`` above its cell: ``z_obs = dem[obs] +
  height``.
* A target is BLOCKED iff some sample's elevation angle strictly
  exceeds the target's: ``(z_s - z_obs) * d > (z_t - z_obs) * t``
  (cross-multiplied — no division, so integer DEMs compare exactly;
  grazing rays with EQUAL angles leave the target visible).
* The observer cell and its 8 neighbors (``d <= 1``: no intermediate
  samples) are always visible.

Scale shape: per-image map_batches, no shuffle.  The kernel itself is
a vectorized sweep over the sample parameter ``t`` — each round gathers
one bilinear sample for EVERY not-yet-resolved cell at once (O(n) numpy
work per round, ``max(H, W)`` rounds), never a per-cell Python loop.
Viewshed is global per observer, so the distributed contract is
one-DEM-per-worker (tile DEMs to worker-sized arrays upstream with
``stages/tiling``); a tiled multi-observer form would ship ray segments
between tiles — the documented out-of-scope extension.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rasters_ray import codec

__all__ = ["viewshed", "viewshed_stats", "cast_shadows", "sun_hours"]


def viewshed(dem: np.ndarray, observer, height: float = 0.0) -> np.ndarray:
    """Boolean visibility raster from ``observer = (row, col)`` at
    ``height`` above the surface.  See the module docstring for the
    exact R3 sampling/blocking rule."""
    z = np.asarray(dem, dtype=np.float64)
    if not np.all(np.isfinite(z)):
        raise ValueError("viewshed requires a finite DEM (fill NaNs first)")
    h, w = z.shape
    orow, ocol = int(observer[0]), int(observer[1])
    if not (0 <= orow < h and 0 <= ocol < w):
        raise ValueError(f"observer {observer!r} outside the {h}x{w} DEM")
    z_obs = z[orow, ocol] + float(height)

    rr, cc = np.indices((h, w))
    drow = rr - orow
    dcol = cc - ocol
    d = np.maximum(np.abs(drow), np.abs(dcol)).astype(np.int64)
    # target angle numerator; blocked(t) compares z-sample * d vs this * t
    tgt = (z - z_obs) * 1.0
    vis = np.ones((h, w), dtype=bool)

    dmax = int(d.max())
    for t in range(1, dmax):
        # cells that still have a sample at parameter t AND are not
        # already blocked (blocked is final — skip their gathers)
        m = (d > t) & vis
        if not m.any():
            break
        frac = t / d[m].astype(np.float64)
        sr = orow + drow[m] * frac
        sc = ocol + dcol[m] * frac
        r0 = np.floor(sr).astype(np.int64)
        c0 = np.floor(sc).astype(np.int64)
        r1 = np.minimum(r0 + 1, h - 1)
        c1 = np.minimum(c0 + 1, w - 1)
        fr = sr - r0
        fc = sc - c0
        zs = (z[r0, c0] * (1 - fr) * (1 - fc) + z[r1, c0] * fr * (1 - fc)
              + z[r0, c1] * (1 - fr) * fc + z[r1, c1] * fr * fc)
        blocked = (zs - z_obs) * d[m] > tgt[m] * t
        mv = vis[m]
        mv[blocked] = False
        vis[m] = mv
    return vis


def viewshed_stats(images_ds, observer, height: float = 0.0):
    """Per-image visibility summary over an image Dataset (rows carry
    ``image_id`` / ``bytes`` / ``fmt``): visible-cell count and the
    farthest visible Chebyshev radius from ``observer``.  One
    map_batches, nothing shuffles."""

    def run(t: pa.Table) -> pa.Table:
        ids, nv, far = [], [], []
        for i in range(t.num_rows):
            px = codec.decode(t.column("bytes")[i].as_py(),
                              t.column("fmt")[i].as_py())
            v = viewshed(px, observer, height=height)
            rr, cc = np.indices(v.shape)
            cheb = np.maximum(np.abs(rr - observer[0]),
                              np.abs(cc - observer[1]))
            ids.append(t.column("image_id")[i].as_py())
            nv.append(int(v.sum()))
            far.append(int(cheb[v].max()))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "n_visible": pa.array(nv, pa.int64()),
            "max_radius": pa.array(far, pa.int64()),
        })

    return images_ds.map_batches(run, batch_format="pyarrow")


def cast_shadows(dem: np.ndarray, p: int, q: int) -> np.ndarray:
    """Cast-shadow mask for sun rays travelling +columns (west sun) at
    elevation ``atan(p / q)`` in cell units (GRASS ``r.sun`` shadow
    core / the gdaldem hillshade "combined-with-shadows" step).

    Cell (r, c) is shadowed iff some cell c' < c on its row blocks the
    ray: ``z[r, c'] - z[r, c] > (p/q) * (c - c')``.  Cross-multiplying
    by ``q > 0`` makes the test the pure-integer running maximum of
    ``m = q*z + p*c`` strictly before c: shadowed iff
    ``max_{c'<c} m[r, c'] > m[r, c]`` — exact for integral pixels and
    bit-stable in SQL as a window MAX.  Column 0 is never shadowed.

    At scale rows are independent (one task per row band) and the
    running max is a prefix scan: tiles pass one number per row to
    their east neighbor — O(rows) exchange payload."""
    if q <= 0 or p < 0:
        raise ValueError("sun slope needs p >= 0, q > 0")
    z = np.asarray(dem)
    if z.ndim != 2:
        raise ValueError("cast_shadows expects a 2D DEM")
    if not np.isfinite(z).all():
        raise ValueError("cast_shadows expects a finite DEM")
    m = q * z.astype(np.int64) + p * np.arange(z.shape[1], dtype=np.int64)
    run = np.maximum.accumulate(m, axis=1)
    out = np.zeros(z.shape, dtype=bool)
    out[:, 1:] = run[:, :-1] > m[:, 1:]
    return out


def sun_hours(dem: np.ndarray, p: int, q: int) -> np.ndarray:
    """Lit-direction counts for four sun azimuths at one elevation
    ``atan(p / q)`` — the integer core of an r.sun daily insolation
    pass: rays travelling +c (morning), -c (evening), +r and -r.  The
    three non-native azimuths reuse :func:`cast_shadows` on the
    flipped / transposed DEM (pure index permutations, still
    integer-exact).  Returns int64 counts in [0, 4]; 4 = never
    shadowed at this elevation."""
    z = np.asarray(dem)
    shadows = [
        cast_shadows(z, p, q),
        cast_shadows(z[:, ::-1], p, q)[:, ::-1],
        cast_shadows(z.T, p, q).T,
        cast_shadows(z.T[:, ::-1], p, q)[:, ::-1].T,
    ]
    return np.int64(4) - sum(s.astype(np.int64) for s in shadows)
