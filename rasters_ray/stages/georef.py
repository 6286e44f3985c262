"""Ground-control-point georeferencing: least-squares affine fit.

The reference georeferences rasters only through an axis-aligned grid
(``rasters/raster_grid.py:39-41`` rejects rotation); real ingest
pipelines must first RECOVER that georeference from tie points — the
``gdal_translate -gcp`` / ``GDALGCPsToGeoTransform`` operation: fit the
6-parameter affine ``X = a*x + b*y + c, Y = d*x + e*y + f`` to matched
(pixel, map) pairs by least squares.  Pairs typically come from
:func:`rasters_ray.stages.match.estimate_shift` peaks against a
reference scene.

Math: the two rows decouple — each is an independent ordinary least
squares on the design matrix ``[x  y  1]``, solved here through
``np.linalg.lstsq`` (SVD; rank-deficient = collinear GCPs raises).
With >= 3 non-collinear exact pairs the recovery is exact to fp
roundoff; with redundant noisy pairs it is the BLUE estimate and the
RMS residual reports the fit quality.

Scale shape: ``fit_affine_per_scene`` is ONE ``groupby("scene_id")``
shuffle followed by a per-group solve on a handful of rows — tie-point
tables are tiny (dozens of points per scene) next to the imagery, so
the all-to-all moves kilobytes per scene no matter how large the
archive.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["estimate_affine", "fit_affine_per_scene"]


def estimate_affine(src: np.ndarray, dst: np.ndarray):
    """Least-squares affine from ``src`` (n, 2) pixel points to ``dst``
    (n, 2) map points.  Returns ``((a, b, c, d, e, f), rms)`` with
    ``X = a*x + b*y + c`` and ``Y = d*x + e*y + f``."""
    s = np.asarray(src, dtype=np.float64)
    d = np.asarray(dst, dtype=np.float64)
    if s.ndim != 2 or s.shape[1] != 2 or s.shape != d.shape:
        raise ValueError("src and dst must both be (n, 2) point arrays")
    if s.shape[0] < 3:
        raise ValueError("affine fit needs >= 3 tie points")
    design = np.column_stack([s, np.ones(len(s))])
    if np.linalg.matrix_rank(design) < 3:
        raise ValueError("tie points are collinear; affine is underdetermined")
    coef, *_ = np.linalg.lstsq(design, d, rcond=None)  # (3, 2)
    resid = design @ coef - d
    rms = float(np.sqrt(np.mean(np.sum(resid * resid, axis=1))))
    a, b, c = coef[:, 0]
    dd, e, f = coef[:, 1]
    return (float(a), float(b), float(c),
            float(dd), float(e), float(f)), rms


def fit_affine_per_scene(ties_ds):
    """Per-scene affine fit over a tie-point Dataset (rows carry
    ``scene_id`` / ``px`` / ``py`` / ``mx`` / ``my``): one
    ``groupby("scene_id").map_groups`` solve emitting the six
    parameters, the RMS residual and the point count."""

    def fit(g: pd.DataFrame) -> pd.DataFrame:
        params, rms = estimate_affine(
            g[["px", "py"]].to_numpy(), g[["mx", "my"]].to_numpy())
        return pd.DataFrame({
            "scene_id": [g["scene_id"].iloc[0]],
            "a": [params[0]], "b": [params[1]], "c": [params[2]],
            "d": [params[3]], "e": [params[4]], "f": [params[5]],
            "rms": [rms],
            "n_points": [len(g)],
        })

    return ties_ds.groupby("scene_id").map_groups(fit, batch_format="pandas")
