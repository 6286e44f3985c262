"""Template matching: normalized cross-correlation (NCC) peak search.

The reference has no image-matching surface (its raster ops are
per-pixel dunders, ``/root/reference/rasters/raster.py``); NCC
template matching is the classic registration/feature-location kernel
(Lewis 1995, "Fast Normalized Cross-Correlation" — the algorithm
behind OpenCV ``matchTemplate(TM_CCOEFF_NORMED)``), added
Ray-Data-first for tie-point extraction between image acquisitions.

Definition (valid-mode windows, w = the template-sized window at each
position, t = the template, n = t.size)::

    ncc = (sum(t*w) - sum(t)*sum(w)/n)
          / sqrt((sum(t^2) - sum(t)^2/n) * (sum(w^2) - sum(w)^2/n))

Zero-variance windows (or a zero-variance template) score 0 by
definition here — constant regions match nothing.

Scale shape: per-image map_batches, no shuffle; the template ships
once per task closure (bytes-sized).  The per-window sums are computed
with ``sliding_window_view`` + one einsum — vectorized, no Python per
pixel.  For templates much larger than ~64x64 the FFT cross-
correlation form of the same definition is the scale path (documented,
not needed at tile sizes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rasters_ray import codec

__all__ = ["match_template", "template_match", "estimate_shift",
           "coregister_pairs"]


def match_template(arr: np.ndarray, tmpl: np.ndarray) -> np.ndarray:
    """NCC score map over all valid template positions
    ((H-th+1, W-tw+1) float64).  Raises if the template exceeds the
    image."""
    a = np.asarray(arr, dtype=np.float64)
    t = np.asarray(tmpl, dtype=np.float64)
    th, tw = t.shape
    if th > a.shape[0] or tw > a.shape[1]:
        raise ValueError(
            f"template {t.shape} larger than image {a.shape}")
    n = float(th * tw)
    win = np.lib.stride_tricks.sliding_window_view(a, (th, tw))
    s1 = win.sum(axis=(2, 3))
    s2 = np.einsum("ijkl,ijkl->ij", win, win)
    cross = np.einsum("ijkl,kl->ij", win, t)
    tsum = t.sum()
    tvar = float((t * t).sum() - tsum * tsum / n)
    cov = cross - s1 * (tsum / n)
    wvar = s2 - s1 * s1 / n
    den2 = wvar * tvar
    ok = den2 > 0
    out = np.zeros_like(cov)
    out[ok] = cov[ok] / np.sqrt(den2[ok])
    return out


def peak_of(scores: np.ndarray):
    """(row, col, score) of the first maximum in row-major order —
    deterministic on ties."""
    i = int(np.argmax(scores))
    r, c = divmod(i, scores.shape[1])
    return r, c, float(scores[r, c])


def estimate_shift(ref: np.ndarray, moving: np.ndarray,
                   max_shift: int = 4):
    """Translation between two same-shape acquisitions of one scene
    (the NCC tie-point form of image co-registration): the center crop
    of ``moving`` (inset by ``max_shift`` on every side) is NCC-matched
    inside ``ref``; the peak offset minus the inset IS the shift
    ``(dr, dc)`` such that ``moving[r, c] == ref[r + dr, c + dc]``
    where both are defined.  Returns ``(dr, dc, score)``; shifts
    beyond ``max_shift`` alias to the best in-window peak (score < 1
    flags them)."""
    m = int(max_shift)
    if m < 1 or moving.shape[0] <= 2 * m or moving.shape[1] <= 2 * m:
        raise ValueError("max_shift must be >= 1 and < half the image")
    tmpl = np.asarray(moving, dtype=np.float64)[m:-m, m:-m]
    r, c, s = peak_of(match_template(ref, tmpl))
    return r - m, c - m, s


def coregister_pairs(pairs_ds, max_shift: int = 4):
    """Shift estimation over a Dataset of image PAIRS (rows carry
    ``pair_id`` / ``bytes_ref`` / ``bytes_mov`` / ``fmt``): emits the
    recovered (dr, dc) and the 1/8-quantized peak score.  One
    map_batches, nothing shuffles."""

    def run(tb: pa.Table) -> pa.Table:
        ids, drs, dcs, s8s = [], [], [], []
        for i in range(tb.num_rows):
            fmt = tb.column("fmt")[i].as_py()
            ref = codec.decode(tb.column("bytes_ref")[i].as_py(), fmt)
            mov = codec.decode(tb.column("bytes_mov")[i].as_py(), fmt)
            dr, dc, s = estimate_shift(ref, mov, max_shift=max_shift)
            ids.append(tb.column("pair_id")[i].as_py())
            drs.append(dr)
            dcs.append(dc)
            s8s.append(int(np.rint(s * 8.0)))
        return pa.table({
            "pair_id": pa.array(ids, pa.string()),
            "dr": pa.array(drs, pa.int64()),
            "dc": pa.array(dcs, pa.int64()),
            "score_8": pa.array(s8s, pa.int64()),
        })

    return pairs_ds.map_batches(run, batch_format="pyarrow")


def template_match(images_ds, tmpl: np.ndarray):
    """Per-image NCC peak over an image Dataset (rows carry
    ``image_id`` / ``bytes`` / ``fmt``): emits the peak position, its
    score in 1/8 units (floor(score*8+0.5) — exact-match windows pin
    8) and the count of valid positions.  One map_batches, nothing
    shuffles."""
    t = np.asarray(tmpl, dtype=np.float64)

    def run(tb: pa.Table) -> pa.Table:
        ids, prs, pcs, s8s, npos = [], [], [], [], []
        for i in range(tb.num_rows):
            px = codec.decode(tb.column("bytes")[i].as_py(),
                              tb.column("fmt")[i].as_py())
            scores = match_template(px, t)
            r, c, s = peak_of(scores)
            ids.append(tb.column("image_id")[i].as_py())
            prs.append(r)
            pcs.append(c)
            s8s.append(int(np.rint(s * 8.0)))
            npos.append(scores.size)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "peak_r": pa.array(prs, pa.int64()),
            "peak_c": pa.array(pcs, pa.int64()),
            "score_8": pa.array(s8s, pa.int64()),
            "n_pos": pa.array(npos, pa.int64()),
        })

    return images_ds.map_batches(run, batch_format="pyarrow")
