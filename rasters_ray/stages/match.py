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
           "coregister_pairs", "block_flow", "block_flow_images"]


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


def block_flow(before: np.ndarray, after: np.ndarray,
               block: int = 12, radius: int = 2):
    """Integer SAD block-matching motion field (the classic MPEG/
    particle-image-velocimetry motion estimator; no equivalent in the
    reference, whose ops are per-pixel dunders).

    The image interior is tiled into ``block``-sized blocks starting at
    offset ``radius``; for every displacement (dy, dx) in
    [-radius, radius]^2 the block's sum of absolute differences against
    the displaced ``after`` window is an exact int64; the winner is the
    smallest SAD with ties resolved to the lexicographically smallest
    (dy, dx) — bit-portable to a SQL ``ORDER BY sad, dy, dx`` replay.

    Returns (bi, bj, dy, dx, sad) int64 arrays over the block grid.
    """
    b = np.asarray(before, np.int64)
    a = np.asarray(after, np.int64)
    if b.shape != a.shape or b.ndim != 2:
        raise ValueError("block_flow takes two equal-shape 2D arrays")
    h, w = b.shape
    nbi = (h - 2 * radius) // block
    nbj = (w - 2 * radius) // block
    if nbi < 1 or nbj < 1:
        raise ValueError(
            f"image {h}x{w} too small for block={block} radius={radius}")
    r0 = radius
    sub = b[r0 : r0 + nbi * block, r0 : r0 + nbj * block]
    cands = [(dy, dx)
             for dy in range(-radius, radius + 1)
             for dx in range(-radius, radius + 1)]
    sads = np.empty((len(cands), nbi, nbj), np.int64)
    for k, (dy, dx) in enumerate(cands):
        sh = a[r0 + dy : r0 + dy + nbi * block,
               r0 + dx : r0 + dx + nbj * block]
        sads[k] = (np.abs(sub - sh)
                   .reshape(nbi, block, nbj, block).sum(axis=(1, 3)))
    # argmin keeps the FIRST minimum; cands is generated in sorted
    # (dy, dx) order, so ties land on the lexicographic minimum
    kbest = sads.argmin(axis=0)
    bi, bj = np.meshgrid(np.arange(nbi), np.arange(nbj), indexing="ij")
    cand_arr = np.asarray(cands, np.int64)
    dy = cand_arr[kbest.ravel(), 0]
    dx = cand_arr[kbest.ravel(), 1]
    sad = sads.reshape(len(cands), -1)[kbest.ravel(),
                                       np.arange(kbest.size)]
    return (bi.ravel().astype(np.int64), bj.ravel().astype(np.int64),
            dy, dx, sad)


def block_flow_images(images_ds, after_fn, block: int = 12,
                      radius: int = 2):
    """Distributed motion field: Dataset[(image_id, bi, bj, dy, dx,
    sad)].  ``after_fn(image_id, arr) -> np.ndarray`` loads/derives the
    second acquisition.  One map_batches, nothing shuffles; at scale
    the two-acquisition variant co-partitions the pair on tile key
    exactly like coregister_pairs."""

    def run(t: pa.Table) -> pa.Table:
        ids, bis, bjs, dys, dxs, sads = [], [], [], [], [], []
        for i in range(t.num_rows):
            iid = t.column("image_id")[i].as_py()
            px = np.rint(codec.decode(t.column("bytes")[i].as_py(),
                                      t.column("fmt")[i].as_py())
                         ).astype(np.int64)
            bi, bj, dy, dx, sad = block_flow(
                px, np.asarray(after_fn(iid, px), np.int64),
                block=block, radius=radius)
            n = bi.size
            ids.extend([iid] * n)
            bis.append(bi)
            bjs.append(bj)
            dys.append(dy)
            dxs.append(dx)
            sads.append(sad)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "bi": pa.array(np.concatenate(bis) if bis else [], pa.int64()),
            "bj": pa.array(np.concatenate(bjs) if bjs else [], pa.int64()),
            "dy": pa.array(np.concatenate(dys) if dys else [], pa.int64()),
            "dx": pa.array(np.concatenate(dxs) if dxs else [], pa.int64()),
            "sad": pa.array(np.concatenate(sads) if sads else [],
                            pa.int64()),
        })

    return images_ds.map_batches(run, batch_format="pyarrow")
