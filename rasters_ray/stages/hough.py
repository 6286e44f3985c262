"""Digital Hough transform: line evidence over 4 quantized directions.

Line extraction from binary rasters (Duda & Hart 1972's rho/theta
voting, here in the exact DIGITAL form over the four lattice
directions, so every count is an integer and oracles replay it):

* direction 0 — horizontal lines, bin = row
* direction 1 — vertical lines, bin = col
* direction 2 — anti-diagonal (r + c constant), bin = r + c
* direction 3 — main diagonal (c - r constant), bin = c - r + (H - 1)

``hough_accumulate`` returns the four count vectors (one np.bincount
each — no Python over pixels); ``hough_peak`` the best (direction,
bin, count) with deterministic ties (smallest direction, then bin).
The reference has no feature-extraction surface; this pairs with
``stages/contour.py`` (iso-lines) and ``stages/match.py`` (NCC) as the
image-analysis layer.

Scale shape: per-image map_batches, no shuffle; accumulators are
O(H + W) integers, so a tiled variant is a per-tile partial bincount +
one tiny groupby sum (offsets make bins global) — exact by
construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rasters_ray import codec

__all__ = ["hough_accumulate", "hough_peak", "hough_stats"]


def hough_accumulate(mask: np.ndarray) -> list:
    """Count vectors for the 4 digital directions of a boolean mask."""
    m = np.asarray(mask, dtype=bool)
    if m.ndim != 2:
        raise ValueError("mask must be 2D")
    h, w = m.shape
    rr, cc = np.nonzero(m)
    return [
        np.bincount(rr, minlength=h),                      # horizontal
        np.bincount(cc, minlength=w),                      # vertical
        np.bincount(rr + cc, minlength=h + w - 1),         # anti-diag
        np.bincount(cc - rr + (h - 1), minlength=h + w - 1),  # main diag
    ]


def hough_peak(mask: np.ndarray):
    """Strongest digital line: ``(direction, bin, count)``; ties break
    to the smallest direction then the smallest bin."""
    acc = hough_accumulate(mask)
    best = (-1, -1, -1)
    for d, a in enumerate(acc):
        if a.size == 0:
            continue
        b = int(np.argmax(a))  # first maximum = smallest bin
        if int(a[b]) > best[2]:
            best = (d, b, int(a[b]))
    if best[2] <= 0:
        raise ValueError("empty mask: no line evidence")
    return best


def hough_stats(images_ds, threshold: float):
    """Per-image strongest-line summary over an image Dataset (rows
    carry ``image_id`` / ``bytes`` / ``fmt``): pixels above
    ``threshold`` vote; emits the peak direction/bin/count and the
    on-pixel count.  One map_batches, nothing shuffles."""

    def run(t: pa.Table) -> pa.Table:
        ids, pd_, pb, pc, non = [], [], [], [], []
        for i in range(t.num_rows):
            px = codec.decode(t.column("bytes")[i].as_py(),
                              t.column("fmt")[i].as_py())
            m = px > threshold
            d, b, c = hough_peak(m)
            ids.append(t.column("image_id")[i].as_py())
            pd_.append(d)
            pb.append(b)
            pc.append(c)
            non.append(int(m.sum()))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "peak_dir": pa.array(pd_, pa.int64()),
            "peak_bin": pa.array(pb, pa.int64()),
            "peak_count": pa.array(pc, pa.int64()),
            "n_on": pa.array(non, pa.int64()),
        })

    return images_ds.map_batches(run, batch_format="pyarrow")
