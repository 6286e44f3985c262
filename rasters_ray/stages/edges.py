"""Canny edge detection in exact integer arithmetic.

Canny 1986, reformulated so every decision is an integer comparison
that a SQL oracle can replay bit-for-bit:

* gradients: the integer 3x3 Sobel (shared with the Harris detector);
* magnitude: squared (gx^2 + gy^2) — no sqrt anywhere;
* direction: four bins by the rational boundary ``1000*|minor| <=
  414*|major|`` (414/1000 ~ tan 22.5 deg; both engines apply the SAME
  rational rule, so the approximation is parity-exact);
* non-maximum suppression: strictly greater than the forward neighbor
  and >= the backward neighbor along the gradient direction — the
  asymmetric tie-break keeps exactly ONE side of a perfectly
  symmetric (tied) edge pair instead of suppressing both;
* double threshold on the squared magnitude, hysteresis keeps weak
  pixels 8-connected to a strong pixel through the survivor set.

Per-image map over the image Dataset (the harris_images shape); the
hysteresis flood runs in-core per image as iterated mask dilation (the
tiled halo/border-resolve pattern of flow_tiled is the scale path for
single rasters larger than a worker).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rasters_ray import codec

from .features import _sobel

__all__ = ["canny_edges", "canny_images"]


def _direction_bins(gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
    """0: horizontal gradient (compare E/W), 1: 45 deg (SE/NW),
    2: vertical (N/S), 3: 135 deg (SW/NE)."""
    ax, ay = np.abs(gx), np.abs(gy)
    b = np.full(gx.shape, 3, dtype=np.int64)
    b[gx * gy > 0] = 1
    b[1000 * ax <= 414 * ay] = 2
    b[1000 * ay <= 414 * ax] = 0
    return b


_BIN_OFFS = {0: (0, 1), 1: (1, 1), 2: (1, 0), 3: (1, -1)}


def canny_edges(arr: np.ndarray, tl2: int, th2: int):
    """Canny on one raster -> (r, c, mag2, strong) int64 arrays of the
    surviving edge pixels (coordinates in full-image space)."""
    z = np.rint(np.asarray(arr)).astype(np.int64)
    gx, gy = _sobel(z)  # interior (h-2, w-2), offset +1
    m2 = gx * gx + gy * gy
    bins = _direction_bins(gx, gy)
    h, w = m2.shape
    # NMS: > forward neighbor, >= backward neighbor (tie-break keeps
    # one side of a symmetric edge pair)
    # out-of-interior neighbors count as -1 (cannot suppress)
    pad = np.full((h + 2, w + 2), -1, dtype=np.int64)
    pad[1:-1, 1:-1] = m2
    keep = np.zeros((h, w), dtype=bool)
    for b, (dr, dc) in _BIN_OFFS.items():
        sel = bins == b
        n1 = pad[1 + dr: 1 + dr + h, 1 + dc: 1 + dc + w]
        n2 = pad[1 - dr: 1 - dr + h, 1 - dc: 1 - dc + w]
        keep |= sel & (m2 > n1) & (m2 >= n2)
    weak = keep & (m2 >= tl2)
    strong = keep & (m2 >= th2)
    # hysteresis: flood strong through the weak survivor set (8-conn)
    reach = strong.copy()
    while True:
        grown = reach.copy()
        grown[1:, :] |= reach[:-1, :]
        grown[:-1, :] |= reach[1:, :]
        grown[:, 1:] |= reach[:, :-1]
        grown[:, :-1] |= reach[:, 1:]
        grown[1:, 1:] |= reach[:-1, :-1]
        grown[1:, :-1] |= reach[:-1, 1:]
        grown[:-1, 1:] |= reach[1:, :-1]
        grown[:-1, :-1] |= reach[1:, 1:]
        grown &= weak
        grown |= reach
        if (grown == reach).all():
            break
        reach = grown
    rr, cc = np.nonzero(reach)
    return (rr + 1, cc + 1, m2[rr, cc],
            strong[rr, cc].astype(np.int64))


def canny_images(images_ds, tl2: int, th2: int, transform=None):
    """Canny edge pixels per image -> Dataset[(image_id, r, c, mag2,
    strong)].  Per-image map, nothing shuffles."""

    def run(t: pa.Table) -> pa.Table:
        out = {k: [] for k in ("image_id", "r", "c", "mag2", "strong")}
        for i in range(t.num_rows):
            px = codec.decode(t.column("bytes")[i].as_py(),
                              t.column("fmt")[i].as_py())
            px = np.rint(px).astype(np.int64)
            if transform is not None:
                px = transform(px)
            r, c, m2, s = canny_edges(px, tl2, th2)
            out["image_id"].extend(
                [t.column("image_id")[i].as_py()] * len(r))
            out["r"].extend(r.tolist())
            out["c"].extend(c.tolist())
            out["mag2"].extend(m2.tolist())
            out["strong"].extend(s.tolist())
        return pa.table(
            {k: pa.array(v, pa.string() if k == "image_id" else pa.int64())
             for k, v in out.items()})

    return images_ds.map_batches(run, batch_format="pyarrow")
