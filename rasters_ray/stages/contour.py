"""Iso-contour extraction (marching squares over pixel CENTERS — the
GDAL ``gdal_contour`` / matplotlib ``contour`` operation; the
reference reaches it through matplotlib/rasterio on the same
center-lattice convention).

Squares are 2x2 blocks of adjacent cell centers. Each corner
classifies as >= level; the 16-case table emits directed segments that
keep the HIGH side on the LEFT (GDAL's orientation convention), with
the saddle cases (5, 10) disambiguated by the square's center average.
Crossing positions interpolate linearly between the two center values,
so a shared edge yields the bit-identical point from both adjacent
squares — chains stitch by exact endpoint equality, no tolerance.

Crossing-square discovery is vectorized (one comparison per corner
array); only squares that actually cross walk Python-side
(perimeter-scale for smooth fields, not area-scale).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

from ..grids import GridSpec

# edges of a square (r, c)..(r+1, c+1) in center-lattice coords:
# 0 top (r, c)-(r, c+1), 1 right (r, c+1)-(r+1, c+1),
# 2 bottom (r+1, c)-(r+1, c+1), 3 left (r, c)-(r+1, c)
#
# case index bit k = corner k >= level, corners ordered
# 0 TL (r, c), 1 TR (r, c+1), 2 BR (r+1, c+1), 3 BL (r+1, c).
# Directed (edge_from, edge_to) pairs keep the >=level side on the left
# when walking from->to.
_CASES: Dict[int, List[Tuple[int, int]]] = {
    0: [], 15: [],
    1: [(3, 0)], 14: [(0, 3)],
    2: [(0, 1)], 13: [(1, 0)],
    4: [(1, 2)], 11: [(2, 1)],
    8: [(2, 3)], 7: [(3, 2)],
    3: [(3, 1)], 12: [(1, 3)],
    6: [(0, 2)], 9: [(2, 0)],
    # saddles resolved at runtime
    5: [], 10: [],
}


def _edge_point(edge: int, r: int, c: int, v: np.ndarray, level: float
                ) -> Tuple[float, float]:
    """Crossing point on a square edge in (row, col) center-lattice
    coordinates. Interpolates between the edge's two CENTER values —
    the same expression for both squares sharing the edge."""
    if edge == 0:
        v0, v1 = v[r, c], v[r, c + 1]
        t = (level - v0) / (v1 - v0)
        return float(r), c + float(t)
    if edge == 2:
        v0, v1 = v[r + 1, c], v[r + 1, c + 1]
        t = (level - v0) / (v1 - v0)
        return float(r + 1), c + float(t)
    if edge == 3:
        v0, v1 = v[r, c], v[r + 1, c]
        t = (level - v0) / (v1 - v0)
        return r + float(t), float(c)
    v0, v1 = v[r, c + 1], v[r + 1, c + 1]
    t = (level - v0) / (v1 - v0)
    return r + float(t), float(c + 1)


def contour_segments(v: np.ndarray, level: float
                     ) -> List[Tuple[Tuple[float, float], Tuple[float, float]]]:
    """All directed contour segments of one level, in center-lattice
    (row, col) coordinates."""
    ge = v >= level
    tl = ge[:-1, :-1]
    tr = ge[:-1, 1:]
    br = ge[1:, 1:]
    bl = ge[1:, :-1]
    case = (tl.astype(np.int8) + (tr.astype(np.int8) << 1)
            + (br.astype(np.int8) << 2) + (bl.astype(np.int8) << 3))
    hit = (case != 0) & (case != 15)
    # NaN corners poison the square (no contour through missing data)
    finite = np.isfinite(v)
    hit &= (finite[:-1, :-1] & finite[:-1, 1:]
            & finite[1:, 1:] & finite[1:, :-1])
    segs = []
    for r, c in zip(*np.nonzero(hit)):
        r = int(r)
        c = int(c)
        k = int(case[r, c])
        if k in (5, 10):
            center = (v[r, c] + v[r, c + 1] + v[r + 1, c]
                      + v[r + 1, c + 1]) / 4.0
            if k == 5:  # TL+BR high
                pairs = ([(3, 0), (1, 2)] if center >= level
                         else [(1, 0), (3, 2)])
            else:  # TR+BL high
                pairs = ([(0, 1), (2, 3)] if center >= level
                         else [(0, 3), (2, 1)])
        else:
            pairs = _CASES[k]
        for e_from, e_to in pairs:
            p = _edge_point(e_from, r, c, v, level)
            q = _edge_point(e_to, r, c, v, level)
            if p != q:
                segs.append((p, q))
    return segs


def stitch_segments(segs) -> List[np.ndarray]:
    """Directed segments -> polylines (open chains first from
    unmatched starts, then closed loops), matching endpoints exactly
    (shared-edge points are bit-identical by construction)."""
    nxt: Dict[Tuple[float, float], List[Tuple[float, float]]] = {}
    n_in: Dict[Tuple[float, float], int] = {}
    for p, q in segs:
        nxt.setdefault(p, []).append(q)
        n_in[q] = n_in.get(q, 0) + 1

    def walk(start):
        path = [start]
        cur = start
        while cur in nxt and nxt[cur]:
            cur = nxt[cur].pop(0)
            if not nxt[path[-1]]:
                del nxt[path[-1]]
            path.append(cur)
            if cur == start:
                break
        return np.array(path, dtype=np.float64)

    out: List[np.ndarray] = []
    for start in sorted(k for k in nxt if n_in.get(k, 0) < len(nxt[k])
                        or k not in n_in):
        while start in nxt and nxt[start]:
            out.append(walk(start))
    for start in sorted(nxt):  # remaining: closed loops
        while start in nxt and nxt[start]:
            out.append(walk(start))
    return out


def contour_lines(arr: np.ndarray, grid: GridSpec, levels) -> pa.Table:
    """Raster -> the engine's lines table: one feature per (level,
    polyline), coordinates in grid CRS (pixel-center affine). Level
    rides along as a float column."""
    from ..sources.vectors import RING_TYPE

    ids: List[str] = []
    lvl_col: List[float] = []
    cells: List[list] = []
    v = np.asarray(arr, dtype=np.float64)
    for level in np.atleast_1d(np.asarray(levels, dtype=np.float64)):
        paths = stitch_segments(contour_segments(v, float(level)))
        for i, p in enumerate(paths):
            x = grid.x_origin + (p[:, 1] + 0.5) * grid.cell_width
            y = grid.y_origin + (p[:, 0] + 0.5) * grid.cell_height
            ids.append(f"c{level:g}_{i}")
            lvl_col.append(float(level))
            cells.append([[{"x": float(px), "y": float(py)}
                           for px, py in zip(x, y)]])
    return pa.table({
        "line_id": pa.array(ids, pa.string()),
        "level": pa.array(lvl_col, pa.float64()),
        "paths": pa.array(cells, RING_TYPE),
        "crs": pa.array([grid.crs] * len(ids), pa.string()),
    })
