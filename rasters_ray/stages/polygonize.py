"""Raster -> vector polygonization: trace each labeled region's cell-
edge boundary into closed rings (GDAL ``gdal_polygonize`` semantics —
the inverse of stages/pip.py::rasterize_mask; the reference reaches it
through rasterio.features.shapes on the same GDAL core).

Algorithm: for one label's mask, every cell contributes its exposed
sides as DIRECTED corner-lattice edges (clockwise around the cell), so
the region's boundary is the set of uncancelled edges; loops are
stitched by following successor edges, with the pinch-point rule (two
outgoing edges at a checkerboard corner -> take the right turn) that
splits self-touching boundaries into simple loops. Outer boundaries
and holes emerge as separate loops, which is exactly the engine's
even-odd ring representation (stages/geomvec.py classifies them
geometrically) — no orientation bookkeeping needed.

Edge extraction is vectorized (four array comparisons); only the loop
stitching walks Python-side, over boundary edges (perimeter-sized, not
area-sized).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

from ..grids import GridSpec

# directions: 0 right (+col), 1 down (+row), 2 left, 3 up
_STEP = {0: (0, 1), 1: (1, 0), 2: (0, -1), 3: (-1, 0)}


def _boundary_edges(mask: np.ndarray) -> Dict[Tuple[int, int], List[Tuple[int, int, int]]]:
    """Directed boundary edges of the mask on the corner lattice:
    start corner -> list of (end_i, end_j, direction). Per-cell CW
    emission means internal edges never appear (each side is exposed
    for at most one of the two adjacent cells)."""
    up = np.zeros_like(mask)
    up[1:] = mask[:-1]
    down = np.zeros_like(mask)
    down[:-1] = mask[1:]
    left = np.zeros_like(mask)
    left[:, 1:] = mask[:, :-1]
    right = np.zeros_like(mask)
    right[:, :-1] = mask[:, 1:]

    out: Dict[Tuple[int, int], List[Tuple[int, int, int]]] = {}

    def add(rr, cc, d):
        for r, c in zip(rr.tolist(), cc.tolist()):
            if d == 0:  # top side, left->right: (r, c) -> (r, c+1)
                s, e = (r, c), (r, c + 1, 0)
            elif d == 1:  # right side, top->bottom: (r, c+1) -> (r+1, c+1)
                s, e = (r, c + 1), (r + 1, c + 1, 1)
            elif d == 2:  # bottom side, right->left: (r+1, c+1) -> (r+1, c)
                s, e = (r + 1, c + 1), (r + 1, c, 2)
            else:  # left side, bottom->top: (r+1, c) -> (r, c)
                s, e = (r + 1, c), (r, c, 3)
            out.setdefault(s, []).append(e)

    rr, cc = np.nonzero(mask & ~up)
    add(rr, cc, 0)
    rr, cc = np.nonzero(mask & ~right)
    add(rr, cc, 1)
    rr, cc = np.nonzero(mask & ~down)
    add(rr, cc, 2)
    rr, cc = np.nonzero(mask & ~left)
    add(rr, cc, 3)
    return out


def trace_rings(mask: np.ndarray) -> List[np.ndarray]:
    """Mask -> closed corner-lattice rings (each (k+1, 2) of (row,
    col) corner indices, collinear runs collapsed)."""
    edges = _boundary_edges(mask)
    rings: List[np.ndarray] = []
    while edges:
        start = min(edges)  # deterministic loop order
        cands = edges[start]
        ei, ej, d = cands.pop(0)
        if not cands:
            del edges[start]
        ring = [start]
        cur = (ei, ej)
        cur_d = d
        while cur != start:
            ring.append(cur)
            nxt = edges[cur]
            if len(nxt) == 1:
                ei, ej, d = nxt.pop(0)
                del edges[cur]
            else:
                # pinch point: prefer the RIGHT turn relative to the
                # incoming direction (splits the figure-eight into two
                # simple loops). CW emission makes right = (d + 1) % 4.
                want = (cur_d + 1) % 4
                pick = next((k for k, e in enumerate(nxt) if e[2] == want), 0)
                ei, ej, d = nxt.pop(pick)
            cur = (ei, ej)
            cur_d = d
        # collapse collinear runs: keep corners where direction changes
        pts = np.array(ring + [start], dtype=np.int64)
        dirs = np.diff(pts, axis=0)
        keep = np.ones(len(pts), dtype=bool)
        keep[1:-1] = np.any(dirs[1:] != dirs[:-1], axis=1)
        rings.append(pts[keep])
    return rings


def polygonize(arr: np.ndarray, grid: GridSpec, background=0) -> pa.Table:
    """Labeled 2-D array -> the engine's polygons table: one feature
    per distinct non-background value, rings in grid CRS coordinates
    (corner lattice: x = x_origin + j*cell_width, y = y_origin +
    i*cell_height — exact when the grid is dyadic). NaN cells count as
    background for float inputs."""
    from ..sources.vectors import RING_TYPE

    vals: List = []
    cells: List[list] = []
    finite = (np.isfinite(arr) if np.issubdtype(arr.dtype, np.floating)
              else np.ones(arr.shape, dtype=bool))
    labels = np.unique(arr[finite])
    for v in labels:
        if background is not None and v == background:
            continue
        mask = finite & (arr == v)
        rings = trace_rings(mask)
        parts = []
        for r in rings:
            x = grid.x_origin + r[:, 1].astype(np.float64) * grid.cell_width
            y = grid.y_origin + r[:, 0].astype(np.float64) * grid.cell_height
            parts.append([{"x": float(px), "y": float(py)}
                          for px, py in zip(x, y)])
        vals.append(v)
        cells.append(parts)
    return pa.table({
        "poly_id": pa.array([f"lbl{v}" for v in vals], pa.string()),
        "label": pa.array([int(v) if float(v).is_integer() else float(v)
                           for v in vals]),
        "rings": pa.array(cells, RING_TYPE),
        "crs": pa.array([grid.crs] * len(vals), pa.string()),
    })
