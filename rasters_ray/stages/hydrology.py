"""Hydrology kernels: D8 flow direction, flow accumulation, and
chamfer cost-distance.

The reference has no hydrology surface (its raster math is per-pixel
dunders, ``/root/reference/rasters/raster.py``); these are the classic
DEM drainage operators (O'Callaghan & Mark 1984 D8; Jenson & Domingue
1988 flow accumulation — the kernels behind ``gdaldem``/ArcGIS Flow
Direction/Accumulation) plus the Borgefors (1986) chamfer-2-3
cost-distance (GRASS ``r.cost`` on an integer metric).  Added
Ray-Data-first as per-image map_batches kernels.

Conventions (all chosen so oracles are INTEGER-exact):

* ``flow_direction`` emits ESRI D8 codes — E=1, SE=2, S=4, SW=8, W=16,
  NW=32, N=64, NE=128 — toward the steepest DESCENT rate
  (drop / distance, diagonal distance sqrt(2)).  Ties break to the
  FIRST maximum in code order (E, SE, S, SW, W, NW, N, NE).  Cells
  with no strictly-lower neighbor (pits, flats, the global minimum)
  and NaN cells emit 0.
* ``flow_accumulation`` counts the UPSTREAM cells draining through
  each cell (ESRI convention: the cell itself is excluded), by Kahn
  topological rounds over the one-downstream forest — each round is
  one vectorized ``np.add.at`` scatter, no per-cell Python in the
  steady state.
* ``cost_distance`` uses the chamfer 2-3 integer metric: stepping
  between cells a,b costs ``2*(cost[a]+cost[b])`` straight and
  ``3*(cost[a]+cost[b])`` diagonally (3/2 is the classic integer
  approximation of sqrt(2)); solved by vectorized Bellman relaxation
  (8 shifted min-reduces per round) — exact, order-independent.

Scale shape: per-image map_batches, no shuffle.  Flow ACCUMULATION is
global per drainage basin, so the distributed contract is
one-DEM-per-worker (the tiled form needs an iterative boundary-flow
exchange between rounds — the documented out-of-scope extension; tile
DEMs to worker-sized arrays upstream with ``stages/tiling``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rasters_ray import codec

__all__ = [
    "flow_direction",
    "flow_accumulation",
    "cost_distance",
    "watershed",
    "least_cost_path",
    "flow_stats",
    "basin_stats",
]

# neighbor table in ESRI code order: (code, dr, dc, diagonal?)
_D8 = [
    (1, 0, 1, False),    # E
    (2, 1, 1, True),     # SE
    (4, 1, 0, False),    # S
    (8, 1, -1, True),    # SW
    (16, 0, -1, False),  # W
    (32, -1, -1, True),  # NW
    (64, -1, 0, False),  # N
    (128, -1, 1, True),  # NE
]
_INV_SQRT2 = 1.0 / np.sqrt(2.0)


def _shift(a: np.ndarray, dr: int, dc: int, fill) -> np.ndarray:
    """Neighbor view: out[r, c] = a[r+dr, c+dc], `fill` past the edge."""
    out = np.full_like(a, fill)
    h, w = a.shape
    rs, re = max(dr, 0), min(h + dr, h)
    cs, ce = max(dc, 0), min(w + dc, w)
    out[rs - dr : re - dr, cs - dc : ce - dc] = a[rs:re, cs:ce]
    return out


def flow_direction(arr: np.ndarray) -> np.ndarray:
    """ESRI D8 steepest-descent codes for a 2D DEM (uint8; 0 = pit/
    flat/NaN).  Drop rates compare as float64 ``(z - z_nbr) * w`` with
    w = 1 or the correctly-rounded 1/sqrt(2) — a fixed op order any
    re-implementation reproduces bit-for-bit."""
    z = np.asarray(arr, dtype=np.float64)
    best_rate = np.zeros_like(z)
    best_code = np.zeros(z.shape, dtype=np.uint8)
    valid = np.isfinite(z)
    for code, dr, dc, diag in _D8:
        nz = _shift(z, dr, dc, np.nan)
        drop = (z - nz) * (_INV_SQRT2 if diag else 1.0)
        ok = valid & np.isfinite(nz) & (drop > best_rate)
        best_rate[ok] = drop[ok]
        best_code[ok] = code
    return best_code


def flow_accumulation(fdir: np.ndarray) -> np.ndarray:
    """Upstream-cell counts (int64) for a D8 code array.  Kahn rounds
    over the one-downstream forest: cells whose remaining in-degree is
    zero push ``acc + 1`` downstream in one ``np.add.at`` scatter per
    round (rounds = longest drainage path)."""
    fd = np.asarray(fdir)
    h, w = fd.shape
    n = h * w
    down = np.full(n, -1, dtype=np.int64)
    flat = fd.ravel()
    rr, cc = np.divmod(np.arange(n, dtype=np.int64), w)
    for code, dr, dc, _ in _D8:
        m = flat == code
        tr, tc = rr[m] + dr, cc[m] + dc
        inside = (tr >= 0) & (tr < h) & (tc >= 0) & (tc < w)
        idx = np.flatnonzero(m)[inside]
        down[idx] = (rr[idx] + dr) * w + (cc[idx] + dc)
    indeg = np.zeros(n, dtype=np.int64)
    np.add.at(indeg, down[down >= 0], 1)
    acc = np.zeros(n, dtype=np.int64)
    frontier = np.flatnonzero(indeg == 0)
    while frontier.size:
        d = down[frontier]
        live = d >= 0
        src, dst = frontier[live], d[live]
        np.add.at(acc, dst, acc[src] + 1)
        np.add.at(indeg, dst, -1)
        # a downstream cell joins the next frontier when its LAST
        # upstream contributor has been processed this round
        frontier = np.unique(dst[indeg[dst] == 0])
    return acc.reshape(h, w)


def cost_distance(cost: np.ndarray, sources: np.ndarray) -> np.ndarray:
    """Chamfer 2-3 accumulated cost (int64) from the True cells of
    ``sources`` over an integer cost raster (>= 1 everywhere).
    Bellman relaxation: each round min-reduces the 8 shifted
    ``dist_nbr + step`` candidates; converges in longest-geodesic
    rounds.  Unreachable cells (none here unless sources is empty)
    stay at np.iinfo(int64).max."""
    c = np.asarray(cost, dtype=np.int64)
    if np.any(c < 1):
        raise ValueError("cost_distance requires integer costs >= 1")
    big = np.iinfo(np.int64).max // 8
    dist = np.where(np.asarray(sources, dtype=bool), 0, big)
    while True:
        new = dist
        for _, dr, dc, diag in _D8:
            nd = _shift(dist, dr, dc, big)
            # edge fill 0 is safe: the matching nd is `big`, which
            # already blocks the candidate (and avoids int64 overflow)
            nc = _shift(c, dr, dc, 0)
            step = (3 if diag else 2) * (c + nc)
            new = np.minimum(new, nd + step)
        if np.array_equal(new, dist):
            out = dist.copy()
            out[out >= big] = np.iinfo(np.int64).max
            return out
        dist = new


def watershed(fdir: np.ndarray) -> np.ndarray:
    """Drainage-basin labels (int64) for a D8 code array: each cell is
    labeled with the FLAT INDEX of the terminal cell (pit / flat / edge
    sink, code 0) its water ultimately reaches — the classic watershed
    delineation over a filled DEM (Jenson & Domingue 1988 §3).

    Vectorized pointer jumping (path doubling): ``down = down[down]``
    halves every drainage path per round, so a path of length L
    resolves in ceil(log2 L) + 1 whole-array gathers — the same
    shortcut chain a distributed label-propagation would use, with no
    per-cell Python."""
    fd = np.asarray(fdir)
    h, w = fd.shape
    n = h * w
    down = np.arange(n, dtype=np.int64)  # pits point to themselves
    flat = fd.ravel()
    rr, cc = np.divmod(np.arange(n, dtype=np.int64), w)
    for code, dr, dc, _ in _D8:
        m = flat == code
        tr, tc = rr[m] + dr, cc[m] + dc
        inside = (tr >= 0) & (tr < h) & (tc >= 0) & (tc < w)
        idx = np.flatnonzero(m)[inside]
        down[idx] = (rr[idx] + dr) * w + (cc[idx] + dc)
    while True:
        nxt = down[down]
        if np.array_equal(nxt, down):
            return down.reshape(h, w)
        down = nxt


def least_cost_path(cost: np.ndarray, sources: np.ndarray,
                    start) -> list:
    """Least-cost route from ``start`` (row, col) back to the nearest
    True cell of ``sources`` under the chamfer 2-3 metric (the GRASS
    ``r.drain``/ArcGIS Cost Path operation on top of ``r.cost``).

    The accumulated-cost surface satisfies ``d[cur] = min over
    neighbors (d[n] + step(n, cur))``, so from any reachable cell some
    neighbor achieves equality; stepping to the FIRST such neighbor in
    ESRI code order (E, SE, S, SW, W, NW, N, NE) is deterministic and
    strictly decreases ``d`` — the walk terminates at a source in at
    most longest-geodesic steps.  Returns the path as a list of
    (row, col) tuples, ``start`` first, source last.  The per-step
    Python loop is O(path length), not O(cells) — path extraction is
    inherently sequential; the surface itself stays vectorized."""
    c = np.asarray(cost, dtype=np.int64)
    h, w = c.shape
    d = cost_distance(c, sources)
    r, col = int(start[0]), int(start[1])
    if d[r, col] == np.iinfo(np.int64).max:
        raise ValueError(f"start {start!r} is unreachable from sources")
    path = [(r, col)]
    while d[r, col] != 0:
        for _, dr, dc, diag in _D8:
            nr, nc = r + dr, col + dc
            if not (0 <= nr < h and 0 <= nc < w):
                continue
            step = (3 if diag else 2) * (c[r, col] + c[nr, nc])
            if d[nr, nc] + step == d[r, col]:
                r, col = nr, nc
                path.append((r, col))
                break
        else:  # pragma: no cover - cost_distance guarantees a step
            raise RuntimeError("no descending neighbor on cost surface")
    return path


def basin_stats(images_ds):
    """Per-image watershed summary over an image Dataset (rows carry
    ``image_id`` / ``bytes`` / ``fmt``): basin count and the
    largest/smallest basin cell counts from ``watershed`` over the
    image's D8 directions.  One map_batches, nothing shuffles."""

    def run(t: pa.Table) -> pa.Table:
        ids, nb, smax, smin = [], [], [], []
        for i in range(t.num_rows):
            px = codec.decode(t.column("bytes")[i].as_py(),
                              t.column("fmt")[i].as_py())
            lab = watershed(flow_direction(px))
            _, counts = np.unique(lab, return_counts=True)
            ids.append(t.column("image_id")[i].as_py())
            nb.append(int(counts.size))
            smax.append(int(counts.max()))
            smin.append(int(counts.min()))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "n_basins": pa.array(nb, pa.int64()),
            "basin_max": pa.array(smax, pa.int64()),
            "basin_min": pa.array(smin, pa.int64()),
        })

    return images_ds.map_batches(run, batch_format="pyarrow")


def flow_stats(images_ds):
    """Per-image drainage summary over an image Dataset (rows carry
    ``image_id`` / ``bytes`` / ``fmt``): D8 direction histogram
    (8 code columns), pit count, peak and total flow accumulation.
    One map_batches, nothing shuffles."""

    def run(t: pa.Table) -> pa.Table:
        cols = {"image_id": [], "n_pit": [], "acc_max": [], "acc_sum": []}
        for code, *_ in _D8:
            cols[f"n_d{code}"] = []
        for i in range(t.num_rows):
            px = codec.decode(t.column("bytes")[i].as_py(),
                              t.column("fmt")[i].as_py())
            fd = flow_direction(px)
            acc = flow_accumulation(fd)
            cols["image_id"].append(t.column("image_id")[i].as_py())
            cols["n_pit"].append(int(np.sum(fd == 0)))
            cols["acc_max"].append(int(acc.max()))
            cols["acc_sum"].append(int(acc.sum()))
            for code, *_ in _D8:
                cols[f"n_d{code}"].append(int(np.sum(fd == code)))
        return pa.table(
            {k: pa.array(v, pa.string() if k == "image_id" else pa.int64())
             for k, v in cols.items()})

    return images_ds.map_batches(run, batch_format="pyarrow")
