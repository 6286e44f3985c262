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

Scale shape: per-image map_batches, no shuffle — except
``flow_accumulation_tiled``, the distributed form for DEMs too big for
one worker: a halo-exchange local pass, iterative border-flow exchange
rounds over kilobyte routing tables, and a final per-tile resolve
(TauDEM's produce/exchange/resolve shape), bit-equal to the
whole-array path by test.
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
    "flow_accumulation_tiled",
    "fill_sinks",
    "watershed_tiled",
    "strahler_order",
    "flow_length",
    "twi_bins",
    "corridor",
    "flow_accumulation_weighted",
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


def _kahn_sum(down: np.ndarray, loads: np.ndarray) -> np.ndarray:
    """Generalized topological accumulation over a one-downstream
    forest: ``out[v] = loads[v] + sum(out[u] for down[u] == v)``.
    ``down`` holds local flat indices, -1 at terminals.  With unit
    loads this is flow accumulation + 1; with border-inflow loads it
    propagates external water down every internal path."""
    n = down.shape[0]
    out = np.asarray(loads, dtype=np.int64).copy()
    indeg = np.zeros(n, dtype=np.int64)
    np.add.at(indeg, down[down >= 0], 1)
    frontier = np.flatnonzero(indeg == 0)
    while frontier.size:
        d = down[frontier]
        live = d >= 0
        src, dst = frontier[live], d[live]
        np.add.at(out, dst, out[src])
        np.add.at(indeg, dst, -1)
        frontier = np.unique(dst[indeg[dst] == 0])
    return out


def _terminals(down: np.ndarray) -> np.ndarray:
    """Per-cell terminal local index by pointer jumping (terminals,
    ``down == -1``, resolve to themselves)."""
    n = down.shape[0]
    ptr = np.where(down >= 0, down, np.arange(n, dtype=np.int64))
    while True:
        nxt = ptr[ptr]
        if np.array_equal(nxt, ptr):
            return ptr
        ptr = nxt


def flow_accumulation_tiled(images_ds, tile: int = 256):
    """Distributed D8 flow accumulation for DEMs too big for one
    worker — the TauDEM-style tiled form (Tarboton et al., "Parallel
    flow-direction and accumulation", and Barnes 2017 §2's
    produce/exchange/resolve shape), bit-equal to
    ``flow_accumulation(flow_direction(dem))`` by test.

    Phases:

    1. **Local** — ONE :func:`~rasters_ray.stages.focal.halo_exchange_tiled`
       pass (radius-1 DEM halos, one groupby shuffle) computes each
       tile's exact D8 directions, the internal-only accumulation
       (``_kahn_sum`` with unit loads), each exit cell's initial
       crossing amount, and a ROUTING table: for every tile-boundary
       cell, the global cell its water leaves the tile toward (or
       "absorbed" at an internal pit).
    2. **Exchange rounds** — border flows iterate: a groupby on the
       target cell joins in-flight flows to the owning tile's routing
       rows, records the arrival, and forwards the amount one tile
       further.  Each unit of water must be RECORDED in every tile it
       crosses (its cells' counts all rise), so rounds are inherently
       O(tile-graph path length) — the work, O(border cells) per
       round, matches TauDEM's exchange; only small border tables move.
    3. **Resolve** — one final groupby per tile seeds ``_kahn_sum``
       with the summed arrivals at each entry cell and adds the
       propagated externals to the local accumulation.

    Returns a Dataset of accumulation tiles (``image_id``, ``ty``,
    ``tx``, ``r0``, ``c0``, ``bytes`` int64-npy, ``fmt``).  The
    phase-1 state is materialized once (at scale: write it to
    partitioned parquet instead) — rounds re-read only the kilobyte
    routing/flow tables, never pixels."""
    from rasters_ray.stages.focal import halo_exchange_tiled

    T = int(tile)

    def tile_fn(image_id, canvas, tr0, tc0, trows, tcols) -> pa.Table:
        fd = flow_direction(canvas)[1:1 + trows, 1:1 + tcols]
        n = trows * tcols
        rr, cc = np.divmod(np.arange(n, dtype=np.int64), tcols)
        down = np.full(n, -1, dtype=np.int64)
        exit_gr = np.full(n, -1, dtype=np.int64)
        exit_gc = np.full(n, -1, dtype=np.int64)
        flat = fd.ravel()
        for code, dr, dc, _ in _D8:
            m = flat == code
            if not m.any():
                continue
            tr, tc = rr[m] + dr, cc[m] + dc
            idx = np.flatnonzero(m)
            inside = (tr >= 0) & (tr < trows) & (tc >= 0) & (tc < tcols)
            down[idx[inside]] = tr[inside] * tcols + tc[inside]
            # exits: the D8 target is outside this tile but (because
            # flow_direction only picks FINITE halo neighbors) inside
            # the image
            ex = idx[~inside]
            exit_gr[ex] = tr0 + rr[ex] + dr
            exit_gc[ex] = tc0 + cc[ex] + dc
        acc1 = _kahn_sum(down, np.ones(n, dtype=np.int64))  # subtree size
        term = _terminals(down)

        out = {"image_id": [], "kind": [], "ty": [], "tx": [],
               "a": [], "b": [], "c": [], "d": [], "blob": []}
        ty, tx = tr0 // T, tc0 // T

        def emit(kind, a=0, b=0, c=0, d=0, blob=b"", toty=ty, totx=tx):
            out["image_id"].append(image_id)
            out["kind"].append(kind)
            out["ty"].append(toty)
            out["tx"].append(totx)
            out["a"].append(int(a))
            out["b"].append(int(b))
            out["c"].append(int(c))
            out["d"].append(int(d))
            out["blob"].append(blob)

        # tile state: directions and local accumulation as two
        # rows (a,b = r0,c0; c,d = trows,tcols)
        emit("state", tr0, tc0, trows, tcols, codec.encode(fd, "npy"))
        emit("accl", tr0, tc0, trows, tcols,
             codec.encode(acc1 - 1, "npy"))
        # seed flows: one per exit cell, keyed (a,b) = TARGET global
        # cell, routed to the target's owning tile
        exits = np.flatnonzero(exit_gr >= 0)
        for e in exits.tolist():
            emit("flow", exit_gr[e], exit_gc[e], acc1[e], 0,
                 toty=int(exit_gr[e]) // T, totx=int(exit_gc[e]) // T)
        # routing: every boundary cell's terminal, keyed (a,b) = the
        # boundary cell's global coords; (c,d) = forwarded-to global
        # cell or (-1,-1) when absorbed at an internal pit
        bmask = ((rr == 0) | (rr == trows - 1)
                 | (cc == 0) | (cc == tcols - 1))
        for v in np.flatnonzero(bmask).tolist():
            t = term[v]
            if exit_gr[t] >= 0:
                emit("route", tr0 + rr[v], tc0 + cc[v],
                     exit_gr[t], exit_gc[t])
            else:
                emit("route", tr0 + rr[v], tc0 + cc[v], -1, -1)
        return pa.table({
            "image_id": pa.array(out["image_id"], pa.string()),
            "kind": pa.array(out["kind"], pa.string()),
            "ty": pa.array(out["ty"], pa.int64()),
            "tx": pa.array(out["tx"], pa.int64()),
            "a": pa.array(out["a"], pa.int64()),
            "b": pa.array(out["b"], pa.int64()),
            "c": pa.array(out["c"], pa.int64()),
            "d": pa.array(out["d"], pa.int64()),
            "blob": pa.array(out["blob"], pa.binary()),
        })

    state = halo_exchange_tiled(
        images_ds, radius=1, tile=T, tile_fn=tile_fn).materialize()

    def keep(kind):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pa.compute.equal(t.column("kind"), kind))
        return f

    routing = state.map_batches(keep("route"), batch_format="pyarrow")
    flows = state.map_batches(
        keep("flow"), batch_format="pyarrow").materialize()

    def step(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        amounts = g.column("c").to_numpy()
        total = int(sum(a for k, a in zip(kinds, amounts) if k == "flow"))
        if total == 0:  # routing row alone — nothing arrived here
            return g.slice(0, 0)
        ri = kinds.index("route")
        image_id = g.column("image_id")[0].as_py()
        cell_a = int(g.column("a")[0].as_py())
        cell_b = int(g.column("b")[0].as_py())
        own_ty, own_tx = int(g.column("ty")[ri].as_py()), int(
            g.column("tx")[ri].as_py())
        dest_a = int(g.column("c")[ri].as_py())
        dest_b = int(g.column("d")[ri].as_py())
        rows = [("arrived", own_ty, own_tx, cell_a, cell_b, total, 0)]
        if dest_a >= 0:
            rows.append(("flow", dest_a // T, dest_b // T,
                         dest_a, dest_b, total, 0))
        return pa.table({
            "image_id": pa.array([image_id] * len(rows), pa.string()),
            "kind": pa.array([r[0] for r in rows], pa.string()),
            "ty": pa.array([r[1] for r in rows], pa.int64()),
            "tx": pa.array([r[2] for r in rows], pa.int64()),
            "a": pa.array([r[3] for r in rows], pa.int64()),
            "b": pa.array([r[4] for r in rows], pa.int64()),
            "c": pa.array([r[5] for r in rows], pa.int64()),
            "d": pa.array([r[6] for r in rows], pa.int64()),
            "blob": pa.array([b""] * len(rows), pa.binary()),
        })

    arrived = []
    while flows.count() > 0:
        nxt = (routing.union(flows)
               .groupby(["image_id", "a", "b"])
               .map_groups(step, batch_format="pyarrow")
               .materialize())
        arrived.append(nxt.map_batches(keep("arrived"),
                                       batch_format="pyarrow"))
        flows = nxt.map_batches(
            keep("flow"), batch_format="pyarrow").materialize()

    def keep2(t: pa.Table) -> pa.Table:
        k = t.column("kind")
        m = pa.compute.or_(pa.compute.equal(k, "state"),
                           pa.compute.equal(k, "accl"))
        return t.filter(m)

    tiles = state.map_batches(keep2, batch_format="pyarrow")
    for a in arrived:
        tiles = tiles.union(a)

    def finalize(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        si = kinds.index("state")
        ai = kinds.index("accl")
        tr0 = int(g.column("a")[si].as_py())
        tc0 = int(g.column("b")[si].as_py())
        trows = int(g.column("c")[si].as_py())
        tcols = int(g.column("d")[si].as_py())
        fd = codec.decode(g.column("blob")[si].as_py(), "npy")
        accl = codec.decode(g.column("blob")[ai].as_py(),
                            "npy").astype(np.int64)
        n = trows * tcols
        rr, cc = np.divmod(np.arange(n, dtype=np.int64), tcols)
        down = np.full(n, -1, dtype=np.int64)
        flat = fd.ravel()
        for code, dr, dc, _ in _D8:
            m = flat == code
            tr, tc = rr[m] + dr, cc[m] + dc
            inside = (tr >= 0) & (tr < trows) & (tc >= 0) & (tc < tcols)
            idx = np.flatnonzero(m)[inside]
            down[idx] = (rr[idx] + dr) * tcols + (cc[idx] + dc)
        loads = np.zeros(n, dtype=np.int64)
        for i in range(g.num_rows):
            if kinds[i] != "arrived":
                continue
            lr = int(g.column("a")[i].as_py()) - tr0
            lc = int(g.column("b")[i].as_py()) - tc0
            loads[lr * tcols + lc] += int(g.column("c")[i].as_py())
        acc = accl + _kahn_sum(down, loads)
        return pa.table({
            "image_id": pa.array([g.column("image_id")[0].as_py()],
                                 pa.string()),
            "ty": pa.array([int(g.column("ty")[si].as_py())], pa.int64()),
            "tx": pa.array([int(g.column("tx")[si].as_py())], pa.int64()),
            "r0": pa.array([tr0], pa.int64()),
            "c0": pa.array([tc0], pa.int64()),
            "bytes": pa.array([codec.encode(acc.reshape(trows, tcols),
                                            "npy")], pa.binary()),
            "fmt": pa.array(["npy"], pa.string()),
        })

    return (tiles.groupby(["image_id", "ty", "tx"])
            .map_groups(finalize, batch_format="pyarrow"))


def fill_sinks(dem: np.ndarray, eps: float = 0.0) -> np.ndarray:
    """Depression filling (Planchon & Darboux 2001, the GRASS
    ``r.fill.dir`` / Wang-Liu preprocessing step): raise every cell to
    the lowest spill level reachable along any 8-connected path to the
    raster border — ``filled = max(dem, min over paths of max en-route
    W)``.  With ``eps = 0`` flats are left flat (integer DEMs stay
    integer-exact); a positive ``eps`` imposes the classic drainage
    gradient on filled areas.

    Vectorized fixpoint: start from W = dem on the border and +inf
    inside, then relax ``W = max(dem, min(W, min_nbr(W) + eps))``
    (8 shifted min-reduces per round) until unchanged — the same
    order-independent relaxation shape as :func:`cost_distance`."""
    z = np.asarray(dem, dtype=np.float64)
    if not np.all(np.isfinite(z)):
        raise ValueError("fill_sinks requires a finite DEM (fill NaNs first)")
    w = np.full_like(z, np.inf)
    w[0, :], w[-1, :], w[:, 0], w[:, -1] = z[0, :], z[-1, :], z[:, 0], z[:, -1]
    while True:
        best = np.full_like(z, np.inf)
        for _, dr, dc, _ in _D8:
            best = np.minimum(best, _shift(w, dr, dc, np.inf))
        new = np.maximum(z, np.minimum(w, best + eps))
        if np.array_equal(new, w):
            return w
        w = new


def _pack_rc(r, c):
    """Pack global (row, col) into one int64 label: r * 2^24 + c.
    Documented limit: images narrower than 2^24 columns."""
    return r * 16777216 + c


def watershed_tiled(images_ds, tile: int = 256):
    """Distributed watershed delineation for DEMs too big for one
    worker — basin labels equal to ``watershed(flow_direction(dem))``
    (with labels packed ``terminal_row * 2^24 + terminal_col``) by
    test, computed tile-wise.

    Unlike accumulation, labels need only each drainage path's
    TERMINAL, so the cross-tile resolution is pointer DOUBLING on the
    border graph (each boundary/exit cell's pointer jumps to its
    pointer's pointer every round) — ceil(log2(max tile-hops)) groupby
    rounds over kilobyte pointer tables, the classic parallel
    list-ranking shortcut (Wyllie 1979; the same trick the in-core
    :func:`watershed` uses on whole arrays).

    Phases: (1) one halo-exchange pass computes per-tile D8 codes,
    local terminals, and the border pointer rows; (2) pointer-doubling
    rounds resolve every border pointer to a pit; (3) one final
    per-tile groupby joins resolved exit labels back onto the tile's
    cells.  Returns label tiles (``image_id``, ``ty``, ``tx``, ``r0``,
    ``c0``, ``bytes`` int64-npy, ``fmt``)."""
    from rasters_ray.stages.focal import halo_exchange_tiled

    T = int(tile)

    def tile_fn(image_id, canvas, tr0, tc0, trows, tcols) -> pa.Table:
        fd = flow_direction(canvas)[1:1 + trows, 1:1 + tcols]
        n = trows * tcols
        rr, cc = np.divmod(np.arange(n, dtype=np.int64), tcols)
        down = np.full(n, -1, dtype=np.int64)
        exit_gr = np.full(n, -1, dtype=np.int64)
        exit_gc = np.full(n, -1, dtype=np.int64)
        flat = fd.ravel()
        for code, dr, dc, _ in _D8:
            m = flat == code
            if not m.any():
                continue
            tr, tc = rr[m] + dr, cc[m] + dc
            idx = np.flatnonzero(m)
            inside = (tr >= 0) & (tr < trows) & (tc >= 0) & (tc < tcols)
            down[idx[inside]] = tr[inside] * tcols + tc[inside]
            ex = idx[~inside]
            exit_gr[ex] = tr0 + rr[ex] + dr
            exit_gc[ex] = tc0 + cc[ex] + dc
        term = _terminals(np.where(exit_gr >= 0, -1, down))
        ty, tx = tr0 // T, tc0 // T

        out = {"image_id": [], "kind": [], "ty": [], "tx": [],
               "a": [], "b": [], "c": [], "d": [], "e": [], "blob": []}

        def emit(kind, a=0, b=0, c=0, d=0, e=0, blob=b""):
            out["image_id"].append(image_id)
            out["kind"].append(kind)
            out["ty"].append(ty)
            out["tx"].append(tx)
            out["a"].append(int(a))
            out["b"].append(int(b))
            out["c"].append(int(c))
            out["d"].append(int(d))
            out["e"].append(int(e))
            out["blob"].append(blob)

        # tile state: terminal local index per cell + which terminals
        # are exits (their global targets), as three npy rows
        emit("term", tr0, tc0, trows, tcols, blob=codec.encode(term, "npy"))
        emit("exgr", tr0, tc0, trows, tcols,
             blob=codec.encode(exit_gr, "npy"))
        emit("exgc", tr0, tc0, trows, tcols,
             blob=codec.encode(exit_gc, "npy"))
        # pointer rows for the doubling rounds.  Boundary cells answer
        # asks from other tiles; exit cells are this tile's own asks.
        # (a,b) = the cell's global coords; (c,d) = pointer target or
        # final pit coords; e = 1 when resolved (pointer IS the pit).
        bmask = ((rr == 0) | (rr == trows - 1)
                 | (cc == 0) | (cc == tcols - 1))
        for v in np.flatnonzero(bmask).tolist():
            t = term[v]
            if exit_gr[t] >= 0:
                emit("ptr", tr0 + rr[v], tc0 + cc[v],
                     exit_gr[t], exit_gc[t], 0)
            else:
                emit("ptr", tr0 + rr[v], tc0 + cc[v],
                     tr0 + rr[t], tc0 + cc[t], 1)
        # one ask row per EXIT cell, keyed later to this tile so the
        # final relabel join needs no extra routing hop
        for e_ in np.unique(term[exit_gr[term] >= 0]).tolist():
            emit("exit", tr0 + rr[e_], tc0 + cc[e_],
                 exit_gr[e_], exit_gc[e_], 0)
        return pa.table({
            "image_id": pa.array(out["image_id"], pa.string()),
            "kind": pa.array(out["kind"], pa.string()),
            "ty": pa.array(out["ty"], pa.int64()),
            "tx": pa.array(out["tx"], pa.int64()),
            "a": pa.array(out["a"], pa.int64()),
            "b": pa.array(out["b"], pa.int64()),
            "c": pa.array(out["c"], pa.int64()),
            "d": pa.array(out["d"], pa.int64()),
            "e": pa.array(out["e"], pa.int64()),
            "blob": pa.array(out["blob"], pa.binary()),
        })

    state = halo_exchange_tiled(
        images_ds, radius=1, tile=T, tile_fn=tile_fn).materialize()

    def keep(*kinds):
        def f(t: pa.Table) -> pa.Table:
            k = t.column("kind")
            m = pa.compute.equal(k, kinds[0])
            for extra in kinds[1:]:
                m = pa.compute.or_(m, pa.compute.equal(k, extra))
            return t.filter(m)
        return f

    # pointer doubling: every unresolved row (ptr or exit) asks the
    # row that owns its target cell; answers double the pointer or
    # resolve it.  Resolved ptr rows keep serving as answers.
    rows = state.map_batches(keep("ptr", "exit"),
                             batch_format="pyarrow").materialize()

    def double(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        asks = [i for i, k in enumerate(kinds) if k in ("ask_ptr",
                                                        "ask_exit")]
        if not asks:
            return g.slice(0, 0)
        ans = [i for i, k in enumerate(kinds) if k == "ptr"]
        if not ans:  # pragma: no cover - exit targets are boundary cells
            raise RuntimeError("pointer target has no answering row")
        ai = ans[0]
        pr = int(g.column("c")[ai].as_py())
        pc = int(g.column("d")[ai].as_py())
        done = int(g.column("e")[ai].as_py())
        cols = {name: [] for name in ("image_id", "kind", "ty", "tx",
                                      "a", "b", "c", "d", "e", "blob")}
        for i in asks:
            cols["image_id"].append(g.column("image_id")[i].as_py())
            cols["kind"].append(
                "ptr" if kinds[i] == "ask_ptr" else "exit")
            cols["ty"].append(int(g.column("ty")[i].as_py()))
            cols["tx"].append(int(g.column("tx")[i].as_py()))
            cols["a"].append(int(g.column("a")[i].as_py()))
            cols["b"].append(int(g.column("b")[i].as_py()))
            cols["c"].append(pr)
            cols["d"].append(pc)
            cols["e"].append(done)
            cols["blob"].append(b"")
        return pa.table({
            "image_id": pa.array(cols["image_id"], pa.string()),
            "kind": pa.array(cols["kind"], pa.string()),
            "ty": pa.array(cols["ty"], pa.int64()),
            "tx": pa.array(cols["tx"], pa.int64()),
            "a": pa.array(cols["a"], pa.int64()),
            "b": pa.array(cols["b"], pa.int64()),
            "c": pa.array(cols["c"], pa.int64()),
            "d": pa.array(cols["d"], pa.int64()),
            "e": pa.array(cols["e"], pa.int64()),
            "blob": pa.array(cols["blob"], pa.binary()),
        })

    def count_unresolved(ds) -> int:
        def f(t: pa.Table) -> pa.Table:
            m = pa.compute.equal(t.column("e"), 0)
            return t.filter(m)
        return ds.map_batches(f, batch_format="pyarrow").count()

    while count_unresolved(rows) > 0:
        def split(t: pa.Table) -> pa.Table:
            # answers keyed by their own cell; unresolved rows ALSO
            # re-emitted as asks keyed by their pointer target
            un = t.filter(pa.compute.equal(t.column("e"), 0))
            if un.num_rows == 0:
                return t
            ask = pa.table({
                "image_id": un.column("image_id"),
                "kind": pa.compute.binary_join_element_wise(
                    pa.array(["ask_"] * un.num_rows), un.column("kind"),
                    ""),
                "ty": un.column("ty"), "tx": un.column("tx"),
                "a": un.column("a"), "b": un.column("b"),
                "c": un.column("c"), "d": un.column("d"),
                "e": un.column("e"), "blob": un.column("blob"),
            })
            return pa.concat_tables([t, ask])

        keyed = rows.map_batches(split, batch_format="pyarrow")

        def key_cols(t: pa.Table) -> pa.Table:
            kinds = t.column("kind").to_pylist()
            is_ask = np.array([k.startswith("ask_") for k in kinds])
            a = t.column("a").to_numpy()
            b = t.column("b").to_numpy()
            c = t.column("c").to_numpy()
            d = t.column("d").to_numpy()
            return t.append_column(
                "ka", pa.array(np.where(is_ask, c, a), pa.int64())
            ).append_column(
                "kb", pa.array(np.where(is_ask, d, b), pa.int64()))

        updated = (keyed.map_batches(key_cols, batch_format="pyarrow")
                   .groupby(["image_id", "ka", "kb"])
                   .map_groups(lambda g: double(g.drop_columns(
                       ["ka", "kb"])), batch_format="pyarrow"))
        resolved = rows.map_batches(
            lambda t: t.filter(pa.compute.equal(t.column("e"), 1)),
            batch_format="pyarrow")
        rows = resolved.union(updated).materialize()

    # final relabel: exits (now resolved) grouped back to their tile
    exits = rows.map_batches(keep("exit"), batch_format="pyarrow")
    tiles = state.map_batches(keep("term", "exgr", "exgc"),
                              batch_format="pyarrow").union(exits)

    def finalize(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        ti = kinds.index("term")
        gi = kinds.index("exgr")
        ci = kinds.index("exgc")
        tr0 = int(g.column("a")[ti].as_py())
        tc0 = int(g.column("b")[ti].as_py())
        trows = int(g.column("c")[ti].as_py())
        tcols = int(g.column("d")[ti].as_py())
        term = codec.decode(g.column("blob")[ti].as_py(), "npy")
        exit_gr = codec.decode(g.column("blob")[gi].as_py(), "npy")
        # resolved pit per exit cell, keyed by LOCAL exit index
        pit = {}
        for i in range(g.num_rows):
            if kinds[i] != "exit":
                continue
            lr = int(g.column("a")[i].as_py()) - tr0
            lc = int(g.column("b")[i].as_py()) - tc0
            pit[lr * tcols + lc] = _pack_rc(
                int(g.column("c")[i].as_py()),
                int(g.column("d")[i].as_py()))
        rr, cc = np.divmod(np.arange(trows * tcols, dtype=np.int64),
                           tcols)
        lab = _pack_rc(tr0 + rr[term], tc0 + cc[term])
        is_exit = exit_gr[term] >= 0
        if is_exit.any():
            lut = np.array([pit[v] for v in
                            np.unique(term[is_exit]).tolist()])
            pos = np.searchsorted(np.unique(term[is_exit]),
                                  term[is_exit])
            lab[is_exit] = lut[pos]
        return pa.table({
            "image_id": pa.array([g.column("image_id")[0].as_py()],
                                 pa.string()),
            "ty": pa.array([int(g.column("ty")[ti].as_py())], pa.int64()),
            "tx": pa.array([int(g.column("tx")[ti].as_py())], pa.int64()),
            "r0": pa.array([tr0], pa.int64()),
            "c0": pa.array([tc0], pa.int64()),
            "bytes": pa.array([codec.encode(
                lab.reshape(trows, tcols), "npy")], pa.binary()),
            "fmt": pa.array(["npy"], pa.string()),
        })

    return (tiles.groupby(["image_id", "ty", "tx"])
            .map_groups(finalize, batch_format="pyarrow"))


def strahler_order(fdir: np.ndarray) -> np.ndarray:
    """Strahler stream order (Strahler 1957; the GRASS r.stream.order
    / ArcGIS Stream Order convention) over a D8 code array, treating
    EVERY cell as stream: leaves are order 1; a cell's order is its
    parents' maximum, +1 when two or more parents attain it.

    Same Kahn machinery as :func:`flow_accumulation`, with two scatter
    passes per round (``np.maximum.at`` for the running parent max,
    ``np.add.at`` for how many parents attain it, reset whenever the
    max rises)."""
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
    order = np.zeros(n, dtype=np.int64)
    maxo = np.zeros(n, dtype=np.int64)
    cnt = np.zeros(n, dtype=np.int64)
    frontier = np.flatnonzero(indeg == 0)
    while frontier.size:
        # finalize this frontier: leaves (max 0) are order 1
        o = np.where(maxo[frontier] == 0, 1,
                     maxo[frontier] + (cnt[frontier] >= 2))
        order[frontier] = o
        d = down[frontier]
        live = d >= 0
        src, dst = frontier[live], d[live]
        newmax = maxo.copy()
        np.maximum.at(newmax, dst, o[live])
        cnt[dst[newmax[dst] > maxo[dst]]] = 0
        np.add.at(cnt, dst[o[live] == newmax[dst]], 1)
        maxo = newmax
        np.add.at(indeg, dst, -1)
        frontier = np.unique(dst[indeg[dst] == 0])
    return order.reshape(h, w)


def flow_length(fdir: np.ndarray, upstream: bool = False) -> np.ndarray:
    """Chamfer-weighted flow length (ArcGIS Flow Length): per cell the
    integer path length DOWNSTREAM to its terminal (straight steps
    weigh 2, diagonal 3 — the same 2-3 metric as
    :func:`cost_distance`), or with ``upstream=True`` the LONGEST
    weighted path arriving from any source.

    Downstream is weighted pointer doubling (list ranking with sums:
    ``dist[v] += dist[ptr[v]]; ptr = ptr[ptr]`` — log rounds);
    upstream is a Kahn ``np.maximum.at`` propagation."""
    fd = np.asarray(fdir)
    h, w = fd.shape
    n = h * w
    down = np.full(n, -1, dtype=np.int64)
    wt = np.zeros(n, dtype=np.int64)
    flat = fd.ravel()
    rr, cc = np.divmod(np.arange(n, dtype=np.int64), w)
    for code, dr, dc, diag in _D8:
        m = flat == code
        tr, tc = rr[m] + dr, cc[m] + dc
        inside = (tr >= 0) & (tr < h) & (tc >= 0) & (tc < w)
        idx = np.flatnonzero(m)[inside]
        down[idx] = (rr[idx] + dr) * w + (cc[idx] + dc)
        wt[idx] = 3 if diag else 2
    if not upstream:
        ptr = np.where(down >= 0, down, np.arange(n, dtype=np.int64))
        dist = wt.copy()
        while True:
            nxt = ptr[ptr]
            if np.array_equal(nxt, ptr):
                return dist.reshape(h, w)
            dist = dist + dist[ptr]
            ptr = nxt
    indeg = np.zeros(n, dtype=np.int64)
    np.add.at(indeg, down[down >= 0], 1)
    ul = np.zeros(n, dtype=np.int64)
    frontier = np.flatnonzero(indeg == 0)
    while frontier.size:
        d = down[frontier]
        live = d >= 0
        src, dst = frontier[live], d[live]
        np.maximum.at(ul, dst, ul[src] + wt[src])
        np.add.at(indeg, dst, -1)
        frontier = np.unique(dst[indeg[dst] == 0])
    return ul.reshape(h, w)


def twi_bins(acc: np.ndarray, gx_num: np.ndarray, gy_num: np.ndarray,
             cell: int = 1, thresholds=(1, 2, 4, 8, 16)) -> np.ndarray:
    """Topographic Wetness Index (Beven & Kirkby 1979,
    ``ln(a / tan beta)``) binned WITHOUT materializing floats.

    Inputs are co-registered integer fields: D8 upstream counts ``acc``
    (contributing area A = acc + 1 cells), Horn gradient NUMERATORS
    (``terrain.horn_numerators``; tan beta = sqrt(gx^2 + gy^2) /
    (8 * cell)).  TWI is monotone in T = 8 * cell * A / sqrt(S2) with
    S2 = gx^2 + gy^2, so ``bin = #{t in thresholds : T >= t}`` reduces
    to the integer comparison ``64 * cell^2 * A^2 >= t^2 * S2`` —
    bit-stable under any tiling, replayable in SQL.  Flat cells
    (S2 == 0, TWI infinite) return -1; thresholds must be ascending
    positive integers."""
    a = np.asarray(acc, dtype=np.int64)
    gx = np.asarray(gx_num, dtype=np.int64)
    gy = np.asarray(gy_num, dtype=np.int64)
    if not (a.shape == gx.shape == gy.shape):
        raise ValueError("twi_bins inputs must be co-registered")
    ts = [int(t) for t in thresholds]
    if not ts or any(t <= 0 for t in ts) or sorted(ts) != ts:
        raise ValueError("thresholds must be ascending positive integers")
    A = a + 1
    s2 = gx * gx + gy * gy
    lhs = 64 * int(cell) * int(cell) * A * A
    out = np.zeros(a.shape, dtype=np.int64)
    for t in ts:
        out += lhs >= t * t * s2
    return np.where(s2 == 0, np.int64(-1), out)


def corridor(cost: np.ndarray, src_a: np.ndarray, src_b: np.ndarray) -> np.ndarray:
    """Least-cost corridor (ArcGIS Corridor / GRASS r.cost pairs): the
    per-cell sum of the two chamfer-2-3 accumulated-cost surfaces from
    ``src_a`` and ``src_b``.  Cells on an optimal A-B path attain the
    global minimum (= the chamfer distance d(A, B)); widening the
    corridor is thresholding at min + tolerance.  Unreachable cells in
    either surface stay at int64 max (no overflow on the sum)."""
    da = cost_distance(cost, src_a)
    db = cost_distance(cost, src_b)
    big = np.iinfo(np.int64).max
    out = da + db  # both reachable: exact; else clamp below
    return np.where((da == big) | (db == big), big, out)


def flow_accumulation_weighted(fdir: np.ndarray, weight: np.ndarray) -> np.ndarray:
    """Weighted flow accumulation (ArcGIS Flow Accumulation with a
    weight raster / TauDEM weighted area): the sum of UPSTREAM weights
    draining through each cell (the cell's own weight excluded,
    matching :func:`flow_accumulation`'s upstream-count convention).
    Same Kahn topological rounds, pushing ``acc + w`` downstream —
    int64-exact for integral weights."""
    fd = np.asarray(fdir)
    w = np.asarray(weight)
    if w.shape != fd.shape:
        raise ValueError("weight raster must match the D8 grid")
    if not np.issubdtype(w.dtype, np.integer):
        if not np.all(np.isfinite(w)) or np.any(w != np.rint(w)):
            raise ValueError("flow_accumulation_weighted requires integral weights")
    w = w.astype(np.int64).ravel()
    h, wd = fd.shape
    n = h * wd
    down = np.full(n, -1, dtype=np.int64)
    flat = fd.ravel()
    rr, cc = np.divmod(np.arange(n, dtype=np.int64), wd)
    for code, dr, dc, _ in _D8:
        m = flat == code
        tr, tc = rr[m] + dr, cc[m] + dc
        inside = (tr >= 0) & (tr < h) & (tc >= 0) & (tc < wd)
        idx = np.flatnonzero(m)[inside]
        down[idx] = (rr[idx] + dr) * wd + (cc[idx] + dc)
    indeg = np.zeros(n, dtype=np.int64)
    np.add.at(indeg, down[down >= 0], 1)
    acc = np.zeros(n, dtype=np.int64)
    frontier = np.flatnonzero(indeg == 0)
    while frontier.size:
        d = down[frontier]
        live = d >= 0
        src, dst = frontier[live], d[live]
        np.add.at(acc, dst, acc[src] + w[src])
        np.add.at(indeg, dst, -1)
        frontier = np.unique(dst[indeg[dst] == 0])
    return acc.reshape(h, wd)
