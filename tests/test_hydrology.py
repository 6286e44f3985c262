"""D8 flow direction / accumulation and chamfer cost-distance."""

import numpy as np
import pytest

from rasters_ray.stages.hydrology import (cost_distance, flow_accumulation,
                                          flow_direction)


def test_flow_direction_ramp():
    # value = r*16 + c: steepest descent is N (drop 16 at distance 1
    # beats NW's 17/sqrt2); row 0 flows W; (0,0) is the global pit
    r, c = np.indices((16, 16))
    fd = flow_direction((r * 16 + c).astype(float))
    assert np.all(fd[1:, :] == 64)
    assert np.all(fd[0, 1:] == 16)
    assert fd[0, 0] == 0


def test_flow_direction_diagonal_and_ties():
    # steep diagonal valley: drop 17 at sqrt2 (rate ~12.02) loses to a
    # straight drop 16; wins against a straight drop 12
    z = np.array([[0.0, 12.0], [16.0, 17.0]])
    assert flow_direction(z)[1, 1] == 32  # NW beats N (12) and W (16? no: W drop 1)
    # flat cells and NaN emit 0
    assert np.all(flow_direction(np.zeros((3, 3))) == 0)
    z = np.full((3, 3), 5.0)
    z[1, 1] = np.nan
    fd = flow_direction(z)
    assert fd[1, 1] == 0 and np.all(fd == 0)
    # ties break to the first code in ESRI order (E before S)
    z = np.array([[5.0, 1.0], [1.0, 9.0]], dtype=float)
    assert flow_direction(z)[0, 0] == 1  # E and S both drop 4 -> E


def test_flow_accumulation_ramp():
    r, c = np.indices((16, 16))
    acc = flow_accumulation(flow_direction((r * 16 + c).astype(float)))
    # interior columns drain north: acc(r, c) = 15 - r for r >= 1
    assert np.array_equal(acc[1:, :], np.broadcast_to(
        (15 - np.arange(1, 16))[:, None], (15, 16)))
    # top row collects its column plus everything east: 15 + 16*(15-c)
    assert np.array_equal(acc[0, :], 15 + 16 * (15 - np.arange(16)))
    assert acc[0, 0] == 255  # whole grid minus itself
    assert acc.sum() == 105 * 16 + 240 + 16 * 120


def test_flow_accumulation_nan_hole_and_pits():
    z = np.arange(25, dtype=float).reshape(5, 5)
    z[2, 2] = np.nan
    acc = flow_accumulation(flow_direction(z))
    assert acc[2, 2] == 0  # nodata cell drains nothing
    assert acc.sum() < 25 * 24  # and breaks the chain above it


def test_cost_distance_uniform_chamfer():
    # uniform cost 1: straight step 4, diagonal 6 -> 4*max + 2*min
    src = np.zeros((16, 16), dtype=bool)
    src[3, 5] = True
    d = cost_distance(np.ones((16, 16), dtype=np.int64), src)
    rr, cc = np.indices((16, 16))
    dr, dc = np.abs(rr - 3), np.abs(cc - 5)
    assert np.array_equal(d, 4 * np.maximum(dr, dc) + 2 * np.minimum(dr, dc))


def test_cost_distance_multi_source_and_barrier():
    # two sources: elementwise min of the single-source fields
    src = np.zeros((12, 12), dtype=bool)
    src[0, 0] = src[11, 11] = True
    c = np.ones((12, 12), dtype=np.int64)
    d = cost_distance(c, src)
    s1 = np.zeros_like(src); s1[0, 0] = True
    s2 = np.zeros_like(src); s2[11, 11] = True
    assert np.array_equal(
        d, np.minimum(cost_distance(c, s1), cost_distance(c, s2)))
    # a high-cost wall forces the path around it
    c = np.ones((5, 9), dtype=np.int64)
    c[:4, 4] = 1000
    src = np.zeros((5, 9), dtype=bool)
    src[0, 0] = True
    d = cost_distance(c, src)
    # straight through the wall would be 4*8=32 +ish; around the bottom
    # is cheaper and matches a hand-walked chamfer path
    assert d[0, 8] < 2 * 1001  # never pays a wall crossing
    # brute-force Dijkstra agreement on a random costed grid
    rng = np.random.default_rng(7)
    c = rng.integers(1, 9, size=(7, 7)).astype(np.int64)
    src = np.zeros((7, 7), dtype=bool)
    src[3, 3] = True
    d = cost_distance(c, src)
    import heapq
    dist = {(3, 3): 0}
    pq = [(0, (3, 3))]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, 1 << 62):
            continue
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == dc == 0:
                    continue
                v = (u[0] + dr, u[1] + dc)
                if not (0 <= v[0] < 7 and 0 <= v[1] < 7):
                    continue
                w = (3 if dr and dc else 2) * (c[u] + c[v])
                if du + w < dist.get(v, 1 << 62):
                    dist[v] = du + w
                    heapq.heappush(pq, (du + w, v))
    ref = np.array([[dist[(i, j)] for j in range(7)] for i in range(7)])
    assert np.array_equal(d, ref)


def test_cost_distance_validates_costs():
    with pytest.raises(ValueError):
        cost_distance(np.zeros((3, 3), dtype=np.int64),
                      np.ones((3, 3), dtype=bool))


def test_flow_stats_dataset(ray_session):
    import ray

    from rasters_ray import codec
    from rasters_ray.stages.hydrology import flow_stats

    r, c = np.indices((16, 16))
    px = (r * 16 + c).astype(np.float64)
    ds = ray.data.from_items([{
        "image_id": "imgA",
        "bytes": codec.encode(px, "npy"),
        "fmt": "npy",
    }])
    rows = flow_stats(ds).take_all()
    assert rows[0]["n_d64"] == 240 and rows[0]["n_d16"] == 15
    assert rows[0]["n_pit"] == 1
    assert rows[0]["acc_max"] == 255
    assert rows[0]["acc_sum"] == 105 * 16 + 240 + 16 * 120


def test_watershed_ridge_construction():
    # dem = -|c - w|: a ridge at column w; c < w flows W to the (r, 0)
    # pit, c >= w flows E (tie at the ridge breaks E-first) to (r, 15)
    from rasters_ray.stages.hydrology import watershed

    for w in range(1, 15):
        c = np.arange(16, dtype=float)
        dem = np.broadcast_to(-np.abs(c - w), (16, 16)).copy()
        lab = watershed(flow_direction(dem))
        for r in range(16):
            assert np.all(lab[r, :w] == r * 16 + 0)
            assert np.all(lab[r, w:] == r * 16 + 15)
        _, counts = np.unique(lab, return_counts=True)
        assert counts.size == 32
        assert counts.max() == max(w, 16 - w)


def test_watershed_matches_iterative_follow():
    # random smooth DEM: pointer jumping must agree with per-cell
    # scalar follow of the downstream pointers
    from rasters_ray.stages.hydrology import _D8, watershed

    rng = np.random.RandomState(7)
    z = rng.rand(12, 12).cumsum(axis=0) + rng.rand(12, 12)
    fd = flow_direction(z)
    lab = watershed(fd)
    step = {code: (dr, dc) for code, dr, dc, _ in _D8}
    for r in range(12):
        for c in range(12):
            rr, cc = r, c
            for _ in range(200):
                if fd[rr, cc] == 0:
                    break
                dr, dc = step[fd[rr, cc]]
                nr, nc = rr + dr, cc + dc
                if not (0 <= nr < 12 and 0 <= nc < 12):
                    break
                rr, cc = nr, nc
            assert lab[r, c] == rr * 12 + cc


def test_least_cost_path_uniform():
    # uniform cost: the greedy backtrace takes exactly the Chebyshev
    # number of steps and its start cost is the 4*max+2*min chamfer norm
    from rasters_ray.stages.hydrology import least_cost_path

    src = np.zeros((16, 16), dtype=bool)
    src[3, 11] = True
    path = least_cost_path(np.ones((16, 16), dtype=np.int64), src, (14, 2))
    dr, dc = abs(14 - 3), abs(2 - 11)
    assert len(path) - 1 == max(dr, dc)
    assert path[0] == (14, 2) and path[-1] == (3, 11)
    # every hop is 8-adjacent
    for (r0, c0), (r1, c1) in zip(path, path[1:]):
        assert max(abs(r1 - r0), abs(c1 - c0)) == 1


def test_least_cost_path_weighted_and_unreachable():
    from rasters_ray.stages.hydrology import cost_distance, least_cost_path

    rng = np.random.RandomState(3)
    cost = rng.randint(1, 9, size=(10, 10)).astype(np.int64)
    src = np.zeros((10, 10), dtype=bool)
    src[0, 0] = True
    d = cost_distance(cost, src)
    path = least_cost_path(cost, src, (9, 9))
    # d strictly decreases along the path by exactly the step cost
    for (r0, c0), (r1, c1) in zip(path, path[1:]):
        step = (3 if r0 != r1 and c0 != c1 else 2) * (
            cost[r0, c0] + cost[r1, c1])
        assert d[r1, c1] + step == d[r0, c0]
    assert d[path[-1]] == 0
    with pytest.raises(ValueError):
        least_cost_path(cost, np.zeros((10, 10), dtype=bool), (5, 5))


def test_basin_stats_dataset(ray_session):
    import ray

    from rasters_ray import codec
    from rasters_ray.stages.hydrology import basin_stats

    c = np.arange(16, dtype=float)
    dem = np.broadcast_to(-np.abs(c - 5), (16, 16)).copy()
    ds = ray.data.from_items([{
        "image_id": "i0",
        "bytes": codec.encode(dem, "npy"),
        "fmt": "npy",
    }])
    row = basin_stats(ds).take_all()[0]
    assert row["n_basins"] == 32
    assert row["basin_max"] == 11 and row["basin_min"] == 5


def _tiled_acc(dem, tile, ray):
    from rasters_ray import codec
    from rasters_ray.stages.hydrology import flow_accumulation_tiled

    ds = ray.data.from_items([{
        "image_id": "i0",
        "bytes": codec.encode(dem, "npy"),
        "fmt": "npy",
    }])
    out = np.full(dem.shape, -1, dtype=np.int64)
    for row in flow_accumulation_tiled(ds, tile=tile).take_all():
        piece = codec.decode(row["bytes"], row["fmt"])
        out[row["r0"]:row["r0"] + piece.shape[0],
            row["c0"]:row["c0"] + piece.shape[1]] = piece
    assert (out >= 0).all()
    return out


def test_flow_accumulation_tiled_random(ray_session):
    import ray

    from rasters_ray.stages.hydrology import flow_accumulation

    rng = np.random.RandomState(5)
    dem = rng.rand(48, 64) + np.linspace(0, 3, 64)[None, :]
    dem[10:13, 20:24] = np.nan
    expect = flow_accumulation(flow_direction(dem))
    assert np.array_equal(_tiled_acc(dem, 16, ray), expect)


def test_flow_accumulation_tiled_ramp_and_partial_tiles(ray_session):
    import ray

    from rasters_ray.stages.hydrology import flow_accumulation

    r, c = np.indices((30, 44))  # not multiples of the tile size
    dem = (r * 44 + c).astype(float)
    expect = flow_accumulation(flow_direction(dem))
    assert np.array_equal(_tiled_acc(dem, 16, ray), expect)


def test_flow_accumulation_tiled_serpentine_many_rounds(ray_session):
    # one river visiting every cell boustrophedon-style: the border
    # flow re-enters tiles many times, exercising the exchange rounds
    import ray

    from rasters_ray.stages.hydrology import flow_accumulation

    order = np.zeros((8, 8), dtype=float)
    k = 0
    for r in range(8):
        cols = range(8) if r % 2 == 0 else range(7, -1, -1)
        for c in cols:
            order[r, c] = -k
            k += 1
    expect = flow_accumulation(flow_direction(order))
    assert expect.max() == 63
    assert np.array_equal(_tiled_acc(order, 4, ray), expect)


def test_fill_sinks_pit_to_spill_level():
    from rasters_ray.stages.hydrology import fill_sinks

    r, c = np.indices((16, 16))
    for a in range(2, 8):
        for p in range(2, 9):
            dem = (r + 2 * c).astype(float)
            dem[a:a + 3, p:p + 3] = -100.0
            filled = fill_sinks(dem)
            spill = a + 2 * p - 3  # lowest rim cell (a-1, p-1)
            assert np.all(filled[a:a + 3, p:p + 3] == spill), (a, p)
            # cells outside the pit are untouched (monotone ramp drains)
            keep = np.ones((16, 16), dtype=bool)
            keep[a:a + 3, p:p + 3] = False
            assert np.array_equal(filled[keep], dem[keep])


def test_fill_sinks_epsilon_gradient_and_idempotent():
    from rasters_ray.stages.hydrology import (fill_sinks, flow_direction)

    dem = np.ones((7, 7), dtype=float) * 5
    dem[3, 3] = 0.0
    filled = fill_sinks(dem, eps=0.5)
    # with eps the drainage gradient is imposed on the FLAT too: each
    # ring inward rises by eps (5.5, 6.0), and the pit lands eps above
    # its ring — the classic Planchon-Darboux flat-raising behavior
    assert filled[3, 3] == 6.5
    assert filled[1, 1] == 5.5 and filled[2, 2] == 6.0
    f0 = fill_sinks(dem)
    assert np.array_equal(fill_sinks(f0), f0)  # idempotent at eps=0
    # after filling, the pit is a flat (code 0) rather than a sink
    assert flow_direction(f0)[3, 3] == 0
    with pytest.raises(ValueError):
        fill_sinks(np.array([[np.nan, 1.0]]))


def test_fill_then_accumulate_chain():
    # the full gdaldem-style chain: fill -> direction -> accumulation;
    # a carved pit no longer truncates the drainage upstream of it
    from rasters_ray.stages.hydrology import (fill_sinks,
                                              flow_accumulation,
                                              flow_direction)

    r, c = np.indices((16, 16))
    dem = (r * 16 + c).astype(float)
    dem[5, 5] = -999.0  # artificial sink interrupting column 5
    fd_raw = flow_direction(dem)
    acc_raw = flow_accumulation(fd_raw)
    # eps > 0 so the filled pit becomes a draining slope, not a flat
    fd_fill = flow_direction(fill_sinks(dem, eps=0.25))
    acc_fill = flow_accumulation(fd_fill)
    # raw: the pit is a second sink capturing its upstream cells;
    # filled: the global minimum (0,0) is the ONLY sink and collects
    # the whole grid again
    assert int(np.sum(fd_raw == 0)) == 2 and acc_raw[0, 0] < 255
    assert int(np.sum(fd_fill == 0)) == 1
    assert acc_fill[0, 0] == 255


def _tiled_labels(dem, tile, ray):
    from rasters_ray import codec
    from rasters_ray.stages.hydrology import watershed_tiled

    ds = ray.data.from_items([{
        "image_id": "i0",
        "bytes": codec.encode(dem, "npy"),
        "fmt": "npy",
    }])
    out = np.full(dem.shape, -1, dtype=np.int64)
    for row in watershed_tiled(ds, tile=tile).take_all():
        piece = codec.decode(row["bytes"], row["fmt"])
        out[row["r0"]:row["r0"] + piece.shape[0],
            row["c0"]:row["c0"] + piece.shape[1]] = piece
    assert (out >= 0).all()
    return out


def _packed_single(dem):
    from rasters_ray.stages.hydrology import watershed

    lab = watershed(flow_direction(dem))
    w = dem.shape[1]
    return (lab // w) * 16777216 + (lab % w)


def test_watershed_tiled_random(ray_session):
    import ray

    rng = np.random.RandomState(9)
    dem = rng.rand(48, 64) + np.linspace(0, 3, 64)[None, :]
    assert np.array_equal(_tiled_labels(dem, 16, ray),
                          _packed_single(dem))


def test_watershed_tiled_ridge_and_partial(ray_session):
    import ray

    c = np.arange(44, dtype=float)
    dem = np.broadcast_to(-np.abs(c - 13), (30, 44)).copy()
    assert np.array_equal(_tiled_labels(dem, 16, ray),
                          _packed_single(dem))


def test_watershed_tiled_serpentine_log_rounds(ray_session):
    # every cell drains along one 64-hop river: pointer doubling must
    # resolve it (in ~log2 rounds) and label everything with the pit
    import ray

    order = np.zeros((8, 8), dtype=float)
    k = 0
    for r in range(8):
        cols = range(8) if r % 2 == 0 else range(7, -1, -1)
        for c in cols:
            order[r, c] = -k
            k += 1
    assert np.array_equal(_tiled_labels(order, 4, ray),
                          _packed_single(order))


def test_strahler_ramp_orders():
    from rasters_ray.stages.hydrology import strahler_order

    r, c = np.indices((16, 16))
    o = strahler_order(flow_direction((r * 16 + c).astype(float)))
    # columns are order-1 paths; the top-row collector becomes order 2
    # at its first junction (0,14) and stays 2 (single-max parents)
    assert np.all(o[1:, :] == 1) and o[0, 15] == 1
    assert np.all(o[0, :15] == 2)


def test_strahler_dendritic_order3():
    from rasters_ray.stages.hydrology import strahler_order

    fd = np.zeros((7, 7), dtype=np.uint8)
    fd[0, 0] = 2    # SE -> (1,1)
    fd[0, 2] = 8    # SW -> (1,1)
    fd[1, 1] = 2    # SE -> (2,2)
    fd[0, 4] = 2    # SE -> (1,5)
    fd[0, 6] = 8    # SW -> (1,5)
    fd[1, 5] = 8    # SW -> (2,4)
    fd[2, 2] = 1    # E  -> (2,3)
    fd[2, 4] = 16   # W  -> (2,3)
    fd[2, 3] = 4    # S  -> (3,3), the outlet pit
    o = strahler_order(fd)
    assert o[0, 0] == o[0, 2] == o[0, 4] == o[0, 6] == 1
    assert o[1, 1] == o[1, 5] == 1 + 1  # two order-1 parents
    assert o[2, 2] == o[2, 4] == 2      # pass-through keeps the max
    assert o[2, 3] == 3                 # two order-2 parents
    assert o[3, 3] == 3                 # single order-3 parent


def test_flow_length_ramp_both_orientations():
    from rasters_ray.stages.hydrology import flow_length

    r, c = np.indices((16, 16))
    for orient, dem in ((0, r * 16 + c), (1, c * 16 + r)):
        fd = flow_direction(dem.astype(float))
        dl = flow_length(fd)
        ul = flow_length(fd, upstream=True)
        assert np.array_equal(dl, 2 * r + 2 * c)
        if orient == 0:
            expect = np.where(r > 0, 2 * (15 - r), 30 + 2 * (15 - c))
        else:
            expect = np.where(c > 0, 2 * (15 - c), 30 + 2 * (15 - r))
        assert np.array_equal(ul, expect), orient


def test_flow_length_diagonal_weight():
    from rasters_ray.stages.hydrology import flow_length

    fd = np.zeros((6, 6), dtype=np.uint8)
    for i in range(5):
        fd[i, i] = 2  # SE chain down the diagonal
    dl = flow_length(fd)
    ul = flow_length(fd, upstream=True)
    assert dl[0, 0] == 15 and dl[3, 3] == 6  # 3 per diagonal hop
    assert ul[5, 5] == 15 and ul[2, 2] == 6


def test_twi_bins_exact_and_guards():
    from rasters_ray.stages.hydrology import twi_bins

    # T = 8*A/sqrt(S2); thresholds 1,2,4: A=4, S2=64 -> T = 4 -> bin 3
    b = twi_bins(np.array([[3]]), np.array([[8]]), np.array([[0]]),
                 thresholds=(1, 2, 4))
    assert b[0, 0] == 3
    # just below a threshold: A=3, S2=64 -> T=3 -> only t=1,2 pass
    b = twi_bins(np.array([[2]]), np.array([[0]]), np.array([[8]]),
                 thresholds=(1, 2, 4))
    assert b[0, 0] == 2
    # flat -> -1
    assert twi_bins(np.array([[9]]), np.array([[0]]), np.array([[0]]))[0, 0] == -1
    # cell size scales T linearly: doubling cell doubles T
    lo = twi_bins(np.array([[3]]), np.array([[8]]), np.array([[0]]),
                  cell=1, thresholds=(8,))
    hi = twi_bins(np.array([[3]]), np.array([[8]]), np.array([[0]]),
                  cell=2, thresholds=(8,))
    assert lo[0, 0] == 0 and hi[0, 0] == 1
    # float-reference agreement away from exact boundaries
    rng = np.random.default_rng(4)
    acc = rng.integers(0, 100, (20, 20))
    gx = rng.integers(-50, 50, (20, 20))
    gy = rng.integers(-50, 50, (20, 20))
    got = twi_bins(acc, gx, gy, thresholds=(3, 7, 13))
    s2 = gx.astype(float) ** 2 + gy.astype(float) ** 2
    with np.errstate(divide="ignore"):
        T = 8.0 * (acc + 1) / np.sqrt(s2)
    want = np.where(s2 == 0, -1, sum((T >= t) for t in (3, 7, 13)))
    # exclude exact-boundary cells where float sqrt could tip either way
    safe = (s2 == 0) | (np.abs(64 * (acc + 1) ** 2 - 9 * s2) > 1e-6)
    assert (got == want)[safe].all()
    with pytest.raises(ValueError):
        twi_bins(np.zeros((2, 2)), np.zeros((2, 3)), np.zeros((2, 2)))
    with pytest.raises(ValueError):
        twi_bins(np.zeros((2, 2)), np.zeros((2, 2)), np.zeros((2, 2)),
                 thresholds=(4, 2))


def test_corridor_uniform_cost_closed_form():
    from rasters_ray.stages.hydrology import corridor

    ones = np.ones((10, 12), dtype=np.int64)
    sa = np.zeros((10, 12), dtype=bool)
    sb = np.zeros((10, 12), dtype=bool)
    sa[2, 3] = True
    sb[7, 9] = True
    f = corridor(ones, sa, sb)

    def cham(r, c, sr, sc):
        a, b = abs(r - sr), abs(c - sc)
        return 4 * max(a, b) + 2 * min(a, b)

    for r in range(10):
        for c in range(12):
            assert f[r, c] == cham(r, c, 2, 3) + cham(r, c, 7, 9)
    # the corridor minimum equals the A-B chamfer distance and is
    # attained at both endpoints
    assert f.min() == cham(7, 9, 2, 3)
    assert f[2, 3] == f.min() and f[7, 9] == f.min()


def test_corridor_barrier_cost():
    from rasters_ray.stages.hydrology import corridor

    # a high-cost wall forces the corridor around it: min exceeds the
    # uniform-cost chamfer distance
    cost = np.ones((7, 7), dtype=np.int64)
    cost[:6, 3] = 1000
    sa = np.zeros((7, 7), dtype=bool)
    sb = np.zeros((7, 7), dtype=bool)
    sa[0, 0] = True
    sb[0, 6] = True
    f = corridor(cost, sa, sb)
    assert f.min() > 4 * 6  # uniform closed form would be 24
    # every min cell lies on a path through the gap row
    rows = np.argwhere(f == f.min())[:, 0]
    assert rows.max() >= 5


def test_flow_accumulation_weighted_reduces_and_branches():
    from rasters_ray.stages.hydrology import (flow_accumulation,
                                              flow_accumulation_weighted,
                                              flow_direction)

    # weight 1 reproduces unweighted counts on any DEM
    rng = np.random.default_rng(5)
    z = rng.integers(0, 100, (12, 12)).astype(np.float64)
    fd = flow_direction(z)
    ones = np.ones((12, 12), dtype=np.int64)
    assert (flow_accumulation_weighted(fd, ones)
            == flow_accumulation(fd)).all()
    # due-north ramp: weighted acc = strict column suffix sums
    r, _ = np.indices((10, 10))
    fd2 = flow_direction(((r + 2) ** 2).astype(np.float64))
    w = (np.arange(100).reshape(10, 10) % 7).astype(np.int64)
    acc = flow_accumulation_weighted(fd2, w)
    for rr in range(10):
        for cc in range(10):
            assert acc[rr, cc] == w[rr + 1:, cc].sum()
    # converging flow sums both branches: V DEM, both columns drain to
    # the trough column
    zv = np.array([[0, 5, 9, 5, 0]] * 1, dtype=np.float64).repeat(3, 0)
    with pytest.raises(ValueError):
        flow_accumulation_weighted(fd2, w[:5])
    with pytest.raises(ValueError):
        flow_accumulation_weighted(fd2, w + 0.5)
