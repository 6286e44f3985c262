"""Vector-geometry measures and transforms over polygon/line tables:
planar area, perimeter, area-weighted centroid, bounds, convex hull
(Andrew monotone chain) and Douglas-Peucker simplification.

Reference parity: the reference reaches all of these through shapely —
``Polygon.centroid``/``bounds`` (rasters/polygon.py:51,92),
``VectorGeometry.to_shapely`` exposes ``.area``/``.length``/
``.convex_hull``/``.simplify`` (rasters/vector_geometry.py:96) — i.e.
single-process GEOS. Here each measure is a closed-form numpy kernel
applied per feature inside one ``map_batches`` stage: no shuffle, no
shared state, scale-linear in features.

Ring semantics follow the engine's vector schema (exterior-first part
lists, even-odd fill like stages/pip.py): a ring is classified a HOLE
when its first vertex falls inside an odd number of the feature's
other rings, so area = sum(outer) - sum(holes) matches the even-odd
rasterization exactly, independent of ring winding order (shapefile
and GeoJSON disagree on winding in the wild).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa

from .pip import point_in_ring


def ring_signed_area(pts: np.ndarray) -> float:
    """Shoelace signed area of one ring (closed or open; the closing
    edge is implied). Positive = counter-clockwise."""
    x = pts[:, 0]
    y = pts[:, 1]
    # cross-sum with the wraparound edge; np.roll keeps one fixed
    # IEEE evaluation order (bit-deterministic across runs)
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def ring_length(pts: np.ndarray, closed: bool = True) -> float:
    d = np.diff(pts, axis=0)
    total = float(np.sum(np.hypot(d[:, 0], d[:, 1])))
    if closed and not np.array_equal(pts[0], pts[-1]):
        total += float(np.hypot(pts[0, 0] - pts[-1, 0],
                                pts[0, 1] - pts[-1, 1]))
    return total


def classify_holes(rings: List[np.ndarray]) -> List[bool]:
    """True per ring when it is a hole under even-odd semantics: its
    first vertex lies inside an odd number of the OTHER rings."""
    out = []
    for i, r in enumerate(rings):
        px = np.array([r[0, 0]])
        py = np.array([r[0, 1]])
        depth = 0
        for j, other in enumerate(rings):
            if j != i and point_in_ring(px, py, other)[0]:
                depth += 1
        out.append(depth % 2 == 1)
    return out


def polygon_measures(rings: List[np.ndarray]) -> Tuple[float, float, float, float]:
    """One feature's ring list -> (area, perimeter, centroid_x,
    centroid_y). Area/centroid are hole-aware (holes subtract);
    perimeter counts every ring boundary (GEOS ``length`` parity)."""
    holes = classify_holes(rings)
    area = 0.0
    perim = 0.0
    mx = 0.0  # area-weighted first moments
    my = 0.0
    for r, is_hole in zip(rings, holes):
        a = abs(ring_signed_area(r))
        sgn = -1.0 if is_hole else 1.0
        area += sgn * a
        perim += ring_length(r)
        x = r[:, 0]
        y = r[:, 1]
        xn = np.roll(x, -1)
        yn = np.roll(y, -1)
        cross = x * yn - xn * y
        # standard polygon centroid: (1/6A) sum (xi+xi+1)cross —
        # normalize the ring's own signed orientation so holes
        # subtract regardless of stored winding
        s = ring_signed_area(r)
        osgn = 1.0 if s >= 0 else -1.0
        mx += sgn * osgn * float(np.sum((x + xn) * cross)) / 6.0
        my += sgn * osgn * float(np.sum((y + yn) * cross)) / 6.0
    if area == 0.0:
        # degenerate: fall back to vertex mean of the first ring
        r0 = rings[0]
        return 0.0, perim, float(r0[:, 0].mean()), float(r0[:, 1].mean())
    return area, perim, mx / area, my / area


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain -> CCW closed hull ring (k+1, 2).
    Collinear points are dropped (GEOS convention)."""
    p = np.unique(pts.reshape(-1, 2), axis=0)  # lexicographic sort
    if len(p) <= 2:
        return np.vstack([p, p[:1]])

    def half(points) -> List[np.ndarray]:
        out: List[np.ndarray] = []
        for q in points:
            while len(out) >= 2:
                o, a = out[-2], out[-1]
                if (a[0] - o[0]) * (q[1] - o[1]) - (a[1] - o[1]) * (q[0] - o[0]) <= 0:
                    out.pop()
                else:
                    break
            out.append(q)
        return out

    lower = half(p)
    upper = half(p[::-1])
    hull = np.array(lower[:-1] + upper[:-1], dtype=np.float64)
    return np.vstack([hull, hull[:1]])


def simplify_ring(pts: np.ndarray, tol: float, closed: bool = True) -> np.ndarray:
    """Douglas-Peucker with an explicit stack (no recursion limits).
    Closed rings anchor at the first vertex and the farthest-from-it
    vertex so the result stays a ring (shapely ``simplify`` parity,
    preserve_topology=False semantics)."""
    p = np.asarray(pts, dtype=np.float64)
    if closed and np.array_equal(p[0], p[-1]):
        p = p[:-1]
    n = len(p)
    if n <= (3 if closed else 2):
        return np.vstack([p, p[:1]]) if closed else p
    keep = np.zeros(n, dtype=bool)
    if closed:
        far = int(np.argmax(np.hypot(p[:, 0] - p[0, 0], p[:, 1] - p[0, 1])))
        anchors = [(0, far), (far, n - 1)]
        keep[[0, far, n - 1]] = True
    else:
        anchors = [(0, n - 1)]
        keep[[0, n - 1]] = True
    stack = list(anchors)
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = p[j] - p[i]
        mid = p[i + 1:j]
        L = np.hypot(seg[0], seg[1])
        if L == 0.0:
            d = np.hypot(mid[:, 0] - p[i, 0], mid[:, 1] - p[i, 1])
        else:
            d = np.abs(seg[0] * (p[i, 1] - mid[:, 1])
                       - seg[1] * (p[i, 0] - mid[:, 0])) / L
        kmax = int(np.argmax(d))
        if d[kmax] > tol:
            k = i + 1 + kmax
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    out = p[keep]
    return np.vstack([out, out[:1]]) if closed else out


# ---------------------------------------------------- dataset stages

def _cell_to_arrays(cell) -> List[np.ndarray]:
    return [np.array([(q["x"], q["y"]) for q in part], dtype=np.float64)
            for part in cell]


def _arrays_to_cell(parts: List[np.ndarray]) -> list:
    return [[{"x": float(x), "y": float(y)} for x, y in part]
            for part in parts]


def geometry_stats(ds):
    """Polygons/lines dataset -> per-feature measures. Polygon rows
    (``rings``) gain area/perimeter/centroid_x/centroid_y/xmin/ymin/
    xmax/ymax; line rows (``paths``) gain length + bounds (area 0).
    One vectorized-per-feature map stage; nothing shuffles."""

    def stats(batch: pa.Table) -> pa.Table:
        geom_col = "rings" if "rings" in batch.column_names else "paths"
        is_poly = geom_col == "rings"
        n = batch.num_rows
        area = np.zeros(n)
        perim = np.zeros(n)
        cx = np.zeros(n)
        cy = np.zeros(n)
        bounds = np.zeros((n, 4))
        for i, cell in enumerate(batch.column(geom_col).to_pylist()):
            parts = _cell_to_arrays(cell)
            allpts = np.vstack(parts)
            bounds[i] = (allpts[:, 0].min(), allpts[:, 1].min(),
                         allpts[:, 0].max(), allpts[:, 1].max())
            if is_poly:
                area[i], perim[i], cx[i], cy[i] = polygon_measures(parts)
            else:
                perim[i] = sum(ring_length(p, closed=False) for p in parts)
                cx[i] = allpts[:, 0].mean()
                cy[i] = allpts[:, 1].mean()
        out = batch
        for name, col in (("area", area), ("perimeter", perim),
                          ("centroid_x", cx), ("centroid_y", cy),
                          ("xmin", bounds[:, 0]), ("ymin", bounds[:, 1]),
                          ("xmax", bounds[:, 2]), ("ymax", bounds[:, 3])):
            out = out.append_column(name, pa.array(col, pa.float64()))
        return out

    return ds.map_batches(stats, batch_format="pyarrow")


def simplify_polygons(ds, tol: float):
    """Douglas-Peucker every ring/path; geometry column shape is
    preserved. Per-feature map stage, no shuffle."""

    def run(batch: pa.Table) -> pa.Table:
        geom_col = "rings" if "rings" in batch.column_names else "paths"
        closed = geom_col == "rings"
        idx = batch.column_names.index(geom_col)
        cells = [
            _arrays_to_cell([simplify_ring(p, tol, closed=closed)
                             for p in _cell_to_arrays(cell)])
            for cell in batch.column(geom_col).to_pylist()
        ]
        from ..sources.vectors import RING_TYPE

        return batch.set_column(idx, geom_col, pa.array(cells, RING_TYPE))

    return ds.map_batches(run, batch_format="pyarrow")


def reproject_vectors(ds, dst_crs: str):
    """``VectorGeometry.to_crs`` as a dataset stage (reference:
    rasters/vector_geometry.py:59 — geopandas ``to_crs`` per
    geometry). Points transform x/y directly; rings/paths flatten the
    WHOLE batch's coordinates through the Arrow list offsets into one
    (N, 2) array, make ONE ``transform_xy`` call, and rebuild the
    nested lists zero-copy from the same offsets — no per-feature
    Python loop. Batches may mix source CRSs (grouped per unique crs
    value); the crs column is rewritten to ``dst_crs``."""
    from ..proj import transform_xy

    def run(batch: pa.Table) -> pa.Table:
        crs_vals = batch.column("crs").to_numpy(zero_copy_only=False)
        out = batch
        if "x" in batch.column_names:
            x = batch.column("x").to_numpy().copy()
            y = batch.column("y").to_numpy().copy()
            for src in np.unique(crs_vals):
                sel = crs_vals == src
                if src != dst_crs:
                    x[sel], y[sel] = transform_xy(x[sel], y[sel],
                                                  str(src), dst_crs)
            out = out.set_column(out.column_names.index("x"), "x",
                                 pa.array(x, pa.float64()))
            out = out.set_column(out.column_names.index("y"), "y",
                                 pa.array(y, pa.float64()))
        else:
            geom_col = ("rings" if "rings" in batch.column_names
                        else "paths")
            if len(np.unique(crs_vals)) != 1:
                raise ValueError(
                    "mixed-CRS polygon batches are not supported; "
                    "repartition by crs first")
            src = str(crs_vals[0])
            lc = batch.column(geom_col).combine_chunks()
            inner = lc.values  # list<struct> array
            pts = inner.values  # struct array
            x = pts.field("x").to_numpy()
            y = pts.field("y").to_numpy()
            if src != dst_crs:
                x, y = transform_xy(x, y, src, dst_crs)
            new_pts = pa.StructArray.from_arrays(
                [pa.array(np.ascontiguousarray(x), pa.float64()),
                 pa.array(np.ascontiguousarray(y), pa.float64())],
                ["x", "y"])
            new_inner = pa.ListArray.from_arrays(inner.offsets, new_pts)
            new_lc = pa.ListArray.from_arrays(lc.offsets, new_inner)
            out = batch.set_column(
                batch.column_names.index(geom_col), geom_col, new_lc)
        idx = out.column_names.index("crs")
        return out.set_column(
            idx, "crs", pa.array([dst_crs] * out.num_rows, pa.string()))

    return ds.map_batches(run, batch_format="pyarrow")


def convex_hulls(ds):
    """Per-feature convex hull: rings/paths collapse to one hull ring
    (output column is always ``rings`` — a hull is a polygon)."""

    def run(batch: pa.Table) -> pa.Table:
        from ..sources.vectors import RING_TYPE

        geom_col = "rings" if "rings" in batch.column_names else "paths"
        cells = [
            _arrays_to_cell([convex_hull(np.vstack(_cell_to_arrays(cell)))])
            for cell in batch.column(geom_col).to_pylist()
        ]
        idx = batch.column_names.index(geom_col)
        out = batch.set_column(idx, geom_col, pa.array(cells, RING_TYPE))
        if geom_col == "paths":
            names = ["rings" if c == "paths" else c for c in out.column_names]
            out = out.rename_columns(names)
        return out

    return ds.map_batches(run, batch_format="pyarrow")


def clip_ring_bbox(pts: np.ndarray, x0: float, y0: float,
                   x1: float, y1: float) -> np.ndarray:
    """Sutherland-Hodgman clip of one closed ring against an
    axis-aligned box -> closed ring (possibly empty). Axis-aligned
    half-planes keep the intersection vertices exact when the input
    edge is axis-parallel (new vertex coordinates copy the boundary
    and the crossing edge's other ordinate)."""
    p = pts if not np.array_equal(pts[0], pts[-1]) else pts[:-1]

    def clip_half(poly, axis: int, bound: float, keep_le: bool):
        if len(poly) == 0:
            return poly
        out = []
        n = len(poly)
        for i in range(n):
            a = poly[i]
            b = poly[(i + 1) % n]
            a_in = a[axis] <= bound if keep_le else a[axis] >= bound
            b_in = b[axis] <= bound if keep_le else b[axis] >= bound
            if a_in:
                out.append(a)
            if a_in != b_in:
                t = (bound - a[axis]) / (b[axis] - a[axis])
                q = a + t * (b - a)
                q[axis] = bound  # exact on the boundary
                out.append(q)
        return np.array(out) if out else np.empty((0, 2))

    p = clip_half(p, 0, x1, True)
    p = clip_half(p, 0, x0, False)
    p = clip_half(p, 1, y1, True)
    p = clip_half(p, 1, y0, False)
    if len(p) < 3 or abs(ring_signed_area(p)) == 0.0:
        return np.empty((0, 2))
    return np.vstack([p, p[:1]])


def clip_polygons(ds, bounds):
    """Clip every feature to an axis-aligned box (gpd.clip parity).
    Each ring clips independently — intersection with a convex region
    distributes over the even-odd symmetric difference, so hole
    semantics survive; empty rings drop, featureless rows drop. One
    map stage, no shuffle."""
    x0, y0, x1, y1 = (float(v) for v in bounds)

    def run(batch: pa.Table) -> pa.Table:
        from ..sources.vectors import RING_TYPE

        geom_col = "rings" if "rings" in batch.column_names else "paths"
        keep_rows = []
        cells_out = []
        for i, cell in enumerate(batch.column(geom_col).to_pylist()):
            parts = []
            for part in _cell_to_arrays(cell):
                c = clip_ring_bbox(part, x0, y0, x1, y1)
                if len(c):
                    parts.append(c)
            if parts:
                keep_rows.append(i)
                cells_out.append(_arrays_to_cell(parts))
        out = batch.take(pa.array(keep_rows, pa.int64()))
        idx = out.column_names.index(geom_col)
        return out.set_column(idx, geom_col,
                              pa.array(cells_out, RING_TYPE))

    return ds.map_batches(run, batch_format="pyarrow")


# ------------------------------------------------------- line ops

def _concat_parts(parts: List[np.ndarray]) -> np.ndarray:
    """Multi-part path -> one vertex chain (parts joined in order,
    shapely line_merge convention for measure operations)."""
    if len(parts) == 1:
        return parts[0]
    chain = [parts[0]]
    for p in parts[1:]:
        chain.append(p[1:] if np.array_equal(chain[-1][-1], p[0]) else p)
    return np.vstack(chain)


def _cumlen(pts: np.ndarray) -> np.ndarray:
    d = np.diff(pts, axis=0)
    return np.concatenate([[0.0], np.cumsum(np.hypot(d[:, 0], d[:, 1]))])


def line_interpolate(parts: List[np.ndarray], dist: float) -> Tuple[float, float]:
    """Point at arc distance ``dist`` along the path (shapely
    ``interpolate`` parity: clamped to [0, length]; an exactly-on-
    vertex distance returns the vertex coordinates bit-exactly)."""
    pts = _concat_parts(parts)
    cl = _cumlen(pts)
    d = min(max(float(dist), 0.0), float(cl[-1]))
    i = int(np.searchsorted(cl, d, side="right") - 1)
    i = min(i, len(pts) - 2)
    if d == cl[i]:
        return float(pts[i, 0]), float(pts[i, 1])
    seg = cl[i + 1] - cl[i]
    t = (d - cl[i]) / seg
    return (float(pts[i, 0] + t * (pts[i + 1, 0] - pts[i, 0])),
            float(pts[i, 1] + t * (pts[i + 1, 1] - pts[i, 1])))


def line_locate(parts: List[np.ndarray], x: float, y: float) -> float:
    """Arc distance of the nearest point on the path to (x, y)
    (shapely ``project`` parity). Vectorized over all segments."""
    pts = _concat_parts(parts)
    a = pts[:-1]
    b = pts[1:]
    ab = b - a
    ap = np.array([x, y])[None, :] - a
    den = np.einsum("ij,ij->i", ab, ab)
    t = np.where(den > 0, np.einsum("ij,ij->i", ap, ab) / np.where(den > 0, den, 1.0), 0.0)
    t = np.clip(t, 0.0, 1.0)
    proj = a + t[:, None] * ab
    d2 = (proj[:, 0] - x) ** 2 + (proj[:, 1] - y) ** 2
    i = int(np.argmin(d2))  # first minimum: deterministic on ties
    cl = _cumlen(pts)
    seg = np.sqrt(den[i])
    return float(cl[i] + t[i] * seg)


def line_substring(parts: List[np.ndarray], d0: float, d1: float) -> np.ndarray:
    """Sub-polyline between arc distances (shapely ``substring``
    parity, d0 <= d1, clamped)."""
    pts = _concat_parts(parts)
    cl = _cumlen(pts)
    total = float(cl[-1])
    d0 = min(max(float(d0), 0.0), total)
    d1 = min(max(float(d1), 0.0), total)
    if d1 < d0:
        d0, d1 = d1, d0
    p0 = line_interpolate(parts, d0)
    p1 = line_interpolate(parts, d1)
    mid = pts[(cl > d0) & (cl < d1)]
    out = [np.array(p0, dtype=np.float64)[None, :]]
    if len(mid):
        out.append(mid)
    out.append(np.array(p1, dtype=np.float64)[None, :])
    res = np.vstack(out)
    keep = np.ones(len(res), dtype=bool)
    keep[1:] = np.any(res[1:] != res[:-1], axis=1)
    return res[keep]


def raster_profile(arr: np.ndarray, grid, parts: List[np.ndarray],
                   step: float, method: str = "nearest") -> pa.Table:
    """Elevation-profile extraction: sample the raster at stations
    every ``step`` arc units along the path (plus the endpoint) —
    the gdallocationinfo-along-a-line recipe. ``nearest`` uses the
    grid's round-half-even index_point rule; ``bilinear`` interpolates
    the four surrounding CENTERS. Out-of-grid stations yield NaN."""
    pts = _concat_parts(parts)
    cl = _cumlen(pts)
    total = float(cl[-1])
    n = int(np.floor(total / step))
    dists = [i * step for i in range(n + 1)]
    if dists[-1] != total:
        dists.append(total)
    xs = np.empty(len(dists))
    ys = np.empty(len(dists))
    for i, d in enumerate(dists):
        xs[i], ys[i] = line_interpolate(parts, d)
    # fractional center-lattice coordinates
    fc = (xs - grid.x_origin) / grid.cell_width - 0.5
    fr = (ys - grid.y_origin) / grid.cell_height - 0.5
    vals = np.full(len(dists), np.nan)
    if method == "nearest":
        rr = np.rint(fr).astype(np.int64)
        cc = np.rint(fc).astype(np.int64)
        ok = (rr >= 0) & (rr < grid.rows) & (cc >= 0) & (cc < grid.cols)
        vals[ok] = arr[rr[ok], cc[ok]]
    elif method == "bilinear":
        r0 = np.floor(fr).astype(np.int64)
        c0 = np.floor(fc).astype(np.int64)
        tr = fr - r0
        tc = fc - c0
        ok = (r0 >= 0) & (r0 + 1 < grid.rows) & (c0 >= 0) & (c0 + 1 < grid.cols)
        r0k, c0k, trk, tck = r0[ok], c0[ok], tr[ok], tc[ok]
        v00 = arr[r0k, c0k]
        v01 = arr[r0k, c0k + 1]
        v10 = arr[r0k + 1, c0k]
        v11 = arr[r0k + 1, c0k + 1]
        vals[ok] = ((1 - tr[ok]) * ((1 - tck) * v00 + tck * v01)
                    + trk * ((1 - tck) * v10 + tck * v11))
    else:
        raise ValueError(f"unknown profile method {method!r}")
    return pa.table({
        "station": pa.array(np.asarray(dists, dtype=np.float64),
                            pa.float64()),
        "x": pa.array(xs, pa.float64()),
        "y": pa.array(ys, pa.float64()),
        "value": pa.array(vals, pa.float64()),
    })


def segments_intersect(a0, a1, b0, b1) -> np.ndarray:
    """Vectorized proper-or-touching segment intersection test between
    segment arrays A (a0->a1) and B (b0->b1), broadcast to a (nA, nB)
    bool matrix — the classic orientation predicate (CLRS 33.1 /
    Shamos-Hoey primitive), pure integer cross products for integer
    endpoints so the result is exact (collinear touching counts).

    Each a* / b* is an (n, 2) int array."""
    A0 = np.asarray(a0, dtype=np.int64)[:, None, :]
    A1 = np.asarray(a1, dtype=np.int64)[:, None, :]
    B0 = np.asarray(b0, dtype=np.int64)[None, :, :]
    B1 = np.asarray(b1, dtype=np.int64)[None, :, :]

    def cross(o, p, q):
        return ((p[..., 0] - o[..., 0]) * (q[..., 1] - o[..., 1])
                - (p[..., 1] - o[..., 1]) * (q[..., 0] - o[..., 0]))

    d1 = cross(B0, B1, A0)
    d2 = cross(B0, B1, A1)
    d3 = cross(A0, A1, B0)
    d4 = cross(A0, A1, B1)
    proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) & \
             (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))

    def on_seg(o, p, q, d):
        # q collinear with o->p (d == 0) and within the bounding box
        return ((d == 0)
                & (np.minimum(o[..., 0], p[..., 0]) <= q[..., 0])
                & (q[..., 0] <= np.maximum(o[..., 0], p[..., 0]))
                & (np.minimum(o[..., 1], p[..., 1]) <= q[..., 1])
                & (q[..., 1] <= np.maximum(o[..., 1], p[..., 1])))

    touch = (on_seg(B0, B1, A0, d1) | on_seg(B0, B1, A1, d2)
             | on_seg(A0, A1, B0, d3) | on_seg(A0, A1, B1, d4))
    return proper | touch
