"""Focal (neighborhood) statistics and whole-corpus pixel reductions.

The reference library has no focal/convolution surface (its raster math
is per-pixel, ``raster.py`` dunders); these operators extend the engine
along the image axis with the neighborhood ops a raster/vision pipeline
needs — focal sums for smoothing/texture, histograms and per-image
moments for normalization stats — expressed Ray-Data-first.

Scale shapes
------------
* ``pixel_histogram``: the combiner runs per BATCH (one int64 bincount
  across every decoded image in the block), so the shuffle moves
  ``n_bins`` rows per block — never pixels.  The final reduce is a
  ``groupby(bin)`` over at most a few hundred keys.
* ``image_moments``: embarrassingly parallel map_batches; one row per
  image, integer-exact (pixel values are integral in the oracle
  fixtures, so sums/sumsq in int64 are bit-stable under any batch
  layout).
* ``focal_stats``: per-image edge-clamped focal sum via an integral
  image (O(px) regardless of radius), NaN-aware; emits a sampled lattice
  of centers so output stays metadata-sized.
* ``focal_halo_tiled``: the DISTRIBUTED shape for rasters too large for
  one task — each tile of the lattice ships ``radius``-wide halo strips
  to its 8 neighbors (a keyed exchange, i.e. one groupby shuffle whose
  payload is O(perimeter), not O(area)), then every tile computes its
  interior independently.  On a 256-node cluster this is the classic
  stencil halo exchange; here tiles of one image stand in for tiles of
  one planet-sized mosaic.  Per-group work is O(tile_px) array math, so
  the ~200 us/group Python walk of Ray's map_groups is amortized (tiles
  are 64 KB-1 MB at production sizes).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from rasters_ray import codec

__all__ = [
    "box_filter_sum",
    "pixel_histogram",
    "image_moments",
    "focal_stats",
    "focal_halo_tiled",
    "halo_exchange_tiled",
    "mode_filter",
    "rank_filter",
    "tophat",
    "adaptive_threshold_bands",
]


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def box_filter_sum(arr: np.ndarray, radius: int) -> tuple:
    """Edge-clamped focal sum over a (2r+1)^2 window, NaN-aware.

    Returns ``(fsum float64, n_nbr int64)`` where ``n_nbr`` counts the
    VALID (finite, inside-array) neighbors of each pixel.  Uses a padded
    integral image, so cost is O(px) for any radius.  For integral
    inputs the sums are exact (int64 accumulation)."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim != 2:
        raise ValueError("box_filter_sum expects a 2D array")
    valid = np.isfinite(a)
    az = np.where(valid, a, 0.0)
    # integer-exact when inputs are integral: accumulate in int64 if safe
    if np.all(az == np.floor(az)) and np.abs(az).max(initial=0.0) < 2**52:
        az_acc = az.astype(np.int64)
    else:
        az_acc = az
    r = int(radius)
    rows, cols = a.shape
    # padded cumulative sums: S[i, j] = sum of az[:i, :j]
    S = np.zeros((rows + 1, cols + 1), dtype=az_acc.dtype)
    np.cumsum(az_acc, axis=0, out=S[1:, 1:])
    np.cumsum(S[1:, 1:], axis=1, out=S[1:, 1:])
    C = np.zeros((rows + 1, cols + 1), dtype=np.int64)
    np.cumsum(valid.astype(np.int64), axis=0, out=C[1:, 1:])
    np.cumsum(C[1:, 1:], axis=1, out=C[1:, 1:])

    i = np.arange(rows)
    j = np.arange(cols)
    r0 = np.clip(i - r, 0, rows)[:, None]
    r1 = np.clip(i + r + 1, 0, rows)[:, None]
    c0 = np.clip(j - r, 0, cols)[None, :]
    c1 = np.clip(j + r + 1, 0, cols)[None, :]

    def window(M):
        return M[r1, c1] - M[r0, c1] - M[r1, c0] + M[r0, c0]

    return window(S).astype(np.float64), window(C)


# ---------------------------------------------------------------------------
# corpus-wide pixel histogram
# ---------------------------------------------------------------------------


def pixel_histogram(
    images_ds,
    n_bins: int = 32,
    lo: float = 0.0,
    hi: float = 256.0,
):
    """Value histogram over every pixel of every image ->
    Dataset[(bin, n_px)].  Out-of-range and NaN pixels are dropped
    (bin edges are [lo + k*w, lo + (k+1)*w), w = (hi-lo)/n_bins).

    Per batch ONE bincount accumulates across all images in the block
    (pre-shuffle combiner: wire volume is n_bins rows per block); the
    final reduce is a low-cardinality groupby."""
    width = (hi - lo) / n_bins

    def partial(t: pa.Table) -> pa.Table:
        counts = np.zeros(n_bins, dtype=np.int64)
        if t.num_rows:
            blobs = codec.BlobReader(t.column("bytes"))
            fmts = t.column("fmt").to_pylist()
            for i in range(t.num_rows):
                px = codec.decode(blobs[i], fmts[i]).ravel()
                px = px[np.isfinite(px)]
                idx = np.floor((px - lo) / width).astype(np.int64)
                ok = (idx >= 0) & (idx < n_bins)
                counts += np.bincount(idx[ok], minlength=n_bins)
        keep = np.flatnonzero(counts)
        return pa.table(
            {
                "bin": pa.array(keep.astype(np.int64), pa.int64()),
                "n_px": pa.array(counts[keep], pa.int64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        b = group.column("bin").slice(0, 1)
        s = int(group.column("n_px").to_numpy(zero_copy_only=False).sum())
        return pa.table({"bin": b, "n_px": pa.array([s], pa.int64())})

    return (
        images_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .map_groups(final, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# per-image moments (normalization statistics)
# ---------------------------------------------------------------------------


def image_moments(images_ds):
    """Per-image valid-pixel stats -> Dataset[(image_id, n_px, sum_value,
    sum_sq, vmin, vmax)].  Sum/sumsq are int64 (exact for integral
    pixels); the downstream normalize stage derives mean/std from them.
    No shuffle — one row out per image."""

    def kernel(t: pa.Table) -> pa.Table:
        ids, n, s, s2, lo_, hi_ = [], [], [], [], [], []
        if t.num_rows:
            blobs = codec.BlobReader(t.column("bytes"))
            fmts = t.column("fmt").to_pylist()
            id_col = t.column("image_id").to_pylist()
            for i in range(t.num_rows):
                px = codec.decode(blobs[i], fmts[i]).ravel()
                px = px[np.isfinite(px)].astype(np.float64)
                ids.append(id_col[i])
                n.append(px.size)
                if px.size:
                    pi = px.astype(np.int64)
                    exact = bool(np.all(px == pi))
                    s.append(int(pi.sum()) if exact else int(px.sum()))
                    s2.append(int((pi * pi).sum()) if exact else int((px * px).sum()))
                    lo_.append(int(px.min()))
                    hi_.append(int(px.max()))
                else:
                    s.append(0)
                    s2.append(0)
                    lo_.append(0)
                    hi_.append(0)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "n_px": pa.array(n, pa.int64()),
                "sum_value": pa.array(s, pa.int64()),
                "sum_sq": pa.array(s2, pa.int64()),
                "vmin": pa.array(lo_, pa.int64()),
                "vmax": pa.array(hi_, pa.int64()),
            }
        )

    return images_ds.map_batches(kernel, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# per-image focal stats (sampled output lattice)
# ---------------------------------------------------------------------------


def _focal_rows(image_id: str, fsum, nnbr, step: int, r_off: int = 0, c_off: int = 0):
    rows, cols = fsum.shape
    rr = np.arange(rows)
    cc = np.arange(cols)
    rsel = rr[(rr + r_off) % step == 0]
    csel = cc[(cc + c_off) % step == 0]
    if not len(rsel) or not len(csel):
        return None
    gr, gc = np.meshgrid(rsel, csel, indexing="ij")
    gr = gr.ravel()
    gc = gc.ravel()
    n = len(gr)
    return {
        "image_id": np.repeat(np.array([image_id], dtype=object), n),
        "r": gr + r_off,
        "c": gc + c_off,
        "n_nbr": nnbr[gr, gc],
        "fsum": fsum[gr, gc].astype(np.int64),
    }


def focal_stats(images_ds, radius: int = 1, step: int = 1):
    """Edge-clamped focal sum per pixel -> Dataset[(image_id, r, c,
    n_nbr, fsum)], emitting only centers on the ``step`` lattice
    (``r % step == 0 and c % step == 0``) so output is sample-sized."""

    def kernel(t: pa.Table) -> pa.Table:
        parts = []
        if t.num_rows:
            blobs = codec.BlobReader(t.column("bytes"))
            fmts = t.column("fmt").to_pylist()
            ids = t.column("image_id").to_pylist()
            for i in range(t.num_rows):
                px = codec.decode(blobs[i], fmts[i])
                fsum, nnbr = box_filter_sum(px, radius)
                rows = _focal_rows(ids[i], fsum, nnbr, step)
                if rows is not None:
                    parts.append(rows)
        if not parts:
            return pa.table(
                {
                    "image_id": pa.array([], pa.string()),
                    "r": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                    "n_nbr": pa.array([], pa.int64()),
                    "fsum": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                k: pa.array(
                    np.concatenate([p[k] for p in parts]),
                    pa.string() if k == "image_id" else pa.int64(),
                )
                for k in ("image_id", "r", "c", "n_nbr", "fsum")
            }
        )

    return images_ds.map_batches(kernel, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# distributed halo-exchange focal (stencil over a tile lattice)
# ---------------------------------------------------------------------------


def halo_exchange_tiled(images_ds, radius: int, tile: int, tile_fn):
    """Generic stencil halo exchange: split every raster into
    ``tile``x``tile`` pieces, ship each piece's ``radius``-wide edge
    strips to the 8 neighboring tiles (ONE groupby shuffle, payload
    O(perimeter) per tile), then run ``tile_fn(image_id, canvas, tr0,
    tc0, trows, tcols) -> pa.Table`` on each tile's NaN-padded canvas
    (shape ``(trows+2R, tcols+2R)``; absent outside-image neighbors stay
    NaN).  Any radius-``R`` stencil (focal sums, Horn gradients,
    morphology) plugs in as ``tile_fn``; the exchange is shared.
    """
    R = int(radius)
    if R >= tile:
        raise ValueError("radius must be < tile")

    def explode(t: pa.Table) -> pa.Table:
        out = {
            "image_id": [],
            "ty": [],
            "tx": [],
            "r0": [],
            "c0": [],
            "rows": [],
            "cols": [],
            "kind": [],
            "blob": [],
        }
        if t.num_rows:
            blobs = codec.BlobReader(t.column("bytes"))
            fmts = t.column("fmt").to_pylist()
            ids = t.column("image_id").to_pylist()
            for i in range(t.num_rows):
                px = np.ascontiguousarray(codec.decode(blobs[i], fmts[i]))
                rows, cols = px.shape
                nty = (rows + tile - 1) // tile
                ntx = (cols + tile - 1) // tile
                for ty in range(nty):
                    for tx in range(ntx):
                        tr0, tc0 = ty * tile, tx * tile
                        tr1, tc1 = min(tr0 + tile, rows), min(tc0 + tile, cols)
                        core = px[tr0:tr1, tc0:tc1]
                        # the core piece, kept by its own tile
                        _emit(out, ids[i], ty, tx, tr0, tc0, core, "core")
                        # halo strips: the R-wide band of THIS tile that
                        # each neighbor needs, keyed to the neighbor
                        for dy in (-1, 0, 1):
                            for dx in (-1, 0, 1):
                                if dy == 0 and dx == 0:
                                    continue
                                ny, nx = ty + dy, tx + dx
                                if not (0 <= ny < nty and 0 <= nx < ntx):
                                    continue
                                # the neighbor above (dy=-1) reaches into MY
                                # top R rows; the one below into my bottom R
                                hr0 = tr0 if dy <= 0 else max(tr1 - R, tr0)
                                hr1 = tr1 if dy >= 0 else min(tr0 + R, tr1)
                                hc0 = tc0 if dx <= 0 else max(tc1 - R, tc0)
                                hc1 = tc1 if dx >= 0 else min(tc0 + R, tc1)
                                if hr0 >= hr1 or hc0 >= hc1:
                                    continue
                                _emit(
                                    out,
                                    ids[i],
                                    ny,
                                    nx,
                                    hr0,
                                    hc0,
                                    px[hr0:hr1, hc0:hc1],
                                    "halo",
                                )
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "ty": pa.array(out["ty"], pa.int64()),
                "tx": pa.array(out["tx"], pa.int64()),
                "r0": pa.array(out["r0"], pa.int64()),
                "c0": pa.array(out["c0"], pa.int64()),
                "rows": pa.array(out["rows"], pa.int64()),
                "cols": pa.array(out["cols"], pa.int64()),
                "kind": pa.array(out["kind"], pa.string()),
                "blob": pa.array(out["blob"], pa.binary()),
            }
        )

    def assemble(group: pa.Table) -> pa.Table:
        kinds = group.column("kind").to_pylist()
        core_i = kinds.index("core")
        gr0 = group.column("r0").to_numpy()
        gc0 = group.column("c0").to_numpy()
        grows = group.column("rows").to_numpy()
        gcols = group.column("cols").to_numpy()
        blobs = codec.BlobReader(group.column("blob"))
        tr0, tc0 = int(gr0[core_i]), int(gc0[core_i])
        trows, tcols = int(grows[core_i]), int(gcols[core_i])
        # NaN-padded canvas: absent (outside-image) neighbors stay NaN and
        # are excluded from n_nbr exactly like the edge-clamped whole path
        canvas = np.full((trows + 2 * R, tcols + 2 * R), np.nan)
        for i in range(group.num_rows):
            piece = codec.decode(blobs[i], "npy")
            pr = int(gr0[i]) - tr0 + R
            pc = int(gc0[i]) - tc0 + R
            canvas[pr : pr + piece.shape[0], pc : pc + piece.shape[1]] = piece
        image_id = group.column("image_id")[0].as_py()
        return tile_fn(image_id, canvas, tr0, tc0, trows, tcols)

    return (
        images_ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["image_id", "ty", "tx"])
        .map_groups(assemble, batch_format="pyarrow")
    )


def focal_halo_tiled(images_ds, radius: int = 1, step: int = 1, tile: int = 32):
    """Same result as :func:`focal_stats`, computed the way a
    planet-sized mosaic would have to — a :func:`halo_exchange_tiled`
    stencil whose per-tile kernel is the edge-clamped focal sum.

    A pytest asserts bit-equality with the single-task path; the
    contract query runs THIS path so the oracle validates the exchange.
    """
    R = int(radius)

    def tile_fn(image_id, canvas, tr0, tc0, trows, tcols) -> pa.Table:
        fsum, nnbr = box_filter_sum(canvas, R)
        # interior = the core region; its windows never touch canvas edges
        fs = fsum[R : R + trows, R : R + tcols]
        nn = nnbr[R : R + trows, R : R + tcols]
        rows = _focal_rows(image_id, fs, nn, step, r_off=tr0, c_off=tc0)
        if rows is None:
            return pa.table(
                {
                    "image_id": pa.array([], pa.string()),
                    "r": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                    "n_nbr": pa.array([], pa.int64()),
                    "fsum": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                k: pa.array(v, pa.string() if k == "image_id" else pa.int64())
                for k, v in rows.items()
            }
        )

    return halo_exchange_tiled(images_ds, radius=R, tile=tile, tile_fn=tile_fn)


def _emit(out: dict, image_id, ty, tx, r0, c0, piece: np.ndarray, kind: str) -> None:
    out["image_id"].append(image_id)
    out["ty"].append(ty)
    out["tx"].append(tx)
    out["r0"].append(int(r0))
    out["c0"].append(int(c0))
    out["rows"].append(int(piece.shape[0]))
    out["cols"].append(int(piece.shape[1]))
    out["kind"].append(kind)
    out["blob"].append(codec.encode(np.ascontiguousarray(piece), "npy"))


def mode_filter(labels: np.ndarray, n_labels: int) -> np.ndarray:
    """3x3 majority (mode) filter for a label raster — the ArcGIS
    Majority Filter / GRASS r.neighbors mode smoothing used to clean
    classifier speckle.  Deterministic rule: the window winner is the
    label with the highest count over the in-raster cells of the 3x3
    window; the CENTER keeps its label when it attains the maximum
    count (so ties never flip a cell), otherwise the smallest
    tied label wins.  Labels must be ints in ``[0, n_labels)``.

    Vectorized one pass per label value: count = sum of 9 shifted
    equality masks (edge cells see only their in-raster neighbors)."""
    lv = np.asarray(labels)
    if lv.ndim != 2:
        raise ValueError("labels must be 2D")
    if lv.min() < 0 or lv.max() >= n_labels:
        raise ValueError("labels outside [0, n_labels)")
    h, w = lv.shape
    center = lv.astype(np.int64)
    best_cnt = np.zeros((h, w), dtype=np.int64)
    best_lab = np.zeros((h, w), dtype=np.int64)
    own_cnt = np.zeros((h, w), dtype=np.int64)
    pad = np.full((h + 2, w + 2), -1, dtype=np.int64)
    pad[1:-1, 1:-1] = lv
    for val in range(n_labels):
        m = (pad == val).astype(np.int64)
        cnt = (m[:-2, :-2] + m[:-2, 1:-1] + m[:-2, 2:]
               + m[1:-1, :-2] + m[1:-1, 1:-1] + m[1:-1, 2:]
               + m[2:, :-2] + m[2:, 1:-1] + m[2:, 2:])
        take = cnt > best_cnt  # strict: smallest label wins ties
        best_cnt[take] = cnt[take]
        best_lab[take] = val
        mine = center == val
        own_cnt[mine] = cnt[mine]
    # center keeps its label when its own count attains the maximum
    return np.where(own_cnt == best_cnt, center, best_lab)


def rank_filter(canvas: np.ndarray) -> tuple:
    """3x3 order-statistic filters over a padded array (same 1-ring
    convention as ``terrain.horn_numerators``): returns
    ``(median, minimum, maximum, valid)`` of shape ``canvas.shape - 2``.

    ``median`` is the 5th order statistic of the 9-cell window (the
    classic salt-and-pepper median filter); ``minimum`` / ``maximum``
    are greyscale morphological erosion / dilation with the full 3x3
    structuring element.  All int64-exact for integral pixels — order
    statistics involve no arithmetic, so results are bit-stable under
    any tiling.  ``valid`` is True only where all 9 cells are finite."""
    a = np.asarray(canvas, dtype=np.float64)
    if a.ndim != 2 or a.shape[0] < 3 or a.shape[1] < 3:
        raise ValueError("rank_filter expects a 2D array >= 3x3")
    h, w = a.shape[0] - 2, a.shape[1] - 2
    stack = np.stack([a[i:i + h, j:j + w]
                      for i in range(3) for j in range(3)])
    valid = np.isfinite(stack).all(axis=0)
    s = np.sort(np.where(np.isfinite(stack), stack, 0.0).astype(np.int64),
                axis=0)
    return s[4], s[0], s[8], valid


def tophat(canvas: np.ndarray) -> tuple:
    """Grayscale morphological top-hat transforms with the full 3x3
    structuring element (the classic background-removal / dark-spot
    detectors; scipy.ndimage white_tophat / black_tophat semantics):

    * white = a - opening(a)   where opening  = dilate(erode(a))
    * black = closing(a) - a   where closing  = erode(dilate(a))

    Both are >= 0 by construction.  Two chained window passes shrink
    the valid region by 2 on each side, so for an (H, W) canvas the
    returned arrays are (H-4, W-4) aligned to ``canvas[2:-2, 2:-2]``.
    Order statistics only — int64-exact for integral pixels, bit-stable
    under any tiling (the distributed form is ``halo_exchange_tiled``
    with radius 2)."""
    a = np.asarray(canvas)
    if a.ndim != 2 or a.shape[0] < 5 or a.shape[1] < 5:
        raise ValueError("tophat expects a 2D array >= 5x5")
    if not np.issubdtype(a.dtype, np.integer):
        if not np.all(np.isfinite(a)) or np.any(a != np.rint(a)):
            raise ValueError("tophat requires integral pixels")
    a = a.astype(np.int64)

    def _win(x, f):
        h, w = x.shape[0] - 2, x.shape[1] - 2
        return f(np.stack([x[i:i + h, j:j + w]
                           for i in range(3) for j in range(3)]), axis=0)

    center = a[2:-2, 2:-2]
    white = center - _win(_win(a, np.min), np.max)
    black = _win(_win(a, np.max), np.min) - center
    return white, black


def adaptive_threshold_bands(images_ds, radius: int = 3, c: int = 2,
                             band: int = 10, transform=None):
    """Adaptive mean thresholding (the OpenCV ADAPTIVE_THRESH_MEAN_C
    binarization), integer-exact: pixel fires iff

        (v - c) * n_w > sum_w

    — the cross-multiplied form of ``v > window_mean + c`` over the
    edge-clamped (2r+1)^2 window (``n_w`` counts in-bounds neighbors).
    Window sums come from the O(px) integral image
    (:func:`box_filter_sum`); output is the fired-pixel count per
    ``band``-row stripe -> Dataset[(image_id, band, n_set)].  SQL
    replays the window with a 49-offset equality join whose missing
    out-of-bounds rows reproduce the clamping."""
    from rasters_ray import codec

    def run(t: pa.Table) -> pa.Table:
        out = {k: [] for k in ("image_id", "band", "n_set")}
        for i in range(t.num_rows):
            px = codec.decode(t.column("bytes")[i].as_py(),
                              t.column("fmt")[i].as_py())
            z = np.rint(px).astype(np.int64)
            if transform is not None:
                z = transform(z)
            fsum, n = box_filter_sum(z, radius)
            fired = (z - c) * n > fsum.astype(np.int64)
            bands = np.arange(z.shape[0]) // band
            n_bands = int(bands[-1]) + 1
            cnt = np.bincount(np.repeat(bands, z.shape[1]),
                              weights=fired.ravel(),
                              minlength=n_bands).astype(np.int64)
            out["image_id"].extend(
                [t.column("image_id")[i].as_py()] * n_bands)
            out["band"].extend(range(n_bands))
            out["n_set"].extend(cnt.tolist())
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "band": pa.array(out["band"], pa.int64()),
                "n_set": pa.array(out["n_set"], pa.int64()),
            }
        )

    return images_ds.map_batches(run, batch_format="pyarrow")
