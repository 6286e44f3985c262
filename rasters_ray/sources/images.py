"""Deterministic synthetic image+caption table (Lance schema, Parquet
stand-in) — the engine's primary input per BASELINE.json input_hint:

    image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
    caption:string, phash:int64,
    grid:struct<crs,x_origin,y_origin,cell_width,cell_height,rows,cols>

Two profiles (seed=42 everywhere, FIXTURES.md §1-2):

- ``fixtures``: random uint8 pixels, grid origins jittered on a 0.5 deg
  lattice over [-125,-110] x [30,45], a 30% skew cluster sharing one 1 deg
  cell, a few antimeridian straddlers, ~1% duplicated phash rows, one 1x1
  degenerate image.
- ``oracle``: images aligned to the global 0.01 deg lattice with formula
  pixels ``(d*31 + r*7 + c*13) % 251`` so a DuckDB oracle can recompute
  every pixel from SQL — used by the driver correctness gate.

Generation is expressed as a Ray Data pipeline (range -> map_batches) so
the bench-scale table streams; the per-batch maker is also callable
directly for small pytest fixtures.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pyarrow as pa

from .. import codec

GRID_STRUCT = pa.struct(
    [
        ("crs", pa.string()),
        ("x_origin", pa.float64()),
        ("y_origin", pa.float64()),
        ("cell_width", pa.float64()),
        ("cell_height", pa.float64()),
        ("rows", pa.int32()),
        ("cols", pa.int32()),
    ]
)

IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("grid", GRID_STRUCT),
    ]
)


def average_hash(arr: np.ndarray) -> int:
    """64-bit average hash: block-mean to 8x8, threshold at the mean
    (deterministic pHash stand-in, FIXTURES.md §1)."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim != 2:
        a = a.reshape(a.shape[-2], a.shape[-1])
    h, w = a.shape
    # block-mean resize to 8x8 via index binning (works for any h, w >= 1)
    ri = np.minimum((np.arange(8) * h) // 8, h - 1)
    ci = np.minimum((np.arange(8) * w) // 8, w - 1)
    re = np.append(ri[1:], h)
    ce = np.append(ci[1:], w)
    small = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            small[i, j] = a[ri[i] : max(re[i], ri[i] + 1), ci[j] : max(ce[j], ci[j] + 1)].mean()
    bits = (small > small.mean()).ravel()
    val = np.uint64(0)
    for b in bits:
        val = np.uint64(val << np.uint64(1)) | np.uint64(bool(b))
    return int(val.astype(np.int64))


# ---------------------------------------------------------------------------
# oracle profile — SQL-recomputable pixels + grids
# ---------------------------------------------------------------------------

ORACLE_CELL = 0.01
ORACLE_ROWS = 100
ORACLE_COLS = 100


def oracle_grid_origin(d: int) -> tuple:
    """Image d sits on a 0.5 deg lattice: 16 columns x any rows.
    Exact in float64: 0.5 and 0.01 multiples of integers stay consistent
    with the SQL recomputation (integer lattice, see oracle_sql)."""
    x0 = -124.0 + (d % 16) * 0.5
    y0 = 44.0 - ((d // 16) % 16) * 0.5
    return x0, y0


def oracle_pixels(d: int, rows: int = ORACLE_ROWS, cols: int = ORACLE_COLS) -> np.ndarray:
    r = np.arange(rows).reshape(-1, 1)
    c = np.arange(cols).reshape(1, -1)
    return ((d * 31 + r * 7 + c * 13) % 251).astype(np.float32)


def make_oracle_images(ids: np.ndarray, fmt: str = "npy") -> pa.Table:
    """One image per integer id (doc-aligned); formula pixels."""
    out: Dict[str, list] = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
    grids = []
    for d in np.asarray(ids, dtype=np.int64):
        d = int(d)
        px = oracle_pixels(d)
        x0, y0 = oracle_grid_origin(d)
        out["image_id"].append(f"img{d:08d}")
        out["bytes"].append(codec.encode(px, fmt))
        out["w"].append(ORACLE_COLS)
        out["h"].append(ORACLE_ROWS)
        out["fmt"].append(fmt)
        out["caption"].append(f"synthetic scene {d} at ({x0:.2f},{y0:.2f})")
        out["phash"].append(average_hash(px))
        grids.append(
            {
                "crs": "EPSG:4326",
                "x_origin": x0,
                "y_origin": y0,
                "cell_width": ORACLE_CELL,
                "cell_height": -ORACLE_CELL,
                "rows": ORACLE_ROWS,
                "cols": ORACLE_COLS,
            }
        )
    return pa.Table.from_pydict(
        {
            "image_id": pa.array(out["image_id"], pa.string()),
            "bytes": pa.array(out["bytes"], pa.binary()),
            "w": pa.array(out["w"], pa.int32()),
            "h": pa.array(out["h"], pa.int32()),
            "fmt": pa.array(out["fmt"], pa.string()),
            "caption": pa.array(out["caption"], pa.string()),
            "phash": pa.array(out["phash"], pa.int64()),
            "grid": pa.array(grids, GRID_STRUCT),
        }
    )


# ---------------------------------------------------------------------------
# fixtures profile — FIXTURES.md §1-2
# ---------------------------------------------------------------------------

_SIZES = np.array([64, 100, 128, 256])


def _scene_pixels(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Deterministic smooth synthetic scene (gradient + two sinusoids +
    mild noise), quantized to uint8. Compressible like real imagery —
    pure-random pixels made every byte stage artificially IO-bound
    (incompressible PNG/zlib), which is not representative."""
    yy = np.linspace(0, 1, h)[:, None]
    xx = np.linspace(0, 1, w)[None, :]
    fx, fy = rng.uniform(1, 6, 2)
    p1, p2 = rng.uniform(0, 2 * np.pi, 2)
    base = (
        60.0 * yy
        + 50.0 * np.sin(2 * np.pi * fx * xx + p1)
        + 50.0 * np.cos(2 * np.pi * fy * yy + p2)
        + rng.normal(0, 3.0, (h, w))
    )
    return np.clip(base + 128.0, 0, 255).astype(np.uint8)


def make_fixture_images(
    ids: np.ndarray,
    seed: int = 42,
    size: Optional[int] = None,
    n_total: Optional[int] = None,
) -> pa.Table:
    """Random-pixel images with jittered grids, a 30% skew cluster, a few
    antimeridian straddlers and ~1% phash duplicates."""
    out: Dict[str, list] = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
    grids = []
    for i in np.asarray(ids, dtype=np.int64):
        i = int(i)
        rng = np.random.default_rng(seed + i)
        if i == 0:
            h = w = 1  # degenerate 1x1 -> Point case (raster_geometry.py:126-127)
        elif size is not None:
            h = w = size
        else:
            h = int(_SIZES[rng.integers(0, len(_SIZES))])
            w = int(_SIZES[rng.integers(0, len(_SIZES))])
        if i % 101 == 100 and i > 0:  # ~1% duplicates for dedup tests
            dup_rng = np.random.default_rng(seed + i - 1)
            if i - 1 == 0:
                h = w = 1
            elif size is None:
                h = int(_SIZES[dup_rng.integers(0, len(_SIZES))])
                w = int(_SIZES[dup_rng.integers(0, len(_SIZES))])
            px = _scene_pixels(dup_rng, h, w)
        else:
            px = _scene_pixels(rng, h, w)
        # footprint stays ~1.3-2.6 deg regardless of pixel count (higher
        # resolution = same scene area), like real scene products; the
        # degenerate 1x1 image keeps the base cell (a 2.5-deg single pixel
        # would straddle tile cells for no test value)
        factor = 256.0 / max(h, w) if max(h, w) > 1 else 1.0
        cell = (0.01 if rng.random() < 0.5 else 0.005) * factor
        if i % 37 == 36:
            # antimeridian straddler (FIXTURES.md §2)
            x0 = 179.9
            y0 = 10.0
        elif rng.random() < 0.30:
            # skew cluster: one shared 1-degree cell
            x0 = -118.0 + rng.random() * (1.0 - cell * w)
            y0 = 35.0 - rng.random() * 0.01
        else:
            x0 = -125.0 + rng.integers(0, 31) * 0.5
            y0 = 45.0 - rng.integers(0, 31) * 0.5
        fmt = "png" if i % 3 == 0 else "npy"
        out["image_id"].append(f"img{i:08d}")
        out["bytes"].append(codec.encode(px, fmt))
        out["w"].append(w)
        out["h"].append(h)
        out["fmt"].append(fmt)
        out["caption"].append(f"synthetic scene {i} at ({x0:.2f},{y0:.2f})")
        out["phash"].append(average_hash(px))
        grids.append(
            {
                "crs": "EPSG:4326",
                "x_origin": float(x0),
                "y_origin": float(y0),
                "cell_width": cell,
                "cell_height": -cell,
                "rows": h,
                "cols": w,
            }
        )
    return pa.Table.from_pydict(
        {
            "image_id": pa.array(out["image_id"], pa.string()),
            "bytes": pa.array(out["bytes"], pa.binary()),
            "w": pa.array(out["w"], pa.int32()),
            "h": pa.array(out["h"], pa.int32()),
            "fmt": pa.array(out["fmt"], pa.string()),
            "caption": pa.array(out["caption"], pa.string()),
            "phash": pa.array(out["phash"], pa.int64()),
            "grid": pa.array(grids, GRID_STRUCT),
        }
    )


def images_dataset(n: int, profile: str = "fixtures", size: Optional[int] = None,
                   images_per_block: int = 64, **kw):
    """Streaming Ray Data generator: range(n) -> map_batches(maker).

    Blocks are kept to ~64 images so a write_parquet of the result lands
    many small files: parquet blocks cannot be split finer than a row
    group at read time without REDUNDANT decode (override_num_blocks on
    single-row-group files multiplies read work), so read parallelism
    must come from the file layout."""
    import ray.data as rd

    maker = {
        "fixtures": lambda t: make_fixture_images(t["id"].to_numpy(), size=size, **kw),
        "oracle": lambda t: make_oracle_images(t["id"].to_numpy(), **kw),
    }[profile]
    blocks = max(1, (n + images_per_block - 1) // images_per_block)
    return rd.range(n, override_num_blocks=blocks).map_batches(
        lambda t: maker(t), batch_format="pyarrow", batch_size=images_per_block
    )
