"""Small shared helpers."""

from __future__ import annotations

import numpy as np

_FIB_MIX = np.uint64(0x9E3779B97F4A7C15)  # 2^64 / golden ratio


def hash_parts(values, n_parts: int) -> np.ndarray:
    """Hash partition (0..n_parts) of an id array — vectorized Fibonacci
    mix for integer ids, per-value crc32 fallback for strings/other.

    Shared by every union+groupby shuffle in the repo (dedup joins,
    relational joins) so co-partitioning keys across stages is guaranteed
    to agree."""
    import zlib

    import pyarrow as pa

    return (hash_u64(values) % np.uint64(n_parts)).astype(np.int64)


def hash_u64(values) -> np.ndarray:
    """Full-width deterministic u64 hash of a column — vectorized
    Fibonacci mix for integer ids, pandas C-siphash (FIXED default key,
    stable across worker processes — unlike builtin ``hash()`` under
    per-process PYTHONHASHSEED) for strings, per-value crc32 fallback."""
    import zlib

    import pyarrow as pa

    try:
        v = np.asarray(values.to_numpy(zero_copy_only=False), dtype=np.int64).astype(
            np.uint64
        )
        return (v * _FIB_MIX) >> np.uint64(32)  # wraps mod 2^64
    except (TypeError, ValueError, pa.ArrowInvalid):
        pass
    try:
        import pandas as pd

        obj = np.asarray(values.to_numpy(zero_copy_only=False), dtype=object)
        return pd.util.hash_array(obj, categorize=True).astype(np.uint64)
    except Exception:
        return np.array(
            [zlib.crc32(str(x).encode()) for x in values.to_pylist()],
            dtype=np.uint64,
        )


_FNV_PRIME = np.uint64(1099511628211)


def hash_parts_cols(table, cols, n_parts: int) -> np.ndarray:
    """Hash partition of a COMPOSITE key (several columns) — per-column
    full-width hashes mixed with an FNV-style fold, so multi-key joins
    co-partition consistently on both sides."""
    h = np.zeros(table.num_rows, dtype=np.uint64)
    for c in cols:
        h = h * _FNV_PRIME ^ hash_u64(table.column(c))
    return (h % np.uint64(n_parts)).astype(np.int64)


def pool_size(fraction: float = 0.25, lo: int = 1, hi: int = 8) -> int:
    """Actor-pool size that leaves CPUs free for the surrounding stages.

    A pipeline with two actor pools plus a shuffle deadlocks if the pools
    reserve every CPU (the sort tasks never get a slot) — size each pool to
    a FRACTION of the session CPUs, clamped to [lo, hi]."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(lo, min(hi, int(cpus * fraction)))
