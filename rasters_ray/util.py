"""Small shared helpers."""

from __future__ import annotations


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
