"""Per-partition checkpoint manifests — the north rule's resumability:
"resumable from per-partition checkpoints with lineage + row-count /
throughput metrics emitted per partition".

Layout under an output root:

    <root>/
      _manifest/<partition_id>.json   # one row per COMPLETED partition
      <partition_id>/...parquet       # the partition's output files

A partition is completed atomically: output is written to
``<root>/.tmp.<partition_id>``, fsync'd by the OS on rename to its final
directory, and only then is the manifest row written. A rerun calls
``completed_partitions`` and skips finished work; a partially-written tmp
dir is ignored and overwritten.

Manifest row fields: partition_id, inputs (lineage: the input fragments /
row ranges that produced it), row_count, bytes, wall_ms, rows_per_sec,
finished_at (wall-clock ISO, driver side).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from datetime import datetime, timezone
from typing import Callable, Dict, Iterable, List, Optional, Sequence


def _manifest_dir(root: str) -> str:
    return os.path.join(root, "_manifest")


def completed_partitions(root: str) -> Dict[str, dict]:
    """partition_id -> manifest row for every completed partition."""
    mdir = _manifest_dir(root)
    out: Dict[str, dict] = {}
    if not os.path.isdir(mdir):
        return out
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                row = json.load(f)
            out[row["partition_id"]] = row
        except (json.JSONDecodeError, KeyError, OSError):
            continue  # torn manifest row = not completed
    return out


def write_manifest_row(root: str, row: dict) -> None:
    mdir = _manifest_dir(root)
    os.makedirs(mdir, exist_ok=True)
    path = os.path.join(mdir, f"{row['partition_id']}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(row, f)
    os.replace(tmp, path)


def run_partitioned(
    root: str,
    partitions: Sequence[dict],
    run_one: Callable[[dict, str], int],
    resume: bool = True,
) -> List[dict]:
    """Drive a partitioned, resumable job.

    partitions: [{"partition_id": str, "inputs": [...], ...}, ...]
    run_one(partition, out_dir) -> row_count, or ``(row_count, stats)``
    where stats is a per-column zone map ``{col: [min, max]}``; writes its
    output under out_dir (Ray parallelism lives INSIDE run_one — e.g. a
    Dataset pipeline consuming that partition's fragments with
    write_parquet). When stats are returned they land in the SAME atomic
    manifest write as the completion row — a crash can never leave a
    partition marked complete but missing its zone map.

    Returns the manifest rows of all partitions (completed + just-run).
    """
    os.makedirs(root, exist_ok=True)
    done = completed_partitions(root) if resume else {}
    rows: List[dict] = []
    for part in partitions:
        pid = part["partition_id"]
        if pid in done:
            rows.append(done[pid])
            continue
        out_dir = os.path.join(root, pid)
        tmp_dir = os.path.join(root, f".tmp.{pid}")
        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir)  # torn previous attempt
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)  # output without manifest row = torn
        os.makedirs(tmp_dir)
        t0 = time.perf_counter()
        res = run_one(part, tmp_dir)
        row_count, stats = res if isinstance(res, tuple) else (res, None)
        wall_ms = (time.perf_counter() - t0) * 1000.0
        os.replace(tmp_dir, out_dir)
        nbytes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(out_dir)
            for f in fs
        )
        row = {
            "partition_id": pid,
            "inputs": part.get("inputs", []),
            "row_count": int(row_count),
            "bytes": int(nbytes),
            "wall_ms": round(wall_ms, 3),
            "rows_per_sec": round(row_count / (wall_ms / 1000.0), 3) if wall_ms > 0 else None,
            "finished_at": datetime.now(timezone.utc).isoformat(),
        }
        if stats is not None:
            row["stats"] = stats
        write_manifest_row(root, row)
        rows.append(row)
    return rows


def run_partitioned_with_stats(
    root: str,
    partitions: Sequence[dict],
    run_one: Callable[[dict, str], tuple],
    resume: bool = True,
) -> List[dict]:
    """`run_partitioned` with ``run_one(part, out_dir)`` returning
    ``(row_count, stats)``; the per-column stats dict
    (``{col: [min, max]}``) is persisted atomically WITH the manifest row
    — the zone map that :func:`read_pruned` uses to skip partitions at
    read time. (Thin alias: ``run_partitioned`` itself accepts the tuple
    return; kept for callers that want the explicit contract.)"""
    return run_partitioned(root, partitions, run_one, resume=resume)


def prune_partitions(root: str, col: str, lo, hi) -> List[str]:
    """Partition ids whose manifest zone map ``stats[col] = [min, max]``
    OVERLAPS [lo, hi] — partitions without stats are conservatively
    kept.  This is the 100-TB read lever: a predicate touching 1% of the
    key range opens 1% of the partitions, driven purely by manifest
    metadata (no file opened to decide)."""
    keep = []
    for pid, row in sorted(completed_partitions(root).items()):
        st = (row.get("stats") or {}).get(col)
        if st is None or (st[0] <= hi and st[1] >= lo):
            keep.append(pid)
    return keep


def read_pruned(root: str, col: str, lo, hi):
    """ray.data Dataset over only the partitions overlapping [lo, hi]."""
    import glob

    import ray.data as rd

    files = [
        f
        for pid in prune_partitions(root, col, lo, hi)
        for f in sorted(glob.glob(os.path.join(root, pid, "*.parquet")))
    ]
    if not files:
        raise ValueError("no partition overlaps the requested range")
    return rd.read_parquet(files)
