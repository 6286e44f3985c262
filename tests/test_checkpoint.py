"""Per-partition checkpoint manifest: resume skips completed partitions and
reruns produce identical remaining output (FIXTURES.md §6.5)."""

import json
import os
import shutil

import pytest

from rasters_ray import checkpoint


def _parts(n):
    return [{"partition_id": f"part-{i:03d}", "inputs": [{"lo": i, "hi": i + 1}]} for i in range(n)]


def test_run_partitioned_writes_manifest(tmp_path):
    root = str(tmp_path / "out")
    calls = []

    def run_one(part, out_dir):
        calls.append(part["partition_id"])
        with open(os.path.join(out_dir, "data.txt"), "w") as f:
            f.write(part["partition_id"])
        return 7

    rows = checkpoint.run_partitioned(root, _parts(3), run_one)
    assert len(rows) == 3
    assert len(calls) == 3
    for r in rows:
        assert r["row_count"] == 7
        assert r["bytes"] > 0
        assert r["wall_ms"] >= 0
        assert r["inputs"]
    done = checkpoint.completed_partitions(root)
    assert set(done) == {"part-000", "part-001", "part-002"}


def test_resume_skips_completed(tmp_path):
    root = str(tmp_path / "out")
    calls = []

    def run_one(part, out_dir):
        calls.append(part["partition_id"])
        with open(os.path.join(out_dir, "data.txt"), "w") as f:
            f.write(part["partition_id"])
        return 1

    checkpoint.run_partitioned(root, _parts(2), run_one)
    calls.clear()
    rows = checkpoint.run_partitioned(root, _parts(4), run_one)
    assert calls == ["part-002", "part-003"]  # first two skipped
    assert len(rows) == 4


def test_torn_partition_is_redone(tmp_path):
    root = str(tmp_path / "out")

    def run_one(part, out_dir):
        with open(os.path.join(out_dir, "data.txt"), "w") as f:
            f.write("x")
        return 1

    checkpoint.run_partitioned(root, _parts(2), run_one)
    # simulate a torn write: output dir present but manifest row removed
    os.remove(os.path.join(root, "_manifest", "part-001.json"))
    calls = []

    def run_two(part, out_dir):
        calls.append(part["partition_id"])
        with open(os.path.join(out_dir, "data.txt"), "w") as f:
            f.write("y")
        return 1

    checkpoint.run_partitioned(root, _parts(2), run_two)
    assert calls == ["part-001"]
    with open(os.path.join(root, "part-001", "data.txt")) as f:
        assert f.read() == "y"


def test_crash_mid_partition_then_resume(tmp_path):
    root = str(tmp_path / "out")

    class Boom(Exception):
        pass

    def run_crash(part, out_dir):
        with open(os.path.join(out_dir, "data.txt"), "w") as f:
            f.write("partial")
        if part["partition_id"] == "part-001":
            raise Boom()
        return 1

    with pytest.raises(Boom):
        checkpoint.run_partitioned(root, _parts(3), run_crash)
    done = checkpoint.completed_partitions(root)
    assert set(done) == {"part-000"}

    def run_ok(part, out_dir):
        with open(os.path.join(out_dir, "data.txt"), "w") as f:
            f.write("ok")
        return 1

    rows = checkpoint.run_partitioned(root, _parts(3), run_ok)
    assert len(rows) == 3
    assert set(checkpoint.completed_partitions(root)) == {"part-000", "part-001", "part-002"}


def test_flagship_partitioned_resume(tmp_path, ray_session):
    from rasters_ray.pipelines.flagship import run_flagship_partitioned
    from rasters_ray.sources import make_oracle_images

    def make_images_ds(lo, hi):
        import numpy as np
        import ray.data as rd

        return rd.from_arrow(make_oracle_images(np.arange(lo, hi)))

    make_images_ds.total = 8
    root = str(tmp_path / "tiles")
    rows = run_flagship_partitioned(make_images_ds, root, n_partitions=4, level=9)
    assert len(rows) == 4
    assert all(r["row_count"] > 0 for r in rows)
    # resume: nothing re-runs (manifest rows identical objects)
    rows2 = run_flagship_partitioned(make_images_ds, root, n_partitions=4, level=9)
    assert [r["finished_at"] for r in rows] == [r["finished_at"] for r in rows2]
    # output readable per partition directory
    import pyarrow.dataset as pads

    total_rows = sum(
        pads.dataset(os.path.join(root, d)).count_rows()
        for d in os.listdir(root)
        if d.startswith("part-")
    )
    assert total_rows == sum(r["row_count"] for r in rows)


def test_zone_map_pruning(ray_session, tmp_path):
    """Partition stats in the manifest skip non-overlapping partitions at
    read time; the pruned read equals the filtered full scan."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rasters_ray.checkpoint import (
        prune_partitions,
        read_pruned,
        run_partitioned_with_stats,
    )

    root = str(tmp_path / "zoned")
    rng = np.random.default_rng(3)
    vals = np.sort(rng.uniform(0, 100, 4000))
    chunks = np.array_split(vals, 8)  # contiguous ranges -> tight zone maps

    def run_one(part, out_dir):
        i = int(part["partition_id"].split("_")[1])
        v = chunks[i]
        pq.write_table(
            pa.table({"x": v}), os.path.join(out_dir, "part.parquet")
        )
        return len(v), {"x": [float(v.min()), float(v.max())]}

    parts = [{"partition_id": f"p_{i:02d}"} for i in range(8)]
    rows = run_partitioned_with_stats(root, parts, run_one)
    assert all("stats" in r for r in rows)

    lo, hi = 30.0, 45.0
    kept = prune_partitions(root, "x", lo, hi)
    assert 0 < len(kept) < 8  # pruning actually skipped partitions
    got = read_pruned(root, "x", lo, hi).to_pandas()["x"].to_numpy()
    inside = vals[(vals >= lo) & (vals <= hi)]
    assert set(np.round(inside, 9)).issubset(set(np.round(got, 9)))
    # every kept partition overlaps; every skipped one doesn't
    for i in range(8):
        pid = f"p_{i:02d}"
        overlaps = chunks[i].min() <= hi and chunks[i].max() >= lo
        assert (pid in kept) == overlaps

    # resume keeps the stats row intact
    rows2 = run_partitioned_with_stats(root, parts, run_one)
    assert all("stats" in r for r in rows2)
