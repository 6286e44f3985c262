"""Benchmark driver: headline spatial-join + tiling pipelines.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "images_per_sec": ...}

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32),
     BENCH_N_IMAGES (default 6000; 256x256 px each).

--scaling: run the same bench in two fresh processes (num_cpus=8 then 32)
on the same pre-generated input and report throughputs + efficiency
(the sandbox stand-in for the N vs 4N node gate).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_IMAGES = int(os.environ.get("BENCH_N_IMAGES", "6000"))
IMG_SIZE = 256
TILE_LEVEL = 8
CACHE = f"/tmp/rasters_ray_bench/images_n{N_IMAGES}_s{IMG_SIZE}"


def ensure_images(n: int) -> str:
    """Pre-generate the bench image table ONCE (untimed, cached on disk) so
    both scaling runs read identical input with a warm page cache."""
    done = os.path.join(CACHE, "_SUCCESS")
    if os.path.exists(done):
        return CACHE
    import shutil

    from rasters_ray.sources import images_dataset

    shutil.rmtree(CACHE, ignore_errors=True)
    os.makedirs(CACHE, exist_ok=True)
    images_dataset(n, profile="fixtures", size=IMG_SIZE).write_parquet(CACHE)
    open(done, "w").close()
    return CACHE


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from rasters_ray.ann import cosine_topk
    from rasters_ray.sources.vectors import oracle_points_from_keys
    from rasters_ray.stages import composite_cells, sample_points, tile_images
    from rasters_ray.text import minhash_near_dups

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    img_path = ensure_images(N_IMAGES)

    timings: dict = {}

    # warm-up: one tiny pipeline so worker startup isn't measured
    rd.range(100).map_batches(lambda b: b).count()
    log("warmup done")

    # q1: tiling — the flagship op (decode -> covering cells -> slice -> encode)
    t0 = time.perf_counter()
    tiles = tile_images(rd.read_parquet(img_path), level=TILE_LEVEL, batch_size=16)
    n_tiles = tiles.count()
    timings["tiling"] = time.perf_counter() - t0
    log(f"tiling: {n_tiles} tiles in {timings['tiling']:.1f}s")

    # q2: spatial join — broadcast point sampling through every image
    pts_tbl = pq.read_table(f"{SF_DIR}/customer.parquet", columns=["c_custkey"])
    points = oracle_points_from_keys(pts_tbl.column("c_custkey").to_numpy())
    t0 = time.perf_counter()
    join = sample_points(
        rd.read_parquet(img_path),
        points,
        level=TILE_LEVEL,
        include_misses=False,
    )
    n_join = join.count()
    timings["point_join"] = time.perf_counter() - t0
    log(f"point_join: {n_join} rows in {timings['point_join']:.1f}s")

    # q3: merge composite at TILE granularity — groupby(cell_key) shuffle of
    # encoded tiles with salting for the 30% skew cluster. Restricted to the
    # lattice-aligned (0.01-deg) subset: compositing mixed resolutions needs
    # a warp first (the general path), which is not what this measures.
    t0 = time.perf_counter()
    aligned = rd.read_parquet(img_path).map_batches(
        lambda t: t.filter(
            pc.equal(pc.struct_field(t.column("grid"), "cell_width"), 0.01)
        ),
        batch_format="pyarrow",
    )
    merged = composite_cells(
        tile_images(aligned, level=TILE_LEVEL, batch_size=16),
        cell_size=0.01,
        mode="merge_mean",
        salt=8,
    )
    n_cells = merged.count()
    timings["merge_composite"] = time.perf_counter() - t0
    log(f"merge_composite: {n_cells} cells in {timings['merge_composite']:.1f}s")

    # q4: minhash near-dup over documents
    t0 = time.perf_counter()
    dups = minhash_near_dups(
        rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]),
        threshold=0.8,
    )
    n_dups = dups.count()
    timings["minhash_dedup"] = time.perf_counter() - t0
    log(f"minhash_dedup: {n_dups} pairs in {timings['minhash_dedup']:.1f}s")

    # q5: ANN top-k over embeddings (16 queries)
    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    qm = np.stack([np.asarray(emb.column("embedding")[i].as_py()) for i in range(16)])
    t0 = time.perf_counter()
    top = cosine_topk(
        rd.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]),
        qm,
        k=10,
    )
    timings["ann_topk"] = time.perf_counter() - t0
    log(f"ann_topk in {timings['ann_topk']:.1f}s")

    total = sum(timings.values())
    result = {
        "metric": "spatial_join_tiling_bench",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "num_cpus": NUM_CPUS,
        "n_images": N_IMAGES,
        "n_tiles": int(n_tiles),
        "n_join_rows": int(n_join),
        "n_merge_cells": int(n_cells),
        "n_near_dup_pairs": int(n_dups),
        "images_per_sec": round(N_IMAGES / timings["tiling"], 1),
    }
    ray.shutdown()
    return result


def run_scaling():
    # pre-generate the input once in THIS process so children just read it
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    ensure_images(N_IMAGES)
    ray.shutdown()

    def child(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = child(lo)
    r_hi = child(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "cpus_lo": lo,
                "cpus_hi": hi,
                "sec_lo": r_lo["value"],
                "sec_hi": r_hi["value"],
                "images_per_sec_lo": r_lo["images_per_sec"],
                "images_per_sec_hi": r_hi["images_per_sec"],
                "queries_lo": r_lo["queries"],
                "queries_hi": r_hi["queries"],
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
