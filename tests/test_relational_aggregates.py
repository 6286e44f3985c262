"""Relational aggregate stages: Borda rank fusion."""

import numpy as np
import pyarrow as pa

def test_borda_fusion_matches_pandas_ranks(ray_session):
    import ray.data as rd
    from rasters_ray.relational.aggregates import borda_fusion

    rng = np.random.default_rng(11)
    n = 80
    t = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "sa": pa.array(rng.integers(0, 10, n), pa.int64()),  # heavy ties
        "sb": pa.array(rng.integers(0, 50, n), pa.int64()),
    })
    got = (borda_fusion(rd.from_arrow(t).repartition(4), "id", ["sa", "sb"])
           .to_pandas().sort_values("id").reset_index(drop=True))
    df = t.to_pandas()
    ra = df["sa"].rank(method="min", ascending=False).astype(int)
    rb = df["sb"].rank(method="min", ascending=False).astype(int)
    borda = ra + rb
    fused = borda.rank(method="min", ascending=True).astype(int)
    assert (got["rank_sa"] == ra).all()
    assert (got["rank_sb"] == rb).all()
    assert (got["borda"] == borda).all()
    assert (got["fused_rank"] == fused).all()
    # block layout invariance
    got2 = (borda_fusion(rd.from_arrow(t).repartition(7), "id", ["sa", "sb"])
            .to_pandas().sort_values("id").reset_index(drop=True))
    assert got2.equals(got)
