"""BM25 rational scoring vs a float reference, plus ROC points."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from rasters_ray.text.bm25 import bm25_scores


def test_bm25_matches_float_reference(ray_session):
    docs = [
        "fast table fast scan vector",
        "slow path nothing here",
        "table table table stream",
        "fast",
    ]
    terms = ["fast", "table", "vector"]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(docs)})
    out = bm25_scores(rd.from_arrow(t), terms).to_pandas()
    toks = [d.split(" ") for d in docs]
    N = len(docs)
    dsum = sum(len(x) for x in toks)
    avgdl = dsum / N
    k1, b = 1.2, 0.75
    got = {(r.doc_id, r.term): r for r in out.itertuples()}
    for i, x in enumerate(toks):
        for term in terms:
            tf = x.count(term)
            if not tf:
                assert (i, term) not in got
                continue
            df = sum(1 for y in toks if term in y)
            idf = (N - df + 0.5) / (df + 0.5)
            want = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(x) / avgdl))
            r = got[(i, term)]
            assert (r.tf, r.dl) == (tf, len(x))
            assert abs(r.score - want) < 1e-9
    # ranking sanity: the 3x-table doc outranks the 1x-table doc
    assert got[(2, "table")].score > got[(0, "table")].score


def test_roc_points_exact(ray_session):
    from rasters_ray.relational.rankstats import roc_points

    rng = np.random.default_rng(2)
    n = 1200
    ty = rng.choice(["p", "n", "zz"], n)
    v = np.where(ty == "p", rng.integers(8, 30, n),
                 rng.integers(0, 25, n)).astype(np.int64)
    t = pa.table({"t": ty, "v": pa.array(v)})
    out = roc_points(rd.from_arrow(t), "t",
                     lambda b: b.column("v").to_numpy(), "p", "n"
                     ).to_pandas().sort_values("v")
    vp, vn = v[ty == "p"], v[ty == "n"]
    for r in out.itertuples():
        assert r.tp == int((vp >= r.v).sum())
        assert r.fp == int((vn >= r.v).sum())
        assert r.tp + r.fn == len(vp) and r.fp + r.tn == len(vn)
    # trapezoid AUC over the curve ~ Mann-Whitney AUC
    fpr = np.concatenate(([1.0], out["fpr"].to_numpy(), [0.0]))
    tpr = np.concatenate(([1.0], out["tpr"].to_numpy(), [0.0]))
    auc = -np.trapz(tpr, fpr)
    u2 = 2 * (vp[:, None] > vn[None, :]).sum() + (vp[:, None] == vn[None, :]).sum()
    assert abs(auc - u2 / (2 * len(vp) * len(vn))) < 1e-9
