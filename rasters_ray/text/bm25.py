"""BM25 relevance scoring with exact rational arithmetic.

Robertson & Walker's BM25 with the standard constants written as exact
rationals (k1 = 6/5, b = 3/4) and the ln-free ODDS idf
``(N - df + 1/2) / (df + 1/2)`` (the raw Robertson-Sparck Jones odds,
kept rational so no transcendental function has to agree across
engines; the monotone ranking order matches the classic ln form).  Per
(document, term) the whole score collapses to ONE float division over
exact integer products:

    score = (2N - 2df + 1) * 22 * tf * Dsum
            -------------------------------------------
            (2df + 1) * (10*tf*Dsum + 3*Dsum + 9*dl*N)

where dl is the document token count and Dsum the corpus token count
(avgdl = Dsum / N cross-multiplied away).

Scale shape: pass 1 folds (N, Dsum, df per term) through bincount
partials (a |terms|+2-row aggregate, broadcast by closure); pass 2 is
a per-document map emitting only tf > 0 rows.  Tokenization is a plain
single-space split on BOTH engines (str_split in the SQL replay).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..relational.aggregates import grouped_int_sums

__all__ = ["bm25_scores", "BM25_DEFAULT_TERMS"]

BM25_DEFAULT_TERMS = ["fast", "table", "scan", "stream", "vector"]


def _tf(tokens: list, term: str) -> int:
    return sum(1 for x in tokens if x == term)


def bm25_scores(docs_ds, terms: list[str], id_col: str = "doc_id",
                text_col: str = "text"):
    """Dataset[docs] -> Dataset[(id, term, tf, dl, score)] rows with
    tf > 0, scored per the module formula."""
    terms = list(terms)

    def stats_rows(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        toks = [s.split(" ") for s in texts]
        rows_t, rows_v = ["__N", "__DSUM"], [len(toks),
                                             sum(len(x) for x in toks)]
        for term in terms:
            rows_t.append(term)
            rows_v.append(sum(1 for x in toks if _tf(x, term) > 0))
        return pa.table(
            {
                "k": pa.array(rows_t, pa.string()),
                "v": pa.array(rows_v, pa.int64()),
            }
        )

    agg = grouped_int_sums(
        docs_ds.map_batches(stats_rows, batch_format="pyarrow"),
        ["k"],
        lambda t: {"v": t.column("v").to_numpy(zero_copy_only=False)},
        count_col="_m",
    ).to_pandas()
    g = dict(zip(agg["k"], agg["v"].astype(int)))
    n, dsum = int(g["__N"]), int(g["__DSUM"])
    df = {term: int(g.get(term, 0)) for term in terms}

    def score_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        texts = t.column(text_col).to_pylist()
        out = {k: [] for k in ("_id", "term", "tf", "dl", "score")}
        for i, s in enumerate(texts):
            toks = s.split(" ")
            dl = len(toks)
            for term in terms:
                tf = _tf(toks, term)
                if not tf:
                    continue
                num = (2 * n - 2 * df[term] + 1) * 22 * tf * dsum
                den = (2 * df[term] + 1) * (
                    10 * tf * dsum + 3 * dsum + 9 * dl * n
                )
                out["_id"].append(ids[i].as_py())
                out["term"].append(term)
                out["tf"].append(tf)
                out["dl"].append(dl)
                out["score"].append(float(num) / float(den))
        return pa.table(
            {
                id_col: pa.array(out["_id"], ids.type),
                "term": pa.array(out["term"], pa.string()),
                "tf": pa.array(out["tf"], pa.int64()),
                "dl": pa.array(out["dl"], pa.int64()),
                "score": pa.array(out["score"], pa.float64()),
            }
        )

    return docs_ds.map_batches(score_rows, batch_format="pyarrow")
