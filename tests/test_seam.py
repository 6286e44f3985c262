"""Seam-carving DP vs brute-force seam enumeration and the SQL replay."""

import itertools

import numpy as np
import pytest

from rasters_ray.stages.seam import seam_dp_arrays


def _energy(v):
    R, C = v.shape
    e = np.zeros_like(v)
    for r in range(R):
        for c in range(C):
            cl, cr = max(c - 1, 0), min(c + 1, C - 1)
            ru, rd = max(r - 1, 0), min(r + 1, R - 1)
            e[r, c] = abs(v[r, cr] - v[r, cl]) + abs(v[rd, c] - v[ru, c])
    return e


def _brute_min_seam(v):
    """Enumerate ALL connected vertical seams (small grids only)."""
    e = _energy(v)
    R, C = v.shape
    best = None
    for start in range(C):
        paths = [(start, e[0, start])]
        for r in range(1, R):
            nxt = []
            for c, cost in paths:
                for dc in (-1, 0, 1):
                    c2 = c + dc
                    if 0 <= c2 < C:
                        nxt.append((c2, cost + e[r, c2]))
            # prune to best per column (Bellman) to stay tractable
            byc = {}
            for c2, cost in nxt:
                if c2 not in byc or cost < byc[c2]:
                    byc[c2] = cost
            paths = list(byc.items())
        m = min(cost for _, cost in paths)
        best = m if best is None else min(best, m)
    return best


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dp_matches_brute(seed):
    rng = np.random.default_rng(seed)
    v = rng.integers(0, 50, (7, 6)).astype(np.float64)
    mn, am, total, m = seam_dp_arrays(v)
    assert mn == _brute_min_seam(np.rint(v).astype(np.int64))
    assert m[am] == mn
    assert am == int(np.argmin(m))  # smallest column on ties


def test_single_column():
    v = np.array([[1.0], [5.0], [2.0]])
    mn, am, total, m = seam_dp_arrays(v)
    # C=1: dx always 0; dy from clamped rows
    assert am == 0 and mn == total == m[0]


def test_matches_duckdb_recursive_replay():
    import duckdb

    R, C = 5, 6
    v = np.array([[(r * 7 + c * 13) % 11 for c in range(C)] for r in range(R)],
                 dtype=np.float64)
    mn, am, total, _ = seam_dp_arrays(v)
    q = f"""
WITH RECURSIVE
px AS (SELECT r.range AS r, c.range AS c, (r.range*7+c.range*13) % 11 AS v
       FROM range({R}) r, range({C}) c),
e AS (
  SELECT a.r, a.c, ABS(cr.v - cl.v) + ABS(rd.v - ru.v) AS e
  FROM px a
  JOIN px cl ON cl.r=a.r AND cl.c=GREATEST(a.c-1,0)
  JOIN px cr ON cr.r=a.r AND cr.c=LEAST(a.c+1,{C-1})
  JOIN px ru ON ru.c=a.c AND ru.r=GREATEST(a.r-1,0)
  JOIN px rd ON rd.c=a.c AND rd.r=LEAST(a.r+1,{R-1})),
el AS (SELECT r, list(e ORDER BY c) AS es FROM e GROUP BY r),
dp AS (
  SELECT r, es AS ms FROM el WHERE r = 0
  UNION ALL
  SELECT el.r, list_transform(range(1, {C+1}), i ->
           el.es[i] + LEAST(
             CASE WHEN i > 1 THEN d.ms[i-1] ELSE d.ms[i] END,
             d.ms[i],
             CASE WHEN i < {C} THEN d.ms[i+1] ELSE d.ms[i] END))
  FROM dp d JOIN el ON el.r = d.r + 1)
SELECT list_aggregate(ms,'min'),
       list_position(ms, list_aggregate(ms,'min')) - 1,
       CAST(list_aggregate(ms,'sum') AS BIGINT)
FROM dp WHERE r = {R-1}
"""
    got = duckdb.sql(q).fetchone()
    assert got == (mn, am, total)
