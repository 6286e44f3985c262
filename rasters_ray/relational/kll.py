"""Deterministic mergeable quantile sketch (MRL-style multilevel buffers).

The approximate counterpart to ``aggregates.exact_quantiles`` — same role
HyperLogLog (``relational/distinct.py``) plays beside the exact distinct
count: when a rank error of ~1% is acceptable, ONE streaming pass and a
driver merge of tiny per-block summaries replaces exact_quantiles'
multi-round histogram narrowing.

Public algorithm: Manku-Rajagopalan-Lindsay (SIGMOD'98) COLLAPSE-based
summaries (the deterministic ancestor of KLL): a stack of buffers where
level-``i`` values carry weight ``2^i``; a full buffer sorts and keeps
every other element (the kept-offset alternates per collapse — fully
deterministic, no RNG, so distributed results are reproducible), pushing
the half up one level.  Rank error is O(log^2(n/k)/k) * n; k=256 gives
well under 1% on 10^5..10^9 rows.

Distributed shape: per-block sketches built inside ``map_batches`` and
emitted as (level, value) rows — a few KB per block regardless of block
size — then merged on the driver.  Merging concatenates same-level
buffers and re-collapses: the sketch is a commutative monoid, so block
order does not matter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["MRLSketch", "sketch_quantiles"]


class MRLSketch:
    def __init__(self, k: int = 256):
        self.k = int(k)
        self.levels: list[list] = [[]]  # level i -> python list of floats
        self._parity = 0

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, np.float64)
        # feed in <=2k slices so level-0 never exceeds its bound — a whole
        # multi-million-row block boxed into one Python list would defeat
        # the sketch's O(k log n) memory point inside map_batches
        step = 2 * self.k
        for i in range(0, len(v), step):
            self.levels[0].extend(v[i : i + step].tolist())
            self._compact()

    def merge(self, other: "MRLSketch") -> None:
        while len(self.levels) < len(other.levels):
            self.levels.append([])
        for i, buf in enumerate(other.levels):
            self.levels[i].extend(buf)
        self._compact()

    def _compact(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) >= 2 * self.k:
                buf = np.sort(np.asarray(self.levels[i], np.float64))
                keep_up = buf[self._parity :: 2]  # half go up one level
                self._parity ^= 1
                self.levels[i] = []
                if i + 1 == len(self.levels):
                    self.levels.append([])
                self.levels[i + 1].extend(keep_up.tolist())
            i += 1

    def items(self):
        """(value, weight) arrays across all levels."""
        vals = []
        wts = []
        for i, buf in enumerate(self.levels):
            if buf:
                vals.append(np.asarray(buf, np.float64))
                wts.append(np.full(len(buf), 1 << i, np.int64))
        if not vals:
            return np.array([], np.float64), np.array([], np.int64)
        return np.concatenate(vals), np.concatenate(wts)

    def quantile(self, q: float) -> float:
        v, w = self.items()
        if not len(v):
            raise ValueError("empty sketch")
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cw = np.cumsum(w)
        rank = max(1, int(np.ceil(q * cw[-1])))
        return float(v[np.searchsorted(cw, rank)])

    def to_rows(self) -> pa.Table:
        v, w = self.items()
        lev = np.log2(w.astype(np.float64)).astype(np.int64) if len(w) else w
        return pa.table(
            {"level": pa.array(lev, pa.int64()), "value": pa.array(v, pa.float64())}
        )

    @classmethod
    def from_rows(cls, t: pa.Table, k: int = 256) -> "MRLSketch":
        s = cls(k)
        lev = t.column("level").to_numpy(zero_copy_only=False)
        val = t.column("value").to_numpy(zero_copy_only=False)
        for li in np.unique(lev):
            while len(s.levels) <= li:
                s.levels.append([])
            s.levels[int(li)].extend(val[lev == li].tolist())
        s._compact()
        return s


def sketch_quantiles(ds, col: str, qs: list, k: int = 256) -> pa.Table:
    """One streaming pass -> Table[q, value] of approximate quantiles."""

    def partial(t: pa.Table) -> pa.Table:
        s = MRLSketch(k)
        if t.num_rows:
            s.add(t.column(col).to_numpy(zero_copy_only=False).astype(np.float64))
        return s.to_rows()

    rows = ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    import ray

    merged = MRLSketch(k)
    for ref in rows:  # driver-small: O(k log n) values per block sketch
        merged.merge(MRLSketch.from_rows(ray.get(ref), k))
    return pa.table(
        {
            "q": pa.array([float(q) for q in qs], pa.float64()),
            "value": pa.array([merged.quantile(q) for q in qs], pa.float64()),
        }
    )
