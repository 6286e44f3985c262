"""Sharded mutable dedup index — the raw-actor escape hatch, gated.

Everything else in this engine is a Dataset pipeline; this module is the
one place that drops to raw ``@ray.remote`` actors, for the semantics the
Dataset API genuinely cannot express: a SHARED MUTABLE INDEX that absorbs
a stream and can be queried mid-ingest (e.g. "have we seen this content
key before?" while ingest is still running).  A groupby gives the same
FINAL answer (see ``text/analysis.dedup_exact``) but only after the full
shuffle completes; the index answers incrementally and keeps only
distinct keys in memory.

Design:
  * N ``IndexShard`` actors, each owning a disjoint hash slice of key
    space (`rasters_ray.util.hash_parts` — the same partitioner every
    shuffle in this repo uses, so shard routing agrees with any
    co-partitioned stage).
  * Ingest is a Dataset pass: ``map_batches`` splits each batch by shard
    and ships (key, order) pairs via ``observe.remote`` — payload is keys
    only, never documents.  The per-batch ``ray.get`` on the acks is the
    backpressure (at most one in-flight round per task).
  * Each shard keeps ``key -> min(order)``; min is order-independent, so
    the final index is DETERMINISTIC (equal to the groupby answer)
    regardless of arrival interleaving — which is what makes this
    oracle-checkable.

Partitioning assumption (documented per the north rule): keys hash-route,
so shard load follows key-frequency skew; shards hold distinct keys only,
~O(distinct/N) each.  At 100 TB, spill-to-disk per shard or a two-level
(router -> shard) tree replaces the flat N.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rasters_ray.util import hash_parts

__all__ = ["build_first_seen_index", "IndexShard"]


def _shard_cls():
    import ray

    # num_cpus=0: the shards must ALWAYS be schedulable — ingest map
    # tasks block on shard acks while holding their own CPUs, so a
    # CPU-reserving shard could deadlock against a saturated task pool.
    # The shards are dict mutators (microseconds per call); they share
    # cores safely.
    @ray.remote(num_cpus=0)
    class IndexShard:
        """Owns one hash slice: key -> smallest order value seen."""

        def __init__(self):
            self.first: dict = {}

        def observe(self, keys: list, orders: list) -> int:
            f = self.first
            for k, o in zip(keys, orders):
                prev = f.get(k)
                if prev is None or o < prev:
                    f[k] = o
            return len(f)

        def contains(self, keys: list) -> list:
            f = self.first
            return [k in f for k in keys]

        def dump(self, key_type_str: str = "string"):
            kt = pa.string() if key_type_str == "string" else getattr(
                pa, key_type_str
            )()
            if not self.first:
                return pa.table(
                    {"key": pa.array([], kt),
                     "first_id": pa.array([], pa.int64())}
                )
            ks = list(self.first.keys())
            vs = [self.first[k] for k in ks]
            return pa.table(
                {"key": pa.array(ks, kt),
                 "first_id": pa.array(np.asarray(vs, np.int64), pa.int64())}
            )

    return IndexShard


class IndexShard:  # re-exported for docs/tests; real class is ray.remote
    pass


def build_first_seen_index(
    ds,
    key_col: str,
    order_col: str,
    n_shards: int = 8,
) -> pa.Table:
    """Stream ``ds`` through a sharded mutable index -> Table[(key,
    first_id)] with ``first_id = min(order_col)`` per distinct key.

    Deterministic (min is arrival-order independent); equals the
    groupby-first answer bit-for-bit, which the contract oracle checks.
    """
    import ray

    cls = _shard_cls()
    shards = [cls.remote() for _ in range(n_shards)]
    kt = ds.schema().base_schema.field(key_col).type
    key_type_str = "string" if pa.types.is_string(kt) else str(kt)

    def ingest(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        orders = t.column(order_col).to_numpy(zero_copy_only=False).astype(np.int64)
        part = hash_parts(keys, n_shards)
        klist = np.asarray(keys.to_pylist(), dtype=object)
        acks = []
        for s in range(n_shards):
            m = part == s
            if m.any():
                acks.append(
                    shards[s].observe.remote(
                        klist[m].tolist(), orders[m].tolist()
                    )
                )
        ray.get(acks)  # backpressure: one in-flight round per task
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    total = ds.map_batches(ingest, batch_format="pyarrow").to_pandas()["n"].sum()
    parts = ray.get([s.dump.remote(key_type_str) for s in shards])
    out = pa.concat_tables(parts)
    assert total >= out.num_rows
    return out
