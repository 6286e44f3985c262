"""Distributed joins over Ray Datasets: hash equi-join, broadcast join,
as-of join, interval (range) join.

Scale shapes
------------
- ``hash_join``: ONE union + groupby all-to-all.  Both sides are tagged
  with the same hash partition of their key (``util.hash_parts``), the
  union is grouped by partition, and each partition joins its two halves
  with the Acero hash join (``pyarrow.Table.join``, single-threaded per
  task — Ray owns the parallelism).  Works for every Acero join type
  (inner / left|right|full outer / semi / anti).  This is the large ⋈
  large path; at 256 nodes the shuffle moves each row exactly once.
- ``broadcast_join``: zero-shuffle path for a small right side — the
  driver ``ray.put``s the table once, every map task joins its batch
  against the shared copy (fetched once per worker, not per batch).
- ``asof_join``: per-key time-series join ("latest right row at or
  before each left row").  Same single union+groupby shuffle; inside a
  partition the match is fully vectorized — lexsort both halves by
  (key, ts) and one ``np.searchsorted`` over a composite rank (no
  per-key Python loop; keys are dense-coded per partition so the
  composite cannot overflow).
- ``interval_join``: points-in-interval join with a small interval
  table (broadcast, the common case: calendars, maintenance windows,
  session boundaries).  Vectorized per batch via searchsorted on the
  interval starts per key.  For interval tables too large to broadcast,
  hash-partition both sides by key with ``hash_join`` machinery and
  apply the same kernel per partition (documented, not needed by the
  driver tables).

The reference library has no tabular joins (it is a raster library);
these operators make the engine a complete data-processing target for
the driver's TPC-H-ish tables.

Why not ``ray.data.Dataset.join``: the 2.49 native join is an alpha
hash-shuffle operator that spawns one aggregator ACTOR per partition —
measured here (64 partitions, 8 CPUs, sf0.1 lineitem ⋈ orders) it
ballooned past 100 worker processes and did not finish in 2 minutes,
while this union+groupby path (which reuses the same battle-tested
sort-shuffle machinery as every other stage in the repo) completes in
~4 s.  Revisit when the native operator stabilizes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rasters_ray.util import hash_parts, hash_parts_cols

_RPREFIX = "__r_"


def _ts_i64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Timestamp/integer column -> int64 ticks in MICROSECONDS for
    timestamps (unit-normalized so the two sides of a join can carry
    different parquet units), raw int64 otherwise."""
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.timestamp("us"))
    return col.cast(pa.int64()).to_numpy()


def _base_schema(ds) -> pa.Schema:
    sch = ds.schema()
    if sch is None:
        raise ValueError(
            "dataset schema unavailable (e.g. an empty dataset after a "
            "shuffle); joins need a typed schema on both sides"
        )
    return getattr(sch, "base_schema", sch)


def _union_side_tables(left_ds, right_ds, left_key_col, right_key_col, n_parts):
    """Tag both sides into one union-compatible layout.

    Union schema = left columns ++ ``__r_``-prefixed right columns ++
    ``_side`` (int8) ++ ``_jp`` (hash partition of the join key; keys may
    be a single column name or a list — composite keys co-partition via
    ``util.hash_parts_cols``).  The other side's columns ride as typed
    nulls (validity-bitmap only until a partition materializes them)."""
    lkeys = [left_key_col] if isinstance(left_key_col, str) else list(left_key_col)
    rkeys = [right_key_col] if isinstance(right_key_col, str) else list(right_key_col)
    lsch, rsch = _base_schema(left_ds), _base_schema(right_ds)
    lnames = list(lsch.names)
    rnames = list(rsch.names)
    union_names = lnames + [_RPREFIX + n for n in rnames] + ["_side", "_jp"]

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = [t.column(nm) for nm in lnames]
        cols += [pa.nulls(n, rsch.field(nm).type) for nm in rnames]
        cols.append(pa.array(np.zeros(n, np.int8), pa.int8()))
        cols.append(pa.array(hash_parts_cols(t, lkeys, n_parts), pa.int64()))
        return pa.Table.from_arrays(cols, names=union_names)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = [pa.nulls(n, lsch.field(nm).type) for nm in lnames]
        cols += [t.column(nm) for nm in rnames]
        cols.append(pa.array(np.ones(n, np.int8), pa.int8()))
        cols.append(pa.array(hash_parts_cols(t, rkeys, n_parts), pa.int64()))
        return pa.Table.from_arrays(cols, names=union_names)

    union = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )
    return union, lnames, rnames


def _split_sides(group: pa.Table, lnames, rnames):
    side = group.column("_side").to_numpy(zero_copy_only=False)
    lmask = pa.array(side == 0)
    left_t = group.filter(lmask).select(lnames)
    right_t = group.filter(pc.invert(lmask)).select([_RPREFIX + n for n in rnames])
    right_t = right_t.rename_columns(rnames)
    return left_t, right_t


def hash_join(
    left_ds,
    right_ds,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    n_parts: int = 64,
    right_suffix: str = "_r",
    post=None,
):
    """Distributed hash equi-join -> Dataset with Acero's column layout
    (left columns, then right non-key columns; colliding right names get
    ``right_suffix``).

    ``how``: any Acero join type — "inner", "left outer", "right outer",
    "full outer", "left semi", "left anti", ...

    ``post(joined: pa.Table) -> pa.Table``, when given, runs INSIDE the
    per-partition join task — fuse a reduction (e.g.
    :func:`rasters_ray.relational.int_sum_partial`) here so the join
    output collapses before it ever hits the object store, instead of
    shipping the full join result to a second pass."""
    right_on = right_on or on
    union, lnames, rnames = _union_side_tables(left_ds, right_ds, on, right_on, n_parts)

    def join_part(group: pa.Table) -> pa.Table:
        left_t, right_t = _split_sides(group, lnames, rnames)
        joined = left_t.join(
            right_t,
            keys=[on] if isinstance(on, str) else list(on),
            right_keys=[right_on] if isinstance(right_on, str) else list(right_on),
            join_type=how,
            right_suffix=right_suffix,
            use_threads=False,  # one Ray CPU per task; Ray owns parallelism
        )
        return post(joined) if post is not None else joined

    return union.groupby("_jp").map_groups(join_part, batch_format="pyarrow")


def broadcast_join(
    left_ds,
    right_table: pa.Table,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    right_suffix: str = "_r",
):
    """Zero-shuffle join against a SMALL right table: ``ray.put`` once,
    each map task Acero-joins its batch against the worker-shared copy."""
    import ray

    right_on = right_on or on
    ref = ray.put(right_table)

    def join_batch(t: pa.Table) -> pa.Table:
        rt = ray.get(ref)  # plasma-shared per node; fetched once per worker
        return t.join(
            rt,
            keys=[on] if isinstance(on, str) else list(on),
            right_keys=[right_on] if isinstance(right_on, str) else list(right_on),
            join_type=how,
            right_suffix=right_suffix,
            use_threads=False,
        )

    return left_ds.map_batches(join_batch, batch_format="pyarrow")


def _asof_part(
    group: pa.Table, lnames, rnames, by, left_ts, right_ts, value_cols, tolerance
):
    """Vectorized as-of match inside one hash partition.

    Dense-code the union of key values, lexsort both halves by
    (code, ts), then ONE searchsorted over ``code * span + (ts - lo)``
    (int64-safe: codes are per-partition dense, span is the partition's
    ts range) finds, for every left row, the last right row with
    ``r.ts <= l.ts`` and the same key."""
    left_t, right_t = _split_sides(group, lnames, rnames)
    lk = left_t.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
    lt = _ts_i64(left_t.column(left_ts))
    rk = right_t.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
    rt = _ts_i64(right_t.column(right_ts))

    out_cols = {nm: left_t.column(nm) for nm in lnames}
    nl, nr = len(lk), len(rk)
    if nl == 0:
        return pa.Table.from_pydict(
            {
                **{nm: left_t.column(nm) for nm in lnames},
                **{v: pa.nulls(0, right_t.schema.field(v).type) for v in value_cols},
            }
        )
    if nr == 0:
        for v in value_cols:
            out_cols[v] = pa.nulls(nl, right_t.schema.field(v).type)
        return pa.Table.from_pydict(out_cols)

    codes, inv = np.unique(np.r_[lk, rk], return_inverse=True)
    lcode, rcode = inv[:nl].astype(np.int64), inv[nl:].astype(np.int64)
    lo = min(lt.min(), rt.min())
    span = np.int64(max(lt.max(), rt.max()) - lo + 2)
    if len(codes) > 0 and span > 0 and len(codes) < (2**62) // span:
        lcomp = lcode * span + (lt - lo)
        rcomp = rcode * span + (rt - lo)
        order = np.argsort(rcomp, kind="stable")
        rcomp_s = rcomp[order]
        pos = np.searchsorted(rcomp_s, lcomp, side="right") - 1
        # a hit must be in the SAME key block (code match), not just <=
        valid = pos >= 0
        hit = np.where(valid, order[np.clip(pos, 0, nr - 1)], 0)
        valid &= rcode[hit] == lcode
    else:  # pathological span; per-key fallback (never hit by sane data)
        order = np.lexsort((rt, rcode))
        valid = np.zeros(nl, bool)
        hit = np.zeros(nl, np.int64)
        rks, rts = rcode[order], rt[order]
        for i in range(nl):
            j = np.searchsorted(rks, lcode[i], side="left")
            e = np.searchsorted(rks, lcode[i], side="right")
            p = j + np.searchsorted(rts[j:e], lt[i], side="right") - 1
            if p >= j:
                valid[i] = True
                hit[i] = order[p]
    if tolerance is not None:
        valid &= (lt - rt[np.where(valid, hit, 0)]) <= tolerance
    hit_idx = pa.array(np.where(valid, hit, -1), pa.int64())
    taken = right_t.select(value_cols).take(
        pc.if_else(pc.less(hit_idx, 0), pa.nulls(nl, pa.int64()), hit_idx)
    )
    for v in value_cols:
        out_cols[v] = taken.column(v)
    return pa.Table.from_pydict(out_cols)


def asof_join(
    left_ds,
    right_ds,
    by: str,
    on: str,
    right_on: str | None = None,
    value_cols: list[str] | None = None,
    tolerance: int | None = None,
    n_parts: int = 64,
):
    """Distributed as-of join: for every left row, attach ``value_cols``
    from the latest right row with the same ``by`` key and
    ``right.ts <= left.ts`` (nulls when none; optional ``tolerance`` in
    ts ticks).  Matches DuckDB ``ASOF LEFT JOIN`` semantics.

    One union+groupby all-to-all on hash(``by``); the per-partition
    kernel is a single composite-rank searchsorted (see ``_asof_part``).
    """
    right_on = right_on or on
    if value_cols is None:
        rsch = _base_schema(right_ds)
        value_cols = [n for n in rsch.names if n not in (by, right_on)]
    union, lnames, rnames = _union_side_tables(left_ds, right_ds, by, by, n_parts)

    def part(group: pa.Table) -> pa.Table:
        return _asof_part(
            group, lnames, rnames, by, on, right_on, value_cols, tolerance
        )

    return union.groupby("_jp").map_groups(part, batch_format="pyarrow")


def interval_join(
    left_ds,
    intervals: pa.Table,
    by: str,
    on: str,
    start_col: str = "start",
    end_col: str = "end",
    interval_id_col: str = "interval_id",
    closed: str = "left",
):
    """Join timestamped rows into a SMALL table of per-key, non-overlapping
    intervals -> left rows + ``interval_id`` (rows outside every interval
    drop; inner join).  ``closed``: "left" = [start, end), "both" =
    [start, end].

    The interval table is broadcast (``ray.put`` once) and each batch is
    matched with one searchsorted against the per-key sorted starts —
    the scale shape for calendar/window/session-range joins, zero
    shuffles.  (A large-large variant is ``hash_join`` machinery + this
    same kernel per partition.)"""
    import ray

    ik = intervals.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
    istart = _ts_i64(intervals.column(start_col))
    iend = _ts_i64(intervals.column(end_col))
    iid = intervals.column(interval_id_col)
    order = np.lexsort((istart, ik))
    pack = pa.table(
        {
            "k": pa.array(ik[order]),
            "s": pa.array(istart[order]),
            "e": pa.array(iend[order]),
            "id": iid.take(pa.array(order)),
        }
    )
    ref = ray.put(pack)

    def match(t: pa.Table) -> pa.Table:
        iv = ray.get(ref)
        k = iv.column("k").to_numpy()
        s = iv.column("s").to_numpy()
        e = iv.column("e").to_numpy()
        lk = t.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
        lt = _ts_i64(t.column(on))
        if t.num_rows == 0 or len(k) == 0:
            return t.slice(0, 0).append_column(
                interval_id_col, pa.nulls(0, iv.schema.field("id").type)
            )
        lo = min(s.min(), lt.min())
        span = np.int64(max(e.max(), lt.max()) - lo + 2)
        kcodes, inv = np.unique(np.r_[k, lk], return_inverse=True)
        kc, lc = inv[: len(k)].astype(np.int64), inv[len(k):].astype(np.int64)
        comp_s = kc * span + (s - lo)
        lcomp = lc * span + (lt - lo)
        pos = np.searchsorted(comp_s, lcomp, side="right") - 1
        ok = pos >= 0
        p = np.clip(pos, 0, len(k) - 1)
        ok &= kc[p] == lc
        inside = (lt < e[p]) if closed == "left" else (lt <= e[p])
        ok &= inside
        keep = pa.array(ok)
        out = t.filter(keep)
        ids = iv.column("id").take(pa.array(p[ok], pa.int64()))
        return out.append_column(interval_id_col, ids)

    return left_ds.map_batches(match, batch_format="pyarrow")


def detect_hot_keys(ds, on: str, hot_threshold: int) -> set:
    """EXACT distributed hot-key detection: per-block ``np.unique``
    partials (one metadata row per distinct key per block) feed a
    distributed groupby-sum; the threshold filter also runs distributed,
    so the driver receives ONLY the hot keys.  A key hot in aggregate but
    never dominant in any single block is still found — no per-block
    truncation anywhere."""

    def key_counts(t: pa.Table) -> pa.Table:
        arr = t.column(on).to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(arr, return_counts=True)
        return pa.table(
            {
                "k": pa.array(uniq),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    totals = (
        ds.map_batches(key_counts, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n", alias_name="total"))
    )
    hot_df = totals.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("total"), hot_threshold)),
        batch_format="pyarrow",
    ).to_pandas()
    if "k" not in hot_df.columns:  # all-empty blocks lose the schema
        return set()
    return set(hot_df["k"].tolist())


def skew_join(
    left_ds,
    right_ds,
    on: str,
    right_on: str | None = None,
    hot_threshold: int = 100_000,
    sample_blocks: int | None = None,
    n_parts: int = 64,
    right_suffix: str = "_r",
):
    """Skew-aware inner equi-join: hot keys take the broadcast path,
    cold keys the hash shuffle; the union is exactly the plain join.

    The problem this solves (the north rule's "salt hot keys"): in
    ``hash_join`` a single hot key lands ENTIRELY in one partition — one
    task does a disproportionate share of the work and the stage's wall
    time is that straggler.  Here:

      1. one cheap EXACT counting pass over the LEFT side's key column:
         per-block ``np.unique`` partials (a combiner — one row per
         distinct key per block, metadata only) feed a DISTRIBUTED
         groupby-sum, and only keys with total >= ``hot_threshold``
         reach the driver.  Exact by construction: a key that is hot in
         aggregate but never dominant within any single block is still
         detected (the old per-block top-64 truncation missed it);
      2. the RIGHT rows for those few keys are collected (small by the
         skew premise: a hot left key with a large right side is a
         genuine cross-product no partitioning can fix) and broadcast;
      3. left rows split per batch: hot rows join against the broadcast
         table (perfectly parallel — the hot key's work now spreads over
         EVERY left block instead of one partition), cold rows flow
         through the ordinary one-shuffle ``hash_join``;
      4. results union.  Row set is identical to ``hash_join`` by
         construction (tested).
    """
    import ray

    right_on = right_on or on
    hot_keys = detect_hot_keys(left_ds, on, hot_threshold)

    if not hot_keys:
        return hash_join(
            left_ds, right_ds, on=on, right_on=right_on,
            how="inner", n_parts=n_parts, right_suffix=right_suffix,
        )

    hot_arr = pa.array(sorted(hot_keys))

    def right_hot(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column(right_on), value_set=hot_arr))

    def right_cold(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.invert(pc.is_in(t.column(right_on), value_set=hot_arr))
        )

    def left_hot(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column(on), value_set=hot_arr))

    def left_cold(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.is_in(t.column(on), value_set=hot_arr)))

    hot_right_tab = pa.concat_tables(
        ray.get(
            right_ds.map_batches(right_hot, batch_format="pyarrow").to_arrow_refs()
        )
    )
    hot_joined = broadcast_join(
        left_ds.map_batches(left_hot, batch_format="pyarrow"),
        hot_right_tab,
        on=on,
        right_on=right_on,
        right_suffix=right_suffix,
    )
    cold_joined = hash_join(
        left_ds.map_batches(left_cold, batch_format="pyarrow"),
        right_ds.map_batches(right_cold, batch_format="pyarrow"),
        on=on,
        right_on=right_on,
        how="inner",
        n_parts=n_parts,
        right_suffix=right_suffix,
    )
    return hot_joined.union(cold_joined)
