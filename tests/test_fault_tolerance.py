"""Task-retry idempotence: a stage whose worker PROCESS dies mid-run
must still produce the exact sequential answer after Ray's lineage-based
retry (user exceptions are not retried by Ray Data — worker death is).

This is the property the engine's deterministic integer-exact partials
are designed for (SURVEY §4.2 'retries' row): a retried task recomputes
the SAME partial, so at-least-once execution still yields exactly-once
results.
"""

import os

import numpy as np
import pyarrow as pa


def test_grouped_sum_survives_worker_death(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 20_000
    keys = rng.integers(0, 7, n).astype(np.int64)
    vals = rng.integers(0, 1000, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": keys, "v": vals})).repartition(12)
    latch = str(tmp_path / "crash_once")

    def flaky_partial(t: pa.Table) -> pa.Table:
        # exactly ONE task (the first to win the O_EXCL latch) hard-kills
        # its worker; Ray reschedules the task, and because the partial
        # is a pure function of the block the retry emits identical rows
        try:
            fd = os.open(latch, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            os._exit(1)
        except FileExistsError:
            pass
        k = t.column("k").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, v)
        return pa.table(
            {"k": pa.array(uniq, pa.int64()), "s": pa.array(s, pa.int64())}
        )

    def final(group: pa.Table) -> pa.Table:
        s = group.column("s").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array([group.column("k")[0].as_py()], pa.int64()),
                "s": pa.array([int(s.sum())], pa.int64()),
            }
        )

    out = (
        ds.map_batches(flaky_partial, batch_format="pyarrow")
        .groupby("k")
        .map_groups(final, batch_format="pyarrow")
        .to_pandas()
        .sort_values("k")
    )
    expect = {int(k): int(vals[keys == k].sum()) for k in np.unique(keys)}
    assert {int(r.k): int(r.s) for r in out.itertuples()} == expect
