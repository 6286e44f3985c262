"""Events windowing: timestamp-unit regression tests.

The r1 bug class: a hardcoded microsecond divisor silently mis-binned
timestamp[ns] inputs (pandas round-trips re-write parquet as ns).
`_ts_unit` derives ticks-per-second from the dtype; these tests pin that
for a timestamp[ns] parquet round-trip and for empty blocks.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _events_table(unit: str) -> pa.Table:
    rng = np.random.default_rng(7)
    n = 400
    per_sec = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}[unit]
    secs = np.sort(rng.integers(0, 86400 * 3, n))
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(secs * per_sec, pa.timestamp(unit)),
            "user_id": pa.array(rng.integers(0, 20, n), pa.int64()),
            "event_type": pa.array(
                [["click", "view", "buy"][i % 3] for i in range(n)], pa.string()
            ),
            "value": pa.array(rng.random(n), pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )


def _run_window(tmpdir: str, tbl: pa.Table):
    from __ray_entry__ import q_events_window

    pq.write_table(tbl, os.path.join(tmpdir, "events.parquet"))
    out = q_events_window(tmpdir).to_pandas()
    if len(out) == 0:
        return out
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_events_window_ns_equals_us(tmp_path):
    """Identical instants written as us and ns parquet bin identically."""
    d_us = tmp_path / "us"
    d_ns = tmp_path / "ns"
    d_us.mkdir()
    d_ns.mkdir()
    base = _events_table("us")
    ns_tbl = base.set_column(
        base.schema.get_field_index("ts"),
        "ts",
        base.column("ts").cast(pa.timestamp("ns")),
    )
    out_us = _run_window(str(d_us), base)
    out_ns = _run_window(str(d_ns), ns_tbl)
    assert out_us.equals(out_ns)
    # window_start must be hour buckets of the raw seconds, not unit ticks
    secs = base.column("ts").cast(pa.int64()).to_numpy() // 1_000_000
    assert set(out_us["window_start"]) == set(secs // 3600)


@pytest.mark.usefixtures("ray_session")
def test_events_window_empty_input(tmp_path):
    """Empty blocks must not crash the per-batch partial (ADVICE r2)."""
    out = _run_window(str(tmp_path), _events_table("us").slice(0, 0))
    assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
def test_events_sessions_ns_round_trip(tmp_path):
    """Sessionization is unit-agnostic too (gap math runs in seconds)."""
    from __ray_entry__ import q_events_sessions

    d_us = tmp_path / "us"
    d_ns = tmp_path / "ns"
    d_us.mkdir()
    d_ns.mkdir()
    base = _events_table("us")
    ns_tbl = base.set_column(
        base.schema.get_field_index("ts"),
        "ts",
        base.column("ts").cast(pa.timestamp("ns")),
    )
    pq.write_table(base, str(d_us / "events.parquet"))
    pq.write_table(ns_tbl, str(d_ns / "events.parquet"))
    a = q_events_sessions(str(d_us)).to_pandas().sort_values(
        "user_id").reset_index(drop=True)
    b = q_events_sessions(str(d_ns)).to_pandas().sort_values(
        "user_id").reset_index(drop=True)
    assert a.equals(b)
    assert a["n_sessions"].sum() > 0
