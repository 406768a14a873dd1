"""Gappy-grid hardening proof for events_burstiness_fano (VERDICT r14 #3).

The driver fixture's (day, type) event grid has zero gaps (probed r13,
FIXTURES.md), so the calendar-spine completion is output-preserving
there — this test builds the fixture the driver CANNOT: an events
table where one type goes silent for most of the observation window,
and proves

  1. the op zero-fills the silent days (n_days = global span for
     every type, not per-type present-days),
  2. the Fano factor matches a hand-computed population
     variance/mean over the zero-filled daily series,
  3. the DuckDB oracle (rewritten identically this round) agrees
     value-for-value on the same gappy parquet.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pytest


def _write_gappy_events(tmpdir: str) -> str:
    """10-day window. 'steady' fires 2/day every day; 'bursty' fires
    20 times on day 0 and never again (9 gap days)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    eid = 0
    for d in range(10):
        for _ in range(2):
            rows.append((eid, base + dt.timedelta(days=d), 1, "steady", 1.0, "{}"))
            eid += 1
    for _ in range(20):
        rows.append((eid, base, 2, "bursty", 1.0, "{}"))
        eid += 1
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(tmpdir, "events.parquet"))
    return tmpdir


def _expected_fano(counts: list[int]) -> float:
    n = len(counts)
    tot = sum(counts)
    ssq = sum(c * c for c in counts)
    return round((n * ssq - tot * tot) / (n * tot), 6)


def test_fano_zero_fills_gap_days(spark, tmp_path):
    from presto_truffle_spark.operators.timeseries_advanced import (
        events_burstiness_fano,
    )

    d = _write_gappy_events(str(tmp_path))
    rows = {
        r["event_type"]: r
        for r in events_burstiness_fano(spark, d).collect()
    }
    assert set(rows) == {"steady", "bursty"}
    # Observation window = 10 days for BOTH types, including the 9
    # days 'bursty' emitted nothing.
    assert rows["steady"]["n_days"] == 10
    assert rows["bursty"]["n_days"] == 10
    assert rows["steady"]["n_events"] == 20
    assert rows["bursty"]["n_events"] == 20
    # steady: [2]*10 -> variance 0 -> F = 0; without gap fill bursty
    # would be a single day [20] -> F = 0 too. With the fill:
    # [20,0,...,0] -> F = (10*400 - 400)/(10*20) = 18.
    assert rows["steady"]["fano_factor"] == pytest.approx(
        _expected_fano([2] * 10)
    )
    assert rows["bursty"]["fano_factor"] == pytest.approx(
        _expected_fano([20] + [0] * 9)
    )
    assert rows["bursty"]["fano_factor"] == pytest.approx(18.0)


def test_fano_oracle_parity_on_gappy_fixture(spark, tmp_path):
    from presto_truffle_spark.registry import get_oracles

    d = _write_gappy_events(str(tmp_path))
    sql = get_oracles()["events_burstiness_fano"]
    con = duckdb.connect()
    pq_path = os.path.join(d, "events.parquet")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{pq_path}')"
    )
    oracle = {
        r[0]: r
        for r in con.execute(sql).fetchall()
    }
    got = {
        r["event_type"]: (
            r["event_type"],
            r["n_days"],
            r["n_events"],
            r["fano_factor"],
        )
        for r in (
            __import__(
                "presto_truffle_spark.operators.timeseries_advanced",
                fromlist=["events_burstiness_fano"],
            ).events_burstiness_fano(spark, d)
        ).collect()
    }
    assert set(oracle) == set(got)
    for k in oracle:
        assert got[k][1] == oracle[k][1]
        assert got[k][2] == oracle[k][2]
        assert got[k][3] == pytest.approx(oracle[k][3])
