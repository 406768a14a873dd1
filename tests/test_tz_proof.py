"""Zone-proofness: batch results must be identical under any session
timezone (VERDICT r4 items 3/8).

The driver owns the SparkSession, so ``spark.sql.session.timeZone`` is an
environment fact, not something we control. r4 proved the failure mode
live: ``events_gapfill_locf`` diverged on 59,950/105,171 rows under a
non-UTC session because the events ``ts`` was cast NTZ->LTZ. The r5 fix
keeps batch time arithmetic NTZ end-to-end (tztime.py); these tests pin
that by running the formerly-fragile queries under a deliberately hostile
zone (America/Los_Angeles — has DST transitions inside the fixture's time
range) and diffing collected values against a UTC run of the same query.

The full-breadth equivalent is ``tools/selfcheck.py --tz`` (run over every
query each round); these pytest legs keep the core kernels honest in CI.
"""

from __future__ import annotations

import pytest

from presto_truffle_spark.operators.timeseries import (
    events_sessionize_islands,
    events_tumbling_window,
)
from presto_truffle_spark.operators.timeseries_advanced import (
    events_gapfill_locf,
    events_rollup_cascade,
)
from presto_truffle_spark.operators.scalar_funcs import scalar_date_funcs

_HOSTILE_TZ = "America/Los_Angeles"


def _collect_under(spark, sf_dir, fn, tz):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        df = fn(spark, sf_dir)
        return sorted(map(tuple, df.collect())), df.dtypes
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


@pytest.mark.parametrize(
    "fn",
    [
        events_gapfill_locf,
        events_rollup_cascade,
        events_tumbling_window,
        events_sessionize_islands,
        scalar_date_funcs,
    ],
    ids=lambda f: f.__name__,
)
def test_batch_query_is_session_tz_invariant(spark, sf_dir, fn):
    utc_rows, utc_types = _collect_under(spark, sf_dir, fn, "UTC")
    la_rows, la_types = _collect_under(spark, sf_dir, fn, _HOSTILE_TZ)
    assert utc_types == la_types
    assert utc_rows == la_rows


def test_trunc_ntz_matches_duckdb_date_trunc(spark):
    """tztime.trunc_ntz must agree with DuckDB's date_trunc on naive
    timestamps across 1900-2100 — including PRE-1970 values, where a
    plain `%` would round toward zero instead of flooring (pmod fix),
    and the Thursday-epoch week shift."""
    import datetime

    import duckdb

    from presto_truffle_spark.tztime import trunc_ntz

    # deterministic spread: pre-epoch, epoch edge, DST-adjacent, far future
    samples = [
        datetime.datetime(1901, 2, 3, 4, 5, 6, 789012),
        datetime.datetime(1969, 12, 31, 23, 59, 59, 999999),
        datetime.datetime(1970, 1, 1, 0, 0, 0, 0),
        datetime.datetime(1970, 1, 1, 0, 0, 0, 1),
        datetime.datetime(2024, 3, 10, 2, 30, 0, 500000),
        datetime.datetime(2024, 11, 3, 1, 30, 0, 1),
        datetime.datetime(2031, 6, 15, 13, 59, 59, 123456),
        datetime.datetime(2099, 12, 31, 23, 0, 1, 0),
    ]
    df = spark.createDataFrame([(t,) for t in samples], "ts timestamp_ntz")
    con = duckdb.connect()
    for unit in ("minute", "hour", "day", "week"):
        got = {
            r[0]: r[1]
            for r in df.select(
                "ts", trunc_ntz(unit, "ts").alias("b")
            ).collect()
        }
        for t in samples:
            # CAST: DuckDB returns DATE for day/week grains
            want = con.execute(
                f"SELECT CAST(date_trunc('{unit}', TIMESTAMP '{t}') AS TIMESTAMP)"
            ).fetchone()[0]
            assert got[t] == want, (unit, t, got[t], want)


def test_ts_stays_ntz_end_to_end(spark, sf_dir):
    """The events scan itself must surface ts as TIMESTAMP_NTZ — any LTZ
    appearance upstream of a collect reintroduces the session-zone
    dependence the whole family was purged of."""
    from presto_truffle_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    assert dict(e.dtypes)["ts"] == "timestamp_ntz"
    out = events_gapfill_locf(spark, sf_dir)
    assert dict(out.dtypes)["hour_start"] == "timestamp_ntz"
