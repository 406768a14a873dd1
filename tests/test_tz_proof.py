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


def test_ts_stays_ntz_end_to_end(spark, sf_dir):
    """The events scan itself must surface ts as TIMESTAMP_NTZ — any LTZ
    appearance upstream of a collect reintroduces the session-zone
    dependence the whole family was purged of."""
    from presto_truffle_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    assert dict(e.dtypes)["ts"] == "timestamp_ntz"
    out = events_gapfill_locf(spark, sf_dir)
    assert dict(out.dtypes)["hour_start"] == "timestamp_ntz"
