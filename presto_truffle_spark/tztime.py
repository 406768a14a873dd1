"""Timezone-proof time arithmetic over TIMESTAMP_NTZ columns.

The events fixture's parquet ``ts`` is a naive timestamp (no zone), which
PySpark 4 loads as TIMESTAMP_NTZ. The DuckDB oracles treat it as a naive
TIMESTAMP. The only way the two engines can diverge is if the Spark side
ever round-trips through TIMESTAMP (LTZ): any NTZ->LTZ step interprets the
naive value in ``spark.sql.session.timeZone`` — which the DRIVER owns and
we cannot pin — and several builtins do that implicitly:

  * ``date_trunc`` on NTZ input returns LTZ (implicit cast first), so its
    result shifts with the session zone (and is lossy across DST gaps);
  * ``date_format`` implicitly casts the same way;
  * ``unix_micros``/``unix_millis``/``unix_timestamp`` refuse NTZ input
    outright (DATATYPE_MISMATCH), so every epoch read needs a helper.

VERDICT r4 proved this class of bug live: ``events_gapfill_locf`` diverged
on 59,950/105,171 rows under a non-UTC session. These helpers keep every
batch computation inside NTZ/bigint arithmetic, where no session-zone
exists at all:

  * ``epoch_us/ms/s`` — micros/millis/secs since 1970-01-01 of the NAIVE
    value (``timestamp_diff`` between two NTZ values is pure calendar
    arithmetic), matching DuckDB's ``epoch(naive_ts)`` convention;
  * ``trunc_ntz`` — minute/hour/day/week truncation via epoch arithmetic,
    returning NTZ (epoch-aligned, like ``time_bucket``);
  * extraction functions (``year``/``hour``/``CAST(ts AS DATE)``) are
    already zone-stable on NTZ (verified under a deliberately non-UTC
    session — tests/test_tz_proof.py) and need no wrapper.

Streaming is the one place LTZ survives: watermarks REQUIRE TimestampType
(EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), so the streaming sources cast
NTZ->LTZ — see streaming/windows.py for how that path pins its zone.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["EPOCH_NTZ", "epoch_us", "epoch_ms", "epoch_s", "trunc_ntz", "ntz"]


def EPOCH_NTZ() -> Column:
    """1970-01-01T00:00 as a TIMESTAMP_NTZ literal column."""
    return F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'")


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def epoch_us(c) -> Column:
    """Microseconds since epoch of a naive (NTZ) timestamp — zone-free."""
    return F.timestamp_diff("MICROSECOND", EPOCH_NTZ(), _col(c))


def epoch_ms(c) -> Column:
    return F.timestamp_diff("MILLISECOND", EPOCH_NTZ(), _col(c))


def epoch_s(c) -> Column:
    return F.timestamp_diff("SECOND", EPOCH_NTZ(), _col(c))


_UNIT_US = {
    "second": 1_000_000,
    "minute": 60 * 1_000_000,
    "hour": 3_600 * 1_000_000,
    "day": 86_400 * 1_000_000,
    # ISO week: 1970-01-01 was a Thursday; shift by 3 days so buckets start
    # on Monday, mirroring date_trunc('week').
    "week": 7 * 86_400 * 1_000_000,
}
_WEEK_SHIFT_US = 3 * 86_400 * 1_000_000


def trunc_ntz(unit: str, c) -> Column:
    """Truncate an NTZ timestamp to second/minute/hour/day/week, staying
    NTZ end-to-end (epoch-aligned fixed-width buckets — identical to
    ``date_trunc`` for sub-day units and for day/week on naive inputs,
    but with no session-zone dependence).

    ``pmod``, not ``%``: the sign of ``%`` follows the dividend, so plain
    modulo would round PRE-1970 timestamps toward zero (up) instead of
    flooring — pmod keeps the bucket start at-or-before the value on
    both sides of the epoch (property-tested against DuckDB date_trunc
    over 1900-2100 in tests/test_tz_proof.py)."""
    step = _UNIT_US[unit]
    us = epoch_us(c)
    if unit == "week":
        us = us + F.lit(_WEEK_SHIFT_US)
    bucket = us - F.pmod(us, F.lit(step))
    if unit == "week":
        bucket = bucket - F.lit(_WEEK_SHIFT_US)
    return F.timestamp_add("MICROSECOND", bucket, EPOCH_NTZ())


def ntz(c) -> Column:
    """Cast a column to TIMESTAMP_NTZ (for typed NULL literals and unions
    against NTZ event columns)."""
    return _col(c).cast("timestamp_ntz")
