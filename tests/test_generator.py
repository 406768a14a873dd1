"""Generator-parity tests (SURVEY.md §1.4 distributions + JDK Random)."""

from __future__ import annotations

import os

import pytest

from presto_truffle_spark.sources.generator import (
    JavaRandom,
    _bounded_long,
    _ODATE_MAX,
    _START,
    golden_q6,
    part_price_cents,
    shipdate_string,
)


def test_java_random_known_values():
    """Pin the LCG against published java.util.Random(0/42) outputs."""
    assert JavaRandom(0)._next(32) == -1155484576
    assert JavaRandom(42)._next(32) == -1170105035
    assert JavaRandom(0).next_long() == -4962768465676381896


def test_first_rows_match_jdk_replica():
    """First 8 generated rows, recorded from tools/golden_replica/Golden.java
    run under the real JDK (java 17)."""
    expected = [
        (11, 6, 1784767, 92342, 92389),
        (42, 6, 950254, 92588, 92646),
        (24, 5, 1340121, 92983, 93088),
        (42, 10, 1391729, 93443, 93552),
        (3, 4, 598837, 93129, 93233),
        (46, 0, 735976, 93347, 93430),
        (26, 3, 20759, 92123, 92212),
        (6, 2, 705495, 93013, 93016),
    ]
    rng = JavaRandom(0)
    got = []
    for _ in range(8):
        q = rng.next_int_bound(50) + 1
        dc = rng.next_int_bound(11)
        pk = _bounded_long(rng, 2_000_000) + 1
        od = rng.next_int_bound(1 + _ODATE_MAX - _START) + _START
        sd = od + rng.next_int_bound(121) + 1
        got.append((q, dc, pk, od, sd))
    assert got == expected


def test_part_price_formula():
    # TpchDataGenerator.java:122-130 hand-checked examples
    assert part_price_cents(1) == 90000 + 0 + 100
    assert part_price_cents(1000) == 90000 + 100 % 20001 + 0
    assert part_price_cents(2_000_000) == 90000 + (200000 % 20001) + 0


def test_shipdate_string_mapping():
    assert shipdate_string(92001) == "1992-01-01"
    assert shipdate_string(92001 + 366) == "1993-01-01"  # 1992 is leap
    assert shipdate_string(92001 + 731) == "1994-01-01"
    assert shipdate_string(92001 + 59) == "1992-02-29"


def test_golden_q6_small_prefix():
    """100k-row prefix — fast determinism pin (full value from the same
    code path as the 5M run)."""
    rev, n = golden_q6(100_000)
    assert n == 1917  # ≈1.92% selectivity ≈ official TPC-H Q6
    assert rev == 2080687.3685000017


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SLOW"), reason="5M-row run (~15s); set SPARK_GRAFT_SLOW=1"
)
def test_golden_q6_full_matches_jdk_replica():
    """Bit-exact agreement with tools/golden_replica/Golden.java."""
    rev, n = golden_q6(5_000_000)
    assert n == 95326
    assert rev == 1.0316412119370338e8


def test_spark_generator_distributions(spark):
    """The Spark-side generator: value ranges honor the reference spec."""
    from presto_truffle_spark.sources.generator import generate_lineitem_df
    import pyspark.sql.functions as F

    df = generate_lineitem_df(spark, 20_000)
    row = df.agg(
        F.min("l_quantity").alias("qmin"),
        F.max("l_quantity").alias("qmax"),
        F.min("l_discount").alias("dmin"),
        F.max("l_discount").alias("dmax"),
        F.min("l_shipdate").alias("smin"),
        F.max("l_shipdate").alias("smax"),
        F.min("l_extendedprice").alias("pmin"),
    ).collect()[0]
    assert row["qmin"] >= 1 and row["qmax"] <= 50
    assert row["dmin"] >= 0.0 and row["dmax"] <= 0.10
    assert str(row["smin"]) >= "1992-01-02" and str(row["smax"]) <= "1998-12-31"
    assert row["pmin"] >= 900.0  # 90000 cents minimum part price × qty≥1 / 100


def test_events_ts_non_null_contract(spark, sf_dir):
    """events.ts is NOT NULL by generator construction — a contract two
    r17 rewrites lean on (ADVICE r17): events_peak_concurrency's
    isnotnull(bucket) stage-reuse filter and events_anomaly_mad's window
    partitioning silently drop/regroup null-ts rows if one ever appears.
    Pin the invariant at the fixture so a future nullable ts fails loudly
    here instead of diverging from the oracle."""
    from presto_truffle_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    assert ev.filter(ev.ts.isNull()).count() == 0
