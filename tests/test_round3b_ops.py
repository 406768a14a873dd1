"""Invariant + plan-shape tests for the late-round-3 operator batch
(timeseries_advanced / matching_ops / lakehouse_ops).

Differential correctness is tools/selfcheck.py's job; these tests pin the
*structural* claims the docstrings make — locality bounds of the Z-order
layout, no-cartesian plans for the pair joins, gap-free/LOCF invariants —
so a regression that keeps values right but breaks the scale posture
still fails CI."""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_truffle_spark.plans import inspect


def test_zorder_buckets_bound_both_dimensions(spark, sf_dir):
    """Each 2^20-wide z-bucket must cover at most a 1024-wide span in BOTH
    interleaved dimensions — that bounded square is the entire point of
    the layout (per-file min/max stats prune on either column)."""
    from presto_truffle_spark.operators.lakehouse_ops import sink_zorder_layout

    rows = sink_zorder_layout(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.max_custkey - r.min_custkey <= 1023
        assert r.max_day - r.min_day <= 1023


def test_cosine_pairs_plan_has_no_cartesian(spark, sf_dir):
    """The inverted-index similarity join must never fall back to a
    cartesian/broadcast-nested-loop pair enumeration."""
    from presto_truffle_spark.operators.matching_ops import text_cosine_pairs

    plan = inspect.physical_plan(text_cosine_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # Every join must be hash-based on an equi-key (SortMerge/ShuffledHash/
    # BroadcastHash — which of the three the planner picks depends on size
    # estimates, e.g. whether the postings cache is already materialized).
    # The ONLY nested-loop join allowed is the 1-row corpus-count Cross
    # broadcast for the relative df cap.
    equi = sum(
        plan.count(j)
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )
    assert equi >= 3  # token pair join + two set-size joins
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line  # the 1-row count broadcast, nothing else


def test_fuzzy_match_plan_has_no_cartesian(spark, sf_dir):
    """Blocked fuzzy matching joins on the block key (equi-join with a
    residual levenshtein filter), not an all-pairs product."""
    from presto_truffle_spark.operators.matching_ops import fuzzy_match_blocked

    plan = inspect.physical_plan(fuzzy_match_blocked(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_gapfill_grid_is_gap_free_and_locf_monotone(spark, sf_dir):
    """Every user's grid must be hour-contiguous from its min to max
    bucket (no holes), and n_events=0 rows must carry forward the prior
    LOCF value (never null)."""
    from presto_truffle_spark.operators.timeseries_advanced import (
        events_gapfill_locf,
    )

    df = events_gapfill_locf(spark, sf_dir)
    per_user = df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            (
                F.unix_timestamp(F.max("hour_start"))
                - F.unix_timestamp(F.min("hour_start"))
            )
            / 3600
            + 1
        ).alias("expected"),
    )
    bad = per_user.where(F.col("n_rows") != F.col("expected")).count()
    assert bad == 0
    assert df.where(F.col("locf_value_cents").isNull()).count() == 0


def test_rollup_cascade_matches_direct_aggregation(spark, sf_dir):
    """The minute→hour→day merge must be lossless vs aggregating raw
    events straight to day grain (count/sum/min/max all mergeable)."""
    from presto_truffle_spark.catalog import load_table
    from presto_truffle_spark.operators.timeseries_advanced import (
        events_rollup_cascade,
    )

    cascade = {
        (r.day, r.event_type): (r.n_events, r.total_cents, r.min_value, r.max_value)
        for r in events_rollup_cascade(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    direct = (
        e.groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("cents"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    )
    assert cascade == {
        (r.day, r.event_type): (r.n, r.cents, r.mn, r.mx) for r in direct
    }


def test_recursive_cte_calendar_is_gap_free(spark, sf_dir):
    """80 consecutive month starts, no duplicates, zero-order months
    included as explicit rows."""
    from presto_truffle_spark.operators.timeseries_advanced import (
        sql_recursive_cte,
    )

    rows = sql_recursive_cte(spark, sf_dir).collect()
    months = sorted(r.month_start for r in rows)
    assert len(months) == 80 and len(set(months)) == 80
    assert months[0].isoformat() == "1995-01-01"
    assert months[-1].isoformat() == "2001-08-01"
    assert all(m.day == 1 for m in months)


def test_interpolation_agrees_with_locf_at_observations(spark, sf_dir):
    """Observed grid points must pass the raw hourly value through
    untouched, and interpolated values must lie within [min(prev, next),
    max(prev, next)] — a straight line never overshoots its endpoints."""
    from presto_truffle_spark.operators.timeseries_advanced import (
        events_gapfill_locf,
        events_interpolate_linear,
    )

    interp = events_interpolate_linear(spark, sf_dir)
    locf = events_gapfill_locf(spark, sf_dir)
    joined = interp.join(locf, ["user_id", "hour_start"])
    # At observed points LOCF carries the same hourly cents the
    # interpolation must reproduce.
    mismatch = joined.where(
        F.col("observed") & (F.col("interp_cents") != F.col("locf_value_cents"))
    ).count()
    assert mismatch == 0
    assert interp.where(F.col("interp_cents").isNull()).count() == 0


def test_retention_day0_equals_cohort_sizes(spark, sf_dir):
    """Offset-0 cell of each cohort must equal the cohort's size (every
    user is active on their own first day), and no offset is negative."""
    from presto_truffle_spark.catalog import load_table
    from presto_truffle_spark.operators.timeseries_advanced import (
        events_retention_cohorts,
    )

    df = events_retention_cohorts(spark, sf_dir)
    assert df.where(F.col("day_offset") < 0).count() == 0
    day0 = {
        r.cohort_day: r.active_users
        for r in df.where(F.col("day_offset") == 0).collect()
    }
    e = load_table(spark, sf_dir, "events")
    cohort_sizes = (
        e.select("user_id", F.date_trunc("day", "ts").cast("date").alias("day"))
        .groupBy("user_id")
        .agg(F.min("day").alias("cohort_day"))
        .groupBy("cohort_day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert day0 == {r.cohort_day: r.n for r in cohort_sizes}


def test_path_transitions_conserve_events(spark, sf_dir):
    """Σ transitions must equal Σ events − #users (each user's event chain
    of length k yields exactly k−1 transitions)."""
    from presto_truffle_spark.catalog import load_table
    from presto_truffle_spark.operators.timeseries_advanced import (
        events_path_transitions,
    )

    total = (
        events_path_transitions(spark, sf_dir)
        .agg(F.sum("n_transitions"))
        .collect()[0][0]
    )
    e = load_table(spark, sf_dir, "events")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    assert total == n_events - n_users


def test_lateral_topk_matches_window_form(spark, sf_dir):
    """The LATERAL ORDER BY/LIMIT form must agree with the rank-filter
    (window) spelling of per-group top-k."""
    from presto_truffle_spark.catalog import load_table
    from presto_truffle_spark.operators.matching_ops import join_lateral_topk

    lateral = {
        (r.n_name, r.c_name) for r in join_lateral_topk(spark, sf_dir).collect()
    }
    from pyspark.sql import Window as W

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    window_form = {
        (r.n_name, r.c_name)
        for r in (
            c.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
            .select("n_name", "c_name")
            .collect()
        )
    }
    assert lateral == window_form
