"""Advanced time-series operators: gap filling with LOCF, cascading
(hypertable-style) rollups, and a recursive-CTE calendar join.

[EXT] surface — the time-series capability layer past the basic window
aggregates in ``timeseries.py``. These are the shapes a TimescaleDB /
InfluxDB user expects from an analytics engine: a gap-free per-key grid
with last-observation-carried-forward, continuous-aggregate rollups that
merge partials instead of rescanning raw data, and gap-free calendar
reporting (Spark 4 ``WITH RECURSIVE``).

Scale posture:
  * Gap-fill generates the grid *per key* with ``sequence()`` — grid size
    is (span/granularity) rows per key, produced executor-side, never on
    the driver; the fill window and the join both shuffle on the same
    ``user_id`` key, so AQE coalesces them into one exchange.
  * The rollup cascade re-aggregates hour partials from minute partials
    (sum-of-sums / min-of-mins / count-of-counts over exact cent values),
    which is the merge path an incremental 100 TB rollup pipeline uses —
    each cascade level processes the *previous level's output* (tiny),
    not the raw events.
  * The recursive CTE generates a bounded calendar (driver-side fixpoint
    over a few dozen rows) and left-joins facts to it; the fact side
    aggregates before the join, so the recursion never touches raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from presto_truffle_spark.catalog import load_table, register_views
from presto_truffle_spark.registry import query
from presto_truffle_spark.tztime import epoch_s, trunc_ntz


@query(
    "events_gapfill_locf",
    oracle="""
    WITH hourly AS (
        SELECT user_id,
               time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS bucket,
               count(*) AS n,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v_cents
        FROM events
        GROUP BY 1, 2
    ),
    span AS (
        SELECT user_id, min(bucket) AS mn, max(bucket) AS mx
        FROM hourly GROUP BY 1
    ),
    grid AS (
        SELECT user_id,
               unnest(generate_series(mn, mx, INTERVAL '1 hour')) AS bucket
        FROM span
    )
    SELECT g.user_id,
           g.bucket AS hour_start,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n_events,
           CAST(coalesce(
               last_value(h.v_cents IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               0) AS BIGINT) AS locf_value_cents
    FROM grid g
    LEFT JOIN hourly h ON g.user_id = h.user_id AND g.bucket = h.bucket
    """,
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user gap-free hourly grid with LOCF (last observation carried
    forward) — the timeseries-DB ``gapfill`` + ``locf`` primitive.

    Plan: hourly aggregate (1 shuffle on user_id+bucket) → per-user span
    (agg on user_id) → ``sequence()`` + ``explode`` generates the grid
    executor-side → left join back → LOCF via a running ``last(ignorenulls)``
    window. Grid generation is O(span/granularity) per key and never
    touches the driver; every shuffle is keyed by user_id, so the join and
    the fill window reuse one exchange. Sums are exact cent integers so
    LOCF output is bit-identical across engines.
    """
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            "user_id", trunc_ntz("hour", "ts").alias("bucket")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("v_cents"),
        )
    )
    span = hourly.groupBy("user_id").agg(
        F.min("bucket").alias("mn"), F.max("bucket").alias("mx")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("mn", "mx", F.expr("INTERVAL '1' HOUR"))
        ).alias("bucket"),
    )
    fill_w = (
        W.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            F.col("bucket").alias("hour_start"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
            F.coalesce(
                F.last("v_cents", ignorenulls=True).over(fill_w),
                F.lit(0),
            ).alias("locf_value_cents"),
        )
    )


@query(
    "events_rollup_cascade",
    oracle="""
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
           floor(min(value) * 1000000 + 0.5) / 1000000 AS min_value,
           floor(max(value) * 1000000 + 0.5) / 1000000 AS max_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate cascade: minute partials → hour partials → day
    rollup, merging at each level (count-of-counts, sum-of-sums,
    min-of-mins, max-of-maxes) instead of rescanning raw events.

    This is the incremental-rollup merge path of a hypertable continuous
    aggregate: at 100 TB the minute level is maintained incrementally by
    the streaming layer and each coarser level aggregates the *previous
    level's output* (≤ 1/60th the rows), so refreshing a day rollup never
    touches raw data. The oracle aggregates raw events directly at day
    grain, proving the cascade's merge functions are lossless. Sums are
    exact cent integers, so merge order cannot perturb the result.
    """
    e = load_table(spark, sf_dir, "events")
    minute = (
        e.groupBy(
            trunc_ntz("minute", "ts").alias("minute"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("cents"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
    )
    hour = (
        minute.groupBy(
            trunc_ntz("hour", "minute").alias("hour"), "event_type"
        ).agg(
            F.sum("n").alias("n"),
            F.sum("cents").alias("cents"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )
    return (
        hour.groupBy(
            trunc_ntz("day", "hour").cast("date").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("cents").alias("total_cents"),
            # 6dp envelope on BOTH sides (FIXTURES.md float convention):
            # min/max pick stored doubles exactly, but the hashed output
            # format must not depend on either engine's double repr tail.
            (F.floor(F.min("mn") * 1000000 + F.lit(0.5)) / 1000000).alias(
                "min_value"
            ),
            (F.floor(F.max("mx") * 1000000 + F.lit(0.5)) / 1000000).alias(
                "max_value"
            ),
        )
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH user_days AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
        FROM events
    ),
    cohorts AS (
        SELECT user_id, min(day) AS cohort_day FROM user_days GROUP BY 1
    )
    SELECT c.cohort_day,
           CAST(date_diff('day', c.cohort_day, d.day) AS BIGINT) AS day_offset,
           count(*) AS active_users
    FROM cohorts c
    JOIN user_days d ON c.user_id = d.user_id
    GROUP BY 1, 2
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active day, counted
    on each subsequent day they return — the (cohort, day-offset) triangle
    every product-analytics stack computes.

    Plan: distinct (user, day) → cohort as ``min(day) OVER (PARTITION BY
    user_id)`` → count per (cohort, offset). The window REPLACES the r4
    groupBy+self-join spelling: that shape recomputed the scan+distinct
    pipeline for both consumers (r5 rescan audit, SCALING.md — zero
    exchange reuse at execution), while the window reads the distinct
    output once. Same three exchanges, half the scans/distincts; the
    distinct collapses raw events ~1000× before anything else runs. No
    count distinct at the end: the user_days input is already distinct
    per (user, day), so count(*) IS the distinct user count per cell.
    """
    e = load_table(spark, sf_dir, "events")
    user_days = e.select(
        "user_id", trunc_ntz("day", "ts").cast("date").alias("day")
    ).distinct()
    return (
        user_days.withColumn(
            "cohort_day", F.min("day").over(W.partitionBy("user_id"))
        )
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("bigint").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@query(
    "events_path_transitions",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type, count(*) AS n_transitions
    FROM ordered
    WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def events_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order path analysis: counts of consecutive event-type
    transitions per user (the Markov transition matrix behind funnel and
    journey analytics). Ordering ties broken by event_id so the lag is
    deterministic under timestamp collisions.

    One shuffle on user_id for the lag window; the transition count then
    aggregates (type, type) pairs — a tiny key space, so the second
    shuffle moves |types|² partials per task regardless of event volume.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        ordered.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@query(
    "events_interpolate_linear",
    oracle="""
    WITH hourly AS (
        SELECT user_id,
               time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS bucket,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v_cents
        FROM events
        GROUP BY 1, 2
    ),
    span AS (
        SELECT user_id, min(bucket) AS mn, max(bucket) AS mx
        FROM hourly GROUP BY 1
    ),
    grid AS (
        SELECT user_id,
               unnest(generate_series(mn, mx, INTERVAL '1 hour')) AS bucket
        FROM span
    ),
    joined AS (
        SELECT g.user_id, g.bucket, h.v_cents,
               CAST(epoch(g.bucket) AS BIGINT) AS t
        FROM grid g
        LEFT JOIN hourly h ON g.user_id = h.user_id AND g.bucket = h.bucket
    ),
    edged AS (
        SELECT user_id, bucket, v_cents, t,
               last_value(v_cents IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_prev,
               last_value(CASE WHEN v_cents IS NOT NULL THEN t END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t_prev,
               first_value(v_cents IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v_next,
               first_value(CASE WHEN v_cents IS NOT NULL THEN t END
                           IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS t_next
        FROM joined
    )
    SELECT user_id, bucket AS hour_start,
           v_cents IS NOT NULL AS observed,
           CAST(CASE
               WHEN v_cents IS NOT NULL THEN v_cents
               WHEN v_prev IS NULL THEN v_next
               WHEN v_next IS NULL THEN v_prev
               ELSE v_prev + ((v_next - v_prev) * (t - t_prev))
                             // (t_next - t_prev)
           END AS BIGINT) AS interp_cents
    FROM edged
    """,
)
def events_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the per-user hourly grid — the smooth
    companion to events_gapfill_locf: missing hours get the straight-line
    value between the surrounding observations (LOCF/NOCB at the edges).

    Determinism by construction: observations are exact cent integers and
    the interpolation is pure BIGINT arithmetic — ``v_prev + (Δv · Δt) div
    span`` — so there is no FP rounding to diverge between engines.
    Prev/next observation values and timestamps come from four
    ignore-nulls running windows (two forward, two backward), all
    partitioned on user_id: the whole operator costs the same single
    user-keyed shuffle as the LOCF variant, just with two window passes
    over it (Spark evaluates the forward and backward frames in two sorts
    of the same partition, no extra exchange).
    """
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "user_id", trunc_ntz("hour", "ts").alias("bucket")
    ).agg(
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("v_cents")
    )
    span = hourly.groupBy("user_id").agg(
        F.min("bucket").alias("mn"), F.max("bucket").alias("mx")
    )
    grid = span.select(
        "user_id",
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL '1' HOUR"))).alias(
            "bucket"
        ),
    )
    joined = grid.join(hourly, ["user_id", "bucket"], "left").select(
        "user_id",
        "bucket",
        "v_cents",
        epoch_s("bucket").alias("t"),
    )
    fwd = (
        W.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # The backward fill is a DESC-ordered GROWING frame on purpose: Spark
    # evaluates (currentRow → unboundedFollowing) frames non-incrementally
    # (re-aggregating the remainder per row, O(n²) per partition — measured
    # 13 s vs 1 s at sf0.1), while (unboundedPreceding → currentRow) is the
    # incremental O(n) path. last() over DESC ≡ first() over following.
    bwd = (
        W.partitionBy("user_id")
        .orderBy(F.col("bucket").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    t_obs = F.when(F.col("v_cents").isNotNull(), F.col("t"))
    edged = joined.select(
        "user_id",
        "bucket",
        "v_cents",
        "t",
        F.last("v_cents", ignorenulls=True).over(fwd).alias("v_prev"),
        F.last(t_obs, ignorenulls=True).over(fwd).alias("t_prev"),
        F.last("v_cents", ignorenulls=True).over(bwd).alias("v_next"),
        F.last(t_obs, ignorenulls=True).over(bwd).alias("t_next"),
    )
    interp = (
        F.when(F.col("v_cents").isNotNull(), F.col("v_cents"))
        .when(F.col("v_prev").isNull(), F.col("v_next"))
        .when(F.col("v_next").isNull(), F.col("v_prev"))
        .otherwise(
            F.col("v_prev")
            + F.expr(
                "((v_next - v_prev) * (t - t_prev)) div (t_next - t_prev)"
            )
        )
    )
    return edged.select(
        "user_id",
        F.col("bucket").alias("hour_start"),
        F.col("v_cents").isNotNull().alias("observed"),
        interp.cast("bigint").alias("interp_cents"),
    )


@query(
    "window_rolling_median",
    oracle="""
    WITH cents AS (
        SELECT user_id, ts, event_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        FROM events
    )
    SELECT user_id, event_id,
           quantile_cont(v, 0.5) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 24 PRECEDING AND CURRENT ROW) AS rolling_median
    FROM cents
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median of event value over each user's trailing 25
    events — the robust smoother dashboards want where a rolling mean
    chases outliers.

    percentile() runs as a windowed aggregate over a bounded ROWS frame:
    per-row cost is the 25-element frame (O(n·w) per key, fine for any
    constant w; an unbounded frame would be the quadratic trap the
    interpolation operator documents). Exactness: cent-integer inputs
    make every interpolated median a multiple of 0.5 — exactly
    representable, so Spark's percentile() and DuckDB's quantile_cont()
    cannot diverge. One shuffle on user_id.
    """
    e = load_table(spark, sf_dir, "events")
    cents = e.select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-24, W.currentRow)
    )
    return cents.select(
        "user_id",
        "event_id",
        F.expr("percentile(v, 0.5)").over(w).alias("rolling_median"),
    )


@query(
    "events_hll_sliding_distinct",
    oracle="""
    WITH user_days AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
        FROM events
    ),
    calendar AS (SELECT DISTINCT day FROM user_days),
    exact AS (
        SELECT c.day, count(DISTINCT u.user_id) AS exact_n
        FROM calendar c
        JOIN user_days u
          ON u.day <= c.day AND u.day >= c.day - INTERVAL 6 DAY
        GROUP BY 1
    )
    SELECT day, exact_n AS exact_users_7d, true AS within_5pct
    FROM exact
    """,
)
def events_hll_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct users via MERGEABLE HLL sketches: one
    sketch per day, each report day unions its trailing 7 days' sketches
    — the incremental path for rolling distinct counts at 100 TB, where
    re-scanning 7 days of raw events per report day (what the exact
    twin events_rolling_distinct_users does) is unaffordable. Day
    sketches are built once and merged 7×; a new day costs one sketch
    build + 7 unions, never a rescan.

    Envelope oracle (repo convention for sketch ops): the output carries
    the EXACT rolling count (computed by the same contribute-forward
    explode, so the hash check pins real values) plus a boolean asserting
    the HLL estimate lands within 5% of it — deterministic because HLL
    sketch construction and max-merge are order-independent for a fixed
    input multiset.

    ``user_days`` feeds FOUR consumers (day sketches, the calendar, and
    both sides of the exact branch); without a persist each re-runs the
    corpus scan + distinct shuffle (r5 rescan audit: zero exchange reuse
    at execution). The cached frame is the ~1000×-reduced user-day set,
    so MEMORY_AND_DISK is tiny relative to the scan it saves. Cached via
    ``scoped_persist`` — one live frame per site, the previous
    invocation's cache released on re-entry (ADVICE r5).
    """
    from presto_truffle_spark.cache import scoped_persist

    e = load_table(spark, sf_dir, "events")
    user_days = scoped_persist(
        spark,
        "tsa.hll_sliding.user_days",
        e.select(
            "user_id", trunc_ntz("day", "ts").cast("date").alias("day")
        ).distinct(),
    )
    day_sketch = user_days.groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    calendar = user_days.select("day").distinct()
    contributes = day_sketch.select(
        "sk",
        F.explode(
            F.sequence("day", F.date_add("day", 6), F.expr("INTERVAL '1' DAY"))
        ).alias("report_day"),
    )
    merged = (
        contributes.join(calendar, contributes.report_day == calendar.day)
        .groupBy("day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx"))
    )
    exact = (
        user_days.select(
            "user_id",
            F.explode(
                F.sequence(
                    "day", F.date_add("day", 6), F.expr("INTERVAL '1' DAY")
                )
            ).alias("report_day"),
        )
        .join(calendar, F.col("report_day") == calendar.day)
        .select("day", "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("exact_users_7d"))
    )
    return exact.join(merged, "day").select(
        "day",
        "exact_users_7d",
        (
            F.abs(F.col("approx") - F.col("exact_users_7d"))
            <= 0.05 * F.col("exact_users_7d")
        ).alias("within_5pct"),
    )


@query(
    "events_pattern_match",
    oracle="""
    WITH coded AS (
        SELECT user_id,
               string_agg(CASE event_type
                   WHEN 'signup' THEN 's' WHEN 'view' THEN 'v'
                   WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
                   ELSE 'e' END, '' ORDER BY ts, event_id) AS seq
        FROM events
        GROUP BY 1
    )
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS seq_len,
           CAST(len(regexp_extract_all(seq, 's[vc]*p')) AS BIGINT)
               AS n_conversions,
           CAST(len(regexp_extract_all(seq, 'e{2,}')) AS BIGINT)
               AS n_error_bursts
    FROM coded
    """,
)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style row-pattern matching over per-user event
    sequences: each user's ordered event types become a one-char-coded
    string, and SQL regexes count pattern occurrences — here conversion
    runs ``signup (view|click)* purchase`` and error bursts ``e{2,}``.

    Neither engine ships MATCH_RECOGNIZE; the coded-sequence + regex
    emulation gives the same class of single-pass, non-overlapping greedy
    matches for regular patterns. The sequence is built with an ORDER
    BY-deterministic aggregation ((ts, event_id) tie-break; Spark side
    sorts (k, code) structs inside each group — one shuffle on user_id,
    sequence length bounded by per-user event count, so memory is the
    same per-key bound every per-key collect in this repo documents.
    Both engines' regex engines agree on these simple greedy patterns.
    """
    e = load_table(spark, sf_dir, "events")
    code = (
        F.when(F.col("event_type") == "signup", "s")
        .when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .otherwise("e")
    )
    coded = (
        e.select(
            "user_id",
            F.struct("ts", "event_id", code.alias("code")).alias("k"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("k")), lambda x: x["code"]
                ),
                "",
            ).alias("seq")
        )
    )
    return coded.select(
        "user_id",
        F.length("seq").cast("bigint").alias("seq_len"),
        F.size(F.expr("regexp_extract_all(seq, 's[vc]*p', 0)"))
        .cast("bigint")
        .alias("n_conversions"),
        F.size(F.expr("regexp_extract_all(seq, 'e{2,}', 0)"))
        .cast("bigint")
        .alias("n_error_bursts"),
    )


@query(
    "events_session_pattern",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS boundary
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, event_type, ts, event_id,
               sum(boundary) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM ordered
    ),
    coded AS (
        SELECT user_id, session_id,
               string_agg(CASE event_type
                   WHEN 'signup' THEN 's' WHEN 'view' THEN 'v'
                   WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
                   ELSE 'e' END, '' ORDER BY ts, event_id) AS seq
        FROM sess
        GROUP BY 1, 2
    )
    SELECT user_id,
           count(*) AS n_sessions,
           CAST(sum(CASE WHEN regexp_matches(seq, '[vc].*p') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_converting_sessions,
           CAST(max(length(seq)) AS BIGINT) AS longest_session
    FROM coded
    GROUP BY 1
    """,
)
def events_session_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped pattern matching: sessionize (30-minute inactivity
    gaps), code each session's events into a string, and count sessions
    whose WITHIN-SESSION journey matches browse-then-buy ``[vc].*p`` —
    the per-visit conversion question events_pattern_match's whole-user
    sequence cannot answer (a view on Monday doesn't 'convert' via a
    purchase on Friday).

    Composition of two verified kernels: the gaps-and-islands session
    assignment (boundary flag + running sum, as events_sessionize_islands)
    and the coded-sequence regex (as events_pattern_match) — all windows
    and both aggregations keyed on user_id, one shuffle total.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    boundary = (
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                epoch_s("ts") - epoch_s(F.lag("ts").over(w))
                > 1800
            ),
            1,
        )
        .otherwise(0)
    )
    run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    code = (
        F.when(F.col("event_type") == "signup", "s")
        .when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .otherwise("e")
    )
    sess = e.select(
        "user_id",
        "ts",
        "event_id",
        code.alias("code"),
        F.sum(boundary).over(run).alias("session_id"),
    )
    coded = (
        sess.select(
            "user_id",
            "session_id",
            F.struct("ts", "event_id", "code").alias("k"),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("k")), lambda x: x["code"]
                ),
                "",
            ).alias("seq")
        )
    )
    return coded.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(
            F.when(F.col("seq").rlike("[vc].*p"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_converting_sessions"),
        F.max(F.length("seq")).cast("bigint").alias("longest_session"),
    )


@query(
    "events_bitemporal_asof",
    oracle="""
    WITH versioned AS (
        SELECT user_id, ts, event_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_cents,
               CAST(event_id % 4 AS BIGINT) AS sys_batch
        FROM events
    ),
    versions(sys_version) AS (VALUES (CAST(0 AS BIGINT)), (1), (2), (3)),
    visible AS (
        SELECT ver.sys_version, v.user_id, v.ts, v.event_id, v.v_cents
        FROM versioned v JOIN versions ver
          ON v.sys_batch <= ver.sys_version
        WHERE v.ts <= TIMESTAMP '2024-01-15 00:00:00'
    ),
    ranked AS (
        SELECT sys_version, user_id, v_cents,
               row_number() OVER (
                   PARTITION BY sys_version, user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM visible
    )
    SELECT sys_version, user_id, v_cents AS asof_value_cents
    FROM ranked WHERE rn = 1
    """,
)
def events_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal as-of: "what did we BELIEVE (as of system version S) the
    latest value per user was AT valid time T?" — the two-axis time-travel
    query of bitemporal tables (valid time = event ts, system time =
    ingestion batch, here event_id mod 4 as the deterministic batch
    stand-in).

    For each of the 4 system versions, rows visible are those ingested in
    batches ≤ S; within them, the as-of answer at T is the latest
    (ts, event_id) ≤ T — picked by row_number, deterministic tie-break.
    The version axis is a 4-row broadcast cross join (never a data copy);
    at scale the visible-set filter is a partition-prune on the ingestion
    batch column, so asking "as of last Tuesday" reads only the
    partitions that existed last Tuesday.
    """
    e = load_table(spark, sf_dir, "events")
    versioned = e.select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v_cents"),
        (F.col("event_id") % 4).cast("bigint").alias("sys_batch"),
    ).where(F.col("ts") <= F.lit("2024-01-15 00:00:00"))
    versions = spark.range(4).select(F.col("id").cast("bigint").alias("sys_version"))
    visible = versioned.join(
        F.broadcast(versions),
        F.col("sys_batch") <= F.col("sys_version"),
    )
    rank_w = W.partitionBy("sys_version", "user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        visible.withColumn("rn", F.row_number().over(rank_w))
        .where(F.col("rn") == 1)
        .select("sys_version", "user_id", F.col("v_cents").alias("asof_value_cents"))
    )


@query(
    "events_changepoint_cusum",
    oracle="""
    WITH pts AS (
        SELECT user_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS y,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS k
        FROM events
    ),
    tot AS (
        SELECT user_id, count(*) AS n, sum(y) AS s FROM pts GROUP BY 1
    ),
    cusum AS (
        SELECT p.user_id, p.k, t.n,
               sum(t.n * p.y - t.s) OVER (
                   PARTITION BY p.user_id ORDER BY p.k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        FROM pts p JOIN tot t ON p.user_id = t.user_id
    ),
    ranked AS (
        SELECT user_id, n, k, abs(c) AS abs_c,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY abs(c) DESC, k) AS rn
        FROM cusum
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           CAST(k AS BIGINT) AS changepoint_idx,
           CAST(abs_c AS BIGINT) AS max_abs_cusum_scaled
    FROM ranked WHERE rn = 1
    """,
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per user: the event index where the
    cumulative deviation from the user's mean value peaks — the classic
    single-changepoint estimator (the argmax of |Σ_{i≤k}(y_i − ȳ)|).

    Exactness: the deviation is scaled by n (``n·y_i − S`` with S = Σy in
    cents), so the running sum is pure BIGINT — no FP mean, no rounding
    drift, and the argmax with (|c| desc, k asc) tie-break is identical on
    both engines. ONE shuffle on user_id serves everything: the per-user
    total (n, S) is a whole-partition window over the same key instead of
    the old groupBy+self-join — the join's probe side re-ran the scan +
    row_number pipeline (2 corpus scans, r18 rescan audit; now 1 scan,
    1 Exchange, zero joins). Magnitudes stay far under 2⁶³ for any
    realistic per-key series (n·y·n ≤ 10⁹·10⁵·10⁹ only at 10⁹ events
    per single user).
    """
    e = load_table(spark, sf_dir, "events")
    order_w = W.partitionBy("user_id").orderBy("ts", "event_id")
    whole_w = W.partitionBy("user_id")
    pts = e.select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("y"),
        F.row_number().over(order_w).alias("k"),
    ).select(
        "user_id",
        "y",
        "k",
        F.count(F.lit(1)).over(whole_w).alias("n"),
        F.sum("y").over(whole_w).alias("s"),
    )
    run_w = (
        W.partitionBy("user_id")
        .orderBy("k")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cusum = pts.select(
        "user_id",
        "k",
        "n",
        F.sum(F.col("n") * F.col("y") - F.col("s")).over(run_w).alias("c"),
    )
    rank_w = W.partitionBy("user_id").orderBy(
        F.abs(F.col("c")).desc(), F.col("k")
    )
    return (
        cusum.withColumn("rn", F.row_number().over(rank_w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n_events"),
            F.col("k").cast("bigint").alias("changepoint_idx"),
            F.abs(F.col("c")).cast("bigint").alias("max_abs_cusum_scaled"),
        )
    )


@query(
    "events_rolling_distinct_users",
    oracle="""
    WITH user_days AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
        FROM events
    ),
    calendar AS (SELECT DISTINCT day FROM user_days),
    expanded AS (
        SELECT DISTINCT c.day, u.user_id
        FROM calendar c
        JOIN user_days u
          ON u.day <= c.day AND u.day >= c.day - INTERVAL 6 DAY
    )
    SELECT day, count(*) AS active_users_7d
    FROM expanded
    GROUP BY 1
    """,
)
def events_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling distinct active users per day — the WAU-style metric
    Spark's window clause cannot express (COUNT(DISTINCT) over a frame
    is unsupported in Spark; DuckDB DOES support it natively — probed
    r13, and the `distinct_window` fuzz family differentials Spark's
    emulation patterns against exactly that native form).

    The scalable spelling: collapse events to distinct (user, day) rows
    first (the ~1000× reduction), then explode each user-day into the ≤7
    report days it contributes to (via ``sequence``), dedup, and count.
    Work is |user-days| · 7, independent of raw event volume; the
    contribute-forward explode replaces the quadratic day×history join a
    naive rolling distinct performs. The oracle uses the equivalent
    bounded range join.

    ``user_days`` is persisted: the calendar and the contribute explode
    both consume it, and without the cache each re-runs the corpus
    scan + distinct shuffle (r5 rescan audit — no exchange reuse).
    Cached via ``scoped_persist`` — one live frame per site (ADVICE r5).
    """
    from presto_truffle_spark.cache import scoped_persist

    e = load_table(spark, sf_dir, "events")
    user_days = scoped_persist(
        spark,
        "tsa.rolling_distinct.user_days",
        e.select(
            "user_id", trunc_ntz("day", "ts").cast("date").alias("day")
        ).distinct(),
    )
    calendar = user_days.select("day").distinct()
    contributes = user_days.select(
        "user_id",
        F.explode(
            F.sequence("day", F.date_add("day", 6), F.expr("INTERVAL '1' DAY"))
        ).alias("report_day"),
    )
    return (
        contributes.join(
            calendar, contributes.report_day == calendar.day
        )
        .select("day", "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("active_users_7d"))
    )


@query(
    "events_trend_regression",
    oracle="""
    WITH pts AS (
        SELECT user_id,
               CAST(date_diff('hour',
                    (SELECT min(date_trunc('hour', CAST(ts AS TIMESTAMP)))
                     FROM events),
                    date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS x,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
        FROM events
    ),
    sums AS (
        SELECT user_id, count(*) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(x * y) AS sxy
        FROM pts GROUP BY 1
    )
    SELECT user_id, n,
           floor((n * sxy - sx * sy) * 1000000.0
                 / (n * sxx - sx * sx) + 0.5) / 1000000
               AS slope_cents_per_hour
    FROM sums
    WHERE n * sxx - sx * sx > 0
    """,
)
def events_trend_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear trend: least-squares slope of event value (cents)
    over time (hours) — the grouped-regression operator behind "is this
    metric drifting?" dashboards.

    slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²) evaluated from exact BIGINT
    sums: x is hours-since-corpus-start (small integers, so Σxy stays far
    below 2⁶³ even at 10⁹ events/user), y is exact cents. The single FP
    divide at the end is the same IEEE op on both engines — aggregation
    order cannot perturb integer sums, so grouped regression is exactly
    reproducible (the regr_slope() built-ins are FP-accumulation-ordered
    and are not). One shuffle on user_id; the corpus-start hour joins in
    as a 1-row broadcast.
    """
    e = load_table(spark, sf_dir, "events")
    hour = trunc_ntz("hour", "ts")
    t0 = e.agg(F.min(hour).alias("t0"))
    pts = e.crossJoin(F.broadcast(t0)).select(
        "user_id",
        ((epoch_s(hour) - epoch_s("t0")) / 3600)
        .cast("bigint")
        .alias("x"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("y"),
    )
    sums = pts.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    numer = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return sums.where(denom > 0).select(
        "user_id",
        "n",
        (F.floor(numer * 1000000.0 / denom + F.lit(0.5)) / 1000000).alias(
            "slope_cents_per_hour"
        ),
    )


@query(
    "events_anomaly_mad",
    oracle="""
    WITH cents AS (
        SELECT user_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events
    ),
    med AS (
        SELECT user_id, quantile_cont(v, 0.5) AS med FROM cents GROUP BY 1
    ),
    dev AS (
        SELECT c.user_id, c.v, abs(c.v - m.med) AS dev, m.med
        FROM cents c JOIN med m ON c.user_id = m.user_id
    ),
    mad AS (
        SELECT user_id, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY 1
    )
    SELECT d.user_id,
           count(*) AS n_events,
           min(d.med) AS median_cents,
           min(a.mad) AS mad_cents,
           CAST(count(CASE WHEN d.dev > 3 * a.mad THEN 1 END) AS BIGINT)
               AS n_anomalies
    FROM dev d JOIN mad a ON d.user_id = a.user_id
    GROUP BY 1
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection per user: flag events whose deviation from
    the user's median exceeds 3× the median absolute deviation (MAD) —
    the outlier rule that, unlike z-scores, is not itself corrupted by the
    outliers it hunts.

    Exactness by construction: values become cent integers first, and the
    interpolated median of integers only ever lands on multiples of 0.5
    (position fraction ∈ {0, 0.5}) — exactly representable doubles, so
    Spark's percentile() and DuckDB's quantile_cont() agree bit-for-bit
    and the 3·MAD comparison cannot flake.

    Plan shape (r17): the med/mad aggregate-then-join ladder is expressed
    as whole-partition WINDOW aggregates over user_id instead — same
    percentile arithmetic, but ONE scan of events and ONE user_id
    Exchange replace the 4-scan / 2-join plan (the joins reused the
    partitioning but each side re-read the parquet; at 100 TB that was
    three redundant corpus scans). Unbounded-frame windows need no sort.
    """
    e = load_table(spark, sf_dir, "events")
    cents = e.select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v"),
    )
    w = W.partitionBy("user_id")
    dev = cents.select(
        "user_id",
        "v",
        F.expr("percentile(v, 0.5)").over(w).alias("med"),
    ).select(
        "user_id", "v", F.abs(F.col("v") - F.col("med")).alias("dev"), "med"
    )
    scored = dev.select(
        "user_id",
        "dev",
        "med",
        F.expr("percentile(dev, 0.5)").over(w).alias("mad"),
    )
    return (
        scored.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("med").alias("median_cents"),
            F.min("mad").alias("mad_cents"),
            F.count(F.when(F.col("dev") > 3 * F.col("mad"), 1))
            .cast("bigint")
            .alias("n_anomalies"),
        )
    )


@query(
    "events_ohlc_downsample",
    oracle="""
    WITH ranked AS (
        SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS bucket,
               event_type, value,
               row_number() OVER (
                   PARTITION BY time_bucket(INTERVAL '1 hour',
                                            CAST(ts AS TIMESTAMP)), event_type
                   ORDER BY ts, event_id) AS rn_asc,
               row_number() OVER (
                   PARTITION BY time_bucket(INTERVAL '1 hour',
                                            CAST(ts AS TIMESTAMP)), event_type
                   ORDER BY ts DESC, event_id DESC) AS rn_desc
        FROM events
    )
    SELECT bucket AS hour_start, event_type,
           count(*) AS n,
           min(CASE WHEN rn_asc = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           min(CASE WHEN rn_desc = 1 THEN value END) AS close
    FROM ranked
    GROUP BY 1, 2
    """,
)
def events_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC (open/high/low/close) hourly downsample per event type — the
    standard lossy time-series compaction for dashboards and charting.

    Open/close are first/last by (ts, event_id) — the event_id tie-break
    makes the pick deterministic even under timestamp collisions, which is
    what lets DuckDB hash-match a parallel Spark run. Implemented as two
    row_number windows + conditional aggregation: one shuffle on the
    (bucket, type) key, then the aggregate reuses that partitioning. At
    100 TB this is the map-side-heavy shape you want — raw values never
    leave their bucket's partition.
    """
    e = load_table(spark, sf_dir, "events")
    bucket = trunc_ntz("hour", "ts").alias("bucket")
    w_asc = W.partitionBy(trunc_ntz("hour", "ts"), F.col("event_type")).orderBy(
        "ts", "event_id"
    )
    w_desc = W.partitionBy(trunc_ntz("hour", "ts"), F.col("event_type")).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = e.select(
        bucket,
        "event_type",
        "value",
        F.row_number().over(w_asc).alias("rn_asc"),
        F.row_number().over(w_desc).alias("rn_desc"),
    )
    return (
        ranked.groupBy(F.col("bucket").alias("hour_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.when(F.col("rn_asc") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.min(F.when(F.col("rn_desc") == 1, F.col("value"))).alias("close"),
        )
    )


@query(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE months(m) AS (
        SELECT DATE '1995-01-01'
        UNION ALL
        SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
        WHERE m < DATE '2001-08-01'
    ),
    monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
               count(*) AS n_orders,
               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS total_cents
        FROM orders
        GROUP BY 1
    )
    SELECT months.m AS month_start,
           CAST(coalesce(monthly.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(coalesce(monthly.total_cents, 0) AS BIGINT) AS total_cents
    FROM months LEFT JOIN monthly ON months.m = monthly.m
    """,
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``): generate a gap-free
    month calendar spanning the orders table's known date range and left
    join monthly order aggregates onto it — months with no orders surface
    as explicit zero rows (the classic gap-free report).

    The recursion is a bounded fixpoint (80 calendar rows); the fact side
    is pre-aggregated to month grain before the join, so the recursive
    plan never touches raw orders rows. Same shape DuckDB executes via its
    own WITH RECURSIVE — both engines run a genuine recursive plan, not a
    rewrite. UNION ALL + WHERE guard is the Spark-supported recursion form
    (UNION-distinct recursion is not yet supported, probed on 4.1).
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
            SELECT DATE '1995-01-01'
            UNION ALL
            SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
            WHERE m < DATE '2001-08-01'
        ),
        monthly AS (
            SELECT CAST(date_trunc('MONTH', o_orderdate) AS DATE) AS m,
                   count(*) AS n_orders,
                   sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                       AS total_cents
            FROM orders
            GROUP BY 1
        )
        SELECT months.m AS month_start,
               CAST(coalesce(monthly.n_orders, 0) AS BIGINT) AS n_orders,
               CAST(coalesce(monthly.total_cents, 0) AS BIGINT) AS total_cents
        FROM months LEFT JOIN monthly ON months.m = monthly.m
        """
    )


@query(
    "scd2_dimension_build",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ), changes AS (
        SELECT user_id, event_id, ts, event_type FROM ordered
        WHERE prev_type IS DISTINCT FROM event_type
    )
    SELECT user_id,
           CAST(row_number() OVER w AS BIGINT) AS version,
           event_type AS state,
           ts AS effective_from,
           lead(ts) OVER w AS effective_to,
           lead(ts) OVER w IS NULL AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def scd2_dimension_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 build from a change log: collapse
    each user's event stream to its state CHANGES (consecutive-duplicate
    elimination via lag), then stitch validity intervals —
    effective_from = change ts, effective_to = next change ts (NULL while
    current), with a per-key version counter. The standard way a
    warehouse derives a versioned dimension from CDC/event feeds; the
    reference has no dimension machinery at all (its schema is 4 fixed
    fact columns, TpchQuery6.java:24-36), so this is [EXT] capability
    surface.

    Determinism: (ts, event_id) total order per user — equal timestamps
    cannot flip versions between runs or engines. ``IS DISTINCT FROM``
    (Spark: negated ``eqNullSafe``) keeps NULL states well-defined.

    100 TB posture: two windows over the SAME (user_id, ts, event_id)
    partitioning — one shuffle, the second window reuses the sort
    (Catalyst collapses adjacent Window nodes on one ordering); output is
    bounded by the number of state changes, typically << input."""
    e = load_table(spark, sf_dir, "events")
    w_all = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            F.lag("event_type").over(w_all).alias("prev_type"),
        )
        .filter(~F.col("prev_type").eqNullSafe(F.col("event_type")))
        .drop("prev_type")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("version"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("effective_from"),
        F.lead("ts").over(w).alias("effective_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@query(
    "events_watermark_lateness_audit",
    oracle="""
    WITH arr AS (
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
               max(CAST(ts AS TIMESTAMP)) OVER (
                   ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS frontier
        FROM events
    ), late AS (
        SELECT CAST(floor(epoch(frontier)) - floor(epoch(ts)) AS BIGINT)
               AS late_s
        FROM arr
    )
    SELECT d.delay_s,
           CAST(count(*) FILTER (WHERE late.late_s > d.delay_s) AS BIGINT)
               AS n_dropped,
           CAST(count(*) AS BIGINT) AS n_total
    FROM late CROSS JOIN (
        SELECT unnest([0, 60, 300, 900, 3600]) AS delay_s
    ) d
    GROUP BY d.delay_s
    """,
)
def events_watermark_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark tuning, answered from batch history: for each candidate
    watermark delay, how many events would a streaming job have DROPPED?
    An event is late by (event-time frontier at its arrival − its own
    event time), with arrival order = event_id (the ingestion sequence);
    it survives a delay-d watermark iff lateness ≤ d. This is the audit
    every team runs before picking `withWatermark(...)` — the streaming
    queries in streaming/windows.py consume the number this produces.

    One running-max window over arrival order (single-partition ordered
    scan — at 100 TB run it per shard/partition of the ingest log, the
    frontier is per-source there anyway), then one 5-row
    candidate-delay cross join over the tiny lateness aggregate side —
    the explode factor is the candidate count, not the data.

    Lateness is computed in whole epoch seconds on BOTH sides (Spark
    unix_timestamp truncates; DuckDB epoch() keeps fractional seconds —
    the floor-epoch convention from streaming_range_join_windows)."""
    e = load_table(spark, sf_dir, "events")
    w = W.orderBy("event_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    late = e.select(
        (epoch_s(F.max("ts").over(w)) - epoch_s(F.col("ts"))).alias("late_s")
    )
    delays = F.array([F.lit(x) for x in (0, 60, 300, 900, 3600)])
    return (
        late.select("late_s", F.explode(delays).alias("delay_s"))
        .groupBy("delay_s")
        .agg(
            F.count_if(F.col("late_s") > F.col("delay_s")).alias("n_dropped"),
            F.count(F.lit(1)).alias("n_total"),
        )
    )


_DECAY_HALF_LIFE_S = 604800.0  # one-week half-life


@query(
    "events_decayed_counts",
    oracle=f"""
    WITH mx AS (
        SELECT date_trunc('second', max(ts)) AS max_ts FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           floor(sum(power(0.5,
                           date_diff('second', date_trunc('second', ts),
                                     max_ts) / {_DECAY_HALF_LIFE_S}))
                 * 1000000 + 0.5) / 1000000 AS decayed_weight,
           floor(sum(value * power(0.5,
                           date_diff('second', date_trunc('second', ts),
                                     max_ts) / {_DECAY_HALF_LIFE_S}))
                 * 1000000 + 0.5) / 1000000 AS decayed_value
    FROM events CROSS JOIN mx
    GROUP BY user_id
    """,
)
def events_decayed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed per-key activity (half-life one week, anchored
    at the corpus max timestamp — the 30-day fixture then spans weights
    0.05..1, keeping the per-user sums O(n): an earlier 1-hour draft
    made every sum ~1e-4, the same scale as the 6dp round, and
    sum-order ulp drift flipped the last digit cross-engine): the streaming-analytics primitive behind
    "recent activity" scores — unlike a sliding window, every event
    contributes forever with weight 0.5^(age/half-life), and the state
    is a single mergeable weighted sum per key (rescale-and-add under a
    new anchor: multiply the old sum by the decay of the anchor shift —
    what a production job does per checkpoint instead of rescanning).
    Age is an INTEGER second count from zone-free timestamp arithmetic
    (`timestampdiff` ≡ `date_diff` — no epoch extraction, so no session-
    timezone sensitivity on the NTZ fixture), making every pow() operand
    bit-identical across engines; only the final sums carry float
    accumulation, absorbed by the 6dp floor-round. Scale: one scan, the
    1-row max broadcast, one grouped sum — the same shape as any
    distributive aggregate."""
    e = load_table(spark, sf_dir, "events")
    mx = e.agg(F.date_trunc("second", F.max("ts")).alias("max_ts"))
    # whole-second truncation on BOTH operands before the diff: with
    # fractional timestamps the engines count partial seconds
    # differently (caught by the oracle at 1e-6 relative); on truncated
    # operands the boundary count IS the exact integer difference
    age_s = F.expr("timestampdiff(SECOND, date_trunc('second', ts), max_ts)")
    decay = F.pow(F.lit(0.5), age_s / F.lit(_DECAY_HALF_LIFE_S))
    r6 = lambda c: F.floor(c * 1_000_000 + F.lit(0.5)) / 1_000_000  # noqa: E731
    return (
        e.join(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            r6(F.sum(decay)).alias("decayed_weight"),
            r6(F.sum(F.col("value") * decay)).alias("decayed_value"),
        )
    )


@query(
    "events_peak_concurrency",
    oracle="""
    WITH iv AS (
        SELECT date_trunc('second', ts) AS s,
               date_trunc('second', ts)
                 + to_seconds(CAST(event_id % 300 + 60 AS INTEGER)) AS e
        FROM events
    ), deltas AS (
        SELECT s AS t, 1 AS pos, 0 AS neg FROM iv
        UNION ALL
        SELECT e AS t, 0 AS pos, 1 AS neg FROM iv
    ), per_t AS (
        SELECT t, sum(pos) AS pos, sum(neg) AS neg
        FROM deltas GROUP BY t
    ), c AS (
        SELECT t, pos, neg,
               sum(pos - neg) OVER (ORDER BY t) AS cum
        FROM per_t
    )
    SELECT CAST(date_trunc('hour', t) AS TIMESTAMP) AS bucket,
           CAST(max(cum - (pos - neg) + pos) AS BIGINT) AS max_concurrent
    FROM c
    GROUP BY 1
    """,
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per hour over synthetic event intervals
    ([ts, ts + (event_id%300 + 60)s]) — the interval-stacking sweep
    (+1 at start, -1 at end, running sum) behind "max concurrent
    sessions/connections/jobs". The naive spelling is ONE global
    ordered running sum — a single-partition window over every boundary
    in the corpus, the canonical prefix-sum scaling trap — and that
    naive sweep IS the DuckDB oracle. The Spark side runs the
    DISTRIBUTED two-pass prefix sum instead: (1) net boundary deltas
    aggregate per (hour-bucket, second); (2) per-bucket TOTALS (one row
    per hour) get a tiny running-sum window — the carry into each
    bucket; (3) the within-bucket running sum is a window PARTITIONED
    by bucket (parallel across hours), shifted by the broadcast carry.
    The differential proves the decomposition exactly equals the global
    sweep. Tie semantics pinned: at equal timestamps starts count
    before ends (peak at t = carry + cum_before + starts_at_t), so
    back-to-back touching intervals count as overlapping — integer
    arithmetic only, no float anywhere."""
    from presto_truffle_spark.tztime import trunc_ntz

    e = load_table(spark, sf_dir, "events")
    # trunc_ntz, NOT date_trunc: Spark's date_trunc coerces NTZ input to
    # session-zone LTZ — harmless inside a difference (decayed_counts)
    # but these buckets are OUTPUT columns, and the LA-TZ gate caught
    # the shifted rendering
    s_ntz = trunc_ntz("second", F.col("ts"))
    iv = e.select(
        s_ntz.alias("s"),
        F.timestamp_add(
            "SECOND", (F.col("event_id") % 300 + 60).cast("int"), s_ntz
        ).alias("e"),
    )
    # One scan: each interval contributes its two boundary rows via an
    # exploded 2-struct array instead of a union of two projections of
    # the same scan (2 FileScans → 1; and with the single shared subtree
    # the per_t Exchange below is stage-cache-reused by BOTH consumers,
    # btot and within — r17).
    deltas = iv.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("s").alias("t"),
                    F.lit(1).alias("pos"),
                    F.lit(0).alias("neg"),
                ),
                F.struct(
                    F.col("e").alias("t"),
                    F.lit(0).alias("pos"),
                    F.lit(1).alias("neg"),
                ),
            )
        ).alias("d")
    ).select("d.t", "d.pos", "d.neg")
    per_t = (
        deltas.groupBy("t")
        .agg(F.sum("pos").alias("pos"), F.sum("neg").alias("neg"))
        .withColumn("bucket", trunc_ntz("hour", F.col("t")))
        # Vacuously true (t is never null, trunc of non-null is non-null;
        # the events.ts NOT NULL generator contract is pinned by
        # tests/test_generator.py::test_events_ts_non_null_contract)
        # but load-bearing for the plan: the carry join infers
        # isnotnull(bucket) on its probe side only, which pushes below
        # the partial aggregate and makes the two per_t subtrees differ —
        # blocking AQE's stage-cache reuse of the t-Exchange. Declared on
        # per_t itself, both consumers inherit the same filter and the
        # Exchange is built once (2 corpus scans → 1; r17).
        .filter(F.col("bucket").isNotNull())
    )
    # pass 1: per-bucket net totals (one row per hour)
    btot = per_t.groupBy("bucket").agg(
        F.sum(F.col("pos") - F.col("neg")).alias("net")
    )
    # pass 2: carry into each bucket — a window over ~hours rows only
    wcarry = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    carry = btot.select(
        "bucket", F.coalesce(F.sum("net").over(wcarry), F.lit(0)).alias("carry")
    )
    # pass 3: within-bucket running sum, parallel across buckets
    win = W.partitionBy("bucket").orderBy("t")
    within = per_t.withColumn(
        "cum_in", F.sum(F.col("pos") - F.col("neg")).over(win)
    )
    peak = (
        within.join(F.broadcast(carry), "bucket")
        .withColumn(
            "peak_at_t",
            F.col("carry")
            + F.col("cum_in")
            - (F.col("pos") - F.col("neg"))
            + F.col("pos"),
        )
    )
    return peak.groupBy("bucket").agg(
        F.max("peak_at_t").cast("long").alias("max_concurrent")
    )


@query(
    "events_velocity_windows",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w5m AS BIGINT) AS n_5m,
           CAST(count(*) OVER w1h AS BIGINT) AS n_1h,
           CAST(count(*) OVER w24h AS BIGINT) AS n_24h
    FROM (
        SELECT event_id, user_id,
               date_diff('second', TIMESTAMP '1970-01-01',
                         date_trunc('second', ts)) AS sec
        FROM events)
    WINDOW
        w5m AS (PARTITION BY user_id ORDER BY sec
                RANGE BETWEEN 299 PRECEDING AND CURRENT ROW),
        w1h AS (PARTITION BY user_id ORDER BY sec
                RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW),
        w24h AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW)
    """,
)
def events_velocity_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-horizon velocity counts — for every event, how many events
    the same user produced in the trailing 5 minutes / 1 hour / 24 hours
    (inclusive) — the standard fraud/abuse/rate-limit feature vector,
    computed as three RANGE frames over whole-second epoch offsets
    SHARING one (user_id, sec) shuffle+sort: Spark compiles same-
    partition same-order frames into one Window operator pass, so the
    three horizons cost one sort plus per-frame pointer ranges, not
    three shuffles. Whole-second truncation per the pinned fractional-
    second divergence; epoch seconds as integers make RANGE bounds
    exact. Peer rows (same user, same second) are always in-frame
    together, so the per-event counts are deterministic without an
    intra-second tie-break."""
    from presto_truffle_spark.tztime import epoch_s, trunc_ntz

    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_id",
        "user_id",
        epoch_s(trunc_ntz("second", F.col("ts"))).cast("long").alias("sec"),
    )
    w = W.partitionBy("user_id").orderBy("sec")
    return base.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w.rangeBetween(-299, 0)).cast("long").alias("n_5m"),
        F.count(F.lit(1)).over(w.rangeBetween(-3599, 0)).cast("long").alias("n_1h"),
        F.count(F.lit(1))
        .over(w.rangeBetween(-86399, 0))
        .cast("long")
        .alias("n_24h"),
    )


@query(
    "events_error_streaks",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               row_number() OVER (PARTITION BY user_id,
                                  CASE WHEN event_type = 'error'
                                       THEN 1 ELSE 0 END
                                  ORDER BY ts, event_id) AS rn_cond
        FROM events
    ), streaks AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS streak_len,
               CAST(min(event_id) AS BIGINT) AS first_event
        FROM seq
        WHERE event_type = 'error'
        GROUP BY user_id, rn - rn_cond
    )
    SELECT user_id,
           CAST(max(streak_len) AS BIGINT) AS max_error_streak,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(min(first_event) AS BIGINT) AS earliest_streak_start
    FROM streaks
    GROUP BY user_id
    """,
)
def events_error_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-error run per user — the boolean gaps-and-
    islands classic via the two-row_number difference trick: rn over
    the full sequence minus rn over the condition-partitioned sequence
    is CONSTANT within each maximal run of equal condition, so grouping
    errors by that difference yields one row per streak, then a per-user
    max/count. Complements `events_sessionize_islands` (time-gap
    islands) with VALUE-streak islands — the alerting primitive behind
    "N consecutive failures". Both row_numbers share the (user_id, ts,
    event_id) sort (one shuffle; the condition partition is a
    subpartition of the user partition, and Spark evaluates both in one
    Window pass over the same order). Deterministic: the (ts, event_id)
    tie-break is total."""
    e = load_table(spark, sf_dir, "events")
    is_err = F.when(F.col("event_type") == "error", 1).otherwise(0)
    w_all = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_cond = W.partitionBy("user_id", is_err).orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_cond)).alias("grp"),
    )
    streaks = (
        seq.filter(F.col("event_type") == "error")
        .groupBy("user_id", "grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("streak_len"),
            F.min("event_id").cast("long").alias("first_event"),
        )
    )
    return streaks.groupBy("user_id").agg(
        F.max("streak_len").cast("long").alias("max_error_streak"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.min("first_event").cast("long").alias("earliest_streak_start"),
    )


@query(
    "events_inter_arrival_stats",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               date_diff('second',
                   lag(date_trunc('second', ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   date_trunc('second', ts)) AS gap_s
        FROM events
    )
    SELECT user_id,
           CAST(count(gap_s) AS BIGINT) AS n_gaps,
           CAST(min(gap_s) AS BIGINT) AS min_gap_s,
           CAST(max(gap_s) AS BIGINT) AS max_gap_s,
           floor(avg(gap_s) * 1000000 + 0.5) / 1000000 AS mean_gap_s,
           floor(quantile_cont(gap_s, 0.50) * 1000000 + 0.5) / 1000000
               AS p50_gap_s
    FROM gaps
    WHERE gap_s IS NOT NULL
    GROUP BY user_id
    """,
)
def events_inter_arrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival profile — the burstiness fingerprint behind
    rate-limit tuning and bot detection: lag-difference gaps (whole-
    second, per the pinned fractional-second divergence; (ts, event_id)
    total order) aggregated to count/min/max/mean/exact-median per
    user. Median via the proven percentile ≡ quantile_cont pairing
    (agg_percentiles); integer gaps make min/max/count exact and the
    mean's float tail identical-in-distribution across engines under
    the 6dp floor. One (user_id, ts) shuffle shared by the lag window
    and the aggregate — Spark keeps the aggregation on the window's
    partitioning."""
    e = load_table(spark, sf_dir, "events")
    # date_trunc's NTZ->LTZ coercion cancels inside the DIFFERENCE
    # (the events_decayed_counts precedent) — safe here because the
    # truncated values are never output
    gap = F.expr(
        "timestampdiff(SECOND, "
        "lag(date_trunc('second', ts)) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id), "
        "date_trunc('second', ts))"
    )
    gaps = e.select("user_id", gap.alias("gap_s")).filter(
        F.col("gap_s").isNotNull()
    )
    r6 = lambda c: F.floor(c * 1_000_000 + F.lit(0.5)) / 1_000_000  # noqa: E731
    return gaps.groupBy("user_id").agg(
        F.count("gap_s").cast("long").alias("n_gaps"),
        F.min("gap_s").cast("long").alias("min_gap_s"),
        F.max("gap_s").cast("long").alias("max_gap_s"),
        r6(F.avg("gap_s")).alias("mean_gap_s"),
        r6(F.percentile("gap_s", F.lit(0.5))).alias("p50_gap_s"),
    )


@query(
    "events_diff_in_diff",
    oracle="""
    WITH cells AS (
        SELECT CAST(user_id % 2 AS BIGINT) AS treat,
               CASE WHEN CAST(ts AS TIMESTAMP)
                         >= TIMESTAMP '2024-01-16 00:00:00'
                    THEN 1 ELSE 0 END AS post,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS s
        FROM events
        GROUP BY 1, 2
    ), p AS (
        SELECT max(CASE WHEN treat = 1 AND post = 1 THEN s END)
                 / (100.0 * max(CASE WHEN treat = 1 AND post = 1 THEN n END))
                 AS m_t_post,
               max(CASE WHEN treat = 1 AND post = 0 THEN s END)
                 / (100.0 * max(CASE WHEN treat = 1 AND post = 0 THEN n END))
                 AS m_t_pre,
               max(CASE WHEN treat = 0 AND post = 1 THEN s END)
                 / (100.0 * max(CASE WHEN treat = 0 AND post = 1 THEN n END))
                 AS m_c_post,
               max(CASE WHEN treat = 0 AND post = 0 THEN s END)
                 / (100.0 * max(CASE WHEN treat = 0 AND post = 0 THEN n END))
                 AS m_c_pre,
               CAST(sum(n) AS BIGINT) AS n_events
        FROM cells
    )
    SELECT n_events,
           round(m_t_pre, 6) AS mean_treat_pre,
           round(m_t_post, 6) AS mean_treat_post,
           round(m_c_pre, 6) AS mean_control_pre,
           round(m_c_post, 6) AS mean_control_post,
           round((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 6) AS did
    FROM p
    """,
)
def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator over the event stream: treat =
    odd user_id (the deterministic assignment stand-in), pre/post split
    at Jan 16 (the fixture month's midpoint), outcome = mean event value
    per cell. DiD = (treat-post - treat-pre) - (control-post -
    control-pre) — the workhorse quasi-experimental estimate when
    treatment wasn't randomized but trends are parallel, and the
    natural companion to agg_welch_ttest (pure two-group) and
    agg_conversion_wilson_ci (one-group rate): together the three cover
    the experiment-analysis read-out a metrics platform serves.

    One grouped aggregate builds the 2x2 cell table (map-combinable;
    the CASE-on-timestamp predicate evaluates NTZ-vs-literal, zone-free
    per the repo's event-time discipline); the estimate is conditional-
    max pivoting on 4 rows. Cell sums are exact cents; the four means
    and their double-difference are the only doubles, 6dp."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("user_id") % 2).cast("long").alias("treat"),
        F.when(
            F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp_ntz"),
            1,
        )
        .otherwise(0)
        .alias("post"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("s"),
    )
    cell = lambda t, po, c: F.max(  # noqa: E731
        F.when((F.col("treat") == t) & (F.col("post") == po), F.col(c))
    )
    p = cells.agg(
        (cell(1, 1, "s") / (F.lit(100.0) * cell(1, 1, "n"))).alias("m_t_post"),
        (cell(1, 0, "s") / (F.lit(100.0) * cell(1, 0, "n"))).alias("m_t_pre"),
        (cell(0, 1, "s") / (F.lit(100.0) * cell(0, 1, "n"))).alias("m_c_post"),
        (cell(0, 0, "s") / (F.lit(100.0) * cell(0, 0, "n"))).alias("m_c_pre"),
        F.sum("n").cast("long").alias("n_events"),
    )
    return p.select(
        "n_events",
        F.round("m_t_pre", 6).alias("mean_treat_pre"),
        F.round("m_t_post", 6).alias("mean_treat_post"),
        F.round("m_c_pre", 6).alias("mean_control_pre"),
        F.round("m_c_post", 6).alias("mean_control_post"),
        F.round(
            (F.col("m_t_post") - F.col("m_t_pre"))
            - (F.col("m_c_post") - F.col("m_c_pre")),
            6,
        ).alias("did"),
    )


@query(
    "events_uplift_by_decile",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(user_id % 2 AS BIGINT) AS treat,
               CAST(count(CASE WHEN CAST(ts AS TIMESTAMP)
                                    < TIMESTAMP '2024-01-16 00:00:00'
                               THEN 1 END) AS BIGINT) AS pre_n,
               max(CASE WHEN CAST(ts AS TIMESTAMP)
                             >= TIMESTAMP '2024-01-16 00:00:00'
                         AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS post_buy
        FROM events
        GROUP BY user_id
    ), scored AS (
        SELECT treat, post_buy,
               CAST(ntile(10) OVER (ORDER BY pre_n DESC, user_id)
                    AS BIGINT) AS decile
        FROM per_user
    )
    SELECT decile,
           CAST(count(CASE WHEN treat = 1 THEN 1 END) AS BIGINT) AS n_treat,
           CAST(count(CASE WHEN treat = 0 THEN 1 END) AS BIGINT)
               AS n_control,
           CAST(sum(CASE WHEN treat = 1 THEN post_buy ELSE 0 END)
                AS BIGINT) AS conv_treat,
           CAST(sum(CASE WHEN treat = 0 THEN post_buy ELSE 0 END)
                AS BIGINT) AS conv_control,
           round(sum(CASE WHEN treat = 1 THEN post_buy ELSE 0 END) * 1.0
                 / nullif(count(CASE WHEN treat = 1 THEN 1 END), 0)
                 - sum(CASE WHEN treat = 0 THEN post_buy ELSE 0 END) * 1.0
                 / nullif(count(CASE WHEN treat = 0 THEN 1 END), 0), 6)
               AS uplift
    FROM scored
    GROUP BY decile
    """,
)
def events_uplift_by_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift-by-decile (the table behind a Qini/uplift curve): users
    ranked by a targeting score — here pre-period activity, the
    model-free propensity stand-in — are cut into score deciles, and
    each decile reports treatment-vs-control conversion in the POST
    period. This is how targeting models are actually evaluated
    (uplift modeling: Radcliffe's Qini): a useful score concentrates
    incremental conversions in the top deciles; a useless one shows
    flat uplift. Treat/control and the pre/post split reuse
    events_diff_in_diff's deterministic assignment and cutoff, making
    the two ops one coherent experiment read-out.

    The score -> decile step is ntile(10) over (pre_n DESC, user_id) —
    the user_id tie-break matters: pre_n has heavy ties and bare ntile
    would be partition-order nondeterministic on BOTH engines. One
    user-grain fold (map-combinable conditional aggregates), one global
    ntile (the user table is the SMALL side by then — at 100 TB of
    events the per-user fold is the reduction; a truly huge user count
    swaps ntile for the bucketed-quantile trick corpus_token_budget
    uses), one grouped read-out. Exact integers everywhere; the uplift
    difference of two rates is the one double, 6dp, nullif-guarded."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp_ntz")
    per_user = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).cast("long").alias("treat"),
        F.count(F.when(F.col("ts") < cutoff, 1)).cast("long").alias("pre_n"),
        F.max(
            F.when(
                (F.col("ts") >= cutoff)
                & (F.col("event_type") == "purchase"),
                1,
            ).otherwise(0)
        ).alias("post_buy"),
    )
    scored = per_user.select(
        "treat",
        "post_buy",
        F.ntile(10)
        .over(W.orderBy(F.col("pre_n").desc(), "user_id"))
        .cast("long")
        .alias("decile"),
    )
    n_t = F.count(F.when(F.col("treat") == 1, 1)).cast("long")
    n_c = F.count(F.when(F.col("treat") == 0, 1)).cast("long")
    c_t = F.sum(F.when(F.col("treat") == 1, F.col("post_buy")).otherwise(0)).cast("long")
    c_c = F.sum(F.when(F.col("treat") == 0, F.col("post_buy")).otherwise(0)).cast("long")
    return scored.groupBy("decile").agg(
        n_t.alias("n_treat"),
        n_c.alias("n_control"),
        c_t.alias("conv_treat"),
        c_c.alias("conv_control"),
        F.round(
            c_t * F.lit(1.0) / F.nullif(n_t, F.lit(0))
            - c_c * F.lit(1.0) / F.nullif(n_c, F.lit(0)),
            6,
        ).alias("uplift"),
    )


_MARKOV_STEP = """
    , v{k} AS (
        SELECT p.next_type AS event_type,
               sum(v.prob * p.p) AS prob
        FROM v{j} v JOIN probs p ON v.event_type = p.prev_type
        GROUP BY p.next_type
    )"""


@query(
    "events_markov_stationary",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    ), trans AS (
        SELECT prev_type, event_type AS next_type,
               CAST(count(*) AS BIGINT) AS n
        FROM ordered WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    ), probs AS (
        SELECT prev_type, next_type,
               n * 1.0 / CAST(sum(n) OVER (PARTITION BY prev_type)
                              AS BIGINT) AS p
        FROM trans
    ), v0 AS (
        SELECT prev_type AS event_type,
               1.0 / (SELECT count(DISTINCT prev_type) FROM trans) AS prob
        FROM trans GROUP BY prev_type
    )"""
    + "".join(
        _MARKOV_STEP.format(k=k, j=k - 1) for k in (1, 2, 3)
    )
    + """
    SELECT event_type, round(prob, 6) AS stationary_prob
    FROM v3
    """,
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate stationary distribution of the user-journey Markov
    chain: the row-normalized transition matrix from
    events_path_transitions, power-iterated 3 steps from a uniform
    start — the 'long-run behavioral mix' journey analytics reports
    (where path_transitions gives the EDGES, this gives the equilibrium
    the chain drifts toward; same fixed-iteration differential
    discipline as graph_pagerank, whose oracle also unrolls the steps
    as CTEs so every float op sequence matches).

    One user-partitioned lag window builds the transition counts (the
    only corpus-sized work); the matrix is |event_types|^2 (~36 cells)
    so each iteration is a toy join — but spelled as joins, not
    driver-side linear algebra, so the same code handles a 100k-state
    chain (page-to-page web transitions) where the matrix no longer
    fits anywhere. Probabilities divide exact BIGINT counts; iteration
    sums are <=6-term double folds over a deterministic grouped
    aggregate, rounded 6dp."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.select(
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    from presto_truffle_spark.cache import scoped_persist

    # |types|^2 rows feeding three join iterations + the start vector —
    # persist so the corpus lag-window pass runs once.
    trans = scoped_persist(spark, "events.markov.trans", trans)
    probs = trans.select(
        "prev_type",
        "next_type",
        (
            F.col("n")
            * F.lit(1.0)
            / F.sum("n").over(W.partitionBy("prev_type")).cast("long")
        ).alias("p"),
    )
    k = trans.agg(F.countDistinct("prev_type").alias("k"))
    v = (
        trans.select("prev_type")
        .distinct()
        .crossJoin(F.broadcast(k))
        .select(
            F.col("prev_type").alias("event_type"),
            (F.lit(1.0) / F.col("k")).alias("prob"),
        )
    )
    for _ in range(3):
        v = (
            v.join(probs, v.event_type == probs.prev_type)
            .groupBy(F.col("next_type").alias("et"))
            .agg(F.sum(F.col("prob") * F.col("p")).alias("prob"))
            .withColumnRenamed("et", "event_type")
        )
    return v.select("event_type", F.round("prob", 6).alias("stationary_prob"))


@query(
    "events_slo_burn_rate",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
               CAST(count(*) AS BIGINT) AS total,
               CAST(count(CASE WHEN event_type = 'error' THEN 1 END)
                    AS BIGINT) AS errors
        FROM events
        GROUP BY 1
    ), win AS (
        SELECT hour_start, total, errors,
               CAST(sum(total) OVER (
                    ORDER BY hour_start
                    RANGE BETWEEN INTERVAL 5 HOUR PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS total_6h,
               CAST(sum(errors) OVER (
                    ORDER BY hour_start
                    RANGE BETWEEN INTERVAL 5 HOUR PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS errors_6h
        FROM hourly
    )
    SELECT hour_start, total, errors,
           round(errors * 1.0 / nullif(total, 0) / 0.01, 6) AS burn_1h,
           round(errors_6h * 1.0 / nullif(total_6h, 0) / 0.01, 6)
               AS burn_6h,
           (errors * 1.0 / nullif(total, 0) / 0.01 > 14.4
            AND errors_6h * 1.0 / nullif(total_6h, 0) / 0.01 > 6)
               AS page_alert
    FROM win
    """,
)
def events_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO error-budget burn rate with the MULTIWINDOW alert policy
    (Google SRE Workbook ch.5): against a 99% success SLO (budget
    0.01), each hour reports its 1h burn (error_rate / budget) and its
    trailing-6h burn, and pages only when BOTH exceed their thresholds
    (14.4x / 6x — the standard fast-burn pair): the short window gives
    detection speed, the long window suppresses one-hour blips, and
    requiring both is what kills the flapping a single-window alert
    produces. On the fixture the synthetic error share (~20%) burns at
    ~20x continuously, so the alert column is ENGAGED (every hour
    pages) — the query proves the policy arithmetic, while real traffic
    exercises the asymmetry.

    One grouped hourly fold (map-combinable), then two RANGE-frame
    windows sharing ONE sort (same single-exchange shape as
    events_velocity_windows). Hour bucketing is trunc_ntz on the Spark
    side (date_trunc coerces NTZ to session zone — the
    events_peak_concurrency pin); exact integer counts, burn ratios the
    only doubles, 6dp, nullif-guarded."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        trunc_ntz("hour", F.col("ts")).alias("hour_start")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("total"),
        F.count(F.when(F.col("event_type") == "error", 1))
        .cast("long")
        .alias("errors"),
    )
    w6 = (
        W.orderBy(epoch_s(F.col("hour_start")))
        .rangeBetween(-5 * 3600, 0)
    )
    win = hourly.select(
        "hour_start",
        "total",
        "errors",
        F.sum("total").over(w6).cast("long").alias("total_6h"),
        F.sum("errors").over(w6).cast("long").alias("errors_6h"),
    )
    b1 = (
        F.col("errors") * F.lit(1.0) / F.nullif(F.col("total"), F.lit(0))
        / F.lit(0.01)
    )
    b6 = (
        F.col("errors_6h")
        * F.lit(1.0)
        / F.nullif(F.col("total_6h"), F.lit(0))
        / F.lit(0.01)
    )
    return win.select(
        "hour_start",
        "total",
        "errors",
        F.round(b1, 6).alias("burn_1h"),
        F.round(b6, 6).alias("burn_6h"),
        ((b1 > 14.4) & (b6 > 6)).alias("page_alert"),
    )


@query(
    "events_incident_mttr_mtbf",
    oracle="""
    WITH h AS (
        SELECT CAST(date_sub('hour', TIMESTAMP '2024-01-01 00:00:00',
                             date_trunc('hour', CAST(ts AS TIMESTAMP)))
                    AS BIGINT) AS hr,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(CASE WHEN event_type = 'error' THEN 1 END)
                    AS BIGINT) AS e
        FROM events GROUP BY 1
    ), deg AS (
        SELECT hr, hr - row_number() OVER (ORDER BY hr) AS island
        FROM h WHERE e * 1.0 / n > 0.25
    ), inc AS (
        SELECT island, min(hr) AS start_hr,
               CAST(count(*) AS BIGINT) AS duration_h
        FROM deg GROUP BY island
    ), gaps AS (
        SELECT start_hr, duration_h,
               start_hr - lag(start_hr) OVER (ORDER BY start_hr) AS gap_h
        FROM inc
    )
    SELECT CAST(count(*) AS BIGINT) AS n_incidents,
           round(sum(duration_h) * 1.0 / nullif(count(*), 0), 6)
               AS mttr_hours,
           round(avg(gap_h), 6) AS mtbf_hours,
           CAST(max(duration_h) AS BIGINT) AS longest_incident_hours
    FROM gaps
    """,
)
def events_incident_mttr_mtbf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incident MTTR / MTBF from the raw event stream — the reliability
    read-out events_slo_burn_rate's alerts feed: an INCIDENT is a
    maximal run of consecutive degraded hours (hourly error share >
    0.25; probed engaged at both SFs — 204 degraded hours at sf0.01,
    36 at sf0.1), found with the hour-index gaps-and-islands trick
    (events_error_streaks' machinery lifted from per-user booleans to
    fleet-level rates). MTTR = mean incident duration; MTBF = mean gap
    between successive incident STARTS (the convention that makes
    MTBF = MTTR + mean-time-to-failure identities hold); plus the
    worst-case duration.

    Hour indexing is the whole-unit timestamp difference from a fixed
    NTZ anchor — date_sub on the DuckDB side per the r9 day-time
    interval pin (date_diff counts boundary crossings, the wrong twin).
    One hourly fold (map-combinable), islands over the <=720-row hour
    table, then one-row reliability stats; integer hour arithmetic
    end-to-end with 6dp ratio means."""
    ev = load_table(spark, sf_dir, "events")
    anchor = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    h = ev.groupBy(
        F.timestamp_diff(
            "HOUR", anchor, trunc_ntz("hour", F.col("ts"))
        ).alias("hr")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when(F.col("event_type") == "error", 1))
        .cast("long")
        .alias("e"),
    )
    deg = h.filter(
        F.col("e") * F.lit(1.0) / F.col("n") > 0.25
    ).select(
        "hr",
        (F.col("hr") - F.row_number().over(W.orderBy("hr"))).alias(
            "island"
        ),
    )
    inc = deg.groupBy("island").agg(
        F.min("hr").alias("start_hr"),
        F.count(F.lit(1)).cast("long").alias("duration_h"),
    )
    gaps = inc.select(
        "start_hr",
        "duration_h",
        (
            F.col("start_hr")
            - F.lag("start_hr").over(W.orderBy("start_hr"))
        ).alias("gap_h"),
    )
    return gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_incidents"),
        F.round(
            F.sum("duration_h")
            * F.lit(1.0)
            / F.nullif(F.count(F.lit(1)), F.lit(0)),
            6,
        ).alias("mttr_hours"),
        F.round(F.avg("gap_h"), 6).alias("mtbf_hours"),
        F.max("duration_h").cast("long").alias("longest_incident_hours"),
    )


@query(
    "events_session_gap_sweep",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               CAST(date_sub('second',
                    lag(CAST(ts AS TIMESTAMP)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id),
                    CAST(ts AS TIMESTAMP)) AS BIGINT) AS gap_s
        FROM events
    ), base AS (
        SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events
    )
    SELECT CAST(g.threshold_s AS BIGINT) AS threshold_s,
           b.n_events,
           b.n_users + CAST(count(CASE WHEN gap_s > g.threshold_s
                                       THEN 1 END) AS BIGINT)
               AS n_sessions,
           round(b.n_events * 1.0
                 / (b.n_users + count(CASE WHEN gap_s > g.threshold_s
                                           THEN 1 END)), 6)
               AS avg_events_per_session
    FROM gaps
    CROSS JOIN (SELECT unnest([900, 1800, 3600]) AS threshold_s) g
    CROSS JOIN base b
    WHERE gap_s IS NOT NULL
    GROUP BY CAST(g.threshold_s AS BIGINT), b.n_users, b.n_events
    """,
)
def events_session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization gap-parameter sweep (15 / 30 / 60 minutes) — the
    calibration table a team reads BEFORE fixing the session timeout
    (embedding_threshold_sweep's discipline applied to sessions): for
    each candidate gap, how many sessions the corpus splits into and
    the resulting events-per-session. The trick that makes the sweep
    ONE pass instead of one sessionize per candidate: session count is
    n_users + (# inter-arrival gaps exceeding the threshold) — every
    over-threshold gap starts exactly one new session — so a single
    per-user lag window feeds all three thresholds as conditional
    counts. (events_session_dynamic_gap picks a per-user threshold;
    this op is how the global default it falls back to gets chosen.)

    One user-partitioned lag (the corpus-sized work), one 3-way
    grouped conditional count over the gap column. n_users and n_events
    fall out of the SAME lag frame (r18, guide §2.4 — the old separate
    countDistinct/count aggregate re-scanned the corpus): every user
    contributes exactly one NULL-gap row (their first event), so
    n_users = count of null gaps and n_events = count of all rows.
    Whole-second gap arithmetic via date_sub/timestampdiff per the
    day-time interval pin; the events-per-session ratio is the one
    double, 6dp."""
    ev = load_table(spark, sf_dir, "events")
    wlag = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        F.timestamp_diff(
            "SECOND", F.lag("ts").over(wlag), F.col("ts")
        ).alias("gap_s")
    )
    th = spark.range(1).select(
        F.explode(
            F.array(F.lit(900), F.lit(1800), F.lit(3600))
        ).alias("threshold_s")
    )
    swept = gaps.crossJoin(F.broadcast(th)).groupBy("threshold_s").agg(
        F.count(F.when(F.col("gap_s") > F.col("threshold_s"), 1))
        .cast("long")
        .alias("n_breaks"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count(F.when(F.col("gap_s").isNull(), 1))
        .cast("long")
        .alias("n_users"),
    )
    return swept.select(
        F.col("threshold_s").cast("long").alias("threshold_s"),
        "n_events",
        (F.col("n_users") + F.col("n_breaks")).alias("n_sessions"),
        F.round(
            F.col("n_events")
            * F.lit(1.0)
            / (F.col("n_users") + F.col("n_breaks")),
            6,
        ).alias("avg_events_per_session"),
    )


@query(
    "scd2_as_of_lookup",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ), changes AS (
        SELECT user_id, event_id, ts, event_type FROM ordered
        WHERE prev_type IS DISTINCT FROM event_type
    ), dim AS (
        SELECT user_id, event_type AS state,
               ts AS effective_from,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS effective_to
        FROM changes
    ), probes AS (
        SELECT user_id,
               CAST(ts AS TIMESTAMP) - INTERVAL 1 SECOND AS pts
        FROM events WHERE event_type = 'purchase'
    )
    SELECT d.state AS state_as_of_purchase,
           CAST(count(*) AS BIGINT) AS n_lookups
    FROM probes p
    JOIN dim d
      ON p.user_id = d.user_id
     AND d.effective_from <= p.pts
     AND (d.effective_to IS NULL OR p.pts < d.effective_to)
    GROUP BY d.state
    """,
)
def scd2_as_of_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The READ path of the Type 2 dimension scd2_dimension_build
    writes: an AS-OF lookup joining probe timestamps (one second BEFORE
    each purchase — probing AT the purchase degenerately resolves to
    the purchase's own version, since it IS a state change with an
    inclusive effective_from; the probe asks the useful question, what
    state was the user in when they decided) to the dimension version
    VALID AT that moment —
    effective_from <= t < effective_to, open-ended current rows
    included — then the distribution of looked-up states. Validity-
    interval lookup is the defining query pattern a versioned dimension
    exists for (as-of facts at transaction time, the SCD2 half of what
    events_bitemporal_asof does with two time axes), and building the
    dim and probing it in one plan proves the intervals actually
    tile: each probe matches AT MOST one version (a user's first-ever
    event being the purchase leaves its minus-one-second probe before
    any version — those drop from the inner join, so sum(n_lookups) <=
    n_purchases with the deficit = first-touch purchases).

    Plan: the dim is two windows over one (user, ts, event_id) sort;
    the lookup is a user-key equi join with residual range predicates —
    per-user version chains are short, so the range residual filters a
    few rows per key rather than needing the binned-range rewrite. One
    grouped count at the end."""
    ev = load_table(spark, sf_dir, "events")
    dim = scd2_dimension_build(spark, sf_dir).select(
        F.col("user_id").alias("d_user"),
        "state",
        "effective_from",
        "effective_to",
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.timestamp_add("SECOND", F.lit(-1), F.col("ts")).alias("pts"),
    )
    return (
        probes.join(
            dim,
            (probes.user_id == dim.d_user)
            & (F.col("effective_from") <= F.col("pts"))
            & (
                F.col("effective_to").isNull()
                | (F.col("pts") < F.col("effective_to"))
            ),
        )
        .groupBy(F.col("state").alias("state_as_of_purchase"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_lookups"))
    )


@query(
    "window_hampel_filter",
    oracle="""
    WITH hourly AS (
        SELECT CAST(date_sub('hour', TIMESTAMP '2024-01-01 00:00:00',
                             date_trunc('hour', CAST(ts AS TIMESTAMP)))
                    AS BIGINT) AS hr,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS v
        FROM events GROUP BY 1
    ), med AS (
        SELECT c.hr, c.v,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n.v)
                    AS BIGINT) AS win_med,
               CAST(count(*) AS BIGINT) AS win_n
        FROM hourly c JOIN hourly n ON n.hr BETWEEN c.hr - 3 AND c.hr + 3
        GROUP BY c.hr, c.v
    ), mad AS (
        SELECT c.hr, c.v, c.win_med, c.win_n,
               CAST(percentile_disc(0.5) WITHIN GROUP
                    (ORDER BY abs(n.v - c.win_med)) AS BIGINT) AS win_mad
        FROM med c JOIN hourly n ON n.hr BETWEEN c.hr - 3 AND c.hr + 3
        GROUP BY c.hr, c.v, c.win_med, c.win_n
    )
    SELECT hr, v AS observed_cents, win_med AS window_median_cents,
           win_mad AS window_mad_cents
    FROM mad
    WHERE abs(v - win_med) > 3 * 1.4826 * win_mad AND win_n = 7
    ORDER BY hr
    """,
)
def window_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel outlier identifier over the hourly revenue series — the
    robust time-series cleaner (rolling median +- 3 * 1.4826 * rolling
    MAD): unlike z-score flags (events_anomaly_mad is the GLOBAL-MAD
    cousin), the Hampel window localizes both center and spread, so a
    level shift doesn't poison the whole series and a single spike
    can't inflate its own threshold the way windowed standard
    deviations do. Flags only full 7-hour windows (edge windows have
    deflated MADs — the standard boundary rule).

    Exactness over convenience: TRUE Hampel needs the median of
    |neighbor - center_median| where the center median varies per
    position — NOT expressible as a window over any precomputed column
    — so both engines spell it as a BANDED self-join on the hour index
    (+-3), one ordered-set median for the center, a second for the
    deviations. The hour table is <= 720 rows after the corpus fold, so
    the 7x band blowup is trivial; at a per-key grain the same shape
    rides the binned-range-join rewrite. Integer cents end-to-end; the
    only double is the 3*1.4826 threshold comparison."""
    ev = load_table(spark, sf_dir, "events")
    anchor = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    hourly = ev.groupBy(
        F.timestamp_diff(
            "HOUR", anchor, trunc_ntz("hour", F.col("ts"))
        ).alias("hr")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("v")
    )
    from presto_truffle_spark.cache import scoped_persist

    hourly = scoped_persist(spark, "tsadv.hampel.hourly", hourly)
    hourly.createOrReplaceTempView("pt_hampel_hourly")
    return spark.sql(
        """
        WITH med AS (
            SELECT c.hr, c.v,
                   CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n.v)
                        AS BIGINT) AS win_med,
                   CAST(count(*) AS BIGINT) AS win_n
            FROM pt_hampel_hourly c
            JOIN pt_hampel_hourly n ON n.hr BETWEEN c.hr - 3 AND c.hr + 3
            GROUP BY c.hr, c.v
        ), mad AS (
            SELECT c.hr, c.v, c.win_med, c.win_n,
                   CAST(percentile_disc(0.5) WITHIN GROUP
                        (ORDER BY abs(n.v - c.win_med)) AS BIGINT)
                       AS win_mad
            FROM med c
            JOIN pt_hampel_hourly n ON n.hr BETWEEN c.hr - 3 AND c.hr + 3
            GROUP BY c.hr, c.v, c.win_med, c.win_n
        )
        SELECT hr, v AS observed_cents, win_med AS window_median_cents,
               win_mad AS window_mad_cents
        FROM mad
        WHERE abs(v - win_med) > 3 * 1.4826 * win_mad AND win_n = 7
        """
    )


@query(
    "events_forecast_backtest",
    oracle="""
    WITH hourly AS (
        SELECT CAST(date_sub('hour', TIMESTAMP '2024-01-01 00:00:00',
                             date_trunc('hour', CAST(ts AS TIMESTAMP)))
                    AS BIGINT) AS hr,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1
    ), forecasts AS (
        SELECT hr, y,
               lag(y, 24) OVER (ORDER BY hr) AS naive_daily,
               lag(y, 168) OVER (ORDER BY hr) AS naive_weekly,
               lag(y, 1) OVER (ORDER BY hr) AS persistence
        FROM hourly
    )
    SELECT 'naive_daily' AS model,
           CAST(count(naive_daily) AS BIGINT) AS n_forecasts,
           round(sum(abs(y - naive_daily)) * 1.0
                 / nullif(count(naive_daily), 0), 6) AS mae,
           round(sum(abs(y - naive_daily)) * 1.0
                 / nullif(sum(CASE WHEN naive_daily IS NOT NULL
                                   THEN y END), 0), 6) AS wape
    FROM forecasts
    UNION ALL
    SELECT 'naive_weekly', CAST(count(naive_weekly) AS BIGINT),
           round(sum(abs(y - naive_weekly)) * 1.0
                 / nullif(count(naive_weekly), 0), 6),
           round(sum(abs(y - naive_weekly)) * 1.0
                 / nullif(sum(CASE WHEN naive_weekly IS NOT NULL
                                   THEN y END), 0), 6)
    FROM forecasts
    UNION ALL
    SELECT 'persistence', CAST(count(persistence) AS BIGINT),
           round(sum(abs(y - persistence)) * 1.0
                 / nullif(count(persistence), 0), 6),
           round(sum(abs(y - persistence)) * 1.0
                 / nullif(sum(CASE WHEN persistence IS NOT NULL
                                   THEN y END), 0), 6)
    FROM forecasts
    ORDER BY model
    """,
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast BACKTEST of the three naive baselines every real model
    must beat — persistence (last hour), seasonal-daily (same hour
    yesterday), seasonal-weekly (same hour last week) — scored by MAE
    and WAPE over the hourly event-count series. This is the evaluation
    harness side of forecasting (the M-competitions' first lesson:
    report the naive-baseline scores or the model numbers mean
    nothing); events_seasonality_profile describes the cycle, this op
    quantifies how much of it each horizon's naive forecast captures
    (weekly < daily < persistence MAE would mean strong weekly
    seasonality).

    One hourly fold, three lag columns sharing ONE window ordering,
    three conditional aggregates over the same 720-row table. Exact
    integer errors; MAE/WAPE the only doubles, nullif-guarded, 6dp.
    WAPE (sum|e| / sum y) over MAPE deliberately: hourly counts can be
    small and MAPE explodes near zero actuals — the standard retail-
    forecasting choice."""
    ev = load_table(spark, sf_dir, "events")
    anchor = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    hourly = ev.groupBy(
        F.timestamp_diff(
            "HOUR", anchor, trunc_ntz("hour", F.col("ts"))
        ).alias("hr")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    wh = W.orderBy("hr")
    fc = hourly.select(
        "y",
        F.lag("y", 24).over(wh).alias("naive_daily"),
        F.lag("y", 168).over(wh).alias("naive_weekly"),
        F.lag("y", 1).over(wh).alias("persistence"),
    )
    from presto_truffle_spark.cache import scoped_persist

    fc = scoped_persist(spark, "tsadv.backtest.fc", fc)

    def row(model: str, col: str):
        err = F.abs(F.col("y") - F.col(col))
        return fc.agg(
            F.lit(model).alias("model"),
            F.count(col).cast("long").alias("n_forecasts"),
            F.round(
                F.sum(err) * F.lit(1.0) / F.nullif(F.count(col), F.lit(0)),
                6,
            ).alias("mae"),
            F.round(
                F.sum(err)
                * F.lit(1.0)
                / F.nullif(
                    F.sum(F.when(F.col(col).isNotNull(), F.col("y"))),
                    F.lit(0),
                ),
                6,
            ).alias("wape"),
        )

    out = (
        row("naive_daily", "naive_daily")
        .unionAll(row("naive_weekly", "naive_weekly"))
        .unionAll(row("persistence", "persistence"))
    )
    return out


@query(
    "window_theil_sen_slope",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_sub('day', TIMESTAMP '2024-01-01 00:00:00',
                             date_trunc('day', CAST(ts AS TIMESTAMP)))
                    AS BIGINT) AS d,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS y
        FROM events GROUP BY 1
    ), slopes AS (
        SELECT (b.y - a.y) * 1.0 / (b.d - a.d) AS s
        FROM daily a JOIN daily b ON b.d > a.d
    ), ts_slope AS (
        SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY s) AS slope,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM slopes
    ), icept AS (
        SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY y - t.slope * d)
                   AS intercept
        FROM daily CROSS JOIN ts_slope t
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
           n_pairs,
           round(slope / 100.0, 6) AS slope_dollars_per_day,
           round(intercept / 100.0, 6) AS intercept_dollars
    FROM ts_slope CROSS JOIN icept
    """,
)
def window_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily revenue: the MEDIAN of all
    pairwise slopes (and the median-residual intercept) — the
    distribution-free trend estimator with a 29.3% breakdown point,
    where events_trend_regression's OLS line chases any single spiky
    day (the same robust-vs-parametric split as Hampel vs z-score,
    here for the TREND itself; the standard choice for environmental
    and SLA trend reporting). Slopes are exact-integer ratios evaluated
    in double; the medians are percentile_disc picks over them — actual
    observed slopes, deterministic.

    The pairwise join is quadratic IN DAYS, not rows: the corpus folds
    to <=31 daily points first, so all ~465 pairs are a toy self-join
    (at a years-long horizon the repo convention is windowed Theil-Sen
    over bounded spans — the banded self-join shape Hampel uses).
    One corpus pass, two ordered-set medians, one row out."""
    ev = load_table(spark, sf_dir, "events")
    anchor = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    daily = ev.groupBy(
        F.timestamp_diff(
            "DAY", anchor, trunc_ntz("day", F.col("ts"))
        ).alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("y")
    )
    from presto_truffle_spark.cache import scoped_persist

    daily = scoped_persist(spark, "tsadv.theilsen.daily", daily)
    daily.createOrReplaceTempView("pt_ts_daily")
    return spark.sql(
        """
        WITH slopes AS (
            SELECT (b.y - a.y) * 1.0 / (b.d - a.d) AS s
            FROM pt_ts_daily a JOIN pt_ts_daily b ON b.d > a.d
        ), ts_slope AS (
            SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY s)
                       AS slope,
                   CAST(count(*) AS BIGINT) AS n_pairs
            FROM slopes
        ), icept AS (
            SELECT percentile_disc(0.5) WITHIN GROUP
                       (ORDER BY y - t.slope * d) AS intercept
            FROM pt_ts_daily CROSS JOIN ts_slope t
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM pt_ts_daily)
                   AS n_days,
               n_pairs,
               round(slope / 100.0, 6) AS slope_dollars_per_day,
               round(intercept / 100.0, 6) AS intercept_dollars
        FROM ts_slope CROSS JOIN icept
        """
    )


@query(
    "events_mcnemar_paired_test",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               max(CASE WHEN CAST(ts AS TIMESTAMP)
                             < TIMESTAMP '2024-01-16 00:00:00'
                         AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS pre_buy,
               max(CASE WHEN CAST(ts AS TIMESTAMP)
                             >= TIMESTAMP '2024-01-16 00:00:00'
                         AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS post_buy
        FROM events GROUP BY user_id
    ), cells AS (
        SELECT CAST(count(CASE WHEN pre_buy = 1 AND post_buy = 1
                               THEN 1 END) AS BIGINT) AS both_buy,
               CAST(count(CASE WHEN pre_buy = 1 AND post_buy = 0
                               THEN 1 END) AS BIGINT) AS pre_only,
               CAST(count(CASE WHEN pre_buy = 0 AND post_buy = 1
                               THEN 1 END) AS BIGINT) AS post_only,
               CAST(count(CASE WHEN pre_buy = 0 AND post_buy = 0
                               THEN 1 END) AS BIGINT) AS neither
        FROM per_user
    )
    SELECT both_buy, pre_only, post_only, neither,
           round((pre_only - post_only) * (pre_only - post_only) * 1.0
                 / nullif(pre_only + post_only, 0), 6) AS mcnemar_chi2
    FROM cells
    """,
)
def events_mcnemar_paired_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on PAIRED binary outcomes — did each user's
    purchase behavior flip between the pre and post periods? The paired
    design removes between-user variance entirely (each user is their
    own control), so only the DISCORDANT cells carry information:
    chi2 = (b - c)^2 / (b + c) over switched-on vs switched-off users —
    the within-subject member of the experiment suite (Welch/MWU/KS
    compare independent groups; DiD differences group means; McNemar
    tests the paired flip). One user-grain conditional fold
    (map-combinable) + one 2x2 pivot; exact integers, the chi2 ratio
    the only double, 6dp, nullif-guarded for the no-switchers edge."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp_ntz")
    buy = F.col("event_type") == "purchase"
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when((F.col("ts") < cutoff) & buy, 1).otherwise(0)
        ).alias("pre_buy"),
        F.max(
            F.when((F.col("ts") >= cutoff) & buy, 1).otherwise(0)
        ).alias("post_buy"),
    )
    cell = lambda p, q: F.count(  # noqa: E731
        F.when((F.col("pre_buy") == p) & (F.col("post_buy") == q), 1)
    ).cast("long")
    cells = per_user.agg(
        cell(1, 1).alias("both_buy"),
        cell(1, 0).alias("pre_only"),
        cell(0, 1).alias("post_only"),
        cell(0, 0).alias("neither"),
    )
    diff = F.col("pre_only") - F.col("post_only")
    return cells.select(
        "both_buy",
        "pre_only",
        "post_only",
        "neither",
        F.round(
            diff * diff * F.lit(1.0)
            / F.nullif(F.col("pre_only") + F.col("post_only"), F.lit(0)),
            6,
        ).alias("mcnemar_chi2"),
    )


@query(
    "window_runs_test",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_sub('day', TIMESTAMP '2024-01-01 00:00:00',
                             date_trunc('day', CAST(ts AS TIMESTAMP)))
                    AS BIGINT) AS d,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS y
        FROM events GROUP BY 1
    ), moves AS (
        SELECT d,
               CASE WHEN y > lag(y) OVER (ORDER BY d) THEN 1
                    WHEN y < lag(y) OVER (ORDER BY d) THEN 0 END AS up
        FROM daily
    ), seq AS (
        SELECT d, up,
               lag(up) OVER (ORDER BY d) AS prev_up
        FROM moves WHERE up IS NOT NULL
    ), f AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(CASE WHEN up = 1 THEN 1 END) AS BIGINT) AS n1,
               CAST(count(CASE WHEN up = 0 THEN 1 END) AS BIGINT) AS n2,
               CAST(1 + count(CASE WHEN prev_up IS NOT NULL
                                    AND up <> prev_up THEN 1 END)
                    AS BIGINT) AS runs
        FROM seq
    )
    SELECT n, n1, n2, runs,
           round((runs - (2.0 * n1 * n2 / nullif(n, 0) + 1))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
                        / (nullif(n, 0) * n * nullif(n - 1, 0))), 6)
               AS runs_z
    FROM f
    """,
)
def window_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily revenue direction sequence
    (up/down moves; flat days excluded): too FEW runs means the series
    trends or sticks (momentum/autocorrelation), too MANY means it
    oscillates — the classic randomness screen applied before anyone
    fits a forecasting model (events_autocorrelation measures the
    linear lag structure; the runs test is its distribution-free
    cousin that needs no stationarity in levels, only in signs).
    z against the exact run-count moments for the observed (n1, n2).

    The corpus folds to daily rows first; the move signs and the
    run-boundary count are two lag windows over one ordering of that
    <=31-row table; the moments are exact integers and z the one
    double (6dp, nullif-guarded for degenerate all-up/all-down)."""
    ev = load_table(spark, sf_dir, "events")
    anchor = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    daily = ev.groupBy(
        F.timestamp_diff(
            "DAY", anchor, trunc_ntz("day", F.col("ts"))
        ).alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("y")
    )
    wd = W.orderBy("d")
    moves = daily.select(
        "d",
        F.when(F.col("y") > F.lag("y").over(wd), 1)
        .when(F.col("y") < F.lag("y").over(wd), 0)
        .alias("up"),
    ).filter(F.col("up").isNotNull())
    seq = moves.select(
        "up", F.lag("up").over(W.orderBy("d")).alias("prev_up")
    )
    f = seq.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when(F.col("up") == 1, 1)).cast("long").alias("n1"),
        F.count(F.when(F.col("up") == 0, 1)).cast("long").alias("n2"),
        (
            1
            + F.count(
                F.when(
                    F.col("prev_up").isNotNull()
                    & (F.col("up") != F.col("prev_up")),
                    1,
                )
            )
        )
        .cast("long")
        .alias("runs"),
    )
    mu = 2.0 * F.col("n1") * F.col("n2") / F.nullif(F.col("n"), F.lit(0)) + 1
    var = (
        2.0
        * F.col("n1")
        * F.col("n2")
        * (2.0 * F.col("n1") * F.col("n2") - F.col("n"))
        / (
            F.nullif(F.col("n"), F.lit(0))
            * F.col("n")
            * F.nullif(F.col("n") - 1, F.lit(0))
        )
    )
    return f.select(
        "n",
        "n1",
        "n2",
        "runs",
        F.round((F.col("runs") - mu) / F.sqrt(var), 6).alias("runs_z"),
    )


@query(
    "events_record_breaking_days",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_sub('day', TIMESTAMP '2024-01-01 00:00:00',
                             date_trunc('day', CAST(ts AS TIMESTAMP)))
                    AS BIGINT) AS d,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS y
        FROM events GROUP BY 1
    ), rec AS (
        SELECT d, y,
               y > coalesce(max(y) OVER (ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    y - 1) AS is_record
        FROM daily
    ), f AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(count(CASE WHEN is_record THEN 1 END) AS BIGINT)
                   AS n_records
        FROM rec
    ), h AS (
        SELECT sum(1.0 / k) AS harmonic
        FROM (SELECT unnest(generate_series(1, 1000)) AS k)
        CROSS JOIN f WHERE k <= n_days
    )
    SELECT n_days, n_records,
           round(harmonic, 6) AS expected_records_iid,
           round(n_records / nullif(harmonic, 0), 6) AS record_excess
    FROM f CROSS JOIN h
    """,
)
def events_record_breaking_days(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Record-breaking days in the daily revenue series vs the i.i.d.
    law: for exchangeable data the expected number of running-maximum
    records in n observations is EXACTLY the harmonic number H_n
    (day k is a record with probability 1/k) — so the ratio
    observed/H_n is a distribution-FREE growth detector: ~1 means
    stationary noise, >>1 means trend (records keep falling), <<1
    means an early peak never beaten. The extreme-value companion to
    window_runs_test (sign randomness) and window_max_drawdown (the
    running max's other read-out); the first day counts as a record by
    convention (coalesce against max over the EMPTY preceding frame).

    Corpus folds to daily rows; one prefix-max window; H_n evaluated
    by summing 1/k over an exploded bounded sequence (1000-day cap —
    a literal per the repo's bounded-explode convention, loudly above
    the fixture's 31-day horizon). Exact integer counts; harmonic and
    the excess ratio are the only doubles, 6dp."""
    ev = load_table(spark, sf_dir, "events")
    anchor = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    daily = ev.groupBy(
        F.timestamp_diff(
            "DAY", anchor, trunc_ntz("day", F.col("ts"))
        ).alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("y")
    )
    wprev = W.orderBy("d").rowsBetween(W.unboundedPreceding, -1)
    rec = daily.select(
        "y",
        (
            F.col("y")
            > F.coalesce(F.max("y").over(wprev), F.col("y") - 1)
        ).alias("is_record"),
    )
    f = rec.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.count(F.when(F.col("is_record"), 1))
        .cast("long")
        .alias("n_records"),
    )
    ks = spark.range(1, 1001).select(F.col("id").alias("k"))
    h = (
        f.crossJoin(F.broadcast(ks))
        .filter(F.col("k") <= F.col("n_days"))
        .agg(F.sum(F.lit(1.0) / F.col("k")).alias("harmonic"))
    )
    return f.crossJoin(F.broadcast(h)).select(
        "n_days",
        "n_records",
        F.round("harmonic", 6).alias("expected_records_iid"),
        F.round(
            F.col("n_records") / F.nullif(F.col("harmonic"), F.lit(0.0)), 6
        ).alias("record_excess"),
    )


_IVU_WINDOW_S = 14_400  # each event opens a 4-hour activity interval


@query(
    "events_interval_union",
    oracle=f"""
    WITH iv AS (
        SELECT user_id, event_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                   + {_IVU_WINDOW_S} AS e
        FROM events
    ), flagged AS (
        SELECT user_id, s, e, event_id,
               CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
        WINDOW w AS (PARTITION BY user_id ORDER BY s, e, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), islands AS (
        SELECT user_id, s, e,
               sum(new_island) OVER (PARTITION BY user_id
                                     ORDER BY s, e, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS island
        FROM flagged
    ), spans AS (
        SELECT user_id, island,
               min(s) AS ss, max(e) AS se,
               CAST(count(*) AS BIGINT) AS n_ev
        FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(se - ss) AS BIGINT) AS covered_seconds,
           CAST(max(se - ss) AS BIGINT) AS longest_span_seconds,
           CAST(sum(n_ev) AS BIGINT) AS n_events
    FROM spans GROUP BY user_id
    """,
)
def events_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval UNION (merge overlapping intervals into maximal disjoint
    spans) — the classic sweep that `events_peak_concurrency` (stacking
    depth) and `events_sessionize_islands` (gap-based sessions) both
    circle but neither computes: each event opens a 4-hour activity
    window, and per user the overlapping windows flatten into covered
    spans — "total time under activity", the same primitive as union of
    incident windows or on-call coverage. Probed engagement: 31% of
    intervals merge into a predecessor span at both SFs (15-minute
    windows merged only 2% — too sparse; 1-day merged 88% — too blunt).

    Algorithm: the running-maximum island sweep — a span breaks where a
    start exceeds max(end) over all STRICTLY PRECEDING intervals in
    (start, end, event_id) order; island id is the running sum of break
    flags. All arithmetic is INTEGER epoch seconds (floor(epoch) /
    Spark timestamp_diff-from-NTZ-epoch, the r9 whole-second pin) — no
    timestamp type ever crosses an engine boundary.

    Scale shape: both windows and the two groupBys share ONE
    hash-partition by user_id (per-user sort inside the partition; no
    global sort); at 100 TB this is the standard sessionize posture —
    the only caveat is a single user's event count, same as any per-key
    window."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        epoch_s("ts").alias("s"),
        (epoch_s("ts") + _IVU_WINDOW_S).alias("e"),
    )
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev_max = F.max("e").over(w_prev)
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1)
        .otherwise(0)
        .alias("new_island"),
        F.col("event_id"),
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    islands = flagged.select(
        "user_id",
        "s",
        "e",
        F.sum("new_island").over(w_run).alias("island"),
    )
    spans = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("ss"),
        F.max("e").alias("se"),
        F.count(F.lit(1)).cast("long").alias("n_ev"),
    )
    return spans.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("se") - F.col("ss")).cast("long").alias("covered_seconds"),
        F.max(F.col("se") - F.col("ss"))
        .cast("long")
        .alias("longest_span_seconds"),
        F.sum("n_ev").cast("long").alias("n_events"),
    )


@query(
    "events_cross_correlation",
    oracle="""
    WITH bounds AS (
        SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
        FROM events WHERE event_type IN ('click', 'purchase')
    ), days AS (
        SELECT CAST(CAST(d AS DATE) - DATE '1970-01-01' AS BIGINT) AS di
        FROM (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d
              FROM bounds)
    ), a AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS di,
               CAST(count(*) AS BIGINT) AS n
        FROM events WHERE event_type = 'click' GROUP BY 1
    ), b AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS di,
               CAST(count(*) AS BIGINT) AS n
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), grid AS (
        SELECT days.di, coalesce(a.n, 0) AS na, coalesce(b.n, 0) AS nb
        FROM days LEFT JOIN a ON a.di = days.di
                  LEFT JOIN b ON b.di = days.di
    ), lags AS (
        SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS lag
    ), pairs AS (
        SELECT l.lag, g1.na AS x, g2.nb AS y
        FROM lags l JOIN grid g1 ON true
        JOIN grid g2 ON g2.di = g1.di + l.lag
    ), s AS (
        SELECT lag, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, n AS n_days,
           round((n * sxy - sx * sy) * 1.0 /
                 nullif(sqrt((n * sxx - sx * sx) * 1.0)
                        * sqrt((n * syy - sy * sy) * 1.0), 0), 6)
               AS pearson_r
    FROM s
    """,
)
def events_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag CROSS-correlation between two event-type daily series
    (clicks vs purchases, lags −3..+3 days) — the "does A lead B"
    primitive behind marketing-attribution and capacity-planning
    dashboards; `events_autocorrelation` is the self-series special
    case. Pearson r per lag from EXACT integer moment sums (n·Σxy −
    ΣxΣy over the exact-integer variance product — the subtraction is
    integer-exact so the welch_ttest float-cancellation trap cannot
    fire; magnitudes here are ≤ ~10^7 at sf0.1, far inside BIGINT);
    the only doubles are the final sqrt/divide, rounded 6dp with
    zero-variance nullif guards.

    The day axis is the OBSERVED span densified via sequence (absent
    days count 0 — dropping them would bias r toward co-presence),
    then shifted joins on integer epoch-day indices; lag pairs only
    exist where both shifted days land inside the span, so per-lag n
    shrinks by |lag| (emitted as n_days). CAST(ts AS DATE) is
    zone-stable on NTZ (tests/test_tz_proof.py).

    Scale shape: two map-combinable daily folds, a days-sized grid
    (one row per day — trivially broadcastable), and a 7-lag explode
    over it; nothing downstream of the folds is corpus-volume."""
    ev = load_table(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    di = F.datediff(d, F.lit("1970-01-01").cast("date")).cast("long")
    daily = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(di.alias("di"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    from presto_truffle_spark.cache import scoped_persist

    daily = scoped_persist(spark, "tsa.xcorr.daily", daily)
    bounds = daily.agg(
        F.min("di").alias("d0"), F.max("di").alias("d1")
    )
    days = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("di")
    )
    a = daily.filter(F.col("event_type") == "click").select(
        "di", F.col("n").alias("na")
    )
    b = daily.filter(F.col("event_type") == "purchase").select(
        "di", F.col("n").alias("nb")
    )
    grid = (
        days.join(a, "di", "left")
        .join(b, "di", "left")
        .select(
            "di",
            F.coalesce("na", F.lit(0)).alias("na"),
            F.coalesce("nb", F.lit(0)).alias("nb"),
        )
    )
    grid = scoped_persist(spark, "tsa.xcorr.grid", grid)
    lags = spark.range(1).select(
        F.explode(F.array(*[F.lit(v) for v in range(-3, 4)])).alias("lag")
    )
    g1 = grid.select("di", "na")
    g2 = grid.select(F.col("di").alias("dj"), "nb")
    pairs = (
        lags.crossJoin(g1)
        .join(g2, F.col("dj") == F.col("di") + F.col("lag"))
        .select("lag", F.col("na").alias("x"), F.col("nb").alias("y"))
    )
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) * 1.0
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")) * 1.0
    return s.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("n").alias("n_days"),
        F.round(
            num * 1.0 / F.nullif(F.sqrt(vx) * F.sqrt(vy), F.lit(0)), 6
        ).alias("pearson_r"),
    )


@query(
    "events_holt_smoothing",
    oracle="""
    WITH RECURSIVE bounds AS (
        SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
        FROM events
    ), days AS (
        SELECT CAST(CAST(d AS DATE) - DATE '1970-01-01' AS BIGINT) AS di
        FROM (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d
              FROM bounds)
    ), daily AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS di,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ), grid AS (
        SELECT days.di, CAST(coalesce(daily.n, 0) AS DOUBLE) AS x
        FROM days LEFT JOIN daily ON daily.di = days.di
    ), lim AS (
        SELECT min(di) AS i0, max(di) AS i1, CAST(count(*) AS BIGINT) AS nd
        FROM grid
    ), rec AS (
        SELECT g1.di AS di, g0.x AS l, g1.x - g0.x AS t
        FROM lim JOIN grid g0 ON g0.di = lim.i0
                 JOIN grid g1 ON g1.di = lim.i0 + 1
        UNION ALL
        SELECT g.di,
               CAST(0.3 AS DOUBLE) * g.x
                   + CAST(0.7 AS DOUBLE) * (r.l + r.t),
               CAST(0.1 AS DOUBLE) * ((CAST(0.3 AS DOUBLE) * g.x
                    + CAST(0.7 AS DOUBLE) * (r.l + r.t)) - r.l)
               + CAST(0.9 AS DOUBLE) * r.t
        FROM rec r JOIN grid g ON g.di = r.di + 1
    )
    SELECT lim.nd AS n_days,
           round(r.l, 6) AS level, round(r.t, 6) AS trend,
           round(r.l + r.t, 6) AS forecast_1d,
           round(r.l + 7 * r.t, 6) AS forecast_7d
    FROM rec r JOIN lim ON r.di = lim.i1
    WHERE lim.nd >= 3
    """,
)
def events_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double) exponential smoothing over the daily
    event-count series, with 1-day and 7-day forecasts — the SEQUENTIAL
    RECURRENCE the forecast-backtest family's seasonal-naive baselines
    deliberately avoid: l_i = αx_i + (1−α)(l+t), t_i = β(l_i−l) +
    (1−β)t. A recurrence can't be a groupBy or a window frame, and the
    classic dodge (driver loop / UDF) is neither declarative nor
    cross-engine checkable. The spelling here: densify the observed
    span (the events_cross_correlation grid), collect the GRID-BOUNDED
    day series into ONE ordered array, and run the recurrence as a
    higher-order-function LEFT FOLD — Spark `aggregate(slice, init,
    merge)` — mirrored by a DuckDB RECURSIVE CTE stepping day-by-day
    with the identical arithmetic spelling, hence the SAME IEEE op
    sequence: results are bit-identical with no integerization needed
    (α,β literals parse to identical doubles — F.lit on the Spark
    side, CAST(.. AS DOUBLE) on the duck side, dodging the
    DECIMAL-literal trap). Init: l₀ = x₁, t₀ = x₂ − x₁; observations
    fold from day 3 (the convention is part of the contract and
    mirrored exactly).

    Engine-fork note (probed r11, pinned here): DuckDB 1.0's
    `list_reduce` with a STRUCT accumulator does NOT perform a clean
    left fold — from the second iteration one field's `acc.`
    references bind to the freshly-computed sibling field (observed:
    acc.l in the trend expression took the NEW level), so the
    lambda-fold spelling silently diverges from Spark's `aggregate`.
    The recursive-CTE oracle sidesteps lambda evaluation entirely;
    scalar-accumulator list_reduce folds are unaffected (probed
    left-fold-correct).

    Scale shape: the daily fold is map-combinable; the recurrence runs
    on the days-sized array (30 at fixture; time-bounded by
    definition — a year is 365 elements), one row, driver-free. The
    collect_list is the honest point where 'sequential' meets
    'distributed': bounded by the CALENDAR, not the corpus."""
    ev = load_table(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    di = F.datediff(d, F.lit("1970-01-01").cast("date")).cast("long")
    daily = ev.groupBy(di.alias("di")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    from presto_truffle_spark.cache import scoped_persist

    daily = scoped_persist(spark, "tsa.holt.daily", daily)
    bounds = daily.agg(F.min("di").alias("d0"), F.max("di").alias("d1"))
    days = bounds.select(F.explode(F.sequence("d0", "d1")).alias("di"))
    grid = days.join(daily, "di", "left").select(
        "di", F.coalesce(F.col("n"), F.lit(0)).cast("double").alias("x")
    )
    arr = grid.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("di"), F.col("x")))
        ).alias("sx"),
        F.count(F.lit(1)).cast("long").alias("nd"),
    ).select(
        F.transform(F.col("sx"), lambda s: s.x).alias("xs"), "nd"
    )
    a, b = F.lit(0.3), F.lit(0.1)
    one_a, one_b = F.lit(0.7), F.lit(0.9)

    def merge(acc, e):
        newl = a * e + one_a * (acc.l + acc.t)
        return F.struct(
            newl.alias("l"),
            (b * (newl - acc.l) + one_b * acc.t).alias("t"),
        )

    folded = arr.filter(F.col("nd") >= 3).select(
        "nd",
        F.aggregate(
            F.slice(F.col("xs"), 3, F.size(F.col("xs"))),
            F.struct(
                F.element_at(F.col("xs"), 1).alias("l"),
                (
                    F.element_at(F.col("xs"), 2)
                    - F.element_at(F.col("xs"), 1)
                ).alias("t"),
            ),
            merge,
        ).alias("st"),
    )
    return folded.select(
        F.col("nd").alias("n_days"),
        F.round(F.col("st.l"), 6).alias("level"),
        F.round(F.col("st.t"), 6).alias("trend"),
        F.round(F.col("st.l") + F.col("st.t"), 6).alias("forecast_1d"),
        F.round(F.col("st.l") + 7 * F.col("st.t"), 6).alias(
            "forecast_7d"
        ),
    )


# SPRT constants, frozen ONCE in micro-nats (H0: p=0.18 vs H1: p=0.22;
# error rates alpha=beta=0.05 -> boundaries +/- ln(19)):
_SPRT_L1 = 200671  # round(ln(p1/p0) * 1e6), per conversion
_SPRT_L0 = -50010  # round(ln((1-p1)/(1-p0)) * 1e6), per non-conversion
_SPRT_A = 2944439  # round(ln(19) * 1e6)


@query(
    "events_sprt_sequential_test",
    oracle=f"""
    WITH e AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS di,
               CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS arm,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
        FROM events
    ), daily AS (
        SELECT di, arm, CAST(sum(conv) AS BIGINT) AS x,
               CAST(count(*) AS BIGINT) AS n
        FROM e GROUP BY 1, 2
    ), llr AS (
        SELECT di, arm,
               CAST(sum(x) OVER w AS BIGINT) * {_SPRT_L1}
               + CAST(sum(n - x) OVER w AS BIGINT) * {_SPRT_L0}
                   AS cum_llr_micro,
               CAST(sum(n) OVER w AS BIGINT) AS cum_trials
        FROM daily
        WINDOW w AS (PARTITION BY arm ORDER BY di)
    )
    SELECT arm, CAST(count(*) AS BIGINT) AS n_days,
           CAST(max(cum_trials) AS BIGINT) AS trials,
           round(max(cum_llr_micro) / 1000000.0, 6) AS max_llr,
           round(min(cum_llr_micro) / 1000000.0, 6) AS min_llr,
           CAST(min(CASE WHEN cum_llr_micro >= {_SPRT_A} THEN di END)
                AS BIGINT) AS first_accept_h1_day,
           CAST(min(CASE WHEN cum_llr_micro <= -{_SPRT_A} THEN di END)
                AS BIGINT) AS first_accept_h0_day
    FROM llr GROUP BY arm
    """,
)
def events_sprt_sequential_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's Sequential Probability Ratio Test over daily conversion
    streams — the SEQUENTIAL member the experiment suite was missing
    (Wilson CI / bootstrap / Welch / MWU / chi² / DiD / uplift are all
    fixed-horizon; SPRT is the 'stop the experiment the day the
    evidence suffices' discipline, the optimal-stopping result behind
    every industrial early-stopping framework). Per arm (user_id
    parity): cumulative LLR_t = X_t·ln(p₁/p₀) + (N_t−X_t)·
    ln((1−p₁)/(1−p₀)) against H₀: p=0.18 vs H₁: p=0.22, boundaries
    ±ln(19) (α=β=0.05); emitted are the LLR envelope and the FIRST
    boundary-crossing day per side.

    Determinism: the two log constants and the boundary are frozen
    once as Python-side integer micro-nats (module constants — no
    runtime ln at all), so the cumulative LLR is an exact BIGINT
    integer combination of conversion counts; the only doubles are
    two display divisions. Fixture honesty: the generator's purchase
    share (~0.198) sits BETWEEN the hypotheses, so each arm's LLR is
    a near-zero-drift random walk and the two arms cross OPPOSITE
    boundaries at both SFs — exactly the inconclusive-truth behavior
    SPRT textbooks warn about, demonstrated rather than hidden.

    Scale shape: one map-combinable (day, arm) fold; the cumulative
    window runs per-arm over the calendar-bounded day table; the
    final fold is 2 rows."""
    ev = load_table(spark, sf_dir, "events")
    di = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    daily = (
        ev.select(
            di.alias("di"),
            (F.col("user_id") % 2 == 1).cast("int").alias("arm"),
            (F.col("event_type") == "purchase").cast("int").alias("conv"),
        )
        .groupBy("di", "arm")
        .agg(
            F.sum("conv").cast("long").alias("x"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    w = (
        W.partitionBy("arm")
        .orderBy("di")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    llr = daily.select(
        "di",
        "arm",
        (
            F.sum("x").over(w).cast("long") * _SPRT_L1
            + F.sum(F.col("n") - F.col("x")).over(w).cast("long")
            * _SPRT_L0
        ).alias("cum_llr_micro"),
        F.sum("n").over(w).cast("long").alias("cum_trials"),
    )
    return llr.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("cum_trials").cast("long").alias("trials"),
        F.round(F.max("cum_llr_micro") / 1000000.0, 6).alias("max_llr"),
        F.round(F.min("cum_llr_micro") / 1000000.0, 6).alias("min_llr"),
        F.min(
            F.when(F.col("cum_llr_micro") >= _SPRT_A, F.col("di"))
        )
        .cast("long")
        .alias("first_accept_h1_day"),
        F.min(
            F.when(F.col("cum_llr_micro") <= -_SPRT_A, F.col("di"))
        )
        .cast("long")
        .alias("first_accept_h0_day"),
    )


@query(
    "events_interval_gaps",
    oracle=f"""
    WITH iv AS (
        SELECT user_id, event_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                   + {_IVU_WINDOW_S} AS e
        FROM events
    ), flagged AS (
        SELECT user_id, s, e, event_id,
               CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
        WINDOW w AS (PARTITION BY user_id ORDER BY s, e, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), islands AS (
        SELECT user_id, s, e,
               sum(new_island) OVER (PARTITION BY user_id
                                     ORDER BY s, e, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS island
        FROM flagged
    ), spans AS (
        SELECT user_id, island, min(s) AS ss, max(e) AS se
        FROM islands GROUP BY user_id, island
    ), gaps AS (
        SELECT user_id,
               ss - lag(se) OVER (PARTITION BY user_id
                                  ORDER BY island) AS gap_s,
               se - ss AS span_s
        FROM spans
    )
    SELECT user_id,
           CAST(count(gap_s) AS BIGINT) AS n_gaps,
           CAST(coalesce(sum(gap_s), 0) AS BIGINT) AS idle_seconds,
           CAST(coalesce(max(gap_s), 0) AS BIGINT) AS max_gap_seconds,
           round(sum(span_s) * 1.0
                 / nullif(sum(span_s) + coalesce(sum(gap_s), 0), 0), 6)
               AS coverage_ratio
    FROM gaps GROUP BY user_id
    """,
)
def events_interval_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps of the interval UNION — the complement
    `events_interval_union` doesn't emit: after each user's 4-hour
    activity windows flatten into maximal disjoint spans, the LAG
    between consecutive spans is the user's idle window — the
    on-call-coverage / uptime-hole / maintenance-window artifact
    ('this user's longest unobserved stretch was max_gap_seconds').
    Distinct from `events_inter_arrival_stats` (raw event-to-event
    deltas): a gap here only exists where the MERGED coverage breaks,
    i.e. deltas already absorbed by overlapping windows don't count.
    coverage_ratio = covered / (covered + idle) over the user's
    observed extent, the per-user availability number.

    Probed engagement at sf0.01: every user has 36+ gaps (spans per
    user 37-55); the first span contributes a NULL lag, excluded by
    count(gap_s) on both engines identically.

    Determinism: the interval_union island sweep verbatim (integer
    epoch seconds, (s, e, event_id) total order), then one more
    per-user LAG over the island-numbered span table; one 6dp double.

    Scale shape: identical to interval_union — every window and
    groupBy shares ONE hash-partition by user_id; the extra lag runs
    over the per-user SPAN table (≤ n_events rows, usually far
    fewer)."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        epoch_s("ts").alias("s"),
        (epoch_s("ts") + _IVU_WINDOW_S).alias("e"),
    )
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev_max = F.max("e").over(w_prev)
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1)
        .otherwise(0)
        .alias("new_island"),
        "event_id",
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    islands = flagged.select(
        "user_id", "s", "e", F.sum("new_island").over(w_run).alias("island")
    )
    spans = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("ss"), F.max("e").alias("se")
    )
    w_isl = W.partitionBy("user_id").orderBy("island")
    gaps = spans.select(
        "user_id",
        (F.col("ss") - F.lag("se").over(w_isl)).alias("gap_s"),
        (F.col("se") - F.col("ss")).alias("span_s"),
    )
    return gaps.groupBy("user_id").agg(
        F.count("gap_s").cast("long").alias("n_gaps"),
        F.coalesce(F.sum("gap_s"), F.lit(0)).cast("long").alias(
            "idle_seconds"
        ),
        F.coalesce(F.max("gap_s"), F.lit(0)).cast("long").alias(
            "max_gap_seconds"
        ),
        F.round(
            F.sum("span_s")
            * 1.0
            / F.nullif(
                F.sum("span_s") + F.coalesce(F.sum("gap_s"), F.lit(0)),
                F.lit(0),
            ).cast("double"),
            6,
        ).alias("coverage_ratio"),
    )


@query(
    "events_mann_kendall_trend",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(date_sub('day', TIMESTAMP '2024-01-01 00:00:00',
                             date_trunc('day', CAST(ts AS TIMESTAMP)))
                    AS BIGINT) AS d,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ), s AS (
        SELECT a.event_type,
               CAST(sum(CASE WHEN b.v > a.v THEN 1
                             WHEN b.v < a.v THEN -1 ELSE 0 END)
                    AS BIGINT) AS s_stat
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.d < b.d
        GROUP BY 1
    ), n AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1
    ), ties AS (
        SELECT event_type,
               CAST(coalesce(sum(tc * (tc - 1) * (2 * tc + 5)), 0)
                    AS BIGINT) AS tie_term
        FROM (SELECT event_type, v, CAST(count(*) AS BIGINT) AS tc
              FROM daily GROUP BY 1, 2)
        GROUP BY 1
    )
    SELECT n.event_type, n.n_days, s.s_stat,
           CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                - ties.tie_term AS BIGINT) AS var_num18,
           round(CASE
               WHEN s.s_stat > 0 THEN (s.s_stat - 1) /
                   sqrt((n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                         - ties.tie_term) / 18.0)
               WHEN s.s_stat < 0 THEN (s.s_stat + 1) /
                   sqrt((n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                         - ties.tie_term) / 18.0)
               ELSE CAST(0 AS DOUBLE) END, 6) AS z_score
    FROM n
    JOIN s ON n.event_type = s.event_type
    JOIN ties ON n.event_type = ties.event_type
    """,
)
def events_mann_kendall_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mann-Kendall monotone-trend TEST per event type (Mann 1945,
    Kendall's tau numerator): S = Σ_{i<j} sign(v_j − v_i) over the
    daily revenue series, tie-corrected variance Var(S) = [n(n−1)(2n+5)
    − Σ_k t_k(t_k−1)(2t_k+5)]/18, and the continuity-corrected normal
    z — the nonparametric significance companion to
    `window_theil_sen_slope` (which estimates the slope MK tests) and
    `events_changepoint_cusum` (which locates breaks MK only detects).
    No distributional assumption, invariant to monotone transforms —
    the standard first-line trend screen in environmental/ops
    monitoring.

    Determinism: the series is exact integer day-cents (per-event
    floor(value·100+0.5), then BIGINT sums); S is an integer pairwise
    fold spelled as an explicit CASE (DuckDB's sign() folds to HUGEINT
    and Spark's signum() to DOUBLE — the CASE keeps both in BIGINT);
    the tie term and the 18·Var(S) numerator are exact BIGINT; z is
    the only double (one division + one sqrt per row, identical IEEE),
    6dp-rounded. Types with a single observed day carry no pair and
    are omitted by the inner join (documented contract).

    Scale shape: the corpus folds to the (type × day) grid in one
    map-combinable aggregate; the pairwise S self-join is an equi-join
    on event_type over that GRID (≤ types × days² with days bounded by
    the calendar — metadata-scale state, never raw events); ties and n
    are grid re-aggregates of the one persisted daily table."""
    from presto_truffle_spark.cache import scoped_persist

    ev = load_table(spark, sf_dir, "events")
    anchor = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    daily = ev.groupBy(
        "event_type",
        F.timestamp_diff("DAY", anchor, trunc_ntz("day", F.col("ts"))).alias(
            "d"
        ),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("v")
    )
    # daily feeds 4 consumers (pair sides, ties, n) — persist the
    # REDUCED grid, not raw events
    daily = scoped_persist(spark, "ts.mk.daily", daily)
    a = daily.select(
        F.col("event_type"), F.col("d").alias("da"), F.col("v").alias("va")
    )
    b = daily.select(
        F.col("event_type"), F.col("d").alias("db"), F.col("v").alias("vb")
    )
    s = (
        a.join(b, "event_type")
        .where(F.col("da") < F.col("db"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("vb") > F.col("va"), 1)
                .when(F.col("vb") < F.col("va"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    n = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    tc = daily.groupBy("event_type", "v").agg(
        F.count(F.lit(1)).cast("long").alias("tc")
    )
    ties = tc.groupBy("event_type").agg(
        F.coalesce(
            F.sum(
                F.col("tc") * (F.col("tc") - 1) * (2 * F.col("tc") + 5)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("tie_term")
    )
    nd = F.col("n_days")
    var_num18 = (nd * (nd - 1) * (2 * nd + 5) - F.col("tie_term")).cast(
        "long"
    )
    sd = F.sqrt(var_num18.cast("double") / F.lit(18.0))
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / sd)
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / sd)
        .otherwise(F.lit(0.0))
    )
    return (
        n.join(s, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            var_num18.alias("var_num18"),
            F.round(z, 6).alias("z_score"),
        )
    )


@query(
    "events_isotonic_daily_trend",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), ranked AS (
        SELECT event_type, day, c,
               CAST(row_number() OVER (
                   PARTITION BY event_type ORDER BY day) AS BIGINT) AS i,
               CAST(sum(c) OVER (
                   PARTITION BY event_type ORDER BY day) AS BIGINT) AS s
        FROM daily
    ), grid AS (
        SELECT a.event_type, a.i AS j, b.i AS k, b.day AS day, b.c AS c,
               CAST(b.s - a.s + a.c AS DOUBLE)
                   / CAST(b.i - a.i + 1 AS DOUBLE) AS avg_jk
        FROM ranked a JOIN ranked b
          ON a.event_type = b.event_type AND a.i <= b.i
    ), sufmin AS (
        SELECT event_type, j, k, day, c,
               min(avg_jk) OVER (
                   PARTITION BY event_type, j ORDER BY k DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS mji
        FROM grid
    ), fit AS (
        SELECT event_type, j, k, day, c,
               max(mji) OVER (
                   PARTITION BY event_type, k ORDER BY j
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS iso
        FROM sufmin
    )
    SELECT event_type, day, c AS n_events, round(iso, 6) AS iso_fit
    FROM fit WHERE j = k
    """,
)
def events_isotonic_daily_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ISOTONIC (monotone non-decreasing) regression of the daily
    event-count series per type, via the exact minimax identity
    ŷ_i = max_{j≤i} min_{k≥i} mean(y_j..y_k) (Barlow, Bartholomew,
    Bremner & Brunk 1972, §1.2 — the closed form of the PAVA fit) —
    the shape-constrained trend smoother: unlike a rolling mean it
    cannot overshoot, unlike OLS (`events_trend_regression`) it fits
    any monotone shape, and unlike Mann-Kendall
    (`events_mann_kendall_trend`, which TESTS for a trend) it
    ESTIMATES the trend as the closest non-decreasing step function
    in L2. The declarative form: prefix sums give every interval mean
    (S_k − S_{j−1})/(k−j+1); a j≤k grid self-join materializes them;
    a suffix-min window per (type, j) gives M(j,i) = min_{k≥i}; a
    prefix-max window per (type, i) over j finishes the minimax, and
    the j=i diagonal is the fit.

    Determinism: interval sums/lengths are exact integers; each mean
    is one IEEE double division (identical cross-engine); min/max
    windows keep exact doubles; 6dp rounding only at emission. Day =
    CAST(ts AS DATE) — zone-stable on NTZ (tztime module note).

    Scale shape: the corpus folds to the (type × day) grid in one
    map-combinable count; the j≤k self-join is equi on event_type
    over that GRID (≤ days²/2 per type with days bounded by the
    calendar — the Mann-Kendall/Theil-Sen precedent, metadata scale);
    both windows partition by (type, j)/(type, i) — never global. A
    multi-year 100 TB corpus grows the grid to ~0.5·(365·years)² rows
    per type, still executor-trivial; raw events are touched once."""
    from presto_truffle_spark.cache import scoped_persist

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = W.partitionBy("event_type").orderBy("day")
    ranked = daily.select(
        "event_type",
        "day",
        "c",
        F.row_number().over(w).cast("long").alias("i"),
        F.sum("c").over(w).cast("long").alias("s"),
    )
    ranked = scoped_persist(spark, "ts.iso.ranked", ranked)
    a = ranked.select(
        "event_type",
        F.col("i").alias("j"),
        F.col("s").alias("sj"),
        F.col("c").alias("cj"),
    )
    b = ranked.select(
        "event_type", F.col("i").alias("k"), "day", "c",
        F.col("s").alias("sk"),
    )
    grid = a.join(b, ["event_type"]).where(F.col("j") <= F.col("k")).select(
        "event_type",
        "j",
        "k",
        "day",
        "c",
        (
            (F.col("sk") - F.col("sj") + F.col("cj")).cast("double")
            / (F.col("k") - F.col("j") + F.lit(1)).cast("double")
        ).alias("avg_jk"),
    )
    w_sufmin = (
        W.partitionBy("event_type", "j")
        .orderBy(F.desc("k"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sufmin = grid.withColumn("mji", F.min("avg_jk").over(w_sufmin))
    w_fit = (
        W.partitionBy("event_type", "k")
        .orderBy("j")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fit = sufmin.withColumn("iso", F.max("mji").over(w_fit))
    return fit.where(F.col("j") == F.col("k")).select(
        "event_type",
        "day",
        F.col("c").alias("n_events"),
        F.round("iso", 6).alias("iso_fit"),
    )


@query(
    "events_max_revenue_burst",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ), ranked AS (
        SELECT event_type, day, cents,
               CAST(row_number() OVER (
                   PARTITION BY event_type ORDER BY day) AS BIGINT) AS i,
               CAST(sum(cents) OVER (
                   PARTITION BY event_type ORDER BY day) AS BIGINT) AS s,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n_days,
               CAST(sum(cents) OVER (PARTITION BY event_type) AS BIGINT)
                   AS total
        FROM daily
    ), grid AS (
        SELECT a.event_type,
               a.day AS start_day, b.day AS end_day,
               a.i AS j, b.i AS k,
               (b.s - a.s + a.cents) * a.n_days
                   - (b.i - a.i + 1) * a.total AS dev_scaled
        FROM ranked a JOIN ranked b
          ON a.event_type = b.event_type AND a.i <= b.i
    ), best AS (
        SELECT *,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY dev_scaled DESC, k - j ASC, j ASC)
                   AS rnk
        FROM grid
    )
    SELECT event_type, start_day, end_day,
           CAST(k - j + 1 AS BIGINT) AS burst_days,
           CAST(dev_scaled AS BIGINT) AS excess_cents_x_days
    FROM best WHERE rnk = 1
    """,
)
def events_max_revenue_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMUM-SUBARRAY burst detection (Kadane's problem, Bentley
    1984) on the mean-adjusted daily revenue series per type: the
    consecutive-day window with the largest total revenue EXCESS over
    the per-type average — 'when was the strongest sustained surge,
    and how big'. Mean adjustment is done SCALE-FREE in integers:
    dev(j..k) = sum(cents[j..k])·n_days − len·total (the interval sum
    minus len·mean, times n_days), so no division ever happens and
    the argmax is exact. Complements `events_changepoint_cusum`
    (which finds the single best SPLIT point) and
    `events_error_streaks` (run-length of a fixed predicate): this op
    optimizes over ALL O(n²) intervals with a deterministic tie-break
    (shortest, then earliest).

    Declarative Kadane: prefix sums turn every interval sum into a
    difference, a j≤k grid self-join materializes all intervals (the
    isotonic/Theil-Sen precedent — calendar-bounded), and one ranked
    window picks the winner per type. Pure BIGINT end to end.

    Scale shape: raw events fold to the (type × day) grid in one
    map-combinable aggregate; the grid self-join is equi on
    event_type over ≤ days²/2 rows per type; the rank window
    partitions by event_type. At 100 TB only the first aggregate
    sees data; a multi-year grid is ~(365·years)²/2 rows per type —
    executor-trivial."""
    from presto_truffle_spark.cache import scoped_persist

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = W.partitionBy("event_type").orderBy("day")
    wp = W.partitionBy("event_type")
    ranked = daily.select(
        "event_type",
        "day",
        "cents",
        F.row_number().over(w).cast("long").alias("i"),
        F.sum("cents").over(w).cast("long").alias("s"),
        F.count(F.lit(1)).over(wp).cast("long").alias("n_days"),
        F.sum("cents").over(wp).cast("long").alias("total"),
    )
    ranked = scoped_persist(spark, "ts.burst.ranked", ranked)
    a = ranked.select(
        "event_type",
        F.col("day").alias("start_day"),
        F.col("i").alias("j"),
        F.col("s").alias("sj"),
        F.col("cents").alias("cj"),
        "n_days",
        "total",
    )
    b = ranked.select(
        "event_type",
        F.col("day").alias("end_day"),
        F.col("i").alias("k"),
        F.col("s").alias("sk"),
    )
    grid = a.join(b, ["event_type"]).where(F.col("j") <= F.col("k")).select(
        "event_type",
        "start_day",
        "end_day",
        "j",
        "k",
        (
            (F.col("sk") - F.col("sj") + F.col("cj")) * F.col("n_days")
            - (F.col("k") - F.col("j") + F.lit(1)) * F.col("total")
        ).alias("dev_scaled"),
    )
    w_best = W.partitionBy("event_type").orderBy(
        F.desc("dev_scaled"), (F.col("k") - F.col("j")).asc(), F.col("j").asc()
    )
    return (
        grid.withColumn("rnk", F.row_number().over(w_best))
        .where(F.col("rnk") == 1)
        .select(
            "event_type",
            "start_day",
            "end_day",
            (F.col("k") - F.col("j") + F.lit(1)).cast("long").alias("burst_days"),
            F.col("dev_scaled").cast("long").alias("excess_cents_x_days"),
        )
    )


@query(
    "events_burstiness_fano",
    oracle="""
    WITH c AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), span AS (
        SELECT min(day) AS dmin, max(day) AS dmax FROM c
    ), spine AS (
        SELECT CAST(unnest(generate_series(dmin, dmax, INTERVAL 1 DAY))
                    AS DATE) AS day
        FROM span
    ), grid AS (
        SELECT t.event_type, s.day,
               CAST(COALESCE(c.c, 0) AS BIGINT) AS c
        FROM (SELECT DISTINCT event_type FROM c) t
        CROSS JOIN spine s
        LEFT JOIN c ON c.event_type = t.event_type AND c.day = s.day
    ), s AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(c) AS BIGINT) AS n_events,
               CAST(sum(c * c) AS BIGINT) AS sum_sq
        FROM grid GROUP BY 1
    )
    SELECT event_type, n_days, n_events,
           round((n_days * sum_sq - n_events * n_events) * 1.0
                 / (n_days * n_events), 6) AS fano_factor
    FROM s
    """,
)
def events_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BURSTINESS profile: the Fano factor (index of dispersion,
    variance/mean of daily counts) per event type — the standard
    traffic diagnostic separating Poisson-like arrivals (F ≈ 1) from
    bursty (F > 1, variance-dominated: campaign spikes, batch
    replays) and regular (F < 1, rate-limited) streams; downstream it
    picks between fixed and burst-aware capacity planning the same
    way `profile_key_skew` picks the salt factor. Population form
    over the (type × day) grid: F = (n·Σc² − (Σc)²) / (n·Σc).

    GAP HARDENING (VERDICT r14 #3): the daily-count grid is completed
    against a calendar spine spanning the corpus observation window
    (global min..max event day) before the per-type fold, so days a
    type emitted NOTHING contribute c = 0 instead of silently
    vanishing — on a gappy corpus the present-days-only Fano both
    understates variance (missing zeros) and overstates the mean's
    denominator coverage. The observation window is a corpus
    property, not a per-type one: a type dormant at the edges of the
    window is genuinely bursty, not short-lived. On the driver
    fixture the (day, type) grid has zero gaps (probed r13,
    FIXTURES.md), so this rewrite is output-preserving there; the
    gappy-fixture unit test (tests/test_fano_gapfill.py) proves the
    fork on synthetic data.

    Determinism: daily counts, their squares, and both folds are
    exact BIGINTs; the single double division is rounded 6dp with the
    expression shape byte-matched across engines.

    Scale shape: one map-combinable count to the calendar-bounded
    (type × day) grid; the spine (span_days rows) × distinct-types
    completion and everything downstream are calendar-bounded, never
    event-volume. 100 TB-safe."""
    c = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    # calendar-bounded grid with THREE consumers (span agg, distinct
    # types, the completion left-join) — unpersisted, each replays the
    # event count (r15 rescan audit: 3 event scans -> 1).
    from presto_truffle_spark.cache import scoped_persist

    c = scoped_persist(spark, "events.fano.grid", c)
    spine = c.agg(
        F.min("day").alias("dmin"), F.max("day").alias("dmax")
    ).select(
        F.explode(
            F.sequence("dmin", "dmax", F.expr("INTERVAL '1' DAY"))
        ).alias("day")
    )
    grid = (
        c.select("event_type")
        .distinct()
        .crossJoin(spine)
        .join(c, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c"),
        )
    )
    s = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("c").cast("long").alias("n_events"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_sq"),
    )
    return s.select(
        "event_type",
        "n_days",
        "n_events",
        F.round(
            (
                F.col("n_days") * F.col("sum_sq")
                - F.col("n_events") * F.col("n_events")
            )
            * 1.0
            / (F.col("n_days") * F.col("n_events")),
            6,
        ).alias("fano_factor"),
    )


# R/S analysis scales (days). The fixture's event span is 30 days, so
# the dyadic ladder is {3, 5, 10} — complete blocks 10/6/3; on a real
# multi-year stream the list extends (the machinery is scale-count
# bounded, never data bounded).
_HURST_SCALES = (3, 5, 10)


@query(
    "events_hurst_rescaled_range",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS x
        FROM events GROUP BY 1
    ), d0 AS (
        SELECT min(day) AS dmin FROM daily
    ), d AS (
        SELECT CAST(day - dmin AS BIGINT) AS i, x
        FROM daily CROSS JOIN d0
    ), sc AS (
        SELECT unnest(ARRAY{list(_HURST_SCALES)}) AS s
    ), g AS (
        SELECT s, i // s AS b, i, x FROM d CROSS JOIN sc
    ), blk AS (
        SELECT s, b, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM g GROUP BY 1, 2
    ), cb AS (
        SELECT s, b, sx, s * sxx - sx * sx AS m
        FROM blk WHERE n = s AND s * sxx - sx * sx > 0
    ), dev AS (
        SELECT g.s, g.b,
               CAST(sum(g.x * g.s - cb.sx)
                    OVER (PARTITION BY g.s, g.b ORDER BY g.i)
                    AS BIGINT) AS y,
               cb.m
        FROM g JOIN cb ON cb.s = g.s AND cb.b = g.b
    ), rs AS (
        SELECT s, b,
               CAST(round(ln((max(y) - min(y)) / sqrt(CAST(max(m) AS DOUBLE)))
                          * 1000000) AS BIGINT) AS ln_rs_micro
        FROM dev GROUP BY s, b
        HAVING max(y) - min(y) > 0
    ), per_scale AS (
        SELECT s, CAST(count(*) AS BIGINT) AS n_blocks,
               CAST(sum(ln_rs_micro) AS BIGINT) AS sum_y,
               CAST(round(ln(s) * 1000000) AS BIGINT) AS ls
        FROM rs GROUP BY s
    ), fit AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(ls) AS BIGINT) AS sl,
               CAST(sum(sum_y // n_blocks) AS BIGINT) AS sy,
               CAST(sum(ls * (sum_y // n_blocks)) AS BIGINT) AS sly,
               CAST(sum(ls * ls) AS BIGINT) AS sll
        FROM per_scale
    )
    SELECT CAST(s AS BIGINT) AS scale_days, n_blocks,
           CAST(sum_y // n_blocks AS BIGINT) AS mean_ln_rs_micro,
           round((k * sly - sl * sy) * 1.0 / (k * sll - sl * sl), 6)
               AS hurst_estimate
    FROM per_scale CROSS JOIN fit
    """,
)
def events_hurst_rescaled_range(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HURST EXPONENT via rescaled-range (R/S) analysis (Hurst 1951;
    Mandelbrot & Wallis 1969) over daily revenue — the long-range-
    dependence diagnostic none of the existing time-series ops cover
    (autocorrelation sees one lag; CUSUM sees level shifts; R/S sees
    PERSISTENCE: H > 0.5 = trending/momentum, H ≈ 0.5 = random walk,
    H < 0.5 = mean-reverting), which decides whether naive day-ahead
    capacity extrapolation is defensible. Per scale s: the day grid
    splits into complete s-day blocks; within each block the running
    cumulative deviation from the block mean gives the range R, the
    block's population σ gives S, and H is the OLS slope of
    E[ln(R/S)] against ln(s).

    Determinism discipline (the stats-suite pattern): daily revenue is
    exact integer cents; deviations are computed ×s so block running
    sums stay exact BIGINTs (x·s − Σx); R_scaled = max−min is integer;
    R/S = R_scaled/√(s·Σx² − (Σx)²) needs ONE sqrt + ONE ln per block,
    frozen immediately as integer micro-nats (round(ln·1e6) — the LM
    family's proven cross-libm envelope); per-scale means and the OLS
    slope fold exact integers (the ≤|scales|-row fit frame), with the
    single final division rounded 6dp. Degenerate blocks (zero
    variance or zero range) are excluded identically on both engines.

    Scale shape: one map-combinable fold to the calendar-bounded day
    grid, a ×|scales| grid expansion, per-(scale, block) windows over
    ≤max(scale) rows, and a ≤|scales|-row fit — nothing downstream of
    the first fold is event-volume. 100 TB-safe."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        )
        .cast("long")
        .alias("x")
    )
    d0 = daily.agg(F.min("day").alias("dmin"))
    d = daily.crossJoin(F.broadcast(d0)).select(
        F.datediff("day", "dmin").cast("long").alias("i"), "x"
    )
    sc = spark.createDataFrame(
        [(int(s),) for s in _HURST_SCALES], "s long"
    )
    g = d.crossJoin(F.broadcast(sc)).select(
        "s", F.expr("i DIV s").alias("b"), "i", "x"
    )
    from presto_truffle_spark.cache import scoped_persist

    g = scoped_persist(spark, "events.hurst.g", g)
    blk = g.groupBy("s", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    m = F.col("s") * F.col("sxx") - F.col("sx") * F.col("sx")
    cb = blk.filter((F.col("n") == F.col("s")) & (m > 0)).select(
        "s", "b", "sx", m.alias("m")
    )
    dev = (
        g.join(cb, ["s", "b"])
        .select(
            "s",
            "b",
            F.sum(F.col("x") * F.col("s") - F.col("sx"))
            .over(
                W.partitionBy("s", "b")
                .orderBy("i")
                .rowsBetween(W.unboundedPreceding, 0)
            )
            .cast("long")
            .alias("y"),
            "m",
        )
    )
    rs = (
        dev.groupBy("s", "b")
        .agg(
            (F.max("y") - F.min("y")).alias("r_scaled"),
            F.max("m").alias("m"),
        )
        .filter(F.col("r_scaled") > 0)
        .select(
            "s",
            F.round(
                F.log(
                    F.col("r_scaled")
                    / F.sqrt(F.col("m").cast("double"))
                )
                * 1000000
            )
            .cast("long")
            .alias("ln_rs_micro"),
        )
    )
    per_scale = rs.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum("ln_rs_micro").cast("long").alias("sum_y"),
        F.round(F.log(F.col("s").cast("double")) * 1000000)
        .cast("long")
        .alias("ls"),
    )
    per_scale = scoped_persist(spark, "events.hurst.ps", per_scale)
    ymean = F.expr("sum_y DIV n_blocks")
    fit = per_scale.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ls").cast("long").alias("sl"),
        F.sum(ymean).cast("long").alias("sy"),
        F.sum(F.col("ls") * ymean).cast("long").alias("sly"),
        F.sum(F.col("ls") * F.col("ls")).cast("long").alias("sll"),
    )
    return per_scale.crossJoin(F.broadcast(fit)).select(
        F.col("s").cast("long").alias("scale_days"),
        "n_blocks",
        ymean.cast("long").alias("mean_ln_rs_micro"),
        F.round(
            (F.col("k") * F.col("sly") - F.col("sl") * F.col("sy"))
            * 1.0
            / (F.col("k") * F.col("sll") - F.col("sl") * F.col("sl")),
            6,
        ).alias("hurst_estimate"),
    )


# Bollinger window: trailing days INCLUDING the current one, and the
# band half-width in population standard deviations.
_BOLL_WINDOW = 7
_BOLL_K = 2


@query(
    "window_bollinger_breakout",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ), w AS (
        SELECT event_type, day, x,
               CAST(count(*) OVER fr AS BIGINT) AS n,
               CAST(sum(x) OVER fr AS BIGINT) AS sx,
               CAST(sum(x * x) OVER fr AS BIGINT) AS sxx
        FROM daily
        WINDOW fr AS (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN {_BOLL_WINDOW - 1} PRECEDING
                               AND CURRENT ROW)
    )
    SELECT event_type, day, x AS revenue_cents, n AS n_window,
           floor(sx * 1.0 / n * 1000000 + 0.5) / 1000000 AS band_mid,
           floor((sx * 1.0 / n
                  + {_BOLL_K} * sqrt((n * sxx - sx * sx) * 1.0 / (n * n)))
                 * 1000000 + 0.5) / 1000000 AS band_upper,
           floor((sx * 1.0 / n
                  - {_BOLL_K} * sqrt((n * sxx - sx * sx) * 1.0 / (n * n)))
                 * 1000000 + 0.5) / 1000000 AS band_lower,
           CAST(CASE WHEN n >= {_BOLL_WINDOW}
                      AND (x > sx * 1.0 / n
                               + {_BOLL_K} * sqrt((n * sxx - sx * sx)
                                                  * 1.0 / (n * n))
                        OR x < sx * 1.0 / n
                               - {_BOLL_K} * sqrt((n * sxx - sx * sx)
                                                  * 1.0 / (n * n)))
                     THEN 1 ELSE 0 END AS BIGINT) AS breakout
    FROM w
    """,
)
def window_bollinger_breakout(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BOLLINGER BANDS with breakout flags over daily revenue per event
    type (Bollinger 1992) — the rolling-MOMENT window the suite lacks:
    `events_anomaly_mad` scores against a GLOBAL robust center and
    `window_ewma_*` tracks a recency-weighted level, but a volatility-
    ADAPTIVE envelope (trailing mean ± k·trailing σ) widens in noisy
    regimes and tightens in calm ones, which is why it is the standard
    regime-aware breakout detector. Rolling count/Σx/Σx² come from ONE
    frame specification; σ is the population form ((nΣx² − (Σx)²)/n²).
    Breakouts are only flagged once the frame is FULL (n ≥ 7) — a
    warm-up day judged against a 2-day σ would alert on noise.

    Determinism: daily revenue is exact cents; the frame sums are
    exact BIGINT folds; every emitted double goes through the
    floor(x·10⁶+0.5)/10⁶ row-level rounding convention (Spark round()
    and DuckDB round() disagree at binary boundaries — quality_ops.
    _floor_round rationale), and the breakout comparison runs on the
    UNROUNDED expression with byte-matched shape on both engines.

    Scale shape: one map-combinable count to the calendar-bounded
    (type × day) grid, then per-type day-grid windows (≤span_days rows
    per partition — the grid-bounded window family the plan audit
    whitelists). Nothing downstream of the first fold is
    event-volume. 100 TB-safe."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(
                F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
            )
            .cast("long")
            .alias("x")
        )
    )
    fr = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(_BOLL_WINDOW - 1), W.currentRow)
    )
    w = daily.select(
        "event_type",
        "day",
        "x",
        F.count(F.lit(1)).over(fr).cast("long").alias("n"),
        F.sum("x").over(fr).cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(fr).cast("long").alias("sxx"),
    )
    mid = F.col("sx") * 1.0 / F.col("n")
    sig = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * 1.0
        / (F.col("n") * F.col("n"))
    )
    upper = mid + _BOLL_K * sig
    lower = mid - _BOLL_K * sig

    def r6(col):
        return F.floor(col * 1000000 + F.lit(0.5)) / 1000000

    return w.select(
        "event_type",
        "day",
        F.col("x").alias("revenue_cents"),
        F.col("n").alias("n_window"),
        r6(mid).alias("band_mid"),
        r6(upper).alias("band_upper"),
        r6(lower).alias("band_lower"),
        F.when(
            (F.col("n") >= _BOLL_WINDOW)
            & ((F.col("x") > upper) | (F.col("x") < lower)),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("breakout"),
    )


@query(
    "events_logrank_test",
    oracle="""
    WITH death AS (
        SELECT user_id, CAST(user_id % 2 AS BIGINT) AS grp,
               max(CAST(ts AS DATE)) AS dday
        FROM events GROUP BY 1
    ), byday AS (
        SELECT dday,
               CAST(count(*) AS BIGINT) AS d,
               CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS d1
        FROM death GROUP BY 1
    ), risk AS (
        SELECT dday, d, d1,
               CAST(sum(d) OVER (ORDER BY dday DESC) AS BIGINT) AS r,
               CAST(sum(d1) OVER (ORDER BY dday DESC) AS BIGINT) AS r1
        FROM byday
    ), terms AS (
        SELECT dday, d, d1, r, r1,
               CAST(floor(d * (r1 * 1.0 / r) * 1000000 + 0.5)
                    AS BIGINT) AS e1_micro,
               CASE WHEN r > 1 THEN
                   CAST(floor(d * (r1 * 1.0 / r) * (1 - r1 * 1.0 / r)
                              * ((r - d) * 1.0 / (r - 1))
                              * 1000000 + 0.5) AS BIGINT)
               ELSE CAST(0 AS BIGINT) END AS v_micro
        FROM risk
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(d1) AS BIGINT) AS o1,
               CAST(sum(e1_micro) AS BIGINT) AS e1m,
               CAST(sum(v_micro) AS BIGINT) AS vm
        FROM terms
    )
    SELECT n_days, o1,
           round(e1m / 1000000.0, 6) AS e1,
           round(vm / 1000000.0, 6) AS variance,
           CASE WHEN vm > 0 THEN
               round((o1 - e1m / 1000000.0) * (o1 - e1m / 1000000.0)
                     / (vm / 1000000.0), 6)
           END AS logrank_chi2
    FROM s
    """,
)
def events_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOG-RANK (Mantel-Cox) test between two user cohorts' survival —
    the hypothesis-testing companion `events_survival_curve` (the KM
    estimator) lacks: per death-day, group 1's observed deaths vs the
    expectation d·r₁/r under the pooled-hazard null, with the
    hypergeometric variance d·(r₁/r)(1−r₁/r)(r−d)/(r−1); χ² =
    (ΣO−ΣE)²/ΣV on 1 df. The experiment readout for retention A/B
    tests — Welch/MWU compare POINT metrics, KS compares static
    distributions; log-rank is the standard test for censored
    time-to-event curves (deterministic cohorts here: user_id parity,
    the same split the corpus hash-split family uses for replays).

    Determinism: death days, per-day death/at-risk counts and the
    reverse-cumulative risk sets are exact integers; each day's E and
    V are FROZEN to integer micro-units before summation (one
    shape-matched double expression each — nothing float is ever
    added; ratios-first keeps every intermediate ≤ d, so the freeze's
    2⁵³ bound holds at any population). Final χ² is one expression of
    the exact sums, 6dp-rounded.

    Scale shape: one user fold (map-combinable max), one count to the
    death-day grid, then day-grid reverse-cumulative windows
    (≤span_days rows — the whitelisted day-table window family the KM
    op already uses) and a 1-row fold. 100 TB-safe."""
    death = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max(F.col("ts").cast("date")).alias("dday"))
        .select(
            (F.col("user_id") % 2).cast("long").alias("grp"), "dday"
        )
    )
    byday = death.groupBy("dday").agg(
        F.count(F.lit(1)).cast("long").alias("d"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("d1"),
    )
    w_rev = (
        W.orderBy(F.col("dday").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    risk = byday.select(
        "dday",
        "d",
        "d1",
        F.sum("d").over(w_rev).cast("long").alias("r"),
        F.sum("d1").over(w_rev).cast("long").alias("r1"),
    )
    p1 = F.col("r1") * 1.0 / F.col("r")
    e1_micro = F.floor(
        F.col("d") * p1 * 1000000 + F.lit(0.5)
    ).cast("long")
    v_micro = F.when(
        F.col("r") > 1,
        F.floor(
            F.col("d")
            * p1
            * (1 - p1)
            * ((F.col("r") - F.col("d")) * 1.0 / (F.col("r") - 1))
            * 1000000
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    s = risk.select(
        "d1", e1_micro.alias("e1_micro"), v_micro.alias("v_micro")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("d1").cast("long").alias("o1"),
        F.sum("e1_micro").cast("long").alias("e1m"),
        F.sum("v_micro").cast("long").alias("vm"),
    )
    return s.select(
        "n_days",
        "o1",
        F.round(F.col("e1m") / 1000000.0, 6).alias("e1"),
        F.round(F.col("vm") / 1000000.0, 6).alias("variance"),
        F.when(
            F.col("vm") > 0,
            F.round(
                (F.col("o1") - F.col("e1m") / 1000000.0)
                * (F.col("o1") - F.col("e1m") / 1000000.0)
                / (F.col("vm") / 1000000.0),
                6,
            ),
        ).alias("logrank_chi2"),
    )
