"""Structured Streaming twins of the batch time-series operators.

SURVEY.md §2.2 "Streaming": tumbling windows, watermarks + late data,
stateful dedup, arbitrary state. Each operator here drives a REAL
Structured Streaming query — ``readStream`` over the events parquet →
transformation → memory sink — run to completion synchronously
(``availableNow`` trigger + ``processAllAvailable``), then returns the
sink's contents as a DataFrame so the driver's harness can inspect it.

Semantics notes:
  * ``streaming_tumbling_counts`` uses complete output mode, so its result
    equals the batch twin (events_tumbling_window modulo column subset) and
    carries a full DuckDB oracle — the strongest check a streaming op can
    get.
  * Watermark-gated operators (append mode) emit only windows the
    watermark has closed; with a single availableNow batch the tail of the
    stream is withheld by design → rows-only checks.

Scale posture: streaming state lives in the state store keyed by
(window/user); at production scale the same code runs against Kafka with
checkpointing to object storage — the parquet file source is the test
harness stand-in.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from presto_truffle_spark.catalog import load_table
from presto_truffle_spark.plans.rewrites import broadcast_if_dim
from presto_truffle_spark.registry import query

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".tmp")


def checkpoint_dir() -> str:
    """Fresh checkpoint location under the repo's gitignored scratch dir
    (at production scale this is an object-store path)."""
    os.makedirs(_SCRATCH, exist_ok=True)
    return tempfile.mkdtemp(prefix="ckpt_", dir=_SCRATCH)


def drop_checkpoint(path: str) -> None:
    """Remove a one-shot checkpoint after its query completed. The fixture
    queries are run-to-completion demos — keeping their checkpoints would
    accumulate ~MBs per invocation in .tmp for state no restart will ever
    read (a production stream, which DOES restart, never deletes its
    checkpoint)."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events fixture (schema from a batch peek —
    file-source streams require an explicit schema)."""
    # Declare the RAW parquet schema (ts is INT64-nanos → bigint under
    # nanosAsLong), then convert to a proper timestamp — mirroring
    # catalog.load_table. NB: the load glob is deliberate — a non-wildcard
    # path is treated as a directory by the file stream source, and the
    # fixture is a single file.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .load(f"{sf_dir}/events.parq*")
    )
    # Watermarks REQUIRE TimestampType (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    # on NTZ), so streaming is the one place the naive fixture ts becomes
    # LTZ. The NTZ->LTZ cast interprets the naive value in the session
    # zone, and the DRIVER owns the session — so pin it to UTC here (not
    # restored: the returned plans evaluate lazily at the driver's
    # collect, and the final NTZ output casts in _ntz_cols need the same
    # zone). Under UTC the cast is value-preserving, matching the DuckDB
    # oracles' naive timestamps. Batch operators never cast at all — they
    # stay NTZ end-to-end (tztime.py).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _ntz_cols(df: DataFrame) -> DataFrame:
    """Cast every top-level LTZ timestamp column to TIMESTAMP_NTZ before
    handing results to the driver: NTZ values collect as plain naive
    datetimes with NO zone conversion (neither the session zone nor the
    Python-side local zone the LTZ collect path consults), so the hashed
    output cannot shift with the driver's environment. Value-preserving
    because the session zone is pinned UTC in _events_stream."""
    return df.select(
        *[
            F.col(c).cast("timestamp_ntz").alias(c) if t == "timestamp" else F.col(c)
            for c, t in df.dtypes
        ]
    )


def stream_shuffle_partitions(
    sf_dir: str | None, python_stateful: bool = False
) -> int:
    """State-store partition count for the run-to-completion fixture
    streams, derived from the micro-batch input size instead of a
    constant (guide §2.2 scale-adaptive partitioning; VERDICT r17 #3).
    A streaming query fixes its state-store count at start and pays one
    store (directory, snapshot, commit) per shuffle partition per batch,
    so the right number tracks STATE VOLUME: ~32 MB of input per store
    here, floored at 2 (the distributed path stays exercised — never 1,
    which would hide single-partition bugs) and capped at 200 (the
    vanilla-session default a production stream starts from before
    sizing to its own throughput). Measured at sf0.01: 8 stores → 2
    cuts the per-key micro-batch wall ~10-25% (store setup dominates
    tiny batches; values are partition-count-independent, which the
    oracle and the CPUS=7 layout gate verify). Overridable via
    SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS for cluster experiments.

    ``python_stateful`` keeps a floor of 8: for applyInPandasWithState /
    transformWithStateInPandas / Python-source streams the partition
    count is ALSO the Python-worker parallelism of the per-batch
    compute, and the measured A/B shows the store saving is dwarfed by
    serializing the Python work (transform_with_state 2.3 s at 8
    partitions → 7.0 s at 2)."""
    env = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS")
    if env:
        return int(env)
    floor = 8 if python_stateful else 2
    if sf_dir is None:
        # Non-file sources (rate / python datasource) generate KBs per
        # fixture batch — the floor is the right size for them.
        return floor
    from presto_truffle_spark.cache import input_bytes

    try:
        nbytes = input_bytes(sf_dir, "events")
    except OSError:
        return 8  # unknown size: the pre-r18 fixture constant
    return max(floor, min(200, nbytes // (32 << 20)))


def _run_to_memory(df: DataFrame, mode: str, sf_dir: str | None = None) -> DataFrame:
    """Execute a streaming DataFrame to completion into a memory sink and
    return the materialized result.

    Shuffle partitions are temporarily pinned low: a streaming query fixes
    its state-store partition count at start, and a state store per
    partition (RocksDB/HDFS dirs, snapshot files) makes tiny-fixture runs
    latency-bound on store setup — under a default 200-partition session
    the same query is ~10× slower for zero benefit. Production sizes this
    to throughput; the fixture derives it from input size
    (stream_shuffle_partitions above)."""
    spark = df.sparkSession
    name = "s" + uuid.uuid4().hex[:12]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(stream_shuffle_partitions(sf_dir))
    )
    ckpt = checkpoint_dir()
    try:
        q = (
            df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        drop_checkpoint(ckpt)
    return spark.table(name)


@query(
    "streaming_tumbling_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           count(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window counts as a genuine streaming query (complete mode →
    every window in the sink → result ≡ batch → full DuckDB oracle)."""
    agg = (
        _events_stream(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _run_to_memory(agg, "complete", sf_dir)
    return _ntz_cols(
        out.select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


@query(
    "streaming_windowed_watermark",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total
    FROM events
    GROUP BY 1, 2
    HAVING time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
               + INTERVAL '2 hours'
           <= (SELECT max(CAST(ts AS TIMESTAMP)) FROM events)
    """,
)
def streaming_windowed_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling windows with a 1-hour watermark in append mode: late data
    beyond the watermark is dropped, and only closed windows emit; the
    final (still-open) windows of the fixture are correctly withheld.

    That withholding IS deterministic for a replayed fixture, so this
    carries a full oracle rather than a rows-only check: after the last
    micro-batch the watermark settles at max(ts) - 1h, and append mode has
    emitted exactly the windows with window_end <= watermark — i.e.
    window_start + 1h (window) + 1h (delay) <= max(ts), which is what the
    oracle's HAVING clause encodes."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total"))
    )
    out = _run_to_memory(agg, "append", sf_dir)
    return _ntz_cols(
        out.select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "total"
        )
    )


@query(
    "streaming_dedup_watermark",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup on (user_id, event_type) within a 1-hour
    watermark (``dropDuplicatesWithinWatermark``): state for a key expires
    once the watermark passes it — bounded state on an unbounded stream,
    which is what makes dedup feasible on a 100 TB/day event firehose.

    WHICH duplicate survives is arrival-order dependent (not checkable),
    but key COVERAGE is exact: every (user_id, event_type) present in the
    stream emits at least once, and the fixture's span is short enough that
    no key's state expires and re-emits. The registered envelope is the
    distinct key set of the dedup output, hash-matched against the distinct
    key set of the raw events — survivor identity stays unchecked, key
    completeness and the dedup property itself are."""
    dd = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type", "event_id", "ts")
    )
    return _run_to_memory(dd, "append", sf_dir).select("user_id", "event_type").distinct()


@query(
    "streaming_session_window",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), seq AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS is_new
        FROM ev
    ), islands AS (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM seq
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           count(*) AS n_events
    FROM islands
    GROUP BY user_id, session_seq
    HAVING max(ts) + INTERVAL '30 minutes'
           <= (SELECT max(CAST(ts AS TIMESTAMP)) FROM events) - INTERVAL '1 hour'
    """,
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming session windows (30-min gap) with watermark —
    sessions merge as events arrive and emit when the watermark passes
    session end. Batch twin: events_session_window.

    Append-mode emission is deterministic on a replayed fixture: the final
    watermark is max(ts) - 1h, and exactly the sessions whose end
    (last event + gap) <= watermark have emitted — so the oracle is the
    batch gaps-and-islands SQL with that HAVING bound, a full-strength
    check of both the session assembly and the watermark semantics."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _run_to_memory(agg, "append", sf_dir)
    return _ntz_cols(
        out.select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


_RATE_ROWS = 2000


@query(
    "streaming_rate_ingest",
    oracle=f"""
    WITH src AS (
        SELECT unnest(generate_series(0, {_RATE_ROWS - 1})) AS value
    ), ev AS (
        SELECT value % 50 AS user_id,
               CASE value % 4 WHEN 0 THEN 'click' WHEN 1 THEN 'view'
                              WHEN 2 THEN 'purchase' ELSE 'error' END AS event_type,
               TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (value) SECOND AS ev_ts
        FROM src
    )
    SELECT time_bucket(INTERVAL '10 minutes', ev_ts) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(user_id) AS BIGINT) AS sum_uid
    FROM ev
    GROUP BY 1, 2
    """,
)
def streaming_rate_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-shaped ingest pipeline on the deterministic ``rate-micro-batch``
    source (fixed rows per micro-batch — the container has no Kafka, and
    the plain ``rate`` source emits wall-clock-dependent row counts):
    source → event synthesis (event time DERIVED from the monotonically
    increasing ``value``, so replay is exact) → tumbling 10-min windowed
    aggregation → complete-mode sink. Because every batch is deterministic
    the whole streaming pipeline carries a FULL DuckDB oracle — the
    replayability property a production ingest needs for exactly-once
    backfill, demonstrated end to end.

    At scale the same plan reads Kafka with maxOffsetsPerTrigger as the
    batch-size dial and the watermark bounding state; sf_dir is unused
    (the source is synthetic) but kept for the uniform query signature."""
    sf_dir = None  # synthetic source (KB-scale): partition floor applies
    stream = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", str(_RATE_ROWS))
        .option("numPartitions", "4")
        .load()
    )
    ev = stream.select(
        (F.col("value") % 50).alias("user_id"),
        F.when(F.col("value") % 4 == 0, "click")
        .when(F.col("value") % 4 == 1, "view")
        .when(F.col("value") % 4 == 2, "purchase")
        .otherwise("error")
        .alias("event_type"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
            + F.make_dt_interval(secs=F.col("value").cast("double"))
        ).alias("ev_ts"),
    )
    agg = ev.groupBy(F.window("ev_ts", "10 minutes").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        # exact COUNT(DISTINCT) is unsupported on streams (state would be
        # unbounded per group); production uses approx_count_distinct —
        # here a deterministic sum keeps the oracle exact
        F.sum("user_id").alias("sum_uid"),
    )
    out = _run_to_memory(agg, "complete", sf_dir)
    return out.select(
        F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_uid"
    )


@query(
    "streaming_stream_stream_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(epoch_ms(CAST(p.ts AS TIMESTAMP))
                - epoch_ms(CAST(c.ts AS TIMESTAMP)) AS BIGINT) AS delay_ms,
           p.value AS purchase_value
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND p.event_type = 'purchase'
     AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
     AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL 1 HOUR
    """,
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream INNER interval join: click→purchase attribution
    within one hour, per user. Both sides are event streams with
    watermarks; the join condition carries the event-time range bound
    Spark needs to size the state stores — each side buffers only rows
    younger than (watermark − bound), so state is bounded by rate × window
    on an unbounded stream. This is THE two-firehose operator at scale:
    shuffle on user_id co-partitions the streams; state eviction is
    watermark-driven, identical to the batch twin ``join_range_theta``'s
    semantics but incremental.

    Determinism: inner stream-stream joins emit a match as soon as both
    rows are buffered — no watermark-delayed emission (unlike outer
    variants, whose null-extended rows wait for state eviction and only
    arrive on a post-data batch). Replaying the single-file fixture under
    availableNow therefore yields exactly the batch join, which is the
    attached oracle. delay_ms is an exact integer millisecond difference
    (unix_millis both sides — no float epoch, no cross-engine cast
    rounding)."""
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c_user = user_id AND p_ts >= c_ts AND p_ts <= c_ts + interval 1 hour"
        ),
    )
    out = _run_to_memory(joined, "append", sf_dir)
    return out.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_millis("p_ts") - F.unix_millis("c_ts")).alias("delay_ms"),
        "purchase_value",
    )


@query(
    "streaming_stream_static_join",
    oracle="""
    SELECT n_name AS nation,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0
               AS total_value
    FROM events
    JOIN customer ON user_id = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE event_type = 'purchase'
    GROUP BY n_name
    """,
)
def streaming_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: enrich a purchase stream with batch dimension
    tables (customer → nation), then aggregate revenue per nation. The
    static side is re-read per micro-batch (picking up dim updates) and
    needs NO watermark or state. nation (25 rows) broadcasts outright;
    customer grows with SF so it routes through ``broadcast_if_dim`` —
    at fixture scale the planner still picks broadcast from size stats,
    while at 100 TB the enrichment becomes a shuffled join against the
    stream's micro-batches instead of OOMing executors with a
    multi-GB broadcast. Only the final tiny groupBy keeps state (one row
    per nation). Complete mode makes the fixture run emit the final totals —
    identical to the batch join, hence the full oracle. Revenue sums
    integer cents (exact in any accumulation order); count/sum state per
    group is O(groups), bounded by nation cardinality."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    purchases = _events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    enriched = purchases.join(
        broadcast_if_dim(c, "customer"), purchases.user_id == c.c_custkey
    ).join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
    agg = enriched.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))) / 100.0
        ).alias("total_value"),
    )
    return _run_to_memory(agg, "complete", sf_dir)


@query(
    "streaming_stream_stream_left_join",
    oracle="""
    WITH c AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'click'
    ), p AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'purchase'
    ), wm AS (
        SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
               - INTERVAL 1 HOUR AS w
    ), matched AS (
        SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
        FROM c JOIN p
          ON c.user_id = p.user_id
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    )
    SELECT user_id, click_id, purchase_id FROM matched
    UNION ALL
    SELECT c.user_id, c.event_id, CAST(NULL AS BIGINT)
    FROM c, wm
    WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.click_id = c.event_id)
      AND c.ts + INTERVAL 1 HOUR < wm.w
    """,
)
def streaming_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click, attributed if
    a purchase follows within the hour, null-extended otherwise. Unlike
    the inner variant, the null-extended rows CANNOT emit eagerly — only
    when the watermark proves no matching purchase can still arrive does
    the buffered click flush with nulls. That makes the oracle encode
    Spark's actual state-eviction rule, which this fixture pins down
    empirically: the join watermark is min(max event time per SIDE) − the
    1 h delay (each side tracks its own), and an unmatched click emits
    iff click_ts + 1 h (its join-window end) < that watermark. Clicks
    younger than the cutoff are correctly WITHHELD at stream end — on an
    unbounded stream they'd flush as purchases advance the watermark.
    Replay-deterministic (verified identical across runs), hence a full
    oracle; this plus the inner variant covers both legs Spark supports
    at scale (full outer is the same machinery on both sides)."""
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c_user = user_id AND p_ts >= c_ts AND p_ts <= c_ts + interval 1 hour"
        ),
        "leftOuter",
    )
    out = _run_to_memory(joined, "append", sf_dir)
    return out.select(
        F.col("c_user").alias("user_id"), "click_id", "purchase_id"
    )


@query(
    "streaming_range_join_windows",
    oracle="""
    WITH wins AS (
        SELECT event_id AS win_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS lo,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) + 3600 AS hi
        FROM events WHERE event_id % 500 = 0
    )
    SELECT win_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_value_cents
    FROM wins JOIN events e
      ON CAST(floor(epoch(CAST(e.ts AS TIMESTAMP))) AS BIGINT)
         BETWEEN wins.lo AND wins.hi
    GROUP BY win_id
    """,
)
def streaming_range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static INTERVAL join — no equi key: every streamed event
    lands in whichever 1-hour observation windows (static side, seeded
    from every 500th event) contain its timestamp. Stream-static inner
    joins are stateless per micro-batch, but the join condition has no
    equality, so vanilla Spark would nested-loop every micro-batch
    against the window table; routing through ``binned_range_join``
    (W = the window width) makes each micro-batch an ordinary equi join
    on hour bins — the same rewrite the batch surface and the Scala
    BinRangeJoin rule apply, proven here under Structured Streaming.

    Epoch seconds via FLOOR on both engines (unix_timestamp truncates;
    DuckDB's epoch() keeps the microsecond fraction — a bare BIGINT cast
    would ROUND and shift boundary events by one second). Only the final
    per-window aggregate keeps state: O(#windows) rows, complete mode.
    At 100 TB the window table is the model-sized side (broadcast), the
    stream never accumulates join state, and cents sums stay exact in
    any accumulation order."""
    from presto_truffle_spark.plans.rewrites import binned_range_join
    from presto_truffle_spark.tztime import epoch_s

    wins = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 500 == 0)
        .select(
            F.col("event_id").alias("win_id"),
            epoch_s(F.col("ts")).alias("lo"),
        )
        .withColumn("hi", F.col("lo") + 3600)
    )
    pts = _events_stream(spark, sf_dir).select(
        F.unix_timestamp("ts").alias("p"), "value"
    )
    joined = binned_range_join(pts, wins, "p", "lo", "hi", 3600.0)
    agg = joined.groupBy("win_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)))
        .cast("long")
        .alias("total_value_cents"),
    )
    return _run_to_memory(agg, "complete", sf_dir)


@query(
    "streaming_semantic_dedup",
    oracle="""
    WITH planes AS (
        SELECT vec_id AS p_id, embedding::DOUBLE[] AS pe FROM embeddings
        WHERE vec_id BETWEEN 1 AND 8
    ), buckets AS (
        SELECT e.vec_id, e.embedding::DOUBLE[] AS ev,
               CAST(sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.pe) > 0
                             THEN power(2, p.p_id - 1) ELSE 0 END) AS BIGINT) AS bucket
        FROM embeddings e CROSS JOIN planes p
        GROUP BY e.vec_id, e.embedding
    ), hits AS (
        SELECT b.vec_id,
               round(list_dot_product(a.ev, b.ev) /
                     (sqrt(list_dot_product(a.ev, a.ev)) *
                      sqrt(list_dot_product(b.ev, b.ev))), 6) AS cos
        FROM buckets a JOIN buckets b
          ON a.bucket = b.bucket
         AND b.vec_id % 5 = 0 AND a.vec_id % 5 <> 0
        WHERE list_dot_product(a.ev, b.ev) /
              (sqrt(list_dot_product(a.ev, a.ev)) *
               sqrt(list_dot_product(b.ev, b.ev))) >= 0.4
    )
    SELECT vec_id,
           CAST(count(*) AS BIGINT) AS n_dup_sources,
           max(cos) AS max_cos
    FROM hits
    GROUP BY vec_id
    """,
)
def streaming_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE semantic dedup: the incoming-embedding STREAM (every 5th
    vec_id, a file-source stream over the embeddings fixture) is checked
    against the STATIC corpus LSH index as it arrives — the streaming
    face of ``dedup_incremental_semantic`` (which is the same decision
    batch-shaped; this oracle is its stream-visible half, corpus-vs-
    batch only, since earlier stream members are not joinable without a
    stream-stream self-join). Per incoming vector the state is one
    (count, max-cos) row — O(|stream|), no watermark needed because the
    static side never late-arrives.

    Scale shape: the corpus bucket index is computed from the static
    table per micro-batch at fixture scale, and is exactly the
    PRE-MATERIALIZED index table (`ann_ivfpq_index_build` discipline) a
    production topology reads instead; the stream side joins it on
    `bucket` — only bucket-mates are ever cosine-verified. Complete-mode
    aggregation keyed by vec_id makes the final memory-sink state equal
    the batch answer, hence the full DuckDB oracle."""
    from presto_truffle_spark.operators.similarity import _dot, ann_lsh_buckets

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ev")
    )
    corpus = (
        ann_lsh_buckets(spark, sf_dir)
        .join(e, "vec_id")
        .filter(F.col("vec_id") % 5 != 0)
        .withColumn("nrm", F.sqrt(_dot(F.col("ev"), F.col("ev"))))
        .select(
            F.col("vec_id").alias("src"), "bucket",
            F.col("ev").alias("ev_a"), F.col("nrm").alias("nrm_a"),
        )
    )
    raw_schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    incoming = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .load(f"{sf_dir}/embeddings.parq*")
        .filter(F.col("vec_id") % 5 == 0)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("ev_b"))
        .withColumn("nrm_b", F.sqrt(_dot(F.col("ev_b"), F.col("ev_b"))))
    )
    # Stream-side bucket assignment must be STATELESS (a per-row fold
    # over the 8 planes, not a groupBy): an explode+sum here would be a
    # second stateful aggregation and Spark's global-watermark
    # correctness check rightly rejects chained unwatermarked stateful
    # ops. The planes collapse into ONE static row (order-independent
    # sum), broadcast-crossed into the stream.
    planes_row = (
        e.filter(F.col("vec_id").between(1, 8))
        .select(F.struct(F.col("vec_id").alias("p_id"), F.col("ev").alias("pe")).alias("p"))
        .agg(F.collect_list("p").alias("ps"))
    )
    bucket = F.aggregate(
        "ps",
        F.lit(0.0),
        lambda acc, p: acc
        + F.when(
            _dot(F.col("ev_b"), p["pe"]) > 0,
            F.pow(F.lit(2.0), p["p_id"] - 1),
        ).otherwise(0.0),
    ).cast("long")
    inc_bucketed = (
        incoming.crossJoin(F.broadcast(planes_row))
        .withColumn("bucket", bucket)
        .select("vec_id", "ev_b", "nrm_b", "bucket")
    )
    sim = _dot(F.col("ev_a"), F.col("ev_b")) / (F.col("nrm_a") * F.col("nrm_b"))
    hits = (
        inc_bucketed.join(corpus, "bucket")
        .filter(sim >= 0.4)
        .select("vec_id", F.round(sim, 6).alias("cos"))
    )
    agg = hits.groupBy("vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_sources"),
        F.max("cos").alias("max_cos"),
    )
    return _run_to_memory(agg, "complete", sf_dir)


@query(
    "streaming_semantic_dedup_indexed",
    oracle="""
    WITH planes AS (
        SELECT vec_id AS p_id, embedding::DOUBLE[] AS pe FROM embeddings
        WHERE vec_id BETWEEN 1 AND 8
    ), buckets AS (
        SELECT e.vec_id, e.embedding::DOUBLE[] AS ev,
               CAST(sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.pe) > 0
                             THEN power(2, p.p_id - 1) ELSE 0 END) AS BIGINT) AS bucket
        FROM embeddings e CROSS JOIN planes p
        GROUP BY e.vec_id, e.embedding
    ), hits AS (
        SELECT b.vec_id,
               round(list_dot_product(a.ev, b.ev) /
                     (sqrt(list_dot_product(a.ev, a.ev)) *
                      sqrt(list_dot_product(b.ev, b.ev))), 6) AS cos
        FROM buckets a JOIN buckets b
          ON a.bucket = b.bucket
         AND b.vec_id % 5 = 0 AND a.vec_id % 5 <> 0
        WHERE list_dot_product(a.ev, b.ev) /
              (sqrt(list_dot_product(a.ev, a.ev)) *
               sqrt(list_dot_product(b.ev, b.ev))) >= 0.4
    )
    SELECT vec_id,
           CAST(count(*) AS BIGINT) AS n_dup_sources,
           max(cos) AS max_cos
    FROM hits
    GROUP BY vec_id
    """,
)
def streaming_semantic_dedup_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``streaming_semantic_dedup`` against a MATERIALIZED index — the
    production topology made explicit: the corpus bucket index (bucket,
    src, vector, norm) is BUILT once as a batch write to parquet (the
    ``ann_ivfpq_index_build`` build/query discipline applied to the
    dedup index), and the stream's micro-batches join the index FILES —
    the static side costs an index read per micro-batch instead of
    recomputing plane dot products over the whole corpus. Same oracle
    as the recompute variant by construction: materialization changes
    WHERE the index lives, never what it contains. At 100 TB the index
    table is bucketed-by-`bucket` parquet maintained incrementally by
    `dedup_incremental_semantic`-style batch runs, and this query is
    the serving path."""
    import os as _os

    from presto_truffle_spark.operators.similarity import _dot, ann_lsh_buckets
    from presto_truffle_spark.sources.io import _scoped_scratch

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ev")
    )
    # ----- BUILD: corpus bucket index written once -----
    index_path = _scoped_scratch(
        spark, f"sem_dedup_index_{_os.path.basename(sf_dir)}"
    )
    (
        ann_lsh_buckets(spark, sf_dir)
        .join(e, "vec_id")
        .filter(F.col("vec_id") % 5 != 0)
        .withColumn("nrm", F.sqrt(_dot(F.col("ev"), F.col("ev"))))
        .select(
            F.col("vec_id").alias("src"), "bucket",
            F.col("ev").alias("ev_a"), F.col("nrm").alias("nrm_a"),
        )
        .write.mode("overwrite")
        .parquet(index_path)
    )
    corpus_index = spark.read.parquet(index_path)
    # ----- SERVE: the stream probes the index files -----
    raw_schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    incoming = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .load(f"{sf_dir}/embeddings.parq*")
        .filter(F.col("vec_id") % 5 == 0)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("ev_b"))
        .withColumn("nrm_b", F.sqrt(_dot(F.col("ev_b"), F.col("ev_b"))))
    )
    planes_row = (
        e.filter(F.col("vec_id").between(1, 8))
        .select(F.struct(F.col("vec_id").alias("p_id"), F.col("ev").alias("pe")).alias("p"))
        .agg(F.collect_list("p").alias("ps"))
    )
    bucket = F.aggregate(
        "ps",
        F.lit(0.0),
        lambda acc, p: acc
        + F.when(
            _dot(F.col("ev_b"), p["pe"]) > 0,
            F.pow(F.lit(2.0), p["p_id"] - 1),
        ).otherwise(0.0),
    ).cast("long")
    inc_bucketed = (
        incoming.crossJoin(F.broadcast(planes_row))
        .withColumn("bucket", bucket)
        .select("vec_id", "ev_b", "nrm_b", "bucket")
    )
    sim = _dot(F.col("ev_a"), F.col("ev_b")) / (F.col("nrm_a") * F.col("nrm_b"))
    hits = (
        inc_bucketed.join(corpus_index, "bucket")
        .filter(sim >= 0.4)
        .select("vec_id", F.round(sim, 6).alias("cos"))
    )
    agg = hits.groupBy("vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_sources"),
        F.max("cos").alias("max_cos"),
    )
    return _run_to_memory(agg, "complete", sf_dir)


_SDECAY_ANCHOR = "2024-01-31 00:00:00"  # fixed anchor just past the fixture
_SDECAY_HALF_LIFE_S = 604800.0  # one week (the events_decayed_counts lesson)


@query(
    "streaming_decayed_counts",
    oracle=f"""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           floor(sum(power(0.5,
                   date_diff('second', date_trunc('second', ts),
                             TIMESTAMP '{_SDECAY_ANCHOR}')
                   / {_SDECAY_HALF_LIFE_S})) * 1000000 + 0.5) / 1000000
               AS decayed_weight
    FROM events
    GROUP BY user_id
    """,
)
def streaming_decayed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of `events_decayed_counts`: per-user half-life-
    weighted activity as a GENUINE readStream aggregation. The decay
    anchor is a FIXED literal timestamp (just past the fixture) instead
    of max(ts) — an aggregate-dependent anchor is not expressible inside
    a single streaming aggregation, and a fixed anchor is also the
    production shape (the serving layer rescales by
    0.5^(shift/half-life) when it moves the anchor — the same mergeable
    rescale-and-add identity, applied at read time). The per-event decay
    is a map-side expression, so the streaming plan is an ordinary
    stateful groupBy aggregation in complete mode → result ≡ batch →
    full DuckDB oracle. Whole-second truncation on the event side only
    (the anchor is already whole-second) — the fractional-second
    timestamp-diff divergence pinned in FIXTURES.md."""
    e = _events_stream(spark, sf_dir)
    age_s = F.expr(
        f"timestampdiff(SECOND, date_trunc('second', ts), "
        f"to_timestamp('{_SDECAY_ANCHOR}'))"
    )
    decay = F.pow(F.lit(0.5), age_s / F.lit(_SDECAY_HALF_LIFE_S))
    agg = (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (
                F.floor(F.sum(decay) * 1_000_000 + F.lit(0.5)) / 1_000_000
            ).alias("decayed_weight"),
        )
    )
    return _run_to_memory(agg, "complete", sf_dir)


@query(
    "streaming_seasonal_anomaly",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(ts AS DATE) AS event_date,
               CAST(extract(hour FROM CAST(ts AS TIMESTAMP)) AS INTEGER)
                 AS hour_of_day,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY 1, 2, 3
    ), base AS (
        SELECT event_type, hour_of_day,
               sum(n_events) AS sx,
               sum(n_events * n_events) AS sxx,
               count(*) AS nd
        FROM daily
        GROUP BY 1, 2
    )
    SELECT d.event_type, d.event_date, d.hour_of_day, d.n_events,
           round((d.n_events - b.sx * 1.0 / b.nd)
                 / sqrt(nullif(b.sxx * 1.0 / b.nd
                               - (b.sx * 1.0 / b.nd) * (b.sx * 1.0 / b.nd),
                               0.0)),
                 4) AS zscore
    FROM daily d JOIN base b
      ON d.event_type = b.event_type AND d.hour_of_day = b.hour_of_day
    WHERE abs((d.n_events - b.sx * 1.0 / b.nd)
              / sqrt(nullif(b.sxx * 1.0 / b.nd
                            - (b.sx * 1.0 / b.nd) * (b.sx * 1.0 / b.nd),
                            0.0))) > 2.5
    """,
)
def streaming_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_seasonal_anomaly — live alerting
    against a PRECOMPUTED baseline: the per-(type, hour) power-sum
    baseline is built in batch (exactly what a production job
    materializes nightly), broadcast onto the event stream as a
    stateless enrich BEFORE the streaming aggregation — the ordering
    that keeps the query to ONE stateful operator (join-after-
    streaming-aggregation is the restricted shape; enrich-then-
    aggregate is the supported one, and the baseline columns ride
    through the groupBy as any_value). Complete mode over the replay
    makes the result identical to the batch query, hence the full
    oracle — including the nullif zero-variance guard and the
    unrounded-z threshold (same IEEE op tree).

    In production the stream side is append-mode per closed hourly
    window; the state is O(open cells). Extraction uses hour()/date on
    the UTC-pinned stream timestamp (value-preserving — the
    _events_stream convention)."""
    ev = _events_stream(spark, sf_dir)
    batch = load_table(spark, sf_dir, "events")
    daily_b = (
        batch.select(
            "event_type",
            F.col("ts").cast("date").alias("event_date"),
            F.hour("ts").alias("hour_of_day"),
        )
        .groupBy("event_type", "event_date", "hour_of_day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    base = daily_b.groupBy("event_type", "hour_of_day").agg(
        F.sum("n_events").alias("sx"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("sxx"),
        F.count(F.lit(1)).alias("nd"),
    )
    enriched = ev.select(
        "event_type",
        F.col("ts").cast("date").alias("event_date"),
        F.hour("ts").alias("hour_of_day"),
    ).join(F.broadcast(base), ["event_type", "hour_of_day"])
    agg = enriched.groupBy(
        "event_type", "event_date", "hour_of_day"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.any_value("sx").alias("sx"),
        F.any_value("sxx").alias("sxx"),
        F.any_value("nd").alias("nd"),
    )
    mean = F.col("sx") * 1.0 / F.col("nd")
    z = (F.col("n_events") - mean) / F.sqrt(
        F.nullif(F.col("sxx") * 1.0 / F.col("nd") - mean * mean, F.lit(0.0))
    )
    out = agg.filter(F.abs(z) > 2.5).select(
        "event_type",
        "event_date",
        "hour_of_day",
        "n_events",
        F.round(z, 4).alias("zscore"),
    )
    return _run_to_memory(out, "complete", sf_dir)


@query(
    "streaming_gdpr_erasure_filter",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM events
    WHERE user_id NOT IN (
        SELECT c_custkey FROM customer WHERE c_custkey % 10 = 3
    )
    GROUP BY event_type
    """,
)
def streaming_gdpr_erasure_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Right-to-be-forgotten applied to a LIVE stream: a static erasure
    list (customers with custkey%10=3 — the deletion-request register)
    is LEFT ANTI stream-static joined against the event stream, so
    erased users' events never reach any downstream aggregate — the
    streaming twin of lakehouse_deletion_vectors' merge-on-read, and
    the shape a GDPR/CCPA pipeline actually deploys (erasure must bind
    at READ time; re-materializing history per request doesn't keep up).
    Stream-static LEFT ANTI needs no watermark and no join state: the
    static side is re-read per micro-batch, so a NEW erasure request is
    honored from the next batch on — exactly the compliance semantics
    wanted. The static list routes through broadcast_if_dim (fixture:
    broadcast hash anti; 100 TB: shuffled anti against micro-batches).

    Only the final per-event-type aggregate keeps state (O(event
    types)). Counts and cent sums are exact integers; the oracle is the
    equivalent batch NOT IN."""
    erased = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 10 == 3)
        .select(F.col("c_custkey").alias("erased_user"))
    )
    ev = _events_stream(spark, sf_dir)
    kept = ev.join(
        broadcast_if_dim(erased, "customer"),
        ev.user_id == F.col("erased_user"),
        "left_anti",
    )
    agg = kept.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("total_cents"),
    )
    out = _run_to_memory(agg, "complete", sf_dir)
    # Exact n_users needs COUNT(DISTINCT) which streaming aggregation
    # cannot maintain incrementally; compute it from the same anti-join
    # applied as a batch (identical plan sans the stream source).
    ev_b = load_table(spark, sf_dir, "events")
    kept_b = ev_b.join(
        broadcast_if_dim(erased, "customer"),
        ev_b.user_id == F.col("erased_user"),
        "left_anti",
    )
    users = kept_b.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    return out.join(users, "event_type").select(
        "event_type", "n_events", "n_users", "total_cents"
    )


_PYSTREAM_BATCHES = 4
_PYSTREAM_ROWS = 50  # rows per micro-batch


@query(
    "source_python_stream_datasource",
    oracle=f"""
    WITH g AS (
        SELECT unnest(generate_series(0,
                      {_PYSTREAM_BATCHES * _PYSTREAM_ROWS - 1})) AS id
    )
    SELECT CAST(id % 7 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(id % 50 + 1) AS BIGINT) AS total_qty,
           CAST(sum((id * 97) % 1000000) AS BIGINT) AS total_cents
    FROM g GROUP BY 1
    """,
)
def source_python_stream_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python STREAMING data source (Spark 4
    ``SimpleDataSourceStreamReader``) — the streaming twin of
    ``source_python_datasource``: offset-tracked micro-batches from a
    Python reader registered as a first-class ``readStream.format()``.
    The reader's contract is exercised for real: ``initialOffset`` →
    repeated ``read(start) -> (rows, nextOffset)`` until the source
    reports no progress, plus ``readBetweenOffsets`` for replay — and
    the driver-side offset dict is the checkpointable state. Four
    50-row deterministic batches (same arithmetic rows as the batch
    twin) aggregate in complete mode, so the final memory-sink state
    equals the batch answer and the oracle is a pure generate_series
    rebuild.

    Probed during design: ``Trigger.AvailableNow`` consumes only ONE
    simple-reader increment (the availableNow snapshot is taken from a
    single read() advance), so the query runs with a processing-time
    trigger and ``processAllAvailable()`` — which drains all four
    batches (probed: per-bucket counts 4x the one-batch run).

    Classes are nested so cloudpickle ships them by value (executors
    must not need this repo importable — the UDF-specimen rule)."""
    del sf_dir  # synthetic source; signature kept uniform
    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    n_batches, n_rows = _PYSTREAM_BATCHES, _PYSTREAM_ROWS

    class GenStreamReader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"batch": 0}

        def read(self, start):
            b = start["batch"]
            if b >= n_batches:
                return iter([]), start
            rows = [
                (i, i % 50 + 1, (i * 97) % 1000000)
                for i in range(b * n_rows, (b + 1) * n_rows)
            ]
            return iter(rows), {"batch": b + 1}

        def readBetweenOffsets(self, start, end):
            return iter(
                [
                    (i, i % 50 + 1, (i * 97) % 1000000)
                    for i in range(
                        start["batch"] * n_rows, end["batch"] * n_rows
                    )
                ]
            )

    class GenStreamSource(DataSource):
        @classmethod
        def name(cls):
            return "tpch_pystream"

        def schema(self):
            return "id bigint, qty bigint, cents bigint"

        def simpleStreamReader(self, schema):
            return GenStreamReader()

    spark.dataSource.register(GenStreamSource)
    sdf = spark.readStream.format("tpch_pystream").load()
    agg = sdf.groupBy((F.col("id") % 7).cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("qty").cast("long").alias("total_qty"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    name = "s" + uuid.uuid4().hex[:12]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(stream_shuffle_partitions(None, python_stateful=True))
    )
    ckpt = checkpoint_dir()
    try:
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        drop_checkpoint(ckpt)
    return spark.table(name)


@query(
    "streaming_python_sink",
    oracle=f"""
    WITH g AS (
        SELECT unnest(generate_series(0,
                      {_PYSTREAM_BATCHES * _PYSTREAM_ROWS - 1})) AS id
    )
    SELECT CAST(id % 5 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(id % 50 + 1) AS BIGINT) AS total_qty
    FROM g GROUP BY 1
    """,
)
def streaming_python_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python STREAMING sink (Spark 4 ``DataSourceStreamWriter``)
    — the final cell of the Python DataSource matrix (batch reader r9,
    streaming reader r10, batch writer r11, and now the streaming
    writer): per-micro-batch, per-partition ``write(iterator)`` runs on
    the executors emitting one JSONL file named (batchId, partition),
    returns a WriterCommitMessage, and the driver-side
    ``commit(messages, batchId)`` appends a line to a commit LOG only
    after the batch's tasks all reported — exactly-once bookkeeping a
    real external sink builds on (the ``abort`` hook completes the
    contract). Source side reuses the r10 streaming reader's
    deterministic arithmetic batches, so the files the sink wrote can
    be read back as a batch DataFrame and aggregated; the oracle is a
    pure generate_series rebuild — any dropped/duplicated micro-batch
    or partition forks the hash. The read-back also FILTERS to batch
    ids present in the commit log (the sink's own read-your-committed
    protocol).

    Scale shape: the sink protocol is per-partition/per-batch constant
    state; file count = batches × partitions (the compaction family
    handles the small-file aftermath at scale)."""
    del sf_dir  # synthetic source; signature kept uniform
    import json as _json

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamWriter,
        SimpleDataSourceStreamReader,
        WriterCommitMessage,
    )

    n_batches, n_rows = _PYSTREAM_BATCHES, _PYSTREAM_ROWS

    class GenStreamReader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"batch": 0}

        def read(self, start):
            b = start["batch"]
            if b >= n_batches:
                return iter([]), start
            rows = [
                (i, i % 50 + 1) for i in range(b * n_rows, (b + 1) * n_rows)
            ]
            return iter(rows), {"batch": b + 1}

        def readBetweenOffsets(self, start, end):
            return iter(
                [
                    (i, i % 50 + 1)
                    for i in range(
                        start["batch"] * n_rows, end["batch"] * n_rows
                    )
                ]
            )

    class JsonlCommit(WriterCommitMessage):
        def __init__(self, path: str, rows: int):
            self.path = path
            self.rows = rows

    class JsonlStreamWriter(DataSourceStreamWriter):
        def __init__(self, path: str):
            self.path = path

        def write(self, iterator):
            import os as _os

            from pyspark import TaskContext

            ctx = TaskContext.get()
            pid = ctx.partitionId()
            _os.makedirs(self.path, exist_ok=True)
            # batchId is not exposed to the task; a unique task file +
            # driver-side commit log keeps the accounting exact.
            out = f"{self.path}/task-{ctx.taskAttemptId()}-{pid:04d}.jsonl"
            n = 0
            with open(out, "w") as fh:
                for row in iterator:
                    fh.write(
                        _json.dumps({"id": row[0], "qty": row[1]}) + "\n"
                    )
                    n += 1
            return JsonlCommit(out, n)

        def commit(self, messages, batchId):
            import os as _os

            _os.makedirs(self.path, exist_ok=True)
            with open(f"{self.path}/_commits.log", "a") as fh:
                fh.write(
                    _json.dumps(
                        {
                            "batch": batchId,
                            "files": sorted(m.path for m in messages),
                            "rows": sum(m.rows for m in messages),
                        }
                    )
                    + "\n"
                )

        def abort(self, messages, batchId):
            pass  # scratch dir is app-scoped; nothing durable to undo

    class JsonlStreamSink(DataSource):
        @classmethod
        def name(cls):
            return "pystream_jsonl_sink"

        def schema(self):
            return "id bigint, qty bigint"

        def simpleStreamReader(self, schema):
            return GenStreamReader()

        def streamWriter(self, schema, overwrite):
            return JsonlStreamWriter(self.options["path"])

    spark.dataSource.register(JsonlStreamSink)
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"pystream_sink_{spark.sparkContext.applicationId}_{uuid.uuid4().hex[:8]}",
    )
    sdf = spark.readStream.format("pystream_jsonl_sink").load()
    ckpt = checkpoint_dir()
    try:
        q = (
            sdf.writeStream.format("pystream_jsonl_sink")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()
    finally:
        drop_checkpoint(ckpt)
    committed = set()
    log_path = os.path.join(out_dir, "_commits.log")
    if os.path.exists(log_path):
        with open(log_path) as fh:
            for line in fh:
                committed.update(_json.loads(line)["files"])
    back = spark.read.schema("id bigint, qty bigint").json(
        [p for p in sorted(committed)] or [out_dir]
    )
    return back.groupBy((F.col("id") % 5).cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("qty").cast("long").alias("total_qty"),
    )
