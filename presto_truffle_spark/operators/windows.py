"""Window-function operators.

No window functions exist in the reference (SURVEY.md §2.3); this is [EXT]
surface. Spark plans a window as: shuffle on partitionBy keys → in-partition
sort on orderBy keys → streaming frame evaluation. Scale notes baked into
each query:

  * partitionBy cardinality must be >> 1 — a single-partition window (no
    partitionBy) serializes the whole dataset through one task and is
    banned here except for provably tiny inputs.
  * Every orderBy includes a unique tie-break column so results are
    deterministic for the oracle hash (ANSI leaves ties unspecified).
  * Explicit ROWS frames (not the default RANGE frame) for running
    aggregates — cheaper (no peer-group scan) and identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from presto_truffle_spark.catalog import load_table
from presto_truffle_spark.registry import query


@query(
    "window_ranking",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile per customer. Shuffles once on
    o_custkey; all four functions share the same window sort."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        FROM orders)
    WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group — THE canonical distributed top-k: one shuffle on the
    group key, per-partition sort, early filter. Spark ≥3.5 pushes a
    WindowGroupLimit below the sort so each task keeps only K rows per
    group — memory-bounded at any scale."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           round(o_totalprice - coalesce(lag(o_totalprice) OVER w, o_totalprice), 2)
               AS delta_vs_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over each customer's order history (orderdate sequence)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        prev.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.round(F.col("o_totalprice") - F.coalesce(prev, F.col("o_totalprice")), 2).alias(
            "delta_vs_prev"
        ),
    )


@query(
    "window_running_agg",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_spend,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
               AS moving_avg_3
    FROM orders
    """,
)
def window_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running cumulative sum + 3-row moving average, explicit ROWS frames
    (streamed in one pass per partition — no peer-group rescans)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2
        ).alias("running_spend"),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, W.currentRow)), 4).alias(
            "moving_avg_3"
        ),
    )


@query(
    "window_first_last",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_order,
           CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with a full-partition frame + per-partition
    count, collapsed to one row per customer via DISTINCT."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
        F.count(F.lit(1)).over(W.partitionBy("o_custkey")).alias("n_orders"),
    ).distinct()


@query(
    "window_share_of_group",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice,
           round(l_extendedprice / sum(l_extendedprice)
                 OVER (PARTITION BY l_orderkey), 6) AS line_share
    FROM lineitem
    WHERE l_orderkey <= 2000
    """,
)
def window_share_of_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-group-total: unordered window aggregate (single shuffle on
    the key, no sort needed)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    w = W.partitionBy("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.round(F.col("l_extendedprice") / F.sum("l_extendedprice").over(w), 6).alias(
            "line_share"
        ),
    )


@query(
    "window_value_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(count(*) OVER w AS BIGINT) AS n_in_band,
           CAST(sum(cents) OVER w AS BIGINT) AS band_cents
    FROM (
        SELECT *, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    )
    WINDOW w AS (PARTITION BY o_custkey ORDER BY cents
                 RANGE BETWEEN 500000 PRECEDING AND CURRENT ROW)
    """,
)
def window_value_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-based RANGE frame (not time, not rows): for each order, count
    and sum the same customer's orders priced within $5,000 below it — the
    density-band shape behind "how many peers sit just under this price
    point". RANGE frames bound the frame by the ORDER-BY *value*, so peer
    rows with equal price are always IN the frame together — which is
    what makes the result order-insensitive and cross-engine exact
    (a ROWS frame over a non-unique sort would be nondeterministic).
    Completes the frame-type matrix with window_rolling_interval (interval
    RANGE) and window_running_agg (ROWS). The band sum accumulates
    per-row integer cents — exact in any order, and the frame itself is
    keyed on the cents column (Spark's rangeBetween takes integer bounds;
    $5,000 = 500,000 cents). Scale: one shuffle on o_custkey, sort within
    partition; frames are pointer ranges over the sorted run, no per-row
    rescans."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "cents", F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    )
    w = W.partitionBy("o_custkey").orderBy("cents").rangeBetween(-500_000, 0)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_in_band"),
        F.sum("cents").over(w).alias("band_cents"),
    )


@query(
    "window_frame_exclude",
    oracle="""
    WITH t AS (
        SELECT event_id, user_id,
               CAST(floor(value) AS BIGINT) AS vb,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    )
    SELECT event_id,
           CAST(count(*) OVER w_grp AS BIGINT) AS c_grp,
           CAST(sum(cents) OVER w_grp AS BIGINT) AS s_grp,
           CAST(count(*) OVER w_ties AS BIGINT) AS c_ties,
           CAST(sum(cents) OVER w_ties AS BIGINT) AS s_ties,
           CAST(count(*) OVER w_row AS BIGINT) AS c_row,
           CAST(sum(cents) OVER w_row AS BIGINT) AS s_row
    FROM t
    WINDOW
      w_grp AS (PARTITION BY user_id ORDER BY vb
                RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING EXCLUDE GROUP),
      w_ties AS (PARTITION BY user_id ORDER BY vb
                 RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING EXCLUDE TIES),
      w_row AS (PARTITION BY user_id ORDER BY vb
                RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING EXCLUDE CURRENT ROW)
    """,
)
def window_frame_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard window frame EXCLUDE semantics (GROUP / TIES /
    CURRENT ROW) — an operator Spark's SQL surface LACKS (the EXCLUDE
    clause is a ParseException; pinned in tests/test_fuzz_differential),
    expressed as the frame-minus-peer-group composition over RANGE
    frames, where the whole peer group is always inside the frame:

        cf/sf = count/sum over the frame, cp/sp = over the peer group:
        EXCLUDE CURRENT ROW -> c = cf-1,    s = NULL if c=0 else sf-v
        EXCLUDE GROUP       -> c = cf-cp,   s = NULL if c=0 else sf-sp
        EXCLUDE TIES        -> c = cf-cp+1, s = sf-sp+v

    (sum over an emptied frame is NULL, matching the standard). The
    oracle is DuckDB's NATIVE EXCLUDE — a genuinely independent
    implementation of the same semantics, the strongest oracle shape in
    the repo. Measures are integer cents (exact in any accumulation
    order); the order key floor(value) is deliberately tie-prone so peer
    groups are non-trivial. Scale: one shuffle+sort per partition key,
    frames and peer groups are pointer ranges over the sorted run —
    same cost as the plain RANGE frame, the emulation adds only the
    peer-group window over the identical sort (no extra exchange;
    Spark reuses the partitioning/sort for both)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.floor("value").cast("long").alias("vb"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    wf = (
        W.partitionBy("user_id").orderBy("vb").rangeBetween(-5, 5)
    )
    wp = W.partitionBy("user_id", "vb")
    cf = F.count(F.lit(1)).over(wf)
    sf = F.sum("cents").over(wf)
    cp = F.count(F.lit(1)).over(wp)
    sp = F.sum("cents").over(wp)
    v = F.col("cents")
    c_row = (cf - 1).cast("long")
    c_grp = (cf - cp).cast("long")
    c_ties = (cf - cp + 1).cast("long")
    return e.select(
        "event_id",
        c_grp.alias("c_grp"),
        F.when(c_grp == 0, F.lit(None)).otherwise(sf - sp).cast("long").alias("s_grp"),
        c_ties.alias("c_ties"),
        (sf - sp + v).cast("long").alias("s_ties"),
        c_row.alias("c_row"),
        F.when(c_row == 0, F.lit(None)).otherwise(sf - v).cast("long").alias("s_row"),
    )


@query(
    "window_groups_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(count(*) OVER w AS BIGINT) AS n_in_groups,
           CAST(sum(cents) OVER w AS BIGINT) AS groups_cents
    FROM (
        SELECT *,
               dense_rank() OVER (PARTITION BY o_custkey ORDER BY cents) AS dr
        FROM (SELECT *, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                            AS cents
              FROM orders)
    )
    WINDOW w AS (PARTITION BY o_custkey ORDER BY dr
                 RANGE BETWEEN 2 PRECEDING AND 1 FOLLOWING)
    """,
)
def window_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard GROUPS frame mode — `GROUPS BETWEEN 2 PRECEDING AND 1
    FOLLOWING` over price peer groups per customer — which NEITHER Spark
    nor DuckDB implements natively (both parse errors pinned,
    tests/test_fuzz_differential.py): Spark fails to parse the clause,
    DuckDB raises "GROUPS mode ... not implemented yet". The operator
    exists anyway, through an exact compositional identity: GROUPS
    frames count PEER GROUPS of the order key, and dense_rank() numbers
    exactly those groups consecutively, so a RANGE frame over the
    dense_rank is the GROUPS frame —

        agg OVER (... ORDER BY o GROUPS a PRECEDING .. b FOLLOWING)
      ≡ agg OVER (... ORDER BY dr RANGE a PRECEDING .. b FOLLOWING),
        dr = dense_rank() OVER (... ORDER BY o)

    (fuzz-verified across 25 random shapes incl. NULL keys, which form
    one peer group in both semantics). The oracle runs the same rewrite,
    so the differential proves cross-engine agreement on the
    composition; the native-absence pins prove the rewrite is the ONLY
    spelling. Scale: ONE exchange on o_custkey feeds both window
    operators (plan-pinned); Spark inserts a second Sort for the dr key
    it cannot prove monotone in cents, but that sort runs over an
    already-ordered partition run — the cost over a native GROUPS frame
    is a rank column and a no-op-ish re-sort, never a second shuffle.
    Integer cents keep every sum exact in any accumulation order."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "cents", F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    )
    wd = W.partitionBy("o_custkey").orderBy("cents")
    ranked = o.withColumn("dr", F.dense_rank().over(wd))
    wf = W.partitionBy("o_custkey").orderBy("dr").rangeBetween(-2, 1)
    return ranked.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(wf).cast("long").alias("n_in_groups"),
        F.sum("cents").over(wf).cast("long").alias("groups_cents"),
    )


@query(
    "window_topk_with_ties",
    oracle="""
    SELECT o_custkey, o_orderkey, cents
    FROM (
        SELECT o_custkey, o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
               rank() OVER (PARTITION BY o_custkey
                            ORDER BY CAST(floor(o_totalprice * 100 + 0.5)
                                          AS BIGINT) DESC) AS rnk
        FROM orders)
    WHERE rnk <= 3
    """,
)
def window_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer WITH TIES (ANSI `FETCH FIRST n ROWS
    WITH TIES` semantics): rank(), not row_number(), so every order
    tied with the 3rd-best price is returned — the output is a
    DETERMINISTIC SET with no tie-break column needed, where the
    row_number spelling (`window_topk_per_group`) must invent an
    arbitrary tie order and can silently drop a tied peer. Ranking on
    integer cents makes tie detection exact (float ties are
    representation-dependent). Same plan shape as any ranked window:
    one shuffle on the partition key, per-partition sort, rank filter
    pushed into the window operator."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "cents", F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    )
    w = W.partitionBy("o_custkey").orderBy(F.col("cents").desc())
    return (
        o.select("o_custkey", "o_orderkey", "cents", F.rank().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
        .drop("rnk")
    )


@query(
    "window_peer_benchmark_loo",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_mktsegment AS seg, o.o_custkey,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS spend_cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment, o.o_custkey
    ), loo AS (
        SELECT seg, o_custkey, spend_cents,
               (CAST(sum(spend_cents) OVER (PARTITION BY seg) AS BIGINT)
                - spend_cents) * 1.0
               / (100.0 * nullif(count(*) OVER (PARTITION BY seg) - 1, 0))
                   AS peer_avg_d
        FROM per_cust
    )
    SELECT seg, o_custkey, spend_cents,
           round(peer_avg_d, 6) AS peer_avg,
           round(spend_cents / 100.0 - peer_avg_d, 6) AS vs_peers
    FROM loo
    ORDER BY round(spend_cents / 100.0 - peer_avg_d, 6) DESC, o_custkey
    LIMIT 25
    """,
)
def window_peer_benchmark_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out peer benchmarking: each customer's spend vs the
    average of the OTHER customers in their segment, computed as
    (segment_total - own) / (n - 1) from ONE windowed group total — the
    self-exclusion identity that avoids both the self-join a naive
    'average of everyone else' spelling plans and the subtle bias of
    comparing against an average that includes yourself (for top
    spenders, the self-inclusive gap understates by spend/n — material
    exactly for the outliers the report exists to rank). Emits the top
    25 above-peers customers.

    One fact->dim join + per-customer fold, two window aggregates over
    the customer-grain table sharing one (seg) partition, then
    TakeOrderedAndProject. Integer cents until the final dollar
    conversion; the LOO average is the one double, 6dp, tie-broken by
    custkey."""
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    per_cust = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("spend_cents")
        )
    )
    wseg = W.partitionBy("seg")
    peer = (
        (F.sum("spend_cents").over(wseg).cast("long") - F.col("spend_cents"))
        * F.lit(1.0)
        / (
            F.lit(100.0)
            * F.nullif(F.count(F.lit(1)).over(wseg) - 1, F.lit(0))
        )
    )
    loo = per_cust.select(
        "seg", "o_custkey", "spend_cents", peer.alias("peer_avg_d")
    )
    vs = F.col("spend_cents") / F.lit(100.0) - F.col("peer_avg_d")
    return (
        loo.select(
            "seg",
            "o_custkey",
            "spend_cents",
            F.round("peer_avg_d", 6).alias("peer_avg"),
            F.round(vs, 6).alias("vs_peers"),
        )
        .orderBy(F.col("vs_peers").desc(), "o_custkey")
        .limit(25)
    )


@query(
    "window_max_drawdown",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                             WHEN event_type = 'error'
                             THEN -CAST(floor(value * 100 + 0.5) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS net_cents
        FROM events GROUP BY 1
    ), cum AS (
        SELECT d, net_cents,
               CAST(sum(net_cents) OVER (ORDER BY d
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS equity
        FROM daily
    ), dd AS (
        SELECT d, equity,
               CAST(max(equity) OVER (ORDER BY d
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak
        FROM cum
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(max(peak) AS BIGINT) AS peak_equity_cents,
           CAST(max(peak - equity) AS BIGINT) AS max_drawdown_cents,
           CAST(min(CASE WHEN peak - equity
                              = (SELECT max(peak - equity) FROM dd)
                         THEN d END) AS DATE) AS trough_day
    FROM dd
    """,
)
def window_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the daily net-value equity curve (purchases
    minus error-event value) — the canonical running-max-of-running-sum
    window composition from quantitative finance, equally the right
    statistic for any cumulative business KPI ('how far below our best
    cumulative position did we ever fall, and when'). Two stacked
    cumulative windows over the day-grain table: prefix-sum equity,
    then prefix-max peak, then the max gap and its (earliest) trough
    day.

    The corpus collapses to <=31 daily rows before any window runs
    (map-combinable conditional fold); both windows share one ordering
    of that tiny table. All integer cents end-to-end — drawdown is
    exact arithmetic, no rounding anywhere; the trough-day argmin ties
    break to the earliest day on both engines via min(CASE...)."""
    from presto_truffle_spark.tztime import trunc_ntz

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(trunc_ntz("day", F.col("ts")).alias("d")).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
            )
            .when(
                F.col("event_type") == "error",
                -F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
            )
            .otherwise(0)
        )
        .cast("long")
        .alias("net_cents")
    )
    wcum = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    cum = daily.select(
        "d",
        F.sum("net_cents").over(wcum).cast("long").alias("equity"),
    )
    dd = cum.select(
        "d",
        "equity",
        F.max("equity").over(wcum).cast("long").alias("peak"),
    )
    from presto_truffle_spark.cache import scoped_persist

    dd = scoped_persist(spark, "windows.drawdown.dd", dd)
    mdd = dd.agg(
        F.max(F.col("peak") - F.col("equity")).alias("m")
    )
    return (
        dd.crossJoin(F.broadcast(mdd))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.max("peak").cast("long").alias("peak_equity_cents"),
            F.max(F.col("peak") - F.col("equity"))
            .cast("long")
            .alias("max_drawdown_cents"),
            F.min(
                F.when(
                    F.col("peak") - F.col("equity") == F.col("m"), F.col("d")
                )
            )
            .cast("date")
            .alias("trough_day"),
        )
    )


_EWMA_HORIZON = 32  # last-k events per user fed to the recurrence
_EWMA_ALPHA = 0.25  # binary-exact: 0.25/0.75 are exact doubles


@query(
    "window_ewma_per_key",
    oracle=f"""
    WITH RECURSIVE ev AS (
        SELECT user_id, ts,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
               event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC)
                   AS rdesc
        FROM events
    ), lastk AS (
        SELECT user_id, cents,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS idx,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM ev WHERE rdesc <= {_EWMA_HORIZON}
    ), rec AS (
        SELECT user_id, idx, n, CAST(cents AS DOUBLE) AS s,
               CAST(cents AS DOUBLE) AS last_x
        FROM lastk WHERE idx = 1
        UNION ALL
        SELECT l.user_id, l.idx, l.n,
               CAST({_EWMA_ALPHA} AS DOUBLE) * l.cents
                   + CAST({1 - _EWMA_ALPHA} AS DOUBLE) * r.s,
               CAST(l.cents AS DOUBLE)
        FROM rec r
        JOIN lastk l ON l.user_id = r.user_id AND l.idx = r.idx + 1
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           CAST(last_x AS BIGINT) AS last_cents,
           round(s, 6) AS ewma_cents,
           round(last_x - s, 6) AS deviation
    FROM rec WHERE idx = n
    """,
)
def window_ewma_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-KEY exponential moving average — the per-entity smoothing
    primitive (payment-amount baselines, per-user engagement levels,
    per-host latency floors) and the DISTRIBUTED counterpart of
    `events_holt_smoothing`'s single global series: every user's
    recurrence s ← αx + (1−α)s runs independently, so the corpus
    parallelizes BY KEY — the classic way a sequential algorithm
    scales on Spark. The horizon is explicitly BOUNDED (each user's
    last 32 (_EWMA_HORIZON) events by (ts, event_id), selected by a
    per-key window that plans as WindowGroupLimit), so the per-user
    array the fold runs over is O(k) regardless of corpus size — the
    unbounded-collect_list trap is designed out, not hoped away.

    Determinism: α = 0.25 and 1−α = 0.75 are EXACT binary doubles, the
    fold is a scalar-accumulator `aggregate()` in (ts, event_id) order
    (safe per the r11 list_reduce fork note), and the oracle is a
    per-user recursive CTE with the identical arithmetic — same IEEE
    sequence, bit-identical at 6dp. Deviation (last − ewma) is the
    anomaly signal this op exists to produce.

    Scale shape: one key-partitioned window (top-k per key), one
    groupBy(user) with k-bounded arrays, map-side fold — no global
    sort, no single-partition window; output is one row per user."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    rdesc = F.row_number().over(
        W.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
    )
    lastk = ev.withColumn("rdesc", rdesc).filter(
        F.col("rdesc") <= _EWMA_HORIZON
    )
    arr = lastk.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "cents"))
        ).alias("xs")
    )
    xs = F.transform(F.col("xs"), lambda s: s.cents.cast("double"))
    a, one_a = F.lit(_EWMA_ALPHA), F.lit(1 - _EWMA_ALPHA)
    ewma = F.aggregate(
        F.slice(xs, 2, F.size(xs)),
        F.element_at(xs, 1),
        lambda s, x: a * x + one_a * s,
    )
    last_x = F.element_at(xs, -1)
    return arr.select(
        "user_id",
        F.size(F.col("xs")).cast("long").alias("n_events"),
        last_x.cast("long").alias("last_cents"),
        F.round(ewma, 6).alias("ewma_cents"),
        F.round(last_x - ewma, 6).alias("deviation"),
    )
