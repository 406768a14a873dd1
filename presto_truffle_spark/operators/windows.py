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
