"""Set operators: union / intersect / except / distinct.

[EXT] surface (reference has none — SURVEY.md §2.3). Spark plans INTERSECT
and EXCEPT as left-semi / left-anti joins over distinct inputs, and
DISTINCT as a hash aggregate — all partial-combine-first, one shuffle each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from presto_truffle_spark.catalog import load_table
from presto_truffle_spark.registry import query


def _buyers(spark, sf_dir) -> DataFrame:
    """custkeys that placed a high-value order."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .select(F.col("o_custkey").alias("custkey"))
    )


def _rich(spark, sf_dir) -> DataFrame:
    """custkeys with a high account balance."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 7000)
        .select(F.col("c_custkey").alias("custkey"))
    )


@query(
    "setop_union_distinct",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
    UNION
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 7000
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): concat is free (no shuffle), the DISTINCT is one
    hash aggregate."""
    return _buyers(spark, sf_dir).union(_rich(spark, sf_dir)).distinct()


@query(
    "setop_union_all_counts",
    oracle="""
    SELECT custkey, count(*) AS appearances FROM (
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
        UNION ALL
        SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 7000
    ) GROUP BY custkey
    """,
)
def setop_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL preserving duplicates, then grouped count."""
    return (
        _buyers(spark, sf_dir)
        .unionAll(_rich(spark, sf_dir))
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("appearances"))
    )


@query(
    "setop_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
    INTERSECT
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 7000
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (planned as distinct + left-semi join)."""
    return _buyers(spark, sf_dir).intersect(_rich(spark, sf_dir))


@query(
    "setop_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 7000
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (planned as distinct + left-anti join)."""
    return _rich(spark, sf_dir).exceptAll(_buyers(spark, sf_dir)).distinct()


@query(
    "setop_distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_shipmode
    FROM (SELECT l_returnflag, l_linestatus,
                 CASE WHEN l_quantity < 25 THEN 'SMALL' ELSE 'BULK' END AS l_shipmode
          FROM lineitem)
    """,
)
def setop_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column DISTINCT (hash aggregate on all columns)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_returnflag",
        "l_linestatus",
        F.when(F.col("l_quantity") < 25, "SMALL").otherwise("BULK").alias("l_shipmode"),
    ).distinct()
