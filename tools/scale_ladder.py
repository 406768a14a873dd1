"""Scale ladder: scan, aggregate, and join kernels at 5M/20M/80M rows.

The fixtures cap at sf0.1 (~600k lineitem rows), where Spark's ~100 ms
scheduling floor dominates any timing. This probe generates
distribution-faithful lineitem at three sizes spanning 16× (the Spark-
scale generator — (seed, row id) hashing, partition-parallel), caches
columnar, and times three kernels that stress different machinery:

  q6    — scan+filter+sum (no shuffle): pure codegen scan throughput;
  q1    — groupBy(2 keys)+6 aggregates (map-side combine → 8-group
          exchange): partial-aggregation efficiency;
  join  — fact-fact equi-join of the lineitem ladder against a
          generated N/4-row orders side + aggregate (two full shuffles):
          the exchange machinery itself.

If the engine design holds, each kernel's time should grow ~linearly in
rows (flat M rows/s) — superlinear growth exposes a hidden
materialization, spill, or memory cliff well before cluster scale.

Usage: python tools/scale_ladder.py   (prints one JSON line; ~4-8 min)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [5_000_000, 20_000_000, 80_000_000]
RUNS = 5


def main() -> int:
    from pyspark.sql import functions as F

    from presto_truffle_spark.session import get_spark
    from presto_truffle_spark.sources.generator import generate_lineitem_df

    spark = get_spark("scale-ladder")
    out = {}

    def timed(label: str, n: int, build):
        build().write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        med = statistics.median(samples)
        out[f"{label}_{n // 1_000_000}m_s"] = round(med, 4)
        out[f"{label}_{n // 1_000_000}m_mrows_per_s"] = round(n / med / 1e6, 1)

    for n in SIZES:
        li = generate_lineitem_df(spark, n).cache()

        def q6():
            return li.filter(
                (F.col("l_shipdate") >= F.lit("1994-01-01").cast("date"))
                & (F.col("l_shipdate") < F.lit("1995-01-01").cast("date"))
                & F.col("l_discount").between(0.05, 0.07)
                & (F.col("l_quantity") < 24)
            ).agg(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("rev")
            )

        def q1():
            return (
                li.withColumn("rf", (F.col("l_quantity") % 3).cast("int"))
                .withColumn(
                    "ls",
                    (F.col("l_extendedprice").cast("long") % 2).cast("int"),
                )
                .groupBy("rf", "ls")
                .agg(
                    F.sum("l_quantity").alias("sq"),
                    F.sum("l_extendedprice").alias("sp"),
                    F.sum(
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).alias("sd"),
                    F.avg("l_quantity").alias("aq"),
                    F.avg("l_discount").alias("ad"),
                    F.count(F.lit(1)).alias("n"),
                )
            )

        # fact-fact join: synthetic orders side with n/4 distinct keys;
        # broadcast disabled so the real exchange machinery runs
        orders = (
            spark.range(n // 4, numPartitions=32)
            .select(
                F.col("id").alias("o_key"),
                (F.abs(F.xxhash64("id")) % 5).alias("o_flag"),
            )
            .cache()
        )
        li_keyed = li.withColumn(
            "lo_key", F.abs(F.xxhash64("l_extendedprice")) % (n // 4)
        )

        def jq():
            return (
                li_keyed.join(orders, F.col("lo_key") == F.col("o_key"))
                .groupBy("o_flag")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("l_extendedprice").alias("sp"),
                )
            )

        # binned range join: N fact points vs 250 one-day intervals with
        # NO equi key (coverage ~10% of the 2500-day ship domain, so
        # matches ≈ 0.1·N). The naive spelling is a nested loop (N×250
        # predicate evals — quadratic-class); through binned_range_join
        # it is an ordinary bin equi-join whose time should stay ~linear
        # in N like every other kernel here.
        from presto_truffle_spark.plans.rewrites import binned_range_join

        ivals = (
            spark.range(250)
            .select(
                (F.abs(F.xxhash64("id")) % 2400).alias("lo"),
            )
            .withColumn("hi", F.col("lo") + 1)
            .cache()
        )
        pts = li.select(
            F.datediff(
                F.col("l_shipdate"), F.lit("1992-01-01").cast("date")
            ).alias("ship_d"),
            "l_quantity",
        )

        def rjoin():
            return binned_range_join(
                pts, ivals, "ship_d", "lo", "hi", 4.0
            ).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("l_quantity").alias("sq"),
            )

        timed("q6", n, q6)
        timed("q1", n, q1)
        timed("rjoin", n, rjoin)
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            timed("join", n, jq)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        li.unpersist()
        orders.unpersist()
        ivals.unpersist()

    sizes_m = [s // 1_000_000 for s in SIZES]
    for label in ("q6", "q1", "rjoin", "join"):
        t_small = out[f"{label}_{sizes_m[0]}m_s"]
        t_large = out[f"{label}_{sizes_m[-1]}m_s"]
        out[f"{label}_time_ratio_16x_data"] = round(t_large / t_small, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
