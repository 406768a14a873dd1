"""Scale ladder: Q6 throughput at 5M/20M/80M in-memory rows.

The fixtures cap at sf0.1 (~600k lineitem rows), where Spark's ~100 ms
scheduling floor dominates any timing. This probe generates
distribution-faithful lineitem at three sizes spanning 16× (the Spark-
scale generator — (seed, row id) hashing, partition-parallel), caches
columnar, and times the Q6 filter+sum kernel. If the engine design
holds, rows/s should be roughly FLAT across the ladder (compute-bound
scan scaling linearly with input) — a superlinear time growth would
expose a hidden materialization or memory cliff well before real
cluster scale.

Usage: python tools/scale_ladder.py   (prints one JSON line; ~2-4 min)
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
    for n in SIZES:
        ref = generate_lineitem_df(spark, n).select(
            "l_shipdate", "l_discount", "l_quantity", "l_extendedprice"
        ).cache()
        q = lambda: ref.filter(  # noqa: E731
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("date"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("rev")
        )
        q().write.format("noop").mode("overwrite").save()  # warm + fill cache
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            q().write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        med = statistics.median(samples)
        out[f"q6_{n // 1_000_000}m_s"] = round(med, 4)
        out[f"q6_{n // 1_000_000}m_mrows_per_s"] = round(n / med / 1e6, 1)
        ref.unpersist()
    sizes_m = [s // 1_000_000 for s in SIZES]
    t_small = out[f"q6_{sizes_m[0]}m_s"]
    t_large = out[f"q6_{sizes_m[-1]}m_s"]
    out["time_ratio_16x_data"] = round(t_large / t_small, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
