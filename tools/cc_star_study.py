"""Round-count study for large/small-star connected components.

The r6 verdict flagged ``min_label_propagation`` as the repo's one
scale-weak operator: O(graph-diameter) rounds with a driver-side count
per round. The r7 replacement (``large_small_star_components``,
quality_ops.py) is diameter-independent; this study measures its round
count on the worst case for min-label — a 10k-node chain (diameter
9 999) — plus smaller chains, and checks the labeling is exact.

Expected (and measured 2026-08-14): rounds = ⌈log₂ n⌉ + 1 (the +1 is the
final no-change confirmation round), so a 10k chain needs 15 rounds where
min-label needs 10 000. Numbers are recorded in SCALING.md.

Usage: python tools/cc_star_study.py [n ...]   (default 1024 4096 10000)
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pyspark.sql import SparkSession

    from presto_truffle_spark.operators.quality_ops import (
        large_small_star_components,
    )

    ns = [int(a) for a in sys.argv[1:]] or [1024, 4096, 10_000]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in ns:
        df = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "a long, b long"
        )
        edges = df.selectExpr("a AS src", "b AS dst").unionAll(
            df.selectExpr("b AS src", "a AS dst")
        )
        t0 = time.time()
        labels, rounds = large_small_star_components(
            edges, max_rounds=100, return_rounds=True
        )
        got = {r.doc_id: r.component for r in labels.collect()}
        ok = len(got) == n and set(got.values()) == {0}
        print(
            f"chain n={n:>6} diameter={n - 1:>6}: rounds={rounds:>3} "
            f"(log2+1={math.ceil(math.log2(n)) + 1}) exact={ok} "
            f"wall={time.time() - t0:.1f}s"
        )
        if not ok:
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
