"""Dump .explain("formatted") for named registry queries to files.

Usage: python tools/plan_dump.py OUT_DIR SUFFIX [--exec] [query ...]
Writes OUT_DIR/<query>_<SUFFIX>.txt for each query (default: the bench
HEADLINE set). Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1),
the same inputs the bench times, so Exchange counts / join strategies in
the files match what the bench measures.

With ``--exec`` the query is collected first so the dump shows the FINAL
adaptive plan (isFinalPlan=true): AQE-only shapes — ReusedExchange via
the stage cache, runtime join-strategy switches, AQEShuffleRead — never
appear in the pre-execution explain (guide §7.2).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--exec"]
    execute = "--exec" in sys.argv
    out_dir, suffix = args[0], args[1]
    names = args[2:]
    os.makedirs(out_dir, exist_ok=True)

    from presto_truffle_spark.registry import get_queries
    from presto_truffle_spark.session import get_spark

    spark = get_spark("plan_dump")
    queries = get_queries()
    if not names:
        import bench

        names = list(bench.HEADLINE)
    for name in names:
        df = queries[name](spark, SF_DIR)
        if execute:
            df.collect()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
