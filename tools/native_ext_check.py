"""Verify the Scala Catalyst extension end-to-end in its own session.

Run: python tools/native_ext_check.py   (prints NATIVE_EXT_OK on success)

Own-session because `spark.sql.extensions` binds at session creation;
the shared test session (and every driver session) stays vanilla. Checks:

1. rule injection: a Filter spelled `expensive_regex AND cheap_range`
   comes out of the optimizer with the cheap comparison FIRST;
2. semantics: the reordered filter returns exactly the rows the same
   query returns in a vanilla session (golden values inline);
3. non-deterministic guard: a conjunct chain containing rand() is left
   in written order;
4. function injection: `cents(x)` equals the composed
   CAST(floor(x*100+0.5) AS BIGINT) on a value battery including the
   half-cent edge cases.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JAR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native",
    "presto-truffle-ext.jar",
)


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("native-ext-check")
        .config("spark.jars", JAR)
        .config("spark.sql.extensions", "prestotruffle.PrestoTruffleExtensions")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        F.col("id"),
        F.concat(F.lit("row-"), F.col("id")).alias("s"),
        (F.col("id") / 100.0).alias("x"),
    )

    # 1. expensive regex FIRST as written; rule must move id < 10 ahead
    q = df.filter(F.col("s").rlike("row-[0-9]*7$") & (F.col("id") < 100))
    opt = q._jdf.queryExecution().optimizedPlan().toString()
    filter_line = next(l for l in opt.splitlines() if "Filter" in l)
    i_cheap = filter_line.find("< 100")
    i_rlike = filter_line.find("RLIKE")
    assert i_cheap != -1 and i_rlike != -1, f"plan shape changed: {filter_line}"
    assert i_cheap < i_rlike, f"rule did not reorder: {filter_line}"

    # 2. semantics: golden values (ids < 100 ending in 7)
    got = sorted(r.id for r in q.select("id").collect())
    assert got == [7, 17, 27, 37, 47, 57, 67, 77, 87, 97], got

    # 3. non-deterministic conjunct chains are untouched
    q2 = df.filter((F.rand(42) < 2.0) & (F.col("id") < 100))
    opt2 = q2._jdf.queryExecution().optimizedPlan().toString()
    f2 = next(l for l in opt2.splitlines() if "Filter" in l)
    assert f2.find("rand") < f2.find("< 100"), f"nondet chain reordered: {f2}"
    assert q2.count() == 100

    # 4. cents() == composed expression, incl. half-cent edges
    rows = spark.sql(
        "SELECT x, cents(x) AS c,"
        "       CAST(floor(CAST(x AS DOUBLE) * 100 + 0.5) AS BIGINT) AS ref "
        "FROM VALUES (1.005), (2.675), (0.0), (-1.005), (123.456), (19.99)"
        "     AS t(x)"
    ).collect()
    for r in rows:
        assert r.c == r.ref, f"cents({r.x}) = {r.c} != {r.ref}"

    # cents() also runs over a real table scan inside codegen
    n = df.filter(F.expr("cents(x) % 10 = 3")).count()
    assert n > 0

    # 5. vec_dot: the native fused dot-product loop must match the
    # pure-SQL aggregate/zip_with spelling bit-for-bit (both accumulate
    # sequentially in double). Double arrays...
    vdf = spark.range(200).select(
        F.col("id"),
        F.expr("transform(sequence(0, 63), j -> cos(id * j + 0.5))").alias("a"),
        F.expr("transform(sequence(0, 63), j -> sin(id + j * 0.25))").alias("b"),
    )
    cmp = vdf.select(
        F.expr("vec_dot(a, b)").alias("native"),
        F.expr(
            "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
        ).alias("sql"),
    ).collect()
    assert all(r.native == r.sql for r in cmp), next(
        (r.native, r.sql) for r in cmp if r.native != r.sql
    )
    # ...and float arrays (promote-to-double before multiply on both sides)
    fdf = vdf.select(
        F.expr("transform(a, x -> CAST(x AS FLOAT))").alias("a"),
        F.expr("transform(b, x -> CAST(x AS FLOAT))").alias("b"),
    )
    fcmp = fdf.select(
        F.expr("vec_dot(a, b)").alias("native"),
        F.expr(
            "aggregate(zip_with(a, b, (x, y) ->"
            " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, x) -> acc + x)"
        ).alias("sql"),
    ).collect()
    assert all(r.native == r.sql for r in fcmp)
    # NULL propagates; length mismatch raises loudly
    nl = spark.sql(
        "SELECT vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS v"
    ).collect()
    assert nl[0].v is None
    try:
        spark.sql("SELECT vec_dot(array(1.0D), array(1.0D, 2.0D))").collect()
        raise AssertionError("length mismatch did not raise")
    except Exception as e:  # noqa: BLE001
        assert "length mismatch" in str(e)

    print("NATIVE_EXT_OK")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
