"""Bounded CI slice of the random-query differential fuzzer
(tools/fuzz_differential.py — 100 seeds passed at authoring time; this
keeps a fast deterministic sample in the suite so grammar or
canonicalization regressions surface in CI)."""

from __future__ import annotations

import random
import shutil
import tempfile

import duckdb

from tools.fuzz_differential import run_case


def test_empty_input_grouping_sets_divergence_pinned(spark):
    """FIXTURES.md r6: on EMPTY input, DuckDB emits the SQL-standard ()
    super-aggregate row for ROLLUP/CUBE while Spark emits zero rows.
    The fuzzer's grouping family relies on exactly this shape; if either
    engine changes, this pin fails before a fuzz seed silently does."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([], "k1 string, k2 string, m1 long")
    assert df.cube("k1", "k2").agg(F.count(F.lit(1))).count() == 0
    assert df.rollup("k1", "k2").agg(F.count(F.lit(1))).count() == 0
    assert df.agg(F.count(F.lit(1))).count() == 1  # plain global agg

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k1 VARCHAR, k2 VARCHAR, m1 BIGINT)")
    for sets in ("ROLLUP (k1, k2)", "CUBE (k1, k2)",
                 "GROUPING SETS ((k1), (k2), ())"):
        rows = con.execute(
            f"SELECT k1, k2, count(*) FROM t GROUP BY {sets}"
        ).fetchall()
        assert len(rows) == 1 and rows[0][2] == 0, (sets, rows)


def test_fuzz_differential_sample(spark):
    con = duckdb.connect()
    tmp = tempfile.mkdtemp(prefix="fuzz_ci_")
    try:
        failures = []
        for i in range(10):
            rng = random.Random(424242 + i)
            err = run_case(spark, con, rng, tmp, i)
            if err:
                failures.append((i, err))
        assert failures == []
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
