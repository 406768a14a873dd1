"""Result-equivalence tests for the planner-rewrite layer on ADVERSARIAL
generated data (skew, duplicate keys, equal timestamps, unmatched rows).

The registered queries prove these rewrites against DuckDB oracles on the
TPC-H-ish fixtures, but the fixtures are benign: orderkey isn't skewed,
event timestamps rarely collide. These tests feed the rewrites the inputs
they exist FOR (one key holding half the rows; duplicate right-side keys;
exact timestamp ties; keys with no match) and require exact equality with
the naive spelling.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_truffle_spark.plans.rewrites import asof_join_lastward, salted_join


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_join_equals_plain_join_under_heavy_skew(spark):
    # 50% of left rows on key 0; right side has DUPLICATE keys (the join
    # multiplicity the salt must preserve) and keys with no left match.
    left = (
        spark.range(20_000)
        .withColumn("k", F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 50))
        .withColumn("lv", F.col("id") % 97)
    )
    right = (
        spark.range(200)
        .withColumn("k", F.col("id") % 60)  # keys 50-59 never match
        .withColumn("rv", F.col("id") % 13)
    )
    plain = left.join(right.withColumnRenamed("k", "rk"), F.col("k") == F.col("rk")).select(
        "k", "lv", "rv"
    )
    salted = salted_join(
        left.withColumnRenamed("k", "lk"),
        right.withColumnRenamed("k", "rk"),
        "lk",
        "rk",
        "lv",
        n_salt=8,
    ).select(F.col("lk").alias("k"), "lv", "rv")
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_asof_lastward_matches_bruteforce_with_ties(spark):
    # refs at t=10,20,20,30 per key (DUPLICATE ref timestamps), queries
    # exactly ON ref timestamps (>= semantics: the tie must match), before
    # the first ref (no match -> null), and a key with no refs at all.
    refs_rows = [
        (1, 10, "a"),
        (1, 20, "b1"),
        (1, 20, "b2"),
        (1, 30, "c"),
        (2, 15, "x"),
    ]
    query_rows = [
        (1, 5),   # before first ref -> null
        (1, 10),  # tie with first ref -> "a"
        (1, 20),  # tie with duplicated ref ts -> one of b1/b2 (last wins)
        (1, 25),  # between -> b*
        (1, 99),  # after last -> "c"
        (2, 14),  # before key-2's only ref -> null
        (2, 15),  # tie -> x
        (3, 50),  # key with no refs -> null
    ]
    refs = spark.createDataFrame(refs_rows, "k long, rts long, tag string")
    queries = spark.createDataFrame(query_rows, "k long, qts long")
    out = asof_join_lastward(queries, refs, "k", "qts", "rts", ["tag"])
    got = {(r.k, r.qts): r.tag for r in out.collect()}
    assert got[(1, 5)] is None
    assert got[(1, 10)] == "a"
    assert got[(1, 20)] in ("b1", "b2")
    assert got[(1, 25)] in ("b1", "b2")
    assert got[(1, 99)] == "c"
    assert got[(2, 14)] is None
    assert got[(2, 15)] == "x"
    assert got[(3, 50)] is None
    assert len(got) == len(query_rows)


def test_binned_range_join_equals_nested_loop_on_adversarial_intervals(spark):
    """binned_range_join vs the naive BETWEEN join on inputs built to
    break binning: duplicate intervals (multiplicity), overlapping and
    nested intervals, zero-width and bin-boundary-straddling intervals,
    inverted (lo > hi) and NULL-endpoint rows, negative coordinates, and
    points exactly ON bin edges. Exact multiset equality required, plus
    the plan guarantee the helper exists for: no nested loop."""
    from presto_truffle_spark.plans.rewrites import binned_range_join

    points = spark.range(4000).selectExpr(
        "id AS pid", "CAST((id * 13) % 700 - 100 AS LONG) AS p"
    )
    ivals = spark.createDataFrame(
        [
            (1, -100, -50),   # fully negative
            (2, -10, 10),     # straddles zero / a bin edge
            (3, 0, 0),        # zero-width on a bin edge
            (4, 64, 64),      # zero-width on the next bin edge (W=64)
            (5, 100, 500),    # wide (spans many bins)
            (6, 100, 500),    # DUPLICATE of 5 — multiplicity
            (7, 120, 130),    # nested inside 5
            (8, 500, 100),    # inverted — matches nothing
            (9, None, 50),    # NULL lo — matches nothing
            (10, 50, None),   # NULL hi — matches nothing
            (11, 599, 601),   # straddles the domain edge
        ],
        "iid long, lo long, hi long",
    )
    naive = points.join(
        ivals, (points.p >= ivals.lo) & (points.p <= ivals.hi)
    ).select("pid", "iid")
    fast = binned_range_join(points, ivals, "p", "lo", "hi", 64.0).select(
        "pid", "iid"
    )
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    naive_rows = sorted((r.pid, r.iid) for r in naive.collect())
    fast_rows = sorted((r.pid, r.iid) for r in fast.collect())
    assert fast_rows == naive_rows
    assert len(naive_rows) > 0


def test_registered_binned_range_join_plan_has_no_nested_loop(spark, sf_dir):
    from presto_truffle_spark.plans.rewrites import rewrite_binned_range_join

    plan = (
        rewrite_binned_range_join(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
