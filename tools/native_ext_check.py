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

    # 6. BinRangeJoin: an equi-key-less interval join must become an
    # equi-join on bins (no NestedLoop in the physical plan) and return
    # EXACTLY the rows/multiplicities of the unrewritten plan.
    points = spark.range(5000).select(
        F.col("id").alias("pid"), (F.col("id") % 977 * 3).alias("p")
    )
    # overlapping intervals, a duplicate interval row, an inverted one,
    # and a NULL endpoint — every edge the rewrite must preserve
    ivals = spark.sql(
        """
        SELECT iid, lo, hi FROM VALUES
          (1, 0, 500), (2, 400, 900), (3, 400, 900), (4, 2900, 100),
          (5, NULL, 50), (6, 2500, 2930), (7, 2800, 2800)
        AS t(iid, lo, hi)
        """
    )
    # NOTE: a Dataset memoizes its QueryExecution at creation, so every
    # conf flip below REBUILDS the join to get a fresh optimization.
    def ijoin():
        return points.join(
            ivals, (points.p >= ivals.lo) & (points.p <= ivals.hi)
        )

    # rule OFF (no bin size): plan stays a nested loop
    spark.conf.unset("spark.prestotruffle.rangeJoin.binSize")
    joined = ijoin()
    plan_off = joined._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" in plan_off or "Cartesian" in plan_off, plan_off
    expected = sorted((r.pid, r.iid) for r in joined.collect())

    # rule ON: no nested loop anywhere; identical multiset of rows
    spark.conf.set("spark.prestotruffle.rangeJoin.binSize", "256")
    joined = ijoin()
    plan_on = joined._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan_on and "Cartesian" not in plan_on, plan_on
    assert "explode" in plan_on and "__pt_bin" in plan_on, plan_on
    got6 = sorted((r.pid, r.iid) for r in joined.collect())
    assert got6 == expected, (
        f"range-join rewrite changed results: {len(got6)} vs {len(expected)}"
    )
    assert len(expected) > 0  # the fixture actually exercises matches

    # guard: a join that already has an equi-key is left alone
    eq = points.join(
        ivals,
        (points.pid % 7 == ivals.iid)
        & (points.p >= ivals.lo)
        & (points.p <= ivals.hi),
    )
    eq_plan = eq._jdf.queryExecution().optimizedPlan().toString()
    assert "__pt_bin" not in eq_plan, eq_plan

    # guard: non-inner joins are left alone
    lj = points.join(
        ivals, (points.p >= ivals.lo) & (points.p <= ivals.hi), "left"
    )
    lj_plan = lj._jdf.queryExecution().optimizedPlan().toString()
    assert "__pt_bin" not in lj_plan, lj_plan

    # timestamps bin via cast-to-epoch-seconds: same rewrite, same rows
    tpoints = spark.sql(
        "SELECT id AS pid, timestamp'2024-01-01 00:00:00' + make_interval"
        "(0, 0, 0, 0, 0, 0, id * 37) AS ts FROM range(2000)"
    )
    tivals = spark.sql(
        """
        SELECT iid,
               timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,s) AS lo,
               timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,e) AS hi
        FROM VALUES (1, 0, 3600), (2, 3000, 9000), (3, 70000, 74000)
        AS t(iid, s, e)
        """
    )
    def tjoin():
        return tpoints.join(
            tivals, (tpoints.ts >= tivals.lo) & (tpoints.ts <= tivals.hi)
        )

    spark.conf.unset("spark.prestotruffle.rangeJoin.binSize")
    t_expected = sorted((r.pid, r.iid) for r in tjoin().collect())
    spark.conf.set("spark.prestotruffle.rangeJoin.binSize", "600")
    tj = tjoin()
    t_plan = tj._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in t_plan and "__pt_bin" in t_plan, t_plan
    t_got = sorted((r.pid, r.iid) for r in tj.collect())
    assert t_got == t_expected and len(t_expected) > 0
    spark.conf.unset("spark.prestotruffle.rangeJoin.binSize")

    # TIMESTAMP_NTZ: cannot cast to DOUBLE directly, so the rule routes
    # it through a UTC-pinned cast to TIMESTAMP. Run under a NON-UTC
    # session zone to prove the binning is zone-free (a session-zone
    # conversion would be non-monotone across DST).
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        ntz_pts = spark.sql(
            "SELECT id AS pid, timestamp_ntz'2024-11-03 00:00:00' +"
            " make_interval(0,0,0,0,0,0, id * 137) AS ts FROM range(1500)"
        )
        ntz_iv = spark.sql(
            """
            SELECT iid,
                   timestamp_ntz'2024-11-03 00:00:00'
                     + make_interval(0,0,0,0,0,0,s) AS lo,
                   timestamp_ntz'2024-11-03 00:00:00'
                     + make_interval(0,0,0,0,0,0,e) AS hi
            FROM VALUES (1, 0, 7200), (2, 5000, 20000), (3, 100000, 110000)
            AS t(iid, s, e)
            """
        )
        assert dict(ntz_pts.dtypes)["ts"] == "timestamp_ntz"

        def njoin():
            return ntz_pts.join(
                ntz_iv, (ntz_pts.ts >= ntz_iv.lo) & (ntz_pts.ts <= ntz_iv.hi)
            )

        n_expected = sorted((r.pid, r.iid) for r in njoin().collect())
        spark.conf.set("spark.prestotruffle.rangeJoin.binSize", "3600")
        nj = njoin()
        n_plan = nj._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in n_plan and "__pt_bin" in n_plan, n_plan
        n_got = sorted((r.pid, r.iid) for r in nj.collect())
        assert n_got == n_expected and len(n_expected) > 0
    finally:
        spark.conf.unset("spark.prestotruffle.rangeJoin.binSize")
        spark.conf.set("spark.sql.session.timeZone", "UTC")

    # ------------------------------------------------------------------
    # BinKeyedRangeJoin: the as-of-with-tolerance shape — equi-key AND
    # bounded range. Vanilla Spark joins on the key alone and filters the
    # range post-join (per-key cartesian); the keyed rule adds the bin
    # number to the join key.
    # ------------------------------------------------------------------
    kq = spark.sql(
        "SELECT id AS qid, id % 5 AS k, (id * 13) % 10000 AS qts"
        " FROM range(4000)"
    )
    kr = spark.sql(
        "SELECT id AS rid, id % 5 AS rk, (id * 29) % 10000 AS rts"
        " FROM range(3000)"
    )

    def kjoin():
        # as-of candidate generation: same key, rts in (qts-200, qts]
        return kq.join(
            kr,
            (kq.k == kr.rk) & (kr.rts > kq.qts - 200) & (kr.rts <= kq.qts),
        )

    spark.conf.unset("spark.prestotruffle.keyedRangeJoin.binSize")
    kj = kjoin()
    k_plan_off = kj._jdf.queryExecution().optimizedPlan().toString()
    assert "__pt_bin" not in k_plan_off, k_plan_off
    k_expected = sorted((r.qid, r.rid) for r in kj.collect())

    spark.conf.set("spark.prestotruffle.keyedRangeJoin.binSize", "128")
    kj = kjoin()
    k_plan_on = kj._jdf.queryExecution().optimizedPlan().toString()
    assert "__pt_bin" in k_plan_on, k_plan_on
    # idempotence inside the fixed-point batch: exactly ONE explode was
    # introduced (a re-fire would nest a second Generate)
    assert k_plan_on.count("explode(sequence") == 1, k_plan_on
    k_got = sorted((r.qid, r.rid) for r in kj.collect())
    assert k_got == k_expected and len(k_expected) > 0, (
        f"keyed range-join rewrite changed results: "
        f"{len(k_got)} vs {len(k_expected)}"
    )

    # the full as-of: argmax (latest rts per qid) on top of the rewritten
    # candidate join must equal the vanilla as-of result
    from pyspark.sql import Window as W

    def asof(df):
        w = W.partitionBy("qid").orderBy(
            F.col("rts").desc(), F.col("rid")
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("qid", "rid", "rts")
        )

    a_got = sorted(tuple(r) for r in asof(kjoin()).collect())
    spark.conf.unset("spark.prestotruffle.keyedRangeJoin.binSize")
    a_expected = sorted(tuple(r) for r in asof(kjoin()).collect())
    assert a_got == a_expected and len(a_expected) > 0

    # guard: the keyed rule must NOT touch a join with no equi conjunct
    # (that is BinRangeJoin's territory, gated by its own conf)
    spark.conf.set("spark.prestotruffle.keyedRangeJoin.binSize", "128")
    ne = kq.join(kr, (kr.rts > kq.qts - 200) & (kr.rts <= kq.qts))
    ne_plan = ne._jdf.queryExecution().optimizedPlan().toString()
    assert "__pt_bin" not in ne_plan, ne_plan

    # guard: an UNBOUNDED as-of (no lower bound) has no bin range to
    # explode — left alone
    ub = kq.join(kr, (kq.k == kr.rk) & (kr.rts <= kq.qts))
    ub_plan = ub._jdf.queryExecution().optimizedPlan().toString()
    assert "__pt_bin" not in ub_plan, ub_plan

    # guard: non-inner stays untouched
    klj = kq.join(
        kr,
        (kq.k == kr.rk) & (kr.rts > kq.qts - 200) & (kr.rts <= kq.qts),
        "left",
    )
    klj_plan = klj._jdf.queryExecution().optimizedPlan().toString()
    assert "__pt_bin" not in klj_plan, klj_plan

    # r9: idempotence is a TreeNodeTag on the rewritten Join, not a
    # column-name sniff — a USER column legitimately named __pt_bin must
    # no longer suppress the rewrite (and still: exactly one explode).
    uq = kq.withColumn("__pt_bin", F.col("qid") % 7)
    uj = uq.join(
        kr,
        (uq.k == kr.rk) & (kr.rts > uq.qts - 200) & (kr.rts <= uq.qts),
    )
    u_plan = uj._jdf.queryExecution().optimizedPlan().toString()
    assert "explode(sequence" in u_plan, u_plan
    assert u_plan.count("explode(sequence") == 1, u_plan
    u_got = sorted((r.qid, r.rid) for r in uj.collect())
    assert u_got == k_expected, (
        f"user __pt_bin column changed keyed rewrite results: "
        f"{len(u_got)} vs {len(k_expected)}"
    )
    spark.conf.unset("spark.prestotruffle.keyedRangeJoin.binSize")

    # ------------------------------------------------------------------
    # 7. jaccard_sets: the fused exact-Jaccard kernel must match the
    # catalyst set-function spelling size(array_intersect)/size(array_union)
    # bit-for-bit on a battery with duplicates and NULL *elements*, and
    # must fix the spelling's two defined gaps: NULL array -> NULL (not
    # an error), empty-union -> NULL (not 0/0).
    # ------------------------------------------------------------------
    jdf = spark.range(500).select(
        F.col("id"),
        # duplicates on purpose (i % 7 collides); sizes vary 0..14
        F.expr(
            "transform(sequence(1, CAST(id % 15 AS INT)),"
            " i -> concat('t', CAST((id + i * i) % 7 AS STRING)))"
        ).alias("a"),
        F.expr(
            "transform(sequence(1, CAST((id * 3) % 13 AS INT)),"
            " i -> concat('t', CAST((id * 2 + i) % 9 AS STRING)))"
        ).alias("b"),
    )
    jcmp = jdf.select(
        F.expr("jaccard_sets(a, b)").alias("native"),
        F.expr(
            "CAST(size(array_intersect(a, b)) AS DOUBLE)"
            " / nullif(size(array_union(a, b)), 0)"
        ).alias("sql"),
    ).collect()
    assert all(r.native == r.sql for r in jcmp), next(
        (r.native, r.sql) for r in jcmp if r.native != r.sql
    )
    # NULL elements are distinguished values (array_intersect semantics)
    jedge = spark.sql(
        """
        SELECT jaccard_sets(a, b) AS native,
               CAST(size(array_intersect(a, b)) AS DOUBLE)
                 / nullif(size(array_union(a, b)), 0) AS sql
        FROM VALUES
          (array('x', CAST(NULL AS STRING), 'y'), array(CAST(NULL AS STRING), 'z')),
          (array('x', CAST(NULL AS STRING)), array('x')),
          (array('x', 'x', 'y'), array('x'))
        AS t(a, b)
        """
    ).collect()
    for r in jedge:
        assert r.native == r.sql, (r.native, r.sql)
    # NULL array -> NULL; empty union -> NULL; empty-vs-nonempty -> 0.0
    jn = spark.sql(
        "SELECT jaccard_sets(CAST(NULL AS ARRAY<STRING>), array('a')) AS v1,"
        "       jaccard_sets(CAST(array() AS ARRAY<STRING>),"
        "                    CAST(array() AS ARRAY<STRING>)) AS v2,"
        "       jaccard_sets(CAST(array() AS ARRAY<STRING>), array('a')) AS v3"
    ).collect()[0]
    assert jn.v1 is None and jn.v2 is None and jn.v3 == 0.0, jn
    # non-string arrays are rejected at analysis time
    try:
        spark.sql("SELECT jaccard_sets(array(1), array(2))").collect()
        raise AssertionError("int arrays did not raise")
    except Exception as e:  # noqa: BLE001
        assert "array<string>" in str(e).lower() or "ARRAY<STRING>" in str(e), e

    print("NATIVE_EXT_OK")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
