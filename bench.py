"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Protocol (BASELINE.md, tightened round 2): per query, one warm-up
materialization then a TRIMMED MEAN of N=10 timed runs (min and max
dropped) with the per-query stddev reported — local-mode noise was
measured at ±30% round 1, so a median-of-5 couldn't distinguish a real
round-over-round regression from scheduler jitter. Spark's ~100ms/job
scheduling floor dominates at sf0.1; steady-state warm timings mirror the
reference's post-JIT-warmup protocol (``PureJavaTest.java:15-20`` runs
1000 warm iterations for the same reason). Results are materialized with
the `noop` sink (full execution, no driver collect).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "10"))


def trimmed_mean(samples: list[float]) -> float:
    """Mean with min and max dropped (for len >= 3) — robust to the one-off
    GC pause / scheduler hiccup that local mode throws into any run set."""
    if len(samples) < 3:
        return statistics.mean(samples)
    return statistics.mean(sorted(samples)[1:-1])

# Headline set: the flagship + one representative per operator family.
HEADLINE = [
    "q6",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "window_topk_per_group",
    "events_session_window",
    "events_asof_join",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_tfidf_top_terms",
]


def materialize(df) -> None:
    """Execute the full plan without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()


def _load_gate(max_wait_s: float = 300.0, quiet_1min: float = 0.5) -> dict:
    """Delay the battery until the machine is quiet (VERDICT r16 #3).

    Three of the four r16 bench attempts were honestly self-flagged as
    load-inflated AFTER burning the full battery; the calibration detects
    ambient load but never avoided it. This converts the documented
    settle-before-bench discipline into code: poll /proc/loadavg until the
    1-minute average drops below ``quiet_1min`` (bounded by ``max_wait_s``
    so a genuinely busy host still produces a run — the calibration probes
    then flag it as before). The wait happens BEFORE the SparkSession
    exists, so the gate reads ambient load, not our own JVM's startup."""
    t0 = time.monotonic()
    gate = {"quiet_1min_threshold": quiet_1min, "max_wait_s": max_wait_s}
    try:
        with open("/proc/loadavg") as f:
            load = float(f.read().split()[0])
    except OSError:  # non-Linux host: no gate, calibration still guards
        gate.update({"loadavg_at_start": None, "waited_s": 0.0})
        return gate
    gate["loadavg_at_start"] = load
    while load > quiet_1min and (time.monotonic() - t0) < max_wait_s:
        time.sleep(10)
        with open("/proc/loadavg") as f:
            load = float(f.read().split()[0])
    gate["loadavg_after_wait"] = load
    gate["waited_s"] = round(time.monotonic() - t0, 1)
    return gate


def main() -> None:
    load_gate = _load_gate()

    from presto_truffle_spark.session import get_spark
    from presto_truffle_spark.registry import get_queries

    spark = get_spark("bench")
    queries = get_queries()

    # Machine-load calibration probe: a fixed pure-JVM job (range→sum over
    # 100M) timed before the battery. Its cost has no plan variance, so
    # run-to-run drift in this number is ENVIRONMENT, not code — divide
    # headline deltas by calibration drift before reading them as plan
    # regressions (BASELINE.md documents ±30% sandbox noise; r3's judged
    # "25% regression" was exactly this).
    from pyspark.sql import functions as _F

    probe = lambda: spark.range(100_000_000, numPartitions=32).agg(  # noqa: E731
        _F.sum((_F.col("id") % 7) * (_F.col("id") % 11))
    )

    def run_probe() -> list[float]:
        materialize(probe())  # warm
        cal = []
        for _ in range(5):
            t0 = time.perf_counter()
            materialize(probe())
            cal.append(time.perf_counter() - t0)
        return cal

    # Quiet-machine reference for the probe, pinned from the r4/r5
    # measurement band (0.24-0.27 s median on an unloaded sandbox).
    # Hoisted above the settle loop (ADVICE r17) so the settle threshold
    # is derived from the same constant instead of a drifting literal.
    PROBE_QUIET_S = 0.25

    cal = run_probe()
    # Probe-based settle (r17, complements the /proc/loadavg gate): the
    # loadavg gate cannot see hypervisor steal — this round produced a
    # run with 1-min loadavg 0.07 whose very first probe already read
    # 0.36 s (1.4× quiet). The probe CAN see it, so if the median reads
    # >20 % over the quiet reference, wait and re-probe (bounded) before
    # starting the battery. Timing methodology after the gate unchanged.
    PROBE_SETTLE_MAX_S = 240.0
    PROBE_SETTLE_QUIET = PROBE_QUIET_S * 1.2
    settle_waited = 0.0
    while sorted(cal)[2] > PROBE_SETTLE_QUIET and settle_waited < PROBE_SETTLE_MAX_S:
        time.sleep(30)
        settle_waited += 30
        cal = run_probe()
    calibration = {
        "jvm_probe_median_s": round(sorted(cal)[2], 4),
        "jvm_probe_min_s": round(min(cal), 4),
        "probe_settle_waited_s": round(settle_waited, 1),
    }
    # load_factor > 1 means everything in this run — probe and headline
    # queries alike — is inflated by ambient machine load, so the
    # load-adjusted total divides it out. Round-over-round comparisons
    # should read value_load_adjusted (BASELINE.md r6 note); the raw
    # value stays the ground truth for same-run query-to-query ratios.
    load_factor = max(1.0, calibration["jvm_probe_median_s"] / PROBE_QUIET_S)
    calibration["probe_quiet_ref_s"] = PROBE_QUIET_S
    calibration["load_factor"] = round(load_factor, 4)
    # The linear-scaling assumption behind the adjustment only holds for
    # MILD contention: at load_factor 3.95 (r11) a full division printed
    # 1.36 s — below any physically achievable quiet time (best ever
    # 4.02 s), which can mislead a round-over-round read (VERDICT r11
    # #1). Clamp the trusted divisor at 1.5; past that the adjusted
    # value is only a LOWER-BOUND-ish hint and is flagged as such — the
    # raw value + load_factor stay the primary record.
    LOAD_ADJUST_TRUST_MAX = 1.5
    adjust_div = min(load_factor, LOAD_ADJUST_TRUST_MAX)
    calibration["load_adjust_divisor"] = round(adjust_div, 4)
    calibration["load_adjust_trusted"] = load_factor <= LOAD_ADJUST_TRUST_MAX

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    minima: dict[str, float] = {}
    # Interleaved mini-probes (VERDICT r13 #2): one probe execution after
    # each headline query. JVM warmup only ever LOWERS the probe reading
    # over the run (measured: 0.26 s at run 1 → ~0.10 s after the full
    # battery), so any mid-battery reading ABOVE the pre-probe median is
    # load arriving mid-run — the blind spot that let BENCH_r13 print
    # 4.80 s as "trusted quiet" when contention landed after the single
    # up-front probe.
    mid_probes: list[float] = []
    # Per-query trust + bounded retry (VERDICT r17 #2): two rounds of
    # driver benches landed untrusted because contention arrived
    # mid-battery, AFTER the pre-battery gates. The interleaved probes
    # bracket each query; when the probe following a query spikes above
    # 1.3× the quiet base, that query's samples are suspect — wait out
    # the spike (bounded) and re-measure that ONE query with the same
    # warm-up-plus-RUNS methodology. The suspect reading is preserved in
    # "retried" (additions-only JSON contract); "query_trusted" records
    # per-query flags so a geomean can be computed from clean readings
    # even when one spike poisons the global max-based flag.
    MID_PROBE_TRUST_MAX = 1.3
    pre_med = calibration["jvm_probe_median_s"]
    trust_base = max(pre_med, PROBE_QUIET_S)
    query_trusted: dict[str, bool] = {}
    retried: dict[str, dict] = {}

    def timed_probe() -> float:
        t0 = time.perf_counter()
        materialize(probe())
        dt = time.perf_counter() - t0
        mid_probes.append(dt)
        return dt

    def timed_runs(fn) -> list[float]:
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            materialize(fn(spark, SF_DIR))
            samples.append(time.perf_counter() - t0)
        return samples

    last_probe = pre_med
    for name in HEADLINE:
        fn = queries[name]
        # Label the jobs so the Spark UI / event log maps stages back to
        # the query being timed (optimization guide §1.5).
        spark.sparkContext.setJobDescription(f"bench:{name}")
        materialize(fn(spark, SF_DIR))  # warm-up: JIT, parquet footers, broadcast
        samples = timed_runs(fn)
        spark.sparkContext.setJobDescription(None)
        after = timed_probe()
        ok = max(last_probe, after) <= trust_base * MID_PROBE_TRUST_MAX
        if not ok:
            # One retry: give the contention a bounded chance to pass,
            # confirm with a fresh probe, and re-measure the query.
            time.sleep(20)
            settle = timed_probe()
            if settle <= trust_base * MID_PROBE_TRUST_MAX:
                suspect = samples
                spark.sparkContext.setJobDescription(f"bench:{name}:retry")
                samples = timed_runs(fn)
                spark.sparkContext.setJobDescription(None)
                after = timed_probe()
                ok = after <= trust_base * MID_PROBE_TRUST_MAX
                retried[name] = {
                    "suspect_trimmed_mean": round(trimmed_mean(suspect), 4),
                    "suspect_min": round(min(suspect), 4),
                }
            else:
                after = settle
        query_trusted[name] = ok
        last_probe = after
        timings[name] = round(trimmed_mean(samples), 4)
        spreads[name] = round(statistics.stdev(samples), 4) if len(samples) > 1 else 0.0
        # Per-query minimum = the noise-floor estimator: on a loaded
        # machine the trimmed mean inflates uniformly (r3's apparent 25%
        # "regression" was exactly this), while the minimum stays near the
        # true plan cost — diverging mean with stable min ⇒ environment,
        # both shifting ⇒ a real plan change.
        minima[name] = round(min(samples), 4)

    # Reference-scale comparison: the reference times Q6 over 5M in-memory
    # rows (TpchDataGenerator.java:16-17, PureJavaTest.java:15-20, 1000 warm
    # iterations). Same shape here: 5M generated rows, cached columnar,
    # median of 10 warm runs of the identical filter+sum.
    from pyspark.sql import functions as F
    from presto_truffle_spark.sources.generator import generate_lineitem_df

    ref = generate_lineitem_df(spark, 5_000_000).cache()
    q6_ref = lambda: ref.filter(  # noqa: E731
        (F.col("l_shipdate") >= F.lit("1994-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1995-01-01").cast("date"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    materialize(q6_ref())  # warm: materializes the cache
    ref_samples = []
    for _ in range(10):
        t0 = time.perf_counter()
        materialize(q6_ref())
        ref_samples.append(time.perf_counter() - t0)
    timings["q6_ref_scale_5m_inmem"] = round(trimmed_mean(ref_samples), 4)
    spreads["q6_ref_scale_5m_inmem"] = round(statistics.stdev(ref_samples), 4)
    minima["q6_ref_scale_5m_inmem"] = round(min(ref_samples), 4)
    ref.unpersist()
    after = timed_probe()
    query_trusted["q6_ref_scale_5m_inmem"] = (
        max(last_probe, after) <= trust_base * MID_PROBE_TRUST_MAX
    )

    # Skew-join demonstration (TODO_NEXT_ROUND r1 #4): a deliberately skewed
    # key distribution (50% of 3M left rows share key 0) joined to a
    # 200k-row right side, with broadcast disabled so the shuffle path is
    # exercised. Three strategies side by side:
    #   plain  — AQE skew handling OFF: one reducer gets half the rows (the
    #            100 TB straggler in miniature)
    #   aqe    — AQE skewJoin ON (runtime split of the hot partition)
    #   salted — plans/rewrites.salted_join (explicit 8-way key salting)
    from presto_truffle_spark.plans.rewrites import salted_join

    left = (
        spark.range(3_000_000, numPartitions=32)
        .withColumn("key", F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 1000))
        .withColumn("val", F.col("id") % 97)
    )
    right = (
        spark.range(200_000, numPartitions=32)
        .withColumn("key", F.col("id") % 1000)
        .withColumn("weight", F.col("id") % 13)
    )

    def skew_plain():
        return left.join(right.withColumnRenamed("id", "rid"), "key").agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("val") * F.col("weight")).alias("s")
        )

    def skew_salted():
        r = right.withColumnRenamed("id", "rid").withColumnRenamed("key", "rkey")
        j = salted_join(left, r, "key", "rkey", salt_source="id")
        return j.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("val") * F.col("weight")).alias("s")
        )

    # Reported under a separate "skew_demo" key (NOT summed into the
    # headline total: it's a synthetic stress shape, not a BASELINE query).
    skew_demo: dict[str, float] = {}
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for label, fn, skew_conf in (
            ("plain", skew_plain, "false"),
            ("aqe_skew_split", skew_plain, "true"),
            ("salted_8way", skew_salted, "false"),
        ):
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_conf)
            materialize(fn())  # warm
            ss = []
            for _ in range(3):
                t0 = time.perf_counter()
                materialize(fn())
                ss.append(time.perf_counter() - t0)
            skew_demo[label] = round(trimmed_mean(ss), 4)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", old_skew)

    # Mid-battery load detection (VERDICT r13 #2): BENCH_r13 printed
    # 4.80 s at "load_factor 1.00, trusted" because load arrived AFTER
    # the single up-front probe. The interleaved probes close that
    # blind spot. A naive pre-vs-post comparison does NOT work — the
    # probe itself JIT-warms from ~0.25 s to ~0.10 s over the battery
    # (measured r14), so post < pre is the normal quiet signature.
    # Warmup only lowers readings; load only raises them. Therefore:
    # any interleaved reading above pre_median × 1.3 means contention
    # arrived mid-battery, and the trusted-quiet claim is derated.
    calibration["probe_mid_max_s"] = round(max(mid_probes), 4)
    calibration["probe_mid_min_s"] = round(min(mid_probes), 4)
    # Reference floor at the quiet ref (r17): the probe-settle loop above
    # JIT-warms the pre-probe, so its median can land BELOW the quiet
    # reference (measured 0.13 s after a 90 s settle) — a raw mid/pre
    # ratio then flags perfectly normal mid readings as 2× "contention".
    # Warmup only ever LOWERS readings, so max(pre_med, quiet_ref) is
    # the honest baseline: a mid reading above 1.3× of THAT still means
    # load arrived, and a warmed baseline no longer false-positives.
    mid_ratio = max(mid_probes) / trust_base
    calibration["probe_mid_over_pre_ratio"] = round(mid_ratio, 4)
    # The effective load factor also reflects mid-battery load: the
    # worst interleaved reading participates in the quiet-ref ratio.
    load_factor = max(
        1.0, pre_med / PROBE_QUIET_S, max(mid_probes) / PROBE_QUIET_S
    )
    calibration["load_factor"] = round(load_factor, 4)
    adjust_div = min(load_factor, LOAD_ADJUST_TRUST_MAX)
    calibration["load_adjust_divisor"] = round(adjust_div, 4)
    calibration["load_adjust_trusted"] = (
        load_factor <= LOAD_ADJUST_TRUST_MAX
        and mid_ratio <= MID_PROBE_TRUST_MAX
    )

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_query_trimmed_mean_total",
                "value": round(sum(timings.values()), 4),
                "value_load_adjusted": round(
                    sum(timings.values()) / adjust_div, 4
                ),
                "unit": "sec",
                "queries": timings,
                "stddev": spreads,
                "min": minima,
                "skew_demo": skew_demo,
                "query_trusted": query_trusted,
                "all_queries_trusted": all(query_trusted.values()),
                "retried": retried,
                "calibration": calibration,
                "load_gate": load_gate,
                "runs": RUNS,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
