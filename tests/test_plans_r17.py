"""Plan-shape pins for the round-17 optimizations: each test locks the
structural property the optimization bought, so a refactor that silently
re-introduces the duplicate scan / quadratic replay fails here, not in a
100 TB run. Value equality is separately covered by the oracle selfcheck;
these assert the SHAPE."""

from __future__ import annotations

import re

from presto_truffle_spark.plans import inspect


def _executed_plan(df) -> str:
    """Final (post-AQE) plan string — collect first so stage-cache shapes
    (ReusedExchange) are visible; pre-execution explain never shows them."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_join_single_scan(spark, sf_dir):
    """events_asof_join reads events ONCE (CASE-projection over an
    IN-filtered scan), not as a union of two filtered scans."""
    from presto_truffle_spark.operators.timeseries import events_asof_join

    scans = inspect.parquet_scans(events_asof_join(spark, sf_dir))
    assert len(scans) == 1, scans
    assert "event_type" in scans[0].pushed_filters


def test_tfidf_unpersisted_reuses_tf_exchange(spark, sf_dir):
    """Below the persist gate, the df branch must REUSE the tf shuffle via
    AQE's stage cache instead of re-running the tokenize+explode+aggregate
    chain (the r17 fix: df aggregates sum(least(tf,1)) so the shared
    subtree survives column pruning). sf0.001/sf0.01 are always below
    _TFIDF_PERSIST_MIN_BYTES, so this exercises the unpersisted path."""
    from presto_truffle_spark.operators.text import (
        _TFIDF_PERSIST_MIN_BYTES,
        text_tfidf_top_terms,
    )
    from presto_truffle_spark.cache import input_bytes

    assert input_bytes(sf_dir, "documents") < _TFIDF_PERSIST_MIN_BYTES
    plan = _executed_plan(text_tfidf_top_terms(spark, sf_dir))
    assert "ReusedExchange" in plan, plan[:2000]


def test_anomaly_mad_one_scan_no_join(spark, sf_dir):
    """events_anomaly_mad is a single-pass window plan: one scan of
    events, no join operators (the med/MAD ladder used to be 4 scans and
    2 user_id joins)."""
    from presto_truffle_spark.operators.timeseries_advanced import (
        events_anomaly_mad,
    )

    df = events_anomaly_mad(spark, sf_dir)
    assert len(inspect.parquet_scans(df)) == 1
    assert "Join" not in inspect.physical_plan(df)


def test_peak_concurrency_single_scan_reused(spark, sf_dir):
    """events_peak_concurrency: boundaries come from one exploded scan and
    the per_t exchange is stage-cache-reused by both consumers (carry and
    within-bucket) — the executed plan must hold exactly one parquet scan."""
    from presto_truffle_spark.operators.timeseries_advanced import (
        events_peak_concurrency,
    )

    plan = _executed_plan(events_peak_concurrency(spark, sf_dir))
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1, final
    assert "ReusedExchange" in final, final


def test_snm_multipass_single_range_shuffle(spark, sf_dir):
    """dedup_snm_multipass stacks its three blocking-key passes into ONE
    range shuffle: the plan holds exactly one RangePartitioning exchange
    (three would mean the per-pass pipelines are back)."""
    from presto_truffle_spark.operators.dedup import dedup_snm_multipass

    plan = inspect.physical_plan(dedup_snm_multipass(spark, sf_dir))
    # The one persisted range exchange is PRINTED once per consumer of the
    # cached frame; what must be unique is the partitioning expression
    # itself (per-pass pipelines would show k1/k2/k3 range keys).
    sigs = {
        re.sub(r"#\d+L?", "", m)
        for m in re.findall(r"rangepartitioning\([^)]*\)", plan)
    }
    assert len(sigs) == 1, sigs
    assert "snm_pass" in next(iter(sigs)), sigs


def test_mmr_plan_is_checkpoint_bounded(spark, sf_dir):
    """search_mmr_diversify's returned plan must be a bounded union over
    exactly k checkpointed one-row picks — NOT the quadratic lazy replay
    whose plan embedded the candidate pipeline (parquet scan and all)
    once per earlier pick before r17. Structural pin (ADVICE r17):
    k ExistingRDD scans and zero parquet scans, instead of the brittle
    plan-string byte length."""
    from presto_truffle_spark.operators.similarity import (
        _MMR_K,
        search_mmr_diversify,
    )

    plan = inspect.physical_plan(search_mmr_diversify(spark, sf_dir))
    assert plan.count("Scan ExistingRDD") == _MMR_K, plan.count(
        "Scan ExistingRDD"
    )
    # A re-introduced replay would drag the candidate pipeline (and its
    # parquet scan of embeddings) back into the returned plan.
    assert "Scan parquet" not in plan


def test_cc_round_single_pair_keyed_exchange(spark):
    """One large/small-star contraction round must shuffle on (u, v) exactly
    ONCE — e2's closing distinct. The r17 win dropped e1's .distinct(),
    whose (u, v) Exchange both added a shuffle and destroyed the u-keyed
    layout every downstream consumer reuses; this pin fails if it sneaks
    back (VERDICT r17 #7). The u-keyed exchanges collapse to 3 real
    shuffles at runtime via AQE stage reuse; pre-AQE they print 5."""
    from pyspark.sql import functions as F

    from presto_truffle_spark.operators.quality_ops import _star_contract_round

    E = (
        spark.range(8)
        .select((F.col("id") + 1).alias("u"), F.col("id").alias("v"))
        .localCheckpoint(eager=True)
    )
    plan = _star_contract_round(E)._jdf.queryExecution().executedPlan().toString()
    keys = [
        re.sub(r"#\d+L?", "", m).rstrip(", 0123456789")
        for m in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    ]
    assert keys.count("u, v") == 1, keys
    assert all(k in ("u", "u, v") for k in keys), keys
    assert len(keys) <= 6, keys
