"""Invariant tests for the r2 corpus-prep operators (beyond the DuckDB
oracle): conservation and partition-completeness properties that must hold
on ANY corpus, checked on the fixture."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_hash_split_partitions_whole_corpus(spark, sf_dir):
    """Every document lands in exactly one split; totals conserve."""
    from presto_truffle_spark.catalog import load_table
    from presto_truffle_spark.operators.corpus_ops import corpus_hash_split

    d = load_table(spark, sf_dir, "documents")
    total_docs = d.count()
    total_chars = d.agg(F.sum("n_chars")).collect()[0][0]
    rows = corpus_hash_split(spark, sf_dir).collect()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    assert sum(r.n_docs for r in rows) == total_docs
    assert sum(r.total_chars for r in rows) == total_chars
    by = {r.split: r.n_docs for r in rows}
    # 80/10/10 by hash: train must dominate on any non-adversarial corpus
    assert by.get("train", 0) > by.get("val", 0) + by.get("test", 0)


def test_pack_bins_conserve_tokens_and_fill(spark, sf_dir):
    """Packing conserves tokens per language, bins are dense (ids 0..max),
    and every bin except a language's last holds >= the context size
    (a bin only closes once the running count passes the boundary)."""
    from presto_truffle_spark.catalog import load_table
    from presto_truffle_spark.operators.corpus_ops import (
        _CONTEXT_TOKENS,
        corpus_pack_bins,
    )

    d = load_table(spark, sf_dir, "documents")
    want = {
        r.lang: r.total
        for r in d.groupBy("lang")
        .agg(F.sum(F.expr("n_chars div 4")).alias("total"))
        .collect()
    }
    rows = corpus_pack_bins(spark, sf_dir).collect()
    got: dict[str, int] = {}
    bins: dict[str, dict[int, int]] = {}
    for r in rows:
        got[r.lang] = got.get(r.lang, 0) + r.bin_tokens
        bins.setdefault(r.lang, {})[r.bin_id] = r.bin_tokens
    assert got == want
    for lang, bb in bins.items():
        assert sorted(bb) == list(range(max(bb) + 1)), f"gap in {lang} bin ids"
        for bin_id, toks in bb.items():
            if bin_id != max(bb):
                assert toks >= _CONTEXT_TOKENS - 4096 // 4, f"underfull {lang}/{bin_id}"


def test_stratified_sample_is_stable_and_sized(spark, sf_dir):
    """Same sample on rerun (determinism) and exactly min(n, stratum) rows
    per language."""
    from presto_truffle_spark.catalog import load_table
    from presto_truffle_spark.operators.corpus_ops import (
        _SAMPLE_PER_STRATUM,
        corpus_stratified_sample,
    )

    s1 = {(r.lang, r.doc_id) for r in corpus_stratified_sample(spark, sf_dir).collect()}
    s2 = {(r.lang, r.doc_id) for r in corpus_stratified_sample(spark, sf_dir).collect()}
    assert s1 == s2
    d = load_table(spark, sf_dir, "documents")
    sizes = {r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    per_lang: dict[str, int] = {}
    for lang, _ in s1:
        per_lang[lang] = per_lang.get(lang, 0) + 1
    for lang, n in sizes.items():
        assert per_lang.get(lang, 0) == min(_SAMPLE_PER_STRATUM, n)


def test_contamination_detects_eval_docs_only(spark, sf_dir):
    """No eval-source doc appears in the report, and every reported ratio
    is in (0, 1]."""
    from presto_truffle_spark.catalog import load_table
    from presto_truffle_spark.operators.corpus_ops import (
        _EVAL_SOURCE,
        corpus_contamination_check,
    )

    rows = corpus_contamination_check(spark, sf_dir).collect()
    eval_ids = {
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("source") == _EVAL_SOURCE)
        .collect()
    }
    assert rows, "fixture must produce some overlap"
    for r in rows:
        assert r.doc_id not in eval_ids
        assert 0 < r.overlap_ratio <= 1
        assert 0 < r.n_overlap <= r.n_shingles


def test_token_budget_select_respects_budget(spark, sf_dir):
    """corpus_token_budget_select: the selected token mass must fit the
    25% budget, selection must be bucket-downward-closed (every kept
    bucket's score >= every dropped bucket's score), and adding the next
    bucket below the cut must overflow the budget (greedy maximality)."""
    import pyspark.sql.functions as F

    from presto_truffle_spark.catalog import load_table
    from presto_truffle_spark.operators.corpus_ops import (
        _BUDGET_FRAC,
        corpus_token_budget_select,
    )

    sel = corpus_token_budget_select(spark, sf_dir).collect()
    d = load_table(spark, sf_dir, "documents").select(
        F.size(F.split("text", " ")).alias("n")
    )
    total = d.agg(F.sum("n")).collect()[0][0]
    budget = int(total * _BUDGET_FRAC)
    picked = sum(r.n_tok for r in sel)
    assert picked <= budget
    kept_buckets = {r.bucket for r in sel}
    # maximality: the largest dropped bucket would overflow
    toks = F.split(F.col("text"), " ")
    t = load_table(spark, sf_dir, "documents").select(
        F.floor(
            F.size(F.array_distinct(toks)) * F.lit(1000.0) / F.size(toks)
        ).cast("long").alias("bucket"),
        F.size(toks).alias("n_tok"),
    )
    by_bucket = {
        r.bucket: r.s
        for r in t.groupBy("bucket").agg(F.sum("n_tok").alias("s")).collect()
    }
    dropped = sorted((b for b in by_bucket if b not in kept_buckets), reverse=True)
    if dropped:
        assert picked + by_bucket[dropped[0]] > budget
    # downward-closed against the true bucket set
    for b in by_bucket:
        if b > min(kept_buckets):
            assert b in kept_buckets


def test_quality_calibrated_per_source_gate(spark, sf_dir):
    """corpus_quality_calibrated: within every source, roughly half the
    docs are kept (>= interpolated median guarantees at least half), the
    kept flag recomputes from ttr vs the source median, and calibration
    differs from a global gate (at least one source's median differs
    from another's — the reason per-source calibration exists)."""
    from presto_truffle_spark.operators.corpus_ops import (
        corpus_quality_calibrated,
    )

    rows = corpus_quality_calibrated(spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    medians = {}
    for src, rs in by_src.items():
        kept = sum(r.kept for r in rs)
        assert kept >= len(rs) / 2 - 1  # >= median keeps at least half
        assert kept < len(rs)  # and strictly gates something
        medians[src] = rs[0].src_median
        for r in rs:
            assert r.kept == (1 if r.ttr >= r.src_median else 0) or (
                # kept compares against the UNROUNDED median; the emitted
                # one is floor-rounded — allow the boundary ulp
                abs(r.ttr - r.src_median) < 1e-6
            )
    assert len(set(medians.values())) > 1


def test_pack_bins_sorted_conserves_and_tightens(spark, sf_dir):
    """corpus_pack_bins_sorted: token totals conserve per language (same
    invariant as arrival-order packing) and the size-descending order
    must not produce MORE bins than arrival order for any language — the
    monotone-improvement property of packing big-first with the same
    running-sum rule."""
    import pyspark.sql.functions as F

    from presto_truffle_spark.catalog import load_table
    from presto_truffle_spark.operators.corpus_ops import (
        corpus_pack_bins,
        corpus_pack_bins_sorted,
    )

    d = load_table(spark, sf_dir, "documents")
    want = {
        r.lang: r.total
        for r in d.groupBy("lang")
        .agg(F.sum(F.expr("n_chars div 4")).alias("total"))
        .collect()
    }
    srt = corpus_pack_bins_sorted(spark, sf_dir).collect()
    got: dict[str, int] = {}
    bins_sorted: dict[str, int] = {}
    for r in srt:
        got[r.lang] = got.get(r.lang, 0) + r.bin_tokens
        bins_sorted[r.lang] = max(bins_sorted.get(r.lang, -1), r.bin_id)
    assert got == want
    bins_arrival: dict[str, int] = {}
    for r in corpus_pack_bins(spark, sf_dir).collect():
        bins_arrival[r.lang] = max(bins_arrival.get(r.lang, -1), r.bin_id)
    for lang in bins_arrival:
        assert bins_sorted[lang] <= bins_arrival[lang]


def test_recency_sample_shifts_mix_recent_on_dated_fixture(spark):
    """The discriminative readout of recency-weighted sampling on the
    DATED rich fixture: feeding real ingest-date periods (10-day bins,
    the fixture's topic stagger) through the shared fold must shift
    the sampled mix's mean batch measurably toward the present, while
    realized per-batch rates track the exact decay targets. Measured
    at seed 12: corpus mean bin 3.58 -> sample mean bin 5.07
    (shift +1.49 bins ~ 15 days), 95/600 kept."""
    from pyspark.sql import functions as F

    from presto_truffle_spark.operators.corpus_ops import (
        _RWS_PERIODS,
        _recency_sample_fold,
    )
    from presto_truffle_spark.sources.rich_fixture import zipf_documents

    docs = zipf_documents(spark, 600, seed=12)
    d = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.least(
            F.lit(_RWS_PERIODS - 1),
            F.greatest(
                F.lit(0),
                (
                    F.datediff(
                        F.col("day"), F.lit("2024-01-01").cast("date")
                    )
                    / 10
                ).cast("long"),
            ),
        ).alias("period"),
    )
    rows = _recency_sample_fold(d).collect()
    nd = sum(r["n_docs"] for r in rows)
    ns = sum(r["n_sampled"] for r in rows)
    assert nd == 600 and 0 < ns < nd
    corpus_mean = sum(r["period"] * r["n_docs"] for r in rows) / nd
    sample_mean = sum(r["period"] * r["n_sampled"] for r in rows) / ns
    # recent-heavy mix: the mean ingest bin of the sample sits at
    # least one full 10-day bin later than the corpus's
    assert sample_mean - corpus_mean > 1.0, (corpus_mean, sample_mean)
    # realized rates track the exact decay targets on populated bins
    for r in rows:
        if r["n_docs"] >= 50:
            assert abs(r["sample_rate"] - r["target_rate"]) < 0.12, r
    # the ledger's keep decision is reproducible from doc_id alone
    from presto_truffle_spark.operators.corpus_ops import (
        _RWS_M,
        _RWS_THRESH,
    )

    hand = d.select("doc_id", "period").collect()
    hand_n = sum(
        1
        for row in hand
        if (row["doc_id"] * 48271) % _RWS_M < _RWS_THRESH[row["period"]]
    )
    assert hand_n == ns
