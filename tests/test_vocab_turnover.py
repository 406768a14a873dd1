"""Structural proof for the vocabulary-turnover machinery (VERDICT r14 #4).

The registered `corpus_vocab_turnover` batches by doc_id twelfths so it
is hostable on the driver fixture (whose documents carry no date). The
DATED rich fixture (r15: `zipf_documents` gained a topic-staggered
`day` column) is where the analytic has real signal: topics come online
in staggered 14-day windows and each topic permutes WHICH tokens are
frequent, so NEW vocabulary must keep entering as the date axis
advances. This test runs the same `_turnover_fold` over real
ingest-date periods and pins that structure.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _day_period_core_tokens(docs, min_count: int = 8):
    """(period, token) presence frame with period = 10-day ingest bins
    (aligned to the fixture's 10-day topic stagger), restricted to the
    bin's CORE vocabulary (count >= min_count). The fixture's topics
    share one 512-token vocabulary and only permute WHICH tokens are
    frequent, so raw presence is dense in every bin (probed: late-bin
    first occurrences = 0/512) — the churn signal lives in the
    frequent set, exactly the set a tokenizer budget is built from."""
    return (
        docs.select(
            (
                F.datediff(F.col("day"), F.lit("2024-01-01").cast("date"))
                / 10
            )
            .cast("long")
            .alias("period"),
            F.explode(F.split(F.col("text"), " ")).alias("token"),
        )
        .groupBy("period", "token")
        .count()
        .where(F.col("count") >= min_count)
        .select("period", "token")
    )


def test_dated_rich_fixture_has_real_turnover(spark):
    from presto_truffle_spark.operators.corpus_ops import _turnover_fold
    from presto_truffle_spark.sources.rich_fixture import zipf_documents

    docs = zipf_documents(spark, 600, seed=12)
    per = {
        r["period"]: r
        for r in _turnover_fold(_day_period_core_tokens(docs)).collect()
    }
    periods = sorted(per)
    # the 8 topics staggered 10 days apart span ~9 ten-day bins
    assert len(periods) >= 6
    # Core vocabulary keeps ENTERING well past the first bin: later
    # bins' combined first occurrences are a substantial share of the
    # union core (a static frequent set would collapse to ~0 after bin
    # 0). Measured 157/476 = 0.33 at seed 12.
    total_vocab = sum(per[p]["n_new"] for p in periods)
    late_new = sum(per[p]["n_new"] for p in periods if p >= 2)
    assert late_new / total_vocab > 0.25, (late_new, total_vocab)
    # ... and RETIRING: early bins' core makes its last appearance
    # before the end (topics going offline take their frequent set).
    # Measured 209/476 = 0.44 at seed 12.
    early_retiring = sum(
        per[p]["n_retiring"] for p in periods if p < periods[-1] - 1
    )
    assert early_retiring / total_vocab > 0.30, (early_retiring, total_vocab)
    # churn accounting invariants hold per bin
    for p in periods:
        r = per[p]
        assert r["n_new"] <= r["n_active"]
        assert r["n_retiring"] <= r["n_active"]
        assert r["n_ephemeral"] <= min(r["n_new"], r["n_retiring"])


def test_registered_turnover_accounting(spark, sf_dir):
    """On any fixture: Σ n_new = Σ n_retiring = |union vocabulary|."""
    from presto_truffle_spark.operators.corpus_ops import (
        corpus_vocab_turnover,
    )
    from presto_truffle_spark.catalog import load_table

    rows = corpus_vocab_turnover(spark, sf_dir).collect()
    total_new = sum(r["n_new"] for r in rows)
    total_ret = sum(r["n_retiring"] for r in rows)
    vocab = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .distinct()
        .count()
    )
    assert total_new == vocab
    assert total_ret == vocab
