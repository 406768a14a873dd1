"""CI pins for the measured quality-gate decision quality (VERDICT r12 #1).

tools/quality_gate_study.py measures, on the labeled rich fixture
(2000 docs, seed 12; per-doc latent tier from
``rich_fixture.document_quality_labels``):

  * ccnet unigram tertiles: head→tier0 precision 0.431 (lift 1.32),
    tail→tier2 0.443 (lift 1.38) — real but modest; the unigram LM
    only sees the marginal token distribution, not the Markov links
    the tiers actually break.
  * bigram-scored tertiles (study-side, same JM mixture as
    text_bigram_lm_perplexity): head→tier0 precision 0.739 (lift
    2.26), tail→tier2 0.781 (lift 2.43), only 3/667 tier-2 docs leak
    into head — the LM-order ladder translated into gate decision
    quality.
  * corpus_quality_calibrated (TTR gate): kept-rate per tier
    0.499/0.531/0.484 — does NOT separate tiers here (negative result,
    recorded in BASELINE.md, not pinned).

These pins keep the measured numbers from silently regressing (the
test_dedup_recall_pin.py / test_bucket_resolution_pin.py pattern):
a ccnet scoring change that costs gate precision, or an LM edit that
flattens the bigram advantage, fails here. Exact-percentile tertiles +
hash-deterministic generation make the numbers replays, not samples.
"""

from __future__ import annotations

import pytest

from tools.quality_gate_study import (
    bigram_doc_tertiles,
    confusion,
    head_tail_stats,
    materialize_labeled_fixture,
)

N_DOCS, SEED = 2000, 12


@pytest.fixture(scope="module")
def labeled(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("quality_fixture"))
    labels = materialize_labeled_fixture(spark, out, N_DOCS, SEED).cache()
    base = [
        r["count"]
        for r in labels.groupBy("tier").count().orderBy("tier").collect()
    ]
    assert base == [654, 704, 642], (
        f"tier sizes changed: {base} — rich_fixture generation changed; "
        "re-run tools/quality_gate_study.py and re-pin (BASELINE.md r13)"
    )
    return out, labels, base


def test_ccnet_unigram_gate_precision(spark, labeled):
    from presto_truffle_spark.operators.text import ccnet_doc_buckets

    out, labels, base = labeled
    conf = confusion(
        ccnet_doc_buckets(spark, out).join(labels, "doc_id"), "bucket"
    )
    stats = head_tail_stats(conf, base)
    assert stats["head_tier0_lift"] >= 1.2, (
        f"unigram ccnet head lift {stats['head_tier0_lift']} < 1.2 "
        "(measured 1.32) — scoring regression"
    )
    assert stats["tail_tier2_lift"] >= 1.25, (
        f"unigram ccnet tail lift {stats['tail_tier2_lift']} < 1.25 "
        "(measured 1.38) — scoring regression"
    )


def test_bigram_scored_gate_precision(spark, labeled):
    out, labels, base = labeled
    conf = confusion(
        bigram_doc_tertiles(spark, out).join(labels, "doc_id"), "bucket"
    )
    stats = head_tail_stats(conf, base)
    assert stats["head_tier0_precision"] >= 0.70, (
        f"bigram head precision {stats['head_tier0_precision']} < 0.70 "
        "(measured 0.739)"
    )
    assert stats["tail_tier2_precision"] >= 0.70, (
        f"bigram tail precision {stats['tail_tier2_precision']} < 0.70 "
        "(measured 0.781)"
    )
    assert stats["tier2_leaked_into_head"] <= 10, (
        f"{stats['tier2_leaked_into_head']} tier-2 docs in head bucket "
        "(measured 3) — the gate stopped rejecting noisy docs"
    )
