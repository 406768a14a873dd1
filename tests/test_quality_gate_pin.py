"""CI pins for the measured quality-gate decision quality (VERDICT r12
#1 measured it; VERDICT r13 #1 promoted the winner into the registered
op — these pins now guard the REGISTERED gate, not a study twin).

tools/quality_gate_study.py measures, on the labeled rich fixture
(2000 docs, seed 12; per-doc latent tier from
``rich_fixture.document_quality_labels``):

  * ``corpus_ccnet_quality_buckets`` / ``ccnet_doc_buckets`` (the
    registered op — JM-bigram-scored, integer micro-nat discipline,
    bucketed-rank tertiles): head→tier0 precision 0.740 (lift 2.26),
    tail→tier2 0.777 (lift 2.42), 1/642 tier-2 docs leak into head.
  * The RETIRED r4–r13 unigram scorer (study-side float replica):
    head 0.429 / tail 0.444 — the measured order-delta that justified
    the promotion; pinned so the comparison stays honest.
  * Float bigram twin with EXACT-percentile tertiles: head 0.739 /
    tail 0.781 — the integer + grid discipline costs nothing.
  * corpus_quality_calibrated (TTR gate): kept-rate per tier
    0.499/0.531/0.484 — does NOT separate tiers here (negative result,
    recorded in BASELINE.md, not pinned).

These pins keep the measured numbers from silently regressing (the
test_dedup_recall_pin.py / test_bucket_resolution_pin.py pattern): a
ccnet scoring change that costs gate precision, or an LM edit that
flattens the bigram advantage, fails here. Hash-deterministic
generation makes the numbers replays, not samples.
"""

from __future__ import annotations

import pytest

from tools.quality_gate_study import (
    bigram_doc_tertiles,
    confusion,
    head_tail_stats,
    materialize_labeled_fixture,
    unigram_doc_tertiles,
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


def test_registered_gate_precision(spark, labeled):
    """The VERDICT r13 #1 'done' criterion: the REGISTERED op scores
    with the bigram LM and its precision is pinned >= 0.70 head/tail
    (measured 0.740/0.777 at 2000 docs, seed 12)."""
    from presto_truffle_spark.operators.text import ccnet_doc_buckets

    out, labels, base = labeled
    conf = confusion(
        ccnet_doc_buckets(spark, out).join(labels, "doc_id"), "bucket"
    )
    stats = head_tail_stats(conf, base)
    assert stats["head_tier0_precision"] >= 0.70, (
        f"registered head precision {stats['head_tier0_precision']} "
        "< 0.70 (measured 0.740) — scoring regression"
    )
    assert stats["tail_tier2_precision"] >= 0.70, (
        f"registered tail precision {stats['tail_tier2_precision']} "
        "< 0.70 (measured 0.777) — scoring regression"
    )
    assert stats["tier2_leaked_into_head"] <= 10, (
        f"{stats['tier2_leaked_into_head']} tier-2 docs in head bucket "
        "(measured 1) — the gate stopped rejecting noisy docs"
    )


def test_retired_unigram_delta_preserved(spark, labeled):
    """The retired unigram scorer stays measurably WORSE than the
    registered bigram gate — if this delta flattens, either the
    fixture's Markov-link tiers degenerated or the study twin drifted;
    both invalidate the promotion rationale."""
    out, labels, base = labeled
    conf = confusion(
        unigram_doc_tertiles(spark, out).join(labels, "doc_id"), "bucket"
    )
    stats = head_tail_stats(conf, base)
    assert 1.2 <= stats["head_tier0_lift"] <= 1.6, (
        f"unigram head lift {stats['head_tier0_lift']} left [1.2, 1.6] "
        "(measured 1.31)"
    )
    assert stats["head_tier0_precision"] <= 0.55, (
        f"unigram head precision {stats['head_tier0_precision']} > 0.55 "
        "(measured 0.429) — the order-delta story changed; re-measure"
    )


def test_stopword_gate_non_degenerate(spark, labeled):
    """VERDICT r13 #6 'done' criterion: with the corpus-derived
    stopword head (r14), text_quality_score produces a non-degenerate
    pass/fail split on the rich fixture — through r13 the fixed
    English list failed EVERY w###-token doc (n_passing == 0)."""
    from pyspark.sql import functions as F

    from presto_truffle_spark.operators.text import text_quality_score

    out, labels, base = labeled
    qs = text_quality_score(spark, out)
    n_pass = qs.agg(F.sum("passes_quality")).collect()[0][0]
    n_docs = sum(base)
    assert 0 < n_pass < n_docs, (
        f"degenerate gate: {n_pass}/{n_docs} pass"
    )
    # The stopword ratio itself must spread (not all-zero / all-one).
    spread = qs.agg(
        F.min("stopword_ratio"), F.max("stopword_ratio")
    ).collect()[0]
    assert spread[1] > spread[0] >= 0.0, spread


def test_bigram_float_twin_parity(spark, labeled):
    """The float/exact-percentile bigram twin matches the registered
    integer-disciplined op's decision quality — the micro-nat freeze
    and the bucketed-rank grid must not cost precision."""
    out, labels, base = labeled
    conf = confusion(
        bigram_doc_tertiles(spark, out).join(labels, "doc_id"), "bucket"
    )
    stats = head_tail_stats(conf, base)
    assert stats["head_tier0_precision"] >= 0.70, (
        f"bigram twin head precision {stats['head_tier0_precision']} "
        "< 0.70 (measured 0.739)"
    )
    assert stats["tail_tier2_precision"] >= 0.70, (
        f"bigram twin tail precision {stats['tail_tier2_precision']} "
        "< 0.70 (measured 0.781)"
    )
    assert stats["tier2_leaked_into_head"] <= 10, (
        f"{stats['tier2_leaked_into_head']} tier-2 docs in head bucket "
        "(measured 3)"
    )
