"""Seeded RICH fixture generator: Zipfian Markov text + clustered embeddings.

VERDICT r11 #4: the driver's synthetic corpus has near-random token
order and isotropic embeddings, which FLOOR-BOUNDS several quality
studies — PQ/IVF recall ≈ fraction-probed, JSD ≈ sampling noise,
higher-order LMs indistinguishable from unigram. This module generates
a structurally rich variant with the SAME schemas as
/root/testdata/sf*/documents.parquet and embeddings.parquet, so every
registered query runs on it unchanged:

* ``zipf_documents``: vocabulary of V tokens whose per-topic frequency
  follows a Zipf(≈1) law (closed-form inverse CDF: rank =
  floor(exp(u·ln(V+1))) for u ~ U[0,1)), emitted as TRIPLES with a
  deterministic Markov structure — within a topic, token B is a fixed
  function of A and C a fixed function of (A, B) except with a
  per-quality-tier NOISE rate that replaces them with independent
  draws. Consequences, by construction: a bigram LM beats unigram, a
  trigram LM beats bigram, quality tiers separate in held-out
  perplexity (CCNet bucketing becomes a real discriminator), and each
  topic permutes WHICH tokens are frequent, so per-source JSD measures
  composition, not noise.
* ``clustered_embeddings``: a seeded Gaussian-mixture stand-in — K
  unit-scale centers, per-vector noise at 0.25 amplitude — so
  IVF/PQ/LSH recall reflects cluster structure instead of the
  isotropic floor. ``label`` = the true mixture component.

Everything is derived from Spark's murmur3 ``hash()`` over (seed, id,
tag) — no rand(), replayable at any parallelism, generated ON THE
EXECUTORS via spark.range (no driver loops; scales to any row count).

This is a FIXTURE GENERATOR, not a registered query: tools/
make_rich_fixture.py materializes parquet for studies and selfcheck
runs; BASELINE.md records the study deltas vs the isotropic fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = 512  # token types: 'w000'..'w511'
N_TOPICS = 8
N_SOURCES = 20
# quality tiers: noise % of Markov links broken (independent redraw).
TIER_NOISE = (5, 20, 45)
EMB_DIM = 64
EMB_CLUSTERS = 16


def _u01(*cols) -> F.Column:
    """Deterministic U[0,1) from a murmur3 hash of the inputs."""
    return F.pmod(F.hash(*cols), F.lit(1 << 20)) / F.lit(float(1 << 20))


def _zipf_rank(u: F.Column) -> F.Column:
    """Inverse-CDF Zipf(s=1) rank in [1, VOCAB]: P(rank <= r) ~ ln r."""
    import math

    r = F.floor(F.exp(u * F.lit(math.log(VOCAB + 1.0))))
    return F.least(F.lit(VOCAB), F.greatest(F.lit(1), r)).cast("long")


def _tok(idx: F.Column) -> F.Column:
    return F.concat(F.lit("w"), F.lpad(idx.cast("string"), 3, "0"))


def _doc_lineage(
    spark: SparkSession, n_docs: int, seed: int, replica_pct: int
) -> DataFrame:
    """(doc_id, is_rep, src): which docs are replicas and whose streams
    their generation keys off. Shared by ``zipf_documents`` (the text
    itself) and ``document_quality_labels`` (the ground truth), so the
    label column can never drift from what the generator actually did."""
    d = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    s = F.lit(seed)

    def raw_rep(col):
        return (
            F.pmod(F.hash(s, col, F.lit("rep")), F.lit(100))
            < F.lit(replica_pct)
        ) & (col > 0)

    src_cand = F.greatest(
        F.lit(0),
        F.col("doc_id")
        - (F.pmod(F.hash(s, F.col("doc_id"), F.lit("rd")), F.lit(20)) + 1),
    )
    is_rep = raw_rep(F.col("doc_id")) & ~raw_rep(src_cand)
    src = F.when(is_rep, src_cand).otherwise(F.col("doc_id"))
    return d.select("doc_id", is_rep.alias("is_rep"), src.alias("src"))


def document_quality_labels(
    spark: SparkSession,
    n_docs: int,
    seed: int = 12,
    replica_pct: int = 0,
) -> DataFrame:
    """Ground-truth labels for the rich fixture (VERDICT r12 #1):
    (doc_id, tier, noise_pct, is_rep, src_doc_id).

    ``tier`` is the LATENT quality class the generator drew the doc's
    text from — 0/1/2 with 5/20/45% of Markov links broken
    (``TIER_NOISE``) — re-derived from the exact hash stream
    ``zipf_documents`` uses (same ``_doc_lineage``, same
    ``hash(seed, src, 'tier')``), so this IS what the generator did,
    not a reconstruction. ``is_rep``/``src_doc_id`` expose the
    near-dup lineage as labeled truth for dedup studies (a replica's
    truth partner is its src doc).

    This is a SIDE TABLE, deliberately not a column on documents: the
    documents schema must stay byte-compatible with the driver fixture
    so every registered query runs on the rich fixture unchanged.
    Measured-decision-quality studies join it on doc_id
    (tools/quality_gate_study.py; pinned in
    tests/test_quality_gate_pin.py)."""
    d = _doc_lineage(spark, n_docs, seed, replica_pct)
    s = F.lit(seed)
    tier = F.pmod(F.hash(s, F.col("src"), F.lit("tier")), F.lit(3))
    noise_pct = F.element_at(
        F.array(*[F.lit(p) for p in TIER_NOISE]), (tier + 1).cast("int")
    )
    topic = F.pmod(F.hash(s, F.col("src"), F.lit("topic")), F.lit(N_TOPICS))
    return d.select(
        "doc_id",
        tier.cast("int").alias("tier"),
        noise_pct.cast("int").alias("noise_pct"),
        F.col("is_rep").cast("boolean").alias("is_rep"),
        F.col("src").alias("src_doc_id"),
        topic.cast("int").alias("topic"),
    )


def zipf_documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = 12,
    replica_pct: int = 0,
    mut_pct: int = 5,
) -> DataFrame:
    """documents-schema DataFrame (doc_id, text, lang, source, n_chars)
    with Zipfian vocabulary, per-topic Markov triples, quality tiers.

    ``replica_pct`` > 0 turns ~that percentage of docs into NEAR-DUP
    replicas: the doc's entire generation keys off a nearby SOURCE doc
    (same topic/length/noise stream — a byte-identical copy), except
    each triple's head token is independently re-drawn with
    ``mut_pct``% probability keyed on the REPLICA id, and the Markov
    links then propagate the edit through that triple — the localized-
    edit near-duplicate a MinHash/SNM study needs ground truth for
    (the default fixture has NO structured near-dups; probed r12:
    MinHash truth = 0 pairs). Replicas keep their own source/lang
    labels off the source doc so cluster structure is preserved.

    Chain purity (ADVICE r12): a doc only BECOMES a replica if its
    sampled source is itself a NON-replica — otherwise the replica's
    text would key off the intermediate doc_id's streams while that
    doc's own text came from a different src, making it a near-dup of
    no materialized doc (silently polluting dedup ground truth). The
    rep flag of the candidate src is re-derived with the same hash, so
    the skip is deterministic and one-hop exact: every emitted
    replica's src doc is materialized from its own streams."""
    d = _doc_lineage(spark, n_docs, seed, replica_pct)
    s = F.lit(seed)
    topic = F.pmod(F.hash(s, F.col("src"), F.lit("topic")), F.lit(N_TOPICS))
    tier = F.pmod(F.hash(s, F.col("src"), F.lit("tier")), F.lit(3))
    noise_pct = F.element_at(
        F.array(*[F.lit(p) for p in TIER_NOISE]), (tier + 1).cast("int")
    )
    n_tri = (
        F.pmod(F.hash(s, F.col("src"), F.lit("len")), F.lit(40)) + 10
    ).cast("int")

    d = d.select(
        "doc_id",
        "is_rep",
        "src",
        topic.alias("topic"),
        noise_pct.alias("noise_pct"),
        n_tri.alias("n_tri"),
    )

    doc, tpc, npct = F.col("src"), F.col("topic"), F.col("noise_pct")

    def head_idx(g):
        # per-topic affine permutation of the Zipf rank: every topic is
        # Zipfian but over a DIFFERENT frequent set (JSD signal).
        rank = _zipf_rank(_u01(s, doc, g, F.lit("a")))
        return F.pmod(rank * (tpc * 2 + 7) + tpc * 13, F.lit(VOCAB))

    def indep_idx(g, tag, key=None):
        rank = _zipf_rank(_u01(s, key if key is not None else doc, g, F.lit(tag)))
        return F.pmod(rank * (tpc * 2 + 7) + tpc * 13, F.lit(VOCAB))

    def triple(g):
        mutated = (
            F.col("is_rep")
            & (
                F.pmod(
                    F.hash(s, F.col("doc_id"), g, F.lit("mut")), F.lit(100)
                )
                < F.lit(mut_pct)
            )
        )
        a = F.when(
            mutated, indep_idx(g, "ma", key=F.col("doc_id"))
        ).otherwise(head_idx(g))
        noisy_b = F.pmod(F.hash(s, doc, g, F.lit("nb")), F.lit(100)) < npct
        noisy_c = F.pmod(F.hash(s, doc, g, F.lit("nc")), F.lit(100)) < npct
        b = F.when(noisy_b, indep_idx(g, "ib")).otherwise(
            F.pmod(a * 31 + tpc * 7 + 3, F.lit(VOCAB))
        )
        c = F.when(noisy_c, indep_idx(g, "ic")).otherwise(
            F.pmod(a * 17 + b * 13 + tpc, F.lit(VOCAB))
        )
        return F.concat_ws(" ", _tok(a), _tok(b), _tok(c))

    text = F.array_join(
        F.transform(F.sequence(F.lit(0), F.col("n_tri") - 1), triple), " "
    )
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
        (F.pmod(tpc, F.lit(3)) + 1).cast("int"),
    )
    source = F.concat(
        F.lit("src"),
        F.pmod(F.hash(s, doc, F.lit("src")), F.lit(N_SOURCES)).cast("string"),
    )
    # Deterministic ingest date, TOPIC-STAGGERED (r15, VERDICT r14 #4):
    # each topic's docs arrive inside a 14-day window whose start is
    # staggered 10 days per topic (windows overlap by 4 days), so the
    # corpus spans ~12 weeks and — because each topic permutes WHICH
    # tokens are frequent — vocabulary genuinely TURNS OVER along the
    # date axis. Purely additive: text/lang/source streams untouched,
    # every pinned study result is unchanged.
    day = F.date_add(
        F.lit("2024-01-01").cast("date"),
        (tpc * 10 + F.pmod(F.hash(s, doc, F.lit("day")), F.lit(14))).cast(
            "int"
        ),
    )
    # `day` is appended LAST so the driver fixture's 5-column prefix
    # (doc_id, text, lang, source, n_chars) is intact positionally.
    return d.select(
        "doc_id",
        text.alias("text"),
        lang.alias("lang"),
        source.alias("source"),
        F.length(text).cast("long").alias("n_chars"),
        day.alias("day"),
    )


def clustered_embeddings(
    spark: SparkSession, n_vecs: int, seed: int = 12
) -> DataFrame:
    """embeddings-schema DataFrame (vec_id, embedding array<float>,
    label int) drawn from a seeded Gaussian-mixture stand-in."""
    d = spark.range(n_vecs).select(F.col("id").alias("vec_id"))
    s = F.lit(seed)
    c = F.pmod(F.hash(s, F.col("vec_id"), F.lit("c")), F.lit(EMB_CLUSTERS))
    emb = _gmm_coords(s, F.col("vec_id"), c, 250)
    return d.select(
        "vec_id", emb.alias("embedding"), c.cast("int").alias("label")
    )


def _gmm_coords(s, vid, c, noise_milli: int):
    """Shared GMM coordinate builder: unit-scale hash centers per
    cluster c + per-vector noise at noise_milli/1000 amplitude."""

    def coord(j):
        ctr = (
            F.pmod(F.hash(s, c, j, F.lit("ctr")), F.lit(2001)) - 1000
        ) / F.lit(1000.0)
        nz = (
            F.pmod(F.hash(s, vid, j, F.lit("nz")), F.lit(2001)) - 1000
        ) / F.lit(1000.0)
        return (ctr + nz * F.lit(noise_milli / 1000.0)).cast("float")

    return F.transform(F.sequence(F.lit(0), F.lit(EMB_DIM - 1)), coord)


def topic_aligned_embeddings(
    spark: SparkSession,
    n_docs: int,
    seed: int = 12,
    replica_pct: int = 0,
    noise_milli: int = 600,
) -> DataFrame:
    """embeddings-schema DataFrame whose vec_id IS a doc_id and whose
    mixture component IS that doc's latent TOPIC — the cross-modal
    ground truth a hybrid (lexical + dense) retrieval study needs:
    with aligned IDs, BM25 over the documents table and cosine over
    this table rank the SAME candidate set against the SAME topical
    relevance labels. The default ``noise_milli`` is deliberately high
    (0.6 vs clustered_embeddings' 0.25): a near-perfect dense retriever
    leaves no headroom to measure hybrid complementarity — the study
    wants an IMPERFECT one, like real embeddings of short documents.
    ``label`` = the topic (same hash stream as
    ``document_quality_labels``)."""
    d = _doc_lineage(spark, n_docs, seed, replica_pct)
    s = F.lit(seed)
    topic = F.pmod(F.hash(s, F.col("src"), F.lit("topic")), F.lit(N_TOPICS))
    emb = _gmm_coords(s, F.col("doc_id"), topic, noise_milli)
    return d.select(
        F.col("doc_id").alias("vec_id"),
        emb.alias("embedding"),
        topic.cast("int").alias("label"),
    )
