"""CI pin for measured lexical-retrieval decision quality (r13).

tools/retrieval_topic_study.py measures BM25 topic recovery on the
labeled rich fixture (2000 docs, seed 12, 20 queries of 9 tokens each):
precision@10 = 0.925 against topic ground truth vs a 0.126 random
baseline (lift 7.3; hardest query 0.40 — a high-noise-tier doc). The
per-topic affine Zipf permutation is the structure being recovered; a
tokenization/scoring regression that breaks term matching or the idf/
saturation arithmetic collapses the lift. Hash-deterministic replay.
"""

from __future__ import annotations

import os

import pytest

from tools.retrieval_topic_study import study

N_DOCS, SEED = 2000, 12


@pytest.fixture(scope="module")
def labeled_dir(spark, tmp_path_factory):
    import pyarrow.parquet as pq

    from presto_truffle_spark.sources.rich_fixture import (
        document_quality_labels,
        zipf_documents,
    )

    out = str(tmp_path_factory.mktemp("retrieval_fixture"))
    pq.write_table(
        zipf_documents(spark, N_DOCS, seed=SEED).toArrow(),
        os.path.join(out, "documents.parquet"),
    )
    labels = document_quality_labels(spark, N_DOCS, seed=SEED).cache()
    return out, labels


def test_bm25_topic_precision_pin(spark, labeled_dir):
    out, labels = labeled_dir
    r = study(spark, out, labels)
    assert r["n_queries"] == 20
    assert r["bm25_precision_at_10"] >= 0.85, r
    assert r["lift"] >= 5.0, r
    assert r["per_query_min"] >= 0.3, r


def test_hybrid_rrf_complementarity_pin(spark, labeled_dir):
    """Hybrid complementarity, measured (r13): with BOTH retrievers
    deliberately imperfect (6-token lexical queries P@10 0.835;
    noise-2200 topic-aligned embeddings P@10 0.795) and top-50 lists
    fused, RRF@10 reaches 0.885 — strictly above both singles. The
    pin keeps the fusion genuinely helping: a regression that lets
    either retriever dominate or breaks the rank fusion shows up as
    hybrid <= max(singles)."""
    from tools.retrieval_topic_study import (
        FUSE_DEPTH,
        _p_at_k,
        bm25_topk,
        dense_topk,
        rrf_topk,
    )

    from presto_truffle_spark.sources.rich_fixture import (
        topic_aligned_embeddings,
    )
    from pyspark.sql import functions as F

    out, labels = labeled_dir
    emb = topic_aligned_embeddings(spark, N_DOCS, seed=SEED, noise_milli=2200)
    bm = bm25_topk(spark, out, qlen=6, depth=FUSE_DEPTH)
    de = dense_topk(spark, emb, depth=FUSE_DEPTH)
    bp, _ = _p_at_k(bm.filter(F.col("rank") <= 10), labels)
    dp, _ = _p_at_k(de.filter(F.col("rank") <= 10), labels)
    hp, _ = _p_at_k(rrf_topk(spark, [bm, de]), labels)
    assert 0.70 <= bp <= 0.95, bp  # the "imperfect" regime must hold
    assert 0.65 <= dp <= 0.95, dp
    assert hp > max(bp, dp) + 0.02, (bp, dp, hp)
    assert hp >= 0.85, hp  # measured 0.885
