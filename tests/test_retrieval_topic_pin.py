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
