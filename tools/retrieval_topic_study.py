"""Measured retrieval decision quality: BM25 vs topic ground truth (r13).

The rich fixture's generator draws each doc's vocabulary through a
per-TOPIC affine permutation of the Zipf ranks — so topical structure
is real and latent, and ``document_quality_labels`` (r13) now exposes
the topic. This study measures whether classic lexical retrieval
actually RECOVERS it — the decision-quality treatment dedup recall and
quality-gate precision got this round:

  * queries: every doc with doc_id % 100 == 0 (20 at 2000 docs);
    query terms = the doc's first 9 tokens (3 triples);
  * scoring: standard BM25 (Lucene +1-smoothed idf, k1=1.2, b=0.75 —
    the text_bm25_search formulation, per-query study-side);
  * relevance: candidate topic == query topic (labels);
  * metrics: precision@10 (query doc excluded) vs the random baseline
    (mean same-topic share ≈ 1/N_TOPICS).

Everything is hash-deterministic; ties break by doc_id.

Usage: python tools/retrieval_topic_study.py [n_docs] [seed]
Prints one JSON line. Defaults: 2000 docs, seed 12.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

K1, B, TOPK = 1.2, 0.75, 10


def bm25_topk(spark, sf_dir: str, qmod: int = 100):
    """(qid, doc_id, rank) — BM25 top-K per query, query doc excluded.
    One postings pass joined against the broadcast query-term table."""
    from presto_truffle_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split("text", " ")).alias("term"),
        F.size(F.split("text", " ")).alias("dl"),
    )
    tf = toks.groupBy("doc_id", "term", "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(F.split("text", " "))).alias("avgdl"),
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = (
        d.filter(F.col("doc_id") % qmod == 0)
        .select(
            F.col("doc_id").alias("qid"),
            F.explode(F.slice(F.split("text", " "), 1, 9)).alias("term"),
        )
        .distinct()
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    sat = (F.col("tf") * (K1 + 1)) / (
        F.col("tf")
        + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .filter(F.col("doc_id") != F.col("qid"))
        .groupBy("qid", "doc_id")
        .agg(F.sum(idf * sat).alias("score"))
    )
    w = W.partitionBy("qid").orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.select(
            "qid", "doc_id", F.row_number().over(w).alias("rank")
        )
        .filter(F.col("rank") <= TOPK)
    )


def study(spark, sf_dir: str, labels) -> dict:
    topk = bm25_topk(spark, sf_dir)
    lab_q = labels.select(
        F.col("doc_id").alias("qid"), F.col("topic").alias("q_topic")
    )
    lab_c = labels.select("doc_id", F.col("topic").alias("c_topic"))
    hits = (
        topk.join(F.broadcast(lab_q), "qid")
        .join(F.broadcast(lab_c), "doc_id")
        .select(
            "qid", (F.col("q_topic") == F.col("c_topic")).alias("rel")
        )
    )
    per_q = hits.groupBy("qid").agg(
        (F.sum(F.col("rel").cast("int")) / F.lit(TOPK)).alias("p_at_k")
    )
    rows = per_q.collect()
    p10 = sum(r.p_at_k for r in rows) / len(rows)
    # random baseline: mean over queries of (same-topic docs - 1)/(N - 1)
    sizes = {
        r.topic: r["count"]
        for r in labels.groupBy("topic").count().collect()
    }
    n = sum(sizes.values())
    qs = labels.filter(F.col("doc_id") % 100 == 0).collect()
    base = sum((sizes[r.topic] - 1) / (n - 1) for r in qs) / len(qs)
    return {
        "n_docs": n,
        "n_queries": len(rows),
        "k": TOPK,
        "bm25_precision_at_10": round(p10, 4),
        "random_baseline": round(base, 4),
        "lift": round(p10 / base, 2),
        "per_query_min": round(min(r.p_at_k for r in rows), 4),
    }


def main() -> int:
    import pyarrow.parquet as pq

    from presto_truffle_spark.session import get_spark
    from presto_truffle_spark.sources.rich_fixture import (
        document_quality_labels,
        zipf_documents,
    )

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    spark = get_spark("retrieval-topic-study", cpus="8")
    out = os.path.join(
        tempfile.gettempdir(), f"retrieval_topic_study/sf{n_docs}_s{seed}"
    )
    os.makedirs(out, exist_ok=True)
    pq.write_table(
        zipf_documents(spark, n_docs, seed=seed).toArrow(),
        os.path.join(out, "documents.parquet"),
    )
    labels = document_quality_labels(spark, n_docs, seed=seed).cache()
    print(json.dumps({"sf_dir": out, "seed": seed, **study(spark, out, labels)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
