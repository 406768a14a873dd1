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

K1, B, TOPK, FUSE_DEPTH = 1.2, 0.75, 10, 50


def bm25_topk(spark, sf_dir: str, qmod: int = 100, qlen: int = 9,
              depth: int = TOPK):
    """(qid, doc_id, rank) — BM25 top-`depth` per query, query doc
    excluded. One postings pass joined against the broadcast
    query-term table."""
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
            F.explode(F.slice(F.split("text", " "), 1, qlen)).alias("term"),
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
        .filter(F.col("rank") <= depth)
    )


def dense_topk(spark, emb, qmod: int = 100, depth: int = TOPK):
    """(qid, doc_id, rank) — cosine top-K per query over the
    topic-aligned embeddings, query vector excluded."""
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") % qmod == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(
            F.zip_with(col, col, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("doc_id"),
            (dot / (norm("qv") * norm("v"))).alias("score"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.select("qid", "doc_id", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= depth)
    )


def rrf_topk(spark, lists, k_rrf: int = 60):
    """Reciprocal-rank fusion of (qid, doc_id, rank) lists → fused
    top-K. Standard RRF: score = Σ 1/(k + rank) over the lists a doc
    appears in."""
    u = lists[0]
    for other in lists[1:]:
        u = u.unionByName(other)
    fused = u.groupBy("qid", "doc_id").agg(
        F.sum(1.0 / (F.lit(k_rrf) + F.col("rank"))).alias("score")
    )
    w = W.partitionBy("qid").orderBy(F.col("score").desc(), "doc_id")
    return (
        fused.select("qid", "doc_id", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= TOPK)
    )


def _p_at_k(topk, labels):
    lab_q = labels.select(
        F.col("doc_id").alias("qid"), F.col("topic").alias("q_topic")
    )
    lab_c = labels.select("doc_id", F.col("topic").alias("c_topic"))
    per_q = (
        topk.join(F.broadcast(lab_q), "qid")
        .join(F.broadcast(lab_c), "doc_id")
        .groupBy("qid")
        .agg(
            (
                F.sum((F.col("q_topic") == F.col("c_topic")).cast("int"))
                / F.lit(TOPK)
            ).alias("p_at_k")
        )
        .collect()
    )
    vals = [r.p_at_k for r in per_q]
    return sum(vals) / len(vals), min(vals)


def study(spark, sf_dir: str, labels, emb=None) -> dict:
    # deeper retrieval lists feed the fusion; P@10 reads the top-10 slice
    bm = bm25_topk(spark, sf_dir)
    p10, pmin = _p_at_k(bm.filter(F.col("rank") <= TOPK), labels)
    # random baseline: mean over queries of (same-topic docs - 1)/(N - 1)
    sizes = {
        r.topic: r["count"]
        for r in labels.groupBy("topic").count().collect()
    }
    n = sum(sizes.values())
    qs = labels.filter(F.col("doc_id") % 100 == 0).collect()
    base = sum((sizes[r.topic] - 1) / (n - 1) for r in qs) / len(qs)
    out = {
        "n_docs": n,
        "n_queries": len(qs),
        "k": TOPK,
        "bm25_precision_at_10": round(p10, 4),
        "random_baseline": round(base, 4),
        "lift": round(p10 / base, 2),
        "per_query_min": round(pmin, 4),
    }
    if emb is not None:
        # Hybrid COMPLEMENTARITY section — both retrievers deliberately
        # imperfect (6-token queries; noise-2200 embeddings) and the
        # fusion fed DEEP (top-50) lists, evaluated @10: RRF only helps
        # when the lists reach past the evaluation cut (fusing two
        # top-10 lists can only reshuffle them).
        bm_w = bm25_topk(spark, sf_dir, qlen=6, depth=FUSE_DEPTH)
        de = dense_topk(spark, emb, depth=FUSE_DEPTH)
        bp10, _ = _p_at_k(bm_w.filter(F.col("rank") <= TOPK), labels)
        dp10, dmin = _p_at_k(de.filter(F.col("rank") <= TOPK), labels)
        hy = rrf_topk(spark, [bm_w, de])
        hp10, hmin = _p_at_k(hy, labels)
        out["hybrid_section"] = {
            "bm25_qlen6_p10": round(bp10, 4),
            "dense_noise2200_p10": round(dp10, 4),
            "hybrid_rrf_p10": round(hp10, 4),
            "hybrid_per_query_min": round(hmin, 4),
            "fuse_depth": FUSE_DEPTH,
        }
    return out


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
    from presto_truffle_spark.sources.rich_fixture import (
        topic_aligned_embeddings,
    )

    emb = topic_aligned_embeddings(
        spark, n_docs, seed=seed, noise_milli=2200
    ).cache()
    print(
        json.dumps(
            {"sf_dir": out, "seed": seed, **study(spark, out, labels, emb)}
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
