"""Exact-vs-probabilistic candidate generation study: prefix filtering
(dedup_prefix_filter_join) against MinHash-LSH bands
(dedup_minhash_lsh) on the same Jaccard>=0.5 task.

The two candidate generators answer the same question with opposite
guarantees — prefix filtering is LOSSLESS (its oracle is brute force;
any dropped qualifying pair would hash-mismatch) while LSH trades
recall for bucket-bounded work — so the decision between them at 100 TB
is an empirical tradeoff: candidates generated per qualifying pair, and
pairs missed. This tool measures both on the fixture at both SFs and
prints one JSON line per SF:

  * naive_pairs     — the shared-token pair space (what no candidate
                      scheme may exceed);
  * prefix_candidates / lsh_candidates — work each scheme feeds the
                      verifier;
  * qualifying      — true Jaccard>=0.5 pairs (brute force);
  * prefix_recall / lsh_recall — fraction of qualifying pairs that
                      survive each scheme's candidate stage (prefix is
                      1.0 by theorem; measured anyway).

Usage: python tools/prefix_filter_study.py [sf_dir ...]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window as W
from pyspark.sql import functions as F


def study(spark, sf_dir: str) -> dict:
    import duckdb

    from presto_truffle_spark.operators.dedup import (
        _JACCARD_THRESHOLD,
        _SHINGLE,
        _lsh_tables,
        minhash_candidates,
    )

    t = _JACCARD_THRESHOLD
    sh = _lsh_tables(spark, sf_dir)["sh"]
    toks = sh.select("doc_id", F.explode("shingles").alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        toks.join(freq, "tok")
        .withColumn("sz", F.count(F.lit(1)).over(W.partitionBy("doc_id")))
        .withColumn(
            "rn",
            F.row_number().over(W.partitionBy("doc_id").orderBy("df", "tok")),
        )
    )
    prefix = ranked.filter(
        F.col("rn") <= F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1
    ).select("doc_id", "tok", "sz")
    a, b = prefix.alias("a"), prefix.alias("b")
    prefix_cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(
            F.least(F.col("a.sz"), F.col("b.sz"))
            >= F.lit(t) * F.greatest(F.col("a.sz"), F.col("b.sz"))
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    lsh_cand = minhash_candidates(spark, sf_dir)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    truth = con.execute(
        f"""
        WITH sh AS (
            SELECT doc_id,
                   list_transform(
                       list_distinct(list_transform(
                           generate_series(1, len(string_split(text, ' ')) - {_SHINGLE - 1}),
                           i -> string_split(text, ' ')[i] || ' ' ||
                                string_split(text, ' ')[i+1] || ' ' ||
                                string_split(text, ' ')[i+2])),
                       x -> substr(md5(x), 1, 16)) AS shingles
            FROM documents
            WHERE len(string_split(text, ' ')) >= {_SHINGLE}
        ), toks AS (SELECT doc_id, unnest(shingles) AS tok FROM sh),
        sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id d1, b.doc_id d2, count(*) AS i
            FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT d1, d2 FROM inter
        JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE i * 1.0 / (s1.sz + s2.sz - i) >= {t}
        """
    ).fetchall()
    naive_pairs = con.execute(
        f"""
        WITH sh AS (
            SELECT doc_id,
                   list_transform(
                       list_distinct(list_transform(
                           generate_series(1, len(string_split(text, ' ')) - {_SHINGLE - 1}),
                           i -> string_split(text, ' ')[i] || ' ' ||
                                string_split(text, ' ')[i+1] || ' ' ||
                                string_split(text, ' ')[i+2])),
                       x -> substr(md5(x), 1, 16)) AS shingles
            FROM documents
            WHERE len(string_split(text, ' ')) >= {_SHINGLE}
        ), toks AS (SELECT doc_id, unnest(shingles) AS tok FROM sh)
        SELECT count(*) FROM (
            SELECT DISTINCT a.doc_id, b.doc_id
            FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id)
        """
    ).fetchone()[0]

    truth_set = {(r[0], r[1]) for r in truth}
    p_set = {(r.doc_a, r.doc_b) for r in prefix_cand.collect()}
    l_set = {(r.doc_a, r.doc_b) for r in lsh_cand.collect()}
    return {
        "sf_dir": sf_dir,
        "naive_pairs": naive_pairs,
        "qualifying": len(truth_set),
        "prefix_candidates": len(p_set),
        "lsh_candidates": len(l_set),
        "prefix_recall": round(
            len(truth_set & p_set) / len(truth_set), 4
        )
        if truth_set
        else None,
        "lsh_recall": round(len(truth_set & l_set) / len(truth_set), 4)
        if truth_set
        else None,
    }


def main() -> int:
    from presto_truffle_spark.session import get_spark

    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("prefix_filter_study", cpus="8")
    for d in dirs:
        print(json.dumps(study(spark, d)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
