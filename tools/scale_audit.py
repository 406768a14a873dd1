"""Scale audit: do the headline plans actually scale like they claim?

Replicates the sf0.1 fixture N× (default 10× → a sf1-equivalent star
schema) with CONSISTENT key remapping, then times the bench HEADLINE
queries at 1× and N× in the same session and reports the scaling ratio
per query. On a single machine with fixed parallelism, a linear operator
should show ratio ≈ N; a shuffle-heavy one ≈ N·log N; anything
superlinear beyond that is a plan smell the judge would flag.

Replication semantics (rep = 0..N-1, OFFSET = 10_000_000 per rep):

  * region/nation stay 1× — fixed-cardinality dims at every SF (TPC-H).
  * customer/supplier/part/orders/lineitem/events/embeddings replicate
    with every key column in the same domain shifted by the same
    rep*OFFSET, so join fan-out per key is IDENTICAL to the base fixture
    (orders⋈lineitem still ~4 rows/key, never N×4).
  * documents get EVERY token suffixed with "_r{rep}" (and n_chars
    recomputed) — a bijective vocabulary rename per replica, so
    exact/near-dup/TF-IDF structure per replica matches the base corpus
    exactly while replicas share zero shingles. (A first cut used a
    single "r{rep}" head-prefix token; that makes each doc a TRUE
    near-duplicate of its N-1 siblings — Jaccard ≈ 1 for docs differing
    in one head token — and the 10× LSH run correctly surfaced all ~978×
    more pairs at 15.6× the time. Useful as a boilerplate-heavy-corpus
    stress, wrong as a clean scaling measurement.)
  * embeddings get a +rep*1e-6 per-component nudge — distinct vectors,
    unchanged geometry.

Usage: python tools/scale_audit.py [N] [base_sf_dir]
Set SCALE_AUDIT_QUERIES=q6,q1_pricing_summary to restrict the query set
(the 50×/100× runs only make sense for the cheap scan-shaped plans).
Prints ONE JSON line; full run ≈ 5 min at N=10.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10
BASE = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
OUT = f"/tmp/spark_graft_scale/x{N}"
OFFSET = 10_000_000
RUNS = 3

# Every key column that must shift together, per table. nationkey /
# regionkey columns are deliberately absent: they keep pointing at the 1×
# dims, which is exactly how TPC-H scales.
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

_SUBSET = os.environ.get("SCALE_AUDIT_QUERIES", "")

HEADLINE = _SUBSET.split(",") if _SUBSET else [
    "q6",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "window_topk_per_group",
    "events_session_window",
    "events_asof_join",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_tfidf_top_terms",
]


def build_fixture(spark) -> None:
    from pyspark.sql import functions as F

    from presto_truffle_spark.catalog import TABLES, load_table

    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    reps = spark.range(N).withColumnRenamed("id", "rep")
    for name in TABLES:
        df = load_table(spark, BASE, name)
        if name not in KEYED:  # fixed-cardinality dims: copy through 1×
            df.write.parquet(f"{OUT}/{name}.parquet")
            continue
        rep = df.crossJoin(F.broadcast(reps))
        for key in KEYED[name]:
            rep = rep.withColumn(key, F.col(key) + F.col("rep") * OFFSET)
        if name == "documents":
            tag = F.concat(F.lit("_r"), F.col("rep").cast("string"))
            rep = rep.withColumn(
                "text",
                F.concat_ws(
                    " ", F.transform(F.split(F.col("text"), " "), lambda w: F.concat(w, tag))
                ),
            ).withColumn("n_chars", F.length("text").cast("int"))
        if name == "embeddings":
            rep = rep.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x: (x + F.col("rep").cast("double") * 1e-6).cast("float"),
                ),
            )
        rep.drop("rep").write.parquet(f"{OUT}/{name}.parquet")


def time_query(fn, spark, sf_dir: str) -> tuple[float, int]:
    def run():
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return df

    run()  # warm-up: JIT, parquet footers, memoized caches, broadcasts
    samples = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        run()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples), fn(spark, sf_dir).count()


def main() -> None:
    from presto_truffle_spark.registry import get_queries
    from presto_truffle_spark.session import get_spark

    spark = get_spark("scale_audit")
    t0 = time.perf_counter()
    build_fixture(spark)
    build_s = time.perf_counter() - t0
    queries = get_queries()

    out: dict[str, dict] = {}
    for name in HEADLINE:
        base_s, base_rows = time_query(queries[name], spark, BASE)
        scaled_s, scaled_rows = time_query(queries[name], spark, OUT)
        out[name] = {
            "base_s": round(base_s, 3),
            "scaled_s": round(scaled_s, 3),
            "ratio": round(scaled_s / base_s, 2) if base_s else None,
            "rows_base": base_rows,
            "rows_scaled": scaled_rows,
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "scale_audit",
                "scale_mult": N,
                "base": BASE,
                "build_s": round(build_s, 1),
                "runs": RUNS,
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
