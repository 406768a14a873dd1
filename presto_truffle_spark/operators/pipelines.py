"""Composed end-to-end pipelines — operators chained the way a real
training-data prep job chains them. Each stage is an operator from the
other modules; the point here is that the COMPOSITIONS are themselves
differentially tested (one CTE-chain oracle per pipeline).

Scale shape of the corpus-prep pipeline: filter (map) → quality gate (map)
→ exact dedup (one digest shuffle) → near-dup pair removal (LSH shuffles)
→ stats (one aggregate shuffle). Five stages, four shuffles, zero
collects — a 100 TB corpus flows through without ever materializing on
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from presto_truffle_spark.catalog import load_table
from presto_truffle_spark.operators.dedup import dedup_minhash_lsh
from presto_truffle_spark.registry import ORACLES, query

_STOP_SQL = "'the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'"
_MINHASH_PAIRS_SQL = ORACLES["dedup_minhash_lsh"]


@query(
    "pipeline_corpus_prep",
    oracle=f"""
    WITH gated AS (
        SELECT doc_id, lang, text,
               len(string_split(text, ' ')) AS n_tok
        FROM documents
        WHERE lang IN ('en', 'de', 'fr', 'es')
          AND len(string_split(text, ' ')) BETWEEN 20 AND 1000
          AND len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_SQL})))
              * 1.0 / len(string_split(text, ' ')) BETWEEN 0.01 AND 0.6
    ), exact_kept AS (
        SELECT * FROM gated
        WHERE doc_id IN (SELECT min(doc_id) FROM gated GROUP BY text)
    ), near_dropped AS (
        -- drop the higher doc_id of each verified near-dup pair
        SELECT DISTINCT doc_b AS doc_id FROM ({_MINHASH_PAIRS_SQL})
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           round(avg(n_tok), 4) AS avg_tokens
    FROM exact_kept
    WHERE doc_id NOT IN (SELECT doc_id FROM near_dropped)
    GROUP BY lang
    """,
)
def pipeline_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical LLM corpus-prep chain: language filter → quality gate
    (token count + stopword ratio) → exact dedup (keep min doc_id per
    text) → near-dup removal (drop the higher id of every verified
    MinHash-LSH pair) → per-language token accounting."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "to", "in", "is", "it")])
    stop_ratio = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))) / n_tok
    gated = d.filter(
        F.col("lang").isin("en", "de", "fr", "es")
        & n_tok.between(20, 1000)
        & stop_ratio.between(0.01, 0.6)
    ).select("doc_id", "lang", "text", n_tok.alias("n_tok"))

    keep = gated.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    exact_kept = gated.join(keep, "doc_id", "left_semi")

    near_dropped = (
        dedup_minhash_lsh(spark, sf_dir).select(F.col("doc_b").alias("doc_id")).distinct()
    )
    survivors = exact_kept.join(near_dropped, "doc_id", "left_anti")
    return survivors.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
    )


@query(
    "pipeline_embedding_dedup",
    oracle="""
    WITH planes AS (
        SELECT vec_id AS p_id, embedding::DOUBLE[] AS pe FROM embeddings
        WHERE vec_id BETWEEN 1 AND 8
    ), buckets AS (
        SELECT e.vec_id, e.embedding::DOUBLE[] AS ev,
               CAST(sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.pe) > 0
                             THEN power(2, p.p_id - 1) ELSE 0 END) AS BIGINT) AS bucket
        FROM embeddings e CROSS JOIN planes p
        GROUP BY e.vec_id, e.embedding
    ), pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM buckets a JOIN buckets b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.ev, b.ev) /
              (sqrt(list_dot_product(a.ev, a.ev)) *
               sqrt(list_dot_product(b.ev, b.ev))) >= 0.4
    )
    SELECT e.label, count(*) AS n_kept
    FROM embeddings e
    WHERE e.vec_id NOT IN (SELECT id_b FROM pairs)
    GROUP BY e.label
    """,
)
def pipeline_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space dedup applied: drop the higher id of every
    cosine-near-dup pair (LSH-scoped), count survivors per label."""
    from presto_truffle_spark.operators.similarity import embedding_near_dup_pairs

    e = load_table(spark, sf_dir, "embeddings")
    dropped = embedding_near_dup_pairs(spark, sf_dir).select(
        F.col("id_b").alias("vec_id")
    ).distinct()
    return (
        e.join(dropped, "vec_id", "left_anti")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


@query(
    "events_malformed_json_robust",
    oracle="""
    WITH noisy AS (
        SELECT event_id,
               CASE WHEN event_id % 7 = 0
                    THEN substring(props, 1, length(props) - 2)
                    ELSE props END AS p
        FROM events WHERE event_id <= 2000
    )
    SELECT CASE WHEN json_valid(p) THEN 'ok' ELSE 'corrupt' END AS parse_status,
           count(*) AS n,
           CAST(count(CASE WHEN json_valid(p)
                           THEN json_extract_string(p, '$.k') END) AS BIGINT)
               AS n_k_extracted
    FROM noisy
    GROUP BY 1
    """,
)
def events_malformed_json_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record tolerance (SURVEY.md §7.3 risk 6): every 7th props is
    deliberately truncated mid-object; ``from_json`` is PERMISSIVE by default, so
    malformed rows become NULL structs instead of failing the job — the
    only acceptable behavior when 100 TB of scraped JSON contains garbage.
    Counts parsed-vs-corrupt and successful field extractions."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    noisy = e.select(
        "event_id",
        F.when(
            F.col("event_id") % 7 == 0,
            F.substring(F.col("props"), 1, F.length("props") - 2),
        )
        .otherwise(F.col("props"))
        .alias("p"),
    )
    # Explicit corrupt-record column (SURVEY.md §7.3 risk 6): PERMISSIVE
    # parse captures the raw malformed text instead of failing — and unlike
    # a bare null-struct check it also catches partial parses.
    parsed = noisy.withColumn(
        "j",
        F.from_json(
            "p",
            "k BIGINT, _corrupt STRING",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ),
    )
    return parsed.groupBy(
        F.when(F.col("j._corrupt").isNull(), "ok").otherwise("corrupt").alias("parse_status")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.count("j.k").alias("n_k_extracted"),
    )



@query(
    "pipeline_budgeted_release",
    oracle="""
    WITH scored AS (
        SELECT doc_id, source, text,
               len(string_split(text, ' ')) AS n_tok,
               round(len(list_distinct(string_split(text, ' '))) * 1.0
                     / len(string_split(text, ' ')), 6) AS ttr
        FROM documents
    ), thr AS (
        SELECT source, quantile_cont(ttr, 0.50) AS src_median
        FROM scored GROUP BY source
    ), gated AS (
        SELECT s.* FROM scored s JOIN thr USING (source)
        WHERE s.ttr >= thr.src_median
    ), survivors AS (
        SELECT * FROM gated
        WHERE doc_id IN (SELECT min(doc_id) FROM gated GROUP BY text)
    ), bucketed AS (
        SELECT *, CAST(floor(ttr * 1000) AS BIGINT) AS bucket FROM survivors
    ), tot AS (
        SELECT CAST(floor(sum(n_tok) * 0.25) AS BIGINT) AS budget
        FROM bucketed
    ), brun AS (
        SELECT bucket, sum(btok) OVER (ORDER BY bucket DESC) AS cum
        FROM (SELECT bucket, sum(n_tok) AS btok FROM bucketed GROUP BY bucket)
    ), keep AS (
        SELECT bucket FROM brun CROSS JOIN tot WHERE cum <= budget
    ), selected AS (
        SELECT b.* FROM bucketed b JOIN keep USING (bucket)
    )
    SELECT CASE WHEN substr(md5(text), 1, 2) < 'cd' THEN 'train'
                WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens
    FROM selected
    GROUP BY 1
    """,
)
def pipeline_budgeted_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The budgeted-release pipeline — four registered disciplines chained
    the way a data-selection job actually runs them, the composition
    itself differentially tested: (1) per-source calibrated quality gate
    (`corpus_quality_calibrated`: keep >= in-source median TTR — one
    grouped percentile + broadcast thresholds); (2) exact dedup
    survivors (`dedup_exact_survivors`: min doc_id per text — one digest
    shuffle); (3) token-budget selection over the SURVIVING corpus
    (`corpus_token_budget_select`: 25% of post-dedup tokens via
    1000-bucket quantization — bounded aggregate + broadcast kept-bucket
    filter, no global running-sum window); (4) content-hash train/val/
    test accounting (`corpus_hash_split` thresholds — map-side). Stage
    order matters and is the production order: gating before dedup
    shrinks the shuffle; dedup before budgeting stops duplicates from
    double-claiming token budget; the split happens last so all three
    splits draw from one curated pool. Four shuffles end to end, zero
    collects, every intermediate bounded by the corpus it filters."""
    from presto_truffle_spark.operators.corpus_ops import _TRAIN_HI, _VAL_HI

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    scored = d.select(
        "doc_id",
        "source",
        "text",
        F.size(toks).alias("n_tok"),
        F.round(
            F.size(F.array_distinct(toks)) * F.lit(1.0) / F.size(toks), 6
        ).alias("ttr"),
    )
    thr = scored.groupBy("source").agg(
        F.percentile("ttr", F.lit(0.5)).alias("src_median")
    )
    gated = (
        scored.join(F.broadcast(thr), "source")
        .filter(F.col("ttr") >= F.col("src_median"))
        .drop("src_median")
    )
    # the pipeline re-reads its intermediates heavily (rescan audit:
    # documents x12 uncached — scored x2, gated x2, bucketed x3
    # multiply); above the tfidf gate, persist the two hubs
    from presto_truffle_spark.cache import input_bytes, scoped_persist
    from presto_truffle_spark.operators.text import _TFIDF_PERSIST_MIN_BYTES

    big = input_bytes(sf_dir, "documents") >= _TFIDF_PERSIST_MIN_BYTES
    if big:
        gated = scoped_persist(spark, "pipeline.budgeted.gated", gated)
    keep_ids = gated.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    survivors = gated.join(keep_ids, "doc_id", "left_semi")
    bucketed = survivors.withColumn(
        "bucket", F.floor(F.col("ttr") * 1000).cast("long")
    )
    if big:
        bucketed = scoped_persist(spark, "pipeline.budgeted.bucketed", bucketed)
    tot = bucketed.agg(
        F.floor(F.sum("n_tok") * F.lit(0.25)).cast("long").alias("budget")
    )
    from pyspark.sql import Window as W

    brun = (
        bucketed.groupBy("bucket")
        .agg(F.sum("n_tok").alias("btok"))
        .withColumn("cum", F.sum("btok").over(W.orderBy(F.col("bucket").desc())))
    )
    keep = (
        brun.join(F.broadcast(tot))
        .filter(F.col("cum") <= F.col("budget"))
        .select("bucket")
    )
    selected = bucketed.join(F.broadcast(keep), "bucket")
    bucket2 = F.substring(F.md5(F.col("text").cast("binary")), 1, 2)
    split = (
        F.when(bucket2 < _TRAIN_HI, "train")
        .when(bucket2 < _VAL_HI, "val")
        .otherwise("test")
    )
    return selected.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
    )
