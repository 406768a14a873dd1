"""Corpus-preparation operators a training-data pipeline runs at 100 TB:
deterministic splits, benchmark-contamination checks, stratified sampling,
and context-window packing.

These extend the LLM-pipeline block (dedup/similarity/text/multimodal)
with the set-management half of corpus prep. Everything is deterministic
(md5-derived randomness, explicit tie-breaks) so each operator carries a
full DuckDB oracle — and, more importantly, so production reruns are
replayable: ``rand()``-based splits/samples change on every retry, which
at scale silently leaks eval docs into train.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from presto_truffle_spark.catalog import load_table
from presto_truffle_spark.operators.dedup import _SHINGLE, _lsh_tables
from presto_truffle_spark.registry import query

# Lexicographic thresholds over the first md5 byte: hex strings compare
# like the underlying value, so '<cd' keeps 205/256 ≈ 80.1% and '<e6'
# keeps 230/256 ≈ 89.8% — a portable hash-bucket split with no integer
# parsing (DuckDB and Spark disagree on hex-parse syntax, not on string
# comparison).
_TRAIN_HI = "cd"
_VAL_HI = "e6"


@query(
    "corpus_hash_split",
    oracle=f"""
    SELECT CASE WHEN substr(md5(text), 1, 2) < '{_TRAIN_HI}' THEN 'train'
                WHEN substr(md5(text), 1, 2) < '{_VAL_HI}' THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
)
def corpus_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by content hash (~80/10/10).

    Content-hash (not doc_id) assignment means exact duplicates land in the
    SAME split — the property that stops near-identical docs straddling the
    train/eval boundary. Pure row-side expression: at 100 TB this is a
    map-only scan plus a 3-group aggregate; adding the split column to a
    write is shuffle-free."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("text").cast("binary")), 1, 2)
    split = (
        F.when(bucket < _TRAIN_HI, "train").when(bucket < _VAL_HI, "val").otherwise("test")
    )
    return d.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


_EVAL_SOURCE = "src0"  # stand-in benchmark/eval corpus within the fixture

_CONTAMINATION_ORACLE = f"""
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
    ), ev AS (
        SELECT DISTINCT unnest(sh.shingles) AS g
        FROM sh JOIN documents d ON sh.doc_id = d.doc_id
        WHERE d.source = '{_EVAL_SOURCE}'
    ), tr AS (
        SELECT sh.doc_id, unnest(sh.shingles) AS g, len(sh.shingles) AS n_shingles
        FROM sh JOIN documents d ON sh.doc_id = d.doc_id
        WHERE d.source <> '{_EVAL_SOURCE}'
    )
    SELECT tr.doc_id,
           CAST(count(*) AS BIGINT) AS n_overlap,
           CAST(any_value(tr.n_shingles) AS INTEGER) AS n_shingles,
           round(count(*) * 1.0 / any_value(tr.n_shingles), 6) AS overlap_ratio
    FROM tr JOIN ev ON tr.g = ev.g
    GROUP BY tr.doc_id
"""


@query("corpus_contamination_check", oracle=_CONTAMINATION_ORACLE)
def corpus_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: which train docs share token 3-gram
    shingles with the eval corpus (here: ``source = 'src0'``), and what
    fraction of each doc is contaminated.

    Scale shape: the eval shingle set is DISTINCT-deduped and joined by
    16-hex-char shingle digest — at 100 TB train vs a benchmark suite, the
    eval side is millions of shingles (broadcastable), so the scan is
    map-only over train; no all-pairs anything. Reuses the memoized LSH
    shingle table, so a dedup+contamination pipeline pays for shingling
    once."""
    sh = _lsh_tables(spark, sf_dir)["sh"]
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sh = sh.join(src, "doc_id")
    ev = (
        sh.filter(F.col("source") == _EVAL_SOURCE)
        .select(F.explode("shingles").alias("g"))
        .distinct()
    )
    tr = sh.filter(F.col("source") != _EVAL_SOURCE).select(
        "doc_id", F.size("shingles").alias("n_shingles"), F.explode("shingles").alias("g")
    )
    return (
        tr.join(ev, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_overlap"),
            F.any_value("n_shingles").alias("n_shingles"),
            F.round(F.count(F.lit(1)) / F.any_value("n_shingles"), 6).alias(
                "overlap_ratio"
            ),
        )
    )


_SAMPLE_PER_STRATUM = 10


@query(
    "corpus_stratified_sample",
    oracle=f"""
    SELECT lang, doc_id, source, n_chars FROM (
        SELECT lang, doc_id, source, n_chars,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY md5(text), doc_id) AS rn
        FROM documents)
    WHERE rn <= {_SAMPLE_PER_STRATUM}
    """,
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size sample per stratum (here: 10 docs per
    language): rank by content hash within the stratum, keep the first n.

    The hash order is uniform-random in distribution but stable across
    reruns — unlike ``TABLESAMPLE``/``rand()``, a retried job draws the
    SAME sample. Plans as a per-stratum top-k (partial top-k per map task,
    no global sort), the only scalable shape for "10k docs per language
    from 100 TB"."""
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.md5(F.col("text").cast("binary")), "doc_id")
    return (
        d.select("lang", "doc_id", "source", "n_chars", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _SAMPLE_PER_STRATUM)
        .drop("rn")
    )


_CONTEXT_TOKENS = 4096


@query(
    "corpus_pack_bins",
    oracle=f"""
    WITH toks AS (
        -- integer division on purpose: DuckDB CAST(double AS BIGINT)
        -- ROUNDS while Spark's cast truncates; // vs div sidesteps it
        SELECT lang, doc_id, n_chars // 4 AS n_tokens
        FROM documents
    ), packed AS (
        SELECT lang, doc_id, n_tokens,
               CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                               ROWS UNBOUNDED PRECEDING)
                           - n_tokens) / {_CONTEXT_TOKENS}.0) AS BIGINT) AS bin_id
        FROM toks
    )
    SELECT lang, bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed
    GROUP BY lang, bin_id
    """,
)
def corpus_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing plan: assign docs (in deterministic doc_id
    order per language) to ~4096-token training bins by running token
    count — the streaming-concatenation approximation of sequence packing
    (a doc starting before a boundary spills past it, as concatenated
    training streams do).

    Token counts are the cheap ``n_chars/4`` estimate; swap in
    text_bpe_token_count's column for the real pipeline. One window + one
    aggregate = two shuffles on the language key; at 100 TB the partition
    key would be (lang, shard) so no single reducer sees a whole
    language."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("lang", "doc_id", F.expr("n_chars div 4").alias("n_tokens"))
    w = W.partitionBy("lang").orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    packed = toks.withColumn(
        "bin_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / _CONTEXT_TOKENS),
    )
    return packed.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


# ---------------------------------------------------------------------------
# Composed release pipeline (lives here, not pipelines.py, because its
# oracle needs corpus_contamination_check's SQL, registered in this module)

from presto_truffle_spark.operators.dedup import dedup_minhash_lsh  # noqa: E402
from presto_truffle_spark.registry import ORACLES  # noqa: E402

_MINHASH_PAIRS_SQL = ORACLES["dedup_minhash_lsh"]


@query(
    "pipeline_corpus_release",
    oracle=f"""
    WITH gated AS (
        SELECT doc_id, lang, text, n_chars FROM documents
        WHERE source <> '{_EVAL_SOURCE}'
          AND len(string_split(text, ' ')) BETWEEN 20 AND 1000
    ), exact_kept AS (
        SELECT * FROM gated
        WHERE doc_id IN (SELECT min(doc_id) FROM gated GROUP BY text)
    ), near_dropped AS (
        SELECT DISTINCT doc_b AS doc_id FROM ({_MINHASH_PAIRS_SQL})
    ), contaminated AS (
        SELECT doc_id FROM ({_CONTAMINATION_ORACLE}) WHERE overlap_ratio > 0.2
    )
    SELECT CASE WHEN substr(md5(text), 1, 2) < '{_TRAIN_HI}' THEN 'train'
                WHEN substr(md5(text), 1, 2) < '{_VAL_HI}' THEN 'val'
                ELSE 'test' END AS split,
           lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM exact_kept
    WHERE doc_id NOT IN (SELECT doc_id FROM near_dropped)
      AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    GROUP BY 1, 2
    """,
)
def pipeline_corpus_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-RELEASE chain (r2): drop the eval source → quality
    gate → exact dedup → near-dup removal (MinHash-LSH pairs) → drop
    benchmark-contaminated docs (3-gram overlap ratio > 0.2) → assign the
    deterministic train/val/test split → per-(split, lang) accounting.

    Composes dedup, contamination, and split under ONE oracle (cf.
    pipeline_corpus_prep for the quality-gate-centric chain). Scale shape:
    three map stages, the dedup/contamination shuffles (all bucket- or
    digest-keyed), two anti joins on doc_id, one final aggregate — zero
    collects, and every stage reuses the memoized shingle table."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    gated = d.filter((F.col("source") != _EVAL_SOURCE) & n_tok.between(20, 1000)).select(
        "doc_id", "lang", "text", "n_chars"
    )
    keep = gated.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    exact_kept = gated.join(keep, "doc_id", "left_semi")

    near_dropped = (
        dedup_minhash_lsh(spark, sf_dir).select(F.col("doc_b").alias("doc_id")).distinct()
    )
    contaminated = (
        corpus_contamination_check(spark, sf_dir)
        .filter(F.col("overlap_ratio") > 0.2)
        .select("doc_id")
    )
    survivors = exact_kept.join(near_dropped, "doc_id", "left_anti").join(
        contaminated, "doc_id", "left_anti"
    )
    bucket = F.substring(F.md5(F.col("text").cast("binary")), 1, 2)
    split = (
        F.when(bucket < _TRAIN_HI, "train").when(bucket < _VAL_HI, "val").otherwise("test")
    )
    return survivors.groupBy(split.alias("split"), "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


_MIX_TARGET = 0.6  # cap each source at this fraction of the median source size


@query(
    "corpus_balance_sources",
    oracle="""
    WITH counts AS (
        SELECT source, count(*) AS n FROM documents GROUP BY source
    ), quota AS (
        SELECT CAST(floor(0.6 * quantile_cont(n, 0.5)) AS BIGINT) AS q
        FROM counts
    ), th AS (
        SELECT source, n, q,
               printf('%08x',
                      CAST(floor(least(CAST(q AS DOUBLE) / n, 1.0) * 4294967296)
                           AS BIGINT)) AS thresh,
               n <= q AS keep_all
        FROM counts, quota
    )
    SELECT d.doc_id, d.source
    FROM documents d
    JOIN th ON d.source = th.source
    WHERE keep_all OR substr(md5(text), 1, 8) < thresh
    """,
)
def corpus_balance_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset mixing / source balancing: downsample every over-represented
    source toward the MEDIAN source size, so no single crawl dominates the
    training mix (the DoReMi/Pile-style "don't let CommonCrawl drown the
    rest" step, with a data-derived target instead of hand weights).

    Scale design — hash-RATE sampling, not ranking: the exact-quota
    alternative (row_number per source, keep rank ≤ q) needs a per-source
    sort, and the whole point of balancing is that some source is huge —
    that sort single-tasks exactly there. Instead each source gets keep
    rate q/n, applied as a deterministic content-hash threshold: keep iff
    the first 8 hex chars of md5(text) < printf('%08x', floor(rate·2³²)).
    One map-only scan over the corpus, a broadcast of one tiny row per
    source; kept counts land within binomial noise of the quota
    (±~√q ≈ 2% at q=10k), which is what production balancing accepts in
    exchange for never sorting 100 TB. Content-keyed hashing also makes
    the sample rerun- and partitioning-stable, and identical md5 text
    always survives or dies together — mixing composes with dedup instead
    of fighting it. The rate≥1 sources short-circuit via keep_all (a
    9-hex-digit threshold string would compare lexicographically SMALLER
    than 8-hex prefixes, so the threshold form alone cannot express
    "keep everything")."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    quota = counts.agg(
        F.floor(_MIX_TARGET * F.percentile("n", F.lit(0.5)))
        .cast("long")
        .alias("q")
    )
    th = counts.crossJoin(F.broadcast(quota)).select(
        "source",
        (
            F.format_string(
                "%08x",
                F.floor(
                    F.least(F.col("q").cast("double") / F.col("n"), F.lit(1.0))
                    * F.lit(4294967296.0)
                ).cast("long"),
            )
        ).alias("thresh"),
        (F.col("n") <= F.col("q")).alias("keep_all"),
    )
    return (
        d.join(F.broadcast(th), "source")
        .filter(
            F.col("keep_all")
            | (F.substring(F.md5(F.col("text")), 1, 8) < F.col("thresh"))
        )
        .select("doc_id", "source")
    )


# --- training-chunk generation -----------------------------------------

_CHUNK_CHARS = 240
_CHUNK_STRIDE = 180


@query(
    "text_chunk_overlap",
    oracle=f"""
    WITH idx AS (
        SELECT doc_id, text,
               unnest(generate_series(
                   0, CAST(floor((length(text) - 1) / {_CHUNK_STRIDE}.0)
                           AS BIGINT))) AS i
        FROM documents
        WHERE length(text) > 0
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           CAST(1 + i * {_CHUNK_STRIDE} AS BIGINT) AS chunk_start,
           CAST(length(substr(text, CAST(1 + i * {_CHUNK_STRIDE} AS INTEGER),
                              {_CHUNK_CHARS})) AS BIGINT) AS chunk_chars,
           substr(md5(substr(text, CAST(1 + i * {_CHUNK_STRIDE} AS INTEGER),
                             {_CHUNK_CHARS})), 1, 16) AS chunk_hash
    FROM idx
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-width training chunks: windows of {240} chars at
    stride {180} (60-char overlap), the standard prep step for feeding
    long documents to a bounded context window without losing boundary
    text. Chunk starts are 1, 1+S, 1+2S, ... while start <= length, so
    every doc yields ceil(length/S-ish) chunks and the LAST chunk may be
    short — exactly the cross-engine-exact substr semantics both engines
    share for start >= 1.

    100 TB posture: explode(sequence(...)) is a map-side generate — no
    shuffle at all; output size is input x (C/S) ≈ 1.33x, streamed
    straight to the sink. The guard ``greatest(..., 0)`` matters: Spark's
    ``sequence(0, -1)`` counts DOWN ([0, -1]) where DuckDB's
    generate_series returns empty — an empty doc would fabricate chunks
    on one engine only (the filter removes empties on both)."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_chunks_hi = F.greatest(
        F.floor((F.length("text") - F.lit(1)) / F.lit(float(_CHUNK_STRIDE))),
        F.lit(0),
    ).cast("int")
    start = (F.lit(1) + F.col("i") * _CHUNK_STRIDE).cast("int")
    chunk = F.substring(F.col("text"), start, _CHUNK_CHARS)
    return (
        d.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), n_chunks_hi)).alias("i"),
        )
        .select(
            "doc_id",
            F.col("i").cast("long").alias("chunk_idx"),
            start.cast("long").alias("chunk_start"),
            F.length(chunk).cast("long").alias("chunk_chars"),
            F.substring(F.md5(chunk.cast("binary")), 1, 16).alias("chunk_hash"),
        )
    )


# --- distribution-drift detection --------------------------------------

_PSI_BIN_CHARS = 64  # fixture texts span ~44-577 chars -> bins 0..9
_PSI_EPS = 1e-6


@query(
    "corpus_drift_psi",
    oracle=f"""
    WITH tagged AS (
        SELECT least(CAST(floor(length(text) / {_PSI_BIN_CHARS}.0) AS BIGINT),
                     9) AS bin,
               substr(md5(text), 1, 1) < '8' AS is_ref
        FROM documents
    ), bins AS (
        SELECT bin,
               CAST(count(*) FILTER (WHERE is_ref) AS BIGINT) AS n_ref,
               CAST(count(*) FILTER (WHERE NOT is_ref) AS BIGINT) AS n_new
        FROM tagged GROUP BY bin
    ), p AS (
        SELECT bin, n_ref, n_new,
               n_ref * 1.0 / sum(n_ref) OVER () AS p_ref,
               n_new * 1.0 / sum(n_new) OVER () AS p_new
        FROM bins
    )
    SELECT bin, n_ref, n_new,
           round(p_ref, 6) AS p_ref,
           round(p_new, 6) AS p_new,
           round((p_new - p_ref) * ln((p_new + {_PSI_EPS}) / (p_ref + {_PSI_EPS})),
                 6) AS psi_term
    FROM p
    """,
)
def corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift between two deterministic halves
    of the corpus (hash-split stand-ins for "last snapshot" vs "this
    snapshot"), per length bin. PSI is the standard go/no-go gate before
    a new crawl batch joins the training mix: a bin's term
    (p_new − p_ref)·ln(p_new/p_ref) spikes where the distribution moved.

    Per-BIN terms are the output, deliberately NOT the summed scalar:
    10 float additions have no portable ordering across engines, while
    each term is one exactly-rounded expression both engines agree on
    after round(6) (FIXTURES.md float convention). Consumers sum the
    tiny result themselves.

    100 TB posture: one map-only scan into a 10-group aggregate plus a
    window over 10 rows — effectively free at any scale; the hash split
    keeps the comparison replayable (no rand())."""
    d = load_table(spark, sf_dir, "documents")
    tagged = d.select(
        F.least(
            F.floor(F.length("text") / F.lit(float(_PSI_BIN_CHARS))).cast("long"),
            F.lit(9),
        ).alias("bin"),
        (F.substring(F.md5(F.col("text").cast("binary")), 1, 1) < "8").alias(
            "is_ref"
        ),
    )
    bins = tagged.groupBy("bin").agg(
        F.count_if(F.col("is_ref")).alias("n_ref"),
        F.count_if(~F.col("is_ref")).alias("n_new"),
    )
    w = W.partitionBy()
    p_ref = F.col("n_ref") / F.sum("n_ref").over(w)
    p_new = F.col("n_new") / F.sum("n_new").over(w)
    return bins.select(
        "bin",
        "n_ref",
        "n_new",
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_new, 6).alias("p_new"),
        F.round(
            (p_new - p_ref) * F.log((p_new + _PSI_EPS) / (p_ref + _PSI_EPS)), 6
        ).alias("psi_term"),
    )


_BUDGET_FRAC = 0.25  # token budget as a fraction of corpus tokens
_TTR_BUCKETS = 1000


@query(
    "corpus_token_budget_select",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tok,
               CAST(floor(len(list_distinct(string_split(text, ' ')))
                          * {_TTR_BUCKETS}.0
                          / len(string_split(text, ' '))) AS BIGINT) AS bucket
        FROM documents
    ), tot AS (
        SELECT CAST(floor(sum(n_tok) * {_BUDGET_FRAC}) AS BIGINT) AS budget
        FROM t
    ), bsum AS (
        SELECT bucket, sum(n_tok) AS btok FROM t GROUP BY bucket
    ), brun AS (
        SELECT bucket, sum(btok) OVER (ORDER BY bucket DESC) AS cum
        FROM bsum
    ), keep AS (
        SELECT bucket, CAST(cum AS BIGINT) AS cum_tok
        FROM brun CROSS JOIN tot WHERE cum <= budget
    )
    SELECT t.doc_id, t.bucket, CAST(t.n_tok AS BIGINT) AS n_tok,
           k.cum_tok AS bucket_cum_tok
    FROM t JOIN keep k USING (bucket)
    """,
)
def corpus_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget-constrained corpus selection (the "pick the best 25%
    of tokens" data-selection step): score every document by type-token
    ratio, then select the highest-scoring documents whose tokens fit the
    budget. Done the way it must be done at 100 TB — NOT a global
    running sum over per-document rows (a single-partition window over
    the corpus): scores are quantized into 1000 (_TTR_BUCKETS) buckets, token mass is
    aggregated per bucket (one small shuffle), the cumulative-from-the-top
    threshold is computed over the <= 1000-row (_TTR_BUCKETS) bucket table (driver-scale
    window), and the corpus is then FILTERED by the kept-bucket list via
    a broadcast semi-join — one scan, one bounded aggregate, one
    broadcast filter. Whole buckets only: the boundary bucket that would
    overflow the budget is dropped entirely, so selection is
    deterministic without any doc-level ordering. All-integer outputs
    (token counts, bucket ids, cumulative token mass at each kept
    bucket)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    u = F.size(F.array_distinct(toks))
    t = d.select(
        "doc_id",
        n.alias("n_tok"),
        F.floor(u * F.lit(float(_TTR_BUCKETS)) / n).cast("long").alias("bucket"),
    )
    # t feeds three consumers (budget total, bucket sums, final filter);
    # above the tfidf size gate the tokenize+distinct scan is worth one
    # cache write of 3 ints/doc instead of three corpus scans (rescan
    # audit: documents x3). Below it, recompute is cheaper — both plan
    # shapes are the documented tfidf discipline.
    from presto_truffle_spark.cache import input_bytes, scoped_persist
    from presto_truffle_spark.operators.text import _TFIDF_PERSIST_MIN_BYTES

    if input_bytes(sf_dir, "documents") >= _TFIDF_PERSIST_MIN_BYTES:
        t = scoped_persist(spark, "corpus.token_budget.t", t)
    tot = t.agg(
        F.floor(F.sum("n_tok") * F.lit(_BUDGET_FRAC)).cast("long").alias("budget")
    )
    bsum = t.groupBy("bucket").agg(F.sum("n_tok").alias("btok"))
    w = W.orderBy(F.col("bucket").desc())
    brun = bsum.withColumn("cum", F.sum("btok").over(w))
    keep = (
        brun.join(F.broadcast(tot))
        .filter(F.col("cum") <= F.col("budget"))
        .select("bucket", F.col("cum").cast("long").alias("cum_tok"))
    )
    return (
        t.join(F.broadcast(keep), "bucket")
        .select(
            "doc_id",
            "bucket",
            F.col("n_tok").cast("long").alias("n_tok"),
            F.col("cum_tok").alias("bucket_cum_tok"),
        )
    )


@query(
    "corpus_quality_calibrated",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               round(len(list_distinct(string_split(text, ' '))) * 1.0
                     / len(string_split(text, ' ')), 6) AS ttr
        FROM documents
    ), thr AS (
        SELECT source, quantile_cont(ttr, 0.50) AS src_median
        FROM t GROUP BY source
    )
    SELECT t.doc_id, t.source, t.ttr,
           floor(thr.src_median * 1000000 + 0.5) / 1000000 AS src_median,
           CASE WHEN t.ttr >= thr.src_median THEN 1 ELSE 0 END AS kept
    FROM t JOIN thr USING (source)
    """,
)
def corpus_quality_calibrated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality calibration (the FineWeb-class discipline): a
    raw quality signal (here TTR) is not comparable across sources —
    boilerplate-heavy sources score systematically lower — so the gate
    is "top half WITHIN your source", not a global threshold. Computed
    the scale-correct way: per-source exact interpolated median via ONE
    grouped aggregate (Spark ``percentile`` ≡ DuckDB ``quantile_cont``,
    the proven agg_percentiles pairing), thresholds broadcast back onto
    the corpus, per-doc kept flag emitted. NO per-source window: source
    cardinality is tiny, so a percent_rank window would funnel each
    source's entire corpus through one task — the grouped-aggregate +
    broadcast-join shape keeps every stage partition-parallel. At 100 TB
    swap the exact percentile for percentile_approx (same plan shape,
    documented in agg_percentile_approx); the gate stays a broadcast.

    TTR enters the median 6dp-rounded (both engines interpolate the same
    values); the median itself is floor-rounded for output but compared
    UNROUNDED against ttr — interpolation midpoints of 6dp values are
    exactly representable halves, identical both engines."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    t = d.select(
        "doc_id",
        "source",
        F.round(
            F.size(F.array_distinct(toks)) * F.lit(1.0) / F.size(toks), 6
        ).alias("ttr"),
    )
    # t feeds the threshold aggregate AND the gate join — above the
    # tfidf size gate one cache write of 3 small cols beats two
    # tokenize scans (rescan audit: documents x2)
    from presto_truffle_spark.cache import input_bytes, scoped_persist
    from presto_truffle_spark.operators.text import _TFIDF_PERSIST_MIN_BYTES

    if input_bytes(sf_dir, "documents") >= _TFIDF_PERSIST_MIN_BYTES:
        t = scoped_persist(spark, "corpus.quality_calibrated.t", t)
    thr = t.groupBy("source").agg(
        F.percentile("ttr", F.lit(0.5)).alias("src_median")
    )
    return (
        t.join(F.broadcast(thr), "source")
        .select(
            "doc_id",
            "source",
            "ttr",
            (F.floor(F.col("src_median") * 1_000_000 + F.lit(0.5)) / 1_000_000)
            .alias("src_median"),
            F.when(F.col("ttr") >= F.col("src_median"), 1)
            .otherwise(0)
            .alias("kept"),
        )
    )


@query(
    "corpus_pack_bins_sorted",
    oracle=f"""
    WITH toks AS (
        SELECT lang, doc_id, n_chars // 4 AS n_tokens
        FROM documents
    ), packed AS (
        SELECT lang, doc_id, n_tokens,
               CAST(floor((sum(n_tokens) OVER (PARTITION BY lang
                                               ORDER BY n_tokens DESC, doc_id
                                               ROWS UNBOUNDED PRECEDING)
                           - n_tokens) / {_CONTEXT_TOKENS}.0) AS BIGINT)
                   AS bin_id
        FROM toks
    )
    SELECT lang, bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed
    GROUP BY lang, bin_id
    """,
)
def corpus_pack_bins_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing in SIZE-DESCENDING order — the greedy
    next-fit-decreasing refinement of `corpus_pack_bins` (which packs in
    doc_id arrival order): sorting big docs first makes the small ones
    fill the tail gaps, the standard cheap approximation of first-fit-
    decreasing that still needs only ONE running sum per language (no
    per-bin state, no driver loop). Measured on the fixture the
    refinement shows up as non-last bins hugging the 4096 boundary
    tighter (the pack_bins fill test's slack bound is what improves);
    both variants are deterministic ((n_tokens DESC, doc_id) total
    order) and share the same one-shuffle-per-language plan. At 100 TB
    the sort rides the same window shuffle the running sum already
    pays — size-ordering is free."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", "doc_id", F.expr("n_chars div 4").alias("n_tokens")
    )
    w = (
        W.partitionBy("lang")
        .orderBy(F.col("n_tokens").desc(), "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = toks.withColumn(
        "bin_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens"))
            / float(_CONTEXT_TOKENS)
        ).cast("long"),
    )
    return packed.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("bin_tokens"),
    )


@query(
    "corpus_quantile_normalize",
    oracle="""
    WITH rolled AS (
        SELECT source, grouping(source) AS g,
               [CAST(percentile_disc(0.1) WITHIN GROUP (ORDER BY n_chars) AS BIGINT),
                CAST(percentile_disc(0.2) WITHIN GROUP (ORDER BY n_chars) AS BIGINT),
                CAST(percentile_disc(0.3) WITHIN GROUP (ORDER BY n_chars) AS BIGINT),
                CAST(percentile_disc(0.4) WITHIN GROUP (ORDER BY n_chars) AS BIGINT),
                CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS BIGINT),
                CAST(percentile_disc(0.6) WITHIN GROUP (ORDER BY n_chars) AS BIGINT),
                CAST(percentile_disc(0.7) WITHIN GROUP (ORDER BY n_chars) AS BIGINT),
                CAST(percentile_disc(0.8) WITHIN GROUP (ORDER BY n_chars) AS BIGINT),
                CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars) AS BIGINT),
                CAST(percentile_disc(1.0) WITHIN GROUP (ORDER BY n_chars) AS BIGINT)] AS vals
        FROM documents GROUP BY ROLLUP(source)
    )
    SELECT s.source, d AS decile,
           s.vals[d] AS src_val, t.vals[d] AS global_val,
           round(CAST(s.vals[d] AS DOUBLE) / nullif(t.vals[d], 0), 6) AS lift
    FROM (SELECT * FROM rolled WHERE g = 0) s
    CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS d)
    CROSS JOIN (SELECT vals FROM rolled WHERE g = 1) t
    """,
)
def corpus_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vs global decile mapping of document length — the
    calibration table behind quantile normalization: to put sources with
    different length distributions on one scale, map each source's d-th
    decile to the corpus-wide d-th decile (the batch-effect correction
    lifted from genomics into corpus prep; corpus_quality_calibrated is
    the median-only special case of the same discipline). Emitting the
    MAPPING rather than the remapped rows keeps the result auditable and
    reusable (sources x 10 rows, joinable onto any downstream gate).

    Both engines parse the ANSI percentile_disc(f) WITHIN GROUP ordered-
    set aggregate identically; values are exact BIGINTs (a length
    percentile should be a length some document has), the `lift` ratio
    (source decile / global decile) is the one derived double, rounded
    6dp with nullif guarding degenerate zero-length deciles.

    Scale shape: ONE ROLLUP(source) ordered-set aggregate computes the
    per-source rows AND the grand-total row in a single corpus pass
    (Expand doubles rows into one shuffle — the r9 rescan audit caught
    the original two-aggregate spelling scanning documents twice);
    per-group value buffering is the posture, percentile_approx the
    100 TB swap-in. The tiny rolled table (sources+1 rows) is persisted
    because both the source rows and the broadcast global row read it;
    the decile explode runs over sources x 10 rows, not the corpus."""
    from presto_truffle_spark.cache import scoped_persist

    d = load_table(spark, sf_dir, "documents")
    d.select("source", "n_chars").createOrReplaceTempView("pt_qnorm")
    pd_arr = ", ".join(
        f"CAST(percentile_disc({f/10:.1f}) WITHIN GROUP (ORDER BY n_chars)"
        " AS BIGINT)"
        for f in range(1, 11)
    )
    rolled = spark.sql(
        f"""
        SELECT source, grouping(source) AS g, array({pd_arr}) AS vals
        FROM pt_qnorm GROUP BY ROLLUP(source)
        """
    )
    rolled = scoped_persist(spark, "corpus.quantile_normalize.rolled", rolled)
    src = rolled.filter(F.col("g") == 0).select("source", "vals")
    glob = rolled.filter(F.col("g") == 1).select(
        F.col("vals").alias("gvals")
    )
    return (
        src.crossJoin(F.broadcast(glob))
        .select(
            "source",
            F.explode(F.sequence(F.lit(1), F.lit(10))).alias("decile"),
            "vals",
            "gvals",
        )
        .select(
            "source",
            "decile",
            F.element_at("vals", F.col("decile")).alias("src_val"),
            F.element_at("gvals", F.col("decile")).alias("global_val"),
            F.round(
                F.element_at("vals", F.col("decile")).cast("double")
                / F.nullif(
                    F.element_at("gvals", F.col("decile")), F.lit(0)
                ),
                6,
            ).alias("lift"),
        )
    )


@query(
    "corpus_ngram_novelty",
    oracle=f"""
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
    ), toks AS (
        SELECT doc_id, unnest(shingles) AS tok FROM sh
    ), first AS (
        SELECT tok, min(doc_id) AS first_doc FROM toks GROUP BY tok
    ), novel AS (
        SELECT first_doc AS doc_id, CAST(count(*) AS BIGINT) AS n_novel
        FROM first GROUP BY first_doc
    )
    SELECT s.doc_id,
           CAST(len(s.shingles) AS BIGINT) AS n_shingles,
           CAST(coalesce(n.n_novel, 0) AS BIGINT) AS n_novel,
           CAST(coalesce(n.n_novel, 0) * 1000000 // len(s.shingles)
                AS BIGINT) AS novelty_ppm
    FROM sh s LEFT JOIN novel n USING (doc_id)
    """,
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a document's shingles
    first seen in THAT document when the corpus is read in doc_id
    (ingestion) order — the freshness curve a continuously-growing
    training corpus tracks (novelty collapsing toward zero means new
    data is recombination, not new content; a doc with novelty ~0 is
    boilerplate or a near-dup of history, the same signal
    dedup_incremental_minhash acts on, here as a MEASURE not a filter).

    The trick that makes "shingles unseen in any earlier document"
    one-pass: a shingle is novel in exactly the doc where it FIRST
    occurs, so min(doc_id) per shingle type followed by a count per
    first-doc IS the novelty numerator — no running distinct state, no
    ordered scan, just two map-combinable grouped aggregates over the
    exploded shingle table (the same first-occurrence fold the
    estimator behind Heaps-law fitting uses, cf. text_heaps_law_fit).
    Integer ppm output; reads the memoized cached shingle table shared
    with the LSH family."""
    sh = _lsh_tables(spark, sf_dir)["sh"]
    toks = sh.select("doc_id", F.explode("shingles").alias("tok"))
    first = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    novel = first.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_novel")
    )
    return (
        sh.select(
            "doc_id", F.size("shingles").cast("long").alias("n_shingles")
        )
        .join(novel, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("n_novel"), F.lit(0))
            .cast("long")
            .alias("n_novel"),
            F.expr("coalesce(n_novel, 0) * 1000000 div n_shingles")
            .cast("long")
            .alias("novelty_ppm"),
        )
    )


@query(
    "corpus_temperature_sampling_plan",
    oracle="""
    WITH src AS (
        SELECT source, CAST(sum(n_chars) AS BIGINT) AS tokens
        FROM documents GROUP BY source
    ), tot AS (
        SELECT source, tokens,
               CAST(sum(tokens) OVER () AS BIGINT) AS total,
               sqrt(tokens * 1.0 / CAST(sum(tokens) OVER () AS BIGINT))
                   AS w_raw
        FROM src
    ), norm AS (
        SELECT source, tokens, total,
               w_raw / sum(w_raw) OVER () AS target_share
        FROM tot
    )
    SELECT source, tokens,
           CAST(tokens * 1000000 // total AS BIGINT)
               AS natural_share_ppm,
           round(target_share, 6) AS target_share,
           round(target_share * total / tokens, 4) AS epochs
    FROM norm
    """,
)
def corpus_temperature_sampling_plan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-based source sampling plan (the alpha/T-sampling rule
    from multilingual pretraining — mBERT/XLM-R's p_i ∝ share_i^(1/T),
    here T=2 i.e. sqrt): given each source's natural token share,
    compute the up/down-weighted TARGET share and the epochs of that
    source one total-budget pass implies (epochs > 1 = the source
    repeats; the overfitting-vs-dilution dial every data-mixture
    ablation turns). Emits the PLAN — the per-source sampling table a
    weighted reader joins on — in the repo's mapping-not-mapped-rows
    convention (corpus_quantile_normalize, matching_fellegi_sunter).

    One grouped sum over the corpus, then window folds over the
    source-count-sized table. The sqrt reweighting and the share
    normalizer are the only doubles (sum over ~20 bounded terms,
    identical spellings, 6dp/4dp rounds); natural shares stay integer
    ppm."""
    d = load_table(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("tokens")
    )
    w_all = W.partitionBy()
    tot = src.select(
        "source",
        "tokens",
        F.sum("tokens").over(w_all).cast("long").alias("total"),
        F.sqrt(
            F.col("tokens")
            * F.lit(1.0)
            / F.sum("tokens").over(w_all).cast("long")
        ).alias("w_raw"),
    )
    norm = tot.select(
        "source",
        "tokens",
        "total",
        (F.col("w_raw") / F.sum("w_raw").over(w_all)).alias("target_share"),
    )
    return norm.select(
        "source",
        "tokens",
        F.expr("CAST(tokens * 1000000 div total AS BIGINT)").alias(
            "natural_share_ppm"
        ),
        F.round("target_share", 6).alias("target_share"),
        F.round(
            F.col("target_share") * F.col("total") / F.col("tokens"), 4
        ).alias("epochs"),
    )


@query(
    "corpus_rendezvous_sharding",
    oracle="""
    WITH assign AS (
        SELECT doc_id,
               (SELECT s FROM (
                    SELECT s.s,
                           (d.doc_id * 2654435761 + s.s * 40503) % 1048576
                               AS w
                    FROM (SELECT unnest(generate_series(0, 7)) AS s) s
                    ORDER BY w DESC, s.s LIMIT 1) )
                   AS shard8,
               (SELECT s FROM (
                    SELECT s.s,
                           (d.doc_id * 2654435761 + s.s * 40503) % 1048576
                               AS w
                    FROM (SELECT unnest(generate_series(0, 8)) AS s) s
                    ORDER BY w DESC, s.s LIMIT 1) )
                   AS shard9,
               doc_id % 8 AS mod8,
               doc_id % 9 AS mod9
        FROM documents d
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(CASE WHEN shard8 <> shard9 THEN 1 END) AS BIGINT)
               AS moved_rendezvous,
           CAST(count(CASE WHEN shard8 <> shard9 THEN 1 END) * 1000000
                // nullif(count(*), 0) AS BIGINT) AS moved_rendezvous_ppm,
           CAST(count(CASE WHEN mod8 <> mod9 THEN 1 END) AS BIGINT)
               AS moved_modulo,
           CAST(count(CASE WHEN mod8 <> mod9 THEN 1 END) * 1000000
                // nullif(count(*), 0) AS BIGINT) AS moved_modulo_ppm
    FROM assign
    """,
)
def corpus_rendezvous_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) sharding vs naive modulo — the
    shard-stability question every growing corpus store answers before
    its first reshard: when the shard count goes 8 -> 9, HRW moves only
    the keys whose new shard WINS the weight race (~1/9 of keys,
    measured here as moved_rendezvous_ppm), while key%N reassigns
    almost everything (~8/9 — moved_modulo_ppm), invalidating caches
    and forcing a near-total data migration. HRW is fully relational:
    weight(key, shard) = deterministic hash (the repo's arithmetic
    mod-2^20 mix), assignment = argmax over the shard list — no ring
    state, no virtual nodes, and adding a shard only ever STEALS keys
    (never shuffles third parties), which is the property the ppm
    column proves.

    Shape: a per-key argmax over an 8/9-way exploded weight list (one
    codegen pipeline, no shuffle until the final one-row count fold).
    Everything integer; the 1/9 vs 8/9 contrast is exact arithmetic,
    not an approximation claim."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def hrw(n: int):
        s = F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("s")
        return s

    def assign_col(n: int, alias: str):
        # argmax via array fold: build [(w, s)] structs, sort desc, take s
        shards = F.sequence(F.lit(0), F.lit(n - 1))
        weights = F.transform(
            shards,
            lambda s: F.struct(
                (
                    (F.col("doc_id") * F.lit(2654435761) + s * F.lit(40503))
                    % F.lit(1048576)
                ).alias("w"),
                s.alias("s"),
            ),
        )
        # max weight, ties to the LOWEST shard id: sort by (w asc, s desc)
        # and take the last element == (max w, min s among ties)... use
        # array_max on (w, -s) then recover s.
        best = F.array_max(
            F.transform(
                weights,
                lambda x: F.struct(
                    x.w.alias("w"), (-x.s).alias("neg_s")
                ),
            )
        )
        return (-best.neg_s).cast("long").alias(alias)

    assign = d.select(
        "doc_id",
        assign_col(8, "shard8"),
        assign_col(9, "shard9"),
        (F.col("doc_id") % 8).alias("mod8"),
        (F.col("doc_id") % 9).alias("mod9"),
    )
    moved_r = F.count(
        F.when(F.col("shard8") != F.col("shard9"), 1)
    ).cast("long")
    moved_m = F.count(F.when(F.col("mod8") != F.col("mod9"), 1)).cast(
        "long"
    )
    return assign.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        moved_r.alias("moved_rendezvous"),
        F.expr(
            "CAST(count(CASE WHEN shard8 <> shard9 THEN 1 END) * 1000000"
            " div nullif(count(*), 0) AS BIGINT)"
        ).alias("moved_rendezvous_ppm"),
        moved_m.alias("moved_modulo"),
        F.expr(
            "CAST(count(CASE WHEN mod8 <> mod9 THEN 1 END) * 1000000"
            " div nullif(count(*), 0) AS BIGINT)"
        ).alias("moved_modulo_ppm"),
    )


_PRIO_K = 100  # sample size


@query(
    "corpus_priority_sample",
    oracle=f"""
    WITH w AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS wt,
               (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#'
                                     || text), 1, 8)) AS BIGINT) + 1)
                   / 4294967296.0 AS u
        FROM documents
    ), q AS (
        SELECT doc_id, wt, wt / u AS prio,
               row_number() OVER (ORDER BY wt / u DESC, doc_id) AS rn
        FROM w
    ), tau AS (
        SELECT coalesce(max(CASE WHEN rn = {_PRIO_K + 1} THEN prio END),
                        0.0) AS tau
        FROM q
    ), tot AS (
        SELECT CAST(sum(wt) AS BIGINT) AS total_weight FROM w
    )
    SELECT q.doc_id, q.wt,
           round(q.prio, 4) AS priority,
           round(greatest(q.wt * 1.0, tau.tau), 4) AS est_weight,
           tot.total_weight
    FROM q CROSS JOIN tau CROSS JOIN tot
    WHERE q.rn <= {_PRIO_K}
    """,
)
def corpus_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup, JACM'07): an EXACTLY-k
    weighted sample WITHOUT replacement — the complement of
    `corpus_importance_resample`'s independent Bernoulli thinning, for
    when the budget is a fixed document count rather than a keep rate.
    Each doc gets priority q = w/u (w = token count, u ~ U(0,1]); the
    top-k by priority are the sample, τ = the (k+1)-th priority is the
    threshold, and ŵ = max(w, τ) per kept doc is the UNBIASED
    subset-sum estimator (E[Σ ŵ over sample] = Σ w over corpus) — the
    property that lets a 100-doc sample answer token-budget questions
    about a 100 TB corpus. Both the sample membership AND the estimator
    weights are emitted, with the exact corpus total alongside for the
    honest single-draw comparison.

    Determinism discipline: u derives from md5(doc_id#text) (the
    importance_resample derandomization), and the priority w/u is ONE
    IEEE division — correctly rounded, bit-identical across engines —
    where the textbook A-ES key u^(1/w) would ride libm pow/log whose
    last-ULP behavior is NOT cross-engine portable (the ordering, not
    just the display, could fork). Ties broken by doc_id.

    Scale shape: priorities are map-side; top-(k+1) is
    TakeOrderedAndProject (per-partition heads, single merge — no
    global sort); τ and the total broadcast back onto the k-row
    sample."""
    docs = load_table(spark, sf_dir, "documents")
    wt = F.size(F.split("text", " ")).cast("long")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("#"),
                        F.col("text"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(4294967296.0)
    w = docs.select(
        "doc_id", wt.alias("wt"), (F.col("wt") / u).alias("prio")
    ).select("doc_id", "wt", "prio")
    from presto_truffle_spark.cache import scoped_persist

    w = scoped_persist(spark, "corpus.priosample.w", w)
    topk1 = w.orderBy(F.col("prio").desc(), "doc_id").limit(_PRIO_K + 1)
    # τ is the (k+1)-th priority; with n ≤ k docs there is no (k+1)-th,
    # and DLT prescribes ŵ = w exactly (the sample IS the corpus), so
    # τ degrades to 0 rather than min(prio) of the short frame.
    tau = topk1.agg(
        F.when(F.count(F.lit(1)) == _PRIO_K + 1, F.min("prio"))
        .otherwise(F.lit(0.0))
        .alias("tau")
    )
    tot = w.agg(F.sum("wt").cast("long").alias("total_weight"))
    ranked = topk1.select(
        "doc_id",
        "wt",
        "prio",
        F.row_number()
        .over(W.orderBy(F.col("prio").desc(), "doc_id"))
        .alias("rn"),
    )
    return (
        ranked.filter(F.col("rn") <= _PRIO_K)
        .crossJoin(F.broadcast(tau))
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "wt",
            F.round("prio", 4).alias("priority"),
            F.round(F.greatest(F.col("wt") * 1.0, F.col("tau")), 4).alias(
                "est_weight"
            ),
            "total_weight",
        )
    )


_CHUNK_TOK_LEN = 64  # tokens per training chunk
_CHUNK_TOK_STRIDE = 48  # token-window stride (16-token overlap); NOTE:
# distinct from the CHARACTER-chunk constants (_CHUNK_CHARS /
# _CHUNK_STRIDE) that text_chunk_overlap above bakes into its oracle —
# an EOF rebinding of _CHUNK_STRIDE in the first r12 draft silently
# changed that op's runtime stride while its f-string oracle kept 180
# (caught by the full-registry selfcheck; names are now disjoint).


@query(
    "corpus_chunk_windows",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), st AS (
        SELECT doc_id, toks, i AS chunk_start,
               row_number() OVER (PARTITION BY doc_id ORDER BY i)
                   AS chunk_id
        FROM t, unnest(generate_series(1, len(toks), {_CHUNK_TOK_STRIDE}))
             AS s(i)
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(chunk_start AS BIGINT) AS chunk_start,
           CAST(len(list_slice(toks, chunk_start,
                               chunk_start + {_CHUNK_TOK_LEN} - 1))
                AS BIGINT) AS chunk_len,
           array_to_string(list_slice(toks, chunk_start,
                                      chunk_start + {_CHUNK_TOK_LEN} - 1),
                           ' ') AS chunk_text
    FROM st
    """,
)
def corpus_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping token windows — the tokenize-and-chunk
    step every pretraining pipeline runs between cleaning and packing
    (documents become 64-token (_CHUNK_TOK_LEN) training sequences at
    stride 48 (_CHUNK_TOK_STRIDE), i.e. 16 tokens of overlap so no
    boundary context
    is lost; the final window per doc may be short and carries its
    true chunk_len so the packer — corpus_pack_bins — can decide).
    Emits the MAPPING rows (doc_id, chunk_id, chunk_start, chunk_len,
    chunk_text): corpus-linear output by design, ~L/stride rows per
    doc — the repo's mapping-not-mapped-rows convention does not apply
    because the chunks ARE the product here.

    Sibling disambiguation (capability-dedup note): `text_chunk_overlap`
    slides a CHARACTER window and emits chunk HASHES — the chunk-level
    dedup fingerprint primitive; this op slides a TOKEN window and
    emits the chunk TEXT — the training-sequence product a packer
    (corpus_pack_bins) consumes. Different grain, different output,
    different downstream.

    Determinism: pure integer arithmetic — arithmetic-progression
    starts, inclusive-clamped slices (Spark slice(toks, start, C) ≡
    DuckDB list_slice(toks, start, start+C-1), probed), chunk_id =
    row_number over the per-doc start order (unique, tie-free).

    Scale shape: one map-side explode per doc — no shuffle at all
    except the per-doc chunk_id window, which is partitioned BY doc_id
    (state = one doc's ≤L/stride starts). At 100 TB this is the
    archetypal embarrassingly-parallel pass."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    st = d.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                F.lit(1), F.size("toks"), F.lit(_CHUNK_TOK_STRIDE)
            )
        ).alias("chunk_start"),
    )
    chunk = F.slice(F.col("toks"), F.col("chunk_start"), F.lit(_CHUNK_TOK_LEN))
    w = W.partitionBy("doc_id").orderBy("chunk_start")
    return st.select(
        "doc_id",
        F.row_number().over(w).cast("long").alias("chunk_id"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.size(chunk).cast("long").alias("chunk_len"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


_CURR_PARTS = 32  # range partitions for the distributed curriculum rank


@query(
    "corpus_curriculum_interleave",
    oracle="""
    WITH r AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS wr
        FROM documents
    )
    SELECT doc_id, source,
           CAST(n_chars AS BIGINT) AS difficulty,
           CAST(wr AS BIGINT) AS within_rank,
           CAST(row_number() OVER (ORDER BY wr, source, doc_id)
                AS BIGINT) AS position
    FROM r
    """,
)
def corpus_curriculum_interleave(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Curriculum training order with source interleaving (Bengio et
    al. ICML'09 easy-first curriculum + the round-robin source mixing
    every multi-source pretraining reader does): rank each doc WITHIN
    its source by a difficulty proxy (n_chars ascending — short docs
    first), then emit the global training `position` that takes rank-1
    docs of every source, then rank-2, … — so the schedule ramps
    difficulty without ever bursting a single source's distribution.
    The complement of `corpus_temperature_sampling_plan` (which emits
    per-source RATES) and `corpus_pack_bins_sorted` (which packs a
    fixed order): this op emits the ORDER itself.

    Scale shape — neither window a global sort: the within-source rank
    comes from the SNM distributed-rank discipline (range partition by
    (source, difficulty, doc_id) → per-partition row_number + the lazy
    ≤{parts}-row offset prefix sum → exact source-major global rank,
    then within_rank = rank − min_rank(source) + 1 via a source-count
    broadcast) — NOT a per-source window, which would funnel each
    source's whole corpus through one task (the
    corpus_quality_calibrated rule). The interleaved position is then
    CLOSED-FORM from (within_rank r, source s) and the per-source
    count table: docs scheduled before (r, s) are Σ_s' min(cnt_s',
    r−1) rank-below docs plus the same-rank sources ordering before s
    — a per-row fold over the broadcast ≤|sources|-entry count array
    (metadata scale), zero additional shuffle. The 1-row
    crossJoin(broadcast) carrying the array is the benign pattern;
    the offsets window is the whitelisted ≤32-row metadata prefix sum.

    Determinism: pure integers end to end (length proxy, counts,
    ranks); ties broken by doc_id everywhere.
    """
    from presto_truffle_spark.cache import scoped_persist
    from presto_truffle_spark.operators.dedup import _snm_offsets

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("difficulty")
    )
    ranged = d.repartitionByRange(
        _CURR_PARTS, "source", "difficulty", "doc_id"
    ).withColumn("pid", F.spark_partition_id())
    # pid is stable only within one materialization — persist before
    # the counts/main consumers fork (the SNM discipline).
    ranged = scoped_persist(spark, "corpus.curriculum.ranged", ranged)
    offsets = _snm_offsets(
        ranged.groupBy("pid").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    local_rn = F.row_number().over(
        W.partitionBy("pid").orderBy("source", "difficulty", "doc_id")
    )
    g = ranged.join(F.broadcast(offsets), "pid").select(
        "doc_id",
        "source",
        "difficulty",
        (local_rn + F.col("off")).cast("long").alias("g"),
    )
    g = scoped_persist(spark, "corpus.curriculum.g", g)
    # source-major global rank → within-source rank via the ≤|sources|
    # min-rank table (metadata; broadcast)
    src_min = g.groupBy("source").agg(F.min("g").alias("g0"))
    ranked = g.join(F.broadcast(src_min), "source").select(
        "doc_id",
        "source",
        "difficulty",
        (F.col("g") - F.col("g0") + 1).alias("within_rank"),
    )
    # per-source count array (sorted for a deterministic fold order),
    # carried to every row by the benign 1-row broadcast cross join
    counts = (
        g.groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct("source", "cnt"))
            ).alias("cnts")
        )
    )
    r, s = F.col("within_rank"), F.col("source")
    below = F.aggregate(
        F.col("cnts"),
        F.lit(0).cast("long"),
        lambda acc, e: acc + F.least(e["cnt"], r - 1),
    )
    same_rank_before = F.size(
        F.filter(F.col("cnts"), lambda e: (e["cnt"] >= r) & (e["source"] < s))
    ).cast("long")
    return ranked.crossJoin(F.broadcast(counts)).select(
        "doc_id",
        "source",
        "difficulty",
        "within_rank",
        (below + same_rank_before + 1).alias("position"),
    )


@query(
    "corpus_lincoln_petersen_vocab",
    oracle="""
    WITH tp AS (
        SELECT tok,
               max(CASE WHEN par = 0 THEN 1 ELSE 0 END) AS in_a,
               max(CASE WHEN par = 1 THEN 1 ELSE 0 END) AS in_b
        FROM (SELECT CAST(substr(source, 4) AS INTEGER) % 2 AS par,
                     unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY tok
    ), s AS (
        SELECT CAST(sum(in_a) AS BIGINT) AS n1,
               CAST(sum(in_b) AS BIGINT) AS n2,
               CAST(sum(in_a * in_b) AS BIGINT) AS m,
               CAST(count(*) AS BIGINT) AS observed_union
        FROM tp
    )
    SELECT n1, n2, m, observed_union,
           round(n1 * 1.0 * n2 / nullif(m, 0), 4) AS petersen_estimate,
           round((n1 + 1.0) * (n2 + 1) / (m + 1) - 1, 4)
               AS chapman_estimate
    FROM s
    """,
)
def corpus_lincoln_petersen_vocab(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TWO-SAMPLE capture-recapture vocabulary estimate
    (Lincoln-Petersen + the bias-corrected Chapman 1951 form) — the
    paired-sample sibling of `text_chao1_vocabulary_richness` (which
    is abundance-based on ONE sample; the r13 screen parked this op
    until a paired-sample fixture shape existed — the source column
    IS that shape). Capture A = the vocabulary seen by even-numbered
    sources, capture B = odd-numbered: two independent crawls of the
    same underlying language. n1, n2 marked-token counts, m the
    recapture overlap; N̂_Petersen = n1·n2/m, N̂_Chapman =
    (n1+1)(n2+1)/(m+1) − 1 (finite-sample unbiased when captures are
    independent). Against `observed_union` the estimate says how much
    vocabulary BOTH crawls missed — the coverage-planning artifact
    (Chao1 answers 'how much is unseen given counts'; LP answers it
    from two presence/absence sweeps without abundances).

    Determinism: presence flags and overlaps are exact integers from
    one (token → max-flag) fold; the only doubles are the two final
    estimator divisions, rounded 4dp with byte-matched expression
    shapes.

    Scale shape: one map-combinable explode→groupBy(token) fold (the
    same vocab-bounded shuffle every LM op pays), then a 1-row
    presence fold. 100 TB-safe; output is one row."""
    d = load_table(spark, sf_dir, "documents").select(
        (F.expr("CAST(substring(source, 4) AS INT)") % 2).alias("par"),
        F.explode(F.split(F.col("text"), " ")).alias("tok"),
    )
    tp = d.groupBy("tok").agg(
        F.max(F.when(F.col("par") == 0, 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("par") == 1, 1).otherwise(0)).alias("in_b"),
    )
    s = tp.agg(
        F.sum("in_a").cast("long").alias("n1"),
        F.sum("in_b").cast("long").alias("n2"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("m"),
        F.count(F.lit(1)).cast("long").alias("observed_union"),
    )
    return s.select(
        "n1",
        "n2",
        "m",
        "observed_union",
        F.round(
            F.col("n1") * F.lit(1.0) * F.col("n2")
            / F.nullif(F.col("m"), F.lit(0)),
            4,
        ).alias("petersen_estimate"),
        F.round(
            (F.col("n1") + F.lit(1.0)) * (F.col("n2") + 1)
            / (F.col("m") + 1)
            - 1,
            4,
        ).alias("chapman_estimate"),
    )


# Number of doc_id-ordered ingest batches the turnover op folds the
# corpus into. 12 keeps every batch big enough at sf0.001 (500 docs ->
# ~42 docs/batch) that per-batch vocabulary stays non-trivial.
_TURNOVER_PERIODS = 12


@query(
    "corpus_vocab_turnover",
    oracle=f"""
    WITH maxd AS (
        SELECT max(doc_id) AS md FROM documents
    ), d AS (
        SELECT (doc_id * {_TURNOVER_PERIODS}) // (md + 1) AS period, text
        FROM documents CROSS JOIN maxd
    ), tok AS (
        SELECT DISTINCT period, token
        FROM (SELECT period, unnest(string_split(text, ' ')) AS token
              FROM d)
    ), life AS (
        SELECT token, min(period) AS fp, max(period) AS lp
        FROM tok GROUP BY 1
    ), per AS (
        SELECT t.period,
               CAST(count(*) AS BIGINT) AS n_active,
               CAST(sum(CASE WHEN l.fp = t.period THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new,
               CAST(sum(CASE WHEN l.lp = t.period THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_retiring,
               CAST(sum(CASE WHEN l.fp = t.period AND l.lp = t.period
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_ephemeral
        FROM tok t JOIN life l USING (token)
        GROUP BY 1
    )
    SELECT CAST(period AS BIGINT) AS period, n_active, n_new,
           n_retiring, n_ephemeral,
           round(n_new * 1.0 / n_active, 6) AS new_ratio
    FROM per
    """,
)
def corpus_vocab_turnover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST/LAST-OCCURRENCE vocabulary turnover per ingest batch — the
    churn diagnostic `text_heaps_law_fit` (cumulative prefix growth)
    cannot see: per disjoint period, how much vocabulary is NEW (first
    occurrence), how much makes its LAST appearance (retiring), and how
    much is EPHEMERAL (born and dead in one batch — the typo/ID/spam
    signature a tokenizer budget cares about). A drifting corpus shows
    sustained n_new with matched n_retiring; a closed vocabulary shows
    both collapsing to zero after batch 0 — which crawl snapshots to
    re-ingest and when to re-train the tokenizer both read off this
    table. The parked turnover analytic from VERDICT r14 #4: batches
    here are doc_id-ordered twelfths (portable in both engines via
    exact integer division); on the DATED rich fixture the same
    machinery runs over real topic-staggered ingest dates
    (tests/test_vocab_turnover.py pins the structural signal — new
    topics bring new frequent vocabulary).

    Determinism: batch assignment is exact BIGINT `div` (the DuckDB
    `//` spelling — `/` on BIGINTs is FLOAT division there, r14
    finding); all counts are exact presence folds; the single double
    ratio is rounded 6dp with byte-matched expression shape.

    Scale shape: explode -> map-side-distinct (period, token) — the
    same vocab-bounded shuffle every LM op pays; then a token-keyed
    groupBy for lifespans, a token-keyed join of two vocab-sized
    frames, and a {_TURNOVER_PERIODS}-row fold. The 1-row max(doc_id)
    side is broadcast. Nothing downstream of the distinct is
    corpus-volume. 100 TB-safe."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    maxd = docs.agg(F.max("doc_id").alias("md"))
    d = docs.crossJoin(F.broadcast(maxd)).select(
        F.expr(
            f"(doc_id * {_TURNOVER_PERIODS}) div (md + 1)"
        ).alias("period"),
        "text",
    )
    tok = (
        d.select("period", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .distinct()
    )
    # vocab-bounded presence frame with TWO consumers inside the fold
    # (lifespan groupBy + the rejoin) — unpersisted, each replays the
    # corpus tokenize (r15 rescan audit: 4 document scans -> 2; the
    # remaining second scan is the 1-row max(doc_id) column read).
    from presto_truffle_spark.cache import scoped_persist

    tok = scoped_persist(spark, "corpus.turnover.tok", tok)
    return _turnover_fold(tok)


def _turnover_fold(tok: DataFrame) -> DataFrame:
    """Per-period first/last-occurrence churn over a DISTINCT
    (period, token) presence frame — shared by the registered
    doc_id-batched op and the dated-rich-fixture test, which feeds it
    real ingest-date periods instead."""
    life = tok.groupBy("token").agg(
        F.min("period").alias("fp"), F.max("period").alias("lp")
    )
    per = (
        tok.join(life, "token")
        .groupBy("period")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.sum(
                F.when(F.col("fp") == F.col("period"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_new"),
            F.sum(
                F.when(F.col("lp") == F.col("period"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_retiring"),
            F.sum(
                F.when(
                    (F.col("fp") == F.col("period"))
                    & (F.col("lp") == F.col("period")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_ephemeral"),
        )
    )
    return per.select(
        F.col("period").cast("long").alias("period"),
        "n_active",
        "n_new",
        "n_retiring",
        "n_ephemeral",
        F.round(F.col("n_new") * 1.0 / F.col("n_active"), 6).alias(
            "new_ratio"
        ),
    )


# Recency-weighted sampling: the newest ingest batch keeps everything
# and each step back in time multiplies the keep-rate by 3/4 — the
# exact-rational decay whose per-period thresholds are INTEGERS
# (3^age * 4^(P-1-age) out of 4^(P-1)), so selection is pure BIGINT
# arithmetic on both engines. P reuses the turnover op's batch count.
_RWS_PERIODS = _TURNOVER_PERIODS
_RWS_M = 4 ** (_RWS_PERIODS - 1)
_RWS_THRESH = {
    p: 3 ** (_RWS_PERIODS - 1 - p) * 4 ** p for p in range(_RWS_PERIODS)
}


def _rws_threshold_case() -> str:
    """CASE expression mapping period -> integer keep-threshold,
    identical text on both engines."""
    arms = " ".join(
        f"WHEN {p} THEN {t}" for p, t in sorted(_RWS_THRESH.items())
    )
    return f"CASE period {arms} END"


@query(
    "corpus_recency_weighted_sample",
    oracle=f"""
    WITH maxd AS (
        SELECT max(doc_id) AS md FROM documents
    ), d AS (
        SELECT doc_id,
               (doc_id * {_RWS_PERIODS}) // (md + 1) AS period,
               length(text) AS n_chars
        FROM documents CROSS JOIN maxd
    ), s AS (
        SELECT period, doc_id, n_chars,
               CASE WHEN (doc_id * 48271) % {_RWS_M}
                         < {_rws_threshold_case()}
                    THEN 1 ELSE 0 END AS keep
        FROM d
    )
    SELECT CAST(period AS BIGINT) AS period,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(keep) AS BIGINT) AS n_sampled,
           CAST(sum(keep * n_chars) AS BIGINT) AS sampled_chars,
           round(sum(keep) * 1.0 / count(*), 6) AS sample_rate,
           round({_rws_threshold_case()} * 1.0 / {_RWS_M}, 6)
               AS target_rate
    FROM s
    GROUP BY period
    """,
)
def corpus_recency_weighted_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RECENCY-WEIGHTED corpus sampling (exponential time decay) — the
    time-axis mixing policy every refresh-sensitive training pipeline
    applies (newest crawl kept whole, each older snapshot down-weighted
    geometrically) and the op that completes the corpus-management
    time axis `corpus_vocab_turnover` opened: turnover DIAGNOSES drift
    per batch; this op ACTS on it, emitting the per-batch keep ledger
    a budgeted recency-heavy mix is built from. Decay is (3/4)^age per
    doc_id-twelfth batch (the driver fixture carries no date — the
    same portable batching as turnover; the DATED rich fixture test
    feeds real ingest-date periods and pins the discriminative
    readout: the sampled mix's mean date shifts measurably recent).

    Selection is DETERMINISTIC importance sampling, not rand(): doc i
    is kept iff (i * 48271) mod 4^11 < 3^age * 4^(11-age) — the
    threshold is the decay rational with denominator 4^11 held as an
    exact BIGINT, so the keep decision, the per-period counts, and the
    realized-vs-target rate comparison are all integer-exact on both
    engines (the repo's key-derived-hash convention; reproducible
    sample membership is itself a data-governance requirement — the
    same doc set is re-selectable from the ledger alone).

    Scale shape: one scan computes period, hash, and keep per doc
    (map-only — the 1-row max(doc_id) broadcast is the only other
    input); the readout is a {_RWS_PERIODS}-row map-combinable fold.
    No joins, no windows, nothing downstream of the scan is
    corpus-volume. The sample itself never materializes here (the
    ledger is the contract; a pipeline chains .where(keep) on the same
    predicate). 100 TB-safe."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_chars")
    )
    maxd = docs.agg(F.max("doc_id").alias("md"))
    d = docs.crossJoin(F.broadcast(maxd)).select(
        "doc_id",
        "n_chars",
        F.expr(f"(doc_id * {_RWS_PERIODS}) div (md + 1)").alias(
            "period"
        ),
    )
    return _recency_sample_fold(d)


def _recency_sample_fold(d: DataFrame) -> DataFrame:
    """Per-period keep ledger over a (doc_id, period, n_chars) frame —
    shared by the registered doc_id-batched op and the dated-rich-
    fixture test, which feeds real ingest-date periods (clamped to
    [0, P-1]) instead."""
    thresh = _rws_threshold_case()
    s = d.select(
        "period",
        "n_chars",
        F.when(
            (F.col("doc_id") * 48271) % _RWS_M < F.expr(thresh), 1
        )
        .otherwise(0)
        .alias("keep"),
    )
    return (
        s.groupBy("period")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("keep").cast("long").alias("n_sampled"),
            F.sum(F.col("keep") * F.col("n_chars"))
            .cast("long")
            .alias("sampled_chars"),
            F.round(
                F.sum("keep") * 1.0 / F.count(F.lit(1)), 6
            ).alias("sample_rate"),
        )
        .select(
            F.col("period").cast("long").alias("period"),
            "n_docs",
            "n_sampled",
            "sampled_chars",
            "sample_rate",
            F.round(F.expr(thresh) * 1.0 / F.lit(_RWS_M), 6).alias(
                "target_rate"
            ),
        )
    )
