"""LSH degenerate-bucket guard (round-1 verdict item #6)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_capped_lsh_identical_pairs_on_fixture(spark, sf_dir):
    """With a cap generous for the fixture (no bucket exceeds it), the
    guarded pipeline must return exactly the unguarded pair set."""
    from presto_truffle_spark.operators.dedup import (
        dedup_lsh_bucket_guard,
        dedup_minhash_lsh,
        dedup_minhash_lsh_capped,
    )

    guard = dedup_lsh_bucket_guard(spark, sf_dir).collect()[0]
    assert guard.n_dropped_buckets == 0, "fixture should not trip the cap"
    assert _pairs(dedup_minhash_lsh_capped(spark, sf_dir)) == _pairs(
        dedup_minhash_lsh(spark, sf_dir)
    )


def test_tiny_cap_drops_hot_buckets(spark, sf_dir):
    """A cap of 1 admits no bucket with 2+ docs, so NO candidate pairs can
    form — proving the guard actually gates the pair join."""
    from presto_truffle_spark.operators.dedup import minhash_candidates

    assert minhash_candidates(spark, sf_dir, bucket_cap=1).count() == 0


def test_minhash_signature_deterministic_and_seeded(spark, sf_dir):
    """Regression for the round-2 lambda-binding bug: signatures must be
    identical across separate invocations AND match an independent python
    recomputation (md5(f"{seed}|{shingle_hash}") per seed)."""
    import hashlib

    from presto_truffle_spark.operators.dedup import (
        _N_HASHES,
        _minhash_sig_col,
        _shingle_hashes_col,
        _shingles_col,
    )
    from presto_truffle_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents").filter(
        F.size(F.split(F.col("text"), " ")) >= 3
    ).limit(5)
    sig_df = d.select(
        "doc_id",
        _shingle_hashes_col(_shingles_col()).alias("sh"),
        _minhash_sig_col(_shingle_hashes_col(_shingles_col())).alias("sig"),
    )
    rows1 = {r.doc_id: r.sig for r in sig_df.collect()}
    rows2 = {r.doc_id: r.sig for r in sig_df.collect()}
    assert rows1 == rows2
    for r in sig_df.collect():
        expect = [
            min(hashlib.md5(f"{s}|{h}".encode()).hexdigest() for h in r.sh)
            for s in range(_N_HASHES)
        ]
        assert list(r.sig) == expect


def test_simhash_hamming_banding_lossless(spark, sf_dir):
    """The banded hamming lookup must return EXACTLY the pairs a naive
    all-pairs scan finds at the threshold — the pigeonhole guarantee
    (4 bands, hamming <= 3 => >= 1 band equal), proven in-engine on the
    fixture (the DuckDB oracle proves the same cross-engine)."""
    from presto_truffle_spark.operators.dedup import (
        _SIMHASH_MAX_HAMMING,
        _WIDE_FP,
        dedup_simhash_hamming,
    )
    from presto_truffle_spark.catalog import load_table

    banded = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup_simhash_hamming(spark, sf_dir).collect()
    }
    fps = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_WIDE_FP} AS simhash"
    )
    a = fps.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = fps.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    naive = {
        (r.doc_a, r.doc_b): r.hamming
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.expr("bit_count(sa ^ sb)").cast("int"))
        .filter(F.col("hamming") <= _SIMHASH_MAX_HAMMING)
        .collect()
    }
    assert banded == naive
    assert all(h <= _SIMHASH_MAX_HAMMING for h in banded.values())
    assert all(da < db for (da, db) in banded)


def test_simhash_hamming_plan_banded_not_cartesian(spark, sf_dir):
    """The pair join must be a band-key equi-join (shuffle or broadcast
    hash join on band_id/band_val), never a cartesian/nested-loop product
    — the property that keeps it off the O(n^2) path at 100 TB."""
    from presto_truffle_spark.operators.dedup import dedup_simhash_hamming

    plan = dedup_simhash_hamming(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_rate_estimate_group_complete_sampling(spark, sf_dir):
    """dedup_rate_estimate: the content-hash sample keeps duplicate
    groups intact by construction; the estimator must agree exactly with
    a direct recomputation of both rates, and at sf0.1 (the only fixture
    with real duplicates) the actual rate must be positive."""
    from presto_truffle_spark.catalog import load_table
    from presto_truffle_spark.operators.dedup import (
        _SAMPLE_NIBBLE,
        dedup_rate_estimate,
    )

    r = dedup_rate_estimate(spark, sf_dir).collect()[0]
    d = load_table(spark, sf_dir, "documents")
    n = d.count()
    groups = d.groupBy("text").count()
    dup = groups.agg(F.sum(F.col("count") - 1)).collect()[0][0]
    assert r.n_docs == n and r.dup_docs == dup
    in_sample = d.filter(
        F.substring(F.md5(F.col("text").cast("binary")), 1, 1).isin(
            *list(_SAMPLE_NIBBLE)
        )
    ).count()
    assert r.n_sampled == in_sample
    sf01 = dedup_rate_estimate(spark, "/root/testdata/sf0.1").collect()[0]
    assert sf01.dup_docs > 0 and sf01.dup_rate_actual > 0


def test_prefix_filter_candidates_bounded_and_exact(spark, sf_dir):
    """The prefix-filter join must (a) generate FAR fewer candidates than
    the naive shared-token pair space (15x reduction measured at sf0.01)
    and (b) stay lossless — every surviving pair meets the threshold with
    canonical doc_a < doc_b ordering. Losslessness vs brute force is the
    driver oracle's job; this pins the candidate-boundedness claim so a
    regression in the prefix-length arithmetic (which could silently fall
    back to indexing ALL tokens and still pass the oracle) fails loudly."""
    from pyspark.sql import Window as W
    from presto_truffle_spark.operators.dedup import (
        _JACCARD_THRESHOLD,
        _lsh_tables,
        dedup_prefix_filter_join,
    )

    sh = _lsh_tables(spark, sf_dir)["sh"]
    toks = sh.select("doc_id", F.explode("shingles").alias("tok"))
    n_tok = toks.count()
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    t = _JACCARD_THRESHOLD
    ranked = (
        toks.join(freq, "tok")
        .withColumn("sz", F.count(F.lit(1)).over(W.partitionBy("doc_id")))
        .withColumn(
            "rn",
            F.row_number().over(W.partitionBy("doc_id").orderBy("df", "tok")),
        )
    )
    n_pfx = ranked.filter(
        F.col("rn") <= F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1
    ).count()
    # Prefix index must be a strict subset — the t=0.5 arithmetic keeps
    # roughly half the tokens (51% measured; 65% is the loud-failure bar).
    assert 0 < n_pfx < 0.65 * n_tok, (n_pfx, n_tok)

    out = dedup_prefix_filter_join(spark, sf_dir).collect()
    assert len(out) > 0, "fixture has near-dup docs; join must engage"
    for r in out:
        assert r.doc_a < r.doc_b
        assert r.jaccard >= t
