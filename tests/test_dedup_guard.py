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
