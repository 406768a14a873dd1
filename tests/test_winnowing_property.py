"""Winnowing guarantee, property-tested against a Python reference.

dedup_winnowing builds per-document fingerprints as the minimum 3-gram
hash of every sliding 4-window (dedup.py). The algorithmic guarantees
worth pinning before its first driver verification:

  * the Spark slice+zip_with sliding-min kernel computes EXACTLY
    min(h[i..i+3]) for every window (reference implementation below);
  * fingerprints are a subset of the document's 3-gram hashes;
  * any 6-token run shared verbatim by two documents yields at least one
    shared fingerprint (winnowing's local-match guarantee with shingle=3,
    window=4: a shared run of shingle+window-1 tokens spans a full common
    window, whose min is identical on both sides).
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

_SHINGLE, _WIN = 3, 4


def _ref_fingerprints(tokens: list[str]) -> set[str]:
    if len(tokens) < _SHINGLE + _WIN - 1:
        return set()
    grams = [
        " ".join(tokens[i : i + _SHINGLE])
        for i in range(len(tokens) - _SHINGLE + 1)
    ]
    hashes = [hashlib.md5(g.encode()).hexdigest()[:16] for g in grams]
    return {
        min(hashes[i : i + _WIN]) for i in range(len(hashes) - _WIN + 1)
    }


def _spark_fingerprints(spark, docs: list[tuple[int, str]]) -> dict[int, set]:
    # mirror of dedup.dedup_winnowing's kernel up to the posting explode
    df = spark.createDataFrame(docs, "doc_id long, text string")
    t = (
        df.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") >= _SHINGLE + _WIN - 1)
    )
    m = F.col("n") - (_SHINGLE - 1)
    grams = F.zip_with(
        F.zip_with(
            F.slice("toks", F.lit(1), m),
            F.slice("toks", F.lit(2), m),
            lambda x, y: F.concat_ws(" ", x, y),
        ),
        F.slice("toks", F.lit(3), m),
        lambda xy, z: F.concat_ws(" ", xy, z),
    )
    g = t.select(
        "doc_id",
        F.transform(grams, lambda gr: F.substring(F.md5(gr), 1, 16)).alias("hashes"),
    ).withColumn("m2", F.size("hashes") - (_WIN - 1))
    mins = F.zip_with(
        F.zip_with(
            F.slice("hashes", F.lit(1), F.col("m2")),
            F.slice("hashes", F.lit(2), F.col("m2")),
            lambda x, y: F.least(x, y),
        ),
        F.zip_with(
            F.slice("hashes", F.lit(3), F.col("m2")),
            F.slice("hashes", F.lit(4), F.col("m2")),
            lambda x, y: F.least(x, y),
        ),
        lambda xy, zw: F.least(xy, zw),
    )
    rows = g.select("doc_id", F.array_distinct(mins).alias("f")).collect()
    return {r.doc_id: set(r.f) for r in rows}


def test_sliding_min_kernel_matches_reference(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(6, 40))))
        for i in range(25)
    ]
    got = _spark_fingerprints(spark, docs)
    for doc_id, text in docs:
        want = _ref_fingerprints(text.split(" "))
        if want:
            assert got[doc_id] == want, doc_id
            # fingerprints ⊆ gram hashes by construction of the reference
        else:
            assert doc_id not in got  # short docs filtered out


def test_shared_six_token_run_shares_a_fingerprint(spark):
    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(50)]
    run = "alpha beta gamma delta epsilon zeta"  # 6 = shingle + window - 1
    docs = []
    for i in range(10):
        pre = " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 12)))
        post = " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 12)))
        docs.append((i, f"{pre} {run} {post}"))
    got = _spark_fingerprints(spark, docs)
    shared = set.intersection(*got.values())
    assert shared, "documents sharing a 6-token run must share a fingerprint"
