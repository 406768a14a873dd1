"""Golden-value unit tests on tiny literal DataFrames.

Mirrors the reference's test strategy (SURVEY.md §5.1): deterministic
inputs with hand-computed expected outputs, like the golden value in
``TpchQuery6.java:38-39``.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_q6_golden_on_literal_rows(spark, tmp_path):
    """Hand-computed Q6 over 4 literal rows (golden-value style)."""
    rows = [
        # (shipdate, discount, quantity, price) -> passes?
        Row(l_shipdate=dt.datetime(1996, 6, 1), l_discount=0.06, l_quantity=10.0,
            l_extendedprice=1000.0),  # pass: 60.0
        Row(l_shipdate=dt.datetime(1996, 6, 1), l_discount=0.04, l_quantity=10.0,
            l_extendedprice=1000.0),  # fail: discount
        Row(l_shipdate=dt.datetime(1997, 6, 1), l_discount=0.06, l_quantity=10.0,
            l_extendedprice=1000.0),  # fail: date
        Row(l_shipdate=dt.datetime(1996, 6, 1), l_discount=0.07, l_quantity=30.0,
            l_extendedprice=1000.0),  # fail: quantity
    ]
    d = tmp_path / "lineitem.parquet"
    spark.createDataFrame(rows).write.mode("overwrite").parquet(str(d))

    from presto_truffle_spark.operators.relational import q6

    # q6 loads f"{sf_dir}/lineitem.parquet"
    out = q6(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0]["revenue"] == 60.0


def test_asof_join_semantics(spark, tmp_path):
    """As-of join: purchase matches latest signup at-or-before, per user."""
    t = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return t + dt.timedelta(minutes=minutes)

    rows = [
        Row(event_id=1, ts=ts(0), user_id=1, event_type="signup", value=0.0, props=None),
        Row(event_id=2, ts=ts(10), user_id=1, event_type="purchase", value=5.0, props=None),
        Row(event_id=3, ts=ts(20), user_id=1, event_type="signup", value=0.0, props=None),
        Row(event_id=4, ts=ts(30), user_id=1, event_type="purchase", value=7.0, props=None),
        # user 2: purchase before any signup -> NULL signup_ts
        Row(event_id=5, ts=ts(5), user_id=2, event_type="purchase", value=1.0, props=None),
        Row(event_id=6, ts=ts(50), user_id=2, event_type="signup", value=0.0, props=None),
        # user 3: signup at the same instant as purchase -> matches (>=)
        Row(event_id=7, ts=ts(0), user_id=3, event_type="signup", value=0.0, props=None),
        Row(event_id=8, ts=ts(0), user_id=3, event_type="purchase", value=2.0, props=None),
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )

    from presto_truffle_spark.operators.timeseries import events_asof_join

    out = {r["event_id"]: r for r in events_asof_join(spark, str(tmp_path)).collect()}
    assert out[2]["signup_ts"] == ts(0)
    assert out[4]["signup_ts"] == ts(20)
    assert out[5]["signup_ts"] is None
    assert out[8]["signup_ts"] == ts(0)


def test_sessionize_islands(spark, tmp_path):
    """Gap > 30 min starts a new session."""
    t = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return t + dt.timedelta(minutes=minutes)

    rows = [
        Row(event_id=1, ts=ts(0), user_id=1, event_type="x", value=0.0, props=None),
        Row(event_id=2, ts=ts(29), user_id=1, event_type="x", value=0.0, props=None),
        Row(event_id=3, ts=ts(60), user_id=1, event_type="x", value=0.0, props=None),
        Row(event_id=4, ts=ts(200), user_id=1, event_type="x", value=0.0, props=None),
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )

    from presto_truffle_spark.operators.timeseries import events_sessionize_islands

    out = {r["event_id"]: r["session_seq"] for r in
           events_sessionize_islands(spark, str(tmp_path)).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 2}


def test_minhash_identical_docs_are_candidates(spark, tmp_path):
    """Two identical documents must be LSH candidates with jaccard 1.0."""
    text = " ".join(f"tok{i}" for i in range(30))
    other = " ".join(f"zzz{i}" for i in range(30))
    rows = [
        Row(doc_id=1, text=text, lang="en", source="s", n_chars=len(text)),
        Row(doc_id=2, text=text, lang="en", source="s", n_chars=len(text)),
        Row(doc_id=3, text=other, lang="en", source="s", n_chars=len(other)),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )

    from presto_truffle_spark.operators.dedup import dedup_minhash_lsh

    out = dedup_minhash_lsh(spark, str(tmp_path)).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out}
    assert pairs == {(1, 2): 1.0}


def test_simhash_deterministic_and_equal_for_dups(spark, tmp_path):
    text = "alpha beta gamma delta epsilon zeta"
    rows = [
        Row(doc_id=1, text=text, lang="en", source="s", n_chars=1),
        Row(doc_id=2, text=text, lang="en", source="s", n_chars=1),
        Row(doc_id=3, text="totally different words here now", lang="en", source="s",
            n_chars=1),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )

    from presto_truffle_spark.operators.dedup import dedup_simhash

    out = {r["doc_id"]: r["simhash"] for r in dedup_simhash(spark, str(tmp_path)).collect()}
    assert out[1] == out[2]
    assert 0 <= out[1] < 2 ** 16


def test_cosine_topk_self_similarity(spark, tmp_path):
    """A duplicate of the query vector must rank first with cos_sim 1.0."""
    q = [1.0] + [0.0] * 63
    dup = [2.0] + [0.0] * 63       # same direction
    orth = [0.0, 3.0] + [0.0] * 62  # orthogonal
    mix = [1.0, 1.0] + [0.0] * 62   # cos = 1/sqrt(2)
    rows = [
        Row(vec_id=0, embedding=q, label=0),
        Row(vec_id=10, embedding=dup, label=1),
        Row(vec_id=11, embedding=orth, label=2),
        Row(vec_id=12, embedding=mix, label=3),
    ]
    df = spark.createDataFrame(rows)
    df = df.withColumn("embedding", F.col("embedding").cast("array<float>"))
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    from presto_truffle_spark.operators.similarity import ann_cosine_topk

    out = [(r["cid"], r["cos_sim"]) for r in
           ann_cosine_topk(spark, str(tmp_path)).orderBy(F.desc("cos_sim")).collect()]
    assert out[0] == (10, 1.0)
    assert abs(out[1][1] - 0.707107) < 1e-6
    assert out[2] == (11, 0.0)


def test_window_topk_per_group_bound(spark, sf_dir):
    from presto_truffle_spark.operators.windows import window_topk_per_group

    out = window_topk_per_group(spark, sf_dir)
    counts = out.groupBy("o_custkey").count().agg(F.max("count")).collect()[0][0]
    assert counts <= 3


def test_multimodal_meta_matches_fake_decode(spark, sf_dir):
    from presto_truffle_spark.operators.multimodal import (
        fake_decode_meta,
        multimodal_extract_meta,
    )

    row = multimodal_extract_meta(spark, sf_dir).orderBy("media_id").first()
    w, h, nf = fake_decode_meta(b"x" * row["byte_len"])
    assert (row["width"], row["height"], row["n_frames"]) == (w, h, nf)


def test_decode_image_stub_raises():
    import pytest

    from presto_truffle_spark.operators.multimodal import decode_image

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; stub not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG fake")


def test_compaction_reduces_file_count(spark, sf_dir):
    """sink_compaction: 64 fragments in, <= 4 data files out, same rows."""
    import glob
    import os

    from presto_truffle_spark.sources.io import _scoped_scratch, sink_compaction

    n_rows = sink_compaction(spark, sf_dir).agg({"n": "sum"}).collect()[0][0]
    frag = len(glob.glob(os.path.join(_scoped_scratch(spark, "li_fragmented"), "part-*")))
    comp = len(glob.glob(os.path.join(_scoped_scratch(spark, "li_compacted"), "part-*")))
    assert frag == 64 and comp <= 4
    from presto_truffle_spark.catalog import load_table

    assert n_rows == load_table(spark, sf_dir, "lineitem").count()
