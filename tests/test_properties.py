"""Property-based differential tests (hypothesis).

The engine's strongest correctness argument is agreement between
independent implementations. These properties extend that past the DuckDB
oracle: the as-of join against pandas' merge_asof, and Jaccard identities
for the dedup kernels — on RANDOM inputs, not just the fixtures.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# One shared strategy: small event logs with colliding users/timestamps.
_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),  # user_id
        st.integers(min_value=0, max_value=500),  # minutes offset
        st.sampled_from(["purchase", "signup"]),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_events)
def test_asof_join_matches_pandas_merge_asof(spark_prop, tmp_path_factory, events):
    """events_asof_join ≡ pd.merge_asof(direction='backward') per user."""
    spark = spark_prop
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=m), u, t, float(i), None)
        for i, (u, m, t) in enumerate(events)
    ]
    tmp = tmp_path_factory.mktemp("asof")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp / "events.parquet"))

    from presto_truffle_spark.operators.timeseries import events_asof_join

    got = {
        r["event_id"]: r["signup_ts"]
        for r in events_asof_join(spark, str(tmp)).collect()
    }

    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    purchases = pdf[pdf.event_type == "purchase"].sort_values("ts", kind="stable")
    signups = (
        pdf[pdf.event_type == "signup"][["user_id", "ts"]]
        .rename(columns={"ts": "signup_ts"})
        .sort_values("signup_ts", kind="stable")
    )
    if len(purchases) == 0:
        assert got == {}
        return
    merged = pd.merge_asof(
        purchases,
        signups,
        left_on="ts",
        right_on="signup_ts",
        by="user_id",
        direction="backward",  # latest signup_ts <= ts, ties included
    )
    expected = {
        int(r.event_id): (None if pd.isna(r.signup_ts) else r.signup_ts.to_pydatetime())
        for r in merged.itertuples()
    }
    assert got == expected


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=10, max_size=60).filter(
            lambda s: len([t for t in s.split(" ") if t]) >= 3
        ),
        min_size=2,
        max_size=6,
    )
)
def test_minhash_jaccard_identities(spark_prop, tmp_path_factory, texts):
    """Jaccard from dedup_minhash_lsh is symmetric, in (0,1], and exactly 1
    for identical docs; reported pairs are always ≥ the threshold."""
    spark = spark_prop
    # normalize whitespace so tokenization is well-defined
    texts = [" ".join(t.split()) for t in texts]
    texts = [t for t in texts if len(t.split(" ")) >= 3]
    if len(texts) < 2:
        return
    tmp = tmp_path_factory.mktemp("mh")
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    from presto_truffle_spark.operators.dedup import _JACCARD_THRESHOLD, dedup_minhash_lsh

    out = dedup_minhash_lsh(spark, str(tmp)).collect()
    shingle_sets = {
        i: {" ".join(t.split(" ")[j : j + 3]) for j in range(len(t.split(" ")) - 2)}
        for i, t in enumerate(texts)
    }
    for r in out:
        a, b, j = r["doc_a"], r["doc_b"], r["jaccard"]
        assert a < b
        assert _JACCARD_THRESHOLD <= j <= 1.0
        sa, sb = shingle_sets[a], shingle_sets[b]
        true_j = len(sa & sb) / len(sa | sb)
        assert abs(j - true_j) < 1e-6
    # identical docs must be reported
    for i in range(len(texts)):
        for k in range(i + 1, len(texts)):
            if texts[i] == texts[k]:
                assert any(r["doc_a"] == i and r["doc_b"] == k for r in out)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        # tiny vocab + repeats: stresses the distinct-shingle dependency of
        # the r4 inverted-index rewrite (posting match count must equal
        # set-intersection size, which requires array_distinct upstream)
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=3, max_size=12),
        min_size=2,
        max_size=5,
    )
)
def test_ngram_jaccard_inverted_index_matches_set_math(
    spark_prop, tmp_path_factory, token_lists
):
    """dedup_ngram_jaccard (inverted-index form) ≡ exact set Jaccard over
    distinct 3-gram shingles computed in pure Python — on random docs with
    heavy token repetition (where a non-distinct posting join would
    overcount sum(cnt_a × cnt_b) instead of |A ∩ B|)."""
    spark = spark_prop
    texts = [" ".join(toks) for toks in token_lists]
    tmp = tmp_path_factory.mktemp("jac")
    rows = [(i, t, "de", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    from presto_truffle_spark.operators.dedup import dedup_ngram_jaccard

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_ngram_jaccard(spark, str(tmp)).collect()
    }
    shingles = {
        i: {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
        for i, toks in enumerate(token_lists)
    }
    want = {}
    for a in shingles:
        for b in shingles:
            if a < b:
                inter = len(shingles[a] & shingles[b])
                if inter:
                    want[(a, b)] = inter / len(shingles[a] | shingles[b])
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - round(want[k], 6)) < 1e-6
