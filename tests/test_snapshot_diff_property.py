"""Property-test the snapshot-diff kernel against a Python dict-diff
reference on random version pairs (hypothesis; same strategy as the
winnowing/triangle property tests). The registered query derives its two
versions from orders; this test drives the same FULL OUTER JOIN +
classification shape with arbitrary key/value frames, including
adversarial cases: empty sides, disjoint key sets, all-changed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_version = st.dictionaries(
    st.integers(min_value=0, max_value=30),  # small key space → collisions
    st.integers(min_value=-5, max_value=5),
    max_size=20,
)


def _diff_spark(spark, v1: dict, v2: dict) -> dict:
    d1 = spark.createDataFrame(
        [(k, v) for k, v in v1.items()] or [(None, None)], "k1 long, val1 long"
    ).where(F.col("k1").isNotNull())
    d2 = spark.createDataFrame(
        [(k, v) for k, v in v2.items()] or [(None, None)], "k2 long, val2 long"
    ).where(F.col("k2").isNotNull())
    joined = d1.join(d2, F.col("k1") == F.col("k2"), "full_outer")
    ct = (
        F.when(F.col("k1").isNull(), F.lit("added"))
        .when(F.col("k2").isNull(), F.lit("removed"))
        .when(F.col("val1") != F.col("val2"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    rows = (
        joined.select(ct.alias("ct"))
        .groupBy("ct")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {r.ct: r.n for r in rows}


def _diff_ref(v1: dict, v2: dict) -> dict:
    out = {"added": 0, "removed": 0, "changed": 0, "unchanged": 0}
    for k in set(v1) | set(v2):
        if k not in v1:
            out["added"] += 1
        elif k not in v2:
            out["removed"] += 1
        elif v1[k] != v2[k]:
            out["changed"] += 1
        else:
            out["unchanged"] += 1
    return {k: v for k, v in out.items() if v}


@given(v1=_version, v2=_version)
@settings(max_examples=12, deadline=None)
def test_snapshot_diff_matches_dict_reference(spark_prop, v1, v2):
    assert _diff_spark(spark_prop, v1, v2) == _diff_ref(v1, v2)


def test_snapshot_diff_conservation(spark, sf_dir):
    """|v2| - |v1| must equal n_added - n_removed on the registered
    query's real output — the bookkeeping identity any CDC consumer
    relies on."""
    from presto_truffle_spark.catalog import load_table
    from presto_truffle_spark.operators.lakehouse_ops import (
        lakehouse_snapshot_diff,
    )

    o = load_table(spark, sf_dir, "orders")
    n_v1 = o.where(F.year("o_orderdate") < 1997).count()
    n_v2 = o.where(
        (F.year("o_orderdate") < 1998) & (F.col("o_orderkey") % 13 != 0)
    ).count()
    res = {r.change_type: r.n for r in lakehouse_snapshot_diff(spark, sf_dir).collect()}
    assert res.get("added", 0) - res.get("removed", 0) == n_v2 - n_v1
    # every key of v1 ∪ v2 is classified exactly once
    assert sum(res.values()) == n_v1 + res.get("added", 0)
