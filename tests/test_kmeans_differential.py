"""Differential-test the Lloyd-step kernel against a numpy reference on
random vectors (same strategy as the triangle-count differential test):
the Spark assignment (broadcast + rounded-d2 argmin window) must agree
with a straightforward numpy argmin for every point, and the per-cluster
aggregates must follow.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def test_lloyd_iteration_is_monotone(spark, sf_dir):
    """Two chained update steps from the registered seeds must not
    increase inertia (Lloyd's theorem) — pins the convergence tool's
    kernel in CI without the full 4-iteration study."""
    from pyspark.sql import functions as F

    from presto_truffle_spark.catalog import load_table
    from tools.kmeans_convergence import lloyd_iteration

    e = load_table(spark, sf_dir, "embeddings")
    pts = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ev")
    ).withColumn(
        "vv",
        F.aggregate(
            F.zip_with("ev", "ev", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    seed = [
        (i, [float(x) for x in r.ev])
        for i, r in enumerate(
            pts.filter(F.col("vec_id").between(10, 17)).collect()
        )
    ]
    i1, c1 = lloyd_iteration(spark, pts, seed)
    i2, _ = lloyd_iteration(spark, pts, c1)
    assert i2 <= i1 + 1e-6
    assert len(c1) == 8 and all(len(v) == len(c1[0][1]) for _, v in c1)


@pytest.mark.parametrize("seed", [0, 1, 7])
def test_lloyd_assignment_matches_numpy(spark, seed):
    rng = np.random.RandomState(seed)
    n, k, dim = 300, 5, 16
    pts = rng.randn(n, dim)
    cent = rng.randn(k, dim)

    # numpy reference: argmin over rounded d2 with centroid-id tie-break
    d2 = ((pts[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2).round(6)
    ref_assign = d2.argmin(axis=1)  # argmin takes first (lowest id) on ties
    ref_counts = np.bincount(ref_assign, minlength=k)

    pdf = spark.createDataFrame(
        [(int(i), [float(x) for x in pts[i]]) for i in range(n)],
        "vec_id long, ev array<double>",
    ).withColumn("vv", _dot("ev", "ev"))
    cdf = spark.createDataFrame(
        [(int(j), [float(x) for x in cent[j]]) for j in range(k)],
        "c_id int, ce array<double>",
    ).withColumn("cc", _dot("ce", "ce"))

    d2c = F.round(F.col("vv") - 2 * _dot("ev", "ce") + F.col("cc"), 6)
    w = W.partitionBy("vec_id").orderBy("d2", "c_id")
    assigned = (
        pdf.join(F.broadcast(cdf))
        .select("vec_id", "c_id", d2c.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    )
    got = {r.vec_id: r.c_id for r in assigned}
    assert len(got) == n
    mismatches = [
        (i, got[i], int(ref_assign[i])) for i in range(n) if got[i] != ref_assign[i]
    ]
    # the d2 expansion (vv - 2vc + cc) differs from numpy's (p-c)^2 sum
    # by float error; rounding to 6dp makes disagreement possible only ON
    # a rounding boundary — require exact agreement anyway: with
    # randn-scale distances a boundary collision has ~0 probability
    assert mismatches == [], mismatches[:5]

    counts = {r.c_id: 0 for r in assigned}
    for r in assigned:
        counts[r.c_id] += 1
    assert [counts.get(j, 0) for j in range(k)] == list(ref_counts)
