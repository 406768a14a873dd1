"""k-means convergence study: iterate the Lloyd step to show the
registered ``ann_kmeans_iteration`` operator composes into real
training (inertia must be non-increasing per Lloyd's theorem).

Each iteration: assign every vector to its nearest centroid (the same
broadcast + rounded-d2 argmin plan as the registered query), recompute
per-cluster mean vectors via posexplode→avg→collect_list, and pull the
K×64 new centroids to the driver (K rows — the MODEL comes to the
driver, the data never does; this is the legitimate collect the
SCALING.md no-collect rule carves out for fixed-size model state).

Usage: python tools/kmeans_convergence.py [sf_dir] [n_iters]
Prints one JSON line {"inertia": [i0, i1, ...], "monotone": bool}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F


def lloyd_iteration(spark, pts, centroids):
    """One assignment + update step. ``pts``: (vec_id, ev array<double>,
    vv); ``centroids``: list of (c_id, [floats]). Returns (inertia,
    new_centroids)."""
    cent = spark.createDataFrame(
        [(cid, list(map(float, vec))) for cid, vec in centroids],
        "c_id int, ce array<double>",
    ).withColumn(
        "cc",
        F.aggregate(
            F.zip_with("ce", "ce", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    dot_vc = F.aggregate(
        F.zip_with("ev", "ce", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    d2 = F.round(F.col("vv") - 2 * dot_vc + F.col("cc"), 6)
    w = W.partitionBy("vec_id").orderBy("d2", "c_id")
    assigned = (
        pts.join(F.broadcast(cent))
        .select("vec_id", "ev", "c_id", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    inertia = assigned.agg(F.round(F.sum("d2"), 4).alias("i")).collect()[0].i
    means = (
        assigned.select("c_id", F.posexplode("ev").alias("pos", "x"))
        .groupBy("c_id", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("c_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "m"))
            ).alias("pm")
        )
        .select("c_id", F.col("pm.m").alias("mean_vec"))
        .collect()
    )
    return inertia, [(r.c_id, r.mean_vec) for r in means]


def main() -> int:
    from presto_truffle_spark.catalog import load_table
    from presto_truffle_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    spark = get_spark("kmeans-convergence")
    e = load_table(spark, sf_dir, "embeddings")
    pts = (
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("ev"))
        .withColumn(
            "vv",
            F.aggregate(
                F.zip_with("ev", "ev", lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        .persist()
    )
    # seed centroids = the registered query's pinned ones (vec_id 10..17)
    seed = [
        (int(r.vec_id), [float(x) for x in r.ev])
        for r in pts.filter(F.col("vec_id").between(10, 17)).collect()
    ]
    inertias = []
    centroids = [(i, vec) for i, (_, vec) in enumerate(seed)]
    for _ in range(n_iters):
        inertia, centroids = lloyd_iteration(spark, pts, centroids)
        inertias.append(inertia)
    pts.unpersist()
    monotone = all(b <= a + 1e-6 for a, b in zip(inertias, inertias[1:]))
    print(json.dumps({"inertia": inertias, "monotone": monotone}))
    return 0 if monotone else 1


if __name__ == "__main__":
    sys.exit(main())
