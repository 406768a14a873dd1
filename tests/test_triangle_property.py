"""Degree-ordered triangle counting, differential against brute force.

graph_triangle_count (quality_ops.py) runs the standard distributed
triangle algorithm — orient each edge toward its (degree, id)-larger
endpoint, enumerate wedges from the smaller endpoint, close them with an
oriented-edge join — over the fixture's near-dup graph. Before its first
driver verification, pin the KERNEL on random graphs against an O(n³)
Python reference: exact triangle count and wedge count, including the
every-triangle-counted-exactly-once property the orientation exists for.
"""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F


def _spark_triangles(spark, edges: list[tuple[int, int]]):
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    und = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("d"))
    oriented = (
        und.join(deg.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("d", "d_src")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("d_dst")), "dst")
        .where(
            (F.col("d_src") < F.col("d_dst"))
            | ((F.col("d_src") == F.col("d_dst")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst")
    )
    a = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    b = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    tri = (
        a.join(b, "u")
        .where(F.col("v") != F.col("w"))
        .join(oriented.select(F.col("src").alias("v"), F.col("dst").alias("w")), ["v", "w"])
        .count()
    )
    wedges = deg.agg(F.sum(F.expr("d * (d - 1) div 2"))).collect()[0][0]
    return tri, wedges


def _brute_triangles(edges: list[tuple[int, int]]):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for u, v, w in itertools.combinations(sorted(adj), 3)
        if v in adj[u] and w in adj[u] and w in adj[v]
    )
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    return tri, wedges


def test_triangle_kernel_matches_bruteforce(spark):
    for seed, n, p in [(3, 25, 0.2), (5, 40, 0.12), (9, 18, 0.45)]:
        rng = random.Random(seed)
        edges = [
            (u, v)
            for u, v in itertools.combinations(range(n), 2)
            if rng.random() < p
        ]
        got_tri, got_wedges = _spark_triangles(spark, edges)
        want_tri, want_wedges = _brute_triangles(edges)
        assert (got_tri, got_wedges) == (want_tri, want_wedges), (seed, n, p)
