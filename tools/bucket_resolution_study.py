"""Bucket-resolution error sweep for the r11 histogram scale twins.

The *_bucketed ops (gini / MWU / Spearman / KS / AUC) are 'exact to
bucket resolution' — this study MEASURES that resolution curve: for
bucket targets B in {1e2, 1e3, 1e4, 1e5} recompute each statistic from
the B-bucket histogram (same quantization spelling as the registered
ops: bw = max DIV B + 1, v = x - x % bw) in DuckDB and report the
absolute error vs the exact-rank value. The registered twins use
B = 1e4; the curve shows what that buys and what a 10x coarser/finer
grid would cost.

Usage: python tools/bucket_resolution_study.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> int:
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    out = {"metric": "bucket_resolution", "sf_dir": SF, "stats": {}}

    gini_exact = con.execute("""
        WITH per_cust AS (
            SELECT o_custkey, CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
            FROM orders GROUP BY o_custkey
        ), ranked AS (
            SELECT cents, row_number() OVER (ORDER BY cents, o_custkey) AS r FROM per_cust
        ), s AS (SELECT count(*) AS n, sum(cents) AS sx, sum(r*cents) AS srx FROM ranked)
        SELECT 2.0*srx/(n*1.0*sx) - (n+1.0)/n FROM s""").fetchone()[0]

    mwu_exact = con.execute("""
        WITH t AS (
            SELECT CASE WHEN c.c_mktsegment='AUTOMOBILE' THEN 1 ELSE 0 END AS grp,
                   CAST(round(o.o_totalprice*100) AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey=c.c_custkey
            WHERE c.c_mktsegment IN ('AUTOMOBILE','BUILDING')
        ), ranked AS (
            SELECT grp, CAST(2*rank() OVER (ORDER BY cents) + count(*) OVER (PARTITION BY cents) - 1 AS BIGINT) AS dr FROM t
        ), ties AS (SELECT CAST(sum(c*c*c-c) AS BIGINT) AS tt FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM t GROUP BY cents)),
        s AS (SELECT CAST(sum(CASE WHEN grp=1 THEN dr END) AS BIGINT) AS dr1,
                     CAST(count(CASE WHEN grp=1 THEN 1 END) AS BIGINT) AS n1,
                     CAST(count(CASE WHEN grp=0 THEN 1 END) AS BIGINT) AS n2 FROM ranked)
        SELECT (dr1/2.0 - n1*(n1+1.0)/2 - n1*(n2*1.0)/2)
               / sqrt(n1*(n2*1.0)/12 * ((n1+n2+1.0) - tt*1.0/((n1+n2)*(n1+n2-1.0))))
        FROM s CROSS JOIN ties""").fetchone()[0]

    for b in (100, 1000, 10000, 100000):
        g = con.execute(f"""
            WITH per_cust AS (
                SELECT o_custkey, CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
                FROM orders GROUP BY o_custkey
            ), mx AS (SELECT max(cents) // {b} + 1 AS bw FROM per_cust),
            hist AS (SELECT cents - cents % bw AS v, CAST(count(*) AS BIGINT) AS nb
                     FROM per_cust CROSS JOIN mx GROUP BY 1),
            cum AS (SELECT v, nb, coalesce(sum(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),0) AS cp FROM hist),
            s AS (SELECT CAST(sum(nb) AS BIGINT) AS n, CAST(sum(nb*v) AS HUGEINT) AS sx,
                         sum(CAST(v AS HUGEINT)*nb*(2*cp+nb+1)) AS srx2, count(*) AS cells FROM cum)
            SELECT CAST(srx2 AS DOUBLE)/(n*CAST(sx AS DOUBLE)) - (n+1.0)/n, cells FROM s""").fetchone()
        m = con.execute(f"""
            WITH t AS (
                SELECT CASE WHEN c.c_mktsegment='AUTOMOBILE' THEN 1 ELSE 0 END AS grp,
                       CAST(round(o.o_totalprice*100) AS BIGINT) AS cents
                FROM orders o JOIN customer c ON o.o_custkey=c.c_custkey
                WHERE c.c_mktsegment IN ('AUTOMOBILE','BUILDING')
            ), mx AS (SELECT max(cents) // {b} + 1 AS bw FROM t),
            hist AS (SELECT cents - cents % bw AS v,
                            CAST(count(CASE WHEN grp=1 THEN 1 END) AS BIGINT) AS n1b,
                            CAST(count(CASE WHEN grp=0 THEN 1 END) AS BIGINT) AS n0b
                     FROM t CROSS JOIN mx GROUP BY 1),
            cum AS (SELECT v, n1b, n0b, n1b+n0b AS nb,
                           coalesce(sum(n1b+n0b) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),0) AS cp FROM hist),
            s AS (SELECT CAST(sum(n1b) AS BIGINT) AS n1, CAST(sum(n0b) AS BIGINT) AS n2,
                         sum(CAST(n1b AS HUGEINT)*(2*cp+nb+1)) AS dr1,
                         sum(CAST(nb AS HUGEINT)*nb*nb - nb) AS tt FROM cum)
            SELECT (CAST(dr1 AS DOUBLE)/2.0 - n1*(n1+1.0)/2 - n1*(n2*1.0)/2)
                   / sqrt(n1*(n2*1.0)/12 * ((n1+n2+1.0) - CAST(tt AS DOUBLE)/((n1+n2)*(n1+n2-1.0))))
            FROM s""").fetchone()
        out["stats"][f"B={b}"] = {
            "gini_err": round(abs(g[0] - gini_exact), 8),
            "gini_cells": g[1],
            "mwu_z_err": round(abs(m[0] - mwu_exact), 8),
        }
    out["gini_exact"] = round(gini_exact, 8)
    out["mwu_z_exact"] = round(mwu_exact, 8)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
