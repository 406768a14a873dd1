"""Pin the selfcheck oracle-dtype gate (VERDICT r5 item 2).

Three oracles stayed RED for three driver rounds while passing selfcheck
because DuckDB types ``sum(BIGINT)`` as HUGEINT (int128): ``fetchall()``
renders HUGEINT as a lossless Python int (indistinguishable from BIGINT),
but the driver's Arrow/pandas-path hash distinguishes them.  The gate
DESCRIBEs every oracle and fails on exactly the type classes the
``fetchall()`` comparison is structurally blind to:

* HUGEINT / UHUGEINT columns — always a violation;
* DECIMAL columns — a violation unless the Spark side is DecimalType too.

This file proves (a) the gate catches the exact pre-fix pattern
(``sum(CAST(... AS BIGINT))`` with no outer cast), (b) the fixed pattern
passes, and (c) the full 196-oracle registry is clean under the strict
rule (no Spark dtypes supplied, so any DECIMAL output would also fail).
"""

from __future__ import annotations

import duckdb
import pytest

from tools.selfcheck import TABLES, oracle_dtype_violations

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def test_gate_flags_hugeint_sum(con):
    # The exact pre-fix shape: inner cast only -> sum() result is HUGEINT.
    bad = oracle_dtype_violations(
        con,
        "SELECT sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents "
        "FROM events",
    )
    assert bad == [("cents", "HUGEINT")]


def test_gate_passes_outer_cast(con):
    # The fixed shape: outer CAST narrows the result column to BIGINT.
    bad = oracle_dtype_violations(
        con,
        "SELECT CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) "
        "AS BIGINT) AS cents FROM events",
    )
    assert bad == []


def test_gate_flags_hugeint_through_window_and_coalesce(con):
    # events_gapfill_locf's failure mode: HUGEINT propagates through
    # last_value() and coalesce() unchanged, so the gate must see it in
    # the final projection, not just at the aggregate.
    bad = oracle_dtype_violations(
        con,
        """
        WITH h AS (
            SELECT user_id,
                   sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS c
            FROM events GROUP BY 1
        )
        SELECT user_id,
               coalesce(last_value(c) OVER (ORDER BY user_id), 0) AS locf
        FROM h
        """,
    )
    assert bad == [("locf", "HUGEINT")]


def test_gate_decimal_requires_decimal_spark_side(con):
    sql = "SELECT CAST(1.05 AS DECIMAL(10,2)) AS price"
    # Spark side is double -> violation (the r4 scalar_parameterized_sql
    # failure class).
    assert oracle_dtype_violations(con, sql, {"price": "double"}) == [
        ("price", "DECIMAL(10,2)")
    ]
    # Spark side is decimal too -> both engines hash the same rendering.
    assert oracle_dtype_violations(
        con, sql, {"price": "decimal(10,2)"}
    ) == []


def test_gate_is_plan_only_no_execution(con):
    # DESCRIBE must not execute the query: division by zero would throw
    # at runtime but the gate still returns the planned types.
    bad = oracle_dtype_violations(
        con, "SELECT CAST(1 AS BIGINT) / 0 AS x FROM events"
    )
    assert bad == []


def test_full_registry_has_no_oracle_dtype_violations(con):
    """Every registered oracle is clean under the STRICT rule (no Spark
    dtypes passed, so HUGEINT *and* any DECIMAL output column fail)."""
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    assert len(oracles) >= 196
    bad = {
        name: v
        for name, sql in oracles.items()
        if (v := oracle_dtype_violations(con, sql))
    }
    assert bad == {}, f"oracle dtype violations: {bad}"
