"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert df.columns == ["revenue"]
    assert rows[0]["revenue"] is not None and rows[0]["revenue"] > 0


def test_queries_registry_shape():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 70
    # every oracle key corresponds to a registered query
    assert set(oracles) <= set(qs)
    # the vast majority of queries carry a DuckDB oracle
    assert len(oracles) >= 0.9 * len(qs)


def test_all_queries_run_at_sf0001(spark, sf_dir):
    """Every registered query runs end-to-end at the smoke scale factor,
    yields a stable non-empty schema, and emits only hash-safe column
    types. The type bans pin the r4 failure class: the driver's value
    hash is type/format-exact, so a decimal column (e.g. from a SQL-text
    `/ 100.0` division — decimal literal in Spark, double in DuckDB)
    hash-fails even when numerically equal, array/map/struct cells can't
    be hashed at all (FIXTURES.md), and an LTZ timestamp collects through
    the driver-owned session/OS zones (tztime.py — batch results must
    surface naive NTZ)."""
    qs = entrymod.queries()
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name} produced no columns"
        banned = [
            (c, t)
            for c, t in df.dtypes
            if "decimal" in t
            or "array" in t
            or "map<" in t
            or "struct" in t
            or t == "timestamp"  # LTZ; NTZ ("timestamp_ntz") is the safe one
        ]
        assert not banned, f"{name} emits hash-unsafe columns: {banned}"
        df.limit(5).collect()  # plan executes
