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
    """Every registered query runs end-to-end at the smoke scale factor and
    yields a stable non-empty schema."""
    qs = entrymod.queries()
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name} produced no columns"
        df.limit(5).collect()  # plan executes
