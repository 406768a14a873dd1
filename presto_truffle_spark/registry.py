"""Query registry: the single source of truth for ``__spark_entry__``.

Every operator module registers its queries with the ``@query`` decorator;
``queries()`` / ``oracle_sql()`` in ``__spark_entry__.py`` read the
assembled dicts. Keeping the Spark implementation and its DuckDB oracle SQL
adjacent (same decorator call) is our version of the reference's
golden-value-in-a-comment test strategy (``TpchQuery6.java:38-39``), scaled
up to differential testing per SURVEY.md §5.2.

Conventions (FIXTURES.md "Oracle conventions"):
  * every computed/aggregate column aliased identically on both sides;
  * float aggregates rounded on both sides (hash is exact-match);
  * queries with no SQL-expressible oracle register ``oracle=None`` and get
    the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as queries()[name], with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


_LOADED = False


def load_all_modules() -> None:
    """Import every operator module so decorators run. Idempotent."""
    global _LOADED
    if _LOADED:
        return
    # Imports are inside the function to avoid circular imports (operator
    # modules import `query` from this module).
    from presto_truffle_spark.operators import (  # noqa: F401
        relational,
        aggregates,
        joins,
        windows,
        setops,
        scalar_funcs,
        timeseries,
        dedup,
        similarity,
        text,
        multimodal,
        tpch,
        coverage_extras,
        pipelines,
    )
    from presto_truffle_spark.plans import rewrites  # noqa: F401
    from presto_truffle_spark.sources import io  # noqa: F401
    from presto_truffle_spark.streaming import (  # noqa: F401
        stateful,
        windows as streaming_windows,
    )

    _LOADED = True


def get_queries() -> dict[str, QueryFn]:
    load_all_modules()
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    load_all_modules()
    return dict(ORACLES)
