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
    #
    # ORDER MATTERS: the driver hard-verifies queries in registration order
    # (= import order here) and in round 1 only reached the first 50.  Round 2
    # therefore registers the previously-unverified surface FIRST — the
    # LLM-pipeline block (dedup/similarity/text/multimodal/pipelines), the
    # TPC-H battery, coverage extras, sources, rewrites, streaming — and
    # rotates the round-1-verified relational/agg/join/window/setop/scalar
    # modules to the end.
    from presto_truffle_spark.operators import (  # noqa: F401
        dedup,
        similarity,
        text,
        multimodal,
        pipelines,
        tpch,
        coverage_round2,
        timeseries,
        aggregates,
        corpus_ops,
    )
    from presto_truffle_spark.plans import rewrites  # noqa: F401
    from presto_truffle_spark.operators import coverage_extras  # noqa: F401
    from presto_truffle_spark.sources import io  # noqa: F401
    from presto_truffle_spark.streaming import (  # noqa: F401
        stateful,
        windows as streaming_windows,
    )
    from presto_truffle_spark.operators import (  # noqa: F401
        relational,
        joins,
        windows,
        setops,
        scalar_funcs,
    )
    # Late-r2 additions — registered last so the driver's round-2 window
    # (first 50) is untouched; rotate forward in round 3.
    from presto_truffle_spark.operators import quality_ops  # noqa: F401

    _LOADED = True


# The driver hard-verifies the FIRST 50 queries in dict order per round.
# Names listed here are surfaced ahead of registration order — rotate this
# list each round so driver coverage cycles through all queries. Round 2:
# promote the three timeseries queries that would otherwise fall just
# outside the window (islands carries a round-1 fix; the other two have
# never had a driver row). With the module reordering, the round-2 window
# is: these three + the LLM-pipeline block + the TPC-H battery +
# coverage_round2 (json_tuple/udtf/q2/agg_collect fixes).
_VERIFY_FIRST = (
    "events_sessionize_islands",
    "events_dedup_first_per_key",
    "events_rate_per_user",
)


def _promote(d: dict) -> dict:
    out = {k: d[k] for k in _VERIFY_FIRST if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def get_queries() -> dict[str, QueryFn]:
    load_all_modules()
    return _promote(QUERIES)


def get_oracles() -> dict[str, str]:
    load_all_modules()
    return _promote(ORACLES)
