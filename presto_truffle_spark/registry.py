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

    # Round-3 additions — registered after the (exactly-50) round-3 verify
    # window, which is fully claimed by the never-verified backlog; these
    # queue for the round-4 rotation. Selfcheck covers them meanwhile.
    from presto_truffle_spark.operators import tpch_round3  # noqa: F401
    from presto_truffle_spark.operators import timeseries_advanced  # noqa: F401
    from presto_truffle_spark.operators import matching_ops  # noqa: F401
    from presto_truffle_spark.operators import lakehouse_ops  # noqa: F401

    _LOADED = True


# The driver hard-verifies the FIRST 50 queries in dict order per round.
# Names listed here are surfaced ahead of registration order — rotate this
# list each round so driver coverage cycles through all queries. Round 4:
# recomputed from CORRECTNESS r1∪r2∪r3 — 59 registered queries have never
# had a green driver row. The window takes (a) the 8 queries touched by the
# TIMESTAMP_NTZ regression fix first (7 fixed + the never-checked
# stream-static join), with events_sessionize_islands as a re-confirmation
# of its r3 err, then (b) the remaining never-verified in registration
# order, with streaming_transform_with_state (newly un-gated per r3
# verdict item 6) taking the final slot. 11 never-verified queries whose
# base/family op is already in this window are deferred to the round-5
# rotation: text_cosine_pairs_weighted, sink_zorder_layout,
# sink_zorder_incremental, events_session_pattern, graph_triangle_count,
# dedup_winnowing, events_rolling_distinct_users, events_trend_regression,
# events_changepoint_cusum, events_interpolate_linear,
# events_bitemporal_asof.
_VERIFY_FIRST = (
    # --- regression-fix re-verification (TIMESTAMP_NTZ, catalog.py) ---
    "events_sessionize_islands",
    "events_asof_nearest",
    "streaming_windowed_watermark",
    "streaming_dedup_watermark",
    "streaming_session_window",
    "streaming_stream_stream_join",
    "streaming_stream_stream_left_join",
    "streaming_stream_static_join",
    # --- never-driver-verified backlog, registration order ---
    "dedup_chunk_fingerprint",
    "text_token_entropy",
    "agg_salted_distinct",
    "agg_sketch_rollup",
    "agg_bitmap_distinct_rollup",
    "corpus_balance_sources",
    "rewrite_bloom_filter_join",
    "source_binary_files",
    "source_python_datasource",
    "source_xml_roundtrip",
    "window_value_range_frame",
    "scalar_variant_funcs",
    "scalar_parameterized_sql",
    "graph_pagerank",
    "dedup_survivor_pick",
    "q8_national_market_share",
    "q9_product_type_profit",
    "q11_important_stock",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q21_suppliers_kept_waiting",
    "events_gapfill_locf",
    "events_rollup_cascade",
    "events_retention_cohorts",
    "events_path_transitions",
    "window_rolling_median",
    "events_hll_sliding_distinct",
    "events_pattern_match",
    "events_anomaly_mad",
    "events_ohlc_downsample",
    "sql_recursive_cte",
    "text_cosine_pairs",
    "fuzzy_match_blocked",
    "quality_constraint_audit",
    "agg_approx_top_k",
    "agg_weighted_median",
    "corpus_importance_resample",
    "text_bigram_surprisal",
    "scalar_url_funcs",
    "join_lateral_topk",
    "source_schema_evolution",
    "streaming_transform_with_state",
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
