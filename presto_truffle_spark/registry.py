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
# list each round so driver coverage cycles through all queries. Round 3:
# the 41 queries with no driver CORRECTNESS row after r1+r2 (the exact
# remainder from TODO_NEXT_ROUND r2 item 1), then the two sketch ops whose
# only driver rows were err(no_oracle) and which now register deterministic
# envelope oracles, then 7 re-confirmation slots for queries whose
# implementation changed this round (q2 rounding convention, tfidf
# broadcast) or that carried prior-round fixes.
_VERIFY_FIRST = (
    # --- the 41 never-driver-verified ---
    "events_funnel_conversion",
    "corpus_hash_split",
    "corpus_contamination_check",
    "corpus_stratified_sample",
    "corpus_pack_bins",
    "pipeline_corpus_release",
    "rewrite_salted_join",
    "rewrite_asof_generalized",
    "join_right_outer",
    "filter_null_safe_eq",
    "agg_grouping_sets",
    "scalar_map_funcs",
    "udf_grouped_map_zscore",
    "udf_row_scalar",
    "cached_columnar_scan",
    "agg_argminmax_bool",
    "window_distribution_funcs",
    "unpivot_stack",
    "setop_except_all",
    "setop_intersect_all",
    "source_csv_roundtrip",
    "source_json_roundtrip",
    "source_orc_roundtrip",
    "sink_partitioned_parquet",
    "sink_bucketed_join",
    "source_range_generator",
    "sink_compaction",
    "streaming_tumbling_counts",
    "streaming_windowed_watermark",
    "streaming_dedup_watermark",
    "streaming_session_window",
    "streaming_rate_ingest",
    "streaming_stateful_profile",
    "streaming_foreachbatch_upsert",
    "text_pii_redact",
    "text_repetition_stats",
    "dedup_connected_components",
    "embedding_quantize_int8",
    "window_rolling_interval",
    "udf_map_in_arrow",
    "agg_histogram",
    # --- sketch ops, newly envelope-oracled (only rows were err) ---
    "agg_approx_distinct",
    "agg_percentile_approx",
    # --- re-confirmations (changed this round or prior-round fixes) ---
    "q2_min_cost_supplier",
    "text_tfidf_top_terms",
    "events_sessionize_islands",
    "agg_collect",
    "events_dedup_first_per_key",
    "dedup_minhash_lsh",
    "q6",
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
