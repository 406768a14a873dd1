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
# list each round so driver coverage cycles through all queries. Round 5:
# recomputed from CORRECTNESS r1∪r2∪r3∪r4 — 15 queries lack a green driver
# row (the 4 r4 hash-fails + the 11 deliberately-deferred never-verified).
# Window layout: (a) the 4 r4 RED queries first, freshly fixed (decimal
# literal cast + the NTZ zone-proofing, VERDICT r4 items 2-4); (b) the 11
# deferred; (c) every GREEN query whose code changed THIS round and whose
# row is therefore stale — the whole batch events family + the streaming
# queries with NTZ output casts (tztime refactor), scalar_date_funcs, and
# text_tfidf_top_terms (single-scan rewrite); (d) the six TPC-H queries
# that carry the r4 broadcast retrofit but whose last green row predates
# it (r2); (e) LLM-pipeline rows needing re-proof: dedup_ngram_jaccard's
# inverted-index rewrite landed r4 but its row is from r2; minhash is the
# bench headliner; text_bigram_surprisal + quality_constraint_audit were
# rewritten single-pass THIS round (rescan audit), staling their fresh r4
# rows — a stale green row outranks re-confirming an unchanged old one
# (ann_cosine_topk/dedup_exact, green r2, code untouched, yield the two
# slots). Exactly 50.
_VERIFY_FIRST = (
    # --- (a) r4 RED, fixed this round ---
    "scalar_parameterized_sql",
    "events_gapfill_locf",
    "events_rollup_cascade",
    "source_schema_evolution",
    # --- (b) never-verified backlog (deferred from r4), registration order ---
    "dedup_winnowing",
    "graph_triangle_count",
    "events_interpolate_linear",
    "events_session_pattern",
    "events_bitemporal_asof",
    "events_changepoint_cusum",
    "events_rolling_distinct_users",
    "events_trend_regression",
    "text_cosine_pairs_weighted",
    "sink_zorder_layout",
    "sink_zorder_incremental",
    # --- (c) green rows made stale by this round's edits ---
    "events_tumbling_window",
    "events_sliding_window",
    "events_session_window",
    "events_sessionize_islands",
    "events_asof_join",
    "events_asof_nearest",
    "events_dedup_first_per_key",
    "events_rate_per_user",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "events_path_transitions",
    "events_hll_sliding_distinct",
    "events_pattern_match",
    "events_anomaly_mad",
    "events_ohlc_downsample",
    "sql_recursive_cte",
    "scalar_date_funcs",
    "text_tfidf_top_terms",
    "streaming_tumbling_counts",
    "streaming_windowed_watermark",
    "streaming_session_window",
    "streaming_dedup_watermark",
    "streaming_rate_ingest",
    "streaming_stateful_profile",
    "streaming_transform_with_state",
    # --- (d) r4 broadcast-retrofit carriers, last green r2 ---
    "q7_nation_volume",
    "q10_returned_items",
    "q14_promo_revenue",
    "q16_supplier_part_counts",
    "q18_large_volume_customers",
    "q19_disjunctive_predicates",
    # --- (e) LLM-pipeline rows needing re-proof ---
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "text_bigram_surprisal",
    "quality_constraint_audit",
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
