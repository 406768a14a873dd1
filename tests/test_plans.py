"""Plan-shape tests: assert the Catalyst optimizations SURVEY.md §4.1 maps
the reference's hand optimizations onto actually fire. These are the
100 TB-posture regression tests — a change that silently un-pushes a
filter or drops a broadcast fails here, not in production."""

from __future__ import annotations

import re

from presto_truffle_spark.plans import inspect


def test_q6_scan_prunes_and_pushes(spark, sf_dir):
    """Reference parity: O1 binds only 4 of the table's columns
    (TpchQuery6.java:25-28); our scan must read exactly those 4, with all
    Q6 predicates pushed to parquet."""
    from presto_truffle_spark.operators.relational import q6

    scans = inspect.parquet_scans(q6(spark, sf_dir))
    assert len(scans) == 1
    assert sorted(scans[0].read_columns) == [
        "l_discount",
        "l_extendedprice",
        "l_quantity",
        "l_shipdate",
    ]
    pf = scans[0].pushed_filters
    assert "l_discount" in pf and "l_quantity" in pf and "l_shipdate" in pf


def test_q6_single_exchange(spark, sf_dir):
    """Q6's only exchange is the 1-row partial→final aggregate merge — the
    same dataflow as the reference's single accumulator."""
    from presto_truffle_spark.operators.relational import q6

    assert inspect.count_exchanges(q6(spark, sf_dir)) == 1


def test_sort_limit_uses_take_ordered(spark, sf_dir):
    """Global top-N must not plan a full sort."""
    from presto_truffle_spark.operators.relational import sort_limit

    assert inspect.uses_take_ordered(sort_limit(spark, sf_dir))


def test_q5_broadcasts_dims(spark, sf_dir):
    from presto_truffle_spark.operators.joins import q5_local_supplier_volume

    assert inspect.uses_broadcast_join(q5_local_supplier_volume(spark, sf_dir))


def test_scan_prune_reads_two_columns(spark, sf_dir):
    from presto_truffle_spark.operators.relational import scan_prune

    scans = inspect.parquet_scans(scan_prune(spark, sf_dir))
    assert sorted(scans[0].read_columns) == ["l_extendedprice", "l_orderkey", "l_shipdate"]
    assert "l_shipdate" in scans[0].pushed_filters


def test_partitioned_sink_prunes_partitions(spark, sf_dir):
    """The year-partitioned read-back must carry a PartitionFilter (pruning
    happens at file listing, before any I/O)."""
    import pyspark.sql.functions as F

    from presto_truffle_spark.sources.io import _scratch
    from presto_truffle_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders").withColumn("o_year", F.year("o_orderdate"))
    path = _scratch("orders_by_year_plan_test")
    o.write.mode("overwrite").partitionBy("o_year").parquet(path)
    back = spark.read.parquet(path).filter(F.col("o_year") >= 1997)
    scans = inspect.parquet_scans(back)
    assert any("o_year" in s.partition_filters for s in scans)
    assert all("o_year" not in s.pushed_filters for s in scans)


def test_q6_wholestage_codegen(spark, sf_dir):
    """The fused scan→filter→project→aggregate loop the reference hand-wrote
    must come out of whole-stage codegen."""
    from presto_truffle_spark.operators.relational import q6

    assert inspect.codegen_stage_count(q6(spark, sf_dir)) >= 1


def test_q3_q5_no_growing_table_broadcast_hint(spark, sf_dir):
    """Round-1 verdict fix: customer grows with scale factor, so q3/q5 must
    not carry an explicit broadcast hint for it — only the fixed-cardinality
    dims (q5: nation, region; r4 demoted supplier, which grows linearly
    with SF) are hinted; customer/supplier are left to AQE's runtime size
    check."""
    from presto_truffle_spark.operators.joins import (
        q3_shipping_priority,
        q5_local_supplier_volume,
    )

    assert inspect.broadcast_hint_count(q3_shipping_priority(spark, sf_dir)) == 0
    assert inspect.broadcast_hint_count(q5_local_supplier_volume(spark, sf_dir)) == 2


def test_no_growing_table_broadcast_hint_anywhere(spark, sf_dir):
    """Round-4 verdict fix (items 8-11): NO query may carry a hard
    broadcast hint on a table that grows with scale factor
    (supplier/customer/part — all linear in SF). Pin the exact hint count
    of every join query that touches a growing table: the remaining hints
    are exclusively fixed-cardinality (region: 5, nation: 25) or 1-row
    derived aggregates."""
    from presto_truffle_spark.operators import tpch, tpch_round3 as t3
    from presto_truffle_spark.operators.joins import join_range_theta
    from presto_truffle_spark.streaming import windows as sw

    expected = {
        tpch.q7_nation_volume: 2,  # nation × 2
        tpch.q10_returned_items: 0,
        tpch.q14_promo_revenue: 0,
        tpch.q16_supplier_part_counts: 0,
        tpch.q18_large_volume_customers: 0,
        tpch.q19_disjunctive_predicates: 0,
        join_range_theta: 0,
        t3.q8_national_market_share: 3,  # nation × 2 + region
        t3.q9_product_type_profit: 1,  # nation
    }
    for fn, n_hints in expected.items():
        got = inspect.broadcast_hint_count(fn(spark, sf_dir))
        assert got == n_hints, f"{fn.__name__}: {got} hints, expected {n_hints}"


def test_corpus_ops_plan_shapes(spark, sf_dir):
    """Round-2 corpus operators: window-based ops are single-exchange, and
    nothing in the new surface plans a cartesian/nested-loop product."""
    from presto_truffle_spark.operators.corpus_ops import (
        corpus_contamination_check,
        corpus_hash_split,
        corpus_pack_bins,
        corpus_stratified_sample,
    )

    assert inspect.count_exchanges(corpus_stratified_sample(spark, sf_dir)) == 1
    assert inspect.count_exchanges(corpus_pack_bins(spark, sf_dir)) <= 2
    assert inspect.count_exchanges(corpus_hash_split(spark, sf_dir)) == 1
    for fn in (
        corpus_hash_split,
        corpus_contamination_check,
        corpus_pack_bins,
        corpus_stratified_sample,
    ):
        plan = inspect.physical_plan(fn(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_tfidf_broadcasts_df_side(spark, sf_dir):
    """The tf⋈df token join must be a broadcast join (r3: the shuffle
    alternative hashes on `token`, which is stopword-skewed at corpus
    scale — one 'the' partition would straggle a 100 TB run)."""
    from presto_truffle_spark.operators.text import text_tfidf_top_terms

    df = text_tfidf_top_terms(spark, sf_dir)
    assert inspect.uses_broadcast_join(df)
    assert inspect.broadcast_hint_count(df) >= 2  # df side + 1-row doc count


def test_tfidf_tokenizes_corpus_once(spark, sf_dir, monkeypatch):
    """At scale (input >= the persist threshold) both consumers of tf
    (the df aggregate and the final scored join) must read the persisted
    tf cache instead of re-running the tokenize+explode+groupBy pipeline
    — the re-computation was a second full corpus scan+shuffle at 100 TB
    (VERDICT r4). Done-criterion: the plan scans documents zero times
    (both branches hit InMemoryTableScan); the single real scan happened
    at persist time."""
    from presto_truffle_spark.operators import text

    monkeypatch.setattr(text, "_TFIDF_PERSIST_MIN_BYTES", 0)
    df = text.text_tfidf_top_terms(spark, sf_dir)
    plan = inspect.physical_plan(df)
    # one InMemoryTableScan under the broadcast df branch, one feeding the
    # scored join directly (the remaining parquet reads in the plan text
    # are the InMemoryRelation cache descriptions plus the column-pruned
    # 1-row doc-count branch)
    assert plan.count("InMemoryTableScan") >= 2
    spark.catalog.clearCache()


def test_tfidf_skips_persist_below_threshold(spark, sf_dir, monkeypatch):
    """Below the size gate (VERDICT r5 item 6) the cache write costs more
    than recomputing the pipeline, so tf must stay UNPERSISTED: no
    InMemoryTableScan anywhere, and the broadcast/top-k shape unchanged."""
    from presto_truffle_spark.operators import text

    spark.catalog.clearCache()
    monkeypatch.setattr(text, "_TFIDF_PERSIST_MIN_BYTES", 1 << 60)
    df = text.text_tfidf_top_terms(spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert "InMemoryTableScan" not in plan
    assert inspect.uses_broadcast_join(df)


def test_tfidf_vocab_salting_gate(spark, sf_dir, monkeypatch):
    """Past _VOCAB_BROADCAST_MAX_BYTES the df side must stop
    broadcasting and the tf⋈df join must run SALTED on (token, salt)
    — the fallback the docstring promised and VERDICT r11 #2 demanded
    as code. Pin: the salted plan carries the pmod salt + the df-side
    explode fan-out, and both gate settings produce IDENTICAL rows."""
    from presto_truffle_spark.operators import text

    spark.catalog.clearCache()
    base = sorted(
        map(tuple, text.text_tfidf_top_terms(spark, sf_dir).collect())
    )
    monkeypatch.setattr(text, "_VOCAB_BROADCAST_MAX_BYTES", 0)
    df = text.text_tfidf_top_terms(spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert "pmod" in plan and "salt" in plan
    assert "Generate explode" in plan or "explode" in plan
    assert sorted(map(tuple, df.collect())) == base
    spark.catalog.clearCache()


def _broadcast_agg_keys(plan: str) -> list[str]:
    """For each BroadcastExchange in a toString plan, the keys=[...] of
    the first HashAggregate beneath it (empty string if none before the
    next Exchange) — enough to tell WHICH marginal was broadcast."""
    out = []
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        key = ""
        for nxt in lines[i + 1 : i + 12]:
            if "Exchange" in nxt and "BroadcastExchange" not in nxt:
                break
            m = re.search(r"HashAggregate\(keys=\[(\w+)", nxt)
            if m:
                key = m.group(1)
                break
        out.append(key)
    return out


def test_jsd_vocab_broadcast_flip(spark, sf_dir, monkeypatch):
    """text_jsd_by_source broadcasts the VOCAB marginal only below the
    gate; past it the broadcast flips to the categorically-bounded
    SOURCES marginal (VERDICT r11 #2 — previously an undocumented
    broadcast assumption). Pin: below the gate some BroadcastExchange
    aggregates by tok; above it none does but one aggregates by
    source; values identical both ways."""
    from presto_truffle_spark.operators import text

    spark.catalog.clearCache()
    df0 = text.text_jsd_by_source(spark, sf_dir)
    keys0 = _broadcast_agg_keys(inspect.physical_plan(df0))
    assert "tok" in keys0, keys0
    base = sorted(map(tuple, df0.collect()))
    spark.catalog.clearCache()
    monkeypatch.setattr(text, "_VOCAB_BROADCAST_MAX_BYTES", 0)
    df1 = text.text_jsd_by_source(spark, sf_dir)
    keys1 = _broadcast_agg_keys(inspect.physical_plan(df1))
    assert "tok" not in keys1, keys1
    assert "source" in keys1, keys1
    assert sorted(map(tuple, df1.collect())) == base
    spark.catalog.clearCache()


def test_user_days_consumers_share_one_pipeline(spark, sf_dir):
    """r5 rescan-audit fixes: the events→distinct(user,day) reduction must
    be computed ONCE per query. Retention replaced its groupBy+self-join
    with a window (structurally one scan); the two rolling-distinct
    queries persist user_days so every consumer reads the cache (Spark
    performs no exchange reuse across these shapes — measured, zero
    ReusedExchange at execution)."""
    import re

    from presto_truffle_spark.operators.timeseries_advanced import (
        events_hll_sliding_distinct,
        events_retention_cohorts,
        events_rolling_distinct_users,
    )

    # The rolling-distinct queries persist user_days with the IDENTICAL
    # logical plan retention builds; if they ran earlier in this session
    # (test_entry runs every query), the CacheManager substitutes that
    # cache into retention's plan and the scan-count assertion below
    # would count the cache description's embedded FileScan text. Clear
    # the cache so each assertion sees the intrinsic plan shape.
    spark.catalog.clearCache()

    plan = inspect.physical_plan(events_retention_cohorts(spark, sf_dir))
    assert len(re.findall(r"FileScan parquet .*?events\.parquet", plan)) == 1
    assert "InMemoryTableScan" not in plan  # window rewrite, no cache needed

    plan = inspect.physical_plan(events_hll_sliding_distinct(spark, sf_dir))
    assert plan.count("InMemoryTableScan") >= 4  # sketch, calendar, exact×2

    plan = inspect.physical_plan(events_rolling_distinct_users(spark, sf_dir))
    assert plan.count("InMemoryTableScan") >= 2  # calendar + contributes


def test_quality_audit_scans_each_table_once(spark, sf_dir):
    """The constraint audit must aggregate each table in ONE pass (r5:
    the UNION ALL spelling re-scanned customer 3× and orders 2× — same-
    source aggregates do not collapse across union branches). Allowed
    remainder: customer appears twice because its second read is the
    single-column pruned build side of the referential-integrity join."""
    import re

    from presto_truffle_spark.operators.matching_ops import (
        quality_constraint_audit,
    )

    plan = inspect.physical_plan(quality_constraint_audit(spark, sf_dir))
    counts = {
        t: len(re.findall(rf"FileScan parquet .*?{t}\.parquet", plan))
        for t in ("customer", "orders", "lineitem")
    }
    assert counts == {"customer": 2, "orders": 1, "lineitem": 1}, counts


def test_bigram_surprisal_counts_computed_once(spark, sf_dir):
    """The vocabulary²-bounded bigram count table c2 must be persisted:
    c1 derives from it and the scored join probes it — both must read
    the cache instead of re-running the corpus explode+count (r5 rescan
    audit). The corpus-scale probe side stays uncached by design."""
    from presto_truffle_spark.operators.matching_ops import (
        text_bigram_surprisal,
    )

    spark.catalog.clearCache()
    plan = inspect.physical_plan(text_bigram_surprisal(spark, sf_dir))
    assert plan.count("InMemoryTableScan") >= 2


def test_round3_tpch_plan_shapes(spark, sf_dir):
    """The six r3 TPC-H additions must keep the battery's plan posture:
    dims resolve via broadcast, and nothing degenerates to a cartesian /
    nested-loop product (the EXISTS/NOT EXISTS in q21 must decorrelate to
    semi/anti hash joins)."""
    from presto_truffle_spark.operators import tpch_round3 as t3

    for fn in (
        t3.q8_national_market_share,
        t3.q9_product_type_profit,
        t3.q11_important_stock,
        t3.q13_customer_distribution,
        t3.q15_top_supplier,
        t3.q21_suppliers_kept_waiting,
    ):
        plan = inspect.physical_plan(fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__
    assert inspect.uses_broadcast_join(t3.q8_national_market_share(spark, sf_dir))
    assert inspect.uses_broadcast_join(t3.q9_product_type_profit(spark, sf_dir))
    # q21's top-100 must not global-sort
    assert inspect.uses_take_ordered(t3.q21_suppliers_kept_waiting(spark, sf_dir))


def test_chunk_fingerprint_no_nested_loop(spark, sf_dir):
    """The chunk⋈dup-set join must stay an equi hash join on the digest —
    a nested-loop here would be the O(n²) shape the operator exists to
    avoid."""
    from presto_truffle_spark.operators.dedup import dedup_chunk_fingerprint

    plan = inspect.physical_plan(dedup_chunk_fingerprint(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_balance_sources_is_map_only_over_docs(spark, sf_dir):
    """corpus_balance_sources must broadcast the per-source thresholds —
    the whole design is one map-only scan of the corpus; a shuffle join on
    source would reintroduce the skew the op avoids. Exchange budget
    pinned at 3 (source-count agg partial→final + the final presentation
    ordering); the only nested-loop allowed is the 1-row quota broadcast
    cross join."""
    from presto_truffle_spark.operators.corpus_ops import corpus_balance_sources

    df = corpus_balance_sources(spark, sf_dir)
    assert inspect.uses_broadcast_join(df)
    assert inspect.broadcast_hint_count(df) >= 2  # quota row + thresholds
    assert inspect.count_exchanges(df) <= 3
    for line in inspect.physical_plan(df).splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line  # 1-row quota broadcast only


def test_rollup_cascade_exchange_budget(spark, sf_dir):
    """events_rollup_cascade: exactly 3 exchanges — one per rollup level
    (minute from raw, hour from minute, day from hour). A 4th exchange
    would mean a level re-scanned raw events, defeating the cascade's
    whole 100 TB point (each level reads ≤1/60th of the previous)."""
    from presto_truffle_spark.operators.timeseries_advanced import (
        events_rollup_cascade,
    )

    assert inspect.count_exchanges(events_rollup_cascade(spark, sf_dir)) == 3


def test_approx_distinct_hll_not_in_expand(spark, sf_dir):
    """r4 fix: the HLL partial buffer (~6.5 KB/row at rsd=0.02) must never
    ride the multi-distinct Expand — in the broken plan the
    partial_approx_count_distinct was keyed by the Expand's gid, attaching
    the buffer to every (group, orderkey, partkey) row (GBs of shuffle for
    a 3-row answer). Fixed plan: approx and exact aggregate separately and
    join on the tiny grouped result."""
    from presto_truffle_spark.operators.aggregates import agg_approx_distinct

    df = agg_approx_distinct(spark, sf_dir)
    for line in inspect.physical_plan(df).splitlines():
        if "partial_approx_count_distinct" in line:
            assert "gid" not in line
    assert inspect.count_exchanges(df) == 3  # exact expand + approx + bcast


def test_percentiles_single_buffer(spark, sf_dir):
    """r4 fix: all quantiles of one column must come from ONE
    percentile(col, array(...)) aggregate — each separate percentile call
    ships its own per-group value-counts map through the shuffle."""
    from presto_truffle_spark.operators.aggregates import (
        agg_percentile_approx,
        agg_percentiles,
    )

    p1 = inspect.physical_plan(agg_percentiles(spark, sf_dir))
    assert p1.count("partial_percentile(") == 1
    p2 = inspect.physical_plan(agg_percentile_approx(spark, sf_dir))
    assert p2.count("partial_percentile(") == 1
    assert p2.count("partial_percentile_approx(") == 1


def test_ngram_jaccard_is_equi_join(spark, sf_dir):
    """r4 fix: the pair join must be the inverted-index hash join on the
    shingle, never the doc_a < doc_b nested loop (O(n²) in the scope)."""
    from presto_truffle_spark.operators.dedup import dedup_ngram_jaccard

    df = dedup_ngram_jaccard(spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert inspect.count_exchanges(df) <= 2


def test_pagerank_plan_stays_shallow(spark, sf_dir):
    """graph_pagerank localCheckpoints each power iteration, so the
    RETURNED plan must be iteration-count-independent: zero exchanges and
    no joins in the final lineage (they all happened inside materialized
    checkpoints). Without the checkpoint the plan nests one join tree per
    iteration and the optimizer blows up at production iteration counts —
    this is the plan-growth regression guard."""
    from presto_truffle_spark.operators.quality_ops import graph_pagerank

    df = graph_pagerank(spark, sf_dir)
    assert inspect.count_exchanges(df) == 0
    plan = inspect.physical_plan(df)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_kmeans_broadcasts_centroids_and_prunes_scan(spark, sf_dir):
    """The Lloyd step must broadcast the K=8 centroid side (the model is
    always broadcastable; shuffling the corpus against it would be the
    100 TB mistake) and push the centroid vec_id filter to its scan."""
    from presto_truffle_spark.operators.similarity import ann_kmeans_iteration

    df = ann_kmeans_iteration(spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # centroid filter reaches parquet (8-row side scans 8 rows, not 500)
    assert "vec_id" in plan and "PushedFilters: [" in plan


def test_snapshot_diff_is_one_key_shuffle_no_broadcast_growth(spark, sf_dir):
    """The version diff is a key-partitioned FULL OUTER join: both sides
    grow with the table, so neither may be broadcast; classification is
    row-local (no extra exchange beyond the join + final 4-row agg)."""
    from presto_truffle_spark.operators.lakehouse_ops import (
        lakehouse_snapshot_diff,
    )

    import re

    df = lakehouse_snapshot_diff(spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin) .*FullOuter", plan)
    assert "BroadcastHashJoin" not in plan
    assert "CartesianProduct" not in plan


def test_audio_energy_is_map_only_until_output(spark, sf_dir):
    """Synth and decode are two chained Arrow stages with NO shuffle
    anywhere: samples of one payload never leave their partition (the
    windowed aggregate happens inside the decode UDF)."""
    from presto_truffle_spark.operators.multimodal import (
        multimodal_audio_energy,
    )

    df = multimodal_audio_energy(spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert plan.count("ArrowEvalPython") >= 2 or plan.count("MapInPandas") >= 2
    assert "Exchange" not in plan


def test_video_scene_cuts_is_map_only(spark, sf_dir):
    """The cut decision needs frame f-1, but all frames of one payload
    are executor-local by construction, so the lag runs inside the
    decode UDF — the plan must contain NO exchange (per-video temporal
    features never justify a shuffle at 100 TB)."""
    from presto_truffle_spark.operators.multimodal import (
        multimodal_video_scene_cuts,
    )

    plan = inspect.physical_plan(multimodal_video_scene_cuts(spark, sf_dir))
    assert "Exchange" not in plan
    assert "Window" not in plan  # the oracle's lag window stays SQL-side


def test_scd2_windows_share_one_shuffle_and_sort(spark, sf_dir):
    """The change-detect lag window and the interval-stitch
    row_number/lead window use the SAME (user_id, ts, event_id)
    partitioning+ordering, so Catalyst must plan ONE exchange and ONE
    sort for the whole build — a second sort would double the cost of a
    CDC dimension refresh for nothing."""
    from presto_truffle_spark.operators.timeseries_advanced import (
        scd2_dimension_build,
    )

    plan = inspect.physical_plan(scd2_dimension_build(spark, sf_dir))
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Sort ") == 1, plan


def test_chunk_overlap_is_shuffle_free_generate(spark, sf_dir):
    """Chunking is explode(sequence) + substr — a pure map-side
    Generate. Any Exchange here would mean shuffling the full corpus
    text to produce a per-row derivation."""
    from presto_truffle_spark.operators.corpus_ops import text_chunk_overlap

    plan = inspect.physical_plan(text_chunk_overlap(spark, sf_dir))
    assert "Exchange" not in plan, plan
    assert "Generate" in plan, plan


def test_drift_psi_aggregates_before_any_window(spark, sf_dir):
    """PSI reduces the corpus to <= 10 bin rows via partial+final hash
    aggregate BEFORE the total-share window touches anything — the
    window's single-partition exchange must see 10 rows, never the
    corpus. Pin: exactly the agg exchange + the tiny window exchange,
    and the window sits above the aggregate."""
    from presto_truffle_spark.operators.corpus_ops import corpus_drift_psi

    plan = inspect.physical_plan(corpus_drift_psi(spark, sf_dir))
    assert plan.count("Exchange") == 2, plan
    assert plan.index("HashAggregate") > plan.index("Window"), (
        "window must consume the aggregate output (plans print top-down)"
    )


def test_pq_codes_broadcasts_codebook_single_argmin_shuffle(spark, sf_dir):
    """The PQ codebook is the model (m*k = 16 slice rows) — it must
    broadcast; the only exchange in the encode plan is the per-(vec,sub)
    argmin window. A SortMergeJoin here would mean shuffling the corpus
    against a 16-row table."""
    from presto_truffle_spark.operators.similarity import ann_pq_codes

    plan = inspect.physical_plan(ann_pq_codes(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # exchanges: the codebook broadcast plus ONE hash exchange feeding
    # the argmin window (plus AQE cosmetics); no second data shuffle
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_ngram_containment_is_equi_join(spark, sf_dir):
    """Same inverted-index guarantee as jaccard: the pair space is
    postings co-occurrence through a hash join on the shingle — any
    cartesian/BNLJ here would be the O(n²) all-pairs form."""
    from presto_truffle_spark.operators.dedup import dedup_ngram_containment

    plan = inspect.physical_plan(dedup_ngram_containment(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_image_dhash_is_map_only(spark, sf_dir):
    """Encode and decode/hash are two chained Arrow stages with NO
    shuffle: payloads must never cross an exchange (at 100 TB the
    binary column dominates all other traffic)."""
    from presto_truffle_spark.operators.multimodal import (
        multimodal_image_dhash,
    )

    plan = inspect.physical_plan(multimodal_image_dhash(spark, sf_dir))
    assert "Exchange" not in plan, plan


def test_session_dynamic_gap_single_shuffle(spark, sf_dir):
    """The builtin session_window assembles sessions per key after ONE
    exchange on user_id — a second shuffle would mean the merge isn't
    running partition-local."""
    from presto_truffle_spark.operators.timeseries import (
        events_session_dynamic_gap,
    )

    plan = inspect.physical_plan(events_session_dynamic_gap(spark, sf_dir))
    assert plan.count("Exchange") == 1, plan


def test_phrase_search_joins_are_equi_extracted(spark, sf_dir):
    """The adjacency condition (d0=d1 AND p1=p0+1) must be EXTRACTED as
    equi keys — hash/sort-merge joins over the three pruned postings
    sets, never a nested loop over the corpus."""
    from presto_truffle_spark.operators.text import text_phrase_search

    plan = inspect.physical_plan(text_phrase_search(spark, sf_dir))
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert (
        plan.count("BroadcastHashJoin") + plan.count("SortMergeJoin")
        + plan.count("ShuffledHashJoin") >= 2
    ), plan


def test_lateness_audit_one_exchange(spark, sf_dir):
    """Running-frontier window + 5-candidate explode + aggregate: one
    exchange total (the global-order window; the candidate explode is
    map-side and the final aggregate rides AQE's tiny-output path)."""
    from presto_truffle_spark.operators.timeseries_advanced import (
        events_watermark_lateness_audit,
    )

    plan = inspect.physical_plan(
        events_watermark_lateness_audit(spark, sf_dir)
    )
    assert plan.count("Exchange") == 1, plan


def test_incremental_agg_two_group_exchanges(spark, sf_dir):
    """MV refresh = partials aggregate (one group exchange, written to
    state) + merge aggregate (one group exchange over state ∪ delta
    partials) — anything more would mean the base facts are rescanned."""
    from presto_truffle_spark.operators.lakehouse_ops import (
        lakehouse_incremental_agg,
    )

    plan = inspect.physical_plan(lakehouse_incremental_agg(spark, sf_dir))
    assert plan.count("Exchange") == 2, plan


def test_null_aware_anti_join_operator_planned(spark, sf_dir):
    """NOT IN must plan the NULL-AWARE anti join (the BuildRight `true`
    flag on the broadcast hash join), not decay to plain LeftAnti —
    3-valued-logic semantics live in that operator."""
    from presto_truffle_spark.operators.joins import join_null_aware_anti

    plan = inspect.physical_plan(join_null_aware_anti(spark, sf_dir))
    join_lines = [l for l in plan.splitlines() if "Join" in l]
    assert any(
        "LeftAnti" in l and ("true" in l or "NullAware" in l)
        for l in join_lines
    ), join_lines


def test_incremental_dedup_plan_shape(spark, sf_dir):
    """dedup_incremental_minhash (r7) must never plan a cartesian/nested
    loop (the candidate join is a band-bucket equi-join with the incoming
    side as probe) and must carry no hard broadcast hint — the incoming
    side derives from documents and grows with SF, so the r4 doctrine
    leaves the size call to AQE."""
    from presto_truffle_spark.operators.dedup import dedup_incremental_minhash

    df = dedup_incremental_minhash(spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert inspect.broadcast_hint_count(df) == 0


def test_bm25_take_ordered_and_broadcast_stats(spark, sf_dir):
    """text_bm25_search: the global top-20 must compile to
    TakeOrderedAndProject (never a full sort of the scored postings) and
    both tiny sides (df, corpus stats) must broadcast."""
    from presto_truffle_spark.operators.text import text_bm25_search

    df = text_bm25_search(spark, sf_dir)
    assert inspect.uses_take_ordered(df)
    plan = inspect.physical_plan(df)
    assert plan.count("BroadcastExchange") >= 2
    assert "CartesianProduct" not in plan


def test_ann_int8_broadcasts_query_side_only(spark, sf_dir):
    """ann_int8_retrieval: the 5-row query side broadcasts; the corpus is
    never on a broadcast side and never in a cartesian product."""
    from presto_truffle_spark.operators.similarity import ann_int8_retrieval

    df = ann_int8_retrieval(spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert "CartesianProduct" not in plan
    # the only broadcast join is the 5-row query side (a
    # BroadcastNestedLoopJoin over an unconditioned tiny side is the
    # intended qN x corpus pairing, same shape as ann_cosine_topk)
    assert plan.count("BroadcastExchange") == 1


def test_incremental_semantic_no_cartesian_no_hard_hint(spark, sf_dir):
    """dedup_incremental_semantic mirrors the minhash twin's doctrine: the
    candidate join is bucket-keyed (no cartesian/nested loop over the
    corpus) and carries no hard broadcast hint — the batch side grows
    with SF, so AQE makes the size call."""
    from presto_truffle_spark.operators.quality_ops import (
        dedup_incremental_semantic,
    )

    df = dedup_incremental_semantic(spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert "CartesianProduct" not in plan
    # exactly the two fixed-cardinality plane broadcasts (8 rows each,
    # one per side of the bucket self-join via ann_lsh_buckets); the
    # growing batch side itself carries NO hard hint
    assert inspect.broadcast_hint_count(df) == 2


def test_semantic_pipeline_pairs_join_is_bucket_keyed(spark, sf_dir):
    """pipeline_semantic_dedup's candidate stage must pair vectors through
    the bucket equi-join, never a cartesian over the corpus (the plane
    cross-join against the 8 broadcast hyperplanes is the one intended
    nested-loop, inherited from ann_lsh_buckets)."""
    from presto_truffle_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    df = embedding_near_dup_pairs(spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    )


def test_profile_table_single_scan(spark, sf_dir):
    """profile_table_stats computes all five per-column stat sets in ONE
    aggregate pass over ONE scan — the point of the operator vs its
    deliberately-naive five-scan UNION ALL oracle."""
    from presto_truffle_spark.operators.coverage_extras import (
        profile_table_stats,
    )

    df = profile_table_stats(spark, sf_dir)
    assert len(inspect.parquet_scans(df)) == 1


def test_window_exclude_single_exchange(spark, sf_dir):
    """window_frame_exclude's peer-group window must reuse the frame
    window's hash partitioning (user_id ⊂ (user_id, vb)): one exchange
    total — the emulation costs no extra shuffle over the plain frame."""
    from presto_truffle_spark.operators.windows import window_frame_exclude

    df = window_frame_exclude(spark, sf_dir)
    assert inspect.count_exchanges(df) == 1


def test_profile_approx_half_is_expand_free(spark, sf_dir):
    """The approx-distinct profiling aggregate (the half a production
    profiler runs) must plan NO Expand — one constant-size HLL sketch
    per column in a single pass. (The registered composite joins the
    exact profile only because the envelope oracle needs it.)"""
    import pyspark.sql.functions as F

    from presto_truffle_spark.catalog import load_table
    from presto_truffle_spark.operators.coverage_extras import _PROFILE_COLS

    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c, _t in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.approx_count_distinct(c, rsd=0.02).alias(f"{c}__approx"),
        ]
    plan = inspect.physical_plan(o.agg(*aggs))
    assert "Expand" not in plan
    assert len(inspect.parquet_scans(o.agg(*aggs))) == 1


def test_hybrid_rrf_fusion_semantics(spark, sf_dir):
    """search_hybrid_rrf: fused scores must recompute exactly from the
    emitted ranks (1/(60+r) per list the doc appears in, 6dp floor), the
    output must be a subset of lex-top20 ∪ sem-top20, and the top-10 must
    be ordered by fused score with doc_id tie-break."""
    import math

    from presto_truffle_spark.operators.text import (
        _FUSE_N,
        _HYBRID_OUT,
        _RRF_K,
        search_hybrid_rrf,
    )

    rows = search_hybrid_rrf(spark, sf_dir).collect()
    assert len(rows) == _HYBRID_OUT
    prev = None
    for r in rows:
        assert 0 <= r.lex_rank <= _FUSE_N and 0 <= r.sem_rank <= _FUSE_N
        assert r.lex_rank > 0 or r.sem_rank > 0
        expect = (1.0 / (_RRF_K + r.lex_rank) if r.lex_rank else 0.0) + (
            1.0 / (_RRF_K + r.sem_rank) if r.sem_rank else 0.0
        )
        assert r.rrf == math.floor(expect * 1_000_000 + 0.5) / 1_000_000
        if prev is not None:
            assert (expect, -r.doc_id) <= prev or math.isclose(
                expect, prev[0]
            )
        prev = (expect, -r.doc_id)


def test_hybrid_rrf_plan_no_cartesian_fact_side(spark, sf_dir):
    """search_hybrid_rrf: the only pair join is the broadcast of the
    1-row query vector; the fusion join of the two 20-row lists must
    never put a scan-sized side into a cartesian product."""
    from presto_truffle_spark.operators.text import search_hybrid_rrf

    df = search_hybrid_rrf(spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert "CartesianProduct" not in plan


def test_mmr_greedy_properties(spark, sf_dir):
    """search_mmr_diversify: ranks 1..k, distinct picks, pick 1 is the
    max-relevance candidate, and the mmr score is non-increasing in rank
    (at step r+1 every remaining candidate's penalty is >= its step-r
    penalty, so the argmax can only fall)."""
    from presto_truffle_spark.operators.similarity import (
        _MMR_K,
        search_mmr_diversify,
    )

    rows = sorted(
        search_mmr_diversify(spark, sf_dir).collect(),
        key=lambda r: r.mmr_rank,
    )
    assert [r.mmr_rank for r in rows] == list(range(1, _MMR_K + 1))
    assert len({r.doc_id for r in rows}) == _MMR_K
    assert rows[0].rel == max(r.rel for r in rows)
    mmrs = [r.mmr for r in rows]
    assert all(a >= b for a, b in zip(mmrs, mmrs[1:]))


def test_mmr_rerank_never_rescans_corpus(spark, sf_dir):
    """search_mmr_diversify: the pool is localCheckpointed, so the
    returned plan must contain NO parquet scan — the k-step rerank runs
    entirely over the 20-row pool (the retrieve-distributed/rerank-small
    contract), instead of re-deriving the pool's corpus scan once per
    iteration."""
    from presto_truffle_spark.operators.similarity import search_mmr_diversify

    df = search_mmr_diversify(spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert "FileScan" not in plan and "parquet" not in plan.lower()


def test_hard_negatives_exclusion_engages(spark, sf_dir):
    """mining_hard_negatives: no returned candidate may share its query's
    label (the false-negative exclusion must BITE, not just exist — the
    fixture gives each query ~10% same-label pool mates), ranks are
    contiguous 1..k per query, and every returned (qid, cid) must be in
    the query's raw top-30 pool."""
    from presto_truffle_spark.operators.similarity import (
        _HN_K,
        _HN_POOL,
        _N_QUERIES,
        mining_hard_negatives,
    )
    from presto_truffle_spark.catalog import load_table

    rows = mining_hard_negatives(spark, sf_dir).collect()
    labels = {
        r.vec_id: r.label
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    by_q = {}
    for r in rows:
        assert labels[r.cid] != labels[r.qid]
        by_q.setdefault(r.qid, []).append(r.neg_rank)
    assert set(by_q) == set(range(_N_QUERIES))
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, _HN_K + 1))
    # engagement: at least one query's pool had a same-label candidate
    # ranked above a returned negative — i.e. some pool mate was skipped
    import pyspark.sql.functions as F

    e = load_table(spark, sf_dir, "embeddings")
    n_same = (
        e.filter(F.col("vec_id") >= _N_QUERIES)
        .join(
            e.filter(F.col("vec_id") < _N_QUERIES).select(
                F.col("label").alias("qlabel")
            ).distinct(),
            F.col("label") == F.col("qlabel"),
            "left_semi",
        )
        .count()
    )
    assert n_same > 0  # fixture sanity: same-label candidates exist at all


def test_retrieval_eval_metrics_bounds(spark, sf_dir):
    """retrieval_eval_metrics: every metric in [0, 1], hits <= k,
    hits <= n_relevant, and a query whose top-1 candidate is relevant
    must have mrr == 1 (recompute from the ranked list)."""
    from presto_truffle_spark.operators.similarity import (
        _EVAL_K,
        _N_QUERIES,
        retrieval_eval_metrics,
    )

    rows = retrieval_eval_metrics(spark, sf_dir).collect()
    assert {r.qid for r in rows} == set(range(_N_QUERIES))
    for r in rows:
        assert 0 <= r.hits_at_k <= _EVAL_K
        assert r.hits_at_k <= r.n_relevant
        for m in (r.recall_at_k, r.mrr, r.ndcg_at_k):
            assert 0.0 <= m <= 1.0
        # hits == 0 <=> mrr == 0 <=> ndcg == 0
        assert (r.hits_at_k == 0) == (r.mrr == 0.0) == (r.ndcg_at_k == 0.0)


def test_groups_frame_rewrite_single_exchange(spark, sf_dir):
    """window_groups_frame: the dense_rank+RANGE composition must reuse
    ONE hash exchange on o_custkey for both window operators — the
    rewrite's cost over a (nonexistent) native GROUPS frame is a rank
    column and an in-partition re-sort, never a second shuffle."""
    from presto_truffle_spark.operators.windows import window_groups_frame

    df = window_groups_frame(spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 2


def test_interval_overlap_no_theta_join(spark, sf_dir):
    """join_interval_overlap: the grid-aligned rewrite must contain NO
    join at all — the overlap aggregation is explode + groupBy on the
    month key (the theta-join spelling lives only in the oracle); no
    cartesian or nested-loop node anywhere."""
    from presto_truffle_spark.operators.joins import join_interval_overlap

    df = join_interval_overlap(spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan
    assert "Join" not in plan  # no join operator of any kind
    assert "Generate" in plan  # the month explode


def test_incremental_join_deltas_engage(spark, sf_dir):
    """lakehouse_incremental_join: the split must make BOTH the base MV
    and the delta terms non-trivial (a delta of zero rows would verify
    the algebra vacuously), and the merged view must equal the
    from-scratch join aggregate exactly."""
    import pyspark.sql.functions as F

    from presto_truffle_spark.catalog import load_table
    from presto_truffle_spark.operators.lakehouse_ops import (
        _IVM_SPLIT,
        lakehouse_incremental_join,
    )

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n_new_o = o.filter(F.to_date("o_orderdate") >= F.lit(_IVM_SPLIT)).count()
    n_new_l = li.filter(F.to_date("l_shipdate") >= F.lit(_IVM_SPLIT)).count()
    assert n_new_o > 0 and n_new_l > 0
    assert n_new_o < o.count() and n_new_l < li.count()
    got = {
        r.o_orderpriority: (r.n_pairs, r.qty_cents)
        for r in lakehouse_incremental_join(spark, sf_dir).collect()
    }
    qcents = F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
    want = {
        r.o_orderpriority: (r.n, r.q)
        for r in o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.sum(qcents).cast("long").alias("q"))
        .collect()
    }
    assert got == want


def test_langid_confusion_conserves_rows(spark, sf_dir):
    """text_langid_confusion: per true-lang row the cell counts must sum
    to label_total and the cell rates to ~1; totals must cover the whole
    corpus (every doc lands in exactly one cell)."""
    from presto_truffle_spark.catalog import load_table
    from presto_truffle_spark.operators.text import text_langid_confusion

    rows = text_langid_confusion(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n for r in rows) == n_docs
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label_lang, []).append(r)
    for label, rs in by_label.items():
        assert sum(r.n for r in rs) == rs[0].label_total
        assert abs(sum(r.cell_rate for r in rs) - 1.0) < 1e-4


def test_budgeted_release_stage_conservation(spark, sf_dir):
    """pipeline_budgeted_release: the released token mass must fit 25% of
    the POST-dedup gated corpus (not the raw corpus — dedup-before-
    budget is the stage-order contract), every split is one of
    train/val/test, and the pipeline keeps strictly fewer docs than the
    gate alone (dedup + budget both bite on the fixture)."""
    import pyspark.sql.functions as F

    from presto_truffle_spark.catalog import load_table
    from presto_truffle_spark.operators.pipelines import (
        pipeline_budgeted_release,
    )

    rows = pipeline_budgeted_release(spark, sf_dir).collect()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    released_tokens = sum(r.total_tokens for r in rows)
    released_docs = sum(r.n_docs for r in rows)

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    scored = d.select(
        "source", "text",
        F.size(toks).alias("n_tok"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("ttr"),
    )
    thr = scored.groupBy("source").agg(F.percentile("ttr", F.lit(0.5)).alias("m"))
    gated = scored.join(thr, "source").filter(F.col("ttr") >= F.col("m"))
    gated_survivor_tokens = (
        gated.groupBy("text").agg(F.min("n_tok").alias("n"))
        .agg(F.sum("n")).collect()[0][0]
    )
    assert released_tokens <= int(gated_survivor_tokens * 0.25)
    assert 0 < released_docs < gated.count()


def test_peak_concurrency_matches_naive_sweep(spark, sf_dir):
    """events_peak_concurrency: the distributed two-pass prefix sum must
    equal a naive single-window global sweep computed in-Spark (the
    oracle proves it cross-engine; this pins it in-engine so a refactor
    of the carry logic can't silently shift bucket boundaries), and
    concurrency must be positive wherever reported."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    from presto_truffle_spark.catalog import load_table
    from presto_truffle_spark.operators.timeseries_advanced import (
        events_peak_concurrency,
    )
    from presto_truffle_spark.tztime import trunc_ntz

    got = {
        (r.bucket, r.max_concurrent)
        for r in events_peak_concurrency(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    s = trunc_ntz("second", F.col("ts"))
    iv = e.select(
        s.alias("s"),
        F.timestamp_add(
            "SECOND", (F.col("event_id") % 300 + 60).cast("int"), s
        ).alias("e"),
    )
    deltas = iv.select(F.col("s").alias("t"), F.lit(1).alias("pos"), F.lit(0).alias("neg")).unionAll(
        iv.select(F.col("e").alias("t"), F.lit(0).alias("pos"), F.lit(1).alias("neg"))
    )
    per_t = deltas.groupBy("t").agg(F.sum("pos").alias("pos"), F.sum("neg").alias("neg"))
    cum = per_t.withColumn(
        "cum", F.sum(F.col("pos") - F.col("neg")).over(W.orderBy("t"))
    )
    naive = {
        (r.bucket, r.m)
        for r in cum.withColumn("bucket", trunc_ntz("hour", F.col("t")))
        .withColumn(
            "peak", F.col("cum") - (F.col("pos") - F.col("neg")) + F.col("pos")
        )
        .groupBy("bucket")
        .agg(F.max("peak").cast("long").alias("m"))
        .collect()
    }
    assert got == naive
    assert all(m > 0 for _, m in got)


def test_velocity_windows_single_exchange_and_monotone(spark, sf_dir):
    """events_velocity_windows: the three horizon frames must share ONE
    hash exchange (same partition key + order), and per row the counts
    must be monotone: 1 <= n_5m <= n_1h <= n_24h."""
    from presto_truffle_spark.operators.timeseries_advanced import (
        events_velocity_windows,
    )

    df = events_velocity_windows(spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert plan.count("Exchange hashpartitioning") == 1
    for r in df.collect():
        assert 1 <= r.n_5m <= r.n_1h <= r.n_24h


def test_null_safe_join_stays_hash_join(spark, sf_dir):
    """join_null_safe_keys: the <=> key must compile to a HASH join
    (null-safe equality is a deterministic key function) — never a
    cartesian/nested-loop, which is where the naive OR-spelling of
    null-safety lands."""
    from presto_truffle_spark.operators.joins import join_null_safe_keys

    df = join_null_safe_keys(spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_skyline_broadcasts_grid_no_cartesian(spark, sf_dir):
    """filter_skyline_2d: the per-price grid (bounded by price-grid
    cardinality) must come back to the corpus via a BROADCAST hash
    join on price_cents — never a cartesian — and the frontier must be
    Pareto-consistent: no returned point dominated by another."""
    from presto_truffle_spark.operators.relational import filter_skyline_2d

    df = filter_skyline_2d(spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert inspect.uses_broadcast_join(df)
    rows = df.collect()
    assert rows, "frontier must be non-empty on the fixture"
    for a in rows:
        for b in rows:
            dominated = (
                b.price_cents <= a.price_cents
                and b.p_size >= a.p_size
                and (b.price_cents < a.price_cents or b.p_size > a.p_size)
            )
            assert not dominated, (a, b)


def test_cdc_apply_collapses_log_before_join(spark, sf_dir):
    """lakehouse_cdc_apply: the op log must fold to one row per key
    (groupBy max) BEFORE the snapshot join — the plan joins an
    Aggregate subtree, never the raw log — and the merged actions
    partition the key space: kept + upserted counts equal the merged
    row total."""
    from presto_truffle_spark.operators.lakehouse_ops import lakehouse_cdc_apply

    df = lakehouse_cdc_apply(spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "HashJoin" in plan
    rows = df.collect()
    actions = {r.action for r in rows}
    assert actions == {"kept", "upserted"}
    assert all(r.n_rows > 0 for r in rows)


def test_attribution_credit_conserves_per_conversion(spark, sf_dir):
    """events_attribution_linear: integer ppm credit must conserve —
    total credit across touch types equals (1e6 div n)·n summed per
    conversion, i.e. within n_conversions·(n-1) ppm of n_conversions
    million (the div remainder is the only loss)."""
    from presto_truffle_spark.operators.timeseries import (
        events_attribution_linear,
    )

    rows = events_attribution_linear(spark, sf_dir).collect()
    total_ppm = sum(r.credit_ppm for r in rows)
    n_credited = sum(r.n_credited for r in rows)
    assert 0 < total_ppm <= n_credited * 1_000_000
    # every credited conversion contributes ~1e6 ppm minus div remainder:
    # the conserved total can't exceed one million per credited touch and
    # must exceed half a million per conversion-with-touches.
    assert total_ppm > 500_000


def test_pmi_pair_join_is_doc_keyed(spark, sf_dir):
    """text_pmi_collocations: the co-occurrence self-join must be keyed
    on doc_id (bounded per-doc blocks) — no cartesian, no
    nested-loop — and every PMI row must satisfy the support floor."""
    from presto_truffle_spark.operators.text import text_pmi_collocations

    df = text_pmi_collocations(spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert rows
    assert all(r.c_ab >= 5 for r in rows)
    assert all(r.tok_a < r.tok_b for r in rows)


def test_seasonal_anomaly_baseline_broadcasts(spark, sf_dir):
    """events_seasonal_anomaly: the types-x-24 baseline must broadcast
    back onto the daily cells (never shuffle the cell table for the
    join), and flagged cells must genuinely exceed the threshold."""
    from presto_truffle_spark.operators.timeseries import (
        events_seasonal_anomaly,
    )

    df = events_seasonal_anomaly(spark, sf_dir)
    assert inspect.uses_broadcast_join(df)
    rows = df.collect()
    assert rows
    assert all(abs(r.zscore) > 2.5 for r in rows)


def test_bpe_rounds_are_vocab_bound(spark, sf_dir):
    """The returned BPE plan must contain NO corpus FileScan: the single
    corpus pass happens inside the eager localCheckpoint of the word
    table, and every merge round reads vocabulary-sized checkpointed
    state. Regression pin for the CTE-inlining bug (first draft planned
    21 documents scans)."""
    import re

    import __spark_entry__ as entry

    df = entry.queries()["text_bpe_merge_induction"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"FileScan parquet .*documents", plan), plan[:500]


def test_fifth_session_ops_no_nested_loop(spark, sf_dir):
    """The session's join-bearing ops must stay equi/hash shapes: the
    prefix-filter candidate join is an equi join on the prefix token (a
    nested loop would be the all-pairs scan the algorithm exists to
    dodge), the SCD2 as-of lookup joins on the user key with residual
    range predicates, Hampel's banded self-join binds on the hour index
    band, and the Fellegi-Sunter grouping-sets rewrite must plan exactly
    ONE scan of customer."""
    import re

    import __spark_entry__ as entry

    qs = entry.queries()
    for name in ("dedup_prefix_filter_join", "scd2_as_of_lookup"):
        plan = inspect.physical_plan(qs[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    fs_plan = inspect.physical_plan(
        qs["matching_fellegi_sunter"](spark, sf_dir)
    )
    assert len(re.findall(r"FileScan parquet .*?customer", fs_plan)) == 1
    assert "Expand" in fs_plan  # the grouping-sets single-pass shape


def test_uplift_and_rfm_ntile_are_tie_broken(spark, sf_dir):
    """ntile over heavily-tied scores is partition-order nondeterministic
    without a unique tie-break — pin that both ops' window orderings end
    in the entity key, so the driver's hash comparison can never flap."""
    import __spark_entry__ as entry

    qs = entry.queries()
    up = inspect.physical_plan(qs["events_uplift_by_decile"](spark, sf_dir))
    assert "user_id" in up and "ntile" in up
    rfm = inspect.physical_plan(qs["agg_rfm_segmentation"](spark, sf_dir))
    assert "o_custkey" in rfm and "ntile" in rfm


def test_snm_no_single_partition_window(spark, sf_dir):
    """dedup_sorted_neighborhood's r10 draft ran lead() over an
    UNPARTITIONED sort — the whole corpus through one task (VERDICT r10
    #2). Pin the fix: the only unpartitioned window left is the
    METADATA-scale _snm_offsets prefix sum (≤32 partition-count rows,
    lazy per ADVICE r11 — previously a plan-time .collect()); the
    corpus-scale row_number partitions by spark_partition_id, and the
    pair generation is an equi-join on the stitched global rank, not a
    nested loop."""
    import __spark_entry__ as entry

    df = entry.queries()["dedup_sorted_neighborhood"](spark, sf_dir)
    # {1, 2}: the ONE metadata window's subtree (a 32-row prefix sum)
    # prints under BOTH branches of the rank self-join today, but
    # exchange reuse / AQE / cache materialization could legitimately
    # print it once (ADVICE r12) — the invariant is "no CORPUS-scale
    # unpartitioned window appears", not the printer's subtree count.
    assert inspect.unpartitioned_window_count(df) in (1, 2)
    plan = inspect.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dispersion_topk_uses_take_ordered(spark, sf_dir):
    """text_dispersion_topk's term selection must be
    TakeOrderedAndProject (per-partition heads + driver merge), never a
    row_number over a globally-sorted vocabulary (VERDICT r10 #3). The
    one remaining unpartitioned window ranks the K-row frame, so it
    must sit ABOVE the TakeOrdered in the tree (i.e. consume its
    output)."""
    import __spark_entry__ as entry

    df = entry.queries()["text_dispersion_topk"](spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert plan.index("TakeOrderedAndProject") > plan.index("Window")


def test_dynamic_partition_pruning_engages(spark, sf_dir):
    """join_dynamic_partition_pruning (r14) must plan a RUNTIME
    dynamicpruningexpression in the partitioned fact scan's
    PartitionFilters — the dim filter is an aggregate attribute
    (years >= 80% of mean volume), so static constraint propagation
    CANNOT fold it; if this assertion fails, either DPP got disabled
    or the dim filter became statically inferable and the op no
    longer demonstrates the 100 TB mechanism it exists for."""
    import __spark_entry__ as entry

    df = entry.queries()["join_dynamic_partition_pruning"](spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert "dynamicpruningexpression" in plan, plan[:2000]
    assert "dynamicpruning" in plan.split("PartitionFilters", 1)[1][:300]


def test_burrows_marker_selection_uses_take_ordered(spark, sf_dir):
    """text_burrows_delta_sources' top-50 marker selection must be
    TakeOrderedAndProject (per-partition heads + driver merge over the
    vocab-bounded count), never a row_number over a globally-sorted
    vocabulary — the exact-rank shape the plan audit exists to catch
    (r15 docstring claim, pinned here)."""
    import __spark_entry__ as entry

    df = entry.queries()["text_burrows_delta_sources"](spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert "TakeOrderedAndProject" in plan


def test_bollinger_window_is_type_partitioned(spark, sf_dir):
    """window_bollinger_breakout's frame sums must run in windows
    PARTITIONED by event_type over the calendar-bounded day grid — a
    partition-less window would serialize the whole grid through one
    task (the single-partition-window shape the audit flags)."""
    import __spark_entry__ as entry

    df = entry.queries()["window_bollinger_breakout"](spark, sf_dir)
    plan = inspect.physical_plan(df)
    assert "Window" in plan
    # every Window node declares the event_type partition key
    for seg in plan.split("Window [")[1:]:
        header = seg.split("\n", 1)[0]
        assert "event_type" in header, header


def test_theil_and_kendall_broadcast_dims(spark, sf_dir):
    """The Theil/Kendall fact folds must broadcast the nation dim (and
    Theil the 5-row region/totals frames) — a shuffled dim join on the
    orders fact is the scale mistake q5's plan test guards against."""
    import __spark_entry__ as entry

    for key in (
        "agg_theil_inequality_decomposition",
        "agg_kendall_tau_nations",
    ):
        df = entry.queries()[key](spark, sf_dir)
        plan = inspect.physical_plan(df)
        assert "BroadcastHashJoin" in plan, key
