"""Physical-plan regression tests (SURVEY §4.2): the scale properties
we rely on at 100 TB must be visible in the executed plan at any SF —
pushdown/pruning reach the scan, small dims broadcast, top-k avoids a
global sort, banded LSH joins never degenerate to cartesian products.
"""

import pytest
from pyspark.sql import functions as F

SF = None  # provided by fixtures


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def qs():
    from algebraicdb_spark.plans import registry

    return registry.queries()


def test_projection_pruning_reaches_scan(spark, sf_dir, qs):
    plan = plan_of(qs["scan_projection_pushdown"](spark, sf_dir))
    scan_line = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "l_orderkey" in scan_line and "l_linenumber" in scan_line
    assert "l_extendedprice" not in scan_line  # untouched columns pruned


def test_filter_pushdown_reaches_scan(spark, sf_dir, qs):
    plan = plan_of(qs["filter_comparison"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "IsNotNull" in plan or "GreaterThan" in plan


def test_small_dims_broadcast(spark, sf_dir, qs):
    plan = plan_of(qs["join_inner_broadcast"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_star_join_single_big_shuffle(spark, sf_dir, qs):
    """Q3 star: every dim side broadcasts; only lineitem⋈orders may
    shuffle — no cartesian, no shuffled dim join."""
    plan = plan_of(qs["join_multiway_star"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_topk_is_take_ordered_not_global_sort(spark, sf_dir, qs):
    plan = plan_of(qs["topk_order_limit"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_lsh_keys_never_cartesian(spark, sf_dir, qs):
    for key in ("dedup_minhash_lsh", "dedup_near_jaccard", "dedup_simhash"):
        plan = plan_of(qs[key](spark, sf_dir))
        assert "CartesianProduct" not in plan, key
        assert "BroadcastNestedLoopJoin" not in plan, key


def test_embedding_cosine_not_allpairs(spark, sf_dir, qs):
    """Ball-cover blocking: the only nested-loop joins may involve the
    16-row centroid table — never corpus-vs-corpus (the r1 plan was a
    broadcast all-pairs self-join, O(n²) at any cluster size). The
    pair generation itself must be an equi-join on cluster keys."""
    plan = plan_of(qs["dedup_embedding_cosine"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "vec_a" not in line and "vec_b" not in line, line
    assert (
        "BroadcastHashJoin" in plan
        or "ShuffledHashJoin" in plan
        or "SortMergeJoin" in plan
    )


def test_minhash_band_shuffle_is_narrow(spark, sf_dir, qs):
    """The band-bucket self-join must not carry the token arrays —
    only (doc_id, band_idx, band_hash) rides that exchange; tokens
    re-join by doc_id after candidate dedup."""
    lines = plan_of(qs["dedup_minhash_lsh"](spark, sf_dir)).splitlines()
    checked = 0
    for i, line in enumerate(lines):
        if "Exchange hashpartitioning" in line and "band_idx" in line:
            # the Generate feeding the band exchange lists its retained
            # passthrough columns — tokens# there means the wide arrays
            # ride the shuffle (the r1 shape this test pins against).
            # A null-filter on the join key may sit between them.
            gen = next(
                (
                    lines[j]
                    for j in range(i + 1, min(i + 4, len(lines)))
                    if "Generate posexplode" in lines[j]
                ),
                None,
            )
            assert gen is not None, lines[i : i + 4]
            assert "tokens#" not in gen, gen
            checked += 1
    assert checked >= 2  # both sides of the band self-join


def test_simhash_fingerprint_is_map_side(spark, sf_dir, qs):
    """SimHash fingerprints are computed per row over the shingle-hash
    array — the plan must contain NO doc_id exchange (the old shape
    exploded shingles and shuffled a 60-column vote aggregate on
    doc_id); the only shuffles allowed are the chunk band join and the
    candidate dedup."""
    plan = plan_of(qs["dedup_simhash"](spark, sf_dir))
    assert "Exchange hashpartitioning(doc_id#" not in plan, plan


def test_knn_broadcasts_queries_not_corpus(spark, sf_dir, qs):
    """Brute-force kNN: the (10-row) query side broadcasts; the corpus
    streams. A CartesianProduct would mean both sides shuffle-explode."""
    plan = plan_of(qs["sim_knn_cosine"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    # broadcast subtree carries the query-set filter, not the full scan
    bcast = plan.split("BroadcastExchange", 1)[1]
    assert "vec_id" in bcast


def test_semi_anti_planned_as_joins(spark, sf_dir, qs):
    assert "LeftSemi" in plan_of(qs["join_left_semi"](spark, sf_dir))
    assert "LeftAnti" in plan_of(qs["join_left_anti"](spark, sf_dir))


def test_q1_whole_stage_codegen(spark, sf_dir, qs):
    """The flagship agg must stay inside WholeStageCodegen (no Python,
    no interpreted expressions in the hot path). AQE only finalizes
    the plan on execution, so run the query first."""
    df = qs["agg_groupby_hash"](spark, sf_dir)
    df.collect()
    plan = plan_of(df)
    # codegen stages render as "*(n) Operator" in the finalized plan
    assert "*(1)" in plan and "*(2) HashAggregate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_interval_join_is_hash_not_bnlj(spark, sf_dir, qs):
    """User-key equality must make the interval join a hash/merge join
    with a residual range filter — not a nested loop."""
    plan = plan_of(qs["join_interval"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_tpch_q6_filters_pushed_single_stage(spark, sf_dir, qs):
    """Q6 is scan + agg only: every predicate must reach PushedFilters
    and the plan must contain no join or window at all."""
    plan = plan_of(qs["tpch_q6"](spark, sf_dir))
    # the rendered filter list is truncated, so assert on its head
    assert "PushedFilters: [IsNotNull" in plan
    assert "GreaterThanOrEqual(l_shipda" in plan
    assert "Join" not in plan and "Window" not in plan


def test_tpch_q5_broadcasts_pruned_nations(spark, sf_dir, qs):
    """The region-filtered nation table broadcasts; fact-side joins
    are hash joins — never a cartesian/nested loop."""
    plan = plan_of(qs["tpch_q5"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_q4_exists_lowered_to_semi_join(spark, sf_dir, qs):
    plan = plan_of(qs["tpch_q4"](spark, sf_dir))
    assert "LeftSemi" in plan


def test_tpch_q22_anti_join_and_scalar_broadcast(spark, sf_dir, qs):
    plan = plan_of(qs["tpch_q22"](spark, sf_dir))
    assert "LeftAnti" in plan
    # the 1-row global-average side broadcasts (never shuffles customer
    # against it)
    assert "BroadcastExchange" in plan


def test_tpch_q15_no_global_window(spark, sf_dir, qs):
    """Top-supplier keeps ties via a scalar-max broadcast join; a
    rank() over an unpartitioned window would funnel all suppliers
    through one task at cluster scale."""
    plan = plan_of(qs["tpch_q15"](spark, sf_dir))
    assert "Window" not in plan
    assert "BroadcastExchange" in plan


def test_tpch_topk_avoid_global_sort(spark, sf_dir, qs):
    """Ordered LIMITs (Q3/Q10/Q18) plan as TakeOrderedAndProject —
    per-partition heaps + driver merge, not a global sort."""
    for key in ("tpch_q3", "tpch_q10", "tpch_q18"):
        assert "TakeOrderedAndProject" in plan_of(qs[key](spark, sf_dir)), key


def test_transition_matrix_single_user_shuffle(spark, sf_dir, qs):
    """The lead() window is the only event-sized exchange; the
    probability normalizer windows over the 25-cell matrix, not the
    events table."""
    plan = plan_of(qs["event_transition_matrix"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_sliding_distinct_no_cartesian(spark, sf_dir, qs):
    """The trailing-window range join must stay an equi-join on
    event_type with a residual day-range filter."""
    plan = plan_of(qs["win_count_distinct_sliding"](spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_attribution_one_window_shuffle(spark, sf_dir, qs):
    """Both IGNORE-NULLS windows share one (user_id) sort/partition —
    the plan must contain exactly one Window node and one user_id
    exchange."""
    plan = plan_of(qs["attribution_first_last"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_dynamic_partition_pruning_in_plan(spark, sf_dir, qs):
    """The year-partitioned fact scan must carry a runtime
    dynamicpruning filter derived from the dim join — the partition
    list is not statically known, yet only matching directories are
    read."""
    df = qs["scan_dynamic_partition_pruning"](spark, sf_dir)
    plan = plan_of(df)
    assert "dynamicpruning" in plan.lower()


def test_pack_sequences_single_shuffle(spark, sf_dir, qs):
    """Packing = one exchange (on source) feeding the prefix window —
    no second shuffle, no global sort."""
    plan = plan_of(qs["pack_sequences"](spark, sf_dir))
    assert plan.count("Exchange") == 1
    assert "Exchange SinglePartition" not in plan


def test_mix_sample_predicate_is_map_side(spark, sf_dir, qs):
    """The keep predicate must not shuffle: the only exchange is the
    final per-source report aggregation."""
    plan = plan_of(qs["mix_weighted_sample"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") <= 1


def test_bitmap_distinct_has_no_expand(spark, sf_dir, qs):
    """Bitmap distinct must not fall back to Spark's Expand-based
    distinct rewrite — partials merge as plain aggregations."""
    plan = plan_of(qs["agg_bitmap_distinct"](spark, sf_dir))
    assert "Expand" not in plan
    assert "bitmap_or_agg" in plan.lower() or "bitmap" in plan.lower()


def test_heavy_hitters_uses_arrow_not_row_python(spark, sf_dir, qs):
    plan = plan_of(qs["text_heavy_hitters"](spark, sf_dir))
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_quantize_stays_jvm_side(spark, sf_dir, qs):
    """Element-wise quantization is higher-order-function work — no
    Python evaluator of any kind in the plan."""
    plan = plan_of(qs["embedding_quantize_int8"](spark, sf_dir))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_bloom_prefilter_plan_shape(spark, sf_dir, qs):
    plan = plan_of(qs["join_bloom_prefilter"](spark, sf_dir))
    # the 1-row filter map ships as a broadcast nested-loop (bounded),
    # never a cartesian; the exactness join stays a semi hash join
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "LeftSemi" in plan


def test_analyze_tables_enable_stats_driven_join_reorder(spark, sf_dir):
    """SURVEY §4.2: with catalog statistics, CostBasedJoinReorder picks
    the dimension-first join order at PLAN time instead of leaning on
    AQE. analyze_tables registers external stats_<name> tables (no data
    copy), computes row + column stats, and enables CBO; the syntactic
    order customer JOIN orders JOIN nation must reorder to do the cheap
    customer x nation join first."""
    import re

    from algebraicdb_spark.sources.catalog import analyze_tables

    analyze_tables(spark, sf_dir)
    try:
        # rowCount stats surfaced into plan statistics
        st = spark.table("stats_orders")._jdf.queryExecution().optimizedPlan().stats()
        assert "rowCount" in st.toString(), st.toString()
        q = """
        SELECT n.n_name, COUNT(*) AS n
        FROM stats_customer c
        JOIN stats_orders o ON o.o_custkey = c.c_custkey
        JOIN stats_nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
        plan = spark.sql(q)._jdf.queryExecution().optimizedPlan().toString()
        leaves = re.findall(r"default\.(stats_\w+)", plan)
        assert leaves == ["stats_customer", "stats_nation", "stats_orders"], (
            f"stats-driven reorder did not fire; leaf order: {leaves}"
        )
        # and the reordered query still answers correctly
        got = {r.n_name: r.n for r in spark.sql(q).collect()}
        want = {
            r.n_name: r.n
            for r in spark.sql(q.replace("stats_", "")).collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")


def test_interval_bucketed_is_hash_join_not_bnlj(spark, sf_dir, qs):
    """The keyless interval join's bucketed form must plan as a plain
    equi hash join on the block id — no BNLJ / cartesian anywhere."""
    plan = plan_of(qs["join_interval_bucketed"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_nearest_single_user_exchange(spark, sf_dir, qs):
    """Both direction windows must share ONE user_id exchange — the
    descending pass re-sorts but never re-shuffles."""
    plan = plan_of(qs["join_asof_nearest"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_bigram_logprob_no_python_eval(spark, sf_dir, qs):
    """Bigram construction is array-side HOF work — no Python
    evaluator of any kind in the plan."""
    plan = plan_of(qs["text_bigram_logprob"](spark, sf_dir))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_corr_matrix_single_scan(spark, sf_dir, qs):
    """All 15 moments come from ONE lineitem scan; the pair unpivot is
    a generate over the single aggregated row."""
    plan = plan_of(qs["agg_corr_matrix"](spark, sf_dir))
    assert plan.count("Scan parquet") == 1


def test_triangle_closing_join_is_hash_join(spark, sf_dir, qs):
    """The wedge-closing existence check must plan as an equi hash/SMJ
    join on (u, v) — a cartesian or BNLJ there is the O(m²) failure."""
    plan = plan_of(qs["graph_triangle_count"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan


def test_pmi_margins_broadcast(spark, sf_dir, qs):
    """PMI margins and the context count are broadcast-size — the pair
    aggregate must never shuffle against them."""
    plan = plan_of(qs["event_cooccurrence_pmi"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_count_min_grid_is_aggregate_not_window(spark, sf_dir, qs):
    """The CMS cell grid must build via hash aggregate (map-side
    combinable, d*w-bounded shuffle), and the probe side joins against
    a broadcast of the tiny grid."""
    plan = plan_of(qs["text_count_min"](spark, sf_dir))
    assert "HashAggregate" in plan
    assert "BroadcastHashJoin" in plan


def test_streaks_single_user_shuffle(spark, sf_dir, qs):
    """Distinct days, the row_number, and both rollups share the
    user_id partitioning: exactly one exchange on the events side."""
    plan = plan_of(qs["event_active_streaks"](spark, sf_dir))
    import re

    exchanges = [l for l in plan.splitlines() if re.search(r"\bExchange\b", l)]
    real = [l for l in exchanges if "SinglePartition" not in l]
    assert len(real) <= 2, f"expected <=2 partitioned exchanges, got:\n" + "\n".join(real)


def test_quantile_bins_window_over_aggregated_grain(spark, sf_dir, qs):
    """The cumulative window must consume the price-grain AGGREGATE,
    not raw order rows (the raw-grain global ntile is a lint error)."""
    df = qs["feature_quantile_bins"](spark, sf_dir)
    opt = optimized_of(df)
    w_idx = opt.index("Window")
    agg_after_window = "Aggregate" in opt[w_idx:]
    assert agg_after_window, "window should sit above the price-grain aggregate"
    from algebraicdb_spark.plans.scalelint import lint

    assert not [c for sev, c, _ in lint(df) if sev == "error"]


def test_tfidf_dots_shuffle_partials_not_vectors(spark, sf_dir, qs):
    """The inverted-index retrieval must broadcast the fixed query
    side; no cartesian anywhere."""
    plan = plan_of(qs["sim_tfidf_cosine"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_scd2_single_user_exchange(spark, sf_dir, qs):
    """Both SCD2 windows (change detector, version numbering) must
    share ONE user_id exchange — per-key history is sequential, but
    the partitioning is established once."""
    import re

    plan = plan_of(qs["scd2_history"](spark, sf_dir))
    real = [
        l
        for l in plan.splitlines()
        if re.search(r"\bExchange\b", l) and "SinglePartition" not in l
    ]
    assert len(real) == 1, "expected exactly 1 exchange:\n" + "\n".join(real)


def test_cdc_apply_single_exchange_no_join(spark, sf_dir, qs):
    """Last-writer-wins fold: one user_id exchange serving the rn
    window and both per-key counters; no self-join materializes."""
    import re

    plan = plan_of(qs["cdc_apply_log"](spark, sf_dir))
    assert "Join" not in plan
    real = [
        l
        for l in plan.splitlines()
        if re.search(r"\bExchange\b", l) and "SinglePartition" not in l
    ]
    assert len(real) == 1, "expected exactly 1 exchange:\n" + "\n".join(real)


def test_reservoir_sample_is_take_ordered(spark, sf_dir, qs):
    """The hash sample must compile to TakeOrderedAndProject (bounded
    per-partition heap — the reservoir pattern), never a global Sort."""
    plan = plan_of(qs["sample_reservoir"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_feature_hashing_single_aggregate_no_shuffle_of_tokens(
    spark, sf_dir, qs
):
    """Hashing trick = map-side expression + ONE (doc,bucket) hash
    aggregate; no join, no window, no vocabulary broadcast."""
    plan = plan_of(qs["ml_feature_hashing"](spark, sf_dir))
    assert "Join" not in plan and "Window" not in plan
    assert "BatchEvalPython" not in plan  # all codegen'd built-ins
