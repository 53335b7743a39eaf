"""Central query/oracle registry backing ``__spark_entry__``.

Every operator from SURVEY.md §2 registers here with

    @register("key", oracle="<ANSI SQL DuckDB runs on the same views>")
    def key(spark, sf_dir) -> DataFrame: ...

Keys with no SQL-expressible oracle (sketches, LSH, streaming-only)
pass ``oracle=None`` and get the driver's weaker rows-only check;
their quality is asserted by pytest instead (recall vs brute force,
batch/stream equivalence).

Determinism contract (SURVEY §5.3) every registered query obeys:
  1. double-typed aggregates rounded to 4 dp on BOTH sides,
  2. collected lists sorted,
  3. top-k totally ordered via a unique tie-break,
  4. identical output column names on both sides,
  5. timestamps exposed as epoch-seconds BIGINT or formatted strings.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_QUERY_MODULES = (
    "algebraicdb_spark.operators.scans",
    "algebraicdb_spark.operators.filters",
    "algebraicdb_spark.operators.joins",
    "algebraicdb_spark.operators.aggregates",
    "algebraicdb_spark.operators.windows",
    "algebraicdb_spark.operators.sorts_setops",
    "algebraicdb_spark.operators.subqueries",
    "algebraicdb_spark.operators.skew",
    "algebraicdb_spark.functions.scalars",
    "algebraicdb_spark.functions.adt_queries",
    "algebraicdb_spark.streaming.batch_equiv",
    "algebraicdb_spark.operators.dedup",
    "algebraicdb_spark.operators.similarity",
    "algebraicdb_spark.operators.text",
    "algebraicdb_spark.operators.multimodal",
    "algebraicdb_spark.functions.udfs",
    "algebraicdb_spark.operators.pipeline",
    "algebraicdb_spark.operators.sampling",
    "algebraicdb_spark.operators.corpus",
    "algebraicdb_spark.operators.mixing",
    "algebraicdb_spark.operators.analytics",
    "algebraicdb_spark.operators.tpch",
)


def register(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco


# Exposure order for the driver's correctness gate. The driver checks
# the first 50 keys in dict order each round: round 1 covered the
# relational head, round 2 the ADT/streaming/dedup/text/UDF backlog,
# round 3 the scalar/set-op/subquery/TPC-H block (all 50 green in
# CORRECTNESS_r03.json). Round 4 leads with the 39 keys no round has
# checked yet (r3-overflow + post-r3 additions), then the 3 keys whose
# oracles were upgraded after their last driver row (rows-only →
# value-hash), then 8 load-bearing green keys as regression re-checks.
# Keys missing from this list fall back to registration order after it.
_CHECK_PRIORITY = (
    # --- never driver-checked (39): r3 overflow + round-4 additions ---
    "source_orc",
    "agg_hll_partial_union",
    "tpch_q2",
    "tpch_q11",
    "tpch_q20",
    "tpch_q21",
    "text_unigram_logprob",
    "sim_range_search",
    "multimodal_frame_sample",
    "multimodal_resize_stub",
    "join_asof_tolerance",
    "win_moving_median",
    "scan_dynamic_partition_pruning",
    "set_intersect_all",
    "adt_dialect_nested",
    "source_schema_evolution",
    "event_anomaly_zscore",
    "event_path_topk",
    "time_bucket_custom",
    "corpus_mix_report",
    "pack_sequences",
    "mix_weighted_sample",
    "embedding_quantize_int8",
    "select_token_budget",
    "event_pagerank",
    "text_heavy_hitters",
    "stream_hopping_topk",
    "agg_bitmap_distinct",
    "agg_weighted_percentile",
    "pipeline_training_mix",
    "event_session_stats",
    "scan_file_lineage",
    "join_bloom_prefilter",
    "agg_linear_regression",
    "sim_knn_pq",
    "split_hash_assign",
    "agg_entropy_diversity",
    "interval_merge_coverage",
    "time_weighted_avg",
    "alter_table_evolution",
    "mix_temperature_sampling",
    "dedup_minhash_components",
    "text_dup_segments",
    # --- oracles upgraded after their r02 rows-only driver rows ---
    "dedup_minhash_lsh",
    "dedup_simhash",
    "agg_approx_distinct",
    "sim_knn_lsh",
    "sim_knn_ivf",
    # --- load-bearing green keys: headline-plan regression re-checks ---
    "agg_groupby_hash",
    "join_multiway_star",
    "stream_session_window",
    "sim_knn_cosine",
    "text_tokenize_tf",
    "dedup_exact",
    "tpch_q3",
    "win_row_number_topn",
)


def load_all() -> None:
    """Import every operator module so its @register calls run."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _CHECK_PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, QueryFn]:
    load_all()
    return _ordered(QUERIES)


def oracles() -> dict[str, str]:
    load_all()
    return _ordered(ORACLES)
