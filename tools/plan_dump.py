"""Dump .explain("formatted") for tracked queries to plans/<tag>/.

Usage:
    python tools/plan_dump.py <tag> [key ...]   # default: bench-tracked set

Writes plans/<tag>/<key>_<suffix>.txt where suffix comes from
$PLAN_SUFFIX (default "before"). The physical plan is captured from
the DataFrame the registry returns — the same object the bench
materializes — so Exchange counts / join strategies / PushedFilters in
these files are exactly what the bench runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TRACKED = [
    # headline
    "agg_groupby_hash",
    "join_multiway_star",
    "win_row_number_topn",
    "stream_tumbling_agg",
    "sim_knn_cosine",
    "text_tokenize_tf",
    "agg_cube",
    "stream_session_window",
    # extras
    "event_pagerank",
    "corpus_mix_report",
    "tpch_q21",
    "dedup_minhash_lsh",
    "graph_triangle_count",
    "sim_tfidf_cosine",
    "ml_train_logreg",
    "graph_kcore",
    "sim_mmr_diversify",
    "text_ngram_novelty",
    "dialect_recursive_components",
    "dialect_iterate_kcore",
    "pipeline_dedup_funnel",
    "sim_dedup_threshold_sweep",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    keys = sys.argv[2:] or TRACKED
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    from algebraicdb_spark.plans import registry
    from algebraicdb_spark.session import get_spark
    from algebraicdb_spark.sources.catalog import load_tables

    spark = get_spark("algebraicdb-plan-dump", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, SF_DIR)
    qs = registry.queries()

    for key in keys:
        df = qs[key](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{key}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
