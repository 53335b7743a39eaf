"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "headline_total_sec", "value": <sum of medians>,
   "unit": "sec", "queries": {key: median_sec, ...}, "sf": <sf>}

Method mirrors BASELINE.md: one untimed warmup run (plan/codegen/read
warm — BASELINE's "warm runs"), then median of 3 timed runs, one
shared SparkSession. The artifact also carries the quiet-host
evidence the round-9/10 drift analysis had to reconstruct by hand:
"samples" = three full headline totals (the i-th timed run of every
headline query summed — the band a reviewer compares across rounds)
and "load" = the host's 1-minute loadavg at start/end, so a
noisy-host run is identifiable from the artifact alone. Materialization is a noop-sink write: every
column of every result row is computed (no pruning shortcut), but
nothing funnels through the Python driver — the engine-throughput
number that actually extrapolates to cluster scale (collect()-ing
10^5 rows measures Py4J, not the engine). shuffle.partitions=4 at this scale — 100k-600k-row
shuffles are task-overhead-bound locally; on a cluster AQE re-targets
partition counts from advisory sizes, so this knob is bench-only.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 3


def materialize(df) -> None:
    """Fully compute a result without driver-side row transfer."""
    df.write.format("noop").mode("overwrite").save()


HEADLINE = [
    "agg_groupby_hash",
    "join_multiway_star",
    "win_row_number_topn",
    "stream_tumbling_agg",
    "sim_knn_cosine",
    "text_tokenize_tf",
    "agg_cube",
    "stream_session_window",
]

# Slowest non-headline keys: timed (1 warmup + 1 run) and reported in
# a separate "extra_queries" field so regressions in the wider surface
# show up in the per-round artifact. NOT part of "value" — the
# headline total stays comparable against BASELINE.md's query set.
EXTRAS = [
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
    from algebraicdb_spark.plans import registry
    from algebraicdb_spark.session import get_spark
    from algebraicdb_spark.sources.catalog import load_tables

    # Scale-adaptive reduce width (round 14, guide §2): partitions =
    # the session's core count instead of the old constant 4. The
    # constant was tuned for task overhead when every stage was
    # overhead-bound; it also capped every post-shuffle stage (wedge
    # joins, Jaccard reranks, window sorts) at 4 of 32 cores. Deriving
    # it from defaultParallelism keeps the driver's lower-core runs
    # proportionally sized (SPARK_GRAFT_CPUS drives the master), and on
    # a cluster AQE re-targets from advisory sizes as before. Measured
    # at sf0.1/local[32]: graph_triangle_count 1.5->1.0 s, minhash
    # pairs 2.3->1.8 s, text_ngram_novelty 1.7->1.3 s, headline flat.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("algebraicdb-bench", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # Silence DAGScheduler's "Failed to update accumulator NNN /
    # attempted to access non-existent accumulator" stack traces in
    # the bench tail. Root cause (diagnosed round 9, rc was 0 and the
    # JSON complete throughout): the bench rebuilds each query's
    # DataFrame per timed run, so a finished run's lazily-materialized
    # localCheckpoint RDDs and their task-metric accumulators are
    # GC-unregistered on the driver while a straggler task from that
    # run's last job is still reporting — its accumulator update then
    # logs this benign ERROR. Scoped to this one logger inside the
    # bench process only (the engine never changes log levels); real
    # job failures still surface as Python exceptions -> rc != 0.
    jvm = spark.sparkContext._jvm
    (jvm.org.apache.logging.log4j.core.config.Configurator
        .setLevel("org.apache.spark.scheduler.DAGScheduler",
                  jvm.org.apache.logging.log4j.Level.FATAL))
    load_tables(spark, SF_DIR)
    qs = registry.queries()

    load_start = round(os.getloadavg()[0], 2)
    timings: dict[str, float] = {}
    run_matrix: dict[str, list[float]] = {}
    for key in HEADLINE:
        materialize(qs[key](spark, SF_DIR))  # warmup (untimed)
        runs = []
        for _ in range(RUNS):
            t0 = time.time()
            materialize(qs[key](spark, SF_DIR))
            runs.append(time.time() - t0)
        run_matrix[key] = runs
        timings[key] = round(statistics.median(runs), 4)

    extras: dict[str, float] = {}
    for key in EXTRAS:
        materialize(qs[key](spark, SF_DIR))  # warmup (untimed)
        # min of 2 timed runs: a single timed run is exposed to GC /
        # host-contention hiccups (observed 8x outliers on a warmed
        # query); the min of two is the steady-state throughput
        runs = []
        for _ in range(2):
            t0 = time.time()
            materialize(qs[key](spark, SF_DIR))
            runs.append(time.time() - t0)
        extras[key] = round(min(runs), 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    samples = [
        round(sum(run_matrix[k][i] for k in HEADLINE), 4)
        for i in range(RUNS)
    ]
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "extra_queries": extras,
                "samples": samples,
                "load": {"start": load_start,
                         "end": round(os.getloadavg()[0], 2)},
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
