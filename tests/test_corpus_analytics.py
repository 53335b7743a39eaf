"""Semantic invariants + plan shapes for the round-2 corpus-hygiene
and event-analytics operators (their value correctness is oracle-gated
in tools/verify_local.py; these pin the properties an oracle can't)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    from algebraicdb_spark.sources.catalog import load_tables

    return load_tables(spark, sf_dir)


def test_contamination_excludes_benchmark_and_bounds(spark, sf_dir, tables):
    from algebraicdb_spark.operators.corpus import BENCH_SOURCE, contamination_ngram

    out = contamination_ngram(spark, sf_dir)
    bench_ids = {
        r["doc_id"]
        for r in tables["documents"]
        .filter(F.col("source") == BENCH_SOURCE)
        .select("doc_id")
        .collect()
    }
    rows = out.collect()
    assert rows, "contamination output empty"
    for r in rows:
        assert r["doc_id"] not in bench_ids
        assert 0 <= r["n_hit"] <= r["n_grams"]
        assert 0.0 <= r["contam_ratio"] <= 1.0


def test_contamination_broadcasts_benchmark_side(spark, sf_dir):
    from algebraicdb_spark.operators.corpus import contamination_ngram

    plan = (
        contamination_ngram(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_repetition_ratios_bounded(spark, sf_dir):
    from algebraicdb_spark.operators.corpus import text_repetition

    for r in text_repetition(spark, sf_dir).collect():
        assert 0.0 <= r["dup_bigram_ratio"] <= 1.0
        assert 0.0 <= r["dup_trigram_ratio"] <= 1.0
        # trigrams repeat no more often than bigrams (a repeated trigram
        # contains repeated bigrams; small slack for edge-of-doc effects)
        assert r["dup_trigram_ratio"] <= r["dup_bigram_ratio"] + 0.1


def test_repetition_zero_bigram_doc_matches_oracle(spark):
    """A <2-token doc has zero bigrams: Spark's 0/0 would be NULL but
    DuckDB's is NaN, so both sides must short-circuit to NULL via the
    size()>0 guard. Latent at sf0.01 (no degenerate doc in the
    fixture) — pinned here on synthetic docs, both engines compared."""
    import math

    import duckdb

    from algebraicdb_spark.operators.corpus import repetition_scores
    from algebraicdb_spark.plans import registry

    docs = [(0, "solo"), (6, ""), (12, "a b a b a b"), (18, "x y")]
    sdf = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.dup_bigram_ratio, r.dup_trigram_ratio, r.repetitive)
        for r in repetition_scores(sdf).collect()
    }
    # degenerate docs: NULL ratios (never NaN), not repetitive
    assert got[0] == (0, None, None, 0)
    assert got[6] == (0, None, None, 0)
    assert got[12][1] > 0.5 and got[12][3] == 1
    assert got[18] == (1, 0.0, None, 0)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in docs)
        + ") t(doc_id, text)"
    )
    oracle = {
        row[0]: tuple(row[1:])
        for row in con.execute(registry.oracles()["text_repetition"]).fetchall()
    }
    for doc_id, vals in got.items():
        o = oracle[doc_id]
        assert not any(isinstance(v, float) and math.isnan(v) for v in o), o
        assert vals == o, f"doc {doc_id}: spark={vals} oracle={o}"


def test_chunk_dedup_flags_exact_duplicates(spark, sf_dir, tables):
    from algebraicdb_spark.operators.corpus import dedup_chunk
    from algebraicdb_spark.operators.dedup import canonical_text

    out = {r["doc_id"]: r for r in dedup_chunk(spark, sf_dir).collect()}
    assert len(out) == tables["documents"].count()
    # any doc with an exact-duplicate twin shares every chunk -> ratio 1
    dup_ids = [
        r["doc_id"]
        for r in tables["documents"]
        .withColumn("c", canonical_text(F.col("text")))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("c")))
        .filter(F.col("n") > 1)
        .select("doc_id")
        .collect()
    ]
    for did in dup_ids:
        assert out[did]["shared_ratio"] == 1.0
        assert out[did]["boilerplate_heavy"] == 1
    for r in out.values():
        assert 0 <= r["n_shared"] <= r["n_chunks"]


def test_retention_cohort_invariants(spark, sf_dir, tables):
    from algebraicdb_spark.operators.analytics import retention_cohort

    rows = retention_cohort(spark, sf_dir).collect()
    assert sum(r["n_events"] for r in rows) == tables["events"].count()
    by_cohort = {}
    for r in rows:
        assert r["week_offset"] >= 0
        by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = r["n_users"]
    # offset 0 always exists (first touch is inside the cohort week) and
    # is each cohort's high-water mark
    for offsets in by_cohort.values():
        assert 0 in offsets
        assert offsets[0] == max(offsets.values())


def test_ohlc_invariants(spark, sf_dir, tables):
    from algebraicdb_spark.operators.analytics import time_resample_ohlc

    rows = time_resample_ohlc(spark, sf_dir).collect()
    assert sum(r["n_events"] for r in rows) == tables["events"].count()
    for r in rows:
        assert r["low_v"] <= min(r["open_v"], r["close_v"])
        assert r["high_v"] >= max(r["open_v"], r["close_v"])
        assert r["volume"] >= r["low_v"] * r["n_events"] - 1e-6
        if r["n_events"] == 1:
            assert r["open_v"] == r["close_v"] == r["high_v"] == r["low_v"]


def test_approx_percentile_property_holds(spark, sf_dir):
    from algebraicdb_spark.operators.aggregates import agg_approx_percentile

    rows = agg_approx_percentile(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["p50_ok"] and r["p95_ok"]
        assert r["p50_exact"] <= r["p95_exact"]


def test_heavy_hitters_mg_bounds(spark, sf_dir, tables):
    from pyspark.sql import functions as F

    from algebraicdb_spark.operators.corpus import (
        MG_CAPACITY,
        text_heavy_hitters,
    )

    got = text_heavy_hitters(spark, sf_dir).collect()
    assert len(got) == 10
    # the in-plan guarantee booleans the oracle pins to TRUE
    assert all(r.mg_ok for r in got)
    # independent re-derivation of the bounds over the full sketch
    # output (not just the exact top-10 the key returns): every merged
    # estimate obeys est <= true and est >= true - N/capacity
    true = {
        r.token: r.n
        for r in tables["documents"]
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_total = sum(true.values())
    slack = n_total / MG_CAPACITY
    exact_top = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [r.token for r in got] == [t for t, _ in exact_top]
    assert [r.true_count for r in got] == [c for _, c in exact_top]
    assert [r.rnk for r in got] == list(range(1, 11))
    # the fixture's top tokens are far above the survival threshold,
    # so mg_ok=True here exercises the est-bounds branch (token found
    # in the merged sketch), not the vacuous absent-token branch
    assert all(true[r.token] > slack for r in got)
    # deterministic stream order -> identical sketch run to run
    again = text_heavy_hitters(spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]
