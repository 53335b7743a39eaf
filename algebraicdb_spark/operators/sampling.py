"""Sampling operators — a training-data pipeline's third leg next to
dedup and quality gates (down-sample over-represented sources,
hold-out splits, debug slices).

Sampling is engine-specific by nature (Spark's Bernoulli sampler and
DuckDB's will never agree row-for-row), so these keys are rows-only
for the driver gate; *determinism under a fixed seed* — the property
that actually matters for reproducible pipelines — is asserted in
tests/test_sampling.py (same seed → identical sample, twice).

Scale: ``sample``/``sampleBy`` are narrow map-stage operators (no
shuffle); stratified fractions are applied per-partition with the
seed + partition id, so the plan is identical at any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from algebraicdb_spark.plans.registry import register
from algebraicdb_spark.sources.catalog import load_tables

SEED = 41

# down-sample the over-represented event types, keep the rare ones
STRATA_FRACTIONS = {
    "click": 0.1,
    "view": 0.1,
    "purchase": 1.0,
    "signup": 1.0,
    "error": 1.0,
}


def stratified_sample(events: DataFrame, fractions=None, seed: int = SEED) -> DataFrame:
    """Per-stratum Bernoulli sampling (seeded, reproducible)."""
    return events.sampleBy("event_type", fractions or STRATA_FRACTIONS, seed=seed)


@register(
    "sample_stratified",
    # property oracle: which rows a Bernoulli sampler keeps is
    # engine-specific, but the stratum key set, each stratum's exact
    # total, and the sampling-rate property are not: fraction-1.0
    # strata must be kept whole, down-sampled strata must land within
    # ±0.05 of their fraction (≫5σ at every fixture SF, fixed seed)
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_stratum,
           true AS sample_ok
    FROM events
    GROUP BY event_type
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded stratified sample of events, checked as a property:
    per-stratum exact totals plus an in-plan assertion that the
    sampler honored each stratum's fraction (exactly for f=1.0,
    within ±0.05 for down-sampled strata)."""
    e = load_tables(spark, sf_dir)["events"]
    sampled = (
        stratified_sample(e)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    totals = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_stratum"))
    frac = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in STRATA_FRACTIONS.items() for x in kv]
        ),
        F.col("event_type"),
    )
    n_sampled = F.coalesce(F.col("n_sampled"), F.lit(0))
    ok = F.when(frac >= 1.0, n_sampled == F.col("n_stratum")).otherwise(
        F.abs(n_sampled / F.col("n_stratum") - frac) <= 0.05
    )
    return totals.join(sampled, "event_type", "left").select(
        "event_type", "n_stratum", ok.alias("sample_ok")
    )


SPLIT_BUCKETS = 1000
SPLIT_TRAIN_LT = 800  # buckets [0,800) -> train
SPLIT_VAL_LT = 900    # [800,900) -> val, [900,1000) -> test


@register(
    "split_hash_assign",
    oracle=f"""
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM (
      SELECT doc_id, n_chars,
             CASE WHEN b < {SPLIT_TRAIN_LT} THEN 'train'
                  WHEN b < {SPLIT_VAL_LT} THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT doc_id, n_chars,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % {SPLIT_BUCKETS} AS b
        FROM documents) t) s
    GROUP BY split
    ORDER BY split
    """,
)
def split_hash_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test hold-out split: bucket every doc by
    the first 8 hex chars of md5(doc_id) into 1000 bins, cut at
    800/900. The assignment is a pure per-row function of the key —
    engine-independent (md5 is bit-identical everywhere), stable
    under re-runs, insert-order, and cluster size, and a new document
    never reshuffles existing assignments (the property that makes
    hash splits the standard over random splits for training data).

    Scale: one narrow map stage + one 3-group aggregate — no row is
    shuffled except the 3 partial-agg rows per partition. The output
    checksums (count/sum/min/max per split) verify the complete
    assignment without materializing it.
    """
    d = load_tables(spark, sf_dir)["documents"]
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % SPLIT_BUCKETS
    )
    split = (
        F.when(bucket < SPLIT_TRAIN_LT, F.lit("train"))
        .when(bucket < SPLIT_VAL_LT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select(split.alias("split"), "doc_id", "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("sum_doc_id"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("split")
    )


@register(
    "feature_quantile_bins",
    # ntile is deterministic under a TOTAL order (both engines use the
    # SQL-standard rule: floor(n/k)-sized buckets, remainder spread to
    # the leading buckets), so equal-frequency bin edges hash-match.
    oracle="""
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS mass
    FROM (
      SELECT o_orderkey, o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
      FROM orders
    ) GROUP BY bin
    """,
)
def feature_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (decile) binning of order totals — the
    discretization step of a feature pipeline (quantile bucketizer),
    emitting per-bin row count, value range, and exact-decimal mass.

    Scale shape: ntile needs a global sort of the measure; at 100 TB
    the production swap is approx_percentile edges + a broadcast range
    join (same output grain, sketch-bounded), which agg_approx_percentile
    demonstrates. Here the exact global ntile IS the point: its bin
    populations are the ground truth the sketch is judged against.
    """
    from pyspark.sql.window import Window

    from algebraicdb_spark.functions.rounding import exact_money_sum

    o = load_tables(spark, sf_dir)["orders"]
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_orderkey", "o_totalprice")
        .withColumn("bin", F.ntile(10).over(w))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            exact_money_sum(F.col("o_totalprice")).alias("mass"),
        )
    )
