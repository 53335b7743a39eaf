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
    # Value-grain equal-frequency bins: all rows of one price share a
    # bin (bin = prior-count*10 DIV n) — pure integer arithmetic, and
    # the cumulative window runs on the AGGREGATED price grain, never
    # the row grain. Ties-stay-together is the defensible semantics
    # for a bucketizer anyway: bin membership is a function of the
    # VALUE, so the fitted edges broadcast as a range lookup.
    oracle="""
    WITH pg AS (
      SELECT o_totalprice AS price, COUNT(*) AS cnt,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS mass
      FROM orders GROUP BY o_totalprice
    ),
    cum AS (
      SELECT price, cnt, mass,
             COALESCE(SUM(cnt) OVER (ORDER BY price
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c_before,
             SUM(cnt) OVER () AS n
      FROM pg
    )
    SELECT CAST((c_before * 10) // n + 1 AS BIGINT) AS bin,
           CAST(SUM(cnt) AS BIGINT) AS n_orders,
           MIN(price) AS lo,
           MAX(price) AS hi,
           CAST(CAST(SUM(CAST(mass AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE)
             AS mass
    FROM cum GROUP BY 1
    """,
)
def feature_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (decile) binning of order totals — the
    discretization step of a feature pipeline (quantile bucketizer),
    emitting per-bin row count, value range, and exact-decimal mass.
    Rows with equal value always share a bin (prior-count DIV rule),
    so bin membership is a pure function of the value.

    Scale shape: one hash aggregate to the price grain, then the
    cumulative window runs over DISTINCT prices (the aggregated
    grain), not rows — for real measures with heavy ties that is
    orders of magnitude smaller; a raw-grain global ntile is the #1
    scale-lint error and this plan avoids it. At 100 TB the swap is
    approx_percentile edges + a broadcast range join, which
    agg_approx_percentile demonstrates; this exact tier grounds it.
    """
    from pyspark.sql.window import Window

    from algebraicdb_spark.functions.rounding import exact_money_sum

    o = load_tables(spark, sf_dir)["orders"]
    pg = o.groupBy(F.col("o_totalprice").alias("price")).agg(
        F.count(F.lit(1)).alias("cnt"),
        exact_money_sum(F.col("o_totalprice")).alias("mass"),
    )
    wc = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
    cum = pg.select(
        "price",
        "cnt",
        "mass",
        F.coalesce(F.sum("cnt").over(wc), F.lit(0)).alias("c_before"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    return (
        cum.withColumn("bin", F.expr("(c_before * 10) DIV n + 1"))
        .groupBy("bin")
        .agg(
            F.sum("cnt").cast("long").alias("n_orders"),
            F.min("price").alias("lo"),
            F.max("price").alias("hi"),
            F.sum(F.col("mass").cast("decimal(18,4)"))
            .cast("decimal(18,4)")
            .cast("double")
            .alias("mass"),
        )
    )
