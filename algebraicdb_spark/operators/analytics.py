"""Event-analytics operators beyond SURVEY §2.12: cohort retention
and time-series OHLC resampling.

Both are classic warehouse workloads the reference's event queries
imply but §2 didn't enumerate: retention is the canonical
first-touch-attribution shape (per-entity min over a window, then a
two-key rollup), OHLC is ordered downsampling (first/last within a
bucket under a total order). Deterministic built-in-function plans
with full SQL twins — value-hash-checked like every relational key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from algebraicdb_spark.functions.rounding import exact_money_sum
from algebraicdb_spark.plans.registry import register
from algebraicdb_spark.sources.catalog import load_tables


@register(
    "retention_cohort",
    oracle="""
    WITH f AS (
      SELECT user_id,
             CAST(date_trunc('week', min(ts) OVER (PARTITION BY user_id)) AS DATE)
               AS cohort_week,
             CAST(date_trunc('week', ts) AS DATE) AS act_week
      FROM events
    )
    SELECT cohort_week,
           CAST(floor(date_diff('day', cohort_week, act_week) / 7.0) AS INTEGER)
             AS week_offset,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM f
    GROUP BY 1, 2
    """,
)
def retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-activity week,
    counted in each subsequent week they stay active.

    Scale shape: one shuffle on user_id for the first-touch window
    (the same partitioning any per-user feature pipeline already
    pays), then a (cohort, offset) rollup whose cardinality is
    weeks² — trivial at any corpus size. No self-join: the window
    min replaces the classic events⋈first_seen join.
    """
    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id")
    f = e.select(
        "user_id",
        F.date_trunc("week", F.min("ts").over(w)).cast("date").alias("cohort_week"),
        F.date_trunc("week", "ts").cast("date").alias("act_week"),
    )
    offset = F.floor(
        F.datediff(F.col("act_week"), F.col("cohort_week")) / 7.0
    ).cast("int")
    return f.groupBy("cohort_week", offset.alias("week_offset")).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "time_resample_ohlc",
    # row_number under (ts_ns, event_id) — a total order both engines
    # share exactly (nanosecond ticks, unique ids), so open/close are
    # well-defined even with intra-hour timestamp ties
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
             value,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY epoch_ns(ts), event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, hour_epoch,
           COUNT(*) AS n_events,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open_v,
           MAX(value) AS high_v,
           MIN(value) AS low_v,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close_v,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume
    FROM b GROUP BY 1, 2
    """,
)
def time_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type: open/high/low/close of `value`
    under the (ts_ns, event_id) total order, plus exact-decimal volume.

    Scale shape: one shuffle on (event_type, hour) serves both
    row_number windows AND the final aggregate (same keys — the sort
    for the second window is a re-sort, not a re-shuffle). Raw values
    pass through untouched (no float arithmetic ⇒ no rounding
    needed); volume sums on the 2-decimal grid so partitioning never
    shifts the total.
    """
    e = load_tables(spark, sf_dir)["events"]
    hour = F.date_trunc("hour", "ts")
    b = e.select(
        "event_type", hour.alias("h"), "value", "ts_ns", "event_id"
    )
    wa = Window.partitionBy("event_type", "h").orderBy("ts_ns", "event_id")
    wd = Window.partitionBy("event_type", "h").orderBy(
        F.col("ts_ns").desc(), F.col("event_id").desc()
    )
    b = b.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    return (
        b.groupBy(
            "event_type", F.unix_timestamp("h").alias("hour_epoch")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close_v"),
            exact_money_sum(F.col("value"), 2).alias("volume"),
        )
    )
