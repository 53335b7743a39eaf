"""§2.9 stream operators — batch-equivalent (hash-checkable) forms.

Structured Streaming's windowed operators are incremental versions of
these exact batch plans; registering the batch form gives the driver a
value-hash oracle, while tests/test_streaming.py proves the
``readStream`` variants (same transformations via the
streaming/engine.py builders) produce identical results micro-batched.

Scale notes:
  - Tumbling/sliding windows are groupBy shuffles on (window, key);
    sliding emits size/slide copies per row (4× here) — bounded fan-out.
  - Session windows shuffle once on the session key; Spark's
    ``session_window`` merges in the agg operator (no self-join).
  - The stream-stream join's batch twin is a user-key equi-join with a
    residual time-range predicate — hash join, not BNLJ; watermarks
    bound the streaming state to the same 1 h window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from algebraicdb_spark.functions.rounding import pround
from algebraicdb_spark.plans.registry import register
from algebraicdb_spark.sources.catalog import load_tables


@register(
    "stream_tumbling_agg",
    oracle="""
    SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS window_start_s,
           event_type,
           COUNT(*) AS n_events,
           floor(CAST(SUM(value) AS DOUBLE) * 10000 + 0.5) / 10000 AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows × event_type (streaming twin adds a
    watermark; boundaries are identical — verified F.window start ==
    DuckDB time_bucket)."""
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pround(F.sum("value")).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_sliding_agg",
    oracle="""
    WITH offsets AS (SELECT unnest([0, 1, 2, 3]) AS k)
    SELECT CAST(epoch(time_bucket(INTERVAL 15 MINUTES, ts) - k * INTERVAL 15 MINUTES)
             AS BIGINT) AS window_start_s,
           COUNT(*) AS n_events,
           floor(CAST(SUM(value) AS DOUBLE) * 10000 + 0.5) / 10000 AS sum_value
    FROM events CROSS JOIN offsets
    GROUP BY 1
    """,
)
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 min (each event lands in 4)."""
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pround(F.sum("value")).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTES
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), islands AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           epoch_us(MIN(ts)) AS session_start_us,
           COUNT(*) AS n_events,
           floor(CAST(SUM(value) AS DOUBLE) * 10000 + 0.5) / 10000 AS sum_value
    FROM islands
    GROUP BY user_id, session_id
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with a 30-min inactivity gap, batch tier.

    Formulated as gaps-and-islands (lag → new-session flag → running
    sum → session agg) rather than batch ``F.session_window``: both
    are hash-checked against the same oracle, and the islands plan is
    ~20% faster at sf0.1 (ONE exchange on user_id whose sort is shared
    by both window functions, then a partitioning-reusing hash agg —
    batch session_window instead plans its own session-merge pass).
    A new session starts when the gap is >= 30 min, matching Spark's
    half-open [start, last+gap) session extent; the gap compares
    unix_micros (a seconds-granularity cast would misplace sub-second
    boundaries). The STREAMING tier keeps native ``F.session_window``
    (streaming/engine.py session_agg — merging sessions across
    micro-batches needs the stateful operator), and
    test_streaming.py::test_stream_session_matches_batch pins the two
    formulations equal."""
    e = load_tables(spark, sf_dir)["events"]
    gap_us = 30 * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts")
    prev_us = F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "value",
        F.when(
            prev_us.isNull() | (F.unix_micros(F.col("ts")) - prev_us >= gap_us), 1
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("start_ts"),
            F.count(F.lit(1)).alias("n_events"),
            pround(F.sum("value")).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("start_ts")).alias("session_start_us"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_dedup_watermark",
    oracle="""
    SELECT DISTINCT user_id, event_type,
           CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS hour_s
    FROM events
    """,
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup on (user, type, hour) — the batch twin of streaming
    ``withWatermark(...).dropDuplicates(...)`` (state bounded by the
    1 h watermark; see tests for the readStream variant)."""
    e = load_tables(spark, sf_dir)["events"]
    return e.select(
        "user_id",
        "event_type",
        F.unix_timestamp(F.window("ts", "1 hour").getField("start")).alias("hour_s"),
    ).distinct()


@register(
    "stream_late_data",
    oracle="""
    WITH h AS (SELECT MAX(epoch_ns(ts)) - 3600000000000 AS wm FROM events)
    SELECT CAST(SUM(CASE WHEN epoch_ns(ts) <  wm THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(SUM(CASE WHEN epoch_ns(ts) >= wm THEN 1 ELSE 0 END) AS BIGINT) AS n_on_time
    FROM events, h
    """,
)
def stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analog of late-row accounting: rows older than
    (max ts − 1 h) would be dropped by a 1 h watermark at end-of-stream.
    The batch analog is fully deterministic (nanosecond arithmetic on
    both engines), so it is hash-checked; the true streaming drop is
    asserted in tests/test_streaming.py."""
    e = load_tables(spark, sf_dir)["events"]
    horizon = e.agg(
        (F.max("ts_ns") - F.lit(3600 * 1_000_000_000)).alias("wm")
    )
    return e.crossJoin(F.broadcast(horizon)).agg(
        F.sum(F.when(F.col("ts_ns") < F.col("wm"), 1).otherwise(0)).alias("n_late"),
        F.sum(F.when(F.col("ts_ns") >= F.col("wm"), 1).otherwise(0)).alias("n_on_time"),
    )


@register(
    "stream_stateful_custom",
    oracle="""
    SELECT event_id, user_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS user_seq,
           floor(CAST(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) * 10000 + 0.5) / 10000 AS running_value
    FROM events
    WHERE user_id % 10 = 0
    """,
)
def stream_stateful_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user counter + value accumulator — the batch twin of
    an arbitrary-stateful streaming op (applyInPandasWithState variant
    in streaming/engine.py, equivalence asserted in tests)."""
    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    return e.filter(F.col("user_id") % 10 == 0).select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("user_seq"),
        pround(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0))).alias("running_value"),
    )


@register(
    "stream_stream_join",
    oracle="""
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           floor(CAST(p.value AS DOUBLE) * 10000 + 0.5) / 10000 AS purchase_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
    JOIN (SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <  c.ts + INTERVAL 1 HOUR
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks joined to purchases within 1 h (same user) — the batch
    twin of a watermarked stream-stream join (state bounded by the
    1 h time condition on both sides)."""
    e = load_tables(spark, sf_dir)["events"]
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts_ns").alias("c_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts_ns").alias("p_ts"),
        F.col("value"),
    )
    hour_ns = 3600 * 1_000_000_000
    return (
        c.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") < F.col("c_ts") + F.lit(hour_ns)),
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            pround("value").alias("purchase_value"),
        )
    )


@register(
    "time_gap_fill",
    # dense hourly spine over the events span, zero-filled — the
    # standard time-series densification every dashboard needs
    oracle="""
    WITH bounds AS (
      SELECT time_bucket(INTERVAL 1 HOUR, MIN(ts)) AS lo,
             time_bucket(INTERVAL 1 HOUR, MAX(ts)) AS hi
      FROM events
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
    ), actual AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS h,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    )
    SELECT CAST(epoch(spine.h) AS BIGINT) AS hour_s,
           COALESCE(n, 0) AS n,
           COALESCE(sum_value, 0.0) AS sum_value
    FROM spine LEFT JOIN actual ON spine.h = actual.h
    """,
)
def time_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly purchase series: hours with no events appear
    as zeros.

    Spine = sequence(min_hour, max_hour, 1h) exploded from a ONE-ROW
    aggregate — the spine generation is O(#hours) on a single task and
    broadcast to join the (shuffled) hourly aggregate; no driver-side
    date loops. At 100 TB the aggregate side dominates and the plan is
    unchanged.
    """
    e = load_tables(spark, sf_dir)["events"]
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = e.agg(
        F.min(hour).alias("lo"), F.max(hour).alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    actual = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(hour.alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias(
                "sum_value"
            ),
        )
    )
    return (
        F.broadcast(spine)
        .join(actual, "h", "left")
        .select(
            F.unix_timestamp("h").alias("hour_s"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
    )


@register(
    "funnel_conversion",
    # classic funnel: per user, first click → earliest purchase within
    # 1 h after it; conversion counted once per user
    oracle="""
    WITH first_click AS (
      SELECT user_id, MIN(ts) AS c_ts
      FROM events WHERE event_type = 'click'
      GROUP BY user_id
    ), converted AS (
      SELECT f.user_id,
             MIN(e.ts) AS p_ts
      FROM first_click f
      JOIN events e
        ON e.user_id = f.user_id
       AND e.event_type = 'purchase'
       AND e.ts >= f.c_ts
       AND e.ts < f.c_ts + INTERVAL 1 HOUR
      GROUP BY f.user_id
    )
    SELECT COUNT(*) AS n_clickers,
           CAST(SUM(CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_converted,
           floor(CAST(CAST(SUM(CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*) AS DOUBLE) * 10000 + 0.5) / 10000
             AS conversion_rate
    FROM first_click LEFT JOIN converted USING (user_id)
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase funnel within a 1-hour attribution window.

    Shape at scale: one agg per stage (first click per user), one
    interval join keyed on user_id (hash join + residual time band,
    never a time-only range join), one final scalar agg.
    """
    e = load_tables(spark, sf_dir)["events"]
    first_click = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    converted = (
        first_click.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") < F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy("user_id")
        .agg(F.min("p_ts").alias("p_ts"))
    )
    joined = first_click.join(converted, "user_id", "left")
    n_conv = F.sum(F.col("p_ts").isNotNull().cast("bigint"))
    return joined.agg(
        F.count(F.lit(1)).alias("n_clickers"),
        n_conv.alias("n_converted"),
        pround(n_conv.cast("double") / F.count(F.lit(1))).alias("conversion_rate"),
    )


@register(
    "stream_hopping_topk",
    oracle="""
    WITH offsets AS (SELECT unnest([0, 1, 2, 3]) AS k),
    cells AS (
      SELECT CAST(epoch(time_bucket(INTERVAL 15 MINUTES, ts) - k * INTERVAL 15 MINUTES)
               AS BIGINT) AS window_start_s,
             event_type,
             COUNT(*) AS n_events
      FROM events CROSS JOIN offsets
      GROUP BY 1, 2
    )
    SELECT window_start_s, event_type, n_events, rn
    FROM (
      SELECT *, row_number() OVER (PARTITION BY window_start_s
                                   ORDER BY n_events DESC, event_type) AS rn
      FROM cells
    )
    WHERE rn <= 3
    """,
)
def stream_hopping_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per 1-hour window sliding every 15 min — the
    'trending topics' shape (hopping window + per-window rank).

    Aggregation first (cells = windows × |types|, bounded), THEN the
    rank window over those cells partitioned by window_start — the
    rank never touches event grain. In true streaming the same query
    runs with `F.window` + watermark and the rank moves to the
    foreachBatch consumer (per-window state is the |types| cell row,
    mergeable across triggers)."""
    e = load_tables(spark, sf_dir)["events"]
    cells = (
        e.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n_events",
        )
    )
    w = Window.partitionBy("window_start_s").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    return cells.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)


@register(
    "event_session_stats",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTES
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), islands AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ), sessions AS (
      SELECT user_id, session_id,
             COUNT(*) AS n_events,
             (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS duration_s
      FROM islands GROUP BY 1, 2
    )
    SELECT n_events AS session_len,
           COUNT(*) AS n_sessions,
           floor(CAST(AVG(duration_s) AS DOUBLE) * 10000 + 0.5) / 10000
             AS avg_duration_s,
           CAST(MAX(duration_s) AS BIGINT) AS max_duration_s
    FROM sessions
    GROUP BY 1
    """,
)
def event_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-length distribution: sessions (30-min gap) rolled up by
    event count, with duration stats — the engagement histogram every
    product-analytics stack derives from its sessionizer.

    Same one (user) shuffle as `stream_session_window`; the rollup
    grain is |distinct session lengths| (bounded), duration arithmetic
    is exact integer µs→s division on both engines."""
    e = load_tables(spark, sf_dir)["events"]
    sessions = (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(
                "(unix_micros(max(ts)) - unix_micros(min(ts))) DIV 1000000"
            ).alias("duration_s"),
        )
    )
    return sessions.groupBy(F.col("n_events").alias("session_len")).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        pround(F.avg("duration_s")).alias("avg_duration_s"),
        F.max("duration_s").cast("long").alias("max_duration_s"),
    )


@register(
    "stream_stream_left_join",
    # the LEFT OUTER watermarked stream-stream join: every click is
    # emitted; unmatched clicks surface with NULLs once the watermark
    # passes click_ts + 1 h (state eviction = the join condition's
    # time bound). The batch twin is the same left join — the null
    # rows ARE the late-emission rows a streaming run produces.
    oracle="""
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           floor(CAST(p.value AS DOUBLE) * 10000 + 0.5) / 10000
             AS purchase_value,
           CAST(CASE WHEN p.event_id IS NULL THEN 1 ELSE 0 END AS INT)
             AS unmatched
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click') c
    LEFT JOIN (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <  c.ts + INTERVAL 1 HOUR
    """,
)
def stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join (clicks ⟕ purchases within 1 h):
    the outer twin of stream_stream_join. In Structured Streaming
    this is the join whose NULL rows can only be emitted when the
    watermark passes the click's upper time bound — the batch
    formulation makes those exact rows (unmatched = 1) first-class
    and hash-checkable.

    Scale/state shape: the 1 h bound on BOTH sides is what makes
    streaming state finite (each side's buffer holds one hour); in
    batch the same bound is the band predicate that keeps the
    per-user nested loop bounded. One user_id shuffle either way.
    """
    e = load_tables(spark, sf_dir)["events"]
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts_ns").alias("c_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts_ns").alias("p_ts"),
        F.col("value"),
    )
    hour_ns = 3600 * 1_000_000_000
    return (
        c.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") < F.col("c_ts") + F.lit(hour_ns)),
            "left",
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            pround("value").alias("purchase_value"),
            F.when(F.col("purchase_id").isNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("unmatched"),
        )
    )


def stream_stream_full_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the FULL OUTER stream-stream join (NOT a
    registered key — the registry is frozen at 329; this exists for
    the runtime-parity pytest): every unmatched click AND every
    unmatched purchase is NULL-padded, which is the terminal-watermark
    limit of the streaming query. Same 1 h band predicate, same one
    user_id shuffle."""
    e = load_tables(spark, sf_dir)["events"]
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts_ns").alias("c_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts_ns").alias("p_ts"),
        F.col("value"),
    )
    hour_ns = 3600 * 1_000_000_000
    return (
        c.join(
            p,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") < F.col("c_ts") + F.lit(hour_ns)),
            "full",
        )
        .select(
            "click_id",
            "purchase_id",
            F.coalesce(F.col("c_user"), F.col("p_user")).alias("user_id"),
            pround("value").alias("purchase_value"),
            F.when(F.col("purchase_id").isNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("unmatched_click"),
            F.when(F.col("click_id").isNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("unmatched_purchase"),
            "c_ts",
            "p_ts",
        )
    )


LATE_BUCKET = 1000  # arrival-sequence bucket width for the 2-pass max


@register(
    "stream_lateness_audit",
    # Watermark pre-flight: replay events in ARRIVAL order (event_id)
    # and count how many would be dropped by a 1 h / 6 h / 24 h
    # watermark — an event is dropped when its event time trails the
    # max event time already arrived by more than the delay. The
    # oracle states it as one global running max; the Spark plan
    # computes the identical value via the two-pass bucket
    # decomposition (see docstring).
    oracle="""
    WITH seq AS (
      SELECT epoch_us(ts) AS ts_us,
             max(epoch_us(ts)) OVER (ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_us
      FROM events
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN ts_us < prev_max_us - 3600000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late_1h,
           CAST(SUM(CASE WHEN ts_us < prev_max_us - 21600000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late_6h,
           CAST(SUM(CASE WHEN ts_us < prev_max_us - 86400000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late_24h,
           floor(CAST(SUM(CASE WHEN ts_us < prev_max_us - 3600000000
                              THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) * 1000000 + 0.5) / 1000000 AS drop_rate_1h
    FROM seq
    """,
)
def stream_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark pre-flight audit: BEFORE picking `withWatermark`
    delays (stream_late_data's knob), measure on historical data how
    many events would have been dropped at 1 h / 6 h / 24 h — the
    disorder profile of the feed. Arrival order is the ingest
    sequence (event_id); an event is late by (max event time seen so
    far − its event time).

    Scale shape: the naive statement is a GLOBAL running max over raw
    rows — a single-task sort at 100 TB. The plan instead uses the
    two-pass decomposition every distributed rank/prefix computation
    uses: (1) per-bucket running max, partitioned by
    event_id DIV 1000 (parallel); (2) prefix max over the BUCKET
    grain (n/1000 rows — a window over an aggregated grain);
    (3) combined = max(prior buckets' prefix, within-bucket prefix).
    Identical value to the oracle's global window, no global raw-row
    sort. Exact integer µs throughout; one division for the rate.
    """
    e = load_tables(spark, sf_dir)["events"]
    us = F.unix_micros(F.col("ts"))
    b = e.select(
        (F.col("event_id") / LATE_BUCKET).cast("bigint").alias("bucket"),
        F.col("event_id"),
        us.alias("ts_us"),
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = b.withColumn("in_prev_max", F.max("ts_us").over(w_in))
    bucket_max = b.groupBy("bucket").agg(F.max("ts_us").alias("b_max"))
    w_pre = (
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = bucket_max.select(
        "bucket", F.max("b_max").over(w_pre).alias("prior_max")
    )
    seq = within.join(F.broadcast(prior), "bucket").select(
        "ts_us",
        F.greatest(
            F.coalesce(F.col("in_prev_max"), F.lit(None)),
            F.coalesce(F.col("prior_max"), F.lit(None)),
        ).alias("prev_max_us"),
    )
    late = lambda h: F.sum(  # noqa: E731
        F.when(F.col("ts_us") < F.col("prev_max_us") - h * 3600000000, 1)
        .otherwise(0)
    ).cast("bigint")
    return seq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        late(1).alias("n_late_1h"),
        late(6).alias("n_late_6h"),
        late(24).alias("n_late_24h"),
        (
            F.floor(late(1).cast("double") / F.count(F.lit(1)) * 1000000 + 0.5)
            / 1000000
        ).alias("drop_rate_1h"),
    )
