"""§2.3 join surface.

Reference parity: algebraicdb's relational core had at most
cross-product composition; the full join zoo (outer/semi/anti/theta/
as-of/interval) is the analytical extension.

Scale notes (the point of each key):
  - ``join_inner_broadcast``: dims (region/nation/supplier) always fit
    in one executor → explicit ``F.broadcast`` so no shuffle of the
    big side, ever.
  - ``join_inner_shuffle`` / ``join_multiway_star``: fact⋈fact shuffles
    on the join key; AQE handles skew splitting at runtime. The star
    join broadcasts every dim so the ONLY shuffle is lineitem⋈orders.
  - ``join_theta_range``: non-equi ⇒ BNLJ; we bound the broadcast side
    with a selective filter first — the pattern that keeps theta joins
    feasible at scale (never BNLJ two big sides).
  - ``join_asof``: implemented as union + window ``last(ignorenulls)``
    — ONE shuffle by user, no range explosion; this is the 100 TB
    as-of pattern (a naive range join is quadratic per key group).
  - ``join_interval``: bounded range predicate on top of a user-key
    equi-join, so Spark plans hash-join + residual filter, not BNLJ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from algebraicdb_spark.functions.rounding import exact_money_sum, pround
from algebraicdb_spark.plans.registry import register
from algebraicdb_spark.sources.catalog import load_tables


@register(
    "join_inner_broadcast",
    oracle="""
    SELECT r_name, COUNT(*) AS n_nations,
           floor(CAST(SUM(n_nationkey) AS DOUBLE) * 10000 + 0.5) / 10000 AS sum_nationkey
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join of two tiny dims (no shuffle of either side)."""
    t = load_tables(spark, sf_dir)
    return (
        t["nation"]
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            pround(F.sum("n_nationkey")).alias("sum_nationkey"),
        )
    )


@register(
    "join_inner_shuffle",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_inner_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact equi-join: both sides shuffle on orderkey (SMJ/SHJ,
    Catalyst + AQE pick), then hash agg on the joined stream."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            exact_money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


Q3_ORACLE = """
SELECT o_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       CAST(strftime(o_orderdate, '%Y-%m-%d') AS VARCHAR) AS orderdate,
       o_orderpriority
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING' AND r_name = (SELECT MIN(r_name) FROM region)
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q3_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3/Q5 shape: 5-way star join + agg + total-ordered top-10.

    All dims (region, nation, customer-filtered) broadcast; the sole
    shuffle is lineitem⋈orders, then a tiny TakeOrderedAndProject.
    """
    t = load_tables(spark, sf_dir)
    min_region = F.broadcast(
        t["region"].agg(F.min("r_name").alias("r_name_min"))
    )
    dims = (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(min_region, F.col("r_name") == F.col("r_name_min"))
    )
    # dims cut orders BEFORE the fact join (guide §3.2 — reduce the
    # big side before shuffling it): the broadcast semi-cut is
    # map-side, so the orderkey join sees ~4% of orders, and the
    # planner/AQE may then broadcast the filtered orders under the
    # lineitem join (no hint: at 100 TB it falls back to SMJ of the
    # REDUCED side, never the raw one). LEFT SEMI, not inner (round
    # 14): no dim column survives the cut and c_custkey is unique, so
    # the two are row-identical — but the inner form's size estimate
    # (orders × customer-chain product) exceeded the projected
    # lineitem estimate, and the planner picked the FACT side as the
    # broadcast build (a ~600k-row serial build per run, and exactly
    # the side that can never broadcast at scale). A semi join's
    # estimate is bounded by the orders side, so the reduced orders —
    # the side that actually fits — becomes the build.
    orders_cut = t["orders"].join(
        F.broadcast(dims.select("c_custkey")),
        F.col("o_custkey") == F.col("c_custkey"),
        "left_semi",
    )
    return (
        t["lineitem"]
        .join(orders_cut, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            exact_money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


register("join_multiway_star", oracle=Q3_ORACLE)(q3_star)


@register(
    "join_left_outer",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_customers_no_order,
           COUNT(o_orderkey) AS n_matched
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join; unmatched right side becomes NULLs (counted)."""
    t = load_tables(spark, sf_dir)
    j = t["customer"].join(
        t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left"
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
            "n_customers_no_order"
        ),
        F.count("o_orderkey").alias("n_matched"),
    )


@register(
    "join_full_outer",
    oracle="""
    WITH c AS (SELECT DISTINCT o_custkey AS k FROM orders),
         u AS (SELECT DISTINCT user_id  AS k FROM events)
    SELECT
      CAST(SUM(CASE WHEN c.k IS NOT NULL AND u.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
      CAST(SUM(CASE WHEN u.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orders_only,
      CAST(SUM(CASE WHEN c.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_events_only
    FROM c FULL JOIN u ON c.k = u.k
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join over the (distinct) key overlap of two tables."""
    t = load_tables(spark, sf_dir)
    c = t["orders"].select(F.col("o_custkey").alias("k")).distinct()
    u = t["events"].select(F.col("user_id").alias("k")).distinct()
    j = c.alias("c").join(u.alias("u"), F.col("c.k") == F.col("u.k"), "full")
    one_if = lambda cond: F.sum(F.when(cond, 1).otherwise(0))  # noqa: E731
    return j.agg(
        one_if(F.col("c.k").isNotNull() & F.col("u.k").isNotNull()).alias("n_both"),
        one_if(F.col("u.k").isNull()).alias("n_orders_only"),
        one_if(F.col("c.k").isNull()).alias("n_events_only"),
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    GROUP BY c_mktsegment
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS): left rows with >=1 match, emitted once."""
    t = load_tables(spark, sf_dir)
    f_orders = t["orders"].filter(F.col("o_orderstatus") == "F")
    return (
        t["customer"]
        .join(f_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "join_left_anti",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS): customers who never ordered."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "join_cross",
    oracle="""
    SELECT COUNT(*) AS n_pairs, CAST(SUM(r_regionkey + n_nationkey) AS BIGINT) AS checksum
    FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (the reference's only join-ish composition)."""
    t = load_tables(spark, sf_dir)
    return (
        t["region"]
        .crossJoin(t["nation"])
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("r_regionkey") + F.col("n_nationkey")).alias("checksum"),
        )
    )


@register(
    "join_theta_range",
    oracle="""
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           a.p_size AS size_a, b.p_size AS size_b
    FROM part a JOIN part b
      ON abs(a.p_size - b.p_size) <= 1
     AND a.p_partkey < b.p_partkey
    WHERE a.p_brand = 'Brand#11' AND b.p_brand = 'Brand#12'
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (band) join; selective filters shrink the broadcast side
    first so the BNLJ stays bounded."""
    p = load_tables(spark, sf_dir)["part"]
    a = p.filter(F.col("p_brand") == "Brand#11").select(
        F.col("p_partkey").alias("part_a"), F.col("p_size").alias("size_a")
    )
    b = p.filter(F.col("p_brand") == "Brand#12").select(
        F.col("p_partkey").alias("part_b"), F.col("p_size").alias("size_b")
    )
    return a.join(
        F.broadcast(b),
        (F.abs(F.col("size_a") - F.col("size_b")) <= 1)
        & (F.col("part_a") < F.col("part_b")),
    ).select("part_a", "part_b", "size_a", "size_b")


@register(
    "join_asof",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id,
           p.user_id,
           epoch_us(p.ts) AS purchase_ts_us,
           epoch_us(c.ts) AS last_click_ts_us
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest click at
    or before it.

    Spark has no native ASOF JOIN; the scalable formulation is
    union-the-two-streams + window ``last(_, ignorenulls=True)`` —
    one shuffle on (user, time), linear work, no per-key range
    explosion. At equal timestamps clicks sort before purchases
    (matching DuckDB ASOF's inclusive ``>=`` bound).
    """
    e = load_tables(spark, sf_dir)["events"]
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts_ns"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("kind"),  # clicks first at equal ts
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts_ns"), F.col("event_id"), F.lit(1).alias("kind")
    )
    merged = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("kind") == 0, F.col("ts_ns"))
    return (
        merged.withColumn("last_click_ts_ns", F.last(click_ts, ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            F.expr("ts_ns DIV 1000").alias("purchase_ts_us"),
            F.expr("last_click_ts_ns DIV 1000").alias("last_click_ts_us"),
        )
    )


@register(
    "join_asof_tolerance",
    # same union+window formulation in SQL: DuckDB's ASOF JOIN has no
    # tolerance clause either, so both engines express the pandas
    # merge_asof(tolerance=...) semantics identically
    oracle="""
    WITH merged AS (
      SELECT user_id, epoch_ns(ts) AS ts_ns, NULL::BIGINT AS event_id, 0 AS kind
      FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, epoch_ns(ts), event_id, 1
      FROM events WHERE event_type = 'purchase'
    ), tagged AS (
      SELECT *,
             last_value(CASE WHEN kind = 0 THEN ts_ns END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts_ns, kind
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts_ns
      FROM merged
    )
    SELECT event_id, user_id,
           ts_ns // 1000 AS purchase_ts_us,
           CASE WHEN ts_ns - last_click_ts_ns <= 3600000000000
                THEN last_click_ts_ns // 1000 END AS click_ts_us,
           CASE WHEN ts_ns - last_click_ts_ns <= 3600000000000
                THEN 1 ELSE 0 END AS matched
    FROM tagged WHERE kind = 1
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a lookback tolerance (pandas ``merge_asof``'s
    ``tolerance=`` semantics): each purchase matches the user's latest
    click only if it happened within the preceding hour; staler
    matches become NULL instead of silently attributing ancient
    clicks.

    Same single (user, time) shuffle as ``join_asof`` — the tolerance
    is a post-window projection, so bounding the lookback costs
    nothing extra. At 100 TB the tolerance ALSO bounds what streaming
    state would have to remember (cf. stream_stream_join's band).
    """
    e = load_tables(spark, sf_dir)["events"]
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts_ns"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("kind"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts_ns"), F.col("event_id"), F.lit(1).alias("kind")
    )
    merged = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("kind") == 0, F.col("ts_ns"))
    tol_ns = 3_600_000_000_000  # 1 hour
    within = (F.col("ts_ns") - F.col("last_click_ts_ns")) <= tol_ns
    return (
        merged.withColumn(
            "last_click_ts_ns", F.last(click_ts, ignorenulls=True).over(w)
        )
        .filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            F.expr("ts_ns DIV 1000").alias("purchase_ts_us"),
            F.when(within, F.expr("last_click_ts_ns DIV 1000")).alias("click_ts_us"),
            F.when(within, 1).otherwise(0).alias("matched"),
        )
    )


@register(
    "join_interval",
    oracle="""
    SELECT s.event_id AS signup_id,
           s.user_id,
           COUNT(p.event_id) AS purchases_within_1d,
           floor(CAST(COALESCE(SUM(p.value), 0.0) AS DOUBLE) * 10000 + 0.5) / 10000 AS purchase_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') s
    LEFT JOIN (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'purchase') p
      ON s.user_id = p.user_id
     AND p.ts >= s.ts
     AND p.ts <  s.ts + INTERVAL 1 DAY
    GROUP BY s.event_id, s.user_id
    """,
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: purchases within 24 h after each signup.

    The user-key equality makes this a hash join with a residual range
    predicate — NOT a BNLJ — so it scales with key-group size, and the
    1-day bound caps the per-key work (the streaming twin of this key
    is ``stream_stream_join``).
    """
    e = load_tables(spark, sf_dir)["events"]
    s = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id"),
        F.col("ts_ns").alias("s_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts_ns").alias("p_ts"),
        F.col("event_id").alias("p_id"),
        F.col("value"),
    )
    day_ns = 86400 * 1_000_000_000
    j = s.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") < F.col("s_ts") + F.lit(day_ns)),
        "left",
    )
    return j.groupBy("signup_id", "user_id").agg(
        F.count("p_id").alias("purchases_within_1d"),
        pround(F.coalesce(F.sum("value"), F.lit(0.0))).alias("purchase_value"),
    )


INTERVAL_BLOCK_NS = 3_600 * 1_000_000_000  # block size == window length


@register(
    "join_interval_bucketed",
    # the bucketed plan must produce EXACTLY the naive interval join's
    # answer — which is the oracle. Per-value 1e-6 grid-floor before
    # the sum keeps the cross-user aggregate order-free on both
    # engines (the text_unigram_logprob recipe).
    oracle=f"""
    WITH s AS (
      SELECT event_id AS signup_id, epoch_ns(ts) AS s_ts
      FROM events WHERE event_type = 'signup'
    ), p AS (
      SELECT epoch_ns(ts) AS p_ts,
             CAST(floor(value * 1000000) AS BIGINT) AS v6
      FROM events WHERE event_type = 'purchase'
    )
    SELECT s.signup_id,
           COUNT(p.p_ts) AS n_purchases,
           floor(CAST(CAST(COALESCE(SUM(p.v6), 0) AS DOUBLE) / 1000000.0
                 AS DOUBLE) * 10000 + 0.5) / 10000 AS purchase_value
    FROM s LEFT JOIN p
      ON p.p_ts >= s.s_ts AND p.p_ts < s.s_ts + {INTERVAL_BLOCK_NS}
    GROUP BY s.signup_id
    """,
)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join WITHOUT an equality key, bucketed: all purchases
    (any user) within 1 h after each signup.

    ``join_interval`` has user_id equality to hash on; drop that and
    Spark can only plan a broadcast-nested-loop over the range
    predicate — quadratic at scale. The standard fix (Databricks
    range-join binning): quantize time into fixed blocks no smaller
    than the window, equi-join on block id — each signup probes
    exactly 2 blocks (its own + the next), the residual range filter
    runs on block-co-located rows, and the plan is a plain hash join
    that scales with (rows × window density), never |s|×|p|. The
    block size is a tuning knob: window-sized blocks give ≤2 probe
    blocks per row and ~2× residual over-read.
    """
    e = load_tables(spark, sf_dir)["events"]
    s = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), F.col("ts_ns").alias("s_ts")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("ts_ns").alias("p_ts"),
        F.floor(F.col("value") * F.lit(1e6)).cast("long").alias("v6"),
    )
    pb = p.withColumn("blk", F.expr(f"p_ts DIV {INTERVAL_BLOCK_NS}"))
    sb = s.select(
        "signup_id",
        "s_ts",
        F.explode(
            F.array(
                F.expr(f"s_ts DIV {INTERVAL_BLOCK_NS}"),
                F.expr(f"s_ts DIV {INTERVAL_BLOCK_NS} + 1"),
            )
        ).alias("blk"),
    )
    hits = sb.join(pb, "blk").filter(
        (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") < F.col("s_ts") + F.lit(INTERVAL_BLOCK_NS))
    )
    agg = hits.groupBy("signup_id").agg(
        F.count(F.lit(1)).alias("n_p"), F.sum("v6").alias("sv6")
    )
    return s.join(agg, "signup_id", "left").select(
        "signup_id",
        F.coalesce(F.col("n_p"), F.lit(0)).alias("n_purchases"),
        pround(
            F.coalesce(F.col("sv6"), F.lit(0)).cast("double") / F.lit(1e6)
        ).alias("purchase_value"),
    )


@register(
    "join_asof_nearest",
    # pure BIGINT nanosecond arithmetic end to end — both directions'
    # window passes and the nearest pick replay exactly in SQL
    oracle="""
    WITH merged AS (
      SELECT user_id, epoch_ns(ts) AS ts_ns, NULL::BIGINT AS event_id, 0 AS kind
      FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, epoch_ns(ts), event_id, 1
      FROM events WHERE event_type = 'purchase'
    ), tagged AS (
      SELECT *,
             last_value(CASE WHEN kind = 0 THEN ts_ns END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts_ns, kind
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back_ts,
             last_value(CASE WHEN kind = 0 THEN ts_ns END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts_ns DESC, kind DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fwd_ts
      FROM merged
    )
    SELECT event_id, user_id,
           ts_ns // 1000 AS purchase_ts_us,
           CASE WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL
                WHEN fwd_ts IS NULL
                  OR (back_ts IS NOT NULL
                      AND ts_ns - back_ts <= fwd_ts - ts_ns)
                THEN back_ts // 1000 ELSE fwd_ts // 1000
           END AS nearest_click_ts_us,
           CASE WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL
                WHEN fwd_ts IS NULL
                  OR (back_ts IS NOT NULL
                      AND ts_ns - back_ts <= fwd_ts - ts_ns)
                THEN 'back' ELSE 'fwd'
           END AS direction
    FROM tagged WHERE kind = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, ``direction='nearest'`` (the third pandas
    ``merge_asof`` direction, completing backward/``join_asof`` and
    tolerance/``join_asof_tolerance``): each purchase matches the
    user's CLOSEST click in either time direction, ties to the
    earlier click.

    Scale shape: the same union-the-streams trick run in both time
    directions — two window functions over ONE (user, time) sort (a
    descending-order window reuses the ascending sort's partitioning;
    Spark plans a single Exchange), then an integer-ns nearest pick.
    Still linear, still one shuffle, no per-key range explosion.
    """
    e = load_tables(spark, sf_dir)["events"]
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts_ns"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("kind"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts_ns"), F.col("event_id"), F.lit(1).alias("kind")
    )
    merged = clicks.unionByName(purchases)
    click_ts = F.when(F.col("kind") == 0, F.col("ts_ns"))
    w_back = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_ns").asc(), F.col("kind").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_ns").desc(), F.col("kind").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = merged.select(
        "*",
        F.last(click_ts, ignorenulls=True).over(w_back).alias("back_ts"),
        F.last(click_ts, ignorenulls=True).over(w_fwd).alias("fwd_ts"),
    ).filter(F.col("kind") == 1)
    back_wins = F.col("fwd_ts").isNull() | (
        F.col("back_ts").isNotNull()
        & (F.col("ts_ns") - F.col("back_ts") <= F.col("fwd_ts") - F.col("ts_ns"))
    )
    nothing = F.col("back_ts").isNull() & F.col("fwd_ts").isNull()
    return tagged.select(
        "event_id",
        "user_id",
        F.expr("ts_ns DIV 1000").alias("purchase_ts_us"),
        F.when(nothing, F.lit(None).cast("long"))
        .when(back_wins, F.expr("back_ts DIV 1000"))
        .otherwise(F.expr("fwd_ts DIV 1000"))
        .alias("nearest_click_ts_us"),
        F.when(nothing, F.lit(None).cast("string"))
        .when(back_wins, F.lit("back"))
        .otherwise(F.lit("fwd"))
        .alias("direction"),
    )


@register(
    "join_bucketed",
    # content is identical to a plain equi-join — what the bucketed
    # variant buys is the PLAN: zero Exchange on either side (pinned
    # by test_bucketed_join_has_no_exchange)
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact⋈fact join over bucketed tables (SURVEY §4:
    pay the shuffle once at write, zero exchanges per join after)."""
    from algebraicdb_spark.sources.bucketed import prepare_bucketed

    li_name, o_name = prepare_bucketed(spark, sf_dir)
    li, o = spark.table(li_name), spark.table(o_name)
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            exact_money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
        )
    )


BLOOM_BITS = 1 << 16   # 65536 bits = 1024 longs; size ~10 bits/key at scale
BLOOM_WORDS = BLOOM_BITS // 64
BLOOM_SEEDS = (0, 1, 2)
BLOOM_PRICE_MIN = 480000.0  # selective build side (~3% of orders)


def _bloom_slot(key_name: str, seed: int):
    """(word, mask) for one hash function — JVM-side xxhash64.
    SQL-expr form because shiftleft's Python wrapper only takes a
    literal shift amount."""
    pos = f"pmod(xxhash64({key_name}, {seed}), {BLOOM_BITS})"
    word = F.expr(f"CAST({pos} DIV 64 AS INT)")
    mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({pos} % 64 AS INT))")
    return word, mask


@register(
    "join_bloom_prefilter",
    # the bloom is a pure prefilter (no false negatives) followed by an
    # exact semi-join, so the result is EXACTLY the plain semi-join —
    # which is the oracle. What the bloom buys is the PLAN: probe-side
    # rows that cannot match are dropped map-side, before any shuffle.
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 480000.0)
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join with an explicit broadcast Bloom-filter prefilter —
    the classic shuffle-reduction pattern for a selective build side
    (Spark's runtime row-level filtering does the same when
    `spark.sql.optimizer.runtime.bloomFilter.enabled` is on; this key
    builds it declaratively so the plan is visible and testable).

    Build: hash each build key with 3 seeded xxhash64 functions into a
    65536-bit filter, OR-folded per 64-bit word by `bit_or` (map-side
    partial, ≤1024-row shuffle). The filter ships to every probe task
    as a one-row broadcast map. Probe: a row survives only if all 3
    bits are set; survivors still pass through the EXACT semi-join, so
    bloom false positives cannot leak into the result. At 100 TB, size
    BLOOM_BITS at ~10 bits per build key (the filter stays KB-MB and
    the probe-side shuffle shrinks by the prefilter's selectivity).
    """
    t = load_tables(spark, sf_dir)
    keys = (
        t["orders"]
        .filter(F.col("o_totalprice") > BLOOM_PRICE_MIN)
        .select("o_orderkey")
    )
    slots = None
    for s in BLOOM_SEEDS:
        w, m = _bloom_slot("o_orderkey", s)
        part = keys.select(w.alias("word"), m.alias("mask"))
        slots = part if slots is None else slots.unionAll(part)
    bloom = (
        slots.groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("word", "bits"))
            ).alias("bloom")
        )
    )
    li = t["lineitem"]
    member = None
    for s in BLOOM_SEEDS:
        w, m = _bloom_slot("l_orderkey", s)
        hit = (
            F.coalesce(F.element_at(F.col("bloom"), w), F.lit(0)).bitwiseAND(m)
            != 0
        )
        member = hit if member is None else (member & hit)
    prefiltered = (
        li.join(F.broadcast(bloom))  # 1-row broadcast: the filter itself
        .filter(member)
        .drop("bloom")
    )
    return (
        prefiltered.join(
            keys, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            exact_money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "join_null_safe",
    # <=> / IS NOT DISTINCT FROM: the join where NULL matches NULL.
    # Fixtures are NULL-free, so both sides nullify their key on the
    # same deterministic predicate — the classic "unknown bucket"
    # linkage shape (records with missing keys still pair up).
    oracle="""
    WITH c AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_nationkey END AS nk
      FROM customer
    ),
    s AS (
      SELECT s_suppkey,
             CASE WHEN s_suppkey % 7 = 0 THEN NULL ELSE s_nationkey END AS nk
      FROM supplier
    )
    SELECT COALESCE(CAST(c.nk AS VARCHAR), 'NULL') AS nation_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT s.s_suppkey) AS BIGINT) AS n_suppliers
    FROM c JOIN s ON c.nk IS NOT DISTINCT FROM s.nk
    GROUP BY 1
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): customers
    and suppliers matched on nationkey where records with a MISSING
    nation also pair with each other — semantics a plain equi-join
    silently drops (NULL = NULL is never true).

    Scale shape: Spark plans eqNullSafe as an ordinary hash join on
    a null-coalesced key, so it shuffles like any equi-join — BUT
    every NULL row lands in ONE bucket, making NULL the natural skew
    hotspot at 100 TB (here ~14% of keys). Production either
    pre-filters the NULL slice into a separate broadcast-size branch
    or salts that single bucket; AQE's skew-join split handles the
    middle ground.
    """
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.col("c_nationkey"))
        .alias("nk"),
    )
    s = t["supplier"].select(
        "s_suppkey",
        F.when(F.col("s_suppkey") % 7 == 0, None)
        .otherwise(F.col("s_nationkey"))
        .alias("nk"),
    )
    j = c.join(s, c["nk"].eqNullSafe(s["nk"]))
    return j.groupBy(
        F.coalesce(c["nk"].cast("string"), F.lit("NULL")).alias("nation_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("c_custkey").alias("n_customers"),
        F.countDistinct("s_suppkey").alias("n_suppliers"),
    )


@register(
    "join_lateral",
    # LATERAL (correlated subquery in FROM) with per-row ORDER BY +
    # LIMIT under a TOTAL order — the "top-N per outer row" join both
    # engines ship natively. Spark decorrelates this to a ranked
    # window under the hood; declaring it LATERAL keeps the intent.
    oracle="""
    SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice AS price
    FROM orders o, LATERAL (
      SELECT l_linenumber, l_extendedprice
      FROM lineitem
      WHERE l_orderkey = o.o_orderkey
      ORDER BY l_extendedprice DESC, l_linenumber, l_partkey, l_suppkey
      LIMIT 2
    ) t
    WHERE o.o_orderkey % 100 = 0
    """,
)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL join: each sampled order pulls its own top-2 priciest
    lines through a correlated subquery in FROM — the join-family
    member that parameterizes the inner relation by the outer row
    (the SQL-standard form of "top-N per key").

    Scale shape: Catalyst decorrelates the lateral subquery into a
    join + per-key rank — the same physical plan win_row_number_topn
    declares directly, so there is no hidden per-row re-scan; the
    lineitem side shuffles once on orderkey. The LIMIT's ORDER BY is
    a total order (price, line, part, supp) so the kept rows are
    engine-identical.
    """
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice AS price
        FROM orders o JOIN LATERAL (
          SELECT l_linenumber, l_extendedprice
          FROM lineitem
          WHERE l_orderkey = o.o_orderkey
          ORDER BY l_extendedprice DESC, l_linenumber, l_partkey, l_suppkey
          LIMIT 2
        ) t
        WHERE o.o_orderkey % 100 = 0
        """
    )
