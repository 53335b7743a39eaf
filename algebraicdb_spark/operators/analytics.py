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

from algebraicdb_spark.functions.rounding import (
    exact_money_sum,
    pround,
    pround_sql,
)
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


@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_ns(ts), event_id) AS next_type
      FROM events
    ), t AS (
      SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           floor(CAST(n AS DOUBLE) /
                 SUM(n) OVER (PARTITION BY from_type) * 10000 + 0.5) / 10000 AS p
    FROM t
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: count of (event_type → next event_type) steps plus the
    per-source transition probability.

    Scale shape: ONE shuffle on user_id for the lead() window (ties
    broken by the (ts_ns, event_id) total order both engines share),
    then a 25-cell aggregate — the matrix is |event_type|² regardless
    of corpus size. The probability normalizer is a window over those
    few cells, not over events. This is the standard sessionized
    clickstream model (user journeys, anomaly detection) expressed
    without a self-join.
    """
    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    seq = e.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    t = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wnorm = Window.partitionBy("from_type")
    return t.select(
        "from_type", "to_type", "n",
        (F.floor(F.col("n").cast("double") / F.sum("n").over(wnorm) * 10000
                 + F.lit(0.5)) / 10000).alias("p"),
    )


@register(
    "win_count_distinct_sliding",
    oracle="""
    WITH triples AS (
      SELECT DISTINCT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                      user_id
      FROM events
    ), days AS (
      SELECT DISTINCT event_type, day FROM triples
    )
    SELECT d.event_type,
           strftime(d.day, '%Y-%m-%d') AS day,
           COUNT(DISTINCT t.user_id) AS users_7d
    FROM days d
    JOIN triples t
      ON t.event_type = d.event_type
     AND t.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY d.event_type, d.day
    """,
)
def win_count_distinct_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per (event_type, day) — the
    sliding COUNT(DISTINCT) OVER that neither Spark nor DuckDB
    supports as a window function.

    Rewrite: dedup events to (type, day, user) triples FIRST (the big
    cardinality drop happens before anything slides), then a bounded
    range join — each triple matches ≤7 observed days — and an exact
    distinct count per bucket. Amplification is capped at the window
    length, so the plan is linear in distinct-triples × 7 at any
    scale; the naive per-row collect_set window would instead carry a
    user-set per EVENT. Day joins stay on (event_type) partitions.
    """
    e = load_tables(spark, sf_dir)["events"]
    triples = e.select(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "user_id",
    ).distinct()
    days = triples.select("event_type", F.col("day").alias("d")).distinct()
    joined = days.join(
        triples,
        (triples["event_type"] == days["event_type"])
        & (F.col("day") >= F.date_sub(F.col("d"), 6))
        & (F.col("day") <= F.col("d")),
    ).select(days["event_type"], "d", "user_id")
    return (
        joined.groupBy("event_type", "d")
        .agg(F.countDistinct("user_id").alias("users_7d"))
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "users_7d",
        )
    )


@register(
    "attribution_first_last",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type, value,
             CASE WHEN event_type <> 'purchase' THEN event_type END AS touch,
             epoch_ns(ts) AS tns, event_id
      FROM events
    ), attributed AS (
      SELECT user_id, event_type, value,
             first_value(touch IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY tns, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch,
             last_value(touch IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY tns, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
      FROM marked
    )
    SELECT COALESCE(first_touch, 'none') AS first_touch,
           COALESCE(last_touch, 'none') AS last_touch,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS attributed_value
    FROM attributed
    WHERE event_type = 'purchase'
    GROUP BY 1, 2
    """,
)
def attribution_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch attribution: every purchase is
    credited to the user's earliest and most recent non-purchase
    event types strictly before it ((ts_ns, event_id) total order;
    'none' when the purchase is the user's first event).

    Scale shape: one user_id shuffle serves both IGNORE-NULLS
    windows (same partition + order), then a |types|²-cell rollup
    with exact-decimal value sums. The classic self-join formulation
    ("events × prior events per purchase") is quadratic per user;
    the running first/last carries O(1) state per row instead.
    """
    e = load_tables(spark, sf_dir)["events"]
    marked = e.select(
        "user_id", "event_type", "value", "ts_ns", "event_id",
        F.when(F.col("event_type") != "purchase", F.col("event_type"))
        .alias("touch"),
    )
    frame = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attributed = marked.select(
        "event_type", "value",
        F.first("touch", ignorenulls=True).over(frame).alias("first_touch"),
        F.last("touch", ignorenulls=True).over(frame).alias("last_touch"),
    )
    return (
        attributed.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce("first_touch", F.lit("none")).alias("first_touch"),
            F.coalesce("last_touch", F.lit("none")).alias("last_touch"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            exact_money_sum(F.col("value"), 2).alias("attributed_value"),
        )
    )


@register(
    "event_anomaly_zscore",
    # stddev is computed from EXACT integer moments (Σx, Σx² of daily
    # counts) with the identical closed formula on both sides — never
    # the engines' own stddev accumulators, whose update orders differ
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), mom AS (
      SELECT event_type, day, n,
             COUNT(*)  OVER w AS w_cnt,
             SUM(n)    OVER w AS s1,
             SUM(n*n)  OVER w AS s2
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
           floor(CAST((n - CAST(s1 AS DOUBLE) / w_cnt) /
             sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / w_cnt)
                  / (w_cnt - 1)) AS DOUBLE) * 10000 + 0.5) / 10000 AS z,
           CASE WHEN abs((n - CAST(s1 AS DOUBLE) / w_cnt) /
                  sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / w_cnt)
                       / (w_cnt - 1))) > 3.0
                THEN 1 ELSE 0 END AS anomaly
    FROM mom
    WHERE w_cnt >= 7
      AND (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / w_cnt) > 0
    """,
)
def event_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: each (event_type, day) count scored
    against the trailing-14-day mean/stddev; |z| > 3 flags the day.

    Determinism at the hash level: the daily counts are exact
    integers, so the trailing Σx and Σx² are exact in any order; mean
    and sample stddev come from the CLOSED formula over those exact
    moments — identical IEEE arithmetic on both engines — rather than
    each engine's own streaming stddev accumulator (Welford vs naive
    differ in final ulps). Scale shape: one (event_type, day)
    aggregate, then one bounded window over days — days, not events,
    so the window input is tiny at any corpus size.
    """
    e = load_tables(spark, sf_dir)["events"]
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-14, -1)
    )
    mom = daily.select(
        "event_type", "day", "n",
        F.count(F.lit(1)).over(w).alias("w_cnt"),
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("w_cnt")
    var = (
        (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("w_cnt"))
        / (F.col("w_cnt") - 1)
    )
    z = (F.col("n") - mean) / F.sqrt(var)
    return (
        mom.filter(
            (F.col("w_cnt") >= 7)
            & ((F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1") / F.col("w_cnt")) > 0)
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            pround(z).alias("z"),
            F.when(F.abs(z) > 3.0, 1).otherwise(0).alias("anomaly"),
        )
    )


@register(
    "event_path_topk",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
    ), paths AS (
      SELECT e1 || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
      FROM seq WHERE e3 IS NOT NULL
      GROUP BY 1
    )
    SELECT path, n FROM paths
    ORDER BY n DESC, path ASC
    LIMIT 10
    """,
)
def event_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 three-step user journeys (order-2 path mining, the
    sequence-level complement of the order-1 transition matrix):
    sliding event triples per user under the (ts_ns, event_id) total
    order, counted corpus-wide.

    Scale shape: the SAME one (user_id) shuffle serves both lead()
    offsets; the path aggregate is bounded by |event_type|³ cells
    regardless of corpus size, and the top-10 is a
    TakeOrderedAndProject over those cells. Real clickstreams swap
    event_type for page/screen ids — the plan is unchanged, the cell
    count grows to (pages)³ which is why production systems count
    paths, not sessions.
    """
    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    seq = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(10)
    )


BUCKET_NS = 90 * 60 * 1_000_000_000  # 90 minutes
ORIGIN_NS = 1_577_836_800_000_000_000  # 2020-01-01T00:00:00Z


@register(
    "time_bucket_custom",
    oracle=f"""
    SELECT event_type,
           (epoch_ns(ts) - {ORIGIN_NS}) // {BUCKET_NS} AS bucket_idx,
           CAST(({ORIGIN_NS} + ((epoch_ns(ts) - {ORIGIN_NS}) // {BUCKET_NS})
                 * {BUCKET_NS}) // 1000000000 AS BIGINT) AS bucket_epoch,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def time_bucket_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time_bucket with an ARBITRARY width and
    origin (90-minute buckets anchored at 2020-01-01): the rollup
    shape `date_trunc` cannot express, and the reason time-series
    stores ship a time_bucket(width, ts, origin) primitive.

    Bucketing is exact int64 nanosecond arithmetic (floor division
    against the origin), so bucket identity can't drift between
    engines or partitions; values sum on the 2-decimal grid. One
    (type, bucket) shuffle carrying partial aggregates — identical to
    any hash rollup at 100 TB, and the bucket index is
    partition-pruning-friendly if the table is written bucketed.
    """
    e = load_tables(spark, sf_dir)["events"]
    # integer DIV throughout: ts_ns-origin exceeds 2^53, so any double
    # division would round boundary timestamps into the wrong bucket
    idx = F.expr(f"(ts_ns - {ORIGIN_NS}L) DIV {BUCKET_NS}L")
    return (
        e.groupBy(
            "event_type",
            idx.alias("bucket_idx"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_money_sum(F.col("value"), 2).alias("total_value"),
        )
        .select(
            "event_type",
            "bucket_idx",
            F.expr(
                f"({ORIGIN_NS}L + bucket_idx * {BUCKET_NS}L) DIV 1000000000L"
            ).alias("bucket_epoch"),
            "n_events",
            "total_value",
        )
    )


PR_DAMPING = 0.85
PR_ITERS = 25

# pagerank_exact's ordered folds collect per-node contribution lists;
# past this node count the exact tier must refuse loudly (not quietly
# grind) and the caller routes to the order-free `pagerank`.
PR_EXACT_MAX_NODES = 10_000

# Normalized-edge row budget for pagerank_exact's driver-fold tier: a
# transition matrix this small (~a few hundred KB collected) is MODEL
# data, and iterating a model on the driver is the sync-SGD topology
# (ml_train_logreg), not "driver data work". Event-type graphs are
# |types|² rows — far under this at any corpus scale; anything larger
# runs the distributed ordered-fold loop unchanged.
PR_EXACT_DRIVER_EDGES = 20_000


def _pr_sort_key(v):
    """sort_array's ordering for a node value: UTF-8 binary for
    strings (Spark compares UTF8String bytes), natural otherwise."""
    return v.encode("utf-8") if isinstance(v, str) else v


def _pagerank_driver_fold(norm_rows, node_list, damping, iters):
    """The pagerank_exact fixpoint as a driver fold over the collected
    normalized edges — every float op in the IDENTICAL order as the
    in-plan version (and the unrolled-CTE oracle): per-dst contribution
    terms folded in src order, dangling mass folded in node order,
    teleport + damping·(contrib + dm/n). Python floats are IEEE
    doubles, so the result is bit-equal (pinned by the oracle hash and
    test_pagerank)."""
    n = len(node_list)
    by_dst: dict = {}
    srcs = set()
    for r in norm_rows:
        by_dst.setdefault(r.dst, []).append((r.src, r.p))
        srcs.add(r.src)
    for terms in by_dst.values():
        terms.sort(key=lambda t: _pr_sort_key(t[0]))
    dangling = sorted(
        (v for v in node_list if v not in srcs), key=_pr_sort_key
    )
    teleport = (1.0 - damping) / n
    ranks = {v: 1.0 / n for v in node_list}
    for _ in range(iters):
        dm = 0.0
        for v in dangling:
            dm = dm + ranks[v]
        new = {}
        for v in node_list:
            c = 0.0
            for s, p in by_dst.get(v, ()):
                c = c + p * ranks[s]
            mass = c + dm / float(n) if dangling else c
            new[v] = teleport + damping * mass
        ranks = new
    return ranks


def pagerank(edges: DataFrame, damping: float = PR_DAMPING,
             iters: int = PR_ITERS) -> DataFrame:
    """Distributed PageRank over a weighted edge DataFrame
    (``src``, ``dst``, ``weight``) → (``node``, ``rank``).

    Each iteration is one join (ranks ⨝ out-normalized edges) + one
    aggregation on dst — the textbook message-passing round, all
    DataFrame ops. Dangling mass (nodes with no out-edges) is folded
    back in-plan via a broadcast 1-row aggregate, NOT a driver
    collect, so an iteration is a closed Catalyst DAG. Lineage is
    truncated with ``localCheckpoint`` each round (the CC loop's
    pattern, dedup.py `_connected_components`) — without it the plan
    doubles per iteration. At 1000-executor scale the rank/edge join
    shuffles on src; pre-partitioning edges by src makes every round
    reuse that layout.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()  # one action to size the teleport term
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    norm = (
        edges.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("out_w")).alias("p"))
        .localCheckpoint(eager=True)
    )
    has_out = norm.select("src").distinct().localCheckpoint(eager=True)
    # dangling-node set is a property of the GRAPH, not the ranks: if
    # no node lacks out-edges, dm is 0.0 every round and adding it is
    # an exact no-op (x + 0.0 == x) — skip 25 anti-join + broadcast
    # subplans. One extra setup action; bit-identical results.
    n_dangling = nodes.join(has_out, nodes.node == has_out.src, "left_anti").count()
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(iters):
        contribs = (
            norm.join(ranks, norm.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("p") * F.col("rank")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        mass = F.coalesce(F.col("c"), F.lit(0.0))
        joined = nodes.join(contribs, "node", "left")
        if n_dangling:
            dangling = (
                ranks.join(has_out, ranks.node == has_out.src, "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
            )
            joined = joined.crossJoin(F.broadcast(dangling))
            mass = mass + F.col("dm") / n_nodes
        ranks = (
            joined.select(
                "node",
                (F.lit((1.0 - damping) / n_nodes) + damping * mass).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def pagerank_exact(edges: DataFrame, damping: float = PR_DAMPING,
                   iters: int = PR_ITERS) -> DataFrame:
    """Engine-exact PageRank for small graphs (≤ ~10⁴ nodes): the same
    math as ``pagerank``, but every float reduction is an ORDERED left
    fold (``aggregate(sort_array(collect_list(...)))``), so the IEEE
    op sequence — and therefore every result bit — is reproducible by
    any engine that folds in the same order. The DuckDB oracle unrolls
    the identical folds (``list(x ORDER BY k)`` + ``list_reduce``).
    Large graphs use ``pagerank`` (order-free sums, same fixpoint up
    to summation order).

    Round-14 topology note (guide §1.2 step 1 — fix the algorithm
    before the per-task work): when the NORMALIZED edge list fits the
    ``PR_EXACT_DRIVER_EDGES`` probe (event-type transition graphs are
    |types|² rows — model-sized at ANY corpus scale), the 25-round
    fixpoint runs as a driver-side fold over that collected model
    instead of 25 Catalyst rounds. The data-sized work — deriving the
    transition matrix — stays distributed; the iteration moves to
    where a vocabulary-sized model iteration belongs (the
    ml_train_logreg sync-SGD precedent: per-round driver traffic is
    O(model), never O(data)). Python floats ARE IEEE doubles and the
    fold replays the identical op order (terms sorted by src in UTF-8
    binary order = ``sort_array``'s struct order; dangling fold by
    node; teleport + damping·(c + dm/n)), so every bit — and the
    unrolled-CTE oracle hash — is unchanged. Measured 4.8 s → 1.0 s
    on event_pagerank at sf0.1/local[32] (was ~20 driver-coordinated
    jobs of ~10 ms execution each, i.e. pure per-round plan/submit
    latency). Bigger-than-probe graphs take the distributed loop
    below, bit-for-bit as before."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    norm_plan = edges.join(out_w, "src").select(
        "src", "dst", (F.col("weight") / F.col("out_w")).alias("p")
    )
    probe = norm_plan.limit(PR_EXACT_DRIVER_EDGES + 1).collect()
    if len(probe) <= PR_EXACT_DRIVER_EDGES:
        node_rows = nodes.collect()
        if len(node_rows) > PR_EXACT_MAX_NODES:
            raise ValueError(
                f"pagerank_exact: {len(node_rows)} nodes exceeds the "
                f"exact-tier cap of {PR_EXACT_MAX_NODES}; use pagerank() "
                "(order-free sums) for large graphs"
            )
        ranks = _pagerank_driver_fold(
            probe, [r.node for r in node_rows], damping, iters
        )
        spark = edges.sparkSession
        out_type = nodes.schema["node"].dataType.simpleString()
        # one explicit slice: bare createDataFrame pickles the local
        # rows into defaultParallelism partitions (32 Python-worker
        # spin-ups per downstream job for a vocabulary-sized table,
        # measured 0.87 s/write vs 0.28 s; and NEVER coalesce(1) such
        # an RDD — one task then pays all 32 worker handshakes
        # serially, measured 9 s)
        return spark.createDataFrame(
            spark.sparkContext.parallelize(
                sorted(ranks.items(), key=lambda kv: _pr_sort_key(kv[0])), 1
            ),
            f"node {out_type}, rank double",
        )
    nodes = nodes.localCheckpoint(eager=True)
    n_nodes = nodes.count()
    if n_nodes > PR_EXACT_MAX_NODES:
        raise ValueError(
            f"pagerank_exact: {n_nodes} nodes exceeds the exact-tier cap of "
            f"{PR_EXACT_MAX_NODES}; use pagerank() (order-free sums) for "
            "large graphs"
        )
    norm = norm_plan.localCheckpoint(eager=True)
    has_out = norm.select("src").distinct().localCheckpoint(eager=True)
    # same dangling-free fast path as `pagerank`: dm = 0.0 every round
    # on a graph with no out-edge-less nodes, and + 0.0 is IEEE-exact,
    # so skipping the per-round ordered dangling fold is bit-identical
    n_dangling = nodes.join(has_out, nodes.node == has_out.src, "left_anti").count()
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    teleport = F.lit((1.0 - damping) / n_nodes)

    def _same_bits(a: DataFrame, b: DataFrame) -> bool:
        """True iff two checkpointed rank vectors are bitwise equal
        (double ==, every node) — a cheap join of two tiny cached
        frames."""
        return (
            a.join(b.select("node", F.col("rank").alias("prev_rank")), "node")
            .filter(F.col("rank") != F.col("prev_rank"))
            .limit(1)
            .count()
        ) == 0

    # Convergence early-exit (measured, not assumed): in exact-fold
    # arithmetic the event graphs settle fast — sf0.01 reaches a
    # BIT-EXACT fixpoint (~round 13), sf0.1 a 1-ulp period-2 limit
    # cycle (from round 7). Both let us stop early and still return
    # the *identical bits* the full `iters` unroll (and the unrolled-
    # CTE oracle) produces: a fixpoint makes remaining rounds exact
    # no-ops, and for a period-2 cycle r_m = r_{w + (m-w) % 2}, so we
    # return the vector whose PHASE matches round `iters`. Probe
    # windows are three CONSECUTIVE checkpointed rounds starting at
    # 10/15/20 — the two extra checkpoints per window have 1-round
    # lineage, so probing is near-free; longer cycles or graphs that
    # never settle just run all rounds as before.
    probe_starts = tuple(w for w in (10, 15, 20) if w + 2 < iters)
    window: dict[int, DataFrame] = {}
    for it in range(iters):
        contribs = (
            norm.join(ranks, norm.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                F.struct(F.col("src"), (F.col("p") * F.col("rank")).alias("term")).alias("st"),
            )
            .groupBy("node")
            .agg(
                F.aggregate(
                    F.sort_array(F.collect_list("st")),
                    F.lit(0.0),
                    lambda a, x: a + x["term"],
                ).alias("c")
            )
        )
        mass = F.coalesce(F.col("c"), F.lit(0.0))
        joined = nodes.join(contribs, "node", "left")
        if n_dangling:
            dangling = (
                ranks.join(has_out, ranks.node == has_out.src, "left_anti")
                .agg(
                    F.aggregate(
                        F.sort_array(F.collect_list(F.struct("node", "rank"))),
                        F.lit(0.0),
                        lambda a, x: a + x["rank"],
                    ).alias("dm")
                )
            )
            joined = joined.crossJoin(F.broadcast(dangling))
            mass = mass + F.col("dm") / F.lit(float(n_nodes))
        ranks = joined.select(
            "node",
            (teleport + F.lit(damping) * mass).alias("rank"),
        )
        # checkpoint every 5th round, not every round: 25 eager
        # materializations dominate wall time on a small graph, while
        # an unbounded plan (no checkpoints at all) explodes Catalyst
        # past ~15 rounds. Measured 1.7x faster than per-round at
        # sf0.1; identical bits (checkpointing never changes values).
        nxt = it + 1
        in_window = any(w <= nxt <= w + 2 for w in probe_starts)
        if nxt < iters and (nxt % 5 == 0 or in_window):
            ranks = ranks.localCheckpoint(eager=True)
        if in_window:
            window[nxt] = ranks
            w0 = next(w for w in probe_starts if w <= nxt <= w + 2)
            if nxt == w0 + 2:
                if _same_bits(window[w0 + 1], window[w0]):
                    ranks = window[w0 + 1]  # fixpoint: all later rounds equal
                    break
                if _same_bits(window[w0 + 2], window[w0]):
                    # period-2 limit cycle: r_iters carries the phase
                    # of w0 + (iters - w0) % 2
                    ranks = window[w0 + ((iters - w0) % 2)]
                    break
                window.clear()
    return ranks


def _pagerank_oracle(iters: int = PR_ITERS) -> str:
    """Unrolled-CTE DuckDB twin of ``pagerank_exact`` over the event
    transition graph: every per-iteration reduction is an ordered
    ``list_reduce`` left fold matching Spark's
    ``aggregate(sort_array(...))``, so 25 iterations of double
    arithmetic land on identical bits."""
    fold = "list_reduce(list_prepend(CAST(0 AS DOUBLE), {lst}), (a, b) -> a + b)"
    parts = [f"""
WITH tr AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_ns(ts), event_id) AS next_type
  FROM events
), edges0 AS MATERIALIZED (
  SELECT event_type AS src, next_type AS dst,
         CAST(COUNT(*) AS DOUBLE) AS weight
  FROM tr WHERE next_type IS NOT NULL GROUP BY 1, 2
), outw AS (
  SELECT src, CAST(SUM(weight) AS DOUBLE) AS out_w FROM edges0 GROUP BY src
), edges AS MATERIALIZED (
  SELECT e.src, e.dst, e.weight / o.out_w AS p FROM edges0 e JOIN outw o USING (src)
), nodes AS MATERIALIZED (
  SELECT src AS node FROM edges0 UNION SELECT dst FROM edges0
), nn AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes
), r0 AS MATERIALIZED (
  SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM nodes
)"""]
    for k in range(1, iters + 1):
        c_fold = fold.format(lst="list(e.p * r.rank ORDER BY e.src)")
        d_fold = fold.format(lst="list(r.rank ORDER BY r.node)")
        parts.append(f""", c{k} AS MATERIALIZED (
  SELECT e.dst AS node, {c_fold} AS c
  FROM edges e JOIN r{k-1} r ON e.src = r.node
  GROUP BY e.dst
), d{k} AS MATERIALIZED (
  SELECT COALESCE({d_fold}, CAST(0 AS DOUBLE)) AS dm
  FROM r{k-1} r LEFT JOIN (SELECT DISTINCT src FROM edges) s ON r.node = s.src
  WHERE s.src IS NULL
), r{k} AS MATERIALIZED (
  SELECT n.node,
         -- CAST to DOUBLE first: DuckDB parses 0.85 as DECIMAL, and
         -- 1 - DECIMAL'0.85' is exact 0.15 — a different double than
         -- IEEE 1.0-0.85, which Spark (and Python) compute
         (CAST(1 AS DOUBLE) - CAST({PR_DAMPING} AS DOUBLE)) / (SELECT n FROM nn)
         + CAST({PR_DAMPING} AS DOUBLE)
           * (COALESCE(c.c, CAST(0 AS DOUBLE))
              + (SELECT dm FROM d{k}) / (SELECT n FROM nn)) AS rank
  FROM nodes n LEFT JOIN c{k} c ON n.node = c.node
)""")
    parts.append(f"""
SELECT node, floor(rank * 1000000 + 0.5) / 1000000 AS rank
FROM r{iters} ORDER BY rank DESC, node""")
    return "".join(parts)


@register("event_pagerank", oracle=_pagerank_oracle())
def event_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event-type transition graph (edges = per-user
    consecutive event pairs, weighted by transition count).

    The graph derivation is the transition-matrix shape (one user_id
    window shuffle, then a |types|² aggregate); the rank loop is
    ``pagerank_exact`` — ordered-fold reductions over this small node
    set (event types), bit-reproducible by the unrolled-CTE DuckDB
    oracle, so the key is value-hash-verified rather than rows-only.
    The generic order-free ``pagerank`` is the large-graph tier; both
    are pinned against a dense numpy power iteration in
    tests/test_pagerank.py. Ranks are pround-ed and totally ordered so
    output is stable run to run."""
    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    edges = (
        e.select("user_id", "event_type",
                 F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("next_type").alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    ranks = pagerank_exact(edges)
    return ranks.select(
        "node", pround(F.col("rank"), 6).alias("rank")
    ).orderBy(F.desc("rank"), "node")


@register(
    "interval_merge_coverage",
    # pure integer arithmetic end-to-end (µs epochs, floor'd durations)
    # so the island assignment and coverage sums are engine-exact
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS s,
             epoch_us(ts) + CAST(FLOOR(value * 60) AS BIGINT) * 1000000 AS e
      FROM events),
    flagged AS (
      SELECT user_id, event_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv),
    islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
      FROM flagged)
    SELECT user_id,
           CAST(SUM(n_in_island) AS BIGINT) AS n_intervals,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(island_span) AS BIGINT) AS covered_us
    FROM (
      SELECT user_id, island_id,
             COUNT(*) AS n_in_island,
             MAX(e) - MIN(s) AS island_span
      FROM islands GROUP BY user_id, island_id
    ) per_island
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def interval_merge_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping per-user intervals (event start + value-derived
    duration) and report interval count, merged-island count, and total
    covered microseconds — the gaps-and-islands shape behind ad-break
    coverage, on-call overlap, and machine-utilization queries.

    Scale: two windows + two aggregates, ALL partitioned by user_id —
    one shuffle total (every later stage reuses the user partitioning).
    State per task is a running max, never the user's full history.
    Touching intervals (start == prev end) merge, matching the closed-
    interval convention; integer µs arithmetic keeps both engines
    bit-equal with no rounding step.
    """
    e = load_tables(spark, sf_dir)["events"]
    iv = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + F.floor(F.col("value") * 60).cast("bigint") * F.lit(1000000)
        ).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "event_id",
        "s",
        "e",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)), 1
        ).otherwise(0).alias("new_island"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.select(
        "user_id", "s", "e", F.sum("new_island").over(w_run).alias("island_id")
    )
    per_island = islands.groupBy("user_id", "island_id").agg(
        F.count(F.lit(1)).alias("n_in_island"),
        (F.max("e") - F.min("s")).alias("island_span"),
    )
    return (
        per_island.groupBy("user_id")
        .agg(
            F.sum("n_in_island").alias("n_intervals"),
            F.count(F.lit(1)).alias("n_islands"),
            F.sum("island_span").alias("covered_us"),
        )
        .orderBy("user_id")
    )


@register(
    "time_weighted_avg",
    # value is floored to integer cents (exact both engines), weights
    # are integer µs gaps, so the weighted sum is an exact decimal —
    # the only doubles are two final identical-operand divisions
    oracle="""
    WITH seq AS (
      SELECT user_id, value, epoch_us(ts) AS t,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id) AS t_next
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(t_next - t) AS BIGINT) AS span_us,
           floor(CAST(CAST(SUM(CAST(FLOOR(value * 100) AS DECIMAL(38,0))
                                * (t_next - t)) AS DOUBLE) / 100
                      / CAST(SUM(t_next - t) AS DOUBLE) AS DOUBLE)
                 * 10000 + 0.5) / 10000 AS twap
    FROM seq WHERE t_next IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of `value` (TWAP): each reading
    is weighted by how long it was current (gap to the next event).
    The sensor-data / position-marking workhorse a plain AVG gets
    wrong whenever sampling is irregular.

    Scale: one shuffle on user_id for the lead() window, then a hash
    aggregate on the same partitioning — the second stage is
    shuffle-free. State is one row of lookahead, never a history.
    """
    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    seq = e.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("t"),
        "event_id",
    ).withColumn("t_next", F.lead("t").over(w))
    dt = F.col("t_next") - F.col("t")
    cents = F.floor(F.col("value") * 100).cast("decimal(38,0)")
    return (
        seq.filter(F.col("t_next").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(dt).alias("span_us"),
            pround(
                (F.sum(cents * dt).cast("double") / F.lit(100))
                / F.sum(dt).cast("double")
            ).alias("twap"),
        )
        .orderBy("user_id")
    )


@register(
    "time_ewma",
    # Dyadic EWMA: alpha = 1/2 makes every weight a power of two, so
    # the weighted sum is EXACT BIGINT arithmetic (value on the 1e-4
    # grid x 2^(16-rn), max ~2.6e12 << 2^53) and the only float ops
    # are two identically-written IEEE divisions at the end. pow()/
    # exp() never appear — this is the EWMA you can hash-check across
    # engines, and the recursive form s_t = (x_t + s_{t-1})/2 an
    # incremental/streaming engine would run matches it bit-for-bit.
    oracle="""
    WITH r AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
      FROM events
    ),
    k AS (
      SELECT user_id,
             CAST(floor(value * 10000 + 0.5) AS BIGINT)
               * (CAST(1 AS BIGINT) << (16 - rn)) AS term,
             rn
      FROM r WHERE rn <= 16
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_used,
           floor(((CAST(SUM(term) AS DOUBLE)
                   / (65536 - (CAST(1 AS BIGINT) << (16 - COUNT(*)))))
                  / 10000.0) * 1000000 + 0.5) / 1000000 AS ewma
    FROM k GROUP BY user_id
    """,
)
def time_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of `value` over
    the 16 most recent events (alpha = 1/2, weights renormalized to
    the observed count) — the time-series smoothing primitive every
    metrics/hypertable engine ships.

    Scale shape: one shuffle on user_id serves both the recency
    row_number and the grouped fold (same key — the sort is in-
    partition). The 16-row cap bounds per-user state, so the
    aggregate input is at most 16x|users| rows regardless of event
    volume; on a real cluster the window + filter pipeline into one
    stage with no second exchange.
    """
    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_ns").desc(), F.col("event_id").desc()
    )
    k = (
        e.select("user_id", "value", "ts_ns", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 16)
        .select(
            "user_id",
            (
                F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
                * F.expr("CAST(1 AS BIGINT) << (16 - rn)")
            ).alias("term"),
        )
    )
    return k.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_used"),
        pround(
            (
                F.sum("term").cast("double")
                / (F.lit(65536) - F.expr("CAST(1 AS BIGINT) << (16 - COUNT(*))"))
            )
            / F.lit(10000.0),
            6,
        ).alias("ewma"),
    )


@register(
    "event_anomaly_mad",
    # Robust (median/MAD) outlier gate. Exactness recipe: values on
    # the cent grid are BIGINTs; an exact median of integers is
    # integer-or-half (linear interpolation at p=0.5), so doubling
    # both sides keeps every deviation |2v - 2*med| an exact BIGINT,
    # and the second median (the MAD) lands on the same half-grid.
    # Spark's percentile() and DuckDB's quantile_cont() share the
    # p*(n-1) interpolation rule, so both medians agree bit-for-bit.
    # The only free-form float op is the single threshold multiply,
    # written identically on both engines.
    oracle="""
    WITH e AS (
      SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events
    ),
    med AS (
      SELECT event_type, quantile_cont(vc, 0.5) AS med_c FROM e GROUP BY event_type
    ),
    d AS (
      SELECT e.event_type, e.vc, med.med_c,
             abs(e.vc * 2 - CAST(med.med_c * 2 AS BIGINT)) AS d2
      FROM e JOIN med USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(d2, 0.5) AS mad2 FROM d GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           floor((MIN(d.med_c) / 100) * 1000000 + 0.5) / 1000000 AS median_v,
           floor(((MIN(mad.mad2) / 2) / 100) * 1000000 + 0.5) / 1000000 AS mad_v,
           CAST(SUM(CASE WHEN CAST(d.d2 AS DOUBLE) > 5.1891 * mad.mad2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM d JOIN mad USING (event_type)
    GROUP BY d.event_type
    """,
)
def event_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier detection per event type —
    the robust twin of event_anomaly_zscore (immune to the outliers
    it is hunting, unlike mean/stddev).

    Threshold: |v - median| > 3.5 x 1.4826 x MAD (= 5.1891xMAD), the
    standard robust-z cut at 3.5 sigma-equivalents.

    Scale shape: two exact-median aggregates over the (event_type)
    key — ~|types| groups, so the medians are per-group sorts that
    AQE splits on skew — then broadcast joins of the tiny per-type
    stats back onto events. At larger group cardinality the swap is
    approx_percentile partials; here exactness is the point (the
    oracle replays the same grid medians).
    """
    e = load_tables(spark, sf_dir)["events"].select(
        "event_type", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("vc")
    )
    med = e.groupBy("event_type").agg(F.percentile("vc", F.lit(0.5)).alias("med_c"))
    d = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "vc",
        "med_c",
        F.abs(F.col("vc") * 2 - (F.col("med_c") * 2).cast("long")).alias("d2"),
    )
    mad = d.groupBy("event_type").agg(F.percentile("d2", F.lit(0.5)).alias("mad2"))
    return (
        d.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            pround(F.min("med_c") / F.lit(100), 6).alias("median_v"),
            pround((F.min("mad2") / F.lit(2)) / F.lit(100), 6).alias("mad_v"),
            F.sum(
                F.when(
                    F.col("d2").cast("double") > F.lit(5.1891) * F.col("mad2"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


@register(
    "event_rfm_scores",
    # RFM on exact grids: recency in whole hours (integer ns DIV),
    # frequency a count, monetary in cents (BIGINT) — ntile(5) under
    # total orders (metric, user_id) is engine-deterministic, so the
    # whole segmentation hash-matches with zero float ops.
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MAX(epoch_ns(ts)) AS last_ns,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS m_cents
      FROM events GROUP BY user_id
    ),
    mx AS (SELECT MAX(last_ns) AS corpus_ns FROM per_user),
    rfm AS (
      SELECT user_id,
             (mx.corpus_ns - last_ns) // 3600000000000 AS recency_hours,
             frequency, m_cents
      FROM per_user, mx
    )
    SELECT user_id, recency_hours, frequency, m_cents,
           ntile(5) OVER (ORDER BY recency_hours, user_id) AS r_score,
           ntile(5) OVER (ORDER BY frequency DESC, user_id) AS f_score,
           ntile(5) OVER (ORDER BY m_cents DESC, user_id) AS m_score,
           CAST(ntile(5) OVER (ORDER BY recency_hours, user_id) AS VARCHAR)
             || CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS VARCHAR)
             || CAST(ntile(5) OVER (ORDER BY m_cents DESC, user_id) AS VARCHAR)
             AS segment
    FROM rfm
    """,
)
def event_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-user Recency (hours since last
    event), Frequency (event count), Monetary (cent-exact value sum),
    each quintile-scored (1 = best) and concatenated into the classic
    three-digit segment label.

    Scale shape: one user_id hash aggregate collapses events to the
    user grain; the three ntile windows then run over |users| rows,
    not events. A global ntile needs a total sort — at 100 TB the
    swap is approx_percentile quintile EDGES broadcast as a range
    lookup (feature_quantile_bins documents the same trade); exact
    ntile here is what grounds that sketch.
    """
    e = load_tables(spark, sf_dir)["events"]
    per_user = e.groupBy("user_id").agg(
        F.max("ts_ns").alias("last_ns"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "m_cents"
        ),
    )
    mx = per_user.agg(F.max("last_ns").alias("corpus_ns"))
    rfm = per_user.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.expr("(corpus_ns - last_ns) DIV 3600000000000").alias("recency_hours"),
        "frequency",
        "m_cents",
    )
    wr = Window.orderBy("recency_hours", "user_id")
    wf = Window.orderBy(F.col("frequency").desc(), "user_id")
    wm = Window.orderBy(F.col("m_cents").desc(), "user_id")
    scored = rfm.select(
        "user_id",
        "recency_hours",
        "frequency",
        "m_cents",
        F.ntile(5).over(wr).alias("r_score"),
        F.ntile(5).over(wf).alias("f_score"),
        F.ntile(5).over(wm).alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


@register(
    "event_cooccurrence_pmi",
    # PMI over exact integer counts: the only float ops are one
    # division of exact BIGINTs and one ln(), grid-floored at 1e-6
    # (the text_unigram_logprob recipe for libm-vs-JVM ulp drift).
    oracle="""
    WITH ctx AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
      FROM events
    ),
    n_ctx AS (
      SELECT COUNT(*) AS n FROM (SELECT DISTINCT user_id, day FROM ctx)
    ),
    marg AS (
      SELECT event_type, COUNT(*) AS n_t FROM ctx GROUP BY event_type
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_ab
      FROM ctx a JOIN ctx b
        ON a.user_id = b.user_id AND a.day = b.day
       AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b,
           CAST(p.n_ab AS BIGINT) AS n_ab,
           CAST(ma.n_t AS BIGINT) AS n_a,
           CAST(mb.n_t AS BIGINT) AS n_b,
           CAST(n_ctx.n AS BIGINT) AS n_ctx,
           floor(ln((CAST(p.n_ab AS DOUBLE) * n_ctx.n)
                    / (CAST(ma.n_t AS DOUBLE) * mb.n_t)) * 1000000)
             / 1000000 AS pmi
    FROM pairs p
    JOIN marg ma ON ma.event_type = p.type_a
    JOIN marg mb ON mb.event_type = p.type_b
    CROSS JOIN n_ctx
    """,
)
def event_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of event-type pairs co-occurring
    in the same (user, day) context — the association-mining measure
    that corrects raw co-occurrence for marginal popularity (the
    basket-lift key's information-theoretic twin; PMI = ln(lift)).

    Scale shape: contexts dedupe on one (user, day) shuffle; the pair
    self-join is bounded by |types|² per context; margins and the
    context count are broadcast-size. Output grain is |types|² rows
    regardless of event volume.
    """
    e = load_tables(spark, sf_dir)["events"]
    ctx = e.select(
        "user_id", F.col("ts").cast("date").alias("day"), "event_type"
    ).distinct()
    n_ctx = ctx.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    marg = ctx.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    a, b = ctx.alias("a"), ctx.alias("b")
    pairs = (
        a.join(b, ["user_id", "day"])
        .where(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    return (
        pairs.join(
            F.broadcast(marg.withColumnsRenamed({"event_type": "type_a", "n_t": "n_a"})),
            "type_a",
        )
        .join(
            F.broadcast(marg.withColumnsRenamed({"event_type": "type_b", "n_t": "n_b"})),
            "type_b",
        )
        .crossJoin(F.broadcast(n_ctx))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            "n_a",
            "n_b",
            F.col("n").alias("n_ctx"),
            (
                F.floor(
                    F.log(
                        (F.col("n_ab").cast("double") * F.col("n"))
                        / (F.col("n_a").cast("double") * F.col("n_b"))
                    )
                    * 1_000_000
                )
                / 1_000_000
            ).alias("pmi"),
        )
    )


@register(
    "event_active_streaks",
    # Gaps-and-islands on integer day numbers: dayno - row_number is
    # constant exactly within a consecutive run. Pure integer
    # arithmetic end to end.
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '1995-01-01', CAST(ts AS DATE)) AS dayno
      FROM events
    ),
    g AS (
      SELECT user_id, dayno,
             dayno - row_number() OVER (PARTITION BY user_id ORDER BY dayno)
               AS grp
      FROM d
    ),
    runs AS (
      SELECT user_id, grp, COUNT(*) AS run_len
      FROM g GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(SUM(run_len) AS BIGINT) AS n_active_days,
           CAST(MAX(run_len) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM runs GROUP BY user_id
    """,
)
def event_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user (plus total
    active days and streak count) — the engagement metric every
    product-analytics engine ships, as one gaps-and-islands pass.

    Scale shape: one user_id shuffle serves the distinct, the
    row_number, and both rollups (same key throughout — no second
    exchange). Per-user state is bounded by distinct active days,
    not events.
    """
    e = load_tables(spark, sf_dir)["events"]
    d = e.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "dayno"
        ),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("dayno")
    g = d.withColumn("grp", F.col("dayno") - F.row_number().over(w))
    runs = g.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("run_len"))
    return runs.groupBy("user_id").agg(
        F.sum("run_len").cast("long").alias("n_active_days"),
        F.max("run_len").cast("long").alias("longest_streak"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
    )


N_LTTB_BUCKETS = 24


@register(
    "time_lttb_downsample",
    # Largest-Triangle-Three-Buckets, mean-anchor (parallel) variant:
    # per bucket keep the point with the largest triangle area against
    # the NEIGHBOR BUCKET MEANS (true LTTB anchors on the previously
    # selected point, which is inherently sequential; the mean-anchor
    # form is the standard distributed approximation). Determinism:
    # x (epoch day) and y (cents) are exact BIGINTs, bucket sums are
    # exact, the area is ONE fixed-parenthesization double expression
    # of those integers (bit-identical both engines), and the argmax
    # breaks ties on (ts, id).
    oracle=f"""
    WITH pts AS (
      SELECT event_type,
             epoch_ns(ts) // 86400000000000 AS xd,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS yc,
             epoch_ns(ts) AS tns, event_id,
             ntile({N_LTTB_BUCKETS}) OVER (PARTITION BY event_type
                                ORDER BY epoch_ns(ts), event_id) AS bk
      FROM events
    ),
    bstat AS (
      SELECT event_type, bk, COUNT(*) AS n,
             SUM(xd) AS sx, SUM(yc) AS sy
      FROM pts GROUP BY event_type, bk
    ),
    anch AS (
      SELECT event_type, bk, n,
             lag(n)  OVER w AS np, lag(sx)  OVER w AS sxp, lag(sy)  OVER w AS syp,
             lead(n) OVER w AS nc, lead(sx) OVER w AS sxc, lead(sy) OVER w AS syc
      FROM bstat
      WINDOW w AS (PARTITION BY event_type ORDER BY bk)
    ),
    scored AS (
      SELECT p.event_type, p.bk, p.xd, p.yc, p.tns, p.event_id, a.n,
             abs( (CAST(a.sxp AS DOUBLE) / a.np)
                    * (CAST(p.yc AS DOUBLE) - CAST(a.syc AS DOUBLE) / a.nc)
                + CAST(p.xd AS DOUBLE)
                    * (CAST(a.syc AS DOUBLE) / a.nc - CAST(a.syp AS DOUBLE) / a.np)
                + (CAST(a.sxc AS DOUBLE) / a.nc)
                    * (CAST(a.syp AS DOUBLE) / a.np - CAST(p.yc AS DOUBLE)) )
               AS area2,
             row_number() OVER (PARTITION BY p.event_type, p.bk
                                ORDER BY p.tns, p.event_id) AS rn_a,
             row_number() OVER (PARTITION BY p.event_type, p.bk
                                ORDER BY p.tns DESC, p.event_id DESC) AS rn_d
      FROM pts p JOIN anch a ON a.event_type = p.event_type AND a.bk = p.bk
    )
    SELECT event_type, bk, xd, yc, CAST(n AS BIGINT) AS bucket_n
    FROM (
      SELECT event_type, bk, xd, yc, n,
             row_number() OVER (
               PARTITION BY event_type, bk
               ORDER BY CASE WHEN bk = 1 THEN -rn_a
                             WHEN bk = {N_LTTB_BUCKETS} THEN -rn_d
                             ELSE area2 END DESC,
                        tns, event_id) AS pick
      FROM scored
    ) WHERE pick = 1
    """,
)
def time_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visually-lossless time-series downsampling (LTTB, mean-anchor
    variant): each per-type series reduces to 24 representative
    points — the hypertable/dashboard operator that keeps peaks and
    inflections a naive every-k-th sample destroys. First and last
    points are kept verbatim (classic LTTB endpoints).

    Scale shape: one (event_type) shuffle for the global ntile
    bucketing, one (type, bucket) aggregate for anchors (24 rows per
    type), broadcast-size lag/lead, then a per-bucket argmax window.
    Output is buckets x types regardless of input volume. The global
    per-type ntile is the honest exact tier; at 100 TB bucket by
    fixed TIME ranges instead (pure map-side) — same downstream plan.
    """
    e = load_tables(spark, sf_dir)["events"]
    pts = e.select(
        "event_type",
        F.expr("ts_ns DIV 86400000000000").alias("xd"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("yc"),
        F.col("ts_ns").alias("tns"),
        "event_id",
    ).withColumn(
        "bk",
        F.ntile(N_LTTB_BUCKETS).over(
            Window.partitionBy("event_type").orderBy("tns", "event_id")
        ),
    )
    bstat = pts.groupBy("event_type", "bk").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xd").alias("sx"),
        F.sum("yc").alias("sy"),
    )
    wb = Window.partitionBy("event_type").orderBy("bk")
    anch = bstat.select(
        "event_type",
        "bk",
        "n",
        F.lag("n").over(wb).alias("np"),
        F.lag("sx").over(wb).alias("sxp"),
        F.lag("sy").over(wb).alias("syp"),
        F.lead("n").over(wb).alias("nc"),
        F.lead("sx").over(wb).alias("sxc"),
        F.lead("sy").over(wb).alias("syc"),
    )
    p = pts.join(F.broadcast(anch), ["event_type", "bk"])
    ax = F.col("sxp").cast("double") / F.col("np")
    ay = F.col("syp").cast("double") / F.col("np")
    cx = F.col("sxc").cast("double") / F.col("nc")
    cy = F.col("syc").cast("double") / F.col("nc")
    bx, by = F.col("xd").cast("double"), F.col("yc").cast("double")
    area2 = F.abs(ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    wkey = Window.partitionBy("event_type", "bk")
    scored = p.select(
        "event_type", "bk", "xd", "yc", "tns", "event_id", "n",
        area2.alias("area2"),
        F.row_number().over(wkey.orderBy("tns", "event_id")).alias("rn_a"),
        F.row_number()
        .over(wkey.orderBy(F.col("tns").desc(), F.col("event_id").desc()))
        .alias("rn_d"),
    )
    pick_key = (
        F.when(F.col("bk") == 1, -F.col("rn_a").cast("double"))
        .when(F.col("bk") == N_LTTB_BUCKETS, -F.col("rn_d").cast("double"))
        .otherwise(F.col("area2"))
    )
    wpick = Window.partitionBy("event_type", "bk").orderBy(
        pick_key.desc(), "tns", "event_id"
    )
    return (
        scored.withColumn("pick", F.row_number().over(wpick))
        .where(F.col("pick") == 1)
        .select("event_type", "bk", "xd", "yc", F.col("n").cast("long").alias("bucket_n"))
    )


@register(
    "event_abtest_lift",
    # Variant assignment is a pure md5 function of user_id (the
    # split_hash_assign recipe), conversion counts are exact integers,
    # and rate/lift/z are ONE fixed-parenthesization double formula of
    # those integers, pround-floored — the experimentation readout you
    # can hash-check across engines.
    oracle="""
    WITH u AS (
      SELECT user_id,
             CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
             CAST(MAX(CASE WHEN event_type = 'purchase' AND value >= 200
                          THEN 1 ELSE 0 END) AS BIGINT) AS converted
      FROM events GROUP BY user_id
    ),
    v AS (
      SELECT variant, COUNT(*) AS n_users, SUM(converted) AS n_conv
      FROM u GROUP BY variant
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN variant = 'A' THEN n_users END) AS n_a,
        MAX(CASE WHEN variant = 'A' THEN n_conv END) AS c_a,
        MAX(CASE WHEN variant = 'B' THEN n_users END) AS n_b,
        MAX(CASE WHEN variant = 'B' THEN n_conv END) AS c_b
      FROM v
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS c_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS c_b,
           floor((CAST(c_a AS DOUBLE) / n_a) * 1000000 + 0.5) / 1000000 AS rate_a,
           floor((CAST(c_b AS DOUBLE) / n_b) * 1000000 + 0.5) / 1000000 AS rate_b,
           floor(((CAST(c_b AS DOUBLE) / n_b) / (CAST(c_a AS DOUBLE) / n_a) - 1)
                 * 1000000 + 0.5) / 1000000 AS rel_lift,
           floor(((CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a)
                  / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                         * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                         * (1.0 / n_a + 1.0 / n_b)))
                 * 1000000 + 0.5) / 1000000 AS z_stat
    FROM wide
    """,
)
def event_abtest_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users hash-split 50/50 (md5 — stable,
    engine-independent, the same property split_hash_assign pins),
    high-value-purchase conversion (a purchase of value >= 200 —
    chosen so the rate sits mid-range; every user has SOME purchase)
    per variant, relative lift, and the pooled two-proportion z
    statistic.

    Scale shape: one user_id aggregate (converted = MAX over the
    user's events — no distinct needed), a 2-group rollup, then a
    1-row wide pivot; everything after the first aggregate is
    broadcast-size. The z formula uses only the 4 exact counts, so
    the statistics never touch row data.
    """
    e = load_tables(spark, sf_dir)["events"]
    variant = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 2
        == 0,
        "A",
    ).otherwise("B")
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 200), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("converted"),
    ).select(variant.alias("variant"), "converted")
    v = u.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("converted").alias("n_conv")
    )
    wide = v.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n_users"))).alias("n_a"),
        F.max(F.when(F.col("variant") == "A", F.col("n_conv"))).alias("c_a"),
        F.max(F.when(F.col("variant") == "B", F.col("n_users"))).alias("n_b"),
        F.max(F.when(F.col("variant") == "B", F.col("n_conv"))).alias("c_b"),
    )
    ra = F.col("c_a").cast("double") / F.col("n_a")
    rb = F.col("c_b").cast("double") / F.col("n_b")
    pooled = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (rb - ra) / F.sqrt(
        pooled
        * (F.lit(1) - pooled)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return wide.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("c_a").cast("long").alias("c_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("c_b").cast("long").alias("c_b"),
        pround(ra, 6).alias("rate_a"),
        pround(rb, 6).alias("rate_b"),
        pround(rb / ra - F.lit(1), 6).alias("rel_lift"),
        pround(z, 6).alias("z_stat"),
    )


@register(
    "ml_eval_auc",
    # Exact AUC via the Mann-Whitney rank statistic with proper tie
    # handling: doubled average ranks (2r + c - 1 for a tie group of
    # size c at min-rank r) keep everything integer until ONE final
    # division. Labels/scores are exact cent-grid integers; the
    # threshold metrics are single IEEE divisions of exact counts.
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'click'
                           THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS score,
             CAST(MAX(CASE WHEN event_type = 'purchase' AND value >= 200
                           THEN 1 ELSE 0 END) AS BIGINT) AS label
      FROM events GROUP BY user_id
    ),
    r AS (
      SELECT user_id, score, label,
             rank() OVER (ORDER BY score) AS rk,
             COUNT(*) OVER (PARTITION BY score) AS c
      FROM u
    ),
    agg AS (
      SELECT CAST(SUM(label) AS BIGINT) AS n_pos,
             CAST(COUNT(*) - SUM(label) AS BIGINT) AS n_neg,
             CAST(SUM(CASE WHEN label = 1 THEN 2 * rk + c - 1 ELSE 0 END)
                  AS BIGINT) AS sum_r2_pos,
             CAST(SUM(score) AS BIGINT) AS sum_score,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM r
    ),
    thr AS (
      SELECT agg.*,
             CAST(SUM(CASE WHEN u.label = 1
                       AND CAST(u.score AS DOUBLE) > CAST(agg.sum_score AS DOUBLE) / agg.n
                       THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN u.label = 0
                       AND CAST(u.score AS DOUBLE) > CAST(agg.sum_score AS DOUBLE) / agg.n
                       THEN 1 ELSE 0 END) AS BIGINT) AS fp
      FROM u CROSS JOIN agg
      GROUP BY agg.n_pos, agg.n_neg, agg.sum_r2_pos, agg.sum_score, agg.n
    )
    SELECT n_pos, n_neg, tp, fp,
           floor((CAST(sum_r2_pos - n_pos * (n_pos + 1) AS DOUBLE)
                  / (2.0 * n_pos * n_neg)) * 1000000 + 0.5) / 1000000 AS auc,
           floor((CAST(tp AS DOUBLE) / (tp + fp)) * 1000000 + 0.5) / 1000000
             AS precision_at_mean,
           floor((CAST(tp AS DOUBLE) / n_pos) * 1000000 + 0.5) / 1000000
             AS recall_at_mean
    FROM thr
    """,
)
def ml_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation without an ML library: exact ROC-AUC via
    the Mann-Whitney rank statistic (tie-correct), plus precision and
    recall of the threshold-at-mean-score classifier. Score = a user's
    total click value (cents); label = the high-value-purchase
    conversion event_abtest_lift defines. The eval harness every
    training-data pipeline needs to grade features BEFORE training.

    Scale shape: one user aggregate, then the rank window runs on the
    aggregated user grain (|users| rows). AUC at 100 TB swaps the
    global rank for a histogram approximation (bucket scores, trapezoid
    over bucket counts) — the exact tier here grounds it.
    """
    e = load_tables(spark, sf_dir)["events"]
    u = e.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "click",
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 200), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("label"),
    )
    r = u.select(
        "user_id",
        "score",
        "label",
        F.rank().over(Window.orderBy("score")).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("score")).alias("c"),
    )
    agg = r.agg(
        F.sum("label").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("label")).cast("long").alias("n_neg"),
        F.sum(
            F.when(F.col("label") == 1, 2 * F.col("rk") + F.col("c") - 1).otherwise(0)
        )
        .cast("long")
        .alias("sum_r2_pos"),
        F.sum("score").cast("long").alias("sum_score"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    mean_score = F.col("sum_score").cast("double") / F.col("n")
    thr = (
        u.crossJoin(F.broadcast(agg))
        .groupBy("n_pos", "n_neg", "sum_r2_pos", "sum_score", "n")
        .agg(
            F.sum(
                F.when(
                    (F.col("label") == 1) & (F.col("score").cast("double") > mean_score),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("tp"),
            F.sum(
                F.when(
                    (F.col("label") == 0) & (F.col("score").cast("double") > mean_score),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("fp"),
        )
    )
    return thr.select(
        "n_pos",
        "n_neg",
        "tp",
        "fp",
        pround(
            (F.col("sum_r2_pos") - F.col("n_pos") * (F.col("n_pos") + 1)).cast("double")
            / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
        pround(F.col("tp").cast("double") / (F.col("tp") + F.col("fp")), 6).alias(
            "precision_at_mean"
        ),
        pround(F.col("tp").cast("double") / F.col("n_pos"), 6).alias("recall_at_mean"),
    )


@register(
    "event_window_funnel",
    # ClickHouse windowFunnel semantics, strict-order variant: the
    # deepest prefix of click -> view -> purchase completed within 1 h
    # of the chain's first step. Greedy earliest-chain evaluation is
    # expressible as three nested MIN aggregates over exact integer
    # nanoseconds — no per-row state machine needed.
    oracle="""
    WITH per_user AS (
      SELECT e.user_id,
             MIN(CASE WHEN event_type = 'click' THEN epoch_ns(ts) END) AS t1
      FROM events e GROUP BY user_id
    ),
    s2 AS (
      SELECT p.user_id, p.t1,
             MIN(CASE WHEN e.event_type = 'view'
                       AND epoch_ns(e.ts) > p.t1
                       AND epoch_ns(e.ts) <= p.t1 + 3600000000000
                      THEN epoch_ns(e.ts) END) AS t2
      FROM per_user p JOIN events e ON e.user_id = p.user_id
      GROUP BY p.user_id, p.t1
    ),
    s3 AS (
      SELECT s2.user_id, s2.t1, s2.t2,
             MIN(CASE WHEN e.event_type = 'purchase'
                       AND s2.t2 IS NOT NULL
                       AND epoch_ns(e.ts) > s2.t2
                       AND epoch_ns(e.ts) <= s2.t1 + 3600000000000
                      THEN epoch_ns(e.ts) END) AS t3
      FROM s2 JOIN events e ON e.user_id = s2.user_id
      GROUP BY s2.user_id, s2.t1, s2.t2
    ),
    depth AS (
      SELECT user_id,
             CASE WHEN t3 IS NOT NULL THEN 3
                  WHEN t2 IS NOT NULL THEN 2
                  WHEN t1 IS NOT NULL THEN 1
                  ELSE 0 END AS funnel_depth
      FROM s3
    )
    SELECT funnel_depth,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM depth GROUP BY funnel_depth
    """,
)
def event_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel (ClickHouse-style): how deep into the ordered
    chain click → view → purchase each user gets within 1 hour of
    their first click, reported as users per depth. Differs from
    funnel_conversion (pairwise attribution): this is ordered
    multi-step sequence matching with a single window anchored at
    step 1.

    Scale shape: the greedy earliest-chain semantics decompose into
    three user-keyed aggregates (anchor, then each next step as a
    conditional MIN over the same user partition) — every pass is
    one shuffle on user_id and the per-user state is three BIGINTs,
    which is also exactly the state a streaming evaluator would
    keep. All comparisons on exact integer nanoseconds.
    """
    e = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_type", "ts_ns"
    )
    hour = 3_600_000_000_000
    p1 = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts_ns"))).alias("t1")
    )
    s2 = (
        p1.join(e, "user_id")
        .groupBy("user_id", "t1")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "view")
                    & (F.col("ts_ns") > F.col("t1"))
                    & (F.col("ts_ns") <= F.col("t1") + hour),
                    F.col("ts_ns"),
                )
            ).alias("t2")
        )
    )
    s3 = (
        s2.join(e, "user_id")
        .groupBy("user_id", "t1", "t2")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & F.col("t2").isNotNull()
                    & (F.col("ts_ns") > F.col("t2"))
                    & (F.col("ts_ns") <= F.col("t1") + hour),
                    F.col("ts_ns"),
                )
            ).alias("t3")
        )
    )
    depth = s3.select(
        "user_id",
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
        .alias("funnel_depth"),
    )
    return depth.groupBy("funnel_depth").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


@register(
    "time_series_decompose",
    # Additive decomposition value = level + seasonal(hour) + residual.
    # Level and seasonal indices are ratios of exact cent sums (single
    # IEEE divisions); residuals are per-row chains of identical
    # deterministic double ops, squared and grid-floored at 1e-4 so
    # the variance sum is an exact BIGINT (the unigram-logprob recipe
    # for order-independent float reductions).
    oracle="""
    WITH e AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events
    ),
    lvl AS (
      SELECT event_type, CAST(SUM(vc) AS BIGINT) AS s_t,
             CAST(COUNT(*) AS BIGINT) AS n_t
      FROM e GROUP BY event_type
    ),
    seas AS (
      SELECT event_type, hod, CAST(SUM(vc) AS BIGINT) AS s_h,
             CAST(COUNT(*) AS BIGINT) AS n_h
      FROM e GROUP BY event_type, hod
    ),
    resid AS (
      SELECT e.event_type,
             SUM(CAST(floor(
               ((CAST(e.vc AS DOUBLE) / 100)
                - ((CAST(l.s_t AS DOUBLE) / l.n_t) / 100)
                - (((CAST(s.s_h AS DOUBLE) / s.n_h) / 100)
                   - ((CAST(l.s_t AS DOUBLE) / l.n_t) / 100)))
               * ((CAST(e.vc AS DOUBLE) / 100)
                - ((CAST(l.s_t AS DOUBLE) / l.n_t) / 100)
                - (((CAST(s.s_h AS DOUBLE) / s.n_h) / 100)
                   - ((CAST(l.s_t AS DOUBLE) / l.n_t) / 100)))
               * 10000) AS BIGINT)) AS ssr_g
      FROM e
      JOIN lvl l ON l.event_type = e.event_type
      JOIN seas s ON s.event_type = e.event_type AND s.hod = e.hod
      GROUP BY e.event_type
    )
    SELECT s.event_type, s.hod,
           s.n_h,
           floor(((CAST(l.s_t AS DOUBLE) / l.n_t) / 100) * 1000000 + 0.5)
             / 1000000 AS level_mean,
           floor((((CAST(s.s_h AS DOUBLE) / s.n_h) / 100)
                  - ((CAST(l.s_t AS DOUBLE) / l.n_t) / 100)) * 1000000 + 0.5)
             / 1000000 AS seasonal,
           floor(((CAST(r.ssr_g AS DOUBLE) / 10000) / l.n_t) * 1000000 + 0.5)
             / 1000000 AS resid_var
    FROM seas s
    JOIN lvl l ON l.event_type = s.event_type
    JOIN resid r ON r.event_type = s.event_type
    """,
)
def time_series_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive time-series decomposition per event type: overall
    level, hour-of-day seasonal indices (how each of the 24 hours
    deviates from the level), and residual variance after removing
    both — the classical seasonality profile behind anomaly baselines
    and forecasting features.

    Scale shape: two hash aggregates (type; type × 24 hours) whose
    results broadcast back onto the row stream for ONE residual pass
    — no window, no sort; the residual aggregate's shuffle carries
    one BIGINT per type. Output is 24×|types| regardless of volume.
    """
    e = load_tables(spark, sf_dir)["events"].select(
        "event_type",
        F.hour("ts").cast("long").alias("hod"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("vc"),
    )
    lvl = e.groupBy("event_type").agg(
        F.sum("vc").cast("long").alias("s_t"),
        F.count(F.lit(1)).cast("long").alias("n_t"),
    )
    seas = e.groupBy("event_type", "hod").agg(
        F.sum("vc").cast("long").alias("s_h"),
        F.count(F.lit(1)).cast("long").alias("n_h"),
    )
    mean_t = (F.col("s_t").cast("double") / F.col("n_t")) / 100
    mean_h = (F.col("s_h").cast("double") / F.col("n_h")) / 100
    r = (
        e.join(F.broadcast(lvl), "event_type")
        .join(F.broadcast(seas), ["event_type", "hod"])
        .select(
            "event_type",
            (
                (F.col("vc").cast("double") / 100)
                - mean_t
                - (mean_h - mean_t)
            ).alias("res"),
        )
        .select(
            "event_type",
            F.floor(F.col("res") * F.col("res") * 10000).cast("long").alias("r2g"),
        )
        .groupBy("event_type")
        .agg(F.sum("r2g").cast("long").alias("ssr_g"))
    )
    return (
        seas.join(F.broadcast(lvl), "event_type")
        .join(F.broadcast(r), "event_type")
        .select(
            "event_type",
            "hod",
            "n_h",
            pround(mean_t, 6).alias("level_mean"),
            pround(mean_h - mean_t, 6).alias("seasonal"),
            pround(
                (F.col("ssr_g").cast("double") / 10000) / F.col("n_t"), 6
            ).alias("resid_var"),
        )
    )


@register(
    "event_conversion_latency",
    # latencies are EXACT integer microseconds; quantile_cont ==
    # Spark percentile (same linear interpolation over exact ints),
    # and the mean is a single IEEE division of exact integers.
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
               AS t_signup,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               AS t_purchase
      FROM events
      GROUP BY user_id
    ), lat AS (
      SELECT user_id, t_purchase - t_signup AS latency_us
      FROM firsts
      WHERE t_signup IS NOT NULL AND t_purchase IS NOT NULL
        AND t_purchase >= t_signup
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           MIN(latency_us) AS min_us,
           CAST(floor(CAST(quantile_cont(latency_us, 0.5) AS DOUBLE) + 0.5)
                AS BIGINT) AS p50_us,
           CAST(floor(CAST(quantile_cont(latency_us, 0.9) AS DOUBLE) + 0.5)
                AS BIGINT) AS p90_us,
           MAX(latency_us) AS max_us,
           floor(CAST(CAST(SUM(latency_us) AS DOUBLE) / COUNT(*)
                 AS DOUBLE) * 10000 + 0.5) / 10000 AS mean_us
    FROM lat
    """,
)
def event_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert funnel metric: per user, latency from FIRST
    signup to FIRST subsequent purchase; overall count + min/p50/
    p90/max/mean of the latency distribution.

    Scale shape: the per-user firsts are two conditional MINs in ONE
    hash aggregate keyed on user_id (mergeable partials — the same
    state shape as event_window_funnel, 2 BIGINTs per user), then a
    single global aggregate over one row per converted user. Exact
    integer microseconds end-to-end; the only doubles are the final
    interpolated quantiles and one mean division.
    """
    e = load_tables(spark, sf_dir)["events"]
    us = F.unix_micros("ts")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", us)).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias(
            "t_purchase"
        ),
    )
    lat = firsts.where(
        F.col("t_signup").isNotNull()
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") >= F.col("t_signup"))
    ).select((F.col("t_purchase") - F.col("t_signup")).alias("latency_us"))
    return lat.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.min("latency_us").alias("min_us"),
        F.floor(F.percentile("latency_us", F.lit(0.5)) + 0.5).alias("p50_us"),
        F.floor(F.percentile("latency_us", F.lit(0.9)) + 0.5).alias("p90_us"),
        F.max("latency_us").alias("max_us"),
        pround(
            F.sum("latency_us").cast("double") / F.count(F.lit(1))
        ).alias("mean_us"),
    )


ATTR_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7-day lookback
_CREDIT_GRID = 10**6


@register(
    "attribution_linear",
    # each credit term value/n is grid-floored to 1e-6 BEFORE the sum
    # so the aggregate adds exact integers — summation order (and the
    # engines' double accumulators) can never drift the total.
    oracle=f"""
    WITH p AS (
      SELECT event_id AS pe_id, user_id, epoch_us(ts) AS p_us, value
      FROM events WHERE event_type = 'purchase'
    ), t AS (
      SELECT user_id, epoch_us(ts) AS t_us, event_type AS touch_type
      FROM events WHERE event_type IN ('click', 'view')
    ), j AS (
      SELECT p.pe_id, p.value, t.touch_type,
             COUNT(t.touch_type) OVER (PARTITION BY p.pe_id) AS n_touch
      FROM p LEFT JOIN t
        ON t.user_id = p.user_id
       AND t.t_us >= p.p_us - {ATTR_WINDOW_US} AND t.t_us < p.p_us
    )
    SELECT COALESCE(touch_type, '(none)') AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_credits,
           CAST(COUNT(DISTINCT pe_id) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(floor(value / GREATEST(n_touch, 1)
                                * {_CREDIT_GRID}) AS BIGINT)) AS DOUBLE)
             / {_CREDIT_GRID} AS credited_value
    FROM j
    GROUP BY 1
    """,
)
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-credit) multi-touch attribution: every purchase
    splits its value equally across the user's click/view touches in
    the 7 days before it; purchases with no prior touch keep full
    credit under '(none)'.

    Completes the attribution family next to attribution_first_last:
    fractional credit is the case where float summation order would
    normally bite, so each value/n term is floored onto the 1e-6
    grid and summed as exact integers.

    Scale shape: the touch lookup is an equi-join on user_id with a
    band predicate — one shuffle on user_id, per-user nested loop
    bounded by that user's event count (AQE skew-splittable). The
    per-purchase touch count reuses a pe_id window; final rollup is
    a 3-group aggregate. At 100 TB the 7-day band would additionally
    bucket by day to prune the join (join_interval_bucketed's
    pattern); the per-user band join is the correct exact tier.
    """
    e = load_tables(spark, sf_dir)["events"]
    us = F.unix_micros("ts")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pe_id"),
        F.col("user_id").alias("p_user"),
        us.alias("p_us"),
        "value",
    )
    t = e.where(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        us.alias("t_us"),
        F.col("event_type").alias("touch_type"),
    )
    j = p.join(
        t,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("t_us") >= F.col("p_us") - ATTR_WINDOW_US)
        & (F.col("t_us") < F.col("p_us")),
        "left",
    ).select(
        "pe_id",
        "value",
        "touch_type",
        F.count("touch_type")
        .over(Window.partitionBy("pe_id"))
        .alias("n_touch"),
    )
    credit_grid = F.floor(
        F.col("value") / F.greatest(F.col("n_touch"), F.lit(1)) * _CREDIT_GRID
    ).cast("long")
    return (
        j.groupBy(F.coalesce("touch_type", F.lit("(none)")).alias("touch_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_credits"),
            F.countDistinct("pe_id").cast("bigint").alias("n_purchases"),
            (F.sum(credit_grid).cast("double") / _CREDIT_GRID).alias(
                "credited_value"
            ),
        )
    )


_KM_GRID = 10**6  # per-term ln grid (see text_unigram_logprob)
_DAY_US = 86_400_000_000


@register(
    "event_survival_km",
    # Kaplan-Meier over exact integer day durations. The survival
    # product is computed as exp(sum(ln terms)) with each ln term
    # grid-floored to 1e-6 and summed as exact BIGINTs, so the
    # cumulative log-survival (log_s_grid) is hash-exact on both
    # engines; s_km is its exp, pround'd for display.
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS t_us,
             MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id) AS t0
      FROM events
    ), subjects AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'purchase' AND t_us >= t0
                      THEN t_us END) AS t_evt,
             MAX(t_us) AS t_last, MIN(t0) AS t0
      FROM ev WHERE t0 IS NOT NULL
      GROUP BY user_id
    ), durs AS (
      SELECT CASE WHEN t_evt IS NOT NULL THEN (t_evt - t0) // {_DAY_US}
                  ELSE (t_last - t0) // {_DAY_US} END AS t_days,
             CASE WHEN t_evt IS NOT NULL THEN 1 ELSE 0 END AS observed
      FROM subjects
    ), grid AS (
      SELECT t_days,
             CAST(SUM(observed) AS BIGINT) AS d,
             CAST(SUM(1 - observed) AS BIGINT) AS c
      FROM durs GROUP BY t_days
    ), risk AS (
      SELECT t_days, d, c,
             (SELECT COUNT(*) FROM durs)
               - COALESCE(SUM(d + c) OVER (ORDER BY t_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM grid
    ), terms AS (
      SELECT t_days, d, c, n_risk,
             CASE WHEN d < n_risk
                  THEN CAST(floor(ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                                  * {_KM_GRID}) AS BIGINT)
                  ELSE NULL END AS term_grid
      FROM risk
    )
    SELECT t_days, CAST(n_risk AS BIGINT) AS n_risk, d AS n_events,
           c AS n_censored,
           CAST(SUM(term_grid) OVER (ORDER BY t_days
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS log_s_grid,
           CASE WHEN MAX(CASE WHEN term_grid IS NULL THEN 1 ELSE 0 END)
                     OVER (ORDER BY t_days ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW) = 1
                THEN 0.0
                ELSE floor(exp(CAST(SUM(term_grid) OVER (ORDER BY t_days
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS DOUBLE) / {_KM_GRID}) * 10000 + 0.5) / 10000
                END AS s_km
    FROM terms
    WHERE d > 0
    """,
)
def event_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimate of time-to-first-purchase after
    signup, with right-censoring at each non-converting user's last
    observed event — the correct way to answer "how long until users
    convert" when many haven't yet (a plain mean over converters is
    survivorship-biased; event_conversion_latency is that biased twin,
    kept deliberately for contrast).

    Determinism: durations are exact integer days (µs DIV); the KM
    product is exp(Σ ln(1 - d/n)) with every ln term grid-floored to
    1e-6 and summed as exact integers — log_s_grid is bit-exact
    cross-engine, s_km its display-rounded exp. A d = n_risk plateau
    (everyone left converts) sets survival to exactly 0 from there on.

    Scale shape: one user_id exchange (signup-time window + subject
    aggregate share it), then all KM windows run over the DISTINCT-DAY
    grain — dozens of rows regardless of corpus size, the
    window-over-aggregated-grain discipline every analytics key here
    follows.
    """
    e = load_tables(spark, sf_dir)["events"]
    us = F.unix_micros("ts")
    w_user = Window.partitionBy("user_id")
    ev = e.select(
        "user_id",
        "event_type",
        us.alias("t_us"),
        F.min(F.when(F.col("event_type") == "signup", us))
        .over(w_user)
        .alias("t0"),
    )
    subjects = (
        ev.where(F.col("t0").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("t_us") >= F.col("t0")),
                    F.col("t_us"),
                )
            ).alias("t_evt"),
            F.max("t_us").alias("t_last"),
            F.min("t0").alias("t0"),
        )
    )
    durs = subjects.select(
        F.when(
            F.col("t_evt").isNotNull(),
            F.expr(f"(t_evt - t0) DIV {_DAY_US}"),
        )
        .otherwise(F.expr(f"(t_last - t0) DIV {_DAY_US}"))
        .alias("t_days"),
        F.when(F.col("t_evt").isNotNull(), 1).otherwise(0).alias("observed"),
    )
    grid = durs.groupBy("t_days").agg(
        F.sum("observed").cast("bigint").alias("d"),
        F.sum(1 - F.col("observed")).cast("bigint").alias("c"),
    )
    total = durs.agg(F.count(F.lit(1)).alias("n_total"))
    w_prev = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = grid.crossJoin(F.broadcast(total)).select(
        "t_days",
        "d",
        "c",
        (
            F.col("n_total")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0))
        ).alias("n_risk"),
    )
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.floor(
            F.log(1.0 - F.col("d").cast("double") / F.col("n_risk"))
            * _KM_GRID
        ).cast("bigint"),
    )
    terms = risk.select("t_days", "d", "c", "n_risk", term.alias("term_grid"))
    log_s = F.sum("term_grid").over(w_cum).cast("bigint")
    hit_zero = (
        F.max(F.when(F.col("term_grid").isNull(), 1).otherwise(0)).over(w_cum)
        == 1
    )
    return terms.where(F.col("d") > 0).select(
        "t_days",
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        log_s.alias("log_s_grid"),
        F.when(hit_zero, F.lit(0.0))
        .otherwise(pround(F.exp(log_s.cast("double") / _KM_GRID)))
        .alias("s_km"),
    )


@register(
    "interval_max_concurrency",
    # sweep-line twin of interval_merge_coverage (same value-derived
    # intervals): +1 at start, -1 at end (end-exclusive; ends sort
    # before starts at the same instant), running sum per user, max =
    # that user's peak overlap. Pure integer arithmetic throughout.
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS s,
             epoch_us(ts) + CAST(FLOOR(value * 60) AS BIGINT) * 1000000 AS e
      FROM events),
    pts AS (
      SELECT user_id, s AS t, 1 AS delta, event_id FROM iv
      UNION ALL
      SELECT user_id, e AS t, -1 AS delta, event_id FROM iv),
    swept AS (
      SELECT user_id,
             SUM(delta) OVER (PARTITION BY user_id
                              ORDER BY t, delta, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS conc
      FROM pts),
    peaks AS (
      SELECT user_id, MAX(conc) AS peak FROM swept GROUP BY user_id)
    SELECT CAST(peak AS BIGINT) AS peak_concurrency,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MIN(user_id) AS BIGINT) AS min_user,
           CAST(MAX(user_id) AS BIGINT) AS max_user
    FROM peaks
    GROUP BY peak
    """,
)
def interval_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval overlap per user by the classic sweep line:
    every interval contributes a +1 (start) and a -1 (end-exclusive)
    point; the running sum over time is the live concurrency and its
    max the user's peak. Reported as a peak-level histogram — the
    load-planning question ("how many sessions run at once?")
    interval_merge_coverage's union-length answer can't give.

    Tie discipline: at equal timestamps ends (-1) sort before starts
    (+1) via the delta sort key, so back-to-back intervals [a,b),
    [b,c) never double-count — and event_id makes the order total,
    engine-identical.

    Scale shape: the explode-to-points union doubles rows map-side;
    ONE user_id exchange drives the sweep window and the per-user
    max; the histogram is a tiny final aggregate. No global sweep is
    ever materialized — at 100 TB a global concurrency curve would
    instead bucket time per partition and prefix-sum bucket totals
    (the two-level scan pattern), which this per-key form avoids
    entirely.
    """
    e = load_tables(spark, sf_dir)["events"]
    us = F.unix_micros("ts")
    iv = e.select(
        "user_id",
        "event_id",
        us.alias("s"),
        (us + F.floor(F.col("value") * 60).cast("bigint") * 1_000_000).alias(
            "e"
        ),
    )
    pts = iv.select(
        "user_id", F.col("s").alias("t"), F.lit(1).alias("delta"), "event_id"
    ).unionAll(
        iv.select(
            "user_id",
            F.col("e").alias("t"),
            F.lit(-1).alias("delta"),
            "event_id",
        )
    )
    w_sweep = (
        Window.partitionBy("user_id")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = pts.select(
        "user_id", F.sum("delta").over(w_sweep).alias("conc")
    )
    peaks = swept.groupBy("user_id").agg(F.max("conc").alias("peak"))
    return peaks.groupBy(
        F.col("peak").cast("bigint").alias("peak_concurrency")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.min("user_id").cast("bigint").alias("min_user"),
        F.max("user_id").cast("bigint").alias("max_user"),
    )


M4_BUCKETS = 64


@register(
    "time_downsample_m4",
    # M4 (Jugel et al., VLDB'14): per (series, pixel-bucket) keep the
    # rows realizing min/max value and first/last timestamp — the
    # four extremes that make a line chart pixel-exact. All argmins
    # use total tie-break orders, bucket ids are exact integers.
    oracle=f"""
    WITH ev AS (
      SELECT event_type, event_id, epoch_ns(ts) AS tns, value
      FROM events
    ), ext AS (
      SELECT event_type, MIN(tns) AS lo, MAX(tns) AS hi
      FROM ev GROUP BY event_type
    ), bucketed AS (
      SELECT e.event_type, e.event_id, e.tns, e.value,
             CAST((e.tns - x.lo) * {M4_BUCKETS} // (x.hi - x.lo + 1)
                  AS BIGINT) AS bucket
      FROM ev e JOIN ext x ON x.event_type = e.event_type
    ), ranked AS (
      SELECT event_type, bucket, tns, value, event_id,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY value, tns, event_id) AS r_minv,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY value DESC, tns, event_id) AS r_maxv,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY tns, event_id) AS r_first,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY tns DESC, event_id DESC) AS r_last
      FROM bucketed
    )
    SELECT event_type, bucket, tns AS t_ns,
           {pround_sql("value")} AS value,
           CAST(CASE WHEN r_minv = 1 THEN 1 ELSE 0 END AS INT) AS is_min,
           CAST(CASE WHEN r_maxv = 1 THEN 1 ELSE 0 END AS INT) AS is_max,
           CAST(CASE WHEN r_first = 1 THEN 1 ELSE 0 END AS INT) AS is_first,
           CAST(CASE WHEN r_last = 1 THEN 1 ELSE 0 END AS INT) AS is_last
    FROM ranked
    WHERE r_minv = 1 OR r_maxv = 1 OR r_first = 1 OR r_last = 1
    """,
)
def time_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling: per series and per pixel bucket,
    keep exactly the rows that realize the bucket's min value, max
    value, first and last timestamp — the four points that make a
    width-W line rendering pixel-identical to the full series
    (Jugel et al., VLDB'14). The dashboarding twin of
    time_lttb_downsample: M4 is error-free for line charts, LTTB is
    perceptual.

    Scale shape: one per-series extent aggregate (broadcast back),
    exact-integer bucket assignment map-side, then four rank windows
    over the SAME (series, bucket) partitioning — one exchange. The
    output is <= 4·W·|series| rows no matter how many points came
    in; the reduction ratio GROWS with data size.
    """
    e = load_tables(spark, sf_dir)["events"]
    ev = e.select(
        "event_type", "event_id", F.col("ts_ns").alias("tns"), "value"
    )
    ext = ev.groupBy("event_type").agg(
        F.min("tns").alias("lo"), F.max("tns").alias("hi")
    )
    bucketed = ev.join(F.broadcast(ext), "event_type").select(
        "event_type",
        "event_id",
        "tns",
        "value",
        # integer DIV, not double division: (tns-lo)*64 is ~1e17 on a
        # month of nanoseconds — past 2^53, a double quotient would
        # misplace bucket boundaries
        F.expr(f"(tns - lo) * {M4_BUCKETS} DIV (hi - lo + 1)")
        .cast("bigint")
        .alias("bucket"),
    )
    p = Window.partitionBy("event_type", "bucket")
    ranked = bucketed.select(
        "event_type",
        "bucket",
        "tns",
        "value",
        F.row_number()
        .over(p.orderBy("value", "tns", "event_id"))
        .alias("r_minv"),
        F.row_number()
        .over(p.orderBy(F.col("value").desc(), "tns", "event_id"))
        .alias("r_maxv"),
        F.row_number().over(p.orderBy("tns", "event_id")).alias("r_first"),
        F.row_number()
        .over(p.orderBy(F.col("tns").desc(), F.col("event_id").desc()))
        .alias("r_last"),
    )
    keep = (
        (F.col("r_minv") == 1)
        | (F.col("r_maxv") == 1)
        | (F.col("r_first") == 1)
        | (F.col("r_last") == 1)
    )
    flag = lambda c: F.when(F.col(c) == 1, 1).otherwise(0).cast("int")  # noqa: E731
    return ranked.where(keep).select(
        "event_type",
        "bucket",
        F.col("tns").alias("t_ns"),
        pround("value").alias("value"),
        flag("r_minv").alias("is_min"),
        flag("r_maxv").alias("is_max"),
        flag("r_first").alias("is_first"),
        flag("r_last").alias("is_last"),
    )


FUNNEL_UNORDERED_WINDOW_US = 3600 * 1_000_000


@register(
    "event_funnel_unordered",
    # unordered windowFunnel: a user completes k steps if SOME anchor
    # event opens a 1 h window containing all k types (any order) —
    # three boolean MAX range-frames per anchor, max over anchors.
    oracle=f"""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS t_us,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_c,
             CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
      FROM events
      WHERE event_type IN ('click', 'view', 'purchase')
    ), anch AS (
      SELECT user_id,
             MAX(is_c) OVER w + MAX(is_v) OVER w + MAX(is_p) OVER w
               AS steps
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY t_us
                   RANGE BETWEEN CURRENT ROW
                   AND {FUNNEL_UNORDERED_WINDOW_US} FOLLOWING)
    ), per_user AS (
      SELECT user_id, MAX(steps) AS best FROM anch GROUP BY user_id
    )
    SELECT CAST(best AS BIGINT) AS steps_completed,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(user_id) AS BIGINT) AS user_checksum
    FROM per_user GROUP BY best
    """,
)
def event_funnel_unordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered window funnel: how many of {click, view, purchase}
    a user completes within SOME 1-hour window, in any order — the
    order-free twin of event_window_funnel's strict sequence (both
    exist in ClickHouse as windowFunnel modes).

    Every event anchors a forward-looking 1 h range frame; three
    boolean MAXes over that frame count the distinct step types
    present, and the per-user best anchor is the answer. No joins,
    no per-type self-join blowup: ONE user_id exchange drives the
    range window and the per-user max.
    """
    e = load_tables(spark, sf_dir)["events"]
    ev = e.where(
        F.col("event_type").isin("click", "view", "purchase")
    ).select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        (F.col("event_type") == "click").cast("int").alias("is_c"),
        (F.col("event_type") == "view").cast("int").alias("is_v"),
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rangeBetween(0, FUNNEL_UNORDERED_WINDOW_US)
    )
    anch = ev.select(
        "user_id",
        (
            F.max("is_c").over(w)
            + F.max("is_v").over(w)
            + F.max("is_p").over(w)
        ).alias("steps"),
    )
    per_user = anch.groupBy("user_id").agg(F.max("steps").alias("best"))
    return per_user.groupBy(
        F.col("best").cast("bigint").alias("steps_completed")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("user_id").cast("bigint").alias("user_checksum"),
    )


@register(
    "event_cart_abandonment",
    # 30-min-gap sessions (event_session_stats' islands), classified:
    # engaged = has click/view, converted = has purchase; abandonment
    # = engaged AND NOT converted. Daily rate from exact counts.
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTES
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), islands AS (
      SELECT user_id, ts, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ), sessions AS (
      SELECT user_id, session_id,
             CAST(date_trunc('day', MIN(ts)) AS DATE) AS day,
             MAX(CASE WHEN event_type IN ('click', 'view')
                 THEN 1 ELSE 0 END) AS engaged,
             MAX(CASE WHEN event_type = 'purchase'
                 THEN 1 ELSE 0 END) AS converted
      FROM islands GROUP BY 1, 2
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN engaged = 1 AND converted = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_abandoned,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           floor(CAST(CAST(SUM(CASE WHEN engaged = 1 AND converted = 0
                                    THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) AS DOUBLE) * 10000 + 0.5) / 10000
             AS abandonment_rate
    FROM sessions
    GROUP BY day
    """,
)
def event_cart_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level cart abandonment: sessionize (30-min gaps, the
    same islands as event_session_stats), classify each session as
    engaged (clicked/viewed) and/or converted (purchased), and roll
    the abandoned share up by day — the conversion-health metric
    product teams watch daily, derived entirely from the sessionizer
    this engine already ships.

    Scale shape: one user_id exchange (gap flag + island sum + the
    session aggregate all share it), then a day-grain rollup —
    counts are exact integers, the rate one IEEE division.
    """
    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts")
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap_us = 30 * 60 * 1_000_000
    flagged = e.select(
        "user_id",
        "ts",
        "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                >= gap_us
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    islands = flagged.select(
        "user_id",
        "ts",
        "event_type",
        F.sum("new_session").over(w_cum).alias("session_id"),
    )
    sessions = islands.groupBy("user_id", "session_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("day"),
        F.max(
            F.when(F.col("event_type").isin("click", "view"), 1).otherwise(0)
        ).alias("engaged"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    abandoned = F.when(
        (F.col("engaged") == 1) & (F.col("converted") == 0), 1
    ).otherwise(0)
    return sessions.groupBy(
        F.date_format("day", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum(abandoned).cast("bigint").alias("n_abandoned"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        pround(
            F.sum(abandoned).cast("double") / F.count(F.lit(1))
        ).alias("abandonment_rate"),
    )


@register(
    "inventory_backlog_timeline",
    # open-line backlog over time: a lineitem is OPEN from its order
    # date until its ship date. Month-grain sweep: +1 at order month,
    # -1 after ship month, cumulative sum = end-of-month backlog.
    oracle="""
    WITH li AS (
      SELECT l.l_orderkey, l.l_linenumber,
             CAST(date_trunc('month', o.o_orderdate) AS DATE) AS m_open,
             CAST(date_trunc('month', l.l_shipdate) AS DATE) AS m_ship
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ), deltas AS (
      SELECT m_open AS month, 1 AS delta FROM li
      UNION ALL
      SELECT m_ship + INTERVAL 1 MONTH, -1 FROM li
    ), monthly AS (
      SELECT CAST(month AS DATE) AS month, CAST(SUM(delta) AS BIGINT) AS d
      FROM deltas GROUP BY 1
    )
    SELECT strftime(month, '%Y-%m') AS month,
           CAST(SUM(d) OVER (ORDER BY month
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS open_lines,
           d AS net_change
    FROM monthly
    """,
)
def inventory_backlog_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-of-month open-order backlog: each lineitem is open from
    its order month through its ship month; the timeline is the
    classic event-delta sweep (+1 open, −1 after ship) cumulated
    over months — the point-in-time inventory/backlog question that
    naive per-month recounting answers with a full rescan PER MONTH,
    and this shape answers with one pass.

    Scale shape: one orderkey join (lineitem⋈orders), a month-grain
    delta aggregate (map-side combinable to |months|×2 rows), and a
    cumulative window over the TINY month grain. The sweep never
    materializes per-line intervals beyond the two delta rows.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    o = load_tables(spark, sf_dir)["orders"]
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("m_open"),
        F.add_months(
            F.date_trunc("month", "l_shipdate").cast("date"), 1
        ).alias("m_close"),
    )
    deltas = j.select(
        F.col("m_open").alias("month"), F.lit(1).alias("delta")
    ).unionAll(
        j.select(F.col("m_close").alias("month"), F.lit(-1).alias("delta"))
    )
    monthly = deltas.groupBy("month").agg(
        F.sum("delta").cast("bigint").alias("d")
    )
    w = Window.orderBy("month").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return monthly.select(
        F.date_format("month", "yyyy-MM").alias("month"),
        F.sum("d").over(w).cast("bigint").alias("open_lines"),
        F.col("d").alias("net_change"),
    )


CUSUM_C = 5  # alarm threshold in population-sigma units


@register(
    "time_changepoint_cusum",
    # CUSUM drift detection with EXACT integer arithmetic end-to-end.
    # The textbook recurrence S+_t = max(0, S+_{t-1} + y_t) has the
    # closed form S+_t = P_t - min(0, min_{j<=t} P_j) over prefix
    # sums P — so the sequential-looking scan is just two windows.
    # Work is scaled by n (days) so the mean never becomes a float:
    # y'_t = n*x_t - S. Threshold h' = C*sigma*n = C*sqrt(n*SS - S^2);
    # IEEE sqrt is correctly rounded, so floor(C*sqrt(A)) is the same
    # BIGINT on every engine.
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(x * x) AS BIGINT) AS ss
      FROM daily GROUP BY event_type
    ), scaled AS (
      SELECT d.event_type, d.day, d.x,
             d.x * t.n - t.s AS y,
             CAST(floor({CUSUM_C} * sqrt(CAST(t.n * t.ss - t.s * t.s
                                              AS DOUBLE))) AS BIGINT) AS h
      FROM daily d JOIN stats t ON t.event_type = d.event_type
    ), prefixes AS (
      SELECT event_type, day, x, h,
             SUM(y) OVER w AS p_pos,
             SUM(-y) OVER w AS p_neg
      FROM scaled
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), pre AS (
      SELECT event_type, day, x, h, p_pos, p_neg,
             LEAST(CAST(0 AS BIGINT), MIN(p_pos) OVER w2) AS m_pos,
             LEAST(CAST(0 AS BIGINT), MIN(p_neg) OVER w2) AS m_neg
      FROM prefixes
      WINDOW w2 AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, x,
           CAST(p_pos - m_pos AS BIGINT) AS cusum_pos,
           CAST(p_neg - m_neg AS BIGINT) AS cusum_neg,
           CAST(CASE WHEN p_pos - m_pos > h OR p_neg - m_neg > h
                THEN 1 ELSE 0 END AS INT) AS alarm
    FROM pre
    """,
)
def time_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM changepoint detection on daily event volumes:
    alarms when the cumulative deviation from the series mean drifts
    past C·σ — the drift detector that catches slow regime changes
    the pointwise z-score key (event_anomaly_zscore) cannot.

    Declarative trick: the sequential max(0, ·) reset recurrence
    equals P_t − min(0, running-min of P) over plain prefix sums, so
    CUSUM is two stacked windows — no UDF, no loop, no state. All
    arithmetic is exact integers scaled by n (days per series); the
    only float touchpoint is one correctly-rounded sqrt for the
    threshold, floored to a BIGINT identically on both engines.

    Scale shape: the raw scan collapses to the (type, day) grain
    immediately; every window runs over that tiny grain, partitioned
    by series.
    """
    e = load_tables(spark, sf_dir)["events"]
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("ss"),
    )
    scaled = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        "x",
        (F.col("x") * F.col("n") - F.col("s")).alias("y"),
        F.floor(
            CUSUM_C
            * F.sqrt(
                (F.col("n") * F.col("ss") - F.col("s") * F.col("s")).cast(
                    "double"
                )
            )
        )
        .cast("bigint")
        .alias("h"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = scaled.select(
        "event_type",
        "day",
        "x",
        "h",
        F.sum("y").over(w).alias("p_pos"),
        F.sum(-F.col("y")).over(w).alias("p_neg"),
    ).select(
        "event_type",
        "day",
        "x",
        "h",
        "p_pos",
        "p_neg",
        F.least(F.lit(0).cast("bigint"), F.min("p_pos").over(w)).alias(
            "m_pos"
        ),
        F.least(F.lit(0).cast("bigint"), F.min("p_neg").over(w)).alias(
            "m_neg"
        ),
    )
    cpos = F.col("p_pos") - F.col("m_pos")
    cneg = F.col("p_neg") - F.col("m_neg")
    return pre.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "x",
        cpos.cast("bigint").alias("cusum_pos"),
        cneg.cast("bigint").alias("cusum_neg"),
        F.when((cpos > F.col("h")) | (cneg > F.col("h")), 1)
        .otherwise(0)
        .cast("int")
        .alias("alarm"),
    )


@register(
    "event_dwell_time",
    # inter-event dwell per user, summarized per event type with
    # DISCRETE percentiles — exact integer microseconds end-to-end
    # (percentile_disc returns actual data points, no interpolation).
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
               AS dwell_us
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           MIN(dwell_us) AS min_us,
           CAST(quantile_disc(dwell_us, 0.5) AS BIGINT) AS p50_us,
           CAST(quantile_disc(dwell_us, 0.9) AS BIGINT) AS p90_us,
           MAX(dwell_us) AS max_us
    FROM gaps WHERE dwell_us IS NOT NULL
    GROUP BY event_type
    """,
)
def event_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell-time distribution: the gap from each event to the user's
    previous event (any type), summarized per event type — "how long
    do users sit before doing X", the engagement metric between the
    transition matrix (which ignores time) and session stats (which
    only see gap > threshold).

    One user_id exchange for the lag, then a 5-group aggregate over
    exact integer microseconds; discrete percentiles keep the whole
    key float-free.
    """
    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gaps = e.select(
        "event_type",
        (us - F.lag(us).over(w)).alias("dwell_us"),
    ).where(F.col("dwell_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.min("dwell_us").alias("min_us"),
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY dwell_us)"
        ).cast("bigint").alias("p50_us"),
        F.expr(
            "percentile_disc(0.9) WITHIN GROUP (ORDER BY dwell_us)"
        ).cast("bigint").alias("p90_us"),
        F.max("dwell_us").alias("max_us"),
    )


SLO_ERROR_PCT = 25     # error budget: 25% of events may be errors
BURN_FAST, BURN_SLOW = 2, 1  # multi-window burn thresholds (x budget)


@register(
    "event_error_burn_rate",
    # Google-SRE multi-window burn-rate alert on the hour grain:
    # trailing 1 h and 6 h error ratios vs the SLO budget; the alert
    # requires BOTH windows burning (fast window = responsive, slow
    # window = not a blip). Every comparison is cross-multiplied
    # exact integers — no ratio ever decides a boolean.
    oracle=f"""
    WITH hourly AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_s,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS errs,
             CAST(COUNT(*) AS BIGINT) AS total
      FROM events GROUP BY 1
    ), windows AS (
      SELECT hour_s, errs, total,
             CAST(SUM(errs) OVER w1 AS BIGINT) AS e1,
             CAST(SUM(total) OVER w1 AS BIGINT) AS t1,
             CAST(SUM(errs) OVER w6 AS BIGINT) AS e6,
             CAST(SUM(total) OVER w6 AS BIGINT) AS t6
      FROM hourly
      WINDOW w1 AS (ORDER BY hour_s RANGE BETWEEN 3599 PRECEDING
                    AND CURRENT ROW),
             w6 AS (ORDER BY hour_s RANGE BETWEEN 21599 PRECEDING
                    AND CURRENT ROW)
    )
    SELECT hour_s,
           floor(CAST(CAST(e1 AS DOUBLE) / t1 AS DOUBLE) * 10000 + 0.5)
             / 10000 AS ratio_1h,
           floor(CAST(CAST(e6 AS DOUBLE) / t6 AS DOUBLE) * 10000 + 0.5)
             / 10000 AS ratio_6h,
           CAST(CASE WHEN e1 * 100 * {100 // SLO_ERROR_PCT}
                          > t1 * {SLO_ERROR_PCT} * {BURN_FAST}
                          * {100 // SLO_ERROR_PCT}
                      AND e6 * 100 > t6 * {SLO_ERROR_PCT} * {BURN_SLOW}
                THEN 1 ELSE 0 END AS INT) AS alert
    FROM windows
    """,
)
def event_error_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-budget burn-rate alerting (the Google SRE multi-window
    pattern): per hour, the trailing 1 h and 6 h error ratios against
    a 25% SLO; the page fires only when the FAST window burns at 2x
    budget AND the SLOW window is above budget — responsive to real
    incidents, immune to single-bucket blips.

    Exactness: hour-grain counts are exact integers; both trailing
    windows are integer-second range frames over the hour grain; the
    alert boolean is decided by cross-multiplied integers (e·100 >
    t·threshold), never by a float ratio. The displayed ratios are
    display-only. Scale shape: raw events collapse to the hour grain
    first; windows run over hours — thousands of rows at any volume.
    """
    e = load_tables(spark, sf_dir)["events"]
    hourly = e.groupBy(
        F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_s")
    ).agg(
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("errs"),
        F.count(F.lit(1)).cast("bigint").alias("total"),
    )
    w1 = Window.orderBy("hour_s").rangeBetween(-3599, 0)
    w6 = Window.orderBy("hour_s").rangeBetween(-21599, 0)
    windows = hourly.select(
        "hour_s",
        F.sum("errs").over(w1).cast("bigint").alias("e1"),
        F.sum("total").over(w1).cast("bigint").alias("t1"),
        F.sum("errs").over(w6).cast("bigint").alias("e6"),
        F.sum("total").over(w6).cast("bigint").alias("t6"),
    )
    fast_burn = (
        F.col("e1") * 100 * (100 // SLO_ERROR_PCT)
        > F.col("t1") * SLO_ERROR_PCT * BURN_FAST * (100 // SLO_ERROR_PCT)
    )
    slow_burn = F.col("e6") * 100 > F.col("t6") * SLO_ERROR_PCT * BURN_SLOW
    return windows.select(
        "hour_s",
        pround(F.col("e1").cast("double") / F.col("t1")).alias("ratio_1h"),
        pround(F.col("e6").cast("double") / F.col("t6")).alias("ratio_6h"),
        F.when(fast_burn & slow_burn, 1).otherwise(0).cast("int").alias(
            "alert"
        ),
    )


_MIG_LO, _MIG_HI = 20, 60  # period purchase-value tier cuts


@register(
    "event_segment_migration",
    # customer value-tier migration between the two halves of the
    # observation window: the retention-marketing matrix ("how many
    # high-value customers decayed to low?"). Halves split at the
    # exact integer midpoint of the observed time range; tiers cut
    # exact cents totals with integer thresholds.
    oracle=f"""
    WITH ext AS (
      SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid
      FROM events
    ), per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                            AND epoch_us(ts) <= mid
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS v1,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                            AND epoch_us(ts) > mid
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS v2
      FROM events, ext
      GROUP BY user_id
    ), tiers AS (
      SELECT user_id,
             CASE WHEN v1 >= {_MIG_HI * 100} THEN 'high'
                  WHEN v1 >= {_MIG_LO * 100} THEN 'mid'
                  WHEN v1 > 0 THEN 'low' ELSE 'none' END AS tier_h1,
             CASE WHEN v2 >= {_MIG_HI * 100} THEN 'high'
                  WHEN v2 >= {_MIG_LO * 100} THEN 'mid'
                  WHEN v2 > 0 THEN 'low' ELSE 'none' END AS tier_h2
      FROM per_user
    )
    SELECT tier_h1, tier_h2,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(user_id) AS BIGINT) AS user_checksum
    FROM tiers GROUP BY tier_h1, tier_h2
    """,
)
def event_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-tier migration matrix: each user's purchase-value tier
    (none/low/mid/high on exact cents) in the first vs second half of
    the observed window, counted per (from, to) cell — the customer-
    lifecycle movement view (churn = high→none, growth = low→high)
    that completes the RFM family next to event_rfm_scores'
    single-period snapshot.

    Scale shape: both period totals come from ONE conditional hash
    aggregate keyed on user_id (two BIGINT partials per user — no
    second pass, no join between periods); the matrix is a ≤16-group
    rollup. The midpoint is a broadcast 1-row aggregate in exact
    integer µs.
    """
    e = load_tables(spark, sf_dir)["events"]
    us = F.unix_micros("ts")
    ext = e.agg(
        F.expr(
            "(MIN(unix_micros(ts)) + MAX(unix_micros(ts))) DIV 2"
        ).alias("mid")
    )
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    per_user = (
        e.crossJoin(F.broadcast(ext))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase") & (us <= F.col("mid")),
                    cents,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("v1"),
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase") & (us > F.col("mid")),
                    cents,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("v2"),
        )
    )

    def tier(c):
        return (
            F.when(F.col(c) >= _MIG_HI * 100, "high")
            .when(F.col(c) >= _MIG_LO * 100, "mid")
            .when(F.col(c) > 0, "low")
            .otherwise("none")
        )

    return per_user.select(
        "user_id", tier("v1").alias("tier_h1"), tier("v2").alias("tier_h2")
    ).groupBy("tier_h1", "tier_h2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("user_id").cast("bigint").alias("user_checksum"),
    )


_SRM_GRID = 10**6


@register(
    "event_ab_srm_check",
    # sample-ratio-mismatch guardrail: md5 hash-split (the
    # event_abtest_lift assignment) should give a 50/50 split; the
    # chi-square statistic against that expectation flags broken
    # randomization BEFORE anyone reads the metric. chi2 terms are
    # exact rationals of integer counts, grid-floored before the sum.
    oracle=f"""
    WITH assign AS (
      SELECT DISTINCT user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 2 AS variant
      FROM events
    ), counts AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n FROM assign
      GROUP BY variant
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts
    )
    SELECT CAST(SUM(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n_b,
           CAST(SUM(CAST(floor(
             (CAST(n AS DOUBLE) - CAST(total AS DOUBLE) / 2)
             * (CAST(n AS DOUBLE) - CAST(total AS DOUBLE) / 2)
             / (CAST(total AS DOUBLE) / 2) * {_SRM_GRID}) AS BIGINT))
             AS BIGINT) AS chi2_grid,
           CAST(CASE WHEN SUM(CAST(floor(
             (CAST(n AS DOUBLE) - CAST(total AS DOUBLE) / 2)
             * (CAST(n AS DOUBLE) - CAST(total AS DOUBLE) / 2)
             / (CAST(total AS DOUBLE) / 2) * {_SRM_GRID}) AS BIGINT))
             > 3841459 THEN 1 ELSE 0 END AS INT) AS srm_alarm
    FROM counts, tot
    """,
)
def event_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check for the hash-split experiment: the
    chi-square statistic of observed variant sizes against the
    designed 50/50 split, alarmed at the p=0.05 critical value
    (3.841459, 1 dof, on the 1e-6 grid). The guardrail every
    experimentation platform runs before reading ANY metric — a
    failed SRM means the assignment itself is broken and the
    experiment is void (event_abtest_lift's readout assumes this
    passed).

    Exactness: counts are integers; each (o−e)²/e term is one IEEE
    expression of those integers, grid-floored before the 2-term sum.
    Scale shape: DISTINCT users → 2-group count → 1-row statistic.
    """
    e = load_tables(spark, sf_dir)["events"]
    assign = e.select("user_id").distinct().select(
        "user_id",
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 2
        ).alias("variant"),
    )
    counts = assign.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = counts.agg(F.sum("n").cast("bigint").alias("total"))
    j = counts.crossJoin(F.broadcast(tot))
    exp = F.col("total").cast("double") / 2
    term_g = F.floor(
        (F.col("n").cast("double") - exp)
        * (F.col("n").cast("double") - exp)
        / exp
        * _SRM_GRID
    ).cast("bigint")
    return j.agg(
        F.sum(F.when(F.col("variant") == 0, F.col("n")))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("n")))
        .cast("bigint")
        .alias("n_b"),
        F.sum(term_g).cast("bigint").alias("chi2_grid"),
        F.when(F.sum(term_g) > 3_841_459, 1)
        .otherwise(0)
        .cast("int")
        .alias("srm_alarm"),
    )


@register(
    "agg_gini_coefficient",
    # Gini of customer revenue concentration via the rank formula
    # G = (2*sum(i*x_i))/(n*sum(x)) - (n+1)/n over cents sorted
    # ascending with a total tie-break — every moment an exact
    # BIGINT, two IEEE divisions at the end.
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, o_custkey) AS i
      FROM cust
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS cents_total,
           floor((2.0 * CAST(SUM(i * cents) AS DOUBLE)
                  / (CAST(COUNT(*) AS DOUBLE) * SUM(cents))
                  - (CAST(COUNT(*) AS DOUBLE) + 1) / COUNT(*))
                 * 1000000 + 0.5) / 1000000 AS gini
    FROM ranked
    """,
)
def agg_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the
    single-number inequality summary behind agg_abc_classification's
    80/95 cuts (G=0 all equal, G→1 winner-take-all).

    Rank formula over exact cents: Σi·x_i and Σx_i are exact BIGINTs
    (i from a total-ordered rank window), so the statistic is two
    IEEE divisions of exact integers. The global rank window runs on
    the CUSTOMER grain (already aggregated); at extreme cardinality
    the distributed form is sort + per-partition offset ranks — the
    same two-pass rank decomposition every engine uses.
    """
    from pyspark.sql.window import Window

    o = load_tables(spark, sf_dir)["orders"]
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    ranked = cust.select(
        "cents",
        F.row_number()
        .over(Window.orderBy("cents", "o_custkey"))
        .alias("i"),
    )
    nD = F.count(F.lit(1)).cast("double")
    gini = (
        2.0 * F.sum(F.col("i") * F.col("cents")).cast("double")
        / (nD * F.sum("cents"))
        - (nD + 1) / F.count(F.lit(1))
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("cents_total"),
        pround(gini, 6).alias("gini"),
    )


ACF_MAX_LAG = 7


@register(
    "time_autocorrelation_acf",
    # lag-k autocorrelation of daily volumes per event type, k=1..7:
    # r_k = sum((x_t - mean)(x_{t+k} - mean)) / sum((x_t - mean)^2)
    # computed from EXACT integer moments (the deviations are exact
    # n-scaled integers, the same device as CUSUM), one division per
    # (type, lag).
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s
      FROM daily GROUP BY event_type
    ), dev AS (
      -- n-scaled deviation: d = n*x - s is exact; products of two
      -- deviations are exact BIGINTs (daily counts are small)
      SELECT d.event_type, d.day, d.x * t.n - t.s AS d, t.n
      FROM daily d JOIN stats t ON t.event_type = d.event_type
    ), lags AS (
      SELECT a.event_type, l.lag_k,
             CAST(SUM(a.d * b.d) AS BIGINT) AS num
      FROM dev a
      JOIN (SELECT unnest(range(1, {ACF_MAX_LAG + 1})) AS lag_k) l ON TRUE
      JOIN dev b ON b.event_type = a.event_type
                AND b.day = a.day + l.lag_k * INTERVAL 1 DAY
      GROUP BY a.event_type, l.lag_k
    ), denom AS (
      SELECT event_type, CAST(SUM(d * d) AS BIGINT) AS den FROM dev
      GROUP BY event_type
    )
    SELECT lg.event_type, CAST(lg.lag_k AS BIGINT) AS lag_k,
           floor(CAST(CAST(lg.num AS DOUBLE) / dn.den AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS acf
    FROM lags lg JOIN denom dn ON dn.event_type = lg.event_type
    """,
)
def time_autocorrelation_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily event volumes (lags 1-7 per
    type): THE seasonality diagnostic — a weekly cycle shows as an
    acf spike at lag 7 — complementing time_series_decompose (which
    assumes the period) by MEASURING which period exists.

    Exactness: deviations are n-scaled exact integers (n·x − Σx, the
    CUSUM device), so numerator and denominator moments are exact
    BIGINT sums and each acf value is one IEEE division. Scale shape:
    collapses to the (type, day) grain first; the lag join is a
    self-join on day+k over that tiny grain.
    """
    e = load_tables(spark, sf_dir)["events"]
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    dev = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        (F.col("x") * F.col("n") - F.col("s")).alias("d"),
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag_k")
    )
    b = dev.select(
        F.col("event_type").alias("et_b"),
        F.col("day").alias("day_b"),
        F.col("d").alias("d_b"),
    )
    num = (
        dev.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("et_b") == F.col("event_type"))
            & (
                F.col("day_b")
                == F.date_add(F.col("day"), F.col("lag_k"))
            ),
        )
        .groupBy("event_type", "lag_k")
        .agg(F.sum(F.col("d") * F.col("d_b")).cast("bigint").alias("num"))
    )
    den = dev.groupBy("event_type").agg(
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("den")
    )
    return num.join(F.broadcast(den), "event_type").select(
        "event_type",
        F.col("lag_k").cast("bigint").alias("lag_k"),
        pround(F.col("num").cast("double") / F.col("den"), 6).alias("acf"),
    )


@register(
    "time_week_over_week",
    # WoW growth per event type: weekly exact counts, lag-1 window on
    # the week grain, growth as one division of exact integers (NULL
    # on the first week — no fake 0% growth).
    oracle="""
    WITH weekly AS (
      SELECT event_type,
             CAST(epoch(date_trunc('week', ts)) AS BIGINT) AS week_s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, week_s, n,
           lag(n) OVER w AS prev_n,
           floor(CAST((CAST(n AS DOUBLE) - lag(n) OVER w)
                 / lag(n) OVER w AS DOUBLE) * 10000 + 0.5) / 10000
             AS wow_growth
    FROM weekly
    WINDOW w AS (PARTITION BY event_type ORDER BY week_s)
    """,
)
def time_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth per event type — the reporting staple
    (N vs prior period, percent delta) as one week-grain aggregate +
    one lag window. First week's growth is NULL, not zero: absence
    of a baseline is not flat growth.

    Scale shape: the raw scan collapses to (type, week) immediately;
    the lag window runs over dozens of rows per type.
    """
    e = load_tables(spark, sf_dir)["events"]
    weekly = e.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("week", "ts")).alias("week_s"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("event_type").orderBy("week_s")
    prev = F.lag("n").over(w)
    return weekly.select(
        "event_type",
        "week_s",
        "n",
        prev.alias("prev_n"),
        pround((F.col("n").cast("double") - prev) / prev).alias(
            "wow_growth"
        ),
    )


@register(
    "event_littles_law",
    # Little's law audit over the value-derived session intervals:
    # time-average concurrency L must equal arrival rate λ times mean
    # duration W. All three sides from exact integer µs sums — the
    # identity holds EXACTLY (up to boundary effects) because both
    # L·horizon and λ·W·horizon reduce to Σduration; the exposed
    # check divides the same exact integers two ways.
    oracle="""
    WITH iv AS (
      SELECT user_id,
             epoch_us(ts) AS s,
             CAST(FLOOR(value * 60) AS BIGINT) * 1000000 AS dur_us
      FROM events
    ), horizon AS (
      SELECT MIN(s) AS t0, MAX(s) AS t1 FROM iv
    ), agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_arrivals,
             CAST(SUM(dur_us) AS BIGINT) AS sum_dur_us
      FROM iv
    )
    SELECT n_arrivals,
           floor(CAST(CAST(sum_dur_us AS DOUBLE) / (t1 - t0)
                 AS DOUBLE) * 10000 + 0.5) / 10000 AS avg_concurrency_L,
           floor(CAST(CAST(n_arrivals AS DOUBLE) * 3600000000 / (t1 - t0)
                 AS DOUBLE) * 10000 + 0.5) / 10000 AS lambda_per_hour,
           floor(CAST(CAST(sum_dur_us AS DOUBLE) / n_arrivals / 1000000
                 AS DOUBLE) * 10000 + 0.5) / 10000 AS mean_w_seconds
    FROM agg, horizon
    """,
)
def event_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law summary of the session intervals: time-average
    concurrency L = Σduration / horizon, arrival rate λ, and mean
    residence W — the capacity-planning triple (servers needed =
    L; L = λ·W holds identically here, pytest-pinned) that
    interval_max_concurrency's PEAK view complements with the
    average.

    Exactness: durations and the horizon are exact integer µs; each
    exposed figure is one IEEE division of exact integers. One scan,
    two tiny aggregates, zero windows — the cheapest of the interval
    family.
    """
    e = load_tables(spark, sf_dir)["events"]
    us = F.unix_micros("ts")
    iv = e.select(
        us.alias("s"),
        (F.floor(F.col("value") * 60).cast("bigint") * 1_000_000).alias(
            "dur_us"
        ),
    )
    horizon = iv.agg(
        F.min("s").alias("t0"), F.max("s").alias("t1")
    )
    agg = iv.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_arrivals"),
        F.sum("dur_us").cast("bigint").alias("sum_dur_us"),
    )
    j = agg.crossJoin(F.broadcast(horizon))
    span = (F.col("t1") - F.col("t0")).cast("double")
    return j.select(
        "n_arrivals",
        pround(F.col("sum_dur_us").cast("double") / span).alias(
            "avg_concurrency_L"
        ),
        pround(
            F.col("n_arrivals").cast("double") * 3_600_000_000 / span
        ).alias("lambda_per_hour"),
        pround(
            F.col("sum_dur_us").cast("double")
            / F.col("n_arrivals")
            / 1_000_000
        ).alias("mean_w_seconds"),
    )


@register(
    "orders_repeat_purchase_gap",
    # repeat-purchase latency: days between a customer's consecutive
    # orders (lag over the order date, total tie-break), summarized
    # with discrete percentiles over exact integer days — the CRM
    # reorder-cycle metric.
    oracle="""
    WITH seq AS (
      SELECT o_custkey,
             CAST(o_orderdate AS DATE)
               - lag(CAST(o_orderdate AS DATE))
                 OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS gap_days
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
           MIN(gap_days) AS min_days,
           CAST(quantile_disc(gap_days, 0.5) AS BIGINT) AS p50_days,
           CAST(quantile_disc(gap_days, 0.9) AS BIGINT) AS p90_days,
           MAX(gap_days) AS max_days,
           CAST(SUM(CASE WHEN gap_days <= 30 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within_30d
    FROM seq WHERE gap_days IS NOT NULL
    """,
)
def orders_repeat_purchase_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reorder-cycle distribution: days between each customer's
    consecutive orders, with discrete percentiles and a 30-day
    repeat-rate count — the CRM metric behind replenishment
    campaigns, float-free end-to-end (integer day gaps, _disc
    percentiles, exact counts).

    Scale shape: one o_custkey exchange for the lag, then a 1-row
    aggregate — the event_dwell_time pattern applied to the orders
    fact.
    """
    o = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days")
    ).where(F.col("gap_days").isNotNull())
    return gaps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.min("gap_days").cast("bigint").alias("min_days"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_days)")
        .cast("bigint")
        .alias("p50_days"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_days)")
        .cast("bigint")
        .alias("p90_days"),
        F.max("gap_days").cast("bigint").alias("max_days"),
        F.sum(F.when(F.col("gap_days") <= 30, 1).otherwise(0))
        .cast("bigint")
        .alias("n_within_30d"),
    )


@register(
    "agg_herfindahl_index",
    # Herfindahl-Hirschman concentration per priority segment:
    # HHI = sum(share_i^2) over customers, computed as
    # sum(cents_i^2) / total_cents^2 — squares summed exactly in
    # DECIMAL(38,0) (cents^2 ~ 1e18 per heavy customer would overflow
    # a BIGINT sum), one IEEE division at the end.
    oracle="""
    WITH cust AS (
      SELECT o_orderpriority,
             o_custkey,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS cents_total,
           floor(CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS DOUBLE)
                 / (CAST(SUM(cents) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE))
                 * 1000000 + 0.5) / 1000000 AS hhi
    FROM cust GROUP BY o_orderpriority
    """,
)
def agg_herfindahl_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of customer revenue concentration
    per priority segment — the antitrust/market-power concentration
    number (1/n uniform .. 1.0 monopoly) that completes the
    inequality family next to agg_gini_coefficient (Gini measures
    dispersion; HHI weights the head quadratically).

    Exactness: per-customer cents are exact BIGINTs; their squares
    accumulate in DECIMAL(38,0) (a heavy customer's cents^2 overflows
    int64), and HHI emerges from ONE IEEE division of two exact
    moments — no per-row share division whose rounding could drift
    between engines. Scale shape: two hash aggregates on
    (priority, custkey) then (priority) — no window, no sort.
    """
    o = load_tables(spark, sf_dir)["orders"]
    cust = o.groupBy("o_orderpriority", "o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    sumsq = F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
    total = F.sum("cents").cast("bigint")
    return cust.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        total.alias("cents_total"),
        (
            F.floor(
                sumsq.cast("double")
                / (total.cast("double") * total.cast("double"))
                * 1000000
                + 0.5
            )
            / 1000000
        ).alias("hhi"),
    )


SEQ2_WINDOW_H = 24  # A-then-B must happen within this many hours


@register(
    "event_seq2_mining",
    # Sequential 2-pattern mining: support of "A then B within 24 h"
    # per USER (exists semantics, not adjacency — the transition
    # matrix covers consecutive steps). Confidence = P(pattern | user
    # has A). Counts are exact; ratios are single IEEE divisions.
    oracle=f"""
    WITH ue AS (
      SELECT DISTINCT user_id, event_type, ts FROM events
    ), pat AS (
      SELECT DISTINCT a.user_id, a.event_type AS ante, b.event_type AS cons
      FROM ue a JOIN ue b
        ON b.user_id = a.user_id
       AND b.event_type <> a.event_type
       AND b.ts > a.ts
       AND b.ts <= a.ts + INTERVAL {SEQ2_WINDOW_H} HOUR
    ), has_t AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS n_users
      FROM events GROUP BY event_type
    ), n_all AS (
      SELECT COUNT(DISTINCT user_id) AS n FROM events
    )
    SELECT p.ante, p.cons,
           CAST(COUNT(*) AS BIGINT) AS n_users_pattern,
           floor(CAST(COUNT(*) AS DOUBLE) / n_all.n * 10000 + 0.5) / 10000
             AS support,
           floor(CAST(COUNT(*) AS DOUBLE) / ha.n_users * 10000 + 0.5) / 10000
             AS confidence
    FROM pat p
    JOIN has_t ha ON ha.event_type = p.ante
    CROSS JOIN n_all
    GROUP BY p.ante, p.cons, ha.n_users, n_all.n
    """,
)
def event_seq2_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential 2-pattern mining: for every ordered type pair
    (A, B), how many users did A then B within 24 h (EXISTS anywhere
    in the stream, not just adjacent steps — the complement of
    event_transition_matrix's Markov adjacency and assoc_basket_lift's
    unordered co-occurrence). Support normalizes by all users,
    confidence by users who did A — the funnel-discovery primitive
    that tells you WHICH funnels to define.

    Scale shape: the A-B match joins per-user event lists on user_id
    (one shuffle); fan-out is bounded by events-per-user² within the
    time band, then collapsed by DISTINCT (user, A, B) — with |types|
    small the distinct set is at most |users| x types². At pathological
    per-user volumes the band join becomes the bucketed interval-join
    shape (join_interval_bucketed).
    """
    e = load_tables(spark, sf_dir)["events"]
    ue = e.select("user_id", "event_type", "ts").distinct()
    a = ue.select(
        F.col("user_id"), F.col("event_type").alias("ante"), F.col("ts").alias("ts_a")
    )
    b = ue.select(
        F.col("user_id"), F.col("event_type").alias("cons"), F.col("ts").alias("ts_b")
    )
    pat = (
        a.join(b, "user_id")
        .where(
            (F.col("cons") != F.col("ante"))
            & (F.col("ts_b") > F.col("ts_a"))
            & (
                F.col("ts_b")
                <= F.col("ts_a") + F.expr(f"INTERVAL {SEQ2_WINDOW_H} HOURS")
            )
        )
        .select("user_id", "ante", "cons")
        .distinct()
    )
    has_t = e.groupBy(F.col("event_type").alias("ante")).agg(
        F.countDistinct("user_id").alias("n_with_ante")
    )
    n_all = e.select(F.countDistinct("user_id").alias("n_total"))
    counts = pat.groupBy("ante", "cons").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users_pattern")
    )
    return (
        counts.join(F.broadcast(has_t), "ante")
        .crossJoin(F.broadcast(n_all))
        .select(
            "ante",
            "cons",
            "n_users_pattern",
            pround(
                F.col("n_users_pattern").cast("double") / F.col("n_total")
            ).alias("support"),
            pround(
                F.col("n_users_pattern").cast("double") / F.col("n_with_ante")
            ).alias("confidence"),
        )
    )


@register(
    "time_seasonal_naive_forecast",
    # Seasonal-naive backtest: forecast(day) = value(day - 7); MAE of
    # that vs the naive-1 forecast (yesterday's value) over days that
    # have both baselines — integer errors, one division each.
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT event_type, day_s, n,
             lag(n, 7) OVER w AS n_wk,
             lag(n, 1) OVER w AS n_d1
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day_s)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           floor(CAST(SUM(abs(n - n_wk)) AS DOUBLE) / COUNT(*)
                 * 10000 + 0.5) / 10000 AS mae_seasonal,
           floor(CAST(SUM(abs(n - n_d1)) AS DOUBLE) / COUNT(*)
                 * 10000 + 0.5) / 10000 AS mae_naive1
    FROM lagged
    WHERE n_wk IS NOT NULL AND n_d1 IS NOT NULL
    GROUP BY event_type
    """,
)
def time_seasonal_naive_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's event
    count with the same weekday last week (lag 7) and with yesterday
    (lag 1), and report both MAEs — the standard baseline pair every
    real forecasting model must beat (and the quantitative readout of
    the weekly seasonality time_autocorrelation_acf detects). Errors
    are exact integer |n - lag|; each MAE is one division.

    Scale shape: raw events collapse to (type, day) immediately; the
    lag windows run on the day grain (dozens of rows per type).
    """
    e = load_tables(spark, sf_dir)["events"]
    daily = e.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("day", "ts")).alias("day_s"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day_s")
    lagged = daily.select(
        "event_type",
        "n",
        F.lag("n", 7).over(w).alias("n_wk"),
        F.lag("n", 1).over(w).alias("n_d1"),
    ).where(F.col("n_wk").isNotNull() & F.col("n_d1").isNotNull())
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        (
            F.floor(
                F.sum(F.abs(F.col("n") - F.col("n_wk"))).cast("double")
                / F.count(F.lit(1))
                * 10000
                + 0.5
            )
            / 10000
        ).alias("mae_seasonal"),
        (
            F.floor(
                F.sum(F.abs(F.col("n") - F.col("n_d1"))).cast("double")
                / F.count(F.lit(1))
                * 10000
                + 0.5
            )
            / 10000
        ).alias("mae_naive1"),
    )


BOT_MIN_EVENTS = 20   # below this, regularity is noise, not signal
BOT_CV2_NUM = 1       # flag when CV^2 < 1/4 (CV < 0.5)
BOT_CV2_DEN = 4


@register(
    "event_bot_regularity",
    # Bot heuristic: a user whose inter-event gaps are TOO regular
    # (coefficient of variation < 0.5 over >= 20 events) is machine-
    # like. CV^2 = (n*S2 - S^2)/S^2 over exact ms gaps; the threshold
    # compare is cross-multiplied integers — no float ever decides a
    # flag. Gap moments in DECIMAL(38,0): ms^2 sums pass 2^63.
    oracle=f"""
    WITH gaps AS (
      SELECT user_id,
             CAST((epoch_us(ts) - lag(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)) // 1000
                  AS BIGINT) AS gap_ms
      FROM events
    ), stats AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(gap_ms) AS DECIMAL(38,0)) AS s1,
             CAST(SUM(CAST(gap_ms AS DECIMAL(38,0)) * gap_ms)
                  AS DECIMAL(38,0)) AS s2
      FROM gaps WHERE gap_ms IS NOT NULL
      GROUP BY user_id
    ), flagged AS (
      SELECT user_id, n,
             CASE WHEN n >= {BOT_MIN_EVENTS - 1} AND s1 > 0
                       AND (n * s2 - s1 * s1) * {BOT_CV2_DEN}
                           < s1 * s1 * {BOT_CV2_NUM}
                  THEN 1 ELSE 0 END AS is_bot
      FROM stats
    )
    SELECT is_bot,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n) AS BIGINT) AS n_gaps,
           CAST(MIN(n) AS BIGINT) AS min_gaps,
           CAST(MAX(n) AS BIGINT) AS max_gaps
    FROM flagged GROUP BY is_bot
    """,
)
def event_bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot-traffic heuristic: flag users whose inter-event timing is
    too REGULAR to be human — coefficient of variation of gaps below
    0.5 across at least BOT_MIN_EVENTS events (humans are bursty:
    empirical CVs ≥ 1; schedulers and scrapers tick). The data-
    quality gate a training pipeline runs before trusting behavioral
    event data.

    Exactness: gaps are exact integer ms (µs DIV 1000); CV² =
    (n·Σx² − S²)/S² with moments accumulated in DECIMAL(38,0) (a
    day-long ms gap squared times thousands of events passes 2^63),
    and the flag is a cross-multiplied INTEGER comparison — no float
    threshold. Scale shape: one lag window + one hash agg, both
    partitioned by user_id.
    """
    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = e.select(
        "user_id",
        ((us - F.lag(us).over(w)) / 1000).cast("bigint").alias("gap_ms"),
    ).where(F.col("gap_ms").isNotNull())
    stats = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("gap_ms").cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("gap_ms").cast("decimal(38,0)") * F.col("gap_ms"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    var_num = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")) * F.lit(
        BOT_CV2_DEN
    )
    thresh = F.col("s1") * F.col("s1") * F.lit(BOT_CV2_NUM)
    flagged = stats.select(
        "n",
        F.when(
            (F.col("n") >= BOT_MIN_EVENTS - 1)
            & (F.col("s1") > 0)
            & (var_num < thresh),
            1,
        )
        .otherwise(0)
        .alias("is_bot"),
    )
    return flagged.groupBy("is_bot").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("n").cast("bigint").alias("n_gaps"),
        F.min("n").cast("bigint").alias("min_gaps"),
        F.max("n").cast("bigint").alias("max_gaps"),
    )


AGING_BUCKETS = ((0, 30), (31, 60), (61, 90))  # days; beyond = "90+"


@register(
    "orders_fulfillment_aging",
    # Fulfillment aging report: ship latency (l_shipdate - o_orderdate)
    # bucketed 0-30 / 31-60 / 61-90 / 90+ days per priority, with each
    # bucket's share of its priority — exact integer day diffs and
    # counts, one division per share.
    oracle="""
    WITH lat AS (
      SELECT o.o_orderpriority AS priority,
             CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
               AS days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ), bucketed AS (
      SELECT priority,
             CASE WHEN days <= 30 THEN '00-30'
                  WHEN days <= 60 THEN '31-60'
                  WHEN days <= 90 THEN '61-90'
                  ELSE '90+' END AS bucket,
             days
      FROM lat
    ), per AS (
      SELECT priority, bucket,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(MAX(days) AS BIGINT) AS max_days
      FROM bucketed GROUP BY 1, 2
    )
    SELECT priority, bucket, n_lines, max_days,
           floor(CAST(n_lines AS DOUBLE)
                 / SUM(n_lines) OVER (PARTITION BY priority)
                 * 10000 + 0.5) / 10000 AS share
    FROM per
    """,
)
def orders_fulfillment_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment aging report: how long after ordering do lines
    actually ship, bucketed into the 0-30/31-60/61-90/90+ day bands
    every operations dashboard uses, with each band's share of its
    priority class — the slow-tail diagnostic behind SLA conversations
    (a priority whose 90+ band grows is the one to escalate).

    Exactness: day diffs and counts are integers; shares are one IEEE
    division each. Scale shape: one key join (orderkey) + one hash
    agg on (priority, bucket); the share window runs on the bucketed
    grain (|priorities| x 4 rows).
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    o = load_tables(spark, sf_dir)["orders"]
    lat = li.join(
        o.select("o_orderkey", "o_orderpriority", "o_orderdate"),
        li.l_orderkey == o.o_orderkey,
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("days"),
    )
    bucket = (
        F.when(F.col("days") <= 30, "00-30")
        .when(F.col("days") <= 60, "31-60")
        .when(F.col("days") <= 90, "61-90")
        .otherwise("90+")
    )
    per = lat.select("priority", bucket.alias("bucket"), "days").groupBy(
        "priority", "bucket"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.max("days").cast("bigint").alias("max_days"),
    )
    w = Window.partitionBy("priority")
    return per.select(
        "priority",
        "bucket",
        "n_lines",
        "max_days",
        pround(
            F.col("n_lines").cast("double") / F.sum("n_lines").over(w)
        ).alias("share"),
    )


@register(
    "event_inter_arrival_fit",
    # Exponential-arrivals goodness check per event type: MLE rate
    # lambda = n/sum(gaps); the empirical p25/p50/p75 of gaps (exact
    # integer ms, discrete percentiles) are compared against the
    # exponential quantiles ln(4/3)/l, ln(2)/l, ln(4)/l. Discrepancy =
    # max relative gap on a 1e-4 grid. Poisson-ness decides whether
    # capacity math (event_littles_law) may assume memorylessness.
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             CAST((epoch_us(ts) - lag(epoch_us(ts)) OVER
                   (PARTITION BY event_type ORDER BY ts, event_id)) // 1000
                  AS BIGINT) AS gap_ms
      FROM events
    ), g AS (SELECT * FROM gaps WHERE gap_ms IS NOT NULL AND gap_ms > 0)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(SUM(gap_ms) AS BIGINT) AS total_ms,
           CAST(quantile_disc(gap_ms, 0.25) AS BIGINT) AS p25_ms,
           CAST(quantile_disc(gap_ms, 0.50) AS BIGINT) AS p50_ms,
           CAST(quantile_disc(gap_ms, 0.75) AS BIGINT) AS p75_ms,
           floor(greatest(
             abs(quantile_disc(gap_ms, 0.25)
                 - ln(4.0/3.0) * SUM(gap_ms) / COUNT(*))
               / (ln(4.0/3.0) * SUM(gap_ms) / COUNT(*)),
             abs(quantile_disc(gap_ms, 0.50)
                 - ln(2.0) * SUM(gap_ms) / COUNT(*))
               / (ln(2.0) * SUM(gap_ms) / COUNT(*)),
             abs(quantile_disc(gap_ms, 0.75)
                 - ln(4.0) * SUM(gap_ms) / COUNT(*))
               / (ln(4.0) * SUM(gap_ms) / COUNT(*))
           ) * 10000 + 0.5) / 10000 AS max_rel_discrepancy
    FROM g GROUP BY event_type
    """,
)
def event_inter_arrival_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are arrivals Poisson? Fit an exponential to inter-event gaps
    per type (MLE mean = Σgap/n) and report the worst relative gap
    between the empirical quartiles and the exponential's theoretical
    quantiles (mean·ln 4/3, mean·ln 2, mean·ln 4) — a 3-point
    Q-Q check. Memorylessness is the assumption behind every queueing
    shortcut (event_littles_law); this key measures whether it holds.

    Exactness: gaps are exact integer ms; quartiles are DISCRETE
    percentiles (actual data values); the discrepancy combines exact
    integers with ln constants in one identical double expression on
    both engines, then lands on a 1e-4 grid. Scale shape: one lag
    window + one agg, both partitioned by event_type.
    """
    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    g = (
        e.select(
            "event_type",
            ((us - F.lag(us).over(w)) / 1000).cast("bigint").alias("gap_ms"),
        )
        .where(F.col("gap_ms").isNotNull() & (F.col("gap_ms") > 0))
    )
    q = lambda p: F.expr(  # noqa: E731
        f"percentile_disc({p}) WITHIN GROUP (ORDER BY gap_ms)"
    ).cast("bigint")
    mean = F.sum("gap_ms").cast("double") / F.count(F.lit(1))
    import math

    def rel(quant, lnc):
        theo = F.lit(lnc) * mean
        return F.abs(quant - theo) / theo

    disc = F.greatest(
        rel(q(0.25), math.log(4.0 / 3.0)),
        rel(q(0.50), math.log(2.0)),
        rel(q(0.75), math.log(4.0)),
    )
    return g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("gap_ms").cast("bigint").alias("total_ms"),
        q(0.25).alias("p25_ms"),
        q(0.50).alias("p50_ms"),
        q(0.75).alias("p75_ms"),
        (F.floor(disc * 10000 + 0.5) / 10000).alias("max_rel_discrepancy"),
    )


@register(
    "orders_cohort_ltv",
    # Cohort LTV curves: customers grouped by first-order month, value
    # accumulated by cohort age in months; LTV per customer = running
    # exact cents / cohort size. The money view of retention_cohort.
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             date_trunc('month', MIN(o_orderdate)) AS cohort_m
      FROM orders GROUP BY o_custkey
    ), sized AS (
      SELECT cohort_m, COUNT(*) AS n_cohort FROM firsts GROUP BY cohort_m
    ), spend AS (
      SELECT f.cohort_m,
             CAST(date_diff('month', f.cohort_m,
                            date_trunc('month', o.o_orderdate)) AS BIGINT)
               AS age_m,
             CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
      GROUP BY 1, 2
    )
    SELECT CAST(epoch(s.cohort_m) AS BIGINT) AS cohort_s,
           s.age_m,
           CAST(z.n_cohort AS BIGINT) AS n_cohort,
           CAST(SUM(s.cents) OVER (PARTITION BY s.cohort_m ORDER BY s.age_m)
                AS BIGINT) AS cum_cents,
           floor(CAST(SUM(s.cents) OVER (PARTITION BY s.cohort_m
                                         ORDER BY s.age_m) AS DOUBLE)
                 / z.n_cohort / 100 * 10000 + 0.5) / 10000 AS ltv_per_cust
    FROM spend s JOIN sized z ON z.cohort_m = s.cohort_m
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: for each first-order-month cohort,
    cumulative revenue per customer by months-since-acquisition — the
    money companion of retention_cohort (retention says WHO comes
    back; LTV says what that's worth), and the payback-period input
    every acquisition-spend decision uses.

    Exactness: cents are exact BIGINTs; the cumulative sum is a
    window over the (cohort, age) AGGREGATED grain (months × months
    rows, not orders); LTV is one division per row. Scale shape: one
    min-agg for cohorts, one join + hash agg to the cohort-age grain,
    one tiny window.
    """
    o = load_tables(spark, sf_dir)["orders"]
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_m")
    )
    sized = firsts.groupBy("cohort_m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cohort")
    )
    spend = (
        o.join(firsts, "o_custkey")
        .groupBy(
            "cohort_m",
            F.months_between(
                F.date_trunc("month", "o_orderdate"), F.col("cohort_m")
            )
            .cast("bigint")
            .alias("age_m"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    w = Window.partitionBy("cohort_m").orderBy("age_m")
    cum = F.sum("cents").over(w).cast("bigint")
    return spend.join(F.broadcast(sized), "cohort_m").select(
        F.unix_timestamp("cohort_m").alias("cohort_s"),
        "age_m",
        "n_cohort",
        cum.alias("cum_cents"),
        (
            F.floor(
                cum.cast("double") / F.col("n_cohort") / 100 * 10000 + 0.5
            )
            / 10000
        ).alias("ltv_per_cust"),
    )


@register(
    "agg_theil_index",
    # Theil-T inequality per priority segment: T = sum(x/X * ln(x/mu))
    # over customer revenues. Each customer's ln term is grid-floored
    # at 1e-6 then weighted by exact cents and summed as DECIMAL(38,0)
    # — completing the inequality trio (Gini rank-based, HHI
    # quadratic, Theil entropy-based/decomposable).
    oracle="""
    WITH cust AS (
      SELECT o_orderpriority, o_custkey,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ), seg AS (
      SELECT o_orderpriority,
             CAST(SUM(cents) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM cust GROUP BY o_orderpriority
    ), terms AS (
      SELECT c.o_orderpriority, c.cents, s.total, s.n,
             CAST(floor(ln(CAST(c.cents AS DOUBLE) * s.n / s.total)
                        * 1000000) AS BIGINT) AS ln_g
      FROM cust c JOIN seg s USING (o_orderpriority)
      WHERE c.cents > 0
    )
    SELECT o_orderpriority,
           CAST(MAX(n) AS BIGINT) AS n_customers,
           CAST(MAX(total) AS BIGINT) AS cents_total,
           floor(CAST(SUM(CAST(cents AS DECIMAL(38,0)) * ln_g) AS DOUBLE)
                 / MAX(total) / 1000000 * 1000000 + 0.5) / 1000000
             AS theil_t
    FROM terms GROUP BY o_orderpriority
    """,
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T index of customer revenue concentration per priority —
    the entropy-based member of the inequality family, and the only
    one that DECOMPOSES additively (total inequality = within-group +
    between-group), which is why economists reach for it when the
    question is 'where does the concentration live'. T = Σ (xᵢ/X)·
    ln(xᵢ/μ): 0 = equal, ln(n) = one customer has everything.

    Exactness: ln(x·n/X) is grid-floored at 1e-6 per customer, then
    weighted by exact cents with the products accumulated in
    DECIMAL(38,0); one IEEE division at the end. Scale: two hash
    aggregates + one broadcast-joined segment table — same shape as
    agg_herfindahl_index.
    """
    o = load_tables(spark, sf_dir)["orders"]
    cust = o.groupBy("o_orderpriority", "o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    seg = cust.groupBy("o_orderpriority").agg(
        F.sum("cents").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    ln_g = F.floor(
        F.log(F.col("cents").cast("double") * F.col("n") / F.col("total"))
        * 1000000
    ).cast("bigint")
    terms = (
        cust.join(F.broadcast(seg), "o_orderpriority")
        .where(F.col("cents") > 0)
        .select("o_orderpriority", "cents", "total", "n", ln_g.alias("ln_g"))
    )
    return terms.groupBy("o_orderpriority").agg(
        F.max("n").cast("bigint").alias("n_customers"),
        F.max("total").cast("bigint").alias("cents_total"),
        (
            F.floor(
                F.sum(F.col("cents").cast("decimal(38,0)") * F.col("ln_g"))
                .cast("double")
                / F.max("total")
                / 1000000
                * 1000000
                + 0.5
            )
            / 1000000
        ).alias("theil_t"),
    )


@register(
    "event_new_vs_returning",
    # Daily new-vs-returning user split: a user's first-ever day is
    # "new", later days "returning" — the top-of-dashboard growth
    # decomposition (retention_cohort gives the matrix; this gives
    # the daily headline).
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_s
      FROM events
    ), firsts AS (
      SELECT user_id, MIN(day_s) AS first_day FROM ud GROUP BY user_id
    )
    SELECT ud.day_s,
           CAST(SUM(CASE WHEN ud.day_s = f.first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN ud.day_s > f.first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returning,
           floor(CAST(SUM(CASE WHEN ud.day_s > f.first_day THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*) * 10000 + 0.5) / 10000
             AS returning_share
    FROM ud JOIN firsts f USING (user_id)
    GROUP BY ud.day_s
    """,
)
def event_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split into new vs returning — the growth
    headline every product dashboard leads with, and the daily-grain
    companion of retention_cohort's cohort matrix. A user is 'new' on
    their first-ever active day, 'returning' on every later one.

    Scale shape: the raw stream collapses to DISTINCT (user, day)
    immediately; firsts are one min-agg per user; the classify join
    shares the user_id shuffle key. Exact integer counts; one
    division per day.
    """
    e = load_tables(spark, sf_dir)["events"]
    ud = e.select(
        "user_id",
        F.unix_timestamp(F.date_trunc("day", "ts")).alias("day_s"),
    ).distinct()
    firsts = ud.groupBy("user_id").agg(F.min("day_s").alias("first_day"))
    j = ud.join(firsts, "user_id")
    n_new = F.sum(
        F.when(F.col("day_s") == F.col("first_day"), 1).otherwise(0)
    ).cast("bigint")
    n_ret = F.sum(
        F.when(F.col("day_s") > F.col("first_day"), 1).otherwise(0)
    ).cast("bigint")
    return j.groupBy("day_s").agg(
        n_new.alias("n_new"),
        n_ret.alias("n_returning"),
        (
            F.floor(n_ret.cast("double") / F.count(F.lit(1)) * 10000 + 0.5)
            / 10000
        ).alias("returning_share"),
    )


@register(
    "orders_sales_mix_shift",
    # Price-volume decomposition of period-over-period revenue change
    # per priority: split H1->H2 delta into a volume effect
    # (dn x avg_old cents) and a value effect (n_new x d_avg), exact
    # where possible, the two effects reconciling to the total delta
    # by construction (laspeyres volume + paasche value split).
    oracle="""
    WITH mid AS (
      SELECT CAST(epoch(MIN(o_orderdate)) AS BIGINT)
             + (CAST(epoch(MAX(o_orderdate)) AS BIGINT)
                - CAST(epoch(MIN(o_orderdate)) AS BIGINT)) // 2 AS m
      FROM orders
    ), per AS (
      SELECT o_orderpriority,
             CASE WHEN CAST(epoch(o_orderdate) AS BIGINT)
                       < (SELECT m FROM mid) THEN 'h1'
                  ELSE 'h2' END AS half,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ), wide AS (
      SELECT o_orderpriority,
             MAX(CASE WHEN half = 'h1' THEN n END) AS n1,
             MAX(CASE WHEN half = 'h1' THEN cents END) AS c1,
             MAX(CASE WHEN half = 'h2' THEN n END) AS n2,
             MAX(CASE WHEN half = 'h2' THEN cents END) AS c2
      FROM per GROUP BY o_orderpriority
    )
    SELECT o_orderpriority,
           CAST(c2 - c1 AS BIGINT) AS delta_cents,
           floor((n2 - n1) * (CAST(c1 AS DOUBLE) / n1) * 0.01
                 * 100 + 0.5) / 100 AS volume_effect,
           floor(n2 * (CAST(c2 AS DOUBLE) / n2 - CAST(c1 AS DOUBLE) / n1)
                 * 0.01 * 100 + 0.5) / 100 AS value_effect
    FROM wide
    """,
)
def orders_sales_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume decomposition — finance's standard answer to 'did
    revenue move because we sold MORE or because orders got BIGGER':
    ΔR = Δn·avg₁ (volume effect, at old average value) + n₂·Δavg
    (value effect, at new volume). The two effects sum to the total
    delta identically, which is what makes the bridge auditable.
    Periods are the date-range halves of the fixture.

    Exactness: per-half counts and cents are exact; the two effects
    are identical double expressions on both engines, rounded to
    whole-dollar 2dp at the end. Scale: one conditional hash agg per
    (priority, half) + a 10-row pivot — no window, no join beyond
    the 1-row midpoint broadcast.
    """
    o = load_tables(spark, sf_dir)["orders"]
    lo = F.unix_timestamp(F.min("o_orderdate"))
    hi = F.unix_timestamp(F.max("o_orderdate"))
    mid = o.agg(
        (lo + F.floor((hi - lo) / 2)).cast("long").alias("m")
    )
    per = (
        o.crossJoin(F.broadcast(mid))
        .select(
            "o_orderpriority",
            F.when(F.unix_timestamp("o_orderdate") < F.col("m"), "h1")
            .otherwise("h2")
            .alias("half"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
        )
        .groupBy("o_orderpriority", "half")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )
    wide = per.groupBy("o_orderpriority").agg(
        F.max(F.when(F.col("half") == "h1", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("half") == "h1", F.col("cents"))).alias("c1"),
        F.max(F.when(F.col("half") == "h2", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("half") == "h2", F.col("cents"))).alias("c2"),
    )
    avg1 = F.col("c1").cast("double") / F.col("n1")
    avg2 = F.col("c2").cast("double") / F.col("n2")
    return wide.select(
        "o_orderpriority",
        (F.col("c2") - F.col("c1")).cast("bigint").alias("delta_cents"),
        (
            F.floor((F.col("n2") - F.col("n1")) * avg1 * 0.01 * 100 + 0.5) / 100
        ).alias("volume_effect"),
        (
            F.floor(F.col("n2") * (avg2 - avg1) * 0.01 * 100 + 0.5) / 100
        ).alias("value_effect"),
    )


@register(
    "inventory_abc_xyz",
    # ABC×XYZ inventory matrix: parts classed by cumulative revenue
    # share (A ≤80%, B ≤95%, C) AND by weekly-demand variability
    # (X: CV < 0.5, Y: CV < 1.0, Z). Both axes decided by integer
    # cross-multiplication — cumulative cents vs total thresholds,
    # CV² vs 1/4 and 1 via exact weekly-quantity moments.
    oracle="""
    WITH wk AS (
      SELECT l_partkey,
             CAST(epoch(date_trunc('week', l_shipdate)) AS BIGINT) AS week_s,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ), var_m AS (
      SELECT l_partkey,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS s1,
             CAST(SUM(q * q) AS BIGINT) AS s2
      FROM wk GROUP BY l_partkey
    ), rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM lineitem GROUP BY l_partkey
    ), cum AS (
      SELECT l_partkey, rev_c,
             SUM(rev_c) OVER (ORDER BY rev_c DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c,
             SUM(rev_c) OVER () AS total_c
      FROM rev
    ), classed AS (
      SELECT c.l_partkey, c.rev_c,
             CASE WHEN c.cum_c * 100 <= c.total_c * 80 THEN 'A'
                  WHEN c.cum_c * 100 <= c.total_c * 95 THEN 'B'
                  ELSE 'C' END AS abc,
             CASE WHEN v.n < 2 THEN 'Z'
                  WHEN (v.n * v.s2 - v.s1 * v.s1) * 4 < v.s1 * v.s1 THEN 'X'
                  WHEN (v.n * v.s2 - v.s1 * v.s1) < v.s1 * v.s1 THEN 'Y'
                  ELSE 'Z' END AS xyz
      FROM cum c JOIN var_m v ON v.l_partkey = c.l_partkey
    )
    SELECT abc, xyz,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev_c) AS BIGINT) AS revenue_cents,
           floor(CAST(SUM(rev_c) AS DOUBLE)
                 / (SELECT SUM(rev_c) FROM rev) * 1000000 + 0.5) / 1000000
             AS revenue_share
    FROM classed GROUP BY abc, xyz
    """,
)
def inventory_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC×XYZ inventory matrix — the planning grid every supply-chain
    org draws: value concentration (ABC, cumulative revenue cuts at
    80/95%) crossed with demand PREDICTABILITY (XYZ, coefficient of
    variation of weekly quantity: X steady < 0.5, Y < 1.0, Z erratic
    or single-week). AX items get automated replenishment, CZ items
    get made-to-order — the matrix is the routing table.

    Exactness: revenue cuts compare integer cumulative cents against
    integer thresholds of the total (agg_abc_classification's rule);
    CV classes compare exact integer moments cross-multiplied
    ((n·Σq² − S²)·4 < S² ⇔ CV < 0.5) — no float touches either axis.
    Scale shape: two hash aggregates to the part grain, a cumulative
    window on the PART grain (not line rows), one join.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    wk = li.groupBy(
        "l_partkey",
        F.unix_timestamp(F.date_trunc("week", "l_shipdate")).alias("week_s"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("q"))
    var_m = wk.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("s1"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("s2"),
    )
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("rev_c")
    )
    w_cum = Window.orderBy(F.col("rev_c").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = rev.select(
        "l_partkey",
        "rev_c",
        F.sum("rev_c").over(w_cum).alias("cum_c"),
        F.sum("rev_c").over(w_all).alias("total_c"),
    )
    var_num = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    s1sq = F.col("s1") * F.col("s1")
    classed = cum.join(var_m, "l_partkey").select(
        "rev_c",
        F.when(F.col("cum_c") * 100 <= F.col("total_c") * 80, "A")
        .when(F.col("cum_c") * 100 <= F.col("total_c") * 95, "B")
        .otherwise("C")
        .alias("abc"),
        F.when(F.col("n") < 2, "Z")
        .when(var_num * 4 < s1sq, "X")
        .when(var_num < s1sq, "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    tot = rev.agg(F.sum("rev_c").cast("bigint").alias("all_c"))
    return (
        classed.groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("rev_c").cast("bigint").alias("revenue_cents"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "abc",
            "xyz",
            "n_parts",
            "revenue_cents",
            (
                F.floor(
                    F.col("revenue_cents").cast("double")
                    / F.col("all_c")
                    * 1000000
                    + 0.5
                )
                / 1000000
            ).alias("revenue_share"),
        )
    )


@register(
    "time_peak_detection",
    # Local-peak detection with prominence on the daily series per
    # type: a peak day strictly exceeds both neighbors AND clears the
    # larger neighbor by 20% (5n >= 6*max(prev,next), integer
    # cross-multiplied). The alerting primitive between
    # event_anomaly_zscore (global outliers) and
    # time_changepoint_cusum (level shifts) — peaks are LOCAL events.
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), nb AS (
      SELECT event_type, day_s, n,
             lag(n) OVER w AS prev_n, lead(n) OVER w AS next_n
      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day_s)
    ), peaks AS (
      SELECT * FROM nb
      WHERE prev_n IS NOT NULL AND next_n IS NOT NULL
        AND n > prev_n AND n > next_n
        AND 5 * n >= 6 * greatest(prev_n, next_n)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_peaks,
           CAST(MAX(n) AS BIGINT) AS max_peak_n,
           CAST(MIN(CASE WHEN n = (SELECT MAX(p2.n) FROM peaks p2
                                   WHERE p2.event_type = peaks.event_type)
                         THEN day_s END) AS BIGINT) AS max_peak_day_s
    FROM peaks GROUP BY event_type
    """,
)
def time_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-peak detection on the daily event series: a day is a peak
    when it strictly exceeds both neighbors AND clears the larger one
    by ≥ 20% (the prominence guard that kills noise wiggles). Counts
    and the argmax peak per type — launch days, incident spikes,
    campaign hits: the LOCAL-event detector between
    event_anomaly_zscore's global outliers and
    time_changepoint_cusum's level shifts.

    Exactness: prominence decided by 5n ≥ 6·max(neighbors) — pure
    integers; the argmax day uses a min-day tie-break via one
    conditional aggregate (no second scan). Scale shape: lag/lead on
    the (type, day) aggregated grain.
    """
    e = load_tables(spark, sf_dir)["events"]
    daily = e.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("day", "ts")).alias("day_s"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day_s")
    nb = daily.select(
        "event_type",
        "day_s",
        "n",
        F.lag("n").over(w).alias("prev_n"),
        F.lead("n").over(w).alias("next_n"),
    )
    peaks = nb.where(
        F.col("prev_n").isNotNull()
        & F.col("next_n").isNotNull()
        & (F.col("n") > F.col("prev_n"))
        & (F.col("n") > F.col("next_n"))
        & (5 * F.col("n") >= 6 * F.greatest("prev_n", "next_n"))
    )
    w_max = Window.partitionBy("event_type")
    flagged = peaks.withColumn("max_n", F.max("n").over(w_max))
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_peaks"),
        F.max("n").cast("bigint").alias("max_peak_n"),
        F.min(F.when(F.col("n") == F.col("max_n"), F.col("day_s")))
        .cast("bigint")
        .alias("max_peak_day_s"),
    )


@register(
    "supply_single_source_risk",
    # Single-source supply risk: parts bucketed by supplier diversity
    # (1 / 2 / 3+ distinct suppliers observed), with each bucket's
    # part count and revenue at risk — the resilience report behind
    # every supply-chain review. Exact distinct counts and cents.
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
             CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM lineitem GROUP BY l_partkey
    ), bucketed AS (
      SELECT CASE WHEN n_supp = 1 THEN 'single'
                  WHEN n_supp = 2 THEN 'dual'
                  ELSE 'multi' END AS sourcing,
             rev_c
      FROM per_part
    )
    SELECT sourcing,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev_c) AS BIGINT) AS revenue_cents,
           floor(CAST(SUM(rev_c) AS DOUBLE)
                 / (SELECT SUM(rev_c) FROM per_part) * 10000 + 0.5) / 10000
             AS revenue_share
    FROM bucketed GROUP BY sourcing
    """,
)
def supply_single_source_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source risk report: how much revenue flows through parts
    with exactly one observed supplier (no failover), two (fragile),
    or three-plus (resilient). The supply-chain review's first
    slide — and the procurement action list is literally the 'single'
    bucket sorted by revenue. Complements inventory_abc_xyz: ABC-XYZ
    says what to stock, this says where a supplier outage hurts.

    Scale shape: one (partkey) hash aggregate with a distinct-count
    and a cents sum, then a 3-group rollup; the grand total is a
    1-row broadcast. All integers until the final share divisions.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    per_part = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").cast("bigint").alias("n_supp"),
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("rev_c"),
    )
    tot = per_part.agg(F.sum("rev_c").cast("bigint").alias("all_c"))
    bucketed = per_part.select(
        F.when(F.col("n_supp") == 1, "single")
        .when(F.col("n_supp") == 2, "dual")
        .otherwise("multi")
        .alias("sourcing"),
        "rev_c",
    )
    return (
        bucketed.groupBy("sourcing")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("rev_c").cast("bigint").alias("revenue_cents"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "sourcing",
            "n_parts",
            "revenue_cents",
            pround(F.col("revenue_cents").cast("double") / F.col("all_c")).alias(
                "revenue_share"
            ),
        )
    )


@register(
    "part_price_consistency",
    # Pricing data-quality: per part, the spread of observed unit
    # prices (extendedprice / quantity, exact cents-per-unit on a
    # 1e-2 grid); parts bucketed by max/min price ratio decided with
    # integer cross-multiplication (max*10 vs min*{12,15,20}) — the
    # catalog-hygiene sweep beside orders_duplicate_billing.
    oracle="""
    WITH unit AS (
      SELECT l_partkey,
             CAST(floor(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT)
               AS unit_c
      FROM lineitem WHERE l_quantity > 0
    ), per AS (
      SELECT l_partkey,
             CAST(COUNT(*) AS BIGINT) AS n_obs,
             CAST(MIN(unit_c) AS BIGINT) AS min_c,
             CAST(MAX(unit_c) AS BIGINT) AS max_c
      FROM unit GROUP BY l_partkey
    ), classed AS (
      SELECT CASE WHEN max_c * 10 <= min_c * 12 THEN 'tight'
                  WHEN max_c * 10 <= min_c * 15 THEN 'loose'
                  WHEN max_c * 10 <= min_c * 20 THEN 'wide'
                  ELSE 'suspect' END AS spread,
             n_obs
      FROM per
    )
    SELECT spread,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(n_obs) AS BIGINT) AS n_lines,
           floor(CAST(COUNT(*) AS DOUBLE)
                 / (SELECT COUNT(*) FROM per) * 10000 + 0.5) / 10000
             AS part_share
    FROM classed GROUP BY spread
    """,
)
def part_price_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-consistency audit: for each part, how far apart are the
    unit prices it actually sold at? Parts bucket into tight (≤1.2×
    min..max ratio) / loose (≤1.5×) / wide (≤2×) / suspect (>2×) —
    the 'suspect' bucket is the catalog-hygiene worklist (mistyped
    prices, unit confusion, unauthorized discounts). Transaction-
    grain data quality beside orders_duplicate_billing's duplicate
    sweep.

    Exactness: unit prices land on the cents grid; the ratio buckets
    are integer cross-multiplications (max·10 ≤ min·12 ⇔ ratio ≤
    1.2) — no float decides a bucket. Scale: one hash agg to the part
    grain, then a 4-group rollup.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    unit = li.where(F.col("l_quantity") > 0).select(
        "l_partkey",
        F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 100 + 0.5)
        .cast("bigint")
        .alias("unit_c"),
    )
    per = unit.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.min("unit_c").cast("bigint").alias("min_c"),
        F.max("unit_c").cast("bigint").alias("max_c"),
    )
    tot = per.agg(F.count(F.lit(1)).cast("bigint").alias("n_all"))
    classed = per.select(
        F.when(F.col("max_c") * 10 <= F.col("min_c") * 12, "tight")
        .when(F.col("max_c") * 10 <= F.col("min_c") * 15, "loose")
        .when(F.col("max_c") * 10 <= F.col("min_c") * 20, "wide")
        .otherwise("suspect")
        .alias("spread"),
        "n_obs",
    )
    return (
        classed.groupBy("spread")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("n_obs").cast("bigint").alias("n_lines"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "spread",
            "n_parts",
            "n_lines",
            pround(F.col("n_parts").cast("double") / F.col("n_all")).alias(
                "part_share"
            ),
        )
    )


@register(
    "event_audience_overlap",
    # Audience-overlap matrix: Jaccard of the USER sets behind each
    # ordered event-type pair, from exact distinct counts — |A∩B| via
    # one (user, type-pair) co-membership join on the distinct
    # (user, type) grain, |A|, |B| from per-type distincts.
    oracle="""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), per AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM ut GROUP BY event_type
    ), inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM ut a JOIN ut b
        ON b.user_id = a.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, i.n_both,
           pa.n_users AS n_a, pb.n_users AS n_b,
           floor(CAST(i.n_both AS DOUBLE)
                 / (pa.n_users + pb.n_users - i.n_both) * 10000 + 0.5) / 10000
             AS jaccard
    FROM inter i
    JOIN per pa ON pa.event_type = i.type_a
    JOIN per pb ON pb.event_type = i.type_b
    """,
)
def event_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: for every event-type pair, the Jaccard
    similarity of their USER sets — do clickers purchase, do viewers
    click? The audience-planning readout that assoc_basket_lift gives
    for products and event_seq2_mining gives for sequences, here for
    populations (order-free, time-free).

    Scale shape: the stream collapses to DISTINCT (user, type)
    immediately (|users| × |types| rows max); the intersection join
    shares the user_id shuffle; the matrix is |types|² tiny. All
    counts exact; one division per pair.
    """
    e = load_tables(spark, sf_dir)["events"]
    ut = e.select("user_id", "event_type").distinct()
    per = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    inter = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    pa = per.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a"))
    pb = per.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b"))
    return (
        inter.join(F.broadcast(pa), "type_a")
        .join(F.broadcast(pb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            pround(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both"))
            ).alias("jaccard"),
        )
    )


@register(
    "event_retention_curve_fit",
    # Retention-curve model: r(age) ~ r0 * exp(-lambda*age) fitted by
    # log-linear OLS over the cohort-averaged retention-by-age curve
    # (ages >= 1). Every retention rate is an exact rational of
    # distinct counts; its ln lands on a 1e-6 grid; the OLS moments
    # are exact integer sums over the AGE grain (weeks, not users).
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(epoch(date_trunc('week', ts)) AS BIGINT) AS week_s
      FROM events
    ), firsts AS (
      SELECT user_id, MIN(week_s) AS w0 FROM ud GROUP BY user_id
    ), ages AS (
      SELECT ud.user_id, (ud.week_s - f.w0) // 604800 AS age_w
      FROM ud JOIN firsts f USING (user_id)
    ), cohort_n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM firsts
    ), curve AS (
      SELECT age_w,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
      FROM ages WHERE age_w >= 1 GROUP BY age_w
    ), pts AS (
      SELECT age_w AS x,
             CAST(floor(ln(CAST(n_active AS DOUBLE) / cohort_n.n0)
                        * 1000000) AS BIGINT) AS y_g
      FROM curve CROSS JOIN cohort_n
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y_g) AS BIGINT) AS sy,
             CAST(SUM(x * y_g) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts
    )
    SELECT n AS n_ages,
           floor(-(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 / 1000000 * 1000000 + 0.5) / 1000000 AS decay_lambda,
           floor((CAST(sy AS DOUBLE) / n
                  - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                    * (CAST(sx AS DOUBLE) / n))
                 / 1000000 * 1000000 + 0.5) / 1000000 AS ln_r0
    FROM m
    """,
)
def event_retention_curve_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-curve model fit: r(age) ≈ r₀·e^(−λ·age) by log-linear
    OLS over weekly retention-by-age. retention_cohort gives the raw
    matrix; this key compresses it to the two numbers planning
    actually uses — the decay rate λ (how fast users churn) and the
    intercept ln r₀ (the week-1 anchor) — the inputs to every LTV
    projection (orders_cohort_ltv measures the past; this
    extrapolates it).

    Exactness: retention rates are exact rationals of distinct
    counts, grid-floored in log space at 1e-6; OLS moments are exact
    integer sums over the AGE grain (a handful of weeks). Scale:
    distinct (user, week) collapse, one min-agg, one age-grain agg —
    the regression itself is arithmetic on one row of moments.
    """
    e = load_tables(spark, sf_dir)["events"]
    ud = e.select(
        "user_id",
        F.unix_timestamp(F.date_trunc("week", "ts")).alias("week_s"),
    ).distinct()
    firsts = ud.groupBy("user_id").agg(F.min("week_s").alias("w0"))
    ages = ud.join(firsts, "user_id").select(
        "user_id",
        ((F.col("week_s") - F.col("w0")) / 604800).cast("bigint").alias("age_w"),
    )
    n0 = firsts.agg(F.count(F.lit(1)).cast("bigint").alias("n0"))
    curve = (
        ages.where(F.col("age_w") >= 1)
        .groupBy("age_w")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
    )
    pts = curve.crossJoin(F.broadcast(n0)).select(
        F.col("age_w").alias("x"),
        F.floor(
            F.log(F.col("n_active").cast("double") / F.col("n0")) * 1000000
        )
        .cast("bigint")
        .alias("y_g"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y_g").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y_g")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    slope = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    return m.select(
        F.col("n").alias("n_ages"),
        (F.floor(-slope / 1000000 * 1000000 + 0.5) / 1000000).alias(
            "decay_lambda"
        ),
        (
            F.floor(
                (
                    F.col("sy").cast("double") / F.col("n")
                    - slope * (F.col("sx").cast("double") / F.col("n"))
                )
                / 1000000
                * 1000000
                + 0.5
            )
            / 1000000
        ).alias("ln_r0"),
    )


PSI_BANDS = (10.0, 25.0, 50.0, 75.0, 90.0)  # fixed value-band edges


@register(
    "event_psi_value_drift",
    # Population Stability Index between the two halves of the event
    # timeline over fixed value bands: PSI = sum (p2-p1)*ln(p2/p1).
    # Counts exact; shares smoothed add-0.5; each band's ln ratio
    # grid-floored at 1e-6 before the weighted sum — the standard
    # ML-monitoring drift alarm (PSI < 0.1 stable, > 0.25 drifted).
    oracle=f"""
    WITH mid AS (
      SELECT CAST(epoch(MIN(ts)) AS BIGINT)
             + (CAST(epoch(MAX(ts)) AS BIGINT)
                - CAST(epoch(MIN(ts)) AS BIGINT)) // 2 AS m
      FROM events
    ), banded AS (
      SELECT CASE WHEN CAST(epoch(ts) AS BIGINT) < (SELECT m FROM mid)
                  THEN 'p1' ELSE 'p2' END AS period,
             CASE WHEN value < {PSI_BANDS[0]} THEN 0
                  WHEN value < {PSI_BANDS[1]} THEN 1
                  WHEN value < {PSI_BANDS[2]} THEN 2
                  WHEN value < {PSI_BANDS[3]} THEN 3
                  WHEN value < {PSI_BANDS[4]} THEN 4
                  ELSE 5 END AS band
      FROM events
    ), counts AS (
      SELECT band,
             CAST(SUM(CASE WHEN period = 'p1' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN period = 'p2' THEN 1 ELSE 0 END) AS BIGINT) AS n2
      FROM banded GROUP BY band
    ), tot AS (
      SELECT CAST(SUM(n1) AS BIGINT) AS t1, CAST(SUM(n2) AS BIGINT) AS t2
      FROM counts
    ), terms AS (
      SELECT band, n1, n2,
             (n2 + 0.5) / (tot.t2 + 3.0) - (n1 + 0.5) / (tot.t1 + 3.0) AS dp,
             CAST(floor(ln(((n2 + 0.5) / (tot.t2 + 3.0))
                           / ((n1 + 0.5) / (tot.t1 + 3.0))) * 1000000)
                  AS BIGINT) AS ln_g
      FROM counts CROSS JOIN tot
    )
    SELECT band, n1, n2,
           floor(dp * ln_g / 1000000 * 1000000 + 0.5) / 1000000
             AS psi_contrib
    FROM terms
    """,
)
def event_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index — the ML-monitoring standard for
    'did my feature distribution move': value bands from fixed edges,
    compared between the two halves of the event timeline; per-band
    contribution (p₂−p₁)·ln(p₂/p₁), with the usual rule of thumb
    Σ < 0.1 stable, > 0.25 retrain. Completes the drift family:
    corpus_js_divergence watches text, embedding_quality_audit
    watches vectors, PSI watches scalar features.

    Exactness: integer-second midpoint and integer band cuts; counts
    exact; add-0.5 Laplace keeps empty bands finite; each ln ratio
    lands on a 1e-6 grid before multiplying the share delta. Scale:
    one conditional hash agg over 6 bands — the cheapest drift alarm
    possible.
    """
    e = load_tables(spark, sf_dir)["events"]
    lo = F.unix_timestamp(F.min("ts"))
    hi = F.unix_timestamp(F.max("ts"))
    mid = e.agg((lo + F.floor((hi - lo) / 2)).cast("long").alias("m"))
    band = (
        F.when(F.col("value") < PSI_BANDS[0], 0)
        .when(F.col("value") < PSI_BANDS[1], 1)
        .when(F.col("value") < PSI_BANDS[2], 2)
        .when(F.col("value") < PSI_BANDS[3], 3)
        .when(F.col("value") < PSI_BANDS[4], 4)
        .otherwise(5)
    )
    banded = e.crossJoin(F.broadcast(mid)).select(
        F.when(F.unix_timestamp("ts") < F.col("m"), "p1")
        .otherwise("p2")
        .alias("period"),
        band.alias("band"),
    )
    counts = banded.groupBy("band").agg(
        F.sum(F.when(F.col("period") == "p1", 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("period") == "p2", 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
    )
    tot = counts.agg(
        F.sum("n1").cast("bigint").alias("t1"),
        F.sum("n2").cast("bigint").alias("t2"),
    )
    p1 = (F.col("n1") + 0.5) / (F.col("t1") + 3.0)
    p2 = (F.col("n2") + 0.5) / (F.col("t2") + 3.0)
    ln_g = F.floor(F.log(p2 / p1) * 1000000).cast("bigint")
    return counts.crossJoin(F.broadcast(tot)).select(
        "band",
        "n1",
        "n2",
        (
            F.floor((p2 - p1) * ln_g / 1000000 * 1000000 + 0.5) / 1000000
        ).alias("psi_contrib"),
    )


@register(
    "orders_quarter_end_loading",
    # Revenue pull-forward detection: share of each quarter's revenue
    # booked in its last 3 days vs the ~3.3% a uniform quarter would
    # give. Exact cents; the loading flag decided by integer
    # cross-multiplication (last3_cents * 10 > total_cents) — the
    # behavioral forensic screen beside agg_benford_digits' digit
    # test.
    oracle="""
    WITH q AS (
      SELECT date_trunc('quarter', o_orderdate) AS qtr,
             o_orderdate,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ), bounds AS (
      SELECT qtr, MAX(o_orderdate) AS q_last FROM q GROUP BY qtr
    ), flagged AS (
      SELECT q.qtr, q.cents,
             CASE WHEN q.o_orderdate > b.q_last - INTERVAL 3 DAY
                  THEN 1 ELSE 0 END AS in_last3
      FROM q JOIN bounds b ON b.qtr = q.qtr
    )
    SELECT CAST(epoch(qtr) AS BIGINT) AS quarter_s,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(SUM(in_last3 * cents) AS BIGINT) AS last3_cents,
           floor(CAST(SUM(in_last3 * cents) AS DOUBLE) / SUM(cents)
                 * 10000 + 0.5) / 10000 AS last3_share,
           CAST(CASE WHEN SUM(in_last3 * cents) * 10 > SUM(cents)
                     THEN 1 ELSE 0 END AS INT) AS loaded
    FROM flagged GROUP BY qtr
    """,
)
def orders_quarter_end_loading(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarter-end loading detection: what share of each quarter's
    revenue lands in its final 3 days? A uniform quarter gives ~3.3%;
    a persistently loaded quarter (flag: > 10%, decided by integer
    cross-multiplication) is the classic revenue-pull-forward /
    sales-incentive distortion auditors screen for — the behavioral
    companion of agg_benford_digits' numeric screen.

    Exactness: exact cents; the quarter's 'last day' comes from the
    data (MAX per quarter — robust to partial final quarters); the
    flag never touches a float. Scale: one quarter-grain max-agg
    broadcast back + one conditional hash agg.
    """
    o = load_tables(spark, sf_dir)["orders"]
    q = o.select(
        F.date_trunc("quarter", "o_orderdate").alias("qtr"),
        F.col("o_orderdate"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    bounds = q.groupBy("qtr").agg(F.max("o_orderdate").alias("q_last"))
    flagged = q.join(F.broadcast(bounds), "qtr").select(
        "qtr",
        "cents",
        F.when(
            F.col("o_orderdate") > F.col("q_last") - F.expr("INTERVAL 3 DAYS"), 1
        )
        .otherwise(0)
        .alias("in_last3"),
    )
    last3 = F.sum(F.col("in_last3") * F.col("cents")).cast("bigint")
    total = F.sum("cents").cast("bigint")
    return flagged.groupBy("qtr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        total.alias("total_cents"),
        last3.alias("last3_cents"),
        (
            F.floor(last3.cast("double") / total * 10000 + 0.5) / 10000
        ).alias("last3_share"),
        F.when(last3 * 10 > total, 1).otherwise(0).cast("int").alias("loaded"),
    ).select(
        F.unix_timestamp("qtr").alias("quarter_s"),
        "n_orders",
        "total_cents",
        "last3_cents",
        "last3_share",
        "loaded",
    )


TOPN_CUSTOMERS = 10


@register(
    "orders_top_customer_share",
    # The exec-summary concentration number: what share of revenue do
    # the top-10 customers hold? Exact cents, total-ordered top-N cut
    # (rev DESC, custkey), one division — the headline statistic the
    # Gini/HHI/Theil/ABC family backs with distributions.
    oracle=f"""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents DESC, o_custkey) AS rnk
      FROM cust
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(SUM(CASE WHEN rnk <= {TOPN_CUSTOMERS} THEN cents ELSE 0 END)
                AS BIGINT) AS top_cents,
           floor(CAST(SUM(CASE WHEN rnk <= {TOPN_CUSTOMERS}
                               THEN cents ELSE 0 END) AS DOUBLE)
                 / SUM(cents) * 10000 + 0.5) / 10000 AS top_share
    FROM ranked
    """,
)
def orders_top_customer_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10-customer revenue share — the one-number concentration
    headline ('our top 10 accounts are X% of revenue') that every
    board deck leads with; the distributional family (Gini, HHI,
    Theil, ABC) explains it, this states it.

    Exactness: exact cents, total-ordered rank (rev DESC, custkey) so
    the top-N cut is deterministic, one division. Scale shape: one
    custkey hash agg, then rank on the CUSTOMER grain (the same
    two-pass decomposition note as agg_gini_coefficient at extreme
    cardinality).
    """
    o = load_tables(spark, sf_dir)["orders"]
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy(F.col("cents").desc(), "o_custkey")
    ranked = cust.select("cents", F.row_number().over(w).alias("rnk"))
    top = F.sum(
        F.when(F.col("rnk") <= TOPN_CUSTOMERS, F.col("cents")).otherwise(0)
    ).cast("bigint")
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        top.alias("top_cents"),
        (
            F.floor(top.cast("double") / F.sum("cents") * 10000 + 0.5) / 10000
        ).alias("top_share"),
    )


@register(
    "event_hourly_heatmap",
    # The hour x day-of-week activity heatmap every ops dashboard
    # shows, plus the argmax cell — ISO dow so both engines agree on
    # weekday numbering; exact counts, shares on a 1e-4 grid.
    oracle="""
    WITH cells AS (
      SELECT CAST(isodow(ts) AS BIGINT) AS dow,
             CAST(hour(ts) AS BIGINT) AS hh,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT dow, hh, n,
           floor(CAST(n AS DOUBLE) / SUM(n) OVER () * 10000 + 0.5) / 10000
             AS share,
           CAST(CASE WHEN n = MAX(n) OVER ()
                     AND (dow, hh) = (SELECT (dow, hh) FROM cells
                                      ORDER BY n DESC, dow, hh LIMIT 1)
                THEN 1 ELSE 0 END AS INT) AS is_peak
    FROM cells
    """,
)
def event_hourly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour × ISO-weekday activity heatmap with the peak cell flagged
    — the capacity-planning and anomaly-context staple (is Tuesday
    10:00 ALWAYS the peak, or is today weird?). Pairs with
    time_bucket_custom's arbitrary grids and event_anomaly_zscore's
    outlier view; ISO weekday numbering keeps engines and humans
    agreeing on what 'day 1' means.

    Exactness: 168-cell exact counts; shares on a 1e-4 grid; the peak
    flag is an argmax with a (n DESC, dow, hh) total order so exactly
    one cell wins ties. Scale: one hash agg to 168 rows; every window
    runs on that grain.
    """
    e = load_tables(spark, sf_dir)["events"]
    cells = e.groupBy(
        F.dayofweek("ts").alias("dow_us"),
        F.hour("ts").cast("bigint").alias("hh"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    # Spark dayofweek: Sunday=1..Saturday=7 -> ISO Monday=1..Sunday=7
    cells = cells.select(
        (((F.col("dow_us") + 5) % 7) + 1).cast("bigint").alias("dow"),
        "hh",
        "n",
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_peak = Window.orderBy(F.col("n").desc(), "dow", "hh")
    flagged = cells.withColumn("rk", F.row_number().over(w_peak))
    return flagged.select(
        "dow",
        "hh",
        "n",
        (
            F.floor(F.col("n").cast("double") / F.sum("n").over(w_all) * 10000 + 0.5)
            / 10000
        ).alias("share"),
        F.when(F.col("rk") == 1, 1).otherwise(0).cast("int").alias("is_peak"),
    )
