"""§2.4 aggregation surface (incl. the flagship TPC-H-Q1 shape).

Reference parity: algebraicdb had simple ungrouped aggregates at most;
grouped/hash aggregation, DISTINCT aggs, grouping sets, percentiles
and stats are the analytical extension surface.

Scale notes:
  - Every groupBy here is a hash aggregate with map-side partial
    aggregation (Spark plans partial_/final automatically) — the
    shuffle carries group keys + partial states, never raw rows.
  - Multiple COUNT(DISTINCT) in one query triggers Catalyst's Expand
    rewrite (one pass, n copies of the input) — acceptable for 2
    distincts; documented here so nobody stacks 6 of them at 100 TB.
  - approx_count_distinct is the 100 TB path for distinct-cardinality
    (HLL, no expand, constant memory) — rows-only vs the oracle
    because sketches are engine-specific.
  - Doubles rounded to 4 dp per SURVEY §5.3 (partition-order-dependent
    float summation would break value-hash parity otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from algebraicdb_spark.functions.rounding import exact_money_sum, pround
from algebraicdb_spark.plans.registry import register
from algebraicdb_spark.sources.catalog import load_tables, spread


@register(
    "agg_global",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           floor(CAST(MIN(l_extendedprice) AS DOUBLE) * 10000 + 0.5) / 10000 AS min_price,
           floor(CAST(MAX(l_extendedprice) AS DOUBLE) * 10000 + 0.5) / 10000 AS max_price,
           floor(CAST(AVG(l_discount) AS DOUBLE) * 10000 + 0.5) / 10000 AS avg_disc
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregate over the fact table."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        exact_money_sum("l_quantity").alias("sum_qty"),
        pround(F.min("l_extendedprice")).alias("min_price"),
        pround(F.max("l_extendedprice")).alias("max_price"),
        pround(F.avg("l_discount")).alias("avg_disc"),
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       floor(CAST(AVG(l_quantity) AS DOUBLE) * 10000 + 0.5) / 10000 AS avg_qty,
       floor(CAST(AVG(l_extendedprice) AS DOUBLE) * 10000 + 0.5) / 10000 AS avg_price,
       floor(CAST(AVG(l_discount) AS DOUBLE) * 10000 + 0.5) / 10000 AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: pushed filter → 6-measure hash agg. The flagship.

    One scan stage (filter + partial agg inside WholeStageCodegen),
    one shuffle of 6 tiny partial states per (flag,status) — the plan
    is identical at sf0.001 and at 100 TB. A round-14 ``spread()``
    worked around the old DECIMAL(28,4) partial-agg buffers being
    slow on the 1-task fixture scan (2.0 → 1.0 s), but the long-grid
    ``exact_money_sum`` makes the single-task partial agg cheaper
    than the round-robin exchange it bought (0.55 s vs 1.0+ s at
    sf0.1/local[32]), so the exchange is gone again — zero pre-agg
    shuffles is the shape that scales (guide §2.4).
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_money_sum("l_quantity").alias("sum_qty"),
            exact_money_sum("l_extendedprice").alias("sum_base_price"),
            exact_money_sum(disc_price).alias("sum_disc_price"),
            exact_money_sum(disc_price * (1 + F.col("l_tax")), 6).alias("sum_charge"),
            pround(F.avg("l_quantity")).alias("avg_qty"),
            pround(F.avg("l_extendedprice")).alias("avg_price"),
            pround(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


register("agg_groupby_hash", oracle=Q1_ORACLE)(q1)


@register(
    "agg_having",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           floor(CAST(AVG(c_acctbal) AS DOUBLE) * 10000 + 0.5) / 10000 AS avg_bal
    FROM customer
    GROUP BY c_mktsegment
    HAVING AVG(c_acctbal) > 4400.0
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    c = load_tables(spark, sf_dir)["customer"]
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.avg("c_acctbal").alias("_avg_raw"),
        )
        .filter(F.col("_avg_raw") > 4400.0)
        .select(
            "c_mktsegment",
            "n_customers",
            pround("_avg_raw").alias("avg_bal"),
        )
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) — planned as two-phase partial distinct."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers")
    )


@register(
    "agg_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two DISTINCT aggs + one plain agg in a single pass (Expand rewrite)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_approx_distinct",
    # property oracle: HLL estimates are engine-specific, but the group
    # keys, the exact cardinality, and the bounded-error property
    # (|approx − exact| ≤ 5% + 1) are not — so those are hash-checked,
    # with the sketch itself still computed in-plan on the Spark side
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_exact,
           true AS approx_ok
    FROM events
    GROUP BY event_type
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approximate distinct users per event type.

    The 100 TB path for cardinality: constant memory per group, no
    Expand, mergeable across partitions. rsd=0.01 keeps the local
    answer within 1% of exact; the output carries the exact count and
    an in-plan bounded-error assertion so the driver gate hash-checks
    the property (the raw estimate is additionally pinned in tests).
    """
    e = load_tables(spark, sf_dir)["events"]
    # pre-distinct (type, user) first (round 14, guide §2.3/2.4):
    # mixing a distinct agg with the HLL forced an Expand + two-phase
    # distinct plan; aggregating the deduped pairs computes the SAME
    # HLL registers (sketches are duplicate-insensitive) and the exact
    # count as a plain COUNT — one partial-agg shuffle, no Expand.
    # A/B at sf0.1: 1.95 -> 0.78 s, collect-identical incl. estimate.
    pairs = e.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("__dup")
    )
    # n_exact counts user_id (non-null) rather than rows: COUNT(DISTINCT
    # user_id) (the oracle) ignores NULL, but the pair grain keeps a
    # NULL-user group that COUNT(*) would count as one extra user per
    # event_type (ADVICE r14 — latent on the null-free fixture). An
    # event_type whose users are ALL null still surfaces with n_exact=0,
    # exactly like the oracle's GROUP BY.
    per_type = pairs.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count(F.col("user_id")).alias("n_exact"),
    )
    tol = F.col("n_exact") * 0.05 + F.lit(1)
    return per_type.select(
        "event_type",
        "n_exact",
        (F.abs(F.col("approx_users") - F.col("n_exact")) <= tol).alias("approx_ok"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS flag,
           COALESCE(l_linestatus, 'ALL') AS status,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS; NULL group markers disambiguated via COALESCE
    ('ALL') so the output is plain strings (fixture group cols are
    never NULL, so the marker is unambiguous)."""
    load_tables(spark, sf_dir)
    # same partial-aggregation shape as agg_cube: the grouping sets
    # run over the finest grouping's ~8 partial rows, not the fact
    return spark.sql(
        """
        WITH partial AS (
          SELECT l_returnflag, l_linestatus,
                 COUNT(*) AS pn,
                 SUM(CAST(l_quantity AS DECIMAL(18,4))) AS ps
          FROM lineitem
          GROUP BY l_returnflag, l_linestatus
        )
        SELECT COALESCE(l_returnflag, 'ALL') AS flag,
               COALESCE(l_linestatus, 'ALL') AS status,
               SUM(pn) AS n_rows,
               CAST(SUM(ps) AS DOUBLE) AS sum_qty
        FROM partial
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS region,
           COALESCE(n_name, 'ALL') AS nation,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region→nation hierarchy.

    The fact (customer) is pre-aggregated per nationkey BEFORE the
    dim joins and the rollup: the expensive side collapses to ≤25
    partial rows, the dims broadcast onto those, and ROLLUP expands
    25 rows instead of every customer. Same answer, and the fact-side
    shuffle carries (nationkey, count, decimal-sum) only.
    """
    t = load_tables(spark, sf_dir)
    partial = t["customer"].groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("c_acctbal").cast("decimal(18,4)")).alias("ps"),
    )
    joined = partial.join(
        F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.sum("pn").alias("n_customers"),
            F.sum("ps").cast("double").alias("sum_bal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_customers",
            "sum_bal",
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS flag,
           COALESCE(l_linestatus, 'ALL') AS status,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) — via partial pre-aggregation.

    SUM/COUNT are decomposable, so the cube runs over the FINEST
    grouping's partials (|flag|×|status| ≈ 8 rows), not the fact
    table: one fact-side hash agg + a trivially small cube, instead
    of Expand×4 over every input row. At 100 TB this is the
    difference between shuffling 4× the table and shuffling 8 rows.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    partial = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("ps"),
    )
    return (
        partial.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum("pn").alias("n_rows"),
            F.sum("ps").cast("double").alias("sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "n_rows",
            "sum_price",
        )
    )


@register(
    "agg_percentile",
    oracle="""
    SELECT o_orderstatus,
           floor(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) * 10000 + 0.5) / 10000 AS p50,
           floor(CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE) * 10000 + 0.5) / 10000 AS p90
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark percentile == quantile_cont)."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy("o_orderstatus").agg(
        pround(F.percentile("o_totalprice", F.lit(0.5))).alias("p50"),
        pround(F.percentile("o_totalprice", F.lit(0.9))).alias("p90"),
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           floor(CAST(stddev_samp(l_extendedprice) AS DOUBLE) * 10000 + 0.5) / 10000 AS sd_price,
           floor(CAST(var_samp(l_extendedprice) AS DOUBLE) * 100 + 0.5) / 100 AS var_price,
           floor(CAST(corr(l_quantity, l_extendedprice) AS DOUBLE) * 10000 + 0.5) / 10000 AS corr_qty_price,
           floor(CAST(covar_samp(l_quantity, l_extendedprice) AS DOUBLE) * 100 + 0.5) / 100 AS cov_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev / variance / correlation / covariance per group."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        pround(F.stddev_samp("l_extendedprice")).alias("sd_price"),
        pround(F.var_samp("l_extendedprice"), 2).alias("var_price"),
        pround(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
        pround(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "cov_qty_price"
        ),
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT n_name,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
           COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List aggregation, determinized: collect_set → sort_array → join.

    SURVEY §5.3.2: never emit bare collect_list; string-join the
    sorted array so the value hash is representation-independent.
    """
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias(
                "segments"
            ),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@register(
    "agg_min_max_by",
    oracle="""
    WITH ranked AS (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
      FROM orders
    )
    SELECT o_orderstatus,
           MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS priciest_order,
           MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS cheapest_order,
           floor(CAST(MAX(o_totalprice) AS DOUBLE) * 10000 + 0.5) / 10000 AS max_price
    FROM ranked
    GROUP BY o_orderstatus
    """,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax/argmin with a unique tie-break (struct ordering) —
    SURVEY §5.3.3: top-k/argmax needs total order."""
    o = load_tables(spark, sf_dir)["orders"]
    tie = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", tie).alias("priciest_order"),
        F.min_by("o_orderkey", tie).alias("cheapest_order"),
        pround(F.max("o_totalprice")).alias("max_price"),
    )


@register(
    "agg_pivot",
    # pivot = conditional aggregation with a FIXED value list (an
    # unbounded pivot would need a driver-side distinct scan — always
    # pin the columns at 100 TB)
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS DECIMAL(18,4))) AS DOUBLE) AS F,
           CAST(SUM(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END AS DECIMAL(18,4))) AS DOUBLE) AS O,
           CAST(SUM(CAST(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END AS DECIMAL(18,4))) AS DOUBLE) AS P
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order revenue by market segment × order status."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(exact_money_sum("o_totalprice"))
    )


@register(
    "agg_unpivot",
    oracle="""
    SELECT p_partkey, measure, val FROM (
      SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS val FROM part
      UNION ALL
      SELECT p_partkey, 'retailprice', floor(CAST(p_retailprice AS DOUBLE) * 10000 + 0.5) / 10000 FROM part
    ) WHERE p_partkey % 100 = 0
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide part measures → long (key, measure, value)."""
    p = load_tables(spark, sf_dir)["part"]
    return (
        p.filter(F.col("p_partkey") % 100 == 0)
        .select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            pround("p_retailprice").alias("retailprice"),
        )
        .unpivot("p_partkey", ["size", "retailprice"], "measure", "val")
    )


@register(
    "agg_histogram",
    # fixed-width histogram by pure arithmetic (no engine-specific
    # width_bucket): bucket = floor(x/25000), clamped to [0, 19]
    oracle="""
    SELECT LEAST(CAST(floor(o_totalprice / 25000.0) AS BIGINT), 19) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS lo,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order prices (20 buckets of 25k).

    One map-side bucket computation + one hash agg on ≤20 keys —
    the shuffle carries 20 rows regardless of input size; this is
    the always-scale-safe way to profile a 100 TB column.
    """
    o = load_tables(spark, sf_dir)["orders"]
    bucket = F.least(
        F.floor(F.col("o_totalprice") / 25000.0).cast("bigint"), F.lit(19)
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("lo"),
        F.max(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("hi"),
    )


@register(
    "agg_approx_percentile",
    # property oracle (like agg_approx_distinct): the t-digest/KLL-style
    # sketch value is engine-specific, but the exact quantiles and the
    # bounded-error property are not — those are hash-checked, with the
    # sketch still computed in-plan on the Spark side
    oracle="""
    SELECT event_type,
           floor(CAST(quantile_cont(value, 0.5) AS DOUBLE) * 10000 + 0.5) / 10000 AS p50_exact,
           floor(CAST(quantile_cont(value, 0.95) AS DOUBLE) * 10000 + 0.5) / 10000 AS p95_exact,
           true AS p50_ok,
           true AS p95_ok
    FROM events
    GROUP BY event_type
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles: approx_percentile at accuracy 10000 is
    the 100 TB path (mergeable constant-memory sketch, no global sort);
    the exact interpolated quantile rides along only to hash-check the
    ≤5% bounded-error property in-plan."""
    e = load_tables(spark, sf_dir)["events"]
    g = e.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.95], 10000).alias("ap"),
        F.percentile("value", F.lit(0.5)).alias("e50"),
        F.percentile("value", F.lit(0.95)).alias("e95"),
    )
    ok = lambda approx, exact: (  # noqa: E731
        F.abs(approx - exact) <= F.abs(exact) * 0.05 + F.lit(0.01)
    )
    return g.select(
        "event_type",
        pround("e50").alias("p50_exact"),
        pround("e95").alias("p95_exact"),
        ok(F.col("ap")[0], F.col("e50")).alias("p50_ok"),
        ok(F.col("ap")[1], F.col("e95")).alias("p95_ok"),
    )


@register(
    "agg_mode_exact",
    oracle="""
    WITH counts AS (
      SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT c_mktsegment, o_orderpriority, n,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY n DESC, o_orderpriority ASC) AS rn
      FROM counts
    )
    SELECT c_mktsegment, o_orderpriority AS mode_priority, n AS mode_n
    FROM ranked WHERE rn = 1
    """,
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode: the most frequent order priority per
    market segment (count argmax, ties broken by priority name so the
    answer is engine-independent).

    Scale shape: the heavy aggregate shuffles (segment, priority)
    pairs — bounded by the attribute-domain product, not the row
    count — and the argmax window runs over those few counted rows.
    This two-level shape is how exact mode stays cheap at 100 TB;
    Spark's own `mode()` aggregate has no deterministic tie policy,
    so the explicit window IS the portable implementation.
    """
    t = load_tables(spark, sf_dir)
    counts = (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("n").desc(), F.col("o_orderpriority").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_n"),
        )
    )


@register(
    "agg_hll_partial_union",
    # property oracle (agg_approx_distinct pattern): sketch bytes are
    # engine-specific, but the exact distinct count and the bounded-
    # error property of the MERGED estimate are hash-checked
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           true AS estimate_ok
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_hll_partial_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct counts: per-(status, month) HLL
    sketches built independently, then hll_union_agg'd up to status
    level and estimated — the rollup never re-reads rows.

    This is THE incremental-warehouse pattern at 100 TB: persist
    small per-partition sketch bytes (a few KB each), merge any
    grouping of them later (day→month→year, region→global) at sketch
    cost instead of rescanning the fact table. The in-plan check
    pins the merged estimate within HLL's error envelope (lgK=12 →
    ~1.6% standard error; 5% bound here) of the exact count computed
    alongside.
    """
    o = load_tables(spark, sf_dir)["orders"]
    partials = o.groupBy(
        "o_orderstatus", F.date_trunc("month", "o_orderdate").alias("mth")
    ).agg(F.hll_sketch_agg("o_custkey", F.lit(12)).alias("sk"))
    merged = partials.groupBy("o_orderstatus").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_customers")
    )
    return exact.join(merged, "o_orderstatus").select(
        "o_orderstatus",
        "exact_customers",
        (
            F.abs(F.col("est") - F.col("exact_customers"))
            <= F.col("exact_customers") * 0.05
        ).alias("estimate_ok"),
    )


@register(
    "agg_bitmap_distinct",
    # the oracle states WHAT (exact distinct per status); the bitmap
    # plan is the mergeable HOW — results must be identical
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via re-aggregatable bitmaps
    (bitmap_construct_agg → bitmap_or_agg → bitmap_count).

    Why not COUNT(DISTINCT): bitmaps are MERGEABLE — per-(status,
    month, bucket) partials OR together, so daily rollups fold into
    monthly/yearly ones without re-touching raw data (the exact twin
    of the HLL key `agg_hll_partial_union`, for when the answer must
    be exact). Shuffle carries fixed-width bitmap segments (one per
    2^15-key bucket), not one row per distinct key: at 100 TB the
    width is |keyspace|/2^15 segments per group regardless of row
    count. Spark ≥3.5 built-ins, all JVM-side.
    """
    o = load_tables(spark, sf_dir)["orders"]
    partial = o.selectExpr(
        "o_orderstatus",
        "month(o_orderdate) AS slice",  # stands in for the daily partition
        "bitmap_bucket_number(o_custkey) AS bkt",
        "bitmap_bit_position(o_custkey) AS pos",
    ).groupBy("o_orderstatus", "slice", "bkt").agg(
        F.expr("bitmap_construct_agg(pos)").alias("b")
    )
    merged = partial.groupBy("o_orderstatus", "bkt").agg(
        F.expr("bitmap_or_agg(b)").alias("m")
    )
    return merged.groupBy("o_orderstatus").agg(
        F.sum(F.expr("bitmap_count(m)")).cast("long").alias("n_customers")
    )


@register(
    "agg_weighted_percentile",
    oracle="""
    WITH cells AS (
      SELECT l_returnflag, l_extendedprice AS price,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS w
      FROM lineitem
      GROUP BY 1, 2
    ), c AS (
      SELECT *,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price
                          ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tot
      FROM cells
    )
    SELECT l_returnflag,
           floor(CAST(MIN(price) AS DOUBLE) * 10000 + 0.5) / 10000
             AS weighted_median
    FROM c
    WHERE cw * 2 >= tot
    GROUP BY l_returnflag
    """,
)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median: smallest price whose cumulative quantity
    weight reaches half the group total.

    Pre-aggregating to (flag, price) cells first makes the rank window
    run over the DISTINCT-value grain (bounded by price cardinality,
    not row count) and removes tie ambiguity; weights sum exactly in
    decimal so the half-total comparison can't drift between engines
    (cw*2 >= tot stays integer-exact on the 0.01 grid).
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    # spread: the cell partial agg otherwise runs inside the 1-task
    # fixture scan (guide §2.5; cluster no-op) — 2.2 -> 1.9 s at sf0.1
    cells = spread(li).groupBy(
        "l_returnflag", F.col("l_extendedprice").alias("price")
    ).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .alias("w")
    )
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("l_returnflag")
    c = cells.select(
        "l_returnflag",
        "price",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wt).alias("tot"),
    )
    return (
        c.filter(F.col("cw") * 2 >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(pround(F.min("price")).alias("weighted_median"))
    )


@register(
    "agg_linear_regression",
    # OLS per group from EXACT decimal sums of grid-floored per-row
    # terms (the text_unigram_logprob recipe): every double op below
    # the sums is bit-identical across engines, the sums are exact
    # integers, and the final divisions combine identical doubles in
    # an identical order — so slope/intercept/r2 need no tolerance.
    oracle="""
    SELECT flag, n_rows,
           floor(CAST(num / denx AS DOUBLE) * 10000 + 0.5) / 10000 AS slope,
           floor(CAST(((sy * 1e-4) - (num / denx) * (sx * 1e-4)) / n AS DOUBLE) * 10000 + 0.5) / 10000 AS intercept,
           floor(CAST((num * num) / (denx * deny) AS DOUBLE) * 10000 + 0.5) / 10000 AS r2
    FROM (
      SELECT flag, n_rows, n, sx, sy,
             n * sxy - sx * sy * 1e-4 AS num,
             n * sxx - sx * sx * 1e-4 AS denx,
             n * syy - sy * sy * 1e-4 AS deny
      FROM (
        SELECT l_returnflag AS flag,
               COUNT(*) AS n_rows,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(FLOOR(l_quantity * 1e4) AS DECIMAL(38,0))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 1e4) AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(FLOOR(l_quantity * l_extendedprice * 1e4) AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(FLOOR(l_quantity * l_quantity * 1e4) AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(FLOOR(l_extendedprice * l_extendedprice * 1e4) AS DECIMAL(38,0))) AS DOUBLE) AS syy
        FROM lineitem GROUP BY l_returnflag) sums) t
    ORDER BY flag
    """,
)
def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS regression (price ~ quantity): slope, intercept,
    R² — the `regr_slope`-family surface, computed from mergeable
    map-side partials instead of the built-ins so the result is
    deterministic cross-engine.

    Scale: one hash aggregate; the shuffle carries 5 decimal partial
    sums + 1 count per group, never rows — the same shape regr_*
    would plan, but with an exact (order-independent) accumulator.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    g = lambda c: F.floor(c * F.lit(1e4)).cast("decimal(38,0)")  # noqa: E731
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    sums = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(g(x)).cast("double").alias("sx"),
        F.sum(g(y)).cast("double").alias("sy"),
        F.sum(g(x * y)).cast("double").alias("sxy"),
        F.sum(g(x * x)).cast("double").alias("sxx"),
        F.sum(g(y * y)).cast("double").alias("syy"),
    )
    t = sums.select(
        "flag", "n_rows", "n", "sx", "sy",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy") * F.lit(1e-4)).alias("num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") * F.lit(1e-4)).alias("denx"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") * F.lit(1e-4)).alias("deny"),
    )
    return t.select(
        "flag",
        "n_rows",
        pround(F.col("num") / F.col("denx")).alias("slope"),
        pround(
            ((F.col("sy") * F.lit(1e-4)) - (F.col("num") / F.col("denx")) * (F.col("sx") * F.lit(1e-4)))
            / F.col("n")
        ).alias("intercept"),
        pround((F.col("num") * F.col("num")) / (F.col("denx") * F.col("deny"))).alias("r2"),
    ).orderBy("flag")


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_CORR_PAIRS = [
    (a, b)
    for i, a in enumerate(_CORR_COLS)
    for b in _CORR_COLS[i + 1 :]
]


def _corr_oracle() -> str:
    """Pairwise Pearson matrix from the agg_linear_regression moment
    recipe: grid-floored (1e4) per-row terms summed as exact DECIMALs,
    then identical double combinations on both engines — corr needs no
    tolerance despite being a ratio of five float reductions."""
    s = lambda c: f"CAST(SUM(CAST(FLOOR({c} * 1e4) AS DECIMAL(38,0))) AS DOUBLE)"  # noqa: E731
    moments = ", ".join(
        [f"CAST(COUNT(*) AS DOUBLE) AS n"]
        + [f"{s(c)} AS s_{i}" for i, c in enumerate(_CORR_COLS)]
        + [
            f"{s(f'{c} * {c}')} AS s_{i}_{i}"
            for i, c in enumerate(_CORR_COLS)
        ]
        + [
            f"{s(f'{a} * {b}')} AS s_{_CORR_COLS.index(a)}_{_CORR_COLS.index(b)}"
            for a, b in _CORR_PAIRS
        ]
    )
    branches = []
    for a, b in _CORR_PAIRS:
        i, j = _CORR_COLS.index(a), _CORR_COLS.index(b)
        num = f"(m.n * m.s_{i}_{j} - m.s_{i} * m.s_{j} * 1e-4)"
        den = (
            f"sqrt((m.n * m.s_{i}_{i} - m.s_{i} * m.s_{i} * 1e-4)"
            f" * (m.n * m.s_{j}_{j} - m.s_{j} * m.s_{j} * 1e-4))"
        )
        branches.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
            f"floor(CAST({num} / {den} AS DOUBLE) * 10000 + 0.5) / 10000 AS corr"
        )
    return (
        f"WITH m AS (SELECT {moments} FROM lineitem) "
        f"SELECT p.col_a, p.col_b, p.corr FROM m, LATERAL ("
        + " UNION ALL ".join(branches)
        + ") p ORDER BY col_a, col_b"
    )


@register("agg_corr_matrix", oracle=_corr_oracle())
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the lineitem measure
    columns — the `corr()`-surface generalized to all column pairs in
    ONE scan (feature-correlation screening, the tabular sibling of
    embedding near-dup checks).

    Scale shape: a single hash aggregate computes every moment (count,
    4 sums, 4 square-sums, 6 cross-sums as exact decimal-grid
    partials — mergeable map-side, the shuffle carries 15 cells
    total), then `stack` unpivots the one moment row into 6 result
    rows driver-free. Built-in `F.corr` would need a scan per pair
    and its float sums are summation-order-dependent; this form is
    one scan and cross-engine exact.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    g = lambda c: F.floor(c * F.lit(1e4)).cast("decimal(38,0)")  # noqa: E731
    cols = [F.col(c) for c in _CORR_COLS]
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    aggs += [F.sum(g(c)).cast("double").alias(f"s_{i}") for i, c in enumerate(cols)]
    aggs += [
        F.sum(g(c * c)).cast("double").alias(f"s_{i}_{i}")
        for i, c in enumerate(cols)
    ]
    aggs += [
        F.sum(g(cols[i] * cols[j])).cast("double").alias(f"s_{i}_{j}")
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    m = li.agg(*aggs)

    def corr_expr(i: int, j: int):
        num = F.col("n") * F.col(f"s_{i}_{j}") - F.col(f"s_{i}") * F.col(
            f"s_{j}"
        ) * F.lit(1e-4)
        den = F.sqrt(
            (F.col("n") * F.col(f"s_{i}_{i}") - F.col(f"s_{i}") * F.col(f"s_{i}") * F.lit(1e-4))
            * (F.col("n") * F.col(f"s_{j}_{j}") - F.col(f"s_{j}") * F.col(f"s_{j}") * F.lit(1e-4))
        )
        return pround(num / den)

    with_corrs = m.select(
        *[
            corr_expr(_CORR_COLS.index(a), _CORR_COLS.index(b)).alias(
                f"c_{_CORR_COLS.index(a)}_{_CORR_COLS.index(b)}"
            )
            for a, b in _CORR_PAIRS
        ]
    )
    stack_args = ", ".join(
        f"'{a}', '{b}', c_{_CORR_COLS.index(a)}_{_CORR_COLS.index(b)}"
        for a, b in _CORR_PAIRS
    )
    return with_corrs.select(
        F.expr(
            f"stack({len(_CORR_PAIRS)}, {stack_args}) AS (col_a, col_b, corr)"
        )
    ).orderBy("col_a", "col_b")


@register(
    "agg_skew_kurtosis",
    # Higher central moments from EXACT integer power sums. l_quantity
    # is integer-valued (fixture invariant, asserted by the oracle's
    # own floor), so q..q4 are exact BIGINTs (q4 <= 50^4 = 6.25e6) and
    # their sums stay below 2^53 to ~1.4e9 rows per group — the
    # BIGINT->DOUBLE casts are value-preserving, unlike the >2^53
    # DECIMAL casts that drift 1 ulp between engines (measured). All
    # double combining below the sums uses one explicit
    # parenthesization, mirrored verbatim in SQL; m2^1.5 is
    # m2*sqrt(m2) because sqrt is IEEE-correctly-rounded everywhere
    # while pow() is libm-dependent.
    oracle="""
    SELECT flag, n_rows,
           floor(mean * 1000000 + 0.5) / 1000000 AS mean_q,
           floor((m3 / (m2 * sqrt(m2))) * 1000000 + 0.5) / 1000000 AS skewness,
           floor((m4 / (m2 * m2) - 3) * 1000000 + 0.5) / 1000000 AS kurtosis
    FROM (
      SELECT flag, n_rows, e1 AS mean,
             e2 - e1 * e1 AS m2,
             e3 - (3 * e1) * e2 + (2 * e1) * (e1 * e1) AS m3,
             e4 - (4 * e1) * e3 + ((6 * (e1 * e1)) * e2)
                - (3 * ((e1 * e1) * (e1 * e1))) AS m4
      FROM (
        SELECT flag, n_rows, s1 / n AS e1, s2 / n AS e2,
               s3 / n AS e3, s4 / n AS e4
        FROM (
          SELECT l_returnflag AS flag, COUNT(*) AS n_rows,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(q) AS DOUBLE) AS s1,
                 CAST(SUM(q * q) AS DOUBLE) AS s2,
                 CAST(SUM((q * q) * q) AS DOUBLE) AS s3,
                 CAST(SUM(((q * q) * q) * q) AS DOUBLE) AS s4
          FROM (SELECT l_returnflag, CAST(floor(l_quantity) AS BIGINT) AS q
                FROM lineitem)
          GROUP BY l_returnflag) sums) m) c
    ORDER BY flag
    """,
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group skewness and excess kurtosis from mergeable integer
    power sums — the deterministic twin of Spark's `skewness`/
    `kurtosis` built-ins (whose float accumulation order varies by
    partitioning, so they can never hash-match another engine).

    Scale shape: identical to agg_linear_regression — one hash
    aggregate whose shuffle carries four BIGINT partials + a count
    per group, never rows. Map-side combine does almost all the work;
    adding moments (5th, 6th, ...) widens the partial row, not the
    shuffle row count.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    q = F.floor("l_quantity").cast("long")
    sums = (
        li.select(F.col("l_returnflag").alias("flag"), q.alias("q"))
        .groupBy("flag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("q").cast("double").alias("s1"),
            F.sum(F.col("q") * F.col("q")).cast("double").alias("s2"),
            F.sum((F.col("q") * F.col("q")) * F.col("q")).cast("double").alias("s3"),
            F.sum(((F.col("q") * F.col("q")) * F.col("q")) * F.col("q"))
            .cast("double")
            .alias("s4"),
        )
    )
    e1, e2 = F.col("s1") / F.col("n"), F.col("s2") / F.col("n")
    e3, e4 = F.col("s3") / F.col("n"), F.col("s4") / F.col("n")
    m = sums.select(
        "flag",
        "n_rows",
        e1.alias("mean"),
        (e2 - e1 * e1).alias("m2"),
        (e3 - (F.lit(3) * e1) * e2 + (F.lit(2) * e1) * (e1 * e1)).alias("m3"),
        (
            e4
            - (F.lit(4) * e1) * e3
            + ((F.lit(6) * (e1 * e1)) * e2)
            - (F.lit(3) * ((e1 * e1) * (e1 * e1)))
        ).alias("m4"),
    )
    m2 = F.col("m2")
    return m.select(
        "flag",
        "n_rows",
        pround(F.col("mean"), 6).alias("mean_q"),
        pround(F.col("m3") / (m2 * F.sqrt(m2)), 6).alias("skewness"),
        pround(F.col("m4") / (m2 * m2) - F.lit(3), 6).alias("kurtosis"),
    ).orderBy("flag")


@register(
    "agg_string_agg",
    # Ordered string aggregation: concat_ws over a SORTED collect_list
    # equals string_agg(… ORDER BY …) — the ordering clause is what
    # makes a string agg deterministic at all (unordered listagg/
    # string_agg output is partitioning-dependent on every engine).
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           string_agg(DISTINCT CAST(c_nationkey AS VARCHAR), ','
                      ORDER BY CAST(c_nationkey AS VARCHAR)) AS nation_list
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """string_agg / LISTAGG: per-segment comma-joined nation-key list
    in a deterministic (sorted) element order — the report/export
    aggregation every SQL dialect grew (Spark 4 ships `listagg`; the
    concat_ws(array_sort(collect_set)) composition used here is the
    version whose order is explicit rather than WITHIN-GROUP-implied).

    Scale shape: collect_set partials merge map-side, so the shuffle
    carries one deduped array per (group, partition) — safe while
    group element counts stay bounded (25 nations); for unbounded
    lists the honest swap is an explicit sort + per-group
    mapInPandas writer, because a billion-element string is an
    anti-goal, not an aggregate.
    """
    c = load_tables(spark, sf_dir)["customer"]
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.concat_ws(
            ",", F.array_sort(F.collect_set(F.col("c_nationkey").cast("string")))
        ).alias("nation_list"),
    )


@register(
    "agg_conditional_family",
    # count_if / bool_and / bool_or + FILTER'd sums: every output is
    # an exact integer, boolean, or decimal-grid sum — nothing to
    # round. The FILTER (WHERE …) clause in the oracle is the ANSI
    # form of Spark's when()-guarded aggregate inputs.
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT)
             AS n_big,
           bool_and(o_totalprice > 900) AS all_above_floor,
           bool_or(o_orderstatus = 'F') AS any_finished,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_revenue
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_conditional_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The conditional-aggregate family in one grouped pass: count_if,
    bool_and, bool_or, and a FILTER'd exact-decimal sum — the
    SUM(CASE…) idioms with their standard-SQL names.

    Scale shape: one hash aggregate; every conditional is evaluated
    map-side inside the same partial, so adding predicates widens
    the partial row, not the shuffle. NULL discipline: FILTER'd
    sums over an empty slice yield NULL on both engines (not 0) —
    kept as-is, since that IS the standard semantics.
    """
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 900).alias("all_above_floor"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.sum(
            F.when(
                F.col("o_orderstatus") == "O",
                F.col("o_totalprice").cast("decimal(18,4)"),
            )
        )
        .cast("double")
        .alias("open_revenue"),
    )


@register(
    "agg_abc_classification",
    # Pareto/ABC inventory analysis: customers bucketed by cumulative
    # revenue share. Revenue is an exact decimal sum per customer; the
    # cumulative window runs on the customer grain in cent-exact
    # BIGINTs; class cuts compare integer cumulative cents against
    # integer thresholds of the grand total (cum*100 <= total*80) —
    # no float touches the classification.
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders GROUP BY o_custkey
    ),
    cum AS (
      SELECT o_custkey, rev_c,
             SUM(rev_c) OVER (ORDER BY rev_c DESC, o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c,
             SUM(rev_c) OVER () AS total_c
      FROM per_cust
    ),
    classed AS (
      SELECT o_custkey, rev_c,
             CASE WHEN cum_c * 100 <= total_c * 80 THEN 'A'
                  WHEN cum_c * 100 <= total_c * 95 THEN 'B'
                  ELSE 'C' END AS abc
      FROM cum
    )
    SELECT abc,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(rev_c) AS BIGINT) AS revenue_cents,
           floor((CAST(SUM(rev_c) AS DOUBLE)
                  / (SELECT SUM(rev_c) FROM per_cust)) * 1000000 + 0.5)
             / 1000000 AS revenue_share
    FROM classed GROUP BY abc
    """,
)
def agg_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC analysis: customers ranked by revenue and split at
    cumulative 80% (A) and 95% (B) of total — the classic
    concentration report ("which 20% of customers drive 80% of
    revenue"), per-class counts and shares.

    Scale shape: one custkey hash aggregate collapses orders, then
    the cumulative window runs over the CUSTOMER grain (never order
    rows); classification is integer arithmetic. At 100 TB the
    cumulative cut swaps to quantile-sketch boundaries on the revenue
    distribution (feature_quantile_bins' documented trade) — the
    exact tier grounds it.
    """
    o = load_tables(spark, sf_dir)["orders"]
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("rev_c")
    )
    w = (
        Window.orderBy(F.col("rev_c").desc(), "o_custkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per_cust.select(
        "o_custkey",
        "rev_c",
        F.sum("rev_c").over(w).alias("cum_c"),
        F.sum("rev_c").over(Window.partitionBy()).alias("total_c"),
    )
    classed = cum.select(
        "rev_c",
        F.when(F.col("cum_c") * 100 <= F.col("total_c") * 80, "A")
        .when(F.col("cum_c") * 100 <= F.col("total_c") * 95, "B")
        .otherwise("C")
        .alias("abc"),
        "total_c",
    )
    return classed.groupBy("abc").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("rev_c").cast("long").alias("revenue_cents"),
        pround(
            F.sum("rev_c").cast("double") / F.min("total_c"), 6
        ).alias("revenue_share"),
    )


@register(
    "agg_hll_intersection",
    # property oracle (agg_hll_partial_union pattern): intersection
    # cardinality estimated via inclusion-exclusion over mergeable
    # sketches — |A∩B| ≈ est(A) + est(B) − est(A∪B). Sketch bytes are
    # engine-specific; the exact intersection and the bounded-error
    # boolean are what the driver hashes. The error bound is looser
    # than the union key's (differencing compounds the envelope:
    # ~1.6%·(|A|+|B|+|A∪B|) absolute, checked at 10% of |A∪B|).
    oracle="""
    SELECT
      CAST((SELECT COUNT(DISTINCT user_id) FROM events
            WHERE event_type = 'click') AS BIGINT) AS exact_a,
      CAST((SELECT COUNT(DISTINCT user_id) FROM events
            WHERE event_type = 'purchase') AS BIGINT) AS exact_b,
      CAST((SELECT COUNT(DISTINCT user_id) FROM events
            WHERE event_type IN ('click', 'purchase')) AS BIGINT) AS exact_union,
      CAST((SELECT COUNT(DISTINCT e1.user_id)
            FROM events e1
            WHERE e1.event_type = 'click'
              AND EXISTS (SELECT 1 FROM events e2
                          WHERE e2.user_id = e1.user_id
                            AND e2.event_type = 'purchase')) AS BIGINT)
        AS exact_intersection,
      true AS estimate_ok
    """,
)
def agg_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch set algebra: estimate the CLICKERS ∩ PURCHASERS audience
    overlap by inclusion–exclusion over HLL sketches — the segment-
    overlap question every audience platform answers from persisted
    per-segment sketches without touching raw rows.

    Scale shape: one pass builds all three sketches (A, B, and A∪B
    via filtered sketch aggs over the same scan); the arithmetic is
    three KB-sized sketch estimates. The in-plan check pins the
    differenced estimate within a compounded HLL error envelope of
    the exact overlap computed alongside. Caveat the docstring makes
    loud: inclusion–exclusion error grows with |A∪B|/|A∩B|, so tiny
    overlaps of huge sets need θ-sketches (true intersection
    support) instead — this key IS the motivation for them.
    """
    e = load_tables(spark, sf_dir)["events"]
    sk = e.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(
                F.when(F.col("event_type") == "click", F.col("user_id")), F.lit(12)
            )
        ).alias("est_a"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(
                F.when(F.col("event_type") == "purchase", F.col("user_id")),
                F.lit(12),
            )
        ).alias("est_b"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(
                F.when(
                    F.col("event_type").isin("click", "purchase"), F.col("user_id")
                ),
                F.lit(12),
            )
        ).alias("est_u"),
    )
    clicks = e.where(F.col("event_type") == "click").select("user_id")
    buys = e.where(F.col("event_type") == "purchase").select("user_id")
    exact = (
        clicks.distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("exact_a"))
        .crossJoin(
            buys.distinct().agg(F.count(F.lit(1)).cast("long").alias("exact_b"))
        )
        .crossJoin(
            clicks.unionAll(buys)
            .distinct()
            .agg(F.count(F.lit(1)).cast("long").alias("exact_union"))
        )
        .crossJoin(
            clicks.join(buys, "user_id", "left_semi")
            .distinct()
            .agg(F.count(F.lit(1)).cast("long").alias("exact_intersection"))
        )
    )
    est_inter = F.col("est_a") + F.col("est_b") - F.col("est_u")
    return exact.crossJoin(sk).select(
        "exact_a",
        "exact_b",
        "exact_union",
        "exact_intersection",
        (
            F.abs(est_inter - F.col("exact_intersection"))
            <= F.greatest(F.col("exact_union") * 0.1, F.lit(5.0))
        ).alias("estimate_ok"),
    )


@register(
    "agg_bitwise",
    oracle="""
    SELECT o_orderstatus,
           CAST(bit_and(o_custkey) AS BIGINT) AS band,
           CAST(bit_or(o_custkey) AS BIGINT) AS bor,
           CAST(bit_xor(o_custkey) AS BIGINT) AS bxor,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIT_AND / BIT_OR / BIT_XOR aggregates — the bitmask rollup
    surface (permission masks, feature flags, parity checks). All
    three are commutative-associative, so they run as ordinary
    mergeable partials: map-side combine, one shuffle of 3 BIGINTs
    per group."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy("o_orderstatus").agg(
        F.bit_and("o_custkey").cast("bigint").alias("band"),
        F.bit_or("o_custkey").cast("bigint").alias("bor"),
        F.bit_xor("o_custkey").cast("bigint").alias("bxor"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


@register(
    "agg_percentile_disc",
    # DISCRETE percentiles: the returned value is an actual data
    # point (no interpolation), so the result is exact on both
    # engines with zero float plumbing.
    oracle="""
    SELECT o_orderstatus,
           CAST(quantile_disc(o_totalprice, 0.5) AS DOUBLE) AS p50_disc,
           CAST(quantile_disc(o_totalprice, 0.9) AS DOUBLE) AS p90_disc,
           CAST(quantile_disc(o_totalprice, 0.99) AS DOUBLE) AS p99_disc
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_DISC — the discrete twin of agg_percentile's
    interpolated quantiles: returns the smallest data value whose
    cumulative distribution reaches p. Because the answer is an
    actual member of the column, cross-engine equality is exact with
    no rounding grid at all (contrast every _cont quantile here).

    Spark's SQL percentile_disc and DuckDB's quantile_disc both
    implement the SQL-standard lower-bound definition.
    """
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy("o_orderstatus").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("p50_disc"),
        F.expr(
            "percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("p90_disc"),
        F.expr(
            "percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("p99_disc"),
    )


TRIM_PCT = 5  # percent trimmed from EACH tail


@register(
    "agg_trimmed_mean",
    # robust location estimate: drop the top/bottom 5% BY RANK (exact
    # integer cut via rank <= n*5/100), decimal-exact mean of the
    # middle 90% — completing the robust family next to median/MAD.
    oracle=f"""
    WITH ranked AS (
      SELECT o_orderstatus,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM orders
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           floor((CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0)
                 * 10000 + 0.5) / 10000 AS trimmed_mean,
           floor(CAST(MIN(cents) AS DOUBLE) / 100.0 * 10000 + 0.5) / 10000
             AS lo_cut,
           floor(CAST(MAX(cents) AS DOUBLE) / 100.0 * 10000 + 0.5) / 10000
             AS hi_cut
    FROM ranked
    WHERE rn > n * {TRIM_PCT} // 100 AND rn <= n - n * {TRIM_PCT} // 100
    GROUP BY o_orderstatus
    """,
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5% two-sided trimmed mean of order prices per status — the
    robust location estimate between the mean (outlier-hostage) and
    the median (throws away 98% of the data). Trim cuts are EXACT
    integer rank thresholds (n·5 DIV 100 with a total tie-break
    order), and the surviving mass sums exact cents, so the entire
    statistic is engine-identical with one final division.

    Scale shape: one o_orderstatus exchange serves the rank window,
    the per-group count, and the final aggregate. At extreme group
    sizes the rank window is the cost — the approx tier swaps it for
    two approx-quantile cuts + a filter (the same trade documented
    for the exact-percentile keys).
    """
    o = load_tables(spark, sf_dir)["orders"]
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    p = Window.partitionBy("o_orderstatus")
    ranked = o.select(
        "o_orderstatus",
        cents.alias("cents"),
        F.row_number()
        .over(p.orderBy("o_totalprice", "o_orderkey"))
        .alias("rn"),
        F.count(F.lit(1)).over(p).alias("n"),
    )
    cut = F.expr(f"n * {TRIM_PCT} DIV 100")
    kept = ranked.where((F.col("rn") > cut) & (F.col("rn") <= F.col("n") - cut))
    return kept.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        pround(F.sum("cents").cast("double") / F.count(F.lit(1)) / 100.0).alias(
            "trimmed_mean"
        ),
        pround(F.min("cents").cast("double") / 100.0).alias("lo_cut"),
        pround(F.max("cents").cast("double") / 100.0).alias("hi_cut"),
    )


import math as _math

_BENFORD = [(d, _math.log10(1 + 1 / d)) for d in range(1, 10)]
_BENFORD_VALUES = ", ".join(
    f"({d}, CAST({p!r} AS DOUBLE))" for d, p in _BENFORD
)


@register(
    "agg_benford_digits",
    # Benford's-law first-digit audit of order totals — the classic
    # fraud/fabrication screen. Expected shares are inlined literal
    # doubles (full-repr round-trip, identical on both engines);
    # observed counts are exact; each digit's chi-square contribution
    # (O-E)^2/E is one identical double expression on a 1e-6 grid.
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                               AS VARCHAR), 1, 1) AS INTEGER) AS d
      FROM orders WHERE o_totalprice > 0
    ), obs AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS n_obs FROM digits GROUP BY d
    ), exp_t(d, p) AS (VALUES {_BENFORD_VALUES}),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs)
    SELECT e.d AS digit,
           COALESCE(o.n_obs, 0) AS n_obs,
           floor(CAST(COALESCE(o.n_obs, 0) AS DOUBLE) / tot.n
                 * 1000000 + 0.5) / 1000000 AS obs_share,
           floor(e.p * 1000000 + 0.5) / 1000000 AS exp_share,
           floor((CAST(COALESCE(o.n_obs, 0) AS DOUBLE) - e.p * tot.n)
                 * (CAST(COALESCE(o.n_obs, 0) AS DOUBLE) - e.p * tot.n)
                 / (e.p * tot.n) * 1000000 + 0.5) / 1000000
             AS chi2_contrib
    FROM exp_t e LEFT JOIN obs o ON o.d = e.d CROSS JOIN tot
    """,
)
def agg_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit of order totals —
    the standard forensic-accounting screen: naturally occurring
    multiplicative amounts follow P(d) = log10(1 + 1/d) (30.1% start
    with 1), and fabricated or capped numbers don't. Per digit:
    observed count/share, the Benford expectation, and the chi-square
    contribution (a digit whose contribution dominates is WHERE the
    books are cooked; Σ over the 9 rows against χ²₈ = 15.5 is the
    formal test).

    Exactness: the first digit comes from the decimal STRING of exact
    cents (no log/pow float path can misround a boundary value like
    999.999...); expectations are inlined full-repr literals; every
    readout lands on a 1e-6 grid. Scale: one map + 9-group hash agg.
    """
    o = load_tables(spark, sf_dir)["orders"]
    digits = o.where(F.col("o_totalprice") > 0).select(
        F.substring(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("d")
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    exp_t = load_tables(spark, sf_dir)["region"].sparkSession.createDataFrame(
        _BENFORD, "d int, p double"
    )
    tot = obs.agg(F.sum("n_obs").cast("bigint").alias("n"))
    n_obs = F.coalesce(F.col("n_obs"), F.lit(0))
    dev = n_obs.cast("double") - F.col("p") * F.col("n")
    return (
        exp_t.join(obs, "d", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("digit"),
            n_obs.cast("bigint").alias("n_obs"),
            (
                F.floor(n_obs.cast("double") / F.col("n") * 1000000 + 0.5)
                / 1000000
            ).alias("obs_share"),
            (F.floor(F.col("p") * 1000000 + 0.5) / 1000000).alias("exp_share"),
            (
                F.floor(dev * dev / (F.col("p") * F.col("n")) * 1000000 + 0.5)
                / 1000000
            ).alias("chi2_contrib"),
        )
    )


@register(
    "agg_winsorized_mean",
    # Winsorized mean per group: clamp to the DISCRETE p05/p95 of
    # exact cents, then average — the robust estimator that KEEPS
    # outlier rows (at the fence) where agg_trimmed_mean drops them.
    # Two-pass: group percentiles, broadcast back, clamp, one exact
    # division.
    oracle="""
    WITH cents AS (
      SELECT l_returnflag AS flag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
      FROM lineitem
    ), fences AS (
      SELECT flag,
             CAST(quantile_disc(c, 0.05) AS BIGINT) AS lo,
             CAST(quantile_disc(c, 0.95) AS BIGINT) AS hi
      FROM cents GROUP BY flag
    )
    SELECT c.flag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           f.lo AS fence_lo,
           f.hi AS fence_hi,
           floor(CAST(SUM(LEAST(GREATEST(c.c, f.lo), f.hi)) AS DOUBLE)
                 / COUNT(*) / 100 * 10000 + 0.5) / 10000 AS winsorized_mean,
           floor(CAST(SUM(c.c) AS DOUBLE) / COUNT(*) / 100 * 10000 + 0.5)
             / 10000 AS raw_mean
    FROM cents c JOIN fences f USING (flag)
    GROUP BY c.flag, f.lo, f.hi
    """,
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean (5% two-sided) per return flag: outliers are
    CLAMPED to the p05/p95 fences instead of dropped — the robust
    estimator of choice when every row must keep its weight (billing
    reconciliation, capped-payout metrics), completing the robust
    family beside agg_trimmed_mean (drops) and event_anomaly_mad
    (flags). The raw mean rides along so the outlier influence is
    directly readable.

    Exactness: fences are DISCRETE percentiles of exact cents (actual
    data values, engine-identical); clamped sums are exact BIGINTs;
    one division per group. Scale: one percentile agg on the group
    grain, fences broadcast back, one clamped hash agg.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    # spread: both the percentile agg's map side and the clamped agg
    # otherwise run inside the single-task fixture scan (guide §2.5;
    # cluster no-op). The exact percentile REDUCE is still one task
    # per flag group — inherent to discrete percentiles; the sketch
    # tier for wide groups is agg_approx_percentile.
    cents = spread(li).select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint").alias("c"),
    )
    fences = cents.groupBy("flag").agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY c)")
        .cast("bigint")
        .alias("lo"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY c)")
        .cast("bigint")
        .alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("c"), F.col("lo")), F.col("hi"))
    return (
        cents.join(F.broadcast(fences), "flag")
        .groupBy("flag", "lo", "hi")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            (
                F.floor(
                    F.sum(clamped).cast("double")
                    / F.count(F.lit(1))
                    / 100
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("winsorized_mean"),
            (
                F.floor(
                    F.sum("c").cast("double") / F.count(F.lit(1)) / 100 * 10000
                    + 0.5
                )
                / 10000
            ).alias("raw_mean"),
        )
        .select(
            "flag",
            "n_rows",
            F.col("lo").alias("fence_lo"),
            F.col("hi").alias("fence_hi"),
            "winsorized_mean",
            "raw_mean",
        )
    )
