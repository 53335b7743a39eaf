"""TPC-H composite workload suite (§2.12 beyond-plan extras).

Each key is a full classic TPC-H query re-expressed Spark-first over
the fixture star schema, with the handful of columns the fixtures
lack (partsupp, ship modes, commit/receipt dates, phones) adapted to
available ones — the adaptation is noted per query. These are the
end-to-end compositions a user of the reference actually runs: multi-
join + agg + order + limit in one declarative plan, so Catalyst gets
to do join reordering, pushdown, and AQE on realistic shapes.

Scale notes that hold for the whole module:
  - dimension tables (region, nation) are tiny at EVERY scale factor
    → explicit ``F.broadcast``; customer/supplier/part GROW with SF
    → no hard broadcast hint, AQE promotes them while they fit;
  - every LIMIT is preceded by a TOTAL order (unique tie-break) so
    results are deterministic under any partitioning (SURVEY §5.3.3);
  - money sums use ``exact_money_sum`` (decimal-grid summation —
    order-independent, bit-identical across engines); ratios divide
    the two exact sums; averages go through ``pround``
    (SURVEY §5.3.1, functions/rounding.py);
  - timestamps are exposed as formatted date strings (§5.3.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from algebraicdb_spark.functions.rounding import (
    exact_money_sum,
    exact_money_sum_sql,
    pround,
    pround_sql,
)
from algebraicdb_spark.plans.registry import register
from algebraicdb_spark.sources.catalog import load_tables

def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))
_REV_SQL = "l_extendedprice * (1 - l_discount)"


@register(
    "tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           {exact_money_sum_sql(_REV_SQL)} AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-06-15'
      AND l_shipdate  > TIMESTAMP '1996-06-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority: segment-filtered 3-way join → revenue
    top-10. Filters push to all three scans; the two shuffles are on
    the join keys; l_orderkey makes the LIMIT total-ordered."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"].filter(F.col("o_orderdate") < "1996-06-15"),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"].filter(F.col("l_shipdate") > "1996-06-15"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_money_sum(_revenue()).alias("revenue"))
        .select(
            "l_orderkey", "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("orderdate").asc(),
                 F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking, adapted: the fixture has no
    commit/receipt dates, so a "late" order is one with any line
    shipped >90 days after the order date. EXISTS lowers to LEFT SEMI
    — one shuffle on orderkey, no row duplication before the count."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    late = o.join(
        t["lineitem"],
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "tpch_q5",
    oracle=f"""
    SELECT n_name, {exact_money_sum_sql(_REV_SQL)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume: 6-way star with the local-supplier
    constraint (c_nationkey = s_nationkey). nation/region broadcast
    (25/5 rows at every SF); fact joins shuffle on their keys."""
    t = load_tables(spark, sf_dir)
    asia_nations = (
        t["nation"]
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    return (
        t["customer"]
        .join(t["orders"].filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1998-01-01")),
            F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"],
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(exact_money_sum(_revenue()).alias("revenue"))
    )


@register(
    "tpch_q6",
    oracle=f"""
    SELECT {exact_money_sum_sql('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecast-revenue change: pure scan-side predicate + global
    agg — the whole query is one WholeStageCodegen stage with every
    filter in PushedFilters."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            exact_money_sum(F.col("l_extendedprice") * F.col("l_discount"))
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q7",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           EXTRACT(year FROM l_shipdate) AS l_year,
           {exact_money_sum_sql(_REV_SQL)} AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_6')
        OR (sn.n_name = 'NATION_6' AND cn.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY sn.n_name, cn.n_name, EXTRACT(year FROM l_shipdate)
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping between two nations, both directions, by
    ship year. The disjunctive nation pair is applied AFTER the two
    broadcast nation joins — Catalyst still pushes each side's
    nationkey IN-list into the supplier/customer scans."""
    t = load_tables(spark, sf_dir)
    sn = t["nation"].select(F.col("n_nationkey").alias("s_nk"),
                            F.col("n_name").alias("supp_nation"))
    cn = t["nation"].select(F.col("n_nationkey").alias("c_nk"),
                            F.col("n_name").alias("cust_nation"))
    return (
        t["supplier"]
        .join(t["lineitem"].filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")),
            F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_6"))
            | ((F.col("supp_nation") == "NATION_6") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(exact_money_sum(_revenue()).alias("revenue"))
    )


@register(
    "tpch_q8",
    oracle=f"""
    WITH flat AS (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             CAST({_REV_SQL} AS DECIMAL(18,4)) AS volume,
             sn.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region    ON cn.n_regionkey = r_regionkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           {pround_sql("CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) / CAST(SUM(volume) AS DOUBLE)")}
             AS mkt_share
    FROM flat GROUP BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share, adapted: share of NATION_2 suppliers
    in PROMO-part revenue sold to ASIA customers, by order year
    (original picks one p_type and one region; partsupp not needed).
    Share = exact-decimal conditional sum / exact-decimal total — both
    sums are order-independent, so the double division is bit-stable."""
    t = load_tables(spark, sf_dir)
    asia = (
        t["nation"]
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    sn = t["nation"].select(F.col("n_nationkey").alias("s_nk"),
                            F.col("n_name").alias("supp_nation"))
    vol = _revenue().cast("decimal(18,4)")
    flat = (
        t["part"].filter(F.col("p_type") == "PROMO")
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"].filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")),
            F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(asia), F.col("c_nationkey") == F.col("c_nk"), "left_semi")
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"),
                "supp_nation")
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        flat.groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("volume"))
                  .otherwise(zero)).alias("_num"),
            F.sum("volume").alias("_den"),
        )
        .select(
            "o_year",
            pround(F.col("_num").cast("double") / F.col("_den").cast("double"))
            .alias("mkt_share"),
        )
    )


@register(
    "tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name,
           {exact_money_sum_sql(_REV_SQL)} AS revenue,
           {pround_sql('c_acctbal')} AS acctbal,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting: top-20 customers by revenue lost
    to returns in a quarter. Customer attributes ride the groupBy key
    (standard TPC-H shape); nation broadcast."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"].filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1996-04-01")),
            F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"].filter(F.col("l_returnflag") == "R"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(exact_money_sum(_revenue()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue",
                pround("c_acctbal").alias("acctbal"), "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                       AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order-count distribution (zero-order customers
    included via LEFT join; the original's comment-filter becomes a
    priority filter). Two aggs: per-customer count, then histogram —
    the second input is one row per customer, tiny at any SF."""
    t = load_tables(spark, sf_dir)
    per_cust = (
        t["customer"]
        .join(t["orders"].filter(F.col("o_orderpriority") != "1-URGENT"),
              F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q14",
    oracle=f"""
    SELECT {pround_sql(
        "100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' "
        f"THEN CAST({_REV_SQL} AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)"
        f" / CAST(SUM(CAST({_REV_SQL} AS DECIMAL(18,4))) AS DOUBLE)")} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion-revenue share for one ship month. Percentage of
    revenue from PROMO-type parts; both sums exact-decimal."""
    t = load_tables(spark, sf_dir)
    vol = _revenue().cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        t["lineitem"].filter(
            (F.col("l_shipdate") >= "1997-09-01")
            & (F.col("l_shipdate") < "1997-10-01"))
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero))
            .alias("_promo"),
            F.sum(vol).alias("_total"),
        )
        .select(
            pround(F.lit(100.0) * F.col("_promo").cast("double")
                   / F.col("_total").cast("double")).alias("promo_revenue")
        )
    )


@register(
    "tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {exact_money_sum_sql(_REV_SQL)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM revenue JOIN supplier ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: quarterly per-supplier revenue, keep the max
    — the original's `= (SELECT max(...))` shape. The scalar max is a
    1-row broadcast joined back against the revenue aggregate (ties
    survive, like the original); no ungrouped window, so nothing ever
    funnels through a single partition even with SF-many suppliers.
    Exact-decimal revenue makes the equality join safe (no float
    summation drift on either side)."""
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"].filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-04-01"))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(exact_money_sum(_revenue()).alias("total_revenue"))
    )
    top = rev.join(
        F.broadcast(rev.agg(F.max("total_revenue").alias("_mx"))),
        F.col("total_revenue") == F.col("_mx"),
    )
    return (
        top.join(t["supplier"], F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q17",
    oracle=f"""
    WITH target AS (
      SELECT l_partkey, l_quantity, l_extendedprice,
             AVG(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#4')
    )
    SELECT {exact_money_sum_sql('l_extendedprice')} AS total_price,
           COUNT(*) AS n_lines,
           {pround_sql('CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0')}
             AS avg_yearly
    FROM target
    WHERE l_quantity < 0.5 * avg_qty
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue for one brand. The original's
    correlated AVG-per-part subquery decorrelates to a window over
    the brand-filtered lineitem (threshold 0.5·avg — the fixture's
    quantity floor makes the original 0.2·avg empty). The brand
    filter is a left-semi join against part BEFORE the window, so the
    per-partkey window only sees the brand's lines."""
    t = load_tables(spark, sf_dir)
    brand_parts = t["part"].filter(F.col("p_brand") == "Brand#4").select("p_partkey")
    target = t["lineitem"].join(
        brand_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    w = Window.partitionBy("l_partkey")
    small = target.withColumn("avg_qty", F.avg("l_quantity").over(w)).filter(
        F.col("l_quantity") < 0.5 * F.col("avg_qty")
    )
    return small.agg(
        exact_money_sum("l_extendedprice").alias("total_price"),
        F.count(F.lit(1)).alias("n_lines"),
        pround(
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double") / 7.0
        ).alias("avg_yearly"),
    )


@register(
    "tpch_q18",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300
    )
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           {pround_sql('o_totalprice')} AS totalprice,
           sum_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: orders whose total quantity exceeds
    300 (decimal-exact HAVING, so the cutoff can't flap on float
    summation order), joined back to orders/customer, top-100."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("_q"))
        .filter(F.col("_q") > 300)
        .select("l_orderkey", F.col("_q").cast("double").alias("sum_qty"))
    )
    return (
        big.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            pround("o_totalprice").alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "tpch_q19",
    oracle=f"""
    SELECT {exact_money_sum_sql(_REV_SQL)} AS revenue, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#2'  AND p_size BETWEEN 16 AND 30
           AND l_quantity BETWEEN 10 AND 25)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 31 AND 50
           AND l_quantity BETWEEN 20 AND 35)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue under a 3-arm disjunctive predicate,
    adapted to brand/size/quantity bands (no containers/shipmodes in
    the fixture). One equi-join on partkey with the disjunction as a
    post-join filter — Catalyst still prunes part columns and pushes
    the common l_quantity bounds."""
    t = load_tables(spark, sf_dir)
    j = t["lineitem"].join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
    arm = lambda brand, s0, s1, q0, q1: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s0, s1)
        & F.col("l_quantity").between(q0, q1)
    )
    return (
        j.filter(
            arm("Brand#4", 1, 15, 1, 15)
            | arm("Brand#2", 16, 30, 10, 25)
            | arm("Brand#19", 31, 50, 20, 35)
        )
        .agg(exact_money_sum(_revenue()).alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
    )


@register(
    "tpch_q22",
    oracle=f"""
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    ), eligible AS (
      SELECT c_custkey, c_nationkey, c_acctbal
      FROM customer, avg_bal
      WHERE c_acctbal > a
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01')
    )
    SELECT n_name, COUNT(*) AS numcust,
           {exact_money_sum_sql('c_acctbal')} AS totacctbal
    FROM eligible JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity, adapted: rich (above-average
    balance) customers with no RECENT orders (the fixture's dense
    order history leaves nobody order-free for all time), grouped by
    nation instead of the fixture-absent phone country code. The
    scalar avg is a 1-row broadcast cross join; the lapsed test is
    LEFT ANTI on the date-filtered orders projection."""
    t = load_tables(spark, sf_dir)
    avg_bal = (
        t["customer"].filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("_a"))
    )
    eligible = (
        t["customer"]
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_a"))
        .join(t["orders"].filter(F.col("o_orderdate") >= "2000-01-01")
              .select(F.col("o_custkey").alias("c_custkey")),
              "c_custkey", "left_anti")
    )
    return (
        eligible.join(F.broadcast(t["nation"]),
                      F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("numcust"),
             exact_money_sum("c_acctbal").alias("totacctbal"))
    )


@register(
    "tpch_q9",
    oracle=f"""
    SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
           CAST(SUM(CAST({_REV_SQL} - 0.6 * p_retailprice * l_quantity
                         AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit, adapted: no partsupp in the fixture, so
    supply cost is modeled as 60% of p_retailprice (deterministic and
    on the 4-decimal grid: 2-dp price × 0.6 × integer quantity).
    Profit per (supplier nation, order year) over '%red%' parts —
    the name filter prunes part BEFORE the fact joins."""
    t = load_tables(spark, sf_dir)
    profit = _revenue() - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        t["part"].filter(F.col("p_name").like("%red%"))
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(exact_money_sum(profit).alias("sum_profit"))
    )


@register(
    "tpch_q12",
    oracle="""
    SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                THEN 'late' ELSE 'ontime' END AS ship_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping-priority split, adapted: no ship modes in the
    fixture, so lines bucket into late (>60 days after order) vs
    ontime, counting urgent/high-priority orders against the rest.
    The conditional counts are the classic SUM(CASE) map-side shape
    (BIGINT-cast in the oracle — DuckDB integer SUM yields HUGEINT)."""
    t = load_tables(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        "late",
    ).otherwise("ontime")
    return (
        t["orders"]
        .join(t["lineitem"].filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")),
            F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#2'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 supplier-count per part attribute, adapted: the fixture has
    no partsupp, so supplier relationships come from observed lineitem
    (which supplier actually shipped the part). The brand/size
    exclusions push into the part scan; COUNT(DISTINCT) shuffles the
    deduped (attrs, suppkey) pairs only."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"].filter(
            (F.col("p_brand") != "Brand#2")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q2",
    oracle="""
    WITH shippers AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), eu AS (
      SELECT s_suppkey, s_acctbal, s_name, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
    ), cand AS (
      SELECT p_partkey, p_name, s_acctbal, s_name, n_name,
             min(s_acctbal) OVER (PARTITION BY p_partkey) AS min_bal
      FROM part
      JOIN shippers ON p_partkey = l_partkey
      JOIN eu ON l_suppkey = s_suppkey
      WHERE p_size = 15
    )
    SELECT floor(CAST(s_acctbal AS DOUBLE) * 10000 + 0.5) / 10000 AS acctbal,
           s_name, n_name, p_partkey, p_name
    FROM cand WHERE s_acctbal = min_bal
    ORDER BY acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
    LIMIT 100
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier, adapted: no partsupp, so the
    part↔supplier relation is the observed distinct (partkey, suppkey)
    pairs from lineitem and "cost" is the supplier's account balance.
    The correlated min-cost subquery decorrelates to a per-part window
    over the EUROPE-filtered candidates (ties kept, like the original).
    No arithmetic anywhere — the equality on min is float-safe."""
    t = load_tables(spark, sf_dir)
    shippers = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    eu = (
        t["supplier"]
        .join(F.broadcast(
            t["nation"]
            .join(F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
                  F.col("n_regionkey") == F.col("r_regionkey"))
            .select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    cand = (
        t["part"].filter(F.col("p_size") == 15)
        .join(shippers, F.col("p_partkey") == F.col("l_partkey"))
        .join(eu, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select(pround("s_acctbal").alias("acctbal"),
                "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.col("acctbal").desc(), F.col("n_name").asc(),
                 F.col("s_name").asc(), F.col("p_partkey").asc())
        .limit(100)
    )


@register(
    "tpch_q11",
    oracle=f"""
    WITH joined AS (
      SELECT l_partkey, l_extendedprice, l_discount
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
    ), v AS (
      SELECT l_partkey AS partkey,
             {exact_money_sum_sql(_REV_SQL)} AS part_value
      FROM joined GROUP BY l_partkey
    )
    SELECT partkey, part_value
    FROM v
    WHERE part_value > (SELECT {exact_money_sum_sql(_REV_SQL)}
                               * 2.0 / COUNT(DISTINCT l_partkey)
                        FROM joined)
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock, adapted: "stock value" is the observed
    shipped revenue of NATION_3's suppliers per part; parts above 2x
    the MEAN per-part share qualify (the original's FRACTION/SF knob,
    derived from the part count so it self-scales at every SF). BOTH
    the per-part values and the global threshold are exact-decimal
    sums over the SAME base rows — never a re-sum of per-part
    doubles, whose float summation order could flip membership right
    at the threshold."""
    t = load_tables(spark, sf_dir)
    n3 = (
        t["nation"].filter(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    joined = (
        t["lineitem"]
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n3), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    per_part = joined.groupBy(F.col("l_partkey").alias("partkey")).agg(
        exact_money_sum(_revenue()).alias("part_value")
    )
    threshold = joined.agg(
        (exact_money_sum(_revenue()) * 2.0
         / F.countDistinct("l_partkey")).alias("_thr")
    )
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("_thr"))
        .select("partkey", "part_value")
    )


@register(
    "tpch_q20",
    oracle="""
    WITH red AS (
      SELECT l_suppkey,
             CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                            AND l_shipdate <  TIMESTAMP '1998-01-01'
                           THEN l_quantity END) AS DOUBLE) AS qty_97,
             SUM(l_quantity) AS qty_all
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%red%'
      GROUP BY l_suppkey
    )
    SELECT s_name, n_name, qty_97, qty_all
    FROM red
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE qty_97 > 0.2 * qty_all
    ORDER BY s_name
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 excess-inventory suppliers, adapted: no partsupp availqty,
    so the flag is "1997 shipped over 20% of all-time shipped" for
    '%red%' parts. Quantities are integral doubles, so the sums are
    exact in any order and the 0.2 comparison can't flap. A supplier
    with no 1997 red lines gets NULL qty_97 — filtered identically by
    both engines."""
    t = load_tables(spark, sf_dir)
    in_97 = (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    red = (
        t["lineitem"]
        .join(t["part"].filter(F.col("p_name").like("%red%")).select("p_partkey"),
              F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.when(in_97, F.col("l_quantity"))).alias("qty_97"),
            F.sum("l_quantity").alias("qty_all"),
        )
        .filter(F.col("qty_97") > 0.2 * F.col("qty_all"))
    )
    return (
        red.join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name", "qty_97", "qty_all")
        .orderBy("s_name")
    )


@register(
    "tpch_q21",
    oracle="""
    WITH per_supp AS (
      SELECT l_orderkey, l_suppkey,
             bool_or(l_shipdate > o_orderdate + INTERVAL 90 DAY) AS is_late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY l_orderkey, l_suppkey
    ), per_order AS (
      SELECT l_orderkey,
             COUNT(*) AS n_supp,
             CAST(SUM(CASE WHEN is_late THEN 1 ELSE 0 END) AS BIGINT) AS n_late
      FROM per_supp GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM per_supp
    JOIN per_order USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE is_late AND n_supp > 1 AND n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 20
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting, adapted to the ship-lag
    lateness proxy: count, per supplier, the multi-supplier orders
    where they were the ONLY late shipper.

    The original's EXISTS/NOT EXISTS pair over lineitem decorrelates
    to two aggregates on the (orderkey, suppkey) grain, and the
    order-level counts come back via a WINDOW over the per-supp grain
    instead of a per_supp ⋈ per_order self-join (round-14 guide §2.4
    "two operations keyed the same way can share one exchange"): the
    before-plan computed the lineitem⋈orders join + (orderkey,supp)
    aggregate TWICE — identical subtrees too differently pruned for
    ReuseExchange — and sort-merge-joined them back (2 fact scans,
    4 exchanges, measured 2× ~0.96 s duplicate jobs at sf0.1). Now:
    one scan, one aggregate exchange on (l_orderkey, l_suppkey), one
    window exchange on l_orderkey — same rows, same hash."""
    t = load_tables(spark, sf_dir)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    per_supp = (
        t["lineitem"]
        .join(t["orders"].select("o_orderkey", "o_orderdate"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    w_order = Window.partitionBy("l_orderkey")
    counted = per_supp.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.count(F.lit(1)).over(w_order).alias("n_supp"),
        F.sum(F.when(F.col("is_late"), 1).otherwise(0)).over(w_order).alias("n_late"),
    )
    return (
        counted
        .filter(F.col("is_late") & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )
