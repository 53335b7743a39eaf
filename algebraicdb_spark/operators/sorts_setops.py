"""§2.6 sorts / limits / top-k / set operations.

Scale notes:
  - ``topk_order_limit`` must plan as TakeOrderedAndProject (per-
    partition heap + driver merge of k rows), NEVER a global sort —
    asserted in tests via the physical plan.
  - Set ops are planned as aggregates (distinct union) or left-anti /
    intersect joins by Catalyst; nothing custom needed.
  - A full ORDER BY is a range-partitioned global sort — fine for
    result delivery, but the determinism the oracle needs comes from
    unique tie-break keys, not from the sort itself (the driver's
    value-hash is order-insensitive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from algebraicdb_spark.functions.rounding import pround
from algebraicdb_spark.plans.registry import register
from algebraicdb_spark.sources.catalog import load_tables


@register(
    "sort_multicol_nulls",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           floor(CAST(NULLIF(c_acctbal, 0.0) AS DOUBLE) * 10000 + 0.5) / 10000 AS bal_or_null
    FROM customer
    WHERE c_custkey % 10 = 0
    ORDER BY c_mktsegment ASC, bal_or_null DESC NULLS LAST, c_custkey ASC
    """,
)
def sort_multicol_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column ORDER BY with NULLS LAST on a derived nullable col."""
    c = load_tables(spark, sf_dir)["customer"]
    return (
        c.filter(F.col("c_custkey") % 10 == 0)
        .select(
            "c_custkey",
            "c_mktsegment",
            pround(F.nullif(F.col("c_acctbal"), F.lit(0.0))).alias("bal_or_null"),
        )
        .orderBy(
            F.col("c_mktsegment").asc(),
            F.col("bal_or_null").desc_nulls_last(),
            F.col("c_custkey").asc(),
        )
    )


@register(
    "topk_order_limit",
    oracle="""
    SELECT o_orderkey, floor(CAST(o_totalprice AS DOUBLE) * 10000 + 0.5) / 10000 AS totalprice, o_orderstatus
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey DESC
    LIMIT 10
    """,
)
def topk_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: ORDER BY + LIMIT → TakeOrderedAndProject (no global sort);
    unique tie-break (orderkey) per SURVEY §5.3.3."""
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").desc())
        .limit(10)
        .select(
            "o_orderkey",
            pround("o_totalprice").alias("totalprice"),
            "o_orderstatus",
        )
    )


_SLICE_A = "o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'"
_SLICE_B = "o_orderdate >= TIMESTAMP '1996-04-01' AND o_orderdate < TIMESTAMP '1996-10-01'"


@register(
    "set_union_all",
    oracle=f"""
    SELECT COUNT(*) AS n_rows, COUNT(DISTINCT o_orderkey) AS n_distinct
    FROM (
      SELECT o_orderkey FROM orders WHERE {_SLICE_A}
      UNION ALL
      SELECT o_orderkey FROM orders WHERE {_SLICE_B}
    )
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union of two overlapping date slices (duplicates kept)."""
    o = load_tables(spark, sf_dir)["orders"]
    a = o.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    ).select("o_orderkey")
    b = o.filter(
        (F.col("o_orderdate") >= "1996-04-01") & (F.col("o_orderdate") < "1996-10-01")
    ).select("o_orderkey")
    return a.unionByName(b).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_distinct"),
    )


@register(
    "set_union_distinct",
    oracle=f"""
    SELECT o_orderkey FROM orders WHERE {_SLICE_A}
    UNION
    SELECT o_orderkey FROM orders WHERE {_SLICE_B}
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (deduplicating) of the same two slices."""
    o = load_tables(spark, sf_dir)["orders"]
    a = o.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    ).select("o_orderkey")
    b = o.filter(
        (F.col("o_orderdate") >= "1996-04-01") & (F.col("o_orderdate") < "1996-10-01")
    ).select("o_orderkey")
    return a.union(b).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): nation keys present in both segments."""
    c = load_tables(spark, sf_dir)["customer"]
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    return a.intersect(b)


@register(
    "set_intersect_all",
    oracle="""
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT ALL
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag intersection): each nation key appears
    min(count_a, count_b) times — the multiplicity-aware twin of
    ``set_intersect``. Planned as a count-matching hash semi shape,
    shuffling only the projected key column."""
    c = load_tables(spark, sf_dir)["customer"]
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    return a.intersectAll(b)


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT ALL
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference) — multiplicity-aware anti semantics."""
    c = load_tables(spark, sf_dir)["customer"]
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    return a.exceptAll(b)


@register(
    "skyline_pareto",
    # dominance: q beats p iff q.price > p.price AND q.day > p.day
    # (strict on both dims); skyline = rows no one beats
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS price,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_day
    FROM orders p
    WHERE o_orderkey % 3 = 0
      AND NOT EXISTS (
        SELECT 1 FROM orders q
        WHERE q.o_orderkey % 3 = 0
          AND q.o_orderpriority = p.o_orderpriority
          AND q.o_totalprice > p.o_totalprice
          AND CAST(q.o_orderdate AS DATE) > CAST(p.o_orderdate AS DATE)
      )
    """,
)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority 2-D Pareto skyline (maximize price AND recency).

    Scale-safe exact formulation (EDBT'23 "Skyline Queries in Spark
    SQL" problem, solved with relational ops instead of a quadratic
    self-join): pre-aggregate max(day) per (group, price); running
    max over STRICTLY greater prices via a 1-preceding window on the
    distinct-price table (tiny); join back and keep rows whose day is
    not strictly below that running max. One shuffle on the group
    key + one broadcastable distinct-price window — works unchanged
    when the fact side is 10^12 rows, because the window runs on
    distinct (group, price) pairs only.
    """
    o = (
        load_tables(spark, sf_dir)["orders"]
        .filter(F.col("o_orderkey") % 3 == 0)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
            F.to_date("o_orderdate").alias("order_day"),
        )
    )
    per_price = o.groupBy("o_orderpriority", "price").agg(
        F.max("order_day").alias("best_day")
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("price").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = per_price.select(
        "o_orderpriority",
        "price",
        F.max("best_day").over(w).alias("beaten_by_day"),
    )
    return (
        o.join(frontier, ["o_orderpriority", "price"])
        .filter(
            F.col("beaten_by_day").isNull()
            | (F.col("order_day") >= F.col("beaten_by_day"))
        )
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.col("price").cast("double").alias("price"),
            F.col("order_day").cast("string").alias("order_day"),
        )
    )


@register(
    "set_except_distinct",
    oracle="""
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
)
def set_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (DISTINCT) — set difference, completing the set-op
    family next to the bag-semantics ``set_except`` (EXCEPT ALL):
    a key qualifies once iff it appears in A and never in B.
    Planned as distinct + left-anti hash join on the single
    projected column."""
    c = load_tables(spark, sf_dir)["customer"]
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    return a.subtract(b)
