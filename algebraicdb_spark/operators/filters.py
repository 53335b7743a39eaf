"""§2.2 projection / filter / predicate surface.

Reference parity: SELECT list + WHERE with comparison and boolean
operators is algebraicdb's core relational surface; IN/BETWEEN/LIKE,
NULL semantics and DISTINCT are extensions (the reference had no SQL
NULL — absence was an ADT variant, see functions/adt.py).

Scale: all keys are scan→filter→project pipelines — Catalyst pushes
every predicate into the parquet reader (PushedFilters), so at 100 TB
these are IO-bound single stages with no shuffle (except DISTINCT,
which shuffles its 2 grouping columns only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from algebraicdb_spark.functions.rounding import exact_money_sum, pround
from algebraicdb_spark.plans.registry import register
from algebraicdb_spark.sources.catalog import load_tables


@register(
    "project_select",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) * 10000 + 0.5) / 10000 AS revenue,
           floor(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DOUBLE) * 10000 + 0.5) / 10000 AS charged
    FROM lineitem
    WHERE l_orderkey % 500 = 0
    """,
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with alias + arithmetic (ref: SELECT list)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.filter(F.col("l_orderkey") % 500 == 0).select(
        "l_orderkey",
        "l_linenumber",
        pround(rev).alias("revenue"),
        pround(rev * (1 + F.col("l_tax"))).alias("charged"),
    )


@register(
    "filter_comparison",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_quantity > 25.0
      AND l_returnflag != 'A'
    """,
)
def filter_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """<, <=, =, !=, >, >= over numbers, strings and timestamps."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_quantity") > 25.0)
            & (F.col("l_returnflag") != "A")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            exact_money_sum("l_extendedprice").alias("sum_price"),
        )
    )


@register(
    "filter_boolean_logic",
    oracle="""
    SELECT COUNT(*) AS n_rows
    FROM orders
    WHERE (o_orderstatus = 'F' OR o_totalprice > 200000.0)
      AND NOT (o_orderpriority = '5-LOW' AND o_totalprice < 50000.0)
    """,
)
def filter_boolean_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND / OR / NOT with parenthesization."""
    o = load_tables(spark, sf_dir)["orders"]
    keep = ((F.col("o_orderstatus") == "F") | (F.col("o_totalprice") > 200000.0)) & ~(
        (F.col("o_orderpriority") == "5-LOW") & (F.col("o_totalprice") < 50000.0)
    )
    return o.filter(keep).agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "filter_in_between_like",
    oracle="""
    SELECT o_orderkey, o_orderpriority, floor(CAST(o_totalprice AS DOUBLE) * 10000 + 0.5) / 10000 AS totalprice
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
      AND o_totalprice BETWEEN 100000.0 AND 150000.0
      AND o_orderpriority LIKE '%URGENT%'
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
    """,
)
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list, BETWEEN (numeric + date band), LIKE."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.filter(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(100000.0, 150000.0)
        & F.col("o_orderpriority").like("%URGENT%")
        & F.col("o_orderdate").between("1996-01-01", "1998-12-31")
    ).select(
        "o_orderkey",
        "o_orderpriority",
        pround("o_totalprice").alias("totalprice"),
    )


@register(
    "filter_null_semantics",
    oracle="""
    WITH d AS (
      SELECT l_orderkey, l_linenumber, NULLIF(l_discount, 0.0) AS disc
      FROM lineitem
    )
    SELECT
      COUNT(*) AS n_rows,
      CAST(SUM(CASE WHEN disc IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      CAST(SUM(CASE WHEN disc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_not_null,
      CAST(SUM(CASE WHEN disc IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq_null,
      CAST(SUM(CASE WHEN (disc = 0.05) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_threevalued_unknown
    FROM d
    """,
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL + null-safe equality vs three-valued logic.

    Fixtures have no NULLs (FIXTURES.md invariant) so the nullable
    column is derived with nullif; the reference had no NULL at all
    (absence = ADT variant) so this whole key is an extension.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    d = li.select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc"),
    )
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        one_if(F.col("disc").isNull()).alias("n_null"),
        one_if(F.col("disc").isNotNull()).alias("n_not_null"),
        one_if(F.col("disc").eqNullSafe(F.lit(None).cast("double"))).alias(
            "n_nullsafe_eq_null"
        ),
        one_if((F.col("disc") == 0.05).isNull()).alias("n_threevalued_unknown"),
    )


@register(
    "project_case_when",
    oracle="""
    SELECT tier, COUNT(*) AS n_orders, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
    FROM (
      SELECT o_totalprice,
             CASE WHEN o_totalprice < 50000.0  THEN 'small'
                  WHEN o_totalprice < 150000.0 THEN 'medium'
                  WHEN o_totalprice < 300000.0 THEN 'large'
                  ELSE 'jumbo' END AS tier
      FROM orders
    )
    GROUP BY tier
    """,
)
def project_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN ladder (ref expressed this via pattern matching)."""
    o = load_tables(spark, sf_dir)["orders"]
    tier = (
        F.when(F.col("o_totalprice") < 50000.0, "small")
        .when(F.col("o_totalprice") < 150000.0, "medium")
        .when(F.col("o_totalprice") < 300000.0, "large")
        .otherwise("jumbo")
    )
    return (
        o.select(F.col("o_totalprice"), tier.alias("tier"))
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_money_sum("o_totalprice").alias("sum_price"),
        )
    )


@register(
    "distinct_rows",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT — shuffles only the two grouping columns."""
    c = load_tables(spark, sf_dir)["customer"]
    return c.select("c_mktsegment", "c_nationkey").distinct()
