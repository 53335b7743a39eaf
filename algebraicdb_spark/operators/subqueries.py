"""Subquery surface (SURVEY §4.2: Catalyst decorrelates these into
joins — RewriteCorrelatedScalarSubquery / RewritePredicateSubquery).

These keys prove the rewrite happens: a correlated scalar subquery
that executed per-row would never finish at 100 TB; decorrelated, it
is one aggregate + one join (asserted in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from algebraicdb_spark.plans.registry import register
from algebraicdb_spark.sources.catalog import load_tables


@register(
    "subquery_scalar",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_above
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    GROUP BY o_orderstatus
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: compare each row to a global agg
    (planned as a one-row broadcast, not a per-row execution)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n_above
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        GROUP BY o_orderstatus
        """
    )


@register(
    "subquery_correlated",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_rich
    FROM customer c
    WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    GROUP BY c_mktsegment
    """,
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: per-nation average, decorrelated by
    Catalyst into (groupBy nation → avg) ⋈ customer."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_rich
        FROM customer c
        WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        GROUP BY c_mktsegment
        """
    )


@register(
    "subquery_in",
    oracle="""
    SELECT COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
      AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem
                             WHERE l_returnflag = 'R')
    """,
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN subqueries → semi / anti joins (null-safe NOT IN
    is the classic trap; fixture keys are non-null so the rewrite is
    a plain anti join)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT COUNT(*) AS n_orders,
               COUNT(DISTINCT o_custkey) AS n_customers
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
          AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem
                                 WHERE l_returnflag = 'R')
        """
    )
