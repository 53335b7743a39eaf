"""Scale linter: catches the anti-patterns, stays quiet on good plans."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from algebraicdb_spark.plans.scalelint import lint


def codes(df):
    return {c for _, c, _ in lint(df)}


def test_flags_cartesian(tables):
    df = tables["region"].crossJoin(tables["nation"].select("n_name"))
    assert "CARTESIAN" in codes(df) or "BNLJ" in codes(df)


def test_flags_global_window(tables):
    w = Window.orderBy("o_totalprice")
    df = tables["orders"].select("o_orderkey", F.row_number().over(w).alias("rn"))
    assert "GLOBAL_WINDOW" in codes(df)


def test_flags_python_udf(tables):
    from pyspark.sql.types import StringType

    f = F.udf(lambda s: s.lower(), StringType(), useArrow=False)
    df = tables["region"].select(f("r_name").alias("x"))
    assert "PY_EVAL" in codes(df)


def test_clean_on_good_plans(spark, sf_dir):
    from algebraicdb_spark.plans import registry

    qs = registry.queries()
    for key in ("agg_groupby_hash", "join_multiway_star", "win_row_number_topn"):
        bad = {c for sev, c, _ in lint(qs[key](spark, sf_dir)) if sev == "error"}
        assert not bad, f"{key}: {bad}"
