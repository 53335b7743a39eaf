"""Engine facade: the reference's statement workflow end-to-end —
CREATE TYPE → construct → store → SQL over the encoded column."""

import pytest
from pyspark.sql import functions as F

from algebraicdb_spark.engine import Engine, parse_create_type
from algebraicdb_spark.functions.adt import AdtError, AdtMatchError


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return Engine(spark, sf_dir=sf_dir)


def test_create_type_statement_roundtrip(eng):
    adt = eng.sql(
        "CREATE TYPE Shape = Circle(r: DOUBLE) | Rect(w: DOUBLE, h: DOUBLE) | Point"
    )
    assert adt.tags == ("Circle", "Rect", "Point")
    assert eng.type("Shape") is adt
    assert adt.variants[1].fields == (("w", "double"), ("h", "double"))


def test_parse_rejects_malformed():
    # NB: `Circle(r)` is now LEGAL — the reference's positional form
    with pytest.raises(AdtError):
        parse_create_type("CREATE TYPE Bad = Circle(r:)")
    with pytest.raises(AdtError):
        parse_create_type("CREATE TYPE Bad = circle(r: Double)")
    with pytest.raises(AdtError):
        parse_create_type("SELECT 1")


def test_select_over_constructed_column(eng):
    shape = eng.sql("CREATE TYPE Shape2 = Big(price: DOUBLE) | Small")
    df = eng.table("orders").select(
        "o_orderkey",
        shape.construct_when(
            [
                (F.col("o_totalprice") > 150000.0, "Big", {"price": F.col("o_totalprice")}),
                (F.lit(True), "Small", {}),
            ]
        ).alias("s"),
    )
    eng.create_table("order_shapes", df)
    out = {
        r["tag"]: r["n"]
        for r in eng.sql(
            "SELECT s.tag AS tag, COUNT(*) AS n FROM order_shapes GROUP BY s.tag"
        ).collect()
    }
    total = eng.table("orders").count()
    assert set(out) == {"Big", "Small"} and sum(out.values()) == total
    # match over the stored column, exhaustiveness enforced
    with pytest.raises(AdtMatchError):
        shape.match(F.col("s"), {"Big": lambda p: p["price"]})


def test_plain_sql_delegates(eng):
    assert eng.sql("SELECT 1 AS one").collect()[0]["one"] == 1


def test_unknown_type_errors(eng):
    with pytest.raises(AdtError, match="unknown type"):
        eng.type("Nope")
