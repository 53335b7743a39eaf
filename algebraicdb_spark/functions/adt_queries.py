"""§2.8 ADT / pattern-matching query keys.

The ADT column is derived from ``events`` (FIXTURES.md):

    Event = Click(user) | View(user) | Purchase(amount)
          | Signup(user) | Error(code)

Each key exercises the tagged-struct encoding through the
functions/adt.py builder; every oracle states the same semantics in
plain SQL (CASE over event_type), so the *values* — constructed
payloads included — are hash-checked, not just row counts.

Scale: the encoding is pure struct/when/getField expressions inside
WholeStageCodegen; match-then-aggregate plans exactly like a CASE
aggregation (no shuffle beyond the aggregate's own).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from algebraicdb_spark.functions.rounding import pround
from algebraicdb_spark.functions.adt import EVENT_ADT, option_of
from algebraicdb_spark.plans.registry import register
from algebraicdb_spark.sources.catalog import load_tables


def encode_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events rows → (event_id, ts_ns, e: Event) using the ADT constructors."""
    e = load_tables(spark, sf_dir)["events"]
    code = F.get_json_object("props", "$.k").cast("int")
    adt = EVENT_ADT.construct_when(
        [
            (F.col("event_type") == "click", "Click", {"user": F.col("user_id")}),
            (F.col("event_type") == "view", "View", {"user": F.col("user_id")}),
            (F.col("event_type") == "purchase", "Purchase", {"amount": F.col("value")}),
            (F.col("event_type") == "signup", "Signup", {"user": F.col("user_id")}),
            (F.col("event_type") == "error", "Error", {"code": code}),
        ]
    )
    return e.select("event_id", "ts_ns", F.col("ts"), adt.alias("e"))


@register(
    "adt_construct",
    oracle="""
    SELECT CASE event_type WHEN 'click' THEN 'Click' WHEN 'view' THEN 'View'
                WHEN 'purchase' THEN 'Purchase' WHEN 'signup' THEN 'Signup'
                ELSE 'Error' END AS tag,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN event_type IN ('click','view','signup')
                         THEN user_id ELSE 0 END) AS BIGINT) AS user_checksum,
           floor(CAST(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END) AS DOUBLE) * 10000 + 0.5) / 10000
             AS amount_checksum,
           CAST(SUM(CASE WHEN event_type = 'error'
                    THEN CAST(json_extract_string(props, '$.k') AS INT)
                    ELSE 0 END) AS BIGINT) AS code_checksum
    FROM events
    GROUP BY 1
    """,
)
def adt_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TYPE + constructors: encode rows, checksum each payload."""
    enc = encode_events(spark, sf_dir)
    e = F.col("e")
    user = F.coalesce(
        *[EVENT_ADT.bind(e, v, "user") for v in ("Click", "View", "Signup")]
    )
    return enc.groupBy(e.getField("tag").alias("tag")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.coalesce(user, F.lit(0))).alias("user_checksum"),
        pround(
            F.sum(F.coalesce(EVENT_ADT.bind(e, "Purchase", "amount"), F.lit(0.0)))).alias("amount_checksum"),
        F.sum(
            F.coalesce(EVENT_ADT.bind(e, "Error", "code").cast("bigint"), F.lit(0))
        ).alias("code_checksum"),
    )


@register(
    "adt_match_filter",
    oracle="""
    SELECT event_id, floor(CAST(value AS DOUBLE) * 10000 + 0.5) / 10000 AS amount
    FROM events
    WHERE event_type = 'purchase' AND value > 100.0
    """,
)
def adt_match_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE-position pattern: ``e: Purchase(amt) AND amt > 100``."""
    enc = encode_events(spark, sf_dir)
    e = F.col("e")
    amt = EVENT_ADT.bind(e, "Purchase", "amount")
    return (
        enc.filter(EVENT_ADT.is_variant(e, "Purchase") & (amt > 100.0))
        .select("event_id", pround(amt).alias("amount"))
    )


@register(
    "adt_match_project",
    oracle="""
    SELECT event_id,
           CASE event_type
             WHEN 'purchase' THEN CASE WHEN value > 250.0 THEN 'big-purchase'
                                       ELSE 'small-purchase' END
             WHEN 'click'  THEN 'click:' || CAST(user_id % 10 AS VARCHAR)
             WHEN 'view'   THEN 'view:'  || CAST(user_id % 10 AS VARCHAR)
             WHEN 'signup' THEN 'signup'
             ELSE 'error:' || CAST(CAST(json_extract_string(props, '$.k') AS INT) % 5
                                   AS VARCHAR)
           END AS label
    FROM events
    WHERE event_id % 7 = 0
    """,
)
def adt_match_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT-position match destructuring every variant (exhaustive)."""
    enc = encode_events(spark, sf_dir)
    label = EVENT_ADT.match(
        F.col("e"),
        {
            "Purchase": lambda p: F.when(
                p.getField("amount") > 250.0, "big-purchase"
            ).otherwise("small-purchase"),
            "Click": lambda p: F.concat(
                F.lit("click:"), (p.getField("user") % 10).cast("string")
            ),
            "View": lambda p: F.concat(
                F.lit("view:"), (p.getField("user") % 10).cast("string")
            ),
            "Signup": lambda p: F.lit("signup"),
            "Error": lambda p: F.concat(
                F.lit("error:"), (p.getField("code") % 5).cast("string")
            ),
        },
    )
    return enc.filter(F.col("event_id") % 7 == 0).select(
        "event_id", label.alias("label")
    )


@register(
    "adt_match_agg",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           floor(CAST(SUM(CASE WHEN event_type = 'purchase' THEN value END) AS DOUBLE) * 10000 + 0.5) / 10000 AS revenue,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
    FROM events
    GROUP BY 1
    HAVING SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
    """,
)
def adt_match_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over matched variants: daily Purchase revenue."""
    enc = encode_events(spark, sf_dir)
    e = F.col("e")
    amount = EVENT_ADT.bind(e, "Purchase", "amount")
    is_ = lambda v: F.when(EVENT_ADT.is_variant(e, v), 1).otherwise(0)  # noqa: E731
    return (
        enc.groupBy(F.to_date("ts").alias("day"))
        .agg(
            pround(F.sum(amount)).alias("revenue"),
            F.sum(is_("Purchase")).alias("n_purchases"),
            F.sum(is_("Error")).alias("n_errors"),
        )
        .filter(F.col("n_purchases") > 0)
    )


@register(
    "adt_dialect_match",
    oracle="""
    SELECT event_id, floor(CAST(value AS DOUBLE) * 10000 + 0.5) / 10000 AS amount
    FROM events
    WHERE event_type = 'purchase' AND value > 200.0
    """,
)
def adt_dialect_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's *statement* surface end-to-end: the pattern
    ``e: Purchase(amt)`` is written in the dialect and rewritten to
    tag predicate + payload access before Spark SQL plans it."""
    from algebraicdb_spark.engine import Engine

    eng = Engine(spark)
    eng.create_table(
        "tagged_events", encode_events(spark, sf_dir), adt_columns={"e": EVENT_ADT}
    )
    return eng.sql(
        "SELECT event_id, floor(CAST(amt AS DOUBLE) * 10000 + 0.5) / 10000 AS amount FROM tagged_events "
        "WHERE e: Purchase(amt) AND amt > 200.0"
    )


@register(
    "adt_dialect_match_expr",
    oracle="""
    SELECT CASE WHEN event_type = 'purchase' AND value > 250.0 THEN 'big'
                WHEN event_type = 'purchase' THEN 'small'
                WHEN event_type = 'error' THEN 'error'
                ELSE 'engagement' END AS bucket,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def adt_dialect_match_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's MATCH expression in statement position, with
    plan-time exhaustiveness (all five Event variants covered)."""
    from algebraicdb_spark.engine import Engine

    eng = Engine(spark)
    eng.create_table(
        "tagged_events2", encode_events(spark, sf_dir), adt_columns={"e": EVENT_ADT}
    )
    return eng.sql(
        """
        SELECT MATCH e { Purchase(amt) => CASE WHEN amt > 250.0 THEN 'big'
                                               ELSE 'small' END,
                         Error(code) => 'error',
                         Click(u) => 'engagement',
                         View(u2) => 'engagement',
                         Signup(u3) => 'engagement' } AS bucket,
               COUNT(*) AS n
        FROM tagged_events2
        GROUP BY 1
        """
    )


@register(
    "adt_dialect_table",
    # the whole lifecycle (CREATE TYPE/TABLE, INSERT with constructor
    # literals, pattern-matched SELECT) vs a plain-SQL VALUES twin
    oracle="""
    SELECT id,
           CAST(CASE WHEN tag = 'Circle' THEN floor(CAST(3.0 * r * r AS DOUBLE) * 10000 + 0.5) / 10000
                     WHEN tag = 'Rect' THEN floor(CAST(w * h AS DOUBLE) * 10000 + 0.5) / 10000
                     ELSE 0.0 END AS DOUBLE) AS area
    FROM (VALUES (1, 'Circle', 2.0, NULL, NULL),
                 (2, 'Point', NULL, NULL, NULL),
                 (3, 'Rect', NULL, 3.0, 4.0),
                 (4, 'Circle', 0.5, NULL, NULL)) t(id, tag, r, w, h)
    ORDER BY id
    """,
)
def adt_dialect_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TYPE → CREATE TABLE → INSERT (constructor literals) →
    pattern-matched SELECT, all as dialect statements."""
    from algebraicdb_spark.engine import Engine

    eng = Engine(spark)
    eng.sql(
        "CREATE TYPE DShape = Circle(r: Double) | Rect(w: Double, h: Double) | Point"
    )
    eng.sql("CREATE TABLE dialect_shapes (id: Integer, s: DShape)")
    eng.sql(
        "INSERT INTO dialect_shapes VALUES "
        "(1, Circle(2.0)), (2, Point), (3, Rect(3.0, 4.0)), (4, Circle(0.5))"
    )
    return eng.sql(
        """
        SELECT id,
               CASE WHEN s: Circle(cr) THEN floor(CAST(3.0 * cr * cr AS DOUBLE) * 10000 + 0.5) / 10000
                    WHEN s: Rect(w, h) THEN floor(CAST(w * h AS DOUBLE) * 10000 + 0.5) / 10000
                    ELSE 0.0 END AS area
        FROM dialect_shapes ORDER BY id
        """
    )


@register(
    "adt_nested",
    oracle="""
    SELECT CASE WHEN value <= 50.0 THEN 'none'
                WHEN event_type = 'purchase' THEN 'some-purchase'
                ELSE 'some-other' END AS shape,
           COUNT(*) AS n,
           floor(CAST(SUM(CASE WHEN value > 50.0 AND event_type = 'purchase'
                          THEN value ELSE 0.0 END) AS DOUBLE) * 10000 + 0.5) / 10000 AS some_purchase_value
    FROM events
    GROUP BY 1
    """,
)
def adt_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested ADT: Option<Event> (Some when value > 50), matched two
    levels deep — the outer match binds the inner Event, the inner
    match inspects its tag."""
    opt = option_of(EVENT_ADT)
    enc = encode_events(spark, sf_dir)
    events = load_tables(spark, sf_dir)["events"]
    wrapped = enc.join(events.select("event_id", "value"), "event_id").select(
        "event_id",
        "value",
        opt.construct_when(
            [
                (F.col("value") > 50.0, "Some", {"value": F.col("e")}),
                (F.lit(True), "None_", {}),
            ]
        ).alias("opt"),
    )
    shape = opt.match(
        F.col("opt"),
        {
            "None_": lambda _: F.lit("none"),
            "Some": lambda p: F.when(
                EVENT_ADT.is_variant(p.getField("value"), "Purchase"),
                "some-purchase",
            ).otherwise("some-other"),
        },
    )
    inner_purchase_value = opt.match(
        F.col("opt"),
        {
            "None_": lambda _: F.lit(0.0),
            "Some": lambda p: F.coalesce(
                EVENT_ADT.bind(p.getField("value"), "Purchase", "amount"), F.lit(0.0)
            ),
        },
    )
    return wrapped.groupBy(shape.alias("shape")).agg(
        F.count(F.lit(1)).alias("n"),
        pround(F.sum(inner_purchase_value)).alias("some_purchase_value"),
    )


@register(
    "adt_dialect_nested",
    oracle="""
    SELECT event_id,
           CAST(user_id AS BIGINT) AS uid,
           floor(CAST(value AS DOUBLE) * 10000 + 0.5) / 10000 AS amount
    FROM events
    WHERE user_id % 3 <> 0
      AND event_type = 'purchase'
      AND value > 200.0
    """,
)
def adt_dialect_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested sum types through the STATEMENT surface (round 3):
    ``Entry = Tracked(k: Kind, uid: Integer) | Dropped`` wraps
    ``Kind = Purchase(amt) | Fault(code) | Engage(t)``; the query
    pattern ``en: Tracked(Purchase(amt), uid)`` compiles to a
    conjunction of OUTER and INNER tag tests with bindings on the
    nested payload accesses — the composed-ADT twin of
    ``adt_dialect_match``. The oracle states identical semantics on
    the raw events table, so the nested encoding AND the recursive
    rewrite are value-hash-checked, not just pytest-pinned.
    """
    from algebraicdb_spark.engine import Engine

    eng = Engine(spark)
    kind = eng.sql(
        "CREATE TYPE Kind = Purchase(amt: Double) | Fault(code: Integer)"
        " | Engage(t: Text)"
    )
    entry = eng.sql(
        "CREATE TYPE Entry = Tracked(k: Kind, uid: Integer) | Dropped"
    )
    ev = load_tables(spark, sf_dir)["events"]
    code = F.get_json_object("props", "$.k").cast("int")
    k = kind.construct_when(
        [
            (F.col("event_type") == "purchase", "Purchase", {"amt": F.col("value")}),
            (F.col("event_type") == "error", "Fault", {"code": code}),
            (F.lit(True), "Engage", {"t": F.col("event_type")}),
        ]
    )
    en = entry.construct_when(
        [
            (F.col("user_id") % 3 != 0, "Tracked",
             {"k": k, "uid": F.col("user_id")}),
            (F.lit(True), "Dropped", {}),
        ]
    )
    eng.create_table(
        "nested_events",
        ev.select("event_id", en.alias("en")),
        adt_columns={"en": entry},
    )
    return eng.sql(
        "SELECT event_id, uid, floor(CAST(amt AS DOUBLE) * 10000 + 0.5) / 10000"
        " AS amount FROM nested_events"
        " WHERE en: Tracked(Purchase(amt), uid) AND amt > 200.0"
    )
