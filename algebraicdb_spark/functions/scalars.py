"""§2.7 scalar function surface (string / date / math / array / map /
JSON / struct).

All JVM-side built-ins (``pyspark.sql.functions``) — zero Python UDFs,
so every key stays inside WholeStageCodegen. Arrays are emitted as
joined strings where the oracle compares values (representation-
independent hashing, SURVEY §5.3).

Engine-parity traps handled here:
  - day-of-week numbering differs (Spark 1=Sun..7 vs DuckDB dow 0=Sun)
    → both sides normalized to Monday=0.
  - double→int casts differ (Spark truncates, DuckDB rounds) → FLOOR
    first, then cast.
  - float arrays: cast to DOUBLE before arithmetic on BOTH sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from algebraicdb_spark.functions.rounding import exact_money_sum, pround
from algebraicdb_spark.plans.registry import register
from algebraicdb_spark.sources.catalog import load_tables


@register(
    "str_basics",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_up,
           lower(c_mktsegment) AS seg_lo,
           trim(concat('  ', c_name, '  ')) AS name_trim,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
           substring(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len
    FROM customer
    WHERE c_custkey % 40 = 0
    """,
)
def str_basics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat / upper / lower / trim / lpad / substring / length."""
    c = load_tables(spark, sf_dir)["customer"]
    return c.filter(F.col("c_custkey") % 40 == 0).select(
        "c_custkey",
        F.upper("c_name").alias("name_up"),
        F.lower("c_mktsegment").alias("seg_lo"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("name_trim"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
    )


@register(
    "str_split_regexp",
    oracle="""
    SELECT p_partkey,
           CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS BIGINT) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_masked,
           len(string_split(p_name, ' ')) AS n_tokens
    FROM part
    WHERE p_partkey % 40 = 0
    """,
)
def str_split_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split / regexp_extract / regexp_replace (note: Spark replaces
    globally by default; DuckDB needs the 'g' flag)."""
    p = load_tables(spark, sf_dir)["part"]
    return p.filter(F.col("p_partkey") % 40 == 0).select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("bigint").alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_masked"),
        F.size(F.split("p_name", " ")).alias("n_tokens"),
    )


@register(
    "str_distance",
    oracle="""
    SELECT DISTINCT p_brand,
           levenshtein(p_brand, 'Brand#10') AS dist_to_b10,
           levenshtein(lower(p_brand), 'brand') AS dist_to_brand
    FROM part
    """,
)
def str_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit distance (near-match fixture for text dedup)."""
    p = load_tables(spark, sf_dir)["part"]
    return p.select(
        "p_brand",
        F.levenshtein(F.col("p_brand"), F.lit("Brand#10")).alias("dist_to_b10"),
        F.levenshtein(F.lower("p_brand"), F.lit("brand")).alias("dist_to_brand"),
    ).distinct()


@register(
    "date_parts_trunc",
    oracle="""
    SELECT EXTRACT(year FROM o_orderdate) AS yr,
           EXTRACT(month FROM o_orderdate) AS mth,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders
    WHERE EXTRACT(isodow FROM o_orderdate) - 1 <= 4  -- weekdays (Mon=0)
    GROUP BY 1, 2
    """,
)
def date_parts_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month extraction + weekday filter, revenue by month.

    Day-of-week normalized to Monday=0 on both engines (Spark
    ``dayofweek`` is 1=Sunday; DuckDB ``isodow`` is 1=Monday).
    """
    o = load_tables(spark, sf_dir)["orders"]
    weekday_mon0 = (F.dayofweek("o_orderdate") + 5) % 7
    return (
        o.filter(weekday_mon0 <= 4)
        .groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mth")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_money_sum("o_totalprice").alias("revenue"),
        )
    )


@register(
    "date_arith_interval",
    oracle="""
    SELECT o_orderstatus,
           floor(CAST(AVG(date_diff('day', o_orderdate, l_shipdate)) AS DOUBLE) * 10000 + 0.5) / 10000 AS avg_latency_days,
           MAX(date_diff('day', o_orderdate, l_shipdate)) AS max_latency_days,
           CAST(SUM(CASE WHEN l_shipdate >= o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_slow
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def date_arith_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """datediff + date ± INTERVAL: order→ship latency stats."""
    t = load_tables(spark, sf_dir)
    j = t["lineitem"].join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
    latency = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    return j.groupBy("o_orderstatus").agg(
        pround(F.avg(latency)).alias("avg_latency_days"),
        F.max(latency).alias("max_latency_days"),
        F.sum(
            F.when(
                F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                1,
            ).otherwise(0)
        ).alias("n_slow"),
    )


@register(
    "math_suite",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(CAST(abs(l_extendedprice - 50000.0) AS DOUBLE) * 10000 + 0.5) / 10000 AS abs_dev,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           floor(CAST(sqrt(l_extendedprice) AS DOUBLE) * 10000 + 0.5) / 10000 AS price_sqrt,
           floor(CAST(ln(l_extendedprice) AS DOUBLE) * 10000 + 0.5) / 10000 AS price_ln,
           floor(CAST(pow(1.0 + l_discount, 2) AS DOUBLE) * 10000 + 0.5) / 10000 AS disc_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
           CAST(sign(l_extendedprice - 50000.0) AS DOUBLE) AS dev_sign
    FROM lineitem
    WHERE l_orderkey % 997 = 0
    """,
)
def math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs / floor / ceil / sqrt / ln / pow / mod / sign."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.filter(F.col("l_orderkey") % 997 == 0).select(
        "l_orderkey",
        "l_linenumber",
        pround(F.abs(F.col("l_extendedprice") - 50000.0)).alias("abs_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil("l_quantity").alias("qty_ceil"),
        pround(F.sqrt("l_extendedprice")).alias("price_sqrt"),
        pround(F.log("l_extendedprice")).alias("price_ln"),
        pround(F.pow(F.lit(1.0) + F.col("l_discount"), 2)).alias("disc_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.signum(F.col("l_extendedprice") - 50000.0).alias("dev_sign"),
    )


@register(
    "cond_coalesce",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(CAST(COALESCE(l_extendedprice / NULLIF(l_discount, 0.0), -1.0) AS DOUBLE) * 10000 + 0.5) / 10000
             AS price_per_disc,
           floor(CAST(GREATEST(l_extendedprice, 60000.0) AS DOUBLE) * 10000 + 0.5) / 10000 AS floor_60k,
           floor(CAST(LEAST(l_tax, l_discount) AS DOUBLE) * 10000 + 0.5) / 10000 AS min_rate
    FROM lineitem
    WHERE l_orderkey % 499 = 0
    """,
)
def cond_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif (guarded division) / greatest / least."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.filter(F.col("l_orderkey") % 499 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.coalesce(
                F.col("l_extendedprice") / F.nullif(F.col("l_discount"), F.lit(0.0)),
                F.lit(-1.0),
            ),
            4,
        ).alias("price_per_disc"),
        pround(F.greatest(F.col("l_extendedprice"), F.lit(60000.0))).alias(
            "floor_60k"
        ),
        pround(F.least(F.col("l_tax"), F.col("l_discount"))).alias("min_rate"),
    )


@register(
    "cast_types",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST('42' AS BIGINT) + o_orderkey AS key_plus42,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_int,
           CAST(o_totalprice AS DOUBLE) / 2 AS half_price_raw,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str
    FROM orders
    WHERE o_orderkey % 400 = 0
    """,
)
def cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CAST matrix (numeric↔string↔date).

    double→int is FLOOR-then-cast: bare CAST truncates in Spark but
    rounds in DuckDB. half_price_raw stays unrounded deliberately —
    a pure binary-exact division (÷2) — to exercise double transport.
    """
    o = load_tables(spark, sf_dir)["orders"]
    return o.filter(F.col("o_orderkey") % 400 == 0).select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        (F.lit("42").cast("bigint") + F.col("o_orderkey")).alias("key_plus42"),
        F.floor("o_totalprice").cast("bigint").alias("price_int"),
        (F.col("o_totalprice").cast("double") / 2).alias("half_price_raw"),
        F.to_date("o_orderdate").cast("string").alias("date_str"),
    )


@register(
    "array_ops",
    oracle="""
    SELECT p_partkey,
           len(string_split(p_name, ' ')) AS n_tokens,
           list_contains(string_split(p_name, ' '), 'of') AS has_of,
           array_to_string(list_sort(string_split(p_name, ' ')), '|') AS tokens_sorted,
           array_to_string(list_slice(string_split(p_name, ' '), 1, 2), '|') AS first_two,
           len(list_distinct(string_split(p_name, ' '))) AS n_distinct_tokens,
           len(flatten([string_split(p_name, ' '), string_split(p_brand, '#')]))
             AS n_flat
    FROM part
    WHERE p_partkey % 40 = 0
    """,
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array size/contains/sort/slice/distinct/flatten over token arrays."""
    p = load_tables(spark, sf_dir)["part"]
    toks = F.split("p_name", " ")
    return p.filter(F.col("p_partkey") % 40 == 0).select(
        "p_partkey",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "of").alias("has_of"),
        F.array_join(F.sort_array(toks), "|").alias("tokens_sorted"),
        F.array_join(F.slice(toks, 1, 2), "|").alias("first_two"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.size(F.flatten(F.array(toks, F.split("p_brand", "#")))).alias("n_flat"),
    )


@register(
    "array_explode",
    oracle="""
    SELECT doc_id, pos, token
    FROM (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS pos,
             unnest(string_split(text, ' ')) AS token
      FROM documents
      WHERE doc_id % 100 = 0
    )
    WHERE token LIKE 'd%'
    """,
)
def array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (UDTF shape): token stream with 1-based positions."""
    d = load_tables(spark, sf_dir)["documents"]
    return (
        d.filter(F.col("doc_id") % 100 == 0)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "token"))
        .filter(F.col("token").like("d%"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")
    )


@register(
    "array_lambda",
    oracle="""
    SELECT vec_id,
           floor(CAST(list_dot_product(embedding, embedding) AS DOUBLE) * 10000 + 0.5) / 10000 AS dot_self,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           floor(CAST(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.0)) AS DOUBLE) * 10000 + 0.5) / 10000
             AS sum_doubled
    FROM embeddings
    WHERE vec_id % 10 = 0
    """,
)
def array_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array fns: transform / filter / aggregate / zip_with.

    Elements cast to DOUBLE before arithmetic on both sides (float
    accumulation order would otherwise break 4-dp parity).
    """
    e = load_tables(spark, sf_dir)["embeddings"]
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot_self = F.aggregate(
        F.zip_with(emb, emb, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    sum_doubled = F.aggregate(
        F.transform(emb, lambda x: x * 2.0), F.lit(0.0), lambda acc, x: acc + x
    )
    return e.filter(F.col("vec_id") % 10 == 0).select(
        "vec_id",
        pround(dot_self).alias("dot_self"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_pos"),
        pround(sum_doubled).alias("sum_doubled"),
    )


@register(
    "map_ops",
    oracle="""
    SELECT user_id,
           COUNT(DISTINCT event_type) AS n_keys,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
    FROM events
    GROUP BY user_id
    """,
)
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + lookup: per-user event_type→count map,
    queried with map_keys/element_at (oracle states the equivalent
    relational form — the *values* must match, not the plumbing)."""
    e = load_tables(spark, sf_dir)["events"]
    per_type = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    as_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("event_type"), F.col("cnt")))
        ).alias("m")
    )
    return as_map.select(
        "user_id",
        F.size(F.map_keys(F.col("m"))).alias("n_keys"),
        F.coalesce(F.element_at(F.col("m"), "click"), F.lit(0)).alias("n_click"),
        F.coalesce(F.element_at(F.col("m"), "purchase"), F.lit(0)).alias("n_purchase"),
    )


@register(
    "json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n_events,
           floor(CAST(SUM(value) AS DOUBLE) * 10000 + 0.5) / 10000 AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON field extraction from the events.props payload."""
    e = load_tables(spark, sf_dir)["events"]
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pround(F.sum("value")).alias("sum_value"),
        )
    )


@register(
    "struct_ops",
    oracle="""
    SELECT (info).seg AS segment,
           COUNT(*) AS n_customers,
           floor(CAST(SUM((info).bal) AS DOUBLE) * 10000 + 0.5) / 10000 AS sum_bal
    FROM (
      SELECT struct_pack(seg := c_mktsegment, bal := c_acctbal) AS info
      FROM customer
    )
    GROUP BY 1
    """,
)
def struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """named_struct construction + dot access (the ADT payload
    primitive — see functions/adt.py for the full encoding)."""
    c = load_tables(spark, sf_dir)["customer"]
    with_struct = c.select(
        F.struct(
            F.col("c_mktsegment").alias("seg"), F.col("c_acctbal").alias("bal")
        ).alias("info")
    )
    return with_struct.groupBy(F.col("info.seg").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        pround(F.sum("info.bal")).alias("sum_bal"),
    )


@register(
    "json_from_schema",
    # schema-declared JSON parsing (from_json → typed struct) vs the
    # per-path extraction of `json_extract`
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
             AS k_sum,
           MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS k_min,
           MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS k_max
    FROM events
    GROUP BY event_type
    """,
)
def json_from_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON ingestion: from_json with a declared schema gives a
    real struct column (codegen field access, no per-path re-parse —
    the scale-correct way to read a JSON payload more than once)."""
    e = load_tables(spark, sf_dir)["events"]
    parsed = e.select(
        "event_type",
        F.from_json("props", "k int").alias("p"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("p.k")).alias("k_sum"),
        F.min(F.col("p.k")).alias("k_min"),
        F.max(F.col("p.k")).alias("k_max"),
    )


@register(
    "json_variant_extract",
    # Spark 4 VARIANT path: parse_json → binary variant → typed
    # variant_get extraction. Semi-structured columns stored as
    # VARIANT (not string) decode once at ingest and push typed,
    # shredded accesses into the scan — the lakehouse replacement for
    # per-query JSON string parsing. Values here are exact integers;
    # DuckDB replays the same accesses over its JSON type.
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 AS k_mod,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(COUNT(*) FILTER (
             WHERE json_extract_string(props, '$.missing') IS NULL) AS BIGINT)
             AS n_missing_null
    FROM events
    GROUP BY 1
    """,
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    ``parse_json`` once, then typed ``variant_get`` path extraction —
    including the try-semantics NULL for a missing path (counted to
    pin the behavior). The open-format twin of ``json_extract``
    (string functions) and ``json_from_schema`` (static struct): a
    VARIANT column keeps the full value queryable when the schema is
    NOT declared up front.

    Scale shape: parse_json is a map-side expression; the variant
    binary encodes fields positionally, so repeated ``variant_get``
    calls don't re-parse text. One 5-group hash aggregate.
    """
    e = load_tables(spark, sf_dir)["events"]
    v = e.select(F.parse_json(F.col("props")).alias("v"))
    k = F.variant_get("v", "$.k", "bigint")
    missing = F.variant_get("v", "$.missing", "bigint")
    return v.groupBy((k % 5).alias("k_mod")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(k).cast("long").alias("sum_k"),
        F.count_if(missing.isNull()).cast("long").alias("n_missing_null"),
    )


@register(
    "array_posexplode",
    # UNNEST WITH ORDINALITY: position-preserving explode, plus the
    # outer variant keeping empty-array rows as a NULL row.
    oracle="""
    WITH src AS (
      SELECT n_nationkey,
             CASE WHEN n_nationkey % 5 = 0
                  THEN CAST([] AS VARCHAR[])
                  ELSE string_split(n_name, 'A') END AS parts
      FROM nation
    ), packed AS (
      SELECT n_nationkey,
             CASE WHEN len(parts) = 0
                  THEN [{'pos': CAST(NULL AS INT),
                         'part': CAST(NULL AS VARCHAR)}]
                  ELSE list_transform(parts,
                         (x, i) -> {'pos': CAST(i - 1 AS INT), 'part': x})
             END AS entries
      FROM src
    )
    SELECT n_nationkey, u.pos AS pos, u.part AS part
    FROM (SELECT n_nationkey, unnest(entries) AS u FROM packed)
    """,
)
def array_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode_outer: position-preserving array explode that KEEPS
    rows whose array is empty (pos/part NULL) — the WITH ORDINALITY +
    outer-join semantics every flattening pipeline needs when empty
    collections must not drop the parent row."""
    n = load_tables(spark, sf_dir)["nation"]
    src = n.select(
        "n_nationkey",
        F.when(
            F.col("n_nationkey") % 5 == 0, F.array().cast("array<string>")
        )
        .otherwise(F.split("n_name", "A"))
        .alias("parts"),
    )
    return src.select(
        "n_nationkey", F.posexplode_outer("parts").alias("pos", "part")
    )
