"""Warehouse maintenance operators: SCD type-2 builds, CDC log
application, and deterministic sampling.

These are the table-maintenance patterns every lakehouse pipeline
runs between ingestion and analytics (reference surface: the
reconstructed engine exposed INSERT/UPDATE-style mutation only;
SURVEY §2.12 extends it with the declarative batch equivalents a
Spark shop actually ships — cf. Delta/Iceberg MERGE-based SCD2 and
CDF apply):

  - ``scd2_history``: collapse a change-event stream into type-2
    dimension rows (valid_from / valid_to / version / is_current) —
    the gaps-and-islands formulation: one window pass, one shuffle
    on the dimension key.
  - ``cdc_apply_log``: fold an ordered changelog (upsert / update /
    delete ops) into final table state with last-writer-wins
    semantics — one window pass, rn = 1, no iteration.
  - ``sample_reservoir``: uniform k-sample WITHOUT replacement as a
    total order over a cryptographic row hash. Distributed shape is
    Spark's TakeOrderedAndProject: per-partition top-k partials
    merged on the driver — the same communication pattern as a
    distributed reservoir, but deterministic and engine-portable.

Scale notes:
  - Both SCD2 and CDC are single-window-pass plans partitioned by
    the natural key; at 100 TB the shuffle is one exchange on
    user_id and every user's history fits a partition (skew on a
    power-law user would be handled by AQE skew split — the window
    itself is per-key sequential by semantics).
  - The hash sample never materializes more than k rows per
    partition (TakeOrderedAndProject keeps a bounded heap), so
    k = 200 costs O(k) memory per partition regardless of input
    size — this IS the reservoir algorithm, expressed declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from algebraicdb_spark.functions.rounding import pround, pround_sql
from algebraicdb_spark.plans.registry import register
from algebraicdb_spark.sources.catalog import load_tables, spread


@register(
    "scd2_history",
    # The events stream is read as a change feed of each user's
    # "segment" attribute (event_type). Consecutive duplicates
    # collapse; each retained change opens a version interval.
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type AS segment,
             epoch_us(ts) AS ts_us,
             lag(event_type) OVER w AS prev_segment
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
    ), changes AS (
      SELECT user_id, segment, ts_us
      FROM ordered
      WHERE prev_segment IS NULL OR segment <> prev_segment
    )
    SELECT user_id, segment,
           CAST(row_number() OVER w AS BIGINT) AS version,
           ts_us AS valid_from_us,
           lead(ts_us) OVER w AS valid_to_us,
           CAST(CASE WHEN lead(ts_us) OVER w IS NULL
                THEN 1 ELSE 0 END AS INT) AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
    """,
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from a change stream.

    Gaps-and-islands: a lag() change detector keeps only rows where
    the tracked attribute actually changed, then lead() closes each
    version's validity interval. is_current marks the open row.

    Scale shape: both windows partition on user_id, so Catalyst
    plans ONE exchange (hash on user_id) feeding two sorts; the
    second window reuses the first's partitioning. Per-key history
    is processed sequentially inside a partition — the only shape
    SCD2 semantics permit — and the change filter runs BEFORE the
    second window, so version numbering sees only the collapsed
    rows, not the raw feed.
    """
    e = load_tables(spark, sf_dir)["events"]
    w_raw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select(
            "user_id",
            F.col("event_type").alias("segment"),
            F.unix_micros("ts").alias("ts_us"),
            F.lag("event_type").over(w_raw).alias("prev_segment"),
        )
        .where(
            F.col("prev_segment").isNull()
            | (F.col("segment") != F.col("prev_segment"))
        )
        .drop("prev_segment")
    )
    w_ver = Window.partitionBy("user_id").orderBy("ts_us")
    return changes.select(
        "user_id",
        "segment",
        F.row_number().over(w_ver).cast("bigint").alias("version"),
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w_ver).alias("valid_to_us"),
        F.when(F.lead("ts_us").over(w_ver).isNull(), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_current"),
    )


@register(
    "cdc_apply_log",
    # op mapping over the fixture stream: signup => upsert (I),
    # error => delete (D), anything else => update (U). KV
    # last-writer-wins: an update after a delete re-inserts (upsert
    # semantics, as Delta CDF / Kafka compacted topics behave).
    oracle=f"""
    WITH log AS (
      SELECT user_id,
             CASE event_type WHEN 'signup' THEN 'I'
                             WHEN 'error'  THEN 'D'
                             ELSE 'U' END AS op,
             value, epoch_us(ts) AS ts_us,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_ns(ts) DESC, event_id DESC)
               AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_ops,
             CAST(SUM(CASE event_type WHEN 'error' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id) AS BIGINT) AS n_deletes
      FROM events
    )
    SELECT user_id, op AS last_op,
           {pround_sql("value")} AS final_value,
           ts_us AS last_ts_us, n_ops, n_deletes
    FROM log
    WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_apply_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold an ordered CDC changelog into final table state.

    Last-writer-wins per key: the newest op decides liveness (a
    trailing delete kills the key; any other trailing op leaves it
    alive with that op's value). Equivalent to replaying the log
    sequentially, computed in one declarative pass — the standard
    "compact a changelog" shape (Kafka log compaction, Delta CDF
    MERGE).

    Scale shape: one exchange on user_id serves BOTH the rn window
    and the per-key op counters (same partition spec, zero extra
    shuffle), then a map-side rn = 1 filter. No driver loop, no
    iteration: folding n ops per key is O(n) inside the partition.
    """
    e = load_tables(spark, sf_dir)["events"]
    op = (
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
    )
    w_desc = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    w_all = Window.partitionBy("user_id")
    log = e.select(
        "user_id",
        op.alias("op"),
        "value",
        F.unix_micros("ts").alias("ts_us"),
        F.row_number().over(w_desc).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n_ops"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .over(w_all)
        .cast("bigint")
        .alias("n_deletes"),
    )
    return log.where((F.col("rn") == 1) & (F.col("op") != "D")).select(
        "user_id",
        F.col("op").alias("last_op"),
        pround("value").alias("final_value"),
        F.col("ts_us").alias("last_ts_us"),
        "n_ops",
        "n_deletes",
    )


SAMPLE_K = 200

# (l_orderkey, l_linenumber) is NOT unique in the fixture (11.7k dup
# pairs at sf0.01) — hashing a non-unique key would tie at the LIMIT
# boundary and let each engine cut ties arbitrarily. Full rows ARE
# unique, so the rank hash covers every column, with doubles lifted
# onto exact integer grids (cents / percent) so the hash input string
# never depends on either engine's float-to-string formatting.
_ROW_KEY_SQL = """md5(
      CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_partkey AS VARCHAR)
      || '-' || CAST(l_suppkey AS VARCHAR)
      || '-' || CAST(l_linenumber AS VARCHAR)
      || '-' || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
      || '-' || CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                     AS VARCHAR)
      || '-' || CAST(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
                     AS VARCHAR)
      || '-' || CAST(CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS VARCHAR)
      || '-' || l_returnflag || '-' || l_linestatus
      || '-' || strftime(l_shipdate, '%Y-%m-%d'))"""


@register(
    "sample_reservoir",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {pround_sql("l_extendedprice * (1 - l_discount)")} AS revenue,
           {_ROW_KEY_SQL} AS rank_hash
    FROM lineitem
    ORDER BY rank_hash
    LIMIT {SAMPLE_K}
    """,
)
def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform k-sample without replacement, deterministic across
    engines: rank every row by md5(primary key) and keep the k
    smallest. A cryptographic hash of a unique key is uniform on
    [0, 2^128), so this is exact uniform sampling — reproducible on
    any engine, any partitioning, any run.

    Scale shape: Spark compiles orderBy().limit(k) to
    TakeOrderedAndProject — each partition keeps a k-row bounded
    heap, the driver merges P heaps. That is O(k) memory per
    partition and O(P·k) at the driver regardless of table size:
    the distributed-reservoir communication pattern, without RNG
    state. The hash is computed map-side; no full sort, no shuffle
    of the table.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    # spread: the full-row md5 otherwise runs inside the 1-task
    # fixture scan (guide §2.5; cluster no-op) — 1.4 -> 1.26 s sf0.1
    src = spread(li)
    ranked = src.select(
        "l_orderkey",
        "l_linenumber",
        pround(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("revenue"),
        F.md5(row_hash_input(src)).alias("rank_hash"),
    )
    return ranked.orderBy("rank_hash").limit(SAMPLE_K)


def row_hash_input(li: DataFrame):
    """The full-row key string (Spark twin of _ROW_KEY_SQL): every
    column, doubles on exact integer grids so no float formatting
    ever reaches the hash."""
    cents = lambda c: F.floor(F.col(c) * 100 + 0.5).cast("bigint").cast("string")  # noqa: E731
    return F.concat_ws(
        "-",
        F.col("l_orderkey").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_quantity").cast("bigint").cast("string"),
        cents("l_extendedprice"),
        cents("l_discount"),
        cents("l_tax"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        F.date_format("l_shipdate", "yyyy-MM-dd"),
    )


PIT_LOOKBACK_US = 7 * 24 * 3600 * 1_000_000


@register(
    "feature_pit_join",
    # Every feature frame ends at "1 PRECEDING" — strictly before the
    # label instant. THE feature-store correctness property (no
    # training-serving leakage): a feature computed AT the label
    # timestamp would see the label itself.
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type, value,
             epoch_us(ts) AS t_us
      FROM events
    ), feat AS (
      SELECT user_id, event_id, event_type, t_us,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY t_us
                        RANGE BETWEEN {PIT_LOOKBACK_US} PRECEDING
                        AND 1 PRECEDING) AS BIGINT) AS f_clicks_7d,
             last_value(CASE WHEN event_type = 'view' THEN value END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS f_last_view_val,
             MIN(CASE WHEN event_type = 'signup' THEN t_us END)
               OVER (PARTITION BY user_id ORDER BY t_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS first_signup_us
      FROM ev
    )
    SELECT event_id AS label_id, user_id, t_us AS label_t_us,
           COALESCE(f_clicks_7d, 0) AS f_clicks_7d,
           floor(CAST(f_last_view_val AS DOUBLE) * 10000 + 0.5) / 10000
             AS f_last_view_val,
           (t_us - first_signup_us) // 86400000000 AS f_signup_age_days
    FROM feat
    WHERE event_type = 'purchase'
    """,
)
def feature_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) feature join for a training set: each
    purchase label row gets three features computed from the user's
    history STRICTLY BEFORE the label instant — a 7-day click count
    (range frame), the latest prior view's value (last-value as-of),
    and account age since first signup. The feature-store "PIT
    correctness" pattern (Feast/Tecton's core join) expressed as one
    window pass.

    Scale shape: no join at all — the spine and every feature view
    live on the same event stream, so ONE user_id exchange + one sort
    serves all three frames, then a map-side filter keeps label rows.
    With features in separate tables this becomes the union-window
    as-of device join_asof already demonstrates; either way nothing
    fans out and nothing leaks. All frames end at 1 PRECEDING:
    pytest pins that a feature computed AT the label time would
    differ (the leakage probe).
    """
    from pyspark.sql.window import Window

    e = load_tables(spark, sf_dir)["events"]
    ev = e.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("t_us"),
    )
    w_range = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rangeBetween(-PIT_LOOKBACK_US, -1)
    )
    w_rows = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    feat = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "t_us",
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .over(w_range)
        .cast("bigint")
        .alias("f_clicks_7d"),
        F.last(
            F.when(F.col("event_type") == "view", F.col("value")), True
        )
        .over(w_rows)
        .alias("f_last_view_val"),
        F.min(F.when(F.col("event_type") == "signup", F.col("t_us")))
        .over(w_rows)
        .alias("first_signup_us"),
    )
    return feat.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("label_id"),
        "user_id",
        F.col("t_us").alias("label_t_us"),
        F.coalesce("f_clicks_7d", F.lit(0)).alias("f_clicks_7d"),
        pround("f_last_view_val").alias("f_last_view_val"),
        F.expr("(t_us - first_signup_us) DIV 86400000000").alias(
            "f_signup_age_days"
        ),
    )


@register(
    "join_temporal_scd2",
    # temporal (valid-time) join: each purchase event looks up the
    # SCD2 dimension row whose validity interval CONTAINS the event
    # instant — the query pattern SCD2 exists to serve ("what was the
    # customer's segment when they bought?"). The dimension is the
    # scd2_history build inlined; the open row matches everything
    # from its valid_from onward.
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type AS segment,
             epoch_us(ts) AS ts_us,
             lag(event_type) OVER w AS prev_segment
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
    ), changes AS (
      SELECT user_id, segment, ts_us FROM ordered
      WHERE prev_segment IS NULL OR segment <> prev_segment
    ), dim AS (
      SELECT user_id, segment,
             CAST(row_number() OVER w AS BIGINT) AS version,
             ts_us AS valid_from_us,
             lead(ts_us) OVER w AS valid_to_us
      FROM changes
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
    ), facts AS (
      SELECT event_id, user_id, epoch_us(ts) AS t_us,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), joined AS (
      SELECT f.event_id, d.segment, d.version, f.cents
      FROM facts f JOIN dim d
        ON d.user_id = f.user_id
       AND d.valid_from_us <= f.t_us
       AND (d.valid_to_us IS NULL OR f.t_us < d.valid_to_us)
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS cents_total,
           CAST(SUM(version) AS BIGINT) AS version_checksum
    FROM joined GROUP BY segment
    """,
)
def join_temporal_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid-time temporal join: purchase facts joined to the SCD2
    dimension row in force AT the purchase instant (valid_from <= t <
    valid_to, open row unbounded), rolled up by the segment that was
    TRUE AT THE TIME. The composition that justifies scd2_history:
    without it, analytics silently use each user's CURRENT segment
    and rewrite history.

    Invariant (pytest): every purchase matches EXACTLY one dimension
    row — the intervals partition each user's timeline by
    construction, so the join is 1:1 and count-preserving.

    Scale shape: the dimension build and the fact join both key on
    user_id — one exchange covers the windows AND the interval join
    (per-user nested loop over that user's few versions). At
    warehouse scale with a materialized SCD2 table this is the same
    plan minus the build; version-interval bucketing (join the month
    of t first) is the standard prune when histories get long.
    """
    dim = scd2_history(spark, sf_dir).select(
        F.col("user_id").alias("d_user"),
        "segment",
        "version",
        "valid_from_us",
        "valid_to_us",
    )
    e = load_tables(spark, sf_dir)["events"]
    facts = e.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    joined = facts.join(
        dim,
        (F.col("d_user") == F.col("user_id"))
        & (F.col("valid_from_us") <= F.col("t_us"))
        & (
            F.col("valid_to_us").isNull()
            | (F.col("t_us") < F.col("valid_to_us"))
        ),
    )
    return joined.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.sum("cents").cast("bigint").alias("cents_total"),
        F.sum("version").cast("bigint").alias("version_checksum"),
    )


DUPBILL_WINDOW_DAYS = 7


@register(
    "orders_duplicate_billing",
    # Duplicate-invoice detection: order pairs of the SAME customer
    # with the SAME exact cents total within 7 days — the billing-QA
    # staple. Blocked equi-join on (custkey, cents): candidate pairs
    # exist only inside exact-amount blocks, never all-pairs.
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey, o_custkey, o_orderdate,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ), pairs AS (
      SELECT a.o_custkey, a.cents,
             a.o_orderkey AS key_a, b.o_orderkey AS key_b,
             abs(date_diff('day', a.o_orderdate, b.o_orderdate)) AS gap_days
      FROM o a JOIN o b
        ON b.o_custkey = a.o_custkey AND b.cents = a.cents
       AND a.o_orderkey < b.o_orderkey
      WHERE abs(date_diff('day', a.o_orderdate, b.o_orderdate))
              <= {DUPBILL_WINDOW_DAYS}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(SUM(key_a + key_b) AS BIGINT) AS pair_checksum,
           CAST(MIN(gap_days) AS BIGINT) AS min_gap_days,
           CAST(MAX(gap_days) AS BIGINT) AS max_gap_days,
           CAST(SUM(cents) AS BIGINT) AS cents_at_risk
    FROM pairs
    """,
)
def orders_duplicate_billing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-invoice detection: same customer, same exact amount,
    within 7 days — the classic billing/payments QA sweep (double
    submits, retried jobs, copy-paste invoices). A dedup problem on
    TRANSACTIONS, where near-match on (who, how much, when) is the
    signal and exact text hashing (dedup_exact) sees nothing.

    Scale discipline: candidates come from an equi-join on the
    (custkey, exact-cents) BLOCK — amount equality is the blocking
    key, so pair fan-out is bounded by per-block order counts (tiny:
    few orders share one exact cent amount per customer), never
    |orders|². The 7-day band then filters inside blocks. The same
    blocked-join shape as dedup_blocked_levenshtein, applied to the
    warehouse. Exact cents, integer day gaps, bigint checksums.
    """
    o = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    a = o.select(
        F.col("o_custkey"),
        F.col("cents"),
        F.col("o_orderkey").alias("key_a"),
        F.col("o_orderdate").alias("date_a"),
    )
    b = o.select(
        F.col("o_custkey"),
        F.col("cents"),
        F.col("o_orderkey").alias("key_b"),
        F.col("o_orderdate").alias("date_b"),
    )
    pairs = (
        a.join(b, ["o_custkey", "cents"])
        .where(F.col("key_a") < F.col("key_b"))
        .select(
            "o_custkey",
            "cents",
            "key_a",
            "key_b",
            F.abs(F.datediff("date_a", "date_b")).alias("gap_days"),
        )
        .where(F.col("gap_days") <= DUPBILL_WINDOW_DAYS)
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
        F.sum(F.col("key_a") + F.col("key_b")).cast("bigint").alias("pair_checksum"),
        F.min("gap_days").cast("bigint").alias("min_gap_days"),
        F.max("gap_days").cast("bigint").alias("max_gap_days"),
        F.sum("cents").cast("bigint").alias("cents_at_risk"),
    )


@register(
    "data_contract_audit",
    # Declarative data-contract checks over the star schema, one row
    # per rule: null/range invariants map-side, referential integrity
    # via anti-join counts (orphaned lineitems, orders without a
    # customer, customers pointing at unknown nations). The dbt-test /
    # Great-Expectations surface as ONE scan-bounded report.
    oracle="""
    SELECT 'lineitem_discount_range' AS rule,
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_discount < 0 OR l_discount > 0.1) AS BIGINT)
             AS n_violations,
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_checked
    UNION ALL
    SELECT 'lineitem_qty_positive',
           CAST((SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_orphaned',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'orders_unknown_customer',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'customer_unknown_nation',
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT)
    UNION ALL
    SELECT 'orders_totalprice_positive',
           CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
    """,
)
def data_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract audit — the dbt-test / Great-Expectations layer
    as one declarative report: range invariants (discount ∈ [0, 0.1],
    positive quantities and totals) and referential integrity
    (orphaned lineitems, orders without a customer, customers with an
    unknown nation), one row per rule with violation and checked
    counts. A fixture where every rule passes is the point: the audit
    proves the CONTRACT, and the first non-zero row after an ingest
    is the incident.

    Scale shape: range rules are conditional aggregates fused into
    each table's single scan; FK rules are left-anti joins on the key
    (broadcast for dims, shuffle for orders⋈lineitem — the same join
    the queries pay anyway). No window, no sort.
    """
    t = load_tables(spark, sf_dir)
    li, o, c, n = t["lineitem"], t["orders"], t["customer"], t["nation"]

    def rule(name: str, violations, checked) -> DataFrame:
        return violations.crossJoin(checked).select(
            F.lit(name).alias("rule"),
            F.col("v").cast("bigint").alias("n_violations"),
            F.col("n").cast("bigint").alias("n_checked"),
        )

    def viol(cond):
        # coalesce: SUM over zero rows is NULL, but the contract report
        # (and the oracle's COUNT(*)) must say 0 for an empty table —
        # the broken-ingest case this audit exists for
        return F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))

    # ONE scan per fact table for all its range rules + row count —
    # conditional aggregates fused, then the 1-row stats frame is
    # checkpointed so each rule row reads it, not the table
    li_stats = li.agg(
        F.count(F.lit(1)).alias("n"),
        viol((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).alias(
            "v_disc"
        ),
        viol(F.col("l_quantity") <= 0).alias("v_qty"),
    ).localCheckpoint(eager=False)
    o_stats = o.agg(
        F.count(F.lit(1)).alias("n"),
        viol(F.col("o_totalprice") <= 0).alias("v_total"),
    ).localCheckpoint(eager=False)
    li_n = li_stats.select("n")
    o_n = o_stats.select("n")
    c_n = c.agg(F.count(F.lit(1)).alias("n"))
    r1 = rule(
        "lineitem_discount_range", li_stats.select(F.col("v_disc").alias("v")), li_n
    )
    r2 = rule(
        "lineitem_qty_positive", li_stats.select(F.col("v_qty").alias("v")), li_n
    )
    r3 = rule(
        "lineitem_orphaned",
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("v")),
        li_n,
    )
    r4 = rule(
        "orders_unknown_customer",
        o.join(c.select("c_custkey"), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("v")),
        o_n,
    )
    r5 = rule(
        "customer_unknown_nation",
        c.join(
            F.broadcast(n.select("n_nationkey")),
            c.c_nationkey == n.n_nationkey,
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("v")),
        c_n,
    )
    r6 = rule(
        "orders_totalprice_positive",
        o_stats.select(F.col("v_total").alias("v")),
        o_n,
    )
    return r1.unionByName(r2).unionByName(r3).unionByName(r4).unionByName(
        r5
    ).unionByName(r6)
