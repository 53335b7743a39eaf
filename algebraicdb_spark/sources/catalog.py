"""Table registry: the single place every reader goes through.

Loads the ten fixture tables (FIXTURES.md) from a scale-factor
directory, normalizes timestamp ingestion quirks across fixture
generations, and registers temp views so both the DataFrame API and
``spark.sql`` see the same catalog.

Timestamp normalization (FIXTURES.md "regeneration" note): plain
``timestamp[us]`` parquet arrives as TIMESTAMP_NTZ → cast to UTC
TIMESTAMP; legacy TIMESTAMP(NANOS) parquet arrives (under
``spark.sql.legacy.parquet.nanosAsLong=true``) as bigint nanoseconds.
Either way ``events`` exposes

    ts      TIMESTAMP  -- truncated to microseconds (Spark's native
                          precision; matches DuckDB comparisons at
                          any >=us bucket)
    ts_ns   BIGINT     -- the raw nanoseconds, for exact arithmetic

Scale note: these are plain ``spark.read.parquet`` scans — predicate
pushdown / column pruning / partition pruning all apply untouched. At
cluster scale the same function points at a directory of many files;
nothing here assumes single-file inputs.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Confs that must hold on whatever session the driver hands us.
_RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
}

# Per-session cache: ((applicationId, id(spark)), sf_dir) -> {table:
# DataFrame}. Both components matter: applicationId alone would make
# two sessions sharing one SparkContext (spark.newSession()) hit the
# same entry, so the second session would never get its temp views
# registered; id(spark) alone could alias a new session allocated at a
# dead session's address, handing out DataFrames bound to a stopped
# SparkContext.
_CACHE: dict[tuple[tuple[str, int], str], dict[str, DataFrame]] = {}
#: which sf_dir each session's TEMP VIEWS currently point at — a cache
#: hit must re-register the views when an interleaved load at another
#: scale factor replaced them (returned DataFrames were always right;
#: SQL-by-name resolution silently read the other scale's data)
_ACTIVE: dict[tuple[str, int], str] = {}


def _session_key(spark: SparkSession) -> tuple[str, int]:
    try:
        return (spark.sparkContext.applicationId, id(spark))
    except Exception:
        return ("<stopped>", id(spark))  # context already stopped / mocked


def ensure_confs(spark: SparkSession) -> None:
    """Apply runtime-settable confs required by the fixtures."""
    for key, value in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except AnalysisException:
            # CANNOT_MODIFY_STATIC_CONFIG / CANNOT_MODIFY_CONFIG: the
            # conf is immutable on this session, so the builder must
            # have set it already. Anything else (stopped context,
            # protocol error) should surface, not be swallowed.
            pass
    # 200 reduce tasks is pure scheduling overhead at fixture scale;
    # only lower it when the session still has Spark's untouched
    # default, so a deliberately-tuned session (tests, bench, a
    # real cluster) is never overridden
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set("spark.sql.shuffle.partitions", "32")
    except AnalysisException:
        pass  # conf marked immutable on this session — leave it be


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Widen a narrow scan to the session's parallelism (optimization
    guide §2.5 "input skew: one huge unsplittable file ... repartition
    immediately after the read").

    The fixture tables are SINGLE-row-group parquet files, so a scan —
    and every map-side transform fused into its stage (tokenize,
    shingle md5s, partial aggregation) — runs as ONE task no matter
    how many cores the session has; measured 2.9 s of single-task
    signature hashing inside dedup_minhash_lsh at sf0.1/local[32].
    Repartitioning the (narrow, pre-explode) rows costs one small
    round-robin shuffle locally and buys cores× parallelism for the
    expensive work downstream.

    Scale-adaptive by construction: when the input already arrives in
    at least ``defaultParallelism`` splits — any real cluster table —
    this returns the input UNCHANGED, so no plan at 100 TB ever pays
    an extra exchange. Callers put it between the scan and the heavy
    per-row compute, after any pushed-down filter.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load + register all fixture tables as temp views; cached per session."""
    skey = _session_key(spark)
    norm = sf_dir.rstrip("/")
    cache_key = (skey, norm)
    if cache_key in _CACHE:
        if _ACTIVE.get(skey) != norm:
            # another scale factor's load replaced the session views —
            # swing them back before any name-resolved SQL runs
            for name, df in _CACHE[cache_key].items():
                df.createOrReplaceTempView(name)
            _ACTIVE[skey] = norm
        return _CACHE[cache_key]
    ensure_confs(spark)
    tables: dict[str, DataFrame] = {}
    for name in TABLES:
        df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
        df = normalize_timestamps(df)
        if name == "events":
            df = normalize_events(df)
        df.createOrReplaceTempView(name)
        tables[name] = df
    _CACHE[cache_key] = tables
    _ACTIVE[skey] = norm
    return tables


#: TPC-H relational tables that benefit from table/column statistics —
#: the join-reorder surface. events/documents/embeddings are excluded:
#: they carry ingestion-normalized columns (ts_ns) that only exist on
#: the temp views, and no query joins more than two of them.
STATS_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)

#: Catalog-table prefix used by :func:`analyze_tables` — temp views
#: cannot carry catalog statistics (EXPECT_PERMANENT_VIEW_NOT_TEMP),
#: so the stats live on external parquet tables registered alongside.
STATS_PREFIX = "stats_"


def analyze_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = STATS_TABLES,
    enable_cbo: bool = True,
) -> None:
    """Give the cost-based optimizer footing: register each fixture
    table as an EXTERNAL parquet catalog table (``stats_<name>``, no
    data copy — the location is the fixture file) and run ``ANALYZE
    TABLE … COMPUTE STATISTICS FOR ALL COLUMNS`` on it, then enable
    CBO + stats-driven join reordering on the session.

    Temp views cannot hold catalog statistics in Spark, so this is the
    Spark-idiomatic equivalent of "ANALYZE the registered views"
    (SURVEY §4.2): at 100 TB, join reordering without rowCount/NDV
    stats leans entirely on AQE's runtime re-planning; with them,
    ``CostBasedJoinReorder`` picks the cheap dimension-first order at
    PLAN time (pinned in tests/test_plans.py — customer⋈orders⋈nation
    reorders to customer⋈nation first). The ANALYZE scan is one pass
    per table; on a cluster you re-run it on data refresh, exactly as
    the reference's ANALYZE would."""
    ensure_confs(spark)
    for name in tables:
        spark.sql(f"DROP TABLE IF EXISTS {STATS_PREFIX}{name}")
        spark.sql(
            f"CREATE TABLE {STATS_PREFIX}{name} USING parquet "
            f"LOCATION '{sf_dir.rstrip('/')}/{name}.parquet'"
        )
        spark.sql(
            f"ANALYZE TABLE {STATS_PREFIX}{name} "
            "COMPUTE STATISTICS FOR ALL COLUMNS"
        )
    if enable_cbo:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to session-tz TIMESTAMP.

    The 2026-08 fixture regeneration stores dates as plain
    ``timestamp[us]`` parquet (no tz), which Spark 4 surfaces as
    TIMESTAMP_NTZ. The session tz is pinned UTC, so the cast keeps the
    wall-clock instant and restores the dtype the whole engine (and the
    DuckDB oracle comparisons) were written against.
    """
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if not ntz:
        return df
    return df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})


def normalize_events(df: DataFrame) -> DataFrame:
    """Expose ``ts`` as TIMESTAMP and ``ts_ns`` as exact BIGINT nanos.

    Handles both fixture generations:
      - TIMESTAMP(NANOS) parquet read as bigint under
        ``nanosAsLong=true`` (pre-2026-08 fixtures);
      - plain ``timestamp[us]`` parquet, which Spark reads as
        TIMESTAMP_NTZ (current fixtures). Session tz is pinned UTC, so
        casting NTZ→TIMESTAMP keeps the same wall-clock instant and
        ``unix_micros*1000`` equals DuckDB's ``epoch_ns(ts)`` exactly.
    """
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        # integer DIV, not `/`: float division of int64 nanos loses precision
        return df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    if dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df.withColumn("ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000))
