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


def test_no_error_findings_on_any_key(spark, sf_dir):
    """Fleet-wide plan audit: no registered key may contain an
    ERROR-severity pattern (CartesianProduct). Warn-level findings
    (bounded BNLJ, final-result sorts, demo row-at-a-time UDF keys)
    are intentional and documented in docs/SCALE.md §4.

    Same sweep also pins the output-schema contract from the round-5
    verdict: no key may emit a raw DECIMAL column wider than precision
    18. Wider decimals (e.g. a DECIMAL(38,0) checksum, ~10^22) fit
    neither int64 nor an exact double, so client-side hash
    canonicalization diverges between engines — emit STRING (digits) or
    split BIGINTs instead (the scan_table_checksum r05 driver FAIL)."""
    from pyspark.sql.types import DecimalType

    from algebraicdb_spark.plans import registry

    skip_prefixes = ("stream_", "source_", "sink_")
    skip_keys = {"join_bucketed"}  # writes managed tables; plan pinned elsewhere
    failures = {}
    wide_decimals = {}
    for key, fn in registry.queries().items():
        if key.startswith(skip_prefixes) or key in skip_keys:
            continue
        df = fn(spark, sf_dir)
        errs = [(c, m) for sev, c, m in lint(df) if sev == "error"]
        if errs:
            failures[key] = errs
        wide = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, DecimalType) and f.dataType.precision > 18
        ]
        if wide:
            wide_decimals[key] = wide
    assert not failures, failures
    assert not wide_decimals, (
        f"output columns of decimal precision > 18 (cast to STRING or "
        f"DOUBLE-on-grid instead): {wide_decimals}"
    )


def test_global_window_over_aggregate_is_warn_not_error(tables):
    # prefix sum over a groupBy result: bounded by key cardinality, so
    # the single-task window is the cheapest correct plan -> warn only
    w = Window.orderBy(F.desc("n")).rowsBetween(Window.unboundedPreceding, 0)
    per = tables["orders"].groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    df = per.select("o_orderstatus", F.sum("n").over(w).alias("cum"))
    found = {c: sev for sev, c, _ in lint(df)}
    assert "GLOBAL_WINDOW" not in found
    assert found.get("GLOBAL_WINDOW_AGG") == "warn"


def test_fixpoint_lint_flags_pair_materializing_closure():
    from algebraicdb_spark.plans.scalelint import lint_fixpoint

    stmt = (
        "WITH RECURSIVE reach(src, dst) AS ("
        "  SELECT src, dst FROM edges"
        "  UNION"
        "  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst"
        ") SELECT COUNT(*) FROM reach"
    )
    codes = {c: sev for sev, c, _ in lint_fixpoint(stmt)}
    assert codes.get("RECURSIVE_PAIR_GROWTH") == "warn"
    # the warning must point users at the linear-state alternative
    msg = next(m for _, c, m in lint_fixpoint(stmt) if c == "RECURSIVE_PAIR_GROWTH")
    assert "WITH ITERATE" in msg


def test_fixpoint_lint_flags_naive_fallback_and_no_max():
    from algebraicdb_spark.plans.scalelint import lint_fixpoint

    naive = (
        "WITH RECURSIVE p(a, b) AS ("
        "  SELECT a, b FROM base"
        "  UNION"
        "  SELECT x.a, y.b FROM p x JOIN p y ON x.b = y.a"
        ") SELECT * FROM p"
    )
    codes = {c for _, c, _ in lint_fixpoint(naive)}
    assert "RECURSIVE_NAIVE_FALLBACK" in codes

    no_max = (
        "WITH ITERATE lbl AS ("
        "  SELECT id, id AS label FROM nodes"
        "  STEP SELECT id, MIN(label) AS label FROM lbl GROUP BY id"
        ") SELECT * FROM lbl"
    )
    assert {c for _, c, _ in lint_fixpoint(no_max)} == {"ITERATE_NO_MAX"}
    with_max = no_max.replace("ITERATE lbl AS", "ITERATE lbl MAX 20 AS")
    assert lint_fixpoint(with_max) == []


def test_explain_scale_on_fixpoint_returns_findings(spark):
    from algebraicdb_spark.engine import Engine

    eng = Engine(spark)
    rows = eng.sql(
        "EXPLAIN SCALE WITH RECURSIVE t(n) AS (SELECT 1 AS n UNION "
        "SELECT n + 1 FROM t WHERE n < 3) SELECT * FROM t"
    ).collect()
    # linear counter: no pair growth — the clean row comes back
    assert [r.code for r in rows] == ["CLEAN"]
    rows2 = eng.sql(
        "EXPLAIN SCALE WITH RECURSIVE reach(src, dst) AS ("
        "SELECT 1 AS src, 2 AS dst UNION "
        "SELECT r.src, r2.dst FROM reach r JOIN reach r2 ON r.dst = r2.src"
        ") SELECT * FROM reach"
    ).collect()
    codes = {r.code for r in rows2}
    assert "RECURSIVE_PAIR_GROWTH" in codes


def test_fixpoint_lint_ignores_union_inside_anchor_subquery():
    """A UNION nested inside the anchor's subquery must not cut the
    body: only the depth-0 UNION separates anchor from step (same rule
    the executor uses), so a linear counter whose anchor contains a
    nested UNION + JOIN is NOT flagged as pair growth."""
    from algebraicdb_spark.plans.scalelint import lint_fixpoint

    stmt = (
        "WITH RECURSIVE t(n) AS ("
        "  SELECT s.n FROM (SELECT 1 AS n UNION SELECT 2 AS n) s"
        "  JOIN (SELECT 1 AS k) d ON s.n = d.k"
        "  UNION"
        "  SELECT n + 1 FROM t WHERE n < 10"
        ") SELECT * FROM t"
    )
    assert lint_fixpoint(stmt) == []


def test_rescan_lint_flags_recomputed_shared_subplan(tables):
    """Round-8 audit institutionalized: a frame derived once but
    consumed by several branches without a checkpoint shows the same
    file scanned per consumer; the RESCAN warn names the pattern."""
    li = tables["lineitem"]
    # heavy derived frame feeding four consumers, uncached on purpose
    agg = li.groupBy("l_partkey").agg(F.sum("l_quantity").alias("q"))
    four = (
        agg.select("l_partkey")
        .unionAll(agg.select("l_partkey"))
        .unionAll(agg.select("l_partkey"))
        .unionAll(agg.select("l_partkey"))
    )
    codes = {c for _, c, _ in lint(four, max_exchanges=99)}
    assert "RESCAN" in codes
    # a single-scan plan stays clean
    clean = li.groupBy("l_partkey").agg(F.count("*").alias("n"))
    assert "RESCAN" not in {c for _, c, _ in lint(clean, max_exchanges=99)}
