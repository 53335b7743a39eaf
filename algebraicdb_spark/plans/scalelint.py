"""Scale linter: inspect a DataFrame's physical plan for the patterns
that kill jobs at 100 TB but pass unnoticed at test scale.

    from algebraicdb_spark.plans.scalelint import lint, report
    issues = lint(df)        # [(severity, code, message), ...]
    print(report(df))        # human-readable summary

Checks (each maps to a SURVEY §4 scale rule):
  CARTESIAN      CartesianProduct — O(n·m) rows, never acceptable
  GLOBAL_WINDOW  window function with an empty partition spec — the
                 whole dataset lands on ONE task
  GLOBAL_SORT    Sort with a single-partition exchange feeding it
  BNLJ           BroadcastNestedLoopJoin — fine for a tiny broadcast
                 side, fatal if both sides are big (warn)
  PY_EVAL        row-at-a-time Python eval in the plan (BatchEvalPython)
                 — Arrow/pandas variants are not flagged
  MANY_SHUFFLES  more than `max_exchanges` Exchange operators

The linter reads plan strings rather than walking JVM objects — it is
a diagnostic, not a guarantee; plan tests pin the exact shapes.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

WARN = "warn"
ERROR = "error"


def _plan_strings(df: DataFrame) -> tuple[str, str]:
    qe = df._jdf.queryExecution()
    return qe.executedPlan().toString(), qe.optimizedPlan().toString()


def lint(df: DataFrame, max_exchanges: int = 4) -> list[tuple[str, str, str]]:
    physical, optimized = _plan_strings(df)
    issues: list[tuple[str, str, str]] = []

    if "CartesianProduct" in physical:
        issues.append(
            (ERROR, "CARTESIAN", "cartesian product: O(n*m) blowup at scale")
        )
    if "BroadcastNestedLoopJoin" in physical:
        issues.append(
            (
                WARN,
                "BNLJ",
                "nested-loop join: acceptable only if the broadcast side "
                "stays small at production scale",
            )
        )
    # window with empty partition spec: the spec's FIRST argument is an
    # ordering expression ("col ASC/DESC NULLS ...") instead of a bare
    # partition column. Severity depends on the window's INPUT grain:
    # over raw data it serializes the whole dataset onto one task
    # (error); over the output of an aggregation the row count is the
    # group-key cardinality — bounded and data-volume-independent — so
    # a single-task pass is the cheapest correct plan (warn, so the
    # author still confirms the key cardinality stays small).
    for line_no, line in enumerate(optimized.splitlines()):
        m = re.search(r"windowspecdefinition\(([^)]*)", line)
        if not m:
            continue
        first_arg = m.group(1).split(",", 1)[0]
        if re.search(r"\s(ASC|DESC)(\s|$)", first_arg):
            below = "\n".join(optimized.splitlines()[line_no + 1 :])
            if re.search(r"\bAggregate\b", below):
                issues.append(
                    (
                        WARN,
                        "GLOBAL_WINDOW_AGG",
                        "global window over aggregated input: single task, "
                        "but row count = group-key cardinality (verify it "
                        "stays bounded at scale)",
                    )
                )
            else:
                issues.append(
                    (
                        ERROR,
                        "GLOBAL_WINDOW",
                        "window without partitionBy: entire input sorts on "
                        "one task",
                    )
                )
            break
    if re.search(r"Exchange SinglePartition(?![\s\S]*TakeOrdered)", physical) and (
        "Sort " in physical
    ):
        issues.append(
            (
                WARN,
                "GLOBAL_SORT",
                "single-partition sort: fine for final small results only",
            )
        )
    if "BatchEvalPython" in physical:
        issues.append(
            (
                WARN,
                "PY_EVAL",
                "row-at-a-time Python UDF in plan: prefer built-ins or pandas_udf",
            )
        )
    n_exchanges = physical.count("Exchange")
    if n_exchanges > max_exchanges:
        issues.append(
            (
                WARN,
                "MANY_SHUFFLES",
                f"{n_exchanges} exchanges (> {max_exchanges}): check for "
                "reusable partitioning or pre-aggregation",
            )
        )
    # RESCAN (round 8): Catalyst re-runs a shared subplan once per
    # consumer across DataFrame branch points — ReuseExchange does not
    # cover these. ≥4 scans of one file usually means a derived frame
    # (inverted index, edge list, count table) is being recomputed;
    # the fix is a lazy localCheckpoint of the grain-bounded
    # intermediate. (≤3 scans is common for legitimate multi-pass
    # reads of a pruned base table.)
    # Key scan counts by the full matched path, not the bare filename:
    # two distinct tables whose files share a name (e.g. documents
    # .parquet staged under different directories in one stream-static
    # plan) must not merge into one count and trip a false warning.
    scan_counts: dict[str, int] = {}
    for m in re.finditer(
        r"Scan \w+ [^\n]*?([\w./-]+\.(?:parquet|csv|json))", physical
    ):
        scan_counts[m.group(1)] = scan_counts.get(m.group(1), 0) + 1
    for src, cnt in scan_counts.items():
        if cnt >= 4:
            issues.append(
                (
                    WARN,
                    "RESCAN",
                    f"'{src}' scanned {cnt}x in one plan: a shared "
                    "intermediate is likely recomputed per consumer — "
                    "localCheckpoint the grain-bounded derived frame",
                )
            )
    return issues


def report(df: DataFrame, max_exchanges: int = 4) -> str:
    issues = lint(df, max_exchanges)
    if not issues:
        return "scale-lint: clean"
    lines = [f"scale-lint: {len(issues)} issue(s)"]
    lines += [f"  [{sev}] {code}: {msg}" for sev, code, msg in issues]
    return "\n".join(lines)


def lint_fixpoint(stmt: str) -> list[tuple[str, str, str]]:
    """Static scale lint for WITH RECURSIVE / WITH ITERATE statements.

    The driver-coordinated fixpoint has no single Catalyst plan to
    inspect, but its scale failure mode is visible in the STATEMENT:
    an accumulating (UNION-distinct) recursive CTE whose step joins
    the accumulator materializes every derived row — for transitive
    closure / reachability that is a row per reachable PAIR, quadratic
    in component size by SQL semantics, regardless of how cleverly the
    rounds are scheduled. The linear-state alternative is the dialect's
    ``WITH ITERATE`` replacement fixpoint (state_{i+1} = step(state_i):
    per-entity labels, degrees, distances — O(|entities|) per round).
    ``EXPLAIN SCALE`` routes fixpoint statements here (engine.py).
    """
    from algebraicdb_spark.fixpoint import (
        _UNION_RE,
        _depth_at,
        _parse,
        _refs,
    )

    kind, ctes, _final, _saved = _parse(stmt)
    issues: list[tuple[str, str, str]] = []

    def _split_at_top_level(body: str, pattern) -> str:
        """Step body after the first DEPTH-0 match of pattern — a
        UNION inside an anchor subquery must not cut the body (the
        executor uses the same depth-0 rule)."""
        for m in pattern.finditer(body):
            if _depth_at(body, m.start()) == 0:
                return body[m.end():]
        return body

    for cte in ctes:
        if not _refs(cte.body, cte.name):
            continue
        if kind == "RECURSIVE":
            step = _split_at_top_level(cte.body, _UNION_RE)
            if re.search(r"(?i)\bJOIN\b", step) and _refs(step, cte.name):
                issues.append(
                    (
                        WARN,
                        "RECURSIVE_PAIR_GROWTH",
                        f"accumulating fixpoint '{cte.name}' joins its own "
                        "accumulator each round: the result set grows with "
                        "derived PAIRS (quadratic in component size for "
                        "closure/reachability). If the state you need is "
                        "per-entity (labels, degrees, distances), use the "
                        "WITH ITERATE replacement fixpoint — linear state "
                        "per round",
                    )
                )
            if _refs(step, cte.name) >= 2:
                issues.append(
                    (
                        WARN,
                        "RECURSIVE_NAIVE_FALLBACK",
                        f"step references '{cte.name}' more than once: "
                        "semi-naive (delta-only) evaluation is unsound here, "
                        "so each round re-evaluates against the FULL "
                        "accumulator — cost grows with the accumulated set, "
                        "not the frontier",
                    )
                )
        else:  # ITERATE: replacement fixpoint — state is user-bounded
            if cte.max_iters is None:
                issues.append(
                    (
                        WARN,
                        "ITERATE_NO_MAX",
                        f"WITH ITERATE '{cte.name}' has no MAX n: a "
                        "non-converging step raises after the recursion "
                        "budget instead of returning — set MAX for "
                        "fixed-round algorithms",
                    )
                )
    return issues
