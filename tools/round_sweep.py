"""One-shot sweep: replace ROUND/F.round with the portable formula.

    python tools/round_sweep.py          # rewrite in place, print summary

Handles balanced parens and multi-line arguments; splits (expr,
scale) at the LAST top-level comma. Leaves `pround` imports to be
added manually where flagged.
"""

from __future__ import annotations

import glob
import re
import sys


def find_calls(src: str, token: str):
    """Yield (start, end, inner) spans of `token`(...) with balanced parens."""
    out = []
    i = 0
    while True:
        i = src.find(token + "(", i)
        if i == -1:
            break
        # skip if part of a longer identifier (e.g. F.ROUND? approx_ROUND?)
        if i > 0 and (src[i - 1].isalnum() or src[i - 1] in "._"):
            i += len(token)
            continue
        depth, j, in_str = 0, i + len(token), False
        start_inner = j + 1
        while j < len(src):
            ch = src[j]
            if in_str:
                if ch == "'":
                    in_str = False
            elif ch == "'":
                in_str = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        out.append((i, j + 1, src[start_inner:j]))
        i = j
    return out


def split_last_top_comma(inner: str):
    depth, in_str, last = 0, False, None
    for idx, ch in enumerate(inner):
        if in_str:
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            last = idx
    if last is None:
        return None, None
    return inner[:last].rstrip(), inner[last + 1 :].strip()


def rewrite(path: str) -> tuple[int, int, bool]:
    src = open(path).read()
    n_sql = n_py = 0
    needs_import = False

    # SQL ROUND( … , s) — only inside files; DuckDB + SparkSQL both fine
    while True:
        calls = [
            c
            for c in find_calls(src, "ROUND")
            if split_last_top_comma(c[2])[1] in ("2", "4")
        ]
        if not calls:
            break
        s, e, inner = calls[0]
        expr, scale = split_last_top_comma(inner)
        k = 10 ** int(scale)
        src = src[:s] + f"floor(CAST({expr} AS DOUBLE) * {k} + 0.5) / {k}" + src[e:]
        n_sql += 1

    # Spark F.round( … , s)
    while True:
        calls = [
            c
            for c in find_calls(src, "F.round")
            if split_last_top_comma(c[2])[1] in ("2", "4")
        ]
        if not calls:
            break
        s, e, inner = calls[0]
        expr, scale = split_last_top_comma(inner)
        if scale == "4":
            src = src[:s] + f"pround({expr})" + src[e:]
        else:
            src = src[:s] + f"pround({expr}, {scale})" + src[e:]
        n_py += 1
        needs_import = True

    if needs_import and "from algebraicdb_spark.functions.rounding import" not in src:
        m = re.search(r"^(from algebraicdb_spark[^\n]+\n)", src, re.M)
        assert m, path
        src = (
            src[: m.start()]
            + "from algebraicdb_spark.functions.rounding import pround\n"
            + src[m.start() :]
        )
    open(path, "w").write(src)
    return n_sql, n_py, needs_import


if __name__ == "__main__":
    files = sorted(
        set(glob.glob("algebraicdb_spark/**/*.py", recursive=True))
        - {"algebraicdb_spark/functions/rounding.py"}
    )
    total_sql = total_py = 0
    for f in files:
        ns, np_, imp = rewrite(f)
        if ns or np_:
            print(f"{f}: {ns} SQL, {np_} Spark{' (+import)' if imp else ''}")
        total_sql += ns
        total_py += np_
    print(f"TOTAL: {total_sql} SQL, {total_py} Spark rewrites")
    sys.exit(0)
