"""Local replica of the driver's t2 correctness gate.

Runs every registered query at sf0.01 on Spark AND its oracle SQL on
DuckDB over the same parquet, compares row count, column names, and an
order-insensitive value hash (doubles pre-rounded by the queries
themselves per SURVEY §5.3). Usage:

    python tools/verify_local.py [key ...]     # default: all keys
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    """Canonicalize a cell so Spark/DuckDB reprs hash identically."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        # exact repr: catches 1-ulp cross-engine drift the driver's
        # hash would catch (STRICT_FLOATS=0 relaxes to 6 sig digits)
        import os as _os
        if _os.environ.get("STRICT_FLOATS", "1") == "0":
            return f"{v:.6g}"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


# canonical type lattice: Spark simpleString / DuckDB type id → family.
# The driver compares schemas; a Spark BIGINT vs DuckDB INTEGER (or
# DECIMAL vs DOUBLE) would fail ITS gate even when values hash equal,
# so we surface family mismatches here.
def type_family(t: str) -> str:
    t = str(t).lower()
    for fam, names in {
        # hugeint is deliberately NOT in the int family: Spark has no
        # int128, and the driver's value hash distinguishes it (the r1
        # SUM(CASE) failures) — an oracle emitting HUGEINT must fail here
        "int": ("tinyint", "smallint", "int", "integer", "bigint",
                "utinyint", "usmallint", "uinteger", "ubigint", "long", "short"),
        "hugeint": ("hugeint",),
        "float": ("float", "real", "double"),
        "decimal": ("decimal", "numeric"),
        "bool": ("boolean", "bool"),
        "string": ("string", "varchar", "text", "char"),
        "date": ("date",),
        "timestamp": ("timestamp", "timestamp_ns", "timestamp with time zone",
                      "timestamp_s", "timestamp_ms"),
        "binary": ("binary", "blob", "bytea"),
    }.items():
        if any(t == n or t.startswith(n + "(") for n in names):
            return fam
    if t.startswith(("array", "list", "map", "struct")):
        return t.split("(")[0].split("<")[0].replace("list", "array")
    return t


def schema_families(pairs):
    return {name.lower(): type_family(t) for name, t in pairs}


def main() -> int:
    from algebraicdb_spark.plans import registry
    from algebraicdb_spark.session import get_spark
    from algebraicdb_spark.sources.catalog import load_tables

    qs, oracles = registry.queries(), registry.oracles()
    keys = sys.argv[1:] or sorted(qs)

    spark = get_spark("verify-local")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, SF_DIR)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    n_pass = n_fail = n_rows_only = 0
    failures = []
    for key in keys:
        if key not in qs:
            print(f"{key:32s} UNKNOWN KEY")
            n_fail += 1
            continue
        t0 = time.time()
        try:
            sdf = qs[key](spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:
            print(f"{key:32s} SPARK ERROR: {type(exc).__name__}: {exc}")
            failures.append(key)
            n_fail += 1
            continue
        dt = time.time() - t0
        if key not in oracles:
            print(f"{key:32s} rows-only   rows={len(srows):>7}  {dt:5.2f}s")
            n_rows_only += 1
            continue
        try:
            rel = con.sql(oracles[key])
            dcols = list(rel.columns)
            dtypes = [str(t) for t in rel.types]
            drows = rel.fetchall()
        except Exception as exc:
            print(f"{key:32s} ORACLE ERROR: {exc}")
            failures.append(key)
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)}!={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)}!={sorted(dcols)}")
        else:
            sfam = schema_families((f.name, f.dataType.simpleString()) for f in sdf.schema.fields)
            dfam = schema_families(zip(dcols, dtypes))
            diff = {c: (sfam[c], dfam[c]) for c in sfam if sfam[c] != dfam.get(c)}
            if diff:
                problems.append(f"schema {diff}")
        if not problems:
            sh = value_hash(scols, [tuple(r) for r in srows])
            dh = value_hash(dcols, drows)
            if sh != dh:
                problems.append(f"hash {sh}!={dh}")
        if problems:
            print(f"{key:32s} FAIL: {'; '.join(problems)}")
            failures.append(key)
            n_fail += 1
        else:
            print(f"{key:32s} ok          rows={len(srows):>7}  {dt:5.2f}s")
            n_pass += 1

    print(
        f"\n{n_pass} hash-verified, {n_rows_only} rows-only, {n_fail} FAILED"
        + (f": {failures}" if failures else "")
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
