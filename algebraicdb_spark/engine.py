"""Engine facade — the reference's user surface on Spark.

algebraicdb is a client/server DBMS whose users issue statements:
``CREATE TYPE`` (sum types), ``CREATE TABLE``, ``INSERT``, and
``SELECT`` with pattern matching. This facade provides that workflow
on a SparkSession:

    eng = Engine(spark, sf_dir="/root/testdata/sf0.01")   # fixtures
    eng.sql("CREATE TYPE Shape = Circle(r: DOUBLE) | Rect(w: DOUBLE, h: DOUBLE) | Point")
    shape = eng.type("Shape")
    df = eng.table("part").select(shape.construct("Point").alias("s"))
    eng.create_table("shapes", df)
    eng.sql("SELECT s.tag, COUNT(*) FROM shapes GROUP BY s.tag")

SELECT/INSERT/etc. delegate straight to Spark SQL (Catalyst is the
planner/optimizer/executor — SURVEY §3.2 E1); ``CREATE TYPE`` is the
one reference statement Spark lacks, parsed here into an
:class:`~algebraicdb_spark.functions.adt.AdtType` whose constructors
and matches compile to Catalyst expressions. Pattern matching is
exposed through the AdtType API (match/is_variant/bind) rather than
custom SELECT syntax — same semantics, plan-time exhaustiveness
checking included.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from algebraicdb_spark.functions.adt import AdtError, AdtType, Variant
from algebraicdb_spark.session import get_spark
from algebraicdb_spark.sources.catalog import ensure_confs, load_tables

_CREATE_TYPE_RE = re.compile(
    r"^\s*CREATE\s+TYPE\s+(?P<name>\w+)\s*=\s*(?P<body>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_VARIANT_RE = re.compile(r"^(?P<name>\w+)\s*(?:\((?P<fields>[^)]*)\))?$")


def parse_create_type(stmt: str) -> AdtType:
    """Parse the reference's ``CREATE TYPE T = A(x: T1) | B | ...``."""
    m = _CREATE_TYPE_RE.match(stmt)
    if not m:
        raise AdtError(f"not a CREATE TYPE statement: {stmt!r}")
    variants = []
    for part in m.group("body").split("|"):
        vm = _VARIANT_RE.match(part.strip())
        if not vm:
            raise AdtError(f"bad variant declaration: {part.strip()!r}")
        fields = []
        if vm.group("fields"):
            for f in vm.group("fields").split(","):
                fname, _, ftype = f.partition(":")
                if not ftype.strip():
                    raise AdtError(f"variant field needs a type: {f.strip()!r}")
                fields.append((fname.strip(), ftype.strip().lower()))
        variants.append(Variant(vm.group("name"), fields))
    return AdtType(m.group("name"), variants)


class Engine:
    """A session-scoped analytics engine over parquet tables + ADTs."""

    def __init__(self, spark: SparkSession | None = None, sf_dir: str | None = None):
        self.spark = spark or get_spark()
        ensure_confs(self.spark)
        self._types: dict[str, AdtType] = {}
        if sf_dir:
            self.attach(sf_dir)

    # -- catalog -------------------------------------------------------

    def attach(self, sf_dir: str) -> None:
        """Register the fixture tables from a scale-factor directory."""
        load_tables(self.spark, sf_dir)

    def create_table(self, name: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(name)

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    # -- statements ----------------------------------------------------

    def sql(self, stmt: str) -> DataFrame | AdtType:
        """Run a statement: CREATE TYPE is handled by the engine,
        everything else goes to Spark SQL untouched."""
        if _CREATE_TYPE_RE.match(stmt):
            adt = parse_create_type(stmt)
            self._types[adt.name] = adt
            return adt
        return self.spark.sql(stmt)

    # -- types ---------------------------------------------------------

    def create_type(self, name: str, variants: list[Variant]) -> AdtType:
        adt = AdtType(name, variants)
        self._types[name] = adt
        return adt

    def type(self, name: str) -> AdtType:
        if name not in self._types:
            raise AdtError(f"unknown type {name!r} (declared: {sorted(self._types)})")
        return self._types[name]

    @property
    def types(self) -> dict[str, AdtType]:
        return dict(self._types)
