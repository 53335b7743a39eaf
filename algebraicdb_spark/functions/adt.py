"""Algebraic data types on Spark — the reference's signature surface.

algebraicdb lets users declare sum types (``CREATE TYPE T = A(x) |
B(y, z)``), store them in cells, and pattern-match in queries, with
the typechecker rejecting non-exhaustive matches. Spark has no native
sum type, so this module provides the standardized tagged-struct
encoding (SURVEY §1.3) plus an expression builder that preserves the
reference's *semantics*:

    encoding      STRUCT< tag: STRING NOT NULL,
                          <variant_name>: STRUCT<payload…> NULLABLE >
    constructor   AdtType.construct("Purchase", amount=col)
    match         AdtType.match(col, {"Purchase": lambda p: p["amount"]…},
                                default=…)  — CASE WHEN ladder
    exhaustive    match() raises AdtMatchError at PLAN TIME if arms +
                  default don't cover the declared tag set (mirroring
                  the reference's analysis-time typecheck)

Everything compiles to plain Catalyst expressions (struct/when/
getField) — codegen-friendly, no UDFs, columnar all the way down.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


class AdtError(ValueError):
    """Invalid ADT declaration or construction."""


class AdtMatchError(AdtError):
    """Non-exhaustive or ill-formed pattern match (plan-time error)."""


def field_ddl(t) -> str:
    """Spark DDL of a payload-field type: a plain DDL string, or the
    tagged-struct encoding when the field is itself an ADT (nested
    sum types — ``Wrap(inner: Shape)``)."""
    return t.schema_ddl() if isinstance(t, AdtType) else t


class Variant:
    """One constructor of a sum type: a name + typed payload fields."""

    def __init__(self, name: str, fields: Sequence[tuple[str, str]] = ()):
        if not name or not name[0].isupper():
            raise AdtError(f"variant names are capitalized: {name!r}")
        self.name = name
        self.fields = tuple(fields)  # (field_name, spark_type_ddl | AdtType)

    @property
    def slot(self) -> str:
        """The struct field holding this variant's payload."""
        return self.name.lower()


class AdtType:
    """A declared sum type; owns construction and pattern matching."""

    def __init__(self, name: str, variants: Sequence[Variant]):
        if not variants:
            raise AdtError(f"ADT {name!r} needs >=1 variant")
        names = [v.name for v in variants]
        if len(set(names)) != len(names):
            raise AdtError(f"duplicate variants in {name!r}: {names}")
        self.name = name
        self.variants = tuple(variants)
        self._by_name = {v.name: v for v in variants}

    @property
    def tags(self) -> tuple[str, ...]:
        return tuple(v.name for v in self.variants)

    def _payload_struct(self, variant: Variant, values: Mapping[str, Column]) -> Column:
        if set(values) != {f for f, _ in variant.fields}:
            raise AdtError(
                f"{self.name}.{variant.name} expects fields "
                f"{[f for f, _ in variant.fields]}, got {sorted(values)}"
            )
        if not variant.fields:
            # payload-less variant still gets a (nullable) marker struct
            return F.struct(F.lit(True).alias("_unit"))
        return F.struct(
            *[values[f].cast(field_ddl(t)).alias(f) for f, t in variant.fields]
        )

    def construct(self, variant_name: str, **values: Column) -> Column:
        """Constructor: build a tagged-struct value of this ADT.

        Inactive variant slots are typed NULLs so every constructed
        value has the identical struct schema (unionable, writable).
        """
        if variant_name not in self._by_name:
            raise AdtError(f"{self.name} has no variant {variant_name!r}")
        parts: list[Column] = [F.lit(variant_name).alias("tag")]
        for v in self.variants:
            if v.name == variant_name:
                payload = self._payload_struct(v, values)
            else:
                payload = F.lit(None).cast(self._slot_ddl(v))
            parts.append(payload.alias(v.slot))
        return F.struct(*parts)

    def construct_when(self, branches: Sequence[tuple[Column, str, Mapping[str, Column]]]) -> Column:
        """Conditional constructor: CASE over (condition, variant, payload).

        The branch conditions must be total (last one may be used with
        ``F.lit(True)``); used to encode an existing column into the ADT.
        """
        expr = None
        for cond, variant_name, values in branches:
            built = self.construct(variant_name, **values)
            expr = F.when(cond, built) if expr is None else expr.when(cond, built)
        if expr is None:
            raise AdtError("construct_when needs >=1 branch")
        return expr

    def _slot_ddl(self, variant: Variant) -> str:
        if not variant.fields:
            return "struct<_unit: boolean>"
        inner = ", ".join(f"{f}: {field_ddl(t)}" for f, t in variant.fields)
        return f"struct<{inner}>"

    def schema_ddl(self) -> str:
        """DDL string of the full encoding (for createDataFrame/tests)."""
        slots = ", ".join(f"{v.slot}: {self._slot_ddl(v)}" for v in self.variants)
        return f"struct<tag: string, {slots}>"

    # -- pattern matching ------------------------------------------------

    def is_variant(self, col: Column, variant_name: str) -> Column:
        """Filter-position pattern: ``e is Purchase``."""
        if variant_name not in self._by_name:
            raise AdtError(f"{self.name} has no variant {variant_name!r}")
        return col.getField("tag") == variant_name

    def bind(self, col: Column, variant_name: str, field: str | None = None) -> Column:
        """Payload binding: ``Purchase(amount)`` → the amount column.

        NULL when the value is a different variant — combine with
        :meth:`is_variant` (filter) or :meth:`match` (projection).
        """
        v = self._by_name.get(variant_name)
        if v is None:
            raise AdtError(f"{self.name} has no variant {variant_name!r}")
        payload = col.getField(v.slot)
        if field is None:
            return payload
        if field not in {f for f, _ in v.fields}:
            raise AdtError(f"{self.name}.{variant_name} has no field {field!r}")
        return payload.getField(field)

    def match(
        self,
        col: Column,
        arms: Mapping[str, Callable[[Column], Column]],
        default: Column | None = None,
    ) -> Column:
        """Exhaustive pattern match compiled to a CASE WHEN ladder.

        ``arms`` maps variant name → fn(payload_struct) -> result.
        Plan-time exhaustiveness check (the reference did this in its
        typechecker): every declared variant must be covered by an arm
        or by ``default``, and unknown arm names are rejected.
        """
        unknown = set(arms) - set(self.tags)
        if unknown:
            raise AdtMatchError(f"{self.name}: match on unknown variants {sorted(unknown)}")
        missing = set(self.tags) - set(arms)
        if missing and default is None:
            raise AdtMatchError(
                f"{self.name}: non-exhaustive match — missing {sorted(missing)} "
                f"(add arms or a default)"
            )
        expr: Column | None = None
        for v in self.variants:
            if v.name not in arms:
                continue
            result = arms[v.name](col.getField(v.slot))
            cond = col.getField("tag") == v.name
            expr = F.when(cond, result) if expr is None else expr.when(cond, result)
        assert expr is not None
        return expr.otherwise(default) if default is not None else expr


# The fixture ADT derived from `events` (FIXTURES.md "Derived fixtures").
EVENT_ADT = AdtType(
    "Event",
    [
        Variant("Click", [("user", "bigint")]),
        Variant("View", [("user", "bigint")]),
        Variant("Purchase", [("amount", "double")]),
        Variant("Signup", [("user", "bigint")]),
        Variant("Error", [("code", "int")]),
    ],
)

# Option-of-ADT used by the nested-match key (Maybe/Option is how the
# reference models absence — it has no SQL NULL).
def option_of(inner: AdtType) -> AdtType:
    return AdtType(
        f"Option{inner.name}",
        [Variant("None_", []), Variant("Some", [("value", inner.schema_ddl())])],
    )
