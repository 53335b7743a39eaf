"""Round 14 second half: Delta CHECK constraints ENFORCED and
GENERATED columns HONORED by the writer (both were declaration-based
refusals). CHECK: every path that lands new row content probes the
declared ``delta.constraints.<name>`` expressions before publishing —
violated iff an expression is FALSE (null satisfies, per SQL) — and
ALTER ADD CONSTRAINT validates the table's existing rows. GENERATED:
absent columns compute at write from ``delta.generationExpression``,
present ones validate against it, UPDATE/MERGE postimages recompute
from the (possibly updated) sources, and direct assignment refuses.

The read-side fixtures hand-write the declarations into the log, the
shape a real Delta client leaves behind."""

import json
import os

import pytest

# Heavyweight lakehouse interop e2e tier: excluded from the
# default pytest run (see pyproject [tool.pytest.ini_options]);
# run explicitly with `pytest -m interop`.
pytestmark = pytest.mark.interop

from algebraicdb_spark.operators.delta_writer import DeltaTableWriter
from algebraicdb_spark.operators.txnlog import DeltaLogTable


def _df(spark, rows, schema="k long, v double"):
    return spark.createDataFrame(rows, schema)


def _constrained(spark, tmp_path, name, expr="v > 0"):
    root = str(tmp_path / name)
    w = DeltaTableWriter(root)
    w.append(_df(spark, [(1, 1.0), (2, 2.0)]).coalesce(1))
    w.set_properties({"delta.constraints.v_pos": expr}, spark=spark)
    return w


def _gen_table(spark, tmp_path, name):
    """Hand-written log declaring k2 GENERATED ALWAYS AS (k * 2) —
    the foreign-client shape (generation expressions live in field
    metadata, not configuration)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / name)
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    t = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "k2": pa.array([2, 4], pa.int64())})
    pq.write_table(t, os.path.join(root, "f0.parquet"))
    sch = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "k2", "type": "long", "nullable": True,
         "metadata": {"delta.generationExpression": "k * 2"}},
    ]}
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        for a in [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
            {"metaData": {"id": name, "format": {"provider": "parquet"},
                          "schemaString": json.dumps(sch),
                          "partitionColumns": [], "configuration": {}}},
            {"add": {"path": "f0.parquet", "partitionValues": {},
                     "size": os.path.getsize(
                         os.path.join(root, "f0.parquet")),
                     "modificationTime": 0, "dataChange": True}},
        ]:
            f.write(json.dumps(a) + "\n")
    return root


class TestCheckConstraints:
    def test_append_enforces(self, spark, tmp_path):
        w = _constrained(spark, tmp_path, "ap")
        with pytest.raises(ValueError, match="CHECK constraint v_pos"):
            w.append(_df(spark, [(3, -1.0)]))
        # the refused batch leaked nothing; a valid one lands
        w.append(_df(spark, [(3, 3.0)]))
        assert DeltaLogTable(w.path).snapshot(spark).count() == 3

    def test_null_satisfies(self, spark, tmp_path):
        """SQL CHECK semantics: only FALSE violates — a null
        expression result passes."""
        w = _constrained(spark, tmp_path, "nl")
        w.append(_df(spark, [(4, None)]))
        assert DeltaLogTable(w.path).snapshot(spark).count() == 3

    def test_update_and_merge_enforce(self, spark, tmp_path):
        w = _constrained(spark, tmp_path, "up")
        with pytest.raises(ValueError, match="CHECK constraint v_pos"):
            w.update(spark, {"v": "v - 10"}, "k = 1")
        w.update(spark, {"v": "v + 10"}, "k = 1")
        with pytest.raises(ValueError, match="CHECK constraint v_pos"):
            w.merge(
                spark, _df(spark, [(9, -9.0)], "mk long, mv double"),
                "t.k = s.mk", None, ["s.mk", "s.mv"],
            )
        got = {r["k"]: r["v"]
               for r in DeltaLogTable(w.path).snapshot(spark).collect()}
        assert got == {1: 11.0, 2: 2.0}

    def test_mor_update_enforces(self, spark, tmp_path):
        w = _constrained(spark, tmp_path, "mo")
        w.enable_deletion_vectors()
        with pytest.raises(ValueError, match="CHECK constraint v_pos"):
            w.update(spark, {"v": "-v"}, "k = 2", mode="mor")
        assert DeltaLogTable(w.path).snapshot(spark).where(
            "v <= 0").count() == 0

    def test_add_constraint_validates_existing_rows(
        self, spark, tmp_path
    ):
        root = str(tmp_path / "ex")
        w = DeltaTableWriter(root)
        w.append(_df(spark, [(1, -1.0)]))
        with pytest.raises(ValueError, match="CHECK constraint v_pos"):
            w.set_properties(
                {"delta.constraints.v_pos": "v > 0"}, spark=spark)
        # without spark the validation cannot run: loud refusal
        with pytest.raises(ValueError, match="spark"):
            w.set_properties({"delta.constraints.v_pos": "v > 0"})
        # dropping a constraint never needs validation
        w2 = _constrained(spark, tmp_path, "dr")
        w2.set_properties({"delta.constraints.v_pos": None})
        w2.append(_df(spark, [(9, -9.0)]))  # rule gone

    def test_foreign_declared_constraint_binds(self, spark, tmp_path):
        """A table whose log a real client wrote with the constraint
        already declared: our writer enforces it on first contact."""
        w = _constrained(spark, tmp_path, "fg")
        w2 = DeltaTableWriter(w.path)  # fresh instance, log-declared
        with pytest.raises(ValueError, match="CHECK constraint v_pos"):
            w2.append(_df(spark, [(8, 0.0)]))


class TestGeneratedColumns:
    def test_append_computes_absent_column(self, spark, tmp_path):
        root = _gen_table(spark, tmp_path, "ga")
        w = DeltaTableWriter(root)
        w.append(spark.createDataFrame([(5,)], "k long"))
        got = {r["k"]: r["k2"]
               for r in DeltaLogTable(root).snapshot(spark).collect()}
        assert got == {1: 2, 2: 4, 5: 10}

    def test_present_column_validates(self, spark, tmp_path):
        root = _gen_table(spark, tmp_path, "gv")
        w = DeltaTableWriter(root)
        with pytest.raises(ValueError, match="generated column k2"):
            w.append(spark.createDataFrame([(5, 99)], "k long, k2 long"))
        w.append(spark.createDataFrame([(5, 10)], "k long, k2 long"))
        assert DeltaLogTable(root).snapshot(spark).count() == 3

    def test_update_recomputes_from_source(self, spark, tmp_path):
        root = _gen_table(spark, tmp_path, "gu")
        w = DeltaTableWriter(root)
        w.update(spark, {"k": "k + 100"}, "k = 1")
        got = {r["k"]: r["k2"]
               for r in DeltaLogTable(root).snapshot(spark).collect()}
        assert got == {101: 202, 2: 4}
        # direct assignment to the generated column refuses
        with pytest.raises(ValueError, match="GENERATED"):
            w.update(spark, {"k2": "7"}, "k = 2")

    def test_cdf_postimages_carry_recomputed_values(
        self, spark, tmp_path
    ):
        root = _gen_table(spark, tmp_path, "gc")
        w = DeltaTableWriter(root)
        since = w.set_properties(
            {"delta.enableChangeDataFeed": "true"}, spark=spark)
        w.update(spark, {"k": "k + 100"}, "k = 1")
        feed = DeltaLogTable(root).changes_cdf(spark, since=since)
        rows = sorted(
            (r["k"], r["k2"], r["_change_type"]) for r in feed.collect()
        )
        assert rows == [(1, 2, "update_preimage"),
                        (101, 202, "update_postimage")]


def _identity_table(spark, tmp_path, name, allow="false", start=1, step=1):
    """Hand-written log declaring id GENERATED AS IDENTITY — the
    foreign-client shape (delta.identity.* in field metadata)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / name)
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "v": pa.array([10.0, 20.0], pa.float64())})
    pq.write_table(t, os.path.join(root, "f0.parquet"))
    sch = {"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True,
         "metadata": {"delta.identity.start": start,
                      "delta.identity.step": step,
                      "delta.identity.allowExplicitInsert": allow,
                      "delta.identity.highWaterMark": 2}},
        {"name": "v", "type": "double", "nullable": True,
         "metadata": {}},
    ]}
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        for a in [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 6}},
            {"metaData": {"id": name, "format": {"provider": "parquet"},
                          "schemaString": json.dumps(sch),
                          "partitionColumns": [], "configuration": {}}},
            {"add": {"path": "f0.parquet", "partitionValues": {},
                     "size": os.path.getsize(
                         os.path.join(root, "f0.parquet")),
                     "modificationTime": 0, "dataChange": True}},
        ]:
            f.write(json.dumps(a) + "\n")
    return root


def _hw_of(root):
    st = DeltaLogTable(root).table_schema()
    return st["id"].metadata["delta.identity.highWaterMark"]


class TestIdentityColumns:
    def test_append_allocates_and_advances_the_mark(
        self, spark, tmp_path
    ):
        root = _identity_table(spark, tmp_path, "ia")
        w = DeltaTableWriter(root)
        w.append(spark.createDataFrame([(30.0,), (40.0,)], "v double"))
        snap = DeltaLogTable(root).snapshot(spark)
        ids = sorted(r["id"] for r in snap.collect())
        assert len(ids) == 4 and len(set(ids)) == 4
        # generated values stay strictly past the recorded mark
        assert min(i for i in ids if i > 2) > 2
        hw = _hw_of(root)
        assert hw == max(ids)
        # the NEXT append continues past the advanced mark
        w.append(spark.createDataFrame([(50.0,)], "v double"))
        ids2 = sorted(
            r["id"]
            for r in DeltaLogTable(root).snapshot(spark).collect())
        assert len(set(ids2)) == 5 and max(ids2) > hw
        assert _hw_of(root) == max(ids2)

    def test_generated_always_refuses_explicit(self, spark, tmp_path):
        root = _identity_table(spark, tmp_path, "ig", allow="false")
        w = DeltaTableWriter(root)
        with pytest.raises(ValueError, match="GENERATED ALWAYS"):
            w.append(spark.createDataFrame(
                [(99, 9.0)], "id long, v double"))

    def test_by_default_explicit_extends_the_mark(self, spark, tmp_path):
        root = _identity_table(spark, tmp_path, "ib", allow="true")
        w = DeltaTableWriter(root)
        w.append(spark.createDataFrame([(50, 5.0)], "id long, v double"))
        assert _hw_of(root) == 50
        # a later generated value never collides with the explicit one
        w.append(spark.createDataFrame([(6.0,)], "v double"))
        ids = [r["id"]
               for r in DeltaLogTable(root).snapshot(spark).collect()]
        assert len(set(ids)) == 4 and max(ids) > 50

    def test_update_carries_merge_insert_refuses(self, spark, tmp_path):
        root = _identity_table(spark, tmp_path, "iu")
        w = DeltaTableWriter(root)
        w.update(spark, {"v": "v + 1"}, "id = 1")
        got = {r["id"]: r["v"]
               for r in DeltaLogTable(root).snapshot(spark).collect()}
        assert got == {1: 11.0, 2: 20.0}
        with pytest.raises(ValueError, match="IDENTITY"):
            w.update(spark, {"id": "7"}, "id = 2")
        with pytest.raises(NotImplementedError, match="identity"):
            w.merge(
                spark,
                spark.createDataFrame([(9, 9.0)], "mk long, mv double"),
                "t.id = s.mk", None, ["s.mk", "s.mv"],
            )

    def test_overwrite_preserves_declarations(self, spark, tmp_path):
        """A same-shape overwrite must carry the schemaString's field
        metadata VERBATIM — re-recording the batch's bare schema would
        strip the identity declaration (and every constraint)."""
        root = _identity_table(spark, tmp_path, "io", allow="true")
        w = DeltaTableWriter(root)
        w.overwrite(
            spark.createDataFrame([(7, 70.0)], "id long, v double"),
            w.latest_version() + 1,
        )
        st = DeltaLogTable(root).table_schema()
        assert "delta.identity.start" in st["id"].metadata
        assert _hw_of(root) == 7
        # identity allocation still works on the overwritten table
        w.append(spark.createDataFrame([(80.0,)], "v double"))
        ids = [r["id"]
               for r in DeltaLogTable(root).snapshot(spark).collect()]
        assert len(set(ids)) == 2 and max(ids) > 7
