"""Round 14: partitioned + NESTED column-mapped Delta tables (the
round-13 verdict's missing item 1 — "every partitioned prod table that
ever ran RENAME COLUMN is this shape").

Fixtures are hand-written (pyarrow + raw JSON log), never produced by
the code under test: the parquet files carry PHYSICAL column names at
every depth ('name' mode) or arbitrary names + field ids ('id' mode),
partition columns are absent from the files, the log's
metaData.partitionColumns carry LOGICAL names and each add's
partitionValues are keyed by PHYSICAL name — Delta's convention for
mapped tables. A test can only pass if the reader genuinely rewrites
nested names / resolves nested ids AND normalizes the partition
spaces; reading raw would surface all-NULL structs and drop the
partition column entirely.
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from algebraicdb_spark.operators.delta_writer import DeltaTableWriter
from algebraicdb_spark.operators.txnlog import DeltaLogTable


def _field_meta(mode: str, phys: str, fid: int) -> dict:
    md = {"delta.columnMapping.physicalName": phys,
          "delta.columnMapping.id": fid}
    return md


def _schema_str(mode: str) -> str:
    return json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": _field_meta(mode, "col-k", 1)},
            {"name": "s", "nullable": True,
             "metadata": _field_meta(mode, "col-s", 2),
             "type": {
                 "type": "struct",
                 "fields": [
                     {"name": "a", "type": "long", "nullable": True,
                      "metadata": _field_meta(mode, "col-a", 11)},
                     {"name": "b", "type": "string", "nullable": True,
                      "metadata": _field_meta(mode, "col-b", 12)},
                 ],
             }},
            {"name": "p", "type": "string", "nullable": True,
             "metadata": _field_meta(mode, "col-p", 3)},
        ],
    })


def _data_schema(mode: str) -> pa.Schema:
    """The DATA file schema (partition column absent). 'name' mode
    names columns by physicalName; 'id' mode uses names matching
    NEITHER logical nor physicalName, resolvable only by field id."""
    if mode == "name":
        names = ("col-k", "col-s", "col-a", "col-b")
        ids = (None,) * 4
    else:
        names = ("weird_k", "weird_s", "weird_a", "weird_b")
        ids = (b"1", b"2", b"11", b"12")

    def f(name, typ, fid):
        md = {b"PARQUET:field_id": fid} if fid else None
        return pa.field(name, typ, metadata=md)

    inner = pa.struct([f(names[2], pa.int64(), ids[2]),
                       f(names[3], pa.string(), ids[3])])
    return pa.schema([f(names[0], pa.int64(), ids[0]),
                      f(names[1], inner, ids[1])])


def _cm_table(tmp_path, mode: str, name: str, pv_keys: str = "physical",
              extra_conf: dict | None = None) -> str:
    """Two partitions (p=x: k 1,2; p=y: k 3,4), nested struct payload
    s = {a: 10k, b: 'b<k>'}."""
    root = str(tmp_path / name)
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    sch = _data_schema(mode)
    adds = []
    for pval, ks in (("x", [1, 2]), ("y", [3, 4])):
        rel = f"part_{pval}/f0.parquet"
        os.makedirs(os.path.join(root, f"part_{pval}"))
        t = pa.table(
            [pa.array(ks),
             pa.array([{sch.field(1).type.field(0).name: 10 * k,
                        sch.field(1).type.field(1).name: f"b{k}"}
                       for k in ks], type=sch.field(1).type)],
            schema=sch,
        )
        full = os.path.join(root, rel)
        pq.write_table(t, full)
        key = "col-p" if pv_keys == "physical" else "p"
        adds.append({"add": {
            "path": rel, "partitionValues": {key: pval},
            "size": os.path.getsize(full),
            "modificationTime": 0, "dataChange": True,
        }})
    conf = {"delta.columnMapping.mode": mode,
            "delta.columnMapping.maxColumnId": "12"}
    conf.update(extra_conf or {})
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        for a in [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {"metaData": {
                "id": name, "format": {"provider": "parquet"},
                "schemaString": _schema_str(mode),
                "partitionColumns": ["p"],
                "configuration": conf,
            }},
            *adds,
        ]:
            f.write(json.dumps(a) + "\n")
    return root


EXPECT = {1: (10, "b1", "x"), 2: (20, "b2", "x"),
          3: (30, "b3", "y"), 4: (40, "b4", "y")}


def _snap_dict(spark, root):
    snap = DeltaLogTable(root).snapshot(spark)
    assert snap.columns == ["k", "s", "p"]
    return {r["k"]: (r["s"]["a"], r["s"]["b"], r["p"])
            for r in snap.collect()}


class TestMappedPartitionedNestedReads:
    @pytest.mark.parametrize("mode", ["name", "id"])
    def test_scan_rewrites_nested_and_partitions(self, spark, tmp_path, mode):
        root = _cm_table(tmp_path, mode, f"t_{mode}")
        assert _snap_dict(spark, root) == EXPECT

    @pytest.mark.parametrize("mode", ["name", "id"])
    def test_logical_partition_value_keys_also_read(
        self, spark, tmp_path, mode
    ):
        # foreign writers disagree on the partitionValues key space —
        # the reader accepts the logical key as a fallback
        root = _cm_table(tmp_path, mode, f"tl_{mode}", pv_keys="logical")
        assert _snap_dict(spark, root) == EXPECT

    def test_no_mapping_hints_leak_into_result_schema(self, spark, tmp_path):
        root = _cm_table(tmp_path, "name", "leak")
        js = DeltaLogTable(root).snapshot(spark).schema.json()
        assert "columnMapping" not in js and "parquet.field.id" not in js

    def test_partial_nested_map_refuses(self, spark, tmp_path):
        root = _cm_table(tmp_path, "name", "partial")
        p0 = os.path.join(root, "_delta_log", f"{0:020d}.json")
        lines = [json.loads(line) for line in open(p0) if line.strip()]
        for a in lines:
            if "metaData" in a:
                sch = json.loads(a["metaData"]["schemaString"])
                sch["fields"][1]["type"]["fields"][0]["metadata"].pop(
                    "delta.columnMapping.physicalName")
                a["metaData"]["schemaString"] = json.dumps(sch)
        with open(p0, "w") as f:
            f.write("\n".join(json.dumps(a) for a in lines) + "\n")
        with pytest.raises(NotImplementedError, match=r"s\.a"):
            DeltaLogTable(root).snapshot(spark)

    def test_unresolvable_partition_column_refuses(self, spark, tmp_path):
        root = _cm_table(tmp_path, "name", "badpart")
        p0 = os.path.join(root, "_delta_log", f"{0:020d}.json")
        lines = [json.loads(line) for line in open(p0) if line.strip()]
        for a in lines:
            if "metaData" in a:
                a["metaData"]["partitionColumns"] = ["ghost"]
        with open(p0, "w") as f:
            f.write("\n".join(json.dumps(a) for a in lines) + "\n")
        with pytest.raises(NotImplementedError, match="ghost"):
            DeltaLogTable(root).snapshot(spark)


class TestMappedPartitionedNestedWrites:
    @pytest.mark.parametrize("mode", ["name", "id"])
    def test_cow_delete_across_partitions(self, spark, tmp_path, mode):
        root = _cm_table(tmp_path, mode, f"d_{mode}")
        w = DeltaTableWriter(root)
        res = w.delete(spark, "k IN (2, 3)")
        assert res["rows_deleted"] == 2
        got = _snap_dict(spark, root)
        assert got == {1: EXPECT[1], 4: EXPECT[4]}
        # staged rewrites: physical names at every depth, partition
        # values keyed physical, partition column NOT in the file
        acts = [json.loads(line) for line in open(os.path.join(
            root, "_delta_log", f"{res['version']:020d}.json"))
            if line.strip()]
        added = [a["add"] for a in acts if "add" in a]
        assert added and all(
            a["partitionValues"] in ({"col-p": "x"}, {"col-p": "y"})
            for a in added
        )
        from urllib.parse import unquote

        sch = pq.ParquetFile(
            os.path.join(root, unquote(added[0]["path"]))).schema_arrow
        top = set(sch.names)
        assert "col-k" in top or mode == "id"
        inner = sch.field(1) if sch.field(1).type.num_fields else None
        if mode == "name":
            assert sch.names == ["col-k", "col-s"]
            assert [f.name for f in sch.field("col-s").flatten()] == [
                "col-s.col-a", "col-s.col-b"]
        else:
            ids = {}

            def walk(fld):
                ids[fld.name] = (fld.metadata or {}).get(
                    b"PARQUET:field_id")
                if pa.types.is_struct(fld.type):
                    for i in range(fld.type.num_fields):
                        walk(fld.type.field(i))
            for fld in sch:
                walk(fld)
            assert set(ids.values()) == {b"1", b"2", b"11", b"12"}

    @pytest.mark.parametrize("mode", ["name", "id"])
    def test_cow_update_with_nested_predicate(self, spark, tmp_path, mode):
        root = _cm_table(tmp_path, mode, f"u_{mode}")
        w = DeltaTableWriter(root)
        res = w.update(spark, {"k": "k + 100"}, "s.a >= 30")
        assert res["rows_updated"] == 2
        got = _snap_dict(spark, root)
        assert got == {1: EXPECT[1], 2: EXPECT[2],
                       103: EXPECT[3], 104: EXPECT[4]}

    @pytest.mark.parametrize("mode", ["name", "id"])
    def test_append_round_trips(self, spark, tmp_path, mode):
        root = _cm_table(tmp_path, mode, f"a_{mode}")
        w = DeltaTableWriter(root)
        w.append(spark.createDataFrame(
            [(9, (90, "b9"), "z")],
            "k long, s struct<a:long, b:string>, p string"))
        got = _snap_dict(spark, root)
        assert got[9] == (90, "b9", "z") and len(got) == 5

    @pytest.mark.parametrize("mode", ["name", "id"])
    def test_optimize_compacts_mapped_partitions(self, spark, tmp_path, mode):
        root = _cm_table(tmp_path, mode, f"o_{mode}")
        w = DeltaTableWriter(root)
        w.append(spark.createDataFrame(
            [(5, (50, "b5"), "x")],
            "k long, s struct<a:long, b:string>, p string"))
        res = w.optimize(spark)
        assert res is not None
        got = _snap_dict(spark, root)
        assert got[5] == (50, "b5", "x") and len(got) == 5

    @pytest.mark.parametrize("mode", ["name", "id"])
    def test_alter_add_column_assigns_fresh_mapping(
        self, spark, tmp_path, mode
    ):
        """ALTER ADD COLUMN on a mapped table (round-13 verdict item
        6): fresh physicalName + next field id, maxColumnId bumped in
        the same commit, old files NULL-backfill, and a follow-up
        append lands the new column physically."""
        root = _cm_table(tmp_path, mode, f"e_{mode}")
        w = DeltaTableWriter(root)
        v = w.evolve_add_column("score", "double")
        acts = [json.loads(line) for line in open(os.path.join(
            root, "_delta_log", f"{v:020d}.json")) if line.strip()]
        md = next(a["metaData"] for a in acts if "metaData" in a)
        assert md["configuration"]["delta.columnMapping.maxColumnId"] == "13"
        new_f = json.loads(md["schemaString"])["fields"][-1]
        assert new_f["name"] == "score"
        assert new_f["metadata"]["delta.columnMapping.id"] == 13
        assert new_f["metadata"][
            "delta.columnMapping.physicalName"].startswith("col-")
        snap = DeltaLogTable(root).snapshot(spark)
        assert snap.columns == ["k", "s", "p", "score"]
        assert all(r["score"] is None for r in snap.collect())
        w.append(spark.createDataFrame(
            [(9, (90, "b9"), "z", 0.5)],
            "k long, s struct<a:long, b:string>, p string, score double"))
        got = {r["k"]: r["score"]
               for r in DeltaLogTable(root).snapshot(spark).collect()}
        assert got[9] == 0.5 and got[1] is None

    def test_alter_add_nested_column_stamps_subfields(
        self, spark, tmp_path
    ):
        root = _cm_table(tmp_path, "name", "en")
        w = DeltaTableWriter(root)
        v = w.evolve_add_column("m", "struct<x: long, y: string>")
        acts = [json.loads(line) for line in open(os.path.join(
            root, "_delta_log", f"{v:020d}.json")) if line.strip()]
        md = next(a["metaData"] for a in acts if "metaData" in a)
        new_f = json.loads(md["schemaString"])["fields"][-1]
        sub_ids = [sf["metadata"]["delta.columnMapping.id"]
                   for sf in new_f["type"]["fields"]]
        all_ids = sorted(sub_ids + [new_f["metadata"][
            "delta.columnMapping.id"]])
        assert all_ids == [13, 14, 15]
        assert md["configuration"][
            "delta.columnMapping.maxColumnId"] == "15"
        # the widened table still reads (totality gates pass) and the
        # new nested column NULL-backfills
        snap = DeltaLogTable(root).snapshot(spark)
        assert all(r["m"] is None for r in snap.collect())

    @pytest.mark.parametrize("mode", ["name", "id"])
    def test_cdf_over_mapped_partitioned_mutations(
        self, spark, tmp_path, mode
    ):
        root = _cm_table(tmp_path, mode, f"c_{mode}",
                         extra_conf={"delta.enableChangeDataFeed": "true"})
        w = DeltaTableWriter(root)
        res = w.delete(spark, "s.a = 20")
        feed = DeltaLogTable(root).changes_cdf(spark, res["version"] - 1)
        rows = [(r["k"], r["s"]["a"], r["p"], r["_change_type"])
                for r in feed.collect()]
        assert rows == [(2, 20, "x", "delete")]
        # the cdc file itself is in physical space
        acts = [json.loads(line) for line in open(os.path.join(
            root, "_delta_log", f"{res['version']:020d}.json"))
            if line.strip()]
        cdcs = [a["cdc"] for a in acts if "cdc" in a]
        assert cdcs and all(
            c["path"].startswith("_change_data/") for c in cdcs)
