"""Round 13: Delta columnMapping 'id' mode — reads AND copy-on-write
mutation (round-12 verdict, missing item 4).

'id' mode is what Spark's own writer emits under some configs: parquet
columns are matched by FIELD ID from the footers, never by name (a
rename rewrites zero files). The fixture is hand-written with pyarrow
— the parquet column names deliberately differ from BOTH the logical
names and the schema's physicalName hints, so a test can only pass if
the reader genuinely resolves by id. The refusal is narrowed to what
is genuinely unresolvable: parquet files carrying no field ids."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from algebraicdb_spark.operators.delta_writer import DeltaTableWriter
from algebraicdb_spark.operators.txnlog import DeltaLogTable

SCHEMA_STR = json.dumps({
    "type": "struct",
    "fields": [
        {"name": "k", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-k"}},
        {"name": "v", "type": "double", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-v"}},
    ],
})


def _id_table(tmp_path, name="idt", with_field_ids=True):
    """A hand-written 'id'-mode table whose ONE data file names its
    columns `weird_1`/`weird_2` — resolvable only through the footers'
    field ids (1→k, 2→v)."""
    root = str(tmp_path / name)
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    fields = [
        pa.field(
            "weird_1", pa.int64(),
            metadata={b"PARQUET:field_id": b"1"} if with_field_ids else None,
        ),
        pa.field(
            "weird_2", pa.float64(),
            metadata={b"PARQUET:field_id": b"2"} if with_field_ids else None,
        ),
    ]
    t = pa.table(
        [pa.array([1, 2, 3, 4]), pa.array([1.0, 2.0, 3.0, 4.0])],
        schema=pa.schema(fields),
    )
    full = os.path.join(root, "f0.parquet")
    pq.write_table(t, full)
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        for a in [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {"metaData": {
                "id": "idt", "format": {"provider": "parquet"},
                "schemaString": SCHEMA_STR, "partitionColumns": [],
                "configuration": {
                    "delta.columnMapping.mode": "id",
                    "delta.columnMapping.maxColumnId": "2",
                },
            }},
            {"add": {"path": "f0.parquet", "partitionValues": {},
                     "size": os.path.getsize(full),
                     "modificationTime": 0, "dataChange": True}},
        ]:
            f.write(json.dumps(a) + "\n")
    return root


class TestIdModeReads:
    def test_scan_resolves_by_field_id_not_name(self, spark, tmp_path):
        root = _id_table(tmp_path)
        snap = DeltaLogTable(root).snapshot(spark)
        assert snap.columns == ["k", "v"]
        got = sorted((r["k"], r["v"]) for r in snap.collect())
        assert got == [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)]

    def test_files_without_ids_refuse_loudly(self, spark, tmp_path):
        root = _id_table(tmp_path, name="noids", with_field_ids=False)
        with pytest.raises(NotImplementedError, match="no field ids"):
            DeltaLogTable(root).snapshot(spark).collect()

    def test_partial_id_map_refuses(self, spark, tmp_path):
        root = _id_table(tmp_path, name="partial")
        # strip one field's id from the schemaString
        p0 = os.path.join(root, "_delta_log", f"{0:020d}.json")
        lines = [json.loads(line) for line in open(p0) if line.strip()]
        for a in lines:
            if "metaData" in a:
                sch = json.loads(a["metaData"]["schemaString"])
                sch["fields"][1]["metadata"].pop("delta.columnMapping.id")
                a["metaData"]["schemaString"] = json.dumps(sch)
        with open(p0, "w") as f:
            f.write("\n".join(json.dumps(a) for a in lines) + "\n")
        with pytest.raises(NotImplementedError, match="carry no"):
            DeltaLogTable(root).snapshot(spark)


class TestIdModeWrites:
    def test_cow_delete_round_trips(self, spark, tmp_path):
        root = _id_table(tmp_path)
        w = DeltaTableWriter(root)
        res = w.delete(spark, "k IN (2, 3)")
        assert res["rows_deleted"] == 2
        snap = DeltaLogTable(root).snapshot(spark)
        assert sorted(r["k"] for r in snap.collect()) == [1, 4]
        # the staged rewrite is id-resolvable: physical names from the
        # schema's physicalName hints AND footers carrying field ids
        acts = [
            json.loads(line)
            for line in open(os.path.join(
                root, "_delta_log", f"{res['version']:020d}.json"))
            if line.strip()
        ]
        added = [a["add"]["path"] for a in acts if "add" in a]
        assert added
        sch = pq.ParquetFile(
            os.path.join(root, added[0])
        ).schema_arrow
        assert sch.names == ["col-k", "col-v"]
        ids = {
            f.name: (f.metadata or {}).get(b"PARQUET:field_id")
            for f in sch
        }
        assert ids == {"col-k": b"1", "col-v": b"2"}

    def test_cow_update_round_trips(self, spark, tmp_path):
        root = _id_table(tmp_path, name="upd")
        w = DeltaTableWriter(root)
        res = w.update(spark, {"v": "v * 10"}, "k = 1")
        assert res["rows_updated"] == 1
        got = {
            r["k"]: r["v"]
            for r in DeltaLogTable(root).snapshot(spark).collect()
        }
        assert got == {1: 10.0, 2: 2.0, 3: 3.0, 4: 4.0}

    def test_append_and_merge_round_trip(self, spark, tmp_path):
        root = _id_table(tmp_path, name="mrg")
        w = DeltaTableWriter(root)
        w.append(spark.createDataFrame([(9, 9.0)], "k long, v double"))
        assert DeltaLogTable(root).snapshot(spark).count() == 5
        res = w.merge(
            spark,
            spark.createDataFrame([(9, 90.0), (10, 100.0)],
                                  "k long, v double"),
            "t.k = s.k",
            assignments={"v": "s.v"},
            insert_exprs=["s.k", "s.v"],
        )
        assert res["rows_matched"] == 1 and res["rows_inserted"] == 1
        got = {
            r["k"]: r["v"]
            for r in DeltaLogTable(root).snapshot(spark).collect()
        }
        assert got[9] == 90.0 and got[10] == 100.0

    def test_missing_physical_name_refuses_writes_only(
        self, spark, tmp_path
    ):
        root = _id_table(tmp_path, name="nophys")
        p0 = os.path.join(root, "_delta_log", f"{0:020d}.json")
        lines = [json.loads(line) for line in open(p0) if line.strip()]
        for a in lines:
            if "metaData" in a:
                sch = json.loads(a["metaData"]["schemaString"])
                for f in sch["fields"]:
                    f["metadata"].pop("delta.columnMapping.physicalName")
                a["metaData"]["schemaString"] = json.dumps(sch)
        with open(p0, "w") as f:
            f.write("\n".join(json.dumps(a) for a in lines) + "\n")
        # reads never need physicalName — ids come from the footers
        assert DeltaLogTable(root).snapshot(spark).count() == 4
        # writes do (staged columns must be NAMED something stable)
        with pytest.raises(NotImplementedError, match="physicalName"):
            DeltaTableWriter(root).delete(spark, "k = 1")

    def test_cdf_on_id_mapped_table(self, spark, tmp_path):
        """columnMapping 'id' + enableChangeDataFeed compose: the cdc
        file stages under physical names WITH field ids, and the feed
        reads back logical."""
        root = _id_table(tmp_path, name="idcdf")
        p0 = os.path.join(root, "_delta_log", f"{0:020d}.json")
        lines = [json.loads(line) for line in open(p0) if line.strip()]
        for a in lines:
            if "metaData" in a:
                a["metaData"]["configuration"][
                    "delta.enableChangeDataFeed"] = "true"
            if "protocol" in a:
                a["protocol"]["minWriterVersion"] = 5
        with open(p0, "w") as f:
            f.write("\n".join(json.dumps(a) for a in lines) + "\n")
        w = DeltaTableWriter(root)
        res = w.delete(spark, "k = 4")
        feed = DeltaLogTable(root).changes_cdf(
            spark, since=res["version"] - 1, to=res["version"]
        )
        assert sorted(
            tuple(r)
            for r in feed.select("k", "v", "_change_type").collect()
        ) == [(4, 4.0, "delete")]
