"""Round 13: Iceberg format-version 3 — reads accepted, writes gated.

v3 (rolling out across engines) adds row lineage (next-row-id /
first-row-id), default column values, and deletion vectors in Puffin
blobs. None of the additive metadata changes how manifests resolve to
parquet paths, so scans and time travel work unchanged; what a v3
table can carry that this reader must NOT misread is a deletion
vector — scanning around one resurrects deleted rows — so Puffin
delete entries refuse loudly with a specific message. Writes refuse:
committing v2-shaped snapshots would drop the row-lineage bookkeeping
v3 readers rely on (round-12 verdict, missing item 5)."""

import json
import os
import uuid

import pytest

# Heavyweight lakehouse interop e2e tier: excluded from the
# default pytest run (see pyproject [tool.pytest.ini_options]);
# run explicitly with `pytest -m interop`.
pytestmark = pytest.mark.interop

from algebraicdb_spark.operators.iceberg import IcebergTable
from algebraicdb_spark.operators.iceberg_writer import (
    AvroFileWriter,
    IcebergTableWriter,
    _MANIFEST_LIST_SCHEMA,
    _manifest_schema,
)


def _v3_table(spark, tmp_path, name="v3"):
    """A two-snapshot table written by this engine's v2 writer, then
    hand-upgraded to format-version 3 the way a full client's upgrade
    leaves it (additive metadata only — no DVs yet)."""
    root = str(tmp_path / name)
    w = IcebergTableWriter(root)
    w.append(spark.createDataFrame(
        [(i, float(i)) for i in range(4)], "k long, v double",
    ).coalesce(1))
    w.append(spark.createDataFrame(
        [(10 + i, 10.0 + i) for i in range(3)], "k long, v double",
    ).coalesce(1))
    base_v, cur = w._current()
    md = dict(cur)
    md["format-version"] = 3
    md["next-row-id"] = 7
    md["row-lineage"] = True
    with open(
        os.path.join(w.meta_dir, f"v{base_v + 1}.metadata.json"), "w"
    ) as f:
        json.dump(md, f)
    with open(os.path.join(w.meta_dir, "version-hint.text"), "w") as f:
        f.write(str(base_v + 1))
    return w


class TestV3Reads:
    def test_scan_and_time_travel(self, spark, tmp_path):
        w = _v3_table(spark, tmp_path)
        t = IcebergTable(w.path)
        assert t.meta["format-version"] == 3
        assert t.snapshot(spark).count() == 7
        first = t.snapshots()[0]["snapshot-id"]
        assert t.snapshot(spark, snapshot_id=first).count() == 4

    def test_live_paths_and_pruning(self, spark, tmp_path):
        w = _v3_table(spark, tmp_path)
        t = IcebergTable(w.path)
        assert len(t.live_paths()) == 2
        kept = t.live_paths(skip=[("k", 10, 12)])
        assert len(kept) == 1

    def test_v4_still_refuses(self, spark, tmp_path):
        w = _v3_table(spark, tmp_path, name="v4")
        base_v, cur = w._current()
        md = dict(cur)
        md["format-version"] = 4
        with open(
            os.path.join(w.meta_dir, f"v{base_v + 1}.metadata.json"),
            "w",
        ) as f:
            json.dump(md, f)
        with open(
            os.path.join(w.meta_dir, "version-hint.text"), "w"
        ) as f:
            f.write(str(base_v + 1))
        with pytest.raises(NotImplementedError, match="format-version 4"):
            IcebergTable(w.path)


class TestV3DeletionVectors:
    def test_puffin_data_file_still_refuses(
        self, spark, tmp_path
    ):
        """DV position deletes DECODE since round 14
        (tests/test_round14_iceberg_dv.py); what remains refused is a
        puffin file in a spot the spec gives no meaning — here, as a
        DATA file."""
        w = _v3_table(spark, tmp_path, name="dv")
        rdr = IcebergTable(w.path)
        base_v, cur = w._current()
        snap = rdr._snapshot(None)
        seq = int(cur["last-sequence-number"]) + 1
        sid = snap["snapshot-id"] + 1
        # a deletion-vector entry: content=1 (position delete) whose
        # file is a Puffin blob — the v3 shape
        dv_m = os.path.join(w.meta_dir, f"m-dv-{uuid.uuid4().hex}.avro")
        AvroFileWriter.write(dv_m, _manifest_schema([]), [{
            "status": 1, "snapshot_id": sid,
            "sequence_number": seq, "file_sequence_number": seq,
            "data_file": {
                "content": 0,
                "file_path": os.path.join(w.path, "data", "dv.puffin"),
                "file_format": "PUFFIN",
                "partition": {}, "record_count": 2,
                "file_size_in_bytes": 64,
                "lower_bounds": None, "upper_bounds": None,
            },
        }])
        from algebraicdb_spark.operators.iceberg import AvroFileReader

        carried = [
            dict(r) for r in AvroFileReader(
                rdr._resolve(snap["manifest-list"])
            ).records
        ]
        ml = os.path.join(w.meta_dir, f"snap-{sid}-{uuid.uuid4().hex}.avro")
        AvroFileWriter.write(ml, _MANIFEST_LIST_SCHEMA, carried + [{
            "manifest_path": dv_m,
            "manifest_length": os.path.getsize(dv_m),
            "partition_spec_id": 0, "content": 0,
            "sequence_number": seq, "min_sequence_number": seq,
            "added_snapshot_id": sid,
            "added_files_count": 1, "existing_files_count": 0,
            "deleted_files_count": 0, "added_rows_count": 2,
            "existing_rows_count": 0, "deleted_rows_count": 0,
        }])
        md = dict(cur)
        md["last-sequence-number"] = seq
        md["current-snapshot-id"] = sid
        md["snapshots"] = list(cur["snapshots"]) + [{
            "snapshot-id": sid, "sequence-number": seq,
            "timestamp-ms": 99, "manifest-list": ml,
            "summary": {"operation": "delete"},
        }]
        with open(
            os.path.join(w.meta_dir, f"v{base_v + 1}.metadata.json"),
            "w",
        ) as f:
            json.dump(md, f)
        with open(
            os.path.join(w.meta_dir, "version-hint.text"), "w"
        ) as f:
            f.write(str(base_v + 1))
        with pytest.raises(NotImplementedError, match="puffin data"):
            IcebergTable(w.path).snapshot(spark)
        # time travel BELOW the DV snapshot still reads fine
        first = md["snapshots"][0]["snapshot-id"]
        assert IcebergTable(w.path).snapshot(
            spark, snapshot_id=first
        ).count() == 4


class TestV3WriteGate:
    def test_lineage_safe_envelope(self, spark, tmp_path):
        """Round 14 second half: UPDATE (DV preimages + postimages
        with preserved _row_id) and OPTIMIZE (lineage-materializing
        compaction) work on v3 too — only an EXPLICIT mode='cow' row
        rewrite, which would re-identify rows without
        materialization, still refuses, leaking nothing."""
        w = _v3_table(spark, tmp_path, name="wg")
        pre = [
            f for f in os.listdir(os.path.join(w.path, "data"))
            if f.endswith(".parquet")
        ]
        with pytest.raises(NotImplementedError, match="rewrites"):
            w.delete(spark, "k = 1", mode="cow")
        with pytest.raises(NotImplementedError, match="rewrites"):
            w.update(spark, {"v": "v + 1"}, "k = 1", mode="cow")
        # nothing leaked into the table dir from the refused rewrites
        staged = [
            f for f in os.listdir(os.path.join(w.path, "data"))
            if f.endswith(".parquet")
        ]
        assert staged == pre
        res = w.update(spark, {"v": "v + 1"}, "k = 1")
        assert res["rows_updated"] == 1
        assert w.optimize(spark) is not None
        got = {r["k"]: r["v"]
               for r in IcebergTable(w.path).snapshot(spark).collect()}
        assert got[1] == 2.0 and len(got) == 7
