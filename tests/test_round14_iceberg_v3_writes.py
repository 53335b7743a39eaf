"""Round 14: Iceberg format-version 3 WRITES (round-13 verdict missing
item 3) — the shapes whose row lineage this writer maintains
faithfully:

- appends / CTAS-on-v3 assign row ids: the snapshot records
  ``first-row-id``, each added data file records an EXPLICIT
  ``first_row_id``, the manifest-list row carries the range start,
  and the table's ``next-row-id`` advances by the added row count;
- DELETE writes Puffin deletion vectors (v3's native delete — v3
  forbids new position-delete files), REPLACING each touched file's
  vector with the superset union per the one-DV-per-file rule;
- keyed upserts ride equality deletes + a lineage-assigned data batch;
- metadata-only commits carry the lineage state through verbatim;
- UPDATE rides deletion-vectored preimages + postimages staged with
  PRESERVED ``_row_id`` (round 14 second half), OPTIMIZE materializes
  row lineage into the compacted files — only EXPLICIT mode='cow' row
  rewrites (no materialization) still refuse.
"""

import json
import os

import pytest

# Heavyweight lakehouse interop e2e tier: excluded from the
# default pytest run (see pyproject [tool.pytest.ini_options]);
# run explicitly with `pytest -m interop`.
pytestmark = pytest.mark.interop

from algebraicdb_spark.operators.deletion_vectors import puffin_dvs
from algebraicdb_spark.operators.iceberg import (
    AvroFileReader,
    IcebergTable,
)
from algebraicdb_spark.operators.iceberg_writer import IcebergTableWriter


def _v3_table(spark, tmp_path, name, rows=4):
    root = str(tmp_path / name)
    w = IcebergTableWriter(root)
    w.append(spark.createDataFrame(
        [(i, float(i)) for i in range(rows)], "k long, v double",
    ).coalesce(1))
    base_v, cur = w._current()
    md = dict(cur)
    md["format-version"] = 3
    md["next-row-id"] = rows
    with open(os.path.join(w.meta_dir, f"v{base_v + 1}.metadata.json"),
              "w") as f:
        json.dump(md, f)
    with open(os.path.join(w.meta_dir, "version-hint.text"), "w") as f:
        f.write(str(base_v + 1))
    return w


def _current_snap(t):
    cur = t.meta
    return next(s for s in cur["snapshots"]
                if s["snapshot-id"] == cur["current-snapshot-id"])


class TestV3AppendLineage:
    def test_append_assigns_row_ids(self, spark, tmp_path):
        w = _v3_table(spark, tmp_path, "a")
        w.append(spark.createDataFrame(
            [(10 + i, 10.0 + i) for i in range(3)], "k long, v double",
        ).repartition(2))
        t = IcebergTable(w.path)
        assert t.meta["format-version"] == 3
        assert int(t.meta["next-row-id"]) == 7
        snap = _current_snap(t)
        assert int(snap["first-row-id"]) == 4
        # per-file explicit first_row_id, cumulative in range [4, 7)
        ml = AvroFileReader(t._resolve(snap["manifest-list"])).records
        new_rows = [r for r in ml if r["added_snapshot_id"]
                    == snap["snapshot-id"]]
        assert new_rows and new_rows[0]["first_row_id"] == 4
        entries = AvroFileReader(
            t._resolve(new_rows[0]["manifest_path"])).records
        firsts = sorted(
            (e["data_file"]["first_row_id"],
             e["data_file"]["record_count"])
            for e in entries
        )
        cursor = 4
        for fr, rc in firsts:
            assert fr == cursor
            cursor += rc
        assert cursor == 7
        assert t.snapshot(spark).count() == 7

    def test_second_append_continues_the_range(self, spark, tmp_path):
        w = _v3_table(spark, tmp_path, "b")
        w.append(spark.createDataFrame([(10, 10.0)], "k long, v double"))
        w.append(spark.createDataFrame([(11, 11.0)], "k long, v double"))
        t = IcebergTable(w.path)
        assert int(t.meta["next-row-id"]) == 6
        assert int(_current_snap(t)["first-row-id"]) == 5

    def test_metadata_commit_preserves_lineage_state(
        self, spark, tmp_path
    ):
        w = _v3_table(spark, tmp_path, "m")
        w.set_properties({"owner": "x"})
        t = IcebergTable(w.path)
        assert t.meta["format-version"] == 3
        assert int(t.meta["next-row-id"]) == 4
        assert t.meta["properties"]["owner"] == "x"

    def test_v4_still_refuses(self, spark, tmp_path):
        w = _v3_table(spark, tmp_path, "v4")
        base_v, cur = w._current()
        md = dict(cur)
        md["format-version"] = 4
        with open(os.path.join(
            w.meta_dir, f"v{base_v + 1}.metadata.json"), "w",
        ) as f:
            json.dump(md, f)
        with open(os.path.join(w.meta_dir, "version-hint.text"),
                  "w") as f:
            f.write(str(base_v + 1))
        with pytest.raises(NotImplementedError, match="format-version 4"):
            w.append(spark.createDataFrame([(9, 9.0)],
                                           "k long, v double"))


class TestV3DvDeletes:
    def test_delete_writes_a_puffin_dv(self, spark, tmp_path):
        w = _v3_table(spark, tmp_path, "d")
        res = w.delete(spark, "k IN (1, 3)")
        assert res["rows_deleted"] == 2
        t = IcebergTable(w.path)
        assert sorted(r["k"] for r in t.snapshot(spark).collect()) == [
            0, 2]
        data, pos_d, eq_d, dvs = t._files(None)
        assert not pos_d and not eq_d and len(dvs) == 1
        fpath, ref, off, sz = dvs[0]
        assert fpath.endswith(".puffin") and ref and off is not None
        # the blob index agrees with the manifest address
        assert puffin_dvs(fpath) == {ref: [1, 3]}
        # row count unchanged in lineage terms
        assert int(t.meta["next-row-id"]) == 4
        assert int(_current_snap(t)["first-row-id"]) == 4

    def test_second_delete_unions_the_vector(self, spark, tmp_path):
        w = _v3_table(spark, tmp_path, "u")
        w.delete(spark, "k = 1")
        res2 = w.delete(spark, "k = 2")
        assert res2["rows_deleted"] == 1  # k=1 already gone, not double
        t = IcebergTable(w.path)
        assert sorted(r["k"] for r in t.snapshot(spark).collect()) == [
            0, 3]
        _d, _p, _e, dvs = t._files(None)
        assert len(dvs) == 1  # ONE live DV for the file — superset
        assert puffin_dvs(dvs[0][0])[dvs[0][1]] == [1, 2]

    def test_delete_feeds_changes_cdf(self, spark, tmp_path):
        w = _v3_table(spark, tmp_path, "c")
        pre = IcebergTable(w.path).current_snapshot_id()
        w.delete(spark, "k = 1")
        res2 = w.delete(spark, "k = 3")
        t = IcebergTable(w.path)
        feed = t.changes_cdf(spark, pre)
        assert sorted(
            (r["k"], r["_change_type"]) for r in feed.collect()
        ) == [(1, "delete"), (3, "delete")]
        # the second window alone sees only the flip
        feed2 = t.changes_cdf(spark, res2["version"] - 1)
        assert [(r["k"], r["_change_type"]) for r in feed2.collect()] \
            == [(3, "delete")]

    def test_matched_nothing_is_a_no_op(self, spark, tmp_path):
        w = _v3_table(spark, tmp_path, "n")
        res = w.delete(spark, "k = 99")
        assert res == {"version": None, "rows_deleted": 0,
                       "delete_files": 0}

    def test_multi_file_delete_one_puffin(self, spark, tmp_path):
        w = _v3_table(spark, tmp_path, "mf")
        w.append(spark.createDataFrame(
            [(10 + i, 10.0 + i) for i in range(3)], "k long, v double",
        ).coalesce(1))
        res = w.delete(spark, "k IN (0, 11)")
        assert res["rows_deleted"] == 2 and res["delete_files"] == 1
        t = IcebergTable(w.path)
        assert sorted(r["k"] for r in t.snapshot(spark).collect()) == [
            1, 2, 3, 10, 12]
        _d, _p, _e, dvs = t._files(None)
        assert len(dvs) == 2  # one vector per touched data file
        assert len({f for f, _r, _o, _s in dvs}) == 1  # one shared blob


class TestV3Upserts:
    def test_upsert_assigns_lineage_to_the_batch(self, spark, tmp_path):
        w = _v3_table(spark, tmp_path, "up")
        res = w.upsert_by_key(
            spark,
            spark.createDataFrame([(1, 100.0), (9, 9.0)],
                                  "k long, v double"),
            ["k"],
        )
        assert res["version"] is not None
        t = IcebergTable(w.path)
        got = {r["k"]: r["v"] for r in t.snapshot(spark).collect()}
        assert got[1] == 100.0 and got[9] == 9.0 and len(got) == 5
        assert int(t.meta["next-row-id"]) == 6  # +2 batch rows
        assert int(_current_snap(t)["first-row-id"]) == 4


class TestUpgradeFormatVersion:
    def test_upgrade_then_append_and_dv_delete(self, spark, tmp_path):
        """The metadata-only 2 -> 3 upgrade: pre-upgrade files keep
        null lineage, next-row-id starts at 0, post-upgrade appends
        assign from there, and DELETE takes the DV path."""
        root = str(tmp_path / "up")
        w = IcebergTableWriter(root)
        w.append(spark.createDataFrame(
            [(i, float(i)) for i in range(4)], "k long, v double",
        ).coalesce(1))
        v = w.upgrade_format_version(3)
        _bv, cur = w._current()
        assert cur["format-version"] == 3
        assert cur["next-row-id"] == 0
        assert w.upgrade_format_version(3) == v  # no-op, same head
        w.append(spark.createDataFrame(
            [(10, 10.0), (11, 11.0)], "k long, v double").coalesce(1))
        _bv, cur = w._current()
        assert cur["next-row-id"] == 2  # the new batch's rows only
        res = w.delete(spark, "k = 1")
        assert res["rows_deleted"] == 1 and res["delete_files"] == 1
        got = sorted(
            r["k"] for r in IcebergTable(root).snapshot(spark).collect())
        assert got == [0, 2, 3, 10, 11]

    def test_v1_and_downgrade_refuse(self, spark, tmp_path):
        root = str(tmp_path / "v1")
        w = IcebergTableWriter(root)
        w.append(spark.createDataFrame(
            [(1, 1.0)], "k long, v double").coalesce(1))
        base_v, cur = w._current()
        md = dict(cur)
        md["format-version"] = 1
        with open(os.path.join(w.meta_dir,
                               f"v{base_v + 1}.metadata.json"), "w") as f:
            json.dump(md, f)
        with open(os.path.join(w.meta_dir, "version-hint.text"), "w") as f:
            f.write(str(base_v + 1))
        with pytest.raises(NotImplementedError, match="2 -> 3"):
            w.upgrade_format_version(3)
        root2 = str(tmp_path / "dn")
        w2 = IcebergTableWriter(root2)
        w2.append(spark.createDataFrame(
            [(1, 1.0)], "k long, v double").coalesce(1))
        with pytest.raises(NotImplementedError, match="2 -> 3"):
            w2.upgrade_format_version(1)


class TestV3LineageRewrites:
    """Round 14 second half: lineage-MATERIALIZING rewrites — the
    compaction and update shapes that keep every surviving row's
    ``_row_id`` across file rewrites (spec "Row Lineage", reserved
    field ids 2147483540 / 2147483539)."""

    def _upgraded(self, spark, tmp_path, name):
        root = str(tmp_path / name)
        w = IcebergTableWriter(root)
        w.append(spark.createDataFrame(
            [(i, float(i)) for i in range(6)], "k long, v double",
        ).coalesce(1))  # pre-upgrade: NO lineage
        w.upgrade_format_version(3)
        w.append(spark.createDataFrame(
            [(10 + i, 10.0 + i) for i in range(4)],
            "k long, v double",
        ).coalesce(1))  # post-upgrade: first_row_id = 0..3
        return w

    def _lineage_rows(self, root):
        import pyarrow.parquet as pq

        out = {}
        for p, _u, _s in IcebergTable(root)._files(None)[0]:
            tb = pq.read_table(p)
            if "_row_id" not in tb.schema.names:
                continue
            for k, rid, lus in zip(
                tb.column("k").to_pylist(),
                tb.column("_row_id").to_pylist(),
                tb.column("_last_updated_sequence_number").to_pylist(),
            ):
                out[k] = (rid, lus)
        return out

    def test_optimize_materializes_and_preserves(self, spark, tmp_path):
        import pyarrow.parquet as pq

        w = self._upgraded(spark, tmp_path, "opt")
        w.delete(spark, "k in (1, 11)")  # DV delete
        assert w.optimize(spark) is not None
        t = IcebergTable(w.path)
        assert not t._files(None)[3], "deletion vectors purged"
        snap = t.snapshot(spark)
        assert snap.columns == ["k", "v"], "reserved columns hidden"
        assert sorted(r["k"] for r in snap.collect()) == [
            0, 2, 3, 4, 5, 10, 12, 13]
        lin = self._lineage_rows(w.path)
        # post-upgrade survivors KEEP their assigned ids; k=11 (id 1)
        # died, so id 1 never reappears
        assert lin[10] == (0, 2) and lin[12] == (2, 2)
        assert lin[13] == (3, 2)
        # pre-upgrade rows have no lineage: null slots inherit fresh
        # ids from the rewritten file's first_row_id range
        assert lin[0] == (None, None)
        # the reserved field ids ride the staged footers
        p = t._files(None)[0][0][0]
        ids = {
            f.name: (f.metadata or {}).get(b"PARQUET:field_id")
            for f in pq.ParquetFile(p).schema_arrow
        }
        assert ids["_row_id"] == b"2147483540"
        assert ids["_last_updated_sequence_number"] == b"2147483539"
        _v, cur = w._current()
        # reserved range sized by record count: 8 survivors
        assert cur["next-row-id"] == 4 + 8
        # a SECOND optimize carries the materialized values verbatim
        w.append(spark.createDataFrame(
            [(99, 9.9)], "k long, v double").coalesce(1))
        w.optimize(spark)
        lin2 = self._lineage_rows(w.path)
        assert lin2[10] == (0, 2) and lin2[12] == (2, 2)
        # the previously-null rows materialized via inheritance from
        # the first rewrite's range [4, 12)
        assert lin2[0][0] is not None and 4 <= lin2[0][0] < 12

    def test_update_preserves_row_ids(self, spark, tmp_path):
        w = self._upgraded(spark, tmp_path, "upd")
        res = w.update(spark, {"v": "v + 100"}, "k in (11, 2)")
        assert res["rows_updated"] == 2 and res["delete_files"] == 1
        t = IcebergTable(w.path)
        got = {r["k"]: r["v"] for r in t.snapshot(spark).collect()}
        assert got[11] == 111.0 and got[2] == 102.0 and got[0] == 0.0
        lin = self._lineage_rows(w.path)
        # the updated post-upgrade row KEEPS id 1 (k=11 was ordinal 1
        # of the lineage file); lus stays null -> inherits the new
        # file's sequence number ("last changed in this commit")
        assert lin[11] == (1, None)
        # pre-upgrade row: no identity to preserve
        assert lin[2] == (None, None)
        # chained update on the SAME row: id still preserved, the
        # DV'd preimage never rematches
        res2 = w.update(spark, {"v": "v + 1"}, "k = 11")
        assert res2["rows_updated"] == 1
        assert self._lineage_rows(w.path)[11][0] == 1
        got2 = {r["k"]: r["v"]
                for r in IcebergTable(w.path).snapshot(spark).collect()}
        assert got2[11] == 112.0

    def test_update_feeds_cdf_as_update_images(self, spark, tmp_path):
        w = self._upgraded(spark, tmp_path, "cdf")
        t0 = IcebergTable(w.path)
        since = t0._snapshot(None)["snapshot-id"]
        w.update(spark, {"v": "v + 100"}, "k = 10")
        feed = IcebergTable(w.path).changes_cdf(spark, since)
        rows = sorted(
            (r["k"], r["v"], r["_change_type"]) for r in feed.collect()
        )
        assert rows == [(10, 10.0, "update_preimage"),
                        (10, 110.0, "update_postimage")]
        # the feed never leaks reserved lineage columns
        assert "_row_id" not in feed.columns

    def test_optimize_summary_counts_purged_dvs(self, spark, tmp_path):
        w = self._upgraded(spark, tmp_path, "sum")
        w.delete(spark, "k = 10")
        w.optimize(spark)
        t = IcebergTable(w.path)
        summ = t._snapshot(None)["summary"]
        assert summ["operation"] == "replace"
        assert summ["purged-deletion-vectors"] == "1"


class TestV3DvMerge:
    def test_merge_preserves_lineage(self, spark, tmp_path):
        import pyarrow.parquet as pq

        root = str(tmp_path / "mg")
        w = IcebergTableWriter(root)
        w.append(spark.createDataFrame(
            [(i, float(i)) for i in range(4)], "k long, v double",
        ).coalesce(1))
        w.upgrade_format_version(3)
        w.append(spark.createDataFrame(
            [(10, 10.0), (11, 11.0)], "k long, v double").coalesce(1))
        src = spark.createDataFrame(
            [(1, 100.0), (11, 111.0), (50, 50.0)], "k long, nv double")
        res = w.merge(spark, src, "t.k = s.k", {"v": "s.nv"},
                      ["s.k", "s.nv"])
        assert res == {"version": res["version"], "rows_matched": 2,
                       "rows_inserted": 1, "delete_files": 1}
        t = IcebergTable(root)
        got = {r["k"]: r["v"] for r in t.snapshot(spark).collect()}
        assert got[1] == 100.0 and got[11] == 111.0 and got[50] == 50.0
        assert got[0] == 0.0 and len(got) == 7
        # the postimage of the lineage-bearing row KEEPS its id; the
        # pre-upgrade row has none to preserve
        lin = {}
        for p, _u, _s in t._files(None)[0]:
            tb = pq.read_table(p)
            if "_row_id" in tb.schema.names:
                lin.update(zip(tb.column("k").to_pylist(),
                               tb.column("_row_id").to_pylist()))
        assert lin.get(11) == 1 and lin.get(1) is None

    def test_merge_delete_matched_and_multimatch(self, spark, tmp_path):
        root = str(tmp_path / "md")
        w = IcebergTableWriter(root)
        w.append(spark.createDataFrame(
            [(i, float(i)) for i in range(4)], "k long, v double",
        ).coalesce(1))
        w.upgrade_format_version(3)
        res = w.merge(
            spark, spark.createDataFrame([(2,)], "k long"),
            "t.k = s.k", None, None, delete_matched=True)
        assert res["rows_matched"] == 1 and res["delete_files"] == 1
        assert sorted(
            r["k"] for r in IcebergTable(root).snapshot(spark).collect()
        ) == [0, 1, 3]
        with pytest.raises(ValueError, match="multiple source rows"):
            w.merge(
                spark,
                spark.createDataFrame([(3, 1.0), (3, 2.0)],
                                      "k long, nv double"),
                "t.k = s.k", {"v": "s.nv"}, None)
        # an already-DV'd row never rematches: deleting k=2 again no-ops
        res2 = w.merge(
            spark, spark.createDataFrame([(2,)], "k long"),
            "t.k = s.k", None, None, delete_matched=True)
        assert res2["version"] is None and res2["rows_matched"] == 0

    def test_insert_only_merge_writes_no_dv(self, spark, tmp_path):
        root = str(tmp_path / "mi")
        w = IcebergTableWriter(root)
        w.append(spark.createDataFrame(
            [(1, 1.0)], "k long, v double").coalesce(1))
        w.upgrade_format_version(3)
        res = w.merge(
            spark,
            spark.createDataFrame([(77, 7.7)], "k long, nv double"),
            "t.k = s.k", None, ["s.k", "s.nv"])
        assert res["rows_inserted"] == 1 and res["delete_files"] == 0
        t = IcebergTable(root)
        assert not t._files(None)[3], "no stray deletion vector"
        assert sorted(
            r["k"] for r in t.snapshot(spark).collect()) == [1, 77]
        # the insert inherits a fresh id range
        snap = t._snapshot(None)
        assert snap["summary"]["added-records"] == "1"
