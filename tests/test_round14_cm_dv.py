"""Round 14 second half: DELETION-VECTOR (merge-on-read) writes on
COLUMN-MAPPED Delta tables — the modern prod default shape
(columnMapping + deletionVectors both enabled). Was a refusal; now
the MoR probe / postimage scan / CDC fast path assemble through the
mapping (predicates and assignments stay in LOGICAL names) while the
vectors address physical row ordinals — which no mapping touches —
and MoR postimages/inserts restage under PHYSICAL names + field ids,
the same staging contract as mapped COW.

Fixtures are the hand-written partitioned+nested mapped tables from
test_round14_cm_shapes (pyarrow + raw JSON log — never produced by
the code under test)."""

import os

import pyarrow.parquet as pq
import pytest

from algebraicdb_spark.operators.delta_writer import DeltaTableWriter
from algebraicdb_spark.operators.txnlog import DeltaLogTable

from test_round14_cm_shapes import EXPECT, _cm_table, _snap_dict


def _data_files(root):
    out = []
    for dirpath, _dirs, files in os.walk(root):
        if "_delta_log" in dirpath or "_change_data" in dirpath:
            continue
        out.extend(
            os.path.join(dirpath, f) for f in files
            if f.endswith(".parquet")
        )
    return sorted(out)


class TestMappedDvWrites:
    @pytest.mark.parametrize("mode", ["name", "id"])
    def test_mor_delete_nested_predicate(self, spark, tmp_path, mode):
        root = _cm_table(tmp_path, mode, f"d{mode}")
        before = _data_files(root)
        w = DeltaTableWriter(root)
        res = w.delete(spark, "s.a = 20 OR k = 3", mode="mor")
        assert res["rows_deleted"] == 2
        assert res["files_dv"] == 2  # one DV per touched partition file
        # merge-on-read: not a single data file rewritten or removed
        assert _data_files(root) == before
        got = _snap_dict(spark, root)
        assert got == {k: v for k, v in EXPECT.items() if k in (1, 4)}
        # a DV'd row never rematches: deleting it again is a no-op
        assert w.delete(spark, "k = 3", mode="mor")["rows_deleted"] == 0

    @pytest.mark.parametrize("mode", ["name", "id"])
    def test_mor_update_restages_physical(self, spark, tmp_path, mode):
        root = _cm_table(tmp_path, mode, f"u{mode}")
        w = DeltaTableWriter(root)
        res = w.update(spark, {"k": "k + 100"}, "s.a = 30", mode="mor")
        assert res["rows_updated"] == 1
        got = _snap_dict(spark, root)
        assert got == {1: (10, "b1", "x"), 2: (20, "b2", "x"),
                       103: (30, "b3", "y"), 4: (40, "b4", "y")}
        # the staged postimage file carries PHYSICAL names, not
        # logical ones — any real Delta client must be able to map it
        newest = max(_data_files(root), key=os.path.getmtime)
        names = pq.ParquetFile(newest).schema_arrow.names
        assert "k" not in names and "s" not in names
        assert any(n in names for n in ("col-k", "weird_k"))

    def test_mor_merge_on_mapped_table(self, spark, tmp_path):
        root = _cm_table(tmp_path, "name", "mg")
        w = DeltaTableWriter(root)
        src = spark.createDataFrame(
            [(1, 111), (9, 900)], "mk long, ma long")
        res = w.merge(
            spark, src, "t.k = s.mk",
            {"s": "named_struct('a', s.ma, 'b', t.s.b)"},
            ["s.mk",
             "named_struct('a', s.ma, 'b', 'new')",
             "'x'"],
            mode="mor",
        )
        assert res["rows_matched"] == 1 and res["rows_inserted"] == 1
        assert res["files_dv"] == 1
        got = _snap_dict(spark, root)
        assert got[1] == (111, "b1", "x")
        assert got[9] == (900, "new", "x")
        assert got[2] == EXPECT[2] and got[3] == EXPECT[3]

    @pytest.mark.parametrize("mode", ["name", "id"])
    def test_mor_delete_feeds_cdf_with_logical_names(
        self, spark, tmp_path, mode
    ):
        root = _cm_table(
            tmp_path, mode, f"c{mode}",
            extra_conf={"delta.enableChangeDataFeed": "true"},
        )
        w = DeltaTableWriter(root)
        since = w.latest_version()
        w.delete(spark, "k IN (2, 3)", mode="mor")
        feed = DeltaLogTable(root).changes_cdf(spark, since=since)
        rows = sorted(
            (r["k"], r["s"]["a"], r["p"], r["_change_type"])
            for r in feed.collect()
        )
        assert rows == [(2, 20, "x", "delete"), (3, 30, "y", "delete")]

    def test_mor_then_cow_then_optimize_compose(self, spark, tmp_path):
        """The full mapped lifecycle: DV delete, COW update over the
        DV'd file (survivors rewrite, vector retires), OPTIMIZE
        purges the remaining vectors — every step re-readable."""
        root = _cm_table(tmp_path, "name", "lc")
        w = DeltaTableWriter(root)
        w.delete(spark, "k = 1", mode="mor")
        w.update(spark, {"k": "k + 10"}, "s.a = 20", mode="cow")
        got = _snap_dict(spark, root)
        assert got == {12: (20, "b2", "x"), 3: (30, "b3", "y"),
                       4: (40, "b4", "y")}
        w.delete(spark, "k = 4", mode="mor")
        w.optimize(spark)
        got = _snap_dict(spark, root)
        assert got == {12: (20, "b2", "x"), 3: (30, "b3", "y")}
        # post-optimize: no DV descriptors survive in the live set
        assert all(
            dv is None
            for _r, _res, _pv, dv in DeltaLogTable(root)._live_entries_full()
        )


class TestMappedOverwrite:
    @pytest.mark.parametrize("mode", ["name", "id"])
    def test_same_shape_overwrite_composes(self, spark, tmp_path, mode):
        """A same-logical-shape OVERWRITE on the partitioned+nested
        mapped fixture: the mapped metaData carries forward untouched,
        the replacement batch restages under physical names + field
        ids, and the mapped read round-trips the new content."""
        root = _cm_table(tmp_path, mode, f"o{mode}")
        w = DeltaTableWriter(root)
        snap = DeltaLogTable(root).snapshot(spark)
        repl = snap.where("k <= 2").selectExpr(
            "k + 100 AS k", "s", "p")
        w.overwrite(repl, w.latest_version() + 1)
        got = _snap_dict(spark, root)
        assert got == {101: (10, "b1", "x"), 102: (20, "b2", "x")}
        # the metaData still maps: a fresh reader resolves physical
        # names, and the staged file carries them
        newest = max(_data_files(root), key=os.path.getmtime)
        names = pq.ParquetFile(newest).schema_arrow.names
        assert "k" not in names and "s" not in names

    def test_shape_changing_overwrite_refuses(self, spark, tmp_path):
        root = _cm_table(tmp_path, "name", "oref")
        w = DeltaTableWriter(root)
        bad = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(NotImplementedError, match="column-mapped"):
            w.overwrite(bad, w.latest_version() + 1)
