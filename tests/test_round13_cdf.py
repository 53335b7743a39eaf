"""Round 13: Delta Change Data Feed INTEROP writes.

Rounds 11-12 taught the engine to COMPUTE row-level change feeds; the
round-12 verdict's top item was that a table with
``delta.enableChangeDataFeed=true`` — the production default for CDC
consumers — still REFUSED every mutation because the writer would not
land the feed in Delta's interop format. Round 13 lifts that refusal:

- ``DeltaTableWriter`` mutations (COW and MoR DELETE / UPDATE / MERGE)
  on CDF-enabled tables write ``_change_data/`` parquet (table columns
  + ``_change_type``) plus ``cdc`` actions in the SAME commit;
- ``enable_change_data_feed`` / the ``SET TBLPROPERTIES`` route commit
  the config flag atomically with a protocol that licenses it;
- ``DeltaLogTable.changes_cdf`` consumes ``cdc`` actions when a commit
  carries them (the spec's rule: change files are authoritative for
  their commit), instead of diffing add/remove.

Proof shape, as everywhere in the Delta suite: the writer's output is
read back through the reader (validated against hand-written protocol
fixtures, never against this writer), and the equivalence tests
recompute every commit's change set INDEPENDENTLY from time-travel
snapshots — the cdc-based feed must match the snapshot diff exactly.
"""

import json
import os

import pytest

# Heavyweight lakehouse interop e2e tier: excluded from the
# default pytest run (see pyproject [tool.pytest.ini_options]);
# run explicitly with `pytest -m interop`.
pytestmark = pytest.mark.interop
from pyspark.sql import functions as F

from algebraicdb_spark.operators.delta_writer import DeltaTableWriter
from algebraicdb_spark.operators.txnlog import DeltaLogTable


def _three_file_table(spark, tmp_path, name="t"):
    root = str(tmp_path / name)
    w = DeltaTableWriter(root)
    for base in (0, 10, 20):
        w.append(
            spark.createDataFrame(
                [(base + i, float(base + i)) for i in range(4)],
                "k long, v double",
            ).coalesce(1)
        )
    return w


def _commit_actions(root: str, v: int) -> list[dict]:
    with open(os.path.join(root, "_delta_log", f"{v:020d}.json")) as f:
        return [json.loads(line) for line in f if line.strip()]


def _cdc_rows(spark, root: str, v: int) -> list[tuple]:
    """Independent replay of one commit's change-data files: parse the
    raw cdc actions, read the referenced parquet directly — no reader
    code in the loop."""
    from urllib.parse import unquote

    paths = [
        os.path.join(root, unquote(a["cdc"]["path"]))
        for a in _commit_actions(root, v)
        if "cdc" in a
    ]
    if not paths:
        return []
    df = spark.read.parquet(*paths)
    return sorted(
        tuple(r) for r in df.select("k", "v", "_change_type").collect()
    )


def _snapshot_diff(spark, root: str, v: int, op: str) -> list[tuple]:
    """The commit's change set recomputed WITHOUT any change-feed code:
    diff the time-travel snapshots on either side of ``v``."""
    t = DeltaLogTable(root)
    post = t.snapshot(spark, as_of=v)
    pre = t.snapshot(spark, as_of=v - 1)
    pre_l, post_l = (
        ("update_preimage", "update_postimage")
        if op == "UPDATE"
        else ("delete", "insert")
    )
    gone = pre.exceptAll(post).withColumn("_change_type", F.lit(pre_l))
    new = post.exceptAll(pre).withColumn("_change_type", F.lit(post_l))
    return sorted(
        tuple(r)
        for r in gone.unionByName(new)
        .select("k", "v", "_change_type")
        .collect()
    )


def _feed_rows(spark, root: str, v: int) -> list[tuple]:
    cdf = DeltaLogTable(root).changes_cdf(spark, since=v - 1, to=v)
    return sorted(
        tuple(r)
        for r in cdf.select("k", "v", "_change_type").collect()
    )


class TestEnableChangeDataFeed:
    def test_set_properties_routes_through_protocol_upgrade(
        self, spark, tmp_path
    ):
        w = _three_file_table(spark, tmp_path)
        v = w.set_properties({"delta.enableChangeDataFeed": "true"})
        assert v == 3
        proto, meta = DeltaLogTable(w.path)._protocol_meta()
        assert proto["minWriterVersion"] == 7
        assert "changeDataFeed" in proto["writerFeatures"]
        # minReader untouched — CDF is a writer-side capability
        assert proto["minReaderVersion"] == 1
        conf = meta["configuration"]
        assert conf["delta.enableChangeDataFeed"] == "true"
        # flag + protocol landed in ONE commit
        acts = _commit_actions(w.path, 3)
        assert any("protocol" in a for a in acts)
        assert any("metaData" in a for a in acts)
        # idempotent
        assert w.enable_change_data_feed() is None

    def test_legacy_v4_protocol_is_licensed_without_upgrade(
        self, spark, tmp_path
    ):
        """A foreign table at legacy writer v4 (CDF-capable by version)
        just gets the config — no protocol action committed."""
        w = _three_file_table(spark, tmp_path)
        # hand-edit commit 0's protocol to legacy v4, as a foreign
        # writer would have created it
        p0 = os.path.join(w.path, "_delta_log", f"{0:020d}.json")
        lines = [json.loads(line) for line in open(p0) if line.strip()]
        for a in lines:
            if "protocol" in a:
                a["protocol"]["minWriterVersion"] = 4
        with open(p0, "w") as f:
            f.write("\n".join(json.dumps(a) for a in lines) + "\n")
        v = w.set_properties({"delta.enableChangeDataFeed": "true"})
        acts = _commit_actions(w.path, v)
        assert not any("protocol" in a for a in acts)
        assert w._cdf_enabled(DeltaLogTable(w.path)._protocol_meta()[1])

    def test_legacy_v5_cdf_table_mutates_instead_of_refusing(
        self, spark, tmp_path
    ):
        """The exact shape the round-12 gate refused: legacy writer v5
        with delta.enableChangeDataFeed=true. Round 13 honors it by
        emitting the feed."""
        w = _three_file_table(spark, tmp_path)
        p0 = os.path.join(w.path, "_delta_log", f"{0:020d}.json")
        lines = [json.loads(line) for line in open(p0) if line.strip()]
        for a in lines:
            if "protocol" in a:
                a["protocol"]["minWriterVersion"] = 5
            if "metaData" in a:
                a["metaData"]["configuration"] = {
                    "delta.enableChangeDataFeed": "true"
                }
        with open(p0, "w") as f:
            f.write("\n".join(json.dumps(a) for a in lines) + "\n")
        res = w.delete(spark, "k = 1")
        assert res["rows_deleted"] == 1
        acts = _commit_actions(w.path, res["version"])
        assert any("cdc" in a for a in acts)
        assert DeltaLogTable(w.path).snapshot(spark).count() == 11


class TestCowCdcCommits:
    @staticmethod
    def _cdf_table(spark, tmp_path, name="t"):
        w = _three_file_table(spark, tmp_path, name)
        w.set_properties({"delta.enableChangeDataFeed": "true"})
        return w

    def test_delete_lands_cdc_files_and_actions(self, spark, tmp_path):
        w = self._cdf_table(spark, tmp_path)
        res = w.delete(spark, "k IN (1, 11)")  # two partial files
        v = res["version"]
        acts = _commit_actions(w.path, v)
        cdc = [a["cdc"] for a in acts if "cdc" in a]
        assert cdc, "CDF commit must carry cdc actions"
        for c in cdc:
            assert c["dataChange"] is False
            assert c["path"].startswith("_change_data/")
            assert c["size"] > 0
            full = os.path.join(w.path, c["path"])
            assert os.path.exists(full)
        # the change files hold exactly the deleted rows, labeled
        assert _cdc_rows(spark, w.path, v) == [
            (1, 1.0, "delete"), (11, 11.0, "delete"),
        ]
        # and the add/remove actions still describe the same commit
        # (other readers derive from them when they ignore cdc)
        assert [a for a in acts if "remove" in a]
        assert DeltaLogTable(w.path).snapshot(spark).count() == 10

    def test_full_file_delete_still_feeds_all_rows(self, spark, tmp_path):
        w = self._cdf_table(spark, tmp_path)
        res = w.delete(spark, "k >= 20")  # drops one whole file
        assert _cdc_rows(spark, w.path, res["version"]) == [
            (20, 20.0, "delete"), (21, 21.0, "delete"),
            (22, 22.0, "delete"), (23, 23.0, "delete"),
        ]

    def test_update_labels_pre_and_post_images(self, spark, tmp_path):
        w = self._cdf_table(spark, tmp_path)
        res = w.update(spark, {"v": "v + 100"}, "k IN (2, 12)")
        rows = _cdc_rows(spark, w.path, res["version"])
        assert rows == [
            (2, 2.0, "update_preimage"),
            (2, 102.0, "update_postimage"),
            (12, 12.0, "update_preimage"),
            (12, 112.0, "update_postimage"),
        ]

    def test_merge_feeds_updates_as_delete_insert_plus_inserts(
        self, spark, tmp_path
    ):
        w = self._cdf_table(spark, tmp_path)
        src = spark.createDataFrame(
            [(1, 500.0), (99, 990.0)], "k long, v double"
        )
        res = w.merge(
            spark, src, "t.k = s.k",
            assignments={"v": "s.v"},
            insert_exprs=["s.k", "s.v"],
        )
        rows = _cdc_rows(spark, w.path, res["version"])
        assert (1, 1.0, "delete") in rows        # old image of the update
        assert (1, 500.0, "insert") in rows      # new image
        assert (99, 990.0, "insert") in rows     # NOT MATCHED insert
        # untouched rows of the rewritten file cancelled out of the diff
        assert (0, 0.0, "delete") not in rows
        assert len(rows) == 3

    def test_append_commits_carry_no_cdc(self, spark, tmp_path):
        """Pure appends are derivable from their add actions — per the
        protocol no change files are needed, and the reader labels the
        added rows insert."""
        w = self._cdf_table(spark, tmp_path)
        v = w.append(
            spark.createDataFrame([(30, 30.0)], "k long, v double")
        )
        assert not [a for a in _commit_actions(w.path, v) if "cdc" in a]
        assert _feed_rows(spark, w.path, v) == [(30, 30.0, "insert")]


class TestMorCdcCommits:
    @staticmethod
    def _dv_cdf_table(spark, tmp_path, name="t"):
        w = _three_file_table(spark, tmp_path, name)
        w.enable_deletion_vectors()
        w.set_properties({"delta.enableChangeDataFeed": "true"})
        return w

    def test_mor_delete_feeds_only_flipped_rows(self, spark, tmp_path):
        w = self._dv_cdf_table(spark, tmp_path)
        res = w.delete(spark, "k IN (1, 11)")  # auto → mor
        assert res["files_dv"] == 2
        assert _cdc_rows(spark, w.path, res["version"]) == [
            (1, 1.0, "delete"), (11, 11.0, "delete"),
        ]
        # second delete on the SAME file: only the newly-flipped row
        res2 = w.delete(spark, "k = 2")
        assert _cdc_rows(spark, w.path, res2["version"]) == [
            (2, 2.0, "delete"),
        ]

    def test_mor_update_feeds_pre_and_post(self, spark, tmp_path):
        w = self._dv_cdf_table(spark, tmp_path)
        res = w.update(spark, {"v": "v * 2"}, "k = 3")
        assert res["files_dv"] == 1
        assert _cdc_rows(spark, w.path, res["version"]) == [
            (3, 3.0, "update_preimage"),
            (3, 6.0, "update_postimage"),
        ]

    def test_mor_merge_feeds_update_pair_and_insert(self, spark, tmp_path):
        w = self._dv_cdf_table(spark, tmp_path)
        src = spark.createDataFrame(
            [(10, 1000.0), (77, 770.0)], "k long, v double"
        )
        res = w.merge(
            spark, src, "t.k = s.k",
            assignments={"v": "s.v"},
            insert_exprs=["s.k", "s.v"],
        )
        assert _cdc_rows(spark, w.path, res["version"]) == [
            (10, 10.0, "delete"),
            (10, 1000.0, "insert"),
            (77, 770.0, "insert"),
        ]


class TestFeedEquivalence:
    """The round-12 verdict's done-criterion: an independent replay of
    ``_change_data`` + cdc actions must equal the engine's own
    ``changes_cdf`` — and both must equal the change set recomputed
    from time-travel snapshots with no change-feed code at all."""

    def test_cow_lifecycle_three_way_agreement(self, spark, tmp_path):
        w = _three_file_table(spark, tmp_path)
        w.set_properties({"delta.enableChangeDataFeed": "true"})
        ops = [
            (w.delete(spark, "k IN (1, 11)")["version"], "DELETE"),
            (w.update(spark, {"v": "v + 0.5"}, "k = 2")["version"],
             "UPDATE"),
            (w.merge(
                spark,
                spark.createDataFrame([(0, -1.0), (50, 50.0)],
                                      "k long, v double"),
                "t.k = s.k", assignments={"v": "s.v"},
                insert_exprs=["s.k", "s.v"],
            )["version"], "MERGE"),
        ]
        for v, op in ops:
            raw = _cdc_rows(spark, w.path, v)
            feed = _feed_rows(spark, w.path, v)
            snap = _snapshot_diff(spark, w.path, v, op)
            assert raw == feed == snap, (v, op)

    def test_mor_lifecycle_three_way_agreement(self, spark, tmp_path):
        w = _three_file_table(spark, tmp_path)
        w.enable_deletion_vectors()
        w.set_properties({"delta.enableChangeDataFeed": "true"})
        ops = [
            (w.delete(spark, "k % 10 = 1")["version"], "DELETE"),
            (w.update(spark, {"v": "v * 10"}, "k = 22")["version"],
             "UPDATE"),
        ]
        for v, op in ops:
            raw = _cdc_rows(spark, w.path, v)
            feed = _feed_rows(spark, w.path, v)
            snap = _snapshot_diff(spark, w.path, v, op)
            assert raw == feed == snap, (v, op)

    def test_multi_commit_window_unions_labeled_versions(
        self, spark, tmp_path
    ):
        w = _three_file_table(spark, tmp_path)
        w.set_properties({"delta.enableChangeDataFeed": "true"})
        v1 = w.delete(spark, "k = 1")["version"]
        v2 = w.update(spark, {"v": "v + 1"}, "k = 2")["version"]
        cdf = DeltaLogTable(w.path).changes_cdf(spark, since=v1 - 1, to=v2)
        got = sorted(
            tuple(r)
            for r in cdf.select(
                "k", "v", "_change_type", "_commit_version"
            ).collect()
        )
        assert got == [
            (1, 1.0, "delete", v1),
            (2, 2.0, "update_preimage", v2),
            (2, 3.0, "update_postimage", v2),
        ]


class TestCdcReaderInterop:
    def test_reader_prefers_cdc_over_derivation(self, spark, tmp_path):
        """A hand-written foreign commit whose cdc files DISAGREE with
        what add/remove derivation would produce: the spec says the
        change files are authoritative, so the feed must surface their
        labels — proof the reader actually consumes cdc rather than
        diffing and agreeing by luck."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        root = str(tmp_path / "foreign")
        log = os.path.join(root, "_delta_log")
        os.makedirs(log)
        schema_str = json.dumps({
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True,
                 "metadata": {}},
                {"name": "v", "type": "double", "nullable": True,
                 "metadata": {}},
            ],
        })

        def write_pq(rel, rows, cols):
            full = os.path.join(root, rel)
            os.makedirs(os.path.dirname(full), exist_ok=True)
            pq.write_table(
                pa.table({c: list(vals) for c, vals in zip(cols, rows)}),
                full,
            )
            return os.path.getsize(full)

        s_a = write_pq("a.parquet", [[1, 2, 3], [1.0, 2.0, 3.0]],
                       ["k", "v"])
        with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
            for a in [
                {"protocol": {"minReaderVersion": 1,
                              "minWriterVersion": 4}},
                {"metaData": {
                    "id": "fx", "format": {"provider": "parquet"},
                    "schemaString": schema_str, "partitionColumns": [],
                    "configuration": {
                        "delta.enableChangeDataFeed": "true"},
                }},
                {"add": {"path": "a.parquet", "partitionValues": {},
                         "size": s_a, "modificationTime": 0,
                         "dataChange": True}},
            ]:
                f.write(json.dumps(a) + "\n")
        # commit 1: an UPDATE that rewrites a.parquet → b.parquet; the
        # cdc file labels the changed row update_pre/postimage — the
        # derivation-based reader (op UPDATE) would AGREE on labels but
        # we also plant an extra marker row derivation cannot produce
        s_b = write_pq("b.parquet", [[1, 2, 3], [1.0, 9.0, 3.0]],
                       ["k", "v"])
        s_c = write_pq(
            "_change_data/cdc-0.parquet",
            [[2, 2, 777], [2.0, 9.0, 7.0],
             ["update_preimage", "update_postimage", "insert"]],
            ["k", "v", "_change_type"],
        )
        with open(os.path.join(log, f"{1:020d}.json"), "w") as f:
            for a in [
                {"commitInfo": {"operation": "UPDATE"}},
                {"remove": {"path": "a.parquet", "dataChange": True,
                            "deletionTimestamp": 0}},
                {"add": {"path": "b.parquet", "partitionValues": {},
                         "size": s_b, "modificationTime": 0,
                         "dataChange": True}},
                {"cdc": {"path": "_change_data/cdc-0.parquet",
                         "partitionValues": {}, "size": s_c,
                         "dataChange": False}},
            ]:
                f.write(json.dumps(a) + "\n")
        got = sorted(
            tuple(r)
            for r in DeltaLogTable(root)
            .changes_cdf(spark, since=0, to=1)
            .select("k", "v", "_change_type").collect()
        )
        assert got == [
            (2, 2.0, "update_preimage"),
            (2, 9.0, "update_postimage"),
            (777, 7.0, "insert"),  # only readable FROM the cdc file
        ]

    def test_vacuum_never_reclaims_change_data(self, spark, tmp_path):
        w = _three_file_table(spark, tmp_path)
        w.set_properties({"delta.enableChangeDataFeed": "true"})
        v = w.delete(spark, "k = 1")["version"]
        cdc_rel = [
            a["cdc"]["path"] for a in _commit_actions(w.path, v)
            if "cdc" in a
        ]
        # bury the delete under enough commits to expire it, vacuum
        for i in range(3):
            w.append(spark.createDataFrame(
                [(100 + i, 0.0)], "k long, v double"))
        w.vacuum(retain_versions=2)
        for rel in cdc_rel:
            assert os.path.exists(os.path.join(w.path, rel))

    def test_missing_change_file_refuses_loudly(self, spark, tmp_path):
        w = _three_file_table(spark, tmp_path)
        w.set_properties({"delta.enableChangeDataFeed": "true"})
        v = w.delete(spark, "k = 1")["version"]
        rel = [
            a["cdc"]["path"] for a in _commit_actions(w.path, v)
            if "cdc" in a
        ][0]
        os.unlink(os.path.join(w.path, rel))
        with pytest.raises(ValueError, match="retention already cleaned"):
            DeltaLogTable(w.path).changes_cdf(spark, since=v - 1, to=v)

    def test_checkpoint_fold_ignores_cdc_and_replays_clean(
        self, spark, tmp_path
    ):
        w = _three_file_table(spark, tmp_path)
        w.set_properties({"delta.enableChangeDataFeed": "true"})
        w.delete(spark, "k = 1")
        w.write_checkpoint()
        t = DeltaLogTable(w.path)
        assert t.snapshot(spark).count() == 11
        # cdc never enters the folded state — the checkpoint's actions
        # are protocol/metaData/txn/add/remove only
        import pyarrow.parquet as pq

        cp = [
            fn for fn in os.listdir(os.path.join(w.path, "_delta_log"))
            if fn.endswith(".checkpoint.parquet")
        ]
        cols = pq.ParquetFile(
            os.path.join(w.path, "_delta_log", cp[0])
        ).schema_arrow.names
        assert "cdc" not in cols


class TestCdfOnPartitionedAndMappedTables:
    def test_partitioned_cdf_round_trips_partition_values(
        self, spark, tmp_path
    ):
        root = str(tmp_path / "p")
        w = DeltaTableWriter(root)
        w.append(
            spark.createDataFrame(
                [(1, 10.0, "a"), (2, 20.0, "a"), (3, 30.0, "b")],
                "k long, v double, part string",
            ),
            partition_by=["part"],
        )
        w.set_properties({"delta.enableChangeDataFeed": "true"})
        res = w.update(spark, {"v": "v + 1"}, "k = 1")
        acts = _commit_actions(root, res["version"])
        cdc = [a["cdc"] for a in acts if "cdc" in a]
        assert cdc and all(
            c["partitionValues"] == {"part": "a"} for c in cdc
        )
        # paths are URL-encoded root-relative strings, like adds
        from urllib.parse import unquote

        assert all("%3D" in c["path"] for c in cdc)
        # the cdc parquet does NOT contain the partition column — the
        # action's partitionValues carries it, same contract as adds
        import pyarrow.parquet as pq

        names = pq.ParquetFile(
            os.path.join(root, unquote(cdc[0]["path"]))
        ).schema_arrow.names
        assert "part" not in names and "_change_type" in names
        feed = DeltaLogTable(root).changes_cdf(
            spark, since=res["version"] - 1, to=res["version"]
        )
        got = sorted(
            tuple(r)
            for r in feed.select(
                "k", "v", "part", "_change_type"
            ).collect()
        )
        assert got == [
            (1, 10.0, "a", "update_preimage"),
            (1, 11.0, "a", "update_postimage"),
        ]

    def test_column_mapped_cdf_stages_physical_names(self, spark, tmp_path):
        """'name'-mode column mapping: the cdc parquet must carry the
        PHYSICAL column names (like every data file) and the feed must
        rename them back to logical on read."""
        root = str(tmp_path / "cm")
        log = os.path.join(root, "_delta_log")
        os.makedirs(log)
        schema_str = json.dumps({
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True,
                 "metadata": {
                     "delta.columnMapping.id": 1,
                     "delta.columnMapping.physicalName": "col-aaaa"}},
                {"name": "v", "type": "double", "nullable": True,
                 "metadata": {
                     "delta.columnMapping.id": 2,
                     "delta.columnMapping.physicalName": "col-bbbb"}},
            ],
        })
        import pyarrow as pa
        import pyarrow.parquet as pq

        full = os.path.join(root, "f0.parquet")
        pq.write_table(
            pa.table({"col-aaaa": [1, 2, 3],
                      "col-bbbb": [1.0, 2.0, 3.0]}),
            full,
        )
        with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
            for a in [
                {"protocol": {"minReaderVersion": 2,
                              "minWriterVersion": 5}},
                {"metaData": {
                    "id": "cm", "format": {"provider": "parquet"},
                    "schemaString": schema_str, "partitionColumns": [],
                    "configuration": {
                        "delta.columnMapping.mode": "name",
                        "delta.columnMapping.maxColumnId": "2",
                        "delta.enableChangeDataFeed": "true",
                    },
                }},
                {"add": {"path": "f0.parquet", "partitionValues": {},
                         "size": os.path.getsize(full),
                         "modificationTime": 0, "dataChange": True}},
            ]:
                f.write(json.dumps(a) + "\n")
        w = DeltaTableWriter(root)
        res = w.delete(spark, "k = 2")
        cdc = [
            a["cdc"] for a in _commit_actions(root, res["version"])
            if "cdc" in a
        ]
        names = pq.ParquetFile(
            os.path.join(root, cdc[0]["path"])
        ).schema_arrow.names
        assert "col-aaaa" in names and "k" not in names
        assert "_change_type" in names
        assert _feed_rows(spark, root, res["version"]) == [
            (2, 2.0, "delete"),
        ]


class TestCdfThroughSql:
    def test_sql_mutations_on_attached_cdf_table_feed(
        self, spark, tables, tmp_path
    ):
        from algebraicdb_spark.engine import Engine

        root = str(tmp_path / "sqlcdf")
        w = DeltaTableWriter(root)
        w.append(
            spark.createDataFrame(
                [(i, float(i)) for i in range(8)], "k long, v double"
            )
        )
        w.set_properties({"delta.enableChangeDataFeed": "true"})
        eng = Engine(spark)
        eng.sql(f"ATTACH TABLE t FROM delta LOCATION '{root}'")
        eng.sql("DELETE FROM t WHERE k = 3")
        eng.sql("UPDATE t SET v = v + 10 WHERE k = 4")
        v = DeltaLogTable(root).latest_version()
        assert _cdc_rows(spark, root, v) == [
            (4, 4.0, "update_preimage"),
            (4, 14.0, "update_postimage"),
        ]
        assert _feed_rows(spark, root, v - 1) == [(3, 3.0, "delete")]
