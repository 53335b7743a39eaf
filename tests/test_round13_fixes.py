"""Round-13 self-review regression pins.

Each test pins a hole found by re-reading the round's new surfaces
against their specs — the same discipline as rounds 10-12's fix
files: the fix lands with the test that would have caught it."""

import json
import os

import pytest

from algebraicdb_spark.operators.delta_writer import DeltaTableWriter
from algebraicdb_spark.operators.txnlog import DeltaLogTable


def _table(spark, tmp_path, name="t"):
    w = DeltaTableWriter(str(tmp_path / name))
    w.append(spark.createDataFrame(
        [(i, float(i)) for i in range(6)], "k long, v double",
    ).coalesce(1))
    return w


class TestCheckpointFeatureGate:
    def test_checkpoint_refuses_on_unknown_writer_features(
        self, spark, tmp_path
    ):
        """An unknown writer feature may govern the checkpoint LAYOUT
        (the way v2Checkpoint does) — overwriting _last_checkpoint
        with a shape the feature forbids breaks what the table
        promises other clients; refuse. Honored features (incl.
        v2Checkpoint itself, which round 13 WRITES) checkpoint fine."""
        w = _table(spark, tmp_path)
        p0 = os.path.join(w.path, "_delta_log", f"{0:020d}.json")
        lines = [json.loads(line) for line in open(p0) if line.strip()]
        for a in lines:
            if "protocol" in a:
                a["protocol"] = {
                    "minReaderVersion": 3, "minWriterVersion": 7,
                    "readerFeatures": [],
                    "writerFeatures": ["inCommitTimestamp"],
                }
        with open(p0, "w") as f:
            f.write("\n".join(json.dumps(a) for a in lines) + "\n")
        with pytest.raises(NotImplementedError, match="checkpoint"):
            w.write_checkpoint()
        # honored features keep checkpointing fine
        w2 = _table(spark, tmp_path, name="ok")
        w2.enable_deletion_vectors()
        assert w2.write_checkpoint() is not None


class TestNoOpChangeSets:
    def test_identity_update_emits_no_cdc_rows(self, spark, tmp_path):
        """UPDATE … SET v = v matches rows but changes nothing: the
        multiset diff cancels, so the commit carries NO cdc actions
        (an empty change file would be protocol noise) and the feed
        reports zero changes for that version — on both the cdc and
        the derivation path."""
        w = _table(spark, tmp_path)
        w.set_properties({"delta.enableChangeDataFeed": "true"})
        res = w.update(spark, {"v": "v"}, "k < 3")
        assert res["rows_updated"] == 3  # the rewrite DID happen
        with open(os.path.join(
            w.path, "_delta_log", f"{res['version']:020d}.json"
        )) as f:
            acts = [json.loads(line) for line in f if line.strip()]
        assert not [a for a in acts if "cdc" in a]
        feed = DeltaLogTable(w.path).changes_cdf(
            spark, since=res["version"] - 1, to=res["version"]
        )
        assert feed.count() == 0
        # and no orphaned _change_data files linger
        cd = os.path.join(w.path, "_change_data")
        leftovers = []
        for dirpath, _d, files in os.walk(cd):
            leftovers += [f for f in files if f.endswith(".parquet")]
        assert not leftovers


class TestUnknownSpecIdRefusal:
    def test_rewrite_refuses_when_a_spec_vanishes(self, spark, tmp_path):
        """A manifest keyed to a spec-id the metadata no longer
        records (corrupt / truncated metadata): rewriting its entries
        would write the carried partition records under an EMPTY
        schema — silent pruning corruption — so it refuses loudly."""
        from algebraicdb_spark.operators.iceberg_writer import (
            IcebergTableWriter,
        )

        root = str(tmp_path / "i")
        w = IcebergTableWriter(root)
        w.append(
            spark.createDataFrame(
                [(1, "a", 1.0), (2, "b", 2.0)],
                "k long, cat string, v double",
            ),
            partition_by=["cat"],
        )
        base_v, cur = w._current()
        md = dict(cur)
        # the table claims a different default and DROPS spec 0 —
        # existing manifests still reference spec-id 0
        md["partition-specs"] = [{"spec-id": 1, "fields": []}]
        md["default-spec-id"] = 1
        with open(
            os.path.join(w.meta_dir, f"v{base_v + 1}.metadata.json"),
            "w",
        ) as f:
            json.dump(md, f)
        with open(
            os.path.join(w.meta_dir, "version-hint.text"), "w"
        ) as f:
            f.write(str(base_v + 1))
        with pytest.raises(NotImplementedError, match="spec-id 0"):
            w.delete(spark, "k = 1")
