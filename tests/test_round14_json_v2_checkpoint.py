"""Round 14: JSON-format Delta V2 (UUID) checkpoints (round-13
verdict missing item 5). The spec allows the V2 main file in either
container — parquet or JSON-lines (same actions, different coding);
sidecars are always parquet. The round-13 refusal is deleted: a table
whose ``<v>.checkpoint.<uuid>.json`` main replays through the same
``_cp_rows`` seam every consumer (adds fold, tombstones,
protocol/metaData, txn marks, schema, sidecar pointers) reads.

Two-path methodology: the fixtures hand-convert a classic checkpoint
into the JSON-v2 layout here in the test — no reader code writes any
byte the reader later decodes."""

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# Heavyweight lakehouse interop e2e tier: excluded from the
# default pytest run (see pyproject [tool.pytest.ini_options]);
# run explicitly with `pytest -m interop`.
pytestmark = pytest.mark.interop

from algebraicdb_spark.operators.delta_writer import DeltaTableWriter
from algebraicdb_spark.operators.txnlog import DeltaLogTable


def _jsonable(v):
    """pyarrow ``to_pylist`` → Delta JSON action shape: MAP columns
    surface as lists of 2-tuples — real JSON checkpoints code them as
    objects; absent fields are omitted, not null."""
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items() if x is not None}
    if isinstance(v, list):
        if v and all(isinstance(e, tuple) and len(e) == 2 for e in v):
            return {k: _jsonable(x) for k, x in v}
        if not v:
            return {}  # empty MAP reads back as []
        return [_jsonable(e) for e in v]
    return v


def _to_v2_json(root: str, with_sidecar: bool) -> None:
    """Convert the table's classic checkpoint into a JSON-v2 layout:
    a UUID-named ``.json`` main file; file actions either inline
    (self-contained main) or split into one parquet sidecar."""
    log = os.path.join(root, "_delta_log")
    with open(os.path.join(log, "_last_checkpoint")) as f:
        c = json.load(f)["version"]
    classic = os.path.join(log, f"{c:020d}.checkpoint.parquet")
    t = pq.read_table(classic)
    lines = []
    n_actions = 0
    for row in t.to_pylist():
        for k, v in row.items():
            if v is None:
                continue
            if with_sidecar and k in ("add", "remove"):
                continue
            lines.append({k: _jsonable(v)})
            n_actions += 1
    if with_sidecar:
        side_dir = os.path.join(log, "_sidecars")
        os.makedirs(side_dir, exist_ok=True)
        side_name = f"{uuid.uuid4().hex}.parquet"
        side_path = os.path.join(side_dir, side_name)
        pq.write_table(t.select(["add", "remove"]), side_path)
        lines.append({"sidecar": {
            "path": side_name,
            "sizeInBytes": os.path.getsize(side_path),
        }})
        n_actions += sum(
            1 for row in t.to_pylist()
            if row.get("add") is not None or row.get("remove") is not None
        )
    lines.append({"checkpointMetadata": {"version": c}})
    main = os.path.join(
        log, f"{c:020d}.checkpoint.{uuid.uuid4().hex}.json"
    )
    with open(main, "w") as f:
        f.write("\n".join(json.dumps(a) for a in lines) + "\n")
    os.unlink(classic)
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": c, "size": n_actions}, f)


def _table(spark, tmp_path, name, with_sidecar):
    root = str(tmp_path / name)
    w = DeltaTableWriter(root)
    for base in (0, 10):
        w.append(spark.createDataFrame(
            [(base + i, float(base + i)) for i in range(3)],
            "k long, v double",
        ).coalesce(1))
    w.delete(spark, "k = 1")  # a tombstone for the checkpoint to carry
    w.write_checkpoint(clean=True)
    _to_v2_json(root, with_sidecar)
    return w


class TestJsonV2Checkpoint:
    @pytest.mark.parametrize("with_sidecar", [False, True])
    def test_attach_and_snapshot(self, spark, tmp_path, with_sidecar):
        w = _table(spark, tmp_path, f"t{with_sidecar}", with_sidecar)
        t = DeltaLogTable(w.path)
        snap = t.snapshot(spark)
        assert sorted(r["k"] for r in snap.collect()) == [0, 2, 10, 11, 12]
        # schema comes from the main file's metaData line
        assert snap.columns == ["k", "v"]

    @pytest.mark.parametrize("with_sidecar", [False, True])
    def test_commits_past_the_checkpoint_fold(
        self, spark, tmp_path, with_sidecar
    ):
        w = _table(spark, tmp_path, f"f{with_sidecar}", with_sidecar)
        w.append(spark.createDataFrame([(99, 99.0)], "k long, v double"))
        t = DeltaLogTable(w.path)
        assert t.snapshot(spark).count() == 6
        # time travel to the checkpointed version still works
        assert t.snapshot(spark, as_of=2).count() == 5

    def test_vacuum_sees_checkpointed_tombstones(self, spark, tmp_path):
        w = _table(spark, tmp_path, "vac", with_sidecar=False)
        for i in range(3):
            w.append(spark.createDataFrame(
                [(100 + i, 0.0)], "k long, v double"))
        doomed = w.vacuum(retain_versions=2)
        assert doomed, "the deleted file's bytes were reclaimed"
        assert DeltaLogTable(w.path).snapshot(spark).count() == 8

    def test_txn_marks_replay_from_json_main(self, spark, tmp_path):
        """Exactly-once sinks read their high-water mark through the
        checkpoint — the JSON container must serve it too."""
        root = str(tmp_path / "txn")
        w = DeltaTableWriter(root)
        w.append_txn(
            spark.createDataFrame([(1, 1.0)], "k long, v double"),
            app_id="job-a", txn_version=7,
        )
        w.write_checkpoint(clean=True)
        _to_v2_json(root, with_sidecar=False)
        assert DeltaLogTable(root).last_txn_version("job-a") == 7

    def test_binary_bytes_named_json_refuse_loudly(self, spark, tmp_path):
        """A parquet main misnamed ``.json`` (or any corrupt JSON main)
        refuses with a specific error, never a silent empty table."""
        w = _table(spark, tmp_path, "bad", with_sidecar=False)
        log = os.path.join(w.path, "_delta_log")
        main = next(
            fn for fn in os.listdir(log)
            if fn.endswith(".json") and fn.count(".") == 3
        )
        with open(os.path.join(log, main), "wb") as f:
            f.write(b"PAR1\x00\xff\x00garbage")
        with pytest.raises(ValueError, match="JSON-lines"):
            DeltaLogTable(w.path).snapshot(spark)

    def test_missing_sidecar_refuses_loudly(self, spark, tmp_path):
        w = _table(spark, tmp_path, "miss", with_sidecar=True)
        side_dir = os.path.join(w.path, "_delta_log", "_sidecars")
        for fn in os.listdir(side_dir):
            os.unlink(os.path.join(side_dir, fn))
        with pytest.raises(ValueError, match="sidecar"):
            DeltaLogTable(w.path).snapshot(spark)
