"""Round 14: ``IncrementalAggView`` over an ICEBERG base (round-13
verdict missing item 4). The watermark is keyed on the spec's
SEQUENCE NUMBERS (monotonic per commit — snapshot ids are random on
foreign tables), resolved to snapshot ids through the current
ancestor chain by ``IcebergViewBase``. Sum/count views fold COW
delete windows as signed retractions bit-equal to a rebuild; min/max
views refuse such windows loudly; v1 bases (no sequence numbers)
refuse at construction; a history rewritten under the view refuses
rather than guessing a fold point."""

import json
import os

import pytest

# Heavyweight lakehouse interop e2e tier: excluded from the
# default pytest run (see pyproject [tool.pytest.ini_options]);
# run explicitly with `pytest -m interop`.
pytestmark = pytest.mark.interop

from algebraicdb_spark.operators.iceberg import IcebergViewBase
from algebraicdb_spark.operators.iceberg_writer import IcebergTableWriter
from algebraicdb_spark.operators.txnlog import IncrementalAggView


def _rows(df):
    return sorted(
        tuple(r) for r in df.collect()
    )


def _mk(spark, tmp_path, name, **view_kw):
    root = str(tmp_path / name)
    w = IcebergTableWriter(root)
    w.append(spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("b", 3, 30.0)],
        "g string, k long, v double",
    ).coalesce(1))
    view = IncrementalAggView(
        IcebergViewBase(root), str(tmp_path / f"{name}_state"),
        group_cols=["g"], **(view_kw or {"sum_cols": ["v"]}),
    )
    return w, view


def _expected(spark, view, tmp_path, name):
    """A from-scratch rebuild into a THROWAWAY state — the oracle the
    incremental state must be bit-equal to."""
    fresh = IncrementalAggView(
        view.base, str(tmp_path / f"{name}_oracle"),
        group_cols=view.group_cols, sum_cols=view.sum_cols,
        min_cols=view.min_cols, max_cols=view.max_cols,
    )
    fresh.rebuild(spark)
    return _rows(fresh.state.snapshot(spark))


class TestIcebergAggView:
    def test_bootstrap_then_incremental_appends(self, spark, tmp_path):
        w, view = _mk(spark, tmp_path, "ap")
        hw1 = view.refresh(spark)
        assert hw1 == 1  # sequence number, not a random snapshot id
        assert _rows(view.state.snapshot(spark)) == _expected(
            spark, view, tmp_path, "ap1")
        w.append(spark.createDataFrame(
            [("b", 4, 40.0), ("c", 5, 50.0)], "g string, k long, v double",
        ).coalesce(1))
        hw2 = view.refresh(spark)
        assert hw2 == 2
        assert _rows(view.state.snapshot(spark)) == _expected(
            spark, view, tmp_path, "ap2")
        # already current: no-op
        assert view.refresh(spark) is None

    def test_cow_delete_folds_as_signed_retractions(self, spark, tmp_path):
        w, view = _mk(spark, tmp_path, "del")
        view.refresh(spark)
        w.delete(spark, "k = 2")  # v2 default: COW rewrite of file a
        assert view.refresh(spark) == 2
        assert _rows(view.state.snapshot(spark)) == _expected(
            spark, view, tmp_path, "del1")
        # retract group b to ZERO rows: it must vanish from the state
        w.delete(spark, "g = 'b'")
        view.refresh(spark)
        state = view.state.snapshot(spark)
        assert sorted(r["g"] for r in state.collect()) == ["a"]
        assert _rows(state) == _expected(spark, view, tmp_path, "del2")

    def test_minmax_view_refuses_delete_window(self, spark, tmp_path):
        w, view = _mk(
            spark, tmp_path, "mm",
            sum_cols=["v"], min_cols=["v"], max_cols=["v"],
        )
        view.refresh(spark)
        w.delete(spark, "k = 1")
        with pytest.raises(ValueError, match="min/max"):
            view.refresh(spark)
        # the recovery path: rebuild recomputes and re-arms
        view.rebuild(spark)
        assert _rows(view.state.snapshot(spark)) == _expected(
            spark, view, tmp_path, "mm1")
        assert view.refresh(spark) is None

    def test_compaction_advances_watermark_only(self, spark, tmp_path):
        w, view = _mk(spark, tmp_path, "opt")
        w.append(spark.createDataFrame(
            [("a", 9, 90.0)], "g string, k long, v double").coalesce(1))
        view.refresh(spark)
        before = _rows(view.state.snapshot(spark))
        sv = view.state.latest_version()
        w.optimize(spark)  # summary op 'replace' — content unchanged
        assert view.refresh(spark) == view.base.latest_version()
        # marker-only commit: watermark advanced, state rows untouched
        assert view.watermark() > 2
        assert view.state.latest_version() == sv + 1
        assert _rows(view.state.snapshot(spark)) == before

    def test_v3_dv_delete_window_folds(self, spark, tmp_path):
        """A v3 base whose DELETE writes a Puffin deletion vector:
        the row-level feed emits the flipped rows and the signed fold
        stays bit-equal to rebuild."""
        root = str(tmp_path / "dv")
        w = IcebergTableWriter(root)
        w.append(spark.createDataFrame(
            [("a", 1, 10.0), ("a", 2, 20.0), ("b", 3, 30.0)],
            "g string, k long, v double",
        ).coalesce(1))
        base_v, cur = w._current()
        md = dict(cur)
        md["format-version"] = 3
        md["next-row-id"] = 3
        with open(os.path.join(w.meta_dir,
                               f"v{base_v + 1}.metadata.json"), "w") as f:
            json.dump(md, f)
        with open(os.path.join(w.meta_dir, "version-hint.text"), "w") as f:
            f.write(str(base_v + 1))
        view = IncrementalAggView(
            IcebergViewBase(root), str(tmp_path / "dv_state"),
            group_cols=["g"], sum_cols=["v"],
        )
        view.refresh(spark)
        w.delete(spark, "k = 2")  # v3: merge-on-read deletion vector
        view.refresh(spark)
        assert _rows(view.state.snapshot(spark)) == _expected(
            spark, view, tmp_path, "dv1")

    def test_v1_base_refuses(self, spark, tmp_path):
        root = str(tmp_path / "v1")
        w = IcebergTableWriter(root)
        w.append(spark.createDataFrame(
            [("a", 1, 1.0)], "g string, k long, v double").coalesce(1))
        base_v, cur = w._current()
        md = dict(cur)
        md["format-version"] = 1
        with open(os.path.join(w.meta_dir,
                               f"v{base_v + 1}.metadata.json"), "w") as f:
            json.dump(md, f)
        with open(os.path.join(w.meta_dir, "version-hint.text"), "w") as f:
            f.write(str(base_v + 1))
        with pytest.raises(NotImplementedError, match="sequence numbers"):
            IcebergViewBase(root)

    def test_rewritten_history_refuses(self, spark, tmp_path):
        """A rollback that replays a DIFFERENT snapshot at a sequence
        number past the watermark leaves no ancestor at the
        watermark's number — the view refuses rather than guessing."""
        w, view = _mk(spark, tmp_path, "rw")
        w.append(spark.createDataFrame(
            [("c", 7, 70.0)], "g string, k long, v double").coalesce(1))
        view.refresh(spark)  # watermark at seq 2
        base_v, cur = w._current()
        md = dict(cur)
        snaps = md["snapshots"]
        root_snap = next(
            s for s in snaps if s.get("parent-snapshot-id") is None)
        # forge: a new head whose parent is the ROOT, at seq 3 — the
        # seq-2 commit is no longer an ancestor
        head = dict(next(
            s for s in snaps
            if s["snapshot-id"] == md["current-snapshot-id"]))
        head["snapshot-id"] = head["snapshot-id"] + 1000
        head["parent-snapshot-id"] = root_snap["snapshot-id"]
        head["sequence-number"] = 3
        md["snapshots"] = snaps + [head]
        md["current-snapshot-id"] = head["snapshot-id"]
        md["last-sequence-number"] = 3
        with open(os.path.join(w.meta_dir,
                               f"v{base_v + 1}.metadata.json"), "w") as f:
            json.dump(md, f)
        with open(os.path.join(w.meta_dir, "version-hint.text"), "w") as f:
            f.write(str(base_v + 1))
        with pytest.raises(ValueError, match="rewritten"):
            view.refresh(spark)


class TestV3UpdateWindow:
    def test_v3_dv_update_window_folds(self, spark, tmp_path):
        """A v3 base whose UPDATE writes DV preimages + lineage
        postimages: the probe sees the 'overwrite' operation, the
        row-level feed emits pre/postimages, and the signed fold
        stays bit-equal to rebuild."""
        root = str(tmp_path / "u3")
        w = IcebergTableWriter(root)
        w.append(spark.createDataFrame(
            [("a", 1, 10.0), ("a", 2, 20.0), ("b", 3, 30.0)],
            "g string, k long, v double",
        ).coalesce(1))
        w.upgrade_format_version(3)
        view = IncrementalAggView(
            IcebergViewBase(root), str(tmp_path / "u3_state"),
            group_cols=["g"], sum_cols=["v"],
        )
        view.refresh(spark)
        w.update(spark, {"v": "v + 100"}, "k = 2")
        view.refresh(spark)
        assert _rows(view.state.snapshot(spark)) == _expected(
            spark, view, tmp_path, "u3o")
