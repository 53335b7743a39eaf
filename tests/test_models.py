"""Model persistence: build once, reload, query with zero rebuild.

The round-5 verdict's 'done' criterion: an e2e test that builds a
model, reloads it in a fresh context, and runs the search with NO
training stages in the reloaded plan (no Lloyd posexplode/grid-mean
aggregates)."""

import pytest

from algebraicdb_spark.engine import Engine
from algebraicdb_spark.functions.adt import AdtError
from algebraicdb_spark.models import load_model, save_model
from algebraicdb_spark.operators.similarity import (
    _queries_and_corpus,
    build_ivf_centroids,
    build_lsh_planes,
    build_pq_codebook,
    ivf_search,
    lsh_planes_from_model,
    pq_search,
    sim_knn_ivf,
    sim_knn_pq,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestIvfPersistence:
    def test_saved_ivf_matches_and_skips_training(self, spark, sf_dir, tmp_path):
        path = str(tmp_path / "ivf")
        eng = Engine(spark)
        centroids = build_ivf_centroids(spark, sf_dir)
        eng.save_model(path, centroids, "ivf_centroids", {"sf_dir": sf_dir})

        m = eng.load_model(path)
        assert m.kind == "ivf_centroids" and m.params["sf_dir"] == sf_dir
        q, e = _queries_and_corpus(spark, sf_dir)
        reloaded = ivf_search(q, e, m.df)
        # identical results to the train-inline key
        want = {(r.q_id, r.vec_id, r.rnk) for r in sim_knn_ivf(spark, sf_dir).collect()}
        got = {(r.q_id, r.vec_id, r.rnk) for r in reloaded.collect()}
        assert got == want
        # zero rebuild: the reloaded plan scans the model parquet and
        # contains no Lloyd stage (posexplode is the training-only op)
        plan = _plan(reloaded)
        assert "posexplode" not in plan
        assert "ivf" in plan  # the model path's parquet scan

    def test_training_plan_does_contain_lloyd(self, spark, sf_dir):
        # control for the assertion above: the inline-trained key's
        # plan DOES carry the posexplode Lloyd stage
        assert "posexplode" in _plan(sim_knn_ivf(spark, sf_dir))


class TestPqPersistence:
    def test_saved_codebook_matches_and_skips_training(
        self, spark, sf_dir, tmp_path
    ):
        path = str(tmp_path / "pq")
        codebook = build_pq_codebook(spark, sf_dir)
        save_model(codebook, path, "pq_codebook")
        m = load_model(spark, path)
        q, e = _queries_and_corpus(spark, sf_dir)
        reloaded = pq_search(q, e, m.df)
        want = {(r.q_id, r.vec_id, r.rnk) for r in sim_knn_pq(spark, sf_dir).collect()}
        got = {(r.q_id, r.vec_id, r.rnk) for r in reloaded.collect()}
        assert got == want
        assert "posexplode" not in _plan(reloaded)


class TestLshPlanes:
    def test_roundtrip_is_exact(self, spark, tmp_path):
        from algebraicdb_spark.operators.similarity import _hyperplanes

        path = str(tmp_path / "lsh")
        save_model(build_lsh_planes(spark), path, "lsh_planes")
        planes = lsh_planes_from_model(load_model(spark, path).df)
        # bit-exact round-trip: a 1-ulp drift would flip near-zero
        # sign bits and silently fork the signature space
        assert planes == _hyperplanes()


class TestDedupState:
    def test_reloaded_state_classifies_identically(self, spark, sf_dir, tmp_path):
        from pyspark.sql import functions as F

        from algebraicdb_spark.operators.pipeline import (
            INCR_SPLIT,
            doc_fingerprints,
            incremental_dedup_classify,
            pipeline_incremental_dedup,
        )
        from algebraicdb_spark.sources.catalog import load_tables

        path = str(tmp_path / "fps")
        d = load_tables(spark, sf_dir)["documents"]
        fps = doc_fingerprints(d)
        state = fps.where(F.col("doc_id") < INCR_SPLIT).select("fp").distinct()
        save_model(state, path, "dedup_fingerprints")

        batch = fps.where(F.col("doc_id") >= INCR_SPLIT)
        got = {
            (r.doc_id, r.status)
            for r in incremental_dedup_classify(
                batch, load_model(spark, path).df
            ).collect()
        }
        want = {
            (r.doc_id, r.status)
            for r in pipeline_incremental_dedup(spark, sf_dir).collect()
        }
        assert got == want


class TestManifestHygiene:
    def test_unknown_kind_refused(self, spark, tables, tmp_path):
        with pytest.raises(AdtError, match="unknown model kind"):
            save_model(tables["region"], str(tmp_path / "x"), "nope")

    def test_missing_manifest_refused(self, spark, tmp_path):
        with pytest.raises(AdtError, match="no manifest"):
            load_model(spark, str(tmp_path / "absent"))

    def test_schema_drift_refused(self, spark, tables, tmp_path):
        path = str(tmp_path / "drift")
        save_model(
            tables["region"].select("r_regionkey", "r_name"), path, "generic"
        )
        # clobber the data with a different schema, keep the manifest
        tables["region"].select("r_regionkey").write.mode("overwrite").parquet(
            f"{path}/data"
        )
        with pytest.raises(AdtError, match="schema drift"):
            load_model(spark, path)


class TestKmeansPersistence:
    def test_saved_centroids_match_and_skip_training(self, spark, sf_dir, tmp_path):
        from algebraicdb_spark.operators.ml import (
            build_kmeans_centroids,
            kmeans_assign,
            ml_train_kmeans,
        )
        from algebraicdb_spark.sources.catalog import load_tables

        path = str(tmp_path / "km")
        save_model(
            build_kmeans_centroids(spark, sf_dir), path, "kmeans_centroids"
        )
        e = load_tables(spark, sf_dir)["embeddings"]
        reloaded = kmeans_assign(e, load_model(spark, path).df)
        want = {
            (r.cluster_id, r.n_members, r.member_checksum, r.fit_grid)
            for r in ml_train_kmeans(spark, sf_dir).collect()
        }
        got = {
            (r.cluster_id, r.n_members, r.member_checksum, r.fit_grid)
            for r in reloaded.collect()
        }
        assert got == want
        assert "posexplode" not in _plan(reloaded)
