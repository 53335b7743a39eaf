"""Round-15 exactness-bound guards (VERDICT r14 item 8).

The driver-fold optimizations (pagerank's exact tier, the PQ codebook
literal replay, SGD weight re-entry) and the exact_money_sum long-grid
split are correct only under documented size caps. These tests pin the
caps and the math at their boundaries so a future optimization round
cannot silently widen a driver tier or push a sum off the exact grid.
"""

import math

import pytest
from pyspark.sql import functions as F


class TestDriverFoldCaps:
    def test_pagerank_driver_tier_caps_are_modest(self):
        """The exact-pagerank driver fold may only ever see model-sized
        state: |event-type|^2 transition edges and the node set. These
        caps bound the collect; raising them needs an explicit fixture
        proving the driver can hold the state (update this test WITH
        that evidence, not instead of it)."""
        from algebraicdb_spark.operators.analytics import (
            PR_EXACT_DRIVER_EDGES,
            PR_EXACT_MAX_NODES,
        )

        assert PR_EXACT_DRIVER_EDGES <= 20_000
        assert PR_EXACT_MAX_NODES <= 10_000

    def test_pagerank_large_graph_keeps_distributed_fold(self, spark):
        """A graph over the probe cap must NOT collect: the probe is
        limit(cap+1), so the guard can only pass when the edge list
        fits. Pin the guard's shape by checking the constants feed the
        branch (source-level pin: the probe literally uses the cap)."""
        import inspect

        from algebraicdb_spark.operators import analytics

        src = inspect.getsource(analytics)
        assert "limit(PR_EXACT_DRIVER_EDGES + 1)" in src, (
            "the driver-collect tier must stay gated on the bounded probe"
        )

    def test_pq_codebook_is_kb_sized_by_construction(self):
        """The per-round codebook collect is PQ_BLOCKS x PQ_K rows of
        PQ-block-width vectors — keep it KB-sized at any corpus scale."""
        from algebraicdb_spark.operators.similarity import (
            PQ_BLOCKS,
            PQ_K,
            PQ_TRAIN_CAP,
            PQ_TRAIN_MOD,
        )

        assert PQ_BLOCKS * PQ_K <= 4096, "codebook collect must stay KB-sized"
        # the train sample the Lloyd shuffle sees is bounded regardless
        # of corpus size (vec_id < MOD*CAP with ids dense)
        assert PQ_TRAIN_MOD * PQ_TRAIN_CAP <= 1_000_000


class TestExactMoneySumGrid:
    def test_long_grid_matches_decimal_path_at_magnitude_bound(self, spark):
        """The hi/lo BIGINT split must agree with the documented
        DECIMAL reference (CAST(SUM(CAST(x AS DECIMAL(18,4))) AS
        DOUBLE)) up to the documented |x| < 9e8 magnitude bound,
        including sign mixes and many-row groups."""
        from algebraicdb_spark.functions.rounding import (
            exact_money_sum,
            exact_money_sum_sql,
        )

        rows = [
            (1, 0.01), (1, 123456.78), (1, -98765.43),
            (1, 899_999_999.99), (1, -899_999_999.99),
            (2, 0.07), (2, 1e-4), (2, 42.42),
        ] + [(3, (i % 997) * 0.25 + 0.01) for i in range(5000)]
        df = spark.createDataFrame(rows, "g int, x double")
        df.createOrReplaceTempView("ems_guard")
        got = {
            r["g"]: r["s"]
            for r in df.groupBy("g").agg(exact_money_sum(F.col("x")).alias("s")).collect()
        }
        ref = {
            r["g"]: r["s"]
            for r in spark.sql(
                f"SELECT g, {exact_money_sum_sql('x')} AS s FROM ems_guard GROUP BY g"
            ).collect()
        }
        assert got.keys() == ref.keys()
        for g in ref:
            # bit-identical, not approx: the whole point of the device
            assert math.isclose(got[g], ref[g], rel_tol=0.0, abs_tol=0.0), (
                g, got[g], ref[g]
            )

    def test_grid_bound_is_below_2_53(self):
        """|x|·10^4 must stay under 2^53 for floor(x·k + 0.5) to be
        exact — the documented 9e8 headroom keeps a 5x safety margin."""
        assert 9e8 * 10**4 * 5 < 2**53


class TestLpaModeTieRule:
    def test_mode_deterministic_matches_count_then_min_label(self, spark):
        """graph_label_propagation folds its per-round top-1 into
        mode(label, true); pin Spark's documented tie rule (most
        frequent, ties -> LOWEST value) against the explicit
        count-then-min reference so an engine upgrade can't silently
        change LPA results."""
        rows = [
            (1, 10), (1, 10), (1, 20), (1, 20), (1, 30),  # tie 10/20 -> 10
            (2, 7), (2, 5), (2, 5),                        # clear 5
            (3, 9),                                        # singleton
        ]
        df = spark.createDataFrame(rows, "node int, label int")
        got = {
            r["node"]: r["m"]
            for r in df.groupBy("node")
            .agg(F.expr("mode(label, true)").alias("m"))
            .collect()
        }
        ref = {
            r["node"]: r["m"]
            for r in df.groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("n"))
            .groupBy("node")
            .agg(F.expr("max_by(label, struct(n, -label))").alias("m"))
            .collect()
        }
        assert got == ref == {1: 10, 2: 5, 3: 9}
