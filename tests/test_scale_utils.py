"""Scale utilities: salted joins preserve semantics; bucketed tables
join with zero exchanges."""

from pyspark.sql import functions as F


def test_salted_join_equals_plain_join(spark, sf_dir, tables):
    from algebraicdb_spark.operators.skew import salted_join

    plain = (
        tables["orders"]
        .join(
            tables["customer"].select("c_custkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .count()
    )
    salted = (
        salted_join(
            tables["orders"],
            tables["customer"].select("c_custkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
            unique_col="o_orderkey",
            n_salts=8,
        )
        .groupBy("c_mktsegment")
        .count()
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salt_spreads_hot_key(spark, tables):
    """All rows of one hot key must land in >1 salt shard."""
    from algebraicdb_spark.operators.skew import salt_big_side

    hot = tables["orders"].limit(200).withColumn("o_custkey", F.lit(7))
    n_shards = (
        salt_big_side(hot, "o_orderkey", 8).select("_salt").distinct().count()
    )
    assert n_shards > 1


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """With broadcast disabled (as it would be for fact⋈fact at real
    scale), two same-bucketed tables must sort-merge-join with NO
    shuffle of either side."""
    from algebraicdb_spark.sources.bucketed import prepare_bucketed

    li, o = prepare_bucketed(spark, sf_dir, n_buckets=4)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table(li)
            .join(spark.table(o), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .count()
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in final
        assert "Exchange hashpartitioning(l_orderkey" not in final
        assert "Exchange hashpartitioning(o_orderkey" not in final
        # correctness unchanged vs the unbucketed join
        base = (
            spark.table("lineitem")
            .join(spark.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .count()
        )
        assert {tuple(r) for r in j.collect()} == {tuple(r) for r in base.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
