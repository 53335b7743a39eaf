"""Registry invariants: the driver contract surface stays sound.

The driver checks keys in ``queries()`` dict order with a bounded
budget (50 in round 1), so the exposure order IS part of correctness
evidence — a typo in the priority list would silently demote a key.
"""

from algebraicdb_spark.plans import registry


def test_priority_keys_all_exist():
    qs = registry.queries()
    missing = [k for k in registry._CHECK_PRIORITY if k not in qs]
    assert not missing, f"_CHECK_PRIORITY names unknown keys: {missing}"


def test_priority_has_no_duplicates():
    p = registry._CHECK_PRIORITY
    assert len(p) == len(set(p))


def test_never_driver_checked_surface_leads():
    """The keys the round-1 driver never reached (ADT, streaming,
    dedup/similarity/text, UDFs) plus the six fixed oracles must sit
    inside the first 50 exposure slots."""
    first50 = list(registry.queries())[:50]
    must_check = [
        "filter_null_semantics",
        "join_left_outer",
        "join_full_outer",
        "date_arith_interval",
        "map_ops",
        "adt_match_agg",
        "adt_construct",
        "adt_match_filter",
        "adt_match_project",
        "adt_nested",
        "stream_tumbling_agg",
        "stream_session_window",
        "dedup_exact",
        "dedup_near_jaccard",
        "sim_knn_cosine",
        "text_tokenize_tf",
        "text_tfidf",
        "udf_python_scalar",
        "udf_pandas_scalar",
        "udaf_pandas_grouped",
        "udtf_apply_in_pandas",
    ]
    missing = [k for k in must_check if k not in first50]
    assert not missing, f"not in the first 50 exposure slots: {missing}"


def test_every_oracle_key_is_a_query_key():
    qs, os_ = registry.queries(), registry.oracles()
    assert set(os_) <= set(qs)


def test_no_uncast_integer_sum_case_in_oracles():
    """DuckDB returns HUGEINT for integer SUM — Spark has no int128, so
    the driver's value hash fails on any uncast SUM(CASE…)-style output
    column (the three round-1 FAILs). Every SUM(CASE in an oracle must
    sit inside a CAST( … AS BIGINT/DOUBLE) or a floor(CAST…) rounding."""
    for key, sql in registry.oracles().items():
        for line in sql.splitlines():
            if "SUM(CASE" not in line:
                continue
            if "HAVING" in line or "WHERE" in line:
                continue  # predicate position, never an output column
            before = line.split("SUM(CASE", 1)[0]
            assert "CAST(" in before or "floor(" in before, (
                f"{key}: uncast SUM(CASE…) in oracle line: {line.strip()}"
            )
