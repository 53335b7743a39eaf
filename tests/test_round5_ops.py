"""Semantic invariants for the round-5 additions (feature hashing,
degree stats, conversion latency, linear attribution, keep-best
dedup). Value correctness is oracle-gated in tools/verify_local.py;
these pin the mathematical properties the hash can't see."""

from pyspark.sql import functions as F


def test_feature_hashing_bounds_and_mass(spark, sf_dir):
    from algebraicdb_spark.operators.ml import FH_DIM, ml_feature_hashing

    rows = ml_feature_hashing(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["bucket"] < FH_DIM
        # |signed sum| can never exceed the token count in the bucket
        assert abs(r["val"]) <= r["n_tokens"]
    # token mass is conserved: sum over buckets == total token count
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_tok = d.select(
        F.sum(F.size(F.filter(F.split("text", " "), lambda t: t != "")))
    ).collect()[0][0]
    assert sum(r["n_tokens"] for r in rows) == n_tok


def test_degree_stats_buckets_partition_nodes(spark, sf_dir):
    from algebraicdb_spark.operators.graph import (
        graph_degree_stats,
        graph_triangle_count,
    )

    stats = graph_degree_stats(spark, sf_dir).collect()
    tri = graph_triangle_count(spark, sf_dir).collect()[0]
    # bucket = bit_length(d): 2^(b-1) <= d < 2^b
    for r in stats:
        b = r["bucket"]
        assert 2 ** (b - 1) <= r["min_deg"] <= r["max_deg"] < 2**b
    assert sum(r["n_nodes"] for r in stats) == tri["n_nodes"]
    # handshake lemma: sum of degrees = 2|E|
    assert sum(r["sum_deg"] for r in stats) == 2 * tri["n_edges"]


def test_conversion_latency_ordering(spark, sf_dir):
    from algebraicdb_spark.operators.analytics import (
        event_conversion_latency,
    )

    r = event_conversion_latency(spark, sf_dir).collect()[0]
    assert r["n_converted"] > 0
    assert (
        0
        <= r["min_us"]
        <= r["p50_us"]
        <= r["p90_us"]
        <= r["max_us"]
    )
    assert r["min_us"] <= r["mean_us"] <= r["max_us"]


def test_attribution_conserves_purchase_value(spark, sf_dir):
    """Linear attribution must conserve total purchase value across
    touch types + '(none)' up to the 1e-6 credit grid."""
    from algebraicdb_spark.operators.analytics import attribution_linear

    rows = attribution_linear(spark, sf_dir).collect()
    types = {r["touch_type"] for r in rows}
    assert types <= {"click", "view", "(none)"}
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    total = (
        e.where(F.col("event_type") == "purchase")
        .agg(F.sum("value"))
        .collect()[0][0]
    )
    credited = sum(r["credited_value"] for r in rows)
    n_purchases = e.where(F.col("event_type") == "purchase").count()
    # each purchase's credit splits over <= n_touch grid-floored terms;
    # worst-case loss per purchase ~ n_touch * 1e-6, bounded loosely
    assert credited <= total + 1e-6
    assert total - credited < n_purchases * 0.05


def test_dedup_keep_best_policy(spark, sf_dir):
    """Survivor is the longest doc in its group (ties: smallest id),
    and groups partition the corpus."""
    from algebraicdb_spark.operators.dedup import dedup_keep_best

    kept = dedup_keep_best(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["grp_n"] for r in kept) == n_docs
    assert len({r["set_fp"] for r in kept}) == len(kept)
    assert any(r["grp_n"] > 1 for r in kept), (
        "no multi-doc group — keep-policy untested by fixture"
    )
    # spot-check the policy on the largest group
    big = max(kept, key=lambda r: r["grp_n"])
    from algebraicdb_spark.operators.dedup import canonical_text

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = F.md5(
        F.concat_ws(
            " ",
            F.sort_array(F.array_distinct(F.split(canonical_text("text"), " "))),
        )
    )
    grp = d.select("doc_id", "n_chars", fp.alias("fp")).where(
        F.col("fp") == big["set_fp"]
    ).collect()
    best = sorted(grp, key=lambda r: (-r["n_chars"], r["doc_id"]))[0]
    assert best["doc_id"] == big["kept_id"]


def test_zorder_improves_secondary_dimension(spark, sf_dir):
    """Z-order must trade a wider primary span for a much narrower
    secondary span vs the linear partkey-major layout."""
    from algebraicdb_spark.operators.scans import storage_zorder_advisor

    rows = {r["layout"]: r for r in storage_zorder_advisor(spark, sf_dir).collect()}
    z, lin = rows["zorder"], rows["linear"]
    assert z["n_rows"] == lin["n_rows"]
    assert z["avg_supp_span"] < lin["avg_supp_span"] / 2, (
        "z-order should at least halve the suppkey span"
    )
    assert lin["avg_part_span"] < z["avg_part_span"]  # the price paid


def test_survival_km_is_monotone_and_bounded(spark, sf_dir):
    from algebraicdb_spark.operators.analytics import event_survival_km

    rows = sorted(
        event_survival_km(spark, sf_dir).collect(), key=lambda r: r["t_days"]
    )
    assert rows
    prev_s, prev_risk = 1.0, None
    for r in rows:
        assert 0.0 <= r["s_km"] <= prev_s + 1e-9  # survival non-increasing
        if prev_risk is not None:
            assert r["n_risk"] <= prev_risk  # risk set shrinks
        assert r["n_events"] >= 1
        prev_s, prev_risk = r["s_km"], r["n_risk"]
    # KM lies between the naive bounds: more than 0 (censoring) and
    # below 1 - cumulative-events/initial-risk-set (no censoring)
    total_events = sum(r["n_events"] for r in rows)
    n0 = max(r["n_risk"] for r in rows)
    assert rows[-1]["s_km"] <= 1.0 - total_events / n0 + 1e-9


def test_max_concurrency_histogram_covers_users(spark, sf_dir):
    from algebraicdb_spark.operators.analytics import (
        interval_max_concurrency,
    )
    from pyspark.sql import functions as F  # noqa: F811

    rows = interval_max_concurrency(spark, sf_dir).collect()
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = e.select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        assert r["peak_concurrency"] >= 1


def test_kcore_is_a_fixpoint_within_budget(spark, sf_dir):
    """Every node of the returned core must have degree >= k inside
    the core — i.e. the fixed iteration budget reached the fixpoint
    (if this fails, raise KCORE_ITERS in operator AND oracle)."""
    from algebraicdb_spark.operators.graph import KCORE_K, graph_kcore

    r = graph_kcore(spark, sf_dir).collect()[0]
    assert r["min_core_deg"] >= KCORE_K
    assert r["n_core_nodes"] > 0
    # handshake bound inside the core
    assert r["n_core_edges"] >= r["n_core_nodes"] * KCORE_K / 2


def test_ngram_novelty_prefix_property(spark, sf_dir):
    """Doc 0 (nothing before it) must be 100% novel; novelty is a
    valid fraction; totals are conserved (every shingle is novel for
    exactly one doc)."""
    from algebraicdb_spark.operators.text import text_ngram_novelty

    rows = {r["doc_id"]: r for r in text_ngram_novelty(spark, sf_dir).collect()}
    first = rows[min(rows)]
    assert first["n_novel"] == first["n_shingles"]
    assert abs(first["novelty"] - 1.0) < 1e-9
    for r in rows.values():
        assert 0 <= r["n_novel"] <= r["n_shingles"]
    # conservation: sum of novel shingles == corpus distinct shingles
    from algebraicdb_spark.operators.dedup import shingles

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_distinct = (
        d.select(F.explode(shingles(F.col("text"))).alias("t"))
        .select("t")
        .distinct()
        .count()
    )
    assert sum(r["n_novel"] for r in rows.values()) == n_distinct


def test_pit_features_never_leak(spark, sf_dir):
    """The leakage probe: recompute each purchase's 7-day click count
    INCLUDING the label instant — whenever a click shares the purchase
    timestamp the counts must differ; and the as-of view value must
    come from an event strictly earlier."""
    from algebraicdb_spark.operators.warehouse import feature_pit_join

    small = sf_dir.replace("0.01", "0.001")
    feat = {r["label_id"]: r for r in feature_pit_join(spark, small).collect()}
    from algebraicdb_spark.sources.catalog import load_tables

    ev = (
        load_tables(spark, small)["events"]
        .selectExpr(
            "event_id", "user_id", "event_type", "value", "unix_micros(ts) t"
        )
        .collect()
    )
    by_user = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r)
    checked = 0
    for r in ev:
        if r["event_type"] != "purchase" or r["event_id"] not in feat:
            continue
        hist = by_user[r["user_id"]]
        week = 7 * 24 * 3600 * 1_000_000
        clicks = [
            h
            for h in hist
            if h["event_type"] == "click"
            and r["t"] - week <= h["t"] < r["t"]
        ]
        assert feat[r["event_id"]]["f_clicks_7d"] == len(clicks)
        views = [
            h
            for h in hist
            if h["event_type"] == "view"
            and (h["t"], h["event_id"]) < (r["t"], r["event_id"])
        ]
        want = max(views, key=lambda h: (h["t"], h["event_id"]))["value"] if views else None
        got = feat[r["event_id"]]["f_last_view_val"]
        if want is None:
            assert got is None
        else:
            assert abs(got - want) < 1e-3
        checked += 1
    assert checked > 50


def test_epoch_repeat_weights_and_determinism(spark, sf_dir):
    from algebraicdb_spark.operators.mixing import (
        EPOCH_CAP,
        mix_epoch_repeat,
    )

    a = sorted(mix_epoch_repeat(spark, sf_dir).collect(), key=lambda r: r["source"])
    b = sorted(mix_epoch_repeat(spark, sf_dir).collect(), key=lambda r: r["source"])
    assert a == b  # deterministic
    for r in a:
        assert 1.0 - 1e-9 <= r["realized_epochs"] <= EPOCH_CAP + 1e-9
        assert r["n_instances_out"] >= r["n_docs_in"]
    # the largest source keeps epoch weight exactly 1
    biggest = max(a, key=lambda r: r["tokens_out"] / r["realized_epochs"])
    assert biggest["realized_epochs"] == 1.0


def test_lpa_partitions_nodes_into_communities(spark, sf_dir):
    from algebraicdb_spark.operators.graph import (
        graph_label_propagation,
        graph_triangle_count,
    )

    r = graph_label_propagation(spark, sf_dir).collect()[0]
    tri = graph_triangle_count(spark, sf_dir).collect()[0]
    assert r["n_nodes"] == tri["n_nodes"]  # every node labeled once
    assert 1 <= r["n_communities"] <= r["n_nodes"]
    assert r["largest"] <= r["n_nodes"]
    # propagation actually merged labels (started from n_nodes labels)
    assert r["n_communities"] < r["n_nodes"]


def test_txnlog_snapshot_resolves_rewrite(spark, sf_dir):
    """The snapshot must reflect the v2 compaction: shard-0 rows with
    o_orderkey % 30 == 0 are gone, everything else survives exactly
    once (no double-count from the replaced file)."""
    from algebraicdb_spark.operators.scans import source_txnlog_snapshot
    from algebraicdb_spark.sources.catalog import load_tables

    got = source_txnlog_snapshot(spark, sf_dir)
    o = load_tables(spark, sf_dir)["orders"]
    n_all = o.count()
    n_deleted = o.where(F.col("o_orderkey") % 30 == 0).count()
    assert sum(r["n"] for r in got.collect()) == n_all - n_deleted


def test_m4_preserves_bucket_extremes(spark, sf_dir):
    """Per (series, bucket): the kept rows must include the true min
    and max value of ALL rows in that bucket, and <= 4 flagged roles."""
    from algebraicdb_spark.operators.analytics import time_downsample_m4

    rows = time_downsample_m4(spark, sf_dir).collect()
    assert rows
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault((r["event_type"], r["bucket"]), []).append(r)
    for grp in by_bucket.values():
        assert 1 <= len(grp) <= 4
        assert sum(r["is_min"] for r in grp) == 1
        assert sum(r["is_max"] for r in grp) == 1
        mn = next(r for r in grp if r["is_min"])
        mx = next(r for r in grp if r["is_max"])
        assert mn["value"] <= mx["value"]
        first = next(r for r in grp if r["is_first"])
        last = next(r for r in grp if r["is_last"])
        assert first["t_ns"] <= last["t_ns"]


def test_funnel_unordered_dominates_ordered(spark, sf_dir):
    """Unordered completion is a superset of strict-sequence
    completion: at least as many users complete all 3 steps."""
    from algebraicdb_spark.operators.analytics import (
        event_funnel_unordered,
        event_window_funnel,
    )

    un = {
        r["steps_completed"]: r["n_users"]
        for r in event_funnel_unordered(spark, sf_dir).collect()
    }
    ordered = {
        r["funnel_depth"]: r["n_users"]
        for r in event_window_funnel(spark, sf_dir).collect()
    }
    # dominance, cumulatively: completing the STRICT sequence to depth
    # k within the window implies k unordered steps in some window
    for k in (2, 3):
        un_ge = sum(n for s, n in un.items() if s >= k)
        ord_ge = sum(n for d, n in ordered.items() if d >= k)
        assert un_ge >= ord_ge
    assert sum(un.values()) > 0


def test_interval_frame_matches_numeric_twin(spark, sf_dir):
    """The INTERVAL range frame must agree with an explicit epoch-µs
    numeric range frame on the same data."""
    from pyspark.sql.window import Window

    from algebraicdb_spark.operators.windows import win_time_range_frame
    from algebraicdb_spark.sources.catalog import load_tables

    got = {
        r["event_id"]: r["n_trailing_hour"]
        for r in win_time_range_frame(spark, sf_dir).collect()
    }
    e = load_tables(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    want = {
        r["event_id"]: r["n"]
        for r in e.select(
            "event_id", F.count(F.lit(1)).over(w).alias("n")
        ).collect()
    }
    assert got == want


def test_incremental_dedup_is_associative_with_state(spark, sf_dir):
    """fresh batch docs + old state must equal the one-shot keep-best
    group structure: a batch doc is non-fresh iff its fingerprint
    appeared earlier (in corpus or batch)."""
    from algebraicdb_spark.operators.pipeline import (
        INCR_SPLIT,
        pipeline_incremental_dedup,
    )

    rows = {r["doc_id"]: r["status"] for r in
            pipeline_incremental_dedup(spark, sf_dir).collect()}
    assert rows and all(did >= INCR_SPLIT for did in rows)
    assert set(rows.values()) <= {"fresh", "dup_of_corpus", "dup_in_batch"}
    # cross-check against the global keep-best grouping
    from algebraicdb_spark.operators.dedup import dedup_keep_best

    kept_groups = dedup_keep_best(spark, sf_dir).collect()
    # every batch doc marked fresh must be the FIRST occurrence of its
    # fingerprint corpus-wide => counts line up with groups whose
    # minimum member is >= the split
    n_fresh = sum(1 for s in rows.values() if s == "fresh")
    # recompute first-occurrence doc per set_fp
    from pyspark.sql.window import Window

    from algebraicdb_spark.operators.dedup import canonical_text
    from algebraicdb_spark.sources.catalog import load_tables

    d = load_tables(spark, sf_dir)["documents"]
    fps = d.select(
        "doc_id",
        F.md5(
            F.concat_ws(
                " ",
                F.sort_array(
                    F.array_distinct(F.split(canonical_text("text"), " "))
                ),
            )
        ).alias("fp"),
    )
    firsts = fps.groupBy("fp").agg(F.min("doc_id").alias("first_doc"))
    n_first_in_batch = firsts.where(
        F.col("first_doc") >= INCR_SPLIT
    ).count()
    assert n_fresh == n_first_in_batch
    assert len(kept_groups) >= n_first_in_batch


def test_chunk_overlap_reconstructs_payload(spark, sf_dir):
    """Chunks must tile the payload: stride-spaced starts, full chunks
    of len CHUNK_BYTES except the last, and chunk 0 starts at 0."""
    from algebraicdb_spark.operators.multimodal import (
        CHUNK_BYTES,
        CHUNK_STRIDE,
        multimodal_chunk_overlap,
    )

    rows = multimodal_chunk_overlap(spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert chunks[0]["chunk_idx"] == 0
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c["start_byte"] == c["chunk_idx"] * CHUNK_STRIDE
            assert 1 <= c["chunk_bytes"] <= CHUNK_BYTES
        for c in chunks[:-1]:
            assert c["chunk_bytes"] == CHUNK_BYTES


def test_cart_abandonment_partitions_sessions(spark, sf_dir):
    from algebraicdb_spark.operators.analytics import (
        event_cart_abandonment,
    )
    from algebraicdb_spark.streaming.batch_equiv import event_session_stats

    days = event_cart_abandonment(spark, sf_dir).collect()
    assert days
    n_sessions = sum(r["n_sessions"] for r in days)
    # same sessionizer as event_session_stats => same session count
    stats = event_session_stats(spark, sf_dir).collect()
    assert n_sessions == sum(r["n_sessions"] for r in stats)
    for r in days:
        assert 0 <= r["n_abandoned"] <= r["n_sessions"]
        assert 0.0 <= r["abandonment_rate"] <= 1.0


def test_backlog_timeline_conserves_lines(spark, sf_dir):
    """The sweep must start at 0-net, peak positive, and return to 0
    open lines after the last ship month (every opened line closes)."""
    from algebraicdb_spark.operators.analytics import (
        inventory_backlog_timeline,
    )

    rows = sorted(
        inventory_backlog_timeline(spark, sf_dir).collect(),
        key=lambda r: r["month"],
    )
    assert rows[0]["open_lines"] == rows[0]["net_change"] >= 0
    assert max(r["open_lines"] for r in rows) > 0
    assert rows[-1]["open_lines"] == 0  # all lines eventually ship
    assert sum(r["net_change"] for r in rows) == 0


def test_cusum_closed_form_matches_sequential_replay(spark, sf_dir):
    """The prefix − running-min closed form must equal the textbook
    sequential recurrence S+_t = max(0, S+_{t-1} + y_t), replayed on
    the driver over the tiny day grain."""
    from algebraicdb_spark.operators.analytics import (
        time_changepoint_cusum,
    )
    from algebraicdb_spark.sources.catalog import load_tables

    got = {
        (r["event_type"], r["day"]): r
        for r in time_changepoint_cusum(spark, sf_dir).collect()
    }
    e = load_tables(spark, sf_dir)["events"]
    daily = (
        e.groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "day"
            ),
        )
        .count()
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["count"]))
    for etype, pts in series.items():
        pts.sort()
        n = len(pts)
        s = sum(x for _, x in pts)
        spos = sneg = 0
        for day, x in pts:
            y = x * n - s
            spos = max(0, spos + y)
            sneg = max(0, sneg - y)
            row = got[(etype, day)]
            assert row["cusum_pos"] == spos
            assert row["cusum_neg"] == sneg


def test_kmeans_clusters_partition_corpus(spark, sf_dir):
    from algebraicdb_spark.operators.ml import ml_train_kmeans
    from algebraicdb_spark.sources.catalog import load_tables

    rows = ml_train_kmeans(spark, sf_dir).collect()
    n_vecs = load_tables(spark, sf_dir)["embeddings"].count()
    assert sum(r["n_members"] for r in rows) == n_vecs
    assert 1 <= len(rows) <= 8
    assert sum(r["member_checksum"] for r in rows) == n_vecs * (n_vecs - 1) // 2


def test_kmeans_iterations_do_not_hurt_fit(spark, sf_dir):
    """Spherical Lloyd is monotone between UNIT-centroid
    configurations: the 2-iteration fit must be >= the 1-iteration
    fit (computed with the operator's own refine step)."""
    from pyspark.sql.window import Window

    from algebraicdb_spark.operators.ml import (
        _KM_FIT_GRID,
        ml_train_kmeans,
        spherical_refine,
    )
    from algebraicdb_spark.operators.similarity import dot
    from algebraicdb_spark.sources.catalog import load_tables

    trained_fit = sum(
        r["fit_grid"] for r in ml_train_kmeans(spark, sf_dir).collect()
    )
    e = load_tables(spark, sf_dir)["embeddings"]
    seeds = e.where((F.col("vec_id") % 60 == 0) & (F.col("vec_id") < 480)).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb")
    )
    one_iter = spherical_refine(e, seeds)
    scored = e.crossJoin(F.broadcast(one_iter)).select(
        "vec_id", "c_id", dot(F.col("embedding"), F.col("c_emb")).alias("s")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("s").desc(), F.col("c_id"))
    one_iter_fit = (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .agg(F.sum(F.floor(F.col("s") * _KM_FIT_GRID).cast("bigint")))
        .collect()[0][0]
    )
    assert trained_fit >= one_iter_fit


def test_left_stream_join_supersets_inner(spark, sf_dir):
    from algebraicdb_spark.streaming.batch_equiv import (
        stream_stream_join,
        stream_stream_left_join,
    )

    left = stream_stream_left_join(spark, sf_dir).collect()
    inner_n = stream_stream_join(spark, sf_dir).count()
    matched = [r for r in left if r["unmatched"] == 0]
    unmatched = [r for r in left if r["unmatched"] == 1]
    assert len(matched) == inner_n
    for r in unmatched:
        assert r["purchase_id"] is None and r["purchase_value"] is None
    assert unmatched, "fixture should contain never-converted clicks"


def test_dwell_time_ordering_and_counts(spark, sf_dir):
    from algebraicdb_spark.operators.analytics import event_dwell_time
    from algebraicdb_spark.sources.catalog import load_tables

    rows = event_dwell_time(spark, sf_dir).collect()
    e = load_tables(spark, sf_dir)["events"]
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    # every event except each user's first produces one gap
    assert sum(r["n_gaps"] for r in rows) == n_events - n_users
    for r in rows:
        assert 0 <= r["min_us"] <= r["p50_us"] <= r["p90_us"] <= r["max_us"]


def test_source_overlap_symmetric_and_bounded(spark, sf_dir):
    from algebraicdb_spark.operators.mixing import mix_source_overlap_matrix

    rows = mix_source_overlap_matrix(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["source_a"] < r["source_b"]  # upper triangle only
        assert r["shared_fps"] >= 1
    pairs = {(r["source_a"], r["source_b"]) for r in rows}
    assert len(pairs) == len(rows)  # no duplicate cells


def test_exclude_current_never_self_contaminates(spark, sf_dir):
    """For a customer with n orders all priced P except one at Q, the
    outlier's peer average must be exactly P — spot-check via a
    synthetic-free invariant: peer_avg != own price whenever the
    customer has any price variance and flag is consistent."""
    from algebraicdb_spark.operators.windows import win_exclude_current
    from algebraicdb_spark.sources.catalog import load_tables

    rows = win_exclude_current(spark, sf_dir).collect()
    o = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in load_tables(spark, sf_dir)["orders"].collect()
    }
    import collections

    by_cust = collections.defaultdict(list)
    for r in rows:
        by_cust[r["o_custkey"]].append(r)
    checked = 0
    for cust, rs in list(by_cust.items())[:200]:
        prices = [round(o[r["o_orderkey"]] * 100) for r in rs]
        total = sum(prices)
        for r, cents in zip(rs, prices):
            peers = (total - cents) / (len(rs) - 1) / 100.0
            assert abs(r["peer_avg_price"] - peers) < 1e-3
            assert r["above_peers"] == (
                1 if cents * (len(rs) - 1) > total - cents else 0
            )
            checked += 1
    assert checked > 100


def test_table_checksum_detects_any_row_change(spark, sf_dir):
    """The digest over the real table differs from the digest over
    the table with ONE row's price nudged by a cent — single-row
    sensitivity, the property a replication check lives on."""
    from pyspark.sql import functions as F  # noqa: F811

    from algebraicdb_spark.operators.scans import scan_table_checksum
    from algebraicdb_spark.operators.warehouse import row_hash_input
    from algebraicdb_spark.sources.catalog import load_tables

    base = scan_table_checksum(spark, sf_dir).collect()[0]
    li = load_tables(spark, sf_dir)["lineitem"]
    victim = li.limit(1).collect()[0]
    mutated = li.withColumn(
        "l_extendedprice",
        F.when(
            (F.col("l_orderkey") == victim["l_orderkey"])
            & (F.col("l_partkey") == victim["l_partkey"])
            & (F.col("l_suppkey") == victim["l_suppkey"])
            & (F.col("l_linenumber") == victim["l_linenumber"]),
            F.col("l_extendedprice") + 0.01,
        ).otherwise(F.col("l_extendedprice")),
    )
    row_int = F.conv(
        F.substring(F.md5(row_hash_input(mutated)), 1, 15), 16, 10
    ).cast("bigint")
    mut_sum = mutated.agg(
        F.sum(row_int.cast("decimal(38,0)")).cast("decimal(38,0)")
    ).collect()[0][0]
    assert base["n_rows"] == li.count()
    assert int(mut_sum) != int(base["row_checksum"])


def test_trimmed_mean_between_min_and_max_robust(spark, sf_dir):
    from algebraicdb_spark.operators.aggregates import agg_trimmed_mean
    from algebraicdb_spark.sources.catalog import load_tables

    rows = {r["o_orderstatus"]: r for r in agg_trimmed_mean(spark, sf_dir).collect()}
    o = load_tables(spark, sf_dir)["orders"]
    full = {
        r["o_orderstatus"]: r
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
        )
        .collect()
    }
    for status, r in rows.items():
        f = full[status]
        cut = f["n"] * 5 // 100
        assert r["n_kept"] == f["n"] - 2 * cut
        # cuts strictly inside the full range when anything was trimmed
        if cut > 0:
            assert f["mn"] < r["lo_cut"] <= r["trimmed_mean"] <= r["hi_cut"] < f["mx"]


def test_burn_rate_alert_implies_both_windows(spark, sf_dir):
    from algebraicdb_spark.operators.analytics import (
        BURN_FAST,
        SLO_ERROR_PCT,
        event_error_burn_rate,
    )

    rows = event_error_burn_rate(spark, sf_dir).collect()
    assert rows
    slo = SLO_ERROR_PCT / 100.0
    for r in rows:
        assert 0.0 <= r["ratio_1h"] <= 1.0 and 0.0 <= r["ratio_6h"] <= 1.0
        if r["alert"]:
            assert r["ratio_1h"] > slo * BURN_FAST - 1e-3
            assert r["ratio_6h"] > slo - 1e-3


def test_heaps_law_fit_is_sane(spark, sf_dir):
    from algebraicdb_spark.operators.corpus import corpus_heaps_law

    r = corpus_heaps_law(spark, sf_dir).collect()[0]
    assert r["n_points"] > 100
    # the fixture vocabulary saturates fast (tiny synthetic vocab), so
    # beta must land in [0, 1) and the log-log fit must be tight-ish
    assert 0.0 <= r["beta"] < 1.0
    assert 0.0 <= r["r2"] <= 1.0


def test_jsd_is_symmetric_bounded_metric_like(spark, sf_dir):
    import math

    from algebraicdb_spark.operators.corpus import corpus_js_divergence

    rows = corpus_js_divergence(spark, sf_dir).collect()
    assert len(rows) == 10  # C(5,2) pairs
    for r in rows:
        assert -1e-6 <= r["jsd"] <= math.log(2.0) + 1e-6
        assert r["source_a"] < r["source_b"]


def test_segment_migration_partitions_users(spark, sf_dir):
    from algebraicdb_spark.operators.analytics import (
        event_segment_migration,
    )
    from algebraicdb_spark.sources.catalog import load_tables

    rows = event_segment_migration(spark, sf_dir).collect()
    e = load_tables(spark, sf_dir)["events"]
    n_users = e.select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == n_users
    tiers = {"none", "low", "mid", "high"}
    for r in rows:
        assert r["tier_h1"] in tiers and r["tier_h2"] in tiers
    # checksum conservation: per-cell user sums add to the total
    total_ids = e.select("user_id").distinct().agg(F.sum("user_id")).collect()[0][0]
    assert sum(r["user_checksum"] for r in rows) == total_ids


def test_srm_matches_direct_chi2(spark, sf_dir):
    import math

    from algebraicdb_spark.operators.analytics import event_ab_srm_check
    from algebraicdb_spark.sources.catalog import load_tables

    r = event_ab_srm_check(spark, sf_dir).collect()[0]
    n_users = (
        load_tables(spark, sf_dir)["events"].select("user_id").distinct().count()
    )
    assert r["n_a"] + r["n_b"] == n_users
    exp = n_users / 2.0
    chi2 = sum((n - exp) ** 2 / exp for n in (r["n_a"], r["n_b"]))
    assert abs(r["chi2_grid"] / 1e6 - chi2) < 1e-3
    assert r["srm_alarm"] == (1 if chi2 > 3.841459 else 0)
    # the md5 split on a healthy fixture must NOT trip the alarm
    assert r["srm_alarm"] == 0


def test_gini_matches_driver_formula(spark, sf_dir):
    from algebraicdb_spark.operators.analytics import agg_gini_coefficient
    from algebraicdb_spark.sources.catalog import load_tables

    r = agg_gini_coefficient(spark, sf_dir).collect()[0]
    o = load_tables(spark, sf_dir)["orders"].collect()
    totals = {}
    for row in o:
        totals[row["o_custkey"]] = totals.get(row["o_custkey"], 0) + round(
            row["o_totalprice"] * 100
        )
    xs = sorted(totals.values())
    n, s = len(xs), sum(xs)
    gini = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * s) - (n + 1) / n
    assert 0.0 <= r["gini"] <= 1.0
    assert abs(r["gini"] - gini) < 1e-4
    assert r["n_customers"] == n


def test_acf_lag_bounds_and_self_consistency(spark, sf_dir):
    from algebraicdb_spark.operators.analytics import (
        ACF_MAX_LAG,
        time_autocorrelation_acf,
    )

    rows = time_autocorrelation_acf(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["lag_k"] <= ACF_MAX_LAG
        assert -1.0 - 1e-6 <= r["acf"] <= 1.0 + 1e-6


def test_assortativity_in_valid_range(spark, sf_dir):
    from algebraicdb_spark.operators.graph import (
        graph_assortativity,
        graph_triangle_count,
    )

    r = graph_assortativity(spark, sf_dir).collect()[0]
    tri = graph_triangle_count(spark, sf_dir).collect()[0]
    assert r["n_edges"] == tri["n_edges"]
    assert -1.0 - 1e-6 <= r["assortativity"] <= 1.0 + 1e-6


def test_wow_growth_nulls_first_week_only(spark, sf_dir):
    from algebraicdb_spark.operators.analytics import time_week_over_week

    rows = time_week_over_week(spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for series in by_type.values():
        series.sort(key=lambda r: r["week_s"])
        assert series[0]["prev_n"] is None and series[0]["wow_growth"] is None
        for prev, cur in zip(series, series[1:]):
            assert cur["prev_n"] == prev["n"]
            assert cur["wow_growth"] is not None


def test_containment_supersets_jaccard_pairs(spark, sf_dir):
    """Every Jaccard>=tau pair must breach containment in at least
    one direction (containment >= jaccard always), and containment
    scores stay in (0, 1]."""
    from algebraicdb_spark.operators.dedup import (
        dedup_containment,
        dedup_near_jaccard,
    )

    cont = dedup_containment(spark, sf_dir).collect()
    assert cont
    for r in cont:
        assert 0.0 < r["containment"] <= 1.0 + 1e-9
        assert r["contained"] != r["container"]
    directed = {(r["contained"], r["container"]) for r in cont}
    jac = dedup_near_jaccard(spark, sf_dir).collect()
    for r in jac:
        a, b = r["doc_a"], r["doc_b"]
        if r["jaccard"] >= 0.8:
            assert (a, b) in directed or (b, a) in directed


def test_burstiness_fano_positive_and_function_words_low(spark, sf_dir):
    from algebraicdb_spark.operators.corpus import (
        BURST_TOP_TERMS,
        text_term_burstiness,
    )

    rows = text_term_burstiness(spark, sf_dir).collect()
    assert len(rows) == BURST_TOP_TERMS
    for r in rows:
        assert r["fano"] > 0
        assert r["total_count"] > 0


def test_littles_law_identity_holds(spark, sf_dir):
    """L = lambda * W must hold from the returned figures (same exact
    integers divided two ways)."""
    from algebraicdb_spark.operators.analytics import event_littles_law

    r = event_littles_law(spark, sf_dir).collect()[0]
    lhs = r["avg_concurrency_L"]
    rhs = r["lambda_per_hour"] * r["mean_w_seconds"] / 3600.0
    assert abs(lhs - rhs) / lhs < 1e-3
    assert r["n_arrivals"] > 0 and lhs > 0


def test_repeat_gap_counts_and_ordering(spark, sf_dir):
    from algebraicdb_spark.operators.analytics import (
        orders_repeat_purchase_gap,
    )
    from algebraicdb_spark.sources.catalog import load_tables

    r = orders_repeat_purchase_gap(spark, sf_dir).collect()[0]
    o = load_tables(spark, sf_dir)["orders"]
    n_orders = o.count()
    n_cust = o.select("o_custkey").distinct().count()
    assert r["n_gaps"] == n_orders - n_cust
    assert 0 <= r["min_days"] <= r["p50_days"] <= r["p90_days"] <= r["max_days"]
    assert 0 <= r["n_within_30d"] <= r["n_gaps"]


def test_ppm_codec_roundtrip_and_rejects_garbage():
    """The round-8 real-codec path: decode_ppm_batch must parse what
    encode_ppm_batch writes (values checked against hand math on a
    tiny frame) and loudly reject a non-P6 stream."""
    import pandas as pd
    import pytest

    from algebraicdb_spark.operators.multimodal import (
        decode_ppm_batch,
        encode_ppm_batch,
    )

    # doc_id=0 -> 8x8; text "ab" cycles ababab... so R=97,G=98,B=97
    # for even pixels etc. Compute the expectation directly.
    src = pd.DataFrame({"doc_id": [0], "text": ["ab"]})
    [payload_df] = list(encode_ppm_batch(iter([src])))
    assert bytes(payload_df["payload"][0]).startswith(b"P6\n8 8\n255\n")
    [out] = list(decode_ppm_batch(iter([payload_df])))
    row = out.iloc[0]
    assert (row.width, row.height, row.maxval, row.n_pixels) == (8, 8, 255, 64)
    raw = (b"ab" * 96)[: 8 * 8 * 3]
    expect = sum(
        v * w for v, w in zip(raw, [299, 587, 114] * 64)
    )
    assert row.sum_luma_milli == expect

    bad = pd.DataFrame({"doc_id": [1], "payload": [b"JFIF notppm"]})
    with pytest.raises(ValueError, match="not a P6 stream"):
        list(decode_ppm_batch(iter([bad])))


def test_ppm_codec_roundtrip_property():
    """Property: for ANY non-empty ASCII text and doc_id, the encoded
    P6 stream parses back to the geometry the encoder chose, and the
    luma sum equals the independent pure-Python computation over the
    cycled text bytes — the parser never reads the source row, so
    agreement proves the byte format end to end."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from algebraicdb_spark.operators.multimodal import (
        _ppm_dims,
        decode_ppm_batch,
        encode_ppm_batch,
    )

    @settings(max_examples=50, deadline=None)
    @given(
        doc_id=st.integers(min_value=0, max_value=10**9),
        text=st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=1,
            max_size=200,
        ),
    )
    def check(doc_id, text):
        src = pd.DataFrame({"doc_id": [doc_id], "text": [text]})
        [enc] = list(encode_ppm_batch(iter([src])))
        [out] = list(decode_ppm_batch(iter([enc])))
        row = out.iloc[0]
        w, h = _ppm_dims(doc_id)
        assert (row.width, row.height, row.maxval) == (w, h, 255)
        raw = text.encode()
        n = w * h * 3
        cycled = (raw * (n // len(raw) + 1))[:n]
        expect = sum(
            v * wgt for v, wgt in zip(cycled, [299, 587, 114] * (w * h))
        )
        assert row.sum_luma_milli == expect

    check()


def test_y4m_codec_seek_samples_correct_frames():
    """The Y4M sampler must land on the RIGHT frames by offset
    arithmetic: frame f's Y bytes start at text offset f*7919 mod len,
    so a seek that is off by even one byte changes sum_y."""
    import pandas as pd
    import pytest

    from algebraicdb_spark.operators.multimodal import (
        _Y4M_STRIDE,
        _y4m_geometry,
        encode_y4m_batch,
        sample_y4m_batch,
    )

    doc_id, text = 23, "the quick brown fox jumps over the lazy dog"
    src = pd.DataFrame({"doc_id": [doc_id], "text": [text]})
    [enc] = list(encode_y4m_batch(iter([src])))
    [out] = list(sample_y4m_batch(iter([enc])))
    w, h, n_frames = _y4m_geometry(doc_id)
    assert set(out["n_frames"]) == {n_frames}
    k = min(4, n_frames)
    assert list(out["frame_idx"]) == [(j * n_frames) // k for j in range(k)]
    raw = text.encode()
    for _, row in out.iterrows():
        start = (int(row.frame_idx) * _Y4M_STRIDE) % len(raw)
        cyc = raw * ((start + w * h) // len(raw) + 1)
        assert int(row.sum_y) == sum(cyc[start : start + w * h])

    bad = pd.DataFrame({"doc_id": [1], "payload": [b"RIFF not y4m"]})
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        list(sample_y4m_batch(iter([bad])))


def test_y4m_codec_roundtrip_property():
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from algebraicdb_spark.operators.multimodal import (
        _Y4M_STRIDE,
        _y4m_geometry,
        encode_y4m_batch,
        sample_y4m_batch,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        doc_id=st.integers(min_value=0, max_value=10**9),
        text=st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=1,
            max_size=120,
        ),
    )
    def check(doc_id, text):
        src = pd.DataFrame({"doc_id": [doc_id], "text": [text]})
        [enc] = list(encode_y4m_batch(iter([src])))
        [out] = list(sample_y4m_batch(iter([enc])))
        w, h, n_frames = _y4m_geometry(doc_id)
        raw = text.encode()
        assert len(out) == min(4, n_frames)
        for _, row in out.iterrows():
            start = (int(row.frame_idx) * _Y4M_STRIDE) % len(raw)
            cyc = raw * ((start + w * h) // len(raw) + 1)
            assert int(row.sum_y) == sum(cyc[start : start + w * h])

    check()


def test_wav_codec_roundtrip_and_rejects_garbage():
    """The audio codec path: decode_wav_batch must parse what the
    stdlib wave writer produced (values checked against hand math on a
    tiny clip) and loudly reject non-RIFF / non-PCM16 streams."""
    import math

    import pandas as pd
    import pytest

    from algebraicdb_spark.operators.multimodal import (
        WAV_RATE,
        decode_wav_batch,
        encode_wav_batch,
    )

    # doc_id=0 -> 64 samples; "a0" cycles a0a0... -> s alternates
    # (97-79)<<7 = +2304 and (48-79)<<7 = -3968: every step crosses 0
    src = pd.DataFrame({"doc_id": [0], "text": ["a0"]})
    [enc] = list(encode_wav_batch(iter([src])))
    assert bytes(enc["payload"][0])[:4] == b"RIFF"
    [out] = list(decode_wav_batch(iter([enc])))
    row = out.iloc[0]
    assert (row.sample_rate, row.n_samples) == (WAV_RATE, 64)
    assert row.duration_ms == 64 * 1000 // WAV_RATE
    assert row.zero_crossings == 63
    sq = 32 * (2304 * 2304 + 3968 * 3968)
    assert row.rms_milli == math.isqrt(sq * 1_000_000 // 64)

    bad = pd.DataFrame({"doc_id": [1], "payload": [b"P6 not wav"]})
    with pytest.raises(ValueError, match="not a RIFF/WAVE"):
        list(decode_wav_batch(iter([bad])))


def test_wav_codec_roundtrip_property():
    """Property: for ANY non-empty ASCII text and doc_id, the encoded
    RIFF/WAVE stream parses back to the clip length the encoder chose,
    and rms/zero-crossings equal an independent pure-Python
    computation over the cycled text bytes — the parser never reads
    the source row, so agreement proves the byte format end to end."""
    import math

    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from algebraicdb_spark.operators.multimodal import (
        _WAV_CENTER,
        _wav_n_samples,
        decode_wav_batch,
        encode_wav_batch,
    )

    @settings(max_examples=50, deadline=None)
    @given(
        doc_id=st.integers(min_value=0, max_value=10**9),
        # codepoints beyond ASCII on purpose: multi-byte UTF-8 carries
        # bytes ≥ 0xD0, which a 16-bit overflow in the encoder would
        # silently wrap (the bug class the << 7 scaling prevents)
        text=st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x44F),
            min_size=1,
            max_size=200,
        ),
    )
    def check(doc_id, text):
        src = pd.DataFrame({"doc_id": [doc_id], "text": [text]})
        [enc] = list(encode_wav_batch(iter([src])))
        [out] = list(decode_wav_batch(iter([enc])))
        row = out.iloc[0]
        n = _wav_n_samples(doc_id)
        raw = text.encode()
        s = [((raw * (n // len(raw) + 1))[i] - _WAV_CENTER) * 128 for i in range(n)]
        assert row.n_samples == n
        assert row.rms_milli == math.isqrt(
            sum(v * v for v in s) * 1_000_000 // n
        )
        assert row.zero_crossings == sum(
            1 for a, b in zip(s, s[1:]) if a * b < 0
        )

    check()


def test_wav_features_spark_end_to_end(spark, sf_dir):
    """The audio modality over the real fixture through mapInPandas:
    one feature row per non-empty document, geometry from doc_id, and
    one doc's features spot-checked against the pure-Python math."""
    import math

    from algebraicdb_spark.operators.multimodal import (
        _WAV_CENTER,
        WAV_RATE,
        _wav_n_samples,
        decode_wav_features,
    )
    from algebraicdb_spark.sources.catalog import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    got = decode_wav_features(docs)
    rows = {r["doc_id"]: r for r in got.collect()}
    n_docs = docs.filter("length(text) > 0").count()
    assert len(rows) == n_docs
    assert all(r["sample_rate"] == WAV_RATE for r in rows.values())
    assert all(
        r["n_samples"] == _wav_n_samples(d) for d, r in rows.items()
    )
    d0, text = docs.filter("length(text) > 0").select(
        "doc_id", "text"
    ).orderBy("doc_id").first()
    n = _wav_n_samples(d0)
    raw = text.encode()
    s = [((raw * (n // len(raw) + 1))[i] - _WAV_CENTER) * 128 for i in range(n)]
    assert rows[d0]["rms_milli"] == math.isqrt(
        sum(v * v for v in s) * 1_000_000 // n
    )
