"""Graph mining over the part co-purchase graph.

Two classic warehouse-adjacent graph workloads the relational surface
can express without a graph engine: triangle counting (the standard
graph-health metric, here with the degree-ordered orientation that
makes it feasible at scale) and market-basket association mining
(pair support / confidence / lift). Both run on the same implicit
graph — parts are nodes, "appeared in the same order" is an edge —
built from lineitem with one self-join on l_orderkey, so the shapes
and their costs are exactly the ones a 100 TB co-occurrence pipeline
pays.

Scale notes baked into the plans:
  - Edge building self-joins on l_orderkey AFTER deduplicating to the
    (orderkey, partkey) grain, so pair fan-out is bounded by
    (items-per-basket choose 2), never by raw line count.
  - Triangle counting orients every edge from its (degree, id)-smaller
    endpoint to the larger one. Wedge enumeration then runs over
    out-neighborhoods whose size is O(sqrt(m)) on skewed graphs
    (standard Schank/Wagner bound), instead of the hub-degree² blowup
    the undirected join would pay. Each triangle is counted exactly
    once — no /3 correction, no duplicate-elimination shuffle.
  - All metrics are exact integer counts; ordering near a LIMIT uses
    an exact integer grid (DIV), and every exposed ratio is a single
    IEEE division of exact integers — bit-identical on every engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from algebraicdb_spark.functions.rounding import pround, pround_sql
from algebraicdb_spark.plans.registry import register
from algebraicdb_spark.sources.catalog import load_tables

# Quantity floor keeps the demo graph mid-density (drops ~half the
# lines); the plan is floor-free-correct — it exists so the sf0.1
# graph stays ~100k edges, not to make the algorithm viable.
MIN_QTY = 25

_LI_SQL = f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey
      FROM lineitem WHERE l_quantity >= {MIN_QTY}
    )
"""


def _basket_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(orderkey, partkey) grain of qualifying lines — the baskets."""
    return (
        load_tables(spark, sf_dir)["lineitem"]
        .where(F.col("l_quantity") >= MIN_QTY)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )


def co_purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (pa < pb) co-purchase edges, built basket-at-a-time.

    Round 14 (guide §2.4 — remove shuffles outright): group qualifying
    lines to (order → sorted distinct part array), explode each
    basket's pairs map-side (inline over a transform×transform pair
    generator), then distinct. The edge SET is identical to the former
    basket self-join (A/B count + checksum verified at sf0.1) and the
    pair fan-out bound is the same (items-per-basket choose 2), but
    the self-join — scan×2 / distinct / sort-merge — collapses into
    the groupBy's single shuffle plus a narrow explode: eager edge
    checkpoint 2.8 → 2.0 s at sf0.1. At 100 TB the groupBy shuffles
    the (orderkey, partkey) grain once, exactly what the join's
    exchange moved, and per-task state is one basket's part set
    (bounded small by the basket-size bound all the graph docstrings
    already rely on). Shared by every co-purchase graph key.
    """
    baskets = (
        load_tables(spark, sf_dir)["lineitem"]
        .where(F.col("l_quantity") >= MIN_QTY)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("arr"))
    )
    return baskets.selectExpr(
        "inline(flatten(transform(arr, (x, i) -> "
        "transform(slice(arr, i + 2, size(arr)), y -> struct(x AS pa, y AS pb)))))"
    ).distinct()


@register(
    "graph_triangle_count",
    oracle=_LI_SQL
    + f""",
    edges AS (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT pa AS node FROM edges UNION ALL SELECT pb FROM edges
      ) GROUP BY node
    ),
    oriented AS (
      -- orient from (degree, id)-smaller endpoint to larger
      SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.pa < e.pb)
                  THEN e.pa ELSE e.pb END AS u,
             CASE WHEN da.d < db.d OR (da.d = db.d AND e.pa < e.pb)
                  THEN e.pb ELSE e.pa END AS v
      FROM edges e
      JOIN deg da ON da.node = e.pa
      JOIN deg db ON db.node = e.pb
    ),
    tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM oriented e1
      JOIN oriented e2 ON e2.u = e1.v
      JOIN oriented e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    wedge AS (
      SELECT CAST(SUM((d * (d - 1)) // 2) AS BIGINT) AS n_wedges FROM deg
    )
    SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
           (SELECT COUNT(*) FROM edges) AS n_edges,
           CAST(n_triangles AS BIGINT) AS n_triangles,
           n_wedges,
           {pround_sql("3.0 * n_triangles / n_wedges", 6)} AS clustering
    FROM tri, wedge
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count + global clustering coefficient of the
    co-purchase graph, via degree-ordered edge orientation.

    Scale shape: the classic distributed triangle algorithm
    (MapReduce "NodeIterator++"). Orienting each edge from its
    (degree, id)-smaller endpoint bounds every out-neighborhood by
    O(sqrt(m)), so the wedge join — the only superlinear step — emits
    O(m^1.5) rows worst-case instead of sum(deg_hub²). The closing
    existence check is an equi-join on (u, v): an ordinary shuffle
    hash join, AQE-skew-splittable. No iteration; three shuffles
    total (degree agg, wedge join, closing join).
    """
    # Materialize the edge list once: it feeds FIVE consumers (degree
    # agg twice, orientation, both wedge sides via `e`, edge count) and
    # Spark's reuse-exchange can't unify them, so the un-checkpointed
    # plan re-runs the basket self-join 30+ times. This is exactly what
    # a production graph pipeline does — build the edge list, then run
    # graph ops against the materialized edges (the pagerank/CC keys'
    # localCheckpoint precedent, analytics.py).
    edges = co_purchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("pa") < F.col("pb"))
    )
    # broadcast the node-sized degree table into the orientation
    # (the kcore broadcast note: nodes are O(sqrt) of edges on any
    # graph worth orienting; past broadcast size, drop the hint and
    # AQE plans the shuffled join) — the edge set itself never moves:
    # 2 SortMergeJoin exchanges of edges removed, ~2.9 → ~2.1 s total
    e = (
        edges.join(F.broadcast(deg.withColumnsRenamed({"node": "pa", "d": "da"})), "pa")
        .join(F.broadcast(deg.withColumnsRenamed({"node": "pb", "d": "db"})), "pb")
        .select(
            F.when(lower_first, F.col("pa")).otherwise(F.col("pb")).alias("u"),
            F.when(lower_first, F.col("pb")).otherwise(F.col("pa")).alias("v"),
        )
        .localCheckpoint(eager=False)  # 3 consumers: both wedge sides + closing join
    )
    # wedge (u -> m -> v); middle vertex dropped, duplicates kept —
    # each closed wedge IS one distinct triangle under the orientation
    wedges = e.alias("e1").join(
        e.alias("e2"), F.col("e2.u") == F.col("e1.v")
    ).select(F.col("e1.u").alias("u"), F.col("e2.v").alias("v"))
    n_tri = wedges.join(e, ["u", "v"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    # n_edges = SUM(d) DIV 2 off the degree aggregate (exact bigints;
    # the kcore device) — the former separate COUNT re-scanned the
    # checkpointed edges in its own job + crossJoin
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("(d * (d - 1)) DIV 2")).cast("bigint").alias("n_wedges"),
        # COALESCE: SUM is NULL over an empty degree set where the
        # former COUNT(*) said 0 (ADVICE r14 — empty graph at tiny SFs)
        F.expr("COALESCE(CAST(SUM(d) AS BIGINT), 0) DIV 2").alias("n_edges"),
    )
    return (
        stats.crossJoin(n_tri)  # two 1-row aggregates — no driver round-trip
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            pround(F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6).alias(
                "clustering"
            ),
        )
    )


@register(
    "assoc_basket_lift",
    oracle=_LI_SQL
    + """,
    pair_cnt AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_ab
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    item_cnt AS (
      SELECT l_partkey AS p, COUNT(*) AS n_p FROM li GROUP BY l_partkey
    ),
    tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
    scored AS (
      SELECT pc.pa, pc.pb, pc.n_ab, ia.n_p AS n_a, ib.n_p AS n_b, t.n_orders,
             (pc.n_ab * t.n_orders * 1000000)
               // (CAST(ia.n_p AS BIGINT) * ib.n_p) AS lift_grid
      FROM pair_cnt pc
      JOIN item_cnt ia ON ia.p = pc.pa
      JOIN item_cnt ib ON ib.p = pc.pb
      CROSS JOIN tot t
    )
    SELECT pa, pb, n_ab, n_a, n_b,
           CAST(lift_grid AS DOUBLE) / 1000000 AS lift,
           CAST(n_ab AS DOUBLE) / n_orders AS support,
           CAST(n_ab AS DOUBLE) / n_a AS confidence
    FROM scored
    ORDER BY lift_grid DESC, pa, pb
    LIMIT 20
    """,
)
def assoc_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: top-20 part pairs by lift,
    with support and confidence.

    lift = P(a,b) / (P(a)·P(b)) is ranked on an exact integer grid
    (n_ab·n_orders·10⁶ DIV n_a·n_b) so the top-20 cut is
    engine-identical — no double enters the ordering. The exposed
    support/confidence/lift ratios are single IEEE divisions of
    exact integers (bit-identical on every engine, SURVEY §5.3).

    Scale shape: identical pair fan-out bound as the triangle key
    (per-basket item count, not line count). One orderkey shuffle
    for pairing, one (pa, pb) shuffle for counts; the per-item
    counts and the scalar total are broadcast back — no extra
    all-to-all. HAVING n_ab ≥ 2 drops the singleton-pair tail
    before the broadcast joins touch it.
    """
    # one materialization serves the pair join (both sides), the
    # per-item counts, and the order total — four consumers
    li = _basket_items(spark, sf_dir).localCheckpoint(eager=False)
    pair_cnt = (
        li.alias("a")
        .join(li.alias("b"), on="l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 2)
    )
    item_cnt = li.groupBy(F.col("l_partkey").alias("p")).agg(
        F.count(F.lit(1)).alias("n_p")
    )
    tot = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    scored = (
        pair_cnt.join(
            F.broadcast(item_cnt.withColumnsRenamed({"p": "pa", "n_p": "n_a"})), "pa"
        )
        .join(
            F.broadcast(item_cnt.withColumnsRenamed({"p": "pb", "n_p": "n_b"})), "pb"
        )
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "lift_grid",
            F.expr(
                "(n_ab * n_orders * 1000000L) DIV (CAST(n_a AS BIGINT) * n_b)"
            ),
        )
    )
    w = Window.orderBy(F.col("lift_grid").desc(), "pa", "pb")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 20)
        .select(
            "pa",
            "pb",
            "n_ab",
            "n_a",
            "n_b",
            (F.col("lift_grid").cast("double") / 1_000_000).alias("lift"),
            (F.col("n_ab").cast("double") / F.col("n_orders")).alias("support"),
            (F.col("n_ab").cast("double") / F.col("n_a")).alias("confidence"),
        )
    )


@register(
    "graph_jaccard_neighbors",
    # Neighborhood Jaccard = |N(a) ∩ N(b)| / |N(a) ∪ N(b)| — exact
    # integer counts throughout; the top-20 cut ranks on
    # inter·10⁶ DIV union, an integer grid.
    oracle=_LI_SQL
    + """,
    edges AS (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    adj AS (
      SELECT pa AS node, pb AS nbr FROM edges
      UNION ALL SELECT pb, pa FROM edges
    ),
    deg AS (SELECT node, COUNT(*) AS d FROM adj GROUP BY node),
    inter AS (
      SELECT x.node AS a, y.node AS b, COUNT(*) AS n_common
      FROM adj x JOIN adj y
        ON x.nbr = y.nbr AND x.node < y.node
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
    ),
    scored AS (
      SELECT i.a, i.b, i.n_common, da.d AS deg_a, db.d AS deg_b,
             (i.n_common * 1000000)
               // (CAST(da.d AS BIGINT) + db.d - i.n_common) AS jac_grid
      FROM inter i
      JOIN deg da ON da.node = i.a
      JOIN deg db ON db.node = i.b
    )
    SELECT a, b, n_common, deg_a, deg_b,
           CAST(jac_grid AS DOUBLE) / 1000000 AS jaccard
    FROM scored
    ORDER BY jac_grid DESC, a, b
    LIMIT 20
    """,
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighborhood similarity: the top-20 part
    pairs whose co-purchase NEIGHBORHOODS overlap most (Jaccard of
    adjacency sets) — parts bought alongside the same other parts,
    whether or not they ever share an order themselves. Completes the
    graph family: counting (triangles), components (dedup_components),
    centrality (pagerank), similarity (this).

    Scale shape: candidate pairs enumerate via the shared-neighbor
    join — the same wedge shape as triangle counting, so the same
    hub-degree² hazard; the HAVING floor (≥3 common) prunes the tail
    before the degree joins, and production orients or samples hub
    adjacency just like the triangle key. Counts broadcast back onto
    the candidate aggregate.
    """
    edges = co_purchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    adj = edges.select(F.col("pa").alias("node"), F.col("pb").alias("nbr")).unionAll(
        edges.select(F.col("pb").alias("node"), F.col("pa").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    # shared-neighbor pairs enumerate basket-at-a-time (guide §2.4,
    # the co_purchase_edges/adamic_adar trick): group each shared
    # neighbor's adjacency into a sorted array — ONE shuffle of the
    # edge grain — and explode the a<b pairs map-side, replacing the
    # adj⋈adj self-join that shuffled the wedge input twice into a
    # sort-merge. The C(d,2) hub fan-out is unchanged (same hazard
    # note); the node-grain re-spread keeps the fan-out stage
    # cores-wide after AQE coalesces the tiny grouped rows (§2.5).
    nbhd = (
        adj.groupBy("nbr")
        .agg(F.sort_array(F.collect_set("node")).alias("ns"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    inter = (
        nbhd.selectExpr(
            "inline(flatten(transform(ns, (x, i) -> "
            "transform(slice(ns, i + 2, size(ns)), y -> struct(x AS a, y AS b)))))"
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= 3)
    )
    scored = (
        inter.join(F.broadcast(deg.withColumnsRenamed({"node": "a", "d": "deg_a"})), "a")
        .join(F.broadcast(deg.withColumnsRenamed({"node": "b", "d": "deg_b"})), "b")
        .withColumn(
            "jac_grid",
            F.expr(
                "(n_common * 1000000L) DIV (CAST(deg_a AS BIGINT) + deg_b - n_common)"
            ),
        )
    )
    # top-20 via orderBy+limit (TakeOrderedAndProject): the former
    # un-partitioned row_number window funnelled every scored pair
    # through ONE partition (guide §2.4 — an orderBy used only to cut
    # the top rows); the total order (jac_grid desc, a, b) is the same
    return (
        scored.orderBy(F.col("jac_grid").desc(), "a", "b")
        .limit(20)
        .select(
            "a",
            "b",
            "n_common",
            "deg_a",
            "deg_b",
            (F.col("jac_grid").cast("double") / 1_000_000).alias("jaccard"),
        )
    )


@register(
    "graph_degree_stats",
    oracle=_LI_SQL
    + """,
    edges AS (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT pa AS node FROM edges UNION ALL SELECT pb FROM edges
      ) GROUP BY node
    )
    SELECT CAST(length(bin(d)) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           MIN(d) AS min_deg, MAX(d) AS max_deg,
           CAST(SUM(d) AS BIGINT) AS sum_deg
    FROM deg
    GROUP BY 1
    """,
)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph in power-of-two
    buckets (bucket = bit-length of the degree, i.e. floor(log2 d)+1
    computed in EXACT integer arithmetic via length(bin(d)) — no
    transcendental log whose ulps could differ between engines).

    The first diagnostic a graph pipeline runs before committing to
    a join strategy: a heavy tail here is what forces the salting /
    degree-ordered orientation the triangle and pagerank keys use.

    Scale shape: edge build (one self-join bounded by basket size),
    one degree aggregate, one ~32-group bucket aggregate — the last
    two collapse map-side; nothing is shuffled at node cardinality
    except the degree agg itself.
    """
    # both union legs read edges; uncached, the basket pair explode
    # ran twice — materialize the edge list once
    edges = co_purchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    return (
        deg.groupBy(F.length(F.bin("d")).cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.min("d").alias("min_deg"),
            F.max("d").alias("max_deg"),
            F.sum("d").cast("bigint").alias("sum_deg"),
        )
    )


KCORE_K = 3
KCORE_ITERS = 8  # fixed peel rounds; convergence asserted in pytest


def _kcore_oracle() -> str:
    """Unrolled peeling: iteration i keeps nodes with degree >= k in
    the surviving edge set, then keeps edges with both endpoints
    alive (the ml_train_logreg unrolled-CTE device, applied to graph
    iteration)."""
    ctes = [
        _LI_SQL.strip().removeprefix("WITH").strip()
        + """,
    e0 AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )"""
    ]
    for i in range(KCORE_ITERS):
        ctes.append(f"""
    d{i} AS MATERIALIZED (
      SELECT node FROM (
        SELECT pa AS node FROM e{i} UNION ALL SELECT pb FROM e{i}
      ) GROUP BY node HAVING COUNT(*) >= {KCORE_K}
    ),
    e{i + 1} AS MATERIALIZED (
      SELECT e.pa, e.pb FROM e{i} e
      JOIN d{i} a ON a.node = e.pa
      JOIN d{i} b ON b.node = e.pb
    )""")
    last = f"e{KCORE_ITERS}"
    return (
        "WITH "
        + ",".join(ctes)
        + f""",
    core_deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT pa AS node FROM {last} UNION ALL SELECT pb FROM {last}
      ) GROUP BY node
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_core_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM {last}) AS n_core_edges,
           CAST(SUM(node) AS BIGINT) AS node_checksum,
           MIN(d) AS min_core_deg
    FROM core_deg
    """
    )


@register("graph_kcore", oracle=_kcore_oracle())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core decomposition (k = 3) of the co-purchase graph by
    iterative peeling: drop nodes with degree < k, drop edges that
    lost an endpoint, repeat. The standard "dense cohesive subgraph"
    extraction that precedes community detection — and the dual of
    graph_degree_stats' tail diagnostic.

    Fixed KCORE_ITERS rounds on BOTH engines (peeling is idempotent
    at the fixpoint, so extra rounds are no-ops and a fixed count is
    deterministic; pytest asserts the fixture converges well inside
    the budget — the loud-error discipline dedup_components uses,
    shifted to test time because the oracle must replay the same
    round count). Each round: one degree aggregate + two semi-join
    filters, lineage cut by localCheckpoint every other round. At
    100 TB each round is two shuffles on node id — the same bounded
    shape as dedup_components' label propagation, with the edge set
    monotonically shrinking.
    """
    edges = co_purchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    prev_count = edges.count()  # 1-value probe (the CC discipline)
    for i in range(KCORE_ITERS):
        # NOTE(r14 A/B): lazy-checkpointing deg so both endpoint
        # broadcasts share one aggregate was MEASURED SLOWER (2.05 vs
        # 1.73 s) — the materialization barrier costs more than the
        # duplicated node-sized aggregate. Left as two broadcasts.
        deg = (
            edges.select(F.col("pa").alias("node"))
            .unionAll(edges.select(F.col("pb").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= KCORE_K)
            .select("node")
        )
        # broadcast the surviving-node set into both endpoint filters:
        # nodes are O(sqrt) of edges on this graph (and any graph worth
        # peeling), so the per-round cost collapses to the degree agg's
        # single shuffle — the edge set itself never moves. At a node
        # count too large to broadcast, drop the hint and AQE plans the
        # same two semi-joins shuffled (the pre-hint shape).
        edges = (
            edges.join(
                F.broadcast(deg.withColumnRenamed("node", "pa")),
                "pa",
                "left_semi",
            )
            .join(
                F.broadcast(deg.withColumnRenamed("node", "pb")),
                "pb",
                "left_semi",
            )
            .select("pa", "pb")
        )
        # convergence early-exit EVERY round (round 14 — was every 2nd):
        # an unchanged edge count means no node fell below k, so every
        # later round is a no-op — the fixed-count oracle still matches
        # because peeling is idempotent at the fixpoint. Dense
        # co-purchase graphs converge almost immediately (sf0.1: the
        # 3-core stabilizes after ONE round, dropping 2 of 325k edges),
        # so the every-2nd probe was executing two extra no-op rounds —
        # 2 aggregates + 4 broadcast jobs — to save one count on a
        # checkpointed RDD (~10 ms).
        edges = edges.localCheckpoint(eager=True)
        n = edges.count()
        if n == prev_count:
            break
        prev_count = n
    core_deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # n_core_edges = SUM(d) DIV 2 — every edge contributes one to each
    # endpoint's degree, exact BIGINTs — replacing a separate COUNT
    # aggregate + crossJoin(broadcast) that re-scanned the edge state
    # in its own job (round 14, guide §2.4)
    return core_deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_core_nodes"),
        F.sum("d").cast("bigint").alias("__deg_sum"),
        F.sum("node").cast("bigint").alias("node_checksum"),
        F.min("d").alias("min_core_deg"),
    ).selectExpr(
        "n_core_nodes",
        # COALESCE: the peel can empty the core, where SUM is NULL but
        # the former COUNT(*) said 0 (ADVICE r14)
        "COALESCE(__deg_sum, 0) DIV 2 AS n_core_edges",
        "node_checksum",
        "min_core_deg",
    )


LPA_ROUNDS = 4


def _lpa_oracle() -> str:
    """Unrolled semi-synchronous label propagation: round i relabels
    every node to its neighbors' most frequent round-(i-1) label,
    ties to the smallest label. Fixed rounds on both engines — LPA
    may oscillate, but a fixed-round schedule with a total tie-break
    is exactly reproducible."""
    ctes = [
        _LI_SQL.strip().removeprefix("WITH").strip()
        + """,
    edges AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    und AS MATERIALIZED (
      SELECT pa AS node, pb AS nbr FROM edges
      UNION ALL SELECT pb, pa FROM edges
    ),
    l0 AS MATERIALIZED (
      SELECT DISTINCT node, node AS label FROM und
    )"""
    ]
    for i in range(LPA_ROUNDS):
        ctes.append(f"""
    c{i} AS MATERIALIZED (
      SELECT u.node, l.label, COUNT(*) AS n
      FROM und u JOIN l{i} l ON l.node = u.nbr
      GROUP BY u.node, l.label
    ),
    l{i + 1} AS MATERIALIZED (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY n DESC, label) AS rn
        FROM c{i}) WHERE rn = 1
    )""")
    last = f"l{LPA_ROUNDS}"
    return (
        "WITH "
        + ",".join(ctes)
        + f""",
    comm AS (
      SELECT label, COUNT(*) AS sz FROM {last} GROUP BY label
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
           CAST(SUM(sz) AS BIGINT) AS n_nodes,
           CAST(MAX(sz) AS BIGINT) AS largest,
           CAST(SUM(label * sz) AS BIGINT) AS label_checksum
    FROM comm
    """
    )


@register("graph_label_propagation", oracle=_lpa_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by semi-synchronous label propagation on
    the co-purchase graph: every node adopts its neighbors' most
    frequent label each round (ties -> smallest label), starting from
    self-labels; after a fixed LPA_ROUNDS schedule, communities are
    the surviving labels. Completes the graph family: counting
    (triangles), reachability (components), centrality (pagerank),
    density (k-core), similarity (jaccard) — and now clustering.

    Determinism: synchronous LPA with a (count DESC, label ASC)
    row_number tie-break is a pure function of the round count, so
    the unrolled oracle replays it exactly — no RNG, no async update
    order to disagree on.

    Scale shape per round: one hash join (labels onto the
    undirected adjacency — shuffle on node id), one (node, label)
    count aggregate, one per-node top-1 window. All three stages key
    on node id, so AQE reuses the partitioning; hub skew in the
    adjacency is the salting/AQE-skew case the triangle key's
    degree-orientation discussion covers. Labels shrink monotonically
    in distinct count, never in rows — per-round cost is flat, and
    localCheckpoint every other round caps lineage, exactly the
    dedup_components discipline.
    """
    edges = co_purchase_edges(spark, sf_dir)
    und = (
        edges.select(F.col("pa").alias("node"), F.col("pb").alias("nbr"))
        .unionAll(
            edges.select(F.col("pb").alias("node"), F.col("pa").alias("nbr"))
        )
        .localCheckpoint(eager=True)
    )
    labels = und.select("node").distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(LPA_ROUNDS):
        joined = und.join(
            # node-sized label table broadcast per round (kcore
            # note): the undirected edge list never re-shuffles
            F.broadcast(labels.withColumnRenamed("node", "nbr")), "nbr"
        )
        # ONE aggregate per round (round 15, guide §2.4 — the kcore
        # deg-CTE fold applied here): mode(label, deterministic=true)
        # is exactly the former count + max_by(struct(n, -label))
        # pair — most frequent label, ties to the SMALLEST label (the
        # deterministic flag's documented tie rule) — at one shuffle
        # of the node grain instead of two ((node,label) counts, then
        # (node) top-1). A/B at sf0.1: value-identical on all four
        # stats incl. the tie-sensitive label_checksum.
        labels = joined.groupBy("node").agg(
            F.expr("mode(label, true)").alias("label")
        )
        # LAZY checkpoint per round (round 15): round r's labels are
        # materialized by round r+1's broadcast collect anyway, so an
        # eager ckpt spent a separate job on the same node-grain rows;
        # lazy keeps the lineage cap (the graph_kcore probe lesson)
        # while the broadcast supplies the action. A/B with the mode
        # fold: 3.1-3.6 -> 2.6-2.9 s.
        labels = labels.localCheckpoint(eager=False)
    comm = labels.groupBy("label").agg(F.count(F.lit(1)).alias("sz"))
    return comm.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_communities"),
        F.sum("sz").cast("bigint").alias("n_nodes"),
        F.max("sz").cast("bigint").alias("largest"),
        F.sum(F.col("label") * F.col("sz")).cast("bigint").alias(
            "label_checksum"
        ),
    )


@register(
    "graph_assortativity",
    # degree assortativity (Newman 2002): Pearson correlation of
    # endpoint degrees over edges, computed from exact integer edge
    # moments (degrees are ints; both edge directions counted, which
    # symmetrizes the sums) — one formula, zero floats until the end.
    oracle=_LI_SQL
    + """,
    edges AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS MATERIALIZED (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT pa AS node FROM edges UNION ALL SELECT pb FROM edges
      ) GROUP BY node
    ),
    dir_edges AS (
      SELECT pa AS u, pb AS v FROM edges
      UNION ALL SELECT pb, pa FROM edges
    ),
    moments AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m2,
             CAST(SUM(du.d) AS BIGINT) AS sx,
             CAST(SUM(du.d * dv.d) AS BIGINT) AS sxy,
             CAST(SUM(du.d * du.d) AS BIGINT) AS sxx
      FROM dir_edges e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
    )
    SELECT CAST(m2 // 2 AS BIGINT) AS n_edges,
           floor(CAST((CAST(m2 AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sx)
                 / (CAST(m2 AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 AS DOUBLE) * 1000000 + 0.5) / 1000000 AS assortativity
    FROM moments
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph (Newman 2002):
    do high-degree parts co-occur with other high-degree parts
    (r > 0, social-network-like) or with low-degree ones (r < 0,
    hub-and-spoke)? The one-number structure summary that decides
    whether hub-salting (r < 0 ⇒ hubs meet everyone) or community
    partitioning (r > 0) is the right 100 TB strategy — completing
    the graph family's metrics row.

    Exactness: both directions of every edge enter the sums, making
    Σx = Σy and Σx² = Σy² identical BY CONSTRUCTION, so Newman's r
    reduces to (m·Σxy − (Σx)²)/(m·Σx² − (Σx)²) over four exact
    BIGINT moments — one IEEE expression at the end. Scale: edge
    build + degree agg + ONE join of edges to degrees; moments are
    mergeable partials.
    """
    edges = co_purchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    dir_edges = edges.select(
        F.col("pa").alias("u"), F.col("pb").alias("v")
    ).unionAll(edges.select(F.col("pb").alias("u"), F.col("pa").alias("v")))
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    # node-sized degree sides broadcast (kcore note); the directed
    # edge list never shuffles
    mom = (
        dir_edges.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("m2"),
            F.sum("du").cast("bigint").alias("sx"),
            F.sum(F.col("du") * F.col("dv")).cast("bigint").alias("sxy"),
            F.sum(F.col("du") * F.col("du")).cast("bigint").alias("sxx"),
        )
    )
    m2D = F.col("m2").cast("double")
    sxD = F.col("sx").cast("double")
    r = (m2D * F.col("sxy") - sxD * F.col("sx")) / (
        m2D * F.col("sxx") - sxD * F.col("sx")
    )
    return mom.select(
        F.expr("m2 DIV 2").alias("n_edges"),
        pround(r, 6).alias("assortativity"),
    )


AA_DEG_CAP = 64   # hubs contribute ~0 to Adamic-Adar; capping w's degree
                  # bounds the wedge fan-out at cap * |nodes|
AA_TOP = 20
_AA_GRID = 10**6


@register(
    "graph_adamic_adar",
    # Link prediction: for node pairs NOT already connected, score
    # = sum over common neighbors w of 1/ln(deg(w)), each term
    # grid-floored to an integer at 1e-6 so the sum and the top-20
    # cut are engine-exact. Wedges enumerate only through nodes with
    # deg <= cap (hub commonality is uninformative and unbounded).
    oracle=_LI_SQL
    + f""",
    edges AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    und AS MATERIALIZED (
      SELECT pa AS node, pb AS nbr FROM edges
      UNION ALL SELECT pb, pa FROM edges
    ),
    deg AS MATERIALIZED (
      SELECT node, COUNT(*) AS d FROM und GROUP BY node
    ),
    thru AS MATERIALIZED (
      SELECT u.node AS w, u.nbr,
             CAST(floor({_AA_GRID} / ln(d.d)) AS BIGINT) AS inv_ln_g
      FROM und u JOIN deg d ON d.node = u.node
      WHERE d.d <= {AA_DEG_CAP} AND d.d >= 2
    ),
    wedges AS (
      SELECT a.nbr AS u, b.nbr AS v, a.inv_ln_g
      FROM thru a JOIN thru b ON b.w = a.w AND a.nbr < b.nbr
    ),
    scored AS (
      SELECT u, v, CAST(SUM(inv_ln_g) AS BIGINT) AS score_g
      FROM wedges wd
      WHERE NOT EXISTS (
        SELECT 1 FROM edges e WHERE e.pa = wd.u AND e.pb = wd.v
      )
      GROUP BY u, v
    )
    SELECT u, v, score_g,
           floor(CAST(score_g AS DOUBLE) / {_AA_GRID} * 10000 + 0.5) / 10000
             AS aa_score
    FROM scored
    ORDER BY score_g DESC, u, v
    LIMIT {AA_TOP}
    """,
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the co-purchase graph: score
    every unconnected pair by Σ 1/ln(deg(w)) across common neighbors
    w — rare shared neighbors are strong evidence, hubs are noise.
    The recommender primitive graph_jaccard_neighbors' overlap metric
    leads to; top-20 proposals with a total order.

    Scale discipline: wedges enumerate through MIDDLE nodes only
    (deg(w) ≥ 2 and ≤ AA_DEG_CAP) — capping the middle degree bounds
    fan-out at cap·|nodes| while changing scores only by hub terms
    that contribute ≲ 1/ln(cap) each (the standard production cut;
    uncapped hubs are quadratic AND uninformative). Each 1/ln term is
    grid-floored to an integer, so the sum, ranking, and LIMIT cut
    are bit-identical on both engines. The existing-edge exclusion is
    one anti-join on the oriented pair.
    """
    # edges feeds FIVE consumers (both und legs x {deg, thru} and
    # the anti-join); uncached, Catalyst re-ran the basket pair
    # build per consumer — 18 lineitem scans in the physical
    # plan, 15 s at sf0.1. One edge-grain materialization (the
    # graph itself — the natural persisted artifact of any graph
    # pipeline) cuts it to one pass. Lazy: materializes when the
    # query first executes, so plan-only callers pay nothing.
    edges = co_purchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    und = edges.select(
        F.col("pa").alias("node"), F.col("pb").alias("nbr")
    ).unionAll(edges.select(F.col("pb").alias("node"), F.col("pa").alias("nbr")))
    deg = und.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    # wedges enumerate basket-at-a-time (the co_purchase_edges trick,
    # guide §2.4): group each qualifying middle node's neighbors into
    # a sorted array (one shuffle of the capped edge grain), then
    # explode the u<v pairs MAP-SIDE with w's weight attached — the
    # former thru⋈thru self-join shuffled the wedge input twice and
    # sort-merged it. Per-node fan-out stays bounded by the same
    # AA_DEG_CAP (≤ C(64,2) pairs per middle node).
    thru_g = (
        und.join(F.broadcast(deg), "node")  # node-sized (kcore note)
        .where((F.col("d") <= AA_DEG_CAP) & (F.col("d") >= 2))
        .groupBy("node", "d")
        .agg(F.sort_array(F.collect_set("nbr")).alias("ns"))
        .select(
            F.floor(F.lit(_AA_GRID) / F.log(F.col("d"))).cast("bigint").alias(
                "inv_ln_g"
            ),
            "ns",
        )
        # AQE coalesces the node-grain arrays to a handful of
        # partitions by BYTES, but the C(d,2) explode below multiplies
        # work ~1000×: re-spread the small rows so the fan-out runs
        # cores-wide (guide §2.5 — the cost is one exchange of
        # node-grain arrays, repaid by the wedge stage's parallelism)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    wedges = thru_g.selectExpr(
        "inv_ln_g",
        "inline(flatten(transform(ns, (x, i) -> "
        "transform(slice(ns, i + 2, size(ns)), y -> struct(x AS u, y AS v)))))",
    )
    # existing-edge exclusion as a BROADCAST anti-join (guide §3.1):
    # edges are the node-pair grain — small enough to broadcast here
    # (drop the hint past broadcast size, as the other graph keys
    # document) — so the only wedge-grain exchange left is the final
    # (u, v) score aggregate, with map-side partial aggregation.
    scored = (
        wedges.join(
            F.broadcast(edges.select(F.col("pa").alias("u"), F.col("pb").alias("v"))),
            ["u", "v"],
            "left_anti",
        )
        .groupBy("u", "v")
        .agg(F.sum("inv_ln_g").cast("bigint").alias("score_g"))
    )
    return (
        scored.orderBy(F.col("score_g").desc(), "u", "v")
        .limit(AA_TOP)
        .select(
            "u",
            "v",
            "score_g",
            pround(F.col("score_g").cast("double") / _AA_GRID).alias("aa_score"),
        )
    )


LCC_TOP = 20
_LCC_GRID = 10**6


@register(
    "graph_local_clustering_topk",
    # Per-node local clustering coefficient: 2*tri_v / (d_v*(d_v-1)),
    # nodes with d >= 2; ranked on the exact integer grid
    # floor(1e6 * 2*tri_v / (d_v*(d_v-1))) with (grid, node) total
    # order, top-20. Triangles enumerated once via the degree-ordered
    # orientation, then credited to ALL THREE corners.
    oracle=_LI_SQL
    + f""",
    edges AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS MATERIALIZED (
      SELECT node, COUNT(*) AS d FROM (
        SELECT pa AS node FROM edges UNION ALL SELECT pb FROM edges
      ) GROUP BY node
    ),
    oriented AS MATERIALIZED (
      SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.pa < e.pb)
                  THEN e.pa ELSE e.pb END AS u,
             CASE WHEN da.d < db.d OR (da.d = db.d AND e.pa < e.pb)
                  THEN e.pb ELSE e.pa END AS v
      FROM edges e
      JOIN deg da ON da.node = e.pa
      JOIN deg db ON db.node = e.pb
    ),
    tris AS MATERIALIZED (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM oriented e1
      JOIN oriented e2 ON e2.u = e1.v
      JOIN oriented e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tri_v AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS t FROM (
        SELECT a AS node FROM tris
        UNION ALL SELECT b FROM tris
        UNION ALL SELECT c FROM tris
      ) GROUP BY node
    ),
    lcc AS (
      SELECT d.node, d.d, COALESCE(t.t, 0) AS t,
             CAST(2 * {_LCC_GRID} * COALESCE(t.t, 0)
                  // (d.d * (d.d - 1)) AS BIGINT) AS lcc_g
      FROM deg d LEFT JOIN tri_v t ON t.node = d.node
      WHERE d.d >= 2
    )
    SELECT node, CAST(d AS BIGINT) AS degree, t AS n_triangles,
           floor(CAST(lcc_g AS DOUBLE) / {_LCC_GRID} * 10000 + 0.5) / 10000
             AS local_cc
    FROM lcc
    ORDER BY lcc_g DESC, node
    LIMIT {LCC_TOP}
    """,
)
def graph_local_clustering_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient, top-20: how close each
    node's neighborhood is to a clique (2·tri_v / d_v(d_v−1)). The
    node-level read of graph_triangle_count's global coefficient —
    high-LCC nodes sit inside tight communities (bundle candidates),
    low-LCC high-degree nodes are brokers between them.

    Scale shape: triangles enumerate ONCE through the same
    degree-ordered orientation (O(m^1.5) wedge bound), then each
    triangle credits its three corners via one explode + hash agg —
    no per-node neighborhood materialization. The ranking uses
    integer-DIV grid values with a (grid, node) total order, so the
    LIMIT cut is engine-exact.
    """
    edges = co_purchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("pa") < F.col("pb"))
    )
    # node-sized degree broadcasts (kcore note): edges never shuffle
    # through the orientation
    oriented = (
        edges.join(F.broadcast(deg.withColumnsRenamed({"node": "pa", "d": "da"})), "pa")
        .join(F.broadcast(deg.withColumnsRenamed({"node": "pb", "d": "db"})), "pb")
        .select(
            F.when(lower_first, F.col("pa")).otherwise(F.col("pb")).alias("u"),
            F.when(lower_first, F.col("pb")).otherwise(F.col("pa")).alias("v"),
        )
        .localCheckpoint(eager=False)
    )
    wedges = oriented.alias("e1").join(
        oriented.alias("e2"), F.col("e2.u") == F.col("e1.v")
    ).select(
        F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), F.col("e2.v").alias("c")
    )
    tris = wedges.join(
        oriented.select(F.col("u").alias("a"), F.col("v").alias("c")),
        ["a", "c"],
        "left_semi",
    )
    # credit all three corners in ONE pass: the former three-way
    # unionAll consumed `tris` three times, re-executing the wedge
    # join + closing semi-join per leg (guide §2.4 — don't compute
    # things you throw away); explode(array(a,b,c)) is the same
    # corner multiset as one narrow map over a single enumeration
    tri_v = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    )
    lcc = (
        deg.where(F.col("d") >= 2)
        .join(F.broadcast(tri_v), "node", "left")  # node-sized (kcore note)
        .select(
            "node",
            F.col("d").cast("bigint").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).cast("bigint").alias("n_triangles"),
            F.expr(
                f"CAST(2 * {_LCC_GRID} * COALESCE(t, 0) DIV (d * (d - 1)) AS BIGINT)"
            ).alias("lcc_g"),
        )
    )
    return (
        lcc.orderBy(F.col("lcc_g").desc(), "node")
        .limit(LCC_TOP)
        .select(
            "node",
            "degree",
            "n_triangles",
            pround(F.col("lcc_g").cast("double") / _LCC_GRID).alias("local_cc"),
        )
    )
