"""In-engine model training: logistic regression by batch gradient
descent with a BIT-EXACT cross-engine oracle.

The claim being demonstrated: a training loop is just an iterated
aggregate — per-example gradients are map-side expressions, the
gradient sum is one hash aggregate (the same mergeable-partial shape
as agg_linear_regression), and the weight update is a 1-row combine.
On a cluster each epoch is ONE shuffle of 3 BIGINT partials; no
parameter server, no driver-side math.

Determinism recipe (the pagerank_exact playbook applied to training):
  - features min-max normalized onto an exact 1e6 integer grid
    (integer multiply + floor-division of positive ints),
  - the sigmoid — the only transcendental — is grid-floored to 1e-6
    per example per epoch, so gradient sums are EXACT BIGINTs,
  - weight updates use floor(double/..) on magnitudes < 2^53 (IEEE
    division is correctly rounded, so the floor is engine-identical;
    integer DIV is avoided because Spark truncates toward zero while
    DuckDB floors — they disagree on negatives),
  - the DuckDB oracle replays all 10 epochs as meta-generated
    unrolled CTEs, so the driver hash-checks every trained weight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from algebraicdb_spark.functions.rounding import pround
from algebraicdb_spark.plans.registry import register
from algebraicdb_spark.sources.catalog import load_tables

N_EPOCHS = 10
GRID = 1_000_000  # 1e6 fixed-point scale for features, sigmoid, weights
# learning rate 1/2: dw = grad / (2n) — a power of two, exact in the
# floor-double update at any magnitude

_FEATS_SQL = """
      SELECT CAST(len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS BIGINT) AS x1,
             CAST(n_chars AS BIGINT) AS x2,
             CAST(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS BIGINT) AS y
      FROM documents
"""


def _logreg_oracle(epilogue: str | None = None) -> str:
    """Meta-generate the unrolled 10-epoch training replay; the
    epilogue (a SELECT over final_p + it10) defaults to the trained
    weights + accuracy readout."""
    g = GRID
    parts = [
        f"""
    WITH raw AS ({_FEATS_SQL}),
    bounds AS (
      SELECT MIN(x1) AS l1, MAX(x1) AS h1, MIN(x2) AS l2, MAX(x2) AS h2,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM raw
    ),
    feats AS (
      SELECT ((x1 - l1) * {g}) // (h1 - l1) AS x1n,
             ((x2 - l2) * {g}) // (h2 - l2) AS x2n,
             y, n
      FROM raw, bounds
    ),
    it0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
                   CAST(0 AS BIGINT) AS w2)"""
    ]
    for t in range(1, N_EPOCHS + 1):
        prev = f"it{t - 1}"
        parts.append(
            f""",
    p{t} AS (
      SELECT f.x1n, f.x2n, f.y, f.n,
             CAST(floor({g} / (1 + exp(-(CAST(w.w0
                 + CAST(floor(CAST(w.w1 * f.x1n AS DOUBLE) / {g}) AS BIGINT)
                 + CAST(floor(CAST(w.w2 * f.x2n AS DOUBLE) / {g}) AS BIGINT)
               AS DOUBLE) / {g})))) AS BIGINT) AS ps
      FROM feats f, {prev} w
    ),
    it{t} AS (
      SELECT w.w0 - CAST(floor(CAST(SUM((p.ps - p.y * {g}) * {g}) AS DOUBLE)
                          / (2.0 * MIN(p.n) * {g})) AS BIGINT) AS w0,
             w.w1 - CAST(floor(CAST(SUM((p.ps - p.y * {g}) * p.x1n) AS DOUBLE)
                          / (2.0 * MIN(p.n) * {g})) AS BIGINT) AS w1,
             w.w2 - CAST(floor(CAST(SUM((p.ps - p.y * {g}) * p.x2n) AS DOUBLE)
                          / (2.0 * MIN(p.n) * {g})) AS BIGINT) AS w2
      FROM p{t} p, {prev} w
      GROUP BY w.w0, w.w1, w.w2
    )"""
        )
    t = N_EPOCHS
    parts.append(
        f""",
    final_p AS (
      SELECT f.y, f.n,
             CAST(floor({g} / (1 + exp(-(CAST(w.w0
                 + CAST(floor(CAST(w.w1 * f.x1n AS DOUBLE) / {g}) AS BIGINT)
                 + CAST(floor(CAST(w.w2 * f.x2n AS DOUBLE) / {g}) AS BIGINT)
               AS DOUBLE) / {g})))) AS BIGINT) AS ps
      FROM feats f, it{t} w
    )
    """
    )
    if epilogue is None:
        epilogue = f"""
    SELECT MIN(p.n) AS n,
           floor((CAST(w.w0 AS DOUBLE) / {g}) * 1000000 + 0.5) / 1000000 AS w0,
           floor((CAST(w.w1 AS DOUBLE) / {g}) * 1000000 + 0.5) / 1000000 AS w1,
           floor((CAST(w.w2 AS DOUBLE) / {g}) * 1000000 + 0.5) / 1000000 AS w2,
           CAST(SUM(CASE WHEN (p.ps >= {g // 2}) = (p.y = 1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           floor((CAST(SUM(CASE WHEN (p.ps >= {g // 2}) = (p.y = 1)
                                THEN 1 ELSE 0 END) AS DOUBLE) / MIN(p.n))
                 * 1000000 + 0.5) / 1000000 AS accuracy
    FROM final_p p, it{t} w
    GROUP BY w.w0, w.w1, w.w2
    """
    parts.append(epilogue)
    return "".join(parts)


def _sigmoid_grid(w0, w1, w2):
    """floor(1e6·sigmoid(z)) with z assembled in exact fixed point."""
    g = GRID
    z_s = (
        w0
        + F.floor((w1 * F.col("x1n")).cast("double") / g).cast("long")
        + F.floor((w2 * F.col("x2n")).cast("double") / g).cast("long")
    )
    z = z_s.cast("double") / g
    return F.floor(F.lit(float(g)) / (F.lit(1.0) + F.exp(-z))).cast("long")


def _sigmoid_grid_sql(w0: int, w1: int, w2: int) -> str:
    """SQL-text twin of :func:`_sigmoid_grid` for integer literal
    weights — the same expression tree (long affine z on the 1e6
    grid, one double division per term, floor, one EXP), so the
    values are bit-identical; rendered as text so the per-epoch plan
    build is a handful of py4j calls instead of ~60 (guide §1.2
    driver-side per-task work)."""
    g = GRID
    z_s = (
        f"({w0}L"
        f" + FLOOR(CAST(({w1}L * x1n) AS DOUBLE) / {g})"
        f" + FLOOR(CAST(({w2}L * x2n) AS DOUBLE) / {g}))"
    )
    return (
        f"CAST(FLOOR(CAST({g} AS DOUBLE) / "
        f"(CAST(1 AS DOUBLE) + EXP(-(CAST({z_s} AS DOUBLE) / {g})))) AS BIGINT)"
    )


def _logreg_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-normalized (x1n, x2n, y, n) feature table both logreg keys
    train on — built once, lazily checkpointed (epochs re-scan it)."""
    from algebraicdb_spark.operators.dedup import canonical_text

    g = GRID
    docs = load_tables(spark, sf_dir)["documents"]
    raw = docs.select(
        F.size(F.split(canonical_text(F.col("text")), " ")).cast("long").alias("x1"),
        F.col("n_chars").cast("long").alias("x2"),
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).cast("long").alias("y"),
    )
    b = raw.agg(
        F.min("x1").alias("l1"),
        F.max("x1").alias("h1"),
        F.min("x2").alias("l2"),
        F.max("x2").alias("h2"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return (
        raw.crossJoin(F.broadcast(b))
        .select(
            F.expr(f"((x1 - l1) * {g}) DIV (h1 - l1)").alias("x1n"),
            F.expr(f"((x2 - l2) * {g}) DIV (h2 - l2)").alias("x2n"),
            "y",
            "n",
        )
        .localCheckpoint(eager=False)
    )


def _train_weights(feats: DataFrame) -> tuple[int, int, int]:
    """N_EPOCHS of batch gradient descent with literal weights: per
    epoch ONE global aggregate (three BIGINT gradient partials + n)
    collected as one row, the update replayed in exact Python ints
    with the identical IEEE division + floor the in-plan expression
    computed. Shared by ml_train_logreg and ml_eval_calibration so
    the trained weights stay hash-locked between both keys."""
    import math

    g = GRID
    w0 = w1 = w2 = 0
    for _ in range(N_EPOCHS):
        ps = _sigmoid_grid_sql(w0, w1, w2)
        err = f"(({ps}) - y * {g})"
        row = feats.selectExpr(
            f"SUM({err} * {g}) AS g0",
            f"SUM({err} * x1n) AS g1",
            f"SUM({err} * x2n) AS g2",
            "MIN(n) AS n",
        ).collect()[0]
        # the EXACT update the old in-plan expression computed:
        # w - floor(CAST(grad AS DOUBLE) / ((2.0 * n) * g)) as long.
        # Gradients are exact BIGINTs < 2^53, so float(grad) is the
        # same double the Spark cast produced; one IEEE division +
        # floor matches bit-for-bit.
        step = 2.0 * row["n"] * g
        w0 -= math.floor(float(row["g0"]) / step)
        w1 -= math.floor(float(row["g1"]) / step)
        w2 -= math.floor(float(row["g2"]) / step)
    return w0, w1, w2


@register("ml_train_logreg", oracle=_logreg_oracle())
def ml_train_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a 2-feature logistic regression (predicting the long-doc
    gate n_chars ≥ 300 from token count + char count) with 10 epochs
    of batch gradient descent, entirely in-engine, and return the
    trained weights + training accuracy — all value-hash-checked
    against a DuckDB replay of every epoch.

    Scale shape: per epoch ONE hash aggregate whose shuffle carries
    three BIGINT gradient partials (map-side combined), plus the
    weights flowing back as three BIGINTs — the minimal synchronous-
    SGD topology. Round 14 (guide §7.3 driver time): the weights now
    come back via a 1-row collect and re-enter the next epoch as
    LITERALS, replacing the per-epoch eager localCheckpoint +
    crossJoin(broadcast(weights)) — which cost a full Catalyst
    analyze + broadcast-build + extra job per epoch for the same three
    numbers (measured: 3.5 s wall, of which only 0.7 s was executing).
    Per-epoch driver traffic is O(model) = 3 BIGINTs either way (the
    O(1)-probe discipline); the update arithmetic is replayed in exact
    Python ints/IEEE doubles, so the trained weights — and the oracle
    hash — are bit-identical. 3.5 s → ~1.3 s at sf0.1/local[32].
    """
    g = GRID
    feats = _logreg_feats(spark, sf_dir)
    w0, w1, w2 = _train_weights(feats)
    final = feats.select(
        "y",
        "n",
        F.lit(w0).cast("long").alias("w0"),
        F.lit(w1).cast("long").alias("w1"),
        F.lit(w2).cast("long").alias("w2"),
        _sigmoid_grid(F.lit(w0), F.lit(w1), F.lit(w2)).alias("ps"),
    )
    correct = F.sum(
        F.when((F.col("ps") >= g // 2) == (F.col("y") == 1), 1).otherwise(0)
    )
    return final.groupBy("w0", "w1", "w2").agg(
        F.min("n").alias("n"),
        correct.cast("long").alias("n_correct"),
        pround(correct.cast("double") / F.min("n"), 6).alias("accuracy"),
    ).select(
        "n",
        pround(F.col("w0").cast("double") / g, 6).alias("w0"),
        pround(F.col("w1").cast("double") / g, 6).alias("w1"),
        pround(F.col("w2").cast("double") / g, 6).alias("w2"),
        "n_correct",
        "accuracy",
    )


@register(
    "ml_eval_calibration",
    # Reliability diagram for the trained model: predictions bucketed
    # on their exact 1e6 grid (bucket = ps DIV 1e5 -> 10 bins, integer
    # division of non-negative ints agrees across engines), per-bin
    # observed rate vs mean predicted probability. Replays the SAME
    # unrolled training CTEs as ml_train_logreg, then one extra
    # aggregate — the oracle is the training oracle's epilogue.
    oracle=_logreg_oracle(
        epilogue="""
    SELECT p.ps // 100000 AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_bin,
           CAST(SUM(p.y) AS BIGINT) AS n_pos,
           floor((CAST(SUM(p.y) AS DOUBLE) / COUNT(*)) * 1000000 + 0.5) / 1000000
             AS observed_rate
    FROM final_p p GROUP BY 1
    """
    ),
)
def ml_eval_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration (reliability) report for the trained logistic
    regression: predictions bucketed into 10 probability bins, each
    with its observed positive rate — the companion readout to
    accuracy/AUC that says whether the probabilities MEAN anything.

    Scale shape: re-runs the ml_train_logreg loop (the SAME
    _train_weights literal-weight epochs — one 3-BIGINT aggregate per
    epoch), then one 10-group hash aggregate over the final forward
    pass. The oracle is the training oracle's unrolled CTEs with a
    different epilogue — trained weights stay hash-locked between
    both keys by construction (shared trainer).
    """
    feats = _logreg_feats(spark, sf_dir)
    w0, w1, w2 = _train_weights(feats)
    final = feats.select(
        "y", _sigmoid_grid(F.lit(w0), F.lit(w1), F.lit(w2)).alias("ps")
    )
    return (
        final.select(F.expr("ps DIV 100000").alias("bin"), "y")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bin"),
            F.sum("y").cast("long").alias("n_pos"),
            pround(F.sum("y").cast("double") / F.count(F.lit(1)), 6).alias(
                "observed_rate"
            ),
        )
    )


FH_DIM = 32  # hashed feature dimension


@register(
    "ml_feature_hashing",
    # signed hashing trick (Weinberger et al., ICML'09): bucket =
    # md5(token) % D from the first 8 hex chars, sign = parity of the
    # 9th hex char. Both engines read the identical hex substrings, so
    # features are bit-identical with zero vocabulary state.
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ), hashed AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % {FH_DIM}
               AS bucket,
             CASE WHEN CAST(('0x' || substr(md5(tok), 9, 1)) AS BIGINT) % 2
                       = 0 THEN 1 ELSE -1 END AS sgn
      FROM tok WHERE tok <> ''
    )
    SELECT doc_id, bucket,
           CAST(SUM(sgn) AS BIGINT) AS val,
           CAST(COUNT(*) AS BIGINT) AS n_tokens
    FROM hashed
    GROUP BY doc_id, bucket
    """,
)
def ml_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick text featurization: each token maps to one of
    FH_DIM buckets by md5, contributing +1/-1 by a second hash bit
    (the sign trick keeps collision noise zero-mean, so E[<phi(a),
    phi(b)>] equals the true kernel). The layer every large-scale
    linear/recsys model uses to featurize unbounded vocabularies with
    ZERO vocabulary state — no dictionary build, no OOV path, and a
    new shard never reshuffles existing features.

    Scale shape: pure map-side expression per token (md5 + substring
    + modulo, all codegen'd JVM built-ins) followed by ONE partial+
    final hash aggregate on (doc_id, bucket). No vocabulary
    broadcast, no second pass — contrast text_tfidf, which needs the
    corpus-wide document-frequency join. Output stays sparse long
    format; densifying to array<float> is a single groupBy collect
    the consumer does at model-ingest time.
    """
    d = load_tables(spark, sf_dir)["documents"]
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    h = F.md5(F.col("tok"))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % FH_DIM
    sgn = F.when(
        F.conv(F.substring(h, 9, 1), 16, 10).cast("bigint") % 2 == 0, 1
    ).otherwise(-1)
    return (
        tok.select("doc_id", bucket.alias("bucket"), sgn.alias("sgn"))
        .groupBy("doc_id", "bucket")
        .agg(
            F.sum("sgn").cast("bigint").alias("val"),
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        )
    )


KMEANS_ITERS = 2
_KM_FIT_GRID = 10**6


def _kmeans_oracle() -> str:
    """Unrolled 2-iteration Lloyd replay: stride seeds, fold-order
    dot assignment (argmax, c_id tie-break), grid-floored integer
    means — the sim_knn_ivf training device, run for a second
    iteration and finished with cluster-level fit statistics."""
    from algebraicdb_spark.operators.similarity import (
        _MEAN_GRID,
        _fold_dot,
    )

    ctes = [
        """seeds AS MATERIALIZED (
      SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings
      WHERE vec_id % 60 = 0 AND vec_id < 480
    )"""
    ]
    prev = "seeds"
    for i in range(KMEANS_ITERS):
        ctes.append(f"""
    a{i} AS MATERIALIZED (
      SELECT vec_id, embedding, c_id FROM (
        SELECT e.vec_id, e.embedding, c.c_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_fold_dot('e.embedding', 'c.c_emb')} DESC,
                          c.c_id) AS r
        FROM embeddings e CROSS JOIN {prev} c
      ) WHERE r = 1
    ),
    dims{i} AS MATERIALIZED (
      SELECT c_id, u.dim, u.v
      FROM a{i} t,
           LATERAL (SELECT UNNEST(t.embedding) AS v,
                           generate_subscripts(t.embedding, 1) AS dim) u
    ),
    raw_cents{i} AS MATERIALIZED (
      SELECT c_id, list(CAST(m AS FLOAT) ORDER BY dim) AS c_raw
      FROM (
        SELECT c_id, dim,
               (CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * {_MEAN_GRID})
                              AS BIGINT)) AS DOUBLE) / {_MEAN_GRID}.0)
                 / COUNT(*) AS m
        FROM dims{i} GROUP BY c_id, dim
      ) GROUP BY c_id
    ),
    cents{i} AS MATERIALIZED (
      -- spherical k-means: project the mean back to the unit sphere
      -- (the mean direction is the EXACT argmax of the summed-dot
      -- objective over unit centroids, which keeps Lloyd monotone)
      SELECT c_id,
             list_transform(c_raw,
               x -> CAST(CAST(x AS DOUBLE) /
                    sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                      list_transform(range(1, 65),
                        i -> CAST(c_raw[i] AS DOUBLE)
                             * CAST(c_raw[i] AS DOUBLE))),
                      (a, b) -> a + b)) AS FLOAT)) AS c_emb
      FROM raw_cents{i}
    )""")
        prev = f"cents{i}"
    return (
        "WITH "
        + ",".join(ctes)
        + f""",
    final_a AS (
      SELECT vec_id, c_id, fit_g FROM (
        SELECT e.vec_id, c.c_id,
               CAST(floor({_fold_dot('e.embedding', 'c.c_emb')}
                          * {_KM_FIT_GRID}) AS BIGINT) AS fit_g,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_fold_dot('e.embedding', 'c.c_emb')} DESC,
                          c.c_id) AS r
        FROM embeddings e CROSS JOIN {prev} c
      ) WHERE r = 1
    )
    SELECT c_id AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(vec_id) AS BIGINT) AS member_checksum,
           CAST(SUM(fit_g) AS BIGINT) AS fit_grid
    FROM final_a GROUP BY c_id
    """
    )


def spherical_refine(e: DataFrame, cents: DataFrame) -> DataFrame:
    """One spherical-k-means iteration: Lloyd assignment + grid-exact
    mean (shared with IVF), then projection back to the unit sphere.
    The unit mean direction is the exact argmax of the summed-dot
    objective over unit centroids, so iterations are monotone in the
    total fit (pytest pins this). Fold order of the norm matches the
    oracle: sequential dim-order sum of squared doubles."""
    from algebraicdb_spark.operators.similarity import _refine_centroids

    def renorm(c):
        norm = F.sqrt(
            F.aggregate(
                F.transform(c, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        return F.transform(
            c, lambda x: (x.cast("double") / norm).cast("float")
        )

    return _refine_centroids(e, cents).select(
        "c_id", renorm(F.col("c_emb")).alias("c_emb")
    )


def build_kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means train half -> (c_id, c_emb): deterministic stride seeds
    + KMEANS_ITERS spherical Lloyd rounds. Persist with
    ``Engine.save_model(kind='kmeans_centroids')`` — the clustering
    twin of build_ivf_centroids (same trainer, more rounds)."""
    e = load_tables(spark, sf_dir)["embeddings"]
    cents = e.where(
        (F.col("vec_id") % 60 == 0) & (F.col("vec_id") < 480)
    ).select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb"))
    for _ in range(KMEANS_ITERS):
        cents = spherical_refine(e, cents).localCheckpoint(eager=True)
    return cents


def kmeans_assign(e: DataFrame, cents: DataFrame) -> DataFrame:
    """The inference half: broadcast-argmax assignment + per-cluster
    membership/fit stats over given (possibly reloaded) centroids —
    zero training stages."""
    from pyspark.sql.window import Window

    from algebraicdb_spark.operators.similarity import dot

    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "c_id",
        dot(F.col("embedding"), F.col("c_emb")).alias("s"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("s").desc(), F.col("c_id"))
    final_a = (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select(
            "vec_id",
            "c_id",
            F.floor(F.col("s") * _KM_FIT_GRID).cast("bigint").alias("fit_g"),
        )
    )
    return final_a.groupBy(F.col("c_id").alias("cluster_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum("vec_id").cast("bigint").alias("member_checksum"),
        F.sum("fit_g").cast("bigint").alias("fit_grid"),
    )


@register("ml_train_kmeans", oracle=_kmeans_oracle())
def ml_train_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine k-means training: 2 full Lloyd iterations from
    deterministic stride seeds, finished with per-cluster membership
    and fit statistics — the third in-engine trainer next to
    ml_train_logreg (GD) and the IVF index builder (whose single
    iteration this generalizes).

    Every iteration is the declarative shape that scales: a
    broadcast-centroid argmax assignment (k×|corpus| map work, no
    corpus shuffle) and a posexplode per-dimension mean whose shuffle
    is k×64 integer cells. Means are 1e-9-grid integer sums (order-
    free), assignment similarity is the shared fold-order dot, and
    the cluster fit total sums 1e-6-grid integers — bit-replayable
    end-to-end by the unrolled oracle. Composition of
    ``build_kmeans_centroids`` (persistable via Engine.save_model)
    and ``kmeans_assign`` (zero training stages).
    """
    e = load_tables(spark, sf_dir)["embeddings"]
    return kmeans_assign(e, build_kmeans_centroids(spark, sf_dir))


@register(
    "feature_target_encoding_loo",
    # Leave-one-out target encoding of o_orderpriority against the
    # binary target (o_orderstatus = 'F'): enc_i = (S_cat - y_i) /
    # (n_cat - 1). Within a (category, y) cell the encoding is
    # constant, so the full encoded table collapses to one row per
    # cell — counts exact, encoding one IEEE division on a 1e-6 grid.
    oracle="""
    WITH t AS (
      SELECT o_orderpriority AS cat,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ), agg AS (
      SELECT cat,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s
      FROM t GROUP BY cat
    )
    SELECT t.cat, t.y,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           floor(CAST(a.s - t.y AS DOUBLE) / (a.n - 1) * 1000000 + 0.5)
             / 1000000 AS loo_encoding
    FROM t JOIN agg a ON a.cat = t.cat
    GROUP BY t.cat, t.y, a.s, a.n
    """,
)
def feature_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding — the categorical-feature staple
    that replaces a category with the target mean of the OTHER rows
    of that category: enc_i = (S_cat − y_i)/(n_cat − 1). The LOO
    exclusion is what stops the encoding from leaking each row's own
    label (plain mean encoding memorizes singleton categories; LOO
    makes them useless, as they should be).

    The algebra does the heavy lifting: within one (category, y)
    cell the encoding is a constant, so the encoded TABLE (150k rows)
    collapses to |categories| × 2 output rows — the whole transform
    is two hash aggregates and one broadcast join, with the encoding
    computed ONCE per cell instead of per row. That identity is the
    100 TB design: the per-row map is a join against a tiny
    broadcast dictionary of cell constants.
    """
    o = load_tables(spark, sf_dir)["orders"]
    t = o.select(
        F.col("o_orderpriority").alias("cat"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    agg = t.groupBy("cat").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
    )
    cells = t.groupBy("cat", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    return cells.join(F.broadcast(agg), "cat").select(
        "cat",
        "y",
        "n_rows",
        (
            F.floor(
                (F.col("s") - F.col("y")).cast("double")
                / (F.col("n") - 1)
                * 1000000
                + 0.5
            )
            / 1000000
        ).alias("loo_encoding"),
    )


CONF_THRESHOLDS = (10000, 60000, 150000)  # score cut in whole dollars


@register(
    "ml_eval_confusion_prf",
    # Thresholded-classifier evaluation: score = o_totalprice, label =
    # (o_orderstatus = 'F'); one confusion matrix + precision/recall/
    # F1 per threshold. All four cells from ONE conditional aggregate
    # per threshold; P/R/F1 are single IEEE divisions of exact counts
    # (F1 via 2tp/(2tp+fp+fn) — no chained rounded ratios).
    oracle=f"""
    WITH t AS (
      SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             o_totalprice AS score
      FROM orders
    ), th(thresh) AS (VALUES {', '.join(f'({v})' for v in CONF_THRESHOLDS)})
    SELECT th.thresh,
           CAST(SUM(CASE WHEN score >= th.thresh AND y = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN score >= th.thresh AND y = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN score < th.thresh AND y = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS fn,
           CAST(SUM(CASE WHEN score < th.thresh AND y = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS tn,
           floor(CAST(SUM(CASE WHEN score >= th.thresh AND y = 1 THEN 1 ELSE 0 END)
                      AS DOUBLE)
                 / NULLIF(CAST(SUM(CASE WHEN score >= th.thresh THEN 1 ELSE 0 END)
                               AS BIGINT), 0)
                 * 10000 + 0.5) / 10000 AS precision_,
           floor(CAST(SUM(CASE WHEN score >= th.thresh AND y = 1 THEN 1 ELSE 0 END)
                      AS DOUBLE)
                 / NULLIF(CAST(SUM(y) AS BIGINT), 0) * 10000 + 0.5) / 10000
             AS recall_,
           floor(CAST(2 * SUM(CASE WHEN score >= th.thresh AND y = 1 THEN 1 ELSE 0 END)
                      AS DOUBLE)
                 / NULLIF(CAST(2 * SUM(CASE WHEN score >= th.thresh AND y = 1 THEN 1 ELSE 0 END)
                               AS BIGINT)
                          + CAST(SUM(CASE WHEN score >= th.thresh AND y = 0 THEN 1 ELSE 0 END)
                                 AS BIGINT)
                          + CAST(SUM(CASE WHEN score < th.thresh AND y = 1 THEN 1 ELSE 0 END)
                                 AS BIGINT), 0)
                 * 10000 + 0.5) / 10000 AS f1
    FROM t CROSS JOIN th
    GROUP BY th.thresh
    """,
)
def ml_eval_confusion_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + precision/recall/F1 at a threshold ladder —
    the operating-point evaluation that complements ml_eval_auc's
    ranking view and ml_eval_calibration's probability view (a model
    ships at ONE threshold; AUC alone can't pick it).

    All four confusion cells come from one conditional hash aggregate
    per threshold (a 3-row broadcast of the ladder — no second scan
    per threshold), and every ratio is a single IEEE division of
    exact counts: F1 computed directly as 2tp/(2tp+fp+fn), never from
    the pre-rounded P and R. NULL (not fake 0.0) where a denominator
    is empty.
    """
    o = load_tables(spark, sf_dir)["orders"]
    t = o.select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        F.col("o_totalprice").alias("score"),
    )
    th = spark.createDataFrame(
        [(v,) for v in CONF_THRESHOLDS], "thresh int"
    )
    pos = F.col("score") >= F.col("thresh")
    tp = F.sum(F.when(pos & (F.col("y") == 1), 1).otherwise(0)).cast("bigint")
    fp = F.sum(F.when(pos & (F.col("y") == 0), 1).otherwise(0)).cast("bigint")
    fn = F.sum(F.when(~pos & (F.col("y") == 1), 1).otherwise(0)).cast("bigint")
    tn = F.sum(F.when(~pos & (F.col("y") == 0), 1).otherwise(0)).cast("bigint")
    grid = lambda c: F.floor(c * 10000 + 0.5) / 10000  # noqa: E731
    agg = t.crossJoin(F.broadcast(th)).groupBy("thresh").agg(
        tp.alias("tp"), fp.alias("fp"), fn.alias("fn"), tn.alias("tn")
    )
    return agg.select(
        "thresh",
        "tp",
        "fp",
        "fn",
        "tn",
        grid(
            F.col("tp").cast("double")
            / F.nullif(F.col("tp") + F.col("fp"), F.lit(0))
        ).alias("precision_"),
        grid(
            F.col("tp").cast("double")
            / F.nullif(F.col("tp") + F.col("fn"), F.lit(0))
        ).alias("recall_"),
        grid(
            (2 * F.col("tp")).cast("double")
            / F.nullif(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(0))
        ).alias("f1"),
    )


@register(
    "feature_woe_iv",
    # Weight of evidence + information value of o_orderpriority
    # against target (o_orderstatus = 'F'): WoE_cat =
    # ln((pos_cat/POS)/(neg_cat/NEG)) on a 1e-6 grid (add-0.5
    # Laplace keeps empty cells finite); IV contribution =
    # (pos_share - neg_share) * WoE. The credit-scoring screen for
    # "does this categorical carry signal at all".
    oracle="""
    WITH t AS (
      SELECT o_orderpriority AS cat,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ), cells AS (
      SELECT cat,
             CAST(SUM(y) AS BIGINT) AS pos,
             CAST(SUM(1 - y) AS BIGINT) AS neg
      FROM t GROUP BY cat
    ), tot AS (
      SELECT CAST(SUM(pos) AS BIGINT) AS all_pos,
             CAST(SUM(neg) AS BIGINT) AS all_neg
      FROM cells
    )
    SELECT cat, pos, neg,
           floor(ln(((pos + 0.5) / all_pos) / ((neg + 0.5) / all_neg))
                 * 1000000) / 1000000 AS woe,
           floor((CAST(pos AS DOUBLE) / all_pos - CAST(neg AS DOUBLE) / all_neg)
                 * (floor(ln(((pos + 0.5) / all_pos)
                             / ((neg + 0.5) / all_neg)) * 1000000) / 1000000)
                 * 1000000 + 0.5) / 1000000 AS iv_contrib
    FROM cells CROSS JOIN tot
    """,
)
def feature_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of evidence / information value — the classical
    categorical-signal screen (credit scoring, churn): WoE compares a
    category's share of positives vs its share of negatives in log
    space; summing (share gap) x WoE over categories gives IV, the
    one-number "keep or drop this feature" statistic (<0.02 useless,
    >0.3 strong). Pairs with feature_target_encoding_loo: WoE is the
    population-level read, LOO encoding the per-row transform.

    Exactness: cell counts are exact; each WoE lands on a 1e-6 grid
    before entering its IV product, so the statistic is reproducible
    cross-engine. Scale: one conditional hash agg over the category
    grain + a 1-row broadcast of the totals.
    """
    o = load_tables(spark, sf_dir)["orders"]
    t = o.select(
        F.col("o_orderpriority").alias("cat"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    cells = t.groupBy("cat").agg(
        F.sum("y").cast("bigint").alias("pos"),
        F.sum(1 - F.col("y")).cast("bigint").alias("neg"),
    )
    tot = cells.agg(
        F.sum("pos").cast("bigint").alias("all_pos"),
        F.sum("neg").cast("bigint").alias("all_neg"),
    )
    woe = (
        F.floor(
            F.log(
                ((F.col("pos") + 0.5) / F.col("all_pos"))
                / ((F.col("neg") + 0.5) / F.col("all_neg"))
            )
            * 1000000
        )
        / 1000000
    )
    share_gap = (
        F.col("pos").cast("double") / F.col("all_pos")
        - F.col("neg").cast("double") / F.col("all_neg")
    )
    return cells.crossJoin(F.broadcast(tot)).select(
        "cat",
        "pos",
        "neg",
        woe.alias("woe"),
        (F.floor(share_gap * woe * 1000000 + 0.5) / 1000000).alias(
            "iv_contrib"
        ),
    )
