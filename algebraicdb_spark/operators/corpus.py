"""Corpus-hygiene operators beyond SURVEY §2.10: benchmark
contamination detection, intra-document repetition scoring, and
chunk-level boilerplate dedup.

These are the three corpus gates an LLM-training pipeline runs that
§2.10's doc-level dedup does not cover:
  - contamination: n-gram overlap of every training doc against a
    held-out benchmark set (here: the ``src0`` slice of `documents`
    stands in for the benchmark corpus). The benchmark gram set is
    tiny relative to the corpus at any scale — eval suites are MBs,
    corpora are TBs — so it broadcasts and the check stays map-side.
  - repetition: per-doc duplicate n-gram fraction (the Gopher/C4
    "repetitious text" gate). Pure per-row expression work: no
    shuffle at all, whole-stage codegen end to end.
  - chunk dedup: fixed-width token chunks hashed corpus-wide; docs
    whose chunks recur elsewhere are boilerplate-heavy. One shuffle
    on (chunk-hash) for the occurrence count, reusable by the join
    back (same key) — the standard boilerplate-removal shape when a
    suffix array is too expensive.

All three are deterministic built-in-function plans with full SQL
twins — value-hash-checked against DuckDB like every relational key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from algebraicdb_spark.functions.rounding import pround, pround_sql
from algebraicdb_spark.operators.dedup import canonical_text, shingles
from algebraicdb_spark.plans.registry import register
from algebraicdb_spark.sources.catalog import load_tables

BENCH_SOURCE = "src0"  # fixture stand-in for the benchmark corpus
CONTAM_N = 3  # gram width (real decontamination runs 8-13; fixture docs are short)
CONTAM_TAU = 0.10

# DuckDB twin of dedup.shingles / gram_multiset: word n-grams of the
# canonical text. {dist} lets the caller choose multiset vs distinct.
_GRAMS_SQL = """
  {dist}(list_filter(
    list_transform(range(1, greatest(len(r) - {n}, 0) + 2),
                   i -> CASE WHEN i + {n1} <= len(r)
                             THEN array_to_string(r[i:i + {n1}], ' ') END),
    x -> x IS NOT NULL))
"""


def grams_sql(n: int, distinct: bool) -> str:
    return _GRAMS_SQL.format(n=n, n1=n - 1, dist="list_distinct" if distinct else "")


def gram_multiset(toks, n: int):
    """Word n-grams of a token array, duplicates kept (Spark side).

    The token expression is bound once through a 1-element
    ``transform`` lambda — referencing it directly inside the
    per-index lambda would re-evaluate it (often a regexp+split) for
    every element access; see dedup.shingles for the measured 27x.
    """

    def grams(w):
        idx = F.sequence(F.lit(1), F.size(w) - (n - 1))
        g = F.transform(
            idx,
            lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)]),
        )
        return F.when(F.size(w) >= n, g).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(toks), grams), 1)


@register(
    "contamination_ngram",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             {grams_sql(CONTAM_N, distinct=True)} AS grams
      FROM (SELECT doc_id, source,
                   string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS r
            FROM documents)
    ), bench AS (
      SELECT DISTINCT unnest(grams) AS g FROM t WHERE source = '{BENCH_SOURCE}'
    ), doc_grams AS (
      SELECT doc_id, unnest(grams) AS g FROM t WHERE source <> '{BENCH_SOURCE}'
    ), hits AS (
      SELECT d.doc_id,
             COUNT(*) AS n_grams,
             CAST(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
      FROM doc_grams d LEFT JOIN bench b ON d.g = b.g
      GROUP BY d.doc_id
    )
    SELECT doc_id, n_grams, n_hit,
           {pround_sql('CAST(n_hit AS DOUBLE) / n_grams')} AS contam_ratio,
           CASE WHEN CAST(n_hit AS DOUBLE) / n_grams >= {CONTAM_TAU}
                THEN 1 ELSE 0 END AS contaminated
    FROM hits
    """,
)
def contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: fraction of each training doc's
    distinct word n-grams that appear anywhere in the benchmark set.

    Scale shape: the benchmark gram set is distinct-aggregated once
    and broadcast (eval suites stay small no matter how big the
    corpus gets); the per-doc side is an explode + map-side hash
    lookup + one (doc_id) aggregate — no corpus-sized shuffle key
    ever carries gram text beyond the explode itself.
    """
    d = load_tables(spark, sf_dir)["documents"]
    doc_grams = d.filter(F.col("source") != BENCH_SOURCE).select(
        "doc_id", F.explode(shingles(F.col("text"), CONTAM_N)).alias("g")
    )
    bench = (
        d.filter(F.col("source") == BENCH_SOURCE)
        .select(F.explode(shingles(F.col("text"), CONTAM_N)).alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    hits = (
        doc_grams.join(F.broadcast(bench), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
        )
    )
    ratio = F.col("n_hit").cast("double") / F.col("n_grams")
    return hits.select(
        "doc_id",
        "n_grams",
        "n_hit",
        pround(ratio).alias("contam_ratio"),
        F.when(ratio >= CONTAM_TAU, 1).otherwise(0).alias("contaminated"),
    )


REPEAT_TAU = 0.10


@register(
    "text_repetition",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             {grams_sql(2, distinct=False)} AS bi,
             {grams_sql(3, distinct=False)} AS tri
      FROM (SELECT doc_id,
                   string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS r
            FROM documents WHERE doc_id % 6 = 0)
    )
    SELECT doc_id,
           len(bi) AS n_bigrams,
           CASE WHEN len(bi) > 0 THEN
             {pround_sql('CAST(len(bi) - len(list_distinct(bi)) AS DOUBLE) / len(bi)')}
           END AS dup_bigram_ratio,
           CASE WHEN len(tri) > 0 THEN
             {pround_sql('CAST(len(tri) - len(list_distinct(tri)) AS DOUBLE) / len(tri)')}
           END AS dup_trigram_ratio,
           CASE WHEN len(bi) > 0
                 AND CAST(len(bi) - len(list_distinct(bi)) AS DOUBLE) / len(bi)
                     >= {REPEAT_TAU}
                THEN 1 ELSE 0 END AS repetitive
    FROM g
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-doc repetition (Gopher-style duplicate n-gram fraction):
    1 − distinct/total over word bigrams and trigrams, plus the gate
    flag. Pure projection — zero shuffles, fully codegen'd."""
    d = load_tables(spark, sf_dir)["documents"]
    return repetition_scores(d.filter(F.col("doc_id") % 6 == 0))


def repetition_scores(d: DataFrame) -> DataFrame:
    """Repetition projection over any (doc_id, text) DataFrame —
    split out so the <2-token zero-guard is unit-testable against the
    oracle on synthetic degenerate docs."""
    toks = F.split(canonical_text(F.col("text")), " ")
    bi, tri = gram_multiset(toks, 2), gram_multiset(toks, 3)
    # zero-guard: a <2-token doc has no bigrams; 0/0 is NULL in Spark
    # but NaN in DuckDB, so both sides must short-circuit to NULL
    dup = lambda g: F.when(  # noqa: E731
        F.size(g) > 0,
        (F.size(g) - F.size(F.array_distinct(g))).cast("double") / F.size(g),
    )
    return d.select(
        "doc_id",
        F.size(bi).alias("n_bigrams"),
        pround(dup(bi)).alias("dup_bigram_ratio"),
        pround(dup(tri)).alias("dup_trigram_ratio"),
        F.when(dup(bi) >= REPEAT_TAU, 1).otherwise(0).alias("repetitive"),
    )


SEG_DUP_TAU = 0.30


@register(
    "text_dup_segments",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(lower(trim(text)), '.'),
                                        x -> trim(x)),
                         x -> x <> '') AS segs
      FROM documents WHERE doc_id % 5 = 1
    )
    SELECT doc_id,
           len(segs) AS n_segments,
           CASE WHEN len(segs) > 0 THEN
             {pround_sql('CAST(len(segs) - len(list_distinct(segs)) AS DOUBLE) / len(segs)')}
           END AS dup_segment_ratio,
           CASE WHEN len(segs) > 0
                 AND CAST(len(segs) - len(list_distinct(segs)) AS DOUBLE)
                     / len(segs) >= {SEG_DUP_TAU}
                THEN 1 ELSE 0 END AS repetitive
    FROM s
    """,
)
def text_dup_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level (sentence/line) duplicate fraction — the
    Gopher/C4 "duplicate line fraction" gate, one level above the
    n-gram repetition key (`text_repetition`): a doc that repeats
    whole sentences is boilerplate even when its n-gram mix looks
    fine. Segments are period-split, trimmed, lowercased; the 0/0
    guard mirrors the <2-token rule (no segments → NULL ratio, never
    NaN). Pure per-row array math — zero shuffles, fully codegen'd."""
    d = load_tables(spark, sf_dir)["documents"]

    def clean(segs):
        return F.filter(F.transform(segs, F.trim), lambda x: x != "")

    segs = F.element_at(
        F.transform(
            F.array(F.split(F.lower(F.trim(F.col("text"))), r"\.")), clean
        ),
        1,
    )
    n = F.size(segs)
    dup = (n - F.size(F.array_distinct(segs))).cast("double") / n
    return d.filter(F.col("doc_id") % 5 == 1).select(
        "doc_id",
        n.alias("n_segments"),
        pround(F.when(n > 0, dup)).alias("dup_segment_ratio"),
        F.when((n > 0) & (dup >= SEG_DUP_TAU), 1).otherwise(0).alias("repetitive"),
    )


CHUNK_TOKENS = 10
BOILER_TAU = 0.5


@register(
    "dedup_chunk",
    oracle=f"""
    WITH c AS (
      SELECT doc_id,
             unnest(list_transform(
               range(0, CAST(floor((len(r) - 1) / {CHUNK_TOKENS}) AS BIGINT) + 1),
               i -> md5(array_to_string(
                      r[i * {CHUNK_TOKENS} + 1:i * {CHUNK_TOKENS} + {CHUNK_TOKENS}],
                      ' ')))) AS ch
      FROM (SELECT doc_id,
                   string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS r
            FROM documents)
    ), occ AS (
      SELECT ch, COUNT(*) AS n_occ FROM c GROUP BY ch
    ), per_doc AS (
      SELECT c.doc_id,
             COUNT(*) AS n_chunks,
             CAST(SUM(CASE WHEN occ.n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared
      FROM c JOIN occ USING (ch)
      GROUP BY c.doc_id
    )
    SELECT doc_id, n_chunks, n_shared,
           {pround_sql('CAST(n_shared AS DOUBLE) / n_chunks')} AS shared_ratio,
           CASE WHEN CAST(n_shared AS DOUBLE) / n_chunks >= {BOILER_TAU}
                THEN 1 ELSE 0 END AS boilerplate_heavy
    FROM per_doc
    """,
)
def dedup_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level boilerplate detection: hash fixed 10-token chunks,
    count corpus-wide occurrences, flag docs whose chunks mostly recur
    elsewhere.

    Scale shape: explode → groupBy(chunk-hash) → join back on the SAME
    key (the exchange is reused, AQE handles hot chunks) → per-doc
    aggregate. Chunk text never rides a shuffle — only its md5. This
    is the sub-document dedup tier between doc-level exact dedup and
    a full suffix-array pass.
    """
    d = load_tables(spark, sf_dir)["documents"]

    # bind the split once (dedup.shingles lambda-rebinding pattern)
    def chunk_hashes(w):
        n_chunks = ((F.size(w) - 1) / CHUNK_TOKENS).cast("int")
        return F.transform(
            F.sequence(F.lit(0), n_chunks),
            lambda i: F.md5(
                F.array_join(
                    F.slice(w, i * CHUNK_TOKENS + 1, CHUNK_TOKENS), " "
                ).cast("binary")
            ),
        )

    chunks = F.element_at(
        F.transform(F.array(F.split(canonical_text(F.col("text")), " ")), chunk_hashes),
        1,
    )
    c = d.select("doc_id", F.explode(chunks).alias("ch"))
    occ = c.groupBy("ch").agg(F.count(F.lit(1)).alias("n_occ"))
    per_doc = (
        c.join(occ, "ch")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("n_occ") > 1).cast("int")).alias("n_shared"),
        )
    )
    ratio = F.col("n_shared").cast("double") / F.col("n_chunks")
    return per_doc.select(
        "doc_id",
        "n_chunks",
        "n_shared",
        pround(ratio).alias("shared_ratio"),
        F.when(ratio >= BOILER_TAU, 1).otherwise(0).alias("boilerplate_heavy"),
    )


MG_CAPACITY = 64  # counters per partition sketch
MG_TOPK = 10

# Property oracle (the agg_approx_distinct / agg_approx_percentile
# pattern): the deterministic half of the output — the EXACT top-k
# tokens by true count — is replayed in SQL, while the sketch half is
# reduced to an in-plan guarantee boolean the oracle pins to TRUE.
# If the Misra–Gries merge ever violates its bound (estimate > true,
# undercount > N/capacity, or a token above the N/capacity threshold
# missing from the merged sketch), the Spark side emits FALSE and the
# value hash breaks. Tokenization matches the sketch stream:
# lower + trim + collapse-\s+ + split, empty tokens dropped (Python
# str.split() yields none; SQL string_split of '' yields ['']).
_HH_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS token
  FROM documents
), tf AS (
  SELECT token, COUNT(*) AS true_count
  FROM toks WHERE token <> '' GROUP BY token
), ranked AS (
  SELECT token, true_count,
         row_number() OVER (ORDER BY true_count DESC, token ASC) AS rnk
  FROM tf
)
SELECT token, true_count, rnk, TRUE AS mg_ok
FROM ranked WHERE rnk <= {MG_TOPK}
"""


@register("text_heavy_hitters", oracle=_HH_ORACLE)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide heavy-hitter tokens via a mergeable Misra–Gries
    sketch: each partition streams its docs through a MG_CAPACITY
    counter set (Arrow-batched ``mapInPandas``), partials merge with a
    plain token-sum aggregation.

    Why a sketch when exact counts are one groupBy away: at 100 TB the
    vocabulary (URLs, hashes, typos) is billions of keys, so the exact
    shuffle carries the full vocab; MG carries ≤ capacity rows per
    partition — shuffle size is executors × capacity, independent of
    data volume, with the classic deterministic guarantee that any
    token with true count > N/capacity survives and merged estimates
    undercount by at most N/capacity.

    Output contract (round 9 — the key's property oracle): the exact
    top-MG_TOPK tokens with their true counts, each annotated with an
    in-plan ``mg_ok`` boolean asserting the sketch guarantee —
    estimate ≤ true, estimate ≥ true − N/capacity (exact integer
    arithmetic: est·cap ≥ true·cap − N), and survival for any token
    whose true count exceeds N/capacity. The DuckDB oracle replays
    the exact half and pins ``mg_ok`` to TRUE, so the sketch bound is
    value-hash-checked every round (the exact groupBy exists here to
    VERIFY the sketch; production calls the sketch alone). Bounds are
    additionally pytest-pinned over the full top-10-by-estimate in
    tests/test_corpus_analytics.py.

    Input is repartitioned by doc_id and sorted within partitions so
    the stream order — and therefore the sketch content — is
    deterministic run to run.
    """
    d = load_tables(spark, sf_dir)["documents"]

    def mg_partial(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for text in pdf["text"]:
                for tok in text.lower().split():
                    if tok in counters:
                        counters[tok] += 1
                    elif len(counters) < MG_CAPACITY:
                        counters[tok] = 1
                    else:
                        dead = []
                        for t in counters:
                            counters[t] -= 1
                            if counters[t] == 0:
                                dead.append(t)
                        for t in dead:
                            del counters[t]
        yield pd.DataFrame(
            {"token": list(counters), "cnt": list(counters.values())}
        )

    partials = (
        d.select("doc_id", "text")
        .repartition(8, "doc_id")
        .sortWithinPartitions("doc_id")
        .mapInPandas(mg_partial, "token string, cnt long")
    )
    sketch = partials.groupBy("token").agg(F.sum("cnt").alias("est_count"))
    # exact side — same tokenization as the sketch stream (Python
    # str.split() on the lowered text ≡ canonical split for this
    # whitespace-normal corpus; empty tokens dropped on both engines)
    toks = d.select(
        F.explode(F.split(canonical_text(F.col("text")), " ")).alias("token")
    ).filter(F.col("token") != "")
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("true_count"))
    n_total = toks.agg(F.count(F.lit(1)).alias("n_tok"))
    # TakeOrderedAndProject (distributed per-partition top-k + merge),
    # NOT a global window over the whole vocabulary — the window then
    # ranks only the MG_TOPK surviving rows
    w = Window.orderBy(F.col("true_count").desc(), F.col("token").asc())
    top = (
        exact.orderBy(F.col("true_count").desc(), F.col("token").asc())
        .limit(MG_TOPK)
        .withColumn("rnk", F.row_number().over(w))
        .join(sketch, "token", "left")
        .crossJoin(F.broadcast(n_total))
    )
    est, true_c, n = F.col("est_count"), F.col("true_count"), F.col("n_tok")
    cap = F.lit(MG_CAPACITY)
    mg_ok = F.when(
        est.isNotNull(),
        (est <= true_c) & (est * cap >= true_c * cap - n),
    ).otherwise(true_c * cap <= n)
    return top.select("token", "true_count", "rnk", mg_ok.alias("mg_ok"))


@register(
    "corpus_zipf_fit",
    # Zipf exponent by OLS on (ln rank, ln tf) over the top-1000
    # vocabulary: both lns grid-floored at 1e-4 so every per-token
    # term is an exact BIGINT (xy <= ~2e10, x 1000 tokens << 2^53 —
    # the DECIMAL>2^53 cast trap never applies), then the
    # agg_linear_regression combine with identical parenthesization.
    oracle="""
    WITH tf AS (
      SELECT token, COUNT(*) AS c FROM (
        SELECT unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS token
        FROM documents
      ) GROUP BY token
    ),
    ranked AS (
      SELECT token, c,
             row_number() OVER (ORDER BY c DESC, token) AS rnk
      FROM tf
    ),
    grid AS (
      SELECT CAST(floor(ln(CAST(rnk AS DOUBLE)) * 10000) AS BIGINT) AS xs,
             CAST(floor(ln(CAST(c AS DOUBLE)) * 10000) AS BIGINT) AS ys
      FROM ranked WHERE rnk <= 1000
    ),
    sums AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_fit,
             CAST(SUM(xs) AS DOUBLE) AS sx,
             CAST(SUM(ys) AS DOUBLE) AS sy,
             CAST(SUM(xs * ys) AS DOUBLE) AS sxy,
             CAST(SUM(xs * xs) AS DOUBLE) AS sxx,
             CAST(SUM(ys * ys) AS DOUBLE) AS syy
      FROM grid
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM tf) AS n_vocab,
           n_fit,
           floor((-((n * sxy - sx * sy) / (n * sxx - sx * sx))) * 10000 + 0.5)
             / 10000 AS zipf_exponent,
           floor((((n * sxy - sx * sy) * (n * sxy - sx * sy))
                  / ((n * sxx - sx * sx) * (n * syy - sy * sy))) * 10000 + 0.5)
             / 10000 AS r2
    FROM sums
    """,
)
def corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit for the corpus vocabulary: the exponent s in
    tf ∝ rank^(−s) by least squares on the log-log rank/frequency
    curve (top-1000 vocabulary), plus R² — the corpus-health
    statistic that flags synthetic or boilerplate-heavy text (natural
    corpora sit near s ≈ 1 with high R²).

    Scale shape: one (token) shuffle for tf; the rank window runs on
    the aggregated vocabulary grain capped at 1000 fit points, and
    the OLS reduces to 5 BIGINT partials — the same mergeable-moment
    shape as agg_linear_regression.
    """
    from algebraicdb_spark.operators.dedup import canonical_text

    docs = load_tables(spark, sf_dir)["documents"]
    tf = (
        docs.select(F.explode(F.split(canonical_text(F.col("text")), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_vocab = tf.agg(F.count(F.lit(1)).cast("long").alias("n_vocab"))
    ranked = tf.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.col("c").desc(), "token"))
    ).where(F.col("rnk") <= 1000)
    grid = ranked.select(
        F.floor(F.log(F.col("rnk").cast("double")) * 10000).cast("long").alias("xs"),
        F.floor(F.log(F.col("c").cast("double")) * 10000).cast("long").alias("ys"),
    )
    sums = grid.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_fit"),
        F.sum("xs").cast("double").alias("sx"),
        F.sum("ys").cast("double").alias("sy"),
        F.sum(F.col("xs") * F.col("ys")).cast("double").alias("sxy"),
        F.sum(F.col("xs") * F.col("xs")).cast("double").alias("sxx"),
        F.sum(F.col("ys") * F.col("ys")).cast("double").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        sums.crossJoin(F.broadcast(n_vocab))  # 1-row aggregates
        .select(
            "n_vocab",
            "n_fit",
            pround(-(num / denx), 4).alias("zipf_exponent"),
            pround((num * num) / (denx * deny), 4).alias("r2"),
        )
    )


# 1e-3 ln grid: x ~ ln(corpus tokens) <= ~40 so x*x <= 1.6e9 grid^2
# cells; BIGINT moment sums stay exact to ~3e10 curve points. The
# first 1e-6-grid draft overflowed int64 at the 10x probe (5e4 docs *
# (16e6)^2 > 2^63) — caught by tools/stress_scale.py, the reason the
# probe exists.
_HEAPS_GRID = 10**3


@register(
    "corpus_heaps_law",
    # Heaps' law V(n) = K * n^beta fitted by log-log OLS over the
    # cumulative (tokens seen, vocab size) curve in doc_id order.
    # Same determinism device as corpus_zipf_fit: each ln is floored
    # onto the 1e-6 grid, the OLS moments are exact BIGINT sums, and
    # the closed-form slope/intercept/R2 are single IEEE expressions
    # of those exact integers.
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(
        regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS t
      FROM documents
    ), per_doc AS (
      SELECT doc_id, COUNT(*) AS n_tok FROM tok
      WHERE t <> '' GROUP BY doc_id
    ), firsts AS (
      SELECT MIN(doc_id) AS first_doc FROM tok WHERE t <> '' GROUP BY t
    ), new_types AS (
      SELECT first_doc AS doc_id, COUNT(*) AS n_new
      FROM firsts GROUP BY first_doc
    ), curve AS (
      SELECT p.doc_id,
             CAST(SUM(p.n_tok) OVER w AS BIGINT) AS cum_tok,
             CAST(SUM(COALESCE(nt.n_new, 0)) OVER w AS BIGINT) AS cum_vocab
      FROM per_doc p LEFT JOIN new_types nt ON nt.doc_id = p.doc_id
      WINDOW w AS (ORDER BY p.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), grid AS (
      SELECT CAST(floor(ln(CAST(cum_tok AS DOUBLE)) * {_HEAPS_GRID})
                  AS BIGINT) AS x,
             CAST(floor(ln(CAST(cum_vocab AS DOUBLE)) * {_HEAPS_GRID})
                  AS BIGINT) AS y
      FROM curve
    ), mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM grid
    )
    SELECT n AS n_points,
           floor(CAST((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 AS DOUBLE) * 1000000 + 0.5) / 1000000 AS beta,
           floor(CAST((CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * sxy
                 - CAST(sx AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * sxx
                 - CAST(sx AS DOUBLE) * sx)) * sx) / n / {_HEAPS_GRID}
                 AS DOUBLE) * 1000000 + 0.5) / 1000000 AS ln_k,
           floor(CAST(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))
                 / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
                 AS DOUBLE) * 1000000 + 0.5) / 1000000 AS r2
    FROM mom
    """,
)
def corpus_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit: vocabulary size as a power of tokens seen,
    V(n) = K·n^beta, by log-log OLS over the cumulative ingestion
    curve (doc_id order). The companion corpus-health statistic to
    corpus_zipf_fit: a natural corpus grows vocabulary at beta ~
    0.4-0.6; beta near 0 means the vocabulary is exhausted
    (templated/synthetic text), near 1 means token soup.

    Scale shape: token explode -> (token -> first doc) mergeable MIN
    (the text_ngram_novelty state), new-type counts per doc, ONE
    cumulative window over the doc grain, and a 6-moment OLS whose
    partials are exact BIGINTs. The curve is |docs| rows regardless
    of token volume.
    """
    from pyspark.sql.window import Window

    d = load_tables(spark, sf_dir)["documents"]
    from algebraicdb_spark.operators.dedup import canonical_text

    tok = d.select(
        "doc_id", F.explode(F.split(canonical_text("text"), " ")).alias("t")
    ).where(F.col("t") != "")
    per_doc = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    firsts = tok.groupBy("t").agg(F.min("doc_id").alias("first_doc"))
    new_types = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = (
        per_doc.join(new_types, "doc_id", "left")
        .select(
            "doc_id",
            F.sum("n_tok").over(w).cast("bigint").alias("cum_tok"),
            F.sum(F.coalesce("n_new", F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("cum_vocab"),
        )
    )
    grid = curve.select(
        F.floor(F.log(F.col("cum_tok").cast("double")) * _HEAPS_GRID)
        .cast("bigint")
        .alias("x"),
        F.floor(F.log(F.col("cum_vocab").cast("double")) * _HEAPS_GRID)
        .cast("bigint")
        .alias("y"),
    )
    mom = grid.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    nD = F.col("n").cast("double")
    cov = nD * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    varx = nD * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vary = nD * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    beta = cov / varx
    return mom.select(
        F.col("n").alias("n_points"),
        pround(beta, 6).alias("beta"),
        pround(
            (F.col("sy").cast("double") - beta * F.col("sx"))
            / F.col("n")
            / _HEAPS_GRID,
            6,
        ).alias("ln_k"),
        pround(cov * cov / (varx * vary), 6).alias("r2"),
    )


_JSD_GRID = 10**6
_JSD_SMOOTH = 1  # add-one smoothing numerator


@register(
    "corpus_js_divergence",
    # Jensen-Shannon divergence between per-source unigram
    # distributions, for the 5 largest sources pairwise — the
    # corpus-drift distance (symmetric, bounded [0, ln 2]) that KL
    # can't give on disjoint supports. Probabilities are exact
    # rationals (add-one smoothed counts over a shared vocabulary);
    # each ln term is grid-floored to 1e-6 and summed as exact
    # BIGINTs, so the statistic hashes identically cross-engine.
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest(string_split(
        regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS t
      FROM documents
      WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')
    ), counts AS (
      SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok WHERE t <> '' GROUP BY source, t
    ), vocab AS (
      SELECT DISTINCT t FROM counts
    ), totals AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM counts
      GROUP BY source
    ), dense AS (
      SELECT s.source, v.t,
             COALESCE(c.c, 0) + {_JSD_SMOOTH} AS ck,
             s.n + {_JSD_SMOOTH} * (SELECT COUNT(*) FROM vocab) AS nk
      FROM totals s CROSS JOIN vocab v
      LEFT JOIN counts c ON c.source = s.source AND c.t = v.t
    ), pairs AS (
      SELECT a.source AS source_a, b.source AS source_b, a.t,
             CAST(a.ck AS DOUBLE) / a.nk AS p,
             CAST(b.ck AS DOUBLE) / b.nk AS q
      FROM dense a JOIN dense b
        ON a.t = b.t AND a.source < b.source
    ), terms AS (
      SELECT source_a, source_b,
             CAST(floor(0.5 * (p * ln(2.0 * p / (p + q))
                               + q * ln(2.0 * q / (p + q)))
                        * {_JSD_GRID}) AS BIGINT) AS term_g
      FROM pairs
    )
    SELECT source_a, source_b,
           CAST(SUM(term_g) AS BIGINT) AS jsd_grid,
           floor((CAST(SUM(term_g) AS DOUBLE) / {_JSD_GRID})
                 * 1000000 + 0.5) / 1000000 AS jsd
    FROM terms
    GROUP BY source_a, source_b
    """,
)
def corpus_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source unigram
    distributions (5 sources, add-one smoothing over the shared
    vocabulary) — the drift metric for corpus monitoring: symmetric,
    finite on disjoint supports, bounded by ln 2. A mixing pipeline
    watches this to catch a source whose content quietly changed
    under the same name.

    Determinism: probabilities are exact rationals of BIGINT counts
    divided identically on both engines; each 0.5·(p·ln(2p/(p+q)) +
    q·ln(2q/(p+q))) term is floored onto the 1e-6 grid BEFORE the
    per-pair sum, so jsd_grid is an exact integer (the
    text_unigram_logprob device, applied pairwise).

    Scale shape: counts collapse to (source, term) immediately; the
    dense smoothing grid is |sources|×|vocab| (bounded by vocabulary,
    not corpus volume), and the pair join fans out each term to
    C(5,2) = 10 pairs. With thousands of sources you'd bucket pairs
    by an LSH of the count vectors first — the same
    candidates-then-exact discipline as the dedup tiers.
    """
    from pyspark.sql.window import Window  # noqa: F401

    d = load_tables(spark, sf_dir)["documents"]
    from algebraicdb_spark.operators.dedup import canonical_text

    srcs = ["src0", "src1", "src2", "src3", "src4"]
    tok = (
        d.where(F.col("source").isin(srcs))
        .select(
            "source",
            F.explode(F.split(canonical_text("text"), " ")).alias("t"),
        )
        .where(F.col("t") != "")
    )
    # vocab-grain count table feeds vocab/totals/dense (and v_n runs
    # an action anyway) — count the corpus once
    counts = (
        tok.groupBy("source", "t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )
    vocab = counts.select("t").distinct()
    v_n = vocab.count()  # vocabulary size: tiny, fixture-bounded
    totals = counts.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n")
    )
    dense = (
        totals.crossJoin(vocab)
        .join(counts, ["source", "t"], "left")
        .select(
            "source",
            "t",
            (F.coalesce("c", F.lit(0)) + _JSD_SMOOTH).alias("ck"),
            (F.col("n") + _JSD_SMOOTH * v_n).alias("nk"),
        )
    )
    b = dense.select(
        F.col("source").alias("source_b"),
        F.col("t").alias("t_b"),
        F.col("ck").alias("ck_b"),
        F.col("nk").alias("nk_b"),
    )
    pairs = dense.join(
        b,
        (F.col("t") == F.col("t_b")) & (F.col("source") < F.col("source_b")),
    ).select(
        F.col("source").alias("source_a"),
        "source_b",
        (F.col("ck").cast("double") / F.col("nk")).alias("p"),
        (F.col("ck_b").cast("double") / F.col("nk_b")).alias("q"),
    )
    p, q = F.col("p"), F.col("q")
    term = 0.5 * (
        p * F.log(2.0 * p / (p + q)) + q * F.log(2.0 * q / (p + q))
    )
    terms = pairs.select(
        "source_a",
        "source_b",
        F.floor(term * _JSD_GRID).cast("bigint").alias("term_g"),
    )
    return terms.groupBy("source_a", "source_b").agg(
        F.sum("term_g").cast("bigint").alias("jsd_grid"),
        pround(F.sum("term_g").cast("double") / _JSD_GRID, 6).alias("jsd"),
    )


BURST_TOP_TERMS = 20


@register(
    "text_term_burstiness",
    # Church-Gale burstiness: Fano factor (variance-to-mean ratio) of
    # a term's per-document counts. Function words ~ Poisson (F ~ 1);
    # topical terms are bursty (F >> 1). Exact n-scaled integer
    # moments (the CUSUM device) for the top-DF terms.
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(
        regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS t
      FROM documents
    ), counts AS (
      SELECT t, doc_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok WHERE t <> '' GROUP BY t, doc_id
    ), top_terms AS (
      SELECT t FROM counts GROUP BY t
      ORDER BY COUNT(*) DESC, t LIMIT {BURST_TOP_TERMS}
    ), n_docs AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
    ), mom AS (
      -- zero-count docs included via the closed moments: with k docs
      -- containing the term, sum over ALL n docs of c and c^2 equals
      -- the sums over the k non-zero docs
      SELECT c.t,
             CAST(SUM(c.c) AS BIGINT) AS s1,
             CAST(SUM(c.c * c.c) AS BIGINT) AS s2
      FROM counts c JOIN top_terms tt ON tt.t = c.t
      GROUP BY c.t
    )
    SELECT t AS term, s1 AS total_count,
           floor(CAST(
             (CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
             / (CAST(n AS DOUBLE) - 1) / s1
             AS DOUBLE) * 10000 + 0.5) / 10000 AS fano
    FROM mom, n_docs
    """,
)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (Church & Gale): the Fano factor of each top
    term's per-document count distribution, zero-count documents
    included. F ~ 1 means Poisson scatter (function-word-like); F >> 1
    means the term clusters into few documents (topical) — the
    statistic behind burstiness-aware TF weighting and stopword
    discovery, complementing tf-idf's document-frequency view.

    Closed-moment trick: with zero-count docs contributing nothing to
    Σc and Σc², the sample variance over ALL n docs is
    (n·Σc² − (Σc)²)/(n(n−1)) — computed from the NON-ZERO rows only,
    never materializing the dense term×doc grid. Moments are exact
    BIGINTs; fano = one IEEE expression.
    """
    d = load_tables(spark, sf_dir)["documents"]
    from algebraicdb_spark.operators.dedup import canonical_text

    tok = d.select(
        "doc_id", F.explode(F.split(canonical_text("text"), " ")).alias("t")
    ).where(F.col("t") != "")
    counts = tok.groupBy("t", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    top = (
        counts.groupBy("t")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), "t")
        .limit(BURST_TOP_TERMS)
        .select("t")
    )
    n_docs = d.count()  # scalar fixture metadata; exact
    mom = counts.join(F.broadcast(top), "t").groupBy("t").agg(
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
    )
    nD = F.lit(float(n_docs))
    fano = (
        (nD * F.col("s2") - F.col("s1").cast("double") * F.col("s1"))
        / (nD - 1)
        / F.col("s1")
    )
    return mom.select(
        F.col("t").alias("term"),
        F.col("s1").alias("total_count"),
        pround(fano).alias("fano"),
    )


@register(
    "corpus_loo_nll_by_source",
    # Leave-one-source-out surprise: score each source's tokens under
    # the add-one-smoothed unigram model of the REST of the corpus —
    # p_loo(t | not s) = (c_t - c_st + 1) / (N - N_s + V). High NLL =
    # domain-shifted source (the cross-source drift signal
    # corpus_js_divergence gives pairwise, here against everything).
    # Each distinct (source, token) ln lands on a 1e-6 grid BEFORE
    # being weighted by its count and summed exactly.
    oracle="""
    WITH toks AS (
      SELECT source, unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
      FROM documents
    ), st AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c_st
      FROM toks GROUP BY 1, 2
    ), tot AS (
      SELECT tok, CAST(SUM(c_st) AS BIGINT) AS c_t FROM st GROUP BY tok
    ), ns AS (
      SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s FROM st GROUP BY source
    ), consts AS (
      SELECT CAST(SUM(c_t) AS BIGINT) AS big_n,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM tot
    ), scored AS (
      SELECT s.source, s.c_st,
             CAST(floor(-ln(CAST(t.c_t - s.c_st + 1 AS DOUBLE)
                            / (consts.big_n - ns.n_s + consts.v))
                        * 1000000) AS BIGINT) AS nll_g
      FROM st s
      JOIN tot t USING (tok)
      JOIN ns ON ns.source = s.source
      CROSS JOIN consts
    )
    SELECT source,
           CAST(SUM(c_st) AS BIGINT) AS n_tokens,
           floor(CAST(SUM(c_st * nll_g) AS DOUBLE) / SUM(c_st) / 1000000
                 * 10000 + 0.5) / 10000 AS avg_loo_nll
    FROM scored GROUP BY source
    """,
)
def corpus_loo_nll_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How surprising is each source to a model trained on the REST of
    the corpus? Average per-token negative log-likelihood under the
    leave-one-source-out add-one unigram LM. The domain-shift ranking
    a data-mixing pipeline needs before weighting sources: a source
    whose LOO-NLL towers over the others is out-of-distribution for
    everything else (or trash) — either way it needs a decision.

    The LOO algebra needs no per-source model rebuild: p_loo derives
    from the GLOBAL term counts minus the source's own (c_t - c_st),
    so the whole statistic is two hash aggregates on (source, token)
    and (token), one join between them, and exact grid-int sums —
    |sources| models for the price of one scan. At 100 TB the
    (token) side is the vocab table (broadcastable after a min-count
    cut); the (source, token) side shuffles once.
    """
    d = load_tables(spark, sf_dir)["documents"]
    toks = d.select(
        "source",
        F.explode(F.split(canonical_text("text"), " ")).alias("tok"),
    )
    # st feeds THREE consumers (tot, ns, the scored join); without a
    # materialization Catalyst re-runs the corpus explode+agg once per
    # consumer (measured 4 scans / 4 explodes in the physical plan,
    # 18.9x at 10x data). st is the (source, token) count table —
    # vocab-bounded, NOT corpus-bounded — so checkpointing it is the
    # scale-correct cut: one corpus pass, three cheap reads.
    st = (
        toks.groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_st"))
        # lazy: materializes when the query executes, so plan-only
        # callers (the scalelint sweep) never run the corpus explode
        .localCheckpoint(eager=False)
    )
    tot = st.groupBy("tok").agg(F.sum("c_st").cast("bigint").alias("c_t"))
    ns = st.groupBy("source").agg(F.sum("c_st").cast("bigint").alias("n_s"))
    consts = tot.agg(
        F.sum("c_t").cast("bigint").alias("big_n"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    nll_g = F.floor(
        -F.log(
            (F.col("c_t") - F.col("c_st") + 1).cast("double")
            / (F.col("big_n") - F.col("n_s") + F.col("v"))
        )
        * 1000000
    ).cast("bigint")
    scored = (
        st.join(tot, "tok")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(consts))
        .select("source", "c_st", nll_g.alias("nll_g"))
    )
    return scored.groupBy("source").agg(
        F.sum("c_st").cast("bigint").alias("n_tokens"),
        (
            F.floor(
                F.sum(F.col("c_st") * F.col("nll_g")).cast("double")
                / F.sum("c_st")
                / 1000000
                * 10000
                + 0.5
            )
            / 10000
        ).alias("avg_loo_nll"),
    )
