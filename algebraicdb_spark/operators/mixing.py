"""Corpus-mixing operators: the report / pack / sample stage of a
training-data pipeline (SURVEY §2.10 extension family).

After cleaning and dedup, a pretraining pipeline has to answer three
more questions before tokens hit the trainer, and each is a distinct
distributed shape:

  - ``corpus_mix_report``: what is the token mix? Per-source token
    counts, shares, and the cumulative coverage curve. One hash
    aggregation over the corpus; the share/cumulative windows run on
    the AGGREGATED grain (|sources| rows, thousands at most at 100 TB),
    never on the document grain — a single-partition window over a
    few thousand rows is free, over 10^10 docs it would be the classic
    global-sort anti-pattern.
  - ``pack_sequences``: concat-and-chunk sequence packing. Documents
    are concatenated per source in deterministic (doc_id) order and
    cut into fixed-capacity token windows; each doc gets the sequence
    id and offset where its first token lands. This is the standard
    "pack to context length" step (GPT-style pipelines); the running
    prefix sum is one window per source partition — a single shuffle
    on source, linear within partition. At 100 TB the partition key
    becomes (source, shard) so no single source serializes; the
    prefix offset per shard is then a tiny second-stage cumsum over
    the per-shard totals (same two-stage scan shape as Spark's own
    ``zipWithIndex``).
  - ``mix_weighted_sample``: deterministic weighted downsampling to a
    target mix. Each source tier gets a keep-rate; a document is kept
    iff a multiplicative-Fibonacci spread of its doc_id lands under
    the rate threshold. Pure map-side predicate — zero shuffles before
    the per-source report aggregation, reproducible run-to-run and
    engine-to-engine (the production path would use xxhash64(doc_id)
    the same way; the 16-bit spread here is the oracle-portable twin
    since DuckDB lacks xxhash64).
  - ``embedding_quantize_int8``: per-vector scalar quantization of
    the embedding column (min/max → 255 levels), reporting per-label
    reconstruction error. Everything is element-wise higher-order
    function work inside codegen — the only shuffle is the final
    per-label aggregation. The squared errors are grid-floored to the
    1e-14 grid before summation so the cross-engine sum is exact
    (same trick as text_unigram_logprob, see SKILL gotchas).

All four are deterministic and value-hash-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from algebraicdb_spark.functions.rounding import pround, pround_sql
from algebraicdb_spark.operators.dedup import canonical_text
from algebraicdb_spark.plans.registry import register
from algebraicdb_spark.sources.catalog import load_tables

# DuckDB twin of the whitespace token count over canonical text.
_TOK_SQL = "len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))"


def _tok_count(col):
    return F.size(F.split(canonical_text(col), " "))


@register(
    "corpus_mix_report",
    oracle=f"""
    WITH per AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM({_TOK_SQL}) AS BIGINT) AS n_tokens
      FROM documents
      GROUP BY source
    )
    SELECT source, n_docs, n_tokens,
           {pround_sql('CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER ()', 6)}
             AS token_share,
           {pround_sql('''CAST(SUM(n_tokens) OVER (ORDER BY n_tokens DESC, source
                          ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                          / SUM(n_tokens) OVER ()''', 6)} AS cum_share
    FROM per
    """,
)
def corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token mix: counts, shares, cumulative coverage curve.

    The corpus-grain work is ONE hash aggregation; shares and the
    coverage curve are windows over the aggregated |sources| rows
    (empty partitionBy is safe there — thousands of rows, not docs).
    """
    d = load_tables(spark, sf_dir)["documents"]
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(_tok_count(F.col("text")).cast("long")).alias("n_tokens"),
    )
    total = per.agg(F.sum("n_tokens").alias("total_tokens"))
    w_cum = (
        Window.partitionBy()
        .orderBy(F.col("n_tokens").desc(), F.col("source"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_tokens",
        pround(F.col("n_tokens").cast("double") / F.col("total_tokens"), 6).alias(
            "token_share"
        ),
        pround(
            F.sum("n_tokens").over(w_cum).cast("double") / F.col("total_tokens"), 6
        ).alias("cum_share"),
    )


SEQ_CAP = 256  # tokens per packed sequence (fixture-sized context window)


def pack_layout(docs: DataFrame, cap: int = SEQ_CAP) -> DataFrame:
    """Core packing layout over any (doc_id, source, n_tokens) frame:
    per source in doc_id order, assign each doc the sequence id and
    offset where its first token lands under concat-and-chunk."""
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.withColumn(
            "cum_prev", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        ).select(
            "doc_id",
            "source",
            "n_tokens",
            (F.col("cum_prev") / cap).cast("long").alias("seq_id"),
            (F.col("cum_prev") % cap).alias("seq_offset"),
        )
    )


@register(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_TOK_SQL} AS n_tokens
      FROM documents
    ), w AS (
      SELECT *,
             COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
      FROM t
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_prev // {SEQ_CAP} AS BIGINT) AS seq_id,
           CAST(cum_prev % {SEQ_CAP} AS BIGINT) AS seq_offset
    FROM w
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing: per source, docs in doc_id order are
    laid head-to-tail and cut every SEQ_CAP tokens; emit where each
    doc's first token lands (sequence id + offset).

    One shuffle (partition by source), one in-partition prefix-sum
    window. Scale path: key by (source, shard) and prefix-offset the
    shards with a second tiny cumsum over per-shard totals.
    """
    d = load_tables(spark, sf_dir)["documents"]
    return pack_layout(
        d.select(
            "doc_id",
            "source",
            _tok_count(F.col("text")).cast("long").alias("n_tokens"),
        )
    )


# Keep-rate tiers in 65536ths: high-quality sources upsampled, tail
# downsampled — the mix knob a pretraining pipeline actually turns.
MIX_TIERS_SQL = """CASE WHEN CAST(substr(source, 4) AS INTEGER) < 5 THEN 52429
                        WHEN CAST(substr(source, 4) AS INTEGER) < 10 THEN 32768
                        ELSE 16384 END"""
# Multiplicative-Fibonacci spread of doc_id into [0, 65536).
MIX_HASH_SQL = "(doc_id % 65536) * 40503 % 65536"


@register(
    "mix_weighted_sample",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN {MIX_HASH_SQL} < {MIX_TIERS_SQL} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           {pround_sql(f'CAST({MIX_TIERS_SQL} AS DOUBLE) / 65536', 6)} AS target_rate,
           {pround_sql(f'''CAST(SUM(CASE WHEN {MIX_HASH_SQL} < {MIX_TIERS_SQL}
                           THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)''', 6)}
             AS kept_rate
    FROM documents
    GROUP BY source
    """,
)
def mix_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted mix sampling: keep doc iff
    spread(doc_id) < tier-rate; report target vs achieved per source.

    The keep predicate is pure map-side integer math — no shuffle, no
    RNG state, bit-identical on every engine and every rerun (the
    production twin is ``xxhash64(doc_id) % 65536``; the 16-bit
    multiplicative spread is used here because the oracle engine has
    no xxhash64). Only the per-source report aggregates.
    """
    d = load_tables(spark, sf_dir)["documents"]
    src_num = F.substring("source", 4, 10).cast("int")
    tier = (
        F.when(src_num < 5, 52429).when(src_num < 10, 32768).otherwise(16384)
    )
    h = (F.col("doc_id") % 65536) * 40503 % 65536
    kept = F.when(h < tier, 1).otherwise(0)
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept).cast("long").alias("n_kept"),
        pround(F.first(tier).cast("double") / 65536, 6).alias("target_rate"),
        pround(F.sum(kept).cast("double") / F.count(F.lit(1)), 6).alias("kept_rate"),
    )


_Q_LEVELS = 255
_SQ_GRID = 10**14  # grid-floor squared errors so cross-engine sums are exact


@register(
    "embedding_quantize_int8",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label,
             CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS mn,
             CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS mx,
             embedding
      FROM embeddings
    ), e AS (
      SELECT label,
             unnest(CASE WHEN mx > mn THEN
               list_transform(embedding, x ->
                 CAST(x AS DOUBLE)
                 - (mn + floor((CAST(x AS DOUBLE) - mn) * {_Q_LEVELS}.0 / (mx - mn) + 0.5)
                        * ((mx - mn) / {_Q_LEVELS}.0)))
             ELSE list_transform(embedding, x -> 0.0) END) AS err
      FROM q
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_elems,
           {pround_sql(f'''CAST(SUM(CAST(floor(err * err * {_SQ_GRID}.0) AS BIGINT))
                           AS DOUBLE) / {_SQ_GRID}.0 / COUNT(*)''', 12)} AS mse,
           {pround_sql('MAX(abs(err))', 6)} AS max_abs_err
    FROM e
    GROUP BY label
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column with per-label
    reconstruction error (MSE + max abs error).

    Quantize: q_i = round((x_i − mn)·255/(mx − mn)); reconstruct
    mn + q_i·scale. All element-wise work is JVM higher-order
    functions over the array — the only shuffle is the final per-label
    agg. Squared errors are floored onto the 1e-14 grid before the sum
    so both engines add exact integers (IEEE multiply/floor are
    bit-identical; only summation ORDER differs across engines, and
    integer sums don't care).
    """
    e = load_tables(spark, sf_dir)["embeddings"]

    # bind (embedding, min, max) ONCE via a 1-element struct transform:
    # referencing array_min/array_max directly inside the per-element
    # lambda re-scans the vector per element — O(dim²) per row (the
    # dedup.shingles lambda-rebinding pathology)
    def errs(s):
        mn, mx = s["mn"], s["mx"]
        scale = (mx - mn) / _Q_LEVELS
        return F.when(
            mx > mn,
            F.transform(
                s["emb"],
                lambda x: x.cast("double")
                - (mn + F.floor((x.cast("double") - mn) * _Q_LEVELS / (mx - mn) + 0.5) * scale),
            ),
        ).otherwise(F.transform(s["emb"], lambda x: F.lit(0.0)))

    ctx = F.array(
        F.struct(
            F.col("embedding").alias("emb"),
            F.array_min("embedding").cast("double").alias("mn"),
            F.array_max("embedding").cast("double").alias("mx"),
        )
    )
    err_arr = F.element_at(F.transform(ctx, errs), 1)
    exploded = e.select("label", F.explode(err_arr).alias("err"))
    return exploded.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_elems"),
        pround(
            F.sum(F.floor(F.col("err") * F.col("err") * _SQ_GRID).cast("long")).cast(
                "double"
            )
            / _SQ_GRID
            / F.count(F.lit(1)),
            12,
        ).alias("mse"),
        pround(F.max(F.abs("err")), 6).alias("max_abs_err"),
    )


BUDGET_FRACTION = 0.30  # token budget as a share of the corpus
SCORE_BUCKETS = 20      # quality-score granularity for the greedy cut


@register(
    "select_token_budget",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len(list_distinct(string_split(regexp_replace(lower(trim(text)),
                  '\\s+', ' ', 'g'), ' '))) AS n_distinct,
             {_TOK_SQL} AS n_tokens
      FROM documents
    ), b AS (
      SELECT CAST(floor(CAST(n_distinct AS DOUBLE) / n_tokens * {SCORE_BUCKETS})
                  AS BIGINT) AS bucket,
             COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
      FROM t GROUP BY 1
    ), c AS (
      SELECT *,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY bucket DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_prev,
             CAST(SUM(n_tokens) OVER () AS BIGINT) AS total_tokens
      FROM b
    )
    SELECT bucket, n_docs, n_tokens,
           CAST(cum_prev + n_tokens AS BIGINT) AS cum_tokens,
           CASE WHEN cum_prev < CAST(floor(total_tokens * {BUDGET_FRACTION})
                                     AS BIGINT)
                THEN 1 ELSE 0 END AS kept
    FROM c
    """,
)
def select_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained data selection: rank documents by a cheap
    quality proxy (lexical diversity = distinct/total tokens), then
    keep the best score-buckets greedily until the token budget
    (BUDGET_FRACTION of the corpus) is filled.

    The scalable formulation works at BUCKET granularity: per-doc
    scoring is map-side, the bucket rollup is one hash aggregation to
    SCORE_BUCKETS rows, and the greedy cumulative cut is a window over
    that aggregated grain (bounded, data-volume-independent — the
    GLOBAL_WINDOW_AGG shape). The doc-grain alternative (global sort +
    running sum over every document) would serialize the corpus
    through one task; bucketing trades exact doc-level cuts for a
    bounded plan, which is how budget selection actually ships.
    """
    d = load_tables(spark, sf_dir)["documents"]
    toks = F.split(canonical_text(F.col("text")), " ")
    score = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    b = (
        d.select(
            F.floor(score * SCORE_BUCKETS).cast("long").alias("bucket"),
            F.size(toks).alias("toks"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("long").alias("n_tokens"),
        )
    )
    w_prev = (
        Window.partitionBy()
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy()
    cum_prev = F.coalesce(F.sum("n_tokens").over(w_prev), F.lit(0))
    budget = F.floor(F.sum("n_tokens").over(w_all) * BUDGET_FRACTION)
    return b.select(
        "bucket",
        "n_docs",
        "n_tokens",
        (cum_prev + F.col("n_tokens")).cast("long").alias("cum_tokens"),
        F.when(cum_prev < budget, 1).otherwise(0).alias("kept"),
    )


# Temperature for mix flattening: q_s ∝ p_s^(1/T) with T=2, i.e.
# sqrt(p). sqrt is IEEE-754 correctly rounded on every engine, so the
# whole pipeline stays bit-portable without grid tricks on the power
# itself; an arbitrary T would use pow() + the 1e-9 grid-floor below.
MIX_TEMPERATURE = 2.0
_Q_GRID = 10**9  # grid-floor the sqrt terms so the normalizer sums exactly


@register(
    "mix_temperature_sampling",
    oracle=f"""
    WITH per AS (
      SELECT source, CAST(SUM({_TOK_SQL}) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ), p AS (
      SELECT source, n_tokens,
             CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER () AS share,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER ())
                        * {_Q_GRID}.0) AS BIGINT) AS q_grid
      FROM per
    )
    SELECT source, n_tokens,
           {pround_sql('share', 6)} AS token_share,
           {pround_sql(f'CAST(q_grid AS DOUBLE) / SUM(q_grid) OVER ()', 6)}
             AS temp_share,
           {pround_sql(f'CAST(q_grid AS DOUBLE) / SUM(q_grid) OVER () / share', 6)}
             AS upsample_factor
    FROM p
    """,
)
def mix_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mix weights: q_s ∝ p_s^(1/T) over the
    per-source token shares — the standard reweighting that flattens a
    head-heavy corpus toward the tail (T>1) before sampling; reports
    the natural share, the temperature share, and the per-source
    upsample factor q/p a sampler would apply.

    Scale: one corpus hash aggregation to |sources| rows; shares and
    the normalizer are windows on that aggregated grain. Determinism:
    with T=2 the power is sqrt (correctly rounded per IEEE-754 on
    every engine); each sqrt term is floored onto the 1e-9 grid so the
    normalizing sum is an exact integer sum on both engines.
    """
    d = load_tables(spark, sf_dir)["documents"]
    per = d.groupBy("source").agg(
        F.sum(_tok_count(F.col("text")).cast("long")).alias("n_tokens")
    )
    w_all = Window.partitionBy()
    share = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w_all)
    p = per.select(
        "source",
        "n_tokens",
        share.alias("share"),
        F.floor(F.sqrt(share) * _Q_GRID).cast("long").alias("q_grid"),
    )
    temp_share = F.col("q_grid").cast("double") / F.sum("q_grid").over(w_all)
    return p.select(
        "source",
        "n_tokens",
        pround(F.col("share"), 6).alias("token_share"),
        pround(temp_share, 6).alias("temp_share"),
        pround(temp_share / F.col("share"), 6).alias("upsample_factor"),
    )


@register(
    "agg_entropy_diversity",
    # -p·ln(p) per (source, lang) cell is grid-floored at 1e-6 BEFORE
    # the per-source sum (the text_unigram_logprob recipe): ln() ulp
    # drift can't move the floor, and the decimal sum is exact
    oracle="""
    WITH cells AS (
      SELECT source, lang, COUNT(*) AS n
      FROM documents GROUP BY source, lang
    ), tot AS (
      SELECT source, lang, n,
             SUM(n) OVER (PARTITION BY source) AS n_src,
             COUNT(*) OVER (PARTITION BY source) AS n_langs
      FROM cells
    ), terms AS (
      SELECT source, n, n_langs,
             CAST(floor(-(CAST(n AS DOUBLE) / n_src
                          * ln(CAST(n AS DOUBLE) / n_src)) * 1000000)
                  / 1000000 AS DECIMAL(18,6)) AS term
      FROM tot
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(MAX(n_langs) AS BIGINT) AS n_langs,
           floor(CAST(SUM(term) AS DOUBLE) * 10000 + 0.5) / 10000 AS entropy_nats,
           floor(CAST(CASE WHEN MAX(n_langs) > 1
                           THEN CAST(SUM(term) AS DOUBLE)
                                / ln(CAST(MAX(n_langs) AS DOUBLE))
                           ELSE 0.0 END AS DOUBLE) * 10000 + 0.5) / 10000
             AS norm_entropy
    FROM terms GROUP BY source ORDER BY source
    """,
)
def agg_entropy_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language-diversity report: Shannon entropy (nats) of
    the language distribution plus entropy normalized by ln(#langs) —
    the standard training-mix diversity gauge (a 0.0 means a
    single-language source, 1.0 a perfectly balanced one).

    Scale: one hash aggregate over the corpus to |source|×|lang|
    cells; entropy terms and totals are windows/aggregates on that
    tiny grain. The corpus is touched exactly once.
    """
    d = load_tables(spark, sf_dir)["documents"]
    cells = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    w_src = Window.partitionBy("source")
    tot = cells.select(
        "source",
        "n",
        F.sum("n").over(w_src).alias("n_src"),
        F.count(F.lit(1)).over(w_src).alias("n_langs"),
    )
    p = F.col("n").cast("double") / F.col("n_src")
    terms = tot.select(
        "source",
        "n",
        "n_langs",
        (F.floor(-(p * F.log(p)) * F.lit(1000000)) / F.lit(1000000))
        .cast("decimal(18,6)")
        .alias("term"),
    )
    ent = F.sum("term").cast("double")
    return (
        terms.groupBy("source")
        .agg(
            F.sum("n").alias("n_docs"),
            F.max("n_langs").alias("n_langs"),
            pround(ent).alias("entropy_nats"),
            pround(
                F.when(
                    F.max("n_langs") > 1,
                    ent / F.log(F.max("n_langs").cast("double")),
                ).otherwise(F.lit(0.0))
            ).alias("norm_entropy"),
        )
        .orderBy("source")
    )


EPOCH_CAP = 3          # max repetition per source
_EPOCH_FRAC_GRID = 1000  # md5-bucket resolution for fractional epochs


@register(
    "mix_epoch_repeat",
    # per-source epoch weight w = min(CAP, max_source_tokens /
    # source_tokens): every source is upsampled toward the largest
    # source's token mass, capped. Integer part repeats every doc;
    # the fractional part repeats a deterministic md5-chosen subset
    # (so the REALIZED epoch count is exact, not in expectation-only
    # — a new shard never re-rolls existing docs).
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, source,
             len(list_filter(string_split(text, ' '), t -> t <> ''))
               AS n_tok
      FROM documents
    ), src AS (
      SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tok,
             COUNT(*) AS n_docs
      FROM docs GROUP BY source
    ), mx AS (
      SELECT MAX(src_tok) AS max_tok FROM src
    ), w AS (
      SELECT source, n_docs, src_tok,
             LEAST(CAST({EPOCH_CAP} AS DOUBLE),
                   CAST(max_tok AS DOUBLE) / src_tok) AS wgt
      FROM src, mx
    ), per_doc AS (
      SELECT d.doc_id, d.source, d.n_tok,
             CAST(floor(w.wgt) AS BIGINT)
             + CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)),
                                              1, 8)) AS BIGINT)
                         % {_EPOCH_FRAC_GRID}
                       < CAST(floor((w.wgt - floor(w.wgt))
                                    * {_EPOCH_FRAC_GRID}) AS BIGINT)
                    THEN 1 ELSE 0 END AS n_epochs
      FROM docs d JOIN w ON w.source = d.source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_in,
           CAST(SUM(n_epochs) AS BIGINT) AS n_instances_out,
           CAST(SUM(n_tok * n_epochs) AS BIGINT) AS tokens_out,
           {pround_sql("CAST(SUM(n_epochs) AS DOUBLE) / COUNT(*)")}
             AS realized_epochs
    FROM per_doc
    GROUP BY source
    """,
)
def mix_epoch_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-based mixture upsampling: repeat each source's documents
    min(3, max_source_tokens / source_tokens) times, with the
    fractional epoch realized by a deterministic md5 subset of docs —
    the data-mixing primitive behind "epochs per dataset" tables in
    LLM training recipes (upsampling twin of mix_weighted_sample's
    downsampling).

    Determinism: the weight is one IEEE division of exact integers;
    the fractional cut compares an md5 bucket against the grid-floored
    fraction — reproducible on any engine, stable under corpus
    extension (a new doc never changes existing docs' epoch counts).

    Scale shape: two tiny aggregates (per-source tokens, global max —
    broadcast), one map-side epoch assignment, one final rollup. The
    materialization (explode by n_epochs) is deliberately NOT in this
    key: the checksums prove the assignment; the explode is a
    sequence() flatMap the consumer fuses into the training shuffle.
    """
    d = load_tables(spark, sf_dir)["documents"]
    docs = d.select(
        "doc_id",
        "source",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias(
            "n_tok"
        ),
    )
    src = docs.groupBy("source").agg(
        F.sum("n_tok").cast("bigint").alias("src_tok"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    mx = src.agg(F.max("src_tok").alias("max_tok"))
    w = src.crossJoin(F.broadcast(mx)).select(
        "source",
        F.least(
            F.lit(float(EPOCH_CAP)),
            F.col("max_tok").cast("double") / F.col("src_tok"),
        ).alias("wgt"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % _EPOCH_FRAC_GRID
    )
    frac_cut = F.floor(
        (F.col("wgt") - F.floor("wgt")) * _EPOCH_FRAC_GRID
    ).cast("bigint")
    per_doc = docs.join(F.broadcast(w), "source").select(
        "source",
        "n_tok",
        (
            F.floor("wgt").cast("bigint")
            + F.when(bucket < frac_cut, 1).otherwise(0)
        ).alias("n_epochs"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_in"),
        F.sum("n_epochs").cast("bigint").alias("n_instances_out"),
        F.sum(F.col("n_tok") * F.col("n_epochs"))
        .cast("bigint")
        .alias("tokens_out"),
        pround(F.sum("n_epochs").cast("double") / F.count(F.lit(1))).alias(
            "realized_epochs"
        ),
    )


@register(
    "mix_source_overlap_matrix",
    # cross-source duplication diagnostic: for every source pair, how
    # many distinct-token-set fingerprints they share — the matrix
    # that decides which sources to dedup against each other before
    # mixing (a one-source-at-a-time dedup can't see it).
    oracle="""
    WITH fps AS (
      SELECT DISTINCT source,
             md5(array_to_string(list_sort(list_distinct(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))),
               ' ')) AS fp
      FROM documents
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fps
    FROM fps a JOIN fps b
      ON a.fp = b.fp AND a.source < b.source
    GROUP BY a.source, b.source
    """,
)
def mix_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cross-source duplication matrix: distinct content
    fingerprints shared by each source pair. The pre-mixing
    diagnostic that tells you WHERE duplication lives — two crawls
    of the same site, a dataset embedded in another — before
    corpus-wide dedup flattens the signal.

    Scale shape: fingerprints collapse to (source, fp) DISTINCT
    first (so a source's internal duplicates count once), then ONE
    equi-join on fp whose fan-out per fingerprint is the number of
    sources containing it (<= |sources|, never document count), then
    a |sources|^2-bounded aggregate.
    """
    d = load_tables(spark, sf_dir)["documents"]
    fps = d.select(
        "source",
        F.md5(
            F.concat_ws(
                " ",
                F.sort_array(
                    F.array_distinct(F.split(canonical_text("text"), " "))
                ),
            )
        ).alias("fp"),
    ).distinct()
    b = fps.select(
        F.col("source").alias("source_b"), F.col("fp").alias("fp_b")
    )
    return (
        fps.join(
            b,
            (F.col("fp") == F.col("fp_b"))
            & (F.col("source") < F.col("source_b")),
        )
        .groupBy(F.col("source").alias("source_a"), "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_fps"))
    )


# target mix: head sources get fixed shares, the rest split the tail
# evenly — a typical hand-tuned training recipe to audit against
KL_TARGETS = {"src0": 0.20, "src1": 0.15, "src2": 0.10}
KL_TAIL_SHARE = 0.55  # remaining sources split this evenly


def _kl_target_values() -> str:
    return ", ".join(
        f"('{s}', CAST({w!r} AS DOUBLE))" for s, w in KL_TARGETS.items()
    )


@register(
    "mix_kl_to_target",
    # Mix-balance audit: KL(realized token shares || target recipe).
    # Per-source ln terms grid-floored at 1e-6 and weighted by exact
    # token counts; the target for tail sources derives from their
    # COUNT (an exact integer), so both engines compute identical
    # expected shares.
    oracle=f"""
    WITH tok AS (
      SELECT source,
             CAST(SUM(len(string_split(regexp_replace(lower(trim(text)),
                  '\\s+', ' ', 'g'), ' '))) AS BIGINT) AS n_toks
      FROM documents GROUP BY source
    ), tgt AS (
      SELECT * FROM (VALUES {_kl_target_values()}) h(source, w)
    ), n_tail AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok
      WHERE source NOT IN (SELECT source FROM tgt)
    ), shaped AS (
      SELECT t.source, t.n_toks,
             COALESCE(g.w, {KL_TAIL_SHARE} / n_tail.n) AS target_share
      FROM tok t LEFT JOIN tgt g ON g.source = t.source
      CROSS JOIN n_tail
    ), terms AS (
      SELECT source, n_toks, target_share,
             CAST(SUM(n_toks) OVER () AS BIGINT) AS total,
             CAST(floor(ln((CAST(n_toks AS DOUBLE)
                            / SUM(n_toks) OVER ()) / target_share)
                        * 1000000) AS BIGINT) AS ln_g
      FROM shaped
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
           CAST(MAX(total) AS BIGINT) AS total_tokens,
           floor(CAST(SUM(CAST(n_toks AS DECIMAL(38,0)) * ln_g) AS DOUBLE)
                 / MAX(total) / 1000000 * 1000000 + 0.5) / 1000000
             AS kl_realized_vs_target,
           (SELECT source FROM terms
            ORDER BY CAST(n_toks AS DOUBLE) / total / target_share DESC,
                     source LIMIT 1) AS most_overweighted
    FROM terms
    """,
)
def mix_kl_to_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix-balance audit: KL divergence of the REALIZED token mix from
    the target recipe (named head shares + an even tail split), plus
    the most-overweighted source. The number a mixing pipeline alerts
    on — KL near 0 means the sampling weights are doing their job,
    and the argmax ratio names the source to fix first. Companion to
    corpus_mix_report (which states the mix) and mix_weighted_sample
    (which enforces it).

    Exactness: realized shares come from exact token counts; each
    ln(realized/target) lands on a 1e-6 grid and is weighted by exact
    counts in DECIMAL(38,0); tail targets derive from an exact source
    COUNT. One window over the SOURCE grain (|sources| rows).
    """
    d = load_tables(spark, sf_dir)["documents"]
    from algebraicdb_spark.operators.dedup import canonical_text

    # tokenize-count once: the |sources|-row table feeds several
    # consumers; uncached, the corpus split re-ran per consumer
    tok = (
        d.groupBy("source")
        .agg(
            F.sum(F.size(F.split(canonical_text("text"), " ")))
            .cast("bigint")
            .alias("n_toks")
        )
        .localCheckpoint(eager=False)
    )
    tgt = d.sparkSession.createDataFrame(
        list(KL_TARGETS.items()), "source string, w double"
    )
    n_tail = tok.join(tgt, "source", "left_anti").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    shaped = (
        tok.join(F.broadcast(tgt), "source", "left")
        .crossJoin(F.broadcast(n_tail))
        .select(
            "source",
            "n_toks",
            F.coalesce(F.col("w"), F.lit(KL_TAIL_SHARE) / F.col("n")).alias(
                "target_share"
            ),
        )
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    terms = shaped.select(
        "source",
        "n_toks",
        "target_share",
        F.sum("n_toks").over(w_all).cast("bigint").alias("total"),
        F.floor(
            F.log(
                (F.col("n_toks").cast("double") / F.sum("n_toks").over(w_all))
                / F.col("target_share")
            )
            * 1000000
        )
        .cast("bigint")
        .alias("ln_g"),
    )
    ratio = F.col("n_toks").cast("double") / F.col("total") / F.col("target_share")
    w_rank = Window.orderBy(ratio.desc(), "source")
    top = (
        terms.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") == 1)
        .select(F.col("source").alias("most_overweighted"))
    )
    return (
        terms.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sources"),
            F.max("total").cast("bigint").alias("total_tokens"),
            (
                F.floor(
                    F.sum(F.col("n_toks").cast("decimal(38,0)") * F.col("ln_g"))
                    .cast("double")
                    / F.max("total")
                    / 1000000
                    * 1000000
                    + 0.5
                )
                / 1000000
            ).alias("kl_realized_vs_target"),
        )
        .crossJoin(F.broadcast(top))
    )
