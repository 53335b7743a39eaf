"""§2.10 text analysis for LLM-training-data pipelines.

Tokenize/TF, TF-IDF, n-grams, corpus stats, quality scoring, token
counting (whitespace + BPE-ish regex), content fingerprinting, and a
corpus-profile language-ID. Everything is built-in-function DataFrame
code (explode/groupBy/window) — the shapes that stay shuffle-bounded
at 100 TB: per-doc work is map-side; corpus-wide aggregates shuffle
only (term) or (lang, trigram) keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from algebraicdb_spark.functions.rounding import pround
from algebraicdb_spark.operators.dedup import canonical_text
from algebraicdb_spark.plans.registry import register
from algebraicdb_spark.sources.catalog import load_tables, spread


def tokens(col):
    return F.split(canonical_text(col), " ")


@register(
    "text_tokenize_tf",
    oracle="""
    WITH t AS (
      SELECT unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS token
      FROM documents
    )
    SELECT token, COUNT(*) AS tf
    FROM t GROUP BY token
    ORDER BY tf DESC, token ASC
    LIMIT 20
    """,
)
def text_tokenize_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus, top-20 terms by frequency (token tie-break)."""
    d = load_tables(spark, sf_dir)["documents"]
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(20)
    )


@register(
    "text_tfidf",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    ), ranked AS (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term ASC) AS rnk
      FROM scored
    )
    SELECT doc_id, term, floor(CAST(tfidf AS DOUBLE) * 10000 + 0.5) / 10000 AS tfidf, rnk
    FROM ranked WHERE rnk <= 3 AND doc_id % 10 = 0
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: tf(term,doc) × ln(N/df); top-3 terms per sampled doc.

    Two aggregates + a broadcast join of the (small) df table — the
    df side is |vocabulary|, tiny relative to the corpus at any scale.
    """
    d = load_tables(spark, sf_dir)["documents"]
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter((F.col("rnk") <= 3) & (F.col("doc_id") % 10 == 0))
        .select("doc_id", "term", pround("tfidf").alias("tfidf"), "rnk")
    )


@register(
    "text_ngrams",
    oracle="""
    WITH raw AS (
      SELECT string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS r
      FROM documents
    ), grams AS (
      SELECT unnest(list_transform(range(1, len(r)), i -> r[i] || ' ' || r[i+1])) AS bigram
      FROM raw
    )
    SELECT bigram, COUNT(*) AS n
    FROM grams GROUP BY bigram
    ORDER BY n DESC, bigram ASC
    LIMIT 20
    """,
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word bigrams (multiset, not distinct-per-doc), top-20."""
    d = load_tables(spark, sf_dir)["documents"]

    # bind the split once (see dedup.shingles); the size >= 2 guard
    # also fixes the latent 1-token crash: sequence(1, 0) descends
    # through index 0, which element_at rejects
    def grams(w):
        g = F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(w, i), F.element_at(w, i + 1)
            ),
        )
        return F.when(F.size(w) >= 2, g).otherwise(F.array().cast("array<string>"))

    bigrams = F.element_at(
        F.transform(F.array(tokens(F.col("text"))), grams), 1
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(20)
    )


@register(
    "text_lang_stats",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           floor(CAST(AVG(n_chars) AS DOUBLE) * 10000 + 0.5) / 10000 AS avg_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language × source corpus statistics."""
    d = load_tables(spark, sf_dir)["documents"]
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        pround(F.avg("n_chars")).alias("avg_chars"),
        F.sum("n_chars").alias("total_chars"),
    )


STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


@register(
    "text_quality_score",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             length(text) AS n_chars_m,
             len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))
               AS n_words,
             length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS n_punct,
             len(list_filter(
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
               t -> list_contains({list(STOPWORDS)}, t))) AS n_stop
      FROM documents
    )
    SELECT doc_id,
           n_words,
           floor(CAST(CAST(n_chars_m AS DOUBLE) / n_words AS DOUBLE) * 10000 + 0.5) / 10000 AS avg_word_len,
           floor(CAST(CAST(n_punct AS DOUBLE) / n_chars_m AS DOUBLE) * 10000 + 0.5) / 10000 AS punct_ratio,
           floor(CAST(CAST(n_stop AS DOUBLE) / n_words AS DOUBLE) * 10000 + 0.5) / 10000 AS stopword_ratio,
           CASE WHEN n_words BETWEEN 5 AND 1000
                 AND CAST(n_punct AS DOUBLE) / n_chars_m < 0.1
                THEN 1 ELSE 0 END AS passes_filter
    FROM m
    WHERE doc_id % 7 = 0
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality signals (Gopher/C4-style): word count, mean
    word length, punctuation ratio, stopword ratio, pass/fail gate."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = tokens(F.col("text"))
    n_words = F.size(toks)
    n_chars = F.length("text")
    n_punct = F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", ""))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    punct_ratio = n_punct.cast("double") / n_chars
    return d.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        n_words.alias("n_words"),
        pround(n_chars.cast("double") / n_words).alias("avg_word_len"),
        pround(punct_ratio).alias("punct_ratio"),
        pround(n_stop.cast("double") / n_words).alias("stopword_ratio"),
        F.when(n_words.between(5, 1000) & (punct_ratio < 0.1), 1)
        .otherwise(0)
        .alias("passes_filter"),
    )


@register(
    "text_token_count",
    oracle="""
    SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS whitespace_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\\s]')))
                AS BIGINT) AS bpe_ish_tokens,
           CAST(SUM(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT)
             AS chars_div4_estimate
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting three ways: whitespace split, a BPE-ish
    regex (lowercase runs / Capitalized / digits / punct), and the
    chars/4 LLM heuristic."""
    d = load_tables(spark, sf_dir)["documents"]
    ws = F.size(F.split("text", " "))
    bpe = F.size(
        F.regexp_extract_all(
            "text", F.lit(r"[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\s]"), 0
        )
    )
    est = F.ceil(F.length("text") / 4.0).cast("bigint")
    return d.agg(
        F.sum(ws).alias("whitespace_tokens"),
        F.sum(bpe).alias("bpe_ish_tokens"),
        F.sum(est).alias("chars_div4_estimate"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_hash,
           length(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS canon_len
    FROM documents
    WHERE doc_id % 9 = 0
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 over canonical text (engine-portable;
    the rolling/winnowing variants live in dedup_simhash/minhash)."""
    d = load_tables(spark, sf_dir)["documents"]
    canon = canonical_text("text")
    return d.filter(F.col("doc_id") % 9 == 0).select(
        "doc_id",
        F.md5(canon.cast("binary")).alias("content_hash"),
        F.length(canon).alias("canon_len"),
    )


N_PROFILE = 40  # trigrams per language profile


@register(
    "text_lang_id",
    # full SQL twin of the profile/score pipeline — every ranking has a
    # total-order tie-break, so the confusion matrix is deterministic
    oracle=rf"""
    WITH chars AS (
      SELECT doc_id, lang,
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS ctext
      FROM documents
    ), grams AS (
      SELECT doc_id, lang, tri
      FROM (
        SELECT doc_id, lang,
               unnest(list_transform(
                 range(1, greatest(length(ctext) - 2, 1) + 1),
                 i -> substring(ctext, i, 3))) AS tri
        FROM chars
      ) WHERE length(tri) = 3
    ), profile AS (
      SELECT lang AS p_lang, tri
      FROM (
        SELECT lang, tri,
               row_number() OVER (
                 PARTITION BY lang ORDER BY COUNT(*) DESC, tri) AS rnk
        FROM grams GROUP BY lang, tri
      ) WHERE rnk <= {N_PROFILE}
    ), doc_scores AS (
      SELECT g.doc_id, g.lang, p.p_lang, COUNT(*) AS overlap
      FROM grams g JOIN profile p ON g.tri = p.tri
      GROUP BY 1, 2, 3
    ), predicted AS (
      SELECT doc_id, lang, p_lang AS predicted
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY overlap DESC, p_lang) AS rnk
        FROM doc_scores
      ) WHERE rnk = 1
    )
    SELECT lang, predicted, COUNT(*) AS n_docs
    FROM predicted GROUP BY lang, predicted
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language-ID (TextCat shape): build per-lang
    trigram profiles from the corpus, score each doc by profile
    overlap, emit the confusion matrix vs the labeled lang.

    (The fixture's text is language-independent word salad, so
    accuracy ≈ prior — the key demonstrates the distributed profile/
    score mechanics: profile build is one (lang,trigram) agg, scoring
    is an explode + broadcast join, both scale-safe.)
    """
    d = load_tables(spark, sf_dir)["documents"]
    # spread() (guide §2.5): the trigram explode + the two partial
    # aggregates fused into the scan stage otherwise run as ONE task
    # on the single-row-group fixture parquet
    chars = spread(d).select("doc_id", "lang", canonical_text("text").alias("ctext"))
    # char trigrams: substring at each position (expr form — the Python
    # F.substring only takes literal start positions)
    grams = chars.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(ctext) - 2, 1)), "
                "i -> substring(ctext, i, 3))"
            )
        ).alias("tri"),
    ).filter(F.length("tri") == 3)
    profile = (
        grams.groupBy("lang", "tri")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("tri"))
            ),
        )
        .filter(F.col("rnk") <= N_PROFILE)
        .select(F.col("lang").alias("p_lang"), "tri")
    )
    doc_scores = (
        grams.join(F.broadcast(profile), "tri")
        .groupBy("doc_id", "lang", "p_lang")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("overlap").desc(), F.col("p_lang"))
    predicted = (
        doc_scores.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("doc_id", "lang", F.col("p_lang").alias("predicted"))
    )
    return (
        predicted.groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "text_pii_scrub",
    # the fixture corpus is PII-free word salad, so the key SEEDS
    # deterministic emails/phones first (same expression both engines)
    # and then scrubs them — redaction counts + a post-scrub leak
    # check are all hash-verified
    oracle=r"""
    WITH seeded AS (
      SELECT doc_id,
             'contact user' || CAST(doc_id AS VARCHAR) ||
             '@example.com or +1-555-' ||
             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' re: ' || text
               AS text
      FROM documents WHERE doc_id % 11 = 0
    ), scrubbed AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                              '<EMAIL>', 'g'),
               '\+?\d[\d-]{7,}\d', '<PHONE>', 'g') AS clean
      FROM seeded
    )
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN clean LIKE '%<EMAIL>%' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_email_redacted,
           CAST(SUM(CASE WHEN clean LIKE '%<PHONE>%' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_phone_redacted,
           CAST(SUM(CASE WHEN regexp_matches(clean, '@|\+?\d{3}-') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_leaks,
           CAST(SUM(length(clean)) AS BIGINT) AS clean_chars
    FROM scrubbed
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails, phone numbers) — a mandatory stage in any
    training-data pipeline. Pure regexp_replace: map-side, codegen,
    no shuffle except the final one-row audit aggregate; the leak
    counter is the property a compliance gate would alert on."""
    d = load_tables(spark, sf_dir)["documents"]
    seeded = d.filter(F.col("doc_id") % 11 == 0).select(
        "doc_id",
        F.concat(
            F.lit("contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" re: "),
            F.col("text"),
        ).alias("text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.col("text"),
            r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
            "<EMAIL>",
        ),
        r"\+?\d[\d-]{7,}\d",
        "<PHONE>",
    )
    scrubbed = seeded.select("doc_id", clean.alias("clean"))
    return scrubbed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("clean").like("%<EMAIL>%").cast("bigint")).alias(
            "n_email_redacted"
        ),
        F.sum(F.col("clean").like("%<PHONE>%").cast("bigint")).alias(
            "n_phone_redacted"
        ),
        F.sum(F.col("clean").rlike(r"@|\+?\d{3}-").cast("bigint")).alias("n_leaks"),
        F.sum(F.length("clean")).alias("clean_chars"),
    )


@register(
    "text_unigram_logprob",
    # per-token surprise is grid-floored at 1e-6 BEFORE the sum: ln()
    # may differ by an ulp between the JVM and libm, but a 1e-14
    # discrepancy cannot move a 1e-6 floor, and the decimal-grid sum
    # is then exact and order-independent on both engines
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
      FROM documents
    ), vocab AS (
      SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
    ), total AS (
      SELECT COUNT(*) AS big_n FROM toks
    ), scored AS (
      SELECT t.doc_id,
             CAST(floor(-ln(CAST(v.n AS DOUBLE) / big_n) * 1000000) / 1000000
                  AS DECIMAL(18,6)) AS surprise
      FROM toks t JOIN vocab v USING (tok) CROSS JOIN total
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           floor(CAST(CAST(SUM(surprise) AS DOUBLE) / COUNT(*) AS DOUBLE)
                 * 10000 + 0.5) / 10000 AS avg_logprob
    FROM scored
    GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-LM quality score (CCNet-style): per-doc mean token
    surprise −ln p(token) under the corpus's own unigram distribution.
    Low = templated/common text, high = rare-token soup — both tails
    are what a perplexity filter prunes before LLM training.

    Scale shape: one vocab aggregate (token → count, the classic
    zipf-bounded table), a broadcast-friendly equi-join back onto the
    token stream, one per-doc aggregate. The corpus total rides a
    1-row broadcast. At 100 TB the vocab table shards by token hash
    and AQE picks the join side; nothing is quadratic and no Python
    runs per token.
    """
    d = load_tables(spark, sf_dir)["documents"]
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    total = toks.agg(F.count(F.lit(1)).alias("big_n"))
    surprise = F.floor(
        -F.log(F.col("n").cast("double") / F.col("big_n")) * 1000000
    ) / 1000000
    scored = (
        toks.join(vocab, "tok")
        .join(F.broadcast(total))
        .select("doc_id", surprise.cast("decimal(18,6)").alias("surprise"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        pround(
            F.sum("surprise").cast("double") / F.count(F.lit(1))
        ).alias("avg_logprob"),
    )


@register(
    "text_bigram_logprob",
    # same determinism recipe as text_unigram_logprob: each bigram's
    # -ln P(w2|w1) is grid-floored at 1e-6 BEFORE the per-doc sum
    # (ulp-level ln() disagreement cannot move the floor), and the
    # decimal-grid sum is exact and order-free on both engines. The
    # context count is derived from the bigram stream itself, so both
    # engines see identical denominators.
    oracle="""
    WITH toks AS (
      SELECT d.doc_id, u.tok, u.pos
      FROM documents d,
           LATERAL (
             SELECT UNNEST(string_split(
                      regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g'),
                      ' ')) AS tok,
                    generate_subscripts(string_split(
                      regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g'),
                      ' '), 1) AS pos
           ) u
    ), bigs AS (
      SELECT doc_id, w1, w2 FROM (
        SELECT doc_id, tok AS w1,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM toks
      ) WHERE w2 IS NOT NULL
    ), ctx AS (
      SELECT w1, COUNT(*) AS nc FROM bigs GROUP BY w1
    ), bv AS (
      SELECT w1, w2, COUNT(*) AS nb FROM bigs GROUP BY w1, w2
    ), scored AS (
      SELECT b.doc_id,
             CAST(floor(-ln(CAST(v.nb AS DOUBLE) / c.nc) * 1000000) / 1000000
                  AS DECIMAL(18,6)) AS surprise
      FROM bigs b
      JOIN bv v ON b.w1 = v.w1 AND b.w2 = v.w2
      JOIN ctx c ON b.w1 = c.w1
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           floor(CAST(CAST(SUM(surprise) AS DOUBLE) / COUNT(*) AS DOUBLE)
                 * 10000 + 0.5) / 10000 AS avg_logprob
    FROM scored
    GROUP BY doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality score: per-doc mean surprise -ln P(w2|w1)
    under the corpus's own bigram model (context counts from the same
    bigram stream, so P sums to 1 per context). The 2-gram step up
    from ``text_unigram_logprob``: catches word-salad documents whose
    unigram mix looks normal but whose transitions are improbable —
    the stronger CCNet-style filter signal.

    Scale shape: bigrams are built ARRAY-SIDE (zip the token array
    against its own tail inside one projection — zero shuffle, and the
    token array is lambda-bound once per row, never re-split per
    element), then one bigram-vocab aggregate, one context aggregate
    derived from it, two equi-joins back, one per-doc aggregate. The
    bigram vocab is the biggest intermediate; it shards by (w1, w2)
    hash exactly like any token-count table.
    """
    d = load_tables(spark, sf_dir)["documents"]
    # bind the token array ONCE via a 1-element transform (HOF lambda
    # rebinding: referencing tokens(text) directly inside the zip
    # lambda would re-split the text per element)
    bigrams = F.element_at(
        F.transform(
            F.array(tokens(F.col("text"))),
            lambda a: F.when(
                F.size(a) >= 2,
                F.zip_with(
                    F.slice(a, 1, F.size(a) - 1),
                    F.slice(a, 2, F.size(a) - 1),
                    lambda x, y: F.concat(x, F.lit(" "), y),
                ),
            ).otherwise(F.array().cast("array<string>")),
        ),
        1,
    )
    # tokenize once: bigs feeds the context counts, the bigram counts,
    # and the scored join — uncached, the explode ran three times
    bigs = d.select("doc_id", F.explode(bigrams).alias("big")).localCheckpoint(
        eager=False
    )
    ctx = bigs.select(F.split_part(F.col("big"), F.lit(" "), F.lit(1)).alias("w1")) \
        .groupBy("w1").agg(F.count(F.lit(1)).alias("nc"))
    bv = bigs.groupBy("big").agg(F.count(F.lit(1)).alias("nb"))
    surprise = (
        F.floor(-F.log(F.col("nb").cast("double") / F.col("nc")) * 1000000)
        / 1000000
    )
    # join nc onto the VOCAB grain, not the exploded stream (round 14,
    # guide §2.3): the former plan re-joined every exploded bigram row
    # first by bigram string and then again by w1 — two exploded-grain
    # joins; scoring each distinct bigram once and attaching the
    # finished surprise with a single join is 1.83 -> 1.26 s at sf0.1
    # (same per-row decimal terms, order-free per-doc sum, symdiff 0).
    vocab = (
        bv.withColumn("w1", F.split_part(F.col("big"), F.lit(" "), F.lit(1)))
        .join(ctx, "w1")
        .select("big", surprise.cast("decimal(18,6)").alias("surprise"))
    )
    scored = bigs.join(vocab, "big").select("doc_id", "surprise")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        pround(F.sum("surprise").cast("double") / F.count(F.lit(1))).alias(
            "avg_logprob"
        ),
    )


CMS_D = 3  # hash rows
CMS_W = 1024  # buckets per row


@register(
    "text_count_min",
    # Count-Min sketch with a FULL value-hash oracle: the d=3 hash
    # functions are md5-derived (engine-portable, the dedup_minhash
    # recipe), so DuckDB can rebuild the identical 3x1024 cell grid
    # and replay every estimate. CMS guarantees est >= exact always
    # and est <= exact + eps*N w.h.p.; the overcount column makes the
    # first invariant part of the hashed result.
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS token
      FROM documents
    ),
    js AS (SELECT * FROM (VALUES (0), (1), (2)) t(j)),
    cells AS (
      SELECT j,
             CAST('0x' || substr(md5('cms' || CAST(j AS VARCHAR) || ':' || token), 1, 15) AS BIGINT)
               % {CMS_W} AS bucket,
             COUNT(*) AS cell_cnt
      FROM toks, js GROUP BY 1, 2
    ),
    tf AS (SELECT token, COUNT(*) AS n_exact FROM toks GROUP BY token),
    top AS (
      SELECT token, n_exact
      FROM (SELECT token, n_exact,
                   row_number() OVER (ORDER BY n_exact DESC, token) AS rk
            FROM tf)
      WHERE rk <= 20
    ),
    tb AS (
      SELECT top.token, top.n_exact, js.j,
             CAST('0x' || substr(md5('cms' || CAST(js.j AS VARCHAR) || ':' || top.token), 1, 15) AS BIGINT)
               % {CMS_W} AS bucket
      FROM top, js
    )
    SELECT tb.token,
           CAST(MIN(tb.n_exact) AS BIGINT) AS n_exact,
           CAST(MIN(cells.cell_cnt) AS BIGINT) AS cms_est,
           CAST(MIN(cells.cell_cnt) - MIN(tb.n_exact) AS BIGINT) AS overcount
    FROM tb JOIN cells ON cells.j = tb.j AND cells.bucket = tb.bucket
    GROUP BY tb.token
    """,
)
def text_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch term frequencies: build a d=3 x w=1024 cell
    grid over the token stream, then answer point queries for the
    top-20 exact terms next to their true counts.

    This is the mergeable-sketch counterpart of text_heavy_hitters
    (Misra-Gries) that CAN be value-hash-checked: fixed md5 hash
    functions make the grid bit-reproducible on any engine. Cells
    are sum-mergeable, so per-slice partial grids union by simple
    addition — the re-aggregation property warehouse rollups need.

    Scale shape: the sketch build shuffles at most d*w = 3072 cells
    regardless of corpus size (map-side combine collapses the token
    stream per partition); the exact tf pass exists only to ground
    the estimates and is itself one token-key shuffle. Queries probe
    d cells per term against the broadcast-size grid.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("token"))

    def bucket(j: int, col):
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cms{j}:"), col)), 1, 15), 16, 10
        ).cast("long")
        return h % CMS_W

    cells = (
        toks.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            bucket(j, F.col("token")).alias("bucket"),
                        )
                        for j in range(CMS_D)
                    ]
                )
            ).alias("c")
        )
        .select("c.j", "c.bucket")
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cell_cnt"))
    )
    tf = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n_exact"))
    w = Window.orderBy(F.col("n_exact").desc(), "token")
    top = tf.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 20)
    probes = top.select(
        "token",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        bucket(j, F.col("token")).alias("bucket"),
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("c"),
    ).select("token", "n_exact", "c.j", "c.bucket")
    return (
        probes.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("token")
        .agg(
            F.min("n_exact").cast("long").alias("n_exact"),
            F.min("cell_cnt").cast("long").alias("cms_est"),
            (F.min("cell_cnt") - F.min("n_exact")).cast("long").alias("overcount"),
        )
    )


@register(
    "text_keyword_topk",
    # Per-doc keyword extraction: weights are tf x grid-floored idf
    # (exact BIGINTs, the sim_tfidf_cosine recipe), ranked per doc on
    # (weight DESC, token) — a total integer order, no float near the
    # cut. Scoped to a fixed doc sample so output stays bounded.
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS token
      FROM documents
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS c FROM toks GROUP BY 1, 2),
    df AS (SELECT token, COUNT(*) AS dfc FROM tf GROUP BY token),
    nn AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
    w AS (
      SELECT tf.doc_id, tf.token,
             tf.c * CAST(floor(ln(CAST(nn.n AS DOUBLE) / df.dfc) * 10000) AS BIGINT)
               AS w
      FROM tf JOIN df ON df.token = tf.token CROSS JOIN nn
      WHERE tf.doc_id < 25
    )
    SELECT doc_id, rk, token, CAST(w AS BIGINT) AS w_scaled
    FROM (
      SELECT doc_id, token, w,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY w DESC, token) AS rk
      FROM w
    ) WHERE rk <= 3
    """,
)
def text_keyword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 TF-IDF terms for a fixed
    doc sample — the retrieval-index inversion of sim_tfidf_cosine
    (what characterizes THIS doc, rather than which docs are alike).

    Scale shape: corpus-wide df/N aggregates broadcast onto the
    per-doc term rows; the rank window partitions by doc_id (never a
    global sort), so the full-corpus version is the same plan with
    the WHERE removed — per-doc work stays map-local after one
    (doc, token) shuffle.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("dfc"))
    nn = tf.agg(F.countDistinct("doc_id").alias("n"))
    w = (
        tf.where(F.col("doc_id") < 25)
        .join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "token",
            (
                F.col("c")
                * F.floor(
                    F.log(F.col("n").cast("double") / F.col("dfc")) * 10000
                ).cast("long")
            ).alias("w"),
        )
    )
    wr = Window.partitionBy("doc_id").orderBy(F.col("w").desc(), "token")
    return (
        w.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= 3)
        .select("doc_id", "rk", "token", F.col("w").cast("long").alias("w_scaled"))
    )


@register(
    "text_ngram_novelty",
    # prefix novelty: a shingle is "novel" for the LOWEST doc_id that
    # contains it (ingestion order in the fixtures). The standard
    # incremental-corpus curation metric: low novelty => the doc is
    # mostly re-treading earlier content even if no single earlier
    # doc is a near-duplicate (which is why the MinHash keys can't
    # see it).
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                          ' ') AS r
      FROM documents
    ), toks AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(r) - 1),
                           i -> r[i] || ' ' || r[i+1] || ' ' || r[i+2]))
               AS shingles
      FROM raw
    ), exploded AS (
      SELECT doc_id, unnest(shingles) AS tok FROM toks
    ), firsts AS (
      SELECT tok, MIN(doc_id) AS first_doc FROM exploded GROUP BY tok
    )
    SELECT e.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           floor(CAST(CAST(SUM(CASE WHEN f.first_doc = e.doc_id
                                    THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) AS DOUBLE) * 10000 + 0.5) / 10000 AS novelty
    FROM exploded e JOIN firsts f ON f.tok = e.tok
    GROUP BY e.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty against everything ingested before
    it: the fraction of the doc's distinct 3-gram shingles whose
    FIRST corpus occurrence (minimum doc_id) is this doc.

    Scale shape (rewritten round 14, guide §2.3 "aggregate before you
    shuffle"): one shingle explode (distinct per doc, the shared dedup
    helper), then TWO aggregates joined at the DOC grain — per-doc
    shingle counts, and per-doc novel counts obtained by counting the
    (shingle → min doc_id) table by its min ("a shingle is novel in
    exactly the doc that owns its corpus-first occurrence"). The
    before-plan instead equi-joined the exploded shingle rows back to
    the firsts table on the SHINGLE STRING — re-shuffling every
    (doc, shingle) row with its text key a second time — before
    reducing to the doc grain; the after-plan's second shuffle carries
    only (doc_id, count) rows, and the doc⋈doc join is dimension-sized
    at any corpus size. On a growing corpus the firsts table stays the
    persistent state (upsert min per new shingle batch) — the same
    mergeable-MIN shape this one-shot form computes globally.
    ``spread`` parallelizes the single-row-group fixture scan (§2.5).
    The explode deliberately re-runs once per aggregate — A/B-measured
    0.80 s vs 1.00 s with a localCheckpoint at sf0.1: materializing
    the 500k exploded shingle rows costs more than recomputing them.
    """
    from algebraicdb_spark.operators.dedup import shingles

    d = load_tables(spark, sf_dir)["documents"]
    ex = spread(d).select(
        "doc_id", F.explode(shingles(F.col("text"))).alias("tok")
    )
    per_doc = ex.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles")
    )
    novel_per_doc = (
        ex.groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy(F.col("first_doc").alias("doc_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_novel"))
    )
    return (
        per_doc.join(novel_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
            pround(
                F.coalesce("n_novel", F.lit(0)).cast("double") / F.col("n_shingles")
            ).alias("novelty"),
        )
    )


CODE_KEYWORDS = ("def ", "return ", "import ", "function ", "class ", "var ")


@register(
    "text_code_detect",
    # Heuristic code-vs-prose classifier for corpus triage: symbol
    # density ({}();=<>[]) and programming-keyword hits per doc, both
    # exact integer counts; a doc is "code-like" when symbols*40 >=
    # chars (>=2.5% symbol density) or it contains >= 2 distinct
    # keywords — integer cross-multiplied decisions, no float
    # thresholds. Aggregated per (source, flag).
    oracle=f"""
    WITH feat AS (
      SELECT source,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(length(text) - length(
               regexp_replace(text, '[{{}}();=<>\\[\\]]', '', 'g'))
               AS BIGINT) AS n_sym,
             CAST({' + '.join(f"CASE WHEN contains(text, '{k}') THEN 1 ELSE 0 END" for k in CODE_KEYWORDS)}
                  AS BIGINT) AS n_kw
      FROM documents
    ), flagged AS (
      SELECT source, n_chars, n_sym, n_kw,
             CASE WHEN n_sym * 40 >= n_chars OR n_kw >= 2
                  THEN 1 ELSE 0 END AS is_code
      FROM feat
    )
    SELECT source, is_code,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_sym) AS BIGINT) AS total_sym,
           CAST(SUM(n_kw) AS BIGINT) AS total_kw,
           floor(CAST(SUM(n_sym) AS DOUBLE) / SUM(n_chars)
                 * 10000 + 0.5) / 10000 AS sym_density
    FROM flagged GROUP BY source, is_code
    """,
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose triage: the corpus-mixing decision 'is this
    source shipping source code?' answered with the two heuristics
    production pipelines actually start from — symbol density
    ({}();=<>[] per char) and programming-keyword presence. Flag
    decided by integer cross-multiplication (symbols·40 ≥ chars ⇔
    density ≥ 2.5%) or ≥ 2 distinct keywords — no float threshold.
    Routes docs to a code-aware tokenizer/quality path, next to
    text_lang_id's natural-language routing.

    Scale shape: per-doc feature extraction is pure map-side string
    ops (JVM regexp, no UDF); one hash agg on (source, flag).
    """
    d = load_tables(spark, sf_dir)["documents"]
    n_chars = F.length("text").cast("bigint")
    n_sym = (
        F.length("text")
        - F.length(F.regexp_replace("text", r"[{}();=<>\[\]]", ""))
    ).cast("bigint")
    n_kw = sum(
        F.when(F.col("text").contains(k), 1).otherwise(0)
        for k in CODE_KEYWORDS
    ).cast("bigint")
    feat = d.select(
        "source",
        n_chars.alias("n_chars"),
        n_sym.alias("n_sym"),
        n_kw.alias("n_kw"),
    )
    flagged = feat.select(
        "source",
        "n_chars",
        "n_sym",
        "n_kw",
        F.when(
            (F.col("n_sym") * 40 >= F.col("n_chars")) | (F.col("n_kw") >= 2), 1
        )
        .otherwise(0)
        .alias("is_code"),
    )
    return flagged.groupBy("source", "is_code").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_sym").cast("bigint").alias("total_sym"),
        F.sum("n_kw").cast("bigint").alias("total_kw"),
        (
            F.floor(
                F.sum("n_sym").cast("double") / F.sum("n_chars") * 10000 + 0.5
            )
            / 10000
        ).alias("sym_density"),
    )


DF_MIN = 3        # keep terms appearing in >= 3 docs
DF_MAX_PCT = 50   # ...and in <= 50% of docs (stopword cut)


@register(
    "text_frequency_filter",
    # Vocabulary pruning (min-df / max-df): the sklearn/gensim dial
    # every sparse-text pipeline turns first. Reports, per decision
    # class, vocab size and TOKEN coverage — the quantity that tells
    # you what the pruned representation still explains.
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
      FROM documents
    ), tf AS (
      SELECT tok,
             CAST(COUNT(*) AS BIGINT) AS n_occ,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks GROUP BY tok
    ), nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM toks),
    classed AS (
      SELECT tok, n_occ, df,
             CASE WHEN df < {DF_MIN} THEN 'rare'
                  WHEN df * 100 > nd.n_docs * {DF_MAX_PCT} THEN 'stopword'
                  ELSE 'kept' END AS class
      FROM tf CROSS JOIN nd
    )
    SELECT class,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(SUM(n_occ) AS BIGINT) AS n_tokens,
           floor(CAST(SUM(n_occ) AS DOUBLE)
                 / (SELECT SUM(n_occ) FROM tf) * 10000 + 0.5) / 10000
             AS token_share
    FROM classed GROUP BY class
    """,
)
def text_frequency_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-df / max-df vocabulary pruning audit: classify every term
    as rare (df < 3), stopword (df > 50% of docs), or kept, and report
    each class's vocab size and share of total TOKEN mass. The
    decision data behind the first dial of every sparse-text pipeline
    — rare terms are usually most of the VOCAB but a sliver of the
    tokens, stopwords the mirror image; this key shows both numbers
    instead of assuming them.

    Exactness: df decided by integer cross-multiplication (df·100 >
    n_docs·50), counts exact, shares one division each. Scale: one
    (token) hash agg carries the whole statistic; the doc-count is a
    1-row broadcast.
    """
    from algebraicdb_spark.operators.dedup import canonical_text

    d = load_tables(spark, sf_dir)["documents"]
    toks = d.select(
        "doc_id", F.explode(F.split(canonical_text("text"), " ")).alias("tok")
    )
    tf = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ"),
        F.countDistinct("doc_id").cast("bigint").alias("df"),
    )
    nd = toks.agg(F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
    tot = tf.agg(F.sum("n_occ").cast("bigint").alias("all_occ"))
    classed = tf.crossJoin(F.broadcast(nd)).select(
        "n_occ",
        F.when(F.col("df") < DF_MIN, "rare")
        .when(F.col("df") * 100 > F.col("n_docs") * DF_MAX_PCT, "stopword")
        .otherwise("kept")
        .alias("class"),
    )
    return (
        classed.groupBy("class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
            F.sum("n_occ").cast("bigint").alias("n_tokens"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "class",
            "vocab_size",
            "n_tokens",
            pround(F.col("n_tokens").cast("double") / F.col("all_occ")).alias(
                "token_share"
            ),
        )
    )


@register(
    "text_readability",
    # Flesch reading-ease per source: 206.835 - 1.015*(words/sentences)
    # - 84.6*(syllables/words), with syllables approximated by vowel
    # groups and sentences by [.!?] runs (min 1) — the standard cheap
    # proxies. Per-doc scores grid-floored at 1e-2 then averaged from
    # exact integer sums; components exposed alongside.
    oracle=r"""
    WITH feat AS (
      SELECT source,
             CAST(len(string_split(regexp_replace(lower(trim(text)),
                      '\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS BIGINT) AS n_sents,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS BIGINT) AS n_syll
      FROM documents
    ), scored AS (
      SELECT source, n_words, n_sents, n_syll,
             CAST(floor((206.835
                         - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
                         - 84.6 * (CAST(n_syll AS DOUBLE) / n_words))
                        * 100) AS BIGINT) AS flesch_g
      FROM feat WHERE n_words > 0
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_syll) AS BIGINT) AS n_syllables,
           floor(CAST(SUM(flesch_g) AS DOUBLE) / COUNT(*) / 100
                 * 100 + 0.5) / 100 AS avg_flesch
    FROM scored GROUP BY source
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per source — the classic readability score
    (90 = grade school, 30 = academic), with the standard cheap
    proxies: syllables ≈ vowel groups, sentences ≈ [.!?] runs. A
    corpus-mixing quality axis orthogonal to text_quality_score's
    surface stats and the LM-surprise keys: readability targets the
    HUMAN difficulty of text, which matters when curating instruction
    or educational data.

    Exactness: all three counts are exact integers from JVM regexp
    (no UDF); each doc's score is one identical double expression
    grid-floored at 1e-2, and the per-source average divides exact
    integer sums once. Scale: map-side features + one hash agg.
    """
    d = load_tables(spark, sf_dir)["documents"]
    from algebraicdb_spark.operators.dedup import canonical_text

    n_words = F.size(F.split(canonical_text("text"), " ")).cast("bigint")
    n_sents = F.greatest(
        F.size(F.expr(r"regexp_extract_all(text, '[.!?]+', 0)")),
        F.lit(1),
    ).cast("bigint")
    n_syll = F.size(
        F.expr(r"regexp_extract_all(lower(text), '[aeiouy]+', 0)")
    ).cast("bigint")
    feat = d.select(
        "source",
        n_words.alias("n_words"),
        n_sents.alias("n_sents"),
        n_syll.alias("n_syll"),
    ).where(F.col("n_words") > 0)
    flesch_g = F.floor(
        (
            F.lit(206.835)
            - F.lit(1.015) * (F.col("n_words").cast("double") / F.col("n_sents"))
            - F.lit(84.6) * (F.col("n_syll").cast("double") / F.col("n_words"))
        )
        * 100
    ).cast("bigint")
    scored = feat.select("source", "n_words", "n_syll", flesch_g.alias("flesch_g"))
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("n_words"),
        F.sum("n_syll").cast("bigint").alias("n_syllables"),
        (
            F.floor(
                F.sum("flesch_g").cast("double") / F.count(F.lit(1)) / 100 * 100
                + 0.5
            )
            / 100
        ).alias("avg_flesch"),
    )


@register(
    "text_nonascii_audit",
    # Encoding hygiene: per source, docs and chars that are non-ASCII,
    # plus the mojibake tell (U+FFFD replacement chars) — the cheap
    # screen run before any tokenizer sees the bytes. Counts exact
    # (length minus ASCII-stripped length); flags by integer
    # cross-multiplication (non-ascii*20 > chars ⇔ >5%).
    oracle="""
    WITH feat AS (
      SELECT source,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(length(text) - length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g'))
                  AS BIGINT) AS n_nonascii,
             CAST(length(text) - length(replace(text, chr(65533), ''))
                  AS BIGINT) AS n_replacement
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_nonascii) AS BIGINT) AS nonascii_chars,
           CAST(SUM(n_replacement) AS BIGINT) AS replacement_chars,
           CAST(SUM(CASE WHEN n_nonascii * 20 > n_chars THEN 1 ELSE 0 END)
                AS BIGINT) AS n_heavy_docs,
           floor(CAST(SUM(n_nonascii) AS DOUBLE) / SUM(n_chars)
                 * 1000000 + 0.5) / 1000000 AS nonascii_ratio
    FROM feat GROUP BY source
    """,
)
def text_nonascii_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-hygiene audit per source: non-ASCII character mass,
    U+FFFD replacement characters (the mojibake smoking gun — a
    decoder already destroyed bytes upstream), and docs that are
    >5% non-ASCII (integer cross-multiplied flag). The screen that
    runs BEFORE tokenization in every corpus pipeline: replacement
    chars mean re-fetch the source, heavy non-ASCII in a declared-
    English source means the lang label lies (handing off to
    text_lang_id).

    Scale shape: pure map-side JVM regexp/replace counting + one
    hash agg per source — no UDF, no shuffle beyond the source grain.
    """
    d = load_tables(spark, sf_dir)["documents"]
    n_chars = F.length("text").cast("bigint")
    n_nonascii = (
        F.length("text")
        - F.length(F.regexp_replace("text", r"[^\x00-\x7F]", ""))
    ).cast("bigint")
    n_repl = (
        F.length("text") - F.length(F.regexp_replace("text", "�", ""))
    ).cast("bigint")
    feat = d.select(
        "source",
        n_chars.alias("n_chars"),
        n_nonascii.alias("n_nonascii"),
        n_repl.alias("n_replacement"),
    )
    return feat.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_nonascii").cast("bigint").alias("nonascii_chars"),
        F.sum("n_replacement").cast("bigint").alias("replacement_chars"),
        F.sum(
            F.when(F.col("n_nonascii") * 20 > F.col("n_chars"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_heavy_docs"),
        (
            F.floor(
                F.sum("n_nonascii").cast("double") / F.sum("n_chars") * 1000000
                + 0.5
            )
            / 1000000
        ).alias("nonascii_ratio"),
    )
