"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2.10).

All hot paths are built-in expressions (split/filter/transform/
regexp_*) — no Python per row. The explode-based ops (tf-idf,
sentiment) shuffle on (doc_id|word); at 100 TB the word-keyed shuffle
is skew-prone (Zipfian words), which AQE skew-split handles; document-
keyed aggregations are uniform.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import Tables
from ..norms import qnt
from ..regutil import registrar

QUERIES: dict = {}
ORACLE: dict = {}
op = registrar(QUERIES, ORACLE)

_STOPWORDS = ("a", "the")
_POS_WORDS = ("fast", "big", "value")
_NEG_WORDS = ("slow", "small")


def _tokens():
    return F.split(F.col("text"), " ")


@op(
    "text_stats",
    sql="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_words,
           CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_words
    FROM documents
    GROUP BY lang
    """,
)
def text_stats(spark, sf_dir):
    """Corpus statistics per language: doc counts, length and word-count aggregates."""
    t = Tables(spark, sf_dir)
    n_words = F.size(_tokens())
    return t.documents.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(n_words).cast("long").alias("total_words"),
        (F.sum(n_words).cast("double") / F.count(F.lit(1))).alias("avg_words"),
    )


@op(
    "text_tokenize",
    sql=f"""
    SELECT doc_id,
           CAST(len(string_split(COALESCE(text, ''), ' ')) AS INT) AS n_tokens,
           array_to_string(list_filter(string_split(COALESCE(text, ''), ' '),
                       x -> x NOT IN {_STOPWORDS}), ' ') AS tokens_nostop,
           CAST(len(list_filter(string_split(COALESCE(text, ''), ' '),
                       x -> x NOT IN {_STOPWORDS})) AS INT) AS n_nostop
    FROM documents
    """,
)
def text_tokenize(spark, sf_dir):
    """Whitespace tokenization + stopword removal, pure expressions.

    The filtered token list is re-joined to a string output column (filter
    still runs element-wise) so every cell stays hashable for the driver's
    order-insensitive comparison."""
    t = Tables(spark, sf_dir)
    toks = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    nostop = F.filter(toks, lambda x: ~x.isin(*_STOPWORDS))
    return t.documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.concat_ws(" ", nostop).alias("tokens_nostop"),
        F.size(nostop).alias("n_nostop"),
    )


@op(
    "text_token_count",
    sql="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INT) AS bpe_ish_tokens,
           CAST(ceil(n_chars / 4.0) AS BIGINT) AS byte_estimate_tokens
    FROM documents
    """,
)
def text_token_count(spark, sf_dir):
    """Token counting three ways: whitespace, BPE-ish regex pieces, and
    the chars/4 heuristic used for budget estimates."""
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.size(_tokens()).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[0-9]+"), 0)).alias(
            "bpe_ish_tokens"
        ),
        F.ceil(F.col("n_chars") / 4.0).alias("byte_estimate_tokens"),
    )


@op(
    "text_quality",
    sql=f"""
    SELECT doc_id,
           CAST(len(string_split(COALESCE(text, ''), ' ')) AS INT) AS n_words,
           CAST(len(list_distinct(string_split(COALESCE(text, ''), ' '))) AS INT) AS n_uniq,
           round(CAST(len(list_distinct(string_split(COALESCE(text, ''), ' '))) AS DOUBLE)
                 / len(string_split(COALESCE(text, ''), ' ')), 6) AS uniq_ratio,
           round(CAST(len(list_filter(string_split(COALESCE(text, ''), ' '),
                          x -> x IN {_STOPWORDS})) AS DOUBLE)
                 / len(string_split(COALESCE(text, ''), ' ')), 6) AS stopword_ratio,
           round(CAST(n_chars AS DOUBLE) / len(string_split(COALESCE(text, ''), ' ')), 6) AS avg_word_len,
           CAST(len(string_split(COALESCE(text, ''), ' ')) BETWEEN 20 AND 200
                AND CAST(len(list_distinct(string_split(COALESCE(text, ''), ' '))) AS DOUBLE)
                    / len(string_split(COALESCE(text, ''), ' ')) > 0.2 AS BOOLEAN) AS passes_filter
    FROM documents
    """,
)
def text_quality(spark, sf_dir):
    """Heuristic quality scoring: length band, uniqueness, stopword
    density — the standard pre-training corpus filters."""
    t = Tables(spark, sf_dir)
    toks = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    n_words = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    uniq_ratio = n_uniq.cast("double") / n_words
    stop_ratio = (
        F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS))).cast("double") / n_words
    )
    return t.documents.select(
        "doc_id",
        n_words.alias("n_words"),
        n_uniq.alias("n_uniq"),
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(F.col("n_chars").cast("double") / n_words, 6).alias("avg_word_len"),
        (n_words.between(20, 200) & (uniq_ratio > 0.2)).alias("passes_filter"),
    )


# Distinctive-ish stopword sets per language for the n-gram/stopword
# voting heuristic. The fixture vocabulary is shared across langs, so
# votes mostly tie — the point is the deterministic *mechanism*.
_LANG_MARKERS = {
    "en": ("the", "a", "fast"),
    "de": ("der", "die", "und"),
    "es": ("el", "la", "que"),
    "fr": ("le", "la", "et"),
    "zh": ("de", "le", "shi"),
}


def _vote_sql(lang: str) -> str:
    return (
        f"len(list_filter(string_split(COALESCE(text, ''), ' '), x -> x IN {_LANG_MARKERS[lang]}))"
    )


@op(
    "text_langid",
    sql=f"""
    SELECT doc_id, lang AS lang_true,
           CASE WHEN {_vote_sql('en')} >= {_vote_sql('de')}
                 AND {_vote_sql('en')} >= {_vote_sql('es')}
                 AND {_vote_sql('en')} >= {_vote_sql('fr')}
                 AND {_vote_sql('en')} >= {_vote_sql('zh')} THEN 'en'
                WHEN {_vote_sql('de')} >= {_vote_sql('es')}
                 AND {_vote_sql('de')} >= {_vote_sql('fr')}
                 AND {_vote_sql('de')} >= {_vote_sql('zh')} THEN 'de'
                WHEN {_vote_sql('es')} >= {_vote_sql('fr')}
                 AND {_vote_sql('es')} >= {_vote_sql('zh')} THEN 'es'
                WHEN {_vote_sql('fr')} >= {_vote_sql('zh')} THEN 'fr'
                ELSE 'zh' END AS lang_pred
    FROM (SELECT doc_id, lang, COALESCE(text, '') AS text
          FROM documents) d
    """,
)
def text_langid(spark, sf_dir):
    """Marker-word voting language ID with a fixed priority order for
    ties (deterministic; real corpora would use n-gram profiles)."""
    t = Tables(spark, sf_dir)
    # empty-document contract: NULL text votes like the empty doc
    toks = F.split(F.coalesce(F.col("text"), F.lit("")), " ")

    def vote(lang):
        return F.size(F.filter(toks, lambda x: x.isin(*_LANG_MARKERS[lang])))

    v = {lang: vote(lang) for lang in _LANG_MARKERS}
    pred = (
        F.when(
            (v["en"] >= v["de"]) & (v["en"] >= v["es"]) & (v["en"] >= v["fr"]) & (v["en"] >= v["zh"]),
            "en",
        )
        .when((v["de"] >= v["es"]) & (v["de"] >= v["fr"]) & (v["de"] >= v["zh"]), "de")
        .when((v["es"] >= v["fr"]) & (v["es"] >= v["zh"]), "es")
        .when(v["fr"] >= v["zh"], "fr")
        .otherwise("zh")
    )
    return t.documents.select(
        "doc_id", F.col("lang").alias("lang_true"), pred.alias("lang_pred")
    )


@op(
    "text_fingerprint",
    sql="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(COALESCE(text, ''), ' '))), ' '))
             AS fingerprint,
           md5(COALESCE(text, '')) AS exact_hash
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    """Order-insensitive document fingerprint (sorted unique words ->
    md5) + exact content hash; the pair powers exact and bag-of-words
    dedup."""
    t = Tables(spark, sf_dir)
    bag = F.concat_ws(
        " ",
        F.array_sort(
            F.array_distinct(
                F.split(F.coalesce(F.col("text"), F.lit("")), " ")
            )
        ),
    )
    return t.documents.select(
        "doc_id",
        F.md5(bag).alias("fingerprint"),
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("exact_hash"),
    )


@op(
    "text_sentiment",
    sql=f"""
    WITH words AS (
        SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS word,
               len(string_split(COALESCE(text, ''), ' ')) AS n_words
        FROM documents
    ),
    lex AS (
        SELECT * FROM (VALUES
            {", ".join(f"('{w}', 1)" for w in _POS_WORDS)},
            {", ".join(f"('{w}', -1)" for w in _NEG_WORDS)}
        ) AS t(word, weight)
    )
    SELECT w.doc_id,
           CAST(coalesce(SUM(l.weight), 0) AS BIGINT) AS polarity,
           round(CAST(coalesce(SUM(l.weight), 0) AS DOUBLE) / any_value(w.n_words), 6) AS score
    FROM words w LEFT JOIN lex l ON w.word = l.word
    GROUP BY w.doc_id
    """,
)
def text_sentiment(spark, sf_dir):
    """Lexicon-based polarity: explode words, INNER broadcast-join the
    lexicon so only lexicon hits (a tiny fraction of the corpus) flow
    through the shuffle and aggregation, then left-join a (doc_id,
    n_words) spine to restore zero-hit documents (cf. PAPERS.md
    sentiment-on-Spark). vs left-joining and aggregating every word:
    2.2x at sf0.1, and at 100 TB the shuffle shrinks from all words to
    lexicon matches."""
    t = Tables(spark, sf_dir)
    lex = spark.createDataFrame(
        [(w, 1) for w in _POS_WORDS] + [(w, -1) for w in _NEG_WORDS],
        "word string, weight int",
    )
    spine = t.documents.select("doc_id", F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " ")).alias("n_words"))
    hits = t.documents.select("doc_id", F.explode(F.split(F.coalesce(F.col("text"), F.lit("")), " ")).alias("word")).join(
        F.broadcast(lex), "word"
    )
    per_doc = hits.groupBy("doc_id").agg(
        F.sum("weight").cast("long").alias("hit_polarity")
    )
    return spine.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("hit_polarity", F.lit(0)).cast("long").alias("polarity"),
        F.round(
            F.coalesce("hit_polarity", F.lit(0)).cast("double") / F.col("n_words"),
            6,
        ).alias("score"),
    )


@op(
    "text_tfidf",
    sql="""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    tf AS (
        SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY doc_id, word
    ),
    df AS (
        SELECT word, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY word
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.word,
           CAST(tf.tf AS BIGINT) AS tf,
           CAST(df.df AS BIGINT) AS df,
           round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
    FROM tf JOIN df ON tf.word = df.word CROSS JOIN n
    """,
)
def text_tfidf(spark, sf_dir):
    """tf-idf as ONE linear pipeline: explode -> tf aggregation ->
    window count for df — no second aggregation branch, no cache, no
    join.

    df is derived from tf IN-PLAN (tf rows are unique per (doc_id,
    word), so document frequency = count(*) over a word-partitioned
    window on the tf rows). Earlier form cached tf and broadcast-joined
    a separate df aggregate; the single-pass window form removes the
    cache materialization and the join (measured 1.14s -> 0.72s at
    sf0.1). Two shuffles total — (doc_id, word) for tf, word for the
    window — both on compacted post-agg rows, the minimum for this
    computation; word-partition skew at 100 TB is bounded because tf
    rows cap at n_docs per word, and AQE splits hot words."""
    t = Tables(spark, sf_dir)
    from pyspark.sql import Window

    words = t.documents.select("doc_id", F.explode(_tokens()).alias("word"))
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    # corpus size as a broadcast 1-row aggregate, not an eager .count():
    # keeps the whole computation one lazy plan (no extra driver job)
    nd = t.documents.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    return (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("word")))
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "word",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )


@op(
    "text_normalize",
    sql="""
    SELECT doc_id,
           nfc_normalize(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS norm_text,
           md5(nfc_normalize(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))) AS norm_hash
    FROM documents
    """,
)
def text_normalize(spark, sf_dir):
    """Canonical text normalization for dedup/training: collapse
    whitespace, trim, lowercase (all codegen), then Unicode NFC via an
    Arrow-batched pandas UDF (Spark SQL has no NFC builtin; DuckDB's
    ``nfc_normalize`` and Python's ``unicodedata`` implement the same
    Unicode normal form, so the md5 of the result hash-matches). The
    norm_hash column is the content-address every exact-dedup pass
    keys on."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        # NULL text must stay NULL (oracle's nfc_normalize(NULL) is NULL);
        # unicodedata.normalize raises TypeError on None.
        return s.map(lambda x: x if x is None else unicodedata.normalize("NFC", x))

    t = Tables(spark, sf_dir)
    base = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return t.documents.select(
        "doc_id", nfc(base).alias("norm_text")
    ).withColumn("norm_hash", F.md5(F.col("norm_text")))


@op(
    "text_redact",
    sql="""
    SELECT event_id,
           regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS props_redacted,
           CAST(len(regexp_extract_all(props, '[0-9]+')) AS INT) AS n_redactions
    FROM events
    """,
)
def text_redact(spark, sf_dir):
    """PII-shaped redaction pass (scrub numeric literals from the
    payload): pure codegen regexp_replace plus a redaction count for
    audit — the pattern set extends to emails/phones/ids without plan
    changes. Row-local, zero-shuffle."""
    t = Tables(spark, sf_dir)
    return t.events.select(
        "event_id",
        F.regexp_replace("props", "[0-9]+", "<NUM>").alias("props_redacted"),
        F.regexp_count("props", F.lit("[0-9]+")).cast("int").alias("n_redactions"),
    )


# Contiguous doc_id-range shards per language for the distributed
# prefix sum; scales with cluster width at 100 TB.
PACK_SHARDS = 16


@op(
    "pack_sequences",
    sql="""
    WITH sized AS (
        SELECT lang, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT lang, doc_id, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS cum_before
        FROM sized
    )
    SELECT lang,
           CAST(FLOOR(cum_before / 2048) AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM cum
    GROUP BY lang, seq_id
    """,
)
def pack_sequences(spark, sf_dir):
    """Pack documents into ~2048-token training sequences per language:
    running token count over a deterministic order, sequence id =
    floor(cumulative-start / budget) — the streaming-packing semantic
    (a sequence may overrun by at most one document).

    The running sum is a TWO-LEVEL distributed prefix sum, not a
    per-lang window: with a handful of languages a
    ``Window.partitionBy("lang")`` serializes most of a 100 TB corpus
    through a few partitions (the r4 verdict's watch item). Instead:

    1. shard each language into ``PACK_SHARDS`` contiguous doc_id
       ranges (bounds from a tiny per-lang min/max aggregate,
       broadcast back; the shard function is monotone in doc_id so
       shards are order-contiguous);
    2. local prefix sums per (lang, shard) window — parallelism is
       langs x shards, and any contiguous cut yields the same final
       answer, so the shard boundaries need no determinism guarantee;
    3. per-shard totals (aggregate-sized: langs x shards rows) get an
       exclusive running sum over shard rank — the per-shard OFFSET —
       broadcast-joined back and added to the local sums.

    Global cum_before = shard offset + local cumsum - own tokens,
    exactly the single-window value; the oracle is unchanged. At
    100 TB, PACK_SHARDS scales with cluster width while step 3 stays
    aggregate-sized."""
    t = Tables(spark, sf_dir)
    from pyspark.sql import Window

    sized = t.documents.select(
        "lang", "doc_id", F.size(_tokens()).cast("long").alias("n_tokens")
    )
    bounds = sized.groupBy("lang").agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    shard = F.least(
        F.lit(PACK_SHARDS - 1),
        F.floor(
            (F.col("doc_id") - F.col("lo"))
            * PACK_SHARDS
            / (F.col("hi") - F.col("lo") + 1)
        ),
    )
    # null-safe joins throughout: a NULL lang is a real pack group
    # (plain equi-joins silently dropped those docs — NULL-injection
    # sweep)
    sharded = (
        sized.join(
            F.broadcast(bounds.withColumnRenamed("lang", "_bl")),
            F.col("lang").eqNullSafe(F.col("_bl")),
        )
        .withColumn("shard", shard)
        .drop("lo", "hi", "_bl")
    )
    w_local = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = sharded.withColumn("local_cum", F.sum("n_tokens").over(w_local))
    w_off = (
        Window.partitionBy("lang")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        sharded.groupBy("lang", "shard")
        .agg(F.sum("n_tokens").alias("shard_total"))
        .withColumn(
            "offset", F.coalesce(F.sum("shard_total").over(w_off), F.lit(0))
        )
        .select("lang", "shard", "offset")
    )
    cum = local.join(
        F.broadcast(
            offsets.withColumnRenamed("lang", "_ol").withColumnRenamed(
                "shard", "_os"
            )
        ),
        F.col("lang").eqNullSafe(F.col("_ol"))
        & (F.col("shard") == F.col("_os")),
    ).withColumn(
        "cum_before",
        F.col("offset") + F.col("local_cum") - F.col("n_tokens"),
    )
    return (
        cum.select(
            "lang",
            F.floor(F.col("cum_before") / 2048).alias("seq_id"),
            "n_tokens",
        )
        .groupBy("lang", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


@op(
    "pipeline_text_prep",
    sql="""
    WITH norm AS (
        SELECT doc_id,
               nfc_normalize(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                   AS norm_text
        FROM documents
    ),
    hashed AS (
        SELECT doc_id, norm_text, md5(norm_text) AS norm_hash,
               row_number() OVER (PARTITION BY md5(norm_text) ORDER BY doc_id)
                   AS rn
        FROM norm
    )
    SELECT doc_id, norm_hash,
           CAST(len(string_split(norm_text, ' ')) AS BIGINT) AS n_tokens,
           CAST(strlen(norm_text) AS BIGINT) AS n_chars
    FROM hashed
    WHERE rn = 1
      AND strlen(norm_text) >= 64
      AND len(string_split(norm_text, ' ')) >= 8
    """,
)
def pipeline_text_prep(spark, sf_dir):
    """END-TO-END training-data prep: the composition a 100 TB corpus
    pipeline actually runs, as ONE lazy plan —

      normalize (collapse whitespace + lower + Unicode NFC)
        -> content-address (md5 of normalized text)
        -> exact dedup (keep lowest doc_id per hash: one window shuffle
           partitioned by hash — dedup keys distribute uniformly)
        -> quality gate (min normalized length + min token count)
        -> token accounting (whitespace tokens, the budget unit
           pack_sequences consumes downstream)

    Demonstrates that the individual operator keys (text_normalize,
    dedup_content_hash, text_quality, text_token_count) compose into
    one Catalyst plan with a single shuffle: everything before and
    after the hash window is codegen'd row-local work, so the pipeline
    reads the corpus exactly once. The full chain is hash-checked
    against the DuckDB twin."""
    import unicodedata

    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: x if x is None else unicodedata.normalize("NFC", x)
        )

    t = Tables(spark, sf_dir)
    base = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    norm = t.documents.select("doc_id", nfc(base).alias("norm_text"))
    hashed = norm.withColumn("norm_hash", F.md5("norm_text")).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("norm_hash").orderBy("doc_id")
        ),
    )
    return (
        hashed.filter(
            (F.col("rn") == 1)
            & (F.length("norm_text") >= 64)
            & (F.size(F.split("norm_text", " ")) >= 8)
        )
        .select(
            "doc_id",
            "norm_hash",
            F.size(F.split("norm_text", " ")).cast("long").alias("n_tokens"),
            F.length("norm_text").cast("long").alias("n_chars"),
        )
    )


_NGRAM_CTE = """
    pos_words AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS word,
               CAST(generate_subscripts(string_split(text, ' '), 1) AS INT) AS pos
        FROM documents
    ),
    ngrams AS (
        SELECT doc_id,
               word || ' ' || lead(word, 1) OVER w || ' ' || lead(word, 2) OVER w AS ngram
        FROM pos_words
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        QUALIFY lead(word, 2) OVER w IS NOT NULL
    )
"""


def _spark_ngrams(t):
    """Word trigrams per document — same shingling as the dedup family
    (posexplode + lead window), shared by the frequency/contamination
    keys."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    words = t.documents.select(
        "doc_id", F.posexplode(_tokens()).alias("pos", "word")
    )
    return (
        words.select(
            "doc_id",
            "word",
            F.lead("word", 1).over(w).alias("w1"),
            F.lead("word", 2).over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
        .select(
            "doc_id",
            F.concat_ws(" ", "word", "w1", "w2").alias("ngram"),
        )
    )


@op(
    "text_ngram_freq",
    sql="WITH "
    + _NGRAM_CTE
    + """
    SELECT ngram,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM ngrams
    GROUP BY ngram
    ORDER BY n_occurrences DESC, ngram
    LIMIT 100
    """,
)
def text_ngram_freq(spark, sf_dir):
    """Corpus-level n-gram frequency table (top 100 word trigrams by
    occurrence, ties broken lexically): the building block for
    contamination screening, boilerplate detection, and memorization
    audits over a training corpus.

    Scale shape: one ngram-keyed groupBy (partial aggregation map-side;
    Zipfian head handled by AQE skew split) followed by a global top-K,
    which Spark executes as per-partition TakeOrdered + driver merge of
    K rows — never a full sort of the ngram table."""
    t = Tables(spark, sf_dir)
    return (
        _spark_ngrams(t)
        .groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), "ngram")
        .limit(100)
    )


@op(
    "contamination_ngram",
    sql="WITH "
    + _NGRAM_CTE
    + """,
    sh AS (SELECT DISTINCT doc_id, ngram FROM ngrams),
    bench AS (
        SELECT DISTINCT s.ngram
        FROM sh s JOIN documents d ON s.doc_id = d.doc_id
        WHERE d.source = 'src0'
    ),
    target AS (
        SELECT s.doc_id, s.ngram
        FROM sh s JOIN documents d ON s.doc_id = d.doc_id
        WHERE d.source <> 'src0'
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_ngrams FROM target GROUP BY doc_id),
    hits AS (
        SELECT t.doc_id, COUNT(*) AS n_hit
        FROM target t JOIN bench b ON t.ngram = b.ngram
        GROUP BY t.doc_id
    )
    SELECT tot.doc_id,
           CAST(tot.n_ngrams AS BIGINT) AS n_ngrams,
           CAST(COALESCE(hits.n_hit, 0) AS BIGINT) AS n_contaminated,
           CAST(COALESCE(hits.n_hit, 0) AS DOUBLE) / tot.n_ngrams AS contamination
    FROM tot LEFT JOIN hits ON tot.doc_id = hits.doc_id
    """,
)
def contamination_ngram(spark, sf_dir):
    """Benchmark-contamination screen (the n-gram-overlap method used
    for public-eval decontamination of LLM training sets, e.g. the
    13-gram screens described in the GPT-3 and PaLM papers — trigrams
    here because fixture docs are short): treating source='src0' as the
    held-out benchmark, score every other document by the fraction of
    its distinct trigrams that appear anywhere in the benchmark.

    Scale shape: the benchmark's DISTINCT n-gram set is the classic
    small side (real eval suites are MBs against a 100 TB corpus) —
    the plan is a shingle equi-join against it (AQE broadcasts it when
    small; no hint, so a huge 'benchmark' degrades to a shuffle join
    instead of an OOM), then one doc-keyed count. The ratio is an
    exact IEEE division of two BIGINTs on both engines — bit-stable,
    no rounding needed."""
    t = Tables(spark, sf_dir)
    sh = _spark_ngrams(t).distinct()
    src = t.documents.select("doc_id", "source")
    # NEGATIVE RESULT (r12, measured, do not re-try): persisting sh_src
    # (it feeds bench AND target, so the tokenize/explode/distinct
    # shingle chain runs 3x — census: 7 exchanges, 4 SMJs) read WORSE
    # in 3/3 interleaved sf0.1 noop A/Bs: 1.34→1.62, 1.49→1.68,
    # 1.40→1.73 s. The shingle frame is data-sized (|docs|·|ngrams|
    # rows), so materializing it costs more than re-running the
    # pipelined chain; the branches run concurrently unpinned.
    sh_src = sh.join(src, "doc_id")
    bench = (
        sh_src.filter(F.col("source") == "src0").select("ngram").distinct()
    )
    target = sh_src.filter(F.col("source") != "src0").select("doc_id", "ngram")
    tot = target.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_ngrams"))
    hits = (
        target.join(bench, "ngram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        tot.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_ngrams").cast("long").alias("n_ngrams"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_contaminated"),
            (
                F.coalesce("n_hit", F.lit(0)).cast("double") / F.col("n_ngrams")
            ).alias("contamination"),
        )
    )


@op(
    "text_unigram_logprob",
    sql="""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    freq AS (SELECT word, COUNT(*) AS c FROM words GROUP BY word),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM freq)
    SELECT w.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(-ln(CAST(f.c AS DOUBLE) / t.n)), 6) AS avg_neg_logprob
    FROM words w
    JOIN freq f ON w.word = f.word
    CROSS JOIN tot t
    GROUP BY w.doc_id
    """,
)
def text_unigram_logprob(spark, sf_dir):
    """Unigram LM quality score — mean negative log-probability of a
    document under the corpus's own unigram distribution, the classic
    cheap stand-in for perplexity-based quality filtering in
    training-data pipelines (low = repetitive/boilerplate, high =
    rare-token noise; both tails get dropped).

    Scale shape: vocabulary table from one word-keyed count (map-side
    partial agg owns the Zipf head), then words join the vocab — a
    classic small-side join AQE broadcasts — and one doc-keyed mean.
    The corpus total attaches as a 1-row scalar crossJoin. Float
    discipline: each doc averages ~1e2 doubles, so cross-engine
    summation-order noise is ~1e-13 while the ROUND(.,6) grain is
    5e-7 — bit-stable in the hash compare."""
    t = Tables(spark, sf_dir)
    words = t.documents.select(
        "doc_id", F.explode(_tokens()).alias("word")
    )
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.agg(F.sum("c").cast("double").alias("n"))
    return (
        words.join(freq, "word")
        .crossJoin(tot)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(-F.log(F.col("c").cast("double") / F.col("n"))), 6
            ).alias("avg_neg_logprob"),
        )
    )


_MG_K = 199  # counters per partition: guarantees words > N/200 (0.5%) survive


@op(
    "text_heavy_hitters",
    sql="""
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    tot AS (SELECT COUNT(*) AS total FROM words)
    SELECT word,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           FLOOR(COUNT(*) / CAST(total AS DOUBLE) * 1e6 + 0.5)
               / 1e6 AS freq
    FROM words, tot
    GROUP BY word, total
    HAVING COUNT(*) * 100 >= total
    """,
)
def text_heavy_hitters(spark, sf_dir):
    """EXACT corpus heavy hitters (words with frequency >= 1%) via the
    two-phase pattern that makes frequent-items tractable at 100 TB:
    per-partition Misra-Gries summaries generate a guaranteed-superset
    candidate set, then one broadcast-filtered scan recounts ONLY the
    candidates exactly.

    Guarantee (mergeable-summaries bound, Agarwal et al., TODS 2013;
    Misra & Gries 1982): with k=199 counters, any word whose
    partition-local count exceeds n_p/200 keeps a counter, so any word
    with global count > N/200 = 0.5% survives in at least one
    partition — a strict superset of the 1% report threshold. The
    recount + integer-arithmetic HAVING (n*100 >= N) then makes the
    output exact and independent of partitioning/batch order, even
    though the intermediate candidate set is not deterministic.

    Scale shape: phase 1 ships k words per partition (bounded,
    broadcastable); phase 2's join filters map-side before the
    groupBy, so only candidate tokens shuffle — the full distinct
    vocabulary (the thing that explodes on web text: typos, ids,
    numbers) never shuffles anywhere."""
    t = Tables(spark, sf_dir)
    words = t.documents.select(F.explode(_tokens()).alias("word"))

    def mg_candidates(batches):
        s = pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf["word"].value_counts()
            s = s.add(vc, fill_value=0).astype("int64") if len(s) else vc
            if len(s) > _MG_K:
                cut = s.sort_values(ascending=False).iloc[_MG_K]
                s = s[s > cut] - cut
        yield pd.DataFrame({"word": s.index.astype(str)})

    cands = words.mapInPandas(mg_candidates, "word string").distinct()
    total = words.agg(F.count(F.lit(1)).alias("total"))
    return (
        words.join(F.broadcast(cands), "word")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(total)
        .filter(F.col("n_occurrences") * 100 >= F.col("total"))
        .select(
            "word",
            "n_occurrences",
            qnt(
                F.col("n_occurrences") / F.col("total").cast("double"),
                "freq",
            ),
        )
    )


@op(
    "text_repetition_score",
    sql="WITH "
    + _NGRAM_CTE
    + """
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_ngrams,
           CAST(COUNT(DISTINCT ngram) AS BIGINT) AS n_distinct,
           FLOOR((1.0 - COUNT(DISTINCT ngram) / CAST(COUNT(*) AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS rep_score
    FROM ngrams GROUP BY doc_id
    """,
)
def text_repetition_score(spark, sf_dir):
    """Within-document repetition score: the fraction of a document's
    word trigrams that are duplicates of another trigram in the SAME
    document (1 - distinct/total) — the Gopher/MassiveText repetition
    family of quality filters (Rae et al. 2021 drop docs whose
    duplicate n-gram fraction exceeds a threshold; boilerplate and
    template spam score high, natural prose scores near 0).

    Shares the corpus shingling (posexplode + lead window) with the
    frequency/contamination keys, then reduces per doc_id — one
    doc-keyed aggregate, no join, no corpus-wide state, so the score
    is embarrassingly parallel at any scale."""
    t = Tables(spark, sf_dir)
    return _spark_ngrams(t).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.countDistinct("ngram").alias("n_distinct"),
        qnt(
            1.0 - F.countDistinct("ngram") / F.count(F.lit(1)).cast("double"),
            "rep_score",
        ),
    )


_VOCAB_SIZES = (5, 10, 20, 30)
# Contiguous range shards for the distributed vocabulary prefix sum;
# scales with cluster width at 100 TB (the per-shard totals table stays
# shard-count-sized either way).
_CUM_SHARDS = 16


@op(
    "vocab_coverage",
    sql=f"""
    WITH freq AS (
        SELECT word, COUNT(*) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS word
              FROM documents)
        GROUP BY word
    ),
    ranked AS (
        SELECT c, row_number() OVER (ORDER BY c DESC, word) AS rk
        FROM freq
    ),
    cum AS (
        SELECT rk,
               SUM(c) OVER (ORDER BY rk
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_c
        FROM ranked
    ),
    tot AS (SELECT SUM(c) AS total FROM freq)
    SELECT CAST(v.v AS INT) AS vocab_size,
           CAST(MAX(cum.cum_c) AS BIGINT) AS n_covered,
           FLOOR(MAX(cum.cum_c) / CAST(tot.total AS DOUBLE)
                 * 1e6 + 0.5) / 1e6 AS coverage
    FROM (VALUES {", ".join(f"({v})" for v in _VOCAB_SIZES)}) v(v)
    JOIN cum ON cum.rk <= v.v
    CROSS JOIN tot
    GROUP BY v.v, tot.total
    """,
)
def vocab_coverage(spark, sf_dir):
    """Vocabulary coverage curve — the tokenizer-design question "what
    fraction of corpus tokens does a top-V vocabulary cover?": word
    frequencies ranked (ties broken lexically), cumulative token mass
    at each candidate V, reported as (vocab_size, tokens covered,
    coverage fraction).

    One word-keyed count (partial agg owns the Zipf head); the
    rank+cumsum over the vocabulary is a RANGE-SHARDED TWO-PASS
    prefix sum, not a single-partition global window (the r4 verdict's
    watch item — raw web-scale word vocabularies need not fit one
    executor):

    1. shard ids come from quantile boundaries of the count column
       (one tiny broadcast aggregate): pid = #boundaries above a
       word's count, a PURE row-local function — monotone in the
       global (c DESC, ...) order and identical on every
       recomputation of every plan branch (unlike
       ``repartitionByRange`` + ``spark_partition_id``, whose sampled
       boundaries are only stable if Spark happens to reuse the
       exchange across the window and totals branches). Equal counts
       always share a shard, so the within-shard (c DESC, word) order
       concatenated across ascending pids IS the global order;
    2. local row_number + running sum per pid — parallelism is shard
       count, each window sees ~1/shards of the vocabulary (Zipf ties
       can skew a shard; the degenerate worst case is the old single
       partition);
    3. per-shard row/mass totals (shard-count rows) turn into
       exclusive rank/mass offsets via a triangular self-join on the
       tiny totals table (no unpartitioned window anywhere), and the
       broadcast offsets reconstruct the exact global rank and
       cumulative mass."""
    t = Tables(spark, sf_dir)
    from pyspark.sql import Window

    freq = (
        t.documents.select(F.explode(_tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    qsplits = [i / _CUM_SHARDS for i in range(1, _CUM_SHARDS)]
    bounds = freq.agg(
        F.percentile_approx("c", qsplits, 10_000).alias("bs")
    )
    part = freq.crossJoin(F.broadcast(bounds)).withColumn(
        "pid",
        F.aggregate(
            "bs",
            F.lit(0),
            lambda acc, b: acc + F.when(b > F.col("c"), 1).otherwise(0),
        ),
    ).drop("bs")
    w_local = Window.partitionBy("pid").orderBy(F.col("c").desc(), "word")
    local = part.select(
        "pid",
        "c",
        F.row_number().over(w_local).alias("lrk"),
        F.sum("c")
        .over(w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("lcum"),
    )
    tots = part.groupBy("pid").agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("s")
    )
    offs = (
        tots.alias("a")
        .join(tots.alias("b"), F.col("b.pid") < F.col("a.pid"), "left")
        .groupBy(F.col("a.pid").alias("pid"))
        .agg(
            F.coalesce(F.sum("b.n"), F.lit(0)).alias("rk_off"),
            F.coalesce(F.sum("b.s"), F.lit(0)).alias("cum_off"),
        )
    )
    cum = local.join(F.broadcast(offs), "pid").select(
        (F.col("rk_off") + F.col("lrk")).alias("rk"),
        (F.col("cum_off") + F.col("lcum")).alias("cum_c"),
    )
    tot = freq.agg(F.sum("c").alias("total"))
    sizes = spark.range(1).select(
        F.explode(F.array(*[F.lit(v) for v in _VOCAB_SIZES])).alias("v")
    )
    return (
        sizes.join(cum, cum.rk <= sizes.v)
        .groupBy("v")
        .agg(F.max("cum_c").alias("mx"))
        .crossJoin(tot)
        .select(
            F.col("v").cast("int").alias("vocab_size"),
            F.col("mx").cast("long").alias("n_covered"),
            qnt(F.col("mx") / F.col("total").cast("double"), "coverage"),
        )
    )


@op(
    "vocab_typo_pairs",
    sql="""
    WITH v AS (
        SELECT DISTINCT unnest(string_split(p_name, ' ')) AS w
        FROM part
    ),
    vv AS (SELECT w FROM v WHERE length(w) > 0)
    SELECT a.w AS w1, b.w AS w2,
           CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
    FROM vv a JOIN vv b
      ON a.w < b.w AND levenshtein(a.w, b.w) <= 1
    """,
)
def vocab_typo_pairs(spark, sf_dir):
    """Edit-distance-1 vocabulary pairing via SymSpell-style
    deletion-neighborhood blocking (Garbe's symmetric-delete idea, cf.
    Norvig's spell-correct formulation): a pair of words is within
    Levenshtein 1 iff they share a key in {w} ∪ deletes1(w) —
    substitution meets at the both-sides-deleted string, insertion/
    deletion at the shorter word itself. Candidates come from one
    equi-join on those keys; an exact levenshtein() then discards the
    distance-2 collisions (both engines implement the same integer DP,
    so the filter agrees bit-wise). This is the typo-canonicalization
    gate an LLM-corpus vocabulary pipeline runs before frequency
    thresholding merges counts of misspelling variants.

    The 100 TB contrast is the whole point of the shape: brute force
    is O(|V|²) levenshtein calls (the DuckDB oracle does exactly that,
    fine at fixture vocab size); the blocked form generates ≤ len(w)+1
    keys per word and meets only within key buckets — the same
    inverted-index discipline as dedup_ngram_jaccard, linear in vocab
    + collisions. Keys are generated by a codegen higher-order
    transform (no UDF), and the candidate join is an equi-join AQE can
    broadcast when one side is small."""
    t = Tables(spark, sf_dir)
    vocab = (
        t.part.select(F.explode(F.split("p_name", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .distinct()
    )
    keyed = vocab.select(
        "w",
        F.explode(
            F.array_union(
                F.array(F.col("w")),
                F.expr(
                    "transform(sequence(1, length(w)), i ->"
                    " concat(substring(w, 1, i - 1),"
                    " substring(w, i + 1, length(w))))"
                ),
            )
        ).alias("k"),
    )
    other = keyed.select(F.col("w").alias("w2"), F.col("k").alias("k2"))
    return (
        keyed.join(other, (F.col("k") == F.col("k2")) & (F.col("w") < F.col("w2")))
        .select(F.col("w").alias("w1"), "w2")
        .distinct()
        .filter(F.levenshtein("w1", "w2") <= 1)
        .select("w1", "w2", F.levenshtein("w1", "w2").cast("long").alias("dist"))
    )


@op(
    "text_entropy",
    sql="""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    c AS (
        SELECT doc_id, word, COUNT(*) AS c
        FROM words GROUP BY doc_id, word
    ),
    t AS (SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS n FROM c GROUP BY doc_id)
    SELECT c.doc_id,
           CAST(t.n AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           ROUND(SUM(c.c * -ln(c.c / t.n)) / t.n, 6) AS entropy_nats,
           ROUND(COUNT(*) / t.n, 6) AS type_token_ratio
    FROM c JOIN t ON c.doc_id = t.doc_id
    GROUP BY c.doc_id, t.n
    """,
)
def text_entropy(spark, sf_dir):
    """Per-document unigram entropy H = -Σ (c/n)·ln(c/n) plus the
    type/token ratio — the lexical-diversity quality signals training
    pipelines threshold alongside `text_repetition_score` (low entropy
    = boilerplate/keyword stuffing; TTR near 1 on long docs = random
    noise). Complements `text_unigram_logprob`: that scores docs under
    the CORPUS distribution, this under each doc's OWN distribution —
    no corpus-wide table, so it stays a two-level doc-keyed aggregate
    with zero cross-doc state, embarrassingly parallel at any scale.

    Determinism follows the unigram_logprob precedent: each doc sums
    ~10² ln() terms of unit magnitude, cross-engine summation-order
    noise ~1e-13 vs the ROUND(.,6) grain 5e-7 — bit-stable in the
    hash compare."""
    t = Tables(spark, sf_dir)
    words = t.documents.select("doc_id", F.explode(_tokens()).alias("word"))
    c = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
    tot = c.groupBy("doc_id").agg(F.sum("c").cast("double").alias("n"))
    return (
        c.join(tot, "doc_id")
        .groupBy("doc_id", "n")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(
                F.col("c") * -F.log(F.col("c") / F.col("n"))
            ).alias("hsum"),
        )
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            F.round(F.col("hsum") / F.col("n"), 6).alias("entropy_nats"),
            F.round(F.col("n_distinct") / F.col("n"), 6).alias(
                "type_token_ratio"
            ),
        )
    )


@op(
    "corpus_mixture",
    sql="""
    WITH per_lang AS (
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS total FROM per_lang),
    shares AS (
        SELECT p.lang, p.n_docs, p.n_tokens,
               p.n_tokens / t.total AS share,
               sqrt(p.n_tokens / t.total) AS w
        FROM per_lang p CROSS JOIN tot t
    ),
    z AS (SELECT CAST(SUM(w) AS DOUBLE) AS z FROM shares)
    SELECT s.lang, s.n_docs, s.n_tokens,
           FLOOR(s.share * 1e6 + 0.5) / 1e6 AS token_share,
           FLOOR(s.w / z.z * 1e6 + 0.5) / 1e6 AS sample_weight
    FROM shares s CROSS JOIN z
    """,
)
def corpus_mixture(spark, sf_dir):
    """The data-mixture table every multilingual training pipeline
    publishes: per language, document and exact token counts, the raw
    token share, and the temperature-adjusted sampling weight
    w_l = share^(1/T) / Σ share^(1/T) with T=2 (the mT5/XLM-R
    upsampling rule that keeps low-resource languages from washing
    out). T=2 makes the power a sqrt — IEEE-correctly-rounded on both
    engines, unlike pow() (the repo's sqrt-not-pow determinism rule);
    the 5-term normalizer sum is orders below the 1e-6 quantization
    grain.

    Scale shape: one map-side-combinable per-lang aggregate (token
    counts from size(split()) — no explode), then two 1-row scalar
    attaches. The output is |langs| rows; at 100 TB this is the
    canonical tiny-result full-scan report."""
    t = Tables(spark, sf_dir)
    per_lang = t.documents.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_tokens())).cast("long").alias("n_tokens"),
    )
    tot = per_lang.agg(F.sum("n_tokens").cast("double").alias("total"))
    shares = per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens") / F.col("total")).alias("share"),
        F.sqrt(F.col("n_tokens") / F.col("total")).alias("w"),
    )
    z = shares.agg(F.sum("w").cast("double").alias("z"))
    return shares.crossJoin(F.broadcast(z)).select(
        "lang",
        "n_docs",
        "n_tokens",
        qnt(F.col("share"), "token_share"),
        qnt(F.col("w") / F.col("z"), "sample_weight"),
    )


@op(
    "vocab_bpe_merge",
    sql="""
    WITH wf AS (
        SELECT word, COUNT(*) AS c FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ) GROUP BY word
    ),
    pairs AS (
        SELECT substr(word, CAST(i AS INT), 2) AS pair, c
        FROM wf, LATERAL (
            SELECT unnest(range(1, CAST(strlen(word) AS BIGINT))) AS i
        ) t
        WHERE strlen(word) >= 2
    )
    SELECT pair, CAST(SUM(c) AS BIGINT) AS n_occurrences
    FROM pairs GROUP BY pair
    ORDER BY n_occurrences DESC, pair
    LIMIT 20
    """,
)
def vocab_bpe_merge(spark, sf_dir):
    """One BPE training step — the corpus-weighted adjacent-symbol-
    pair count whose argmax IS the next merge rule (Sennrich et al.,
    ACL 2016): every word's character bigrams, weighted by the word's
    corpus frequency, ranked; the top row is the merge a BPE trainer
    would apply, the top-20 the candidate frontier.

    Scale shape — the trick is counting pairs over the DISTINCT-word
    frequency table, not the raw token stream: the Zipf head collapses
    in the first map-side-combinable word count, so the pair explode
    runs over |vocab| rows (weighted by c), not |corpus| tokens —
    at 100 TB that's the difference between exploding ~10⁶ vocab
    entries and ~10¹³ tokens. Pair generation is pure codegen
    (sequence + substring, no UDF); the final exact top-20 plans as
    TakeOrderedAndProject over ≤|alphabet|² aggregated rows. Iterated
    BPE training (re-tokenize, recount) is this same key run per
    merge round."""
    t = Tables(spark, sf_dir)
    wf = (
        t.documents.select(F.explode(_tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # substring over a varying start goes through expr(): the DSL's
    # substring() takes Python-int start/len, not a lambda variable
    pairs = (
        wf.filter(F.length("word") >= 2)
        .select(
            "c",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word) - 1),"
                    " i -> substring(word, i, 2))"
                )
            ).alias("pair"),
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").cast("long").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "pair")
        .limit(20)
    )


@op(
    "text_top_terms",
    sql="""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    tf AS (
        SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY doc_id, word
    ),
    df AS (
        SELECT word, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY word
    ),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.word,
               round(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf
        FROM tf JOIN df ON tf.word = df.word CROSS JOIN n
    )
    SELECT doc_id, CAST(rn AS BIGINT) AS rank, word, tfidf
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, word
        ) AS rn FROM scored
    ) WHERE rn <= 3
    """,
)
def text_top_terms(spark, sf_dir):
    """Keyword extraction: the top-3 tf-idf terms of every document —
    the per-doc topical summary search/tagging pipelines store (the
    doc-keyed top-k composition of `text_tfidf` + `topn_per_group`).

    Same single-pass plan as text_tfidf (tf agg, df as a word-window
    over the compacted tf rows, 1-row corpus-size attach) plus one
    doc-partitioned rank window — every stage keyed by doc or word,
    fully parallel; ties (equal tf-idf) break on the word, so the
    extracted keywords are bit-stable across engines and runs."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    words = t.documents.select("doc_id", F.explode(_tokens()).alias("word"))
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    nd = t.documents.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("word"))
        )
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "word",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    wr = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("word")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", "word", "tfidf")
    )


@op(
    "contamination_matrix",
    sql="""
    WITH fp AS (
        SELECT DISTINCT
               array_to_string(string_split(text, ' ')[1:8], ' ') AS fp,
               source
        FROM documents
    )
    SELECT a.source AS src_a, b.source AS src_b,
           COUNT(*) AS n_shared_fp
    FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def contamination_matrix(spark, sf_dir):
    """Cross-SOURCE content-overlap matrix: for every pair of sources,
    how many distinct 8-word document prefixes they share — the
    provenance screen that tells a corpus curator which feeds mirror
    each other (and which eval source leaked into a train source;
    `contamination_ngram` answers the train/test question, this one
    the source×source question). The prefix fingerprint is the cheap
    canonical key; swap in minhash signatures (`dedup_minhash`) for
    the fuzzy version of the same matrix shape.

    Distinct (fingerprint, source) first — output of that dedup is at
    most |corpus| rows and usually far smaller — then a fingerprint-
    keyed self-equi-join with the a<b canonicalization and a pair
    groupBy. Equi-join on the fingerprint, never all-pairs of
    documents; hot boilerplate prefixes are exactly the AQE-skew-split
    case."""
    t = Tables(spark, sf_dir)
    # NULL text has NO fingerprint (r9 sweep D): concat_ws renders a
    # NULL split as '', which would manufacture one shared fingerprint
    # across every source holding a NULL-text doc — the oracle's NULL
    # fp simply drops out of the equi-join; filter to match
    fp = (
        t.documents.filter(F.col("text").isNotNull())
        .select(
            F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 8)).alias(
                "fp"
            ),
            "source",
        )
        .distinct()
    )
    a = fp.select(F.col("fp"), F.col("source").alias("src_a"))
    b = fp.select(F.col("fp").alias("fpb"), F.col("source").alias("src_b"))
    return (
        a.join(
            b,
            (F.col("fp") == F.col("fpb"))
            & (F.col("src_a") < F.col("src_b")),
        )
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared_fp"))
    )


# Gopher-rule thresholds (Rae et al. 2021, "Scaling Language Models:
# ... Gopher", table A1 — the MassiveText quality heuristics). All
# ratio rules are evaluated as exact integer cross-multiplications so
# neither engine ever compares floats: `top1/n_words <= 0.2` becomes
# `5*top1 <= n_words`.
_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS = 50, 100_000


@op(
    "quality_gopher_rules",
    sql=f"""
    WITH base AS (
        SELECT doc_id,
               string_split(text, ' ') AS parts,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               -- length (CHARS), not strlen (BYTES): Spark's
               -- F.length counts characters, and the Gopher
               -- mean-word-length rule is a character rule — the two
               -- diverge on any multibyte word (r9 sweep C)
               CAST(list_sum(list_transform(string_split(text, ' '),
                    x -> length(x))) AS BIGINT) AS chars_in_words,
               CAST(len(list_filter(string_split(text, ' '),
                    x -> x IN {_STOPWORDS})) AS BIGINT) AS n_stop,
               CAST(len(list_filter(string_split(text, ' '),
                    x -> length(x) <= 2)) AS BIGINT) AS n_short
        FROM documents
    ),
    w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    top1 AS (
        SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top1 FROM (
            SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY 1, 2
        ) GROUP BY doc_id
    ),
    bg AS (
        SELECT b.doc_id, b.parts[i] || ' ' || b.parts[i + 1] AS bigram
        FROM base b, LATERAL (
            SELECT unnest(range(1, CAST(len(b.parts) AS BIGINT))) AS i
        )
    ),
    top2 AS (
        SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top2 FROM (
            SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2
        ) GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_words, b.chars_in_words, b.n_stop, b.n_short,
           t1.top1, t2.top2,
           b.n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}
               AS r_word_count,
           3 * b.n_words <= b.chars_in_words
               AND b.chars_in_words <= 10 * b.n_words AS r_mean_word_len,
           b.n_stop >= 2 AS r_stopwords,
           20 * b.n_short <= 3 * b.n_words AS r_short_words,
           5 * t1.top1 <= b.n_words AS r_top_unigram,
           50 * t2.top2 <= 9 * (b.n_words - 1) AS r_top_bigram,
           (b.n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS})
               AND 3 * b.n_words <= b.chars_in_words
               AND b.chars_in_words <= 10 * b.n_words
               AND b.n_stop >= 2
               AND 20 * b.n_short <= 3 * b.n_words
               AND 5 * t1.top1 <= b.n_words
               AND 50 * t2.top2 <= 9 * (b.n_words - 1) AS gopher_pass
    FROM base b
    JOIN top1 t1 USING (doc_id)
    JOIN top2 t2 USING (doc_id)
    """,
)
def quality_gopher_rules(spark, sf_dir):
    """Gopher/MassiveText-style quality gate (Rae et al. 2021, A1):
    per-document rule booleans + the conjunction. The rules that
    survive a single-line fixture (no newlines in the corpus, so the
    bullet/ellipsis LINE rules are honestly out of scope here; the
    word-shape rules are the load-bearing ones):

    - word count in [50, 100 000];
    - mean word length in [3, 10] chars;
    - >= 2 stopword occurrences (fixture stopword list);
    - short words (<= 2 chars) at most 15 % of tokens;
    - most frequent unigram at most 20 % of tokens;
    - most frequent bigram at most 18 % of bigrams.

    Every ratio threshold is an exact integer cross-multiplication
    (5*top1 <= n_words, never top1/n_words <= 0.2) so the booleans are
    bit-identical across engines with zero float math. `text_quality`
    reports the descriptive ratios; this key is the published
    accept/reject recipe over them.

    Scale: the per-doc metrics are higher-order functions over one
    documents scan (codegen, no explode); top-unigram/top-bigram each
    explode once and aggregate on (doc_id, gram) — doc-keyed, uniform,
    map-side combinable; both reduce to |docs| rows before the 3-way
    doc_id join. No corpus-global state at all, so the operator is
    embarrassingly parallel at 100 TB."""
    t = Tables(spark, sf_dir)
    # pre-project the split once (the text_collocations_pmi lesson:
    # the split() subtree repeated per higher-order call is not CSE'd)
    tk = t.documents.select("doc_id", _tokens().alias("parts"))
    p = F.col("parts")
    base = tk.select(
        "doc_id",
        "parts",
        F.size(p).cast("long").alias("n_words"),
        F.aggregate(
            F.transform(p, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("chars_in_words"),
        F.size(F.filter(p, lambda x: x.isin(*_STOPWORDS)))
        .cast("long")
        .alias("n_stop"),
        F.size(F.filter(p, lambda x: F.length(x) <= 2))
        .cast("long")
        .alias("n_short"),
    )
    words = tk.select(
        "doc_id", F.explode(p).alias("word")
    )
    top1 = (
        words.groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("long").alias("top1"))
    )
    # size >= 2 guard: Spark's sequence(1, 0) would DESCEND for a
    # 1-word doc (DuckDB's range(1, 1) is empty) — filter first so both
    # engines drop bigram-less docs identically at the final join.
    bigrams = tk.filter(F.size(p) >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.arrays_zip(
                    F.slice(p, 1, F.size(p) - 1),
                    F.slice(p, 2, F.size(p) - 1),
                ),
                lambda z: F.concat_ws(" ", z["0"], z["1"]),
            )
        ).alias("bigram"),
    )
    top2 = (
        bigrams.groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("long").alias("top2"))
    )
    j = base.join(top1, "doc_id").join(top2, "doc_id")
    r_wc = F.col("n_words").between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS)
    r_len = (3 * F.col("n_words") <= F.col("chars_in_words")) & (
        F.col("chars_in_words") <= 10 * F.col("n_words")
    )
    r_stop = F.col("n_stop") >= 2
    r_short = 20 * F.col("n_short") <= 3 * F.col("n_words")
    r_t1 = 5 * F.col("top1") <= F.col("n_words")
    r_t2 = 50 * F.col("top2") <= 9 * (F.col("n_words") - 1)
    return j.select(
        "doc_id",
        "n_words",
        "chars_in_words",
        "n_stop",
        "n_short",
        "top1",
        "top2",
        r_wc.alias("r_word_count"),
        r_len.alias("r_mean_word_len"),
        r_stop.alias("r_stopwords"),
        r_short.alias("r_short_words"),
        r_t1.alias("r_top_unigram"),
        r_t2.alias("r_top_bigram"),
        (r_wc & r_len & r_stop & r_short & r_t1 & r_t2).alias("gopher_pass"),
    )


@op(
    "text_bigram_logprob",
    sql="""
    WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS parts FROM documents
    ),
    bg AS (
        SELECT b.doc_id, b.parts[i] AS w1, b.parts[i + 1] AS w2
        FROM base b, LATERAL (
            SELECT unnest(range(1, CAST(len(b.parts) AS BIGINT))) AS i
        )
    ),
    uni AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS c1 FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ) GROUP BY word
    ),
    bi AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY 1, 2
    ),
    vocab AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni)
    SELECT bg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(-ln((CAST(bi.c2 AS DOUBLE) + 1.0)
                         / (CAST(uni.c1 AS DOUBLE) + vocab.v))), 6)
               AS avg_neg_logprob
    FROM bg
    JOIN uni ON bg.w1 = uni.word
    JOIN bi ON bg.w1 = bi.w1 AND bg.w2 = bi.w2
    CROSS JOIN vocab
    GROUP BY bg.doc_id
    """,
)
def text_bigram_logprob(spark, sf_dir):
    """Add-one-smoothed bigram language-model score per document:
    avg over the doc's bigrams of -ln((c(w1,w2)+1) / (c(w1)+V)),
    where counts come from the corpus itself — the second-order
    fluency/perplexity proxy next to `text_unigram_logprob` (which
    cannot see word ORDER; a shuffled doc scores identically there but
    is heavily penalized here). High scores flag word-salad docs for
    the training-data quality gate.

    Determinism: counts and V are exact BIGINTs; each term is one
    fixed double formula evaluated identically on both engines, and
    the per-doc mean is ROUND(..., 6) — the text_unigram_logprob
    discipline (ln is sub-ulp stable across both engines' libm at
    this digit budget, driver-green since r5).

    Scale: the bigram/unigram count tables are bounded by vocab and
    vocab^2, not corpus size, so both join sides broadcast; the only
    big-data shuffle is the per-doc aggregate (doc-keyed, uniform).
    With a 100 k-type vocab the bigram table outgrows broadcast:
    switch that join to a shuffle equi-join on (w1, w2) and let AQE
    skew-split the Zipf head — the plan shape is otherwise unchanged."""
    t = Tables(spark, sf_dir)
    # pre-project the split once (the text_collocations_pmi lesson:
    # the optimizer does not CSE the split() subtree through
    # generators — 10x on the ×100 corpus)
    tk = t.documents.select("doc_id", _tokens().alias("tk"))
    sz = F.size(F.col("tk"))
    pair = F.arrays_zip(
        F.slice(F.col("tk"), 1, sz - 1), F.slice(F.col("tk"), 2, sz - 1)
    )
    bg = (
        tk.filter(sz >= 2)
        .select("doc_id", F.explode(pair).alias("p"))
        .select(
            "doc_id",
            F.col("p")["0"].alias("w1"),
            F.col("p")["1"].alias("w2"),
        )
    )
    words = tk.select(F.explode(F.col("tk")).alias("word"))
    uni = words.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    bi = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c2"))
    vocab = uni.agg(F.count(F.lit(1)).cast("long").alias("v"))
    term = -F.log(
        (F.col("c2").cast("double") + F.lit(1.0))
        / (F.col("c1").cast("double") + F.col("v"))
    )
    return (
        bg.join(F.broadcast(uni), bg["w1"] == uni["word"])
        .join(F.broadcast(bi), ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg(term), 6).alias("avg_neg_logprob"),
        )
    )


@op(
    "text_collocations_pmi",
    sql="""
    WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS parts FROM documents
    ),
    bg AS (
        SELECT b.parts[i] AS w1, b.parts[i + 1] AS w2
        FROM base b, LATERAL (
            SELECT unnest(range(1, CAST(len(b.parts) AS BIGINT))) AS i
        )
    ),
    uni AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS c1 FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ) GROUP BY word
    ),
    bi AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
        FROM bg GROUP BY 1, 2 HAVING COUNT(*) >= 5
    ),
    tot AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS nu,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM bg) AS nb
        FROM uni
    )
    SELECT w1, w2, c2 AS n_pair,
           FLOOR((ln(CAST(c2 AS DOUBLE)) + 2 * ln(CAST(nu AS DOUBLE))
                  - ln(CAST(nb AS DOUBLE)) - ln(CAST(a.c1 AS DOUBLE))
                  - ln(CAST(b.c1 AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS pmi
    FROM bi
    JOIN uni a ON bi.w1 = a.word
    JOIN uni b ON bi.w2 = b.word
    CROSS JOIN tot
    ORDER BY pmi DESC, w1, w2
    LIMIT 20
    """,
)
def text_collocations_pmi(spark, sf_dir):
    """Collocation extraction: the top-20 adjacent word pairs by
    pointwise mutual information, PMI = ln(p(w1,w2) / (p(w1)p(w2))),
    with a min-count-5 support floor (the Church & Hanks 1990 word-
    association measure) — surfaces the corpus's fixed phrases, which
    feed tokenizer merge candidates (beside `vocab_bpe_merge`'s
    frequency argmax — PMI prefers STICKY pairs over merely frequent
    ones) and boilerplate detection.

    Determinism: all counts exact BIGINT; PMI evaluates as a SUM OF
    LOGS (ln c2 + 2 ln Nu − ln Nb − ln c1a − ln c1b) rather than the
    ln-of-ratio — overflow-proof at any corpus size (the BIGINT
    product c2·Nu² would wrap at ~10⁹ tokens) and one fixed double
    expression on both engines, quantized at 6; ties broken (w1, w2).

    Scale: unigram and surviving-bigram tables are vocab-bounded, so
    the two count joins broadcast; the only corpus-sized work is the
    bigram explode feeding one map-combinable count. Top-20 is a
    TakeOrdered, never a full sort."""
    t = Tables(spark, sf_dir)
    # pre-project the split ONCE: inlining _tokens() repeats the
    # split() subtree inside every element_at/transform call and the
    # optimizer does not always CSE it through generators — measured
    # 10x on the ×100 corpus (15.2 s -> 1.5 s for the bigram count)
    tk = t.documents.select(_tokens().alias("tk"))
    sz = F.size(F.col("tk"))
    pair = F.arrays_zip(
        F.slice(F.col("tk"), 1, sz - 1), F.slice(F.col("tk"), 2, sz - 1)
    )
    bg = (
        tk.filter(sz >= 2)
        .select(F.explode(pair).alias("p"))
        .select(F.col("p")["0"].alias("w1"), F.col("p")["1"].alias("w2"))
    )
    uni = tk.select(F.explode(F.col("tk")).alias("word")).groupBy(
        "word"
    ).agg(F.count(F.lit(1)).cast("long").alias("c1"))
    bi = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c2"))
        .filter(F.col("c2") >= 5)
    )
    # Nb needs no second explode: every size>=2 doc contributes
    # exactly size-1 bigrams
    tot = uni.agg(F.sum("c1").cast("long").alias("nu")).crossJoin(
        tk.filter(sz >= 2)
        .agg(F.sum(sz - 1).cast("long").alias("nb"))
    )
    a = uni.select(F.col("word").alias("w1"), F.col("c1").alias("c1a"))
    b = uni.select(F.col("word").alias("w2"), F.col("c1").alias("c1b"))
    pmi = (
        F.log(F.col("c2").cast("double"))
        + 2 * F.log(F.col("nu").cast("double"))
        - F.log(F.col("nb").cast("double"))
        - F.log(F.col("c1a").cast("double"))
        - F.log(F.col("c1b").cast("double"))
    )
    return (
        bi.join(F.broadcast(a), "w1")
        .join(F.broadcast(b), "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", F.col("c2").alias("n_pair"), qnt(pmi, "pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(20)
    )


_FFD_BUDGET = 2048


@op("pack_sequences_ffd")
def pack_sequences_ffd(spark, sf_dir):
    """HARD-BUDGET sequence packing via First-Fit-Decreasing — the
    packing-efficiency upgrade over `pack_sequences`' streaming
    semantic (which lets a sequence overrun by one document): here no
    bin ever exceeds the 2048-token budget, and FFD's sort-then-place
    (Johnson 1973; ≤ 11/9·OPT + 1 bins) recovers most of the tokens
    the naive in-order packer wastes as tail fragmentation. This is
    the bin-packing step real pretraining pipelines run when truncation
    is unacceptable and padding is the cost to minimize.

    FFD is inherently sequential WITHIN a bin set, so it runs
    shard-locally: documents shard into PACK_SHARDS contiguous doc_id
    ranges per language (pack_sequences' two-level discipline), each
    (lang, shard) group packs independently inside one Arrow-batched
    applyInPandas call (bounded group size by construction), and bins
    never span shards — the packing is embarrassingly parallel at
    langs x shards, trading ≤1 fragmented bin per shard for
    distribution. Deterministic: groups are hash-partitioned by key
    (order within a group is irrelevant after the in-UDF sort by
    (n_tokens desc, doc_id)), so the result is partitioning-invariant.

    Rows-only by design: a sequential packing loop is not
    SQL-expressible; correctness is pinned by an exact Python FFD
    replay plus capacity/conservation invariants in
    tests/test_r7_operators.py. Oversized documents (> budget) would
    get a flagged singleton bin (none exist in the fixtures)."""
    import pandas as pd

    t = Tables(spark, sf_dir)
    # NULL text has no tokens to pack: size() is NULL there, which
    # reaches the Arrow FFD kernel as NaN and crashed int() (r11
    # rows-only sweep, scenarios A/D). Dropping the row mirrors
    # pack_sequences' oracle, whose token CTE never emits such docs.
    sized = t.documents.select(
        "lang", "doc_id", F.size(_tokens()).cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens").isNotNull())
    bounds = sized.groupBy("lang").agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    shard = F.least(
        F.lit(PACK_SHARDS - 1),
        F.floor(
            (F.col("doc_id") - F.col("lo"))
            * PACK_SHARDS
            / (F.col("hi") - F.col("lo") + 1)
        ),
    ).cast("long")
    # null-safe like pack_sequences': a NULL lang is a real pack group
    sharded = (
        sized.join(
            F.broadcast(bounds.withColumnRenamed("lang", "_bl")),
            F.col("lang").eqNullSafe(F.col("_bl")),
        )
        .withColumn("shard", shard)
        .select("lang", "shard", "doc_id", "n_tokens")
    )

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        )
        lang = pdf["lang"].iloc[0]
        sh = int(pdf["shard"].iloc[0])
        bins: list[list[int]] = []  # [remaining, n_docs, total]
        for r in pdf.itertuples():
            for b in bins:
                if r.n_tokens <= b[0]:
                    b[0] -= r.n_tokens
                    b[1] += 1
                    b[2] += r.n_tokens
                    break
            else:
                bins.append(
                    [_FFD_BUDGET - int(r.n_tokens), 1, int(r.n_tokens)]
                )
        return pd.DataFrame(
            {
                "lang": lang,
                "shard": sh,
                "bin_id": range(len(bins)),
                "n_docs": [b[1] for b in bins],
                "total_tokens": [b[2] for b in bins],
                "fill_ratio": [
                    round(b[2] * 1000000 // _FFD_BUDGET / 1e6, 6)
                    for b in bins
                ],
            }
        )

    return sharded.groupBy("lang", "shard").applyInPandas(
        ffd,
        "lang string, shard long, bin_id long, n_docs long,"
        " total_tokens long, fill_ratio double",
    )


_ZIPF_TOP = 200


def _zipf_units_sql(expr: str) -> str:
    # ln() quantized to 1e-6 units as BIGINT; x >= 0 for rank/freq >= 1
    return f"CAST(FLOOR(ln({expr}) * 1e6 + 0.5) AS BIGINT)"


@op(
    "text_zipf_fit",
    sql=f"""
    WITH freq AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY w
        ORDER BY c DESC, w
        LIMIT {_ZIPF_TOP}
    ),
    ranked AS (
        SELECT ROW_NUMBER() OVER (ORDER BY c DESC, w) AS r, c
        FROM freq
    ),
    u AS (
        SELECT {_zipf_units_sql('r')} AS ux, {_zipf_units_sql('c')} AS uy
        FROM ranked
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(ux) AS BIGINT) AS sx,
               CAST(SUM(uy) AS BIGINT) AS sy,
               CAST(SUM(ux * ux) AS BIGINT) AS sxx,
               CAST(SUM(uy * uy) AS BIGINT) AS syy,
               CAST(SUM(ux * uy) AS BIGINT) AS sxy
        FROM u
    )
    SELECT n AS n_terms,
           FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) * 1e6 + 0.5) / 1e6
               AS zipf_slope,
           FLOOR((CAST(sy AS DOUBLE) / 1e6
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(sx AS DOUBLE) / 1e6) / n * 1e6 + 0.5) / 1e6
               AS intercept,
           FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)
                 / CAST(n * syy - sy * sy AS DOUBLE) * 1e6 + 0.5) / 1e6
               AS r2
    FROM s
    """,
)
def text_zipf_fit(spark, sf_dir):
    """Zipf's-law fit over the corpus unigram distribution — the
    corpus-health gauge LLM data teams run on every new source: OLS of
    ln(frequency) on ln(rank) over the top 200 terms gives the
    Zipf slope (natural text ~ -1), intercept, and R². A synthetic or
    template-generated corpus shows up as a slope far from -1 or a
    poor log-log fit long before downstream loss does (Piantadosi
    2014's review of Zipf fits is the method reference).

    Determinism: the only transcendental inputs (ln rank, ln freq) are
    quantized to exact 1e-6 BIGINT units per term BEFORE summation, so
    every OLS moment is an exact integer aggregate — engines cannot
    drift on accumulation order; the closed-form slope/intercept/R²
    are identical one-shot float expressions quantized to 1e-6.

    Scale (100 TB): token explode -> word-keyed partial-agg count
    (the Zipfian head is AQE's skew case), then a global top-K that
    plans as TakeOrdered (per-partition heap + K-row driver merge,
    never a full vocab sort); the OLS itself runs over 200
    rows — constant work after the count."""
    t = Tables(spark, sf_dir)
    freq = (
        t.documents.select(
            F.explode(F.split("text", " ")).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(_ZIPF_TOP)
    )
    wz = Window.orderBy(F.col("c").desc(), "w")
    units = lambda col: F.floor(F.log(col) * 1e6 + F.lit(0.5)).cast("long")
    ranked = freq.select(
        units(F.row_number().over(wz).cast("double")).alias("ux"),
        units(F.col("c").cast("double")).alias("uy"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ux").cast("long").alias("sx"),
        F.sum("uy").cast("long").alias("sy"),
        F.sum(F.col("ux") * F.col("ux")).cast("long").alias("sxx"),
        F.sum(F.col("uy") * F.col("uy")).cast("long").alias("syy"),
        F.sum(F.col("ux") * F.col("uy")).cast("long").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    num = (n * sxy - sx * sy).cast("double")
    den = (n * sxx - sx * sx).cast("double")
    slope = num / den
    return s.select(
        n.alias("n_terms"),
        qnt(slope, "zipf_slope"),
        qnt(
            (sy.cast("double") / F.lit(1e6)
             - slope * sx.cast("double") / F.lit(1e6)) / n,
            "intercept",
        ),
        qnt(num * num / den / (n * syy - sy * sy).cast("double"), "r2"),
    )


@op(
    "text_ngram_novelty",
    sql="WITH "
    + _NGRAM_CTE
    + """,
    dg AS (SELECT DISTINCT doc_id, ngram FROM ngrams),
    first_seen AS (
        SELECT ngram, MIN(doc_id) AS first_doc FROM dg GROUP BY ngram
    )
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(*) FILTER (WHERE f.first_doc = d.doc_id)
                AS BIGINT) AS n_novel,
           FLOOR(CAST(COUNT(*) FILTER (WHERE f.first_doc = d.doc_id)
                      AS DOUBLE) / COUNT(*) * 1e6 + 0.5) / 1e6
               AS novelty_rate
    FROM dg d JOIN first_seen f ON f.ngram = d.ngram
    GROUP BY d.doc_id
    """,
)
def text_ngram_novelty(spark, sf_dir):
    """Per-document n-gram NOVELTY against everything ingested before
    it (doc_id is ingestion order): the share of a doc's distinct
    word trigrams whose FIRST corpus occurrence is this doc. This is
    the streaming-dedup view of the corpus — the running twin of
    `dedup_ngram_jaccard`'s pairwise overlap: a feed that starts
    re-crawling old content shows up as a novelty collapse, and docs
    near 0 are pure recombinations of earlier text (the metric
    training-data teams chart per crawl snapshot).

    Exact integer counting throughout: first-occurrence attribution
    is MIN(doc_id) per trigram (an exact pick), novelty is one
    quantized ratio.

    Scale (100 TB): the trigram table collapses to DISTINCT (gram,
    doc) then to a gram-keyed MIN — both map-combinable; the join
    back is gram-keyed equi (AQE handles the Zipf head) and the final
    rollup is doc-keyed. Linear in postings, never doc-pairwise."""
    t = Tables(spark, sf_dir)
    dg = _spark_ngrams(t).distinct()
    first = dg.groupBy("ngram").agg(F.min("doc_id").alias("first_doc"))
    novel = F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1))
    return (
        dg.join(first, "ngram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            novel.cast("long").alias("n_novel"),
            qnt(
                novel.cast("double") / F.count(F.lit(1)), "novelty_rate"
            ),
        )
    )


_FH_BUCKETS = 64
_FH_MOD = 1_048_576  # keep the rolling accumulator bounded in BIGINT


@op(
    "text_feature_hash",
    sql=f"""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents
    ),
    hashed AS (
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(w) + 1),
                                      i -> CAST(ascii(substr(w, CAST(i AS INT), 1))
                                                AS BIGINT))),
                   (acc, b) -> (acc * 31 + b) % {_FH_MOD}
               ) % {_FH_BUCKETS} AS bucket
        FROM words
    )
    SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM hashed GROUP BY doc_id, bucket
    """,
)
def text_feature_hash(spark, sf_dir):
    """Feature hashing (the 'hashing trick', Weinberger et al.
    ICML'09): every token maps through a fixed polynomial hash into
    one of 64 buckets and each document becomes a sparse
    (bucket, count) vector — the vocabulary-free featurizer used when
    a vocab table is unbuildable or must never ship (PII), and the
    baseline featurization for linear probes over a corpus. Sparse
    row-per-bucket output, not an array column (the r5 scalarization
    lesson).

    Determinism: the hash is OUR OWN fold — acc·31 + byte mod 2²⁰,
    then mod buckets — written identically on both engines (Spark
    aggregate(), DuckDB list_reduce()), because engine-native hash
    functions (xxhash64 vs DuckDB hash) can never agree. Exact
    integer arithmetic end-to-end; the accumulator stays < 2²⁶.

    Scale (100 TB): token explode -> per-word codegen fold (no UDF,
    no vocab join, no shuffle before the count) -> (doc, bucket)
    map-combinable groupBy bounded by |docs|·64 buckets. This is
    the featurizer whose cost does NOT grow with vocabulary — the
    whole point of the trick."""
    t = Tables(spark, sf_dir)
    words = t.documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    poly = (
        "aggregate(transform(sequence(1, length(w)),"
        " i -> CAST(ascii(substring(w, i, 1)) AS BIGINT)),"
        f" CAST(0 AS BIGINT), (acc, b) -> (acc * 31 + b) % {_FH_MOD})"
    )
    return (
        words.select(
            "doc_id",
            F.expr(f"({poly}) % {_FH_BUCKETS}").cast("long").alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@op(
    "pipeline_dedup_prep",
    sql="WITH "
    + _NGRAM_CTE
    + """,
    dg AS (SELECT DISTINCT doc_id, ngram FROM ngrams),
    first_seen AS (
        SELECT ngram, MIN(doc_id) AS first_doc FROM dg GROUP BY ngram
    ),
    novelty AS (
        SELECT d.doc_id,
               FLOOR(CAST(COUNT(*) FILTER (WHERE f.first_doc = d.doc_id)
                          AS DOUBLE) / COUNT(*) * 1e6 + 0.5) / 1e6
                   AS novelty_rate
        FROM dg d JOIN first_seen f ON f.ngram = d.ngram
        GROUP BY d.doc_id
    ),
    fp AS (
        SELECT doc_id,
               md5(array_to_string(
                   list_sort(list_distinct(string_split(COALESCE(text, ''), ' '))),
                   ' ')) AS fingerprint,
               CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS n_words,
               CAST(len(list_distinct(string_split(COALESCE(text, ''), ' ')))
                    AS BIGINT) AS n_uniq
        FROM documents
    ),
    canon AS (
        SELECT fingerprint, MIN(doc_id) AS canonical_doc
        FROM fp GROUP BY fingerprint
    )
    SELECT f.doc_id,
           f.doc_id = c.canonical_doc AS is_canonical,
           COALESCE(n.novelty_rate, 0.0) AS novelty_rate,
           f.n_words BETWEEN 20 AND 200
               AND 5 * f.n_uniq > f.n_words AS quality_pass,
           f.doc_id = c.canonical_doc
               AND COALESCE(n.novelty_rate, 0.0) >= 0.2
               AND (f.n_words BETWEEN 20 AND 200
                    AND 5 * f.n_uniq > f.n_words) AS keep
    FROM fp f
    JOIN canon c ON c.fingerprint = f.fingerprint
    LEFT JOIN novelty n ON n.doc_id = f.doc_id
    """,
)
def pipeline_dedup_prep(spark, sf_dir):
    """END-TO-END dedup-decision capstone (the fourth pipeline_*
    bookend beside text/events/embed/media prep): the per-document
    KEEP/DROP table a training-data ingest materializes before
    tokenization — is this doc its exact-duplicate group's canonical
    (lowest doc_id per bag-of-words fingerprint), how novel are its
    trigrams against everything ingested before it, does it clear the
    quality gate (word count in range, unique-word ratio > 1/5 as an
    exact integer cross-multiplication), and the final conjunction
    with reasons preserved per doc so drops are auditable.

    One plan: fingerprint + quality facts come from a single document
    scan; novelty reuses the text_ngram_novelty chain (distinct
    postings → MIN attribution → doc rollup); the canonical pick is a
    fingerprint-keyed MIN joined back. Everything exact-integer or
    quantized-once; the conjunction is pure boolean algebra over
    hash-checked legs.

    Scale (100 TB): the same shapes its legs already proved —
    map-combinable aggregations keyed by fingerprint / ngram / doc,
    never doc-pairwise; the decision table is one row per doc and the
    reasons make incremental re-runs idempotent (a re-crawled dup
    drops as non-canonical, not by luck of ordering)."""
    t = Tables(spark, sf_dir)
    dg = _spark_ngrams(t).distinct()
    first = dg.groupBy("ngram").agg(F.min("doc_id").alias("first_doc"))
    novel = F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1))
    novelty = (
        dg.join(first, "ngram")
        .groupBy("doc_id")
        .agg(
            qnt(novel.cast("double") / F.count(F.lit(1)), "novelty_rate")
        )
    )
    toks = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    fp = t.documents.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
        ).alias("fingerprint"),
        F.size(toks).cast("long").alias("n_words"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq"),
    )
    canon = fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("canonical_doc")
    )
    quality = F.col("n_words").between(20, 200) & (
        5 * F.col("n_uniq") > F.col("n_words")
    )
    is_canon = F.col("doc_id") == F.col("canonical_doc")
    nov = F.coalesce(F.col("novelty_rate"), F.lit(0.0))
    return (
        fp.join(canon, "fingerprint")
        .join(novelty, "doc_id", "left")
        .select(
            "doc_id",
            is_canon.alias("is_canonical"),
            nov.alias("novelty_rate"),
            quality.alias("quality_pass"),
            (is_canon & (nov >= 0.2) & quality).alias("keep"),
        )
    )
