"""Deterministic sampling / split operators for training-data pipelines.

A 100 TB corpus can't be sampled with RNG state: resuming a failed job
or re-running a stage must select the *same* rows, and the sample
decision must be computable row-locally (no shuffle, no global pass).
Every operator here derives the decision from a content hash of a key:

- reproducible across runs, engines, partitionings and cluster sizes;
- pushes down as a plain filter (the parquet scan prunes nothing, but
  the decision costs one hash per row and no exchange);
- stratification and train/test splits are CASE arms over the same
  hash, so one pass assigns everything consistently.

The hash is the first 15 hex digits of md5 (60 bits, exactly
representable in BIGINT on both engines), giving a uniform bucket in
[0, 10000) via modulus. md5, not xxhash64: the oracle must compute the
identical buckets and DuckDB's hash() family differs from Spark's.
For hot paths where cross-engine parity is not required, xxhash64
halves the per-row cost (codegen, no string round-trip).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import Tables
from ..norms import finite_or_null, qnt
from ..regutil import registrar

QUERIES: dict = {}
ORACLE: dict = {}
op = registrar(QUERIES, ORACLE)

BUCKETS = 10_000


def hash_bucket(col: F.Column) -> F.Column:
    """Uniform deterministic bucket in [0, BUCKETS) from a column's
    string form — codegen md5 + 60-bit hex slice, identical in the
    DuckDB oracle."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
    return F.pmod(h.cast("long"), F.lit(BUCKETS))


def o_hash_bucket(expr: str) -> str:
    """DuckDB twin of hash_bucket (same md5 slice, same modulus)."""
    return (
        f"CAST(('0x' || substr(md5(CAST(({expr}) AS VARCHAR)), 1, 15)) AS BIGINT)"
        f" % {BUCKETS}"
    )


@op(
    "sample_hash",
    sql=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {o_hash_bucket('doc_id')} < 1000
    """,
)
def sample_hash(spark, sf_dir):
    """Deterministic 10% Bernoulli sample of the document corpus: keep
    a row iff its key hashes into the first 1000 of 10000 buckets. No
    RNG, no state — the same rows survive on every run at any scale."""
    t = Tables(spark, sf_dir)
    return t.documents.filter(hash_bucket(F.col("doc_id")) < 1000).select(
        "doc_id", "lang", "n_chars"
    )


@op(
    "sample_stratified",
    sql=f"""
    WITH b AS (SELECT *, {o_hash_bucket('event_id')} AS bucket FROM events)
    SELECT event_type, COUNT(*) AS n_sampled
    FROM b
    WHERE bucket < CASE event_type
        WHEN 'click' THEN 200 WHEN 'view' THEN 100 ELSE 5000 END
    GROUP BY event_type
    """,
)
def sample_stratified(spark, sf_dir):
    """Per-stratum sampling rates in one pass (downsample the abundant
    classes, keep the rare ones): the rate is a CASE arm over the same
    hash bucket, so stratification adds zero extra scans or shuffles."""
    t = Tables(spark, sf_dir)
    rate = (
        F.when(F.col("event_type") == "click", 200)
        .when(F.col("event_type") == "view", 100)
        .otherwise(5000)
    )
    return (
        t.events.filter(hash_bucket(F.col("event_id")) < rate)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


@op(
    "split_train_test",
    sql=f"""
    WITH b AS (SELECT *, {o_hash_bucket('doc_id')} AS bucket FROM documents)
    SELECT CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM b
    GROUP BY 1
    """,
)
def split_train_test(spark, sf_dir):
    """80/10/10 train/val/test assignment from the key hash: stable
    under re-runs, appends, and repartitioning — a document never
    migrates between splits, which is the leakage guarantee a training
    pipeline actually needs."""
    t = Tables(spark, sf_dir)
    b = hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < 8000, "train").when(b < 9000, "val").otherwise("test")
    )
    return (
        t.documents.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@op(
    "sample_per_group",
    sql=f"""
    WITH r AS (
        SELECT user_id, event_id, value,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY {o_hash_bucket('event_id')}, event_id
               ) AS rn
        FROM events
    )
    SELECT user_id, event_id, value FROM r WHERE rn <= 5
    """,
)
def sample_per_group(spark, sf_dir):
    """Fixed-size per-key sample (5 events per user): rank rows inside
    each group by their key hash and keep the first k — a deterministic
    stand-in for per-group reservoir sampling. One shuffle (the window
    partitioning); ties broken by event_id so the pick is total-ordered."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        hash_bucket(F.col("event_id")), F.col("event_id")
    )
    return (
        t.events.select(
            "user_id", "event_id", "value", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


@op(
    "sample_weighted",
    sql=f"""
    WITH b AS (
        SELECT event_type, value,
               {o_hash_bucket('event_id')} AS bucket
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_kept,
           CAST(SUM(CASE WHEN ABS(value) <= 1.7976931348623157e308 AND value >= 0
                THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                WHEN ABS(value) <= 1.7976931348623157e308
                THEN -CAST(FLOOR(-value * 100.0 + 0.5) AS BIGINT) END)
             AS DOUBLE) / 100 AS kept_value
    FROM b
    WHERE bucket < value * 20
    GROUP BY event_type
    """,
)
def sample_weighted(spark, sf_dir):
    """Deterministic WEIGHTED Bernoulli sampling: each row survives
    with probability proportional to its weight (P(keep) = value/500,
    value <= 490 in the fixture), decided by comparing the row's hash
    bucket against weight*BUCKETS/500 — importance sampling for
    training pipelines (keep high-value rows preferentially) with the
    same engine/partitioning/re-run stability as the uniform
    `sample_hash`: no RNG, the decision is a pure row-local function
    of (key, weight). The boundary comparison is the identical
    double expression on both engines, so the kept set is
    bit-deterministic. One scan, filter + partial agg."""
    t = Tables(spark, sf_dir)
    kept = t.events.filter(
        hash_bucket(F.col("event_id")) < F.col("value") * 20
    )
    v = finite_or_null("value")
    units = F.when(v >= 0, F.floor(v * 100.0 + F.lit(0.5))).when(
        v < 0, -F.floor(-v * 100.0 + F.lit(0.5))
    )
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"),
        (F.sum(units).cast("double") / 100).alias("kept_value"),
    )


@op(
    "sample_temperature",
    sql=f"""
    WITH c AS (
        SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
    ),
    thr AS (
        SELECT lang, n_docs,
               CAST(FLOOR(sqrt(CAST((SELECT MIN(n_docs) FROM c) AS DOUBLE)
                               / CAST(n_docs AS DOUBLE)) * {BUCKETS})
                    AS BIGINT) AS threshold
        FROM c
    ),
    kept AS (
        SELECT d.lang, COUNT(*) AS n_kept
        FROM documents d JOIN thr USING (lang)
        WHERE {o_hash_bucket('d.doc_id')} < thr.threshold
        GROUP BY d.lang
    )
    SELECT thr.lang, CAST(thr.n_docs AS BIGINT) AS n_docs, thr.threshold,
           CAST(kept.n_kept AS BIGINT) AS n_kept
    FROM thr JOIN kept USING (lang)
    """,
)
def sample_temperature(spark, sf_dir):
    """Temperature-based multilingual rebalancing (the sampling rule
    multilingual LLM corpora use — rates proportional to
    ``n_lang**(alpha-1)`` with alpha = 0.5, normalized so the rarest
    language keeps all its documents): the per-language keep rate is
    ``sqrt(n_min / n_lang)``, flattening the language distribution
    toward uniform while never upsampling. The keep decision is the
    same hash-bucket-vs-threshold filter as `sample_hash`, so the kept
    set is stable under re-runs, appends and repartitioning.

    Two passes over documents — the rate table must see the counts
    first — but the first pass is a map-combined count (tiny shuffle)
    and the 5-row threshold table broadcasts onto the second scan, so
    at 100 TB this is two scans, zero fact shuffles. The rate
    arithmetic stays cross-engine exact: integer counts, one double
    division, one IEEE sqrt (correctly rounded on both JVMs and
    DuckDB), and an integer FLOOR threshold — no pow(), whose last-ulp
    behavior is implementation-defined."""
    t = Tables(spark, sf_dir)
    counts = t.documents.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    w_all = Window.partitionBy()
    thr = counts.select(
        "lang",
        "n_docs",
        F.floor(
            F.sqrt(
                F.min("n_docs").over(w_all).cast("double")
                / F.col("n_docs").cast("double")
            )
            * BUCKETS
        ).alias("threshold"),
    )
    kept = (
        t.documents.join(F.broadcast(thr), "lang")
        .filter(hash_bucket(F.col("doc_id")) < F.col("threshold"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        thr.join(kept, "lang")
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            "threshold",
            F.col("n_kept").cast("long").alias("n_kept"),
        )
    )


# Target corpus mixture (web/books/code-style domains mapped from the
# fixture's src0..src19 by source index mod 3), integer tenth-shares
# summing to 10 — kept integral so every threshold below is exact
# BIGINT arithmetic on both engines.
_MIX_SHARES = {"web": 5, "books": 3, "code": 2}
_MIX_CASE = (
    "CASE CAST(substr(source, 4) AS INT) % 3 WHEN 0 THEN 'web' "
    "WHEN 1 THEN 'books' ELSE 'code' END"
)


@op(
    "sample_mixture_target",
    sql=f"""
    WITH dom AS (
        SELECT doc_id, {_MIX_CASE} AS domain FROM documents
    ),
    shares(domain, s) AS (VALUES ('web', 5), ('books', 3), ('code', 2)),
    cnt AS (
        SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM dom GROUP BY domain
    ),
    cap AS (
        SELECT MIN(n_docs * 1000000 // s) AS t_units
        FROM cnt JOIN shares USING (domain)
    ),
    thr AS (
        SELECT c.domain, sh.s, c.n_docs,
               (cap.t_units * sh.s // 1000000) AS k_target,
               ((cap.t_units * sh.s // 1000000) * {BUCKETS}) // c.n_docs
                   AS threshold
        FROM cnt c JOIN shares sh USING (domain) CROSS JOIN cap
    ),
    kept AS (
        SELECT d.domain, CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM dom d JOIN thr USING (domain)
        WHERE {o_hash_bucket('d.doc_id')} < thr.threshold
        GROUP BY d.domain
    ),
    tot AS (SELECT CAST(SUM(n_kept) AS BIGINT) AS total_kept FROM kept)
    SELECT thr.domain, thr.s AS share_tenths, thr.n_docs, thr.k_target,
           thr.threshold, kept.n_kept,
           FLOOR(CAST(kept.n_kept AS DOUBLE) / tot.total_kept
                 * 1e6 + 0.5) / 1e6 AS achieved_share
    FROM thr JOIN kept USING (domain) CROSS JOIN tot
    """,
)
def sample_mixture_target(spark, sf_dir):
    """Deterministic mixture-targeted downsampling: hit a declared
    domain mixture (web 50 % / books 30 % / code 20 %) exactly as far
    as the corpus allows WITHOUT upsampling — the epoch-construction
    step that turns "whatever crawl ratios we got" into "the mixture
    the training recipe specifies". `sample_temperature` FLATTENS a
    skewed distribution; this key STEERS one to declared targets.

    Exact integer derivation, no RNG and no floats until the display
    column: capacity T = min_d floor(n_d*1e6 / s_d) (the binding
    domain fully kept), per-domain target k_d = floor(T*s_d/1e6),
    acceptance threshold floor(k_d*BUCKETS/n_d) over the md5 hash
    bucket of doc_id — reproducible row-locally across runs, engines
    and partitionings (`hash_bucket` discipline). Positive operands,
    so Spark `div` == DuckDB `//`.

    Scale: one count per domain (map-side combine), a 3-row broadcast
    of thresholds, one filtered recount — the decision is a per-row
    hash compare with no shuffle of the corpus itself; the two 1-row
    scalar attaches (capacity, kept total) are aggregate-sized
    broadcasts. At 100 TB the only data-sized cost is two scans (or
    one, caching the domain column)."""
    t = Tables(spark, sf_dir)
    dom = t.documents.select(
        "doc_id", F.expr(_MIX_CASE).alias("domain")
    )
    shares = spark.createDataFrame(
        [(d, s) for d, s in _MIX_SHARES.items()], "domain string, s int"
    )
    cnt = dom.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    j = cnt.join(F.broadcast(shares), "domain")
    cap = j.agg(
        F.min(F.expr("n_docs * 1000000 div s")).alias("t_units")
    )
    thr = j.crossJoin(F.broadcast(cap)).select(
        "domain",
        F.col("s").alias("share_tenths"),
        "n_docs",
        F.expr("t_units * s div 1000000").alias("k_target"),
        F.expr(f"((t_units * s div 1000000) * {BUCKETS}) div n_docs").alias(
            "threshold"
        ),
    )
    kept = (
        dom.join(F.broadcast(thr), "domain")
        .filter(hash_bucket(F.col("doc_id")) < F.col("threshold"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).cast("long").alias("n_kept"))
    )
    tot = kept.agg(F.sum("n_kept").cast("long").alias("total_kept"))
    return (
        thr.join(kept, "domain")
        .crossJoin(F.broadcast(tot))
        .select(
            "domain",
            "share_tenths",
            "n_docs",
            "k_target",
            "threshold",
            "n_kept",
            qnt(
                F.col("n_kept").cast("double") / F.col("total_kept"),
                "achieved_share",
            ),
        )
    )


_KFOLDS = 5


@op(
    "split_kfold",
    sql=f"""
    WITH assigned AS (
        SELECT lang, {o_hash_bucket('doc_id')} % {_KFOLDS} AS fold
        FROM documents
    ),
    cells AS (
        SELECT fold, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM assigned GROUP BY 1, 2
    ),
    per_fold AS (
        SELECT fold, CAST(SUM(n_docs) AS BIGINT) AS n_fold
        FROM cells GROUP BY fold
    ),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_all FROM cells)
    SELECT c.fold, c.lang, c.n_docs, f.n_fold,
           FLOOR(CAST(f.n_fold AS DOUBLE) / t.n_all * 1e6 + 0.5) / 1e6
               AS fold_share
    FROM cells c
    JOIN per_fold f ON c.fold = f.fold
    CROSS JOIN tot t
    """,
)
def split_kfold(spark, sf_dir):
    """Deterministic k-fold cross-validation assignment (k=5): every
    document lands in exactly one fold via the md5 hash bucket — the
    same row-local, RNG-free decision as `split_train_test`, so folds
    are reproducible across runs, engines and partitionings, and a
    document NEVER migrates between folds when the corpus grows (the
    leakage guarantee re-runs of random splits can't give). Reported
    per (fold, lang): cell count, fold size, and fold share — the
    balance sheet that validates both the 1/k split and per-language
    stratification before a CV sweep.

    Scale: one scan, one map-combinable (fold, lang) count; the fold
    and grand totals are aggregate-sized broadcasts."""
    t = Tables(spark, sf_dir)
    assigned = t.documents.select(
        "lang",
        (hash_bucket(F.col("doc_id")) % _KFOLDS).alias("fold"),
    )
    cells = assigned.groupBy("fold", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    per_fold = cells.groupBy("fold").agg(
        F.sum("n_docs").cast("long").alias("n_fold")
    )
    tot = cells.agg(F.sum("n_docs").cast("long").alias("n_all"))
    return (
        cells.join(F.broadcast(per_fold), "fold")
        .crossJoin(F.broadcast(tot))
        .select(
            "fold",
            "lang",
            "n_docs",
            "n_fold",
            qnt(
                F.col("n_fold").cast("double") / F.col("n_all"),
                "fold_share",
            ),
        )
    )
