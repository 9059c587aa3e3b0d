"""The local twin of the driver's correctness gate.

For every operator key with a SQL oracle: run the PySpark DataFrame and
the DuckDB SQL at sf0.01 and require an exact order-insensitive match
(row count + columns + canonicalized value multiset, floats by hex).
Rows-only keys are checked to run and return a sane DataFrame.
"""

import pytest

from data_webhooks_spark import registry
from data_webhooks_spark.oracle import compare_frames

ORACLE = registry.oracle_sql()
QUERIES = registry.queries()
SQL_KEYS = sorted(ORACLE)
ROWS_ONLY_KEYS = sorted(set(QUERIES) - set(ORACLE))


@pytest.mark.parametrize("key", SQL_KEYS)
def test_sql_parity(key, spark, duck, sf_dir):
    sp = QUERIES[key](spark, sf_dir).toPandas()
    du = duck.execute(ORACLE[key]).df()
    problems = compare_frames(sp, du)
    assert not problems, f"{key}: " + "; ".join(problems)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_runs(key, spark, sf_dir):
    df = QUERIES[key](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0


@pytest.mark.parametrize("key", SQL_KEYS)
def test_oracle_not_vacuous(key, duck):
    """A hash compare of two empty results passes no matter what the
    operator computes. The r4 audit caught four keys whose operand
    choices made the oracle permanently empty (set_except,
    join_left_anti, dedup_embedding, sink_partitioned_parquet) — this
    guard keeps the class extinct: every SQL oracle must produce at
    least one row at the driver's correctness scale factor."""
    assert len(duck.execute(ORACLE[key]).fetchall()) > 0, (
        f"{key}: oracle returns 0 rows at sf0.01 — the driver's "
        "value-hash comparison would pass vacuously; pick operands "
        "with a non-empty result"
    )


def test_driver_window_is_the_round6_rotation():
    """The external driver's correctness gate reads the FIRST 50 keys
    of queries(); round 6 rotates in the 20 r5 additions (never
    driver-recorded), the 4 keys red in CORRECTNESS_r05 (scalarized
    this round), the 12 keys whose newest official record is the
    since-fixed r2 loader error, the 10 r6 additions, and 4 re-verify
    slots for r6-replanned/changed code (join_multiway, tpch_q5,
    source_webhook, sink_webhook) — after which no key's newest
    official record is red or absent. The rotation must not drop or
    duplicate any key, and every window key outside the declared
    rows-only set must be SQL-oracled."""
    from data_webhooks_spark.registry import _ROWS_ONLY, _WINDOW

    qs, osql = registry.queries(), registry.oracle_sql()
    first50 = list(qs)[:50]
    assert len(_WINDOW) == 50
    assert first50 == _WINDOW
    assert all(k in osql for k in first50 if k not in _ROWS_ONLY)
    assert _ROWS_ONLY == set(qs) - set(osql)
    assert len(set(qs)) == len(qs)


def test_three_way_agreement_sparksql_vs_dataframe(spark, sf_dir, duck):
    """SURVEY §3.2: every oracle string that is engine-portable ANSI
    must ALSO run through spark.sql over the same views and agree with
    the DataFrame-API result — DataFrame plan ≡ Spark SQL ≡ DuckDB.
    DuckDB-dialect oracles (read_json, list_*, ASOF JOIN, QUALIFY...)
    are skipped by the try; the portable subset must be non-trivial."""
    from data_webhooks_spark import registry
    from data_webhooks_spark.io import Tables
    from data_webhooks_spark.schemas import TABLE_NAMES
    from data_webhooks_spark.oracle import compare_frames

    t = Tables(spark, sf_dir)
    for name in TABLE_NAMES:
        getattr(t, name).createOrReplaceTempView(name)

    qs, osql = registry.queries(), registry.oracle_sql()
    ran, disagreements = [], []
    for k, sql in sorted(osql.items()):
        try:
            via_sql = spark.sql(sql).toPandas()
        except Exception:
            continue  # DuckDB-dialect oracle; not portable
        via_df = qs[k](spark, sf_dir).toPandas()
        probs = compare_frames(via_df, via_sql)
        ran.append(k)
        if probs:
            disagreements.append((k, probs))
    assert len(ran) >= 20, f"portable subset too small: {ran}"
    assert not disagreements, disagreements


def test_array_columns_elementwise_parity(spark, sf_dir, duck):
    """Element-wise array coverage (ADVICE r2): driver-facing outputs
    scalarize arrays (a sum can collide while elements/order differ),
    so keep a local check that the raw arrays themselves agree
    cell-for-cell between engines — canon()'s list branch compares
    per-element."""
    from pyspark.sql import functions as F

    from data_webhooks_spark.io import Tables

    t = Tables(spark, sf_dir)
    e = F.col("embedding")
    sp = t.embeddings.select(
        "vec_id",
        F.transform(F.slice(e, 1, 4), lambda x: F.round(x.cast("double"), 6))
        .alias("head4"),
    ).toPandas()
    du = duck.execute(
        """
        SELECT vec_id,
               list_transform(list_slice(embedding, 1, 4),
                              x -> round(CAST(x AS DOUBLE), 6)) AS head4
        FROM embeddings
        """
    ).df()
    # element-wise array parity is deliberate here (NOT a driver-facing
    # result), so opt out of the driver-sortable lint
    assert not compare_frames(sp, du, require_driver_sortable=False)

    sp_tok = (
        t.documents.filter(F.col("doc_id") < 200)
        .select("doc_id", F.split(F.col("text"), " ").alias("words"))
        .toPandas()
    )
    du_tok = duck.execute(
        "SELECT doc_id, string_split(text, ' ') AS words FROM documents "
        "WHERE doc_id < 200"
    ).df()
    assert len(sp_tok) > 0
    assert not compare_frames(sp_tok, du_tok, require_driver_sortable=False)

    # embed_quantize_int8 (added r4, scalarized r6): the int8 vector
    # ships as a ','-joined scalar — pin the element-wise parity and
    # range on the parsed CSV, per the r2 ADVICE discipline for
    # (formerly) array-output keys.
    sp_q = QUERIES["embed_quantize_int8"](spark, sf_dir).toPandas()
    du_q = duck.execute(ORACLE["embed_quantize_int8"]).df()
    assert not compare_frames(sp_q, du_q)
    for csv in sp_q["qvec_csv"].head(50):
        vals = [int(x) for x in csv.split(",")]
        assert len(vals) == 64
        assert all(-127 <= v <= 127 for v in vals)
