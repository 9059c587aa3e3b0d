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
