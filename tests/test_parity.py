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
