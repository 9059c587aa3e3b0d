import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_webhooks_spark.oracle import duck_connect  # noqa: E402
from data_webhooks_spark.session import get_spark  # noqa: E402

# The driver's correctness gate runs at sf0.01 — test at the same SF.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dws-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


# --- Session-scoped warm caches (r11 verdict item 8: suite wall time) ---
#
# Four registry-wide families each independently re-invoked every
# key's builder (which EXECUTES streams / loads codebooks) and/or
# re-collected its result: test_sql_parity, test_rows_only_runs, the
# three-way spark.sql agreement test, and the two registry-wide lints
# (plan anti-patterns, output dtypes). The builders are deterministic
# in (spark, sf_dir) and DataFrames are immutable plans, so one lazy
# session cache serves them all — one fn() call and at most one
# toPandas() per key per session (~4-6 min of the r11 suite's 24 was
# exactly this duplication). Results are returned as COPIES so no
# test can mutate another's view.


@pytest.fixture(scope="session")
def built_df(spark, sf_dir):
    """key -> the (lazily built, session-cached) DataFrame."""
    from data_webhooks_spark import registry

    qs = registry.queries()
    cache: dict = {}

    def get(key: str):
        if key not in cache:
            cache[key] = qs[key](spark, sf_dir)
        return cache[key]

    return get


@pytest.fixture(scope="session")
def spark_result(built_df):
    """key -> the executed toPandas() result (cached; returns a copy)."""
    cache: dict = {}

    def get(key: str):
        if key not in cache:
            cache[key] = built_df(key).toPandas()
        return cache[key].copy()

    return get
