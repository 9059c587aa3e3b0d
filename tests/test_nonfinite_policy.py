"""The engine-wide non-finite-as-missing policy (r12, scenario N).

Root cause being guarded against: Spark's FLOOR(double)->BIGINT
silently saturates non-finite input (NaN -> 0 units — a NaN money
value becomes 0.00 in a sum with NO error; +-inf -> +-2^63-1, whose
first sum step throws ANSI ARITHMETIC_OVERFLOW), while DuckDB's
double-typed FLOOR propagates NaN/inf into INT64/DECIMAL casts and
raises. These tests pin the contract at the seam level: every norms
quantization helper must yield NULL for NaN/+-inf on BOTH engines,
bit-identically, with finite values untouched.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_webhooks_spark.norms import (
    dec_avg,
    dec_cast,
    dec_sum,
    o_dec_avg,
    o_dec_cast,
    o_dec_sum,
    o_qnt,
    qnt,
)
from data_webhooks_spark.oracle import compare_frames

NAN, INF = float("nan"), float("inf")


@pytest.fixture(scope="module")
def frame():
    return pd.DataFrame(
        {
            "g": [1, 1, 1, 1, 2, 2],
            "v": [1.234567, NAN, INF, -INF, 2.5, -0.015],
        }
    )


def test_seam_aggregates_agree_and_skip_nonfinite(spark, frame):
    df = spark.createDataFrame(frame)
    sp = (
        df.groupBy("g")
        .agg(dec_sum("v", "s"), dec_avg("v", "a"))
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", frame)
    du = con.execute(
        f"SELECT g, {o_dec_sum('v', 's')}, {o_dec_avg('v', 'a')} "
        "FROM t GROUP BY g ORDER BY g"
    ).df()
    con.close()
    assert not compare_frames(sp, du)
    # group 1's three non-finite rows are MISSING: sum == the one
    # finite value, avg divides by the finite count (1), not 4
    row = sp[sp["g"] == 1].iloc[0]
    assert row["s"] == pytest.approx(1.23)
    assert row["a"] == pytest.approx(1.23)


def test_seam_rowwise_quantize_agree(spark, frame):
    df = spark.createDataFrame(frame)
    sp = df.select("g", qnt(F.col("v"), "q")).orderBy("g", "q").toPandas()
    con = duckdb.connect()
    con.register("t", frame)
    du = con.execute(
        f"SELECT g, {o_qnt('v', 'q')} FROM t ORDER BY g, q"
    ).df()
    con.close()
    assert not compare_frames(sp, du)
    assert sp["q"].isna().sum() == 3  # exactly the nan/inf/-inf rows


def test_seam_decimal_cast_agree(spark, frame):
    df = spark.createDataFrame(frame)
    sp = (
        df.select("g", dec_cast("v").cast("double").alias("d"))
        .orderBy("g", "d")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", frame)
    du = con.execute(
        f"SELECT g, CAST({o_dec_cast('v')} AS DOUBLE) AS d "
        "FROM t ORDER BY g, d"
    ).df()
    con.close()
    assert not compare_frames(sp, du)


def test_nan_money_is_not_silently_zero(spark):
    """The original silent-corruption shape: one NaN purchase in a
    group must NOT contribute 0.00 — the group sum equals the sum of
    the finite values exactly."""
    pdf = pd.DataFrame({"g": [1, 1], "v": [10.0, NAN]})
    df = spark.createDataFrame(pdf)
    out = df.groupBy("g").agg(dec_sum("v", "s")).collect()[0]
    assert out["s"] == 10.0
