"""Fixture-drift guard — run FIRST (filename sorts early with -x).

Round 2 post-mortem: the driver regenerated fixtures between rounds and
events.ts changed parquet physical type (TIMESTAMP(NANOS) ->
timestamp[us]); the loader assumed one vintage and 60/152 registry keys
crashed with cascading AnalysisExceptions. This module turns any future
fixture drift into ONE readable assertion failure instead.

Checks, per table at the test SF:
- file exists and is readable by pyarrow
- every expected column is present
- each column's *Spark-materialized* type is in an admissible set
  (events.ts may be LongType [nanosAsLong] or TimestampNTZ/Timestamp)
- the normalized loader output (io.load_table) has the canonical schema
"""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from data_webhooks_spark.io import load_table, table_path

from tests.conftest import SF_DIR

# column -> set of admissible Spark type classes (materialized by the
# plain reader, before io.py normalization)
RAW_ADMISSIBLE = {
    "events": {
        "event_id": (T.LongType,),
        # nanos-vintage reads as Long (nanosAsLong); µs-vintage as (NTZ) timestamp
        "ts": (T.LongType, T.TimestampNTZType, T.TimestampType),
        "user_id": (T.LongType,),
        "event_type": (T.StringType,),
        "value": (T.DoubleType,),
        "props": (T.StringType,),
    },
    "lineitem": {
        "l_orderkey": (T.LongType,),
        "l_quantity": (T.DoubleType, T.DecimalType),
        "l_extendedprice": (T.DoubleType, T.DecimalType),
        "l_discount": (T.DoubleType, T.DecimalType),
        "l_shipdate": (T.DateType, T.TimestampNTZType, T.TimestampType),
    },
    "orders": {
        "o_orderkey": (T.LongType,),
        "o_custkey": (T.LongType,),
        "o_orderdate": (T.DateType, T.TimestampNTZType, T.TimestampType),
    },
    "customer": {"c_custkey": (T.LongType,)},
    "supplier": {"s_suppkey": (T.LongType,)},
    "part": {"p_partkey": (T.LongType,)},
    "nation": {"n_nationkey": (T.IntegerType, T.LongType)},
    "region": {"r_regionkey": (T.IntegerType, T.LongType)},
    "documents": {
        "doc_id": (T.LongType,),
        "text": (T.StringType,),
    },
    "embeddings": {
        "vec_id": (T.LongType,),
        "embedding": (T.ArrayType,),
        "label": (T.IntegerType, T.LongType),
    },
}


@pytest.mark.parametrize("table", sorted(RAW_ADMISSIBLE))
def test_fixture_file_exists(table):
    path = table_path(SF_DIR, table)
    assert os.path.exists(path), (
        f"fixture {path} missing — driver testdata layout changed?"
    )
    # readable by pyarrow (catches corrupt regeneration)
    pq.read_schema(path)


@pytest.mark.parametrize("table", sorted(RAW_ADMISSIBLE))
def test_fixture_schema_admissible(spark, table):
    raw = spark.read.parquet(table_path(SF_DIR, table))
    fields = {f.name: f.dataType for f in raw.schema.fields}
    for col, admissible in RAW_ADMISSIBLE[table].items():
        assert col in fields, (
            f"FIXTURE DRIFT: {table}.{col} missing; columns now {sorted(fields)}"
        )
        assert isinstance(fields[col], admissible), (
            f"FIXTURE DRIFT: {table}.{col} materialized as {fields[col]} — "
            f"admissible: {[a.__name__ for a in admissible]}. "
            "Update io.py loader normalization + this admissible set."
        )


def test_events_loader_normalizes_ts(spark):
    """io.load_table must yield TIMESTAMP_NTZ ts for ANY fixture vintage."""
    ev = load_table(spark, SF_DIR, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampNTZType), (
        f"loader produced {ev.schema['ts'].dataType}, want TimestampNTZType"
    )
    # and it must actually compute (analysis exceptions surface here)
    row = ev.selectExpr(
        "min(ts) as lo", "max(ts) as hi", "count(*) as n"
    ).first()
    assert row["n"] > 0
    assert row["lo"] is not None and row["hi"] > row["lo"]


def test_cached_derivation_clears_markerless_partial(tmp_path):
    """ADVICE r8: a crashed derivation leaves a partial dir with NO
    marker; cached_derivation must clear it so writers without
    mode('overwrite') don't hard-fail on path-already-exists."""
    from data_webhooks_spark.io import cached_derivation, commit_derivation

    out = str(tmp_path / "derived")
    os.makedirs(out)
    with open(f"{out}/part-0.parquet", "w") as f:
        f.write("partial garbage")
    assert cached_derivation(out, "_done", "fp1") is False
    assert not os.path.exists(out), "markerless partial dir must be cleared"

    # normal lifecycle still works: derive, commit, hit
    os.makedirs(out)
    commit_derivation(out, "_done", "fp1")
    assert cached_derivation(out, "_done", "fp1") is True
    # fingerprint mismatch clears as before
    assert cached_derivation(out, "_done", "fp2") is False
    assert not os.path.exists(out)
