"""Fixture table loaders.

``Tables(spark, sf_dir)`` gives lazy attribute access to each fixture
table as a DataFrame (``t.lineitem``, ``t.orders``, ...). Reads are
plain ``spark.read.parquet`` so Catalyst keeps full pushdown/pruning
freedom — filters and projections expressed downstream reach the scan
(PushedFilters / ReadSchema in .explain).

At 100 TB the same loader works against a partitioned table layout
(e.g. events partitioned by date(ts)); nothing here assumes a single
file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import TABLE_NAMES
from .session import tune

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown fixture table {name!r}; have {TABLE_NAMES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS) — illegal for Spark's reader.

    Read it as epoch-nanos long (``spark.sql.legacy.parquet.nanosAsLong``,
    set by session.tune) and truncate to µs exactly like DuckDB does when
    it casts TIMESTAMP_NS -> TIMESTAMP: integer floor-division (all
    fixture timestamps are post-epoch, so floor == truncate). Result is
    TIMESTAMP_NTZ to match the other fixture timestamps and DuckDB's
    naive TIMESTAMP.
    """
    from pyspark.sql import functions as F

    raw = spark.read.parquet(table_path(sf_dir, "events"))
    return raw.withColumn(
        "ts", F.expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)")
    )


class Tables:
    """Lazy accessor: ``Tables(spark, sf).lineitem`` -> DataFrame.

    Also applies runtime session tuning (UTC tz, AQE) on construction so
    every queries() callable is correctness-safe regardless of how the
    SparkSession was built.
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = tune(spark)
        self.sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLE_NAMES:
            return load_table(self.spark, self.sf_dir, name)
        raise AttributeError(name)
