"""SparkSession construction and runtime tuning.

Two paths:

- ``get_spark()``: our own session (tests, bench) — local[*] with the
  full config set applied at build time.
- ``tune(spark)``: the driver hands ``queries()`` callables an
  externally-built session; ``tune`` applies the subset of configs that
  are runtime-settable (timezone, AQE, shuffle partitions, Arrow) so
  correctness-critical settings hold regardless of who built the session.

Correctness-critical settings (SURVEY.md §5.3):
- ``spark.sql.session.timeZone=UTC`` — the DuckDB oracle treats the
  tz-naive fixture timestamps as wall-clock; Spark must agree.

Scale notes (100 TB design): AQE is the load-bearing setting — runtime
shuffle-partition coalescing, skew-join splitting, and
broadcast-demotion all come from it. ``shuffle.partitions`` here is a
small-SF default; on a real cluster it should be ~2-3x total cores and
AQE coalesces down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable on an existing session.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # events.parquet stores ts as parquet TIMESTAMP(NANOS), which Spark
    # has no native type for — read as epoch-ns long, convert in io.py.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Small-SF default; AQE coalesces post-shuffle partitions anyway.
    "spark.sql.shuffle.partitions": "32",
    # Runtime bloom-filter semi-join reduction (Spark 3.3+, on by
    # default but gated behind thresholds tuned for clusters: creation
    # side <10 MB AND application-side scan >10 GB, so it never fires
    # at bench scale). Widen both gates so a selective dimension/filter
    # side prunes a big fact scan before the shuffle — the lever behind
    # the multi-big-table join keys (tpch_q5/join_multiway) at x100,
    # measured in BASELINE.md. The 200 MB application floor keeps every
    # sf<=0.1 plan bloom-free (zero overhead, stable plan tests); on a
    # real 100 TB cluster the stock 10 GB floor fires on its own.
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "256MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "200MB",
}

# Only settable at session build time.
BUILD_CONFS: dict[str, str] = {
    # Single-file-per-table fixtures: don't over-split tiny inputs.
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.ui.enabled": "false",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally-built session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this build; best effort
    return spark


def get_spark(app_name: str = "data-webhooks-spark") -> SparkSession:
    """Build (or reuse) a local session with the full config set."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    for k, v in {**BUILD_CONFS, **RUNTIME_CONFS}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return tune(spark)
