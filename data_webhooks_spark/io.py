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


def duck_parquet_src(path: str) -> str:
    """DuckDB ``read_parquet`` target for one fixture table. The
    driver's fixtures are single files; the scale sweep's amplified
    tables are DIRECTORIES of part files (multi-split, like any real
    table). Spark reads both transparently; DuckDB needs a glob for
    the directory form — route every DuckDB derivation/oracle site
    through here so both layouts work."""
    return path if os.path.isfile(path) else f"{path}/*.parquet"


def source_fingerprint(*paths: str) -> str:
    """Identity of derivation inputs for marker-file caches: realpath +
    size + mtime per source. Derived artifacts (replay chunks, JSONL
    twins, partitioned layouts) key their "done" markers on THIS, not
    on the fixture dir's basename — two different fixtures can share a
    basename (pytest tmp dirs repeat across runs), and silently reusing
    a stale derivation is a silent-wrong-answer class of bug."""

    def one(p: str) -> str:
        st = os.stat(p)
        return f"{os.path.realpath(p)}:{st.st_size}:{st.st_mtime_ns}"

    return ";".join(one(p) for p in paths)


def cached_derivation(out: str, marker_name: str, fingerprint: str) -> bool:
    """True if `out` already holds a derivation for `fingerprint`;
    otherwise clears any stale content and returns False (caller
    derives, then calls commit_derivation)."""
    marker = f"{out}/{marker_name}"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == fingerprint:
                return True
        import shutil

        shutil.rmtree(out)
    elif os.path.exists(out):
        # a crashed derivation leaves a partial dir with no marker;
        # writers without mode('overwrite') would hard-fail on it
        import shutil

        shutil.rmtree(out)
    return False


def commit_derivation(out: str, marker_name: str, fingerprint: str) -> None:
    with open(f"{out}/{marker_name}", "w") as f:
        f.write(fingerprint + "\n")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown fixture table {name!r}; have {TABLE_NAMES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize events.ts to TIMESTAMP_NTZ regardless of fixture vintage.

    Fixture generations have stored ``ts`` differently:

    - parquet TIMESTAMP(NANOS): Spark has no native nanos type; with
      ``spark.sql.legacy.parquet.nanosAsLong`` (set by session.tune) it
      reads as epoch-nanos LongType, which we truncate to µs exactly
      like DuckDB's TIMESTAMP_NS -> TIMESTAMP cast (integer floor-div;
      fixtures are post-epoch so floor == truncate).
    - parquet timestamp[us] (current): reads natively as TIMESTAMP_NTZ
      (or TIMESTAMP depending on reader config) — pass through, casting
      to TIMESTAMP_NTZ for a stable schema.

    Sniffing the materialized type (instead of assuming one vintage)
    keeps every events-dependent operator working across fixture
    regenerations; tests/test_fixtures.py guards the admissible set.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    raw = spark.read.parquet(table_path(sf_dir, "events"))
    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        # epoch-nanos via nanosAsLong → truncate to µs
        return raw.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)")
        )
    # native timestamp (µs) — normalize to NTZ; no-op if already NTZ
    return raw.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


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
