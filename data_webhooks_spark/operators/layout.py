"""Storage-layout operators: the two techniques that define 100 TB
table design (SCALE.md), exercised as first-class, oracle-checked
operators rather than prose.

- ``sink_partitioned_parquet``: write events hive-partitioned by day,
  read back with a day filter — the scan must prune to the matching
  partition directories (PartitionFilters), which is what makes a
  100 TB time-series table queryable. Result (an agg over 3 days)
  is DuckDB-verified against the unpartitioned source.
- ``join_bucketed``: orders and customer persisted bucketed by the
  join key; the join then requires NO exchange on either side — at
  100 TB this is the difference between a co-located join and
  shuffling the two largest tables in the warehouse. DuckDB-verified
  against the plain join.

Layouts are written once per scale factor under .runtime (content
derives deterministically from the fixtures; a marker file skips
rewrites). Plan properties are asserted in tests/test_plans.py.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..io import Tables
from ..norms import dec_sum, o_dec_sum
from ..regutil import registrar

QUERIES: dict = {}
ORACLE: dict = {}
op = registrar(QUERIES, ORACLE)

RUNTIME_DIR = "/root/repo/.runtime"


def _sf_name(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/"))


def partitioned_events_path(spark, sf_dir: str) -> str:
    """events written hive-partitioned by event_date (once per sf)."""
    out = f"{RUNTIME_DIR}/layout/{_sf_name(sf_dir)}/events_by_day"
    marker = f"{out}/_done"
    if not os.path.exists(marker):
        t = Tables(spark, sf_dir)
        (
            t.events.withColumn("event_date", F.to_date("ts"))
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(out)
        )
        with open(marker, "w") as f:
            f.write("ok\n")
    return out


@op(
    "sink_partitioned_parquet",
    sql="""
    SELECT CAST(ts AS DATE) AS event_date, event_type, COUNT(*) AS n
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2025-01-02' AND DATE '2025-01-04'
    GROUP BY 1, 2
    """,
)
def sink_partitioned_parquet(spark, sf_dir):
    """Day-partitioned write + partition-pruned read-back: the filter
    prunes whole directories before any file I/O (PartitionFilters in
    the plan — asserted in test_plans). At 100 TB, date partitioning
    is what bounds a time-windowed query to touched days."""
    path = partitioned_events_path(spark, sf_dir)
    df = spark.read.parquet(path)
    return (
        df.filter(
            F.col("event_date").between("2025-01-02", "2025-01-04")
        )
        .groupBy("event_date", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bucketed_tables(spark, sf_dir: str) -> tuple[str, str]:
    """orders/customer persisted bucketed by the join key (once per sf).

    Bucketing fixes each table's physical distribution at write time;
    any future join/agg on the bucket key needs no shuffle. Bucket
    count 8 suits the fixtures — a cluster picks cores-scaled counts.
    """
    sf = _sf_name(sf_dir).replace(".", "_")
    o_name, c_name = f"orders_b_{sf}", f"customer_b_{sf}"
    t = Tables(spark, sf_dir)
    # External-table paths: bucket metadata lives in the (per-session,
    # in-memory) catalog, so each fresh session re-registers by
    # re-running saveAsTable — cheap at fixture scale, a one-time
    # warehouse write in production.
    for name, df, key in (
        (o_name, t.orders, "o_custkey"),
        (c_name, t.customer, "c_custkey"),
    ):
        if not spark.catalog.tableExists(name):
            (
                df.write.mode("overwrite")
                .option("path", f"{RUNTIME_DIR}/layout/bucketed/{name}")
                .bucketBy(8, key)
                .sortBy(key)
                .saveAsTable(name)
            )
    return o_name, c_name


@op(
    "join_bucketed",
    sql=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           {o_dec_sum('o_totalprice', 'segment_value')}
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_bucketed(spark, sf_dir):
    """Co-located join on pre-bucketed tables: zero exchanges below
    the final aggregation (asserted in test_plans) because both sides
    already share the bucket distribution on the join key."""
    o_name, c_name = bucketed_tables(spark, sf_dir)
    o, c = spark.table(o_name), spark.table(c_name)
    # disable broadcast for this plan: the point is the co-located
    # shuffle-free SortMergeJoin, exactly what a fact-fact join at
    # 100 TB (where neither side broadcasts) must produce.
    joined = o.hint("merge").join(c, o["o_custkey"] == c["c_custkey"])
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum("o_totalprice", "segment_value"),
    )
