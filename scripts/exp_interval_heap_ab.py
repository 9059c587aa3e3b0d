"""A/B: join_interval at x100 — SMJ (shipped plan) vs SHJ hint,
under a given driver heap. One PROCESS per heap size (driver memory
is fixed at JVM launch), interleaved strategy runs inside it, fresh
DataFrame lineage + clearCache per timed run so stage-skip reuse
can't flatter a repeat (the r11 honest-measurement rule).

Context: the wave-3 x100 sweep read join_interval at 86 s while an
idle one-off read 23 s; the r12 hypothesis is 8g-heap GC churn on a
60 M-row shuffle across 32 threads, not a plan defect. This script
separates heap noise from plan cost.

Usage: SPARK_GRAFT_DRIVER_MEM=8g python scripts/exp_interval_heap_ab.py [runs]
Prints one JSON line: {"heap": ..., "smj": [...], "shj": [...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_webhooks_spark.io import Tables
from data_webhooks_spark.norms import dec_sum
from data_webhooks_spark.operators.joins import join_interval
from data_webhooks_spark.session import get_spark

SF = "/root/repo/.runtime/scale/x100"


def shj_variant(spark, sf_dir):
    t = Tables(spark, sf_dir)
    j = t.lineitem.join(
        t.orders.hint("shuffle_hash"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    j = j.filter(
        (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    )
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_shipped_30d"),
        dec_sum("l_extendedprice", "sum_price"),
    )


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("dws-interval-ab")
    heap = spark.conf.get("spark.driver.memory", "?")
    out = {"heap": heap, "smj": [], "shj": []}
    # warm the scan cache once so run 1 isn't charged for cold I/O
    join_interval(spark, SF).count()
    for _ in range(runs):
        for name, fn in (("smj", join_interval), ("shj", shj_variant)):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, SF).count()
            out[name].append(round(time.time() - t0, 2))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
