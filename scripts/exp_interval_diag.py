"""Attribute join_interval's x100 run-to-run variance (14-93 s for an
identical plan on an idle host): per timed run, record wall time, the
JVM's GC-time delta and shuffle-write delta (local-mode executor REST
endpoint), and a single-core sha256 canary immediately after. If GC
delta tracks wall time -> heap churn; if GC is flat but wall varies
with canary stable -> I/O/scheduling; if the canary moves too -> host.

Usage: SPARK_GRAFT_DRIVER_MEM=8g python scripts/exp_interval_diag.py [runs]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_webhooks_spark.operators.joins import join_interval
from data_webhooks_spark.session import get_spark

SF = "/root/repo/.runtime/scale/x100"


def canary() -> float:
    t0 = time.perf_counter()
    h = hashlib.sha256(b"x")
    for _ in range(2_000_000):
        h.update(h.digest())
    return round(time.perf_counter() - t0, 3)


def exec_stats(spark) -> dict:
    """GC totals from the driver JVM's MX beans (local mode: the
    driver IS the executor; the UI/REST endpoint is disabled in the
    shipped session config, so beans are the ground truth)."""
    mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
    gc_ms = 0
    counts = 0
    for bean in mf.getGarbageCollectorMXBeans():
        gc_ms += bean.getCollectionTime()
        counts += bean.getCollectionCount()
    mem = mf.getMemoryMXBean().getHeapMemoryUsage()
    return {"gc_ms": gc_ms, "gc_n": counts, "heap_used_gb": mem.getUsed() / 1e9}


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("dws-interval-diag")
    heap = spark.conf.get("spark.driver.memory", "?")
    join_interval(spark, SF).count()  # warm
    prev = exec_stats(spark)
    out = []
    for i in range(runs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        join_interval(spark, SF).count()
        wall = round(time.perf_counter() - t0, 2)
        cur = exec_stats(spark)
        out.append(
            {
                "run": i,
                "wall_s": wall,
                "gc_s": round((cur["gc_ms"] - prev["gc_ms"]) / 1000, 2),
                "gc_n": cur["gc_n"] - prev["gc_n"],
                "heap_used_gb": round(cur["heap_used_gb"], 2),
                "canary_s": canary(),
            }
        )
        prev = cur
        print(json.dumps(out[-1]), flush=True)
    print(json.dumps({"heap": heap, "runs": out}), flush=True)


if __name__ == "__main__":
    main()
