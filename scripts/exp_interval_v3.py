"""A/B experiment: join_interval_binned v2 (per-second pre-agg +
2-bin equi-join) vs v3 (dense-second prefix-sum difference).

v3 idea: count/sum over a CONTIGUOUS second range is a difference of
prefix sums over the dense per-second aggregate — O(1) lookups per
incident instead of ~1200 candidate rows. The dense axis is bounded
by wall-clock span (seconds in the corpus window), not by data size,
so at 100 TB the cum table is still aggregate-sized. Boundary seconds
keep the exact-timestamp equi-join.

Usage: python scripts/exp_interval_v3.py [sf_dir] (defaults to the
x100 amplified dir). Prints timings + row-count/hash agreement.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_webhooks_spark import registry
from data_webhooks_spark.io import Tables
from data_webhooks_spark.norms import MONEY_SCALE, _scaled_units
from data_webhooks_spark.session import get_spark

_IB_BIN_S = 600
SHARDS = 64


def v3(spark, sf_dir):
    t = Tables(spark, sf_dir)
    ev = t.events
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("t0"),
        F.unix_timestamp("ts").alias("s0"),
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("ts").alias("p_ts"),
        F.unix_timestamp("ts").alias("psec"),
        _scaled_units(F.col("value"), MONEY_SCALE).alias("units"),
    )
    pur_sec = pur.groupBy("psec").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("units").cast("long").alias("u"),
    )
    bounds = pur.agg(
        F.min("psec").alias("smin"), F.max("psec").alias("smax")
    )
    spine = bounds.select(
        F.explode(F.sequence("smin", "smax")).alias("sec")
    )
    dense = spine.join(
        pur_sec, spine["sec"] == pur_sec["psec"], "left"
    ).select(
        "sec",
        F.coalesce("n", F.lit(0)).cast("long").alias("n0"),
        F.coalesce("u", F.lit(0)).cast("long").alias("u0"),
    )
    # sharded two-pass prefix sum over the bounded second axis
    dense = dense.crossJoin(F.broadcast(bounds)).withColumn(
        "shard",
        F.least(
            F.lit(SHARDS - 1),
            F.expr(f"(sec - smin) * {SHARDS} div (smax - smin + 1)"),
        ),
    )
    wloc = (
        Window.partitionBy("shard")
        .orderBy("sec")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = dense.select(
        "sec",
        "shard",
        F.sum("n0").over(wloc).alias("ln"),
        F.sum("u0").over(wloc).alias("lu"),
    )
    totals = local.groupBy("shard").agg(
        F.max("ln").alias("tn"), F.max("lu").alias("tu")
    )
    woff = (
        Window.orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.select(
        "shard",
        F.coalesce(F.sum("tn").over(woff), F.lit(0)).alias("on_"),
        F.coalesce(F.sum("tu").over(woff), F.lit(0)).alias("ou"),
    )
    cum = local.join(F.broadcast(offs), "shard").select(
        "sec",
        (F.col("ln") + F.col("on_")).cast("long").alias("cn"),
        (F.col("lu") + F.col("ou")).cast("long").alias("cu"),
    )
    # interior = cum(min(s0+599, smax)) - cum(max(s0, smin-1))
    e = err.crossJoin(F.broadcast(bounds)).select(
        "incident_id",
        "t0",
        "s0",
        F.least(F.col("s0") + _IB_BIN_S - 1, F.col("smax")).alias("hi"),
        F.greatest(F.col("s0"), F.col("smin") - 1).alias("lo"),
    )
    chi = cum.select(
        F.col("sec").alias("hi"),
        F.col("cn").alias("cn_hi"),
        F.col("cu").alias("cu_hi"),
    )
    clo = cum.select(
        F.col("sec").alias("lo"),
        F.col("cn").alias("cn_lo"),
        F.col("cu").alias("cu_lo"),
    )
    interior = (
        e.join(chi, "hi", "left")
        .join(clo, "lo", "left")
        .select(
            "incident_id",
            "t0",
            "s0",
            (
                F.coalesce("cn_hi", F.lit(0))
                - F.coalesce("cn_lo", F.lit(0))
            ).alias("n"),
            (
                F.coalesce("cu_hi", F.lit(0))
                - F.coalesce("cu_lo", F.lit(0))
            ).alias("u"),
        )
    )
    boundary = (
        err.select(
            "incident_id",
            "t0",
            F.explode(
                F.array(F.col("s0"), F.col("s0") + _IB_BIN_S)
            ).alias("psec"),
        )
        .join(pur, "psec")
        .filter(
            (F.col("p_ts") >= F.col("t0"))
            & (F.col("p_ts") < F.col("t0") + F.expr("INTERVAL 10 MINUTES"))
        )
        .groupBy("incident_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("bn"),
            F.sum("units").cast("long").alias("bu"),
        )
    )
    out = (
        interior.join(boundary, "incident_id", "left")
        .select(
            "incident_id",
            (F.col("n") + F.coalesce("bn", F.lit(0))).alias("n_purchases"),
            (
                (F.col("u") + F.coalesce("bu", F.lit(0))).cast("double")
                / F.lit(10**MONEY_SCALE)
            ).alias("sum_value"),
        )
        .filter(F.col("n_purchases") > 0)
    )
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.runtime/scale/x100"
    spark = get_spark("interval-v3-exp")
    qs = registry.queries()

    def timed(fn, label):
        fn().toPandas()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            pdf = fn().toPandas()
            best = min(best, time.perf_counter() - t0)
        print(label, round(best, 3), "s", len(pdf), "rows")
        return pdf

    a = timed(lambda: qs["join_interval_binned"](spark, sf_dir), "v2")
    b = timed(lambda: v3(spark, sf_dir), "v3")
    a = a.sort_values("incident_id").reset_index(drop=True)
    b = b.sort_values("incident_id").reset_index(drop=True)
    same = len(a) == len(b) and (
        (a["incident_id"] == b["incident_id"]).all()
        and (a["n_purchases"] == b["n_purchases"]).all()
        and ((a["sum_value"] - b["sum_value"]).abs() < 1e-9).all()
    )
    print("AGREE:", same)
    spark.stop()


if __name__ == "__main__":
    main()
