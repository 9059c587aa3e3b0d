"""Semantic invariants for the round-5 operator additions (the
DuckDB parity check is in test_parity; these pin the properties the
hash comparison can't express)."""

import pandas as pd

from data_webhooks_spark import registry

QUERIES = registry.queries()


def test_interpolate_values_bounded_by_neighbors(spark, sf_dir):
    """Every interpolated (unobserved) value must lie between its
    neighboring observed hourly means — the defining property of
    linear interpolation; and NULLs appear exactly outside the
    observed range of each type."""
    pdf = (
        QUERIES["ts_interpolate_linear"](spark, sf_dir)
        .toPandas()
        .sort_values(["event_type", "hour"])
    )
    assert (~pdf["observed"]).sum() > 0, "fixture has no gaps to fill"
    for _, g in pdf.groupby("event_type"):
        obs_vals = g["v_interp"].where(g["observed"])
        prev_v = obs_vals.ffill()
        next_v = obs_vals.bfill()
        gaps = g[~g["observed"] & g["v_interp"].notna()]
        lo = pd.concat([prev_v, next_v], axis=1).min(axis=1)[gaps.index]
        hi = pd.concat([prev_v, next_v], axis=1).max(axis=1)[gaps.index]
        assert ((gaps["v_interp"] >= lo - 1e-6) & (gaps["v_interp"] <= hi + 1e-6)).all()
        outside = g[~g["observed"] & g["v_interp"].isna()]
        if len(outside):
            first_obs = g[g["observed"]]["hour"].min()
            last_obs = g[g["observed"]]["hour"].max()
            assert (
                (outside["hour"] < first_obs) | (outside["hour"] > last_obs)
            ).all(), "interior gap left NULL"


def test_sample_weighted_proportional_and_deterministic(spark, sf_dir):
    """Kept counts must track the expected weight mass per type
    (E[n_kept] = sum(value)/500) and be identical across runs —
    hash-decided sampling has no RNG variance between invocations."""
    from pyspark.sql import functions as F

    from data_webhooks_spark.io import Tables

    got = {
        r["event_type"]: r["n_kept"]
        for r in QUERIES["sample_weighted"](spark, sf_dir).collect()
    }
    again = {
        r["event_type"]: r["n_kept"]
        for r in QUERIES["sample_weighted"](spark, sf_dir).collect()
    }
    assert got == again, "weighted sample must be re-run stable"
    t = Tables(spark, sf_dir)
    expect = {
        r["event_type"]: r["s"] / 500.0
        for r in t.events.groupBy("event_type")
        .agg(F.sum("value").alias("s"))
        .collect()
    }
    for et, exp in expect.items():
        assert abs(got.get(et, 0) - exp) <= 0.1 * exp + 5, (et, got.get(et), exp)


def test_histogram_masses_sum_to_rowcount(spark, sf_dir):
    """Bin counts per type must partition the type's rows exactly, and
    every bin index must be in [0, 20)."""
    from pyspark.sql import functions as F

    from data_webhooks_spark.io import Tables

    pdf = QUERIES["agg_histogram"](spark, sf_dir).toPandas()
    assert pdf["bin"].between(0, 19).all()
    t = Tables(spark, sf_dir)
    totals = {
        r["event_type"]: r["n"]
        for r in t.events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    got = pdf.groupby("event_type")["n"].sum().to_dict()
    assert got == totals


def test_pattern_match_counts_consecutive_only(spark, sf_dir):
    """Recompute the strict-sequence count in pandas for a sample of
    matched users: each reported match must be a consecutive
    view->click->purchase triple in (ts, event_id) order."""
    from data_webhooks_spark.io import Tables

    rows = QUERIES["win_pattern_match"](spark, sf_dir).collect()
    assert rows, "no pattern matches at this SF"
    sample_users = [r["user_id"] for r in rows[:20]]
    reported = {r["user_id"]: r["n_matches"] for r in rows}
    from pyspark.sql import functions as F

    t = Tables(spark, sf_dir)
    ev = (
        t.events.filter(F.col("user_id").isin(sample_users))
        .select("user_id", "ts", "event_id", "event_type")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    for uid, g in ev.groupby("user_id"):
        ets = g["event_type"].tolist()
        n = sum(
            1
            for i in range(len(ets) - 2)
            if ets[i : i + 3] == ["view", "click", "purchase"]
        )
        assert n == reported[uid], (uid, n, reported[uid])
