"""Semantic property tests for the round-4 operator additions —
invariants the DuckDB hash-parity check can't express (partitioning
independence, numpy re-derivations, structural interval laws, physical
file layout).
"""

import glob
import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_webhooks_spark import registry
from data_webhooks_spark.io import Tables

QUERIES = registry.queries()


def test_heavy_hitters_partition_independent(spark, sf_dir):
    """The Misra-Gries candidate set depends on partitioning/batch
    order, but the recounted output must not: shattering the token
    stream across many small partitions yields the identical report."""
    from data_webhooks_spark.operators.text import (
        _MG_K,
        _tokens,
    )
    import pandas as pd

    t = Tables(spark, sf_dir)
    words = (
        t.documents.select(F.explode(_tokens()).alias("word"))
        .repartition(37)  # adversarial: nothing like the natural layout
    )

    def mg_candidates(batches):
        s = pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf["word"].value_counts()
            s = s.add(vc, fill_value=0).astype("int64") if len(s) else vc
            if len(s) > _MG_K:
                cut = s.sort_values(ascending=False).iloc[_MG_K]
                s = s[s > cut] - cut
        yield pd.DataFrame({"word": s.index.astype(str)})

    cands = words.mapInPandas(mg_candidates, "word string").distinct()
    total = words.agg(F.count(F.lit(1)).alias("total"))
    shattered = {
        (r["word"], r["n_occurrences"])
        for r in words.join(F.broadcast(cands), "word")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(total)
        .filter(F.col("n_occurrences") * 100 >= F.col("total"))
        .collect()
    }
    canonical = {
        (r["word"], r["n_occurrences"])
        for r in QUERIES["text_heavy_hitters"](spark, sf_dir).collect()
    }
    assert shattered == canonical and len(canonical) > 0


def test_mg_guarantee_survives_adversarial_stream():
    """Pure-python check of the bound the operator's docstring claims:
    after Misra-Gries with k counters over any stream, every item with
    true count > n/(k+1) retains a counter. Adversarial stream: one
    heavy item drip-fed among floods of distinct noise."""
    import pandas as pd

    k = 9
    stream = []
    for burst in range(30):
        stream.append("heavy")
        stream += [f"noise_{burst}_{i}" for i in range(8)]
    n = len(stream)  # 270; heavy count 30 > 270/10 = 27
    s = pd.Series(dtype="int64")
    for start in range(0, n, 7):  # uneven batches
        vc = pd.Series(stream[start : start + 7]).value_counts()
        s = s.add(vc, fill_value=0).astype("int64") if len(s) else vc
        if len(s) > k:
            cut = s.sort_values(ascending=False).iloc[k]
            s = s[s > cut] - cut
    assert "heavy" in s.index


def test_ewma_matches_numpy_recomputation(spark, sf_dir):
    """Re-derive a busy user's EWMA frame-by-frame in numpy from the
    raw events and compare to the operator's output."""
    t = Tables(spark, sf_dir)
    busy = (
        t.events.groupBy("user_id")
        .count()
        .orderBy(F.col("count").desc(), "user_id")
        .first()["user_id"]
    )
    rows = (
        t.events.filter(F.col("user_id") == busy)
        .select("event_id", "ts", "value")
        .orderBy("ts", "event_id")
        .collect()
    )
    vals = np.array([r["value"] for r in rows])
    w = np.array([0.7**j for j in range(8)])
    got = {
        r["event_id"]: r["ewma"]
        for r in QUERIES["ts_ewma"](spark, sf_dir)
        .filter(F.col("user_id") == busy)
        .collect()
    }
    assert len(got) == len(vals) - 7
    for i in range(7, len(vals)):
        frame_newest_first = vals[i - 7 : i + 1][::-1]
        expect = float((frame_newest_first * w).sum() / w.sum())
        assert math.isclose(got[rows[i]["event_id"]], expect, abs_tol=1e-6)


def test_anomaly_mad_flags_are_the_tail(spark, sf_dir):
    """Every flagged event must exceed the per-type cut recomputed
    from scratch, and no unflagged event may (completeness)."""
    t = Tables(spark, sf_dir)
    flagged = QUERIES["ts_anomaly_mad"](spark, sf_dir).collect()
    assert len(flagged) > 0
    vals = {}
    for r in t.events.select("event_type", "event_id", "value").collect():
        vals.setdefault(r["event_type"], []).append((r["event_id"], r["value"]))
    flagged_ids = {r["event_id"] for r in flagged}
    for et, pairs in vals.items():
        v = np.array([p[1] for p in pairs])
        med = float(np.percentile(v, 50, method="linear"))
        mad = float(np.percentile(np.abs(v - med), 50, method="linear"))
        cut = 3.0 * 1.4826 * mad
        for eid, x in pairs:
            assert (abs(x - med) > cut) == (eid in flagged_ids), (et, eid)


def test_scd2_interval_laws(spark, sf_dir):
    """Structural invariants of the SCD2 build: per key, exactly one
    current row; intervals tile [1, current) without gaps or overlap;
    consecutive intervals differ in at least one attribute."""
    rows = QUERIES["dim_scd2"](spark, sf_dir).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["c_custkey"], []).append(r)
    assert by_key
    for key, ivs in by_key.items():
        ivs.sort(key=lambda r: r["valid_from"])
        assert sum(1 for r in ivs if r["is_current"]) == 1
        assert ivs[0]["valid_from"] == 1
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"], key  # contiguous
            assert (a["segment"], a["bal"]) != (b["segment"], b["bal"]), key
        assert ivs[-1]["valid_to"] is None


def test_compaction_file_count_on_disk(spark, sf_dir):
    """compact_files' in-plan boolean is backed by the actual layout:
    the compacted dir holds exactly 4 data files, the fragmented 64."""
    from data_webhooks_spark.operators.layout import (
        compacted_events_path,
        fragmented_events_path,
    )

    frag = fragmented_events_path(spark, sf_dir)
    comp = compacted_events_path(spark, sf_dir)
    n_frag = len(glob.glob(os.path.join(frag, "part-*.parquet")))
    n_comp = len(glob.glob(os.path.join(comp, "part-*.parquet")))
    assert n_frag == 64 and n_comp == 4


def test_zorder_files_cover_less_than_time_sort(spark, sf_dir):
    """Clustering quality: the 2-D box query must touch at most half
    of the 8 z-ordered files (the in-plan locality_ok assertion), and
    the z-layout must hold the same row count as the source."""
    from data_webhooks_spark.operators.layout import zordered_events_path

    t = Tables(spark, sf_dir)
    path = zordered_events_path(spark, sf_dir)
    z = spark.read.parquet(path)
    assert z.count() == t.events.count()
    out = QUERIES["zorder_layout"](spark, sf_dir).collect()
    assert out and all(r["locality_ok"] for r in out)


def test_profile_matches_pandas(spark, sf_dir):
    """profile_table's distinct/null counts re-derived with pandas."""
    t = Tables(spark, sf_dir)
    pdf = t.orders.toPandas()
    prof = {
        r["column_name"]: r
        for r in QUERIES["profile_table"](spark, sf_dir).collect()
    }
    for c in pdf.columns:
        assert prof[c]["n_rows"] == len(pdf)
        assert prof[c]["n_nulls"] == int(pdf[c].isna().sum())
        assert prof[c]["n_distinct"] == int(pdf[c].dropna().nunique())


def test_merge_upsert_arms(spark, sf_dir):
    """Row accounting across the three MERGE arms: updates flagged,
    pass-throughs unflagged and byte-identical to the target, inserts
    key-shifted beyond the target key space."""
    t = Tables(spark, sf_dir)
    n_cust = t.customer.count()
    out = QUERIES["merge_upsert"](spark, sf_dir)
    base = out.filter(F.col("c_custkey") < 1000000)
    ins = out.filter(F.col("c_custkey") >= 1000000)
    assert base.count() == n_cust
    n_touched = base.filter("was_updated").count()
    expect_touched = t.customer.filter(
        (F.col("c_custkey") % 7 == 0) | (F.col("c_custkey") % 11 == 0)
    ).count()
    assert n_touched == expect_touched
    assert ins.count() == t.customer.filter(F.col("c_custkey") % 11 == 0).count()


def test_gapfill_grid_is_dense(spark, sf_dir):
    """The resampled grid must be a full hours x types rectangle with
    gap rows present at n_events=0, and per-type totals preserved."""
    out = QUERIES["ts_resample_gapfill"](spark, sf_dir)
    t = Tables(spark, sf_dir)
    n_types = t.events.select("event_type").distinct().count()
    hours = out.select("hour").distinct().count()
    assert out.count() == hours * n_types
    assert out.filter("n_events = 0").count() > 0
    got = {
        r["event_type"]: r["s"]
        for r in out.groupBy("event_type").agg(F.sum("n_events").alias("s")).collect()
    }
    want = {
        r["event_type"]: r["s"]
        for r in t.events.groupBy("event_type").agg(F.count("*").alias("s")).collect()
    }
    assert got == want


def test_repeated_substrings_finds_planted_duplicate(spark, tmp_path):
    """Plant a long shared passage inside two otherwise-different docs:
    the fingerprint sampler must report at least one shared gram from
    the passage (content-defined selection is alignment-invariant —
    the copies sit at different offsets on purpose), and a corpus of
    fully-distinct docs must report nothing."""
    import pandas as pd

    passage = "the quick brown fox jumps over the lazy dog again and again"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma " + passage + " delta",
                "unrelated prefix words here " + passage,
                "completely different content with no overlap at all zzz",
            ],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [0, 0, 0],
        }
    )
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(f"{tmp_path}/documents.parquet")
    from data_webhooks_spark.registry import queries

    out = queries()["dedup_repeated_substrings"](spark, str(tmp_path)).collect()
    assert len(out) > 0
    assert all(r["n_docs"] == 2 for r in out)
    assert all(passage.find(r["gram"]) >= 0 for r in out)


def test_repetition_score_orders_boilerplate_above_prose(spark, tmp_path):
    """A doc that repeats one phrase must score far above a doc of
    distinct words, and scores must sit in [0, 1)."""
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                " ".join(["click here to subscribe now"] * 8),
                " ".join(f"word{i}" for i in range(40)),
            ],
            "lang": ["en"] * 2,
            "source": ["t"] * 2,
            "n_chars": [0, 0],
        }
    )
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(f"{tmp_path}/documents.parquet")
    from data_webhooks_spark.registry import queries

    rows = {
        r["doc_id"]: r
        for r in queries()["text_repetition_score"](spark, str(tmp_path)).collect()
    }
    assert rows[2]["rep_score"] == 0.0
    assert rows[1]["rep_score"] > 0.8
    assert 0.0 <= rows[1]["rep_score"] < 1.0


def test_psi_preconditions_and_ks_bounds(spark, sf_dir):
    """drift_psi's formula has a ln(p_cur/p_base) arm that diverges
    between engines on an empty bin (Spark log(0)=NULL, DuckDB
    ln(0)=-inf), so the operator's contract requires every decile bin
    populated on both sides — assert it holds on the fixture, and that
    both statistics land in their theoretical ranges."""
    from data_webhooks_spark.io import Tables
    import numpy as np

    t = Tables(spark, sf_dir)
    base = np.array(
        [r["value"] for r in t.events.filter("event_type='click'").select("value").collect()]
    )
    cur = np.array(
        [r["value"] for r in t.events.filter("event_type='purchase'").select("value").collect()]
    )
    edges = np.percentile(base, [10 * i for i in range(1, 10)], method="linear")
    for side in (base, cur):
        binned = np.searchsorted(edges, side, side="left")
        counts = np.bincount(binned, minlength=10)
        assert (counts > 0).all(), counts
    psi = QUERIES["drift_psi"](spark, sf_dir).collect()[0]
    assert psi["n_bins"] == 10 and psi["psi"] is not None and psi["psi"] >= 0.0
    ks = QUERIES["drift_ks_test"](spark, sf_dir).collect()[0]
    assert 0.0 <= ks["ks_stat"] <= 1.0
    assert ks["n_a"] > 0 and ks["n_b"] > 0


def test_ks_matches_numpy(spark, sf_dir):
    """Re-derive the two-sample KS statistic from raw values in numpy
    and compare against the operator (up to its 1e-6 quantization)."""
    from data_webhooks_spark.io import Tables

    t = Tables(spark, sf_dir)
    a = np.sort(
        [r["value"] for r in t.events.filter("event_type='purchase'").select("value").collect()]
    )
    b = np.sort(
        [r["value"] for r in t.events.filter("event_type='click'").select("value").collect()]
    )
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    d = float(np.abs(fa - fb).max())
    got = QUERIES["drift_ks_test"](spark, sf_dir).collect()[0]["ks_stat"]
    assert abs(got - d) < 2e-6, (got, d)


def test_repeated_substrings_short_docs_are_safe(spark, tmp_path):
    """Documents shorter than the gram length must contribute no
    positions (Spark's sequence(1, n) DESCENDS for n < 1 — without the
    length guard a short doc explodes garbage positions), and shared
    passages among the long docs must still be found."""
    import pandas as pd

    passage = "a long enough shared passage that repeats verbatim here"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["tiny", "x", "lead-in " + passage, passage + " trailer"],
            "lang": ["en"] * 4,
            "source": ["t"] * 4,
            "n_chars": [0] * 4,
        }
    )
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(f"{tmp_path}/documents.parquet")
    out = QUERIES["dedup_repeated_substrings"](spark, str(tmp_path)).collect()
    assert len(out) > 0
    assert all(r["n_docs"] == 2 for r in out)
    assert all(passage.find(r["gram"]) >= 0 for r in out)
