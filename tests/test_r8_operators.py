"""Semantic invariants for the round-7 later waves (F: cdc_apply_log,
dq_referential, ts_cross_correlation, text_zipf_fit,
graph_degree_stats, basket_lift; G: embed_centroid_outliers,
event_sequence_ngrams, text_ngram_novelty; H: scan_csv_corrupt,
funnel_step_latency, stream_cdc_apply): each operator gets an
oracle-independent rederivation in pure Python/pandas/numpy — the
third way that catches a bug shared by the Spark query and its DuckDB
oracle (the r4 zero-row lesson) — and stream_cdc_apply is pinned
equal to its batch twin across the chunked replay."""

import math
from collections import Counter
from itertools import combinations

import numpy as np
import pandas as pd

from data_webhooks_spark import registry

QUERIES = registry.queries()
ORACLE = registry.oracle_sql()


def _events(spark, sf_dir):
    from data_webhooks_spark.io import Tables

    return Tables(spark, sf_dir).events.toPandas()


def test_cdc_apply_log_matches_sequential_replay(spark, sf_dir):
    """The aggregate formulation must equal an ACTUAL sequential
    replay of each user's op log: fold ops in (ts, event_id) order,
    tombstone on 'error', upsert otherwise."""
    got = (
        QUERIES["cdc_apply_log"](spark, sf_dir)
        .toPandas()
        .set_index("user_id")
    )
    ev = _events(spark, sf_dir).sort_values(["ts", "event_id"])
    assert len(got) == ev["user_id"].nunique()
    for uid, g in ev.groupby("user_id"):
        state = None  # None = absent; else the current value
        n_del = 0
        for _, r in g.iterrows():
            if r["event_type"] == "error":
                state, n_del = None, n_del + 1
            else:
                state = r["value"]
        row = got.loc[uid]
        assert row["n_ops"] == len(g), uid
        assert row["n_deletes"] == n_del, uid
        assert bool(row["alive"]) == (state is not None), uid
        if state is None:
            assert pd.isna(row["final_value"]), uid
        else:
            assert row["final_value"] == state, uid
        assert row["last_ts"] == g["ts"].max(), uid


def test_dq_referential_matches_set_arithmetic(spark, sf_dir):
    """Rederive every FK edge with raw pandas set difference; the
    fixture is referentially intact, so the audit must say so with
    the exact child/key cardinalities (a zero-orphan report computed
    wrong would be invisible to the oracle — both sides would agree)."""
    from data_webhooks_spark.io import Tables
    from data_webhooks_spark.operators.profiling import _FK_EDGES

    got = QUERIES["dq_referential"](spark, sf_dir).toPandas().set_index("fk")
    t = Tables(spark, sf_dir)
    assert len(got) == len(_FK_EDGES)
    for fk, child, ck, parent, pk in _FK_EDGES:
        ckeys = getattr(t, child).select(ck).toPandas()[ck].dropna()
        pkeys = set(getattr(t, parent).select(pk).toPandas()[pk])
        orphan_keys = set(ckeys) - pkeys
        row = got.loc[fk]
        assert row["n_child"] == len(ckeys), fk
        assert row["n_keys"] == ckeys.nunique(), fk
        assert row["n_orphan_keys"] == len(orphan_keys), fk
        assert row["n_orphan_rows"] == ckeys.isin(orphan_keys).sum(), fk
        assert row["orphan_rate"] == 0.0, fk


def test_cross_correlation_matches_numpy(spark, sf_dir):
    """np.corrcoef over pandas-derived hourly series must agree with
    the integer-moment Pearson at every lag (1e-5: the operator
    quantizes to 1e-6)."""
    got = (
        QUERIES["ts_cross_correlation"](spark, sf_dir)
        .toPandas()
        .set_index("lag")
        .sort_index()
    )
    ev = _events(spark, sf_dir)
    ev["h"] = ev["ts"].dt.floor("h")
    x = ev[ev["event_type"] == "click"].groupby("h").size()
    y = ev[ev["event_type"] == "purchase"].groupby("h").size()
    assert list(got.index) == list(range(7))
    for lag in range(7):
        ys = y.copy()
        ys.index = ys.index - pd.Timedelta(hours=lag)
        j = pd.concat([x, ys], axis=1, join="inner")
        assert got.loc[lag, "n_hours"] == len(j), lag
        want = np.corrcoef(j.iloc[:, 0], j.iloc[:, 1])[0, 1]
        assert abs(got.loc[lag, "xcorr"] - want) < 1e-5, lag


def test_zipf_fit_matches_numpy_ols(spark, sf_dir):
    """np.polyfit on (ln rank, ln freq) of the Counter-derived top-200
    must reproduce slope/intercept, and R² must equal the squared
    sample correlation — both within the 1e-6 input-quantization
    budget (1e-4 tolerance)."""
    got = QUERIES["text_zipf_fit"](spark, sf_dir).toPandas().iloc[0]
    from data_webhooks_spark.io import Tables

    docs = Tables(spark, sf_dir).documents.toPandas()
    c = Counter(w for t in docs["text"] for w in t.split(" "))
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    xs = np.log(np.arange(1, len(top) + 1))
    ys = np.log([n for _, n in top])
    slope, intercept = np.polyfit(xs, ys, 1)
    r2 = np.corrcoef(xs, ys)[0, 1] ** 2
    assert got["n_terms"] == len(top)
    assert abs(got["zipf_slope"] - slope) < 1e-4
    assert abs(got["intercept"] - intercept) < 1e-4
    assert abs(got["r2"] - r2) < 1e-4
    assert got["zipf_slope"] < 0  # frequency decays with rank
    assert 0.0 <= got["r2"] <= 1.0


def test_degree_stats_matches_counter(spark, sf_dir):
    """Rebuild the co-purchase graph with a pandas self-merge and a
    Counter; the distribution must match exactly, the cumulative must
    telescope to |V|, shares must sum to 1, and Σ degree·n_nodes must
    be 2|E| (the handshake lemma — an orientation bug breaks it)."""
    from data_webhooks_spark.io import Tables

    got = (
        QUERIES["graph_degree_stats"](spark, sf_dir)
        .toPandas()
        .sort_values("degree")
        .reset_index(drop=True)
    )
    li = Tables(spark, sf_dir).lineitem.select(
        "l_orderkey", "l_partkey"
    ).toPandas()
    m = li.merge(li, on="l_orderkey")
    m = m[m["l_partkey_x"] != m["l_partkey_y"]]
    edges = set(
        zip(
            np.minimum(m["l_partkey_x"], m["l_partkey_y"]),
            np.maximum(m["l_partkey_x"], m["l_partkey_y"]),
        )
    )
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    dist = Counter(deg.values())
    assert dict(zip(got["degree"], got["n_nodes"])) == dict(dist)
    assert list(got["cum_nodes"]) == list(got["n_nodes"].cumsum())
    assert got["cum_nodes"].iloc[-1] == len(deg)
    assert abs(got["pct_nodes"].sum() - 1.0) < 1e-3
    assert (got["degree"] * got["n_nodes"]).sum() == 2 * len(edges)


def test_basket_lift_matches_itertools(spark, sf_dir):
    """Recount pair/item supports with itertools.combinations over
    per-order brand sets; lift must equal the recomputed ratio and
    the support/confidence identities must hold row-wise."""
    from data_webhooks_spark.io import Tables

    got = QUERIES["basket_lift"](spark, sf_dir).toPandas()
    t = Tables(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_partkey").toPandas()
    part = t.part.select("p_partkey", "p_brand").toPandas()
    items = li.merge(
        part, left_on="l_partkey", right_on="p_partkey"
    )[["l_orderkey", "p_brand"]].drop_duplicates()
    n_baskets = items["l_orderkey"].nunique()
    item_n = items.groupby("p_brand").size()
    pair_n = Counter()
    for _, g in items.groupby("l_orderkey"):
        for a, b in combinations(sorted(g["p_brand"]), 2):
            pair_n[(a, b)] += 1
    want = {p: n for p, n in pair_n.items() if n >= 2}
    assert len(got) == len(want)
    for _, r in got.iterrows():
        key = (r["item_a"], r["item_b"])
        assert r["item_a"] < r["item_b"], key
        assert r["n_pair"] == want[key], key
        assert r["n_a"] == item_n[r["item_a"]], key
        assert r["n_b"] == item_n[r["item_b"]], key
        lift = r["n_pair"] * n_baskets / (r["n_a"] * r["n_b"])
        assert abs(r["lift"] - lift) < 1e-5, key
        assert abs(r["support"] - r["n_pair"] / n_baskets) < 1e-5, key
        assert abs(r["conf_a_b"] - r["n_pair"] / r["n_a"]) < 1e-5, key


def test_wave_keys_registered_with_oracles():
    """Every wave key is registry-live with a SQL oracle (the driver
    contract) — catches a missed @op registration at commit time."""
    for k in [
        "cdc_apply_log",
        "dq_referential",
        "ts_cross_correlation",
        "text_zipf_fit",
        "graph_degree_stats",
        "basket_lift",
        "embed_centroid_outliers",
        "event_sequence_ngrams",
        "text_ngram_novelty",
        "scan_csv_corrupt",
        "funnel_step_latency",
        "stream_cdc_apply",
        "embed_pca_power",
        "text_feature_hash",
        "dq_reconciliation",
        "scan_parquet_metadata",
        "embed_pair_mining",
        "stream_hll_distinct",
        "filter_exists_correlated",
        "filter_not_in_vs_not_exists",
        "dq_observe",
        "pipeline_dedup_prep",
    ]:
        assert k in QUERIES and k in ORACLE, k


def test_centroid_outliers_match_numpy(spark, sf_dir):
    """Full numpy rederivation of the quantized-unit pipeline:
    component units, integer centroid sums, exact integer dots with
    TRUNCATING division (Spark div and DuckDB // both round toward
    zero; python // floors, so the replay must truncate), per-label
    moments, quantized z — the outlier row set must match exactly."""
    got = (
        QUERIES["embed_centroid_outliers"](spark, sf_dir)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    from data_webhooks_spark.io import Tables

    emb = Tables(spark, sf_dir).embeddings.toPandas()
    xu = np.floor(
        np.stack([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
        * 1e4
        + 0.5
    ).astype(np.int64)
    out = {}
    for lab, idx in emb.groupby("label").groups.items():
        rows = xu[np.asarray(idx)]
        cu = rows.sum(axis=0)
        n = len(rows)
        du = (rows * cu).sum(axis=1)
        dv = np.trunc(du / (n * 10000)).astype(np.int64)
        mean, sd = dv.mean(), dv.std(ddof=1)
        zq = np.floor((dv - mean) / sd * 1e4 + 0.5) / 1e4
        for vid, d, z in zip(emb["vec_id"].iloc[idx], dv, zq):
            if z < -2:
                out[vid] = (lab, d / 1e4, z)
    assert set(got.index) == set(out)
    for vid, (lab, align, z) in out.items():
        row = got.loc[vid]
        assert row["label"] == lab and abs(row["alignment"] - align) < 1e-9
        assert abs(row["z_align"] - z) < 1e-9, vid


def test_sequence_ngrams_match_counter(spark, sf_dir):
    """Counter replay over per-user (ts, event_id)-sorted streams;
    the top-20 with (count desc, journey) ordering must reproduce."""
    got = QUERIES["event_sequence_ngrams"](spark, sf_dir).toPandas()
    ev = _events(spark, sf_dir).sort_values(["ts", "event_id"])
    occ, users = Counter(), {}
    for uid, g in ev.groupby("user_id"):
        ts = list(g["event_type"])
        for a, b, c in zip(ts, ts[1:], ts[2:]):
            j = f"{a}>{b}>{c}"
            occ[j] += 1
            users.setdefault(j, set()).add(uid)
    top = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(got["journey"]) == [j for j, _ in top]
    assert list(got["n_occurrences"]) == [n for _, n in top]
    assert list(got["n_users"]) == [len(users[j]) for j, _ in top]


def test_ngram_novelty_streaming_replay(spark, sf_dir):
    """Replay ingestion in doc_id order with a running seen-set; the
    per-doc novel share must match, and the identity Σ n_novel =
    |distinct corpus trigrams| must hold (each gram is novel exactly
    once)."""
    got = (
        QUERIES["text_ngram_novelty"](spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
    )
    from data_webhooks_spark.io import Tables

    docs = (
        Tables(spark, sf_dir)
        .documents.select("doc_id", "text")
        .toPandas()
        .sort_values("doc_id")
    )
    seen = set()
    for _, r in docs.iterrows():
        ws = r["text"].split(" ")
        grams = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
        if not grams:
            assert r["doc_id"] not in got.index
            continue
        novel = grams - seen
        seen |= grams
        row = got.loc[r["doc_id"]]
        assert row["n_grams"] == len(grams), r["doc_id"]
        assert row["n_novel"] == len(novel), r["doc_id"]
        assert abs(row["novelty_rate"] - len(novel) / len(grams)) < 1e-6
    assert got["n_novel"].sum() == len(seen)


def test_csv_corrupt_quarantine_and_pruning_trap(spark, sf_dir):
    """(a) File-level replay: re-read the corrupt CSV with plain
    Python; rows whose key field is mangled must land in
    '__corrupt__' with their values excluded from totals, clean rows
    must match segment-wise. (b) Pin the column-pruning trap the
    operator exists to document: the SAME read aggregated WITHOUT
    referencing c_custkey never parses the bad token, so zero rows
    quarantine — if Spark ever changes this, the operator's comment
    (and this pin) must change with it."""
    from pyspark.sql import functions as F

    from data_webhooks_spark.sources.derived import (
        CUSTOMER_CSV_SPARK_SCHEMA,
        derived_path,
    )

    got = (
        QUERIES["scan_csv_corrupt"](spark, sf_dir)
        .toPandas()
        .set_index("bucket")
    )
    path = derived_path(sf_dir, "customer_corrupt.csv")
    n_by, sum_by = Counter(), Counter()
    with open(path, encoding="utf-8") as f:
        next(f)
        for line in f:
            parts = line.rstrip("\n").split(",")
            if parts[0].startswith("x"):
                n_by["__corrupt__"] += 1
            else:
                n_by[parts[4]] += 1
                sum_by[parts[4]] += round(float(parts[3]) * 100)
    assert dict(zip(got.index, got["n"])) == dict(n_by)
    for seg, cents in sum_by.items():
        assert abs(got.loc[seg, "acctbal_sum"] - cents / 100) < 1e-6, seg
    assert got.loc["__corrupt__", "n_keys"] == 0
    assert math.isnan(got.loc["__corrupt__", "acctbal_sum"])
    # (b) the pruning trap: no c_custkey reference -> no quarantine
    raw = spark.read.csv(
        path,
        header=True,
        schema=CUSTOMER_CSV_SPARK_SCHEMA + ", _corrupt_record STRING",
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    )
    n_corrupt = (
        raw.groupBy("c_mktsegment")
        .agg(
            F.sum(
                F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0)
            ).alias("c")
        )
        .agg(F.sum("c"))
        .collect()[0][0]
    )
    assert n_corrupt == 0, (
        "CSV column pruning behavior changed: quarantine now fires "
        "without referencing the failing column"
    )


def test_funnel_latency_matches_pandas_replay(spark, sf_dir):
    """Per-user first-view / first-click-after / first-purchase-after
    replay in pandas; counts exactly, percentiles via numpy's linear
    interpolation (the percentile()/quantile_cont contract)."""
    got = (
        QUERIES["funnel_step_latency"](spark, sf_dir)
        .toPandas()
        .set_index("step")
    )
    ev = _events(spark, sf_dir)
    lat_c, lat_p = [], []
    for _, g in ev.groupby("user_id"):
        views = g.loc[g["event_type"] == "view", "ts"]
        if views.empty:
            continue
        tv = views.min()
        clicks = g.loc[
            (g["event_type"] == "click") & (g["ts"] > tv), "ts"
        ]
        if clicks.empty:
            continue
        tc = clicks.min()
        lat_c.append((tc - tv) // pd.Timedelta(seconds=1))
        purch = g.loc[
            (g["event_type"] == "purchase") & (g["ts"] > tc), "ts"
        ]
        if purch.empty:
            continue
        tp = purch.min()
        lat_p.append((tp - tc) // pd.Timedelta(seconds=1))
    for step, lats in [("view>click", lat_c), ("click>purchase", lat_p)]:
        row = got.loc[step]
        assert row["n_converted"] == len(lats), step
        assert abs(row["median_s"] - np.percentile(lats, 50)) < 1e-6, step
        assert abs(row["p90_s"] - np.percentile(lats, 90)) < 1e-6, step
    assert got.loc["click>purchase", "n_converted"] <= got.loc[
        "view>click", "n_converted"
    ] + 0  # funnel monotonicity over users that had no view-anchor path


def test_stream_cdc_apply_equals_batch_twin(spark, sf_dir):
    """The streaming state store, folded over the 4-chunk replay (one
    micro-batch per chunk), must equal the one-shot batch operator
    row-for-row — this IS the associativity proof for the per-user
    merge: any chunking of the log must reach the same state."""
    got = (
        QUERIES["stream_cdc_apply"](spark, sf_dir)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        QUERIES["cdc_apply_log"](spark, sf_dir)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want)


def test_pca_power_matches_numpy_replay_and_svd(spark, sf_dir):
    """(a) Exact replay: numpy integer Gram build + power iteration
    with the same 1e-4 input units and truncating divisor-side
    normalizations must reproduce all 64 loadings bit-for-bit. (b) Direction sanity:
    the quantized direction must align with numpy's true top singular
    vector (|cos| >= 0.98) — the replay alone would also pass on a
    shared-bug wrong axis."""
    from data_webhooks_spark.io import Tables
    from data_webhooks_spark.operators.similarity import _PCA_SWEEPS

    got = (
        QUERIES["embed_pca_power"](spark, sf_dir)
        .toPandas()
        .sort_values("dim")
        .reset_index(drop=True)
    )
    emb = Tables(spark, sf_dir).embeddings.toPandas()
    xu = np.floor(
        np.stack([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
        * 1e4
        + 0.5
    ).astype(np.int64)
    def div_to_zero(a, b):  # Spark div / DuckDB // truncate toward 0
        return np.sign(a) * (np.abs(a) // b)

    gram = xu.T @ xu  # exact int64
    g = int(np.abs(gram).max()) // 1_000_000 + 1
    gd = div_to_zero(gram, g)
    vu = np.full(64, 125000, dtype=np.int64)
    for _ in range(_PCA_SWEEPS):
        y = gd @ vu
        d = int(np.abs(y).max()) // 1_000_000 + 1
        vu = div_to_zero(y, d)
    assert list(got["loading_u"]) == list(vu)
    v = vu / np.linalg.norm(vu)
    xf = xu.astype(np.float64)
    sigma1 = np.linalg.svd(xf, compute_uv=False)[0]
    rayleigh = float(np.linalg.norm(xf @ v) ** 2)
    assert rayleigh / sigma1**2 >= 0.95


def test_feature_hash_matches_python_poly(spark, sf_dir):
    """Counter replay with the same acc·31+byte mod 2²⁰ mod 64 fold;
    per-(doc, bucket) counts must match exactly and Σn per doc must
    telescope to the doc's word count (the trick loses vocabulary,
    never tokens)."""
    from data_webhooks_spark.io import Tables
    from data_webhooks_spark.operators.text import _FH_BUCKETS, _FH_MOD

    got = QUERIES["text_feature_hash"](spark, sf_dir).toPandas()
    docs = Tables(spark, sf_dir).documents.toPandas()

    def bucket(w):
        acc = 0
        for ch in w:
            acc = (acc * 31 + ord(ch)) % _FH_MOD
        return acc % _FH_BUCKETS

    want = Counter()
    n_words = {}
    for _, r in docs.iterrows():
        ws = r["text"].split(" ")
        n_words[r["doc_id"]] = len(ws)
        for w in ws:
            want[(r["doc_id"], bucket(w))] += 1
    assert dict(zip(zip(got["doc_id"], got["bucket"]), got["n"])) == dict(
        want
    )
    per_doc = got.groupby("doc_id")["n"].sum()
    assert dict(per_doc) == n_words


def test_reconciliation_matches_pandas(spark, sf_dir):
    """Pandas rederivation of both daily arms; per-day counts and
    cent-exact totals must match, n_delta must be the identity, and
    the two sources' day coverage must drive both_present."""
    from data_webhooks_spark.io import Tables

    got = (
        QUERIES["dq_reconciliation"](spark, sf_dir)
        .toPandas()
        .set_index("day")
        .sort_index()
    )
    t = Tables(spark, sf_dir)
    ev = _events(spark, sf_dir)
    ev = ev[ev["event_type"] == "purchase"].copy()
    ev["day"] = ev["ts"].dt.floor("D")
    ev["cents"] = np.floor(ev["value"].abs() * 100 + 0.5).astype(
        np.int64
    ) * np.sign(ev["value"]).astype(np.int64)
    eg = ev.groupby("day").agg(n=("value", "size"), cents=("cents", "sum"))
    od = t.orders.select("o_orderdate", "o_totalprice").toPandas()
    od["day"] = od["o_orderdate"].dt.floor("D")
    od["cents"] = np.floor(od["o_totalprice"].abs() * 100 + 0.5).astype(
        np.int64
    ) * np.sign(od["o_totalprice"]).astype(np.int64)
    og = od.groupby("day").agg(
        n=("o_totalprice", "size"), cents=("cents", "sum")
    )
    assert set(got.index) == set(eg.index) | set(og.index)
    for day, row in got.iterrows():
        en = eg["n"].get(day, 0)
        on = og["n"].get(day, 0)
        assert row["ev_n"] == en and row["ord_n"] == on, day
        assert row["n_delta"] == on - en, day
        assert abs(row["ev_value"] - eg["cents"].get(day, 0) / 100) < 1e-6
        assert abs(row["ord_value"] - og["cents"].get(day, 0) / 100) < 1e-6
        assert bool(row["both_present"]) == (day in eg.index and day in og.index)


def test_parquet_metadata_matches_pyarrow_footer(spark, sf_dir):
    """Third way via the parquet FOOTER itself: pyarrow's num_rows and
    the pandas key range must match what Spark's _metadata projection
    reports, and the file name must be the real basename."""
    import os

    import pyarrow.parquet as pq

    got = QUERIES["scan_parquet_metadata"](spark, sf_dir).toPandas()
    path = f"{sf_dir}/lineitem.parquet"
    assert len(got) == 1
    row = got.iloc[0]
    assert row["file_name"] == os.path.basename(path)
    pf = pq.ParquetFile(path)
    assert row["n_rows"] == pf.metadata.num_rows
    keys = pq.read_table(path, columns=["l_orderkey"]).to_pandas()[
        "l_orderkey"
    ]
    assert row["min_key"] == keys.min() and row["max_key"] == keys.max()


def test_pair_mining_matches_numpy(spark, sf_dir):
    """Numpy recompute of the hardest negative / hardest positive per
    anchor with the same 1e-6 rounding and vec_id tiebreaks; every
    picked id, cosine, and margin flag must match."""
    from data_webhooks_spark.io import Tables

    got = (
        QUERIES["embed_pair_mining"](spark, sf_dir)
        .toPandas()
        .set_index("q_id")
        .sort_index()
    )
    emb = Tables(spark, sf_dir).embeddings.toPandas()
    X = np.stack([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    assert len(got) == 50
    for q in range(50):
        qi = np.where(ids == q)[0][0]
        cos = np.round(X @ X[qi], 6)
        row = got.loc[q]
        for same, (id_col, cos_col, best) in {
            False: (("hard_neg_id", "hard_neg_cos", "max")),
            True: (("hard_pos_id", "hard_pos_cos", "min")),
        }.items():
            mask = (labels == labels[qi]) == same
            mask &= ids != q
            cands = sorted(
                zip(cos[mask], ids[mask]),
                key=lambda t: (-t[0], t[1]) if best == "max" else (t[0], t[1]),
            )
            want_cos, want_id = cands[0]
            assert row[id_col] == want_id, (q, id_col)
            assert abs(row[cos_col] - want_cos) < 1e-9, (q, cos_col)
        assert bool(row["margin_violated"]) == (
            row["hard_neg_cos"] > row["hard_pos_cos"]
        )


def test_stream_hll_union_equals_batch_sketch(spark, sf_dir):
    """HLL state is a register-max CRDT: unioning per-micro-batch
    sketches must produce EXACTLY the estimate of one batch sketch
    over the whole stream (not merely within tolerance) — per type
    and for the global all-types union."""
    from pyspark.sql import functions as F

    from data_webhooks_spark.io import Tables

    got = (
        QUERIES["stream_hll_distinct"](spark, sf_dir)
        .toPandas()
        .set_index("event_type")
    )
    assert got["est_ok"].all()
    ev = Tables(spark, sf_dir).events
    batch = (
        ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", 14)
            ).alias("est"),
            F.countDistinct("user_id").alias("exact"),
        )
        .toPandas()
        .set_index("event_type")
    )
    for et, row in batch.iterrows():
        assert got.loc[et, "exact_users"] == row["exact"], et
    g_exact = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    assert got.loc["__all__", "exact_users"] == g_exact
    # the CRDT property itself, engine-level: per-chunk sketches
    # unioned must estimate EXACTLY what one sketch over all chunks
    # estimates (register-max merge is associative and deterministic)
    from data_webhooks_spark.streaming.core import (
        REPLAY_SCHEMA,
        replay_dir,
    )

    chunks = spark.read.schema(REPLAY_SCHEMA).parquet(
        replay_dir(sf_dir)
    )
    import pyspark.sql.functions as SF

    per_chunk = (
        chunks.withColumn("chunk", SF.spark_partition_id() % 4)
        .groupBy("event_type", "chunk")
        .agg(SF.hll_sketch_agg("user_id", 14).alias("sk"))
    )
    unioned = (
        per_chunk.groupBy("event_type")
        .agg(SF.hll_sketch_estimate(SF.hll_union_agg("sk")).alias("est"))
        .toPandas()
        .set_index("event_type")
    )
    oneshot = (
        chunks.groupBy("event_type")
        .agg(
            SF.hll_sketch_estimate(
                SF.hll_sketch_agg("user_id", 14)
            ).alias("est")
        )
        .toPandas()
        .set_index("event_type")
    )
    for et in oneshot.index:
        assert unioned.loc[et, "est"] == oneshot.loc[et, "est"], et


def test_exists_correlated_matches_pandas(spark, sf_dir):
    """Set-logic rederivation: orders with some qty>45 line and no
    discount>0.09 line, counted per priority."""
    from data_webhooks_spark.io import Tables

    got = (
        QUERIES["filter_exists_correlated"](spark, sf_dir)
        .toPandas()
        .set_index("o_orderpriority")
    )
    t = Tables(spark, sf_dir)
    li = t.lineitem.select(
        "l_orderkey", "l_quantity", "l_discount"
    ).toPandas()
    orders = t.orders.select("o_orderkey", "o_orderpriority").toPandas()
    has_big = set(li.loc[li["l_quantity"] > 45, "l_orderkey"])
    has_disc = set(li.loc[li["l_discount"] > 0.09, "l_orderkey"])
    keep = orders[
        orders["o_orderkey"].isin(has_big)
        & ~orders["o_orderkey"].isin(has_disc)
    ]
    want = keep.groupby("o_orderpriority").size()
    assert dict(got["n_orders"]) == dict(want)


def test_not_in_trap_semantics_and_plans(spark, sf_dir):
    """(a) ANSI three-valued logic: the NOT IN arm must return 0 rows
    (the subquery column contains NULLs) while NOT EXISTS returns the
    true complement, rederived in pandas. (b) Plan pins: the EXISTS
    key decorrelates to semi+anti joins; no BroadcastNestedLoop
    anywhere in either key."""
    import io
    from contextlib import redirect_stdout

    from data_webhooks_spark.io import Tables

    got = (
        QUERIES["filter_not_in_vs_not_exists"](spark, sf_dir)
        .toPandas()
        .set_index("semantics")
    )
    t = Tables(spark, sf_dir)
    orders = t.orders.select("o_custkey", "o_totalprice").toPandas()
    cust = t.customer.select("c_custkey").toPandas()
    spenders = set(
        orders.loc[orders["o_totalprice"] > 400000, "o_custkey"]
    )
    assert got.loc["not_in", "n_rows"] == 0  # the trap, by the standard
    assert got.loc["not_exists", "n_rows"] == (
        ~cust["c_custkey"].isin(spenders)
    ).sum()
    for key, needles in [
        ("filter_exists_correlated", ["Semi", "Anti"]),
        ("filter_not_in_vs_not_exists", ["Anti"]),
    ]:
        buf = io.StringIO()
        with redirect_stdout(buf):
            QUERIES[key](spark, sf_dir).explain("formatted")
        plan = buf.getvalue()
        for n in needles:
            assert n in plan, (key, n)
        assert "BroadcastNestedLoop" not in plan, key


def test_observe_metrics_equal_agg_path_and_pandas(spark, sf_dir):
    """The Observation accumulators must equal (a) the same aggregates
    computed through the normal agg path on the same session and (b) a
    pandas recount — proving ride-along metrics are the query's true
    aggregates, not approximations."""
    from pyspark.sql import functions as F

    from data_webhooks_spark.io import Tables

    got = QUERIES["dq_observe"](spark, sf_dir).toPandas().iloc[0]
    feed = Tables(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    agg = feed.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("value") < 0, 1)).alias("neg"),
    ).collect()[0]
    assert got["n_rows"] == agg["n"] and got["n_negative"] == agg["neg"]
    ev = _events(spark, sf_dir)
    p = ev[ev["event_type"] == "purchase"]
    assert got["n_rows"] == len(p)
    assert got["n_negative"] == (p["value"] < 0).sum()
    assert got["n_empty_props"] == (
        p["props"].isna() | (p["props"] == "")
    ).sum()
    cents = (
        np.floor(p["value"].abs() * 100 + 0.5).astype(np.int64)
        * np.sign(p["value"]).astype(np.int64)
    ).sum()
    assert abs(got["value_total"] - cents / 100) < 1e-6


def test_dedup_prep_replay_and_identities(spark, sf_dir):
    """Python replay of all three legs (canonical pick by sorted-set
    fingerprint, streaming trigram novelty, integer quality rule) and
    the decision identities: keep == AND of reasons, exactly one
    canonical per fingerprint group, and sum(novel counts) telescopes
    implicitly via the novelty leg already pinned elsewhere."""
    import hashlib

    from data_webhooks_spark.io import Tables

    got = (
        QUERIES["pipeline_dedup_prep"](spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    docs = (
        Tables(spark, sf_dir)
        .documents.select("doc_id", "text")
        .toPandas()
        .sort_values("doc_id")
    )
    assert len(got) == len(docs)
    first_by_fp, seen_grams = {}, set()
    expect = {}
    for _, r in docs.iterrows():
        ws = r["text"].split(" ")
        fp = hashlib.md5(
            " ".join(sorted(set(ws))).encode()
        ).hexdigest()
        canonical = first_by_fp.setdefault(fp, r["doc_id"]) == r["doc_id"]
        grams = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
        novel = len(grams - seen_grams) / len(grams) if grams else 0.0
        seen_grams |= grams
        quality = 20 <= len(ws) <= 200 and 5 * len(set(ws)) > len(ws)
        expect[r["doc_id"]] = (canonical, novel, quality)
    for doc_id, (canonical, novel, quality) in expect.items():
        row = got.loc[doc_id]
        assert bool(row["is_canonical"]) == canonical, doc_id
        assert abs(row["novelty_rate"] - novel) < 1e-6, doc_id
        assert bool(row["quality_pass"]) == quality, doc_id
        assert bool(row["keep"]) == (
            canonical and row["novelty_rate"] >= 0.2 and quality
        ), doc_id
    # exactly one canonical per fingerprint group
    fps = {}
    for _, r in docs.iterrows():
        fp = hashlib.md5(
            " ".join(sorted(set(r["text"].split(" ")))).encode()
        ).hexdigest()
        fps.setdefault(fp, []).append(r["doc_id"])
    for fp, members in fps.items():
        assert sum(bool(got.loc[d, "is_canonical"]) for d in members) == 1


def test_star_contraction_chain_converges_in_log_rounds(spark):
    """A 128-node path graph is the adversarial shape for min-label
    propagation (needs 127 diameter rounds); two-phase star
    contraction must label it in O(log n) rounds and assign every
    node the component minimum (0)."""
    from data_webhooks_spark.operators.dedup import _connected_components

    n = 128
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "u long, v long"
    )
    labels, rounds = _connected_components(chain)
    got = {r.doc_id: r.cluster_id for r in labels.collect()}
    assert rounds <= 2 * n.bit_length(), rounds  # 2*log2(128)+2 head
    for node in range(1, n):
        assert got[node] == 0, (node, got.get(node))
    assert 0 not in got  # the root maps to itself implicitly


def test_star_contraction_multi_component_and_empty(spark):
    from data_webhooks_spark.operators.dedup import _connected_components

    edges = spark.createDataFrame(
        [(5, 3), (3, 9), (20, 21), (40, 41), (41, 42), (42, 40)],
        "u long, v long",
    )
    labels, _ = _connected_components(edges)
    got = {r.doc_id: r.cluster_id for r in labels.collect()}
    assert got == {5: 3, 9: 3, 21: 20, 41: 40, 42: 40}
    empty = spark.createDataFrame([], "u long, v long")
    labels, rounds = _connected_components(empty)
    assert labels.count() == 0 and rounds <= 2
