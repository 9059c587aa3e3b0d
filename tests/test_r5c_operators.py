"""Semantic invariants for the third round-5 operator batch
(graph_pagerank, ab_ttest_welch, vocab_typo_pairs). DuckDB parity is
in test_parity; these re-derive each result independently."""

import itertools

import numpy as np

from data_webhooks_spark import registry
from data_webhooks_spark.io import Tables

QUERIES = registry.queries()


def test_pagerank_conserves_mass_and_matches_float_power_method(
    spark, sf_dir
):
    """Integer-unit PageRank must (a) cover every node of the
    co-purchase graph, (b) keep total mass ≈ 1.0 (integer truncation
    only ever loses mass, boundedly), and (c) agree with an
    independent float power method on the same edge set to within the
    truncation budget."""
    pdf = QUERIES["graph_pagerank"](spark, sf_dir).toPandas()
    t = Tables(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_partkey").toPandas()
    edges = set()
    for _, g in li.groupby("l_orderkey"):
        parts = g["l_partkey"].unique()
        for a, b in itertools.permutations(parts, 2):
            edges.add((a, b))
    nodes = sorted({a for a, _ in edges})
    assert set(pdf["node"]) == set(nodes)
    total = pdf["pr_units"].sum() / 1e12
    assert 0.999 < total <= 1.0 + 1e-9, total

    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for a, _ in edges:
        deg[idx[a]] += 1
    assert (
        pdf.set_index("node")["degree"].reindex(nodes).to_numpy() == deg
    ).all()
    r = np.full(n, 1.0 / n)
    for _ in range(3):
        nxt = np.full(n, 0.15 / n)
        for a, b in edges:
            nxt[idx[b]] += 0.85 * r[idx[a]] / deg[idx[a]]
        r = nxt
    got = pdf.set_index("node")["pr_units"].reindex(nodes).to_numpy() / 1e12
    assert np.abs(got - r).max() < 1e-6


def test_welch_ttest_matches_numpy(spark, sf_dir):
    """Re-derive Welch's t and df from the raw cent-rounded values
    with numpy; the operator's fixed-formula results must agree to
    within quantization."""
    row = QUERIES["ab_ttest_welch"](spark, sf_dir).toPandas().iloc[0]
    t = Tables(spark, sf_dir)
    ev = t.events.select("event_type", "value").toPandas()
    u = np.where(
        ev["value"] >= 0,
        np.floor(ev["value"] * 100 + 0.5),
        -np.floor(-ev["value"] * 100 + 0.5),
    )
    x = u[ev["event_type"] == "view"]
    y = u[ev["event_type"] == "purchase"]
    assert row["n1"] == len(x) and row["n2"] == len(y)
    vx, vy = x.var(ddof=1), y.var(ddof=1)
    va, vb = vx / len(x), vy / len(y)
    t_stat = (x.mean() - y.mean()) / np.sqrt(va + vb)
    df = (va + vb) ** 2 / (va**2 / (len(x) - 1) + vb**2 / (len(y) - 1))
    assert abs(row["mean_diff"] - (x.mean() - y.mean()) / 100) < 1e-5
    assert abs(row["t_stat"] - t_stat) < 1e-5
    assert abs(row["df_welch"] - df) < 1e-3 * max(1.0, df)


def test_welch_zero_variance_degenerate_is_null(duck):
    """Both arms constant → se²=0 → t and df undefined. The shared
    _W_T/_W_DF strings must NULL out (nullif guard) instead of pushing
    Inf/NaN through FLOOR with engine-dependent results (r5 ADVICE).
    Evaluated on DuckDB with hand-built constant-arm moments; the
    Spark side runs the byte-identical expression strings."""
    from data_webhooks_spark.operators.analytics import _W_DF, _W_T

    row = duck.execute(
        f"""
        WITH d AS (
            SELECT 3.0 AS nd1, 4.0 AS nd2,
                   15.0 AS s1d, 28.0 AS s2d,   -- arms constant: 5,5,5 / 7,7,7,7
                   75.0 AS ss1d, 196.0 AS ss2d
        )
        SELECT {_W_T} AS t_stat, {_W_DF} AS df_welch FROM d
        """
    ).fetchone()
    assert row[0] is None and row[1] is None, row


def test_typo_pairs_equal_brute_force(spark, sf_dir):
    """The deletion-neighborhood blocking must find EXACTLY the
    Levenshtein-1 pairs a brute-force O(V²) scan finds — blocking for
    distance 1 is complete, so no pair may be missed."""

    def lev(a, b):
        if abs(len(a) - len(b)) > 1:
            return 2
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    pdf = QUERIES["vocab_typo_pairs"](spark, sf_dir).toPandas()
    t = Tables(spark, sf_dir)
    vocab = sorted(
        {
            w
            for name in t.part.select("p_name").toPandas()["p_name"]
            for w in name.split(" ")
            if w
        }
    )
    expect = {
        (a, b)
        for a, b in itertools.combinations(vocab, 2)
        if lev(a, b) <= 1
    }
    got = {tuple(r) for r in pdf[["w1", "w2"]].itertuples(index=False)}
    assert got == expect
    assert (pdf["dist"] == 1).all()  # distinct words can't be distance 0


def test_triangle_count_matches_brute_force(spark, sf_dir):
    """Re-count triangles by brute force over the undirected edge set
    (adjacency-set intersection) and require exact agreement with the
    oriented-wedge count, plus the wedge/edge profile invariants."""
    row = QUERIES["graph_triangle_count"](spark, sf_dir).toPandas().iloc[0]
    t = Tables(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_partkey").toPandas()
    und = set()
    for _, g in li.groupby("l_orderkey"):
        parts = sorted(g["l_partkey"].unique())
        for i, a in enumerate(parts):
            for b in parts[i + 1 :]:
                und.add((a, b))
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        len(adj[a] & adj[b]) for a, b in und
    ) // 3  # each triangle counted once per edge
    assert row["n_edges"] == len(und)
    assert row["n_nodes"] == len(adj)
    assert row["n_triangles"] == tri
    # oriented wedges >= triangles (every triangle closes exactly one
    # wedge under a total orientation order)
    assert row["n_wedges"] >= row["n_triangles"]


def test_attribution_conserves_attributable_value(spark, sf_dir):
    """Credited value across touch types must equal (to the bounded
    integer-truncation deficit) the total cent-exact value of
    purchases that HAVE at least one prior-7-day touch, and the per-
    type split must match an independent pandas re-derivation."""
    import pandas as pd

    pdf = QUERIES["event_attribution"](spark, sf_dir).toPandas()
    t = Tables(spark, sf_dir)
    ev = t.events.select("event_id", "user_id", "ts", "event_type", "value").toPandas()
    ev["ts"] = pd.to_datetime(ev["ts"])
    ev["u"] = np.where(
        ev["value"] >= 0,
        np.floor(ev["value"] * 100 + 0.5),
        -np.floor(-ev["value"] * 100 + 0.5),
    ).astype("int64")
    purchases = ev[ev["event_type"] == "purchase"]
    touches = ev[ev["event_type"].isin(["view", "click"])]
    total_mu = {"view": 0, "click": 0}
    n_touch = {"view": 0, "click": 0}
    attributable_mu = 0
    for _, p in purchases.iterrows():
        w = touches[
            (touches["user_id"] == p["user_id"])
            & (touches["ts"] < p["ts"])
            & (touches["ts"] >= p["ts"] - pd.Timedelta(days=7))
        ]
        k = len(w)
        if k == 0:
            continue
        # truncate toward zero like Spark `div` and DuckDB `//` — NOT
        # Python floor division, which differs on negative purchase
        # values (r5 ADVICE; -7001//3 = -2334 in Python, -2333 in both
        # engines)
        n = int(p["u"]) * 1000
        share = -((-n) // k) if n < 0 else n // k
        attributable_mu += n
        for et, cnt in w["event_type"].value_counts().items():
            total_mu[et] += share * cnt
            n_touch[et] += cnt
    got = pdf.set_index("touch_type")
    for et in ("view", "click"):
        assert got.loc[et, "n_touches"] == n_touch[et]
        assert abs(got.loc[et, "credited_value"] - total_mu[et] / 100000) < 1e-9
    credited = sum(total_mu.values())
    # trunc-toward-zero leaves |deficit| < k milli-cents per purchase,
    # with the deficit's sign following the purchase value's sign
    assert abs(attributable_mu - credited) < 1000 * len(purchases)


def test_asof_nearest_picks_true_minimum(spark, sf_dir):
    """For every purchase the chosen click must minimize |Δts| over
    ALL the user's clicks (re-derived in pandas), and direction must
    be consistent with the sign of the difference."""
    import pandas as pd

    pdf = QUERIES["join_asof_nearest"](spark, sf_dir).toPandas()
    t = Tables(spark, sf_dir)
    ev = t.events.select("event_id", "user_id", "ts", "event_type").toPandas()
    ev["ts"] = pd.to_datetime(ev["ts"])
    clicks = ev[ev["event_type"] == "click"]
    by_user = {u: g["ts"].to_numpy() for u, g in clicks.groupby("user_id")}
    pdf["p_ts"] = pd.to_datetime(pdf["p_ts"])
    pdf["click_ts"] = pd.to_datetime(pdf["click_ts"])
    for _, r in pdf.iterrows():
        cts = by_user.get(r["user_id"])
        if cts is None or len(cts) == 0:
            assert pd.isna(r["click_ts"])
            continue
        best = np.abs(cts - r["p_ts"].to_datetime64()).min()
        got = abs(r["click_ts"] - r["p_ts"])
        assert got.to_timedelta64() == best, r["event_id"]
        if r["click_ts"] <= r["p_ts"]:
            assert r["direction"] == "backward"
        else:
            assert r["direction"] == "forward"


def test_bloom_layout_really_writes_blooms_and_pushes_filter(
    spark, sf_dir, tmp_path
):
    """The bloom layout must (a) produce strictly larger files than an
    otherwise-identical bloom-DISABLED write of the same data (the
    filter bitsets live in the file), and (b) plan the IN-list as a
    pushed scan filter so the parquet reader can consult those blooms."""
    import glob
    import os

    from data_webhooks_spark.operators.layout import bloom_events_path
    from data_webhooks_spark.io import Tables

    path = bloom_events_path(spark, sf_dir)
    with_bloom = sum(
        os.path.getsize(f) for f in glob.glob(f"{path}/part-*.parquet")
    )
    t = Tables(spark, sf_dir)
    ctrl = str(tmp_path / "events_nobloom")
    (
        t.events.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id", "ts")
        .write.mode("overwrite")
        .option("parquet.block.size", str(1 << 20))
        .parquet(ctrl)
    )
    without = sum(
        os.path.getsize(f) for f in glob.glob(f"{ctrl}/part-*.parquet")
    )
    assert with_bloom > without + 10_000, (with_bloom, without)

    plan = (
        QUERIES["scan_parquet_bloom"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "In(user_id" in plan
