"""Quality checks for approximate operators (SURVEY.md §5.2.3).

Approximate ops can't hash-match an exact oracle; instead assert
bounded error / subset-correctness properties against their exact
twins.
"""

import pytest

from data_webhooks_spark import registry

QUERIES = registry.queries()


def test_approx_count_distinct_tolerance(spark, sf_dir):
    """est_ok (the column the SQL oracle pins TRUE) must hold per type,
    and exact_users must match an independent recomputation."""
    rows = {
        r["event_type"]: r
        for r in QUERIES["agg_approx_count_distinct"](spark, sf_dir).collect()
    }
    from data_webhooks_spark.io import Tables
    from pyspark.sql import functions as F

    t = Tables(spark, sf_dir)
    exact = {
        r["event_type"]: r["n"]
        for r in t.events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        assert rows[et]["exact_users"] == n
        assert rows[et]["est_ok"] is True, (et, n)


def test_minhash_pairs_have_real_overlap(spark, sf_dir):
    """Every pair MinHash LSH reports at jaccard_sim>=0.2 must truly
    share vocabulary (no phantom pairs)."""
    pairs = QUERIES["dedup_minhash"](spark, sf_dir).collect()
    if not pairs:
        pytest.skip("no near-dup pairs at this SF")
    from data_webhooks_spark.io import Tables
    from pyspark.sql import functions as F

    t = Tables(spark, sf_dir)
    docs = {
        r["doc_id"]: set(r["text"].split(" "))
        for r in t.documents.select("doc_id", "text").collect()
    }
    for p in pairs:
        a, b = docs[p["d1"]], docs[p["d2"]]
        true_j = len(a & b) / len(a | b)
        assert true_j > 0.05, f"phantom pair {p}"


def test_ann_lsh_subset_of_brute_cosines(spark, sf_dir):
    """LSH re-ranked cosines must agree with the exact brute-force
    cosines for the same (query, neighbor) pairs, AND the 8x4
    table/bit point with query-side Hamming-1 multi-probe must hold
    the measured recall floor (seeded planes -> deterministic; 1.00
    measured at sf0.01 in r8, up from 0.67 single-probe; recorded in
    BASELINE.md)."""
    brute = {
        (r["q_id"], r["n_id"]): r["cos_sim"]
        for r in QUERIES["sim_cosine_brute"](spark, sf_dir).collect()
    }
    lsh = QUERIES["sim_ann_lsh"](spark, sf_dir).collect()
    assert lsh, "LSH returned no candidates at all"
    overlap = [r for r in lsh if (r["q_id"], r["n_id"]) in brute]
    for r in overlap:
        assert abs(r["cos_sim"] - brute[(r["q_id"], r["n_id"])]) < 1e-9
    recall = len(overlap) / len(brute)
    assert recall >= 0.9, f"LSH recall@5 vs brute degraded to {recall}"


def test_ann_ivf_recall_floor(spark, sf_dir):
    """nprobe=3 of 8 cells (~3/8 of the corpus scanned) must hold the
    measured recall floor vs the exact brute top-3 (seeded KMeans ->
    deterministic; 0.65 measured at sf0.01 in r8, up from 0.52 at
    nprobe=2; recorded in BASELINE.md)."""
    from collections import defaultdict

    per_q = defaultdict(list)
    for r in QUERIES["sim_cosine_brute"](spark, sf_dir).collect():
        per_q[r["q_id"]].append((-r["cos_sim"], r["n_id"]))
    brute3 = {(q, n) for q, lst in per_q.items() for _, n in sorted(lst)[:3]}
    ivf = {
        (r["q_id"], r["n_id"]) for r in QUERIES["ann_ivf"](spark, sf_dir).collect()
    }
    recall = len(ivf & brute3) / len(brute3)
    assert recall >= 0.6, f"IVF probe-3 recall@3 degraded to {recall}"


def test_simhash_hamming_bound(spark, sf_dir):
    rows = QUERIES["dedup_simhash"](spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r["hamming"] <= 12


def test_simhash_vectorized_matches_reference_loop():
    """The numpy bit-matrix kernel must be bit-exact vs the original
    interpreted per-word/per-bit loop on fixed inputs, including edge
    cases (empty string, single word, repeated words, sign wrap)."""
    from data_webhooks_spark.operators.simhash_impl import (
        simhash64_batch,
        simhash64_reference,
    )

    texts = [
        "",
        "one",
        "one one one",
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "completely different vocabulary entirely here now",
        "a b c d e f g h i j k l m n o p q r s t u v w x y z",
        "payment checkout cart user session click view purchase",
    ]
    got = simhash64_batch(texts)
    assert len(got) == len(texts)
    for txt, g in zip(texts, got):
        want = simhash64_reference(txt)
        assert int(g) == want, (txt, int(g), want)
        assert -(2**63) <= int(g) < 2**63


def test_quantize_int8_error_bound(spark, sf_dir):
    """absmax int8 quantization: reconstruction error of any in-range
    component is at most scale/2 (floor(x+0.5) rounding), and scale is
    positive."""
    rows = QUERIES["embed_quantize_int8"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["scale"] > 0
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-12, r


def test_multimodal_decode_matches_nchars(spark, sf_dir):
    rows = QUERIES["multimodal_col"](spark, sf_dir).limit(50).collect()
    assert rows
    for r in rows:
        assert r["mime"] == "text/plain"
        assert r["n_bytes"] > 0
        assert len(r["header_hex"]) == 16


def test_multimodal_resize_shrinks_by_factor(spark, sf_dir):
    rows = QUERIES["multimodal_resize"](spark, sf_dir).limit(50).collect()
    assert rows
    for r in rows:
        # stub keeps every 4th byte: ceil(orig/4)
        assert r["new_bytes"] == (r["orig_bytes"] + 3) // 4
        assert len(r["payload_hex"]) == 2 * r["new_bytes"]


def test_multimodal_frames_count_from_nchars(spark, sf_dir):
    """Sampled frame count must be recomputable from document length:
    every 3rd 64-byte frame, so ceil(ceil(n/64)/3) frames per doc."""
    from data_webhooks_spark.io import Tables

    def ceil_div(a, b):
        return -(-a // b)

    t = Tables(spark, sf_dir)
    expect = {
        r["doc_id"]: ceil_div(ceil_div(len(r["text"].encode("utf-8")), 64), 3)
        for r in t.documents.select("doc_id", "text").collect()
    }
    got = (
        QUERIES["multimodal_frames"](spark, sf_dir)
        .groupBy("doc_id")
        .count()
        .collect()
    )
    assert got
    for r in got:
        assert r["count"] == expect[r["doc_id"]], r
    # frame indexes follow the stride
    sample = QUERIES["multimodal_frames"](spark, sf_dir).limit(200).collect()
    for r in sample:
        assert r["frame_idx"] % 3 == 0
        assert 0 < len(r["frame_hex"]) <= 2 * 64
        assert len(r["frame_hex"]) % 2 == 0


def test_multimodal_features_are_normalized(spark, sf_dir):
    """Third-way invariant (not derivable from the shared formula
    alone): each doc contributes exactly 16 bins and its micro-unit
    histogram sums to ~1e6 (normalization), every bin >= 0."""
    import pandas as pd

    pdf = QUERIES["multimodal_features"](spark, sf_dir).toPandas()
    assert len(pdf) > 0
    g = pdf.groupby("doc_id")
    assert (g["bin"].count() == 16).all()
    assert (g["bin"].nunique() == 16).all()
    sums = g["feat_micro"].sum()
    # floor(v*1e6+0.5) per bin: total off by at most 8 half-ulps
    assert ((sums - 1_000_000).abs() <= 8).all()
    assert (pdf["feat_micro"] >= 0).all()


def test_json_corrupt_record_modes(spark, tmp_path):
    """Webhook payloads are schema-on-read (SURVEY §1.3): PERMISSIVE
    parsing must capture malformed lines in the corrupt-record column
    instead of failing the pipeline, DROPMALFORMED must drop exactly
    them, and from_json must null out (is_valid=false) bad payloads."""
    path = str(tmp_path / "payloads.jsonl")
    lines = [
        '{"event_id": 1, "value": 1.5}',
        "{not json at all",
        '{"event_id": 3, "value": null}',
        '["wrong", "shape"]',
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")

    schema = "event_id LONG, value DOUBLE, _corrupt_record STRING"
    permissive = spark.read.schema(schema).json(path).cache()
    assert permissive.count() == 4
    bad = permissive.filter("_corrupt_record IS NOT NULL").collect()
    assert sorted(r["_corrupt_record"] for r in bad) == sorted(
        [lines[1], lines[3]]
    )
    good = permissive.filter("_corrupt_record IS NULL").collect()
    assert {r["event_id"] for r in good} == {1, 3}
    permissive.unpersist()

    dropped = (
        spark.read.schema("event_id LONG, value DOUBLE")
        .option("mode", "DROPMALFORMED")
        .json(path)
    )
    assert {r["event_id"] for r in dropped.collect()} == {1, 3}

    from pyspark.sql import functions as F

    df = spark.createDataFrame([(l,) for l in lines], ["body"])
    parsed = df.select(
        F.from_json("body", "event_id LONG, value DOUBLE").alias("e")
    )
    # PERMISSIVE from_json yields a struct of NULL fields (not a NULL
    # struct) for unparseable or wrong-shape input
    assert parsed.filter("e.event_id IS NULL AND e.value IS NULL").count() == 2
    assert parsed.filter("e.event_id IS NOT NULL").count() == 2


def test_hll_sketch_within_tolerance(spark, sf_dir):
    """Every stratum estimate AND the union-merged global must be
    within HLL error bounds of exact — surfaced as est_ok (the column
    the SQL oracle pins TRUE)."""
    rows = {r["event_type"]: r for r in QUERIES["agg_hll_sketch"](spark, sf_dir).collect()}
    assert "__all__" in rows and len(rows) >= 4
    for et, r in rows.items():
        assert r["est_ok"] is True, (et, r)
        assert r["exact_users"] > 0
    assert rows["__all__"]["exact_users"] >= max(
        r["exact_users"] for et, r in rows.items() if et != "__all__"
    )


def test_hash_sampling_deterministic_and_unbiased(spark, sf_dir):
    """The hash sample must be identical across runs and within a loose
    binomial envelope of the nominal 10% rate; splits must partition."""
    a = {r["doc_id"] for r in QUERIES["sample_hash"](spark, sf_dir).collect()}
    b = {r["doc_id"] for r in QUERIES["sample_hash"](spark, sf_dir).collect()}
    assert a == b, "hash sample not deterministic"
    from data_webhooks_spark.io import Tables

    n = Tables(spark, sf_dir).documents.count()
    rate = len(a) / n
    assert 0.05 <= rate <= 0.15, rate

    splits = {
        r["split"]: r["n_docs"]
        for r in QUERIES["split_train_test"](spark, sf_dir).collect()
    }
    assert sum(splits.values()) == n
    assert splits["train"] > splits["val"] and splits["train"] > splits["test"]


def test_sample_per_group_cap(spark, sf_dir):
    rows = QUERIES["sample_per_group"](spark, sf_dir).collect()
    from collections import Counter

    per_user = Counter(r["user_id"] for r in rows)
    assert per_user and max(per_user.values()) <= 5


def test_kll_quantile_within_rank_tolerance(spark, sf_dir):
    """Every sketch median (per stratum AND merged-global) must fall in
    its exact rank-tolerance interval — surfaced by the operator itself
    as rank_ok (the column the SQL oracle pins to TRUE)."""
    rows = {
        r["l_returnflag"]: r
        for r in QUERIES["agg_kll_quantile"](spark, sf_dir).collect()
    }
    assert "__all__" in rows and len(rows) >= 4
    for flag, r in rows.items():
        assert r["rank_ok"] is True, (flag, r)
        assert r["n_rows"] > 0
        # per-stratum rows carry the exact yardstick median; the
        # __all__ row's exactness check is its counted rank (NULL p50)
        assert (r["exact_p50"] is not None) == (flag != "__all__")


def test_theta_overlap_set_algebra(spark, sf_dir):
    """Exact segment counts must match a set-algebra recomputation, and
    every Theta estimate must be within tolerance (est_ok — the column
    the SQL oracle pins to TRUE)."""
    from data_webhooks_spark.io import Tables

    r = QUERIES["agg_theta_overlap"](spark, sf_dir).collect()[0]
    t = Tables(spark, sf_dir)
    v = {
        x[0]
        for x in t.events.filter("event_type = 'view'")
        .select("user_id")
        .distinct()
        .collect()
    }
    p = {
        x[0]
        for x in t.events.filter("event_type = 'purchase'")
        .select("user_id")
        .distinct()
        .collect()
    }
    assert r["n_viewers"] == len(v)
    assert r["n_purchasers"] == len(p)
    assert r["n_either"] == len(v | p)
    assert r["n_both"] == len(v & p)
    assert r["n_view_only"] == len(v - p)
    assert r["est_ok"] is True


def test_dedup_embedding_planted_pairs_multiblock(spark, tmp_path):
    """Plant 50 near-duplicate pairs in a 9000-vector corpus large
    enough to span multiple tiles (n_blocks = ceil(9000/4096) = 3),
    exercising both the same-block (a < b mask) and cross-block
    (min/max orientation) kernel paths, and compare the FULL report —
    planted near-dups plus the random corpus's own above-threshold
    tail — against a tiled numpy brute force at the operator's shared
    threshold."""
    import numpy as np
    import pandas as pd

    from data_webhooks_spark.operators.dedup import _EMB_SIM_THRESHOLD
    from data_webhooks_spark.registry import queries

    rng = np.random.default_rng(7)
    n, dim = 9000, 64
    M = rng.normal(size=(n, dim))
    for k in range(50):  # plant: vec 8000+k ~ vec k (cosine ~ 1)
        M[8000 + k] = M[k] + rng.normal(scale=0.01, size=dim)
    pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [list(map(float, r)) for r in M],
            "label": np.zeros(n, dtype=np.int64),
        }
    ).to_parquet(f"{tmp_path}/embeddings.parquet")

    out = queries()["dedup_embedding"](spark, str(tmp_path)).toPandas()
    got = set(zip(out["v1"], out["v2"]))

    nrm = np.sqrt((M * M).sum(axis=1))
    expect = set()
    for lo in range(0, n, 1000):  # tiled brute force
        hi = min(lo + 1000, n)
        sims = (M[lo:hi] @ M.T) / (nrm[lo:hi, None] * nrm[None, :])
        sims = np.floor(sims * 1e6 + 0.5) / 1e6
        i, j = np.nonzero(sims >= _EMB_SIM_THRESHOLD)
        expect.update((lo + a, b) for a, b in zip(i, j) if lo + a < b)

    assert {(k, 8000 + k) for k in range(50)} <= expect  # plants visible
    assert got == expect


def test_profile_approx_distinct_error_bound(spark, sf_dir):
    """profile_table_approx must agree with the exact twin on every
    deterministic column (rows, nulls, min/max) and keep each HLL
    distinct estimate within 3x the default 5% rsd of the exact
    count — the quantitative story behind the rows-only driver key."""
    exact = {
        r["column_name"]: r
        for r in QUERIES["profile_table"](spark, sf_dir).collect()
    }
    approx = {
        r["column_name"]: r
        for r in QUERIES["profile_table_approx"](spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for c, e in exact.items():
        a = approx[c]
        assert a["n_rows"] == e["n_rows"]
        assert a["n_nulls"] == e["n_nulls"]
        assert a["min_num"] == e["min_num"]
        assert a["max_num"] == e["max_num"]
        rel = abs(a["n_distinct"] - e["n_distinct"]) / max(e["n_distinct"], 1)
        assert rel <= 0.15, (c, a["n_distinct"], e["n_distinct"])


def test_pq_codes_reconstruct_most_variance(spark, sf_dir):
    """Product quantization quality: reconstruction MSE must be well
    under the per-dim variance of the raw embeddings (the zero-skill
    constant-predictor bar), every code nibble in [0,16) with >1 code
    actually used per subspace, and the encoding deterministic across
    runs (seeded training + argmin assignment)."""
    import numpy as np

    from data_webhooks_spark import registry
    from data_webhooks_spark.io import Tables

    q = registry.queries()["embed_pq"]
    pdf = q(spark, sf_dir).toPandas()
    again = q(spark, sf_dir).toPandas()
    a = pdf.sort_values("vec_id").reset_index(drop=True)
    b = again.sort_values("vec_id").reset_index(drop=True)
    assert (a["codes_csv"] == b["codes_csv"]).all()

    codes = np.stack(
        pdf["codes_csv"]
        .apply(lambda s: [int(x) for x in s.split(",")])
        .to_numpy()
    )
    assert codes.min() >= 0 and codes.max() < 16
    for m in range(codes.shape[1]):
        assert len(np.unique(codes[:, m])) > 1, f"subspace {m} collapsed"

    t = Tables(spark, sf_dir)
    emb = np.stack(
        t.embeddings.select("embedding").toPandas()["embedding"].to_numpy()
    )
    var = emb.var(axis=0).mean()  # per-dim variance = constant-predictor MSE
    mse = pdf["recon_mse"].mean()
    # Rate-distortion bound for the fixture's near-isotropic vectors:
    # K centroids in a d-dim subspace cut variance by only
    # ~1 - K^(-2/d) = 1 - 16^(-1/8) ≈ 29% (measured 28%). A broken
    # encoder (wrong slice, constant codes) lands at >= var; assert a
    # margin below that, not a clustered-data fantasy bar.
    assert mse < 0.85 * var, (mse, var)
