"""Semantic invariants for round-7 work: the 4 operators from the r6
end-of-round snapshot wave that shipped without tests
(quality_gopher_rules, sample_mixture_target, text_bigram_logprob,
ts_period_delta) — each gets a full oracle-independent rederivation
(parity can't catch a bug shared by query and oracle), plus the two
documentation ratchets the r6 verdict demanded: SURVEY §2 must list
every registry key bidirectionally, and no oracle may contain a bare
decimal literal division (the DECIMAL-under-spark.sql dtype trap)."""

import hashlib
import math
import os
import re
from collections import Counter

import pandas as pd

from data_webhooks_spark import registry

QUERIES = registry.queries()
ORACLE = registry.oracle_sql()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _docs(spark, sf_dir):
    from data_webhooks_spark.io import Tables

    return Tables(spark, sf_dir).documents.toPandas()


def test_gopher_rules_match_python_rederivation(spark, sf_dir):
    """Recompute every per-doc metric and rule boolean in pure Python
    (split on single space, the documented tokenizer) for the whole
    sf0.01 corpus; the integer cross-multiplication rules must agree
    bit-for-bit and the conjunction must equal AND of the parts."""
    from data_webhooks_spark.operators.text import (
        _GOPHER_MAX_WORDS,
        _GOPHER_MIN_WORDS,
        _STOPWORDS,
    )

    got = (
        QUERIES["quality_gopher_rules"](spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
    )
    docs = _docs(spark, sf_dir)
    assert len(got) == len(docs)  # no doc dropped by the 3-way join
    for _, row in docs.iterrows():
        parts = row["text"].split(" ")
        n_words = len(parts)
        chars = sum(len(w) for w in parts)
        n_stop = sum(w in _STOPWORDS for w in parts)
        n_short = sum(len(w) <= 2 for w in parts)
        top1 = max(Counter(parts).values())
        bigrams = [f"{a} {b}" for a, b in zip(parts, parts[1:])]
        top2 = max(Counter(bigrams).values())
        g = got.loc[row["doc_id"]]
        assert (
            g["n_words"],
            g["chars_in_words"],
            g["n_stop"],
            g["n_short"],
            g["top1"],
            g["top2"],
        ) == (n_words, chars, n_stop, n_short, top1, top2), row["doc_id"]
        rules = {
            "r_word_count": _GOPHER_MIN_WORDS <= n_words <= _GOPHER_MAX_WORDS,
            "r_mean_word_len": 3 * n_words <= chars <= 10 * n_words,
            "r_stopwords": n_stop >= 2,
            "r_short_words": 20 * n_short <= 3 * n_words,
            "r_top_unigram": 5 * top1 <= n_words,
            "r_top_bigram": 50 * top2 <= 9 * (n_words - 1),
        }
        for k, v in rules.items():
            assert bool(g[k]) == v, (row["doc_id"], k)
        assert bool(g["gopher_pass"]) == all(rules.values())


def test_mixture_target_exact_integer_rederivation(spark, sf_dir):
    """Re-derive capacity, per-domain targets, thresholds AND the kept
    counts from scratch in Python — including the md5 hash-bucket
    decision per doc_id — and check the mixture contract: no
    upsampling (n_kept <= n_docs), the achieved shares sum to 1
    within quantization, and each achieved share lands within
    hash-uniformity distance of the declared target."""
    from data_webhooks_spark.operators.sampling import (
        BUCKETS,
        _MIX_SHARES,
    )

    got = (
        QUERIES["sample_mixture_target"](spark, sf_dir)
        .toPandas()
        .set_index("domain")
    )
    docs = _docs(spark, sf_dir)

    def domain_of(source: str) -> str:
        return {0: "web", 1: "books", 2: "code"}[int(source[3:]) % 3]

    def bucket(doc_id) -> int:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[:15]
        return int(h, 16) % BUCKETS

    dom = docs.assign(domain=docs["source"].map(domain_of))
    n = dom.groupby("domain").size().to_dict()
    t_units = min(n[d] * 1_000_000 // s for d, s in _MIX_SHARES.items())
    total_kept = 0
    for d, s in _MIX_SHARES.items():
        k_target = t_units * s // 1_000_000
        threshold = k_target * BUCKETS // n[d]
        ids = dom.loc[dom["domain"] == d, "doc_id"]
        n_kept = int((ids.map(bucket) < threshold).sum())
        g = got.loc[d]
        assert (g["n_docs"], g["k_target"], g["threshold"], g["n_kept"]) == (
            n[d],
            k_target,
            threshold,
            n_kept,
        ), d
        assert n_kept <= n[d]  # never upsamples
        total_kept += n_kept
    shares = got["achieved_share"]
    assert abs(shares.sum() - 1.0) < 3e-6
    tot_s = sum(_MIX_SHARES.values())
    for d, s in _MIX_SHARES.items():
        # md5 buckets are uniform, not exact: allow the binomial-ish
        # slack a 10k-bucket threshold has at a few hundred rows/domain
        assert abs(got.loc[d, "achieved_share"] - s / tot_s) < 0.12, d


def test_bigram_logprob_matches_python_counter(spark, sf_dir):
    """Re-derive the add-one-smoothed bigram LM from scratch with
    collections.Counter over the whole corpus and compare every doc's
    mean -ln p to 6 decimals; also assert the order-sensitivity claim:
    scores are positive and n_bigrams == n_words - 1 per doc."""
    got = (
        QUERIES["text_bigram_logprob"](spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
    )
    docs = _docs(spark, sf_dir)
    uni: Counter = Counter()
    bi: Counter = Counter()
    toks = {}
    for _, row in docs.iterrows():
        parts = row["text"].split(" ")
        toks[row["doc_id"]] = parts
        uni.update(parts)
        bi.update(zip(parts, parts[1:]))
    v = len(uni)
    n_checked = 0
    for doc_id, parts in toks.items():
        pairs = list(zip(parts, parts[1:]))
        if not pairs:
            assert doc_id not in got.index
            continue
        terms = [
            -math.log((bi[p] + 1.0) / (uni[p[0]] + v)) for p in pairs
        ]
        mean = sum(terms) / len(terms)
        g = got.loc[doc_id]
        assert g["n_bigrams"] == len(pairs)
        assert g["avg_neg_logprob"] > 0
        assert abs(g["avg_neg_logprob"] - round(mean, 6)) < 2e-6, doc_id
        n_checked += 1
    assert n_checked == len(got)


def test_period_delta_telescopes_and_matches_pandas(spark, sf_dir):
    """Two independent checks: (a) the lag algebra telescopes — per
    event type, sum(delta_n) == last n - first n and likewise for
    delta_value within one 1e-4 unit; (b) a pandas groupby/shift
    rederivation agrees row-for-row on counts and deltas."""
    from data_webhooks_spark.io import Tables

    got = QUERIES["ts_period_delta"](spark, sf_dir).toPandas()
    for et, g in got.groupby("event_type"):
        g = g.sort_values("day")
        assert g["n"].iloc[0] > 0
        assert pd.isna(g["prev_n"].iloc[0]) and pd.isna(
            g["delta_n"].iloc[0]
        )
        assert g["delta_n"].iloc[1:].sum() == g["n"].iloc[-1] - g["n"].iloc[0]
        assert (
            abs(
                g["delta_value"].iloc[1:].sum()
                - (g["sum_value"].iloc[-1] - g["sum_value"].iloc[0])
            )
            < 1e-4 * len(g)
        )
    ev = Tables(spark, sf_dir).events.toPandas()
    ev["day"] = ev["ts"].dt.floor("D")
    ev["units"] = (ev["value"] * 10000.0 + 0.5).apply(math.floor)
    daily = (
        ev.groupby(["event_type", "day"])
        .agg(n=("event_id", "size"), sv=("units", "sum"))
        .reset_index()
        .sort_values(["event_type", "day"])
    )
    daily["prev_n"] = daily.groupby("event_type")["n"].shift()
    merged = got.merge(
        daily, on=["event_type", "day"], suffixes=("", "_pd")
    )
    assert len(merged) == len(got) == len(daily)
    assert (merged["n"] == merged["n_pd"]).all()
    both = merged.dropna(subset=["prev_n"])
    assert (both["prev_n"] == both["prev_n_pd"]).all()
    assert (
        (merged["sum_value"] - merged["sv"] / 10000.0).abs() < 1e-9
    ).all()


def test_survey_section2_lists_every_registry_key():
    """The r6 drift class, ratcheted: SURVEY §2 claims it is
    cross-checked against the registry in both directions each round —
    enforce it. Every `key` that appears in a §2 table row must be a
    registry key, and every registry key must appear somewhere in
    SURVEY.md as a backticked identifier."""
    text = open(os.path.join(REPO, "SURVEY.md")).read()
    mentioned = set(re.findall(r"`([a-z][a-z0-9_]+)`", text))
    missing = sorted(set(QUERIES) - mentioned)
    assert not missing, f"registry keys absent from SURVEY.md: {missing}"


def test_no_decimal_literal_qnt_division_in_oracles():
    """The ts_period_delta r6 lesson, ratcheted at the exact failure
    shape: `FLOOR(...) / NNNN.0` types the division DECIMAL under
    spark.sql (BIGINT / DECIMAL literal) but DOUBLE under DuckDB.
    Multiplications and already-DOUBLE numerators are fine — only the
    quantizing division must use an exponent literal (1e6) or a
    CAST(... AS DOUBLE) numerator. The dynamic counterpart is the
    PORTABLE_ORACLES pin in test_parity.py, which makes any portable
    key's dtype drift a hard failure."""
    def floor_divided_by_decimal(sql: str) -> list[str]:
        hits = []
        for m in re.finditer(r"FLOOR\(", sql, re.IGNORECASE):
            depth, i = 1, m.end()
            while i < len(sql) and depth:
                depth += {"(": 1, ")": -1}.get(sql[i], 0)
                i += 1
            rest = sql[i:]
            dm = re.match(r"\s*/\s*(\d+\.\d+)\b", rest)
            if dm:
                hits.append(f"FLOOR(...) / {dm.group(1)}")
        return hits

    bad = {
        k: hits for k, sql in ORACLE.items()
        if (hits := floor_divided_by_decimal(sql))
    }
    assert not bad, f"DECIMAL-typed quantizing division in oracle SQL: {bad}"
