"""Semantic invariants for round-6 work: the two r5 keys the r5
verdict found without an oracle-independent assertion
(agg_histogram_equidepth, dedup_containment), plus invariants for
operators added in round 6. Parity can't catch a bug shared by query
and oracle — every key needs a third way to be right."""

import pandas as pd

from data_webhooks_spark import registry

QUERIES = registry.queries()


def test_equidepth_bins_partition_all_rows(spark, sf_dir):
    """Equi-depth histogram invariants, re-derived from the raw
    events table: the 10 bin counts must sum to the exact row count
    (every row lands in exactly one bin), every bin must be non-empty
    and roughly balanced (the defining equi-depth property; ties can
    distort but not collapse a decile), and the lower edges must be
    strictly sorted with bin 0's edge NULL."""
    from data_webhooks_spark.io import Tables

    pdf = (
        QUERIES["agg_histogram_equidepth"](spark, sf_dir)
        .toPandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    n_rows = Tables(spark, sf_dir).events.count()
    assert list(pdf["bin"]) == list(range(10))
    assert pdf["n"].sum() == n_rows
    assert (pdf["n"] > 0).all()
    # near-unique float values -> each decile within 20% of N/10
    assert pdf["n"].max() <= 1.2 * n_rows / 10
    assert pdf["n"].min() >= 0.8 * n_rows / 10
    assert pd.isna(pdf.loc[0, "lo"])
    los = pdf["lo"].iloc[1:].to_numpy()
    assert (los[1:] > los[:-1]).all(), "decile edges must increase"


def test_containment_matches_brute_force_on_subset(spark, sf_dir):
    """Third-way check for dedup_containment: recompute trigram-
    shingle containment C(A->B) = |sh(A) ∩ sh(B)| / |sh(A)| in plain
    Python over a document subset and require the operator's reported
    pairs (restricted to that subset) to match EXACTLY — presence,
    direction, and the 0.8 threshold. The inverted-index candidate
    join must be lossless, not just precise."""
    from data_webhooks_spark.io import Tables

    t = Tables(spark, sf_dir)
    docs = {
        r["doc_id"]: r["text"]
        for r in t.documents.filter("doc_id < 150").collect()
    }

    def shingles(text):
        w = text.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    sh = {d: shingles(x) for d, x in docs.items()}
    want = set()
    for a in sh:
        for b in sh:
            if a == b or not sh[a]:
                continue
            if len(sh[a] & sh[b]) / len(sh[a]) >= 0.8:
                want.add((a, b))

    pdf = QUERIES["dedup_containment"](spark, sf_dir).toPandas()
    got = {
        (int(r.d_contained), int(r.d_container))
        for r in pdf.itertuples()
        if r.d_contained in docs and r.d_container in docs
    }
    assert got == want
    # and the reported ratio itself must equal the brute-force value
    for r in pdf.itertuples():
        if r.d_contained in docs and r.d_container in docs:
            c = len(sh[r.d_contained] & sh[r.d_container]) / len(
                sh[r.d_contained]
            )
            assert abs(r.containment - c) < 1e-9
