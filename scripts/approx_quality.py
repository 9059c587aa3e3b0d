"""Measured quality of the approximate (rows-only) keys vs their exact
twins (judge r4 item 7): the quantitative story BASELINE.md records so
the driver can track the approximate keys round over round.

All seeds are the ones pinned in the operators themselves (similarity
planes / KMeans seed 42, minhash family RandomState(42)); ground truth
comes from the exact twins (sim_cosine_brute; an un-truncated version
of dedup_ngram_jaccard's inverted-index SQL; profile_table).

Usage: python scripts/approx_quality.py [sf_dir]   (default sf0.01)
Prints one JSON object and, with --md, a markdown table row set.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from data_webhooks_spark import registry  # noqa: E402
from data_webhooks_spark.session import get_spark  # noqa: E402

# Exact distinct word-trigram Jaccard for EVERY colliding pair — the
# same shingle universe dedup_minhash signatures estimate (and
# dedup_ngram_jaccard's SQL, minus its top-50 truncation).
_EXACT_JACCARD_SQL = """
WITH pos_words AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS word,
           CAST(generate_subscripts(string_split(text, ' '), 1) AS INT) AS pos
    FROM documents
),
shingled AS (
    SELECT doc_id,
           word || ' ' || lead(word, 1) OVER w || ' ' || lead(word, 2) OVER w
               AS shingle
    FROM pos_words
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    QUALIFY lead(word, 2) OVER w IS NOT NULL
),
sh AS (SELECT DISTINCT doc_id, shingle FROM shingled),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT p.d1, p.d2, p.inter / (s1.n + s2.n - p.inter) AS jaccard
FROM pairs p
JOIN sizes s1 ON p.d1 = s1.doc_id
JOIN sizes s2 ON p.d2 = s2.doc_id
"""


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("dws-approx-quality")
    qs = registry.queries()
    out: dict = {"sf_dir": sf, "seed": 42}

    brute_rows = qs["sim_cosine_brute"](spark, sf).collect()  # one brute pass
    brute = {(r["q_id"], r["n_id"]) for r in brute_rows}
    lsh = {(r["q_id"], r["n_id"]) for r in qs["sim_ann_lsh"](spark, sf).collect()}
    out["sim_ann_lsh"] = {
        "recall_at_5_vs_brute": round(len(lsh & brute) / len(brute), 4),
        "n_brute_pairs": len(brute),
    }

    # ann_ivf returns top-3 probing two cells; brute top-3 = first 3 of
    # the exact top-5 ranking (same tiebreak).
    from collections import defaultdict

    per_q: dict = defaultdict(list)
    for r in brute_rows:
        per_q[r["q_id"]].append((-r["cos_sim"], r["n_id"]))
    brute3 = {
        (q, n) for q, lst in per_q.items() for _, n in sorted(lst)[:3]
    }
    ivf = {(r["q_id"], r["n_id"]) for r in qs["ann_ivf"](spark, sf).collect()}
    out["ann_ivf"] = {
        "recall_at_3_vs_brute": round(len(ivf & brute3) / len(brute3), 4),
        "n_brute_pairs": len(brute3),
    }

    # ann_ivf_pq ranks by exact L2 after the ADC shortlist, so its
    # ground truth is the exact L2 top-3 (computed in numpy — cosine
    # and L2 orderings differ slightly on the not-exactly-unit
    # fixture vectors).
    import numpy as np

    from data_webhooks_spark.io import Tables

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in Tables(spark, sf)
        .embeddings.select("vec_id", "embedding")
        .collect()
    }
    ids = sorted(emb)
    l2_top3 = set()
    for q in sorted({p[0] for p in brute3}):
        d2 = sorted(
            (float(np.sum((emb[i] - emb[q]) ** 2)), i)
            for i in ids
            if i != q
        )
        l2_top3 |= {(q, i) for _, i in d2[:3]}
    ivfpq = {
        (r["q_id"], r["n_id"]) for r in qs["ann_ivf_pq"](spark, sf).collect()
    }
    out["ann_ivf_pq"] = {
        "recall_at_3_vs_exact_l2": round(
            len(ivfpq & l2_top3) / len(l2_top3), 4
        ),
        "n_exact_pairs": len(l2_top3),
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    exact = {
        (int(d1), int(d2)): float(j)
        for d1, d2, j in con.execute(_EXACT_JACCARD_SQL).fetchall()
    }

    mh = {
        (r["d1"], r["d2"]): r["jaccard_sim"]
        for r in qs["dedup_minhash"](spark, sf).collect()
    }
    truth_02 = {p for p, j in exact.items() if j >= 0.2}
    truth_05 = {p for p, j in exact.items() if j >= 0.5}
    out["dedup_minhash"] = {
        "n_reported": len(mh),
        "precision_true_j_ge_005": round(
            sum(1 for p in mh if exact.get(p, 0.0) >= 0.05) / max(len(mh), 1), 4
        ),
        "recall_vs_exact_j_ge_02": round(
            len(set(mh) & truth_02) / max(len(truth_02), 1), 4
        ),
        "recall_vs_exact_j_ge_05": round(
            len(set(mh) & truth_05) / max(len(truth_05), 1), 4
        ),
        "n_exact_j_ge_02": len(truth_02),
        "n_exact_j_ge_05": len(truth_05),
    }

    # SimHash hashes WORD features (simhash_impl.py), so its quality
    # metric is word-set overlap of the reported close pairs — not the
    # trigram-shingle Jaccard the minhash family estimates.
    sh_rows = qs["dedup_simhash"](spark, sf).collect()
    close = [r for r in sh_rows if r["hamming"] <= 3]
    words = {
        r["doc_id"]: set(r["text"].split(" "))
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }

    def wj(p):
        a, b = words[p["d1"]], words[p["d2"]]
        return len(a & b) / max(len(a | b), 1)

    out["dedup_simhash"] = {
        "n_reported": len(sh_rows),
        "max_hamming": max((r["hamming"] for r in sh_rows), default=0),
        "n_hamming_le_3": len(close),
        "mean_word_jaccard_h_le_3": round(
            sum(wj(r) for r in close) / max(len(close), 1), 4
        ),
        "mean_word_jaccard_all_reported": round(
            sum(wj(r) for r in sh_rows) / max(len(sh_rows), 1), 4
        ),
    }

    ex_prof = {
        r["column_name"]: r["n_distinct"]
        for r in qs["profile_table"](spark, sf).collect()
    }
    ap_prof = {
        r["column_name"]: r["n_distinct"]
        for r in qs["profile_table_approx"](spark, sf).collect()
    }
    out["profile_table_approx"] = {
        "max_rel_distinct_err": round(
            max(
                abs(ap_prof[c] - ex_prof[c]) / max(ex_prof[c], 1)
                for c in ex_prof
            ),
            4,
        ),
        "n_columns": len(ex_prof),
    }

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
