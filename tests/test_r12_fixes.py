"""Round-12 targeted-fix pins.

1. IVF-PQ probe ranking must skip padded duplicate coarse centers
   (r11 ADVICE): _pad_centroids repairs a degenerate Spark ML KMeans
   fit (fewer-than-k centers on clone data) by repeating the last
   center, and the ADD step's argmin tie-break means those padded
   cells are empty by construction — so a query probe array built
   over range(NCELLS) would burn nprobe slots on empty cells,
   displacing genuinely different cells and lowering recall.
   _first_occurrence_cells is the single source for "cells that can
   own vectors"; ann_ivf_pq builds its probe struct array over it.
"""

from __future__ import annotations

from data_webhooks_spark.operators.similarity import (
    _first_occurrence_cells,
    _pad_centroids,
)


def test_full_fit_probes_every_cell():
    coarse = [[float(i), float(i)] for i in range(8)]
    assert _first_occurrence_cells(coarse) == list(range(8))


def test_padded_fit_probes_only_real_cells():
    # degenerate fit: 3 real centers padded to 8
    real = [[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]]
    coarse = _pad_centroids(list(real), 8)
    assert len(coarse) == 8
    cells = _first_occurrence_cells(coarse)
    assert cells == [0, 1, 2]
    # the displaced-recall failure mode: with nprobe=3, every probe
    # slot lands on a distinct REAL cell
    assert len(cells[:3]) == len(set(map(tuple, (coarse[i] for i in cells[:3]))))


def test_fully_degenerate_fit_probes_one_cell():
    # clone storm: every vector identical -> 1 center padded to 8
    coarse = _pad_centroids([[5.0, 5.0]], 8)
    assert _first_occurrence_cells(coarse) == [0]


def test_interior_duplicates_keep_first_occurrence():
    # robustness beyond padding: duplicates anywhere collapse to the
    # first index, matching the module-wide smallest-code tie-break
    coarse = [[0.0], [1.0], [0.0], [2.0], [1.0]]
    assert _first_occurrence_cells(coarse) == [0, 1, 3]


def test_simhash_value_level_rewrite_matches_bruteforce(spark, sf_dir):
    """r12 sweep finding: the doc-level band self-join was O(bucket²)
    on duplicated corpora (×10: one 16-bit bucket held 16,390 docs;
    117 s). The value-level rewrite must emit EXACTLY the same pair
    set: every unordered doc pair that (a) shares ≥1 of the 4 16-bit
    bands and (b) has hamming ≤ 12 — here recomputed brute-force over
    all doc pairs in numpy as the reference."""
    import itertools

    import numpy as np

    from data_webhooks_spark import registry

    got = registry.queries()["dedup_simhash"](spark, sf_dir).toPandas()
    got_set = {
        (int(r.d1), int(r.d2), int(r.hamming)) for r in got.itertuples()
    }

    from data_webhooks_spark.io import Tables
    from data_webhooks_spark.operators.simhash_impl import simhash64_batch
    import pandas as pd
    from pyspark.sql import functions as F

    docs = (
        Tables(spark, sf_dir)
        .documents.filter(F.col("text").isNotNull())
        .select("doc_id", "text")
        .toPandas()
    )
    hashes = np.array(
        simhash64_batch(pd.Series(docs["text"])), dtype=np.int64
    ).astype(np.uint64)
    ids = docs["doc_id"].to_numpy()
    want = set()
    for i, j in itertools.combinations(range(len(ids)), 2):
        h1, h2 = hashes[i], hashes[j]
        shares_band = any(
            (h1 >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            == (h2 >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            for b in range(4)
        )
        if not shares_band:
            continue
        ham = bin(int(h1 ^ h2)).count("1")
        if ham <= 12:
            d1, d2 = sorted((int(ids[i]), int(ids[j])))
            want.add((d1, d2, ham))
    assert got_set == want, (
        f"missing={list(want - got_set)[:5]} "
        f"extra={list(got_set - want)[:5]} "
        f"(|want|={len(want)}, |got|={len(got_set)})"
    )
    assert want, "fixture produced no simhash pairs — test is vacuous"


def test_duckdb_derivations_accept_directory_parquet(spark, tmp_path):
    """r12 wave-3 sweep unlock: every DuckDB derivation/oracle site
    routes through io.duck_parquet_src, so a table stored as a
    DIRECTORY of part files (the scale sweep's amplified layout — and
    any real multi-split table) derives the same twins as the
    driver's single-file fixtures. Pins: replay chunks, the JSONL/CSV
    twins, and oracle view registration all work over a 3-part
    events/customer/documents directory and agree with the single-
    file source row-for-row."""
    import duckdb

    from data_webhooks_spark.io import duck_parquet_src
    from data_webhooks_spark.oracle import duck_connect
    from data_webhooks_spark.sources.derived import ensure_derived
    from data_webhooks_spark.streaming.core import replay_dir

    assert duck_parquet_src("/root/testdata/sf0.001/events.parquet") == (
        "/root/testdata/sf0.001/events.parquet"
    )

    src = "/root/testdata/sf0.001"
    dir_sf = tmp_path / "dirsf"
    dir_sf.mkdir()
    for t in ["events", "customer", "documents", "nation"]:
        (
            spark.read.parquet(f"{src}/{t}.parquet")
            .repartition(3)
            .write.mode("overwrite")
            .parquet(f"{dir_sf}/{t}.parquet")
        )
    assert duck_parquet_src(f"{dir_sf}/events.parquet").endswith("/*.parquet")

    # oracle views register and count correctly over the dir layout
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW ev AS SELECT * FROM read_parquet("
        f"'{duck_parquet_src(f'{dir_sf}/events.parquet')}')"
    )
    n_src = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{src}/events.parquet')"
    ).fetchone()[0]
    assert con.execute("SELECT count(*) FROM ev").fetchone()[0] == n_src
    con.close()

    # replay chunks: same event ids, no loss/duplication vs the source
    rdir = replay_dir(str(dir_sf))
    replayed = spark.read.parquet(rdir)
    assert replayed.count() == n_src
    assert replayed.select("event_id").distinct().count() == n_src

    # JSONL/CSV twins: byte-for-byte identical to the single-file
    # derivation (same rows, same ORDER BY key discipline)
    d_dir = ensure_derived(str(dir_sf))
    d_file = ensure_derived(src)
    for fname in ["events.jsonl", "customer.csv"]:
        with open(f"{d_dir}/{fname}") as a, open(f"{d_file}/{fname}") as b:
            assert a.read() == b.read(), fname


def test_oracle_duck_connect_directory_layout(spark, tmp_path):
    """duck_connect (the driver-mirroring oracle harness) registers
    dir-parquet tables too, so parity tooling runs against amplified
    layouts unchanged."""
    from data_webhooks_spark.oracle import duck_connect
    from data_webhooks_spark.schemas import TABLE_NAMES

    src = "/root/testdata/sf0.001"
    dir_sf = tmp_path / "dirsf2"
    dir_sf.mkdir()
    for t in TABLE_NAMES:
        (
            spark.read.parquet(f"{src}/{t}.parquet")
            .repartition(2)
            .write.mode("overwrite")
            .parquet(f"{dir_sf}/{t}.parquet")
        )
    con = duck_connect(str(dir_sf))
    try:
        for t in TABLE_NAMES:
            n_src = con.execute(
                f"SELECT count(*) FROM read_parquet('{src}/{t}.parquet')"
            ).fetchone()[0]
            assert (
                con.execute(f"SELECT count(*) FROM {t}").fetchone()[0] == n_src
            ), t
    finally:
        con.close()
