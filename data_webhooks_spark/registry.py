"""Merged operator registry — the single source for __spark_entry__.

Each operator module contributes QUERIES (name -> (spark, sf_dir) ->
DataFrame) and ORACLE (name -> DuckDB SQL). Keys must be globally
unique; ORACLE keys must be a subset of QUERIES keys.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The external driver's correctness gate checks the FIRST 50 keys, so
# key order is an explicit per-round rotation: rounds 1-2 validated the
# scalar/relational/agg families, round 3 the windows/tpch/text/
# semistructured block, round 4 the joins/scans/UDFs/sampling block,
# rounds 5-7 each rotated in that round's additions plus re-verifies
# for every key whose oracle text or code changed.
#
# ROUND-10 WINDOW (the r9 verdict's item 1, executed; selection comes
# from scripts/record_age.py instead of archaeology): 18 re-verify
# slots lead — every key whose code changed AFTER its latest official
# driver record:
# - r9 edits whose record predates them: agg_hll_sketch (r4 record),
#   agg_mode (r6), stream_anomaly (r7), stream_dedup (r4), plus
#   ts_resample_gapfill (r7) and stream_rollup_upsert (r8) edited via
#   the shared _hourly_grid/_rollup_upsert_fn helpers;
# - r10 edits: drift_ks_test (boundary literals — r10 advice),
#   dedup_cluster (exact-replica collapse), stream_custom_state
#   (shared transition core), the row-local shingle/winnowing
#   rewrites (dedup_ngram_jaccard/containment/repeated_substrings),
#   the graph checkpoint/fused-pass rewrites (pagerank/triangle/
#   degree_stats), the funnel/quantile pre-sink splits for the chaos
#   tests (stream_quantile also got midrank tie counting), and
#   embed_centroid_outliers' zero-variance guard (clone-storm sweep).
# The remaining 32 slots re-verify the keys with the OLDEST official
# records — all 23 r2 keys and the 9 alphabetically-first r3
# non-TPC-H keys (record_age.py; the displaced r3 keys and the r3
# TPC-H block rotate in r11). After this round every key's latest
# record postdates its last code change.
_ROWS_ONLY = {
    "pack_sequences_ffd",
    "embed_pq",
    "ann_ivf_pq",
    "ann_ivf",
    "dedup_minhash",
    "dedup_simhash",
    "sim_ann_lsh",
    "profile_table_approx",
}
_WINDOW = [
    # changed-after-record re-verifies (18): the r9 edits flagged by
    # the r9 verdict + every key edited in r10 after the r9 snapshot
    # (replica collapse + row-local shingles/winnowing in dedup,
    # localCheckpoint/fused-pass graph rewrites, the funnel/quantile
    # shared-core refactors for the kill/resume chaos tests)
    "agg_hll_sketch",
    "agg_mode",
    "stream_anomaly",
    "stream_dedup",
    "ts_resample_gapfill",
    "stream_rollup_upsert",
    "drift_ks_test",
    "dedup_cluster",
    "stream_custom_state",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_repeated_substrings",
    "graph_pagerank",
    "graph_triangle_count",
    "graph_degree_stats",
    "stream_funnel",
    "stream_quantile",
    "embed_centroid_outliers",
    # oldest-record staleness re-verifies (32): all 23 r2 keys ...
    "agg_groupby",
    "cast_decimal",
    "date_funcs",
    "filter_compound",
    "filter_like",
    "filter_null_safe_eq",
    "hash_funcs",
    "join_left_outer",
    "join_left_semi",
    "join_right_outer",
    "limit",
    "null_funcs",
    "project",
    "set_except",
    "set_except_all",
    "set_intersect",
    "set_intersect_all",
    "set_union_all",
    "set_union_distinct",
    "sort_multi",
    "sql_passthrough",
    "str_funcs",
    "str_regex",
    # ... and the 9 alphabetically-first r3 non-TPC-H keys
    "arr_basic",
    "arr_explode",
    "arr_higher_order",
    "json_get",
    "pipeline_text_prep",
    "text_normalize",
    "text_redact",
    "text_stats",
    "text_tfidf",
    # (win_distribution..win_sessionize and the r3 TPC-H block rotate
    # in r11 — displaced by the 9 extra r10 changed-key slots)
]

_MODULES = [
    "data_webhooks_spark.operators.windows",
    "data_webhooks_spark.operators.tpch",
    "data_webhooks_spark.operators.text",
    "data_webhooks_spark.operators.semistructured",
    "data_webhooks_spark.operators.dedup",
    "data_webhooks_spark.operators.similarity",
    "data_webhooks_spark.operators.aggregates",
    "data_webhooks_spark.operators.relational",
    "data_webhooks_spark.operators.sorts_sets",
    "data_webhooks_spark.operators.scalars",
    "data_webhooks_spark.operators.joins",
    "data_webhooks_spark.operators.scans",
    "data_webhooks_spark.operators.udfs",
    "data_webhooks_spark.operators.multimodal",
    "data_webhooks_spark.operators.layout",
    "data_webhooks_spark.operators.sampling",
    "data_webhooks_spark.operators.analytics",
    "data_webhooks_spark.operators.timeseries",
    "data_webhooks_spark.operators.profiling",
    "data_webhooks_spark.operators.warehouse",
    "data_webhooks_spark.operators.drift",
    "data_webhooks_spark.operators.graph",
    "data_webhooks_spark.streaming.queries",
    "data_webhooks_spark.streaming.webhook_query",
]


def _collect() -> tuple[dict, dict]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracle: dict[str, str] = {}
    for modname in _MODULES:
        mod = importlib.import_module(modname)
        for k, v in mod.QUERIES.items():
            if k in queries:
                raise ValueError(f"duplicate operator key {k!r} in {modname}")
            queries[k] = v
        for k, v in mod.ORACLE.items():
            if k not in mod.QUERIES:
                raise ValueError(f"oracle without query: {k!r} in {modname}")
            oracle[k] = v
    missing = [k for k in _WINDOW if k not in queries]
    if missing:
        raise ValueError(f"window keys not registered: {missing}")
    unoracled = [k for k in _WINDOW if k not in oracle and k not in _ROWS_ONLY]
    if unoracled:
        raise ValueError(f"window keys without SQL oracle: {unoracled}")
    ordered = {k: queries[k] for k in _WINDOW}
    ordered.update((k, v) for k, v in queries.items() if k not in ordered)
    return ordered, oracle


_QUERIES: dict | None = None
_ORACLE: dict | None = None


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    global _QUERIES, _ORACLE
    if _QUERIES is None:
        _QUERIES, _ORACLE = _collect()
    return _QUERIES


def oracle_sql() -> dict[str, str]:
    global _QUERIES, _ORACLE
    if _ORACLE is None:
        _QUERIES, _ORACLE = _collect()
    return _ORACLE
