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
# ROUND-9 WINDOW (the r8 verdict's item 1, executed): 42 re-verify
# slots lead — every key whose code or oracle text changed AFTER its
# latest official driver record:
# - the r8 NULL-injection hardening wave (records predate the edits;
#   local parity pinned in tests/test_edge_nulls.py): ts_ewma,
#   ts_moving_median, ts_downsample_m4, udf_pandas_scalar,
#   agg_minmax_by, map_funcs, stream_quantile, text_tokenize,
#   text_fingerprint, text_quality, text_sentiment, text_langid,
#   json_parse, pack_sequences;
# - the r8 empty-input sweep fixes: agg_cube, agg_rollup,
#   agg_grouping_sets, agg_theta_overlap, dq_checks, drift_ks_test
#   (ALSO rewritten in r9: range-sharded two-pass ECDF), drift_psi,
#   sink_foreach_batch (ALSO r9: all-NULL-batch coalesce),
#   sink_partitioned_parquet;
# - r9 advice fixes: event_sequence_ngrams (non-NULL user count),
#   embed_pair_mining (half-away-from-zero tie rounding);
# - r9 adversarial-sweep fixes (multi-NULL rows / NULL-only groups /
#   multibyte text / NULL-only lang / median decimal ties —
#   scripts/null_sweep_r9.py, SCALE.md ledger): agg_string,
#   agg_kll_quantile, stream_quantile, stream_stateful,
#   stream_custom_state, quality_gopher_rules (oracle bytes->chars),
#   contamination_matrix (NULL text has no fingerprint), and the
#   whole multimodal family moved to byte-exact hex(encode())
#   oracles: multimodal_col, multimodal_resize, multimodal_frames,
#   multimodal_features, multimodal_audio_energy, multimodal_phash,
#   pipeline_media_prep; agg_histogram_equidepth + drift_psi edge
#   quantization (a 1-ULP percentile-interpolation difference can
#   flip rows equal to a bin edge — sweep F, duplicate timestamps);
#   ts_interpolate_linear / join_asof_forward / join_asof_nearest
#   forward-neighbor lookups rewritten from quadratic
#   unbounded-FOLLOWING frames to reversed running frames (sweep H).
# The remaining 8 slots re-verify the keys with the OLDEST official
# records (r2) — staleness rotation so no key's record ages
# indefinitely. After this round every key's latest record postdates
# its last code change.
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
    # changed-after-record re-verifies (42)
    "ts_ewma",
    "ts_moving_median",
    "ts_downsample_m4",
    "udf_pandas_scalar",
    "agg_minmax_by",
    "map_funcs",
    "stream_quantile",
    "text_tokenize",
    "text_fingerprint",
    "text_quality",
    "text_sentiment",
    "text_langid",
    "json_parse",
    "pack_sequences",
    "agg_cube",
    "agg_rollup",
    "agg_grouping_sets",
    "agg_theta_overlap",
    "dq_checks",
    "drift_ks_test",
    "drift_psi",
    "sink_foreach_batch",
    "sink_partitioned_parquet",
    "event_sequence_ngrams",
    "embed_pair_mining",
    # (stream_quantile, also a sweep fix, already leads the window in
    # the r8 NULL-hardening block above)
    "agg_string",
    "agg_kll_quantile",
    "stream_stateful",
    "stream_custom_state",
    "quality_gopher_rules",
    "contamination_matrix",
    "multimodal_col",
    "multimodal_resize",
    "multimodal_frames",
    "multimodal_features",
    "multimodal_audio_energy",
    "multimodal_phash",
    "pipeline_media_prep",
    "agg_histogram_equidepth",
    "ts_interpolate_linear",
    "join_asof_forward",
    "join_asof_nearest",
    # oldest-record staleness re-verifies (8, all last recorded r2)
    "agg_global",
    "agg_count_distinct",
    "agg_having",
    "agg_stats",
    "agg_percentile",
    "agg_collect",
    "agg_salted_exact",
    "join_inner_equi",
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
