"""Streaming test/replay plumbing.

- ``replay_dir``: deterministic 4-chunk file replay of the events
  fixture (DuckDB-derived, ts-ordered; ``late=True`` displaces a fixed
  ~3% of rows one chunk later to exercise watermark/late-data paths
  deterministically — SURVEY §5.2.2). Chunk mtimes increase with chunk
  id so Spark's file source replays them in order with
  maxFilesPerTrigger=1 (one micro-batch per chunk).
- ``read_replay_stream``: readStream with the explicit chunk schema.
- ``run_to_table``: run a streaming DF through an availableNow trigger
  into a uniquely-named memory sink and return the result table.

Checkpoints/chunks live under /root/repo/.runtime (gitignored). Fresh
checkpoint + fresh sink name per run keeps every invocation a full,
deterministic replay.
"""

from __future__ import annotations

import os
import uuid

import duckdb

from pyspark.sql import DataFrame, SparkSession

from ..io import (
    cached_derivation,
    commit_derivation,
    duck_parquet_src,
    source_fingerprint,
)

RUNTIME_DIR = "/root/repo/.runtime"

# Chunks are written by DuckDB with µs timestamps — no nanos quirk on
# the streaming path. ts is TIMESTAMP (not NTZ): watermarks require it;
# the session timezone is pinned UTC so wall-clock matches the NTZ
# batch reads, and outputs cast window bounds back to NTZ for hashing.
REPLAY_SCHEMA = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)
N_CHUNKS = 4


def replay_dir(sf_dir: str, late: bool = False, late_by: int = 1) -> str:
    sfname = os.path.basename(sf_dir.rstrip("/"))
    kind = ("late" if late_by == 1 else f"late{late_by}") if late else "ordered"
    out = f"{RUNTIME_DIR}/stream/{sfname}/{kind}"
    # cache keyed on the SOURCE fingerprint, not the dir basename —
    # see io.source_fingerprint for why
    fingerprint = source_fingerprint(f"{sf_dir}/events.parquet")
    if cached_derivation(out, ".complete", fingerprint):
        return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # chunk = ts-quartile; late variant demotes event_id%37==0 rows
    # late_by chunks (deterministic late arrivals), capped at the last
    # chunk. Note Spark's late-row filter lags eviction by one batch
    # (tests/test_streaming_semantics.py), so late_by=1 rows are never
    # dropped — use late_by>=2 to exercise actual watermark drops.
    late_expr = (
        f"LEAST(chunk + CASE WHEN event_id % 37 = 0 THEN {late_by} ELSE 0 END, "
        f"{N_CHUNKS})" if late else "chunk"
    )
    con.execute(
        f"""
        CREATE TEMP TABLE chunked AS
        SELECT *, {late_expr} AS final_chunk FROM (
            SELECT event_id, ts, user_id, event_type, value, props,
                   ntile({N_CHUNKS}) OVER (ORDER BY ts, event_id) AS chunk
            FROM read_parquet('{duck_parquet_src(f'{sf_dir}/events.parquet')}')
        )
        """
    )
    base = 1_700_000_000
    for i in range(1, N_CHUNKS + 1):
        path = f"{out}/chunk_{i}.parquet"
        con.execute(
            f"""
            COPY (SELECT event_id, ts, user_id, event_type, value, props
                  FROM chunked WHERE final_chunk = {i}
                  ORDER BY ts, event_id)
            TO '{path}' (FORMAT PARQUET)
            """
        )
        os.utime(path, (base + i, base + i))  # replay order == chunk order
    con.close()
    commit_derivation(out, ".complete", fingerprint)
    return out


def read_replay_stream(
    spark: SparkSession,
    sf_dir: str,
    late: bool = False,
    files_per_trigger: int = 1,
    late_by: int = 1,
) -> DataFrame:
    path = replay_dir(sf_dir, late=late, late_by=late_by)
    return (
        spark.readStream.schema(REPLAY_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(path)
    )


# Replay checkpoints are ephemeral BY DESIGN: every run_to_table gets a
# fresh uuid dir and no query ever resumes from it (kill/resume tests
# manage their own persistent checkpoints explicitly). The
# HDFSBackedStateStore's per-batch delta/commit files are the dominant
# streaming fixed cost at fixture scale, so put the throwaway state on
# tmpfs when the host has one (measured 1.51 s -> 1.26 s on
# stream_tumbling_agg at sf0.1). A real deployment needs durable
# checkpoints for exactly-once recovery — point SPARK_GRAFT_CKPT_BASE
# at shared storage there; the fallback keeps hosts without /dev/shm
# working unchanged.
_CKPT_BASE = os.environ.get("SPARK_GRAFT_CKPT_BASE") or (
    "/dev/shm/dws-ckpt" if os.path.isdir("/dev/shm") else f"{RUNTIME_DIR}/ckpt"
)


def checkpoint_dir() -> str:
    return f"{_CKPT_BASE}/{uuid.uuid4().hex}"


# Stateful streaming operators create one state-store instance per
# shuffle partition per micro-batch; with tiny per-key state the
# per-partition checkpoint commit dominates wall time. 4 partitions fit
# the local fixture scale (measured 3.8s -> 2.0s on the tumbling agg at
# sf0.1). At cluster scale, state partitions must instead scale with
# key cardinality x executor count — raise via env. Checkpoints here
# are fresh per run, so the partition count never conflicts with a
# prior checkpoint's.
STREAM_STATE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "4")
)


def run_to_table(
    sdf: DataFrame, output_mode: str = "append", extra_options: dict | None = None
) -> DataFrame:
    """Drive a streaming DataFrame to completion (availableNow) into a
    memory sink; returns the materialized result as a batch DataFrame."""
    name = f"stream_result_{uuid.uuid4().hex[:12]}"
    spark = sdf.sparkSession
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    writer = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir())
        .trigger(availableNow=True)
    )
    for k, v in (extra_options or {}).items():
        writer = writer.option(k, v)
    spark.conf.set("spark.sql.shuffle.partitions", str(STREAM_STATE_PARTITIONS))
    try:
        q = writer.start()
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(name)
