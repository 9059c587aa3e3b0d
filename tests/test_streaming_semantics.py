"""Watermark/late-data semantics (SURVEY §5.2.2).

The late replay displaces a fixed ~3% of events (event_id % 37 == 0)
``late_by`` chunks later. These tests simulate Structured Streaming's
watermark protocol over the exact same chunk assignment and assert
the stream's append-mode output equals the simulation row-for-row:

- eviction watermark of batch k = max event time seen through batch
  k-1, minus delay (the value Spark reports in that batch's progress);
  batch k emits (finalizes) every state window with end <= it
- the LATE-ROW FILTER lags one batch: a row arriving in batch k is
  dropped iff window_end <= eviction watermark of batch k-1 (verified
  empirically via numRowsDroppedByWatermark — a late row can still
  join its window in the very batch that finalizes it, but can never
  re-open an already-emitted window, so append stays exactly-once)
- availableNow runs one final empty batch that flushes with the last
  watermark; windows still open after it stay unemitted.

Consequence worth pinning: rows one chunk late are NEVER dropped by a
watermark shorter than a chunk (the lagging filter hasn't caught up);
rows two chunks late are. Both cases asserted below.
"""

from collections import defaultdict

import duckdb
from pyspark.sql import functions as F

from data_webhooks_spark import registry
from data_webhooks_spark.streaming.core import (
    N_CHUNKS,
    read_replay_stream,
    run_to_table,
)

DELAY_US = 15 * 60 * 1_000_000  # 15-minute watermark (stream_watermark)
WINDOW_US = 10 * 60 * 1_000_000  # 10-minute tumbling window


def simulate(sf_dir: str, late_by: int = 1) -> tuple[dict[int, int], int]:
    """Expected ({window_start_us: n}, n_dropped) per the protocol."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT epoch_us(ts) AS ts_us,
               LEAST(chunk + CASE WHEN event_id % 37 = 0 THEN {late_by}
                     ELSE 0 END, {N_CHUNKS}) AS final_chunk
        FROM (
            SELECT event_id, ts,
                   ntile({N_CHUNKS}) OVER (ORDER BY ts, event_id) AS chunk
            FROM read_parquet('{sf_dir}/events.parquet')
        )
        ORDER BY final_chunk
        """
    ).fetchall()
    con.close()

    batches: dict[int, list[int]] = defaultdict(list)
    for ts_us, chunk in rows:
        batches[chunk].append(ts_us)

    state: dict[int, int] = defaultdict(int)  # open windows
    emitted: dict[int, int] = {}
    dropped = 0
    wm_evict: int | None = None  # batch k's reported watermark
    wm_filter: int | None = None  # = previous batch's reported watermark
    max_seen = None
    chunk_keys = sorted(batches)
    for k in chunk_keys + [chunk_keys[-1] + 1]:  # + final empty flush
        wm_filter = wm_evict
        if max_seen is not None:
            wm_evict = max_seen - DELAY_US
        for ts_us in batches.get(k, ()):
            # watermark tracking observes every input row, dropped or not
            max_seen = ts_us if max_seen is None else max(max_seen, ts_us)
            w = ts_us - ts_us % WINDOW_US
            if wm_filter is not None and w + WINDOW_US <= wm_filter:
                dropped += 1
                continue  # late beyond (lagging) watermark
            state[w] += 1
        if wm_evict is not None:
            for w in sorted(state):
                if w + WINDOW_US <= wm_evict:
                    emitted[w] = state.pop(w)
    return emitted, dropped


def _collect_windows(df) -> dict[int, int]:
    return {
        int(r["window_start"].timestamp() * 1_000_000): r["n"]
        for r in df.collect()
    }


def test_watermark_exact_one_chunk_late(spark, sf_dir):
    """stream_watermark (late_by=1): exact emission set — and the
    non-obvious fact that nothing is dropped, because the lagging
    filter never catches a row only one chunk behind."""
    result = _collect_windows(registry.queries()["stream_watermark"](spark, sf_dir))
    expected, dropped = simulate(sf_dir, late_by=1)
    assert result == expected
    assert dropped == 0


def test_watermark_exact_two_chunks_late_drops(spark, sf_dir):
    """late_by=2: displaced rows arrive behind even the lagging
    filter watermark and must be dropped — exact drop set asserted."""
    s = read_replay_stream(spark, sf_dir, late=True, late_by=2).withWatermark(
        "ts", "15 minutes"
    )
    agg = (
        s.groupBy(F.window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"), "n"
        )
    )
    result = _collect_windows(run_to_table(agg, "append"))
    expected, dropped = simulate(sf_dir, late_by=2)
    assert result == expected
    assert dropped > 0  # the two-chunk-late rows really were dropped
    total_emitted = sum(expected.values())
    total_rows = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]
    # emitted + dropped + still-open tail == all events
    assert total_emitted + dropped <= total_rows


SESSION_GAP_US = 30 * 60 * 1_000_000  # stream_session_agg's gap
SESSION_DELAY_US = 60 * 60 * 1_000_000  # its 1-hour watermark


def test_session_window_equivalence(spark, sf_dir):
    """stream_session_agg (append + 1h watermark over the ORDERED
    replay) must emit exactly the ground-truth 30-min-gap sessions
    whose end precedes the final watermark; open tail sessions stay in
    state. Ground truth from first principles (lag/gap split in
    DuckDB), not from Spark."""
    con = duckdb.connect()
    sessions = con.execute(
        f"""
        WITH x AS (
            SELECT user_id, value, epoch_us(ts) AS us,
                   lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev
            FROM read_parquet('{sf_dir}/events.parquet')
        ),
        flagged AS (
            SELECT *, CASE WHEN prev IS NULL
                           OR us - prev >= {SESSION_GAP_US}
                      THEN 1 ELSE 0 END AS new_s
            FROM x
        ),
        numbered AS (
            SELECT *, SUM(new_s) OVER (
                PARTITION BY user_id ORDER BY us
                ROWS UNBOUNDED PRECEDING
            ) AS sid
            FROM flagged
        )
        SELECT user_id, MIN(us) AS start_us,
               MAX(us) + {SESSION_GAP_US} AS end_us,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS total_value
        FROM numbered GROUP BY user_id, sid
        """
    ).fetchall()
    (max_us,) = con.execute(
        f"SELECT MAX(epoch_us(ts)) FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()
    con.close()
    final_wm = max_us - SESSION_DELAY_US
    expected = {
        (u, s, e): (n, tv)
        for u, s, e, n, tv in sessions
        if e <= final_wm
    }
    result = {}
    for r in registry.queries()["stream_session_agg"](spark, sf_dir).collect():
        key = (
            r["user_id"],
            int(r["session_start"].timestamp() * 1_000_000),
            int(r["session_end"].timestamp() * 1_000_000),
        )
        result[key] = (r["n_events"], r["total_value"])
    assert len(result) == len(expected)
    assert result == expected


def test_checkpoint_restart_exactly_once(spark, sf_dir):
    """Exactly-once across a query restart: a passthrough stream
    processes half the replay chunks, terminates (availableNow), new
    chunks land, and a SECOND query started from the SAME checkpoint
    must emit only the unseen files — the sink ends with every event
    exactly once. This is the recovery contract every streaming
    operator inherits from the offset/commit WAL (SURVEY §3.3)."""
    import glob
    import os
    import shutil
    import uuid

    from data_webhooks_spark.streaming.core import (
        REPLAY_SCHEMA,
        RUNTIME_DIR,
        replay_dir,
    )

    src = replay_dir(sf_dir)
    chunks = sorted(glob.glob(f"{src}/chunk_*.parquet"))
    assert len(chunks) == 4

    stage = f"{RUNTIME_DIR}/restart/{uuid.uuid4().hex[:8]}"
    indir, ckpt, out = f"{stage}/in", f"{stage}/ckpt", f"{stage}/out"
    os.makedirs(indir)
    for c in chunks[:2]:
        shutil.copy(c, indir)

    def run_to_completion():
        s = (
            spark.readStream.schema(REPLAY_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(indir)
        )
        q = (
            s.select("event_id", "user_id", "event_type")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_to_completion()
    total = spark.read.parquet(*chunks).count()
    n_first = spark.read.parquet(out).count()
    assert 0 < n_first < total  # partial progress was checkpointed

    for c in chunks[2:]:
        shutil.copy(c, indir)
    run_to_completion()

    sink = spark.read.parquet(out)
    assert sink.count() == total  # nothing lost, nothing replayed
    assert sink.select("event_id").distinct().count() == total
