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


def test_rollup_upsert_partial_day(spark, tmp_path):
    """Upsert-store data-loss regression (judge r2 item 4).

    Craft a replay where the FINAL micro-batch updates a day's 'view'
    group but not its 'click' group. Update mode emits only changed
    groups, so if the dynamic-overwrite unit were window_day alone the
    last batch would wipe the day's click rows. The store must keep
    them (partitioning by the full (window_day, event_type) key).
    """
    import pandas as pd

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    # first ts-half (replay chunks 1-2 -> micro-batch 1): clicks + views
    for i in range(8):
        rows.append(
            (i + 1, base + pd.Timedelta(minutes=i), 1,
             "click" if i % 2 else "view", 1.0, "{}")
        )
    # second ts-half (chunks 3-4 -> micro-batch 2): views ONLY, same day
    for i in range(8):
        rows.append(
            (i + 9, base + pd.Timedelta(hours=5, minutes=i), 1,
             "view", 1.0, "{}")
        )
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/events.parquet")

    out = registry.queries()["stream_rollup_upsert"](spark, sf).toPandas()
    clicks = out[out["event_type"] == "click"]
    assert len(clicks) == 1, (
        "day's click rollup lost — overwrite granularity coarser than "
        "the upsert key"
    )
    assert clicks["n"].iloc[0] == 4
    views = out[out["event_type"] == "view"]
    assert len(views) == 1 and views["n"].iloc[0] == 12


def test_funnel_prune_preserves_result_and_bounds_state():
    """stream_funnel state bound (judge r2 item 7).

    Differential simulation: feed randomized event sequences batch by
    batch through the funnel-state logic twice — pruned (production
    rules) vs unpruned (keep everything) — with a watermark advancing
    like Spark's (max event ts seen through the previous batch minus
    delay). The pruned run must produce identical (t1,t2,t3) stages
    after every batch, while its candidate lists stay bounded instead
    of growing with the stream.
    """
    import random

    from data_webhooks_spark.streaming.queries import (
        _funnel_stages,
        _prune_funnel_candidates,
    )

    W = 6 * 3600  # seconds for readability; scale-free logic
    DELAY = 12 * 3600
    rng = random.Random(42)

    for trial in range(25):
        # 40 batches; each batch's events >= wm (Spark guarantees this)
        pruned_c, pruned_p = [], []
        full_c, full_p = [], []
        mv_pruned = mv_full = None
        wm = 0
        max_seen = 0
        peak_pruned = 0
        for b in range(40):
            base = b * 3 * 3600  # batches advance 3h each
            events = []
            for _ in range(rng.randint(5, 40)):
                ts = max(wm, base + rng.randint(-8 * 3600, 8 * 3600))
                events.append((ts, rng.choice(["view", "click", "purchase"])))
            for ts, et in events:
                max_seen = max(max_seen, ts)
                if et == "view":
                    mv_pruned = ts if mv_pruned is None else min(mv_pruned, ts)
                    mv_full = mv_pruned
                elif et == "click":
                    pruned_c.append(ts)
                    full_c.append(ts)
                else:
                    pruned_p.append(ts)
                    full_p.append(ts)
            pruned_c, pruned_p = _prune_funnel_candidates(
                mv_pruned, pruned_c, pruned_p, wm, W
            )
            assert _funnel_stages(mv_pruned, pruned_c, pruned_p, W) == (
                _funnel_stages(mv_full, full_c, full_p, W)
            ), f"pruning changed the funnel result (trial {trial}, batch {b})"
            peak_pruned = max(peak_pruned, len(pruned_c) + len(pruned_p))
            wm = max(wm, max_seen - DELAY)  # Spark: wm trails max event ts
        # unpruned state grows with the stream; pruned must not
        assert len(full_c) + len(full_p) > 4 * peak_pruned, (
            f"prune kept {peak_pruned} vs full {len(full_c) + len(full_p)} — "
            "not meaningfully bounded"
        )


class _FakeGroupState:
    """Minimal GroupState double for driving _funnel_track through
    arbitrary batch/timeout schedules (the production replay runs only
    2 micro-batches, which can never exercise timeout-then-return)."""

    def __init__(self):
        self._val = None
        self.timeout_ms = None
        self.wm_ms = 0
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        return self._val

    def update(self, v):
        self._val = tuple(v)

    def remove(self):
        self._val = None

    def getCurrentWatermarkMs(self):
        return self.wm_ms

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def test_funnel_timeout_then_return_stays_batch_exact():
    """ADVICE r3 (medium): a user whose events resume AFTER the
    settle horizon must not be resurrected with fresh state — under
    the old remove-on-timeout eviction the post-gap rows restarted at
    n=0/min_view=None, and once the resurrected n_seen outgrew the
    settled row's, the final max-n_seen pick reported flags computed
    against the later view. Drive the track protocol through
    batch -> gap(timeouts) -> return and assert the LAST emission
    (highest n_seen) still matches the batch-funnel recomputation over
    ALL events."""
    import pandas as pd

    from data_webhooks_spark.streaming.queries import (
        _FUNNEL_W_NS,
        _funnel_stages,
        _funnel_track,
    )

    H = 3600 * 10**9  # 1 hour in ns
    DAY = 24 * H

    def batch_pdf(events):
        return pd.DataFrame(
            {
                "ts": pd.Series([ts for ts, _ in events], dtype="int64").astype(
                    "datetime64[ns]"
                ),
                "event_type": [et for _, et in events],
            }
        )

    # Era A (day 0): full conversion. Era B (day 60+): a burst of 10
    # clicks — more rows than era A, so a resurrected state would win
    # the max-n_seen pick with viewed=False.
    era_a = [(0 * H, "view"), (1 * H, "click"), (2 * H, "purchase")]
    era_b = [(60 * DAY + k * H, "click") for k in range(10)]

    state = _FakeGroupState()
    emissions = []

    def run_data_batch(events, wm_ms):
        state.wm_ms = wm_ms
        state.hasTimedOut = False
        emissions.extend(
            pd.concat(_funnel_track((7,), [batch_pdf(events)], state)).to_dict(
                "records"
            )
        )

    def run_timeout_batch(wm_ms):
        # Spark fires the timeout only when the watermark passed it and
        # the group has no data this batch.
        state.wm_ms = wm_ms
        if state.timeout_ms is not None and wm_ms > state.timeout_ms:
            state.hasTimedOut = True
            state.timeout_ms = None
            emissions.extend(
                pd.concat(_funnel_track((7,), [], state)).to_dict("records")
            )
            state.hasTimedOut = False

    run_data_batch(era_a, wm_ms=0)
    # Quiet period: watermark advances day by day; timeouts fire (the
    # two-step settle needs at least two firings).
    for day in range(1, 55):
        run_timeout_batch(wm_ms=day * DAY // 1_000_000)
    assert state.exists, "settled state must be KEPT, not removed"
    n_settled, mv, clicks, purchases, _ = state.get
    assert n_settled == 3 and mv == 0
    assert len(clicks) <= 1 and len(purchases) <= 1, "state must compact"
    # The user returns long after the horizon.
    run_data_batch(era_b, wm_ms=54 * DAY // 1_000_000)

    final = max(emissions, key=lambda e: e["n_seen"])
    # Batch recomputation over ALL events = the oracle's semantics.
    all_ts = sorted(era_a + era_b)
    t1 = min((ts for ts, et in all_ts if et == "view"), default=None)
    t2, t3 = _funnel_stages(
        t1,
        [ts for ts, et in all_ts if et == "click"],
        [ts for ts, et in all_ts if et == "purchase"],
        _FUNNEL_W_NS,
    )[1:]
    assert final["n_seen"] == 13, "n_seen must be monotonic across the gap"
    assert final["viewed"] is True and (t1 is not None)
    assert final["clicked"] is (t2 is not None)
    assert final["purchased"] is (t3 is not None)


def test_funnel_query_level_settle_then_return(spark, tmp_path):
    """The settle/timeout protocol driven through the REAL
    applyInPandasWithState query, not the fake GroupState (r4 verdict
    item: the production replay runs only 2 micro-batches, which can
    never exercise eviction+return). A 4-batch replay
    (files_per_trigger=1) over a 60-day synthetic fixture makes the
    event-time timeout fire twice mid-stream (batches 2 and 3 — the
    two-step settle), compact user 7's state, then user 7 RETURNS in
    batch 4. Evidence the path ran inside Spark: user 7 emits exactly
    [3, 3, 3, 4] n_seen rows (data, timeout re-check, timeout settle,
    return), flags stable throughout; the finalized report still
    matches the batch-funnel DuckDB oracle over all events."""
    import duckdb
    import pandas as pd

    from data_webhooks_spark.streaming.queries import (
        _funnel_finalize,
        _funnel_updates,
    )

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    # user 7: full conversion in hour 0-2 (all inside replay chunk 1),
    # then one non-qualifying return click at day 55 (chunk 4).
    for et, h in [("view", 0), ("click", 1), ("purchase", 2)]:
        rows.append((len(rows) + 1, base + pd.Timedelta(hours=h), 7, et, 1.0, "{}"))
    rows.append(
        (len(rows) + 1, base + pd.Timedelta(days=55), 7, "click", 1.0, "{}")
    )
    # 400 filler users, one view each, uniform over 60 days: the
    # ts-quartile chunks span ~15 days each, so the 10-day-delay
    # watermark passes user 7's settle horizon (min_view + 12h) after
    # batch 1 and keeps advancing batch by batch.
    for k in range(400):
        rows.append(
            (
                len(rows) + 1,
                base + pd.Timedelta(minutes=int(k * 60 * 24 * 60 / 400)),
                100 + k,
                "view",
                1.0,
                "{}",
            )
        )
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/events.parquet")

    ups = _funnel_updates(spark, sf, late=False, files_per_trigger=1).cache()
    u7 = sorted(
        (r.asDict() for r in ups.filter("user_id = 7").collect()),
        key=lambda r: r["n_seen"],
    )
    assert [r["n_seen"] for r in u7] == [3, 3, 3, 4], u7
    assert all(
        r["viewed"] and r["clicked"] and r["purchased"] for r in u7
    ), "flags must be stable across settle and return"

    out = _funnel_finalize(ups).toPandas().iloc[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    exp = con.execute(registry.oracle_sql()["stream_funnel"]).df().iloc[0]
    for c in (
        "viewed_users",
        "clicked_users",
        "purchased_users",
        "view_to_click",
        "click_to_purchase",
    ):
        assert out[c] == exp[c], (c, out[c], exp[c])
    ups.unpersist()


def test_funnel_hot_user_state_stays_flat(spark, tmp_path):
    """End-to-end: a hot user clicking hourly for 25 days must not
    accumulate per-click state — after the watermark passes, only the
    candidates inside the conversion horizon survive — while the
    streamed funnel still equals the batch answer."""
    import pandas as pd

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    eid = 0
    # hot user 1: one view, then a click every hour for 25 days
    eid += 1
    rows.append((eid, base, 1, "view", 1.0, "{}"))
    for h in range(1, 600):
        eid += 1
        rows.append((eid, base + pd.Timedelta(hours=h), 1, "click", 1.0, "{}"))
    # user 2: full conversion inside the window
    for et, mins in [("view", 0), ("click", 30), ("purchase", 60)]:
        eid += 1
        rows.append((eid, base + pd.Timedelta(minutes=mins), 2, et, 1.0, "{}"))
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/events.parquet")

    out = registry.queries()["stream_funnel"](spark, sf).toPandas()
    row = out.iloc[0]
    assert row["viewed_users"] == 2
    assert row["clicked_users"] == 2  # user 1's first click is within 6h
    assert row["purchased_users"] == 1


def test_stream_outer_join_late_replay_inner_matches(spark, sf_dir):
    """Robustness of the outer stream-stream join under out-of-order
    arrival: replay with the deterministic late-displacement chunking
    (event_id%37 rows demoted one chunk). Inner matches must STILL
    equal the batch inner join exactly — late rows land inside the 2h
    watermark tolerance, so no match may be lost or duplicated — and
    every NULL emission must be a genuinely unmatched purchase."""
    import duckdb

    from pyspark.sql import functions as F

    from data_webhooks_spark.session import tune
    from data_webhooks_spark.streaming.core import (
        read_replay_stream,
        run_to_table,
    )

    tune(spark)

    def side(et, idc, uc, tc):
        return (
            read_replay_stream(spark, sf_dir, late=True, files_per_trigger=2)
            .filter(F.col("event_type") == et)
            .withWatermark("ts", "2 hours")
            .select(
                F.col("event_id").alias(idc),
                F.col("user_id").alias(uc),
                F.col("ts").alias(tc),
            )
        )

    p = side("purchase", "purchase_id", "p_user", "p_ts")
    c = side("click", "click_id", "c_user", "c_ts")
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left_outer",
    )
    out = run_to_table(joined.select("purchase_id", "click_id"), "append").toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    batch = con.execute(
        """
        SELECT p.event_id AS purchase_id, c.event_id AS click_id
        FROM (SELECT * FROM events WHERE event_type='purchase') p
        JOIN (SELECT * FROM events WHERE event_type='click') c
          ON p.user_id = c.user_id
         AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        """
    ).df()
    unmatched_ids = {
        r[0]
        for r in con.execute(
            """
            SELECT p.event_id FROM events p
            WHERE p.event_type='purchase' AND NOT EXISTS (
                SELECT 1 FROM events c WHERE c.event_type='click'
                AND c.user_id=p.user_id
                AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts)
            """
        ).fetchall()
    }
    con.close()

    got_matched = set(
        map(tuple, out.dropna()[["purchase_id", "click_id"]].astype(int).values)
    )
    want_matched = set(map(tuple, batch.astype(int).values))
    assert got_matched == want_matched  # exactly-once despite late rows
    got_null = set(out[out["click_id"].isna()]["purchase_id"].astype(int))
    assert got_null <= unmatched_ids  # no phantom nulls
    assert len(got_null) > 0


def _run_stream_expect_crash(writer_start):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    q = writer_start()
    try:
        q.awaitTermination()
        raise AssertionError("stream finished without the injected crash")
    except StreamingQueryException:
        pass


def test_cdc_apply_kill_resume_exactly_once(spark, sf_dir, duck):
    """Exactly-once demonstrated, not asserted: crash the CDC stream
    AFTER batch 1's state version hits disk but BEFORE its checkpoint
    commit (the worst-case dirty write), resume from the same
    checkpoint — Structured Streaming replays batch 1, the versioned
    store's strictly-below read makes the replay idempotent, and the
    final state must equal the one-shot batch oracle bit-for-bit."""
    import os
    import uuid

    from data_webhooks_spark import registry
    from data_webhooks_spark.oracle import compare_frames
    from data_webhooks_spark.streaming.core import (
        RUNTIME_DIR,
        read_replay_stream,
    )
    from data_webhooks_spark.streaming.queries import (
        _cdc_merge_batch,
        _cdc_read_state,
    )

    run = uuid.uuid4().hex[:12]
    root = f"{RUNTIME_DIR}/cdcstate/kr_{run}"
    ckpt = f"{RUNTIME_DIR}/ckpt/kr_{run}"
    os.makedirs(root, exist_ok=True)
    mb = _cdc_merge_batch(spark, root)

    def crashing(df, batch_id):
        mb(df, batch_id)  # dirty state version IS on disk...
        if batch_id == 1:
            raise RuntimeError("injected crash before checkpoint commit")

    _run_stream_expect_crash(
        lambda: read_replay_stream(spark, sf_dir, files_per_trigger=1)
        .writeStream.foreachBatch(crashing)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert os.path.isdir(f"{root}/v1")  # the dirty write the crash left

    q2 = (
        read_replay_stream(spark, sf_dir, files_per_trigger=1)
        .writeStream.foreachBatch(mb)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    got = _cdc_read_state(spark, root).toPandas()
    oracle = duck.execute(registry.oracle_sql()["stream_cdc_apply"]).df()
    assert not compare_frames(got, oracle)


def test_rollup_upsert_kill_resume_exactly_once(spark, sf_dir, duck):
    """Same discipline for the partition-overwrite rollup store: crash
    after batch 0's dynamic overwrite, resume, and the served rollup
    must equal the batch aggregate."""
    import uuid

    from data_webhooks_spark import registry
    from data_webhooks_spark.oracle import compare_frames
    from data_webhooks_spark.streaming.core import (
        RUNTIME_DIR,
        read_replay_stream,
    )
    from data_webhooks_spark.streaming.queries import (
        _rollup_agg,
        _rollup_upsert_fn,
    )

    run = uuid.uuid4().hex[:12]
    out = f"{RUNTIME_DIR}/rollup/kr_{run}"
    ckpt = f"{RUNTIME_DIR}/ckpt/kr_{run}"
    upsert = _rollup_upsert_fn(out)

    def crashing(df, batch_id):
        upsert(df, batch_id)
        if batch_id == 0:
            raise RuntimeError("injected crash before checkpoint commit")

    def start(fn):
        return (
            _rollup_agg(read_replay_stream(spark, sf_dir, files_per_trigger=2))
            .writeStream.foreachBatch(fn)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    _run_stream_expect_crash(lambda: start(crashing))
    q2 = start(upsert)
    q2.awaitTermination()

    got = (
        spark.read.parquet(out)
        .select("window_start", "event_type", "n", "total_value")
        .toPandas()
    )
    oracle = duck.execute(registry.oracle_sql()["stream_rollup_upsert"]).df()
    assert not compare_frames(got, oracle)


def test_hll_store_kill_resume_exactly_once(spark, sf_dir):
    """Third versioned store, same discipline: crash after batch 1's
    sketch version hits disk, resume from the checkpoint, and the
    final estimates must cover every group within the exact-count
    tolerance. Unlike the CDC counts, HLL union is a register-max
    CRDT — re-folding a replayed batch is inherently idempotent — so
    this test pins crash-recovery LIVENESS and completeness (the
    resume actually processes the remaining chunks against the dirty
    store) rather than double-count protection; the strictly-below
    read is still what keeps the replay reading a version it did not
    itself half-write."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from data_webhooks_spark.io import Tables
    from data_webhooks_spark.streaming.core import (
        RUNTIME_DIR,
        read_replay_stream,
    )
    from data_webhooks_spark.streaming.queries import _hll_merge_batch

    run = uuid.uuid4().hex[:12]
    root = f"{RUNTIME_DIR}/hllstate/kr_{run}"
    ckpt = f"{RUNTIME_DIR}/ckpt/krh_{run}"
    os.makedirs(root, exist_ok=True)
    mb = _hll_merge_batch(spark, root)

    def crashing(df, batch_id):
        mb(df, batch_id)
        if batch_id == 1:
            raise RuntimeError("injected crash before checkpoint commit")

    def start(fn):
        return (
            read_replay_stream(spark, sf_dir, files_per_trigger=1)
            .writeStream.foreachBatch(fn)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    _run_stream_expect_crash(lambda: start(crashing))
    assert os.path.isdir(f"{root}/v1")
    q2 = start(mb)
    q2.awaitTermination()

    versions = sorted(int(p[1:]) for p in os.listdir(root) if p.startswith("v"))
    st = spark.read.parquet(f"{root}/v{versions[-1]}")
    est = {
        r["event_type"]: r["est"]
        for r in st.select(
            "event_type", F.hll_sketch_estimate("sk").alias("est")
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in Tables(spark, sf_dir)
        .events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, ex in exact.items():
        assert abs(est[k] - ex) <= max(2.0, 0.05 * ex), (k, est[k], ex)


def test_epoch_zero_watermark_boundary(spark, tmp_path):
    """r9 sweep H (measured engine boundary): Spark initializes the
    event-time watermark to 0 ms and dropDuplicatesWithinWatermark's
    late filter is boundary-INCLUSIVE, so an event at exactly
    1970-01-01T00:00:00.000 is silently dropped as late while
    epoch+1ms survives. This pins the stream_dedup input contract
    (event times strictly after the epoch) as observed behavior — if
    a Spark upgrade changes the boundary, this fails loudly and the
    contract text must move with it."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_webhooks_spark.registry import queries
    from data_webhooks_spark.schemas import TABLE_NAMES

    from tests.conftest import SF_SMOKE

    results = {}
    for label, ts in [
        ("epoch0", pd.Timestamp("1970-01-01 00:00:00")),
        ("epoch+1ms", pd.Timestamp("1970-01-01 00:00:00.001")),
    ]:
        d = tmp_path / label
        d.mkdir()
        for t in TABLE_NAMES:
            src = f"{SF_SMOKE}/{t}.parquet"
            dst = str(d / f"{t}.parquet")
            if t != "events":
                os.symlink(src, dst)
                continue
            orig = pq.read_table(src)
            pdf = orig.to_pandas()
            extra = pdf.iloc[[0]].copy()
            extra["event_id"] = pdf["event_id"].max() + 1
            extra["ts"] = ts
            out = pd.concat([pdf, extra], ignore_index=True)
            pq.write_table(
                pa.Table.from_pandas(
                    out, schema=orig.schema, preserve_index=False
                ),
                dst,
            )
        injected = int(pq.read_table(f"{SF_SMOKE}/events.parquet")
                       .to_pandas()["event_id"].max()) + 1
        got = queries()["stream_dedup"](spark, str(d))
        results[label] = got.filter(f"event_id = {injected}").count()
    assert results["epoch0"] == 0, "epoch-0 row unexpectedly admitted"
    assert results["epoch+1ms"] == 1, "epoch+1ms row unexpectedly dropped"


def test_funnel_kill_resume_exactly_once(spark, sf_dir, duck):
    """r9 verdict item 6: kill/resume chaos for the funnel. Crash the
    REAL stateful plan (`_funnel_update_stream`, the exact
    applyInPandasWithState pipeline `stream_funnel` runs) AFTER batch
    1's update emissions are appended to the store but BEFORE the
    checkpoint commit — the worst-case dirty append. Resume from the
    same checkpoint: Structured Streaming replays batch 1 from the
    batch-0 state version, so its emission rows land in the store
    TWICE. The funnel's recovery contract is that duplicated update
    emissions are harmless by construction — `_funnel_finalize` keeps
    only the max-n_seen row per user and n_seen is monotone — so the
    finalized funnel over the dirty store must still equal the batch
    oracle bit-for-bit."""
    import os
    import uuid

    from data_webhooks_spark import registry
    from data_webhooks_spark.oracle import compare_frames
    from data_webhooks_spark.streaming.core import RUNTIME_DIR
    from data_webhooks_spark.streaming.queries import (
        _funnel_finalize,
        _funnel_update_stream,
    )

    run = uuid.uuid4().hex[:12]
    upd = f"{RUNTIME_DIR}/funnel/kr_{run}"
    ckpt = f"{RUNTIME_DIR}/ckpt/krf_{run}"

    def append(df, batch_id):
        df.write.mode("append").parquet(upd)

    def crashing(df, batch_id):
        append(df, batch_id)  # dirty append IS on disk...
        if batch_id == 1:
            raise RuntimeError("injected crash before checkpoint commit")

    def start(fn):
        return (
            _funnel_update_stream(spark, sf_dir, late=True, files_per_trigger=1)
            .writeStream.foreachBatch(fn)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    _run_stream_expect_crash(lambda: start(crashing))
    assert os.path.isdir(upd)  # the dirty batch-1 append the crash left
    q2 = start(append)
    q2.awaitTermination()

    emissions = spark.read.parquet(upd)
    # the dirty append really happened: batch 1 replayed, so at least
    # one user's identical emission row appears more than once
    dup_rows = (
        emissions.groupBy(
            "user_id", "n_seen", "viewed", "clicked", "purchased"
        )
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup_rows > 0, "crash did not produce a duplicated replay batch"

    got = _funnel_finalize(emissions).toPandas()
    oracle = duck.execute(registry.oracle_sql()["stream_funnel"]).df()
    assert not compare_frames(got, oracle)


def test_quantile_kill_resume_exactly_once(spark, sf_dir):
    """Same discipline for the complete-mode KLL aggregate: crash
    after batch 1's full-snapshot overwrite of the serving store,
    resume from the checkpoint, and the final snapshot must reflect
    the WHOLE stream exactly once. Complete mode makes recovery
    idempotent a third way (vs the CDC store's versioned
    strictly-below read and the funnel's monotone reconcile): every
    batch rewrites the entire answer from the aggregation state, so a
    replayed batch simply overwrites the dirty snapshot it half
    -served. Exactness is pinned hard on `n` — per-type row counts in
    the final snapshot must EQUAL the batch counts (a double-fold of
    the replayed chunk would inflate them) — and the KLL median must
    rank-check against the exact per-type distribution."""
    import uuid

    from pyspark.sql import functions as F

    from data_webhooks_spark.io import Tables
    from data_webhooks_spark.streaming.core import (
        RUNTIME_DIR,
        read_replay_stream,
    )
    from data_webhooks_spark.streaming.queries import _quantile_agg

    run = uuid.uuid4().hex[:12]
    out = f"{RUNTIME_DIR}/quantile/kr_{run}"
    ckpt = f"{RUNTIME_DIR}/ckpt/krq_{run}"

    def snapshot(df, batch_id):
        df.write.mode("overwrite").parquet(out)

    def crashing(df, batch_id):
        snapshot(df, batch_id)  # dirty snapshot IS on disk...
        if batch_id == 1:
            raise RuntimeError("injected crash before checkpoint commit")

    def start(fn):
        return (
            _quantile_agg(read_replay_stream(spark, sf_dir, files_per_trigger=1))
            .writeStream.foreachBatch(fn)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    _run_stream_expect_crash(lambda: start(crashing))
    q2 = start(snapshot)
    q2.awaitTermination()

    final = spark.read.parquet(out)
    got_n = {
        r["event_type"]: r["n"] for r in final.select("event_type", "n").collect()
    }
    exact = {
        r["event_type"]: (r["n"], r["p50"])
        for r in Tables(spark, sf_dir)
        .events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.percentile("value", F.lit(0.5)).alias("p50"),
        )
        .collect()
    }
    assert got_n == {k: v[0] for k, v in exact.items()}  # exactly-once counts

    ests = {
        r["event_type"]: r["est"]
        for r in final.filter(F.col("n_vals") > 0)
        .select(
            "event_type",
            F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("est"),
        )
        .collect()
    }
    ranks = {
        r["event_type"]: r["rk"]
        for r in Tables(spark, sf_dir)
        .events.join(
            F.broadcast(
                spark.createDataFrame(
                    [(k, v) for k, v in ests.items()], "et string, est double"
                )
            ),
            F.col("event_type").eqNullSafe(F.col("et")),
        )
        .groupBy("event_type")
        .agg(
            (
                F.sum(F.when(F.col("value") <= F.col("est"), 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("rk")
        )
        .collect()
    }
    for k, rk in ranks.items():
        n = exact[k][0]
        assert abs(rk - 0.5) <= 0.065 + 0.5 / n, (k, rk, ests[k], exact[k])


def test_custom_state_kill_resume_exactly_once(spark, sf_dir, duck):
    """Completes the chaos family: the flagship custom-state operator
    (TWS or the applyInPandasWithState fallback, whichever this
    container runs — both adapters share _cs_transition) crashed
    after batch 1's dirty append and resumed from the checkpoint.
    Recovery contract is the funnel's: n_events is monotone per user,
    so _cs_finalize's max-n_events pick absorbs the duplicated
    replayed emissions, and the final report must equal the batch
    oracle bit-for-bit."""
    import os
    import uuid

    from data_webhooks_spark import registry
    from data_webhooks_spark.oracle import compare_frames
    from data_webhooks_spark.streaming.core import RUNTIME_DIR
    from data_webhooks_spark.streaming.queries import (
        _cs_finalize,
        _cs_update_stream,
    )

    run = uuid.uuid4().hex[:12]
    upd = f"{RUNTIME_DIR}/csstate/kr_{run}"
    ckpt = f"{RUNTIME_DIR}/ckpt/krc_{run}"

    def append(df, batch_id):
        df.write.mode("append").parquet(upd)

    def crashing(df, batch_id):
        append(df, batch_id)  # dirty append IS on disk...
        if batch_id == 1:
            raise RuntimeError("injected crash before checkpoint commit")

    def start(fn):
        return (
            _cs_update_stream(spark, sf_dir, files_per_trigger=1)
            .writeStream.foreachBatch(fn)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    _run_stream_expect_crash(lambda: start(crashing))
    assert os.path.isdir(upd)
    q2 = start(append)
    q2.awaitTermination()

    emissions = spark.read.parquet(upd)
    dup_rows = (
        emissions.groupBy("user_id", "n_events")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup_rows > 0, "crash did not produce a duplicated replay batch"

    got = _cs_finalize(emissions).toPandas()
    oracle = duck.execute(registry.oracle_sql()["stream_custom_state"]).df()
    assert not compare_frames(got, oracle)


def test_stateful_kill_resume_exactly_once(spark, sf_dir, duck):
    """Every custom-state key now carries the chaos discipline:
    stream_stateful (running per-user count/sum with a FLOAT
    accumulator) crashed after batch 1's dirty append and resumed.
    The float state makes this the interesting one: replay restarts
    from the post-batch-0 state snapshot, so the re-folded batch 1
    produces bit-identical totals (same pandas sum over the same
    rows from the same state) — the duplicated emissions are exact
    duplicates and the max-n_events reconcile absorbs them; the
    final report must equal the batch oracle bit-for-bit."""
    import os
    import uuid

    from data_webhooks_spark import registry
    from data_webhooks_spark.oracle import compare_frames
    from data_webhooks_spark.streaming.core import RUNTIME_DIR
    from data_webhooks_spark.streaming.queries import (
        _ss_finalize,
        _ss_update_stream,
    )

    run = uuid.uuid4().hex[:12]
    upd = f"{RUNTIME_DIR}/ssstate/kr_{run}"
    ckpt = f"{RUNTIME_DIR}/ckpt/krs_{run}"

    def append(df, batch_id):
        df.write.mode("append").parquet(upd)

    def crashing(df, batch_id):
        append(df, batch_id)
        if batch_id == 1:
            raise RuntimeError("injected crash before checkpoint commit")

    def start(fn):
        return (
            _ss_update_stream(spark, sf_dir, files_per_trigger=1)
            .writeStream.foreachBatch(fn)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    _run_stream_expect_crash(lambda: start(crashing))
    assert os.path.isdir(upd)
    q2 = start(append)
    q2.awaitTermination()

    emissions = spark.read.parquet(upd)
    dup_rows = (
        emissions.groupBy("user_id", "n_events", "total_value")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup_rows > 0, "crash did not produce a duplicated replay batch"

    got = _ss_finalize(emissions).toPandas()
    oracle = duck.execute(registry.oracle_sql()["stream_stateful"]).df()
    assert not compare_frames(got, oracle)
