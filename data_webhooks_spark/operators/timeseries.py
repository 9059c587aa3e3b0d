"""Time-series operators over the webhook event stream (SURVEY §2.14).

A webhook-analytics engine's users chart their event streams: regular
time grids with gaps filled, smoothed trend lines, and outlier flags.
These are the three canonical shapes — resample+gap-fill, EWMA
smoothing, and robust (MAD) anomaly detection — each expressed as one
declarative Catalyst plan with no Python in the hot path.

Scale notes (100 TB):
- ``ts_resample_gapfill``: the dense spine is ``hours × event_types``
  — bounded by wall-clock time and type cardinality, never by row
  count (a year of hours is 8 760 rows), so the grid build is a
  broadcast-sized cross of two tiny derived tables no matter how big
  the raw events table is. The heavy side is one partial-aggregated
  groupBy over events; the forward-fill window partitions by
  event_type over the *hourly* rollup (≤ spine rows), not raw events.
- ``ts_ewma``: per-user windows give key-cardinality parallelism
  (unlike a per-type window — the `win_ranking` ×100 lesson). The
  weighted fold runs entirely in whole-stage codegen via
  ``zip_with``/``aggregate`` higher-order functions; the frame is a
  fixed 8 rows so per-row state is O(1).
- ``ts_anomaly_mad``: the two join-backs broadcast per-type medians
  (rows = #event_types, bounded); exact percentile state grows with
  distinct values per group — at 100 TB swap ``F.percentile`` for the
  mergeable KLL sketch (`agg_kll_quantile` is the worked pattern).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import Tables
from ..norms import dec_sum, finite_or_null, o_dec_sum, o_qnt, qnt
from ..regutil import registrar

QUERIES: dict = {}
ORACLE: dict = {}
op = registrar(QUERIES, ORACLE)


# Hourly value totals go through the scaled-BIGINT exact-sum discipline
# (norms.py §5.3): raw SUM(double) is summation-order-dependent, and the
# quantized forward-filled mean can flip across a 1e-6 boundary between
# engines. Scale 4 holds every |value|*1e4 well under 2^53.
_SV_SCALE = 4
SV_ORACLE = o_dec_sum("value", "sv", _SV_SCALE)


def _hourly_grid(t):
    """Shared dense-grid construction for the two charting resamplers
    (`ts_resample_gapfill`, `ts_interpolate_linear`): the hourly
    rollup plus the (type × every hour in the global [min, max] range)
    spine.

    Two events passes total (down from a naive four): the grid — type
    set AND global spine bounds — derives from one per-type aggregate
    over the hourly rollup (min rollup hour == trunc(min ts) by
    construction), with the global [h0, h1] spread to the handful of
    type rows by an unpartitioned window over that aggregate-sized
    result. The only other pass is the rollup the grid joins against.

    Outlier-span amplification (r9 sweep H, measured): the grid is
    data-driven, so ONE corrupt timestamp stretches it — an injected
    epoch-1970 + year-2037 pair turns the fixture's ~17k grid rows
    into ~3.0M (596k hours x types; the plan still runs in seconds,
    the cost is output volume). Both engines agree row-for-row on the
    amplified grid (parity verified on the H clone), so this is a
    DOMAIN note, not a correctness gap: at 100 TB gate timestamps
    upstream (dq_freshness's range check is the worked gate) or bound
    the spine to a reporting window before densifying."""
    hourly = t.events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count("*").alias("n"), dec_sum("value", "sv", _SV_SCALE))
    w_all = Window.partitionBy()
    per_type = hourly.groupBy("event_type").agg(
        F.min("hour").alias("t0"), F.max("hour").alias("t1")
    )
    grid = (
        per_type.select(
            "event_type",
            F.min("t0").over(w_all).alias("h0"),
            F.max("t1").over(w_all).alias("h1"),
        )
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    return hourly, grid


@op(
    "ts_resample_gapfill",
    sql=f"""
    WITH b AS (
        SELECT date_trunc('hour', min(ts)) AS h0,
               date_trunc('hour', max(ts)) AS h1
        FROM events
    ),
    spine AS (
        SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        FROM b
    ),
    grid AS (
        SELECT hour, event_type
        FROM spine CROSS JOIN (SELECT DISTINCT event_type FROM events)
    ),
    hourly AS (
        SELECT date_trunc('hour', ts) AS hour, event_type,
               COUNT(*) AS n, {SV_ORACLE}
        FROM events GROUP BY 1, 2
    )
    SELECT g.event_type, g.hour,
           CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events,
           FLOOR(last_value(h.sv / h.n IGNORE NULLS) OVER (
                     PARTITION BY g.event_type ORDER BY g.hour
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) * 1e6 + 0.5) / 1e6 AS avg_fill
    FROM grid g LEFT JOIN hourly h
      ON g.hour = h.hour AND g.event_type = h.event_type
    """,
)
def ts_resample_gapfill(spark, sf_dir):
    """Resample events to a dense hourly grid per event_type: empty
    hours appear with n_events=0 and the hourly mean value
    forward-filled from the last observed hour (NULL before the first
    observation — both engines agree).

    The spine is generated from the data's own [min, max] hour range
    (`sequence` + `explode`), crossed with the distinct type set —
    both derived tables are aggregate-sized, so the cross is bounded
    regardless of raw volume (see `_hourly_grid`). One shuffle for the
    hourly rollup, one tiny window over the rollup for the fill."""
    t = Tables(spark, sf_dir)
    hourly, grid = _hourly_grid(t)
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(hourly, ["hour", "event_type"], "left").select(
        "event_type",
        "hour",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        qnt(F.last(F.col("sv") / F.col("n"), ignorenulls=True).over(w), "avg_fill"),
    )


_EWMA_ALPHA = 0.3
_EWMA_N = 8
_EWMA_W = [(1.0 - _EWMA_ALPHA) ** j for j in range(_EWMA_N)]  # newest first
_EWMA_NORM = sum(_EWMA_W)


def _ewma_oracle() -> str:
    # Fold terms newest->oldest with left-assoc addition: the exact
    # IEEE operation sequence Spark's aggregate() lambda performs, so
    # the doubles are bit-identical before quantization. DuckDB lists
    # are 1-based: vs[8] is the current row, vs[8-j] is j rows back.
    terms = " + ".join(
        f"vs[{_EWMA_N - j}] * {w!r}" for j, w in enumerate(_EWMA_W)
    )
    return f"""
    WITH w AS (
        SELECT user_id, event_id, value,
               list(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {_EWMA_N - 1} PRECEDING AND CURRENT ROW
               ) AS vs
        FROM events WHERE value IS NOT NULL
    )
    SELECT user_id, event_id, value,
           {o_qnt(f"(0.0 + {terms}) / {_EWMA_NORM!r}", "ewma")}
    FROM w WHERE len(vs) = {_EWMA_N}
    """


@op("ts_ewma", sql=_ewma_oracle())
def ts_ewma(spark, sf_dir):
    """Exponentially weighted moving average of each user's event
    values (alpha=0.3) over a fixed 8-row frame, emitted only for full
    frames so the smoothing horizon is uniform.

    The frame values are gathered with collect_list over a per-user
    window (frame order is the window order, ascending), then the
    weighted fold runs in codegen: reverse -> zip_with(weights) ->
    aggregate(+). Per-user partitioning keeps parallelism at key
    cardinality; the oracle replays the identical IEEE add sequence so
    both engines quantize the same double."""
    t = Tables(spark, sf_dir)
    w8 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_N - 1), 0)
    )
    weights = F.array(*[F.lit(w) for w in _EWMA_W])
    # NULL measurements are excluded from the series EXPLICITLY on
    # both engines: Spark's collect_list silently skips NULLs while
    # DuckDB's list() keeps them, so an implicit series would shift
    # frames differently per engine (caught by the NULL-injection
    # sweep; semantics: frames span the surviving points).
    frames = t.events.filter(F.col("value").isNotNull()).select(
        "user_id",
        "event_id",
        "value",
        F.collect_list("value").over(w8).alias("vs"),
    ).filter(F.size("vs") == _EWMA_N)
    ewma = (
        F.aggregate(
            F.zip_with(F.reverse("vs"), weights, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.lit(_EWMA_NORM)
    )
    return frames.select("user_id", "event_id", "value", qnt(ewma, "ewma"))


_MAD_K = 1.4826  # consistency constant: MAD * 1.4826 ~ sigma for normal data
_MAD_CUT = 3.0 * _MAD_K


@op(
    "ts_anomaly_mad",
    sql=f"""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.event_id, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type, d.event_id, d.value,
           {o_qnt(f"(d.value - d.med) / ({_MAD_K!r} * m.mad)", "robust_z")}
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    WHERE d.adev > {_MAD_CUT!r} * m.mad
    """,
)
def ts_anomaly_mad(spark, sf_dir):
    """Robust outlier detection: flag events whose value deviates from
    the per-type median by more than 3 sigma-equivalents, where sigma
    is estimated as 1.4826 x the median absolute deviation — the
    standard robust z-score (unlike mean/stddev, immune to the
    outliers it is hunting).

    Two aggregate passes (median, then MAD of deviations) with the
    tiny per-type stats broadcast back; the filter and score are plain
    codegen expressions. Exact percentile state grows with distinct
    values per group — the 100 TB swap is the mergeable KLL sketch
    (see agg_kll_quantile)."""
    t = Tables(spark, sf_dir)
    med = t.events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = t.events.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("adev") > F.lit(_MAD_CUT) * F.col("mad"))
        .select(
            "event_type",
            "event_id",
            "value",
            qnt(
                (F.col("value") - F.col("med")) / (F.lit(_MAD_K) * F.col("mad")),
                "robust_z",
            ),
        )
    )


_MED_N = 9  # odd frame => the median is a single order statistic


@op(
    "ts_moving_median",
    sql=f"""
    WITH framed AS (
        SELECT user_id, event_id, value,
               list(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {_MED_N - 1} PRECEDING AND CURRENT ROW
               ) AS vs
        FROM events WHERE value IS NOT NULL
    )
    SELECT user_id, event_id, value,
           list_sort(vs)[{(_MED_N + 1) // 2}] AS med
    FROM framed WHERE len(vs) = {_MED_N}
    """,
)
def ts_moving_median(spark, sf_dir):
    """Rolling EXACT median of each user's last 9 event values — the
    robust smoothing twin of ts_ewma (a single spike cannot move the
    median, while it drags any mean-based smoother).

    SQL has no native median-over-moving-frame; the composition is
    the same frame-gather trick as the EWMA: collect_list over the
    9-row window, array_sort, pick the middle order statistic — all
    codegen, O(frame log frame) per row with O(frame) state, emitted
    for full frames only so the statistic is uniform. The odd frame
    makes the median one exact element: no interpolation, so the
    doubles are bit-identical across engines with no rounding step."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_MED_N - 1), 0)
    )
    # explicit NULL-measurement exclusion — see ts_ewma
    framed = t.events.filter(F.col("value").isNotNull()).select(
        "user_id",
        "event_id",
        "value",
        F.collect_list("value").over(w).alias("vs"),
    ).filter(F.size("vs") == _MED_N)
    return framed.select(
        "user_id",
        "event_id",
        "value",
        F.element_at(F.array_sort("vs"), (_MED_N + 1) // 2).alias("med"),
    )


@op(
    "ts_interpolate_linear",
    sql=f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour, event_type,
               COUNT(*) AS n, {SV_ORACLE}
        FROM events GROUP BY 1, 2
    ),
    b AS (
        SELECT event_type, min(hour) AS t0, max(hour) AS t1 FROM hourly
        GROUP BY event_type
    ),
    bb AS (
        SELECT event_type, min(t0) OVER () AS h0, max(t1) OVER () AS h1
        FROM b
    ),
    grid AS (
        SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
            AS hour
        FROM bb
    ),
    indexed AS (
        SELECT g.event_type, g.hour, h.n, h.sv / h.n AS mean_v,
               row_number() OVER (
                   PARTITION BY g.event_type ORDER BY g.hour
               ) AS idx
        FROM grid g LEFT JOIN hourly h
          ON g.hour = h.hour AND g.event_type = h.event_type
    ),
    joined AS (
        SELECT event_type, hour, n, mean_v, idx,
               last_value(CASE WHEN n IS NOT NULL THEN mean_v END
                          IGNORE NULLS) OVER wp AS pval,
               last_value(CASE WHEN n IS NOT NULL THEN idx END
                          IGNORE NULLS) OVER wp AS pidx,
               first_value(CASE WHEN n IS NOT NULL THEN mean_v END
                           IGNORE NULLS) OVER wf AS nval,
               first_value(CASE WHEN n IS NOT NULL THEN idx END
                           IGNORE NULLS) OVER wf AS nidx
        FROM indexed
        WINDOW
          wp AS (PARTITION BY event_type ORDER BY hour
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wf AS (PARTITION BY event_type ORDER BY hour
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, hour,
           n IS NOT NULL AS observed,
           FLOOR((CASE
               WHEN n IS NOT NULL THEN mean_v
               WHEN pval IS NULL OR nval IS NULL THEN NULL
               ELSE pval + (nval - pval)
                    * ((idx - pidx) / CAST(nidx - pidx AS DOUBLE))
           END) * 1e6 + 0.5) / 1e6 AS v_interp
    FROM joined
    """,
)
def ts_interpolate_linear(spark, sf_dir):
    """Linear interpolation of missing hourly means per event type —
    the charting companion to ts_resample_gapfill's LOCF fill: gaps
    take the straight line between the neighboring observed hours
    (NULL outside the observed range, where no line exists).

    Same bounded-grid construction as the gapfill (spine = hours x
    types, aggregate-sized regardless of raw volume); the neighbor
    lookup is two RUNNING window passes over the grid — backward
    neighbors as last-ignorenulls over ascending hours, forward
    neighbors as last-ignorenulls over DESCENDING hours. Both are
    UNBOUNDED PRECEDING..CURRENT frames, which Spark evaluates with
    O(1) running state per row; the r9-sweep-H original used
    first-ignorenulls over CURRENT..UNBOUNDED FOLLOWING, which Spark
    rescans per row — quadratic in the longest NULL gap (a single
    epoch-1970 outlier timestamp made the 596k-hour amplified grid
    take >35 min; the descending rewrite runs it in seconds; same
    ascending-hour output). The second sort is sortWithinPartitions
    only — the partitioning is unchanged, no extra shuffle. The
    interpolation x-axis is the dense grid's ROW INDEX rather than
    epoch arithmetic: integer-derived fractions are bit-identical
    across engines (the grid step is exactly one hour, so index
    distance == hour distance). Grid construction is shared with the
    gapfill twin (`_hourly_grid`)."""
    t = Tables(spark, sf_dir)
    hourly, grid = _hourly_grid(t)
    wo = Window.partitionBy("event_type").orderBy("hour")
    wp = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wb = (
        Window.partitionBy("event_type")
        .orderBy(F.col("hour").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    j = grid.join(hourly, ["hour", "event_type"], "left").select(
        "event_type",
        "hour",
        "n",
        (F.col("sv") / F.col("n")).alias("mean_v"),
    )
    obs = F.col("n").isNotNull()
    j = j.withColumn("idx", F.row_number().over(wo))
    j = (
        j.withColumn(
            "pval", F.last(F.when(obs, F.col("mean_v")), True).over(wp)
        )
        .withColumn("pidx", F.last(F.when(obs, F.col("idx")), True).over(wp))
        .withColumn(
            "nval", F.last(F.when(obs, F.col("mean_v")), True).over(wb)
        )
        .withColumn("nidx", F.last(F.when(obs, F.col("idx")), True).over(wb))
    )
    lerp = F.col("pval") + (F.col("nval") - F.col("pval")) * (
        (F.col("idx") - F.col("pidx"))
        / (F.col("nidx") - F.col("pidx")).cast("double")
    )
    v = (
        F.when(obs, F.col("mean_v"))
        .when(F.col("pval").isNull() | F.col("nval").isNull(), F.lit(None))
        .otherwise(lerp)
    )
    return j.select(
        "event_type",
        "hour",
        obs.alias("observed"),
        qnt(v, "v_interp"),
    )



@op(
    "ts_autocorr",
    sql="""
    WITH hourly AS (
        SELECT event_type,
               epoch_us(date_trunc('hour', ts)) // 3600000000 AS hn,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type, l.lag, a.n AS x, b.n AS y
        FROM hourly a
        CROSS JOIN unnest([1, 2, 3]) AS l(lag)
        JOIN hourly b
          ON b.event_type = a.event_type AND b.hn = a.hn - l.lag
    ),
    m AS (
        SELECT event_type, lag,
               COUNT(*) AS n_pairs,
               CAST(COUNT(*) AS DOUBLE) AS nd,
               CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) AS sx,
               CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) AS sy,
               CAST(CAST(SUM(x * x) AS BIGINT) AS DOUBLE) AS sxx,
               CAST(CAST(SUM(y * y) AS BIGINT) AS DOUBLE) AS syy,
               CAST(CAST(SUM(x * y) AS BIGINT) AS DOUBLE) AS sxy
        FROM pairs GROUP BY event_type, lag
    )
    SELECT event_type, lag, n_pairs,
           FLOOR(((nd * sxy - sx * sy) /
                  nullif(sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy),
                         0.0))
                 * 1e6 + 0.5) / 1e6 AS acf
    FROM m
    """,
)
def ts_autocorr(spark, sf_dir):
    """Lag-1/2/3 autocorrelation of each event type's hourly count
    series — the seasonality/burstiness diagnostic behind anomaly
    thresholds and forecast-model choices. A pair forms for every
    (hn, hn - L) where BOTH hours exist, via an equi-join on the
    integer hour index — NOT a row-based lag window, which would
    silently require the intervening L-1 hours to exist too and drop
    valid pairs around gaps. Pearson r per (type, lag) comes from
    exact BIGINT moment sums + one fixed double expression — the
    agg_corr determinism discipline applied to a time-shifted
    self-pairing (NULLIF guards constant series).

    Cost shape: one map-combined rollup shuffle (events -> type x hour,
    spine-bounded like ts_resample_gapfill), then the lag explode and
    self-join triple only the aggregate-sized hourly table; AQE
    broadcasts it. Nothing downstream of the rollup ever touches raw
    event rows, so the whole diagnostic is O(#types x #hours) past the
    first aggregate regardless of corpus size."""
    t = Tables(spark, sf_dir)
    hourly = t.events.groupBy(
        "event_type",
        (
            F.unix_micros(F.date_trunc("hour", "ts").cast("timestamp"))
            / F.lit(3_600_000_000)
        )
        .cast("long")
        .alias("hn"),
    ).agg(F.count(F.lit(1)).alias("n"))
    a = hourly.select(
        "event_type",
        "hn",
        F.col("n").alias("x"),
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("lag"),
    )
    b = hourly.select(
        "event_type", F.col("hn").alias("bhn"), F.col("n").alias("y")
    )
    pairs = a.join(
        b,
        (a["event_type"] == b["event_type"])
        & (b["bhn"] == a["hn"] - a["lag"]),
    ).select(a["event_type"], "lag", "x", "y")
    m = (
        pairs.groupBy("event_type", "lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("x").alias("isx"),
            F.sum("y").alias("isy"),
            F.sum(F.col("x") * F.col("x")).alias("isxx"),
            F.sum(F.col("y") * F.col("y")).alias("isyy"),
            F.sum(F.col("x") * F.col("y")).alias("isxy"),
        )
        .select(
            "event_type",
            "lag",
            "n_pairs",
            F.col("n_pairs").cast("double").alias("nd"),
            F.col("isx").cast("double").alias("sx"),
            F.col("isy").cast("double").alias("sy"),
            F.col("isxx").cast("double").alias("sxx"),
            F.col("isyy").cast("double").alias("syy"),
            F.col("isxy").cast("double").alias("sxy"),
        )
    )
    return m.select(
        "event_type",
        "lag",
        "n_pairs",
        qnt(
            F.expr(
                "(nd * sxy - sx * sy) / "
                "nullif(sqrt(nd * sxx - sx * sx)"
                " * sqrt(nd * syy - sy * sy), 0.0)"
            ),
            "acf",
        ),
    )


@op(
    "ts_holt",
    sql="""
    WITH RECURSIVE hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT event_type, hour, y,
               row_number() OVER (PARTITION BY event_type ORDER BY hour)
                   AS rn
        FROM hourly
    ),
    r AS (
        SELECT event_type, rn, hour, y,
               CAST(y * 1000 AS DOUBLE) AS l,
               CAST(0.0 AS DOUBLE) AS b,
               CAST(NULL AS DOUBLE) AS f
        FROM series WHERE rn = 1
        UNION ALL
        SELECT s.event_type, s.rn, s.hour, s.y,
               FLOOR((s.y * 1000 + r.l + r.b) / 2.0) AS l,
               FLOOR((FLOOR((s.y * 1000 + r.l + r.b) / 2.0) - r.l + r.b)
                     / 2.0) AS b,
               r.l + r.b AS f
        FROM r JOIN series s
          ON s.event_type = r.event_type AND s.rn = r.rn + 1
    )
    SELECT event_type, hour, y AS n,
           f / 1000 AS forecast, l / 1000 AS level, b / 1000 AS trend
    FROM r WHERE rn >= 2
    """,
)
def ts_holt(spark, sf_dir):
    """Holt's linear (double) exponential smoothing of the hourly
    event-count series per event type — level + trend state, the
    classic short-horizon forecaster a webhook-analytics dashboard
    draws as the "expected traffic" band (and the one-step forecast
    column is exactly what `stream_anomaly`-style alerting thresholds
    against). alpha = beta = 1/2.

    Cross-engine determinism is the integer-unit-iteration recipe:
    the recursion runs in milli-units with an explicit FLOOR after
    every update, so level/trend stay exact integers (stored in
    doubles far below 2^53) and both engines replay the identical
    state sequence — no accumulated float drift, no summation-order
    sensitivity, unlike a naive float recursion. Spark folds each
    type's time-sorted array in one codegen aggregate() (5 series x
    ~720 points — per-series state is 2 numbers, the array bound is
    the series length, same shape ts_ewma pins); the oracle replays
    the recursion as a recursive CTE stepping all series in lockstep.
    Gaps: smoothing steps over OBSERVED hours (compose with
    ts_resample_gapfill upstream for calendar-regular steps).

    At 100 TB: the hourly pre-aggregate is the data-sized stage
    (map-side combinable); the fold runs over |types| bounded arrays.
    For ultra-long series the same update is expressible with
    transformWithStateInPandas on the stream — this batch key is its
    deterministic yardstick."""
    t = Tables(spark, sf_dir)
    hourly = t.events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    arr = hourly.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("hour", "y"))).alias("pts")
    )

    # date_trunc returns TIMESTAMP (session-tz UTC), so the
    # accumulator's row type must match it, not the source ts's NTZ
    row_t = (
        "struct<hour:timestamp,n:bigint,forecast:double,"
        "level:double,trend:double>"
    )
    acc_t = f"struct<started:boolean,l:double,b:double,out:array<{row_t}>>"
    init = F.expr(
        f"cast(named_struct('started', false, 'l', 0.0d, 'b', 0.0d,"
        f" 'out', array()) as {acc_t})"
    )

    def step(acc, x):
        y_mu = x["y"].cast("double") * 1000.0
        f_mu = acc["l"] + acc["b"]
        l_new = F.floor((y_mu + f_mu) / 2.0).cast("double")
        b_new = F.floor((l_new - acc["l"] + acc["b"]) / 2.0).cast("double")
        row = F.struct(
            x["hour"].alias("hour"),
            x["y"].alias("n"),
            (f_mu / 1000.0).alias("forecast"),
            (l_new / 1000.0).alias("level"),
            (b_new / 1000.0).alias("trend"),
        )
        return F.when(
            ~acc["started"],
            F.struct(
                F.lit(True).alias("started"),
                y_mu.alias("l"),
                F.lit(0.0).alias("b"),
                acc["out"].alias("out"),
            ),
        ).otherwise(
            F.struct(
                F.lit(True).alias("started"),
                l_new.alias("l"),
                b_new.alias("b"),
                F.concat(acc["out"], F.array(row)).alias("out"),
            )
        )

    folded = arr.select(
        "event_type",
        F.aggregate(F.col("pts"), init, step)["out"].alias("out"),
    )
    return folded.select(
        "event_type", F.explode("out").alias("r")
    ).select(
        "event_type",
        F.col("r.hour").alias("hour"),
        F.col("r.n").alias("n"),
        F.col("r.forecast").alias("forecast"),
        F.col("r.level").alias("level"),
        F.col("r.trend").alias("trend"),
    )


@op(
    "ts_changepoint_cusum",
    sql="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS h,
               CAST(SUM(y) AS BIGINT) AS total
        FROM hourly GROUP BY event_type
    ),
    dev AS (
        SELECT hh.event_type, hh.hour, hh.y,
               hh.y * t.h - t.total AS dev_scaled, t.h
        FROM hourly hh JOIN tot t ON hh.event_type = t.event_type
    ),
    cs AS (
        SELECT event_type, hour, y, h,
               CAST(SUM(dev_scaled) OVER (
                   PARTITION BY event_type ORDER BY hour
               ) AS BIGINT) AS cusum_scaled
        FROM dev
    )
    SELECT event_type, hour AS cp_hour, CAST(h AS BIGINT) AS n_hours,
           cusum_scaled AS cusum_scaled
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY event_type
            ORDER BY abs(cusum_scaled) DESC, hour
        ) AS rn FROM cs
    ) WHERE rn = 1
    """,
)
def ts_changepoint_cusum(spark, sf_dir):
    """CUSUM change-point detection on each type's hourly count
    series: the hour where the cumulative deviation from the series
    mean peaks in magnitude — the classic single-change estimator
    (Page 1954; the offline argmax-|CUSUM| form), i.e. where the
    traffic level most plausibly shifted. Pairs with `ts_anomaly_mad`
    (point outliers) and `drift_ks_test` (distribution drift): this
    one localizes WHEN a level change happened.

    Determinism is pure integers: deviations are scaled by the series
    length (dev = y·H − total) so the mean never becomes a float, the
    running sum is an exact BIGINT prefix (one per-type window over
    the aggregate-sized hourly table — never the raw events), and the
    argmax tiebreak is (|cusum| desc, hour asc) on both engines.
    `cusum_scaled` is in count·H units; divide by H for the
    mean-deviation reading."""
    t = Tables(spark, sf_dir)
    hourly = t.events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    tot = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("h"),
        F.sum("y").cast("long").alias("total"),
    )
    dev = hourly.join(F.broadcast(tot), "event_type").withColumn(
        "dev_scaled", F.col("y") * F.col("h") - F.col("total")
    )
    wcs = Window.partitionBy("event_type").orderBy("hour")
    cs = dev.withColumn(
        "cusum_scaled", F.sum("dev_scaled").over(wcs).cast("long")
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum_scaled")).desc(), F.col("hour")
    )
    return (
        cs.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("hour").alias("cp_hour"),
            F.col("h").alias("n_hours"),
            "cusum_scaled",
        )
    )


@op(
    "ts_seasonal_profile",
    sql="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS slot,
               CAST(hour(ts) AS INT) AS hod,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2, 3
    ),
    per_hod AS (
        SELECT event_type, hod,
               CAST(COUNT(*) AS BIGINT) AS n_slots,
               CAST(SUM(y) AS BIGINT) AS s
        FROM hourly GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type,
               CAST(SUM(n_slots) AS BIGINT) AS nn,
               CAST(SUM(s) AS BIGINT) AS ss
        FROM per_hod GROUP BY event_type
    )
    SELECT p.event_type, p.hod, p.n_slots,
           FLOOR(CAST(p.s AS DOUBLE) / p.n_slots * 1e6 + 0.5)
               / 1e6 AS mean_count,
           FLOOR(CAST(p.s AS DOUBLE) * t.nn
                 / (CAST(p.n_slots AS DOUBLE) * t.ss) * 1e6 + 0.5)
               / 1e6 AS seasonal_index
    FROM per_hod p JOIN tot t ON p.event_type = t.event_type
    """,
)
def ts_seasonal_profile(spark, sf_dir):
    """Hour-of-day seasonality profile per event type: the mean hourly
    count in each of the 24 daily slots and its ratio to the type's
    overall hourly mean (seasonal index; >1 = peak hour) — the
    additive-decomposition seasonal component every traffic dashboard
    overlays, and the normalizer `ts_holt`-style forecasts multiply
    back in. Means are over OBSERVED slots (hours with ≥1 event),
    stated in the contract so both engines derive the identical
    denominator.

    All counts are exact BIGINTs from two nested rollups of the
    hourly aggregate (map-side combinable; the raw table is touched
    once); index = s·N / (n·S) is one fixed double expression over
    four exact integers, quantized. The per-type totals broadcast —
    output is ≤ |types|·24 rows at any corpus size."""
    t = Tables(spark, sf_dir)
    hourly = t.events.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").alias("slot"),
        F.hour("ts").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    per_hod = hourly.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).cast("long").alias("n_slots"),
        F.sum("y").cast("long").alias("s"),
    )
    tot = per_hod.groupBy("event_type").agg(
        F.sum("n_slots").cast("long").alias("nn"),
        F.sum("s").cast("long").alias("ss"),
    )
    return per_hod.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "hod",
        "n_slots",
        qnt(F.col("s").cast("double") / F.col("n_slots"), "mean_count"),
        qnt(
            F.col("s").cast("double")
            * F.col("nn")
            / (F.col("n_slots").cast("double") * F.col("ss")),
            "seasonal_index",
        ),
    )


# M4 pixel buckets: 6-hour wall-clock cells. Integer microseconds with
# truncating division (timestamps are positive, so Spark `div` and
# DuckDB `//` agree); the bucket id is exact on both engines.
_M4_WIDTH_US = 6 * 3600 * 1_000_000


@op(
    "ts_downsample_m4",
    sql=f"""
    WITH e AS (
        SELECT event_type,
               epoch_us(ts) // {_M4_WIDTH_US} AS bucket,
               ts, event_id, value
        FROM events WHERE value IS NOT NULL
    ),
    fs AS (
        SELECT *, row_number() OVER (PARTITION BY event_type, bucket
                   ORDER BY ts ASC, event_id ASC) AS rn FROM e
    ),
    ls AS (
        SELECT *, row_number() OVER (PARTITION BY event_type, bucket
                   ORDER BY ts DESC, event_id DESC) AS rn FROM e
    ),
    mn AS (
        SELECT *, row_number() OVER (PARTITION BY event_type, bucket
                   ORDER BY value ASC, ts ASC, event_id ASC) AS rn FROM e
    ),
    mx AS (
        SELECT *, row_number() OVER (PARTITION BY event_type, bucket
                   ORDER BY value DESC, ts DESC, event_id DESC) AS rn FROM e
    ),
    cnt AS (
        SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS n
        FROM e GROUP BY 1, 2
    )
    SELECT c.event_type, c.bucket, c.n,
           f.ts AS first_ts, f.value AS first_val,
           l.ts AS last_ts,  l.value AS last_val,
           n2.value AS min_val, n2.ts AS min_ts,
           x.value AS max_val, x.ts AS max_ts
    FROM cnt c
    JOIN fs f ON f.event_type IS NOT DISTINCT FROM c.event_type AND f.bucket = c.bucket
             AND f.rn = 1
    JOIN ls l ON l.event_type IS NOT DISTINCT FROM c.event_type AND l.bucket = c.bucket
             AND l.rn = 1
    JOIN mn n2 ON n2.event_type IS NOT DISTINCT FROM c.event_type AND n2.bucket = c.bucket
              AND n2.rn = 1
    JOIN mx x ON x.event_type IS NOT DISTINCT FROM c.event_type AND x.bucket = c.bucket
             AND x.rn = 1
    """,
)
def ts_downsample_m4(spark, sf_dir):
    """M4 chart downsampling (Jugel et al., VLDB 2014): per
    (event_type, 6-hour pixel bucket) the four rows a line chart
    actually renders — first, last, min and max of `value`, each with
    its timestamp — plus the bucket row count. This is THE published
    error-free downsampling for line visualization: a width-w pixel
    column drawn from {first,last,min,max} is pixel-identical to one
    drawn from all points, so a dashboard over a 100 TB event table
    ships |types|·|pixels| rows to the browser instead of the table.

    One hash aggregate, map-side combinable, no window/sort of the raw
    table: every extreme is a lexicographic struct-min/max (the
    `agg_minmax_by` idiom) so ties resolve deterministically
    ((ts,event_id) for first/last; (value,ts,event_id) for min/max)
    and the shuffle carries |types|·|buckets| structs. The oracle
    spells the identical tiebreaks as row_number orderings. No float
    arithmetic anywhere — outputs are existing rows' values."""
    t = Tables(spark, sf_dir)
    # NULL measurements carry no pixel — excluded on both engines
    # (NULL-injection sweep: Spark's struct-min treats a NULL field
    # as smallest while DuckDB orders NULLS LAST)
    e = t.events.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "ts",
        "event_id",
        "value",
    ).select(
        "event_type",
        F.expr(f"us div {_M4_WIDTH_US}").alias("bucket"),
        "ts",
        "event_id",
        "value",
    )
    g = e.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min(F.struct("ts", "event_id", "value")).alias("fs"),
        F.max(F.struct("ts", "event_id", "value")).alias("ls"),
        F.min(F.struct("value", "ts", "event_id")).alias("mn"),
        F.max(F.struct("value", "ts", "event_id")).alias("mx"),
    )
    return g.select(
        "event_type",
        "bucket",
        "n",
        F.col("fs.ts").alias("first_ts"),
        F.col("fs.value").alias("first_val"),
        F.col("ls.ts").alias("last_ts"),
        F.col("ls.value").alias("last_val"),
        F.col("mn.value").alias("min_val"),
        F.col("mn.ts").alias("min_ts"),
        F.col("mx.value").alias("max_val"),
        F.col("mx.ts").alias("max_ts"),
    )


@op(
    "ts_period_delta",
    sql=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR((CASE WHEN ABS(value) <= 1.7976931348623157e308 THEN value END) * 10000.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS sv_units
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, n,
           lag(n) OVER w AS prev_n,
           n - lag(n) OVER w AS delta_n,
           FLOOR(CAST(n - lag(n) OVER w AS DOUBLE)
                 / NULLIF(lag(n) OVER w, 0) * 1e6 + 0.5)
               / 1e6 AS pct_change_n,
           CAST(sv_units AS DOUBLE) / 10000.0 AS sum_value,
           CAST(sv_units - lag(sv_units) OVER w AS DOUBLE) / 10000.0
               AS delta_value
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
)
def ts_period_delta(spark, sf_dir):
    """Period-over-period dashboard deltas: per event type and DAY,
    the event count and value total next to yesterday's, the absolute
    delta, and the percent change — the day-over-day growth row every
    webhook-analytics overview page leads with.

    Determinism: counts are BIGINTs; value totals are summed as exact
    1e-4-unit BIGINTs (events.value is non-negative in this corpus,
    stated contract — the sign-branched norms rounding reduces to one
    FLOOR) and the unit DIFFERENCE is taken in BIGINT before the one
    display division, so delta_value is bit-exact even though two
    quantized doubles differing by an ulp would not be. pct_change is
    one quantized double ratio with a NULLIF(prev, 0) guard; first day
    per type is NULL on both engines.

    Scale: one map-side-combinable groupBy collapses the raw stream to
    |types| x |days| rows; the lag window runs over that aggregate-
    sized table partitioned by type — per-type days are wall-clock-
    bounded (365/yr), so the window state is trivially small at any
    corpus size and the heavy input is touched exactly once."""
    t = Tables(spark, sf_dir)
    daily = t.events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.floor(finite_or_null("value") * 10000.0 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("sv_units"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    prev_n = F.lag("n").over(w)
    prev_sv = F.lag("sv_units").over(w)
    return daily.select(
        "event_type",
        "day",
        "n",
        prev_n.alias("prev_n"),
        (F.col("n") - prev_n).alias("delta_n"),
        qnt(
            (F.col("n") - prev_n).cast("double")
            / F.nullif(prev_n, F.lit(0)).cast("double"),
            "pct_change_n",
        ),
        (F.col("sv_units").cast("double") / 10000.0).alias("sum_value"),
        (
            (F.col("sv_units") - prev_sv).cast("double") / 10000.0
        ).alias("delta_value"),
    )


@op(
    "ts_stl_decompose",
    sql=f"""
    WITH b AS (
        SELECT date_trunc('hour', min(ts)) AS h0,
               date_trunc('hour', max(ts)) AS h1
        FROM events
    ),
    spine AS (
        SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        FROM b
    ),
    grid AS (
        SELECT hour, event_type
        FROM spine CROSS JOIN (SELECT DISTINCT event_type FROM events)
    ),
    hourly AS (
        SELECT date_trunc('hour', ts) AS hour, event_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    dense AS (
        SELECT g.event_type, g.hour,
               CAST(COALESCE(h.n, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN hourly h
          ON g.hour = h.hour AND g.event_type = h.event_type
    ),
    w AS (
        SELECT event_type, hour,
               CAST(EXTRACT(hour FROM hour) AS BIGINT) AS hod, y,
               CASE WHEN COUNT(*) OVER w25 = 25
                    THEN CAST(SUM(y) OVER w25 AS BIGINT) END AS sum25
        FROM dense
        WINDOW w25 AS (PARTITION BY event_type ORDER BY hour
                       ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    seas AS (
        SELECT event_type, hod,
               CAST(SUM(25 * y - sum25) AS BIGINT) AS s,
               CAST(COUNT(sum25) AS BIGINT) AS nh
        FROM w GROUP BY 1, 2
    ),
    overall AS (
        SELECT event_type,
               CAST(SUM(25 * y - sum25) AS BIGINT) AS g,
               CAST(COUNT(sum25) AS BIGINT) AS ng
        FROM w GROUP BY 1
    )
    SELECT w.event_type, w.hour, w.y,
           FLOOR(CAST(w.sum25 AS DOUBLE) / 25 * 1e6 + 0.5) / 1e6 AS trend,
           FLOOR((CAST(s.s AS DOUBLE) / (25 * s.nh)
                  - CAST(o.g AS DOUBLE) / (25 * o.ng)) * 1e6 + 0.5) / 1e6
               AS seasonal,
           FLOOR((CAST(25 * w.y - w.sum25 AS DOUBLE) / 25
                  - (CAST(s.s AS DOUBLE) / (25 * s.nh)
                     - CAST(o.g AS DOUBLE) / (25 * o.ng))) * 1e6 + 0.5) / 1e6
               AS resid
    FROM w
    JOIN seas s ON w.event_type = s.event_type AND w.hod = s.hod
    JOIN overall o ON w.event_type = o.event_type
    """,
)
def ts_stl_decompose(spark, sf_dir):
    """STL-style additive decomposition of each type's hourly count
    series: y = trend + seasonal + resid, with trend the centered
    25-hour moving average (NULL at the 12-row edges — full windows
    only), seasonal the hour-of-day mean of the detrended series
    re-centered to sum to ~0, and resid the remainder — the
    decomposition `ts_seasonal_profile` (multiplicative index) and
    `ts_anomaly_mad` (un-deseasonalized outliers) bracket, and the
    standard pre-pass before anomaly thresholds on strongly daily
    traffic (Cleveland et al. 1990's STL, one loess pass replaced by
    the moving average — the classical-decomposition variant).

    Determinism (the BIGINT-moments discipline): y and the 25-hour
    window sum are exact BIGINTs, so the detrended series is carried
    as EXACT 25ths-units (25*y − sum25, BIGINT); the hour-of-day and
    global means divide once each, and every output is one fixed
    double expression quantized at 6 — no accumulation of
    engine-ordered float sums anywhere. Centering subtracts the
    GLOBAL detrended mean (observation-weighted) rather than the
    mean-of-hod-means: exact in integer units, and zero-sum over
    observations by construction.

    Scale: the dense grid is |types| x |hours| (aggregate-sized,
    wall-clock-bounded); one rollup shuffle of the raw stream, one
    window over the grid, two aggregate-sized joins back (AQE
    broadcasts both). The heavy input is touched once."""
    t = Tables(spark, sf_dir)
    hourly, grid = _hourly_grid(t)
    dense = grid.join(
        hourly.select("event_type", "hour", "n"),
        ["event_type", "hour"],
        "left",
    ).select(
        "event_type",
        "hour",
        F.coalesce("n", F.lit(0)).cast("long").alias("y"),
    )
    w25 = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-12, 12)
    )
    # NEGATIVE RESULT (r12, measured, do not re-try): persisting w
    # (it feeds seas, glob and the final join, and ts_anomaly_stl
    # branches the result three more ways — census: 9 exchanges here,
    # 36 there) read WORSE in 3 of 4 interleaved sf0.1 noop A/Bs:
    # 1.13→1.46, 1.12→1.25, 1.04→1.37 s (one tie 1.00→0.97); the
    # downstream ts_anomaly_stl A/B was mixed, net negative. The dense
    # grid is aggregate-sized but the rollup feeding it is cheap at any
    # sf; materialization blocks the pipelined branches.
    w = dense.select(
        "event_type",
        "hour",
        F.hour("hour").cast("long").alias("hod"),
        "y",
        F.when(
            F.count(F.lit(1)).over(w25) == 25,
            F.sum("y").over(w25).cast("long"),
        ).alias("sum25"),
    )
    det = (25 * F.col("y") - F.col("sum25")).cast("long")
    seas = w.groupBy("event_type", "hod").agg(
        F.sum(det).cast("long").alias("s"),
        F.count("sum25").cast("long").alias("nh"),
    )
    glob = w.groupBy("event_type").agg(
        F.sum(det).cast("long").alias("g"),
        F.count("sum25").cast("long").alias("ng"),
    )
    seasonal = F.col("s").cast("double") / (25 * F.col("nh")) - F.col(
        "g"
    ).cast("double") / (25 * F.col("ng"))
    return (
        w.join(seas, ["event_type", "hod"])
        .join(glob, "event_type")
        .select(
            "event_type",
            "hour",
            "y",
            qnt(F.col("sum25").cast("double") / 25, "trend"),
            qnt(seasonal, "seasonal"),
            qnt(
                (25 * F.col("y") - F.col("sum25")).cast("double") / 25
                - seasonal,
                "resid",
            ),
        )
    )


@op(
    "ts_holt_backtest",
    sql=f"""
    WITH RECURSIVE hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT event_type, hour, y,
               row_number() OVER (PARTITION BY event_type ORDER BY hour)
                   AS rn
        FROM hourly
    ),
    r AS (
        SELECT event_type, rn, hour, y,
               CAST(y * 1000 AS DOUBLE) AS l,
               CAST(0.0 AS DOUBLE) AS b,
               CAST(NULL AS DOUBLE) AS f
        FROM series WHERE rn = 1
        UNION ALL
        SELECT s.event_type, s.rn, s.hour, s.y,
               FLOOR((s.y * 1000 + r.l + r.b) / 2.0) AS l,
               FLOOR((FLOOR((s.y * 1000 + r.l + r.b) / 2.0) - r.l + r.b)
                     / 2.0) AS b,
               r.l + r.b AS f
        FROM r JOIN series s
          ON s.event_type = r.event_type AND s.rn = r.rn + 1
    ),
    h AS (SELECT event_type, hour, y AS n,
           f / 1000 AS forecast, l / 1000 AS level, b / 1000 AS trend
    FROM r WHERE rn >= 2),
    w AS (
        SELECT event_type, hour, n, forecast,
               lag(n) OVER (PARTITION BY event_type ORDER BY hour)
                   AS prev_n
        FROM h
    ),
    e AS (
        SELECT event_type,
               1000 * n - CAST(FLOOR(forecast * 1000 + 0.5) AS BIGINT)
                   AS err_m,
               1000 * (n - prev_n) AS naive_m
        FROM w WHERE prev_n IS NOT NULL
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           FLOOR(CAST(SUM(ABS(err_m)) AS DOUBLE) / (1000 * COUNT(*))
                 * 1e6 + 0.5) / 1e6 AS mae,
           FLOOR(sqrt(CAST(SUM(err_m * err_m) AS DOUBLE) / COUNT(*))
                 / 1000 * 1e6 + 0.5) / 1e6 AS rmse,
           FLOOR(CAST(SUM(ABS(naive_m)) AS DOUBLE) / (1000 * COUNT(*))
                 * 1e6 + 0.5) / 1e6 AS naive_mae,
           FLOOR((1.0 - CAST(SUM(ABS(err_m)) AS DOUBLE)
                        / NULLIF(SUM(ABS(naive_m)), 0)) * 1e6 + 0.5) / 1e6
               AS skill
    FROM e GROUP BY event_type
    """,
)
def ts_holt_backtest(spark, sf_dir):
    """Forecast backtest for `ts_holt`: per event type, the MAE, RMSE
    and naive-baseline MAE of the one-step-ahead forecasts over the
    whole hourly history, plus the skill score 1 − MAE/naive-MAE
    (positive = beats the "tomorrow == today" baseline) — the
    evaluation row that decides whether the dashboard's expected-
    traffic band is trustworthy, and the standard acceptance gate
    before any forecaster feeds alerting thresholds.

    Determinism rides ts_holt's integer milli-unit recursion: the
    forecast column is an exact integer count of milli-units, so the
    per-hour error 1000·n − f recovers as an exact BIGINT (the
    FLOOR(+0.5) merely undoes the display division), absolute and
    squared errors sum exactly, and each output is one quantized
    double. Naive errors are pure BIGINT count differences. Rows
    where the in-output lag is undefined (each type's first emitted
    hour) are excluded from BOTH metrics so the comparison is
    apples-to-apples.

    Scale: inherits ts_holt's shape — per-type state is 2 numbers
    over a wall-clock-bounded hourly series; the backtest adds one
    lag window and one aggregate over the same aggregate-sized
    table."""
    h = ts_holt(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("hour")
    prev_n = F.lag("n").over(w)
    e = h.select(
        "event_type",
        (
            1000 * F.col("n")
            - F.floor(F.col("forecast") * 1000 + F.lit(0.5)).cast("long")
        ).alias("err_m"),
        (1000 * (F.col("n") - prev_n)).alias("naive_m"),
    ).filter(F.col("naive_m").isNotNull())
    cnt = F.count(F.lit(1))
    sum_abs = F.sum(F.abs(F.col("err_m")))
    sum_sq = F.sum(F.col("err_m") * F.col("err_m"))
    sum_naive = F.sum(F.abs(F.col("naive_m")))
    return e.groupBy("event_type").agg(
        cnt.cast("long").alias("n_hours"),
        qnt(sum_abs.cast("double") / (1000 * cnt), "mae"),
        qnt(F.sqrt(sum_sq.cast("double") / cnt) / 1000, "rmse"),
        qnt(sum_naive.cast("double") / (1000 * cnt), "naive_mae"),
        qnt(
            1.0
            - sum_abs.cast("double") / F.nullif(sum_naive, F.lit(0)),
            "skill",
        ),
    )


def _stl_as_cte() -> str:
    """ts_stl_decompose's oracle re-packaged as a CTE list ending in
    `stl AS (...)` so composing operators prepend it — the ts_holt /
    ts_holt_backtest splice pattern, done programmatically."""
    sql = ORACLE["ts_stl_decompose"]
    k = sql.rindex("    SELECT w.event_type, w.hour, w.y,")
    ctes = sql[:k].strip()
    assert ctes.startswith("WITH ") and ctes.endswith(")")
    final_select = sql[k:].strip()
    return f"{ctes[5:]},\n    stl AS ({final_select})"


@op(
    "ts_anomaly_stl",
    sql=f"""
    WITH {_stl_as_cte()},
    med AS (
        SELECT event_type, quantile_cont(resid, 0.5) AS med
        FROM stl WHERE resid IS NOT NULL GROUP BY event_type
    ),
    dev AS (
        SELECT s.event_type, s.hour, s.y, s.trend, s.seasonal, s.resid,
               abs(s.resid - m.med) AS adev, m.med
        FROM stl s JOIN med m ON s.event_type = m.event_type
        WHERE s.resid IS NOT NULL
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type, d.hour, d.y, d.trend, d.seasonal, d.resid,
           FLOOR((d.resid - d.med) / (1.4826 * m.mad) * 1e6 + 0.5) / 1e6
               AS robust_z
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    WHERE d.adev > 3.0 * 1.4826 * m.mad
    """,
)
def ts_anomaly_stl(spark, sf_dir):
    """Seasonally-adjusted anomaly detection — the composition the
    `ts_anomaly_mad` docstring's raw z-score can't deliver on strongly
    daily traffic (a normal 9 am peak looks anomalous against the
    whole-day distribution; a genuinely dead 9 am looks normal): run
    the robust MAD z-score on ts_stl_decompose's RESIDUAL series,
    after trend and hour-of-day seasonality are removed. This is the
    standard production traffic-alerting shape (STL + robust
    threshold, e.g. Twitter's AnomalyDetection / Netflix RAD lineage,
    Cleveland et al. 1990 + Hampel identifier).

    Determinism: resid arrives already quantized from the STL twin;
    medians are exact percentiles over those quantized values
    (identical interpolation both engines — the ts_anomaly_mad
    proof), and the z-score is one quantized expression. Edge hours
    (NULL trend) are excluded on both engines.

    Scale: inherits ts_stl_decompose's single rollup; the two
    percentile passes run over the aggregate-sized residual table
    (≤ types x hours rows) with tiny per-type stats broadcast back —
    at 100 TB of raw events this stage's input is still just the
    hourly grid. KLL sketches swap in if the grid itself ever grows
    past memory (agg_kll_quantile)."""
    stl = ts_stl_decompose(spark, sf_dir).filter(
        F.col("resid").isNotNull()
    )
    med = stl.groupBy("event_type").agg(
        F.percentile("resid", F.lit(0.5)).alias("med")
    )
    dev = stl.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("resid") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("adev") > 3.0 * 1.4826 * F.col("mad"))
        .select(
            "event_type",
            "hour",
            "y",
            "trend",
            "seasonal",
            "resid",
            qnt(
                (F.col("resid") - F.col("med"))
                / (1.4826 * F.col("mad")),
                "robust_z",
            ),
        )
    )


_XC_MAX_LAG = 6
_XC_X, _XC_Y = "click", "purchase"


@op(
    "ts_cross_correlation",
    sql=f"""
    WITH hourly AS (
        SELECT event_type,
               epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        WHERE event_type IN ('{_XC_X}', '{_XC_Y}')
        GROUP BY 1, 2
    ),
    x AS (SELECT h, n FROM hourly WHERE event_type = '{_XC_X}'),
    y AS (SELECT h, n FROM hourly WHERE event_type = '{_XC_Y}'),
    paired AS (
        SELECT l.lag, x.n AS nx, y.n AS ny
        FROM x CROSS JOIN (
            SELECT unnest(range(0, {_XC_MAX_LAG + 1})) AS lag
        ) l
        JOIN y ON y.h = x.h + l.lag
    ),
    s AS (
        SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_hours,
               SUM(nx) AS sx, SUM(ny) AS sy,
               SUM(nx * nx) AS sxx, SUM(ny * ny) AS syy,
               SUM(nx * ny) AS sxy
        FROM paired GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, n_hours,
           {{corr_expr}}
    FROM s
    """.replace(
        "{corr_expr}",
        o_qnt(
            "CAST(n_hours * sxy - sx * sy AS DOUBLE)"
            " / SQRT(CAST(n_hours * sxx - sx * sx AS DOUBLE)"
            "        * CAST(n_hours * syy - sy * sy AS DOUBLE))",
            "xcorr",
        ),
    ),
)
def ts_cross_correlation(spark, sf_dir):
    """Lagged cross-correlation between two event streams — the
    lead/lag diagnostic behind "do clicks predict purchases, and at
    what horizon": Pearson correlation between the hourly click count
    at hour h and the hourly purchase count at hour h+lag, for lags
    0..6. The peak lag is the conversion latency mode; `ts_autocorr`
    is the self-paired special case of this operator.

    Determinism: hourly counts are exact BIGINTs, so every moment
    (Σx, Σy, Σx², Σy², Σxy) is an exact integer aggregate —
    accumulation order cannot matter. The only float arithmetic is
    the one closed-form Pearson expression per lag, identical text on
    both engines, quantized to 1e-6.

    Scale (100 TB): the fact scan collapses to |hours|x2 rows in one
    map-combinable groupBy (pushed filter on the two types); the
    lag expansion is a constant 7x explode on the already-tiny hourly
    series, joined back as an equi-join on the shifted hour index.
    Everything after the first aggregate is kilobytes regardless of
    input scale."""
    t = Tables(spark, sf_dir)
    hourly = (
        t.events.filter(F.col("event_type").isin(_XC_X, _XC_Y))
        .groupBy(
            "event_type",
            F.expr(
                "unix_micros(cast(date_trunc('hour', ts) as timestamp))"
                " div 3600000000"
            ).alias("h"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    x = hourly.filter(F.col("event_type") == _XC_X).select("h", "n")
    y = hourly.filter(F.col("event_type") == _XC_Y).select(
        F.col("h").alias("hy"), F.col("n").alias("ny")
    )
    xl = x.select(
        "h",
        F.col("n").alias("nx"),
        F.explode(
            F.array(*[F.lit(i) for i in range(_XC_MAX_LAG + 1)])
        ).alias("lag"),
    ).withColumn("hy", F.col("h") + F.col("lag"))
    s = (
        xl.join(y, "hy")
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.sum("nx").alias("sx"),
            F.sum("ny").alias("sy"),
            F.sum(F.col("nx") * F.col("nx")).alias("sxx"),
            F.sum(F.col("ny") * F.col("ny")).alias("syy"),
            F.sum(F.col("nx") * F.col("ny")).alias("sxy"),
        )
    )
    num = (F.col("n_hours") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = F.sqrt(
        (F.col("n_hours") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
        * (
            F.col("n_hours") * F.col("syy") - F.col("sy") * F.col("sy")
        ).cast("double")
    )
    return s.select(
        F.col("lag").cast("long").alias("lag"),
        "n_hours",
        qnt(num / den, "xcorr"),
    )
