"""Window function operators (SURVEY.md §2.5).

Determinism discipline (SURVEY §5.3): every ordering that feeds
row_number/ntile/lag/lead/frames ends in the unique event_id/order key,
so tie placement can't differ between engines. Running/sliding sums go
through the decimal cast — window aggregate implementations (Spark's
sequential frames vs DuckDB's segment trees) may add doubles in
different orders, decimal is exact under any order.

Rank-family outputs are cast to BIGINT on the Spark side to match
DuckDB's BIGINT window returns.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ..io import Tables
from ..norms import dec_cast, finite_or_null, o_dec_cast, o_finite_or_null, qnt
from ..regutil import registrar

QUERIES: dict = {}
ORACLE: dict = {}
op = registrar(QUERIES, ORACLE)

_DEC = DecimalType(28, 4)


@op(
    "win_ranking",
    sql="""
    SELECT event_id, event_type, user_id,
           rank()       OVER (PARTITION BY event_type, user_id ORDER BY value NULLS LAST) AS rnk,
           dense_rank() OVER (PARTITION BY event_type, user_id ORDER BY value NULLS LAST) AS drnk,
           row_number() OVER (PARTITION BY event_type, user_id ORDER BY value NULLS LAST, event_id) AS rn,
           ntile(4)     OVER (PARTITION BY event_type, user_id ORDER BY value NULLS LAST, event_id) AS quartile,
           round(percent_rank() OVER (PARTITION BY event_type, user_id ORDER BY value NULLS LAST), 9) AS prnk
    FROM events
    """,
)
def win_ranking(spark, sf_dir):
    """rank / dense_rank / row_number / ntile / percent_rank, partitioned
    by the COMPOSITE (event_type, user_id) key — thousands of window
    partitions, so the sort parallelizes across the cluster (the r2
    perf-weak flag). Partitioning by low-cardinality event_type alone
    (5 values) caps parallelism at 5 and makes one reducer sort 1/5 of
    100 TB — if globally-per-type ranks are truly needed, pre-aggregate
    or two-phase rank (per-partition rank + offset merge, as
    ``topn_per_group`` does); never a bare 5-partition window.

    Tie discipline: rank/dense_rank/percent_rank are tie-stable under
    ORDER BY value; row_number/ntile append the unique event_id. NULL
    placement is pinned explicitly (NULLS LAST on both engines): Spark
    defaults to NULLS FIRST ascending while DuckDB defaults to NULLS
    LAST, so an unpinned ordering diverges the moment a fixture
    regeneration introduces a NULL value (ADVICE r3)."""
    t = Tables(spark, sf_dir)
    w_ties = Window.partitionBy("event_type", "user_id").orderBy(
        F.col("value").asc_nulls_last()
    )
    w_uniq = Window.partitionBy("event_type", "user_id").orderBy(
        F.col("value").asc_nulls_last(), "event_id"
    )
    return t.events.select(
        "event_id",
        "event_type",
        "user_id",
        F.rank().over(w_ties).cast("long").alias("rnk"),
        F.dense_rank().over(w_ties).cast("long").alias("drnk"),
        F.row_number().over(w_uniq).cast("long").alias("rn"),
        F.ntile(4).over(w_uniq).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w_ties), 9).alias("prnk"),
    )


@op(
    "win_lag_lead",
    sql="""
    SELECT event_id, user_id, ts, value,
           lag(value)  OVER w AS prev_value,
           lead(event_type) OVER w AS next_type,
           CAST(floor(extract(epoch FROM ts)) AS BIGINT)
             - CAST(floor(extract(epoch FROM lag(ts) OVER w)) AS BIGINT) AS secs_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark, sf_dir):
    """lag/lead neighbors within each user's time-ordered history (time since previous event)."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    prev_epoch = F.unix_timestamp(F.lag("ts").over(w).cast("timestamp"))
    return t.events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("event_type").over(w).alias("next_type"),
        (epoch - prev_epoch).alias("secs_since_prev"),
    )


@op(
    "win_running",
    sql=f"""
    SELECT event_id, user_id,
           CAST(SUM({o_dec_cast("value")}) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
           COUNT(*) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
    FROM events
    """,
)
def win_running(spark, sf_dir):
    """Running totals and cumulative averages over unbounded-preceding frames (decimal-exact sums)."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.events.select(
        "event_id",
        "user_id",
        F.sum(dec_cast("value")).over(w).cast("double").alias("running_value"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    )


@op(
    "win_sliding_rows",
    sql=f"""
    SELECT event_id, user_id,
           CAST(SUM({o_dec_cast("value")}) OVER w AS DOUBLE)
             / COUNT(*) OVER w AS moving_avg_5
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def win_sliding_rows(spark, sf_dir):
    """Moving aggregate over the last N rows of each partition (rowsBetween frame)."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return t.events.select(
        "event_id",
        "user_id",
        (
            F.sum(dec_cast("value")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg_5"),
    )


@op(
    "win_range_time",
    sql=f"""
    SELECT event_id, user_id,
           CAST(SUM({o_dec_cast("value")}) OVER w AS DOUBLE) AS trailing_1h_value,
           COUNT(*) OVER w AS trailing_1h_n
    FROM (SELECT *, CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS epoch_s FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def win_range_time(spark, sf_dir):
    """Time-range frame: all of the user's events in the trailing hour.
    RANGE frames are value-bounded, so equal-second ties land in the
    same frame deterministically in both engines."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("epoch_s"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return (
        t.events.withColumn(
            "epoch_s", F.unix_timestamp(F.col("ts").cast("timestamp"))
        )
        .select(
            "event_id",
            "user_id",
            F.sum(dec_cast("value")).over(w).cast("double").alias("trailing_1h_value"),
            F.count(F.lit(1)).over(w).alias("trailing_1h_n"),
        )
    )


@op(
    "win_first_last",
    sql="""
    SELECT event_id, user_id,
           first_value(value) OVER w AS first_value_all,
           last_value(value)  OVER w AS last_value_all,
           first_value(event_type) OVER w AS first_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark, sf_dir):
    """first/last value (ignoring nulls) over a fully-determined window frame."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return t.events.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_value_all"),
        F.last("value").over(w).alias("last_value_all"),
        F.first("event_type").over(w).alias("first_type"),
    )


@op(
    "topn_per_group",
    sql="""
    SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY value DESC, event_id) AS rn
        FROM events
    ) WHERE rn <= 3
    """,
)
def topn_per_group(spark, sf_dir):
    """Top-3 events per user by value; unique event_id tiebreak keeps
    the selected set deterministic."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        t.events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "value")
    )


@op(
    "win_sessionize",
    sql="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w <= 1800000000
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, event_id,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_no
        FROM flagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def win_sessionize(spark, sf_dir):
    """Batch gap-based sessionization (the batch twin of
    stream_session_agg's 30-minute session_window): a session break is
    a gap > 30 min since the user's previous event; session number is
    the running sum of break flags; one output row per session.

    Two window passes over the same (user_id, ts-ordered) partitioning
    plus the final groupBy — Spark plans a single sort+exchange that
    all three reuse, so the whole operator costs one shuffle. Scales
    by user_id cardinality; a hot user only serializes that user's
    own timeline, which is inherent to session semantics."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact µs-epoch gap comparison (epoch_us on the DuckDB side):
    # second-truncating casts would misclassify gaps near the boundary
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_ok = (ts_us - F.lag(ts_us).over(w)) <= 1_800_000_000
    flagged = t.events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap_ok, F.lit(0)).otherwise(F.lit(1)).alias("new_session"),
    )
    numbered = flagged.select(
        "user_id",
        "ts",
        "event_id",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("session_no"),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@op(
    "win_distribution",
    sql="""
    SELECT event_id, user_id,
           round(cume_dist() OVER
               (PARTITION BY user_id ORDER BY value NULLS LAST, event_id), 9) AS cdist,
           nth_value(event_type, 2) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS second_type
    FROM events
    """,
)
def win_distribution(spark, sf_dir):
    """cume_dist + nth_value — the distribution/positional window
    functions completing the §2.5 family. Unique (value|ts, event_id)
    orderings pin tie placement; the nth_value frame is explicit
    (unbounded-preceding to current) so both engines evaluate the same
    running frame. Same composite user_id partition key discipline as
    win_ranking, and the same explicit NULLS LAST pin on the nullable
    value ordering (Spark NULLS FIRST vs DuckDB NULLS LAST default)."""
    t = Tables(spark, sf_dir)
    w_val = Window.partitionBy("user_id").orderBy(
        F.col("value").asc_nulls_last(), "event_id"
    )
    w_ts = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.events.select(
        "event_id",
        "user_id",
        F.round(F.cume_dist().over(w_val), 9).alias("cdist"),
        F.nth_value("event_type", 2).over(w_ts).alias("second_type"),
    )


@op(
    "win_gap_islands",
    sql="""
    WITH d AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dayn
        FROM events
    ),
    g AS (
        SELECT user_id, dayn,
               dayn - row_number() OVER (
                   PARTITION BY user_id ORDER BY dayn) AS grp
        FROM d
    ),
    isl AS (
        SELECT user_id, grp, COUNT(*) AS len
        FROM g GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           COUNT(*) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS longest_streak
    FROM isl
    GROUP BY user_id
    """,
)
def win_gap_islands(spark, sf_dir):
    """Gaps-and-islands: per-user runs of CONSECUTIVE active days
    (streak analytics — "7-day streak" badges, churn-risk gaps). The
    classic two-step: collapse to distinct (user, day), then group
    consecutive days by the constant ``dayn - row_number()`` — a run
    of consecutive days shares one group id, any gap starts a new one.

    Day arithmetic is integer days-since-epoch on both engines
    (datediff vs date_diff), so island boundaries are exact — no
    timestamp-interval or timezone arithmetic anywhere. One shuffle
    for the distinct (user-keyed), and the row_number window plus both
    aggregates reuse that same user_id hash partitioning, so Spark
    plans a single exchange: dedup -> window -> two partial-combined
    groupBys, all co-located. Parallelism is user-id cardinality — the
    same key-cardinality discipline as win_sessionize; a 100 TB events
    table with millions of users spreads evenly, and the distinct
    collapses each user to at most #days rows before any window work."""
    t = Tables(spark, sf_dir)
    days = (
        t.events.select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("dayn"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("dayn")
    grouped = days.select(
        "user_id", "dayn", (F.col("dayn") - F.row_number().over(w)).alias("grp")
    )
    islands = grouped.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len")
    )
    return islands.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
    )


@op(
    "win_running_distinct",
    sql="""
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id
               ) = 1 THEN 1 ELSE 0 END AS first_of_type
        FROM events
    )
    SELECT user_id, event_id,
           CAST(SUM(first_of_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS BIGINT) AS n_types_so_far
    FROM flagged
    """,
)
def win_running_distinct(spark, sf_dir):
    """Running COUNT DISTINCT over a window — how many distinct event
    types each user has touched as of every event (the engagement-
    breadth curve; also the classic "distinct is not a window
    aggregate" workaround interview question). Spark and most engines
    reject count(distinct) over a running frame outright; the
    standard rewrite marks each row that is the FIRST occurrence of
    its (user, type) and running-sums the flags.

    Two windows, both on the same user-keyed exchange (Spark reuses
    the hash partitioning; the second window only re-sorts). Fully
    deterministic: both orderings end in event_id. At 100 TB this is
    one shuffle + two sorts per partition — the naive per-row
    distinct-scan alternative is per-user-quadratic."""
    t = Tables(spark, sf_dir)
    wf = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.events.select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            F.when(F.row_number().over(wf) == 1, 1).otherwise(0).alias(
                "first_of_type"
            ),
        )
        .select(
            "user_id",
            "event_id",
            F.sum("first_of_type").over(wr).cast("long").alias(
                "n_types_so_far"
            ),
        )
    )


# Rolling-OLS integer discipline: x = whole seconds since 2020-01-01
# UTC (fixture events are 2024+, so x is positive and truncating µs→s
# division agrees across engines), y = half-up-rounded 1e-4 micro-units
# of `value`. With the 8-row frame every moment sum is bounded well
# inside BIGINT (x ≤ ~2e8 ⇒ Σx² ≤ 8·4e16; the critical (Σx)² ≤ 2.6e18
# < 2^63) — exact integer arithmetic until one final double division.
_ROLL_REG_BASE_S = 1_577_836_800  # epoch seconds of 2020-01-01T00:00Z
_ROLL_REG_FRAME = 8


@op(
    "win_rolling_regression",
    sql=f"""
    WITH e AS (
        SELECT user_id, event_id, ts,
               epoch_us(ts) // 1000000 - {_ROLL_REG_BASE_S} AS x,
               CAST(FLOOR({o_finite_or_null('value')} * 10000.0 + 0.5) AS BIGINT) AS y
        FROM events
    ),
    m AS (
        -- HUGEINT moments + combination (the Spark twin uses exact
        -- DECIMAL(38)): calendar-edge timestamps overflow BIGINT in
        -- (Sx)^2 / n*Sxx (r11 sweep H); both engines compute the same
        -- exact integer and round it to double identically
        SELECT user_id, event_id, ts,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(SUM(x) OVER w AS HUGEINT) AS sx,
               CAST(SUM(y) OVER w AS HUGEINT) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * y) OVER w AS HUGEINT) AS sxy,
               CAST(SUM(CAST(x AS HUGEINT) * x) OVER w AS HUGEINT) AS sxx
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {_ROLL_REG_FRAME - 1} PRECEDING
                     AND CURRENT ROW)
    )
    SELECT user_id, event_id, ts, n,
           FLOOR(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
                 / nullif(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE), 0.0)
                 * 8.64 * 1e6 + 0.5) / 1e6 AS slope_day
    FROM m
    """,
)
def win_rolling_regression(spark, sf_dir):
    """Rolling OLS trend per user: the least-squares slope of `value`
    against time over the user's trailing 8-event frame, reported in
    value-units per DAY — the local trend line monitoring UIs draw and
    alerting rules threshold ("spend accelerating ≥ X/day"), and the
    regression upgrade of `win_sliding_rows`' moving mean (a mean says
    where the level is; the slope says where it is going).

    slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) over FOUR window sums —
    every moment accumulates exact BIGINTs (see the module-level bounds
    note) on one user-keyed exchange shared by all five frames; the
    division is the single float op, nullif-guarded for the degenerate
    frames (n=1, or all events in the same second — both engines null
    there), then 1e-6-quantized. µ-unit/second → unit/day rescale is
    the exact constant 8.64 = 86400/10⁴ applied before quantization in
    the same fixed IEEE sequence on both engines."""
    t = Tables(spark, sf_dir)
    e = t.events.select(
        "user_id",
        "event_id",
        "ts",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.floor(finite_or_null("value") * 10000.0 + 0.5).cast("long").alias("y"),
    ).select(
        "user_id",
        "event_id",
        "ts",
        (F.expr("us div 1000000") - F.lit(_ROLL_REG_BASE_S)).alias("x"),
        "y",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_ROLL_REG_FRAME - 1), Window.currentRow)
    )
    # Moments and their combination are exact DECIMAL(38,0), not
    # BIGINT (r11 full-matrix sweep, scenario H): a calendar-edge
    # timestamp (epoch 0 / far future) makes x ~ 1.6e9 seconds from
    # base, so n·Σx² ~ 2e19 and (Σx)² ~ 1.6e20 overflow a 64-bit long
    # and ANSI Spark throws ARITHMETIC_OVERFLOW. DuckDB's SUM(BIGINT)
    # already promotes to HUGEINT; the oracle now combines in HUGEINT
    # explicitly, so BOTH engines compute the same exact integer and
    # cast it to double with identical IEEE rounding — at fixture
    # timescales every value fits a long and the doubles are
    # bit-identical to the pre-r11 records.
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    m = e.select(
        "user_id",
        "event_id",
        "ts",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum(xd).over(w).alias("sx"),
        F.sum(yd).over(w).alias("sy"),
        F.sum(xd * yd).over(w).alias("sxy"),
        F.sum(xd * xd).over(w).alias("sxx"),
    )
    nd = F.col("n").cast("decimal(10,0)")
    num = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return m.select(
        "user_id",
        "event_id",
        "ts",
        "n",
        qnt(num / F.nullif(den, F.lit(0.0)) * 8.64, "slope_day"),
    )
