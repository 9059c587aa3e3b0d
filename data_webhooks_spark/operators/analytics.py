"""Event-analytics composites over the webhook event stream (SURVEY §2.12).

The reference is a webhook-event stream processor; these are the
product-analytics questions its users run over the ingested events —
funnels, retention cohorts, and path transitions — each composed from
the relational/window primitives so Catalyst sees one declarative plan.

Scale notes (100 TB):
- Every operator here aggregates per ``user_id`` first; the three
  funnel stages and the retention join all reuse that one key, so at
  scale the plan shuffles the events table once per stage on the same
  key (AQE coalesces the tiny post-agg sides; with events bucketed by
  user_id the stage joins are shuffle-free).
- Ordering inside a user's history always ends in the unique
  ``event_id`` (SURVEY §5.3 determinism discipline).
- Nothing here collects to the driver; funnel counts reduce to a
  3-row-ish DataFrame on the executors.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import Tables
from ..norms import finite_or_null, o_finite_or_null, qnt
from ..regutil import registrar

QUERIES: dict = {}
ORACLE: dict = {}
op = registrar(QUERIES, ORACLE)


@op(
    "funnel_conversion",
    sql="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1
          AND e.ts <= v.t1 + INTERVAL 6 HOUR
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
          AND e.ts <= c.t2 + INTERVAL 6 HOUR
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS viewed_users,
           (SELECT COUNT(*) FROM c) AS clicked_users,
           (SELECT COUNT(*) FROM p) AS purchased_users,
           round((SELECT COUNT(*) FROM c)
                 / greatest((SELECT COUNT(*) FROM v), 1), 6) AS view_to_click,
           round((SELECT COUNT(*) FROM p)
                 / greatest((SELECT COUNT(*) FROM c), 1), 6) AS click_to_purchase
    """,
)
def funnel_conversion(spark, sf_dir):
    """Strictly-ordered three-stage funnel (view -> click -> purchase)
    with a 6-hour conversion window: a user advances to a stage only
    with an event strictly AFTER their earliest arrival at the
    previous stage and within the window (so the funnel discriminates
    instead of saturating). Each stage is a per-user
    min-timestamp aggregation joined to the next stage's candidate
    events — all three joins share the user_id partitioning, and the
    final counts cross-join three single-row aggregates (broadcast,
    trivially)."""
    e = Tables(spark, sf_dir).events.select("user_id", "event_type", "ts")

    # NOT persisted — negative result (r12, pinned): v and c each feed
    # two consumers, so Catalyst scans events 6x per run, and pinning
    # the slim stage aggregates looked like the textbook fix — but
    # measured 0.8-1.1 s -> 1.2-1.8 s at sf0.1 (3 consistent A/Bs):
    # cache materialization turns the freely-pipelined branches into
    # blocking jobs and costs more than the redundant scans of a
    # pruned 3-column fact. At cluster scale the trade flips only if
    # the fact scan dominates; revisit with real 100 TB numbers, not
    # here.
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 6 HOURS")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 6 HOURS")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    nv = v.agg(F.count("*").alias("viewed_users"))
    nc = c.agg(F.count("*").alias("clicked_users"))
    np_ = p.agg(F.count("*").alias("purchased_users"))
    return (
        nv.crossJoin(nc)
        .crossJoin(np_)
        .select(
            "viewed_users",
            "clicked_users",
            "purchased_users",
            F.round(
                F.col("clicked_users")
                / F.greatest(F.col("viewed_users"), F.lit(1)),
                6,
            ).alias("view_to_click"),
            F.round(
                F.col("purchased_users")
                / F.greatest(F.col("clicked_users"), F.lit(1)),
                6,
            ).alias("click_to_purchase"),
        )
    )


@op(
    "retention_cohort",
    sql="""
    WITH first_seen AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
        FROM events
    )
    SELECT f.cohort_week,
           CAST(datediff('day', f.cohort_week, a.active_week) / 7 AS BIGINT)
               AS week_offset,
           COUNT(*) AS n_active
    FROM first_seen f JOIN active a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def retention_cohort(spark, sf_dir):
    """Weekly retention triangle: users cohorted by the Monday-start
    week of their first event; each later week they appear counts them
    active at that week offset. Both engines truncate weeks to Monday,
    and week offsets are exact multiples of 7 days so the /7 is exact
    in doubles. The distinct() and both groupBys share the user_id
    shuffle key; the cohort join is per-user (AQE broadcasts the
    post-agg side at small SF)."""
    e = Tables(spark, sf_dir).events.select("user_id", "ts")

    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = e.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    return (
        active.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_active"))
    )


@op(
    "event_paths",
    sql="""
    WITH p AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS curr_type, COUNT(*) AS n_paths
    FROM p WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def event_paths(spark, sf_dir):
    """Markov-style path transition matrix: consecutive event-type
    pairs within each user's time-ordered history (ties broken by
    event_id), counted per (prev, curr) pair. One window shuffle on
    user_id, then a partial-aggregated groupBy over at most
    |event_type|^2 keys — the canonical 'top paths' analytics query."""
    e = Tables(spark, sf_dir).events.select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("curr_type"))
        .agg(F.count("*").alias("n_paths"))
    )


@op(
    "pipeline_events_prep",
    sql="""
    WITH valid AS (
        SELECT event_id, ts, user_id, event_type, value,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k
        FROM events
        WHERE value > 0
          AND event_type IN ('view', 'click', 'purchase', 'signup', 'error')
          AND json_extract(props, '$.k') IS NOT NULL
    ),
    flagged AS (
        SELECT *,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w <= 1800000000
                    THEN 0 ELSE 1 END AS new_session
        FROM valid
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT *,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sno
        FROM flagged
    ),
    sessions AS (
        SELECT user_id, sno,
               COUNT(*) AS n_events,
               epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS span_us,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS has_purchase,
               SUM(k) AS k_sum
        FROM numbered GROUP BY user_id, sno
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(FLOOR(SUM(span_us) / COUNT(*)) AS BIGINT) AS avg_span_us,
           FLOOR(SUM(has_purchase) / CAST(COUNT(*) AS DOUBLE)
                 * 1e6 + 0.5) / 1e6 AS purchase_session_rate,
           CAST(SUM(k_sum) AS BIGINT) AS k_total
    FROM sessions GROUP BY user_id
    """,
)
def pipeline_events_prep(spark, sf_dir):
    """END-TO-END webhook-analytics capstone, the events-side bookend
    of pipeline_text_prep: parse the JSON payload -> contract-validate
    (value domain, type domain, payload key present) -> sessionize
    (30-min gap) -> per-session aggregates (length, span, purchase
    flag, payload sum) -> per-user rollup (session count, average
    span, purchase-session rate) — composed as ONE Catalyst plan.

    Plan shape: a codegen parse+filter reaches the scan (pushdown on
    value; json_extract stays in the projection), the sessionize
    window and both aggregations all key on user_id, so the whole
    pipeline costs ONE shuffle on the user key at any scale — the
    same single-exchange discipline win_sessionize pins in its plan
    test. The integer-µs span arithmetic and the qnt-rounded rate are
    the cross-engine float discipline (norms.py)."""
    t = Tables(spark, sf_dir)
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    valid = (
        t.events.withColumn(
            "k", F.get_json_object("props", "$.k").cast("long")
        )
        .filter(
            (F.col("value") > 0)
            & F.col("event_type").isin(
                "view", "click", "purchase", "signup", "error"
            )
            & F.col("k").isNotNull()
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ok = (ts_us - F.lag(ts_us).over(w)) <= 1_800_000_000
    numbered = valid.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "k",
        F.sum(F.when(gap_ok, F.lit(0)).otherwise(F.lit(1)))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("sno"),
    )
    sessions = numbered.groupBy("user_id", "sno").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_micros(F.max("ts").cast("timestamp"))
            - F.unix_micros(F.min("ts").cast("timestamp"))
        ).alias("span_us"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("has_purchase"),
        F.sum("k").alias("k_sum"),
    )
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        # FLOOR before the long cast on BOTH engines: DuckDB's
        # double->BIGINT cast rounds while Spark's truncates (§5.3)
        F.floor(F.sum("span_us") / F.count(F.lit(1)))
        .cast("long")
        .alias("avg_span_us"),
        qnt(
            F.sum("has_purchase") / F.count(F.lit(1)).cast("double"),
            "purchase_session_rate",
        ),
        F.sum("k_sum").cast("long").alias("k_total"),
    )


@op(
    "win_pattern_match",
    sql="""
    WITH seq AS (
        SELECT user_id, ts, event_type,
               lead(event_type, 1) OVER w AS e1,
               lead(event_type, 2) OVER w AS e2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           COUNT(*) AS n_matches,
           MIN(ts) AS first_match_ts
    FROM seq
    WHERE event_type = 'view' AND e1 = 'click' AND e2 = 'purchase'
    GROUP BY user_id
    """,
)
def win_pattern_match(spark, sf_dir):
    """MATCH_RECOGNIZE-lite sequence detection: per user, find every
    STRICTLY CONSECUTIVE view -> click -> purchase run in event-time
    order (no intervening event of any type — the stricter cousin of
    funnel_conversion's 'eventually follows' semantics) and report the
    match count plus the first match's anchor timestamp.

    Spark has no MATCH_RECOGNIZE; fixed-length patterns compile to a
    lead() chain — one window shuffle on the user key, then the
    pattern predicate is a codegen conjunction. Arbitrary-length
    patterns (Kleene closure) would extend this with the sessionize
    run-id trick (win_sessionize) or applyInPandasWithState on a
    stream. Ordering is total via the (ts, event_id) tiebreak, so
    counts are deterministic."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e1"),
        F.lead("event_type", 2).over(w).alias("e2"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "view")
            & (F.col("e1") == "click")
            & (F.col("e2") == "purchase")
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("ts").alias("first_match_ts"),
        )
    )


@op(
    "analytics_rfm",
    sql="""
    WITH pu AS (
        SELECT user_id,
               date_diff('day', DATE '1970-01-01',
                         CAST(MAX(ts) AS DATE)) AS recency,
               COUNT(*) AS frequency,
               CAST(SUM(CASE WHEN ABS(value) <= 1.7976931348623157e308 AND value >= 0
                    THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                    WHEN ABS(value) <= 1.7976931348623157e308
                    THEN -CAST(FLOOR(-value * 100.0 + 0.5) AS BIGINT) END)
                 AS BIGINT) AS monetary
        FROM events GROUP BY user_id
    ),
    e AS (
        SELECT list_transform(
                   quantile_cont(CAST(recency AS DOUBLE), [0.2,0.4,0.6,0.8]),
                   q -> CASE WHEN q >= 0 THEN FLOOR(q * 1e6 + 0.5)
                        ELSE -FLOOR(-q * 1e6 + 0.5) END / 1e6
               ) AS re,
               list_transform(
                   quantile_cont(CAST(frequency AS DOUBLE), [0.2,0.4,0.6,0.8]),
                   q -> CASE WHEN q >= 0 THEN FLOOR(q * 1e6 + 0.5)
                        ELSE -FLOOR(-q * 1e6 + 0.5) END / 1e6
               ) AS fe,
               list_transform(
                   quantile_cont(CAST(monetary AS DOUBLE), [0.2,0.4,0.6,0.8]),
                   q -> CASE WHEN q >= 0 THEN FLOOR(q * 1e6 + 0.5)
                        ELSE -FLOOR(-q * 1e6 + 0.5) END / 1e6
               ) AS me
        FROM pu
    ),
    seg AS (
        SELECT 1 + len(list_filter(e.re, q -> CAST(pu.recency AS DOUBLE) > q)) AS rq,
               1 + len(list_filter(e.fe, q -> CAST(pu.frequency AS DOUBLE) > q)) AS fq,
               1 + len(list_filter(e.me, q -> CAST(pu.monetary AS DOUBLE) > q)) AS mq,
               pu.monetary AS monetary
        FROM pu CROSS JOIN e
    )
    SELECT rq, fq, mq, COUNT(*) AS n_users,
           CAST(CAST(SUM(monetary) AS BIGINT) AS DOUBLE) / 100 AS total_value
    FROM seg GROUP BY rq, fq, mq
    """,
)
def analytics_rfm(spark, sf_dir):
    """RFM segmentation — the classic customer-value grid: per user,
    Recency (last-active day), Frequency (event count) and Monetary
    (exact value total), each mapped to its quintile, then users
    counted per (R, F, M) cell with the cell's exact value total.

    Quintile assignment deliberately avoids the textbook global
    ``ntile(5)``: an unpartitioned rank window serializes the whole
    per-user table through one task (the vocab_coverage lesson).
    Instead the exact quintile EDGES reduce to one 1-row aggregate
    (the agg_histogram_equidepth shape), broadcast onto the per-user
    scan, and each user bins by edge comparison — fully parallel,
    identical cells on both engines (binning is a pure function of the
    metric value, so ties at an edge land identically, unlike rank
    ties). Monetary follows the scaled-BIGINT exact-sum discipline at
    both levels (per-user and per-cell). Cost: one user-keyed shuffle
    + a 1-row edge aggregate + an aggregate-sized segment groupBy."""
    t = Tables(spark, sf_dir)
    v = finite_or_null("value")
    units = F.when(v >= 0, F.floor(v * 100.0 + F.lit(0.5))).when(
        v < 0, -F.floor(-v * 100.0 + F.lit(0.5))
    )
    pu = t.events.groupBy("user_id").agg(
        F.datediff(
            F.max("ts").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("recency"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(units).alias("monetary"),
    )
    qs = F.array(*[F.lit(x / 5) for x in (1, 2, 3, 4)])

    # Edge quantization (r5 ADVICE): Spark `percentile` and DuckDB
    # `quantile_cont` interpolate the same order statistics but not
    # provably to the same last ulp, and the metrics are integers —
    # an edge sitting exactly ON an integer is the common case, so a
    # 1-ulp divergence would flip whole cohorts. Snapping each edge to
    # 1e-6 (sign-branched floor, the norms.qnt formula) collapses
    # N±ulp to exactly N on both engines before the comparison.
    def q6(c):
        return (
            F.when(c >= 0, F.floor(c * 1e6 + F.lit(0.5))).otherwise(
                -F.floor(-c * 1e6 + F.lit(0.5))
            )
            / 1e6
        )

    edges = pu.agg(
        F.transform(
            F.percentile(F.col("recency").cast("double"), qs), q6
        ).alias("re"),
        F.transform(
            F.percentile(F.col("frequency").cast("double"), qs), q6
        ).alias("fe"),
        F.transform(
            F.percentile(F.col("monetary").cast("double"), qs), q6
        ).alias("me"),
    )

    def quint(metric, edge_col):
        m = F.col(metric).cast("double")
        return (
            F.lit(1) + F.size(F.filter(edge_col, lambda q: m > q))
        ).cast("long")

    seg = pu.crossJoin(F.broadcast(edges)).select(
        quint("recency", F.col("re")).alias("rq"),
        quint("frequency", F.col("fe")).alias("fq"),
        quint("monetary", F.col("me")).alias("mq"),
        "monetary",
    )
    return seg.groupBy("rq", "fq", "mq").agg(
        F.count(F.lit(1)).alias("n_users"),
        (F.sum("monetary").cast("double") / 100).alias("total_value"),
    )


# Welch's t-test derived quantities as one fixed sequence of IEEE
# double ops over EXACT integer moments (the agg_corr discipline):
# both engines compute these identical textual formulas on identical
# inputs, so t and df are bit-deterministic before quantization.
_W_VAR1 = "((ss1d - s1d * s1d / nd1) / (nd1 - 1.0))"
_W_VAR2 = "((ss2d - s2d * s2d / nd2) / (nd2 - 1.0))"
_W_VA = f"({_W_VAR1} / nd1)"
_W_VB = f"({_W_VAR2} / nd2)"
_W_SE2 = f"({_W_VA} + {_W_VB})"
_W_MDIFF = "((s1d / nd1 - s2d / nd2) / 100.0)"
# NULLIF on both denominators guards the zero-variance degenerate
# (both arms constant): t and df are undefined there and must yield
# NULL on BOTH engines instead of an Inf/NaN racing through FLOOR
# with dialect-dependent results — same pattern as _CORR_EXPR.
_W_T = f"((s1d / nd1 - s2d / nd2) / nullif(sqrt({_W_SE2}), 0.0))"
_W_DF = (
    f"(({_W_SE2} * {_W_SE2}) / "
    f"nullif({_W_VA} * {_W_VA} / (nd1 - 1.0) "
    f"+ {_W_VB} * {_W_VB} / (nd2 - 1.0), 0.0))"
)


@op(
    "ab_ttest_welch",
    sql=f"""
    WITH u AS (
        SELECT event_type,
               CASE WHEN ABS(value) <= 1.7976931348623157e308 AND value >= 0
                    THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                    WHEN ABS(value) <= 1.7976931348623157e308
                    THEN -CAST(FLOOR(-value * 100.0 + 0.5) AS BIGINT)
               END AS ub
        FROM events WHERE event_type IN ('view', 'purchase')
    ),
    m AS (
        SELECT
            SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n1,
            SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n2,
            CAST(SUM(CASE WHEN event_type = 'view' THEN ub
                     ELSE 0 END) AS BIGINT) AS s1,
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN ub
                     ELSE 0 END) AS BIGINT) AS s2,
            CAST(SUM(CASE WHEN event_type = 'view' THEN ub * ub
                     ELSE 0 END) AS BIGINT) AS ss1,
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN ub * ub
                     ELSE 0 END) AS BIGINT) AS ss2
        FROM u
    ),
    d AS (
        SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
               CAST(n1 AS DOUBLE) AS nd1, CAST(n2 AS DOUBLE) AS nd2,
               CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
               CAST(ss1 AS DOUBLE) AS ss1d, CAST(ss2 AS DOUBLE) AS ss2d
        FROM m
    )
    SELECT n1, n2,
           FLOOR({_W_MDIFF} * 1e6 + 0.5) / 1e6 AS mean_diff,
           FLOOR({_W_T} * 1e6 + 0.5) / 1e6 AS t_stat,
           FLOOR({_W_DF} * 1e6 + 0.5) / 1e6 AS df_welch
    FROM d
    """,
)
def ab_ttest_welch(spark, sf_dir):
    """Welch's unequal-variance two-sample t-test between the 'view'
    and 'purchase' value distributions — the A/B-testing significance
    primitive of a product-analytics engine. Means, variances, the t
    statistic and the Welch–Satterthwaite degrees of freedom all
    derive from ONE conditional-aggregation pass of exact scaled-
    BIGINT moments (n, Σx, Σx² per arm) — no second centering pass,
    map-side combinable, one narrow shuffle carrying six integers.

    Cross-engine determinism: built-in stddev/var are order-sensitive
    float folds; here both engines evaluate the identical fixed double
    formulas (_W_* above) on identical exact integers, then quantize.
    At 100 TB the same six-integer partial aggregates even support
    sequential testing — partials per day merge by addition."""
    t = Tables(spark, sf_dir)
    v = finite_or_null("value")
    units = F.when(v >= 0, F.floor(v * 100.0 + F.lit(0.5))).when(
        v < 0, -F.floor(-v * 100.0 + F.lit(0.5))
    )
    is1 = F.col("event_type") == "view"
    is2 = F.col("event_type") == "purchase"
    m = (
        t.events.filter(F.col("event_type").isin("view", "purchase"))
        .select(
            "event_type",
            units.alias("u"),
        )
        .agg(
            F.sum(F.when(is1, 1).otherwise(0)).alias("n1"),
            F.sum(F.when(is2, 1).otherwise(0)).alias("n2"),
            F.sum(F.when(is1, F.col("u")).otherwise(0)).alias("is1"),
            F.sum(F.when(is2, F.col("u")).otherwise(0)).alias("is2"),
            F.sum(F.when(is1, F.col("u") * F.col("u")).otherwise(0)).alias(
                "iss1"
            ),
            F.sum(F.when(is2, F.col("u") * F.col("u")).otherwise(0)).alias(
                "iss2"
            ),
        )
    )
    d = m.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("n1").cast("double").alias("nd1"),
        F.col("n2").cast("double").alias("nd2"),
        F.col("is1").cast("double").alias("s1d"),
        F.col("is2").cast("double").alias("s2d"),
        F.col("iss1").cast("double").alias("ss1d"),
        F.col("iss2").cast("double").alias("ss2d"),
    )
    return d.select(
        "n1",
        "n2",
        qnt(F.expr(_W_MDIFF), "mean_diff"),
        qnt(F.expr(_W_T), "t_stat"),
        qnt(F.expr(_W_DF), "df_welch"),
    )


@op(
    "event_attribution",
    sql="""
    WITH p AS (
        SELECT event_id AS pid, user_id, ts AS pts,
               CASE WHEN ABS(value) <= 1.7976931348623157e308 AND value >= 0
                    THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                    WHEN ABS(value) <= 1.7976931348623157e308
                    THEN -CAST(FLOOR(-value * 100.0 + 0.5) AS BIGINT)
               END AS pu
        FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT user_id, ts, event_type
        FROM events WHERE event_type IN ('view', 'click')
    ),
    joined AS (
        SELECT p.pid, p.pu, t.event_type
        FROM p JOIN touch t
          ON t.user_id = p.user_id
         AND t.ts < p.pts
         AND t.ts >= p.pts - INTERVAL 7 DAY
    ),
    k AS (
        SELECT pid, COUNT(*) AS n_touch FROM joined GROUP BY pid
    ),
    credit AS (
        SELECT j.event_type,
               (j.pu * 1000) // k.n_touch AS cmu
        FROM joined j JOIN k ON k.pid = j.pid
    )
    SELECT event_type AS touch_type,
           COUNT(*) AS n_touches,
           CAST(CAST(SUM(cmu) AS BIGINT) AS DOUBLE) / 100000 AS credited_value
    FROM credit
    GROUP BY event_type
    """,
)
def event_attribution(spark, sf_dir):
    """Multi-touch LINEAR attribution: each purchase's value is split
    evenly across the user's view/click touchpoints in the preceding
    7 days, then credited value rolls up per touchpoint type — the
    marketing-analytics question ("how much revenue do views vs
    clicks drive") behind every attribution dashboard; first/last-
    touch are the k=1 degenerate of the same join.

    Exactness discipline: purchase value rounds once to cent units,
    each touch's share is the INTEGER division (units·1000) div k —
    milli-cent credits, identical on both engines, no per-share float
    rounding to drift (the ≤ k−1 milli-cent truncation per purchase
    is deterministic). Shape: the touch join is user-keyed equi with
    a time-range residual (the join_interval discipline — never a
    time-keyed theta join), per-purchase fan-out k comes from one
    aggregate on the join result, and the final rollup is
    aggregate-sized. At 100 TB everything shuffles on user_id/pid
    keys with partial aggregation; a user's 7-day touch history
    bounds the fan-out."""
    t = Tables(spark, sf_dir)
    v = finite_or_null("value")
    units = F.when(v >= 0, F.floor(v * 100.0 + F.lit(0.5))).when(
        v < 0, -F.floor(-v * 100.0 + F.lit(0.5))
    )
    p = t.events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("puid"),
        F.col("ts").alias("pts"),
        units.alias("pu"),
    )
    touch = t.events.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", "ts", "event_type"
    )
    joined = p.join(
        touch,
        (touch["user_id"] == p["puid"])
        & (touch["ts"] < p["pts"])
        & (touch["ts"] >= p["pts"] - F.expr("INTERVAL 7 DAY")),
    ).select("pid", "pu", "event_type")
    k = joined.groupBy("pid").agg(F.count(F.lit(1)).alias("n_touch"))
    credit = joined.join(k, "pid").select(
        "event_type",
        F.expr("(pu * 1000) div n_touch").alias("cmu"),
    )
    return credit.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        (F.sum("cmu").cast("double") / 100000).alias("credited_value"),
    ).select(
        F.col("event_type").alias("touch_type"), "n_touches", "credited_value"
    )


# Pearson chi-square for a 2x2 contingency table, as ONE fixed IEEE
# double expression over exact BIGINT cell counts (the _W_T/_CORR_EXPR
# discipline): chi2 = N*(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)), df=1.
# NULLIF guards the degenerate margins (an empty row/column makes the
# test undefined -> NULL on both engines, never Inf through FLOOR).
_CHI2 = (
    "((na + nb + nc + ndd) * (na * ndd - nb * nc) * (na * ndd - nb * nc) / "
    "nullif((na + nb) * (nc + ndd) * (na + nc) * (nb + ndd), 0.0))"
)
_CHI2_CUT = 50.0  # success = event value >= this


@op(
    "ab_chi2",
    sql=f"""
    WITH m AS (
        SELECT
            SUM(CASE WHEN event_type = 'view' AND value >= {_CHI2_CUT!r}
                     THEN 1 ELSE 0 END) AS a,
            SUM(CASE WHEN event_type = 'view' AND value < {_CHI2_CUT!r}
                     THEN 1 ELSE 0 END) AS b,
            SUM(CASE WHEN event_type = 'click' AND value >= {_CHI2_CUT!r}
                     THEN 1 ELSE 0 END) AS c,
            SUM(CASE WHEN event_type = 'click' AND value < {_CHI2_CUT!r}
                     THEN 1 ELSE 0 END) AS d
        FROM events WHERE event_type IN ('view', 'click')
    ),
    dd AS (
        SELECT CAST(a AS BIGINT) AS n11, CAST(b AS BIGINT) AS n10,
               CAST(c AS BIGINT) AS n01, CAST(d AS BIGINT) AS n00,
               CAST(a AS DOUBLE) AS na, CAST(b AS DOUBLE) AS nb,
               CAST(c AS DOUBLE) AS nc, CAST(d AS DOUBLE) AS ndd
        FROM m
    )
    SELECT n11, n10, n01, n00,
           FLOOR({_CHI2} * 1e6 + 0.5) / 1e6 AS chi2_stat
    FROM dd
    """,
)
def ab_chi2(spark, sf_dir):
    """Pearson chi-square independence test on a 2x2 contingency
    table (view-vs-click arm x value>=50 outcome) — the categorical
    counterpart to `ab_ttest_welch`: conversion-rate A/B tests compare
    proportions, not means, and chi-square (df=1) is their standard
    significance primitive.

    One conditional-aggregation pass produces the four exact BIGINT
    cells (map-side combinable; at 100 TB the same four integers merge
    by addition across days/shards — sequential testing for free);
    chi2 derives in ONE fixed double formula both engines evaluate on
    identical integers, then quantizes. NULLIF nulls the degenerate
    empty-margin case on both engines."""
    t = Tables(spark, sf_dir)
    is_v = F.col("event_type") == "view"
    is_c = F.col("event_type") == "click"
    hit = F.col("value") >= _CHI2_CUT
    m = (
        t.events.filter(F.col("event_type").isin("view", "click"))
        .agg(
            F.sum(F.when(is_v & hit, 1).otherwise(0)).alias("a"),
            F.sum(F.when(is_v & ~hit, 1).otherwise(0)).alias("b"),
            F.sum(F.when(is_c & hit, 1).otherwise(0)).alias("c"),
            F.sum(F.when(is_c & ~hit, 1).otherwise(0)).alias("d"),
        )
    )
    dd = m.select(
        F.col("a").cast("long").alias("n11"),
        F.col("b").cast("long").alias("n10"),
        F.col("c").cast("long").alias("n01"),
        F.col("d").cast("long").alias("n00"),
        F.col("a").cast("double").alias("na"),
        F.col("b").cast("double").alias("nb"),
        F.col("c").cast("double").alias("nc"),
        F.col("d").cast("double").alias("ndd"),
    )
    return dd.select(
        "n11", "n10", "n01", "n00", qnt(F.expr(_CHI2), "chi2_stat")
    )


@op(
    "analytics_churn",
    sql="""
    WITH am AS (
        SELECT DISTINCT user_id,
               CAST(date_diff('day', DATE '1970-01-05',
                              CAST(date_trunc('week', ts) AS DATE)) // 7
                    AS BIGINT) AS midx,
               date_trunc('week', ts) AS period
        FROM events
    ),
    cls AS (
        SELECT user_id, midx, period,
               MIN(midx) OVER (PARTITION BY user_id) AS first_idx,
               lag(midx) OVER (PARTITION BY user_id ORDER BY midx) AS prev_idx
        FROM am
    ),
    g AS (
        SELECT period, midx,
               COUNT(*) AS n_active,
               CAST(SUM(CASE WHEN midx = first_idx THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_new,
               CAST(SUM(CASE WHEN prev_idx = midx - 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_retained,
               CAST(SUM(CASE WHEN midx > first_idx
                         AND (prev_idx IS NULL OR prev_idx < midx - 1)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        FROM cls GROUP BY period, midx
    )
    SELECT period, n_active, n_new, n_retained, n_resurrected,
           COALESCE(lag(n_active) OVER (ORDER BY midx), 0) - n_retained
               AS n_churned
    FROM g
    """,
)
def analytics_churn(spark, sf_dir):
    """Weekly growth-accounting: every active user in every week is
    exactly one of NEW (first week ever), RETAINED (also active the
    previous calendar week) or RESURRECTED (returning after a gap),
    and CHURNED(w) = active(w-1) − retained(w) — the subscription-
    analytics identity every growth dashboard reports (active =
    new + retained + resurrected is asserted as the invariant test).
    Weekly because the fixture event stream spans one 30-day month —
    the period column generalizes to any date_trunc grain.

    One distinct over (user, week) — same user_id shuffle the other
    analytics keys reuse — then two per-user window columns (first
    week, previous week; weeks as a linear days-since-epoch//7 index
    so calendar adjacency is integer adjacency), a per-week aggregate,
    and the churn lag over the aggregate-sized week frame. The final
    window is single-partition but runs over |weeks| rows, not the
    raw table — the vocab_coverage lesson applied."""
    t = Tables(spark, sf_dir)
    # linear week index: days since Monday 1970-01-05 // 7, so calendar
    # adjacency is integer adjacency (both engines truncate weeks to
    # Monday — the retention_cohort precedent)
    wk = F.date_trunc("week", "ts")
    midx = F.floor(
        F.datediff(wk.cast("date"), F.lit("1970-01-05").cast("date")) / 7
    ).cast("long")
    am = t.events.select(
        "user_id",
        midx.alias("midx"),
        wk.alias("period"),
    ).distinct()
    wu = Window.partitionBy("user_id")
    cls = am.select(
        "user_id",
        "midx",
        "period",
        F.min("midx").over(wu).alias("first_idx"),
        F.lag("midx").over(wu.orderBy("midx")).alias("prev_idx"),
    )
    g = cls.groupBy("period", "midx").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum(F.when(F.col("midx") == F.col("first_idx"), 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(F.when(F.col("prev_idx") == F.col("midx") - 1, 1).otherwise(0))
        .cast("long")
        .alias("n_retained"),
        F.sum(
            F.when(
                (F.col("midx") > F.col("first_idx"))
                & (
                    F.col("prev_idx").isNull()
                    | (F.col("prev_idx") < F.col("midx") - 1)
                ),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_resurrected"),
    )
    wm = Window.orderBy("midx")
    return g.select(
        "period",
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
        (
            F.coalesce(F.lag("n_active").over(wm), F.lit(0))
            - F.col("n_retained")
        ).alias("n_churned"),
    )


@op(
    "event_cooccurrence",
    sql="""
    WITH u AS (SELECT DISTINCT user_id, event_type FROM events),
    k AS (SELECT event_type, COUNT(*) AS n FROM u GROUP BY event_type),
    tot AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS nu FROM u),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS n_both
        FROM u a JOIN u b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_both,
           FLOOR(p.n_both / t.nu * 1e6 + 0.5) / 1e6 AS support,
           FLOOR(p.n_both * t.nu / (ka.n * CAST(kb.n AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS lift
    FROM pairs p
    JOIN k ka ON ka.event_type = p.type_a
    JOIN k kb ON kb.event_type = p.type_b
    CROSS JOIN tot t
    """,
)
def event_cooccurrence(spark, sf_dir):
    """Event-type co-occurrence with support and lift — the
    market-basket association primitive over user behavior: for each
    unordered pair of event types, how many users do both, what
    fraction of all users that is, and how far it deviates from
    independence (lift = P(a,b) / (P(a)·P(b)); >1 means doing A makes
    B more likely).

    Per-user distinct types first (≤|event_type| rows per user — the
    explode is bounded by the type vocabulary, never by event volume),
    pair generation as a self-equi-join ON user_id with the a<b
    canonical ordering, then an aggregate over ≤|types|² keys with the
    tiny marginals broadcast back. All counts exact BIGINTs; support
    and lift are single fixed double expressions, quantized."""
    t = Tables(spark, sf_dir)
    # NOT persisted (r12, measured): u feeds 4 consumers, but pinning
    # it read 1.0-1.1 s -> 1.5-1.6 s at sf0.1 — the same
    # cache-materialization-beats-recompute negative result as
    # funnel_conversion. The pins that DO pay here all share one
    # trait: the duplicated subtree contains an expensive per-row
    # kernel (a Python UDF or the 56-term dHash), not a plain
    # scan+distinct.
    u = t.events.select("user_id", "event_type").distinct()
    k = u.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    tot = u.agg(F.countDistinct("user_id").cast("double").alias("nu"))
    a, b = u.alias("a"), u.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ka = k.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    kb = k.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (
        pairs.join(F.broadcast(ka), "type_a")
        .join(F.broadcast(kb), "type_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_both",
            qnt(F.col("n_both") / F.col("nu"), "support"),
            qnt(
                F.col("n_both")
                * F.col("nu")
                / (F.col("na") * F.col("nb").cast("double")),
                "lift",
            ),
        )
    )


@op(
    "win_pattern_var",
    sql="""
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS seq
        FROM events
    ),
    clicks AS (
        SELECT user_id, seq,
               seq - row_number() OVER (
                   PARTITION BY user_id ORDER BY seq
               ) AS island
        FROM seq WHERE event_type = 'click'
    ),
    runs AS (
        SELECT user_id, MIN(seq) AS s, MAX(seq) AS e,
               COUNT(*) AS run_len
        FROM clicks GROUP BY user_id, island
    )
    SELECT r.user_id,
           COUNT(*) AS n_matches,
           CAST(SUM(r.run_len) AS BIGINT) AS total_clicks,
           CAST(MAX(r.run_len) AS BIGINT) AS longest_run
    FROM runs r
    JOIN seq v ON v.user_id = r.user_id AND v.seq = r.s - 1
              AND v.event_type = 'view'
    JOIN seq p ON p.user_id = r.user_id AND p.seq = r.e + 1
              AND p.event_type = 'purchase'
    GROUP BY r.user_id
    """,
)
def win_pattern_var(spark, sf_dir):
    """VARIABLE-LENGTH pattern matching — `view click+ purchase` per
    user, the `B+` quantifier `win_pattern_match`'s fixed-length
    lead() chain cannot express (its documented "lite" scope; this key
    closes that gap declaratively). A MATCH_RECOGNIZE
    `PATTERN (V C+ P)` with greedy runs: every maximal consecutive
    click run whose immediate predecessor is a view and immediate
    successor is a purchase counts as one match.

    The quantifier compiles to GAP-ISLANDS instead of an NFA: maximal
    click runs are islands (seq − rank over clicks), and the V/P
    anchors are two equi-joins back to the sequence table on
    (user, seq±1) — all user-keyed, sharing ONE exchange with the
    sequence window; no variable-length self-join blowup, no state
    machine, no per-row Python. At 100 TB every stage is partitioned
    by user; run lengths are bounded by per-user history, not corpus
    size."""
    t = Tables(spark, sf_dir)
    ws = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        "user_id",
        "event_type",
        F.row_number().over(ws).alias("seq"),
    )
    wc = Window.partitionBy("user_id").orderBy("seq")
    clicks = seq.filter(F.col("event_type") == "click").select(
        "user_id",
        "seq",
        (F.col("seq") - F.row_number().over(wc)).alias("island"),
    )
    runs = clicks.groupBy("user_id", "island").agg(
        F.min("seq").alias("s"),
        F.max("seq").alias("e"),
        F.count(F.lit(1)).alias("run_len"),
    )
    v = seq.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("seq").alias("vseq")
    )
    p = seq.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("seq").alias("pseq")
    )
    return (
        runs.join(
            v,
            (F.col("user_id") == F.col("vu"))
            & (F.col("vseq") == F.col("s") - 1),
        )
        .join(
            p,
            (F.col("user_id") == F.col("pu"))
            & (F.col("pseq") == F.col("e") + 1),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.sum("run_len").cast("long").alias("total_clicks"),
            F.max("run_len").cast("long").alias("longest_run"),
        )
    )


@op(
    "event_markov_transitions",
    sql="""
    WITH seq AS (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    pairs AS (
        SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (
        SELECT prev_type, CAST(SUM(n) AS BIGINT) AS row_total
        FROM pairs GROUP BY 1
    )
    SELECT p.prev_type, p.event_type, p.n,
           FLOOR(CAST(p.n AS DOUBLE) / t.row_total * 1e6 + 0.5)
               / 1e6 AS prob
    FROM pairs p JOIN tot t ON p.prev_type = t.prev_type
    """,
)
def event_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix of the event stream: for
    every (previous type → next type) pair, the transition count over
    all users' time-ordered streams and the row-normalized transition
    probability P(next | prev). The |types|² matrix is what
    next-action prediction baselines, anomaly scoring (improbable
    transitions) and the `event_paths` n-gram view all start from.

    One user-keyed window (lag over (ts, event_id) — the same single
    exchange every per-user operator here rides), then a
    |types|²-sized hash aggregate and a broadcast join to the row
    totals. Counts are exact BIGINTs; the probability is one fixed
    double division, 1e-6-quantized on both engines. Each user's
    first event has no predecessor and is excluded on both sides, so
    the invariant Σ counts = |events| − |users| pins the matrix
    against the raw table (test_r6_operators)."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        t.events.select(
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = pairs.groupBy("prev_type").agg(
        F.sum("n").cast("long").alias("row_total")
    )
    return pairs.join(F.broadcast(tot), "prev_type").select(
        "prev_type",
        "event_type",
        "n",
        qnt(F.col("n").cast("double") / F.col("row_total"), "prob"),
    )


# Revenue concentration shards: like vocab_coverage, the global
# rank+cumsum runs as a range-sharded two-pass prefix sum, never a
# single-partition window. Shard ids come from approx-quantile
# boundaries of the per-user revenue (broadcast); the boundary set only
# routes rows — every output value is reconstructed exactly from local
# ranks + per-shard offsets, so the oracle can use a plain window.
_PARETO_SHARDS = 8


@op(
    "analytics_pareto",
    sql="""
    WITH rev AS (
        SELECT user_id,
               CAST(SUM(CAST(FLOOR((CASE WHEN ABS(value) <= 1.7976931348623157e308 THEN value END) * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    ranked AS (
        SELECT rev_c,
               row_number() OVER (ORDER BY rev_c DESC, user_id) AS rk
        FROM rev
    ),
    cum AS (
        SELECT rk,
               CAST(SUM(rev_c) OVER (ORDER BY rk
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_c
        FROM ranked
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(rev_c) AS BIGINT) AS c
        FROM rev
    )
    SELECT (cum.rk * 10 + tot.n - 1) // tot.n AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MAX(cum.rk) AS BIGINT) AS cum_users,
           CAST(max_by(cum.cum_c, cum.rk) AS DOUBLE) / 100.0
               AS cum_revenue,
           FLOOR(max_by(cum.cum_c, cum.rk) / CAST(tot.c AS DOUBLE)
                 * 1e6 + 0.5) / 1e6 AS cum_share
    FROM cum CROSS JOIN tot
    GROUP BY decile, tot.n, tot.c
    """,
)
def analytics_pareto(spark, sf_dir):
    """Revenue concentration (Pareto / Lorenz curve by decile): rank
    purchasers by total purchase revenue, cut into 10 equal-count
    deciles, and report each decile's user count plus the CUMULATIVE
    users/revenue/revenue-share at its boundary — the "top 10% of
    customers drive X% of revenue" table behind every account-tiering
    and whale-risk dashboard.

    Per-user revenue is an exact BIGINT cent sum (round-half-up per
    row, then integer addition — no float accumulation order anywhere).
    The global rank+cumsum over the user aggregate is the
    `vocab_coverage` RANGE-SHARDED TWO-PASS prefix sum: approx-quantile
    boundaries broadcast as shard router, local row_number+running sum
    per shard, per-shard totals turned into exclusive offsets via a
    triangular join on the shard-count-sized totals table — no
    single-partition window even when "users" means billions. Deciles
    are exact integer arithmetic (ceil(rk·10/n) via (rk·10+n−1) div n);
    the only doubles are the final /100 and the 1e-6-quantized share."""
    t = Tables(spark, sf_dir)
    rev = (
        t.events.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.floor(finite_or_null("value") * 100.0 + 0.5).cast("long")
            ).cast("long").alias("rev_c")
        )
    )
    qsplits = [i / _PARETO_SHARDS for i in range(1, _PARETO_SHARDS)]
    bounds = rev.agg(F.percentile_approx("rev_c", qsplits, 10_000).alias("bs"))
    part = (
        rev.crossJoin(F.broadcast(bounds))
        .withColumn(
            "pid",
            F.aggregate(
                "bs",
                F.lit(0),
                lambda acc, b: acc + F.when(b > F.col("rev_c"), 1).otherwise(0),
            ),
        )
        .drop("bs")
    )
    w_local = Window.partitionBy("pid").orderBy(
        F.col("rev_c").desc(), "user_id"
    )
    local = part.select(
        "pid",
        "rev_c",
        F.row_number().over(w_local).cast("long").alias("lrk"),
        F.sum("rev_c")
        .over(w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("lcum"),
    )
    tots = part.groupBy("pid").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev_c").cast("long").alias("s"),
    )
    offs = (
        tots.alias("a")
        .join(tots.alias("b"), F.col("b.pid") < F.col("a.pid"), "left")
        .groupBy(F.col("a.pid").alias("pid"))
        .agg(
            F.coalesce(F.sum("b.n"), F.lit(0)).cast("long").alias("rk_off"),
            F.coalesce(F.sum("b.s"), F.lit(0)).cast("long").alias("c_off"),
        )
    )
    grand = tots.agg(
        F.sum("n").cast("long").alias("tot_n"),
        F.sum("s").cast("long").alias("tot_c"),
    )
    g = (
        local.join(F.broadcast(offs), "pid")
        .select(
            (F.col("lrk") + F.col("rk_off")).alias("rk"),
            (F.col("lcum") + F.col("c_off")).cast("long").alias("cum_c"),
        )
        .crossJoin(F.broadcast(grand))
        .withColumn(
            "decile",
            F.expr("(rk * 10 + tot_n - 1) div tot_n"),
        )
    )
    return g.groupBy("decile", "tot_n", "tot_c").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.max("rk").alias("cum_users"),
        F.max(F.struct("rk", "cum_c")).alias("bx"),
    ).select(
        "decile",
        "n_users",
        "cum_users",
        (F.col("bx.cum_c").cast("double") / 100.0).alias("cum_revenue"),
        qnt(F.col("bx.cum_c") / F.col("tot_c").cast("double"), "cum_share"),
    )


@op(
    "analytics_dau_mau",
    sql="""
    WITH ad AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ),
    days AS (SELECT DISTINCT day FROM ad),
    dau AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ad GROUP BY day
    ),
    mau AS (
        SELECT d.day, CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS mau28
        FROM days d
        JOIN ad a
          ON a.day <= d.day AND a.day > d.day - INTERVAL 28 DAY
        GROUP BY d.day
    )
    SELECT dau.day, dau.dau, mau.mau28,
           FLOOR(CAST(dau.dau AS DOUBLE) / mau.mau28 * 1e6 + 0.5) / 1e6
               AS stickiness
    FROM dau JOIN mau ON dau.day = mau.day
    """,
)
def analytics_dau_mau(spark, sf_dir):
    """DAU / trailing-28-day MAU / stickiness per day — the
    engagement headline ("what fraction of the monthly audience shows
    up daily") every product-analytics overview leads with, next to
    `analytics_churn`'s weekly growth accounting.

    Exactness: DAU and MAU are exact BIGINT distinct counts (no HLL;
    the sketch swap is `agg_approx_count_distinct`'s); stickiness is
    the one quantized double ratio, MAU >= DAU > 0 by construction so
    no zero guard is needed.

    Scale: the raw stream collapses FIRST to the distinct (user, day)
    activity table — aggregate-sized, |users| x |days| at worst — and
    the 28-day sliding membership is an explode of that table to the
    <=28 window-end days each activity row supports, then one distinct
    count per day. The oracle states the same window as a declarative
    range join (DuckDB IEJoin); the Spark side deliberately avoids the
    range join because the explode's fan-out is a CONSTANT 28 on an
    aggregate-sized input — a plain equi-shuffle Catalyst can
    partition, vs a broadcast range join it cannot. The heavy input is
    scanned exactly once."""
    t = Tables(spark, sf_dir)
    ad = (
        t.events.select(
            "user_id", F.date_trunc("day", "ts").alias("day")
        )
        .distinct()
    )
    days = ad.select("day").distinct()
    dau = ad.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    support = ad.select(
        "user_id",
        F.explode(
            F.expr("sequence(day, day + INTERVAL 27 DAYS, INTERVAL 1 DAY)")
        ).alias("day"),
    )
    mau = (
        support.join(days, "day", "left_semi")  # only days that exist
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("long").alias("mau28"))
    )
    return (
        dau.join(mau, "day")
        .select(
            "day",
            "dau",
            "mau28",
            qnt(
                F.col("dau").cast("double") / F.col("mau28"), "stickiness"
            ),
        )
    )


@op(
    "analytics_ltv_cohort",
    sql="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    cells AS (
        SELECT f.cohort_week,
               CAST(datediff('day', f.cohort_week,
                             date_trunc('week', e.ts)) / 7 AS BIGINT)
                   AS age_week,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active,
               CAST(SUM(CASE WHEN e.event_type = 'purchase'
                             THEN CAST(FLOOR((CASE WHEN ABS(e.value) <= 1.7976931348623157e308 THEN e.value END) * 100.0 + 0.5)
                                       AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS rev_units
        FROM events e JOIN firsts f USING (user_id)
        GROUP BY 1, 2
    ),
    sizes AS (
        SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_users
        FROM firsts GROUP BY cohort_week
    )
    SELECT c.cohort_week, c.age_week, s.cohort_users, c.n_active,
           CAST(c.rev_units AS DOUBLE) / 100 AS revenue,
           CAST(SUM(c.rev_units) OVER w AS DOUBLE) / 100 AS cum_revenue,
           FLOOR(CAST(SUM(c.rev_units) OVER w AS DOUBLE)
                 / (100 * s.cohort_users) * 1e6 + 0.5) / 1e6
               AS ltv_per_user
    FROM cells c JOIN sizes s ON c.cohort_week = s.cohort_week
    WINDOW w AS (PARTITION BY c.cohort_week ORDER BY c.age_week)
    """,
)
def analytics_ltv_cohort(spark, sf_dir):
    """Cohort LTV curve: users grouped by first-seen week; per
    (cohort, age-in-weeks) the active count, purchase revenue, running
    cumulative revenue, and cumulative LTV per cohort member — the
    payback/monetization table `retention_cohort` (presence only)
    feeds, and the curve every growth model fits its LTV:CAC ratio on.

    Determinism: revenue rides the exact cent-unit BIGINT discipline
    (events.value is non-negative in this corpus — stated contract,
    as ts_period_delta pins), the running sum accumulates BIGINT
    units BEFORE the one display division, and weeks truncate to
    Monday on both engines with exact /7 offsets (retention_cohort's
    proof).

    Scale: one user-keyed first-seen aggregate, one join back on the
    same key (bucketed events make it shuffle-free), one cell rollup;
    the LTV window runs over the aggregate-sized cohort x age table.
    The heavy stream is touched twice on one key — or once if the
    first-seen table is maintained incrementally (merge_upsert's
    job)."""
    t = Tables(spark, sf_dir)
    firsts = t.events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    cents = F.when(
        F.col("event_type") == "purchase",
        F.floor(finite_or_null("value") * 100.0 + F.lit(0.5)).cast("long"),
    ).otherwise(F.lit(0))
    cells = (
        t.events.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", "ts"), F.col("cohort_week"))
                / 7
            )
            .cast("long")
            .alias("age_week"),
        )
        .agg(
            F.count_distinct("user_id").cast("long").alias("n_active"),
            F.sum(cents).cast("long").alias("rev_units"),
        )
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    w = Window.partitionBy("cohort_week").orderBy("age_week")
    cum_units = F.sum("rev_units").over(w)
    return (
        cells.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "age_week",
            "cohort_users",
            "n_active",
            (F.col("rev_units").cast("double") / 100).alias("revenue"),
            (cum_units.cast("double") / 100).alias("cum_revenue"),
            qnt(
                cum_units.cast("double") / (100 * F.col("cohort_users")),
                "ltv_per_user",
            ),
        )
    )


_BASKET_MIN_PAIR = 2


@op(
    "basket_lift",
    sql=f"""
    WITH items AS (
        SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS it
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    nb AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_baskets
           FROM items),
    ic AS (SELECT it, CAST(COUNT(*) AS BIGINT) AS n_it
           FROM items GROUP BY it),
    pairs AS (
        SELECT a.it AS item_a, b.it AS item_b,
               CAST(COUNT(*) AS BIGINT) AS n_pair
        FROM items a JOIN items b ON a.ok = b.ok AND a.it < b.it
        GROUP BY 1, 2
        HAVING COUNT(*) >= {_BASKET_MIN_PAIR}
    )
    SELECT p.item_a, p.item_b, p.n_pair,
           ia.n_it AS n_a, ib.n_it AS n_b,
           FLOOR(CAST(p.n_pair AS DOUBLE) / nb.n_baskets * 1e6 + 0.5)
               / 1e6 AS support,
           FLOOR(CAST(p.n_pair AS DOUBLE) / ia.n_it * 1e6 + 0.5)
               / 1e6 AS conf_a_b,
           FLOOR(CAST(p.n_pair AS DOUBLE) * nb.n_baskets
                 / (CAST(ia.n_it AS DOUBLE) * ib.n_it) * 1e6 + 0.5)
               / 1e6 AS lift
    FROM pairs p
    JOIN ic ia ON ia.it = p.item_a
    JOIN ic ib ON ib.it = p.item_b
    CROSS JOIN nb
    """,
)
def basket_lift(spark, sf_dir):
    """Market-basket association rules (Agrawal & Srikant's classic
    support/confidence frame) over orders-as-baskets at the brand
    level: for every brand pair co-bought in >= 2
    orders, its support, the a->b confidence, and the lift vs
    independence — lift > 1 is the cross-sell signal
    `event_cooccurrence` computes for event types, here on the
    merchandising side of the star schema.

    Exact integer counting everywhere; the three ratios are one-shot
    float expressions quantized to 1e-6. The 1-row basket-total
    attaches as a broadcast scalar onto the ≤ |brands|² pair table
    (bounded both sides — plan-lint allowlisted like text_tfidf's
    corpus-size attach).

    Scale (100 TB): part is the broadcast dim; each order's brand SET
    is collected in ONE order-keyed shuffle (map-side partial
    collect_set dedupes pre-exchange); identical baskets then
    COLLAPSE into weighted patterns (groupBy on the sorted array —
    at brand granularity 15M orders fold into a few thousand
    distinct patterns), so pair expansion and all downstream counts
    run over patterns x weight instead of per order. Pairs expand in
    codegen from the sorted array (≤ |brands per order|² per
    PATTERN, no self-join) and aggregate map-side into the
    ≤ |brands|² pair table; item counts (|brands| rows) broadcast
    back onto it. A/B at x100 (60M lineitem): per-order expansion
    28.8 s vs pattern-collapsed 16.7 s, identical 300-row output —
    DuckDB twin 16.6 s, parity. The verdict-suggested apriori prune
    (drop items with n_it < min-pair-support before expansion) is a
    no-op at brand cardinality (all 25 brands are frequent) and was
    not adopted; at SKU granularity it composes with the pattern
    collapse by intersecting each pattern against the broadcast
    frequent-item set first."""
    t = Tables(spark, sf_dir)
    # ONE shuffle: collect each order's brand SET directly (map-side
    # partial collect_set dedupes before the exchange) instead of
    # materializing distinct (order, brand) and self-joining it —
    # measured 60.9 s -> single-digit s at x100, where the self-join
    # shuffled both 60M-row sides.
    baskets = (
        t.lineitem.select("l_orderkey", "l_partkey")
        .join(
            F.broadcast(t.part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.array_sort(F.collect_set("p_brand")).alias("its"))
    )
    # Collapse identical baskets: every downstream count is weighted
    # by the pattern multiplicity, so the expensive explode runs on
    # |patterns| rows, not |orders|.
    # NEGATIVE RESULT (r12, measured, do not re-try): persisting pats
    # (it feeds nb, ic and pairs, so the lineitem⋈part scan + basket
    # shuffles run 3x) read WORSE in 3 of 4 interleaved sf0.1 noop
    # A/Bs — 1.96→2.20, 2.12→3.00, 1.92→2.73 s (one inversion
    # 2.58→2.04). Cache materialization of the array<string> pattern
    # column serializes the freely-pipelined branches, same class as
    # the funnel_conversion negative below.
    pats = baskets.groupBy("its").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    nb = pats.agg(F.sum("cnt").cast("long").alias("n_baskets"))
    ic = (
        pats.select(F.explode("its").alias("it"), "cnt")
        .groupBy("it")
        .agg(F.sum("cnt").cast("long").alias("n_it"))
    )
    # all a<b pairs of the sorted set, expanded in codegen: for index i,
    # pair element i with every later element
    pair_arr = F.flatten(
        F.transform(
            F.col("its"),
            lambda x, i: F.transform(
                F.slice(F.col("its"), i + 2, F.size(F.col("its"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        pats.select(F.explode(pair_arr).alias("p"), "cnt")
        .groupBy(
            F.col("p.a").alias("item_a"), F.col("p.b").alias("item_b")
        )
        .agg(F.sum("cnt").cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= _BASKET_MIN_PAIR)
    )
    ia = ic.select(F.col("it").alias("item_a"), F.col("n_it").alias("n_a"))
    ib = ic.select(F.col("it").alias("item_b"), F.col("n_it").alias("n_b"))
    out = (
        pairs.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(nb))
    )
    pair_d = F.col("n_pair").cast("double")
    return out.select(
        "item_a",
        "item_b",
        "n_pair",
        "n_a",
        "n_b",
        qnt(pair_d / F.col("n_baskets"), "support"),
        qnt(pair_d / F.col("n_a"), "conf_a_b"),
        qnt(
            pair_d
            * F.col("n_baskets")
            / (F.col("n_a").cast("double") * F.col("n_b")),
            "lift",
        ),
    )


@op(
    "event_sequence_ngrams",
    sql="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type, 1) OVER w AS t1,
               LEAD(event_type, 2) OVER w AS t2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT concat_ws('>', event_type, t1, t2) AS journey,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM seq WHERE t2 IS NOT NULL
    GROUP BY 1
    ORDER BY n_occurrences DESC, journey
    LIMIT 20
    """,
)
def event_sequence_ngrams(spark, sf_dir):
    """Top user-journey TRIGRAMS: the most common three-step
    event-type sequences across all users (with how many distinct
    users walk each), ordered by occurrence with a lexical tiebreak.
    `event_markov_transitions` is the bigram/probability view; this
    is its raw-pattern twin — the "what do people actually DO in
    order" table behind funnel design, and text_ngram_freq's shape
    applied to the event stream instead of documents.

    Exact integer counting; the journey key is a plain string concat
    over non-null triples (strictly consecutive per user, (ts,
    event_id) order).

    Scale (100 TB): one user-keyed window shuffle builds the lead
    chain (the win_pattern_match plan), the trigram groupBy is
    map-combinable over a |types|³-bounded key space, and the top-20
    plans as TakeOrdered — no full sort. A collect_list-per-user
    variant (array_sort + codegen triple expansion, no global window
    sort) was A/B'd at x100 and LOST, 3.41 s vs 2.15 s — per-user
    array materialization costs more than the window's
    sort-within-partitions; the residual gap to DuckDB (~0.6 s) is
    the one irreducible 10M-row sort exchange."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    ).filter(F.col("t2").isNotNull())
    # two-level aggregate instead of count + countDistinct in one
    # pass: the mixed form plans an Expand that doubles every journey
    # row through the shuffle, while (journey, user) partials collapse
    # map-side first (x100: 2.42 -> 2.13 s, identical output)
    per_user = seq.groupBy(
        F.concat_ws(">", "event_type", "t1", "t2").alias("journey"),
        "user_id",
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        per_user.groupBy("journey")
        .agg(
            F.sum("n").cast("long").alias("n_occurrences"),
            # count("user_id"), not count(1): groupBy keeps a NULL
            # user_id as its own group, but the oracle's
            # COUNT(DISTINCT user_id) ignores NULLs
            F.count("user_id").cast("long").alias("n_users"),
        )
        .orderBy(F.col("n_occurrences").desc(), "journey")
        .limit(20)
    )


@op(
    "funnel_step_latency",
    sql="""
    WITH s1 AS (
        SELECT user_id, event_type, ts,
               MIN(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS tv
        FROM events
    ),
    s2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > tv
                           THEN ts END)
                      OVER (PARTITION BY user_id) AS tc
        FROM s1
    ),
    s3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > tc
                           THEN ts END)
                      OVER (PARTITION BY user_id) AS tp
        FROM s2
    ),
    g AS (
        SELECT user_id, MAX(tv) AS tv, MAX(tc) AS tc, MAX(tp) AS tp
        FROM s3 GROUP BY user_id
    ),
    lat AS (
        SELECT 'view>click' AS step,
               (epoch_us(tc) - epoch_us(tv)) // 1000000 AS lat_s
        FROM g WHERE tc IS NOT NULL
        UNION ALL
        SELECT 'click>purchase' AS step,
               (epoch_us(tp) - epoch_us(tc)) // 1000000 AS lat_s
        FROM g WHERE tp IS NOT NULL
    )
    SELECT step, CAST(COUNT(*) AS BIGINT) AS n_converted,
           ROUND(QUANTILE_CONT(lat_s, 0.5), 6) AS median_s,
           ROUND(QUANTILE_CONT(lat_s, 0.9), 6) AS p90_s
    FROM lat GROUP BY step
    """,
)
def funnel_step_latency(spark, sf_dir):
    """Time-to-convert per funnel step — `funnel_conversion` says how
    MANY users advance view→click→purchase; this says how FAST: for
    each user, the first view, the first click strictly after it, and
    the first purchase strictly after that, with the median and p90
    latency (whole seconds) of each step over converting users. The
    p90 is what conversion SLAs and retargeting windows are set from.

    Determinism: step anchors are exact MIN picks over the user's
    stream, latencies are exact integer µs deltas floored to seconds
    (non-negative by construction), and the exact interpolated
    percentile over integer seconds evaluates identically in Spark's
    percentile() and DuckDB's quantile_cont (the agg_percentile
    contract).

    Scale (100 TB): ONE user-keyed exchange feeds three chained
    window passes (each anchor is a conditional MIN over the same
    partitioning — no self-joins, no per-user arrays) and the
    same-key groupBy that follows reuses the partitioning; the
    percentile runs over the two-arm latency table, which is one row
    per converting user."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id")
    s = (
        # only the three funnel types can set an anchor or read one —
        # the IN filter pushes to the parquet scan and shrinks the
        # window-buffered rows ~40% with provably identical output
        # (the oracle's MIN CASE arms ignore other types the same way)
        t.events.filter(
            F.col("event_type").isin("view", "click", "purchase")
        )
        .select("user_id", "event_type", "ts")
        .withColumn(
            "tv",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "tc",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("tv")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "tp",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("tc")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    g = s.groupBy("user_id").agg(
        F.max("tv").alias("tv"),
        F.max("tc").alias("tc"),
        F.max("tp").alias("tp"),
    )

    def lat(a, b):
        return F.expr(
            f"(unix_micros(cast({b} as timestamp))"
            f" - unix_micros(cast({a} as timestamp))) div 1000000"
        )

    arms = [
        g.filter(F.col("tc").isNotNull()).select(
            F.lit("view>click").alias("step"), lat("tv", "tc").alias("lat_s")
        ),
        g.filter(F.col("tp").isNotNull()).select(
            F.lit("click>purchase").alias("step"),
            lat("tc", "tp").alias("lat_s"),
        ),
    ]
    return (
        arms[0]
        .unionAll(arms[1])
        .groupBy("step")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_converted"),
            F.round(F.percentile("lat_s", F.lit(0.5)), 6).alias("median_s"),
            F.round(F.percentile("lat_s", F.lit(0.9)), 6).alias("p90_s"),
        )
    )
