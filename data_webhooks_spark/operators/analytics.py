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
