"""Join operators (SURVEY.md §2.3).

Strategy notes (100 TB):
- Dimension sides (region/nation/supplier/customer-at-small-SF) are
  explicitly ``F.broadcast()`` — no shuffle of the fact table.
- Fact-fact joins (lineitem⋈orders) shuffle on the join key; AQE
  handles skew splitting at runtime.
- The as-of join is the union+ordered-window formulation: O(n log n)
  with a single shuffle by key, instead of the O(n·m) conditional-join
  blowup — this is the pattern that survives 100 TB.
- The theta/band join band-buckets both sides into an equi hash join
  with the range predicate as residual (join_theta_range); interval
  joins pre-join on the natural equi key (join_interval) — no
  nested-loop anywhere (plan-tested).
- Skew: AQE skew-split covers the common case (test_plans /
  test_quality prove it fires); join_skew_salted is the deterministic
  manual fallback.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import Tables
from ..norms import MONEY_SCALE, _scaled_units, dec_sum, o_dec_sum
from ..regutil import registrar

QUERIES: dict = {}
ORACLE: dict = {}
op = registrar(QUERIES, ORACLE)


@op(
    "join_inner_equi",
    sql="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def join_inner_equi(spark, sf_dir):
    """Inner equi-join; Catalyst picks broadcast vs shuffle strategy by size estimate."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.filter(F.col("o_orderstatus") == "F")
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
    )


@op(
    "join_left_outer",
    sql="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'P'
    """,
)
def join_left_outer(spark, sf_dir):
    """Left outer equi-join with null-extended right side."""
    t = Tables(spark, sf_dir)
    o = t.orders.filter(F.col("o_orderstatus") == "P")
    return t.customer.join(
        o, F.col("c_custkey") == F.col("o_custkey"), "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@op(
    "join_right_outer",
    sql="""
    SELECT o.o_orderkey, c.c_custkey, c.c_name
    FROM (SELECT * FROM orders WHERE o_totalprice > 400000) o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_right_outer(spark, sf_dir):
    """Right outer equi-join."""
    t = Tables(spark, sf_dir)
    o = t.orders.filter(F.col("o_totalprice") > 400000)
    return o.join(
        t.customer, F.col("o_custkey") == F.col("c_custkey"), "right"
    ).select("o_orderkey", "c_custkey", "c_name")


@op(
    "join_full_outer",
    sql="""
    SELECT e.user_id, e.n_events, c.c_custkey, c.c_name
    FROM (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id) e
    FULL JOIN (SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 300) c
      ON e.user_id = c.c_custkey
    """,
)
def join_full_outer(spark, sf_dir):
    """Full outer equi-join preserving both unmatched sides."""
    t = Tables(spark, sf_dir)
    e = t.events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    c = t.customer.filter(F.col("c_custkey") <= 300).select("c_custkey", "c_name")
    return e.join(c, F.col("user_id") == F.col("c_custkey"), "full").select(
        "user_id", "n_events", "c_custkey", "c_name"
    )


@op(
    "join_left_semi",
    sql="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def join_left_semi(spark, sf_dir):
    """Left semi join: existence filter (EXISTS) that emits the left side once."""
    t = Tables(spark, sf_dir)
    o = t.orders.filter(F.col("o_orderstatus") == "P")
    return t.customer.join(
        o, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@op(
    "join_left_anti",
    sql="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1998-01-01')
    """,
)
def join_left_anti(spark, sf_dir):
    """Left anti join: customers with NO order since 1998 (NOT EXISTS),
    never materializing the match side. (The r4 audit found the
    unfiltered customer-without-any-order form returned 0 rows at
    every fixture scale factor — a vacuously-passing oracle; the date
    filter makes the difference non-empty at sf0.01 and sf0.1.)"""
    t = Tables(spark, sf_dir)
    recent = t.orders.filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz")
    )
    return t.customer.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@op(
    "join_cross",
    sql="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
)
def join_cross(spark, sf_dir):
    """Cartesian product of two SMALL sides (region x nation) — crossJoin is gated by size by design."""
    t = Tables(spark, sf_dir)
    return t.region.crossJoin(t.nation).select("r_name", "n_name")


@op(
    "join_theta_range",
    sql="""
    SELECT s.s_suppkey, COUNT(c.c_custkey) AS n_band_customers
    FROM supplier s LEFT JOIN customer c
      ON c.c_acctbal BETWEEN s.s_acctbal - 10 AND s.s_acctbal + 10
    GROUP BY s.s_suppkey
    """,
)
def join_theta_range(spark, sf_dir):
    """Non-equi band join rewritten as a banded bucket EQUI-join.

    A naive BroadcastNestedLoopJoin evaluates |s| x |c| predicates —
    O(n*m) dies long before 100 TB. Instead: quantize ``acctbal`` into
    width-20 buckets (>= the band width, so a band spans at most two
    buckets). Each customer lands in exactly one bucket; each supplier
    explodes to the <=2 buckets its band overlaps. The join becomes a
    plain hash equi-join on the bucket key with the exact BETWEEN as a
    residual filter — cost scales with true collisions, shuffles
    partition by bucket, and no customer can double-match because its
    bucket is unique. Left semantics survive the explode: both supplier
    bucket-rows group back to one s_suppkey and count(c_custkey)
    ignores the null-match rows."""
    t = Tables(spark, sf_dir)
    width = 20
    s = t.supplier.select(
        "s_suppkey",
        "s_acctbal",
        # explode_outer: a NULL s_acctbal yields a NULL band sequence; plain
        # explode would DROP that supplier row, but the oracle's LEFT JOIN
        # keeps it with count 0. outer keeps a (bucket=NULL) row that can't
        # equi-match, so the group-by still emits the supplier.
        F.explode_outer(
            F.sequence(
                F.floor((F.col("s_acctbal") - 10) / width),
                F.floor((F.col("s_acctbal") + 10) / width),
            )
        ).alias("bucket"),
    )
    c = t.customer.select(
        "c_custkey", "c_acctbal", F.floor(F.col("c_acctbal") / width).alias("bucket")
    )
    cond = (F.col("s.bucket") == F.col("c.bucket")) & F.col("c_acctbal").between(
        F.col("s_acctbal") - 10, F.col("s_acctbal") + 10
    )
    return (
        s.alias("s")
        .join(c.alias("c"), cond, "left")
        .groupBy("s_suppkey")
        .agg(F.count(F.col("c_custkey")).alias("n_band_customers"))
    )


@op(
    "join_interval",
    sql=f"""
    SELECT o.o_orderstatus,
           COUNT(*) AS n_shipped_30d,
           {o_dec_sum('l.l_extendedprice', 'sum_price')}
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate
      AND l.l_shipdate < date_add(o.o_orderdate, INTERVAL 30 DAY)
    GROUP BY o.o_orderstatus
    """,
)
def join_interval(spark, sf_dir):
    """Point-in-interval join as equi-join + range residual — the
    scalable shape (shuffle on the equi key, residual filtered in the
    join, no cartesian)."""
    t = Tables(spark, sf_dir)
    j = t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
    j = j.filter(
        (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    )
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_shipped_30d"),
        dec_sum("l_extendedprice", "sum_price"),
    )


def _click_struct_type(ev):
    """Schema of the atomic click-lookup struct both as-of joins carry
    (ts type mirrors the events table's materialized timestamp type)."""
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("c_ts", ev.schema["ts"].dataType),
            T.StructField("c_value", T.DoubleType()),
            T.StructField("c_id", T.LongType()),
        ]
    )


@op(
    "join_asof",
    sql="""
    WITH ranked AS (
        SELECT p.event_id, p.user_id, p.ts AS p_ts,
               c.ts AS c_ts, c.value AS c_value,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_id
                   ORDER BY c.ts DESC, c.event_id DESC
               ) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND c.ts <= p.ts
    )
    SELECT event_id, user_id, p_ts,
           c_ts AS click_ts, c_value AS click_value
    FROM ranked WHERE rn = 1
    """,
)
def join_asof(spark, sf_dir):
    """As-of join: for each purchase, the latest click at-or-before it
    per user. Spark has no native as-of, so: union both sides tagged,
    one window pass per key ordered by (t, side, click id),
    last(ignorenulls) carries the most recent click forward. One
    shuffle, O(n log n) — survives 100 TB, unlike a conditional-join +
    max reduction.

    Tie semantics are pinned explicitly (mirroring the forward twin,
    r5): among multiple clicks at the same (user_id, ts), BOTH sides
    pick the LARGEST click event_id — Spark because the click id is
    appended ascending to the window ordering and last() takes the
    final row, the oracle by a rank-1-per-purchase window ordered
    (c.ts DESC, c.event_id DESC) instead of DuckDB's arbitrary-tie
    ASOF.
    """
    t = Tables(spark, sf_dir)
    ev = t.events
    # The click's (ts, value, id) travel as ONE nullable struct so a
    # single last(ignorenulls) picks them atomically: two independent
    # ignorenulls lookups would splice ts and value from DIFFERENT
    # clicks whenever a click carries a NULL value (the lookup for
    # value skips it, the lookup for ts doesn't).
    cs = _click_struct_type(ev)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("side"),  # clicks sort before purchases at equal t (>= is inclusive)
        F.struct(
            F.col("ts").alias("c_ts"),
            F.col("value").alias("c_value"),
            F.col("event_id").alias("c_id"),
        ).alias("c"),
        F.lit(None).cast("long").alias("event_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("side"),
        F.lit(None).cast(cs).alias("c"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "side", F.asc_nulls_first("c.c_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("cc", F.last("c", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("t").alias("p_ts"),
            F.col("cc.c_ts").alias("click_ts"),
            F.col("cc.c_value").alias("click_value"),
        )
    )


@op(
    "join_asof_forward",
    sql="""
    WITH ranked AS (
        SELECT p.event_id, p.user_id, p.ts AS p_ts,
               c.ts AS c_ts, c.value AS c_value,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_id ORDER BY c.ts, c.event_id
               ) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND c.ts >= p.ts
    )
    SELECT event_id, user_id, p_ts,
           c_ts AS next_click_ts, c_value AS next_click_value
    FROM ranked WHERE rn = 1
    """,
)
def join_asof_forward(spark, sf_dir):
    """Forward as-of join — the mirror of join_asof: for each
    purchase, the EARLIEST click at-or-after it per user (the
    "next-action" lookup behind follow-up attribution). Same
    union+window rewrite with the lookup direction flipped — a
    running last(ignorenulls) over the REVERSED (t, side, id) order,
    which selects the identical row as first(ignorenulls) over
    [currentRow, unboundedFollowing] but in O(1) running state per
    row instead of Spark's per-row recomputation of following frames
    (quadratic in per-user history — the r9 sweep-H lesson; measured
    on one synthetic 1-user history: following-frame form 4.7 / 6.9 /
    26.6 s at 10k / 20k / 40k rows and unfinished at 200k after
    10 min, reversed running form ~0.3 s flat at every size,
    identical outputs). At equal
    timestamps the purchase sorts before the click so the inclusive
    at-or-after semantics match the oracle's c.ts >= p.ts.

    Tie semantics are pinned explicitly: among multiple clicks at the
    same (user_id, ts), BOTH sides pick the smallest click event_id —
    Spark by carrying the click's id inside the lookup struct and
    appending it to the window ordering, the oracle by a rank-1-per-
    purchase window ordered (c.ts, c.event_id) instead of DuckDB's
    arbitrary-tie ASOF. (The backward join_asof pins the mirrored
    largest-id tie the same way.) The click's (ts, value, id) travel
    as ONE nullable struct through a single first(ignorenulls) so the
    pair is atomic even when a click's value is NULL.
    One shuffle, O(n log n), like its backward twin."""
    t = Tables(spark, sf_dir)
    ev = t.events
    cs = _click_struct_type(ev)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("side"),  # purchases sort before clicks at equal t (<= inclusive)
        F.lit(None).cast(cs).alias("c"),
        "event_id",
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("side"),
        F.struct(
            F.col("ts").alias("c_ts"),
            F.col("value").alias("c_value"),
            F.col("event_id").alias("c_id"),
        ).alias("c"),
        F.lit(None).cast("long").alias("event_id"),
    )
    # running last-ignorenulls over the REVERSED order, not
    # first-ignorenulls over [currentRow, unboundedFollowing]: Spark
    # recomputes unbounded-FOLLOWING frames from scratch per row
    # (quadratic in per-user history; the r9 ts_interpolate_linear
    # lesson, >35 min vs seconds on a 596k-row frame), while the
    # UNBOUNDED PRECEDING running frame keeps O(1) state. Selected
    # row is identical: last non-null scanning backward from the far
    # end to the current row == first non-null at-or-after it.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("t"), F.desc("side"), F.desc_nulls_last("c.c_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        purchases.unionByName(clicks)
        .withColumn("cc", F.last("c", ignorenulls=True).over(w))
        .filter(F.col("side") == 0)
        .select(
            "event_id",
            "user_id",
            F.col("t").alias("p_ts"),
            F.col("cc.c_ts").alias("next_click_ts"),
            F.col("cc.c_value").alias("next_click_value"),
        )
    )


@op(
    "join_self",
    sql="""
    SELECT o1.o_custkey, COUNT(*) AS n_order_pairs
    FROM orders o1 JOIN orders o2
      ON o1.o_custkey = o2.o_custkey AND o1.o_orderdate < o2.o_orderdate
    GROUP BY o1.o_custkey
    """,
)
def join_self(spark, sf_dir):
    """Self-join under two aliases (pairing rows of one table with itself on a key)."""
    t = Tables(spark, sf_dir)
    o1 = t.orders.alias("o1")
    o2 = t.orders.alias("o2")
    return (
        o1.join(
            o2,
            (F.col("o1.o_custkey") == F.col("o2.o_custkey"))
            & (F.col("o1.o_orderdate") < F.col("o2.o_orderdate")),
        )
        .groupBy(F.col("o1.o_custkey").alias("o_custkey"))
        .agg(F.count(F.lit(1)).alias("n_order_pairs"))
    )


ORDERS_BCAST_MAX_ROWS = 2_000_000  # ~24 B/row UnsafeRow → well under 64 MB


def region_first_star(t, date_lo, date_hi, region: str = "ASIA"):
    """Shared region-first star-join construction (used by
    `join_multiway` here and `tpch_q5` in tpch.py): BOTH fact sides
    shrink BEFORE the fact-fact shuffle. Every surviving row must have
    its supplier (and, transitively via c_nationkey = s_nationkey, its
    customer) in a nation of `region`, so the restriction is pushed
    into the broadcast dims and applied to lineitem (via l_suppkey)
    and orders (via o_custkey) up front — ~1/|regions| of each fact
    shuffles instead of the whole table. Catalyst cannot derive this
    reorder without CBO stats (the semi-filter crosses the fact-fact
    join), so the plan declares it. Returns the joined fact frame
    carrying (n_name, l_extendedprice, l_discount); the only shuffles
    left to the caller are the slimmed lineitem⋈orders and its final
    agg. Same-session A/B at ×100: 7.53 s → 4.56 s (BASELINE.md r5).

    r6 refinement — probe-then-broadcast for the fact-fact join:
    without catalog CBO stats the static planner overestimates the
    slimmed orders side and plans SMJ; AQE does convert it to a
    broadcast join at runtime, but only AFTER both map stages ran —
    i.e. the 631 MB slimmed-LINEITEM shuffle write is already paid
    before the conversion fires (measured at ×100). A date-windowed
    region-filtered orders side is exactly the statistic a CBO would
    estimate, so compute it for real: one cheap driver-side count of
    the slimmed orders (scan with both filters pushed + a broadcast
    semi-reduce — the small side by construction), and broadcast it
    only when the TRUE cardinality is bounded (< 2 M rows ≈ 48 MB of
    UnsafeRows). At 100 TB the same probe sees ~1.4 B rows and leaves
    the SMJ + AQE path untouched — the hint is evidence-gated, never
    a fixed guess. Measured ×100 same-session A/B: ~4.0 s → 3.0 s
    (probe cost ~0.3 s, saved fact shuffle ~1.3 s)."""
    reg_n = (
        t.nation.join(
            F.broadcast(t.region.filter(F.col("r_name") == region)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    sup = t.supplier.join(
        F.broadcast(reg_n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    cust = t.customer.join(
        F.broadcast(reg_n.select("n_nationkey")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "c_nationkey")
    o = (
        t.orders.filter(
            (F.col("o_orderdate") >= date_lo) & (F.col("o_orderdate") < date_hi)
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_nationkey")
    )
    li = t.lineitem.join(
        F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
    ).select("l_orderkey", "l_extendedprice", "l_discount", "s_nationkey", "n_name")
    if o.count() < ORDERS_BCAST_MAX_ROWS:
        o = F.broadcast(o)
    return li.join(
        o,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("s_nationkey") == F.col("c_nationkey")),
    )


@op(
    "join_multiway",
    sql=f"""
    SELECT n.n_name,
           {o_dec_sum('l.l_extendedprice * (1 - l.l_discount)', 'revenue', 4)},
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def join_multiway(spark, sf_dir):
    """TPC-H-Q5-shaped 6-table star join over a 2-year window, planned
    region-first (see `region_first_star` for the strategy and its
    measured ×100 win)."""
    t = Tables(spark, sf_dir)
    j = region_first_star(t, "1996-01-01", "1998-01-01")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.groupBy("n_name").agg(
        dec_sum(revenue, "revenue", 4),
        F.count(F.lit(1)).alias("n_items"),
    )


@op(
    "join_skew_salted",
    sql="""
    WITH dim AS (
        SELECT user_id, MIN(ts) AS first_seen
        FROM events GROUP BY user_id
    )
    SELECT e.event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN e.ts = d.first_seen THEN 1 ELSE 0 END) AS BIGINT)
               AS n_first_events
    FROM events e JOIN dim d ON e.user_id = d.user_id
    GROUP BY e.event_type
    """,
)
def join_skew_salted(spark, sf_dir):
    """Manually salted join for skewed keys — the fallback when AQE's
    skew split can't fire (e.g. the skewed side feeds a co-partitioned
    downstream op, or the dim side must broadcast-replicate).

    The fact side adds ``salt = pmod(xxhash64(event_id), 8)`` (a
    deterministic row hash, NOT rand(): replays/retries must salt
    identically); the dim side cross-joins the 8 salt values so every
    (user_id, salt) cell exists. The join key becomes (user_id, salt),
    splitting a hot user across 8 shuffle partitions for 8x dim
    duplication — the classic trade. Result provably equals the
    unsalted join (the oracle is the plain SQL join)."""
    S = 8
    t = Tables(spark, sf_dir)
    dim = t.events.groupBy("user_id").agg(F.min("ts").alias("first_seen"))
    salts = spark.range(S).select(F.col("id").cast("int").alias("salt"))
    dim_rep = dim.crossJoin(F.broadcast(salts))
    fact = t.events.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(S)).cast("int")
    )
    j = fact.join(dim_rep, ["user_id", "salt"])
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("ts") == F.col("first_seen"), 1).otherwise(0)
        ).cast("long").alias("n_first_events"),
    )


_LATERAL_SQL = """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
"""


@op("join_lateral", sql=_LATERAL_SQL)
def join_lateral(spark, sf_dir):
    """Correlated LATERAL join: for each customer, its top-2 orders by
    price — the per-row-subquery SQL surface (identical text runs on
    both engines; Spark decorrelates the correlated ORDER BY ... LIMIT
    into a ranked join under the hood, DuckDB executes it natively).

    The decorrelated plan Spark produces is exactly the
    `topn_per_group` shape: one join on the correlation key + a
    per-key rank filter — so the per-row subquery the SQL implies
    never executes row-at-a-time, and the whole thing shuffles once on
    the key at 100 TB. Ties break on o_orderkey for determinism."""
    t = Tables(spark, sf_dir)
    for name in ("customer", "orders"):
        getattr(t, name).createOrReplaceTempView(name)
    return spark.sql(_LATERAL_SQL)


@op(
    "join_asof_nearest",
    sql="""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts, value, event_id FROM events
        WHERE event_type = 'click'
    ),
    j AS (
        SELECT p.event_id, p.user_id, p.ts AS p_ts,
               c.ts AS c_ts, c.value AS c_value,
               row_number() OVER (
                   PARTITION BY p.event_id
                   ORDER BY abs(epoch_us(p.ts) - epoch_us(c.ts)),
                            c.ts, c.event_id DESC
               ) AS rn
        FROM p LEFT JOIN c ON c.user_id = p.user_id
    )
    SELECT event_id, user_id, p_ts,
           c_ts AS click_ts, c_value AS click_value,
           CASE WHEN c_ts IS NULL THEN NULL
                WHEN c_ts <= p_ts THEN 'backward'
                ELSE 'forward' END AS direction
    FROM j WHERE rn = 1
    """,
)
def join_asof_nearest(spark, sf_dir):
    """NEAREST-direction as-of join (pandas ``merge_asof
    direction='nearest'``), completing the family with `join_asof`
    (backward) and `join_asof_forward`: each purchase pairs with the
    click minimizing |Δts|, ties by earlier click then larger click
    id (exact-tie semantics pinned on both engines — the oracle's
    rank ordering (|Δus|, c.ts, c.event_id DESC) is the same total
    order the two windows realize).

    Implementation composes the two directional union-window tricks —
    NOT a per-purchase sort over all the user's clicks: one union,
    one user-keyed exchange, a backward last(ignorenulls) and a
    forward first(ignorenulls) frame (different sort orders reuse the
    exchange), then a codegen comparison of the two exact µs
    distances picks the winner. O(n log n) in the user's events
    versus the oracle's O(purchases × clicks) brute force; at 100 TB
    this is one shuffle like every other as-of key. The click triple
    rides in one nullable struct (the join_asof atomicity rule)."""
    t = Tables(spark, sf_dir)
    ev = t.events
    cs = _click_struct_type(ev)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("side"),
        F.struct(
            F.col("ts").alias("c_ts"),
            F.col("value").alias("c_value"),
            F.col("event_id").alias("c_id"),
        ).alias("c"),
        F.lit(None).cast("long").alias("event_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("side"),
        F.lit(None).cast(cs).alias("c"),
        "event_id",
    )
    u = clicks.unionByName(purchases)
    # backward: latest click at or before the purchase; equal-ts ties
    # resolve to the LARGEST click id (last row of the ascending-id
    # run) — the join_asof convention.
    w_b = (
        Window.partitionBy("user_id")
        .orderBy("t", "side", F.asc_nulls_first("c.c_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: earliest click strictly after (equal-ts clicks sort
    # before the purchase row, so the following frame excludes them);
    # id DESC makes the first row of an equal-ts run the largest id,
    # matching the backward tie convention. Evaluated as a running
    # last-ignorenulls over the fully REVERSED order instead of
    # first-ignorenulls over [currentRow, unboundedFollowing] — the
    # following frame is recomputed per row (quadratic in per-user
    # history; the r9 ts_interpolate_linear lesson), the reversed
    # running frame is O(1) state per row. Same selected row.
    w_f = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("t"), F.desc("side"), F.asc_nulls_first("c.c_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = (
        u.withColumn("cb", F.last("c", ignorenulls=True).over(w_b))
        .withColumn("cf", F.last("c", ignorenulls=True).over(w_f))
        .filter(F.col("side") == 1)
    )
    p_us = F.unix_micros(F.col("t").cast("timestamp"))
    b_diff = p_us - F.unix_micros(F.col("cb.c_ts").cast("timestamp"))
    f_diff = F.unix_micros(F.col("cf.c_ts").cast("timestamp")) - p_us
    take_b = F.col("cb").isNotNull() & (
        F.col("cf").isNull() | (b_diff <= f_diff)
    )
    chosen = F.when(take_b, F.col("cb")).otherwise(F.col("cf"))
    return picked.select(
        "event_id",
        "user_id",
        F.col("t").alias("p_ts"),
        chosen["c_ts"].alias("click_ts"),
        chosen["c_value"].alias("click_value"),
        F.when(chosen["c_ts"].isNull(), F.lit(None).cast("string"))
        .when(take_b, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )


_IB_BIN_S = 600  # bin width == interval length (10 min) -> <=2 bins/interval


@op(
    "join_interval_binned",
    sql=f"""
    SELECT e.event_id AS incident_id,
           COUNT(*) AS n_purchases,
           {o_dec_sum('p.value', 'sum_value')}
    FROM events e
    JOIN events p
      ON p.event_type = 'purchase'
     AND p.ts >= e.ts
     AND p.ts < e.ts + INTERVAL 10 MINUTE
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    """,
)
def join_interval_binned(spark, sf_dir):
    """Pure time-range join WITHOUT an equi key — each error event
    opens a 10-minute incident window; count/sum the purchases whose
    timestamp falls inside it ("revenue at risk per incident"). Unlike
    `join_interval` (which rides its orderkey equi-join), there is no
    shared key here, and the naive plan is a cartesian
    BroadcastNestedLoopJoin — quadratic death at any real scale.

    The scale shape is range-join BINNING (what Databricks' range-join
    optimization and KDB's window joins do under the hood) PLUS
    point-side PRE-AGGREGATION (the r7 density fix): the r6 ×100
    sweep showed that when both sides densify in a fixed span, the
    candidate-pair count — and the true-match count itself — grows
    quadratically (~900 M residual checks), and no bin width can
    shrink true matches. What CAN shrink is the unit of matching:
    purchases are first collapsed to one exact partial aggregate per
    WHOLE SECOND (count + BIGINT value units — the norms.py exact-sum
    discipline, so totals stay bit-identical), after which each
    incident can pair with at most ~1 200 second-rows regardless of
    corpus density. Exactness at the window edges is preserved by
    splitting the window [t0, t0+600 s) into (a) the 599 fully-covered
    interior seconds — every purchase in them is provably inside the
    window, joined via the 2-bin explode + equi-join + residual — and
    (b) the two boundary seconds s0 and s0+600, where raw purchases
    are equi-joined on their exact second key (2 seconds of data, a
    vanishing fraction at any density) and filtered by the exact
    timestamp predicate. Catalyst gets plain shuffled equi-joins —
    partitionable, AQE-skew-splittable, NO nested loop (pinned in the
    plan test). The oracle states the same join as a declarative
    range predicate, which DuckDB's IEJoin handles natively — both
    engines' scalable path, one semantics."""
    t = Tables(spark, sf_dir)
    ev = t.events
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("t0"),
        # unix_timestamp truncates to whole seconds (floor, positive
        # epochs) — the basis for the interior/boundary split
        F.unix_timestamp("ts").alias("s0"),
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("ts").alias("p_ts"),
        F.unix_timestamp("ts").alias("psec"),
        _scaled_units(F.col("value"), MONEY_SCALE).alias("units"),
    )
    # (a) interior seconds [s0+1, s0+599]: per-second partials, then
    # the 2-bin equi-join — fan-out bounded by seconds, not rows
    pur_sec = pur.groupBy("psec").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("units").cast("long").alias("units"),
    )
    intervals = err.select(
        "incident_id",
        "s0",
        F.explode(
            F.array(
                F.expr(f"s0 div {_IB_BIN_S}"),
                F.expr(f"s0 div {_IB_BIN_S}") + 1,
            )
        ).alias("bin"),
    )
    interior = (
        intervals.join(
            pur_sec.withColumn("bin", F.expr(f"psec div {_IB_BIN_S}")),
            "bin",
        )
        .filter(
            (F.col("psec") > F.col("s0"))
            & (F.col("psec") < F.col("s0") + _IB_BIN_S)
        )
        .select("incident_id", "n", "units")
    )
    # (b) boundary seconds {s0, s0+600}: raw rows, exact-second
    # equi-join + the exact timestamp predicate
    boundary = (
        err.select(
            "incident_id",
            "t0",
            F.explode(
                F.array(F.col("s0"), F.col("s0") + _IB_BIN_S)
            ).alias("psec"),
        )
        .join(pur, "psec")
        .filter(
            (F.col("p_ts") >= F.col("t0"))
            & (F.col("p_ts") < F.col("t0") + F.expr("INTERVAL 10 MINUTES"))
        )
        .select(
            "incident_id", F.lit(1).cast("long").alias("n"), "units"
        )
    )
    return (
        interior.unionByName(boundary)
        .groupBy("incident_id")
        .agg(
            F.sum("n").cast("long").alias("n_purchases"),
            (
                F.sum("units").cast("double") / F.lit(10**MONEY_SCALE)
            ).alias("sum_value"),
        )
    )


@op(
    "join_asof_tolerance",
    sql="""
    WITH ranked AS (
        SELECT p.event_id, p.user_id, p.ts AS p_ts,
               c.ts AS c_ts, c.value AS c_value,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_id
                   ORDER BY c.ts DESC, c.event_id DESC
               ) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND c.ts <= p.ts
    )
    SELECT event_id, user_id, p_ts,
           CASE WHEN c_ts >= p_ts - INTERVAL 1 HOUR THEN c_ts END
               AS click_ts,
           CASE WHEN c_ts >= p_ts - INTERVAL 1 HOUR THEN c_value END
               AS click_value,
           COALESCE(c_ts >= p_ts - INTERVAL 1 HOUR, FALSE) AS fresh
    FROM ranked WHERE rn = 1
    """,
)
def join_asof_tolerance(spark, sf_dir):
    """As-of join with a STALENESS BOUND — pandas `merge_asof`'s
    `tolerance` parameter: the latest click at-or-before each
    purchase, but only if it happened within the last hour; older
    matches are nulled (a stale context row is worse than none for
    attribution/feature pipelines). Completes the as-of family:
    backward (`join_asof`), forward, nearest, and now bounded.

    Same union + single-window machinery and pinned tie semantics as
    `join_asof` (one user-keyed shuffle, O(n log n)); the tolerance is
    a pure post-window CASE, so the scale shape is unchanged — the
    naive alternative (conditional join with the band in the ON
    clause) would re-introduce the per-purchase candidate scan the
    window form exists to avoid."""
    t = Tables(spark, sf_dir)
    ev = t.events
    cs = _click_struct_type(ev)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("side"),
        F.struct(
            F.col("ts").alias("c_ts"),
            F.col("value").alias("c_value"),
            F.col("event_id").alias("c_id"),
        ).alias("c"),
        F.lit(None).cast("long").alias("event_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("side"),
        F.lit(None).cast(cs).alias("c"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "side", F.asc_nulls_first("c.c_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fresh = F.col("cc.c_ts") >= F.col("t") - F.expr("INTERVAL 1 HOUR")
    return (
        clicks.unionByName(purchases)
        .withColumn("cc", F.last("c", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("t").alias("p_ts"),
            F.when(fresh, F.col("cc.c_ts")).alias("click_ts"),
            F.when(fresh, F.col("cc.c_value")).alias("click_value"),
            F.coalesce(fresh, F.lit(False)).alias("fresh"),
        )
    )
