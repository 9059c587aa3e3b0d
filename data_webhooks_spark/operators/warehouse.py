"""Warehouse-maintenance operators: CDC merge and slowly-changing
dimensions (SURVEY §2.16).

A webhook platform's dimension tables (customers, accounts) change
over time; the two canonical maintenance shapes are SCD1 (merge/upsert
— keep latest) and SCD2 (validity intervals — keep history). Both are
expressed as declarative plans over deterministic snapshot derivations
of the ``customer`` fixture, so DuckDB can verify them end-to-end.

Scale notes (100 TB):
- ``merge_upsert`` is one full-outer equi-join on the dimension key —
  the exact shuffle MERGE INTO performs in any lakehouse engine; with
  both sides bucketed by key it is shuffle-free. No driver-side
  anything.
- ``dim_scd2`` is a union of snapshots + two windows over the
  dimension key — per-key state is the snapshot count (bounded), and
  the window partitions by the high-cardinality key, so parallelism
  scales with keys, not snapshots.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import Tables
from ..regutil import registrar

QUERIES: dict = {}
ORACLE: dict = {}
op = registrar(QUERIES, ORACLE)

# Deterministic snapshot derivation (same arithmetic in both engines):
#   v2: customers with key%7==0 move to segment SEG_B;
#       key%11==0 gain +100.00 balance
#   v3: key%13==0 move to SEG_C (on top of v2's segment);
#       key%7==0 gain a further +250.00 balance
_SEG2 = "CASE WHEN c_custkey % 7 = 0 THEN 'SEG_B' ELSE c_mktsegment END"
_BAL2 = "c_acctbal + (CASE WHEN c_custkey % 11 = 0 THEN 100.0 ELSE 0.0 END)"
_SEG3 = f"CASE WHEN c_custkey % 13 = 0 THEN 'SEG_C' ELSE ({_SEG2}) END"
_BAL3 = f"({_BAL2}) + (CASE WHEN c_custkey % 7 = 0 THEN 250.0 ELSE 0.0 END)"


def _snapshots(t):
    """customer at versions 1..3 as (c_custkey, version, segment, bal).

    ONE dimension scan: the three versions explode from an inline
    struct array per row (a union of three selects would scan the
    table three times — at a 100 TB dimension that is the whole cost)."""
    c = t.customer
    versions = F.array(
        F.struct(
            F.lit(1).alias("version"),
            F.col("c_mktsegment").alias("segment"),
            F.col("c_acctbal").alias("bal"),
        ),
        F.struct(
            F.lit(2).alias("version"),
            F.expr(_SEG2).alias("segment"),
            F.expr(_BAL2).alias("bal"),
        ),
        F.struct(
            F.lit(3).alias("version"),
            F.expr(_SEG3).alias("segment"),
            F.expr(_BAL3).alias("bal"),
        ),
    )
    return c.select("c_custkey", F.explode(versions).alias("v")).select(
        "c_custkey", "v.version", "v.segment", "v.bal"
    )


_SNAPSHOTS_SQL = f"""
    snaps AS (
        SELECT c_custkey, 1 AS version, c_mktsegment AS segment,
               c_acctbal AS bal FROM customer
        UNION ALL
        SELECT c_custkey, 2, {_SEG2}, {_BAL2} FROM customer
        UNION ALL
        SELECT c_custkey, 3, {_SEG3}, {_BAL3} FROM customer
    )
"""


@op(
    "merge_upsert",
    sql=f"""
    WITH {_SNAPSHOTS_SQL},
    src AS (
        SELECT c_custkey, segment, bal FROM snaps WHERE version = 2
        AND (c_custkey % 7 = 0 OR c_custkey % 11 = 0)
    )
    SELECT t.c_custkey,
           COALESCE(s.segment, t.c_mktsegment) AS segment,
           ROUND(COALESCE(s.bal, t.c_acctbal), 2) AS bal,
           s.c_custkey IS NOT NULL AS was_updated
    FROM customer t LEFT JOIN src s ON t.c_custkey = s.c_custkey
    UNION ALL
    SELECT c_custkey + 1000000, segment, ROUND(bal, 2), TRUE
    FROM src WHERE c_custkey % 11 = 0
    """,
)
def merge_upsert(spark, sf_dir):
    """MERGE INTO (SCD1) semantics without a lakehouse format: apply a
    CDC changeset to the customer dimension — matched keys take the
    source's segment/balance, unmatched targets pass through, and
    source-only rows (here: key-shifted clones standing in for new
    customers) are inserted.

    Plan: one left equi-join target<-changeset (update arm; AQE
    broadcasts the small changeset) + a union of the insert arm —
    exactly the shuffle shape a lakehouse MERGE plans. was_updated
    makes the three arms visible to the oracle."""
    t = Tables(spark, sf_dir)
    # the v2 changeset derived directly (pushed filter, one scan) —
    # going through _snapshots would explode all 3 versions first
    src = (
        t.customer.filter(
            (F.col("c_custkey") % 7 == 0) | (F.col("c_custkey") % 11 == 0)
        )
        .select(
            "c_custkey",
            F.expr(_SEG2).alias("segment"),
            F.expr(_BAL2).alias("bal"),
        )
    )
    tgt = t.customer
    updated = tgt.join(
        src.withColumnRenamed("c_custkey", "s_key"),
        tgt.c_custkey == F.col("s_key"),
        "left",
    ).select(
        "c_custkey",
        F.coalesce("segment", "c_mktsegment").alias("segment"),
        F.round(F.coalesce("bal", "c_acctbal"), 2).alias("bal"),
        F.col("s_key").isNotNull().alias("was_updated"),
    )
    inserts = src.filter(F.col("c_custkey") % 11 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        "segment",
        F.round("bal", 2).alias("bal"),
        F.lit(True).alias("was_updated"),
    )
    return updated.unionByName(inserts)


@op(
    "dim_scd2",
    sql=f"""
    WITH {_SNAPSHOTS_SQL},
    marked AS (
        SELECT *,
               lag(segment) OVER w AS p_seg,
               lag(bal) OVER w AS p_bal
        FROM snaps
        WINDOW w AS (PARTITION BY c_custkey ORDER BY version)
    ),
    kept AS (
        SELECT c_custkey, version, segment, bal FROM marked
        WHERE p_seg IS NULL OR segment <> p_seg OR bal <> p_bal
    )
    SELECT c_custkey, segment, ROUND(bal, 2) AS bal,
           version AS valid_from,
           lead(version) OVER
               (PARTITION BY c_custkey ORDER BY version) AS valid_to,
           lead(version) OVER
               (PARTITION BY c_custkey ORDER BY version) IS NULL AS is_current
    FROM kept
    """,
)
def dim_scd2(spark, sf_dir):
    """SCD Type-2 history build: collapse a sequence of dimension
    snapshots into validity intervals — one row per (key, attribute
    state), valid from the version that introduced it until the
    version that changed it (NULL = current).

    Plan: union the snapshots, drop no-change rows via a lag window
    over (key, version), then assign interval ends with a lead window
    over the survivors. Both windows partition by the dimension key,
    so parallelism scales with key cardinality and per-key state is
    the (bounded) snapshot count."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("c_custkey").orderBy("version")
    marked = _snapshots(t).select(
        "*",
        F.lag("segment").over(w).alias("p_seg"),
        F.lag("bal").over(w).alias("p_bal"),
    )
    kept = marked.filter(
        F.col("p_seg").isNull()
        | (F.col("segment") != F.col("p_seg"))
        | (F.col("bal") != F.col("p_bal"))
    )
    return kept.select(
        "c_custkey",
        "segment",
        F.round("bal", 2).alias("bal"),
        F.col("version").alias("valid_from"),
        F.lead("version").over(w).alias("valid_to"),
        F.lead("version").over(w).isNull().alias("is_current"),
    )


@op(
    "warehouse_snapshot_diff",
    sql=f"""
    WITH v2 AS (
        SELECT c_custkey AS k, {_SEG2} AS segment, ROUND({_BAL2}, 2) AS bal
        FROM customer
    ),
    v3 AS (
        SELECT c_custkey AS k, {_SEG3} AS segment, ROUND({_BAL3}, 2) AS bal
        FROM customer WHERE c_custkey % 17 <> 0
        UNION ALL
        SELECT c_custkey + 1000000, {_SEG3}, ROUND({_BAL3}, 2)
        FROM customer WHERE c_custkey % 11 = 0
    )
    SELECT COALESCE(a.k, b.k) AS c_custkey,
           CASE WHEN b.k IS NULL THEN 'D'
                WHEN a.k IS NULL THEN 'I'
                WHEN a.segment <> b.segment OR a.bal <> b.bal THEN 'U'
                ELSE 'N' END AS change,
           a.segment AS seg_before, b.segment AS seg_after,
           a.bal AS bal_before, b.bal AS bal_after,
           COALESCE(a.segment <> b.segment, FALSE) AS seg_changed,
           COALESCE(a.bal <> b.bal, FALSE) AS bal_changed
    FROM v2 a FULL OUTER JOIN v3 b ON a.k = b.k
    """,
)
def warehouse_snapshot_diff(spark, sf_dir):
    """CDC snapshot diff: compare two dimension snapshots (the v2/v3
    derivations `merge_upsert`/`dim_scd2` already pin, plus synthetic
    deletes key%17==0 and the same key%11 late-arriving inserts) and
    emit one row per key with change type I/U/D/N, before/after
    values, and per-column changed flags — the change feed a
    snapshot-based warehouse derives when the source system ships no
    CDC log (the Delta/Iceberg MERGE "source minus target" step, and
    the input `dim_scd2` would consume incrementally).

    Determinism: balances compare after the shared ROUND(,2); change
    classification is pure column equality — no floats beyond the
    already-rounded money values.

    Scale: BOTH snapshots here derive from one customer scan (the
    struct-array explode trick), and the diff itself is expressed as a
    single groupBy(key) over the exploded (version, row) stream — a
    map-combinable aggregation, NOT a join, which is the cheapest diff
    shape when both snapshots live in the same storage layout. With
    independently-stored snapshots the same plan becomes a sort-merge
    full-outer equi-join on the key — partitionable and
    AQE-skew-splittable either way; nothing is driver-side."""
    t = Tables(spark, sf_dir)
    c = t.customer
    rows = F.array(
        # version-2 presence row (every key)
        F.struct(
            F.col("c_custkey").cast("long").alias("k"),
            F.lit(2).alias("version"),
            F.expr(_SEG2).alias("segment"),
            F.round(F.expr(_BAL2), 2).alias("bal"),
        ),
        # version-3 row unless deleted
        F.when(
            F.col("c_custkey") % 17 != 0,
            F.struct(
                F.col("c_custkey").cast("long").alias("k"),
                F.lit(3).alias("version"),
                F.expr(_SEG3).alias("segment"),
                F.round(F.expr(_BAL3), 2).alias("bal"),
            ),
        ),
        # version-3 insert twin for key%11
        F.when(
            F.col("c_custkey") % 11 == 0,
            F.struct(
                (F.col("c_custkey") + 1000000).cast("long").alias("k"),
                F.lit(3).alias("version"),
                F.expr(_SEG3).alias("segment"),
                F.round(F.expr(_BAL3), 2).alias("bal"),
            ),
        ),
    )
    exploded = (
        c.select(F.explode(rows).alias("r"))
        .filter(F.col("r").isNotNull())
        .select("r.k", "r.version", "r.segment", "r.bal")
    )
    agg = exploded.groupBy("k").agg(
        F.max(F.when(F.col("version") == 2, F.struct("segment", "bal"))).alias("a"),
        F.max(F.when(F.col("version") == 3, F.struct("segment", "bal"))).alias("b"),
    )
    changed = (F.col("a.segment") != F.col("b.segment")) | (
        F.col("a.bal") != F.col("b.bal")
    )
    return agg.select(
        F.col("k").alias("c_custkey"),
        F.when(F.col("b").isNull(), "D")
        .when(F.col("a").isNull(), "I")
        .when(changed, "U")
        .otherwise("N")
        .alias("change"),
        F.col("a.segment").alias("seg_before"),
        F.col("b.segment").alias("seg_after"),
        F.col("a.bal").alias("bal_before"),
        F.col("b.bal").alias("bal_after"),
        F.coalesce(
            F.col("a.segment") != F.col("b.segment"), F.lit(False)
        ).alias("seg_changed"),
        F.coalesce(F.col("a.bal") != F.col("b.bal"), F.lit(False)).alias(
            "bal_changed"
        ),
    )


@op(
    "cdc_apply_log",
    sql="""
    WITH ops AS (
        SELECT user_id, ts, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    st AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_ops,
               CAST(COUNT(*) FILTER (WHERE event_type = 'error')
                    AS BIGINT) AS n_deletes,
               COALESCE(MAX(rn) FILTER (WHERE event_type = 'error'),
                        0) AS rn_del,
               COALESCE(MAX(rn) FILTER (WHERE event_type <> 'error'),
                        0) AS rn_upd,
               (MAX(CASE WHEN event_type <> 'error'
                         THEN {'rn': rn, 'value': value} END)
               ).value AS upd_value,
               MAX(ts) AS last_ts
        FROM ops GROUP BY user_id
    )
    SELECT user_id, n_ops, n_deletes,
           rn_upd > rn_del AS alive,
           CASE WHEN rn_upd > rn_del THEN upd_value END AS final_value,
           last_ts
    FROM st
    """,
)
def cdc_apply_log(spark, sf_dir):
    """Ordered change-log apply (the consumer half of CDC, pairing
    `merge_upsert`'s one-shot MERGE): the events stream is read as a
    per-user op log — `error` rows are tombstones (DELETE), every
    other type upserts its `value` (the lenient Debezium-style replay
    where UPDATE of a missing row inserts). Replaying in (ts,
    event_id) order, the final state per user is: alive iff some
    upsert follows the last tombstone, and the surviving value is the
    LAST upsert's — both derivable from the log without materializing
    intermediate states, which is what makes the replay one aggregate
    instead of a sequential fold.

    Determinism: op order is a row_number over the unique (ts,
    event_id) pair; the surviving value is the .value of a struct
    MAX over (rn, value) on BOTH engines — an exact pick that stays
    NULL-faithful (a last upsert carrying NULL survives as NULL;
    max_by/arg_max diverge there: Spark's returns NULL but DuckDB's
    arg_max skips NULL arguments and resurrects an older value).

    Scale (100 TB): one shuffle on user_id for the window; the
    groupBy(user_id) that follows reuses the same hash partitioning,
    so the apply is a single-exchange plan. Per-user state is O(1) —
    log length never accumulates in memory, unlike a naive
    applyInPandas fold."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ops = t.events.select(
        "user_id",
        "ts",
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
    )
    st = ops.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ops"),
        F.count(F.when(F.col("event_type") == "error", 1))
        .cast("long")
        .alias("n_deletes"),
        F.coalesce(
            F.max(F.when(F.col("event_type") == "error", F.col("rn"))),
            F.lit(0),
        ).alias("rn_del"),
        F.coalesce(
            F.max(F.when(F.col("event_type") != "error", F.col("rn"))),
            F.lit(0),
        ).alias("rn_upd"),
        F.max(
            F.when(
                F.col("event_type") != "error",
                F.struct(F.col("rn"), F.col("value")),
            )
        )["value"].alias("upd_value"),
        F.max("ts").alias("last_ts"),
    )
    alive = F.col("rn_upd") > F.col("rn_del")
    return st.select(
        "user_id",
        "n_ops",
        "n_deletes",
        alive.alias("alive"),
        F.when(alive, F.col("upd_value")).alias("final_value"),
        "last_ts",
    )
