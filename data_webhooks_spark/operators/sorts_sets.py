"""Sorts / limits / top-k / set operations (SURVEY.md §2.6).

Determinism rule: every LIMIT is preceded by an ORDER BY whose key set
is unique per row (a unique id as final tiebreak), so the selected row
SET is well-defined even though the driver's hash ignores order.

Scale notes: global sort+limit compiles to TakeOrderedAndProject —
each task keeps a k-row heap and only k·partitions rows reach the
driver, no full sort shuffle. Set ops are hash-based distinct/except
with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import Tables
from ..regutil import registrar

QUERIES: dict = {}
ORACLE: dict = {}
op = registrar(QUERIES, ORACLE)


@op(
    "sort_multi",
    sql="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def sort_multi(spark, sf_dir):
    """Multi-key global sort with explicit asc/desc and nulls-first/last on every key."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(
            F.col("o_orderstatus").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


@op(
    "limit",
    sql="SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey LIMIT 50",
)
def limit(spark, sf_dir):
    """LIMIT after a fully-determined sort (deterministic first-N)."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.select("o_orderkey", "o_custkey").orderBy("o_orderkey").limit(50)
    )


@op(
    "topk",
    sql="""
    SELECT event_id, user_id, value
    FROM events
    ORDER BY value DESC, event_id ASC
    LIMIT 100
    """,
)
def topk(spark, sf_dir):
    """Global top-k -> TakeOrderedAndProject (per-partition heaps, no
    full shuffle)."""
    t = Tables(spark, sf_dir)
    return (
        t.events.select("event_id", "user_id", "value")
        .orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(100)
    )


@op(
    "set_union_all",
    sql="""
    SELECT nkey, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nkey FROM supplier
    ) GROUP BY nkey
    """,
)
def set_union_all(spark, sf_dir):
    """Bag union by column name (UNION ALL)."""
    t = Tables(spark, sf_dir)
    u = t.customer.select(F.col("c_nationkey").alias("nkey")).unionByName(
        t.supplier.select(F.col("s_nationkey").alias("nkey"))
    )
    return u.groupBy("nkey").agg(F.count(F.lit(1)).alias("n"))


@op(
    "set_union_distinct",
    sql="""
    SELECT c_nationkey AS nkey FROM customer
    UNION
    SELECT s_nationkey AS nkey FROM supplier
    """,
)
def set_union_distinct(spark, sf_dir):
    """Set union with duplicate elimination."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.select(F.col("c_nationkey").alias("nkey"))
        .unionByName(t.supplier.select(F.col("s_nationkey").alias("nkey")))
        .distinct()
    )


@op(
    "set_intersect",
    sql="""
    SELECT c_nationkey AS nkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nkey FROM supplier
    """,
)
def set_intersect(spark, sf_dir):
    """Set intersection (INTERSECT DISTINCT)."""
    t = Tables(spark, sf_dir)
    return t.customer.select(F.col("c_nationkey").alias("nkey")).intersect(
        t.supplier.select(F.col("s_nationkey").alias("nkey"))
    )


@op(
    "set_except",
    sql="""
    SELECT DISTINCT o_custkey AS ckey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT DISTINCT o_custkey AS ckey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_except(spark, sf_dir):
    """Set difference (EXCEPT DISTINCT): customers with finished
    orders but no open ones. (The r4 audit found the former
    customer-minus-supplier nation form returned 0 rows at every
    scale factor — a vacuously-passing oracle; these operands have a
    non-empty difference at sf0.01 and sf0.1.)"""
    t = Tables(spark, sf_dir)
    o = t.orders
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("ckey"))
        .subtract(
            o.filter(F.col("o_orderstatus") == "O").select(
                F.col("o_custkey").alias("ckey")
            )
        )
    )


@op(
    "set_intersect_all",
    sql="""
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect_all(spark, sf_dir):
    """Bag intersection (INTERSECT ALL)."""
    t = Tables(spark, sf_dir)
    f = t.orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    o = t.orders.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    return f.intersectAll(o)


@op(
    "set_except_all",
    sql="""
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_except_all(spark, sf_dir):
    """Bag difference (EXCEPT ALL) — multiplicity-aware."""
    t = Tables(spark, sf_dir)
    f = t.orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    p = t.orders.filter(F.col("o_orderstatus") == "P").select("o_orderpriority")
    return f.exceptAll(p)
