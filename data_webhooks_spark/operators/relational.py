"""Projection / filter / predicate operators (SURVEY.md §2.2).

All of these stay entirely inside whole-stage codegen and push their
predicates into the parquet scan (PushedFilters) — at 100 TB the
filters here mean row-group skipping, not post-scan filtering.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import Tables
from ..regutil import registrar

QUERIES: dict = {}
ORACLE: dict = {}
op = registrar(QUERIES, ORACLE)


@op(
    "project",
    sql="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_quantity * 2.0 AS double_qty
    FROM lineitem
    """,
)
def project(spark, sf_dir):
    """Column subset + computed columns (per-row IEEE arithmetic is
    deterministic, so no rounding needed)."""
    t = Tables(spark, sf_dir)
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        (F.col("l_quantity") * 2.0).alias("double_qty"),
    )


@op(
    "filter_simple",
    sql="SELECT event_id, user_id, value FROM events WHERE value > 90",
)
def filter_simple(spark, sf_dir):
    """Single comparison predicate, pushed into the parquet scan (plan-tested)."""
    t = Tables(spark, sf_dir)
    return t.events.filter(F.col("value") > 90).select("event_id", "user_id", "value")


@op(
    "filter_compound",
    sql="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_discount
    FROM lineitem
    WHERE l_discount BETWEEN 0.02 AND 0.05
      AND l_returnflag IN ('A', 'R')
      AND NOT (l_linestatus = 'F')
      AND l_tax IS NOT NULL
    """,
)
def filter_compound(spark, sf_dir):
    """AND/OR/NOT + IN + BETWEEN + null tests combined in one pushable predicate."""
    t = Tables(spark, sf_dir)
    return t.lineitem.filter(
        F.col("l_discount").between(0.02, 0.05)
        & F.col("l_returnflag").isin("A", "R")
        & ~(F.col("l_linestatus") == "F")
        & F.col("l_tax").isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_discount")


@op(
    "filter_like",
    sql="""
    SELECT p_partkey, p_name, p_type, p_brand
    FROM part
    WHERE p_type LIKE 'PROMO%' AND p_name LIKE '%a%' AND p_brand NOT LIKE '%#4%'
    """,
)
def filter_like(spark, sf_dir):
    """Pattern predicates: LIKE / rlike / startswith, evaluated in codegen."""
    t = Tables(spark, sf_dir)
    return t.part.filter(
        F.col("p_type").like("PROMO%")
        & F.col("p_name").like("%a%")
        & ~F.col("p_brand").like("%#4%")
    ).select("p_partkey", "p_name", "p_type", "p_brand")


@op(
    "case_when",
    sql="""
    SELECT CASE WHEN value < 10 THEN 'low'
                WHEN value < 50 THEN 'mid'
                ELSE 'high' END AS bucket,
           event_type,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def case_when(spark, sf_dir):
    """Conditional projection: CASE WHEN ladders compiled into codegen expressions."""
    t = Tables(spark, sf_dir)
    bucket = (
        F.when(F.col("value") < 10, "low")
        .when(F.col("value") < 50, "mid")
        .otherwise("high")
        .alias("bucket")
    )
    return t.events.groupBy(bucket, "event_type").agg(F.count(F.lit(1)).alias("n"))


@op(
    "filter_null_safe_eq",
    sql="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    WHERE NULLIF(l_returnflag, 'N') IS NOT DISTINCT FROM NULLIF(l_linestatus, 'O')
    GROUP BY l_returnflag, l_linestatus
    """,
)
def filter_null_safe_eq(spark, sf_dir):
    """Null-safe equality (<=>); NULLIF manufactures NULLs since the
    fixtures have none."""
    t = Tables(spark, sf_dir)
    lhs = F.nullif(F.col("l_returnflag"), F.lit("N"))
    rhs = F.nullif(F.col("l_linestatus"), F.lit("O"))
    return (
        t.lineitem.filter(lhs.eqNullSafe(rhs))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@op(
    "sql_passthrough",
    sql="""
    SELECT n.n_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_finished
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def sql_passthrough(spark, sf_dir):
    """Entry point B (SURVEY §3.1 vs §3.2): the engine accepts raw SQL
    text over registered views — the EXACT oracle string is executed by
    ``spark.sql`` (it is engine-portable ANSI), landing in the same
    Catalyst pipeline as the DataFrame API. Three-way agreement
    (DataFrame plan ≡ Spark SQL ≡ DuckDB) is asserted in
    tests/test_parity.py."""
    t = Tables(spark, sf_dir)
    for name in ("orders", "customer", "nation"):
        getattr(t, name).createOrReplaceTempView(name)
    return spark.sql(ORACLE["sql_passthrough"])


@op(
    "filter_exists_correlated",
    sql="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_quantity > 45)
      AND NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_discount > 0.09)
    GROUP BY o_orderpriority
    """,
)
def filter_exists_correlated(spark, sf_dir):
    """Correlated EXISTS / NOT EXISTS filtering — the subquery form
    users actually write, pinned through Catalyst's DECORRELATION:
    both predicates must rewrite to existence joins (left semi for
    EXISTS, left anti for NOT EXISTS on the same fact), never a
    per-row subquery evaluation. The same rewrite is what tpch_q4/q21
    rely on; this key isolates it on minimal scaffolding so a
    decorrelation regression is attributable (plan pinned in
    test_plans.py).

    Scale (100 TB): two equi-joins on the order key — co-partitioned
    with the probe side, the lineitem side pre-filtered by its pushed
    predicate before either join; exact integer counts."""
    t = Tables(spark, sf_dir)
    for name in ("orders", "lineitem"):
        getattr(t, name).createOrReplaceTempView(name)
    return spark.sql(ORACLE["filter_exists_correlated"])


@op(
    "filter_not_in_vs_not_exists",
    sql="""
    WITH big_spenders AS (
        SELECT CASE WHEN o_totalprice > 400000 THEN o_custkey END AS k
        FROM orders
    )
    SELECT 'not_in' AS semantics, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM customer WHERE c_custkey NOT IN (SELECT k FROM big_spenders)
    UNION ALL
    SELECT 'not_exists', CAST(COUNT(*) AS BIGINT)
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM big_spenders b
                      WHERE b.k = c.c_custkey)
    """,
)
def filter_not_in_vs_not_exists(spark, sf_dir):
    """The NOT IN null trap, pinned as an operator: the subquery
    column contains NULLs (every order at or under the spend
    threshold yields NULL), so ANSI three-valued logic makes
    `NOT IN` return ZERO rows — `x NOT IN (…, NULL)` is never true —
    while `NOT EXISTS` ignores the NULLs and returns the real
    complement. Both engines implement the same standard, so the pair
    of counts hash-checks; Spark plans the NOT IN arm as a
    null-aware anti join (the single-column NAAJ), the NOT EXISTS arm
    as a plain left anti. Every data team hits this once; an engine
    that silently treats the two as equivalent corrupts complements
    at any scale.

    Scale: both arms are anti joins on the customer key against an
    aggregate-pruned subquery side; the NAAJ degenerates to a
    broadcast null-check plus hash lookup."""
    t = Tables(spark, sf_dir)
    for name in ("orders", "customer"):
        getattr(t, name).createOrReplaceTempView(name)
    return spark.sql(ORACLE["filter_not_in_vs_not_exists"])
