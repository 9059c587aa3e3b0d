"""Graph operators over relational-derived edge lists (SURVEY §2.12b).

Analytics engines grow graph questions out of their fact tables —
"which products anchor the co-purchase network" is PageRank over the
parts-bought-together graph. The iterative-algorithm pattern here
complements `dedup_cluster`'s min-label propagation: a FIXED number of
power-method sweeps, each one join + one aggregate, driven by a plain
Python loop over DataFrames (the loop unrolls into one Catalyst plan
per iteration; nothing collects to the driver).

Determinism discipline: PageRank in floating point is a sum over
in-neighbors — accumulation-order-dependent, the classic cross-engine
hash-mismatch. The whole computation here stays in BIGINT "rank
units" (1e12 = mass 1.0): integer division for the damping split and
per-edge contributions, integer sums for the gather. Both engines do
identical integer arithmetic, so ranks match bit-for-bit with no
rounding budget at all. The truncation loss per node per sweep is
< deg units (~1e-9 of total mass) — far below any analytic use and,
crucially, *identically lost* on both sides.

Scale notes (100 TB): the edge build is one self-equi-join on the
order key (co-partitioned by l_orderkey; order groups are small so
the join output is bounded by Σ group²). Each sweep shuffles the edge
list once on dst — the same key every iteration, so a pre-partitioned
edge table makes sweeps exchange-free; ranks live in an
aggregate-sized (node, units) table, never materialized to the
driver.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import Tables
from ..regutil import registrar

QUERIES: dict = {}
ORACLE: dict = {}
op = registrar(QUERIES, ORACLE)

_SCALE = 1_000_000_000_000  # rank units per 1.0 of probability mass
_ITERS = 3
_D_NUM, _D_DEN = 85, 100  # damping 0.85 as an exact rational


def _pagerank_oracle() -> str:
    """Unrolled fixed-iteration PageRank as chained CTEs (standard SQL
    forbids aggregation in a recursive term, and a fixed sweep count
    unrolls into portable plain CTEs anyway). Each sweep re-joins the
    degree table so the contribution divides by the SOURCE's own
    out-degree."""
    sql = f"""
    WITH edges AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    basec AS (
        SELECT CAST({_SCALE} * {_D_DEN - _D_NUM} // ({_D_DEN} * n)
                    AS BIGINT) AS b
        FROM nn
    ),
    r0 AS (
        SELECT deg.src AS node, CAST({_SCALE} // nn.n AS BIGINT) AS ru
        FROM deg CROSS JOIN nn
    )"""
    prev = "r0"
    for i in range(1, _ITERS + 1):
        sql += f""",
    r{i} AS (
        SELECT e.dst AS node,
               (SELECT b FROM basec)
                 + SUM(p.ru * {_D_NUM} // ({_D_DEN} * dg.d)) AS ru
        FROM {prev} p
        JOIN deg dg ON dg.src = p.node
        JOIN edges e ON e.src = p.node
        GROUP BY e.dst
    )"""
        prev = f"r{i}"
    return (
        sql
        + f"""
    SELECT r.node, CAST(dg.d AS BIGINT) AS degree,
           CAST(r.ru AS BIGINT) AS pr_units
    FROM {prev} r JOIN deg dg ON dg.src = r.node
    """
    )


@op("graph_pagerank", sql=_pagerank_oracle())
def graph_pagerank(spark, sf_dir):
    """PageRank (Brin & Page '98) over the parts-bought-together
    graph: nodes are parts, with a directed edge each way between
    parts sharing an order; 3 power-method sweeps at damping 0.85.
    Co-occurrence is symmetric, so every node has in- and out-degree
    ≥ 1: no dangling mass, and the inner gather join drops nothing.

    All arithmetic is BIGINT rank units (module docstring): per-edge
    contribution ``ru * 85 div (100 * deg)`` (Spark `div` and DuckDB
    `//` agree on non-negative operands), gathered with an exact
    integer sum, plus the damping base — bit-identical across engines
    with no float rounding budget. The Python loop unrolls 3 sweeps
    declaratively; each sweep is one equi-join (edge list × rank
    table) + one groupBy on the same dst key."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_partkey")
    b = li.select(
        F.col("l_orderkey").alias("bok"), F.col("l_partkey").alias("dst")
    )
    edges = (
        li.join(b, li["l_orderkey"] == b["bok"])
        .filter(li["l_partkey"] != b["dst"])
        .select(li["l_partkey"].alias("src"), "dst")
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # 1-row scalars: node count -> uniform start mass + damping base
    scalars = deg.agg(F.count(F.lit(1)).alias("n")).select(
        F.expr(f"{_SCALE} div n").alias("ru0"),
        F.expr(f"({_SCALE} * {_D_DEN - _D_NUM}) div ({_D_DEN} * n)").alias(
            "base"
        ),
    )
    r = deg.crossJoin(F.broadcast(scalars)).select(
        F.col("src").alias("node"), "d", F.col("base"), F.col("ru0").alias("ru")
    )
    for _ in range(_ITERS):
        contrib = r.join(edges, r["node"] == edges["src"]).select(
            F.col("dst"),
            F.expr(f"ru * {_D_NUM} div ({_D_DEN} * d)").alias("c"),
        )
        gathered = contrib.groupBy("dst").agg(F.sum("c").alias("sc"))
        r = (
            deg.crossJoin(F.broadcast(scalars))
            .join(gathered, deg["src"] == gathered["dst"])
            .select(
                deg["src"].alias("node"),
                "d",
                F.col("base"),
                (F.col("base") + F.col("sc")).alias("ru"),
            )
        )
    return r.select(
        "node",
        F.col("d").cast("long").alias("degree"),
        F.col("ru").cast("long").alias("pr_units"),
    )
