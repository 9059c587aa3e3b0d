"""Property-style differential testing: Spark vs DuckDB over a grammar
of generated queries (SURVEY §5.2.5).

The per-operator parity suite pins one representative query per key;
this suite sweeps a *space* of queries — every combination drawn from
a small grammar of filters, groupings, and aggregates over lineitem /
orders / events — and asserts Spark and DuckDB agree on each. Bugs
this catches that fixed examples miss: predicate boundary semantics
(<, <=, BETWEEN on doubles and dates), NULL routing through
aggregates, GROUP BY on expression keys, and the determinism helpers
(`norms.py`) drifting between engines for some scale/rounding combo.

Hypothesis drives the sampling with a fixed derandomized profile so
CI runs are reproducible; each example builds BOTH sides from the
same spec — no query text is shared between engines, so agreement is
evidence of semantic equivalence, not string reuse.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from data_webhooks_spark.io import Tables
from data_webhooks_spark.norms import dec_sum, o_dec_sum
from data_webhooks_spark.oracle import compare_frames

# Builder tier (r12 verdict item 2, same rationale as the adversarial
# matrix): this sweeps a generated-query SPACE — breadth fuzzing, not
# any single operator's contract (each key keeps its pinned parity
# test in the default tier). ~2 min of Hypothesis-driven Spark jobs
# the driver's budgeted default run doesn't need to repeat; the
# round-close full run (`pytest -m ""`) keeps the coverage.
pytestmark = pytest.mark.slowtier

# ---- query-space grammar ---------------------------------------------------

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
KEY_COLS = ["l_returnflag", "l_linestatus"]
CMP_OPS = ["<", "<=", ">", ">=", "="]

filters = st.one_of(
    st.tuples(
        st.just("num"),
        st.sampled_from(NUM_COLS),
        st.sampled_from(CMP_OPS),
        st.sampled_from([0.02, 0.05, 1.0, 7.0, 25.0, 900.0, 25000.0]),
    ),
    st.tuples(
        st.just("key"),
        st.sampled_from(KEY_COLS),
        st.sampled_from(["=", "<>"]),
        st.sampled_from(["A", "N", "R", "O", "F"]),
    ),
    st.tuples(
        st.just("date"),
        st.just("l_shipdate"),
        st.sampled_from(["<", ">="]),
        st.sampled_from(["1993-06-30", "1995-01-01", "1997-03-15"]),
    ),
)

aggs = st.sampled_from(["count", "sum_long", "dec_sum", "min", "max"])


def spark_filter(df, spec):
    kind, col, op, val = spec
    c = F.col(col)
    lit = F.lit(val)
    return df.filter(
        {"<": c < lit, "<=": c <= lit, ">": c > lit, ">=": c >= lit,
         "=": c == lit, "<>": c != lit}[op]
    )


def sql_filter(spec):
    kind, col, op, val = spec
    if kind == "num":
        return f"{col} {op} {val}"
    if kind == "date":
        return f"{col} {op} TIMESTAMP '{val} 00:00:00'"
    return f"{col} {op} '{val}'"


def build_pair(t, fspecs, gcol, agg):
    df = t.lineitem
    conds = []
    for fs in fspecs:
        df = spark_filter(df, fs)
        conds.append(sql_filter(fs))
    where = (" WHERE " + " AND ".join(conds)) if conds else ""
    if agg == "count":
        sdf = df.groupBy(gcol).agg(F.count(F.lit(1)).alias("v"))
        sql = f"SELECT {gcol}, COUNT(*) AS v FROM lineitem{where} GROUP BY {gcol}"
    elif agg == "sum_long":
        sdf = df.groupBy(gcol).agg(
            F.sum(F.col("l_linenumber").cast("long")).cast("long").alias("v")
        )
        sql = (
            f"SELECT {gcol}, CAST(SUM(l_linenumber) AS BIGINT) AS v "
            f"FROM lineitem{where} GROUP BY {gcol}"
        )
    elif agg == "dec_sum":
        sdf = df.groupBy(gcol).agg(dec_sum("l_extendedprice", "v"))
        sql = (
            f"SELECT {gcol}, {o_dec_sum('l_extendedprice', 'v')} "
            f"FROM lineitem{where} GROUP BY {gcol}"
        )
    elif agg == "min":
        sdf = df.groupBy(gcol).agg(F.min("l_quantity").alias("v"))
        sql = f"SELECT {gcol}, MIN(l_quantity) AS v FROM lineitem{where} GROUP BY {gcol}"
    else:
        sdf = df.groupBy(gcol).agg(F.max("l_extendedprice").alias("v"))
        sql = f"SELECT {gcol}, MAX(l_extendedprice) AS v FROM lineitem{where} GROUP BY {gcol}"
    return sdf.select(F.col(gcol), F.col("v")), sql


@pytest.fixture(scope="module")
def t(spark, sf_dir):
    return Tables(spark, sf_dir)


@settings(
    max_examples=40,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fspecs=st.lists(filters, min_size=0, max_size=3),
    gcol=st.sampled_from(KEY_COLS),
    agg=aggs,
)
def test_generated_groupby_agrees(spark, sf_dir, duck, t, fspecs, gcol, agg):
    sdf, sql = build_pair(t, fspecs, gcol, agg)
    probs = compare_frames(sdf.toPandas(), duck.execute(sql).df())
    assert not probs, f"{sql}\n{probs}"


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fspecs=st.lists(filters, min_size=1, max_size=2),
    k=st.sampled_from([1, 5, 50]),
)
def test_generated_topk_agrees(spark, sf_dir, duck, t, fspecs, k):
    """Top-k with a total-order tiebreak must agree row-for-row."""
    df = t.lineitem
    conds = []
    for fs in fspecs:
        df = spark_filter(df, fs)
        conds.append(sql_filter(fs))
    where = " WHERE " + " AND ".join(conds)
    sdf = df.orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    ).select("l_orderkey", "l_linenumber", "l_extendedprice").limit(k)
    sql = (
        "SELECT l_orderkey, l_linenumber, l_extendedprice "
        f"FROM lineitem{where} "
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber "
        f"LIMIT {k}"
    )
    probs = compare_frames(sdf.toPandas(), duck.execute(sql).df())
    assert not probs, f"{sql}\n{probs}"


WIN_FNS = ["row_number", "rank", "dense_rank", "lag", "lead", "run_count"]


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fspecs=st.lists(filters, min_size=0, max_size=2),
    pcol=st.sampled_from(KEY_COLS),
    ocol=st.sampled_from(NUM_COLS),
    fn=st.sampled_from(WIN_FNS),
)
def test_generated_window_agrees(spark, sf_dir, duck, t, fspecs, pcol, ocol, fn):
    """Generated window queries: rank-family over value ties (rank is
    tie-invariant), and order-sensitive fns (row_number/lag/lead/
    running count) over a fully-determined ordering ending in the
    unique (l_orderkey, l_linenumber)."""
    from pyspark.sql import Window

    df = t.lineitem
    conds = []
    for fs in fspecs:
        df = spark_filter(df, fs)
        conds.append(sql_filter(fs))
    where = (" WHERE " + " AND ".join(conds)) if conds else ""

    tie = ", l_orderkey, l_linenumber"
    if fn in ("rank", "dense_rank"):
        w = Window.partitionBy(pcol).orderBy(F.col(ocol))
        over = f"OVER (PARTITION BY {pcol} ORDER BY {ocol})"
    else:
        w = Window.partitionBy(pcol).orderBy(
            F.col(ocol), F.col("l_orderkey"), F.col("l_linenumber")
        )
        over = f"OVER (PARTITION BY {pcol} ORDER BY {ocol}{tie})"

    if fn == "row_number":
        v, vsql = F.row_number().over(w).cast("long"), f"row_number() {over}"
    elif fn == "rank":
        v, vsql = F.rank().over(w).cast("long"), f"rank() {over}"
    elif fn == "dense_rank":
        v, vsql = F.dense_rank().over(w).cast("long"), f"dense_rank() {over}"
    elif fn == "lag":
        v, vsql = F.lag(ocol).over(w), f"lag({ocol}) {over}"
    elif fn == "lead":
        v, vsql = F.lead(ocol).over(w), f"lead({ocol}) {over}"
    else:
        w2 = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        v = F.count(F.lit(1)).over(w2).cast("long")
        vsql = (
            f"count(*) {over[:-1]} ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND CURRENT ROW)"
        )

    sdf = df.select("l_orderkey", "l_linenumber", v.alias("v"))
    sql = (
        f"SELECT l_orderkey, l_linenumber, {vsql} AS v FROM lineitem{where}"
    )
    probs = compare_frames(sdf.toPandas(), duck.execute(sql).df())
    assert not probs, f"{sql}\n{probs}"


# ---- events grammar: timestamp/JSON semantics (§5.3 hazard zone) ----------

EV_FILTERS = st.one_of(
    st.tuples(
        st.just("ts"),
        st.sampled_from(["<", ">="]),
        st.sampled_from(
            ["2024-01-05 00:00:00", "2024-01-16 12:00:00", "2024-01-28 06:30:00"]
        ),
    ),
    st.tuples(
        st.just("type"),
        st.sampled_from(["=", "<>"]),
        st.sampled_from(["view", "click", "purchase", "error", "signup"]),
    ),
    st.tuples(
        st.just("val"),
        st.sampled_from(["<", "<=", ">", ">="]),
        st.sampled_from([5.0, 34.59, 100.0, 250.0]),
    ),
)

EV_GROUPS = ["event_type", "day", "hour_of_day", "json_k_parity"]


def ev_spark_filter(df, spec):
    kind, op_, val = spec
    if kind == "ts":
        c = F.col("ts")
        lit = F.lit(val).cast("timestamp_ntz")
    elif kind == "type":
        c, lit = F.col("event_type"), F.lit(val)
    else:
        c, lit = F.col("value"), F.lit(val)
    return df.filter(
        {"<": c < lit, "<=": c <= lit, ">": c > lit, ">=": c >= lit,
         "=": c == lit, "<>": c != lit}[op_]
    )


def ev_sql_filter(spec):
    kind, op_, val = spec
    if kind == "ts":
        return f"ts {op_} TIMESTAMP '{val}'"
    if kind == "type":
        return f"event_type {op_} '{val}'"
    return f"value {op_} {val}"


def ev_group(gcol):
    """(spark Column, duckdb expr) for each grouping key."""
    if gcol == "event_type":
        return F.col("event_type"), "event_type"
    if gcol == "day":
        return F.date_trunc("day", "ts"), "date_trunc('day', ts)"
    if gcol == "hour_of_day":
        return F.hour("ts").cast("long"), "CAST(extract(hour FROM ts) AS BIGINT)"
    # parity of the props JSON payload's "k" integer
    return (
        (F.get_json_object("props", "$.k").cast("long") % 2),
        "CAST(json_extract(props, '$.k') AS BIGINT) % 2",
    )


@settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fspecs=st.lists(EV_FILTERS, min_size=0, max_size=2),
    gcol=st.sampled_from(EV_GROUPS),
)
def test_generated_events_agg_agrees(spark, sf_dir, duck, t, fspecs, gcol):
    """Generated (timestamp/JSON-keyed) aggregations over events must
    agree across engines — sweeps the tz/µs-truncation/date_trunc/
    json-extraction hazards the fixed parity examples touch only at
    single points."""
    df = t.events
    conds = []
    for fs in fspecs:
        df = ev_spark_filter(df, fs)
        conds.append(ev_sql_filter(fs))
    where = (" WHERE " + " AND ".join(conds)) if conds else ""
    gexpr, gsql = ev_group(gcol)
    sdf = df.groupBy(gexpr.alias("g")).agg(
        F.count(F.lit(1)).alias("n"), dec_sum("value", "v", 4)
    )
    sql = (
        f"SELECT {gsql} AS g, COUNT(*) AS n, {o_dec_sum('value', 'v', 4)} "
        f"FROM events{where} GROUP BY 1"
    )
    probs = compare_frames(sdf.toPandas(), duck.execute(sql).df())
    assert not probs, f"{sql}\n{probs}"


# ---- join grammar: generated equi-join + filter + agg combinations --------

JOIN_HOWS = ["inner", "left", "left_semi", "left_anti"]
ORD_FILTERS = st.sampled_from(
    [None, ("o_orderstatus", "F"), ("o_orderstatus", "O"), ("o_orderstatus", "P")]
)
CUST_FILTERS = st.sampled_from(
    [None, ("c_mktsegment", "BUILDING"), ("c_mktsegment", "MACHINERY"),
     ("c_nationkey_lt", 12)]
)


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(how=st.sampled_from(JOIN_HOWS), of=ORD_FILTERS, cf=CUST_FILTERS)
def test_generated_join_agrees(spark, sf_dir, duck, t, how, of, cf):
    """Generated customer⋈orders joins across join types × side
    filters, reduced to per-nation counts — sweeps the null-extension
    and existence-filter semantics the fixed join keys pin at single
    points (e.g. a filtered right side under LEFT OUTER must
    null-extend, not drop, the unmatched customers)."""
    c, o = t.customer, t.orders
    osql = "SELECT * FROM orders"
    if of is not None:
        o = o.filter(F.col(of[0]) == of[1])
        osql += f" WHERE {of[0]} = '{of[1]}'"
    csql = "SELECT * FROM customer"
    if cf is not None:
        if cf[0] == "c_nationkey_lt":
            c = c.filter(F.col("c_nationkey") < cf[1])
            csql += f" WHERE c_nationkey < {cf[1]}"
        else:
            c = c.filter(F.col(cf[0]) == cf[1])
            csql += f" WHERE {cf[0]} = '{cf[1]}'"

    joined = c.join(o, c.c_custkey == o.o_custkey, how)
    sdf = joined.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n"))
    dk = {
        "inner": f"SELECT c_nationkey, COUNT(*) AS n FROM ({csql}) c JOIN ({osql}) o ON c_custkey = o_custkey GROUP BY 1",
        "left": f"SELECT c_nationkey, COUNT(*) AS n FROM ({csql}) c LEFT JOIN ({osql}) o ON c_custkey = o_custkey GROUP BY 1",
        "left_semi": (
            f"SELECT c_nationkey, COUNT(*) AS n FROM ({csql}) c WHERE EXISTS "
            f"(SELECT 1 FROM ({osql}) o WHERE o_custkey = c_custkey) GROUP BY 1"
        ),
        "left_anti": (
            f"SELECT c_nationkey, COUNT(*) AS n FROM ({csql}) c WHERE NOT EXISTS "
            f"(SELECT 1 FROM ({osql}) o WHERE o_custkey = c_custkey) GROUP BY 1"
        ),
    }[how]
    probs = compare_frames(sdf.toPandas(), duck.execute(dk).df())
    assert not probs, f"{how} {of} {cf}\n{probs}"
