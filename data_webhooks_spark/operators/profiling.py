"""Data profiling / data-quality operators (SURVEY §2.15).

Any pipeline feeding a 100 TB training run needs automated table
profiling (what does this column look like?) and rule-based quality
gates (how many rows violate the contract?) — the Deequ/
Great-Expectations surface, expressed as plain Catalyst plans.

Scale notes (100 TB):
- ``profile_table`` computes every column's stats in ONE scan: the
  multi-column exact ``countDistinct`` makes Catalyst plan an Expand
  (one duplicated row-stream per distinct column) — the honest cost
  of exactness; the 100 TB variant swaps in
  ``approx_count_distinct`` (fixed-size HLL state, no Expand blowup)
  — same plan shape, sketch state.
- ``dq_checks`` evaluates all row-local rules in one pass as
  conditional counts (codegen), plus one left-anti join for the
  referential rule; every rule reduces map-side, so the output is a
  handful of rows regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import Tables
from ..norms import finite_or_null, o_qnt, qnt
from ..regutil import registrar

QUERIES: dict = {}
ORACLE: dict = {}
op = registrar(QUERIES, ORACLE)

# (column, is_numeric) — numeric columns get min/max as rounded doubles;
# non-numerics profile null/distinct counts only (string min/max has
# cross-engine collation/formatting hazards; SURVEY §5.3).
_PROFILE_COLS = [
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderdate", False),
    ("o_orderpriority", False),
]


def _profile_oracle() -> str:
    parts = []
    for c, numeric in _PROFILE_COLS:
        if numeric:
            mn = f"ROUND(MIN(CAST({c} AS DOUBLE)), 6)"
            mx = f"ROUND(MAX(CAST({c} AS DOUBLE)), 6)"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
        parts.append(
            f"SELECT '{c}' AS column_name,"
            f" CAST(COUNT(*) AS BIGINT) AS n_rows,"
            f" CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,"
            f" CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,"
            f" {mn} AS min_num, {mx} AS max_num FROM orders"
        )
    return "\nUNION ALL\n".join(parts)


def _profile(spark, sf_dir, distinct_fn):
    """Shared one-scan profile plan; ``distinct_fn`` picks the
    distinct-count aggregate (exact vs HLL sketch)."""
    t = Tables(spark, sf_dir)
    aggs = []
    for c, numeric in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"__nn_{c}"),
            distinct_fn(c).alias(f"__nd_{c}"),
        ]
        if numeric:
            aggs += [
                F.round(F.min(F.col(c).cast("double")), 6).alias(f"__mn_{c}"),
                F.round(F.max(F.col(c).cast("double")), 6).alias(f"__mx_{c}"),
            ]
    wide = t.orders.agg(F.count(F.lit(1)).alias("__rows"), *aggs)
    entries = []
    for c, numeric in _PROFILE_COLS:
        mn = F.col(f"__mn_{c}") if numeric else F.lit(None).cast("double")
        mx = F.col(f"__mx_{c}") if numeric else F.lit(None).cast("double")
        entries.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__rows").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
                mn.alias("min_num"),
                mx.alias("max_num"),
            )
        )
    return wide.select(F.explode(F.array(*entries)).alias("p")).select("p.*")


@op("profile_table", sql=_profile_oracle())
def profile_table(spark, sf_dir):
    """One-scan table profile of ``orders``: per column — row count,
    null count, exact distinct count, and numeric min/max. The wide
    single-row aggregate is unpivoted to one row per column with an
    inline explode (no second pass).

    The oracle runs one aggregate per column (DuckDB re-scans; it is
    the yardstick). The multi-column exact countDistinct makes
    Catalyst plan an Expand — one duplicated row-stream per profiled
    column, the honest cost of exactness. At 100 TB that 6x stream is
    rarely worth it: ``profile_table_approx`` is the scale-default
    twin (same plan minus the Expand, HLL sketch state), with this
    exact form kept as its error-bound yardstick
    (tests/test_quality.py) and the A/B ratio recorded in
    BASELINE.md."""
    return _profile(spark, sf_dir, F.countDistinct)


@op("profile_table_approx")
def profile_table_approx(spark, sf_dir):
    """The scale-default profile: identical single-scan plan to
    ``profile_table`` but with ``approx_count_distinct`` (HLL++,
    default rsd 5%) replacing the exact multi-column countDistinct —
    Catalyst plans a plain one-pass aggregate with fixed-size sketch
    state instead of an Expand duplicating the row-stream once per
    profiled column (plan shape pinned Expand-free in test_plans.py).

    Rows-only driver key by design: Spark's HLL++ register values are
    deterministic for given data but engine-specific, so no DuckDB
    hash twin exists; the quantitative story is the per-column
    relative-error bound vs the exact twin asserted in
    tests/test_quality.py (sub-5%-rsd at every fixture SF)."""
    return _profile(spark, sf_dir, F.approx_count_distinct)


@op(
    "dq_checks",
    sql="""
    SELECT 'totalprice_positive' AS rule,
           CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
               AS n_violations,
           CAST(COUNT(*) AS BIGINT) AS n_checked
    FROM orders
    UNION ALL
    SELECT 'orderdate_in_range',
           CAST(COUNT(*) FILTER (WHERE o_orderdate < TIMESTAMP '1992-01-01'
                                    OR o_orderdate >= TIMESTAMP '1999-01-01')
                AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'status_in_domain',
           CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('F', 'O', 'P'))
                AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'custkey_not_null',
           CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'custkey_references_customer',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM orders
    """,
)
def dq_checks(spark, sf_dir):
    """Rule-based data-quality gate over ``orders``: four row-local
    contract rules evaluated as conditional counts in ONE scan, plus a
    referential-integrity rule (every o_custkey resolves in customer)
    as a left-anti join — the Deequ-style validation report a pipeline
    runs before promoting a batch.

    The row-local rules are a single aggregate (map-side reduction,
    codegen); the anti-join broadcasts or bloom-filters the dimension
    side under AQE. Output is one row per rule: violations + rows
    checked."""
    t = Tables(spark, sf_dir)

    def viol(cond, name):
        # count-based, not sum-based: COUNT over zero rows is 0 like
        # the oracle's COUNT(*) FILTER, while SUM would read NULL on
        # an empty batch (empty-input sweep)
        return F.count(F.when(cond, 1)).cast("long").alias(name)

    o = t.orders
    local = o.agg(
        viol(F.col("o_totalprice") <= 0, "totalprice_positive"),
        viol(
            (F.col("o_orderdate") < F.lit("1992-01-01").cast("timestamp_ntz"))
            | (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz")),
            "orderdate_in_range",
        ),
        viol(~F.col("o_orderstatus").isin("F", "O", "P"), "status_in_domain"),
        viol(F.col("o_custkey").isNull(), "custkey_not_null"),
        F.count(F.lit(1)).alias("n_checked"),
    )
    cust = t.customer
    orphans = (
        o.join(cust, o.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("v"))
        .select(F.col("v").cast("long").alias("custkey_references_customer"))
    )
    wide = local.crossJoin(orphans)  # 1-row x 1-row scalar attach
    rules = [
        "totalprice_positive",
        "orderdate_in_range",
        "status_in_domain",
        "custkey_not_null",
        "custkey_references_customer",
    ]
    entries = [
        F.struct(
            F.lit(r).alias("rule"),
            F.col(r).alias("n_violations"),
            F.col("n_checked").alias("n_checked"),
        )
        for r in rules
    ]
    return wide.select(F.explode(F.array(*entries)).alias("r")).select("r.*")


_PN_COLS = ["qty", "disc", "tax", "lnum"]
_PN_PAIRS = [(a, b) for i, a in enumerate(_PN_COLS) for b in _PN_COLS[i + 1:]]


def _pn_corr(a: str, b: str) -> str:
    """Pearson r for one column pair from the shared exact moments —
    the _CORR_EXPR pattern with textual substitution, so Spark and
    DuckDB evaluate byte-identical formulas per pair."""
    return (
        f"((nd * s_{a}_{b} - s_{a} * s_{b}) / "
        f"nullif(sqrt(nd * s_{a}_{a} - s_{a} * s_{a})"
        f" * sqrt(nd * s_{b}_{b} - s_{b} * s_{b}), 0.0))"
    )


@op(
    "profile_numeric_corr",
    sql=f"""
    WITH u AS (
        SELECT CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT) AS qty,
               CAST(FLOOR(l_discount * 10000.0 + 0.5) AS BIGINT) AS disc,
               CAST(FLOOR(l_tax * 10000.0 + 0.5) AS BIGINT) AS tax,
               CAST(l_linenumber AS BIGINT) AS lnum
        FROM lineitem
    ),
    m AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
               {", ".join(f"CAST(SUM({c}) AS DOUBLE) AS s_{c}" for c in _PN_COLS)},
               {", ".join(f"CAST(SUM({a} * {b}) AS DOUBLE) AS s_{a}_{b}" for a in _PN_COLS for b in _PN_COLS if _PN_COLS.index(a) <= _PN_COLS.index(b))}
        FROM u
    )
    {" UNION ALL ".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
        + o_qnt(_pn_corr(a, b), "corr") + " FROM m"
        for a, b in _PN_PAIRS
    )}
    """,
)
def profile_numeric_corr(spark, sf_dir):
    """Pairwise Pearson correlation MATRIX over four numeric lineitem
    columns (quantity, discount, tax, linenumber) — the numeric-
    profiling companion to `profile_table`: feature-redundancy and
    leakage screens want the whole matrix, not one pair.

    ONE scan computes every moment the 6 pairs need (4 sums, 4 square
    sums, 6 cross sums — all exact BIGINT in per-column units sized so
    no product can overflow, summed map-side); the matrix itself is a
    6-row epilogue over the single 1-row aggregate. This is the
    agg_corr discipline generalized: at 100 TB the cost is one
    map-combinable pass regardless of how many pairs the matrix has,
    and the per-day moment partials merge by addition."""
    t = Tables(spark, sf_dir)
    u = t.lineitem.select(
        F.floor(F.col("l_quantity") * 100.0 + 0.5).cast("long").alias("qty"),
        F.floor(F.col("l_discount") * 10000.0 + 0.5).cast("long").alias("disc"),
        F.floor(F.col("l_tax") * 10000.0 + 0.5).cast("long").alias("tax"),
        F.col("l_linenumber").cast("long").alias("lnum"),
    )
    aggs = [F.count(F.lit(1)).cast("double").alias("nd")]
    aggs += [F.sum(c).cast("double").alias(f"s_{c}") for c in _PN_COLS]
    aggs += [
        F.sum(F.col(a) * F.col(b)).cast("double").alias(f"s_{a}_{b}")
        for i, a in enumerate(_PN_COLS)
        for b in _PN_COLS[i:]
    ]
    m = u.agg(*aggs)
    rows = [
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            qnt(F.expr(_pn_corr(a, b)), "corr"),
        )
        for a, b in _PN_PAIRS
    ]
    return m.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


@op(
    "dq_freshness",
    sql="""
    WITH g AS (SELECT MAX(ts) AS gmax FROM events),
    per AS (
        SELECT event_type,
               MAX(ts) AS last_ts,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN ts >= (SELECT gmax FROM g)
                                        - INTERVAL 24 HOUR
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_last_24h
        FROM events GROUP BY event_type
    )
    SELECT p.event_type, p.last_ts,
           (epoch_us(g.gmax) - epoch_us(p.last_ts)) // 60000000
               AS staleness_min,
           p.n_total, p.n_last_24h
    FROM per p CROSS JOIN g
    """,
)
def dq_freshness(spark, sf_dir):
    """Feed-freshness gate (the first panel of every webhook ingest
    dashboard, and the SLA check `dq_checks` doesn't cover): per event
    type, the last event's timestamp, its staleness in whole minutes
    behind the newest event ANYWHERE in the table (wall-clock "now" is
    nondeterministic — the global max is the reproducible reference,
    stated in the contract), total rows, and rows in the trailing 24 h
    window before that reference — a dead or lagging webhook source
    shows up as staleness_min > 0 with a collapsing n_last_24h.

    One map-combinable groupBy over events plus a 1-row global-max
    aggregate broadcast onto the |types|-row result; staleness is
    exact integer µs arithmetic floored to minutes (µs deltas are
    non-negative, so truncating division agrees across engines)."""
    t = Tables(spark, sf_dir)
    g = t.events.agg(F.max("ts").alias("gmax"))
    per = (
        t.events.crossJoin(F.broadcast(g))
        .groupBy("event_type", "gmax")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum(
                F.when(
                    F.col("ts") >= F.col("gmax") - F.expr("INTERVAL 24 HOURS"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_last_24h"),
        )
    )
    return per.select(
        "event_type",
        "last_ts",
        F.expr(
            "(unix_micros(cast(gmax as timestamp))"
            " - unix_micros(cast(last_ts as timestamp))) div 60000000"
        ).alias("staleness_min"),
        "n_total",
        "n_last_24h",
    )


# Format-mask classes for profile_string_patterns, most-specific
# first: a value lands in exactly ONE class (CASE stops at the first
# match). Anchored POSIX classes only — identical regex semantics in
# Spark's rlike (Java) and DuckDB's regexp_matches (RE2) for this
# meta-character-free subset.
_PATTERN_CLASSES = [
    ("empty", r"^$"),
    ("int_like", r"^-?[0-9]+$"),
    ("float_like", r"^-?[0-9]+\.[0-9]+$"),
    ("alpha_lower", r"^[a-z]+$"),
    ("json_object", r"^\{.*\}$"),
]


def _pattern_case_sql(val: str) -> str:
    arms = " ".join(
        f"WHEN regexp_matches({val}, '{rx}') THEN '{name}'"
        for name, rx in _PATTERN_CLASSES
    )
    return f"CASE {arms} ELSE 'other' END"


@op(
    "profile_string_patterns",
    sql=f"""
    WITH vals(col_name, v) AS (
        SELECT 'event_id', CAST(event_id AS VARCHAR) FROM events
        UNION ALL SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
        UNION ALL SELECT 'event_type', event_type FROM events
        UNION ALL SELECT 'value',
            CASE WHEN ABS(value) <= 1.7976931348623157e308
                 THEN CAST(value AS VARCHAR) END FROM events
        UNION ALL SELECT 'props', props FROM events
    ),
    cls AS (
        SELECT col_name, {_pattern_case_sql('v')} AS pattern,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM vals GROUP BY 1, 2
    ),
    tot AS (
        SELECT col_name, CAST(SUM(n) AS BIGINT) AS n_col
        FROM cls GROUP BY col_name
    )
    SELECT c.col_name, c.pattern, c.n,
           FLOOR(CAST(c.n AS DOUBLE) / t.n_col * 1e6 + 0.5) / 1e6
               AS share
    FROM cls c JOIN tot t USING (col_name)
    """,
)
def profile_string_patterns(spark, sf_dir):
    """Format-mask profiling (the Deequ/Great-Expectations "what does
    this column LOOK like" report): every column's values, stringified
    the way a schema-on-read ingest would see them, classified into
    anchored pattern classes (int, float, lowercase word, JSON object,
    empty, other) with per-class counts and shares — the check that
    catches a feed suddenly shipping "N/A" in a numeric column or
    un-parsed JSON in a scalar one, BEFORE types blow up downstream.

    Cross-engine note: classes are matched most-specific-first in one
    CASE so each value lands in exactly one class; the regex subset
    (anchors + POSIX classes + literal braces) means Java regex and
    RE2 agree. DOUBLE->VARCHAR rendering differs across engines for
    scientific notation, but every events.value is a plain 2-decimal
    double that both engines print as [0-9]+.[0-9]+ -> float_like;
    the CLASSIFICATION (not the string) is compared. Non-finite
    doubles render engine-differently ('Infinity' vs 'inf' — DuckDB's
    would even classify alpha_lower), so they stringify to NULL on
    both sides (the engine-wide non-finite-as-missing policy) and
    land in the same class as NULL.

    Scale: the unpivot is Spark's stack() — one scan, the Expand
    feeds a map-combinable (col, class) count, so shuffle volume is
    #cols x #classes rows per task regardless of input size."""
    t = Tables(spark, sf_dir)
    # Spark SQL string literals eat one level of backslash escaping
    # (rlike '\{' reaches Java as bare '{' = illegal repetition), so
    # re-escape; DuckDB's single-quoted literals pass backslashes raw.
    arms = " ".join(
        "WHEN v rlike '{}' THEN '{}'".format(rx.replace("\\", "\\\\"), name)
        for name, rx in _PATTERN_CLASSES
    )
    stacked = t.events.select(
        F.expr(
            "stack(5,"
            " 'event_id', CAST(event_id AS STRING),"
            " 'user_id', CAST(user_id AS STRING),"
            " 'event_type', event_type,"
            " 'value', CASE WHEN ABS(value) <= 1.7976931348623157e308"
            " THEN CAST(value AS STRING) END,"
            " 'props', props) AS (col_name, v)"
        )
    )
    cls = stacked.select(
        "col_name",
        F.expr(f"CASE {arms} ELSE 'other' END").alias("pattern"),
    ).groupBy("col_name", "pattern").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    from pyspark.sql import Window

    w_tot = F.sum("n").over(Window.partitionBy("col_name"))
    return cls.select(
        "col_name",
        "pattern",
        "n",
        qnt(F.col("n").cast("double") / w_tot, "share"),
    )


# Candidate keys for dq_uniqueness: (label, spark expr, duckdb expr).
# Timestamps enter as epoch microseconds (BIGINT) — string-rendering a
# timestamp differs across engines (fraction-digit trimming), integer
# micros do not (the dq_freshness precedent).
_UNIQ_KEYS = [
    ("event_id", "CAST(event_id AS STRING)", "CAST(event_id AS VARCHAR)"),
    (
        "user_id+ts",
        "concat(CAST(user_id AS STRING), '|',"
        " CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS STRING))",
        "concat(CAST(user_id AS VARCHAR), '|',"
        " CAST(epoch_us(ts) AS VARCHAR))",
    ),
    (
        "event_type+day",
        "concat(event_type, '|',"
        " CAST(unix_micros(CAST(date_trunc('DAY', ts) AS TIMESTAMP)) AS STRING))",
        "concat(event_type, '|',"
        " CAST(epoch_us(date_trunc('day', ts)) AS VARCHAR))",
    ),
]


def _uniq_arm_sql(label: str, expr: str) -> str:
    return f"""
    SELECT '{label}' AS candidate_key,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) AS n_unique_keys,
           CAST(SUM(c) FILTER (WHERE c > 1) AS BIGINT) AS n_dup_rows,
           CAST(MAX(c) AS BIGINT) AS max_group,
           FLOOR(CAST(COUNT(*) AS DOUBLE) / SUM(c) * 1e6 + 0.5) / 1e6
               AS key_ratio
    FROM (SELECT {expr} AS k, CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1)
    """


@op(
    "dq_uniqueness",
    sql=" UNION ALL ".join(
        _uniq_arm_sql(lbl, dk) for lbl, _, dk in _UNIQ_KEYS
    ),
)
def dq_uniqueness(spark, sf_dir):
    """Key-uniqueness profiling (the Deequ `isUnique`/`uniqueness`
    check): for each CANDIDATE key — the declared primary key
    event_id, the natural key (user_id, ts), and the deliberately
    non-unique (event_type, day) — the distinct-key count, rows
    involved in duplicate groups, worst group size, and keys-per-row
    ratio. The report that validates "this column really is a key"
    before a merge_upsert relies on it, and quantifies the blast
    radius when it is not.

    n_rows counts GROUPS here reads wrong — to be precise: n_rows is
    the number of DISTINCT key values; n_unique_keys of them are
    singletons; n_dup_rows is the total raw rows trapped in >1-sized
    groups; key_ratio = distinct keys / raw rows (1.0 = perfect key).

    Determinism: pure integer counts; the one ratio quantizes.
    Timestamps participate as epoch-microsecond BIGINTs because
    string-rendered fractional seconds trim differently across
    engines (dq_freshness precedent).

    Scale: each candidate is a two-level aggregation (map-combinable
    count per key, then a bounded rollup); the three arms union to 3
    rows. At 100 TB swap exact counts for HLL per the
    profile_table_approx twin."""
    t = Tables(spark, sf_dir)
    arms = []
    for label, sk, _ in _UNIQ_KEYS:
        per_key = t.events.select(F.expr(sk).alias("k")).groupBy("k").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        arms.append(
            per_key.agg(
                F.lit(label).alias("candidate_key"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.count(F.when(F.col("c") == 1, 1))
                .cast("long")
                .alias("n_unique_keys"),
                F.sum(F.when(F.col("c") > 1, F.col("c")))
                .cast("long")
                .alias("n_dup_rows"),
                F.max("c").cast("long").alias("max_group"),
                qnt(
                    F.count(F.lit(1)).cast("double") / F.sum("c"),
                    "key_ratio",
                ),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


_FK_EDGES = [
    # (fk label, child table, child key, parent table, parent key)
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("events.user_id->customer", "events", "user_id",
     "customer", "c_custkey"),
]


def _fk_arm_sql(fk: str, child: str, ck: str, parent: str, pk: str) -> str:
    return f"""
        SELECT '{fk}' AS fk,
               CAST(SUM(g.cnt) AS BIGINT) AS n_child,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(COUNT(*) FILTER (WHERE p.{pk} IS NULL)
                    AS BIGINT) AS n_orphan_keys,
               CAST(COALESCE(SUM(g.cnt) FILTER (WHERE p.{pk} IS NULL),
                             0) AS BIGINT) AS n_orphan_rows,
               {o_qnt(f"CAST(COALESCE(SUM(g.cnt)"
                      f" FILTER (WHERE p.{pk} IS NULL), 0) AS DOUBLE)"
                      f" / SUM(g.cnt)", "orphan_rate")}
        FROM (SELECT {ck} AS k, COUNT(*) AS cnt FROM {child}
              WHERE {ck} IS NOT NULL GROUP BY 1) g
        LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
          ON g.k = p.{pk}"""


@op(
    "dq_referential",
    sql=" UNION ALL ".join(_fk_arm_sql(*e) for e in _FK_EDGES),
)
def dq_referential(spark, sf_dir):
    """Referential-integrity audit — the DQ check `dq_checks` (row
    rules) and `dq_uniqueness` (key rules) don't cover: for every
    declared FK edge in the star schema (plus the events→customer
    identity edge), the child row count, distinct child keys, and how
    many keys/rows dangle with no parent. A webhook pipeline surfaces
    broken joins here first — an upstream that starts minting new
    user_ids shows up as a nonzero orphan_rate on events→customer
    long before any query returns wrong totals.

    Scale (100 TB): each edge pre-aggregates the child to DISTINCT
    keys + counts (map-side combinable, collapses the fact table to
    key cardinality) and LEFT-joins that against the parent's key
    column only — the join input is |keys|, not |rows|, and AQE
    broadcasts whichever side is small. The 5 arms are independent
    branches unioned into one 5-row result; nothing touches the
    driver. Deliberately one single-column scan PER ARM — three
    alternatives measured and rejected at x100 (60M lineitem):
    (a) one scan explode-tripled through a combined shuffle, 19.1 s
    vs 13.0 s; (b) one three-key pre-aggregate
    groupBy(l_orderkey, l_partkey, l_suppkey) feeding three
    re-aggregations — the triple key is nearly unique per lineitem
    row, so the "shared" pass shuffles ~|rows| groups for zero
    reduction and its checkpoint OOMs the 128 GiB heap; (c) persist
    the 3-column projection and re-aggregate from cache, 10.7 s vs
    9.1 s same-run — cache materialization costs more than three
    pruned columnar re-reads. The residual 9.1 s vs DuckDB 1.3 s
    gap is five independent shuffle rounds' stage machinery over
    15M-key join arms (l_orderkey->orders dominates) — documented
    irreducible at this plan shape; the arms themselves are
    key-cardinality-bounded and spread across a cluster."""
    t = Tables(spark, sf_dir)
    arms = []
    for fk, child, ck, parent, pk in _FK_EDGES:
        g = (
            getattr(t, child)
            .filter(F.col(ck).isNotNull())
            .groupBy(F.col(ck).alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        p = getattr(t, parent).select(pk).distinct()
        j = g.join(p, g["k"] == p[pk], "left")
        orphan_rows = F.coalesce(
            F.sum(F.when(F.col(pk).isNull(), F.col("cnt"))), F.lit(0)
        )
        arms.append(
            j.agg(
                F.lit(fk).alias("fk"),
                F.sum("cnt").cast("long").alias("n_child"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.count(F.when(F.col(pk).isNull(), 1))
                .cast("long")
                .alias("n_orphan_keys"),
                orphan_rows.cast("long").alias("n_orphan_rows"),
                qnt(
                    orphan_rows.cast("double") / F.sum("cnt"),
                    "orphan_rate",
                ),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionAll(a)
    return out


@op(
    "dq_reconciliation",
    sql="""
    WITH ev AS (
        SELECT date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS ev_n,
               CAST(SUM(CASE WHEN ABS(value) <= 1.7976931348623157e308 AND value >= 0
                    THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                    WHEN ABS(value) <= 1.7976931348623157e308
                    THEN -CAST(FLOOR(-value * 100.0 + 0.5) AS BIGINT)
                    END) AS BIGINT) AS ev_cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    od AS (
        SELECT date_trunc('day', o_orderdate) AS day,
               CAST(COUNT(*) AS BIGINT) AS ord_n,
               CAST(SUM(CASE WHEN o_totalprice >= 0
                    THEN CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)
                    ELSE -CAST(FLOOR(-o_totalprice * 100.0 + 0.5) AS BIGINT)
                    END) AS BIGINT) AS ord_cents
        FROM orders
        GROUP BY 1
    )
    SELECT COALESCE(ev.day, od.day) AS day,
           COALESCE(ev.ev_n, 0) AS ev_n,
           COALESCE(od.ord_n, 0) AS ord_n,
           COALESCE(od.ord_n, 0) - COALESCE(ev.ev_n, 0) AS n_delta,
           CAST(COALESCE(ev.ev_cents, 0) AS DOUBLE) / 100 AS ev_value,
           CAST(COALESCE(od.ord_cents, 0) AS DOUBLE) / 100 AS ord_value,
           ev.day IS NOT NULL AND od.day IS NOT NULL AS both_present
    FROM ev FULL OUTER JOIN od ON od.day = ev.day
    """,
)
def dq_reconciliation(spark, sf_dir):
    """Source-vs-warehouse reconciliation — the nightly check every
    pipeline with two records of the same business event runs: per
    day, purchase-event counts and exact cent totals from the EVENTS
    stream beside order counts and totals from the ORDERS table, the
    count delta, and whether both sources covered the day at all. The
    two sources are independent fixtures, so the report's job is to
    EXPOSE their disagreement (it does — different periods, different
    magnitudes); the DQ contract is that the comparison itself is
    exact, not that the sources agree.

    Exact cent-unit BIGINT sums on both arms (the dec_sum recipe
    inlined so the oracle is one self-contained statement); one float
    division per displayed total at the end.

    Scale (100 TB): two independent map-combinable daily rollups
    (each collapses its fact table to |days| rows before anything
    joins), then a FULL OUTER equi-join of two aggregate-sized
    tables. Nothing row-level crosses sources."""
    t = Tables(spark, sf_dir)
    ev = (
        t.events.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("ev_n"),
            F.sum(
                F.when(
                    finite_or_null("value") >= 0,
                    F.floor(F.col("value") * 100.0 + 0.5),
                ).when(
                    finite_or_null("value") < 0,
                    -F.floor(-F.col("value") * 100.0 + 0.5),
                )
            )
            .cast("long")
            .alias("ev_cents"),
        )
    )
    od = (
        t.orders.groupBy(
            F.date_trunc("day", "o_orderdate").alias("day")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("ord_n"),
            F.sum(
                F.when(
                    F.col("o_totalprice") >= 0,
                    F.floor(F.col("o_totalprice") * 100.0 + 0.5),
                ).otherwise(-F.floor(-F.col("o_totalprice") * 100.0 + 0.5))
            )
            .cast("long")
            .alias("ord_cents"),
        )
    )
    j = ev.join(od.withColumnRenamed("day", "oday"),
                ev["day"] == F.col("oday"), "full_outer")
    return j.select(
        F.coalesce(ev["day"], F.col("oday")).alias("day"),
        F.coalesce("ev_n", F.lit(0)).alias("ev_n"),
        F.coalesce("ord_n", F.lit(0)).alias("ord_n"),
        (
            F.coalesce("ord_n", F.lit(0)) - F.coalesce("ev_n", F.lit(0))
        ).alias("n_delta"),
        (F.coalesce("ev_cents", F.lit(0)).cast("double") / 100).alias(
            "ev_value"
        ),
        (F.coalesce("ord_cents", F.lit(0)).cast("double") / 100).alias(
            "ord_value"
        ),
        (ev["day"].isNotNull() & F.col("oday").isNotNull()).alias(
            "both_present"
        ),
    )


@op(
    "dq_observe",
    sql="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE value < 0) AS BIGINT) AS n_negative,
           CAST(COUNT(*) FILTER (WHERE props IS NULL OR props = '')
                AS BIGINT) AS n_empty_props,
           COALESCE(CAST(SUM(CASE WHEN ABS(value) <= 1.7976931348623157e308 AND value >= 0
                THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                WHEN ABS(value) <= 1.7976931348623157e308
                THEN -CAST(FLOOR(-value * 100.0 + 0.5) AS BIGINT) END)
             AS DOUBLE) / 100, 0.0) AS value_total
    FROM events WHERE event_type = 'purchase'
    """,
)
def dq_observe(spark, sf_dir):
    """In-flight DQ metrics via Spark's Observation API — the
    mechanism that instruments a PRODUCTION query without a second
    scan: `df.observe(...)` attaches named aggregates that accumulate
    as a side effect of whatever action the pipeline was running
    anyway, so row counts, violation counters, and exact cent totals
    come back with the job instead of from a separate audit pass
    (`dq_checks` is that separate pass; this is the zero-extra-cost
    twin for queries that already run). The operator instruments the
    purchase-feed projection, drives it with the pipeline's own
    action, and returns the observed metrics — hash-checked against
    the oracle recomputing them from the raw table, which proves the
    observed values ARE the query's true aggregates.

    Scale (100 TB): observation metrics are Spark accumulators —
    merged per task on the driver, no shuffle, no extra scan; the
    pattern costs nothing beyond the job it rides. The count here is
    the action a real pipeline replaces with its write."""
    from pyspark.sql import Observation

    t = Tables(spark, sf_dir)
    obs = Observation()
    feed = t.events.filter(F.col("event_type") == "purchase").observe(
        obs,
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count(F.when(F.col("value") < 0, 1)).cast("long").alias(
            "n_negative"
        ),
        F.count(
            F.when(
                F.col("props").isNull() | (F.col("props") == ""), 1
            )
        )
        .cast("long")
        .alias("n_empty_props"),
        (
            F.sum(
                F.when(
                    finite_or_null("value") >= 0,
                    F.floor(F.col("value") * 100.0 + 0.5),
                ).when(
                    finite_or_null("value") < 0,
                    -F.floor(-F.col("value") * 100.0 + 0.5),
                )
            ).cast("double")
            / 100
        ).alias("value_total"),
    )
    feed.write.format("noop").mode("overwrite").save()  # the ride-along action
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["n_negative"],
                m["n_empty_props"],
                # SUM over zero rows observes NULL — an empty feed
                # totals 0.0, it doesn't crash the metrics reader
                float(m["value_total"] or 0.0),
            )
        ],
        "n_rows long, n_negative long, n_empty_props long, value_total double",
    )
