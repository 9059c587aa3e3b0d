"""Scalar function families (SURVEY.md §2.7).

All expressions are built-in pyspark.sql.functions — JVM-side, inside
whole-stage codegen; no Python in the hot path. Oracle SQL carries
compensating casts for DuckDB's wider return types (BIGINT year/hour,
DOUBLE ceil, 0-based dayofweek, DATE date_trunc) so schemas align.

Rounding policy: ROUND only on irrational-valued outputs (sqrt/ln/...)
where a decimal-boundary tie is measure-zero; money totals use the
norms.py decimal pattern instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ..io import Tables
from ..norms import qnt
from ..regutil import registrar

QUERIES: dict = {}
ORACLE: dict = {}
op = registrar(QUERIES, ORACLE)


@op(
    "str_funcs",
    sql="""
    SELECT c_custkey,
           concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           substring(c_name, 1, 8) AS name_prefix,
           CAST(length(c_name) AS INT) AS name_len,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           replace(c_mktsegment, 'A', '_') AS seg_repl,
           string_split(c_name, '#')[2] AS name_id
    FROM customer
    """,
)
def str_funcs(spark, sf_dir):
    """String family: concat/substring/case/trim/pad/length/split/initcap/replace."""
    t = Tables(spark, sf_dir)
    return t.customer.select(
        "c_custkey",
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_custkey").cast("string")).alias("seg_key"),
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.replace(F.col("c_mktsegment"), F.lit("A"), F.lit("_")).alias("seg_repl"),
        # Spark split() is regex; '#' has no meta-chars so it matches
        # DuckDB's literal string_split (SURVEY §5.3).
        F.element_at(F.split(F.col("c_name"), "#"), 2).alias("name_id"),
    )


@op(
    "str_regex",
    sql="""
    SELECT p_partkey,
           regexp_extract(p_type, '^(\\w+)', 1) AS type_head,
           regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
           CAST(regexp_matches(p_brand, 'Brand#[0-2]') AS BOOLEAN) AS is_low_brand
    FROM part
    WHERE regexp_matches(p_type, 'BRUSHED|PLATED|PROMO')
    """,
)
def str_regex(spark, sf_dir):
    """Regex extract/replace/match over the string columns."""
    t = Tables(spark, sf_dir)
    return t.part.filter(F.col("p_type").rlike("BRUSHED|PLATED|PROMO")).select(
        "p_partkey",
        F.regexp_extract(F.col("p_type"), r"^(\w+)", 1).alias("type_head"),
        F.regexp_replace(F.col("p_name"), " ", "_").alias("name_snake"),
        F.col("p_brand").rlike("Brand#[0-2]").alias("is_low_brand"),
    )


@op(
    "date_funcs",
    sql="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(month(o_orderdate) AS INT) AS o_month,
           CAST(day(o_orderdate) AS INT) AS o_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT) AS days_since_95,
           date_add(o_orderdate, INTERVAL 30 DAY) AS due_date,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow
    FROM orders
    """,
)
def date_funcs(spark, sf_dir):
    """Calendar functions: year/month/day, date_trunc, date_add, datediff, last_day, dayofweek."""
    t = Tables(spark, sf_dir)
    d = F.col("o_orderdate")
    return t.orders.select(
        "o_orderkey",
        F.year(d).alias("o_year"),
        F.month(d).alias("o_month"),
        F.dayofmonth(d).alias("o_day"),
        F.date_trunc("month", d).alias("month_start"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp_ntz")).alias("days_since_95"),
        (d + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        # DATE outputs are avoided engine-wide: pandas renders Spark
        # dates as objects but DuckDB dates as datetime64 -> hash skew.
        F.last_day(d).cast("timestamp_ntz").alias("month_end"),
        F.dayofweek(d).alias("dow"),  # Spark: 1=Sunday; DuckDB is 0-based
    )


@op(
    "ts_funcs",
    sql="""
    SELECT event_id,
           CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_date,
           CAST(hour(ts) AS INT) AS event_hour,
           CAST(minute(ts) AS INT) AS event_minute,
           CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS epoch_s,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_bucket
    FROM events
    """,
)
def ts_funcs(spark, sf_dir):
    """Timestamp conversions: to_date, unix_timestamp round-trips, UTC-pinned session timezone."""
    t = Tables(spark, sf_dir)
    ts = F.col("ts")
    return t.events.select(
        "event_id",
        ts.cast("date").cast("timestamp_ntz").alias("event_date"),
        F.hour(ts).alias("event_hour"),
        F.minute(ts).alias("event_minute"),
        F.unix_timestamp(ts.cast("timestamp")).alias("epoch_s"),
        F.date_trunc("hour", ts).alias("hour_bucket"),
    )


@op(
    "math_funcs",
    sql="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 30000.0) AS price_dev,
           CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_ceil,
           CAST(floor(l_quantity / 7.0) AS BIGINT) AS qty_floor,
           FLOOR(sqrt(l_extendedprice) * 1e6 + 0.5) / 1e6 AS price_sqrt,
           FLOOR(ln(l_extendedprice) * 1e6 + 0.5) / 1e6 AS price_ln,
           FLOOR(log10(l_extendedprice) * 1e6 + 0.5) / 1e6 AS price_log10,
           FLOOR(pow(1.0 + l_discount, 2) * 1e10 + 0.5) / 1e10 AS disc_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate,
           CAST(sign(l_extendedprice - 30000.0) AS DOUBLE) AS dev_sign
    FROM lineitem
    """,
)
def math_funcs(spark, sf_dir):
    """Math family: abs/ceil/floor/pow/sqrt/ln/log10/mod/sign/greatest/least with floor-quantized rounding (stays in codegen)."""
    t = Tables(spark, sf_dir)
    price, qty = F.col("l_extendedprice"), F.col("l_quantity")
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(price - 30000.0).alias("price_dev"),
        F.ceil(qty / 7.0).alias("qty_ceil"),
        F.floor(qty / 7.0).alias("qty_floor"),
        # qnt, not ROUND: per-row ROUND(double) allocates a BigDecimal
        # per value — on full-table outputs the quantize form is ~3x
        # faster end-to-end and bit-identical on both engines (norms.qnt).
        qnt(F.sqrt(price), "price_sqrt"),
        qnt(F.log(price), "price_ln"),
        qnt(F.log10(price), "price_log10"),
        qnt(F.pow(1.0 + F.col("l_discount"), 2), "disc_sq", 10),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod"),
        F.greatest(F.col("l_tax"), F.col("l_discount")).alias("max_rate"),
        F.least(F.col("l_tax"), F.col("l_discount")).alias("min_rate"),
        F.signum(price - 30000.0).alias("dev_sign"),
    )


@op(
    "null_funcs",
    sql="""
    SELECT c_custkey,
           coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           NULLIF(c_nationkey, 0) AS nation_nz,
           coalesce(NULLIF(c_acctbal, 0.0), -1.0) AS bal_or_neg,
           CAST(c_acctbal IS NULL AS BOOLEAN) AS bal_is_null
    FROM customer
    """,
)
def null_funcs(spark, sf_dir):
    """Null handling: coalesce, nullif, nvl, nanvl."""
    t = Tables(spark, sf_dir)
    return t.customer.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_or_other"),
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nation_nz"),
        F.coalesce(F.nullif(F.col("c_acctbal"), F.lit(0.0)), F.lit(-1.0)).alias(
            "bal_or_neg"
        ),
        F.col("c_acctbal").isNull().alias("bal_is_null"),
    )


@op(
    "cast_decimal",
    sql="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DECIMAL(30,2)) AS sum_price_dec,
           CAST(MIN(CAST(l_extendedprice AS DECIMAL(15,2))) AS DECIMAL(15,2)) AS min_price_dec,
           CAST(MAX(CAST(l_extendedprice AS DECIMAL(15,2))) AS DECIMAL(15,2)) AS max_price_dec
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def cast_decimal(spark, sf_dir):
    """Exact decimal arithmetic surface; final casts pin identical
    precision/scale across engines."""
    t = Tables(spark, sf_dir)
    dec = F.col("l_extendedprice").cast(DecimalType(15, 2))
    return t.lineitem.groupBy("l_returnflag").agg(
        F.sum(dec).cast(DecimalType(30, 2)).alias("sum_price_dec"),
        F.min(dec).cast(DecimalType(15, 2)).alias("min_price_dec"),
        F.max(dec).cast(DecimalType(15, 2)).alias("max_price_dec"),
    )


@op(
    "hash_funcs",
    sql="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256,
           md5(concat_ws('|', c_name, c_mktsegment)) AS row_fingerprint
    FROM customer
    """,
)
def hash_funcs(spark, sf_dir):
    """Stable content hashes (dedup/content addressing). xxhash64 seeds
    differ across engines (SURVEY §2.7) so md5/sha2 are the
    oracle-able pair."""
    t = Tables(spark, sf_dir)
    return t.customer.select(
        "c_custkey",
        F.md5(F.col("c_name")).alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
        F.md5(F.concat_ws("|", F.col("c_name"), F.col("c_mktsegment"))).alias(
            "row_fingerprint"
        ),
    )
