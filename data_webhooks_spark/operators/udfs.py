"""UDF / UDAF / UDTF surface (SURVEY.md §2.11).

Escape hatches, in descending preference at 100 TB:
 1. built-in expressions (everything else in operators/ — zero Python)
 2. Arrow-vectorized pandas UDFs / applyInPandas (batched columnar
    transfer, one Python roundtrip per batch)
 3. row-at-a-time Python UDF (udf_python below exists to cover the
    operator key; never use it in a hot path — ~10-100x slower)

SQL-oracle'd entries re-express the Python semantics in ANSI SQL
(geomean == exp(avg(ln)), z-score == (x-mean)/stddev) and round to
absorb numpy-vs-DuckDB accumulation-order noise.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..io import Tables
from ..regutil import registrar

QUERIES: dict = {}
ORACLE: dict = {}
op = registrar(QUERIES, ORACLE)


@op(
    "udf_python",
    sql="""
    SELECT event_id, value,
           CASE WHEN value IS NULL THEN 'none'
                WHEN value >= 50 THEN 'high' ELSE 'low' END AS grade
    FROM events
    """,
)
def udf_python(spark, sf_dir):
    """Row-at-a-time Python UDF (the discouraged escape hatch); the
    oracle re-expresses the Python branch logic as a CASE, so the UDF
    result is hash-verified, not just row-counted."""
    t = Tables(spark, sf_dir)

    @F.udf("string")
    def grade(v: float) -> str:
        if v is None:
            return "none"
        return "high" if v >= 50 else "low"

    return t.events.select("event_id", "value", grade("value").alias("grade"))


@op(
    "udf_pandas_scalar",
    sql="""
    SELECT event_id, value,
           CASE WHEN value IS NULL THEN NULL
                ELSE LEAST(GREATEST(value / 100.0, 0.0), 1.0) END AS value01
    FROM events
    """,
)
def udf_pandas_scalar(spark, sf_dir):
    """Arrow-vectorized scalar UDF: whole-column pandas arithmetic.
    pandas clip == LEAST/GREATEST with an explicit NULL passthrough:
    pandas propagates NaN through clip while DuckDB's LEAST/GREATEST
    SKIP null arguments (NULL would clip to 0.0) — the CASE keeps the
    twin NULL-faithful (NULL-injection sweep)."""
    t = Tables(spark, sf_dir)

    @pandas_udf("double")
    def clip01(v: pd.Series) -> pd.Series:
        return (v / 100.0).clip(0.0, 1.0)

    return t.events.select("event_id", "value", clip01("value").alias("value01"))


@op(
    "udaf_pandas",
    sql="""
    SELECT l_returnflag,
           round(exp(avg(ln(l_quantity))), 6) AS geomean_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf_pandas(spark, sf_dir):
    """Custom aggregate (geometric mean) as a GROUPED_AGG pandas UDF;
    oracle re-expresses it as exp(avg(ln(x)))."""
    import numpy as np

    t = Tables(spark, sf_dir)

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).mean()))

    return t.lineitem.groupBy("l_returnflag").agg(
        F.round(geomean("l_quantity"), 6).alias("geomean_qty")
    )


@op(
    "grouped_map",
    sql="""
    SELECT event_id, user_id,
           round((fv - avg(fv) OVER (PARTITION BY user_id))
                 / stddev_samp(fv) OVER (PARTITION BY user_id), 6) AS z
    FROM (SELECT event_id, user_id,
                 CASE WHEN ABS(value) <= 1.7976931348623157e308
                      THEN value END AS fv
          FROM events)
    """,
)
def grouped_map(spark, sf_dir):
    """Per-group pandas transform (z-score normalize each user's values
    with applyInPandas); oracle is the window-function re-expression.
    pandas std(ddof=1) == stddev_samp.

    Grouping is on a hash BUCKET of the key, not the key itself: Spark
    invokes the pandas function once per group, so per-user grouping
    pays one Python call + frame construction per user (unbounded at
    100 TB), while bucketing bounds the call count to n_buckets and the
    per-user logic runs as one vectorized groupby inside each bucket.
    Requires only that the logic is per-key-local, which groupby
    preserves inside the bucket."""
    t = Tables(spark, sf_dir)

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        # non-finite -> NaN (pandas missing): mean/std skip it and the
        # corrupt row's own z is NULL — the engine-wide policy; DuckDB's
        # STDDEV_SAMP would otherwise raise outright on an inf input
        fv = pdf["value"].where(pdf["value"].abs() <= 1.7976931348623157e308)
        pdf = pdf.assign(value=fv)
        g = pdf.groupby("user_id")["value"]
        z = (pdf["value"] - g.transform("mean")) / g.transform("std")
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "z": z.round(6)}
        )

    return (
        t.events.select("event_id", "user_id", "value")
        .withColumn("bucket", F.pmod("user_id", F.lit(64)))
        .groupBy("bucket")
        .applyInPandas(zscore, "event_id long, user_id long, z double")
    )


@op(
    "udtf_python",
    sql="""
    SELECT event_id, k AS key, json_extract_string(props, '$.' || k) AS val
    FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events)
    """,
)
def udtf_python(spark, sf_dir):
    """Python UDTF: one row in -> many out (expand the props JSON object
    into key/value rows); oracle unnests json_keys so the expansion is
    hash-verified (int-valued props render identically both sides)."""
    import json as _json

    from pyspark.sql.functions import udtf

    t = Tables(spark, sf_dir)

    @udtf(returnType="event_id bigint, key string, val string")
    class ExpandProps:
        def eval(self, event_id: int, props: str):
            try:
                obj = _json.loads(props)
            except (TypeError, ValueError):
                return
            for k in sorted(obj):
                yield event_id, k, str(obj[k])

    t.events.select("event_id", "props").createOrReplaceTempView("_udtf_events")
    spark.udtf.register("expand_props", ExpandProps)
    return spark.sql(
        "SELECT p.* FROM _udtf_events e, "
        "LATERAL expand_props(e.event_id, e.props) p"
    )


@op(
    "map_in_pandas",
    sql="""
    SELECT event_id, value,
           CAST(event_id % 8 AS INT) AS bucket,
           CAST(row_number() OVER (PARTITION BY event_id % 8
                                   ORDER BY value, event_id) AS BIGINT)
               AS bucket_rank,
           CAST(COUNT(*) OVER (PARTITION BY event_id % 8) AS BIGINT)
               AS bucket_rows
    FROM events
    """,
)
def map_in_pandas(spark, sf_dir):
    """Partition-wise pandas iterator transform: rank each event's
    value within its deterministic 8-way event_id bucket, computed by
    accumulating a partition's Arrow batches and ranking per bucket.

    This exercises the full mapInPandas contract — iterator
    consumption, cross-batch state, 1->many re-emission — while the
    COMPUTED result depends only on the deterministic bucket key, not
    on partition/batch layout (the repartition guarantees each bucket
    is wholly inside one partition; several buckets may share a
    partition, which the per-bucket groupby inside the function
    handles). That layout-independence is what upgraded this key from
    rows-only to hash-checked in r4: the former per-Arrow-batch rank
    was unverifiable by construction."""
    t = Tables(spark, sf_dir)
    bucketed = t.events.select(
        "event_id", "value", F.pmod("event_id", F.lit(8)).cast("int").alias("bucket")
    ).repartition(8, "bucket")

    def rank_in_bucket(batches):
        acc = [pdf for pdf in batches]
        if not acc:
            return
        part = pd.concat(acc, ignore_index=True)
        for _, g in part.groupby("bucket", sort=True):
            out = g.sort_values(["value", "event_id"]).reset_index(drop=True)
            out["bucket_rank"] = (out.index + 1).astype("int64")
            out["bucket_rows"] = len(g)
            yield out[["event_id", "value", "bucket", "bucket_rank", "bucket_rows"]]

    return bucketed.mapInPandas(
        rank_in_bucket,
        "event_id long, value double, bucket int, bucket_rank long, bucket_rows long",
    )


@op(
    "cogrouped_map",
    sql="""
    WITH o AS (
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_open
        FROM orders GROUP BY o_custkey
    )
    SELECT c.c_custkey,
           coalesce(o.n_orders, 0) AS n_orders,
           coalesce(o.n_open, 0) AS n_open,
           round(c.c_acctbal / greatest(coalesce(o.n_orders, 0), 1), 6)
               AS bal_per_order
    FROM customer c LEFT JOIN o ON c.c_custkey = o.o_custkey
    """,
)
def cogrouped_map(spark, sf_dir):
    """Cogrouped pandas transform: customer and orders grouped on the
    same key arrive as two aligned pandas frames per key
    (``GroupedData.cogroup(...).applyInPandas``) — the escape hatch for
    per-key logic that needs BOTH sides at once (custom reconciliation,
    feature joins, per-entity backfills). Cogroup shuffles each side
    once on the key, like the join the oracle re-expresses; the pandas
    stage adds the Arrow hop, so at 100 TB prefer the join+agg form
    unless the per-key logic genuinely can't be expressed relationally.

    Both sides cogroup on a hash BUCKET of the customer key rather than
    the key itself: one Python invocation per bucket (bounded, 64)
    instead of one per customer (unbounded at 100 TB), with the per-key
    reconcile vectorized as a pandas groupby+merge inside the bucket.
    Cogroup still shuffles each side exactly once, on the bucket."""
    t = Tables(spark, sf_dir)

    def reconcile(cust: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
        if cust.empty:
            return pd.DataFrame(
                {
                    "c_custkey": pd.Series(dtype="int64"),
                    "n_orders": pd.Series(dtype="int64"),
                    "n_open": pd.Series(dtype="int64"),
                    "bal_per_order": pd.Series(dtype="float64"),
                }
            )
        per_cust = (
            orders.assign(is_open=(orders["o_orderstatus"] == "O").astype("int64"))
            .groupby("o_custkey")
            .agg(n_orders=("o_custkey", "size"), n_open=("is_open", "sum"))
        )
        out = cust[["c_custkey", "c_acctbal"]].merge(
            per_cust, left_on="c_custkey", right_index=True, how="left"
        )
        out[["n_orders", "n_open"]] = (
            out[["n_orders", "n_open"]].fillna(0).astype("int64")
        )
        out["bal_per_order"] = (
            out["c_acctbal"] / out["n_orders"].clip(lower=1)
        ).round(6)
        return out[["c_custkey", "n_orders", "n_open", "bal_per_order"]]

    c = (
        t.customer.select("c_custkey", "c_acctbal")
        .withColumn("bucket", F.pmod("c_custkey", F.lit(64)))
        .groupBy("bucket")
    )
    o = (
        t.orders.select("o_custkey", "o_orderstatus")
        .withColumn("bucket", F.pmod("o_custkey", F.lit(64)))
        .groupBy("bucket")
    )
    return c.cogroup(o).applyInPandas(
        reconcile,
        "c_custkey long, n_orders long, n_open long, bal_per_order double",
    )
