"""Array / map / JSON operators (SURVEY.md §2.8).

The array ops run over embeddings (array<float>, dim 64); JSON ops over
events.props (JSON-in-string webhook payloads). Everything here is
built-in higher-order functions — JVM expressions, no Python UDFs —
which is what keeps semi-structured work whole-stage-codegen'd at
100 TB. Float-list arithmetic is promoted to double on BOTH engines
before any reduction, then rounded, since reduction order inside a
single list is identical (sequential) but engine float kernels differ.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import Tables
from ..regutil import registrar

QUERIES: dict = {}
ORACLE: dict = {}
op = registrar(QUERIES, ORACLE)


@op(
    "arr_basic",
    sql="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           embedding[1] AS first_dim,
           round(COALESCE(list_sum(list_transform(list_slice(embedding, 1, 4),
                                         x -> CAST(x AS DOUBLE))), 0.0), 6) AS head4_sum,
           round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_dim,
           round(CAST(list_min(embedding) AS DOUBLE), 6) AS min_dim
    FROM embeddings
    """,
)
def arr_basic(spark, sf_dir):
    """Array basics over embeddings: size / element_at / slice+fold /
    array_max / array_min.

    The sliced sub-array is reduced to a rounded scalar sum (slice is still
    exercised); array-typed output columns are avoided because the driver's
    order-insensitive hash canonicalizer requires hashable cells (the
    element-wise array comparison is covered locally by
    tests/test_parity.py::test_array_columns_elementwise_parity).
    The oracle's list_sum is COALESCEd to 0.0: Spark's fold seeds 0.0 so
    an empty slice yields 0.0, while DuckDB list_sum returns NULL —
    degenerate inputs must agree even though current fixtures are dense
    fixed-dim."""
    t = Tables(spark, sf_dir)
    e = F.col("embedding")
    head4_sum = F.aggregate(
        F.slice(e, 1, 4), F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return t.embeddings.select(
        "vec_id",
        F.size(e).alias("dim"),
        F.element_at(e, 1).alias("first_dim"),
        F.round(head4_sum, 6).alias("head4_sum"),
        F.round(F.array_max(e).cast("double"), 6).alias("max_dim"),
        F.round(F.array_min(e).cast("double"), 6).alias("min_dim"),
    )


@op(
    "arr_explode",
    sql="""
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS word,
           CAST(generate_subscripts(string_split(text, ' '), 1) AS INT) AS pos
    FROM documents
    """,
)
def arr_explode(spark, sf_dir):
    """Lateral un-nesting with position (posexplode); DuckDB zips
    unnest + generate_subscripts in lockstep. Spark posexplode is
    0-based -> +1."""
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "word")
    ).select("doc_id", "word", (F.col("pos0") + 1).cast("int").alias("pos"))


@op(
    "arr_higher_order",
    sql="""
    SELECT vec_id,
           round(COALESCE(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x)), 0.0), 6) AS sum_sq,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
           round(COALESCE(list_sum(list_transform(list_slice(embedding, 1, 3),
                                         x -> CAST(x AS DOUBLE) * 2)), 0.0), 6) AS head3_doubled_sum
    FROM embeddings
    """,
)
def arr_higher_order(spark, sf_dir):
    """Per-element lambdas: transform / filter / aggregate (fold).

    transform's output is folded to a rounded scalar (transform still runs)
    so every output cell stays hashable for the driver's canonicalizer.
    Oracle list_sums are COALESCEd to 0.0 to match Spark's seed-0.0 fold
    on empty/degenerate lists (ADVICE r2)."""
    t = Tables(spark, sf_dir)
    e = F.col("embedding")
    sum_sq = F.aggregate(
        e,
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    head3_doubled = F.aggregate(
        F.transform(F.slice(e, 1, 3), lambda x: x.cast("double") * 2),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return t.embeddings.select(
        "vec_id",
        F.round(sum_sq, 6).alias("sum_sq"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_positive"),
        F.round(head3_doubled, 6).alias("head3_doubled_sum"),
    )


def _map_funcs_sql():
    from ..norms import o_dec_sum

    return f"""
    WITH per AS (
        SELECT user_id, event_type,
               {o_dec_sum('value', 'total', 4)}
        FROM events WHERE event_type IS NOT NULL
        GROUP BY user_id, event_type
    )
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY event_type) AS types,
           MAX(CASE WHEN event_type = 'purchase' THEN total END)
               AS purchase_total,
           CAST(COUNT(*) AS INT) AS n_types
    FROM per GROUP BY user_id
    """


@op("map_funcs", sql=_map_funcs_sql())
def map_funcs(spark, sf_dir):
    """Build/inspect MapType: per-user map of event_type -> decimal-exact
    total value, then inspect keys/values. The map construction
    (map_from_entries over sorted collect_list) and lookups
    (map_keys / element_at / size) are fully exercised; the keys array
    is projected to a ','-joined scalar so the output hash-compares
    against the DuckDB twin (DuckDB MAP cells don't round-trip stably
    through pandas — same scalarization pattern as agg_collect)."""
    t = Tables(spark, sf_dir)
    from ..norms import dec_sum

    # maps cannot hold a NULL key (Spark raises NULL_MAP_KEY), so a
    # NULL event_type is excluded on both engines before the build
    per_type = t.events.filter(
        F.col("event_type").isNotNull()
    ).groupBy("user_id", "event_type").agg(
        dec_sum("value", "total", 4)
    )
    m = (
        per_type.groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(F.struct(F.col("event_type"), F.col("total")))
                )
            ).alias("type_totals")
        )
    )
    return m.select(
        "user_id",
        F.concat_ws(",", F.map_keys(F.col("type_totals"))).alias("types"),
        F.element_at(F.col("type_totals"), "purchase").alias("purchase_total"),
        F.size(F.col("type_totals")).alias("n_types"),
    )


@op(
    "json_get",
    sql="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50
    """,
)
def json_get(spark, sf_dir):
    """JSON path extraction from the webhook payload column."""
    t = Tables(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k")
    return (
        t.events.select(
            "event_id",
            k.alias("k_str"),
            k.cast("int").alias("k_int"),
        )
        .filter(F.col("k_int") > 50)
    )


@op(
    "json_parse",
    sql="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k,
           COALESCE(CAST(json_valid(props) AS BOOLEAN), FALSE)
               AS is_valid,
           CAST(len(json_keys(props)) AS INT) AS n_keys
    FROM events
    """,
)
def json_parse(spark, sf_dir):
    """Full parse to struct with schema (permissive mode); DuckDB twin
    uses its JSON inspection functions."""
    t = Tables(spark, sf_dir)
    parsed = F.from_json(F.col("props"), "k INT")
    return t.events.select(
        "event_id",
        parsed.getField("k").alias("k"),
        # a missing payload is NOT valid JSON — both engines coalesce
        # validity to FALSE so the flag is never NULL (NULL-injection
        # sweep; a nullable boolean also defeats the driver's canon)
        (F.col("props").isNotNull() & parsed.isNotNull()).alias("is_valid"),
        F.size(F.from_json(F.col("props"), "map<string,string>")).alias("n_keys"),
    )
