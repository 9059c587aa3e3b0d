"""data_webhooks_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference system `mfamador/data-webhooks`
(stream-processor category; see SURVEY.md §0 — the reference checkout
is empty, so SURVEY.md §2 is the normative capability surface).

Layout:
    session.py        SparkSession construction + runtime tuning
    schemas.py        explicit StructTypes for the fixture tables
    io.py             table loaders (parquet fixtures)
    norms.py          cross-engine (Spark <-> DuckDB) determinism helpers
    registry.py       aggregates every operator's queries()/oracle_sql()
    operators/        batch operator inventory (SURVEY.md §2.1-2.8, 2.10, 2.11)
    sources/          custom data sources (webhook streaming source, derived files)
    streaming/        Structured Streaming operators (SURVEY.md §2.9)
"""

__version__ = "0.1.0"
