"""Batch operator inventory (SURVEY.md §2.1-2.8, §2.10, §2.11).

Each module defines module-level ``QUERIES`` (name -> callable taking
``(spark, sf_dir)`` and returning a DataFrame) and ``ORACLE`` (name ->
DuckDB SQL string) dicts; ``data_webhooks_spark.registry`` merges them.
"""
