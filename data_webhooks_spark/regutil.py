"""Tiny registrar used by every operator module.

Usage in an operator module::

    QUERIES, ORACLE = {}, {}
    op = registrar(QUERIES, ORACLE)

    @op("agg_groupby", sql="SELECT ...")        # sql -> DuckDB oracle
    def agg_groupby(spark, sf_dir): ...

    @op("stream_dedup")                          # no sql -> rows-only check
    def stream_dedup(spark, sf_dir): ...
"""

from __future__ import annotations

from collections.abc import Callable


def registrar(queries: dict, oracle: dict) -> Callable:
    def op(name: str, sql: str | None = None):
        def deco(fn):
            if name in queries:
                raise ValueError(f"duplicate operator key {name!r}")
            queries[name] = fn
            if sql is not None:
                oracle[name] = sql
            return fn

        return deco

    return op
