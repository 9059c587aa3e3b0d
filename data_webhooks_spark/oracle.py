"""DuckDB oracle plumbing + result comparison.

Replicates the driver's correctness gate locally: for every operator
with a SQL oracle, run the Spark DataFrame AND the DuckDB SQL on the
same parquet, then compare row count + column names + an
order-insensitive multiset of canonicalized values. Floats are
compared EXACTLY (via hex) — the determinism rules in norms.py are
what make that possible, and testing anything looser would let driver
hash-mismatches slip through.
"""

from __future__ import annotations

import math
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from .io import duck_parquet_src
from .schemas import TABLE_NAMES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with the fixture tables pre-registered as views,
    mirroring the driver's harness."""
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{duck_parquet_src(f'{sf_dir}/{t}.parquet')}')"
        )
    return con


def canon(v):
    """Canonicalize one cell to a hashable, engine-neutral token."""
    if v is None or v is pd.NaT:
        return ("null",)
    if isinstance(v, (bool, np.bool_)):
        return ("bool", bool(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return ("nan",) if math.isnan(f) else ("f", f.hex())
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, Decimal):
        return ("f", float(v).hex())
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("a", tuple(canon(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, canon(x)) for k, x in v.items())))
    if isinstance(v, (pd.Timestamp, datetime)):
        return ("t", pd.Timestamp(v).isoformat())
    if isinstance(v, date):
        return ("d", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("b", bytes(v).hex())
    if isinstance(v, str):
        return ("s", v)
    # pandas NA and friends
    try:
        if pd.isna(v):
            return ("null",)
    except (TypeError, ValueError):
        pass
    return ("s", str(v))


def frame_multiset(pdf: pd.DataFrame) -> Counter:
    cols = sorted(pdf.columns)
    sub = pdf[cols]
    return Counter(
        tuple(canon(v) for v in row) for row in sub.itertuples(index=False, name=None)
    )


_UNSORTABLE_TOKENS = {"a", "m", "b"}  # array / map / bytes canon tags


def _driver_unsortable_cols(pdf: pd.DataFrame) -> list[str]:
    """Columns whose cells the external driver's canonicalizer cannot
    handle: it sorts every output column with pandas `sort_values`,
    which needs hashable, mutually-orderable cells — ndarray/list,
    dict, and bytes cells blow up there (the r5 red rows:
    embed_quantize_int8 + multimodal_{resize,frames,features}),
    while the local multiset canon happily compared them. Detect by
    scanning object-dtype columns for container/bytes values."""
    bad = []
    for col in pdf.columns:
        s = pdf[col]
        if s.dtype != object and not str(s.dtype).startswith("object"):
            continue
        for v in s:
            if isinstance(v, (list, tuple, dict, bytes, bytearray, np.ndarray)):
                bad.append(col)
                break
    return bad


def compare_frames(
    spark_pdf: pd.DataFrame,
    duck_pdf: pd.DataFrame,
    require_driver_sortable: bool = True,
) -> list[str]:
    """Return a list of human-readable mismatches (empty == match).

    `require_driver_sortable` (default, used for every registry
    parity check) additionally REJECTS results with container/binary
    cells even when both engines agree — the external driver's
    stricter sort-based canon would error on them, and the r5 round
    proved a local-green/driver-red divergence here is the worst kind
    of silent failure. Ad-hoc element-wise array comparisons (not
    part of the driver surface) may pass False explicitly."""
    problems: list[str] = []
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"column names differ: spark={sc} duckdb={dc}")
        return problems
    if require_driver_sortable:
        uns = _driver_unsortable_cols(spark_pdf)
        if uns:
            problems.append(
                f"driver-unsortable output columns {uns}: the external "
                "driver's pandas sort canon cannot hash/sort "
                "array/map/binary cells — scalarize (CSV-join, hex, or "
                "explode to rows) like agg_collect/multimodal_col"
            )
            return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} duckdb={len(duck_pdf)}")
    s_ms, d_ms = frame_multiset(spark_pdf), frame_multiset(duck_pdf)
    if s_ms != d_ms:
        only_s = list((s_ms - d_ms).items())[:3]
        only_d = list((d_ms - s_ms).items())[:3]
        problems.append(
            f"value multisets differ; sample only-in-spark={only_s} "
            f"only-in-duckdb={only_d}"
        )
    return problems
