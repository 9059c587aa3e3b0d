"""Multimodal column operators (SURVEY.md §2.10).

Pattern: media live as opaque BinaryType payloads next to a typed
metadata struct; decode/feature-extraction runs as Arrow-batched
mapInPandas so each Python batch handles many blobs at once. The
image/audio codecs are not installed in this container, so the decode
step is a clearly-marked deterministic stub (decode_stub below) — the
Spark-side plumbing (schema, batching, UDF signatures, partitioning)
is real and tested.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import functions as F

from ..io import Tables
from ..regutil import registrar

QUERIES: dict = {}
ORACLE: dict = {}
op = registrar(QUERIES, ORACLE)

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, header_hex string, checksum long, mime string"
)


def decode_stub(payload: bytes) -> dict:
    """Deterministic stand-in for a real media decoder.

    A production build would dispatch on MIME type to PIL / soundfile /
    pyav here (none are installed in this container); raising
    NotImplementedError for genuinely unsupported types is the
    documented contract. The stub emits stable pseudo-features so the
    pipeline shape is testable end-to-end.
    """
    if payload is None:
        raise NotImplementedError("decode of NULL payload")
    return {
        "n_bytes": len(payload),
        "header_hex": payload[:8].hex(),
        "checksum": int.from_bytes(
            hashlib.md5(payload).digest()[:4], "big", signed=False
        ),
    }


@op("multimodal_col")
def multimodal_col(spark, sf_dir):
    """Binary payload column + metadata struct + batched decode.

    Payloads are the documents' utf-8 bytes (the only binary source in
    the fixtures); metadata is a typed struct; decode runs via
    mapInPandas over Arrow batches.
    """
    t = Tables(spark, sf_dir)
    with_payload = t.documents.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("n_chars").alias("size_hint"),
            F.md5(F.col("text")).alias("etag"),
        ).alias("meta"),
    )

    def decode_batches(batches):
        for pdf in batches:
            feats = [decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "header_hex": [f["header_hex"] for f in feats],
                    "checksum": [f["checksum"] for f in feats],
                    "mime": [m["mime"] for m in pdf["meta"]],
                }
            )

    return with_payload.mapInPandas(decode_batches, DECODE_SCHEMA)
