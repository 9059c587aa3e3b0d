"""End-to-end webhook source test: HTTP POSTs -> custom DataSource ->
Structured Streaming agg == batch answer (SURVEY §7.3)."""

from pyspark.sql import functions as F

from data_webhooks_spark import registry
from data_webhooks_spark.io import Tables


def test_webhook_roundtrip_counts(spark, sf_dir):
    result = {
        r["event_type"]: r["n"]
        for r in registry.queries()["source_webhook"](spark, sf_dir).collect()
    }
    t = Tables(spark, sf_dir)
    expected = {
        r["event_type"]: r["n"]
        for r in t.events.orderBy("event_id")
        .limit(1000)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert result == expected


def test_webhook_backpressure_and_buffer():
    from data_webhooks_spark.sources.webhook import _Buffer

    buf = _Buffer()
    assert buf.append("a", max_buffer=2) == 0
    assert buf.append("b", max_buffer=2) == 1
    assert buf.append("c", max_buffer=2) is None  # 429 path
    assert buf.slice(0, 2) == [(0, "a"), (1, "b")]
    buf.prune(1)
    assert buf.slice(0, 2) == [(1, "b")]  # offset stability after prune
    assert buf.head == 2
    assert buf.append("c", max_buffer=2) == 2
