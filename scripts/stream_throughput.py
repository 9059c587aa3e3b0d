"""Streaming throughput metrics (BASELINE.md protocol step 4).

Prints one JSON line:
- file_stream_events_per_s: events/sec through file replay -> 10-min
  tumbling agg -> memory sink at $SPARK_GRAFT_SF_DIR (timed from
  query start to termination, warm session).
- webhook_posts_per_s: sustained HTTP ingest rate into the webhook
  DataSource (keep-alive client, single connection).
- webhook_completion_lag_s: time from the last accepted POST until
  the sink's complete-mode aggregation covers every posted event.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_webhooks_spark.session import get_spark  # noqa: E402
from data_webhooks_spark.sources.webhook import (  # noqa: E402
    WebhookDataSource,
    free_port,
    post_events,
)
from data_webhooks_spark.streaming.core import (  # noqa: E402
    checkpoint_dir,
    read_replay_stream,
)

N_POST = 2000


def file_stream_throughput(spark, sf_dir: str) -> float:
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    s = read_replay_stream(spark, sf_dir, files_per_trigger=4)
    agg = s.groupBy(F.window("ts", "10 minutes"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    name = f"tp_{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_events / (time.perf_counter() - t0)


def webhook_metrics(spark, sf_dir: str) -> tuple[float, float]:
    spark.dataSource.register(WebhookDataSource)
    port = free_port()
    bodies = [
        json.dumps({"event_id": i, "event_type": f"t{i % 5}"}) for i in range(N_POST)
    ]
    stats: dict = {}

    def poster():
        # wait for the server (first read() binds it), then blast
        t0 = time.perf_counter()
        accepted = post_events(port, bodies, timeout_s=90)
        stats["accepted"] = accepted
        stats["post_done"] = time.perf_counter()
        stats["post_wall"] = stats["post_done"] - t0

    raw = spark.readStream.format("webhook").option("port", port).load()
    parsed = raw.select(
        F.get_json_object("body", "$.event_type").alias("event_type")
    )
    agg = parsed.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    name = f"wh_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir())
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    th = threading.Thread(target=poster, daemon=True)
    th.start()
    deadline = time.time() + 120
    lag = float("nan")
    while time.time() < deadline:
        got = (
            spark.table(name).agg(F.sum("n").alias("t")).collect()[0]["t"] or 0
        )
        if "post_done" in stats and got >= stats["accepted"]:
            lag = time.perf_counter() - stats["post_done"]
            break
        time.sleep(0.05)
    q.stop()
    q.awaitTermination()
    posts_per_s = stats["accepted"] / stats["post_wall"]
    return posts_per_s, lag


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dws-stream-throughput")
    # warm the session so JVM/codegen startup isn't billed to streaming
    spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    fs = file_stream_throughput(spark, sf_dir)
    pps, lag = webhook_metrics(spark, sf_dir)
    print(
        json.dumps(
            {
                "file_stream_events_per_s": round(fs),
                "webhook_posts_per_s": round(pps),
                "webhook_completion_lag_s": round(lag, 3),
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
