"""Batch Python DataSource: byte-range-partitioned JSONL reader.

Completes the custom-DataSource surface next to the streaming webhook
source (sources/webhook.py): ``spark.read.format("jsonl_ranges")``
plans N byte-range partitions over a JSON-lines file and each task
parses only its slice — the same split algorithm every distributed
text reader uses:

- partition i covers bytes [i*step, (i+1)*step);
- a reader seeks to its start and, unless it starts at byte 0, skips
  the (partial) line the previous partition will finish — so every
  line is owned by exactly one partition regardless of where the cut
  lands;
- it keeps reading past its end offset until it completes the line it
  started, then stops.

Planning is O(1) (one stat for the file size — never a scan), so the
same source description works when the file is 100 TB across an
object store; only ``n_partitions`` changes.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

JSONL_SCHEMA = (
    "event_id bigint, ts_us bigint, user_id bigint, event_type string, "
    "value double, props string"
)
_FIELDS = ["event_id", "ts_us", "user_id", "event_type", "value", "props"]


class _Range(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path, self.start, self.end = path, start, end


class JsonlRangeReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.n = int(options.get("n_partitions", 4))

    def partitions(self):
        size = os.path.getsize(self.path)
        step = max(1, (size + self.n - 1) // self.n)
        return [
            _Range(self.path, lo, min(lo + step, size))
            for lo in range(0, size, step)
        ]

    def read(self, part: _Range):
        with open(part.path, "rb") as f:
            f.seek(part.start)
            if part.start > 0:
                f.readline()  # owned by the previous partition
            while f.tell() <= part.end:
                line = f.readline()
                if not line:
                    break
                obj = json.loads(line)
                yield tuple(obj.get(k) for k in _FIELDS)


class JsonlRangeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_ranges"

    def schema(self) -> str:
        return JSONL_SCHEMA

    def reader(self, schema) -> JsonlRangeReader:
        return JsonlRangeReader(self.options)
