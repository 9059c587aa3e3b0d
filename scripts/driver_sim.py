"""Simulate the external driver: vanilla SparkSession + DuckDB oracle.

This is the project verify recipe (.claude/skills/verify/SKILL.md):
exercises __spark_entry__.py exactly the way the driver does — no
build-time confs, entry() smoke, every queries()[k] vs oracle_sql()[k]
at sf0.01, rows-only keys executed.
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[8]").getOrCreate()

import __spark_entry__ as E  # noqa: E402

from data_webhooks_spark.oracle import compare_frames, duck_connect  # noqa: E402

SF = "/root/testdata/sf0.01"

rows = E.entry(spark).collect()
assert len(rows) > 0, "entry() returned no rows"
print(f"entry rows: {len(rows)}")

qs, osql = E.queries(), E.oracle_sql()
con = duck_connect(SF)
bad = []
only = sys.argv[1:] or None
for k in sorted(osql):
    if only and k not in only:
        continue
    sp = qs[k](spark, SF).toPandas()
    probs = compare_frames(sp, con.execute(osql[k]).df())
    if probs:
        bad.append((k, probs))
        print(f"MISMATCH {k}: {probs}")
print(f"sql keys checked: {len(only or osql)}, mismatches: {len(bad)}")
for k in sorted(set(qs) - set(osql)):
    if only and k not in only:
        continue
    n = qs[k](spark, SF).count()
    print(f"rows-only {k}: {n} rows")
spark.stop()
sys.exit(1 if bad else 0)
