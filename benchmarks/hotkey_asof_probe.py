#!/usr/bin/env python
"""Hot-key as-of join probe: ONE pathological key carrying 20M left +
20M right rows, single-window vs time-bucketed two-phase path, with the
window FORCED to evaluate (a bare count() lets Catalyst prune it — the
checksum aggregate over the matched column does not).

Measured on local[32] (2026-08-17): single-window 149-157s (one task
sorts and scans the 40M-row union), bucketed 24h 15-24s — ~7-10x — with
identical matched counts and checksums. Usage:
    PYTHONPATH=/root/repo python benchmarks/hotkey_asof_probe.py
"""

import time
from pyspark.sql import functions as F
from rtfproc_spark.session import get_spark
from rtfproc_spark.operators.joins import asof_join

spark = get_spark("hotkey20d", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
N = 20_000_000
left = spark.range(N).select(
    F.lit("hot").alias("k"),
    F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
    F.col("id").alias("lid"),
).repartition(64)
right = spark.range(N).select(
    F.lit("hot").alias("k"),
    F.timestamp_seconds(F.lit(1700000000) + F.col("id") - F.lit(1)).alias("ts"),
    F.col("id").alias("rid"),
).repartition(64)

def run(tb):
    j = asof_join(left, right, "k", tiebreak="rid", time_bucket=tb)
    t0 = time.perf_counter()
    row = j.agg(
        F.count("r_rid").alias("n"),
        F.sum(F.xxhash64("r_rid").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return row["n"], row["h"], round(time.perf_counter() - t0, 2)

results = []
for label, tb in [("single-window", None), ("bucketed 24h", "24 hours"),
                  ("single-window", None), ("bucketed 24h", "24 hours")]:
    n, h, s = run(tb)
    results.append((label, n, h, s))
    print(f"{label:15s} matched={n} checksum={h} secs={s}", flush=True)
assert len({(n, h) for _, n, h, _ in results}) == 1, "paths disagree!"
spark.stop()
