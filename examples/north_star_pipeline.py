#!/usr/bin/env python
"""End-to-end north-star pipeline (BASELINE.json north_rule), runnable demo:

  synthetic transcript stream (multiple micro-batches)
    -> per-turn RTF strip+replace (vectorized pandas UDF)
    -> exactly-once idempotent sink (kill/resume midway)
    -> session-window aggregation under a watermark
    -> stateful user-vs-assistant interval join
    -> per-conversation stateful tracker (applyInPandasWithState)
  with per-batch metrics and per-partition lineage reported at the end.

Usage: python examples/north_star_pipeline.py [workdir]
"""

from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from rtfproc_spark.session import get_spark  # noqa: E402
from rtfproc_spark.sources.transcripts import (  # noqa: E402
    DEFAULT_REPLACEMENTS,
    synthesize_transcripts_pdf,
)
from rtfproc_spark.streaming.metrics import ProgressListener, partition_metrics  # noqa: E402
from rtfproc_spark.streaming.pipeline import (  # noqa: E402
    run_extract_to_sink,
    stream_transcripts,
    streaming_user_assistant_join,
    windowed_turn_counts,
)
from rtfproc_spark.streaming.sink import IdempotentSink, read_sink  # noqa: E402
from rtfproc_spark.streaming.stateful import conversation_tracker  # noqa: E402


def main(workdir: str = "/tmp/north_star_demo") -> None:
    shutil.rmtree(workdir, ignore_errors=True)
    src = os.path.join(workdir, "src")
    os.makedirs(src)
    spark = get_spark("north-star", streaming_rocksdb=True)
    spark.sparkContext.setLogLevel("ERROR")
    entry_mod._ensure_pkg_on_executors(spark)
    listener = ProgressListener(os.path.join(workdir, "progress.jsonl"))
    spark.streams.addListener(listener)

    # --- source: 3 micro-batch files; the last arrives after a "crash"
    pdf = synthesize_transcripts_pdf(n_convs=40, turns_per_conv=5)
    convs = sorted(pdf["conv_id"].unique())
    thirds = [convs[i::3] for i in range(3)]
    for i, cs in enumerate(thirds):
        pdf[pdf["conv_id"].isin(cs)].to_parquet(f"{src}/b{i}.parquet", index=False)
    late_file = f"{src}/b2.parquet"
    held = os.path.join(workdir, "held.parquet")
    shutil.move(late_file, held)

    # --- extraction -> exactly-once sink, phase 1
    sink_path = os.path.join(workdir, "sink")
    ckpt = os.path.join(workdir, "ckpt")
    sink = IdempotentSink(sink_path)
    q = run_extract_to_sink(spark, src, sink, ckpt, DEFAULT_REPLACEMENTS)
    q.awaitTermination(300)
    n1 = read_sink(spark, sink_path).count()
    print(f"[phase 1] sink rows after 2 batches: {n1}")

    # --- crash/resume: new data arrives, restart from the SAME checkpoint
    shutil.move(held, late_file)
    q2 = run_extract_to_sink(spark, src, IdempotentSink(sink_path), ckpt, DEFAULT_REPLACEMENTS)
    q2.awaitTermination(300)
    merged = read_sink(spark, sink_path)
    n2 = merged.count()
    dupes = merged.groupBy("conv_id", "turn_idx").count().filter("count>1").count()
    print(f"[phase 2] resumed: {n2} rows (expected {len(pdf)}), dupes={dupes}")
    assert n2 == len(pdf) and dupes == 0

    # --- windows + join + tracker over the same stream definition
    stream = stream_transcripts(spark, src, max_files_per_trigger=1)
    extracted = stream.withColumn("n_text_bytes", F.length("text"))
    sessions = windowed_turn_counts(extracted, kind="session", watermark="10 minutes")
    qs = (
        sessions.writeStream.format("memory").queryName("ns_sessions")
        .outputMode("append").option("checkpointLocation", f"{workdir}/ckpt_sess")
        .trigger(availableNow=True).start()
    )
    # serialize the starts: concurrent planning of several Python-stateful
    # streaming queries in one JVM can hit a PythonSQLMetrics NPE race
    qs.awaitTermination(300)
    joined = streaming_user_assistant_join(stream_transcripts(spark, src, 1))
    qj = (
        joined.writeStream.format("memory").queryName("ns_join")
        .outputMode("append").option("checkpointLocation", f"{workdir}/ckpt_join")
        .trigger(availableNow=True).start()
    )
    qj.awaitTermination(300)
    # idle_timeout_ms=None: pending processing-time timers keep a bounded
    # availableNow replay spinning empty micro-batches until the timeout
    tracked = conversation_tracker(stream_transcripts(spark, src, 1), idle_timeout_ms=None)
    qt = (
        tracked.writeStream.format("memory").queryName("ns_track")
        .outputMode("append").option("checkpointLocation", f"{workdir}/ckpt_trk")
        .trigger(availableNow=True).start()
    )
    qt.awaitTermination(300)
    print("[phase 3] closed sessions:", spark.sql("select count(*) n from ns_sessions").first()["n"])
    print("[phase 3] user->assistant pairs:", spark.sql("select count(*) n from ns_join").first()["n"])
    print("[phase 3] tracked turns:", spark.sql("select count(*) n from ns_track").first()["n"])

    # --- lineage + metrics
    pm = partition_metrics(spark.read.parquet(src)).collect()
    print(f"[lineage] {len(pm)} partitions, rows={sum(r['rows'] for r in pm)}")
    import time

    time.sleep(3)  # listener delivery is async
    batches = len(listener.progress)
    dropped = sum(p["state_rows_dropped_by_watermark"] for p in listener.progress)
    print(f"[metrics] {batches} micro-batch progress events, late rows dropped={dropped}")
    print(f"[metrics] sink batch log: {sink.metrics + IdempotentSink(sink_path).metrics}")
    with open(os.path.join(sink_path, "_metrics.jsonl")) as f:
        print("[metrics] _metrics.jsonl lines:", len(f.readlines()))
    spark.streams.removeListener(listener)
    spark.stop()
    print("NORTH-STAR PIPELINE: OK")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
