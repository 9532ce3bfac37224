#!/usr/bin/env python
"""Round-9 optimization harness (bench.py is FROZEN; this file is the
builder's own instrumentation per the optimization guide §1).

Modes:
  --plans [names...]   write .explain("formatted") for declared bench
                       queries to plans/r09/<query>_<tag>.txt
  --time name [...]    noop-sink isolated timing of named queries at
                       $SPARK_GRAFT_SF_DIR (default sf1.0), best-of-2 with
                       adaptive third — the same protocol bench.py uses,
                       without the full-suite run.

Timing uses the same session profile as bench.py (local[$SPARK_GRAFT_CPUS],
shuffle_partitions=2*cpus) so numbers are comparable to BENCH_r08.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

# queries bench.py times (the per-query part of the frozen contract)
BENCH_QUERIES = [
    "cep_binding_events",
    "contamination_hits",
    "interval_join_events",
    "salted_agg_events",
    "dedup_exact_docs",
    "minhash_pairs_docs",
    "dedup_keeplist_docs",
    "simhash_near_docs",
    "asof_join_events",
    "cep_loop_events",
    "cep_final_loop_events",
    "cep_contiguous_events",
    "cep_rows_events",
    "dup_span_docs",
    "cep_cross_events",
    "embedding_topk",
    "semdedup_embeddings",
    "unigram_logprob_docs",
    "pricing_summary",
    "pack_docs",
    "stream_dedup_events",
]


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _session():
    from rtfproc_spark.session import get_spark

    spark = get_spark(
        "rtfproc-bench-extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS * 2
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    entry_mod._ensure_pkg_on_executors(spark)
    return spark, entry_mod


def write_plans(names, tag: str):
    spark, entry_mod = _session()
    qdefs = entry_mod.queries()
    outdir = os.path.join(REPO, "plans", "r09")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        if name.startswith("stream_"):
            continue  # streaming queries have no batch explain
        try:
            df = qdefs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # fall back to the public API
            try:
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                plan = buf.getvalue()
            except Exception:
                plan = f"EXPLAIN FAILED: {e}"
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{tag}.txt", file=sys.stderr)
        from rtfproc_spark.functions.buckets import release_persisted

        release_persisted()
    spark.stop()


def time_queries(names):
    spark, entry_mod = _session()
    from rtfproc_spark.functions.buckets import release_persisted

    qdefs = entry_mod.queries()
    warm_dir = "/root/testdata/sf0.001"
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        try:
            _noop(qdefs[name](spark, warm_dir))
        except Exception:
            pass
        release_persisted()
        samples = []
        for _ in range(2):
            spark.sparkContext.setJobDescription(f"timed:{name}")
            t0 = time.perf_counter()
            _noop(qdefs[name](spark, SF_DIR))
            samples.append(time.perf_counter() - t0)
            release_persisted()
        if max(samples) > 1.2 * min(samples):
            t0 = time.perf_counter()
            _noop(qdefs[name](spark, SF_DIR))
            samples.append(time.perf_counter() - t0)
            release_persisted()
        out[name] = {
            "secs": round(min(samples), 3),
            "samples": [round(s, 3) for s in samples],
        }
        print(json.dumps({name: out[name]}), file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", action="store_true")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--time", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    names = args.names or BENCH_QUERIES
    if args.plans:
        write_plans(names, args.tag)
    elif args.time:
        time_queries(names)
    else:
        ap.error("pass --plans or --time")
