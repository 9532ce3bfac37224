"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      -> flagship: RTF extraction + session-window agg over an
                     Iceberg-shaped transcript view of sf0.001 documents.
queries()         -> one callable per implemented operator (SURVEY.md §2).
oracle_sql()      -> DuckDB-equivalent SQL for every SQL-expressible query;
                     kernel/LSH/streaming ops get rows-only checks.

Column names are aliased identically in Spark and SQL (driver hash-compares
values under sorted column names).
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_DEFAULT = "/root/testdata/sf0.001"

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _ensure_pkg_on_executors(spark: SparkSession) -> None:
    """Ship rtfproc_spark to executor Python workers (the local equivalent of
    ``spark-submit --py-files rtfproc_spark.zip``), so UDF closures unpickle
    regardless of the driver's working directory."""
    done = getattr(_ensure_pkg_on_executors, "_for", None)
    if done is spark:
        return
    zpath = os.path.join(tempfile.gettempdir(), "rtfproc_spark_pkg.zip")
    pkg = os.path.join(_REPO, "rtfproc_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, _REPO))
    spark.sparkContext.addPyFile(zpath)
    _ensure_pkg_on_executors._for = spark


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _docs_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-shaped transcripts view over the documents table: each doc is
    one turn; deterministic conv/turn/ts derivation (no wall clock)."""
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        F.concat(F.lit("conv-"), F.format_string("%06d", F.col("doc_id") % 50)).alias(
            "conv_id"
        ),
        (F.col("doc_id") / 50).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("role"),
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 2, F.lit("search")).alias("tool"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=(F.col("doc_id") * 37 % 7200).cast("double"))
        ).alias("ts"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: strip+replace every turn's RTF payload, then session-window
    aggregate turns per conversation (the north-star pipeline, batch form)."""
    from rtfproc_spark.functions.rtf import with_rtf_extract
    from rtfproc_spark.operators.windows import session_agg
    from rtfproc_spark.sources.transcripts import DEFAULT_REPLACEMENTS

    _ensure_pkg_on_executors(spark)
    t = _docs_as_transcripts(spark, SF_DEFAULT)
    x = with_rtf_extract(t, DEFAULT_REPLACEMENTS)
    return session_agg(
        x,
        "ts",
        ["conv_id"],
        "30 minutes",
        [
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("n_text_bytes").alias("text_bytes"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("n_errors"),
        ],
    ).select("conv_id", "session_start", "session_end", "n_turns", "text_bytes", "n_errors")


# --------------------------------------------------------------- queries

def _q_interval_join_events(spark, sf_dir):
    from rtfproc_spark.operators.joins import interval_join

    ev = _read(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    j = interval_join(clicks, purchases, "user_id", max_delay="INTERVAL 10 MINUTES")
    return j.select(
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("purchase_id"),
        F.col("l.user_id").alias("user_id"),
    )


def _q_salted_agg_events(spark, sf_dir):
    from rtfproc_spark.operators.skew import salted_agg

    ev = _read(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["user_id"],
        [("count", None, "n_events"), ("sum", "value", "raw_sum")],
        salt_buckets=16,
    )
    return out.select(
        "user_id", "n_events", F.round(F.col("raw_sum"), 4).alias("sum_value")
    )


def _q_dedup_exact_docs(spark, sf_dir):
    from rtfproc_spark.functions.dedup import exact_dedup_groups

    docs = _read(spark, sf_dir, "documents")
    return exact_dedup_groups(docs).select("digest", "keep_id", "n_dupes")


def _q_doc_stats(spark, sf_dir):
    """Per-doc stats + the xxhash64 fingerprint (folded in from the former
    `fingerprint_docs` row under the driver's 50-query recording cap — the
    staged-expected differential via the pure-Python XXH64 rides along as a
    join column, so BOTH functions stay independently oracled while freeing
    a slot for `dup_span_docs`). Normalization parity: Spark trim strips
    ASCII spaces, Java \\s is the ASCII class, both reproduced with
    str.strip(' ') + re."""
    import re

    import pandas as pd

    from rtfproc_spark.functions.text import fingerprint, token_count
    from rtfproc_spark.functions.xxh64 import spark_xxhash64

    local = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    fps = [spark_xxhash64(ws.sub(" ", t.strip(" ").lower())) for t in local["text"]]
    _stage_pdf(
        "fingerprint_expected",
        pd.DataFrame(
            {
                "doc_id": local["doc_id"].astype("int64"),
                "fp": pd.Series(fps, dtype="int64"),
            }
        ),
    )
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_calc"),
        token_count("text").cast("long").alias("n_tokens"),
        fingerprint("text").alias("fp"),
    )


def _q_unigram_logprob_docs(spark, sf_dir):
    """Unigram-LM quality scoring (the CCNet/Gopher perplexity-filter
    shape with the LM trained on the corpus itself): corpus token counts
    -> p(tok)=c/N -> per-doc MEAN token log-probability. Swapped in for
    `lang_quality_agg` under the 50-row cap (a plain groupBy avg whose
    machinery stays covered by `pricing_summary`/`doc_stats`). Real
    independent DuckDB oracle — same trim/lower/\\s+ tokenization, ln,
    and the round-6-before-mean quantization that makes both engines
    average identical double addends (summation-order ulp absorbed by
    the final round-4)."""
    from rtfproc_spark.functions.text import unigram_logprob

    docs = _read(spark, sf_dir, "documents")
    return unigram_logprob(docs)


def _q_cep_loop_events(spark, sf_dir):
    """Kleene-loop pattern step (round-7, the MATCH_RECOGNIZE ``A B+ C``
    gap): per-user view -> (click|signup)+ -> purchase within 2 days,
    where the loop ADVANCES the sequence — the purchase anchors after the
    loop's hops, and the loop emits its count plus FIRST/LAST binding
    measures. Independent DuckDB oracle: correlated open-interval counts
    pick the earliest eligible closer per anchor (ROW_NUMBER()=1 over
    candidates with >= min_n loop events), then correlated LIMIT-1
    subqueries rebuild the first/last measures. (Replaced the plain
    3-step cep_funnel_events row under the driver's 50-query cap — plain
    sequential steps stay driver-covered by cep_binding_events, whose
    view -> (click|signup) -> purchase pattern subsumes the funnel shape,
    and by cep_quantifier_events / cep_session_funnel_events.)

    The query is expressed through the SQL MATCH_RECOGNIZE clause front
    end (``match_recognize_sql``) so the driver oracle pins the whole
    parse-compile-match path: clause -> compile_pattern -> the SAME
    ``match_sequence`` call as the previous hand-built spec (pattern
    ``S+?`` = reluctant loop, the hand-built LoopStep's default; the
    loop var S derives the same ``s`` measure names).  The MEASURES
    section reproduces the matcher's full frame AND adds PAYLOAD
    measures — ``MIN/MAX(S.value)`` aggregated over the loop's bound
    hops (explode + join-back via operators/measures.loop_measures;
    order-independent aggregates, so doubles compare hash-exact) and the
    closer's ``P.value`` (a per-row id join-back) — pinning the round-7
    payload-measures path against an independent DuckDB oracle."""
    from rtfproc_spark.operators.pattern import match_recognize_sql

    ev = _read(spark, sf_dir, "events")
    return match_recognize_sql(ev, """
        MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts
          MEASURES V.ts AS ts_1, V.event_id AS id_1, COUNT(S.*) AS n_s,
                   FIRST(S.ts) AS first_s_ts,
                   FIRST(S.event_id) AS first_s_id,
                   LAST(S.ts) AS last_s_ts, LAST(S.event_id) AS last_s_id,
                   P.ts AS ts_3, P.event_id AS id_3,
                   MIN(S.value) AS s_value_min, MAX(S.value) AS s_value_max,
                   P.value AS purchase_value
          PATTERN (V S+? P)
          WITHIN INTERVAL '2' DAY
          DEFINE V AS event_type = 'view',
                 S AS event_type IN ('click', 'signup'),
                 P AS event_type = 'purchase'
        )""")


def _q_cep_session_funnel_events(spark, sf_dir):
    """Session-bounded CEP funnel (the product-analytics form): per-user
    view -> purchase where the pattern must complete inside one SESSION
    (sessions split after 2 quiet hours — any event keeps a session
    alive), via match_sequence_sessionized. The query runs the TWO-PHASE
    ``time_bucket`` labeling path — the hot-key mitigation whose
    (key, bucket) partitioning bounds per-task work — with the bucket
    chosen by ``suggest_time_bucket``'s measured decision rule, its
    thresholds scaled to the test SF so the bucketed machinery (not the
    single-window fallback) is what the oracle pins; at production scale
    the defaults (5M-row crossover) apply unchanged and the two forms are
    equality-pinned. Independent DuckDB oracle: lag + running-sum
    sessionization, then the ROW_NUMBER()=1 earliest-pick funnel keyed by
    (user_id, session_id). (Replaced the simhash_docs signature row under
    the driver's 50-query cap — SimHash signatures stay pinned through
    simhash_near_docs, whose staged brute-force expected recomputes every
    signature locally, and by the pytest kernel differentials.)"""
    from rtfproc_spark.operators.cep import match_sequence_sessionized
    from rtfproc_spark.operators.joins import suggest_time_bucket

    ev = _read(spark, sf_dir, "events")
    bucket = suggest_time_bucket(
        ev, "user_id", "ts", target_rows_per_bucket=25, crossover=50
    )
    return match_sequence_sessionized(
        ev,
        [F.col("event_type") == "view", F.col("event_type") == "purchase"],
        ["user_id"],
        gap="2 hours",
        time_col="ts",
        id_col="event_id",
        time_bucket=bucket,
    ).select(
        "user_id",
        "session_id",
        "ts_1",
        "id_1",
        "ts_2",
        "id_2",
    )


def _q_pricing_summary(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_embedding_topk(spark, sf_dir):
    from rtfproc_spark.functions.similarity import brute_force_topk

    emb = _read(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return brute_force_topk(emb, qvec, k=10)


def _q_rtf_passthrough_docs(spark, sf_dir):
    from rtfproc_spark.functions.rtf import with_rtf_extract
    from rtfproc_spark.sources.transcripts import DEFAULT_REPLACEMENTS

    docs = _read(spark, sf_dir, "documents")
    return with_rtf_extract(docs, DEFAULT_REPLACEMENTS).select(
        "doc_id", "rtf_out", "plain_text", "error"
    )


def _stage_rtf_extract_expected() -> None:
    """Stage the pure-kernel expected outputs for the flagship corpus (the
    Spark analogue of the reference's golden-file diff,
    /root/reference/Makefile:74-86). Deterministic; staged once per
    process."""
    import pandas as pd

    from rtfproc_spark.kernel import ReplacementSet, RTFEngine
    from rtfproc_spark.sources.transcripts import (
        DEFAULT_REPLACEMENTS,
        synthesize_transcripts_pdf,
    )

    marker = f"{_STAGE}/rtf_extract_expected/_STAGED_OK"
    if os.path.exists(marker):
        return
    pdf = synthesize_transcripts_pdf(n_convs=60, turns_per_conv=5)
    eng = RTFEngine(ReplacementSet(DEFAULT_REPLACEMENTS))
    outs, plains, errs, nb = [], [], [], []
    for t in pdf["text"]:
        rtf_b, plain_b, err = eng.run(t.encode("utf-8"))
        outs.append(rtf_b.decode("utf-8", errors="replace"))
        plains.append(plain_b.decode("utf-8", errors="replace"))
        errs.append(err)
        nb.append(len(plain_b))
    expected = pd.DataFrame(
        {
            "conv_id": pdf["conv_id"],
            "turn_idx": pdf["turn_idx"].astype("int32"),
            "role": pdf["role"],
            "rtf_out": outs,
            "plain_text": plains,
            # explicit string dtype: an all-null object column would be
            # staged as a typeless NULL column and read back as DOUBLE
            "error": pd.array(errs, dtype="string"),
            "n_text_bytes": pd.Series(nb, dtype="int32"),
        }
    )
    _stage_pdf("rtf_extract_expected", expected)
    with open(marker, "w") as fh:
        fh.write("ok")


def _q_rtf_extract_transcripts(spark, sf_dir):
    """Flagship extraction with a TRUE differential oracle: the expected
    (rtf_out, plain_text, error) per turn is computed driver-side by the
    pure kernel (no Spark) over the same deterministic corpus and staged to
    parquet."""
    from rtfproc_spark.functions.rtf import with_rtf_extract
    from rtfproc_spark.sources.transcripts import (
        DEFAULT_REPLACEMENTS,
        synthesize_transcripts_df,
    )

    _stage_rtf_extract_expected()
    t = synthesize_transcripts_df(spark, n_convs=60, turns_per_conv=5)
    return with_rtf_extract(t, DEFAULT_REPLACEMENTS).select(
        "conv_id", "turn_idx", "role", "rtf_out", "plain_text", "error", "n_text_bytes"
    )


def _q_rtf_strip_transcripts(spark, sf_dir):
    """The single-output strip kernel (rtf_strip_col: half the Arrow
    transfer, no struct assembly) against its own pure-kernel expected
    plain_text (keyless engine, matching strip semantics exactly) — covers
    the narrow-projection UDF surface pipelines use when only stripped text
    is needed."""
    import pandas as pd

    from rtfproc_spark.functions.rtf import rtf_strip_col
    from rtfproc_spark.kernel import RTFEngine, empty_replacements
    from rtfproc_spark.sources.transcripts import (
        synthesize_transcripts_df,
        synthesize_transcripts_pdf,
    )

    marker = f"{_STAGE}/rtf_strip_expected/_STAGED_OK"
    if not os.path.exists(marker):
        pdf = synthesize_transcripts_pdf(n_convs=60, turns_per_conv=5)
        eng = RTFEngine(empty_replacements())
        plains = [
            eng.run(t.encode("utf-8"))[1].decode("utf-8", errors="replace")
            for t in pdf["text"]
        ]
        expected = pd.DataFrame(
            {
                "conv_id": pdf["conv_id"],
                "turn_idx": pdf["turn_idx"].astype("int32"),
                "plain_text": plains,
            }
        )
        _stage_pdf("rtf_strip_expected", expected)
        with open(marker, "w") as fh:
            fh.write("ok")
    t = synthesize_transcripts_df(spark, n_convs=60, turns_per_conv=5)
    return t.select(
        "conv_id", "turn_idx", rtf_strip_col("text").alias("plain_text")
    )


_STAGE = "/tmp/rtfproc_oracle_stage"


def _stage(spark, name: str, df) -> "DataFrame":
    """Write a deterministic frame to a stage dir both engines read: the
    Spark query aggregates the STAGED data and the DuckDB oracle reads the
    same files, so the value check covers the aggregation exactly."""
    path = f"{_STAGE}/{name}"
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _parquet_nrows(path: str) -> int:
    """Row count from parquet FOOTER metadata only — gating oracle staging
    on corpus size must not read the data pages (at bench scale a full
    pandas read of documents.parquet lands inside the timed region).
    Accepts a single file or a Spark-style directory of part files."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
            for root, _, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def _stage_pdf(name: str, pdf) -> str:
    """Stage a DRIVER-COMPUTED pandas frame (no Spark involved) — used for
    expected outputs computed by an independent local implementation (the
    pure kernel / plain numpy), making the driver check a true
    distributed-vs-local differential."""
    import shutil

    path = f"{_STAGE}/{name}"
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    pdf.to_parquet(f"{path}/part-0.parquet", index=False)
    return path


def _staged_transcripts(spark):
    from rtfproc_spark.sources.transcripts import synthesize_transcripts_df

    t = synthesize_transcripts_df(spark, n_convs=60, turns_per_conv=5)
    return _stage(spark, "transcripts", t.select("conv_id", "turn_idx", "role", "ts"))


def _q_session_transcripts(spark, sf_dir):
    from rtfproc_spark.functions.rtf import with_rtf_extract
    from rtfproc_spark.operators.windows import session_agg
    from rtfproc_spark.sources.transcripts import (
        DEFAULT_REPLACEMENTS,
        synthesize_transcripts_df,
    )

    t = synthesize_transcripts_df(spark, n_convs=60, turns_per_conv=5)
    x = with_rtf_extract(t, DEFAULT_REPLACEMENTS).select(
        "conv_id", "ts", "n_text_bytes"
    )
    staged = _stage(spark, "session_input", x)
    return session_agg(
        staged,
        "ts",
        ["conv_id"],
        "30 minutes",
        [
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("n_text_bytes").alias("text_bytes"),
        ],
    ).select("conv_id", "session_start", "session_end", "n_turns", "text_bytes")


def _q_cep_contiguous_events(spark, sf_dir):
    """STRICT-CONTIGUITY funnel (round-7's `contiguous=True` — Flink's
    next() / MATCH_RECOGNIZE's default adjacency): per-user
    view -> click -> purchase within 12 hours where every step must be
    matched by the key's very NEXT event — any intervening event of ANY
    type kills the attempt. Independent DuckDB oracle: relaxed
    earliest-candidate picks (ROW_NUMBER()=1) with a NOT EXISTS
    any-event-strictly-between kill per strict step — the same post-hoc
    formulation the batch operator's left-anti join uses, itself provably
    equal to the sequential next-event rule. (Replaced the
    `user_assistant_join` batch row under the driver's 50-query cap —
    B7 interval-join coverage stays on `interval_join_events` and the
    streaming twin `stream_user_assistant_join`; the library function
    also stays exercised by bench.py's ua_join and the stream tests.)"""
    from rtfproc_spark.operators.cep import match_sequence

    ev = _read(spark, sf_dir, "events")
    return match_sequence(
        ev,
        steps=[
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        key_cols=["user_id"],
        time_col="ts",
        id_col="event_id",
        within="12 hours",
        contiguous=True,
    )


def _q_minhash_pairs_docs(spark, sf_dir):
    """MinHash-LSH candidate pairs with a staged-expected differential: the
    expected (id_a, id_b, jaccard) set is re-derived driver-side by a pure
    Python/XXH64 implementation (minhash_pairs_local — no Spark, no JVM;
    the XXH64 itself is pinned literal-for-literal against Spark's
    xxhash64 by tests/test_entry_oracles.py) over the same parquet, so the
    driver check proves the whole distributed LSH pipeline — shingling,
    signature, banding, bucket pruning, self-join, exact verification —
    matches an independent local re-derivation exactly. Staging is gated to
    small corpora (the pure-Python side is O(docs x shingles x hashes));
    the bench at sf0.1 runs the Spark side only."""
    import pandas as pd

    from rtfproc_spark.functions.dedup import minhash_candidates, minhash_pairs_local

    if _parquet_nrows(f"{sf_dir}/documents.parquet") <= 1000:
        local = pd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        _stage_pdf("minhash_pairs_expected", minhash_pairs_local(local))
    docs = _read(spark, sf_dir, "documents")
    return minhash_candidates(docs)


def _q_dedup_keeplist_docs(spark, sf_dir):
    """End-to-end near-dedup policy: minhash-LSH pairs -> connected
    components (iterative min-label propagation, the distributed clustering
    step) -> keep-one-per-cluster list over ALL documents. Staged-expected
    differential: the local side re-derives the pair set with the pure
    XXH64 pipeline (minhash_pairs_local) and clusters it with a plain
    union-find — completely independent of the Spark label-propagation
    loop, so a pass proves pair generation AND component convergence AND
    the keep policy exactly."""
    import pandas as pd

    from rtfproc_spark.functions.dedup import (
        dedup_keep_list,
        minhash_candidates,
        minhash_pairs_local,
    )

    if _parquet_nrows(f"{sf_dir}/documents.parquet") <= 1000:
        local = pd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        exp_pairs = minhash_pairs_local(local)
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(exp_pairs["id_a"], exp_pairs["id_b"]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        members: dict[int, list[int]] = {}
        for x in set(parent) | set(exp_pairs["id_a"]) | set(exp_pairs["id_b"]):
            members.setdefault(find(int(x)), []).append(int(x))
        comp_of = {
            m: min(ms) for r, ms in members.items() for m in ms
        }
        ids = [int(i) for i in local["doc_id"]]
        comps = [comp_of.get(i, i) for i in ids]
        expected = pd.DataFrame(
            {
                "id": pd.Series(ids, dtype="int64"),
                "component": pd.Series(comps, dtype="int64"),
                "keep": pd.Series([i == c for i, c in zip(ids, comps)], dtype="bool"),
            }
        )
        _stage_pdf("dedup_keeplist_expected", expected)
    docs = _read(spark, sf_dir, "documents")
    return dedup_keep_list(docs, minhash_candidates(docs))


def _q_trending_events(spark, sf_dir):
    """Trending detection — the classic CEP reporting query: top-3 event
    types per 15-minute tumbling window by event count (ties broken by
    type), with each type's share of the window's traffic. Exercises
    window bucketing + two-level aggregation + ranked window function in
    one plan; exact DuckDB oracle."""
    from pyspark.sql.window import Window

    ev = _read(spark, sf_dir, "events")
    counts = (
        ev.groupBy(
            F.window(F.col("ts"), "15 minutes").alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    tot = Window.partitionBy("window_start")
    rk = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    return (
        counts.withColumn(
            "share", F.round(F.col("n_events") / F.sum("n_events").over(tot), 4)
        )
        .withColumn("rk", F.row_number().over(rk).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("window_start", "event_type", "n_events", "share", "rk")
    )


def _q_cep_cross_events(spark, sf_dir):
    """Cross-variable DEFINE references (round-8 surface — round 7's
    top-ranked gap): per-user view -> click -> purchase within 2 days
    where the PURCHASE's DEFINE references the bound VIEW row's payload
    (``P AS value > V.value`` — MATCH_RECOGNIZE's last-matched-row
    semantics, Flink's IterativeCondition). A purchase candidate failing
    the comparison is SKIPPED and the next candidate tried (per-candidate
    evaluation inside the step's join — the behavior that distinguishes a
    cross-variable engine from a WHERE clause on completed matches). Runs
    the FULL SQL clause front end: PATTERN/DEFINE parse -> CrossPred
    lowering -> payload capture riding the earlier step's min(struct).
    (Replaced cep_quantifier_events under the driver's 50-query cap: the
    optional quantifier keeps its plan pin + the fuzzer's opt dimension +
    pytest, and CountBetween keeps its driver oracle via
    cep_binding_events.) Oracle: independent DuckDB ROW_NUMBER()=1
    candidate picks with the value comparison as a predicate on the
    purchase candidate set."""
    from rtfproc_spark.operators.pattern import match_recognize_sql

    ev = _read(spark, sf_dir, "events")
    return match_recognize_sql(ev, """
        MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts
          PATTERN (V C P)
          WITHIN INTERVAL '2' DAY
          DEFINE V AS event_type = 'view',
                 C AS event_type = 'click',
                 P AS event_type = 'purchase' AND value > V.value
        )""")


def _q_cep_quantifier_events(spark, sf_dir):
    """CEP pattern quantifiers (MATCH_RECOGNIZE's `A B? C` plus a bounded
    loop expressed as a count): per-user view -> click? -> purchase within
    12 hours, where the optional click is TAKEN iff the earliest click
    after the view precedes the earliest purchase (deterministic
    no-lookahead greedy — the rule the streaming twin can honor in-order),
    and at most 2 error events strictly between the view and the purchase
    (CountBetween, emitted as n_err). (Replaced the window-rank demo
    top_events_per_user under the driver's 50-query recording cap —
    per-partition window top-k stays covered by trending_events — because
    pattern quantifiers are north-rule CEP surface and a second plain
    top-k was not.) Oracle: independent DuckDB ROW_NUMBER()=1 candidate
    picks + a correlated count subquery."""
    from rtfproc_spark.operators.cep import CountBetween, match_sequence

    ev = _read(spark, sf_dir, "events")
    return match_sequence(
        ev,
        steps=[
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        key_cols=["user_id"],
        time_col="ts",
        id_col="event_id",
        within="12 hours",
        optional_steps={2},
        counts=[
            CountBetween(
                pred=F.col("event_type") == "error",
                value="error",
                lo_step=1,
                hi_step=3,
                min_n=0,
                max_n=2,
                name="err",
            )
        ],
    )


def _q_cep_binding_events(spark, sf_dir):
    """CEP alternation + binding loop (round-6 surface): per-user
    view -> (click | signup) -> purchase within 12 hours, where branch_2
    records WHICH alternative matched (MATCH_RECOGNIZE CLASSIFIER()), and
    the error events strictly between the view and the purchase form a
    BINDING loop (CountBetween bind=True): at most 2, with the loop's
    FIRST/LAST hop (ts, id) emitted as measures — the MATCH_RECOGNIZE
    ``B{0,2}`` with ``FIRST(B.ts)/LAST(B.id)`` shape. (Replaced the plain
    tumbling_events window row under the driver's 50-query cap —
    tumbling windows stay covered by stream_resume_tumbling, which runs
    the same window oracle through a real crash/resume stream.) Oracle:
    DuckDB ROW_NUMBER candidate picks over the unioned alternation
    branches + correlated first/last subqueries."""
    from rtfproc_spark.operators.cep import CountBetween, match_sequence

    ev = _read(spark, sf_dir, "events")
    return match_sequence(
        ev,
        steps=[
            F.col("event_type") == "view",
            [F.col("event_type") == "click", F.col("event_type") == "signup"],
            F.col("event_type") == "purchase",
        ],
        key_cols=["user_id"],
        time_col="ts",
        id_col="event_id",
        within="12 hours",
        counts=[
            CountBetween(
                pred=F.col("event_type") == "error",
                value="error",
                lo_step=1,
                hi_step=3,
                min_n=0,
                max_n=2,
                name="err",
                bind=True,
            )
        ],
    )


def _q_rollup_revenue(spark, sf_dir):
    # rollup over (mktsegment, orderpriority): grouping-set aggregation
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .rollup("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def _q_asof_join_events(spark, sf_dir):
    """As-of join through the HOT-KEY-SAFE two-phase path: time_bucket=
    splits each key's timeline across (key, day-bucket) window tasks with
    cross-bucket carry-forward — same output as the single-window form
    (equality pinned by tests/test_pipeline_functions.py::
    test_asof_join_hot_key and the hypothesis differential), so the DuckDB
    nearest-at-or-before oracle pins the bucketed plan end-to-end."""
    from rtfproc_spark.operators.joins import asof_join

    ev = _read(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    j = asof_join(
        purchases,
        clicks,
        "user_id",
        "ts",
        "ts",
        "backward",
        tiebreak="event_id",
        time_bucket="1 day",
    )
    return j.select(
        F.col("event_id").alias("purchase_id"),
        F.col("r_event_id").alias("click_id"),
    )


def _q_cep_final_loop_events(spark, sf_dir):
    """FINAL-position Kleene loop — `view click+` with NO closer event:
    the loop closes at the anchor horizon (12 h), min_n=2 filters short
    runs and max_n=4 caps the bound measures (first/last hop), so the
    row exercises both the horizon-closed count and the cap's first-k
    selection. DuckDB oracle: horizon range join + ROW_NUMBER/COUNT
    window, HAVING on the uncapped count, LEAST-capped measure picks.
    (Replaced `event_tracker` under the driver's 50-query recording cap
    — its running-count window surface stays covered by
    `conversation_tracker` and both stream tracker twins, which pin the
    same per-key running aggregation through the stateful path.)"""
    from rtfproc_spark.operators.cep import LoopStep, match_sequence

    ev = _read(spark, sf_dir, "events")
    return match_sequence(
        ev,
        steps=[
            F.col("event_type") == "view",
            LoopStep(
                pred=F.col("event_type") == "click",
                min_n=2, max_n=4, bind=True, name="c",
            ),
        ],
        key_cols=["user_id"],
        within="12 hours",
    )


def _q_simhash_near_docs(spark, sf_dir):
    """SimHash near-pairs with a staged-expected oracle: the block-
    permutation candidate trick is EXACT for max_hamming < blocks
    (pigeonhole), so the driver-side numpy brute force over all pairs is a
    legitimate independent ground truth — a pass proves the distributed
    bucketing loses nothing."""
    import numpy as np
    import pandas as pd

    from rtfproc_spark.functions.dedup import simhash_batch, simhash_near_pairs

    # the O(n^2) expected matrix is for the sf0.01 oracle gate; at bench
    # scale only the Spark query is timed (footer-metadata row count: the
    # gate itself must not pandas-read the corpus inside the timed region)
    if _parquet_nrows(f"{sf_dir}/documents.parquet") <= 2000:
        local = pd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        sigs = simhash_batch(local["text"]).astype(np.uint64)
        ids = local["doc_id"].to_numpy()
        x = np.bitwise_xor.outer(sigs, sigs)
        # popcount via 8-bit table over the bytes of the XOR matrix
        tbl = np.array([bin(v).count("1") for v in range(256)], dtype=np.uint8)
        ham = tbl[x.view(np.uint8).reshape(len(ids), len(ids), 8)].sum(axis=2)
        ia, ib = np.where(np.triu(ham <= 3, k=1))
        lo, hi = np.minimum(ids[ia], ids[ib]), np.maximum(ids[ia], ids[ib])
        expected = pd.DataFrame(
            {
                "id_a": lo.astype("int64"),
                "id_b": hi.astype("int64"),
                "hamming": ham[ia, ib].astype("int32"),
            }
        )
        _stage_pdf("simhash_near_expected", expected)
    docs = _read(spark, sf_dir, "documents")
    return simhash_near_pairs(docs, max_hamming=3).select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


def _staged_neardup_docs(spark, sf_dir):
    """Planted near-duplicate corpus: 200 real documents (whitespace-
    normalized so the oracle can split on single spaces) + one lightly
    mutated copy of every 5th doc, so the pair set above the Jaccard
    threshold is non-trivial and exactly computable by the oracle."""
    import random

    import pandas as pd

    base = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    base = base.sort_values("doc_id").head(200)
    rng = random.Random(7)
    rows = []
    for r in base.itertuples(index=False):
        rows.append((int(r.doc_id), " ".join(str(r.text).split())))
    planted = []
    for did, text in rows[::5]:
        words = text.split()
        if len(words) < 40:
            continue  # short docs: one mutation moves Jaccard near threshold
        w2 = list(words)
        # mutate ~1 word per 80, deterministic positions
        step = 80
        for pos in range(step // 2, len(w2), step):
            w2[pos] = f"mut{did}x{pos}"
        planted.append((100_000 + did, " ".join(w2)))
    pdf = pd.DataFrame(rows + planted, columns=["doc_id", "text"])
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    path = _stage_pdf("neardup_docs", pdf)
    return spark.read.parquet(path)


def _q_ngram_jaccard_docs(spark, sf_dir):
    """Exact n-gram Jaccard pairs over the planted corpus, LSH-pruned with
    16 single-hash bands (recall 1-(1-j)^16 — effectively exhaustive for
    j >= 0.8), verified exactly; the DuckDB oracle computes the same set
    Jaccard over ALL pairs, so a pass proves both full recall on this corpus
    and exact verification math."""
    from rtfproc_spark.functions.dedup import ngram_jaccard_pairs

    docs = _staged_neardup_docs(spark, sf_dir)
    return ngram_jaccard_pairs(
        docs, threshold=0.8, num_hashes=16, bands=16, max_bucket=100_000
    )


def _staged_neardup_embeddings(spark, sf_dir):
    """Planted near-duplicate embeddings: the real table (which has NO pair
    above cosine 0.52 at sf0.01 — a 0-row check would be vacuous) plus a
    perturbed copy of every 12th vector at cosine ~0.97."""
    import numpy as np
    import pandas as pd

    base = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    rng = np.random.RandomState(7)
    rows = [(int(r.vec_id), list(r.embedding)) for r in base.itertuples(index=False)]
    for vid, emb in rows[::12]:
        v = np.asarray(emb, dtype=np.float64)
        nv = np.linalg.norm(v)
        noise = rng.randn(v.size)
        noise -= noise.dot(v) / (nv * nv) * v  # orthogonal component only
        noise *= 0.25 * nv / np.linalg.norm(noise)  # cos = 1/sqrt(1+0.25^2) ~ .970
        rows.append((100_000 + vid, (v + noise).astype(np.float32).tolist()))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    pdf["vec_id"] = pdf["vec_id"].astype("int64")
    import pyarrow as pa

    tbl = pa.Table.from_pandas(
        pdf, schema=pa.schema([("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))])
    )
    import shutil

    path = f"{_STAGE}/neardup_embeddings"
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    import pyarrow.parquet as pq

    pq.write_table(tbl, f"{path}/part-0.parquet")
    return spark.read.parquet(path)


def _q_embedding_near_pairs(spark, sf_dir):
    """Embedding near-dup pairs over the planted corpus via multi-band
    hyperplane LSH (20 banks x 12 bits: recall ~1-8e-5 per pair at cosine
    0.97), exact-cosine verified; the oracle computes ALL pairs >= threshold
    by brute force, so a pass proves recall AND precision on this corpus."""
    from rtfproc_spark.functions.similarity import all_pairs_near

    emb = _staged_neardup_embeddings(spark, sf_dir)
    return all_pairs_near(emb, threshold=0.95, bits=12, bands=20, dim=64)


def _q_semdedup_embeddings(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): semantic near-dedup by k-means
    clustering + within-cluster exact cosine + connected components + keep
    the min-id representative (similarity.semantic_dedup). Swapped in for
    `lang_id_docs` under the 50-row cap — lang_id/quality_score/
    token_count stay driver-oracled per-doc inside `training_set_docs`.

    Staged-expected differential: centroids are the deterministic
    driver-side k-means artifact (same posture as `ivf_topk`), and the
    whole expected frame is re-derived locally by `semantic_dedup_local` —
    assignment through the shared per-dimension fold (bit-identical to the
    executor UDF), cosines as Spark's sequential aggregate fold with
    HALF_UP round-4, and a union-find in place of the distributed
    min-label propagation, so the clustering step is independently
    derived."""
    import numpy as np
    import pandas as pd

    from rtfproc_spark.functions.similarity import (
        kmeans_fit_local,
        semantic_dedup,
        semantic_dedup_local,
    )

    local = pd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    X = np.stack([np.asarray(v, dtype=np.float64) for v in local["embedding"]])
    centroids = kmeans_fit_local(X, nlist=16, seed=42)
    if len(local) <= 1500:
        # the pure-Python expected is quadratic-within-cluster — stage it
        # at the driver's correctness scale (sf0.01, 500 vectors) only;
        # bench at sf0.1 never consults the oracle and must time the
        # distributed path, not 1.5M Python fold_dot calls
        expected = semantic_dedup_local(
            local["vec_id"].tolist(), X, centroids, threshold=0.35
        )
        _stage_pdf("semdedup_expected", expected)

    emb = _read(spark, sf_dir, "embeddings")
    out = semantic_dedup(emb, centroids, threshold=0.35)
    return out.select(
        "vec_id", F.col("cluster").cast("long").alias("cluster"), "keep", "rep_id"
    )


def _feat_digest_col():
    # array<float> features -> deterministic scalar digest (drivers/oracles
    # hash scalar cells; raw lists are unhashable). Feature values are
    # k/1000 for integer k, so round(x*1000) is exact on both engines.
    return F.when(F.col("features").isNull(), F.lit(None).cast("string")).otherwise(
        F.md5(
            F.encode(
                F.concat_ws(
                    ",",
                    F.transform(
                        "features",
                        lambda x: F.round(x.cast("double") * 1000).cast("int").cast("string"),
                    ),
                ),
                "utf-8",
            )
        )
    )


def _q_bpe_tokens_docs(spark, sf_dir):
    """BPE-ish token counting with a staged-expected oracle: the same
    ASCII-class boundary split is run driver-side with Python re over the
    same parquet (the pattern uses explicit classes so Java and Python
    regex agree), proving the distributed tokenization byte-for-byte."""
    import re as _re

    import pandas as pd

    from rtfproc_spark.functions.text import BPE_SPLIT_RE, bpe_ish_token_count

    local = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pat = _re.compile(BPE_SPLIT_RE)
    # Spark's split counts trailing empty strings away only via trim(' ');
    # mirror: strip ASCII spaces, then len(split)
    counts = [
        len(pat.split(t.strip(" "))) if t is not None else None
        for t in local["text"]
    ]
    expected = pd.DataFrame(
        {
            "doc_id": local["doc_id"].astype("int64"),
            "n_bpe_tokens": pd.Series(counts, dtype="int64"),
        }
    )
    _stage_pdf("bpe_tokens_expected", expected)
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", bpe_ish_token_count("text").cast("long").alias("n_bpe_tokens")
    )


def _q_media_decode(spark, sf_dir):
    """Multimodal decode with a staged-expected oracle: the same decoder —
    REAL pixel decode + feature extraction for PPM/PGM/BMP payloads, digest
    pseudo-features for other kinds — runs driver-side in plain pandas and
    is staged; the Spark side must reproduce it through mapInPandas across
    partitions. Features are projected as a digest (scalar) for the value
    hash."""
    import hashlib as _hl

    import pandas as pd

    from rtfproc_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        payload_features,
        synth_media_pdf,
    )

    inp = synth_media_pdf(128)
    inp.at[0, "payload"] = b""  # exercise the decode-error path
    exp_rows = []
    for r in inp.itertuples(index=False):
        b = bytes(r.payload) if r.payload is not None else b""
        try:
            feats = payload_features(b)
            digest = _hl.md5(
                ",".join(str(int(round(float(x) * 1000))) for x in feats).encode()
            ).hexdigest()
            err = None
        except NotImplementedError as e:
            digest, err = None, f"NotImplemented: {e}"
        except ValueError as e:
            digest, err = None, f"BadMedia: {e}"
        exp_rows.append(
            (
                r.media_id,
                r.kind,
                len(b),
                _hl.sha256(b).hexdigest(),
                digest,
                err,
            )
        )
    expected = pd.DataFrame(
        exp_rows,
        columns=["media_id", "kind", "n_bytes", "sha256", "feat_digest", "decode_error"],
    )
    expected["media_id"] = expected["media_id"].astype("int64")
    expected["n_bytes"] = expected["n_bytes"].astype("int32")
    expected["feat_digest"] = expected["feat_digest"].astype("string")
    expected["decode_error"] = expected["decode_error"].astype("string")
    _stage_pdf("media_expected", expected)

    df = spark.createDataFrame(inp, schema=MEDIA_SCHEMA).repartition(8)
    return decode_media(df).select(
        "media_id",
        "kind",
        "n_bytes",
        "sha256",
        _feat_digest_col().alias("feat_digest"),
        "decode_error",
    )


def _q_bucketed_conv_stats(spark, sf_dir):
    """Bucketed-ingest path end-to-end in the driver environment: the
    transcript corpus is ingested as a conv_id-bucketed+sorted table (the
    local analogue of Iceberg's bucket(conv_id) partition transform — the
    100 TB co-location story), then aggregated per conversation. The
    zero-exchange property of this plan is pinned by
    tests/test_plans.py::test_bucketed_ingest_eliminates_agg_shuffle; this
    driver check proves the bucketed WRITE+READ round-trip returns the same
    values as DuckDB over the same staged rows."""
    from rtfproc_spark.sources.transcripts import (
        synthesize_transcripts_df,
        write_transcripts_bucketed,
    )

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    write_transcripts_bucketed(
        spark, "rtf_driver_bucketed", n_buckets=4, n_convs=60, turns_per_conv=5
    )
    # stage the SAME deterministic rows for the oracle (content equals the
    # bucketed table's source; only the storage layout differs)
    t = synthesize_transcripts_df(spark, n_convs=60, turns_per_conv=5)
    _stage(spark, "bucketed_oracle_src", t.select("conv_id", "turn_idx", "role", "ts"))
    bt = spark.table("rtf_driver_bucketed")
    return bt.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias("n_user_turns"),
    )


def _q_dup_span_docs(spark, sf_dir):
    """Cross-document duplicated-span coverage (the exact-substring-dedup
    signal of Lee et al. 2022 at 5-gram granularity): flags the corpus's
    planted near-duplicate families (coverage ~1.0) plus organic shared
    spans. The DuckDB oracle recomputes the whole pipeline joining on the
    gram STRING, so the row also certifies the Spark side's
    hash-join-vs-string-join equivalence (xxhash64 collisions would
    surface as a hash mismatch). Replaced `fingerprint_docs` under the
    driver's 50-query recording cap — the fingerprint differential now
    rides along as a `doc_stats` column, so nothing lost its oracle."""
    from rtfproc_spark.functions.dedup import dup_span_stats

    docs = _read(spark, sf_dir, "documents")
    return dup_span_stats(docs, n=5, min_docs=2)


def _q_cep_rows_events(spark, sf_dir):
    """ALL ROWS PER MATCH (MATCH_RECOGNIZE's per-event output mode,
    round-7-continuation surface): the view -> click -> purchase funnel's
    match set EXPANDED to one row per bound event — full event payload,
    CLASSIFIER() (the pattern variable v/c/p), per-user MATCH_NUMBER() in
    anchor order, and the row's ordinal inside its match. (Replaced the
    video_frames row under the driver's 50-query recording cap — C18's
    multimodal plumbing stays driver-oracled via media_decode, and the
    frame arithmetic keeps its staged-oracle pytest — because the
    expansion operator is north-rule CEP surface and a second multimodal
    row was not.) Since round 8 the row runs through the FULL SQL clause
    (``match_recognize_sql``) and carries RUNNING/FINAL aggregate
    MEASURES — ``RUNNING COUNT(*)`` (the row ordinal), ``RUNNING
    SUM(c.value)`` (click value so far in the match) and ``FINAL
    SUM(c.value)`` (whole-match total on every row) — the
    window-expression rewrite over the expanded frame, previously
    pytest/DuckDB-differential-pinned only. Physically: array-build +
    explode over the (small) match set, ONE aliased equi-join back to
    events (Catalyst broadcasts the exploded side), then the per-match
    window pass. Oracle: independent DuckDB funnel (ROW_NUMBER()=1
    candidate picks), DENSE_RANK match numbering, UNION ALL expansion,
    join back to events, and the measures as DuckDB window functions
    over (user_id, match_no) ordered by row_in_match."""
    from rtfproc_spark.operators.pattern import match_recognize_sql

    ev = _read(spark, sf_dir, "events")
    out = match_recognize_sql(ev, """
        MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts
          MEASURES RUNNING COUNT(*) AS rn_running,
                   RUNNING SUM(c.value) AS run_click_val,
                   FINAL SUM(c.value) AS fin_click_val
          ALL ROWS PER MATCH
          PATTERN (v c p)
          WITHIN INTERVAL '12' HOUR
          DEFINE v AS event_type = 'view',
                 c AS event_type = 'click',
                 p AS event_type = 'purchase'
        )""")
    return out.select(
        "user_id",
        F.col("match_no").cast("long").alias("match_no"),
        F.col("row_in_match").cast("long").alias("row_in_match"),
        "classifier",
        "event_id",
        "event_type",
        "ts",
        F.col("value").alias("value"),
        F.col("id_1").alias("anchor_id"),
        F.col("rn_running").cast("long").alias("rn_running"),
        "run_click_val",
        "fin_click_val",
    )


def _q_conversation_tracker(spark, sf_dir):
    from rtfproc_spark.streaming.stateful import conversation_tracker_batch

    t = _staged_transcripts(spark)
    return conversation_tracker_batch(t)


def _stage_stream_events_src(spark, sf_dir) -> str:
    """Stage the events table as ts-range-ordered files with range-ordered
    mtimes: the availableNow replay then sees rows in event-time order, so
    the watermark never classifies replayed history as late (on a live
    cluster arrival order *is* roughly event-time order; a backfill replay
    of unordered files would need watermark widened or disabled)."""
    import glob
    import shutil
    import time as _time

    src_dir = f"{_STAGE}/stream_events_src"
    marker = f"{src_dir}/_STAGED_FOR"
    # deterministic content per sf_dir: restage only when the source changes
    # (three stream queries share this corpus)
    if os.path.exists(marker) and open(marker).read() == sf_dir:
        return src_dir
    shutil.rmtree(src_dir, ignore_errors=True)
    ev = _read(spark, sf_dir, "events")
    ev.repartitionByRange(8, "ts").write.mode("overwrite").parquet(src_dir)
    now = _time.time()
    for i, f in enumerate(sorted(glob.glob(f"{src_dir}/part-*"))):
        os.utime(f, (now + i, now + i))
    with open(marker, "w") as fh:
        fh.write(sf_dir)
    return src_dir


def _stage_stream_docs_src(spark, sf_dir) -> str:
    """Stage the documents table as several parquet files so availableNow
    replays it in multiple micro-batches (no event time involved —
    contamination is row-local, so file order is irrelevant)."""
    import glob
    import shutil
    import time as _time

    src_dir = f"{_STAGE}/stream_docs_src"
    marker = f"{src_dir}/_STAGED_FOR"
    if os.path.exists(marker) and open(marker).read() == sf_dir:
        return src_dir
    shutil.rmtree(src_dir, ignore_errors=True)
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    docs.repartitionByRange(4, "doc_id").write.mode("overwrite").parquet(src_dir)
    now = _time.time()
    for i, f in enumerate(sorted(glob.glob(f"{src_dir}/part-*"))):
        os.utime(f, (now + i, now + i))
    with open(marker, "w") as fh:
        fh.write(sf_dir)
    return src_dir


def _q_stream_contamination_docs(spark, sf_dir):
    """Benchmark decontamination on an INGESTION STREAM (C19's streaming
    path): per-doc n-gram hit counts are row-local (one doc per row), so
    contamination_hits applied inside foreachBatch against the STATIC
    broadcast eval set yields exactly the batch result across
    micro-batches — the shape a 100 TB ingest pipeline runs. The
    availableNow replay covers 4 files in >1 micro-batch; each batch
    appends its rows (doc_ids are disjoint across batches, so append is
    exactly-once here). Same DuckDB oracle as the batch row — stream ==
    batch == SQL. (Replaced the plain session_events window row under the
    driver's 50-query cap — session windows stay covered by
    stream_session_events and session_transcripts.)"""
    import shutil

    from rtfproc_spark.functions.text import contamination_hits

    src_dir = _stage_stream_docs_src(spark, sf_dir)
    out_dir = f"{_STAGE}/stream_contam_out"
    ckpt = f"{_STAGE}/stream_contam_ckpt"
    for d in (out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    eval_df = docs.filter(F.col("doc_id") % 50 == 0).select("text")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )

    def publish(batch_df, batch_id):
        contamination_hits(batch_df, eval_df, n=8, min_hits=1).select(
            "doc_id", "n_contaminated_grams", "contaminated"
        ).write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(publish)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


def _q_stream_resume_tumbling(spark, sf_dir):
    """Driver-visible STREAMING check for B1/B3/B4/B9 AND kill/resume of the
    BUILT-IN windowed-aggregation state store (the stream_resume_tracker
    twin covers the custom Python state path; this pins StateStoreSave
    recovery). The events table is re-staged as 8 files and consumed as a
    real availableNow file stream in multiple micro-batches (state crosses
    batches). Phase 1 crashes after batch 0's output is written but before
    the engine commits it; phase 2 restarts from the same checkpoint —
    Spark replays batch 0 against the recovered state and drains the rest.
    Complete-mode overwrite publish is idempotent by construction, and the
    final table must equal the batch SQL oracle (stream == batch, the north
    rule's exactly-once criterion). This single entry subsumes the former
    plain `stream_tumbling_events` check (same stream query, plus the
    crash): the driver records at most 50 queries per round
    (CORRECTNESS_r03 had 51 entries, exactly 50 rows), so the contract is
    held at exactly 50 entries."""
    import shutil

    from rtfproc_spark.operators.windows import tumbling_agg

    src_dir = _stage_stream_events_src(spark, sf_dir)
    out_dir = f"{_STAGE}/stream_resume_tumbling_out"
    ckpt = f"{_STAGE}/stream_resume_tumbling_ckpt"
    for d in (out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    ev = _read(spark, sf_dir, "events")

    def start(writer):
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src_dir)
        )
        agg = tumbling_agg(
            stream.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
                "ts", "10 minutes"
            ),
            "ts",
            ["event_type"],
            "5 minutes",
            [
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 4).alias("sum_value"),
            ],
        ).select(
            F.col("window_start").cast("timestamp_ntz").alias("window_start"),
            F.col("window_end").cast("timestamp_ntz").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
        return (
            agg.writeStream.foreachBatch(writer)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    def publish(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(out_dir)

    def crash_after_first_write(batch_df, batch_id):
        publish(batch_df, batch_id)
        if batch_id == 0:
            raise RuntimeError("injected crash: batch 0 written, not committed")

    q1 = start(crash_after_first_write)
    try:
        q1.awaitTermination()
    except Exception:
        pass
    assert q1.exception() is not None, "phase 1 must die mid-stream"
    q2 = start(publish)
    q2.awaitTermination()
    return spark.read.parquet(out_dir)


def _q_stream_near_dedup(spark, sf_dir):
    """Streaming NEAR-duplicate ingestion dedup (C-set streaming path):
    the documents table replays as a 4-file availableNow stream
    (maxFilesPerTrigger=1, id-range files in mtime order) through
    ``stream_near_dedup`` — each micro-batch is filtered against the
    accumulating (bucket, id, signature) LSH index plus the batch's own
    earlier keepers, survivors publish idempotently per batch and extend
    the index; auto-compaction fires mid-run (compact_every_n_batches=3).
    Semantics are SEQUENTIAL (kept iff matching no previously KEPT doc)
    with the degenerate-bucket cap — see streaming/dedup.py. Oracle:
    ``near_dedup_sequential_local``, a doc-at-a-time pure-Python
    re-derivation of the documented rule over the SAME staged files
    (signatures via the literal-pinned xxh64 twin — no Spark, no joins),
    staged as the expected (doc_id, batch_id) set. (Replaced the
    stream_sliding_events row under the driver's 50-query cap — sliding
    windows are the built-in ``F.window(slide)`` operator, pinned against
    a hand-built oracle by tests/test_pipeline_functions.py and running
    the identical plan shape as the retained tumbling/session stream
    rows.)"""
    import glob
    import shutil

    import pandas as pd

    from rtfproc_spark.streaming.dedup import (
        near_dedup_sequential_local,
        read_kept,
        stream_near_dedup,
    )

    src_dir = _stage_stream_docs_src(spark, sf_dir)
    idx_dir = f"{_STAGE}/stream_neardedup_idx"
    out_dir = f"{_STAGE}/stream_neardedup_out"
    ckpt = f"{_STAGE}/stream_neardedup_ckpt"
    for d in (idx_dir, out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    # the pure-Python expected is for the sf0.01 oracle gate; at bench
    # scale only the Spark stream runs
    if _parquet_nrows(f"{sf_dir}/documents.parquet") <= 2000:
        batches = [
            list(
                pd.read_parquet(f, columns=["doc_id", "text"]).itertuples(
                    index=False, name=None
                )
            )
            for f in sorted(glob.glob(f"{src_dir}/part-*.parquet"))
        ]
        expected = pd.DataFrame(
            near_dedup_sequential_local(batches), columns=["doc_id", "batch_id"]
        ).astype({"doc_id": "int64", "batch_id": "int64"})
        _stage_pdf("stream_neardedup_expected", expected)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream_near_dedup(
        spark, stream, idx_dir, out_dir, ckpt, compact_every_n_batches=3
    )
    q.awaitTermination()
    return read_kept(spark, out_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("batch_id").cast("long").alias("batch_id"),
    )


def _q_stream_session_events(spark, sf_dir):
    """Session windows (B6) driven as a real stream: same availableNow
    multi-batch replay as stream_tumbling_events, but through the
    session-window state operator (merging windows across micro-batches),
    idempotent complete-mode publish. Must equal the batch session oracle."""
    import shutil

    from rtfproc_spark.operators.windows import session_agg

    src_dir = _stage_stream_events_src(spark, sf_dir)
    out_dir = f"{_STAGE}/stream_session_out"
    ckpt = f"{_STAGE}/stream_session_ckpt"
    for d in (out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    ev = _read(spark, sf_dir, "events")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )
    agg = session_agg(
        stream.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
            "ts", "10 minutes"
        ),
        "ts",
        ["user_id"],
        "30 minutes",
        [
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        ],
    ).select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
        "sum_value",
    )

    def publish(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(out_dir)

    q = (
        agg.writeStream.foreachBatch(publish)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


def _q_stream_user_assistant_join(spark, sf_dir):
    """Stream-stream interval join (B7) through a REAL stream: both sides
    watermarked, matches emitted per micro-batch into the idempotent sink.
    Inner joins emit on match, so the bounded replay must produce exactly
    the batch join's rows."""
    import shutil

    from rtfproc_spark.streaming.pipeline import (
        stream_transcripts,
        streaming_user_assistant_join,
    )
    from rtfproc_spark.streaming.sink import IdempotentSink, read_sink

    src_dir = _stage_stream_transcripts_src(spark)  # ts-ordered corpus files
    out_dir = f"{_STAGE}/stream_uajoin_out"
    ckpt = f"{_STAGE}/stream_uajoin_ckpt"
    for d in (out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    stream = (
        spark.readStream.schema("conv_id string, turn_idx int, role string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    joined = streaming_user_assistant_join(stream)
    sink = IdempotentSink(
        out_dir, keys=["conv_id", "user_turn_idx", "asst_turn_idx"]
    )
    q = (
        joined.writeStream.foreachBatch(sink.writer())
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return read_sink(
        spark, out_dir, keys=["conv_id", "user_turn_idx", "asst_turn_idx"]
    ).select(
        "conv_id", "user_turn_idx", "user_ts", "asst_turn_idx", "asst_role", "asst_ts"
    )


def _stage_stream_transcripts_src(spark) -> str:
    """Stage a late-arrival-free transcript corpus as ts-range-ordered
    parquet files whose mtimes follow the range order, so an availableNow
    file stream replays the event-time timeline deterministically (one file
    per micro-batch, rows arrive in global ts order)."""
    import glob
    import shutil
    import time as _time

    from rtfproc_spark.sources.transcripts import synthesize_transcripts_df

    src_dir = f"{_STAGE}/stream_tracker_src"
    marker = f"{src_dir}/_STAGED_OK"
    if os.path.exists(marker):  # fixed params, deterministic content
        return src_dir
    shutil.rmtree(src_dir, ignore_errors=True)
    t = synthesize_transcripts_df(
        spark, n_convs=40, turns_per_conv=6, late_frac=0.0, include_golden=False
    ).select("conv_id", "turn_idx", "role", "ts")
    t.repartitionByRange(4, "ts").write.mode("overwrite").parquet(src_dir)
    now = _time.time()
    for i, f in enumerate(sorted(glob.glob(f"{src_dir}/part-*"))):
        os.utime(f, (now + i, now + i))
    with open(marker, "w") as fh:
        fh.write("ok")
    return src_dir


def _q_stream_conversation_tracker(spark, sf_dir):
    """Driver-visible check for the custom stateful CEP operator run as a
    REAL stream (B12 + B9): a late-arrival-free transcript corpus is staged
    as ts-range-ordered files, consumed one file per micro-batch (per-conv
    state spans batches via the state store), and emitted through the
    exactly-once idempotent sink. The result must equal the window-function
    batch oracle over the same staged rows."""
    import shutil

    from rtfproc_spark.streaming.sink import IdempotentSink, read_sink
    from rtfproc_spark.streaming.stateful import conversation_tracker

    src_dir = _stage_stream_transcripts_src(spark)
    out_dir = f"{_STAGE}/stream_tracker_out"
    ckpt = f"{_STAGE}/stream_tracker_ckpt"
    for d in (out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    stream = (
        spark.readStream.schema("conv_id string, turn_idx int, role string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    # idle_timeout_ms=None: a bounded availableNow replay must terminate
    # when the data is consumed, not when 30-minute idle timers fire
    tracked = conversation_tracker(stream, watermark="10 minutes", idle_timeout_ms=None)
    sink = IdempotentSink(out_dir, keys=["conv_id", "turn_idx"])
    q = (
        tracked.writeStream.foreachBatch(sink.writer())
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return read_sink(spark, out_dir, keys=["conv_id", "turn_idx"]).select(
        "conv_id", "turn_idx", "role", "ts", "turns_seen", "secs_since_prev", "is_role_switch"
    )


def _q_stream_resume_tracker(spark, sf_dir):
    """Driver-visible KILL/RESUME for the exactly-once contract (B9+B11,
    the restart half round 2 left pytest-only): phase 1 runs the stateful
    tracker stream but the sink wrapper RAISES AFTER batch 0's data is
    physically written and BEFORE the engine commits the batch — a
    deterministic mid-stream crash at the worst point (data on disk, offset
    log not advanced; no timing races). Phase 2 restarts from the SAME
    checkpoint: Spark replays batch 0, the IdempotentSink dedupes the
    double-write by (batch key), and the stream drains to completion. The
    merged sink must equal the batch window-function oracle over the same
    staged rows — exactly-once across a crash/restart boundary (reference
    anchor: the resumable-cursor design, /root/reference/src/rtfproc.h:63-100)."""
    import shutil

    from rtfproc_spark.streaming.sink import IdempotentSink, read_sink
    from rtfproc_spark.streaming.stateful import conversation_tracker

    src_dir = _stage_stream_transcripts_src(spark)
    out_dir = f"{_STAGE}/stream_resume_out"
    ckpt = f"{_STAGE}/stream_resume_ckpt"
    for d in (out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    def start(writer):
        stream = (
            spark.readStream.schema(
                "conv_id string, turn_idx int, role string, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        tracked = conversation_tracker(
            stream, watermark="10 minutes", idle_timeout_ms=None
        )
        return (
            tracked.writeStream.foreachBatch(writer)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    sink = IdempotentSink(out_dir, keys=["conv_id", "turn_idx"])
    inner = sink.writer()

    def crash_after_first_write(batch_df, batch_id):
        inner(batch_df, batch_id)
        if batch_id == 0:
            raise RuntimeError("injected crash: batch 0 written, not committed")

    q1 = start(crash_after_first_write)
    try:
        q1.awaitTermination()
    except Exception:
        pass  # the injected crash surfaces as a StreamingQueryException
    assert q1.exception() is not None, "phase 1 must die mid-stream"

    q2 = start(sink.writer())
    q2.awaitTermination()
    return read_sink(spark, out_dir, keys=["conv_id", "turn_idx"]).select(
        "conv_id", "turn_idx", "role", "ts", "turns_seen", "secs_since_prev", "is_role_switch"
    )


def _stage_stream_dup_events_src(spark, sf_dir) -> str:
    """Stage the events table as 4 ts-range-ordered files WITH INJECTED
    DUPLICATE DELIVERIES: each file k>=1 re-emits the last 25 rows of file
    k-1 (an at-least-once source replaying its tail across a batch
    boundary — the exact failure mode exactly-once ingestion must absorb).
    The duplicates' event times sit at the previous file's maximum, well
    inside the 30-minute watermark, so the dedup state still holds them."""
    import glob
    import shutil
    import time as _time

    import pandas as pd

    src_dir = f"{_STAGE}/stream_dup_events_src"
    marker = f"{src_dir}/_STAGED_FOR"
    if os.path.exists(marker) and open(marker).read() == sf_dir:
        return src_dir
    shutil.rmtree(src_dir, ignore_errors=True)
    os.makedirs(src_dir, exist_ok=True)
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    pdf = (
        pd.read_parquet(f"{sf_dir}/events.parquet", columns=cols)
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    n = len(pdf)
    bounds = [0, n // 4, n // 2, 3 * n // 4, n]
    chunks = [pdf.iloc[bounds[i] : bounds[i + 1]] for i in range(4)]
    now = _time.time()
    for k, ch in enumerate(chunks):
        if k > 0:
            ch = pd.concat([chunks[k - 1].tail(25), ch], ignore_index=True)
        ch.to_parquet(f"{src_dir}/part-{k}.parquet", index=False)
        os.utime(f"{src_dir}/part-{k}.parquet", (now + k, now + k))
    with open(marker, "w") as fh:
        fh.write(sf_dir)
    return src_dir


def _q_stream_dedup_events(spark, sf_dir):
    """Streaming exactly-once ingestion dedup: an at-least-once source
    (staged with real duplicate re-deliveries across batch boundaries) is
    consumed one file per micro-batch through
    ``dropDuplicatesWithinWatermark(event_id)`` and a plain append parquet
    sink — NOT a key-merging sink, so any duplicate the operator lets
    through lands in the output and fails the row-count/value check. The
    oracle is SELECT DISTINCT over the same staged files."""
    import shutil

    src_dir = _stage_stream_dup_events_src(spark, sf_dir)
    out_dir = f"{_STAGE}/stream_dedup_out"
    ckpt = f"{_STAGE}/stream_dedup_ckpt"
    for d in (out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    deduped = stream.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    # Right-size the STATE partitioning for this stream: the number of
    # state stores is pinned by shuffle.partitions at checkpoint creation,
    # and every micro-batch pays a per-store snapshot/commit — 64 stores x
    # 5 batches of commit overhead for a single-key dedup state is sizing
    # for a cluster this stream doesn't need. A real deployment sizes state
    # partitions per stream (key cardinality / executor count), which is a
    # per-query conf here; batch queries are unaffected (restored below).
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return spark.read.parquet(out_dir).select(
        "event_id", "ts", "user_id", "event_type", F.round("value", 4).alias("value")
    )


def _q_ann_lsh_topk(spark, sf_dir):
    from rtfproc_spark.functions.similarity import lsh_bucket_topk

    emb = _read(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    # at bits=3 x 12 bands the candidate set covers the full true top-10 on
    # this corpus (recall 1.0, measured), so the approximate result equals
    # exact brute force and the embedding_topk SQL doubles as its oracle;
    # coarser/fewer bands trade that recall for a smaller scanned fraction
    # (recall@10 >= 0.8 at bits=4 x 16 is pinned by test_ann_lsh_recall).
    return lsh_bucket_topk(emb, qvec, k=10, bits=3, bands=12)


def _q_lineage_file_rows(spark, sf_dir):
    """Per-input-file lineage audit (B11): every row stamped with its
    physical provenance via input_file_name(), aggregated per file — the
    table-level generalization of the reference's txt->raw lineage map
    (rtfproc.c:979). The oracle recomputes the same audit with DuckDB's
    filename=true, so a pass proves the lineage column is faithful."""
    from rtfproc_spark.streaming.metrics import with_lineage

    src_dir = f"{_STAGE}/lineage_src"
    marker = f"{src_dir}/_STAGED_FOR"
    if not (os.path.exists(marker) and open(marker).read() == sf_dir):
        import shutil

        shutil.rmtree(src_dir, ignore_errors=True)
        _read(spark, sf_dir, "lineitem").repartition(4).write.mode(
            "overwrite"
        ).parquet(src_dir)
        with open(marker, "w") as fh:
            fh.write(sf_dir)
    li = spark.read.parquet(src_dir)
    return (
        with_lineage(li)
        .groupBy(F.regexp_extract("_input_file", r"([^/]+)$", 1).alias("file"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


def _q_ivf_topk(spark, sf_dir):
    """IVF similarity search (k-means coarse quantizer + nprobe probing) —
    the second scale path the task mandate names alongside LSH — with a
    staged-expected differential: centroids are trained DRIVER-SIDE (plain
    numpy Lloyd's, fixed seed — the sample-train/ingest-materialize posture;
    never a full-corpus ML job per lookup) and passed into the Spark query
    as a broadcast matrix, which makes the distributed assignment
    deterministic; the whole expected result (assign -> probe -> exact
    cosine top-k, with Spark's sequential fold order and HALF_UP rounding
    reproduced) is computed locally with numpy/pure Python and staged, so
    the driver check is a true distributed-vs-local diff. Recall floor vs
    exact search: tests/test_pipeline_functions.py::test_ivf_recall."""
    import pandas as pd
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    from rtfproc_spark.functions.similarity import (
        assign_clusters,
        ivf_probe_clusters,
        ivf_topk,
        kmeans_fit_local,
    )

    local = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = local["vec_id"].to_numpy()
    X = np.stack([np.asarray(v, dtype=np.float64) for v in local["embedding"]])
    centroids = kmeans_fit_local(X, nlist=16, seed=42)
    qvec = X[ids == 0][0]

    # expected: same math, computed locally. Cosine reproduces Spark's
    # cosine_sim exactly: sequential left-fold over zip_with products /
    # sequential sum of squares (NOT np.dot, whose pairwise/BLAS order can
    # differ in the last ulp), then greatest(na*nb, 1e-12) and round(.,4)
    # via BigDecimal-HALF_UP semantics.
    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    assigned = assign_clusters(X, centroids)
    probe = set(ivf_probe_clusters(qvec, centroids, nprobe=8))
    qn = Decimal("0.0001")
    rows = []
    for i in range(len(X)):
        if int(assigned[i]) not in probe:
            continue
        dot = fold_dot(X[i], qvec)
        na, nb = fold_dot(X[i], X[i]) ** 0.5, fold_dot(qvec, qvec) ** 0.5
        cos = dot / max(na * nb, 1e-12)
        rows.append(
            (int(ids[i]), float(Decimal(repr(cos)).quantize(qn, rounding=ROUND_HALF_UP)))
        )
    rows.sort(key=lambda r: (-r[1], r[0]))
    expected = pd.DataFrame(rows[:10], columns=["vec_id", "cosine"]).astype(
        {"vec_id": "int64", "cosine": "float64"}
    )
    _stage_pdf("ivf_topk_expected", expected)

    emb = _read(spark, sf_dir, "embeddings")
    qlist = [float(v) for v in qvec]
    # the 100 TB lookup posture end-to-end: materialize the ingest-time
    # assignment as a CLUSTER-PARTITIONED table (the ivf_assign artifact),
    # read it back, and run the lookup against it — the probe is then a
    # partition-pruned read of 8/16 cluster directories plus a broadcast
    # semi-join, with NO assignment matmul on the query path (pinned by
    # tests/test_plans.py::test_ivf_topk_assigned_partition_pruning)
    from rtfproc_spark.functions.similarity import ivf_assign

    assign_dir = f"{_STAGE}/ivf_assigned_store"
    ivf_assign(emb, centroids).write.mode("overwrite").partitionBy(
        "cluster"
    ).parquet(assign_dir)
    assigned_store = spark.read.parquet(assign_dir)
    return ivf_topk(
        emb,
        qlist,
        k=10,
        nlist=16,
        nprobe=8,
        centroids=centroids,
        assigned=assigned_store,
    )


def _q_pii_scrub_docs(spark, sf_dir):
    """PII scrub over a PLANTED corpus (emails/URLs/phones injected into a
    third of the docs — the raw table has none, so scrubbing it would be a
    vacuous check) with a real DuckDB oracle: the same three replacements,
    same order, in the shared Java-regex/RE2 dialect subset. A pass proves
    pattern semantics AND replacement order on both engines."""
    import pandas as pd

    local = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts = []
    for i, t in zip(local["doc_id"], local["text"]):
        i = int(i)
        if i % 3 == 0:
            t = (
                f"{t} reach user{i}@example.com or +1 (555) 010-{i % 10000:04d} "
                f"see https://example.org/d/{i}?ref=corpus for details"
            )
        texts.append(t)
    staged = pd.DataFrame(
        {"doc_id": local["doc_id"].astype("int64"), "text": pd.Series(texts, dtype="string")}
    )
    _stage_pdf("pii_docs_input", staged)
    from rtfproc_spark.functions.text import scrub_pii

    df = spark.read.parquet(f"{_STAGE}/pii_docs_input")
    return df.select("doc_id", scrub_pii("text").alias("clean_text"))


def _q_contamination_hits(spark, sf_dir):
    """Benchmark decontamination (C19): flag training documents sharing at
    least one distinct 8-gram with an 'eval set' — here a deterministic
    sample of the corpus itself (doc_id % 50 == 0), so the sampled docs
    and their planted near-duplicates must light up. The eval gram set is
    DISTINCT-collapsed and broadcast; the per-doc gram explode feeds a
    BroadcastHashJoin so nothing wider than (doc_id, count) shuffles
    (plan-pinned by test_plans.py::test_contamination_plan_broadcasts_
    eval_set). (Replaced the plain sliding_events window row under the
    driver's 50-query cap in round 5; round 7 also folded the
    stream_sliding_events twin for stream_near_dedup — sliding windows
    are the built-in F.window(slide) operator, pinned by the pytest
    window oracle and sharing their plan shape with the retained
    tumbling/session stream rows.) Oracle: DuckDB unnest n-grams on both
    sides + distinct join + per-doc count."""
    from rtfproc_spark.functions.text import contamination_hits

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    eval_df = docs.filter(F.col("doc_id") % 50 == 0).select("text")
    return contamination_hits(docs, eval_df, n=8, min_hits=1).select(
        "doc_id", "n_contaminated_grams", "contaminated"
    )


def _q_gopher_filter_docs(spark, sf_dir):
    """Gopher/C4-style repetition + shape quality rules over a PLANTED
    corpus (a quarter of the docs get a repeated-sentence block appended so
    the duplicate-sentence rule actually fires — the raw corpus has no
    repetition) with an exact DuckDB oracle re-deriving every signal and
    the conjunctive pass flag."""
    import pandas as pd

    from rtfproc_spark.functions.text import repetition_quality

    local = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts = []
    for i, t in zip(local["doc_id"], local["text"]):
        i = int(i)
        if i % 16 == 0:
            # boilerplate doc: mostly one repeated sentence — must FAIL the
            # dup_sent_frac < 0.3 rule (the planted failure case)
            t = f"{t[:80]}. " + "Same sentence here. " * 10 + "End"
        elif i % 4 == 0:
            t = f"{t} Same sentence here. Same sentence here. Same sentence here. End"
        texts.append(t)
    staged = pd.DataFrame(
        {"doc_id": local["doc_id"].astype("int64"), "text": pd.Series(texts, dtype="string")}
    )
    _stage_pdf("gopher_docs_input", staged)
    df = spark.read.parquet(f"{_STAGE}/gopher_docs_input")
    return df.select("doc_id", *repetition_quality("text"))


def _q_train_split_docs(spark, sf_dir):
    """Deterministic train/val/test hash split (the standard corpus-split
    assignment: a pure salted-hash function of the id, stable across runs,
    partitions and cluster sizes). Staged-expected via the pure-Python
    XXH64: bucket = pmod(xxhash64('split', doc_id), 100)."""
    import pandas as pd

    from rtfproc_spark.functions.text import hash_split, split_name
    from rtfproc_spark.functions.xxh64 import spark_xxhash64

    local = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    buckets = [
        spark_xxhash64("split", ("long", int(i))) % 100 for i in local["doc_id"]
    ]
    expected = pd.DataFrame(
        {
            "doc_id": local["doc_id"].astype("int64"),
            "bucket": pd.Series(buckets, dtype="int64"),
            "split": pd.Series(
                [
                    "train" if b < 80 else ("val" if b < 90 else "test")
                    for b in buckets
                ],
                dtype="string",
            ),
        }
    )
    _stage_pdf("train_split_expected", expected)
    docs = _read(spark, sf_dir, "documents")
    b = hash_split("doc_id")
    return docs.select("doc_id", b.alias("bucket"), split_name(b).alias("split"))


def _q_pack_docs(spark, sf_dir):
    """TWO-PHASE sequence-packing plan for LLM pretraining batches: running
    token total within (lang, shard) -> local bin, then shard bins offset
    by the exclusive prefix sum of per-shard bin counts — the shape that
    survives 100 TB (a lang-only window puts one language's entire corpus
    through a single sort task). Real DuckDB SQL oracle: the same sharded
    window + offset arithmetic recomputed independently. The shard here is
    doc_id % 8 so the oracle stays plain SQL; production default is
    pmod(xxhash64(order), num_shards)."""
    from rtfproc_spark.functions.text import pack_bins, token_count

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", "lang", token_count("text").cast("long").alias("n_tokens")
    )
    return pack_bins(
        docs,
        size_col="n_tokens",
        order_col="doc_id",
        group_cols=["lang"],
        budget=512,
        num_shards=8,
        shard_expr=F.pmod(F.col("doc_id"), F.lit(8)),
    ).select("doc_id", "lang", "n_tokens", "pack_bin")


def _q_training_set_docs(spark, sf_dir):
    """The composed 'final training set' query a pipeline actually ships:
    exact-dedup keep (min doc_id per content digest) AND language filter
    AND quality floor AND token bounds — every stage individually oracled
    elsewhere, composed here and checked end-to-end against one DuckDB
    query."""
    from pyspark.sql.window import Window

    from rtfproc_spark.functions.dedup import text_digest
    from rtfproc_spark.functions.text import lang_id, quality_score, token_count

    docs = _read(spark, sf_dir, "documents")
    w = Window.partitionBy(text_digest("text"))
    return (
        docs.withColumn("_keep_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("_keep_id"))
        .select(
            "doc_id",
            lang_id("text").alias("lang_pred"),
            quality_score("text").alias("quality"),
            token_count("text").cast("long").alias("n_tokens"),
        )
        .filter(
            (F.col("lang_pred") == "en")
            & (F.col("quality") >= 0.5)
            & F.col("n_tokens").between(5, 2000)
        )
    )


def _stage_stream_embs_src(spark, sf_dir) -> str:
    """Stage the embeddings table as 4 id-range parquet files with
    increasing mtimes so availableNow replays it in multiple
    micro-batches (same pattern as _stage_stream_docs_src)."""
    import glob
    import shutil
    import time as _time

    src_dir = f"{_STAGE}/stream_embs_src"
    marker = f"{src_dir}/_STAGED_FOR"
    if os.path.exists(marker) and open(marker).read() == sf_dir:
        return src_dir
    shutil.rmtree(src_dir, ignore_errors=True)
    emb = _read(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb.repartitionByRange(4, "vec_id").write.mode("overwrite").parquet(src_dir)
    now = _time.time()
    for i, f in enumerate(sorted(glob.glob(f"{src_dir}/part-*"))):
        os.utime(f, (now + i, now + i))
    with open(marker, "w") as fh:
        fh.write(sf_dir)
    return src_dir


def _q_stream_semantic_dedup(spark, sf_dir):
    """Streaming SEMANTIC near-dedup (C21's streaming posture, round-8):
    the embeddings table replays as a 4-file availableNow stream through
    ``stream_semantic_dedup`` — each micro-batch is cluster-assigned
    against the driver-trained IVF centroid artifact (the same
    kmeans_fit_local(nlist=16, seed=42) artifact the ivf_topk /
    semdedup_embeddings rows train), filtered on round-4 cosine >=
    threshold against the accumulating per-cluster (cluster, id, vec)
    index plus the batch's own earlier keepers, and survivors publish
    idempotently per batch and extend the index; auto-compaction fires
    mid-run (compact_every_n_batches=3) through the schema-parametrized
    shared maintenance. Semantics are SEQUENTIAL (kept iff matching no
    previously KEPT vector) with the degenerate-cluster cap — see
    streaming/semdedup.py. Oracle: ``semantic_dedup_sequential_local``, a
    vector-at-a-time pure-Python/numpy re-derivation of the documented
    rule over the SAME staged files (assignment through the shared
    per-dimension fold, cosines as Spark's sequential aggregate fold with
    HALF_UP round-4), staged as the expected (vec_id, batch_id) set.
    (Replaced the ivf_assign_embeddings row under the driver's 50-query
    cap — the full-table assignment differential is exercised inside this
    row's oracle AND inside semdedup_embeddings/ivf_topk, all against the
    same shared assign_clusters kernel.)"""
    import glob
    import shutil

    import pandas as pd

    import numpy as np

    from rtfproc_spark.functions.similarity import kmeans_fit_local
    from rtfproc_spark.streaming.dedup import read_kept
    from rtfproc_spark.streaming.semdedup import (
        semantic_dedup_sequential_local,
        stream_semantic_dedup,
    )

    local = pd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    X = np.stack([np.asarray(v, dtype=np.float64) for v in local["embedding"]])
    centroids = kmeans_fit_local(X, nlist=16, seed=42)

    src_dir = _stage_stream_embs_src(spark, sf_dir)
    idx_dir = f"{_STAGE}/stream_semdedup_idx"
    out_dir = f"{_STAGE}/stream_semdedup_out"
    ckpt = f"{_STAGE}/stream_semdedup_ckpt"
    for d in (idx_dir, out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    # the pure-Python expected is quadratic-within-cluster — stage it at
    # the driver's correctness scale only; bench never consults it
    if len(local) <= 2000:
        batches = [
            [
                (int(r.vec_id), list(r.embedding))
                for r in pd.read_parquet(
                    f, columns=["vec_id", "embedding"]
                ).itertuples(index=False)
            ]
            for f in sorted(glob.glob(f"{src_dir}/part-*.parquet"))
        ]
        expected = pd.DataFrame(
            semantic_dedup_sequential_local(batches, centroids, threshold=0.35),
            columns=["vec_id", "batch_id"],
        ).astype({"vec_id": "int64", "batch_id": "int64"})
        _stage_pdf("stream_semdedup_expected", expected)
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream_semantic_dedup(
        spark, stream, centroids, idx_dir, out_dir, ckpt,
        compact_every_n_batches=3, threshold=0.35,
    )
    q.awaitTermination()
    return read_kept(spark, out_dir).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("batch_id").cast("long").alias("batch_id"),
    )


def _wrap(fn):
    def wrapped(spark, sf_dir):
        _ensure_pkg_on_executors(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "interval_join_events": _wrap(_q_interval_join_events),
        "salted_agg_events": _wrap(_q_salted_agg_events),
        "dedup_exact_docs": _wrap(_q_dedup_exact_docs),
        "doc_stats": _wrap(_q_doc_stats),
        "unigram_logprob_docs": _wrap(_q_unigram_logprob_docs),
        "cep_loop_events": _wrap(_q_cep_loop_events),
        "pricing_summary": _wrap(_q_pricing_summary),
        "embedding_topk": _wrap(_q_embedding_topk),
        "rtf_passthrough_docs": _wrap(_q_rtf_passthrough_docs),
        "rtf_extract_transcripts": _wrap(_q_rtf_extract_transcripts),
        "rtf_strip_transcripts": _wrap(_q_rtf_strip_transcripts),
        "session_transcripts": _wrap(_q_session_transcripts),
        "cep_contiguous_events": _wrap(_q_cep_contiguous_events),
        "minhash_pairs_docs": _wrap(_q_minhash_pairs_docs),
        "asof_join_events": _wrap(_q_asof_join_events),
        "cep_cross_events": _wrap(_q_cep_cross_events),
        "cep_binding_events": _wrap(_q_cep_binding_events),
        "trending_events": _wrap(_q_trending_events),
        "rollup_revenue": _wrap(_q_rollup_revenue),
        "cep_final_loop_events": _wrap(_q_cep_final_loop_events),
        "simhash_near_docs": _wrap(_q_simhash_near_docs),
        "ngram_jaccard_docs": _wrap(_q_ngram_jaccard_docs),
        "embedding_near_pairs": _wrap(_q_embedding_near_pairs),
        "semdedup_embeddings": _wrap(_q_semdedup_embeddings),
        "bpe_tokens_docs": _wrap(_q_bpe_tokens_docs),
        "media_decode": _wrap(_q_media_decode),
        "conversation_tracker": _wrap(_q_conversation_tracker),
        "dup_span_docs": _wrap(_q_dup_span_docs),
        "bucketed_conv_stats": _wrap(_q_bucketed_conv_stats),
        "cep_rows_events": _wrap(_q_cep_rows_events),
        "cep_session_funnel_events": _wrap(_q_cep_session_funnel_events),
        "dedup_keeplist_docs": _wrap(_q_dedup_keeplist_docs),
        "ann_lsh_topk": _wrap(_q_ann_lsh_topk),
        "ivf_topk": _wrap(_q_ivf_topk),
        "stream_semantic_dedup": _wrap(_q_stream_semantic_dedup),
        "train_split_docs": _wrap(_q_train_split_docs),
        "pii_scrub_docs": _wrap(_q_pii_scrub_docs),
        "gopher_filter_docs": _wrap(_q_gopher_filter_docs),
        "contamination_hits": _wrap(_q_contamination_hits),
        "pack_docs": _wrap(_q_pack_docs),
        "training_set_docs": _wrap(_q_training_set_docs),
        "lineage_file_rows": _wrap(_q_lineage_file_rows),
        "stream_near_dedup": _wrap(_q_stream_near_dedup),
        "stream_session_events": _wrap(_q_stream_session_events),
        "stream_user_assistant_join": _wrap(_q_stream_user_assistant_join),
        "stream_conversation_tracker": _wrap(_q_stream_conversation_tracker),
        "stream_resume_tracker": _wrap(_q_stream_resume_tracker),
        "stream_dedup_events": _wrap(_q_stream_dedup_events),
        "stream_resume_tumbling": _wrap(_q_stream_resume_tumbling),
        "stream_contamination_docs": _wrap(_q_stream_contamination_docs),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "interval_join_events": """
            SELECT c.event_id AS click_id, p.event_id AS purchase_id,
                   c.user_id AS user_id
            FROM events c JOIN events p
              ON c.user_id = p.user_id
             AND c.event_type = 'click' AND p.event_type = 'purchase'
             AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '10 minutes'
        """,
        "salted_agg_events": """
            SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
            FROM events GROUP BY user_id
        """,
        "dedup_exact_docs": """
            SELECT md5(text) AS digest, MIN(doc_id) AS keep_id, COUNT(*) AS n_dupes
            FROM documents GROUP BY 1
        """,
        "doc_stats": """
            SELECT d.doc_id, LENGTH(d.text) AS n_chars_calc,
                   LEN(string_split(d.text, ' ')) AS n_tokens, f.fp
            FROM documents d
            JOIN read_parquet('/tmp/rtfproc_oracle_stage/fingerprint_expected/*.parquet') f
              ON d.doc_id = f.doc_id
        """,
        "unigram_logprob_docs": r"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
                FROM documents
            ), t2 AS (SELECT * FROM toks WHERE tok != ''),
            counts AS (SELECT tok, COUNT(*) AS c FROM t2 GROUP BY tok),
            tot AS (SELECT SUM(c) AS n FROM counts)
            SELECT doc_id, COUNT(*) AS n_tokens,
                   ROUND(AVG(ROUND(ln(c / CAST(n AS DOUBLE)), 6)), 4) AS avg_logprob
            FROM t2 JOIN counts USING (tok) CROSS JOIN tot
            GROUP BY doc_id
        """,
        "cep_loop_events": """
            WITH v AS (
                SELECT user_id, ts AS ts_1, event_id AS id_1
                FROM events WHERE event_type = 'view'
            ), cand AS (
                SELECT v.user_id, v.ts_1, v.id_1, e.ts AS t, e.event_id AS i,
                       e.value AS pval,
                       (SELECT COUNT(*) FROM events b
                         WHERE b.user_id = v.user_id
                           AND b.event_type IN ('click', 'signup')
                           AND b.ts > v.ts_1 AND b.ts < e.ts) AS nb
                FROM v JOIN events e
                  ON e.user_id = v.user_id AND e.event_type = 'purchase'
                 AND e.ts > v.ts_1
                 AND e.ts <= v.ts_1 + INTERVAL '2 days'
            ), best AS (
                SELECT * FROM (
                    SELECT cand.*, ROW_NUMBER() OVER (
                        PARTITION BY user_id, ts_1, id_1
                        ORDER BY t, i) AS rn
                    FROM cand WHERE nb >= 1
                ) WHERE rn = 1
            )
            SELECT user_id, ts_1, id_1,
                   CAST(nb AS BIGINT) AS n_s,
                   (SELECT b.ts FROM events b
                     WHERE b.user_id = best.user_id
                       AND b.event_type IN ('click', 'signup')
                       AND b.ts > best.ts_1 AND b.ts < best.t
                     ORDER BY b.ts, b.event_id LIMIT 1) AS first_s_ts,
                   (SELECT b.event_id FROM events b
                     WHERE b.user_id = best.user_id
                       AND b.event_type IN ('click', 'signup')
                       AND b.ts > best.ts_1 AND b.ts < best.t
                     ORDER BY b.ts, b.event_id LIMIT 1) AS first_s_id,
                   (SELECT b.ts FROM events b
                     WHERE b.user_id = best.user_id
                       AND b.event_type IN ('click', 'signup')
                       AND b.ts > best.ts_1 AND b.ts < best.t
                     ORDER BY b.ts DESC, b.event_id DESC LIMIT 1) AS last_s_ts,
                   (SELECT b.event_id FROM events b
                     WHERE b.user_id = best.user_id
                       AND b.event_type IN ('click', 'signup')
                       AND b.ts > best.ts_1 AND b.ts < best.t
                     ORDER BY b.ts DESC, b.event_id DESC LIMIT 1) AS last_s_id,
                   t AS ts_3, i AS id_3,
                   (SELECT MIN(b.value) FROM events b
                     WHERE b.user_id = best.user_id
                       AND b.event_type IN ('click', 'signup')
                       AND b.ts > best.ts_1 AND b.ts < best.t) AS s_value_min,
                   (SELECT MAX(b.value) FROM events b
                     WHERE b.user_id = best.user_id
                       AND b.event_type IN ('click', 'signup')
                       AND b.ts > best.ts_1 AND b.ts < best.t) AS s_value_max,
                   pval AS purchase_value
            FROM best
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "embedding_topk": """
            SELECT vec_id,
                   ROUND(list_cosine_similarity(embedding::DOUBLE[],
                         (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4) AS cosine
            FROM embeddings
            ORDER BY cosine DESC, vec_id ASC
            LIMIT 10
        """,
        "trending_events": """
            WITH counts AS (
                SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
                       event_type, COUNT(*) AS n_events
                FROM events GROUP BY 1, 2
            ), shared AS (
                -- share over ALL types in the window, BEFORE the top-k cut
                SELECT *,
                       ROUND(n_events / (SUM(n_events) OVER (PARTITION BY window_start)), 4) AS share,
                       ROW_NUMBER() OVER (
                           PARTITION BY window_start
                           ORDER BY n_events DESC, event_type) AS rk
                FROM counts
            )
            SELECT window_start, event_type, n_events, share, rk
            FROM shared WHERE rk <= 3
        """,
        "cep_cross_events": """
            WITH s1 AS (
                SELECT user_id, ts AS ts_1, event_id AS id_1, value AS v1
                FROM events WHERE event_type = 'view'
            ), c AS (
                SELECT user_id, ts_1, id_1, v1, t AS ts_2, i AS id_2 FROM (
                    SELECT s1.user_id, s1.ts_1, s1.id_1, s1.v1,
                           e.ts AS t, e.event_id AS i,
                           ROW_NUMBER() OVER (
                               PARTITION BY s1.user_id, s1.ts_1, s1.id_1
                               ORDER BY e.ts, e.event_id) AS rn
                    FROM s1 JOIN events e
                      ON e.user_id = s1.user_id AND e.event_type = 'click'
                     AND e.ts > s1.ts_1
                     AND e.ts <= s1.ts_1 + INTERVAL '2 days'
                ) WHERE rn = 1
            ), p AS (
                SELECT user_id, ts_1, id_1, ts_2, id_2,
                       t AS ts_3, i AS id_3 FROM (
                    SELECT c.user_id, c.ts_1, c.id_1, c.ts_2, c.id_2,
                           e.ts AS t, e.event_id AS i,
                           ROW_NUMBER() OVER (
                               PARTITION BY c.user_id, c.ts_1, c.id_1
                               ORDER BY e.ts, e.event_id) AS rn
                    FROM c JOIN events e
                      ON e.user_id = c.user_id
                     AND e.event_type = 'purchase'
                     AND e.ts > c.ts_2
                     AND e.ts <= c.ts_1 + INTERVAL '2 days'
                     AND e.value > c.v1
                ) WHERE rn = 1
            )
            SELECT user_id, ts_1, id_1, ts_2, id_2, ts_3, id_3 FROM p
        """,
        "cep_binding_events": """
            WITH s1 AS (
                SELECT user_id, ts AS ts_1, event_id AS id_1
                FROM events WHERE event_type = 'view'
            ), m2 AS (
                SELECT user_id, ts_1, id_1, t AS ts_2, i AS id_2,
                       br AS branch_2 FROM (
                    SELECT s1.user_id, s1.ts_1, s1.id_1,
                           e.ts AS t, e.event_id AS i,
                           CASE WHEN e.event_type = 'click' THEN 0 ELSE 1 END
                               AS br,
                           ROW_NUMBER() OVER (
                               PARTITION BY s1.user_id, s1.ts_1, s1.id_1
                               ORDER BY e.ts, e.event_id,
                                   CASE WHEN e.event_type = 'click'
                                        THEN 0 ELSE 1 END) AS rn
                    FROM s1 JOIN events e
                      ON e.user_id = s1.user_id
                     AND e.event_type IN ('click', 'signup')
                     AND e.ts > s1.ts_1
                     AND e.ts <= s1.ts_1 + INTERVAL '12 hours'
                ) WHERE rn = 1
            ), m3 AS (
                SELECT user_id, ts_1, id_1, ts_2, id_2, branch_2,
                       t AS ts_3, i AS id_3 FROM (
                    SELECT m2.*, e.ts AS t, e.event_id AS i,
                           ROW_NUMBER() OVER (
                               PARTITION BY m2.user_id, m2.ts_1, m2.id_1
                               ORDER BY e.ts, e.event_id) AS rn
                    FROM m2 JOIN events e
                      ON e.user_id = m2.user_id
                     AND e.event_type = 'purchase'
                     AND e.ts > m2.ts_2
                     AND e.ts <= m2.ts_1 + INTERVAL '12 hours'
                ) WHERE rn = 1
            )
            SELECT * FROM (
                SELECT m3.*,
                       (SELECT COUNT(*) FROM events e
                        WHERE e.user_id = m3.user_id
                          AND e.event_type = 'error'
                          AND e.ts > m3.ts_1 AND e.ts < m3.ts_3) AS n_err,
                       (SELECT e.ts FROM events e
                        WHERE e.user_id = m3.user_id
                          AND e.event_type = 'error'
                          AND e.ts > m3.ts_1 AND e.ts < m3.ts_3
                        ORDER BY e.ts, e.event_id LIMIT 1) AS first_err_ts,
                       (SELECT e.event_id FROM events e
                        WHERE e.user_id = m3.user_id
                          AND e.event_type = 'error'
                          AND e.ts > m3.ts_1 AND e.ts < m3.ts_3
                        ORDER BY e.ts, e.event_id LIMIT 1) AS first_err_id,
                       (SELECT e.ts FROM events e
                        WHERE e.user_id = m3.user_id
                          AND e.event_type = 'error'
                          AND e.ts > m3.ts_1 AND e.ts < m3.ts_3
                        ORDER BY e.ts DESC, e.event_id DESC LIMIT 1)
                           AS last_err_ts,
                       (SELECT e.event_id FROM events e
                        WHERE e.user_id = m3.user_id
                          AND e.event_type = 'error'
                          AND e.ts > m3.ts_1 AND e.ts < m3.ts_3
                        ORDER BY e.ts DESC, e.event_id DESC LIMIT 1)
                           AS last_err_id
                FROM m3
            ) WHERE n_err <= 2
        """,
        "rollup_revenue": """
            SELECT c_mktsegment, o_orderpriority,
                   COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY ROLLUP (c_mktsegment, o_orderpriority)
        """,
        "asof_join_events": """
            SELECT p.event_id AS purchase_id,
                   (SELECT c.event_id FROM events c
                     WHERE c.user_id = p.user_id AND c.event_type = 'click'
                       AND c.ts <= p.ts
                     ORDER BY c.ts DESC, c.event_id LIMIT 1) AS click_id
            FROM events p WHERE p.event_type = 'purchase'
        """,
        "cep_final_loop_events": """
            WITH v AS (
                SELECT user_id, ts AS ts_1, event_id AS id_1
                FROM events WHERE event_type = 'view'
            ), h AS (
                SELECT v.user_id, v.ts_1, v.id_1, e.ts AS ht, e.event_id AS hi
                FROM v JOIN events e
                  ON e.user_id = v.user_id AND e.event_type = 'click'
                 AND e.ts > v.ts_1 AND e.ts <= v.ts_1 + INTERVAL '12 hours'
            ), rn AS (
                SELECT *,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id, id_1 ORDER BY ht, hi) AS rf,
                       COUNT(*) OVER (PARTITION BY user_id, id_1) AS n
                FROM h
            )
            SELECT user_id, ts_1, id_1,
                   CAST(LEAST(n, 4) AS BIGINT) AS n_c,
                   MAX(CASE WHEN rf = 1 THEN ht END) AS first_c_ts,
                   MAX(CASE WHEN rf = 1 THEN hi END) AS first_c_id,
                   MAX(CASE WHEN rf = LEAST(n, 4) THEN ht END) AS last_c_ts,
                   MAX(CASE WHEN rf = LEAST(n, 4) THEN hi END) AS last_c_id
            FROM rn GROUP BY user_id, ts_1, id_1, n
            HAVING n >= 2
        """,
        "session_transcripts": """
            WITH src AS (
                SELECT * FROM read_parquet('/tmp/rtfproc_oracle_stage/session_input/*.parquet')
            ), flagged AS (
                SELECT conv_id, ts, n_text_bytes,
                       CASE WHEN ts - LAG(ts) OVER (PARTITION BY conv_id ORDER BY ts)
                                 <= INTERVAL '30 minutes'
                            THEN 0 ELSE 1 END AS new_sess
                FROM src
            ), sess AS (
                SELECT *, SUM(new_sess) OVER (
                    PARTITION BY conv_id ORDER BY ts ROWS UNBOUNDED PRECEDING
                ) AS sid FROM flagged
            )
            SELECT conv_id, MIN(ts) AS session_start,
                   MAX(ts) + INTERVAL '30 minutes' AS session_end,
                   COUNT(*) AS n_turns,
                   CAST(SUM(n_text_bytes) AS BIGINT) AS text_bytes
            FROM sess GROUP BY conv_id, sid
        """,
        "cep_contiguous_events": """
            WITH v AS (
                SELECT user_id, ts AS ts_1, event_id AS id_1
                FROM events WHERE event_type = 'view'
            ), s2 AS (
                SELECT * FROM (
                    SELECT v.*, e.ts AS ts_2, e.event_id AS id_2,
                           ROW_NUMBER() OVER (
                               PARTITION BY v.user_id, v.ts_1, v.id_1
                               ORDER BY e.ts, e.event_id) AS rn
                    FROM v JOIN events e
                      ON e.user_id = v.user_id AND e.event_type = 'click'
                     AND e.ts > v.ts_1
                     AND e.ts <= v.ts_1 + INTERVAL '12 hours'
                ) WHERE rn = 1
            ), s2k AS (
                -- strict step 2: no event of ANY type strictly between
                -- the anchor and the bound click in (ts, id) order
                SELECT * FROM s2 WHERE NOT EXISTS (
                    SELECT 1 FROM events x
                     WHERE x.user_id = s2.user_id AND x.ts > s2.ts_1
                       AND (x.ts < s2.ts_2
                            OR (x.ts = s2.ts_2 AND x.event_id < s2.id_2)))
            ), s3 AS (
                SELECT * FROM (
                    SELECT s2k.*, e.ts AS ts_3, e.event_id AS id_3,
                           ROW_NUMBER() OVER (
                               PARTITION BY s2k.user_id, s2k.ts_1, s2k.id_1
                               ORDER BY e.ts, e.event_id) AS rn2
                    FROM s2k JOIN events e
                      ON e.user_id = s2k.user_id AND e.event_type = 'purchase'
                     AND e.ts > s2k.ts_2
                     AND e.ts <= s2k.ts_1 + INTERVAL '12 hours'
                ) WHERE rn2 = 1
            )
            SELECT user_id, ts_1, id_1, ts_2, id_2, ts_3, id_3 FROM s3
            WHERE NOT EXISTS (
                SELECT 1 FROM events x
                 WHERE x.user_id = s3.user_id AND x.ts > s3.ts_2
                   AND (x.ts < s3.ts_3
                        OR (x.ts = s3.ts_3 AND x.event_id < s3.id_3)))
        """,
        "conversation_tracker": """
            SELECT conv_id, turn_idx, role, ts,
                   ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY ts, turn_idx)
                       AS turns_seen,
                   epoch(ts) - LAG(epoch(ts)) OVER (
                       PARTITION BY conv_id ORDER BY ts, turn_idx)
                       AS secs_since_prev,
                   COALESCE(LAG(role) OVER (
                       PARTITION BY conv_id ORDER BY ts, turn_idx) <> role, FALSE)
                       AS is_role_switch
            FROM read_parquet('/tmp/rtfproc_oracle_stage/transcripts/*.parquet')
        """,
        "rtf_passthrough_docs": """
            SELECT doc_id, text AS rtf_out, text AS plain_text,
                   CAST(NULL AS VARCHAR) AS error
            FROM documents
        """,
        # staged-expected differentials: the expected side is computed
        # driver-side by an INDEPENDENT local implementation (pure kernel /
        # plain numpy), the Spark side distributed — a true golden diff.
        "rtf_extract_transcripts": """
            SELECT conv_id, turn_idx, role, rtf_out, plain_text, error,
                   n_text_bytes
            FROM read_parquet('/tmp/rtfproc_oracle_stage/rtf_extract_expected/*.parquet')
        """,
        "cep_session_funnel_events": """
            WITH o AS (
                SELECT user_id, event_id, event_type, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR ts > lag(ts) OVER w + INTERVAL '2 hours'
                            THEN 1 ELSE 0 END AS ns
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
                SELECT *, CAST(SUM(ns) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING
                ) AS BIGINT) AS session_id
                FROM o
            ), s1 AS (
                SELECT user_id, session_id, ts AS ts_1, event_id AS id_1
                FROM s WHERE event_type = 'view'
            ), s2 AS (
                SELECT user_id, session_id, ts_1, id_1,
                       t AS ts_2, i AS id_2 FROM (
                    SELECT s1.user_id, s1.session_id, s1.ts_1, s1.id_1,
                           e.ts AS t, e.event_id AS i,
                           ROW_NUMBER() OVER (
                               PARTITION BY s1.user_id, s1.session_id,
                                            s1.ts_1, s1.id_1
                               ORDER BY e.ts, e.event_id) AS rn
                    FROM s1 JOIN s e
                      ON e.user_id = s1.user_id
                     AND e.session_id = s1.session_id
                     AND e.event_type = 'purchase'
                     AND e.ts > s1.ts_1
                ) WHERE rn = 1
            )
            SELECT user_id, session_id, ts_1, id_1, ts_2, id_2 FROM s2
        """,
        "minhash_pairs_docs": """
            SELECT id_a, id_b, jaccard
            FROM read_parquet('/tmp/rtfproc_oracle_stage/minhash_pairs_expected/*.parquet')
        """,
        "ivf_topk": """
            SELECT vec_id, cosine
            FROM read_parquet('/tmp/rtfproc_oracle_stage/ivf_topk_expected/*.parquet')
        """,
        "stream_semantic_dedup": """
            SELECT vec_id, batch_id
            FROM read_parquet('/tmp/rtfproc_oracle_stage/stream_semdedup_expected/*.parquet')
        """,
        "train_split_docs": """
            SELECT doc_id, bucket, split
            FROM read_parquet('/tmp/rtfproc_oracle_stage/train_split_expected/*.parquet')
        """,
        "bucketed_conv_stats": """
            SELECT conv_id,
                   COUNT(*) AS n_turns,
                   MIN(ts) AS first_ts,
                   MAX(ts) AS last_ts,
                   CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_user_turns
            FROM read_parquet('/tmp/rtfproc_oracle_stage/bucketed_oracle_src/*.parquet')
            GROUP BY conv_id
        """,
        "gopher_filter_docs": """
            WITH sig AS (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                       ROUND(LENGTH(replace(text, ' ', ''))
                             / GREATEST(len(string_split(text, ' ')), 1), 4)
                           AS mean_word_len,
                       ROUND(len(list_filter(string_split(text, ' '),
                                             w -> regexp_matches(w, '[A-Za-z]')))
                             / GREATEST(len(string_split(text, ' ')), 1), 4)
                           AS frac_alpha_words,
                       ROUND(1 - len(list_distinct(string_split(text, '. ')))
                             / GREATEST(len(string_split(text, '. ')), 1), 4)
                           AS dup_sent_frac
                FROM read_parquet('/tmp/rtfproc_oracle_stage/gopher_docs_input/*.parquet')
            ), toks AS (
                SELECT doc_id, string_split(text, ' ') AS w,
                       GREATEST(LENGTH(text), 1) AS tl
                FROM read_parquet('/tmp/rtfproc_oracle_stage/gopher_docs_input/*.parquet')
            ), gr AS (
                SELECT doc_id, 2 AS n, tl,
                       unnest(list_transform(
                           range(1, GREATEST(len(w) - 1, 0) + 1),
                           i -> array_to_string(w[i:i+1], ' '))) AS g
                FROM toks
                UNION ALL
                SELECT doc_id, 3, tl,
                       unnest(list_transform(
                           range(1, GREATEST(len(w) - 2, 0) + 1),
                           i -> array_to_string(w[i:i+2], ' ')))
                FROM toks
                UNION ALL
                SELECT doc_id, 4, tl,
                       unnest(list_transform(
                           range(1, GREATEST(len(w) - 3, 0) + 1),
                           i -> array_to_string(w[i:i+3], ' ')))
                FROM toks
            ), cnts AS (
                SELECT doc_id, n, g, ANY_VALUE(tl) AS tl, COUNT(*) AS c
                FROM gr GROUP BY doc_id, n, g
            ), cov AS (
                SELECT doc_id, n,
                       ROUND(LEAST(MAX(c * LENGTH(g)) / ANY_VALUE(tl), 1.0), 4)
                           AS frac
                FROM cnts GROUP BY doc_id, n
            ), covp AS (
                SELECT sig.doc_id,
                       COALESCE(MAX(CASE WHEN n = 2 THEN frac END), 0)
                           AS dup_2gram_frac,
                       COALESCE(MAX(CASE WHEN n = 3 THEN frac END), 0)
                           AS dup_3gram_frac,
                       COALESCE(MAX(CASE WHEN n = 4 THEN frac END), 0)
                           AS dup_4gram_frac
                FROM sig LEFT JOIN cov ON sig.doc_id = cov.doc_id
                GROUP BY sig.doc_id
            )
            SELECT sig.doc_id, n_words, mean_word_len, frac_alpha_words,
                   dup_sent_frac, dup_2gram_frac, dup_3gram_frac,
                   dup_4gram_frac,
                   (mean_word_len >= 3 AND mean_word_len <= 10
                    AND frac_alpha_words >= 0.8 AND dup_sent_frac < 0.3
                    AND dup_2gram_frac <= 0.20 AND dup_3gram_frac <= 0.18
                    AND dup_4gram_frac <= 0.16)
                       AS quality_pass
            FROM sig JOIN covp ON sig.doc_id = covp.doc_id
        """,
        "contamination_hits": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS w FROM documents
            ), dg AS (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                           range(1, GREATEST(len(w) - 7, 0) + 1),
                           i -> array_to_string(w[i:i+7], ' ')))) AS g
                FROM toks
            ), eg AS (
                SELECT DISTINCT g FROM dg WHERE doc_id % 50 = 0
            ), hits AS (
                SELECT dg.doc_id, COUNT(*) AS n
                FROM dg JOIN eg USING (g)
                GROUP BY dg.doc_id
            )
            SELECT d.doc_id,
                   COALESCE(hits.n, 0) AS n_contaminated_grams,
                   COALESCE(hits.n, 0) >= 1 AS contaminated
            FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id
        """,
        "stream_contamination_docs": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS w FROM documents
            ), dg AS (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                           range(1, GREATEST(len(w) - 7, 0) + 1),
                           i -> array_to_string(w[i:i+7], ' ')))) AS g
                FROM toks
            ), eg AS (
                SELECT DISTINCT g FROM dg WHERE doc_id % 50 = 0
            ), hits AS (
                SELECT dg.doc_id, COUNT(*) AS n
                FROM dg JOIN eg USING (g)
                GROUP BY dg.doc_id
            )
            SELECT d.doc_id,
                   COALESCE(hits.n, 0) AS n_contaminated_grams,
                   COALESCE(hits.n, 0) >= 1 AS contaminated
            FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id
        """,
        "pii_scrub_docs": """
            SELECT doc_id,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(text,
                               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+',
                               '<EMAIL>', 'g'),
                           'https?://[^ \t\n\r]+', '<URL>', 'g'),
                       '\\+?[0-9][0-9()\\- ]{6,}[0-9]', '<PHONE>', 'g')
                       AS clean_text
            FROM read_parquet('/tmp/rtfproc_oracle_stage/pii_docs_input/*.parquet')
        """,
        "pack_docs": """
            -- two-phase sharded packing recomputed independently:
            -- local bin within (lang, shard = doc_id % 8), then each
            -- shard's bins offset by the exclusive prefix sum of per-shard
            -- bin counts ((total - last_doc_size) // budget + 1)
            WITH d AS (
                SELECT doc_id, lang,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                       doc_id % 8 AS shard
                FROM documents
            ), loc AS (
                SELECT doc_id, lang, n_tokens, shard,
                       CAST(FLOOR((SUM(n_tokens) OVER (
                           PARTITION BY lang, shard ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - n_tokens) / 512.0)
                       AS BIGINT) AS local_bin
                FROM d
            ), cnt AS (
                SELECT lang, shard,
                       CAST(FLOOR((SUM(n_tokens) - arg_max(n_tokens, doc_id))
                            / 512.0) AS BIGINT) + 1 AS nbins
                FROM d GROUP BY lang, shard
            ), off AS (
                SELECT lang, shard,
                       COALESCE(SUM(nbins) OVER (
                           PARTITION BY lang ORDER BY shard
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS offs
                FROM cnt
            )
            SELECT loc.doc_id AS doc_id, loc.lang AS lang,
                   loc.n_tokens AS n_tokens,
                   CAST(loc.local_bin + off.offs AS BIGINT) AS pack_bin
            FROM loc JOIN off ON loc.lang = off.lang AND loc.shard = off.shard
        """,
        "training_set_docs": """
            WITH keep AS (
                SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
            ), sc AS (
                SELECT doc_id, text,
                       len(regexp_extract_all(text, '(?i)\\bthe\\b'))
                     + len(regexp_extract_all(text, '(?i)\\band\\b'))
                     + len(regexp_extract_all(text, '(?i)\\bof\\b'))
                     + len(regexp_extract_all(text, '(?i)\\bto\\b'))
                     + len(regexp_extract_all(text, '(?i)\\bis\\b')) AS s_en,
                       len(regexp_extract_all(text, '(?i)\\bder\\b'))
                     + len(regexp_extract_all(text, '(?i)\\bdie\\b'))
                     + len(regexp_extract_all(text, '(?i)\\bund\\b'))
                     + len(regexp_extract_all(text, '(?i)\\bist\\b'))
                     + len(regexp_extract_all(text, '(?i)\\bnicht\\b')) AS s_de,
                       len(regexp_extract_all(text, '(?i)\\ble\\b'))
                     + len(regexp_extract_all(text, '(?i)\\bla\\b'))
                     + len(regexp_extract_all(text, '(?i)\\bet\\b'))
                     + len(regexp_extract_all(text, '(?i)\\best\\b'))
                     + len(regexp_extract_all(text, '(?i)\\bles\\b')) AS s_fr,
                       len(regexp_extract_all(text, '(?i)\\bel\\b'))
                     + len(regexp_extract_all(text, '(?i)\\bla\\b'))
                     + len(regexp_extract_all(text, '(?i)\\bque\\b'))
                     + len(regexp_extract_all(text, '(?i)\\bde\\b'))
                     + len(regexp_extract_all(text, '(?i)\\blos\\b')) AS s_es
                FROM documents WHERE doc_id IN (SELECT doc_id FROM keep)
            ), best AS (
                SELECT doc_id, text,
                       list_sort([{'s': s_en, 'l': 'en'}, {'s': s_de, 'l': 'de'},
                                  {'s': s_fr, 'l': 'fr'}, {'s': s_es, 'l': 'es'}])[4] AS b
                FROM sc
            ), q AS (
                SELECT doc_id, b,
                       LENGTH(text) AS n_chars,
                       len(string_split(text, ' ')) AS n_tokens,
                       LENGTH(regexp_replace(text, '[^\\.,;:!?]', '', 'g')) AS n_punct,
                         CASE WHEN regexp_matches(text, '(^|[ \t\n\x0B\f\r])the([ \t\n\x0B\f\r]|$)') THEN 1 ELSE 0 END
                       + CASE WHEN regexp_matches(text, '(^|[ \t\n\x0B\f\r])a([ \t\n\x0B\f\r]|$)') THEN 1 ELSE 0 END
                       + CASE WHEN regexp_matches(text, '(^|[ \t\n\x0B\f\r])of([ \t\n\x0B\f\r]|$)') THEN 1 ELSE 0 END
                       + CASE WHEN regexp_matches(text, '(^|[ \t\n\x0B\f\r])to([ \t\n\x0B\f\r]|$)') THEN 1 ELSE 0 END
                       + CASE WHEN regexp_matches(text, '(^|[ \t\n\x0B\f\r])and([ \t\n\x0B\f\r]|$)') THEN 1 ELSE 0 END
                       + CASE WHEN regexp_matches(text, '(^|[ \t\n\x0B\f\r])in([ \t\n\x0B\f\r]|$)') THEN 1 ELSE 0 END
                       + CASE WHEN regexp_matches(text, '(^|[ \t\n\x0B\f\r])is([ \t\n\x0B\f\r]|$)') THEN 1 ELSE 0 END
                       + CASE WHEN regexp_matches(text, '(^|[ \t\n\x0B\f\r])it([ \t\n\x0B\f\r]|$)') THEN 1 ELSE 0 END
                       + CASE WHEN regexp_matches(text, '(^|[ \t\n\x0B\f\r])that([ \t\n\x0B\f\r]|$)') THEN 1 ELSE 0 END
                       AS stop_hits
                FROM best
            ), lid AS (
                SELECT doc_id,
                       CASE WHEN b.s > 0 THEN b.l ELSE 'und' END AS lang_pred,
                       ROUND(LEAST(1.0,
                           (LEAST(n_chars / GREATEST(n_tokens, 1), 8.0) / 8.0) * 0.4
                         + (1.0 - LEAST(n_punct / GREATEST(n_chars, 1) * 5.0, 1.0)) * 0.3
                         + (stop_hits / 9.0) * 0.3), 4) AS quality,
                       CAST(n_tokens AS BIGINT) AS n_tokens
                FROM q
            )
            SELECT doc_id, lang_pred, quality, n_tokens FROM lid
            WHERE lang_pred = 'en' AND quality >= 0.5
              AND n_tokens BETWEEN 5 AND 2000
        """,
        "dup_span_docs": r"""
            WITH w AS (
              SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
              FROM documents
            ), g AS (
              SELECT doc_id, u.pos AS pos, u.gram AS gram FROM (
                SELECT doc_id,
                       unnest(list_transform(
                         range(1, greatest(len(ws) - 4, 0) + 1),
                         i -> {'pos': i,
                               'gram': array_to_string(ws[i:i+4], ' ')})) AS u
                FROM w
              )
            ), dup AS (
              SELECT gram FROM g GROUP BY gram
              HAVING COUNT(DISTINCT doc_id) >= 2
            ), starts AS (
              SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)
            ), cnt AS (
              SELECT doc_id, COUNT(*) AS n_dup_grams FROM starts GROUP BY doc_id
            ), cov AS (
              SELECT doc_id, COUNT(DISTINCT p) AS covered_tokens FROM (
                SELECT doc_id, pos + j.j AS p
                FROM starts, (SELECT unnest(range(0, 5)) AS j) j
              ) GROUP BY doc_id
            )
            SELECT w.doc_id, len(ws) AS n_tokens,
                   COALESCE(c.n_dup_grams, 0) AS n_dup_grams,
                   COALESCE(v.covered_tokens, 0) AS covered_tokens,
                   ROUND(COALESCE(v.covered_tokens, 0) / len(ws), 4) AS dup_coverage
            FROM w
            LEFT JOIN cnt c ON w.doc_id = c.doc_id
            LEFT JOIN cov v ON w.doc_id = v.doc_id
        """,
        "dedup_keeplist_docs": """
            SELECT id, component, keep
            FROM read_parquet('/tmp/rtfproc_oracle_stage/dedup_keeplist_expected/*.parquet')
        """,
        "cep_rows_events": """
            WITH s1 AS (
                SELECT user_id, ts AS ts_1, event_id AS id_1
                FROM events WHERE event_type = 'view'
            ), m2 AS (
                SELECT user_id, ts_1, id_1, t AS ts_2, i AS id_2 FROM (
                    SELECT s1.user_id, s1.ts_1, s1.id_1,
                           e.ts AS t, e.event_id AS i,
                           ROW_NUMBER() OVER (
                               PARTITION BY s1.user_id, s1.ts_1, s1.id_1
                               ORDER BY e.ts, e.event_id) AS rn
                    FROM s1 JOIN events e
                      ON e.user_id = s1.user_id AND e.event_type = 'click'
                     AND e.ts > s1.ts_1
                     AND e.ts <= s1.ts_1 + INTERVAL '12 hours'
                ) WHERE rn = 1
            ), m3 AS (
                SELECT user_id, ts_1, id_1, ts_2, id_2,
                       t AS ts_3, i AS id_3 FROM (
                    SELECT m2.user_id, m2.ts_1, m2.id_1, m2.ts_2, m2.id_2,
                           e.ts AS t, e.event_id AS i,
                           ROW_NUMBER() OVER (
                               PARTITION BY m2.user_id, m2.ts_1, m2.id_1
                               ORDER BY e.ts, e.event_id) AS rn
                    FROM m2 JOIN events e
                      ON e.user_id = m2.user_id
                     AND e.event_type = 'purchase'
                     AND e.ts > m2.ts_2
                     AND e.ts <= m2.ts_1 + INTERVAL '12 hours'
                ) WHERE rn = 1
            ), numbered AS (
                SELECT *, DENSE_RANK() OVER (
                    PARTITION BY user_id ORDER BY ts_1, id_1) AS match_no
                FROM m3
            ), expanded AS (
                SELECT user_id, match_no, 1 AS row_in_match,
                       'v' AS classifier, id_1 AS event_id, id_1 AS anchor_id
                FROM numbered
                UNION ALL
                SELECT user_id, match_no, 2, 'c', id_2, id_1 FROM numbered
                UNION ALL
                SELECT user_id, match_no, 3, 'p', id_3, id_1 FROM numbered
            )
            SELECT r.user_id,
                   CAST(r.match_no AS BIGINT) AS match_no,
                   CAST(r.row_in_match AS BIGINT) AS row_in_match,
                   r.classifier, r.event_id, e.event_type, e.ts, e.value,
                   r.anchor_id,
                   CAST(r.row_in_match AS BIGINT) AS rn_running,
                   SUM(CASE WHEN r.classifier = 'c' THEN e.value END)
                       OVER (PARTITION BY r.user_id, r.match_no
                             ORDER BY r.row_in_match
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS run_click_val,
                   SUM(CASE WHEN r.classifier = 'c' THEN e.value END)
                       OVER (PARTITION BY r.user_id, r.match_no)
                       AS fin_click_val
            FROM expanded r JOIN events e
              ON e.user_id = r.user_id AND e.event_id = r.event_id
        """,
        "rtf_strip_transcripts": """
            SELECT conv_id, turn_idx, plain_text
            FROM read_parquet('/tmp/rtfproc_oracle_stage/rtf_strip_expected/*.parquet')
        """,
        "media_decode": """
            SELECT media_id, kind, n_bytes, sha256, feat_digest, decode_error
            FROM read_parquet('/tmp/rtfproc_oracle_stage/media_expected/*.parquet')
        """,
        "bpe_tokens_docs": """
            SELECT doc_id, n_bpe_tokens
            FROM read_parquet('/tmp/rtfproc_oracle_stage/bpe_tokens_expected/*.parquet')
        """,
        "lineage_file_rows": """
            SELECT regexp_extract(filename, '([^/]+)$', 1) AS file,
                   COUNT(*) AS rows,
                   ROUND(SUM(l_quantity), 2) AS sum_qty
            FROM read_parquet('/tmp/rtfproc_oracle_stage/lineage_src/*.parquet', filename=true)
            GROUP BY 1
        """,
        # exact set-Jaccard over ALL pairs of the planted corpus: a pass
        # proves the LSH candidate stage reached full recall here AND the
        # verification math is exact.
        "ngram_jaccard_docs": """
            WITH docs AS (
                -- lower() matches word_ngrams' lowercasing (dedup.py): a
                -- case-variant shingle collision must score identically on
                -- both sides, not pass by corpus luck
                SELECT doc_id, string_split(lower(text), ' ') AS words
                FROM read_parquet('/tmp/rtfproc_oracle_stage/neardup_docs/*.parquet')
            ), grams AS (
                SELECT doc_id, unnest(
                    CASE WHEN len(words) >= 3
                         THEN [array_to_string(words[i:i+2], ' ')
                               FOR i IN generate_series(1, len(words) - 2)]
                         ELSE [array_to_string(words, ' ')] END) AS g
                FROM docs
            ), dg AS (
                SELECT DISTINCT doc_id, g FROM grams
            ), sizes AS (
                SELECT doc_id, COUNT(*) AS n FROM dg GROUP BY 1
            ), inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
                FROM dg a JOIN dg b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   ROUND(i / GREATEST(sa.n + sb.n - i, 1), 4) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE ROUND(i / GREATEST(sa.n + sb.n - i, 1), 4) >= 0.8
        """,
        # brute-force cosine over ALL pairs of the planted corpus
        "embedding_near_pairs": """
            WITH e AS (
                SELECT vec_id, embedding::DOUBLE[] AS v
                FROM read_parquet('/tmp/rtfproc_oracle_stage/neardup_embeddings/*.parquet')
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_cosine_similarity(a.v, b.v), 4) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE ROUND(list_cosine_similarity(a.v, b.v), 4) >= 0.95
        """,
        "semdedup_embeddings": """
            SELECT vec_id, cluster, keep, rep_id
            FROM read_parquet('/tmp/rtfproc_oracle_stage/semdedup_expected/*.parquet')
        """,
        "simhash_near_docs": """
            SELECT id_a, id_b, hamming
            FROM read_parquet('/tmp/rtfproc_oracle_stage/simhash_near_expected/*.parquet')
        """,
        "ann_lsh_topk": """
            SELECT vec_id,
                   ROUND(list_cosine_similarity(embedding::DOUBLE[],
                         (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4) AS cosine
            FROM embeddings
            ORDER BY cosine DESC, vec_id ASC
            LIMIT 10
        """,
        # stream == batch: the streaming queries' oracles are the SAME batch
        # SQL as their batch counterparts (exactly-once criterion).
        "stream_near_dedup": """
            SELECT doc_id, batch_id
            FROM read_parquet('/tmp/rtfproc_oracle_stage/stream_neardedup_expected/*.parquet')
        """,
        "stream_session_events": """
            WITH flagged AS (
                SELECT user_id, ts, value,
                       CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 <= INTERVAL '30 minutes'
                            THEN 0 ELSE 1 END AS new_sess
                FROM events
            ), sess AS (
                SELECT *, SUM(new_sess) OVER (
                    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
                ) AS sid
                FROM flagged
            )
            SELECT user_id,
                   MIN(ts) AS session_start,
                   MAX(ts) + INTERVAL '30 minutes' AS session_end,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 4) AS sum_value
            FROM sess GROUP BY user_id, sid
        """,
        "stream_user_assistant_join": """
            WITH src AS (
                SELECT * FROM read_parquet('/tmp/rtfproc_oracle_stage/stream_tracker_src/*.parquet')
            )
            SELECT u.conv_id AS conv_id,
                   u.turn_idx AS user_turn_idx, u.ts AS user_ts,
                   a.turn_idx AS asst_turn_idx, a.role AS asst_role,
                   a.ts AS asst_ts
            FROM src u JOIN src a
              ON u.conv_id = a.conv_id
             AND u.role = 'user' AND a.role <> 'user'
             AND a.ts >= u.ts AND a.ts <= u.ts + INTERVAL '10 minutes'
        """,
        "stream_resume_tumbling": """
            SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
                   time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS window_end,
                   event_type,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 4) AS sum_value
            FROM events GROUP BY 1, 2, 3
        """,
        "stream_dedup_events": """
            SELECT DISTINCT event_id, ts, user_id, event_type,
                   ROUND(value, 4) AS value
            FROM read_parquet('/tmp/rtfproc_oracle_stage/stream_dup_events_src/*.parquet')
        """,
        "stream_resume_tracker": """
            SELECT conv_id, turn_idx, role, ts,
                   ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY ts, turn_idx)
                       AS turns_seen,
                   epoch(ts) - LAG(epoch(ts)) OVER (
                       PARTITION BY conv_id ORDER BY ts, turn_idx)
                       AS secs_since_prev,
                   COALESCE(LAG(role) OVER (
                       PARTITION BY conv_id ORDER BY ts, turn_idx) <> role, FALSE)
                       AS is_role_switch
            FROM read_parquet('/tmp/rtfproc_oracle_stage/stream_tracker_src/*.parquet')
        """,
        "stream_conversation_tracker": """
            SELECT conv_id, turn_idx, role, ts,
                   ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY ts, turn_idx)
                       AS turns_seen,
                   epoch(ts) - LAG(epoch(ts)) OVER (
                       PARTITION BY conv_id ORDER BY ts, turn_idx)
                       AS secs_since_prev,
                   COALESCE(LAG(role) OVER (
                       PARTITION BY conv_id ORDER BY ts, turn_idx) <> role, FALSE)
                       AS is_role_switch
            FROM read_parquet('/tmp/rtfproc_oracle_stage/stream_tracker_src/*.parquet')
        """,
    }
