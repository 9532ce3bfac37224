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


def _epoch_secs(col) -> "F.Column":
    # TIMESTAMP_NTZ cannot cast straight to double in Spark 4; go via
    # session-UTC timestamp first (value-preserving under UTC).
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("double")


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

def _q_tumbling_events(spark, sf_dir):
    from rtfproc_spark.operators.windows import tumbling_agg

    ev = _read(spark, sf_dir, "events")
    return tumbling_agg(
        ev,
        "ts",
        ["event_type"],
        "5 minutes",
        [
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        ],
    ).select("window_start", "window_end", "event_type", "n_events", "sum_value")


def _q_sliding_events(spark, sf_dir):
    from rtfproc_spark.operators.windows import sliding_agg

    ev = _read(spark, sf_dir, "events")
    return sliding_agg(
        ev,
        "ts",
        ["event_type"],
        "10 minutes",
        "5 minutes",
        [
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        ],
    ).select("window_start", "window_end", "event_type", "n_events", "sum_value")


def _q_session_events(spark, sf_dir):
    from rtfproc_spark.operators.windows import session_agg

    ev = _read(spark, sf_dir, "events")
    return session_agg(
        ev,
        "ts",
        ["user_id"],
        "30 minutes",
        [
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        ],
    ).select("user_id", "session_start", "session_end", "n_events", "sum_value")


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
    from rtfproc_spark.functions.text import token_count

    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_calc"),
        token_count("text").cast("long").alias("n_tokens"),
    )


def _q_lang_quality_agg(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
    )


def _q_top_mktsegments(spark, sf_dir):
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
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


# ---- rows-only checks (not SQL-expressible: kernel quirks / LSH / hashes)

def _q_rtf_extract_transcripts(spark, sf_dir):
    from rtfproc_spark.functions.rtf import with_rtf_extract
    from rtfproc_spark.sources.transcripts import (
        DEFAULT_REPLACEMENTS,
        synthesize_transcripts_df,
    )

    t = synthesize_transcripts_df(spark, n_convs=60, turns_per_conv=5)
    return with_rtf_extract(t, DEFAULT_REPLACEMENTS).select(
        "conv_id", "turn_idx", "role", "rtf_out", "plain_text", "error", "n_text_bytes"
    )


_STAGE = "/tmp/rtfproc_oracle_stage"


def _stage(spark, name: str, df) -> "DataFrame":
    """Write a deterministic frame to a stage dir both engines read: the
    Spark query aggregates the STAGED data and the DuckDB oracle reads the
    same files, so the value check covers the aggregation exactly."""
    path = f"{_STAGE}/{name}"
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


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


def _q_user_assistant_join(spark, sf_dir):
    from rtfproc_spark.operators.joins import user_assistant_join

    t = _staged_transcripts(spark)
    return user_assistant_join(t)


def _q_minhash_pairs_docs(spark, sf_dir):
    from rtfproc_spark.functions.dedup import minhash_candidates

    docs = _read(spark, sf_dir, "documents")
    return minhash_candidates(docs)


def _q_simhash_docs(spark, sf_dir):
    from rtfproc_spark.functions.dedup import simhash_signature_df

    docs = _read(spark, sf_dir, "documents")
    return simhash_signature_df(docs)


def _q_top_events_per_user(spark, sf_dir):
    # top-3 purchases per user by value (window-function rank)
    from pyspark.sql.window import Window

    ev = _read(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return (
        ev.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("user_id", "event_id", F.round("value", 4).alias("value"), "rk")
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
    from rtfproc_spark.operators.joins import asof_join

    ev = _read(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    j = asof_join(
        purchases, clicks, "user_id", "ts", "ts", "backward", tiebreak="event_id"
    )
    return j.select(
        F.col("event_id").alias("purchase_id"),
        F.col("r_event_id").alias("click_id"),
    )


def _q_event_tracker(spark, sf_dir):
    # B12's batch oracle shape over the events stream: running event count
    # and inter-event gap per user (window functions, exactly SQL-expressible)
    from pyspark.sql.window import Window

    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).cast("long").alias("events_seen"),
        F.round(_epoch_secs("ts") - F.lag(_epoch_secs("ts")).over(w), 4).alias(
            "secs_since_prev"
        ),
    )


def _q_simhash_near_docs(spark, sf_dir):
    from rtfproc_spark.functions.dedup import simhash_near_pairs

    docs = _read(spark, sf_dir, "documents")
    return simhash_near_pairs(docs, max_hamming=3)


def _q_ngram_jaccard_docs(spark, sf_dir):
    from rtfproc_spark.functions.dedup import ngram_jaccard_pairs

    docs = _read(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.8)


def _q_embedding_near_pairs(spark, sf_dir):
    from rtfproc_spark.functions.similarity import all_pairs_near

    emb = _read(spark, sf_dir, "embeddings")
    return all_pairs_near(emb, threshold=0.9, bits=8)


def _q_lang_id_docs(spark, sf_dir):
    from rtfproc_spark.functions.text import lang_id, quality_score, token_count

    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        lang_id("text").alias("lang_pred"),
        quality_score("text").alias("quality"),
        token_count("text").alias("n_tokens"),
    )


def _q_media_decode(spark, sf_dir):
    from rtfproc_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        synth_media_pdf,
    )

    df = spark.createDataFrame(synth_media_pdf(128), schema=MEDIA_SCHEMA)
    return decode_media(df)


def _q_conversation_tracker(spark, sf_dir):
    from rtfproc_spark.streaming.stateful import conversation_tracker_batch

    t = _staged_transcripts(spark)
    return conversation_tracker_batch(t)


def _q_ann_lsh_topk(spark, sf_dir):
    from rtfproc_spark.functions.similarity import lsh_bucket_topk

    emb = _read(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return lsh_bucket_topk(emb, qvec, k=10, bits=4)


def _wrap(fn):
    def wrapped(spark, sf_dir):
        _ensure_pkg_on_executors(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tumbling_events": _wrap(_q_tumbling_events),
        "sliding_events": _wrap(_q_sliding_events),
        "session_events": _wrap(_q_session_events),
        "interval_join_events": _wrap(_q_interval_join_events),
        "salted_agg_events": _wrap(_q_salted_agg_events),
        "dedup_exact_docs": _wrap(_q_dedup_exact_docs),
        "doc_stats": _wrap(_q_doc_stats),
        "lang_quality_agg": _wrap(_q_lang_quality_agg),
        "top_mktsegments": _wrap(_q_top_mktsegments),
        "pricing_summary": _wrap(_q_pricing_summary),
        "embedding_topk": _wrap(_q_embedding_topk),
        "rtf_passthrough_docs": _wrap(_q_rtf_passthrough_docs),
        "rtf_extract_transcripts": _wrap(_q_rtf_extract_transcripts),
        "session_transcripts": _wrap(_q_session_transcripts),
        "user_assistant_join": _wrap(_q_user_assistant_join),
        "minhash_pairs_docs": _wrap(_q_minhash_pairs_docs),
        "asof_join_events": _wrap(_q_asof_join_events),
        "top_events_per_user": _wrap(_q_top_events_per_user),
        "rollup_revenue": _wrap(_q_rollup_revenue),
        "event_tracker": _wrap(_q_event_tracker),
        "simhash_near_docs": _wrap(_q_simhash_near_docs),
        "ngram_jaccard_docs": _wrap(_q_ngram_jaccard_docs),
        "embedding_near_pairs": _wrap(_q_embedding_near_pairs),
        "lang_id_docs": _wrap(_q_lang_id_docs),
        "media_decode": _wrap(_q_media_decode),
        "conversation_tracker": _wrap(_q_conversation_tracker),
        "simhash_docs": _wrap(_q_simhash_docs),
        "ann_lsh_topk": _wrap(_q_ann_lsh_topk),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "tumbling_events": """
            SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
                   time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS window_end,
                   event_type,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 4) AS sum_value
            FROM events GROUP BY 1, 2, 3
        """,
        "sliding_events": """
            SELECT time_bucket(INTERVAL '5 minutes', ts) - o * INTERVAL '5 minutes' AS window_start,
                   time_bucket(INTERVAL '5 minutes', ts) - o * INTERVAL '5 minutes' + INTERVAL '10 minutes' AS window_end,
                   event_type,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 4) AS sum_value
            FROM events CROSS JOIN (SELECT 0 AS o UNION ALL SELECT 1) offs
            GROUP BY 1, 2, 3
        """,
        "session_events": """
            WITH flagged AS (
                SELECT user_id, ts, value,
                       CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 < INTERVAL '30 minutes'
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
            SELECT doc_id, LENGTH(text) AS n_chars_calc,
                   LEN(string_split(text, ' ')) AS n_tokens
            FROM documents
        """,
        "lang_quality_agg": """
            SELECT lang, COUNT(*) AS n_docs, ROUND(AVG(LENGTH(text)), 4) AS avg_chars
            FROM documents GROUP BY lang
        """,
        "top_mktsegments": """
            SELECT c_mktsegment, COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
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
        "top_events_per_user": """
            SELECT user_id, event_id, ROUND(value, 4) AS value, rk FROM (
                SELECT user_id, event_id, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY value DESC, event_id) AS rk
                FROM events WHERE event_type = 'purchase'
            ) WHERE rk <= 3
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
        "event_tracker": """
            SELECT event_id, user_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS events_seen,
                   ROUND(epoch(ts) - LAG(epoch(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id), 4)
                       AS secs_since_prev
            FROM events
        """,
        "session_transcripts": """
            WITH src AS (
                SELECT * FROM read_parquet('/tmp/rtfproc_oracle_stage/session_input/*.parquet')
            ), flagged AS (
                SELECT conv_id, ts, n_text_bytes,
                       CASE WHEN ts - LAG(ts) OVER (PARTITION BY conv_id ORDER BY ts)
                                 < INTERVAL '30 minutes'
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
        "user_assistant_join": """
            WITH src AS (
                SELECT * FROM read_parquet('/tmp/rtfproc_oracle_stage/transcripts/*.parquet')
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
    }
