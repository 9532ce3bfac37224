"""Stateful / interval joins (SURVEY.md §2 B7).

Batch and streaming share the same join expression; on a stream both sides
carry watermarks and Spark plans a StreamingSymmetricHashJoin keyed by the
equi-condition (conv_id / user_id), with state eviction driven by the
time-interval bound. At scale the equi-key is the shuffle key — skewed keys
go through operators.skew first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "INTERVAL 10 MINUTES",
    how: str = "inner",
) -> DataFrame:
    """right event follows left event on the same key within max_delay."""
    l = left.alias("l")
    r = right.alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.expr(f"l.{left_ts} + {max_delay}"))
    )
    return l.join(r, cond, how)


def user_assistant_join(
    transcripts: DataFrame,
    max_delay: str = "INTERVAL 10 MINUTES",
) -> DataFrame:
    """Pair each user turn with assistant/tool responses in the same
    conversation within max_delay (the north-rule stateful join)."""
    user = transcripts.filter(F.col("role") == "user").select(
        F.col("conv_id"),
        F.col("turn_idx").alias("user_turn_idx"),
        F.col("ts").alias("user_ts"),
    )
    asst = transcripts.filter(F.col("role") != "user").select(
        F.col("conv_id").alias("a_conv_id"),
        F.col("turn_idx").alias("asst_turn_idx"),
        F.col("role").alias("asst_role"),
        F.col("ts").alias("asst_ts"),
    )
    cond = (
        (user.conv_id == asst.a_conv_id)
        & (asst.asst_ts >= user.user_ts)
        & (asst.asst_ts <= F.expr(f"user_ts + {max_delay}"))
    )
    return user.join(asst, cond, "inner").drop("a_conv_id")


# Measured single-window vs bucketed crossover for asof_join's hot-key
# mitigation (benchmarks/hotkey_asof_probe.py): single-window wins at 2M
# rows on one key, bucketed wins 7-10x at 20M. The midpoint guidance below
# is deliberately conservative — below it the bucketed path's ~4 extra
# small shuffles are pure overhead.
ASOF_HOT_KEY_CROSSOVER = 5_000_000


def suggest_time_bucket(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    target_rows_per_bucket: int = 1_000_000,
    crossover: int = ASOF_HOT_KEY_CROSSOVER,
) -> str | None:
    """Decision rule for ``asof_join(..., time_bucket=)`` — applies the
    probe-measured crossover without rerunning the probe: returns ``None``
    when the hottest key is under ``crossover`` rows (single-window form
    wins there), else a bucket duration sized so the hottest key's
    timeline splits into ~``rows / target_rows_per_bucket`` buckets.

    Runs ONE aggregation job over ``df`` (count + ts span per key, top-1
    by count) — call it on the bigger side, typically once per pipeline,
    and cache the answer; it is a planning helper, not a per-query step.
    """
    row = (
        df.groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            (
                F.unix_timestamp(F.max(ts_col))
                - F.unix_timestamp(F.min(ts_col))
            ).alias("_span"),
        )
        .orderBy(F.desc("_n"))
        .limit(1)
        .collect()
    )
    if not row:
        return None
    n, span = row[0]["_n"], row[0]["_span"] or 0
    if n < crossover or span <= 0:
        return None
    n_buckets = max(2, n // target_rows_per_bucket)
    return f"{max(1, int(span // n_buckets))} seconds"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tiebreak: str | None = None,
    right_prefix: str = "r_",
    time_bucket: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the single nearest right row at or
    before (backward) / at or after (forward) its timestamp.

    Linear union+window merge — NOT a join: tag both sides, union, and run
    ONE running ``last(right_struct, ignoreNulls)`` window per key ordered by
    time, so each left row picks up the most recent right row in a single
    pass. One shuffle (the window partitionBy), O(L+R) rows end-to-end —
    no (purchase x earlier-click) pair blow-up for hot keys, which makes it
    safe at 100 TB where a key with 10k right rows would otherwise
    materialize millions of intermediate rows.

    ``tiebreak`` (a right column, e.g. its id) makes equal-timestamp right
    rows deterministic: the winner is the LOWEST tiebreak value among rows
    sharing the boundary timestamp. Output: all left columns (original
    names) + right columns prefixed with ``right_prefix``.

    Skew ceiling: with ``time_bucket=None`` the window partitions by ``key``
    only, so ALL rows of one key serialize through one task — inherent to
    as-of semantics (the running last() must see the key's full timeline).
    A pathological hot key (say 1% of 100 TB on one conv_id) bounds that
    task at O(rows of the hottest key).

    ``time_bucket`` (e.g. ``"1 hour"``) is the mitigation: both sides are
    bucketed by ``floor(epoch_seconds / bucket)`` and the running-last
    window partitions by ``(key, bucket)``, so a hot key's timeline is
    split across as many tasks as it spans buckets.

    WHEN to bucket — the measured crossover (benchmarks/
    hotkey_asof_probe.py, BENCH/DATASCALE.md): at 2M rows on one key the
    single-window form WINS (the bucketed path's ~4 extra small shuffles
    cost more than the serialization saves); at 20M rows/key the bucketed
    path is 7-10x faster (149-157s vs 15-24s, identical checksums).
    Guidance: enable ``time_bucket`` when the HOTTEST key exceeds
    ``ASOF_HOT_KEY_CROSSOVER`` (~5M) rows, and size the bucket so each
    (key, bucket) slice holds ~0.5-2M rows of that key.
    :func:`suggest_time_bucket` computes both from one aggregate over the
    data and applies this rule for you. Cross-bucket carry is a
    second, tiny pass: one row per (key, bucket) — the bucket's final right
    row — gets a running last() over buckets (exclusive of the current), and
    each left row falls back to that carry when its own bucket holds no
    earlier right row (``coalesce(in_bucket, carry)``). Same trick as
    ``pack_bins``' two-phase shard offsets: per-task work is bounded by
    rows-per-(key, bucket) at the cost of two extra small shuffles, and the
    output is exactly the single-window form's —
    tests/test_pipeline_functions.py::test_asof_join_hot_key pins equality
    on a 10x hot key plus the (key, bucket) partitioning in the plan, and
    the hypothesis differential runs both paths.
    """
    from pyspark.sql.window import Window

    right_cols = right.columns
    collisions = {f"{right_prefix}{c}" for c in right_cols} & set(left.columns)
    if collisions:
        raise ValueError(
            f"asof_join output name collision: prefixed right column(s) "
            f"{sorted(collisions)} already exist on the left side — pass a "
            f"different right_prefix"
        )
    rstruct = F.struct(*[F.col(c) for c in right_cols])
    asc = direction == "backward"
    # Sort order within a (key, ts) tie group: right rows first (a boundary
    # right row at the exact left ts qualifies), and among tied right rows
    # the DESIRED winner must sort LAST so running last() picks it.
    side_rank = F.when(F.col("_is_left"), F.lit(1)).otherwise(F.lit(0))
    order = [
        F.col("_ts").asc() if asc else F.col("_ts").desc(),
        side_rank.asc(),
    ]
    if tiebreak is not None:
        tb = F.col("_r").getField(tiebreak)
        # winner among equal-timestamp right rows = LOWEST tiebreak: sort
        # tiebreak desc so the last-seen tied right row has the lowest value
        # (mirrors an ORDER BY ts DESC, id LIMIT 1 oracle).
        order.append(tb.desc_nulls_first())
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(True).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(right.select(rstruct).schema[0].dataType).alias("_r"),
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(False).alias("_is_left"),
        F.lit(None).cast(left.select(F.struct(*left.columns)).schema[0].dataType).alias("_l"),
        rstruct.alias("_r"),
    )
    project = [
        *[F.col("_l").getField(c).alias(c) for c in left.columns],
        *[F.col("_match").getField(c).alias(f"{right_prefix}{c}") for c in right_cols],
    ]
    if time_bucket is None:
        w = (
            Window.partitionBy("_k")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        merged = l_tagged.unionByName(r_tagged).withColumn(
            "_match", F.last("_r", ignorenulls=True).over(w)
        )
        return merged.filter(F.col("_is_left")).select(*project)

    # Bucketed two-phase path (hot-key mitigation — see docstring).
    import pandas as pd

    bsecs = float(pd.Timedelta(time_bucket).total_seconds())
    if bsecs <= 0:
        raise ValueError(f"time_bucket must be a positive duration: {time_bucket!r}")
    # unix_timestamp works on TIMESTAMP and TIMESTAMP_NTZ alike; its
    # second-truncation is monotonic, which is all bucket assignment needs
    # (in-bucket ordering still uses the full-precision _ts)
    bcol = F.floor(F.unix_timestamp(F.col("_ts")) / F.lit(bsecs)).cast("long")
    # Null timestamps are out of contract for the bucketed path: a null _ts
    # has no bucket (null bucket), and in forward direction null-ts left
    # rows could spuriously match null-ts right rows inside the null bucket
    # while the single-window form never pairs them. Mirror
    # match_sequence's null-drop: both sides are filtered, so left rows
    # with a null timestamp are DROPPED here (the single-window path keeps
    # them) — an as-of point is undefined without an event time.
    l_b = l_tagged.filter(F.col("_ts").isNotNull()).withColumn("_b", bcol)
    r_b = r_tagged.filter(F.col("_ts").isNotNull()).withColumn("_b", bcol)
    # Phase 1: each bucket's final right row = FIRST row in the inverse of
    # the merge order (works for any orderable tiebreak type), then a
    # running last over buckets (exclusive) yields the carry INTO each
    # bucket. One row per (key, bucket) — tiny relative to the data.
    inv = [F.col("_ts").desc() if asc else F.col("_ts").asc()]
    if tiebreak is not None:
        inv.append(F.col("_r").getField(tiebreak).asc_nulls_last())
    w_in = Window.partitionBy("_k", "_b").orderBy(*inv)
    bucket_last = (
        r_b.withColumn("_rn", F.row_number().over(w_in))
        .filter(F.col("_rn") == 1)
        .select("_k", "_b", "_r")
    )
    all_buckets = (
        l_b.select("_k", "_b").unionByName(r_b.select("_k", "_b")).distinct()
    )
    w_carry = (
        Window.partitionBy("_k")
        .orderBy(F.col("_b").asc() if asc else F.col("_b").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        all_buckets.join(bucket_last, ["_k", "_b"], "left")
        .withColumn("_carry", F.last("_r", ignorenulls=True).over(w_carry))
        .select("_k", "_b", "_carry")
    )
    # Phase 2: the same union+running-last merge, partitioned by
    # (key, bucket) so a hot key's rows spread across bucket tasks.
    w2 = (
        Window.partitionBy("_k", "_b")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_b.unionByName(r_b).withColumn(
        "_inb", F.last("_r", ignorenulls=True).over(w2)
    )
    return (
        merged.filter(F.col("_is_left"))
        .join(carry, ["_k", "_b"], "left")
        .withColumn("_match", F.coalesce(F.col("_inb"), F.col("_carry")))
        .select(*project)
    )
