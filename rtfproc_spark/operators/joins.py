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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the single nearest right row at or
    before (backward) / at or after (forward) its timestamp.

    Composed from built-in operators (interval-free variant): join + window
    rank, letting Catalyst pick the join strategy; no Python in the loop.
    """
    from pyspark.sql.window import Window

    l = left.alias("l")
    r = right.alias("r")
    if direction == "backward":
        cond = (F.col(f"l.{key}") == F.col(f"r.{key}")) & (
            F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}")
        )
        order = F.col(f"r.{right_ts}").desc()
    else:
        cond = (F.col(f"l.{key}") == F.col(f"r.{key}")) & (
            F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}")
        )
        order = F.col(f"r.{right_ts}").asc()
    joined = l.join(r, cond, "left")
    w = Window.partitionBy([F.col(f"l.{c}") for c in left.columns]).orderBy(order)
    return joined.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
