"""Windowed aggregations (SURVEY.md §2 B4-B6).

The same declarative DSL serves batch DataFrames and streaming DataFrames
(streams additionally call ``withWatermark`` first — see streaming.pipeline).
All aggregates stay JVM-side (whole-stage codegen; partial aggregation /
map-side combine is automatic for these expressions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    duration: str,
    aggs: list,
) -> DataFrame:
    w = F.window(ts_col, duration)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    duration: str,
    slide: str,
    aggs: list,
) -> DataFrame:
    w = F.window(ts_col, duration, slide)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    gap: str,
    aggs: list,
) -> DataFrame:
    """Session windows: start = first event, end = last event + gap."""
    w = F.session_window(ts_col, gap)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(*aggs)
        .withColumn("session_start", F.col("w.start"))
        .withColumn("session_end", F.col("w.end"))
        .drop("w")
    )
