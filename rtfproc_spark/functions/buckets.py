"""Shared LSH-bucket plumbing: tracked persistence + degenerate-bucket pruning.

Both dedup (minhash bands, simhash chunks) and similarity (hyperplane
buckets) generate candidates from bucket self-joins; both need the same two
scale guards:

- ``prune_degenerate_buckets``: drop singleton buckets (no pair can come
  from them) and buckets above a cap (a degenerate bucket — e.g. every
  empty doc hashing together — goes quadratic in the self-join). Done with
  a groupBy().count() + hash join instead of a count-over-Window: the
  window variant SORT-shuffles the full exploded table, the join variant is
  hash-aggregate + hash join (AQE broadcasts the pruned bucket list when it
  is small), no sort anywhere.
- ``persist_tracked`` / ``release_persisted``: intermediates consumed by
  both sides of a self-join are persisted so they compute once; callers in
  long-lived sessions release them after materializing the result (the
  cached blocks otherwise accumulate for the process lifetime).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LIVE: list[DataFrame] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """persist() + register for later release_persisted()."""
    df = df.persist(level)
    _LIVE.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every intermediate persisted via persist_tracked since the
    last release. Call after the consuming DataFrame is materialized."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n


def prune_degenerate_buckets(
    df: DataFrame, keys: list[str], max_bucket: int
) -> DataFrame:
    """Keep only rows in buckets whose size is in (1, max_bucket]."""
    sizes = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_bsize"))
        .filter((F.col("_bsize") > 1) & (F.col("_bsize") <= max_bucket))
        .drop("_bsize")
    )
    return df.join(sizes, list(keys))
