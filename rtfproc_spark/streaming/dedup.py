"""Streaming NEAR-duplicate ingestion dedup (SURVEY.md §2 C-set, the
streaming path of the MinHash/LSH family): an ingest stream of documents is
filtered against an accumulating index of everything kept so far, so a
document near-duplicating ANY earlier kept document never reaches the
training set. The batch keeplist (`functions.dedup`) answers "dedup this
corpus"; this answers "keep the corpus deduped as it grows" — the shape a
continuous 100 TB ingest pipeline runs.

Semantics (deterministic, replayable):

- a document is DROPPED iff it shares an LSH band bucket with an earlier
  KEPT document and their minhash signatures agree on at least
  ``min_sig_agree`` of ``num_hashes`` components (the standard MinHash
  Jaccard estimate — the index stores signatures, never text);
- within one micro-batch, the same rule applies pairwise by id order:
  doc b is dropped iff some index-surviving doc a < b in the batch
  matches it (documented batch-local rule: pairwise-by-id, not
  connected-components — a dropped doc still shadows later ones, exactly
  like the index path where it WOULD have been indexed had it arrived one
  batch earlier... it was not, so the rule is "matches any earlier
  index-surviving doc", which is what a file-by-file batch replay of the
  same functions computes — pinned);
- survivors are appended to the output and their (bucket, id, signature)
  rows to the index.

Exactly-once: both the output and the index publish per micro-batch into
``batch_id=N`` subdirectories via write-then-atomic-rename (the
IdempotentSink pattern) — a replayed batch overwrites its own directory,
and the index read EXCLUDES the current batch id, so a replay cannot see
its own half-published rows and self-match.

Scale shape: signatures are computed shingle-local (zero shuffle); the
index join moves only (bucket, id, 16-long signature) rows; per-batch
state on disk grows with KEPT docs x bands — compact rows, prunable by
partition on bucket ranges at a real deployment's scale.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtfproc_spark.functions.dedup import (
    minhash_bands,
    minhash_signature,
    word_ngrams,
)

INDEX_SCHEMA = "bucket long, id long, sig array<bigint>"


def _sig_frame(
    batch_df: DataFrame,
    text_col: str,
    id_col: str,
    ngram: int,
    num_hashes: int,
    bands: int,
) -> DataFrame:
    """(id, sig, buckets[]) for each doc — all JVM-side expressions."""
    # word_ngrams normalizes internally (lower + trim + \s+ split)
    shingles = F.array_distinct(word_ngrams(F.col(text_col), ngram))
    sig = minhash_signature(shingles, num_hashes)
    return batch_df.select(
        F.col(id_col).alias("id"),
        sig.alias("sig"),
    ).withColumn("buckets", minhash_bands(F.col("sig"), bands, num_hashes // bands))


def _sig_agree(a, b):
    """Number of equal minhash components between two signatures."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )


def _publish(df: DataFrame, base: str, batch_id: int) -> None:
    """Write-then-rename per-batch publish (idempotent under replay)."""
    final = os.path.join(base, f"batch_id={batch_id}")
    tmp = os.path.join(base, f"_tmp_batch_{batch_id}")
    shutil.rmtree(tmp, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp, final)


def _read_index(spark: SparkSession, index_dir: str, before_batch: int) -> DataFrame:
    dirs = [
        os.path.join(index_dir, d)
        for d in (os.listdir(index_dir) if os.path.isdir(index_dir) else [])
        if d.startswith("batch_id=") and int(d.split("=")[1]) < before_batch
    ]
    if not dirs:
        return spark.createDataFrame([], INDEX_SCHEMA)
    return spark.read.schema(INDEX_SCHEMA).parquet(*dirs)


def near_dedup_batch_step(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    min_sig_agree: int = 12,
) -> None:
    """One micro-batch of the streaming near-dedup (the foreachBatch body;
    callable directly for a file-by-file batch replay — the equality pin)."""
    # materialize signatures ONCE per batch: the (id, sig, buckets) frame
    # feeds four joins below, and leaving it as lineage would re-evaluate
    # the 16-seed hash expression (and re-compile its codegen) per plan —
    # measured 9x slower on the sf0.1 smoke
    par = spark.sparkContext.defaultParallelism
    sigs = _sig_frame(
        batch_df.repartition(par), text_col, id_col, ngram, num_hashes, bands
    ).persist()
    buckets = sigs.select(
        "id", "sig", F.explode("buckets").alias("bucket")
    )
    index = _read_index(spark, index_dir, batch_id)
    # vs the index of previously kept docs: drop on bucket share + sig agree
    vs_index = (
        buckets.join(
            index.select(
                F.col("bucket"),
                F.col("sig").alias("_isig"),
            ),
            "bucket",
        )
        .filter(_sig_agree(F.col("sig"), F.col("_isig")) >= min_sig_agree)
        .select("id")
        .distinct()
    )
    stage1 = sigs.join(vs_index, "id", "left_anti")
    # within the batch: pairwise by id among index-survivors
    b1 = stage1.select("id", "sig", F.explode("buckets").alias("bucket"))
    in_batch_dropped = (
        b1.alias("a")
        .join(
            b1.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(_sig_agree(F.col("a.sig"), F.col("b.sig")) >= min_sig_agree)
        .select(F.col("b.id").alias("id"))
        .distinct()
    )
    survivors = stage1.join(in_batch_dropped, "id", "left_anti").persist()
    try:
        out_rows = batch_df.join(
            survivors.select(F.col("id").alias(id_col)), id_col
        )
        idx_rows = survivors.select(
            F.explode("buckets").alias("bucket"), "id", "sig"
        )
        _publish(out_rows, out_dir, batch_id)
        _publish(idx_rows, index_dir, batch_id)
    finally:
        survivors.unpersist()
        sigs.unpersist()


def stream_near_dedup(
    spark: SparkSession,
    stream_docs: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    **kwargs,
):
    """Wire the per-batch step into a streaming query (availableNow or
    continuous — foreachBatch either way). Returns the started query."""

    def fb(batch_df, batch_id):
        near_dedup_batch_step(
            spark, batch_df, int(batch_id), index_dir, out_dir, **kwargs
        )

    return (
        stream_docs.writeStream.foreachBatch(fb)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_kept(spark: SparkSession, out_dir: str) -> DataFrame:
    """All kept documents across batches."""
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "batch_id=*")
    )


def compact_index(spark: SparkSession, index_dir: str, upto_batch: int) -> int:
    """Maintenance for a long-running job: merge every ``batch_id=k`` dir
    with ``k < upto_batch`` into one directory (attributed to
    ``batch_id=upto_batch - 1``), so the index listing stays O(recent
    batches) instead of O(all batches ever). Safe whenever ``upto_batch``
    does not exceed the last COMMITTED micro-batch (only the last
    uncommitted batch can replay, and its index read excludes every id
    below itself either way — the merged dir included). Returns the
    number of directories merged."""
    dirs = sorted(
        d
        for d in (os.listdir(index_dir) if os.path.isdir(index_dir) else [])
        if d.startswith("batch_id=") and int(d.split("=")[1]) < upto_batch
    )
    if len(dirs) <= 1:
        return 0
    merged = spark.read.schema(INDEX_SCHEMA).parquet(
        *[os.path.join(index_dir, d) for d in dirs]
    )
    tmp = os.path.join(index_dir, "_tmp_compact")
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").parquet(tmp)
    for d in dirs:
        shutil.rmtree(os.path.join(index_dir, d), ignore_errors=True)
    os.replace(tmp, os.path.join(index_dir, f"batch_id={upto_batch - 1}"))
    return len(dirs)
