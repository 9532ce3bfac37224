"""Deduplication operators for training-data pipelines.

Scale design:
- exact:    hash-groupBy — one shuffle on a 128-bit digest, never on text.
- minhash:  shingle -> K minhashes -> B bands; candidate generation is a
            self-join on (band_idx, band_hash) buckets — the classic LSH
            band trick keeps the join linear-ish instead of O(n^2).
            Everything up to the bucket join is native Spark SQL exprs.
- simhash:  64-bit bit-majority signature via a vectorized numpy pandas_udf
            (Arrow-batched); near-dups = identical prefix bucket + hamming
            verify.
- ngram jaccard: native array_intersect/array_union verification.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def text_digest(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("binary"))


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text: keeper id + duplicate count."""
    return (
        df.groupBy(text_digest(text_col).alias("digest"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
    )


def word_ngrams(col, n: int = 3) -> Column:
    """Array of word n-gram shingles, built natively (no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.lower(F.trim(c)), r"\s+")
    k = F.greatest(F.size(words) - (n - 1), F.lit(0))
    return F.when(k <= 0, F.array(F.concat_ws(" ", words))).otherwise(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
    )


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """Array of ``num_hashes`` minhash values over the shingle array —
    min(xxhash64(seed_i, shingle)) per seed, all JVM-side."""
    return F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda s, i=i: F.xxhash64(F.lit(i), s))
            )
            for i in range(num_hashes)
        ]
    )


def minhash_bands(sig: Column, bands: int, rows: int) -> Column:
    """Array of band-bucket hashes: band_i = hash(sig[i*r : (i+1)*r])."""
    return F.array(
        *[
            F.xxhash64(*[sig.getItem(b * rows + r) for r in range(rows)])
            for b in range(bands)
        ]
    )


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 200,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b) sharing at least one band bucket,
    with exact n-gram Jaccard verification attached.

    Shuffle discipline for scale: the band self-join moves ONLY (id, hash)
    pairs — shingle arrays never enter the join. Buckets larger than
    ``max_bucket`` are degenerate (e.g. empty/near-empty docs all hash
    together) and would go quadratic; they are dropped from candidate
    generation — NOT a silent cap: exact-dup groups are the right tool for
    those and are caught by exact_dedup_groups.
    """
    rows = num_hashes // bands
    # cheap shuffle before the CPU-heavy shingle/hash stage: a handful of
    # large input files must not serialize the signature computation
    par = df.sparkSession.sparkContext.defaultParallelism
    base = (
        df.filter(F.col(text_col).isNotNull() & (F.length(text_col) > 0))
        .repartition(par * 2)
        .select(F.col(id_col).alias("id"), word_ngrams(text_col, ngram).alias("shingles"))
    )
    # minhashes via explode + min-agg: linear, map-side combinable, and keeps
    # the expression tree small (a single array column duplicated into K
    # getItem()s makes Catalyst inline the whole signature K times).
    ex = base.select("id", F.explode("shingles").alias("sh"))
    sig = ex.groupBy("id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"mh{i}")
            for i in range(num_hashes)
        ]
    )
    band_hashes = [
        F.xxhash64(*[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias(
            f"bh{b}"
        )
        for b in range(bands)
    ]
    banded = sig.select("id", *band_hashes)
    exploded = banded.select(
        "id",
        F.posexplode(F.array(*[F.col(f"bh{b}") for b in range(bands)])).alias(
            "band_idx", "band_hash"
        ),
    )
    # prune degenerate buckets before the self-join
    from pyspark.sql.window import Window

    wb = Window.partitionBy("band_idx", "band_hash")
    pruned = (
        exploded.withColumn("_bsize", F.count(F.lit(1)).over(wb))
        .filter((F.col("_bsize") > 1) & (F.col("_bsize") <= max_bucket))
        .drop("_bsize")
    )
    a, b = pruned.alias("a"), pruned.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact verification: attach shingles only for surviving candidates
    sa = base.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = base.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    verified = pairs.join(sa, "id_a").join(sb, "id_b")
    inter = F.size(
        F.array_intersect(F.array_distinct("sh_a"), F.array_distinct("sh_b"))
    )
    union = F.size(F.array_union("sh_a", "sh_b"))
    return verified.select(
        "id_a",
        "id_b",
        F.round(inter / F.greatest(union, F.lit(1)), 4).alias("jaccard"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
) -> DataFrame:
    """Near-dup pairs above an n-gram Jaccard threshold (LSH-pruned)."""
    return minhash_candidates(df, text_col, id_col, ngram).filter(
        F.col("jaccard") >= threshold
    )


@F.pandas_udf(LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over word tokens (vectorized numpy inner loop)."""
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if not t:
            continue
        words = t.lower().split()
        if not words:
            continue
        # stable 64-bit word hashes (Python's hash() is seed-randomized and
        # would differ across executors)
        hashes = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(w.encode(), digest_size=8).digest(), "little"
                )
                for w in set(words)
            ),
            dtype=np.uint64,
        )
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).sum(axis=0)
        sig = 0
        half = len(hashes) / 2.0
        for b in range(64):
            if bits[b] > half:
                sig |= 1 << b
        out[i] = sig - (1 << 64) if sig >= (1 << 63) else sig
    return pd.Series(out)


def simhash_signature_df(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    blocks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs via the block-permutation trick: split the
    64-bit signature into ``blocks`` chunks — any pair within hamming
    distance < blocks shares at least one identical chunk (pigeonhole), so
    candidates come from ``blocks`` bucket self-joins on 16-bit chunks, then
    exact hamming verification via bit_count(xor). All JVM-side."""
    assert max_hamming < blocks, "pigeonhole needs max_hamming < blocks"
    width = 64 // blocks
    sig = simhash_signature_df(df, text_col, id_col)
    chunks = sig.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), b * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("block_idx", "block_val"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.block_idx") == F.col("b.block_idx"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs.filter(F.col("hamming") <= max_hamming)
