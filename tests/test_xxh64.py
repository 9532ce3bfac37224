"""Pin the pure-Python XXH64 (functions/xxh64.py) literal-for-literal against
Spark's xxhash64 expression — the staged-expected minhash oracle is only as
trustworthy as this equality."""

import random
import string

import pytest
from pyspark.sql import functions as F

from rtfproc_spark.functions.xxh64 import spark_xxhash64, xxh64


def test_xxh64_canonical_empty_vector():
    # public xxHash reference vector: XXH64("", seed=0)
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999


@pytest.mark.spark
def test_spark_parity_strings_and_chains(spark):
    rng = random.Random(42)
    alphabet = string.printable + "äöü€漢字"
    strs = [
        "",
        " ",
        "hello world",
        "a" * 31,
        "a" * 32,
        "a" * 33,
        "x" * 100,
    ] + ["".join(rng.choices(alphabet, k=rng.randint(0, 80))) for _ in range(40)]

    # string-only, int-seed + string (the minhash shape), and 4-long chains
    # (the band-hash shape)
    cases = []
    for s in strs:
        cases.append(([F.lit(s)], [s]))
    for seed in range(16):
        cases.append(([F.lit(seed), F.lit("shingle text")], [seed, "shingle text"]))
    for _ in range(10):
        longs = [rng.randint(-(2**63), 2**63 - 1) for _ in range(4)]
        cases.append(
            (
                [F.lit(v).cast("long") for v in longs],
                [("long", v) for v in longs],
            )
        )

    row = spark.range(1).select(
        *[F.xxhash64(*cols).alias(f"c{i}") for i, (cols, _) in enumerate(cases)]
    ).first()
    for i, (_, pyvals) in enumerate(cases):
        assert row[f"c{i}"] == spark_xxhash64(*pyvals), f"case {i}: {pyvals!r}"
