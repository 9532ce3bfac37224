"""Skew handling: salted two-phase aggregation (SURVEY.md §2 B10).

Hot conversations (a few conv_ids carrying ~30% of turns) make a plain
groupBy(conv_id) shuffle lopsided: one reducer gets the hot key's entire
volume. Salting splits each key into S sub-keys for a partial aggregate
(map-side combine already reduces rows; the salt spreads the *reduce* work),
then a second, tiny aggregation merges the S partials. Cost: one extra
shuffle over ~S×distinct-keys rows — negligible against a hot-key straggler
at 100 TB. AQE's skew-join handles joins; this handles aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial_agg, merge_agg) pairs keyed by a simple algebra: each aggregate
# must be decomposable (commutative monoid) for two-phase evaluation.
_DECOMPOSABLE = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str | None, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """aggs: list of (fn, src_col_or_None, out_alias); fn in count/sum/min/max.

    Equivalent to ``df.groupBy(keys).agg(...)`` but shuffle-balanced for
    hot keys. avg is expressed by the caller as sum+count then a final
    projection (kept decomposable).
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    partials = []
    finals = []
    for fn, src, alias in aggs:
        pa, ma = _DECOMPOSABLE[fn]
        partial_alias = f"_p_{alias}"
        partials.append(
            (pa(F.col(src)) if src else pa(None)).alias(partial_alias)
        )
        finals.append(ma(F.col(partial_alias)).alias(alias))
    phase1 = salted.groupBy(*keys, "_salt").agg(*partials)
    return phase1.groupBy(*keys).agg(*finals)
