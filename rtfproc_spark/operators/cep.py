"""Declarative CEP sequence matching (north-rule CEP surface, beyond the
windows/joins/tracker set): detect ordered event patterns per key within a
time bound — the funnel/sequence primitive of a complex-event engine
(MATCH_RECOGNIZE / Flink CEP's `next`/`followedBy` in DataFrame algebra).

Semantics (deterministic, SQL-oracle-able):

- every event matching step 1 anchors a potential match (overlapping
  anchors allowed — each is reported independently);
- step k matches the EARLIEST event satisfying its predicate strictly
  after step k-1's match and no later than ``within`` of the ANCHOR
  (first-match-after, ties broken by the id column — CEP "skip to next");
- a row is emitted only for anchors whose every step completes.

Scale shape: one shuffle per step on (key + anchor), join then
min(struct(ts, id)) aggregation — no window over a whole key's history, no
Python. Hot keys bound candidate fan-out by events-per-key-per-window,
the same bound any stream-stream interval join carries; salt via
operators.skew if a key is truly degenerate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def match_sequence(
    df: DataFrame,
    steps: list[Column],
    key_cols: list[str],
    time_col: str = "ts",
    id_col: str = "event_id",
    within: str = "30 minutes",
) -> DataFrame:
    """Ordered-sequence detection: one output row per step-1 anchor whose
    full pattern completes, with (ts_k, id_k) for every step.

    ``steps`` are boolean Column predicates over ``df``'s rows, e.g.
    ``[F.col("event_type") == "view", F.col("event_type") == "click"]``.
    ``id_col`` must be unique per row — it is the deterministic tiebreak
    for simultaneous events and the anchor identity in the output.
    """
    if len(steps) < 2:
        raise ValueError("match_sequence needs at least 2 steps")
    iv = F.expr(f"INTERVAL {within}")
    cur = df.filter(steps[0]).select(
        *key_cols,
        F.col(time_col).alias("ts_1"),
        F.col(id_col).alias("id_1"),
    )
    for k in range(2, len(steps) + 1):
        nxt = df.filter(steps[k - 1]).select(
            *key_cols,
            F.col(time_col).alias("_t"),
            F.col(id_col).alias("_i"),
        )
        anchor_cols = list(cur.columns)
        cur = (
            cur.join(nxt, on=key_cols)
            .filter(
                (F.col("_t") > F.col(f"ts_{k - 1}"))
                & (F.col("_t") <= F.col("ts_1") + iv)
            )
            .groupBy(*anchor_cols)
            # earliest qualifying event, id-tiebroken: struct comparison is
            # lexicographic over (ts, id)
            .agg(F.min(F.struct(F.col("_t"), F.col("_i"))).alias("_m"))
            .select(
                *anchor_cols,
                F.col("_m._t").alias(f"ts_{k}"),
                F.col("_m._i").alias(f"id_{k}"),
            )
        )
    return cur
