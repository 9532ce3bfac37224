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

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def match_sequence(
    df: DataFrame,
    steps: list[Column],
    key_cols: list[str],
    time_col: str = "ts",
    id_col: str = "event_id",
    within: str = "30 minutes",
    forbid: Column | None = None,
    step_within: str | None = None,
) -> DataFrame:
    """Ordered-sequence detection: one output row per step-1 anchor whose
    full pattern completes, with (ts_k, id_k) for every step.

    ``steps`` are boolean Column predicates over ``df``'s rows, e.g.
    ``[F.col("event_type") == "view", F.col("event_type") == "click"]``.
    ``id_col`` must be unique per row — it is the deterministic tiebreak
    for simultaneous events and the anchor identity in the output.

    ``forbid`` is CEP negation (MATCH_RECOGNIZE's absent pattern /
    Flink's notFollowedBy): a completed match is DROPPED if any event
    satisfying the predicate occurs strictly between the anchor and the
    final step (same key). One extra left-anti range join after the last
    step — the match set is already small by then, so the negation join
    is cheap relative to the step joins.

    ``step_within`` additionally bounds the gap between CONSECUTIVE steps
    (Flink's per-transition `within`): step k must occur no later than
    ``step_within`` after step k-1, on top of the anchor-wide ``within``.
    Note the earliest-qualifying choice stays greedy per step, so with a
    gap bound a match can be missed that a backtracking matcher would
    find (skip-to-next semantics, same as the stream state machine)."""
    if len(steps) < 2:
        raise ValueError("match_sequence needs at least 2 steps")
    # null time/id rows can neither anchor nor advance (null comparisons are
    # false) and the min(struct) tiebreak is ill-defined on null ids — drop
    # them up front so batch and stream treat contract-violating rows
    # identically (the stream twin dropna()s the same rows).
    df = df.filter(F.col(time_col).isNotNull() & F.col(id_col).isNotNull())
    iv = F.expr(f"INTERVAL {within}")
    step_iv = F.expr(f"INTERVAL {step_within}") if step_within else None
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
        bound = (F.col("_t") > F.col(f"ts_{k - 1}")) & (
            F.col("_t") <= F.col("ts_1") + iv
        )
        if step_iv is not None:
            bound = bound & (F.col("_t") <= F.col(f"ts_{k - 1}") + step_iv)
        cur = (
            cur.join(nxt, on=key_cols)
            .filter(bound)
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
    if forbid is not None:
        k = len(steps)
        # renamed columns sidestep self-join lineage ambiguity (bad and cur
        # both descend from df)
        bad = df.filter(forbid).select(
            *[F.col(c).alias(f"_fk_{c}") for c in key_cols],
            F.col(time_col).alias("_ft"),
        )
        cond = [F.col(c) == F.col(f"_fk_{c}") for c in key_cols] + [
            F.col("_ft") > F.col("ts_1"),
            F.col("_ft") < F.col(f"ts_{k}"),
        ]
        from functools import reduce

        cur = cur.join(bad, on=reduce(lambda a, b: a & b, cond), how="left_anti")
    return cur


def match_sequence_stream(
    stream: DataFrame,
    step_values: list[str],
    key_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
    id_col: str = "event_id",
    within: str = "30 minutes",
    watermark: str = "10 minutes",
    idle_timeout_ms: int | None = None,
    forbid_value: str | None = None,
    step_within: str | None = None,
) -> DataFrame:
    """Streaming twin of :func:`match_sequence` via a per-key CEP state
    machine (``applyInPandasWithState``): the set of in-flight partial
    matches is the state; each micro-batch advances them in (ts, id) order
    and emits completed sequences. Given in-order per-key delivery (the
    watermark contract), the emitted rows equal the batch operator's on
    the same input — pinned by
    tests/test_pipeline_functions.py::test_match_sequence_stream_equals_batch.

    The stream variant matches ``type_col`` against literal ``step_values``
    (the common CEP case) rather than arbitrary predicates — state must be
    serializable, predicates are not. State is one JSON string per key
    (simple, schema-evolvable); partial count is bounded by
    anchors-per-window, so the string stays small — a deployment squeezing
    state-store bytes would swap it for a struct/binary column in the same
    ``stateStructType`` slot without touching the algorithm. Partials
    expire as soon as an event beyond their anchor window arrives
    (in-order processing makes that final), so state per key is bounded by
    anchors-per-window.
    ``idle_timeout_ms=None`` (default) suits bounded availableNow replays;
    continuous jobs pass a timeout for idle-key eviction.

    ``forbid_value`` is the negation twin of batch ``forbid``: an event of
    that type POISONS every in-flight partial whose anchor precedes it
    (recorded as the earliest poison time); at completion the match is
    emitted only if no poison falls strictly inside (anchor, final step) —
    the same open-interval boundary semantics as the batch anti join,
    including the same-timestamp edge (a poison at exactly the final
    step's time does not kill)."""
    import pandas as pd

    k = len(step_values)
    if k < 2:
        raise ValueError("match_sequence_stream needs at least 2 steps")
    seq_cols = [c for i in range(1, k + 1) for c in (f"ts_{i}", f"id_{i}")]
    out_ddl = f"{key_col} long, " + ", ".join(
        f"ts_{i} timestamp, id_{i} long" for i in range(1, k + 1)
    )
    within_td = pd.Timedelta(within)
    step_ns = pd.Timedelta(step_within).value if step_within else None

    def _fn(key, pdfs, state: GroupState):
        (key_val,) = key
        if state.hasTimedOut:
            state.remove()
            return
        # state: JSON list of partials
        # [next_step, limit, prev_ts, [(ts,id)..], poison_ts_or_None]
        # timestamps as epoch-nanos ints (exact round-trip)
        partials = json.loads(state.get[0]) if state.exists else []
        chunks = [p for p in pdfs if len(p)]
        rows = []
        if chunks:
            pdf = (
                pd.concat(chunks, ignore_index=True)
                # null ts/id can neither anchor nor advance in the batch
                # algebra (null comparisons are false) — drop instead of
                # crashing on NaT->int
                .dropna(subset=[time_col, id_col])
                .sort_values([time_col, id_col])
                .reset_index(drop=True)
            )
            for r in pdf.itertuples(index=False):
                t = int(pd.Timestamp(getattr(r, time_col)).value)
                i = int(getattr(r, id_col))
                typ = getattr(r, type_col)
                keep = []
                for p in partials:
                    nxt, limit, prev_t, hops, poison = p
                    if t > limit:
                        continue  # in-order: this partial can never complete
                    if (
                        typ == step_values[nxt]
                        and t > prev_t
                        and (step_ns is None or t <= prev_t + step_ns)
                    ):
                        hops = hops + [[t, i]]
                        if nxt + 1 == k:
                            # drop iff a poison falls STRICTLY inside
                            # (anchor, final); a poison at exactly t keeps
                            if poison is None or poison >= t:
                                rows.append(
                                    (key_val, *(x for h in hops for x in h))
                                )
                            continue  # completed — skip-to-next ends it
                        p = [nxt + 1, limit, t, hops, poison]
                    keep.append(p)
                partials = keep
                if forbid_value is not None and typ == forbid_value:
                    for p in partials:
                        # anchor strictly before the poison; earliest wins
                        if p[3][0][0] < t and p[4] is None:
                            p[4] = t
                if typ == step_values[0]:
                    partials.append([1, t + within_td.value, t, [[t, i]], None])
        if partials:
            state.update((json.dumps(partials),))
            if idle_timeout_ms is not None:
                state.setTimeoutDuration(idle_timeout_ms)
        elif state.exists:
            # no in-flight partials: drop the state entry instead of keeping
            # an empty-list tombstone per key forever (a continuous job would
            # otherwise grow state with every key ever seen)
            state.remove()
        if rows:
            out = pd.DataFrame(rows, columns=[key_col, *seq_cols])
            for i in range(1, k + 1):
                out[f"ts_{i}"] = pd.to_datetime(out[f"ts_{i}"])
            yield out

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            _fn,
            outputStructType=out_ddl,
            stateStructType="partials string",
            outputMode="append",
            timeoutConf=timeout_conf,
        )
    )
