"""Payload measures for CEP match output — MATCH_RECOGNIZE's
``MEASURES SUM(B.amount)`` / ``V.price`` surface over columns the match
frame itself does not carry.

The matchers (:func:`~rtfproc_spark.operators.cep.match_sequence` and its
stream twin) deliberately emit only ``(ts_k, id_k)`` per step plus the
loop binding columns (``n_<name>``, ``first/last_<name>_{ts,id}``,
``<name>_ids``): carrying arbitrary payload through the match plan (or
through checkpointed stream state) would widen every intermediate join
and the state codec for columns most queries never read.  Instead,
payload measures are POST-HOC JOIN-BACKS against the source: the id
columns in the match frame are foreign keys into the source rows, so any
per-step payload (``P.value``) is one equi-join away and any loop-body
aggregate (``SUM(S.value)``) is an explode + join + re-aggregate over
``<name>_ids``.  Both helpers work identically on the batch matcher's
output and on the stream twin's SINK output (both emit the same frame) —
for a live stream, run them post-sink or inside ``foreachBatch`` (a
stream-stream id equi-join without a time bound is not expressible in
append mode).

At scale the match frame is small relative to the source (matches are
the rare pattern completions), so these joins are cheap: the exploded
hop frame shuffles only (match key, hop id) pairs, the source side is
pruned to ``(id_col, payload cols)`` before the join, and AQE is free to
broadcast the match side.

Reference anchor: SURVEY.md §2 B13 (MATCH_RECOGNIZE framing) — the
standard's MEASURES clause admits arbitrary expressions over matched
rows (e.g. ISO 9075-2 R010..R020 examples ``SUM(B.price)``); Flink CEP
exposes the same via ``PatternProcessFunction`` context.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["attach_row_payload", "loop_measures"]

_AGGS = {
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
}


def attach_row_payload(
    matches: DataFrame,
    source: DataFrame,
    refs: list[tuple[str, str, str]],
    id_col: str = "event_id",
) -> DataFrame:
    """Attach per-row source payload to a match frame: for each
    ``(match_id_col, source_col, out_col)`` in ``refs``, left-join the
    source row whose ``id_col`` equals ``matches[match_id_col]`` and
    emit its ``source_col`` as ``out_col`` (null when the id is null —
    an unmatched optional step).  One join per DISTINCT ``match_id_col``
    regardless of how many payload columns it feeds."""
    by_mid: dict[str, list[tuple[str, str]]] = {}
    for mid, src, out in refs:
        if mid not in matches.columns:
            raise ValueError(f"match frame has no id column {mid!r}")
        if out in matches.columns:
            raise ValueError(f"output column {out!r} already in the frame")
        by_mid.setdefault(mid, []).append((src, out))
    out = matches
    for mid, cols in by_mid.items():
        right = source.select(
            F.col(id_col).alias(mid),
            *[F.col(s).alias(o) for s, o in cols],
        )
        out = out.join(right, mid, "left")
    return out


def loop_measures(
    matches: DataFrame,
    source: DataFrame,
    name: str,
    aggs: dict[str, tuple[str, str] | Column],
    key_cols: list[str],
    id_col: str = "event_id",
    anchor_col: str = "id_1",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Aggregate source payload over a bound loop's hops — the
    ``MEASURES SUM(S.value)`` family.  Requires the loop to have been
    matched with ``bind="all"`` so the frame carries ``<name>_ids``
    (every hop id, in order).

    ``aggs`` maps output column name to either ``(agg, source_col)``
    with ``agg`` in ``sum/avg/min/max/count``, or an arbitrary aggregate
    ``Column`` over source columns (then ``payload_cols`` must list the
    source columns it reads — e.g. the exact-sum recipe
    ``(F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0)`` with
    ``payload_cols=["value"]``).

    A match is identified by ``key_cols + [anchor_col]`` — unique under
    every AFTER MATCH strategy because the engine binds at most one
    match per anchor event (skip-to-next discipline; the skip variants
    only ever PRUNE that set).  Matches whose hop array is empty (a
    ``{0,n}`` loop that matched nothing) get null aggregates — SQL
    aggregate-over-empty semantics — except ``count``, which is
    coalesced to 0."""
    ids_col = f"{name}_ids"
    if ids_col not in matches.columns:
        raise ValueError(
            f"match frame has no {ids_col!r} — the loop must be matched "
            "with bind='all' to carry its hop ids"
        )
    mk = [*key_cols, anchor_col]
    need: set[str] = set()
    agg_exprs: list[Column] = []
    count_outs: list[str] = []
    for out_name, spec in aggs.items():
        if out_name in matches.columns:
            raise ValueError(
                f"output column {out_name!r} already in the frame"
            )
        if isinstance(spec, Column):
            if not payload_cols:
                raise ValueError(
                    "Column-valued aggs need payload_cols naming the "
                    "source columns they read"
                )
            agg_exprs.append(spec.alias(out_name))
        else:
            agg, src = spec
            if agg not in _AGGS:
                raise ValueError(
                    f"unknown agg {agg!r} — one of {sorted(_AGGS)}"
                )
            need.add(src)
            agg_exprs.append(_AGGS[agg](F.col(src)).alias(out_name))
            if agg == "count":
                count_outs.append(out_name)
    need.update(payload_cols or ())
    overlap = need.intersection(mk)
    if overlap:
        raise ValueError(
            f"payload columns {sorted(overlap)} collide with the match "
            "key — alias the match frame's key columns first"
        )
    hops = matches.select(*mk, F.explode(ids_col).alias("__hop_id"))
    right = source.select(
        F.col(id_col).alias("__hop_id"), *[F.col(c) for c in sorted(need)]
    )
    aggd = hops.join(right, "__hop_id").groupBy(*mk).agg(*agg_exprs)
    out = matches.join(aggd, mk, "left")
    for c in count_outs:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out
