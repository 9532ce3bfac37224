"""Declarative CEP sequence matching (north-rule CEP surface, beyond the
windows/joins/tracker set): detect ordered event patterns per key within a
time bound — the funnel/sequence primitive of a complex-event engine
(MATCH_RECOGNIZE / Flink CEP's `next`/`followedBy` in DataFrame algebra).

Semantics (deterministic, SQL-oracle-able):

- every event matching step 1 anchors a potential match (overlapping
  anchors allowed under the default ``skip_to_next`` strategy — each is
  reported independently; ``after_match="skip_past_last"`` keeps greedy
  non-overlapping matches instead);
- step k matches the EARLIEST event satisfying its predicate strictly
  after step k-1's match and no later than ``within`` of the ANCHOR
  (first-match-after, ties broken by the id column — CEP "skip to next");
- a row is emitted only for anchors whose every step completes;
- negation (``forbid``), per-transition gaps (``step_within``), optional
  steps (``A B? C``), bounded-loop counts (:class:`CountBetween`),
  sequence-advancing Kleene loops (:class:`LoopStep` — ``A B+ C`` where
  the closer anchors after the loop, or FINAL-position ``A B+`` closed
  by the anchor horizon / session bound) and session-gap bounding
  (:func:`match_sequence_sessionized`) extend the base pattern; every
  option has a streaming twin with pinned stream==batch equality.

Scale shape: one shuffle per step on (key + anchor), join then
min(struct(ts, id)) aggregation — no window over a whole key's history, no
Python. Hot keys bound candidate fan-out by events-per-key-per-window,
the same bound any stream-stream interval join carries; salt via
operators.skew if a key is truly degenerate.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, replace as _dc_replace
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


@dataclass(frozen=True)
class CountBetween:
    """Count quantifier: the number of events satisfying the predicate
    strictly between matched step ``lo_step`` and matched step ``hi_step``
    (open interval on both ends) must fall in ``[min_n, max_n]`` — the
    declarative form of a bounded loop (``B{m,n}`` between two pattern
    symbols; ``min_n=0, max_n=0`` is negation scoped to that gap). The
    count is emitted as output column ``n_<name>``.

    ``bind=True`` upgrades the count to a BINDING loop — MATCH_RECOGNIZE's
    ``B+``/``B{m,n}`` with measures: the loop's matched events are
    recorded, emitted as ``first_<name>_ts``/``first_<name>_id`` and
    ``last_<name>_ts``/``last_<name>_id`` (null when the loop matched zero
    events), i.e. the ``FIRST(B.ts)``/``LAST(B.id)`` measures. The loop
    body is every qualifying event in the open interval (greedy — the
    count constraint already fixes the membership), so binding adds only
    min/max aggregates to the batch plan; the stream twin records the hop
    list per counter in its state codec (v3).

    ``bind="all"`` additionally emits ``<name>_ids`` — EVERY loop hop's id
    in (ts, id) order (the per-row ``B.*`` measures surface; an empty
    array when the loop matched nothing). Batch pays one
    sort_array(collect_list) on the already-joined range rows; the stream
    twin reads the same ids off its counter hop list. Prefer first/last
    when they suffice — the array's width is the loop length.

    ``pred`` is the batch-side predicate; ``value`` is the stream twin's
    literal ``type_col`` value (state must be serializable, predicates are
    not — same split as steps vs step_values)."""

    pred: Column | None = None
    value: str | None = None
    lo_step: int = 1
    hi_step: int = 2
    min_n: int = 0
    max_n: int | None = None
    name: str = "x"
    bind: bool | str = False


@dataclass(frozen=True)
class LoopStep:
    """Kleene loop as a PATTERN STEP — MATCH_RECOGNIZE's ``A B+ C`` /
    Flink's ``oneOrMore()``, where the loop ADVANCES the sequence position:
    the following step (the CLOSER) anchors after the loop's last matched
    event, unlike :class:`CountBetween` which only counts between two
    already-matched fixed steps. Place a ``LoopStep`` between two steps:
    ``[A, LoopStep(pred=B), C]`` is ``A B+ C``; ``min_n``/``max_n`` give
    ``B{m,n}`` (``min_n=0`` is ``B*``).

    Deterministic greedy no-lookahead semantics (shared batch/stream, the
    skip-to-next discipline of the rest of this module):

    - after the step before the loop matches at time ``p``, events
      matching ``pred`` accumulate as loop hops (strictly after ``p``, in
      (ts, id) order, stopping at ``max_n`` — excess loop events are
      ignored, they neither extend nor poison);
    - the loop closes at the EARLIEST closer-matching event ``c`` (strictly
      after ``p``, within the anchor horizon) whose open interval
      ``(p, c)`` holds at least ``min_n`` loop events; a closer candidate
      seen while the count is still short is IGNORED (no backtracking —
      the loop keeps accumulating);
    - an event matching BOTH the loop and the closer closes the match when
      the count (excluding same-timestamp hops — open-interval boundary)
      is already sufficient, else it is consumed as a loop hop.  That is
      the RELUCTANT (lazy, ``B+?``) quantifier — the loop closes as early
      as it can.  ``greedy=True`` flips the priority to MATCH_RECOGNIZE's
      default munch: a dual-matching event is consumed as a HOP until the
      loop's ``max_n`` cap is reached (with ``max_n=None`` it can never
      close the loop — only a non-body closer event can), so the loop
      takes as many rows as arrive.  No backtracking either way
      (possessive in regex terms, the engine-wide no-lookahead
      discipline): a greedy loop can consume an event a backtracking
      matcher would have given to the closer and then fail at the
      horizon where SQL MATCH_RECOGNIZE would backtrack and match —
      greedy-vs-reluctant only changes behavior when the loop body and
      the closer overlap.

    Output: ``n_<name>`` (the emitted count, capped at ``max_n``), and
    with ``bind=True`` (default) the ``first_<name>_ts/id`` /
    ``last_<name>_ts/id`` measures; ``bind="all"`` adds ``<name>_ids``
    (every bound hop id, in order). The loop step itself emits no
    ``ts_k``/``id_k`` — the closer's columns mark where the sequence
    resumed.

    A LoopStep may also sit in FINAL position (``A B+`` — no closer):
    the loop then closes at the ANCHOR HORIZON (``ts_1 + within``) —
    or at the session bound under :func:`match_sequence_sessionized` /
    ``session_gap=``, whose inert ``within`` makes the horizon the
    session's end: "anchor, then every B until the session closes".
    Hops accumulate in ``(prev_ts, ts_1 + within]`` and the match emits
    iff at least ``min_n`` (>= 1 required — 0 would emit a vacuous match
    per completed prefix) accrued; measures cap at ``max_n`` as usual.
    Because emission is deadline-driven, the stream twin requires
    ``ordered=False`` (watermark finality), and ``forbid`` /
    ``after_match="skip_past_last"`` are rejected (both need the final
    matched row, which a final loop does not emit).

    A LoopStep may also sit in ANCHOR position (``A+ B …`` — Flink's
    ``begin().oneOrMore()``): every event matching the loop anchors its
    own potential match (per-row skip-to-next, exactly MATCH_RECOGNIZE's
    overlapping-match discipline), the anchor counts as the FIRST hop,
    and the closer fires at the earliest candidate whose total hop count
    reaches ``min_n``.  Internally this desugars to
    ``A (A){min_n-1, max_n-1} B …`` — a plain anchor plus a middle loop —
    so batch, stream, sessionized and session-gap modes all inherit it;
    measures fold the anchor back in (``n`` includes it,
    ``first_<name>_*`` IS it, ``<name>_ids`` leads with it) and the
    emitted ``ts_k``/``id_k`` positions match the pattern as written
    (the loop emits none; the closer is ``ts_2``).  A pattern that is
    ONLY a loop (``A{m,}``, horizon/session-closed) needs ``min_n >= 2``
    and bind measures.  ``A* B`` (``min_n=0``) cannot anchor — something
    must start the match.  CountBetween indices keep referring to the
    pattern as written.

    Constraints (raise): a loop cannot be followed
    by another loop or an optional step, cannot itself be optional,
    cannot combine with ``step_within``, ``max_n`` cannot undercut
    ``min_n``, and :class:`CountBetween` cannot anchor on a loop
    position.

    ``pred`` is the batch predicate — a single Column, or a list/tuple
    of Columns OR'd together (the loop-body alternation ``(B|C)+``,
    matching the stream twin's tuple ``value``; hops record no branch,
    so the disjunction is the whole story); ``value`` is the stream
    twin's literal ``type_col`` value (or tuple of values)."""

    pred: Column | None = None
    value: str | tuple | None = None
    min_n: int = 1
    max_n: int | None = None
    name: str = "loop"
    bind: bool | str = True
    greedy: bool = False


@dataclass(frozen=True)
class CrossPred:
    """A step predicate that references PRIOR bound variables' payload —
    MATCH_RECOGNIZE's cross-variable DEFINE (``P AS price > A.price``,
    Flink's IterativeCondition over already-bound rows).

    ``pred`` is a boolean Column evaluated over the JOIN of the candidate
    event with the partial match: the candidate's own payload columns
    appear as ``_ev_<col>``, the payload captured from the step bound at
    1-based position ``j`` as ``_def_<j>_<col>``, and the prior steps'
    time/id columns directly as ``ts_<j>`` / ``id_<j>``. ``needs`` lists
    the ``(j, col)`` payload captures the predicate reads (time/id need
    no capture — they are already on the partial frame); ``ev_cols`` the
    candidate's own payload columns it reads; ``local`` an optional plain
    pre-filter over raw rows (the part of the DEFINE that references no
    other variable) — pushed into the candidate scan so the join input
    stays small.

    Semantics: the step binds the EARLIEST candidate satisfying
    ``local AND pred`` — evaluated PER CANDIDATE at join time, so an
    event failing the cross-variable comparison is skipped and the next
    event tried, exactly the sequential matcher's rule (post-filtering
    completed matches would instead kill the whole match). This CLASS is
    batch-only (``pred`` is a JVM Column); the stream twin is
    :func:`match_sequence_stream`'s ``cross_conds=`` — serializable
    ``(ev_col, cmp, ref_step, ref_col)`` comparisons whose captured
    values ride CEP state (codec v6). A referenced step
    must be a required single-row step bound BEFORE this one; loop
    bodies and optional steps (and their closers) cannot be CrossPred.
    Physically: the capture rides the earlier step's existing
    ``min(struct)`` aggregate (extra struct fields, no new shuffle), and
    the cross comparison joins with the step's existing candidate join
    (no new join) — only the candidate scan loses the full predicate
    pushdown (it keeps ``local``)."""

    pred: Column
    needs: tuple = ()
    ev_cols: tuple = ()
    local: Column | None = None


def _is_alt(spec) -> bool:
    """True when a step spec is an alternation ``(B|C)`` — a sequence of
    predicate Columns instead of a single Column."""
    return not isinstance(spec, (Column, LoopStep, CrossPred))


def _loop_pred(sp: LoopStep) -> Column:
    """The loop body's row filter: a single Column, or an OR over a
    list/tuple of Columns — the batch twin of the stream's tuple
    ``value``.  A loop records no branch per hop, so alternation inside
    a loop body is just a disjunction."""
    if isinstance(sp.pred, Column):
        return sp.pred
    return reduce(lambda a, b: a | b, sp.pred)


def _valid_loop_pred(p) -> bool:
    return isinstance(p, Column) or (
        isinstance(p, (list, tuple))
        and len(p) > 0
        and all(isinstance(x, Column) for x in p)
    )


def _parse_after_match(after_match: str, k_total: int) -> tuple[str, int | None]:
    """Parse the AFTER MATCH SKIP strategy into ``(mode, target)``:
    ``("next", None)``, ``("past_last", None)``, or ``("first"|"last",
    pos)`` for ``"skip_to_first:<pos>"`` / ``"skip_to_last:<pos>"`` —
    MATCH_RECOGNIZE's ``AFTER MATCH SKIP TO FIRST|LAST <var>`` addressed
    by 1-based step POSITION (the same addressing as ``strict_steps`` /
    ``optional_steps``).  The skip-to target must be a step 2..k: the SQL
    spec makes skipping to the match's first row a runtime error (the
    engine would re-find the same match forever), so we reject it
    statically."""
    if after_match == "skip_to_next":
        return ("next", None)
    if after_match == "skip_past_last":
        return ("past_last", None)
    m = re.fullmatch(r"skip_to_(first|last):([0-9]+)", after_match)
    if not m:
        raise ValueError(f"unknown after_match: {after_match!r}")
    pos = int(m.group(2))
    if not (1 <= pos <= k_total):
        raise ValueError(
            f"after_match {after_match!r}: skip target out of range — the "
            f"pattern has steps 1..{k_total}"
        )
    return (m.group(1), pos)


def _check_skip_target(mode, target, steps_or_none, loop_pos, opt, k_total):
    """Shared skip-to target validation: the target must be MAPPED in
    every match (not optional), and a loop target must carry binding
    measures with at least one guaranteed hop — the skip point is read
    from the loop's first/last bound row."""
    if mode not in ("first", "last"):
        return
    if target == 1:
        # (an ANCHOR-position loop remaps its legal skip_to_last:1 to the
        # desugared inner loop before reaching this check)
        raise ValueError(
            "skip_to target position 1 is the match's first row — "
            "skipping to it would re-find the same match forever, "
            "MATCH_RECOGNIZE's runtime-error case"
        )
    if target in opt:
        raise ValueError(
            f"skip_to target step {target} is optional: a skipped "
            "optional leaves the skip variable unmapped (the "
            "MATCH_RECOGNIZE error case) — target a required step"
        )
    if target in loop_pos:
        sp_ = steps_or_none[target - 1]
        if not sp_.bind:
            raise ValueError(
                f"skip_to target step {target} is a LoopStep without "
                "bind measures: the skip point is the loop's "
                f"{mode} bound row — set bind=True on the loop"
            )
        if sp_.min_n < 1:
            raise ValueError(
                f"skip_to target step {target} is a LoopStep with "
                "min_n=0: a zero-hop loop leaves the skip variable "
                "unmapped — require min_n >= 1"
            )


def _remap_skip_for_anchor_loop(after_match: str, k_total: int) -> str:
    """Remap a positional skip-to target across the anchor-loop desugar
    (``A+ B …`` -> ``A (A)* B …``): user position j >= 2 becomes j + 1.
    Position 1 is the anchor LOOP: ``skip_to_first:1`` is the anchor row
    itself (the statically-rejected infinite-loop case), while
    ``skip_to_last:1`` is the loop's last hop — exactly the desugared
    INNER loop's last hop whenever the inner loop is guaranteed nonempty
    (original ``min_n >= 2``; thinner loops may leave it unmapped and are
    rejected by the inner validation)."""
    mode, target = _parse_after_match(after_match, k_total)
    if mode in ("next", "past_last"):
        return after_match
    if target == 1:
        if mode == "first":
            raise ValueError(
                "skip_to_first:1 on an anchor-position loop is the "
                "match's first row — the statically-rejected "
                "infinite-loop case"
            )
        return "skip_to_last:2"
    return f"skip_to_{mode}:{target + 1}"


def _desugar_anchor_loop(sp: LoopStep, rest_len: int) -> LoopStep:
    """Shared validation for an ANCHOR-position loop (``A+ B …`` /
    Flink's ``begin().oneOrMore()``), returning the inner loop of the
    desugared form ``A (A){min_n-1, max_n-1} B …``: the match's first
    hop becomes the anchor step, the remaining hops a middle (or, for a
    pattern that is ONLY a loop, final) LoopStep.  The identity behind
    the rewrite: the earliest closer whose open interval after the
    anchor holds ``>= min_n - 1`` further hops is exactly the earliest
    closer with ``>= min_n`` total hops, and with every loop event
    anchoring its own potential match this reproduces MATCH_RECOGNIZE's
    per-row skip-to-next semantics for ``A+ B``."""
    if sp.min_n < 1:
        raise ValueError(
            "an ANCHOR-position LoopStep needs min_n >= 1 (A* cannot "
            "anchor — something must start the match)"
        )
    if rest_len == 0:
        # [LoopStep] alone: A{m,} closed by the anchor horizon / session
        # bound — desugars onto the FINAL-loop path
        if sp.min_n < 2:
            raise ValueError(
                "a pattern that is ONLY a loop (A+ alone) needs "
                "min_n >= 2: with min_n=1 every matching event would "
                "emit a vacuous single-hop match at the horizon"
            )
        if not sp.bind:
            raise ValueError(
                "a pattern that is ONLY a loop needs bind measures — "
                "with bind=False the emitted rows would carry no match "
                "identity (no closer step exists to emit ts_k/id_k)"
            )
    return _dc_replace(
        sp,
        min_n=sp.min_n - 1,
        max_n=None if sp.max_n is None else sp.max_n - 1,
    )


def _shift_counts_for_anchor_loop(counts):
    """Step indices in user-facing CountBetween specs refer to the
    PRE-desugar pattern; the desugared pattern has one extra step in
    front, so every reference shifts by one.  Index 1 is the loop itself
    and stays rejected (loops emit no ts_k to anchor a count on)."""
    out = []
    for c in counts or ():
        if c.lo_step == 1 or c.hi_step == 1:
            raise ValueError(
                "CountBetween must anchor on matched non-loop steps (loop "
                "steps emit no ts_k)"
            )
        out.append(_dc_replace(c, lo_step=c.lo_step + 1, hi_step=c.hi_step + 1))
    return out or None


def _anchor_loop_project(out: DataFrame, name: str, bind) -> DataFrame:
    """Post-projection for the anchor-loop desugar: fold the synthetic
    anchor step back into the loop's measures (the anchor IS the first
    hop: n + 1, first = anchor, last defaults to the anchor when no
    further hop matched, the bound id array gains the anchor in front)
    and shift every ``ts_k``/``id_k``/``branch_k`` down one position so
    the user-facing columns match the pattern as written.  Works on the
    batch and the stream result alike — plain column algebra."""
    sel = []
    for c in out.columns:
        if c in ("ts_1", "id_1", "branch_1"):
            continue  # the synthetic anchor: folded into the measures
        if bind and c == f"first_{name}_ts":
            sel.append(F.col("ts_1").alias(c))
        elif bind and c == f"first_{name}_id":
            sel.append(F.col("id_1").alias(c))
        elif bind and c == f"last_{name}_ts":
            sel.append(F.coalesce(F.col(c), F.col("ts_1")).alias(c))
        elif bind and c == f"last_{name}_id":
            sel.append(F.coalesce(F.col(c), F.col("id_1")).alias(c))
        elif bind == "all" and c == f"{name}_ids":
            sel.append(F.concat(F.array(F.col("id_1")), F.col(c)).alias(c))
        elif c == f"n_{name}":
            sel.append((F.col(c) + F.lit(1)).cast("long").alias(c))
        else:
            m = re.fullmatch(r"(ts|id|branch)_(\d+)", c)
            if m:
                sel.append(
                    F.col(c).alias(f"{m.group(1)}_{int(m.group(2)) - 1}")
                )
            else:
                sel.append(F.col(c))
    return out.select(*sel)


def match_sequence(
    df: DataFrame,
    steps: list,
    key_cols: list[str],
    time_col: str = "ts",
    id_col: str = "event_id",
    within: str = "30 minutes",
    forbid: Column | None = None,
    step_within: str | None = None,
    optional_steps: set[int] | None = None,
    counts: list[CountBetween] | None = None,
    after_match: str = "skip_to_next",
    strict_steps: set[int] | None = None,
    contiguous: bool = False,
    reuse_scan: bool = False,
) -> DataFrame:
    """Ordered-sequence detection: one output row per step-1 anchor whose
    full pattern completes, with (ts_k, id_k) for every step.

    ``reuse_scan=True`` (round 8, opt-in) evaluates every step/loop/
    forbid/count predicate once in a single scan, persists the narrow
    (key, ts, id, captured payload, bitmask) frame, and runs the cascade
    off bit tests against it — one source pass instead of one per
    step/branch, at the cost of per-branch predicate pushdown and cache
    residency. Release the cached frame with
    ``functions.buckets.release_persisted()`` after consuming the result.
    Results are identical either way (differentially pinned).

    ``strict_steps`` marks 1-based step positions as STRICTLY CONTIGUOUS
    (Flink's ``next()`` vs the default ``followedBy``; MATCH_RECOGNIZE's
    default adjacency): a strict step must be matched by the key's very
    NEXT event after the previous matched step — any intervening event
    of the key (ANY type, pattern vocabulary or not) kills the match
    attempt.  "Next" is the (ts, id) order over events with ts strictly
    after the previous step's (same open boundary as a regular step, so
    an event sharing the previous step's timestamp neither matches nor
    kills).  ``contiguous=True`` is shorthand for every step 2..k being
    strict.  Strictness applies to plain/alternation required steps
    only: the anchor cannot be strict (nothing precedes it) and a loop
    or optional step — or the step right after one — cannot (the
    "previous matched row" is not a single fixed event there); both
    raise.  Physically one extra left-anti range join per strict step
    over the (already small) match set, the same shape as ``forbid``.

    ``steps`` are boolean Column predicates over ``df``'s rows, e.g.
    ``[F.col("event_type") == "view", F.col("event_type") == "click"]``.
    ``id_col`` must be unique per row — it is the deterministic tiebreak
    for simultaneous events and the anchor identity in the output.

    A step may instead be a LIST of predicates — alternation, the
    ``A (B|C) D`` pattern: the step matches the earliest event satisfying
    ANY branch, and the output adds a ``branch_k`` int column recording
    WHICH branch matched (0-based; MATCH_RECOGNIZE's ``CLASSIFIER()``
    analogue). An event satisfying several branches reports the lowest
    branch index. Physically the branch candidate sources are unioned
    before the same min(struct) — no extra shuffle vs a plain step, the
    union is scan-parallel.

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
    find (skip-to-next semantics, same as the stream state machine).

    ``optional_steps`` (MATCH_RECOGNIZE's ``B?``) marks 1-based step
    indices as skippable. Deterministic no-lookahead rule, shared with the
    stream twin: optional step k is TAKEN iff its earliest candidate after
    step k-1 occurs strictly before the earliest candidate of step k+1 —
    i.e. whichever qualifying event comes first in event time decides, so
    in-order streaming needs no backtracking. Skipped steps emit null
    ``ts_k``/``id_k``. Constraints: the anchor (step 1) and the final step
    cannot be optional, two consecutive steps cannot both be optional, and
    ``step_within`` cannot be combined with optionals (the gap base would
    be ambiguous) — violations raise.

    ``counts`` are :class:`CountBetween` quantifiers — bounded-loop
    (``B{m,n}``) semantics as a declarative count over the open interval
    between two matched (non-optional) steps, emitted as ``n_<name>`` and
    filtered to ``[min_n, max_n]``. One extra aggregate-after-range-join
    per spec, applied after the sequence completes (the match set is small
    by then).

    ``after_match`` selects the MATCH_RECOGNIZE skip strategy:
    ``"skip_to_next"`` (default — every anchor reported, matches may
    overlap), ``"skip_past_last"`` (greedy non-overlapping: keep matches
    in anchor order, dropping any whose anchor (ts, id) is not strictly
    after the previous kept match's final row — AFTER MATCH SKIP PAST
    LAST ROW), or ``"skip_to_first:<pos>"`` / ``"skip_to_last:<pos>"``
    (AFTER MATCH SKIP TO FIRST|LAST <var>, the variable addressed by its
    1-based step POSITION like ``strict_steps``): matching resumes AT the
    row bound to that step, so the skip row itself may anchor the next
    match (inclusive comparison) while matches anchored strictly between
    the previous anchor and the skip row are discarded. The target must
    be a required step 2..k (position 1 — the match's first row — is the
    SQL spec's infinite-loop runtime error, rejected statically; a
    skipped optional would leave the variable unmapped, also rejected); a
    LoopStep target reads its ``first``/``last`` bound hop, so it needs
    ``bind`` measures and ``min_n >= 1``. Because every step binds the
    EARLIEST qualifying event, an earlier anchor never completes after a
    later one, so the greedy pass over the already-computed match set
    equals the sequential restart-at-skip-point search; it runs per key
    via applyInPandas over the (small) match table only — the event
    table never reaches Python."""
    strict = frozenset(strict_steps or ()) | (
        frozenset(range(2, len(steps) + 1)) if contiguous else frozenset()
    )
    if steps and isinstance(steps[0], LoopStep):
        # ANCHOR-position loop (A+ B …): desugar to A (A)* B … — the
        # first hop anchors, the rest ride the middle/final loop path —
        # then fold the anchor back into the measures.  One recursion
        # level only (the desugared anchor is a plain Column).
        sp0 = steps[0]
        if not _valid_loop_pred(sp0.pred):
            raise ValueError(
                "step 1: batch LoopStep needs pred= (a Column or a list "
                "of Columns)"
            )
        if len(steps) > 1 and isinstance(steps[1], LoopStep):
            raise ValueError("two consecutive steps cannot both be loops")
        inner = _desugar_anchor_loop(sp0, len(steps) - 1)
        anchor_spec = (
            sp0.pred if isinstance(sp0.pred, Column) else list(sp0.pred)
        )

        def _shift_cross(s):
            # The desugar shifts positions >= 2 up by one, but a
            # CrossPred's ``pred`` is an OPAQUE Column whose references
            # (``_def_<j>_<col>``, ``ts_<j>``, ``id_<j>``) are baked to
            # the PRE-shift numbering — remapping ``needs`` alone would
            # leave the pred pointing at columns the shifted frame no
            # longer carries (UNRESOLVED_COLUMN at runtime). No rewrite
            # of an opaque Column is possible, so reject with a targeted
            # error instead of failing deep in analysis.
            if not isinstance(s, CrossPred):
                return s
            raise ValueError(
                "a CrossPred step cannot be combined with an "
                "anchor-position loop (the A+ ... desugar renumbers "
                "steps, which an opaque CrossPred predicate cannot "
                "follow); anchor the pattern on a plain step, or move "
                "the loop off position 1"
            )

        out = match_sequence(
            df,
            [anchor_spec, inner, *[_shift_cross(s) for s in steps[1:]]],
            key_cols,
            time_col=time_col,
            id_col=id_col,
            within=within,
            forbid=forbid,
            step_within=step_within,
            optional_steps=(
                {i + 1 if i >= 2 else i for i in optional_steps}
                if optional_steps
                else None
            ),
            counts=_shift_counts_for_anchor_loop(counts),
            after_match=_remap_skip_for_anchor_loop(after_match, len(steps)),
            strict_steps={s + 1 if s >= 2 else s for s in strict} or None,
            reuse_scan=reuse_scan,
        )
        return _anchor_loop_project(out, sp0.name, sp0.bind)
    if len(steps) < 2:
        raise ValueError("match_sequence needs at least 2 steps")
    skip_mode, skip_target = _parse_after_match(after_match, len(steps))
    k_total = len(steps)
    opt = set(optional_steps or ())
    if opt:
        if step_within is not None:
            raise ValueError("optional_steps cannot be combined with step_within")
        if 1 in opt or k_total in opt:
            raise ValueError("the anchor and the final step cannot be optional")
        if any(k + 1 in opt for k in opt):
            raise ValueError("two consecutive steps cannot both be optional")
    loop_pos = {
        j + 1 for j, s in enumerate(steps) if isinstance(s, LoopStep)
    }
    if loop_pos:
        if step_within is not None:
            raise ValueError("LoopStep cannot be combined with step_within")
        # position 1 cannot be a loop here: the anchor-loop desugar above
        # already rewrote it to a plain anchor + inner loop
        if k_total in loop_pos:
            # FINAL-position loop: A B+ closed by the anchor horizon (or the
            # session bound in sessionized mode) instead of a closer event
            fspec = steps[k_total - 1]
            if fspec.min_n < 1:
                raise ValueError(
                    "a FINAL LoopStep needs min_n >= 1 (min_n=0 would emit a "
                    "vacuous match for every completed prefix)"
                )
            if fspec.greedy:
                raise ValueError(
                    "greedy has no effect on a FINAL LoopStep (there is no "
                    "closer to munch past) — drop greedy=True"
                )
            if forbid is not None:
                raise ValueError(
                    "forbid cannot be combined with a FINAL LoopStep (the "
                    "negation interval's right edge is the final matched "
                    "step, which a final loop does not emit)"
                )
            if after_match != "skip_to_next":
                raise ValueError(
                    "a non-default after_match cannot be combined with a "
                    "FINAL LoopStep (the skip point references matched "
                    "rows a deadline-closed loop does not pin down)"
                )
        if any(p + 1 in loop_pos for p in loop_pos):
            raise ValueError("two consecutive steps cannot both be loops")
        if loop_pos & opt or any(p + 1 in opt for p in loop_pos):
            raise ValueError(
                "a loop step cannot be optional and its closer (the step "
                "after it) must be a required non-loop step"
            )
        for p in loop_pos:
            if not _valid_loop_pred(steps[p - 1].pred):
                raise ValueError(
                    f"step {p}: batch LoopStep needs pred= (a Column or a "
                    "list of Columns)"
                )
            sp_ = steps[p - 1]
            if sp_.max_n is not None and sp_.max_n < sp_.min_n:
                # the stream twin caps hop ACCUMULATION at max_n, so a
                # min_n above it could never be met there while the batch
                # count (uncapped) could — reject the vacuous spec instead
                # of letting the twins diverge
                raise ValueError(
                    f"step {p}: LoopStep max_n ({sp_.max_n}) < min_n "
                    f"({sp_.min_n})"
                )
    for j in opt:
        # the optional's closer is consumed jointly with it
        if j + 1 in loop_pos:
            raise ValueError("an optional step's closer cannot be a loop")
    for s in strict:
        if not (2 <= s <= k_total):
            raise ValueError(
                f"strict step {s} out of range (the anchor cannot be "
                "strict — nothing precedes it)"
            )
        if s in loop_pos or s in opt:
            raise ValueError(
                f"strict step {s}: a loop or optional step cannot be "
                "strict (its match is not a single next event)"
            )
        if (s - 1) in loop_pos or (s - 1) in opt:
            raise ValueError(
                f"strict step {s}: the step after a loop or an optional "
                "cannot be strict (the previous matched row is not a "
                "single fixed event)"
            )
    cross_pos = {
        j + 1 for j, s in enumerate(steps) if isinstance(s, CrossPred)
    }
    captures: dict[int, list[str]] = {}
    if cross_pos:
        if 1 in cross_pos:
            raise ValueError(
                "step 1 (the anchor) cannot be a CrossPred — there is no "
                "prior step to reference"
            )
        for p in sorted(cross_pos):
            if p in opt or (p - 1) in opt:
                raise ValueError(
                    f"step {p}: a CrossPred cannot be an optional step or "
                    "the closer of one (the optional's joint decision has "
                    "no per-candidate cross evaluation)"
                )
            sp_ = steps[p - 1]
            for j, col in sp_.needs:
                if not (1 <= j < p):
                    raise ValueError(
                        f"step {p}: CrossPred references step {j}, which "
                        "is not a PRIOR step (only already-bound rows can "
                        "be referenced)"
                    )
                if j in loop_pos:
                    raise ValueError(
                        f"step {p}: CrossPred cannot reference loop step "
                        f"{j}'s payload (a loop binds no single row — "
                        "reference its closer instead)"
                    )
                if j in opt or (j - 1) in opt:
                    raise ValueError(
                        f"step {p}: CrossPred cannot reference optional "
                        f"step {j} or the closer of one (it may bind "
                        "nothing)"
                    )
                if col not in df.columns:
                    raise ValueError(
                        f"CrossPred capture column {col!r} is not an "
                        "input column"
                    )
                cl = captures.setdefault(j, [])
                if col not in cl:
                    cl.append(col)
            for c in sp_.ev_cols:
                if c not in df.columns:
                    raise ValueError(
                        f"CrossPred event column {c!r} is not an input "
                        "column"
                    )
        captures = {j: sorted(cols) for j, cols in captures.items()}
    _check_skip_target(skip_mode, skip_target, steps, loop_pos, opt, k_total)
    for spec in counts or ():
        if not (1 <= spec.lo_step < spec.hi_step <= k_total):
            raise ValueError(f"CountBetween steps out of range: {spec}")
        if spec.lo_step in opt or spec.hi_step in opt:
            raise ValueError("CountBetween must anchor on non-optional steps")
        if spec.lo_step in loop_pos or spec.hi_step in loop_pos:
            raise ValueError(
                "CountBetween must anchor on matched non-loop steps (loop "
                "steps emit no ts_k)"
            )
    for j, s in enumerate(steps):
        if _is_alt(s) and not len(s):
            raise ValueError(f"step {j + 1}: alternation needs >= 1 branch")
    # duplicate measure names (two default-named loops, a CountBetween
    # colliding with a loop, or a name shadowing the ts_k/id_k/branch_k
    # pattern columns or the key) would surface as an ambiguous-reference
    # AnalysisException deep inside the join cascade — reject up front
    # with the stream twin's contract
    out_names = list(key_cols)
    for k in range(1, k_total + 1):
        out_names += [f"ts_{k}", f"id_{k}", f"branch_{k}"]
    for p in sorted(loop_pos):
        sp_ = steps[p - 1]
        out_names.append(f"n_{sp_.name}")
        if sp_.bind:
            out_names += [
                f"first_{sp_.name}_ts", f"first_{sp_.name}_id",
                f"last_{sp_.name}_ts", f"last_{sp_.name}_id",
            ]
            if sp_.bind == "all":
                out_names.append(f"{sp_.name}_ids")
    for spec in counts or ():
        out_names.append(f"n_{spec.name}")
        if spec.bind:
            out_names += [
                f"first_{spec.name}_ts", f"first_{spec.name}_id",
                f"last_{spec.name}_ts", f"last_{spec.name}_id",
            ]
            if spec.bind == "all":
                out_names.append(f"{spec.name}_ids")
    if len(set(out_names)) != len(out_names):
        dupes = sorted({n for n in out_names if out_names.count(n) > 1})
        raise ValueError(
            f"duplicate output column name(s) {dupes}: LoopStep/CountBetween "
            "names must be distinct and must not collide with the "
            "ts_k/id_k/branch_k pattern columns or the key"
        )
    # null time/id rows can neither anchor nor advance (null comparisons are
    # false) and the min(struct) tiebreak is ill-defined on null ids — drop
    # them up front so batch and stream treat contract-violating rows
    # identically (the stream twin dropna()s the same rows).
    df = df.filter(F.col(time_col).isNotNull() & F.col(id_col).isNotNull())
    if reuse_scan:
        # SHARED CANDIDATE BASE FRAME (round 8, opt-in): the cascade below
        # re-scans the source once per step/branch — per-branch pruning
        # and pushdown make each scan cheap, but at k steps that is k+
        # passes over the events table. With reuse_scan=True every step
        # predicate (plus loop bodies, the forbid predicate and the
        # CountBetween predicates) is evaluated ONCE in a single scan
        # projection as a long bitmask `_pm`, the narrow
        # (key, ts, id, captured payload, _pm) frame is persisted via the
        # process registry (release with
        # functions.buckets.release_persisted), rows matching NO
        # predicate are dropped (kept when strict steps need every row),
        # and the original predicates are REWRITTEN to bit tests so the
        # unchanged cascade reads the cached frame instead of the source.
        # Trade-off: one full scan with no per-branch pushdown + cache
        # residency, vs k pushed-down scans — wins when the pattern
        # vocabulary covers a meaningful fraction of rows or the source
        # scan is expensive; the default (False) keeps pushdown.
        preds_flat: list[Column] = []

        def _reg(p: Column) -> Column:
            preds_flat.append(
                F.coalesce(p.cast("boolean"), F.lit(False))
            )
            i = len(preds_flat) - 1
            return (
                F.shiftright(F.col("_pm"), i).bitwiseAND(F.lit(1)) == 1
            )

        new_steps: list = []
        for s in steps:
            if isinstance(s, LoopStep):
                body = s.pred
                nb = (
                    _reg(body) if isinstance(body, Column)
                    else [_reg(b) for b in body]
                )
                new_steps.append(_dc_replace(s, pred=nb))
            elif isinstance(s, CrossPred):
                new_steps.append(_dc_replace(
                    s,
                    local=_reg(s.local) if s.local is not None
                    else _reg(F.lit(True)),
                ))
            elif _is_alt(s):
                new_steps.append([_reg(b) for b in s])
            else:
                new_steps.append(_reg(s))
        forbid = _reg(forbid) if forbid is not None else None
        counts = [
            _dc_replace(c, pred=_reg(c.pred)) for c in (counts or [])
        ] or None
        if len(preds_flat) > 62:
            raise ValueError(
                "reuse_scan supports at most 62 predicate branches "
                "(long bitmask)"
            )
        payload_cols = sorted(
            {c for cols in captures.values() for c in cols}
            | {c for s in steps if isinstance(s, CrossPred)
               for c in s.ev_cols}
        )
        mask = reduce(
            lambda a, b: a.bitwiseOR(b),
            [
                F.when(p, F.lit(1 << i)).otherwise(F.lit(0)).cast("long")
                for i, p in enumerate(preds_flat)
            ],
        )
        base = df.select(
            *key_cols, time_col, id_col, *payload_cols,
            mask.alias("_pm"),
        )
        if not strict:
            # strict contiguity joins against EVERY event of the key —
            # only then must non-vocabulary rows stay in the frame
            base = base.filter(F.col("_pm") != 0)
        from ..functions.buckets import persist_tracked

        df = persist_tracked(base)
        steps = new_steps
    iv = F.expr(f"INTERVAL {within}")
    step_iv = F.expr(f"INTERVAL {step_within}") if step_within else None

    def _src(spec, tcol, icol, bcol, ev_cols=()):
        """Candidate source for a step: (key, ts, id, branch). Alternation
        unions the per-branch filters (branch index recorded); a plain step
        carries a constant branch 0 that is projected away later.
        ``ev_cols`` additionally exposes payload columns as ``_ev_<col>``
        — for CrossPred evaluation and for capture by later steps."""
        branches = list(spec) if _is_alt(spec) else [spec]
        parts = [
            df.filter(p).select(
                *key_cols,
                F.col(time_col).alias(tcol),
                F.col(id_col).alias(icol),
                F.lit(j).cast("int").alias(bcol),
                *[F.col(c).alias(f"_ev_{c}") for c in ev_cols],
            )
            for j, p in enumerate(branches)
        ]
        return reduce(lambda a, b: a.unionByName(b), parts)

    cap1 = captures.get(1, ())
    cur = _src(steps[0], "ts_1", "id_1", "branch_1", ev_cols=cap1)
    if _is_alt(steps[0]):
        # one anchor per EVENT: an event matching several branches reports
        # the lowest branch index, not two anchors. Captured payload is
        # per-event (same id), so min() is just a deterministic pick.
        cur = cur.groupBy(*key_cols, "ts_1", "id_1").agg(
            F.min("branch_1").alias("branch_1"),
            *[F.min(f"_ev_{c}").alias(f"_def_1_{c}") for c in cap1],
        )
    else:
        cur = cur.drop("branch_1")
        for c in cap1:
            cur = cur.withColumnRenamed(f"_ev_{c}", f"_def_1_{c}")

    prev_ts = "ts_1"
    k = 2
    while k <= k_total:
        if k in opt:
            # optional step k, decided jointly with its (required) closer
            # k+1: earliest-candidate-wins — see docstring. Both candidate
            # sets are bounded after prev_ts; when the optional is taken
            # (b < c), the closer candidate is unchanged (any closer event
            # before b would have forced the skip path).
            anchor_cols = list(cur.columns)
            b = _src(steps[k - 1], "_bt", "_bi", "_bb")
            bcond = [F.col("_bt") > F.col(prev_ts), F.col("_bt") <= F.col("ts_1") + iv]
            cur = (
                cur.join(b, on=key_cols, how="left")
                .withColumn(
                    "_bm",
                    F.when(
                        reduce(lambda a, c: a & c, bcond),
                        F.struct(F.col("_bt"), F.col("_bi"), F.col("_bb")),
                    ),
                )
                .groupBy(*anchor_cols)
                .agg(F.min("_bm").alias("_bm"))
            )
            anchor_cols2 = list(cur.columns)
            nxt = _src(steps[k], "_t", "_i", "_cb")
            cur = (
                cur.join(nxt, on=key_cols)
                .filter(
                    (F.col("_t") > F.col(prev_ts))
                    & (F.col("_t") <= F.col("ts_1") + iv)
                )
                .groupBy(*anchor_cols2)
                .agg(
                    F.min(
                        F.struct(F.col("_t"), F.col("_i"), F.col("_cb"))
                    ).alias("_m")
                )
            )
            taken = F.col("_bm").isNotNull() & (F.col("_bm._bt") < F.col("_m._t"))
            proj = [
                *[c for c in anchor_cols2 if c != "_bm"],
                F.when(taken, F.col("_bm._bt")).alias(f"ts_{k}"),
                F.when(taken, F.col("_bm._bi")).alias(f"id_{k}"),
            ]
            if _is_alt(steps[k - 1]):
                proj.append(F.when(taken, F.col("_bm._bb")).alias(f"branch_{k}"))
            proj += [
                F.col("_m._t").alias(f"ts_{k + 1}"),
                F.col("_m._i").alias(f"id_{k + 1}"),
            ]
            if _is_alt(steps[k]):
                proj.append(F.col("_m._cb").alias(f"branch_{k + 1}"))
            cur = cur.select(*proj)
            prev_ts = f"ts_{k + 1}"
            k += 2
            continue
        if k in loop_pos and k == k_total:
            # FINAL-position Kleene loop: no closer event — the loop closes
            # at the anchor horizon (ts_1 + within), or at the session bound
            # when the caller sessionized the key and made `within` inert.
            # Hops are every pred event in (prev_ts, ts_1 + within]; the
            # match emits iff at least min_n accrued (measures capped at
            # max_n, excess ignored — same discipline as the closer form).
            # Plan: ONE range join + ONE groupBy — min_n >= 1 (validated)
            # makes the inner join's empty-group drop exactly the filter.
            spec = steps[k - 1]
            anchor_cols = list(cur.columns)
            lsrc = df.filter(_loop_pred(spec)).select(
                *[F.col(c).alias(f"_lk_{c}") for c in key_cols],
                F.col(time_col).alias("_lt"),
                F.col(id_col).alias("_li"),
            )
            lcond = reduce(
                lambda a, b: a & b,
                [F.col(c) == F.col(f"_lk_{c}") for c in key_cols]
                + [
                    F.col("_lt") > F.col(prev_ts),
                    F.col("_lt") <= F.col("ts_1") + iv,
                ],
            )
            agg = (
                cur.join(lsrc, on=lcond)
                .groupBy(*anchor_cols)
                .agg(
                    F.count("_lt").alias("_ln"),
                    F.sort_array(
                        F.collect_list(F.struct(F.col("_lt"), F.col("_li")))
                    ).alias("_lh"),
                )
                .filter(F.col("_ln") >= spec.min_n)
            )
            ncap = (
                F.col("_ln")
                if spec.max_n is None
                else F.least(F.col("_ln"), F.lit(spec.max_n))
            )
            proj = [*anchor_cols, ncap.cast("long").alias(f"n_{spec.name}")]
            if spec.bind:
                npos = ncap.cast("int")
                first = F.element_at("_lh", 1)
                last = F.element_at("_lh", npos)
                proj += [
                    first["_lt"].alias(f"first_{spec.name}_ts"),
                    first["_li"].alias(f"first_{spec.name}_id"),
                    last["_lt"].alias(f"last_{spec.name}_ts"),
                    last["_li"].alias(f"last_{spec.name}_id"),
                ]
                if spec.bind == "all":
                    proj.append(
                        F.transform(
                            F.slice(F.col("_lh"), 1, npos),
                            lambda h: h["_li"],
                        ).alias(f"{spec.name}_ids")
                    )
            cur = agg.select(*proj)
            k += 1
            continue
        if k in loop_pos:
            # Kleene loop step k, closed jointly by required step k+1: the
            # closer is the earliest candidate whose open interval back to
            # the previous matched step holds >= min_n loop events (excess
            # beyond max_n is ignored, not poison). One candidate join +
            # one count range-join + min(struct); binding adds one more
            # range join AFTER the closer is fixed (match-set sized).
            spec = steps[k - 1]
            anchor_cols = list(cur.columns)
            csp = steps[k]
            c_cross = isinstance(csp, CrossPred)
            cap_c = captures.get(k + 1, ())
            ev_need_c = (
                sorted(set(csp.ev_cols) | set(cap_c)) if c_cross
                else list(cap_c)
            )
            if spec.greedy:
                # greedy closers carry a "do I also match the loop body?"
                # flag: a dual-matching candidate may only close once the
                # hop cap is reached (possessive munch)
                if c_cross:
                    branches = [
                        csp.local if csp.local is not None else F.lit(True)
                    ]
                else:
                    branches = list(csp) if _is_alt(csp) else [csp]
                body_pred = _loop_pred(spec)
                nxt = reduce(
                    lambda a, b: a.unionByName(b),
                    [
                        df.filter(p).select(
                            *key_cols,
                            F.col(time_col).alias("_t"),
                            F.col(id_col).alias("_i"),
                            F.lit(j).cast("int").alias("_cb"),
                            F.coalesce(body_pred, F.lit(False)).alias(
                                "_cbody"
                            ),
                            *[
                                F.col(c).alias(f"_ev_{c}")
                                for c in ev_need_c
                            ],
                        )
                        for j, p in enumerate(branches)
                    ],
                )
            else:
                nxt = _src(
                    csp.local if c_cross and csp.local is not None
                    else (F.lit(True) if c_cross else csp),
                    "_t", "_i", "_cb", ev_cols=ev_need_c,
                )
            cj_bound = (F.col("_t") > F.col(prev_ts)) & (
                F.col("_t") <= F.col("ts_1") + iv
            )
            if c_cross:
                # per-candidate cross evaluation: a closer candidate
                # failing the cross comparison is skipped, the next tried
                cj_bound = cj_bound & csp.pred
            cj = cur.join(nxt, on=key_cols).filter(cj_bound)
            lsrc = df.filter(_loop_pred(spec)).select(
                *[F.col(c).alias(f"_lk_{c}") for c in key_cols],
                F.col(time_col).alias("_lt"),
                F.col(id_col).alias("_li"),
            )
            lcond = reduce(
                lambda a, b: a & b,
                [F.col(c) == F.col(f"_lk_{c}") for c in key_cols]
                + [
                    F.col("_lt") > F.col(prev_ts),
                    F.col("_lt") < F.col("_t"),
                ],
            )
            cand_cols = ["_t", "_i", "_cb"] + (
                ["_cbody"] if spec.greedy else []
            ) + [f"_ev_{c}" for c in ev_need_c]
            counted = (
                cj.join(lsrc, on=lcond, how="left")
                .groupBy(*anchor_cols, *cand_cols)
                .agg(F.count("_lt").alias("_ln"))
            )
            elig = F.col("_ln") >= spec.min_n
            if spec.greedy:
                # a dual-matching closer closes only once the ts-strict
                # hop count has reached max_n (with max_n=None: never)
                cap_reached = (
                    F.lit(False)
                    if spec.max_n is None
                    else F.col("_ln") >= F.lit(spec.max_n)
                )
                elig = elig & (~F.col("_cbody") | cap_reached)
            best = (
                counted.filter(elig)
                .groupBy(*anchor_cols)
                .agg(
                    F.min(
                        F.struct(
                            F.col("_t"), F.col("_i"), F.col("_cb"),
                            F.col("_ln"),
                            # captured payload trails (id is unique — the
                            # extra fields never decide the min)
                            *[F.col(f"_ev_{c}") for c in cap_c],
                        )
                    ).alias("_m")
                )
            )
            ncap = (
                F.col("_m._ln")
                if spec.max_n is None
                else F.least(F.col("_m._ln"), F.lit(spec.max_n))
            )
            proj = [
                *anchor_cols,
                ncap.cast("long").alias(f"n_{spec.name}"),
                F.col("_m._t").alias(f"ts_{k + 1}"),
                F.col("_m._i").alias(f"id_{k + 1}"),
            ]
            if _is_alt(csp):
                proj.append(F.col("_m._cb").alias(f"branch_{k + 1}"))
            proj += [
                F.col(f"_m._ev_{c}").alias(f"_def_{k + 1}_{c}")
                for c in cap_c
            ]
            cur = best.select(*proj)
            if spec.bind:
                # bound-hop measures over the now-fixed (prev, closer)
                # interval: first min(raw, max_n) hops in (ts, id) order
                lcond2 = reduce(
                    lambda a, b: a & b,
                    [F.col(c) == F.col(f"_lk_{c}") for c in key_cols]
                    + [
                        F.col("_lt") > F.col(prev_ts),
                        F.col("_lt") < F.col(f"ts_{k + 1}"),
                    ],
                )
                grp_cols = [c for c in cur.columns]
                hop = F.struct(F.col("_lt"), F.col("_li"))
                cur = (
                    cur.join(lsrc, on=lcond2, how="left")
                    .groupBy(*grp_cols)
                    .agg(
                        F.sort_array(
                            F.collect_list(
                                F.when(F.col("_lt").isNotNull(), hop)
                            )
                        ).alias("_lh")
                    )
                )
                npos = F.col(f"n_{spec.name}")
                first = F.when(npos > 0, F.element_at("_lh", 1))
                last = F.when(
                    npos > 0, F.element_at("_lh", npos.cast("int"))
                )
                bind_proj = []
                for c in grp_cols:
                    bind_proj.append(F.col(c))
                    if c == f"n_{spec.name}":
                        bind_proj += [
                            first["_lt"].alias(f"first_{spec.name}_ts"),
                            first["_li"].alias(f"first_{spec.name}_id"),
                            last["_lt"].alias(f"last_{spec.name}_ts"),
                            last["_li"].alias(f"last_{spec.name}_id"),
                        ]
                        if spec.bind == "all":
                            bind_proj.append(
                                F.when(
                                    npos > 0,
                                    F.transform(
                                        F.slice(
                                            F.col("_lh"), 1, npos.cast("int")
                                        ),
                                        lambda h: h["_li"],
                                    ),
                                )
                                .otherwise(F.array().cast("array<long>"))
                                .alias(f"{spec.name}_ids")
                            )
                cur = cur.select(*bind_proj)
            prev_ts = f"ts_{k + 1}"
            k += 2
            continue
        sp_k = steps[k - 1]
        cap_k = captures.get(k, ())
        if isinstance(sp_k, CrossPred):
            # the cross part of the predicate cannot be scanned-for (it
            # references the partial frame) — candidates carry the local
            # pre-filter only; the cross comparison joins the step's
            # existing candidate join, so failing candidates are skipped
            # per-candidate (sequential semantics), not post-match
            ev_need = sorted(set(sp_k.ev_cols) | set(cap_k))
            nxt = _src(
                sp_k.local if sp_k.local is not None else F.lit(True),
                "_t", "_i", "_b", ev_cols=ev_need,
            )
        else:
            nxt = _src(sp_k, "_t", "_i", "_b", ev_cols=cap_k)
        anchor_cols = list(cur.columns)
        bound = (F.col("_t") > F.col(prev_ts)) & (
            F.col("_t") <= F.col("ts_1") + iv
        )
        if step_iv is not None:
            bound = bound & (F.col("_t") <= F.col(prev_ts) + step_iv)
        if isinstance(sp_k, CrossPred):
            bound = bound & sp_k.pred
        proj = [
            *anchor_cols,
            F.col("_m._t").alias(f"ts_{k}"),
            F.col("_m._i").alias(f"id_{k}"),
        ]
        if _is_alt(sp_k):
            proj.append(F.col("_m._b").alias(f"branch_{k}"))
        proj += [F.col(f"_m._ev_{c}").alias(f"_def_{k}_{c}") for c in cap_k]
        cur = (
            cur.join(nxt, on=key_cols)
            .filter(bound)
            .groupBy(*anchor_cols)
            # earliest qualifying event, id-tiebroken: struct comparison is
            # lexicographic over (ts, id); the trailing branch field only
            # tiebreaks an event matching several branches (lowest wins)
            # and captured payload fields trail further (id is unique, so
            # they never decide)
            .agg(F.min(F.struct(
                F.col("_t"), F.col("_i"), F.col("_b"),
                *[F.col(f"_ev_{c}") for c in cap_k],
            )).alias("_m"))
            .select(*proj)
        )
        prev_ts = f"ts_{k}"
        k += 1
    for s in sorted(strict):
        # strict contiguity: the bound candidate must BE the key's next
        # event — kill the match if ANY event (any type) lies strictly
        # between the previous step and the candidate in (ts, id) order.
        # Equal to the sequential rule: the machine at step s-1 looks at
        # the next event and dies unless it matches.  Renamed columns
        # sidestep self-join lineage ambiguity (nall and cur both descend
        # from df); left-anti over the already-small match set.
        nall = df.select(
            *[F.col(c).alias(f"_nk_{c}") for c in key_cols],
            F.col(time_col).alias("_nt"),
            F.col(id_col).alias("_ni"),
        )
        cond = [F.col(c) == F.col(f"_nk_{c}") for c in key_cols] + [
            F.col("_nt") > F.col(f"ts_{s - 1}"),
            F.struct(F.col("_nt"), F.col("_ni"))
            < F.struct(
                F.col(f"ts_{s}").alias("_nt"),
                F.col(f"id_{s}").alias("_ni"),
            ),
        ]
        cur = cur.join(nall, on=reduce(lambda a, b: a & b, cond), how="left_anti")
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
        cur = cur.join(bad, on=reduce(lambda a, b: a & b, cond), how="left_anti")
    for spec in counts or ():
        csrc = df.filter(spec.pred).select(
            *[F.col(c).alias(f"_ck_{c}") for c in key_cols],
            F.col(time_col).alias("_ct"),
            F.col(id_col).alias("_ci"),
        )
        ccond = reduce(
            lambda a, b: a & b,
            [F.col(c) == F.col(f"_ck_{c}") for c in key_cols]
            + [
                F.col("_ct") > F.col(f"ts_{spec.lo_step}"),
                F.col("_ct") < F.col(f"ts_{spec.hi_step}"),
            ],
        )
        anchor_cols = list(cur.columns)
        aggs = [F.count("_ct").alias(f"n_{spec.name}")]
        if spec.bind:
            # binding loop measures: FIRST/LAST of the loop's matched
            # events, (ts, id)-ordered — two extra aggregates on the same
            # range join, no extra shuffle
            hop = F.struct(F.col("_ct"), F.col("_ci"))
            aggs += [F.min(hop).alias("_cf"), F.max(hop).alias("_cl")]
            if spec.bind == "all":
                # the left join's no-hop row is a struct of NULL FIELDS
                # (not a null struct) — gate it so collect_list drops it
                # and a zero-hop loop yields an empty array
                aggs.append(
                    F.sort_array(
                        F.collect_list(
                            F.when(F.col("_ct").isNotNull(), hop)
                        )
                    ).alias("_ch")
                )
        cur = cur.join(csrc, on=ccond, how="left").groupBy(*anchor_cols).agg(*aggs)
        if spec.bind:
            proj = [
                *anchor_cols,
                f"n_{spec.name}",
                F.col("_cf._ct").alias(f"first_{spec.name}_ts"),
                F.col("_cf._ci").alias(f"first_{spec.name}_id"),
                F.col("_cl._ct").alias(f"last_{spec.name}_ts"),
                F.col("_cl._ci").alias(f"last_{spec.name}_id"),
            ]
            if spec.bind == "all":
                proj.append(
                    F.transform(F.col("_ch"), lambda h: h["_ci"]).alias(
                        f"{spec.name}_ids"
                    )
                )
            cur = cur.select(*proj)
        keep = F.col(f"n_{spec.name}") >= spec.min_n
        if spec.max_n is not None:
            keep = keep & (F.col(f"n_{spec.name}") <= spec.max_n)
        cur = cur.filter(keep)
    # captured cross-DEFINE payload is matcher-internal — drop it so the
    # output contract (and the stream twin's column set) is unchanged
    def_cols = [c for c in cur.columns if c.startswith("_def_")]
    if def_cols:
        cur = cur.drop(*def_cols)
    if skip_mode != "next":
        # AFTER MATCH SKIP: sequential-engine semantics replayed as a
        # greedy per-key pass over the (small) match set. The sequential
        # engine emits matches in anchor order and, after each emission,
        # resumes scanning at the skip point, discarding partials anchored
        # before it. Because every step binds the EARLIEST qualifying
        # event, per-anchor matches are deterministic and independent, so
        # "keep the next match whose anchor clears the resume point"
        # reproduces the restart exactly. skip_past_last resumes strictly
        # AFTER the match's final row; skip_to_first/last:<pos> resumes AT
        # the row bound to that step (the skip row may anchor the next
        # match — inclusive comparison).
        if skip_mode == "past_last":
            skip_ts, skip_id, incl = f"ts_{k_total}", f"id_{k_total}", False
        elif skip_target in loop_pos:
            nm = steps[skip_target - 1].name
            skip_ts, skip_id = f"{skip_mode}_{nm}_ts", f"{skip_mode}_{nm}_id"
            incl = True
        else:
            skip_ts, skip_id = f"ts_{skip_target}", f"id_{skip_target}"
            incl = True

        def _greedy(pdf):
            pdf = pdf.sort_values(["ts_1", "id_1"]).reset_index(drop=True)
            keep_idx: list[int] = []
            point = None
            for idx in range(len(pdf)):
                a = (pdf["ts_1"].iat[idx], int(pdf["id_1"].iat[idx]))
                if point is None or (a >= point if incl else a > point):
                    keep_idx.append(idx)
                    point = (
                        pdf[skip_ts].iat[idx],
                        int(pdf[skip_id].iat[idx]),
                    )
            return pdf.iloc[keep_idx]

        cur = cur.groupBy(*key_cols).applyInPandas(_greedy, schema=cur.schema)
    return cur


def all_rows_per_match(
    matches: DataFrame,
    events: DataFrame,
    steps: list,
    key_cols: list[str],
    time_col: str = "ts",
    id_col: str = "event_id",
    counts: list[CountBetween] | None = None,
    step_names: list[str] | None = None,
) -> DataFrame:
    """MATCH_RECOGNIZE's ``ALL ROWS PER MATCH`` output mode as an
    expansion over the (already small) one-row-per-match result of
    :func:`match_sequence` / :func:`match_sequence_stream`: one output
    row per BOUND EVENT, carrying the full event payload, the
    ``classifier`` (the pattern variable that bound the row —
    ``CLASSIFIER()``), ``match_no`` (per-key sequential match number in
    anchor order — ``MATCH_NUMBER()``), ``row_in_match`` (the row's
    ordinal inside its match, (ts, id) order), and every measure column
    of the match (FINAL semantics — the same value on every row of the
    match, which is what ``ALL ROWS PER MATCH`` with FINAL measures
    emits).

    ``steps`` is the SAME list passed to the matcher (Columns /
    predicate lists / :class:`LoopStep`), used structurally: a plain or
    alternation step contributes its bound ``id_k`` (a skipped optional
    contributes nothing — MATCH_RECOGNIZE only outputs rows the match
    mapped); a LoopStep contributes every hop id and therefore requires
    ``bind="all"`` (the ``<name>_ids`` measure). ``counts`` may pass the
    matcher's CountBetween list — specs with ``bind="all"`` expand their
    counted rows too (classifier = the count's name), others are
    measures-only. ``step_names`` optionally names the plain steps
    (default ``s1..sk``; loops and counts use their own names) —
    MATCH_RECOGNIZE's variable names.

    Scale shape: plain column algebra (array build + explode) over the
    match set, then ONE equi-join back to ``events`` on (key, id) —
    Catalyst broadcasts the exploded match side when small, and the
    event scan prunes to the join columns plus payload. Works on a
    STREAMING match result too (the explode is stateless) as long as
    ``events`` is a static table (stream-static equi-join); expanding
    against the live stream itself would need a watermarked
    stream-stream join — pass a snapshot instead, or carry the payload
    through the matcher's key. ``match_no``/``row_in_match`` need a
    window over the finished match set, so they are emitted only for
    batch inputs (a streaming expansion keeps the anchor columns as the
    match identity instead)."""
    k_total = len(steps)
    names = list(step_names or (f"s{j}" for j in range(1, k_total + 1)))
    if len(names) != k_total:
        raise ValueError(
            f"step_names has {len(names)} entries for {k_total} steps"
        )
    # anchor identity: (ts_1, id_1), or the folded first-hop measures of
    # an anchor-position loop (whose projection drops the synthetic ts_1)
    if "ts_1" in matches.columns:
        a_ts, a_id = F.col("ts_1"), F.col("id_1")
    elif isinstance(steps[0], LoopStep):
        nm0 = steps[0].name
        if f"first_{nm0}_ts" not in matches.columns:
            raise ValueError(
                "an anchor-position loop needs bind measures to expand "
                "(the anchor identity is its first bound hop)"
            )
        a_ts, a_id = F.col(f"first_{nm0}_ts"), F.col(f"first_{nm0}_id")
    else:
        raise ValueError("matches is missing the anchor columns ts_1/id_1")
    def _loop_part(nm: str):
        # closure factory: a 1-arg lambda only (F.transform hands a 2-arg
        # callable (element, array_index) — a default-arg capture would
        # silently receive the index)
        col = f"{nm}_ids"
        if col not in matches.columns:
            raise ValueError(f"matches is missing the {col} measure")
        return F.transform(
            F.col(col),
            lambda i: F.struct(i.alias("_rid"), F.lit(nm).alias("_cls")),
        )

    parts = []
    for j, spec in enumerate(steps):
        if isinstance(spec, LoopStep):
            if spec.bind != "all":
                raise ValueError(
                    f"step {j + 1}: ALL ROWS PER MATCH needs the loop's "
                    "full hop ids — set bind=\"all\" on the LoopStep"
                )
            parts.append(_loop_part(spec.name))
            continue
        idc = f"id_{j + 1}"
        if idc not in matches.columns:
            raise ValueError(f"matches is missing the {idc} column")
        # a skipped optional has a null id: filter drops the null struct
        parts.append(
            F.filter(
                F.array(
                    F.struct(
                        F.col(idc).alias("_rid"),
                        F.lit(names[j]).alias("_cls"),
                    )
                ),
                lambda s: s["_rid"].isNotNull(),
            )
        )
    for spec in counts or ():
        if spec.bind == "all":
            parts.append(_loop_part(spec.name))
    measure_cols = [c for c in matches.columns if c not in key_cols]
    exp = matches.select(
        *key_cols,
        *measure_cols,
        a_ts.alias("_a_ts"),
        a_id.alias("_a_id"),
        F.explode(F.concat(*parts)).alias("_hit"),
    ).select("*", F.col("_hit._rid").alias("_rid"),
             F.col("_hit._cls").alias("classifier")).drop("_hit")
    ev_cols = [c for c in events.columns if c not in key_cols]
    # matches derives from events, so the join-back is a self-join in
    # lineage terms: alias both sides and use qualified refs throughout
    ja, jb = "_arpm_m", "_arpm_e"
    joined = (
        exp.alias(ja)
        .join(
            events.alias(jb),
            on=reduce(
                lambda a, b: a & b,
                [F.col(f"{ja}.{kc}") == F.col(f"{jb}.{kc}") for kc in key_cols]
                + [F.col(f"{ja}._rid") == F.col(f"{jb}.{id_col}")],
            ),
            how="inner",
        )
        .select(
            *[F.col(f"{ja}.{kc}") for kc in key_cols],
            *[F.col(f"{jb}.{c}") for c in ev_cols],
            F.col(f"{ja}.classifier"),
            *[F.col(f"{ja}.{c}") for c in measure_cols],
            F.col(f"{ja}._a_ts"), F.col(f"{ja}._a_id"),
        )
    )
    if matches.isStreaming:
        return joined.withColumnRenamed("_a_ts", "anchor_ts").withColumnRenamed(
            "_a_id", "anchor_id"
        )
    from pyspark.sql.window import Window

    mw = Window.partitionBy(*key_cols).orderBy("_a_ts", "_a_id")
    rw = Window.partitionBy(*key_cols, "_a_ts", "_a_id").orderBy(
        F.col(time_col), F.col(id_col)
    )
    return (
        joined.withColumn("match_no", F.dense_rank().over(mw))
        .withColumn("row_in_match", F.row_number().over(rw))
        .drop("_a_ts", "_a_id")
    )


def match_repeated_group(
    df: DataFrame,
    preds: list[Column],
    key_cols: list[str],
    min_r: int,
    max_r: int,
    time_col: str = "ts",
    id_col: str = "event_id",
    within: str = "30 minutes",
    greedy: bool = True,
    var_names: list[str] | None = None,
    closer: Column | None = None,
    prefix: list[Column] | None = None,
    suffix: list[Column] | None = None,
    suffix_names: list[str] | None = None,
    reuse_scan: bool = False,
) -> DataFrame:
    """MATCH_RECOGNIZE's quantified SEQUENCE group ``(A B){m,n}`` as a
    lone pattern — or, with ``closer``, ``(A B){m,n} C`` (round 8), or
    with ``prefix``/``suffix``, ``V (A B){m,n} C D`` (late round 8 —
    the group DEEPER inside a pattern, required single-row steps on
    either side): the whole group repeats r times, r in [m, n], and
    (greedy, the standard's munch) the LARGEST feasible r wins per
    anchor row; ``greedy=False`` picks the smallest.

    ``suffix`` generalizes ``closer`` to MULTIPLE trailing steps (give
    one or the other): every r-variant appends them all, so an
    r-variant is feasible only when the whole suffix completes after
    rep r — the same backtracking-munch argument. Suffix rows emit
    ``<name>_ts``/``<name>_id`` per ``suffix_names`` (a single
    ``closer=`` keeps emitting ``closer_ts``/``closer_id``).

    With a ``closer`` predicate, each r-variant is the 2r-step unroll
    PLUS the closer as its final required step — so an r-variant is
    feasible only when the closer ALSO completes after rep r, and the
    r-union's winner pick reproduces the backtracking munch exactly: a
    greedy matcher that consumes r reps but then finds no closer
    backtracks to r-1, which is precisely the (r-1)-variant surviving
    the union. The closer's row is emitted as ``closer_ts`` /
    ``closer_id``.

    With ``prefix`` predicates, every r-variant starts with the SAME
    prefix steps, whose earliest-first binding from a given anchor row
    is variant-independent — so the per-anchor winner rule is unchanged
    and the anchor ``(ts_1, id_1)`` is the FIRST PREFIX step's row
    (additional prefix steps emit ``ts_2``/``id_2`` …).

    Semantics — defined by construction: each repetition count r is the
    plain relaxed-contiguity sequence ``[prefix] A B A B … [closer]``
    matched independently (the engine's earliest-first binding), and
    the variants are unioned with one winner per anchor.  The union IS
    the backtracking a sequential munch lacks: an r-variant failing
    never poisons the (r-1)-variant.  Bounded n required (the k·n-step
    unroll is the documented cost — same k! shape as PERMUTE); group
    variables bind MULTIPLE rows, so the output carries the loop-style
    measures ``n_reps``, ``first/last_<var>_{ts,id}`` per group
    variable, plus the anchor ``(ts_1, id_1)`` and the match end
    ``(end_ts, end_id)`` (the last GROUP row).

    Composition, not a new engine: one :func:`match_sequence` per r
    (n−m+1 of them) over the SAME pruned scan, a union, and one
    per-anchor ``max/min(struct(n_reps, …))`` — all joins/aggregates,
    no Python. Batch-only."""
    k = len(preds)
    np_ = len(prefix or ())
    if k < 2:
        raise ValueError("a sequence group needs >= 2 variables")
    if not (1 <= min_r <= max_r):
        raise ValueError("need 1 <= min_r <= max_r")
    if closer is not None and suffix:
        raise ValueError("give either closer= or suffix=, not both")
    suf = list(suffix or ()) if closer is None else [closer]
    if max_r * k > 12 or np_ + max_r * k + len(suf) > 14:
        raise ValueError(
            "group unroll too large (reps * vars > 12, or > 14 total "
            "steps with prefix/suffix) — the r-variant union is the "
            "documented cost of quantified sequence groups"
        )
    for part, what in ((prefix, "prefix"), (suf, "suffix")):
        if part and not all(isinstance(p, Column) for p in part):
            raise ValueError(
                f"{what} steps must be plain Column predicates (loops / "
                "alternations / cross references around a quantified "
                "group are not supported)"
            )
    names = var_names or [f"v{j + 1}" for j in range(k)]
    if len(names) != k:
        raise ValueError("var_names must name every group variable")
    snames = suffix_names or [f"s{i + 1}" for i in range(len(suf))]
    if len(snames) != len(suf):
        raise ValueError("suffix_names must name every suffix step")
    pre = list(prefix or ())
    if reuse_scan:
        # ONE shared bitmask scan for the WHOLE r-variant union — this
        # is where the opt-in pays most: the default plan re-scans the
        # source once per step per variant (n-m+1 variants x (p+rk+s)
        # steps), the shared frame reduces that to a single projection
        # feeding every variant's cascade (all variants test the same
        # predicates, so one mask serves them all).
        from ..functions.buckets import persist_tracked

        allp = [*pre, *preds, *suf]
        flat = [F.coalesce(p.cast("boolean"), F.lit(False)) for p in allp]
        mask = reduce(
            lambda a, b: a.bitwiseOR(b),
            [F.when(p, F.lit(1 << i)).otherwise(F.lit(0)).cast("long")
             for i, p in enumerate(flat)],
        )
        df = persist_tracked(
            df.select(*key_cols, time_col, id_col, mask.alias("_pm"))
            .filter(F.col("_pm") != 0)
        )

        def _bit(i):
            return (
                F.shiftright(F.col("_pm"), i).bitwiseAND(F.lit(1)) == 1
            )

        pre = [_bit(i) for i in range(np_)]
        preds = [_bit(np_ + i) for i in range(k)]
        suf = [_bit(np_ + k + i) for i in range(len(suf))]
    variants = []
    for r in range(min_r, max_r + 1):
        steps_r = [*pre, *(p for _ in range(r) for p in preds), *suf]
        m = match_sequence(
            df, steps_r, key_cols,
            time_col=time_col, id_col=id_col, within=within,
        )
        sel = [
            *key_cols, F.col("ts_1"), F.col("id_1"),
            *[c for i in range(2, np_ + 1)
              for c in (F.col(f"ts_{i}"), F.col(f"id_{i}"))],
            F.lit(r).alias("n_reps"),
            F.col(f"ts_{np_ + r * k}").alias("end_ts"),
            F.col(f"id_{np_ + r * k}").alias("end_id"),
        ]
        for j, nm in enumerate(names):
            firstp = np_ + j + 1
            lastp = firstp + (r - 1) * k
            sel += [
                F.col(f"ts_{firstp}").alias(f"first_{nm}_ts"),
                F.col(f"id_{firstp}").alias(f"first_{nm}_id"),
                F.col(f"ts_{lastp}").alias(f"last_{nm}_ts"),
                F.col(f"id_{lastp}").alias(f"last_{nm}_id"),
            ]
        if closer is not None:
            sel += [
                F.col(f"ts_{np_ + r * k + 1}").alias("closer_ts"),
                F.col(f"id_{np_ + r * k + 1}").alias("closer_id"),
            ]
        else:
            for i, nm in enumerate(snames):
                pos = np_ + r * k + 1 + i
                sel += [
                    F.col(f"ts_{pos}").alias(f"{nm}_ts"),
                    F.col(f"id_{pos}").alias(f"{nm}_id"),
                ]
        variants.append(m.select(*sel))
    u = variants[0]
    for v in variants[1:]:
        u = u.unionByName(v)
    if len(variants) == 1:
        return u
    payload = [
        c for c in u.columns
        if c not in (*key_cols, "ts_1", "id_1", "n_reps")
    ]
    pick = F.max if greedy else F.min
    best = (
        u.groupBy(*key_cols, "ts_1", "id_1")
        .agg(pick(F.struct("n_reps", *payload)).alias("_m"))
    )
    return best.select(
        *key_cols, "ts_1", "id_1",
        F.col("_m.n_reps").alias("n_reps"),
        *[F.col(f"_m.{c}").alias(c) for c in payload],
    )


def match_permutation(
    df: DataFrame,
    preds: list[Column],
    key_cols: list[str],
    time_col: str = "ts",
    id_col: str = "event_id",
    within: str = "30 minutes",
    strict_steps: set[int] | None = None,
    contiguous: bool = False,
    reuse_scan: bool = False,
) -> DataFrame:
    """MATCH_RECOGNIZE's ``PERMUTE(A, B, C)``: the steps may match in ANY
    order — the pattern is the alternation of every ordering, and (per
    the SQL spec) the LEXICOGRAPHICALLY FIRST permutation that matches
    from a given starting row wins, so each starting row yields at most
    one match.

    Output: ``perm_idx`` (0-based index into ``itertools.permutations``
    order — the winning ordering) and ``ts_s<j>``/``id_s<j>`` per
    ORIGINAL step j (the variable's row regardless of its position in
    the winning ordering — MATCH_RECOGNIZE's variable binding), plus the
    key.  ``strict_steps``/``contiguous`` apply by POSITION in each
    tried ordering (``contiguous=True`` is the spec's default adjacency:
    the k rows must be consecutive events of the key).

    Composition, not a new engine: one :func:`match_sequence` per
    ordering (k! of them — ``k`` is capped at 4), unioned with the
    permutation index, then one groupBy per starting row taking
    ``min(struct(perm_idx, ...))``.  The k! expansion is the documented
    cost of PERMUTE in every engine that implements it; the per-ordering
    plans share the same pruned scan and the final dedup groups the
    (small) union of match sets.  Batch-only: PERMUTE is a SQL
    MATCH_RECOGNIZE construct with no Flink-CEP streaming analogue, and
    the cross-permutation dedup needs the full match set per starting
    row.  Loops/optionals/counts/negation are not composable with
    PERMUTE (the spec's PERMUTE arguments are primary pattern variables)
    — use an explicit alternation of :func:`match_sequence` calls for
    exotic combinations."""
    from itertools import permutations

    k = len(preds)
    if not (2 <= k <= 4):
        raise ValueError(
            "PERMUTE supports 2..4 steps (the pattern expands to k! "
            "orderings)"
        )
    if not all(isinstance(p, Column) for p in preds):
        raise ValueError("PERMUTE steps must be plain Column predicates")
    if reuse_scan:
        # one shared bitmask scan for the k! ordering union (the same
        # k predicates are tested in every ordering — see
        # match_repeated_group for the trade-off discussion)
        from ..functions.buckets import persist_tracked

        flat = [F.coalesce(p.cast("boolean"), F.lit(False)) for p in preds]
        mask = reduce(
            lambda a, b: a.bitwiseOR(b),
            [F.when(p, F.lit(1 << i)).otherwise(F.lit(0)).cast("long")
             for i, p in enumerate(flat)],
        )
        keep_all = bool(strict_steps) or contiguous
        base = df.select(*key_cols, time_col, id_col, mask.alias("_pm"))
        if not keep_all:
            # strict/contiguous orderings test EVERY event of the key —
            # only then must non-vocabulary rows stay in the frame
            base = base.filter(F.col("_pm") != 0)
        df = persist_tracked(base)
        preds = [
            F.shiftright(F.col("_pm"), i).bitwiseAND(F.lit(1)) == 1
            for i in range(k)
        ]
    outs = []
    for pi, perm in enumerate(permutations(range(k))):
        m = match_sequence(
            df,
            [preds[j] for j in perm],
            key_cols,
            time_col=time_col,
            id_col=id_col,
            within=within,
            strict_steps=strict_steps,
            contiguous=contiguous,
        )
        sel = [*key_cols, F.lit(pi).cast("int").alias("perm_idx")]
        # position p in this ordering binds ORIGINAL variable perm[p-1]+1
        for p in range(1, k + 1):
            orig = perm[p - 1] + 1
            sel.append(F.col(f"ts_{p}").alias(f"ts_s{orig}"))
            sel.append(F.col(f"id_{p}").alias(f"id_s{orig}"))
        sel.append(F.col("ts_1").alias("_start_ts"))
        sel.append(F.col("id_1").alias("_start_id"))
        outs.append(m.select(*sel))
    u = reduce(lambda a, b: a.unionByName(b), outs)
    data_cols = ["perm_idx"] + [
        f"{c}_s{j}" for j in range(1, k + 1) for c in ("ts", "id")
    ]
    best = (
        u.groupBy(*key_cols, "_start_ts", "_start_id")
        .agg(F.min(F.struct(*[F.col(c) for c in data_cols])).alias("_m"))
    )
    return best.select(
        *key_cols, *[F.col(f"_m.{c}").alias(c) for c in data_cols]
    )


def match_sequence_sessionized(
    df: DataFrame,
    steps: list,
    key_cols: list[str],
    gap: str = "30 minutes",
    time_col: str = "ts",
    id_col: str = "event_id",
    time_bucket: str | None = None,
    **kwargs,
) -> DataFrame:
    """Session-bounded sequence matching — the product-analytics funnel
    variant: instead of a fixed ``within`` horizon from the anchor, the
    pattern must complete inside one SESSION, where sessions split
    whenever a key goes quiet for more than ``gap`` (ANY event keeps the
    session alive, matching how ``session_window`` aggregations sessionize
    the same stream). Events are labeled with a per-key session ordinal
    (lag + gap flag + running sum — the standard sessionization window,
    the same shape the ``session_events`` oracle reconstructs), then
    :func:`match_sequence` runs with the session ordinal folded into the
    key; all its options (``forbid``, ``step_within``, ``optional_steps``,
    ``counts``) pass through. Output carries ``session_id`` per match.

    Skew ceiling: with ``time_bucket=None`` the labeling window partitions
    by ``key`` alone, so one key's full timeline serializes through one
    task (inherent to gap semantics — a session boundary is defined by the
    neighbor event).

    ``time_bucket`` (e.g. ``"1 day"``) is the hot-key mitigation — the
    same two-phase carry as ``asof_join``'s: the lag and the running
    session count partition by ``(key, bucket)``, so per-task work is
    bounded by rows-per-(key, bucket); the cross-bucket seams are a tiny
    second pass over one row per (key, bucket): (a) the previous
    NON-EMPTY bucket's final event time decides whether each bucket's
    first row opens a new session (a session splits at a bucket edge iff
    the gap across the edge exceeds ``gap``), and (b) a running sum of
    per-bucket session-start counts (exclusive) converts the in-bucket
    ordinal into the global one — a two-phase prefix sum. Output equals
    the single-window form exactly (equality-pinned on a hot key by
    tests/test_pipeline_functions.py::test_sessionized_time_bucket_hot_key,
    which also pins the (key, bucket) partitioning in the plan). Null
    ``time_col``/``id_col`` rows are dropped up front in this mode (the
    single-window path defers the identical drop to
    :func:`match_sequence`, so outputs agree). Costs 2 extra small
    shuffles — same crossover guidance as ``asof_join``'s docstring;
    ``operators.joins.suggest_time_bucket`` applies the measured decision
    rule to this operator's input unchanged (same hottest-key shape).
    """
    from pyspark.sql.window import Window

    if "session_id" in df.columns:
        raise ValueError(
            "match_sequence_sessionized labels events with a 'session_id' "
            "column, but the input already has one — rename or drop it "
            "first (silently overwriting user data is not supported)"
        )
    gap_iv = F.expr(f"INTERVAL {gap}")
    if time_bucket is None:
        w = Window.partitionBy(*key_cols).orderBy(F.col(time_col), F.col(id_col))
        prev_ts = F.lag(time_col).over(w)
        new_sess = F.when(
            prev_ts.isNull() | (F.col(time_col) > prev_ts + gap_iv),
            F.lit(1),
        ).otherwise(F.lit(0))
        labeled = df.withColumn(
            "session_id", F.sum(new_sess).over(w).cast("long")
        )
    else:
        import pandas as pd

        bsecs = float(pd.Timedelta(time_bucket).total_seconds())
        if bsecs <= 0:
            raise ValueError(
                f"time_bucket must be a positive duration: {time_bucket!r}"
            )
        df = df.filter(
            F.col(time_col).isNotNull() & F.col(id_col).isNotNull()
        )
        # unix_timestamp accepts TIMESTAMP and TIMESTAMP_NTZ alike; its
        # second truncation is monotonic, which is all bucketing needs
        bcol = F.floor(F.unix_timestamp(F.col(time_col)) / F.lit(bsecs))
        b = df.withColumn("_b", bcol.cast("long"))
        w_kb = Window.partitionBy(*key_cols, "_b").orderBy(
            F.col(time_col), F.col(id_col)
        )
        prev_local = F.lag(time_col).over(w_kb)
        # seams: one row per (key, bucket) — last event time per bucket,
        # carried forward (exclusive) over the key's bucket sequence
        seam = b.groupBy(*key_cols, "_b").agg(
            F.max(time_col).alias("_bucket_last")
        )
        w_carry = (
            Window.partitionBy(*key_cols)
            .orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        seam = seam.withColumn(
            "_carry", F.last("_bucket_last").over(w_carry)
        ).select(*key_cols, "_b", "_carry")
        b = b.join(seam, [*key_cols, "_b"])
        boundary = F.when(prev_local.isNotNull(), prev_local).otherwise(
            F.col("_carry")
        )
        new_sess = F.when(
            boundary.isNull() | (F.col(time_col) > boundary + gap_iv),
            F.lit(1),
        ).otherwise(F.lit(0))
        b = b.withColumn("_ns", new_sess).withColumn(
            "_s_local", F.sum("_ns").over(w_kb)
        )
        # two-phase prefix sum: per-bucket session-start totals, running
        # (exclusive) over buckets -> each bucket's ordinal offset
        totals = b.groupBy(*key_cols, "_b").agg(F.sum("_ns").alias("_nb"))
        offs = totals.withColumn(
            "_off",
            F.coalesce(F.sum("_nb").over(w_carry), F.lit(0)),
        ).select(*key_cols, "_b", "_off")
        labeled = (
            b.join(offs, [*key_cols, "_b"])
            .withColumn(
                "session_id", (F.col("_off") + F.col("_s_local")).cast("long")
            )
            .drop("_b", "_carry", "_ns", "_s_local", "_off")
        )
    # the anchor horizon is the session bound; make the fixed horizon inert
    kwargs.setdefault("within", "3650 days")
    return match_sequence(
        labeled,
        steps,
        [*key_cols, "session_id"],
        time_col=time_col,
        id_col=id_col,
        **kwargs,
    )


# --- compact binary state codec (stream CEP) --------------------------------
# One partial: [nxt, limit, prev, hops, poison, pending, counters]
#   nxt       0-based index of the next unmatched step
#   limit     anchor_ts + within, epoch-nanos
#   prev      ts of the last matched step, epoch-nanos
#   hops      per matched step: [ts, id, branch] or None (skipped optional)
#   poison    earliest forbidden-event ts or None
#   pending   recorded optional-step candidate [ts, id, branch] or None
#   counters  per CountBetween spec:
#             [n, last_ts|None, n_at_last, frozen, chops]
#             chops = the loop's matched [ts, id] hops, kept ONLY for
#             bind=True specs (empty otherwise, so non-binding state stays
#             fixed-width)
# Fixed-width little-endian ints — ~1.6x smaller than the JSON string this
# replaces (8-byte ints vs 19-digit decimal ns timestamps + brackets), with
# no string parse on the hot path (state-store bytes are the scaling
# currency of a continuous CEP job); exact round-trip is pinned by tests,
# as is the size drop. Version history: v2 = pair hops, fixed counters;
# v3 (current) = triple hops (alternation branch byte) + per-counter hop
# lists (binding loops). decode_state reads BOTH — a v2 checkpoint resumes
# under the v3 code (branches read as 0, counter hop lists empty).

_I64_NONE = -(1 << 63)


def _pk_ts(v):
    return _I64_NONE if v is None else v


def _un_ts(v):
    return None if v == _I64_NONE else v


def encode_partials(
    partials: list,
    last_end: list | None = None,
    sess: list | None = None,
    cross_caps: bool = False,
) -> bytes:
    """v4 header carries session-gap mode's cursor ``[last_event_ts_ns,
    session_ordinal]``; v5 (emitted only when a partial carries Kleene
    LOOP slots — an 8th element) appends a per-partial loop-slot section
    in the counter wire shape. Loop-free patterns keep producing v4
    blobs, so running pre-loop checkpoints stay byte-compatible both
    ways. v6 (``cross_caps=True`` — the pattern carries cross-variable
    DEFINE references) fixes the partial layout to ``[*fixed7, loops,
    caps]`` (loops possibly empty) and appends a per-partial CAPS
    section: for each capture step, the payload values (doubles;
    NULL -> NaN) captured when that step bound, or an unbound flag.
    Cross-free patterns never emit v6, so their checkpoints stay
    byte-compatible."""
    import struct as s

    has_loops = cross_caps or any(len(p) > 7 for p in partials)
    ver = 6 if cross_caps else (5 if has_loops else 4)
    le = last_end or (_I64_NONE, _I64_NONE)
    sb = sess or (_I64_NONE, 0)
    out = [
        s.pack("<BqqqI", ver, le[0], le[1], sb[0], sb[1]),
        s.pack("<H", len(partials)),
    ]
    for p in partials:
        nxt, limit, prev, hops, poison, pending, counters = p[:7]
        out.append(s.pack("<Bqqq", nxt, limit, prev, _pk_ts(poison)))
        pb = pending or (_I64_NONE, _I64_NONE, 0)
        out.append(s.pack("<qqB", pb[0], pb[1], pb[2]))
        out.append(s.pack("<H", len(hops)))
        for h in hops:
            hb = h or (_I64_NONE, _I64_NONE, 0)
            out.append(s.pack("<qqB", hb[0], hb[1], hb[2]))
        out.append(s.pack("<B", len(counters)))
        for n, last, nal, frozen, chops in counters:
            out.append(s.pack("<IqIB", n, _pk_ts(last), nal, frozen))
            out.append(s.pack("<H", len(chops)))
            for ct, ci in chops:
                out.append(s.pack("<qq", ct, ci))
        if has_loops:
            loops = p[7] if len(p) > 7 else []
            out.append(s.pack("<B", len(loops)))
            for n, last, nal, frozen, lhops in loops:
                out.append(s.pack("<IqIB", n, _pk_ts(last), nal, frozen))
                out.append(s.pack("<H", len(lhops)))
                for lt, li in lhops:
                    out.append(s.pack("<qq", lt, li))
        if cross_caps:
            caps = p[8]
            out.append(s.pack("<B", len(caps)))
            for slot in caps:
                if slot is None:
                    out.append(s.pack("<B", 0))
                else:
                    out.append(s.pack("<BH", 1, len(slot)))
                    out.append(
                        s.pack(
                            f"<{len(slot)}d",
                            *(
                                float("nan") if v is None else float(v)
                                for v in slot
                            ),
                        )
                    )
    return b"".join(out)


def decode_partials(blob: bytes | None) -> list:
    return decode_state(blob)[0]


def decode_state(blob: bytes | None) -> tuple[list, list | None, list | None]:
    """-> (partials, last_emitted_match_end or None, sess or None) where
    ``sess = [last_event_ts_ns, session_ordinal]``. The end marker backs
    the ``after_match="skip_past_last"`` strategy across micro-batches;
    ``sess`` is session-gap mode's cursor (None outside that mode and for
    pre-v4 checkpoints)."""
    import struct as s

    if not blob:
        return [], None, None
    if blob[0] in (0x5B, 0x7B):  # '[' / '{' — the pre-binary JSON format
        raise ValueError(
            "CEP state blob is in the legacy JSON format (pre-binary-codec "
            "checkpoint). Automatic migration is not supported: restart the "
            "streaming query from a FRESH checkpoint location (matches "
            "already emitted to the sink are preserved by the idempotent "
            "sink's key-based merge)."
        )
    ver, let, lei = s.unpack_from("<Bqq", blob, 0)
    if ver not in (2, 3, 4, 5, 6):
        raise ValueError(f"unknown CEP state version {ver}")
    hop_fmt, hop_w = ("<qqB", 17) if ver >= 3 else ("<qq", 16)

    def _un_hop(vals):
        if vals[0] == _I64_NONE:
            return None
        return list(vals) if ver >= 3 else [*vals, 0]

    last_end = None if let == _I64_NONE else [let, lei]
    last_sess = None
    off = 17
    if ver >= 4:
        ls, so = s.unpack_from("<qI", blob, off)
        off += 12
        last_sess = None if ls == _I64_NONE else [ls, so]
    (np_,) = s.unpack_from("<H", blob, off)
    off += 2
    partials = []
    for _ in range(np_):
        nxt, limit, prev, poison = s.unpack_from("<Bqqq", blob, off)
        off += 25
        pending = _un_hop(s.unpack_from(hop_fmt, blob, off))
        off += hop_w
        (nh,) = s.unpack_from("<H", blob, off)
        off += 2
        hops = []
        for _ in range(nh):
            hops.append(_un_hop(s.unpack_from(hop_fmt, blob, off)))
            off += hop_w
        (nc,) = s.unpack_from("<B", blob, off)
        off += 1
        counters = []
        for _ in range(nc):
            n, last, nal, frozen = s.unpack_from("<IqIB", blob, off)
            off += 17
            chops = []
            if ver >= 3:
                (nch,) = s.unpack_from("<H", blob, off)
                off += 2
                for _ in range(nch):
                    ct, ci = s.unpack_from("<qq", blob, off)
                    off += 16
                    chops.append([ct, ci])
            counters.append([n, _un_ts(last), nal, frozen, chops])
        partial = [nxt, limit, prev, hops, _un_ts(poison), pending, counters]
        if ver >= 5:
            (nl,) = s.unpack_from("<B", blob, off)
            off += 1
            loops = []
            for _ in range(nl):
                n, last, nal, frozen = s.unpack_from("<IqIB", blob, off)
                off += 17
                (nlh,) = s.unpack_from("<H", blob, off)
                off += 2
                lhops = []
                for _ in range(nlh):
                    lt, li = s.unpack_from("<qq", blob, off)
                    off += 16
                    lhops.append([lt, li])
                loops.append([n, _un_ts(last), nal, frozen, lhops])
            partial.append(loops)
        if ver >= 6:
            (ncap,) = s.unpack_from("<B", blob, off)
            off += 1
            caps = []
            for _ in range(ncap):
                (flag,) = s.unpack_from("<B", blob, off)
                off += 1
                if not flag:
                    caps.append(None)
                    continue
                (w,) = s.unpack_from("<H", blob, off)
                off += 2
                caps.append(list(s.unpack_from(f"<{w}d", blob, off)))
                off += 8 * w
            partial.append(caps)
        partials.append(partial)
    return partials, last_end, last_sess


def encode_buffer(events: list) -> bytes:
    """Out-of-order buffer: [(ts_ns, id, vocab_idx)] sorted by (ts, id)."""
    import struct as s

    out = [s.pack("<I", len(events))]
    for t, i, v in events:
        out.append(s.pack("<qqB", t, i, v))
    return b"".join(out)


def decode_buffer(blob: bytes | None) -> list:
    import struct as s

    if not blob:
        return []
    if blob[:4] == _NAV_MAGIC:
        raise ValueError(
            "this checkpoint's buffer carries navigation payload (a nav "
            "DEFINE ran here) — resuming it under a nav-free pattern "
            "needs a fresh checkpoint directory"
        )
    (n,) = s.unpack_from("<I", blob, 0)
    off = 4
    out = []
    for _ in range(n):
        t, i, v = s.unpack_from("<qqB", blob, off)
        off += 17
        out.append((t, i, v))
    return out


# nav-mode buffer blob: magic + version so a legacy blob (raw <I count>
# header) is unambiguous — 0xFFFFFFFF as a count would imply a ~70 GB
# legacy blob, which the length equation rejects
_NAV_MAGIC = b"\xff\xff\xff\xff"


def encode_buffer_nav(events: list, tail: list, m: int) -> bytes:
    """Nav-mode out-of-order buffer: each buffered event carries the ``m``
    navigation column values (doubles; NULL -> NaN, every comparison with
    which is False — exactly SQL null semantics for the lowered
    predicate), plus the processed-history TAIL (the last max-offset
    events' nav values, needed so PREV can cross a micro-batch
    boundary)."""
    import math
    import struct as s

    def _d(x):
        return float("nan") if x is None else float(x)

    out = [_NAV_MAGIC, s.pack("<BB", 1, m), s.pack("<B", len(tail))]
    for vals in tail:
        out.append(s.pack(f"<{m}d", *(_d(v) for v in vals)))
    out.append(s.pack("<I", len(events)))
    for t, i, v, vals in events:
        out.append(s.pack(f"<qqB{m}d", t, i, v, *(_d(x) for x in vals)))
    return b"".join(out)


def decode_buffer_nav(blob: bytes | None, m: int) -> tuple[list, list]:
    import struct as s

    if not blob:
        return [], []
    if blob[:4] != _NAV_MAGIC:
        raise ValueError(
            "this checkpoint's buffer has no navigation payload — a "
            "PREV()-bearing DEFINE cannot resume it; start from a fresh "
            "checkpoint directory"
        )
    ver, m_enc = s.unpack_from("<BB", blob, 4)
    if ver != 1 or m_enc != m:
        raise ValueError(
            f"nav buffer blob v{ver} with {m_enc} nav columns does not "
            f"match the running pattern ({m}) — fresh checkpoint needed"
        )
    (tn,) = s.unpack_from("<B", blob, 6)
    off = 7
    tail = []
    for _ in range(tn):
        tail.append(list(s.unpack_from(f"<{m}d", blob, off)))
        off += 8 * m
    (n,) = s.unpack_from("<I", blob, off)
    off += 4
    out = []
    for _ in range(n):
        vals = s.unpack_from(f"<qqB{m}d", blob, off)
        off += 17 + 8 * m
        out.append((vals[0], vals[1], vals[2], list(vals[3:])))
    return out, tail


def match_sequence_stream(
    stream: DataFrame,
    step_values: list,
    key_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
    id_col: str = "event_id",
    within: str = "30 minutes",
    watermark: str = "10 minutes",
    idle_timeout_ms: int | None = None,
    forbid_value: str | None = None,
    step_within: str | None = None,
    optional_steps: set[int] | None = None,
    counts: list[CountBetween] | None = None,
    ordered: bool = True,
    after_match: str = "skip_to_next",
    session_gap: str | None = None,
    strict_steps: set[int] | None = None,
    contiguous: bool = False,
    nav_conds: dict[int, list] | None = None,
    cross_conds: dict[int, list] | None = None,
    local_conds: dict[int, list] | None = None,
) -> DataFrame:
    """Streaming twin of :func:`match_sequence` via a per-key CEP state
    machine (``applyInPandasWithState``): the set of in-flight partial
    matches is the state; completed sequences are emitted as they close.

    ``nav_conds`` (round 8) enables PREV physical navigation in stream
    DEFINEs — the ticker pattern ``D AS value < PREV(value)`` — in
    BUFFERED mode only: ``{1-based step: [(colA, cmp, colB, n), ...]}``,
    each condition ``event.colA <cmp> (n-th previous event of the
    key).colB`` over the key's full event-time order (every event of the
    key counts as a navigation position, vocabulary or not — the batch
    twin's lag() semantics), conjoined with the step's literal vocabulary
    (use ``"*"`` as the step value for a type-free nav variable).
    Buffered events carry the referenced column values as doubles
    (NULL -> NaN, every comparison False), the last max-offset processed
    values persist in state so PREV crosses micro-batch boundaries, and
    the buffer blob switches to a nav format (legacy checkpoints raise a
    targeted fresh-checkpoint error in either direction). Requires
    ``ordered=False``; not composable with ``session_gap``; NEXT has no
    append-mode expression and stays batch-only.

    ``cross_conds`` (round 8) enables CROSS-VARIABLE DEFINE references —
    MATCH_RECOGNIZE's last-matched-row running semantics (``P AS value >
    V.value``, Flink's IterativeCondition; the stream twin of the batch
    :class:`CrossPred`): ``{1-based step p: [(ev_col, cmp, ref_step_j,
    ref_col), ...]}``, each condition ``candidate.ev_col <cmp> (the
    ref_col value of the event that bound step j)``, conjoined with step
    p's literal vocabulary. The referenced values are CAPTURED on the
    partial when step j binds and travel in CEP state (codec v6 —
    cross-free patterns keep emitting v5/v4, and resuming a pre-v6
    checkpoint under a cross pattern, or vice versa, raises a targeted
    fresh-checkpoint error). Same per-candidate semantics as batch: a
    failing candidate is SKIPPED and the next event tried. Values are
    numeric doubles with SQL NULL semantics (NULL/NaN fails). Works in
    BOTH delivery modes (ordered reads payload transiently from the
    micro-batch; buffered carries it through the out-of-order buffer on
    the shared nav-format value vector). Restrictions mirror the batch
    CrossPred: the conditioned step must be a required non-loop-body
    step (a loop CLOSER is fine), the referenced step a required
    non-loop step bound strictly before it.

    ``local_conds`` (late round 8) are row-local comparisons — the
    ``P AS event_type = 'b' AND value > 10`` form: ``{1-based step p:
    [(col, cmp, rhs), ...]}`` where ``rhs`` is a numeric CONSTANT or
    (same-row column-to-column, ``clicks > views``) another COLUMN NAME
    given as a string; conjoined with the step's vocabulary and
    evaluated per candidate from the event's own payload (numeric
    doubles, SQL NULL semantics). Nothing is captured, so CEP state and
    checkpoints are untouched; any step may carry them — anchor,
    optional, loop BODY (each hop re-tested) and closer alike. Works in
    both delivery modes like ``cross_conds``.

    Delivery ordering — two modes:

    - ``ordered=True`` (default): events are processed in (ts, id) order
      WITHIN each micro-batch, but the operator assumes in-order per-key
      delivery ACROSS micro-batches. That assumption is STRONGER than what
      a watermark guarantees: a late event that is within the declared
      lateness (which the watermark admits) arrives after later-ts events
      have already advanced or expired partials, and matches the batch
      operator finds can be silently missed. Use this mode when the source
      is per-key ordered (e.g. a Kafka partition per key, or replayed
      ts-ordered files); it emits with no watermark delay.
    - ``ordered=False``: true watermark semantics. Incoming events are
      buffered in state and only processed — in (ts, id) order — once the
      watermark has passed them, so ANY disorder within the declared
      lateness yields exactly the batch operator's matches (pinned by
      tests/test_streaming.py::test_match_sequence_stream_out_of_order).
      Emission waits for the watermark (like any append-mode event-time
      operator) and the query uses ``EventTimeTimeout`` no-data callbacks
      to drain the buffer; ``idle_timeout_ms`` is not available in this
      mode (expired partials and drained keys are evicted by watermark
      instead, so state stays bounded without it).

    The stream variant matches ``type_col`` against literal ``step_values``
    (the common CEP case) rather than arbitrary predicates — state must be
    serializable, predicates are not. A step value may be a TUPLE of
    literals — alternation ``A (B|C) D``, mirroring the batch matcher's
    predicate-list steps: the step matches any value in the tuple and the
    output adds ``branch_k`` (the 0-based tuple position that matched).
    A step value may also be a :class:`LoopStep` (with ``value=`` set) —
    the Kleene ``A B+ C`` pattern step, mirroring the batch steps list:
    loop hops accumulate in per-partial state (v5 codec section; loop-free
    patterns keep emitting v4 blobs) and the same greedy closer-priority /
    same-tick-backout semantics apply, emitting ``n_<name>`` plus the
    first/last (and ``bind="all"`` id-array) measures. A FINAL-position
    LoopStep (``A B+``, no closer) emits when the WATERMARK passes the
    anchor horizon — or, with ``session_gap``, when the session closes
    (boundary event or watermark past the gap deadline) — and therefore
    requires ``ordered=False``; ``forbid_value`` and any non-default
    ``after_match`` are rejected with it (no final matched row to negate
    or skip past). ``after_match`` mirrors the batch twin's full AFTER
    MATCH SKIP family — ``skip_to_next`` (default), ``skip_past_last``,
    and the positional ``skip_to_first:<pos>`` / ``skip_to_last:<pos>``
    (inclusive resume at the bound row; same target constraints) — with
    the resume point carried in the state header across micro-batches.
    For the same reason
    ``optional_steps`` (same no-lookahead greedy rule as batch: the
    optional is taken iff its earliest candidate precedes the closer's)
    and ``counts`` (:class:`CountBetween` with ``value=`` set; ``bind=True``
    additionally emits the loop's first/last hop columns, recorded in the
    v3 state codec) mirror the batch parameters by literal value. State is a compact fixed-width
    binary column (see ``encode_partials``); partials expire as soon as
    processing passes their anchor window, so state per key is bounded by
    anchors-per-window (+ the not-yet-finalized buffer in
    ``ordered=False`` mode, bounded by events within the watermark
    lateness).

    ``session_gap`` is the streaming twin of
    :func:`match_sequence_sessionized`: instead of (or on top of) the
    fixed ``within`` horizon, a pattern must complete inside one SESSION —
    sessions split when the key goes quiet for more than the gap, and ANY
    event (any ``type_col`` value, not just pattern vocabulary) keeps the
    session alive. Requires ``ordered=False``: only the buffered mode sees
    the key's true event-time order, which gap semantics need (a late
    keepalive inside the watermark can BRIDGE a would-be split — pinned).
    The output gains a ``session_id`` column (the per-key session ordinal,
    matching the batch labeler). Pass ``within="3650 days"`` to reproduce
    the batch twin's inert default horizon. State additionally holds the
    session keepalive cursor + ordinal (v4 codec header); in-flight
    partials die at every session boundary and when the WATERMARK passes
    the open session's gap deadline, so state per key is bounded by
    anchors-per-session + the watermark buffer. Cost relative to plain
    buffered mode: every event of the key (not just vocabulary types)
    transits the buffer — the price of "any event keeps the session
    alive".

    Scale note: the transport is Arrow-batched, but the state machine
    itself advances PER EVENT in Python (inherent to
    ``applyInPandasWithState``'s model) — fine for the per-key event rates
    a watermarked stream implies, but a single key sustaining very high
    rates on a continuous job will bottleneck on that Python loop; the
    batch twin is pure join algebra, so bursty backfills should replay
    through :func:`match_sequence` instead. A JVM
    ``transformWithState`` port is the long-term fix.

    ``forbid_value`` is the negation twin of batch ``forbid``: an event of
    that type POISONS every in-flight partial whose anchor precedes it
    (recorded as the earliest poison time); at completion the match is
    emitted only if no poison falls strictly inside (anchor, final step) —
    the same open-interval boundary semantics as the batch anti join,
    including the same-timestamp edge (a poison at exactly the final
    step's time does not kill).

    ``strict_steps`` / ``contiguous`` mirror the batch twin: a strict
    step must be matched by the key's very NEXT event after the previous
    matched step — any intervening event (ANY ``type_col`` value,
    vocabulary or not) kills the partial.  Because "any event" includes
    non-vocabulary types, buffered (``ordered=False``) mode transits ALL
    events through the buffer when strict steps are present — the same
    discipline (and per-event cost) as ``session_gap``; ordered mode
    already sees every event.  Same constraints as batch: the anchor, a
    loop/optional, or the step right after one cannot be strict."""
    import pandas as pd

    if any(isinstance(s, CrossPred) for s in step_values):
        raise ValueError(
            "CrossPred objects carry JVM Column predicates and are "
            "batch-only — on the stream path express the cross-variable "
            "comparison with cross_conds= ({step: [(ev_col, cmp, ref_step, "
            "ref_col), ...]}) over numeric payload columns"
        )
    strict = frozenset(strict_steps or ()) | (
        frozenset(range(2, len(step_values) + 1)) if contiguous else frozenset()
    )
    if step_values and isinstance(step_values[0], LoopStep):
        # ANCHOR-position loop — same desugar as the batch twin: the
        # first hop anchors a plain step, the rest ride the middle/final
        # loop machinery, and the projection folds the anchor back into
        # the measures.  State codec and checkpoints are untouched (the
        # inner call sees an ordinary loop-bearing pattern).
        sp0 = step_values[0]
        if sp0.value is None:
            raise ValueError(
                "stream LoopStep needs value= (literal type or tuple)"
            )
        if len(step_values) > 1 and isinstance(step_values[1], LoopStep):
            raise ValueError("two consecutive steps cannot both be loops")
        if cross_conds:
            # the desugar would silently remap a reference to step 1 onto
            # the extracted first rep — but the user's step 1 is the LOOP,
            # which binds no single row (same rule as the batch CrossPred)
            if 1 in cross_conds or any(
                j == 1 for cs in cross_conds.values() for _a, _c, j, _b in cs
            ):
                raise ValueError(
                    "cross_conds cannot condition or reference step 1 when "
                    "it is a Kleene loop — a loop binds no single row"
                )
        inner = _desugar_anchor_loop(sp0, len(step_values) - 1)
        out = match_sequence_stream(
            stream,
            [sp0.value, inner, *step_values[1:]],
            key_col=key_col,
            type_col=type_col,
            time_col=time_col,
            id_col=id_col,
            within=within,
            watermark=watermark,
            idle_timeout_ms=idle_timeout_ms,
            forbid_value=forbid_value,
            step_within=step_within,
            optional_steps=(
                {i + 1 if i >= 2 else i for i in optional_steps}
                if optional_steps
                else None
            ),
            counts=_shift_counts_for_anchor_loop(counts),
            ordered=ordered,
            after_match=_remap_skip_for_anchor_loop(
                after_match, len(step_values)
            ),
            session_gap=session_gap,
            strict_steps={s + 1 if s >= 2 else s for s in strict} or None,
            nav_conds=(
                {(p + 1 if p >= 2 else p): cs
                 for p, cs in nav_conds.items()}
                if nav_conds
                else None
            ),
            cross_conds=(
                {(p + 1 if p >= 2 else p): [
                    (ca, cmp_, (j + 1 if j >= 2 else j), cb)
                    for ca, cmp_, j, cb in cs
                ] for p, cs in cross_conds.items()}
                if cross_conds
                else None
            ),
            local_conds=(
                # a condition on the anchor loop (p == 1) applies to the
                # extracted first rep AND the residual loop body — every
                # hop of the user's loop is re-tested either way
                {q: cs
                 for p, cs in local_conds.items()
                 for q in ((1, 2) if p == 1 else (p + 1,))}
                if local_conds
                else None
            ),
        )
        return _anchor_loop_project(out, sp0.name, sp0.bind)
    k = len(step_values)
    if k < 2:
        raise ValueError("match_sequence_stream needs at least 2 steps")
    skip_mode, skip_target = _parse_after_match(after_match, k)
    # normalize alternation: every step is a tuple of acceptable literals;
    # LoopStep entries mirror the batch steps list (value= instead of
    # pred=, like step_values vs steps)
    loop0: dict = {}  # 0-based index -> (values, min_n, max_n, bind, name)
    stepsets = []
    for j, v in enumerate(step_values):
        if isinstance(v, LoopStep):
            if v.value is None:
                raise ValueError(
                    "stream LoopStep needs value= (literal type or tuple)"
                )
            vals = (v.value,) if isinstance(v.value, str) else tuple(v.value)
            if v.max_n is not None and v.max_n < v.min_n:
                raise ValueError(
                    f"step {j + 1}: LoopStep max_n ({v.max_n}) < min_n "
                    f"({v.min_n})"
                )
            loop0[j] = (vals, v.min_n, v.max_n, v.bind, v.name,
                        v.greedy)
            stepsets.append(vals)
        else:
            stepsets.append((v,) if isinstance(v, str) else tuple(v))
    if any(not ss for ss in stepsets):
        raise ValueError("an alternation step needs >= 1 value")
    alt = [len(ss) > 1 and j not in loop0 for j, ss in enumerate(stepsets)]
    loop_pos = {j + 1 for j in loop0}
    opt = set(optional_steps or ())
    if loop_pos:
        if step_within is not None:
            raise ValueError("LoopStep cannot be combined with step_within")
        # position 1 cannot be a loop here: the anchor-loop desugar above
        # already rewrote it to a plain anchor + inner loop
        if k in loop_pos:
            # FINAL-position loop: emission is DEADLINE-driven (the anchor
            # horizon or the session bound), which only the watermark
            # machinery of buffered mode can observe — ordered mode has no
            # event-time finality signal, so a tail partial would hang
            _flv, _flmn, _flmx, _flb, _fln, _flg = loop0[k - 1]
            if _flmn < 1:
                raise ValueError(
                    "a FINAL LoopStep needs min_n >= 1 (min_n=0 would emit "
                    "a vacuous match for every completed prefix)"
                )
            if _flg:
                raise ValueError(
                    "greedy has no effect on a FINAL LoopStep (there is no "
                    "closer to munch past) — drop greedy=True"
                )
            if ordered:
                raise ValueError(
                    "a FINAL LoopStep requires ordered=False: its emission "
                    "is deadline-driven (anchor horizon / session bound), "
                    "which needs the buffered mode's watermark finality"
                )
            if forbid_value is not None:
                raise ValueError(
                    "forbid_value cannot be combined with a FINAL LoopStep "
                    "(the negation interval's right edge is the final "
                    "matched step, which a final loop does not emit)"
                )
            if after_match != "skip_to_next":
                raise ValueError(
                    "a non-default after_match cannot be combined with a "
                    "FINAL LoopStep (the skip point references matched "
                    "rows a deadline-closed loop does not pin down)"
                )
        if any(p + 1 in loop_pos for p in loop_pos):
            raise ValueError("two consecutive steps cannot both be loops")
        if loop_pos & opt or any(p + 1 in opt for p in loop_pos):
            raise ValueError(
                "a loop step cannot be optional and its closer (the step "
                "after it) must be a required non-loop step"
            )
        if any(j + 1 in loop_pos for j in opt):
            raise ValueError("an optional step's closer cannot be a loop")
    if opt:
        if step_within is not None:
            raise ValueError("optional_steps cannot be combined with step_within")
        if 1 in opt or k in opt:
            raise ValueError("the anchor and the final step cannot be optional")
        if any(j + 1 in opt for j in opt):
            raise ValueError("two consecutive steps cannot both be optional")
        for j in opt:
            if set(stepsets[j - 1]) & set(stepsets[j]):
                raise ValueError(
                    "an optional step's value(s) must be disjoint from its "
                    "closer's"
                )
    for s in strict:
        if not (2 <= s <= k):
            raise ValueError(
                f"strict step {s} out of range (the anchor cannot be "
                "strict — nothing precedes it)"
            )
        if s in loop_pos or s in opt:
            raise ValueError(
                f"strict step {s}: a loop or optional step cannot be "
                "strict (its match is not a single next event)"
            )
        if (s - 1) in loop_pos or (s - 1) in opt:
            raise ValueError(
                f"strict step {s}: the step after a loop or an optional "
                "cannot be strict (the previous matched row is not a "
                "single fixed event)"
            )
    _check_skip_target(skip_mode, skip_target, step_values, loop_pos, opt, k)
    _NAV_CMP = {
        "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
        "=": lambda a, b: a == b, "<>": lambda a, b: a != b,
    }
    nav = {int(p): [tuple(c) for c in cs]
           for p, cs in (nav_conds or {}).items()}
    if nav:
        if ordered:
            raise ValueError(
                "nav_conds (PREV navigation) requires ordered=False — "
                "physical navigation needs the key's true event-time "
                "order, which only the buffered mode reconstructs"
            )
        if session_gap is not None:
            raise ValueError(
                "nav_conds cannot be combined with session_gap (the "
                "keepalive fast path bypasses per-event classification)"
            )
        for p, cs in nav.items():
            if not (1 <= p <= k):
                raise ValueError(f"nav_conds step {p} out of range")
            for ca, cmp_, cb, n in cs:
                if cmp_ not in _NAV_CMP:
                    raise ValueError(
                        f"nav comparator {cmp_!r} unsupported (use "
                        f"{sorted(_NAV_CMP)})"
                    )
                if not (1 <= int(n) <= 4):
                    raise ValueError(
                        "PREV offset must be 1..4 on the stream path "
                        "(bounded history in state)"
                    )
    nav_cols: list[str] = sorted(
        {c for cs in nav.values() for cond in cs for c in (cond[0], cond[2])}
    )
    missing_nc = [c for c in nav_cols if c not in stream.columns]
    if missing_nc:
        raise ValueError(
            f"nav column(s) {missing_nc} not in the stream schema"
        )
    nav_ci = {c: j for j, c in enumerate(nav_cols)}
    nav_maxoff = max(
        (int(cond[3]) for cs in nav.values() for cond in cs), default=0
    )
    nav_pos = sorted(nav)  # 1-based steps carrying nav conditions
    nav_slot0 = {p - 1: s for s, p in enumerate(nav_pos)}
    # cross-variable DEFINE references (round 8): step p's candidate must
    # satisfy event.<ev_col> <cmp> <value of ref_col captured when step j
    # bound> — MATCH_RECOGNIZE's last-matched-row running semantics
    # (`P AS value > V.value`), the stream twin of the batch CrossPred.
    # Captured values live in the partial (codec v6); comparisons are
    # numeric-double with SQL NULL semantics (NaN fails), like nav.
    cross = {int(p): [tuple(c) for c in cs]
             for p, cs in (cross_conds or {}).items()}
    for p_, cs in cross.items():
        if not (2 <= p_ <= k):
            raise ValueError(
                f"cross_conds step {p_} out of range (the anchor cannot "
                "reference a prior variable — nothing precedes it)"
            )
        if p_ in opt or (p_ - 1) in opt:
            raise ValueError(
                f"cross_conds step {p_} is optional or the closer of an "
                "optional — the no-lookahead pending decision has no "
                "per-candidate cross evaluation (same rule as the batch "
                "CrossPred)"
            )
        if (p_ - 1) in loop0:
            raise ValueError(
                f"cross_conds step {p_} is a loop body — iterative "
                "self-conditions are not supported (same restriction as "
                "the batch CrossPred); a loop CLOSER may carry one"
            )
        for ca, cmp_, j, cb in cs:
            if cmp_ not in _NAV_CMP:
                raise ValueError(
                    f"cross comparator {cmp_!r} unsupported (use "
                    f"{sorted(_NAV_CMP)})"
                )
            j = int(j)
            if not (1 <= j < p_):
                raise ValueError(
                    f"cross_conds step {p_}: referenced step {j} must be "
                    "bound strictly before it"
                )
            if j in opt or (j - 1) in opt or (j - 1) in loop0:
                raise ValueError(
                    f"cross_conds step {p_}: referenced step {j} must be "
                    "a required non-loop step not adjacent to an optional "
                    "(an optional may be unbound; a loop binds no single "
                    "row — same rules as the batch CrossPred)"
                )
    cap_cols: dict[int, list] = {}
    for cs in cross.values():
        for _ca, _cmp, j, cb in cs:
            cap_cols.setdefault(int(j), set()).add(cb)
    cap_cols = {j: sorted(v) for j, v in cap_cols.items()}
    cap_steps = sorted(cap_cols)  # 1-based steps whose payload is captured
    cap_slot = {j: s for s, j in enumerate(cap_steps)}
    capcol_idx = {
        (j, c): i for j in cap_steps for i, c in enumerate(cap_cols[j])
    }
    cross_cols = sorted(
        {cond[0] for cs in cross.values() for cond in cs}
        | {c for v in cap_cols.values() for c in v}
    )
    missing_xc = [c for c in cross_cols if c not in stream.columns]
    if missing_xc:
        raise ValueError(
            f"cross column(s) {missing_xc} not in the stream schema"
        )
    # row-local constant comparisons (late round 8): step p's candidate
    # must satisfy event.<col> <cmp> <constant> — nothing captured, so
    # CEP state is untouched; evaluated inside _okv wherever a
    # candidate is tested (anchor, plain, optional, loop body, closer)
    loc: dict[int, list] = {}
    for p_, cs in (local_conds or {}).items():
        p_ = int(p_)
        if not (1 <= p_ <= k):
            raise ValueError(f"local_conds step {p_} out of range")
        ent = []
        for col, cmp_, cst in cs:
            if cmp_ not in _NAV_CMP:
                raise ValueError(
                    f"local comparator {cmp_!r} unsupported (use "
                    f"{sorted(_NAV_CMP)})"
                )
            # rhs: numeric constant, or (col-to-col) a column-name string
            ent.append((col, cmp_,
                        cst if isinstance(cst, str) else float(cst)))
        loc[p_] = ent
    loc_cols = sorted(
        {c[0] for cs in loc.values() for c in cs}
        | {c[2] for cs in loc.values() for c in cs if isinstance(c[2], str)}
    )
    missing_lc = [c for c in loc_cols if c not in stream.columns]
    if missing_lc:
        raise ValueError(
            f"local column(s) {missing_lc} not in the stream schema"
        )
    # shared payload transport: buffered events carry ONE value vector
    # over the union of nav, cross and local columns
    aux_cols = sorted(set(nav_cols) | set(cross_cols) | set(loc_cols))
    aux = bool(aux_cols)
    aux_ci = {c: j for j, c in enumerate(aux_cols)}
    if aux:
        from pyspark.sql.types import NumericType

        non_num = [
            c for c in aux_cols
            if not isinstance(stream.schema[c].dataType, NumericType)
        ]
        if non_num:
            raise ValueError(
                f"nav/cross column(s) {non_num} are not numeric — the "
                "stream payload transport carries doubles only (compare "
                "event times via within=/step_within= instead of a ts "
                "cross reference; the batch path supports ts refs "
                "directly)"
            )
    for j, ss in enumerate(stepsets):
        if "*" in ss:
            if len(ss) > 1:
                raise ValueError(
                    f"step {j + 1}: the '*' wildcard value cannot share an "
                    "alternation with literals"
                )
            if (
                (j + 1) not in nav and (j + 1) not in cross
                and (j + 1) not in loc
            ):
                raise ValueError(
                    f"step {j + 1}: the '*' wildcard value needs a nav, "
                    "cross or local condition (a type-free step would "
                    "match every event)"
                )
    specs = list(counts or ())
    for spec in specs:
        if spec.value is None:
            raise ValueError("stream CountBetween needs value= (literal type)")
        if not (1 <= spec.lo_step < spec.hi_step <= k):
            raise ValueError(f"CountBetween steps out of range: {spec}")
        if spec.lo_step in opt or spec.hi_step in opt:
            raise ValueError("CountBetween must anchor on non-optional steps")
        if spec.lo_step in loop_pos or spec.hi_step in loop_pos:
            raise ValueError(
                "CountBetween must anchor on matched non-loop steps (loop "
                "steps emit no ts_k)"
            )
    if not ordered and idle_timeout_ms is not None:
        raise ValueError(
            "idle_timeout_ms requires ordered=True (buffered mode evicts by "
            "watermark via EventTimeTimeout)"
        )
    if session_gap is not None and ordered:
        raise ValueError(
            "session_gap requires ordered=False: gap semantics need the "
            "key's true event-time order (a late keepalive can bridge a "
            "would-be session split), which only the buffered mode sees"
        )
    opt0 = {j - 1 for j in opt}  # 0-based indices of optional steps
    # output schema tracked STRUCTURALLY — (name, ddl type, pandas
    # conversion) recorded where each column is conceived, never inferred
    # back from name suffixes (a CountBetween named "err_ts" must yield a
    # LONG n_err_ts, not a timestamp). Conversions: ts -> datetime,
    # id/branch -> nullable ints (skipped optionals emit nulls), counts /
    # session ordinal / key -> plain non-null.
    out_typed: list[tuple[str, str, str | None]] = [(key_col, "long", None)]
    if session_gap is not None:
        out_typed.append(("session_id", "long", None))
    for i in range(1, k + 1):
        if (i - 1) in loop0:
            _lv, _lmn, _lmx, lbind, lname, _lg = loop0[i - 1]
            out_typed.append((f"n_{lname}", "long", None))
            if lbind:
                out_typed.append((f"first_{lname}_ts", "timestamp", "datetime"))
                out_typed.append((f"first_{lname}_id", "long", "Int64"))
                out_typed.append((f"last_{lname}_ts", "timestamp", "datetime"))
                out_typed.append((f"last_{lname}_id", "long", "Int64"))
                if lbind == "all":
                    out_typed.append((f"{lname}_ids", "array<long>", None))
            continue
        out_typed.append((f"ts_{i}", "timestamp", "datetime"))
        out_typed.append((f"id_{i}", "long", "Int64"))
        if alt[i - 1]:
            out_typed.append((f"branch_{i}", "int", "Int32"))
    for spec in specs:
        out_typed.append((f"n_{spec.name}", "long", None))
        if spec.bind:
            out_typed.append((f"first_{spec.name}_ts", "timestamp", "datetime"))
            out_typed.append((f"first_{spec.name}_id", "long", "Int64"))
            out_typed.append((f"last_{spec.name}_ts", "timestamp", "datetime"))
            out_typed.append((f"last_{spec.name}_id", "long", "Int64"))
            if spec.bind == "all":
                out_typed.append((f"{spec.name}_ids", "array<long>", None))
    out_names = [n for n, _, _ in out_typed]
    if len(set(out_names)) != len(out_names):
        dupes = sorted({n for n in out_names if out_names.count(n) > 1})
        raise ValueError(
            f"duplicate output column name(s) {dupes}: CountBetween names "
            "must be distinct and must not collide with the "
            "ts_k/id_k/branch_k/session_id pattern columns or the key"
        )
    out_ddl = ", ".join(f"{n} {t}" for n, t, _ in out_typed)
    pd_conv = {n: cv for n, _, cv in out_typed}
    within_ns = pd.Timedelta(within).value
    step_ns = pd.Timedelta(step_within).value if step_within else None
    # vocabulary for the out-of-order buffer: only events whose type can
    # touch the machine are buffered at all
    vocab = list(dict.fromkeys(
        [v for ss in stepsets for v in ss if v != "*"]
        + ([forbid_value] if forbid_value is not None else [])
        + [spec.value for spec in specs]
    ))
    vidx = {v: j for j, v in enumerate(vocab)}
    # a '*' step matches NON-vocabulary events too (validated above to
    # carry a nav/cross/local condition) — the buffered admission filter
    # must then keep every event, like the nav/session/strict modes
    has_wild = any("*" in ss for ss in stepsets)
    KEEPALIVE = 255  # buffer sentinel: non-vocabulary event (session/strict)
    gap_ns = pd.Timedelta(session_gap).value if session_gap else None
    if (gap_ns is not None or strict or nav or has_wild) and len(vocab) >= KEEPALIVE:
        raise ValueError(
            "session_gap / strict_steps / nav modes support at most 254 "
            "vocabulary values"
        )

    def _okv(vals, j0, typ, flags, cvals=()):
        """Step eligibility: literal vocabulary AND the step's nav
        conditions (precomputed per event at drain time) AND its
        row-local constant comparisons (``local_conds`` — evaluated on
        the event's aux value vector; NaN/NULL fails, SQL semantics)."""
        if "*" not in vals and (typ is None or typ not in vals):
            return False
        if j0 in nav_slot0 and not (bool(flags) and flags[nav_slot0[j0]]):
            return False
        ls = loc.get(j0 + 1)
        if ls:
            for col, cmp_, cst in ls:
                a = cvals[aux_ci[col]] if cvals else float("nan")
                b = (cvals[aux_ci[cst]] if cvals else float("nan")) \
                    if isinstance(cst, str) else cst
                if not (a == a and b == b and _NAV_CMP[cmp_](a, b)):
                    return False
        return True

    def _bidx(j0, typ):
        ss = stepsets[j0]
        return ss.index(typ) if typ is not None and typ in ss else 0

    def _okx(j0, tail, cvals):
        """Cross-variable eligibility of step ``j0+1``: the candidate's
        payload vs the partial's captured prior-step values (``tail[-1]``
        is the caps slot — guaranteed last when cross is active). NaN on
        either side fails, SQL NULL semantics."""
        cs = cross.get(j0 + 1)
        if not cs:
            return True
        caps = tail[-1]
        for ca, cmp_, j, cb in cs:
            ref = caps[cap_slot[j]]
            if ref is None:
                return False
            a = cvals[aux_ci[ca]]
            b = ref[capcol_idx[(j, cb)]]
            if not (a == a and b == b and _NAV_CMP[cmp_](a, b)):
                return False
        return True
    # plain-tuple copies for the executor closures: CountBetween.pred is
    # a JVM Column handle and must not be captured by cloudpickle
    sp = [
        (s_.value, s_.lo_step, s_.hi_step, s_.min_n, s_.max_n, s_.bind)
        for s_ in specs
    ]

    loop_slot = {j: pos for pos, j in enumerate(sorted(loop0))}

    def _fresh_loops():
        return [[0, None, 0, 0, []] for _ in loop0]

    def _pad_loops(partials):
        """Normalize decoded partials to carry loop slots (a pre-v5
        checkpoint of a loop-free pattern resumed under a loop-bearing one
        cannot exist, but padding keeps the invariant trivially true)."""
        if not loop0:
            return partials
        return [
            p if len(p) > 7 and len(p[7]) == len(loop0)
            else [*p[:7], _fresh_loops(), *p[8:]]
            for p in partials
        ]

    def _chk_caps(partials):
        """Cross-variable capture slots are config-bound state: a
        checkpoint written without them (pre-v6 / cross-free pattern)
        cannot resume under a cross_conds-bearing pattern (mid-flight
        partials would carry no captured values), and vice versa —
        targeted fresh-checkpoint errors either way, like the nav
        buffer's magic fence."""
        if not partials:
            return partials
        has = len(partials[0]) >= 9
        if bool(cross) != has:
            raise ValueError(
                "this checkpoint's CEP state "
                + ("has no cross-variable capture slots — a cross_conds-"
                   "bearing pattern cannot resume it"
                   if cross else
                   "carries cross-variable capture slots (a cross_conds "
                   "pattern ran here) — a cross-free pattern cannot "
                   "resume it")
                + "; start from a fresh checkpoint directory"
            )
        if cross and len(partials[0][8]) != len(cap_steps):
            raise ValueError(
                "this checkpoint's cross-variable capture slots do not "
                "match the running pattern's capture steps — fresh "
                "checkpoint needed"
            )
        return partials

    def _complete(p, t, rows, key_val, hops, sess_ord=None):
        """Emit if the poison/count constraints hold (called at final hop);
        returns whether a row was emitted."""
        _, _, _, _, poison, _, counters = p[:7]
        if poison is not None and poison < t:
            return False
        vals = []
        for (n, _last, _nal, _frozen, chops), (_v, _lo, _hi, mn, mx, bind) in zip(
            counters, sp
        ):
            if n < mn or (mx is not None and n > mx):
                return False
            vals.append(n)
            if bind:
                first = chops[0] if chops else (None, None)
                last_h = chops[-1] if chops else (None, None)
                vals.extend((first[0], first[1], last_h[0], last_h[1]))
                if bind == "all":
                    vals.append([h[1] for h in chops])
        seq_vals = []
        for j, h in enumerate(hops):
            if j in loop0:
                _lv, _lmn, _lmx, lbind, _lnm, _lg = loop0[j]
                ln_, _, _, _, lh = p[7][loop_slot[j]]
                seq_vals.append(ln_)
                if lbind:
                    fh = lh[0] if lh else (None, None)
                    lh_ = lh[-1] if lh else (None, None)
                    seq_vals.extend((fh[0], fh[1], lh_[0], lh_[1]))
                    if lbind == "all":
                        seq_vals.append([h2[1] for h2 in lh])
                continue
            trip = h if h is not None else (None, None, None)
            seq_vals.extend(trip[:3] if alt[j] else trip[:2])
        head = (key_val,) if sess_ord is None else (key_val, sess_ord)
        rows.append((*head, *seq_vals, *vals))
        return True

    final_loop = (k - 1) in loop0
    # AFTER MATCH SKIP bookkeeping: skip_incl marks the inclusive modes
    # (skip_to_first/last — the skip row itself may anchor the next match)
    # vs skip_past_last's strictly-after resume point
    skip_incl = skip_mode in ("first", "last")

    def _skip_point(p, hops):
        """The (ts, id) resume point of a just-completed match under the
        active skip strategy (never called for skip_to_next)."""
        if skip_mode == "past_last":
            return list(hops[-1][:2])
        if (skip_target - 1) in loop0:
            fin = p[7][loop_slot[skip_target - 1]][4]
            return list(fin[0] if skip_mode == "first" else fin[-1])
        return list(hops[skip_target - 1][:2])

    def _finalize_loop(p, rows, key_val, sess_ord=None):
        """Deadline/session-close emission for a FINAL-position loop: the
        partial sits at the loop (every earlier step matched); emit iff at
        least min_n hops accrued, measures capped at max_n. All hops are
        final by construction — hops only accumulate while the partial is
        alive (t <= limit) and strictly before any session boundary, and
        finalization fires exactly when the deadline passes, so no
        same-tick backout is needed."""
        if p[0] != k - 1:
            return  # pattern prefix incomplete — the partial just dies
        _lv, lmn, lmx, lbind, _lnm, _lg = loop0[k - 1]
        sl = loop_slot[k - 1]
        n_, _last, _nal, _fz, lh_ = p[7][sl]
        if n_ < lmn:
            return
        ncap_ = n_ if lmx is None else min(n_, lmx)
        loops = list(p[7])
        loops[sl] = [ncap_, None, 0, 1, lh_[:ncap_] if lbind else []]
        q = [k, p[1], p[2], p[3] + [None], p[4], p[5], p[6], loops]
        _complete(q, p[1] + 1, rows, key_val, q[3], sess_ord)

    def _process(partials, events, rows, key_val, last_end=None, sess=None):
        """Advance the machine over (t, i, typ) tuples in (ts, id) order;
        returns (partials, last_end, sess) where last_end is the final
        (ts, id) of the last EMITTED match (skip_past_last bookkeeping)
        and sess is session-gap mode's [last_event_ts, ordinal] cursor."""
        for ev in events:
            t, i, typ = ev[0], ev[1], ev[2]
            flags = ev[3] if len(ev) > 3 else ()
            cvals = ev[4] if len(ev) > 4 else ()
            if gap_ns is not None:
                # gap sessionization: ANY event keeps the session alive;
                # a gap > session_gap kills every in-flight partial (the
                # pattern cannot complete across a session boundary)
                if sess is None:
                    sess = [t, 1]
                elif t > sess[0] + gap_ns:
                    if final_loop:
                        # the session bound closes a final loop: emit its
                        # survivors under the CLOSING session's ordinal
                        for p in partials:
                            _finalize_loop(p, rows, key_val, sess[1])
                    partials = []
                    sess = [t, sess[1] + 1]
                else:
                    sess[0] = t
                if typ is None:
                    if strict:
                        # a keepalive is still an EVENT: it kills any
                        # partial waiting at a strict step
                        partials = [
                            p for p in partials
                            if not (p[0] + 1 in strict and t > p[2])
                        ]
                    continue  # keepalive: sessionization (+ strict kill) only
            keep = []
            end_moved = False
            for p in partials:
                nxt, limit, prev_t, hops, poison, pending, counters = p[:7]
                tail = list(p[7:])  # loop slots (present iff loop0)
                if t > limit:
                    # processing is in event-time order: the partial is
                    # final — a deadline-closed FINAL loop emits here
                    if final_loop:
                        _finalize_loop(
                            p, rows, key_val,
                            sess[1] if gap_ns is not None else None,
                        )
                    continue
                advanced = None
                if nxt in opt0:
                    closer = nxt + 1
                    if (_okv(stepsets[nxt], nxt, typ, flags, cvals)
                            and t > prev_t and pending is None):
                        pending = [t, i, _bidx(nxt, typ)]
                        p = [nxt, limit, prev_t, hops, poison, pending,
                             counters, *tail]
                    elif (_okv(stepsets[closer], closer, typ, flags,
                               cvals)
                          and t > prev_t
                          and (not cross or _okx(closer, tail, cvals))):
                        took = pending is not None and pending[0] < t
                        hops = hops + [
                            pending if took else None,
                            [t, i, _bidx(closer, typ)],
                        ]
                        advanced = closer + 1
                elif nxt in loop0:
                    # Kleene loop. Reluctant (default): closer-priority
                    # when the (same-tick backed-out) count is already
                    # sufficient, else consume as a loop hop (capped at
                    # max_n; excess neither extends nor poisons).
                    # Greedy: hop-priority — a body-matching event is
                    # consumed as a hop while the ts-strict count is
                    # under max_n (the batch twin counts strictly-before
                    # by timestamp, so the greedy cap must too), and only
                    # then may a dual-matching event close. A FINAL loop
                    # has no closer — only the hop arm applies; it closes
                    # at its deadline via _finalize_loop instead.
                    lvals, lmn, lmx, lbind, _lnm, lgreedy = loop0[nxt]
                    sl = loop_slot[nxt]
                    n_, last_, nal_, _fz, lh_ = tail[0][sl]
                    closer = nxt + 1
                    eff = n_ - (nal_ if last_ == t else 0)
                    hop_ok = (
                        _okv(lvals, nxt, typ, flags, cvals)
                        and t > prev_t
                        and (lmx is None or (eff if lgreedy else n_) < lmx)
                    )
                    close_ok = (
                        closer < k
                        and _okv(stepsets[closer], closer, typ, flags,
                                 cvals)
                        and t > prev_t
                        and eff >= lmn
                        and not (lgreedy and hop_ok)
                        and (not cross or _okx(closer, tail, cvals))
                    )
                    if close_ok:
                        ncap_ = eff if lmx is None else min(eff, lmx)
                        fin = (
                            [h for h in lh_ if h[0] != t][:ncap_]
                            if lbind
                            else []
                        )
                        new_loops = list(tail[0])
                        new_loops[sl] = [ncap_, None, 0, 1, fin]
                        tail = [new_loops, *tail[1:]]
                        hops = hops + [
                            None,  # loop steps emit no ts/id hop
                            [t, i, _bidx(closer, typ)],
                        ]
                        advanced = closer + 1
                    elif hop_ok:
                        new_loops = list(tail[0])
                        new_loops[sl] = [
                            n_ + 1, t, (nal_ + 1 if last_ == t else 1), 0,
                            lh_ + [[t, i]] if lbind else lh_,
                        ]
                        p = [nxt, limit, prev_t, hops, poison, pending,
                             counters, new_loops, *tail[1:]]
                elif (
                    _okv(stepsets[nxt], nxt, typ, flags, cvals)
                    and t > prev_t
                    and (step_ns is None or t <= prev_t + step_ns)
                    and (not cross or _okx(nxt, tail, cvals))
                ):
                    hops = hops + [[t, i, _bidx(nxt, typ)]]
                    advanced = nxt + 1
                if advanced is not None:
                    if cross and advanced in cap_slot:
                        # the step just bound (1-based == advanced) is a
                        # capture source: stash the candidate's referenced
                        # payload values on the partial (copy-on-write)
                        ncaps = list(tail[-1])
                        ncaps[cap_slot[advanced]] = [
                            cvals[aux_ci[c]] for c in cap_cols[advanced]
                        ]
                        tail = [*tail[:-1], ncaps]
                    # freeze specs whose hi_step is the step just matched:
                    # events at exactly t are outside the open interval, so
                    # equal-ts events counted earlier this tick are backed out
                    counters = [list(c) for c in counters]
                    for j, (_v, _lo, hi_s, _mn, _mx, _bd) in enumerate(sp):
                        if hi_s == advanced and not counters[j][3]:
                            n, last, nal, _, chops = counters[j]
                            counters[j] = [
                                n - (nal if last == t else 0), None, 0, 1,
                                [h for h in chops if h[0] != t],
                            ]
                    p = [advanced, limit, t, hops, poison, None, counters,
                         *tail]
                    if advanced == k:
                        if skip_mode != "next":
                            a = tuple(hops[0][:2])
                            if last_end is not None and (
                                a < tuple(last_end)
                                if skip_incl
                                else a <= tuple(last_end)
                            ):
                                continue  # anchor consumed by a prior match
                            so = sess[1] if gap_ns is not None else None
                            if _complete(p, t, rows, key_val, hops, so):
                                last_end = _skip_point(p, hops)
                                end_moved = True
                        else:
                            _complete(p, t, rows, key_val, hops,
                                      sess[1] if gap_ns is not None else None)
                        continue  # completed — this match attempt ends here
                if (
                    strict
                    and advanced is None
                    and nxt + 1 in strict
                    and t > prev_t
                ):
                    # strict step: the key's next event (this one — any
                    # type, including non-vocabulary keepalives in
                    # buffered mode) did not match it, so the partial dies
                    continue
                keep.append(p)
            partials = keep
            if end_moved:
                # partials anchored before the emitted match's resume point
                # can never emit under a skip strategy — drop them (the
                # skip row itself stays eligible under the inclusive modes)
                le = tuple(last_end)
                partials = [
                    q for q in partials
                    if (tuple(q[3][0][:2]) >= le if skip_incl
                        else tuple(q[3][0][:2]) > le)
                ]
            if forbid_value is not None and typ == forbid_value:
                for p in partials:
                    # anchor strictly before the poison; earliest wins
                    if p[3][0][0] < t and p[4] is None:
                        p[4] = t
            for p in partials:
                # open counters: events strictly after the lo hop, while the
                # hi step is unmatched (frozen handles the close boundary)
                for j, (val, lo_s, _hi, _mn, _mx, bind) in enumerate(sp):
                    n, last, nal, frozen, chops = p[6][j]
                    if (
                        not frozen
                        and typ == val
                        and len(p[3]) >= lo_s
                        and t > p[3][lo_s - 1][0]
                    ):
                        p[6][j] = [
                            n + 1, t, nal + 1 if last == t else 1, 0,
                            chops + [[t, i]] if bind else chops,
                        ]
            if _okv(stepsets[0], 0, typ, flags, cvals) and not (
                skip_mode != "next"
                and last_end is not None
                and ((t, i) < tuple(last_end) if skip_incl
                     else (t, i) <= tuple(last_end))
            ):
                caps0 = None
                if cross:
                    caps0 = [None] * len(cap_steps)
                    if 1 in cap_slot:
                        caps0[cap_slot[1]] = [
                            cvals[aux_ci[c]] for c in cap_cols[1]
                        ]
                partials.append(
                    [1, t + within_ns, t,
                     [[t, i, _bidx(0, typ)]], None, None,
                     [[0, None, 0, 0, []] for _ in sp],
                     *([_fresh_loops()] if loop0 or cross else []),
                     *([caps0] if cross else [])]
                )
        return partials, last_end, sess

    def _events_of(pdfs, with_nav=False):
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return []
        pdf = (
            pd.concat(chunks, ignore_index=True)
            # null ts/id can neither anchor nor advance in the batch
            # algebra (null comparisons are false) — drop instead of
            # crashing on NaT->int
            .dropna(subset=[time_col, id_col])
            .sort_values([time_col, id_col])
            .reset_index(drop=True)
        )
        if with_nav:
            return [
                (
                    int(pd.Timestamp(getattr(r, time_col)).value),
                    int(getattr(r, id_col)),
                    getattr(r, type_col),
                    [
                        float("nan") if pd.isna(getattr(r, c))
                        else float(getattr(r, c))
                        for c in aux_cols
                    ],
                )
                for r in pdf.itertuples(index=False)
            ]
        return [
            (
                int(pd.Timestamp(getattr(r, time_col)).value),
                int(getattr(r, id_col)),
                getattr(r, type_col),
            )
            for r in pdf.itertuples(index=False)
        ]

    def _emit(rows):
        out = pd.DataFrame(rows, columns=out_names)
        for c in out.columns:
            cv = pd_conv[c]
            if cv == "datetime":
                out[c] = pd.to_datetime(out[c])
            elif cv is not None:
                out[c] = out[c].astype(cv)
        yield out

    def _fn_ordered(key, pdfs, state: GroupState):
        (key_val,) = key
        if state.hasTimedOut:
            state.remove()
            return
        partials, last_end, _ = (
            decode_state(state.get[0]) if state.exists else ([], None, None)
        )
        partials = _pad_loops(_chk_caps(partials))
        rows: list = []
        if cross or loc:
            # ordered mode carries the cross/local payload transiently
            # (events are never buffered): flags empty, values at ev[4]
            events = [
                (t, i, ty, (), vals)
                for t, i, ty, vals in _events_of(pdfs, with_nav=True)
            ]
        else:
            events = _events_of(pdfs)
        partials, last_end, _ = _process(
            partials, events, rows, key_val, last_end
        )
        if partials:
            state.update(
                (encode_partials(partials, last_end,
                                 cross_caps=bool(cross)), b"")
            )
            if idle_timeout_ms is not None:
                state.setTimeoutDuration(idle_timeout_ms)
        elif state.exists:
            # no in-flight partials: drop the state entry instead of keeping
            # an empty tombstone per key forever (a continuous job would
            # otherwise grow state with every key ever seen)
            state.remove()
        if rows:
            yield from _emit(rows)

    def _fn_buffered(key, pdfs, state: GroupState):
        (key_val,) = key
        tail: list = []
        if state.exists:
            partials, last_end, sess = decode_state(state.get[0])
            partials = _pad_loops(_chk_caps(partials))
            if aux:
                buffer, tail = decode_buffer_nav(state.get[1],
                                                 len(aux_cols))
            else:
                buffer = decode_buffer(state.get[1])
        else:
            partials, buffer, last_end, sess = [], [], None, None
        wm_ms = state.getCurrentWatermarkMs()
        wm_ns = wm_ms * 1_000_000
        if aux:
            # navigation counts EVERY event of the key as a position
            # (the batch twin's lag() over the whole partition),
            # session/strict modes need every event as keepalive/killer,
            # and a '*' wildcard step can bind NON-vocabulary events —
            # all types transit the buffer, carrying the aux (nav+cross)
            # column values; cross alone needs only vocabulary events
            if nav or gap_ns is not None or strict or has_wild:
                buffer.extend(
                    (t, i, vidx.get(typ, KEEPALIVE), vals)
                    for t, i, typ, vals in _events_of(pdfs, with_nav=True)
                )
            else:
                buffer.extend(
                    (t, i, vidx[typ], vals)
                    for t, i, typ, vals in _events_of(pdfs, with_nav=True)
                    if typ in vidx
                )
        elif gap_ns is not None or strict:
            # session mode: EVERY event keeps the session alive; strict
            # mode: every event can kill a waiting strict partial — all
            # types transit the buffer (non-vocabulary as keepalives)
            buffer.extend(
                (t, i, vidx.get(typ, KEEPALIVE))
                for t, i, typ in _events_of(pdfs)
            )
        else:
            buffer.extend(
                (t, i, vidx[typ])
                for t, i, typ in _events_of(pdfs)
                if typ in vidx
            )
        buffer.sort(key=lambda e: (e[0], e[1]))
        # watermark finality: only events strictly older than the watermark
        # can no longer be preceded by a straggler — process those, keep the
        # rest buffered until a later batch (or no-data callback) advances it
        if aux:
            # classify at DRAIN time (event-time order): each event's nav
            # flags come from the previously PROCESSED events' values —
            # `tail` persists the last max-offset values across batches.
            # NaN/None on either side fails the comparison (SQL NULL
            # semantics for the lowered predicate). Cross values ride the
            # same vector and are evaluated per-partial inside _process.
            ready = []
            for t, i, v, vals in buffer:
                if t >= wm_ns:
                    break
                fl = []
                for p_ in nav_pos:
                    ok = True
                    for ca, cmp_, cb, n in nav[p_]:
                        if len(tail) < n:
                            ok = False
                            break
                        a = vals[aux_ci[ca]]
                        b = tail[-n][aux_ci[cb]]
                        if not (a == a and b == b
                                and _NAV_CMP[cmp_](a, b)):
                            ok = False
                            break
                    fl.append(ok)
                typ_ = vocab[v] if v != KEEPALIVE else None
                ready.append(
                    (t, i, typ_, tuple(fl), vals)
                    if cross or loc
                    else (t, i, typ_, tuple(fl))
                )
                if nav_maxoff:
                    tail.append(list(vals))
                    if len(tail) > nav_maxoff:
                        del tail[0]
            buffer = buffer[len(ready):]
        else:
            ready = [
                (t, i, vocab[v] if v != KEEPALIVE else None)
                for t, i, v in buffer
                if t < wm_ns
            ]
            buffer = [e for e in buffer if e[0] >= wm_ns]
        rows: list = []
        partials, last_end, sess = _process(
            partials, ready, rows, key_val, last_end, sess
        )
        # a partial whose window closed before the watermark can never
        # advance again (any future event has ts >= watermark > limit) —
        # for a FINAL loop that deadline IS the close signal: emit, then drop
        dead = [p for p in partials if p[1] < wm_ns] if final_loop else []
        partials = [p for p in partials if p[1] >= wm_ns]
        if gap_ns is not None and sess is not None and wm_ns > sess[0] + gap_ns:
            # the open session's gap deadline passed the watermark: no
            # event can arrive that keeps it alive, so its partials are dead
            # (for a FINAL loop: session-closed — emit those too)
            if final_loop:
                dead.extend(partials)
            partials = []
        for p in dead:
            _finalize_loop(
                p, rows, key_val, sess[1] if gap_ns is not None else None
            )
        # session mode keeps the per-key cursor ALIVE even with no
        # in-flight work: the session ordinal counts from the key's first
        # event ever (matching the batch labeler), so dropping it would
        # reset session_id after an emitted match. Cost: one ~30-byte
        # header per key seen — state bounded by DISTINCT KEYS, like any
        # keyed aggregation, instead of by in-flight work.
        # nav keeps the per-key history tail alive like the session
        # cursor: dropping it would blind the next event's PREV — state
        # bounded by distinct keys, max-offset values each
        if partials or buffer or (gap_ns is not None and sess is not None) \
                or (nav and tail):
            state.update(
                (encode_partials(partials, last_end, sess,
                                 cross_caps=bool(cross)),
                 encode_buffer_nav(buffer, tail, len(aux_cols))
                 if aux else encode_buffer(buffer))
            )
            wake = None
            if buffer:
                wake = buffer[0][0]
            elif partials:
                wake = min(p[1] for p in partials)
                if gap_ns is not None and sess is not None:
                    wake = min(wake, sess[0] + gap_ns)
            if wake is not None:
                state.setTimeoutTimestamp(
                    max(wake // 1_000_000 + 1, wm_ms + 1)
                )
        elif state.exists:
            state.remove()
        if rows:
            yield from _emit(rows)

    if ordered:
        timeout_conf = (
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        )
        fn = _fn_ordered
    else:
        timeout_conf = GroupStateTimeout.EventTimeTimeout
        fn = _fn_buffered
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_ddl,
            stateStructType="partials binary, buffer binary",
            outputMode="append",
            timeoutConf=timeout_conf,
        )
    )
