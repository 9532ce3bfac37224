"""Randomized CEP pattern-spec fuzzer: generate random pattern
compositions (alternation x optional x CountBetween binding x Kleene
LoopStep x forbid x step_within x after_match x session-gap) over random
event soups and differentially check

- the BATCH join algebra (`match_sequence` / `match_sequence_sessionized`)
  on every iteration, and
- the BUFFERED STREAM machine (`match_sequence_stream`, ordered=False,
  shuffled multi-file replay) on a subset,

against a clean-room sequential reference matcher (`ref_matches`) that
implements the documented greedy no-lookahead semantics as a per-anchor
forward simulation — nested loops and lists, no joins, no shared
structure with either twin. The same role the kernel's byte-level fuzz
(`fuzz_vs_reference.py`) plays for Part A: hand-picked cases can miss
interactions; seeded volume can't.

Usage: python benchmarks/fuzz_cep.py N [SEED] [--stream-every K]
Prints a summary line; non-zero exit on any mismatch.
"""

from __future__ import annotations

import os
import random
import sys
from dataclasses import dataclass, field
from datetime import datetime, timedelta

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VOCAB = ["A", "B", "C", "D", "E", "x"]
FORBID_VAL = "P"


# --- spec model --------------------------------------------------------------


@dataclass
class Step:
    kind: str               # "plain" | "alt" | "opt" | "loop"
    values: tuple = ()      # accepted literals (alt: >1; loop: loop body)
    min_n: int = 1          # loop only
    max_n: int | None = None
    bind: object = True     # loop / count binding
    name: str = ""
    greedy: bool = False    # loop only: hop-priority munch


@dataclass
class Spec:
    steps: list = field(default_factory=list)
    within_min: int = 15
    counts: list = field(default_factory=list)  # (value, lo, hi, mn, mx, bind, name)
    forbid: bool = False
    step_within_s: int | None = None
    after_match: str = "skip_to_next"
    session_gap_s: int | None = None
    strict: frozenset = frozenset()  # 1-based strictly-contiguous steps


def _loop_body(rng):
    """Loop-body vocabulary: single value, or a 2-value alternation body
    ((B|C)+ — batch list-of-Columns pred / stream tuple value)."""
    if rng.random() < 0.35:
        return tuple(rng.sample(VOCAB[:5], 2))
    return (rng.choice(VOCAB[:5]),)


def gen_spec(rng: random.Random) -> Spec:
    """Random legal pattern spec (mirrors the operators' validation)."""
    n_core = rng.randint(2, 4)
    steps: list[Step] = []
    for j in range(n_core):
        if rng.random() < 0.3:
            vals = tuple(rng.sample(VOCAB[:5], 2))
            steps.append(Step("alt", vals))
        else:
            steps.append(Step("plain", (rng.choice(VOCAB[:5]),)))
    # optionally upgrade ONE interior step to optional or loop (its closer
    # — the next step — must stay plain/alt)
    interior = [j for j in range(1, len(steps) - 1)]
    sw_allowed = True
    final_loop = False
    if rng.random() < 0.18:
        # ANCHOR-position loop (A+ B ..): every loop event anchors its own
        # potential match, the anchor counts as the first hop.  The next
        # step must stay a required plain/alt (the desugared inner loop's
        # closer), which the base generator guarantees.
        mn = rng.choice([1, 2])
        mx = rng.choice([None, 2, 3])
        if mx is not None and mx < mn:
            mx = mn
        steps[0] = Step(
            "loop", _loop_body(rng), min_n=mn, max_n=mx,
            bind=rng.choice([True, "all", False]), name="la",
            greedy=rng.random() < 0.4,
        )
        sw_allowed = False
    elif rng.random() < 0.2:
        # FINAL-position loop (A .. B+): closed by the horizon / session
        # bound; forbid + any non-default after_match are illegal with it (no final
        # matched row) and min_n must be >= 1
        mn = rng.choice([1, 2])
        mx = rng.choice([None, 2, 3])
        if mx is not None and mx < mn:
            mx = mn
        steps[-1] = Step(
            "loop", _loop_body(rng), min_n=mn, max_n=mx,
            bind=rng.choice([True, "all", False]), name="lf",
        )
        sw_allowed = False
        final_loop = True
    elif interior and rng.random() < 0.55:
        j = rng.choice(interior)
        if rng.random() < 0.5:
            # optional: value set disjoint from the closer's (stream rule)
            closer_vals = set(steps[j + 1].values)
            pool = [v for v in VOCAB[:5] if v not in closer_vals]
            steps[j] = Step("opt", (rng.choice(pool),))
        else:
            steps[j] = Step(
                "loop",
                _loop_body(rng),
                min_n=rng.choice([0, 1, 2]),
                max_n=rng.choice([None, 1, 2, 3]),
                bind=rng.choice([True, "all", False]),
                name=f"l{j}",
                greedy=rng.random() < 0.4,
            )
            if steps[j].max_n is not None and steps[j].max_n < steps[j].min_n:
                steps[j] = Step(
                    "loop", steps[j].values, min_n=0, max_n=steps[j].max_n,
                    bind=steps[j].bind, name=steps[j].name,
                    greedy=steps[j].greedy,
                )
        sw_allowed = False
    spec = Spec(steps=steps, within_min=rng.choice([5, 10, 20]))
    # CountBetween over ts-bearing (plain/alt) steps
    anchors = [
        j + 1 for j, s in enumerate(steps) if s.kind in ("plain", "alt")
    ]
    if len(anchors) >= 2 and rng.random() < 0.5:
        lo, hi = sorted(rng.sample(anchors, 2))
        mn = rng.choice([0, 1])
        mx = rng.choice([None, 2, 4])
        spec.counts.append(
            (rng.choice(VOCAB[:5]), lo, hi, mn, mx,
             rng.choice([False, True, "all"]), "c0")
        )
    spec.forbid = (not final_loop) and rng.random() < 0.3
    if sw_allowed and not spec.counts and rng.random() < 0.25:
        spec.step_within_s = rng.choice([120, 300])
    if not final_loop and rng.random() < 0.35:
        # AFTER MATCH SKIP family: past_last, or a positional skip-to —
        # targets must be required (non-opt) steps; a loop target needs
        # bind + min_n>=1; position 1 is legal only as an anchor-loop
        # skip_to_last with min_n>=2 (the desugar-remap case)
        if rng.random() < 0.45:
            spec.after_match = "skip_past_last"
        else:
            tgts = []
            for j, s in enumerate(steps):
                pos = j + 1
                if s.kind in ("plain", "alt") and pos >= 2:
                    tgts.append(pos)
                elif s.kind == "loop" and s.bind and (
                    (pos >= 2 and s.min_n >= 1)
                    or (pos == 1 and s.min_n >= 2)
                ):
                    tgts.append(pos)
            if tgts:
                pos = rng.choice(tgts)
                mode = "last" if pos == 1 else rng.choice(["first", "last"])
                spec.after_match = f"skip_to_{mode}:{pos}"
    if rng.random() < 0.3:
        spec.session_gap_s = rng.choice([180, 420])
    # strict contiguity: plain/alt steps whose predecessor is plain/alt
    strict_cands = [
        j + 1
        for j in range(1, len(steps))
        if steps[j].kind in ("plain", "alt")
        and steps[j - 1].kind in ("plain", "alt")
    ]
    if strict_cands and rng.random() < 0.3:
        spec.strict = frozenset(
            rng.sample(strict_cands, rng.randint(1, min(2, len(strict_cands))))
        )
    return spec


def gen_events(rng: random.Random, n=400, keys=6, span_s=2400):
    t0 = datetime(2024, 1, 1)
    evs = []
    for i in range(n):
        typ = rng.choice(VOCAB + ([FORBID_VAL] if rng.random() < 0.1 else []))
        # coarse second grid forces same-timestamp collisions
        evs.append(
            (i, rng.randrange(keys), typ,
             t0 + timedelta(seconds=rng.randrange(span_s // 10) * 10))
        )
    return evs


# --- clean-room reference matcher -------------------------------------------


def _sessionize(rows, gap_ns):
    """[(t,i,typ)] sorted -> [(t,i,typ,session_id)] per documented rule."""
    out, sid, last = [], 0, None
    for t, i, typ in rows:
        if last is None or t > last + gap_ns:
            sid += 1
        last = t
        out.append((t, i, typ, sid))
    return out


def _sim_anchor(rows, ai, spec: Spec, within_ns):
    """Forward-simulate one anchor; returns hops per step (plain/alt:
    (t,i,branch); opt: (t,i,branch)|None; loop: (n, hop_list, )) or None."""
    t0, i0, ty0 = rows[ai]
    hor = t0 + within_ns
    sw = spec.step_within_s * 10**9 if spec.step_within_s else None
    if spec.steps[0].kind == "loop":
        # ANCHOR loop: the anchor is the loop's first hop; further hops
        # accumulate (total capped at max_n) until the earliest
        # closer-candidate whose strictly-earlier hop count reaches
        # min_n.  Closer-priority on an event matching both, same as the
        # middle loop.  Simulated directly — NOT via the operator's
        # desugar — so the differential stays independent.
        st = spec.steps[0]
        closer = spec.steps[1]
        consumed = [(t0, i0)]
        close = None
        for t, i, typ in rows[ai + 1:]:
            if t > hor:
                break
            eligible = [h for h in consumed if h[0] < t]
            hop_ok = (
                typ in st.values
                and t > t0
                and (
                    st.max_n is None
                    or (len(eligible) if st.greedy else len(consumed))
                    < st.max_n
                )
            )
            if (
                typ in closer.values
                and t > t0
                and len(eligible) >= st.min_n
                and not (st.greedy and hop_ok)
            ):
                n = (
                    len(eligible)
                    if st.max_n is None
                    else min(len(eligible), st.max_n)
                )
                close = (n, eligible[:n], (t, i, closer.values.index(typ)))
                break
            if hop_ok:
                consumed.append((t, i))
        if close is None:
            return None
        hops: list = [("LOOP", close[0], close[1]), close[2]]
        prev = close[2][0]
        j = 2
        while j < len(spec.steps):
            st = spec.steps[j]
            # delegate the tail to the generic walker below by falling
            # through — structured as a shared inner loop would be nicer,
            # but the generator never produces a second special step
            # after an anchor loop, so the tail is plain/alt only
            got = None
            if (j + 1) in spec.strict:
                for t, i, typ in rows[ai + 1:]:
                    if t <= prev:
                        continue
                    if t <= hor and typ in st.values:
                        got = (t, i, st.values.index(typ))
                    break
            else:
                for t, i, typ in rows[ai + 1:]:
                    if t > hor:
                        break
                    if typ in st.values and t > prev:
                        got = (t, i, st.values.index(typ))
                        break
            if got is None:
                return None
            hops.append(got)
            prev = got[0]
            j += 1
        return hops
    hops: list = [(t0, i0, spec.steps[0].values.index(ty0))]
    prev = t0
    j = 1
    while j < len(spec.steps):
        st = spec.steps[j]
        if st.kind in ("plain", "alt"):
            got = None
            if (j + 1) in spec.strict:
                # strict contiguity: the key's very NEXT event (any type)
                # after prev must match, else the attempt dies
                for t, i, typ in rows[ai + 1:]:
                    if t <= prev:
                        continue
                    if (
                        t <= hor
                        and typ in st.values
                        and (sw is None or t <= prev + sw)
                    ):
                        got = (t, i, st.values.index(typ))
                    break
                if got is None:
                    return None
                hops.append(got)
                prev = got[0]
                j += 1
                continue
            for t, i, typ in rows[ai + 1:]:
                if t > hor:
                    break
                if typ in st.values and t > prev and (
                    sw is None or t <= prev + sw
                ):
                    got = (t, i, st.values.index(typ))
                    break
            if got is None:
                return None
            hops.append(got)
            prev = got[0]
            j += 1
        elif st.kind == "opt":
            closer = spec.steps[j + 1]
            b = None
            c = None
            for t, i, typ in rows[ai + 1:]:
                if t > hor:
                    break
                if b is None and typ in st.values and t > prev:
                    b = (t, i, st.values.index(typ))
                if c is None and typ in closer.values and t > prev:
                    c = (t, i, closer.values.index(typ))
                if c is not None and b is not None:
                    break
            if c is None:
                return None
            taken = b is not None and b[0] < c[0]
            hops.append(b if taken else None)
            hops.append(c)
            prev = c[0]
            j += 2
        else:  # loop
            if j == len(spec.steps) - 1:
                # FINAL loop: hops accumulate (capped at max_n) through the
                # horizon — which is the session's end in sessionized runs,
                # since rows are already session-scoped and within is inert
                consumed = []
                for t, i, typ in rows[ai + 1:]:
                    if t > hor:
                        break
                    if (
                        typ in st.values
                        and t > prev
                        and (st.max_n is None or len(consumed) < st.max_n)
                    ):
                        consumed.append((t, i))
                if len(consumed) < st.min_n:
                    return None
                hops.append(("LOOP", len(consumed), consumed))
                j += 1
                continue
            closer = spec.steps[j + 1]
            consumed: list = []
            close = None
            for t, i, typ in rows[ai + 1:]:
                if t > hor:
                    break
                eligible = [h for h in consumed if h[0] < t]
                hop_ok = (
                    typ in st.values
                    and t > prev
                    and (
                        st.max_n is None
                        or (len(eligible) if st.greedy else len(consumed))
                        < st.max_n
                    )
                )
                if (
                    typ in closer.values
                    and t > prev
                    and len(eligible) >= st.min_n
                    and not (st.greedy and hop_ok)
                ):
                    n = (
                        len(eligible)
                        if st.max_n is None
                        else min(len(eligible), st.max_n)
                    )
                    close = (n, eligible[:n], (t, i, closer.values.index(typ)))
                    break
                if hop_ok:
                    consumed.append((t, i))
            if close is None:
                return None
            hops.append(("LOOP", close[0], close[1]))
            hops.append(close[2])
            prev = close[2][0]
            j += 2
    return hops


def _anchor_ti(hops):
    """(ts, id) of the match's anchor: the first hop — which for an
    ANCHOR-loop match lives inside the LOOP tuple's bound-hop list."""
    h = hops[0]
    if h[0] == "LOOP":
        return (h[2][0][0], h[2][0][1])
    return (h[0], h[1])


def ref_matches(events, spec: Spec):
    """All matches for one key's [(t_ns, id, typ)] rows -> list of dicts
    keyed by output column name (the batch operator's schema)."""
    within_ns = spec.within_min * 60 * 10**9
    rows_all = sorted(events)
    groups = (
        [(None, rows_all)]
        if spec.session_gap_s is None
        else [
            (sid, [(t, i, typ) for t, i, typ, s in labeled if s == sid])
            for labeled in [_sessionize(rows_all, spec.session_gap_s * 10**9)]
            for sid in sorted({s for _, _, _, s in labeled})
        ]
    )
    out = []
    for sid, rows in groups:
        wns = within_ns if spec.session_gap_s is None else 3650 * 86400 * 10**9
        matches = []
        for ai, (t, i, typ) in enumerate(rows):
            if typ not in spec.steps[0].values:
                continue
            hops = _sim_anchor(rows, ai, spec, wns)
            if hops is None:
                continue
            # forbid: any P strictly inside (anchor, final)
            if spec.forbid and any(
                ty == FORBID_VAL and _anchor_ti(hops)[0] < tt < hops[-1][0]
                for tt, ii, ty in rows
            ):
                continue
            # counts
            ok = True
            cvals = {}
            for val, lo, hi, mn, mx, bind, name in spec.counts:
                lo_t = hops[lo - 1][0] if hops[lo - 1] else None
                hi_t = hops[hi - 1][0] if hops[hi - 1] else None
                ch = sorted(
                    (tt, ii)
                    for tt, ii, ty in rows
                    if ty == val and lo_t < tt < hi_t
                )
                n = len(ch)
                if n < mn or (mx is not None and n > mx):
                    ok = False
                    break
                cvals[f"n_{name}"] = n
                if bind:
                    cvals[f"first_{name}_ts"] = ch[0][0] if ch else None
                    cvals[f"first_{name}_id"] = ch[0][1] if ch else None
                    cvals[f"last_{name}_ts"] = ch[-1][0] if ch else None
                    cvals[f"last_{name}_id"] = ch[-1][1] if ch else None
                    if bind == "all":
                        cvals[f"{name}_ids"] = tuple(h[1] for h in ch)
            if not ok:
                continue
            matches.append((hops, cvals))
        if spec.after_match != "skip_to_next":
            mode, _, tgt = spec.after_match.partition(":")
            incl = spec.after_match != "skip_past_last"
            matches.sort(key=lambda m: _anchor_ti(m[0]))
            kept, point = [], None
            for hops, cvals in matches:
                a = _anchor_ti(hops)
                if point is None or (a >= point if incl else a > point):
                    kept.append((hops, cvals))
                    if not incl:
                        point = (hops[-1][0], hops[-1][1])
                    else:
                        h = hops[int(tgt) - 1]
                        if h[0] == "LOOP":
                            hp = h[2][0] if mode == "skip_to_first" else h[2][-1]
                            point = (hp[0], hp[1])
                        else:
                            point = (h[0], h[1])
            matches = kept
        for hops, cvals in matches:
            row = {}
            if sid is not None:
                row["session_id"] = sid
            for j, st in enumerate(spec.steps):
                h = hops[j]
                if st.kind == "loop":
                    _tag, n, lh = h
                    row[f"n_{st.name}"] = n
                    if st.bind:
                        row[f"first_{st.name}_ts"] = lh[0][0] if lh else None
                        row[f"first_{st.name}_id"] = lh[0][1] if lh else None
                        row[f"last_{st.name}_ts"] = lh[-1][0] if lh else None
                        row[f"last_{st.name}_id"] = lh[-1][1] if lh else None
                        if st.bind == "all":
                            row[f"{st.name}_ids"] = tuple(x[1] for x in lh)
                    continue
                if h is None:
                    row[f"ts_{j + 1}"] = None
                    row[f"id_{j + 1}"] = None
                    if st.kind == "alt" and len(st.values) > 1:
                        row[f"branch_{j + 1}"] = None
                else:
                    row[f"ts_{j + 1}"] = h[0]
                    row[f"id_{j + 1}"] = h[1]
                    if st.kind == "alt" and len(st.values) > 1:
                        row[f"branch_{j + 1}"] = h[2]
            row.update(cvals)
            out.append(row)
    return out


# --- harness -----------------------------------------------------------------


def build_operator_args(spec: Spec):
    from pyspark.sql import functions as F

    from rtfproc_spark.operators.cep import CountBetween, LoopStep

    def pred(vals):
        if len(vals) == 1:
            return F.col("event_type") == vals[0]
        return [F.col("event_type") == v for v in vals]

    steps = []
    svals = []
    optional = set()
    for j, st in enumerate(spec.steps):
        if st.kind == "loop":
            lp = LoopStep(
                # multi-value loop body = batch list-of-Columns pred /
                # stream tuple value (the (B|C)+ alternation body)
                pred=(
                    F.col("event_type") == st.values[0]
                    if len(st.values) == 1
                    else [F.col("event_type") == v for v in st.values]
                ),
                value=(
                    st.values[0] if len(st.values) == 1 else tuple(st.values)
                ),
                min_n=st.min_n, max_n=st.max_n, bind=st.bind, name=st.name,
                greedy=st.greedy,
            )
            steps.append(lp)
            svals.append(lp)
            continue
        if st.kind == "opt":
            optional.add(j + 1)
        steps.append(pred(st.values))
        svals.append(st.values[0] if len(st.values) == 1 else tuple(st.values))
    counts = [
        CountBetween(
            pred=F.col("event_type") == val, value=val,
            lo_step=lo, hi_step=hi, min_n=mn, max_n=mx, bind=bind, name=name,
        )
        for val, lo, hi, mn, mx, bind, name in spec.counts
    ]
    kw = dict(
        within=f"{spec.within_min} minutes",
        optional_steps=optional or None,
        counts=counts or None,
        after_match=spec.after_match,
        strict_steps=set(spec.strict) or None,
    )
    if spec.forbid:
        kw["forbid_pred"] = True
    if spec.step_within_s:
        kw["step_within"] = f"{spec.step_within_s} seconds"
    return steps, svals, kw


def spec_to_pattern(spec: Spec):
    """Render a Spec's step shape to the pattern-string grammar: one
    variable per literal (``VA`` for value ``A`` — stable across steps),
    alternation groups, ``?`` optionals, ``{m,n}``-family loops with the
    grammar's greedy-default / reluctant-suffix convention, and ``>``
    strict markers. Returns (pattern, stream_define, bind_map,
    loop_names) where loop_names maps step index -> the name the
    front end derives ("_".join of lowered vars)."""
    define: dict[str, str] = {}
    toks: list[str] = []
    bind_map: dict[str, object] = {}
    loop_names: dict[int, str] = {}
    for j, st in enumerate(spec.steps):
        names = []
        for v in st.values:
            nm = f"V{v}"
            define[nm] = v
            names.append(nm)
        core = names[0] if len(names) == 1 else "(" + "|".join(names) + ")"
        if st.kind == "opt":
            tok = core + "?"
        elif st.kind == "loop":
            mn, mx = st.min_n, st.max_n
            if mx is None:
                q = "+" if mn == 1 else ("*" if mn == 0 else f"{{{mn},}}")
            elif mn == mx:
                q = f"{{{mn}}}"
            else:
                q = f"{{{mn},{mx}}}"
            tok = core + q + ("" if st.greedy else "?")
            derived = "_".join(n.lower() for n in names)
            bind_map[derived] = st.bind
            loop_names[j] = derived
        else:
            tok = core
        if (j + 1) in spec.strict:
            toks.append(">")
        toks.append(tok)
    return " ".join(toks), define, bind_map, loop_names


def check_front_end(spec: Spec) -> str | None:
    """Differential for the pattern-string front end: compile the
    rendered pattern on BOTH define kinds and require the compiled spec
    to be structurally identical to the generated Spec (stream) /
    object-identical to the define Columns (batch). Returns an error
    string on divergence, None when clean."""
    from pyspark.sql import functions as F

    from rtfproc_spark.operators.cep import LoopStep
    from rtfproc_spark.operators.pattern import compile_pattern

    pattern, sdefine, bind_map, loop_names = spec_to_pattern(spec)
    want_opt = {
        j + 1 for j, s in enumerate(spec.steps) if s.kind == "opt"
    } or None
    want_strict = set(spec.strict) or None

    comp = compile_pattern(pattern, sdefine, bind=bind_map or True)
    if comp["optional_steps"] != want_opt:
        return f"stream optional {comp['optional_steps']} != {want_opt}"
    if comp["strict_steps"] != want_strict:
        return f"stream strict {comp['strict_steps']} != {want_strict}"
    for j, (st, cs) in enumerate(zip(spec.steps, comp["steps"])):
        if st.kind == "loop":
            final = j == len(spec.steps) - 1
            ok = (
                isinstance(cs, LoopStep)
                and cs.pred is None
                and cs.value == (
                    st.values[0] if len(st.values) == 1 else tuple(st.values)
                )
                and (cs.min_n, cs.max_n) == (st.min_n, st.max_n)
                and cs.bind == st.bind
                and cs.name == loop_names[j]
                # a FINAL loop is demoted to reluctant by the compiler
                and cs.greedy == (st.greedy and not final)
            )
            if not ok:
                return f"stream loop step {j + 1}: {cs!r} != {st!r}"
        else:
            want = st.values[0] if len(st.values) == 1 else tuple(st.values)
            if cs != want:
                return f"stream step {j + 1}: {cs!r} != {want!r}"

    bdefine = {nm: F.col("event_type") == v for nm, v in sdefine.items()}
    comp_b = compile_pattern(pattern, bdefine, bind=bind_map or True)
    if (comp_b["optional_steps"], comp_b["strict_steps"]) != (
        want_opt, want_strict
    ):
        return "batch optional/strict sets diverge from stream compile"
    for j, (st, cs) in enumerate(zip(spec.steps, comp_b["steps"])):
        want_cols = [bdefine[f"V{v}"] for v in st.values]
        if st.kind == "loop":
            preds = cs.pred if isinstance(cs.pred, list) else [cs.pred]
            if not (isinstance(cs, LoopStep) and cs.value is None
                    and all(a is b for a, b in zip(preds, want_cols))
                    and len(preds) == len(want_cols)):
                return f"batch loop step {j + 1}: pred objects diverge"
        else:
            cols = cs if isinstance(cs, list) else [cs]
            if not (len(cols) == len(want_cols)
                    and all(a is b for a, b in zip(cols, want_cols))):
                return f"batch step {j + 1}: Column objects diverge"
    return None


def norm_rows(df_rows, columns):
    out = []
    for r in df_rows:
        tup = []
        for c in columns:
            v = r[c]
            if isinstance(v, datetime):
                v = int(v.timestamp() * 1e9)
            elif isinstance(v, list):
                v = tuple(v)
            tup.append(v)
        out.append(tuple(tup))
    return sorted(out)


def norm_ref(rows, columns, key_val):
    out = []
    for r in rows:
        out.append(
            tuple([key_val] + [r.get(c) for c in columns if c != "user_id"])
        )
    return sorted(out)


def run_fuzz(n_iter: int, seed: int, stream_every: int = 8, dense: bool = False):
    import os
    import shutil
    import time as _time

    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from rtfproc_spark.operators.cep import (
        match_sequence,
        match_sequence_sessionized,
        match_sequence_stream,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(seed)
    mismatches = 0
    stream_runs = 0
    for it in range(n_iter):
        spec = gen_spec(rng)
        # pattern-string front end differential: the rendered pattern must
        # compile to EXACTLY this spec on both define kinds (pure parse
        # check — no extra Spark work)
        fe_err = check_front_end(spec)
        if fe_err:
            mismatches += 1
            print(f"[iter {it}] FRONT-END MISMATCH spec={spec}: {fe_err}")
            continue
        # dense mode: ~3x the events per key (175 vs 67) — deeper Kleene
        # loops, longer CountBetween runs, more same-tick collisions
        evs = (
            gen_events(rng, n=700, keys=4, span_s=1800)
            if dense
            else gen_events(rng)
        )
        pdf = pd.DataFrame(
            evs, columns=["event_id", "user_id", "event_type", "ts"]
        )
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        df = spark.createDataFrame(pdf)
        steps, svals, kw = build_operator_args(spec)
        forbid_pred = (
            (F.col("event_type") == FORBID_VAL) if kw.pop("forbid_pred", False)
            else None
        )
        if spec.session_gap_s is not None:
            got_df = match_sequence_sessionized(
                df, steps, ["user_id"], gap=f"{spec.session_gap_s} seconds",
                time_col="ts", id_col="event_id", forbid=forbid_pred,
                **{k: v for k, v in kw.items() if k != "within"},
            )
        else:
            got_df = match_sequence(
                df, steps, ["user_id"], time_col="ts", id_col="event_id",
                forbid=forbid_pred, **kw,
            )
        columns = got_df.columns
        got = norm_rows(got_df.collect(), columns)
        by_key: dict = {}
        for i, u, typ, ts in evs:
            by_key.setdefault(u, []).append(
                (int(ts.timestamp() * 1e9), i, typ)
            )
        want = []
        for u, rows in by_key.items():
            want += norm_ref(ref_matches(rows, spec), columns, u)
        want.sort()
        if got != want:
            mismatches += 1
            print(f"[iter {it}] BATCH MISMATCH spec={spec}")
            print("  got ", got[:4], "...", len(got))
            print("  want", want[:4], "...", len(want))
            continue
        # stream twin on a subset (buffered mode, shuffled replay)
        if it % stream_every == 0:
            stream_runs += 1
            base = f"/tmp/fuzz_cep_{seed}_{it}"
            shutil.rmtree(base, ignore_errors=True)
            os.makedirs(f"{base}/src")
            sdf = pdf.sample(frac=1.0, random_state=it)
            # flush event far enough out that the final watermark
            # (flush_ts - 48h) still clears every real event's deadline
            flush = pd.DataFrame(
                [(99999, 0, "zz", pdf["ts"].max() + pd.Timedelta(hours=100))],
                columns=pdf.columns,
            ).astype(pdf.dtypes)
            nn = len(sdf)
            now = _time.time()
            for f in range(3):
                p = f"{base}/src/part-{f}.parquet"
                sdf.iloc[f * nn // 3:(f + 1) * nn // 3].to_parquet(
                    p, index=False
                )
                os.utime(p, (now + f, now + f))
            flush.to_parquet(f"{base}/src/part-9.parquet", index=False)
            os.utime(f"{base}/src/part-9.parquet", (now + 9, now + 9))
            stream = (
                spark.readStream.schema(
                    "event_id long, user_id long, event_type string, "
                    "ts timestamp"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{base}/src")
            )
            skw = dict(
                within=kw["within"],
                optional_steps=kw["optional_steps"],
                counts=kw["counts"],
                after_match=kw["after_match"],
                strict_steps=kw["strict_steps"],
                watermark="48 hours",
                ordered=False,
                forbid_value=FORBID_VAL if forbid_pred is not None else None,
            )
            if spec.step_within_s:
                skw["step_within"] = f"{spec.step_within_s} seconds"
            if spec.session_gap_s is not None:
                skw["session_gap"] = f"{spec.session_gap_s} seconds"
                skw["within"] = "3650 days"
            out = match_sequence_stream(
                stream, svals, key_col="user_id", **skw
            )
            q = (
                out.writeStream.format("parquet")
                .option("path", f"{base}/out")
                .option("checkpointLocation", f"{base}/ckpt")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            try:
                got_s = norm_rows(
                    spark.read.parquet(f"{base}/out").collect(), columns
                )
            except Exception:
                got_s = []  # no rows written -> empty sink dir
            if got_s != want:
                mismatches += 1
                print(f"[iter {it}] STREAM MISMATCH spec={spec}")
                print("  got ", got_s[:4], "...", len(got_s))
                print("  want", want[:4], "...", len(want))
            shutil.rmtree(base, ignore_errors=True)
        if (it + 1) % 10 == 0:
            print(f"  ...{it + 1}/{n_iter} ok (stream runs: {stream_runs})")
    print(
        f"fuzz_cep: {n_iter} patterns (+front-end compile differential "
        f"each), {stream_runs} stream replays, "
        f"seed={seed}, mismatches={mismatches}"
    )
    return mismatches





# --- PREV/NEXT navigation desugar fuzz ---------------------------------------


def run_nav_fuzz(n_iter: int, seed: int) -> int:
    """Randomized differential for the DEFINE navigation desugar
    (`match_recognize_sql` PREV/NEXT -> lag/lead): random payload traces
    (duplicate timestamps included — the pure-ts boundary edge), random
    pattern shapes (pairs, triples, anchor/middle loops, optionals,
    single-step classification) whose DEFINEs mix plain type predicates
    with PREV/NEXT at offsets 1-2, matched through the SQL clause vs the
    same compiled spec over a hand-augmented frame with explicit
    lag/lead columns (isolates exactly the nav lowering + clause
    parsing; the matcher itself is fuzzed by `run_fuzz`)."""
    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from rtfproc_spark.operators.cep import match_sequence
    from rtfproc_spark.operators.pattern import (
        compile_pattern, match_recognize_sql,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("fuzz_cep_nav")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(seed)
    types = ["a", "b", "c"]
    shapes = [
        ["A", "B"], ["A", "B", "C"], ["A+", "B"], ["A", "B+", "C"],
        ["A", "B?", "C"], ["A"],
        ["A", ">", "B"], ["A", ">", "B", "C"],  # strict x navigation
    ]
    mismatches = 0
    for it in range(n_iter):
        t0 = datetime(2024, 1, 1)
        rows = [
            (i, rng.randrange(4), rng.choice(types),
             t0 + timedelta(seconds=rng.randrange(1800)),
             float(rng.randrange(1, 40)))
            for i in range(350)
        ]
        pdf = pd.DataFrame(
            rows, columns=["event_id", "user_id", "event_type", "ts",
                           "value"],
        )
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        df = spark.createDataFrame(pdf)
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").asc(), F.col("event_id").asc()
        )
        aug = df
        for off in (1, 2):
            aug = aug.withColumn(f"__ref_prev{off}",
                                 F.lag("value", off).over(w))
            aug = aug.withColumn(f"__ref_next{off}",
                                 F.lead("value", off).over(w))

        shape = rng.choice(shapes)
        variables = [tok.rstrip("+?*") for tok in shape if tok != ">"]
        sql_def, ref_def = {}, {}
        nav_used = False
        for v in variables:
            kind = rng.choice(["plain", "prev", "next", "mix"])
            if kind == "plain" and not (
                v == variables[-1] and not nav_used
            ):
                typ = rng.choice(types)
                sql_def[v] = f"event_type = '{typ}'"
                ref_def[v] = F.col("event_type") == typ
                continue
            nav_used = True
            fn = rng.choice(["prev", "next"]) if kind == "mix" else (
                kind if kind != "plain" else "prev"
            )
            off = rng.choice([1, 1, 2])
            cmp = rng.choice(["<", ">=", ">"])
            nav_sql = (
                f"{fn.upper()}(value)" if off == 1
                else f"{fn.upper()}(value, {off})"
            )
            expr = f"value {cmp} {nav_sql}"
            ref = F.expr(f"value {cmp} __ref_{fn}{off}")
            if kind == "mix":
                typ = rng.choice(types)
                expr = f"event_type = '{typ}' AND {expr}"
                ref = (F.col("event_type") == typ) & ref
            sql_def[v] = expr
            ref_def[v] = ref
        pattern = " ".join(shape)
        # WITHIN is an engine kwarg — meaningless for (and rejected by)
        # the single-step classification path
        within = (
            "" if len(shape) == 1 else "WITHIN INTERVAL '10' MINUTE "
        )
        clause = (
            "MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts "
            f"PATTERN ({pattern}) {within}DEFINE "
            + ", ".join(f"{v} AS {e}" for v, e in sql_def.items()) + ")"
        )
        got_df = match_recognize_sql(df, clause)
        got = sorted(
            tuple(None if x is None else str(x) for x in r)
            for r in got_df.select(*sorted(got_df.columns)).collect()
        )
        if len(shape) == 1:
            want_df = (
                aug.where(
                    F.col("ts").isNotNull() & F.col("event_id").isNotNull()
                )
                .filter(ref_def[variables[0]])
                .select(
                    "user_id", F.col("ts").alias("ts_1"),
                    F.col("event_id").alias("id_1"),
                )
            )
        else:
            spec = compile_pattern(pattern, ref_def)
            want_df = match_sequence(
                aug, spec["steps"], ["user_id"], time_col="ts",
                id_col="event_id", within="10 minutes",
                optional_steps=spec["optional_steps"],
                strict_steps=spec["strict_steps"],
            )
        want = sorted(
            tuple(None if x is None else str(x) for x in r)
            for r in want_df.select(*sorted(got_df.columns)).collect()
        )
        if got != want:
            mismatches += 1
            print(f"[nav iter {it}] MISMATCH clause={clause}")
            print("  got ", got[:3], "...", len(got))
            print("  want", want[:3], "...", len(want))
        elif (it + 1) % 10 == 0:
            print(f"  ...nav {it + 1}/{n_iter} ok")
    print(f"fuzz_cep --nav: {n_iter} clauses, seed={seed}, "
          f"mismatches={mismatches}")
    return mismatches


# --- MEASURES composition fuzz (payload + SUBSET, one-row mode) --------------


def run_measures_fuzz(n_iter: int, seed: int) -> int:
    """Randomized differential for the MEASURES rewrite machinery:
    random payload traces and loop quantifiers, a random draw from the
    measure pool (loop payload aggregates, per-row payload refs, SUBSET
    union aggregates), ONE ROW PER MATCH — checked per match against a
    pandas recomputation over the SAME clause run bare with bind='all'
    (the full hop-id frame; the match set itself is fuzzed by run_fuzz,
    this isolates the measure compositions)."""
    import pandas as pd
    from pyspark.sql import SparkSession

    from rtfproc_spark.operators.pattern import match_recognize_sql

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("fuzz_cep_measures")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(seed)
    mismatches = 0

    def agg(vals, kind):
        if kind == "count":
            return len(vals)
        if not vals:
            return None
        return {"sum": sum, "min": min, "max": max,
                "avg": lambda v: sum(v) / len(v)}[kind](vals)

    POOL = [
        ("s_sum", "SUM(S.value)", lambda h, p: agg(h, "sum")),
        ("s_min", "MIN(S.value)", lambda h, p: agg(h, "min")),
        ("s_max", "MAX(S.value)", lambda h, p: agg(h, "max")),
        ("s_avg", "AVG(S.value)", lambda h, p: agg(h, "avg")),
        ("s_cnt", "COUNT(S.value)", lambda h, p: agg(h, "count")),
        ("p_val", "P.value", lambda h, p: p),
        ("w_sum", "SUM(W.value)", lambda h, p: agg(h + [p], "sum")),
        ("w_min", "MIN(W.value)", lambda h, p: agg(h + [p], "min")),
        ("w_max", "MAX(W.value)", lambda h, p: agg(h + [p], "max")),
        ("w_avg", "AVG(W.value)", lambda h, p: agg(h + [p], "avg")),
        ("w_cnt", "COUNT(W.value)", lambda h, p: agg(h + [p], "count")),
        ("n_w", "COUNT(W.*)", lambda h, p: len(h) + 1),
    ]
    for it in range(n_iter):
        t0 = datetime(2024, 1, 1)
        rows = [
            (i, rng.randrange(4),
             rng.choice(["view", "click", "signup", "purchase", "noise"]),
             t0 + timedelta(seconds=rng.randrange(3600)),
             float(rng.randrange(1, 50)))
            for i in range(350)
        ]
        pdf = pd.DataFrame(rows, columns=["event_id", "user_id",
                                          "event_type", "ts", "value"])
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        df = spark.createDataFrame(pdf)
        q = rng.choice(["+", "*", "{1,3}", "{2,}"])
        picks = rng.sample(POOL, rng.randrange(3, 7))
        clause = """
            MATCH_RECOGNIZE (
              PARTITION BY user_id ORDER BY ts
              MEASURES V.ts AS ts_1, V.event_id AS id_1, {meas}
              PATTERN (V S{q} P)
              SUBSET W = (S, P)
              WITHIN INTERVAL '30' MINUTE
              DEFINE V AS event_type = 'view',
                     S AS event_type IN ('click', 'signup'),
                     P AS event_type = 'purchase')"""
        got = {
            (r["user_id"], r["id_1"]): r
            for r in match_recognize_sql(df, clause.format(
                q=q, meas=", ".join(f"{e} AS {n}" for n, e, _ in picks)
            )).collect()
        }
        bare = match_recognize_sql(df, f"""
            MATCH_RECOGNIZE (
              PARTITION BY user_id ORDER BY ts
              PATTERN (V S{q} P)
              WITHIN INTERVAL '30' MINUTE
              DEFINE V AS event_type = 'view',
                     S AS event_type IN ('click', 'signup'),
                     P AS event_type = 'purchase')""", bind="all"
        ).collect()
        val = dict(zip(pdf["event_id"], pdf["value"]))
        ok = len(bare) == len(got)
        if not ok:
            mismatches += 1
            print(f"[meas iter {it}] match-set size diverges: "
                  f"{len(bare)} vs {len(got)}")
            continue
        for r in bare:
            g = got[(r["user_id"], r["id_1"])]
            hops = [val[i] for i in r["s_ids"]]
            pv = val[r["id_3"]]
            for n, _, ref in picks:
                want = ref(hops, pv)
                have = g[n]
                bad = (
                    (want is None) != (have is None)
                    or (want is not None and abs(have - want) > 1e-9)
                )
                if bad:
                    mismatches += 1
                    print(f"[meas iter {it}] {n}: {have} != {want} "
                          f"(hops={hops}, p={pv})")
                    break
        if (it + 1) % 10 == 0:
            print(f"  ...measures {it + 1}/{n_iter} ok")
    print(f"fuzz_cep --measures: {n_iter} clauses, seed={seed}, "
          f"mismatches={mismatches}")
    return mismatches

# --- quantified sequence group fuzz -------------------------------------------


def run_groups_fuzz(n_iter: int, seed: int) -> int:
    """Randomized differential for bounded sequence groups: random
    2-or-3-variable groups, random {m,n} bounds, greedy/reluctant mode,
    and (round 8, ~half the draws) a trailing CLOSER variable
    (`(A B){m,n} C`) — sometimes TWO suffix variables (`… C D`) — and
    (late round 8, ~half) a leading PREFIX anchor
    variable (`V (A B){m,n} [C]`), over random traces, vs a brute-force
    per-anchor simulation of the unrolled earliest-first sequences
    (largest/smallest feasible r wins; with a closer, feasibility
    includes the closer completing after rep r — the backtracking
    munch; with a prefix, the anchor is the prefix row and its binding
    is variant-independent)."""
    from pyspark.sql import SparkSession

    from rtfproc_spark.operators.pattern import match_recognize_sql

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("fuzz_cep_groups")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(seed)
    mismatches = 0
    for it in range(n_iter):
        t0 = datetime(2024, 1, 1)
        kvars = rng.choice([2, 2, 3])
        use_prefix = rng.random() < 0.5
        use_closer = rng.random() < 0.5
        use_suffix2 = use_closer and rng.random() < 0.4
        types = ["a", "b", "c"][:kvars] + ["x"] + (
            ["v"] if use_prefix else []
        ) + (["y"] if use_suffix2 else [])
        rows = [
            (i, rng.randrange(4), rng.choice(types),
             t0 + timedelta(seconds=rng.randrange(1200)))
            for i in range(280)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, user_id long, event_type string, ts timestamp",
        )
        mn = rng.choice([1, 1, 2])
        mx = min(mn + rng.choice([0, 1, 2]), 12 // kvars)
        greedy = rng.random() < 0.6
        within_s = rng.choice([300, 600])
        gvars = [t.upper() for t in types[:kvars]]
        closer_sql = (" X Y" if use_suffix2 else " X") if use_closer else ""
        closer_def = (
            (", X AS event_type = 'x', Y AS event_type = 'y'"
             if use_suffix2 else ", X AS event_type = 'x'")
            if use_closer else ""
        )
        prefix_sql = "V " if use_prefix else ""
        prefix_def = ", V AS event_type = 'v'" if use_prefix else ""
        clause = (
            "MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts "
            f"PATTERN ({prefix_sql}({' '.join(gvars)}){{{mn},{mx}}}"
            f"{'' if greedy else '?'}{closer_sql}) "
            f"WITHIN INTERVAL '{within_s}' SECOND DEFINE "
            + ", ".join(f"{v} AS event_type = '{v.lower()}'"
                        for v in gvars) + closer_def + prefix_def + ")"
        )
        out_df = match_recognize_sql(df, clause)
        got = {
            (r["user_id"], r["id_1"]): (
                r["n_reps"], r["end_id"],
                r["y_id"] if use_suffix2
                else (r["closer_id"] if use_closer else None),
            )
            for r in out_df.collect()
        }
        by_key: dict = {}
        for i, u, typ, ts in rows:
            by_key.setdefault(u, []).append((ts, i, typ))
        for v in by_key.values():
            v.sort()

        def sim(u, a_ts, a_id, r):
            # returns (last-group-row id, closer id) or None
            seq = (["v"] if use_prefix else []) + [
                t for _ in range(r) for t in types[:kvars]
            ]
            if use_closer:
                seq = seq + (["x", "y"] if use_suffix2 else ["x"])
            cur_ts = a_ts
            bound = a_ts + timedelta(seconds=within_s)
            cur_id = a_id
            end_id = None if use_prefix else a_id
            for want in seq[1:]:
                nxt = None
                for ts, i, typ in by_key[u]:
                    if ts > cur_ts and ts <= bound and typ == want:
                        nxt = (ts, i)
                        break
                if nxt is None:
                    return None
                cur_ts, cur_id = nxt
                if want not in ("x", "y", "v"):
                    end_id = cur_id
            return (end_id, cur_id if use_closer else None)

        anchor_t = "v" if use_prefix else types[0]
        want = {}
        for u, evs in by_key.items():
            for ts, i, typ in evs:
                if typ != anchor_t:
                    continue
                feas = [r for r in range(mn, mx + 1)
                        if sim(u, ts, i, r) is not None]
                if feas:
                    r = max(feas) if greedy else min(feas)
                    end_id, closer_id = sim(u, ts, i, r)
                    want[(u, i)] = (r, end_id, closer_id)
        if got != want:
            mismatches += 1
            print(f"[groups iter {it}] MISMATCH k={kvars} "
                  f"{{{mn},{mx}}} greedy={greedy}: "
                  f"{len(got)} vs {len(want)}")
        elif (it + 1) % 10 == 0:
            print(f"  ...groups {it + 1}/{n_iter} ok")
    print(f"fuzz_cep --groups: {n_iter} clauses, seed={seed}, "
          f"mismatches={mismatches}")
    return mismatches

def run_cross_fuzz(n_iter: int, seed: int) -> int:
    """Randomized CLEAN-ROOM differential for cross-variable DEFINE
    references (round-8 CrossPred): random payload traces, random shapes
    (pairs, triples, triples with TWO cross steps, loop-with-cross-closer),
    random comparators and reference targets (payload value, FIRST()
    sugar, prior ts), matched through the SQL clause vs an independent
    pure-Python greedy forward simulation (earliest-(ts,id) candidate
    satisfying local AND cross per candidate; PURE-ts open boundaries).
    Loop shapes keep body/closer types DISJOINT so greedy == reluctant
    and the sim stays closed-form."""
    import pandas as pd
    from pyspark.sql import SparkSession

    from rtfproc_spark.operators.pattern import match_recognize_sql

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("fuzz_cep_cross")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(seed)
    types = ["a", "b", "c", "d"]
    CMP = {"<": lambda x, y: x < y, ">": lambda x, y: x > y,
           "<=": lambda x, y: x <= y, ">=": lambda x, y: x >= y}
    mismatches = 0
    for it in range(n_iter):
        t0 = datetime(2024, 1, 1)
        rows = [
            (i, rng.randrange(4), rng.choice(types),
             t0 + timedelta(seconds=rng.randrange(1800)),
             float(rng.randrange(1, 40)))
            for i in range(350)
        ]
        pdf = pd.DataFrame(
            rows, columns=["event_id", "user_id", "event_type", "ts",
                           "value"],
        )
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        df = spark.createDataFrame(pdf)

        shape = rng.choice([
            ["V", "W"], ["V", "W", "X"], ["V", "W", "X"],
            ["V", "W+", "X"],
        ])
        has_loop = any(s.endswith("+") for s in shape)
        variables = [s.rstrip("+") for s in shape]
        # each variable gets a type (loop body disjoint from its closer)
        vtypes = {v: rng.choice(types) for v in variables}
        if has_loop:
            while vtypes["X"] == vtypes["W"]:
                vtypes["X"] = rng.choice(types)
        # pick the cross steps: always the LAST variable; in plain
        # triples sometimes the middle too
        cross_on = {variables[-1]: rng.choice(variables[:-1])}
        if shape == ["V", "W", "X"] and rng.random() < 0.4:
            cross_on["W"] = "V"
        if has_loop:
            cross_on = {"X": "V"}  # loop body cannot be referenced/cross
        sql_def = {}
        sims = {}  # var -> (type, [(cmp_fn, ref_var, field)])
        for v in variables:
            conds = []
            expr = f"event_type = '{vtypes[v]}'"
            if v in cross_on:
                ref = cross_on[v]
                cmp = rng.choice(list(CMP))
                form = rng.choice(["plain", "first", "ts"])
                if form == "ts":
                    expr += f" AND ts > {ref}.ts"  # trivially true — the
                    # direct ts_<j> lowering path must still compose
                    conds.append((CMP[">"], ref, "ts"))
                else:
                    refex = (f"FIRST({ref}.value)" if form == "first"
                             else f"{ref}.value")
                    expr += f" AND value {cmp} {refex}"
                    conds.append((CMP[cmp], ref, "value"))
            sql_def[v] = expr
            sims[v] = (vtypes[v], conds)
        pattern = " ".join(shape)
        clause = (
            "MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts "
            f"PATTERN ({pattern}) WITHIN INTERVAL '10' MINUTE DEFINE "
            + ", ".join(f"{v} AS {e}" for v, e in sql_def.items()) + ")"
        )
        got_df = match_recognize_sql(df, clause)
        id_cols = [c for c in got_df.columns
                   if c.startswith("id_") or c.startswith("n_")]
        got = sorted(
            (r["user_id"], *[r[c] for c in sorted(id_cols)])
            for r in got_df.collect()
        )

        # clean-room sim ---------------------------------------------------
        within = timedelta(minutes=10)
        by_key: dict = {}
        for r in rows:
            by_key.setdefault(r[1], []).append(r)
        want = []
        for key, evs in by_key.items():
            evs = sorted(evs, key=lambda r: (r[3], r[0]))
            for a in (r for r in evs if r[2] == sims["V"][0]):
                horizon = a[3] + within
                bound = {"V": a}
                prev = a
                ok = True
                out_extra = []
                for s in shape[1:]:
                    v = s.rstrip("+")
                    typ, conds = sims[v]

                    def _pass(e):
                        return all(
                            fn(e[4] if fld == "value" else e[3],
                               bound[rv][4] if fld == "value"
                               else bound[rv][3])
                            for fn, rv, fld in conds
                        )

                    if s.endswith("+"):
                        # joint loop+closer: earliest closer candidate
                        # (local+cross) whose PURE-ts open interval back
                        # to prev holds >= 1 body event; body/closer
                        # types disjoint => greedy == reluctant
                        ctyp, cconds = sims[shape[-1].rstrip("+")]
                        closer = None
                        n = 0
                        for e in evs:
                            if not (prev[3] < e[3] <= horizon):
                                continue
                            if e[2] != ctyp or not all(
                                fn(e[4] if fld == "value" else e[3],
                                   bound[rv][4] if fld == "value"
                                   else bound[rv][3])
                                for fn, rv, fld in cconds
                            ):
                                continue
                            cnt = sum(
                                1 for b in evs
                                if b[2] == typ and prev[3] < b[3] < e[3]
                            )
                            if cnt >= 1:
                                closer, n = e, min(cnt, cnt)
                                break
                        if closer is None:
                            ok = False
                            break
                        bound[shape[-1].rstrip("+")] = closer
                        out_extra.append(("n_w", n))
                        prev = closer
                        break  # loop consumed the closer — pattern done
                    cand = next(
                        (e for e in evs
                         if e[2] == typ and prev[3] < e[3] <= horizon
                         and _pass(e)),
                        None,
                    )
                    if cand is None:
                        ok = False
                        break
                    bound[v] = cand
                    prev = cand
                if not ok:
                    continue
                if has_loop:
                    want.append((key, a[0], bound["X"][0],
                                 dict(out_extra)["n_w"]))
                else:
                    want.append((key, *[bound[v][0] for v in variables]))
        # got tuple order: sorted(id_cols) is [id_1, id_2, (id_3)] for
        # plain shapes and [id_1, id_3, n_w] for the loop shape — the
        # sim emits the same order
        want = sorted(want)
        if got != want:
            mismatches += 1
            print(f"[cross iter {it}] MISMATCH clause={clause}")
            print("  got ", got[:4], "...", len(got))
            print("  want", want[:4], "...", len(want))
        elif (it + 1) % 10 == 0:
            print(f"  ...cross {it + 1}/{n_iter} ok")
    print(f"fuzz_cep --cross: {n_iter} clauses, seed={seed}, "
          f"mismatches={mismatches}")
    return mismatches


def run_navstream_fuzz(n_iter: int, seed: int) -> int:
    """Randomized stream==batch differential for PREV navigation in
    STREAM DEFINEs (round 8, buffered mode): random shapes mixing
    literal and nav variables (pairs, literal-anchored V-shapes with nav
    LOOP BODIES, triples), random comparators/offsets (1-2), replayed
    through a REAL 4-file availableNow stream (PREV must cross
    micro-batch boundaries via the persisted history tail) vs the same
    clause on the full batch frame."""
    import os
    import shutil
    import tempfile
    import time as _time

    import pandas as pd
    from pyspark.sql import SparkSession

    from rtfproc_spark.operators.pattern import match_recognize_sql

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("fuzz_cep_navstream")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(seed)
    mismatches = 0
    for it in range(n_iter):
        t0 = datetime(2024, 1, 1)
        rows = sorted(
            ((i, rng.randrange(4), rng.choice(["a", "b", "c"]),
              t0 + timedelta(seconds=rng.randrange(3600)),
              float(rng.randrange(1, 40))) for i in range(400)),
            key=lambda r: (r[3], r[0]),
        )
        pdf = pd.DataFrame(rows, columns=["event_id", "user_id",
                                          "event_type", "ts", "value"])
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        shape = rng.choice(["DU", "SD+U", "DUP"])
        cmp1 = rng.choice(["<", "<=", ">", ">="])
        cmp2 = rng.choice(["<", "<=", ">", ">="])
        off = rng.choice([1, 1, 2])
        nav1 = f"value {cmp1} PREV(value)"
        nav2 = (f"value {cmp2} PREV(value, {off})" if off > 1
                else f"value {cmp2} PREV(value)")
        if shape == "DU":
            pat, defs = "D U", f"D AS {nav1}, U AS {nav2}"
        elif shape == "SD+U":
            pat = "S D+ U"
            defs = (f"S AS event_type = 'a', D AS {nav1}, "
                    f"U AS event_type = 'b' AND {nav2}")
        else:
            pat = "D U P"
            defs = (f"D AS {nav1}, U AS {nav2}, "
                    "P AS event_type = 'c'")
        clause = (
            "MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts "
            f"PATTERN ({pat}) WITHIN INTERVAL '20' MINUTE "
            f"DEFINE {defs})"
        )
        d = tempfile.mkdtemp(prefix="navstream_fuzz_")
        try:
            src = os.path.join(d, "src")
            os.makedirs(src)
            now = _time.time()
            m = len(pdf)
            for f in range(4):
                p = os.path.join(src, f"part-{f}.parquet")
                pdf.iloc[f * m // 4:(f + 1) * m // 4].to_parquet(
                    p, index=False)
                os.utime(p, (now + f, now + f))
            flush = pd.DataFrame(
                [(99999, 0, "zz", t0 + timedelta(hours=5), 0.0)],
                columns=pdf.columns,
            )
            flush["ts"] = flush["ts"].astype("datetime64[us]")
            p = os.path.join(src, "part-9.parquet")
            flush.to_parquet(p, index=False)
            os.utime(p, (now + 9, now + 9))
            stream = (
                spark.readStream.schema(
                    "event_id long, user_id long, event_type string, "
                    "ts timestamp, value double")
                .option("maxFilesPerTrigger", 1).parquet(src)
            )
            out = match_recognize_sql(stream, clause, ordered=False,
                                      watermark="10 minutes")
            sink = os.path.join(d, "out")
            q = (
                out.writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", os.path.join(d, "ckpt"))
                .outputMode("append").trigger(availableNow=True).start()
            )
            q.awaitTermination()
            sunk = spark.read.parquet(sink)
            cols = sorted(sunk.columns)
            got = sorted(
                tuple(str(r[c]) for c in cols) for r in sunk.collect()
            )
            full = pd.concat([pdf, flush], ignore_index=True)
            bdf = match_recognize_sql(spark.createDataFrame(full), clause)
            want = sorted(
                tuple(str(r[c]) for c in cols)
                for r in bdf.select(*cols).collect()
            )
            if got != want:
                mismatches += 1
                print(f"[navstream iter {it}] MISMATCH clause={clause}")
                print("  got ", len(got), got[:2])
                print("  want", len(want), want[:2])
            elif (it + 1) % 4 == 0:
                print(f"  ...navstream {it + 1}/{n_iter} ok")
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(f"fuzz_cep --navstream: {n_iter} clauses, seed={seed}, "
          f"mismatches={mismatches}")
    return mismatches


def run_crossstream_fuzz(n_iter: int, seed: int) -> int:
    """Randomized stream==batch differential for CROSS-VARIABLE DEFINE
    references on STREAMS (round 8, codec v6): random shapes (pairs,
    triples, two-cross triples, loop-with-cross-closer), random
    comparators and reference targets (numeric payload only — the
    stream-valid subset), replayed through a REAL 4-file availableNow
    stream in BOTH delivery modes (buffered for every iteration —
    captured values must cross micro-batch boundaries through CEP state;
    every 3rd also ordered) vs the same clause on the full batch frame
    (the CrossPred join path, itself differentialed by --cross)."""
    import os
    import shutil
    import tempfile
    import time as _time

    import pandas as pd
    from pyspark.sql import SparkSession

    from rtfproc_spark.operators.pattern import match_recognize_sql

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("fuzz_cep_crossstream")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(seed)
    types = ["a", "b", "c", "d"]
    mismatches = 0
    for it in range(n_iter):
        t0 = datetime(2024, 1, 1)
        rows = sorted(
            ((i, rng.randrange(4), rng.choice(types),
              t0 + timedelta(seconds=rng.randrange(1800)),
              float(rng.randrange(1, 40)), float(rng.randrange(1, 40)))
             for i in range(350)),
            key=lambda r: (r[3], r[0]),
        )
        pdf = pd.DataFrame(rows, columns=["event_id", "user_id",
                                          "event_type", "ts", "value",
                                          "score"])
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        shape = rng.choice([
            ["V", "W"], ["V", "W", "X"], ["V", "W", "X"],
            ["V", "W+", "X"],
        ])
        has_loop = any(s.endswith("+") for s in shape)
        variables = [s.rstrip("+") for s in shape]
        vtypes = {v: rng.choice(types) for v in variables}
        if has_loop:
            while vtypes["X"] == vtypes["W"]:
                vtypes["X"] = rng.choice(types)
        cross_on = {variables[-1]: rng.choice(variables[:-1])}
        if shape == ["V", "W", "X"] and rng.random() < 0.4:
            cross_on["W"] = "V"
        if has_loop:
            cross_on = {"X": "V"}  # loop body cannot be referenced/cross
        sql_def = {}
        for v in variables:
            expr = f"event_type = '{vtypes[v]}'"
            if v in cross_on:
                cmp = rng.choice(["<", ">", "<=", ">="])
                # reversed-side syntax half the time (the _REV regex)
                if rng.random() < 0.5:
                    expr += f" AND value {cmp} {cross_on[v]}.value"
                else:
                    flip = {"<": ">", ">": "<", "<=": ">=", ">=": "<="}
                    expr += f" AND {cross_on[v]}.value {flip[cmp]} value"
            sql_def[v] = expr
        if rng.random() < 0.5:
            # late round 8: a row-local CONSTANT comparison on a random
            # variable (incl. loop bodies) composes with everything else
            lv = rng.choice(variables + (["W"] if has_loop else []))
            # rhs: a constant, or (col-to-col) the second payload column
            rhs = rng.choice([str(rng.randrange(5, 35)), "score"])
            sql_def[lv] += (
                f" AND value {rng.choice(['<', '>', '<=', '>='])} {rhs}"
            )
        pattern = " ".join(shape)
        if shape == ["V", "W"] and rng.random() < 0.3:
            # strict-contiguity marker on the cross-conditioned pair: the
            # key's very next event must pass vocab AND cross or die
            pattern = "V > W"
        clause = (
            "MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts "
            f"PATTERN ({pattern}) WITHIN INTERVAL '10' MINUTE DEFINE "
            + ", ".join(f"{v} AS {e}" for v, e in sql_def.items()) + ")"
        )
        modes = [("buffered", dict(ordered=False, watermark="5 minutes"))]
        if it % 3 == 0:
            modes.append(("ordered", {}))
        d = tempfile.mkdtemp(prefix="crossstream_fuzz_")
        try:
            src = os.path.join(d, "src")
            os.makedirs(src)
            now = _time.time()
            m = len(pdf)
            for f in range(4):
                p = os.path.join(src, f"part-{f}.parquet")
                pdf.iloc[f * m // 4:(f + 1) * m // 4].to_parquet(
                    p, index=False)
                os.utime(p, (now + f, now + f))
            flush = pd.DataFrame(
                [(99999, 0, "zz", t0 + timedelta(hours=5), 0.0, 0.0)],
                columns=pdf.columns,
            )
            flush["ts"] = flush["ts"].astype("datetime64[us]")
            p = os.path.join(src, "part-9.parquet")
            flush.to_parquet(p, index=False)
            os.utime(p, (now + 9, now + 9))
            full = pd.concat([pdf, flush], ignore_index=True)
            bdf = match_recognize_sql(spark.createDataFrame(full), clause)
            cols = sorted(bdf.columns)
            want = sorted(
                tuple(str(r[c]) for c in cols)
                for r in bdf.select(*cols).collect()
            )
            for mode, kw in modes:
                stream = (
                    spark.readStream.schema(
                        "event_id long, user_id long, event_type string, "
                        "ts timestamp, value double, score double")
                    .option("maxFilesPerTrigger", 1).parquet(src)
                )
                out = match_recognize_sql(stream, clause, **kw)
                sink = os.path.join(d, f"out_{mode}")
                q = (
                    out.writeStream.format("parquet")
                    .option("path", sink)
                    .option("checkpointLocation",
                            os.path.join(d, f"ckpt_{mode}"))
                    .outputMode("append").trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                sunk = spark.read.parquet(sink)
                got = sorted(
                    tuple(str(r[c]) for c in cols)
                    for r in sunk.select(*cols).collect()
                )
                if got != want:
                    mismatches += 1
                    print(f"[crossstream iter {it}/{mode}] MISMATCH "
                          f"clause={clause}")
                    print("  got ", len(got), got[:2])
                    print("  want", len(want), want[:2])
            if (it + 1) % 4 == 0:
                print(f"  ...crossstream {it + 1}/{n_iter} ok")
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(f"fuzz_cep --crossstream: {n_iter} clauses, seed={seed}, "
          f"mismatches={mismatches}")
    return mismatches


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260817
    if "--crossstream" in sys.argv:
        sys.exit(1 if run_crossstream_fuzz(n, seed) else 0)
    if "--navstream" in sys.argv:
        sys.exit(1 if run_navstream_fuzz(n, seed) else 0)
    if "--cross" in sys.argv:
        sys.exit(1 if run_cross_fuzz(n, seed) else 0)
    if "--nav" in sys.argv:
        sys.exit(1 if run_nav_fuzz(n, seed) else 0)
    if "--measures" in sys.argv:
        sys.exit(1 if run_measures_fuzz(n, seed) else 0)
    if "--groups" in sys.argv:
        sys.exit(1 if run_groups_fuzz(n, seed) else 0)
    se = 8
    if "--stream-every" in sys.argv:
        se = int(sys.argv[sys.argv.index("--stream-every") + 1])
    sys.exit(1 if run_fuzz(n, seed, se, dense="--dense" in sys.argv) else 0)




