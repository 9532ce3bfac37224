"""Declarative pattern-string front end for the CEP matchers — the
MATCH_RECOGNIZE ``PATTERN (...)`` / ``DEFINE`` surface compiled onto
:func:`rtfproc_spark.operators.cep.match_sequence` and its streaming twin
(reference anchor: the north rule's MATCH_RECOGNIZE-style CEP mandate;
the reference repo itself has no pattern language — ``src/rtfproc.c`` is
a byte matcher — so this layer is pure task-mandate surface).

Grammar (whitespace-separated tokens)::

    pattern   := element ((" " | " > ") element)*
    element   := (var | group) quant?
    group     := "(" var ("|" var)* ")"          -- alternation (B|C)
    quant     := "?" | loop | loop "?"           -- trailing "?" = reluctant
    loop      := "+" | "*" | "{m}" | "{m,}" | "{m,n}"
    var       := [A-Za-z_][A-Za-z0-9_]*

- bare var/group: one required step (``followedBy`` — relaxed contiguity,
  the matcher's default);
- ``>`` before an element: STRICT contiguity for that element
  (MATCH_RECOGNIZE's default adjacency / Flink ``next()``) — maps to
  ``strict_steps``;
- ``X?``: optional step (``optional_steps``);
- ``X+`` / ``X*`` / ``X{m,n}`` / ``X{m,}`` / ``X{m}``: Kleene loop —
  a :class:`LoopStep` (sequence-advancing; the matcher's position rules
  decide whether anchor/middle/final loops are legal). Loops default to
  MATCH_RECOGNIZE's GREEDY munch (``LoopStep(greedy=True)``); a trailing
  ``?`` (``X+?``, ``X{1,3}?``) selects the reluctant quantifier. The
  distinction only bites when the loop body and its closer overlap —
  final-position loops have no closer, so they are always emitted
  reluctant (the flag would be inert and the matcher rejects it there).
  ``X??`` (reluctant optional) is rejected: the matcher's optional step
  is inherently greedy no-lookahead;
- quantified groups (``(B|C)+``) become alternation loop bodies.

``define`` maps each variable to its predicate: a ``pyspark.sql.Column``
(batch — e.g. ``F.col("event_type") == "click"``) or a literal string
(stream — the ``type_col`` value). Mixing the two in one dict is
rejected. Loop steps are named after the lowercased variable (the
group's variables joined by ``_``), so measures come out as
``n_<name>`` etc.; ``bind`` sets the loop binding (scalar for all loops,
or a per-name dict).
"""

from __future__ import annotations

import re
from dataclasses import replace

from pyspark.sql import Column, DataFrame

from .cep import LoopStep, match_sequence, match_sequence_stream

_TOKEN = re.compile(
    r"^(?:(?P<var>[A-Za-z_]\w*)|\((?P<alts>[A-Za-z_]\w*(?:\|[A-Za-z_]\w*)*)\))"
    r"(?P<q>\?|\+|\*|\{\d+(?:,\d*)?\})?(?P<lazy>\?)?$"
)


def _parse_quant(
    q: str | None, lazy: str | None
) -> tuple[str, int, int | None, bool]:
    """-> (kind, min_n, max_n, greedy) with kind in {"one", "opt",
    "loop"}. Loops are greedy unless the reluctant ``?`` suffix is
    present (MATCH_RECOGNIZE's default munch)."""
    if q is None:
        return ("one", 1, 1, False)
    if q == "?":
        if lazy:
            raise ValueError(
                "reluctant optional (??) is not supported — the matcher's "
                "optional step is inherently greedy no-lookahead"
            )
        return ("opt", 0, 1, False)
    greedy = not lazy
    if q == "+":
        return ("loop", 1, None, greedy)
    if q == "*":
        return ("loop", 0, None, greedy)
    m = re.fullmatch(r"\{(\d+)(?:,(\d*))?\}", q)
    lo = int(m.group(1))
    if m.group(2) is None:       # {m} — exactly m
        return ("loop", lo, lo, greedy)
    if m.group(2) == "":         # {m,} — at least m
        return ("loop", lo, None, greedy)
    hi = int(m.group(2))
    if hi < lo:
        raise ValueError(f"quantifier {q}: max < min")
    return ("loop", lo, hi, greedy)


def compile_pattern(
    pattern: str,
    define: dict,
    bind=True,
) -> dict:
    """Compile a pattern string + DEFINE map into matcher kwargs:
    ``{"steps": [...], "optional_steps": set|None, "strict_steps":
    set|None, "step_names": [...]}``. ``steps`` entries are Columns /
    Column lists / :class:`LoopStep` when ``define`` holds Columns
    (feed :func:`match_sequence`), or literals / tuples / value-bearing
    LoopSteps when it holds strings (feed
    :func:`match_sequence_stream`'s ``step_values``). Structural
    validation (which positions may be optional/loop/strict) is the
    matcher's job — this layer only parses."""
    if not define:
        raise ValueError("define must map every pattern variable")
    kinds = {isinstance(v, Column) for v in define.values()}
    if len(kinds) != 1:
        raise ValueError(
            "define must be all-Column (batch) or all-literal (stream), "
            "not a mix"
        )
    is_batch = kinds.pop()
    toks = pattern.split()
    if not toks:
        raise ValueError("empty pattern")
    steps: list = []
    names: list[str] = []
    optional: set[int] = set()
    strict: set[int] = set()
    expect_strict = False
    for tok in toks:
        if tok == ">":
            if not steps or expect_strict:
                raise ValueError(
                    "'>' (strict contiguity) must sit between two pattern "
                    "elements"
                )
            expect_strict = True
            continue
        m = _TOKEN.fullmatch(tok)
        if not m:
            raise ValueError(f"bad pattern token: {tok!r}")
        variables = (
            [m.group("var")] if m.group("var") else m.group("alts").split("|")
        )
        missing = [v for v in variables if v not in define]
        if missing:
            raise ValueError(f"pattern variable(s) not in define: {missing}")
        preds = [define[v] for v in variables]
        kind, lo, hi, greedy = _parse_quant(m.group("q"), m.group("lazy"))
        name = "_".join(v.lower() for v in variables)
        pos = len(steps) + 1
        if kind == "loop":
            b = bind.get(name, True) if isinstance(bind, dict) else bind
            if is_batch:
                steps.append(
                    LoopStep(
                        pred=preds[0] if len(preds) == 1 else preds,
                        min_n=lo, max_n=hi, bind=b, name=name,
                        greedy=greedy,
                    )
                )
            else:
                steps.append(
                    LoopStep(
                        value=preds[0] if len(preds) == 1 else tuple(preds),
                        min_n=lo, max_n=hi, bind=b, name=name,
                        greedy=greedy,
                    )
                )
        else:
            if kind == "opt":
                optional.add(pos)
            if is_batch:
                steps.append(preds[0] if len(preds) == 1 else preds)
            else:
                steps.append(preds[0] if len(preds) == 1 else tuple(preds))
        if expect_strict:
            strict.add(pos)
            expect_strict = False
        names.append(name)
    if expect_strict:
        raise ValueError("pattern ends with a dangling '>'")
    if steps and isinstance(steps[-1], LoopStep) and steps[-1].greedy:
        # a FINAL loop has no closer: greedy == reluctant, and the
        # matcher rejects an explicit greedy flag there — emit reluctant
        steps[-1] = replace(steps[-1], greedy=False)
    return {
        "steps": steps,
        "optional_steps": optional or None,
        "strict_steps": strict or None,
        "step_names": names,
    }


def match_recognize(
    df: DataFrame,
    pattern: str,
    define: dict[str, Column],
    key_cols: list[str],
    **kwargs,
) -> DataFrame:
    """One-call MATCH_RECOGNIZE-style batch matching::

        match_recognize(
            events,
            "V (C|S)+ > P",
            define={"V": F.col("event_type") == "view",
                    "C": F.col("event_type") == "click",
                    "S": F.col("event_type") == "signup",
                    "P": F.col("event_type") == "purchase"},
            key_cols=["user_id"], within="2 hours",
        )

    compiles the pattern (``bind=`` may be passed through for loop
    measures) and delegates every other kwarg to
    :func:`~rtfproc_spark.operators.cep.match_sequence` — ``within``,
    ``after_match``, ``forbid``, ``counts``, ``contiguous`` …"""
    spec = compile_pattern(pattern, define, bind=kwargs.pop("bind", True))
    return match_sequence(
        df,
        spec["steps"],
        key_cols,
        optional_steps=spec["optional_steps"],
        strict_steps=spec["strict_steps"],
        **kwargs,
    )


def match_recognize_stream(
    stream: DataFrame,
    pattern: str,
    define: dict[str, str],
    key_col: str = "user_id",
    **kwargs,
) -> DataFrame:
    """Streaming twin of :func:`match_recognize`: ``define`` maps
    variables to ``type_col`` literals and the compiled spec feeds
    :func:`~rtfproc_spark.operators.cep.match_sequence_stream`."""
    spec = compile_pattern(pattern, define, bind=kwargs.pop("bind", True))
    return match_sequence_stream(
        stream,
        spec["steps"],
        key_col=key_col,
        optional_steps=spec["optional_steps"],
        strict_steps=spec["strict_steps"],
        **kwargs,
    )
