"""Text-analysis column functions for training-data pipelines.

All native ``pyspark.sql.functions`` expressions (JVM-side, whole-stage
codegen) — no Python in the hot path. Each returns a Column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny public stopword marker sets for the n-gram language heuristic.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "los"],
}

_STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "that"]


def token_count(col) -> Column:
    """Whitespace token count (split on single spaces, like the oracle)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(c, " "))


# boundary split between word chars and non-word chars; explicit ASCII
# classes (incl. whitespace) so Java regex (Spark) and Python re (the
# staged-expected oracle) tokenize identically — \w and \s are ASCII in
# Java but unicode-aware in Python.
_WS = " \\t\\n\\x0B\\f\\r"
BPE_SPLIT_RE = (
    rf"[{_WS}]+"
    rf"|(?<=[A-Za-z0-9_])(?=[^A-Za-z0-9_{_WS}])"
    rf"|(?<=[^A-Za-z0-9_{_WS}])(?=[A-Za-z0-9_])"
)


def bpe_ish_token_count(col) -> Column:
    """A BPE-ish proxy: word pieces + digits + punctuation clusters."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), BPE_SPLIT_RE))


def quality_score(col) -> Column:
    """Length/punct/stopword heuristic in [0,1] (pipeline quality filter)."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    n_tokens = token_count(c)
    avg_tok = n_chars / F.greatest(n_tokens, F.lit(1))
    punct = F.length(F.regexp_replace(c, r"[^\.,;:!?]", "")) / F.greatest(
        n_chars, F.lit(1)
    )
    stop_hits = sum(
        (
            F.when(c.rlike(rf"(^|\s){w}(\s|$)"), F.lit(1)).otherwise(F.lit(0))
            for w in _STOPWORDS
        ),
        F.lit(0),
    )
    return F.round(
        F.least(
            F.lit(1.0),
            (F.least(avg_tok, F.lit(8.0)) / 8.0) * 0.4
            + (1.0 - F.least(punct * 5.0, F.lit(1.0))) * 0.3
            + (stop_hits / float(len(_STOPWORDS))) * 0.3,
        ),
        4,
    )


def lang_id(col) -> Column:
    """Marker-word language heuristic -> best-scoring language code."""
    c = F.col(col) if isinstance(col, str) else col
    scores = []
    for lang, words in _LANG_MARKERS.items():
        score = sum(
            (F.regexp_count(c, F.lit(rf"(?i)\b{w}\b")) for w in words), F.lit(0)
        )
        scores.append(F.struct(score.alias("s"), F.lit(lang).alias("l")))
    best = F.array_max(F.array(*scores))
    return F.when(best.getField("s") > 0, best.getField("l")).otherwise(F.lit("und"))


def fingerprint(col) -> Column:
    """Document fingerprint: 64-bit hash of whitespace-normalized text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))
