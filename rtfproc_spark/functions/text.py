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


def repetition_quality(col) -> list[Column]:
    """Gopher-style repetition/shape signals (public filtering rules from
    the Gopher/MassiveText and C4 papers), all native expressions:

    - ``n_words``           whitespace tokens
    - ``mean_word_len``     non-space chars / words
    - ``frac_alpha_words``  fraction of words containing a letter
    - ``dup_sent_frac``     1 - distinct/total over '. '-split sentences
    - ``quality_pass``      the conjunctive filter a pipeline would apply

    Thresholds follow the published rules (3 <= mean word length <= 10,
    >= 80% alphabetic words, < 30% duplicate sentences).
    """
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(c, " ")
    n_words = F.size(words)
    mean_wl = F.round(
        F.length(F.replace(c, F.lit(" "), F.lit(""))) / F.greatest(n_words, F.lit(1)),
        4,
    )
    frac_alpha = F.round(
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
        / F.greatest(n_words, F.lit(1)),
        4,
    )
    sents = F.split(c, r"\. ")
    dup_sent = F.round(
        1 - F.size(F.array_distinct(sents)) / F.greatest(F.size(sents), F.lit(1)), 4
    )
    quality_pass = (
        (mean_wl >= 3) & (mean_wl <= 10) & (frac_alpha >= 0.8) & (dup_sent < 0.3)
    )
    return [
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        frac_alpha.alias("frac_alpha_words"),
        dup_sent.alias("dup_sent_frac"),
        quality_pass.alias("quality_pass"),
    ]


# PII scrub patterns, written in the common Java-regex/RE2 subset (explicit
# character classes, no \b or lookaround, no \s — Java's includes \x0B,
# RE2's does not) so Spark and the DuckDB oracle replace identically.
# Order matters and is part of the contract: emails first (their digits
# must not be half-eaten by the phone pattern), then URLs, then phones.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("url", r"https?://[^ \t\n\r]+", "<URL>"),
    ("phone", r"\+?[0-9][0-9()\- ]{6,}[0-9]", "<PHONE>"),
]


def scrub_pii(col) -> Column:
    """Replace emails, URLs and phone-shaped digit runs with typed tags —
    the standard pre-training privacy scrub, all JVM-side regexp_replace
    (whole-stage codegen; no Python in the hot path)."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def hash_split(col, salt: str = "split", buckets: int = 100) -> Column:
    """Deterministic split bucket in [0, buckets): pmod(xxhash64(salt, id)).

    The standard train/val/test assignment for a training corpus — a pure
    function of the id (stable across runs, partitions and cluster sizes;
    no sampling state to coordinate), salted so independent splits don't
    correlate. Downstream: bucket < 80 -> train, < 90 -> val, else test."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(F.lit(salt), c), F.lit(buckets))


def split_name(bucket: Column, train: int = 80, val: int = 90) -> Column:
    """Map a hash_split bucket to its split label."""
    return (
        F.when(bucket < train, F.lit("train"))
        .when(bucket < val, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def pack_bins(
    df,
    size_col: str = "n_tokens",
    order_col: str = "doc_id",
    group_cols: list[str] | None = None,
    budget: int = 512,
):
    """Sequence-packing plan: assign each document to a pack bin such that
    the RUNNING token total before the document, within its group, fits the
    budget — ``bin = floor(cumsum_before / budget)``. The distributed
    analogue of greedy concat-until-full packing for LLM pretraining
    batches: one window shuffle per group, deterministic given the order
    column, and the bin id is what a writer partitions by. (True bin
    packing is NP-hard and inherently sequential; running-total packing is
    the standard scalable approximation — documents larger than the budget
    get a bin of their own plus spillover, exactly like the sequential
    packer fed in the same order.)"""
    from pyspark.sql.window import Window

    group_cols = group_cols or []
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(size_col).over(w)
    return df.withColumn(
        "pack_bin", F.floor((cum - F.col(size_col)) / F.lit(budget))
    )
