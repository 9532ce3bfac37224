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


def dup_ngram_coverage(words: Column, text_len: Column, n: int) -> Column:
    """Fraction of the text's characters covered by its most-repeated
    n-gram (the Gopher top-n-gram duplicate-coverage rule): among all
    word n-grams, ``max(occurrences x gram_chars) / text_chars``.

    Where the paper says "the most common n-gram" (ambiguous under count
    ties), this takes the n-gram maximizing covered characters — a
    deterministic refinement with the same filtering intent.

    Scale shape: fully per-row — build the gram array, ``array_sort`` it,
    then ONE ``aggregate`` pass counts equal-adjacent runs and tracks the
    best ``run x len``. No explode, no shuffle, no Python: the rule costs
    O(grams log grams) inside whole-stage projection, which is the shape
    you want when the corpus is 100 TB (an explode + groupBy(doc, gram)
    formulation would shuffle every gram string)."""
    grams = word_ngrams(words, n)
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, g):
        run = (
            F.when(acc["prev"].eqNullSafe(g), acc["run"] + F.lit(1))
            .otherwise(F.lit(1))
            .cast("long")
        )
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run * F.length(g)).cast("long").alias("best"),
        )

    best = F.aggregate(F.array_sort(grams), acc0, step, lambda a: a["best"])
    # occurrences x gram_chars double-counts characters shared by
    # OVERLAPPING occurrences ("a a a a": 3 x 3 / 7 would read 1.29), so it
    # is stricter than Gopher's distinct-character-position coverage; the
    # clamp keeps the value interpretable as a fraction when comparing
    # against the published thresholds.
    frac = F.least(best / F.greatest(text_len, F.lit(1)), F.lit(1.0))
    return F.round(frac, 4)


# Gopher top-n-gram coverage thresholds (fraction above which the document
# is filtered), per the published MassiveText rules.
DUP_NGRAM_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}


def repetition_quality(col) -> list[Column]:
    """Gopher-style repetition/shape signals (public filtering rules from
    the Gopher/MassiveText and C4 papers), all native expressions:

    - ``n_words``           whitespace tokens
    - ``mean_word_len``     non-space chars / words
    - ``frac_alpha_words``  fraction of words containing a letter
    - ``dup_sent_frac``     1 - distinct/total over '. '-split sentences
    - ``dup_{2,3,4}gram_frac``  top-n-gram duplicate char coverage
    - ``quality_pass``      the conjunctive filter a pipeline would apply

    Thresholds follow the published rules (3 <= mean word length <= 10,
    >= 80% alphabetic words, < 30% duplicate sentences, top-2/3/4-gram
    coverage <= 0.20/0.18/0.16).
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
    covs = {
        n: dup_ngram_coverage(words, F.length(c), n)
        for n in DUP_NGRAM_THRESHOLDS
    }
    quality_pass = (
        (mean_wl >= 3) & (mean_wl <= 10) & (frac_alpha >= 0.8) & (dup_sent < 0.3)
    )
    for n, thr in DUP_NGRAM_THRESHOLDS.items():
        quality_pass = quality_pass & (covs[n] <= thr)
    return [
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        frac_alpha.alias("frac_alpha_words"),
        dup_sent.alias("dup_sent_frac"),
        *[covs[n].alias(f"dup_{n}gram_frac") for n in DUP_NGRAM_THRESHOLDS],
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
    num_shards: int = 32,
    shard_expr=None,
):
    """Sequence-packing plan: assign each document to a pack bin such that
    the RUNNING token total before the document, within its (group, shard),
    fits the budget — ``bin = cumsum_before div budget``, offset so bins are
    globally unique per group. The distributed analogue of greedy
    concat-until-full packing for LLM pretraining batches; the bin id is
    what a writer partitions by. (True bin packing is NP-hard and inherently
    sequential; running-total packing is the standard scalable
    approximation — documents larger than the budget get a bin of their own
    plus spillover, exactly like a sequential packer fed the same order.)

    TWO-PHASE for scale: a window partitioned by group alone is a
    scale-killer — one task per group must sort-and-scan that group's
    ENTIRE corpus (at 100 TB, English is one 80 TB task). Instead:

    1. shard each group by a pure function of the order column
       (``shard_expr``, default ``pmod(xxhash64(order_col), num_shards)``)
       and run the running-total window within (group, shard) — per-task
       work is bounded by the shard size, tuned via ``num_shards``;
    2. offset each shard's local bins by the exclusive prefix sum of
       per-shard bin counts. The count needs no second pass over the window
       output: local bins are monotone in the order column, so
       ``bins_used = (total - size_of_last_doc) div budget + 1`` — one
       hash aggregate (sum + max_by) straight off the source, producing a
       groups x shards table that broadcasts back onto the packed rows.

    Result: deterministic given (order_col, shard_expr, num_shards), two
    bounded shuffles (one sort within shards, one tiny aggregate), no
    single-task group scan. ``order_col`` must be unique within each
    (group, shard) for the ordering — and max_by — to be well-defined."""
    from pyspark.sql.window import Window

    group_cols = group_cols or []
    if shard_expr is None:
        shard_expr = F.pmod(F.xxhash64(F.col(order_col)), F.lit(num_shards))
    sharded = df.withColumn("_shard", shard_expr.cast("long"))
    w = (
        Window.partitionBy(*group_cols, "_shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(size_col).over(w)
    local = sharded.withColumn(
        "_local_bin", F.floor((cum - F.col(size_col)) / F.lit(budget))
    )
    counts = (
        sharded.groupBy(*group_cols, "_shard")
        .agg(
            F.sum(size_col).alias("_tot"),
            F.max_by(size_col, F.col(order_col)).alias("_last"),
        )
        .withColumn(
            "_nbins", F.floor((F.col("_tot") - F.col("_last")) / F.lit(budget)) + 1
        )
    )
    ow = (
        Window.partitionBy(*group_cols)
        .orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_offset", F.coalesce(F.sum("_nbins").over(ow), F.lit(0))
    ).select(*group_cols, "_shard", "_offset")
    return (
        local.join(F.broadcast(offsets), [*group_cols, "_shard"])
        .withColumn("pack_bin", F.col("_local_bin") + F.col("_offset"))
        .drop("_shard", "_local_bin", "_offset")
    )


def word_ngrams(words: Column, n: int) -> Column:
    """Word n-gram array (space-joined) from a token array; empty when the
    text has fewer than n tokens. Shared by the Gopher duplicate-coverage
    rule and benchmark decontamination."""
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def contamination_hits(
    docs,
    eval_df,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
    broadcast_eval: bool = True,
):
    """Benchmark decontamination: flag training documents that share at
    least ``min_hits`` distinct word ``n``-grams with an evaluation set —
    the standard pre-training leakage check (a training doc containing an
    eval question verbatim inflates benchmark scores; n=8..13-gram overlap
    is the published heuristic).

    Returns ``docs`` plus ``n_contaminated_grams`` (distinct overlapping
    grams) and ``contaminated`` (>= min_hits).

    Scale shape for a 100 TB corpus vs a small (benchmark-sized) eval set:
    the eval side collapses to its DISTINCT gram set and is broadcast, so
    the per-doc gram explode feeds a BroadcastHashJoin with NO shuffle of
    the corpus; only (id, count) pairs — and only for docs that hit —
    reach the aggregation, and the hit table is broadcast back onto the
    docs. Nothing wider than an id ever shuffles (plan-pinned). If the
    eval set is too large to broadcast (a full held-out corpus rather
    than a benchmark), pass ``broadcast_eval=False``: the same plan
    degrades gracefully to a shuffle join on the gram column, and the
    hit table joins back without the hint (AQE may still broadcast it
    when it turns out small)."""
    from rtfproc_spark.functions.buckets import ensure_scan_parallelism

    # under-split sources (single-row-group parquet) would run the whole
    # gram explode + hash + broadcast-join stage through ONE task
    docs = ensure_scan_parallelism(docs)
    # grams join on xxhash64 of the gram text, not the string: the 8-gram
    # strings (~60 bytes each) never leave their build projection, so the
    # explode, the distinct sets and the broadcast hash relation all carry
    # 8-byte longs — same count semantics (distinct grams <-> distinct
    # hashes at 2^-64-scale collision odds; the DuckDB oracle joins on the
    # STRING and certifies the equivalence, exactly like dup_span_stats)
    w = F.split(F.col(text_col), " ")
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.transform(word_ngrams(w, n), lambda g: F.xxhash64(g))
            )
        ).alias("_g"),
    )
    eval_grams = (
        eval_df.select(
            F.explode(
                F.array_distinct(
                    F.transform(
                        word_ngrams(F.split(F.col(eval_text_col), " "), n),
                        lambda g: F.xxhash64(g),
                    )
                )
            ).alias("_g")
        )
        .distinct()
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    hits = (
        doc_grams.join(eval_grams, "_g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )
    return (
        docs.join(F.broadcast(hits) if broadcast_eval else hits, id_col, "left")
        .withColumn(
            "n_contaminated_grams",
            F.coalesce(F.col("n_contaminated_grams"), F.lit(0)),
        )
        .withColumn(
            "contaminated", F.col("n_contaminated_grams") >= F.lit(min_hits)
        )
    )


def _lm_tokens(docs, text_col: str, id_col: str | None = None):
    """House tokenization for the unigram LM (trim -> lower -> ``\\s+``
    split, empty tokens dropped) — ONE implementation shared by the fused,
    train and score paths so they cannot drift apart."""
    c = F.col(text_col)
    tok = F.explode(F.split(F.lower(F.trim(c)), r"\s+")).alias("tok")
    cols = ([F.col(id_col)] if id_col else []) + [tok]
    return docs.select(*cols).filter(F.col("tok") != "")


def _lm_doc_scores(scored, id_col: str):
    """Shared per-doc aggregation: token count + round-4 mean logprob."""
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("lp"), 4).alias("avg_logprob"),
    )


def unigram_logprob(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int | None = None,
    token_quant: int = 6,
):
    """Unigram language-model quality score — the shape of CCNet/Gopher's
    perplexity filtering with the LM trained on the corpus itself: corpus
    token counts give ``p(tok) = c/N``, each document scores the MEAN
    token log-probability, and a pipeline drops the low tail (gibberish and
    boilerplate-of-rare-symbols score low; fluent text built from common
    tokens scores high).

    Two aggregations: corpus counts (map-side combined groupBy over
    tokens), then per-doc mean after a token->logprob join. With
    ``vocab_size`` the vocabulary is capped to the top-V tokens by
    (count desc, token asc — deterministic ties) and out-of-vocabulary
    tokens take the count-1 floor ``ln(1/N)``; the capped vocab is
    broadcast, so the scoring join never shuffles the token stream — the
    100 TB posture. Uncapped (the oracle posture for small corpora) the
    join shuffles on the token.

    Per-token logprobs are quantized (``round(.., token_quant)``) BEFORE
    the mean: both engines of a differential then average the SAME double
    addends and only the last-ulp summation order differs — which the
    final ``round(.., 4)`` absorbs. Tokenization is the house idiom
    (`trim` -> `lower` -> split `\\s+`, ASCII classes both engines);
    documents with zero tokens are absent from the output.

    Returns (id_col, n_tokens, avg_logprob).
    """
    from rtfproc_spark.functions.buckets import ensure_scan_parallelism

    docs = ensure_scan_parallelism(docs)
    toks = _lm_tokens(docs, text_col, id_col)
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("n"))
    if vocab_size is not None:
        vocab = (
            counts.orderBy(F.col("c").desc(), F.col("tok"))
            .limit(vocab_size)
            .crossJoin(F.broadcast(total))
            .select(
                "tok",
                F.round(F.log(F.col("c") / F.col("n")), token_quant).alias("lp"),
            )
        )
        scored = (
            toks.join(F.broadcast(vocab), "tok", "left")
            .crossJoin(F.broadcast(total))
            .select(
                id_col,
                F.coalesce(
                    F.col("lp"),
                    F.round(F.log(F.lit(1.0) / F.col("n")), token_quant),
                ).alias("lp"),
            )
        )
    else:
        lp_tab = counts.crossJoin(F.broadcast(total)).select(
            "tok", F.round(F.log(F.col("c") / F.col("n")), token_quant).alias("lp")
        )
        scored = toks.join(lp_tab, "tok").select(id_col, "lp")
    return _lm_doc_scores(scored, id_col)


def unigram_vocab(
    docs,
    text_col: str = "text",
    vocab_size: int | None = None,
    token_quant: int = 6,
):
    """Train the unigram LM once and return it as an ARTIFACT:
    ``(vocab_df(tok, lp), oov_lp)`` — the ingest posture where the LM is
    fit on a reference corpus and then applied to a stream of incoming
    documents (:func:`unigram_score`), exactly like the k-means centroid
    artifact feeds ``ivf_assign``. One driver-side action fetches only the
    scalar token total N; token counts never leave the cluster. ``oov_lp``
    is the count-1 floor ``round(ln(1/N), token_quant)`` — evaluated
    through the SAME Spark expression the fused path uses (JVM log +
    HALF_UP round), not Python's ``math.log``/banker's ``round``, so the
    artifact and fused paths agree bit-for-bit on OOV scores."""
    from rtfproc_spark.functions.buckets import ensure_scan_parallelism

    toks = _lm_tokens(ensure_scan_parallelism(docs), text_col)
    # one materialization of the token-count aggregate serves BOTH the
    # scalar total and the (possibly capped) vocab — the capped path used
    # to re-scan the whole token stream with toks.count() (round-8
    # ADVICE), doubling the training read; the total is SUM(c) over the
    # UNCAPPED counts either way, so cap after. Tracked persist instead
    # of localCheckpoint (round-9 ADVICE): the checkpoint was never
    # released (long-lived sessions accumulated executor storage per
    # call) and its output is unrecoverable on executor loss; a persisted
    # frame keeps its lineage and is drained by release_persisted().
    from rtfproc_spark.functions.buckets import persist_tracked

    counts = persist_tracked(
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    )
    # the scalar-total action below materializes the persisted counts
    n = counts.agg(F.sum("c")).collect()[0][0]
    if vocab_size is not None:
        counts = counts.orderBy(F.col("c").desc(), F.col("tok")).limit(vocab_size)
    vocab = counts.select(
        "tok", F.round(F.log(F.col("c") / F.lit(float(n))), token_quant).alias("lp")
    )
    oov_lp = (
        docs.sparkSession.range(1)
        .select(
            F.round(F.log(F.lit(1.0) / F.lit(float(n))), token_quant).alias("v")
        )
        .collect()[0][0]
    )
    return vocab, oov_lp


def unigram_score(
    docs,
    vocab,
    oov_lp: float,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Score documents against a trained unigram LM artifact
    (:func:`unigram_vocab`): per-doc mean of round-quantized token
    logprobs, OOV tokens at the ``oov_lp`` floor. The only non-row-local
    step is the per-DOC aggregation, so on a STREAMING ingest frame run it
    inside ``foreachBatch`` (each doc is one row, so a micro-batch holds
    every token of its docs and the result equals the batch scorer —
    pinned in test_streaming_unigram_quality_gate_matches_batch); a bare
    ``writeStream`` over the aggregate would need a watermark the doc_id
    grouping does not have. Same output shape as
    :func:`unigram_logprob`."""
    toks = _lm_tokens(docs, text_col, id_col)
    scored = toks.join(F.broadcast(vocab), "tok", "left").select(
        id_col, F.coalesce(F.col("lp"), F.lit(oov_lp)).alias("lp")
    )
    return _lm_doc_scores(scored, id_col)
