"""Text analysis operators: language ID, quality scoring, token counting,
fingerprinting — all pure JVM column expressions (no Python anywhere).

These are the per-document scalar stages a 100 TB training-data pipeline
runs before dedup/filtering. Everything here whole-stage-codegens: one
projection over the documents scan, no shuffles, trivially linear scaling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.portable_hash import portable_hash64

# tiny stopword inventories for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "for", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pas", "pour", "que"],
}


def token_count(text_col: str = "text"):
    """Whitespace token count (column expression)."""
    t = F.trim(F.col(text_col))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text_col: str = "text"):
    """Sub-word-ish token count: words + digit runs + punctuation marks, via
    one regexp pass (a cheap stand-in for BPE vocab tokenization)."""
    return F.size(F.regexp_extract_all(F.col(text_col),
                                       F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def _words_expr(text_col: str = "text"):
    """Lowercased whitespace token array — hoist this to a column and pass
    it to the expression factories: the per-language stopword filters are
    interpreted (CodegenFallback), so a captured split expression would
    re-evaluate once per filter (r5 HOF-capture invariant, CLAUDE.md)."""
    return F.split(F.lower(F.col(text_col)), r"\s+")


def _stop_count_expr(text_col: str, words_list):
    """Occurrences of any ``words_list`` entry as a whole whitespace token,
    via ONE ``regexp_count`` over the lowercased text (r6). Equivalent to
    ``size(filter(split(lower(text), '\\s+'), w -> w ∈ set))``: a token is
    a maximal ``\\S+`` run, and the zero-width guards ``(?<!\\S)…(?!\\S)``
    match exactly the whole-token occurrences — but without the
    interpreted per-element HOF filter + linear ``array_contains`` scan,
    which paid a large codegen-fallback warmup every first execution of
    the stage shape (annotate cold 10.5 → 2.3 s at sf1, warm equal,
    hash-identical; equivalence also pytest-pinned)."""
    import re as _re
    alts = "|".join(_re.escape(w) for w in
                    sorted(words_list, key=len, reverse=True))
    return F.regexp_count(F.lower(F.col(text_col)),
                          F.lit(f"(?<!\\S)(?:{alts})(?!\\S)"))


def _quality_feature_exprs(text_col: str = "text", words=None) -> dict:
    """Named quality-feature column expressions (shared by
    :func:`quality_features`, :func:`quality_score`, :func:`annotate`).
    ``words``: pre-hoisted token column (defaults to the inline split)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = token_count(text_col)
    n_stop = _stop_count_expr(text_col, STOPWORDS["en"])
    # regexp_count of the char class == length of the complement-replace
    # result (single-char matches), WITHOUT building a replaced copy of
    # every document — measured 6× on this projection at sf1 (r6);
    # equivalence pytest-pinned in test_ops_spark
    punct = F.regexp_count(t, F.lit(r"[\.,;:!\?'\"]"))
    digits = F.regexp_count(t, F.lit(r"[0-9]"))
    upper = F.regexp_count(t, F.lit(r"[A-Z]"))
    return {
        "n_chars_calc": n_chars,
        "n_tokens": toks,
        "punct_ratio": F.round(punct / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_ratio": F.round(n_stop / F.greatest(toks, F.lit(1)), 6),
        "digit_ratio": F.round(digits / F.greatest(n_chars, F.lit(1)), 6),
        "upper_ratio": F.round(upper / F.greatest(n_chars, F.lit(1)), 6),
        "mean_word_len": F.round((n_chars - toks + 1) / F.greatest(toks, F.lit(1)), 6),
    }


def _quality_score_expr(text_col: str = "text", words=None):
    """Composite 0..1 quality score (monotone penalties, documented weights)."""
    f = _quality_feature_exprs(text_col, words=words)
    length_ok = F.when((f["n_chars_calc"] >= 50) & (f["n_chars_calc"] <= 10000),
                       F.lit(1.0)).otherwise(F.lit(0.3))
    punct_ok = F.when(f["punct_ratio"] <= 0.2, F.lit(1.0)).otherwise(F.lit(0.5))
    stop_ok = F.when(f["stopword_ratio"] >= 0.05, F.lit(1.0)).otherwise(F.lit(0.6))
    return F.round(length_ok * punct_ok * stop_ok, 6)


def _lang_exprs(text_col: str = "text", words=None):
    """(lang_pred, lang_score) expressions: stopword-vote argmax with
    deterministic tie-break (language name ascending), 'und' on zero.
    ``words``: pre-hoisted token column (defaults to the inline split)."""
    if words is None:
        words = _words_expr(text_col)
    n = F.greatest(F.size(words), F.lit(1))
    scores = []
    for lang in sorted(STOPWORDS):
        score = _stop_count_expr(text_col, STOPWORDS[lang]) / n
        scores.append(F.struct(F.round(score, 6).alias("score"), F.lit(lang).alias("lang")))
    # sort (negated score, lang) ascending → best score, smallest lang first
    best = F.sort_array(F.array(*[F.struct((-s["score"]).alias("neg"), s["lang"].alias("lang"),
                                           s["score"].alias("score")) for s in scores]))[0]
    lang_pred = F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    return lang_pred, best["score"]


def _fingerprint_exprs(text_col: str = "text"):
    """(fingerprint, norm_len) expressions: portable 60-bit hash of the
    normalized text (lowercased, whitespace-collapsed, punct-stripped)."""
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", ""), r"\s+", " "))
    return portable_hash64(norm), F.length(norm)


def quality_features(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features: length, token stats, punctuation ratio,
    stopword ratio, uppercase ratio, digit ratio, mean word length."""
    f = _quality_feature_exprs(text_col)
    return docs.select(F.col(id_col), *[c.alias(n) for n, c in f.items()])


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Composite 0..1 quality score plus its inputs."""
    f = _quality_feature_exprs(text_col)
    return docs.select(
        F.col(id_col),
        _quality_score_expr(text_col).alias("quality"),
        f["n_tokens"].alias("n_tokens"),
        f["punct_ratio"].alias("punct_ratio"),
        f["stopword_ratio"].alias("stopword_ratio"))


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID (see :func:`_lang_exprs`)."""
    # keep text in scope: the r6 regexp-count lang votes read the text
    # column directly (the hoisted _words array only feeds the token count)
    base = docs.select(F.col(id_col), F.col(text_col),
                       _words_expr(text_col).alias("_words"))
    lang_pred, lang_score = _lang_exprs(text_col, words=F.col("_words"))
    return base.select(F.col(id_col), lang_pred.alias("lang_pred"),
                       lang_score.alias("lang_score"))


def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint — the canonicalization used for fuzzy-exact
    dedup (see :func:`_fingerprint_exprs`)."""
    fp, norm_len = _fingerprint_exprs(text_col)
    return docs.select(F.col(id_col), fp.alias("fingerprint"),
                       norm_len.alias("norm_len"))


# PII detector patterns, ordered (redaction applies them in this order).
# Written to the Java-regex ∩ RE2 common subset (no lookarounds, no
# backrefs, ASCII \b) so the DuckDB oracle runs the IDENTICAL patterns.
PII_PATTERNS = (
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("SSN", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("PHONE", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"),
    ("IP", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
)


def pii_redact(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """PII scrub — the redaction pass a training-data pipeline runs before
    anything leaves the ingest boundary. Detects emails, SSN-shaped ids,
    phone numbers and IPv4 addresses; each is counted (on the input text,
    per pattern independently) and replaced by its ``<KIND>`` token in
    :data:`PII_PATTERNS` order.

    Pure whole-stage-codegen projection: one scan, zero joins, zero
    Python — same scaling posture as the rest of this module. The SSN and
    phone shapes are disjoint (3-2-4 vs 3-3-4 digit groups), so sequential
    replacement order cannot cannibalize counts; either way both engines
    apply the identical sequence, so the oracle comparison is exact.
    """
    from ..functions.parallelism import spread
    docs = spread(docs)  # regex-heavy projection: use every core
    t = F.col(text_col)
    counts = [F.regexp_count(t, F.lit(p)).cast("long") for _, p in PII_PATTERNS]
    count_cols = [c.alias(f"n_{k.lower()}")
                  for (k, _), c in zip(PII_PATTERNS, counts)]
    red = t
    for k, p in PII_PATTERNS:
        red = F.regexp_replace(red, p, f"<{k}>")
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    return docs.select(F.col(id_col), red.alias("text_redacted"),
                       *count_cols, (total > 0).alias("has_pii"))


def repetition_features(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Intra-document repetition signals — the Gopher-rule quality heuristics
    (top-term dominance, duplicate n-gram mass) used to drop boilerplate and
    degenerate generations from training corpora.

    Columns: ``n_words`` (whitespace tokens, 0 for blank), ``top_word_ratio``
    (most frequent word's share of all tokens), ``dup_bigram_ratio``
    (fraction of word bigrams that are repeats of an earlier bigram).

    All JVM higher-order functions over the per-row token array — per-doc
    work is O(tokens·distinct) with no shuffle, no explode, no Python, so
    the stage stays a single whole-stage projection at any corpus size.
    """
    from ..functions.parallelism import spread
    docs = spread(docs)
    t = F.trim(F.lower(F.col(text_col)))
    # the token array is hoisted to a COLUMN before the HOF stage: lambdas
    # capturing the split expression directly would re-run
    # trim+lower+split per lambda invocation (once per distinct token in
    # the count loop) — interpreted HOFs inline captured expressions, the
    # embed_text r5 finding. A multi-referenced non-cheap expression also
    # survives CollapseProject, so the hoist sticks.
    base = docs.select(F.col(id_col), (F.length(t) == 0).alias("_blank"),
                       F.split(t, r"\s+").alias("_w"))
    w = F.col("_w")
    n = F.size(w)
    counts = F.transform(
        F.array_distinct(w),
        lambda d: F.size(F.filter(w, lambda x: x == d)))
    bigrams = F.when(
        n >= 2,
        F.transform(F.sequence(F.lit(0), n - 2),
                    lambda i: F.concat_ws(" ", F.slice(w, i + 1, 2)))
    ).otherwise(F.array().cast("array<string>"))
    mid = base.select(id_col, "_blank", n.alias("_n"),
                      F.array_max(counts).alias("_topc"),
                      bigrams.alias("_bi"))
    n_bi = F.size("_bi")
    top_ratio = F.round(F.col("_topc") / F.col("_n"), 6)
    dup_bi = F.round((n_bi - F.size(F.array_distinct("_bi")))
                     / F.greatest(n_bi, F.lit(1)), 6)
    blank = F.col("_blank")
    return mid.select(
        F.col(id_col),
        F.when(blank, F.lit(0)).otherwise(F.col("_n")).cast("long")
        .alias("n_words"),
        F.when(blank, F.lit(0.0)).otherwise(top_ratio).alias("top_word_ratio"),
        F.when(blank, F.lit(0.0)).otherwise(dup_bi).alias("dup_bigram_ratio"))


def chunk_documents(docs: DataFrame, chunk_tokens: int = 32,
                    overlap: int = 8, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Context-window packing: split each document into sliding
    whitespace-token windows of ``chunk_tokens`` with ``overlap`` tokens of
    context carried between neighbors — the chunking step that feeds
    fixed-context training and embedding pipelines.

    Chunk ``i`` covers tokens ``[i·stride, min(i·stride+chunk, n))`` with
    ``stride = chunk_tokens − overlap``; the window count is
    ``ceil((n − overlap)/stride)`` (min 1 for non-blank docs), which
    guarantees every chunk contributes at least one token no earlier chunk
    had. Blank documents yield no chunks.

    One HOF projection + one explode per doc — no shuffle, no Python; the
    explode fan-out is bounded by tokens/stride per row.
    """
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap ({overlap}) must be < chunk_tokens "
                         f"({chunk_tokens})")
    from ..functions.parallelism import spread
    docs = spread(docs)
    stride = chunk_tokens - overlap
    t = F.trim(F.col(text_col))
    # hoist the token array to a column: the window lambda slicing the
    # split expression directly would re-run split per chunk index under
    # interpreted HOF evaluation (the embed_text r5 finding)
    docs = docs.select(F.col(id_col), (F.length(t) == 0).alias("_blank"),
                       F.split(t, r"\s+").alias("_toks"))
    toks = F.col("_toks")
    n = F.when(F.col("_blank"), F.lit(0)).otherwise(F.size(toks))
    n_chunks = F.when(
        n == 0, F.lit(0)
    ).otherwise(F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(float(stride))).cast("int"),
        F.lit(1)))
    windows = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(toks, i * stride + 1, chunk_tokens))
            .alias("chunk_text")))
    return (docs
            .select(F.col(id_col), n.alias("_n"),
                    F.explode(F.when(n_chunks > 0, windows)
                              .otherwise(F.array().cast(
                                  "array<struct<chunk_idx:int,"
                                  "chunk_text:string>>"))).alias("c"))
            .select(F.col(id_col),
                    F.col("c.chunk_idx").alias("chunk_idx"),
                    F.least(F.lit(chunk_tokens),
                            F.col("_n") - F.col("c.chunk_idx") * stride)
                    .cast("int").alias("chunk_n_tokens"),
                    F.col("c.chunk_text").alias("chunk_text")))


def annotate(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Fingerprint + quality + language in ONE whole-stage-codegen
    projection — the corpus-cleaning annotate stage without a single join
    or shuffle (the join-per-annotation form costs three shuffles and three
    extra scans of the corpus at 100 TB)."""
    from ..functions.parallelism import spread
    docs = spread(docs)  # regex-heavy projection: use every core on tiny scans
    # ONE token array feeds the stopword ratio + every language vote
    # (previously ~1 split per language per row on the interpreted path)
    base = docs.select("*", _words_expr(text_col).alias("_words"))
    w = F.col("_words")
    fp, norm_len = _fingerprint_exprs(text_col)
    lang_pred, lang_score = _lang_exprs(text_col, words=w)
    f = _quality_feature_exprs(text_col, words=w)
    return base.select(
        "*", fp.alias("fingerprint"), norm_len.alias("norm_len"),
        _quality_score_expr(text_col, words=w).alias("quality"),
        f["n_tokens"].alias("n_tokens"),
        f["punct_ratio"].alias("punct_ratio"),
        f["stopword_ratio"].alias("stopword_ratio"),
        lang_pred.alias("lang_pred"), lang_score.alias("lang_score")).drop("_words")
