"""Text-analysis column functions for LLM-data pipelines.

All functions are built-in-only (JVM-side, whole-stage-codegen-friendly):
no Python UDFs in any hot path. Ratios are computed with a fixed expression
order so Spark and DuckDB produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny in-expression stopword lists (broadcast literals). For real corpora
# these would come from a broadcast dimension table; the operator shape is
# identical.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
DE_STOPWORDS = ("der", "die", "das", "und", "ist", "ein", "zu")

# Word-ish tokens: runs of word chars, or single punctuation marks (a cheap
# BPE-ish proxy that splits "don't" → ["don", "'", "t"]).
TOKEN_REGEX = r"\w+|[^\w\s]"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: str | Column) -> Column:
    """Lowercase, trim, collapse internal whitespace."""
    return F.lower(F.trim(F.regexp_replace(_c(col), r"\s+", " ")))


def fingerprint(col: str | Column) -> Column:
    """Deterministic 128-bit content fingerprint (md5 of normalized utf-8)."""
    return F.md5(F.encode(normalize_text(col), "UTF-8"))


def words(col: str | Column) -> Column:
    return F.split(normalize_text(col), " ")


def word_count(col: str | Column) -> Column:
    return F.size(words(col)).cast("int")


def char_count(col: str | Column) -> Column:
    return F.length(_c(col)).cast("int")


def token_count(col: str | Column) -> Column:
    """Regex token count (TOKEN_REGEX matches)."""
    return F.regexp_count(_c(col), F.lit(TOKEN_REGEX)).cast("int")


def stopword_count(col: str | Column, stopwords: tuple[str, ...]) -> Column:
    stops = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(words(col), lambda w: F.array_contains(stops, w))).cast("int")


def lang_id(col: str | Column) -> Column:
    """n-gram-free heuristic language ID: compare stopword hit counts.

    Deterministic integer comparison — 'en' wins ties with 'de'; no hits at
    all → 'und' (ISO 639-3 undetermined)."""
    en = stopword_count(col, EN_STOPWORDS)
    de = stopword_count(col, DE_STOPWORDS)
    return (
        F.when((en == 0) & (de == 0), F.lit("und"))
        .when(en >= de, F.lit("en"))
        .otherwise(F.lit("de"))
    )


def quality_score(col: str | Column) -> Column:
    """Cheap doc-quality heuristic in [0,1]: length, stopword density, and
    mean word length, each clamped and weighted. Fixed operation order keeps
    the double bit-stable across engines."""
    wc = word_count(col).cast("double")
    sw = stopword_count(col, EN_STOPWORDS).cast("double")
    chars = char_count(col).cast("double")
    len_term = F.least(F.lit(1.0), wc / F.lit(100.0))
    stop_term = F.least(F.lit(1.0), (sw / wc) * F.lit(4.0))
    awl_term = F.least(F.lit(1.0), (chars / wc) / F.lit(8.0))
    return (
        len_term * F.lit(0.4) + stop_term * F.lit(0.3) + awl_term * F.lit(0.3)
    ).alias("quality_score")


def word_ngrams(col: str | Column, n: int) -> Column:
    """Array of word n-grams (space-joined), built with JVM array lambdas —
    no UDF, no explode blow-up before it's needed.

    The word array is LET-BOUND via a single-element ``transform`` before
    the gram lambdas touch it: referencing ``words(col)`` directly inside
    the per-index lambda makes codegen re-run the normalize-regex + split
    once per gram (no common-subexpression elimination across lambda
    scopes) — measured 5× slower at sf0.1. Binding it to a lambda variable
    evaluates it once per row.

    Docs shorter than ``n`` words yield an empty array: ``sequence(0, size-n)``
    would otherwise step DOWNWARD to ``[0, -1, ...]`` and make ``slice`` throw
    INVALID_PARAMETER_VALUE.START, so the gram build is gated on
    ``size(arr) >= n`` (matching DuckDB's ``range()``, which returns empty)."""
    return F.element_at(
        F.transform(
            F.array(words(col)),
            lambda arr: F.when(
                F.size(arr) >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size(arr) - n),
                    lambda i: F.concat_ws(" ", F.slice(arr, i + 1, n)),
                ),
            ).otherwise(F.slice(arr, 1, 0)),
        ),
        1,
    )


# PII patterns kept deliberately simple and portable (same semantics in
# Java regex and RE2): emails, international-ish phone numbers, and 9+ digit
# id-like runs. Real deployments plug in jurisdiction-specific pattern packs;
# the operator shape (ordered regexp_replace chain + per-pattern counts)
# stays the same.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9() .-]{7,}[0-9]",
    "id_number": r"[0-9]{9,}",
}


def pii_scrub(
    col: str | Column, patterns: dict[str, str] | None = None
) -> tuple[Column, dict[str, Column]]:
    """Redact PII from a text column.

    Returns ``(scrubbed, counts)``: the text with each pattern class
    replaced by ``[CLASS]`` tokens (applied in dict order, so earlier
    classes absorb overlapping matches — emails before digit runs), and a
    per-class match-count column. Pure regexp built-ins — the scrub runs in
    whole-stage codegen, no UDF, safe at any scale.
    """
    pats = patterns or PII_PATTERNS
    scrubbed = _c(col)
    counts: dict[str, Column] = {}
    for name, pat in pats.items():
        counts[name] = F.regexp_count(scrubbed, F.lit(pat)).cast("int")
        scrubbed = F.regexp_replace(scrubbed, pat, f"[{name.upper()}]")
    return scrubbed, counts


def winnow_fingerprints(
    col: str | Column, k: int = 8, w: int = 4
) -> Column:
    """Winnowed rolling-hash fingerprints (the MOSS scheme): hash every
    char k-gram, slide a w-wide window over the hash sequence, keep each
    window's minimum — a deterministic, position-robust signature set.
    Guarantees: any shared substring of length ≥ k + w − 1 yields at least
    one shared fingerprint, and edits only perturb fingerprints within
    w + k chars of the edit (unlike a whole-doc hash, where one byte flips
    everything).

    Pure JVM expressions — char k-grams via substring over a sequence,
    window minima via array_min over slices, distinct via array_distinct;
    no UDF. Docs shorter than k chars yield an empty array.

    This combined form nests the hash-array expression inside the window
    pass, which re-evaluates it per window position — fine for short
    fields, O(n²)-per-doc on real documents. Corpus-scale callers MUST
    stage: ``withColumn("_h", kgram_hashes(..)).select(winnow_mins("_h", w))``
    (what ``dedup.winnow_neardup_pairs`` does).
    """
    return winnow_mins(kgram_hashes(col, k), w)


def kgram_hashes(col: str | Column, k: int) -> Column:
    """Rolling char k-gram hash sequence (xxhash64 per position). Docs
    shorter than ``k`` chars yield an empty array.

    The normalized text is let-bound (single-element ``transform``) before
    the per-position lambda touches it — a direct reference would re-run
    the normalize regex once per character position (O(n²) per document;
    same class of bug fixed in :func:`word_ngrams`)."""
    return F.element_at(
        F.transform(
            F.array(normalize_text(col)),
            lambda txt: F.when(
                F.length(txt) >= k,
                F.transform(
                    F.sequence(F.lit(1), F.length(txt) - k + 1),
                    lambda i: F.xxhash64(F.substring(txt, i, F.lit(k))),
                ),
            ).otherwise(F.array().cast("array<bigint>")),
        ),
        1,
    )


def winnow_mins(hashes: str | Column, w: int) -> Column:
    """Select each w-window's minimum from a hash-sequence column, distinct
    — the winnowing step. The input array is let-bound, so passing an
    unmaterialized expression no longer re-evaluates it per window."""
    return F.element_at(
        F.transform(
            F.array(_c(hashes)),
            lambda h: F.when(F.size(h) == 0, F.array().cast("array<bigint>"))
            .when(F.size(h) < w, F.array(F.array_min(h)))  # one short window
            .otherwise(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size(h) - w + 1),
                        lambda i: F.array_min(F.slice(h, i, w)),
                    )
                )
            ),
        ),
        1,
    )


def tfidf_log_idf(tf: Column, df: Column, n_docs: Column) -> Column:
    """Production TF-IDF weight: tf * (ln((1 + N) / (1 + df)) + 1)
    (the smoothed form that never zeroes a term present in every doc).

    The oracle-graded docs_tfidf_topterms uses the raw-idf ratio
    tf * N / df instead, because ln()'s last-ulp behavior differs between
    libm (DuckDB) and the JVM (Spark) so a log-based score cannot be
    hash-compared across engines. The two agree on direction (both
    strictly increase in tf and strictly decrease in df) but NOT on the
    full ranking when tf and df vary together: the log form compresses
    the df axis, so a high-tf/medium-df term can outrank a low-tf/rare
    term under log-idf and not under raw-idf. Monotonicity in each
    argument is the pytest-asserted contract."""
    return tf.cast("double") * (
        F.log((F.lit(1.0) + n_docs.cast("double")) / (F.lit(1.0) + df.cast("double")))
        + F.lit(1.0)
    )
