"""Text analysis: token counting, quality score, language heuristic,
document fingerprinting — all native Catalyst expressions (no Python).

These are the training-data-pipeline additions on top of the reference's
operator set (SURVEY.md §2.8 'our engine adds' list): every function here
is a pure column expression usable inside any groupBy/select, codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish word/number/punct tokenizer (shared, dialect-portable regex).
BPE_SPLIT_PATTERN = r"[A-Za-zÀ-ÿ]+|[0-9]+|[^A-Za-zÀ-ÿ0-9\s]"


def _text(col) -> Column:
    return F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))


def whitespace_token_count(col) -> Column:
    """Whitespace tokens (the doc-length unit for heuristics)."""
    return F.size(F.filter(F.split(_text(col), r"\s+"), lambda w: w != F.lit("")))


def bpe_token_count(col) -> Column:
    """BPE-ish token count: words / number runs / single punct marks."""
    return F.size(F.regexp_extract_all(_text(col), F.lit(BPE_SPLIT_PATTERN), 0))


def quality_score(col) -> Column:
    """[0,1] composite: length band + punctuation-terminated lines +
    alpha density. A cheap C4-style prior, NOT the keep decision."""
    text = _text(col)
    n_chars = F.length(text)
    words = F.filter(F.split(text, r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words)
    lines = F.split(text, r"\n")
    terminated = F.size(F.filter(lines, lambda l: l.rlike(r"[.!?]$")))
    alpha_chars = F.length(F.regexp_replace(text, r"[^A-Za-zÀ-ÿ]", ""))
    len_score = F.when(n_words.between(50, 5000), F.lit(1.0)).otherwise(
        F.when(n_words.between(10, 10000), F.lit(0.5)).otherwise(F.lit(0.0))
    )
    punct_score = F.when(F.size(lines) > 0, terminated.cast("double") / F.size(lines)).otherwise(
        F.lit(0.0)
    )
    alpha_score = F.when(n_chars > 0, alpha_chars.cast("double") / n_chars).otherwise(F.lit(0.0))
    return (len_score + punct_score + alpha_score) / F.lit(3.0)


def lang_hint(col, stopwords_by_lang: dict[str, list[str]] | None = None) -> Column:
    """SQL-only language heuristic: argmax of per-language stopword hits.

    Cheaper-but-weaker sibling of dq.langid (useful as a pre-filter so the
    pandas UDF only runs on ambiguous docs at scale).
    """
    if stopwords_by_lang is None:
        from dq.heuristics import STOPWORDS

        stopwords_by_lang = {
            "en": STOPWORDS[:10],
            "pt": ["de", "que", "não", "uma", "para", "com", "mais", "por", "como", "foi"],
            "es": ["el", "la", "que", "ser", "haber", "por", "con", "para", "como", "pero"],
            "de": ["der", "die", "und", "den", "von", "das", "mit", "sich", "auf", "ist"],
            "fr": ["le", "être", "avoir", "que", "pour", "dans", "ce", "il", "qui", "ne"],
        }
    words = F.filter(F.split(F.lower(_text(col)), r"\s+"), lambda w: w != F.lit(""))
    scores = []
    for lang, stops in stopwords_by_lang.items():
        arr = F.array(*[F.lit(s) for s in stops])
        hits = F.size(F.filter(words, lambda w: F.array_contains(arr, w)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # array_max over struct(hits, lang): max hits, ties -> lexicographically
    # greatest lang (deterministic)
    return F.array_max(F.array(*scores)).getField("lang")


def fingerprint64(col) -> Column:
    """64-bit content fingerprint over normalized text (rolling-hash family:
    xxhash64 of the whitespace-normalized lowercase doc)."""
    norm = F.concat_ws(" ", F.filter(F.split(F.lower(_text(col)), r"\s+"), lambda w: w != F.lit("")))
    return F.xxhash64(norm)


def shingle_fingerprints(col, n: int = 5, cap: int = 64) -> Column:
    """First ``cap`` word-shingle hashes (content-defined chunk fingerprints
    for containment/overlap estimation); incremental zip_with hashing, see
    dq.dedup.hashed_shingles_col."""
    from dq.dedup import hashed_shingles_col

    return F.slice(hashed_shingles_col(_text(col), n), 1, cap)
