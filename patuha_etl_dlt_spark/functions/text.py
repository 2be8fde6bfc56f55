"""Text-analysis column functions for training-data pipelines.

All native ``pyspark.sql.functions`` (JVM-side, whole-stage codegen) —
language-ID, quality scoring, token counting, fingerprinting over the
``documents`` table. Designed so an ANSI-SQL oracle (DuckDB) can compute
identical values: only portable primitives (length/replace/trim/md5/
regexp) and explicit tie-breaking.

No reference analog (the reference syncs rows; it never inspects text) —
these are the north-rule "training-data pipeline" additions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# language → marker stopwords (checked as whole words)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of"],
    "de": ["der", "die", "und", "nicht"],
    "fr": ["le", "la", "et", "les"],
    "id": ["yang", "dan", "di", "itu"],
}

PUNCT_CHARS = [".", ",", "!", "?", ";", ":"]


def token_count(text: Column) -> Column:
    """Whitespace-token count; empty/blank → 0."""
    t = F.trim(text)
    return (
        F.when(text.isNull(), F.lit(None).cast("long"))
        .when(F.length(t) == 0, F.lit(0).cast("long"))
        .otherwise(F.size(F.split(t, r"\s+")).cast("long"))
    )


def _occurrences(s: Column, sub: str) -> Column:
    """Non-overlapping occurrence count via length arithmetic (portable to
    any SQL dialect — no regex dialect dependence)."""
    return ((F.length(s) - F.length(F.replace(s, F.lit(sub), F.lit("")))) / len(sub)).cast("long")


def word_occurrences(text: Column, word: str) -> Column:
    """Whole-word occurrence count. Spaces are doubled first so consecutive
    words don't share padding (replace-counting is non-overlapping)."""
    padded = F.concat(F.lit(" "), F.replace(text, F.lit(" "), F.lit("  ")), F.lit(" "))
    return _occurrences(padded, f" {word} ")


def punct_count(text: Column) -> Column:
    c = F.lit(0).cast("long")
    for ch in PUNCT_CHARS:
        c = c + _occurrences(text, ch)
    return c


def stopword_count(text: Column, lang: str = "en") -> Column:
    c = F.lit(0).cast("long")
    for w in LANG_STOPWORDS[lang]:
        c = c + word_occurrences(text, w)
    return c


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer division (floor) on non-negative longs; NULL on b=0.
    Uses subtraction of the remainder so the double division is exact —
    no float rounding can leak in (values stay ≪ 2^53)."""
    bz = F.nullif(b, F.lit(0))
    return ((a - a % bz) / bz).cast("long")


def quality_features(text: Column) -> dict[str, Column]:
    """Deterministic quality signals — **all integer arithmetic** (counts,
    per-mille / per-10k ratios, basis-point composite score) so any SQL
    engine computes bit-identical values; no float rounding anywhere."""
    n_chars = F.length(text).cast("long")
    n_tokens = token_count(text)
    chars_no_space = F.length(F.replace(text, F.lit(" "), F.lit(""))).cast("long")
    mean_tok_milli = _idiv(chars_no_space * 1000, n_tokens)  # mean token len ‰
    stop_10k = _idiv(stopword_count(text, "en") * 10000, n_tokens)
    punct_10k = _idiv(punct_count(text) * 10000, n_chars)
    # composite score in basis points: 0.5·min(tokens/64,1) +
    # 0.3·min(4·stop_ratio,1) + 0.2·min(mean_tok/8,1)
    t_term = F.least(_idiv(n_tokens * 10000, F.lit(64).cast("long")), F.lit(10000).cast("long"))
    s_term = F.least(F.coalesce(stop_10k, F.lit(0).cast("long")) * 4, F.lit(10000).cast("long"))
    m_term = F.least(
        _idiv(F.coalesce(mean_tok_milli, F.lit(0).cast("long")) * 10, F.lit(8).cast("long")),
        F.lit(10000).cast("long"),
    )
    score_bp = _idiv(t_term * 5 + s_term * 3 + m_term * 2, F.lit(10).cast("long"))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len_milli": mean_tok_milli,
        "stopword_per_10k": stop_10k,
        "punct_per_10k": punct_10k,
        "quality_bp": score_bp,
    }


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: stopword_count(text, lang) for lang in LANG_STOPWORDS}


def lang_id(text: Column) -> Column:
    """Argmax of per-language stopword counts with deterministic tie-break
    (the LANG_STOPWORDS declaration order); all-zero → 'und' (unknown)."""
    s = lang_scores(text)
    # explicit nested CASE: en wins ties over de over fr over id
    return (
        F.when((s["en"] == 0) & (s["de"] == 0) & (s["fr"] == 0) & (s["id"] == 0), F.lit("und"))
        .when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["id"]), F.lit("en"))
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["id"]), F.lit("de"))
        .when(s["fr"] >= s["id"], F.lit("fr"))
        .otherwise(F.lit("id"))
    )


def normalize_text(text: Column) -> Column:
    """Whitespace-collapse + lowercase + trim — the canonical form used for
    fingerprinting and exact dedup."""
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(text))
