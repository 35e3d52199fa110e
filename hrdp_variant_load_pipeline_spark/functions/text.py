"""Text-analysis column expressions for large-scale corpus pipelines.

All JVM-side (whole-stage codegen) — no Python UDFs in the hot path. These
are the engine extensions beyond the reference surface (BASELINE.json
north-star: language-ID, quality scoring, token counting, fingerprinting).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny in-expression stopword list (quality scoring)
STOPWORDS = ("the", "a", "of", "and", "to", "in")

#: per-language marker words for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ("the", "a", "is", "and"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "la", "les", "et"),
    "es": ("el", "los", "las", "y"),
}


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_ratio(text: Column) -> Column:
    t = tokens(text)
    return F.round(F.size(F.array_distinct(t)).cast("double") / F.size(t), 4)


def stopword_ratio(text: Column) -> Column:
    t = tokens(text)
    stops = F.filter(t, lambda w: w.isin(*STOPWORDS))
    return F.round(F.size(stops).cast("double") / F.size(t), 4)


def avg_word_len(text: Column) -> Column:
    t = tokens(text)
    total_chars = F.length(F.replace(text, F.lit(" "), F.lit("")))
    return F.round(total_chars.cast("double") / F.size(t), 4)


def lang_score(text: Column, lang: str) -> Column:
    t = tokens(text)
    return F.size(F.filter(t, lambda w: w.isin(*LANG_MARKERS[lang])))


def lang_predict(text: Column) -> Column:
    """Argmax language by marker-word count, ties resolved in en>de>fr>es
    order (deterministic)."""
    scores = {lang: lang_score(text, lang) for lang in LANG_MARKERS}
    best = F.greatest(*scores.values())
    pred = F.lit("unknown")
    for lang in reversed(list(LANG_MARKERS)):  # build when-chain in priority order
        pred = F.when(scores[lang] == best, lang).otherwise(pred)
    return F.when(best == 0, "unknown").otherwise(pred)


def fingerprint(text: Column) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    lowercase token set (classic shingle-free near-dup prefilter)."""
    norm = F.array_join(F.array_sort(F.array_distinct(tokens(F.lower(text)))), " ")
    return F.md5(norm)
