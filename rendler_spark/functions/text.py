"""Text-analysis Column builders (training-data pipeline surface).

All JVM-side expressions (pyspark.sql.functions) — usable inside any query
plan with predicate pushdown/codegen intact.  The heuristics are simple and
deterministic by design: quality scoring and language-ID for corpus
filtering at 100 TB is about cheap, vectorizable signals, not models.
"""

from __future__ import annotations

import pyspark.sql.functions as F

STOPWORDS = ("the", "a", "of", "and", "to")


def token_count(text: F.Column | str) -> F.Column:
    return F.size(F.split(text, r"\s+")).alias("n_tokens")


def char_count(text: F.Column | str) -> F.Column:
    return F.length(text).alias("n_chars")


def avg_token_len(text: F.Column | str) -> F.Column:
    n = F.size(F.split(text, r"\s+"))
    return ((F.length(text) - n + 1.0) / n).alias("avg_token_len")


def stopword_hits(text: F.Column | str, word: str = "the") -> F.Column:
    stripped = F.regexp_replace(text, word, "")
    return ((F.length(text) - F.length(stripped)) / len(word)).cast("int").alias(
        "stopword_hits"
    )


def punct_ratio(text: F.Column | str) -> F.Column:
    no_punct = F.regexp_replace(text, r"[^\w\s]", "")
    return (
        (F.length(text) - F.length(no_punct)) / F.greatest(F.length(text), F.lit(1))
    ).alias("punct_ratio")


def quality_score(text: F.Column | str) -> F.Column:
    """Composite [0,1] quality heuristic: favor mid-length docs with low
    punctuation density and some stopword presence."""
    n = F.size(F.split(text, r"\s+"))
    len_ok = F.when((n >= 10) & (n <= 10_000), 1.0).otherwise(0.3)
    punct = punct_ratio(text)
    stop = stopword_hits(text)
    return (
        len_ok * (1.0 - F.least(punct * 5, F.lit(1.0))) *
        F.when(stop > 0, 1.0).otherwise(0.7)
    ).alias("quality")


def fingerprint(text: F.Column | str) -> F.Column:
    """Content fingerprint (md5 hex) for exact dedup."""
    return F.md5(text).alias("fp")


def lang_guess(text: F.Column | str) -> F.Column:
    """Marker-token language heuristic (deterministic, SQL-expressible)."""
    c = F.col(text) if isinstance(text, str) else text
    the_hits = F.length(c) - F.length(F.regexp_replace(c, " the ", ""))
    return (
        F.when(the_hits >= 10, "en_heavy")
        .when(c.contains("spark"), "tech")
        .otherwise("other")
        .alias("lang_pred")
    )
