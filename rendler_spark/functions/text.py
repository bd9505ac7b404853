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


def inverted_postings(
    df,
    doc_col: str = "doc_id",
    text_col: str = "text",
    min_term_len: int = 1,
    n_buckets: int = 16,
):
    """Bucketed inverted-index build: (term, bucket, bucket_df, postings).

    A flat ``groupBy(term).agg(collect_set(doc_id))`` puts a stopword's
    ENTIRE postings list into one aggregation cell — at corpus scale a
    term appearing in 10^9 documents is an 8 GB array in one task (the
    classic reducer bomb).  Here the doc axis is pre-sharded:
    ``bucket = pmod(xxhash64(doc_id), n_buckets)`` rides the explode, the
    aggregate runs per (term, bucket), and no cell can exceed the bucket's
    share of the corpus no matter how hot the term is — buckets are a
    partition of doc space, so per-bucket distinct counts and postings
    are disjoint and exact.  n_buckets scales with corpus size (the 16
    here is the sandbox setting; 10^4+ at 100 TB), and the bucketed rows
    ARE the serving layout: term lookups read all buckets of one term
    (co-located by the (term, bucket) hash), mergeable by concatenation
    since each bucket's postings arrive sorted.

    Exact term-level stats fall out by summation: df = sum(bucket_df)
    over a term's buckets (disjointness), which is how the registered
    q_inverted_index re-merges to an oracle-exact flat index at sf0.01.
    """
    toks = df.select(
        F.col(doc_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    # always >= 1: split on consecutive spaces emits empty-string tokens,
    # which must never be indexed as a term
    toks = toks.filter(F.length("term") >= max(min_term_len, 1))
    return (
        toks.withColumn(
            "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
        )
        .groupBy("term", "bucket")
        .agg(
            F.count_distinct("doc_id").alias("bucket_df"),
            F.sort_array(F.collect_set("doc_id")).alias("postings"),
        )
    )
