import pytest

from rendler_spark.functions import text as T

ROWS = [
    (1, "the cat sat on the mat, happily!"),
    (2, "spark shuffle"),
    (3, "x " * 20 + "the end"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_token_and_char_counts(spark, docs):
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_chars"])
        for r in docs.select("doc_id", T.token_count("text"), T.char_count("text")).collect()
    }
    for i, txt in ROWS:
        assert got[i] == (len(txt.split()), len(txt))


def test_stopword_and_punct(spark, docs):
    r = {
        x["doc_id"]: x
        for x in docs.select(
            "doc_id", T.stopword_hits("text"), T.punct_ratio("text")
        ).collect()
    }
    assert r[1]["stopword_hits"] == 2  # "the" twice
    assert r[2]["stopword_hits"] == 0
    assert r[1]["punct_ratio"] == pytest.approx(2 / len(ROWS[0][1]))
    assert r[2]["punct_ratio"] == 0.0


def test_quality_and_fingerprint(spark, docs):
    rows = {
        r["doc_id"]: r
        for r in docs.select("doc_id", T.quality_score("text"), T.fingerprint("text")).collect()
    }
    assert 0.0 <= rows[1]["quality"] <= 1.0
    # short doc penalized vs long doc with stopwords
    assert rows[2]["quality"] < rows[3]["quality"]
    import hashlib

    assert rows[1]["fp"] == hashlib.md5(ROWS[0][1].encode()).hexdigest()


def test_inverted_postings_bucketed_bounded_and_exact(spark):
    """Reducer-bomb guard: a stopword-grade term present in EVERY doc
    must land in many (term, bucket) cells, each holding only its
    bucket's share of the postings — and the bucketed rows must re-merge
    to exactly the flat collect_set index."""
    import pandas as pd
    import pyspark.sql.functions as F

    n, B = 200, 8
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            # "hot" in every doc; "rare7" only in doc_id % 29 == 0
            "text": [
                "hot filler" + (" rare7" if i % 29 == 0 else "") for i in range(n)
            ],
        }
    )
    d = spark.createDataFrame(pdf)
    b = T.inverted_postings(d, "doc_id", "text", n_buckets=B).collect()
    hot = [r for r in b if r["term"] == "hot"]
    assert len(hot) == B  # the hot term split across all buckets
    sizes = [len(r["postings"]) for r in hot]
    assert max(sizes) <= 3 * n // B  # no cell holds a corpus-scale share
    assert all(r["bucket_df"] == len(r["postings"]) for r in b)
    # disjoint + exact: merged buckets == flat index, for every term
    merged = {}
    dfs = {}
    for r in b:
        merged.setdefault(r["term"], []).extend(r["postings"])
        dfs[r["term"]] = dfs.get(r["term"], 0) + r["bucket_df"]
    flat = {
        r["term"]: (r["df"], r["postings"])
        for r in d.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        )
        .groupBy("term")
        .agg(
            F.count_distinct("doc_id").alias("df"),
            F.sort_array(F.collect_set("doc_id")).alias("postings"),
        )
        .collect()
    }
    assert set(merged) == set(flat)
    for term, (want_df, want_postings) in flat.items():
        assert dfs[term] == want_df
        assert sorted(merged[term]) == want_postings
