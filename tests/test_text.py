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
