"""As-of join operator (operators/asof.py) vs a plain-Python reference."""

import pandas as pd

from rendler_spark.operators.asof import asof_join


def test_asof_join_matches_reference(spark):
    left = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3],
            "lts": [10, 20, 30, 5, 50, 7],
            "lid": list(range(6)),
        }
    )
    right = pd.DataFrame(
        {"k": [1, 1, 2, 4], "rts": [10, 25, 40, 1], "v": [100.0, 250.0, 400.0, 9.0]}
    )
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    got = {
        r["lid"]: r["v"]
        for r in asof_join(ldf, rdf, "k", "lts", "rts", ["v"]).collect()
    }
    # reference: latest right v with rts <= lts per key; None if no match
    def ref(k, lts):
        cand = right[(right.k == k) & (right.rts <= lts)]
        return None if cand.empty else float(cand.sort_values("rts").iloc[-1]["v"])

    want = {row.lid: ref(row.k, row.lts) for row in left.itertuples()}
    assert got == want
    assert got[0] == 100.0   # boundary: rts == lts is inclusive
    assert got[3] is None    # key present, no prior right row
    assert got[5] is None    # key absent from right


def test_asof_matched_null_value_survives(spark):
    """A matched (latest prior) right row whose value is genuinely NULL
    must yield NULL — not skip back to an older non-NULL value (DuckDB
    ASOF semantics; r2 bug found by the advisor)."""
    import pyspark.sql.types as T

    ldf = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "lts": [15, 35], "lid": [0, 1]})
    )
    rschema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("rts", T.LongType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    rdf = spark.createDataFrame(
        [(1, 10, 100.0), (1, 30, None)], schema=rschema
    )
    got = {
        r["lid"]: r["v"]
        for r in asof_join(ldf, rdf, "k", "lts", "rts", ["v"]).collect()
    }
    assert got[0] == 100.0  # latest prior at lts=15 is (10, 100.0)
    assert got[1] is None   # latest prior at lts=35 is (30, NULL) — stays NULL


def test_range_join_inverted_interval_matches_nothing(spark):
    """hi <= lo intervals match nothing (and must not explode spurious
    buckets through a descending F.sequence)."""
    from rendler_spark.operators.rangejoin import range_join

    left = spark.createDataFrame(pd.DataFrame({"id": [1, 2], "v": [5.0, 50.0]}))
    iv = spark.createDataFrame(
        pd.DataFrame(
            {"band": ["ok", "inv", "empty"],
             "lo": [0.0, 90.0, 7.0], "hi": [10.0, 20.0, 7.0]}
        )
    )
    got = sorted(
        (r["id"], r["band"])
        for r in range_join(left, "v", iv, bucket_width=3.0).collect()
    )
    assert got == [(1, "ok")]


def test_range_join_narrow_interval_within_one_bucket(spark):
    """An interval narrower than eps (hi-lo < 1e-12) still hits its own
    bucket (the greatest() guard keeps the sequence ascending)."""
    from rendler_spark.operators.rangejoin import range_join

    left = spark.createDataFrame(pd.DataFrame({"id": [1], "v": [6.0]}))
    iv = spark.createDataFrame(
        pd.DataFrame({"band": ["tiny"], "lo": [6.0], "hi": [6.0 + 1e-13]})
    )
    got = range_join(left, "v", iv, bucket_width=3.0).collect()
    assert [(r["id"], r["band"]) for r in got] == [(1, "tiny")]


def test_range_join_boundaries(spark):
    """lo inclusive, hi exclusive; values covered by no interval drop;
    overlapping intervals multiply-match."""
    import pandas as pd
    import pyspark.sql.functions as F

    from rendler_spark.operators.rangejoin import range_join

    left = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3, 4], "v": [0.0, 10.0, 15.0, 99.0]})
    )
    iv = spark.createDataFrame(
        pd.DataFrame({"band": ["a", "b", "c"],
                      "lo": [0.0, 10.0, 12.0], "hi": [10.0, 20.0, 30.0]})
    )
    got = sorted(
        (r["id"], r["band"])
        for r in range_join(left, "v", iv, bucket_width=7.0).collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "b"), (3, "c")]
