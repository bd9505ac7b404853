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
