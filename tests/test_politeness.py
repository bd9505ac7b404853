import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from rendler_spark.operators.politeness import budget_flagged, budgeted_topk


def _frontier_pdf(seed=3, n=500, hosts=6):
    rng = np.random.default_rng(seed)
    h = rng.integers(0, hosts, n)
    # mega-host skew: half the rows land on host 0
    h[: n // 2] = 0
    return pd.DataFrame(
        {
            "url": [f"http://h{h[i]}.test/p{i}" for i in range(n)],
            "host": [f"h{x}.test" for x in h],
            "depth": rng.integers(0, 4, n).astype("int32"),
            "seq": rng.permutation(n).astype("int64"),
            "eff_budget": np.full(n, 7, dtype="int32"),
        }
    )


def _naive_fetch(pdf):
    out = set()
    for host, grp in pdf.groupby("host"):
        rows = grp.sort_values(["depth", "seq"]).head(int(grp["eff_budget"].iloc[0]))
        out.update(rows["url"])
    return out


def test_budget_flagged_exact_under_skew(spark):
    """Salted two-phase == naive per-host top-K, including on the skewed
    host — exactness is what lets the salting exist at all."""
    pdf = _frontier_pdf()
    df = spark.createDataFrame(pdf)
    for n_salt in (1, 4, 16):
        flagged = budget_flagged(df, n_salt=n_salt)
        got = {r["url"] for r in flagged.filter("_fetch").collect()}
        assert got == _naive_fetch(pdf), f"n_salt={n_salt}"
        # deferred = complement, nothing lost
        deferred = {r["url"] for r in flagged.filter("NOT _fetch").collect()}
        assert got | deferred == set(pdf["url"]) and not (got & deferred)


def test_budgeted_topk_pair_api(spark):
    pdf = _frontier_pdf(seed=11)
    df = spark.createDataFrame(pdf)
    fetch, deferred = budgeted_topk(df, n_salt=8)
    assert {r["url"] for r in fetch.collect()} == _naive_fetch(pdf)
    assert fetch.count() + deferred.count() == len(pdf)


def test_varying_budget_per_host(spark):
    pdf = _frontier_pdf(seed=5)
    # crawl-delay style: host 0 budget 2, others 7
    pdf.loc[pdf["host"] == "h0.test", "eff_budget"] = 2
    df = spark.createDataFrame(pdf)
    got = {r["url"] for r in budget_flagged(df, n_salt=8).filter("_fetch").collect()}
    assert got == _naive_fetch(pdf)
    h0 = sum(1 for u in got if u.startswith("http://h0.test"))
    assert h0 == 2
