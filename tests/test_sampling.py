"""Deterministic sampling / packing operators vs plain-Python references."""

import pandas as pd
import pyspark.sql.functions as F

from rendler_spark.functions.sampling import (
    _MIX_C,
    _MOD_IN,
    _MOD_OUT,
    det_mix,
    det_sample,
    pack_sequences,
)


def _py_mix(x: int) -> int:
    return ((x % _MOD_IN) * _MIX_C) % _MOD_OUT


def test_det_mix_matches_python_reference(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": [0, 1, 7, 12345, 2**31 - 1, 2**40 + 17]})
    )
    got = {r["k"]: r["m"] for r in df.select("k", det_mix("k").alias("m")).collect()}
    assert got == {k: _py_mix(k) for k in got}


def test_det_sample_is_reproducible_and_roughly_proportional(spark):
    df = spark.range(10_000).withColumnRenamed("id", "k")
    a = sorted(r["k"] for r in det_sample(df, "k", keep_buckets=13).collect())
    b = sorted(r["k"] for r in det_sample(df, "k", keep_buckets=13).collect())
    assert a == b  # bit-identical across runs: no RNG state anywhere
    # ~13/128 ≈ 10.2% with multiplicative-hash spread
    assert 0.06 < len(a) / 10_000 < 0.15
    # monotone: growing the keep set only ADDS rows (stable sampling —
    # the property that lets a pipeline scale a sample up without churn)
    bigger = set(r["k"] for r in det_sample(df, "k", keep_buckets=26).collect())
    assert set(a) <= bigger


def test_pack_sequences_matches_greedy_reference(spark):
    pdf = pd.DataFrame({"doc": range(200), "ntok": [(7 * i) % 900 + 10 for i in range(200)]})
    df = spark.createDataFrame(pdf)
    got = {
        r["doc"]: (r["shard"], r["chunk_id"])
        for r in pack_sequences(df, "doc", "ntok", budget=2000, n_shards=4).collect()
    }
    # reference: per shard in doc order, chunk = floor(preceding_total/budget)
    by_shard: dict[int, list[int]] = {}
    for doc in sorted(pdf["doc"]):
        by_shard.setdefault(_py_mix(doc) % 4, []).append(doc)
    want = {}
    for shard, docs in by_shard.items():
        run = 0
        for doc in docs:
            want[doc] = (shard, run // 2000)
            run += int(pdf["ntok"][doc])
    assert got == want
    # every chunk's token total <= budget unless it is a single long doc
    totals: dict[tuple, list[int]] = {}
    for doc, key in got.items():
        totals.setdefault(key, []).append(int(pdf["ntok"][doc]))
    for key, toks in totals.items():
        assert sum(toks) <= 2000 + max(toks)


def test_pack_sequences_window_is_shard_partitioned(spark):
    """Scale property: the packing window partitions by shard (parallel),
    never a single global-order partition."""
    df = spark.range(100).select(
        F.col("id").alias("doc"), (F.col("id") % 50 + 1).alias("ntok")
    )
    out = pack_sequences(df, "doc", "ntok", budget=100, n_shards=4)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "hashpartitioning(shard" in plan
    assert "SinglePartition" not in plan


def test_det_mix_sql_twin_matches_duckdb_hypothesis():
    """det_mix_sql is the oracle-side twin of det_mix: property-check the
    Python reference against DuckDB's evaluation of the SQL expression
    over random non-negative int64 keys (no Spark needed — det_mix itself
    is pinned to the same reference above)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rendler_spark.functions.sampling import det_mix_sql

    con = duckdb.connect()

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=64))
    def prop(keys):
        rows = con.sql(
            f"SELECT k, {det_mix_sql('k')} AS m FROM (SELECT unnest(?) AS k)",
            params=[keys],
        ).fetchall()
        for k, m in rows:
            assert m == _py_mix(k)

    prop()
    con.close()
