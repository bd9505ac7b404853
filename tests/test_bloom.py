import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rendler_spark.operators import bloom

M_BITS = 1 << 14
K = 6


def test_no_false_negatives_bulk():
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**63), 2**63 - 1, 2000, dtype=np.int64)
    bits = bloom.build_bits(keys, M_BITS, K)
    assert bloom.contains(bits, keys, K).all()


def test_fp_rate_reasonable():
    rng = np.random.default_rng(8)
    keys = rng.integers(-(2**63), 2**63 - 1, 1000, dtype=np.int64)
    probe = rng.integers(-(2**63), 2**63 - 1, 20_000, dtype=np.int64)
    bits = bloom.build_bits(keys, M_BITS, K)
    fp = bloom.contains(bits, probe, K).mean()
    # n=1000, m=16384, k=6 -> theoretical fp ~ 0.55% ; allow 2x (FIXTURES §5)
    assert fp < 0.012, fp


def test_empty_bits_rejects_everything():
    bits = bloom.empty_bits(M_BITS)
    assert not bloom.contains(bits, np.arange(100, dtype=np.int64), K).any()


def test_sharded_contains():
    rng = np.random.default_rng(9)
    keys = rng.integers(-(2**63), 2**63 - 1, 500, dtype=np.int64)
    n_shards = 8
    sh = bloom.shard_of(keys, n_shards)
    shard_bits = {
        int(s): bloom.build_bits(keys[sh == s], M_BITS, K) for s in np.unique(sh)
    }
    assert bloom.contains_sharded(shard_bits, keys, n_shards, K).all()
    # keys routed to a missing shard are definitely-new
    assert not bloom.contains_sharded({}, keys, n_shards, K).any()


def test_or_bits_incremental():
    a = np.arange(100, dtype=np.int64)
    b = np.arange(100, 200, dtype=np.int64)
    bits = bloom.or_bits(bloom.build_bits(a, M_BITS, K), bloom.build_bits(b, M_BITS, K))
    assert bloom.contains(bits, np.concatenate([a, b]), K).all()


@given(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=0, max_size=500))
@settings(max_examples=50, deadline=None)
def test_no_false_negatives_property(xs):
    """FIXTURES.md §5: zero false negatives, any key set."""
    keys = np.array(xs, dtype=np.int64)
    bits = bloom.build_bits(keys, M_BITS, K)
    assert bloom.contains(bits, keys, K).all()


def test_shard_of_matches_spark_pmod(spark):
    """shard routing must agree with JVM-side pmod(xxhash64, n) exactly."""
    import pyspark.sql.functions as F

    df = spark.range(500).select(
        F.xxhash64("id").alias("h"), F.pmod(F.xxhash64("id"), F.lit(16)).alias("p")
    )
    rows = df.collect()
    h = np.array([r["h"] for r in rows], dtype=np.int64)
    p = np.array([r["p"] for r in rows])
    assert (bloom.shard_of(h, 16) == p).all()
