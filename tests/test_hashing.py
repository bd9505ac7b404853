import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rendler_spark.hashing import mix, mix_int, splitmix64, to_i64


def test_deterministic_and_vectorized():
    a = splitmix64(np.arange(1000))
    b = splitmix64(np.arange(1000))
    assert (a == b).all()
    assert a.dtype == np.uint64


def test_scalar_matches_vector():
    vec = mix(42, 7, np.arange(10), 3)
    for i in range(10):
        assert mix_int(42, 7, i, 3) == int(vec[i])


def test_no_collisions_small_domain():
    h = splitmix64(np.arange(1_000_00))
    assert len(np.unique(h)) == len(h)


def test_order_sensitivity():
    assert mix_int(1, 2) != mix_int(2, 1)
    assert mix_int(1, 2, 3) != mix_int(1, 3, 2)


def test_to_i64_roundtrip():
    u = splitmix64(np.arange(16))
    assert (to_i64(u).view(np.uint64) == u).all()


@given(st.integers(min_value=0, max_value=2**64 - 1))
@settings(max_examples=200, deadline=None)
def test_splitmix_stable(x):
    assert int(splitmix64(np.uint64(x))) == int(splitmix64(np.uint64(x)))
