"""Lineage-seq encoding: exact BFS order at ANY depth (no int64 overflow).

Round-1 finding: ``seq = parent*16 + pos`` on int64 silently wraps at depth
~14 with 512 seeds, corrupting ordering and first-wins dedup.  The fix
(crawl_semantics rule 1) encodes lineage as a hex string — these tests pin
that the string order equals the true lineage order at depth 20+, and that
Spark's string sort agrees with Python's.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from rendler_spark.crawl_semantics import SEQ_BASE, child_seq, seed_seq

paths = st.tuples(
    st.integers(min_value=0, max_value=2**62),  # seed id (far beyond 512)
    st.lists(st.integers(min_value=0, max_value=SEQ_BASE - 1),
             min_size=0, max_size=24),  # link positions to depth 24
)


def encode(seed: int, positions: list[int]) -> str:
    s = seed_seq(seed)
    for p in positions:
        s = child_seq(s, p)
    return s


@settings(max_examples=300, deadline=None)
@given(a=paths, b=paths)
def test_equal_depth_string_order_is_lineage_order(a, b):
    """For rows of equal depth (the only comparisons (depth, seq) makes),
    lexicographic seq order == lexicographic (seed, positions) order."""
    (sa, pa), (sb, pb) = a, b
    if len(pa) != len(pb):
        pb = (pb + [0] * len(pa))[: len(pa)]  # force equal depth
    ea, eb = encode(sa, pa), encode(sb, pb)
    assert len(ea) == len(eb)
    assert (ea < eb) == ((sa, pa) < (sb, pb))
    assert (ea == eb) == ((sa, pa) == (sb, pb))


@settings(max_examples=100, deadline=None)
@given(p=paths)
def test_prefix_free_and_depth_recoverable(p):
    seed, positions = p
    e = encode(seed, positions)
    assert len(e) == 16 + len(positions)  # depth == len(seq) - 16


def test_spark_sort_agrees_with_python(spark):
    """Spark's UTF-8 binary string sort must equal Python's code-point
    sort on lineage seqs (ASCII hex) — depth-20 rows included."""
    import random

    rng = random.Random(9)
    rows = []
    for i in range(500):
        depth = rng.randint(18, 22)
        rows.append(
            (depth, encode(rng.randrange(600), [rng.randrange(16) for _ in range(depth)]))
        )
    df = spark.createDataFrame(rows, "depth int, seq string")
    got = [(r["depth"], r["seq"]) for r in df.orderBy("depth", "seq").collect()]
    assert got == sorted(rows)


def test_deep_crawl_first_wins_matches_oracle(spark):
    """Depth-20 admission: engine first-wins dedup over deep-lineage
    candidates picks the same winners the oracle's sorted admission does."""
    import sys

    import pandas as pd
    import pyspark.sql.functions as F

    from rendler_spark.engine import first_wins

    rng = __import__("random").Random(4)
    cand = []
    for url_id in range(40):
        for _ in range(5):  # 5 competing discoveries per URL
            depth = rng.randint(19, 21)
            cand.append(
                {
                    "url": f"http://h.test/p{url_id}",
                    "host": "h.test",
                    "depth": depth,
                    "seq": encode(rng.randrange(600), [rng.randrange(16) for _ in range(depth)]),
                }
            )
    df = spark.createDataFrame(pd.DataFrame(cand))
    got = {
        r["url"]: (r["depth"], r["seq"]) for r in first_wins(df).collect()
    }
    want = {}
    for c in sorted(cand, key=lambda c: (c["depth"], c["seq"])):
        want.setdefault(c["url"], (c["depth"], c["seq"]))
    assert got == want
