"""Deterministic sampling / corpus-mixing / packing operators.

A 100 TB training-data pipeline does three things between "curated corpus"
and "training shards" that the classic operator inventory misses:

* **deterministic sampling** — reproducible subsets without an RNG state
  to ship (rerunning the pipeline must pick the SAME rows; Spark's
  ``df.sample`` is seed-stable only per partitioning).  We hash the key
  with integer arithmetic that is expressible IDENTICALLY in ANSI SQL, so
  the driver's DuckDB oracle can verify the exact row set.
* **corpus mixing** — per-group quotas (e.g. re-balance languages or
  sources to target proportions) with a deterministic preference order.
* **sequence packing** — greedy token-budget chunking of documents into
  training sequences.  Packing is inherently sequential, so it is done
  PER SHARD (hash of the key): each shard packs independently inside one
  window partition — at corpus scale every shard is a training shard
  anyway, and the window never sees a global sort.

All three are pure JVM Column expressions (no UDFs, no RNG): they scan,
one hash-shuffle each, and whole-stage codegen applies.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, Window

#: Knuth multiplicative constant; the mix below stays < 2^63 for any
#: non-negative int64 input ((x % 2^31) * c <= 2^31 * 2654435761 < 2^63).
_MIX_C = 2654435761
_MOD_IN = 2147483648  # 2^31
_MOD_OUT = 4294967296  # 2^32


def det_mix(col: Column | str) -> Column:
    """Deterministic ~uniform mix of a non-negative integer key into
    [0, 2^32): ``((x % 2^31) * 2654435761) % 2^32``.  Plain modular
    arithmetic — the SQL twin is the same expression, so both engines
    compute bit-identical buckets (unlike xxhash64, which DuckDB lacks)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.pmod(c, F.lit(_MOD_IN)) * F.lit(_MIX_C), F.lit(_MOD_OUT))


def det_mix_sql(expr: str) -> str:
    """The DuckDB/ANSI twin of :func:`det_mix` for oracle queries."""
    return f"(({expr}) % {_MOD_IN}) * {_MIX_C} % {_MOD_OUT}"


def det_sample(df, key_col: str, keep_buckets: int, n_buckets: int = 128):
    """Keep rows whose mixed key lands in the first ``keep_buckets`` of
    ``n_buckets`` equal hash buckets (~keep/n of the data, exactly
    reproducible).  Buckets take the mix's HIGH bits (low bits of a
    multiplicative hash are weak)."""
    bucket = F.floor(det_mix(key_col) / F.lit(_MOD_OUT // n_buckets))
    return df.filter(bucket < keep_buckets)


def pack_sequences(
    df,
    key_col: str,
    tokens_col: Column | str,
    budget: int,
    n_shards: int = 64,
):
    """Assign each row a (shard, chunk_id): documents are ordered
    deterministically inside ``n_shards`` hash shards and greedily
    chunked so each chunk's cumulative token count stays <= ``budget``
    (offset-based: a chunk boundary falls wherever the running total
    crosses a budget multiple; single docs longer than the budget get
    their own chunk number).  The window partitions by shard — no global
    sort, shards pack in parallel."""
    tok = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    shard = F.pmod(det_mix(key_col), F.lit(n_shards)).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("shard", shard).withColumn("_run", F.sum(tok).over(w))
    chunk = F.floor((F.col("_run") - tok) / F.lit(budget)).cast("long")
    return out.withColumn("chunk_id", chunk).drop("_run")
