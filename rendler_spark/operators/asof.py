"""As-of (point-in-time) join — composed from built-in DataFrame ops.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the reference engine has
none either, but a crawl-analytics user asks "what was the last X at the
time of Y" constantly (last robots fetch before this page fetch, last
budget change before this wave).  Per the custom-operator ladder this is
case (a): a composition of existing operators, not a UDF —

    union(left tagged 1, right tagged 0)
    -> window per key ordered by (ts, tag):   1 shuffle, no join at all
       last(value, ignorenulls=True) over rows UNBOUNDED PRECEDING..CURRENT
    -> keep left rows: each now carries the latest right value with
       right_ts <= left_ts (right sorts before left at equal ts, so the
       boundary is inclusive, matching ASOF semantics).

Scale shape: ONE hash-partition shuffle on the key + a per-partition sort —
the same cost class as the politeness window; no broadcast, no range join
explosion, skew handled by AQE like any other window.  Requires the right
side deduplicated per (key, ts) (pass it through a groupBy first);
otherwise "the" value at a timestamp is ill-defined in any engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: every left row + the latest right ``value_cols``
    whose ``right_ts`` <= ``left_ts`` within the same ``key`` (null when
    no prior right row exists)."""
    lcols = left.columns
    l_tag = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_tag", F.lit(1).cast("int")
    )
    for c in value_cols:
        l_tag = l_tag.withColumn(c, F.lit(None))
    r_tag = right.select(
        key, F.col(right_ts).alias("_ts"), *value_cols
    ).withColumn("_tag", F.lit(0).cast("int"))
    for c in lcols:
        if c not in (key,):
            r_tag = r_tag.withColumn(c, F.lit(None))
    unioned = l_tag.select(key, "_ts", "_tag", *value_cols, *[c for c in lcols if c != key]).unionByName(
        r_tag.select(key, "_ts", "_tag", *value_cols, *[c for c in lcols if c != key])
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned
    for c in value_cols:
        carried = carried.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return carried.filter(F.col("_tag") == 1).select(*lcols, *value_cols)
