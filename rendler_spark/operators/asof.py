"""As-of (point-in-time) join — composed from built-in DataFrame ops.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the reference engine has
none either, but a crawl-analytics user asks "what was the last X at the
time of Y" constantly (last robots fetch before this page fetch, last
budget change before this wave).  Per the custom-operator ladder this is
case (a): a composition of existing operators, not a UDF —

    union(left tagged 1, right tagged 0)
    -> window per key ordered by (ts, tag):   1 shuffle, no join at all
       last(struct(values), ignorenulls=True) over rows UNBOUNDED
       PRECEDING..CURRENT — the ROW struct is non-null for every right
       row even when its value fields are NULL, so a matched row's NULL
       survives (last(value_col) directly would skip back to an older
       non-null value, diverging from DuckDB ASOF semantics)
    -> keep left rows: each now carries the latest right row with
       right_ts <= left_ts (right sorts before left at equal ts, so the
       boundary is inclusive, matching ASOF semantics); extract the
       struct fields last.

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
    """Left as-of join: every left row + the ``value_cols`` of the latest
    right row whose ``right_ts`` <= ``left_ts`` within the same ``key``
    (all null when no prior right row exists; a matched row's own NULL
    value stays NULL)."""
    lcols = left.columns
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    r_tag = right.select(
        key,
        F.col(right_ts).alias("_ts"),
        F.struct(*value_cols).alias("_rv"),
        F.lit(0).cast("int").alias("_tag"),
    )
    rv_type = r_tag.schema["_rv"].dataType
    l_tag = (
        left.withColumn("_ts", F.col(left_ts))
        .withColumn("_tag", F.lit(1).cast("int"))
        .withColumn("_rv", F.lit(None).cast(rv_type))
    )
    for c in lcols:
        if c != key:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(ltypes[c]))
    cols = [key, "_ts", "_tag", "_rv", *[c for c in lcols if c != key]]
    unioned = l_tag.select(*cols).unionByName(r_tag.select(*cols))
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_rv", F.last("_rv", ignorenulls=True).over(w))
    return carried.filter(F.col("_tag") == 1).select(
        *lcols, *[F.col("_rv").getField(c).alias(c) for c in value_cols]
    )
