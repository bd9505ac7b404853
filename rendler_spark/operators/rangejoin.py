"""Range (interval) join — bucketized to an equi-join.

"Which band/interval does this value fall in" joins naively plan as a
BroadcastNestedLoopJoin (every row x every interval).  Fine for a handful
of intervals; quadratic death for many.  The scale path: chop the value
domain into fixed-width buckets, explode every interval into the buckets
it overlaps, bucket the probe values, and run a plain hash equi-join on
the bucket id — the per-row comparison count drops from |intervals| to
the handful sharing a bucket, and Catalyst gets a shuffle-hash/broadcast
join it knows how to scale.  The exact range predicate re-checks after
the join (bucket overlap is a superset), so results are identical to the
naive plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def range_join(
    left: DataFrame,
    val_col: str,
    intervals: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1.0,
) -> DataFrame:
    """Join ``left`` rows to every interval with lo <= val < hi via
    bucket equi-join + exact post-filter.  ``intervals`` must not carry a
    column named ``_bucket``.

    INNER semantics only: the exact range predicate is a post-join
    filter, so an outer mode would silently degrade to inner (unmatched
    rows get NULL lo/hi and are filtered out) — to keep unmatched left
    rows, anti-join the result's keys back against ``left``.  Inverted
    or empty intervals (hi <= lo) match nothing by definition and are
    dropped before the explode (a descending F.sequence would otherwise
    fabricate spurious buckets)."""
    b = intervals.filter(F.col(hi_col) > F.col(lo_col)).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width),
                F.greatest(
                    F.floor(F.col(lo_col) / bucket_width),
                    F.floor((F.col(hi_col) - 1e-12) / bucket_width),
                ),
            )
        ),
    )
    probe = left.withColumn("_bucket", F.floor(F.col(val_col) / bucket_width))
    joined = probe.join(b, "_bucket").filter(
        (F.col(val_col) >= F.col(lo_col)) & (F.col(val_col) < F.col(hi_col))
    )
    return joined.drop("_bucket")
