"""Event-time windows over event streams (SURVEY.md §2I I2/I3).

Each builder works identically on a static DataFrame and a streaming one
(``spark.readStream``) — the Structured Streaming contract.  On streams,
``with_watermark`` bounds state for late data; the crawl engine itself uses
the deterministic deferred-rows policy instead (crawl_semantics rule 2),
which is its "late data" story.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def tumbling_counts(
    df: DataFrame, ts_col: str = "ts", duration: str = "1 hour"
) -> DataFrame:
    return (
        df.groupBy(F.window(ts_col, duration).alias("w"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "n", "sv")
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )


def session_counts(
    df: DataFrame, key: str = "user_id", ts_col: str = "ts", gap: str = "10 minutes"
) -> DataFrame:
    return (
        df.groupBy(key, F.session_window(ts_col, gap).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(key, F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "n")
    )


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "30 minutes"):
    """Late-data bound for streaming inputs (no-op semantic on batch).
    Watermarks require TIMESTAMP (with timezone); NTZ columns are cast —
    the session pins UTC, so the instant is unchanged."""
    return df.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withWatermark(
        ts_col, delay
    )


def stream_events_dir(spark, path: str, schema) -> DataFrame:
    """File-source stream over a directory of event parquet files."""
    return spark.readStream.schema(schema).parquet(path)
