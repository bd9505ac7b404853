"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "rendler_spark",
    shuffle_partitions: int | None = None,
    warehouse_tmp: str | None = None,
) -> SparkSession:
    """Session tuned for the crawl workload:

    * AQE on (runtime coalescing + skew-join splitting — SURVEY.md §4.2);
    * Arrow batches capped at 512 rows so image-bytes batches stay ~tens
      of MB regardless of row width (SURVEY.md §4.3);
    * shuffle partitions default to 2x cores locally (at cluster scale
      AQE coalesces down from a high initial count).
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
