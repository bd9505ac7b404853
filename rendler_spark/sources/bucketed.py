"""Bucketed (co-located) tables: the shuffle-free-join storage layout.

At 100 TB the dominant recurring cost of the fact-fact join
(orders x lineitem; frontier x seen in the crawl) is re-shuffling both
sides on the join key EVERY run.  Spark's bucketing amortizes that
shuffle into the write: ``bucketBy(N, key)`` hash-partitions rows into N
buckets per table at write time and records the layout in the catalog;
a join of two tables bucketed by the same key into the same N needs NO
Exchange on either side (and with ``sortBy`` no Sort either — the
sort-merge join streams the pre-sorted buckets directly).  This is
Hive/Iceberg bucketing semantics: pmod(hash(key), N) — the same
hash-prefix co-location BASELINE.json's north rule names for the
seen-shard join, applied to the analytics tables.

The crawl engine's seen table achieves the same property differently
(Hive-style ``shard=`` partition dirs, engine.py), because its reader
prunes whole shards; bucketing is the right tool when BOTH join sides
are large and neither prunes.

Sandbox note: bucketed tables must live in the session catalog (the
bucket spec travels through the metastore, not the parquet footer), so
``write_bucketed`` targets a named database backed by an explicit
LOCATION — nothing leaks outside the caller's directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_bucket_db(spark: SparkSession, name: str, location: str) -> None:
    """Create (idempotently) a catalog database backed by ``location``."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name} LOCATION '{location}'")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed managed table (``db.table`` name):
    hash(key) -> n_buckets files per write-task set, optionally
    sorted-by-key inside each bucket so downstream sort-merge joins skip
    the Sort too."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table, format="parquet")


def colocated_join(
    spark: SparkSession, left: str, right: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-key/same-N bucketed tables.  With
    ``spark.sql.sources.bucketing.enabled`` (default true) the planner
    reads bucket i of each side into the same task — the plan carries no
    Exchange (pinned by tests/test_bucketed.py)."""
    return spark.table(left).join(spark.table(right), key, how)
