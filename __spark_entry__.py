"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``rendler_spark.queries`` (SURVEY.md §2's
"Driver check" column, plus training-data ops over documents/embeddings);
non-SQL-expressible operators (MinHash/SimHash/session_window) have no
oracle entry → rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rendler_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1-shaped aggregate (SURVEY.md §2 D1) on
    sf0.001 — the queue-statistics analogue of the crawl engine."""
    return Q.q_groupby_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return dict(Q.ORACLE)
