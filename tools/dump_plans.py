#!/usr/bin/env python
"""Dump .explain('formatted') for named queries to plans/r06/<q>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys

from rendler_spark.queries import QUERIES
from rendler_spark.session import get_spark

from rendler_spark.queries import HEADLINE as DEFAULT  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.makedirs("plans/r06", exist_ok=True)
    spark = get_spark(f"local[{cpus}]", "rendler_plans", shuffle_partitions=cpus)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(f"plans/r06/{name}_{tag}.txt", "w") as f:
            f.write(plan)
        print(name, "->", f"plans/r06/{name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
