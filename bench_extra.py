#!/usr/bin/env python
"""Per-query noop-sink timing harness (guide §1.4) — the A/B tool for the
optimization round.  Does NOT replace bench.py (frozen driver contract);
prints per-query trial arrays so a single gVisor stall cannot define a
comparison.

Usage: python bench_extra.py [query ...]      (default: headline queries)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS,
     BENCH_EXTRA_TRIALS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

from rendler_spark.queries import QUERIES
from rendler_spark.session import get_spark

from rendler_spark.queries import HEADLINE as DEFAULT  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("BENCH_EXTRA_TRIALS", "3"))
    spark = get_spark(f"local[{cpus}]", "rendler_bench_extra", shuffle_partitions=cpus)
    out: dict = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        ts = []
        for _ in range(trials):
            t0 = time.monotonic()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.monotonic() - t0, 3))
        out[name] = {"min": min(ts), "trials": ts}
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
