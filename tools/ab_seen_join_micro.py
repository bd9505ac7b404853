#!/usr/bin/env python
"""A/B microbench: the per-wave seen anti-join in isolation, at a seen
size where the seen side DOMINATES the join (the 100 TB shape).

The wave-loop A/B (tools/ab_bucketed_seen.py) measures the whole engine,
where at sandbox scale the seen table is tiny (~50k rows after 6 waves)
and mirror maintenance outweighs the shuffle it deletes.  This bench
isolates the recurring join itself against a seen table of N_SEEN rows:

  off: seen as plain parquet — every join re-shuffles seen + cand
  on:  seen as a url-bucketed table — seen side Exchange-free,
       only the wave-sized cand shuffles

Interleaved trials; reports per-join seconds (median of n_iters) per arm.
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402


def main() -> None:
    n_seen = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_cand = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    buckets = 16

    from rendler_spark.session import get_spark

    spark = get_spark("local[32]", "ab_seen_join", shuffle_partitions=32)
    for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ):
        spark.conf.set(k, "-1")

    def urls(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(
                F.lit("http://h"),
                (F.col("id") % 4096).cast("string"),
                F.lit(".test/p"),
                F.col("id").cast("string"),
            ).alias("url")
        ).withColumn("url_hash", F.xxhash64("url")).withColumn(
            "shard", F.pmod("url_hash", F.lit(16)).cast("int")
        )

    tmp = tempfile.mkdtemp(prefix="ab_seen_micro_")
    try:
        seen = urls(0, n_seen)
        # off arm storage: plain parquet (the warehouse layout)
        plain = f"{tmp}/seen_plain"
        seen.write.mode("overwrite").parquet(plain)
        # on arm storage: bucketed catalog table
        spark.sql(
            f"CREATE DATABASE IF NOT EXISTS ab_seenb LOCATION '{tmp}/db'"
        )
        (
            seen.repartition(buckets, "url")
            .write.mode("overwrite")
            .bucketBy(buckets, "url")
            .sortBy("url")
            .saveAsTable("ab_seenb.seen_b", format="parquet")
        )

        # wave candidates: half already-seen, half new
        cand = urls(n_seen - n_cand // 2, n_seen + n_cand // 2).persist()
        expected = cand.count() - n_cand // 2  # new rows survive the anti

        def join_off():
            s = spark.read.parquet(plain)
            return cand.join(
                s.select("url_hash", "url"), ["url_hash", "url"], "left_anti"
            )

        def join_on():
            s = spark.table("ab_seenb.seen_b")
            return cand.join(s.select("url"), ["url"], "left_anti")

        t_on, t_off = [], []
        for _ in range(iters):
            t0 = time.monotonic()
            assert join_on().count() == expected
            t_on.append(time.monotonic() - t0)
            t0 = time.monotonic()
            assert join_off().count() == expected
            t_off.append(time.monotonic() - t0)
        out = {
            "n_seen": n_seen,
            "n_cand": n_cand,
            "on": [round(x, 3) for x in t_on],
            "off": [round(x, 3) for x in t_off],
            "median_on": round(statistics.median(t_on), 3),
            "median_off": round(statistics.median(t_off), 3),
        }
        out["speedup"] = round(out["median_off"] / out["median_on"], 3)
        print(json.dumps(out))
    finally:
        spark.sql("DROP DATABASE IF EXISTS ab_seenb CASCADE")
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
