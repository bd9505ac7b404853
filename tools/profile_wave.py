#!/usr/bin/env python
"""Per-phase wall-clock profile of the crawl wave loop (guide §1: measure
first).  Runs the SAME bench-tier config as bench.py's crawl trial with
CrawlEngine.profile=True and prints a phase x wave table plus warehouse
file counts — the evidence base for OPTIMIZATION_r06.md.

Usage: python tools/profile_wave.py [waves]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from rendler_spark.engine import CrawlEngine
from rendler_spark.session import get_spark
from rendler_spark.synthweb import WebConfig


def main() -> None:
    waves = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"local[{cpus}]", "rendler_profile", shuffle_partitions=cpus)
    cfg = WebConfig(
        n_hosts=256, pages_per_host=256, max_links=12, n_seeds=64, budget=48
    )
    wh = tempfile.mkdtemp(prefix="rendler_prof_wh_")
    try:
        eng = CrawlEngine(spark, cfg, wh, n_partitions=min(cpus, 16))
        eng.profile = True
        eng.init()
        t0 = time.monotonic()
        stats = eng.run_waves(0, waves)
        total = time.monotonic() - t0
        print(json.dumps({"total_s": round(total, 2),
                          "fetched": sum(s["n_fetched"] for s in stats),
                          "wave_ms": [s["wall_ms"] for s in stats]}))
        if not eng.phase_times:
            print("no completed waves; nothing to profile")
            return
        # phase table
        keys = [k for k in eng.phase_times[0] if k != "wave"]
        print(f"{'phase':22s}" + "".join(f"w{p['wave']:<7d}" for p in eng.phase_times))
        for k in keys:
            print(f"{k:22s}" + "".join(f"{p.get(k, 0):<8.2f}" for p in eng.phase_times))
        sums = {k: sum(p.get(k, 0) for p in eng.phase_times) for k in keys}
        print("-- phase totals (desc):")
        for k, v in sorted(sums.items(), key=lambda kv: -kv[1]):
            print(f"  {k:22s}{v:8.2f}s")
        # warehouse file census
        n_files = sum(len(fs) for _, _, fs in os.walk(wh))
        print(f"warehouse files: {n_files}")
        for tbl in ("seen", "frontier", "edges", "images", "fetch_log"):
            d = os.path.join(wh, tbl)
            if os.path.isdir(d):
                nf = sum(
                    1 for _, _, fs in os.walk(d) for f in fs
                    if f.endswith(".parquet")
                )
                print(f"  {tbl}: {nf} parquet files")
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
