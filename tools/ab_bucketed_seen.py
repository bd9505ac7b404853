#!/usr/bin/env python
"""A/B: crawl wave loop with the bucketed seen mirror ON vs OFF.

Interleaved trials (A,B,A,B) on the bench-tier web so host weather hits
both arms; reports per-trial seconds + min per arm.  Writes one JSON
line; paste the row into BENCH/BASELINE.md.

Usage: python tools/ab_bucketed_seen.py [waves] [hosts] [budget] [render_iters]

The optional budget/render_iters arguments configure the LONG-CRAWL
variant: a small per-host budget with a near-free render makes the
anti-join a visible cost fraction while seen grows wave over wave —
the regime where the mirror's O(wave)-vs-O(seen) advantage surfaces
inside the engine itself (the default bench-tier config measures the
other end of the crossover, where mirror maintenance dominates).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    waves = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 48
    render_iters = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    from rendler_spark.engine import CrawlEngine
    from rendler_spark.session import get_spark
    from rendler_spark.synthweb import WebConfig

    spark = get_spark("local[32]", "ab_bucketed_seen", shuffle_partitions=32)
    kw = {"render_iters": render_iters} if render_iters else {}
    cfg = WebConfig(
        n_hosts=hosts, pages_per_host=256, max_links=12,
        n_seeds=min(64, hosts), budget=budget, **kw,
    )

    def trial(bucketed: bool) -> tuple[float, int]:
        wh = tempfile.mkdtemp(prefix="ab_seenb_")
        try:
            eng = CrawlEngine(
                spark, cfg, wh, n_partitions=16, seen_bucketed=bucketed
            )
            eng.init()
            t0 = time.monotonic()
            stats = eng.run_waves(0, waves)
            sec = time.monotonic() - t0
            return sec, sum(s["n_fetched"] for s in stats)
        finally:
            shutil.rmtree(wh, ignore_errors=True)

    out = {"waves": waves, "hosts": hosts, "on": [], "off": [], "fetched": None}
    for _ in range(2):  # interleaved A,B,A,B
        s_on, f_on = trial(True)
        s_off, f_off = trial(False)
        assert f_on == f_off, (f_on, f_off)  # same crawl either way
        out["on"].append(round(s_on, 2))
        out["off"].append(round(s_off, 2))
        out["fetched"] = f_on
    out["min_on"] = min(out["on"])
    out["min_off"] = min(out["off"])
    out["speedup_min"] = round(out["min_off"] / out["min_on"], 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
