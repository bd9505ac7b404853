#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule: N vs 4N executors).

No real cluster exists in this sandbox, so per the driver instruction the
same job runs at two parallelism levels on the SAME input: ``local[N]`` vs
``local[4N]`` on one 32-core box.

Protocol (variance-hardened — this sandbox's wall clock is noisy):
  1. RAMP once: grow the frontier for RAMP_WAVES waves at local[32] and
     checkpoint.  This fixes an identical input state for every trial.
  2. For each parallelism level, REPS times, in interleaved order
     (N, 4N, 4N, N, ...): truncate the warehouse back to the checkpoint
     version, restart a fresh SparkSession at that level, resume the crawl
     for MEASURE_WAVES waves (exact resume — the continuation re-fetches
     the same URL set every time), record fetched-URLs/sec of the wave
     loop only (session startup + bloom rebuild excluded).
  3. Report per-trial numbers, medians, and
     efficiency = tput(4N) / (4 * tput(N)).

Run:  python BENCH/scaling.py [--quick]
      (or via spark-submit: BENCH/submit.sh BENCH/scaling.py)
Writes BENCH/scaling_runs.json; BENCH/BASELINE.md summarizes.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from rendler_spark.engine import CrawlEngine  # noqa: E402
from rendler_spark.session import get_spark  # noqa: E402
from rendler_spark.sources.tables import Warehouse  # noqa: E402
from rendler_spark.synthweb import WebConfig  # noqa: E402

QUICK = "--quick" in sys.argv

WH = "/tmp/rendler_scaling_wh"
# N vs 4N pairs (driver instruction allows any): (4,16) is the primary
# evidence pair — at 32 concurrent tasks this gVisor sandbox oversubscribes
# (32 JVM task threads + 32 Python UDF workers on 32 vCPUs) and adds
# erratic multi-10s stalls that say nothing about the engine; (8,32) is
# reported too.
PAIRS = [(4, 16), (8, 32)]
REPS = {(4, 16): 2, (8, 32): 2} if QUICK else {(4, 16): 3, (8, 32): 2}
RAMP_WAVES = 3 if QUICK else 4
MEASURE_WAVES = 1  # one steady-state wave (~65k fetches at full config)

CFG = WebConfig(
    n_hosts=256 if QUICK else 512,
    pages_per_host=256 if QUICK else 512,
    max_links=12,
    n_seeds=256 if QUICK else 512,
    budget=64 if QUICK else 128,
    supersample=6,  # high-quality (antialiased) render: ~55 ms/page — the
    # render-dominated cost profile of the reference (PhantomJS rendered at
    # ~1 s/page); with cheap renders the wave is bound by the sandbox's
    # single-disk parquet IO, which no core count can scale
)


def ramp(cores: int = 32) -> int:
    spark = get_spark(f"local[{cores}]", "scaling_ramp", shuffle_partitions=cores)
    eng = CrawlEngine(spark, CFG, WH, n_partitions=cores)
    stats = eng.run(RAMP_WAVES)
    v = eng.wh.last_version()
    print(
        f"# ramp done: version={v} wave_fetches={[s['n_fetched'] for s in stats]}",
        file=sys.stderr,
    )
    spark.stop()
    return v


def one_trial(cores: int, base_version: int) -> dict:
    Warehouse(WH).truncate(base_version)
    spark = get_spark(f"local[{cores}]", f"scaling_{cores}", shuffle_partitions=cores)
    eng = CrawlEngine(spark, CFG, WH, n_partitions=cores)
    eng._update_bloom(eng.wh.read(spark, "seen", upto=base_version), base_version)
    t0 = time.monotonic()
    stats = eng.run_waves(base_version, base_version + MEASURE_WAVES)
    wall = time.monotonic() - t0
    spark.stop()
    fetched = sum(s["n_fetched"] for s in stats)
    return {
        "cores": cores,
        "fetched": fetched,
        "wall_sec": round(wall, 2),
        "urls_per_sec": round(fetched / wall, 2),
        "wave_ms": [s["wall_ms"] for s in stats],
    }


def main() -> None:
    v = ramp()
    pairs_out = []
    all_trials = []
    for pair in PAIRS:
        n_low, n_high = pair
        order = []
        for i in range(REPS[pair]):
            order += [n_low, n_high] if i % 2 == 0 else [n_high, n_low]
        trials = []
        for cores in order:
            tr = one_trial(cores, v)
            trials.append(tr)
            all_trials.append(tr)
            print(f"# trial {tr}", file=sys.stderr)
        med = {
            c: statistics.median(t["urls_per_sec"] for t in trials if t["cores"] == c)
            for c in pair
        }
        eff = med[n_high] / (4 * med[n_low])
        pairs_out.append(
            {
                "n_low": n_low,
                "n_high": n_high,
                "median_urls_per_sec": med,
                "efficiency": round(eff, 3),
            }
        )
        print(f"# pair {pair}: medians={med} efficiency={eff:.3f}", file=sys.stderr)

    out = {
        "metric": "crawl_scaling_efficiency",
        "pairs": pairs_out,
        "trials": all_trials,
        "config": {
            "hosts": CFG.n_hosts, "budget": CFG.budget,
            "supersample": CFG.supersample,
            "ramp_waves": RAMP_WAVES, "measure_waves": MEASURE_WAVES,
        },
    }
    Path(__file__).parent.joinpath("scaling_runs.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
