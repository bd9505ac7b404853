#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line (driver contract).

Env knobs:
  SPARK_GRAFT_SF_DIR   parquet dir            (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] thread count   (default 32)
  RENDLER_BENCH_WAVES  crawl waves            (default 6)
  RENDLER_BENCH_HOSTS / RENDLER_BENCH_BUDGET  synthetic-web sizing

Two workload groups:
  * headline operator queries over the testdata tables (timed with a
    noop-sink write so Catalyst cannot prune the measured work);
  * the crawl wave loop on the bench-tier synthetic web — the north-rule
    metric is fetched URLs/sec of this loop (BASELINE.json:L2); session
    startup is excluded, per-wave numbers land in the JSON.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _hw_work(n: int) -> int:
    """Pure-CPU allocation-free numpy kernel (same as BENCH/scaling.py's
    hw-ceiling probe; module-level so it pickles into worker processes)."""
    import numpy as _np

    x = _np.arange(19200, dtype=_np.int32)
    tmp = _np.empty_like(x)
    for i in range(n):
        _np.multiply(x, 31, out=tmp)
        _np.add(tmp, i, out=tmp)
        _np.bitwise_and(tmp, 255, out=x)
    return n


def hw_ceiling_anchor(nproc: int = 16, rounds: int = 60_000) -> dict:
    """Host-quality anchor emitted WITH every bench artifact, so
    cross-round comparisons stop depending on builder-side narrative:
    this sandbox's shared-host/gVisor wall clock varies 1.4-1.8x between
    runs (see BENCH/BASELINE.md "Environment variance note"), and the
    r1->r2 driver artifacts looked like a uniform regression that was
    actually host weather.  Reports kernel-rounds/sec for 1 process and
    for ``nproc`` processes; to compare two rounds' seconds, normalize by
    the ratio of their anchors."""
    from multiprocessing import Pool

    t0 = time.monotonic()
    _hw_work(rounds)
    single = rounds / (time.monotonic() - t0)
    t0 = time.monotonic()
    with Pool(nproc) as p:
        p.map(_hw_work, [rounds] * nproc)
    pooled = nproc * rounds / (time.monotonic() - t0)
    return {
        "single_rps": round(single, 1),
        f"pool{nproc}_rps": round(pooled, 1),
        "pool_n": nproc,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    waves = int(os.environ.get("RENDLER_BENCH_WAVES", "6"))
    hosts = int(os.environ.get("RENDLER_BENCH_HOSTS", "256"))
    budget = int(os.environ.get("RENDLER_BENCH_BUDGET", "48"))

    from rendler_spark.engine import CrawlEngine
    from rendler_spark.queries import ORACLE, QUERIES, TABLES
    from rendler_spark.session import get_spark
    from rendler_spark.synthweb import WebConfig

    ceiling = hw_ceiling_anchor()

    spark = get_spark(f"local[{cpus}]", "rendler_bench", shuffle_partitions=cpus)

    headline = [
        "q_groupby_agg",
        "q_shuffle_join",
        "q_topk_per_group",
        "q_anti_join",
        "q_order_by",
        "q_count_distinct",
        "q_tumbling_window",
        "q_session_gap",
        "q_ann_cosine_topk",
        "q_minhash_pairs",
    ]
    queries: dict[str, float] = {}
    for name in headline:
        t0 = time.monotonic()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        queries[name] = round(time.monotonic() - t0, 3)

    # ---- DuckDB same-query wall times (engine-vs-engine ratio column; the
    # reference publishes no numbers, so a mature single-node OLAP engine
    # on the same parquet + same SQL is the concrete comparison point).
    # Runs AFTER the Spark loop so neither engine's CPU use poisons the
    # other's trials.  Queries with no ANSI oracle record null.
    import duckdb

    con = duckdb.connect()
    for tname in TABLES:
        con.sql(
            f"CREATE VIEW {tname} AS SELECT * FROM '{sf_dir}/{tname}.parquet'"
        )
    duck: dict[str, float | None] = {}
    for name in headline:
        if name not in ORACLE:
            duck[name] = None
            continue
        t0 = time.monotonic()
        con.sql(ORACLE[name]).fetchall()  # materialize the full result
        duck[name] = round(time.monotonic() - t0, 3)
    con.close()

    # ---- crawl wave loop (the north-rule metric)
    #
    # r5 hardening (VERDICT r4 #2/#4): the two high-variance entries —
    # the crawl loop and q_minhash_pairs — are no longer single trials.
    # r4's driver artifact recorded a 157 s crawl against r3's 70 s with
    # byte-identical engine code because one gVisor stall window landed
    # inside the only trial.  Now: two crawl trials with two extra
    # minhash trials interleaved between them; the reported number is
    # the MIN (stall noise is strictly one-sided — a stall can only add
    # time), and the full trial arrays land in the JSON so a stalled
    # trial is visible instead of silently defining the round.
    def _crawl_trial() -> tuple[float, list]:
        cfg = WebConfig(
            n_hosts=hosts, pages_per_host=256, max_links=12,
            n_seeds=min(64, hosts), budget=budget,
        )
        wh = tempfile.mkdtemp(prefix="rendler_bench_wh_")
        try:
            # cap UDF-stage tasks at 16: at 32 concurrent tasks this
            # sandbox oversubscribes (JVM threads + Python workers >
            # vCPUs) and stalls erratically — see BENCH/BASELINE.md;
            # render work saturates by 16
            eng = CrawlEngine(spark, cfg, wh, n_partitions=min(cpus, 16))
            eng.init()
            t0 = time.monotonic()
            stats = eng.run_waves(0, waves)
            return time.monotonic() - t0, stats
        finally:
            shutil.rmtree(wh, ignore_errors=True)

    def _minhash_trial() -> float:
        t0 = time.monotonic()
        QUERIES["q_minhash_pairs"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.monotonic() - t0, 3)

    crawl_trials: list[tuple[float, list]] = [_crawl_trial()]
    minhash_trials: list[float] = [queries["q_minhash_pairs"], _minhash_trial()]
    crawl_trials.append(_crawl_trial())
    minhash_trials.append(_minhash_trial())

    crawl_sec, stats = min(crawl_trials, key=lambda cs: cs[0])
    fetched = sum(s["n_fetched"] for s in stats)
    queries["crawl_wave_loop"] = round(crawl_sec, 3)
    queries["q_minhash_pairs"] = min(minhash_trials)
    trials = {
        "crawl_wave_loop": [round(cs[0], 3) for cs in crawl_trials],
        "q_minhash_pairs": minhash_trials,
        "estimator": "min (stall noise is one-sided)",
    }

    # ---- sf1.0-equivalent point (10x sf0.1, derived deterministically —
    # tools/make_sf1.py unions 10 key-shifted copies; no external data).
    # Tracks the Spark-vs-DuckDB gap trend as sf grows; a handful of
    # representative queries to bound bench wall time.  Disable with
    # SPARK_GRAFT_SF1=0.
    sf1: dict = {}
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0" and sf_dir.rstrip("/").endswith(
        "sf0.1"
    ):
        from tools.make_sf1 import ensure_sf1

        sf1_dir = ensure_sf1(sf_dir)
        # r4: the slice now covers the shuffle- and UDF-bound families
        # too (window top-K, anti join, MinHash+LSH over the 10x
        # near-identical documents), not just scan/agg queries
        for name in ("q_groupby_agg", "q_shuffle_join", "q_order_by",
                     "q_tumbling_window", "q_count_distinct",
                     "q_topk_per_group", "q_anti_join", "q_minhash_pairs",
                     "q_corpus_e2e"):
            t0 = time.monotonic()
            QUERIES[name](spark, sf1_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            sf1[name] = round(time.monotonic() - t0, 3)
        con1 = duckdb.connect()
        for tname in TABLES:
            con1.sql(
                f"CREATE VIEW {tname} AS SELECT * FROM '{sf1_dir}/{tname}.parquet'"
            )
        sf1_duck = {}
        for name in sf1:
            if name not in ORACLE:
                sf1_duck[name] = None
                continue
            t0 = time.monotonic()
            con1.sql(ORACLE[name]).fetchall()
            sf1_duck[name] = round(time.monotonic() - t0, 3)
        con1.close()
        sf1 = {"queries": sf1, "duckdb": sf1_duck, "sf": 1.0}

        # sf1-equivalent crawl: 4x hosts / 4x seeds = plateau waves 4x
        # the sf0.1 loop's, so the timed loop covers frontier sizes the
        # small web never reaches.  Fixed ~10s/wave scheduling overhead
        # amortizes over bigger waves -> urls/sec should RISE with
        # scale; reported separately, never summed into the headline.
        if os.environ.get("RENDLER_BENCH_SF1_CRAWL", "1") != "0":
            cfg1 = WebConfig(
                n_hosts=hosts * 4, pages_per_host=256, max_links=12,
                n_seeds=min(256, hosts * 4), budget=budget,
            )
            wh1 = tempfile.mkdtemp(prefix="rendler_bench_wh_sf1_")
            try:
                eng1 = CrawlEngine(spark, cfg1, wh1, n_partitions=min(cpus, 16))
                eng1.init()
                t0 = time.monotonic()
                stats1 = eng1.run_waves(
                    0, int(os.environ.get("RENDLER_BENCH_SF1_WAVES", "4"))
                )
                crawl1_sec = time.monotonic() - t0
            finally:
                shutil.rmtree(wh1, ignore_errors=True)
            fetched1 = sum(s["n_fetched"] for s in stats1)
            sf1["crawl"] = {
                "fetched_urls": fetched1,
                "waves": len(stats1),
                "urls_per_sec": round(fetched1 / crawl1_sec, 2),
                "wave_fetches": [s["n_fetched"] for s in stats1],
                "wave_ms": [s["wall_ms"] for s in stats1],
            }

    # ceiling-normalized headline: REF_POOL16 is the anchor from the
    # session BENCH/BASELINE.md's reference table was measured in; the
    # normalized value is what this run's seconds would read on that
    # host, making cross-round comparisons weather-independent in-file.
    REF_POOL16 = 641_000.0
    total = round(sum(queries.values()), 3)
    out = {
        "metric": "headline_total",
        "value": total,
        "value_ceiling_normalized": round(
            total * ceiling["pool16_rps"] / REF_POOL16, 3
        ),
        "unit": "sec",
        "queries": queries,
        "trials": trials,
        "duckdb": duck,
        "ceiling": ceiling,
        "sf1": sf1,
        "sf": float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0),
        "crawl": {
            "fetched_urls": fetched,
            "waves": len(stats),
            "urls_per_sec": round(fetched / crawl_sec, 2) if crawl_sec else None,
            "wave_fetches": [s["n_fetched"] for s in stats],
            "wave_ms": [s["wall_ms"] for s in stats],
            "cpus": cpus,
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
