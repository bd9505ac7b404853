"""Bucketed seen mirror (VERDICT r4 #2): the per-wave anti-join must not
re-shuffle the seen side, and semantics must be identical to the plain
path — the mirror is a derived index, never a second source of truth."""

import pyspark.sql.functions as F
import pytest

from oracle_rendler import run_oracle
from rendler_spark import synthweb
from rendler_spark.engine import CrawlEngine

CFG = synthweb.WebConfig()  # t1 smoke tier
WAVES = 3


def _formatted(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture(scope="module")
def bucketed_run(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("whb") / "t1")
    eng = CrawlEngine(spark, CFG, wh, seen_bucketed=True)
    stats = eng.run(WAVES)
    return eng, stats


def test_bucketed_seen_matches_oracle(bucketed_run, spark):
    """Same crawl, bucketed mirror on: seen set, blocked set, and fetch
    order all still equal the sequential oracle."""
    eng, _ = bucketed_run
    oracle = run_oracle(CFG, WAVES)
    got = {r["url"] for r in eng.wh.read(spark, "seen").select("url").collect()}
    assert got == oracle.seen
    rows = eng.wh.read(spark, "fetch_log").collect()
    order = sorted((r["wave"], r["host"], r["depth"], r["seq"], r["url"]) for r in rows)
    assert order == sorted(oracle.fetch_order)


def test_mirror_content_equals_seen_table(bucketed_run, spark):
    """The mirror after the run holds exactly the warehouse seen keys."""
    eng, stats = bucketed_run
    v = len(stats)
    mirror = {r["url"] for r in eng._seen_mirror_df(v).select("url").collect()}
    truth = {
        r["url"] for r in eng._read_seen(v).select("url").collect()
    }
    assert mirror == truth and len(mirror) > 0


def test_anti_join_plan_no_exchange_on_seen_side(bucketed_run, spark):
    """THE property this layout buys: the anti-join against the mirror
    plans with exactly ONE Exchange (the candidate side) — the bucketed
    seen scan feeds the join directly.  Broadcast is disabled because at
    t1 scale the tiny mirror would broadcast and hide the shape under
    test; at 10^10 URLs nothing broadcasts."""
    eng, stats = bucketed_run
    v = len(stats)
    seen = eng._seen_mirror_df(v)
    cand = (
        spark.range(3000)
        .select(
            F.concat(F.lit("http://hx.test/p"), F.col("id").cast("string")).alias(
                "url"
            )
        )
        .withColumn("url_hash", F.xxhash64("url"))
    )
    saved = {}
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    for k in keys:
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, "-1")
    try:
        j = cand.join(seen.select("url"), ["url"], "left_anti")
        plan = _formatted(j)
    finally:
        for k, v_ in saved.items():
            spark.conf.set(k, v_) if v_ is not None else spark.conf.unset(k)
    exchanges = [
        ln for ln in plan.splitlines()
        if ln.strip().startswith("(") and "Exchange" in ln
    ]
    assert len(exchanges) == 1, plan


def test_mirror_rebuilds_after_marker_divergence(spark, tmp_path):
    """Crash model: marker behind the committed version (or missing)
    means the next wave rebuilds the mirror from the warehouse — results
    stay oracle-exact."""
    wh = str(tmp_path / "t1")
    eng = CrawlEngine(spark, CFG, wh, seen_bucketed=True)
    eng.run(2)
    # simulate a crash that lost the mirror sync
    eng._mirror_marker_path().unlink()
    eng2 = CrawlEngine(spark, CFG, wh, seen_bucketed=True)
    stats2 = eng2.run_waves(2, WAVES)
    assert stats2  # wave 2 ran after a forced rebuild
    oracle = run_oracle(CFG, WAVES)
    got = {r["url"] for r in eng2.wh.read(spark, "seen").select("url").collect()}
    assert got == oracle.seen


def test_mirror_compaction_bounds_files_and_stays_exact(spark, tmp_path):
    """On the seen-compaction cadence the mirror is REWRITTEN instead of
    appended: files per bucket stay bounded at ~seen_compact_every (the
    append path adds one file per bucket per wave without bound), and
    semantics stay oracle-exact through the rewrite."""
    wh = str(tmp_path / "t1")
    eng = CrawlEngine(
        spark, CFG, wh, seen_bucketed=True, seen_compact_every=2, seen_buckets=4
    )
    stats = eng.run(4)
    assert len(stats) >= 3  # cadence fired at least once (wave 2 and 4)
    oracle = run_oracle(CFG, len(stats))
    got = {r["url"] for r in eng.wh.read(spark, "seen").select("url").collect()}
    assert got == oracle.seen
    mirror = {
        r["url"]
        for r in eng._seen_mirror_df(len(stats)).select("url").collect()
    }
    assert mirror == got
    # file boundedness: after the last rewrite at wave c, at most
    # (waves since c) appends ride on 1 rewrite file per bucket
    from pathlib import Path

    files = list((Path(wh) / "_seen_bucketdb" / "seen_b").glob("*.parquet"))
    n_buckets = 4
    waves_since = len(stats) % 2  # appends since the last cadence rewrite
    assert len(files) <= n_buckets * (1 + waves_since) + n_buckets, (
        len(files),
        sorted(f.name for f in files)[:8],
    )


def test_mirror_rewrite_cadence_with_compaction_off(spark, tmp_path):
    """ADVICE r5: with seen_compact_every=0 the mirror used to be
    append-only (one file per bucket per wave, unbounded).  The mirror
    now has its own rewrite cadence; after a rewrite wave the mirror
    holds at most ~1 file per bucket and still equals the seen table."""
    import glob
    import os

    wh = str(tmp_path / "t1nc")
    eng = CrawlEngine(
        spark, CFG, wh, seen_bucketed=True, seen_compact_every=0,
        seen_buckets=4,
    )
    # run past the default mirror cadence (8): 9 waves or until done
    stats = eng.run(9)
    v = len(stats)
    mirror = {r["url"] for r in eng._seen_mirror_df(v).select("url").collect()}
    truth = {r["url"] for r in eng._read_seen(v).select("url").collect()}
    assert mirror == truth and len(mirror) > 0
    if v >= 8:  # a rewrite happened: file count is bounded by ~buckets
        db_dir = os.path.join(wh, "_seen_bucketdb")
        files = glob.glob(os.path.join(db_dir, "**", "*.parquet"), recursive=True)
        # appended-only would hold >= buckets * waves files by now
        assert len(files) <= 4 * (1 + (v - 8)), files
