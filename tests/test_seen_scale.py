"""Seen-table scale mechanics: shard sub-partitioning, pruned anti-join
reads, and wave compaction (VERDICT r1 #4).

The seen set is the one table every wave re-reads; these tests pin that
(a) it is written Hive-sub-partitioned by shard, (b) the anti-join's scan
is partition-pruned to the shards the maybe-seen candidates name, and
(c) compaction snapshots replace the O(waves) delta re-scan without
changing semantics or breaking resume.
"""

import pyspark.sql.functions as F
import pytest

from oracle_rendler import run_oracle
from rendler_spark import synthweb
from rendler_spark.engine import CrawlEngine

CFG = synthweb.WebConfig()  # t1 smoke tier


def _explain(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_seen_sharded_and_antijoin_pruned(spark, tmp_path):
    """With n_shards larger than the candidate spread, the engine must
    scan fewer shards than exist, and the shard filter must reach the
    parquet scan as a PartitionFilter (not a post-scan row filter)."""
    eng = CrawlEngine(spark, CFG, str(tmp_path / "wh"), n_shards=64)
    stats = eng.run(2)
    # (a) Hive shard sub-dirs exist inside the wave partition
    shard_dirs = list((eng.wh.part_dir("seen", 0)).glob("shard=*"))
    assert shard_dirs, "seen/wave=0 not sub-partitioned by shard"
    # (b) the wave-1 anti-join scanned a strict subset of 64 shards
    assert 0 < stats[1]["n_seen_shards_scanned"] < 64
    # (c) a shard predicate over the seen read is partition-pruned
    pruned = eng._read_seen(1).filter(F.col("shard").isin([1, 2, 3]))
    plan = _explain(pruned)
    part_section = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "shard" in part_section, plan


def test_compaction_preserves_semantics_and_resume(spark, tmp_path):
    """seen_compact snapshots: same seen set as the oracle, same rows as
    the raw wave union, resume keeps working past a compaction point."""
    wh = str(tmp_path / "whc")
    eng = CrawlEngine(spark, CFG, wh, seen_compact_every=2)
    eng.run(4)
    assert eng.wh.exists("seen_compact", 2) and eng.wh.exists("seen_compact", 4)
    raw = {
        (r["url"], r["blocked"])
        for r in eng.wh.read(spark, "seen", upto=4).select("url", "blocked").collect()
    }
    via_compact = {
        (r["url"], r["blocked"])
        for r in eng._read_seen(4).select("url", "blocked").collect()
    }
    assert raw == via_compact
    oracle = run_oracle(CFG, 4)
    assert {u for u, _ in via_compact} == oracle.seen
    # resume from the compacted state and keep crawling
    more = CrawlEngine.resume(spark, CFG, wh, 6, seen_compact_every=2)
    assert more and more[0]["wave"] == 4
    oracle6 = run_oracle(CFG, 6)
    eng2 = CrawlEngine(spark, CFG, wh, seen_compact_every=2)
    got = {r["url"] for r in eng2.wh.read(spark, "seen").select("url").collect()}
    assert got == oracle6.seen


def test_compaction_off_by_zero(spark, tmp_path):
    eng = CrawlEngine(spark, CFG, str(tmp_path / "wh0"), seen_compact_every=0)
    eng.run(2)
    assert not eng.wh.exists("seen_compact")
