"""AQE skew-join evidence (VERDICT r4 #9): the engine's answer to
skewed JOIN keys.

Skewed *windows* (politeness top-K, corpus mix) are handled by explicit
salting (operators/politeness.py, mega-group stress test).  Skewed
*joins* are deliberately left to AQE: at runtime the skew-join rule
splits oversized shuffle partitions of the skewed side and replicates
the matching partitions of the other side — no salting code needed in
any join path.  This test plants a 90%-one-key skew, runs the join with
sandbox-scaled thresholds, and pins via the final adaptive plan that the
rule actually fired (``skew=true``), plus result correctness."""

import pyspark.sql.functions as F


def _final_plan(df) -> str:
    # after an action, the AQE plan string carries the FINAL physical plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_splits_skewed_join_partition(spark):
    skew_confs = {
        # sandbox-scale thresholds: the skewed partition is a few MB in
        # the (lz4-compressed) shuffle, not the 256 MB production default
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "100KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # coalescing first would merge away the skew evidence at this size
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in skew_confs}
    try:
        for k, v in skew_confs.items():
            spark.conf.set(k, v)
        n = 400_000
        # 90% of fact rows share host_id 0 (one mega-host), padded so the
        # hot partition clears the byte threshold
        fact = spark.range(n).select(
            F.when(F.col("id") % 10 < 9, 0)
            .otherwise(F.col("id") % 1000)
            .alias("host_id"),
            F.col("id").alias("url_id"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("host_id"),
            F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".test")).alias(
                "host"
            ),
        )
        joined = fact.join(dim, "host_id")
        # keep pad flowing through the join output (column pruning would
        # otherwise shrink the shuffled rows to one long and the hot
        # partition can compress under any realistic threshold)
        agg = joined.groupBy("host").agg(
            F.count("*").alias("cnt"), F.sum(F.length("pad")).alias("pad_bytes")
        )
        rows = {r["host"]: r["cnt"] for r in agg.collect()}
        # correctness: the mega-key kept every row through the split
        assert rows["h0.test"] == sum(1 for i in range(n) if i % 10 < 9)
        # the plan must come from the EXECUTED query — AQE only marks
        # skew=true in the final adaptive plan after runtime stats
        assert _final_plan(agg).count("skew=true") >= 1, _final_plan(agg)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)
