"""Runtime Bloom-filter join pruning (Spark's InjectRuntimeFilter).

At 100 TB the classic shape is a huge fact scan joined to a selectively
filtered dimension: without help, every fact row reaches the shuffle.
Spark's runtime filter builds a Bloom filter from the filtered creation
side and injects `might_contain(xxhash64(key))` into the application
side's scan, discarding non-matching fact rows BEFORE the exchange —
complementary to the engine's own Bloom/cuckoo seen-prefilter, and free
(on by default; size thresholds only).  This pins that the rule fires on
this build and that results are unchanged by the injection."""

import pyspark.sql.functions as F


def _formatted(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_runtime_bloom_filter_injects_and_preserves_results(spark):
    sf = "/root/testdata/sf0.01"
    confs = {
        # sandbox thresholds: production default requires a 10GB+
        # application-side scan; the mechanism is size-independent
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}

    def run():
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        o = spark.read.parquet(f"{sf}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        return j

    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = run()
        plan = _formatted(j)
        assert "might_contain" in plan, plan  # the injected Bloom probe
        with_filter = {(r["o_orderpriority"], r["n"]) for r in j.collect()}
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)

    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        off = run()
        assert "might_contain" not in _formatted(off)
        without = {(r["o_orderpriority"], r["n"]) for r in off.collect()}
    finally:
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
    assert with_filter == without and with_filter
