"""Bucketed co-located joins: the shuffle is paid at WRITE time, never
again at join time (sources/bucketed.py)."""

import pyspark.sql.functions as F

from rendler_spark.sources import bucketed as B


def _formatted(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


class _no_broadcast:
    """Force the fact-fact (sort-merge) path: at sf0.001 both tables fit
    under the broadcast threshold, which hides the property under test —
    at real scale neither side broadcasts and bucketing is what deletes
    the Exchange."""

    def __init__(self, spark):
        self.spark = spark
        self.keys = [
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        ]

    def __enter__(self):
        self.saved = [self.spark.conf.get(k, None) for k in self.keys]
        for k in self.keys:
            self.spark.conf.set(k, "-1")

    def __exit__(self, *exc):
        for k, v in zip(self.keys, self.saved):
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """orders x lineitem bucketed by orderkey into the same bucket count:
    the join plan must contain NO Exchange (no shuffle on either side)
    and the result must match the plain-join answer exactly."""
    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf}/lineitem.parquet")

    B.create_bucket_db(spark, "bktdb", str(tmp_path / "bktdb"))
    try:
        B.write_bucketed(orders, "bktdb.orders_b", "o_orderkey", 8)
        B.write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "bktdb.lineitem_b",
            "o_orderkey",
            8,
        )
        with _no_broadcast(spark):
            joined = B.colocated_join(spark, "bktdb.orders_b", "bktdb.lineitem_b",
                                      "o_orderkey")
            agg = joined.groupBy("o_orderpriority").agg(
                F.count("*").alias("n"),
                F.sum("l_quantity").alias("qty"),
            )
            plan = _formatted(joined)
            assert "Exchange" not in plan, plan
            assert "SortMergeJoin" in plan, plan
            agg = agg.collect()

        # same answer as the plain (shuffling) join
        plain = (
            orders.join(
                lineitem, orders.o_orderkey == lineitem.l_orderkey
            )
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
        )
        got = {
            r["o_orderpriority"]: (r["n"], float(r["qty"]))
            for r in agg
        }
        want = {
            r["o_orderpriority"]: (r["n"], float(r["qty"]))
            for r in plain.collect()
        }
        assert got == want
    finally:
        spark.sql("DROP DATABASE IF EXISTS bktdb CASCADE")


def test_bucketed_sorted_join_skips_sort(spark, tmp_path):
    """sortBy(key) inside buckets: the sort-merge join must not re-sort
    the pre-sorted bucketed sides."""
    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    B.create_bucket_db(spark, "bktdb2", str(tmp_path / "bktdb2"))
    try:
        # one WRITE TASK -> one file per bucket: the reader only trusts
        # (and thus skips re-establishing) the bucket sort order when a
        # bucket is a single file; multi-file buckets keep the Sort
        B.write_bucketed(
            orders.select("o_orderkey", "o_totalprice").coalesce(1),
            "bktdb2.o1", "o_orderkey", 4,
        )
        B.write_bucketed(
            orders.select("o_orderkey", "o_orderpriority").coalesce(1),
            "bktdb2.o2", "o_orderkey", 4,
        )
        # Spark >= 3.0 gates bucket-sort propagation behind this legacy
        # flag (a multi-file bucket cannot guarantee order; ours are
        # single-file by construction above, where it is sound)
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        try:
            with _no_broadcast(spark):
                joined = B.colocated_join(
                    spark, "bktdb2.o1", "bktdb2.o2", "o_orderkey"
                )
                plan = _formatted(joined)
                assert "Exchange" not in plan, plan
                # the pre-sorted buckets make any Sort node a regression
                assert " Sort " not in plan, plan
                assert joined.count() == orders.count()
        finally:
            spark.conf.set(
                "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
            )
    finally:
        spark.sql("DROP DATABASE IF EXISTS bktdb2 CASCADE")
