"""Bucketed layout: a join between co-bucketed, co-sorted tables
compiles with NO Exchange (and no Sort) on either side — the written
layout replaces the per-query shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexusbase_spark.plans.bucketing import (
    bucket_spec, cobucketed_join, write_bucketed,
)


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # bucketed-scan output ordering moved behind a legacy flag in Spark 3
    # (sound only with ONE file per bucket — write_bucketed guarantees
    # that via its repartition-by-key); with it the co-sorted layout
    # elides the SMJ sorts too, not just the exchanges
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering",
                   "true")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering",
                   "false")


def test_cobucketed_join_has_no_exchange_or_sort(spark, no_broadcast):
    left = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    right = spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
    try:
        write_bucketed(left, "t_bk_left", "k", 8)
        write_bucketed(right, "t_bk_right", "k", 8)
        assert bucket_spec(spark, "t_bk_left") == (8, ["k"])

        j = cobucketed_join(spark, "t_bk_left", "t_bk_right", "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # the whole point of the layout
        assert "Sort" not in plan.replace("SortMergeJoin", "SMJ")  # sortBy
        assert j.count() == 5_000
        # values correct
        row = j.filter(F.col("k") == 7).collect()[0]
        assert (row["a"], row["b"]) == (14, 21)

        # the same files read as BARE parquet lose the bucket metadata
        # and the join shuffles again — the catalog is load-bearing
        loc = spark.sql("DESCRIBE TABLE EXTENDED t_bk_left").collect()
        path = next(r["data_type"] for r in loc if r["col_name"] == "Location")
        bare = spark.read.parquet(path.replace("file:", ""))
        plan2 = (bare.join(spark.table("t_bk_right"), "k")
                 ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" in plan2
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bk_left")
        spark.sql("DROP TABLE IF EXISTS t_bk_right")


def test_cobucketed_join_refuses_mismatch(spark):
    left = spark.range(100).select(F.col("id").alias("k"))
    right = spark.range(100).select(F.col("id").alias("k"))
    try:
        write_bucketed(left, "t_bk_a", "k", 8)
        write_bucketed(right, "t_bk_b", "k", 4)  # different bucket count
        with pytest.raises(ValueError, match="not co-bucketed"):
            cobucketed_join(spark, "t_bk_a", "t_bk_b", "k")
        right.write.format("parquet").mode("overwrite") \
            .saveAsTable("t_bk_plain")  # unbucketed
        with pytest.raises(ValueError, match="not co-bucketed"):
            cobucketed_join(spark, "t_bk_a", "t_bk_plain", "k")
    finally:
        for t in ("t_bk_a", "t_bk_b", "t_bk_plain"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
