#!/usr/bin/env python3
"""Scale probe: replicate the sf0.1 events table ~100x into a ~10M-point
corpus, write it with the at-scale layout (partitioned by metric + day
bucket), and measure the operator families against it.

What it demonstrates (SCALE.md records a run):
- partition pruning: a metric+time-bounded scan must read a small
  fraction of files vs the full corpus;
- partial aggregation: per-series downsample over 10M points shuffles
  only series x window groups;
- MVCC dedup and final aggregation at 100x the bench scale.

Usage: python3 tools/scale_probe.py [replication_factor] (default 100)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nexusbase_spark.session import get_spark
from nexusbase_spark.datamodel import events_to_points, load_table
from nexusbase_spark.functions.fidelity import AggSpec
from nexusbase_spark.operators import (
    dedup_latest, downsample, final_aggregate, metric_filter, order_points,
    tag_filter, time_range,
)

DAY_NS = 86_400 * 1_000_000_000


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale-probe", extra_conf={
        "spark.ui.enabled": "false", "spark.ui.showConsoleProgress": "false",
        "spark.sql.shuffle.partitions": "64",
    })
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"replication": factor}

    base = events_to_points(load_table(spark, sf_dir, "events"))
    # replicate with shifted users + jittered ts so series cardinality and
    # the time span both grow with the factor
    rep = base.crossJoin(spark.range(factor).withColumnRenamed("id", "rep"))
    pts = rep.select(
        "metric",
        F.map_from_arrays(
            F.array(F.lit("user")),
            F.array(((F.col("tags")["user"].cast("long") + F.col("rep") * 20)).cast("string")),
        ).alias("tags"),
        (F.col("ts") + (F.col("rep") % 30) * DAY_NS).alias("ts"),
        (F.col("seq") + F.col("rep") * 10_000_000).alias("seq"),
        "value", "k",
    )
    pts = pts.withColumn("series_key",
                         F.concat(F.col("metric"), F.lit("|user="), F.col("tags")["user"]))
    pts = pts.withColumn("day", (F.col("ts") / F.lit(DAY_NS)).cast("long"))

    wh = tempfile.mkdtemp(prefix="nexusbase_scale_")
    try:
        t0 = time.time()
        pts.write.mode("overwrite").partitionBy("metric", "day").parquet(f"{wh}/points")
        out["ingest_s"] = round(time.time() - t0, 2)

        stored = spark.read.parquet(f"{wh}/points")
        out["points"] = stored.count()
        t_lo, t_hi = stored.agg(F.min("ts"), F.max("ts")).collect()[0]

        def timed(name, df):
            t = time.time()
            n = df.count()
            out[name] = {"s": round(time.time() - t, 2), "rows": n}

        # pruned scan: one metric, 2-day slice out of ~60 days x 5 metrics
        start = t_lo + 10 * DAY_NS
        pruned = time_range(
            tag_filter(metric_filter(stored, "click"), {"user": "41"}),
            start, start + 2 * DAY_NS)
        timed("pruned_scan", pruned)
        # partition pruning evidence straight from the plan
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "partition" in line.lower() and "filter" in line.lower():
                out["partition_filters"] = line.strip()[:200]
                break

        timed("full_downsample_1d", downsample(
            metric_filter(stored, "click"), DAY_NS,
            [AggSpec("count", "*"), AggSpec("sum", "value"), AggSpec("avg", "value")]))
        timed("mvcc_dedup", dedup_latest(metric_filter(stored, "error")))
        timed("final_agg", final_aggregate(
            metric_filter(stored, "purchase"),
            [AggSpec("count", "*"), AggSpec("sum", "value"), AggSpec("p95", "value")],
            approx_percentile=True))
        t = time.time()
        order_points(metric_filter(stored, "view")).limit(100).collect()
        out["topk_100_s"] = round(time.time() - t, 2)
    finally:
        shutil.rmtree(wh, ignore_errors=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
