#!/usr/bin/env python3
"""Engine-level ingest + query bench, mirroring the reference perf clients:

- cmd/perf-client/main.go:52-56 — 1,000,000 points, 100 series, batched
  ingest; reports points/sec.
- cmd/query-perf-client/main.go:50-54 — repeated 1h-range queries over the
  ingested series; reports qps + P50/P90/P99 (stream fully drained).

Runs against a throwaway warehouse; prints one JSON line.
Usage: python3 tools/engine_bench.py [n_points] (default 1,000,000)
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nexusbase_spark.engine import NexusEngine
from nexusbase_spark.nbql.parser import parse
from nexusbase_spark.session import get_spark

NS = 1_000_000_000


def main() -> None:
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_series = 100
    spark = get_spark("engine-bench", extra_conf={
        "spark.ui.enabled": "false", "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    wh = tempfile.mkdtemp(prefix="nexusbase_engine_bench_")
    out: dict = {"n_points": n_points, "n_series": n_series}
    try:
        eng = NexusEngine(spark, wh)

        # build the workload distributed (perf.test.metric, host+region tags,
        # one float field), 1s cadence per series
        ids = spark.range(n_points)
        src = ids.select(
            F.lit("perf.test.metric").alias("metric"),
            F.map_from_arrays(
                F.array(F.lit("host"), F.lit("region")),
                F.array(F.concat(F.lit("host-"), (F.col("id") % n_series).cast("string")),
                        F.concat(F.lit("r"), (F.col("id") % 3).cast("string"))),
            ).alias("tags"),
            (F.lit(1_600_000_000 * NS) + (F.col("id") / n_series).cast("long") * NS).alias("ts"),
            F.lit("value").alias("field"),
            F.lit("float").alias("vtype"),
            F.rand(seed=42).alias("f_double"),
            F.lit(None).cast("long").alias("f_long"),
            F.lit(None).cast("string").alias("f_string"),
            F.lit(None).cast("boolean").alias("f_bool"),
        )
        t0 = time.time()
        eng.ingest_frame(src)
        dt = time.time() - t0
        out["ingest_s"] = round(dt, 2)
        out["ingest_points_per_sec"] = round(n_points / dt, 1)

        # query workload: random 1h windows, random single series, drained
        span_s = n_points // n_series
        rng = random.Random(42)
        lat = []
        n_queries = 25
        for _ in range(n_queries):
            h = rng.randrange(n_series)
            start = (1_600_000_000 + rng.randrange(max(span_s - 3600, 1))) * NS
            q = parse(
                f"QUERY perf.test.metric FROM {start} TO {start + 3600 * NS} "
                f'TAGGED (host="host-{h}") '
                "AGGREGATE BY 1m (count(value), avg(value), max(value))")
            t0 = time.time()
            eng.query(q).collect()
            lat.append(time.time() - t0)
        lat.sort()
        out["query_qps"] = round(n_queries / sum(lat), 2)
        for name, p in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            out[f"query_{name}_s"] = round(lat[min(int(len(lat) * p), len(lat) - 1)], 3)

        # continuous-aggregate serving: the standing dashboard query
        # (full-span 1m downsample, all series) direct-from-base vs served
        # from a materialized rollup via the transparent MV rewrite
        base_ts = 1_600_000_000 * NS
        a = base_ts - base_ts % (60 * NS)        # align down to the minute
        b = a + ((span_s // 60) + 2) * 60 * NS - 1  # aligned, spans the data
        dash = (f"QUERY perf.test.metric FROM {a} TO {b} "
                "AGGREGATE BY 1m (count(value), avg(value), max(value))")
        t0 = time.time()
        n_direct = eng.execute(dash).count()
        out["dashboard_direct_s"] = round(time.time() - t0, 2)
        eng.execute("CREATE ROLLUP dash ON perf.test.metric AGGREGATE BY 1m "
                    "(count(value), avg(value), max(value));")
        t0 = time.time()
        n_served = eng.execute(dash).count()
        out["dashboard_rollup_s"] = round(time.time() - t0, 2)
        out["dashboard_rows"] = n_direct
        assert n_served == n_direct and getattr(eng, "rollup_rewrites", 0) >= 1
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
