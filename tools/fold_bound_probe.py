#!/usr/bin/env python3
"""Measure the one-series-per-row bound of the sequential-fold family
(VERDICT r4 next #6).

``ewma_level`` / ``holt_linear`` fold each series with
``sort_array(collect_list(struct(ts, seq, v)))`` + ``F.aggregate`` —
one row holds the WHOLE series, so a single very long series is the
failure axis (a million normal-sized series are fine: the bound is
per-series, not per-table). This probe grows ONE series geometrically
and times the fold vs the rollup-fed alternative (downsample to minute
grain first, fold the rollup), recording where the raw fold stops being
the right plan. SCALE.md carries the numbers; the operator docstrings
carry the guidance.

Usage: python3 tools/fold_bound_probe.py [max_points_log2]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nexusbase_spark.session import get_spark
from nexusbase_spark.operators.timeseries import ewma_level, holt_linear


def one_series(spark, n: int):
    """n points, ONE series key, deterministic values, second-grain ts."""
    return (spark.range(n)
            .select(F.lit("m").alias("metric"),
                    (F.col("id") * 1_000_000_000).alias("ts"),
                    F.col("id").alias("seq"),
                    (F.sin(F.col("id") / 1000.0)
                     + (F.pmod(F.col("id"), 97) / 97.0)).alias("value")))


def rollup_then_fold(df, interval_ns: int = 60_000_000_000):
    """The scale path: pre-aggregate to one point per minute bucket
    (partial-agg shuffle, bounded groups), then fold the rollup — the
    series row shrinks 60x at second-grain input and the fold semantics
    degrade gracefully (EWMA of minute means)."""
    r = (df.groupBy("metric",
                    (F.col("ts") - F.pmod(F.col("ts"), F.lit(interval_ns)))
                    .alias("ts"))
         .agg(F.avg("value").alias("value"), F.min("seq").alias("seq")))
    return ewma_level(r, ["metric"], alpha=0.3)


def main() -> None:
    max_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    spark = get_spark("fold-bound-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    n = 1 << 20  # 1M
    while n <= (1 << max_log2):
        df = one_series(spark, n).localCheckpoint(eager=True)
        row = {"points": n}
        for name, fn in [
            ("ewma_raw_s", lambda d: ewma_level(d, ["metric"], alpha=0.3)),
            ("holt_raw_s", lambda d: holt_linear(d, ["metric"],
                                                 alpha=0.3, beta=0.1)),
            ("ewma_rollup_s", rollup_then_fold),
        ]:
            t0 = time.time()
            try:
                fn(df).collect()
                row[name] = round(time.time() - t0, 2)
            except Exception as e:  # noqa: BLE001 — record the break point
                row[name] = f"FAIL {type(e).__name__}: {str(e)[:120]}"
        results.append(row)
        print(json.dumps(row), flush=True)
        df.unpersist()
        n <<= 2
    print(json.dumps({"probe": "fold_bound", "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
