#!/usr/bin/env python3
"""Z-order layout probe: files touched per single-dimension predicate.

Writes the events table (sf0.1 by default) three ways — unsorted,
sorted by user_id, z-ordered on (user_id, day) — then measures how many
parquet files a selective predicate on EACH dimension actually reads
(distinct input_file_name over the executed filtered scan; the
DataFrame.inputFiles listing is pre-pushdown and would show nothing).

Expected: single-column sort prunes its own column perfectly and the
other not at all; z-order prunes BOTH to ~sqrt-ish file counts.

Usage: python3 tools/zorder_probe.py [sf_dir] [n_files]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from pyspark.sql import functions as F

    from nexusbase_spark.datamodel import load_table, source_ts_ns
    from nexusbase_spark.plans.zorder import quantize_rank, write_zordered
    from nexusbase_spark.session import get_spark

    spark = get_spark("zorder-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf_dir, "events")
    DAY_NS = 86_400 * 1_000_000_000
    ev = ev.withColumn("ts_ns", source_ts_ns(ev)) \
           .withColumn("day", (F.col("ts_ns") / DAY_NS).cast("long"))
    stats = ev.agg(F.min("user_id"), F.max("user_id"),
                   F.min("day"), F.max("day")).collect()[0]
    u_lo, u_hi, d_lo, d_hi = [float(x) for x in stats]

    base = tempfile.mkdtemp(prefix="zorder_probe_")
    out: dict = {"sf_dir": sf_dir, "n_files": n_files}
    try:
        # layout 1: unsorted round-robin
        (ev.repartition(n_files).write.mode("overwrite")
         .parquet(f"{base}/plain"))
        # layout 2: range-sorted by user only
        (ev.repartitionByRange(n_files, "user_id")
         .sortWithinPartitions("user_id")
         .write.mode("overwrite").parquet(f"{base}/by_user"))
        # layout 3: z-ordered on (user, day)
        zev = (ev.withColumn("__u", quantize_rank(F.col("user_id"), u_lo, u_hi))
               .withColumn("__d", quantize_rank(F.col("day"), d_lo, d_hi)))
        write_zordered(zev, f"{base}/zorder", ["__u", "__d"],
                       bits=8, n_files=n_files)

        u_mid = int((u_lo + u_hi) / 2)
        d_mid = int((d_lo + d_hi) / 2)
        preds = {
            "user_eq": F.col("user_id") == u_mid,
            "user_range": F.col("user_id").between(u_mid, u_mid + max(1, int((u_hi - u_lo) * 0.02))),
            "day_eq": F.col("day") == d_mid,
            "day_range": F.col("day").between(d_mid, d_mid + 1),
        }
        for layout in ("plain", "by_user", "zorder"):
            df = spark.read.parquet(f"{base}/{layout}")
            df = df.withColumn("day", (F.col("ts_ns") / DAY_NS).cast("long")) \
                if "day" not in df.columns else df
            row = {}
            total = len(df.inputFiles())
            for name, pred in preds.items():
                touched = (df.filter(pred)
                           .select(F.input_file_name().alias("f"))
                           .distinct().count())
                row[name] = touched
            row["total_files"] = total
            out[layout] = row
    finally:
        shutil.rmtree(base, ignore_errors=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
