#!/usr/bin/env python3
"""Per-query plan + timing audit for the optimization rounds (guide §1).

For each named query (default: bench.py's HEADLINE list):
  - captures .explain("formatted") to <outdir>/<name>_<tag>.txt
  - times the computation via the noop sink (guide §1.4) — one untimed
    warm-up, then N timed runs, best reported — with setJobDescription
    labels (§1.5)
  - summarizes plan shape: Exchange count, join strategies, Python
    eval nodes, scans with PushedFilters

Usage:
  python3 tools/plan_audit.py --tag before [--queries a,b,c] [--runs 2]
  SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS honored like bench.py.

Output: one JSON line {"tag":..., "queries": {name: {"noop_s":...,
"exchanges":..., "joins": [...], "python_nodes": [...]}}}.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_stats(plan: str) -> dict:
    exchanges = len(re.findall(r"\bExchange\b", plan))
    reused = len(re.findall(r"ReusedExchange", plan))
    joins = re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b", plan)
    pynodes = re.findall(
        r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
        r"FlatMapGroupsInPandas|AggregateInPandas)\b", plan)
    scans = len(re.findall(r"Scan parquet|FileScan", plan))
    sorts = len(re.findall(r"\bSort \[", plan))
    return {
        "exchanges": exchanges,
        "reused_exchanges": reused,
        "joins": sorted(set(joins)),
        "n_joins": len(joins),
        "python_nodes": sorted(set(pynodes)),
        "n_python_nodes": len(pynodes),
        "scans": scans,
        "sorts": sorts,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--queries", default=None,
                    help="comma-separated names; default bench HEADLINE")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--outdir", default=os.path.join(REPO, "plans", "r09"))
    ap.add_argument("--no-time", action="store_true",
                    help="plans only, skip the timed noop runs")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from nexusbase_spark.session import get_spark
    from nexusbase_spark.datamodel import load_table
    from nexusbase_spark.queries import all_queries

    if args.queries:
        names = args.queries.split(",")
    else:
        import bench
        names = list(bench.HEADLINE)

    os.makedirs(args.outdir, exist_ok=True)
    spark = get_spark("nexusbase-plan-audit", master=f"local[{cpus}]",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # same warm-up as bench.py so timings are steady-state comparable
    for t in ("events", "lineitem", "orders", "customer", "documents",
              "embeddings"):
        load_table(spark, sf_dir, t).count()
    spark.range(256).repartition(int(cpus)).mapInPandas(
        lambda it: it, "id long").count()

    qs = all_queries()
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        path = os.path.join(args.outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        stats = plan_stats(plan)
        if not args.no_time:
            sc = spark.sparkContext
            sc.setJobDescription(f"audit:{name}:warmup")
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = float("inf")
            for i in range(args.runs):
                sc.setJobDescription(f"audit:{name}:run{i}")
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            sc.setJobDescription(None)
            stats["noop_s"] = round(best, 3)
        out[name] = stats
        print(f"  {name}: {stats}", file=sys.stderr)

    print(json.dumps({"tag": args.tag, "sf_dir": sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
