#!/usr/bin/env python3
"""Executed-plan (post-AQE) audit: run a query, capture the FINAL physical
plan, and count what actually executed (guide §7.2: with AQE on, explain()
before execution shows the initial plan; the final re-optimized plan only
exists after the run).

The textual pre-execution plan over-counts scans when a subtree is cached
(InMemoryRelation renders its child per reference) or when ReuseExchange /
ReuseSubquery dedupes at runtime — this tool answers the runtime question:
how many physical parquet scans / exchanges / cache reads actually ran.

Usage:
  python3 tools/executed_plan.py --queries doc_dedup_minhash_lsh,tpch_q8_mkt_share \
      [--outdir plans/r10] [--tag executed]
  SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS honored like bench.py.

Output: one JSON line per query on stdout with pattern counts from the
final executed plan (including all materialized subqueries/stages).
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


def executed_stats(plan: str) -> dict:
    return {
        "scans_parquet": len(re.findall(r"Scan parquet", plan)),
        "exchanges": len(re.findall(r"\bExchange (?:hash|range|Single|round)", plan)),
        "reused_exchanges": len(re.findall(r"ReusedExchange", plan)),
        "reused_subqueries": len(re.findall(r"ReusedSubquery", plan)),
        "inmemory_scans": len(re.findall(r"InMemoryTableScan", plan)),
        "joins": sorted(set(re.findall(
            r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)\b", plan))),
        "python_nodes": sorted(set(re.findall(
            r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
            r"FlatMapGroupsInPandas|AggregateInPandas)\b", plan))),
        "final_plan": "isFinalPlan=true" in plan,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True,
                    help="comma-separated registered query names")
    ap.add_argument("--outdir", default=None,
                    help="also write the full executed plan text here")
    ap.add_argument("--tag", default="executed")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from nexusbase_spark.session import get_spark
    from nexusbase_spark.queries import all_queries

    spark = get_spark("nexusbase-executed-plan", master=f"local[{cpus}]",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    if args.outdir:
        os.makedirs(args.outdir, exist_ok=True)

    for name in args.queries.split(","):
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"executed_plan:{name}")
        df = fn(spark, sf_dir)
        t0 = time.time()
        df.collect()
        wall = time.time() - t0
        # executedPlan.toString() AFTER the action renders the final
        # adaptively-optimized plan (isFinalPlan=true), including
        # AQEShuffleRead / ReusedExchange decisions made at runtime
        qe = df._jdf.queryExecution()
        plan = qe.executedPlan().toString()
        # stringWithStats-style full render incl. subqueries
        try:
            plan_full = qe.toString()
        except Exception:
            plan_full = plan
        stats = executed_stats(plan_full)
        stats["wall_s"] = round(wall, 3)
        if args.outdir:
            path = os.path.join(args.outdir, f"{name}_{args.tag}.txt")
            with open(path, "w") as f:
                f.write(plan_full)
            stats["plan_file"] = path
        print(json.dumps({name: stats}))
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
