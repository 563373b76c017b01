#!/usr/bin/env python3
"""Core-count scaling probe at a compute-dominated scale (VERDICT r9 #7).

At sf0.1 most headline queries finish in 0.2-1.0 s, where per-query fixed
cost (job submission, planning, result pull) swamps the parallel work and
the c8/c32 ratio measures noise. This probe re-times chosen queries at a
bigger input (default the 10x replicated fixture) under BOTH core counts,
interleaved c32/c8/c8/c32 so host drift cancels, with per-session steal.

Usage:
  python3 tools/core_scaling_probe.py --sf-dir /tmp/sfbig10 \
      --queries tpch_q5_region_revenue,text_quality [--runs 2]

Prints one JSON line: {query: {"c32_s": best, "c8_s": best,
"ratio": c8/c32}, "_steal": [...]}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _steal() -> int | None:
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]) if len(parts) > 8 else None
    except (OSError, ValueError, IndexError):
        return None


def worker(queries: list[str], runs: int, cpus: str, sf_dir: str) -> None:
    import time
    from nexusbase_spark.session import get_spark
    from nexusbase_spark.datamodel import load_table
    from nexusbase_spark.queries import all_queries

    spark = get_spark("core-scaling-probe", master=f"local[{cpus}]",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("events", "lineitem", "orders", "customer", "documents",
              "embeddings"):
        load_table(spark, sf_dir, t).count()
    spark.range(256).repartition(int(cpus)).mapInPandas(
        lambda it: it, "id long").count()
    qs = all_queries()
    out: dict[str, float] = {}
    for name in queries:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"scale:{name}:warmup")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"scale:{name}:run{i}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    spark.sparkContext.setJobDescription(None)
    print("SCALERESULT " + json.dumps(out))
    spark.stop()


def run_side(cpus: str, queries: list[str], runs: int,
             sf_dir: str) -> tuple[dict, int | None]:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    s0 = _steal()
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", ",".join(queries),
         "--runs", str(runs), "--cpus", cpus, "--sf-dir", sf_dir],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=3600)
    steal = None if (s0 is None or _steal() is None) else _steal() - s0
    for line in proc.stdout.splitlines():
        if line.startswith("SCALERESULT "):
            return json.loads(line[len("SCALERESULT "):]), steal
    raise RuntimeError("worker produced no result; stderr tail:\n"
                       + proc.stderr[-2000:])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--queries", required=False, default="")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--sf-dir", default="/tmp/sfbig10")
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker.split(","), args.runs, args.cpus, args.sf_dir)
        return

    queries = [q for q in args.queries.split(",") if q]
    if not queries:
        ap.error("--queries required")
    times: dict[str, dict[str, list[float]]] = {
        q: {"32": [], "8": []} for q in queries}
    steals = []
    for cpus in ("32", "8", "8", "32"):
        res, st = run_side(cpus, queries, args.runs, args.sf_dir)
        steals.append((cpus, st))
        print(f"c{cpus}: steal={st} {res}", file=sys.stderr)
        for q, s in res.items():
            times[q][cpus].append(s)
    out = {"_sf_dir": args.sf_dir, "_steal": steals}
    for q in queries:
        c32, c8 = min(times[q]["32"]), min(times[q]["8"])
        out[q] = {"c32_s": c32, "c8_s": c8, "ratio": round(c8 / c32, 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
