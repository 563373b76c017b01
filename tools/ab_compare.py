#!/usr/bin/env python3
"""Interleaved A/B benchmark: old tree vs new tree, alternating, with
per-run steal counters and a mandatory control band (VERDICT r9 #8 — the
methodology that produced round 9's only trustworthy local timings,
promoted from session logs into a tool).

Why interleaved: this VM has bursty co-tenant steal. Back-to-back "old
then new" sessions measure the host, not the code (round 9: three
steal-gated attempts saw 34-41k jiffies in the old phase vs 8-25k in the
new phase — a 0.6x "win" on unchanged code). Alternating A/B/A/B inside
one sitting exposes both sides to the same load, and UNCHANGED control
queries measure the residual bias: only a ratio clearly below the control
band is a code win.

Usage:
  git worktree add /tmp/ab_old <baseline-commit>
  python3 tools/ab_compare.py --old-repo /tmp/ab_old \
      --queries final_agg_firstlast,text_unigram_logprob \
      --controls mvcc_dedup_latest,tombstone_series \
      [--rounds 4] [--runs-per-round 2]

Each round spawns one subprocess per side (fresh JVM, identical setup:
bench.py's table warm-up + per-query untimed warm-up, then timed noop
runs); rounds alternate old-first / new-first so JVM-vintage effects
cancel too. The summary REFUSES to print per-query ratios unless at
least one control query ran — by design.

SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS honored like bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time


def _steal() -> int | None:
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]) if len(parts) > 8 else None
    except (OSError, ValueError, IndexError):
        return None


def worker(queries: list[str], runs: int) -> None:
    """Run inside the target repo (PYTHONPATH already points there):
    warm up like bench.py, then per query one untimed warm-up + `runs`
    timed noop runs; print one JSON line {query: best_sec}."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from nexusbase_spark.session import get_spark
    from nexusbase_spark.datamodel import load_table
    from nexusbase_spark.queries import all_queries

    spark = get_spark("ab-compare", master=f"local[{cpus}]",
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
        spark.sparkContext.setJobDescription(f"ab:{name}:warmup")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"ab:{name}:run{i}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    spark.sparkContext.setJobDescription(None)
    print("ABRESULT " + json.dumps(out))
    spark.stop()


def run_side(repo: str, queries: list[str], runs: int) -> tuple[dict, int | None]:
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    s0 = _steal()
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__),
         "--worker", ",".join(queries), "--runs-per-round", str(runs)],
        env=env, cwd=repo, capture_output=True, text=True, timeout=1800)
    steal = None if (s0 is None or _steal() is None) else _steal() - s0
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):]), steal
    raise RuntimeError(
        f"worker in {repo} produced no result; stderr tail:\n"
        + proc.stderr[-2000:])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--old-repo", default=None)
    ap.add_argument("--new-repo", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--queries", default="")
    ap.add_argument("--controls", default="",
                    help="UNCHANGED queries measuring host bias (required)")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--runs-per-round", type=int, default=2)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker.split(","), args.runs_per_round)
        return

    if not args.old_repo:
        ap.error("--old-repo required (git worktree of the baseline commit)")
    targets = [q for q in args.queries.split(",") if q]
    controls = [q for q in args.controls.split(",") if q]
    if not controls:
        ap.error("--controls required: without an unchanged-query control "
                 "band, a ratio on this host is a host measurement, not a "
                 "code measurement (round-9 exhibit: 0.6x on identical code)")
    allq = targets + controls

    old_times: dict[str, list[float]] = {q: [] for q in allq}
    new_times: dict[str, list[float]] = {q: [] for q in allq}
    steals: list[tuple[str, int | None]] = []
    for r in range(args.rounds):
        order = [("old", args.old_repo, old_times),
                 ("new", args.new_repo, new_times)]
        if r % 2 == 1:
            order.reverse()
        for side, repo, sink in order:
            res, st = run_side(repo, allq, args.runs_per_round)
            steals.append((side, st))
            for q, s in res.items():
                sink[q].append(s)
            print(f"round {r} {side}: steal={st} {res}", file=sys.stderr)

    def best(d, q):
        return min(d[q]) if d[q] else float("nan")

    control_ratios = [best(new_times, q) / best(old_times, q)
                      for q in controls]
    band = statistics.median(control_ratios)
    summary = {
        "rounds": args.rounds,
        "runs_per_round": args.runs_per_round,
        "per_run_steal": steals,
        "control_band_median_ratio": round(band, 3),
        "controls": {q: {"old_s": best(old_times, q),
                         "new_s": best(new_times, q),
                         "ratio": round(best(new_times, q)
                                        / best(old_times, q), 3)}
                     for q in controls},
        "targets": {},
    }
    for q in targets:
        ratio = best(new_times, q) / best(old_times, q)
        summary["targets"][q] = {
            "old_s": best(old_times, q), "new_s": best(new_times, q),
            "ratio": round(ratio, 3),
            "old_runs": old_times[q], "new_runs": new_times[q],
            # a ratio is only claimable as CODE if it clearly beats what
            # the unchanged controls did under the same load
            "beats_control_band": ratio < band - 0.1,
        }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
