#!/usr/bin/env python3
"""Benchmark harness (driver contract: prints ONE JSON line).

Measures the BASELINE.md metric shapes on $SPARK_GRAFT_SF_DIR (default
sf0.1) with local[$SPARK_GRAFT_CPUS]:

1. ingest points/sec — events table -> points layout -> parquet append
   (the reference's PutBatch shape, cmd/perf-client/main.go:52-56);
2. per-query wall seconds for one headline query per operator family
   (fully drained, like cmd/query-perf-client drains its stream);
3. repeated-scan throughput: qps + P50/P90/P99 over randomized
   range+tag scans (the reference's query-perf workload scaled down).

Output: {"metric": ..., "value": <total headline seconds>, "unit": "sec",
"queries": {name: sec, ...}, "sf": ..., plus ingest/scan stats}.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    # reference operator families (SURVEY.md §2)
    "raw_scan_range_tag",
    "final_agg_basic",
    "final_agg_firstlast",
    "downsample_1d",
    "downsample_emit_empty",
    "mvcc_dedup_latest",
    "tombstone_series",
    "cursor_page",
    "show_metrics",
    # warehouse analytics
    "tpch_q1_pricing_summary",
    "tpch_q3_top_orders",
    "tpch_q5_region_revenue",
    "events_user_daily_activity",
    # training-data pipeline
    "doc_dedup_exact",
    "doc_dedup_minhash_lsh",
    "doc_dedup_simhash",
    "text_quality",
    "embed_cosine_topk",
    "embed_ivf_topk",
    "multimodal_meta",
    # late-round families: time-series join, behavioral funnel,
    # curation (packing), LSH ANN
    "events_asof_enrich",
    "events_funnel",
    "docs_pack_assignments",
    "embed_lsh_topk",
    # widened families: deep star join, training-window chunking,
    # behavioral cohorts
    "tpch_q8_mkt_share",
    "docs_chunk_sliding",
    "events_cohort_retention",
    # final round-1 families: double-agg distribution join, linear
    # interpolation, outlier detection, LM scoring, kNN labeling
    "tpch_q13_custdist",
    "events_gap_fill_linear",
    "events_zscore_outliers",
    "text_unigram_logprob",
    "embed_knn_classify",
    # composition + mixing
    "docs_curation_pipeline",
    "docs_temperature_mix",
    # robust anomaly detection; index-served ANN (the warm-up run builds
    # the materialized index, timed runs measure pure serving)
    "events_robust_outliers",
    "embed_vecindex_topk",
]


def _steal_jiffies() -> int | None:
    """Cumulative hypervisor steal time (jiffies, all CPUs) from
    /proc/stat field 8 — the only visible witness of a co-tenant burst
    on a shared VM (runnable-thread loadavg stays 0 while every phase is
    throttled). None when the kernel doesn't expose it."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]) if len(parts) > 8 else None
    except (OSError, ValueError, IndexError):
        return None


def _settle_host(max_wait_s: float, idle_load: float,
                 idle_load_5m: float) -> dict:
    """Make the official artifact robust to a non-idle driver host
    (VERDICT r5 #4: BENCH_r05 ran right after a 38-minute pytest sweep
    and read 15-30% below same-tree idle runs; VERDICT r6 #2: BENCH_r06
    recorded host_idle=true with 1-min load 3.73 but 5/15-min loads of
    16.5/21.6 — technically-true-but-misleading). Sample loadavg; wait
    until BOTH the 1-minute load is <= `idle_load` AND the 5-minute load
    is <= `idle_load_5m`, or `max_wait_s` is spent. Returns the samples,
    the legacy `host_idle` flag (1-min only, kept for cross-round
    comparability) and the new `host_idle_strict` flag (1-min AND
    5-min), so a depressed artifact explains itself either way."""
    load_at_start = os.getloadavg()
    waited = 0.0
    load = load_at_start
    while ((load[0] > idle_load or load[1] > idle_load_5m)
           and waited < max_wait_s):
        time.sleep(10.0)
        waited += 10.0
        load = os.getloadavg()
    return {
        "host_load_at_start": [round(x, 2) for x in load_at_start],
        "host_load_at_bench": [round(x, 2) for x in load],
        "host_settle_wait_s": round(waited, 1),
        "host_idle": load[0] <= idle_load,
        "host_idle_strict": load[0] <= idle_load and load[1] <= idle_load_5m,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # settle BEFORE the JVM spins up: loadavg decays with ~1min half-life
    # (5-min with ~5min half-life), so a post-pytest invocation (the
    # driver's shape) gets minutes of cooldown, while an already-idle host
    # pays one 0s check. idle_load=4 on 32 cores ~= 12% busy; the 5-minute
    # gate at 8 (VERDICT r6 #2) rejects the "just came off heavy work"
    # state that depressed BENCH_r05/r06 while still converging within the
    # 600s budget from a 20+ 5-min load (half-life ~5 min → ~8 min decay).
    host = _settle_host(
        max_wait_s=float(os.environ.get("SPARK_GRAFT_SETTLE_MAX_S", "600")),
        idle_load=float(os.environ.get("SPARK_GRAFT_IDLE_LOAD", "4.0")),
        idle_load_5m=float(os.environ.get("SPARK_GRAFT_IDLE_LOAD_5M", "8.0")))
    steal_at_start = _steal_jiffies()

    def _steal_since(mark: int | None) -> int | None:
        """Steal accrued since `mark`; None (not 0) when either read
        failed — a silent 0 would understate co-tenant interference,
        the exact condition the field exists to expose (ADVICE r7)."""
        end = _steal_jiffies()
        return None if (end is None or mark is None) else end - mark

    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from nexusbase_spark.session import get_spark
    from nexusbase_spark.datamodel import load_points, load_table
    from nexusbase_spark.queries import all_queries
    from nexusbase_spark.operators import metric_filter, tag_filter, time_range

    spark = get_spark("nexusbase-bench", master=f"local[{cpus}]",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + page cache so measurements reflect steady state
    for t in ("events", "lineitem", "orders", "customer", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()
    # ...and the Python worker pool: the first Arrow-batched stage otherwise
    # pays worker fork/exec (~8s across 32 cores), which is process startup,
    # not query work
    spark.range(256).repartition(int(cpus)).mapInPandas(
        lambda it: it, "id long").count()

    # 1. ingest: events -> points layout -> parquet append, partitioned by
    # metric (the at-scale layout: metric+time-bucket partition pruning)
    out_dir = tempfile.mkdtemp(prefix="nexusbase_ingest_")
    steal_mark = _steal_jiffies()
    try:
        from pyspark.sql import functions as F
        pts = load_points(spark, sf_dir)
        n_points = pts.count()
        # repartition on (metric, salt) so every write task emits exactly ONE
        # file inside one partition directory: full parallelism without the
        # per-task file fan-out of a round-robin repartition (measured 2.7x
        # over the narrow write, 1.6x over round-robin at sf0.1). The salt
        # count scales parallelism per metric; at cluster scale the same
        # layout bounds file count at metrics x salt per batch.
        salt = max(1, int(cpus) // 4)
        salted = pts.repartition(5 * salt, F.col("metric"),
                                 F.pmod(F.col("seq"), F.lit(salt)))
        # Same steady-state protocol as the queries below: one warm-up
        # write (pays one-time committer init + write-path codegen
        # — measured ~1.5s of a 2.5s cold write at sf0.1, i.e. the cold
        # number reports session setup, not ingest), then two timed
        # writes, report the best. Root-cause of the r2->r3 "ingest
        # regression": run-to-run drift of that fixed setup cost, not the
        # write path (SCALE.md round-4 note).
        # Cold write FIRST (this very write doubles as the warm-up):
        # timed so the r1-r3 series and the BASELINE row stay comparable
        # (VERDICT r4 "what's wrong" #2 — r4 reported only steady-state,
        # breaking the series; now BOTH numbers ship every round).
        t0 = time.time()
        salted.write.mode("overwrite").partitionBy("metric").parquet(f"{out_dir}/points")
        ingest_cold_s = time.time() - t0
        ingest_s = float("inf")
        for _ in range(2):
            t0 = time.time()
            salted.write.mode("overwrite").partitionBy("metric").parquet(f"{out_dir}/points")
            ingest_s = min(ingest_s, time.time() - t0)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    steal_ingest = _steal_since(steal_mark)

    # 2. headline queries, fully drained. One untimed warmup run, then two
    # timed runs, report the min — the same steady-state protocol as the
    # reference's `go test -bench` harnesses (N iterations, stable-state
    # number): the warmup pays one-time whole-stage-codegen JIT and
    # broadcast-build compilation, which is session setup, not query cost
    # (measured: run0 of an 8-table join is 4-5x its steady state purely
    # from janino compilation). Page-cache effects are identical for all
    # runs (the warmup counts above already touched every table).
    qs = all_queries()
    timings: dict[str, float] = {}
    steal_mark = _steal_jiffies()
    for name in HEADLINE:
        fn = qs[name]
        fn(spark, sf_dir).collect()
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
    steal_suite = _steal_since(steal_mark)

    # 3. repeated randomized scans (query-throughput shape). The reference
    # workload is defined at CONCURRENCY=10 (cmd/query-perf-client/main.go:50-54
    # runs 10 goroutines against the server); qps here is measured the same
    # way — 10 client threads sharing the session, wall time of the whole
    # batch — while per-query latency percentiles stay per-scan.
    from concurrent.futures import ThreadPoolExecutor

    rng = random.Random(42)
    pts = load_points(spark, sf_dir)
    lo, hi = pts.agg({"ts": "min"}).collect()[0][0], pts.agg({"ts": "max"}).collect()[0][0]
    metrics = [r["metric"] for r in pts.select("metric").distinct().collect()]
    n_scans = 60
    params = [(rng.choice(metrics), str(rng.randrange(0, 20)),
               rng.randrange(lo, hi - 3_600_000_000_000)) for _ in range(n_scans)]

    def one_scan(p):
        m, user, start = p
        t0 = time.time()
        time_range(tag_filter(metric_filter(pts, m), {"user": user}),
                   start, start + 3_600_000_000_000).collect()
        return time.time() - t0

    # Same params all runs; 3 runs per invocation because one number per
    # round cannot distinguish code from co-tenant on this shared VM
    # (VERDICT r7 #3: 18.5 / 23.1 / 34.3 qps on the SAME tree under
    # strict-idle). Report best + every observation + per-run steal so a
    # depressed run self-identifies. Run 1 doubles as the warm-up (scan
    # codegen), matching the suite's steady-state protocol where `best`
    # is the reported number.
    scan_qps_runs: list[float] = []
    scan_steal_runs: list[int | None] = []
    lat: list[float] = []
    best_wall = float("inf")
    for _ in range(3):
        mark = _steal_jiffies()
        t_batch = time.time()
        with ThreadPoolExecutor(max_workers=10) as ex:
            run_lat = list(ex.map(one_scan, params))
        run_wall = time.time() - t_batch
        scan_steal_runs.append(_steal_since(mark))
        scan_qps_runs.append(round(n_scans / run_wall, 2))
        if run_wall < best_wall:
            best_wall, lat = run_wall, run_lat
    wall = best_wall
    lat.sort()
    pct = lambda p: round(lat[min(int(len(lat) * p), len(lat) - 1)], 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline query suite wall time (fully drained)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # steady-state (post-warmup best-of-two) — the honest throughput
        # number; _cold includes one-time session/committer setup and is
        # the like-for-like continuation of the r1-r3 measurement series
        "ingest_points_per_sec": round(n_points / ingest_s, 1),
        "ingest_steady_pts_per_sec": round(n_points / ingest_s, 1),
        "ingest_cold_pts_per_sec": round(n_points / ingest_cold_s, 1),
        "ingest_points": n_points,
        "scan_qps": round(n_scans / wall, 2),
        "scan_qps_runs": scan_qps_runs,
        "scan_concurrency": 10,
        "scan_p50_s": pct(0.50),
        "scan_p90_s": pct(0.90),
        "scan_p99_s": pct(0.99),
        **host,
        # hypervisor steal accrued DURING the bench, total and per phase:
        # on this shared VM a co-tenant burst throttles a phase while
        # loadavg stays at 0 (measured: two back-to-back strict-idle
        # runs, 19.7s vs 51.8s suite — the only witness is the steal
        # counter). Nonzero steal means that phase tracked the neighbor,
        # not the code; the per-run scan list lets a depressed scan_qps
        # self-identify (VERDICT r7 #3). None = the /proc/stat read
        # failed, NOT zero steal (ADVICE r7).
        "host_steal_jiffies_during_bench": _steal_since(steal_at_start),
        "host_steal_jiffies_ingest": steal_ingest,
        "host_steal_jiffies_suite": steal_suite,
        "host_steal_jiffies_scan_runs": scan_steal_runs,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
