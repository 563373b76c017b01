#!/usr/bin/env python3
"""Skew probe: a deliberately pathological corpus — one EXACT-duplicate
cluster holding ~10% of all docs (which is simultaneously one white-hot
LSH bucket) — and a hot-shard check for pack_assignments.

What it answers (SCALE.md records a run):
1. exact dedup under a 10% hot hash key: the window over content_hash
   shuffles one giant group to one reducer — measure the reducer
   max/median row ratio and wall time. The giant group is unavoidable
   for exact dedup (the answer itself is that group), but the probe
   proves the rest of the corpus doesn't serialize behind it.
2. MinHash LSH with/without the max_bucket cap: uncapped, the hot
   bucket's self-join is quadratic (~(0.1·N)²/2 candidate pairs);
   capped, candidates stay linear. Wall-time ratio is the evidence.
3. bucket_clusters on the same corpus (the pairless path's answer to
   the same skew).
4. pack_assignments hot-shard serialization: with shards << cores the
   running-sum window serializes per shard; record wall time and
   reducer balance at shards=4 vs shards=64 (same data).

Usage: python3 tools/skew_probe.py [replication] (default 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nexusbase_spark.datamodel import load_table
from nexusbase_spark.session import get_spark


def partition_balance(df) -> dict:
    """Post-shuffle reducer load: rows per output partition of the frame.
    NOTE: with AQE coalescing on (the production config) small frames
    collapse to one partition — at probe scale the KEY skew below is the
    meaningful signal; this confirms the runtime keeps reducers bounded."""
    import statistics
    counts = [r["c"] for r in
              df.groupBy(F.spark_partition_id().alias("p"))
              .agg(F.count(F.lit(1)).alias("c")).collect()]
    if not counts:
        return {"partitions": 0}
    med = statistics.median(counts)
    return {"partitions": len(counts), "max": max(counts),
            "median": med, "max_over_median": round(max(counts) / max(med, 1), 1)}


def key_skew(df, *cols) -> dict:
    """Shuffle-KEY skew: the largest group vs the median group on the
    given grouping columns — the quantity a hot hash key / hot LSH bucket
    / hot shard actually distorts, independent of AQE coalescing."""
    import statistics
    counts = [r["c"] for r in df.groupBy(*cols)
              .agg(F.count(F.lit(1)).alias("c")).collect()]
    if not counts:  # mirror partition_balance's empty-input guard
        return {"groups": 0, "max_group": 0, "median_group": 0,
                "max_over_median": 0.0}
    med = statistics.median(counts)
    return {"groups": len(counts), "max_group": max(counts),
            "median_group": med,
            "max_over_median": round(max(counts) / max(med, 1), 1)}


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("skew-probe", extra_conf={
        "spark.ui.enabled": "false", "spark.ui.showConsoleProgress": "false",
        "spark.driver.memory": "32g",
    })
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"replication": factor}

    base = load_table(spark, sf_dir, "documents")
    hot = base.orderBy("doc_id").limit(1).collect()[0]["text"]
    rep = base.crossJoin(spark.range(factor).withColumnRenamed("id", "rep"))
    # ~10% of all docs become EXACT copies of one document: a single
    # content-hash group AND a single LSH bucket carrying 10% of the corpus
    docs = rep.select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        F.when(F.pmod(F.xxhash64("doc_id") + F.col("rep"), F.lit(10)) == 0,
               F.lit(hot)).otherwise(F.col("text")).alias("text"),
        "lang", "source", "n_chars",
    ).persist()
    out["docs"] = docs.count()

    from nexusbase_spark.pipeline.dedup import (
        bucket_clusters, exact_dedup_groups, near_dup_pairs)

    # 1. exact dedup: hot hash group (NB: replication itself makes every
    # doc a duplicate across replicas; the hot cluster sits on top)
    out["hash_key_skew"] = key_skew(
        docs.select(F.md5(F.trim(F.lower(F.col("text")))).alias("h")), "h")
    t = time.time()
    groups = exact_dedup_groups(docs)
    n_dup = groups.filter(F.col("group_size") > 1).count()
    out["exact_dedup"] = {"s": round(time.time() - t, 2), "dup_rows": n_dup,
                          "balance": partition_balance(groups)}

    # 2. LSH near-dup: capped vs uncapped on the hot bucket
    t = time.time()
    capped = near_dup_pairs(docs, threshold=0.5, max_bucket=64).count()
    out["lsh_capped_64"] = {"s": round(time.time() - t, 2), "pairs": capped}
    if out["docs"] <= 60_000:  # uncapped is quadratic; keep the probe sane
        t = time.time()
        uncapped = near_dup_pairs(docs, threshold=0.5).count()
        out["lsh_uncapped"] = {"s": round(time.time() - t, 2),
                               "pairs": uncapped}

    # 3. pairless clustering under the same skew
    t = time.time()
    n_clustered = bucket_clusters(docs).count()
    out["bucket_clusters"] = {"s": round(time.time() - t, 2),
                              "rows": n_clustered}

    # 4. pack_assignments: hot-shard serialization (shards vs cores)
    from nexusbase_spark.pipeline.pack import pack_assignments
    toks = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tok")).persist()
    toks.count()
    from nexusbase_spark.pipeline.split import split_bucket
    out["shard_key_skew"] = key_skew(
        toks.select((split_bucket(F.col("doc_id"), "pack-v1") % 64)
                    .alias("shard")), "shard")
    for shards in (4, 64):
        t = time.time()
        packed = pack_assignments(toks, "doc_id", "n_tok",
                                  budget=512, shards=shards)
        n = packed.count()
        out[f"pack_shards_{shards}"] = {
            "s": round(time.time() - t, 2), "rows": n,
            "balance": partition_balance(packed)}

    docs.unpersist()
    toks.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
