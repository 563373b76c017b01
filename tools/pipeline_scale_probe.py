#!/usr/bin/env python3
"""Pipeline scale probe: replicate the sf0.1 documents/embeddings tables
R-fold (default 20x -> ~100k docs / ~10k vectors) and measure the
training-data operators at that scale.

What it demonstrates (SCALE.md records a run):
- exact dedup finds the cross-replica duplicates with one hash shuffle;
- MinHash+LSH near-dup stays near-linear (banded candidates, bucket cap
  bounding the quadratic self-join) while candidate volume grows R^2;
- unigram LM scoring's shuffles stay vocabulary-sized as instances grow;
- brute-force vs LSH-bucketed ANN gap widens with corpus size.

Replicas 0 keeps the original text; odd replicas get a one-token suffix
(near-duplicates: high Jaccard, not exact); even replicas >0 are exact
copies — so both dedup families have real work whose expected volume is
known from R.

Usage: python3 tools/pipeline_scale_probe.py [replication] (default 20)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nexusbase_spark.session import get_spark
from nexusbase_spark.datamodel import load_table


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pipeline-scale-probe", extra_conf={
        "spark.ui.enabled": "false", "spark.ui.showConsoleProgress": "false",
        # local mode: driver == executors == one JVM; the default 1g heap
        # cannot hold the replicated frames' broadcast builds
        "spark.driver.memory": "32g",
    })
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"replication": factor}

    base = load_table(spark, sf_dir, "documents")
    n_base = base.count()
    rep = base.crossJoin(spark.range(factor).withColumnRenamed("id", "rep"))
    docs = rep.select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        F.when(F.col("rep") % 2 == 1,
               F.concat(F.col("text"), F.lit(" replicamarker")))
        .otherwise(F.col("text")).alias("text"),
        "lang", "source", "n_chars",
    ).persist()
    out["docs"] = docs.count()

    def timed(name, thunk):
        # a thunk, not a frame: operators with eager checkpoints
        # (bucket_clusters) do their work at CONSTRUCTION time, so the
        # build must sit inside the clock
        t = time.time()
        n = thunk().count()
        out[name] = {"s": round(time.time() - t, 2), "rows": n}

    from nexusbase_spark.pipeline.dedup import (
        bucket_clusters, exact_dedup_groups, near_dup_pairs)
    timed("exact_dedup", lambda: exact_dedup_groups(docs)
          .filter(F.col("group_size") > 1))

    timed("minhash_lsh_capped", lambda: near_dup_pairs(
        docs, threshold=0.5, max_bucket=2 * factor + 8))

    # the pairless endgame: same banding, star edges, connected components
    timed("bucket_clusters", lambda: bucket_clusters(docs))

    # unigram LM rescoring at R x instances
    from nexusbase_spark.queries import all_queries  # noqa: F401  (registry import)
    t = (docs.select("doc_id", F.explode(
            F.split(F.trim(F.lower(F.col("text"))), " ")).alias("token"))
         .filter(F.col("token") != ""))
    uni = t.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    tot = uni.agg(F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("vocab"))
    lp = (uni.crossJoin(F.broadcast(tot))
          .select("token", F.log((F.col("cnt") + 1)
                                 / (F.col("total") + F.col("vocab"))).alias("logp")))
    timed("unigram_logprob", lambda: t.join(F.broadcast(lp), "token")
          .groupBy("doc_id").agg(F.avg("logp").alias("s")))

    # ANN: brute force vs LSH buckets on an R x 100-fold vector corpus
    emb = load_table(spark, sf_dir, "embeddings")
    vrep = emb.crossJoin(spark.range(factor * 5).withColumnRenamed("id", "rep"))
    vecs = vrep.select(
        (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
        F.transform("embedding",
                    lambda x: x + (F.col("rep") % 7) * F.lit(0.001)).alias("embedding"),
        "label").persist()
    out["vectors"] = vecs.count()
    probe = [float(x) for x in
             emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    from nexusbase_spark.pipeline.similarity import cosine_topk, lsh_topk
    timed("cosine_topk_brute", lambda: cosine_topk(vecs, probe, k=10))
    timed("cosine_topk_lsh", lambda: lsh_topk(vecs, probe, k=10))

    # materialized IVF index: build once, then serving reads only the
    # probed clusters' files — the standing-retrieval path
    import tempfile

    from nexusbase_spark.pipeline.vecindex import VectorIndex
    idx_dir = tempfile.mkdtemp(prefix="nexusbase_vecidx_")
    t0 = time.time()
    idx = VectorIndex.build(spark, idx_dir, vecs, nlist=8, iters=2)
    out["vecindex_build_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    n = idx.search(probe, k=10, nprobe=2).count()
    out["vecindex_search"] = {"s": round(time.time() - t0, 2), "rows": n}
    touched, total = idx.probed_files(probe, nprobe=2)
    out["vecindex_files"] = {"touched": touched, "total": total}

    docs.unpersist()
    vecs.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
