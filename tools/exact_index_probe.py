#!/usr/bin/env python3
"""ExactDupIndex scale probe: incremental LOSSLESS probe vs batch
recompute, and probe-cost flatness as the historical corpus grows.

The claims to back with numbers (SCALE.md records a run):
  a) index.probe(batch) finds exactly what the corpus-wide
     prefix_filter_pairs finds (cross pairs) — losslessness at size;
  b) probing a FIXED batch costs ~the same against a 4x larger corpus
     (the posting join touches colliding postings, not the store).

Usage: python3 tools/exact_index_probe.py [n_docs] [batch]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)



def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    batch_n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000

    from pyspark.sql import functions as F

    from nexusbase_spark.pipeline.dedup import prefix_filter_pairs
    from nexusbase_spark.pipeline.ppjoin_index import ExactDupIndex
    from nexusbase_spark.session import get_spark

    spark = get_spark("exact-index-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # 20k-token vocabulary: real corpora have rare tokens, and prefix
    # filtering's whole point is joining on them — a tiny vocabulary
    # (the MinHash probe tool's 26 words) makes every token frequent
    # and degenerates the candidate join by construction
    def doc_text(idcol):
        return F.concat_ws(" ", F.transform(
            F.sequence(F.lit(0), F.lit(11)),
            lambda i: F.concat(F.lit("w"), F.pmod(
                F.xxhash64(idcol * 13 + i), F.lit(20_000)).cast("string"))))

    batch = (spark.range(batch_n)
             .select((F.col("id") + 10_000_000).alias("doc_id"),
                     F.when(F.col("id") % 100 == 0, doc_text(F.col("id")))
                     .otherwise(doc_text(F.col("id") + 31_337_000))
                     .alias("text")))
    batch = batch.persist()
    batch.count()

    results = []
    for n in (n_docs, 4 * n_docs):
        corpus = (spark.range(n).select(F.col("id").alias("doc_id"))
                  .withColumn("text", doc_text(F.col("doc_id"))))
        corpus = corpus.persist()
        corpus.count()
        row: dict = {"n_docs": n, "batch": batch_n}

        t = time.time()
        path = tempfile.mkdtemp(prefix="exact_ix_probe_")
        ix = ExactDupIndex.build(spark, path, corpus, min_threshold=0.7)
        row["build_s"] = round(time.time() - t, 2)

        ix.probe(batch, threshold=0.7).count()  # warm
        t = time.time()
        got = ix.probe(batch, threshold=0.7)
        row["probe_pairs"] = got.count()
        row["probe_s"] = round(time.time() - t, 2)

        t = time.time()
        full = prefix_filter_pairs(corpus.unionByName(batch),
                                   threshold=0.7)
        cross = full.filter((F.col("id_a") >= 10_000_000)
                            != (F.col("id_b") >= 10_000_000))
        row["recompute_pairs"] = cross.count()
        row["recompute_s"] = round(time.time() - t, 2)
        row["lossless"] = row["probe_pairs"] == row["recompute_pairs"]
        row["speedup"] = round(row["recompute_s"]
                               / max(row["probe_s"], 1e-9), 1)
        results.append(row)
        print(json.dumps(row), flush=True)
        corpus.unpersist()

    flat = results[1]["probe_s"] / max(results[0]["probe_s"], 1e-9)
    print(json.dumps({"probe": "exact_index",
                      "probe_growth_at_4x_corpus": round(flat, 2),
                      "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
