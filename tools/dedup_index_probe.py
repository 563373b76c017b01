#!/usr/bin/env python3
"""DedupIndex scale probe: incremental probe vs batch recompute.

The claim the index exists to back: deduping a daily batch against an
N-doc historical corpus should cost O(batch), not O(N) — the batch
kernel re-shingles everything, the index probes stored band buckets.

Builds a corpus of ``n_docs`` synthetic docs (deterministic, 1% seeded
near-dup rate), indexes it once, then compares:
  a) index.probe(batch)          — the incremental path
  b) near_dup_pairs(corpus+batch) filtered to cross pairs — the recompute
     path a pipeline without the index would run
and reports wall times + that the match sets agree.

Usage: python3 tools/dedup_index_probe.py [n_docs] [batch]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
         "kilo lima mike november oscar papa quebec romeo sierra tango "
         "uniform victor whiskey xray yankee zulu").split()


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    batch_n = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000

    from pyspark.sql import functions as F

    from nexusbase_spark.pipeline.dedup import near_dup_pairs
    from nexusbase_spark.pipeline.dedup_index import DedupIndex
    from nexusbase_spark.session import get_spark

    spark = get_spark("dedup-index-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic corpus: 12-word docs from a md5-seeded word walk;
    # every 100th batch doc is an exact-text twin of a corpus doc
    words_arr = F.array(*[F.lit(w) for w in WORDS])

    def doc_text(idcol):
        return F.concat_ws(" ", F.transform(
            F.sequence(F.lit(0), F.lit(11)),
            lambda i: F.element_at(
                words_arr,
                (F.pmod(F.xxhash64(idcol * 13 + i), F.lit(26)) + 1).cast("int"))))

    corpus = (spark.range(n_docs).select(F.col("id").alias("doc_id"))
              .withColumn("text", doc_text(F.col("doc_id"))))
    batch = (spark.range(batch_n)
             .select((F.col("id") + 10_000_000).alias("doc_id"),
                     F.when(F.col("id") % 100 == 0, doc_text(F.col("id")))
                     .otherwise(doc_text(F.col("id") + 31_337_000)).alias("text")))
    corpus = corpus.persist(); corpus.count()
    batch = batch.persist(); batch.count()

    out: dict = {"n_docs": n_docs, "batch": batch_n}

    t = time.time()
    ix_path = tempfile.mkdtemp(prefix="dedup_ix_probe_")
    idx = DedupIndex.build(spark, ix_path, corpus)
    out["build_s"] = round(time.time() - t, 2)

    t = time.time()
    got = idx.probe(batch, threshold=0.5, max_bucket=64)
    inc_pairs = got.count()
    out["probe_s"] = round(time.time() - t, 2)
    out["probe_pairs"] = inc_pairs

    t = time.time()
    full = near_dup_pairs(corpus.unionByName(batch), threshold=0.5,
                          max_bucket=64)
    cross = full.filter(
        ((F.col("id_a") >= 10_000_000) != (F.col("id_b") >= 10_000_000)))
    re_pairs = cross.count()
    out["recompute_s"] = round(time.time() - t, 2)
    out["recompute_pairs"] = re_pairs
    out["speedup"] = round(out["recompute_s"] / max(out["probe_s"], 1e-9), 1)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
