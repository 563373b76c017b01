#!/usr/bin/env python3
"""InvertedIndex scale probe: index-served retrieval vs corpus re-scan.

The claim the index exists to back: a term query against an N-doc corpus
should cost O(postings of the query terms), not O(N) — the scan path
(bm25_topk) re-tokenizes and scores every document per query, the index
reads only the query terms' bucket directories.

Builds synthetic corpora at increasing sizes, then per size compares:
  a) ix.search(terms)            — pruned postings read + candidate-only
                                   scoring (after one build, amortized
                                   over all future queries)
  b) bm25_topk(corpus, terms)    — the per-query full scan
and reports wall times, the file-pruning ratio, and that the rankings
agree on the matching docs.

Usage: python3 tools/invindex_probe.py [sizes_csv]  (default 20000,80000)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Zipf-ish vocabulary: word id = hash % rank-skewed buckets, so common
# words dominate tokens while most of the ~4k-word vocabulary is rare.
# Query terms are mid-frequency — the selective regime an inverted index
# exists for (df(term) << N; with a 26-word vocabulary every term matches
# ~all docs and candidate scoring degenerates to the full scan).
VOCAB_BITS = 12  # 4096 words
TERMS = ["w273", "w1411", "w2925"]


def timed(thunk):
    t0 = time.time()
    out = thunk()
    return out, time.time() - t0


def main() -> None:
    sizes = [int(x) for x in
             (sys.argv[1] if len(sys.argv) > 1 else "20000,80000").split(",")]

    from pyspark.sql import functions as F

    from nexusbase_spark.pipeline.invindex import InvertedIndex
    from nexusbase_spark.pipeline.search import bm25_topk
    from nexusbase_spark.session import get_spark

    spark = get_spark("invindex-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    for n in sizes:
        # deterministic synthetic corpus: 12 words/doc; each draw squares
        # a uniform hash fraction to skew toward low word-ids (Zipf-ish)
        def word(i: int):
            u = F.pmod(F.hash(F.col("id") * 31 + i), F.lit(1 << VOCAB_BITS))
            skew = F.floor((u * u).cast("double") / (1 << VOCAB_BITS))
            return F.concat(F.lit("w"), skew.cast("long").cast("string"))

        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *[word(i) for i in range(60)]).alias("text"))
        docs = docs.localCheckpoint(eager=True)

        path = tempfile.mkdtemp(prefix="nexusbase_invp_")
        _, t_build = timed(lambda: InvertedIndex.build(
            spark, path, docs, n_buckets=64))
        ix = InvertedIndex(spark, path)
        # warm both paths once (codegen), then time
        ix.search(TERMS, k=10).collect()
        bm25_topk(docs, TERMS, k=10).collect()
        served, t_ix = timed(lambda: ix.search(TERMS, k=10).collect())
        scanned, t_scan = timed(lambda: bm25_topk(docs, TERMS, k=10).collect())

        total_files = len(spark.read.parquet(
            os.path.join(path, "postings")).inputFiles())
        touched = (ix.term_postings(TERMS)
                   .select(F.input_file_name().alias("f")).distinct().count())
        a = [(r["doc_id"], r["score"]) for r in served]
        b = [(r["doc_id"], r["score"]) for r in scanned if r["score"] > 0][:len(a)]
        print(f"n={n}: build={t_build:.2f}s  ix.search={t_ix:.2f}s  "
              f"scan bm25={t_scan:.2f}s  speedup={t_scan / t_ix:.1f}x  "
              f"files {touched}/{total_files}  rankings_agree={a == b}")

    spark.stop()


if __name__ == "__main__":
    main()
