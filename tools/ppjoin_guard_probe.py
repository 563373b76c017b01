"""Scale probe: the PPJoin hot-prefix-bucket guard on a template-heavy
corpus at a size where the LOSSLESS join is quadratic-infeasible.

Round-5 measured the floor: an exact set-similarity join must emit every
qualifying pair at ~29us/pair, so a corpus where T documents share one
boilerplate template owes T*(T-1)/2 pairs no matter how clever the
candidate generation is (T=20k -> ~2e8 pairs -> ~97 min of emission
alone). This probe builds exactly that corpus, then shows
`prefix_filter_pairs(max_bucket=...)` completing in seconds: the two hot
template prefix buckets are dropped (with the RuntimeWarning naming
them) while the 2,500 genuine off-template near-dup pairs still verify
losslessly — the guard converts a stalling job into a bounded one
without touching pairs that ride on sub-cap buckets.

Corpus:
- T "template" docs: 10 shared boilerplate tokens + 1 unique
  (pairwise jaccard 10/12 = 0.833 >= 0.8 -> ALL T*(T-1)/2 pairs qualify;
  prefix = unique token + tmpl0 + tmpl1, so the hot buckets are tmpl0/1
  at T postings each).
- N "natural" docs in near-dup pairs: 12 tokens shared by ids 2k/2k+1
  + 1 unique (jaccard 12/14 = 0.857; prefix buckets of size 2 -> survive
  any sane cap -> exactly N/2 pairs emitted).

Usage: python3 tools/ppjoin_guard_probe.py [n_template] [n_natural]
Writes one JSON line with sizes, capped wall, pairs, and the lossless
floor the guard avoided.
"""
from __future__ import annotations

import json
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    n_template = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_natural = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("ppjoin-guard-probe")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "16g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from nexusbase_spark.pipeline.dedup import prefix_filter_pairs

    template = " ".join(f"tmpl{i}" for i in range(10))
    tdocs = (spark.range(n_template)
             .select(F.col("id").alias("doc_id"),
                     F.concat(F.lit(template + " uniq"),
                              F.col("id").cast("string")).alias("text")))
    grp = (F.col("id") / 2).cast("long").cast("string")
    ndocs = (spark.range(n_natural)
             .select((F.col("id") + n_template).alias("doc_id"),
                     F.concat(
                         F.concat_ws(" ", *[
                             F.concat(F.lit(f"nat{j}g"), grp)
                             for j in range(12)]),
                         F.lit(" natu"), F.col("id").cast("string"))
                     .alias("text")))
    docs = tdocs.unionByName(ndocs).localCheckpoint(eager=True)
    n_docs = docs.count()

    lossless_floor_pairs = n_template * (n_template - 1) // 2
    floor_minutes = lossless_floor_pairs * 29e-6 / 60  # r5: ~29us/pair

    t0 = time.time()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always", RuntimeWarning)
        capped = prefix_filter_pairs(docs, threshold=0.8, max_bucket=1000)
        n_pairs = capped.count()
    wall = time.time() - t0
    warn_text = "; ".join(str(w.message)[:200] for w in caught)

    # the surviving pairs must be exactly the n_natural/2 genuine
    # near-dup pairs (the template pairs ride only on hot tmpl* buckets)
    natural_pairs = capped.filter(F.col("id_a") >= n_template).count()

    print(json.dumps({
        "n_docs": n_docs,
        "n_template_docs": n_template,
        "lossless_floor_pairs": lossless_floor_pairs,
        "lossless_floor_minutes_at_29us": round(floor_minutes, 1),
        "capped_wall_s": round(wall, 2),
        "capped_pairs": n_pairs,
        "capped_natural_pairs": natural_pairs,
        "expected_natural_pairs": n_natural // 2,
        "warning": warn_text[:400],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
