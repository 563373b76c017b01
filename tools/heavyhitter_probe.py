"""Probe: two-phase MG heavy hitters vs plain groupBy on n-gram corpora.

Measures the thing the operator exists for — the size of the frequency
shuffle — and the thing it trades away — detection when NO term clears
the n/capacity floor. Run on sf0.1 documents:

  python3 tools/heavyhitter_probe.py [sf_dir]

Reports, for word 1/2/4-grams: vocabulary size, exact-groupBy wall,
two-phase wall, candidate count (the two-phase shuffle's key bound), and
top-20 overlap between the two answers.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from nexusbase_spark.datamodel import load_table
from nexusbase_spark.pipeline.heavyhitters import heavy_hitters_topk, mg_candidates
from nexusbase_spark.pipeline.text import shingles_of_tokens, tokens_col

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = (SparkSession.builder.master("local[8]").appName("hh-probe")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

docs = load_table(spark, SF, "documents").select("text")
CAP = 512

for n in (1, 2, 4):
    toks = tokens_col(F.col("text"))
    if n > 1:
        toks = shingles_of_tokens(toks, n)
    arrays = docs.select(toks.alias("toks")).persist()
    arrays.count()

    exploded = arrays.select(F.explode("toks").alias("token"))
    t0 = time.time()
    exact = (exploded.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
             .orderBy(F.col("cnt").desc(), F.col("token")).limit(20).collect())
    t_exact = time.time() - t0
    vocab = exploded.distinct().count()
    total = exploded.count()

    t0 = time.time()
    two = heavy_hitters_topk(docs, k=20, capacity=CAP, ngram=n).collect()
    t_two = time.time() - t0
    ncand = mg_candidates(arrays, CAP).count()

    overlap = len({r["token"] for r in exact} & {r["token"] for r in two})
    floor = total // CAP
    top20_min = exact[-1]["cnt"] if exact else 0
    print(f"{n}-grams: vocab={vocab} total={total} | exact={t_exact:.2f}s "
          f"(shuffles {vocab} keys) | two-phase={t_two:.2f}s "
          f"(candidates {ncand} ≤ {CAP}x8) | overlap@20={overlap}/20 "
          f"| floor n/cap={floor} vs top20_min={top20_min}")
    arrays.unpersist()

spark.stop()
