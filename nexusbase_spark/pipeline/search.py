"""Full-text relevance search: BM25 scoring and top-k retrieval.

The retrieval primitive a training-data pipeline needs next to dedup and
decontamination: "find the corpus documents most relevant to this probe
query" (eval-set leakage triage, targeted corpus audits, boosted sampling).

Spark-first shape — for a FIXED small set of query terms the whole scoring
pass is narrow column arithmetic:

- per-doc term frequencies come from ``F.filter`` over the token array
  (one pass per query term, JVM-side, no explode and therefore no shuffle
  proportional to token count);
- the corpus statistics BM25 needs (N, avgdl, per-term document
  frequencies) collapse into ONE global aggregate row — a single partial
  (map-side-combined) agg over the scan — broadcast back with a cross
  join;
- ranking is ``orderBy().limit(k)`` which Spark executes as
  TakeOrderedAndProject: per-partition top-k heaps merged on the driver,
  never a global sort.

At 100 TB that is: one scan with map-side stat combine, one 1-row
broadcast, one scan re-use for scoring, one distributed top-k. Nothing
quadratic, nothing driver-sided beyond k rows and one stats row.
(An inverted-index materialization only starts to win when queries are
many and ad-hoc; for pipeline-style batch probes the scan dominates
either way.)

Scores are floor-quantized to 1e-4 before ranking so the rank order is
reproducible across engines (see tests/test_oracle_parity notes on float
last-ulp drift); ties break on doc_id.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexusbase_spark.pipeline.text import tokens_col


def _tf(toks, term: str):
    """Occurrences of ``term`` in the token array — a single filtered pass,
    no explode."""
    return F.size(F.filter(toks, lambda x: x == F.lit(term)))


def bm25_scores(df: DataFrame, query_terms: list[str], *,
                k1: float = 1.2, b: float = 0.75,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document BM25 relevance for ``query_terms``.

    Robertson idf = ln((N - df + 0.5)/(df + 0.5) + 1) (non-negative form);
    per-term contribution = idf * tf*(k1+1) / (tf + k1*(1-b + b*dl/avgdl)).
    The score sums term contributions in the given, fixed order so float
    addition associates identically on any engine re-implementing it.

    Output: (id_col, dl, tf_<i> per term, score) — score NOT yet
    quantized; ``bm25_topk`` handles rank-stable quantization.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = tokens_col(F.col(text_col))
    scored = df.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        *[_tf(toks, t).alias(f"tf_{i}") for i, t in enumerate(query_terms)],
    )
    # ONE corpus-stats row: N, avgdl, df per term (map-side combinable).
    stats = scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
          for i in range(len(query_terms))],
    )
    j = scored.crossJoin(F.broadcast(stats))

    def contrib(i: int):
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5) + 1.0)
        denom = tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        return idf * tf * (k1 + 1.0) / denom

    score = reduce(lambda acc, i: acc + contrib(i),
                   range(1, len(query_terms)), contrib(0))
    return j.select(
        id_col, "dl",
        *[f"tf_{i}" for i in range(len(query_terms))],
        score.alias("score"))


def bm25_topk(df: DataFrame, query_terms: list[str], k: int = 10, *,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-k docs by BM25, rank-stable: score floor-quantized to 1e-4,
    ties broken by id. Docs matching no term score 0 and only appear when
    fewer than k docs match. Compiles to TakeOrderedAndProject."""
    scored = bm25_scores(df, query_terms, k1=k1, b=b,
                         text_col=text_col, id_col=id_col)
    q = (F.floor(F.col("score") * 1e4 + F.lit(0.5)) / 1e4).alias("score")
    return (scored.select(id_col, q)
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k))
