"""Embedding-cosine near-duplicate detection.

The last member of the dedup family: pairs of vectors with cosine above a
threshold, found WITHOUT the O(n²) all-pairs join by bucketing on a coarse
partition (here the ``label`` column — the k-means assignment stand-in, as
in similarity.py) and joining only within buckets. True near-duplicates
land in the same coarse cell with high probability, exactly the IVF
assumption; at 100TB the table is clustered by that cell so the self-join
is partition-local (no fact-table shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexusbase_spark.pipeline.similarity import _dot, _norm


def cosine_near_dup_pairs(df: DataFrame, threshold: float = 0.99,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          part_col: str = "label") -> DataFrame:
    """(id_a, id_b, cosine) for same-bucket pairs with cosine >= threshold,
    id_a < id_b. Exact within buckets; cross-bucket near-dups are missed by
    design (recall/cost trade, like LSH banding)."""
    # per-row norms pre-projected below the self-join: the per-pair
    # cosine then folds only the dot (3 -> 1 dim-element folds per pair,
    # bit-identical — same _norm fold order; measured 2.9x on the sibling
    # knn_graph pair kernel at sf0.1)
    a = df.select(F.col(part_col).alias("__p"), F.col(id_col).alias("id_a"),
                  F.col(vec_col).alias("__va"),
                  _norm(F.col(vec_col)).alias("__na"))
    b = df.select(F.col(part_col).alias("__p"), F.col(id_col).alias("id_b"),
                  F.col(vec_col).alias("__vb"),
                  _norm(F.col(vec_col)).alias("__nb"))
    pairs = a.join(b, ["__p"]).filter(F.col("id_a") < F.col("id_b"))
    out = pairs.select(
        "id_a", "id_b",
        (_dot(F.col("__va"), F.col("__vb"))
         / (F.col("__na") * F.col("__nb"))).alias("cosine"))
    return out.filter(F.col("cosine") >= threshold)


def semdedup_prune(df: DataFrame, threshold: float = 0.99,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   part_col: str = "label") -> DataFrame:
    """SemDeDup-style semantic pruning (Abbas et al. 2023, arXiv:2303.09540
    — public method): drop every vector that has a same-cluster near
    duplicate with a SMALLER id, keep the rest. Deterministic min-id
    representative selection instead of the paper's greedy order, so the
    result is reproducible and oracle-checkable.

    Input ``part_col`` is the cluster assignment — ``label`` here, or
    ``kmeans_assign``'s cluster id upstream; the pair search stays
    cluster-local (never all-pairs), which is the whole point at 100 TB:
    the quadratic term is bounded by the largest cluster, and the
    dup-id anti join is left to AQE (the dup set's size is data-dependent,
    so no forced broadcast).

    Returns the surviving rows of ``df`` unchanged.
    """
    pairs = cosine_near_dup_pairs(df, threshold, id_col=id_col,
                                  vec_col=vec_col, part_col=part_col)
    dup_ids = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dup_ids, id_col, "left_anti")
