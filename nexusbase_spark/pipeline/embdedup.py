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

from nexusbase_spark.pipeline.similarity import cosine_sim_expr


def cosine_near_dup_pairs(df: DataFrame, threshold: float = 0.99,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          part_col: str = "label") -> DataFrame:
    """(id_a, id_b, cosine) for same-bucket pairs with cosine >= threshold,
    id_a < id_b. Exact within buckets; cross-bucket near-dups are missed by
    design (recall/cost trade, like LSH banding)."""
    a = df.select(F.col(part_col).alias("__p"), F.col(id_col).alias("id_a"),
                  F.col(vec_col).alias("__va"))
    b = df.select(F.col(part_col).alias("__p"), F.col(id_col).alias("id_b"),
                  F.col(vec_col).alias("__vb"))
    pairs = a.join(b, ["__p"]).filter(F.col("id_a") < F.col("id_b"))
    out = pairs.select(
        "id_a", "id_b",
        cosine_sim_expr(F.col("__va"), F.col("__vb")).alias("cosine"))
    return out.filter(F.col("cosine") >= threshold)
