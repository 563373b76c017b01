"""Partition-shape helpers for compute-heavy stages.

Small single-file sources arrive as ONE scan partition (a 0.5MB parquet is
one split), which serializes any per-row-expensive stage (md5 fan-out,
Arrow/Python extraction) onto one core. A 100TB source arrives with
thousands of splits, so these helpers are no-ops at scale by construction —
they only widen narrow inputs, never reshuffle wide ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, compute_heavy: bool = False,
           bytes_per_partition: int = 8 << 20) -> DataFrame:
    """Repartition a too-narrow frame up to cluster parallelism.

    ``compute_heavy=True``: per-row work dominates (hashing, Python UDF) —
    spread to full parallelism regardless of byte size, since even a tiny
    frame serializes an expensive stage onto one core.

    ``compute_heavy=False``: work is proportional to bytes — only spread
    when the optimizer's size estimate says partitions would exceed
    ``bytes_per_partition`` (extra partitions otherwise just cost task /
    Python-worker startup).
    """
    spark = df.sparkSession
    max_parts = max(spark.sparkContext.defaultParallelism, 1)
    if compute_heavy:
        target = max_parts
    else:
        try:
            size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
            target = max(1, min(max_parts, size // bytes_per_partition))
        except Exception:
            target = max_parts
    if target > 1 and df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
