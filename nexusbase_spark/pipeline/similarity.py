"""Similarity search over an embedding column (array<float>).

Two paths, mirroring what a 100TB vector corpus needs:

- ``cosine_topk``: brute-force exact scan — the correctness baseline. The
  dot product is a JVM-side ``aggregate(zip_with(...))`` in DOUBLE (no
  Python in the loop); orderBy+limit compiles to TakeOrderedAndProject
  (per-partition top-k, tiny shuffle of k rows per partition).
- ``ivf_topk``: IVF-style pruned search — rank coarse partitions by
  centroid similarity, scan only the best ``nprobe`` partitions. Here the
  ``label`` column is the coarse assignment (stand-in for a k-means
  assignment step); at scale the table is bucketed/partitioned by that
  label so pruning becomes partition pruning at the file level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_sim_expr(a: Column, b: Column) -> Column:
    """Exact cosine similarity in double precision."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _probe_lit(probe: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in probe])


def cosine_topk(df: DataFrame, probe: list[float], k: int = 20,
                id_col: str = "vec_id", vec_col: str = "embedding",
                exclude_id: int | None = None) -> DataFrame:
    """Brute-force exact top-k by cosine; deterministic tie-break on id."""
    p = _probe_lit(probe)
    out = df.select(
        F.col(id_col),
        cosine_sim_expr(F.col(vec_col), p).alias("cosine"),
    )
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return out.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def quantize_int8(df: DataFrame, vec_col: str = "embedding",
                  out_col: str = "q") -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q_i = round(x_i * 127 / max|x|) ∈ [-127, 127]. Cuts ANN memory 4x
    (the scale path for billion-vector corpora); cosine on the quantized
    vectors needs no dequantize — the per-vector scale cancels.

    The scale is materialized as a column BEFORE the transform: an
    array_max inside the lambda would be re-evaluated per element
    (no CSE inside higher-order functions).
    """
    s = F.greatest(
        F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))),
        F.lit(1e-30))
    return (
        df.withColumn("__s", s)
        .withColumn(out_col, F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * 127 / F.col("__s"))))
        .drop("__s")
    )


def int8_topk(df: DataFrame, k: int = 10, probe_id: int = 0,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k by cosine over int8-quantized vectors. Integer
    dot products are exact in double, so ranking is fully deterministic
    (unlike float accumulation order). The probe is quantized by the same
    expression, never round-tripped through the driver."""
    q = quantize_int8(df, vec_col).select(id_col, "q")
    probe = q.filter(F.col(id_col) == probe_id) \
        .select(F.col("q").alias("p"))
    out = (
        q.filter(F.col(id_col) != probe_id)
        .join(F.broadcast(probe))
        .select(F.col(id_col), cosine_sim_expr(F.col("q"), F.col("p")).alias("cosine"))
    )
    return out.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def centroids(df: DataFrame, part_col: str = "label",
              vec_col: str = "embedding") -> DataFrame:
    """Per-partition mean vector via posexplode + groupBy(part, pos) —
    partial-aggregatable, no vectors collected to the driver."""
    dim = df.select(F.posexplode(F.col(vec_col)).alias("pos", "v"), F.col(part_col))
    per_dim = dim.groupBy(part_col, "pos").agg(F.avg(F.col("v").cast("double")).alias("m"))
    return (
        per_dim.groupBy(part_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("e"))
        .select(F.col(part_col), F.transform("e", lambda s: s["m"]).alias("centroid"))
    )


def ivf_topk(df: DataFrame, probe: list[float], k: int = 10, nprobe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             part_col: str = "label", exclude_id: int | None = None) -> DataFrame:
    """IVF-pruned top-k: pick the nprobe partitions whose centroid is most
    cosine-similar to the probe (ties by label), then exact search inside."""
    p = _probe_lit(probe)
    cent = centroids(df, part_col, vec_col)
    best = (
        cent.select(F.col(part_col), cosine_sim_expr(F.col("centroid"), p).alias("cs"))
        .orderBy(F.col("cs").desc(), F.col(part_col))
        .limit(nprobe)
        .select(part_col)
    )
    pruned = df.join(F.broadcast(best), part_col)
    return cosine_topk(pruned, probe, k, id_col, vec_col, exclude_id)
