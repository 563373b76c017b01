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

import math

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


def _probe_norm(probe: list[float]) -> float:
    """Euclidean norm of a LITERAL probe, computed once on the driver with
    the exact fold order of ``_norm(_probe_lit(probe))`` — ((0+x0²)+x1²)…
    then sqrt, every step a correctly-rounded IEEE double op in both
    runtimes — so substituting the constant for the per-row fold is
    bit-identical. Catalyst cannot constant-fold the HOF reduction
    (``aggregate``/``zip_with`` are non-foldable), so without this every
    scanned row re-reduces the dim-element literal array just to rebuild
    the same number."""
    acc = 0.0
    for x in probe:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


def cosine_sim_to_probe(vec: Column, probe: list[float]) -> Column:
    """``cosine_sim_expr`` against a literal probe vector: the probe's
    norm is a query constant and is evaluated driver-side (bit-identical —
    see ``_probe_norm``), dropping one of the three per-row dim-element
    array folds from the scan."""
    return _dot(vec, _probe_lit(probe)) / (_norm(vec) * F.lit(_probe_norm(probe)))


def cosine_topk(df: DataFrame, probe: list[float], k: int = 20,
                id_col: str = "vec_id", vec_col: str = "embedding",
                exclude_id: int | None = None,
                quant: float | None = None) -> DataFrame:
    """Brute-force exact top-k by cosine; deterministic tie-break on id.

    ``quant`` floor-quantizes the score BEFORE ranking (same rank-stable
    contract as ``search.bm25_topk``) — required when the shortlist feeds
    a rank-based combiner (``search.rrf_fuse``) that must agree with a
    re-implementation: quantize-after-limit would let sub-quantum score
    differences pick a different boundary row on each engine."""
    cos = cosine_sim_to_probe(F.col(vec_col), probe)
    if quant:
        cos = F.floor(cos * quant + F.lit(0.5)) / quant
    out = df.select(F.col(id_col), cos.alias("cosine"))
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
    # the probe's norm is a per-PROBE quantity: folding it inside the
    # per-row cosine re-reduces the broadcast array on every corpus row;
    # pre-projected into the 1-row broadcast side it rides along as one
    # double (same _norm fold order — bit-identical), per-row folds 3 -> 2
    probe = q.filter(F.col(id_col) == probe_id) \
        .select(F.col("q").alias("p"), _norm(F.col("q")).alias("__pn"))
    out = (
        q.filter(F.col(id_col) != probe_id)
        .join(F.broadcast(probe))
        .select(F.col(id_col),
                (_dot(F.col("q"), F.col("p"))
                 / (_norm(F.col("q")) * F.col("__pn"))).alias("cosine"))
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
    cent = centroids(df, part_col, vec_col)
    best = (
        cent.select(F.col(part_col),
                    cosine_sim_to_probe(F.col("centroid"), probe).alias("cs"))
        .orderBy(F.col("cs").desc(), F.col(part_col))
        .limit(nprobe)
        .select(part_col)
    )
    pruned = df.join(F.broadcast(best), part_col)
    return cosine_topk(pruned, probe, k, id_col, vec_col, exclude_id)


def kmeans_assign(df: DataFrame, k: int = 4, iters: int = 3,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  out_col: str = "cluster", round_dec: int = 6,
                  centroids_out: dict | None = None) -> DataFrame:
    """Deterministic Lloyd k-means: the real coarse quantizer for IVF
    (replacing the label-column stand-in).

    Engineered for cross-engine determinism (the DuckDB oracle runs the
    SAME unrolled iterations):
    - init centroids = the vectors with id 0..k-1 (no RNG);
    - fixed iteration count (no convergence test on floats);
    - centroid components AND squared-L2 distances are rounded to
      ``round_dec`` decimals, so float summation ORDER (Spark's fold vs
      DuckDB's group sum) cannot flip an assignment;
    - argmin ties break by centroid id (struct min on (dist, cid)).

    Scale shape: assignments and per-dimension means are distributed (one
    groupBy per iteration); only the k x dim centroid table — driver-sized
    by definition — is collected between iterations. An empty cluster
    simply drops out of the means (both engines agree).
    """
    def _fetch(frame, cid_col, pos_col, val_col):
        cents: dict[int, dict[int, float]] = {}
        for r in frame:
            cents.setdefault(int(r[cid_col]), {})[int(r[pos_col])] = float(r[val_col])
        return {cid: [d[p] for p in sorted(d)] for cid, d in cents.items()}

    init = (df.filter(F.col(id_col) < k)
            .select(F.col(id_col).alias("cid"),
                    F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .withColumn("x", F.round(F.col("x").cast("double"), round_dec))
            .collect())
    cents = _fetch(init, "cid", "pos", "x")

    def assign_col() -> Column:
        entries = []
        for cid in sorted(cents):
            c = F.array(*[F.lit(v) for v in cents[cid]])
            d = F.aggregate(
                F.zip_with(F.col(vec_col), c,
                           lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
                F.lit(0.0), lambda acc, v: acc + v)
            entries.append(F.struct(F.round(d, round_dec).alias("d"),
                                    F.lit(cid).alias("c")))
        return F.array_min(F.array(*entries))["c"]

    for _ in range(iters):
        asg = df.withColumn(out_col, assign_col())
        rows = (asg.select(F.col(out_col).alias("cid"),
                           F.posexplode(F.col(vec_col)).alias("pos", "x"))
                .groupBy("cid", "pos")
                .agg(F.round(F.avg(F.col("x").cast("double")), round_dec).alias("val"))
                .collect())
        cents = _fetch(rows, "cid", "pos", "val")

    if centroids_out is not None:
        # the codebook the CLOSING assignment is measured against —
        # what PQ's asymmetric-distance tables must be built from
        centroids_out.update(cents)
    return df.withColumn(out_col, assign_col())


def hyperplanes(nbits: int, dim: int, table: int = 0) -> list[list[float]]:
    """Deterministic ±1 random-hyperplane matrix (nbits x dim), derived
    from md5 so the DuckDB oracle regenerates the identical planes:
    w[p][i] = +1 iff md5('<p>,<i>') (1-based i) has an even 60-bit prefix.
    ``table`` > 0 selects an independent matrix (seed 't<t>:<p>,<i>') for
    multi-TABLE LSH; table 0 keeps the original seeds so existing buckets
    and oracles are unchanged. Sign-only planes preserve the SimHash
    cosine-LSH guarantee (P[bit differs] = angle/pi) without needing a
    shared float RNG."""
    import hashlib

    def sign(p: int, i: int) -> float:
        seed = f"{p},{i}" if table == 0 else f"t{table}:{p},{i}"
        h = int(hashlib.md5(seed.encode()).hexdigest()[:15], 16)
        return 1.0 if h % 2 == 0 else -1.0

    return [[sign(p, i) for i in range(1, dim + 1)] for p in range(nbits)]


def lsh_bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """Bucket id = the nbits-wide sign signature of the vector against the
    hyperplanes, packed into a long.

    Implemented as an Arrow-batched pandas UDF doing ONE numpy matmul per
    batch ((n x dim) @ (dim x nbits)) — this is the sanctioned slow-path
    exception: the JVM alternatives were measured strictly worse for
    8 planes x 64 dims (HOF aggregate/zip_with evaluates interpreted,
    ~2.4x slower; expanding the ±1 dots into literal add-chains overflows
    janino's method limit — even balanced — and falls back to
    interpretation, ~6x slower). Each dot is rounded to 6 decimals before
    the sign test, so summation-order ulps (numpy matmul vs the oracle's
    grouped sum, ~1e-15 on O(1) values) cannot flip a bit."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    mat = np.asarray(planes, dtype=np.float64)
    pw = np.array([1 << p for p in range(len(planes))], dtype=np.int64)

    # no type hints: this module uses PEP-563 stringified annotations,
    # which the pandas_udf hint inferencer cannot resolve for locally
    # imported pandas; hint-less defaults to the scalar eval type anyway
    @pandas_udf("long")
    def bucket(v):
        m = np.stack(v.values).astype(np.float64)
        d = np.round(m @ mat.T, 6)
        return pd.Series(((d >= 0) * pw).sum(axis=1))

    return bucket(vec)


def _probe_targets(probe: list[float], planes: list[list[float]],
                   nbits: int, hamming: int) -> set[int]:
    """The probe's bucket plus its multi-probe neighborhood (all buckets
    within `hamming` sign-flips), computed driver-side from the same md5
    planes — no extra Spark job."""
    dim = len(probe)
    pb = 0
    for p, w in enumerate(planes):
        if round(sum(probe[i] * w[i] for i in range(dim)), 6) >= 0:
            pb |= 1 << p
    targets = {pb}
    if hamming >= 1:
        targets |= {pb ^ (1 << i) for i in range(nbits)}
    if hamming >= 2:
        targets |= {pb ^ (1 << i) ^ (1 << j)
                    for i in range(nbits) for j in range(i + 1, nbits)}
    if hamming >= 3:
        raise NotImplementedError("multi-probe beyond hamming 2 not needed yet")
    return targets


def lsh_topk(df: DataFrame, probe: list[float], k: int = 10, nbits: int = 8,
             hamming: int = 1, id_col: str = "vec_id",
             vec_col: str = "embedding",
             exclude_id: int | None = None,
             n_tables: int = 1) -> DataFrame:
    """Cosine-LSH-bucketed ANN: candidates are the vectors whose sign
    signature is within `hamming` bits of the probe's (multi-probe LSH)
    in ANY of ``n_tables`` independent hash tables, rescored exactly and
    top-k'd. Multi-TABLE is the standard high-recall construction: a true
    neighbor at per-bit flip probability p is missed by one table with
    P(miss) = 1 - P(Binom(nbits, p) <= hamming), and by ALL tables with
    P(miss)^L — recall improves geometrically in L while the scanned
    fraction grows only linearly (measured in SCALE.md "ANN recall").

    Scale shape: each bucket is a pure per-row projection — at corpus
    scale the L bucket columns are computed once at ingest and the table
    is partitioned or z-ordered by table-0's, so the IN-lists become
    file-level pruning and the exact rescore touches
    ~L*(1+nbits+C(nbits,2))/2^nbits of the corpus."""
    dim = len(probe)
    cond = None
    out = df
    drop_cols = []
    for t in range(n_tables):
        planes = hyperplanes(nbits, dim, table=t)
        targets = _probe_targets(probe, planes, nbits, hamming)
        col = f"__bucket_{t}"
        out = out.withColumn(col, lsh_bucket_col(F.col(vec_col), planes))
        drop_cols.append(col)
        hit = F.col(col).isin(*sorted(targets))
        cond = hit if cond is None else (cond | hit)
    cand = out.filter(cond).drop(*drop_cols)
    return cosine_topk(cand, probe, k, id_col, vec_col, exclude_id)


def knn_classify(df: DataFrame, probes: DataFrame, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 label_col: str = "label") -> DataFrame:
    """k-NN majority-vote classification of each probe vector against the
    labeled corpus -> (probe_id, pred_label, votes).

    `probes` is a (probe_id, vec) frame — queries are bounded, so it
    BROADCASTS and scoring is one narrow pass over the corpus (cosine via
    the zip_with/aggregate kernel, no shuffle). The per-probe top-k is a
    single row_number window: Spark's WindowGroupLimit pushes the k-limit
    MAP-SIDE (each task keeps at most k rows per probe before the
    exchange — visible as Sort+WindowGroupLimit below the Exchange in the
    formatted plan), so the per-probe reducer receives tasks*k rows, not
    the corpus. An explicit two-phase bucket ranking was measured to add
    one exchange + two sorts for no additional pruning.
    Votes tie-break deterministically: count desc, then smallest label.
    """
    from pyspark.sql import Window

    # Norms are per-ROW quantities: computed inside the per-pair cosine
    # they are re-folded once per (corpus row x probe). Pre-projecting
    # them on each side before the join (same _norm expression, same fold
    # order — bit-identical) drops the per-pair HOF folds from 3 to 1;
    # measured 2.9x on the sibling pair kernel (knn_graph, sf0.1).
    pv = probes.select(F.col("probe_id"), F.col("vec").alias("__p"),
                       _norm(F.col("vec")).alias("__pn"))
    scored = (df.withColumn("__vn", _norm(F.col(vec_col)))
              .crossJoin(F.broadcast(pv))
              .select("probe_id", F.col(id_col), F.col(label_col),
                      (_dot(F.col(vec_col), F.col("__p"))
                       / (F.col("__vn") * F.col("__pn"))).alias("cosine")))
    w2 = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    top = (scored.withColumn("__r", F.row_number().over(w2))
           .filter(F.col("__r") <= k))
    votes = (top.groupBy("probe_id", label_col)
             .agg(F.count(F.lit(1)).alias("votes")))
    w3 = Window.partitionBy("probe_id").orderBy(F.col("votes").desc(), F.col(label_col))
    return (votes.withColumn("__r", F.row_number().over(w3))
            .filter(F.col("__r") == 1)
            .select("probe_id", F.col(label_col).alias("pred_label"), "votes"))


def knn_graph(df: DataFrame, k: int = 3, part_col: str = "label",
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """k-nearest-neighbor GRAPH within partitions: for every vector, its
    top-k cosine neighbors among vectors sharing ``part_col`` ->
    (id, nbr, cosine, rank). The batch companion of the single-probe
    top-k paths — kNN graphs feed semantic clustering, SemDeDup-style
    pruning, and graph-based label propagation.

    Scale shape: the pair space is PARTITION-LOCAL (the same bound as
    semdedup_prune / embed_neardup_pairs — O(sum of cluster sizes
    squared), never corpus squared; route through kmeans_assign first
    when no natural partition exists), and the per-source ranking is a
    window over those pairs. Cosines are floor-quantized to 1e-4 BEFORE
    ranking so rank order is engine-stable; ties break on neighbor id.
    """
    from pyspark.sql import Window

    # per-row norms pre-projected below the self-join: per-pair folds
    # 3 -> 1, bit-identical (same _norm fold), measured 2.9x at sf0.1
    a = df.select(F.col(part_col).alias("__p"), F.col(id_col).alias("id"),
                  F.col(vec_col).alias("__va"),
                  _norm(F.col(vec_col)).alias("__na"))
    b = df.select(F.col(part_col).alias("__p"), F.col(id_col).alias("nbr"),
                  F.col(vec_col).alias("__vb"),
                  _norm(F.col(vec_col)).alias("__nb"))
    pairs = (a.join(b, "__p")
             .filter(F.col("id") != F.col("nbr"))
             .withColumn("cosine",
                         F.floor((_dot(F.col("__va"), F.col("__vb"))
                                  / (F.col("__na") * F.col("__nb")))
                                 * 1e4 + F.lit(0.5)) / 1e4))
    w = Window.partitionBy("id").orderBy(F.col("cosine").desc(),
                                         F.col("nbr"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("id", "nbr", "cosine", F.col("rank").cast("long").alias("rank")))


def pq_encode(df: DataFrame, m_sub: int = 4, k_codes: int = 4,
              iters: int = 2, dim: int = 64, id_col: str = "vec_id",
              vec_col: str = "embedding"):
    """Product-quantization encode (Jégou et al., PAMI 2011): split each
    vector into ``m_sub`` contiguous subvectors and vector-quantize each
    subspace with the deterministic Lloyd k-means above. A vector
    compresses from ``dim`` floats to ``m_sub`` small ints — 64x here —
    which is what makes billion-vector ANN fit in memory at all.

    Returns ``(encoded_df, codebooks)`` where encoded_df carries
    ``code_0..code_{m_sub-1}`` and codebooks maps
    ``(sub, cid) -> centroid`` (driver-sized: m_sub * k_codes * dim/m_sub
    floats), ready for ``pq_topk``'s asymmetric distance tables.
    """
    sub_len = dim // m_sub
    codebooks: dict[tuple[int, int], list[float]] = {}
    out = df
    for s in range(m_sub):
        cents: dict[int, list[float]] = {}
        out = out.withColumn(
            "__sub", F.slice(F.col(vec_col), s * sub_len + 1, sub_len))
        out = kmeans_assign(out, k=k_codes, iters=iters, id_col=id_col,
                            vec_col="__sub", out_col=f"code_{s}",
                            centroids_out=cents)
        for cid, vals in cents.items():
            codebooks[(s, cid)] = vals
    return out.drop("__sub"), codebooks


def pq_topk(df: DataFrame, probe: list[float], k: int = 10,
            m_sub: int = 4, k_codes: int = 4, iters: int = 2,
            id_col: str = "vec_id", vec_col: str = "embedding",
            exclude_id: int | None = None, rerank: int = 0,
            encoded=None) -> DataFrame:
    """PQ/ADC top-k: encode the corpus (see ``pq_encode``), build the
    probe's asymmetric distance tables (squared L2 from each probe
    subvector to each subspace centroid — m_sub*k_codes doubles, computed
    driver-side and shipped as literal maps), then score every vector as
    the SUM OF TABLE LOOKUPS over its codes. The scan does no vector
    arithmetic at all — m_sub map lookups and adds per row against
    codes that are 64x smaller than the raw vectors; the ranking is a
    distributed TakeOrderedAndProject.

    Approximation contract: distances are table-quantized (6dp, like the
    k-means oracle) and ties break on id, so results are deterministic
    and cross-engine checkable; output is (id, adist) ascending. At
    serving scale the encode is a one-time index build (pair with
    VectorIndex's cluster layout for IVF+PQ).

    ``rerank > 0`` is the real serving path: the ADC scan only builds a
    shortlist of that many candidates, which are re-scored by EXACT
    squared L2 against the raw vectors (a semi-join back to the corpus —
    ``rerank`` rows of vector math instead of N). Tiny codebooks
    alias many vectors to identical codes, so pure ADC top-k saturates
    at the code resolution; the shortlist recovers it (measured in
    SCALE.md "ANN recall": recall@10 0.07 -> ~1.0 on the clustered
    corpus at rerank=100). Output then is (id, dist) — exact distance.
    """
    # ``encoded=(enc_df, codebooks)`` reuses a prior pq_encode — training
    # is an index build, not a per-query cost (callers memoize it)
    enc, books = (encoded if encoded is not None else
                  pq_encode(df, m_sub=m_sub, k_codes=k_codes, iters=iters,
                            dim=len(probe), id_col=id_col, vec_col=vec_col))
    sub_len = len(probe) // m_sub
    q6 = lambda x: __import__("math").floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    adist = F.lit(0.0)
    for s in range(m_sub):
        qs = probe[s * sub_len:(s + 1) * sub_len]
        keys, vals = [], []
        for (sub, cid), cvec in sorted(books.items()):
            if sub != s:
                continue
            d = sum((qv - cv) * (qv - cv) for qv, cv in zip(qs, cvec))
            keys.append(F.lit(cid))
            vals.append(F.lit(q6(d)))
        table = F.map_from_arrays(F.array(*keys), F.array(*vals))
        adist = adist + table[F.col(f"code_{s}")]
    scored = enc.select(F.col(id_col), F.col(vec_col), adist.alias("adist"))
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    if rerank:
        short = (scored.orderBy(F.col("adist").asc(), F.col(id_col))
                 .limit(rerank))
        p = _probe_lit(probe)
        exact = F.aggregate(
            F.zip_with(F.col(vec_col), p,
                       lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
            F.lit(0.0), lambda acc, v: acc + v)
        return (short.select(F.col(id_col), exact.alias("dist"))
                .orderBy(F.col("dist").asc(), F.col(id_col))
                .limit(k)
                .select(id_col,
                        (F.floor(F.col("dist") * 1e4 + F.lit(0.5)) / 1e4)
                        .alias("dist")))
    # floor-quantized output: 6dp table entries sum to exact .00005
    # midpoints where round() diverges across engines
    return (scored.orderBy(F.col("adist").asc(), F.col(id_col))
            .limit(k)
            .select(id_col,
                    (F.floor(F.col("adist") * 1e4 + F.lit(0.5)) / 1e4)
                    .alias("adist")))


def pca_rotation(df: DataFrame, dim: int, vec_col: str = "embedding",
                 sample: int = 2000, id_col: str = "vec_id",
                 m_sub: int | None = None) -> list:
    """Fit an orthonormal rotation for OPQ-lite product quantization
    (Ge et al. 2013, the non-parametric variant restricted to one global
    rotation): PCA eigenvectors of the sample covariance, then — when
    ``m_sub`` is given — Ge et al.'s EIGENVALUE ALLOCATION: principal
    directions are dealt to the m_sub subspaces greedily (each PC to the
    subspace with the smallest running log-variance product that still
    has slots), balancing information across subspaces. A plain variance-
    descending order would pile every strong direction into subspace 0
    and waste the other codebooks on noise — variance is conserved under
    rotation, so BALANCE, not concentration, is where PQ error drops.

    Driver-sized by construction: the fit reads a deterministic
    md5-ordered ``sample`` of vectors (dim x dim covariance via numpy —
    64x64 here); the corpus never leaves the executors. Returns R as a
    row-major list of lists (R[i] = i-th output direction, subspace s
    owning rows [s*dim/m_sub, (s+1)*dim/m_sub)), ready for
    ``apply_rotation`` and probe-side ``rotate_probe``.
    """
    import math

    import numpy as np

    rank = F.md5(F.concat(F.lit("pca-v1|"), F.col(id_col).cast("string")))
    rows = (df.select(F.col(vec_col).alias("v"), rank.alias("__r"))
            .orderBy("__r").limit(sample).collect())
    x = np.array([[float(c) for c in r["v"]] for r in rows], dtype=np.float64)
    x = x - x.mean(axis=0, keepdims=True)
    cov = (x.T @ x) / max(len(x) - 1, 1)
    vals, vecs = np.linalg.eigh(cov)            # ascending eigenvalues
    order = list(np.argsort(vals)[::-1])        # descending PCs
    if m_sub:
        sub_len = dim // m_sub
        slots = [[] for _ in range(m_sub)]
        logsum = [0.0] * m_sub
        for idx in order:                        # biggest eigenvalue first
            open_subs = [s for s in range(m_sub) if len(slots[s]) < sub_len]
            tgt = min(open_subs, key=lambda s: (logsum[s], s))
            slots[tgt].append(idx)
            logsum[tgt] += math.log(max(float(vals[idx]), 1e-12))
        order = [idx for sub in slots for idx in sub]
    r_mat = vecs[:, order].T
    return [[float(v) for v in row] for row in r_mat]


def apply_rotation(df: DataFrame, rotation: list, vec_col: str = "embedding",
                   out_col: str = "rotated") -> DataFrame:
    """Apply the fitted rotation to every vector: one vectorized numpy
    matmul per Arrow batch (mapInPandas — a dim x dim matmul per row is
    exactly the shape where a Python loop or a dim²-term codegen
    expression loses to BLAS). Adds ``out_col`` as array<double>;
    payload columns pass through untouched."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    r_np = None
    out_fields = [f for f in df.schema.fields]
    out_schema = StructType(out_fields + [StructField(out_col,
                                                      ArrayType(DoubleType()))])
    cols = df.columns

    def run(batches):
        nonlocal r_np
        if r_np is None:
            r_np = np.array(rotation, dtype=np.float64)
        for pdf in batches:
            vecs = np.array([[float(c) for c in v] for v in pdf[vec_col]],
                            dtype=np.float64)
            rot = vecs @ r_np.T if len(vecs) else np.zeros((0, r_np.shape[0]))
            out = pdf[cols].copy()
            out[out_col] = [row.tolist() for row in rot]
            yield out

    return df.mapInPandas(run, out_schema)


def rotate_probe(probe: list, rotation: list) -> list:
    """Rotate a probe vector driver-side (R @ p) to match a corpus
    transformed by ``apply_rotation``. Rotation is orthonormal, so
    L2/cosine structure is preserved exactly — searching rotated space
    with a rotated probe returns the same neighbors as raw space."""
    return [sum(r_i * p_i for r_i, p_i in zip(row, probe))
            for row in rotation]


def hard_negatives(df: DataFrame, k: int = 1, nlist: int = 4,
                   iters: int = 3, nprobe: int = 2,
                   label_col: str = "label", id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Hard-negative mining for contrastive embedding training: for each
    anchor, its ``k`` most-cosine-similar vectors with a DIFFERENT label
    — the pairs a metric-learning loss learns the most from.

    The hardest negatives sit ACROSS class boundaries, so single-cluster
    routing (knn_graph's partition-local pairs) would miss them when
    clusters align with labels. Instead every vector soft-assigns to its
    ``nprobe`` nearest k-means centroids (the IVF multi-probe idea
    applied to pair generation): boundary vectors co-bucket with the
    neighboring cluster's members, cross-label candidates appear in the
    shared bucket, and the pair space stays bucket-local — O(sum of
    bucket sizes squared), never corpus squared. Duplicate candidates
    from shared buckets collapse with one distinct.

    Determinism mirrors the kNN/k-means family: centroid distances
    rounded 6dp (soft-assignment ties by centroid id via struct sort),
    cosines floor-quantized 1e-4 before ranking, ties by neighbor id.

    Output: (id, label, nbr, nbr_label, cosine, rank 1..k).
    """
    from pyspark.sql import Window

    cents: dict[int, list[float]] = {}
    kmeans_assign(df, k=nlist, iters=iters, id_col=id_col,
                  vec_col=vec_col, centroids_out=cents)
    entries = []
    for cid in sorted(cents):
        c = F.array(*[F.lit(v) for v in cents[cid]])
        d = F.round(F.aggregate(
            F.zip_with(F.col(vec_col), c,
                       lambda x, y: (x.cast("double") - y)
                       * (x.cast("double") - y)),
            F.lit(0.0), lambda acc, v: acc + v), 6)
        entries.append(F.struct(d.alias("d"), F.lit(cid).alias("c")))
    probe_buckets = F.transform(
        F.slice(F.array_sort(F.array(*entries)), 1, nprobe),
        lambda s: s["c"])
    # norm pre-projected BELOW the explode: folded once per vector, not
    # per (vector x probed bucket) nor per pair (3 -> 1 folds per pair,
    # bit-identical — same _norm fold order)
    soft = df.select(F.col(id_col), F.col(label_col), F.col(vec_col),
                     _norm(F.col(vec_col)).alias("__n"),
                     F.explode(probe_buckets).alias("__b"))
    a = soft.select("__b", F.col(id_col).alias("id"),
                    F.col(label_col).alias("label"),
                    F.col(vec_col).alias("__va"), F.col("__n").alias("__na"))
    b = soft.select("__b", F.col(id_col).alias("nbr"),
                    F.col(label_col).alias("nbr_label"),
                    F.col(vec_col).alias("__vb"), F.col("__n").alias("__nb"))
    pairs = (a.join(b, "__b")
             .filter((F.col("id") != F.col("nbr"))
                     & (F.col("label") != F.col("nbr_label")))
             .select("id", "label", "nbr", "nbr_label",
                     (F.floor((_dot(F.col("__va"), F.col("__vb"))
                               / (F.col("__na") * F.col("__nb")))
                              * 1e4 + F.lit(0.5)) / 1e4).alias("cosine"))
             .distinct())
    w = Window.partitionBy("id").orderBy(F.col("cosine").desc(),
                                         F.col("nbr"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("id", "label", "nbr", "nbr_label", "cosine",
                    F.col("rank").cast("long").alias("rank")))
