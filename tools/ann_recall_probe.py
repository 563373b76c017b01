#!/usr/bin/env python3
"""Recall@k probe for the approximate ANN paths (VERDICT r2 next-round #5).

The oracle gate proves the approximate paths are DETERMINISTIC; this probe
measures their RETRIEVAL QUALITY: recall@10 / recall@100 against the exact
brute-force cosine ranking, per configuration, over real probe vectors
drawn from the corpus.

Paths probed (all from nexusbase_spark.pipeline.similarity / vecindex):
- ivf_topk over the table's label partitions, nprobe in {1, 2, 4}
- k-means IVF (VectorIndex, nlist=8), nprobe in {1, 2, 4, 8}
- lsh_topk, nbits=8, hamming in {0, 1}
- int8_topk (quantization error only — full scan, so recall ~ 1.0)

Usage: python3 tools/ann_recall_probe.py [sf_dir|--clustered] [n_probes]
Prints one human table + one final JSON line; paste the table into
SCALE.md. Flags any config with recall@10 < 0.9.

``--clustered`` replaces the corpus with a generated 2000x64 clustered
corpus (16 tight clusters, deterministic seed): the driver's testdata
embeddings are ISOTROPIC RANDOM (within-label mean cosine 0.001 vs
cross-label -0.001, measured), on which any partition-pruning ANN's
recall mathematically equals its scan fraction — the clustered mode
measures what the operators deliver when neighborhood structure exists,
which is the workload ANN is for.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def recall(approx_ids: list, exact_ids: list) -> float:
    if not exact_ids:
        return 1.0
    return len(set(approx_ids) & set(exact_ids)) / len(exact_ids)


def clustered_corpus(spark, n: int = 2000, dim: int = 64, k: int = 16,
                     sigma: float = 0.15):
    """Deterministic clustered corpus: k unit-ish centroids (seeded RNG),
    each vector = its cluster centroid + N(0, sigma) noise. label = the
    true cluster, so ivf_label measures best-case coarse quantization."""
    import numpy as np

    rng = np.random.default_rng(42)
    cents = rng.normal(size=(k, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = rng.integers(0, k, size=n)
    vecs = cents[labels] + rng.normal(scale=sigma, size=(n, dim))
    rows = [(int(i), [float(x) for x in vecs[i]], int(labels[i]))
            for i in range(n)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_probes = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    clustered = sf_dir.startswith("--clustered")
    sigma = (float(sf_dir.split("=", 1)[1]) if clustered and "=" in sf_dir
             else 0.15)

    from pyspark.sql import functions as F

    from nexusbase_spark.datamodel import load_table
    from nexusbase_spark.pipeline.similarity import (
        cosine_topk, int8_topk, ivf_topk, lsh_topk, pq_encode)
    from nexusbase_spark.pipeline.vecindex import VectorIndex
    from nexusbase_spark.session import get_spark

    spark = get_spark("ann-recall-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    if clustered:
        emb = clustered_corpus(spark, sigma=sigma).cache()
        sf_dir = f"clustered-synthetic sigma={sigma}"
    else:
        emb = load_table(spark, sf_dir, "embeddings").cache()
    n = emb.count()

    # deterministic probe set: every (n // n_probes)-th vector by id
    step = max(1, n // n_probes)
    probes = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
              for r in emb.filter(F.col("vec_id") % step == 0)
              .orderBy("vec_id").limit(n_probes).collect()]

    idx_dir = tempfile.mkdtemp(prefix="ann_recall_idx_")
    index = VectorIndex.build(spark, idx_dir, emb, nlist=8, iters=3)

    # PQ: train each codebook config ONCE (the index-build step), reuse
    # the encoded frame across probes; recall is measured against exact
    # L2 — PQ's design metric (cosine-recall would conflate norm spread
    # with quantization error)
    def l2_topk(frame, vec, k, exclude_id):
        p = F.array(*[F.lit(float(x)) for x in vec])
        d = F.aggregate(
            F.zip_with(F.col("embedding"), p,
                       lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
            F.lit(0.0), lambda acc, v: acc + v)
        return (frame.select("vec_id", d.alias("d"))
                .filter(F.col("vec_id") != exclude_id)
                .orderBy("d", "vec_id").limit(k))

    pq_trained = {}
    for m_sub, k_codes in ((4, 4), (4, 16), (8, 16)):
        enc, books = pq_encode(emb, m_sub=m_sub, k_codes=k_codes, iters=2)
        pq_trained[(m_sub, k_codes)] = (enc.cache(), books)

    def pq_search(m_sub, k_codes, vec, k, exclude_id):
        import math
        enc, books = pq_trained[(m_sub, k_codes)]
        sub_len = len(vec) // m_sub
        adist = F.lit(0.0)
        for s in range(m_sub):
            qs = vec[s * sub_len:(s + 1) * sub_len]
            keys, vals = [], []
            for (sub, cid), cvec in sorted(books.items()):
                if sub != s:
                    continue
                d = sum((qv - cv) * (qv - cv) for qv, cv in zip(qs, cvec))
                keys.append(F.lit(cid))
                vals.append(F.lit(math.floor(d * 1e6 + 0.5) / 1e6))
            adist = adist + F.map_from_arrays(
                F.array(*keys), F.array(*vals))[F.col(f"code_{s}")]
        return (enc.select("vec_id", adist.alias("adist"))
                .filter(F.col("vec_id") != exclude_id)
                .orderBy("adist", "vec_id").limit(k))

    configs: dict[str, dict] = {}

    def acc(name: str, r10: float, r100: float) -> None:
        c = configs.setdefault(name, {"r10": 0.0, "r100": 0.0, "n": 0})
        c["r10"] += r10
        c["r100"] += r100
        c["n"] += 1

    for pid, vec in probes:
        exact10 = [r["vec_id"] for r in
                   cosine_topk(emb, vec, 10, exclude_id=pid).collect()]
        exact100 = [r["vec_id"] for r in
                    cosine_topk(emb, vec, 100, exclude_id=pid).collect()]

        for nprobe in (1, 2, 4):
            got100 = [r["vec_id"] for r in
                      ivf_topk(emb, vec, 100, nprobe=nprobe,
                               exclude_id=pid).collect()]
            acc(f"ivf_label nprobe={nprobe}",
                recall(got100[:10], exact10), recall(got100, exact100))

        for nprobe in (1, 2, 4, 8):
            got100 = [r["vec_id"] for r in
                      index.search(vec, 100, nprobe=nprobe,
                                   exclude_id=pid).collect()]
            acc(f"kmeans_ivf nlist=8 nprobe={nprobe}",
                recall(got100[:10], exact10), recall(got100, exact100))

        for hamming in (0, 1, 2):
            got100 = [r["vec_id"] for r in
                      lsh_topk(emb, vec, 100, nbits=8, hamming=hamming,
                               exclude_id=pid).collect()]
            acc(f"lsh nbits=8 hamming={hamming}",
                recall(got100[:10], exact10), recall(got100, exact100))

        # multi-table sweep across band widths (round-3 backlog #5):
        # wider signatures (nbits up) shrink the scanned fraction per
        # table ~2x per bit, and more tables L buy the recall back —
        # the (nbits, hamming, L) surface IS the cost/recall dial
        for nbits, hamming, n_tables in (
                (8, 1, 2), (8, 1, 4), (8, 1, 8),
                (12, 1, 4), (12, 1, 8), (12, 2, 8),
                (16, 1, 8), (16, 2, 8)):
            got100 = [r["vec_id"] for r in
                      lsh_topk(emb, vec, 100, nbits=nbits, hamming=hamming,
                               n_tables=n_tables, exclude_id=pid).collect()]
            acc(f"lsh nbits={nbits} hamming={hamming} L={n_tables}",
                recall(got100[:10], exact10), recall(got100, exact100))

        got100 = [r["vec_id"] for r in
                  int8_topk(emb, 100, probe_id=pid).collect()]
        acc("int8 full-scan",
            recall(got100[:10], exact10), recall(got100, exact100))

        l2_10 = [r["vec_id"] for r in l2_topk(emb, vec, 10, pid).collect()]
        l2_100 = [r["vec_id"] for r in l2_topk(emb, vec, 100, pid).collect()]
        for (m_sub, k_codes) in pq_trained:
            got100 = [r["vec_id"] for r in
                      pq_search(m_sub, k_codes, vec, 100, pid).collect()]
            acc(f"pq m={m_sub} k={k_codes} (vs exact L2)",
                recall(got100[:10], l2_10), recall(got100, l2_100))
            # serving path: ADC shortlist of 200 -> exact re-rank
            short = [r["vec_id"] for r in
                     pq_search(m_sub, k_codes, vec, 200, pid).collect()]
            rr10 = [i for i in l2_100 if i in set(short)][:10]
            acc(f"pq m={m_sub} k={k_codes} rerank=200 (vs exact L2)",
                recall(rr10, l2_10), recall(short, l2_100))

    rows = []
    for name, c in configs.items():
        r10 = round(c["r10"] / c["n"], 3)
        r100 = round(c["r100"] / c["n"], 3)
        flag = "  << recall@10 < 0.9" if r10 < 0.9 else ""
        rows.append((name, r10, r100))
        print(f"{name:32s} recall@10={r10:.3f}  recall@100={r100:.3f}{flag}")

    print(json.dumps({"sf_dir": sf_dir, "n_vectors": n,
                      "n_probes": len(probes),
                      "recall": {name: {"r10": r10, "r100": r100}
                                 for name, r10, r100 in rows}}))
    spark.stop()


if __name__ == "__main__":
    main()
