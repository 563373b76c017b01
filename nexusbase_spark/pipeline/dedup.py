"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the whole point of these shapes at 100TB):

- exact dedup: one hash-groupBy on md5(normalized text) — map-side partial
  aggregation, a single shuffle on the 16-byte hash, never on the text.
- MinHash+LSH near-dup: shingle -> k min-hashes -> band keys -> bucket
  self-join. Candidate generation is O(n·bands) shuffle instead of the
  O(n²) all-pairs join; only candidates (a tiny fraction) pay the exact
  Jaccard verification join. Banding parameters (k, bands) trade recall
  for cost in the standard S-curve way.
- SimHash: per-doc constant-size signature computed in one pass + groupBy;
  near-dup candidates come from banding the signature bits, same trick.
- all hashes are md5-derived -> deterministic, identical in the DuckDB
  oracle, and uniformly distributed so the shuffles don't skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nexusbase_spark.pipeline.text import tokens_col, word_shingles


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Exact dedup by md5 of normalized text: every doc mapped to its
    group's keeper (min id) and group size."""
    h = F.md5(F.trim(F.lower(F.col(text_col)))).alias("content_hash")
    groups = (
        df.select(F.col(id_col), h)
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper"), F.count(F.lit(1)).alias("group_size"))
    )
    return (
        df.select(F.col(id_col), h)
        .join(groups, "content_hash")
        .select(id_col, "content_hash", "keeper", "group_size")
    )


def shingle_sets(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 n: int = 3) -> DataFrame:
    """(id, shingle) with set semantics (distinct within doc)."""
    return (
        df.select(F.col(id_col), F.explode(
            F.array_distinct(word_shingles(F.col(text_col), n))).alias("shingle"))
    )


def minhash_signatures(shingles: DataFrame, id_col: str = "doc_id",
                       num_hashes: int = 8) -> DataFrame:
    """k min-hashes per doc. Hash j of a shingle = md5('<j>:'||shingle);
    the signature component is the lexicographic MIN hex string — any total
    order works for MinHash, and hex strings compare identically in every
    engine. One groupBy with k min() aggregates (map-side combinable)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")))).alias(f"h{j}")
        for j in range(num_hashes)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame, id_col: str = "doc_id",
                        num_hashes: int = 8, bands: int = 4) -> DataFrame:
    """Band the signature (rows_per_band = k/bands), bucket-join within
    (band_idx, band_key): docs agreeing on ALL rows of some band become a
    candidate pair (a < b). The self-join key includes the band index so
    buckets from different bands never cross."""
    rows_per = num_hashes // bands
    assert rows_per * bands == num_hashes
    band_entries = F.array(*[
        F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(F.concat_ws("|", *[F.col(f"h{b * rows_per + r}") for r in range(rows_per)])).alias("band_key"),
        )
        for b in range(bands)
    ])
    banded = signatures.select(
        F.col(id_col), F.explode(band_entries).alias("e")
    ).select(id_col, F.col("e.band_idx").alias("band_idx"), F.col("e.band_key").alias("band_key"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def _pair_overlap(pairs: DataFrame, shingles: DataFrame,
                  id_col: str = "doc_id") -> DataFrame:
    """(id_a, id_b, inter, sz_a, sz_b) for candidate pairs via a
    shingle-set join — the shared verification kernel; only candidates
    pay this cost."""
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sa = shingles.withColumnRenamed(id_col, "id_a")
    sb = shingles.withColumnRenamed(id_col, "id_b")
    inter = (
        pairs
        .join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter
        .join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
    )


def jaccard_pairs(pairs: DataFrame, shingles: DataFrame,
                  id_col: str = "doc_id") -> DataFrame:
    """Exact Jaccard for candidate pairs: |A∩B| / (|A| + |B| - |A∩B|)."""
    out = _pair_overlap(pairs, shingles, id_col).withColumn(
        "jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
    return out.select("id_a", "id_b", "jaccard")


def near_dup_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                   n: int = 3, num_hashes: int = 8, bands: int = 4,
                   threshold: float = 0.5) -> DataFrame:
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification.

    The shingle set feeds three consumers (signatures + both sides of the
    intersection join); persisting it avoids re-tokenizing the corpus three
    times — locally a cache, at 100TB a checkpointed intermediate table.
    """
    from nexusbase_spark.plans import spread
    # shingling + k md5s per shingle is per-row expensive: a narrow input
    # (one small file = one split) would serialize it onto one core
    df = spread(df, compute_heavy=True)
    sh = shingle_sets(df, id_col, text_col, n).persist()
    sig = minhash_signatures(sh, id_col, num_hashes)
    cand = lsh_candidate_pairs(sig, id_col, num_hashes, bands)
    return jaccard_pairs(cand, sh, id_col).filter(F.col("jaccard") >= threshold)


def containment_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      num_hashes: int = 8, bands: int = 4,
                      threshold: float = 0.8) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT near-dup: |A∩B| / min(|A|, |B|) over
    the same LSH candidate set. A truncated copy is fully contained in
    its source (containment 1.0) while its Jaccard sits at the truncation
    ratio — this catches subset/prefix duplicates any symmetric threshold
    misses. Same shape as near_dup_pairs: O(n·bands) candidates, only
    candidates pay the verification join."""
    from nexusbase_spark.plans import spread
    df = spread(df, compute_heavy=True)
    sh = shingle_sets(df, id_col, text_col, n).persist()
    sig = minhash_signatures(sh, id_col, num_hashes)
    cand = lsh_candidate_pairs(sig, id_col, num_hashes, bands)
    out = _pair_overlap(cand, sh, id_col).withColumn(
        "containment", F.col("inter") / F.least(F.col("sz_a"), F.col("sz_b")))
    return (out.select("id_a", "id_b", "containment")
            .filter(F.col("containment") >= threshold))


def dedup_clusters(pairs: DataFrame, id_col_a: str = "id_a",
                   id_col_b: str = "id_b", max_iters: int = 20) -> DataFrame:
    """Connected components over near-dup pairs -> (doc_id, canonical_id).

    The dedup endgame: pairs say "these two match"; keeping one doc per
    GROUP needs the transitive closure. Iterative min-label propagation:
    every node adopts the smallest label among itself and its neighbors
    until fixpoint — O(diameter) joins, each a plain shuffle join, the
    standard large-graph CC formulation for data-parallel engines (no
    driver-side union-find). Near-dup graphs have tiny diameters
    (dup chains), so this converges in a handful of rounds.
    """
    edges = (
        pairs.select(F.col(id_col_a).alias("src"), F.col(id_col_b).alias("dst"))
        .union(pairs.select(F.col(id_col_b).alias("src"), F.col(id_col_a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    labels = labels.persist()
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src").agg(F.min("label").alias("nlabel"))
        )
        # persist + materialize each round: without it the lineage doubles
        # per iteration and every convergence check recomputes from scratch
        new_labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .select(F.col("node"),
                    F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"))
            .persist()
        )
        changed = (
            new_labels.alias("n").join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label")).limit(1).count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("canonical_id"))


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 16) -> DataFrame:
    """SimHash signature from frequency-weighted tokens.

    Bit i's vote for a token is +1 if hex digit i of md5(token) >= 8 else
    -1 (each hex digit contributes its high bit); the signature bit is 1
    when the summed vote is positive. Constant per-doc state -> one
    groupBy, map-side combinable."""
    from nexusbase_spark.plans import spread
    tok = spread(df, compute_heavy=True).select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("tok"))
    h = F.md5(F.col("tok"))
    votes = [
        F.sum(
            F.when(F.instr(F.lit("0123456789abcdef"), F.substring(h, i + 1, 1)) - 1 >= 8,
                   F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(2 ** i)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return agg.select(F.col(id_col), sig.cast("long").alias("simhash"))
