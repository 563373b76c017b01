"""DSIR-style data selection: hashed n-gram importance resampling.

Implements the method of Xie et al., "Data Selection for Language Models
via Importance Resampling" (NeurIPS 2023), from its published definition:

1. featurize every document as counts over ``m`` hashed n-gram buckets
   (unigrams + bigrams, md5-derived 31-bit hash mod m — the same portable
   hash family the dedup kernels use, identical in the DuckDB oracle);
2. fit Laplace-smoothed bag-of-ngrams multinomials for the TARGET
   distribution (the curated domain you want more of) and the RAW corpus;
3. per-doc importance log-weight
   ``lambda(x) = sum_b c_b(x) * (log p_t[b] - log p_r[b])``;
4. Gumbel-top-k resampling: rank by ``lambda + g`` where ``g`` is Gumbel
   noise — here derived deterministically from md5(doc_id), so selection
   is reproducible and cross-engine checkable while keeping the
   randomized-resampling shape of the paper (a seeded PRNG in spirit).

Scale shape (the reason this works at 100 TB): the only corpus-sized
shuffles are the bucket-count rollup (keys = m buckets — map-side
combined to at most m rows per task) and the per-doc weight sum (keys =
doc_id, partial-aggregated). The fitted models are m-row tables that
BROADCAST back; nothing is collected to the driver and no Python runs
per row. Laplace-unseen buckets never need a dense m-row generate:
``lambda`` decomposes as
``sum_g [ln(cnt_t[g]+1) - ln(cnt_r[g]+1)] + n_grams * (ln(N_r+m) - ln(N_t+m))``
so only OBSERVED buckets are ever joined (cnt_t coalesces to 0).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nexusbase_spark.pipeline.dedup import MINHASH_P, base_hash31
from nexusbase_spark.pipeline.text import shingles_of_tokens, tokens_col


def _grams(text: Column, m: int, toks: Column | None = None) -> Column:
    """Hashed uni+bigram profile. ``toks``: pre-projected token array —
    inlined, the unigram concat and the bigram shingle slices re-derive
    the split per reference (r9)."""
    toks = tokens_col(text) if toks is None else toks
    grams = F.concat(toks, shingles_of_tokens(toks, 2))
    return F.transform(grams, lambda g: base_hash31(g) % m)


def dsir_select(docs: DataFrame, target_flag: Column, k: int = 50,
                m: int = 1024, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Select ``k`` docs by Gumbel-top-k over DSIR importance weights.

    ``target_flag`` marks the rows that define the target distribution
    (they remain candidates too, like the paper's held-in sampling).

    Output: id_col, n_grams, lam (4dp log-weight), sel_key (4dp
    lambda+gumbel ranking key). Deterministic: the ranking key is
    floor-quantized to 1e-6 before the top-k and ties break on id.
    """
    base = (docs.select(F.col(id_col), target_flag.alias("__tgt"),
                        tokens_col(F.col(text_col)).alias("__toks"))
            .select(F.col(id_col), F.col("__tgt"),
                    F.explode(_grams(F.lit(None), m,
                                     toks=F.col("__toks"))).alias("b")))
    raw = base.groupBy("b").agg(F.count(F.lit(1)).alias("cnt_r"))
    tgt = (base.filter("__tgt").groupBy("b")
           .agg(F.count(F.lit(1)).alias("cnt_t")))
    totals = base.agg(
        F.count(F.lit(1)).alias("n_r"),
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("n_t"))
    per_gram = (base.join(raw, "b")
                .join(tgt, "b", "left")
                .select(id_col,
                        (F.log(F.coalesce(F.col("cnt_t"), F.lit(0)) + 1.0)
                         - F.log(F.col("cnt_r") + 1.0)).alias("lr")))
    per_doc = per_gram.groupBy(id_col).agg(
        F.sum("lr").alias("lr_sum"), F.count(F.lit(1)).alias("n_grams"))
    lam = (F.col("lr_sum")
           + F.col("n_grams") * (F.log(F.col("n_r") + F.lit(float(m)))
                                 - F.log(F.col("n_t") + F.lit(float(m)))))
    # deterministic Gumbel: u in (0,1) from the md5 hash of the id
    u = ((base_hash31(F.col(id_col).cast("string")) + 1.0)
         / F.lit(float(MINHASH_P + 1)))
    gumbel = -F.log(-F.log(u))
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    q4 = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    scored = (per_doc.crossJoin(F.broadcast(totals))
              .select(id_col, "n_grams", lam.alias("__lam"),
                      q6(lam + gumbel).alias("__key")))
    # distributed top-k: TakeOrderedAndProject, never a global sort
    return (scored.orderBy(F.col("__key").desc(), F.col(id_col))
            .limit(k)
            .select(id_col, "n_grams", q4(F.col("__lam")).alias("lam"),
                    q4(F.col("__key")).alias("sel_key")))


def source_kl_report(docs: DataFrame, group_col: str = "source",
                     text_col: str = "text") -> DataFrame:
    """Per-group distribution drift: KL(p_group || q_corpus) between
    Laplace-smoothed unigram LMs — the mixture-shift diagnostic that
    tells a curation pipeline which source's language diverges from the
    blend (feeding temperature/mixture re-weighting decisions).

    p_g(t) = (c_gt + 1)/(n_g + V), q(t) = (c_t + 1)/(N + V) over the
    corpus vocabulary V. The sum over tokens ABSENT from a group closes
    to a scalar form (all such tokens share p = 1/(n_g+V)):

        KL_g = sum_present p (ln p - ln q)
             + a * [ (V - V_g) ln a - (SLQ - sum_present ln q) ],
        a = 1/(n_g+V),  SLQ = sum over vocab of ln q

    so nothing vocab-x-groups is ever materialized: the only shuffles
    are the (group, token) and (token) count rollups (map-side combined)
    and the per-group fold; V/N/SLQ are three driver scalars (one agg
    job). The DuckDB oracle mirrors this exact decomposition so both
    engines fold the same multisets. Output floor-quantized to 1e-4.

    Output: (group_col, n_tokens, vocab_seen, kl).
    """
    import math

    from pyspark.sql import Window

    tok = docs.select(F.col(group_col).alias("grp"),
                      F.explode(tokens_col(F.col(text_col))).alias("t"))
    corpus = (tok.groupBy("t").agg(F.count(F.lit(1)).alias("cq"))
              .localCheckpoint(eager=True))  # reused: scalars + join
    g = corpus.agg(F.count(F.lit(1)).alias("v"), F.sum("cq").alias("n"),
                   F.sum(F.log(F.col("cq") + 1)).alias("slncq")).collect()[0]
    vocab, n_tot = int(g["v"]), int(g["n"])
    ln_nv = math.log(n_tot + vocab)
    slq = float(g["slncq"]) - vocab * ln_nv  # sum over vocab of ln q
    sc = tok.groupBy("grp", "t").agg(F.count(F.lit(1)).alias("cs"))
    wg = Window.partitionBy("grp")
    sc = (sc.withColumn("ns", F.sum("cs").over(wg))
          .withColumn("vs", F.count(F.lit(1)).over(wg))
          .join(corpus, "t"))
    p = (F.col("cs") + 1) / (F.col("ns") + vocab)
    lnq = F.log(F.col("cq") + 1) - ln_nv
    agg = (sc.groupBy("grp", "ns", "vs")
           .agg(F.sum(p * (F.log(p) - lnq)).alias("s1"),
                F.sum(lnq).alias("s2")))
    a = 1.0 / (F.col("ns") + vocab)
    kl = (F.col("s1")
          + a * ((vocab - F.col("vs")) * F.log(a) - (slq - F.col("s2"))))
    return agg.select(F.col("grp").alias(group_col),
                      F.col("ns").alias("n_tokens"),
                      F.col("vs").alias("vocab_seen"),
                      (F.floor(kl * 1e4 + F.lit(0.5)) / 1e4).alias("kl"))
