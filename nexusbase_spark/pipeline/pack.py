"""Sequence packing and dataset interleaving — the batch-assembly side of
a pretraining data pipeline (nothing comparable exists in the reference,
whose surface ends at time-series queries; SURVEY.md §2).

- pack_assignments: assign documents to fixed-token-budget packs (the
  "sample packing" step that turns a shuffled corpus into dense training
  sequences). True first-fit bin packing is inherently sequential, so the
  scalable formulation is the standard streaming cut: lay each shard's
  docs head-to-tail in a deterministic order and cut every `budget`
  tokens. A pack can overflow by at most (longest doc - 1) tokens — the
  bounded-overflow approximation every distributed packer makes; the
  boundary doc is the one a trainer truncates or spills. One window
  (running sum) per shard, shards are salted-hash spread, no driver
  state.
- interleave_by_weight: weighted round-robin mixing of strata into one
  global stream (the "dataset mixing" step): element i of a stratum with
  weight w sits at virtual position i/w, so a weight-2 stratum appears
  twice as often as a weight-1 stratum in any prefix of the mixed order.
  The weight card broadcast-joins in; taking the first n of the mix is a
  TakeOrderedAndProject (per-partition top-n, no global sort
  materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nexusbase_spark.pipeline.split import N_BUCKETS, split_bucket


def pack_assignments(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    budget: int,
    shards: int = 8,
    salt: str = "pack-v1",
) -> DataFrame:
    """Add (shard, pack_id, pack_offset) to every row.

    shard = salted md5 bucket of the key (deterministic spread, stable
    under appends); within a shard, docs are ordered by key and cut into
    packs every `budget` tokens of the running total. pack_offset is the
    doc's start position inside its pack's token stream.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    shard = (split_bucket(F.col(key_col), salt) % shards).alias("shard")
    w = (Window.partitionBy("shard").orderBy(key_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return (
        df.withColumn("shard", shard)
        .withColumn("__cum", cum_before)
        .withColumn("pack_id", F.floor(F.col("__cum") / budget))
        .withColumn("pack_offset", F.col("__cum") % budget)
        .drop("__cum")
    )


def interleave_by_weight(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    weights: dict[str, float],
    n: int | None = None,
) -> DataFrame:
    """Mix strata into one deterministic global order by sampling weight.

    Each stratum's rows are ranked by key; rank r of a stratum with
    weight w gets virtual position r/w, and the mix is ordered by
    (position, stratum, key) — a total order, so any prefix is a
    reproducible weighted blend. Strata absent from `weights` are
    dropped (weight 0). With `n`, returns the first n rows of the mix
    (distributed top-n, not a global sort).
    """
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(k, float(v)) for k, v in weights.items() if v > 0],
        f"{strata_col} string, __w double")
    rw = Window.partitionBy(strata_col).orderBy(key_col)
    mixed = (
        df.join(F.broadcast(wdf), strata_col)
        .withColumn("__rn", F.row_number().over(rw))
        .withColumn("mix_pos", F.col("__rn") / F.col("__w"))
        .drop("__w", "__rn")
    )
    ordered = mixed.orderBy("mix_pos", strata_col, key_col)
    return ordered.limit(n) if n is not None else ordered


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window chunking: split each doc's token stream into
    fixed-size training windows every `stride` tokens (overlap =
    chunk_tokens - stride). Returns one row per (doc, chunk) with
    (chunk_idx, start_tok, n_tok, chunk_hash).

    Entirely NARROW — tokenize, enumerate starts with sequence(), and
    posexplode, all inside one projection; no shuffle at any scale. The
    final window may be short (n_tok < chunk_tokens); docs with no
    tokens produce no chunks. chunk_hash (md5 of the window text) is
    the dedup/provenance handle downstream."""
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    starts = F.sequence(F.lit(0), F.size("__toks") - 1, F.lit(stride))
    chunk = F.slice(F.col("__toks"), F.col("start") + 1, chunk_tokens)
    return (
        df.withColumn("__toks", F.split(F.col(text_col), " "))
        .filter(F.size("__toks") > 0)
        .select(F.col(id_col), F.col("__toks"),
                F.posexplode(starts).alias("chunk_idx", "start"))
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("start").cast("long").alias("start_tok"),
            F.size(chunk).cast("long").alias("n_tok"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
        )
    )


def cdc_chunks(df, window: int = 8, mask_hex: str = "0",
               id_col: str = "doc_id", text_col: str = "text",
               with_text: bool = False):
    """Content-defined chunking (window-hash CDC): cut after every
    position whose `window`-char substring hashes into the mask (md5 hex
    suffix match, boundary probability 16^-len(mask_hex)) ->
    (id, chunk_idx, chunk_start, chunk_len, chunk_md5).

    Boundaries depend only on LOCAL content, so an insertion early in a
    doc shifts at most the chunk it lands in — every later chunk hashes
    identically (the rsync/LBFS property fixed-width chunking lacks).
    Chunk-level dedup across near-identical docs then reduces to an
    exact groupBy on chunk_md5. All arrays are built NARROWLY (filter/
    transform over a position sequence inside one projection; the only
    explode is the final per-chunk row expansion); at corpus scale add a
    min-chunk guard by dropping boundaries closer than min_size — the
    standard CDC tuning, omitted here to keep the oracle 1:1.
    """
    from pyspark.sql import functions as F
    w = int(window)
    # sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — docs
    # shorter than the window would hash phantom positions (p=0/1 with a
    # truncated substring) and gain spurious cuts. The p-range guard in
    # the filter lambda makes the cut list empty for short docs.
    cut_expr = (
        f"transform(filter(sequence(1, greatest(length({text_col})-{w-1}, 1)), "
        f"p -> p <= length({text_col})-{w-1} "
        f"and md5(substring({text_col}, p, {w})) like '%{mask_hex}'), "
        f"b -> b + {w - 1})"
    )
    seg = df.select(
        F.col(id_col), F.col(text_col).alias("__t"),
        F.expr(cut_expr).alias("__cuts"))
    seg = seg.select(
        id_col, "__t",
        F.concat(F.array(F.lit(1)),
                 F.expr("transform(__cuts, c -> c + 1)")).alias("__starts"),
        F.concat(F.col("__cuts"),
                 F.array(F.length("__t"))).alias("__ends"))
    ch = seg.select(
        id_col, "__t",
        F.posexplode(F.arrays_zip("__starts", "__ends")).alias("chunk_idx", "z"))
    cols = [
        F.col(id_col), F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("z.__starts").cast("long").alias("chunk_start"),
        (F.col("z.__ends") - F.col("z.__starts") + 1).cast("long").alias("chunk_len"),
        F.md5(F.expr("substring(__t, z.__starts, z.__ends - z.__starts + 1)"))
        .alias("chunk_md5"),
    ]
    if with_text:
        # carried only when the caller reconstructs (scrub_frequent_chunks)
        # — the md5-only default keeps the dedup-signal path text-free
        cols.append(F.expr("substring(__t, z.__starts, z.__ends - z.__starts + 1)")
                    .alias("chunk_text"))
    return ch.select(*cols).filter(F.col("chunk_len") > 0)
