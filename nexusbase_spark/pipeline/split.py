"""Dataset splitting / sampling / mix reporting for training-data curation.

The reference engine has nothing in this family (its surface is time-series
scan + aggregate, SURVEY.md §2); these are the corpus-management operations
a 100TB pretraining pipeline runs before anything else:

- assign_split: deterministic train/val/test assignment from a salted md5
  bucket of the document key. Pure narrow projection — no shuffle, no RNG
  state, stable under re-runs, repartitions, and incremental appends
  (a doc's split never changes when the corpus grows — the property that
  makes held-out sets trustworthy).
- stratified_sample: per-stratum keep-rates applied with the same salted
  bucket trick. The rates ride in as a broadcast-joined table, so a rate
  card of millions of strata (e.g. per-domain) works the same as five
  languages — no when()-chain that grows with the dict.
- corpus_mix: per-group composition report (doc counts, char mass, shares
  of the whole). Shares come from a broadcast cross join of the 1-row
  global aggregate — never a single-partition window over the corpus.

All bucket hashes are md5-derived (hex is identical in DuckDB), matching
the convention of pipeline/dedup.py:60 (base_hash31).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# bucket resolution: rates/fractions are exact to 1/10000
N_BUCKETS = 10_000


def split_bucket(key: Column, salt: str) -> Column:
    """Deterministic bucket in [0, N_BUCKETS) from a salted md5 of the key.

    DuckDB mirror:
    CAST(('0x' || substring(md5(salt || ':' || CAST(key AS VARCHAR)), 1, 15))
         AS BIGINT) % 10000
    """
    h = F.md5(F.concat_ws(":", F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % N_BUCKETS


def assign_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Add a `split` column assigning each row to a named fraction.

    `fractions` maps split name -> fraction; they must sum to 1.0 (to
    bucket resolution). Assignment is by consecutive bucket ranges in dict
    order, so {'train': .98, 'val': .01, 'test': .01} gives train buckets
    [0, 9800), val [9800, 9900), test [9900, 10000).
    """
    b = split_bucket(F.col(key_col), salt)
    expr = None
    for name, hi in split_thresholds(fractions)[:-1]:
        cond = b < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last_name = list(fractions)[-1]
    expr = F.lit(last_name) if expr is None else expr.otherwise(last_name)
    return df.withColumn(out_col, expr)


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """(name, exclusive upper bucket bound) per split, in dict order; the
    last bound is always N_BUCKETS, so the names PARTITION the bucket
    space — every bucket maps to exactly one split. Raises unless the
    fractions sum to 1.0 within bucket resolution."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1.0 / N_BUCKETS:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    out: list[tuple[str, int]] = []
    hi = 0
    names = list(fractions)
    for name in names[:-1]:
        hi += round(fractions[name] * N_BUCKETS)
        out.append((name, min(hi, N_BUCKETS)))
    out.append((names[-1], N_BUCKETS))
    return out


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    salt: str = "sample-v1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows.

    A row survives iff its salted bucket < rate(stratum) * N_BUCKETS. The
    rate card joins in as a broadcast table (left join; unseen strata get
    `default_rate`), so the operator is one narrow projection + one
    broadcast hash join regardless of how many strata exist. Subsample
    monotonicity holds: lowering a rate yields a subset of the higher
    rate's sample (same salt), which is what curriculum re-mixes want.
    """
    spark = df.sparkSession
    rate_df = spark.createDataFrame(
        [(k, float(v)) for k, v in rates.items()],
        f"{strata_col} string, __rate double")
    b = split_bucket(F.col(key_col), salt)
    return (
        df.join(F.broadcast(rate_df), strata_col, "left")
        .withColumn("__rate", F.coalesce(F.col("__rate"), F.lit(default_rate)))
        .filter(b < F.round(F.col("__rate") * N_BUCKETS).cast("long"))
        .drop("__rate")
    )


def corpus_mix(
    df: DataFrame,
    group_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-group composition: row count, weight mass, and % shares.

    Output: (group, n_docs, total_weight, pct_docs, pct_weight), shares
    rounded to 4 decimals. The global totals are a 1-row aggregate
    broadcast-cross-joined into the per-group rollup — two map-side
    combinable aggregations, no global window, no second scan of the raw
    data (Spark reuses the shuffle of the per-group agg for the total in
    AQE; at worst it is a scan of the tiny grouped result).
    """
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(w).alias("total_weight"))
    tot = per.agg(F.sum("n_docs").alias("__nd"), F.sum("total_weight").alias("__tw"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            group_col, "n_docs", "total_weight",
            F.round(100.0 * F.col("n_docs") / F.col("__nd"), 4).alias("pct_docs"),
            F.round(100.0 * F.col("total_weight") / F.col("__tw"), 4).alias("pct_weight"),
        )
    )


def temperature_weights(df: DataFrame, group_col: str,
                        alpha: float = 0.5) -> DataFrame:
    """Temperature-based mixture reweighting (the multilingual/multi-source
    rebalancing rule: sampling share ∝ natural share^alpha, alpha<1 lifts
    the tail, alpha=1 is natural, alpha=0 is uniform).

    Output per group: n_docs, natural_share, sample_share, and
    weight_per_doc = sample_share / natural_share — the per-document
    sampling multiplier to feed straight into stratified_sample's rate
    card or interleave_by_weight's weights. Same shape as corpus_mix: one
    group rollup + a 1-row broadcast total per normalization, never a
    global window — a million-group rate card costs what five do.
    """
    per = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per.agg(F.sum("n_docs").alias("__nd"))
    nat = (per.crossJoin(F.broadcast(tot))
           .select(group_col, "n_docs",
                   (F.col("n_docs") / F.col("__nd")).alias("__nat")))
    powed = nat.withColumn("__pow", F.pow(F.col("__nat"), F.lit(alpha)))
    ptot = powed.agg(F.sum("__pow").alias("__pt"))
    return (powed.crossJoin(F.broadcast(ptot))
            .select(group_col, "n_docs",
                    F.round(F.col("__nat"), 6).alias("natural_share"),
                    F.round(F.col("__pow") / F.col("__pt"), 6).alias("sample_share"),
                    F.round((F.col("__pow") / F.col("__pt")) / F.col("__nat"), 6)
                    .alias("weight_per_doc")))


def per_group_sample_k(df: DataFrame, group_col: str, k: int,
                       id_col: str, salt: str = "panel-v1") -> DataFrame:
    """Deterministic EXACT-k panel per group: the k rows whose salted md5
    sorts first within the group (ties on id). Complements
    ``stratified_sample``: rate-based sampling is append-stable but
    yields a binomial count; a review/eval panel wants exactly k per
    group, accepting that appends can rotate members (a new row whose
    hash sorts into the top k displaces the old k-th — documented trade).

    One shuffle on ``group_col`` + an in-partition rank. At 100 TB with
    few giant groups, pre-filter survivors with a permissive hash bound
    (e.g. bucket < c*k/|group| via approximate group counts) before the
    window so the sort sees candidates, not the corpus; at dashboard
    group counts the plain window is the right plan.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    return (df.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k).drop("__rk"))


def weighted_sample_k(df: DataFrame, group_col: str, k: int,
                      id_col: str, weight_col: str,
                      salt: str = "wsample-v1") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k per group
    (Efraimidis & Spirakis 2006 reservoir keys — public method): each row
    draws u in (0,1] from a salted md5 of its id and ranks by
    ``-ln(u)/weight``; the k smallest keys per group are the sample, and
    inclusion probability scales with weight exactly as sequential
    weighted draws without replacement. No RNG state -> reproducible
    across runs/partitionings, mirrorable in an oracle.

    Rows with weight <= 0 or NULL are excluded. Same plan shape as
    ``per_group_sample_k`` (one shuffle + in-partition rank).
    """
    from pyspark.sql import Window

    h = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    # 15 hex chars = 60 bits; (v+1)/(16^15+1) lands in (0, 1]
    v = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    u = (v + F.lit(1).cast("double")) / F.lit(float(16 ** 15 + 1))
    key = -F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(key, F.col(id_col))
    return (df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k).drop("__rk"))


def epoch_repeat(df: DataFrame, key_col: str, epochs: dict[str, float],
                 strata_col: str = "source",
                 salt: str = "epoch-v1") -> DataFrame:
    """Fractional-epoch repetition for mixture training (e.g. "2.5 epochs
    of wiki, 1 epoch of web"): every row appears floor(e) times, plus one
    more for the deterministic frac(e) fraction chosen by salted bucket —
    the same md5 machinery as ``stratified_sample``, so the extra-copy
    subset is append-stable and subsample-monotone in e.

    Output adds an ``epoch`` column (0-based copy index) so downstream
    shuffling/packing can interleave copies rather than concatenate them.
    Implemented as a broadcast rate-card join + ``explode(sequence(...))``
    — per-row fanout with no shuffle; at 100 TB the multiplied rows flow
    straight into the pack/shuffle stage without materializing.
    Unlisted strata default to 1 epoch; e <= 0 drops the stratum.
    """
    spark = df.sparkSession
    card = spark.createDataFrame(
        [(k, float(v)) for k, v in epochs.items()],
        f"{strata_col} string, __e double")
    b = split_bucket(F.col(key_col), salt)
    base = F.floor(F.col("__e")).cast("long")
    extra = (b < F.round((F.col("__e") - base) * N_BUCKETS).cast("long")) \
        .cast("long")
    n_copies = base + extra
    return (df.join(F.broadcast(card), strata_col, "left")
            .withColumn("__e", F.coalesce(F.col("__e"), F.lit(1.0)))
            .withColumn("__n", n_copies)
            .filter(F.col("__n") > 0)
            .withColumn("epoch", F.explode(F.sequence(
                F.lit(0).cast("long"), F.col("__n") - 1)))
            .drop("__e", "__n"))


def budget_select(df: DataFrame, score_col: str, cost_col: str, budget: int,
                  id_col: str, bins: int = 100,
                  salt: str = "budget-v1") -> DataFrame:
    """Greedy data selection under a cost budget: take the highest-score
    documents until ``budget`` total cost (tokens) is reached — the
    "best N tokens" curation step after scoring.

    A global sort by score would single-thread the corpus, so selection
    is bin-greedy: scores (clamped to [0,1)) quantize into ``bins``
    fixed-width bins; whole bins are taken best-first while they fit
    (the per-bin cost table is ≤ ``bins`` rows — the only driver-side
    data), and the one CUTOFF bin that straddles the budget is filled by
    a deterministic salted-hash order with an in-bin running cost sum.
    Everything heavier than the bin table stays distributed: one narrow
    projection, one bin rollup, one window over the cutoff bin only.
    Deterministic under any partitioning; docs with cost > remaining
    budget inside the cutoff bin are skipped only if they don't fit at
    their hash position (greedy running sum, both engines identical).

    Resolution is the documented trade: the budget boundary lands within
    one bin, so selection differs from a per-document global greedy by at
    most one bin's score width (1/bins).
    """
    from pyspark.sql import Window

    # NULL scores are excluded up front (mirroring weighted_sample_k's
    # null/<=0 exclusion): a null score would produce a null __bin and a
    # driver-side TypeError negating None in the bin sort (ADVICE r3).
    df = df.filter(F.col(score_col).isNotNull())
    sc = F.least(F.greatest(F.col(score_col), F.lit(0.0)), F.lit(1.0 - 1e-9))
    # Persist the scored frame: it is consumed THREE times (the bin-cost
    # rollup below — which materializes it via collect() anyway — the
    # full-bins filter, and the cutoff-bin window), and without the cache
    # each consumer re-ran the scoring scan with the isnotnull(score) /
    # __bin filters pushed below the score projection re-inlining the
    # tokenization at the scan (4 split() copies per row). The cached
    # frame is narrow (ids + score + cost + bin).
    d = df.withColumn("__bin", F.floor(sc * bins).cast("long")).persist()
    bin_rows = sorted(
        ((r["__bin"], r["__c"]) for r in
         d.groupBy("__bin").agg(F.sum(F.col(cost_col)).alias("__c")).collect()),
        key=lambda t: -t[0])
    full_bins, remaining, cutoff = [], budget, None
    for b, c in bin_rows:
        if c <= remaining:
            full_bins.append(b)
            remaining -= c
        else:
            cutoff = b
            break
    out = d.filter(F.col("__bin").isin(full_bins) if full_bins
                   else F.lit(False))
    if cutoff is not None and remaining > 0:
        h = F.md5(F.concat(F.lit(salt), F.lit("|"),
                           F.col(id_col).cast("string")))
        w = (Window.partitionBy("__bin").orderBy(h, F.col(id_col))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        part = (d.filter(F.col("__bin") == cutoff)
                .withColumn("__cum", F.sum(F.col(cost_col)).over(w))
                .filter(F.col("__cum") <= remaining).drop("__cum"))
        out = out.unionByName(part)
    return out.drop("__bin")


def epoch_shuffle(df: DataFrame, id_col: str, epoch: int, num_shards: int,
                  salt: str = "shuffle-v1") -> DataFrame:
    """Deterministic per-epoch global shuffle into training shards:
    -> original columns + (shard, pos). Every epoch gets a different but
    REPRODUCIBLE permutation (the salted hash keys on epoch), which is
    how shard writers give each pass over the corpus a fresh order
    without ever materializing a global sort.

    Scale shape: shard = hash prefix mod num_shards (one hash-partition
    exchange, uniformly sized shards by construction), pos = rank within
    the shard ordered by the hash (per-shard local sort — Spark's window
    sort spills; no global ordering ever exists and none is needed,
    because (shard, pos) IS the epoch order). Downstream the writer does
    ``.repartition(num_shards, "shard").sortWithinPartitions("pos")`` and
    streams each shard out in order.

    DuckDB mirror: shard = CAST(('0x' || substring(md5(salt || ':' ||
    epoch || ':' || id), 1, 15)) AS BIGINT) % num_shards; pos =
    row_number() OVER (PARTITION BY shard ORDER BY md5(...), id).
    """
    from pyspark.sql import Window

    h = F.md5(F.concat_ws(":", F.lit(salt), F.lit(str(epoch)),
                          F.col(id_col).cast("string")))
    d = df.withColumn("__h", h).withColumn(
        "shard",
        (F.conv(F.substring(F.col("__h"), 1, 15), 16, 10).cast("long")
         % num_shards))
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return d.withColumn("pos", F.row_number().over(w)).drop("__h")
