"""Frequent-term mining without a full-vocabulary shuffle.

``groupBy(token).count()`` is exact but shuffles the ENTIRE vocabulary —
fine for words (small), hopeless for n-grams/URLs at 100 TB where the key
space is billions and the shuffle is the job. The classic fix is two-phase:

1. **Candidates** — a per-partition Misra-Gries summary (capacity ``m``)
   over the token stream, run inside ``mapInPandas`` so state lives across
   the partition's Arrow batches. A term whose GLOBAL count exceeds
   ``n/m`` is guaranteed to survive in at least one partition (if it were
   evicted everywhere, each partition count would be ≤ n_p/m, summing to
   ≤ n/m). Output is ``m`` terms per partition — constant, tiny.
2. **Recount** — exact counts for candidate terms only: explode + semi
   join against the broadcast candidate set + groupBy. The shuffle now
   carries at most ``m × partitions`` distinct keys instead of the
   vocabulary.

The result is EXACT for every term with count > n/m (estimation never
leaks into reported counts — phase 2 recounts from the raw stream), and
the detection floor is an explicit knob: capacity*partitions keys of
shuffle buys an n/m floor. When capacity ≥ the true vocabulary the MG
summary never evicts and the result equals the full groupBy for ANY k.

Misra-Gries decrement-all is O(capacity) per eviction burst; amortized
O(1) per token (each decrement pays for an earlier increment).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexusbase_spark.pipeline.text import tokens_col


def mg_update(counts: dict[str, int], tokens, capacity: int) -> None:
    """Fold ``tokens`` into a Misra-Gries summary in place (at most
    ``capacity`` keys; decrement-all on overflow, amortized O(1)/token)."""
    for t in tokens:
        if t in counts:
            counts[t] += 1
        elif len(counts) < capacity:
            counts[t] = 1
        else:
            dead = []
            for kk in counts:
                counts[kk] -= 1
                if counts[kk] == 0:
                    dead.append(kk)
            for kk in dead:
                del counts[kk]


def _mg_partition(capacity: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        for pdf in batches:
            for toks in pdf["toks"]:
                mg_update(counts, toks, capacity)
        yield pd.DataFrame({"token": list(counts.keys())})
    return run


def mg_candidates(tok_arrays: DataFrame, capacity: int = 4096) -> DataFrame:
    """Distinct Misra-Gries survivor terms across partitions of a
    single-column DataFrame ``toks: array<string>``."""
    cands = tok_arrays.select(F.col("toks")).mapInPandas(
        _mg_partition(capacity), schema="token string")
    return cands.distinct()


def heavy_hitters_topk(df: DataFrame, k: int = 20, *,
                       capacity: int = 4096, ngram: int = 1,
                       text_col: str = "text") -> DataFrame:
    """Exact top-k most frequent word ``ngram``s via MG candidates + exact
    recount. Ties break on the token string. Returns (token, cnt).

    Correct for any k when the top-k all have count > n/capacity (always
    true when capacity ≥ vocabulary — the MG pass never evicts then).
    """
    # tokenize in its own projection: the n-gram shingle slices reference
    # the token array several times and inlined each re-derives the
    # whole-text split (r9)
    base = df.select(tokens_col(F.col(text_col)).alias("__t0"))
    toks = F.col("__t0")
    if ngram > 1:
        from nexusbase_spark.pipeline.text import shingles_of_tokens
        toks = shingles_of_tokens(toks, ngram)
    # Persist the n-gram arrays: consumed twice (the MG candidate pass and
    # the exact-recount explode), so without the cache the scan+tokenize+
    # shingle pipeline ran twice — and the optimizer's inferred
    # size(toks)>0 filter below the explode pushed to the scan with the
    # whole shingle expression re-inlined (8 split() copies per row).
    # Cached, both consumers read the materialized arrays and the inferred
    # filter tests the cached column.
    arrays = base.select(toks.alias("toks")).persist()
    cands = mg_candidates(arrays, capacity)
    exploded = arrays.select(F.explode("toks").alias("token"))
    return (exploded.join(F.broadcast(cands), "token", "left_semi")
            .groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("token"))
            .limit(k))
