"""Live frequent-term tracking over the ingest stream: sharded Misra-Gries
state via applyInPandasWithState.

The batch operator (pipeline/heavyhitters.py) re-reads the corpus; a live
pipeline wants "top n-grams so far" continuously without re-scanning. The
streaming shape:

- every token is hash-assigned to ONE of ``nshards`` state shards
  (``pmod(xxhash64(token), nshards)``), so all occurrences of a token meet
  in the same shard and its count is tracked in exactly one place;
- each shard folds its micro-batch tokens into a Misra-Gries summary
  (capacity ``capacity``) held in group state — checkpointed with the
  query, partitioned like any shuffle, so shards scale horizontally;
- after each batch a shard re-emits its current candidates
  (shard, token, cnt) in update mode; global top-k is a trivial
  sort of the ≤ nshards x capacity candidate rows downstream.

Count semantics: EXACT while a shard's observed vocabulary fits its
capacity (no eviction ever fires — each token only increments its own
entry); once a shard overflows, counts become MG lower bounds with
undercount ≤ (shard tokens)/capacity, and a term with true shard count
above that floor is guaranteed present. Memory is O(nshards x capacity)
regardless of stream length — the property that makes this runnable
forever, unlike a groupBy(token) running count whose state is the
unbounded vocabulary.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from nexusbase_spark.pipeline.heavyhitters import mg_update

_STATE_SCHEMA = StructType([
    StructField("tokens", ArrayType(StringType())),
    StructField("counts", ArrayType(LongType())),
])

_OUT_SCHEMA = StructType([
    StructField("shard", IntegerType()),
    StructField("token", StringType()),
    StructField("cnt", LongType()),
])


def live_heavy_hitters(stream: DataFrame, token_col: str = "token", *,
                       nshards: int = 16, capacity: int = 64) -> DataFrame:
    """Continuous per-shard MG candidates over a token stream. Input needs
    a string ``token_col``; output rows (shard, token, cnt) re-emit a
    shard's full candidate set whenever a batch touches it (update mode —
    downstream keeps the latest per token)."""

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        shard = int(key[0])
        if state.exists:
            toks, cnts = state.get
            counts = dict(zip(toks, (int(c) for c in cnts)))
        else:
            counts = {}
        for pdf in pdfs:
            mg_update(counts, pdf["token"], capacity)
        state.update((list(counts.keys()), list(counts.values())))
        yield pd.DataFrame({"shard": shard,
                            "token": list(counts.keys()),
                            "cnt": list(counts.values())})

    sharded = stream.select(
        F.pmod(F.xxhash64(F.col(token_col)), F.lit(nshards))
        .cast("int").alias("shard"),
        F.col(token_col).alias("token"))
    return sharded.groupBy("shard").applyInPandasWithState(
        fn, _OUT_SCHEMA, _STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)
