"""Live deterministic review panels over the ingest stream.

``pipeline/split.per_group_sample_k`` draws an exact-k panel per group
by keeping the k rows whose salted md5 sorts first. Because that rule is
a pure ORDER over (hash, id) — no RNG state, no dependence on arrival
order — it streams: keep, per group, the k best (hash, id) pairs seen so
far and fold each micro-batch in. The live panel is therefore EXACTLY
the batch panel over the rows ingested so far (parity tested), which is
the property a continuously-maintained eval/review set needs: members
rotate only when a new row genuinely out-ranks the k-th, never because
of batch boundaries.

State per group is k (hash, id) pairs — O(k), checkpointed with the
query. Ids travel as strings (the hash input form); join back to the
store for payloads.
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType([
    StructField("hashes", ArrayType(StringType())),
    StructField("ids", ArrayType(StringType())),
])


def _out_schema(group_col: str, id_col: str) -> StructType:
    return StructType([
        StructField(group_col, StringType()),
        StructField(id_col, StringType()),
        StructField("rank", LongType()),
    ])


def live_panel(stream: DataFrame, group_col: str, k: int, id_col: str,
               salt: str = "panel-v1") -> DataFrame:
    """Continuous exact-k panel per group. Emits the group's full
    current panel (id, rank 1..k) per touched group per batch in update
    mode; identical member set and ranks as the batch
    ``per_group_sample_k`` over the same rows."""
    # Spark-side string cast BEFORE Arrow: guarantees the hash input is
    # the same "5" the batch operator's cast produces (a nullable int64
    # column would reach pandas as float64 and hash as "5.0")
    stream = stream.withColumn(id_col, F.col(id_col).cast("string"))

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            hs, ids = state.get
            pairs = list(zip(hs, ids))
        else:
            pairs = []
        for pdf in pdfs:
            for rid in pdf[id_col].dropna():
                rid = str(rid)
                h = hashlib.md5(f"{salt}|{rid}".encode()).hexdigest()
                pairs.append((h, rid))
        # the batch rule verbatim: order by (md5, id), keep k, dedup ids
        seen = set()
        uniq = []
        for h, rid in sorted(pairs):
            if rid not in seen:
                seen.add(rid)
                uniq.append((h, rid))
        pairs = uniq[:k]
        state.update(([h for h, _ in pairs], [r for _, r in pairs]))
        yield pd.DataFrame({
            group_col: [key[0]] * len(pairs),
            id_col: [r for _, r in pairs],
            "rank": [i + 1 for i in range(len(pairs))],
        })

    return stream.groupBy(group_col).applyInPandasWithState(
        fn, _out_schema(group_col, id_col), _STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)
