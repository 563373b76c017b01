"""Live per-series percentiles over the ingest stream: t-digest state in
applyInPandasWithState.

The reference computes p<N> at query time by feeding every raw value into
a go-tdigest accumulator (iterator/multi_field_aggregator.go:23,81-86);
a live dashboard wants "p95 so far" continuously without re-scanning.
Group state holds ONE serialized digest per series (KB-sized, bounded by
the compression parameter regardless of stream length — the same
property that makes the batch rollup mergeable makes the streaming state
bounded); each micro-batch folds its values in and re-emits the series'
current estimate in update mode.

Exactness follows the batch contract (functions/tdigest.py): singleton
regime -> exactly the closest-rank linear interpolation; beyond it the
documented ~1/δ rank error. State is checkpointed with the query and
partitioned by series key, so it scales horizontally like any shuffle.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from nexusbase_spark.functions.tdigest import DEFAULT_COMPRESSION, TDigest

_STATE_SCHEMA = StructType([StructField("digest", BinaryType())])


def _out_schema(key_col: str) -> StructType:
    return StructType([
        StructField(key_col, StringType()),
        StructField("n", LongType()),
        StructField("quantile", DoubleType()),
    ])


def live_percentile(stream: DataFrame, key_col: str, q: float, *,
                    value_col: str = "value",
                    compression: int = DEFAULT_COMPRESSION) -> DataFrame:
    """Continuous per-key quantile of ``value_col``. Emits
    (key, n, quantile) for every key a batch touches — the latest row per
    key is the current estimate (update mode)."""

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        td = (TDigest.from_bytes(bytes(state.get[0]), compression)
              if state.exists else TDigest(compression))
        for pdf in pdfs:
            td.add_many(pdf[value_col].dropna().to_numpy())
        state.update((td.to_bytes(),))
        yield pd.DataFrame({key_col: [key[0]], "n": [int(td.count)],
                            "quantile": [td.quantile(q) if td.count
                                         else float("nan")]})

    return stream.groupBy(key_col).applyInPandasWithState(
        fn, _out_schema(key_col), _STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)
