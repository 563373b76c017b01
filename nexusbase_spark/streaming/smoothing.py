"""Live Holt level+trend monitor over the ingest stream.

The batch operator (operators/timeseries.holt_linear) folds the Holt
double-exponential recurrence retrospectively; a monitoring deployment
wants the SAME smoothed level/trend maintained continuously so a
dashboard (or alert rule on the h-step forecast) tracks each series
without re-reading history — the trend-aware upgrade of a live EWMA.

State per series is three numbers plus a seed buffer: (l, b, n), with
the first observed value held until the second arrives (Holt seeds
l_1 = x_1, b_1 = x_2 - x_1, so a one-point series has no trend yet) —
O(1) state regardless of stream length, checkpointed with the query and
partitioned by series key like every applyInPandasWithState operator
here. Each micro-batch folds its rows in (ts, seq) order through the
identical recurrence the batch operator uses, so batch and stream agree
exactly on identical input (test_streaming_holt_matches_batch). Late
data folds on arrival — the documented order-sensitivity caveat; the
batch operator over the stored table is the late-data-exact answer.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType([
    StructField("l", DoubleType()),
    StructField("b", DoubleType()),
    StructField("n", LongType()),
    StructField("x0", DoubleType()),   # first value, parked until second
])


def _out_schema(key_col: str) -> StructType:
    return StructType([
        StructField(key_col, StringType()),
        StructField("n", LongType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("forecast", DoubleType()),
    ])


def live_holt(stream: DataFrame, key_col: str, alpha: float, beta: float, *,
              horizon: int = 3, value_col: str = "value",
              order_cols: tuple[str, ...] = ("ts", "seq")) -> DataFrame:
    """Continuous Holt smoothing per key. Emits (key, n, level, trend,
    forecast = level + horizon*trend) per touched key per batch in
    update mode; keys still holding only one point emit NULL level/trend
    (nothing to smooth yet)."""

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        l, b, n, x0 = (state.get if state.exists
                       else (None, None, 0, None))
        for pdf in pdfs:
            cols = [c for c in order_cols if c in pdf.columns]
            if cols:
                pdf = pdf.sort_values(list(cols), kind="mergesort")
            for x in pdf[value_col].dropna():
                x = float(x)
                n += 1
                if n == 1:
                    x0 = x
                elif n == 2:
                    l, b = x0, x - x0
                    ln = alpha * x + (1.0 - alpha) * (l + b)
                    b = beta * (ln - l) + (1.0 - beta) * b
                    l = ln
                else:
                    ln = alpha * x + (1.0 - alpha) * (l + b)
                    b = beta * (ln - l) + (1.0 - beta) * b
                    l = ln
        state.update((l, b, n, x0))
        fc = (l + horizon * b) if l is not None else None
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "level": [l],
                            "trend": [b], "forecast": [fc]})

    return stream.groupBy(key_col).applyInPandasWithState(
        fn, _out_schema(key_col), _STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)
