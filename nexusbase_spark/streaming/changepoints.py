"""Live CUSUM drift monitor over the ingest stream.

The batch operator (operators/timeseries.cusum_changepoints) detects
level shifts retrospectively with a closed-form window plan; a
monitoring deployment wants the SAME statistic maintained continuously
against a known baseline — the reference's outlier-detector hook shape
(hooks/listeners/outlier_detector.go:19-100: static per-metric rule
applied at ingest), upgraded from a static threshold to Page's
sequential test.

State per series is four numbers (s_pos, s_neg, n, alarms) — O(1)
regardless of stream length, checkpointed with the query and partitioned
by series key like every applyInPandasWithState operator here. Each
micro-batch folds its rows in (ts, seq) order through the textbook
recursion ``S+ = max(0, S+ + (x - mu - k))`` (NO reset after alarm — the
same no-reset curve the batch operator emits, so batch and stream agree
exactly on identical input; see test_streaming_cusum_matches_batch).
Late data folds when it arrives: the recursion is order-sensitive, and a
point that arrives after a later point folds after it — the documented
streaming caveat (the batch operator over the stored table is the
late-data-exact answer).

The baseline (mu, sigma) is supplied, not learned: in production it
comes from a batch fit over history (exactly what the batch operator's
window learns), pushed here as constants — learning it inside the
stream would couple the alarm threshold to the drift it must detect.
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
    StructField("sp", DoubleType()),
    StructField("sn", DoubleType()),
    StructField("n", LongType()),
    StructField("alarms", LongType()),
])


def _out_schema(key_col: str) -> StructType:
    return StructType([
        StructField(key_col, StringType()),
        StructField("n", LongType()),
        StructField("s_pos", DoubleType()),
        StructField("s_neg", DoubleType()),
        StructField("alarms", LongType()),
    ])


def live_cusum(stream: DataFrame, key_col: str, mu: float, sigma: float, *,
               slack: float = 0.5, threshold: float = 4.0,
               value_col: str = "value",
               order_cols: tuple[str, ...] = ("ts", "seq")) -> DataFrame:
    """Continuous two-sided CUSUM vs a fixed (mu, sigma) baseline.

    Emits (key, n, s_pos, s_neg, alarms) per touched key per batch in
    update mode; ``alarms`` counts points whose statistic exceeded
    ``threshold * sigma`` so far.
    """
    k = slack * sigma
    h = threshold * sigma

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        sp, sn, n, alarms = (state.get if state.exists
                             else (0.0, 0.0, 0, 0))
        for pdf in pdfs:
            cols = [c for c in order_cols if c in pdf.columns]
            if cols:
                pdf = pdf.sort_values(list(cols), kind="mergesort")
            for x in pdf[value_col].dropna():
                sp = max(0.0, sp + (float(x) - mu - k))
                sn = max(0.0, sn + (mu - float(x) - k))
                n += 1
                if sp > h or sn > h:
                    alarms += 1
        state.update((sp, sn, n, alarms))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "s_pos": [sp],
                            "s_neg": [sn], "alarms": [alarms]})

    return stream.groupBy(key_col).applyInPandasWithState(
        fn, _out_schema(key_col), _STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)
