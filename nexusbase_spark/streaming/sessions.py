"""Live session windows over the ingest stream: a custom STATEFUL streaming
operator via applyInPandasWithState.

The batch engine computes sessions at query time (operators/sessionize.py);
on a live stream the engine must instead carry the open session of every key
across micro-batches and emit a session only once it is CLOSED (inactivity
gap exceeded or state timeout). That per-key mutable state across batches is
exactly what Spark's applyInPandasWithState provides: state is partitioned
by the grouping key (scales horizontally like any shuffle), checkpointed
with the query, and fed to the function as Arrow batches.

The reference has no stateful streaming at all — its pub/sub pushes raw
points (engine2/pubsub.go); this is the §2.10 "beyond" operator a
training-data/behavioral pipeline needs from the live path.
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
    StructField("session_start", LongType()),
    StructField("last_ts", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])


def _out_schema(key_col: str) -> StructType:
    return StructType([
        StructField(key_col, StringType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ])


def _fold_points(k, rows: pd.DataFrame, start, last, n, s, gap_ns: int):
    """Single-pass session fold over one key's sorted points. Returns
    (closed session rows, open-session tuple)."""
    closed: list[list] = []
    for ts, v in zip(rows["ts"], rows["value"]):
        ts = int(ts)
        v = 0.0 if pd.isna(v) else float(v)
        if start is None:
            start, last, n, s = ts, ts, 1, v
        elif ts - last > gap_ns:
            closed.append([k, start, last, n, s])
            start, last, n, s = ts, ts, 1, v
        else:
            last, n, s = max(last, ts), n + 1, s + v
    return closed, (start, last, n, s)


def live_sessionize(
    stream: DataFrame,
    key_col: str,
    gap_ns: int,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming sessionization of a points stream by inactivity gap.

    Emits one row per CLOSED session: (key, session_start, session_end,
    n_events, sum_value). A session closes when a later point of the same
    key arrives more than ``gap_ns`` after it (strict >, matching the
    batch operator), or when the key sees no data for ``timeout_ms``
    processing time (default: gap_ns scaled to ms) — the flush that makes
    the last session of an idle key eventually appear.

    Rows need columns ``ts`` (long ns) and ``value`` (double). Session
    semantics match operators/sessionize.sessionize exactly on in-order
    data; late cross-batch data is merged into the open session when it
    still fits the gap (a point older than the open session's start is
    counted but cannot reopen closed sessions — documented tradeoff of
    single-pass state).
    """
    if timeout_ms is None:
        timeout_ms = max(gap_ns // 1_000_000, 1)

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        k = key[0]
        cols = [key_col, "session_start", "session_end", "n_events", "sum_value"]
        if state.hasTimedOut:
            start, last, n, s = state.get
            state.remove()
            yield pd.DataFrame([[k, start, last, n, s]], columns=cols)
            return
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        if state.exists:
            start, last, n, s = state.get
        else:
            start = last = None
            n, s = 0, 0.0
        closed, open_sess = _fold_points(k, rows, start, last, n, s, gap_ns)
        state.update(open_sess)
        state.setTimeoutDuration(timeout_ms)
        if closed:
            yield pd.DataFrame(closed, columns=cols)

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        _out_schema(key_col),
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def live_sessionize_tws(
    stream: DataFrame,
    key_col: str,
    gap_ns: int,
    timeout_ms: int | None = None,
) -> DataFrame:
    """`live_sessionize` on the transformWithStateInPandas API (the
    successor of applyInPandasWithState in Spark 4): per-key ValueState
    plus an explicit processing-time TIMER for the idle flush, instead of
    the coarse single timeout. Semantics are identical; the timer model
    additionally guarantees a stale timer can't flush a session that saw
    later activity, because each input batch cancels the key's previous
    timer before arming a new one.

    Requires the RocksDB state-store provider (transformWithState's
    backing store); callers set
    spark.sql.streaming.stateStore.providerClass accordingly. The Python
    worker side additionally needs the `protobuf` package (Spark's state
    server protocol) — absent in this container, so the unit test skips;
    the applyInPandasWithState operator above remains the exercised path
    here and the semantics-bearing fold is shared (_fold_points).
    """
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    if timeout_ms is None:
        timeout_ms = max(gap_ns // 1_000_000, 1)
    out_schema = _out_schema(key_col)
    cols = [key_col, "session_start", "session_end", "n_events", "sum_value"]

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState("open_session", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values: TimerValues):
            k = key[0]
            pdf = pd.concat(list(rows), ignore_index=True).sort_values("ts")
            start, last, n, s = (self._state.get() if self._state.exists()
                                 else (None, None, 0, 0.0))
            closed, open_sess = _fold_points(k, pdf, start, last, n, s, gap_ns)
            self._state.update(open_sess)
            # re-arm the idle-flush timer: cancel any previous one so it
            # can't fire against the now-extended session
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timer_values.getCurrentProcessingTimeInMs() + timeout_ms)
            if closed:
                yield pd.DataFrame(closed, columns=cols)

        def handleExpiredTimer(self, key, timer_values: TimerValues,
                               expired_timer_info: ExpiredTimerInfo):
            if self._state.exists():
                start, last, n, s = self._state.get()
                self._state.clear()
                yield pd.DataFrame([[key[0], start, last, n, s]], columns=cols)

        def close(self) -> None:
            pass

    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=SessionProcessor(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="processingTime",
    )


_PATH_STATE_SCHEMA = StructType([
    StructField("session_start", LongType()),
    StructField("last_ts", LongType()),
    StructField("n_events", LongType()),
    StructField("path", StringType()),
])


def _path_out_schema(key_col: str) -> StructType:
    return StructType([
        StructField(key_col, StringType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
        StructField("path", StringType()),
    ])


def live_session_paths(
    stream: DataFrame,
    key_col: str,
    gap_ns: int,
    type_col: str = "metric",
    max_len: int = 8,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming twin of ``operators/sessionize.session_paths``: one row
    per CLOSED session carrying its ordered event-type path (first
    ``max_len`` steps, '>'-joined) — live funnel-discovery feeding the
    same path-frequency rollup the batch operator computes.

    State per key is (start, last, n, path): O(max_len) bytes no matter
    how long the session runs, the bound that keeps a million-key
    stream's state store flat. Close/flush semantics are identical to
    ``live_sessionize`` (strict > gap; processing-time timeout flushes
    idle keys). Batch parity on in-order data is tested.
    """
    if timeout_ms is None:
        timeout_ms = max(gap_ns // 1_000_000, 1)

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        k = key[0]
        cols = [key_col, "session_start", "session_end", "n_events",
                "path"]
        if state.hasTimedOut:
            start, last, n, path = state.get
            state.remove()
            yield pd.DataFrame([[k, start, last, n, path]], columns=cols)
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        order = ["ts", "seq"] if "seq" in rows.columns else ["ts"]
        rows = rows.sort_values(order)
        if state.exists:
            start, last, n, path = state.get
        else:
            start = last = None
            n, path = 0, ""
        closed: list[list] = []
        for ts, et in zip(rows["ts"], rows[type_col]):
            ts = int(ts)
            et = "" if pd.isna(et) else str(et)
            if start is None:
                start, last, n, path = ts, ts, 1, et
            elif ts - last > gap_ns:
                closed.append([k, start, last, n, path])
                start, last, n, path = ts, ts, 1, et
            else:
                last, n = max(last, ts), n + 1
                if n <= max_len:
                    path = f"{path}>{et}" if path else et
        state.update((start, last, n, path))
        state.setTimeoutDuration(timeout_ms)
        if closed:
            yield pd.DataFrame(closed, columns=cols)

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        _path_out_schema(key_col),
        _PATH_STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
