"""Access path: metric / tag / time-range filters.

Reference: series resolution via roaring-bitmap tag index AND-intersection
(``indexer/tag_index_manager2.go:247-315``) + per-series LSM key-range scan
(``engine2/adapter.go:2796-2856``). On Spark both collapse into declarative
filters: Catalyst pushes the metric/tag equality and ts range down to the
Parquet scan (row-group min/max pruning is the analog of SSTable min/max-key
skip — SURVEY.md §4). At 100TB the points table is partitioned by metric and
a time bucket, so these filters become partition pruning, not data reads.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPOCH = datetime.datetime(1970, 1, 1)


def _ts_lit(us: int, dtype: str) -> Column:
    """A pushable literal of the raw ts column's own type for a whole-µs
    epoch instant. String-cast literals constant-fold in Catalyst, so the
    comparison stays a plain `col OP literal` the parquet source accepts."""
    s = (_EPOCH + datetime.timedelta(microseconds=us)).strftime("%Y-%m-%d %H:%M:%S.%f")
    return F.lit(s).cast(dtype)


def metric_filter(df: DataFrame, metric: str) -> DataFrame:
    """Exact metric equality (engine2/adapter.go:1146-1153)."""
    return df.filter(F.col("metric") == metric)


def tag_filter(df: DataFrame, tags: dict[str, str]) -> DataFrame:
    """Conjunctive tag equality — ALL k=v must match; the engine has no OR,
    no regex, no != (indexer/tag_index_manager2.go:253-275)."""
    out = df
    for k, v in tags.items():
        out = out.filter(F.col("tags").getItem(k) == v)
    return out


def time_range(df: DataFrame, start: int | None, end: int | None) -> DataFrame:
    """Inclusive BOTH ends: keys scanned in [start, end+1)
    (engine2/adapter.go:2798-2803).

    When the frame carries ``__raw_ts`` (the unmodified source column —
    datamodel.events_to_points), redundant bounds are added on it: the
    canonical ``ts`` is derived via arithmetic the optimizer can't invert,
    so a predicate on it never reaches the parquet scan. The raw bounds are
    equivalent-or-wider in the raw column's own type, semantically a no-op
    — but they ARE pushable, restoring row-group min/max pruning (the
    SSTable min/max-key skip analog, SURVEY.md §4).

    Raw-bound derivation (ts = canonical long ns, truncated to whole µs):
    - long raw (ns):        ts >= s  =>  raw >= s;  ts <= e  =>  raw <= e+999
    - timestamp raw (µs):   ts >= s  =>  raw >= ceil(s/1000) µs;
                            ts <= e  =>  raw <= floor(e/1000) µs  (exact)
    """
    out = df
    raw_type = dict(df.dtypes).get("__raw_ts")
    if start is not None:
        out = out.filter(F.col("ts") >= start)
        if raw_type in ("bigint", "long"):
            out = out.filter(F.col("__raw_ts") >= start)
        elif raw_type is not None:
            out = out.filter(F.col("__raw_ts") >= _ts_lit(-(-start // 1000), raw_type))
    if end is not None:
        out = out.filter(F.col("ts") <= end)
        if raw_type in ("bigint", "long"):
            out = out.filter(F.col("__raw_ts") <= end + 999)
        elif raw_type is not None:
            out = out.filter(F.col("__raw_ts") <= _ts_lit(end // 1000, raw_type))
    return out


def relative_range(df: DataFrame, duration_ns: int, now_ns: int | None = None) -> DataFrame:
    """FROM RELATIVE(dur): End anchors to the data's max ts when that is
    <= clock-now (reference quirk, engine2/adapter.go:1236-1276);
    Start = End - dur. Requires one small max() action over the already
    metric/tag-filtered frame (aggregate pushdown keeps it a stats read).
    """
    row = df.agg(F.max("ts").alias("m")).collect()[0]
    max_ts = row["m"]
    if max_ts is None:
        return df.filter(F.lit(False))
    end = max_ts if (now_ns is None or max_ts <= now_ns) else now_ns
    return time_range(df, end - duration_ns, end)


def get_point(df: DataFrame, metric: str, tags: dict[str, str], ts: int) -> DataFrame:
    """gRPC Get: point lookup at exact (metric, tags, ts)
    (engine2/adapter.go:751-907)."""
    return time_range(tag_filter(metric_filter(df, metric), tags), ts, ts)
