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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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

    When the frame carries ``__raw_ts`` (the untruncated source column —
    datamodel.events_to_points), redundant WIDENED bounds are added on it:
    the canonical ``ts`` is µs-truncated via arithmetic the optimizer can't
    invert, so a predicate on it never reaches the parquet scan. The raw
    bounds are a strict superset (ts >= s implies raw >= s; ts <= e implies
    raw <= e+999), semantically a no-op — but they ARE pushable, restoring
    row-group min/max pruning (the SSTable min/max-key skip analog,
    SURVEY.md §4).
    """
    out = df
    has_raw = "__raw_ts" in df.columns
    if start is not None:
        out = out.filter(F.col("ts") >= start)
        if has_raw:
            out = out.filter(F.col("__raw_ts") >= start)
    if end is not None:
        out = out.filter(F.col("ts") <= end)
        if has_raw:
            out = out.filter(F.col("__raw_ts") <= end + 999)
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
