"""Metadata queries: SHOW METRICS / TAG KEYS / TAG VALUES / series lookup.

Reference: ``api/nbql/executor.go:207-234`` defines the statement shapes;
engine2's implementations are STUBS that return empty
(``engine2/adapter.go:1768-1775``) except GetSeriesByTags
(``engine2/adapter.go:1660-1766``). This rebuild implements all of them for
real from the points table (SURVEY.md §7 step 8).

Scale note: these are distinct-aggregations over low-cardinality meta
columns; with the table partitioned by metric, SHOW METRICS is a partition
listing, and tag distincts benefit from partial aggregation. For hot-path
metadata at 100TB, maintain a small `series_catalog` rollup table on ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def show_metrics(df: DataFrame) -> DataFrame:
    return df.select("metric").distinct().orderBy("metric")


def show_tag_keys(df: DataFrame, metric: str | None = None) -> DataFrame:
    out = df if metric is None else df.filter(F.col("metric") == metric)
    return (
        out.select(F.explode(F.map_keys(F.col("tags"))).alias("tag_key"))
        .distinct()
        .orderBy("tag_key")
    )


def show_tag_values(df: DataFrame, key: str, metric: str | None = None) -> DataFrame:
    out = df if metric is None else df.filter(F.col("metric") == metric)
    return (
        out.select(F.col("tags").getItem(key).alias("tag_value"))
        .filter(F.col("tag_value").isNotNull())
        .distinct()
        .orderBy("tag_value")
    )


def series_by_tags(df: DataFrame, metric: str | None = None,
                   tags: dict[str, str] | None = None) -> DataFrame:
    """GetSeriesByTags — distinct series keys matching metric + tag filters
    (engine2/adapter.go:1660-1766)."""
    out = df if metric is None else df.filter(F.col("metric") == metric)
    for k, v in (tags or {}).items():
        out = out.filter(F.col("tags").getItem(k) == v)
    return out.select("series_key").distinct().orderBy("series_key")
