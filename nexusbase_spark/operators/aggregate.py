"""Final aggregation: the whole query range collapses to ONE row.

Reference: ``iterator/multi_field_aggregator.go:91-344`` — consumes the whole
merged stream, one accumulator per referenced field, and (crucially)
aggregates across ALL matching series combined; the result is keyed by a
synthetic series of the metric with no tags (``engine2/adapter.go:1349-1364``).
Inputs that are NaN/±Inf are skipped (aggregator.go:56-59).

Spark mapping: a global ``agg`` — Catalyst runs it as partial (map-side)
aggregation + a single-partition final reduce, which is exactly the
scalable version of the reference's single-threaded fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexusbase_spark.datamodel import field_columns
from nexusbase_spark.functions.fidelity import AggSpec, build_agg_exprs


def _field_types(df: DataFrame) -> dict[str, str]:
    return {f.name: f.dataType.simpleString() for f in df.schema.fields
            if f.name in field_columns(df)}


def _order_key():
    # global stream order: (timestamp, series_key, seq desc) —
    # iterator/iterator.go:41-63. seq is negated so that an ascending struct
    # comparison puts the HIGHEST seq first among ties, like the heap does.
    return F.struct(F.col("ts"), F.col("series_key"), (-F.col("seq")).alias("nseq"))


def final_aggregate(
    df: DataFrame,
    specs: list[AggSpec],
    *,
    approx_percentile: bool = False,
    keep_metric: bool = False,
) -> DataFrame:
    """One output row over the filtered frame (all series combined)."""
    exprs = build_agg_exprs(
        specs,
        _field_types(df),
        _order_key(),
        skip_non_finite=True,
        approx_percentile=approx_percentile,
    )
    if keep_metric:
        return df.groupBy("metric").agg(*exprs)
    return df.agg(*exprs)
