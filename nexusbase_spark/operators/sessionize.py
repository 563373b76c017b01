"""Session windows: group consecutive points of a key into sessions split
by an inactivity gap. Absent from the reference (its only window is the
epoch-aligned tumbling downsample, SURVEY.md §2.5b/§2.10 "Sliding / session
windows: none") but table stakes for behavioral / training-data pipelines.

Formulated with window functions (lag -> boundary flag -> running sum) so
the session NUMBER lands on every row: one shuffle on the keys, sort
within partition — the same plan shape a 1000-executor cluster wants, and
expressible 1:1 in ANSI SQL for the DuckDB oracle. (Spark also has a
native `F.session_window` groupBy helper; this row-level form is strictly
more general — the id column composes with arbitrary downstream ops.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    keys: list[str],
    gap_ns: int,
    ts: str = "ts",
    tiebreak: str | None = "seq",
    out_col: str = "session",
) -> DataFrame:
    """Attach a per-key session number (1-based, in time order) to every
    row. A new session starts at the first row of a key and whenever
    ``ts - previous ts > gap_ns`` (strictly greater: a gap of exactly
    ``gap_ns`` still belongs to the running session).
    """
    order: list[Column] = [F.col(ts).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(F.col(ts)).over(w)
    boundary = F.when(prev.isNull() | (F.col(ts) - prev > gap_ns), 1).otherwise(0)
    run = Window.partitionBy(*keys).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out_col, F.sum(boundary).over(run).cast("long"))


def session_paths(df: DataFrame, keys: list[str], gap_ns: int,
                  type_col: str = "metric", ts: str = "ts",
                  tiebreak: str = "seq", max_len: int = 8) -> DataFrame:
    """Session path mining: the ordered event-type sequence of each
    session (first ``max_len`` steps), rolled up to path frequencies —
    the "what do users actually do" histogram behind funnel design.

    One sessionize window + one per-session fold + one wordcount-shaped
    path rollup. The fold holds one SESSION per row (sessions are
    gap-bounded and capped at max_len for the path), so the
    one-series-per-row bound of the long-series folds never applies.

    Output: (path — '>'-joined types, n_sessions), unordered; callers
    add their own top-k.
    """
    s = sessionize(df, keys, gap_ns, ts=ts, tiebreak=tiebreak)
    ordered = F.sort_array(F.collect_list(
        F.struct(F.col(ts), F.col(tiebreak),
                 F.col(type_col).alias("t"))))
    per = s.groupBy(*keys, "session").agg(ordered.alias("__e"))
    path = F.array_join(
        F.slice(F.transform(F.col("__e"), lambda e: e["t"]),
                1, max_len), ">")
    return (per.select(path.alias("path"))
            .groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions")))
