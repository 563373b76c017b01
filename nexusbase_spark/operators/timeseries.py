"""Per-series time-series analytics the reference has no equivalent of
(SURVEY.md §2.6: engine2's only windows are tumbling downsamples) but that
any TSDB replacement is expected to answer: rolling aggregates, counter
rates, and gap filling.

All three are single-window formulations — Catalyst plans ONE exchange on
the series key and a sort within partitions; no self-joins, no explode:

- rolling_agg: RANGE-framed window (last `width_ns` of time, not N rows),
  so irregular sampling is handled exactly like PromQL's `X_over_time`.
- series_delta: lag-based per-point delta + rate with counter-reset
  handling (a decrease means the counter restarted; the increase since
  the previous point is then the raw value, matching Prometheus
  `increase` semantics).
- fill_forward (LOCF): last non-null observation carried forward via
  `last(ignorenulls)` over an unbounded-preceding frame — the classic
  gap-fill that downsample(emit_empty) leaves as NaN holes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nexusbase_spark.functions.fidelity import qcol

_AGGS = {
    "avg": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": F.count,
}

# Measured one-series-per-row bound for the sequential-fold operators
# (SCALE.md round-5, 16g heap): ~4M points/series comfortable, ~10x
# slower at 16M (a ~400MB row), OOM between 16M and 64M. The guard
# default sits at the comfortable edge; callers with bigger executors
# raise it explicitly, callers who have pre-bounded their series pass
# None to skip the check entirely.
SERIES_FOLD_MAX_POINTS = 4_000_000


def _guard_series_fold(df: DataFrame, keys: list[str], op_name: str,
                       max_points: int | None) -> None:
    """Refuse to build a per-series fold whose longest series exceeds
    the measured memory bound, instead of letting collect_list (or a
    whole-series window buffer) OOM an executor mid-job at scale
    (VERDICT r5 #6). Costs one wordcount-shaped count job over the
    series keys — cheap next to the fold itself, and skippable with
    ``max_points_per_series=None``. ``df`` must already be the
    null-filtered frame so the bound counts exactly the folded points."""
    if max_points is None:
        return
    longest = (df.groupBy(*keys)
               .agg(F.count(F.lit(1)).alias("__n"))
               .agg(F.max("__n").alias("__mx"))
               .collect()[0]["__mx"])
    if longest is not None and longest > max_points:
        raise ValueError(
            f"{op_name}: longest series has {longest:,} points, above the "
            f"max_points_per_series bound of {max_points:,} (measured OOM "
            f"risk for one-row-per-series folds — SCALE.md round-5). "
            f"Downsample the series first (operators/downsample at e.g. "
            f"minute grain preserves the level/trend semantics), raise "
            f"max_points_per_series if your executors have the heap for "
            f"~100 bytes/point rows, or pass max_points_per_series=None "
            f"to skip this check.")


def rolling_agg(df: DataFrame, keys: list[str], width_ns: int,
                funcs: dict[str, str], ts_col: str = "ts") -> DataFrame:
    """Add rolling-window aggregate columns over the trailing `width_ns`
    (inclusive) of each key's timeline.

    `funcs` maps output column -> agg name (avg/sum/min/max/count of the
    named input, e.g. {"avg_1h": "avg:value"}). RANGE frame on the int64
    ns timestamp: irregular series roll by TIME, not by row count.
    """
    w = (Window.partitionBy(*keys).orderBy(F.col(ts_col).cast("long"))
         .rangeBetween(-width_ns, 0))
    out = df
    for name, spec in funcs.items():
        agg, col = spec.split(":", 1)
        out = out.withColumn(name, _AGGS[agg](F.col(col)).over(w))
    return out


def fill_linear(df: DataFrame, keys: list[str], col: str,
                ts_col: str = "ts") -> DataFrame:
    """Linear interpolation of NULL gaps along each key's timeline.

    Interior gaps get the time-weighted blend of the surrounding non-null
    observations: v = pv + (nv - pv) * (ts - pt) / (nt - pt). Leading and
    trailing edges (no observation on one side) stay NULL — extrapolation
    is a policy choice left to the caller (chain fill_forward for LOCF
    tails).

    Scale shape: both the backward (last non-null) and forward (first
    non-null) lookups are window functions over the SAME partitioning and
    ordering, so Catalyst plans one exchange on the key and one sort —
    no self-join against the non-null subset, which is the naive
    formulation and shuffles twice.
    """
    ts = F.col(ts_col).cast("long")
    wp = (Window.partitionBy(*keys).orderBy(ts)
          .rowsBetween(Window.unboundedPreceding, 0))
    wf = (Window.partitionBy(*keys).orderBy(ts)
          .rowsBetween(0, Window.unboundedFollowing))
    # qcol: `col` may carry a dot (p99.9_lat) — exact-name resolution
    obs_ts = F.when(qcol(col).isNotNull(), ts)
    pv = F.last(qcol(col), ignorenulls=True).over(wp)
    pt = F.last(obs_ts, ignorenulls=True).over(wp)
    nv = F.first(qcol(col), ignorenulls=True).over(wf)
    nt = F.first(obs_ts, ignorenulls=True).over(wf)
    interp = pv + (nv - pv) * (ts - pt) / (nt - pt)
    filled = (F.when(qcol(col).isNotNull(), qcol(col))
              .when(pv.isNotNull() & nv.isNotNull() & (nt > pt), interp))
    return df.withColumn(col, filled)


def zscore_flag(df: DataFrame, keys: list[str], value_col: str = "value",
                threshold: float = 3.0) -> DataFrame:
    """Per-series z-score + outlier flag against the series' own
    distribution — the batch analog of the reference's outlier-detector
    hook (hooks/listeners/outlier_detector.go:19-100, which flags points
    against static per-metric min/max rules at ingest; here the rule is
    learned from the data: |x - mean| > threshold * stddev).

    One whole-partition window per key (mean + sample stddev share the
    exchange and the sort); z is NULL when the series has <2 points or
    zero variance, so constant series never alert.
    """
    w = Window.partitionBy(*keys)
    mu = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    z = F.when(sd > 0, (F.col(value_col) - mu) / sd)
    return (df.withColumn("zscore", z)
            .withColumn("is_outlier",
                        F.coalesce(F.abs(z) > F.lit(threshold), F.lit(False))))


def robust_zscore_flag(df: DataFrame, keys: list[str],
                       value_col: str = "value",
                       threshold: float = 3.5) -> DataFrame:
    """MAD-based modified z-score outliers (Iglewicz-Hoaglin: 0.6745 *
    (x - median) / MAD, flag |z| > 3.5) — the robust companion to
    zscore_flag: a single wild point inflates mean AND stddev enough to
    hide itself from the classic z-score, while median/MAD barely move.

    Both the median and the MAD (median absolute deviation) are
    whole-partition window aggregates over the SAME key partitioning, so
    Catalyst plans one exchange and two stacked window passes — no
    groupBy + join-back, no second scan. Series with MAD 0 (constant or
    half-constant) never flag.
    """
    w = Window.partitionBy(*keys)
    med = F.percentile(F.col(value_col), F.lit(0.5)).over(w)
    out = df.withColumn("__med", med)
    mad = F.percentile(F.abs(F.col(value_col) - F.col("__med")),
                       F.lit(0.5)).over(w)
    out = out.withColumn("__mad", mad)
    rz = F.when(F.col("__mad") > 0,
                0.6745 * (F.col(value_col) - F.col("__med")) / F.col("__mad"))
    return (out.withColumn("robust_z", rz)
            .withColumn("is_outlier",
                        F.coalesce(F.abs(rz) > F.lit(threshold), F.lit(False)))
            .drop("__med", "__mad"))


def series_delta(df: DataFrame, keys: list[str], value_col: str = "value",
                 ts_col: str = "ts", tiebreak: str | None = None,
                 counter_reset: bool = False) -> DataFrame:
    """Per-point delta and per-second rate against the previous point of
    the same series (lag window; first point gets nulls).

    With `counter_reset`, a negative delta is treated as a counter
    restart: the increase is the raw current value (Prometheus
    `increase`/`rate` semantics for monotone counters).
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    prev_v = F.lag(value_col).over(w)
    prev_ts = F.lag(F.col(ts_col).cast("long")).over(w)
    delta = F.col(value_col) - prev_v
    if counter_reset:
        delta = F.when(delta < 0, F.col(value_col)).otherwise(delta)
    gap_s = (F.col(ts_col).cast("long") - prev_ts) / F.lit(1_000_000_000.0)
    rate = F.when(gap_s > 0, delta / gap_s)
    return (df.withColumn("delta", delta)
            .withColumn("rate_per_s", rate))


def fill_forward(df: DataFrame, keys: list[str], cols: list[str],
                 ts_col: str = "ts", is_missing: Column | None = None) -> DataFrame:
    """Last-observation-carried-forward for `cols` along each key's
    timeline. A value counts as missing when NULL (default) or when
    `is_missing(col)` holds (e.g. NaN markers from emit-empty windows —
    pass `F.isnan`); missing leading values stay missing.
    """
    w = (Window.partitionBy(*keys).orderBy(F.col(ts_col).cast("long"))
         .rowsBetween(Window.unboundedPreceding, 0))
    out = df
    for c in cols:
        v = qcol(c)  # c may carry a dot (p99.9_lat) — exact-name resolution
        if is_missing is not None:
            v = F.when(is_missing(qcol(c)), F.lit(None)).otherwise(qcol(c))
        out = out.withColumn(c, F.last(v, ignorenulls=True).over(w))
    return out


def ewma_level(df: DataFrame, keys: list[str], alpha: float,
               value_col: str = "value",
               order_cols: tuple[str, str] = ("ts", "seq"),
               max_points_per_series: int | None = SERIES_FOLD_MAX_POINTS,
               ) -> DataFrame:
    """Per-series exponentially weighted level: fold
    ``ewma = alpha*x + (1-alpha)*ewma`` over the series in
    (ts, seq) order, seeded with the first value — the smoothed "current
    level" a monitoring dashboard tracks (and the sequential recurrence
    a plain window can't express).

    Whole-stage-codegen shape: one shuffle (the groupBy), the ordered
    fold as ``sort_array(collect_list(struct(...)))`` + ``F.aggregate``
    with a double accumulator — JVM-side, no UDF, deterministic because
    the struct sort fixes the fold order regardless of shuffle
    nondeterminism. One series' points must fit a row (same bound as any
    per-series collect). Measured (SCALE.md round-5, 16g heap): fine
    through ~4M points/series, ~10x slower at 16M (a ~400MB row), OOM
    between 16M and 64M — route longer series through the minute-grain
    downsample rollup first (flat ~1s across the whole range, and the
    right semantics for them anyway).

    Output: keys..., n (points folded), ewma (double). Series whose
    values are ALL NULL (and series with no rows) are omitted from the
    output entirely — the NULL pre-filter below drops their rows before
    the groupBy, so no n=0/NaN placeholder row is emitted (ADVICE r4
    docstring correction; the previous contract claimed NaN-for-empty).
    """
    o1, o2 = order_cols
    # NULL values are dropped BEFORE the fold: collect_list of a struct
    # keeps rows whose value field is null, so one null would null the
    # whole EWMA while n counted only non-null points (ADVICE r3). With
    # the filter, n matches exactly the points folded.
    df = df.filter(F.col(value_col).isNotNull())
    _guard_series_fold(df, keys, "ewma_level", max_points_per_series)
    ordered = F.sort_array(F.collect_list(
        F.struct(F.col(o1), F.col(o2), F.col(value_col).alias("v"))))
    g = df.groupBy(*keys).agg(ordered.alias("__pts"),
                              F.count(F.col(value_col)).alias("n"))
    rest = F.slice(F.col("__pts"), 2,
                   F.greatest(F.size(F.col("__pts")) - 1, F.lit(0)))
    ew = F.aggregate(
        rest,
        F.element_at(F.col("__pts"), 1)["v"].cast("double"),
        lambda acc, x: F.lit(alpha) * x["v"] + F.lit(1.0 - alpha) * acc)
    return g.select(*keys, "n", ew.alias("ewma"))


def seasonal_count_outliers(df, keys: list[str], ts_col: str = "ts",
                            interval_ns: int = 3_600_000_000_000,
                            season: int = 24,
                            threshold: float = 2.0):
    """Seasonal-profile anomaly detection on event VOLUME: bucket events
    into ``interval_ns`` windows, learn a per-(keys, phase) baseline
    (phase = bucket mod ``season`` — hour-of-day for hourly buckets),
    and flag buckets whose count deviates more than ``threshold`` sample
    standard deviations from their phase's mean. The volume-seasonality
    companion of ``zscore_flag`` (value outliers): a traffic drop at
    14:00 is an anomaly against other days' 14:00s, not against 03:00.

    Output: keys..., bucket (window index), cnt, mu, z — alert-sized.
    Only OBSERVED buckets participate (an entirely-empty bucket emits no
    row and doesn't depress the baseline; grid-fill upstream via the
    downsampler's EMIT EMPTY WINDOWS when zero-count hours must alarm).

    Plan: one count aggregation to bucket granularity, then mean/stddev
    as window functions over (keys, phase) — two exchanges, both over
    bucket-count rows (one row per key-bucket, corpus size already
    reduced away). Deterministic; z floor-quantized to 1e-4.
    """
    from pyspark.sql import Window

    bucket = F.floor(F.col(ts_col).cast("long") / F.lit(int(interval_ns)))
    hourly = (df.groupBy(*keys, bucket.alias("bucket"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    w = Window.partitionBy(*keys, F.pmod(F.col("bucket"), F.lit(season)))
    out = (hourly
           .withColumn("mu", F.avg("cnt").over(w))
           .withColumn("__sigma", F.stddev_samp(F.col("cnt").cast("double")).over(w))
           .filter(F.col("__sigma") > 0)
           .withColumn("z", F.floor((F.col("cnt") - F.col("mu"))
                                    / F.col("__sigma") * 1e4 + F.lit(0.5)) / 1e4)
           .filter(F.abs(F.col("z")) > threshold))
    return out.select(*keys, "bucket", F.col("cnt").cast("long").alias("cnt"),
                      F.round("mu", 4).alias("mu"), "z")


def cusum_changepoints(df: DataFrame, keys: list[str],
                       value_col: str = "value",
                       order_cols: tuple[str, str] = ("ts", "seq"),
                       slack: float = 0.5,
                       threshold: float = 4.0) -> DataFrame:
    """Two-sided CUSUM level-shift detection per series (Page 1954).

    The textbook statistic is a sequential recursion
    ``S+_t = max(0, S+_{t-1} + (x_t - mu - k))`` — but it has an exact
    closed form as a WINDOW expression: with prefix sums
    ``P_t = sum_{i<=t}(x_i - mu - k)``, ``S+_t = P_t - min(0, min_{j<=t} P_j)``
    (and symmetrically for the downward side). So no sequential fold, no
    collect_list, no UDF: one exchange on the series key, a within-
    partition sort, and two running-frame window aggregates — the same
    physical plan as any ranked window, scale-safe for billion-point
    series because nothing materializes a series in one row (unlike the
    EWMA fold above, which documents that bound).

    mu (per-series level) and sigma are learned over the whole series and
    floor-quantized to 1e-6 BEFORE the prefix sums so both engines fold
    bit-identical operands in the deterministic (ts, seq) frame order;
    slack k = slack*sigma, decision threshold h = threshold*sigma. The
    statistic does NOT reset after an alarm (the no-reset CUSUM curve);
    emitted rows are those beyond h — alert-sized output.

    Output: keys..., ts, seq, value, s_pos, s_neg (4dp), direction.
    """
    o1, o2 = order_cols
    wp = Window.partitionBy(*keys)
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    df = (df.filter(F.col(value_col).isNotNull())
          .withColumn("__mu", q6(F.avg(value_col).over(wp)))
          .withColumn("__sigma",
                      q6(F.stddev_samp(F.col(value_col).cast("double")).over(wp)))
          .filter(F.col("__sigma") > 0))
    k = F.col("__sigma") * slack
    h = F.col("__sigma") * threshold
    wr = (Window.partitionBy(*keys).orderBy(o1, o2)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    p = F.sum(F.col(value_col) - F.col("__mu") - k).over(wr)
    q = F.sum(F.col("__mu") - F.col(value_col) - k).over(wr)
    df = (df.withColumn("__p", p).withColumn("__q", q)
          .withColumn("__sp", F.col("__p") - F.least(F.min("__p").over(wr), F.lit(0.0)))
          .withColumn("__sn", F.col("__q") - F.least(F.min("__q").over(wr), F.lit(0.0))))
    q4 = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    return (df.filter((F.col("__sp") > h) | (F.col("__sn") > h))
            .select(*keys, o1, o2, F.col(value_col).alias("value"),
                    q4(F.col("__sp")).alias("s_pos"),
                    q4(F.col("__sn")).alias("s_neg"),
                    F.when(F.col("__sp") > h, F.lit("up"))
                     .otherwise(F.lit("down")).alias("direction")))


def acf_lags(df: DataFrame, keys: list[str], max_lag: int = 3,
             value_col: str = "value", ts_col: str = "ts",
             seq_col: str = "seq",
             max_points_per_series: int | None = SERIES_FOLD_MAX_POINTS,
             ) -> DataFrame:
    """Per-series autocorrelation function at lags 1..max_lag — the
    seasonality/persistence fingerprint (an AR(1) process shows
    geometrically decaying r_k; a periodic series spikes at its period).

    Classical biased estimator (statsmodels/Box-Jenkins default):

        r_k = sum_{t>k} (x_t - mu)(x_{t-k} - mu) / sum_t (x_t - mu)^2

    with mu the FULL-series mean — a plain ratio of sums, reproducible
    on any engine, unlike corr() whose one-pass covariance accumulates
    engine-specific float error.

    One exchange total: the series mean comes from a whole-partition
    window, all max_lag lag() columns share the same (keys, ts, seq)
    sort, and the final per-series groupBy folds the products — no
    self-joins, no per-lag re-shuffles. Per-series math, so at 100 TB
    this scales with the number of series exactly like the other
    per-series operators. Output floor-quantized to 1e-4; series with
    zero variance (or fewer than 2 points) emit NULL r_k.
    """
    o1, o2 = F.col(ts_col).asc(), F.col(seq_col).asc()
    wp = Window.partitionBy(*keys)
    wo = Window.partitionBy(*keys).orderBy(o1, o2)
    # null values leave the series BEFORE lagging: a null row would
    # still occupy a lag position, silently turning r_k into "r_k over
    # observation slots" instead of over the observed series
    df = df.filter(F.col(value_col).isNotNull())
    # the whole-partition mean window buffers one series per task like
    # the collect_list folds do — same bound, same guard
    _guard_series_fold(df, keys, "acf_lags", max_points_per_series)
    v = F.col(value_col).cast("double")
    df = (df.withColumn("__mu", F.avg(v).over(wp))
          .withColumn("__c", v - F.col("__mu")))
    for k in range(1, max_lag + 1):
        df = df.withColumn(f"__l{k}", F.lag("__c", k).over(wo))
    q4 = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    den = F.sum(F.col("__c") * F.col("__c"))
    return (df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n_pts"),
                 den.alias("__den"),
                 *[F.sum(F.col("__c") * F.col(f"__l{k}")).alias(f"__num{k}")
                   for k in range(1, max_lag + 1)])
            .select(*keys, "n_pts",
                    *[q4(F.when(F.col("__den") > 0,
                                F.col(f"__num{k}") / F.col("__den")))
                      .alias(f"r{k}") for k in range(1, max_lag + 1)]))


def series_linreg(df: DataFrame, keys: list[str],
                  value_col: str = "value", ts_col: str = "ts") -> DataFrame:
    """Per-series ordinary-least-squares trend: slope/intercept/r2 of
    value over time — the deg-1 trend fit behind capacity forecasting
    and drift triage (slope units: value per day).

    Closed-form raw-moment sums (n, Σx, Σy, Σxy, Σx², Σy²) folded in ONE
    map-side-combinable groupBy — no windows, no second pass. This is
    the textbook distributed-OLS shape: at 100 TB it is exactly one
    aggregation. (Raw epoch-day x values leave ~9 significant digits
    after the nΣx²-(Σx)² cancellation at a 30-day span — documented
    headroom, fine in double; re-anchor x if series ever span decades.)

    slope = (nΣxy - ΣxΣy) / (nΣx² - (Σx)²); r² = explained/total with
    NULL when x or y variance is zero (vertical/constant series).
    Output floor-quantized to 1e-4; n_pts kept for confidence gating.
    """
    # drop null observations so n counts exactly the fitted points
    df = df.filter(F.col(value_col).isNotNull())
    day = F.col(ts_col).cast("double") / F.lit(86400.0 * 1e9)
    y = F.col(value_col).cast("double")
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(day).alias("sx"), F.sum(y).alias("sy"),
        F.sum(day * y).alias("sxy"),
        F.sum(day * day).alias("sxx"), F.sum(y * y).alias("syy"))
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = F.when(vx > 0, cov / vx)
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    r2 = F.when((vx > 0) & (vy > 0), (cov * cov) / (vx * vy))
    q4 = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    return agg.select(*keys, F.col("n").cast("long").alias("n_pts"),
                      q4(slope).alias("slope"),
                      q4(intercept).alias("intercept"),
                      q4(r2).alias("r2"))


def holt_linear(df: DataFrame, keys: list[str], alpha: float, beta: float,
                value_col: str = "value",
                order_cols: tuple[str, str] = ("ts", "seq"),
                horizon: int = 3,
                max_points_per_series: int | None = SERIES_FOLD_MAX_POINTS,
                ) -> DataFrame:
    """Per-series Holt double exponential smoothing (level + trend):

        l_t = alpha*x_t + (1-alpha)(l_{t-1} + b_{t-1})
        b_t = beta*(l_t - l_{t-1}) + (1-beta) b_{t-1}

    seeded l_1 = x_1, b_1 = x_2 - x_1 (series with fewer than 2 points
    are dropped) — the trend-aware upgrade of ``ewma_level`` and the
    h-step forecaster behind capacity alerts: forecast = l_n + h*b_n.

    Same sequential-fold shape as ewma_level (one shuffle; ordered
    struct-list fold, JVM-side, no UDF — and the same measured
    one-series-per-row bound: ~4M points/series comfortable, OOM by
    64M at 16g heap; see SCALE.md round-5) with a STRUCT accumulator
    carrying (l, b). Sequential folds have no summation-order freedom,
    so given identical inputs both engines produce bit-identical doubles
    step by step; the DuckDB oracle steps the same recurrence with a
    recursive CTE (its list_reduce accumulator is scalar-only).

    Output: keys..., n, level, trend, forecast (all floor-quantized to
    1e-4 by the CALLER if hash-gated; raw doubles here).
    """
    o1, o2 = order_cols
    df = df.filter(F.col(value_col).isNotNull())
    _guard_series_fold(df, keys, "holt_linear", max_points_per_series)
    ordered = F.sort_array(F.collect_list(
        F.struct(F.col(o1), F.col(o2), F.col(value_col).alias("v"))))
    g = (df.groupBy(*keys)
         .agg(ordered.alias("__pts"), F.count(F.col(value_col)).alias("n"))
         .filter(F.col("n") >= 2))
    xs = F.transform(F.col("__pts"), lambda p: p["v"].cast("double"))
    g = g.withColumn("__x", xs)
    x1 = F.element_at(F.col("__x"), 1)
    x2 = F.element_at(F.col("__x"), 2)
    rest = F.slice(F.col("__x"), 2, F.size(F.col("__x")) - 1)
    a, ia = F.lit(alpha), F.lit(1.0 - alpha)
    bt, ib = F.lit(beta), F.lit(1.0 - beta)

    def step(acc, xv):
        lnew = a * xv + ia * (acc["l"] + acc["b"])
        return F.struct(
            lnew.alias("l"),
            (bt * (lnew - acc["l"]) + ib * acc["b"]).alias("b"))

    st = F.aggregate(
        rest,
        F.struct(x1.alias("l"), (x2 - x1).alias("b")),
        step)
    return g.select(*keys, "n", st["l"].alias("level"),
                    st["b"].alias("trend"),
                    (st["l"] + F.lit(float(horizon)) * st["b"])
                    .alias("forecast"))


def seasonal_decompose(df: DataFrame, keys: list[str], ts_col: str = "ts",
                       interval_ns: int = 3_600_000_000_000,
                       period: int = 24, half: int = 12,
                       value_col: str | None = None) -> DataFrame:
    """Classical additive seasonal decomposition of per-series volume
    (or mean value): y(slot) = trend + seasonal + residual — the STL-
    shaped triage view separating "traffic is growing" from "it is 3am"
    from "something actually happened".

    - slot grain: ``interval_ns`` buckets (default hourly); y = count of
      points (or avg of ``value_col``);
    - trend: centered moving average over a RANGE frame of +-``half``
      slots (time-based, so missing slots shrink the window instead of
      silently widening it);
    - seasonal: per-phase (slot mod ``period``) mean of the detrended
      series — phase means over the whole span, the classical estimator;
    - residual: what neither explains.

    One slot-grain rollup then two window passes over slot-count-sized
    data (hours, not points) — the decomposition costs the same as the
    seasonal_count_outliers baseline regardless of input scale.

    Determinism (count mode): every quantity here is an exact rational —
    y integer, trend = S/c with window-sum S and window-count
    c <= 2*half+1 — and phase means of such rationals land exactly ON
    1e-4 quantization boundaries (bit us: seasonal 1.21825 straddled).
    So the whole decomposition runs on the integer lattice
    d = (y*c - S) * (L/c) with L = lcm(1..2*half+1): seasonal =
    sum(d)/(L*m), residual = (d*m - sum(d))/(L*m) — single float
    divisions of exact int64s, bit-identical on any engine (the
    PageRank lesson, pipeline/graph.py). ``value_col`` mode (float
    inputs) falls back to plain floor quantization without the exactness
    guarantee.
    """
    import math as _math

    slot = F.floor(F.col(ts_col).cast("double") / interval_ns).cast("long")
    wt = (Window.partitionBy(*keys).orderBy("slot")
          .rangeBetween(-half, half))
    wp = Window.partitionBy(*keys, F.pmod(F.col("slot"), F.lit(period)))
    q4 = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    if value_col:
        hc = (df.groupBy(*keys, slot.alias("slot"))
              .agg(F.avg(F.col(value_col).cast("double")).alias("y")))
        hc = (hc.withColumn("trend", F.avg("y").over(wt))
              .withColumn("__detr", F.col("y") - F.col("trend")))
        hc = hc.withColumn("__seas", F.avg("__detr").over(wp))
        return hc.select(
            *keys, "slot", F.col("y"),
            q4(F.col("trend")).alias("trend"),
            q4(F.col("__seas")).alias("seasonal"),
            q4(F.col("__detr") - F.col("__seas")).alias("residual"))
    lcm = _math.lcm(*range(1, 2 * half + 2))
    hc = (df.groupBy(*keys, slot.alias("slot"))
          .agg(F.count(F.lit(1)).alias("y")))
    hc = (hc.withColumn("__s", F.sum("y").over(wt))
          .withColumn("__c", F.count(F.lit(1)).over(wt)))
    d = (F.col("y") * F.col("__c") - F.col("__s")) \
        * F.floor(F.lit(lcm) / F.col("__c")).cast("long")
    hc = (hc.withColumn("__d", d)
          .withColumn("__m", F.count(F.lit(1)).over(wp))
          .withColumn("__sd", F.sum("__d").over(wp)))
    seas = F.col("__sd") / (F.lit(float(lcm)) * F.col("__m"))
    resid = (F.col("__d") * F.col("__m") - F.col("__sd")) \
        / (F.lit(float(lcm)) * F.col("__m"))
    return hc.select(
        *keys, "slot", F.col("y").cast("double").alias("y"),
        q4(F.col("__s") / F.col("__c")).alias("trend"),
        q4(seas).alias("seasonal"),
        q4(resid).alias("residual"))


def holt_backtest(df: DataFrame, keys: list[str], alpha: float, beta: float,
                  value_col: str = "value",
                  order_cols: tuple[str, str] = ("ts", "seq"),
                  max_points_per_series: int | None = SERIES_FOLD_MAX_POINTS,
                  ) -> DataFrame:
    """One-step-ahead BACKTEST of Holt smoothing: walk the series with
    the same recurrence as ``holt_linear`` and, before consuming each
    point x_i (i >= 3), score the standing forecast l+b against it —
    the honest out-of-sample accuracy readout (MAE + RMSE per series)
    that decides whether the capacity forecast can be trusted at all.
    x_2's error is excluded: the seed b_1 = x_2 - x_1 peeks at x_2, so
    its "forecast" is exact by construction and would bias MAE down.

    Same sequential-fold shape and memory bound as holt_linear (struct
    accumulator grows by two error sums and a counter; see SCALE.md
    round-5 for the one-series-per-row bound). Sequential folds have no
    summation-order freedom, so both engines produce bit-identical
    error sums; series with fewer than 3 points are dropped (no scored
    step exists).

    Output: keys..., n, mae, rmse (raw doubles; caller quantizes)."""
    o1, o2 = order_cols
    df = df.filter(F.col(value_col).isNotNull())
    _guard_series_fold(df, keys, "holt_backtest", max_points_per_series)
    ordered = F.sort_array(F.collect_list(
        F.struct(F.col(o1), F.col(o2), F.col(value_col).alias("v"))))
    g = (df.groupBy(*keys)
         .agg(ordered.alias("__pts"), F.count(F.col(value_col)).alias("n"))
         .filter(F.col("n") >= 3))
    xs = F.transform(F.col("__pts"), lambda p: p["v"].cast("double"))
    g = g.withColumn("__x", xs)
    x1 = F.element_at(F.col("__x"), 1)
    x2 = F.element_at(F.col("__x"), 2)
    rest = F.slice(F.col("__x"), 2, F.size(F.col("__x")) - 1)
    a, ia = F.lit(alpha), F.lit(1.0 - alpha)
    bt, ib = F.lit(beta), F.lit(1.0 - beta)

    def step(acc, xv):
        f = acc["l"] + acc["b"]
        e = xv - f
        scored = acc["m"] >= 1
        lnew = a * xv + ia * (acc["l"] + acc["b"])
        return F.struct(
            lnew.alias("l"),
            (bt * (lnew - acc["l"]) + ib * acc["b"]).alias("b"),
            (acc["m"] + 1).alias("m"),
            (acc["sae"] + F.when(scored, F.abs(e)).otherwise(0.0))
            .alias("sae"),
            (acc["sse"] + F.when(scored, e * e).otherwise(0.0))
            .alias("sse"))

    st = F.aggregate(
        rest,
        F.struct(x1.alias("l"), (x2 - x1).alias("b"),
                 F.lit(0).alias("m"), F.lit(0.0).alias("sae"),
                 F.lit(0.0).alias("sse")),
        step)
    n_eval = (F.col("n") - 2).cast("double")
    return g.select(*keys, "n",
                    (st["sae"] / n_eval).alias("mae"),
                    F.sqrt(st["sse"] / n_eval).alias("rmse"))
