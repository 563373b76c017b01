"""Time-series joins the reference lacks entirely (SURVEY.md §2.4: "no join
operator of any kind") but that any engine replacing it at warehouse scale
needs: as-of join (enrich each point with the most recent point of another
series) and banded range join (temporal-proximity pairing).

Both are implemented as compositions of existing DataFrame ops — no UDFs,
no cross joins:

- asof_join: union the two sides and run one `last(..., ignorenulls)`
  window over (keys, ts). ONE shuffle on the join keys, sort within
  partition; cost scales with rows, never rows x rows. This is the classic
  merge-join formulation of as-of, expressed declaratively so Catalyst
  plans the exchange + sort.
- range_band_join: bucket both sides by the window width; a right row in
  bucket b can only match left rows in buckets {b-1, b}, so exploding the
  right side into two bucket tags turns the inequality join into an
  equi-join on (keys, bucket) + a residual filter. Standard banding
  strategy; shuffle volume is 2x right + 1x left, never a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_ATS = "__asof_ts"
_MTS = "__asof_match_ts"
_TIE = "__asof_tie"
_BAND = "__band"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    tolerance_ns: int | None = None,
    direction: str = "backward",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row gains the payload of the nearest
    right row with the same keys and right_ts <= left_ts (backward; ties
    inclusive) or right_ts >= left_ts (forward).

    Output = all left columns + `<payload><suffix>` columns + `<right_ts><suffix>`
    (the matched right timestamp; null when no match / outside tolerance).

    `right_tiebreak`: column ordering right rows that share (keys, ts) —
    the greatest wins (e.g. seq for MVCC last-write-wins). Without it,
    equal-ts right rows are picked arbitrarily; pre-dedup or pass it.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(on) | {right_ts}]
    payload = {c: c + suffix for c in right_cols}
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    left_rest = [c for c in left.columns if c not in on]

    lhs = left.select(
        *on,
        F.col(left_ts).cast("long").alias(_ATS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast("long").alias(_TIE),
        *[F.col(c) for c in left_rest],
        *[F.lit(None).cast(rtypes[c]).alias(a) for c, a in payload.items()],
    )
    rhs = right.select(
        *on,
        F.col(right_ts).cast("long").alias(_ATS),
        F.lit(0).alias(_SIDE),
        (F.col(right_tiebreak).cast("long") if right_tiebreak else F.lit(0).cast("long")).alias(_TIE),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left_rest],
        *[F.col(c).alias(a) for c, a in payload.items()],
    )
    u = lhs.unionByName(rhs)
    return _asof_finish(u, on, left_rest, payload, right_ts, suffix,
                        tolerance_ns, direction)


def _asof_finish(
    u: DataFrame,
    on: list[str],
    left_rest: list[str],
    payload: dict[str, str],
    right_ts: str,
    suffix: str,
    tolerance_ns: int | None,
    direction: str,
) -> DataFrame:
    """The windowing half of the as-of join, over the merged frame ``u``
    carrying ``_ATS``/``_SIDE``/``_TIE`` plus left columns (null on right
    rows) and aliased payload columns (null on left rows)."""
    # At equal ts the right row must sort BEFORE the left row so the
    # running last() includes it (inclusive match), and among equal-ts
    # right rows the greatest tiebreak sorts last (wins). Forward flips
    # the ts ordering, making "running last" mean "nearest following".
    if direction == "backward":
        order = [F.col(_ATS).asc(), F.col(_SIDE).asc(), F.col(_TIE).asc()]
    else:
        order = [F.col(_ATS).desc(), F.col(_SIDE).asc(), F.col(_TIE).asc()]
    w = Window.partitionBy(*on).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)

    matched_ts = F.last(F.when(F.col(_SIDE) == 0, F.col(_ATS)), ignorenulls=True).over(w)
    u = u.withColumn(_MTS, matched_ts)
    for _, a in payload.items():
        u = u.withColumn(a, F.last(F.col(a), ignorenulls=True).over(w))

    out = u.filter(F.col(_SIDE) == 1)
    if tolerance_ns is not None:
        gap = (F.col(_ATS) - F.col(_MTS)) if direction == "backward" else (F.col(_MTS) - F.col(_ATS))
        keep = F.col(_MTS).isNotNull() & (gap <= tolerance_ns)
        for _, a in payload.items():
            out = out.withColumn(a, F.when(keep, F.col(a)))
        out = out.withColumn(_MTS, F.when(keep, F.col(_MTS)))
    return out.select(
        *on, *left_rest,
        F.col(_MTS).alias(right_ts + suffix),
        *[F.col(a) for a in payload.values()],
    )


def asof_join_tagged(
    src: DataFrame,
    is_left,
    on: list[str],
    ts: str = "ts",
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    tolerance_ns: int | None = None,
    direction: str = "backward",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """``asof_join(src.filter(is_left), src.filter(~is_left), ...)`` in
    ONE scan of ``src`` (guide: remove shuffles/passes outright — the
    union-of-two-filters form plans two full scans of the same table,
    which Catalyst cannot merge; at warehouse scale that doubles the
    dominant input cost).

    ``src`` must already be restricted to rows belonging to either side;
    ``is_left`` (a boolean Column) tags the left rows. ``left_cols`` are
    the non-key left columns carried to the output (read from left rows
    only), ``right_cols`` the payload columns (read from right rows only,
    emitted as ``<col><suffix>``). Row-for-row identical to the two-sided
    form: every CASE below mirrors the lhs/rhs projections of
    ``asof_join`` exactly (null of the same type on the opposite side).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if left_cols is None or right_cols is None:
        raise ValueError("asof_join_tagged needs explicit left_cols/right_cols")
    payload = {c: c + suffix for c in right_cols}
    tie = (F.col(right_tiebreak).cast("long") if right_tiebreak
           else F.lit(0).cast("long"))
    u = src.select(
        *on,
        F.col(ts).cast("long").alias(_ATS),
        # NULL is_left must DROP the row, not alias it to the right side:
        # a phantom right row (null payload, null tie) would still win the
        # as-of match and blank out ts_<suffix> for later left rows.
        F.when(is_left, F.lit(1)).when(~is_left, F.lit(0)).alias(_SIDE),
        F.when(~is_left, tie).alias(_TIE),
        *[F.when(is_left, F.col(c)).alias(c) for c in left_cols],
        *[F.when(~is_left, F.col(c)).alias(a) for c, a in payload.items()],
    ).where(F.col(_SIDE).isNotNull())
    return _asof_finish(u, on, left_cols, payload, ts, suffix,
                        tolerance_ns, direction)


def range_band_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    window_ns: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_r",
) -> DataFrame:
    """Inner join of pairs with equal keys and
    ``left_ts <= right_ts <= left_ts + window_ns``.

    floor(right_ts / window) is either floor(left_ts / window) or that + 1,
    so tagging the right side with both candidate buckets makes the match
    an equi-join on (keys, bucket); the exact inequalities are applied as a
    residual filter after the hash join. Each pair matches in exactly one
    bucket (a right row's own bucket is unique), so no dedup is needed.
    """
    if window_ns <= 0:
        raise ValueError("window_ns must be positive")
    rcols = [c for c in right.columns if c not in on]
    clash = set(rcols) & set(left.columns)
    r = right.select(*on, *[F.col(c).alias(c + suffix if c in clash else c) for c in rcols])
    rts = right_ts + suffix if right_ts in clash else right_ts

    lb = F.floor(F.col(left_ts).cast("long") / F.lit(window_ns))
    rb = F.floor(F.col(rts).cast("long") / F.lit(window_ns))
    lhs = left.withColumn(_BAND, lb)
    rhs = r.withColumn(_BAND, F.explode(F.array(rb, rb - 1)))
    cond = (F.col(rts) >= F.col(left_ts)) & (F.col(rts) <= F.col(left_ts) + window_ns)
    return lhs.join(rhs, on + [_BAND]).filter(cond).drop(_BAND)
