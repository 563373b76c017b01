"""t-digest percentile sketch — strict-parity option for p<N>.

The reference computes every percentile through go-tdigest v4
(iterator/multi_field_aggregator.go:23,81-86: one AddWeighted per numeric
value, Quantile(p/100) at emit). This module reproduces that sketch in
pure Python from the published algorithm (Dunning & Ertl, "Computing
Extremely Accurate Quantiles Using t-Digests"):

- construction: merging-digest sweep — buffered points are sorted and
  greedily merged while the candidate centroid's weight stays within the
  AVL-digest bound 4·W·q·(1-q)/δ (δ = compression, default 100 like
  go-tdigest). Deterministic: no RNG, order-independent after compress.
- quantile: AVL-digest interpolation over centroid mid-ranks with
  index = q·(W-1). With all-singleton centroids (W ≲ 2δ at the median)
  this is EXACTLY linear interpolation between closest ranks — the same
  estimator as Spark's `percentile` and DuckDB's `quantile_cont`, which
  is what pins the reference's golden values (p50 of 1..20 = 10.5, p95 =
  19.05 — iterator/multi_field_aggregator_test.go:176-209) and lets the
  t-digest path share the exact path's DuckDB oracle for small groups.
- mergeable: ``merge`` + ``to_bytes``/``from_bytes`` give the partial-
  aggregation shape; ``tdigest_partition_digests`` builds one KB-sized
  digest per partition with ``mapInPandas`` (Arrow-batched, never
  per-row) so a global percentile never shuffles raw values.

Documented error: for groups larger than ~2δ values the estimate
deviates from the exact percentile with the standard t-digest bound
(relative rank error ~1/δ at the tails, worst near the median); the
exact `percentile` path remains the oracle default.

NOTE: no ``from __future__ import annotations`` here — pandas_udf
resolves the type hints at decoration time and postponed annotations
break that when pandas is aliased (see NOTES_NEXT_ROUND.md gotchas).
"""

import math
import struct

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

DEFAULT_COMPRESSION = 100  # go-tdigest v4 default


class TDigest:
    __slots__ = ("compression", "_centroids", "_buffer", "_count",
                 "_min", "_max")

    def __init__(self, compression: int = DEFAULT_COMPRESSION):
        if compression < 20:
            raise ValueError("compression must be >= 20")
        self.compression = compression
        self._centroids: list = []   # [(mean, weight)] sorted by mean
        self._buffer: list = []
        self._count = 0.0
        self._min = math.inf
        self._max = -math.inf

    # ------------------------------------------------------------ build

    def add(self, x: float, w: float = 1.0) -> None:
        # Non-finite values never enter the digest: go-tdigest's Add
        # rejects NaN, and a +/-Inf centroid would poison every later
        # merge interpolation (inf - inf = NaN). Inf rank-accounting is
        # the caller's job (see tdigest_quantile_agg's piecewise blocks).
        if not math.isfinite(x) or w <= 0:
            return
        self._buffer.append((float(x), float(w)))
        self._count += w
        self._min = min(self._min, x)
        self._max = max(self._max, x)
        if len(self._buffer) >= 10 * self.compression:
            self._compress()

    def add_many(self, xs) -> None:
        for x in xs:
            self.add(x)

    def merge(self, other: "TDigest") -> "TDigest":
        for m, w in other._centroids + other._buffer:
            self._buffer.append((m, w))
            self._count += w
        if other._count:
            self._min = min(self._min, other._min)
            self._max = max(self._max, other._max)
        self._compress()
        return self

    def _compress(self) -> None:
        if not self._buffer and len(self._centroids) <= self.compression:
            return
        pts = sorted(self._centroids + self._buffer)
        self._buffer = []
        if not pts:
            return
        W = self._count
        out = []
        cur_m, cur_w = pts[0]
        before = 0.0                       # weight fully left of cur
        for m, w in pts[1:]:
            q = (before + cur_w / 2.0) / W if W > 0 else 0.5
            if cur_w + w <= 4.0 * W * q * (1.0 - q) / self.compression:
                cur_m += (m - cur_m) * (w / (cur_w + w))
                cur_w += w
            else:
                out.append((cur_m, cur_w))
                before += cur_w
                cur_m, cur_w = m, w
        out.append((cur_m, cur_w))
        self._centroids = out

    # ------------------------------------------------------------ query

    def quantile(self, q: float) -> float:
        """AVL-digest interpolation (the estimator whose singleton case
        reproduces the reference's golden values)."""
        if not 0.0 <= q <= 1.0:
            return math.nan
        self._compress()
        cs = self._centroids
        if not cs:
            return math.nan
        if len(cs) == 1:
            return cs[0][0]
        W = self._count
        index = q * (W - 1.0)
        prev_mean = None
        prev_idx = 0.0
        total = 0.0
        for m, w in cs:
            next_idx = total + (w - 1.0) / 2.0
            if next_idx >= index:
                if prev_mean is None:
                    # head: interpolate from the observed minimum
                    if next_idx <= 0:
                        return m
                    f = index / next_idx
                    return self._min + (m - self._min) * f
                if next_idx == prev_idx:
                    return m
                f = (index - prev_idx) / (next_idx - prev_idx)
                return prev_mean + (m - prev_mean) * f
            prev_idx = next_idx
            prev_mean = m
            total += w
        # tail: interpolate toward the observed maximum
        last_idx = W - 1.0
        if last_idx <= prev_idx:
            return self._max
        f = (index - prev_idx) / (last_idx - prev_idx)
        return prev_mean + (self._max - prev_mean) * min(f, 1.0)

    def __len__(self) -> int:
        self._compress()
        return len(self._centroids)

    @property
    def count(self) -> float:
        return self._count

    # ---------------------------------------------------------- serialize

    def to_bytes(self) -> bytes:
        self._compress()
        n = len(self._centroids)
        head = struct.pack("<Hddd", n, self._count, self._min, self._max)
        body = b"".join(struct.pack("<dd", m, w) for m, w in self._centroids)
        return head + body

    @classmethod
    def from_bytes(cls, data: bytes,
                   compression: int = DEFAULT_COMPRESSION) -> "TDigest":
        td = cls(compression)
        n, td._count, td._min, td._max = struct.unpack_from("<Hddd", data)
        off = struct.calcsize("<Hddd")
        td._centroids = [struct.unpack_from("<dd", data, off + i * 16)
                         for i in range(n)]
        return td


# ---------------------------------------------------------------- Spark

def tdigest_quantile_agg(q: float,
                         compression: int = DEFAULT_COMPRESSION):
    """Grouped-agg pandas UDF computing the t-digest p<q> of a numeric
    column — the expression-level drop-in for `F.percentile` when
    `percentile_impl="tdigest"`. Arrow-batched (the group's values arrive
    as one pandas Series); NaN for all-null groups, mirroring
    _nan_if_null on the exact path.

    Non-finite inputs (DOCUMENTED DIVERGENCE from the exact path when
    ``skip_non_finite=False``): NaN is DROPPED — go-tdigest's Add rejects
    NaN, so this is reference parity — whereas Spark's exact
    ``F.percentile`` sorts NaN greatest and can return NaN for
    high quantiles of a NaN-bearing window. +/-Inf never enters the
    digest (it would corrupt centroid interpolation); instead the Inf
    values are rank-accounted piecewise around the finite digest:
    sorted order is [-Inf block | finite digest | +Inf block], and a
    quantile index landing in (or straddling) an Inf block resolves by
    IEEE interpolation against the block value."""

    @pandas_udf("double")
    def agg(v: pd.Series) -> float:
        import numpy as np
        vals = v.dropna().to_numpy(dtype="float64")
        vals = vals[~np.isnan(vals)]            # go-tdigest parity: NaN dropped
        n_neg = int(np.count_nonzero(np.isneginf(vals)))
        n_pos = int(np.count_nonzero(np.isposinf(vals)))
        finite = vals[np.isfinite(vals)]
        n_fin = len(finite)
        n = n_neg + n_fin + n_pos
        if n == 0:
            return math.nan
        td = TDigest(compression)
        td.add_many(finite)
        index = q * (n - 1.0)

        def value_at(rank: float) -> float:
            # rank is integral; position in [-Inf]*n_neg + finite + [+Inf]*n_pos
            if rank < n_neg:
                return -math.inf
            if rank >= n_neg + n_fin:
                return math.inf
            if n_fin == 1:
                return td.quantile(0.5)
            return td.quantile((rank - n_neg) / (n_fin - 1.0))

        lo, hi = math.floor(index), math.ceil(index)
        v_lo = value_at(lo)
        if lo == hi:
            return v_lo
        v_hi = value_at(hi)
        if v_lo == v_hi:
            return v_lo
        return v_lo + (v_hi - v_lo) * (index - lo)

    return agg


def tdigest_partition_digests(df: DataFrame, col: str,
                              compression: int = DEFAULT_COMPRESSION) -> DataFrame:
    """Phase 1 of the distributed global percentile: one serialized digest
    per partition (mapInPandas over Arrow batches — constant-size output
    per partition, so the driver-side merge in
    ``tdigest_global_quantiles`` reads #partitions KB-sized rows instead
    of shuffling every value to one reducer)."""

    def per_partition(batches):
        td = TDigest(compression)
        for pdf in batches:
            td.add_many(pdf[col].dropna().to_numpy())
        if td.count:
            yield pd.DataFrame({"digest": [td.to_bytes()]})

    return df.select(col).mapInPandas(per_partition, "digest binary")


def tdigest_global_quantiles(df: DataFrame, col: str, qs: list,
                             compression: int = DEFAULT_COMPRESSION) -> dict:
    """Global percentiles of ``col`` without a raw-value shuffle:
    partition digests -> driver merge (mirrors the reference's single
    accumulator fed by the full scan, but distributed). Returns
    {q: value}."""
    parts = tdigest_partition_digests(df, col, compression).collect()
    td = TDigest(compression)
    for r in parts:
        td.merge(TDigest.from_bytes(r["digest"], compression))
    return {q: td.quantile(q) for q in qs}


def tdigest_group_digests(df: DataFrame, keys: list, col: str,
                          compression: int = DEFAULT_COMPRESSION) -> DataFrame:
    """One serialized digest per group — the MERGEABLE percentile rollup
    row (the warehouse elevation of the reference's per-emit t-digest:
    materialize per-(series, day) digests once, then any time range's
    percentile is a KB-sized merge, never a raw-value re-scan). Output:
    keys..., n (non-null count), digest binary.

    Shape note: JVM groupBy + collect_list, then a SCALAR pandas UDF that
    digests a whole Arrow batch of groups per call — NOT applyInPandas,
    whose per-group pandas frame overhead is ~4 ms and dominates when
    rollup groups are small and many (measured 33s -> 3s on 8k
    (user, day) groups at sf0.1). The raw values shuffle once here —
    that is the rollup BUILD cost, same as any downsample; the win is
    every later range query merging KB digests instead. sort_array makes
    the digest bytes deterministic under shuffle order."""

    @pandas_udf("binary")
    def make(vs: pd.Series) -> pd.Series:
        out = []
        for arr in vs:
            td = TDigest(compression)
            td.add_many(arr)
            out.append(td.to_bytes() if td.count else None)
        return pd.Series(out)

    g = df.groupBy(*keys).agg(
        F.sort_array(F.collect_list(F.col(col))).alias("__vals"),
        F.count(F.col(col)).alias("n"))
    return g.select(*keys, "n", make("__vals").alias("digest"))


def tdigest_rollup_quantile(digests: DataFrame, keys: list, q: float,
                            out_col: str = "q_value",
                            compression: int = DEFAULT_COMPRESSION) -> DataFrame:
    """Merge each group's digests and emit the quantile: keys..., n,
    out_col. ``keys`` are the SURVIVING dimensions (e.g. roll (user, day)
    digests up to per-user). Rollup-then-query equals the reference's
    one-pass digest exactly in the singleton regime and carries the
    documented ~1/δ rank error beyond it. Same vectorized-scalar-UDF
    shape as ``tdigest_group_digests``; the exchange moves digests, not
    values."""

    @pandas_udf("double")
    def merged_q(ds: pd.Series) -> pd.Series:
        out = []
        for lst in ds:
            td = TDigest(compression)
            for b in lst:
                if b is not None:
                    td.merge(TDigest.from_bytes(bytes(b), compression))
            out.append(td.quantile(q) if td.count else float("nan"))
        return pd.Series(out)

    g = digests.groupBy(*keys).agg(
        F.sort_array(F.collect_list("digest")).alias("__ds"),
        F.sum("n").alias("n"))
    return g.select(*keys, "n", merged_q("__ds").alias(out_col))
