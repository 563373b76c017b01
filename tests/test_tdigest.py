"""t-digest percentile parity (iterator/multi_field_aggregator.go:23,81-86;
golden values from iterator/multi_field_aggregator_test.go:176-209)."""

from __future__ import annotations

import math
import random

import pytest

from pyspark.sql import functions as F

from nexusbase_spark.functions.tdigest import (
    TDigest,
    tdigest_global_quantiles,
    tdigest_quantile_agg,
)


def test_reference_golden_values():
    """The reference's own aggregator test: values 1..20, p50/p95/p100
    (multi_field_aggregator_test.go:205-209)."""
    td = TDigest()
    td.add_many(float(i) for i in range(1, 21))
    assert td.quantile(0.50) == pytest.approx(10.5, abs=1e-9)
    assert td.quantile(0.95) == pytest.approx(19.05, abs=1e-9)
    assert td.quantile(1.00) == pytest.approx(20.0, abs=1e-9)
    assert td.quantile(0.0) == pytest.approx(1.0, abs=1e-9)


def test_small_groups_match_exact_linear_interpolation():
    """Below ~2·compression values every centroid is a singleton, so the
    digest must equal numpy-style linear interpolation — the estimator
    Spark's `percentile` and DuckDB's `quantile_cont` use (this is what
    lets the tdigest path share the exact path's oracle)."""
    rng = random.Random(7)
    for n in (1, 2, 5, 37, 150):
        xs = [rng.uniform(-50, 50) for _ in range(n)]
        td = TDigest()
        td.add_many(xs)
        s = sorted(xs)
        for q in (0.0, 0.1, 0.5, 0.9, 0.95, 0.99, 1.0):
            idx = q * (n - 1)
            lo, f = int(math.floor(idx)), idx - math.floor(idx)
            exact = s[lo] if f == 0 else s[lo] + (s[lo + 1] - s[lo]) * f
            assert td.quantile(q) == pytest.approx(exact, abs=1e-9), (n, q)


def test_large_n_error_bound_and_compression():
    """100k values: centroid count stays O(compression) and the rank error
    at the checked quantiles stays within the documented t-digest bound."""
    rng = random.Random(42)
    xs = [rng.gauss(0, 1) for _ in range(100_000)]
    td = TDigest(compression=100)
    td.add_many(xs)
    # the AVL threshold 4Wq(1-q)/δ yields O(δ·log n) centroids (the
    # tails stay singleton-precise); still KB-sized at any n
    assert len(td) <= td.compression * math.log10(len(xs)) * 2
    s = sorted(xs)
    n = len(s)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = td.quantile(q)
        # rank of the estimate must be within 1% of the target rank
        import bisect
        rank = bisect.bisect_left(s, est) / n
        assert abs(rank - q) < 0.01, (q, rank)


def test_merge_matches_single_digest():
    """Partial aggregation shape: digests built on shards and merged give
    the same estimates (within sketch error) as one digest over all data;
    serialization round-trips exactly."""
    rng = random.Random(1)
    xs = [rng.expovariate(0.2) for _ in range(20_000)]
    whole = TDigest()
    whole.add_many(xs)
    parts = [TDigest() for _ in range(8)]
    for i, x in enumerate(xs):
        parts[i % 8].add(x)
    merged = TDigest()
    for p in parts:
        merged.merge(TDigest.from_bytes(p.to_bytes()))
    assert merged.count == pytest.approx(whole.count)
    import bisect
    s = sorted(xs)
    for q in (0.1, 0.5, 0.9, 0.99):
        rank = bisect.bisect_left(s, merged.quantile(q)) / len(s)
        assert abs(rank - q) < 0.015, q
    rt = TDigest.from_bytes(whole.to_bytes())
    assert rt.quantile(0.5) == whole.quantile(0.5)


def test_nan_and_empty_handling():
    td = TDigest()
    assert math.isnan(td.quantile(0.5))
    td.add(float("nan"))
    assert td.count == 0 and math.isnan(td.quantile(0.5))
    td.add(3.0)
    assert td.quantile(0.0) == td.quantile(1.0) == 3.0
    assert math.isnan(td.quantile(-0.1)) and math.isnan(td.quantile(1.1))


def test_nonfinite_inputs_udf(spark):
    """ADVICE r2: Inf must never corrupt centroid interpolation, and NaN
    is dropped (go-tdigest parity — documented divergence from exact
    F.percentile's NaN-sorts-greatest). Inf values rank piecewise around
    the finite digest: [-Inf block | finite | +Inf block]."""
    inf, nan = float("inf"), float("nan")
    rows = (
        [(0, v) for v in [1.0, 2.0, 3.0, nan]]           # NaN dropped
        + [(1, v) for v in [1.0, 2.0, 3.0, inf]]         # +Inf tail
        + [(2, v) for v in [-inf, 1.0, 2.0, 3.0]]        # -Inf head
        + [(3, v) for v in [inf, inf, inf]]              # all +Inf
        + [(4, v) for v in [nan, nan]]                   # all NaN -> empty
    )
    df = spark.createDataFrame(rows, "g int, v double")
    got = {r["g"]: r["p"] for r in df.groupBy("g").agg(
        tdigest_quantile_agg(0.5)("v").alias("p")).collect()}
    assert got[0] == pytest.approx(2.0)      # median of {1,2,3}, NaN gone
    # g=1: n=4, index=1.5 -> between ranks 1,2 of [1,2,3,+inf] = 2.5
    assert got[1] == pytest.approx(2.5)
    # g=2: n=4, index=1.5 -> between ranks 1,2 of [-inf,1,2,3] = 1.5
    assert got[2] == pytest.approx(1.5)
    assert got[3] == inf                     # all-Inf group
    assert got[4] is None                    # empty after NaN drop (Arrow NULL)
    # p1.0 of the +Inf-tailed group lands in the Inf block
    got100 = {r["g"]: r["p"] for r in df.groupBy("g").agg(
        tdigest_quantile_agg(1.0)("v").alias("p")).collect()}
    assert got100[1] == inf and got100[2] == pytest.approx(3.0)


def test_grouped_agg_udf_matches_exact_for_small_groups(spark):
    """The percentile_impl="tdigest" expression path: per-group digests
    via the grouped-agg pandas UDF equal F.percentile for singleton-sized
    groups, including all-null groups (NaN)."""
    rows = [(g, float(g * 10 + i)) for g in range(4) for i in range(30)]
    rows += [(9, None)] * 3
    df = spark.createDataFrame(rows, "g int, v double")
    # NB: a grouped-agg pandas UDF cannot share one agg() with JVM
    # aggregates (INVALID_PANDAS_UDF_PLACEMENT) — the operators split
    # and join; here the two sides run as separate aggs.
    td = {r["g"]: r["p"] for r in df.groupBy("g").agg(
        tdigest_quantile_agg(0.95)("v").alias("p")).collect()}
    exact = {r["g"]: r["p"] for r in df.groupBy("g").agg(
        F.expr("percentile(v, 0.95)").alias("p")).collect()}
    assert td.keys() == exact.keys()
    for g in td:
        if g == 9:
            # Arrow maps the UDF's NaN to NULL; the fidelity layer wraps
            # with _nan_if_null to restore NaN (checked in the downsample
            # test below)
            assert td[g] is None and exact[g] is None
        else:
            assert td[g] == pytest.approx(exact[g], abs=1e-9)


def test_downsample_tdigest_impl_matches_exact(spark, sf_dir):
    """End to end through the downsample operator: percentile_impl=
    "tdigest" reproduces the exact path on real (small-group) data."""
    from nexusbase_spark.datamodel import load_points
    from nexusbase_spark.functions.fidelity import AggSpec
    from nexusbase_spark.operators import downsample, metric_filter

    DAY = 86_400 * 1_000_000_000
    # MIXED spec list: exercises the split-and-join (count/stddev stay
    # JVM-side, the percentile runs as a pandas grouped agg)
    specs = [AggSpec("count", "value"), AggSpec("p95", "value"),
             AggSpec("stddev", "value")]
    pts = metric_filter(load_points(spark, sf_dir), "purchase")
    ex = downsample(pts, DAY, specs)
    td = downsample(pts, DAY, specs, percentile_impl="tdigest")
    assert ex.columns == td.columns            # spec order preserved
    key = lambda r: (r["series_key"], r["window_start"])  # noqa: E731
    a = {key(r): r for r in ex.collect()}
    b = {key(r): r for r in td.collect()}
    assert a.keys() == b.keys() and len(a) > 0
    for k in a:
        assert a[k]["count_value"] == b[k]["count_value"]
        for c in ("p95_value", "stddev_value"):
            if a[k][c] is None or (isinstance(a[k][c], float) and math.isnan(a[k][c])):
                assert b[k][c] is None or math.isnan(b[k][c])
            else:
                assert b[k][c] == pytest.approx(a[k][c], abs=1e-9), (k, c)


def test_final_aggregate_tdigest_mixed(spark, sf_dir):
    """Global (one-row) aggregation with mixed specs through the tdigest
    path: crossJoin of the JVM row and the pandas row."""
    from nexusbase_spark.datamodel import load_points
    from nexusbase_spark.functions.fidelity import AggSpec
    from nexusbase_spark.operators import final_aggregate, metric_filter

    pts = metric_filter(load_points(spark, sf_dir), "view")
    specs = [AggSpec("count", "*"), AggSpec("p50", "value"),
             AggSpec("avg", "value")]
    ex = final_aggregate(pts, specs).collect()[0]
    td = final_aggregate(pts, specs, percentile_impl="tdigest").collect()[0]
    assert ex["count_*"] == td["count_*"]
    assert td["avg_value"] == pytest.approx(ex["avg_value"], abs=1e-9)
    # global group can exceed 2·compression values: allow sketch error
    assert td["p50_value"] == pytest.approx(ex["p50_value"], rel=0.05)


def test_global_quantiles_two_phase(spark):
    """The no-raw-shuffle global path: per-partition digests merged
    driver-side track the exact global percentiles."""
    df = (spark.range(50_000).repartition(16)
          .select((F.col("id") % 9973).cast("double").alias("v")))
    got = tdigest_global_quantiles(df, "v", [0.5, 0.99])
    assert got[0.5] == pytest.approx(9973 / 2, rel=0.02)
    assert got[0.99] == pytest.approx(9973 * 0.99, rel=0.02)


def test_group_digest_rollup_singleton_exact(spark):
    """(key, day) digests merged per key reproduce the one-pass exact
    percentile bit-for-bit while centroids stay singletons, and n sums."""
    import numpy as np

    from nexusbase_spark.functions.tdigest import (
        tdigest_group_digests,
        tdigest_rollup_quantile,
    )
    rows = [("u1", d, float(v)) for d in range(3) for v in range(d * 10, d * 10 + 8)]
    rows += [("u2", 0, 5.0), ("u2", 1, 15.0)]
    df = spark.createDataFrame(rows, "user string, day int, value double")
    dd = tdigest_group_digests(df, ["user", "day"], "value", compression=400)
    out = {r["user"]: (r["n"], r["p"])
           for r in tdigest_rollup_quantile(dd, ["user"], 0.95, out_col="p",
                                            compression=400).collect()}
    u1_vals = sorted(v for u, d, v in rows if u == "u1")
    assert out["u1"][0] == 24
    assert out["u1"][1] == pytest.approx(
        float(np.quantile(np.array(u1_vals), 0.95, method="linear")), abs=1e-12)
    assert out["u2"] == (2, pytest.approx(15.0 - 0.05 * 10))


def test_group_digest_rollup_error_bounded_beyond_singletons(spark):
    """Past the singleton regime (5k values, compression 100) the merged
    rollup's p95 stays within ~1% rank error of exact."""
    import numpy as np

    from nexusbase_spark.functions.tdigest import (
        tdigest_group_digests,
        tdigest_rollup_quantile,
    )
    vals = [(i % 10, float((i * 2654435761) % 100000))
            for i in range(5000)]
    df = spark.createDataFrame([("k", d, v) for d, v in vals],
                               "user string, day int, value double")
    dd = tdigest_group_digests(df, ["user", "day"], "value", compression=100)
    got = tdigest_rollup_quantile(dd, ["user"], 0.95, out_col="p",
                                  compression=100).collect()[0]["p"]
    arr = np.sort(np.array([v for _, v in vals]))
    # rank of the estimate within 1% of the 0.95 target
    rank = np.searchsorted(arr, got) / len(arr)
    assert abs(rank - 0.95) < 0.01


def test_rank_bound_gate_runs_in_compressed_regime():
    """The round-8 gate query (lineitem_p95_tdigest_rank_bound) claims to
    exercise the digest's APPROXIMATE regime — unlike the singleton-exact
    gates, where centroids == values. Pin it: rebuilding the same
    per-(returnflag, month) -> per-flag merge at compression 50 on
    sf0.001 lineitem must land far fewer centroids than values (so the
    ~1/delta rank error is live), while the estimate's true rank stays
    within half the gate's 0.005 bound."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute("""
        SELECT l_returnflag, date_trunc('month', l_shipdate),
               list(l_extendedprice)
        FROM '/root/testdata/sf0.001/lineitem.parquet' GROUP BY 1, 2
    """).fetchall()
    groups: dict = {}
    for flag, _m, vals in rows:
        groups.setdefault(flag, []).append(vals)
    assert len(groups) == 3
    for flag, shards in groups.items():
        assert len(shards) > 10          # the merge is non-degenerate
        td = TDigest(compression=50)
        for vals in shards:
            sub = TDigest(compression=50)
            sub.add_many(vals)
            td.merge(sub)
        allv = sorted(v for vals in shards for v in vals)
        n = len(allv)
        assert len(td) < n / 4, (flag, len(td), n)  # compression engaged
        est = td.quantile(0.95)
        rank = sum(1 for v in allv if v <= est) / n
        assert abs(rank - 0.95) <= 0.0025, (flag, rank)
