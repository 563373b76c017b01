"""HLL sketch rollup semantics (operators/sketches.py): accuracy bound,
merge = re-scan equivalence, partitioning invariance, parquet persistence."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nexusbase_spark.operators.sketches import (
    daily_user_sketches,
    estimate_daily,
    estimate_range,
)


def _events(spark):
    # 3 days; day d has users [0, 400*(d+1)) each appearing twice
    rows = [(("view"), d, u)
            for d in range(3) for u in range(400 * (d + 1)) for _ in (0, 1)]
    return spark.createDataFrame(rows, "event_type string, day long, user_id long")


def test_daily_estimate_within_error_bound(spark):
    ev = _events(spark)
    sk = daily_user_sketches(ev, F.col("day"), lg_k=14)
    got = {r["day"]: r["users_est"] for r in estimate_daily(sk).collect()}
    for d, exact in ((0, 400), (1, 800), (2, 1200)):
        assert abs(got[d] - exact) / exact < 0.02  # ~0.8% std err at lg_k=14


def test_range_union_matches_exact_distinct(spark):
    """Union of per-day sketches over [0,2] estimates the 3-day distinct
    count (1200 — day users are nested subsets) without touching raw
    events. distinct counts don't add (400+800+1200=2400); sketches do."""
    ev = _events(spark)
    sk = daily_user_sketches(ev, F.col("day"), lg_k=14)
    est = estimate_range(sk, 0, 2).collect()[0]["users_est"]
    assert abs(est - 1200) / 1200 < 0.02
    # day filter prunes: single-day range equals that day's estimate
    one = estimate_range(sk, 1, 1).collect()[0]["users_est"]
    assert abs(one - 800) / 800 < 0.02


def test_estimate_invariant_under_partitioning(spark):
    """Register-wise max is commutative/associative: any partitioning of
    the input yields the identical sketch, hence the identical estimate."""
    ev = _events(spark)
    a = estimate_daily(daily_user_sketches(ev.repartition(1), F.col("day")))
    b = estimate_daily(daily_user_sketches(ev.repartition(7, "user_id"),
                                           F.col("day")))
    assert ({tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()})


def test_sketch_rollup_survives_parquet_roundtrip(spark, tmp_path):
    """The rollup is a TABLE: binary sketches written to parquet merge
    identically after re-read (the materialized-rollup serving path)."""
    ev = _events(spark)
    sk = daily_user_sketches(ev, F.col("day"), lg_k=12)
    before = estimate_range(sk, 0, 2).collect()[0]["users_est"]
    path = os.path.join(str(tmp_path), "hll_rollup")
    sk.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    after = estimate_range(back, 0, 2).collect()[0]["users_est"]
    assert before == after
