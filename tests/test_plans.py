"""Physical-plan regression guards: the plan properties the 100TB story
depends on, asserted so a refactor that silently loses them fails CI.

These check INVARIANTS (a broadcast exists / pushdown reached the scan /
top-k never global-sorts), not exact plan strings — Spark version bumps
reshape plans, but these properties must survive."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().toString()


@pytest.fixture(scope="module")
def qs():
    from nexusbase_spark.queries import all_queries
    return all_queries()


def test_star_joins_broadcast_dims_no_cartesian(spark, qs):
    """TPC-H star shapes: every dim reaches the fact through a broadcast
    hash join at test scale (constant dims are pinned, SF-proportional
    dims threshold-decided — VERDICT r2 fix), and nothing degenerates
    into a cartesian product."""
    for name, min_bhj in (("tpch_q3_top_orders", 1),
                          ("tpch_q5_region_revenue", 3),
                          ("tpch_q8_mkt_share", 5)):
        plan = _plan(qs[name](spark, SF_DIR))
        assert plan.count("BroadcastHashJoin") >= min_bhj, name
        assert "CartesianProduct" not in plan, name


def test_topk_is_distributed_not_global_sort(spark, qs):
    """cursor_page (keyset pagination + LIMIT) compiles to
    TakeOrderedAndProject — per-partition top-K merged on the driver —
    never a full global sort of the scan."""
    plan = _plan(qs["cursor_page"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_scan_filters_are_pushed_to_parquet(spark, qs):
    """The raw range+tag scan's time-range predicate reaches the parquet
    reader (row-group min/max pruning at scale) — PushedFilters is
    populated, not empty brackets."""
    plan = _plan(qs["raw_scan_range_tag"](spark, SF_DIR))
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip(), "empty PushedFilters on the raw scan"


def test_downsample_single_agg_exchange(spark, qs):
    """The epoch-aligned downsample is one partial+final aggregate pair
    over one key exchange — window alignment is a projection, never a
    join against a window grid."""
    plan = _plan(qs["downsample_1d"](spark, SF_DIR))
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # agg shuffle (+AQE read nodes)


def test_priority_prefix_well_formed():
    """The driver-gate witness window: no duplicates, all names
    registered (a rename must update the prefix, not silently shrink
    coverage), and it fits the driver's 50-row cap."""
    from nexusbase_spark.queries import PRIORITY_PREFIX, all_queries
    names = set(all_queries())
    assert len(PRIORITY_PREFIX) == len(set(PRIORITY_PREFIX))
    assert set(PRIORITY_PREFIX) <= names
    assert len(PRIORITY_PREFIX) <= 50
