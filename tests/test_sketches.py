"""HLL sketch rollup semantics (operators/sketches.py): accuracy bound,
merge = re-scan equivalence, partitioning invariance, parquet persistence."""

from __future__ import annotations

import pytest

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


def test_cms_overestimates_bounded_and_merges_exactly(spark):
    """CMS guarantees: estimate >= true count for every item; with width
    comfortably above distinct-item count the estimates are EXACT; and
    the sketch of a union equals the cell-wise merge of shard sketches
    (deterministic table equality — the merge property COUNT lacks)."""
    from nexusbase_spark.operators.sketches import (
        cms_build, cms_estimate, cms_merge)

    words_a = ["x"] * 10 + ["y"] * 5 + ["z"]
    words_b = ["x"] * 3 + ["w"] * 7
    a = spark.createDataFrame([(w,) for w in words_a], "tok string")
    b = spark.createDataFrame([(w,) for w in words_b], "tok string")
    both = a.unionAll(b)

    sk = cms_build(both, "tok", depth=4, width=256)
    est = {r["item"]: r["estimate"] for r in
           cms_estimate(sk, ["x", "y", "z", "w", "absent"],
                        depth=4, width=256).collect()}
    true = {"x": 13, "y": 5, "z": 1, "w": 7, "absent": 0}
    for k, t in true.items():
        assert est[k] >= t
    assert est == true  # width 256 >> 4 distinct items: no collisions

    merged = cms_merge(cms_build(a, "tok", depth=4, width=256),
                       cms_build(b, "tok", depth=4, width=256))
    direct = {(r["j"], r["cell"]): r["cnt"] for r in sk.collect()}
    via_merge = {(r["j"], r["cell"]): r["cnt"] for r in merged.collect()}
    assert direct == via_merge

    # a genuinely tiny width forces collisions: still never underestimates
    tiny = cms_build(both, "tok", depth=2, width=2)
    est2 = {r["item"]: r["estimate"] for r in
            cms_estimate(tiny, list(true), depth=2, width=2).collect()}
    assert all(est2[k] >= t for k, t in true.items())


@pytest.mark.nightly
def test_cms_store_streaming_matches_batch(spark, tmp_path):
    """CMSStore under ingest: after each micro-batch the served
    estimates equal a batch-built CMS over everything ingested so far
    (deterministic hash family -> identical tables); compact() folds
    deltas without changing any estimate."""
    from nexusbase_spark.operators.sketches import CMSStore, cms_build, cms_estimate
    from nexusbase_spark.streaming.subscribe import stream_ingest

    st = CMSStore.build(spark, str(tmp_path / "cms"), col="tok",
                        depth=3, width=64)
    src = tmp_path / "cms_src"
    src.mkdir()
    q = (stream_ingest(spark, str(src), "tok string").writeStream
         .queryName("t_cms").foreachBatch(st.for_each_batch())
         .outputMode("append").start())
    seen: list[tuple] = []

    def feed(words):
        rows = [(w,) for w in words]
        seen.extend(rows)
        (spark.createDataFrame(rows, "tok string").coalesce(1)
         .write.mode("append").parquet(str(src)))
        q.processAllAvailable()

    def batch_est(items):
        sk = cms_build(spark.createDataFrame(seen, "tok string"), "tok",
                       3, 64)
        return {r["item"]: int(r["estimate"]) for r in
                cms_estimate(sk, items, 3, 64).collect()}

    items = ["x", "y", "w", "absent"]
    try:
        feed(["x"] * 5 + ["y"] * 2)
        assert st.estimate(items) == batch_est(items)
        feed(["x"] * 3 + ["w"] * 7)
        got = st.estimate(items)
        assert got == batch_est(items)
        assert got["x"] >= 8 and got["absent"] == 0
    finally:
        q.stop()
    st.compact()
    assert st.estimate(items) == got


@pytest.mark.nightly
def test_cms_candidate_gate_lossless_prefilter(spark, tmp_path):
    """The CMS pre-filter in front of exact heavy-hitter verification
    (NOTES r5 backlog): tokens stream through a foreachBatch gate that
    folds them into the persistent sketch and emits running-estimate
    threshold crossers. One-sided CMS error makes the gate LOSSLESS for
    recall — every token with true total >= threshold must appear in
    the candidates — and the exact verification pass over candidates
    only must equal the true heavy set exactly (collisions die there)."""
    from nexusbase_spark.operators.sketches import (
        CMSStore,
        cms_candidate_gate,
        gate_candidates,
        verify_gate_candidates,
    )

    src = tmp_path / "cms_gate_src"
    src.mkdir()

    def feed(tokens):
        spark.createDataFrame([(t,) for t in tokens], "tok string") \
            .coalesce(1).write.mode("append").parquet(str(src))

    # hot: 30 total, warm: 12 total, cold: 40 distinct singletons
    feed(["hot"] * 10 + ["warm"] * 4 + [f"cold{i:02d}" for i in range(20)])
    store = CMSStore.build(spark, str(tmp_path / "cms_store"),
                           col="tok", depth=4, width=512)
    stream = spark.readStream.schema("tok string").parquet(str(src))
    q = (stream.writeStream.queryName("t_cms_gate")
         .foreachBatch(cms_candidate_gate(store, threshold=10))
         .option("checkpointLocation", str(tmp_path / "cms_gate_ckpt"))
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        feed(["hot"] * 12 + ["warm"] * 4
             + [f"cold{i:02d}" for i in range(20, 40)])
        q.processAllAvailable()
        feed(["hot"] * 8 + ["warm"] * 4)
        q.processAllAvailable()
    finally:
        q.stop()

    corpus = spark.read.parquet(str(src))
    cand = {r["item"] for r in gate_candidates(store).collect()}
    # lossless recall: both true heavies present
    assert {"hot", "warm"} <= cand
    # it is a PRE-filter: far fewer candidates than the 42-token vocab
    assert len(cand) < 42
    exact = {r["item"]: r["cnt"] for r in
             verify_gate_candidates(corpus, store, "tok", 10).collect()}
    assert exact == {"hot": 30, "warm": 12}

    # compact() folds the per-batch candidate files into one distinct
    # set — the gate's contract (the candidate SET) is unchanged by it,
    # and verification still yields the exact heavy set.
    store.compact()
    assert ({r["item"] for r in gate_candidates(store).collect()}
            == cand)
    exact2 = {r["item"]: r["cnt"] for r in
              verify_gate_candidates(corpus, store, "tok", 10).collect()}
    assert exact2 == exact


def test_cms_gate_candidates_empty_before_first_crossing(spark, tmp_path):
    """Before any batch crosses the threshold the candidates path does
    not exist; gate_candidates/verify_gate_candidates must return empty
    results, not throw on the missing path (ADVICE r5)."""
    from nexusbase_spark.operators.sketches import (
        CMSStore,
        gate_candidates,
        verify_gate_candidates,
    )
    store = CMSStore.build(spark, str(tmp_path / "cms_empty_store"),
                           col="tok", depth=4, width=64)
    assert gate_candidates(store).count() == 0
    corpus = spark.createDataFrame([("a",), ("a",)], "tok string")
    assert verify_gate_candidates(corpus, store, "tok", 2).count() == 0


def test_bloom_members_always_hit_and_merge_is_bit_or(spark):
    """One-sided guarantee: every inserted element reads might=True
    under ANY (m, k); and the Bloom merge is bitwise OR — the filter of
    a union equals bit_or over shard filters (exact table equality,
    same as the CMS exact-merge property)."""
    from pyspark.sql import functions as F

    from nexusbase_spark.operators.sketches import (bloom_build,
                                                    bloom_might_contain)

    a = spark.createDataFrame([(f"a{i}",) for i in range(40)], "s string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(40)], "s string")
    m, k = 4096, 4
    bl_union = bloom_build(a.union(b), "s", m_bits=m, k=k)
    merged = (bloom_build(a, "s", m_bits=m, k=k)
              .union(bloom_build(b, "s", m_bits=m, k=k))
              .groupBy("word_idx").agg(F.bit_or("bits").alias("bits")))
    assert ({tuple(r) for r in bl_union.collect()}
            == {tuple(r) for r in merged.collect()})

    got = {r["s"]: r["might"] for r in
           bloom_might_contain(bl_union, a.union(b), "s",
                               m_bits=m, k=k).collect()}
    assert all(got.values()) and len(got) == 80


def test_bloom_nonmembers_miss_at_generous_m_and_fp_under_tiny_m(spark):
    """At a generous m the 100 probes that were never inserted all read
    False (fp ~ (fill)^k, astronomically small); squeezing the same
    set into m=64 bits saturates the filter and the SAME probes now
    read True — the documented one-sided error, deterministic in both
    directions."""
    from nexusbase_spark.operators.sketches import (bloom_build,
                                                    bloom_might_contain)

    ins = spark.createDataFrame([(f"in{i}",) for i in range(50)],
                                "s string")
    out = spark.createDataFrame([(f"out{i}",) for i in range(100)],
                                "s string")
    big = bloom_build(ins, "s", m_bits=2_097_152, k=4)
    got = {r["s"]: r["might"] for r in
           bloom_might_contain(big, out, "s",
                               m_bits=2_097_152, k=4).collect()}
    assert not any(got.values())

    tiny = bloom_build(ins, "s", m_bits=64, k=4)
    got_t = [r["might"] for r in
             bloom_might_contain(tiny, out, "s", m_bits=64, k=4).collect()]
    assert sum(got_t) > 50  # saturated: most non-members false-positive


def test_hll_branch_boundary_pinned_registers(spark):
    """VERDICT r6 #6: pin BOTH estimator branches of the md5-HLL at
    fixed register rollups, straddling the `e_raw <= 640 AND
    zero_regs > 0` condition — the SF-ladder oracle only witnesses
    whichever branch the data lands in, so a refactor of the branch
    condition could silently flip estimates without this test.
    Expected literals computed with the same IEEE double ops
    (ALPHA/(s+zero*2^53), 256*ln(256/zero), floor(x*1e4+0.5)/1e4)."""
    from nexusbase_spark.queries_analytics import hll_estimate_select

    g = spark.createDataFrame(
        [  # (s_present, n_regs) -> branch
            ("lin_deep", 0, 10 * 2**52, 10),    # e_raw=187.5 -> linear
            ("raw_full", 0, 2**60, 256),        # zero=0 -> raw always
            ("raw_edge", 0, 211129572404652928, 206),  # e_raw=640.97 -> raw
            ("lin_edge", 0, 213129572404652928, 206),  # e_raw=639.04 -> linear
        ],
        "event_type string, day long, s_present long, n_regs long")
    got = {r["event_type"]: (r["zero_regs"], r["hll_users"])
           for r in hll_estimate_select(g).collect()}
    assert got == {
        "lin_deep": (246, 10.2006),   # 256*ln(256/246)
        "raw_full": (0, 367.7556),    # ALPHA/2^60
        "raw_edge": (50, 640.9675),   # raw branch despite zero_regs>0
        "lin_edge": (50, 418.0875),   # 256*ln(256/50)
    }


def test_bloom_merge_equals_monolithic_build(spark):
    """bloom_merge's lossless contract: filters built on disjoint shards
    OR together to exactly the monolithic filter (same word table), and
    membership through the merged filter is identical — including that
    a wrong merge op (SUM) would corrupt multi-set words."""
    from nexusbase_spark.operators.sketches import (bloom_build,
                                                    bloom_merge,
                                                    bloom_might_contain)

    rows = [(i, f"item-{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w string")
    a = bloom_build(df.filter("id % 2 = 0"), "w", m_bits=1024, k=4)
    b = bloom_build(df.filter("id % 2 = 1"), "w", m_bits=1024, k=4)
    merged = {(r["word_idx"], r["bits"])
              for r in bloom_merge(a, b).collect()}
    mono = {(r["word_idx"], r["bits"])
            for r in bloom_build(df, "w", m_bits=1024, k=4).collect()}
    assert merged == mono
    probe = spark.createDataFrame(
        [(i, f"item-{i}") for i in range(150, 250)], "id long, w string")
    got = {r["id"]: r["might"] for r in bloom_might_contain(
        bloom_merge(a, b), probe, "w", m_bits=1024, k=4).collect()}
    assert all(got[i] for i in range(150, 200))  # one-sided: members hit


def test_hll_gate_bounds_and_merge_distinct_union_cross_sf(spark):
    """Cross-SF non-degeneracy asserts for the round-8 HLL gate queries
    (VERDICT r7 #2 and #7):

    - events_hll_daily_users / events_hll_range_users: the bounded-error
      booleans the oracle asserts TRUE must actually BE true on real
      data at every test SF (within 6.5% of exact — DataSketches build
      and union paths);
    - events_hll_md5_weekly_users: merge_lt_daily_sum TRUE on EVERY
      (type, week) with n_days > 1 — the weekly MAX-merge estimate sits
      strictly below the sum of the daily estimates, so the gate can
      distinguish a register MAX-merge from plain addition (a degenerate
      corpus with no cross-day user/register overlap could not)."""
    from nexusbase_spark.queries import all_queries

    qs = all_queries()
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for name in ("events_hll_daily_users", "events_hll_range_users"):
            rows = qs[name](spark, sf_dir).collect()
            assert rows, f"{name} empty at {sf_dir}"
            assert all(r["within_bound"] for r in rows), (name, sf_dir)
        wk = qs["events_hll_md5_weekly_users"](spark, sf_dir).collect()
        assert wk and all(r["n_days"] > 1 for r in wk), sf_dir
        assert all(r["merge_lt_daily_sum"] for r in wk), sf_dir
        assert all(r["daily_sum_users"] > r["hll_users"] for r in wk), sf_dir
