"""Known-answer tests for the round-5 statistics/eval family:
chi-square + Cramer's V, BH-FDR over grouped KS, Theil-Sen trend,
Cohen's kappa, calibration bins, Heaps'-law fit, centroid drift.

Each test drives the REGISTERED query function against a tiny crafted
parquet fixture (written under tmp_path, same table names the driver
uses), so the exact gate-checked code path is what's asserted — not a
re-derivation."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F  # noqa: F401

from nexusbase_spark.queries import QUERIES, all_queries

all_queries()  # trigger registration of sibling registries


def _fn(name):
    return QUERIES[name][0]


def _write_events(spark, path, rows):
    """rows: (event_id, day, user_id, event_type, value)."""
    data = [(int(i), datetime.datetime(2024, 1, 1)
             + datetime.timedelta(days=int(d)), int(u), t, float(v), "{}")
            for i, d, u, t, v in rows]
    (spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet"))


# ---------------------------------------------------------------------------
# chi-square / Cramer's V


def test_chi_square_independent_table_is_zero(spark, tmp_path):
    """Counts exactly proportional across segments => chi2 = 0, V = 0.
    Type A: 10/20/30 per seg, type B: 20/40/60 — same 1:2:3 profile."""
    rows, eid = [], 0
    for t, mult in (("A", 1), ("B", 2)):
        for seg, base in ((0, 10), (1, 20), (2, 30)):
            for _ in range(base * mult):
                rows.append((eid, 0, seg, t, 1.0))
                eid += 1
    _write_events(spark, str(tmp_path), rows)
    out = _fn("events_chi_square")(spark, str(tmp_path)).collect()[0]
    assert out["n"] == 180 and out["dof"] == 2
    assert out["chi2"] == 0.0 and out["cramers_v"] == 0.0


def test_chi_square_perfect_association(spark, tmp_path):
    """2x2 diagonal table [[10,0],[0,10]] => chi2 = N = 20, V = 1."""
    rows = [(i, 0, 0, "A", 1.0) for i in range(10)]
    rows += [(100 + i, 0, 1, "B", 1.0) for i in range(10)]
    _write_events(spark, str(tmp_path), rows)
    out = _fn("events_chi_square")(spark, str(tmp_path)).collect()[0]
    assert out["n"] == 20 and out["dof"] == 1
    assert out["chi2"] == 20.0 and out["cramers_v"] == 1.0


# ---------------------------------------------------------------------------
# BH-FDR over grouped KS


def test_ks_fdr_rejects_disjoint_keeps_identical(spark, tmp_path):
    """Type 'same': arms draw identical values => D=0, p=1, never
    rejected. Type 'shifted': disjoint supports => D=1, p tiny =>
    rejected after BH. Adjusted p must be monotone in rank."""
    rows, eid = [], 0
    # same: users 0 (odd arm... user_id%2==0 => arm a) and 1 share values
    for v in range(50):
        rows.append((eid, 0, 0, "same", float(v))); eid += 1  # noqa: E702
        rows.append((eid, 0, 1, "same", float(v))); eid += 1  # noqa: E702
    # shifted: arm a values < 0, arm b values > 100
    for v in range(50):
        rows.append((eid, 0, 0, "shifted", -1.0 - v)); eid += 1  # noqa: E702
        rows.append((eid, 0, 1, "shifted", 101.0 + v)); eid += 1  # noqa: E702
    _write_events(spark, str(tmp_path), rows)
    out = {r["event_type"]: r for r in
           _fn("events_ks_fdr")(spark, str(tmp_path)).collect()}
    assert out["same"]["ks_d"] == 0.0 and out["same"]["p_raw"] == 1.0
    assert not out["same"]["reject"]
    assert out["shifted"]["ks_d"] == 1.0 and out["shifted"]["reject"]
    assert out["shifted"]["p_bh"] <= 0.05 < out["same"]["p_bh"]
    ranked = sorted(out.values(), key=lambda r: r["rank"])
    for a, b in zip(ranked, ranked[1:]):
        assert a["p_bh"] <= b["p_bh"]


def test_ks_fdr_bh_adjustment_caps_at_one(spark, tmp_path):
    """All-identical arms across several types: every p_raw = 1 and the
    step-up min(p*m/i) must stay capped at 1, no rejections."""
    rows, eid = [], 0
    for t in ("t1", "t2", "t3"):
        for v in range(20):
            rows.append((eid, 0, 0, t, float(v))); eid += 1  # noqa: E702
            rows.append((eid, 0, 1, t, float(v))); eid += 1  # noqa: E702
    _write_events(spark, str(tmp_path), rows)
    out = _fn("events_ks_fdr")(spark, str(tmp_path)).collect()
    assert len(out) == 3
    assert all(r["p_bh"] == 1.0 and not r["reject"] for r in out)


# ---------------------------------------------------------------------------
# Theil-Sen


def test_theil_sen_robust_to_outlier_day(spark, tmp_path):
    """Daily means follow v = 2*day exactly except one wild outlier day;
    the median pairwise slope must still be exactly 2. (An OLS fit
    through day 3 = 100 would be far off — that's the point.)"""
    rows = [(d, d, 0, "m", 2.0 * d if d != 3 else 100.0)
            for d in range(7)]
    _write_events(spark, str(tmp_path), rows)
    out = _fn("events_theil_sen")(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == 7 and r["n_pairs"] == 21
    assert r["ts_slope"] == 2.0


def test_theil_sen_uses_daily_means_not_raw_points(spark, tmp_path):
    """Two points per day averaging to 3*day: slope must be 3 — the
    pair space is the daily rollup, not raw events."""
    rows = []
    for d in range(5):
        rows.append((2 * d, d, 0, "m", 3.0 * d - 1.0))
        rows.append((2 * d + 1, d, 1, "m", 3.0 * d + 1.0))
    _write_events(spark, str(tmp_path), rows)
    r = _fn("events_theil_sen")(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 5 and r["n_pairs"] == 10
    assert r["ts_slope"] == 3.0


# ---------------------------------------------------------------------------
# Cohen's kappa / calibration


def _write_docs(spark, path, texts):
    data = [(int(i), t, "en", "src_00", len(t)) for i, t in enumerate(texts)]
    (spark.createDataFrame(
        data, "doc_id long, text string, lang string, source string, "
              "n_chars long")
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{path}/documents.parquet"))


GOOD = ("the quick brown fox jumps over the lazy dog and then they have "
        "a long conversation about the weather that covers many pleasant "
        "topics with plenty of common words to be sure the rules pass "
        "and the classifier margin stays comfortably positive overall "
        "because stopwords abound and repetition stays low here today")
BAD = "### ### ### ### ### ### ### ### ### ### ### ###"


def test_kappa_perfect_agreement_is_one(spark, tmp_path):
    """A corpus where both filters agree on every doc (clean prose both
    keep; symbol spam both drop) => kappa = 1 with both diagonal cells
    populated."""
    _write_docs(spark, str(tmp_path), [GOOD] * 6 + [BAD] * 4)
    r = _fn("docs_quality_kappa")(spark, str(tmp_path)).collect()[0]
    assert r["n"] == 10
    assert r["n11"] == 6 and r["n00"] == 4
    assert r["n10"] == 0 and r["n01"] == 0
    assert r["kappa"] == 1.0


def test_kappa_gold_not_degenerate_on_corpus(spark, sf_dir):
    """On the real corpus the gold rater must populate BOTH classes —
    the ADVICE r5 regression: the Gopher rules kept 0 of 500 docs here,
    algebraically forcing kappa to 0 (a constant gate that could never
    catch a classifier regression). With quality_filter_exprs as gold,
    (n11 + n10) and (n01 + n00) are both nonzero."""
    r = _fn("docs_quality_kappa")(spark, sf_dir).collect()[0]
    assert r["n11"] + r["n10"] > 0, "gold keeps nothing — degenerate"
    assert r["n01"] + r["n00"] > 0, "gold drops nothing — degenerate"


def test_calibration_pos_rate_not_degenerate_on_corpus(spark, sf_dir):
    """Companion to the kappa gold check: at least one calibration bin
    must have a nonzero pos_rate (the Gopher gold pinned every bin's
    pos_rate at exactly 0.0 — ADVICE r5)."""
    out = _fn("docs_calibration_bins")(spark, sf_dir).collect()
    assert any(r["pos_rate"] > 0 for r in out)


def test_calibration_bins_invariants(spark, sf_dir):
    """On the real corpus: bins in 0..9, counts sum to the corpus, the
    per-bin mean predicted probability sits inside its bin bounds, and
    pos_rate is a valid rate."""
    from nexusbase_spark.datamodel import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    out = _fn("docs_calibration_bins")(spark, sf_dir).collect()
    assert sum(r["n"] for r in out) == n_docs
    for r in out:
        assert 0 <= r["bin"] <= 9
        assert r["bin"] / 10 - 1e-4 <= r["mean_p"] <= (r["bin"] + 1) / 10
        assert 0.0 <= r["pos_rate"] <= 1.0


# ---------------------------------------------------------------------------
# Heaps' law


def test_heaps_law_linear_vocab_growth(spark, tmp_path):
    """Every doc contributes exactly one never-seen token among ten:
    V ~ N/10 + 1, so the log-log slope is ~1 (0.96 with the +1 offset
    over this range). Checkpoints must be monotone with vocab <=
    tokens."""
    texts = [f"w{i:03d} " + " ".join(["the"] * 9) for i in range(100)]
    _write_docs(spark, str(tmp_path), texts)
    out = sorted(_fn("docs_heaps_law")(spark, str(tmp_path)).collect(),
                 key=lambda r: r["tile"])
    assert len(out) == 10
    assert out[-1]["cum_tokens"] == 1000 and out[-1]["cum_vocab"] == 101
    for a, b in zip(out, out[1:]):
        assert a["cum_tokens"] < b["cum_tokens"]
        assert a["cum_vocab"] <= b["cum_vocab"]
        assert b["cum_vocab"] <= b["cum_tokens"]
    beta = out[0]["heaps_beta"]
    assert all(r["heaps_beta"] == beta for r in out)
    assert 0.90 <= beta <= 1.0


def test_heaps_law_constant_vocab_is_flat(spark, tmp_path):
    """A corpus that never adds vocabulary after the first bucket:
    beta ~ 0 (vocab curve flat in log-log)."""
    texts = ["alpha beta gamma delta epsilon"] * 100
    _write_docs(spark, str(tmp_path), texts)
    out = _fn("docs_heaps_law")(spark, str(tmp_path)).collect()
    assert all(r["cum_vocab"] == 5 for r in out)
    assert all(abs(r["heaps_beta"]) < 1e-9 for r in out)


# ---------------------------------------------------------------------------
# centroid drift


def test_centroid_drift_identical_batches(spark, tmp_path):
    """All vectors identical => every consecutive-batch centroid pair
    has cosine exactly 1.0 and batches of 10."""
    vec = [0.5, -0.25, 0.125, 1.0]
    data = [(int(i), vec, 0) for i in range(80)]
    (spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int")
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{tmp_path}/embeddings.parquet"))
    out = _fn("embed_centroid_drift")(spark, str(tmp_path)).collect()
    assert len(out) == 7
    assert all(r["cosine"] == 1.0 for r in out)
    assert all(r["n_from"] == 10 and r["n_to"] == 10 for r in out)


def test_centroid_drift_orthogonal_batches(spark, tmp_path):
    """First half on axis 0, second half on axis 1: the pair crossing
    the midpoint has cosine 0; within-half pairs stay 1."""
    data = [(int(i), [1.0, 0.0], 0) for i in range(40)]
    data += [(int(40 + i), [0.0, 1.0], 0) for i in range(40)]
    (spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int")
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{tmp_path}/embeddings.parquet"))
    out = {(r["batch_from"], r["batch_to"]): r["cosine"]
           for r in _fn("embed_centroid_drift")(spark,
                                                str(tmp_path)).collect()}
    assert out[(3, 4)] == 0.0
    for pair, cos in out.items():
        if pair != (3, 4):
            assert cos == 1.0


# ---------------------------------------------------------------------------
# ANOVA / Benford / Gini


def test_anova_equal_means_f_zero(spark, tmp_path):
    """Identical group distributions => SSB = 0 => F = 0, eta^2 = 0."""
    rows = [(i, 0, 0, t, float(v)) for i, (t, v) in enumerate(
        [("A", 1), ("A", 2), ("A", 3), ("B", 1), ("B", 2), ("B", 3)])]
    _write_events(spark, str(tmp_path), rows)
    r = _fn("events_anova")(spark, str(tmp_path)).collect()[0]
    assert r["k"] == 2 and r["dof_between"] == 1 and r["dof_within"] == 4
    assert r["f_stat"] == 0.0 and r["eta_sq"] == 0.0


def test_anova_hand_computed_f(spark, tmp_path):
    """A = {1,2}, B = {3,4}: SSB = 4, SSW = 1, dof (1, 2) => F = 8,
    eta^2 = 0.8."""
    rows = [(0, 0, 0, "A", 1.0), (1, 0, 0, "A", 2.0),
            (2, 0, 0, "B", 3.0), (3, 0, 0, "B", 4.0)]
    _write_events(spark, str(tmp_path), rows)
    r = _fn("events_anova")(spark, str(tmp_path)).collect()[0]
    assert r["f_stat"] == 8.0 and r["eta_sq"] == 0.8


def _write_orders(spark, path, prices):
    data = [(int(i), int(i), "O", float(p),
             datetime.datetime(2024, 1, 1), "1-URGENT")
            for i, p in enumerate(prices)]
    (spark.createDataFrame(
        data, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string")
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet"))


def test_benford_all_digit_one(spark, tmp_path):
    """Every total starts with 1: obs_freq(1) = 1, the other eight
    digits emit zero-count rows that still contribute expectation to
    the GOF chi2 = N*((1-p1)^2/p1 + (1-p1))."""
    import math
    _write_orders(spark, str(tmp_path), [1000.0 + i for i in range(100)])
    out = {r["digit"]: r for r in
           _fn("orders_benford")(spark, str(tmp_path)).collect()}
    assert set(out) == set(range(1, 10))
    assert out[1]["n"] == 100 and out[1]["obs_freq"] == 1.0
    assert all(out[d]["n"] == 0 for d in range(2, 10))
    p1 = math.log10(2)
    want = 100 * ((1 - p1) ** 2 / p1 + (1 - p1))
    want_q = math.floor(want * 1e4 + 0.5) / 1e4
    # per-digit contributions are 1e-6-quantized before the sum, so the
    # recomputation can differ by <= 9e-6 before the 4dp quantize
    assert abs(out[1]["chi2"] - want_q) <= 2e-4
    assert out[1]["exp_freq"] == math.floor(p1 * 1e4 + 0.5) / 1e4


def _write_lineitem(spark, path, rows):
    """rows: (orderkey, partkey, extendedprice, discount)."""
    data = [(int(o), int(p), 1, 1, 1.0, float(e), float(d), 0.0,
             "N", "O", datetime.datetime(2024, 1, 1))
            for o, p, e, d in rows]
    (spark.createDataFrame(
        data, "l_orderkey long, l_partkey long, l_suppkey long, "
              "l_linenumber int, l_quantity double, "
              "l_extendedprice double, l_discount double, l_tax double, "
              "l_returnflag string, l_linestatus string, "
              "l_shipdate timestamp")
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{path}/lineitem.parquet"))


def test_gini_uniform_revenue_is_zero(spark, tmp_path):
    """Ten parts with identical revenue: Gini = 0 and the Lorenz curve
    is the diagonal (cum share = decile/10)."""
    _write_lineitem(spark, str(tmp_path),
                    [(i, i, 100.0, 0.0) for i in range(10)])
    out = sorted(_fn("lineitem_gini_revenue")(spark,
                                              str(tmp_path)).collect(),
                 key=lambda r: r["decile"])
    assert all(r["gini"] == 0.0 for r in out)
    for r in out:
        assert r["cum_rev_share"] == r["decile"] / 10
    assert out[-1]["cum_rev_share"] == 1.0


def test_gini_single_part_concentration(spark, tmp_path):
    """One part holds all revenue among n=10: Gini = (n-1)/n = 0.9;
    Lorenz stays 0 until the top decile."""
    rows = [(i, i, 0.01, 0.0) for i in range(9)]  # ~1 cent each
    rows.append((9, 9, 1e9, 0.0))
    _write_lineitem(spark, str(tmp_path), rows)
    out = sorted(_fn("lineitem_gini_revenue")(spark,
                                              str(tmp_path)).collect(),
                 key=lambda r: r["decile"])
    # 1-cent parts are ~1e-11 of total: shares round to 0 below the top
    assert all(r["cum_rev_share"] == 0.0 for r in out[:-1])
    assert out[-1]["cum_rev_share"] == 1.0
    assert all(abs(r["gini"] - 0.9) < 1e-3 for r in out)


# ---------------------------------------------------------------------------
# in-engine ANN recall


def _write_embeddings(spark, path, rows):
    """rows: (vec_id, embedding list, label)."""
    data = [(int(i), [float(x) for x in v], int(lb)) for i, v, lb in rows]
    (spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int")
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{path}/embeddings.parquet"))


def test_ivf_recall_detects_missed_partition(spark, tmp_path):
    """A 'stealth' vector sits closest to the probe but inside a
    partition whose CENTROID points away — IVF(nprobe=2) never scans
    it, so in-engine recall@10 must be < 1 and equal exactly the
    shortlist intersection (here 4/10: only the label-0/1 vectors are
    reachable)."""
    rows = [(0, [1.0, 0.0, 0.0, 0.0], 0),          # probe
            (1, [0.9, 0.1, 0.0, 0.0], 0),
            (2, [0.8, 0.2, 0.0, 0.0], 1),
            (3, [0.82, 0.18, 0.0, 0.0], 1),
            (4, [0.78, 0.22, 0.0, 0.0], 1),
            (5, [0.99, 0.01, 0.0, 0.0], 2)]        # stealth, best match
    # drown label 2's centroid with orthogonal mass
    rows += [(6 + i, [0.0, 1.0, 0.0, 0.0], 2) for i in range(9)]
    _write_embeddings(spark, str(tmp_path), rows)
    r = _fn("embed_ivf_recall")(spark, str(tmp_path)).collect()[0]
    assert r["k"] == 10
    assert r["n_hits"] == 4
    assert r["recall"] == 0.4


def test_ivf_recall_perfect_when_partitions_cover(spark, tmp_path):
    """All corpus vectors live in the two probed partitions => IVF
    returns the brute list exactly => recall = 1."""
    rows = [(0, [1.0, 0.0, 0.0, 0.0], 0)]
    rows += [(1 + i, [0.9 - 0.01 * i, 0.1, 0.0, 0.0], i % 2)
             for i in range(12)]
    _write_embeddings(spark, str(tmp_path), rows)
    r = _fn("embed_ivf_recall")(spark, str(tmp_path)).collect()[0]
    assert r["n_hits"] == 10 and r["recall"] == 1.0


# ---------------------------------------------------------------------------
# AUC / n-gram novelty


def test_quality_auc_separable_corpus_is_one(spark, tmp_path):
    """Kept docs all score above dropped docs => AUC = 1 (perfect
    ranking): clean mid-length prose vs digit-spam that fails
    high_digit AND scores a deeply negative margin."""
    good = ("the cat and the dog walked to the park and that was a fine "
            "day for all of them to be out with friends in the sun")
    bad = "11111 22222 33333 44444 55555 66666 77777 88888 99999 " \
          "11111 22222 33333 44444 55555 66666"
    _write_docs(spark, str(tmp_path), [good + f" x{i}" for i in range(5)]
                + [bad + f" y{i}" for i in range(5)])
    r = _fn("docs_quality_auc")(spark, str(tmp_path)).collect()[0]
    assert r["n_pos"] == 5 and r["n_neg"] == 5
    assert r["auc"] == 1.0


def test_quality_auc_degenerate_class_is_null(spark, tmp_path):
    """All docs in one class (everything too short): AUC undefined =>
    NULL, not a crash."""
    _write_docs(spark, str(tmp_path), ["tiny doc"] * 5)
    r = _fn("docs_quality_auc")(spark, str(tmp_path)).collect()[0]
    assert r["n_pos"] == 0 and r["n_neg"] == 5
    assert r["auc"] is None


def test_ngram_novelty_exact_copy_scores_zero(spark, tmp_path):
    """Doc 1 repeats doc 0 verbatim: every 3-gram was first seen in doc
    0, so doc 1's novelty is 0 and doc 0's is 1. A half-overlapping doc
    scores strictly between."""
    base = "alpha beta gamma delta epsilon zeta"
    half = "alpha beta gamma delta nova comet quasar pulsar"
    _write_docs(spark, str(tmp_path), [base, base, half])
    out = {r["doc_id"]: r for r in
           _fn("docs_ngram_novelty")(spark, str(tmp_path)).collect()}
    assert out[0]["novelty"] == 1.0 and out[0]["n_grams"] == 4
    assert out[1]["novelty"] == 0.0
    # half: grams = 6; 'alpha beta gamma', 'beta gamma delta' seen;
    # 'gamma delta nova' + 3 more novel => 4/6
    assert out[2]["n_grams"] == 6 and out[2]["novel"] == 4
    assert abs(out[2]["novelty"] - 0.6667) < 1e-9


def test_ngram_novelty_short_docs_excluded(spark, tmp_path):
    """Docs under 3 tokens have no 3-grams and emit no row (never a
    divide-by-zero)."""
    _write_docs(spark, str(tmp_path), ["one two", "a b c d"])
    out = {r["doc_id"] for r in
           _fn("docs_ngram_novelty")(spark, str(tmp_path)).collect()}
    assert out == {1}


# ---------------------------------------------------------------------------
# label propagation


def test_label_propagation_hand_graph(spark):
    """Two seeds (1->10, 6->20) on a six-node graph: direct neighbors
    adopt in round 1, two-hop in round 2, an equal-vote tie takes the
    SMALLEST label, and seeds never flip."""
    from nexusbase_spark.pipeline.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (6, 4), (1, 5), (6, 5), (6, 1)],
        "src long, dst long")
    seeds = spark.createDataFrame([(1, 10), (6, 20)], "id long, label int")
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "id long")

    one = {r["id"]: r["label"] for r in
           label_propagation(edges, seeds, nodes, iters=1).collect()}
    assert one == {1: 10, 2: 10, 3: None, 4: 20, 5: 10, 6: 20}

    two = {r["id"]: r["label"] for r in
           label_propagation(edges, seeds, nodes, iters=2).collect()}
    assert two == {1: 10, 2: 10, 3: 10, 4: 20, 5: 10, 6: 20}


def test_label_propagation_majority_beats_tiebreak(spark):
    """Vote counts decide before the tie-break: two label-20 neighbors
    outvote one label-10 neighbor even though 10 < 20."""
    from nexusbase_spark.pipeline.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9)], "src long, dst long")
    seeds = spark.createDataFrame(
        [(1, 20), (2, 20), (3, 10)], "id long, label int")
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 9)], "id long")
    out = {r["id"]: r["label"] for r in
           label_propagation(edges, seeds, nodes, iters=1).collect()}
    assert out[9] == 20


# ---------------------------------------------------------------------------
# Holt backtest


def test_holt_backtest_perfect_linear_series_zero_error(spark):
    """A perfectly linear series: Holt's seed (l=x1, b=x2-x1) locks the
    exact trend, every one-step forecast is exact => MAE = RMSE = 0."""
    from nexusbase_spark.operators.timeseries import holt_backtest

    rows = [("u", i, i, 10.0 + 2.0 * i) for i in range(8)]
    df = spark.createDataFrame(rows, "user string, ts long, seq long, "
                                     "value double")
    r = holt_backtest(df, ["user"], 0.4, 0.3).collect()[0]
    assert r["n"] == 8
    assert r["mae"] == 0.0 and r["rmse"] == 0.0


def test_holt_backtest_hand_computed_three_points(spark):
    """Three points: the only scored step is x_3. Seed l=1, b=1 (peeks
    x_2); after consuming x_2=2: l2 = .4*2+.6*2 = 2, b2 = .3*(2-1)+.7*1
    = 1; forecast for x_3 = 3 is l2+b2 = 3 — but x_3 = 10, so MAE =
    RMSE = 7."""
    from nexusbase_spark.operators.timeseries import holt_backtest

    rows = [("u", 0, 0, 1.0), ("u", 1, 1, 2.0), ("u", 2, 2, 10.0)]
    df = spark.createDataFrame(rows, "user string, ts long, seq long, "
                                     "value double")
    r = holt_backtest(df, ["user"], 0.4, 0.3).collect()[0]
    assert r["n"] == 3
    assert abs(r["mae"] - 7.0) < 1e-12
    assert abs(r["rmse"] - 7.0) < 1e-12


def test_holt_backtest_drops_short_series(spark):
    """Series with fewer than 3 points have no scored step and emit no
    row."""
    from nexusbase_spark.operators.timeseries import holt_backtest

    rows = [("a", 0, 0, 1.0), ("a", 1, 1, 2.0), ("b", 0, 0, 5.0)]
    df = spark.createDataFrame(rows, "user string, ts long, seq long, "
                                     "value double")
    assert holt_backtest(df, ["user"], 0.4, 0.3).count() == 0


# ---------------------------------------------------------------------------
# two-proportion z-test


def test_proportion_ztest_hand_computed(spark, tmp_path):
    """Arm A converts 3/4 users, arm B 1/4 (conversion = a purchase
    with value > 150): z = (0.75-0.25)/sqrt(.5*.5*(1/4+1/4)) ~ 1.4142.
    Per-user dedup must count a multi-purchase user once."""
    rows = []
    # arm A (even user ids 0,2,4,6): users 0,2,4 convert (user 0 twice)
    for i, u in enumerate((0, 0, 2, 4)):
        rows.append((i, 0, u, "purchase", 200.0))
    rows.append((10, 0, 6, "purchase", 10.0))        # A non-converter
    # arm B (odd 1,3,5,7): only user 1 converts
    rows.append((11, 0, 1, "purchase", 200.0))
    for i, u in enumerate((3, 5, 7)):
        rows.append((20 + i, 0, u, "view", 500.0))   # wrong type
    _write_events(spark, str(tmp_path), rows)
    r = _fn("events_proportion_ztest")(spark, str(tmp_path)).collect()[0]
    assert (r["n_a"], r["k_a"], r["n_b"], r["k_b"]) == (4, 3, 4, 1)
    assert r["rate_a"] == 0.75 and r["rate_b"] == 0.25
    assert abs(r["z"] - 1.4142) < 1e-9


# ---------------------------------------------------------------------------
# cluster purity


def test_cluster_purity_mixed_and_pure_groups(spark, tmp_path):
    """Two well-separated geometric groups of four: group one carries
    labels [0,0,1,1] (majority 2 of 4), group two is pure label 2 =>
    purity = (2+4)/8 = 0.75 over exactly two clusters. In-group top-3
    neighbors are complete (4 nodes, k=3), cross-group cosine ~0 falls
    under the 0.2 mutual threshold."""
    rows = [(i, [1.0, 0.01 * i, 0.0, 0.0], i // 2) for i in range(4)]
    rows += [(4 + i, [0.01 * i, 1.0, 0.0, 0.0], 2) for i in range(4)]
    _write_embeddings(spark, str(tmp_path), rows)
    r = _fn("embed_cluster_purity")(spark, str(tmp_path)).collect()[0]
    assert r["n_nodes"] == 8
    assert r["n_clusters"] == 2
    assert r["purity"] == 0.75


def test_dedup_clusters_warns_when_unconverged(spark):
    """Hitting max_iters before fixpoint is an answer-correctness
    hazard (split components), so it must warn: a 6-node path needs ~5
    min-label rounds; max_iters=1 leaves labels changing."""
    import warnings

    from nexusbase_spark.pipeline.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "id_a long, id_b long")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dedup_clusters(pairs, max_iters=1).collect()
    assert any("max_iters" in str(x.message) for x in w)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = dedup_clusters(pairs, max_iters=50).collect()
    assert not any("max_iters" in str(x.message) for x in w)
    assert {r["canonical_id"] for r in out} == {0}


def test_dedup_clusters_rejects_nonpositive_max_iters(spark):
    """max_iters <= 0 means the loop body never runs — before the guard
    this reached the unconverged warning with `changed` unbound and
    raised NameError instead of a clear error (ADVICE r5)."""
    import pytest

    from nexusbase_spark.pipeline.dedup import dedup_clusters

    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="max_iters"):
        dedup_clusters(pairs, max_iters=0)


# ---------------------------------------------------------------------------
# seasonal-naive backtest / burstiness


def test_seasonal_naive_exact_weekly_pattern_zero_error(spark, tmp_path):
    """A perfectly weekly series (v = day mod 7): every lag-7 forecast
    is exact => MAE = RMSE = 0 over n_days - 7 scored days."""
    rows = [(d, d, 0, "m", float(d % 7)) for d in range(21)]
    _write_events(spark, str(tmp_path), rows)
    r = _fn("events_seasonal_naive_backtest")(spark,
                                              str(tmp_path)).collect()[0]
    assert r["n_eval"] == 14
    assert r["mae"] == 0.0 and r["rmse"] == 0.0


def test_seasonal_naive_constant_shift_exact_error(spark, tmp_path):
    """Week 2 runs exactly 3 above week 1: MAE = RMSE = 3."""
    rows = [(d, d, 0, "m", 10.0 + (3.0 if d >= 7 else 0.0))
            for d in range(14)]
    _write_events(spark, str(tmp_path), rows)
    r = _fn("events_seasonal_naive_backtest")(spark,
                                              str(tmp_path)).collect()[0]
    assert r["n_eval"] == 7
    assert r["mae"] == 3.0 and r["rmse"] == 3.0


def test_burstiness_metronome_cv_zero(spark, tmp_path):
    """Perfectly regular arrivals (one event per day): every gap equal
    => CV = 0, mean gap = 86400 s."""
    rows = [(d, d, 0, "m", 1.0) for d in range(10)]
    _write_events(spark, str(tmp_path), rows)
    r = _fn("events_interarrival_burstiness")(spark,
                                              str(tmp_path)).collect()[0]
    assert r["n_gaps"] == 9
    assert r["mean_gap_sec"] == 86400.0
    assert r["cv"] == 0.0


def test_burstiness_bursty_series_cv_above_one(spark, tmp_path):
    """Nine same-day events then one a week later: gaps are eight zeros
    plus one huge — CV far above 1 (bursty), and the mean gap is the
    week divided by nine."""
    rows = [(i, 0, 0, "m", 1.0) for i in range(9)]
    rows.append((9, 7, 0, "m", 1.0))
    _write_events(spark, str(tmp_path), rows)
    r = _fn("events_interarrival_burstiness")(spark,
                                              str(tmp_path)).collect()[0]
    assert r["n_gaps"] == 9
    assert r["cv"] > 1.0
    assert abs(r["mean_gap_sec"] - 7 * 86400 / 9) < 0.01


# ---------------------------------------------------------------------------
# Hill tail index


def test_hill_tail_index_constructed_tail(spark, tmp_path):
    """Order totals built with exact log-spacing ln(x_i) - ln(x_101)
    = 0.01*(101-i): the Hill sum is 0.01*5050 = 50.5, so alpha =
    100/50.5 = 1.9802 (4dp)."""
    import math
    prices = [100.0 * math.exp(0.01 * (101 - i)) for i in range(1, 102)]
    prices += [50.0] * 30   # below the tail window, must not matter
    _write_orders(spark, str(tmp_path), prices)
    r = _fn("orders_hill_tail_index")(spark, str(tmp_path)).collect()[0]
    assert r["k"] == 100
    assert abs(r["x_ref"] - 100.0) < 1e-6
    assert abs(r["hill_alpha"] - math.floor(100.0 / 50.5 * 1e4 + 0.5) / 1e4) \
        < 1e-9


def test_hill_tail_index_small_table_emits_zero_rows(spark, tmp_path):
    """With <= 100 orders there is no x_(101) reference, so the
    estimator is undefined: both the Spark query and the oracle's
    `FROM s, k` (k empty) must emit ZERO rows, not one NULL row
    (ADVICE r5 — a global agg emitted the NULL row before)."""
    _write_orders(spark, str(tmp_path), [100.0] * 100)
    assert _fn("orders_hill_tail_index")(spark, str(tmp_path)).count() == 0


# ---------------------------------------------------------------------------
# MinHash LSH recall


def test_minhash_recall_invariants(spark, sf_dir):
    """On the real corpus with synthetic duplicates: truth is non-empty,
    LSH-verified pairs are a SUBSET of truth (verification guarantees
    precision = 1, so n_lsh <= n_true and recall = n_lsh/n_true), and
    recall lands in (0, 1]."""
    r = _fn("doc_minhash_recall")(spark, sf_dir).collect()[0]
    assert r["n_true"] > 0
    assert 0 < r["n_lsh"] <= r["n_true"]
    assert r["recall"] is not None and 0 < r["recall"] <= 1.0
    import math
    assert abs(r["recall"]
               - math.floor(r["n_lsh"] / r["n_true"] * 1e4 + 0.5) / 1e4) \
        < 1e-9


# ---------------------------------------------------------------------------
# ABC / dominant period / norm QC


def test_abc_classification_hand_built(spark, tmp_path):
    """Classification uses the cumulative share BEFORE each part
    (integer cross-multiplied), so the part that CROSSES a boundary
    belongs to the class it starts in: part0 (79%) and part1 (before =
    79 < 80) are A; part2 (before = 94 < 95) is B; part3 is C."""
    rows = [(0, 0, 79.0, 0.0), (1, 1, 15.0, 0.0),
            (2, 2, 5.0, 0.0), (3, 3, 1.0, 0.0)]
    _write_lineitem(spark, str(tmp_path), rows)
    out = {r["abc_class"]: r for r in
           _fn("lineitem_abc_classification")(spark,
                                              str(tmp_path)).collect()}
    assert out["A"]["n_parts"] == 2 and out["A"]["rev_share"] == 0.94
    assert out["B"]["n_parts"] == 1 and out["B"]["rev_share"] == 0.05
    assert out["C"]["n_parts"] == 1 and out["C"]["rev_share"] == 0.01


def test_dominant_period_finds_planted_cycle(spark, tmp_path):
    """A clean 5-day cycle over 40 days: the argmax ACF lag must be 5
    (and 10 would tie in pattern but 5 wins on more overlapping pairs
    and the shorter-lag tie-break)."""
    rows = [(d, d, 0, "m", float((d % 5) * 10)) for d in range(40)]
    _write_events(spark, str(tmp_path), rows)
    out = _fn("events_dominant_period")(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["period_days"] == 5
    assert r["acf"] > 0.8


def test_norm_profile_detects_zero_vectors(spark, tmp_path):
    """Two unit vectors and one all-zero vector under one label: n_zero
    = 1, min_norm = 0, max_norm = 1."""
    rows = [(0, [1.0, 0.0], 7), (1, [0.0, 1.0], 7), (2, [0.0, 0.0], 7)]
    _write_embeddings(spark, str(tmp_path), rows)
    r = _fn("embed_norm_profile")(spark, str(tmp_path)).collect()[0]
    assert r["label"] == 7 and r["n_vecs"] == 3
    assert r["n_zero"] == 1
    assert r["min_norm"] == 0.0 and r["max_norm"] == 1.0
    assert abs(r["mean_norm"] - 0.6667) < 1e-9


# ---------------------------------------------------------------------------
# PQ distortion


@pytest.mark.nightly
def test_pq_distortion_zero_on_codebook_points(spark, tmp_path):
    """A corpus of exactly four distinct 64-dim vectors (each repeated):
    Lloyd seeds on the first four rows, every assignment is exact, every
    centroid lands ON its points => reconstruction MSE = 0 in all four
    subspaces."""
    pats = [0.5, -0.5, 0.25, -0.25]
    rows = [(i, [pats[i % 4]] * 64, 0) for i in range(20)]
    _write_embeddings(spark, str(tmp_path), rows)
    # fresh cache key per tmp_path: _pq_trained memoizes on sf_dir
    out = _fn("embed_pq_distortion")(spark, str(tmp_path)).collect()
    assert len(out) == 4
    for r in out:
        assert r["n_vecs"] == 20
        assert r["mse"] == 0.0 and r["max_se"] == 0.0


# ---------------------------------------------------------------------------
# dedup rate curve


@pytest.mark.nightly
def test_dedup_rate_curve_monotone_and_zero_rows(spark, sf_dir):
    """On the real corpus: five threshold rows always present, both
    curves monotone NON-INCREASING in the threshold, and
    n_dup_docs <= 2 * n_pairs."""
    out = sorted(_fn("docs_dedup_rate_curve")(spark, sf_dir).collect(),
                 key=lambda r: r["threshold"])
    assert [r["threshold"] for r in out] == [0.5, 0.6, 0.7, 0.8, 0.9]
    for a, b in zip(out, out[1:]):
        assert a["n_pairs"] >= b["n_pairs"]
        assert a["n_dup_docs"] >= b["n_dup_docs"]
    for r in out:
        assert r["n_dup_docs"] <= 2 * r["n_pairs"]
    assert out[0]["n_pairs"] > 0  # synthetic copies guarantee pairs


# ---------------------------------------------------------------------------
# token budget curve / seasonal strength


def test_token_budget_curve_invariants(spark, sf_dir):
    """cum_tokens is non-decreasing reading from the best bin DOWN (bin
    desc), the worst surviving cut covers the whole corpus
    (cum_share = 1 at the lowest bin), and doc counts sum to the
    corpus."""
    from nexusbase_spark.datamodel import load_table

    out = sorted(_fn("docs_token_budget_curve")(spark, sf_dir).collect(),
                 key=lambda r: -r["bin"])
    for a, b in zip(out, out[1:]):
        assert a["cum_tokens"] <= b["cum_tokens"]
        assert a["cum_share"] <= b["cum_share"] + 1e-9
    assert out[-1]["cum_share"] == 1.0
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in out) == n_docs


@pytest.mark.nightly
def test_seasonal_strength_planted_cycles(spark, tmp_path):
    """A metric whose hourly volume is a clean 24h cycle scores high
    seasonal strength; a flat-volume metric scores ~0 on both. (Events
    at hour granularity: h events in hour-of-day h for 'cyc', constant
    1/hour for 'flat', over 6 days.)"""
    rows, eid = [], 0
    for day in range(6):
        for h in range(24):
            # hourly slots: ts = day*24h + h hours -> encode via day grain
            # trick: use day*24+h as "day" param scaled down is wrong;
            # write explicit datetimes instead
            pass
    import datetime as dt
    data = []
    for day in range(6):
        for h in range(24):
            t = dt.datetime(2024, 1, 1 + day, h)
            for _ in range(1 + (h if True else 0)):
                pass
            n_cyc = 1 + (h % 24)
            for i in range(n_cyc):
                data.append((eid, t, 0, "cyc", 1.0, "{}")); eid += 1  # noqa: E702,E501
            data.append((eid, t, 0, "flat", 1.0, "{}")); eid += 1  # noqa: E702,E501
    (spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{tmp_path}/events.parquet"))
    out = {r["metric"]: r for r in
           _fn("events_seasonal_strength")(spark, str(tmp_path)).collect()}
    assert out["cyc"]["seasonal_strength"] > 0.8
    assert out["flat"]["seasonal_strength"] < 0.2
    assert out["flat"]["trend_strength"] < 0.2


# ---------------------------------------------------------------------------
# HLL (md5-register, hash-gated)


def test_hll_md5_single_user_linear_counting(spark, tmp_path):
    """One distinct user on one day: 255 empty registers, estimate =
    256*ln(256/255) (linear counting), 4dp-floor-quantized — the exact
    closed form, no tolerance."""
    import math

    _write_events(spark, str(tmp_path),
                  [(i, 0, 7, "m", 1.0) for i in range(5)])  # 5 rows, 1 user
    r = _fn("events_hll_md5_daily_users")(spark, str(tmp_path)).collect()
    assert len(r) == 1
    assert r[0]["zero_regs"] == 255
    want = math.floor(256.0 * math.log(256.0 / 255.0) * 1e4 + 0.5) / 1e4
    assert r[0]["hll_users"] == want


@pytest.mark.nightly
def test_hll_md5_estimate_tracks_exact_cardinality(spark, tmp_path):
    """1000 distinct users on one day (m=256 registers, std err ~6.5%):
    the estimate lands within 20% of the truth, and a second day with
    10 users stays in the accurate linear-counting regime (within 5%)."""
    rows = [(i, 0, i, "m", 1.0) for i in range(1000)]
    rows += [(10_000 + i, 1, i, "m", 1.0) for i in range(10)]
    _write_events(spark, str(tmp_path), rows)
    got = {r["day"]: r["hll_users"] for r in
           _fn("events_hll_md5_daily_users")(spark, str(tmp_path)).collect()}
    d0 = sorted(got)[0]
    d1 = sorted(got)[1]
    assert abs(got[d0] - 1000) / 1000 < 0.20
    assert abs(got[d1] - 10) / 10 < 0.05
