"""ExactDupIndex: the materialized LOSSLESS near-dup path (probe frozen
prefix postings instead of re-running the corpus-wide exact join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexusbase_spark.pipeline.dedup import prefix_filter_pairs
from nexusbase_spark.pipeline.ppjoin_index import ExactDupIndex


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "sphinx of black quartz judge my vow"),
    (4, "how vexingly quick daft zebras jump"),
]


def test_probe_is_lossless_vs_batch_kernel(spark, tmp_path):
    """Probe finds exactly the cross pairs the corpus-wide
    prefix_filter_pairs finds on the union (restricted new-vs-old), with
    identical inter/uni/jaccard — including a near-dup whose shared
    tokens are all FREQUENT at build time (the frozen-order stress) and
    a doc made of tokens the index has never seen."""
    new = [
        (11, "the quick brown fox jumps over the lazy cat"),  # ~doc 1
        (12, "totally novel vocabulary nowhere in the index"),
        (13, "unseen tokens qq ww ee rr tt yy"),
    ]
    ix = ExactDupIndex.build(spark, str(tmp_path / "ix"),
                             _corpus(spark, BASE), min_threshold=0.5)
    got = {(r["new_id"], r["old_id"]): (r["inter"], r["uni"], r["jaccard"])
           for r in ix.probe(_corpus(spark, new), threshold=0.5).collect()}

    batch = prefix_filter_pairs(_corpus(spark, BASE + new), threshold=0.5)
    want = {}
    for r in batch.collect():
        a, b = r["id_a"], r["id_b"]
        if (a > 10) != (b > 10):
            new_id, old_id = (a, b) if a > 10 else (b, a)
            want[(new_id, old_id)] = (r["inter"], r["uni"], r["jaccard"])
    assert got == want and (11, 1) in got
    assert ix.doc_count() == 4  # read-only

    # below-min threshold refuses (stored prefixes would be lossy)
    with pytest.raises(ValueError, match="below index min"):
        ix.probe(_corpus(spark, new), threshold=0.3)


def test_probe_max_bucket_inherits_skew_guard(spark, tmp_path):
    """One hot template token in index HISTORY can't make every future
    probe quadratic (VERDICT r5 #7): with max_bucket the store's hot
    prefix buckets are dropped with a warning, the probe completes, and
    a rare-token near-dup is still found exactly; without max_bucket
    the probe stays exhaustively lossless."""
    import warnings as _w

    template = " ".join(f"tmpl{j:02d}" for j in range(10))
    hist = [(i, f"{template} unique{i:02d}") for i in range(40)]
    hist += [(100, "alpha beta gamma delta epsilon")]
    ix = ExactDupIndex.build(spark, str(tmp_path / "ixhot"),
                             _corpus(spark, hist), min_threshold=0.6)
    new = [(201, f"{template} unique201"),
           (202, "alpha beta gamma delta zeta")]  # j(202,100) = 4/6

    with _w.catch_warnings(record=True) as w:
        _w.simplefilter("always")
        capped = {(r["new_id"], r["old_id"]): r["jaccard"]
                  for r in ix.probe(_corpus(spark, new),
                                    max_bucket=10).collect()}
    msgs = [str(x.message) for x in w if "prefix bucket" in str(x.message)]
    assert msgs and "ExactDupIndex.probe" in msgs[0]
    assert capped == {(202, 100): 0.6667}

    with _w.catch_warnings(record=True) as w:
        _w.simplefilter("always")
        full = ix.probe(_corpus(spark, new)).collect()
    assert not any("prefix bucket" in str(x.message) for x in w)
    # lossless: 201 matches all 40 template docs; 202 matches doc 100
    assert len(full) == 41


def test_append_no_self_match_and_later_probe_sees_batch(spark, tmp_path):
    ix = ExactDupIndex.build(spark, str(tmp_path / "ix"),
                             _corpus(spark, BASE), min_threshold=0.5)
    new = [(21, "the quick brown fox jumps over the lazy dog")]
    m = ix.append(_corpus(spark, new)).collect()
    assert {(r["new_id"], r["old_id"]) for r in m} == {(21, 1)}
    assert all(r["new_id"] != r["old_id"] for r in m)
    assert ix.doc_count() == 5
    # the appended doc is now probe-able history
    probe = _corpus(spark, [(31, "the quick brown fox jumps over the lazy dog")])
    olds = {r["old_id"] for r in ix.probe(probe).collect()}
    assert olds == {1, 21}


@pytest.mark.nightly
def test_verify_and_resync_lifecycle(spark, tmp_path):
    """Retention + rewrite: dropped base docs flag stale, new docs flag
    missing, an in-place text rewrite flags mismatched; resync heals all
    three without re-tokenizing surviving history; probe answers then
    match a fresh build."""
    ix = ExactDupIndex.build(spark, str(tmp_path / "ix"),
                             _corpus(spark, BASE), min_threshold=0.5)
    assert ix.verify(_corpus(spark, BASE))["ok"]

    survivors = [r for r in BASE if r[0] != 1] + [
        (9, "a brand new document about spark and parquet")]
    rewritten = [(3, "sphinx of black quartz judge my vow today"),
                 *[r for r in survivors if r[0] != 3]]
    rep = ix.verify(_corpus(spark, rewritten))
    assert not rep["ok"]
    assert rep["stale"] == 1 and rep["missing"] == 1 and rep["mismatched"] == 1

    out = ix.resync(_corpus(spark, rewritten))
    assert out == {"dropped": 2, "indexed_missing": 2}  # stale+bad, new+bad
    assert ix.verify(_corpus(spark, rewritten))["ok"]

    fresh = ExactDupIndex.build(spark, str(tmp_path / "fresh"),
                                _corpus(spark, rewritten), min_threshold=0.5)
    probe = _corpus(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    got = {(r["old_id"], r["jaccard"]) for r in ix.probe(probe).collect()}
    want = {(r["old_id"], r["jaccard"]) for r in fresh.probe(probe).collect()}
    assert got == want  # doc 1 gone from both


def test_streaming_ingest_dedup_sink(spark, tmp_path):
    """foreachBatch sink: each micro-batch's exact matches against the
    pre-batch corpus land in the matches table; the store grows."""
    from nexusbase_spark.streaming.subscribe import stream_ingest

    ix = ExactDupIndex.build(spark, str(tmp_path / "ix"),
                             _corpus(spark, BASE), min_threshold=0.5)
    src = tmp_path / "src"
    src.mkdir()
    rep = str(tmp_path / "matches")
    q = (stream_ingest(spark, str(src), "doc_id long, text string")
         .writeStream.queryName("t_exact_dedup")
         .foreachBatch(ix.for_each_batch(matches_path=rep))
         .outputMode("append").start())
    try:
        (_corpus(spark, [(41, "the quick brown fox jumps over the lazy dog"),
                         (42, "something else entirely here")])
         .coalesce(1).write.mode("append").parquet(str(src)))
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(rep).collect()
    assert {(r["new_id"], r["old_id"]) for r in rows} == {(41, 1)}
    assert ix.doc_count() == 6


def test_sink_default_cap_and_guard_warning_report(spark, tmp_path):
    """VERDICT r6 #5: the streaming ingest-dedup sink defaults to the
    skew cap (dedup.DEFAULT_MAX_BUCKET — one template token in HISTORY
    can't make every future batch quadratic), None is the documented
    lossless opt-out, and an engaged guard is recorded to
    <index>/guard_warnings.jsonl (the run report) AND re-emitted."""
    import inspect
    import json
    import os
    import warnings

    from nexusbase_spark.pipeline import dedup_index, ppjoin_index
    from nexusbase_spark.pipeline.dedup import DEFAULT_MAX_BUCKET

    # default wiring: both sinks resolve the sentinel to the module cap
    for mod, cls in ((ppjoin_index, ExactDupIndex),
                     (dedup_index, dedup_index.DedupIndex)):
        d = inspect.signature(cls.for_each_batch).parameters["max_bucket"]
        assert d.default is mod._SINK_DEFAULT

    # 8-doc template clique: every prefix bucket on the shared tokens
    # holds 8 postings, so an explicit cap of 3 must engage on probe
    tmpl = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    hist = _corpus(spark, [(i, f"{tmpl} u{i}") for i in range(8)])
    ix = ExactDupIndex.build(spark, str(tmp_path / "gix"), hist,
                             min_threshold=0.8)
    rep = str(tmp_path / "gm")
    run = ix.for_each_batch(matches_path=rep, max_bucket=3)
    batch = _corpus(spark, [(100, f"{tmpl} u100")])
    with pytest.warns(RuntimeWarning, match="ExactDupIndex.probe"):
        run(batch, 7)
    report = os.path.join(str(tmp_path / "gix"), "guard_warnings.jsonl")
    assert os.path.exists(report)
    entries = [json.loads(ln) for ln in open(report)]
    assert entries and all(e["batch_id"] == 7 for e in entries)
    assert any("ExactDupIndex.probe" in e["warning"] for e in entries)

    # quiet batch at the DEFAULT cap: no warning, no report growth
    n_before = len(entries)
    run2 = ix.for_each_batch(matches_path=rep)  # default = module cap
    assert DEFAULT_MAX_BUCKET == 1000
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        run2(_corpus(spark, [(101, "wholly unrelated words here")]), 8)
    assert len(open(report).readlines()) == n_before
