"""Materialized inverted index: bucket-partitioned postings with
denormalized lengths, pruned term lookup, BM25 serving equal to the scan
path, incremental append, and the shared verify/resync audit contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nexusbase_spark.pipeline.invindex import InvertedIndex

SCHEMA = "doc_id long, text string"
CORPUS = [
    (1, "cat dog cat"),
    (2, "dog bird"),
    (3, "fish fish fish bird"),
    (4, "cat fish dog"),
    (5, "bird bird cat dog fish"),
    (6, "entirely unrelated words here"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_search_matches_scan_path_on_matching_docs(spark, tmp_path):
    """Index-served BM25 equals bm25_topk restricted to docs containing
    at least one query term — same ids, same quantized scores — when the
    corpus enters via build + append (incremental stats must merge)."""
    from nexusbase_spark.pipeline.search import bm25_topk

    ix = InvertedIndex.build(spark, str(tmp_path / "ix"),
                             _df(spark, CORPUS[:3]), n_buckets=8)
    ix.append(_df(spark, CORPUS[3:]))
    union = _df(spark, CORPUS)
    terms = ["cat", "bird"]
    want = [(r["doc_id"], r["score"])
            for r in bm25_topk(union, terms, k=6).collect()
            if r["score"] > 0.0]
    got = [(r["doc_id"], r["score"])
           for r in ix.search(terms, k=6).collect()]
    assert got == want
    # non-matching doc 6 never appears, even with room
    assert all(d != 6 for d, _ in got)


def test_term_lookup_prunes_buckets(spark, tmp_path):
    """A term lookup reads only the term's bucket directories — file-level
    pruning evidence via input_file_name over the executed scan."""
    ix = InvertedIndex.build(spark, str(tmp_path / "ix"),
                             _df(spark, CORPUS), n_buckets=16)
    total = len(spark.read.parquet(
        os.path.join(str(tmp_path / "ix"), "postings")).inputFiles())
    touched = (ix.term_postings(["cat"])
               .select(F.input_file_name().alias("f")).distinct().count())
    assert 0 < touched < total
    rows = ix.term_postings(["cat"]).collect()
    assert {r["token"] for r in rows} == {"cat"}
    assert {r["doc_id"] for r in rows} == {1, 4, 5}
    # tf and denormalized dl are right
    by_doc = {r["doc_id"]: (r["tf"], r["dl"]) for r in rows}
    assert by_doc[1] == (2, 3) and by_doc[5] == (1, 5)


@pytest.mark.nightly
def test_verify_and_resync_lifecycle(spark, tmp_path):
    """Clean after build; corpus rewrite (delete + add + in-place text
    mutation) flags stale/missing/mismatched and breaks globals; resync
    drops stale postings without re-tokenizing history, indexes the new
    doc, and rebuilds exact globals; verify is green again."""
    ix = InvertedIndex.build(spark, str(tmp_path / "ix"), _df(spark, CORPUS))
    rep = ix.verify(_df(spark, CORPUS))
    assert rep["ok"] and rep["checked"] == 6 and rep["globals_ok"]

    mutated = [r for r in CORPUS if r[0] not in (1, 2)] + [
        (9, "a new document about cats and dogs")]
    rep = ix.verify(_df(spark, mutated))
    assert not rep["ok"] and rep["stale"] == 2 and rep["missing"] == 1

    out = ix.resync(_df(spark, mutated))
    assert out == {"dropped_stale": 2, "indexed_missing": 1}
    rep = ix.verify(_df(spark, mutated))
    assert rep["ok"] and rep["globals_ok"]
    # deleted doc 1 is gone from the postings; new doc 9 is searchable
    assert ix.term_postings(["cat"]).filter(F.col("doc_id") == 1).count() == 0
    assert {r["doc_id"] for r in ix.term_postings(["cats"]).collect()} == {9}

    # in-place text rewrite (same id) -> mismatched, not stale/missing
    rewritten = [(3, "totally new text"), *[r for r in mutated if r[0] != 3]]
    rep = ix.verify(_df(spark, rewritten))
    assert rep["stale"] == 0 and rep["missing"] == 0
    assert rep["mismatched"] == 1 and not rep["ok"]


@pytest.mark.nightly
def test_empty_and_tokenless_docs(spark, tmp_path):
    """Empty text tokenizes to one empty token (split semantics, same as
    the DuckDB oracle's string_split) so the doc still counts in N;
    a genuinely NULL-text doc has no tokens, produces no postings, is
    excluded from N, and never counts as missing. Searching an unseen
    term returns empty."""
    rows = [(1, "cat dog"), (2, "")]
    ix = InvertedIndex.build(spark, str(tmp_path / "ix"), _df(spark, rows))
    n_docs, avgdl = ix._globals()
    assert n_docs == 2 and avgdl == 1.5
    rep = ix.verify(_df(spark, rows))
    assert rep["ok"] and rep["missing"] == 0
    assert ix.search(["zebra"], k=5).count() == 0
    with pytest.raises(ValueError):
        ix.search([])

    nulldoc = spark.createDataFrame([(1, "cat dog"), (2, None)], SCHEMA)
    ix2 = InvertedIndex.build(spark, str(tmp_path / "ix2"), nulldoc)
    n_docs, avgdl = ix2._globals()
    assert n_docs == 1 and avgdl == 2.0
    rep = ix2.verify(nulldoc)
    assert rep["ok"] and rep["missing"] == 0


@pytest.mark.nightly
def test_streaming_ingest_updates_index(spark, tmp_path):
    """InvertedIndex.for_each_batch as a Structured Streaming sink:
    retrieval served from the index matches the batch recompute over
    everything ingested so far."""
    from nexusbase_spark.pipeline.search import bm25_topk
    from nexusbase_spark.streaming.subscribe import stream_ingest

    ix = InvertedIndex.build(spark, str(tmp_path / "ix"),
                             _df(spark, CORPUS[:2]))
    src = tmp_path / "doc_src"
    src.mkdir()

    def feed(rows):
        (spark.createDataFrame(rows, SCHEMA).coalesce(1)
         .write.mode("append").parquet(str(src)))

    q = (stream_ingest(spark, str(src), SCHEMA).writeStream
         .queryName("t_inv_ix").foreachBatch(ix.for_each_batch())
         .outputMode("append").start())
    try:
        feed(CORPUS[2:4])
        q.processAllAvailable()
        feed(CORPUS[4:])
        q.processAllAvailable()
    finally:
        q.stop()
    terms = ["cat", "bird"]
    want = [(r["doc_id"], r["score"])
            for r in bm25_topk(_df(spark, CORPUS), terms, k=6).collect()
            if r["score"] > 0.0]
    got = [(r["doc_id"], r["score"]) for r in ix.search(terms, k=6).collect()]
    assert got == want


@pytest.mark.nightly
def test_retention_event_verify_then_resync_heals(spark, tmp_path):
    """Retention interplay (VERDICT r4 next #5): the base corpus is
    retention-compacted (old docs dropped, nothing added or mutated) —
    verify() reports exactly the aged-out docs as stale and globals
    broken; resync() drops their postings via the narrow filtered
    rewrite and rebuilds exact globals; verify() is green and search
    over the survivors is identical to a fresh build."""
    ix = InvertedIndex.build(spark, str(tmp_path / "ix"), _df(spark, CORPUS))
    survivors = [r for r in CORPUS if r[0] > 2]  # docs 1-2 age out

    rep = ix.verify(_df(spark, survivors))
    assert not rep["ok"] and rep["stale"] == 2
    assert rep["missing"] == 0 and rep["mismatched"] == 0
    assert not rep["globals_ok"]

    out = ix.resync(_df(spark, survivors))
    assert out == {"dropped_stale": 2, "indexed_missing": 0}
    rep = ix.verify(_df(spark, survivors))
    assert rep["ok"] and rep["globals_ok"]

    fresh = InvertedIndex.build(spark, str(tmp_path / "fresh"),
                                _df(spark, survivors))
    for terms in (["cat"], ["cat", "dog"]):
        got = [(r["doc_id"], r["score"])
               for r in ix.search(terms, k=10).collect()]
        want = [(r["doc_id"], r["score"])
                for r in fresh.search(terms, k=10).collect()]
        assert got == want
