"""DedupIndex: the materialized incremental near-dup path (probe a
persistent band-bucket store instead of re-shingling the corpus)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexusbase_spark.pipeline.dedup import near_dup_pairs
from nexusbase_spark.pipeline.dedup_index import DedupIndex


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "pack my box with five dozen liquor jugs before the party"),
    (3, "sphinx of black quartz judge my vow said the old wizard"),
    (4, "how vexingly quick daft zebras jump over fences at night"),
]


@pytest.mark.nightly
def test_probe_matches_batch_kernel(spark, tmp_path):
    """A probe against the index finds exactly the cross pairs the batch
    MinHash kernel finds on the union corpus (restricted to new-vs-old),
    with identical jaccard values."""
    new = [
        # near-dup of doc 1 (one word changed)
        (11, "the quick brown fox jumps over the lazy cat again and again"),
        # unrelated
        (12, "completely different content about training data pipelines"),
    ]
    idx = DedupIndex.build(spark, str(tmp_path / "ix"), _corpus(spark, BASE))
    got = {(r["new_id"], r["old_id"]): round(r["jaccard"], 6)
           for r in idx.probe(_corpus(spark, new), threshold=0.3).collect()}

    batch = near_dup_pairs(_corpus(spark, BASE + new), threshold=0.3)
    want = {}
    for r in batch.collect():
        a, b = r["id_a"], r["id_b"]
        if (a > 10) != (b > 10):  # cross pairs only
            new_id, old_id = (a, b) if a > 10 else (b, a)
            want[(new_id, old_id)] = round(r["jaccard"], 6)
    assert got == want and (11, 1) in got
    # read-only: the store did not grow
    assert idx.doc_count() == 4


@pytest.mark.nightly
def test_append_grows_store_and_no_self_match(spark, tmp_path):
    """append returns matches vs the PRE-append store (a lazy plan would
    re-read the appended rows and self-match at jaccard 1.0), and later
    probes see the appended docs."""
    idx = DedupIndex.build(spark, str(tmp_path / "ix"), _corpus(spark, BASE))
    new = [(21, "the quick brown fox jumps over the lazy dog again and again")]
    m1 = idx.append(_corpus(spark, new), threshold=0.3).collect()
    assert {(r["new_id"], r["old_id"]) for r in m1} == {(21, 1)}
    assert all(r["new_id"] != r["old_id"] for r in m1)
    assert idx.doc_count() == 5
    # a second identical batch now matches BOTH the original and doc 21
    m2 = idx.append(_corpus(spark, [(31,) + new[0][1:]]), threshold=0.3)
    assert {(r["new_id"], r["old_id"]) for r in m2.collect()} == {
        (31, 1), (31, 21)}


@pytest.mark.nightly
def test_append_drop_policy(spark, tmp_path):
    """admit_dups=False: duplicate docs are reported but NOT indexed —
    the streaming-dedup policy."""
    idx = DedupIndex.build(spark, str(tmp_path / "ix"), _corpus(spark, BASE))
    new = [
        (41, "the quick brown fox jumps over the lazy dog again and again"),
        (42, "an entirely novel document that matches nothing in the store"),
    ]
    m = idx.append(_corpus(spark, new), threshold=0.3, admit_dups=False)
    assert {r["new_id"] for r in m.collect()} == {41}
    assert idx.doc_count() == 5          # only 42 admitted
    ids = {r["doc_id"] for r in idx._store_docs().collect()}
    assert 42 in ids and 41 not in ids


@pytest.mark.nightly
def test_probe_max_bucket_cap(spark, tmp_path):
    """A hot store bucket (many identical docs) is droppable with
    max_bucket, bounding the candidate join."""
    hot = [(i, "boilerplate header repeated verbatim in every crawl page x")
           for i in range(100, 140)]
    idx = DedupIndex.build(spark, str(tmp_path / "ix"),
                           _corpus(spark, BASE + hot))
    probe = _corpus(spark, [
        (201, "boilerplate header repeated verbatim in every crawl page x")])
    uncapped = idx.probe(probe, threshold=0.3).count()
    assert uncapped == 40
    capped = idx.probe(probe, threshold=0.3, max_bucket=8).count()
    assert capped == 0


@pytest.mark.nightly
def test_band_partitioned_layout(spark, tmp_path):
    """The store is partitioned by band_idx — each band's bucket join
    reads its own subdirectory (file-level pruning at scale)."""
    idx = DedupIndex.build(spark, str(tmp_path / "ix"), _corpus(spark, BASE))
    bands_dir = tmp_path / "ix" / "bands"
    parts = {p.name for p in bands_dir.iterdir() if p.name.startswith("band_idx=")}
    assert parts == {f"band_idx={b}" for b in range(4)}


@pytest.mark.nightly
def test_streaming_ingest_dedup(spark, tmp_path):
    """DedupIndex.for_each_batch as a Structured Streaming sink: each
    micro-batch dedupes against ALL indexed history (including earlier
    batches of the same stream), duplicates are dropped, novel docs are
    admitted and become history for later batches."""
    from nexusbase_spark.streaming.subscribe import stream_ingest

    idx = DedupIndex.build(spark, str(tmp_path / "ix"), _corpus(spark, BASE))
    src = tmp_path / "doc_src"
    src.mkdir()
    schema = "doc_id long, text string"

    def feed(rows):
        (spark.createDataFrame(rows, schema).coalesce(1)
         .write.mode("append").parquet(str(src)))

    dropped: list = []
    stream = stream_ingest(spark, str(src), schema)
    q = (stream.writeStream.queryName("t_ix_dedup")
         .foreachBatch(idx.for_each_batch(
             threshold=0.3,
             on_matches=lambda m, b: dropped.extend(
                 (r["new_id"], r["old_id"]) for r in m.collect())))
         .outputMode("append").start())
    try:
        # batch 1: one dup of the seed corpus, one novel doc
        feed([(51, "the quick brown fox jumps over the lazy dog again and again"),
              (52, "a genuinely new document streaming through the pipeline")])
        q.processAllAvailable()
        # batch 2: a dup of batch 1's NOVEL doc — caught against stream history
        feed([(61, "a genuinely new document streaming through the pipeline")])
        q.processAllAvailable()
    finally:
        q.stop()
    assert (51, 1) in dropped
    assert (61, 52) in dropped
    ids = {r["doc_id"] for r in idx._store_docs().collect()}
    assert 52 in ids and 51 not in ids and 61 not in ids


@pytest.mark.nightly
def test_verify_clean_then_stale_then_resync(spark, tmp_path):
    """verify() is green right after build; deleting base docs flags
    them stale (and a never-indexed doc flags missing); resync() drops
    the stale entries and absorbs the missing doc WITHOUT re-shingling
    history, after which verify() is green again and probes no longer
    match the deleted doc."""
    idx = DedupIndex.build(spark, str(tmp_path / "ix"), _corpus(spark, BASE))
    rep = idx.verify(_corpus(spark, BASE))
    assert rep["ok"] and rep["stale"] == 0 and rep["missing"] == 0
    assert rep["checked"] == 4 and rep["mismatched"] == 0

    # retention event: doc 1 deleted from the corpus, doc 9 newly arrived
    survivors = [r for r in BASE if r[0] != 1] + [
        (9, "a brand new document about parquet band buckets and spark")]
    rep = idx.verify(_corpus(spark, survivors))
    assert not rep["ok"] and rep["stale"] == 1 and rep["missing"] == 1

    out = idx.resync(_corpus(spark, survivors))
    assert out == {"dropped_stale": 1, "indexed_missing": 1}
    rep = idx.verify(_corpus(spark, survivors))
    assert rep["ok"] and rep["docs_store"] == 4

    # a probe that would have matched the deleted doc 1 now finds nothing
    probe = _corpus(spark, [(100,
        "the quick brown fox jumps over the lazy dog again and again")])
    assert idx.probe(probe, threshold=0.5).count() == 0


@pytest.mark.nightly
def test_verify_detects_corrupted_signature(spark, tmp_path):
    """A text rewrite the index never saw (same doc_id, new content —
    the compact()-rewrote-the-corpus case) surfaces as mismatched, even
    though id sets agree."""
    idx = DedupIndex.build(spark, str(tmp_path / "ix"), _corpus(spark, BASE))
    mutated = [(1, "entirely different text after an in-place rewrite"),
               *BASE[1:]]
    rep = idx.verify(_corpus(spark, mutated))
    assert rep["stale"] == 0 and rep["missing"] == 0
    assert rep["mismatched"] == 1 and not rep["ok"]
    # sampled audit: sample=2 checks exactly 2 docs deterministically
    rep2 = idx.verify(_corpus(spark, mutated), sample=2)
    assert rep2["checked"] == 2


def test_verify_mismatched_counts_union_of_failing_docs(spark, tmp_path):
    """Doc 1's stored hset is corrupted (bands left intact) and doc 2's
    stored band_key is corrupted (hset left intact): mismatched must
    count the UNION of docs failing either check — 2, not
    max(bad_sets, bad_bands) = 1 (ADVICE r4)."""
    import os
    idx = DedupIndex.build(spark, str(tmp_path / "ix"), _corpus(spark, BASE))
    path = str(tmp_path / "ix")

    docs_t = spark.read.parquet(os.path.join(path, "docs"))
    tampered_docs = docs_t.withColumn(
        "hset",
        F.when(F.col("doc_id") == 1,
               F.transform(F.col("hset"), lambda h: h + 1))
        .otherwise(F.col("hset"))).localCheckpoint(eager=True)
    tampered_docs.write.mode("overwrite").parquet(os.path.join(path, "docs"))

    bands_t = spark.read.parquet(os.path.join(path, "bands"))
    tampered_bands = bands_t.withColumn(
        "band_key",
        F.when(F.col("doc_id") == 2, F.lit("corrupted"))
        .otherwise(F.col("band_key"))).localCheckpoint(eager=True)
    (tampered_bands.write.mode("overwrite").partitionBy("band_idx")
     .parquet(os.path.join(path, "bands")))

    rep = idx.verify(_corpus(spark, BASE))
    assert rep["stale"] == 0 and rep["missing"] == 0
    assert rep["mismatched"] == 2 and not rep["ok"]
