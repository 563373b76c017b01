"""Materialized MinHash/LSH near-duplicate index — the INCREMENTAL dedup
path for a continuously-ingesting training corpus.

The batch kernels in ``dedup.py`` recompute shingles + signatures for the
whole corpus per run; at 100 TB that is the wrong shape for daily ingest.
This index materializes the per-document band buckets once, and dedupes
each incoming batch by PROBING the stored buckets:

- probe cost is O(batch) signature work + a band-key join that touches
  only colliding buckets — the historical corpus is never re-shingled;
- the store is parquet partitioned by ``band_idx`` (bands separate
  subdirectories, so each band's bucket join scans 1/bands of the store;
  on a real cluster the layout adds bucketBy(band_key) so the store side
  of the probe join needs no shuffle at all);
- exact verification uses the stored 31-bit shingle-hash SETS
  (``array_intersect`` on two arrays — narrow, candidate-only), the same
  md5 universal-hash family as dedup.py, so the DuckDB oracle can
  regenerate every value.

The reference has no near-dup machinery at all (its keys are opaque
series); this is part of the training-data-pipeline surface (build brief)
— the dedup complement of ``vecindex.VectorIndex``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nexusbase_spark.pipeline.dedup import _banded_docs


class DedupIndex:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # ---------------------------------------------------------------- build

    @classmethod
    def build(cls, spark: SparkSession, path: str, docs: DataFrame,
              id_col: str = "doc_id", text_col: str = "text",
              n: int = 3, num_hashes: int = 8, bands: int = 4) -> "DedupIndex":
        """Shingle + sign + band the corpus once and materialize:
        ``bands/`` (doc_id, sz, band_key) partitioned by band_idx and
        ``docs/`` (doc_id, hset) for exact verification."""
        d, banded = _banded_docs(docs, id_col, text_col, n, num_hashes,
                                 bands, persist=True)
        (banded.withColumnRenamed(id_col, "doc_id")
         .write.mode("overwrite").partitionBy("band_idx")
         .parquet(os.path.join(path, "bands")))
        (d.select(F.col(id_col).alias("doc_id"),
                  F.array_distinct("hset").alias("hset"))
         .write.mode("overwrite").parquet(os.path.join(path, "docs")))
        d.unpersist()
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"n": n, "num_hashes": num_hashes, "bands": bands,
                       "id_col": id_col, "text_col": text_col}, f)
        return cls(spark, path)

    def _meta(self) -> dict:
        with open(os.path.join(self.path, "meta.json")) as f:
            return json.load(f)

    def _store_bands(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "bands"))

    def _store_docs(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "docs"))

    def doc_count(self) -> int:
        return self._store_docs().count()

    # ---------------------------------------------------------------- probe

    def probe(self, new_docs: DataFrame, threshold: float = 0.3,
              max_bucket: int | None = None) -> DataFrame:
        """Near-duplicates of ``new_docs`` already IN the index ->
        (new_id, old_id, jaccard >= threshold). Read-only; the store is
        untouched. Jaccard is computed over the distinct 31-bit shingle
        hashes (identical family to dedup.py — oracle-reproducible).

        ``max_bucket`` drops HOT store buckets before the join, like the
        batch kernel's cap — but counted only over buckets the probe
        actually hits (a semi-join first), so the cap never scans the
        whole store."""
        meta = self._meta()
        nd, nbanded = _banded_docs(
            new_docs, meta["id_col"], meta["text_col"], meta["n"],
            meta["num_hashes"], meta["bands"], persist=True)
        return self._probe_from(meta, nd, nbanded, threshold, max_bucket)

    def _probe_from(self, meta: dict, nd: DataFrame, nbanded: DataFrame,
                    threshold: float, max_bucket: int | None) -> DataFrame:
        nbanded = nbanded.withColumnRenamed(meta["id_col"], "new_id")
        store = self._store_bands()
        hit = store.join(
            nbanded.select("band_idx", "band_key").distinct(),
            ["band_idx", "band_key"])
        if max_bucket is not None:
            ok = (hit.groupBy("band_idx", "band_key")
                  .agg(F.count(F.lit(1)).alias("__bn"))
                  .filter(F.col("__bn") <= max_bucket)
                  .drop("__bn"))
            hit = hit.join(ok, ["band_idx", "band_key"])
        cand = (nbanded.join(hit, ["band_idx", "band_key"])
                .filter(F.col("new_id") != F.col("doc_id"))
                .select("new_id", F.col("doc_id").alias("old_id"))
                .distinct())
        new_sets = nd.select(F.col(meta["id_col"]).alias("new_id"),
                             F.array_distinct("hset").alias("__ha"))
        old_sets = self._store_docs().select(
            F.col("doc_id").alias("old_id"), F.col("hset").alias("__hb"))
        inter = F.size(F.array_intersect(F.col("__ha"), F.col("__hb")))
        union = F.size("__ha") + F.size("__hb") - inter
        out = (cand.join(new_sets, "new_id").join(old_sets, "old_id")
               .withColumn("jaccard", inter / union)
               .filter(F.col("jaccard") >= threshold)
               .select("new_id", "old_id", "jaccard"))
        return out

    # --------------------------------------------------------------- append

    def append(self, new_docs: DataFrame, threshold: float = 0.3,
               max_bucket: int | None = None,
               admit_dups: bool = True) -> DataFrame:
        """Probe, then fold the batch into the store. Returns the matches
        (new vs indexed). ``admit_dups=False`` indexes only the new docs
        with NO match >= threshold — the streaming-dedup policy where a
        duplicate is dropped, not stored.

        The match frame is MATERIALIZED (eager localCheckpoint) before
        the store append: the probe plan reads the store, so a lazy
        result consumed after the append would re-scan the store
        including the rows this call just added and report self-matches.
        Signatures are computed once and shared between probe and
        append."""
        meta = self._meta()
        nd, nbanded = _banded_docs(
            new_docs, meta["id_col"], meta["text_col"], meta["n"],
            meta["num_hashes"], meta["bands"], persist=True)
        matches = self._probe_from(meta, nd, nbanded, threshold, max_bucket)
        matches = matches.localCheckpoint(eager=True)
        if not admit_dups:
            dup_ids = matches.select(
                F.col("new_id").alias(meta["id_col"])).distinct()
            nbanded = nbanded.join(dup_ids, meta["id_col"], "left_anti")
            nd = nd.join(dup_ids, meta["id_col"], "left_anti")
        (nbanded.withColumnRenamed(meta["id_col"], "doc_id")
         .write.mode("append").partitionBy("band_idx")
         .parquet(os.path.join(self.path, "bands")))
        (nd.select(F.col(meta["id_col"]).alias("doc_id"),
                   F.array_distinct("hset").alias("hset"))
         .write.mode("append").parquet(os.path.join(self.path, "docs")))
        nd.unpersist()
        return matches

    # ------------------------------------------------------------ streaming

    def for_each_batch(self, threshold: float = 0.3,
                       max_bucket: int | None = None,
                       on_matches=None):
        """Structured-Streaming sink: each document micro-batch is deduped
        against the whole indexed HISTORY (not just the watermark horizon
        — the complement of subscribe.live_dedup's exact/windowed state),
        duplicates are dropped, novel docs are folded into the store so
        later batches dedupe against them too.

        Exactly the ingest-time near-dup shape of a crawling pipeline:
        state lives in the parquet store (restart-safe, shared across
        jobs), not in the streaming state store. foreachBatch runs
        batches sequentially per query, which serializes the
        probe-then-append — the ordering append() itself requires.
        ``on_matches(matches_df, batch_id)`` observes the dropped pairs
        (already materialized — safe to collect a bounded view)."""
        def run(batch: DataFrame, batch_id: int) -> None:
            if not batch.head(1):
                return
            matches = self.append(batch, threshold=threshold,
                                  max_bucket=max_bucket, admit_dups=False)
            if on_matches is not None:
                on_matches(matches, batch_id)
        return run
