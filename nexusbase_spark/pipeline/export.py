"""Training-shard export: the curation pipeline's terminal sink.

A training run doesn't read "a parquet directory"; it reads a MANIFEST —
a fixed list of shards with row counts and content digests — so the
loader can shard-assign workers deterministically, detect truncated or
tampered files, and resume a partial export without re-writing finished
shards. This module writes size-bounded shards plus that manifest, and
audits an existing export against it (the verify()/resync() contract the
materialized stores follow, applied to the pipeline's OUTPUT).

Scale shape: shard assignment is one deterministic bucket expression
(md5-hash of the id — NOT round-robin, so a re-export of the same corpus
lands every row in the same shard regardless of partitioning); each
shard directory is written by the tasks that own its bucket via
partitionBy, one pass, no collect. The manifest digest is an ORDER-FREE
fold (bitwise XOR of per-row md5 words), so it can be recomputed
distributedly and compared without sorting anything. XOR + row count is
an integrity check against corruption/truncation/drift, not an
adversarial MAC (even-multiplicity duplicates cancel in XOR) — the same
trust level as parquet's own checksums.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_digest_cols(df: DataFrame, id_col: str, cols: list[str]):
    """Per-row 64-bit words from md5 over the id + content columns."""
    parts = [F.col(id_col).cast("string")] + [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
    h = F.md5(F.concat_ws("\x1f", *parts))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("long"),
            F.conv(F.substring(h, 17, 15), 16, 10).cast("long"))


def export_shards(df: DataFrame, path: str, *, id_col: str = "doc_id",
                  content_cols: list[str] | None = None,
                  n_shards: int = 16) -> dict:
    """Write ``df`` as ``n_shards`` deterministic shards under
    ``path/data/shard=K/`` plus ``path/manifest.json`` carrying per-shard
    (n_rows, digest) and corpus totals. Shard of a row =
    md5(id) mod n_shards — content-addressed, so the same corpus exports
    identically no matter how it was partitioned upstream. Returns the
    manifest dict."""
    cols = content_cols if content_cols is not None else [
        c for c in df.columns if c != id_col]
    shard = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
                    16, 10).cast("long") % n_shards).alias("shard")
    d1, d2 = _row_digest_cols(df, id_col, cols)
    staged = df.select(id_col, *cols, shard,
                       d1.alias("__d1"), d2.alias("__d2"))
    staged = staged.localCheckpoint(eager=True)  # one pass: write + digest
    (staged.drop("__d1", "__d2").write.mode("overwrite")
     .partitionBy("shard").parquet(os.path.join(path, "data")))
    per = (staged.groupBy("shard")
           .agg(F.count(F.lit(1)).alias("n_rows"),
                # order-free digest: bitwise XOR of the md5 words —
                # commutative/associative and can never overflow (ANSI
                # mode rejects wrapping long sums)
                F.expr("bit_xor(__d1)").alias("w1"),
                F.expr("bit_xor(__d2)").alias("w2"))
           .collect())
    shards = {int(r["shard"]): {"n_rows": int(r["n_rows"]),
                                "digest": f"{r['w1'] & 0xFFFFFFFFFFFFFFFF:016x}"
                                          f"{r['w2'] & 0xFFFFFFFFFFFFFFFF:016x}"}
              for r in per}
    manifest = {"id_col": id_col, "content_cols": cols,
                "n_shards": n_shards,
                "n_rows": sum(v["n_rows"] for v in shards.values()),
                "shards": {str(k): shards.get(k, {"n_rows": 0,
                                                  "digest": "0" * 32})
                           for k in range(n_shards)}}
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def verify_export(spark, path: str) -> dict:
    """Audit an export against its manifest: recompute every shard's
    row count and order-free digest from the files actually on disk.
    Returns per-shard mismatches (missing, extra, or content-changed
    shards) and ok — the pre-flight a training job runs before trusting
    a corpus directory."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    id_col = manifest["id_col"]
    cols = manifest["content_cols"]
    df = spark.read.parquet(os.path.join(path, "data"))
    d1, d2 = _row_digest_cols(df, id_col, cols)
    per = (df.select("shard", d1.alias("__d1"), d2.alias("__d2"))
           .groupBy("shard")
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.expr("bit_xor(__d1)").alias("w1"),
                F.expr("bit_xor(__d2)").alias("w2"))
           .collect())
    got = {str(int(r["shard"])): {
        "n_rows": int(r["n_rows"]),
        "digest": f"{r['w1'] & 0xFFFFFFFFFFFFFFFF:016x}"
                  f"{r['w2'] & 0xFFFFFFFFFFFFFFFF:016x}"} for r in per}
    bad = {}
    for k, want in manifest["shards"].items():
        if want["n_rows"] == 0 and k not in got:
            continue
        have = got.get(k)
        if have is None:
            bad[k] = "missing"
        elif have["n_rows"] != want["n_rows"]:
            bad[k] = f"rows {have['n_rows']} != {want['n_rows']}"
        elif have["digest"] != want["digest"]:
            bad[k] = "digest mismatch"
    for k in got:
        if k not in manifest["shards"]:
            bad[k] = "extra shard"
    return {"n_rows": sum(v["n_rows"] for v in got.values()),
            "bad_shards": bad, "ok": not bad}


def repair_export(df: DataFrame, path: str) -> dict:
    """Heal a failed/tampered export WITHOUT re-writing finished shards:
    verify first, then re-write ONLY the bad shards from the source
    corpus (dynamic partition overwrite on the shard column — untouched
    shard directories keep their files and their manifest rows). This is
    the resume path for a 100 TB export where a handful of shards died:
    cost is proportional to the damage, not the corpus. Returns
    {repaired: [...], ok: verify-after}."""
    spark = df.sparkSession
    rep = verify_export(spark, path)
    if rep["ok"]:
        return {"repaired": [], "ok": True}
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    id_col = manifest["id_col"]
    cols = manifest["content_cols"]
    n_shards = manifest["n_shards"]
    bad = sorted(int(k) for k in rep["bad_shards"])
    shard = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
                    16, 10).cast("long") % n_shards).alias("shard")
    staged = (df.select(id_col, *cols, shard)
              .filter(F.col("shard").isin(bad)))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (staged.write.mode("overwrite").partitionBy("shard")
         .parquet(os.path.join(path, "data")))
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    after = verify_export(spark, path)
    return {"repaired": [str(k) for k in bad], "ok": after["ok"]}
