"""Bucketed table layout — shuffle-free co-located joins on plain Spark.

Several stores in this repo document their cluster layout as "bucketBy
the join key so the probe join needs no shuffle" (DedupIndex band_key,
InvertedIndex doc lookups, the points table's series_key). This module
is that layout made concrete: write a frame ``bucketBy(k, key)`` (+
``sortBy`` for merge-ready runs), and a join between two tables bucketed
the same way compiles with NO Exchange on either side — the single
biggest shuffle eliminator for repeated large-table joins at 100 TB
(pay the partitioning once at write time, reuse it every query).

Catalog-backed by necessity: bucketing metadata lives in the table
catalog (``saveAsTable``), not in bare parquet paths — reading the same
files with ``spark.read.parquet`` loses the bucket info and the join
shuffles again. ``bucket_spec`` documents/asserts the expectation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str | list[str],
                   num_buckets: int, *, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Materialize ``df`` as a bucketed (and per-bucket sorted) table.
    Sorting makes the downstream SortMergeJoin skip its sort too —
    bucket files stream directly into the merge."""
    keys = [key] if isinstance(key, str) else list(key)
    # repartition on the bucket keys first: repartition's hash is the
    # same Murmur3-mod the bucketing writer uses, so each task holds
    # exactly one bucket and writes ONE file per bucket — the layout
    # Spark requires to elide the SortMergeJoin's per-side Sort (with
    # multiple files per bucket only the Exchange is elided). At scale,
    # batch appends add files per bucket; periodic compaction back to
    # one file per bucket restores sort elision.
    d = df.repartition(num_buckets, *[df[k] for k in keys])
    if sort:
        d = d.sortWithinPartitions(*keys)
    w = d.write.format("parquet").mode(mode).bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> tuple[int, list[str]]:
    """(num_buckets, bucket_columns) from the catalog; (0, []) when the
    table is not bucketed."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    n, cols = 0, []
    for r in rows:
        if r["col_name"] == "Num Buckets":
            n = int(r["data_type"])
        elif r["col_name"] == "Bucket Columns":
            cols = [c.strip(" `") for c in
                    r["data_type"].strip("[]").split(",") if c.strip()]
    return n, cols


def cobucketed_join(spark: SparkSession, left_table: str, right_table: str,
                    on: str | list[str], how: str = "inner") -> DataFrame:
    """Join two co-bucketed tables on their bucket key. Raises unless
    both tables are bucketed on ``on`` with the same bucket count —
    the precondition for the exchange-free plan this function is for
    (a silent fallback to a shuffling join would defeat the layout)."""
    keys = [on] if isinstance(on, str) else list(on)
    ln, lcols = bucket_spec(spark, left_table)
    rn, rcols = bucket_spec(spark, right_table)
    if ln == 0 or ln != rn or lcols != keys or rcols != keys:
        raise ValueError(
            f"tables are not co-bucketed on {keys}: "
            f"{left_table}=({ln}, {lcols}) {right_table}=({rn}, {rcols})")
    return spark.table(left_table).join(spark.table(right_table), keys, how)
