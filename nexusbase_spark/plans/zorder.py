"""Z-order (Morton) write layout — multi-dimensional file pruning.

A parquet scan prunes files (and row groups) from per-file min/max stats
on the FILTER column. Sorting the write by one column gives that column
tight per-file ranges and perfect pruning — and leaves every other
column's range per file full-width, so predicates on a second dimension
scan everything. Interleaving the bits of two (or more) dimension keys
into one Morton key and range-sorting the write by it gives EVERY
interleaved dimension locality: each file covers a small hyper-rectangle,
so min/max pruning works for predicates on any of the dimensions alone
or together. This is Delta Lake's OPTIMIZE ZORDER BY, rebuilt on plain
open Spark + parquet (no Delta in this environment).

Scale shape: the z-key is a pure per-row projection (bitwise ops inside
whole-stage codegen); the only cost over a plain write is the
repartitionByRange sampling pass + in-partition sort that any clustered
write pays. At 100 TB this layout is applied per ingest batch or by a
background compactor; the measured pruning factors are in SCALE.md
("Round-3 z-order probe").
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Morton-interleave the low ``bits`` of each (non-negative integral)
    column expression into one long. Dimension j contributes its bit i at
    output position ``i * len(cols) + j`` — the standard z-curve. Columns
    must already be rank/bucket codes in [0, 2^bits); use
    ``quantize_rank`` for arbitrary values.

    bits=8 per dimension (256 buckets/dim) is plenty for FILE-level
    pruning: finer keys refine ordering within files, which row-group
    stats already handle. The expression is a flat OR-chain of
    shift/masks, shallow enough for janino codegen (the deep-Add-chain
    silent-fallback starts far beyond bits*dims = 16-32 terms)."""
    k = len(cols)
    terms = []
    for j, c in enumerate(cols):
        v = c.cast("long")
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)),
                            i * k + j))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def quantize_rank(c: Column, lo: Column | float, hi: Column | float,
                  bits: int = 8) -> Column:
    """Map a numeric column into [0, 2^bits) by linear range bucketing —
    the value->code step for z-ordering continuous dimensions. lo/hi are
    the dimension's (broadcastable) min/max; out-of-range values clamp."""
    lo_c = lo if isinstance(lo, Column) else F.lit(float(lo))
    hi_c = hi if isinstance(hi, Column) else F.lit(float(hi))
    n = (1 << bits) - 1
    scaled = F.floor(
        (c.cast("double") - lo_c) / (hi_c - lo_c + F.lit(1e-300)) * (n + 1))
    return F.greatest(F.lit(0), F.least(F.lit(n), scaled)).cast("long")


def write_zordered(df: DataFrame, path: str, dims: list, bits: int = 8,
                   n_files: int = 32, mode: str = "overwrite") -> None:
    """Write ``df`` as parquet clustered on the z-curve of ``dims``
    (column names or Columns of non-negative codes): range-partition on
    the z-key (each output file owns a contiguous key range = a small
    hyper-rectangle), sort within partitions so row-group stats are tight
    too, drop the key from the data."""
    cols = [F.col(d) if isinstance(d, str) else d for d in dims]
    keyed = df.withColumn("__z", zorder_key(cols, bits))
    (keyed.repartitionByRange(n_files, "__z")
     .sortWithinPartitions("__z")
     .drop("__z")
     .write.mode(mode).parquet(path))
