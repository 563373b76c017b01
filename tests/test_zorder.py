"""Z-order layout: Morton key correctness + multi-dimension file pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from nexusbase_spark.plans.zorder import (quantize_rank, write_zordered,
                                          zorder_key)


def _morton2(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_bit_exact(spark):
    """The column expression computes the standard Morton interleave
    (dimension j's bit i lands at i*k + j) — checked bit-for-bit against
    a Python reference over the full 2-dim 5-bit grid."""
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y",
                    zorder_key([F.col("x"), F.col("y")], bits=5).alias("z")
                    ).collect()
    for r in got:
        assert r["z"] == _morton2(r["x"], r["y"], 5), (r["x"], r["y"])


def test_quantize_rank_bounds(spark):
    df = spark.createDataFrame(
        [(v,) for v in [-5.0, 0.0, 50.0, 100.0, 250.0]], "v double")
    got = [r["q"] for r in df.select(
        quantize_rank(F.col("v"), 0.0, 100.0, bits=4).alias("q")).collect()]
    assert got[0] == 0          # below range clamps
    assert got[1] == 0
    assert 7 <= got[2] <= 8     # midpoint lands mid-scale
    assert got[3] == 15         # top of range
    assert got[4] == 15         # above range clamps


def test_write_zordered_prunes_both_dims(spark, tmp_path):
    """Round-trip: data survives intact, and a selective predicate on
    EITHER interleaved dimension touches a strict subset of files (the
    single-sort layout prunes only its own dimension)."""
    n = 40_000
    df = (spark.range(n)
          .select((F.col("id") % 200).alias("a"),
                  ((F.col("id") * 7919) % 200).alias("b"),
                  F.col("id").alias("payload")))
    path = str(tmp_path / "z")
    write_zordered(df, path, ["a", "b"], bits=8, n_files=16)

    back = spark.read.parquet(path)
    assert back.count() == n
    assert back.agg(F.sum("payload")).collect()[0][0] == n * (n - 1) // 2

    total = len(back.inputFiles())
    assert total >= 8

    def touched(pred):
        return (back.filter(pred).select(F.input_file_name().alias("f"))
                .distinct().count())

    ta = touched(F.col("a") == 7)
    tb = touched(F.col("b") == 7)
    assert ta < total and tb < total          # both dims prune
    assert ta <= total // 2 and tb <= total // 2
