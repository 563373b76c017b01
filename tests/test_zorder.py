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


def test_compact_cluster_layout_prunes_series_files(spark, tmp_path):
    """compact(cluster=True): the rewrite stays MVCC-correct, and inside a
    day partition each file owns a contiguous series range — a
    single-series scan touches a fraction of the day's files (file-stat
    pruning on series_key), and ts row-groups are sorted."""
    from pyspark.sql import functions as F

    from nexusbase_spark.engine import NexusEngine

    eng = NexusEngine(spark, str(tmp_path / "wh"))
    day0 = 1_700_006_400 * 1_000_000_000
    rows = []
    for s in range(16):                      # 16 series, one day, 40 pts each
        for i in range(40):
            rows.append(("cl.m", {"h": f"h{s:02d}"}, {"v": float(i)},
                         day0 + i * 1_000_000_000 + s))
    eng.put_batch(rows)
    before = {(r["ts"], r["fields"]["v"]) for r in
              eng.execute(f'QUERY cl.m FROM 0 TO {day0 * 2} TAGGED (h="h03")').collect()}
    eng.compact(cluster=True, cluster_files=8)
    after = {(r["ts"], r["fields"]["v"]) for r in
             eng.execute(f'QUERY cl.m FROM 0 TO {day0 * 2} TAGGED (h="h03")').collect()}
    assert after == before and len(after) == 40

    # physical check on the RAW scan (input_file_name loses file context
    # after the MVCC exchanges): the one-series filtered scan reads a
    # strict subset of the day's files thanks to tight series_key
    # min/max file stats from the range clustering
    raw = spark.read.parquet(eng._points_path)
    total = (raw.select(F.input_file_name().alias("f")).distinct().count())
    touched = (raw.filter(F.col("series_key") == "cl.m|h=h03")
               .select(F.input_file_name().alias("f")).distinct().count())
    assert total >= 4 and touched <= max(1, total // 4), (touched, total)
