"""Materialized IVF vector index: build -> cluster-partitioned layout,
driver-side centroid routing, file-level pruning, exact rescore; plus the
incremental assign path for appends."""
import pytest


@pytest.fixture(scope="module")
def corpus(spark):
    # four well-separated clusters on coordinate axes in 8d, 40 vecs each
    # INTERLEAVED so vec_ids 0..3 land one per axis — kmeans_assign seeds
    # its centroids from the first k ids, and seeding all four from one
    # true cluster would need many Lloyd rounds to separate
    rows = []
    vid = 0
    for j in range(40):
        for axis in range(4):
            v = [0.05 * ((j + d) % 3) for d in range(8)]
            v[axis] += 10.0 + 0.01 * j
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    from nexusbase_spark.pipeline.vecindex import VectorIndex
    path = str(tmp_path_factory.mktemp("vecidx"))
    return VectorIndex.build(spark, path, corpus, nlist=4, iters=3)


def test_index_search_matches_brute_force(spark, corpus, index):
    from nexusbase_spark.pipeline.similarity import cosine_topk

    probe_row = corpus.filter("vec_id = 5").collect()[0]
    probe = [float(x) for x in probe_row["embedding"]]
    brute = [r["vec_id"] for r in
             cosine_topk(corpus, probe, k=10, exclude_id=5).collect()]
    served = [r["vec_id"] for r in
              index.search(probe, k=10, nprobe=1, exclude_id=5).collect()]
    # clusters are axis-separated: probing ONE cluster already recalls all
    assert served == brute


def test_index_prunes_files(spark, corpus, index):
    probe_row = corpus.filter("vec_id = 5").collect()[0]
    probe = [float(x) for x in probe_row["embedding"]]
    touched, total = index.probed_files(probe, nprobe=1)
    assert touched < total        # directory-level pruning, not row filters
    assert touched >= 1


def test_index_incremental_assign(spark, corpus, index):
    new = spark.createDataFrame(
        [(999, [10.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    got = index.assign_to(new).collect()[0]
    # must land in the axis-0 cluster: same cluster as vec 0
    base = index.assign_to(
        corpus.filter("vec_id = 0")).collect()[0]
    assert got["cluster"] == base["cluster"]


@pytest.mark.nightly
def test_verify_and_resync_after_corpus_rewrite(spark, corpus, tmp_path_factory):
    """verify() green after build; a retention rewrite (drop some ids,
    add new ones) flags stale+missing; resync() drops/assigns without
    retraining and verify() is green again with search excluding the
    deleted ids."""
    from pyspark.sql import functions as F
    from nexusbase_spark.pipeline.vecindex import VectorIndex
    path = str(tmp_path_factory.mktemp("vecidx_sync"))
    idx = VectorIndex.build(spark, path, corpus, nlist=4, iters=3)
    rep = idx.verify(corpus)
    assert rep["ok"] and rep["checked"] == corpus.count()

    # drop vec_ids 0..7, add two new vectors near axis 0
    new = spark.createDataFrame(
        [(1000, [10.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.1]),
         (1001, [9.5, 0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    base2 = corpus.filter(F.col("vec_id") >= 8).unionByName(new)
    rep = idx.verify(base2)
    assert not rep["ok"] and rep["stale"] == 8 and rep["missing"] == 2

    out = idx.resync(base2)
    assert out == {"dropped_stale": 8, "assigned_missing": 2}
    rep = idx.verify(base2, sample=50)
    assert rep["ok"] and rep["checked"] == 50
    assert idx._meta()["n_vectors"] == base2.count()

    got = {r["vec_id"] for r in
           idx.search([10.0, 0, 0, 0, 0, 0, 0, 0], k=3, nprobe=1).collect()}
    assert 1000 in got or 1001 in got
    assert not any(v < 8 for v in got)


@pytest.mark.nightly
def test_ivfpq_index_serving_matches_brute(spark, corpus, tmp_path_factory):
    """IVFPQ layout: codes stored beside vectors, search_pq routes ->
    ADC-shortlists from codes -> exact re-ranks, and on the separated
    corpus returns exactly the brute-force top-k. Codebooks round-trip
    through meta.json."""
    from nexusbase_spark.pipeline.similarity import cosine_topk
    from nexusbase_spark.pipeline.vecindex import VectorIndex

    path = str(tmp_path_factory.mktemp("ivfpq"))
    idx = VectorIndex.build(spark, path, corpus, nlist=4, iters=3,
                            pq_m=2, pq_codes=4, pq_iters=2)
    meta = idx._meta()
    assert meta["pq_m"] == 2 and meta["pq_books"]
    vecs = spark.read.parquet(path + "/vectors")
    assert {"code_0", "code_1"} <= set(vecs.columns)

    probe_row = corpus.filter("vec_id = 5").collect()[0]
    probe = [float(x) for x in probe_row["embedding"]]
    brute = [r["vec_id"] for r in
             cosine_topk(corpus, probe, k=10, exclude_id=5).collect()]
    served = [r["vec_id"] for r in
              idx.search_pq(probe, k=10, nprobe=1, rerank=40,
                            exclude_id=5).collect()]
    assert served == brute

    with pytest.raises(ValueError):
        VectorIndex.build(spark, str(tmp_path_factory.mktemp("noq")),
                          corpus, nlist=4, iters=3).search_pq(probe)


@pytest.mark.nightly
def test_ivfpq_residual_serving_and_finer_quantization(spark, corpus,
                                                       tmp_path_factory):
    """Residual IVFPQ: codes quantize x - centroid(cluster). Serving
    still returns the brute-force top-k on the separated corpus, and the
    residual codebook's reconstruction error is far below the raw-PQ
    codebook's on the same corpus (the point of residual coding)."""
    from nexusbase_spark.pipeline.similarity import cosine_topk
    from nexusbase_spark.pipeline.vecindex import VectorIndex

    raw = VectorIndex.build(spark, str(tmp_path_factory.mktemp("pq_raw")),
                            corpus, nlist=4, iters=3,
                            pq_m=2, pq_codes=4, pq_iters=2)
    res = VectorIndex.build(spark, str(tmp_path_factory.mktemp("pq_res")),
                            corpus, nlist=4, iters=3,
                            pq_m=2, pq_codes=4, pq_iters=2,
                            pq_residual=True)
    meta = res._meta()
    assert meta["pq_residual"] and meta["residual_centroids"]

    probe_row = corpus.filter("vec_id = 5").collect()[0]
    probe = [float(x) for x in probe_row["embedding"]]
    brute = [r["vec_id"] for r in
             cosine_topk(corpus, probe, k=10, exclude_id=5).collect()]
    served = [r["vec_id"] for r in
              res.search_pq(probe, k=10, nprobe=1, rerank=40,
                            exclude_id=5).collect()]
    assert served == brute

    # reconstruction error: residual codebook centroids live near zero
    # (within-cluster spread ~0.05-0.1) while raw codebooks must span
    # axis offsets ~10 with 4 codes over 2 subspaces
    def mean_book_norm(idx):
        books = idx._meta()["pq_books"]
        import math
        return sum(math.sqrt(sum(v * v for v in vec))
                   for vec in books.values()) / len(books)

    assert mean_book_norm(res) < 0.5 * mean_book_norm(raw)


@pytest.mark.nightly
def test_pq_append_encodes_with_stored_books_and_serves(spark, corpus,
                                                        tmp_path_factory):
    """append() on a PQ index encodes new rows with the STORED codebooks
    (no null code_* columns — the resync bug class) and serving equals
    brute force over the grown corpus."""
    from pyspark.sql import functions as F

    from nexusbase_spark.pipeline.similarity import cosine_topk
    from nexusbase_spark.pipeline.vecindex import VectorIndex

    half = corpus.filter("vec_id < 80")
    rest = corpus.filter("vec_id >= 80")
    path = str(tmp_path_factory.mktemp("pq_app"))
    idx = VectorIndex.build(spark, path, half, nlist=4, iters=3,
                            pq_m=2, pq_codes=4, pq_iters=2)
    assert idx.append(rest) == rest.count()

    vecs = spark.read.parquet(path + "/vectors")
    assert vecs.count() == corpus.count()
    assert vecs.filter(F.col("code_0").isNull()
                       | F.col("code_1").isNull()).count() == 0

    probe_row = corpus.filter("vec_id = 85").collect()[0]
    probe = [float(x) for x in probe_row["embedding"]]
    brute = [r["vec_id"] for r in
             cosine_topk(corpus, probe, k=10, exclude_id=85).collect()]
    served = [r["vec_id"] for r in
              idx.search_pq(probe, k=10, nprobe=1, rerank=40,
                            exclude_id=85).collect()]
    assert served == brute


@pytest.mark.nightly
def test_pq_resync_reencodes_missing(spark, corpus, tmp_path_factory):
    """resync() on a PQ index must re-encode appended missing rows —
    NULL codes would silently drop them from the ADC scan."""
    from pyspark.sql import functions as F

    from nexusbase_spark.pipeline.vecindex import VectorIndex

    path = str(tmp_path_factory.mktemp("pq_rs"))
    idx = VectorIndex.build(spark, path, corpus.filter("vec_id < 120"),
                            nlist=4, iters=3, pq_m=2, pq_codes=4, pq_iters=2)
    rep = idx.resync(corpus)  # 40 missing base rows
    assert rep["assigned_missing"] == 40 and rep["dropped_stale"] == 0
    vecs = spark.read.parquet(path + "/vectors")
    assert vecs.filter(F.col("code_0").isNull()).count() == 0
    assert idx.verify(corpus)["ok"]


@pytest.mark.nightly
def test_vecindex_streaming_sink_appends(spark, corpus, tmp_path_factory):
    """for_each_batch as a Structured-Streaming sink: vectors landed by
    the stream become servable without a rebuild."""
    from nexusbase_spark.pipeline.similarity import cosine_topk
    from nexusbase_spark.pipeline.vecindex import VectorIndex
    from nexusbase_spark.streaming.subscribe import stream_ingest

    path = str(tmp_path_factory.mktemp("vx_stream"))
    idx = VectorIndex.build(spark, path, corpus.filter("vec_id < 100"),
                            nlist=4, iters=3)
    src = tmp_path_factory.mktemp("vec_src")
    schema = "vec_id long, embedding array<double>"
    rows = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in corpus.filter("vec_id >= 100").collect()]

    stream = stream_ingest(spark, str(src), schema)
    q = (stream.writeStream.queryName("t_vx_sink")
         .foreachBatch(idx.for_each_batch()).outputMode("append").start())
    try:
        (spark.createDataFrame(rows[:30], schema).coalesce(1)
         .write.mode("append").parquet(str(src)))
        q.processAllAvailable()
        (spark.createDataFrame(rows[30:], schema).coalesce(1)
         .write.mode("append").parquet(str(src)))
        q.processAllAvailable()
    finally:
        q.stop()

    assert idx._meta()["n_vectors"] == corpus.count()
    probe_row = corpus.filter("vec_id = 150").collect()[0]
    probe = [float(x) for x in probe_row["embedding"]]
    brute = [r["vec_id"] for r in
             cosine_topk(corpus, probe, k=10, exclude_id=150).collect()]
    served = [r["vec_id"] for r in
              idx.search(probe, k=10, nprobe=1, exclude_id=150).collect()]
    assert served == brute


def test_residual_pq_append_serves(spark, corpus, tmp_path_factory):
    """append() on a RESIDUAL-coded index subtracts the stored cluster
    centroid before encoding, so appended rows serve through search_pq
    identically to built rows."""
    from nexusbase_spark.pipeline.similarity import cosine_topk
    from nexusbase_spark.pipeline.vecindex import VectorIndex

    path = str(tmp_path_factory.mktemp("pq_res_app"))
    idx = VectorIndex.build(spark, path, corpus.filter("vec_id < 100"),
                            nlist=4, iters=3, pq_m=2, pq_codes=4,
                            pq_iters=2, pq_residual=True)
    idx.append(corpus.filter("vec_id >= 100"))

    probe_row = corpus.filter("vec_id = 110").collect()[0]
    probe = [float(x) for x in probe_row["embedding"]]
    brute = [r["vec_id"] for r in
             cosine_topk(corpus, probe, k=10, exclude_id=110).collect()]
    served = [r["vec_id"] for r in
              idx.search_pq(probe, k=10, nprobe=1, rerank=60,
                            exclude_id=110).collect()]
    assert served == brute
