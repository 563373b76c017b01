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
