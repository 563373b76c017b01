"""Every registered query must hash-match its DuckDB oracle — the same gate
the driver runs (CORRECTNESS_r{N}.json), replicated locally at sf0.001."""

from __future__ import annotations

import pytest

from nexusbase_spark.queries import QUERIES, all_queries
from tests.parity import compare

all_queries()  # trigger registration of sibling registries

# Parity cases whose Spark side alone runs tens of seconds at sf0.001
# (iterative CC/BPE rounds, PPJoin chains, index builds): nightly tier —
# the driver's own oracle gate (CORRECTNESS) covers them independently,
# and the r9 driver pytest run timed out before finishing the suite
# (VERDICT r9 #1: split the wall into a driver-completable core + a
# nightly tail, without deleting coverage).
SLOW_PARITY = {
    "doc_dedup_bucket_clusters", "docs_bm25_indexed", "docs_bm25_served",
    "docs_bpe_merges", "docs_curation_v2", "docs_curation_v3_dsir",
    "embed_cluster_purity", "embed_ivfpq_residual_topk",
}
ORACLE_CASES = [
    pytest.param(name, marks=pytest.mark.nightly) if name in SLOW_PARITY
    else name
    for name in sorted(n for n, (_fn, sql) in QUERIES.items()
                       if sql is not None)
]


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_parity(spark, sf_dir, name):
    fn, sql = QUERIES[name]
    errors = compare(name, fn(spark, sf_dir), sql, sf_dir)
    assert not errors, "\n".join(errors)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.schema is not None
    assert set(e.oracle_sql()) <= set(e.queries())
