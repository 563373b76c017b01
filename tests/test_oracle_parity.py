"""Every registered query must hash-match its DuckDB oracle — the same gate
the driver runs (CORRECTNESS_r{N}.json), replicated locally at sf0.001."""

from __future__ import annotations

import pytest

from nexusbase_spark.queries import QUERIES, all_queries
from tests.parity import compare

all_queries()  # trigger registration of sibling registries
ORACLE_CASES = sorted(name for name, (_fn, sql) in QUERIES.items() if sql is not None)


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
