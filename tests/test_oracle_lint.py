"""Registry-wide oracle-SQL lint: hash-hazard output types.

The driver's value hasher is dtype-sensitive: DuckDB returns HUGEINT for
sum(integer) and DECIMAL for some arithmetic, which hash differently from
Spark's BIGINT/DOUBLE even when the values are identical (round-1 red row
tpch_q12_priority_classes was exactly this). This lint walks EVERY registered
oracle through DuckDB DESCRIBE (no execution) and fails on any HUGEINT /
UHUGEINT / DECIMAL output column — cast to BIGINT / DOUBLE in the oracle SQL.
"""

from __future__ import annotations

import pytest

from tests.parity import duckdb_con

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")


def _all_oracles():
    from nexusbase_spark.queries import all_oracle_sql
    return all_oracle_sql()


@pytest.fixture(scope="module")
def lint_con(sf_dir):
    con = duckdb_con(sf_dir)
    yield con
    con.close()


def test_no_hash_hazard_output_types(lint_con):
    offenders = {}
    failures = {}
    for name, sql in _all_oracles().items():
        try:
            desc = lint_con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as ex:  # DESCRIBE itself must succeed for every oracle
            failures[name] = str(ex).splitlines()[0]
            continue
        bad = [(c, t) for c, t, *_ in desc
               if any(k in t.upper() for k in BANNED)]
        if bad:
            offenders[name] = bad
    assert not failures, f"oracle SQL failed DESCRIBE: {failures}"
    assert not offenders, (
        "oracle output columns with hash-hazard types (cast to BIGINT/DOUBLE "
        f"in the oracle SQL): {offenders}")


@pytest.mark.nightly
def test_no_negative_zero_cells(lint_con):
    """IEEE -0.0 reprs as '-0.0' and hash-mismatches a 0.0 from the other
    engine even though they compare equal (bit us on
    embed_label_centroids: DuckDB's round keeps a tiny negative mean's
    sign, Spark's drops it). Execute every oracle at sf0.001 and fail on
    any -0.0 output cell — normalize with `+ 0.0` on BOTH sides."""
    import math
    offenders = {}
    for name, sql in _all_oracles().items():
        res = lint_con.execute(sql)
        cols = [d[0] for d in res.description]
        hits = set()
        for row in res.fetchall():
            for c, v in zip(cols, row):
                if isinstance(v, float) and v == 0.0 and math.copysign(1, v) < 0:
                    hits.add(c)
        if hits:
            offenders[name] = sorted(hits)
    assert not offenders, f"oracle outputs contain -0.0 cells: {offenders}"
