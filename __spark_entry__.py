"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query on /root/testdata/sf0.001 (smoke check).
queries()       — one entry per implemented operator from SURVEY.md §2
                  (+ pipeline operators), each (spark, sf_dir) -> DataFrame.
oracle_sql()    — matching DuckDB SQL for the value-hash correctness gate.

Implementations live in nexusbase_spark/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this file by path from another cwd; make the
# sibling package importable regardless
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-series 1-day downsample (count/sum/avg/min/max) over the
    click metric — the reference's core query shape (AGGREGATE BY interval,
    iterator/multi_field_downsampling_iterator.go)."""
    from nexusbase_spark.queries import all_queries

    return all_queries()["downsample_1d"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from nexusbase_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from nexusbase_spark.queries import all_oracle_sql

    return all_oracle_sql()
