from __future__ import annotations

import pytest

from nexusbase_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="nexusbase-tests",
                  extra_conf={"spark.ui.enabled": "false",
                              "spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
