from __future__ import annotations

import os

import pytest

from gmall_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_session(
        app_name="gmall_spark_tests",
        shuffle_partitions=8,
        extra_conf={
            # keep catalog artifacts (bucketed-table tests) out of the repo
            "spark.sql.warehouse.dir": "/tmp/gmall_spark_test_warehouse",
            "spark.driver.extraJavaOptions": "-Dderby.system.home=/tmp/gmall_spark_test_derby",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
